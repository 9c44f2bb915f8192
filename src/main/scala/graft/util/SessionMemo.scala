package graft.util

import org.apache.spark.sql.SparkSession

/** JVM-lifetime memoization keyed on a LIVE SparkSession — the shared
  * mechanism behind [[graft.llm.Dedup.cachedNgramComponents]] and
  * [[graft.llm.Similarity.cachedIvfIndex]] (the "index built once by a
  * batch job, consumed by many queries" pattern those docstrings argue for).
  *
  * Eviction model (corrected per round-12 advice — the round-11 version
  * claimed WeakHashMap GC would evict stopped sessions, which it CANNOT:
  * memoized values are DataFrames/index frames that strongly reference
  * their SparkSession through QueryExecution, and a WeakHashMap value that
  * strongly references its own key pins the entry forever — the documented
  * WeakHashMap caveat). Eviction is therefore DETERMINISTIC, not GC-based:
  *  - a SparkListener registered once per SparkContext clears every entry
  *    on `onApplicationEnd`, so a stopped context (which is what
  *    `SparkSession.stop()` stops — child sessions share it) releases the
  *    memoized frames, and with them the only strong references pinning
  *    persisted/localCheckpointed blocks;
  *  - [[invalidate]] is the explicit per-session hook for anything earlier
  *    (mid-life regens, object-store overwrites the fingerprint can't see).
  * The WeakHashMap keying is kept for its IDENTITY semantics (SparkSession
  * doesn't override equals/hashCode), not for its GC behavior; it
  * additionally evicts the rare session that is discarded while still
  * value-less.
  *
  * Path-shaped corpus keys should include [[SessionMemo.pathFingerprint]]
  * so regenerating data under the SAME path within one JVM is a memo MISS,
  * never a stale hit.
  *
  * Access is synchronized on the outer map only for the short lookup of the
  * per-session TrieMap; builds run outside the lock (two racing first
  * callers may both build — same benign race the old TrieMap had).
  */
final class SessionMemo[K, V] {
  private val perSession =
    new java.util.WeakHashMap[SparkSession, scala.collection.concurrent.TrieMap[K, V]]()

  /** Contexts that already carry this memo's end-of-application sweeper
    * (weak: a GC'd context needs no eviction — its blocks died with it).
    */
  private val sweeperInstalled =
    new java.util.WeakHashMap[org.apache.spark.SparkContext, java.lang.Boolean]()

  private def ensureSweeper(spark: SparkSession): Unit = {
    val sc = spark.sparkContext
    if (!sweeperInstalled.containsKey(sc)) {
      sweeperInstalled.put(sc, java.lang.Boolean.TRUE)
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          evictContext(sc)
      })
    }
  }

  /** Evict every session OF THIS CONTEXT only (round-12 advice: the old
    * blanket clear() also dropped live entries of a LATER context when
    * contexts run sequentially in one JVM — test suites — forcing cold
    * rebuilds). The end-of-application listener closes over the context
    * it was registered on, so each sweep is scoped to its own sessions.
    */
  private[util] def evictContext(sc: org.apache.spark.SparkContext): Unit =
    perSession.synchronized {
      val it = perSession.keySet().iterator()
      while (it.hasNext) {
        val s = it.next()
        if (s != null && (s.sparkContext eq sc)) it.remove()
      }
    }

  private def mapFor(spark: SparkSession): scala.collection.concurrent.TrieMap[K, V] =
    perSession.synchronized {
      var m = perSession.get(spark)
      if (m == null) {
        ensureSweeper(spark)
        m = scala.collection.concurrent.TrieMap.empty[K, V]
        perSession.put(spark, m)
      }
      m
    }

  def getOrElseUpdate(spark: SparkSession, key: K)(build: => V): V =
    mapFor(spark).getOrElseUpdate(key, build)

  def put(spark: SparkSession, key: K, value: V): Unit =
    mapFor(spark).put(key, value): Unit

  /** Drop every entry memoized for `spark` (references only — freeing the
    * underlying cached blocks is then the ContextCleaner's job once the
    * frames are unreachable).
    */
  def invalidate(spark: SparkSession): Unit =
    perSession.synchronized { perSession.remove(spark): Unit }

  /** Test hook: number of sessions currently holding memo entries. */
  private[graft] def liveSessionCount: Int =
    perSession.synchronized { perSession.size }
}

object SessionMemo {
  /** Cheap file-metadata fingerprint of a corpus path: fold every file's
    * (relative name, length, mtime) under `path` — sorted, so listing
    * order can't flip it — into one hash. No data is read, so it costs one
    * directory listing per memo lookup; a regen under the same path changes
    * mtimes and therefore the key.
    *
    * Scheme-aware (round-12 advice — the previous java.nio-only walk made
    * every `hdfs://`/`s3a://` key collapse to the constant "nofs", silently
    * disabling the regen-under-same-path protection exactly where regens
    * are most common): URIs with a scheme list through the Hadoop
    * FileSystem API under the active session's Hadoop conf; scheme-less
    * paths keep the cheap local walk. "nofs" is reserved for keys that are
    * genuinely NOT listable paths — a malformed URI, a scheme no
    * FileSystem implements, or a path that doesn't exist. A listing
    * FAILURE on a resolvable scheme'd path (a transient remote-store
    * error) PROPAGATES instead of degrading to the constant: mapping it
    * to "nofs" would let a later regen under the same path memo-HIT on
    * stale rows — the exact hazard this fingerprint exists to prevent
    * (round-12 advice, second pass). Remote stores whose listing metadata
    * survives an overwrite still need [[SessionMemo.invalidate]], as the
    * caller docstrings state.
    */
  def pathFingerprint(path: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    if (path.matches("^[A-Za-z][A-Za-z0-9+.-]*://.*")) {
      // resolution failures (not-a-path keys) → "nofs"; the resolved
      // filesystem's exists/list calls run OUTSIDE this try so their
      // errors surface to the caller
      val fsRoot =
        try {
          val conf = org.apache.spark.sql.SparkSession.active
            .sessionState.newHadoopConf()
          val uri = new java.net.URI(path)
          val root = new org.apache.hadoop.fs.Path(path)
          Some((org.apache.hadoop.fs.FileSystem.get(uri, conf), root))
        } catch {
          case _: java.net.URISyntaxException => None
          case _: org.apache.hadoop.fs.UnsupportedFileSystemException => None
          case e: java.io.IOException
              if e.getMessage != null &&
                e.getMessage.contains("No FileSystem for scheme") => None
        }
      fsRoot match {
        case None => return "nofs"
        case Some((fs, root)) =>
          if (!fs.exists(root)) return "nofs"
          val it = fs.listFiles(root, true)
          while (it.hasNext) {
            val st = it.next()
            entries += s"${st.getPath.toString.stripPrefix(root.toString)}" +
              s"|${st.getLen}|${st.getModificationTime}"
          }
      }
    } else {
      val root = java.nio.file.Paths.get(path)
      if (!java.nio.file.Files.exists(root)) return "nofs"
      val stream = java.nio.file.Files.walk(root)
      try {
        stream.forEach { p =>
          if (java.nio.file.Files.isRegularFile(p)) {
            entries += s"${root.relativize(p)}|${java.nio.file.Files.size(p)}" +
              s"|${java.nio.file.Files.getLastModifiedTime(p).toMillis}"
          }
        }
      } finally stream.close()
    }
    entries.sorted.foreach(e => md.update(e.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString.take(16)
  }
}
