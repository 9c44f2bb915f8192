package graft.util

import org.apache.spark.sql.SparkSession

/** JVM-lifetime memoization keyed on a LIVE SparkSession — the shared
  * mechanism behind [[graft.llm.Dedup.cachedNgramComponents]] and
  * [[graft.llm.Similarity.cachedIvfIndex]] (the "index built once by a
  * batch job, consumed by many queries" pattern those docstrings argue for).
  *
  * Why this shape (round-11 advice hardening):
  *  - the outer map is WEAK-KEYED on the SparkSession OBJECT, so a stopped
  *    and GC'd session evicts its whole memo — and with it the only strong
  *    references pinning the memoized frames' persisted/localCheckpointed
  *    blocks, which Spark's ContextCleaner then reclaims. The previous
  *    `System.identityHashCode(spark)` keying could never evict, and a
  *    recycled identity hash could even hand a dead session's DataFrame to
  *    a new session. SparkSession does not override equals/hashCode, so
  *    WeakHashMap's equality IS session identity here.
  *  - path-shaped corpus keys should include [[SessionMemo.pathFingerprint]]
  *    so regenerating data under the SAME path within one JVM is a memo
  *    MISS, never a stale hit.
  *  - [[invalidate]] is the explicit hook for anything the fingerprint
  *    can't see (e.g. object-store overwrites that preserve listing
  *    metadata).
  *
  * Access is synchronized on the outer map only for the short lookup of the
  * per-session TrieMap; builds run outside the lock (two racing first
  * callers may both build — same benign race the old TrieMap had).
  */
final class SessionMemo[K, V] {
  private val perSession =
    new java.util.WeakHashMap[SparkSession, scala.collection.concurrent.TrieMap[K, V]]()

  private def mapFor(spark: SparkSession): scala.collection.concurrent.TrieMap[K, V] =
    perSession.synchronized {
      var m = perSession.get(spark)
      if (m == null) {
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
}

object SessionMemo {
  /** Cheap file-metadata fingerprint of a corpus path: fold every file's
    * (relative name, length, mtime) under `path` — sorted, so listing
    * order can't flip it — into one hash. Local-FS metadata only (no data
    * read), so it costs one directory walk per memo lookup; a regen under
    * the same path changes mtimes and therefore the key. Non-existent
    * paths (corpus keys that aren't paths) fingerprint to a constant.
    */
  def pathFingerprint(path: String): String = {
    val root = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(root)) return "nofs"
    val md = java.security.MessageDigest.getInstance("MD5")
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    val stream = java.nio.file.Files.walk(root)
    try {
      stream.forEach { p =>
        if (java.nio.file.Files.isRegularFile(p)) {
          entries += s"${root.relativize(p)}|${java.nio.file.Files.size(p)}" +
            s"|${java.nio.file.Files.getLastModifiedTime(p).toMillis}"
        }
      }
    } finally stream.close()
    entries.sorted.foreach(e => md.update(e.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString.take(16)
  }
}
