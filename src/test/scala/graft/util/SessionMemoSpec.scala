package graft.util

import graft.SparkSpec

/** The round-12 advice hardening of [[SessionMemo]]: deterministic
  * eviction (the WeakHashMap GC story was unsound — values pin their own
  * key via QueryExecution→SparkSession) and scheme-aware path
  * fingerprints.
  */
class SessionMemoSpec extends SparkSpec {

  test("memoizes per key, invalidate() drops the session's entries") {
    val memo = new SessionMemo[String, Int]
    var builds = 0
    def get(k: String) = memo.getOrElseUpdate(spark, k) { builds += 1; builds }
    get("a") shouldBe 1
    get("a") shouldBe 1 // hit
    get("b") shouldBe 2
    memo.liveSessionCount shouldBe 1
    memo.invalidate(spark)
    memo.liveSessionCount shouldBe 0
    get("a") shouldBe 3 // rebuilt after invalidation
  }

  test("pathFingerprint: local walk — regen under the same path flips the key") {
    val dir = tmpDir("memo-fp")
    val f = new java.io.File(dir, "part-0.parquet")
    java.nio.file.Files.writeString(f.toPath, "v1")
    val fp1 = SessionMemo.pathFingerprint(dir)
    fp1 should not be "nofs"
    java.nio.file.Files.writeString(f.toPath, "v2+longer") // length changes
    SessionMemo.pathFingerprint(dir) should not be fp1
    SessionMemo.pathFingerprint("not-a-real-corpus-key") shouldBe "nofs"
  }

  test("pathFingerprint: scheme'd URIs list through the Hadoop FS API " +
      "instead of collapsing to the nofs constant") {
    // round-12 advice: hdfs://-style keys used to silently lose the
    // regen-under-same-path protection. file:// exercises the same Hadoop
    // code path the remote schemes take.
    val dir = tmpDir("memo-fp-uri")
    val f = new java.io.File(dir, "data.parquet")
    java.nio.file.Files.writeString(f.toPath, "v1")
    val fp1 = SessionMemo.pathFingerprint(s"file://$dir")
    fp1 should not be "nofs"
    java.nio.file.Files.writeString(f.toPath, "v2-regenerated")
    val fp2 = SessionMemo.pathFingerprint(s"file://$dir")
    fp2 should not be "nofs"
    fp2 should not be fp1
    // an unresolvable scheme degrades to the documented constant, not a throw
    SessionMemo.pathFingerprint("nosuchscheme12://bucket/corpus") shouldBe "nofs"
  }

  test("pathFingerprint: a LISTING failure on a resolvable scheme'd path " +
      "propagates instead of degrading to the stale-hit-prone constant") {
    // round-12 advice (second pass): NonFatal→"nofs" let a transient
    // remote-store error silently alias a regenerated corpus to its stale
    // memo entry. A registered-but-failing FS stands in for the flaky
    // remote store.
    spark.sparkContext.hadoopConfiguration
      .set("fs.failfs.impl", classOf[FailingListFs].getName)
    val dir = tmpDir("memo-fp-fail")
    java.nio.file.Files.writeString(
      new java.io.File(dir, "x.parquet").toPath, "v1")
    val ex = intercept[java.io.IOException] {
      SessionMemo.pathFingerprint(s"failfs://host$dir")
    }
    ex.getMessage should include("injected listing failure")
  }

  test("end-of-application sweep evicts only the ended context's sessions") {
    val memo = new SessionMemo[String, Int]
    memo.getOrElseUpdate(spark, "k")(7) shouldBe 7
    memo.liveSessionCount shouldBe 1
    // the sweep is scoped to the context it fires for; this session's
    // context ending must drop its entries…
    memo.evictContext(spark.sparkContext)
    memo.liveSessionCount shouldBe 0
    // …and a sweep for a DIFFERENT (null-standing) context must not touch
    // entries of a live one — the round-12 over-eviction regression
    memo.getOrElseUpdate(spark, "k")(9) shouldBe 9
    memo.evictContext(null)
    memo.liveSessionCount shouldBe 1
    memo.getOrElseUpdate(spark, "k")(11) shouldBe 9 // still a hit
  }
}

/** A LocalFileSystem whose recursive listing always fails — the flaky
  * remote store for the propagation test above.
  */
class FailingListFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("failfs://host/")
  override def listFiles(p: org.apache.hadoop.fs.Path, recursive: Boolean)
      : org.apache.hadoop.fs.RemoteIterator[org.apache.hadoop.fs.LocatedFileStatus] =
    throw new java.io.IOException("injected listing failure")
}
