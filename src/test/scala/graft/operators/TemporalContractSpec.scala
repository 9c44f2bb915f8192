package graft.operators

import graft.{SparkEntry, SparkSpec}
import graft.util.Tables

/** Encoding-flip invariance for the temporal surface (r8 regression, r9
  * verdict item 3): every events-based query must produce IDENTICAL rows
  * whether events.ts ships as timestamp[us] (the current generator) or as
  * long epoch-ns (the old generator / any future flip back). A missed
  * ns-vs-µs constant (w10's epoch-ns cutoff, j06's tolerance, st04's
  * 1-hour range) would silently shift semantics on one encoding only —
  * this catches it as a row diff instead of a driver-round surprise.
  */
class TemporalContractSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"

  /** sf0.001 with events.parquet re-encoded as long epoch-ns (written
    * from the normalized batch view), all other tables symlinked.
    */
  private lazy val nsDir: String = {
    val dir = tmpDir("events-ns-flip")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings")) {
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(s"$dir/$t.parquet"),
        java.nio.file.Paths.get(s"$src/$t.parquet"))
    }
    // single FILE named events.parquet (the real testdata layout — the
    // streaming source symlinks it as the backlog file)
    Tables.events(spark, src).repartition(1)
      .write.parquet(s"$dir/_evtmp")
    val part = new java.io.File(s"$dir/_evtmp").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    dir
  }

  private def rows(q: String, d: String): Seq[String] =
    SparkEntry.queries(q)(spark, d).collect().map(_.toString).sorted.toSeq

  for (q <- Seq("j01_asof_join", "j06_asof_nearest", "j07_temporal_anti",
      "w01_tumbling_window", "w02_session_window", "w05_sliding_window",
      "w06_moving_avg", "w07_latest_per_key", "w08_running_distinct",
      "w09_scd2_intervals", "w10_cdc_apply", "st01_stream_tumbling",
      "st08_stream_cdc_upsert")) {
    test(s"$q is invariant to the events.ts ns-vs-µs encoding") {
      val a = rows(q, src)
      val b = rows(q, nsDir)
      a should not be empty
      b shouldBe a
    }
  }
}
