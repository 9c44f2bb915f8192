package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** [[DocStreams.lshCandidatePairs]] — the st15 stateful bucket operator —
  * against hand-enumerable bucket fixtures: the emitted pair SET must
  * equal the batch bucket self-join's candidate set under EVERY
  * micro-batch placement (the invariance st15's shared d02 oracle relies
  * on), pairs must be canonical (a < b), and re-delivered bucket members
  * must not re-emit.
  */
class DocStreamsSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0

  private def drain(batches: Seq[Seq[BandKeyRow]]): Seq[(Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    n += 1
    val view = s"lsh_cand_test_$n"
    val input = MemoryStream[BandKeyRow]
    val query = DocStreams.lshCandidatePairs(input.toDS())
      .writeStream.format("memory").queryName(view)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) input.addData(b: _*)
        query.processAllAvailable()
      }
      spark.table(view).as[CandPair].collect()
        .map(p => (p.doc_a, p.doc_b)).toSeq
    } finally {
      query.stop()
      spark.catalog.dropTempView(view)
    }
  }

  test("pair emission equals the batch bucket self-join under every placement") {
    // buckets: 100 → {1,2,3}; 200 → {2,3}; 300 → {4} (singleton, no pairs)
    val keys = Seq(BandKeyRow(1, 100), BandKeyRow(2, 100), BandKeyRow(3, 100),
      BandKeyRow(2, 200), BandKeyRow(3, 200), BandKeyRow(4, 300))
    // distinct pair set; (2,3) collides in TWO buckets and emits twice
    // pre-dedup — exactly like the batch path before its .distinct()
    val want = Set((1L, 2L), (1L, 3L), (2L, 3L))
    drain(Seq(keys)).toSet shouldBe want // everything in one batch
    drain(keys.map(Seq(_))).toSet shouldBe want // one row per batch
    drain(Seq(keys.take(2), keys.slice(2, 4), keys.drop(4))).toSet shouldBe want
    drain(Seq(keys.reverse)).toSet shouldBe want // scrambled arrival
    drain(Seq(keys.take(3), Seq.empty, keys.drop(3))).toSet shouldBe want
  }

  test("re-delivered ids do not re-emit; pairs are canonical a < b") {
    val got = drain(Seq(
      Seq(BandKeyRow(9, 7), BandKeyRow(5, 7)),
      Seq(BandKeyRow(5, 7), BandKeyRow(2, 7)))) // 5 re-delivered with 2
    // exactly three emissions, no duplicates, all ascending
    got.sorted shouldBe Seq((2L, 5L), (2L, 9L), (5L, 9L))
    all(got.map(p => p._1 < p._2)) shouldBe true
  }
}
