package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.{Dataset, Encoder}
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

  /** Feed `batches` through a stateful doc-stream operator via
    * MemoryStream and collect the appended output. A batch given as an
    * empty slice adds no data and the engine runs NO micro-batch for it —
    * such a placement is two batches with a no-op drain between, not an
    * empty-batch execution (MemoryStream cannot force one).
    */
  private def drainOp[I: Encoder, O: Encoder](op: Dataset[I] => Dataset[O])(
      batches: Seq[Seq[I]]): Seq[O] = {
    implicit val sqlCtx = spark.sqlContext
    n += 1
    val view = s"doc_streams_test_$n"
    val input = MemoryStream[I]
    val query = op(input.toDS())
      .writeStream.format("memory").queryName(view)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) input.addData(b: _*)
        query.processAllAvailable()
      }
      spark.table(view).as[O].collect().toSeq
    } finally {
      query.stop()
      spark.catalog.dropTempView(view)
    }
  }

  private def drain(batches: Seq[Seq[BandKeyRow]], cap: Int = 4096): Seq[(Long, Long)] =
    drainOp[BandKeyRow, CandPair](DocStreams.lshCandidatePairs(_, cap))(batches)
      .map(p => (p.doc_a, p.doc_b))

  private val drainFp = drainOp(DocStreams.fpKeeperUpdates) _

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
    // empty slice = no micro-batch runs for it (see drainOp) — this is a
    // two-batch placement with a no-op drain between, not an empty batch
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

  test("stop-bucket cap freezes a boilerplate bucket: bounded state, no " +
      "emissions past the cap, other buckets unaffected") {
    // bucket 7 receives 5 members under cap=3: members 1,2,3 are accepted
    // (3 pairs), arrivals 4,5 hit the frozen bucket and emit NOTHING;
    // bucket 8 stays below its cap and emits normally
    val got = drain(Seq(
      Seq(BandKeyRow(1, 7), BandKeyRow(2, 7)),
      Seq(BandKeyRow(3, 7), BandKeyRow(4, 7)), // 3 accepted (last slot), 4 frozen out
      Seq(BandKeyRow(5, 7)), // frozen bucket: no emission, no state growth
      Seq(BandKeyRow(10, 8), BandKeyRow(11, 8))), cap = 3)
    got.sorted shouldBe Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L))
    // within ONE batch the cap binds too: 4 arrivals, cap 2 → one pair
    drain(Seq(Seq(BandKeyRow(1, 9), BandKeyRow(2, 9), BandKeyRow(3, 9),
      BandKeyRow(4, 9))), cap = 2).sorted shouldBe Seq((1L, 2L))
  }

  test("fpKeeperUpdates: compacted revision log == batch keep-first table " +
      "under every micro-batch placement") {
    val rows = Seq(FpRow("a", 9), FpRow("a", 4), FpRow("a", 7),
      FpRow("b", 2), FpRow("b", 5), FpRow("c", 8))
    val want = Map("a" -> (4L, 3L), "b" -> (2L, 2L), "c" -> (8L, 1L))
    def compact(log: Seq[FpKeeperUpdate]) =
      log.groupBy(_.fp).map { case (fp, us) =>
        fp -> (us.map(_.keeper_id).min, us.map(_.n_copies).max)
      }
    compact(drainFp(Seq(rows))) shouldBe want // one batch
    compact(drainFp(rows.map(Seq(_)))) shouldBe want // one row per batch
    compact(drainFp(Seq(rows.take(1), rows.slice(1, 4), rows.drop(4)))) shouldBe want
    compact(drainFp(Seq(rows.reverse))) shouldBe want // scrambled arrival
    // empty slice = no micro-batch runs for it (see drainOp)
    compact(drainFp(Seq(rows.take(2), Seq.empty, rows.drop(2)))) shouldBe want
  }

  test("fpKeeperUpdates: one revision per fp per batch; keeper only " +
      "decreases and count only increases along each fp's log") {
    val log = drainFp(Seq(
      Seq(FpRow("x", 9), FpRow("x", 6), FpRow("y", 3)),
      Seq(FpRow("x", 2), FpRow("y", 7), FpRow("y", 8))))
    log.count(_.fp == "x") shouldBe 2 // batch-folding: not one per doc
    log.count(_.fp == "y") shouldBe 2
    val xs = log.filter(_.fp == "x").sortBy(_.n_copies)
    xs.map(u => (u.keeper_id, u.n_copies)) shouldBe Seq((6L, 2L), (2L, 3L))
  }
}
