package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp
import org.apache.spark.sql.functions.col

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  test("tumbling window counts over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val query = EventStreams.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode("complete").start()
    try {
      input.addData(
        EventRow(1, ts(0), 10, "click", 1.0),
        EventRow(2, ts(5), 10, "click", 2.0),
        EventRow(3, ts(70), 11, "view", 3.0))
      query.processAllAvailable()
      val rows = spark.table("tumbling_test")
        .select("event_type", "cnt").as[(String, Long)].collect().toMap
      rows("click") shouldBe 2
      rows("view") shouldBe 1
    } finally query.stop()
  }

  test("session windows split on the 30-minute gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val query = EventStreams.sessionCounts(input.toDF())
      .writeStream.format("memory").queryName("session_test")
      .outputMode("complete").start()
    try {
      input.addData(
        EventRow(1, ts(0), 10, "click", 1.0),
        EventRow(2, ts(10), 10, "click", 1.0), // same session
        EventRow(3, ts(50), 10, "click", 1.0)) // gap 40min → new session
      query.processAllAvailable()
      val sessions = spark.table("session_test")
        .select("n_events").as[Long].collect().sorted
      sessions shouldBe Array(1L, 2L)
    } finally query.stop()
  }

  test("watermark drops events later than the threshold (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRow]
    // 10-minute watermark so late data is evictable quickly
    val query = EventStreams.tumblingCounts(input.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("late_test")
      .outputMode("append").start()
    try {
      input.addData(EventRow(1, ts(0), 10, "click", 1.0))
      query.processAllAvailable()
      // advance event time far past window 0's end + watermark → finalizes it
      input.addData(EventRow(2, ts(200), 10, "click", 1.0))
      query.processAllAvailable()
      // this event's window is already finalized — must be dropped
      input.addData(EventRow(3, ts(1), 10, "click", 5.0))
      query.processAllAvailable()
      input.addData(EventRow(4, ts(400), 10, "click", 1.0))
      query.processAllAvailable()
      val firstWindow = spark.table("late_test")
        .orderBy("hour_start").select("cnt").as[Long].collect()
      firstWindow.head shouldBe 1 // the late event did not inflate window 0
    } finally query.stop()
  }

  test("dropDuplicatesWithinWatermark dedups by key on the stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val query = EventStreams.dedupWithinWatermark(input.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      input.addData(
        EventRow(1, ts(0), 10, "click", 1.0),
        EventRow(1, ts(1), 10, "click", 1.0), // duplicate event_id
        EventRow(2, ts(2), 11, "view", 2.0))
      query.processAllAvailable()
      spark.table("dedup_test").count() shouldBe 2
    } finally query.stop()
  }

  test("flatMapGroupsWithState emits only closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val query = EventStreams.closedSessions(input.toDS())
      .writeStream.format("memory").queryName("closed_test")
      .outputMode("append").start()
    try {
      input.addData(
        EventRow(1, ts(0), 10, "click", 1.0),
        EventRow(2, ts(10), 10, "click", 1.0))
      query.processAllAvailable()
      spark.table("closed_test").count() shouldBe 0 // session still open
      input.addData(EventRow(3, ts(60), 10, "click", 1.0)) // 50-min gap closes it
      query.processAllAvailable()
      val closed = spark.table("closed_test").as[EventStreams.ClosedSession].collect()
      closed.length shouldBe 1
      closed.head.n_events shouldBe 2
      closed.head.start_ms shouldBe ts(0).getTime
      closed.head.end_ms shouldBe ts(10).getTime

      // out-of-order arrival in a LATER micro-batch: merges into the open
      // session (window extends via min/max — end must not move backwards)
      input.addData(EventRow(4, ts(55), 10, "click", 1.0))
      query.processAllAvailable()
      spark.table("closed_test").count() shouldBe 1 // still just the first

      // advance the watermark (2h delay) past lastTs + gap via another user,
      // then trigger one more batch so the event-time timeout fires and
      // flushes user 10's FINAL session
      input.addData(EventRow(5, ts(300), 20, "view", 1.0))
      query.processAllAvailable()
      input.addData(EventRow(6, ts(301), 20, "view", 1.0))
      query.processAllAvailable()
      val all = spark.table("closed_test").as[EventStreams.ClosedSession]
        .collect().sortBy(_.start_ms)
      all.length shouldBe 2
      all(1).start_ms shouldBe ts(55).getTime // extended backwards by the late event
      all(1).end_ms shouldBe ts(60).getTime   // not corrupted by out-of-order arrival
      all(1).n_events shouldBe 2
    } finally query.stop()
  }

  test("rollingAnomalies: ring state is batch-placement invariant over in-order slices") {
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.PurchaseCents
    // the w14 fixture series: 8 alternating 100/102, a 200 spike, a 101
    val rows = (1 to 8).map(t => PurchaseCents(t.toLong, 1L, t.toLong * 1000000L,
        if (t % 2 == 1) 100L else 102L)) ++
      Seq(PurchaseCents(9L, 1L, 9000000L, 200L), PurchaseCents(10L, 1L, 10000000L, 101L))
    def run(batches: Seq[Seq[PurchaseCents]], name: String) = {
      val input = MemoryStream[PurchaseCents]
      val q = EventStreams.rollingAnomalies(input.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).orderBy("event_id")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    }
    val expected = Seq(
      (1L, 9L, 200L, 808L, 81616L, 1L),
      (1L, 10L, 101L, 908L, 111616L, 0L))
    // one batch, one-event batches, and uneven slices — the state carried
    // across micro-batches must reproduce the identical flag rows
    run(Seq(rows), "ra_one") shouldBe expected
    run(rows.map(Seq(_)), "ra_each") shouldBe expected
    run(Seq(rows.take(3), rows.slice(3, 9), rows.drop(9)), "ra_uneven") shouldBe expected
  }

  test("scd2ClosedIntervals: closes on change, merges same-state runs, " +
      "holds the final interval open; batch-placement invariant") {
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.{Scd2Row, TypedEvent}
    // user 1: A A B A → closed [A,0→20)(n=2), [B,20→30)(n=1); the final A
    // stays open and must never be emitted. user 2: a single X → still
    // open, nothing emitted.
    val rows = Seq(
      TypedEvent(1L, 1L, 0L, "A"), TypedEvent(2L, 1L, 10L, "A"),
      TypedEvent(3L, 1L, 20L, "B"), TypedEvent(4L, 1L, 30L, "A"),
      TypedEvent(5L, 2L, 5L, "X"))
    def run(batches: Seq[Seq[TypedEvent]], name: String) = {
      val input = MemoryStream[TypedEvent]
      val q = EventStreams.scd2ClosedIntervals(input.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).orderBy("user_id", "valid_from_us")
        .as[Scd2Row].collect().toSeq
    }
    val expected = Seq(
      Scd2Row(1L, "A", 0L, 20L, 2L),
      Scd2Row(1L, "B", 20L, 30L, 1L))
    run(Seq(rows), "scd2_one") shouldBe expected
    run(rows.map(Seq(_)), "scd2_each") shouldBe expected
    run(Seq(rows.take(2), rows.slice(2, 4), rows.drop(4)), "scd2_uneven") shouldBe expected
  }

  test("decayedSums: exact 10^7/2^k nano weights, ring carried across " +
      "batches; batch-placement invariant and ≡ the batch window form") {
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.{DecayedRow, PurchaseCents}
    // 3 purchases, cents 100, 200, 400:
    //  e1: 100·10^7                               = 1_000_000_000
    //  e2: 200·10^7 + 100·5·10^6                  = 2_500_000_000
    //  e3: 400·10^7 + 200·5·10^6 + 100·2.5·10^6   = 5_250_000_000
    val rows = Seq(PurchaseCents(1L, 1L, 10L, 100L),
      PurchaseCents(2L, 1L, 20L, 200L), PurchaseCents(3L, 1L, 30L, 400L)) ++
      // user 2: ten 1-cent rows then a 2: the 8-lag truncation must drop
      // the oldest lags (decayed = 2·10^7 + Σ_{k=1..7} 10^7/2^k = 39843750·…)
      (1 to 10).map(t => PurchaseCents(10L + t, 2L, t * 100L, 1L)) :+
      PurchaseCents(21L, 2L, 1100L, 2L)
    def run(batches: Seq[Seq[PurchaseCents]], name: String) = {
      val input = MemoryStream[PurchaseCents]
      val q = EventStreams.decayedSums(input.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).orderBy("event_id").as[DecayedRow].collect().toSeq
    }
    val one = run(Seq(rows), "ds_one")
    one.take(3).map(_.decayed_nanos) shouldBe
      Seq(1000000000L, 2500000000L, 5250000000L)
    // user 2's last row: 2·10^7 + 1·(5000000+2500000+1250000+625000+312500
    //   +156250+78125) = 29_921_875
    one.last.decayed_nanos shouldBe 29921875L
    run(rows.map(Seq(_)), "ds_each") shouldBe one
    run(Seq(rows.take(5), rows.slice(5, 11), rows.drop(11)), "ds_uneven") shouldBe one
    // ≡ the batch window form (w11's decayedSumNanos) on the same rows
    val batch = rows.toDF()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("t_us"), col("event_id"))
    val fromWindow = batch.withColumn("decayed_nanos",
        graft.operators.Windows.decayedSumNanos(col("c"), w))
      .select("event_id", "user_id", "t_us", "decayed_nanos")
      .orderBy("event_id").as[DecayedRow].collect().toSeq
    one shouldBe fromWindow
  }

  test("latestPerKey: semilattice argmax state — identical final state " +
      "under scrambled, duplicated, and per-row batch placements") {
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.FullEvent
    val rows = Seq(
      FullEvent(1L, 1L, 10L, "view", 1.0),
      FullEvent(2L, 1L, 30L, "purchase", 9.0), // the winner for user 1
      FullEvent(3L, 1L, 20L, "click", 2.0),
      FullEvent(4L, 2L, 5L, "view", 3.0),
      FullEvent(5L, 2L, 5L, "click", 4.0))     // same t: event_id breaks tie
    def finalState(batches: Seq[Seq[FullEvent]], name: String) = {
      val input = MemoryStream[FullEvent]
      val q = EventStreams.latestPerKey(input.toDS())
        .writeStream.format("memory").queryName(name).outputMode("update").start()
      try batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).as[FullEvent].collect()
        .groupBy(_.user_id).view
        .mapValues(_.maxBy(r => (r.t_us, r.event_id))).toMap
    }
    val want = Map(1L -> rows(1), 2L -> rows(4))
    finalState(Seq(rows), "lpk_one") shouldBe want
    finalState(rows.reverse.map(Seq(_)), "lpk_rev") shouldBe want // arrival ≠ event order
    finalState(Seq(rows.drop(3), rows.take(3), rows), "lpk_dup") shouldBe want // replays
  }

  test("intervalCoverage: nesting/touching/chaining merge semantics and " +
      "batch-placement invariance on a hand fixture") {
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.{CoverageRev, IntervalArrival}
    // user 1: [0,100] swallows [10,20] (NESTED — the case gap logic gets
    // wrong), [100,150] touches at 100 (merges: s ≤ reach), [200,210]
    // separate → 2 segments, covered 160, longest 150
    // user 2: chained overlaps [0,10],[5,20],[18,30] → one segment of 30
    val rows = Seq(
      IntervalArrival(1L, 1L, 0L, 100L), IntervalArrival(1L, 2L, 10L, 20L),
      IntervalArrival(1L, 3L, 100L, 150L), IntervalArrival(1L, 4L, 200L, 210L),
      IntervalArrival(2L, 5L, 0L, 10L), IntervalArrival(2L, 6L, 5L, 20L),
      IntervalArrival(2L, 7L, 18L, 30L))
    def finalState(batches: Seq[Seq[IntervalArrival]], name: String) = {
      val input = MemoryStream[IntervalArrival]
      val q = EventStreams.intervalCoverage(input.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).as[CoverageRev].collect()
        .groupBy(_.user_id).view
        .mapValues(_.maxBy(_.n_intervals)).toMap
    }
    val want = Map(
      1L -> CoverageRev(1L, 4L, 2L, 160L, 150L),
      2L -> CoverageRev(2L, 3L, 1L, 30L, 30L))
    finalState(Seq(rows), "ic_one") shouldBe want
    finalState(rows.map(Seq(_)), "ic_each") shouldBe want // one per batch
    finalState(Seq(rows.reverse), "ic_rev") shouldBe want // scrambled arrival
    // the adversarial placement: the swallowing interval arrives LAST, so
    // intermediate revisions hold MORE segments than the final state
    finalState(rows.reverse.map(Seq(_)), "ic_reveach") shouldBe want
  }

  test("conformalQuantile: exact rank walk on a hand histogram, revisions " +
      "monotone in n, placement invariant, +inf stand-in when n < k") {
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.{ConformalRev, ResidualArrival}
    def drain(batches: Seq[Seq[Long]], name: String): Seq[ConformalRev] = {
      val input = MemoryStream[ResidualArrival]
      val q = EventStreams.conformalQuantile(input.toDS(), domain = 32)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try batches.foreach { b =>
        if (b.nonEmpty) input.addData(b.map(ResidualArrival): _*)
        q.processAllAvailable()
      } finally q.stop()
      spark.table(name).as[ConformalRev].collect().toSeq.sortBy(_.n_cal)
    }
    // 19 distinct residuals 0..18: k = ceil(0.9·20) = 18 → q̂ = 17.
    // After the first 9 (0..8): k = ceil(0.9·10) = 9 → q̂ = 8.
    val rs = (0L until 19L)
    val one = drain(Seq(rs), "cq_one")
    one.last shouldBe ConformalRev(19L, 17L)
    val two = drain(Seq(rs.take(9), rs.drop(9)), "cq_two")
    two.map(r => (r.n_cal, r.q_hat)) shouldBe Seq((9L, 8L), (19L, 17L))
    // placement invariance of the FINAL revision (histogram fold is
    // commutative): scrambled and per-row placements land identically
    drain(Seq(rs.reverse), "cq_rev").last shouldBe ConformalRev(19L, 17L)
    drain(rs.reverse.map(Seq(_)), "cq_each").last shouldBe ConformalRev(19L, 17L)
    // n < k (4 samples want rank 5): the bounded-domain stand-in for
    // conformal's +infinity is the maximal representable residual
    drain(Seq(Seq(5L, 1L, 9L, 1L)), "cq_small").last shouldBe
      ConformalRev(4L, 31L)
    // out-of-domain residuals are refused loudly, never silently clipped
    an[Exception] should be thrownBy drain(Seq(Seq(32L)), "cq_bad")
  }

  test("conformalQuantileByKey: per-key rank math matches the global fold " +
      "per key, placement invariant PER KEY under mixed/segregated/" +
      "scrambled batching, keys fully independent") {
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.{KeyedConformalRev, KeyedResidualArrival}
    def drain(batches: Seq[Seq[(Long, Long)]], name: String)
        : Map[Long, (Long, Long)] = {
      val input = MemoryStream[KeyedResidualArrival]
      val q = EventStreams
        .conformalQuantileByKey(input.toDS(), domain = 32)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try batches.foreach { b =>
        if (b.nonEmpty)
          input.addData(b.map(t => KeyedResidualArrival(t._1, t._2)): _*)
        q.processAllAvailable()
      } finally q.stop()
      spark.table(name).as[KeyedConformalRev].collect()
        .groupBy(_.seg).view
        .mapValues(rs => { val m = rs.maxBy(_.n_cal); (m.n_cal, m.q_hat) })
        .toMap
    }
    // key 0: residuals 0..18 → k = ⌈0.9·20⌉ = 18 → q̂ = 17 (the global
    // test's hand walk, now per key); key 1: 4 samples < k → +∞ stand-in
    val k0 = (0L until 19L).map(r => (0L, r))
    val k1 = Seq((1L, 5L), (1L, 1L), (1L, 9L), (1L, 1L))
    val want = Map(0L -> ((19L, 17L)), 1L -> ((4L, 31L)))
    drain(Seq(k0 ++ k1), "ck_one") shouldBe want                // one batch
    drain(Seq(k0.toSeq, k1), "ck_seg") shouldBe want            // segregated
    // interleaved: each batch carries rows of BOTH keys (st22's backlog
    // shape — slicing deliberately mis-aligned with the key)
    val mixed = (k0 ++ k1).zipWithIndex.groupBy(_._2 % 3).toSeq
      .sortBy(_._1).map(_._2.map(_._1))
    drain(mixed, "ck_mix") shouldBe want
    // scrambled per-row arrival (fixed seed — deterministic replay)
    drain(new scala.util.Random(42).shuffle((k0 ++ k1).toList)
      .map(Seq(_)), "ck_each") shouldBe want
    // key independence: dropping key 0 entirely leaves key 1 untouched
    drain(Seq(k1), "ck_only1") shouldBe Map(1L -> ((4L, 31L)))
  }

  test("mapGroupsWithState keeps running per-user totals across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val query = EventStreams.runningUserTotals(input.toDS())
      .writeStream.format("memory").queryName("running_test")
      .outputMode("update").start()
    try {
      input.addData(EventRow(1, ts(0), 10, "click", 2.0))
      query.processAllAvailable()
      input.addData(EventRow(2, ts(1), 10, "click", 3.0))
      query.processAllAvailable()
      val last = spark.table("running_test")
        .orderBy("n_events").as[UserRunning].collect().last
      last.n_events shouldBe 2
      last.total_value shouldBe 5.0 +- 1e-9
    } finally query.stop()
  }
}
