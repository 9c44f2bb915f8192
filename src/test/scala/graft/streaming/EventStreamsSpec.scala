package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

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
