package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("st01 streaming tumbling aggregation converges to the batch answer") {
    val streamed = StreamOps.st01.fn(spark, sf)
    val batch = Windows.w01.fn(spark, sf)
    streamed.schema.fieldNames shouldBe batch.schema.fieldNames
    streamed.exceptAll(batch).count() shouldBe 0
    batch.exceptAll(streamed).count() shouldBe 0
    batch.count() should be > 0L
  }

  test("st03 stream-static enrichment matches the batch join + aggregate") {
    import graft.util.Tables
    val got = StreamOps.st03.fn(spark, sf)
    val batch = Tables.events(spark, sf)
      .join(Tables.customer(spark, sf).select(col("c_custkey"), col("c_mktsegment")),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        graft.util.Exact.dsum(col("value"), 6).as("sum_value"))
    got.exceptAll(batch).count() shouldBe 0
    batch.exceptAll(got).count() shouldBe 0
    got.count() should be > 0L
  }

  test("st02 streaming dedup returns exactly the distinct event set") {
    val got = StreamOps.st02.fn(spark, sf)
    val nEvents = graft.util.Tables.events(spark, sf).count()
    got.count() shouldBe nEvents // every planted duplicate removed
    got.groupBy("event_id").count().filter(col("count") > 1)
      .count() shouldBe 0
  }

  test("st09 streaming OHLC converges to the batch w13 answer") {
    val streamed = StreamOps.st09.fn(spark, sf)
    val batch = Windows.w13.fn(spark, sf)
    streamed.schema.fieldNames shouldBe batch.schema.fieldNames
    streamed.exceptAll(batch).count() shouldBe 0
    batch.exceptAll(streamed).count() shouldBe 0
    batch.count() should be > 0L
  }

  test("st10 streaming ring-buffer z-score converges to the batch w14 answer") {
    val streamed = StreamOps.st10.fn(spark, sf)
    val batch = Windows.w14.fn(spark, sf)
    streamed.schema.fieldNames shouldBe batch.schema.fieldNames
    streamed.exceptAll(batch).count() shouldBe 0
    batch.exceptAll(streamed).count() shouldBe 0
    batch.count() should be > 0L
  }

  test("st08 merge fold is invariant to micro-batch placement (semilattice)") {
    import spark.implicits._
    // adversarial changelog: same-user same-µs collisions (event_id breaks
    // the tie), a delete that must tombstone, and an OLDER row arriving in
    // a LATER batch that must not resurrect the key
    val log = Seq(
      (1L, 100L, 10L, "a", 1.0, "U"),
      (1L, 100L, 11L, "b", 2.0, "U"), // same µs, higher event_id wins
      (1L, 90L, 12L, "c", 3.0, "U"),  // older, must never win
      (2L, 50L, 20L, "d", 4.0, "U"),
      (2L, 60L, 21L, "e", 5.0, "D"),  // delete: tombstone survives merge
      (2L, 55L, 22L, "f", 6.0, "U"),  // older than the delete
      (3L, 10L, 30L, "g", 7.0, "U")
    ).toDF("user_id", "ts_us", "event_id", "event_type", "value", "op")
    val ids = Seq(10L, 11L, 12L, 20L, 21L, 22L, 30L)
    def fold(batches: Seq[Seq[Int]]): Set[String] = {
      var state: Option[org.apache.spark.sql.DataFrame] = None
      for (idxs <- batches) {
        val b = log.filter(col("event_id").isin(idxs.map(ids): _*))
        // localCheckpoint: mirror the declared query's write/read boundary
        // so each step folds materialized rows, not a growing plan
        state = Some(StreamOps.cdcMergeStep(state, b).localCheckpoint(true))
      }
      state.get.filter(col("op") === "U")
        .select("user_id", "event_id").collect().map(_.toString).toSet
    }
    val oneShot = fold(Seq(0 to 6))
    oneShot shouldBe Set("[1,11]", "[3,30]") // user 2 deleted, ties broken
    // every placement — including the older-row-arrives-last splits —
    // must converge to the identical final state
    fold((0 to 6).map(Seq(_))) shouldBe oneShot
    fold(Seq(Seq(0, 3), Seq(1, 4), Seq(2, 5), Seq(6))) shouldBe oneShot
    fold(Seq(Seq(1, 4, 6), Seq(0, 3), Seq(2, 5))) shouldBe oneShot
    fold(Seq(Seq(4), Seq(5), Seq(0, 1, 2, 3, 6))) shouldBe oneShot
  }
}
