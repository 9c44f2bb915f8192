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
}
