package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without any shuffle exchange") {
    val n = 8
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
    Sinks.writeBucketed(a, "bucketed_a", "k", n)
    Sinks.writeBucketed(b, "bucketed_b", "k", n)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Sinks.bucketedJoin(spark, "bucketed_a", "bucketed_b", "k")
      joined.count() shouldBe 1000
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      plan should not include "Exchange" // co-located: bucket n == bucket n
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bucketed_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_b")
    }
  }

  test("partitioned layout prunes partitions at the scan") {
    val dir = tmpDir("partitioned")
    val df = (1 to 300).map(i => (i.toLong, s"2024-0${1 + i % 3}", i * 1.5))
      .toDF("id", "month", "v")
    Sinks.writePartitioned(df, dir, "month")
    val one = Sinks.readPartition(spark, dir, "month", "2024-01")
    one.count() shouldBe 100
    val scan = one.queryExecution.executedPlan.toString
    scan should include("PartitionFilters")
    scan should include("month#") // the filter landed on the partition column
  }
}
