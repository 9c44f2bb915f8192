package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct is within its error bound of the exact count") {
    val df = (1 to 20000).map(i => i % 3700).toDF("k")
    val row = df.agg(
      countDistinct(col("k")).as("exact"),
      approx_count_distinct(col("k")).as("approx")).head()
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    math.abs(approx - exact) / exact should be < 0.05 // default rsd 0.05
  }

  test("df.summary() API parity: count/mean/stddev rows (ref q19 surface)") {
    val df = Seq(2.0, 4.0, 6.0, 8.0).toDF("x")
    val s = df.summary("count", "mean", "stddev").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    s("count") shouldBe "4"
    s("mean").toDouble shouldBe 5.0 +- 1e-9
    s("stddev").toDouble shouldBe math.sqrt(20.0 / 3) +- 1e-6
  }

  test("set ops have distinct semantics (union dedups after distinct())") {
    val a = Seq(1, 2, 2, 3).toDF("x")
    val b = Seq(2, 3, 4).toDF("x")
    a.intersect(b).as[Int].collect().sorted shouldBe Array(2, 3)
    a.except(b).as[Int].collect().sorted shouldBe Array(1)
    a.union(b).distinct().as[Int].collect().sorted shouldBe Array(1, 2, 3, 4)
  }
}
