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

  test("cube emits all four grouping sets with consistent totals") {
    val df = Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "x", 4L)).toDF("p", "q", "v")
    val r = df.cube("p", "q")
      .agg(grouping_id().cast("long").as("gid"), sum("v").as("s"))
      .collect().map(x => (Option(x.getString(0)), Option(x.getString(1)),
        x.getAs[Long]("gid"), x.getAs[Long]("s")))
    r.count(_._3 == 0L) shouldBe 3 // (p,q) pairs
    r.count(_._3 == 1L) shouldBe 2 // per-p subtotals
    r.count(_._3 == 2L) shouldBe 2 // per-q subtotals
    r.find(_._3 == 3L).map(_._4) shouldBe Some(7L) // grand total
    r.filter(_._3 == 1L).map(_._4).sorted shouldBe Seq(3L, 4L)
  }

  test("sliding window assigns each event to window/slide overlapping windows") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 10:17:00")
    val df = Seq(Tuple1(ts)).toDF("t")
    val w = df.select(window(col("t"), "2 hours", "30 minutes").as("w"))
      .select(col("w.start").cast("string")).as[String].collect().sorted
    w.length shouldBe 4
    w.head should endWith("08:30:00") // earliest window still containing 10:17
    w.last should endWith("10:00:00") // latest window start at or before 10:17
  }
}
