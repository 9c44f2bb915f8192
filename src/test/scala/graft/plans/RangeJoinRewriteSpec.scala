package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def points = (0 until 300).map(i => (i.toLong, (i * 7.3) % 500))
    .toDF("pid", "p")
  private def intervals = (0 until 25).map { i =>
    val lo = (i * 37.0) % 450
    (i.toLong, lo, lo + 3 + (i % 7) * 19.0)
  }.toDF("iid", "lo", "hi")

  private def withRule[A](f: => A): A = {
    RangeJoinRewrite.ensureInjected(spark)
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RangeJoinRewrite)
  }

  test("rewrites a pure range join to a banded equi-join with identical results") {
    val joined = points.join(intervals,
      col("p") >= col("lo") && col("p") < col("hi"))
    val brute = joined.select("pid", "iid").as[(Long, Long)].collect().toSet
    withRule {
      val plan = joined.queryExecution.executedPlan.toString
      plan should not include "BroadcastNestedLoop"
      plan should not include "CartesianProduct"
      plan should include("__graft_band")
      joined.select("pid", "iid").as[(Long, Long)].collect().toSet shouldBe brute
    }
    brute should not be empty
  }

  test("bound orientation variants and SQL-written conditions all rewrite") {
    withRule {
      // lo <= p AND hi > p (reversed operand order)
      val j = points.join(intervals,
        col("lo") <= col("p") && col("hi") > col("p"))
      j.queryExecution.executedPlan.toString should include("__graft_band")
      val brute = points.crossJoin(intervals)
        .filter(col("p") >= col("lo") && col("p") < col("hi")).count()
      j.count() shouldBe brute
    }
  }

  test("strict lower / non-strict upper bounds keep exact boundary semantics") {
    val pts = Seq((1L, 10.0), (2L, 20.0), (3L, 15.0)).toDF("pid", "p")
    val ivs = Seq((7L, 10.0, 20.0)).toDF("iid", "lo", "hi")
    withRule {
      val got = pts.join(ivs, col("p") > col("lo") && col("p") <= col("hi"))
        .select("pid").as[Long].collect().sorted
      got shouldBe Seq(2L, 3L) // 10.0 excluded (strict), 20.0 included
    }
  }

  test("degenerate and null-bounded intervals match nothing instead of throwing") {
    val pts = Seq((1L, 10.0)).toDF("pid", "p")
    val ivs = Seq((1L, Some(50.0), Some(20.0)), // inverted: empty interval
      (2L, None, Some(99.0)), (3L, Some(0.0), None)) // null bounds
      .toDF("iid", "lo", "hi")
    withRule {
      pts.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
        .count() shouldBe 0L
    }
  }

  test("joins with an equi-conjunct are left untouched") {
    val l = Seq((1L, 5.0)).toDF("k", "p")
    val r = Seq((1L, 0.0, 10.0)).toDF("k2", "lo", "hi")
    withRule {
      val j = l.join(r, col("k") === col("k2") &&
        col("p") >= col("lo") && col("p") < col("hi"))
      j.queryExecution.executedPlan.toString should not include "__graft_band"
      j.count() shouldBe 1L
    }
  }

  test("non-range inner joins and half-open conditions are left untouched") {
    withRule {
      // only a lower bound — not a point-in-interval shape
      val j = points.join(intervals, col("p") >= col("lo"))
      j.queryExecution.executedPlan.toString should not include "__graft_band"
    }
  }

  test("intervals wider than maxBands take the salted overflow path " +
      "instead of exploding sequence(), with identical results") {
    val pts = points
    val ivs = Seq(
      (1L, 10.0, 40.0),   // narrow
      (2L, -1e12, 1e12),  // astronomically wide: sequence() would throw/OOM
      (3L, 200.0, 260.0)  // narrow
    ).toDF("iid", "lo", "hi")
    val brute = pts.crossJoin(ivs)
      .filter(col("p") >= col("lo") && col("p") < col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    withRule {
      spark.conf.set(RangeJoinRewrite.MaxBandsConf, "32")
      try {
        val j = pts.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
        j.queryExecution.executedPlan.toString should include("__graft_band")
        j.select("pid", "iid").as[(Long, Long)].collect().toSet shouldBe brute
      } finally spark.conf.unset(RangeJoinRewrite.MaxBandsConf)
    }
    brute.count(_._2 == 2L) shouldBe 300 // the wide interval matched all
  }

  test("invalid conf values fall back to defaults instead of throwing " +
      "inside the optimizer or corrupting results") {
    val expected = points.crossJoin(intervals)
      .filter(col("p") >= col("lo") && col("p") < col("hi")).count()
    withRule {
      for ((conf, bad) <- Seq(
          (RangeJoinRewrite.BandWidthConf, "banana"),
          (RangeJoinRewrite.BandWidthConf, "0"),
          (RangeJoinRewrite.BandWidthConf, "-17"),
          (RangeJoinRewrite.BandWidthConf, "Infinity"),
          (RangeJoinRewrite.MaxBandsConf, "NaN"),
          (RangeJoinRewrite.OverflowSaltConf, "-1"),
          (RangeJoinRewrite.EnabledConf, "maybe"))) {
        spark.conf.set(conf, bad)
        try points.join(intervals, col("p") >= col("lo") && col("p") < col("hi"))
          .count() shouldBe expected
        finally spark.conf.unset(conf)
      }
    }
  }

  test("interval-OVERLAP joins rewrite to banded equi-joins: identical " +
      "results, exactly once per pair") {
    val rnd = new scala.util.Random(41)
    val lIv = (0 until 150).map { i =>
      val lo = rnd.nextDouble() * 800
      (i.toLong, lo, lo + rnd.nextDouble() * 90)
    }.toDF("lid", "lo1", "hi1")
    val rIv = (0 until 40).map { i =>
      val lo = rnd.nextDouble() * 850
      (i.toLong, lo, lo + rnd.nextDouble() * 70)
    }.toDF("rid", "lo2", "hi2")
    val brute = lIv.crossJoin(rIv)
      .filter(col("lo1") < col("hi2") && col("lo2") < col("hi1"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    withRule {
      val j = lIv.join(rIv, col("lo1") < col("hi2") && col("lo2") < col("hi1"))
      j.queryExecution.executedPlan.toString should include("__graft_band")
      val got = j.select("lid", "rid").as[(Long, Long)].collect()
      got.length shouldBe got.toSet.size // no duplicate candidates survive
      got.toSet shouldBe brute
    }
    brute should not be empty
  }

  test("overlap rewrite: inverted intervals that satisfy the condition are " +
      "kept, null bounds match nothing, wide intervals take overflow") {
    val lIv = Seq((1L, Some(5.0), Some(3.0)), // inverted yet satisfiable
      (2L, Some(-1e12), Some(1e12)),          // astronomically wide
      (3L, Option.empty[Double], Some(9.0)),  // null bound
      (4L, Some(100.0), Some(130.0)))         // plain narrow
      .toDF("lid", "lo1", "hi1")
    val rIv = Seq((10L, 2.0, 7.0), (11L, 90.0, 200.0)).toDF("rid", "lo2", "hi2")
    val cond = col("lo1") <= col("hi2") && col("lo2") <= col("hi1")
    val brute = lIv.crossJoin(rIv).filter(cond)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    withRule {
      spark.conf.set(RangeJoinRewrite.MaxBandsConf, "16")
      try {
        val j = lIv.join(rIv, cond)
        j.queryExecution.executedPlan.toString should include("__graft_band")
        j.select("lid", "rid").as[(Long, Long)].collect().toSet shouldBe brute
      } finally spark.conf.unset(RangeJoinRewrite.MaxBandsConf)
    }
    // the inverted interval really is a match the rewrite must not lose:
    // L=[5,3] vs R=[2,7] satisfies 5<=7 AND 2<=3
    brute should contain((1L, 10L))
    brute should contain((2L, 10L)) // wide matches through overflow
    brute.exists(_._1 == 3L) shouldBe false
  }

  test("band width only affects fan-out, never the result") {
    val expected = points.crossJoin(intervals)
      .filter(col("p") >= col("lo") && col("p") < col("hi")).count()
    withRule {
      for (w <- Seq("3", "100", "100000")) {
        spark.conf.set(RangeJoinRewrite.BandWidthConf, w)
        try points.join(intervals, col("p") >= col("lo") && col("p") < col("hi"))
          .count() shouldBe expected
        finally spark.conf.unset(RangeJoinRewrite.BandWidthConf)
      }
    }
  }
}
