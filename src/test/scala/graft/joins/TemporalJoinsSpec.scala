package graft.joins

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private val clicks = Seq(
    (1L, 10L, "c10"), (1L, 20L, "c20"), (1L, 30L, "c30"),
    (2L, 15L, "c15"),
    (3L, 99L, "c99")).toDF("k", "ts", "v")

  private val probes = Seq(
    (1L, 25L), (1L, 20L), (1L, 5L),  // between, exactly-at, before-any
    (2L, 1000L),                      // far after
    (4L, 50L)                         // key with no right rows
  ).toDF("k", "ts")

  test("asofJoin picks the latest right row at-or-before each left row") {
    val got = TemporalJoins.asofJoin(probes, clicks, "k", "ts", Seq("v"))
      .select("k", "ts", "asof_ts", "v")
      .as[(Long, Long, Option[Long], Option[String])].collect().toSet
    got shouldBe Set(
      (1L, 25L, Some(20L), Some("c20")),
      (1L, 20L, Some(20L), Some("c20")), // inclusive: ts ties match
      (1L, 5L, None, None),
      (2L, 1000L, Some(15L), Some("c15")),
      (4L, 50L, None, None))
  }

  test("asofJoin agrees with the brute-force max-prior join on random data") {
    val rnd = new scala.util.Random(7)
    val l = (0 until 400).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      .toDF("k", "ts")
    val r = (0 until 300).map(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "ts", "v")
      .groupBy("k", "ts").agg(max("v").as("v")) // unique (k, ts) so brute is well-defined
    val got = TemporalJoins.asofJoin(l, r, "k", "ts", Seq("v"))
      .groupBy("k", "ts")
      .agg(count(lit(1)).as("n"), max("asof_ts").as("asof_ts"))
    val brute = l.as("l").join(r.as("r"),
        $"l.k" === $"r.k" && $"r.ts" <= $"l.ts", "left")
      .groupBy($"l.k".as("k"), $"l.ts".as("ts"))
      .agg(count(lit(1)).as("n_b"), max($"r.ts").as("asof_b"))
    val joined = got.join(brute, Seq("k", "ts"))
    joined.count() shouldBe got.count()
    joined.filter(!(col("asof_ts") <=> col("asof_b"))).count() shouldBe 0
  }

  test("asofJoin plans one shuffle on the key, no nested-loop join") {
    val plan = TemporalJoins.asofJoin(probes, clicks, "k", "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoop"
    plan should not include "CartesianProduct"
    // exactly one exchange: the union shuffled once by key for the sort
    "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
  }

  test("asofJoin is row-atomic: a null payload column in the matched row " +
      "stays null instead of resurrecting an older row's value") {
    val r = Seq(
      (1L, 10L, Some("old")), (1L, 20L, None: Option[String]),
      (2L, 5L, Some("x"))).toDF("k", "ts", "v")
    val l = Seq((1L, 25L), (2L, 25L)).toDF("k", "ts")
    val got = TemporalJoins.asofJoin(l, r, "k", "ts", Seq("v"))
      .select("k", "asof_ts", "v")
      .as[(Long, Option[Long], Option[String])].collect().toSet
    // k=1 matches ts=20 whose v is NULL — v must be None, not "old"
    got shouldBe Set((1L, Some(20L), None), (2L, Some(5L), Some("x")))
  }

  test("asofJoin breaks duplicate (key, ts) right-row ties deterministically: " +
      "the greatest payload tuple wins, independent of partitioning") {
    val r = Seq((1L, 10L, "b"), (1L, 10L, "z"), (1L, 10L, "a"))
      .toDF("k", "ts", "v")
    val l = Seq((1L, 15L)).toDF("k", "ts")
    for (parts <- Seq(1, 3, 7)) {
      val got = TemporalJoins.asofJoin(l, r.repartition(parts), "k", "ts", Seq("v"))
        .select("asof_ts", "v").as[(Long, String)].collect().toSeq
      got shouldBe Seq((10L, "z")) // max (ts, v) tuple, every partitioning
    }
  }

  test("rangeJoinBanded equals the direct inequality join") {
    val rnd = new scala.util.Random(11)
    val points = (0 until 500).map(i => (i.toLong, rnd.nextDouble() * 1000))
      .toDF("pid", "p")
    val intervals = (0 until 40).map { i =>
      val lo = rnd.nextDouble() * 900
      (i.toLong, lo, lo + 5 + rnd.nextDouble() * 120) // overlapping, ragged
    }.toDF("iid", "lo", "hi")
    val got = TemporalJoins.rangeJoinBanded(points, "p", intervals, "lo", "hi", 37.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val brute = points.crossJoin(intervals)
      .filter(col("p") >= col("lo") && col("p") < col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    got shouldBe brute
    brute should not be empty
  }

  test("rangeJoinBanded boundary semantics: lo inclusive, hi exclusive") {
    val points = Seq((1L, 10.0), (2L, 20.0)).toDF("pid", "p")
    val intervals = Seq((7L, 10.0, 20.0)).toDF("iid", "lo", "hi")
    val got = TemporalJoins.rangeJoinBanded(points, "p", intervals, "lo", "hi", 8.0)
      .select("pid").as[Long].collect().toSeq
    got shouldBe Seq(1L)
  }

  test("rangeJoinBanded: intervals wider than maxBands take the overflow " +
      "path and still match exactly, narrow ones stay banded") {
    val points = (0 until 400).map(i => (i.toLong, i * 2.5)).toDF("pid", "p")
    val intervals = Seq(
      (1L, 10.0, 30.0),        // narrow: 3-4 bands at W=8
      (2L, -1e9, 1e9),         // wide: would need ~2.5e8 bands -> overflow
      (3L, 500.0, 600.0),      // narrow
      (4L, 0.0, 1e7)           // wide
    ).toDF("iid", "lo", "hi")
    val got = TemporalJoins.rangeJoinBanded(points, "p", intervals,
        "lo", "hi", bandWidth = 8.0, maxBands = 64, overflowSalt = 8)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val brute = points.crossJoin(intervals)
      .filter(col("p") >= col("lo") && col("p") < col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    got shouldBe brute
    // the wide intervals really did match (every point is in both)
    got.count(_._2 == 2L) shouldBe 400
  }

  test("rangeJoinBanded rejects invalid parameters eagerly") {
    val pts = Seq((1L, 1.0)).toDF("pid", "p")
    val ivs = Seq((1L, 0.0, 2.0)).toDF("iid", "lo", "hi")
    for (w <- Seq(0.0, -3.0, Double.NaN, Double.PositiveInfinity)) {
      an[IllegalArgumentException] should be thrownBy
        TemporalJoins.rangeJoinBanded(pts, "p", ivs, "lo", "hi", w)
    }
    an[IllegalArgumentException] should be thrownBy
      TemporalJoins.rangeJoinBanded(pts, "p", ivs, "lo", "hi", 1.0, maxBands = 0)
    an[IllegalArgumentException] should be thrownBy
      TemporalJoins.rangeJoinBanded(pts, "p", ivs, "lo", "hi", 1.0, overflowSalt = 0)
  }

  test("intervalOverlapJoin equals the direct overlap join, exactly once " +
      "per pair, across narrow/wide/empty/null interval mixes") {
    val rnd = new scala.util.Random(23)
    val leftIv = (0 until 200).map { i =>
      val lo = rnd.nextDouble() * 900
      (i.toLong, lo, lo + rnd.nextDouble() * 80)
    }.toDF("lid", "lo1", "hi1")
      // a wide, an empty (lo==hi), and a null-bounded interval
      .union(Seq((900L, -1e9, 1e9), (901L, 5.0, 5.0)).toDF("lid", "lo1", "hi1"))
      .union(Seq((902L, Option.empty[Double], Some(9.0)))
        .toDF("lid", "lo1", "hi1"))
    val rightIv = (0 until 60).map { i =>
      val lo = rnd.nextDouble() * 950
      (i.toLong, lo, lo + rnd.nextDouble() * 60)
    }.toDF("rid", "lo2", "hi2")
      .union(Seq((800L, 0.0, 1e8), (801L, 42.0, 42.0)).toDF("rid", "lo2", "hi2"))
    val got = TemporalJoins.intervalOverlapJoin(leftIv, "lo1", "hi1",
        rightIv, "lo2", "hi2", bandWidth = 25.0, maxBands = 16, overflowSalt = 8)
      .select("lid", "rid").as[(Long, Long)].collect()
    // null-strict half-open overlap (greatest/least would IGNORE nulls and
    // treat a null bound as unbounded — not the operator's contract)
    val brute = leftIv.crossJoin(rightIv)
      .filter(col("lo1") < col("hi2") && col("lo2") < col("hi1") &&
        col("lo1") < col("hi1") && col("lo2") < col("hi2"))
      .select("lid", "rid").as[(Long, Long)].collect()
    got.length shouldBe got.toSet.size // exactly once, no dup candidates
    got.toSet shouldBe brute.toSet
    // wide×wide, wide×narrow, narrow×wide pairs are all present
    got.toSet should contain((900L, 800L))
    brute.count(_._1 == 900L) should be > 50
    got.count(_._1 == 900L) shouldBe brute.count(_._1 == 900L)
  }

  test("intervalOverlapJoin plans an equi-join, not a nested loop") {
    val l = (0 until 50).map(i => (i.toLong, i * 10.0, i * 10.0 + 25.0))
      .toDF("lid", "lo1", "hi1")
    val r = (0 until 20).map(i => (i.toLong, i * 30.0, i * 30.0 + 45.0))
      .toDF("rid", "lo2", "hi2")
    val plan = TemporalJoins
      .intervalOverlapJoin(l, "lo1", "hi1", r, "lo2", "hi2", 20.0)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoop"
    plan should not include "CartesianProduct"
  }

  test("rangeJoinBanded plans an equi-join, not a nested loop") {
    val points = (0 until 100).map(i => (i.toLong, i * 3.7)).toDF("pid", "p")
    val intervals = (0 until 10).map(i => (i.toLong, i * 40.0, i * 40.0 + 55.0))
      .toDF("iid", "lo", "hi")
    val plan = TemporalJoins
      .rangeJoinBanded(points, "p", intervals, "lo", "hi", 25.0)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoop"
    plan should not include "CartesianProduct"
  }

  test("asofJoinNearest: nearest within tolerance, backward wins ties") {
    val l = Seq((1L, 100L, "a"), (1L, 200L, "b"), (1L, 300L, "c"),
      (2L, 50L, "d")).toDF("k", "ts", "tag")
    val r = Seq(
      (1L, 90L, 9.0),   // 10 before a
      (1L, 115L, 11.0), // 15 after a  -> a matches 90 (nearer)
      (1L, 195L, 19.0), // 5 before b
      (1L, 205L, 20.0), // 5 after b   -> distance TIE: backward 195 wins
      (1L, 450L, 45.0)  // 150 after c -> outside tolerance 100
    ).toDF("k", "ts", "v")
    val got = TemporalJoins.asofJoinNearest(l, r, "k", "ts", Seq("v"), 100L)
      .select("k", "ts", "asof_ts", "v")
      .as[(Long, Long, Option[Long], Option[Double])].collect().toSet
    got shouldBe Set(
      (1L, 100L, Some(90L), Some(9.0)),
      (1L, 200L, Some(195L), Some(19.0)), // backward on the tie
      (1L, 300L, Some(205L), Some(20.0)), // backward 95 away, within tol
      (2L, 50L, None, None))
  }

  test("asofJoinNearest agrees with brute-force nearest on random data") {
    val rnd = new scala.util.Random(13)
    val l = (0 until 400).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      .toDF("k", "ts")
    val r = (0 until 300).map(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toDouble))
      .toDF("k", "ts", "v")
      .groupBy("k", "ts").agg(max("v").as("v"))
    val tol = 60L
    val got = TemporalJoins.asofJoinNearest(l, r, "k", "ts", Seq("v"), tol)
      .groupBy("k", "ts").agg(count(lit(1)).as("n"), max("asof_ts").as("asof_ts"))
    // brute force: per left row, min |dt| within tol, backward on ties
    val cand = l.as("l").join(r.as("r"),
        $"l.k" === $"r.k" && abs($"r.ts" - $"l.ts") <= tol)
      .select($"l.k".as("k"), $"l.ts".as("ts"), $"r.ts".as("rts"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("k", "ts")
          .orderBy(abs(col("rts") - col("ts")),
            when(col("rts") <= col("ts"), 0).otherwise(1))))
      .filter(col("rank") === 1)
    val brute = l.join(cand, Seq("k", "ts"), "left")
      .groupBy("k", "ts").agg(count(lit(1)).as("n_b"), max("rts").as("asof_b"))
    val joined = got.join(brute, Seq("k", "ts"))
    joined.count() shouldBe got.count()
    joined.filter(!(col("asof_ts") <=> col("asof_b"))).count() shouldBe 0
  }
}
