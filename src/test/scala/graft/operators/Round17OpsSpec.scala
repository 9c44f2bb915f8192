package graft.operators

import graft.SparkSpec
import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** Round-17-wave pins: the deterministic NN-Descent hand fixture the
  * round-14 verdict asked for (directive #6 — the oracle checks contract
  * BOOLEANS; this pins the graph EDGE-FOR-EDGE on a tiny corpus whose
  * exact top-3 is hand-derivable), and the two-level (hierarchical) IVF
  * quantizer's partition/exactness contracts (directive #3's new seed
  * path, which the sf0.01 driver gate never reaches because it only
  * engages past the flat k-means cap).
  *
  * Fixture geometry: 12 unit vectors on the 2-D circle, four clusters of
  * three at base angles 0°/97°/193°/285° with in-cluster offsets
  * {0, 6, 14}°. cos is strictly decreasing on [0°, 180°], and every
  * pair's angular gap is distinct within each node's candidate set (the
  * angles were chosen so all margins are ≥ 1°), so each node's exact
  * top-3 is unambiguous — no sim ties for TopKSim to break.
  */
class Round17OpsSpec extends SparkSpec {
  import spark.implicits._

  private val angles =
    Seq(0, 6, 14, 97, 103, 111, 193, 199, 207, 285, 291, 299)

  private lazy val fixture = angles.map { a =>
    val r = math.toRadians(a.toDouble)
    (a.toLong, Array(math.cos(r).toFloat, math.sin(r).toFloat))
  }.toDF("vec_id", "embedding")

  /** Hand-derived exact top-3 (by angular gap; see scaladoc). */
  private val handTop3: Map[Long, Seq[Long]] = Map(
    0L -> Seq(6L, 14L, 299L),
    6L -> Seq(0L, 14L, 299L),
    14L -> Seq(6L, 0L, 299L),
    97L -> Seq(103L, 111L, 14L),
    103L -> Seq(97L, 111L, 14L),
    111L -> Seq(103L, 97L, 193L),
    193L -> Seq(199L, 207L, 111L),
    199L -> Seq(193L, 207L, 285L),
    207L -> Seq(199L, 193L, 285L),
    285L -> Seq(291L, 299L, 0L),
    291L -> Seq(285L, 299L, 0L),
    299L -> Seq(291L, 285L, 0L))

  private def ranked(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.select("p_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (p, rows) =>
        p -> rows.sortBy(_._3).map(_._2).toSeq
      }

  test("hand fixture sanity: brute-force top-3 matches the hand derivation") {
    val brute = Similarity.bruteTopK(spark, fixture, fixture,
      "vec_id", "embedding", 3)
    ranked(brute) shouldBe handTop3
  }

  test("s12 hand pin: NN-Descent converges to the EXACT graph on the " +
      "fixture, edge-for-edge in rank order (flat IVF seed)") {
    val res = Similarity.nnDescentGraph(spark, fixture, "vec_id",
      "embedding", k = 3, kBuild = 4, rounds = 2)
    ranked(res.edges) shouldBe handTop3
    // ledger shape: one seed entry + one entry per round. Entries count
    // FRESH evaluations only (round 18: previously-evaluated pairs are
    // anti-joined away — an exact skip), so a CONVERGED round may read 0;
    // the seed and the first refinement round must still do work.
    res.simEvals should have size 3
    all(res.simEvals) should be >= 0L
    res.simEvals.head should be > 0L
    res.simEvals(1) should be > 0L
    res.cleanup()
  }

  test("s12 hand pin under the TWO-LEVEL seed quantizer (maxFlatCells " +
      "forced below the fixture so the ivf2 path runs): same exact graph") {
    val res = Similarity.nnDescentGraph(spark, fixture, "vec_id",
      "embedding", k = 3, kBuild = 4, rounds = 2, maxFlatCells = 2)
    ranked(res.edges) shouldBe handTop3
    res.cleanup()
  }

  test("s12 seed-stability: two independent builds produce identical " +
      "edge lists (seeded k-means, deterministic refinement)") {
    def build() = ranked(Similarity.nnDescentGraph(spark, fixture,
      "vec_id", "embedding", k = 3, kBuild = 4, rounds = 2).edges)
    build() shouldBe build()
  }

  test("ivf2 partition contract: every vector lands in exactly one " +
      "(c1, c2) cell, and probing ALL composite cells reproduces brute " +
      "force exactly") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select("vec_id", "embedding")
    val idx = Similarity.buildIvf2Index(spark, emb, "vec_id", "embedding",
      k1 = 4, k2 = 8)
    idx.inverted.count() shouldBe emb.count()
    idx.inverted.select("neighbor_id").distinct().count() shouldBe emb.count()
    idx.centroids1.length shouldBe 4
    idx.residuals2.length shouldBe 8
    val probes = emb.filter(col("vec_id") < 25)
    val full = Similarity.ivf2Search(spark, idx, probes, "vec_id",
      "embedding", k = 5, nprobe1 = 4, nprobe = 32)
    val brute = Similarity.bruteTopK(spark, emb, probes, "vec_id",
      "embedding", 5)
    full.orderBy("p_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq shouldBe
      brute.orderBy("p_id", "rank")
        .as[(Long, Long, Long, Double)].collect().toSeq
  }

  test("ivf2 pruning contract: a partial probe scans a strict subset and " +
      "still finds most true neighbors on the planted-cluster corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select("vec_id", "embedding")
    val idx = Similarity.buildIvf2Index(spark, emb, "vec_id", "embedding",
      k1 = 4, k2 = 8)
    val probes = emb.filter(col("vec_id") < 25)
    val part = Similarity.probe2Cells(spark, idx, probes, "vec_id",
      "embedding", nprobe1 = 2, nprobe = 8)
    // 8 of the ≤ 32 composite cells per probe — the scan is pruned
    part.groupBy("p_id").count().agg(max("count")).head().getLong(0) should
      be <= 8L
    val got = Similarity.ivf2Search(spark, idx, probes, "vec_id",
      "embedding", k = 5, nprobe1 = 2, nprobe = 8)
      .select("p_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = Similarity.bruteTopK(spark, emb, probes, "vec_id",
      "embedding", 5)
      .select("p_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = got.intersect(brute).size.toDouble / brute.size
    recall should be >= 0.5
  }
}
