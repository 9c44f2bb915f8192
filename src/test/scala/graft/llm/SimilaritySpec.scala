package graft.llm

import graft.SparkSpec
import graft.functions.CosineSimUtil
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f)),
    (2L, Array(1.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f)),
    (4L, Array(0.9f, 0.1f, 0.0f))).toDF("vec_id", "embedding")

  test("native cosine_sim expression matches hand-computed values") {
    val out = vecs.as("a").crossJoin(vecs.as("b"))
      .filter(col("a.vec_id") === 0 && col("b.vec_id").isin(1, 2, 3))
      .select(col("b.vec_id"),
        Similarity.cosine(spark, col("a.embedding"), col("b.embedding")).as("sim"))
      .orderBy("vec_id").as[(Long, Double)].collect()
    out(0)._2 shouldBe 0.0 +- 1e-9                      // orthogonal
    out(1)._2 shouldBe 1.0 / math.sqrt(2) +- 1e-9       // 45°
    out(2)._2 shouldBe -1.0 +- 1e-9                     // opposite
  }

  test("kernel matches the interpreted formula") {
    val a = Array(0.3f, -0.7f, 2.0f); val b = Array(1.5f, 0.2f, -0.1f)
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    CosineSimUtil.cosine(a, b) shouldBe dot / (na * nb) +- 1e-12
  }

  test("bruteTopK ranks by similarity desc with id tie-break, excludes self") {
    val res = Similarity.bruteTopK(spark, vecs, vecs.filter(col("vec_id") === 0),
      "vec_id", "embedding", 3)
      .select("neighbor_id", "rank").as[(Long, Long)].collect()
    // for probe [1,0,0]: best = 4 (0.994), then 2 (0.707), then 1 (0.0)
    res.map(_._1).toSeq shouldBe Seq(4L, 2L, 1L)
    res.map(_._2).toSeq shouldBe Seq(1L, 2L, 3L)
  }

  test("TopKBuffer bounds the buffer, merges, NaN-guards, and round-trips bytes") {
    val agg = graft.functions.TopKSim(
      org.apache.spark.sql.catalyst.expressions.Literal(0.0),
      org.apache.spark.sql.catalyst.expressions.Literal(0L), 2)
    val b1 = new graft.functions.TopKBuffer(2)
    b1.insert(0.5, 1L); b1.insert(0.9, 2L); b1.insert(Double.NaN, 9L)
    val b2 = new graft.functions.TopKBuffer(2)
    b2.insert(0.7, 3L); b2.insert(0.1, 4L)
    val merged = agg.merge(b1, b2)
    merged.size shouldBe 2
    (merged.scores(0), merged.ids(0)) shouldBe ((0.9, 2L))
    (merged.scores(1), merged.ids(1)) shouldBe ((0.7, 3L))
    // tie on score → lower id wins
    merged.insert(0.9, 1L)
    (merged.scores(0), merged.ids(0)) shouldBe ((0.9, 1L))
    val rt = agg.deserialize(agg.serialize(merged))
    rt.size shouldBe 2
    (rt.scores(0), rt.ids(0), rt.scores(1), rt.ids(1)) shouldBe
      ((0.9, 1L, 0.9, 2L))
  }

  test("lshTopK results are a subset of brute-force candidates with exact sims") {
    val brute = Similarity.bruteTopK(spark, vecs, vecs.filter(col("vec_id") === 0),
      "vec_id", "embedding", 4)
      .select("neighbor_id", "sim").as[(Long, Double)].collect().toMap
    val lsh = Similarity.lshTopK(spark, vecs, vecs.filter(col("vec_id") === 0),
      "vec_id", "embedding", 4)
      .select("neighbor_id", "sim").as[(Long, Double)].collect()
    lsh.foreach { case (id, sim) =>
      brute.keySet should contain(id)
      sim shouldBe brute(id) +- 1e-9 // re-rank is exact cosine
    }
  }

  test("lshTopK dup-retrieval regime: every scaled copy finds its source " +
      "at rank 1 with cos = 1 (recall 1.0 on positive-scaled duplicates)") {
    val rnd = new scala.util.Random(31)
    val corpus = (0 until 120).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") % 3 === 0)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"), x => (x * lit(2.0f)).cast("float"))
          .as("embedding"))
    val got = Similarity.lshTopK(spark, corpus, probes, "vec_id", "embedding", 1)
      .select("p_id", "neighbor_id", "rank", "sim")
      .as[(Long, Long, Long, Double)].collect()
    got.length shouldBe 40 // one rank-1 row per probe: recall 1.0
    got.foreach { case (pId, nId, rank, sim) =>
      nId shouldBe (pId - 1000L) // the planted source
      rank shouldBe 1L
      sim shouldBe 1.0 +- 1e-6
    }
  }

  test("ivfTopK finds the true nearest neighbor with sufficient nprobe") {
    val res = Similarity.ivfTopK(spark, vecs, vecs.filter(col("vec_id") === 0),
      "vec_id", "embedding", 2, nClusters = 2, nprobe = 2)
      .select("neighbor_id", "sim").as[(Long, Double)].collect()
    // with nprobe == nClusters the search is exhaustive → exact top-2
    res.map(_._1).toSeq shouldBe Seq(4L, 2L)
    res.head._2 shouldBe 0.9939 +- 1e-3
  }

  test("embeddingNearDupPairs finds the planted near-identical pair") {
    val pairs = Similarity.embeddingNearDupPairs(spark, vecs, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    pairs should contain((0L, 4L)) // cosine(e0, e4) ≈ 0.9939
  }

  test("ivfTopK: recall@10 >= 0.9 while scanning <= 50% of the corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = emb.filter(col("vec_id") < 5)
    val brute = Similarity.bruteTopK(spark, emb, probes, "vec_id", "embedding", 10)
      .select("p_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val idx = Similarity.buildIvfIndex(spark, emb, "vec_id", "embedding", 256)
    val ivf = Similarity.ivfSearch(spark, idx, probes, "vec_id", "embedding", 10, 80)
      .select("p_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (ivf intersect brute).size.toDouble / brute.size
    recall should be >= 0.9
    // measured scan fraction: members of probed clusters / (nProbes × corpus)
    val sizes = idx.inverted.groupBy("cluster").count()
    val scanned = Similarity.probeClusters(spark, idx, probes, "vec_id", "embedding", 80)
      .join(sizes, "cluster").agg(sum("count")).as[Long].head()
    val scanFrac = scanned.toDouble / (probes.count() * emb.count())
    scanFrac should be <= 0.5
  }

  test("d05 banding: candidate set < 1% of all pairs, recall 1.0 on planted dups") {
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    // positive scaling preserves every hyperplane sign → planted recall
    // must be exactly 1, while random pairs collide in a 16-bit band with
    // prob 2^-16 → candidate set far below 1% of all pairs
    val planted = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), x => (x * lit(1.25f)).cast("float")).as("embedding"))
    val aug = base.unionByName(planted)
    val n = aug.count()
    val nCand = Similarity.hyperplaneCandidatePairs(spark, aug, "vec_id", "embedding").count()
    val allPairs = n.toDouble * (n - 1) / 2
    (nCand / allPairs) should be < 0.01
    val found = Similarity.embeddingNearDupPairs(spark, aug, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = base.filter(col("vec_id") % 10 === 0)
      .select("vec_id").as[Long].collect()
      .map(id => (id, id + 100000L)).toSet
    found shouldBe expected // recall 1.0 and exact precision vs the truth set
  }
}
