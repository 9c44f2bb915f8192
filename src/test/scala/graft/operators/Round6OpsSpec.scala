package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Engine-side semantics of the round-6 operators that the DuckDB oracle
  * can't see: bloom pruning actually prunes (and never drops a match),
  * scalar quantization's error bound, running-distinct's frame rule, and
  * the mixture sampler's determinism under repartitioning.
  */
class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  test("bloom pre-filter never drops a true match and prunes most non-matches") {
    val keys = (1L to 10000L).toDF("k")
    val dim = (1L to 100L).map(_ * 97).toDF("dk") // 100 of the 10k keys
    val bf = dim.stat.bloomFilter("dk", 100, 0.01)
    val bfBc = spark.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bfBc.value.mightContainLong(k))
    val kept = keys.filter(mightContain(col("k"))).as[Long].collect().toSet
    // no false negatives: every dim key survives the filter
    dim.as[Long].collect().foreach(dk => assert(kept.contains(dk)))
    // prunes: ~1% fpp over 9900 non-members → well under 5% survivors
    kept.size should be < 600
  }

  test("int8 scalar quantization: round-trip error ≤ step/2 per dimension") {
    val lo = -2.0f; val hi = 3.0f; val step = (hi - lo) / 255.0f
    val vals = Seq(-2.0f, -1.37f, 0.0f, 0.5f, 2.99f, 3.0f)
    vals.foreach { v =>
      val code = math.round((v - lo) / step)
      code should (be >= 0 and be <= 255)
      val dq = lo + code * step
      math.abs(dq - v) should be <= step / 2 + 1e-6f
    }
  }

  test("running distinct count: first-occurrence flag matches set semantics") {
    val events = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "c"), (1L, 5L, "b"),
      (2L, 6L, "x"), (2L, 7L, "x"))
      .toDF("user_id", "event_id", "event_type")
      .withColumn("ts", col("event_id") * 1000)
    val firstW = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    val cumW = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Long.MinValue, 0)
    val out = events
      .withColumn("f", when(row_number().over(firstW) === 1, 1).otherwise(0))
      .select(col("event_id"), sum("f").over(cumW).as("d"))
      .as[(Long, Long)].collect().toMap
    out(1L) shouldBe 1; out(2L) shouldBe 2; out(3L) shouldBe 2
    out(4L) shouldBe 3; out(5L) shouldBe 3
    out(6L) shouldBe 1; out(7L) shouldBe 1
  }

  test("mixture sampler keeps the same rows under any partitioning") {
    def kept(parts: Int): Set[Long] = {
      val docs = (0L until 1000L).toDF("doc_id").repartition(parts)
      val u = (col("doc_id") * lit(2654435761L)) % lit(4294967296L) /
        lit(4294967296.0d)
      docs.filter(u < 0.25).as[Long].collect().toSet
    }
    val k1 = kept(1)
    kept(7) shouldBe k1
    kept(32) shouldBe k1
    // and the rate lands near the target on uniform ids
    k1.size.toDouble / 1000.0 shouldBe 0.25 +- 0.05
  }

  test("planted-shift KMeans recovers the label partition exactly") {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val rows = (0 until 200).map { i =>
      val label = i % 4
      val base = Array.tabulate(8)(j => math.sin(i * 7 + j).toFloat) // noise ~[-1,1]
      base(0) = base(0) + label * 100.0f
      (i.toLong, label, base)
    }.toDF("id", "label", "embedding")
    val emb = rows.select(col("id"), col("label"),
      array_to_vector(col("embedding")).as("features"))
    val model = new KMeans().setK(4).setSeed(42).setMaxIter(20).fit(emb)
    val pred = model.transform(emb).select("prediction", "label")
      .as[(Int, Int)].collect()
    // purity 1.0: each cluster maps to exactly one label
    pred.groupBy(_._1).values.foreach(g => g.map(_._2).distinct.length shouldBe 1)
  }
}
