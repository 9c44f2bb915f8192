package graft

import graft.features.{Capper, TargetTransformer}
import graft.infer.Predictor
import graft.llm.{Dedup, Similarity}
import graft.ml.Trainer
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** The README's "Using graft" snippets, compiled and asserted — if a
  * signature drifts, this spec (and therefore the docs) breaks loudly.
  * Keep the three snippet bodies in sync with README.md verbatim.
  */
class QuickstartSpec extends SparkSpec {
  import spark.implicits._

  test("snippet 1: cap outliers with a fitted Capper") {
    val listings = ((1 to 99).map(_.toDouble) :+ 5000.0).toDF("size")

    // -- README snippet 1 --
    val capper = new Capper(Seq("size"), lowerP = 0.05, upperP = 0.95)
    val capped = capper.fitTransform(listings) // p05/p95 winsorization
    val (lo, hi) = capper.bounds("size")       // fitted state, persistable
    // -- end snippet --

    val sizes = capped.select("size").as[Double].collect()
    all(sizes.map(s => s >= lo && s <= hi)) shouldBe true
    sizes.max should be < 5000.0
  }

  test("snippet 2: near-duplicate pairs on a document corpus") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tomorrow"),
      (3L, "an entirely different document about something else whatsoever"))
      .toDF("doc_id", "text")

    // -- README snippet 2 --
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", minJaccard = 0.5)
    // (doc_a, doc_b, jaccard): banded-LSH candidates, exact verification
    // -- end snippet --

    val got = pairs.select("doc_a", "doc_b").as[(Long, Long)].collect()
    got shouldBe Array((1L, 2L))
  }

  test("snippet 3: train, then serve a single prediction") {
    val train = Seq((40.0, 2.0, 200000.0), (60.0, 3.0, 300000.0),
      (80.0, 4.0, 400000.0), (100.0, 5.0, 500000.0), (120.0, 6.0, 600000.0))
      .toDF("size", "nb_rooms", "price")

    // -- README snippet 3 --
    val tt = new TargetTransformer("price").fit(train) // log target + smearing
    val assembler = new VectorAssembler()
      .setInputCols(Array("size", "nb_rooms")).setOutputCol("features")
    val model = Trainer.randomForest("log_price", numTrees = 20)
      .fit(assembler.transform(tt.transform(train)))
    val predictor = new Predictor(df => assembler.transform(df), model, tt)
    val schema = StructType(Seq(StructField("size", DoubleType),
      StructField("nb_rooms", DoubleType)))
    val price = predictor.predictSingle(spark,
      Map("size" -> 90.0, "nb_rooms" -> 4.0), schema)
    // -- end snippet --

    assert(java.lang.Double.isFinite(price))
    price should (be > 200000.0 and be < 700000.0)
  }

  test("bonus snippet: exact cosine top-k over an embedding column") {
    val corpus = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(0.9f, 0.1f))).toDF("vec_id", "embedding")

    // -- README snippet 4 --
    val nn = Similarity.bruteTopK(spark, corpus, corpus.limit(1),
      "vec_id", "embedding", k = 2) // (p_id, neighbor_id, rank, sim)
    // -- end snippet --

    nn.select("neighbor_id").as[Long].collect().head shouldBe 3L
  }

  test("snippet 5: CCNet-style curation — perplexity filter then weighted sample") {
    // ids ≡ 0 mod 10 so the default calibration slice sees all three;
    // the reference doc "aab" scores worst (tail), "bbb" best (head)
    val docs = Seq((10L, "xx", "aab", true), (20L, "xx", "aba", false),
      (30L, "xx", "bbb", false)).toDF("doc_id", "lang", "text", "is_ref")

    // -- README snippet 5 --
    import graft.llm.Curation
    import org.apache.spark.sql.functions._
    val scored = Curation.perplexityBuckets(docs, "doc_id", "lang", "text",
      isRef = col("is_ref"))                    // (doc_id, lang, avg_nll, bucket)
    val kept = docs.join(
      scored.filter(col("bucket") =!= "tail").select("doc_id"), "doc_id")
    val sample = Curation.weightedSampleTopK(   // Efraimidis–Spirakis
      kept.withColumn("w", lit(1.0)), "doc_id", "w", k = 2)
    // -- end snippet --

    kept.select("doc_id").as[Long].collect().sorted shouldBe Array(20L, 30L)
    sample.select("doc_id").as[Long].collect().sorted shouldBe Array(20L, 30L)
  }
}
