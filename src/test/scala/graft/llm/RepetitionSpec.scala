package graft.llm

import graft.SparkSpec
import graft.functions.{GraftFunctions, RepetitionCounter}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def stats(text: String): (Long, Long, Long, Long, Long, Long) = {
    val r = new RepetitionCounter().stats(UTF8String.fromString(text))
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
  }

  test("kernel counts words, distinct, top, runs, bigrams on hand cases") {
    // "a b a b": 4 words, 2 distinct, top=2, max_run=1,
    // bigrams: "a b"×2, "b a"×1 → 3 total, 1 duplicate occurrence
    stats("a b a b") shouldBe ((4L, 2L, 2L, 1L, 3L, 1L))
    // "x x x y": run of 3, bigrams "x x"×2 + "x y" → dup 1
    stats("x x x y") shouldBe ((4L, 2L, 3L, 3L, 3L, 1L))
    // all-distinct: no repetition anywhere
    stats("p q r") shouldBe ((3L, 3L, 1L, 1L, 2L, 0L))
    // single word: run of 1, no bigrams
    stats("solo") shouldBe ((1L, 1L, 1L, 1L, 0L, 0L))
    // empty text and all-space text: all-zero counters
    stats("") shouldBe ((0L, 0L, 0L, 0L, 0L, 0L))
    stats("   ") shouldBe ((0L, 0L, 0L, 0L, 0L, 0L))
    // multiple spaces collapse (split-semantics: empty tokens skipped)
    stats("a  a") shouldBe ((2L, 1L, 2L, 2L, 1L, 0L))
  }

  test("repetition_stats expression matches the kernel through codegen") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq((1L, "a b a b"), (2L, "x x x y"), (3L, "p q r"))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        call_function("repetition_stats", col("text")).as("r"))
      .select(col("doc_id"), col("r.word_cnt"), col("r.distinct_cnt"),
        col("r.top_cnt"), col("r.max_run"), col("r.bigram_cnt"),
        col("r.dup_bigram_cnt"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    out(0) shouldBe ((1L, 4L, 2L, 2L, 1L, 3L, 1L))
    out(1) shouldBe ((2L, 4L, 2L, 3L, 3L, 3L, 1L))
    out(2) shouldBe ((3L, 3L, 3L, 1L, 1L, 2L, 0L))
  }

  test("semanticDedupSurvivors keeps min id per near-dup group and all singletons") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(2.0f, 0.0f, 0.0f), 0),   // cos=1 with 0 → dropped
      (2L, Array(0.0f, 1.0f, 0.0f), 1),   // orthogonal singleton → kept
      (3L, Array(0.0f, 2.0f, 0.0f), 1),   // cos=1 with 2 → dropped
      (4L, Array(0.0f, 0.0f, 1.0f), 2))   // singleton → kept
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.semanticDedupSurvivors(spark, vecs,
      "vec_id", "embedding", 0.9)
      .select("vec_id").as[Long].collect().sorted
    out.toSeq shouldBe Seq(0L, 2L, 4L)
  }
}
