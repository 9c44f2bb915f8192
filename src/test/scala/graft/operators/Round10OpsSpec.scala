package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fixture math for the round-10 second-wave operators that aren't
  * covered by their own llm/ specs: w11's exact-decimal truncated EWMA.
  */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  test("decayedSum: hand-computed halving weights, exact decimal") {
    // user 1: 10, 20, 40 → 10; 20+10/2=25; 40+20/2+10/4=52.5
    // user 2: single 8 → 8
    val df = Seq((1L, 1L, "10.00"), (1L, 2L, "20.00"), (1L, 3L, "40.00"),
        (2L, 1L, "8.00"))
      .toDF("user_id", "t", "v0")
      .withColumn("v", col("v0").cast(DecimalType(18, 2)))
    val w = Window.partitionBy("user_id").orderBy("t")
    val got = df.withColumn("d", Windows.decayedSum(col("v"), w))
      .select("user_id", "t", "d")
      .as[(Long, Long, BigDecimal)].collect()
      .map { case (u, t, d) => (u, t) -> d }.toMap
    got((1L, 1L)) shouldBe BigDecimal("10.000000000")
    got((1L, 2L)) shouldBe BigDecimal("25.000000000")
    got((1L, 3L)) shouldBe BigDecimal("52.500000000")
    got((2L, 1L)) shouldBe BigDecimal("8.000000000")
  }

  test("decayedSum truncates at 8 lags (O(1) state per key)") {
    // 10 unit values: the 10th row sums only 8 halving terms
    // Σ_{k=0..7} 2^-k = 1.9921875, NOT Σ_{k=0..9}
    val df = (1L to 10L).map(t => (1L, t, "1.00"))
      .toDF("user_id", "t", "v0")
      .withColumn("v", col("v0").cast(DecimalType(18, 2)))
    val w = Window.partitionBy("user_id").orderBy("t")
    val last = df.withColumn("d", Windows.decayedSum(col("v"), w))
      .filter(col("t") === 10).select("d").as[BigDecimal].head()
    last shouldBe BigDecimal("1.992187500")
  }

  test("rangeSearch: threshold on the ROUNDED cosine, boundary inclusive") {
    // probe (1,0): cos to (0.8,0.6) = 0.8 EXACTLY (unit norms) → included
    // at τ=0.8 (boundary); cos to (0,1) = 0 → excluded; self excluded.
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.8f, 0.6f)))
      .toDF("vec_id", "embedding")
    val got = graft.llm.Similarity.rangeSearch(spark, emb,
        emb.filter(col("vec_id") === 1), "vec_id", "embedding", 0.8)
      .select("p_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect().toSeq
    got shouldBe Seq((1L, 3L, 0.8))
    // just above the rounded value → excluded
    graft.llm.Similarity.rangeSearch(spark, emb,
        emb.filter(col("vec_id") === 1), "vec_id", "embedding", 0.800001)
      .count() shouldBe 0
  }
}
