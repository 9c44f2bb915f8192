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

  test("decayedSumNanos: hand-computed halving weights, exact integers") {
    // user 1: 10, 20, 40 → 10; 20+10/2=25; 40+20/2+10/4=52.5
    // user 2: single 8 → 8   (all ×10⁹ in nanos)
    val df = Seq((1L, 1L, 1000L), (1L, 2L, 2000L), (1L, 3L, 4000L),
        (2L, 1L, 800L))
      .toDF("user_id", "t", "c") // integer cents
    val w = Window.partitionBy("user_id").orderBy("t")
    val got = df.withColumn("d", Windows.decayedSumNanos(col("c"), w))
      .select("user_id", "t", "d")
      .as[(Long, Long, Long)].collect()
      .map { case (u, t, d) => (u, t) -> d }.toMap
    got((1L, 1L)) shouldBe 10000000000L
    got((1L, 2L)) shouldBe 25000000000L
    got((1L, 3L)) shouldBe 52500000000L
    got((2L, 1L)) shouldBe 8000000000L
  }

  test("decayedSumNanos truncates at 8 lags (O(1) state per key)") {
    // 10 unit values: the 10th row sums only 8 halving terms
    // Σ_{k=0..7} 2^-k = 1.9921875, NOT Σ_{k=0..9}
    val df = (1L to 10L).map(t => (1L, t, 100L)).toDF("user_id", "t", "c")
    val w = Window.partitionBy("user_id").orderBy("t")
    val last = df.withColumn("d", Windows.decayedSumNanos(col("c"), w))
      .filter(col("t") === 10).select("d").as[Long].head()
    last shouldBe 1992187500L
  }

  test("decayedSumNanos ≡ retired decimal form × 10⁹ on the sf0.01 slice") {
    // The migration-safety pin for the w11 BIGINT rewrite: on the real
    // purchase stream both formulations must agree on every row (the
    // decimal form was locally bit-exact vs DuckDB 1.0.0; the nanos form
    // replaces it only to kill decimal-width version skew in the oracle).
    val ev = graft.util.Tables.events(spark, "/root/testdata/sf0.01")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("t_us"),
        col("value").cast(DecimalType(18, 2)).as("v"))
      .withColumn("c", (col("v") * lit(100)).cast("long"))
    val w = Window.partitionBy("user_id").orderBy(col("t_us"), col("event_id"))
    val both = ev
      .withColumn("nanos", Windows.decayedSumNanos(col("c"), w))
      .withColumn("dec_nanos",
        (Windows.decayedSum(col("v"), w) * lit(1000000000L)).cast("long"))
    both.count() should be > 0L
    both.filter(col("nanos") =!= col("dec_nanos")).count() shouldBe 0L
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
