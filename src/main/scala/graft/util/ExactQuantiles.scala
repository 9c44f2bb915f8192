package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles (quantile_cont semantics) computed
  * scalably.
  *
  * Spark's built-in `percentile` is an imperative aggregate that buffers
  * EVERY value in the aggregation buffer — on a 100 TB column that is an
  * OOM, not a plan. This computes the identical result through a
  * distributed value-frequency table:
  *
  *   1. groupBy(value) → count: map-side combined, output rows = DISTINCT
  *      values (50 for an int code column, ~10⁷ for 2-dp prices), spread
  *      across the cluster — never the raw rows.
  *   2. cumulative counts over the value order (one narrow window over the
  *      small frequency table; single-partition by design, documented —
  *      the frame is O(distinct values), not O(rows)).
  *   3. each requested quantile reads exactly two frequency rows and
  *      interpolates v_k + (v_{k+1} − v_k)·frac at 1-indexed position
  *      h = (n−1)·p + 1 — the same order-statistic formula as
  *      `percentile` / DuckDB `quantile_cont`, so oracles stay bit-exact.
  *
  * Suitable whenever the column's distinct-value count is bounded (ints,
  * decimals, bucketed doubles) — the common case for capping and summary
  * stats. For truly unbounded continuous columns at scale, the GK sketch
  * ([[org.apache.spark.sql.DataFrameStatFunctions.approxQuantile]], q20)
  * is the right tool.
  */
object ExactQuantiles {

  /** One-row frame of exact quantiles: `probs` maps output column name →
    * probability in [0, 1]. Nulls in `valueCol` are excluded (standard
    * percentile semantics).
    */
  def quantilesRow(df: DataFrame, valueCol: String, probs: Seq[(String, Double)]): DataFrame = {
    val freq = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy("v")
    val cum = freq.select(
      col("v"), col("cnt"),
      sum("cnt").over(w).as("cum"),
      lead("v", 1).over(w).as("v_next"))
    val total = cum.agg(sum("cnt").as("n"))
    val withN = cum.crossJoin(broadcast(total))

    // every quantile reads off the same frame in ONE final aggregate: the
    // per-row expression is non-null only on the frequency row holding
    // rank k, so max() just picks that row's interpolated value
    val aggs: Seq[Column] = probs.map { case (name, p) =>
      // 1-indexed continuous position h = (n-1)p + 1; k = floor(h)
      val h = (col("n") - 1) * lit(p) + 1
      val k = floor(h)
      val frac = h - k
      // if rank k+1 falls in the same frequency row, v_{k+1} = v
      val vk1 = when(col("cum") >= k + 1, col("v")).otherwise(coalesce(col("v_next"), col("v")))
      max(when(col("cum") >= k && (col("cum") - col("cnt")) < k,
        col("v") + (vk1 - col("v")) * frac)).as(name)
    }
    withN.agg(aggs.head, aggs.tail: _*)
  }
}
