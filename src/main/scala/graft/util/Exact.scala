package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic aggregate builders.
  *
  * Plain `sum(double)` is order-dependent (partial-aggregate merge order is
  * nondeterministic across runs and differs from any other engine), so every
  * aggregate a correctness oracle checks is computed through exact decimal
  * arithmetic and only converted to double at the very end. The resulting
  * values are bit-identical run-to-run and engine-to-engine.
  *
  * These stay inside whole-stage codegen (decimal sum is a codegen'd
  * HashAggregate) and keep map-side partial aggregation, so they cost little
  * over a raw double sum while being reproducible at any scale.
  */
object Exact {

  /** Exact sum: cast to decimal(18,scale) per row, sum exactly, emit double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Deterministic mean: exact decimal sum over the NON-NULL count (standard
    * AVG semantics — sum() skips nulls, so the divisor must too), in double.
    */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double") / count(c)

  /** Deterministic sample stddev via exact first/second moments:
    * sqrt((Σx² − (Σx)²/n) / (n−1)) with both sums carried in decimal and
    * n = non-null count. The double arithmetic at the end is a fixed
    * formula, so the result is reproducible (unlike Welford-merge
    * `stddev_samp`, whose merge order — and therefore last-ulp value —
    * varies with shuffle arrival order).
    */
  def dstd(c: Column): Column = {
    val s  = sum(c.cast(DecimalType(25, 4))).cast("double")
    val s2 = sum((c * c).cast(DecimalType(30, 4))).cast("double")
    val n  = count(c)
    sqrt((s2 - s * s / n) / (n - lit(1.0)))
  }

  /** Fan a CPU-heavy pass out to the session's parallelism. Wide-decimal
    * moment sums pay BigDecimal-class conversion per row (~0.8 µs), so
    * their wall-clock is bounded by input SPLIT count, not data size — a
    * single small parquet file plans 1–3 splits and runs the whole pass
    * nearly single-threaded (measured: a13 5.8 s → 1.4 s at sf0.1 after
    * fanning out). The caller projects to the needed columns FIRST so the
    * shuffle carries only those; when the input already has at least the
    * session's parallelism (any real at-scale scan), this is a no-op with
    * zero added shuffle.
    *
    * SCAN-SHAPED INPUTS ONLY: the partition probe (`df.rdd`) forces
    * physical planning, and under AQE that MATERIALIZES every exchange in
    * `df`'s plan before `repartition` re-executes it — a join/aggregate
    * input would run twice. Both call sites pass bare column projections
    * of a file scan.
    */
  def fanOut(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** DuckDB SQL twin of [[dsum]]. */
  def sqlSum(col: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($col AS DECIMAL(18, $scale))) AS DOUBLE)"

  /** DuckDB SQL twin of [[davg]]. */
  def sqlAvg(col: String, scale: Int = 2): String =
    s"(CAST(SUM(CAST($col AS DECIMAL(18, $scale))) AS DOUBLE) / COUNT($col))"

  /** DuckDB SQL twin of [[dstd]]. */
  def sqlStd(col: String): String = {
    val s  = s"CAST(SUM(CAST($col AS DECIMAL(25, 4))) AS DOUBLE)"
    val s2 = s"CAST(SUM(CAST(($col * $col) AS DECIMAL(30, 4))) AS DOUBLE)"
    s"SQRT(($s2 - $s * $s / COUNT($col)) / (COUNT($col) - 1.0))"
  }
}
