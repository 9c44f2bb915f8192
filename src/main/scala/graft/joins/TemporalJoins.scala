package graft.joins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Joins Spark lacks as primitives, built as compositions of the operators
  * it executes well — the brief's preference order (a): compose existing
  * ops before reaching for a custom SparkPlan.
  */
object TemporalJoins {

  /** As-of join: for every left row, the single most recent right row with
    * `right.ts <= left.ts` on the same key (the kdb+ `aj` / pandas
    * `merge_asof` semantics, left-outer).
    *
    * Implementation is the distributed MERGE pattern, not a range join:
    * union both sides tagged, shuffle ONCE on the key, sort each partition
    * by (ts, side) — right rows sort before left at equal ts, making the
    * match inclusive — and carry the latest right payload forward with
    * `last(_, ignoreNulls)` over the running frame. Cost is one shuffle +
    * one sort, identical to a groupBy on the key; no N×M candidate
    * explosion, no broadcast requirement on either side — this survives
    * 100 TB on both inputs as long as single keys fit a partition's sort
    * spill (and skewed keys can be salted upstream like any other join).
    *
    * `left`/`right` must expose `keyCol` and long-typed `tsCol`; right
    * payload columns are the remaining `valCols`. Returns every left row +
    * `asof_ts` (nullable) + the right `valCols` (nullable).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // side 1 = left (probe), side 0 = right (build): right first at ts ties
    val rTagged = right.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("__side"),
        col(tsCol).as("asof_ts")) ++ valCols.map(col) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("__side"),
        lit(null).cast("long").as("asof_ts")) ++
        valCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col): _*)
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = ("asof_ts" +: valCols).foldLeft(rTagged.unionByName(lTagged)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ ("asof_ts" +: valCols).map(col): _*)
  }

  /** Point-in-interval range join via band bucketing: `points.pCol` joined
    * to every interval with `lo <= p < hi`. Spark plans a raw inequality
    * join as BroadcastNestedLoop (O(N·M) — a scale-killer), so intervals
    * are exploded to the width-`bandWidth` buckets they overlap and the
    * join becomes a bucket EQUI-join + exact residual filter. Candidate
    * fan-out per interval is ceil(span/bandWidth)+1; fp division is
    * monotone, so a point satisfying lo <= p < hi always lands in a bucket
    * the interval covers — bucketing never loses matches, it only prunes.
    */
  def rangeJoinBanded(points: DataFrame, pCol: String, intervals: DataFrame,
      loCol: String, hiCol: String, bandWidth: Double): DataFrame = {
    val expanded = intervals.withColumn("__band",
      explode(sequence(
        floor(col(loCol) / bandWidth).cast("long"),
        floor(col(hiCol) / bandWidth).cast("long"))))
    points.withColumn("__band", floor(col(pCol) / bandWidth).cast("long"))
      .join(expanded, Seq("__band"))
      .filter(col(pCol) >= col(loCol) && col(pCol) < col(hiCol))
      .drop("__band")
  }
}
