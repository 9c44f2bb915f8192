package graft.analysis

import graft.util.Exact
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling operators (SURVEY §2 a08/a11/a12), each a single
  * distributed job — the reference loops one Spark action per column
  * (notebooks/01_exploratory_data_analysis.py:73-91), which at 100 TB means
  * O(columns) full scans; these do one pass.
  */
object Profile {

  /** a08 — per-column null counts in ONE pass:
    * select sum(when(isNull,1)) per column + total count.
    */
  def nullAudit(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] =
      count(lit(1)).cast("long").as("row_cnt") +:
        cols.map(c => sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as(s"${c}_nulls"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** a11 — category profile: frequency + value stats per category, most
    * frequent first (notebooks/01_exploratory_data_analysis.py:138-175).
    */
  def categoryProfile(df: DataFrame, catCol: String, valueCol: String): DataFrame =
    df.groupBy(catCol).agg(
      count(lit(1)).as("cnt"),
      Exact.davg(col(valueCol)).as(s"avg_$valueCol"),
      min(valueCol).as(s"min_$valueCol"),
      max(valueCol).as(s"max_$valueCol"))
      .orderBy(col("cnt").desc, col(catCol))

  /** a12 — prediction error analysis, computed natively (the reference drops
    * to pandas: notebooks/03_model_training.py:157-179).
    */
  def errorAnalysis(df: DataFrame, predCol: String, labelCol: String): DataFrame = {
    val err = (col(predCol) - col(labelCol)) / col(labelCol) * 100
    df.select(err.as("err_pct")).agg(
      count(lit(1)).as("n"),
      round(avg(col("err_pct")), 6).as("mean_err_pct"),
      round(min(col("err_pct")), 6).as("min_err_pct"),
      round(max(col("err_pct")), 6).as("max_err_pct"))
  }
}
