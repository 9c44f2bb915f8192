package graft.analysis

import graft.util.Exact
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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

  /** a13 — pairwise Pearson correlation matrix in ONE distributed pass
    * (the reference collects to pandas and calls .corr():
    * notebooks/01_exploratory_data_analysis.py:253-254 — a driver-side OOM
    * at scale; this is a single partial+final hash aggregate of
    * O(k²) moments regardless of row count).
    *
    * corr(x,y) = (n·Σxy − Σx·Σy) / √((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²)),
    * every sum carried in exact decimal (see [[graft.util.Exact]]) so the
    * result is bit-deterministic across partitionings and engines; the
    * closed-form double arithmetic happens once at the end. Columns must be
    * null-free (cast to double internally) — ENFORCED: the same aggregate
    * pass carries count(col) per column, and any column whose non-null
    * count trails count(*) raises a descriptive error instead of silently
    * producing correlations computed from mismatched n.
    * Output long-form: (col_a, col_b, corr) per unordered pair, given-order.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    val pairs = for {
      (a, i) <- cols.zipWithIndex; b <- cols.drop(i + 1)
    } yield (a, b)
    def d(c: String): Column = col(c).cast("double")
    val moments: Seq[Column] =
      count(lit(1)).as("n") +:
        (cols.flatMap(c => Seq(
          count(d(c)).as(s"cnt__$c"),
          sum(d(c).cast(DecimalType(25, 6))).cast("double").as(s"s__$c"),
          sum((d(c) * d(c)).cast(DecimalType(30, 6))).cast("double").as(s"s2__$c"))) ++
          pairs.map { case (a, b) =>
            sum((d(a) * d(b)).cast(DecimalType(30, 6))).cast("double").as(s"sp__${a}__$b")
          })
    // k(k+1)/2 + k wide-decimal sums per row are CPU-bound, not IO-bound:
    // project to the k columns, then fan out so the pass parallelizes even
    // when the scan planned few splits (Exact.fanOut is a no-op otherwise)
    val m = Exact.fanOut(df.select(cols.map(col): _*))
      .agg(moments.head, moments.tail: _*)
    val entries = array(pairs.map { case (a, b) =>
      val n = col("n")
      val hasNulls = col(s"cnt__$a") =!= n || col(s"cnt__$b") =!= n
      val num = n * col(s"sp__${a}__$b") - col(s"s__$a") * col(s"s__$b")
      val den = sqrt((n * col(s"s2__$a") - col(s"s__$a") * col(s"s__$a")) *
        (n * col(s"s2__$b") - col(s"s__$b") * col(s"s__$b")))
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        when(hasNulls,
          raise_error(lit(s"corrMatrix: nulls in $a or $b — moment sums skip " +
            "nulls while n counts all rows; drop or impute first")))
          .otherwise(round(num / den, 6)).as("corr"))
    }: _*)
    m.select(explode(entries).as("e")).select(col("e.col_a"), col("e.col_b"), col("e.corr"))
  }

  /** a12 — prediction error analysis, computed natively (the reference drops
    * to pandas: notebooks/03_model_training.py:157-179).
    */
  /** Leave-one-out target encoding: each row's category replaced by the
    * mean target over the OTHER rows of its category — (S_cat − y_i) /
    * (n_cat − 1) — the standard high-cardinality categorical feature
    * that plain per-category means would leak (a row's own target
    * flows into its own feature; LOO removes exactly that term).
    * Singleton categories have no LOO estimate → null (callers impose
    * their prior). Exactness: S is an exact decimal sum; the single
    * terminal division runs in double (IEEE-deterministic) and rounds
    * to 6 dp — the repo's round-before-compare contract. Plan: one
    * map-side-combined groupBy over the category domain (a DIMENSION,
    * tiny by definition) broadcast-joined back onto the scan — no
    * window, no per-category task skew, scan-shaped at any corpus size.
    */
  def looTargetEncoding(df: DataFrame, catCol: String, targetCol: String,
      scale: Int = 2): DataFrame = {
    val stats = df.groupBy(catCol).agg(
      sum(col(targetCol).cast(DecimalType(18, scale))).as("__s"),
      count(col(targetCol)).as("__n"))
    df.join(broadcast(stats), catCol)
      .withColumn("loo_enc",
        when(col("__n") > 1,
          round((col("__s") - col(targetCol).cast(DecimalType(18, scale)))
            .cast("double") / (col("__n") - 1), 6)))
      .drop("__s", "__n")
  }

  def errorAnalysis(df: DataFrame, predCol: String, labelCol: String): DataFrame = {
    val err = (col(predCol) - col(labelCol)) / col(labelCol) * 100
    df.select(err.as("err_pct")).agg(
      count(lit(1)).as("n"),
      round(avg(col("err_pct")), 6).as("mean_err_pct"),
      round(min(col("err_pct")), 6).as("min_err_pct"),
      round(max(col("err_pct")), 6).as("max_err_pct"))
  }
}
