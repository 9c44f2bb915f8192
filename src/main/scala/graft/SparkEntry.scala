package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the LLM-pipeline
  * extensions) is declared here as a named query over the testdata dir,
  * with a DuckDB oracle twin where the semantics are SQL-expressible.
  */
object SparkEntry {

  /** All declared query specs, grouped by module. */
  def specs: Seq[QSpec] =
    operators.Relational.specs ++ operators.Composite.specs ++
      operators.Windows.specs ++ operators.LlmOps.specs ++
      operators.MlOps.specs ++ operators.Extras.specs ++
      operators.CorpusOps.specs ++ operators.StreamOps.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The SURVEY §7 step-1 slice: scan + broadcast join + hash agg + sort.
    */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q14.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver records a weaker rows-only check for those).
    */
  def oracleSql: Map[String, String] =
    specs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
