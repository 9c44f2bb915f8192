package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness testdata tables (TPC-H-ish star schema plus
  * `events`/`documents`/`embeddings`; see /root/repo/TESTDATA.md).
  *
  * All declared queries read parquet directly so Catalyst gets full
  * predicate-pushdown / column-pruning into the vectorized parquet scan.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS), which Spark only reads (as
    // long nanos) under this flag; it is runtime-settable, so set it here
    // defensively for sessions that didn't configure it at build time
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Scratch dir (inside the repo) for sink/round-trip queries. Keyed by the
    * scale-factor dir name so concurrent sf runs don't clobber each other.
    */
  def scratch(sfDir: String, qname: String): String = {
    val sf = new java.io.File(sfDir).getName
    s"/root/repo/target/qtmp/$sf/$qname"
  }
}
