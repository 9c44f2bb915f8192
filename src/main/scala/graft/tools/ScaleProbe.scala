package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Count-based scale probes. Wall-times on this host are episodically
  * noisy (SCALE.md "Measurement noise"), so scale conclusions are
  * grounded in COUNTS — candidate volumes, kept-shingle rows — measured
  * by the COMPILED library code across recipe-identical GenData dirs.
  *
  * Usage: runMain graft.tools.ScaleProbe d09 <dataDir> [<dataDir> ...]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleProbe <probe> <dataDir>...")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.hugeMethodLimit",
        sys.env.getOrElse("SPARK_GRAFT_HUGE_LIMIT", "65535"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    args(0) match {
      case "d09" => args.drop(1).foreach(d => d09Counts(spark, d))
      case "d02" => args.drop(1).foreach(d => d02Counts(spark, d, 2))
      case "d02r3" => args.drop(1).foreach(d => d02Counts(spark, d, 3))
      case other => sys.error(s"unknown probe: $other")
    }
    spark.stop()
  }

  /** Counts [[Dedup.minhashPairs]]'s banded candidate set and output at
    * θ = 0.5 on the documents table — the d02 declared query's shape.
    */
  private def d02Counts(spark: SparkSession, dir: String, r: Int): Unit = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val res = f
      println(f"PROBE d02(r=$r) $dir $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      res
    }
    val candN = timed("candidates")(
      Dedup.minhashCandidateKeys(docs, "doc_id", "text", 0.5, 8, r)._2.count())
    spark.catalog.clearCache() // shingleAndBand caches per call (see Dedup)
    val outN = timed("output_run1")(
      Dedup.minhashPairs(docs, "doc_id", "text", 0.5, 8, r).count())
    spark.catalog.clearCache()
    val out2 = timed("output_run2")(
      Dedup.minhashPairs(docs, "doc_id", "text", 0.5, 8, r).count())
    spark.catalog.clearCache()
    println(s"PROBE d02(r=$r) $dir COUNTS candidates=$candN pairs=$outN pairs2=$out2")
  }

  /** Replays the d09 declared query's augmented corpus (every 50th doc
    * re-planted under id+100000 with a 12-token copied span) and counts
    * each stage of [[Dedup.longSubstringPairs]]: kept positioned
    * shingles, phase-1 candidate pairs, final qualifying pairs. The
    * candidate count is THE scale signal — it must track planted-dup
    * density (linear), not background shingle collisions (quadratic).
    */
  private def d09Counts(spark: SparkSession, dir: String): Unit = {
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val planted = base.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(lit("zzp"), col("doc_id"), lit(" zzq"), col("doc_id"),
          lit(" "), array_join(slice(split(col("text"), " "), 5, 12), " "),
          lit(" zzr"), col("doc_id")).as("text"))
    val corpus = base.unionByName(planted)
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE d09 $dir $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val kept = Dedup.keptPositionedShingles(corpus, "doc_id", "text", 8, 32)
    val keptN = timed("kept_shingles")(kept.count())
    val candN = timed("candidates")(
      Dedup.longSubstringCandidates(kept, 8, 12).count())
    val outN = timed("output_run1")(
      Dedup.longSubstringPairs(corpus, "doc_id", "text", 8, 12, 32).count())
    val t2 = timed("output_run2")(
      Dedup.longSubstringPairs(corpus, "doc_id", "text", 8, 12, 32).count())
    println(s"PROBE d09 $dir COUNTS kept=$keptN candidates=$candN " +
      s"pairs=$outN pairs2=$t2")
  }
}
