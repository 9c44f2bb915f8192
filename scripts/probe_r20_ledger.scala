// Round-20 SCALE.md ledger probe: s17 drift/repair health numbers and
// s18 incremental-vs-full compaction IO at one data dir (env GRAFT_DIR).
// REPL-SAFE FORMATTING: -I evaluates top-level statements line by line,
// so a leading-dot continuation after a COMPLETE expression silently
// binds the val to the prefix (the round-17 ledger bug: the drift
// transform never applied). Keep every multi-line expression inside
// unbalanced parens/braces.
// run: GRAFT_DIR=data/gsf10 /opt/spark/bin/spark-shell --master local[32] \
//   --driver-memory 64g --conf spark.sql.shuffle.partitions=32 \
//   --driver-class-path target/scala-2.13/classes -I scripts/probe_r20_ledger.scala
import org.apache.spark.sql.functions._
import graft.llm.Similarity

object LedgerRun {
  def main(spark: org.apache.spark.sql.SparkSession): Unit = {
    val dir = sys.env("GRAFT_DIR")
    val tag = new java.io.File(dir).getName
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"LEDGER $tag $label secs=${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = emb.count()
    println(s"LEDGER $tag n=$n")

    // ---- s17: drift + repair ----------------------------------------
    val base = emb.filter(col("vec_id") % 3 < 2)
    val drifted = emb.filter(col("vec_id") % 3 === 2)
      .select(col("vec_id"), transform(col("embedding"),
        x => (x + lit(1.0f)).cast("float")).as("embedding"))
    val p17s = s"/tmp/graft_ledger_s17_$tag"
    val p17d = s"/tmp/graft_ledger_s17_${tag}_re"
    val idx = timed("s17_fit_build")(
      Similarity.buildIvfIndex(spark, base, "vec_id", "embedding", 512))
    timed("s17_store_write")(Similarity.writeIvfIndex(idx, p17s))
    timed("s17_drift_append")(
      Similarity.appendToIvfIndex(drifted, "vec_id", "embedding", p17s, "drift1"))
    val (h0, h1) = timed("s17_health_check")(Similarity.ivfIndexHealth(spark, p17s))
    timed("s17_requantize")(Similarity.requantizeIvfIndex(spark, p17s, p17d, 512))
    val h2 = Similarity.readIvfMeta(spark, p17d).health.get
    println(f"LEDGER $tag s17_health fit=(${h0.occMaxOverMean}%.2f,${h0.meanResidual}%.5f) " +
      f"drifted=(${h1.occMaxOverMean}%.2f,${h1.meanResidual}%.5f) " +
      f"requantized=(${h2.occMaxOverMean}%.2f,${h2.meanResidual}%.5f) " +
      s"degrade=${h1.occMaxOverMean > h0.occMaxOverMean && h1.meanResidual > h0.meanResidual} " +
      s"repair=${h2.occMaxOverMean < h1.occMaxOverMean && h2.meanResidual < h1.meanResidual}")

    // ---- s18: incremental vs full compaction IO ----------------------
    val s1 = emb.filter(col("vec_id") % 3 === 2 && col("vec_id") % 2 === 0)
    val s2 = emb.filter(col("vec_id") % 3 === 2 && col("vec_id") % 2 === 1)
    val p18s = s"/tmp/graft_ledger_s18_$tag"
    val p18f = s"/tmp/graft_ledger_s18_${tag}_full"
    Similarity.writeIvfIndex(Similarity.IvfIndex(
      Similarity.assignToCentroids(spark, base, "vec_id", "embedding",
        idx.centroids), idx.centroids), p18s)
    Similarity.appendToIvfIndex(s1, "vec_id", "embedding", p18s, "shard1")
    Similarity.appendToIvfIndex(s2, "vec_id", "embedding", p18s, "shard2")
    Similarity.tombstoneIvfIndex(spark, p18s,
      emb.filter(col("vec_id") % 3 === 2 && col("vec_id") % 4 === 0)
        .select("vec_id"), "vec_id", "t1")
    val total = Similarity.readIvfMeta(spark, p18s).gens
      .map(g => spark.read.parquet(s"$p18s/inverted/gen=$g").count()).sum
    val rep = timed("s18_incremental_compaction")(
      Similarity.compactIvfGenerations(spark, p18s, 0.1))
    println(s"LEDGER $tag s18_io store_rows=$total rewritten=${rep.rowsRewritten} " +
      s"reclaimed=${rep.rowsReclaimed} hot=${rep.rewritten.map(_._1).mkString(",")} " +
      s"cold=${rep.coldGens.mkString(",")} " +
      f"rewrite_frac=${rep.rowsRewritten.toDouble / total}%.4f")
    timed("s18_full_compaction_same_store")(
      Similarity.compactIvfIndex(spark, p18s, p18f))
  }
}
LedgerRun.main(spark)
System.exit(0)
