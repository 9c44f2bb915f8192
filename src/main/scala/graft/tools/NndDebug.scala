package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-18 debug: recall + list-state audit of nnDescentGraph at one SF. */
object NndDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val k = 3
    val (kb, rounds) = graft.llm.Similarity.nndDialFor(emb.count())
    val res = graft.llm.Similarity.nnDescentGraph(spark, emb, "vec_id",
      "embedding", k, kBuild = kb, rounds = rounds, seedNprobe = 16)
    val ann = res.edges.select("p_id", "neighbor_id")
    val probes = emb.filter(col("vec_id") < 40)
    val exact = graft.llm.Similarity.bruteTopK(spark, emb, probes,
      "vec_id", "embedding", k).select("p_id", "neighbor_id")
    val hits = exact.join(ann.filter(col("p_id") < 40),
      Seq("p_id", "neighbor_id"), "left_semi").count()
    val total = exact.count()
    val nodes = ann.select("p_id").distinct().count()
    println(s"NNDDBG recall=${hits.toDouble / total} hits=$hits total=$total " +
      s"nodes=$nodes evals=${res.simEvals.mkString("+")}")
    res.cleanup()
    spark.stop()
  }
}
