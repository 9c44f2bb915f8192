// spark-shell -I probe: flat leg at occupancy-32 sizing (s13's small-n route)
import org.apache.spark.sql.functions._
import graft.llm.Similarity

for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1", "data/gsf1")) {
  val emb = spark.read.parquet(s"$d/embeddings.parquet").select(col("vec_id"), col("embedding"))
  val probes = emb.filter(col("vec_id") < 5)
  val n = emb.count()
  val exact = Similarity.bruteTopK(spark, emb, probes, "vec_id", "embedding", 10)
    .select("p_id", "neighbor_id").localCheckpoint()
  val cells = math.min(2048L, math.max(128L, n / 32L)).toInt
  val idx = Similarity.buildIvfIndex(spark, emb, "vec_id", "embedding", cells)
  val actual = idx.centroids.length
  for (npFrac <- Seq(0.4, 0.5)) {
    val np = math.max(1, (actual * npFrac).toInt)
    val ann = Similarity.ivfSearch(spark, idx, probes, "vec_id", "embedding", 10, np)
      .select("p_id", "neighbor_id")
    val hits = exact.join(ann, Seq("p_id", "neighbor_id"), "left_semi").count()
    val total = exact.count()
    val sizes = idx.inverted.groupBy("cluster").count()
    val scanned = Similarity.probeClusters(spark, idx, probes, "vec_id", "embedding", np)
      .join(sizes, "cluster").agg(coalesce(sum(col("count")), lit(0L))).head.getLong(0)
    println(f"S13D $d n=$n cells=$actual npFrac=$npFrac np=$np recall=${hits.toDouble/total}%.3f scanfrac=${scanned.toDouble/(5*n)}%.3f")
  }
}
System.exit(0)
