// spark-shell -I probe: s13 recall/scan at several dials
import org.apache.spark.sql.functions._
import graft.llm.Similarity

for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
  val emb = spark.read.parquet(s"$d/embeddings.parquet").select(col("vec_id"), col("embedding"))
  val probes = emb.filter(col("vec_id") < 5)
  val n = emb.count()
  val exact = Similarity.bruteTopK(spark, emb, probes, "vec_id", "embedding", 10)
    .select("p_id", "neighbor_id")
  val cellsWanted = math.max(128L, n / 32L)
  for (k2 <- Seq(16, 32); npFrac <- Seq(0.4, 0.6)) {
    val k1 = math.max(2L, math.min(2048L, (cellsWanted + k2 - 1) / k2)).toInt
    val idx = Similarity.buildIvf2Index(spark, emb, "vec_id", "embedding", k1, k2)
    val nCells = idx.centroids1.length.toLong * idx.residuals2.length
    val np1 = math.max(4, (idx.centroids1.length + 1) / 2)
    val np = math.max(1L, (nCells * npFrac).toLong).toInt
    val cells = Similarity.probe2Cells(spark, idx, probes, "vec_id", "embedding", np1, np).localCheckpoint()
    val ann = Similarity.ivf2SearchFromCells(spark, idx, cells, 10).select("p_id", "neighbor_id")
    val hits = exact.join(ann, Seq("p_id", "neighbor_id"), "left_semi").count()
    val total = exact.count()
    val scanned = cells.join(idx.inverted.groupBy("c1", "c2").agg(count(lit(1)).as("m")), Seq("c1", "c2"))
      .agg(coalesce(sum(col("m")), lit(0L))).head.getLong(0)
    println(f"S13PROBE $d n=$n k1=$k1 k2=$k2 npFrac=$npFrac np1=$np1 np=$np recall=${hits.toDouble/total}%.3f scanfrac=${scanned.toDouble/(5*n)}%.3f")
  }
}
System.exit(0)
