// spark-shell -I probe: ivf2 leg in its DESIGN regime (n=200k, gsf10)
import org.apache.spark.sql.functions._
import graft.llm.Similarity

val d = "data/gsf10"
val emb = spark.read.parquet(s"$d/embeddings.parquet").select(col("vec_id"), col("embedding"))
val probes = emb.filter(col("vec_id") < 5)
val n = emb.count()
val exact = Similarity.bruteTopK(spark, emb, probes, "vec_id", "embedding", 10)
  .select("p_id", "neighbor_id").localCheckpoint()
val cellsWanted = math.max(128L, n / 32L)
val k2 = 32
val k1 = math.max(2L, math.min(2048L, (cellsWanted + k2 - 1) / k2)).toInt
val t0 = System.nanoTime()
val idx0 = Similarity.buildIvf2Index(spark, emb, "vec_id", "embedding", k1, k2)
val idx = idx0.copy(inverted = idx0.inverted.persist())
println(f"S13C build ${(System.nanoTime()-t0)/1e9}%.1f s k1=$k1 k2=$k2")
val sizes = idx.inverted.groupBy("c1", "c2").agg(count(lit(1)).as("m")).persist()
for (npFrac <- Seq(0.02, 0.05, 0.1, 0.2, 0.4)) {
  val nCells = k1.toLong * k2
  val np1 = math.max(4, (k1 + 1) / 2)
  val np = math.max(1L, (nCells * npFrac).toLong).toInt
  val t1 = System.nanoTime()
  val cells = Similarity.probe2Cells(spark, idx, probes, "vec_id", "embedding", np1, np).localCheckpoint()
  val ann = Similarity.ivf2SearchFromCells(spark, idx, cells, 10).select("p_id", "neighbor_id")
  val hits = exact.join(ann, Seq("p_id", "neighbor_id"), "left_semi").count()
  val secs = (System.nanoTime()-t1)/1e9
  val total = exact.count()
  val scanned = cells.join(sizes, Seq("c1", "c2"))
    .agg(coalesce(sum(col("m")), lit(0L))).head.getLong(0)
  println(f"S13C $d n=$n k1=$k1 k2=$k2 npFrac=$npFrac np=$np recall=${hits.toDouble/total}%.3f scanfrac=${scanned.toDouble/(5*n)}%.3f search_s=$secs%.1f")
}
System.exit(0)
