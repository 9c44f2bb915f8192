// s17 drift-dial sweep at one dir (env GRAFT_DIR): which shift degrades
// BOTH health metrics at this scale and stays refit-repairable?
import org.apache.spark.sql.functions._
import graft.llm.Similarity

val dir = sys.env("GRAFT_DIR")
val tag = new java.io.File(dir).getName
val emb = spark.read.parquet(s"$dir/embeddings.parquet").select("vec_id", "embedding")
val base = emb.filter(col("vec_id") % 3 < 2)
val idx = Similarity.buildIvfIndex(spark, base, "vec_id", "embedding", 512)
val h0 = Similarity.computeIvfHealth(spark, idx.inverted, idx.centroids)
for (shift <- Seq(1.0f)) {
  val drifted = emb.filter(col("vec_id") % 3 === 2)
    .select(col("vec_id"), transform(col("embedding"),
      x => (x + lit(shift)).cast("float")).as("embedding"))
  val appended = idx.inverted.unionByName(
    Similarity.assignToCentroids(spark, drifted, "vec_id", "embedding", idx.centroids))
  val h1 = Similarity.computeIvfHealth(spark, appended, idx.centroids)
  val refit = Similarity.buildIvfIndex(spark,
    appended.select(col("neighbor_id"), col("emb")), "neighbor_id", "emb", 512)
  val h2 = Similarity.computeIvfHealth(spark, refit.inverted, refit.centroids)
  println(f"PROBE s17b $tag shift=$shift h0=(${h0.occMaxOverMean}%.2f,${h0.meanResidual}%.5f) " +
    f"h1=(${h1.occMaxOverMean}%.2f,${h1.meanResidual}%.5f) h2=(${h2.occMaxOverMean}%.2f,${h2.meanResidual}%.5f) " +
    s"degrade=${h1.occMaxOverMean > h0.occMaxOverMean && h1.meanResidual > h0.meanResidual} " +
    s"repair=${h2.occMaxOverMean < h1.occMaxOverMean && h2.meanResidual < h1.meanResidual}")
}
System.exit(0)
