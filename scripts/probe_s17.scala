// probe_s17: which drift dial both DEGRADES health under the fixed
// quantizer and is REPAIRED by a 512-cell refit? Measures
// (h0 fit-time, h1 drifted-live, h2 post-requantize) per dial.
// run: /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes -I scripts/probe_s17.scala
import org.apache.spark.sql.functions._
import graft.llm.Similarity

val d = "/root/testdata/sf0.01"
val emb = spark.read.parquet(s"$d/embeddings.parquet").select("vec_id", "embedding")
val base = emb.filter(col("vec_id") % 3 < 2)
val idxBase = Similarity.buildIvfIndex(spark, base, "vec_id", "embedding", 512)

for ((scale, shift) <- Seq((0.2f, 0.9f), (0.6f, 0.8f), (1.0f, 0.8f), (1.0f, 0.5f))) {
  val drifted = emb.filter(col("vec_id") % 3 === 2)
    .select(col("vec_id"), transform(col("embedding"),
      x => (x * lit(scale) + lit(shift)).cast("float")).as("embedding"))
  val h0 = Similarity.computeIvfHealth(spark, idxBase.inverted, idxBase.centroids)
  val appended = idxBase.inverted.unionByName(
    Similarity.assignToCentroids(spark, drifted, "vec_id", "embedding", idxBase.centroids))
  val h1 = Similarity.computeIvfHealth(spark, appended, idxBase.centroids)
  val live = appended.select(col("neighbor_id"), col("emb"))
  val refit = Similarity.buildIvfIndex(spark, live, "neighbor_id", "emb", 512)
  val h2 = Similarity.computeIvfHealth(spark, refit.inverted, refit.centroids)
  println(f"PROBE s17 scale=$scale shift=$shift h0=(${h0.occMaxOverMean}%.2f,${h0.meanResidual}%.5f) " +
    f"h1=(${h1.occMaxOverMean}%.2f,${h1.meanResidual}%.5f) h2=(${h2.occMaxOverMean}%.2f,${h2.meanResidual}%.5f) " +
    s"degrade=${h1.occMaxOverMean > h0.occMaxOverMean && h1.meanResidual > h0.meanResidual} " +
    s"repair=${h2.occMaxOverMean < h1.occMaxOverMean && h2.meanResidual < h1.meanResidual}")
}
System.exit(0)
