// Capture golden fixtures before deleting the legacy paths (round-12
// directive #4): p13's k=50 selection at both verify SFs, and t17's
// per-(lang,bucket) fingerprint at sf0.01.
import org.apache.spark.sql.functions._
for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
  val weights = graft.operators.LlmOps.scoredDocs(spark, sf).select("doc_id", "quality_score")
  val sel = graft.llm.Curation.weightedSampleTopK(weights, "doc_id", "quality_score", k = 50).select("rank", "doc_id", "key_micro").collect()
  println(s"GOLDEN p13 $sf " + sel.map(r => s"${r.getLong(0)}:${r.getLong(1)}:${r.getLong(2)}").mkString(","))
}
val docs = graft.util.Tables.documents(spark, "/root/testdata/sf0.01")
val pb = graft.llm.Curation.perplexityBuckets(docs, "doc_id", "lang", "text", isRef = col("source") === "src0")
val fp = pb.groupBy("lang", "bucket").agg(count(lit(1)).as("n"), sum("avg_nll").as("s")).orderBy("lang", "bucket").collect()
println("GOLDEN t17 " + fp.map(r => s"${r.getString(0)}|${r.getString(1)}|${r.getLong(2)}|${r.getLong(3)}").mkString(","))
System.exit(0)
