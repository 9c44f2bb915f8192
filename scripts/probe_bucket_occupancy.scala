// Max LSH bucket occupancy for the st15 stream dedup corpus (θ=0.5,
// nTables=8, r=3 → 42 bands; and the r=1 dial setting → 8 bands):
// grounds the DocStreams stop-bucket cap default. Single-statement lines
// only (-I REPL caveat, see probe_d02e postmortem).
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", "32")
graft.functions.GraftFunctions.ensureRegistered(spark)
def occupancy(dir: String, bands: Int, rpb: Int): Unit = {
  val docs = spark.read.parquet(dir + "/documents.parquet").select(col("doc_id"), col("text"))
  val keys = docs.select(col("doc_id").as("id"), array_distinct(expr("word_ngrams(text, 3)")).as("sh")).filter(size(col("sh")) > 0).select(col("id"), explode(call_function("minhash_bands", col("sh"), lit(bands), lit(rpb))).as("bk"))
  val occ = keys.groupBy("bk").agg(count(lit(1)).as("n")).agg(max("n").as("mx"), count(lit(1)).as("buckets"), sum("n").as("rows")).head()
  println(s"OCC dir=$dir bands=$bands rpb=$rpb max=${occ.getLong(0)} buckets=${occ.getLong(1)} keyrows=${occ.getLong(2)}")
}
occupancy("/root/repo/data/gsf10", 42, 3)
occupancy("/root/repo/data/gsf10", 8, 1)
occupancy("/root/testdata/sf0.1", 42, 3)
System.exit(0)
