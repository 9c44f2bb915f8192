// Isolate d02's verification stage at gsf2: how many rows reach the exact
// array_intersect, what plan do the shingle rejoins get (broadcast?), and
// the stage-by-stage wall time.
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", "32")
graft.functions.GraftFunctions.ensureRegistered(spark)
def t[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime(); val r = f
  println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
}
val docs = spark.read.parquet("/root/repo/data/gsf2/documents.parquet")
val shingled = docs.select(col("doc_id").as("id"),
  array_distinct(graft.llm.Dedup.wordNGramsFused(spark, col("text"), 3)).as("shingles"))
  .filter(size(col("shingles")) > 0)
  .cache()
t("shingle+cache")(shingled.count())
println("PROBE avg shingles: " + shingled.agg(avg(size(col("shingles")))).collect()(0))
val withSigs = shingled.select(col("id"), explode(
  call_function("minhash_bands", col("shingles"), lit(20), lit(2))).as("bk"))
val candKeys = withSigs.as("a").join(withSigs.as("b"),
    col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
  .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
  .distinct()
t("candKeys count")(println("PROBE nCand=" + candKeys.count()))
val cand = candKeys
  .join(shingled.select(col("id").as("doc_a"), col("shingles").as("sa")), "doc_a")
  .join(shingled.select(col("id").as("doc_b"), col("shingles").as("sb")), "doc_b")
val verified = cand
  .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
  .withColumn("jaccard",
    col("inter").cast("double") / (size(col("sa")) + size(col("sb")) - col("inter")))
  .filter(col("jaccard") >= 0.5)
verified.explain("formatted")
t("verify stage")(println("PROBE nPairs=" + verified.count()))
System.exit(0)
