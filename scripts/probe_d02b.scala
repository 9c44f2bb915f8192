// Banded-LSH (b=20, r=2) bucket anatomy at gsf1/gsf2: raw pair emission,
// distinct candidates, and how much comes from identical-text cliques.
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", "32")
graft.functions.GraftFunctions.ensureRegistered(spark)

for (d <- Seq("gsf1", "gsf2")) {
  val docs = spark.read.parquet(s"/root/repo/data/$d/documents.parquet")
  val shingled = docs.select(col("doc_id").as("id"),
    array_distinct(graft.llm.Dedup.wordNGramsFused(spark, col("text"), 3)).as("shingles"))
    .filter(size(col("shingles")) > 0)
  val withKeys = shingled.select(col("id"),
    explode(call_function("minhash_bands", col("shingles"), lit(20), lit(2))).as("bk"))
  val buckets = withKeys.groupBy("bk").count().filter(col("count") > 1)
  val stats = buckets.agg(
    count(lit(1)).as("nb"),
    sum(col("count") * (col("count") - 1) / 2).as("rawPairs"),
    max(col("count")).as("maxB")).collect()(0)
  val distinctPairs = withKeys.as("a").join(withKeys.as("b"),
      col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
    .select(col("a.id"), col("b.id")).distinct().count()
  // identical-text clique sizes (these collide in EVERY band by construction)
  val cliques = docs.groupBy("text").count().filter(col("count") > 1)
    .agg(count(lit(1)), sum(col("count") * (col("count") - 1) / 2), max("count")).collect()(0)
  println(s"$d: buckets>1=${stats.get(0)} rawPairs=${stats.get(1)} maxBucket=${stats.get(2)} " +
    s"distinctPairs=$distinctPairs identCliques=${cliques.get(0)} " +
    s"identPairs=${cliques.get(1)} maxClique=${cliques.get(2)}")
}
System.exit(0)
