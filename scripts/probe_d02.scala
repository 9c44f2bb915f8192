// d02 scale anatomy: bucket sizes and candidate-pair counts at gsf1 vs gsf2.
// Question: is the 6.9x runtime growth on 2x data a plan defect, or does the
// OUTPUT (pair set) itself grow super-linearly because early docs accumulate
// O(log N) planted copies (GenData picks a uniform earlier doc per dup)?
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", "32")
graft.functions.GraftFunctions.ensureRegistered(spark)

for (d <- Seq("gsf1", "gsf2")) {
  val docs = spark.read.parquet(s"/root/repo/data/$d/documents.parquet")
  val shingled = docs.select(col("doc_id").as("id"),
    array_distinct(graft.llm.Dedup.wordNGramsFused(spark, col("text"), 3)).as("shingles"))
    .filter(size(col("shingles")) > 0)
  val withSigs = shingled
    .select(col("id"), posexplode(call_function("minhash_sigs", col("shingles"), lit(8)))
      .as(Seq("table", "mh")))
    .select(col("id"), struct(col("table"), col("mh")).as("bk"))
  val buckets = withSigs.groupBy("bk").count().filter(col("count") > 1)
  val stats = buckets.agg(
    count(lit(1)).as("nontrivial_buckets"),
    sum(col("count") * (col("count") - 1) / 2).as("raw_pairs"),
    max(col("count")).as("max_bucket"),
    sum(when(col("count") > 100, col("count") * (col("count") - 1) / 2)
      .otherwise(0)).as("pairs_from_big_buckets")).collect()(0)
  val nDocs = docs.count()
  val distinctPairs = withSigs.as("a").join(withSigs.as("b"),
      col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
    .select(col("a.id"), col("b.id")).distinct().count()
  println(s"$d: docs=$nDocs buckets>1=${stats.get(0)} rawPairs=${stats.get(1)} " +
    s"maxBucket=${stats.get(2)} pairsFromBuckets>100=${stats.get(3)} distinctPairs=$distinctPairs")
}
System.exit(0)
