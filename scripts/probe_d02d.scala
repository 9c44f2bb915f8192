// Why did nPairs == nCand? Sample verified pairs, check their jaccard
// distribution and whether sa/sb got mis-joined.
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", "32")
graft.functions.GraftFunctions.ensureRegistered(spark)
val docs = spark.read.parquet("/root/repo/data/gsf2/documents.parquet")
val shingled = docs.select(col("doc_id").as("id"),
  array_distinct(graft.llm.Dedup.wordNGramsFused(spark, col("text"), 3)).as("shingles"))
  .filter(size(col("shingles")) > 0)
  .cache()
shingled.count()
val withSigs = shingled.select(col("id"), explode(
  call_function("minhash_bands", col("shingles"), lit(20), lit(2))).as("bk"))
val candKeys = withSigs.as("a").join(withSigs.as("b"),
    col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
  .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
println("PROBE raw=" + candKeys.count())
println("PROBE distinct=" + candKeys.distinct().count())
val cand = candKeys.distinct()
  .join(shingled.select(col("id").as("doc_a"), col("shingles").as("sa")), "doc_a")
  .join(shingled.select(col("id").as("doc_b"), col("shingles").as("sb")), "doc_b")
val withJ = cand
  .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
  .withColumn("jaccard",
    col("inter").cast("double") / (size(col("sa")) + size(col("sb")) - col("inter")))
println("PROBE jaccard deciles:")
withJ.select(floor(col("jaccard") * 10).as("dec")).groupBy("dec").count()
  .orderBy("dec").collect().foreach(r => println("PROBE   " + r))
println("PROBE sample:")
withJ.select("doc_a", "doc_b", "inter", "jaccard").orderBy(rand(7)).limit(5)
  .collect().foreach(r => println("PROBE   " + r))
System.exit(0)
