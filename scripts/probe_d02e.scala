// Ground truth on a few banded candidates: their raw texts and exact J.
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
  .distinct()
val sample = candKeys.limit(1000).cache()
sample.count()
val j = sample
  .join(shingled.select(col("id").as("doc_a"), col("shingles").as("sa")), "doc_a")
  .join(shingled.select(col("id").as("doc_b"), col("shingles").as("sb")), "doc_b")
  .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
  .withColumn("jacc", col("inter").cast("double") /
    (size(col("sa")) + size(col("sb")) - col("inter")))
  .select("doc_a", "doc_b", "inter", "jacc")
try {
  j.printSchema(); val rows = j.collect()
  println("PROBE sampled=" + rows.length +
    " passing=" + rows.count(r => r.getAs[Any](3).toString.toDouble >= 0.5) +
    " minJ=" + rows.map(_.getAs[Any](3).toString.toDouble).min +
    " maxJ=" + rows.map(_.getAs[Any](3).toString.toDouble).max)
  rows.take(3).foreach { r =>
    println("PROBE pair " + r)
    docs.filter(col("doc_id").isin(r.getLong(0), r.getLong(1)))
      .select("doc_id", "text").collect()
      .foreach(d => println("PROBE   doc " + d.getLong(0) + ": " +
        d.getString(1).take(120)))
  }
} catch { case e: Throwable =>
  println("PROBE EXCEPTION: " + e); e.printStackTrace()
}
System.exit(0)
