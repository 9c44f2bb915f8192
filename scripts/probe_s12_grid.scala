// s12 redesign probe: sign-prefix grid cells (b = ceil(log2(N/32)) bits of
// the hyperplane signature → cells ∝ N, ~32 vectors/cell) with hamming≤1
// multi-probe. Measure kNN-graph recall@3 vs exact brute force, and the
// candidate volume, at sf0.01 / sf0.1 / gsf1.
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", "32")
graft.functions.GraftFunctions.ensureRegistered(spark)
def probe(dir: String): Unit = {
  val emb = spark.read.parquet(dir + "/embeddings.parquet").select("vec_id", "embedding")
  val n = emb.count()
  val b = math.max(1, math.ceil(math.log(n / 32.0) / math.log(2)).toInt)
  val sigd = emb.withColumn("sig", call_function("hyperplane_sig", col("embedding"), lit(b)))
  val flips = (0 until b).map(i => col("sig").bitwiseXOR(lit(1L << i))) :+ col("sig")
  val probes = sigd.select(col("vec_id").as("p_id"), col("embedding").as("p_emb"), explode(array(flips: _*)).as("cell"))
  val corpus = sigd.select(col("vec_id").as("neighbor_id"), col("embedding").as("emb"), col("sig").as("cell"))
  val cand = corpus.join(probes, "cell").filter(col("neighbor_id") =!= col("p_id")).select(col("p_id"), col("neighbor_id"), call_function("cosine_sim", col("emb"), col("p_emb")).as("sim")).distinct()
  val nCand = cand.count()
  val w = org.apache.spark.sql.expressions.Window.partitionBy("p_id").orderBy(col("sim").desc, col("neighbor_id"))
  val ann = cand.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3).select("p_id", "neighbor_id")
  val sample = emb.filter(col("vec_id") < 200)
  val exact = graft.llm.Similarity.bruteTopK(spark, emb, sample, "vec_id", "embedding", 3).select("p_id", "neighbor_id")
  val hits = exact.join(ann, Seq("p_id", "neighbor_id"), "left_semi").count()
  val tot = exact.count()
  println(s"S12GRID dir=$dir n=$n b=$b cells=${sigd.select("sig").distinct().count()} cand=$nCand cand_per_node=${nCand / n} recall=${hits.toDouble / tot} hits=$hits tot=$tot")
}
probe("/root/testdata/sf0.01")
probe("/root/testdata/sf0.1")
probe("/root/repo/data/gsf1")
System.exit(0)
