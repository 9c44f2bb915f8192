// s12 redesign probe #2: shared 512-cell IVF index, SMALL FIXED nprobe —
// recall@3 on a 200-node sample + candidate volume, vs np.
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", "32")
graft.functions.GraftFunctions.ensureRegistered(spark)
def probe(dir: String, np: Int): Unit = {
  val emb = spark.read.parquet(dir + "/embeddings.parquet").select("vec_id", "embedding")
  val n = emb.count()
  val idx = graft.llm.Similarity.buildIvfIndex(spark, emb, "vec_id", "embedding", 512)
  val t0 = System.nanoTime()
  val ann = graft.llm.Similarity.ivfSearch(spark, idx, emb, "vec_id", "embedding", 3, np).select("p_id", "neighbor_id")
  val nEdges = ann.count()
  val t = (System.nanoTime() - t0) / 1e9
  val sample = emb.filter(col("vec_id") < 200)
  val exact = graft.llm.Similarity.bruteTopK(spark, emb, sample, "vec_id", "embedding", 3).select("p_id", "neighbor_id")
  val hits = exact.join(ann, Seq("p_id", "neighbor_id"), "left_semi").count()
  val tot = exact.count()
  val nodes = ann.select("p_id").distinct().count()
  println(f"S12NP dir=$dir n=$n cells=${idx.centroids.length} np=$np edges=$nEdges nodes=$nodes recall=${hits.toDouble / tot}%.3f searchtime=$t%.1f s")
}
for (np <- Seq(2, 4, 8)) probe("/root/testdata/sf0.01", np)
for (np <- Seq(2, 4, 8)) probe("/root/testdata/sf0.1", np)
for (np <- Seq(4, 8)) probe("/root/repo/data/gsf1", np)
System.exit(0)
