// spark-shell -I probe: does norm-corrected composite-cell ranking close 0.9?
import org.apache.spark.sql.functions._
import graft.llm.Similarity

for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
  val emb = spark.read.parquet(s"$d/embeddings.parquet").select(col("vec_id"), col("embedding"))
  val probes = emb.filter(col("vec_id") < 5)
  val n = emb.count()
  val exact = Similarity.bruteTopK(spark, emb, probes, "vec_id", "embedding", 10)
    .select("p_id", "neighbor_id")
  val cellsWanted = math.max(128L, n / 32L)
  val k2 = 32
  val k1 = math.max(2L, math.min(2048L, (cellsWanted + k2 - 1) / k2)).toInt
  val idx = Similarity.buildIvf2Index(spark, emb, "vec_id", "embedding", k1, k2)
  val c1 = idx.centroids1; val r2 = idx.residuals2
  val dim = c1(0).length
  // driver-side corrected ranking for the 5 probes
  val pRows = probes.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
  val inv = idx.inverted.select("neighbor_id", "c1", "c2").collect()
    .map(r => ((r.getInt(1), r.getInt(2)), r.getLong(0)))
    .groupBy(_._1).map { case (k, v) => (k, v.map(_._2)) }
  for (npFrac <- Seq(0.3, 0.4, 0.6)) {
    val np = math.max(1, (k1.toLong * k2 * npFrac).toInt)
    var hits = 0L; var total = 0L; var scanned = 0L
    val exactMap = exact.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).toSet) }
    for ((pid, pe) <- pRows) {
      val pn = math.sqrt(pe.map(x => x.toDouble * x).sum)
      val pu = pe.map(_ / pn)
      def dot(a: Array[Double], b: Array[Float]): Double =
        a.zip(b).map { case (x, y) => x * y }.sum
      val scores = for (j <- c1.indices; l <- r2.indices) yield {
        val comp = c1(j).zip(r2(l)).map { case (x, y) => (x + y).toDouble }
        val nrm = math.sqrt(comp.map(x => x * x).sum)
        val s = if (nrm > 0) comp.zip(pu).map { case (x, y) => x * y }.sum / nrm else -2.0
        ((j, l), s)
      }
      val top = scores.sortBy(-_._2).take(np).map(_._1).toSet
      val cand = top.toSeq.flatMap(c => inv.getOrElse(c, Array[Long]()))
      scanned += cand.length
      // exact cosine re-rank driver-side
      val embMap = emb.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
      val ranked = cand.filter(_ != pid).map { id =>
        val e = embMap(id); val en = math.sqrt(e.map(x => x.toDouble * x).sum)
        (id, e.zip(pu).map { case (x, y) => x * y }.sum / en)
      }.sortBy(-_._2).take(10).map(_._1).toSet
      val ex = exactMap.getOrElse(pid, Set())
      hits += ex.intersect(ranked).size; total += ex.size
    }
    println(f"S13B $d n=$n k1=$k1 k2=$k2 npFrac=$npFrac corrected recall=${hits.toDouble/total}%.3f scanfrac=${scanned.toDouble/(5*n)}%.3f")
  }
}
System.exit(0)
