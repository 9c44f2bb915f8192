package graft.operators

import graft.SparkSpec
import graft.functions.GraftFunctions
import graft.llm.Similarity
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Round 18 (optimization): the fused vector kernels must be BIT-EXACT
  * replacements for the higher-order-function expression trees they
  * replaced — same doubles, same rounding, same ranking ties — verified
  * against the original formulations re-built inline here, over the real
  * sf0.01 embedding corpus (not a fixture: the corpus exercises organic
  * ties and zero-ish components).
  */
class Round22KernelSpec extends SparkSpec {

  private def emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    .select("vec_id", "embedding")

  /** The pre-round-18 formulations, verbatim. */
  private def oldNormalized(e: Column): Column = {
    val nrm = sqrt(aggregate(e, lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    transform(e, x => x.cast("double") / when(nrm > 0, nrm).otherwise(lit(1.0d)))
  }

  private def oldSq8Codes(e: Column, cb: Similarity.Sq8Codebook): Column = {
    val mins = typedLit(cb.mins)
    val scales = typedLit(cb.scales)
    zip_with(oldNormalized(e), sequence(lit(0), lit(cb.mins.length - 1)),
      (v, i) => round((v - element_at(mins, i + 1)) * element_at(scales, i + 1), 0)
        .cast("long"))
  }

  private def oldNearest(e: Column, cents: Array[Array[Float]], np: Int): Column = {
    val centroidArr = array(cents.zipWithIndex.map { case (ctr, i) =>
      struct(lit(i).as("cid"), array(ctr.map(lit(_)): _*).as("cv"))
    }: _*)
    slice(array_sort(
      transform(centroidArr, ce => struct(
        (-call_function("cosine_sim", e, ce.getField("cv"))).as("negSim"),
        ce.getField("cid").as("cid")))), 1, np).getField("cid")
  }

  private def oldIvf2Keys(e: Column, cents1: Array[Array[Float]],
      res2: Array[Array[Float]], np1: Int, npAll: Int): Column = {
    val Q = 1 << 20
    def packedKeys(cents: Array[Array[Float]]): Column =
      array(cents.zipWithIndex.map { case (ctr, i) =>
        val nrm = math.sqrt(ctr.map(x => x.toDouble * x).sum)
        val dot =
          if (nrm > 0)
            call_function("cosine_sim", e, array(ctr.map(lit(_)): _*)) * lit(nrm)
          else lit(0.0d)
        (round((lit(2.0d) - dot) * Q).cast("long") * 4096L + i).as(s"k$i")
      }: _*)
    val near1 = slice(array_sort(packedKeys(cents1)), 1, np1)
    val near2 = array_sort(packedKeys(res2))
    slice(array_sort(flatten(
      transform(near1, a => transform(near2, b =>
        (shiftright(a, 12) + shiftright(b, 12)) * lit(1L << 23)
          + a.bitwiseAND(lit(4095L)) * lit(4096L)
          + b.bitwiseAND(lit(4095L)))))), 1, npAll)
  }

  private def assertColumnsEqual(oldC: Column, newC: Column): Unit = {
    GraftFunctions.ensureRegistered(spark)
    val bad = emb.select(col("vec_id"), oldC.as("o"), newC.as("n"))
      .filter(!(col("o") <=> col("n")))
    bad.count() shouldBe 0L
  }

  test("normalize_emb kernel ≡ aggregate+transform formulation") {
    assertColumnsEqual(oldNormalized(col("embedding")),
      call_function("normalize_emb", col("embedding")))
  }

  test("sq8_codes_k kernel ≡ zip_with formulation (fitted codebook)") {
    GraftFunctions.ensureRegistered(spark)
    val cb = Similarity.fitSq8(spark, emb, "embedding")
    assertColumnsEqual(oldSq8Codes(col("embedding"), cb),
      Similarity.sq8Codes(col("embedding"), cb))
  }

  test("sq8_dist kernel ≡ zip_with+aggregate formulation") {
    GraftFunctions.ensureRegistered(spark)
    val cb = Similarity.fitSq8(spark, emb, "embedding")
    val withCodes = emb.select(col("vec_id"),
      Similarity.sq8Codes(col("embedding"), cb).as("code"))
    val pairs = withCodes.as("a").crossJoin(
      withCodes.filter(col("vec_id") < 8).select(
        col("vec_id").as("p_vec"), col("code").as("p_code")))
    val oldDist = aggregate(
      zip_with(col("code"), col("p_code"), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)
    val newDist = call_function("sq8_dist", col("code"), col("p_code"))
    pairs.select(oldDist.as("o"), newDist.as("n"))
      .filter(!(col("o") <=> col("n"))).count() shouldBe 0L
  }

  test("nearest_cells kernel ≡ struct-sort formulation, incl. tie order") {
    GraftFunctions.ensureRegistered(spark)
    val idx = Similarity.buildIvfIndex(spark, emb, "vec_id", "embedding", 64)
    for (np <- Seq(1, 7, 64, 100)) {
      assertColumnsEqual(oldNearest(col("embedding"), idx.centroids, np),
        call_function("nearest_cells", col("embedding"),
          typedLit(idx.centroids), lit(np)))
    }
  }

  test("ivf2_cell_keys kernel ≡ packed transform/flatten/sort formulation") {
    GraftFunctions.ensureRegistered(spark)
    val idx = Similarity.buildIvf2Index(spark, emb, "vec_id", "embedding", 8, 8)
    for ((np1, npAll) <- Seq((1, 4), (4, 16), (8, 64))) {
      assertColumnsEqual(
        oldIvf2Keys(col("embedding"), idx.centroids1, idx.residuals2, np1, npAll),
        call_function("ivf2_cell_keys", col("embedding"),
          typedLit(idx.centroids1), typedLit(idx.residuals2),
          lit(np1), lit(npAll), lit((1 << 20).toDouble)))
    }
  }

  test("topk_sim_distinct ≡ groupBy-max + topk_sim on duplicate-bearing input") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    // duplicate (group, id) rows with identical scores, plus ties
    val rows = Seq(
      (1L, 10L, 0.9), (1L, 10L, 0.9), (1L, 11L, 0.9), (1L, 12L, 0.7),
      (1L, 13L, 0.7), (1L, 14L, 0.1), (2L, 10L, 0.5), (2L, 10L, 0.5),
      (2L, 20L, 0.5), (2L, 21L, 0.5), (3L, 7L, 0.3))
      .toDF("g", "id", "s")
    val viaMax = rows.groupBy("g", "id").agg(max("s").as("s"))
      .groupBy("g")
      .agg(call_function("topk_sim", col("s"), col("id"), lit(3)).as("top"))
    val viaDistinct = rows.groupBy("g")
      .agg(call_function("topk_sim_distinct", col("s"), col("id"), lit(3)).as("top"))
    val o = viaMax.orderBy("g").collect().map(_.toString).toSeq
    val n = viaDistinct.orderBy("g").collect().map(_.toString).toSeq
    n shouldBe o
  }
}
