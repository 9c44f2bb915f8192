package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** gram_moments must be bit-identical to the plan it replaced: the double
  * posexplode of the sentinel-augmented vector into per-(i,j) product rows
  * summed as DECIMAL(30,8) then cast double (m16's pre-r9 shape). The old
  * formulation is re-stated here as the oracle and both run over the same
  * random float vectors.
  */
class GramMomentsSpec extends SparkSpec {
  import spark.implicits._

  test("gram_moments equals the posexplode decimal-sum plan on random vectors") {
    val rnd = new scala.util.Random(7)
    val dims = 5
    val data = Seq.fill(200)(Array.fill(dims)(
      (rnd.nextFloat() - 0.5f) * (if (rnd.nextInt(10) == 0) 100f else 2f)))
    val df = data.map(Tuple1(_)).toDF("embedding")

    val oldPlan = df
      .select(concat(col("embedding"), array(lit(1.0f))).as("e"))
      .select(col("e"), posexplode(col("e")).as(Seq("i", "vi")))
      .select(col("i"), col("vi").cast("double").as("vi"),
        posexplode(expr("slice(e, i + 1, size(e))")).as(Seq("p", "vj")))
      .select(col("i"), (col("i") + col("p")).as("j"),
        (col("vi") * col("vj").cast("double")).as("v"))
      .groupBy("i", "j")
      .agg(sum(col("v").cast(DecimalType(30, 8))).cast("double").as("sv"))
      .collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) -> r.getAs[Double]("sv"))
      .toMap

    GraftFunctions.ensureRegistered(spark)
    val flat = df.agg(call_function("gram_moments", col("embedding")))
      .head.getSeq[Double](0)
    val aug = dims + 1
    flat.length shouldBe aug * (aug + 1) / 2
    for (i <- 0 until aug; j <- i until aug) {
      val got = flat(i * aug - i * (i - 1) / 2 + (j - i))
      withClue(s"cell ($i,$j): ") { got shouldBe oldPlan((i, j)) }
    }
    // the (d,d) sentinel cell is the exact row count
    flat.last shouldBe 200.0
  }

  test("non-finite products are skipped like the decimal cast nulled them") {
    // Inf^2 = Inf and Inf * 1.0 (sentinel) = Inf: under the replaced plan
    // the DECIMAL(30,8) cast yields NULL and sum skips it; the aggregate
    // must do the same, not abort the job with NumberFormatException
    val df = Seq(
      Tuple1(Array(2.0f)),
      Tuple1(Array(Float.PositiveInfinity)),
      Tuple1(Array(Float.NaN)),
      Tuple1(Array(3.0f))).toDF("embedding")
    GraftFunctions.ensureRegistered(spark)
    val flat = df.agg(call_function("gram_moments", col("embedding")))
      .head.getSeq[Double](0)
    flat(0) shouldBe 4.0 + 9.0   // finite squares only
    flat(1) shouldBe 2.0 + 3.0   // finite vi·1 only
    flat(2) shouldBe 4.0         // sentinel 1·1 counts every row
  }

  test("a single product wider than the long fast path lands in the spill") {
    // 3e18^2 = 9e36 → unscaled 8-dp 9e44, far past 2^63 (~9.2e18): must
    // route into the BigInteger spill, not throw longValueExact
    val df = Seq(Tuple1(Array(3.0e18f)), Tuple1(Array(1.0f))).toDF("embedding")
    GraftFunctions.ensureRegistered(spark)
    val flat = df.agg(call_function("gram_moments", col("embedding")))
      .head.getSeq[Double](0)
    // double addition of 9e36 + 1 rounds to 9e36 — the exact-decimal path
    // holds both, and the final double cast shows the dominant term
    val sq = 3.0e18f.toDouble
    flat(0) shouldBe (sq * sq + 1.0)
    flat(1) shouldBe (sq + 1.0)
    flat(2) shouldBe 2.0
  }

  test("gram_moments long accumulator spills exactly past 2^63") {
    // values whose 8-dp unscaled products are ~9.2e17: two rows overflow
    // a long cell; the BigInteger spill must keep the sum exact
    val big = 95000.0f // 95000^2 * 1e8 = 9.025e17 unscaled per row
    val df = Seq.fill(21)(Tuple1(Array(big))).toDF("embedding")
    GraftFunctions.ensureRegistered(spark)
    val flat = df.agg(call_function("gram_moments", col("embedding")))
      .head.getSeq[Double](0)
    // cell (0,0) = 21 * 95000^2 — representable exactly as a double
    flat(0) shouldBe 21.0 * 95000.0 * 95000.0
    flat(2) shouldBe 21.0
  }
}
