package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class ExactSpec extends SparkSpec {
  import spark.implicits._

  private def sampleLists: Seq[List[Double]] = {
    val gen = Gen.nonEmptyListOf(Gen.choose(-10000000, 10000000).map(_ / 100.0))
    (1L to 8L).flatMap(s => gen.apply(Gen.Parameters.default, Seed(s)))
  }

  test("dsum equals the exact BigDecimal sum (scalacheck-generated inputs)") {
    sampleLists.foreach { doubles =>
      val expected = doubles
        .map(BigDecimal(_).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      val got = doubles.toDF("x").repartition(7)
        .agg(Exact.dsum(col("x")).as("s")).head().getDouble(0)
      got shouldBe expected +- 1e-9
    }
  }

  test("dstd matches two-pass sample stddev on a known set") {
    val xs = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0)
    val mean = xs.sum / xs.size
    val expected = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (xs.size - 1))
    val got = xs.toDF("x").agg(Exact.dstd(col("x")).as("s")).head().getDouble(0)
    got shouldBe expected +- 1e-9
  }

  test("davg is reproducible across repartitionings (merge-order independent)") {
    val doubles = (1 to 5000).map(i => i * 0.37)
    val runs = Seq(1, 3, 13).map { p =>
      doubles.toDF("x").repartition(p).agg(Exact.davg(col("x"))).head().getDouble(0)
    }
    runs.distinct.size shouldBe 1 // bit-identical, not just close
  }
}
