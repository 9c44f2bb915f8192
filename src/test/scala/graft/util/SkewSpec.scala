package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  /** 10k rows where one key holds 90% of the data (hot key). */
  private def skewed = (1 to 10000).map { i =>
    val k = if (i % 10 != 0) "hot" else s"cold${i % 97}"
    (k, i.toLong, i * 0.5)
  }.toDF("k", "uid", "v")

  test("salted aggregation equals the direct aggregation") {
    val direct = skewed.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"))
    val salted = Skew.saltedCountSum(skewed, "k", "v", "uid", 16)
    val d = direct.orderBy("k").collect()
    val s = salted.orderBy("k").collect()
    d.length shouldBe s.length
    d.zip(s).foreach { case (a, b) =>
      a.getString(0) shouldBe b.getString(0)
      a.getLong(1) shouldBe b.getLong(1)
      a.getDouble(2) shouldBe b.getDouble(2) +- 1e-6
    }
  }

  test("salt spreads the hot key over n partitions-worth of groups") {
    val salts = skewed.filter(col("k") === "hot")
      .select(Skew.salt(col("uid"), 16).as("s"))
      .distinct().count()
    salts should be >= 12L // hot key fans out over most of the 16 salts
  }

  test("salted join is row-identical to the plain join") {
    val dim = Seq(("hot", "H"), ("cold1", "C1"), ("cold2", "C2")).toDF("k", "label")
    val plain = skewed.join(dim, "k").select("k", "uid", "label")
    val salted = Skew.saltedJoin(skewed, dim, "k", "uid", 8)
      .select("k", "uid", "label")
    plain.except(salted).count() shouldBe 0
    salted.except(plain).count() shouldBe 0
    salted.count() shouldBe plain.count()
  }
}
