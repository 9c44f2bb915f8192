package graft.features

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TargetTransformSpec extends SparkSpec {
  import spark.implicits._

  test("fit captures count/mean/std of price and log(price) in one pass") {
    val df = Seq(100.0, 200.0, 400.0, 800.0).toDF("price")
    val tt = new TargetTransformer().fit(df)
    tt.stats.count shouldBe 4
    tt.stats.mean shouldBe 375.0 +- 1e-9
    tt.stats.logMean shouldBe math.log(100.0 * 200.0 * 400.0 * 800.0) / 4 +- 1e-9
  }

  test("smearing factor matches the reference's shipped stats (Duan)") {
    // models/rf/target_transformer.json: log_std = 0.80875 → exp(σ²/2)
    val logStd = 0.80875
    val s = TargetStats(37368, 343221.272, 308912.914, 12.42943, logStd)
    s.smearingFactor shouldBe math.exp(logStd * logStd / 2) +- 1e-12
  }

  test("inverse(exp + smearing) of log-scale predictions is finite — Q2 fix") {
    val df = Seq(100.0, 1000.0, 500000.0).toDF("price")
    val tt = new TargetTransformer().fit(df)
    val withLog = tt.transform(df)
    withLog.columns should contain("log_price")
    // predict log_price itself: inverse must be price · smearing, all finite
    val inv = tt.inverse(withLog.withColumn("prediction", col("log_price")), "prediction")
      .select("prediction_price").as[Double].collect()
    all(inv) should be > 0.0
    all(inv.map(_.isInfinity)) shouldBe false
    inv(0) shouldBe 100.0 * tt.stats.smearingFactor +- 1e-6
  }

  test("JSON round-trip preserves stats") {
    val dir = tmpDir("tt")
    val tt = new TargetTransformer().fit(Seq(10.0, 20.0, 30.0).toDF("price"))
    tt.save(s"$dir/tt.json")
    val loaded = new TargetTransformer().load(s"$dir/tt.json")
    loaded.stats shouldBe tt.stats
  }
}
