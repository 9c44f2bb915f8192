package graft.features

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CapperSpec extends SparkSpec {
  import spark.implicits._

  private def sample = (1 to 1000).map(_.toDouble).toDF("x")

  test("fit computes p01/p99 bounds and transform clamps to them") {
    val capper = new Capper(Seq("x")).fit(sample)
    val (lo, hi) = capper.bounds("x")
    lo shouldBe 10.0 +- 15.0 // approxQuantile relErr 0.01 on 1..1000
    hi shouldBe 990.0 +- 15.0
    val capped = capper.transform(sample).agg(min("x"), max("x")).head()
    capped.getDouble(0) shouldBe lo
    capped.getDouble(1) shouldBe hi
  }

  test("capping is idempotent: cap(cap(x)) == cap(x)") {
    val capper = new Capper(Seq("x")).fit(sample)
    val once = capper.transform(sample)
    val twice = capper.transform(once)
    once.except(twice).count() shouldBe 0
    twice.except(once).count() shouldBe 0
  }

  test("unfitted transform throws unless fitIfUnfit (quirk Q4 made explicit)") {
    val capper = new Capper(Seq("x"))
    an[IllegalStateException] should be thrownBy capper.transform(sample)
    noException should be thrownBy capper.transform(sample, fitIfUnfit = true)
  }

  test("JSON state round-trips bit-exactly") {
    val dir = tmpDir("capper")
    val capper = new Capper(Seq("x")).fit(sample)
    capper.save(s"$dir/params.json")
    val loaded = new Capper(Seq("x")).load(s"$dir/params.json")
    loaded.bounds shouldBe capper.bounds
  }

  test("load() parses a reference-produced params.json directly") {
    val cap = new Capper(Seq("size"))
      .load("/root/reference/models/rf/feature_engineering/params.json")
    cap.bounds("size") shouldBe ((0.0, 411311.0))
    cap.bounds("nb_rooms") shouldBe ((0.0, 130.0))
  }

  test("multi-column fit is a single job over all columns") {
    val df = Seq.tabulate(500)(i => (i.toDouble, (500 - i).toDouble)).toDF("a", "b")
    val capper = new Capper(Seq("a", "b")).fit(df)
    capper.bounds.keySet shouldBe Set("a", "b")
  }
}
