package graft.features

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DerivedSpec extends SparkSpec {
  import spark.implicits._

  test("haversine matches known city distances") {
    // Paris (48.8566, 2.3522) ↔ London (51.5074, -0.1278) ≈ 343.5 km
    // Paris ↔ Marseille (43.2965, 5.3698) ≈ 660.9 km
    val df = Seq(
      (48.8566, 2.3522, 51.5074, -0.1278),
      (48.8566, 2.3522, 43.2965, 5.3698)).toDF("lat1", "lon1", "lat2", "lon2")
    val d = df.select(Derived.haversineKm(col("lat1"), col("lon1"), col("lat2"), col("lon2")).as("km"))
      .as[Double].collect()
    d(0) shouldBe 343.5 +- 1.0
    d(1) shouldBe 660.9 +- 1.5
  }

  test("distanceToEiffel: null coordinates guard to 0, Eiffel itself is 0") {
    val df = Seq(
      (Some(Derived.EiffelLat), Some(Derived.EiffelLon)),
      (None: Option[Double], Some(2.0)),
      (Some(48.0), None: Option[Double])).toDF("lat", "lon")
    val d = df.select(Derived.distanceToEiffelKm(col("lat"), col("lon")).as("km"))
      .as[Double].collect()
    d(0) shouldBe 0.0 +- 1e-9
    d(1) shouldBe 0.0
    d(2) shouldBe 0.0
  }

  test("guardedLog: null/zero/negative → 0, positive → ln") {
    val df = Seq(Some(math.E), Some(0.0), Some(-3.0), None).toDF("x")
    val out = df.select(Derived.guardedLog(col("x")).as("y")).as[Double].collect()
    out(0) shouldBe 1.0 +- 1e-12
    out(1) shouldBe 0.0
    out(2) shouldBe 0.0
    out(3) shouldBe 0.0
  }

  test("guardedRatio: zero/null denominator → 0") {
    val df = Seq((4.0, Some(2.0)), (4.0, Some(0.0)), (4.0, None)).toDF("n", "d")
    val out = df.select(Derived.guardedRatio(col("n"), col("d")).as("r")).as[Double].collect()
    out should contain theSameElementsInOrderAs Seq(2.0, 0.0, 0.0)
  }

  test("binaryFlag matches membership incl. the French-label config (quirk Q6)") {
    val df = Seq("maison", "appartement", "villa").toDF("pt")
    val out = df.select(Derived.binaryFlag(col("pt"), Seq("maison", "villa")).as("f"))
      .as[Int].collect()
    out should contain theSameElementsInOrderAs Seq(1, 0, 1)
  }
}
