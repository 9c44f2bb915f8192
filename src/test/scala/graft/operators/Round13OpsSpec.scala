package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand fixtures + choreography pins for the round-13 additions: q42 CSV
  * schema evolution, x16 grouped weighted median, st20 streaming interval
  * coverage (its merge math is pinned in EventStreamsSpec; here the
  * declared query's within-session re-run).
  */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  test("x16 weighted median on hand fixtures: weight mass, lower-median " +
      "tie rule, value ties accumulated RANGE-style, zero weights inert") {
    val df = Seq(
      // A: cum at 10→1, 20→4; 2·4 ≥ 6 → median 20
      ("A", 10.0, 1L), ("A", 20.0, 3L), ("A", 30.0, 2L),
      // B: even total, lower median → 1.0 (2·1 ≥ 2)
      ("B", 1.0, 1L), ("B", 2.0, 1L),
      // C: duplicate value rows share one cumulative step (RANGE): cum at
      // 5.0 is 2 for both rows → 2·2 ≥ 3 → median 5.0; zero weight inert
      ("C", 5.0, 1L), ("C", 5.0, 1L), ("C", 9.0, 1L), ("C", 7.0, 0L)
    ).toDF("k", "v", "w")
    val got = Extras.weightedMedianByKey(df, "k", "v", "w")
      .as[(String, Double, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    got shouldBe Map(
      "A" -> ((20.0, 6L, 3L)),
      "B" -> ((1.0, 2L, 2L)),
      "C" -> ((5.0, 3L, 4L)))
    // heavily skewed weight drags the median to the heavy value
    val skew = Seq(("S", 1.0, 1L), ("S", 2.0, 100L), ("S", 3.0, 1L)).toDF("k", "v", "w")
    Extras.weightedMedianByKey(skew, "k", "v", "w")
      .select("wmedian").as[Double].head() shouldBe 2.0
  }

  test("q42 CSV evolution: within-session re-run lands on the identical " +
      "result (overwrite + generation-rename choreography)") {
    val d = "/root/testdata/sf0.001"
    def run() = graft.SparkEntry.queries("q42_csv_evolution")(spark, d)
      .collect().toSeq
    val first = run()
    first.size should be > 0
    // old generation rows: mkt null-filled AND flagged; new: value, unflagged
    first.foreach { r =>
      val oldGen = r.getLong(0) % 2 == 0
      r.getBoolean(4) shouldBe oldGen
      r.isNullAt(3) shouldBe oldGen
    }
    run() shouldBe first
  }
}
