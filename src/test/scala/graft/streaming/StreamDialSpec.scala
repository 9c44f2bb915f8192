package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The st15 banding dial ([[graft.operators.StreamOps.streamLshDedup]]'s
  * (nTables, rowsPerBand) parameters — round-12 directive #2): both
  * shipped settings must verify to the IDENTICAL exact-Jaccard pair set
  * as the batch path on the same corpus (the recall leg — the (1−θ^r)^b
  * budget holds at either r), while the traffic tradeoff the batch
  * docstring derives (b ≈ 42 keys/doc at r = 3 vs 8 at r = 1, candidate
  * volume suppressed by J^r) is MEASURED on the drained stream, not
  * asserted in prose. SCALE.md carries the numbers.
  */
class StreamDialSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  private def pairSet(df: DataFrame) =
    df.select(col("doc_a"), col("doc_b"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet

  test("banding dial: r=3 and r=1 streams both verify to the batch pair " +
      "set; key/emission traffic measured; no bucket near the freeze cap") {
    val docs = graft.util.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val want = pairSet(
      graft.llm.Dedup.minhashPairs(docs, "doc_id", "text", 0.5))
    want should not be empty

    val (raw3, ver3) =
      graft.operators.StreamOps.streamLshDedup(spark, sf, "st15d3", 8, 3)
    val (raw1, ver1) =
      graft.operators.StreamOps.streamLshDedup(spark, sf, "st15d1", 8, 1)
    // recall leg: both dial settings land on the identical verified set
    pairSet(ver3) shouldBe want
    pairSet(ver1) shouldBe want

    // traffic leg: measured, recorded in SCALE.md. Key traffic is exact
    // by construction (b rows/doc); emissions are the dial's cost side.
    val emissions3 = raw3.count()
    val emissions1 = raw1.count()
    info(s"r=3: emissions=$emissions3 (42 keys/doc); " +
      s"r=1: emissions=$emissions1 (8 keys/doc)")
    emissions3 should be > 0L
    emissions1 should be > 0L
    // every true pair collides in ≥1 band, so emissions bound below by
    // the verified pair count at either setting
    emissions3 should be >= want.size.toLong
    emissions1 should be >= want.size.toLong

    // freeze-cap headroom: the shared-oracle equivalence claim requires
    // that NO bucket freezes at the default cap — pin max occupancy far
    // below it at both settings (measured at sf0.1: 5 at r=3, 22 at r=1)
    graft.functions.GraftFunctions.ensureRegistered(spark)
    def maxOccupancy(bands: Int, rpb: Int): Long = docs
      .select(col("doc_id").as("id"),
        array_distinct(expr("word_ngrams(text, 3)")).as("sh"))
      .filter(expr("size(sh) > 0"))
      .select(explode(call_function("minhash_bands",
        col("sh"), lit(bands), lit(rpb))).as("bk"))
      .groupBy("bk").agg(count(lit(1)).as("n"))
      .agg(max("n")).as[Long].head()
    maxOccupancy(42, 3) should be < 409L // 10% of the default cap
    maxOccupancy(8, 1) should be < 409L
  }
}
