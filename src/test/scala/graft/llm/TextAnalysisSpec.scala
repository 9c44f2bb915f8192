package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("wordCount ignores empty tokens; regexTokenCount splits runs") {
    val df = Seq("the quick  brown fox", "a1b2!").toDF("t")
    val out = df.select(
      TextAnalysis.wordCount(col("t")).as("wc"),
      TextAnalysis.regexTokenCount(col("t")).as("rc")).as[(Long, Long)].collect()
    out(0)._1 shouldBe 4
    out(1)._2 shouldBe 5 // a, 1, b, 2, !
  }

  test("fingerprint is stable under whitespace/case noise") {
    val df = Seq("The  Quick   Fox", "the quick fox").toDF("t")
    val fps = df.select(TextAnalysis.fingerprint(col("t")).as("fp")).as[String].collect()
    fps(0) shouldBe fps(1)
  }

  test("langid picks the lang with the most marker hits, precedence on ties") {
    val scores = TextAnalysis.langScores(col("t"))
    val df = Seq(
      "the a fast the a",       // en markers dominate
      "data row query data",    // es markers dominate
      "nothing matching here"). // all 0 → precedence → en
      toDF("t")
    val out = df.select(TextAnalysis.predictedLang(scores).as("l")).as[String].collect()
    out should contain theSameElementsInOrderAs Seq("en", "es", "en")
  }

  test("rollingHash differs on token order (positional)") {
    val df = Seq("alpha beta gamma", "gamma beta alpha").toDF("t")
    val hs = df.select(TextAnalysis.rollingHash(col("t")).as("h")).as[Long].collect()
    hs(0) should not be hs(1)
  }

  test("quality components: saturation and stopword penalty") {
    val comps = TextAnalysis.qualityComponents(col("t"), Seq("the", "a"))
    val df = Seq("the a the a").toDF("t") // 4 words, all stopwords
    val row = df.select(comps.map { case (n, c) => c.as(n) }: _*).head()
    row.getAs[Long]("word_cnt") shouldBe 4
    row.getAs[Double]("stopword_ratio") shouldBe 1.0
    row.getAs[Double]("quality_score") shouldBe 0.0
  }
}
