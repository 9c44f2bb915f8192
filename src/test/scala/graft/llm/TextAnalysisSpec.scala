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

  test("fused lang_quality_counts kernel matches the HOF formulation exactly") {
    // edge shapes: leading/trailing/double spaces, empty string, unicode
    // chars (multi-byte UTF-8 around the single-byte space delimiter),
    // marker words adjacent to punctuation (must NOT match), and a doc
    // from every marker set
    // no empty doc here: word_cnt=0 divides by zero under ANSI in BOTH
    // formulations (asserted separately below on the raw kernel struct)
    val texts = Seq(
      "the quick a fast fox", " leading space", "trailing space ",
      "double  space", "x", "the", "naïve café über tokens",
      "data row query table scan group value join sort window batch stream",
      "the, a. fast! punctuation-bound markers do not match",
      "the a the a")
    val df = texts.toDF("t")
    val hofCols =
      TextAnalysis.qualityComponents(col("t"), Seq("the", "a")).map {
        case (n, c) => c.as(s"hof_$n")
      } ++ TextAnalysis.langScores(col("t")).map { case (l, c) => c.as(s"hof_s_$l") }
    val fusedCols =
      TextAnalysis.qualityComponentsFused(spark, col("t"), Seq("the", "a")).map {
        case (n, c) => c.as(s"f_$n")
      } ++ TextAnalysis.langScoresFused(spark, col("t")).map { case (l, c) => c.as(s"f_s_$l") }
    val rows = df.select(hofCols ++ fusedCols: _*).collect()
    val names = Seq("word_cnt", "avg_word_len", "stopword_ratio", "quality_score",
      "s_en", "s_es", "s_de", "s_fr", "s_zh")
    rows.zip(texts).foreach { case (r, t) =>
      names.foreach { n =>
        withClue(s"text=$t col=$n: ") {
          r.getAs[Any](s"f_$n") shouldBe r.getAs[Any](s"hof_$n")
        }
      }
    }
    // empty doc: the raw kernel struct must count zeros (the division-based
    // quality columns are undefined at word_cnt=0 for HOF and kernel alike)
    val z = Seq("").toDF("t")
      .select(TextAnalysis.langQualityCounts(spark, col("t")).as("c"))
      .select("c.word_cnt", "c.char_cnt", "c.stop_cnt", "c.s_en").head()
    z.getLong(0) shouldBe 0L
    z.getLong(1) shouldBe 0L
    z.getLong(2) shouldBe 0L
    z.getLong(3) shouldBe 0L
  }

  test("contentSplit: identical texts share a split; formatting noise doesn't move them") {
    val df = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the  quick brown\tfox jumps"), // same after normalization
      (3L, "The Quick Brown FOX jumps"),   // same after lowercasing
      (4L, "a completely different document entirely")
    ).toDF("doc_id", "text")
    val splits = df.select(col("doc_id"),
      TextAnalysis.contentSplit(col("text")).as("s")).as[(Long, String)].collect().toMap
    splits(2L) shouldBe splits(1L)
    splits(3L) shouldBe splits(1L)
    // all three split labels appear over enough distinct docs (80/10/10)
    val many = (1 to 2000).map(i => s"synthetic document number $i with words").toDF("text")
    val dist = many.select(TextAnalysis.contentSplit(col("text")).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    dist.keySet shouldBe Set("train", "validation", "test")
    dist("train").toDouble / 2000 shouldBe 0.8 +- 0.05
  }

  test("p02/p03 declared queries: split totals and planted contamination") {
    val dir = java.nio.file.Files.createTempDirectory("graft_docs").toString
    // 20 docs; eval set = doc_id % 10 == 7 → {7, 17}; doc 7 duplicates
    // doc 3's text (contaminated), doc 17 is unique
    (0L until 20L).map { i =>
      val text = if (i == 7L) "shared corpus document number 3"
        else if (i == 17L) "unique holdout document"
        else s"shared corpus document number $i"
      (i, text, text.length.toLong)
    }.toDF("doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val split = graft.SparkEntry.queries("p02_hash_split")(spark, dir)
      .as[(String, Long, Long, Long)].collect()
    split.map(_._2).sum shouldBe 20
    val r = graft.SparkEntry.queries("p03_contamination")(spark, dir).head()
    r.getAs[Long]("n_eval") shouldBe 2
    r.getAs[Long]("n_contaminated") shouldBe 1
    r.getAs[Double]("contamination_rate") shouldBe 0.5
  }

  test("fused predictedLang over kernel scores matches the HOF path") {
    val df = Seq("the a fast the a", "data row query data", "plain nothing",
      "window batch stream stream").toDF("t")
    val hof = df.select(
      TextAnalysis.predictedLang(TextAnalysis.langScores(col("t"))).as("l"))
      .as[String].collect()
    val fused = df.select(
      TextAnalysis.predictedLang(TextAnalysis.langScoresFused(spark, col("t"))).as("l"))
      .as[String].collect()
    fused shouldBe hof
  }

  test("bpeCounts applies greedy lowest-rank merges to fixpoint") {
    val merges = Seq("a b", "ab c", "b c", "c a")
    // hand-derived merge traces:
    //  abc    : ab(0) → [ab,c]; (ab,c)=1 → [abc]              = 1 token
    //  bca    : bc(2) → [bc,a]                                 = 2
    //  abcabc : ab both → [ab,c,ab,c]; (ab,c) both → [abc,abc] = 2
    //  aabbcc : ab → [a,ab,b,c,c]; bc → [a,ab,bc,c]            = 4
    //  baca   : ca(3) → [b,a,ca]                               = 3
    //  ccc    : no pair in table                               = 3
    val df = Seq("abc", "bca", "abcabc", "aabbcc", "baca", "ccc",
      "abc bca ccc").toDF("t")
    val got = df.select(TextAnalysis.bpeCounts(spark, col("t"), merges).as("c"))
      .select(col("c.bpe_tokens"), col("c.token_chars"), col("c.ws_words"))
      .as[(Long, Long, Long)].collect()
    got(0) shouldBe ((1L, 3L, 1L))
    got(1) shouldBe ((2L, 3L, 1L))
    got(2) shouldBe ((2L, 6L, 1L))
    got(3) shouldBe ((4L, 6L, 1L))
    got(4) shouldBe ((3L, 4L, 1L))
    got(5) shouldBe ((3L, 3L, 1L))
    // multi-word doc: per-word sums, chars exclude spaces
    got(6) shouldBe ((1L + 2L + 3L, 9L, 3L))
  }

  test("bpeCounts rank order decides contested merges") {
    // "abc" under ranks [b c, a b]: bc wins (rank 0) → [a,bc] = 2 tokens,
    // the OPPOSITE of the [a b, ab c] table where abc collapses to 1
    val df = Seq("abc").toDF("t")
    val bcFirst = df.select(
      TextAnalysis.bpeCounts(spark, col("t"), Seq("b c", "a b")).as("c"))
      .select(col("c.bpe_tokens")).as[Long].head()
    bcFirst shouldBe 2L
  }

  test("bpeCounts conservation: token chars always equal non-space chars") {
    val dir = "/root/testdata/sf0.001"
    val merges = Seq("a b", "ab c", "b c", "c a")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val bad = docs.select(
        TextAnalysis.bpeCounts(spark, col("text"), merges).as("c"),
        org.apache.spark.sql.functions.length(
          regexp_replace(col("text"), " ", "")).cast("long").as("nsc"))
      .filter(col("c.token_chars") =!= col("nsc"))
      .count()
    bad shouldBe 0L
  }
}
