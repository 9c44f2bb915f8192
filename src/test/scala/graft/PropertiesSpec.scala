package graft

import graft.features.{Derived, NullPolicy}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The SURVEY §5 property suite (beyond capping idempotence, which lives in
  * CapperSpec): log/exp inverse round-trip, join-count invariant for
  * key-unique dimensions, and null-fill totality.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def positiveDoubles: Seq[List[Double]] = {
    val gen = Gen.nonEmptyListOf(Gen.choose(1, 2000000000).map(_ / 1000.0))
    (1L to 6L).flatMap(s => gen.apply(Gen.Parameters.default, Seed(s)))
  }

  test("exp(log(x)) round-trips within fp tolerance for x > 0") {
    positiveDoubles.foreach { xs =>
      val out = xs.toDF("x")
        .select(col("x"), exp(Derived.guardedLog(col("x"))).as("rt"))
        .as[(Double, Double)].collect()
      out.foreach { case (x, rt) =>
        math.abs(rt - x) / x should be < 1e-12
      }
    }
  }

  test("inner join against a key-unique dimension never exceeds the fact count") {
    val facts = (1 to 500).map(i => (i % 60L, i)).toDF("k", "v")
    val dimAll = (0L to 59L).map(k => (k, s"d$k")).toDF("k", "label")
    val dimHalf = (0L to 29L).map(k => (k, s"d$k")).toDF("k", "label")
    facts.join(dimAll, "k").count() shouldBe 500   // full coverage: exactly n
    facts.join(dimHalf, "k").count() should be <= 500L
    facts.join(dimHalf, "k").count() shouldBe
      facts.filter(col("k") <= 29).count()         // dropped = label-less rows (quirk Q5)
  }

  test("ExactQuantiles matches Spark's buffer-everything percentile on random data") {
    // same interpolated order statistic, radically different plan — the
    // frequency-table path must agree bit-for-bit after 1e-9 tolerance,
    // including tie-heavy inputs (the modulo generator forces duplicates)
    val gens = Seq(
      Gen.nonEmptyListOf(Gen.choose(-1000000, 1000000).map(_ / 100.0)),
      Gen.nonEmptyListOf(Gen.choose(0, 50).map(_.toDouble)))
    val probs = Seq("p10" -> 0.10, "p25" -> 0.25, "p50" -> 0.50, "p99" -> 0.99)
    for (g <- gens; s <- 1L to 3L; xs <- g.apply(Gen.Parameters.default, Seed(s))) {
      val df = xs.toDF("x")
      val exact = graft.util.ExactQuantiles.quantilesRow(df, "x", probs).head()
      val builtin = df.agg(
        expr("percentile(x, 0.10)"), expr("percentile(x, 0.25)"),
        expr("percentile(x, 0.50)"), expr("percentile(x, 0.99)")).head()
      probs.indices.foreach { i =>
        exact.getDouble(i) shouldBe builtin.getDouble(i) +- 1e-9
      }
    }
  }

  test("corrMatrix matches a driver-side Pearson on random frames") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(300)((rnd.nextDouble() * 100, rnd.nextDouble() * 50, rnd.nextInt(40).toDouble))
    val df = rows.toDF("x", "y", "z")
    def pearson(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.length
      val (ma, mb) = (a.sum / n, b.sum / n)
      val cov = a.zip(b).map { case (u, v) => (u - ma) * (v - mb) }.sum
      val (va, vb) = (a.map(u => (u - ma) * (u - ma)).sum, b.map(v => (v - mb) * (v - mb)).sum)
      cov / math.sqrt(va * vb)
    }
    val cols = Map(
      "x" -> rows.map(_._1), "y" -> rows.map(_._2), "z" -> rows.map(_._3))
    val got = graft.analysis.Profile.corrMatrix(df, Seq("x", "y", "z"))
      .as[(String, String, Double)].collect()
    got.length shouldBe 3
    got.foreach { case (a, b, c) =>
      c shouldBe pearson(cols(a), cols(b)) +- 2e-6 // decimal(…,6) moment grid
    }
  }

  test("lang_quality_counts kernel == HOF formulation on seeded random text") {
    val rnd = new scala.util.Random(23)
    // alphabet mixes marker words, stopwords, noise tokens, unicode
    // (multi-byte UTF-8), punctuation-glued markers, and raw spaces (which
    // produce empty tokens when doubled)
    val vocab = Seq("the", "a", "fast", "data", "row", "query", "table",
      "scan", "group", "value", "join", "sort", "window", "batch", "stream",
      "noise", "naïve", "übermäßig", "日本語", "the,", "a.", "x1", "")
    val texts = Seq.fill(200)(
      Seq.fill(1 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      .filter(_.trim.nonEmpty)
    val df = texts.toDF("t")
    val cols =
      graft.llm.TextAnalysis.qualityComponents(col("t"), Seq("the", "a")).map {
        case (n, c) => c.as(s"hof_$n")
      } ++
      graft.llm.TextAnalysis.qualityComponentsFused(spark, col("t"), Seq("the", "a")).map {
        case (n, c) => c.as(s"f_$n")
      } ++
      graft.llm.TextAnalysis.langScores(col("t")).map { case (l, c) => c.as(s"hof_s_$l") } ++
      graft.llm.TextAnalysis.langScoresFused(spark, col("t")).map { case (l, c) => c.as(s"f_s_$l") }
    val names = Seq("word_cnt", "avg_word_len", "stopword_ratio", "quality_score",
      "s_en", "s_es", "s_de", "s_fr", "s_zh")
    df.select(cols: _*).collect().zip(texts).foreach { case (r, t) =>
      names.foreach { n =>
        withClue(s"text=<$t> col=$n: ") {
          r.getAs[Any](s"f_$n") shouldBe r.getAs[Any](s"hof_$n")
        }
      }
    }
  }

  test("corrMatrix fails fast on null inputs instead of silently skewing") {
    val df = Seq((Some(1.0), 2.0), (None: Option[Double], 3.0), (Some(4.0), 5.0))
      .toDF("x", "y")
    val e = intercept[Exception] {
      graft.analysis.Profile.corrMatrix(df, Seq("x", "y")).collect()
    }
    e.getMessage should include("corrMatrix: nulls")
  }

  test("weightedMedianByKey matches a brute-force weighted median on " +
      "random tie-heavy integer-weight inputs") {
    // brute: expand each row weight times, lower median = element at
    // ceil(W/2) in the sorted expansion — the definition the window
    // construction must reproduce, including value ties and zero weights
    val gen = Gen.nonEmptyListOf(for {
      v <- Gen.choose(0, 20).map(_.toDouble) // heavy value ties
      w <- Gen.choose(0L, 5L)                // zero weights must be inert
    } yield (v, w))
    for (s <- 1L to 6L; xs <- gen.apply(Gen.Parameters.default, Seed(s))
         if xs.exists(_._2 > 0)) {
      val df = xs.map { case (v, w) => ("k", v, w) }.toDF("k", "v", "w")
      val got = graft.operators.Extras.weightedMedianByKey(df, "k", "v", "w")
        .select("wmedian", "total_w", "n_rows")
        .as[(Double, Long, Long)].head()
      val expanded = xs.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }.sorted
      val wTot = expanded.size
      val brute = expanded((wTot + 1) / 2 - 1) // ceil(W/2)-th smallest, 0-based
      got._1 shouldBe brute
      got._2 shouldBe wTot.toLong
      got._3 shouldBe xs.size.toLong
    }
  }

  test("intervalCoverage final state matches a brute-force interval union " +
      "on random inputs under random batch placements") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStreams.{CoverageRev, IntervalArrival}
    implicit val sqlCtx = spark.sqlContext
    val gen = Gen.nonEmptyListOf(for {
      s <- Gen.choose(0L, 400L)
      len <- Gen.choose(1L, 120L)
    } yield (s, s + len))
    var n = 0
    for (seed <- 1L to 4L; ivs <- gen.apply(Gen.Parameters.default, Seed(seed))) {
      n += 1
      val rows = ivs.zipWithIndex.map { case ((s, e), i) =>
        IntervalArrival(1L, i.toLong, s, e)
      }
      // split into batches by a seed-dependent residue so placements vary
      val k = 1 + (seed % 3).toInt
      val batches = (0 until k).map(r => rows.filter(_.event_id % k == r))
      val input = MemoryStream[IntervalArrival]
      val q = graft.streaming.EventStreams.intervalCoverage(input.toDS())
        .writeStream.format("memory").queryName(s"prop_ic_$n")
        .outputMode("append").start()
      try batches.foreach { b =>
        if (b.nonEmpty) input.addData(b: _*); q.processAllAvailable()
      } finally q.stop()
      val got = spark.table(s"prop_ic_$n").as[CoverageRev].collect()
        .maxBy(_.n_intervals)
      // brute union: sort by start, fold merging s <= reach
      val merged = ivs.sorted.foldLeft(List.empty[(Long, Long)]) {
        case (acc, (s, e)) => acc match {
          case (ps, pe) :: t if s <= pe => (ps, math.max(pe, e)) :: t
          case _ => (s, e) :: acc
        }
      }.reverse
      got.n_intervals shouldBe ivs.size.toLong
      got.n_segments shouldBe merged.size.toLong
      got.covered_ns shouldBe merged.map(t => t._2 - t._1).sum
      got.longest_segment_ns shouldBe merged.map(t => t._2 - t._1).max
    }
  }

  test("null-policy fills are total: no nulls escape on covered columns") {
    val df = Seq(
      (Some(1.0), Some("a")), (None, Some("b")), (Some(3.0), None),
      (None: Option[Double], None: Option[String]))
      .toDF("num", "cat")
    val strict = NullPolicy.strict(df, Seq("num"), Seq("cat"))
    strict.filter(col("num").isNull || col("cat").isNull).count() shouldBe 0
    val perm = NullPolicy.permissive(df, Map("num" -> -1.0), Map("cat" -> "NA"))
    perm.filter(col("num").isNull || col("cat").isNull).count() shouldBe 0
    perm.filter(col("num") === -1.0).count() shouldBe 2
  }
}
