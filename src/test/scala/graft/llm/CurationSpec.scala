package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii strikes emails, IPs, and phones; piiCount agrees") {
    val df = Seq(
      "write bob.smith+x@corp.example.org or ping 192.168.001.1 now",
      "call +33 612 345 678 twice",
      "no pii here at all",
      "a@b.co then 10.0.0.255 then +44 123 456 789").toDF("t")
    val out = df.select(Curation.redactPii(col("t")).as("r"),
      Curation.piiCount(col("t")).as("n")).as[(String, Long)].collect()
    out(0) shouldBe ("write <EMAIL> or ping <IP> now", 2L)
    out(1) shouldBe ("call <PHONE> twice", 1L)
    out(2) shouldBe ("no pii here at all", 0L)
    out(3) shouldBe ("<EMAIL> then <IP> then <PHONE>", 3L)
  }

  test("redaction order prevents email domains re-matching as IPs") {
    // a dotted-quad inside an email domain must be struck as part of the
    // <EMAIL>, not first rewritten to x@<IP>.co by the IP pass
    val r = Seq("x@1.2.3.4.co v").toDF("t")
      .select(Curation.redactPii(col("t"))).as[String].head()
    r shouldBe "<EMAIL> v"
  }

  test("normalizeText lowercases, strips junk, collapses whitespace, trims") {
    val r = Seq("  Hello,\tWORLD!!  42  ").toDF("t")
      .select(Curation.normalizeText(col("t"))).as[String].head()
    r shouldBe "hello world 42"
  }

  test("wordChunks slices filtered words into fixed windows; empty doc -> empty") {
    val rows = Seq("a b c d e f g", "one  two", "", "solo").toDF("t")
      .select(Curation.wordChunks(col("t"), 3)).as[Seq[String]].collect()
    rows(0) shouldBe Seq("a b c", "d e f", "g")
    rows(1) shouldBe Seq("one two")
    rows(2) shouldBe Seq.empty
    rows(3) shouldBe Seq("solo")
  }

  test("chunkDedupAudit flags only cross-document chunk repeats") {
    val docs = Seq(
      (1L, "a b c d e f"),     // chunk "a b c" shared with doc 2; "d e f" unique
      (2L, "a b c x y z"),     // shares "a b c"
      (3L, "p q r p q r"),     // within-doc repeat only -> NOT shared
      (4L, "u v w")).toDF("doc_id", "text")
    val m = Curation.chunkDedupAudit(docs, "doc_id", "text", 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    m(1L) shouldBe ((2L, 1L))
    m(2L) shouldBe ((2L, 1L))
    m(3L) shouldBe ((2L, 0L))
    m(4L) shouldBe ((1L, 0L))
  }

  test("packSequences matches the naive global-window prefix sum") {
    val docs = (0L until 237L).map(i => (i, 1 + (i * 7) % 95)).toDF("id", "tok")
    val got = Curation.packSequences(docs, "id", col("tok"), 128L, 10L)
      .select("id", "pack_id").as[(Long, Long)].collect().toMap
    val naive = docs
      .withColumn("off", coalesce(sum("tok").over(
        Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("id"), expr("off div 128").as("pack_id"))
      .as[(Long, Long)].collect().toMap
    got shouldBe naive
    // packs are contiguous in id order and ids partition exactly
    got.keySet shouldBe (0L until 237L).toSet
  }

  test("packSequences has no global-order exchange (buckets partition the window)") {
    val docs = (0L until 50L).map(i => (i, 3L)).toDF("id", "tok")
    val plan = Curation.packSequences(docs, "id", col("tok"), 16L, 10L)
      .queryExecution.executedPlan.toString
    // the only single-partition window runs over the per-bucket frame;
    // the per-row window must be hash-partitioned by bucket
    plan should include("hashpartitioning(bucket")
  }

  test("stratifiedSample is deterministic and respects per-stratum rates") {
    val df = (0L until 4000L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "src")
      .withColumn("rate", when(col("src") === "s0", 0)
        .when(col("src") === "s1", 25)
        .when(col("src") === "s2", 50).otherwise(100))
    val kept = df.filter(Curation.stratifiedSample(df, "doc_id", col("rate")))
    val counts = kept.groupBy("src").count().as[(String, Long)].collect().toMap
    counts.getOrElse("s0", 0L) shouldBe 0L
    counts("s3") shouldBe 1000L
    // hash buckets are ~uniform: 25% +- 5pp on 1000 rows
    counts("s1").toDouble should be(250.0 +- 50.0)
    counts("s2").toDouble should be(500.0 +- 50.0)
    // repartitioning must not change the sample
    val again = df.repartition(13)
    val keptAgain = again.filter(Curation.stratifiedSample(again, "doc_id", col("rate")))
      .select("doc_id").as[Long].collect().sorted
    keptAgain shouldBe kept.select("doc_id").as[Long].collect().sorted
  }

  test("temperatureWeights implements p ~ sqrt(n), normalized") {
    val df = (Seq.fill(90)("en") ++ Seq.fill(10)("fr")).toDF("lang")
    val w = Curation.temperatureWeights(df, "lang")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val exp = math.sqrt(90.0) / (math.sqrt(90.0) + math.sqrt(10.0))
    w("en") shouldBe exp +- 1e-12
    w("fr") shouldBe (1.0 - exp) +- 1e-12
    // temperature flattens: fr's share beats its raw 10% proportion
    w("fr") should be > 0.1
  }

  test("unigramLogprob scores docs by corpus-fit unigram LM") {
    val docs = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    // corpus: a=3, b=2, c=1, N=6
    val m = Curation.unigramLogprob(docs, "doc_id", "text", docs)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val (n1, lp1) = m(1L)
    n1 shouldBe 4L
    lp1 shouldBe BigDecimal((3 * math.log(3.0 / 6) + math.log(2.0 / 6)) / 4)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9
    m(2L)._1 shouldBe 2L
  }

  test("canonicalizeUrl collapses every planted variant class") {
    val variants = Seq(
      "HTTPS://WWW.EXAMPLE0.COM/p~/7?id=7&utm_source=a",          // case
      "https://www.example0.com:443/p~/7?id=7",                   // default port
      "https://www.example0.com/p%7E/7?id=7#section-3",           // escape+frag
      "https://www.example0.com/p%7e/7?id=7&utm_campaign=x&utm_medium=y")
      .toDF("u")
    val canon = variants.select(Curation.canonicalizeUrl(col("u")))
      .as[String].collect().toSet
    canon shouldBe Set("https://www.example0.com/p~/7?id=7")
  }

  test("canonicalizeUrl preserves path/query case and real ports") {
    val got = Seq(
      "http://Host.COM:8080/CaseSensitive/Path?Q=Vv",
      "https://a.b/x%7Ey?k=v#f").toDF("u")
      .select(Curation.canonicalizeUrl(col("u"))).as[String].collect()
    got(0) shouldBe "http://host.com:8080/CaseSensitive/Path?Q=Vv"
    got(1) shouldBe "https://a.b/x~y?k=v"
  }

  test("shuffleShards is a reproducible complete permutation, invariant to partitioning") {
    val ids = (0L until 500L)
    val df = ids.toDF("id")
    def runOn(d: org.apache.spark.sql.DataFrame) =
      Curation.shuffleShards(d, "id", "s1", 4)
        .select("id", "shard", "pos").as[(Long, Int, Long)].collect().sorted
    val a = runOn(df)
    val b = runOn(df.repartition(17)) // ingest layout must not matter
    a should contain theSameElementsInOrderAs b
    // complete cover: every id exactly once, positions 0..n-1 dense per shard
    a.map(_._1).toSet shouldBe ids.toSet
    a.groupBy(_._2).foreach { case (_, rows) =>
      rows.map(_._3).sorted shouldBe rows.indices.map(_.toLong)
    }
    // uniform-ish: no shard holds more than twice its fair share
    a.groupBy(_._2).values.map(_.size).max should be < 250
  }

  test("shuffleShards: a new seed is a new permutation; same seed on a subset agrees") {
    val df = (0L until 300L).toDF("id")
    val s1 = Curation.shuffleShards(df, "id", "epoch0", 4)
      .select("id", "shard", "pos").as[(Long, Int, Long)].collect().sortBy(_._1)
    val s2 = Curation.shuffleShards(df, "id", "epoch1", 4)
      .select("id", "shard", "pos").as[(Long, Int, Long)].collect().sortBy(_._1)
    s1 should not equal s2 // a fresh epoch order…
    // …but the shard ASSIGNMENT under one seed is stable per-row: rerunning
    // on any subset gives each surviving row the same shard (pure function
    // of (seed, id)), which is what makes incremental re-shuffles cheap
    val sub = Curation.shuffleShards(df.filter(col("id") % 3 === 0), "id", "epoch0", 4)
      .select("id", "shard").as[(Long, Int)].collect().toMap
    s1.filter(_._1 % 3 == 0).foreach { case (id, shard, _) =>
      sub(id) shouldBe shard
    }
  }

  test("bpePairCounts: hand-computed pair frequencies on a tiny corpus") {
    // vocab: "low" x2 (from doc repetition), "lower" x1, "a" (no pairs)
    val docs = Seq("low low lower", "a low").toDF("text")
    val got = Curation.bpePairCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    // "low" freq 3 -> lo+3, ow+3; "lower" freq 1 -> lo+1, ow+1, we+1, er+1
    got shouldBe Map("lo" -> 4L, "ow" -> 4L, "we" -> 1L, "er" -> 1L)
  }
}
