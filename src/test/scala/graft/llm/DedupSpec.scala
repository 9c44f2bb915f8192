package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again tomorrow"), // near-dup of 1
    (3L, "completely different words nothing shared here at all whatsoever truly"),
    (4L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 1
    (5L, "another unrelated text with its own private vocabulary entirely distinct")
  ).toDF("doc_id", "text")

  test("exactStats counts duplicates") {
    val r = Dedup.exactStats(docs, "text").head()
    r.getLong(0) shouldBe 5
    r.getLong(1) shouldBe 4
    r.getLong(2) shouldBe 1
  }

  test("dedupKeepFirst keeps the minimal id per distinct text") {
    val kept = Dedup.dedupKeepFirst(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    kept should contain theSameElementsAs Seq(1L, 2L, 3L, 5L)
  }

  test("wordNGrams builds 1-based sliding 3-grams") {
    val g = Seq("a b c d").toDF("t")
      .select(Dedup.wordNGrams(col("t"), 3).as("g")).as[Seq[String]].head()
    g shouldBe Seq("a b c", "b c d")
  }

  test("fused word_ngrams kernel is byte-identical to the HOF formulation") {
    val texts = Seq("a b c d e", "one two", "", "x", "double  space here ok",
      "exactly three words").toDF("t")
    for (n <- Seq(2, 3, 4)) {
      val rows = texts.select(
        Dedup.wordNGrams(col("t"), n).as("hof"),
        Dedup.wordNGramsFused(spark, col("t"), n).as("fused"))
        .as[(Seq[String], Seq[String])].collect()
      rows.foreach { case (hof, fused) => fused shouldBe hof }
    }
  }

  test("ngramJaccardPairs finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    pairs should contain((1L, 4L)) // exact dup → jaccard 1.0
    pairs should contain((1L, 2L)) // near dup (one word differs at the end)
    pairs should contain((2L, 4L))
    pairs.exists(p => p._1 == 3L || p._2 == 3L) shouldBe false
  }

  test("connectedComponents collapses chained near-dup relations into one group") {
    // chain 1-2, 2-4 (1≁4 directly) plus isolated pair 3-5: groups must be
    // {1,2,4} labeled 1 and {3,5} labeled 3
    val pairs = Seq((1L, 2L), (2L, 4L), (3L, 5L)).toDF("doc_a", "doc_b")
    val groups = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    groups shouldBe Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 3L -> 3L, 5L -> 3L)
  }

  test("connectedComponents matches a union-find oracle on seeded random graphs") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 2) {
      val n = 40
      val edges = Seq.fill(30)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt)); if (ra != rb) parent(ra) = rb
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = nodes.map { v =>
        v -> nodes.filter(u => find(u.toInt) == find(v.toInt)).min
      }.toMap
      val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
        .as[(Long, Long)].collect().toMap
      got shouldBe expected
    }
  }

  test("connectedComponents returns an empty frame on an empty pair graph") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    Dedup.connectedComponents(empty, "doc_a", "doc_b").count() shouldBe 0
  }

  test("minhash_sigs matches HOF semantics on empty arrays and null elements") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // empty shingle array → null signature (HOF array_min(empty) is null),
    // so empty docs never all collide in every band
    val r = Seq((1, Seq.empty[String]), (2, Seq("a b c")), (3, Seq("a b c", null)))
      .toDF("id", "shingles")
      .select(col("id"), call_function("minhash_sigs", col("shingles"), lit(4)).as("sig"))
      .orderBy("id").collect()
    r(0).isNullAt(1) shouldBe true
    r(1).isNullAt(1) shouldBe false
    // a null element contributes xxhash64(null, t) = hash(t, seed=42), the
    // same value the HOF transform would produce — verify vs the HOF twin
    val hof = Seq(Seq("a b c", null)).toDF("shingles")
      .select(array((0 until 4).map(t =>
        array_min(transform(col("shingles"), s => xxhash64(s, lit(t))))): _*).as("sig"))
      .as[Seq[Long]].head()
    r(2).getSeq[Long](1) shouldBe hof
  }

  test("minhash_bands equals banded recombination of minhash_sigs") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val bands = 5
    val r = 2
    val rows = docs
      .select(
        call_function("minhash_bands",
          Dedup.wordNGramsFused(spark, col("text"), 3), lit(bands), lit(r)).as("keys"),
        call_function("minhash_sigs",
          Dedup.wordNGramsFused(spark, col("text"), 3), lit(bands * r)).as("sigs"))
      .as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (keys, sigs) =>
      keys should have size bands
      // key b = xxhash64(b, sig(2b), sig(2b+1)) — the SQL fold with seed 42
      val expected = (0 until bands).map { b =>
        spark.range(1).select(
          xxhash64(lit(b), lit(sigs(2 * b)), lit(sigs(2 * b + 1)))).as[Long].head()
      }
      keys shouldBe expected
    }
  }

  test("sorted_hashes equals sorted-distinct HOF xxhash64 of the grams") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val rows = docs
      .select(
        call_function("sorted_hashes",
          array_distinct(Dedup.wordNGramsFused(spark, col("text"), 3))).as("kernel"),
        array_sort(array_distinct(transform(
          array_distinct(Dedup.wordNGramsFused(spark, col("text"), 3)),
          s => xxhash64(s)))).as("hof"))
      .as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (kernel, hof) => kernel shouldBe hof }
  }

  test("sorted_intersect_n equals size(array_intersect) on sorted-unique longs") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val cases = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)),   // partial overlap
      (Seq(1L, 2L), Seq(3L, 4L)),                     // disjoint
      (Seq(-5L, 0L, 7L), Seq(-5L, 0L, 7L)),           // identical, negatives
      (Seq.empty[Long], Seq(1L, 2L)),                 // empty side
      (Seq(Long.MinValue, Long.MaxValue), Seq(Long.MinValue))) // extremes
    val rows = cases.toDF("a", "b")
      .select(
        call_function("sorted_intersect_n", col("a"), col("b")).as("kernel"),
        org.apache.spark.sql.functions.size(
          array_intersect(col("a"), col("b"))).as("builtin"))
      .as[(Int, Int)].collect()
    rows.foreach { case (k, b) => k shouldBe b }
  }

  test("minhashPairs (native banded) recovers the planted near-dups exactly") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", 0.5)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    val keys = pairs.map(p => (p._1, p._2)).toSet
    keys should contain((1L, 4L))
    pairs.find(p => p._1 == 1L && p._2 == 4L).get._3 shouldBe 1.0 // exact dup
    keys.exists(p => p._1 == 3L || p._2 == 3L) shouldBe false
  }

  test("minhashPairsAgainst matches a new batch against a corpus, no self-pairs") {
    // batch = odd ids (1, 3, 5), corpus = even ids (2, 4): doc 1 is an
    // exact dup of corpus doc 4 (J = 1) and a near-dup of corpus doc 2
    // (differs in the last word); docs 3 and 5 are unrelated to anything
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val pairs = Dedup.minhashPairsAgainst(batch, corpus, "doc_id", "text", 0.5)
      .select("new_id", "corpus_id", "jaccard").as[(Long, Long, Double)].collect()
    val keys = pairs.map(p => (p._1, p._2)).toSet
    keys should contain((1L, 4L))
    pairs.find(p => p._1 == 1L && p._2 == 4L).get._3 shouldBe 1.0
    keys should contain((1L, 2L)) // near-dup across the split
    keys.map(_._1) should not contain 3L
    keys.map(_._1) should not contain 5L
    // direction is batch → corpus only
    keys.map(_._1).foreach(id => (id % 2) shouldBe 1L)
    keys.map(_._2).foreach(id => (id % 2) shouldBe 0L)
  }

  test("minhashPairsMl (spark.ml twin) also recovers the planted near-dups") {
    val pairs = Dedup.minhashPairsMl(docs, "doc_id", "text", 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    pairs should contain((1L, 4L))
    pairs.exists(p => p._1 == 3L || p._2 == 3L) shouldBe false
  }

  test("simhash: identical texts → identical signatures (hamming 0)") {
    val sigs = docs.filter(col("doc_id").isin(1, 4))
      .select(Dedup.simhash(spark, col("text")).as("s")).as[Long].collect()
    sigs(0) shouldBe sigs(1)
  }

  test("simhashPairs finds the exact dup with hamming 0") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", 3)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect()
    pairs.find(p => p._1 == 1L && p._2 == 4L).map(_._3) shouldBe Some(0)
  }

  test("minhash index round-trip equals the in-memory incremental path") {
    val dir = tmpDir("minhash_idx")
    val corpus = docs.filter("doc_id % 2 = 0")
    val batch = docs.filter("doc_id % 2 = 1")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", dir, 0.5)
    val viaIndex = Dedup.minhashPairsAgainstIndex(batch, "doc_id", "text", dir, 0.5)
      .select("new_id", "corpus_id", "jaccard")
      .as[(Long, Long, Double)].collect().sorted
    val inMemory = Dedup.minhashPairsAgainst(batch, corpus, "doc_id", "text", 0.5)
      .select("new_id", "corpus_id", "jaccard")
      .as[(Long, Long, Double)].collect().sorted
    viaIndex shouldBe inMemory
    viaIndex should not be empty // 1↔4 exact dup crosses the odd/even split
  }

  test("minhash index refuses mismatched LSH parameters") {
    val dir = tmpDir("minhash_idx_bad")
    Dedup.writeMinhashIndex(docs, "doc_id", "text", dir, 0.5)
    val e = intercept[IllegalArgumentException](
      Dedup.minhashPairsAgainstIndex(docs, "doc_id", "text", dir, 0.7))
    e.getMessage should include("was built with")
  }

  test("keeperByQuality keeps the best-quality doc, id breaks ties") {
    val groups = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "group_id")
    val quality = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (10L, 0.4), (11L, 0.4))
      .toDF("doc_id", "quality_score")
    val got = Dedup.keeperByQuality(groups, quality, "doc_id", "quality_score")
      .select("group_id", "keeper_id", "n_docs")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    got shouldBe Array((1L, 2L, 3L), (10L, 10L, 2L)) // 2 beats 3 on the tie
  }

  test("longSubstringPairs recovers exact span lengths on planted overlaps") {
    // 20-token base; doc 11 copies tokens 3..14 (12 tokens) of doc 10 with
    // unique filler; doc 12 copies only 9 tokens (below minSpan); doc 13
    // shares nothing
    val base = (1 to 20).map(i => s"w$i").mkString(" ")
    val span12 = (3 to 14).map(i => s"w$i").mkString(" ")
    val span9 = (3 to 11).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (10L, base),
      (11L, s"fa fb $span12 fc"),
      (12L, s"ga gb $span9 gc"),
      (13L, "ha hb hc hd he hf hg hh hi hj hk hl hm hn")).toDF("doc_id", "text")
    val got = Dedup.longSubstringPairs(corpus, "doc_id", "text",
      n = 8, minSpan = 12, maxDocFreq = 32)
      .select("doc_a", "doc_b", "max_span_tokens")
      .as[(Long, Long, Long)].collect().toSet
    // the 11↔12 pair also shares tokens w3..w11 (9 < minSpan) → excluded
    got shouldBe Set((10L, 11L, 12L))
  }

  test("longSubstringPairs: whole-doc duplicate reports the full length") {
    val t = (1 to 15).map(i => s"v$i").mkString(" ")
    val corpus = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val got = Dedup.longSubstringPairs(corpus, "doc_id", "text",
      n = 8, minSpan = 12, maxDocFreq = 32)
      .as[(Long, Long, Long)].collect()
    got.toSeq shouldBe Seq((1L, 2L, 15L))
  }

  test("longSubstringPairs stop-gram cap drops high-df shingles") {
    // the same 12-token span in 5 docs: df of every span shingle is 5,
    // so maxDocFreq = 4 must suppress all pairs
    val span = (1 to 12).map(i => s"s$i").mkString(" ")
    val corpus = (1L to 5L).map(i => (i, s"u$i $span z$i")).toDF("doc_id", "text")
    Dedup.longSubstringPairs(corpus, "doc_id", "text",
      n = 8, minSpan = 12, maxDocFreq = 4).count() shouldBe 0L
    Dedup.longSubstringPairs(corpus, "doc_id", "text",
      n = 8, minSpan = 12, maxDocFreq = 5).count() shouldBe 10L // all C(5,2)
  }
}
