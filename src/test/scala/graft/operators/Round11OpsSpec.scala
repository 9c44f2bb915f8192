package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the round-11 operators: w12 TWAP, d16
  * containment, s08 MaxSim, t18 lexical diversity.
  */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  test("twapPerUser: duration-weighted mean, last event weightless, " +
      "event_id tiebreak, zero-span users dropped") {
    // user 1: c=100 holds 10µs, c=300 holds 30µs, trailing event dropped
    //   → vdur = 100·10 + 300·30 = 10000 cent·µs over 40µs → twap 250
    // user 2: single event → no interval → absent
    // user 3: both events at one t → Σdur = 0 → dropped by the guard
    // user 4: same-t pair ordered by event_id (c=100 then c=200), then a
    //   later event: durs 0 and 5 → twap = 200 (tiebreak-sensitive: the
    //   wrong order would weight c=100 instead)
    val p = Seq(
      (1L, 1L, 0L, 100L), (2L, 1L, 10L, 300L), (3L, 1L, 40L, 0L),
      (4L, 2L, 0L, 500L),
      (5L, 3L, 7L, 100L), (6L, 3L, 7L, 200L),
      (10L, 4L, 0L, 100L), (11L, 4L, 0L, 200L), (12L, 4L, 5L, 0L))
      .toDF("event_id", "user_id", "t_us", "c")
    val got = Windows.twapPerUser(p)
      .select("user_id", "n_intervals", "dur_us", "vdur_cent_us", "twap_cents")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    got shouldBe Seq(
      (1L, 2L, 40L, 10000L, 250L),
      (4L, 2L, 5L, 1000L, 200L))
  }

  test("containmentPairs: directional, threshold-inclusive, integer-exact") {
    // doc 1 ⊂ doc 2: grams(1) = {abc,bcd} all inside grams(2) → C(1→2) = 1
    //   while C(2→1) = 2/4 = 0.5 → only the inner→outer direction emits
    // docs 4,5: share 4 of 5 grams each way → C = 0.8 exactly, boundary
    //   INCLUSIVE → both directions emit 800000
    // doc 3: disjoint → nothing
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d e f"), (3L, "x y z w"),
      (4L, "p q r s t u v"), (5L, "p q r s t u x"))
      .toDF("doc_id", "text")
    val got = graft.llm.Dedup.containmentPairs(docs, "doc_id", "text", 3,
        minContainmentMicro = 800000L)
      .orderBy("inner_doc", "outer_doc")
      .as[(Long, Long, Long)].collect().toSeq
    got shouldBe Seq((1L, 2L, 1000000L), (4L, 5L, 800000L), (5L, 4L, 800000L))
  }

  test("maxSimTopK: per-query-vector max, per-doc sum, self excluded") {
    // probe doc 0 = {(1,0), (0,1)}; doc 1 = {(1,0)}: maxes 1.0 and 0.0
    // → 1000000; doc 2 = {(0.6,0.8)}: maxes 0.6 and 0.8 → 1400000.
    // Ranking: doc 2 first (higher summed score), doc 0 never scored
    // against itself.
    val v = Seq(
      (0L, 0L, Array(1.0f, 0.0f)), (0L, 1L, Array(0.0f, 1.0f)),
      (1L, 10L, Array(1.0f, 0.0f)),
      (2L, 20L, Array(0.6f, 0.8f)))
      .toDF("doc", "vec", "embedding")
    val got = graft.llm.Similarity.maxSimTopK(spark, v,
        v.filter(col("doc") === 0), "doc", "vec", "embedding", 5)
      .as[(Long, Long, Long, Long)].collect().toSeq
    got shouldBe Seq((0L, 2L, 1400000L, 1L), (0L, 1L, 1000000L, 2L))
  }

  test("ohlcBars: first/last under total order, hour bucketing, exact sums") {
    // user 1, hour 0: values 300 (t=0), 100 (t=5), 200 (t=9) → open 300,
    //   close 200, high 300, low 100, vol 600
    // user 1, hour 1 (t_us ≥ 3.6e9): single 50 → all four = 50
    // user 2, hour 0: same-t pair tie-broken by event_id: open c=70
    //   (e20), close c=80 (e21)
    val p = Seq(
      (1L, 1L, 0L, 300L), (2L, 1L, 5L, 100L), (3L, 1L, 9L, 200L),
      (4L, 1L, 3600000000L, 50L),
      (20L, 2L, 0L, 70L), (21L, 2L, 0L, 80L))
      .toDF("event_id", "user_id", "t_us", "c")
    val got = Windows.ohlcBars(p)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    got shouldBe Seq(
      (1L, 0L, 300L, 300L, 100L, 200L, 3L, 600L),
      (1L, 1L, 50L, 50L, 50L, 50L, 1L, 50L),
      (2L, 0L, 70L, 80L, 70L, 80L, 2L, 150L))
  }

  test("audio landmark fingerprint survives container re-encode; junk chunk decodes") {
    // identical PCM, different bytes (extra LIST/INFO chunk) → same fp
    val f: Int => Int = i => (i * 37) % 2001 - 1000
    val plain = graft.llm.Multimodal.wavEncode(16000, f, 256)
    val reenc = graft.llm.Multimodal.wavEncodeWithInfoChunk(16000, f, 256, "tool-v2")
    plain should not equal reenc
    val fpA = graft.llm.Multimodal.audioLandmarkFingerprint(
      graft.llm.Multimodal.wavDecode(plain))
    val fpB = graft.llm.Multimodal.audioLandmarkFingerprint(
      graft.llm.Multimodal.wavDecode(reenc))
    fpA shouldBe fpB
    fpA.split("-") should have length 8 // 256 samples / 32 per window
    // hand-check window 0: |37i - 1000| on i=0..31 is max at i=0 (1000)
    fpA.split("-").head shouldBe "0:1000"
    // different PCM → different fp (window-0 max moves to the tail)
    val other = graft.llm.Multimodal.wavEncode(16000, i => i * 30 - 400, 256)
    graft.llm.Multimodal.audioLandmarkFingerprint(
      graft.llm.Multimodal.wavDecode(other)) should not equal fpA
  }

  test("exact index: dup/new labeling with keeper attribution round-trips the store") {
    val corpus = Seq((10L, "Alpha  beta"), (11L, "alpha beta"), (12L, "gamma"))
      .toDF("doc_id", "text") // 10 and 11 share a normalized fingerprint
    val path = tmpDir("d17-idx")
    graft.llm.Dedup.writeExactIndex(corpus, "doc_id", "text", path)
    val batch = Seq((100L, "ALPHA BETA"), (101L, "delta")).toDF("doc_id", "text")
    val got = graft.llm.Dedup.matchAgainstExactIndex(spark, batch,
        "doc_id", "text", path)
      .orderBy("batch_id")
      .as[(Long, String, Option[Long])].collect().toSeq
    got shouldBe Seq((100L, "dup", Some(10L)), (101L, "new", None))
  }

  test("geo radiusJoin: grid recall == brute force, incl. polar crowding") {
    // 400 deterministic lattice points, including near-polar rows where
    // lat/lon cells would lose recall — the XYZ cells must reproduce the
    // exact brute-force pair set at two different radii
    val pts = (1 to 400).map { k =>
      (k.toLong,
        ((k * 7) % 180).toDouble - 90 + 0.25,
        ((k * 13) % 360).toDouble - 180 + 0.5)
    }.toDF("id", "lat", "lon")
    for (r <- Seq(150.0, 400.0)) {
      val grid = graft.joins.GeoJoin.radiusJoin(pts, "id", "lat", "lon", r)
        .orderBy("id_a", "id_b")
        .as[(Long, Long, Double)].collect().toSeq
      val a = pts.select(col("id").as("id_a"), col("lat").as("la"), col("lon").as("oa"))
      val b = pts.select(col("id").as("id_b"), col("lat").as("lb"), col("lon").as("ob"))
      val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .withColumn("dist_km", round(graft.features.Derived.haversineKm(
          col("la"), col("oa"), col("lb"), col("ob")), 4))
        .filter(col("dist_km") <= r)
        .select("id_a", "id_b", "dist_km").orderBy("id_a", "id_b")
        .as[(Long, Long, Double)].collect().toSeq
      withClue(s"radius $r: ") {
        brute.nonEmpty shouldBe true
        grid shouldBe brute
      }
    }
  }

  test("geo radiusJoin: result set is partitioning-invariant") {
    val pts = (1 to 300).map { k =>
      (k.toLong,
        ((k * 7) % 180).toDouble - 90 + 0.25,
        ((k * 13) % 360).toDouble - 180 + 0.5)
    }.toDF("id", "lat", "lon")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      graft.joins.GeoJoin.radiusJoin(df, "id", "lat", "lon", 300.0)
        .orderBy("id_a", "id_b")
        .as[(Long, Long, Double)].collect().toSeq
    val base = pairs(pts)
    base.nonEmpty shouldBe true
    pairs(pts.repartition(13)) shouldBe base
    pairs(pts.repartition(1)) shouldBe base
  }

  test("rollingZscoreFlags: trailing-8 baseline, sqrt-free 3-sigma compare") {
    // user 1: eight purchases alternating 100/102 (t=1..8), then a 200
    // spike at t=9 and a 101 at t=10.
    //  t=9 : baseline t1..8 → s=808, sq=81616; (200·8−808)²=627264 >
    //        9·(8·81616−808²)=9·64 → ANOMALY
    //  t=10: baseline t2..9 (incl. the spike) → s=908, sq=111616;
    //        (101·8−908)²=10000 ≤ 9·(8·111616−908²)=616176 → clean
    // user 2: only 5 purchases → baseline never reaches 8 → no rows
    val rows = (1 to 8).map(t =>
        (t.toLong, 1L, t.toLong, if (t % 2 == 1) 100L else 102L)) ++
      Seq((9L, 1L, 9L, 200L), (10L, 1L, 10L, 101L)) ++
      (1 to 5).map(t => (100L + t, 2L, t.toLong, 100L))
    val p = rows.toDF("event_id", "user_id", "t_us", "c")
    val got = Windows.rollingZscoreFlags(p)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    got shouldBe Seq(
      (1L, 9L, 200L, 808L, 81616L, 1L),
      (1L, 10L, 101L, 908L, 111616L, 0L))
  }

  test("gramNovelty: min-doc first-occurrence attribution, micro ratio") {
    // doc 1 "a b c d": grams {abc,bcd} both first here → 1000000
    // doc 2 "b c d e": {bcd (first in doc 1), cde} → 1 of 2 novel
    // doc 3 "a b c":   {abc (first in doc 1)} → 0 novel
    val docs = Seq((1L, "a b c d"), (2L, "b c d e"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val got = CorpusOps.gramNovelty(docs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    got shouldBe Seq(
      (1L, 2L, 2L, 1000000L), (2L, 2L, 1L, 500000L), (3L, 1L, 0L, 0L))
  }

  test("boilerplateGrams: corpus-relative df threshold, micro ratio exact") {
    // 4 docs → thr = greatest(2, 4 div 250) = 2, so common means df ≥ 3.
    // 'a b c' appears in docs 1,2,3 (df 3 → common); every other gram has
    // df 1. Docs 1–3: 2 grams, 1 common → 500000; doc 4: 0 common.
    // doc 5 ("z z z z z"): array_distinct collapses its repeated gram to
    // one → 1 gram, 0 common (df 1).
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c x"), (3L, "a b c y"),
      (4L, "p q r s"), (5L, "z z z z z"))
      .toDF("doc_id", "text")
    val got = CorpusOps.boilerplateGrams(docs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    got shouldBe Seq(
      (1L, 2L, 1L, 500000L), (2L, 2L, 1L, 500000L), (3L, 2L, 1L, 500000L),
      (4L, 2L, 0L, 0L), (5L, 1L, 0L, 0L))
  }

  test("lexicalDiversity: token/type/hapax counts and micro ratios") {
    // "a b a c": 4 tokens, 3 types, hapaxes {b,c} → ttr 750000, hapax 500000
    // "x x": 2 tokens, 1 type, 0 hapax
    // "a  b" (double space): empty token filtered → 2 tokens, 2 types
    val docs = Seq((1L, "a b a c"), (2L, "x x"), (3L, "a  b"))
      .toDF("doc_id", "text")
    val got = CorpusOps.lexicalDiversity(docs)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    got shouldBe Seq(
      (1L, 4L, 3L, 2L, 750000L, 500000L),
      (2L, 2L, 1L, 0L, 500000L, 0L),
      (3L, 2L, 2L, 2L, 1000000L, 1000000L))
  }
}
