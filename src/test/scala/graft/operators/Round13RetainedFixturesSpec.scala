package graft.operators

import graft.SparkSpec
import graft.llm.Multimodal
import org.apache.spark.sql.functions._

/** RETAINED hand-computed fixtures and brute-force equivalences (round-13
  * advice: the Round13OpsSpec rewrite dropped these without relocating
  * them, leaving j12/st17/x14/mm09/p15 pinned only by the SQL oracle).
  * Restored verbatim from commit 5beccb8 for the still-shipping
  * operators: j12 box-box overlap join, st17's per-row zone tagger, x14
  * sliding-window membership math, mm09 landmark feature vectors, p15
  * curation-pipeline composition.
  */
class Round13RetainedFixturesSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------- j12 ---

  /** A-boxes 20°×30°, B-boxes 10°×15° — hand layout with coincident
    * corners on BOTH sides (the collapse path), an exact edge-touch
    * (closed intervals: touching counts), and isolated boxes.
    */
  private val aBoxes = Seq(
    (1L, 0.0, 0.0), (2L, 0.0, 0.0),        // coincident A corners
    (3L, 15.0, 25.0),
    (4L, -40.0, -60.0),
    (5L, 70.0, 120.0)                      // overlaps nothing
  ).toDF("aid", "alat", "alon")

  private val bBoxes = Seq(
    (10L, 5.0, 10.0), (11L, 5.0, 10.0),    // coincident B corners, inside a1/a2
    (12L, 20.0, 30.0),                     // touches a1/a2's max corner exactly
    (13L, -45.0, -70.0),                   // overlaps a4 (negative coords / floor)
    (14L, 25.0, 55.0),                     // inside a3's box, lon edge-touch at 55
    (15L, -100.0, -200.0)                  // overlaps nothing
  ).toDF("bid", "blat", "blon")

  /** Exact O(N²) overlap replay (closed intervals on both axes). */
  private def bruteOverlap() = aBoxes.crossJoin(bBoxes)
    .filter(col("alat") <= col("blat") + 10 && col("blat") <= col("alat") + 20 &&
      col("alon") <= col("blon") + 15 && col("blon") <= col("alon") + 30)
    .groupBy("aid")
    .agg(count(lit(1)).as("n_overlaps"), min("bid").as("min_b_id"))
    .select(col("aid").as("box_id"), col("n_overlaps"), col("min_b_id"))
    .orderBy("box_id")

  test("boxOverlapStats: grid == brute-force overlap replay, incl. " +
      "coincident corners, edge-touching boxes, and negative coordinates") {
    val got = graft.joins.GeoJoin.boxOverlapStats(
      aBoxes, "aid", "alat", "alon", 20.0, 30.0,
      bBoxes, "bid", "blat", "blon", 10.0, 15.0)
      .orderBy("box_id")
      .as[(Long, Long, Long)].collect().toSeq
    val want = bruteOverlap().as[(Long, Long, Long)].collect().toSeq
    // the fixture exercises what it claims: a coincident-corner pile on
    // both sides and a box with zero overlaps dropping out
    want.map(_._1) shouldBe Seq(1L, 2L, 3L, 4L)
    want.filter(r => r._1 == 1L || r._1 == 2L).map(_._2).distinct.size shouldBe 1
    got shouldBe want
  }

  test("boxOverlapStats is partitioning-invariant") {
    val base = graft.joins.GeoJoin.boxOverlapStats(
      aBoxes, "aid", "alat", "alon", 20.0, 30.0,
      bBoxes, "bid", "blat", "blon", 10.0, 15.0)
      .orderBy("box_id").as[(Long, Long, Long)].collect().toSeq
    val got = graft.joins.GeoJoin.boxOverlapStats(
      aBoxes.repartition(7), "aid", "alat", "alon", 20.0, 30.0,
      bBoxes.repartition(5), "bid", "blat", "blon", 10.0, 15.0)
      .orderBy("box_id").as[(Long, Long, Long)].collect().toSeq
    got shouldBe base
  }

  test("boxOverlapStats rejects non-positive box dimensions") {
    an[IllegalArgumentException] should be thrownBy
      graft.joins.GeoJoin.boxOverlapStats(
        aBoxes, "aid", "alat", "alon", 0.0, 30.0,
        bBoxes, "bid", "blat", "blon", 10.0, 15.0)
  }

  // ------------------------------------------------------ st17 ---

  test("zoneTagEachRow == zoneTag on the same batch frames (the st17 " +
      "streaming form is the batch answer per point)") {
    // j11's real lattices at fixture scale, extended past the wrap so
    // coincident point positions exist
    val pts = (1 to 500).map { k =>
      (k.toLong,
        ((k * 7) % 180).toDouble - 90 + 0.25,
        ((k * 13) % 360).toDouble - 180 + 0.5)
    }.toDF("id", "lat", "lon")
    val zones = (1 to 150).map { k =>
      (k.toLong, ((k * 23) % 140).toDouble - 70, ((k * 29) % 300).toDouble - 150)
    }.toDF("zone_id", "lat0", "lon0")
    val collapsed = graft.joins.GeoJoin.zoneTag(
      pts, "id", "lat", "lon", zones, "zone_id", "lat0", "lon0", 20.0, 30.0)
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    val perRow = graft.joins.GeoJoin.zoneTagEachRow(
      pts, "id", "lat", "lon", zones, "zone_id", "lat0", "lon0", 20.0, 30.0)
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    collapsed.nonEmpty shouldBe true
    perRow shouldBe collapsed
  }

  // ------------------------------------------------------- x14 ---

  test("x14 window math: the bounded ×3 explode covers exactly the 3h " +
      "windows containing each event, and per-window distincts equal the " +
      "brute range-membership replay") {
    // (user, hour) fixture with piles, gaps, and repeat visits
    val ev = Seq((1L, 100L), (1L, 100L), (2L, 100L), (1L, 101L), (3L, 102L),
      (2L, 104L), (3L, 104L), (1L, 107L)).toDF("user_id", "h")
    val got = ev
      .select(col("user_id"), explode(sequence(col("h") - 2, col("h"))).as("win_h"))
      .groupBy("win_h").agg(countDistinct(col("user_id")).as("d"))
      .orderBy("win_h").as[(Long, Long)].collect().toSeq
    // brute: window w = [w, w+2]; only windows some event generates appear
    val hs = Seq(100L -> 1L, 100L -> 1L, 100L -> 2L, 101L -> 1L, 102L -> 3L,
      104L -> 2L, 104L -> 3L, 107L -> 1L).map { case (h, u) => (u, h) }
    val wins = hs.flatMap { case (_, h) => (h - 2) to h }.distinct.sorted
    val want = wins.map { w =>
      (w, hs.filter { case (_, h) => h >= w && h <= w + 2 }.map(_._1).distinct.size.toLong)
    }
    got shouldBe want
    // every event lands in exactly 3 windows
    ev.select(col("user_id"), explode(sequence(col("h") - 2, col("h"))))
      .count() shouldBe 3L * ev.count()
  }

  // ------------------------------------------------------ mm09 ---

  test("extractLandmarkVectors: hand-computed closed-form vector, " +
      "interleaving consistent with the landmark fingerprint") {
    val media = Multimodal.syntheticWav(Seq(7L).toDF("doc_id"), "doc_id", 256, 16000)
    val v = Multimodal.extractLandmarkVectors(media).collect().head
    v.doc_id shouldBe 7L
    // closed form: sample i of doc 7 is (seed + 7 i) % 2001 − 1000
    val seed = ((7L * 53) % 1009).toInt
    val samples = (0 until 256).map(i => (seed + 7 * i) % 2001 - 1000)
    val want = (0 until 8).flatMap { w =>
      val win = samples.slice(w * 32, (w + 1) * 32).map(math.abs)
      val amp = win.max
      val off = win.indexOf(amp) // FIRST max on ties
      Seq(off.toFloat, amp.toFloat)
    }
    v.embedding.toSeq shouldBe want
    // the vector is the fingerprint's numeric form, pairwise
    val fp = Multimodal.extractAudioFingerprints(media).collect().head.fp
    fp shouldBe v.embedding.grouped(2)
      .map(p => s"${p(0).toInt}:${p(1).toInt}").mkString("-")
  }

  // ------------------------------------------------------- p15 ---

  test("p15 composition: kept set is dedup-surviving, quality-gated, " +
      "quota-capped per source with contiguous ranks and a survivor-" +
      "relative cap (sf0.01)") {
    val d = "/root/testdata/sf0.01"
    val kept = graft.SparkEntry.queries("p15_curation_pipeline")(spark, d)
      .select(col("source"), col("doc_id"), col("rank"))
      .as[(String, Long, Long)].collect().toSeq
    kept.nonEmpty shouldBe true
    // independent survivor replay from the component operators
    val docs = graft.util.Tables.documents(spark, d)
    val keepers = graft.llm.Dedup
      .dedupKeepFirstByFingerprint(docs, "text", "doc_id")
      .select(col("keeper_id")).as[Long].collect().toSet
    val comps = graft.llm.TextAnalysis
      .qualityComponentsFused(spark, col("text"), Seq("the", "a")).toMap
    val survivors = docs
      .select(col("doc_id"), col("source"),
        comps("word_cnt").as("wc"), comps("quality_score").as("q"))
      .filter(col("q") >= 0.5 && col("wc").between(5, 1000))
      .select(col("doc_id"), col("source"))
      .as[(Long, String)].collect().toSeq
      .filter { case (id, _) => keepers.contains(id) }
    val cap = math.max(5L, survivors.size / 100L)
    val bySource = survivors.groupBy(_._2).view.mapValues(_.size).toMap
    kept.map(_._2).toSet.subsetOf(survivors.map(_._1).toSet) shouldBe true
    kept.groupBy(_._1).foreach { case (src, rows) =>
      rows.size.toLong shouldBe math.min(cap, bySource(src).toLong)
      rows.map(_._3).sorted shouldBe (1L to rows.size)
    }
  }
}
