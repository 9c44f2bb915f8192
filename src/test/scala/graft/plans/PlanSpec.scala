package graft.plans

import graft.{SparkEntry, SparkSpec}

/** Physical-plan regression snapshots for the flagship queries.
  *
  * SCALE.md's pushed-down / zero-shuffle / broadcast claims were
  * verified manually via Explain and can silently rot under refactors —
  * these tests pin the FINAL adaptive plan's shape (shuffle count,
  * broadcast count, whole-stage-codegen presence, scan ReadSchema
  * widths) at sf0.001. Deliberately breaking a pushdown (selecting all
  * columns before a projection, de-broadcasting a dim) fails the
  * corresponding test.
  *
  * The snapshot is an EXACT equality, not an upper bound: a plan that
  * gets BETTER (fewer shuffles) should also be noticed — update the
  * literal and SCALE.md together. Counts are taken from the final plan
  * section only (`executedPlan.toString` after execution prints final +
  * "== Initial Plan ==" sections; the initial one would double-count).
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** (shuffles, broadcasts, codegenStages, scan widths sorted).
    * Measured on a cold cache: the suite shares one session, and the
    * CacheManager substitutes InMemoryRelation for any plan fragment an
    * earlier suite cached over the same parquet path — which silently
    * changes exchange counts with run order (seen once: s02 9-vs-10).
    */
  private def finalShape(name: String): (Int, Int, Int, Seq[Int]) = {
    spark.catalog.clearCache()
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    val p = full.split("== Initial Plan ==").head
    val ex = "Exchange".r.findAllIn(p).length
    val bc = "BroadcastExchange".r.findAllIn(p).length
    val cg = """\*\((\d+)\)""".r.findAllMatchIn(p).map(_.group(1)).toSet.size
    val widths = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p)
      .map(_.group(1).count(_ == ':')).toSeq.sorted
    assert(!p.contains("Python"), s"$name: Python eval crept into the plan")
    (ex - bc, bc, cg, widths)
  }

  test("q14 flagship join: dim broadcast, pruned 2-col scans") {
    val (sh, bc, cg, w) = finalShape("q14_join_agg")
    (sh, bc, w) shouldBe ((2, 1, Seq(2, 2)))
    cg should be >= 2 // join + agg stay inside whole-stage codegen
  }

  test("a02 capping: two-level prefix sum, no global-order window") {
    val (sh, bc, cg, w) = finalShape("a02_capping")
    (bc, w) shouldBe ((4, Seq(1, 1, 3)))
    // same AQE exchange-reuse wobble as s02 below: depending on stage
    // completion order across a shared-session suite run, one of the
    // prefix-sum subtrees occasionally rides a reused exchange (observed
    // 11 in-suite vs 12 isolated; 11 is the BETTER plan). Pin the band.
    sh should (be >= 11 and be <= 12)
    cg should be >= 5
  }

  test("d02 minhash: banded candidate join, one pruned scan feeds the " +
      "cached shingles") {
    val (sh, bc, cg, w) = finalShape("d02_minhash_lsh")
    // the scan-spread (round 18) repartitions the 2-col source once and
    // the cached shingle frame feeds band keys AND both verify sides —
    // ONE pruned documents scan where the pre-spread plan scanned it four
    // times. Join strategies over the now-cached relation are AQE's call
    // (observed 3 plain shuffles / 0 broadcasts isolated); pin bands, not
    // the wobble — a lost bucketing would blow far past them.
    w shouldBe Seq(2)
    sh should (be >= 2 and be <= 4)
    bc should (be >= 0 and be <= 3)
    cg should be >= 3
  }

  test("d07 components: per-round plan stays checkpoint-truncated") {
    val (sh, bc, _, w) = finalShape("d07_neardup_components")
    (sh, bc, w) shouldBe ((1, 0, Seq()))
  }

  test("s02 ivf: sampled fit + nprobe scan keeps probe side broadcast") {
    val (sh, bc, _, _) = finalShape("s02_cosine_topk_ivf")
    bc shouldBe 7
    // AQE occasionally reuses one exchange across the fit/scan subtrees
    // depending on stage completion order (observed 9-vs-10 across
    // otherwise-identical suite runs, both full-suite and isolated; 9 is
    // the BETTER plan). Pin the band, not the wobble — a real regression
    // (lost broadcast, extra shuffle stage) lands well outside it.
    sh should (be >= 9 and be <= 10)
  }

  test("x10 bloom join: probe is codegen'd, no extra shuffle") {
    val (sh, bc, cg, w) = finalShape("x10_bloom_join")
    (sh, bc, w) shouldBe ((2, 1, Seq(2, 3)))
    cg should be >= 2
  }

  test("x11 bucketed join: zero broadcast, layout-co-located") {
    val (sh, bc, _, w) = finalShape("x11_bucketed_join")
    (sh, bc, w) shouldBe ((2, 0, Seq(2, 2)))
  }

  test("j03 auto range join: conf-scoped result stays driver-bounded") {
    val (sh, bc, _, w) = finalShape("j03_range_join_auto")
    (sh, bc, w) shouldBe ((0, 0, Seq()))
  }

  test("st04 stream-stream join result agg") {
    val (sh, bc, _, w) = finalShape("st04_stream_stream_join")
    (sh, bc, w) shouldBe ((2, 0, Seq()))
  }

  test("m16 pca: moment rows stay a driver-sized local relation") {
    val (sh, bc, _, w) = finalShape("m16_pca")
    (sh, bc, w) shouldBe ((0, 0, Seq()))
  }

  test("p13 weighted sample: ZERO shuffles — map-side keys into TakeOrdered") {
    spark.catalog.clearCache()
    val df = graft.SparkEntry.queries("p13_weighted_sample")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    p should include("TakeOrdered") // distributed top-k, not a global sort
    val (sh, bc, _, w) = finalShape("p13_weighted_sample")
    (sh, bc, w) shouldBe ((0, 0, Seq(2)))
  }

  test("t17 lm perplexity: fused scoring — only calibration/agg exchanges, model broadcast once") {
    val (sh, bc, _, w) = finalShape("t17_lm_perplexity")
    bc shouldBe 1 // the per-lang threshold table; the LM itself rides the expression, not a join
    w shouldBe Seq(2, 3) // pruned doc scans (fit path, scoring path)
    // corpus-shaped work is the two scans; exchanges carry per-doc or
    // per-lang rows only. AQE exchange reuse on the double-consumed
    // scored frame gives the usual ±1 wobble — pin the band.
    sh should (be >= 4 and be <= 6)
  }

  test("mm07 video signatures: decode scan + signature groupBy, nothing pairwise") {
    val (sh, bc, cg, w) = finalShape("mm07_video_signature_dedup")
    (sh, bc, w) shouldBe ((2, 0, Seq(1))) // doc_id-only scan feeds the generator
    cg should be >= 2
  }

  test("w11 decayed sum: one window partition exchange + output sort only") {
    val (sh, bc, cg, w) = finalShape("w11_decayed_sum")
    (sh, bc, w) shouldBe ((2, 0, Seq(5)))
    cg should be >= 2
  }

  test("s07 range search: broadcast probes + map-side threshold, sort only") {
    val (sh, bc, _, w) = finalShape("s07_cosine_range")
    (sh, bc, w) shouldBe ((1, 1, Seq(2, 2))) // the 1 shuffle is the output sort
  }

  test("w12 twap: window partitioning REUSED by the groupBy — no extra exchange") {
    val (sh, bc, cg, w) = finalShape("w12_twap")
    // window's hashpartitioning(user_id) satisfies the aggregate's
    // clustering, so the whole chain rides ONE user_id exchange + the
    // output sort — 3 shuffles here would mean the reuse broke
    (sh, bc, w) shouldBe ((2, 0, Seq(5)))
    cg should be >= 2
  }

  test("t18 lexical diversity: two-level agg over a pruned 2-col scan") {
    val (sh, bc, cg, w) = finalShape("t18_lexical_diversity")
    // (doc,tok) agg exchange (the only corpus-sized one, map-side
    // combined) + per-doc rollup + output sort
    (sh, bc, w) shouldBe ((3, 0, Seq(2)))
    cg should be >= 3
  }

  test("d16 containment: gram-bucketed joins, AQE picks the build sides") {
    val (sh, bc, cg, w) = finalShape("d16_containment")
    // post scan-spread (round 18): ONE 2-col gram-source scan (the spread
    // exchange fans it out to every gram consumer) + the doc_id-only scan
    w shouldBe Seq(1, 2)
    // AQE broadcasts the rare-gram and size tables at this SF and may
    // reuse exchanges across the gram consumers — pin bands, not the
    // wobble (a lost bucketing would add corpus-sized shuffles far
    // outside them). The upper band absorbs the scan-spread exchange plus
    // its ReusedExchange reads (up to 4 counted as plain Exchange by the
    // regex; verified isolated: 12 = 8 real + 4 reused, joins all
    // BroadcastHashJoin).
    sh should (be >= 5 and be <= 12)
    bc should (be >= 3 and be <= 6)
    cg should be >= 5
  }

  test("s08 maxsim: probes broadcast, two-level agg, ranked window") {
    val (sh, bc, cg, w) = finalShape("s08_maxsim_topk")
    // max-agg exchange + sum-agg exchange + rank window + output sort;
    // the probe bag rides ONE broadcast — the corpus is scanned once
    (sh, bc, w) shouldBe ((4, 1, Seq(2, 2)))
    cg should be >= 4
  }

  test("w13 ohlc: both windows + groupBy ride ONE (user,hour) exchange") {
    val (sh, bc, cg, w) = finalShape("w13_ohlc")
    (sh, bc, w) shouldBe ((2, 0, Seq(5))) // partition exchange + output sort
    cg should be >= 2
  }

  test("mm08 audio fingerprints: decode scan + fp groupBy, nothing pairwise") {
    val (sh, bc, cg, w) = finalShape("mm08_audio_fingerprint_dedup")
    (sh, bc, w) shouldBe ((2, 0, Seq(1, 1))) // doc_id-only scans feed the encoders
    cg should be >= 2
  }

  test("t19 boilerplate grams: gram-keyed join, one-row threshold broadcast") {
    val (sh, bc, cg, w) = finalShape("t19_boilerplate_grams")
    // scans: width-0 (the thr COUNT reads no columns), width-1 (the df
    // side prunes to text only), width-2 (doc_id+text gram side); the df
    // table and the one-row threshold ride broadcasts at this SF, so the
    // shuffles are the df agg, the per-doc rollup, and the output sort
    (sh, bc, w) shouldBe ((4, 2, Seq(0, 1, 2)))
    cg should be >= 3
  }

  test("w14 rolling z-score: one user-partition window exchange + output sort") {
    val (sh, bc, cg, w) = finalShape("w14_rolling_zscore")
    (sh, bc, w) shouldBe ((2, 0, Seq(5))) // 5-col purchase scan, no joins
    cg should be >= 1
  }

  test("t20 gram novelty: gram-keyed min-attribution join, pruned scans") {
    val (sh, bc, cg, w) = finalShape("t20_gram_novelty")
    // two (doc_id,text) gram scans (the attribution needs doc_id on both
    // sides); the min-per-gram table rides an AQE broadcast at this SF;
    // shuffles: min agg, per-doc rollup, output sort
    (sh, bc, w) shouldBe ((3, 1, Seq(2, 2)))
    cg should be >= 3
  }

  test("j08 geo radius join: cell equi-join, no nested-loop anywhere") {
    // probed at sf0.01, not this suite's sf0.001: there the result is
    // EMPTY (22 global lattice points, no pair within 150 km) and AQE
    // collapses the whole plan to an empty local relation
    spark.catalog.clearCache()
    val df = SparkEntry.queries("j08_geo_radius_join")(spark, "/root/testdata/sf0.01")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      "the grid join must never fall back to a nested-loop/cross plan")
    assert(plan.contains("explode"), "the 27-neighbor explode must be present")
  }

  test("d17 exact index: stored fp side broadcast-joined, sort is the only shuffle") {
    val (sh, bc, cg, w) = finalShape("d17_exact_index")
    (sh, bc, w) shouldBe ((1, 1, Seq(2, 2))) // batch (doc_id,text) + index (fp,keeper)
    cg should be >= 2
  }

  test("j09 geo k-NN join: collapsed-position grid, no nested-loop anywhere") {
    // probed at sf0.01 (the j08 rule: sf0.001's 21 global points make the
    // radius graph near-empty and AQE collapses the plan)
    spark.catalog.clearCache()
    val df = SparkEntry.queries("j09_geo_knn_join")(spark, "/root/testdata/sf0.01")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      "the position grid join must never fall back to a nested-loop/cross plan")
    assert(plan.contains("explode"), "the 27-neighbor explode must be present")
  }

  test("j10 two-table geo k-NN: collapsed-position grid, no nested-loop anywhere") {
    // probed at sf0.01 (the j08/j09 rule: sf0.001's handful of global
    // points leaves the radius graph near-empty under AQE collapse)
    spark.catalog.clearCache()
    val df = SparkEntry.queries("j10_geo_nearest_facility")(spark, "/root/testdata/sf0.01")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      "the two-table position grid join must never fall back to a nested-loop/cross plan")
    assert(plan.contains("explode"), "the 27-neighbor explode must be present")
  }

  test("j11 zone tag: collapsed-position cell equi-join, no nested-loop anywhere") {
    // probed at sf0.01 (the j08–j10 rule: sf0.001's handful of global
    // points leaves the containment graph near-empty under AQE collapse)
    spark.catalog.clearCache()
    val df = SparkEntry.queries("j11_geo_zone_tag")(spark, "/root/testdata/sf0.01")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      "the cell-grid containment join must never fall back to a nested-loop/cross plan")
    assert(plan.contains("explode"), "the box→cells explode must be present")
  }

  test("x13 approx grouped quantiles: one-pass sketch agg + broadcast-back, " +
      "pruned 2-col scans") {
    val (sh, bc, cg, w) = finalShape("x13_grouped_quantiles_approx")
    // orders scanned twice (sketch pass + rank-count pass), both pruned to
    // (o_orderpriority, o_totalprice); the 5-row sketch output rides a
    // broadcast back; shuffles: sketch agg, rank-count agg, output sort
    (sh, bc, w) shouldBe ((3, 1, Seq(2, 2)))
    cg should be >= 2
  }

  test("d18 bloom index gate: short-circuit leg is scan-only, index side " +
      "broadcast, sort is the only shuffle") {
    val (sh, bc, cg, w) = finalShape("d18_bloom_index_gate")
    // batch (doc_id,text) scanned by both legs; index (fp,keeper) joins
    // the maybe-leg via broadcast at this SF; the definite-new leg is a
    // pure filter-project — no exchange anywhere but the output sort
    (sh, bc, w) shouldBe ((1, 1, Seq(2, 2, 2)))
    cg should be >= 2
  }

  test("j12 box overlap: two-sided cell grid, no nested-loop anywhere") {
    // probed at sf0.01 (the j08–j11 rule: sf0.001's handful of boxes
    // leaves the overlap graph tiny under AQE collapse)
    spark.catalog.clearCache()
    val df = SparkEntry.queries("j12_box_overlap_join")(spark, "/root/testdata/sf0.01")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      "the two-sided cell-grid join must never fall back to a nested-loop/cross plan")
    assert(plan.contains("explode"), "the box→cells explode must be present")
  }

  test("x14 sliding-window distinct: split exact/sketch plans, no Expand, " +
      "pruned 2-col scans") {
    val (sh, bc, cg, w) = finalShape("x14_sliding_window_distinct")
    // events scanned twice (exact pass + sketch pass), both pruned to
    // (ts, user_id); shuffles: the exact distinct's two-stage agg (2),
    // the sketch agg, the output sort; the 722-row sketch output rides a
    // broadcast back onto the exact side
    (sh, bc, w) shouldBe ((4, 1, Seq(2, 2)))
    cg should be >= 2
    // the split-plan rule made visible: one fused agg would Expand
    val p = SparkEntry.queries("x14_sliding_window_distinct")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Expand"), "exact and sketch aggs must stay split")
  }

  test("p15 curation pipeline: dedup semi-join + scoring scan + one " +
      "source-partition window, every documents scan pruned") {
    val (sh, bc, cg, w) = finalShape("p15_curation_pipeline")
    // scans: documents ×4 (fp keeper agg, scoring kernel, source attach,
    // cap count) + the 1-row cap; shuffles: keeper agg, survivor count,
    // the source-partition rank window, its upstream agg, the output
    // sort; keeper set / source side / cap scalar ride broadcasts
    (sh, bc) shouldBe ((5, 5))
    w.max should be <= 2 // no documents scan reads the full row
    cg should be >= 2
  }

  test("p18 decontaminated curation: p15's stages + the stored-index " +
      "contamination join, pruned scans, one bounded cap cross only") {
    val (sh, bc, cg, w) = finalShape("p18_decontaminated_curation")
    // p15's shape (keeper agg, scoring scan, source attach, quota window,
    // output sort) + the d22 contamination path (stored band-key join,
    // two hash-table attach joins, contaminated-id distinct) with the
    // tiny contaminated set and the keeper/source/cap sides riding
    // broadcasts — broadcast count pinned exactly so a stage silently
    // de-broadcasting or the band join degenerating shows up here; the
    // shuffle count rides the a02/s02 AQE exchange-reuse wobble
    // (observed 8 isolated vs 10 in-suite; 8 is the BETTER plan)
    bc shouldBe 10
    sh should (be >= 8 and be <= 10)
    w.max should be <= 2 // every documents/index scan column-pruned
    cg should be >= 2
    // the only non-equi join is the 1-row quota-cap scalar cross (the
    // deliberate p14/p15 bounded shape); nothing pairwise anywhere else
    val p = SparkEntry.queries("p18_decontaminated_curation")(spark, sf)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    "BroadcastNestedLoopJoin".r.findAllIn(p).length shouldBe 1
    assert(!p.contains("CartesianProduct"))
  }

  test("p19 curate→pack→shard: p18's stages + ONE shard exchange, " +
      "keep-set rides broadcasts, pruned scans") {
    val (sh, bc, cg, w) = finalShape("p19_curate_pack_shard")
    // p18's plan (8-shuffle keep-set derivation, 10 broadcasts) + the
    // composition's marginal cost: one hash exchange on the shard key
    // feeding the per-shard window sort (shuffleShards' honest cost —
    // packing reuses the same window partitioning, no exchange of its
    // own), and one broadcast attaching token counts to the tiny
    // keep-set. Shuffle count rides the a02/s02/p18 AQE exchange-reuse
    // wobble; 9 (measured isolated) is the BETTER plan.
    bc shouldBe 11
    sh should (be >= 9 and be <= 11)
    w.max should be <= 2 // every documents scan column-pruned
    cg should be >= 2
    val p = SparkEntry.queries("p19_curate_pack_shard")(spark, sf)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // only the deliberate 1-row quota-cap scalar cross (p18's shape)
    "BroadcastNestedLoopJoin".r.findAllIn(p).length shouldBe 1
    assert(!p.contains("CartesianProduct"))
  }

  test("mm09 media ANN handoff: decode scan + bounded probe broadcast + " +
      "top-k agg, 1-col scans") {
    val (sh, bc, cg, w) = finalShape("mm09_media_ann_handoff")
    // scans: documents (doc_id) twice (corpus + probe legs); shuffles:
    // the top-k heap agg and the output sort; the 5-probe side rides the
    // one broadcast (a deliberate bounded nested-loop — 5 rows × corpus,
    // the s01 shape)
    (sh, bc, w) shouldBe ((2, 1, Seq(1, 1)))
    cg should be >= 2
  }

  test("x15 window heavy hitters: count agg + window rank over the count " +
      "table, no Expand, pruned 2-col scan") {
    val (sh, bc, cg, w) = finalShape("x15_window_heavy_hitters")
    // one events scan pruned to (ts, user_id); shuffles: the
    // (window, user) count agg, the per-window rank, the output sort
    (sh, bc, w) shouldBe ((3, 0, Seq(2)))
    cg should be >= 3
    val p = SparkEntry.queries("x15_window_heavy_hitters")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Expand"), "the ×3 hop-explode must not Expand")
  }

  test("p16 curriculum order: min/max scalar broadcast + stage window + " +
      "checksum agg, pruned documents scans") {
    val (sh, bc, cg, w) = finalShape("p16_curriculum_order")
    // scans: documents (text) for the min/max pass, (doc_id, text) for
    // the staged rows; the 1-row min/max scalar rides the broadcast;
    // shuffles: the stage-partition rank window, the per-stage checksum
    // agg, the output sort
    (sh, bc, w) shouldBe ((3, 1, Seq(1, 2)))
    cg should be >= 3
  }

  test("w15 interval union: ONE user-partition exchange feeds both " +
      "windows and both aggs, 3-col pruned scan") {
    val (sh, bc, cg, w) = finalShape("w15_interval_union")
    // shuffles: the user_id window partition (the running-max and
    // segment-sum windows AND the (user, seg) / user aggs all reuse it —
    // user_id is a prefix of every downstream key) + the output sort
    (sh, bc, w) shouldBe ((2, 0, Seq(3)))
    cg should be >= 4
  }

  test("p14 domain quota: one source-partition window + cap broadcast") {
    val (sh, bc, cg, w) = finalShape("p14_domain_quota")
    // scans: documents (doc_id,text) for scores, (doc_id,source) for the
    // domain, (doc_id) for the cap count; shuffles: the source-partition
    // rank window, its upstream agg, the output sort; the cap scalar and
    // BOTH sides feeding the doc_id score join ride broadcasts at this SF
    (sh, bc) shouldBe ((3, 3))
    w.max should be <= 2 // every documents scan stays column-pruned
    cg should be >= 2
  }
}
