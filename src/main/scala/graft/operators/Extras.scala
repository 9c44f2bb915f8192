package graft.operators

import graft.QSpec
import graft.util.{Exact, Tables}
import org.apache.spark.sql.functions._

/** Generic query capability beyond the reference's own surface (SURVEY §2.7
  * records "no set operations" — exposed anyway since the engine is a
  * general library): set ops, rollup grouping, HLL sketches, and the
  * tokenize→explode word-count pipeline over documents.
  */
object Extras {

  import Tables._

  /** u01 — UNION / INTERSECT / EXCEPT (distinct set semantics). */
  val u01 = QSpec(
    "u01_set_ops",
    Some("""SELECT DISTINCT c_custkey FROM (
           |  ((SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
           |   INTERSECT
           |   (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'))
           |  EXCEPT
           |  (SELECT c_custkey FROM customer WHERE c_custkey % 10 = 0)
           |  UNION
           |  (SELECT c_custkey FROM customer WHERE c_custkey <= 3)
           |) ORDER BY c_custkey""".stripMargin),
    (s, d) => {
      val cust = customer(s, d)
      val a = cust.filter(col("c_acctbal") > 5000).select("c_custkey")
      val b = cust.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val c = cust.filter(col("c_custkey") % 10 === 0).select("c_custkey")
      val dd = cust.filter(col("c_custkey") <= 3).select("c_custkey")
      a.intersect(b).except(c).union(dd).distinct().orderBy("c_custkey")
    })

  /** x01 — ROLLUP grouping sets with grouping_id. */
  val x01 = QSpec(
    "x01_rollup",
    Some(s"""SELECT o_orderpriority, o_orderstatus,
            | CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
            | COUNT(*) AS cnt,
            | ${Exact.sqlSum("o_totalprice")} AS sum_price
            |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
            |ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin),
    (s, d) => orders(s, d)
      .rollup("o_orderpriority", "o_orderstatus")
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("cnt"),
        Exact.dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("gid"), col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first))

  /** x03 — CUBE grouping sets: all four grouping combinations (full,
    * by-priority, by-status, grand total) in one Expand pass — the
    * dashboard-style companion to x01's ROLLUP hierarchy.
    */
  val x03 = QSpec(
    "x03_cube",
    Some(s"""SELECT o_orderpriority, o_orderstatus,
            | CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
            | COUNT(*) AS cnt,
            | ${Exact.sqlSum("o_totalprice")} AS sum_price
            |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
            |ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin),
    (s, d) => orders(s, d)
      .cube("o_orderpriority", "o_orderstatus")
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("cnt"),
        Exact.dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("gid"), col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first))

  /** x04 — salted join through the correctness gate: the skew lever
    * (util/Skew.saltedJoin — large side salted deterministically, small
    * side replicated per salt) must be ROW-IDENTICAL to the plain join,
    * so the oracle is the unsalted SQL join + aggregate. This is the
    * declared-query proof that turning the skew dial never changes
    * results, only the shuffle distribution (SkewSpec asserts the plan
    * side: n-way key spreading).
    */
  val x04 = QSpec(
    "x04_salted_join",
    Some(s"""SELECT o_orderpriority, COUNT(*) AS cnt,
            | ${Exact.sqlSum("l_extendedprice")} AS sum_price
            |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            |GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val l = lineitem(s, d).select("l_orderkey", "l_linenumber", "l_extendedprice")
      val o = orders(s, d)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.util.Skew.saltedJoin(l, o, "l_orderkey", "l_linenumber", 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          Exact.dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("o_orderpriority")
    })

  /** x02 — HLL sketch with a tolerance oracle: the sketches differ per
    * engine, so the comparable output is the exact distinct count plus a
    * boolean asserting the engine's own HLL estimate lands within 5 %
    * relative error of it. Hash equality then proves both engines' sketches
    * met the bound on the same data — a real accuracy check, not rows-only.
    */
  val x02 = QSpec(
    "x02_approx_distinct",
    Some("""SELECT exact_distinct,
           |  ABS(approx_distinct - exact_distinct) <= 0.05 * exact_distinct AS hll_within_5pct
           |FROM (SELECT COUNT(DISTINCT o_custkey) AS exact_distinct,
           |             approx_count_distinct(o_custkey) AS approx_distinct
           |      FROM orders)""".stripMargin),
    (s, d) => {
      val o = orders(s, d)
      // ONE scan, dedup-then-aggregate, NOT one agg mixing a distinct and
      // a non-distinct aggregate (that forces an Expand: row duplication +
      // no partial agg for the sketch — measured 4.8 s vs 1.5 s at sf0.1)
      // and NOT the earlier two-separate-plans crossJoin (that scanned
      // orders twice). The distinct keys are computed with map-side
      // partial aggregation, then count + sketch run as PLAIN aggregates
      // over them: count(distinct keys) ≡ countDistinct, and the HLL
      // register state is duplicate-insensitive (max-merged rho per
      // register), so the estimate is bit-identical to the sketch over
      // the raw rows.
      // rsd 0.01 (vs the 0.05 default): the declared bound is 5× the
      // sketch's standard error, not a coin flip on a 1-σ excursion
      o.select(col("o_custkey")).distinct()
        .agg(count(col("o_custkey")).as("exact_distinct"),
          approx_count_distinct(col("o_custkey"), 0.01).as("approx_distinct"))
        .select(col("exact_distinct"),
          (abs(col("approx_distinct") - col("exact_distinct")) <=
            lit(0.05) * col("exact_distinct")).as("hll_within_5pct"))
    })

  /** t05 — tokenize → explode → word counts over documents.text (top 50). */
  val t05 = QSpec(
    "t05_word_counts",
    Some("""SELECT word, COUNT(*) AS cnt FROM (
           |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
           |  FROM documents)
           |GROUP BY word ORDER BY cnt DESC, word LIMIT 50""".stripMargin),
    (s, d) => documents(s, d)
      .select(explode(filter(split(col("text"), " "), t => t =!= "")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(50))

  /** x09 — Count-Min Sketch heavy-hitter estimation (the second sketch
    * family next to x02's HLL): one distributed `count_min_sketch`
    * aggregate over all corpus words (fixed seed → deterministic), probed
    * for a mix of frequent / mid / rare / absent words. CMS guarantees
    * est ≥ exact always and est ≤ exact + ε·N with high probability —
    * with the fixed seed both bounds are deterministic on this data, so
    * they are declared as booleans, with the EXACT counts recomputed
    * independently by DuckDB. The sketch itself is the 100 TB story: a
    * fixed ~KB-scale summary of any number of rows, mergeable map-side.
    */
  val x09 = QSpec(
    "x09_count_min",
    Some("""WITH w AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
           |        FROM documents),
           |c AS (SELECT word, COUNT(*) AS cnt FROM w GROUP BY word)
           |SELECT p.word, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS exact_cnt,
           |  TRUE AS est_ge_exact, TRUE AS est_within_eps
           |FROM (VALUES ('the'), ('table'), ('spark'), ('zebra')) p(word)
           |LEFT JOIN c ON c.word = p.word
           |ORDER BY p.word""".stripMargin),
    (s, d) => {
      import s.implicits._
      val probes = Seq("the", "table", "spark", "zebra")
      val words = documents(s, d)
        .select(explode(filter(split(col("text"), " "), t => t =!= "")).as("word"))
      // total N and the sketch come from ONE aggregation pass — a second
      // full scan just to count would double the corpus reads at scale
      val aggRow = words
        .selectExpr("count(1) AS n",
          "count_min_sketch(word, CAST(0.0001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42) AS s")
        .head
      val total = aggRow.getAs[Long]("n")
      val bytes = aggRow.getAs[Array[Byte]]("s")
      val cms = org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(bytes))
      val exact = words.filter(col("word").isin(probes: _*))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .as[(String, Long)].collect().toMap
      val epsSlack = math.ceil(1e-4 * total).toLong
      probes.map { w =>
        val ex = exact.getOrElse(w, 0L)
        val est = cms.estimateCount(w)
        (w, ex, est >= ex, est <= ex + epsSlack)
      }.toDF("word", "exact_cnt", "est_ge_exact", "est_within_eps")
        .orderBy("word")
    })

  /** u02 — BAG-semantics set operations (INTERSECT ALL / EXCEPT ALL):
    * u01's distinct-set twins keep multiplicities — the semantics SQL
    * auditing queries actually need ("how many duplicate rows survive").
    * Spark plans these as aggregate+generate over a count column (no
    * row-by-row anti-semantics), same partial-agg scale shape as a
    * groupBy. Output is the raw multiset, hash-compared after sort.
    */
  val u02 = QSpec(
    "u02_multiset_ops",
    Some("""SELECT seg FROM (
           |  (SELECT c_mktsegment AS seg FROM customer WHERE c_acctbal > 3000)
           |  INTERSECT ALL
           |  (SELECT c_mktsegment AS seg FROM customer WHERE c_custkey % 3 = 0)
           |) ORDER BY seg""".stripMargin),
    (s, d) => {
      val cust = customer(s, d)
      val a = cust.filter(col("c_acctbal") > 3000)
        .select(col("c_mktsegment").as("seg"))
      val b = cust.filter(col("c_custkey") % 3 === 0)
        .select(col("c_mktsegment").as("seg"))
      a.intersectAll(b).orderBy("seg")
    })

  /** x10 — Bloom-filter join pruning (runtime semi-join filter): the big
    * fact side is pre-filtered by a Bloom filter built from the qualifying
    * dimension keys BEFORE the shuffle, then exactly joined — false
    * positives are removed by the join itself, so the result is
    * row-identical to the plain join (the oracle). This is the shape
    * Spark's own InjectRuntimeFilter produces for large joins (it doesn't
    * trigger at toy scan sizes, hence the explicit form): at 100 TB a
    * selective dimension predicate prunes ~(1−sel) of fact-side shuffle
    * bytes for the cost of one broadcast O(KB–MB) bitmap. The filter is
    * broadcast once, not closure-shipped per task.
    */
  val x10 = QSpec(
    "x10_bloom_join",
    Some(s"""SELECT l.l_returnflag, COUNT(*) AS cnt,
            | ${Exact.sqlSum("l_extendedprice")} AS sum_price
            |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            |WHERE o.o_orderpriority = '1-URGENT'
            |GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      // cache the qualifying dim keys: sizing count, bloom build, and the
      // join build side all read the SAME materialized projection, so the
      // dimension parquet is scanned exactly once per run (it used to be
      // three scans — count, stat.bloomFilter, join). At 100 TB pinning
      // the filtered dim keys is standard runtime-filter practice.
      val urgent = orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
        .cache()
      // fpp 1% → ~9.6 bits/key.
      val nKeys = math.max(urgent.count(), 1L) // materializes the cache
      val bloom = urgent.stat.bloomFilter("o_orderkey", nKeys, 0.01)
      val bloomBc = s.sparkContext.broadcast(bloom)
      val out = lineitem(s, d)
        .select("l_orderkey", "l_returnflag", "l_extendedprice")
        // prunes pre-shuffle via the native codegen'd probe — a ScalaUDF
        // here would break whole-stage codegen on the fact scan
        .filter(graft.functions.BloomMightContainLong(bloomBc, col("l_orderkey")))
        .join(urgent, col("l_orderkey") === col("o_orderkey")) // exact
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"),
          Exact.dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("l_returnflag")
      // the operator's whole point is a codegen-friendly fact-side filter:
      // assert nothing smuggled a Scala UDF back into the plan
      require(!out.queryExecution.analyzed.exists(_.expressions.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ScalaUDF]))),
        "x10 fact-side filter must not contain a ScalaUDF")
      out
    })

  /** x11 — bucketed co-located join THROUGH the correctness gate: both
    * sides are written `bucketBy(8, key)` + sorted ([[graft.sources.Sinks]]),
    * then joined with a MERGE hint — Catalyst plans a sort-merge join with
    * ZERO Exchange (the `require` asserts it on the physical plan), because
    * matching bucket layouts already co-locate equal keys. This is the
    * write-side scale lever: at 100 TB a recurring join on a bucketed key
    * pays its shuffle once at layout time, not per query. The hint forces
    * SMJ so the demonstration doesn't degrade to a broadcast at toy scale;
    * result is row-identical to the plain join (the oracle).
    */
  val x11 = QSpec(
    "x11_bucketed_join",
    Some(s"""SELECT c_mktsegment, COUNT(*) AS cnt,
            | ${Exact.sqlSum("o_totalprice")} AS sum_price
            |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            |GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val tag = new java.io.File(d).getName.replace('.', '_')
      val (to, tc) = (s"graft_x11_orders_$tag", s"graft_x11_customer_$tag")
      def save(df: org.apache.spark.sql.DataFrame, table: String): Unit =
        df.write.mode("overwrite")
          .option("path", Tables.scratch(d, table))
          .bucketBy(8, "k").sortBy("k")
          .saveAsTable(table)
      save(orders(s, d).select(col("o_custkey").as("k"), col("o_totalprice")), to)
      save(customer(s, d).select(col("c_custkey").as("k"), col("c_mktsegment")), tc)
      val joined = s.table(to).hint("merge").join(s.table(tc), "k")
      // the whole point: co-located buckets -> no shuffle for the join
      // (pre-AQE physical plan; the aggregate below adds its own exchange)
      require(!joined.queryExecution.sparkPlan.toString.contains("Exchange"),
        "bucketed join must plan without an Exchange")
      joined.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"),
          Exact.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("c_mktsegment")
    })

  /** x12 — GROUPED HLL distinct counts (distinct customers per priority
    * class): the per-segment cardinality dashboard query that exact
    * countDistinct can't serve at 100 TB (its Expand+dedup shuffles every
    * distinct pair). Same split-plan rule as x02 — the exact and sketch
    * aggregates run as SEPARATE plans joined on the group key, because
    * mixing a distinct and a sketch aggregate in one agg forces an Expand
    * that defeats the sketch's partial aggregation. Oracle pins the exact
    * counts and the per-group 5 % bound (5× the rsd-0.01 standard error).
    */
  val x12 = QSpec(
    "x12_grouped_hll",
    Some("""SELECT o_orderpriority,
           |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct,
           |  TRUE AS hll_within_5pct
           |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      // NB the x02-style dedup-then-aggregate single-scan form was
      // measured HERE and rejected: identical output and one less scan,
      // but the grouped dedup must exchange by (priority, custkey) and
      // the count+sketch re-exchange by priority — locally AQE coalesces
      // the dedup read to ~1 partition and serializes it (1.14 s → 1.33 s
      // at sf0.1). countDistinct's own plan dedups map-side AND exchanges
      // by the GROUP key only, so the final count needs no second
      // exchange; the sketch branch's exchange carries only fixed-width
      // register buffers. See OPTIMIZATION_r18.md.
      val o = orders(s, d)
      val exact = o.groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("exact_distinct"))
      val approx = o.groupBy("o_orderpriority")
        .agg(approx_count_distinct(col("o_custkey"), 0.01).as("ad"))
      exact.join(approx, "o_orderpriority")
        .select(col("o_orderpriority"), col("exact_distinct"),
          (abs(col("ad") - col("exact_distinct")) <=
            lit(0.05) * col("exact_distinct")).as("hll_within_5pct"))
        .orderBy("o_orderpriority")
    })

  /** x14 — SLIDING-window approximate distinct counts (distinct active
    * users per 3-hour window hopping hourly): the rolling-cardinality
    * dashboard query, and the sliding twin of x12's grouped HLL. The
    * fanout is BOUNDED BY CONSTRUCTION: each event belongs to exactly 3
    * hourly-hopped 3-hour windows, so the explode is a fixed ×3 — never
    * a range join, never a window over the event log — and everything
    * after it is x12's machinery (map-side partial HLL per window key).
    * Same split-plan rule as x02/x12: the exact and sketch aggregates
    * run as SEPARATE plans joined on the window key, because mixing a
    * distinct and a sketch aggregate in one agg forces an Expand that
    * defeats the sketch's partial aggregation. Window key = epoch-hour
    * BIGINT of the window start (the repo's long-ns ts contract; no
    * timestamp types cross the engines). Oracle pins the exact
    * per-window counts and the 5 % bound (5× the rsd-0.01 standard
    * error; window cardinalities are 13+ at sf0.01 where the sketch's
    * sparse mode is exact, and grow linearly — measured 722 windows,
    * 117–411 distinct at sf0.1).
    */
  val x14 = QSpec(
    "x14_sliding_window_distinct",
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) // 3600000000 AS h
           |        FROM events),
           |x AS (SELECT user_id, h - o AS win_h
           |      FROM e, UNNEST(range(0, 3)) t(o)),
           |w AS (SELECT win_h,
           |        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
           |      FROM x GROUP BY win_h)
           |SELECT win_h, exact_distinct, TRUE AS hll_within_5pct
           |FROM w ORDER BY win_h""".stripMargin),
    (s, d) => {
      // NB the single-scan dedup-then-aggregate form was measured HERE
      // and rejected (same reasoning as x12, worse locally: 1.30 s →
      // 2.09 s at sf0.1 — the ×3-exploded dedup exchange AQE-coalesces to
      // ~1 partition and serializes). countDistinct's plan dedups
      // map-side and exchanges by win_h only. See OPTIMIZATION_r18.md.
      val x = events(s, d)
        .select(col("user_id"),
          expr("(ts div 1000) div 3600000000").as("h"))
        .select(col("user_id"),
          explode(sequence(col("h") - 2, col("h"))).as("win_h"))
      val exact = x.groupBy("win_h")
        .agg(countDistinct(col("user_id")).as("exact_distinct"))
      val approx = x.groupBy("win_h")
        .agg(approx_count_distinct(col("user_id"), 0.01).as("ad"))
      exact.join(approx, "win_h")
        .select(col("win_h"), col("exact_distinct"),
          (abs(col("ad") - col("exact_distinct")) <=
            lit(0.05) * col("exact_distinct")).as("hll_within_5pct"))
        .orderBy("win_h")
    })

  /** x15 — top-k HEAVY HITTERS per sliding window (the "top accounts per
    * rolling 3-hour window" feed — x14 told you HOW MANY distinct users
    * a window saw; this names the busiest ones). x14's bounded ×3
    * hop-explode supplies the window spine — each event lands in exactly
    * 3 hourly-hopped 3-hour windows, never a range join — then
    * per-(window, user) counts aggregate with map-side partials and a
    * per-window row_number keeps k = 3, ties broken by user_id (the
    * output is deterministic by construction, not by luck). The rank
    * shuffle is keyed by the WINDOW (722 windows at sf0.1, growing with
    * the time span), so parallelism scales with data, and the rank's
    * input is the (window, user) COUNT table — the aggregate, not the
    * event log. The oracle replays the identical spine + rank.
    */
  val x15 = QSpec(
    "x15_window_heavy_hitters",
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) // 3600000000 AS h
           |        FROM events),
           |x AS (SELECT user_id, h - o AS win_h
           |      FROM e, UNNEST(range(0, 3)) t(o)),
           |c AS (SELECT win_h, user_id, CAST(COUNT(*) AS BIGINT) AS n_events
           |      FROM x GROUP BY 1, 2),
           |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY win_h
           |        ORDER BY n_events DESC, user_id ASC) AS rk FROM c)
           |SELECT win_h, user_id, n_events, CAST(rk AS INT) AS rk
           |FROM r WHERE rk <= 3 ORDER BY win_h, rk""".stripMargin),
    (s, d) => {
      val counts = events(s, d)
        .select(col("user_id"),
          expr("(ts div 1000) div 3600000000").as("h"))
        .select(col("user_id"),
          explode(sequence(col("h") - 2, col("h"))).as("win_h"))
        .groupBy("win_h", "user_id")
        .agg(count(lit(1)).as("n_events"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("win_h").orderBy(col("n_events").desc, col("user_id"))
      counts.withColumn("rk", row_number().over(w).cast("int"))
        .filter(col("rk") <= 3)
        .orderBy("win_h", "rk")
    })

  /** x16 — grouped WEIGHTED median (round-12 directive #3): per part,
    * the quantity-weighted median line price — "the price at which half
    * the UNITS of this part moved", the inventory/ads analytic where
    * every row counts `weight` times. Probe-first overlap check against
    * x08/x13 (the standing rule): x08 is the UNWEIGHTED interpolated
    * quantile of one value per row and x13 its sketch form — neither
    * admits per-row integer weights, and no Spark/DuckDB built-in does;
    * this is the exact cumulative-weight construction instead (lower
    * weighted median: smallest v with 2·W(≤v) ≥ W_total), all BIGINT
    * weights (l_quantity is integral 1–50 by construction — cast-exact
    * in both engines, no DuckDB round-vs-Spark-truncate hazard), and the
    * median is an actual data value, never an interpolation — no
    * float arithmetic to round-guard. Plan shape: one shuffle on
    * l_partkey; both windows (cumulative RANGE sum and the group total)
    * share that single exchange, and parallelism scales with PARTS
    * (2 000 at sf0.01, growing linearly), never with the 5-value
    * priority domain that makes exact x08 a scale tail — at 30 rows per
    * group the per-group sort is constant work, so this stays linear
    * where x08's per-group distinct-value table grows.
    */
  val x16 = QSpec(
    "x16_grouped_weighted_median",
    Some("""WITH b AS (SELECT l_partkey, l_extendedprice AS price,
           |        CAST(l_quantity AS BIGINT) AS wgt FROM lineitem),
           |c AS (SELECT *,
           |        SUM(wgt) OVER (PARTITION BY l_partkey ORDER BY price
           |          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
           |        SUM(wgt) OVER (PARTITION BY l_partkey) AS tw
           |      FROM b)
           |SELECT l_partkey,
           |  MIN(CASE WHEN 2 * cw >= tw THEN price END) AS wmedian_price,
           |  CAST(MAX(tw) AS BIGINT) AS total_qty,
           |  CAST(COUNT(*) AS BIGINT) AS n_lines
           |FROM c GROUP BY l_partkey ORDER BY l_partkey""".stripMargin),
    (s, d) => weightedMedianByKey(
      lineitem(s, d)
        .select(col("l_partkey"), col("l_extendedprice").as("price"),
          col("l_quantity").cast("long").as("wgt")),
      "l_partkey", "price", "wgt")
      .withColumnsRenamed(Map("wmedian" -> "wmedian_price",
        "total_w" -> "total_qty", "n_rows" -> "n_lines"))
      .orderBy("l_partkey"))

  /** x16's core over any (key, value, integer weight) frame: lower
    * weighted median — smallest value v with 2·W(≤ v) ≥ W_total — via a
    * cumulative RANGE window (ties on the value accumulate together in
    * both engines) and the group-total window sharing ONE exchange on
    * the key with the final aggregate. Output: (key, wmedian, total_w,
    * n_rows).
    */
  private[graft] def weightedMedianByKey(df: org.apache.spark.sql.DataFrame,
      keyCol: String, valCol: String, wgtCol: String)
      : org.apache.spark.sql.DataFrame = {
    val byVal = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(valCol)
      .rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val whole = org.apache.spark.sql.expressions.Window.partitionBy(keyCol)
    df
      .withColumn("cw", sum(wgtCol).over(byVal))
      .withColumn("tw", sum(wgtCol).over(whole))
      .groupBy(keyCol)
      .agg(min(when(col("cw") * 2 >= col("tw"), col(valCol))).as("wmedian"),
        max("tw").as("total_w"),
        count(lit(1)).as("n_rows"))
  }

  val specs: Seq[QSpec] = Seq(u01, u02, x01, x02, x03, x04, t05, x09, x10,
    x11, x12, x14, x15, x16)
}
