package graft.operators

import graft.QSpec
import graft.analysis.Profile
import graft.features.{Derived, NullPolicy}
import graft.util.{Exact, ExactQuantiles, Tables}
import org.apache.spark.ml.feature.Bucketizer
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Composite (reference-defined) operators a01–a12 (SURVEY.md §2.9), built
  * from the feature/profile library so the declared queries exercise the
  * same code paths the real-estate pipeline uses.
  */
object Composite {

  import Tables._

  /** a01 — haversine distance to the Eiffel tower
    * (ref: src/features/feature_engineering.py:38-40,182-209). Lat/lon are
    * derived deterministically from the key since the testdata has none.
    */
  val a01 = QSpec(
    "a01_haversine",
    Some("""SELECT c_custkey, lat, lon,
           | ROUND(12742.0 * ASIN(SQRT(
           |   SIN(RADIANS(48.85837 - lat)/2) * SIN(RADIANS(48.85837 - lat)/2)
           |   + COS(RADIANS(lat)) * COS(RADIANS(48.85837))
           |     * SIN(RADIANS(2.294481 - lon)/2) * SIN(RADIANS(2.294481 - lon)/2)
           | )), 4) AS dist_eiffel_km
           |FROM (SELECT c_custkey,
           |        CAST((c_custkey * 7) % 180 AS DOUBLE) - 90 + 0.25 AS lat,
           |        CAST((c_custkey * 13) % 360 AS DOUBLE) - 180 + 0.5 AS lon
           |      FROM customer WHERE c_custkey % 7 = 0)
           |ORDER BY c_custkey""".stripMargin),
    (s, d) => customer(s, d)
      .filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"),
        (((col("c_custkey") * 7) % 180).cast("double") - 90 + 0.25).as("lat"),
        (((col("c_custkey") * 13) % 360).cast("double") - 180 + 0.5).as("lon"))
      .select(col("c_custkey"), col("lat"), col("lon"),
        round(Derived.haversineKm(col("lat"), col("lon"),
          lit(Derived.EiffelLat), lit(Derived.EiffelLon)), 4).as("dist_eiffel_km"))
      .orderBy("c_custkey"))

  /** a02 — outlier capping (winsorize at exact p01/p99; the library Capper
    * uses approxQuantile — exact percentiles here so the oracle can match;
    * ref: src/features/feature_engineering.py:152-180). The exact bounds
    * come from [[graft.util.ExactQuantiles]]'s value-frequency plan
    * (O(distinct prices) state), not Spark's buffer-every-row `percentile`
    * aggregate, so the declared plan holds at 100 TB.
    */
  val a02 = QSpec(
    "a02_capping",
    Some("""WITH b AS (SELECT quantile_cont(l_extendedprice, 0.01) AS lo,
           |                  quantile_cont(l_extendedprice, 0.99) AS hi
           |           FROM lineitem)
           |SELECT l_orderkey, l_linenumber,
           | ROUND(LEAST(GREATEST(l_extendedprice, lo), hi), 2) AS price_capped
           |FROM lineitem, b WHERE l_orderkey % 101 = 0
           |ORDER BY l_orderkey, l_linenumber""".stripMargin),
    (s, d) => {
      val li = lineitem(s, d)
      val b = ExactQuantiles.quantilesRow(li, "l_extendedprice",
        Seq("lo" -> 0.01, "hi" -> 0.99))
      li.filter(col("l_orderkey") % 101 === 0).crossJoin(b)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(least(greatest(col("l_extendedprice"), col("lo")), col("hi")), 2)
            .as("price_capped"))
        .orderBy("l_orderkey", "l_linenumber")
    })

  /** a03 — guarded log (ref: src/features/feature_engineering.py:129-148).
    * value−100 goes non-positive for most events, exercising the guard.
    */
  val a03 = QSpec(
    "a03_guarded_log",
    Some("""SELECT event_id,
           | ROUND(CASE WHEN (value - 100) IS NULL OR (value - 100) <= 0
           |            THEN 0.0 ELSE LN(value - 100) END, 6) AS log_shifted
           |FROM events WHERE event_id % 17 = 0 ORDER BY event_id""".stripMargin),
    (s, d) => events(s, d).filter(col("event_id") % 17 === 0)
      .select(col("event_id"),
        round(Derived.guardedLog(col("value") - 100), 6).as("log_shifted"))
      .orderBy("event_id"))

  /** a04 — guarded ratio (rooms_per_m2 analogue;
    * ref: src/features/feature_engineering.py:110-118).
    */
  val a04 = QSpec(
    "a04_ratio",
    Some("""SELECT l_orderkey, l_linenumber,
           | ROUND(CASE WHEN l_extendedprice IS NULL OR l_extendedprice <= 0 OR l_quantity IS NULL
           |            THEN 0.0 ELSE l_quantity / l_extendedprice END, 8) AS qty_per_price,
           | ROUND(CASE WHEN (l_discount - 0.05) IS NULL OR (l_discount - 0.05) <= 0 OR l_quantity IS NULL
           |            THEN 0.0 ELSE l_quantity / (l_discount - 0.05) END, 6) AS qty_per_disc
           |FROM lineitem WHERE l_orderkey % 101 = 0
           |ORDER BY l_orderkey, l_linenumber""".stripMargin),
    (s, d) => lineitem(s, d).filter(col("l_orderkey") % 101 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(Derived.guardedRatio(col("l_quantity"), col("l_extendedprice")), 8)
          .as("qty_per_price"),
        round(Derived.guardedRatio(col("l_quantity"), col("l_discount") - 0.05), 6)
          .as("qty_per_disc"))
      .orderBy("l_orderkey", "l_linenumber"))

  /** a05 — binary membership flag (is_house analogue;
    * ref: src/features/feature_engineering.py:121-126).
    */
  val a05 = QSpec(
    "a05_flag",
    Some("""SELECT CASE WHEN p_brand IN ('Brand#1', 'Brand#2') THEN 1 ELSE 0 END AS is_top_brand,
           | COUNT(*) AS cnt
           |FROM part GROUP BY 1 ORDER BY is_top_brand""".stripMargin),
    (s, d) => part(s, d)
      .select(Derived.binaryFlag(col("p_brand"), Seq("Brand#1", "Brand#2")).as("is_top_brand"))
      .groupBy("is_top_brand").agg(count(lit(1)).as("cnt"))
      .orderBy("is_top_brand"))

  /** a06 — strict/permissive null policy
    * (ref: src/features/feature_engineering.py:48-91).
    */
  val a06 = QSpec(
    "a06_null_policy",
    Some("""SELECT c_custkey,
           | COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS strict_acct,
           | COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'unknown') AS strict_seg,
           | COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, -1.0) AS perm_acct,
           | COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'N/A') AS perm_seg
           |FROM customer ORDER BY c_custkey""".stripMargin),
    (s, d) => {
      val acctN = when(col("c_acctbal") < 0, lit(null: java.lang.Double)).otherwise(col("c_acctbal"))
      val segN = when(col("c_mktsegment") === "MACHINERY", lit(null: String)).otherwise(col("c_mktsegment"))
      val base = customer(s, d)
        .withColumn("strict_acct", acctN).withColumn("strict_seg", segN)
        .withColumn("perm_acct", acctN).withColumn("perm_seg", segN)
      val strictDone = NullPolicy.strict(base, Seq("strict_acct"), Seq("strict_seg"))
      NullPolicy.permissive(strictDone, Map("perm_acct" -> -1.0), Map("perm_seg" -> "N/A"))
        .select("c_custkey", "strict_acct", "strict_seg", "perm_acct", "perm_seg")
        .orderBy("c_custkey")
    })

  /** a07 — target log-transform stats + Duan smearing factor
    * (ref: src/features/target_transformer.py:24-99). Single-pass agg.
    */
  val a07 = QSpec(
    "a07_target_transform",
    Some("""SELECT COUNT(*) AS n,
           | ROUND(AVG(lg), 6) AS mean_log,
           | ROUND(STDDEV_SAMP(lg), 6) AS std_log,
           | ROUND(EXP(VAR_SAMP(lg) / 2), 6) AS smearing
           |FROM (SELECT CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
           |                  THEN 0.0 ELSE LN(o_totalprice) END AS lg
           |      FROM orders WHERE o_orderkey % 10 = 0)""".stripMargin),
    (s, d) => orders(s, d).filter(col("o_orderkey") % 10 === 0)
      .select(Derived.guardedLog(col("o_totalprice")).as("lg"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("lg")), 6).as("mean_log"),
        round(stddev_samp(col("lg")), 6).as("std_log"),
        round(exp(var_samp(col("lg")) / 2), 6).as("smearing")))

  /** a08 — missing-value audit, single pass over all columns
    * (ref: notebooks/01_exploratory_data_analysis.py:73-91 — which runs one
    * job per column; this is one job total).
    */
  val a08 = QSpec(
    "a08_null_audit",
    Some("""SELECT COUNT(*) AS row_cnt,
           | CAST(SUM(CASE WHEN NULLIF(l_returnflag, 'N') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS rf_n_nulls,
           | CAST(SUM(CASE WHEN (CASE WHEN l_discount < 0.02 THEN NULL ELSE l_discount END) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS disc_n_nulls,
           | CAST(SUM(CASE WHEN NULLIF(l_linestatus, 'O') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ls_n_nulls
           |FROM lineitem""".stripMargin),
    (s, d) => {
      val withNulls = lineitem(s, d).select(
        when(col("l_returnflag") === "N", lit(null: String)).otherwise(col("l_returnflag")).as("rf_n"),
        when(col("l_discount") < 0.02, lit(null: java.lang.Double)).otherwise(col("l_discount")).as("disc_n"),
        when(col("l_linestatus") === "O", lit(null: String)).otherwise(col("l_linestatus")).as("ls_n"))
      Profile.nullAudit(withNulls, Seq("rf_n", "disc_n", "ls_n"))
    })

  /** a09 — outlier row filter via ML Bucketizer
    * (ref: notebooks/04_model_improvement.py:72-101). Splits are left-closed
    * [lo, hi) — the oracle mirrors that exactly.
    */
  val a09 = QSpec(
    "a09_bucket_outlier_filter",
    Some("""SELECT o_orderstatus, COUNT(*) AS cnt,
           | MIN(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)) AS min_price,
           | MAX(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)) AS max_price
           |FROM orders WHERE o_totalprice >= 50000 AND o_totalprice < 300000
           |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
    (s, d) => {
      val bucketizer = new Bucketizer()
        .setInputCol("o_totalprice").setOutputCol("price_bucket")
        .setSplits(Array(Double.NegativeInfinity, 50000.0, 300000.0, Double.PositiveInfinity))
      bucketizer.transform(orders(s, d))
        .filter(col("price_bucket") === 1.0)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          min(col("o_totalprice").cast(DecimalType(18, 2)).cast("double")).as("min_price"),
          max(col("o_totalprice").cast(DecimalType(18, 2)).cast("double")).as("max_price"))
        .orderBy("o_orderstatus")
    })

  /** a10 — join-integrity check (ref: notebooks/00_prepare_data.py:117-120). */
  val a10 = QSpec(
    "a10_join_integrity",
    Some("""SELECT (SELECT COUNT(*) FROM orders) AS orders_cnt,
           |       (SELECT COUNT(*) FROM customer) AS customer_cnt,
           |       (SELECT COUNT(*) FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey) AS joined_cnt""".stripMargin),
    (s, d) => {
      val o = orders(s, d)
      val c = customer(s, d)
      val joined = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      o.agg(count(lit(1)).as("orders_cnt"))
        .crossJoin(c.agg(count(lit(1)).as("customer_cnt")))
        .crossJoin(joined.agg(count(lit(1)).as("joined_cnt")))
    })

  /** a11 — category profiling (ref: notebooks/01_exploratory_data_analysis.py:138-175). */
  val a11 = QSpec(
    "a11_category_profile",
    Some(s"""SELECT c_mktsegment, COUNT(*) AS cnt,
            | ${Exact.sqlAvg("c_acctbal")} AS avg_c_acctbal,
            | MIN(c_acctbal) AS min_c_acctbal,
            | MAX(c_acctbal) AS max_c_acctbal
            |FROM customer GROUP BY c_mktsegment
            |ORDER BY cnt DESC, c_mktsegment""".stripMargin),
    (s, d) => Profile.categoryProfile(customer(s, d), "c_mktsegment", "c_acctbal"))

  /** a12 — error analysis, native (ref: notebooks/03_model_training.py:157-179). */
  val a12 = QSpec(
    "a12_error_analysis",
    Some("""SELECT COUNT(*) AS n,
           | ROUND(AVG(err_pct), 6) AS mean_err_pct,
           | ROUND(MIN(err_pct), 6) AS min_err_pct,
           | ROUND(MAX(err_pct), 6) AS max_err_pct
           |FROM (SELECT (pred - o_totalprice) / o_totalprice * 100 AS err_pct
           |      FROM (SELECT o_totalprice * 1.07 + 500 AS pred, o_totalprice FROM orders))""".stripMargin),
    (s, d) => Profile.errorAnalysis(
      orders(s, d).withColumn("pred", col("o_totalprice") * 1.07 + 500),
      "pred", "o_totalprice"))

  /** a13 — Pearson correlation matrix over lineitem numerics, one
    * distributed moment pass (the reference's pandas .corr():
    * notebooks/01_exploratory_data_analysis.py:253-254). The oracle spells
    * out the same exact-decimal moment formula — NOT DuckDB's streaming
    * corr() — so both engines evaluate the identical closed form.
    */
  val a13 = QSpec(
    "a13_corr_matrix",
    Some {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val pairs = for { (a, i) <- cols.zipWithIndex; b <- cols.drop(i + 1) } yield (a, b)
      val moments =
        ("COUNT(*) AS n" +:
          (cols.flatMap(c => Seq(
            s"CAST(SUM(CAST(CAST($c AS DOUBLE) AS DECIMAL(25, 6))) AS DOUBLE) AS s__$c",
            s"CAST(SUM(CAST(CAST($c AS DOUBLE) * CAST($c AS DOUBLE) AS DECIMAL(30, 6))) AS DOUBLE) AS s2__$c")) ++
            pairs.map { case (a, b) =>
              s"CAST(SUM(CAST(CAST($a AS DOUBLE) * CAST($b AS DOUBLE) AS DECIMAL(30, 6))) AS DOUBLE) AS sp__${a}__$b"
            })).mkString(",\n  ")
      val rows = pairs.map { case (a, b) =>
        s"""SELECT '$a' AS col_a, '$b' AS col_b,
           | ROUND((n * sp__${a}__$b - s__$a * s__$b)
           |   / SQRT((n * s2__$a - s__$a * s__$a) * (n * s2__$b - s__$b * s__$b)), 6) AS corr
           |FROM m""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"WITH m AS (SELECT\n  $moments\nFROM lineitem)\n$rows\nORDER BY col_a, col_b"
    },
    (s, d) => Profile.corrMatrix(lineitem(s, d),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .orderBy("col_a", "col_b"))

  /** a14 — PSI drift detection (population stability index): the standard
    * ML-ops check that a serving population still matches the training
    * one. Reference = even order keys at their real prices; "current" =
    * odd keys with a planted ×1.1 price shift (the d03/mm02 planted-data
    * trick — organic halves would be identically distributed and prove
    * nothing). Ten fixed 60k-wide bins with Laplace smoothing
    * ((cnt+0.5)/(n+5)) so empty bins stay finite; per-bin proportions and
    * PSI contributions are emitted rounded (total PSI = sum over the 10
    * emitted psi_term rows, left to the caller). Two
    * partial+final aggregates over a scan — no shuffle beyond 20 bin
    * groups at any corpus size.
    */
  val a14 = QSpec(
    "a14_psi_drift",
    Some("""WITH b AS (
           |  SELECT CASE WHEN o_orderkey % 2 = 0 THEN 0 ELSE 1 END AS side,
           |    LEAST(CAST(FLOOR((CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice
           |      ELSE o_totalprice * 1.1 END) / 60000) AS BIGINT), 9) AS bin
           |  FROM orders),
           |c AS (SELECT side, bin, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
           |n AS (SELECT side, SUM(cnt) AS n FROM c GROUP BY 1),
           |grid AS (SELECT s.side, g.bin
           |         FROM (VALUES (0), (1)) s(side), UNNEST(range(0, 10)) g(bin)),
           |p AS (SELECT grid.side, grid.bin,
           |        (COALESCE(c.cnt, 0) + 0.5) / (n.n + 5.0) AS prop
           |      FROM grid
           |      LEFT JOIN c ON c.side = grid.side AND c.bin = grid.bin
           |      JOIN n ON n.side = grid.side)
           |SELECT r.bin, ROUND(r.prop, 6) AS p_ref, ROUND(cu.prop, 6) AS p_cur,
           |  ROUND((r.prop - cu.prop) * LN(r.prop / cu.prop), 6) AS psi_term
           |FROM p r JOIN p cu ON r.bin = cu.bin AND r.side = 0 AND cu.side = 1
           |ORDER BY r.bin""".stripMargin),
    (s, d) => {
      val o = orders(s, d)
      val side = when(col("o_orderkey") % 2 === 0, 0).otherwise(1)
      val price = when(col("o_orderkey") % 2 === 0, col("o_totalprice"))
        .otherwise(col("o_totalprice") * 1.1)
      // ONE scan: both sides' histograms come from conditional sums in a
      // single partial+final aggregate (a filter-per-side formulation
      // duplicates the whole scan subtree — verified in the plan)
      val counts = o.select(side.as("side"),
          least(floor(price / 60000).cast("long"), lit(9L)).as("bin"))
        .groupBy("bin")
        .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("cnt_ref"),
          sum(when(col("side") === 1, 1L).otherwise(0L)).as("cnt_cur"))
      // totals via an unpartitioned window over the ≤10-row counts frame:
      // reusing `counts` in a second aggregate would re-plan (and re-scan)
      // the whole subtree; the window keeps the plan at ONE fact scan
      val all = org.apache.spark.sql.expressions.Window
        .partitionBy().rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      val withTotals = s.range(0, 10).select(col("id").as("bin"))
        .join(counts, Seq("bin"), "left")
        .select(col("bin"),
          coalesce(col("cnt_ref"), lit(0L)).as("cnt_ref"),
          coalesce(col("cnt_cur"), lit(0L)).as("cnt_cur"))
        .withColumn("n_ref", sum(col("cnt_ref")).over(all))
        .withColumn("n_cur", sum(col("cnt_cur")).over(all))
      val pRef = (col("cnt_ref") + 0.5) / (col("n_ref") + 5.0)
      val pCur = (col("cnt_cur") + 0.5) / (col("n_cur") + 5.0)
      withTotals
        .select(col("bin"), round(pRef, 6).as("p_ref"),
          round(pCur, 6).as("p_cur"),
          round((pRef - pCur) * log(pRef / pCur), 6).as("psi_term"))
        .orderBy("bin")
    })

  /** a15 — leave-one-out TARGET ENCODING
    * ([[graft.analysis.Profile.looTargetEncoding]]): the standard
    * leakage-safe categorical feature for tree/linear models — each
    * row's segment replaced by the mean target over the OTHER rows of
    * its segment, (S − y)/(n − 1), so a row's own label never flows
    * into its own feature (the reference one-hots its low-cardinality
    * categories — notebooks/02_feature_engineering.py — but its
    * city/postal columns are exactly where production swaps in target
    * encoding). Exact decimal sums, one IEEE-deterministic terminal
    * division, round-6; plan is a tiny category aggregate
    * broadcast-joined back onto the scan — no window, no per-category
    * task skew at any scale.
    */
  val a15 = QSpec(
    "a15_target_encoding",
    Some("""WITH st AS (SELECT c_mktsegment,
           |    SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s, COUNT(*) AS n
           |  FROM customer GROUP BY 1)
           |SELECT c_custkey, c.c_mktsegment,
           |  CASE WHEN n > 1 THEN
           |    ROUND(CAST(s - CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) / (n - 1), 6)
           |  END AS loo_enc
           |FROM customer c JOIN st USING (c_mktsegment)
           |ORDER BY c_custkey""".stripMargin),
    (s, d) => Profile.looTargetEncoding(
        customer(s, d).select("c_custkey", "c_mktsegment", "c_acctbal"),
        "c_mktsegment", "c_acctbal")
      .select("c_custkey", "c_mktsegment", "loo_enc")
      .orderBy("c_custkey"))

  val specs: Seq[QSpec] = Seq(a01, a02, a03, a04, a05, a06, a07, a08, a09, a10,
    a11, a12, a13, a14, a15)
}
