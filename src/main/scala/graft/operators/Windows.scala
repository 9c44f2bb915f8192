package graft.operators

import graft.QSpec
import graft.util.{Exact, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Windowed / analytic operators (SURVEY §2.5 gap + the events-table
  * extensions): tumbling and session event-time windows, ranking and
  * analytic window functions. Batch forms here; the Structured Streaming
  * forms live in graft.streaming and are covered by tests (a stream can't
  * be a declared query).
  *
  * `events.ts` arrives as long nanos (Tables.normalizeEventTs adapts
  * whatever encoding the generator shipped); queries convert explicitly
  * with integer division before windowing.
  */
object Windows {

  import Tables._

  private def tsMicros = timestamp_micros(expr("ts div 1000"))

  /** w01 — tumbling 1-hour event-time window: count + exact sum per
    * (window, event_type). Epoch-aligned, so date_trunc is the SQL twin.
    */
  val w01 = QSpec(
    "w01_tumbling_window",
    Some(s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
            | event_type, COUNT(*) AS cnt,
            | CAST(SUM(CAST(value AS DECIMAL(18, 6))) AS DOUBLE) AS sum_value
            |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    (s, d) => events(s, d).withColumn("ts_us", tsMicros)
      .groupBy(window(col("ts_us"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), Exact.dsum(col("value"), 6).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("cnt"), col("sum_value"))
      .orderBy("hour_start", "event_type"))

  /** w02 — session window (30-minute gap) per user. The SQL twin is the
    * classic gaps-and-islands construction with the same >= gap boundary
    * rule Spark uses (a session spans [start, last+gap)).
    */
  val w02 = QSpec(
    "w02_session_window",
    Some("""WITH e AS (
           |  SELECT user_id, ts,
           |    CASE WHEN LAG(ts) OVER w IS NULL
           |              OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
           |         THEN 1 ELSE 0 END AS new_s
           |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
           |), s AS (
           |  SELECT user_id, ts,
           |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
           |                     ROWS UNBOUNDED PRECEDING) AS sid
           |  FROM e)
           |SELECT user_id,
           |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           |  COUNT(*) AS n_events
           |FROM s GROUP BY user_id, sid
           |ORDER BY user_id, session_start""".stripMargin),
    (s, d) => events(s, d).withColumn("ts_us", tsMicros)
      .groupBy(col("user_id"), session_window(col("ts_us"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"))
      .orderBy("user_id", "session_start"))

  /** w03 — ranking window functions: row_number / rank / dense_rank /
    * ntile over a deterministic total order per partition.
    */
  val w03 = QSpec(
    "w03_ranking_windows",
    Some("""SELECT * FROM (
           |  SELECT c_mktsegment, c_custkey, c_acctbal,
           |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           |    CAST(RANK() OVER w AS BIGINT) AS rnk,
           |    CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           |    CAST(NTILE(4) OVER w AS BIGINT) AS quartile
           |  FROM customer
           |  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
           |) WHERE rn <= 5 ORDER BY c_mktsegment, rn""".stripMargin),
    (s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      customer(s, d).select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        row_number().over(w).cast("long").as("rn"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"))
        .filter(col("rn") <= 5)
        .orderBy("c_mktsegment", "rn")
    })

  /** w04 — analytic window functions: lag/lead + rows-frame moving sum
    * (exact decimal arithmetic inside the frame).
    */
  val w04 = QSpec(
    "w04_analytic_windows",
    Some("""SELECT o_custkey, o_orderkey,
           |  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS od,
           |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_2dp,
           |  LAG(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 1) OVER w AS prev_price,
           |  LEAD(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 1) OVER w AS next_price,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
           |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum3
           |FROM orders WHERE o_custkey % 100 = 0
           |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
           |ORDER BY o_custkey, o_orderkey""".stripMargin),
    (s, d) => {
      val price2 = col("o_totalprice").cast(DecimalType(18, 2)).cast("double")
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      orders(s, d).filter(col("o_custkey") % 100 === 0)
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate").cast("date"), "yyyy-MM-dd").as("od"),
          price2.as("price_2dp"),
          lag(price2, 1).over(w).as("prev_price"),
          lead(price2, 1).over(w).as("next_price"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .over(w.rowsBetween(-2, 0)).cast("double").as("moving_sum3"))
        .orderBy("o_custkey", "o_orderkey")
    })

  /** w05 — sliding (hopping) 2-hour window, 30-minute slide: each event
    * lands in exactly 4 overlapping windows (Spark expands via Expand —
    * the declarative form of the per-event window fanout). Both engines'
    * window grids are epoch-aligned on the 30-minute boundary, so the SQL
    * twin enumerates the same 4 window starts per event from its
    * time_bucket.
    */
  val w05 = QSpec(
    "w05_sliding_window",
    Some("""WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS t, value FROM events),
           |w AS (SELECT t, value,
           |        time_bucket(INTERVAL '30 minutes', t) - (k * INTERVAL '30 minutes') AS wstart
           |      FROM e, UNNEST(range(0, 4)) AS x(k))
           |SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
           | COUNT(*) AS cnt,
           | CAST(SUM(CAST(value AS DECIMAL(18, 6))) AS DOUBLE) AS sum_value
           |FROM w GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => events(s, d).withColumn("ts_us", tsMicros)
      .groupBy(window(col("ts_us"), "2 hours", "30 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"), Exact.dsum(col("value"), 6).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("cnt"), col("sum_value"))
      .orderBy("window_start"))

  /** w07 — latest-record-per-key compaction (the CDC/upsert pattern every
    * lakehouse pipeline runs: reduce an event log to each key's current
    * state). One shuffle on the key + per-partition sort; the total order
    * (µs-tick ts desc, event_id desc) makes the winner unique and both
    * engines deterministic. At scale this is the same exchange as a
    * groupBy — no global sort, no driver involvement.
    */
  val w07 = QSpec(
    "w07_latest_per_key",
    Some("""WITH r AS (SELECT user_id, event_id, event_type, value,
           |    ROW_NUMBER() OVER (PARTITION BY user_id
           |                       ORDER BY ts DESC, event_id DESC) AS rn
           |  FROM events)
           |SELECT user_id, event_id AS last_event_id,
           |  event_type AS last_event_type, value AS last_value
           |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin),
    (s, d) => {
      // µs-tick ordering (the j06 precision rule): DuckDB truncates the ns
      // timestamps to µs on read, so ordering by raw ns could flip which
      // row wins rn=1 on a same-user same-µs collision; event_id DESC then
      // makes the order total in both engines
      val w = Window.partitionBy("user_id")
        .orderBy(expr("ts div 1000").desc, col("event_id").desc)
      events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"),
          col("value").as("last_value"))
        .orderBy("user_id")
    })

  /** w08 — running DISTINCT count per key (distinct event types seen so
    * far per user at each event). `COUNT(DISTINCT) OVER` with a running
    * frame isn't directly supported by either engine, so it's computed
    * the portable scalable way: a first-occurrence flag (row_number = 1
    * within (user, type)) summed over the cumulative per-user frame.
    * Two window passes; both partition primarily by user_id, so the
    * second exchange only coarsens the first (AQE sees ~|users| keys
    * either way). Ordering uses µs-tick ts with event_id as the
    * total-order tie-break, same rule as w07.
    */
  val w08 = QSpec(
    "w08_running_distinct",
    Some("""WITH f AS (
           |  SELECT user_id, event_id, ts,
           |    CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
           |                                 ORDER BY ts, event_id) = 1
           |         THEN 1 ELSE 0 END AS first_seen
           |  FROM events)
           |SELECT user_id, event_id,
           |  CAST(SUM(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS distinct_types_so_far
           |FROM f ORDER BY user_id, event_id""".stripMargin),
    (s, d) => {
      // µs-tick ordering in both windows (j06 rule): a same-µs ns-order
      // disagreement with the event_id order would attach running counts
      // to different rows per engine, not just reorder equal contributions
      val firstW = Window.partitionBy("user_id", "event_type")
        .orderBy(expr("ts div 1000"), col("event_id"))
      val cumW = Window.partitionBy("user_id")
        .orderBy(expr("ts div 1000"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .withColumn("first_seen",
          when(row_number().over(firstW) === 1, 1).otherwise(0))
        .select(col("user_id"), col("event_id"),
          sum(col("first_seen")).over(cumW).cast("long")
            .as("distinct_types_so_far"))
        .orderBy("user_id", "event_id")
    })

  /** w09 — SCD2 history build (slowly-changing-dimension type 2): collapse
    * each user's event log into validity intervals of their event_type
    * "state" — consecutive identical states merge into one interval,
    * `valid_to` is the next interval's start (NULL while current). The
    * lakehouse dimension-history pattern: gaps-and-islands (lag → change
    * flag → cumulative island id) + per-island min/lead, all over ONE
    * partitioning key, integer/timestamp arithmetic only. Total order is
    * (raw ns ts, event_id), the w06/w07 rule.
    */
  val w09 = QSpec(
    "w09_scd2_intervals",
    Some("""WITH e AS (
           |  SELECT user_id, event_id, event_type, ts,
           |    CASE WHEN LAG(event_type) OVER w IS NULL
           |              OR event_type <> LAG(event_type) OVER w
           |         THEN 1 ELSE 0 END AS chg
           |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
           |), i AS (
           |  SELECT user_id, event_type, ts,
           |    SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |                   ROWS UNBOUNDED PRECEDING) AS island
           |  FROM e
           |), g AS (
           |  SELECT user_id, island, event_type,
           |    MIN(epoch_us(ts)) AS valid_from_us,
           |    CAST(COUNT(*) AS BIGINT) AS n_events
           |  FROM i GROUP BY 1, 2, 3
           |)
           |SELECT user_id, event_type, valid_from_us,
           |  LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY island)
           |    AS valid_to_us,
           |  n_events
           |FROM g ORDER BY user_id, valid_from_us""".stripMargin),
    (s, d) => {
      // µs-tick ordering (j06 rule): island assignment via lag() must see
      // the same row order as the µs-truncated oracle
      val byTs = Window.partitionBy("user_id")
        .orderBy(expr("ts div 1000"), col("event_id"))
      val cum = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val byIsland = Window.partitionBy("user_id").orderBy("island")
      events(s, d)
        .withColumn("chg",
          when(lag(col("event_type"), 1).over(byTs).isNull ||
            col("event_type") =!= lag(col("event_type"), 1).over(byTs), 1)
            .otherwise(0))
        .withColumn("island", sum(col("chg")).over(cum))
        .groupBy("user_id", "island", "event_type")
        .agg(min(expr("ts div 1000")).as("valid_from_us"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"), col("event_type"), col("valid_from_us"),
          lead(col("valid_from_us"), 1).over(byIsland).as("valid_to_us"),
          col("n_events"))
        .orderBy("user_id", "valid_from_us")
    })

  /** w10 — CDC changelog apply (upsert + delete): a base snapshot (each
    * user's latest state before the cutoff) has a changelog (events at or
    * after the cutoff, every 17th marked as a DELETE) applied to produce
    * the new snapshot — the MERGE INTO every lakehouse table runs on each
    * ingest cycle, expressed engine-agnostically: union snapshot +
    * changelog, keep the latest row per key ((ts, event_id) total order),
    * drop keys whose final row is a delete. One shuffle on the key, same
    * exchange as w07's compaction; changelog rows always post-date base
    * rows by construction, so "latest wins" is the apply rule.
    */
  val w10 = QSpec(
    "w10_cdc_apply",
    Some("""WITH u AS (
           |  SELECT user_id, event_id, event_type, value, ts,
           |    CASE WHEN ts >= TIMESTAMP '2024-01-08' AND event_id % 17 = 0
           |         THEN 'D' ELSE 'U' END AS op
           |  FROM events
           |), r AS (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
           |                               ORDER BY ts DESC, event_id DESC) AS rn
           |  FROM u)
           |SELECT user_id, event_id AS state_event_id,
           |  event_type AS state_type, value AS state_value
           |FROM r WHERE rn = 1 AND op = 'U' ORDER BY user_id""".stripMargin),
    (s, d) => {
      val cutoffNs = 1704672000000000000L // 2024-01-08T00:00:00Z in epoch ns
      val ev = events(s, d)
      // materialized as two frames (snapshot | changelog) exactly like a
      // real apply cycle, then merged through one latest-per-key pass
      val base = ev.filter(col("ts") < cutoffNs)
        .withColumn("op", lit("U"))
      val changelog = ev.filter(col("ts") >= cutoffNs)
        .withColumn("op",
          when(col("event_id") % 17 === 0, "D").otherwise("U"))
      // rn ordering at µs ticks (the j06 precision rule, same fix as w07):
      // raw-ns ordering could flip which state row survives rn=1 on a
      // same-user same-µs collision; event_id DESC makes the order total
      val w = Window.partitionBy("user_id")
        .orderBy(expr("ts div 1000").desc, col("event_id").desc)
      base.unionByName(changelog)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("op") === "U")
        .select(col("user_id"), col("event_id").as("state_event_id"),
          col("event_type").as("state_type"), col("value").as("state_value"))
        .orderBy("user_id")
    })

  /** w11 — time-decayed per-key feature (truncated EWMA): for every
    * purchase, Σ_{k=0..7} value_{i−k} · 2^{−k} over the user's last 8
    * purchases in event-time order — the standard recency-weighted
    * feature a ranking/fraud pipeline derives from an activity stream.
    *
    * Exactness is pure 64-bit INTEGER arithmetic end to end: `value` is
    * quantized ONCE to integer cents (via DECIMAL(18,2), the repo's
    * proven double→decimal recipe), and since 10⁷ = 2⁷·5⁷, each term
    * value·2^−k in nanos is cents·(10⁷/2ᵏ) with 10⁷/2ᵏ an exact integer
    * for every k ≤ 7 — so the emitted `decayed_nanos = decayed_value·10⁹` is a
    * BIGINT add/multiply chain with NO decimal-typing surface at all.
    * (The first cut emitted DECIMAL(30,9); rows matched everywhere but
    * the driver's DuckDB resolved the oracle's intermediate decimal
    * widths differently from local DuckDB 1.0.0 and the hash flipped —
    * decimal width inference is engine-version volatile, 64-bit integer
    * + and · are not. Headroom: exact for |value| ≤ ~9·10⁸ currency
    * units, vastly above any event amount.)
    * Ordering is total at µs ticks with event_id tiebreak (the j06
    * precision rule). One partitioned window = one shuffle on user_id;
    * the frame is ROWS-bounded (8), so state per key is O(1).
    */
  val w11 = QSpec(
    "w11_decayed_sum",
    Some("""WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t_us,
           |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
           |  FROM events WHERE event_type = 'purchase'),
           |l AS (SELECT event_id, user_id, t_us, c,
           |    LAG(c, 1) OVER w AS c1, LAG(c, 2) OVER w AS c2,
           |    LAG(c, 3) OVER w AS c3, LAG(c, 4) OVER w AS c4,
           |    LAG(c, 5) OVER w AS c5, LAG(c, 6) OVER w AS c6,
           |    LAG(c, 7) OVER w AS c7
           |  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id))
           |SELECT event_id, user_id, t_us,
           |  CAST(c * 10000000 + COALESCE(c1, 0) * 5000000
           |    + COALESCE(c2, 0) * 2500000 + COALESCE(c3, 0) * 1250000
           |    + COALESCE(c4, 0) * 625000 + COALESCE(c5, 0) * 312500
           |    + COALESCE(c6, 0) * 156250 + COALESCE(c7, 0) * 78125
           |    AS BIGINT) AS decayed_nanos
           |FROM l ORDER BY event_id""".stripMargin),
    (s, d) => {
      val p = events(s, d).filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("t_us"),
          (col("value").cast(DecimalType(18, 2)) * lit(100)).cast("long").as("c"))
      val w = Window.partitionBy("user_id").orderBy(col("t_us"), col("event_id"))
      p.withColumn("decayed_nanos", decayedSumNanos(col("c"), w))
        .select("event_id", "user_id", "t_us", "decayed_nanos")
        .orderBy("event_id")
    })

  /** The w11 decayed-sum column in BIGINT nanos: Σ_{k=0..7}
    * lag_k(cents) · (10⁷ / 2ᵏ) over `w` — exact 64-bit integers only
    * (see w11's doc). Factored out so the math is fixture-testable
    * independent of the events table. `cCol` must be integer cents.
    */
  private[graft] def decayedSumNanos(cCol: org.apache.spark.sql.Column,
      w: org.apache.spark.sql.expressions.WindowSpec): org.apache.spark.sql.Column =
    (0 until 8).map { k =>
      val ck = if (k == 0) cCol else coalesce(lag(cCol, k).over(w), lit(0L))
      ck * lit(10000000L / (1L << k)) // 10^7/2^k, exact integer for k <= 7
    }.reduce(_ + _).cast("long")

  /** w12 — time-weighted average value per user (TWAP — the standard
    * duration-weighted feature over an irregular event stream: each
    * purchase's value "holds" until the user's next purchase; the mean
    * weights each value by how long it held, so bursts of cheap events
    * can't drown a long-held large value the way a plain avg does).
    *
    * Exactness is the w11 recipe extended to weighted means: values
    * quantize once to integer cents, durations are integer µs (LEAD
    * over the total (t_us, event_id) order), so numerator Σ c·Δt and
    * denominator Σ Δt are exact BIGINT sums — with a VERIFIED headroom
    * bound (the w14 discipline, round-11 advice): per user,
    * Σ c·Δt ≤ max(c)·Σ Δt ≤ max(c)·stream_span, measured
    * 47 639 cents · 2.59e12 µs ≈ 1.2e17 on the shipped corpus, 75× under
    * 2⁶³ (Round12OpsSpec pins ≥ 10×; a corpus outside it — values ≳ 10⁶
    * currency units held ≳ a decade — needs DECIMAL(38,0) sums or ms
    * durations instead). twap_cents is one
    * floor division of positives — `div` here ≡ DuckDB `//` (the
    * documented positive-operands contract). Both raw sums are emitted
    * alongside the quotient, so downstream re-aggregation (e.g. a
    * cross-user TWAP) stays exact instead of averaging averages.
    * Same-timestamp purchases get Δt = 0 (weightless, still counted);
    * users whose entire stream shares one timestamp have Σ Δt = 0 and
    * are dropped by the HAVING guard on BOTH sides — no division by
    * zero, no engine-specific NULL/error divergence. One user-partition
    * window + one group-by = the same single user_id shuffle as w11
    * (AQE-coalesced); per-row state is O(1).
    */
  val w12 = QSpec(
    "w12_twap",
    Some("""WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t_us,
           |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
           |  FROM events WHERE event_type = 'purchase'),
           |l AS (SELECT user_id, c,
           |    LEAD(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
           |      - t_us AS dur_us
           |  FROM p)
           |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_intervals,
           |  CAST(SUM(dur_us) AS BIGINT) AS dur_us,
           |  CAST(SUM(c * dur_us) AS BIGINT) AS vdur_cent_us,
           |  CAST(SUM(c * dur_us) // SUM(dur_us) AS BIGINT) AS twap_cents
           |FROM l WHERE dur_us IS NOT NULL
           |GROUP BY user_id HAVING SUM(dur_us) > 0
           |ORDER BY user_id""".stripMargin),
    (s, d) => twapPerUser(
      events(s, d).filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("t_us"),
          (col("value").cast(DecimalType(18, 2)) * lit(100)).cast("long").as("c"))))

  /** w13 — OHLC bars (open/high/low/close + count/volume) per user per
    * hour: the canonical downsampling of an irregular value stream into
    * fixed time buckets (finance bars, metric rollups, feature-store
    * hourly aggregates). Open/close are the FIRST/LAST values under the
    * total (t_us, event_id) order — computed as two row_number windows
    * over the SAME (user_id, hour) partitioning, which the final groupBy
    * then reuses: the whole query rides ONE hash exchange plus the
    * output sort, and every emitted value is an exact BIGINT (integer
    * cents; no first()/last() nondeterminism anywhere).
    */
  val w13 = QSpec(
    "w13_ohlc",
    Some("""WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t_us,
           |    epoch_us(ts) // 3600000000 AS hour,
           |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
           |  FROM events WHERE event_type = 'purchase'),
           |r AS (SELECT user_id, hour, c,
           |    ROW_NUMBER() OVER (PARTITION BY user_id, hour
           |                       ORDER BY t_us, event_id) AS rna,
           |    ROW_NUMBER() OVER (PARTITION BY user_id, hour
           |                       ORDER BY t_us DESC, event_id DESC) AS rnd
           |  FROM p)
           |SELECT user_id, CAST(hour AS BIGINT) AS hour,
           |  CAST(MAX(CASE WHEN rna = 1 THEN c END) AS BIGINT) AS open_cents,
           |  CAST(MAX(c) AS BIGINT) AS high_cents,
           |  CAST(MIN(c) AS BIGINT) AS low_cents,
           |  CAST(MAX(CASE WHEN rnd = 1 THEN c END) AS BIGINT) AS close_cents,
           |  CAST(COUNT(*) AS BIGINT) AS n_trades,
           |  CAST(SUM(c) AS BIGINT) AS vol_cents
           |FROM r GROUP BY user_id, hour ORDER BY user_id, hour""".stripMargin),
    (s, d) => ohlcBars(
      events(s, d).filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("t_us"),
          (col("value").cast(DecimalType(18, 2)) * lit(100)).cast("long").as("c"))))

  /** The w13 OHLC aggregate over a (event_id, user_id, t_us, c) frame —
    * factored out for fixture tests (`c` = integer cents).
    */
  private[operators] def ohlcBars(p: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val withHour = p.withColumn("hour", expr("t_us div 3600000000"))
    val wAsc = Window.partitionBy("user_id", "hour")
      .orderBy(col("t_us"), col("event_id"))
    val wDesc = Window.partitionBy("user_id", "hour")
      .orderBy(col("t_us").desc, col("event_id").desc)
    withHour
      .withColumn("rna", row_number().over(wAsc))
      .withColumn("rnd", row_number().over(wDesc))
      .groupBy("user_id", "hour")
      .agg(max(when(col("rna") === 1, col("c"))).as("open_cents"),
        max(col("c")).as("high_cents"),
        min(col("c")).as("low_cents"),
        max(when(col("rnd") === 1, col("c"))).as("close_cents"),
        count(lit(1)).as("n_trades"),
        sum(col("c")).as("vol_cents"))
      .orderBy("user_id", "hour")
  }

  /** The w12 TWAP aggregate over a (event_id, user_id, t_us, c) frame —
    * factored out so the math is fixture-testable independent of the
    * events table (`c` = integer cents; see w12's doc for exactness).
    */
  private[operators] def twapPerUser(p: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("t_us"), col("event_id"))
    p.withColumn("dur_us", lead(col("t_us"), 1).over(w) - col("t_us"))
      .filter(col("dur_us").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dur_us")).as("dur_us"),
        sum(col("c") * col("dur_us")).as("vdur_cent_us"),
        expr("sum(c * dur_us) div sum(dur_us)").as("twap_cents"))
      .filter(col("dur_us") > 0)
      .orderBy("user_id")
  }

  /** The retired DECIMAL(30,9) form of [[decayedSumNanos]] — kept ONLY so
    * Round10OpsSpec can assert nanos ≡ decimal·10⁹ on real data (the
    * migration-safety pin); no query emits it anymore.
    */
  private[operators] def decayedSum(vCol: org.apache.spark.sql.Column,
      w: org.apache.spark.sql.expressions.WindowSpec): org.apache.spark.sql.Column = {
    val zero = lit(new java.math.BigDecimal("0.00"))
    (0 until 8).map { k =>
      val vk = if (k == 0) vCol else coalesce(lag(vCol, k).over(w), zero)
      vk * lit(new java.math.BigDecimal(
        java.math.BigDecimal.ONE.divide(java.math.BigDecimal.valueOf(1L << k)).toPlainString))
    }.reduce(_ + _).cast(DecimalType(30, 9))
  }

  /** w14 — rolling z-score anomaly flag: each purchase scored against its
    * user's trailing-8 baseline (ROWS BETWEEN 8 PRECEDING AND 1
    * PRECEDING under the total (t_us, event_id) order), flagged when
    * |c − mean| > 3σ — the per-key outlier primitive of metric
    * monitoring and fraud screens. The K·σ compare is done WITHOUT
    * sqrt, division, or any float: |c − μ| > Kσ over an n-row frame is
    * equivalent to (c·n − Σc)² > K²·(n·Σc² − (Σc)²), which is pure
    * BIGINT on integer cents (worst case here ≈ 6·10¹¹, five orders of
    * magnitude inside 2⁶³), so the flag set is bit-deterministic on
    * both engines by construction. A zero-variance baseline flags ANY
    * deviation — the division-free form handles σ = 0 naturally.
    * Scale: one user-partitioned window exchange, O(1) frame state per
    * row; emitted baseline sums let downstream re-scoring with a
    * different K avoid recomputation.
    */
  val w14 = QSpec(
    "w14_rolling_zscore",
    Some("""WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t_us,
           |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
           |  FROM events WHERE event_type = 'purchase'),
           |w AS (SELECT user_id, event_id, c,
           |    COUNT(*) OVER win AS n,
           |    SUM(c) OVER win AS s,
           |    SUM(c*c) OVER win AS sq
           |  FROM p
           |  WINDOW win AS (PARTITION BY user_id ORDER BY t_us, event_id
           |                 ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING))
           |SELECT user_id, event_id, c, CAST(s AS BIGINT) AS base_sum,
           |  CAST(sq AS BIGINT) AS base_sumsq,
           |  CAST(CASE WHEN (c*8 - s)*(c*8 - s) > 9*(8*sq - s*s)
           |       THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
           |FROM w WHERE n = 8 ORDER BY user_id, event_id""".stripMargin),
    (s, d) => rollingZscoreFlags(
      events(s, d).filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("t_us"),
          (col("value").cast(DecimalType(18, 2)) * lit(100)).cast("long").as("c"))))

  /** The w14 scorer over a (event_id, user_id, t_us, c) frame — factored
    * out for fixture tests (`c` = integer cents; K = 3, baseline = the
    * 8 preceding rows, rows with a short baseline are not scored).
    */
  private[operators] def rollingZscoreFlags(p: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val win = Window.partitionBy("user_id").orderBy(col("t_us"), col("event_id"))
      .rowsBetween(-8, -1)
    p.withColumn("n", count(lit(1)).over(win))
      .withColumn("base_sum", sum(col("c")).over(win))
      .withColumn("base_sumsq", sum(col("c") * col("c")).over(win))
      .filter(col("n") === 8)
      .select(col("user_id"), col("event_id"), col("c"),
        col("base_sum"), col("base_sumsq"),
        when((col("c") * 8 - col("base_sum")) * (col("c") * 8 - col("base_sum"))
            > lit(9L) * (lit(8L) * col("base_sumsq") - col("base_sum") * col("base_sum")),
          1L).otherwise(0L).as("is_anomaly"))
      .orderBy("user_id", "event_id")
  }

  /** w15 — per-key INTERVAL UNION (coverage): merge each user's
    * overlapping event intervals into maximal segments and report total
    * covered time — the machine-uptime / sensor-coverage analytic, and
    * the EXTENT twin of w02's session windows (sessions merge POINT
    * events within a gap; this merges intervals that can nest and
    * swallow later-starting shorter ones, which gap logic gets wrong).
    * Interval = [ts, ts + dur] with dur = ((event_id mod 5)+1)·30 min in
    * ns — pure BIGINT end to end (the w11 discipline, no timestamp types
    * cross the engines; headroom: max ts ~1.5e18 + 9e12 ≪ 2⁶³). The
    * classic two-window pass, everything partitioned BY USER so
    * parallelism scales with keys: running max(end) over strictly
    * preceding rows in (ts, event_id) order — the tie key makes the
    * order total, so both engines flag the identical segment starts —
    * marks rows starting past every earlier reach as new segments; a
    * running sum of those flags numbers the segments; a segment's
    * covered span is max(end) − min(ts), exact because chained overlaps
    * make the union contiguous. Oracle replays the identical windows.
    */
  val w15 = QSpec(
    "w15_interval_union",
    Some("""WITH iv AS (SELECT user_id, event_id,
           |    epoch_us(ts) * 1000 AS s,
           |    epoch_us(ts) * 1000 + ((event_id % 5) + 1) * 1800000000000 AS e
           |  FROM events),
           |w AS (SELECT *, MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
           |      FROM iv),
           |f AS (SELECT *, CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS isnew FROM w),
           |g AS (SELECT *, SUM(isnew) OVER (PARTITION BY user_id ORDER BY s, event_id
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg FROM f),
           |segs AS (SELECT user_id, seg, MIN(s) AS seg_s, MAX(e) AS seg_e,
           |         COUNT(*) AS n_iv FROM g GROUP BY 1, 2)
           |SELECT user_id, CAST(SUM(n_iv) AS BIGINT) AS n_intervals,
           |  CAST(COUNT(*) AS BIGINT) AS n_segments,
           |  CAST(SUM(seg_e - seg_s) AS BIGINT) AS covered_ns,
           |  CAST(MAX(seg_e - seg_s) AS BIGINT) AS longest_segment_ns
           |FROM segs GROUP BY user_id ORDER BY user_id""".stripMargin),
    (s, d) => {
      val iv = events(s, d).select(col("user_id"), col("event_id"),
        col("ts").as("s"),
        (col("ts") + (col("event_id") % 5 + 1) * 1800000000000L).as("e"))
      val byUser = Window.partitionBy("user_id").orderBy(col("s"), col("event_id"))
      val seg = iv
        .withColumn("pmax", max("e").over(
          byUser.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("isnew",
          when(col("pmax").isNull || col("s") > col("pmax"), 1).otherwise(0))
        .withColumn("seg", sum("isnew").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "seg")
        .agg(min("s").as("seg_s"), max("e").as("seg_e"),
          count(lit(1)).as("n_iv"))
      seg.groupBy("user_id")
        .agg(sum("n_iv").as("n_intervals"),
          count(lit(1)).as("n_segments"),
          sum(col("seg_e") - col("seg_s")).as("covered_ns"),
          max(col("seg_e") - col("seg_s")).as("longest_segment_ns"))
        .orderBy("user_id")
    })

  val specs: Seq[QSpec] = Seq(w01, w02, w03, w04, w05, w07, w08, w09, w10,
    w11, w12, w13, w14, w15)
}
