package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event (micro-batch or stream — same schema either way). */
final case class EventRow(
    event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Per-user running aggregate carried in streaming state. */
final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

/** Structured Streaming forms of the event-analytics operators (the batch
  * twins are declared queries w01/w02; a live stream can't be hash-compared
  * against DuckDB, so these are covered by MemoryStream ScalaTests).
  *
  * Design for scale: every aggregation is keyed (state is partitioned by
  * group), watermarks bound state growth, and the transformations are the
  * same declarative groupBy/window plans Catalyst optimizes for batch.
  */
object EventStreams {

  /** Tumbling 1-hour counts with a watermark bounding late data & state. */
  def tumblingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Session windows (30-minute gap) per user with watermark. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))

  /** Custom keyed state via mapGroupsWithState: per-user running event count
    * and value total, updated per micro-batch.
    */
  def runningUserTotals(events: Dataset[EventRow]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          val (n, v) = rows.foldLeft((prev.n_events, prev.total_value)) {
            case ((cn, cv), r) => (cn + 1, cv + r.value)
          }
          val updated = UserRunning(userId, n, v)
          state.update(updated)
          updated
      }
  }

  /** Streaming exact dedup with bounded state: duplicates are dropped by
    * key among events whose times fall within the watermark delay of each
    * other; state for keys older than the watermark is evicted. The
    * streaming twin of d01 exact dedup, viable on an unbounded stream
    * precisely because the watermark bounds the key set held in state.
    */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** flatMapGroupsWithState sessionizer: accumulates per-user events in
    * state and EMITS a session row only when a gap larger than
    * `gapMinutes` is observed (zero-or-more outputs per invocation — the
    * shape mapGroupsWithState can't express).
    *
    * Robust to streaming realities:
    *   - out-of-order arrivals never move the session window backwards
    *     (start/end extend via min/max; a late event inside the current
    *     session merges into it rather than corrupting gap detection);
    *   - each user's FINAL session is flushed by an event-time timeout at
    *     lastTs + gap once the watermark passes it — without a timeout an
    *     open session would sit in state forever and never be emitted.
    */
  final case class SessionState(start: Long, lastTs: Long, n: Long)
  final case class ClosedSession(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  def closedSessions(events: Dataset[EventRow], gapMinutes: Int = 30,
      watermark: String = "2 hours"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastTs + gap with no new events: the session
            // is definitively closed (anything older would be dropped as
            // late anyway)
            val out = state.getOption
              .map(s => ClosedSession(userId, s.start, s.lastTs, s.n)).iterator
            state.remove()
            out
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            val closed = scala.collection.mutable.ListBuffer[ClosedSession]()
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs >= gapMs =>
                  closed += ClosedSession(userId, s.start, s.lastTs, s.n)
                  cur = Some(SessionState(t, t, 1))
                case Some(s) =>
                  cur = Some(SessionState(
                    math.min(s.start, t), math.max(s.lastTs, t), s.n + 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // must stay ahead of the current watermark or Spark rejects it
              state.setTimeoutTimestamp(
                math.max(s.lastTs + gapMs, state.getCurrentWatermarkMs + 1))
            }
            closed.iterator
          }
      }
  }

  /** One integer-cents purchase (t_us = event-time microseconds). */
  final case class PurchaseCents(event_id: Long, user_id: Long, t_us: Long, c: Long)

  /** One scored purchase (w14's row shape; see Windows.rollingZscoreFlags). */
  final case class AnomalyFlag(user_id: Long, event_id: Long, c: Long,
      base_sum: Long, base_sumsq: Long, is_anomaly: Long)

  /** The last ≤8 cents values per user, in event-time order — the whole
    * streaming state: eight longs, O(1) per key forever.
    */
  final case class CentsRing(cs: Seq[Long])

  /** Streaming rolling z-score anomaly flags — w14's st-twin: each
    * purchase scored against its user's trailing-8 baseline with the same
    * sqrt-free integer compare ((c·8 − Σc)² > 9·(8·Σc² − (Σc)²)), carried
    * across micro-batches in a BOUNDED ring-buffer state (eight longs per
    * user — the streaming-feature-store footprint, vs st05's grow-boundable
    * session buffers).
    *
    * Ordering contract: rows must arrive in per-user event-time order
    * ACROSS batches (within a batch they are sorted here) — the per-key
    * ordered-log ingest shape (e.g. a topic partitioned by user). The
    * declared query honors it by replaying a time-sliced backlog; an
    * out-of-order deployment needs a watermark-buffered reorder stage in
    * front, which is a different operator on purpose: reordering costs
    * state, and the O(1) ring is the point.
    */
  def rollingAnomalies(purchases: Dataset[PurchaseCents]): Dataset[AnomalyFlag] = {
    import purchases.sparkSession.implicits._
    purchases
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CentsRing, AnomalyFlag](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[PurchaseCents], state: GroupState[CentsRing]) =>
          val sorted = rows.toSeq.sortBy(r => (r.t_us, r.event_id))
          var ring = state.getOption.map(_.cs.toVector).getOrElse(Vector.empty[Long])
          val out = Seq.newBuilder[AnomalyFlag]
          sorted.foreach { e =>
            if (ring.length == 8) {
              val s0 = ring.sum
              val sq = ring.iterator.map(c => c * c).sum
              val lhs = e.c * 8 - s0
              val anom = if (lhs * lhs > 9L * (8L * sq - s0 * s0)) 1L else 0L
              out += AnomalyFlag(uid, e.event_id, e.c, s0, sq, anom)
            }
            ring = (ring :+ e.c).takeRight(8)
          }
          state.update(CentsRing(ring))
          out.result().iterator
      }
  }

  /** One closed SCD2 validity interval (w09's row shape minus the final
    * open interval — see [[scd2ClosedIntervals]]).
    */
  final case class Scd2Row(user_id: Long, event_type: String,
      valid_from_us: Long, valid_to_us: Long, n_events: Long)

  /** The open interval carried per user: current state value, its start,
    * and how many events confirmed it — three scalars, O(1) per key.
    */
  final case class Scd2State(event_type: String, valid_from_us: Long, n: Long)

  /** One typed event for the SCD2 stream (t_us = event-time microseconds). */
  final case class TypedEvent(event_id: Long, user_id: Long, t_us: Long,
      event_type: String)

  /** Streaming SCD2 history build — w09's st-twin: each user's event log
    * collapses into validity intervals of their event_type "state", with an
    * interval EMITTED exactly when it closes (the next change arrives; its
    * t_us is the closing interval's valid_to, which is precisely w09's
    * LEAD(valid_from)). The user's final, still-open interval stays in
    * state and is deliberately NOT emitted — the same contract as st05's
    * un-closed last session — so the drained output equals w09's batch
    * table restricted to `valid_to_us IS NOT NULL`, which is what the
    * shared oracle shape asserts.
    *
    * State is O(1) per key ([[Scd2State]]: value, start, count) — the
    * dimension-history footprint a 100 TB CDC pipeline carries per entity —
    * vs the batch form's two window passes over the full log. Ordering
    * contract as [[rollingAnomalies]]: per-user event-time order ACROSS
    * batches (the per-key ordered-log ingest shape; rows within a batch are
    * sorted here), honored by the declared query's time-sliced backlog.
    */
  def scd2ClosedIntervals(events: Dataset[TypedEvent]): Dataset[Scd2Row] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Row](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[TypedEvent], state: GroupState[Scd2State]) =>
          val sorted = rows.toSeq.sortBy(r => (r.t_us, r.event_id))
          val out = Seq.newBuilder[Scd2Row]
          var cur = state.getOption
          sorted.foreach { e =>
            cur match {
              case Some(s) if s.event_type == e.event_type =>
                cur = Some(s.copy(n = s.n + 1))
              case Some(s) =>
                out += Scd2Row(uid, s.event_type, s.valid_from_us, e.t_us, s.n)
                cur = Some(Scd2State(e.event_type, e.t_us, 1L))
              case None =>
                cur = Some(Scd2State(e.event_type, e.t_us, 1L))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  /** One decayed-sum feature row (w11's row shape). */
  final case class DecayedRow(event_id: Long, user_id: Long, t_us: Long,
      decayed_nanos: Long)

  /** Streaming truncated-EWMA decayed sum — w11's st-twin: for every
    * purchase, Σ_{k=0..7} cents_{i−k} · (10⁷/2ᵏ) in BIGINT nanos (the
    * exact integer weights of Windows.decayedSumNanos — 10⁷/2ᵏ is an exact
    * integer for k ≤ 7, so the emitted value is a pure 64-bit add/multiply
    * chain, bit-identical to the batch window's). State is the user's last
    * ≤ 7 cents values ([[CentsRing]] reused at capacity 7 — the previous
    * lags; the current row is weight 2⁰) — O(1) per key forever, the
    * recency-feature footprint a streaming feature store carries. Ordering
    * contract as [[rollingAnomalies]]: per-user event-time order across
    * batches, rows within a batch sorted here.
    */
  def decayedSums(purchases: Dataset[PurchaseCents]): Dataset[DecayedRow] = {
    import purchases.sparkSession.implicits._
    purchases
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CentsRing, DecayedRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[PurchaseCents], state: GroupState[CentsRing]) =>
          val sorted = rows.toSeq.sortBy(r => (r.t_us, r.event_id))
          // ring = previous cents, oldest..newest, ≤ 7 entries
          var ring = state.getOption.map(_.cs.toVector).getOrElse(Vector.empty[Long])
          val out = Seq.newBuilder[DecayedRow]
          sorted.foreach { e =>
            var acc = e.c * 10000000L
            var k = 1
            var i = ring.length - 1
            while (i >= 0 && k <= 7) {
              acc += ring(i) * (10000000L >> k) // 10^7/2^k, exact for k ≤ 7
              i -= 1; k += 1
            }
            out += DecayedRow(e.event_id, uid, e.t_us, acc)
            ring = (ring :+ e.c).takeRight(7)
          }
          state.update(CentsRing(ring))
          out.result().iterator
      }
  }

  /** One full-payload event row for the latest-per-key compaction. */
  final case class FullEvent(event_id: Long, user_id: Long, t_us: Long,
      event_type: String, value: Double)

  /** Streaming latest-record-per-key compaction — w07's st-twin (the CDC
    * current-state view, maintained incrementally instead of recomputed):
    * state per user is ONE row — the argmax under the (t_us, event_id)
    * total order — updated per micro-batch and emitted whenever it
    * changes (update-mode semantics). argmax under a total order is a
    * SEMILATTICE fold (the st08 cdcMergeStep argument), so the final
    * state is invariant to ANY micro-batch placement or arrival order —
    * no ordering contract needed, unlike the ring-state twins (st10/
    * st13). O(1) state per key forever.
    */
  def latestPerKey(events: Dataset[FullEvent]): Dataset[FullEvent] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[FullEvent, FullEvent](GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[FullEvent], state: GroupState[FullEvent]) =>
          val best = (state.getOption.iterator ++ rows)
            .maxBy(r => (r.t_us, r.event_id))
          state.update(best)
          best
      }
  }

  /** One arriving interval: [s, e] in epoch-ns (w15's construction). */
  final case class IntervalArrival(user_id: Long, event_id: Long, s: Long, e: Long)

  /** Per-user coverage state: the merged disjoint segments as flattened
    * [s₀,e₀,s₁,e₁,…] bounds (ascending, non-overlapping — the MINIMAL
    * sufficient statistic for interval union; a segment list never holds
    * more entries than arrived intervals and usually far fewer, since
    * overlaps collapse on arrival) plus the arrival count.
    */
  final case class CoverageState(bounds: Array[Long], n_intervals: Long)

  /** One coverage revision: the user's CURRENT w15 row after folding a
    * micro-batch. `n_intervals` strictly increases per revision, so the
    * drained log compacts to the final state by per-user argmax on it.
    */
  final case class CoverageRev(user_id: Long, n_intervals: Long,
      n_segments: Long, covered_ns: Long, longest_segment_ns: Long)

  /** Streaming per-key INTERVAL UNION (w15's st-twin — round-12
    * directive #5, probe-first): per-user state holds the merged
    * disjoint segment list, each micro-batch's arrivals sort-merge into
    * it (touching intervals merge, s ≤ segment-end — exactly w15's
    * strictly-greater new-segment rule), and one revision row per
    * (user, batch) carries the user's current coverage stats. Interval
    * union is an idempotent, commutative fold, so the final state is
    * batch-placement-invariant — st20 shares w15's oracle verbatim, and
    * the drained revision log compacts under per-user max(n_intervals)
    * (strictly monotone: every batch that touches a user adds ≥ 1
    * interval). The x14/x15-killer (chained stateful aggregates in one
    * streaming query) does not arise: this is ONE flatMapGroupsWithState
    * — the sorted per-key state lives INSIDE the state object, not in a
    * second stateful operator — and the compaction runs on the drained
    * batch table. At 100 TB: state is keyed by user in the state store,
    * O(live segments) per key; the per-batch merge is
    * O((segs + arrivals)·log arrivals).
    */
  def intervalCoverage(iv: Dataset[IntervalArrival]): Dataset[CoverageRev] = {
    import iv.sparkSession.implicits._
    iv.groupByKey(_.user_id)
      .flatMapGroupsWithState[CoverageState, CoverageRev](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[IntervalArrival], state: GroupState[CoverageState]) =>
          val add = rows.map(r => (r.s, r.e)).toArray
          if (add.isEmpty) Iterator.empty
          else {
            val prev = state.getOption.getOrElse(CoverageState(Array.empty, 0L))
            val oldSegs = prev.bounds.grouped(2).map(a => (a(0), a(1))).toArray
            val all = (oldSegs ++ add).sortBy(identity)
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
            for ((s, e) <- all) {
              if (out.nonEmpty && s <= out.last._2) {
                if (e > out.last._2) out(out.length - 1) = (out.last._1, e)
              } else out += ((s, e))
            }
            val n = prev.n_intervals + add.length
            state.update(CoverageState(
              out.iterator.flatMap(t => Iterator(t._1, t._2)).toArray, n))
            val spans = out.map(t => t._2 - t._1)
            Iterator.single(
              CoverageRev(uid, n, out.length.toLong, spans.sum, spans.max))
          }
      }
  }

  /** One arriving absolute residual, integer-valued in [0, domain). */
  final case class ResidualArrival(r: Long)

  /** One arriving keyed residual: `seg` is the monitor key ((model,
    * segment) in production, encoded to one long here). */
  final case class KeyedResidualArrival(seg: Long, r: Long)

  /** One keyed conformal revision — [[ConformalRev]] per monitor key. */
  final case class KeyedConformalRev(seg: Long, n_cal: Long, q_hat: Long)

  /** Conformal monitor state: the residual histogram (bounded domain)
    * plus the arrival count — the minimal sufficient statistic for any
    * exact order statistic over the stream so far.
    */
  final case class ConformalState(hist: Array[Long], n: Long)

  /** One conformal revision: the calibration count and split-conformal
    * half-width after folding a micro-batch. `n_cal` strictly increases
    * per revision, so the drained log compacts by max(n_cal).
    */
  final case class ConformalRev(n_cal: Long, q_hat: Long)

  /** Streaming SPLIT-CONFORMAL calibration (m18's st-twin): maintain the
    * ⌈(1−α)(n+1)⌉-th smallest absolute residual INCREMENTALLY as
    * calibration examples arrive — the serving-time form, where the
    * interval half-width q̂ is re-published as the calibration window
    * grows instead of refit by a batch job. State is m18's same trick
    * made stateful: residuals live on a BOUNDED integer domain, so the
    * exact order statistic needs only a histogram (O(domain) longs per
    * key — fixed, never per-arrival growth) folded commutatively; the
    * final state is therefore batch-placement-invariant and st21 shares
    * m18's oracle verbatim. One group here (a single global monitor);
    * the production (model, segment)-keyed form is
    * [[conformalQuantileByKey]] (st22) — same fold, state store scales
    * with keys, each O(domain). While n < k (too few
    * calibration points to certify 1−α coverage) the emitted q̂ is the
    * maximal representable residual — the bounded-domain stand-in for
    * conformal's +∞ — and out-of-domain residuals are refused loudly,
    * never clipped.
    */
  def conformalQuantile(rs: Dataset[ResidualArrival], domain: Int = 1001,
      alphaNum: Int = 9, alphaDen: Int = 10): Dataset[ConformalRev] = {
    import rs.sparkSession.implicits._
    rs.groupByKey(_ => 0)
      .flatMapGroupsWithState[ConformalState, ConformalRev](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_: Int, rows: Iterator[ResidualArrival], state: GroupState[ConformalState]) =>
          foldConformal(rows.map(_.r), state, domain, alphaNum, alphaDen)
            .map { case (n, q) => ConformalRev(n, q) }
      }
  }

  /** KEYED streaming split-conformal calibration — [[conformalQuantile]]
    * as the production (model, segment)-keyed monitor its own scaladoc
    * promised (round-13 directive: the keyed form was a prose claim; now
    * it's a parameter). One state entry per live `seg`, each the SAME
    * O(domain) histogram + count — the state store scales with keys and
    * nothing else, and the per-key fold is the shared [[foldConformal]],
    * so every per-key (n, q̂) stream is batch-placement-invariant exactly
    * as the global one (Round15OpsSpec pins it per key; st22's oracle is
    * m18's SQL grouped by segment). Keys hash-partition across the
    * cluster like any stateful agg — no key ever needs another key's
    * state, so 10⁶ monitors are 10⁶ independent histograms.
    */
  def conformalQuantileByKey(rs: Dataset[KeyedResidualArrival],
      domain: Int = 1001, alphaNum: Int = 9, alphaDen: Int = 10)
      : Dataset[KeyedConformalRev] = {
    import rs.sparkSession.implicits._
    rs.groupByKey(_.seg)
      .flatMapGroupsWithState[ConformalState, KeyedConformalRev](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (seg: Long, rows: Iterator[KeyedResidualArrival],
            state: GroupState[ConformalState]) =>
          foldConformal(rows.map(_.r), state, domain, alphaNum, alphaDen)
            .map { case (n, q) => KeyedConformalRev(seg, n, q) }
      }
  }

  /** The one conformal state fold both forms share: add a micro-batch of
    * residuals to the bounded-domain histogram, emit the revised
    * (n, q̂) — q̂ the ⌈(alphaNum/alphaDen)·(n+1)⌉-th smallest residual,
    * `domain − 1` (the bounded stand-in for conformal's +∞) while the
    * rank exceeds the mass. Commutative in arrival order by
    * construction: the histogram is a sum.
    */
  private def foldConformal(rs: Iterator[Long],
      state: GroupState[ConformalState], domain: Int, alphaNum: Int,
      alphaDen: Int): Iterator[(Long, Long)] = {
    val prev = state.getOption
      .getOrElse(ConformalState(new Array[Long](domain), 0L))
    val hist = prev.hist.clone()
    var added = 0L
    rs.foreach { r =>
      require(r >= 0 && r < domain,
        s"residual $r outside the declared domain [0, $domain)")
      hist(r.toInt) += 1L
      added += 1L
    }
    if (added == 0L) Iterator.empty
    else {
      val n = prev.n + added
      state.update(ConformalState(hist, n))
      // k = ⌈(alphaNum/alphaDen)·(n+1)⌉, the conformal rank
      val k = (alphaNum * (n + 1) + (alphaDen - 1)) / alphaDen
      var cum = 0L
      var q = domain - 1
      var i = 0
      var found = false
      while (i < domain && !found) {
        cum += hist(i)
        if (cum >= k) { q = i; found = true }
        i += 1
      }
      Iterator.single((n, q.toLong))
    }
  }

  /** Streaming output-mode helper for tests. */
  def completeMode: OutputMode = OutputMode.Complete()
  def updateMode: OutputMode = OutputMode.Update()
}
