package graft.joins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Joins Spark lacks as primitives, built as compositions of the operators
  * it executes well — the brief's preference order (a): compose existing
  * ops before reaching for a custom SparkPlan.
  */
object TemporalJoins {

  /** Shared merge-pattern scaffolding for [[asofJoin]] / [[asofJoinNearest]]:
    * the tagged union of both sides (side 1 = left/probe, side 0 =
    * right/build — right sorts first at ts ties) with the right payload
    * carried as one `__graft_p` struct, plus that struct's type (for the
    * null cast on left rows).
    */
  private def taggedAsofUnion(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      valCols: Seq[String]): (DataFrame, StructType) = {
    val leftCols = left.columns
    val payload = struct(col(tsCol).as("asof_ts") +: valCols.map(col): _*)
    val payloadT = StructType(
      StructField("asof_ts", right.schema(tsCol).dataType) +:
        valCols.map(c => right.schema(c)))
    val rTagged = right.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("__side"),
        payload.as("__graft_p")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("__side"),
        lit(null).cast(payloadT).as("__graft_p")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col): _*)
    (rTagged.unionByName(lTagged), payloadT)
  }

  /** As-of join: for every left row, the single most recent right row with
    * `right.ts <= left.ts` on the same key (the kdb+ `aj` / pandas
    * `merge_asof` semantics, left-outer).
    *
    * Implementation is the distributed MERGE pattern, not a range join:
    * union both sides tagged, shuffle ONCE on the key, sort each partition
    * by (ts, side) — right rows sort before left at equal ts, making the
    * match inclusive — and carry the latest right payload forward with
    * `last(_, ignoreNulls)` over the running frame. Cost is one shuffle +
    * one sort, identical to a groupBy on the key; no N×M candidate
    * explosion, no broadcast requirement on either side — this survives
    * 100 TB on both inputs as long as single keys fit a partition's sort
    * spill (and skewed keys can be salted upstream like any other join).
    *
    * Row atomicity: `asof_ts` and every value column travel as ONE struct
    * through the carry-forward, so the output payload always comes from
    * the single matched right row — a NULL value column in the latest
    * right row stays NULL instead of being resurrected from an older row
    * (the kdb `aj` / `merge_asof` / DuckDB ASOF JOIN contract; carrying
    * columns independently with `last(ignoreNulls)` would break it).
    *
    * `left`/`right` must expose `keyCol` and long-typed `tsCol`; right
    * payload columns are the remaining `valCols`. Returns every left row +
    * `asof_ts` (nullable) + the right `valCols` (nullable). If the right
    * side has duplicate (key, ts) rows, the greatest (ts, valCols…) tuple
    * wins — a documented, deterministic tie rule (kdb `aj` resolves the
    * same case by table order, which a distributed frame doesn't have).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val (tagged, _) = taggedAsofUnion(left, right, keyCol, tsCol, valCols)
    // Tie-break among DUPLICATE (key, ts) right rows: without a final sort
    // key, `last(payload)` would pick whichever right row the partition
    // sort happened to place last — nondeterministic across runs. Ordering
    // by the payload struct itself makes the winner the greatest
    // (asof_ts, valCols…) tuple, deterministically (left rows carry a null
    // payload, which last(ignoreNulls) skips, so their relative order at a
    // tied ts is irrelevant).
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("__side"), col("__graft_p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = tagged
      .withColumn("__graft_p", last(col("__graft_p"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        (col("__graft_p").getField("asof_ts").as("asof_ts") +:
          valCols.map(c => col("__graft_p").getField(c).as(c))): _*)
  }

  /** Point-in-interval range join via band bucketing: `points.pCol` joined
    * to every interval with `lo <= p < hi`. Spark plans a raw inequality
    * join as BroadcastNestedLoop (O(N·M) — a scale-killer), so intervals
    * are exploded to the width-`bandWidth` buckets they overlap and the
    * join becomes a bucket EQUI-join + exact residual filter. Candidate
    * fan-out per interval is ceil(span/bandWidth)+1; fp division is
    * monotone, so a point satisfying lo <= p < hi always lands in a bucket
    * the interval covers — bucketing never loses matches, it only prunes.
    *
    * Fan-out safety (mirrors [[graft.plans.RangeJoinRewrite]]): an interval
    * spanning more than `maxBands` buckets would otherwise materialize an
    * unbounded `sequence()` (throws past 2^31 elements, OOMs earlier).
    * Such intervals fall back to `overflowSalt` salted overflow keys that
    * every point also emits exactly once — wide intervals still match
    * through the equi-join (salt-way parallel, residual-filtered exactly)
    * instead of failing at runtime. Each (point, interval) pair matches on
    * exactly one path, so the fallback adds no duplicates.
    */
  def rangeJoinBanded(points: DataFrame, pCol: String, intervals: DataFrame,
      loCol: String, hiCol: String, bandWidth: Double,
      maxBands: Int = 4096, overflowSalt: Int = 32): DataFrame = {
    require(bandWidth > 0 && java.lang.Double.isFinite(bandWidth),
      s"bandWidth must be a finite positive number, got $bandWidth")
    require(maxBands >= 1, s"maxBands must be >= 1, got $maxBands")
    require(overflowSalt >= 1 && overflowSalt <= 65536,
      s"overflowSalt must be in [1, 65536], got $overflowSalt")
    val loB = floor(col(loCol) / bandWidth).cast("long")
    val hiB = floor(col(hiCol) / bandWidth).cast("long")
    // span measured in doubles: immune to long overflow on absurd inputs
    val nBands = hiB.cast("double") - loB.cast("double") + lit(1.0d)
    val banded = transform(sequence(loB, hiB),
      b => struct(lit(0L).as("t"), b.as("b")))
    val sentinel = array((0 until overflowSalt).map(i =>
      struct(lit(1L).as("t"), lit(i.toLong).as("b"))): _*)
    val emptyArr = array().cast("array<struct<t:bigint,b:bigint>>")
    val expanded = intervals.withColumn("__band", explode(
      when(col(loCol).isNull || col(hiCol).isNull || loB > hiB, emptyArr)
        .when(nBands > maxBands, sentinel)
        .otherwise(banded)))
    val pB = floor(col(pCol) / bandWidth).cast("long")
    val pSalt = pmod(hash(pB), lit(overflowSalt)).cast("long")
    points.withColumn("__band", explode(array(
        struct(lit(0L).as("t"), pB.as("b")),
        struct(lit(1L).as("t"), pSalt.as("b")))))
      .join(expanded, Seq("__band"))
      .filter(col(pCol) >= col(loCol) && col(pCol) < col(hiCol))
      .drop("__band")
  }

  /** Interval-overlap join: every (left, right) pair whose half-open
    * intervals `[lo1, hi1) × [lo2, hi2)` intersect — i.e.
    * `max(lo1, lo2) < min(hi1, hi2)` — exactly once. Spark plans the raw
    * inequality condition as BroadcastNestedLoop (O(N·M)); here both sides
    * explode to the width-`bandWidth` buckets they cover and meet through
    * a bucket EQUI-join.
    *
    * Exactly-once dedup: two overlapping intervals share every bucket in
    * their intersection, so banded candidates would duplicate. The pair is
    * kept only in the bucket containing `max(lo1, lo2)` — a point both
    * intervals cover, so that bucket is always generated by both sides,
    * and it is unique per pair.
    *
    * Fan-out safety (same policy as [[rangeJoinBanded]]): an interval
    * covering more than `maxBands` buckets is WIDE and routes through
    * salted overflow tags instead of materializing an unbounded
    * `sequence()`. Three disjoint match paths guarantee exactly-once:
    *   - tag 0: narrow × narrow, banded + the dedup rule above;
    *   - tag 1: wide-left × any-right — a wide left emits all S salt keys,
    *     every valid right emits ONE salted tag-1 key;
    *   - tag 2: wide-right × narrow-left — symmetric, but the left single
    *     key is emitted only when the left interval is narrow (a wide left
    *     already met every right through tag 1).
    * Null or empty (`lo >= hi`) intervals emit no keys and match nothing.
    * Join-key columns must be uniquely named across the two inputs.
    */
  def intervalOverlapJoin(left: DataFrame, lo1: String, hi1: String,
      right: DataFrame, lo2: String, hi2: String, bandWidth: Double,
      maxBands: Int = 4096, overflowSalt: Int = 32): DataFrame = {
    require(bandWidth > 0 && java.lang.Double.isFinite(bandWidth),
      s"bandWidth must be a finite positive number, got $bandWidth")
    require(maxBands >= 1, s"maxBands must be >= 1, got $maxBands")
    require(overflowSalt >= 1 && overflowSalt <= 65536,
      s"overflowSalt must be in [1, 65536], got $overflowSalt")
    def bandOf(c: String) = floor(col(c) / bandWidth).cast("long")
    // left: bands+[(2,h)] when narrow, [(1,*)] when wide
    val lK = left.withColumn("__band",
      explode(when(col(lo1).isNull || col(hi1).isNull || col(lo1) >= col(hi1),
          array().cast("array<struct<t:bigint,b:bigint>>"))
        .when(bandOf(hi1).cast("double") - bandOf(lo1).cast("double") < maxBands,
          concat(transform(sequence(bandOf(lo1), bandOf(hi1)),
              b => struct(lit(0L).as("t"), b.as("b"))),
            array(struct(lit(2L).as("t"),
              pmod(hash(bandOf(lo1)), lit(overflowSalt)).cast("long").as("b")))))
        .otherwise(array((0 until overflowSalt).map(i =>
          struct(lit(1L).as("t"), lit(i.toLong).as("b"))): _*))))
    // right: bands when narrow / [(2,*)] when wide, plus always [(1,h)]
    val rK = right.withColumn("__rband",
      explode(when(col(lo2).isNull || col(hi2).isNull || col(lo2) >= col(hi2),
          array().cast("array<struct<t:bigint,b:bigint>>"))
        .when(bandOf(hi2).cast("double") - bandOf(lo2).cast("double") < maxBands,
          concat(transform(sequence(bandOf(lo2), bandOf(hi2)),
              b => struct(lit(0L).as("t"), b.as("b"))),
            array(struct(lit(1L).as("t"),
              pmod(hash(bandOf(lo2)), lit(overflowSalt)).cast("long").as("b")))))
        .otherwise(concat(
          array((0 until overflowSalt).map(i =>
            struct(lit(2L).as("t"), lit(i.toLong).as("b"))): _*),
          array(struct(lit(1L).as("t"),
            pmod(hash(bandOf(lo2)), lit(overflowSalt)).cast("long").as("b")))))))
    val overlap = greatest(col(lo1), col(lo2)) < least(col(hi1), col(hi2))
    val dedup = col("__band.t") =!= 0L ||
      col("__band.b") === floor(greatest(col(lo1), col(lo2)) / bandWidth).cast("long")
    lK.join(rK, col("__band") === col("__rband"))
      .filter(overlap && dedup)
      .drop("__band", "__rband")
  }

  /** NEAREST as-of join with tolerance — the full `merge_asof
    * (direction='nearest', tolerance=…)` surface on top of [[asofJoin]]'s
    * merge pattern: for every left row, the right row (same key) with the
    * smallest |right.ts − left.ts| ≤ `toleranceTicks`, backward winning
    * distance ties.
    *
    * ONE shuffle + ONE sort for both directions: the tagged union is
    * sorted once by (ts, side, payload) — right before left at equal ts —
    * and two frames over the SAME ordering carry the latest-preceding
    * payload (`last` over [unbounded, current]) and the
    * earliest-following payload (`first` over [current, unbounded]).
    * The following frame starting AT the left row cannot see same-ts
    * right rows (they sort earlier) — harmless by construction, because
    * any same-ts right is a distance-0 backward match that always wins.
    *
    * Deterministic tie rules (encoded identically in the j06 oracle):
    * distance tie → backward; duplicate-(key, ts) right rows → backward
    * matches resolve to the GREATEST (ts, valCols…) payload (asofJoin's
    * rule: `last` over ascending payload), forward matches to the
    * SMALLEST (`first` over the same ordering).
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valCols: Seq[String], toleranceTicks: Long): DataFrame = {
    require(toleranceTicks >= 0, s"tolerance must be >= 0, got $toleranceTicks")
    val leftCols = left.columns
    val (tagged, payloadT) =
      taggedAsofUnion(left, right, keyCol, tsCol, valCols)
    val ord = Seq(col(tsCol), col("__side"), col("__graft_p"))
    val wb = Window.partitionBy(keyCol).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(keyCol).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = tagged
      .withColumn("__pb", last(col("__graft_p"), ignoreNulls = true).over(wb))
      .withColumn("__pf", first(col("__graft_p"), ignoreNulls = true).over(wf))
    val db = col(tsCol) - col("__pb").getField("asof_ts") // >= 0 when defined
    val df = col("__pf").getField("asof_ts") - col(tsCol) // > 0 when defined
    val bOk = col("__pb").isNotNull && db <= toleranceTicks
    val fOk = col("__pf").isNotNull && df <= toleranceTicks
    val chosen = when(bOk && (!fOk || db <= df), col("__pb"))
      .when(fOk, col("__pf"))
      .otherwise(lit(null).cast(payloadT))
    carried.filter(col("__side") === 1)
      .withColumn("__graft_c", chosen)
      .select(leftCols.map(col) ++
        (col("__graft_c").getField("asof_ts").as("asof_ts") +:
          valCols.map(c => col("__graft_c").getField(c).as(c))): _*)
  }
}
