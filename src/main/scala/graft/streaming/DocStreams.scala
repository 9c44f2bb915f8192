package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One LSH band-key row flowing through the streaming dedup pipeline
  * ([[graft.llm.Dedup.streamBandKeys]]'s output shape).
  */
final case class BandKeyRow(id: Long, bk: Long)

/** One candidate near-dup pair, canonical order doc_a < doc_b. */
final case class CandPair(doc_a: Long, doc_b: Long)

/** The ids already seen in one LSH bucket — the streaming dedup index
  * entry for that bucket. Grows with bucket occupancy, exactly like the
  * batch index's inverted band list (this IS the persisted-LSH-index
  * shape of d13, held as streaming state instead of parquet).
  */
final case class BucketState(ids: Array[Long])

/** One (fingerprint, doc id) row flowing into the streaming exact-dedup
  * index (st16's input shape).
  */
final case class FpRow(fp: String, id: Long)

/** Per-fingerprint dedup-index state: the keeper (min doc id seen) and
  * the copy count so far — exactly one d06 output row, held as state.
  */
final case class FpKeeperState(keeper: Long, n: Long)

/** One keeper-index revision: the CURRENT (keeper, copies) for `fp`
  * after folding in a micro-batch's arrivals.
  */
final case class FpKeeperUpdate(fp: String, keeper_id: Long, n_copies: Long)

/** Streaming document-dedup operators (the d02 family's st-twins). */
object DocStreams {

  /** Streaming MinHash-LSH candidate generation — d02's st-twin, the
    * ingest-time form of near-dup detection: documents arrive in
    * micro-batches, each doc's band keys route it to its LSH buckets
    * ([[graft.llm.Dedup.streamBandKeys]] upstream), and per-bucket state
    * remembers which docs were seen there. A new arrival emits one
    * candidate pair per previously-seen bucket member (plus pairs among
    * same-batch arrivals), so the UNION of emissions over any backlog is
    * EXACTLY the batch LSH candidate set — per-bucket pair enumeration is
    * placement-invariant (each unordered pair is emitted when its later
    * member arrives, or once within the batch that carries both), which
    * is why st15 can share d02's exact all-pairs oracle after the same
    * exact-Jaccard verify stage.
    *
    * State per bucket is its member-id list — the same O(occupancy)
    * footprint the batch path shuffles through its bucket self-join and
    * d13 persists as the on-disk index; at 100 TB it lives in the state
    * store keyed by the 8-byte bucket hash. `maxBucketMembers` is the
    * stop-bucket cap that bounds d04's gram fanout, ENFORCED here
    * (round-12 advice — it used to be prose): a bucket at the cap is
    * FROZEN as boilerplate — further arrivals in it emit nothing and are
    * not remembered — so per-bucket state is O(cap) and per-arrival
    * emission O(cap) instead of O(occupancy) on a skewed bucket
    * (quadratic total). Unlike the batch stop-gram (which drops the
    * over-df gram retroactively), a stream cannot retract: pairs the
    * bucket emitted BEFORE freezing stand. The default keeps every real
    * LSH bucket below the cap while growing dup clusters still fit (a
    * 4096-member bucket at θ = 0.5 is boilerplate by construction —
    * measured max occupancy: 5 at sf0.1 and 317 at 100× data with
    * r = 3; 22 / 1 036 with the r = 1 dial — the biggest bucket tracks
    * the biggest dup cluster, so at ~1000× the r = 1 dial WOULD freeze
    * its worst bucket, which is the cap doing its job on what is by
    * then a 10k-member boilerplate cluster); exact-equivalence
    * consumers (st15's shared d02 oracle) hold as long as no bucket
    * freezes, which StreamDialSpec pins on the shipped corpora. Duplicate emissions
    * across bands (a pair sharing several buckets) are expected — the
    * consumer dedups pairs, exactly as the batch path's `.distinct()`
    * does.
    */
  def lshCandidatePairs(keys: Dataset[BandKeyRow],
      maxBucketMembers: Int = 4096): Dataset[CandPair] = {
    require(maxBucketMembers >= 1, "maxBucketMembers must be >= 1")
    import keys.sparkSession.implicits._
    keys
      .groupByKey(_.bk)
      .flatMapGroupsWithState[BucketState, CandPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[BandKeyRow], state: GroupState[BucketState]) =>
          val old = state.getOption.map(_.ids).getOrElse(Array.empty[Long])
          val oldSet = old.toSet
          val fresh = rows.map(_.id).toArray.distinct.sorted
            .filterNot(oldSet.contains)
            // stop-bucket cap: accept only up to the cap, freeze the rest
            .take(math.max(0, maxBucketMembers - old.length))
          val out = Seq.newBuilder[CandPair]
          var i = 0
          while (i < fresh.length) {
            val n = fresh(i)
            var j = 0
            while (j < old.length) { // new × already-seen
              val o = old(j)
              out += (if (n < o) CandPair(n, o) else CandPair(o, n))
              j += 1
            }
            j = i + 1
            while (j < fresh.length) { // new × new (ascending ids)
              out += CandPair(n, fresh(j))
              j += 1
            }
            i += 1
          }
          if (fresh.nonEmpty) state.update(BucketState(old ++ fresh))
          out.result().iterator
      }
  }

  /** Streaming exact-dedup KEEPER INDEX — d06's st-twin and the
    * ingest-time "have we seen this document?" gate: per-fingerprint
    * state holds (keeper = min doc id so far, copies so far) — one d06
    * output row per key, i.e. d17's persisted exact index maintained
    * incrementally by the streaming engine instead of rebuilt from the
    * corpus. Each micro-batch folds its arrivals for a fingerprint into
    * ONE emitted revision carrying the group's current (keeper, count),
    * so duplicate arrivals revise an existing identity rather than
    * emitting new rows, and emission volume is bounded by (distinct fps
    * in the batch), not batch size. Keeper only decreases and count only
    * increases, so the drained revision log compacts to EXACTLY the
    * batch d06 table under (min keeper, max count) — for ANY micro-batch
    * placement of the corpus, which is why st16 can share d06's oracle
    * verbatim. State per key is two longs: O(distinct docs) total, the
    * same footprint d17 persists to parquet.
    */
  def fpKeeperUpdates(rows: Dataset[FpRow]): Dataset[FpKeeperUpdate] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.fp)
      .flatMapGroupsWithState[FpKeeperState, FpKeeperUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (fp: String, it: Iterator[FpRow], state: GroupState[FpKeeperState]) =>
          var mn = Long.MaxValue
          var c = 0L
          it.foreach { r => if (r.id < mn) mn = r.id; c += 1L }
          val prev = state.getOption
          val next = FpKeeperState(
            math.min(prev.map(_.keeper).getOrElse(Long.MaxValue), mn),
            prev.map(_.n).getOrElse(0L) + c)
          state.update(next)
          Iterator.single(FpKeeperUpdate(fp, next.keeper, next.n))
      }
  }
}
