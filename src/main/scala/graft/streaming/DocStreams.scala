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
    * store keyed by the 8-byte bucket hash, and the same stop-bucket cap
    * that bounds d04's gram fanout applies (a bucket past a cap would be
    * frozen as boilerplate). Duplicate emissions across bands (a pair
    * sharing several buckets) are expected — the consumer dedups pairs,
    * exactly as the batch path's `.distinct()` does.
    */
  def lshCandidatePairs(keys: Dataset[BandKeyRow]): Dataset[CandPair] = {
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
}
