package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting. AQE's skew-join handling covers sorted
  * shuffle joins automatically; salting is the explicit lever for the
  * cases AQE can't split — hot keys in aggregations and broadcast-less
  * joins against a replicable side.
  */
object Skew {

  /** Deterministic salt in [0, n) derived from a distributing column
    * (NOT rand() — reruns and retried tasks must agree).
    */
  def salt(distributingCol: Column, n: Int): Column =
    pmod(xxhash64(distributingCol), lit(n.toLong)).cast("int")

  /** Two-phase salted aggregation: phase 1 aggregates on (key, salt) —
    * spreading a hot key over n reducers — phase 2 merges the partials per
    * key. Works for any algebraic aggregate (count/sum here).
    */
  def saltedCountSum(df: DataFrame, keyCol: String, valueCol: String,
      distributingCol: String, n: Int): DataFrame =
    df.withColumn("__salt", salt(col(distributingCol), n))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__cnt"), sum(col(valueCol)).as("__sum"))
      .groupBy(col(keyCol))
      .agg(sum("__cnt").as("cnt"), sum("__sum").as(s"sum_$valueCol"))

  /** Salted equi-join for a skewed large side: the large side gets a salt
    * from a distributing column; the small side is replicated n× (one copy
    * per salt value) so every (key, salt) partition finds its match.
    * Result is row-identical to the unsalted join.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      distributingCol: String, n: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt", salt(col(distributingCol), n))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    saltedLarge.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
