package graft.operators

import graft.SparkSpec
import graft.joins.TemporalJoins
import org.apache.spark.sql.functions._

/** Edge semantics of the round-6b/6c operators that the fixture-driven
  * oracles can't exercise: CDC delete ordering, zero-tolerance as-of,
  * multiset multiplicities, null-safe join vs plain equality.
  */
class Round6bOpsSpec extends SparkSpec {
  import spark.implicits._

  test("CDC apply: delete-then-update keeps the key, update-then-delete drops it") {
    val log = Seq(
      // user 1: U, D, U -> survives with the final update
      (1L, 1L, "a", 10L, "U"), (1L, 2L, "b", 20L, "D"), (1L, 3L, "c", 30L, "U"),
      // user 2: U, U, D -> dropped
      (2L, 4L, "x", 10L, "U"), (2L, 5L, "y", 20L, "U"), (2L, 6L, "z", 30L, "D"),
      // user 3: single delete of a never-seen key -> dropped
      (3L, 7L, "q", 10L, "D"))
      .toDF("user_id", "event_id", "state", "ts", "op")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val out = log.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") === "U")
      .select("user_id", "state").as[(Long, String)].collect().toMap
    out shouldBe Map(1L -> "c")
  }

  test("asofJoinNearest with tolerance 0 matches only exact-timestamp rows") {
    val l = Seq((1L, 100L), (1L, 101L)).toDF("k", "ts")
    val r = Seq((1L, 100L, 1.0), (1L, 102L, 2.0)).toDF("k", "ts", "v")
    val got = TemporalJoins.asofJoinNearest(l, r, "k", "ts", Seq("v"), 0L)
      .select("ts", "asof_ts").as[(Long, Option[Long])].collect().toMap
    got shouldBe Map(100L -> Some(100L), 101L -> None)
  }

  test("intersectAll keeps min multiplicity; exceptAll subtracts counts") {
    val a = Seq("x", "x", "x", "y").toDF("v")
    val b = Seq("x", "x", "z").toDF("v")
    a.intersectAll(b).as[String].collect().sorted shouldBe Array("x", "x")
    a.exceptAll(b).as[String].collect().sorted shouldBe Array("x", "y")
  }

  test("null-safe <=> matches null keys that plain = silently drops") {
    val l = Seq(Some(1L), None, Some(2L)).toDF("k")
    val r = Seq(Some(1L), None).toDF("k")
    l.join(r, l("k") === r("k")).count() shouldBe 1 // = drops the null pair
    l.join(r, l("k") <=> r("k")).count() shouldBe 2 // <=> keeps it
  }

  test("mergeSchema unifies drifted batches with null padding both ways") {
    val dir = tmpDir("merge")
    Seq((1L, 10.0)).toDF("id", "price").write.parquet(s"$dir/b1")
    Seq((2L, "hi")).toDF("id", "prio").write.parquet(s"$dir/b2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/b1", s"$dir/b2")
      .select("id", "price", "prio")
      .as[(Long, Option[Double], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    merged(1L) shouldBe ((Some(10.0), None))
    merged(2L) shouldBe ((None, Some("hi")))
  }

  test("SCD2 islands: consecutive identical states collapse, A-B-A yields three intervals") {
    val ev = Seq(
      (1L, 1L, "A", 10L), (1L, 2L, "A", 20L), (1L, 3L, "B", 30L),
      (1L, 4L, "A", 40L))
      .toDF("user_id", "event_id", "event_type", "ts")
    val byTs = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val cum = byTs.rowsBetween(Long.MinValue, 0)
    val islands = ev
      .withColumn("chg", when(lag(col("event_type"), 1).over(byTs).isNull ||
        col("event_type") =!= lag(col("event_type"), 1).over(byTs), 1).otherwise(0))
      .withColumn("island", sum(col("chg")).over(cum))
      .groupBy("island", "event_type")
      .agg(min("ts").as("from"), count(lit(1)).as("n"))
      .orderBy("island")
      .as[(Long, String, Long, Long)].collect()
    islands.map(_._2).toSeq shouldBe Seq("A", "B", "A")
    islands.map(_._4).toSeq shouldBe Seq(2L, 1L, 1L) // first island merged 2 rows
  }
}
