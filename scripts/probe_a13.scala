// Probe: why does a13 run at ~2 effective cores at gsf1?
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.adaptive.enabled", "true")
val d = "/root/repo/data/gsf2"
val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
val li = spark.read.parquet(s"$d/lineitem.parquet").select(cols.map(col): _*)
println("scan partitions: " + li.rdd.getNumPartitions)

def t(label: String)(f: => Unit): Unit = {
  val t0 = System.nanoTime(); f
  println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
}

def moments(df: org.apache.spark.sql.DataFrame) = {
  def dd(c: String) = col(c).cast("double")
  val pairs = for { (a, i) <- cols.zipWithIndex; b <- cols.drop(i + 1) } yield (a, b)
  val ms = count(lit(1)).as("n") +:
    (cols.flatMap(c => Seq(count(dd(c)).as(s"cnt__$c"),
      sum(dd(c).cast(DecimalType(25, 6))).cast("double").as(s"s__$c"),
      sum((dd(c) * dd(c)).cast(DecimalType(30, 6))).cast("double").as(s"s2__$c"))) ++
      pairs.map { case (a, b) =>
        sum((dd(a) * dd(b)).cast(DecimalType(30, 6))).cast("double").as(s"sp__${a}__$b") })
  df.agg(ms.head, ms.tail: _*)
}

t("warmup count")(li.count())
t("agg WITHOUT fanOut")(moments(li).collect())
t("agg WITH repartition(32)")(moments(li.repartition(32)).collect())
t("agg WITH repartition(32) run2")(moments(li.repartition(32)).collect())
val rdd32 = li.repartition(32)
println("post-repartition partitions (AQE view): " + rdd32.rdd.getNumPartitions)
t("full a13 corrMatrix")(graft.analysis.Profile.corrMatrix(
  spark.read.parquet(s"$d/lineitem.parquet"), cols).collect())
System.exit(0)
