// Isolate a13's super-linearity: decimal-agg cost vs data size, agg count, and type
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
spark.conf.set("spark.sql.shuffle.partitions", "32")
def t(label: String)(f: => Unit): Unit = {
  val t0 = System.nanoTime(); f
  println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
}
def li(d: String) = spark.read.parquet(s"/root/repo/data/$d/lineitem.parquet")
  .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")

for (d <- Seq("gsf1", "gsf2")) {
  val df = li(d)
  t(s"$d warmup count")(df.count())
  t(s"$d ONE decimal sum")(
    df.agg(sum((col("l_extendedprice") * col("l_extendedprice")).cast(DecimalType(30, 6)))).collect())
  t(s"$d ONE double sum")(
    df.agg(sum(col("l_extendedprice") * col("l_extendedprice"))).collect())
  t(s"$d FOUR decimal sums")(
    df.agg(
      sum((col("l_quantity") * col("l_quantity")).cast(DecimalType(30, 6))),
      sum((col("l_extendedprice") * col("l_extendedprice")).cast(DecimalType(30, 6))),
      sum((col("l_discount") * col("l_discount")).cast(DecimalType(30, 6))),
      sum((col("l_tax") * col("l_tax")).cast(DecimalType(30, 6)))).collect())
}
System.exit(0)
