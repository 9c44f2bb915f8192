package graft.tools

import org.apache.spark.sql.SparkSession

/** Runs named [[graft.SparkEntry]] queries against one data dir and prints
  * row counts + a head sample — the smoke probe for new operators before
  * the full Verify/oracle gate. NB standalone runs are JIT-cold: timings
  * here are for gross-pathology checks only, never SCALE.md evidence
  * (see SCALE.md "Measurement noise").
  *
  * Usage: runMain graft.tools.QProbe <dataDir> <query> [<query> ...]
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QProbe <dataDir> <query>...")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.hugeMethodLimit",
        sys.env.getOrElse("SPARK_GRAFT_HUGE_LIMIT", "65535"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    args.drop(1).foreach { q =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val rows = df.collect()
      println(f"QPROBE $q rows=${rows.length} t=${(System.nanoTime() - t0) / 1e9}%.2f s")
      rows.take(6).foreach(r => println(s"QPROBE $q ROW $r"))
    }
    spark.stop()
  }
}
