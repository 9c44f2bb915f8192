package graft.util

import org.apache.spark.sql.SparkSession

/** Sidecar IO for persisted index stores — the shared half of the
  * generation-dir index choreography ([[graft.llm.Dedup]]'s minhash store,
  * [[graft.llm.Similarity]]'s IVF store): small metadata files
  * (`_graft_index.json`, bloom sidecars) that live NEXT TO an index's
  * parquet tables and are written LAST, so a half-written store fails
  * loudly on first read instead of answering from partial data.
  *
  * Everything opens through the Hadoop FileSystem resolved from the INDEX
  * PATH's scheme (round-12 advice: java.nio-only sidecars worked only for
  * local paths, so an hdfs:///s3a:// index silently had no working sidecar
  * while its parquet half used scheme-aware Spark IO).
  */
object IndexSidecar {

  def resolve(spark: SparkSession, dir: String, name: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  def writeBytes(spark: SparkSession, dir: String,
      name: String, bytes: Array[Byte]): Unit = {
    val (fs, p) = resolve(spark, dir, name)
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  def readBytes(spark: SparkSession, dir: String,
      name: String): Array[Byte] = {
    val (fs, p) = resolve(spark, dir, name)
    val in = fs.open(p)
    try in.readAllBytes() finally in.close()
  }

  /** Does `dir/name` exist? (Generation-dir consumers use this to decide
    * whether a tombstone table / meta sidecar was ever written.) */
  def exists(spark: SparkSession, dir: String, name: String): Boolean = {
    val (fs, p) = resolve(spark, dir, name)
    fs.exists(p)
  }

  /** Recursively delete `dir/name` if present — the rebuild-replaces-
    * whole-index step (a surviving generation or stale takedown list from
    * a previous build would silently leak into the new one). */
  def deleteIfExists(spark: SparkSession, dir: String, name: String): Unit = {
    val (fs, p) = resolve(spark, dir, name)
    if (fs.exists(p)) fs.delete(p, true): Unit
  }
}
