package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata carried alongside opaque media bytes. */
final case class MediaMeta(mime: String, byteLen: Long)

/** One media row: opaque binary content + typed metadata. */
final case class MediaRecord(doc_id: Long, content: Array[Byte], meta: MediaMeta)

/** Extracted feature row (fixed-width vector + provenance). */
final case class MediaFeatures(doc_id: Long, byteLen: Long, features: Array[Double])

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, batched per-partition feature extraction.
  *
  * The decode step is a STUB — the real image/audio decoders are not in this
  * container — but it is a deterministic fake (16-bin byte histogram), and
  * everything around it is real Spark: the schema, the Dataset encoders, the
  * mapPartitions batch shape (the Scala analogue of `mapInPandas`: iterate
  * the partition in fixed-size batches so a vectorized decoder could process
  * each batch in one native call), and the partition-preserving plan.
  */
object Multimodal {

  val BatchSize = 64

  /** STUB decode: a real implementation would decode the image/audio and
    * run a feature extractor; here a deterministic 16-bin byte histogram
    * (L1-normalized) stands in so the pipeline is testable end-to-end.
    */
  def decodeStub(bytes: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xFF) >> 4) += 1.0; i += 1 }
    val n = math.max(1, bytes.length).toDouble
    hist.map(_ / n)
  }

  /** Lift a text table into the media shape (utf-8 bytes as the opaque
    * content; in production this would be an image/audio binary column).
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
        encode(col(payloadCol), "UTF-8").as("content"))
      .withColumn("meta", struct(lit("text/plain").as("mime"),
        length(col("content")).cast("long").as("byteLen")))
      .as[MediaRecord]
  }

  /** Batched per-partition feature extraction. No shuffle: a narrow
    * mapPartitions directly over the scan.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // one "vectorized decoder call" per batch in a real implementation
        batch.iterator.map { r =>
          MediaFeatures(r.doc_id, r.meta.byteLen, decodeStub(r.content))
        }
      }
    }
  }
}
