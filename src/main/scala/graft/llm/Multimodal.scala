package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata carried alongside opaque media bytes. */
final case class MediaMeta(mime: String, byteLen: Long)

/** One media row: opaque binary content + typed metadata. */
final case class MediaRecord(doc_id: Long, content: Array[Byte], meta: MediaMeta)

/** Extracted feature row (fixed-width vector + provenance). */
final case class MediaFeatures(doc_id: Long, byteLen: Long, features: Array[Double])

/** A decoded raster image: interleaved RGB bytes, row-major. */
final case class PpmImage(width: Int, height: Int, maxVal: Int, pixels: Array[Byte])

/** Per-image features from the real decode path: dimensions + per-channel
  * pixel means.
  */
final case class ImageFeatures(doc_id: Long, width: Int, height: Int,
    mean_r: Double, mean_g: Double, mean_b: Double)

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, batched per-partition feature extraction.
  *
  * Two decode paths:
  *  - [[ppmDecode]] is a REAL decoder for binary PPM (P6) — the simplest
  *    uncompressed raster format: ASCII header (magic, dims, maxval, with
  *    `#` comments), then interleaved RGB bytes. Pure JVM, no native deps,
  *    so the mm02 pipeline decodes genuine image bytes end-to-end and its
  *    per-channel means are oracle-able against planted pixels.
  *  - [[decodeStub]] remains the stand-in for formats whose decoders are
  *    not in this container (JPEG/audio/video) — deterministic, documented.
  *
  * Everything around them is real Spark: the schema, the Dataset encoders,
  * the mapPartitions batch shape (the Scala analogue of `mapInPandas`:
  * iterate the partition in fixed-size batches so a vectorized decoder
  * could process each batch in one native call), and the shuffle-free plan.
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

  /** Serialize interleaved RGB pixels as binary PPM (P6): `P6\n<w> <h>\n
    * <maxval>\n` + w·h·3 raw bytes. `pixel(i)` supplies byte i of the
    * interleaved stream (masked to 0..255).
    */
  def ppmEncode(width: Int, height: Int, pixel: Int => Int): Array[Byte] = {
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val n = width * height * 3
    val out = new Array[Byte](header.length + n)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < n) { out(header.length + i) = (pixel(i) & 0xFF).toByte; i += 1 }
    out
  }

  /** REAL binary-PPM (P6) decoder: parses the ASCII header (whitespace- and
    * `#`-comment-tolerant, per the netpbm spec), validates the magic and
    * maxval, and slices out the raw interleaved RGB plane. Throws on
    * malformed or truncated input — corrupt media must surface, not decode
    * to garbage features.
    */
  def ppmDecode(bytes: Array[Byte]): PpmImage = {
    var pos = 0
    def skipWs(): Unit = {
      var done = false
      while (!done && pos < bytes.length) {
        val b = bytes(pos)
        if (b == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else if (b == ' ' || b == '\n' || b == '\r' || b == '\t') pos += 1
        else done = true
      }
    }
    def readInt(field: String): Int = {
      skipWs()
      val start = pos
      var v = 0
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1
      }
      require(pos > start, s"PPM: missing $field at byte $start")
      v
    }
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "PPM: not a P6 magic")
    pos = 2
    val w = readInt("width")
    val h = readInt("height")
    val maxVal = readInt("maxval")
    require(w > 0 && h > 0, s"PPM: bad dimensions ${w}x$h")
    require(maxVal > 0 && maxVal <= 255, s"PPM: unsupported maxval $maxVal")
    pos += 1 // exactly one whitespace byte separates maxval from pixel data
    val need = w * h * 3
    require(bytes.length - pos >= need,
      s"PPM: truncated pixel data (${bytes.length - pos} of $need bytes)")
    PpmImage(w, h, maxVal, java.util.Arrays.copyOfRange(bytes, pos, pos + need))
  }

  /** Synthetic PPM corpus over an id column: byte i of doc `id`'s pixel
    * stream is (37·id + i) mod 256 — deterministic and closed-form, so a
    * SQL oracle can recompute the per-channel means without a decoder.
    */
  def syntheticPpm(df: DataFrame, idCol: String,
      width: Int, height: Int): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      val seed = ((id * 37) % 256).toInt
      val bytes = ppmEncode(width, height, i => (seed + i) % 256)
      MediaRecord(id, bytes,
        MediaMeta("image/x-portable-pixmap", bytes.length.toLong))
    }
  }

  /** Batched per-partition image decode + per-channel mean extraction —
    * same shuffle-free mapPartitions shape as [[extractFeatures]], with the
    * REAL [[ppmDecode]] in the batch loop. Sums are exact (integer bytes in
    * a long), and the division is by the pixel count, so means are
    * bit-deterministic regardless of partitioning.
    */
  def extractImageFeatures(media: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val img = ppmDecode(r.content)
          val n = img.width * img.height
          var sr = 0L; var sg = 0L; var sb = 0L
          var p = 0
          while (p < n) {
            sr += img.pixels(3 * p) & 0xFF
            sg += img.pixels(3 * p + 1) & 0xFF
            sb += img.pixels(3 * p + 2) & 0xFF
            p += 1
          }
          ImageFeatures(r.doc_id, img.width, img.height,
            sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
        }
      }
    }
  }
}
