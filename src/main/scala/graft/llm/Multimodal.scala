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

/** Decoded PCM audio: 16-bit signed samples, mono. */
final case class WavAudio(sampleRate: Int, channels: Int, samples: Array[Short])

/** Per-clip features from the real audio decode path. */
final case class AudioFeatures(doc_id: Long, n_samples: Int, sample_rate: Int,
    mean_amp: Double, rms: Double)

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

  /** Serialize 16-bit signed mono PCM as a canonical WAV (RIFF) file:
    * RIFF header, `fmt ` chunk (PCM, mono, 16-bit), `data` chunk.
    */
  def wavEncode(sampleRate: Int, sample: Int => Int, nSamples: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) { out.putShort(sample(i).toShort); i += 1 }
    out.array()
  }

  /** REAL WAV (RIFF) decoder: walks the chunk list (tolerating extra
    * chunks like LIST/INFO, as the spec allows), validates the PCM/16-bit/
    * mono format against the `fmt ` chunk, and slices the `data` samples.
    * Throws on malformed input — corrupt media must surface.
    */
  def wavDecode(bytes: Array[Byte]): WavAudio = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(bytes.length >= 44, "WAV: truncated header")
    require(tag() == "RIFF", "WAV: missing RIFF magic")
    buf.getInt() // declared riff size (unchecked: stream-written files lie)
    require(tag() == "WAVE", "WAV: not a WAVE form")
    var sampleRate = -1; var channels = -1; var bits = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8) {
      val id = tag(); val len = buf.getInt()
      require(len >= 0 && buf.remaining() >= len, s"WAV: truncated chunk $id")
      id match {
        case "fmt " =>
          require(len >= 16, "WAV: short fmt chunk")
          val fmtEnd = buf.position() + len
          require(buf.getShort() == 1, "WAV: not PCM")
          channels = buf.getShort()
          sampleRate = buf.getInt()
          buf.getInt(); buf.getShort() // byte rate, block align
          bits = buf.getShort()
          buf.position(fmtEnd)
        case "data" =>
          require(bits == 16 && channels == 1,
            s"WAV: unsupported format ($channels ch, $bits bit) — fmt must precede data")
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort(); i += 1 }
        case _ =>
          buf.position(buf.position() + len + (len & 1)) // chunks are word-aligned
      }
    }
    require(samples != null, "WAV: no data chunk")
    WavAudio(sampleRate, channels, samples)
  }

  /** Synthetic WAV corpus over an id column: sample i of doc `id`'s clip
    * is ((53·id mod 1009) + 7i) mod 2001 − 1000 — closed form for the SQL
    * oracle, full-range signed amplitudes.
    */
  def syntheticWav(df: DataFrame, idCol: String,
      nSamples: Int, sampleRate: Int): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      val seed = ((id * 53) % 1009).toInt
      val bytes = wavEncode(sampleRate, i => (seed + 7 * i) % 2001 - 1000, nSamples)
      MediaRecord(id, bytes, MediaMeta("audio/wav", bytes.length.toLong))
    }
  }

  /** [[wavEncode]] with an extra LIST/INFO metadata chunk between `fmt `
    * and `data` — the canonical "re-encoded duplicate": container BYTES
    * differ (tools love stamping INFO chunks), decoded PCM does not. The
    * spec-legal extra chunk is exactly what [[wavDecode]]'s chunk walk
    * must skip, so duplicates built this way exercise the decoder's
    * tolerance end-to-end rather than just re-hashing equal buffers.
    */
  def wavEncodeWithInfoChunk(sampleRate: Int, sample: Int => Int,
      nSamples: Int, info: String): Array[Byte] = {
    val infoBytes = info.getBytes("US-ASCII")
    val pad = infoBytes.length & 1 // RIFF chunks are word-aligned
    val listLen = 4 + infoBytes.length + pad
    val dataLen = nSamples * 2
    val out = java.nio.ByteBuffer.allocate(44 + 8 + listLen + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + 8 + listLen + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
    out.put("LIST".getBytes("US-ASCII")).putInt(listLen)
      .put("INFO".getBytes("US-ASCII")).put(infoBytes)
    if (pad == 1) out.put(0.toByte)
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) { out.putShort(sample(i).toShort); i += 1 }
    out.array()
  }

  /** Landmark fingerprint over decoded PCM — the constellation idea
    * (Wang 2003) reduced to its deterministic core: split the clip into
    * fixed windows, keep each window's spectral-peak stand-in (the
    * offset AND magnitude of the max |amplitude|, FIRST max on ties — a
    * total rule), and fingerprint = the ordered `off:amp` landmarks.
    * Offset alone is far too coarse (measured 5,500 clips → 115 distinct
    * fingerprints on the synthetic corpus — thousands of false dup
    * pairs); the magnitude makes each window's landmark carry real
    * signal. Robust to container re-encoding by construction (it sees
    * samples, not bytes); the closed-form synthetic corpus lets a SQL
    * oracle rebuild every landmark without a decoder.
    */
  def audioLandmarkFingerprint(a: WavAudio, windowSize: Int = 32): String = {
    val lm = landmarks(a, windowSize)
    val sb = new StringBuilder
    var w = 0
    while (w < lm.length) {
      if (w > 0) sb.append('-')
      sb.append(lm(w)._1).append(':').append(lm(w)._2)
      w += 1
    }
    sb.toString
  }

  /** Per-window (offset, amplitude) landmark pairs — the shared core of
    * [[audioLandmarkFingerprint]] (string form) and
    * [[extractLandmarkVectors]] (vector form). First max on ties.
    */
  private def landmarks(a: WavAudio, windowSize: Int): Array[(Int, Int)] = {
    val n = a.samples.length
    val out = Array.newBuilder[(Int, Int)]
    var w = 0
    while (w * windowSize < n) {
      val end = math.min((w + 1) * windowSize, n)
      var bestOff = 0; var bestAmp = -1
      var i = w * windowSize
      while (i < end) {
        val amp = math.abs(a.samples(i).toInt)
        if (amp > bestAmp) { bestAmp = amp; bestOff = i - w * windowSize }
        i += 1
      }
      out += ((bestOff, bestAmp))
      w += 1
    }
    out.result()
  }

  final case class LandmarkVector(doc_id: Long, embedding: Array[Float])

  /** Batched decode → landmark FEATURE VECTOR: the ANN-handoff form of
    * [[extractAudioFingerprints]] — each clip's per-window (offset,
    * amplitude) landmarks flattened to [off0, amp0, off1, amp1, …], an
    * `array<float>` embedding column the similarity stack consumes
    * directly. Entries are small non-negative ints (off < windowSize,
    * amp ≤ 32767), exactly representable in float, so the cosine
    * kernel's double accumulation downstream is bit-deterministic and a
    * SQL oracle can rebuild every vector from the closed-form synthetic
    * corpus without a decoder.
    */
  def extractLandmarkVectors(media: Dataset[MediaRecord],
      windowSize: Int = 32): Dataset[LandmarkVector] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val lm = landmarks(wavDecode(r.content), windowSize)
          val v = new Array[Float](lm.length * 2)
          var w = 0
          while (w < lm.length) {
            v(2 * w) = lm(w)._1.toFloat
            v(2 * w + 1) = lm(w)._2.toFloat
            w += 1
          }
          LandmarkVector(r.doc_id, v)
        }
      }
    }
  }

  final case class EnergyProfile(doc_id: Long, window: Int, energy: Long)

  /** Batched decode → per-window ENERGY profile: Σ sample² over each
    * fixed window as exact BIGINT (samples are 16-bit ints; 32·32767² ≪
    * 2⁶³, no float anywhere) — the loudness/energy feature every audio
    * curation pass computes next to the spectral landmark (mm09 keeps
    * each window's peak LOCATION and height; this keeps the window's L2
    * MASS — silence detection, clipping triage, energy-based segmenting
    * all read this column). Probe-first (round-12 directive #6): on the
    * synthetic corpus the profile is NOT degenerate — all sampled docs
    * have distinct 8-window profiles and within-doc window variation is
    * strong (CV ≈ 0.88, min 0.77), because 32 samples stride only 224 of
    * the 2001-step sawtooth period, so window energy depends on the
    * phase the seed lands on. Same batched scan-shaped mapPartitions as
    * every decode here; the closed-form corpus lets a SQL oracle rebuild
    * every energy without a decoder.
    */
  def extractEnergyProfiles(media: Dataset[MediaRecord],
      windowSize: Int = 32): Dataset[EnergyProfile] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val a = wavDecode(r.content)
          val n = a.samples.length
          val out = Array.newBuilder[EnergyProfile]
          var w = 0
          while (w * windowSize < n) {
            val end = math.min((w + 1) * windowSize, n)
            var e = 0L
            var i = w * windowSize
            while (i < end) {
              val s = a.samples(i).toLong
              e += s * s
              i += 1
            }
            out += EnergyProfile(r.doc_id, w, e)
            w += 1
          }
          out.result()
        }
      }
    }
  }

  final case class AudioFp(doc_id: Long, fp: String)

  /** Batched per-partition decode → landmark fingerprint (the audio twin
    * of [[extractVideoSignature]]): shuffle-free scan work; dedup is a
    * fingerprint groupBy downstream.
    */
  def extractAudioFingerprints(media: Dataset[MediaRecord],
      windowSize: Int = 32): Dataset[AudioFp] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { r =>
          AudioFp(r.doc_id, audioLandmarkFingerprint(wavDecode(r.content), windowSize))
        }
      }
    }
  }

  /** Batched per-partition audio decode + amplitude stats — the audio twin
    * of [[extractImageFeatures]]. Sums are exact in a long; mean divides
    * by a power-of-two sample count in the declared query, so the doubles
    * are bit-deterministic.
    */
  def extractAudioFeatures(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val a = wavDecode(r.content)
          val n = a.samples.length
          var s = 0L; var sq = 0L
          var i = 0
          while (i < n) {
            val v = a.samples(i).toLong
            s += v; sq += v * v
            i += 1
          }
          AudioFeatures(r.doc_id, n, a.sampleRate,
            s.toDouble / n, math.sqrt(sq.toDouble / n))
        }
      }
    }
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

  /** Nearest-neighbor resize (the standard preprocessing step before a
    * vision encoder): output pixel (y, x) samples input
    * (floor(y·h/oh), floor(x·w/ow)) — pure integer index math, no
    * interpolation, so resized features stay closed-form oracle-able.
    */
  def resizeNearest(img: PpmImage, ow: Int, oh: Int): PpmImage = {
    val out = new Array[Byte](ow * oh * 3)
    var y = 0
    while (y < oh) {
      val sy = y * img.height / oh
      var x = 0
      while (x < ow) {
        val sx = x * img.width / ow
        val src = 3 * (sy * img.width + sx)
        val dst = 3 * (y * ow + x)
        out(dst) = img.pixels(src)
        out(dst + 1) = img.pixels(src + 1)
        out(dst + 2) = img.pixels(src + 2)
        x += 1
      }
      y += 1
    }
    PpmImage(ow, oh, img.maxVal, out)
  }

  /** Batched decode → nearest-neighbor resize → per-channel means: the
    * mm04 path. Same shuffle-free mapPartitions shape; the resize runs on
    * the decoded raster inside the batch loop.
    */
  def extractResizedFeatures(media: Dataset[MediaRecord],
      ow: Int, oh: Int): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val img = resizeNearest(ppmDecode(r.content), ow, oh)
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

  /** Serialize a frame sequence as a minimal length-prefixed container
    * ("GVID" magic, big-endian frame count, then per frame a big-endian
    * byte length + the encoded frame — here PPM stills).
    */
  def gvidEncode(frames: Seq[Array[Byte]]): Array[Byte] = {
    val total = 8 + frames.map(4 + _.length).sum
    val buf = java.nio.ByteBuffer.allocate(total)
    buf.put("GVID".getBytes("US-ASCII")).putInt(frames.length)
    frames.foreach { f => buf.putInt(f.length); buf.put(f) }
    buf.array()
  }

  /** REAL container parse: validates the magic, walks the length-prefixed
    * frame list, returns each frame's bytes. Throws on truncation.
    */
  def gvidDecode(bytes: Array[Byte]): IndexedSeq[Array[Byte]] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    require(bytes.length >= 8, "GVID: truncated header")
    val magic = new Array[Byte](4); buf.get(magic)
    require(new String(magic, "US-ASCII") == "GVID", "GVID: bad magic")
    val n = buf.getInt()
    require(n >= 0, "GVID: negative frame count")
    (0 until n).map { i =>
      require(buf.remaining() >= 4, s"GVID: truncated frame $i length")
      val len = buf.getInt()
      require(len >= 0 && buf.remaining() >= len, s"GVID: truncated frame $i")
      val f = new Array[Byte](len); buf.get(f); f
    }
  }

  /** Synthetic video corpus: each doc gets `nFrames` PPM frames in a GVID
    * container; byte i of frame f's pixel stream is
    * ((29·id mod 256) + 11·f + i) mod 256 — closed form per (doc, frame).
    */
  def syntheticVideo(df: DataFrame, idCol: String,
      nFrames: Int, width: Int, height: Int): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].map { id =>
      val seed = ((id * 29) % 256).toInt
      val bytes = gvidEncode((0 until nFrames).map { f =>
        ppmEncode(width, height, i => (seed + 11 * f + i) % 256)
      })
      MediaRecord(id, bytes, MediaMeta("video/x-gvid", bytes.length.toLong))
    }
  }

  /** Per-frame features of a decoded video. */
  final case class FrameFeatures(doc_id: Long, frame_idx: Int, n_frames: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Strided frame sampling + decode + per-frame channel means — the video
    * analogue of mm02: parse the container, keep every `stride`-th frame
    * (the cheap temporal subsampling every video pipeline starts with),
    * decode only the kept frames. Shuffle-free; undecoded frames are
    * skipped as raw byte spans, never rasterized.
    */
  def sampleFrameFeatures(media: Dataset[MediaRecord],
      stride: Int): Dataset[FrameFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val frames = gvidDecode(r.content)
          frames.indices.collect { case f if f % stride == 0 =>
            val img = ppmDecode(frames(f))
            val n = img.width * img.height
            var sr = 0L; var sg = 0L; var sb = 0L
            var p = 0
            while (p < n) {
              sr += img.pixels(3 * p) & 0xFF
              sg += img.pixels(3 * p + 1) & 0xFF
              sb += img.pixels(3 * p + 2) & 0xFF
              p += 1
            }
            FrameFeatures(r.doc_id, f, frames.length,
              sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
          }
        }
      }
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

  /** Perceptual average-hash (aHash) over a decoded raster: integer luma
    * (r+g+b)/3 per pixel, bit p set iff n·luma_p > Σ luma (the
    * division-free form of "above the mean", exact in integers). Emitted
    * as an MSB-agnostic fixed-order bit STRING (p = 0 first) so an
    * engine-neutral oracle can rebuild it without 64-bit shift overflow.
    * Identical images (and only byte-identical lumas) collide with
    * certainty; a hamming-tolerant variant would band the 64 bits like
    * d03's SimHash — same join shape, not needed for the exact-dup gate.
    */
  final case class PerceptualHash(doc_id: Long, ahash: String)

  /** aHash bit string of one decoded raster (shared by the image and
    * per-video-frame paths).
    */
  private def aHashBits(img: PpmImage): String = {
    val n = img.width * img.height
    val luma = new Array[Long](n)
    var total = 0L
    var p = 0
    while (p < n) {
      luma(p) = ((img.pixels(3 * p) & 0xFF) +
        (img.pixels(3 * p + 1) & 0xFF) +
        (img.pixels(3 * p + 2) & 0xFF)) / 3
      total += luma(p)
      p += 1
    }
    val bits = new Array[Char](n)
    p = 0
    while (p < n) {
      bits(p) = if (n * luma(p) > total) '1' else '0'
      p += 1
    }
    new String(bits)
  }

  def extractAHash(media: Dataset[MediaRecord]): Dataset[PerceptualHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { r =>
          PerceptualHash(r.doc_id, aHashBits(ppmDecode(r.content)))
        }
      }
    }
  }

  /** Per-video perceptual signature: the ordered concatenation of every
    * frame's aHash — REAL container parse ([[gvidDecode]]) + REAL frame
    * decode + the same division-free integer aHash as [[extractAHash]].
    * Two videos collide iff every frame is perceptually identical in
    * order, which is exactly the re-encoded-duplicate class (container
    * bytes may differ; the decoded rasters don't). Shuffle-free
    * mapPartitions, one signature row per video.
    */
  final case class VideoSignature(doc_id: Long, sig: String, n_frames: Int)

  def extractVideoSignature(media: Dataset[MediaRecord]): Dataset[VideoSignature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val frames = gvidDecode(r.content)
          val sig = frames.map(f => aHashBits(ppmDecode(f))).mkString("|")
          VideoSignature(r.doc_id, sig, frames.length)
        }
      }
    }
  }

  /** Top-k most-SIMILAR video signatures by shared-frame count — the
    * temporal-shift-tolerant retrieval [[extractVideoSignature]]'s own
    * scaladoc names (band the FRAME hashes like d04's grams, instead of
    * exact-signature grouping): each distinct signature explodes to its
    * per-frame aHashes (set semantics — a frame repeated within one
    * video counts once), candidates share ≥ 1 frame hash (equi-join on
    * the 64-bit-equivalent frame key, never pairwise over signatures),
    * ranked by the number of DISTINCT shared frames descending. Partial
    * overlaps — trailers, re-cuts, frame-inserted re-uploads — surface
    * with shared < n_frames; exact re-encodes share all frames.
    *
    * Same collapse contract as [[Similarity.signatureTopK]]: `sigs` is
    * one row per DISTINCT signature (on the planted corpus ~231 rows at
    * any N — the doc→signature collapse happens upstream as a plain
    * groupBy, so the frame join is bounded by signature-space structure,
    * not corpus size). Ties break (shared desc, neighbor string asc).
    */
  def sharedFrameTopK(spark: SparkSession, sigs: DataFrame, sigCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = sigs.select(col(sigCol).as("sig"))
      .select(col("sig"), explode(split(col("sig"), "\\|")).as("fh"))
      .distinct()
    val w = Window.partitionBy("sig")
      .orderBy(col("shared_frames").desc, col("neighbor_sig"))
    frames.as("a").join(frames.as("b"),
        col("a.fh") === col("b.fh") && col("a.sig") =!= col("b.sig"))
      .groupBy(col("a.sig").as("sig"), col("b.sig").as("neighbor_sig"))
      .agg(count(lit(1)).as("shared_frames")) // (sig, fh) distinct ⇒ exact
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("sig"), col("neighbor_sig"), col("rank"),
        col("shared_frames"))
  }
}
