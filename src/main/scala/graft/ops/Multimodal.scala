package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs. The Spark-side machinery
  * (schema, batched per-partition iteration, metadata extraction, frame
  * sampling signature) is real and tested. Decode is REAL for the formats
  * a pure JVM can parse with zero external deps — BMP (BITMAPINFOHEADER)
  * and PCM WAV headers, dispatched by magic bytes — and a loudly-
  * documented deterministic STUB for everything else (this container
  * ships no image/audio codecs; swap `decodeStub` for e.g. javax.imageio
  * / ffmpeg via a Pandas-UDF-style batch worker without touching the
  * plumbing).
  */
object Multimodal {

  final case class MediaMeta(n_bytes: Long, width: Int, height: Int, frames: Int)

  /** STUB decode ??? — deterministic fake: dimensions derived from byte
    * length and first byte. Replace with a real codec at deploy time.
    * Reached only for payloads [[decode]] has no real parser for. */
  def decodeStub(payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    val head = if (payload.nonEmpty) payload(0) & 0xFF else 0
    MediaMeta(n,
      width = (n % 640).toInt + 1,
      height = (n % 480).toInt + 1,
      frames = head % 7 + 1)
  }

  /** Magic-byte dispatch: real header parse for BMP/WAV, stub otherwise. */
  def decode(payload: Array[Byte]): MediaMeta =
    if (isBmp(payload)) decodeBmp(payload)
    else if (isWav(payload)) decodeWav(payload)
    else decodeStub(payload)

  private def i32le(p: Array[Byte], o: Int): Int =
    (p(o) & 0xFF) | ((p(o + 1) & 0xFF) << 8) | ((p(o + 2) & 0xFF) << 16) | ((p(o + 3) & 0xFF) << 24)
  private def u16le(p: Array[Byte], o: Int): Int =
    (p(o) & 0xFF) | ((p(o + 1) & 0xFF) << 8)

  /** BMP detection requires the full BITMAPINFOHEADER shape, not just the
    * 2-byte magic: header size == 40 @14, planes == 1 @26, a legal bpp
    * @28, and strictly positive dimensions. A text payload that happens
    * to start with "BM" (the gate corpus mixes raw UTF-8 payloads in)
    * must NOT be routed to the real parser — the oracle predicts the stub
    * formula for it, and a corrupt header must not emit garbage
    * dimensions. */
  def isBmp(p: Array[Byte]): Boolean =
    p.length >= 54 && p(0) == 'B'.toByte && p(1) == 'M'.toByte &&
      i32le(p, 14) == 40 && u16le(p, 26) == 1 &&
      (u16le(p, 28) match {
        case 1 | 4 | 8 | 16 | 24 | 32 => true
        case _ => false
      }) &&
      i32le(p, 18) > 0 && i32le(p, 22) != 0 && i32le(p, 22) != Int.MinValue

  /** Real BMP parse (BITMAPINFOHEADER): width int32le @18, height int32le
    * @22 (negative = top-down rows; dimension is the magnitude).
    * [[isBmp]] has already validated width > 0 and |height| > 0. */
  def decodeBmp(p: Array[Byte]): MediaMeta =
    MediaMeta(p.length.toLong, width = i32le(p, 18),
      height = math.abs(i32le(p, 22)), frames = 1)

  def isWav(p: Array[Byte]): Boolean =
    p.length >= 44 &&
      p(0) == 'R'.toByte && p(1) == 'I'.toByte && p(2) == 'F'.toByte && p(3) == 'F'.toByte &&
      p(8) == 'W'.toByte && p(9) == 'A'.toByte && p(10) == 'V'.toByte && p(11) == 'E'.toByte

  /** Real PCM WAV parse (RIFF chunk walk): width := sample rate,
    * height := channels, frames := sample frames (data bytes / block
    * align) — the natural audio analog of the image dimensions.
    *
    * The walk never trusts a declared chunk size: `off` advances in LONG
    * arithmetic and the loop stops at the first chunk whose declared size
    * does not fit the payload (a truncated 32-bit size like 0xFFFFFFF8
    * would otherwise advance by zero — an infinite loop pinning an
    * executor task on one adversarial/corrupt doc — and a large positive
    * size would overflow `off` negative and throw). Whatever well-formed
    * prefix was walked still yields partial metadata. */
  def decodeWav(p: Array[Byte]): MediaMeta = {
    var off = 12L
    var channels = 0
    var sampleRate = 0
    var blockAlign = 0
    var dataLen = 0L
    var malformed = false
    while (!malformed && off + 8 <= p.length) {
      val o = off.toInt
      val id = new String(p, o, 4, "US-ASCII")
      val sz = i32le(p, o + 4).toLong & 0xFFFFFFFFL
      if (off + 8 + sz > p.length) {
        // declared size exceeds the payload: stop on the malformed chunk
        // (a final "data" chunk on a truncated file still counts its
        // declared length toward frames only if it fits — it doesn't, so
        // it is dropped along with everything after it)
        malformed = true
      } else {
        if (id == "fmt " && off + 24 <= p.length) {
          channels = u16le(p, o + 10)
          sampleRate = i32le(p, o + 12)
          blockAlign = u16le(p, o + 20)
        } else if (id == "data") dataLen = sz
        off += 8L + sz + (sz & 1L) // chunks are word-aligned
      }
    }
    MediaMeta(p.length.toLong, width = sampleRate, height = channels,
      frames = if (blockAlign == 0) 0 else (dataLen / blockAlign).toInt)
  }

  /** Deterministic minimal 24bpp BMP (54-byte BITMAPINFOHEADER, rows
    * padded to 4 bytes) — the test-corpus payload generator for the real
    * decode path. Size = 54 + h * ((3w + 3) / 4 * 4). */
  def syntheticBmp(w: Int, h: Int, seed: Long): Array[Byte] = {
    require(w > 0 && h > 0)
    val stride = (3 * w + 3) / 4 * 4
    val size = 54 + h * stride
    val p = new Array[Byte](size)
    def put32(o: Int, v: Int): Unit = {
      p(o) = v.toByte; p(o + 1) = (v >> 8).toByte
      p(o + 2) = (v >> 16).toByte; p(o + 3) = (v >> 24).toByte
    }
    p(0) = 'B'.toByte; p(1) = 'M'.toByte
    put32(2, size); put32(10, 54) // data offset
    put32(14, 40) // BITMAPINFOHEADER
    put32(18, w); put32(22, h)
    p(26) = 1 // planes
    p(28) = 24 // bpp
    put32(34, h * stride) // image size
    var i = 54
    var x = seed
    while (i < size) { // xorshift pixel bytes: deterministic, high entropy
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      p(i) = x.toByte
      i += 1
    }
    p
  }

  /** Deterministic 16-bit PCM WAV with the canonical 44-byte header. */
  def syntheticWav(sampleRate: Int, channels: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val blockAlign = channels * 2
    val dataLen = nFrames * blockAlign
    val p = new Array[Byte](44 + dataLen)
    def put32(o: Int, v: Int): Unit = {
      p(o) = v.toByte; p(o + 1) = (v >> 8).toByte
      p(o + 2) = (v >> 16).toByte; p(o + 3) = (v >> 24).toByte
    }
    def put16(o: Int, v: Int): Unit = { p(o) = v.toByte; p(o + 1) = (v >> 8).toByte }
    def tag(o: Int, s: String): Unit = s.getBytes("US-ASCII").zipWithIndex
      .foreach { case (b, i) => p(o + i) = b }
    tag(0, "RIFF"); put32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); put32(16, 16); put16(20, 1) // PCM
    put16(22, channels); put32(24, sampleRate)
    put32(28, sampleRate * blockAlign); put16(32, blockAlign); put16(34, 16)
    tag(36, "data"); put32(40, dataLen)
    var i = 44
    var x = seed
    while (i < p.length) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      p(i) = x.toByte
      i += 1
    }
    p
  }

  /** Attach a binary payload column (for the gate: the utf-8 text bytes
    * stand in for real media payloads). */
  def withPayload(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("payload", col(textCol).cast("binary"))

  /** Extract metadata per payload via batched per-partition iteration —
    * the mapInPandas-shaped path (iterator-of-batches in, iterator out),
    * so a real decoder amortizes model/codec init per partition. */
  def extractMeta(docs: DataFrame, keyCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(keyCol).as("key"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init hook (a heavier codec would load here)
        it.map { case (k, payload) =>
          val m = decode(payload)
          (k, m.n_bytes, m.width, m.height, m.frames)
        }
      }
      .toDF("key", "n_bytes", "width", "height", "frames")
  }

  /** Frame sampling signature: every `stride`-th byte as a fake "frame"
    * fingerprint — demonstrates the (payload -> array<binary>) shape a
    * video frame-sampler produces. */
  def sampleFrames(docs: DataFrame, keyCol: String, stride: Int): DataFrame =
    docs.select(col(keyCol).as("key"),
      expr(s"transform(sequence(1, greatest(octet_length(payload) div $stride, 0)), " +
        s"i -> substring(payload, (i - 1) * $stride + 1, 1))").as("frames"))

  /** Feature extraction: payload -> dense Array[Float] embedding, the
    * (binary -> vector) shape an image/audio encoder produces, on the
    * same batched per-partition seam as extractMeta (model weights load
    * once per partition in the init hook). STUB model: an L2-normalized
    * dim-bucket byte histogram — deterministic, so the downstream ANN /
    * embedding-dedup operators compose with it in tests. */
  def featureExtract(docs: DataFrame, keyCol: String, dim: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val d = dim
    docs.select(col(keyCol).as("key"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init hook (real encoder would load weights here)
        it.map { case (k, payload) =>
          val acc = new Array[Float](d)
          var i = 0
          while (i < payload.length) { acc((payload(i) & 0xFF) % d) += 1f; i += 1 }
          var norm = 0.0
          var j = 0
          while (j < d) { norm += acc(j).toDouble * acc(j); j += 1 }
          val s = if (norm == 0) 1.0 else math.sqrt(norm)
          (k, acc.map(x => (x / s).toFloat).toSeq)
        }
      }
      .toDF("key", "embedding")
  }

  /** Resize: payload -> resized payload + updated metadata, the
    * (binary -> binary) transform shape. STUB resample: byte decimation
    * to ceil(n · (w·h)/(640·480)) bytes — deterministic; a real codec
    * swaps in behind the same signature. */
  def resize(docs: DataFrame, keyCol: String, w: Int, h: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val targetW = w
    val targetH = h
    docs.select(col(keyCol).as("key"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (k, payload) =>
          val n = payload.length
          val target = math.max(1, math.min(n,
            math.ceil(n.toDouble * (targetW.toLong * targetH) / (640.0 * 480.0)).toInt))
          val out = new Array[Byte](if (n == 0) 0 else target)
          var i = 0
          while (n > 0 && i < target) {
            out(i) = payload((i.toLong * n / target).toInt)
            i += 1
          }
          (k, out, targetW, targetH)
        }
      }
      .toDF("key", "payload", "width", "height")
  }
}
