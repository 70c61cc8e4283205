package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs. The Spark-side machinery
  * (schema, batched per-partition iteration, metadata extraction, frame
  * sampling signature) is real and tested; the actual media decode is a
  * STUB — this container has no image/audio codecs, so `decodeStub`
  * derives deterministic fake dimensions from the payload bytes. Swap
  * `decodeStub` for a real decoder (e.g. javax.imageio / ffmpeg via a
  * Pandas-UDF-style batch worker) without touching the plumbing.
  */
object Multimodal {

  final case class MediaMeta(n_bytes: Long, width: Int, height: Int, frames: Int)

  /** STUB decode ??? — deterministic fake: dimensions derived from byte
    * length and first byte. Replace with a real codec at deploy time. */
  def decodeStub(payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    val head = if (payload.nonEmpty) payload(0) & 0xFF else 0
    MediaMeta(n,
      width = (n % 640).toInt + 1,
      height = (n % 480).toInt + 1,
      frames = head % 7 + 1)
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
        // per-partition init hook (real decoder would load its codec here)
        it.map { case (k, payload) =>
          val m = decodeStub(payload)
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
