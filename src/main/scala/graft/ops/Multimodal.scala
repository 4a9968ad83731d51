package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode/feature-extract/
  * frame-sample stages.
  *
  * The decode kernels are STUBS (this container has no image/audio
  * libraries — see the builder brief): `decodeStub` parses our
  * deterministic fake header and derives a fake feature vector from
  * payload bytes. Everything Spark-side is real and tested: schema,
  * typed Dataset stages, partition-preserving mapPartitions batch
  * shape (one decoder init per partition, the Pandas-UDF-equivalent
  * batching discipline), and the explode shape for frame sampling.
  */
object Multimodal {

  /** Opaque media row. `payload` layout (fake, deterministic):
    * magic "GMM0" | kind byte | width int32 BE | height int32 BE |
    * nFrames int32 BE | body bytes. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long, kind: String, width: Int, height: Int,
      n_frames: Int, feature: Array[Float], decode_error: String)

  val Kinds = Array("image", "audio", "video")

  /** Deterministic fake media generator. Header fields are simple
    * modular arithmetic of the id (NOT a PRNG) so the decoded metadata
    * is independently recomputable by the driver's DuckDB oracle —
    * m1/m2 are hash-compared end to end, not rows-only. Every 50th+7
    * row gets a corrupted magic, planting the error-as-row path. */
  def gen(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0L, n).map { id =>
      val kind = Kinds((id % 3).toInt)
      val w = (16 + (id * 37) % 512).toInt
      val h = (16 + (id * 73) % 512).toInt
      val frames = if (kind == "video") (1 + (id * 91) % 240).toInt else 1
      val bodyLen = (64 + (id * 29) % 192).toInt
      val body = Array.tabulate[Byte](bodyLen)(i => ((id * 131 + i * 7) % 256).toByte)
      val magic = if (id % 50 == 7) "GMMX" else "GMM0" // planted bad rows
      val bb = java.nio.ByteBuffer.allocate(4 + 1 + 12 + body.length)
      bb.put(magic.getBytes("US-ASCII")).put(kind.charAt(0).toByte)
        .putInt(w).putInt(h).putInt(frames).put(body)
      MediaRow(id, kind, bb.array())
    }
  }

  /** STUB decode: header parse is real; the "pixel decode" is a
    * deterministic hash-derived feature vector standing in for a
    * real image/audio decoder (`???` seam, clearly marked). */
  private def decodeStub(payload: Array[Byte]): Either[String, (Int, Int, Int, Array[Float])] = {
    if (payload == null || payload.length < 17 ||
        payload(0) != 'G' || payload(1) != 'M' || payload(2) != 'M' || payload(3) != '0')
      return Left("bad magic")
    val bb = java.nio.ByteBuffer.wrap(payload, 5, 12)
    val w = bb.getInt; val h = bb.getInt; val frames = bb.getInt
    if (w <= 0 || h <= 0 || frames <= 0) return Left("bad header")
    // --- real decoder seam: replace from here ---------------------
    // val pixels = ??? // e.g. javax.imageio / ffmpeg — not in container
    // deterministic fake: 8-dim byte-histogram feature from the body
    val feat = new Array[Float](8)
    var i = 17
    while (i < payload.length) { feat((payload(i) & 0xff) % 8) += 1f; i += 1 }
    // --------------------------------------------------------------
    Right((w, h, frames, feat))
  }

  /** Feature extraction as a partition-batched typed stage: the
    * decoder (in real life: native lib handle) is initialized once per
    * partition, rows stream through — the mapInPandas batch shape in
    * Dataset form. Decode failures are error-as-row, never task
    * failures (policy from ocr_parallel_ui.py:33-34). */
  def features(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (lazy native handle)
      it.map { m =>
        decodeStub(m.payload) match {
          case Right((w, h, f, feat)) =>
            MediaFeatures(m.media_id, m.kind, w, h, f, feat, null)
          case Left(err) =>
            MediaFeatures(m.media_id, m.kind, -1, -1, -1, Array.empty, err)
        }
      }
    }
  }

  /** Frame sampling for video rows: every `step`-th frame index as an
    * exploded (media_id, frame_idx) table — pure built-ins. */
  def frameSample(features: DataFrame, step: Int): DataFrame =
    features.filter(col("kind") === "video" && col("decode_error").isNull)
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))).as("frame_idx"))
}
