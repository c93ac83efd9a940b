package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed row of the multimodal media table: payload is an opaque binary
 * column + typed metadata, the layout a 100 TB multimodal corpus uses
 * (media bytes never parsed by Catalyst; metadata prunable/pushable). */
final case class MediaRow(
    media_id: Long,
    kind: String,          // "image" | "audio" | "video"
    payload: Array[Byte],
    format: String,        // "png", "wav", ...
    width: Int, height: Int,
    duration_ms: Long)

final case class ImageFeatures(
    media_id: Long,
    width: Int, height: Int,
    mean_luma: Double,
    feature: Array[Float])

final case class AudioFeatures(
    media_id: Long,
    sample_rate: Double,
    n_samples: Long,
    rms: Double,
    zcr: Double)

/**
 * Multimodal-column plumbing: schema, batch shape, partitioning and the
 * decode/feature/resize/frame-sample operator signatures are real and
 * tested. Image decode is REAL for the formats the JDK ships codecs for
 * (PNG/JPEG/GIF/BMP via `javax.imageio` — no external jars), and audio
 * decode is REAL for WAV/PCM (`javax.sound.sampled`, also JDK-shipped);
 * `raw8`/`rawpcm8` stay as the deterministic test formats, and compressed
 * audio + video codecs remain clearly-marked STUBs (no codec libraries in
 * this container). The
 * Spark-side contract (mapPartitions over batches, metadata passthrough,
 * deterministic output) is identical across all of them.
 */
object Multimodal {

  /** Decoded luma plane + true dimensions. */
  final case class Decoded(pixels: Array[Byte], width: Int, height: Int)

  /** REAL decode for JDK-supported image formats; `raw8` = identity (1
   * byte/pixel luma, the deterministic test format). Luma = BT.601
   * (77R + 150G + 29B) >> 8 — integer form, bit-stable across platforms. */
  def decodeLuma(m: MediaRow): Decoded = m.format match {
    case "raw8" => Decoded(m.payload, m.width, m.height)
    case "png" | "jpg" | "jpeg" | "gif" | "bmp" =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
      require(img != null, s"media_id=${m.media_id}: undecodable ${m.format} payload")
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val l = (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) + 29 * (rgb & 0xff)) >> 8
          out(y * w + x) = l.toByte
          x += 1
        }
        y += 1
      }
      Decoded(out, w, h)
    case other =>
      // ---- STUB: no codec for this format in the container ----
      throw new UnsupportedOperationException(s"no decoder for format=$other")
  }

  /** Decoded mono audio: samples normalized to [-1, 1] + sample rate. */
  final case class DecodedAudio(samples: Array[Float], sampleRate: Float)

  /** REAL decode for WAV/RIFF via `javax.sound.sampled` (ships with the
   * JDK — no external jars): PCM 8-bit unsigned and 16-bit signed, any
   * channel count (channels average to mono). `rawpcm8` = headerless
   * unsigned 8-bit mono @ 8 kHz, the deterministic test format. Compressed
   * audio (mp3/ogg/aac) and video stay honest stubs — no codecs in this
   * container. */
  def decodeAudio(m: MediaRow): DecodedAudio = m.format match {
    case "rawpcm8" =>
      DecodedAudio(m.payload.map(b => ((b & 0xff) - 128) / 128.0f), 8000f)
    case "wav" =>
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(m.payload))
      val fmt = in.getFormat
      val bytes = in.readAllBytes()
      in.close()
      val ch = fmt.getChannels
      val enc = fmt.getEncoding
      import javax.sound.sampled.AudioFormat.Encoding
      val out = fmt.getSampleSizeInBits match {
        case 8 if enc == Encoding.PCM_UNSIGNED =>
          Array.tabulate(bytes.length / ch) { i =>
            var acc = 0f; var c = 0
            while (c < ch) { acc += ((bytes(i * ch + c) & 0xff) - 128) / 128.0f; c += 1 }
            acc / ch
          }
        case 16 if enc == Encoding.PCM_SIGNED =>
          val order = if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN
          val sb = java.nio.ByteBuffer.wrap(bytes).order(order).asShortBuffer()
          Array.tabulate(sb.remaining() / ch) { i =>
            var acc = 0f; var c = 0
            while (c < ch) { acc += sb.get(i * ch + c) / 32768.0f; c += 1 }
            acc / ch
          }
        case bits =>
          throw new UnsupportedOperationException(
            s"media_id=${m.media_id}: unsupported WAV encoding $enc/${bits}bit")
      }
      DecodedAudio(out, fmt.getSampleRate)
    case other =>
      // ---- STUB: no codec for compressed audio in the container ----
      throw new UnsupportedOperationException(s"no audio decoder for format=$other")
  }

  /** Deterministic fake corpus for tests: payload bytes derived from id. */
  def syntheticMedia(spark: SparkSession, n: Long, seed: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val h = graft.gen.GraphGen.mix64(seed, i)
      val w = 16 + (Math.floorMod(h, 48L)).toInt
      val ht = 16 + (Math.floorMod(h >>> 8, 48L)).toInt
      val payload = Array.tabulate[Byte](w * ht) { p =>
        (graft.gen.GraphGen.mix64(seed, i, p.toLong) & 0xff).toByte
      }
      MediaRow(i, "image", payload, "raw8", w, ht, 0L)
    }
  }

  /**
   * Decode + feature-extract over the luma plane ([[decodeLuma]]: real
   * codec for PNG/JPEG/GIF/BMP, identity for raw8). The mapPartitions shape
   * (one iterator pass, no per-row JVM object churn beyond the row itself,
   * metadata carried through) is exactly what a Pandas-UDF/mapInPandas
   * deployment uses on a real cluster.
   */
  def imageFeatures(media: Dataset[MediaRow], featureDim: Int = 16): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.filter(_.kind == "image").map { m =>
        val dec = decodeLuma(m)
        val pixels = dec.pixels
        var s = 0L
        var i = 0
        while (i < pixels.length) { s += (pixels(i) & 0xff); i += 1 }
        val mean = if (pixels.length == 0) 0.0 else s.toDouble / pixels.length
        // block-histogram feature: featureDim equal-width byte-value bins
        val hist = new Array[Float](featureDim)
        i = 0
        while (i < pixels.length) {
          hist(((pixels(i) & 0xff) * featureDim) / 256) += 1f
          i += 1
        }
        if (pixels.length > 0) { var j = 0; while (j < featureDim) { hist(j) /= pixels.length; j += 1 } }
        ImageFeatures(m.media_id, dec.width, dec.height, mean, hist)
      }
    }
  }

  /** Per-clip audio features over the decoded mono samples ([[decodeAudio]]:
   * real WAV codec, identity for rawpcm8) — same mapPartitions batch shape
   * as [[imageFeatures]]. rms = √(Σx²/n); zcr = sign changes / (n-1). */
  def audioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.filter(_.kind == "audio").map { m =>
        val dec = decodeAudio(m)
        val xs = dec.samples
        var sumSq = 0.0
        var zc = 0L
        var i = 0
        while (i < xs.length) {
          sumSq += xs(i).toDouble * xs(i)
          if (i > 0 && (xs(i) >= 0) != (xs(i - 1) >= 0)) zc += 1
          i += 1
        }
        val rms = if (xs.isEmpty) 0.0 else math.sqrt(sumSq / xs.length)
        val zcr = if (xs.length < 2) 0.0 else zc.toDouble / (xs.length - 1)
        AudioFeatures(m.media_id, dec.sampleRate.toDouble, xs.length.toLong, rms, zcr)
      }
    }
  }

  /** Resize stub: recomputes metadata + a deterministic subsample of the
   * payload (every stride-th byte) — the real version swaps the STUB body
   * for a codec call; schema/partitioning identical. */
  def resize(media: Dataset[MediaRow], maxSide: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      val side = math.max(m.width, m.height)
      val scale = math.max(1, (side + maxSide - 1) / math.max(1, maxSide))
      if (scale <= 1) m
      else {
        // ---- STUB: real resize = codec decode + area-filter + re-encode ----
        // 2D point-sample so the raw8 invariant payload.length == w×h
        // survives the resize (a 1D stride subsample breaks it under
        // integer division); non-raw payloads clamp into range.
        val w = math.max(1, m.width / scale)
        val h = math.max(1, m.height / scale)
        val out =
          if (m.payload.isEmpty) m.payload
          else Array.tabulate[Byte](w * h) { j =>
            val src = (j / w) * scale * m.width + (j % w) * scale
            m.payload(math.min(src, m.payload.length - 1))
          }
        m.copy(payload = out, width = w, height = h)
      }
    }
  }

  /** Frame-sample stub for video rows: emits every k-th "frame" (fixed-size
   * payload slice) as an image row — the fan-out/partitioning pattern of
   * real frame extraction. */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int, frameBytes: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      if (m.kind != "video" || frameBytes <= 0) Iterator.empty
      else {
        val nFrames = m.payload.length / frameBytes
        (0 until nFrames by math.max(1, everyK)).iterator.map { f =>
          // ---- STUB: real impl = container demux + keyframe decode ----
          val slice = java.util.Arrays.copyOfRange(m.payload, f * frameBytes, (f + 1) * frameBytes)
          MediaRow(m.media_id * 1000000L + f, "image", slice, "raw8",
            m.width, m.height, 0L)
        }
      }
    }
  }
}
