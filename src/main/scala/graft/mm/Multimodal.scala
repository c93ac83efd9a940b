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

/**
 * Multimodal-column plumbing: schema, batch shape, partitioning and the
 * decode/feature/resize/frame-sample operator signatures are real and
 * tested. Image decode is REAL for the formats the JDK ships codecs for
 * (PNG/JPEG/GIF/BMP via `javax.imageio` — no external jars); `raw8` stays
 * as the deterministic test format, and audio/video codecs remain
 * clearly-marked STUBs (no codec libraries in this container). The
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
        val stride = scale * scale
        val out = Array.tabulate[Byte]((m.payload.length + stride - 1) / stride)(j =>
          m.payload(j * stride))
        m.copy(payload = out, width = m.width / scale, height = m.height / scale)
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
