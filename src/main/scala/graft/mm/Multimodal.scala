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
 * tested; the codec itself is a clearly-marked deterministic STUB (image /
 * audio libraries are not available in this container). Swapping in a real
 * decoder changes only the function body marked STUB below — the Spark-side
 * contract (mapPartitions over Arrow-sized batches, metadata passthrough,
 * deterministic output) is unchanged.
 */
object Multimodal {

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
   * Decode + feature-extract. STUB DECODE: a real implementation would parse
   * `payload` with an image codec; here the "pixels" are the raw bytes
   * (format "raw8" = 1 byte/pixel luma), which keeps every downstream
   * statistic real and deterministic. The mapPartitions shape (one iterator
   * pass, no per-row JVM object churn beyond the row itself, metadata
   * carried through) is exactly what a Pandas-UDF/mapInPandas deployment
   * uses on a real cluster.
   */
  def imageFeatures(media: Dataset[MediaRow], featureDim: Int = 16): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.filter(_.kind == "image").map { m =>
        // ---- STUB: decode(payload) -> luma plane (identity for raw8) ----
        val pixels = m.payload
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
        ImageFeatures(m.media_id, m.width, m.height, mean, hist)
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
