package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (LLM-pipeline north star): image/audio/video
  * as opaque `binary` payloads with typed metadata, processed by
  * per-partition batch operators (the Scala analog of Python's
  * `mapInPandas` — one iterator per partition, so a real decoder would
  * amortize native-library init across the batch, never per row).
  *
  * The DECODERS ARE STUBS — this container has no image/audio codecs, so
  * decode parses a deterministic fake header and features derive from a
  * byte histogram. The Spark-side contract (schema, binary shuffle
  * behavior, batched partition processing, typed output) is real and
  * tested; swapping in javacpp/ffmpeg is a local change inside
  * `decodeBatch`.
  */
object Multimodal {

  /** A media row: payload stays opaque binary end-to-end. */
  case class Media(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded metadata + a fixed-width feature vector. */
  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, features: Array[Double])

  /** Fake 8-byte header: [w_hi, w_lo, h_hi, h_lo, ...] — stands in for a
    * real container header so tests exercise header-vs-payload splitting.
    */
  def encodeFakeHeader(width: Int, height: Int, body: Array[Byte]): Array[Byte] =
    Array[Byte](
      ((width >> 8) & 0xff).toByte, (width & 0xff).toByte,
      ((height >> 8) & 0xff).toByte, (height & 0xff).toByte,
      0, 0, 0, 0) ++ body

  /** Batched decode + feature extraction. STUB decode: header parse +
    * 16-bin byte histogram (deterministic); a real implementation replaces
    * only the body of this function.
    */
  def decodeAndFeaturize(media: Dataset[Media]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // real codecs would init native handles HERE, once per partition
      rows.map { m =>
        val p = m.payload
        val (w, h) =
          if (p.length >= 8)
            (((p(0) & 0xff) << 8) | (p(1) & 0xff),
             ((p(2) & 0xff) << 8) | (p(3) & 0xff))
          else (0, 0)
        val hist = new Array[Double](16)
        var i = 8
        while (i < p.length) { hist((p(i) & 0xff) >> 4) += 1.0; i += 1 }
        val n = math.max(p.length - 8, 1).toDouble
        MediaFeatures(m.media_id, m.kind, p.length.toLong, w, h,
          hist.map(_ / n))
      }
    }
  }

  /** Frame sampling for video payloads: every `stride`-th frame offset
    * given a (stubbed) fixed frame size — the partition/explode shape of
    * real frame extraction.
    */
  def sampleFrameOffsets(media: DataFrame, frameBytes: Int = 256,
      stride: Int = 10): DataFrame =
    media
      .withColumn("n_frames",
        floor((length(col("payload")) - lit(8)) / lit(frameBytes)))
      // payloads with zero complete frames must yield NO sampled frames:
      // without this filter, sequence(0, greatest(n-1, 0)) still emits
      // frame_idx 0 whose byte_offset points past the payload's frame data
      .filter(col("n_frames") > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select(col("media_id"), col("frame_idx"),
        (lit(8) + col("frame_idx") * lit(frameBytes)).as("byte_offset"))

  /** Batched resize to `targetW` × `targetH`. STUB resample:
    * nearest-neighbor over the fake raster (body byte at the scaled
    * offset) — deterministic, replaces with a real scaler inside the
    * partition loop. Output payload carries the rewritten header, so
    * resize composes with [[decodeAndFeaturize]] (the production
    * decode→resize→featurize chain shape).
    */
  def resize(media: Dataset[Media], targetW: Int, targetH: Int): Dataset[Media] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val p = m.payload
        val (w, h) =
          if (p.length >= 8)
            (math.max(((p(0) & 0xff) << 8) | (p(1) & 0xff), 1),
             math.max(((p(2) & 0xff) << 8) | (p(3) & 0xff), 1))
          else (1, 1)
        val body = p.drop(8)
        val out = new Array[Byte](targetW * targetH)
        if (body.nonEmpty) {
          var y = 0
          while (y < targetH) {
            var x = 0
            while (x < targetW) {
              val sx = x * w / targetW
              val sy = y * h / targetH
              out(y * targetW + x) = body((sy * w + sx) % body.length)
              x += 1
            }
            y += 1
          }
        }
        Media(m.media_id, m.kind, encodeFakeHeader(targetW, targetH, out))
      }
    }
  }

  /** Cosine-ready embedding join: attach media features to the embeddings
    * table shape (media features become an ARRAY<DOUBLE> column usable by
    * [[Similarity]] operators — the multimodal→vector handoff).
    */
  def featuresAsEmbeddings(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF().select(
      col("media_id").as("vec_id"),
      col("features").as("embedding"),
      col("kind"))
}
