package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column handling: media (image/audio/video) as opaque BINARY
  * payloads with a typed metadata struct, plus a per-partition batch decode
  * operator.
  *
  * Data model: `asset(asset_id BIGINT, bytes BINARY, meta STRUCT<mime, ...>)`
  * — the payload stays an opaque blob through the engine (scan, shuffle,
  * store), exactly like the reference keeps Postgres `bytea` contract code
  * opaque end to end (`code.code`/`sources.content`, config.py:8,92;
  * memoryview→bytes main.py:100-101). Only the decode operator looks inside.
  *
  * Decode runs as typed `mapPartitions` — the Scala analog of a Pandas
  * `mapInPandas` UDF: the engine hands each task one ITERATOR over its
  * partition (the batch shape), per-partition setup (codec init, model load)
  * happens once outside the row loop, and output is again a typed Dataset
  * the optimizer can keep planning over. The decoder below is a clearly
  * marked deterministic STUB (this container ships no image/audio codecs);
  * the Spark-side plumbing — schema, batch shape, partition-level reuse —
  * is the real, tested artifact.
  */
object Multimodal {

  final case class Asset(asset_id: Long, bytes: Array[Byte], mime: String)

  final case class AssetFeatures(
      asset_id: Long,
      n_bytes: Int,
      checksum: Long,
      width: Int,   // stub-decoded "dimensions"
      height: Int,
      frames: Int)  // stub frame-sample count

  /** Build an asset table from `documents` (text bytes standing in for media
    * payloads — same opaque-binary plumbing, container has no codecs).
    */
  def assets(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("asset_id"),
      col("text").cast("binary").as("bytes"),
      struct(
        lit("text/plain").as("mime"),
        col("n_chars").as("n_chars"),
        col("source").as("source")).as("meta"))

  /** Frame sampling over decoded features: every k-th frame index of each
    * asset as ROWS (the video analog of n-gram explode — downstream
    * per-frame work then parallelizes over frames, not assets, which is
    * what keeps one long video from pinning a task). Pure relational
    * explode of a stepped sequence; composes with [[decodeFeatures]].
    */
  def sampleFrames(features: DataFrame, everyK: Int): DataFrame =
    features.select(col("asset_id"), col("frames"),
      explode(sequence(lit(0), col("frames") - 1, lit(everyK)))
        .as("frame_idx"))

  final case class FrameDigest(
      asset_id: Long, frame_idx: Int, frame_md5: String)

  /** Per-frame content digests through the SAME typed mapPartitions batch
    * shape as [[decodeFeatures]]: each asset's payload is cut into
    * fixed-size frames (a real video decoder would emit decoded frame
    * buffers here; the fixed-width byte slice is the codec-free stand-in)
    * and each frame is fingerprinted with md5 — the unit of frame-level
    * dedup (q127). The digest is a pure function of the payload bytes, so
    * the DuckDB oracle replays this operator exactly (via VARCHAR
    * substring — byte-identical on ASCII corpora; the oracle engine has
    * no BLOB slicing, while this Spark side is byte-correct for any
    * payload). Per-partition setup owns the MessageDigest instance — the
    * one-time-codec-init slot, reused across the whole batch.
    */
  def frameDigests(
      assets: Dataset[Asset], frameBytes: Int = 64): Dataset[FrameDigest] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.flatMap { a =>
        val n = (a.bytes.length + frameBytes - 1) / frameBytes
        (0 until n).iterator.map { i =>
          val from = i * frameBytes
          val until = math.min(from + frameBytes, a.bytes.length)
          md.reset()
          md.update(a.bytes, from, until - from)
          FrameDigest(a.asset_id, i,
            md.digest().map("%02x".format(_)).mkString)
        }
      }
    }
  }

  /** STUB decode: a real implementation would parse the payload with an
    * image/audio codec here; this fake derives deterministic "dimensions"
    * and "frame count" from a CRC32 of the bytes so tests have stable
    * expectations. Everything around the stub — the per-partition batch
    * loop, the one-time setup slot, the typed output — is the production
    * shape.
    */
  def decodeFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      // per-partition setup (the expensive codec/model init goes here, once)
      val crc = new java.util.zip.CRC32
      batch.map { a =>
        crc.reset()
        crc.update(a.bytes)
        val c = crc.getValue
        AssetFeatures(
          a.asset_id,
          n_bytes = a.bytes.length,
          checksum = c,
          width = (c % 640).toInt + 1,
          height = (c % 480).toInt + 1,
          frames = (a.bytes.length / 64) + 1)
      }
    }
  }
}
