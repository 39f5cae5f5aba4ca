package graft.queries

import graft.{Q, Tables}
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Oracle-checked slice of the multimodal pipeline: the opaque-binary asset
  * table ([[Multimodal.assets]]) queried through SQL-expressible features
  * (byte length, content digest, typed metadata projection). The
  * non-SQL-expressible decode stub is exercised by the ScalaTest suite.
  */
object MultimodalQ {

  def all: Seq[Q] = Seq(q48MultimodalMeta, q78FrameSample, q127FrameDedup)

  /** Frame-level exact dedup across assets — the video/image analog of
    * q31's content-hash dedup, run through the REAL batch-decode shape:
    * assets → [[Multimodal.frameDigests]] (typed mapPartitions emitting
    * one md5 per fixed-size frame) → duplicated fingerprints with their
    * occurrence and asset spread and a keep-first representative. A reused
    * intro/boilerplate frame shows up as one fingerprint with n_assets >
    * 1; within-asset repetition (a frozen frame) as n_frames > n_assets.
    * Like q78, the oracle hash-checks the mapPartitions operator itself:
    * the frame digest is a pure byte-slice function the SQL twin mirrors.
    * Twin replay bound: the oracle unrolls frame indices from a
    * range(0, 4096) table — assets beyond 4096 frames (256 KiB) would
    * diverge (Spark emits them, the twin cannot); fine for this corpus
    * (docs ≤ a few KiB), stated here like frameDigests' ASCII caveat.
    * Plan: scan → narrow per-frame explode inside mapPartitions → ONE
    * map-side-combined aggregate on the 32-hex digest; at 100 TB this is
    * the q31 shuffle with frame-count instead of doc-count cardinality.
    */
  val q127FrameDedup = Q(
    "q127_frame_dedup",
    """WITH fr AS (
      |  SELECT doc_id AS asset_id, i.i AS frame_idx,
      |    md5(substring(text, i.i * 64 + 1, 64)) AS frame_md5
      |  FROM documents, (SELECT unnest(range(0, 4096)) AS i) i
      |  WHERE i.i * 64 < octet_length(encode(text))
      |)
      |SELECT frame_md5,
      |  count(*) AS n_frames,
      |  count(DISTINCT asset_id) AS n_assets,
      |  min(asset_id) AS keep_asset
      |FROM fr GROUP BY frame_md5
      |HAVING count(*) > 1
      |ORDER BY frame_md5 NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    val fd = Multimodal.frameDigests(
      Multimodal.assets(Tables.documents(s, d))
        .select(col("asset_id"), col("bytes"), col("meta.mime").as("mime"))
        .as[Multimodal.Asset])
    fd.toDF()
      .groupBy(col("frame_md5"))
      .agg(count(lit(1)).as("n_frames"),
        countDistinct(col("asset_id")).as("n_assets"),
        min(col("asset_id")).as("keep_asset"))
      .filter(col("n_frames") > 1)
      .orderBy(col("frame_md5"))
  }

  /** Frame-sampling leg of the multimodal pipeline, run through the REAL
    * decode path: assets → [[Multimodal.decodeFeatures]] (typed
    * mapPartitions, the batch-decode operator) → [[Multimodal.sampleFrames]]
    * (every 4th frame as rows). The stub's frame count is a pure function
    * of payload length (n_bytes/64 + 1), so the DuckDB oracle can mirror
    * it — which makes this the one oracle row that hash-checks the
    * mapPartitions operator itself, not just SQL-expressible projections.
    */
  val q78FrameSample = Q(
    "q78_frame_sample",
    """WITH f AS (
      |  SELECT doc_id AS asset_id,
      |    octet_length(CAST(text AS BLOB)) // 64 + 1 AS n_frames
      |  FROM documents
      |)
      |SELECT asset_id, CAST(n_frames AS BIGINT) AS n_frames,
      |  CAST(unnest(range(0, n_frames, 4)) AS BIGINT) AS frame_idx
      |FROM f
      |ORDER BY asset_id NULLS FIRST, frame_idx NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    val feats = Multimodal.decodeFeatures(
      Multimodal.assets(Tables.documents(s, d))
        .select(col("asset_id"), col("bytes"), col("meta.mime").as("mime"))
        .as[Multimodal.Asset])
    Multimodal.sampleFrames(feats.toDF, 4)
      .select(col("asset_id"),
        col("frames").cast("long").as("n_frames"),
        col("frame_idx").cast("long").as("frame_idx"))
      .orderBy(col("asset_id"), col("frame_idx"))
  }

  val q48MultimodalMeta = Q(
    "q48_multimodal_meta",
    """SELECT doc_id AS asset_id,
      |  octet_length(CAST(text AS BLOB)) AS n_bytes,
      |  md5(text) AS content_md5,
      |  'text/plain' AS mime,
      |  n_chars,
      |  source
      |FROM documents
      |ORDER BY asset_id NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    Multimodal.assets(Tables.documents(s, d))
      .select(
        col("asset_id"),
        length(col("bytes")).as("n_bytes"),
        md5(col("bytes")).as("content_md5"),
        col("meta.mime").as("mime"),
        col("meta.n_chars").as("n_chars"),
        col("meta.source").as("source"))
      .orderBy(col("asset_id"))
  }
}
