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

  def all: Seq[Q] = Seq(q48MultimodalMeta, q78FrameSample)

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
