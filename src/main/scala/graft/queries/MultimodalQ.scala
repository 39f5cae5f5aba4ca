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

  def all: Seq[Q] = Seq(q48MultimodalMeta)

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
