package graft.vera

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1/S2: the Postgres scan side of the export pipeline.
  *
  * The reference streams `SELECT * FROM {schema}.{table}` through one
  * server-side cursor, `chunk_size` rows at a time (main.py:197-207) —
  * single connection, strictly sequential. The Spark-native equivalent is
  * the JDBC V2 source: `fetchsize` plays the cursor-chunk role per
  * connection, and `partitionColumn/lowerBound/upperBound/numPartitions`
  * turn the one sequential cursor into N concurrent range scans — the same
  * rows, cluster-parallel (the one structural improvement over the
  * reference this engine makes on the scan side). Projection, filters,
  * LIMIT and OFFSET all push down to Postgres via the V2 JDBC connector.
  *
  * Executed in CI against an embedded Derby database (`JdbcSpec`: scan →
  * normalize → export, 4 range-partition connections); Postgres is the
  * production target a reference user would point `url` at. The parquet
  * fixtures remain the source for the query corpus (SURVEY.md §2.1 S8′).
  */
object Jdbc {

  /** Streaming full-table scan (S1). `fetchSize` defaults to the table's
    * reference `chunk_size` — the same knob, same meaning.
    */
  def scan(
      spark: SparkSession,
      url: String,
      schemaName: String,
      cfg: TableConfig,
      user: String,
      password: String,
      partitionColumn: Option[String] = None,
      lowerBound: Long = 0L,
      upperBound: Long = 0L,
      numPartitions: Int = 1,
      offset: Option[Long] = None,
  ): DataFrame = {
    // OFFSET (S2, main.py:201-202) is pushed into the dbtable subquery so
    // Postgres applies it server-side, exactly like the reference's SQL.
    val relation = offset match {
      case Some(n) => s"(SELECT * FROM $schemaName.${cfg.name} OFFSET $n) AS t"
      case None    => s"$schemaName.${cfg.name}"
    }
    val base = spark.read
      .format("jdbc")
      .option("url", url)
      .option("dbtable", relation)
      .option("user", user)
      .option("password", password)
      .option("fetchsize", cfg.chunkSize.toString)
    val reader = partitionColumn match {
      case Some(c) =>
        base
          .option("partitionColumn", c)
          .option("lowerBound", lowerBound.toString)
          .option("upperBound", upperBound.toString)
          .option("numPartitions", numPartitions.toString)
      case None => base
    }
    reader.load()
  }
}
