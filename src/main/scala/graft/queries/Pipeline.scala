package graft.queries

import graft.{Q, Tables}
import graft.vera.{Export, Normalize, Schemas, TableConfig}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Export-pipeline coverage (SURVEY.md §2.1 S4/S5/S7, §2.2 P2, §2.11):
  * each query drives the real [[graft.vera.Export]] sink against a testdata
  * table and returns something a DuckDB oracle can recompute from the
  * ORIGINAL table — because the file-rotation law is deterministic
  * (bucket = floor(global_row_number / rows_per_file) over a stable key),
  * the oracle can predict per-file contents and even the file NAMES without
  * ever seeing the written files.
  */
object Pipeline {

  def all: Seq[Q] = Seq(q28ExportRoundtrip, q29ExportManifest, q30NormalizeCast,
    q50FormatSources)

  /** rows-per-file for the export queries: 200×10 = 2000 (a scaled-down
    * mirror of the reference's chunk_size × num_chunks_per_file law,
    * config.py:16-17).
    */
  private val RowsPerFile = 2000L

  private val ordersCfg = TableConfig(
    name = "orders",
    schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampNTZType),
      StructField("o_orderpriority", StringType))),
    chunkSize = 200,
    numChunksPerFile = 10,
  )

  /** Unique scratch dir per (query, sfDir) so queries never race. */
  private def scratch(tag: String, sfDir: String): String =
    s"/tmp/graft_export/${tag}_${Integer.toHexString(sfDir.hashCode)}"

  /** S4+S5 end-to-end: normalize `orders`, write size-rotated row-range-named
    * files, READ THE FILES BACK, and report per-file stats keyed by the row
    * range parsed out of each file's NAME. Any rotation bug (lost row, wrong
    * bucket, wrong name) breaks the hash against the oracle's row_number
    * prediction.
    */
  val q28ExportRoundtrip = Q(
    "q28_export_roundtrip",
    s"""SELECT CAST(floor((rn - 1) / $RowsPerFile) AS BIGINT) * $RowsPerFile AS file_lo,
       |  count(*) AS n_rows,
       |  min(o_orderkey) AS min_key,
       |  max(o_orderkey) AS max_key,
       |  CAST(sum(o_custkey) AS BIGINT) AS sum_cust
       |FROM (SELECT o_orderkey, o_custkey,
       |        row_number() OVER (ORDER BY o_orderkey) AS rn
       |      FROM orders) t
       |GROUP BY 1
       |ORDER BY file_lo NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    val outDir = scratch("q28", d)
    val src = Tables.orders(s, d)
    Export.exportTable(src, ordersCfg, Seq("o_orderkey"), outDir)
    // read back with the DECLARED schema (the engine's schema rule,
    // SURVEY §1.2): an EMPTY export writes zero files and schema
    // inference over no files throws — declared schemas make the empty
    // round-trip a plain empty frame (r17 empty-corpus audit)
    s.read.schema(src.schema).parquet(outDir)
      .withColumn("file_lo",
        regexp_extract(input_file_name(), "orders_(\\d+)_\\d+", 1).cast("long"))
      .groupBy(col("file_lo"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"),
        sum(col("o_custkey")).cast("long").as("sum_cust"),
      )
      .orderBy(col("file_lo"))
  }

  /** S7: full table-loop export (O1) over two tables, returning the manifest
    * rows. The oracle re-derives every object key purely from row counts —
    * the naming law is `{table}/{table}_{i*rpf}_{(i+1)*rpf}_{codec}.parquet`
    * (get_output_file, main.py:94-98; key shape main.py:237).
    */
  val q29ExportManifest = Q(
    "q29_export_manifest",
    s"""WITH counts AS (
       |  SELECT 'orders' AS table_name, count(*) AS n FROM orders
       |  UNION ALL
       |  SELECT 'customer', count(*) FROM customer
       |), gs AS (SELECT g FROM generate_series(0, 9999) t(g))
       |SELECT table_name, g AS file_no,
       |  table_name || '/' || table_name || '_' || (g * $RowsPerFile) || '_'
       |    || ((g + 1) * $RowsPerFile) || '_zstd.parquet' AS object_name
       |FROM counts JOIN gs ON g < CAST(ceil(n / $RowsPerFile.0) AS BIGINT)
       |ORDER BY table_name NULLS FIRST, file_no NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    import s.implicits._
    val outDir = scratch("q29", d)
    val customerCfg = TableConfig(
      name = "customer",
      schema = StructType(Seq(
        StructField("c_custkey", LongType),
        StructField("c_name", StringType),
        StructField("c_nationkey", IntegerType),
        StructField("c_acctbal", DoubleType),
        StructField("c_mktsegment", StringType))),
      chunkSize = 200, numChunksPerFile = 10)
    val manifest = Export.exportAll(
      Seq(
        (Tables.orders(s, d), ordersCfg, Seq("o_orderkey")),
        (Tables.customer(s, d), customerCfg, Seq("c_custkey"))),
      outDir)
    manifest.files
      .flatMap { case (t, keys) => keys.zipWithIndex.map { case (k, i) => (t, i.toLong, k) } }
      .toDF("table_name", "file_no", "object_name")
      .orderBy(col("table_name"), col("file_no"))
  }

  /** S8: non-parquet sources (CSV + JSON), read back with DECLARED schemas —
    * never inference (the engine's schema-is-declared rule, SURVEY §1.2,
    * applies to every source format). Round-trips `nation` through both
    * formats and aggregates the union; the oracle sees each row exactly
    * twice.
    */
  val q50FormatSources = Q(
    "q50_format_sources",
    """SELECT n_regionkey, 3 * count(*) AS n_rows,
      |  CAST(3 * sum(n_nationkey) AS BIGINT) AS sum_key
      |FROM nation
      |GROUP BY n_regionkey
      |ORDER BY n_regionkey NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    val out = scratch("q50", d)
    val nationSchema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    val nation = Tables.nation(s, d)
    nation.write.mode("overwrite").option("header", "true").csv(s"$out/csv")
    nation.write.mode("overwrite").json(s"$out/json")
    nation.write.mode("overwrite").orc(s"$out/orc")
    val fromCsv = s.read.schema(nationSchema).option("header", "true").csv(s"$out/csv")
    val fromJson = s.read.schema(nationSchema).json(s"$out/json")
    // ORC is the third built-in columnar source (SURVEY §2.1 S8). Avro is
    // NOT exercised: `format("avro")` lives in the external spark-avro
    // module, which is not on this classpath — it would be one more
    // write/read pair here, with zero engine code. Resolution attempted
    // rounds 7 AND 8 (full-filesystem + coursier-mirror search): no
    // org.apache.spark:spark-avro artifact exists offline; /opt/spark/jars
    // carries only the avro-core libs (avro/avro-ipc/avro-mapred 1.12.1),
    // not the datasource jar — a networked build adds it as one
    // libraryDependencies line.
    val fromOrc = s.read.schema(nationSchema).orc(s"$out/orc")
    fromCsv.unionByName(fromJson).unionByName(fromOrc)
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("n_nationkey")).cast("long").as("sum_key"))
      .orderBy(col("n_regionkey"))
  }

  /** P2: the declared-schema cast/normalize pipeline over `events` — tz-aware
    * instant → UTC-naive `created_at` (main.py:117-119), literal-JSON
    * passthrough for `props` (main.py:125-127), nullable-int casts — built
    * through [[Schemas.fromDtypes]] so the closed dtype vocabulary
    * (main.py:133-150) is what's actually exercised.
    */
  val q30NormalizeCast = Q(
    "q30_normalize_cast",
    """SELECT event_id, CAST(ts AS TIMESTAMP) AS created_at, event_type,
      |  props, user_id
      |FROM events
      |ORDER BY event_id NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    val cfg = TableConfig(
      name = "events_normalized",
      schema = Schemas.fromDtypes(Seq(
        "event_id" -> "Int64",
        "created_at" -> "datetime64[ns]",
        "event_type" -> "string",
        "props" -> "json",
        "user_id" -> "Int64")),
      chunkSize = 1000, numChunksPerFile = 10,
      jsonCols = Set("props"))
    val in = Tables.events(s, d).select(
      col("event_id"), col("ts").as("created_at"), col("event_type"),
      col("props"), col("user_id"))
    Normalize(in, cfg).orderBy(col("event_id"))
  }
}
