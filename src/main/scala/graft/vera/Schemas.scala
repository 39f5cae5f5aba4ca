package graft.vera

import org.apache.spark.sql.types._

/** The VerA export catalog: the 7 table schemas the reference declares in
  * `config.py:4-122`, re-expressed as Spark `StructType`s, plus the closed
  * dtype vocabulary of `main.py:133-150` (any other dtype is rejected, the
  * Spark mirror of `raise ValueError("Type not supported")`, main.py:150).
  *
  * Design notes (SURVEY.md §1.2):
  *  - schemas are DECLARED, never inferred — the exporter passes an explicit
  *    Arrow schema to every write (main.py:218,223); we do the same with
  *    `StructType` + explicit casts ([[Normalize]]).
  *  - `json` is a pseudo-dtype (config.py:2): the physical type is STRING and
  *    the literal JSON text must be preserved byte-for-byte
  *    (main.py:125-127, reference issue #1) — [[TableConfig.jsonCols]] marks
  *    these so nothing ever parses-and-reserializes them.
  *  - timestamps are UTC-naive (`TimestampNTZType`); the reference tz-strips
  *    only columns literally named created_at/updated_at (main.py:117-119).
  *  - everything is nullable, matching pandas nullable extension dtypes.
  */
object Schemas {

  /** Closed dtype-name → Spark type mapping (main.py:133-150). `json` maps
    * to StringType but keeps its identity via [[TableConfig.jsonCols]].
    */
  def sparkType(dtype: String): DataType = dtype match {
    case "bool"           => BooleanType
    case "Int32"          => IntegerType
    case "Int64"          => LongType
    case "string"         => StringType
    case "object"         => BinaryType // Postgres bytea → memoryview→bytes (main.py:100-101)
    case "datetime64[ns]" => TimestampNTZType
    case "json"           => StringType
    case other =>
      throw new IllegalArgumentException(s"Type not supported: $other") // main.py:150
  }

  /** Build a schema from a reference-style `datatypes` map, preserving the
    * declared column order (column order is part of the export contract).
    */
  def fromDtypes(dtypes: Seq[(String, String)]): StructType =
    StructType(dtypes.map { case (name, dt) =>
      StructField(name, sparkType(dt), nullable = true)
    })

  private def f(name: String, dt: DataType) = StructField(name, dt, nullable = true)
  private val ts = TimestampNTZType

  /** `code` (config.py:5-18). */
  val code: StructType = StructType(Seq(
    f("code_hash", BinaryType), f("code", BinaryType),
    f("code_hash_keccak", BinaryType),
    f("created_at", ts), f("updated_at", ts),
    f("created_by", StringType), f("updated_by", StringType)))

  /** `contracts` (config.py:19-32). */
  val contracts: StructType = StructType(Seq(
    f("id", StringType),
    f("creation_code_hash", BinaryType), f("runtime_code_hash", BinaryType),
    f("created_at", ts), f("updated_at", ts),
    f("created_by", StringType), f("updated_by", StringType)))

  /** `contract_deployments` (config.py:33-51). */
  val contractDeployments: StructType = StructType(Seq(
    f("id", StringType), f("chain_id", LongType), f("address", BinaryType),
    f("transaction_hash", BinaryType), f("block_number", LongType),
    f("transaction_index", IntegerType), f("deployer", BinaryType),
    f("contract_id", StringType),
    f("created_at", ts), f("updated_at", ts),
    f("created_by", StringType), f("updated_by", StringType)))

  /** `compiled_contracts` (config.py:52-74). */
  val compiledContracts: StructType = StructType(Seq(
    f("id", StringType),
    f("created_at", ts), f("updated_at", ts),
    f("created_by", StringType), f("updated_by", StringType),
    f("compiler", StringType), f("version", StringType),
    f("language", StringType), f("name", StringType),
    f("fully_qualified_name", StringType),
    f("compiler_settings", StringType),
    f("compilation_artifacts", StringType),
    f("creation_code_hash", BinaryType),
    f("creation_code_artifacts", StringType),
    f("runtime_code_hash", BinaryType),
    f("runtime_code_artifacts", StringType)))

  /** `compiled_contracts_sources` (config.py:75-85). */
  val compiledContractsSources: StructType = StructType(Seq(
    f("id", StringType), f("compilation_id", StringType),
    f("source_hash", BinaryType), f("path", StringType)))

  /** `sources` (config.py:86-99). */
  val sources: StructType = StructType(Seq(
    f("source_hash", BinaryType), f("source_hash_keccak", BinaryType),
    f("content", StringType),
    f("created_at", ts), f("updated_at", ts),
    f("created_by", StringType), f("updated_by", StringType)))

  /** `verified_contracts` (config.py:100-121). */
  val verifiedContracts: StructType = StructType(Seq(
    f("id", LongType),
    f("created_at", ts), f("updated_at", ts),
    f("created_by", StringType), f("updated_by", StringType),
    f("deployment_id", StringType), f("compilation_id", StringType),
    f("creation_match", BooleanType), f("creation_values", StringType),
    f("creation_transformations", StringType),
    f("runtime_match", BooleanType), f("runtime_values", StringType),
    f("runtime_transformations", StringType),
    f("runtime_metadata_match", BooleanType),
    f("creation_metadata_match", BooleanType)))

  /** The 7 table configs with the reference's per-table tuning
    * (chunk_size × num_chunks_per_file, config.py per table). Chunk sizing is
    * inversely proportional to row width — blob-heavy tables rotate at 10k
    * rows, narrow tables at 1M.
    */
  val tables: Seq[TableConfig] = Seq(
    TableConfig("code", code, chunkSize = 10000, numChunksPerFile = 10),
    TableConfig("contracts", contracts, 100000, 10),
    TableConfig("contract_deployments", contractDeployments, 100000, 10),
    TableConfig("compiled_contracts", compiledContracts, 1000, 10,
      jsonCols = Set("compiler_settings", "compilation_artifacts",
        "creation_code_artifacts", "runtime_code_artifacts")),
    TableConfig("compiled_contracts_sources", compiledContractsSources, 100000, 10),
    TableConfig("sources", sources, 1000, 10),
    TableConfig("verified_contracts", verifiedContracts, 100000, 10,
      jsonCols = Set("creation_values", "creation_transformations",
        "runtime_values", "runtime_transformations")),
  )

  def byName(name: String): TableConfig =
    tables.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"Unknown VerA table: $name"))
}

/** Per-table export configuration (mirror of one `tables_config` entry,
  * config.py:4-122).
  *
  * @param jsonCols columns whose StringType payload is literal JSON that must
  *                 pass through untouched (never from_json/to_json) —
  *                 main.py:125-127 / reference issue #1.
  * @param compression parquet codec; the reference's global zstd
  *                    (main.py:24) is shadowed by the per-table lookup
  *                    (main.py:188) so the effective reference value is None.
  *                    We implement the documented intent (README.md:75):
  *                    configurable, default zstd, per-table override.
  */
final case class TableConfig(
    name: String,
    schema: StructType,
    chunkSize: Int,
    numChunksPerFile: Int,
    jsonCols: Set[String] = Set.empty,
    compression: Option[String] = Some("zstd"),
) {
  /** File-rotation unit: rows per output file (main.py:190). */
  def rowsPerFile: Long = chunkSize.toLong * numChunksPerFile
}
