package graft.vera

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The P2 cast/normalize pipeline (`process_df`, main.py:116-131), declared
  * Spark-first: one explicit `select` whose expressions Catalyst constant-
  * folds and pushes into the scan (column pruning is free — undeclared input
  * columns are simply not read).
  *
  * Reference semantics preserved:
  *  - tz-aware → UTC-naive, ONLY for columns literally named
  *    created_at/updated_at (main.py:117-119). With the session time zone
  *    pinned to UTC (all graft sessions), `cast(TimestampType →
  *    TimestampNTZType)` yields exactly the UTC wall-clock instant.
  *  - bytea → binary is a native cast (`BinaryType`); the reference's
  *    per-value memoryview→bytes loop (main.py:100-101,124) is a pandas
  *    artifact with no Spark counterpart.
  *  - declared-json columns pass through as their original STRING — never
  *    parsed and reserialized (main.py:125-127; reference issue #1: `true`
  *    must not become `True`). A string-typed input is left bit-identical.
  *  - every output column is cast to its declared type, so an all-NULL
  *    partition can never flip the output schema (the reason the reference
  *    passes an explicit Arrow schema, main.py:218).
  */
object Normalize {

  /** Project + cast `df` onto the declared schema, in declared column order.
    * Fails fast (AnalysisException) if a declared column is missing — the
    * same contract as the reference's explicit-schema `from_pandas`
    * (main.py:218).
    */
  def apply(df: DataFrame, cfg: TableConfig): DataFrame = {
    val cols = cfg.schema.fields.map { field =>
      // the declared-type cast IS each normalization here: tz-aware →
      // NTZ under the pinned-UTC session is the tz-strip; string → string
      // is the literal JSON passthrough (deliberately NOT
      // to_json(from_json(...))); bytea arrives as native BinaryType.
      // Deliberate generalization vs the reference: main.py:117-119
      // name-gates the tz-strip to created_at/updated_at because pandas
      // can't see declared types — here the schema declares which columns
      // are NTZ (in the VerA catalog that is exactly those two names,
      // Schemas.scala), so the gate is the type declaration itself and
      // already-naive inputs pass through the same cast as a no-op.
      col(field.name).cast(field.dataType).as(field.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
