package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver test tables (`TESTDATA.md`).
  *
  * All tables are plain parquet scans — Catalyst pushes filters/projections
  * into the scan, so callers should never cache or materialize here. The one
  * normalization: `events.ts` is physically parquet TIMESTAMP(NANOS), which
  * Spark only reads via the `nanosAsLong` legacy knob; we convert to a
  * microsecond timestamp (truncating, exactly like DuckDB's ns→µs read) so
  * downstream operators and the DuckDB oracle see identical values.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String)   = table(s, d, "region")
  def nation(s: SparkSession, d: String)   = table(s, d, "nation")
  def customer(s: SparkSession, d: String) = table(s, d, "customer")
  def supplier(s: SparkSession, d: String) = table(s, d, "supplier")
  def part(s: SparkSession, d: String)     = table(s, d, "part")
  def orders(s: SparkSession, d: String)   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String) = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String)  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = table(s, d, "embeddings")

  /** `documents` fanned out across the cluster for CPU-dense per-row work
    * (shingling, per-gram digests, tokenization). The text table is tiny on
    * disk — often a single parquet row group, i.e. a single input split —
    * but explodes 100–1000× in compute, so without an explicit round-robin
    * repartition the whole corpus would be processed by one task while the
    * other N−1 cores idle. The shuffled bytes are just the raw text
    * (negligible next to the per-gram hashing it unlocks); at 100 TB the
    * same holds per-file, and the repartition additionally heals small-file
    * / skewed-file-size imbalance.
    */
  def documentsWide(s: SparkSession, d: String): DataFrame =
    documents(s, d).repartition(s.sparkContext.defaultParallelism)

  /** `ts` arrives as LongType (ns since epoch) under the nanosAsLong knob,
    * which every session builder ([[Engine]]/[[Verify]]/[[Bench]]) sets at
    * build time. ns→µs uses floor division (`(ts - pmod(ts,1000)) div 1000`
    * floors even for pre-epoch negatives), matching DuckDB's ns→µs read.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // fail fast with guidance on foreign sessions: without the knob the
    // scan dies later with a cryptic "Illegal Parquet type: INT64
    // (TIMESTAMP(NANOS,...))". Deliberately NOT conf.set here — a table
    // loader must not mutate session state behind the caller's back.
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events.parquet stores TIMESTAMP(NANOS); build the session with " +
        "spark.sql.legacy.parquet.nanosAsLong=true (Engine.session does)")
    spark.read
      .parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)"))
  }
}
