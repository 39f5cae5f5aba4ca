package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Scale-adaptive SCAN FAN-OUT (r21; guide §2.6 "idle capacity", §6 "input
  * split size").
  *
  * The driver's test corpora are single small parquet files — one row group
  * each — so every scan is ONE split, and Spark fuses everything up to the
  * first exchange into that scan stage. A query whose first stage does
  * per-row-heavy work (md5 per shingle, 64-way resample explodes, regex
  * tokenization, near-unique partial aggregation) therefore runs that work
  * on ONE core regardless of `local[32]` — measured: q164_bootstrap_ci took
  * the same 4.4 s at 8 and at 32 cores. Everything downstream of any
  * exchange is already `spark.sql.shuffle.partitions`-parallel, so the fix
  * is one cheap round-robin exchange of the BASE rows before the heavy
  * stage.
  *
  * [[fan]] inserts that exchange ONLY when the frame's source provably
  * yields fewer scan splits than the session wants (zero-job dispatch off
  * parquet footers, the PlanStats discipline):
  *
  *  - every leaf must be a parquet HadoopFsRelation with ≤ 64 files; the
  *    walk crosses only row-preserving one-input operators (no joins — a
  *    join input is post-exchange and already parallel);
  *  - split estimate per file: min(ceil(bytes / maxPartitionBytes),
  *    row-group count) — a single-row-group file can never scan as more
  *    than one non-empty task no matter how it is sliced;
  *  - fan only when the estimate is below HALF the session's default
  *    parallelism — at 100 TB scans carry thousands of row groups, the
  *    estimate clears the bar (or the file count exceeds the cap) and the
  *    frame passes through UNTOUCHED: no corpus-wide reshuffle sneaks into
  *    production-scale plans.
  *
  * Round-robin repartition keeps determinism (Spark's sort-before-
  * repartition stays on, SPARK-23207), and every query in the registry is
  * already partition-order-invariant by the exactness discipline (int64 /
  * ratio6 / DECIMAL accumulation), which the per-round DuckDB sweep
  * re-proves. `SPARK_GRAFT_FAN=off` disables for A/B re-measurement.
  */
object Fan {

  private val MaxFooterFiles = 64

  def fan(df: DataFrame): DataFrame = {
    if (sys.env.get("SPARK_GRAFT_FAN").contains("off")) return df
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    splitsUpperBound(df) match {
      case Some(s) if s * 2 <= par => df.repartition(par)
      case _ => df
    }
  }

  /** Upper bound on non-empty scan tasks of `df`'s plan, or None when the
    * plan is not a simple chain over parquet scans (joins, RDD-backed
    * frames, generators — all post-exchange shapes that are already
    * parallel or unknowable without a job).
    */
  private[graft] def splitsUpperBound(df: DataFrame): Option[Long] = {
    val spark = df.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val maxPB = spark.sessionState.conf.filesMaxPartitionBytes

    def parquetSplits(rel: HadoopFsRelation): Option[Long] = {
      if (!rel.fileFormat.getClass.getSimpleName.contains("Parquet")) return None
      val paths = rel.location.inputFiles
      if (paths.isEmpty) return Some(0L)
      if (paths.length > MaxFooterFiles) return None
      var total = 0L
      for (p <- paths) {
        val hp = new org.apache.hadoop.fs.Path(p)
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(hp, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val bytes = in.getLength
          val groups = r.getRowGroups.size.toLong
          total += math.min((bytes + maxPB - 1) / maxPB, math.max(groups, 1L))
        } finally r.close()
      }
      Some(total)
    }

    def walk(p: LogicalPlan): Option[Long] = p match {
      case l: LogicalRelation =>
        l.relation match {
          case fs: HadoopFsRelation => parquetSplits(fs)
          case _ => None
        }
      case f: Filter => walk(f.child)
      case pr: Project => walk(pr.child)
      case a: SubqueryAlias => walk(a.child)
      case _ => None
    }

    try walk(df.queryExecution.optimizedPlan)
    catch { case scala.util.control.NonFatal(_) => None }
  }
}
