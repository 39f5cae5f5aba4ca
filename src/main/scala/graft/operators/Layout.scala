package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.ScaleOps

/** Physical-layout operator: Z-order (Morton) clustering for
  * multi-dimensional min/max data skipping.
  *
  * Parquet readers skip row groups whose column min/max don't intersect the
  * pushed predicate — but skipping only works on columns the layout
  * actually clusters. A linear sort clusters ONE column; a 2-D predicate's
  * second column is uniform inside every file and nothing skips (ZorderSpec
  * measures exactly this). Z-ordering sorts by the bit-interleave of both
  * dimensions' equi-width buckets, so every file covers a small
  * ~square-ish region of the 2-D domain and BOTH single-dimension bands
  * and 2-D boxes prune files. This is the same layout primitive Delta's
  * OPTIMIZE ZORDER BY ships; here it composes from public Spark API:
  * one stats aggregate + `repartitionByRange` + `sortWithinPartitions`,
  * all shuffle-planned by Catalyst (the range exchange samples the z-key
  * distribution, so skewed data still yields balanced files).
  *
  * The curve math itself is oracle-verified cross-engine in q108.
  */
object Layout {

  /** Re-cluster `df` so parquet min/max skipping works on BOTH `x` and `y`
    * (numeric columns, each with range > 0). `partitions` bounds the file
    * count of a subsequent write; at cluster scale pick it from target
    * file size (e.g. total/1 GB), same as any compaction job.
    */
  def zorderBy(df: DataFrame, x: String, y: String, partitions: Int): DataFrame = {
    val st = df.agg(
      min(col(x)).cast("double"), max(col(x)).cast("double"),
      min(col(y)).cast("double"), max(col(y)).cast("double")).head
    val z = ScaleOps.zorderKey(
      col(x).cast("double"), st.getDouble(0), st.getDouble(1),
      col(y).cast("double"), st.getDouble(2), st.getDouble(3))
    df.withColumn("__graft_z", z)
      .repartitionByRange(partitions, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
  }
}
