package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the ANALYZE-shaped operator a stats-driven engine needs
  * (per-column row/null counts, min/max, and NDV), plus the planning helpers
  * that CONSUME the profile (so it is an operator, not just a report).
  *
  * Scale design (the round-6 lesson): the naive profile — N exact
  * `count(DISTINCT c)` in one aggregate — compiles to an Expand ×N of the
  * whole table feeding a corpus-wide multi-key shuffle (at 100 TB and N=11
  * that is a 1.1 PB shuffle to profile one table). Here NDV rides
  * `approx_count_distinct` (HyperLogLog++) instead: every per-column sketch
  * is an ordinary aggregate buffer in the SAME single HashAggregate as the
  * count/min/max columns — ONE scan, no Expand, one 1-row merge. That is
  * what real ANALYZE implementations ship; exactness for NDV is a
  * correctness non-goal (the sketch error bound is `ndvRsd`, asserted ≤10%
  * in ProfileSpec). The exact columns (rows, nulls, min, max) stay
  * oracle-checked in q79.
  */
object Profile {

  /** Long-format profile of `cols`: one row per column with
    * `(column_name, n_rows, n_nulls, min_value, max_value[, n_distinct_approx])`.
    * min/max are cast to string AFTER aggregating (uniform output schema
    * without corrupting numeric ordering). Single scan, single HashAggregate,
    * no Expand — plan-asserted in ProfileSpec.
    */
  /** Literal (non-parsed) reference to column `c`: backtick-quoted so names
    * with dots, spaces, quotes — or backticks themselves — resolve as one
    * identifier instead of being parsed as a field path or failing.
    */
  private def ref(c: String): org.apache.spark.sql.Column =
    col("`" + c.replace("`", "``") + "`")

  def profile(df: DataFrame, cols: Seq[String], withNdv: Boolean = true,
              ndvRsd: Double = 0.05): DataFrame = {
    val aggs = cols.flatMap { c =>
      val base = Seq(
        count(ref(c)).as(s"nn_$c"),
        min(ref(c)).cast("string").as(s"mn_$c"),
        max(ref(c)).cast("string").as(s"mx_$c"))
      if (withNdv) base :+ approx_count_distinct(ref(c), ndvRsd).as(s"nd_$c")
      else base
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    // explode() pivots the 1-row wide aggregate into the long report —
    // driver cost O(#cols), never another pass over the data. Built with
    // the Column API (not SQL text) so arbitrary column names can't be
    // mis-parsed; the per-column aggregate aliases above are alias
    // STRINGS, which are never parsed either.
    val entries = cols.map { c =>
      val fields = Seq(
        lit(c).as("column_name"),
        (col("n_rows") - ref(s"nn_$c")).as("n_nulls"),
        ref(s"mn_$c").as("min_value"),
        ref(s"mx_$c").as("max_value")) ++
        (if (withNdv) Seq(ref(s"nd_$c").as("n_distinct_approx")) else Nil)
      struct(fields: _*)
    }
    val long = one.select(col("n_rows"), explode(array(entries: _*)).as("e"))
    val order = Seq("column_name", "n_rows", "n_nulls", "min_value",
      "max_value") ++ (if (withNdv) Seq("n_distinct_approx") else Nil)
    long.select(order.map(f =>
      (if (f == "n_rows") col(f) else col("e").getField(f)).as(f)): _*)
  }

  /** Row count recorded in a [[profile]] result. One bounded driver action
    * on a 1-row aggregate — the same shape as AQE's query-stage statistics,
    * NOT a data-path collect.
    */
  def rowCount(profiled: DataFrame): Long =
    profiled.agg(max(col("n_rows"))).head.getLong(0)

  /** Profile-driven join planning: join `left` and `right` on `cond`,
    * broadcasting whichever side the two profiles say is smaller — the
    * stats-feed-the-planner loop (collect stats once, reuse across a
    * workload) that table-level `ANALYZE` exists for. With Catalyst's own
    * size estimate disabled (autoBroadcastJoinThreshold=-1, asserted in
    * ProfileSpec) the profile decision alone yields the BroadcastHashJoin.
    */
  def joinWithProfiledBroadcast(
      left: DataFrame, leftProfile: DataFrame,
      right: DataFrame, rightProfile: DataFrame,
      cond: org.apache.spark.sql.Column): DataFrame =
    if (rowCount(leftProfile) <= rowCount(rightProfile))
      broadcast(left).join(right, cond)
    else
      left.join(broadcast(right), cond)

  /** Feed a [[profile]] result into the session catalog as table-level CBO
    * statistics — the ANALYZE-equivalent that lets Catalyst's COST-BASED
    * planner (not just [[joinWithProfiledBroadcast]]'s explicit hint)
    * consume the profile: row count, per-column null count, HLL NDV, and
    * min/max for range-comparable types, so FilterEstimation can shrink a
    * filtered branch below the broadcast threshold and flip the join
    * strategy (asserted in ProfileSpec). One ANALYZE-free catalog write;
    * the only driver materialization is the profile itself (one row per
    * column — bounded like AQE stats).
    *
    * `sizeInBytes` is the unfiltered table size estimate (the one number a
    * profile scan does not observe — pass the storage size, e.g. summed
    * file lengths).
    *
    * min/max are stored in `CatalogColumnStat` VERSION 1 external form,
    * which is exactly [[profile]]'s `cast(string)` rendering for numeric,
    * date, timestamp and boolean columns (version 2 stores epoch integers
    * for date/time); other types skip min/max, like ANALYZE itself.
    */
  def feedCatalogStats(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      profiled: DataFrame,
      sizeInBytes: Long): Unit = {
    // VERSION PIN: CatalogColumnStat / CatalogStatistics live in
    // org.apache.spark.sql.catalyst.catalog — an INTERNAL Catalyst surface
    // with no compatibility promise. Written and tested against Spark
    // 4.1.2 (the pinned /opt/spark jars); the external string forms below
    // assume CatalogColumnStat.VERSION == 1 semantics. If a Spark upgrade
    // breaks this compile or ProfileSpec's SMJ→BHJ flip assertion, this
    // is the seam to revisit first.
    import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}
    import org.apache.spark.sql.types._
    val schema = spark.table(table).schema
    val hasNdv = profiled.schema.fieldNames.contains("n_distinct_approx")
    val rows = profiled.collect() // one row per profiled column, bounded
    val nRows = rows.headOption.map(_.getAs[Long]("n_rows")).getOrElse(0L)
    val colStats = rows.flatMap { r =>
      val name = r.getAs[String]("column_name")
      schema.find(_.name == name).map { f =>
        val (mn, mx) = f.dataType match {
          case _: NumericType | DateType | TimestampType | BooleanType =>
            (Option(r.getAs[String]("min_value")),
              Option(r.getAs[String]("max_value")))
          case _ => (None, None)
        }
        val len = f.dataType match {
          case StringType | BinaryType =>
            Option(r.getAs[String]("max_value")).map(_.length.toLong).getOrElse(20L)
          case dt => dt.defaultSize.toLong
        }
        name -> CatalogColumnStat(
          distinctCount =
            if (hasNdv) Some(BigInt(r.getAs[Long]("n_distinct_approx"))) else None,
          min = mn, max = mx,
          nullCount = Some(BigInt(r.getAs[Long]("n_nulls"))),
          avgLen = Some(len), maxLen = Some(len),
          version = 1)
      }
    }.toMap
    spark.sessionState.catalog.alterTableStats(
      spark.sessionState.sqlParser.parseTableIdentifier(table),
      Some(CatalogStatistics(BigInt(sizeInBytes), Some(BigInt(nRows)), colStats)))
  }
}
