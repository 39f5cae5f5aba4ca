package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine-exact numeric aggregation helpers.
  *
  * Problem: `SUM(double)` is order-dependent, and Spark's parallel partial
  * aggregation sums in a different order than the DuckDB oracle — the results
  * differ in the last ulps and break the driver's hash compare.
  *
  * Fix: route double sums through a fixed-scale decimal. double→decimal
  * rounding is deterministic (the inputs are money-like values far from
  * rounding ties), decimal addition is exact and associative (so partial
  * map-side aggregation + any merge order gives the same result), and the
  * final decimal→double cast is correctly rounded in both engines. The
  * matching DuckDB SQL text is produced by the `Sql` twins below.
  *
  * At 100 TB this costs nothing extra: decimal(18+,s) sums stay inside
  * Spark's hash aggregate with whole-stage codegen and map-side combine.
  */
object Exact {
  val Scale = 4

  /** Exact, order-independent sum of a double column → double. */
  def dsum(c: Column, scale: Int = Scale): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Exact average: decimal-exact sum divided by count (IEEE-deterministic). */
  def davg(c: Column, scale: Int = Scale): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType) / count(c)

  /** DuckDB SQL twins — keep in lockstep with the Column versions. */
  object Sql {
    def dsum(e: String, scale: Int = Scale): String =
      s"CAST(SUM(CAST($e AS DECIMAL(18,$scale))) AS DOUBLE)"
    def davg(e: String, scale: Int = Scale): String =
      s"CAST(SUM(CAST($e AS DECIMAL(18,$scale))) AS DOUBLE) / COUNT($e)"
  }
}
