package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

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

  /** Exact, order-independent sum of a double column → double.
    *
    * Implementation is LONG fixed-point, not decimal: `sum(decimal(18,4))`
    * widens its buffer to decimal(28,4), which exceeds Spark's compact-long
    * decimal range (18 digits) and degrades every row-add to a BigDecimal
    * call — measured ~0.3 s per aggregate over 600 k rows, the single
    * widest fixed cost across the bench. `round(c·10ˢ) → long` sums in
    * pure codegen'd long addition (order-free and exact like decimal), and
    * one final double divide by 10ˢ is correctly rounded from the exact
    * rational — the same value the decimal→double cast produced.
    *
    * Rounding equivalence with the oracle's `CAST(e AS DECIMAL(18,s))`:
    * the decimal cast half-up-rounds the exact expansion of the double,
    * `round(c·10ˢ)` half-up-rounds the IEEE product — they can differ only
    * for values within an ulp of a half-10⁻ˢ tie, which the money-like
    * fixtures never produce (same "far from ties" precondition the decimal
    * formulation already carried; the sf0.01 gate verifies it empirically
    * for every query, both scales).
    *
    * Range: units ≤ 9.2·10¹⁸⁻ˢ keep the long sum exact (10⁵-sized values
    * at scale 4 leave 9 orders of headroom; the double divide is exact for
    * sums below 2⁵³ units). At 100 TB swap scale-4 for scale-2 or shard
    * the sum before the final merge — the associativity argument is
    * unchanged.
    */
  def dsum(c: Column, scale: Int = Scale): Column = {
    val m = math.pow(10, scale)
    sum(round(c * m).cast("long")).cast(DoubleType) / m
  }

  /** Exact average: fixed-point-exact sum divided by count
    * (IEEE-deterministic; the double divides associate left, matching the
    * SQL twin's `CAST(...) / 10ˢ / COUNT`).
    */
  def davg(c: Column, scale: Int = Scale): Column = {
    val m = math.pow(10, scale)
    sum(round(c * m).cast("long")).cast(DoubleType) / m / count(c)
  }

  /** Integer half-up rounding of `num/den` to 6 decimals for NON-NEGATIVE
    * integer operands, computed entirely in BIGINT:
    * `(2·num·10⁶ + den) div (2·den)`, then one exact double division by
    * 10⁶. Both engines evaluate identical integer arithmetic, so the
    * result is bit-equal EVEN on exact half-1e-6 boundaries — where
    * `round()` of a double rational diverges: Spark rounds the double's
    * exact decimal expansion (BigDecimal HALF_UP) while DuckDB rounds the
    * ×10⁶-scaled double, and ratios of small integer counts land on those
    * boundaries (2 of 5000 sf0.1 docs did for q37's quality).
    *
    * Constraints: operands NON-NEGATIVE (Spark `div` truncates toward
    * zero, DuckDB `//` floors — they agree only on non-negatives) and
    * `num·2·10⁶` within BIGINT (num < 4.6e12). A zero denominator yields
    * NULL (`nullif`), matching DuckDB division under ANSI Spark.
    * `num`/`den` are SQL expression strings valid in BOTH dialects over
    * the enclosing relation's columns.
    */
  def ratio6(num: String, den: String): Column = expr(
    s"CAST(((2 * CAST($num AS BIGINT) * 1000000 + CAST($den AS BIGINT))" +
      s" div nullif(2 * CAST($den AS BIGINT), 0)) AS DOUBLE) / 1000000.0")

  /** [[ratio6]] for numerators past its 4.6·10¹² line (hit live by
    * q166's winsorized sum on the ×10 lineitem axis: Σ cnt·cents ≈
    * 2·10¹³ made `2·num·10⁶` overflow int64 under ANSI). Split
    * num = q·den + r by integer div/mod, half-up-round only the PROPER
    * fraction r/den through ratio6's exact-integer device, and add the
    * exact integer quotient back: round6(num/den) = q + round6(r/den)
    * identically (q is integral, rounding touches only fractional
    * digits). Every intermediate stays in int64 for num up to the
    * int64 line and den ≤ 4.6·10¹²; the final `+` is ONE IEEE add of
    * bit-identical operands on both engines, so the result is
    * bit-equal cross-engine (it may differ from a hypothetical
    * infinite-precision ratio6 in the last ulp — the FORMULATION is
    * the spec, stated, same stance as the fixed-order chains).
    * Same non-negativity constraint as ratio6 (div/% truncate vs floor
    * agree only there); zero denominator → NULL via nullif on both
    * terms.
    */
  def ratio6Big(num: String, den: String): Column = expr(
    s"CAST((CAST($num AS BIGINT)" +
      s" div nullif(CAST($den AS BIGINT), 0)) AS DOUBLE)" +
      s" + CAST(((2 * (CAST($num AS BIGINT)" +
      s" % nullif(CAST($den AS BIGINT), 0)) * 1000000" +
      s" + CAST($den AS BIGINT))" +
      s" div nullif(2 * CAST($den AS BIGINT), 0)) AS DOUBLE) / 1000000.0")

  /** DuckDB SQL twins — keep in lockstep with the Column versions. */
  object Sql {
    def dsum(e: String, scale: Int = Scale): String =
      s"CAST(SUM(CAST($e AS DECIMAL(18,$scale))) AS DOUBLE)"
    def davg(e: String, scale: Int = Scale): String =
      s"CAST(SUM(CAST($e AS DECIMAL(18,$scale))) AS DOUBLE) / COUNT($e)"
    def ratio6(num: String, den: String): String =
      s"CAST(((2 * CAST($num AS BIGINT) * 1000000 + CAST($den AS BIGINT))" +
        s" // nullif(2 * CAST($den AS BIGINT), 0)) AS DOUBLE) / 1000000.0"
    def ratio6Big(num: String, den: String): String =
      s"CAST((CAST($num AS BIGINT)" +
        s" // nullif(CAST($den AS BIGINT), 0)) AS DOUBLE)" +
        s" + CAST(((2 * (CAST($num AS BIGINT)" +
        s" % nullif(CAST($den AS BIGINT), 0)) * 1000000" +
        s" + CAST($den AS BIGINT))" +
        s" // nullif(2 * CAST($den AS BIGINT), 0)) AS DOUBLE) / 1000000.0"
  }
}
