package graft

import graft.functions.Exact
import org.apache.spark.sql.functions._

import scala.util.Random

/** Property: Exact.dsum is partition-order independent — the whole reason it
  * exists (double SUM is not associative; decimal-routed SUM is). Manual
  * deterministic property loop (fixed seed) rather than a scalacheck bridge.
  */
class ExactSpec extends SparkSpec {

  test("dsum(double) is invariant under repartitioning and matches BigDecimal") {
    import spark.implicits._
    val rng = new Random(42)
    for (round <- 1 to 5) {
      val xs = Vector.fill(2000)((rng.nextDouble() - 0.3) * 10000)
      val expected = xs
        .map(x => BigDecimal(x).setScale(Exact.Scale, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      for (parts <- Seq(1, 3, 16)) {
        val got = xs.toDF("v").repartition(parts)
          .agg(Exact.dsum(col("v")).as("s"))
          .head.getDouble(0)
        assert(got === expected, s"round $round parts $parts")
      }
    }
  }

  test("plain double sum actually IS order-sensitive here (the control)") {
    import spark.implicits._
    val rng = new Random(7)
    val xs = Vector.fill(20000)((rng.nextDouble() - 0.5) * 1e12)
    val sums = Seq(1, 7).map { parts =>
      xs.toDF("v").repartition(parts).agg(sum(col("v"))).head.getDouble(0)
    }
    // not an engine invariant — just documents why dsum exists; if this ever
    // starts passing bit-identically the control is vacuous, not broken
    info(s"plain sums across partitionings: ${sums.mkString(" vs ")}")
    assert(sums.forall(s => math.abs(s - sums.head) < 1e6))
  }
}
