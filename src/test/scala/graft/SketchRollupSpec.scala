package graft

import org.apache.spark.sql.functions._

/** q98's accuracy net (sketch binaries have no DuckDB twin, so the oracle
  * row is rows-only by design): every per-day HLL estimate and the merged
  * total must track the exact distinct counts, and merging stored sketches
  * must equal sketching from scratch — the property that makes incremental
  * distinct-count rollups sound.
  */
class SketchRollupSpec extends SparkSpec {

  test("per-day and merged HLL estimates track exact uniques within 5%") {
    val rows = SparkEntry.queries("q98_sketch_rollup")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val ev = Tables.events(spark, sf)
    val exactTotal = ev.select(countDistinct(col("user_id"))).head.getLong(0)
    val exactPerDay = ev.groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    def close(approx: Long, exact: Long): Boolean =
      math.abs(approx - exact).toDouble / exact <= 0.05
    assert(close(rows("TOTAL"), exactTotal),
      s"merged ${rows("TOTAL")} vs exact $exactTotal")
    exactPerDay.foreach { case (day, exact) =>
      assert(close(rows(day), exact), s"$day: ${rows(day)} vs $exact")
    }
    // the merged estimate is NOT the sum of dailies (returning users would
    // double-count) — the union dedups across partitions
    assert(rows("TOTAL") < exactPerDay.values.sum)
  }

  test("q99 heavy hitters: a valid top-10 under ties, counts exact") {
    val hh = SparkEntry.queries("q99_heavy_hitters")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(hh.length === 10)
    val exact = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every estimate is the true count (the sketch tracks this vocabulary
    // exactly), and the returned set is a legitimate top-10: nothing
    // outside it has a strictly larger count than anything inside it
    hh.foreach { case (term, est) =>
      assert(est === exact(term), s"$term: est $est vs exact ${exact(term)}")
    }
    val minReturned = hh.map(_._2).min
    val outside = exact -- hh.map(_._1)
    assert(outside.values.forall(_ <= minReturned),
      s"a term outside the top-10 beats minReturned=$minReturned")
  }

  test("merging stored daily sketches equals sketching from scratch") {
    val ev = Tables.events(spark, sf)
    val merged = ev
      .groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n"))
      .head.getLong(0)
    val direct = ev.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .head.getLong(0)
    assert(merged === direct,
      "sketch union must be lossless relative to a single-pass sketch")
  }
}
