package graft

import org.apache.spark.sql.functions._

/** q124 (mergeable rolling-p95 sketch) vs an independent in-memory
  * reimplementation of the exact trailing-window rank statistic:
  *
  *  - the reported window count `n` must EQUAL the true trailing-1-hour
  *    event count for every (type, bucket) — the histogram merge loses no
  *    mass;
  *  - the p95 estimate must land within ONE BIN WIDTH of the exact
  *    ceil(0.95·n)-th order statistic — the histogram locates the rank's
  *    bin exactly (counts are exact integers), so only the within-bin
  *    interpolation can err, and that error is bounded by the bin width
  *    by construction. This is the documented accuracy contract of the
  *    q119→q124 exact→mergeable trade.
  */
class RollingQuantileSpec extends SparkSpec {

  test("q124 window counts are exact and p95 is within one bin width") {
    val out = SparkEntry.queries("q124_rolling_p95_sketch")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.nonEmpty)

    val ev = Tables.events(spark, sf)
      .select(col("event_type"),
        expr("(unix_micros(ts) - pmod(unix_micros(ts), 300000000)) div 300000000")
          .as("b_idx"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val mm = (ev.map(_._3).min, ev.map(_._3).max)
    val lo = math.floor(mm._1 * 1e6).toLong
    val w = (math.floor(mm._2 * 1e6).toLong + 1 - lo + 63) / 64

    // every active (type, bucket) must be present in the output
    val activeKeys = ev.map(e => (e._1, e._2)).distinct
    assert(out.keySet === activeKeys.toSet)

    for (((tpe, b), (n, p95Micro)) <- out) {
      val window = ev.collect {
        case (t, bi, v) if t == tpe && bi >= b - 11 && bi <= b => v
      }.sorted
      assert(window.length.toLong === n,
        s"($tpe,$b): histogram lost mass, ${window.length} != $n")
      val rank = math.ceil(0.95 * window.length).toInt
      val exact = window(rank - 1)
      val err = math.abs(p95Micro / 1e6 - exact)
      assert(err <= w / 1e6 + 1e-9,
        s"($tpe,$b): |${p95Micro / 1e6} - $exact| = $err > bin width ${w / 1e6}")
    }
  }

  test("q124 handles a single-bucket, single-value degenerate stream") {
    import spark.implicits._
    val d = "/tmp/graft_q124_degenerate"
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:30"), 1L, "solo", 7.5, "{}"),
        (2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:30"), 1L, "solo", 7.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = SparkEntry.queries("q124_rolling_p95_sketch")(spark, d).collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(2) === 2L) // both events in the one bucket
    // min == max collapses the histogram to one unit-width bin at lo
    assert(math.abs(rows.head.getLong(3) / 1e6 - 7.5) <= 1e-5)
  }
}
