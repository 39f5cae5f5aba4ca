package graft

import graft.queries.Gaps
import org.apache.spark.sql.functions._

/** q125 (differentially private count release): the seeded discrete-Laplace
  * mechanism is replayed by an INDEPENDENT in-memory reimplementation
  * (MessageDigest + the shared threshold table), so the suite checks the
  * mechanism itself — hash→uniform→inverse-CDF→clamp — not just that Spark
  * agrees with itself. Distributional sanity rides 512 deterministic seeded
  * groups: noise must actually spread (a constant-zero "mechanism" would
  * pass determinism and bounds) and its mean magnitude must sit near the
  * ε = 1 discrete-Laplace expectation E|X| = 2α/(1−α²) ≈ 0.85.
  */
class DpReleaseSpec extends SparkSpec {

  private def refNoise(key: String): Int = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(s"$key|dp1".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val u = java.lang.Long.parseLong(hex.take(15), 16)
    Gaps.dpThresholds.collectFirst { case (k, t) if u < t => k }.get
  }

  test("release equals the independent mechanism replay on the real corpus") {
    val got = SparkEntry.queries("q125_dp_release")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet === truth.keySet)
    for ((tpe, n) <- truth) {
      val want = math.max(0L, n + refNoise(tpe))
      assert(got(tpe) === want, s"$tpe: n=$n")
      assert(got(tpe) >= 0L && math.abs(got(tpe) - n) <= 20L)
    }
  }

  test("sum release equals an independent replay of clip, lattice, noise") {
    val c = 50000000L
    val got = SparkEntry.queries("q128_dp_sum_release")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // independent mechanism replay: per-user micro sums clipped to [0, C],
    // group-summed, floored to the C-lattice, noised via the shared
    // thresholds under the sum salt, clamped, re-scaled
    val perUser = Tables.events(spark, sf)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(round(col("value") * 1e6).cast("long")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val truth = perUser.groupBy(_._1).map { case (tpe, rows) =>
      val sLat = rows.map(r => math.max(0L, math.min(c, r._2))).sum / c
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(s"$tpe|dpsum1".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(hex.take(15), 16)
      val k = Gaps.dpThresholds.collectFirst { case (kk, t) if u < t => kk }.get
      tpe -> math.max(0L, sLat + k) * c
    }
    assert(got === truth)
    // user-level sensitivity is real: every group's release is within
    // (|noise| ≤ 20) + 1 (lattice floor) steps of its clipped lattice sum
    for ((tpe, rel) <- got) {
      val sLat = perUser.filter(_._1 == tpe)
        .map(r => math.max(0L, math.min(c, r._2))).sum / c
      assert(math.abs(rel / c - sLat) <= 21L, s"$tpe: $rel vs lattice $sLat")
    }
  }

  test("noise spreads and concentrates like discrete Laplace over 512 groups") {
    import spark.implicits._
    val d = "/tmp/graft_dp_groups"
    (1 to 512).flatMap { g =>
      Seq.fill(50)((g.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        g.toLong, s"grp$g", 1.0, "{}"))
    }.zipWithIndex.map { case ((_, ts, uid, tpe, v, p), i) =>
      (i.toLong, ts, uid, tpe, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(2).write.mode("overwrite").parquet(s"$d/events.parquet")
    val rel = SparkEntry.queries("q125_dp_release")(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rel.size === 512)
    // with n = 50 and |noise| ≤ 20 the clamp never fires, so noise is
    // exactly released − 50 — deterministic per group name
    val noises = rel.values.map(_ - 50L).toSeq
    assert(noises.forall(n => n >= -20L && n <= 20L))
    assert(noises.distinct.size >= 5, "noise must not be degenerate")
    assert(math.abs(noises.sum.toDouble / noises.size) < 0.25,
      "noise must be unbiased")
    val meanAbs = noises.map(math.abs).sum.toDouble / noises.size
    assert(meanAbs > 0.4 && meanAbs < 1.5,
      s"mean |noise| = $meanAbs, expected ≈ 0.85 for ε = 1")
    // determinism: the same epoch salt re-releases identical counts
    val again = SparkEntry.queries("q125_dp_release")(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === rel)
  }
}
