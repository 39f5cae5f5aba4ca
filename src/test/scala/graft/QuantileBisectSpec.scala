package graft

/** Nets for q135's histogram-bisection selection: the degenerate
  * mass-concentration corpus (every value identical — the whole
  * distribution in ONE bucket, pass 2 = full sort) and exact rank
  * agreement with a driver-side sort on a small skewed fixture.
  */
class QuantileBisectSpec extends SparkSpec {

  private def fixture(rows: Seq[(Double, Double)]): String = {
    val d = "/tmp/graft_quantile_fixture"
    import spark.implicits._
    rows.zipWithIndex.map { case ((p, q), i) =>
      (i.toLong, i.toLong, i.toLong, i, q, p, 0.0, 0.0, "N", "O",
        new java.sql.Timestamp(86400000L))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

  private def fixture(prices: Seq[Double])(implicit d: DummyImplicit): String =
    fixture(prices.map(_ -> 1.0))

  private def run(prices: Seq[Double]): Map[Double, (Long, Long, Long)] =
    SparkEntry.queries("q135_quantile_bisect")(spark, fixture(prices))
      .collect()
      .map(r => r.getDouble(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("constant column: one bucket holds all mass, ranks still exact") {
    val got = run(Seq.fill(100)(42.5))
    // every quantile of a constant distribution is the constant (4250¢)
    assert(got === Map(
      0.5 -> ((100L, 50L, 4250L)),
      0.9 -> ((100L, 90L, 4250L)),
      0.99 -> ((100L, 99L, 4250L))))
  }

  test("q139: weighted targets follow the weights, not the row counts") {
    // one heavy cheap row (weight 90) and nine light expensive rows
    // (weight 1 each): W = 99; p50 target 50 → cheap value; p99 target 99
    // → the LAST distinct value in cumulative-weight order
    val d = fixture(Seq(10.0 -> 90.0) ++ (1 to 9).map(i => (100.0 + i) -> 1.0))
    val got = SparkEntry.queries("q139_weighted_quantile")(spark, d)
      .collect()
      .map(r => r.getDouble(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(0.5) === ((99L, 50L, 1000L)))
    assert(got(0.9) === ((99L, 90L, 1000L)))  // 90 ≤ cumw(10.0) = 90
    assert(got(0.99) === ((99L, 99L, 10900L)))
  }

  test("property: bisection and rank transform match driver-side references " +
      "on randomized skewed corpora (fixed seed)") {
    val rng = new scala.util.Random(97)
    for (round <- 1 to 4) {
      // heavy-duplicate mass plus a sparse tail plus NEGATIVE values —
      // negative cents exercise the (c - lo) bin shift's floor behavior
      val prices =
        Seq.fill(200)(rng.nextInt(5).toDouble - 2.0) ++
          Seq.fill(100)((rng.nextDouble() - 0.5) * 10000)
      val d = fixture(prices)
      val cents = prices.map(p => math.floor(p * 100).toLong).sorted
      val n = cents.length
      val q135 = SparkEntry.queries("q135_quantile_bisect")(spark, d)
        .collect().map(r => r.getDouble(0) -> r.getLong(3)).toMap
      for ((q, qm) <- Seq(0.5 -> 500000L, 0.9 -> 900000L, 0.99 -> 990000L)) {
        val k = ((n * qm + 999999) / 1000000).toInt
        assert(q135(q) === cents(k - 1), s"round $round q=$q")
      }
      val q142 = SparkEntry.queries("q142_rank_transform")(spark, d)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      val sortedAll = cents
      prices.zipWithIndex.foreach { case (p, i) =>
        val c = math.floor(p * 100).toLong
        val expectRank = sortedAll.count(_ < c) + 1L
        assert(q142(i.toLong) === expectRank, s"round $round row $i")
      }
    }
  }

  test("q142: tied values share a rank; pct spans exactly [0, 1]") {
    val d = fixture(Seq(10.0, 10.0, 20.0, 30.0))
    val got = SparkEntry.queries("q142_rank_transform")(spark, d)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getDouble(4))))
      .toMap
    // rows 0,1 tie at rank 1 (pct 0); row 2 rank 3 (pct 2/3); row 3 rank
    // 4 (pct 1) — RANK semantics, not dense or row_number
    assert(got(0L) === ((1L, 0.0)) && got(1L) === ((1L, 0.0)))
    assert(got(2L) === ((3L, 0.666667)))
    assert(got(3L) === ((4L, 1.0)))
  }

  test("q140: known CDF gap, peak location, and cross-product exactness") {
    val d = "/tmp/graft_ks_fixture"
    import spark.implicits._
    def day(epoch: Int) =
      new java.sql.Timestamp(if (epoch == 0) 800000000000L else 900000000000L)
    // epoch split is 1998-07-01 (899251200000 ms): epoch-0 rows before it
    val rows =
      Seq(1.0, 2.0, 3.0, 4.0).map(p => (p, day(0))) ++
        Seq(3.0, 4.0, 5.0, 6.0).map(p => (p, day(1)))
    rows.zipWithIndex.map { case ((p, ts), i) =>
      (i.toLong, i.toLong, "O", p, ts, "1-URGENT", "c", 0L, "x")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority", "o_clerk", "o_shippriority",
      "o_comment")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    val r = SparkEntry.queries("q140_ks_drift")(spark, d).collect()
    assert(r.length === 1)
    val row = r.head
    // F1 − F2 peaks at 0.5, first reached at value 2 (ca=2, cb=0):
    // d_num = |2·4 − 0·4| = 8 over n1·n2 = 16
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getDouble(3), row.getLong(4)) === ((4L, 4L, 8L, 0.5, 200L)))
  }

  test("skewed fixture matches a driver-side sort at every rank") {
    // heavy duplicate mass at 1.0 plus a long sparse tail
    val prices = Seq.fill(500)(1.0) ++ (1 to 100).map(i => 1000.0 + i * 7)
    val cents = prices.map(p => math.floor(p * 100).toLong).sorted
    val n = cents.length
    def kth(qm: Long) = cents(((n * qm + 999999) / 1000000 - 1).toInt)
    val got = run(prices)
    for ((q, qm) <- Seq(0.5 -> 500000L, 0.9 -> 900000L, 0.99 -> 990000L))
      assert(got(q) === ((n.toLong, (n * qm + 999999) / 1000000, kth(qm))),
        s"q=$q")
  }

  test("q196 MAD: hand-computed fence and a driver-side sorted replay") {
    // hand case: cents {100,200,300,400,10000} → median 300 (rank 3),
    // deviations {200,100,0,100,9700} → MAD 100 (sorted {0,100,100,200,
    // 9700}, rank 3); fence 3·1.4826·100 = 444.78 → only 9700 flags
    val got = SparkEntry.queries("q196_mad_outliers")(
      spark, fixture(Seq(1.0, 2.0, 3.0, 4.0, 100.0))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === Seq(("N", 5L, 300L, 100L, 1L)), got.mkString(","))

    // driver-side sorted replay on a deterministic pseudo-random corpus:
    // the engine's two-pass two-level decomposition vs a plain Scala sort
    val rnd = new scala.util.Random(23)
    val prices = Seq.fill(801)(math.floor(rnd.nextDouble() * 10000) / 100.0)
    val cents = prices.map(p => math.round(p * 100))
    def discMedian(xs: Seq[Long]): Long = {
      val k = (50 * xs.size + 99) / 100
      xs.sorted.apply(k - 1)
    }
    val m = discMedian(cents)
    val mad = discMedian(cents.map(c => math.abs(c - m)))
    val nOut = cents.count(c => 10000L * math.abs(c - m) > 44478L * mad)
    val got2 = SparkEntry.queries("q196_mad_outliers")(spark, fixture(prices))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).head
    assert(got2 === ((801L, m, mad, nOut)), s"got $got2 want ($m, $mad, $nOut)")
  }
}
