package graft

/** Nets for q135's histogram-bisection selection: the degenerate
  * mass-concentration corpus (every value identical — the whole
  * distribution in ONE bucket, pass 2 = full sort) and exact rank
  * agreement with a driver-side sort on a small skewed fixture.
  */
class QuantileBisectSpec extends SparkSpec {

  private def fixture(prices: Seq[Double]): String = {
    val d = "/tmp/graft_quantile_fixture"
    import spark.implicits._
    prices.zipWithIndex.map { case (p, i) =>
      (i.toLong, i.toLong, i.toLong, i, 1.0, p, 0.0, 0.0, "N", "O",
        new java.sql.Timestamp(86400000L))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

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
}
