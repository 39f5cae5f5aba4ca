package graft

import org.apache.spark.sql.functions._

/** r20 forced-B equality nets for [[queries.Similarity.blockedSelfPairs]]
  * — the triangle-blocked label self-join behind q34/q102/q183/q269.
  * Block membership is pure plan: ANY bucket count B must emit exactly
  * the plain join's pair multiset, in both the ordered (a < b, lower id
  * in the `a` role) and directed (a ≠ b, both orientations) modes, NULL
  * labels and NULL vec_ids pairing with nothing.
  */
class BlockedPairsSpec extends SparkSpec {

  private lazy val fixture = {
    import spark.implicits._
    // 3 real labels with UNEVEN sizes (29/17/13), one NULL-label row, one
    // NULL-vec_id row — the join-semantics edges the mixed blocks skip
    // idCond for
    val rows: Seq[(java.lang.Long, java.lang.Integer, Seq[Double])] =
      (0L until 59L).map { i =>
        val lab: java.lang.Integer =
          if (i < 29) 0 else if (i < 46) 1 else 2
        (Long.box(i), lab, Seq.tabulate(4)(j => (i * 7 + j * 3 % 11) / 10.0))
      } ++ Seq(
        (Long.box(100L), null, Seq(1.0, 2.0, 3.0, 4.0)),
        (null, Int.box(0), Seq(4.0, 3.0, 2.0, 1.0)))
    rows.toDF("vec_id", "label", "v")
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("forced-B blocked pairs == plain join, ordered and directed") {
    for (directed <- Seq(false, true)) {
      val plain =
        canon(queries.Similarity.blockedSelfPairs(fixture, directed, Some(1L)))
      // sanity: the fixture's pair multiset is the label-block triangle
      val expect = Seq(29, 17, 13).map(n => n * (n - 1) / 2).sum *
        (if (directed) 2 else 1)
      assert(plain.size === expect, s"plain join size (directed=$directed)")
      for (b <- Seq(2L, 3L, 7L, 64L)) {
        val blocked = canon(
          queries.Similarity.blockedSelfPairs(fixture, directed, Some(b)))
        assert(blocked === plain, s"B=$b directed=$directed diverged")
      }
    }
  }

  test("auto dispatch stays plain below the provable row bound") {
    // fixture is a LocalRelation of 61 rows — PlanStats proves it small,
    // so the default path is the plain join: no _bi/_bj block columns in
    // the plan, no probe job
    val df = queries.Similarity.blockedSelfPairs(fixture, directed = false)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("_bi"), "small frame must skip the block grid")
    assert(canon(df) ===
      canon(queries.Similarity.blockedSelfPairs(fixture, false, Some(1L))))
  }
}
