package graft

import graft.queries.Dedup
import org.apache.spark.sql.functions._

/** Connected-components hardening (round-6 verdict item 2): the old loop
  * capped at 20 rounds and exited SILENTLY, so a component deeper than the
  * cap would emit wrong (unmerged) labels. Now a 30-deep chain — diameter
  * past the old cap — must converge (pointer jumping makes rounds
  * logarithmic in diameter), and an under-provisioned cap must throw, never
  * return partial labels.
  */
class DedupCcSpec extends SparkSpec {

  private def chainEdges(n: Int) = {
    import spark.implicits._
    val e0 = (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("a", "b")
    e0.union(e0.select(col("b").as("a"), col("a").as("b")))
  }

  test("a 30-deep chain converges to one component (past the old 20 cap)") {
    val labels = Dedup.connectedComponents(chainEdges(30))
    val comps = labels.select(col("component")).distinct().collect()
    assert(comps.map(_.getLong(0)).toSeq == Seq(0L))
    assert(labels.count() === 30)
  }

  test("an exhausted iteration cap fails loudly instead of mislabeling") {
    val e = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(chainEdges(300), maxIter = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("two disjoint chains keep separate min labels") {
    import spark.implicits._
    val c1 = (0 until 5).map(i => (i.toLong, i.toLong + 1))
    val c2 = (100 until 104).map(i => (i.toLong, i.toLong + 1))
    val e0 = (c1 ++ c2).toDF("a", "b")
    val edges = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
    val labels = Dedup.connectedComponents(edges)
    val byComp = labels.groupBy(col("component")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byComp === Map(0L -> 6L, 100L -> 5L))
  }
}
