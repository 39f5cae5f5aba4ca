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

  test("q141: survivorship rules pick the right fields; singletons survive") {
    val d = "/tmp/graft_golden_docs"
    import spark.implicits._
    val prefix = "shared prefix 0123456789 0123456789 0123456789 xyz" // 50 chars
    assert(prefix.length >= 50)
    Seq(
      // cluster {1,2,3}: same 50-char prefix; doc 2 longest; langs en,en,fr
      (1L, s"$prefix tail-a", "en", "s1", 56L),
      (2L, s"$prefix much longer tail making it the golden text", "en", "s2", 99L),
      (3L, s"$prefix tail-c", "fr", "s1", 56L),
      (4L, "a lone document unlike any other in this tiny corpus fixture",
        "de", "s9", 61L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q141_golden_record")(spark, d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getString(5),
          r.getString(6), r.getLong(7))))
      .toMap
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // cluster 1: golden text = doc 2's (longest), modal lang en (2 of 3),
    // modal source s1 (2 of 3), max chars 99
    val golden = s"$prefix much longer tail making it the golden text"
    assert(got(1L) === ((3L, 1L, golden.length.toLong, "en", "s1", 99L)))
    val gmd5 = SparkEntry.queries("q141_golden_record")(spark, d).collect()
      .find(_.getLong(0) == 1L).get.getString(3)
    assert(gmd5 === md5(golden))
    // singleton doc 4 is its own total-partition master record (its text
    // is 60 chars; the fixture's n_chars column deliberately disagrees at
    // 61 to prove max_chars reads the COLUMN, not the text)
    assert(got(4L) === ((1L, 4L, 60L, "de", "s9", 61L)))
  }
}
