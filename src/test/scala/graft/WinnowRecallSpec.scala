package graft

import org.apache.spark.sql.functions._

import scala.util.Random

/** Quantified recall for q116's winnowing anchors: detection of a shared
  * passage is probabilistic with ~(L−57)/16 expected anchors, so the spec
  * plants passages of three lengths (20 pairs each, deterministic seed,
  * misaligned offsets) and pins per-length detection floors chosen from
  * the Poisson miss rate (e^−λ): ~400 chars ⇒ λ≈21, certain; ~200 ⇒ λ≈9,
  * near-certain; ~100 ⇒ λ≈2.7, ≥70%. False positives stay zero because
  * every filler token stream is unique per document.
  */
class WinnowRecallSpec extends SparkSpec {

  private def words(rng: Random, n: Int): String =
    Seq.fill(n)("w" + rng.nextInt(1000000000)).mkString(" ")

  test("planted-passage detection matches the anchor-density model") {
    val rng = new Random(42)
    // (approx passage chars, pairs, min detected)
    val buckets = Seq((400, 20, 20), (200, 20, 18), (100, 20, 14))
    var id = 0L
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long, Int, Int)]
    for (((chars, pairs, _), b) <- buckets.zipWithIndex; p <- 0 until pairs) {
      val passage = words(rng, chars / 11) // ~11 chars per token
      val a = passage + " " + words(rng, 30)
      val bTxt = words(rng, 3 + rng.nextInt(8)) + " " + passage + " " +
        words(rng, 10)
      rows += ((id, a, "en", s"b$b", a.length.toLong, b, p)); id += 1
      rows += ((id, bTxt, "en", s"b$b", bTxt.length.toLong, b, p)); id += 1
    }
    // unshared control docs: long, entirely unique content — any dup
    // anchor on these is a false positive
    val lone = (0 until 10).map { _ =>
      val t = words(rng, 60); val i = id; id += 1
      (i, t, "en", "lone", t.length.toLong, -1, -1)
    }
    rows ++= lone
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    rows.toSeq.map { case (i, t, l, s0, n, _, _) => (i, t, l, s0, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val dup = SparkEntry.queries("q116_dup_passages")(spark, dir)
      .filter(col("n_dup_anchors") > 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet

    val byBucket = rows.filter(_._6 >= 0).groupBy(_._6)
    for (((chars, pairs, floor), b) <- buckets.zipWithIndex) {
      // a pair is detected when both docs carry the shared passage's
      // anchors (identical content ⇒ identical anchors)
      val detected = byBucket(b).toSeq.grouped(2)
        .count(g => g.size == 2 && g.forall(r => dup.contains(r._1)))
      assert(detected >= floor,
        s"bucket ~${chars}ch: detected $detected of $pairs, floor $floor")
    }
    // zero false positives on the unshared controls
    val loneIds = lone.map(_._1).toSet
    assert((dup & loneIds) === Set.empty,
      s"controls flagged as duplicated: ${dup & loneIds}")
  }
}
