package graft

import graft.functions.{BottomK, HashedId}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Algebraic laws of the BottomK aggregator — the properties the q110/q112
  * scale claim rests on: map-side combine is only correct if ANY split of
  * the input into partials, reduced in any order and merged in any tree
  * shape, yields the same k rows as a global sort. Deterministic fixed-seed
  * property loops (the ExactSpec house style).
  */
class BottomKSpec extends AnyFunSuite {

  private def truth(xs: Seq[HashedId], k: Int): Seq[Long] =
    xs.sortBy(x => (x.h, x.id)).take(k).map(_.id)

  private def randomInput(rng: Random, n: Int): Vector[HashedId] =
    Vector.fill(n)(HashedId(rng.nextInt(50).toLong, rng.nextInt(1000).toLong))

  test("any partitioning + any merge order equals the global bottom-k") {
    val rng = new Random(42)
    for (round <- 1 to 25) {
      val k = 1 + rng.nextInt(6)
      val agg = new BottomK(k)
      val xs = randomInput(rng, 1 + rng.nextInt(200))
      // random partition into 1..8 slices, each reduced independently
      val nParts = 1 + rng.nextInt(8)
      val parts = xs.groupBy(_ => rng.nextInt(nParts)).values.toVector
      val partials = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      // merge in a random order (fold over a shuffled sequence)
      val merged = rng.shuffle(partials).foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) === truth(xs, k), s"round $round k=$k")
      // the buffer invariant the O(1) fast path depends on
      assert(merged.size <= k)
      partials.foreach(p => assert(p.size <= k))
    }
  }

  test("merge is commutative and associative on arbitrary partials") {
    val rng = new Random(7)
    val agg = new BottomK(4)
    for (_ <- 1 to 25) {
      val Seq(a, b, c) = Seq.fill(3)(
        randomInput(rng, rng.nextInt(30)).foldLeft(agg.zero)(agg.reduce))
      assert(agg.merge(a, b) === agg.merge(b, a))
      assert(agg.merge(agg.merge(a, b), c) === agg.merge(a, agg.merge(b, c)))
    }
  }

  test("duplicate (h, id) rows cannot evict distinct survivors") {
    // ties on h resolve by id, and exact duplicates pile up without
    // displacing k distinct winners
    val agg = new BottomK(3)
    val xs = Vector.fill(50)(HashedId(1L, 10L)) ++
      Vector(HashedId(1L, 2L), HashedId(0L, 99L))
    val out = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
    assert(out === Seq(99L, 2L, 10L))
  }
}
