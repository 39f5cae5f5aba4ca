package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (hash, id) candidate for [[BottomK]]. The hash is computed OUTSIDE
  * the aggregator (15 hex chars of md5 → long, the q51 idiom) so the
  * aggregate itself is pure order statistics — and so the DuckDB oracle can
  * order by the same bytes.
  */
case class HashedId(h: Long, id: Long)

/** Bottom-k-by-hash sampling — the `Aggregator[IN, BUF, OUT]` form of
  * deterministic per-group uniform sampling (SURVEY §2.10's sanctioned
  * custom-aggregate surface; still zero row-level UDFs — this is an
  * aggregate with algebraic partials, not a per-row function).
  *
  * Keeping the k smallest ids by a keyed hash IS a uniform sample without
  * replacement (min-wise / bottom-k sketch), and it is an ALGEBRAIC
  * aggregate: partials merge by sorted-merge-truncate. That buys the
  * scale shape a window row_number ≤ k (q17's formulation) cannot: a
  * hash aggregate with map-side combine, where every map task ships AT
  * MOST k rows per group — no per-partition sort, no WindowGroupLimit
  * pass, shuffle mass `groups × tasks × k` instead of all rows. The
  * buffer invariant (sorted ascending by (h, id), length ≤ k) makes
  * `reduce` O(1) for the common no-op case (row hashes above the current
  * k-th) and O(k) otherwise.
  *
  * Determinism: md5 is collision-free at fixture scale and ties break by
  * id, so the sample is a pure function of the id set — the oracle
  * reproduces it with `row_number() OVER (ORDER BY hex, id) <= k`.
  */
class BottomK(k: Int) extends Aggregator[HashedId, Seq[HashedId], Seq[Long]] {
  require(k > 0, s"bottom-k needs k > 0, got $k")

  override def zero: Seq[HashedId] = Vector.empty

  override def reduce(buf: Seq[HashedId], a: HashedId): Seq[HashedId] =
    if (buf.size >= k && cmpGte(a, buf.last)) buf
    else ((buf :+ a).sortBy(x => (x.h, x.id)): Seq[HashedId]).take(k)

  override def merge(b1: Seq[HashedId], b2: Seq[HashedId]): Seq[HashedId] =
    ((b1 ++ b2).sortBy(x => (x.h, x.id)): Seq[HashedId]).take(k)

  override def finish(r: Seq[HashedId]): Seq[Long] = r.map(_.id)

  private def cmpGte(a: HashedId, b: HashedId): Boolean =
    a.h > b.h || (a.h == b.h && a.id >= b.id)

  override def bufferEncoder: Encoder[Seq[HashedId]] =
    ExpressionEncoder[Seq[HashedId]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
