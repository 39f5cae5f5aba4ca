package graft

import graft.queries.Dedup
import org.apache.spark.sql.functions._

/** The single-edit-recovery property of q96's content-derived blocking
  * (Dedup.linkageCandidates), exercised on FREE-FORM names the TPC-H
  * fixture never shows — the keys must carry the guarantee, not the
  * fixture's `Supplier#NNNNNNNNN` layout.
  */
class FuzzyLinkageSpec extends SparkSpec {

  private def candidates(names: Seq[(Long, String)]) = {
    import spark.implicits._
    Dedup.linkageCandidates(names.toDF("id", "name"), "id", "name")
  }

  private def matched(names: Seq[(Long, String)]): Set[(Long, Long)] =
    candidates(names)
      .filter(levenshtein(col("name_a"), col("name_b")) <= 1)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("free-form digitless names: a substitution in either parity class is recovered") {
    // alphanumeric-core fallback; one edit placed in EACH parity class
    val pairs = matched(Seq(
      1L -> "Acme Corporation",
      2L -> "Acmf Corporation", // odd-position edit → even-class key recovers
      3L -> "Acme Corporatjon", // even-position edit → odd-class key recovers
      4L -> "Globex Industries",
    ))
    assert(pairs.contains((1L, 2L)), pairs)
    assert(pairs.contains((1L, 3L)), pairs)
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), pairs)
  }

  test("digit-bearing names: the digit run is the core, template is ignored") {
    val names = Seq(
      1L -> "invoice 10023",
      2L -> "invoice 10024", // even-position digit edit → odd-class key recovers
      3L -> "invoice 20023", // even-position digit edit → odd-class key recovers
      4L -> "INVOICE-10023", // same core under a different template
    )
    val pairs = matched(names)
    assert(pairs === Set((1L, 2L), (1L, 3L)), pairs)
    // the re-templated twin IS a candidate (identical core ⇒ both keys
    // match); only the raw edit-distance filter excludes it
    val cand = candidates(names)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 4L)), cand)
  }

  test("an indel that shifts every position is the documented coverage miss") {
    // deleting the leading character flips every later position's parity,
    // so BOTH class keys differ — blocking is LSH-style coverage, not
    // certainty (operator scaladoc)
    assert(matched(Seq(1L -> "Acme Corporation", 2L -> "cme Corporation"))
      .isEmpty)
  }
}
