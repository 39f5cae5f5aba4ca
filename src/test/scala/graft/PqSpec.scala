package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Similarity.{PqCodes, PqDim, PqSubs}

/** Accuracy and structural nets for the product-quantization family
  * (q103 encode, q104 ADC search). The oracle rows pin both queries
  * exactly (all-integer math), so these tests cover what a hash-match
  * can't: that the APPROXIMATION is any good — ADC recall against the
  * exact integer scan — and the codebook identities that make PQ sound.
  * Geometry (subspaces, dims, codes) is imported from Similarity so the
  * nets track any re-tuning of the codebook.
  */
class PqSpec extends SparkSpec {

  private def fixedPoint =
    Tables.embeddings(spark, sf).select(col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * 1e6).cast("long")).as("xq"))

  test("codebook members encode to themselves with zero distortion") {
    val codes = SparkEntry.queries("q103_pq_encode")(spark, sf)
      .filter(col("vec_id") < PqCodes).collect()
    assert(codes.length === PqCodes)
    codes.foreach { r =>
      val id = r.getLong(0)
      for (i <- 1 to PqSubs)
        assert(r.getLong(i) === id, s"vec $id sub ${i - 1} -> ${r.getLong(i)}")
      assert(r.getLong(PqSubs + 1) === 0L, s"vec $id distortion ${r.getLong(PqSubs + 1)}")
    }
    // non-members carry strictly positive distortion on this corpus (no
    // duplicate vectors in the fixtures) — the encoder is not degenerate
    val rest = SparkEntry.queries("q103_pq_encode")(spark, sf)
      .filter(col("vec_id") >= PqCodes && col("dist2_total") === 0).count()
    assert(rest === 0L)
  }

  test("ADC recall beats chance 15x at depth 5 and covers top-5 at depth 50") {
    // The fixture is ISOTROPIC random data — within-label and cross-label
    // mean distances are equal and the 5th-nearest neighbour sits at 0.71
    // of the median distance — the provably hardest regime for any ANN
    // sketch, so the net is chance-calibrated rather than pinned to the
    // cozy recalls PQ posts on clustered corpora. Chance recall@5 over
    // 499 candidates is 5/499 ~ 1%; chance shortlist coverage at depth 50
    // is 10%. Exact ranking uses the SAME metric (fixed-point squared
    // L2), so the gap to q104 is PURELY quantization loss, not float
    // noise. Measured: 0.24 @5 (24x chance), 0.72 @50 (7x chance).
    val e = fixedPoint
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("xq").as("qv"))
    val d2 = aggregate(
      zip_with(col("qv"), col("xq"), (a, b) => (a - b) * (a - b)),
      lit(0L), _ + _)
    val w = Window.partitionBy(col("qid")).orderBy(col("d2"), col("vec_id"))
    val exact = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), d2.as("d2"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("qid"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adc = SparkEntry.queries("q104_pq_adc_topk")(spark, sf)
      .select(col("qid"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size === 25 && adc.size === 25)
    val recall = (exact & adc).size.toDouble / exact.size
    assert(recall >= 0.15, s"ADC recall@5 = $recall (chance ~ 0.01)")

    // operational shortlist regime: ADC prunes to a 10% shortlist, exact
    // re-rank finishes — coverage of the true top-5 inside ADC top-50 is
    // what a PQ index actually has to deliver
    val sub = (0 until PqSubs).map { s0 =>
      SparkEntry.queries("q103_pq_encode")(spark, sf)
        .select(col("vec_id"), lit(s0).as("sub"), col(s"c$s0").as("code_id"))
    }.reduce(_ unionAll _)
    val sv = fixedPoint.select(col("vec_id"),
      explode(sequence(lit(0), lit(PqSubs - 1))).as("sub"), col("xq"))
      .select(col("vec_id"), col("sub"),
        slice(col("xq"), col("sub") * PqDim + 1, lit(PqDim)).as("sv"))
    val cb = sv.filter(col("vec_id") < PqCodes)
      .select(col("vec_id").as("code_id"), col("sub"), col("sv").as("cv"))
    val pd2 = aggregate(
      zip_with(col("qsv"), col("cv"), (a, b) => (a - b) * (a - b)),
      lit(0L), _ + _)
    val w50 = Window.partitionBy(col("qid")).orderBy(col("adist"), col("cand"))
    val shortlist = sv.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("sub"), col("sv").as("qsv"))
      .join(sub.withColumnRenamed("vec_id", "cand"), Seq("sub"))
      .join(broadcast(cb), Seq("sub", "code_id"))
      .filter(col("cand") =!= col("qid"))
      .groupBy(col("qid"), col("cand")).agg(sum(pd2).as("adist"))
      .withColumn("rk", row_number().over(w50)).filter(col("rk") <= 50)
      .select(col("qid"), col("cand"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cov = (exact & shortlist).size.toDouble / exact.size
    assert(cov >= 0.6, s"top-5 coverage in ADC top-50 = $cov (chance ~ 0.10)")
  }

  test("ADC distance of a database vector equals the table-free rebuild") {
    // ADC(q, x) must equal sum over subspaces of d2(q_sub, code(x_sub)) —
    // rebuild it per pair from the q103 assignments, no distance table
    val codes = SparkEntry.queries("q103_pq_encode")(spark, sf)
    val sub = (0 until PqSubs).map { s0 =>
      codes.select(col("vec_id"), lit(s0).as("sub"),
        col(s"c$s0").as("code_id"))
    }.reduce(_ unionAll _)
    val sv = fixedPoint.select(col("vec_id"),
      explode(sequence(lit(0), lit(PqSubs - 1))).as("sub"), col("xq"))
      .select(col("vec_id"), col("sub"),
        slice(col("xq"), col("sub") * PqDim + 1, lit(PqDim)).as("sv"))
    val cb = sv.filter(col("vec_id") < PqCodes)
      .select(col("vec_id").as("code_id"), col("sub"), col("sv").as("cv"))
    val d2 = aggregate(
      zip_with(col("qsv"), col("cv"), (a, b) => (a - b) * (a - b)),
      lit(0L), _ + _)
    val rebuilt = sv.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("sub"), col("sv").as("qsv"))
      .join(sub.withColumnRenamed("vec_id", "cand"), Seq("sub"))
      .join(broadcast(cb), Seq("sub", "code_id"))
      .filter(col("cand") =!= col("qid"))
      .groupBy(col("qid"), col("cand")).agg(sum(d2).as("adist"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val adc = SparkEntry.queries("q104_pq_adc_topk")(spark, sf).collect()
    assert(adc.nonEmpty)
    adc.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert(rebuilt(k) === r.getLong(2), s"pair $k")
    }
  }

  test("semantic dedup keeps every block minimum and only prunes dominated ids") {
    val kept = SparkEntry.queries("q102_semantic_dedup")(spark, sf)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val e = Tables.embeddings(spark, sf)
    val total = e.count()
    assert(kept.size < total, "threshold 0.35 must prune something here")
    // the lowest vec_id of every label block is undominatable — always kept
    val mins = e.groupBy(col("label")).agg(min(col("vec_id")).as("m"))
      .collect().map(_.getLong(1))
    mins.foreach(m => assert(kept.contains(m), s"block min $m pruned"))
  }
}
