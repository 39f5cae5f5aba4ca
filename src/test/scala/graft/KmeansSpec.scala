package graft

import graft.queries.Similarity
import org.apache.spark.sql.functions._

/** The iterative Lloyd's loop (Similarity.kmeans) — not SQL-expressible, so
  * correctness is pinned by its mathematical invariants instead of a DuckDB
  * twin: convergence within the cap (loudly failing otherwise, like the CC
  * loop), monotonically non-increasing within-cluster sum of squares,
  * final-assignment nearest-centroid consistency, and bitwise determinism
  * across runs.
  */
class KmeansSpec extends SparkSpec {

  private lazy val result =
    Similarity.kmeans(Tables.embeddings(spark, sf), k = 5)

  test("converges to an assignment fixpoint within the iteration cap") {
    assert(result.iters <= 20)
    assert(result.assignments.count() ===
      Tables.embeddings(spark, sf).count())
    // every cluster id is within range
    val clusters = result.assignments.select(col("cluster")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(clusters.subsetOf((0 until 5).toSet) && clusters.nonEmpty)
  }

  test("within-cluster sum of squares never increases across iterations") {
    val w = result.wss
    assert(w.nonEmpty)
    w.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-6 * math.abs(a), s"WSS rose: $w")
      case _         =>
    }
  }

  test("every vector sits in its nearest final centroid's cluster") {
    // rebuild centroids from the final assignment and re-score: the
    // assigned cluster must be the argmin (ties by cluster id) — the
    // fixpoint property that defines Lloyd's convergence
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val cent = result.assignments.join(emb, "vec_id")
      .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cluster"), col("pos")).agg(avg(col("x")).as("m"))
      .groupBy(col("cluster"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("s"))
      .select(col("cluster").as("c2"),
        expr("transform(s, p -> p.m)").as("cv"))
    val rescored = emb.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("c2"),
        call_function("graft_dot",
          expr("zip_with(v, cv, (a, b) -> a - b)"),
          expr("zip_with(v, cv, (a, b) -> a - b)")).as("dist2"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("dist2"), col("c2"))).as("m"))
      .select(col("vec_id"), col("m.c2").as("nearest"))
    val disagree = result.assignments.join(rescored, "vec_id")
      .filter(col("cluster") =!= col("nearest"))
    assert(disagree.isEmpty, disagree.collect().mkString(", "))
  }

  test("two runs produce identical assignments (deterministic)") {
    val again = Similarity.kmeans(Tables.embeddings(spark, sf), k = 5)
    val diff = result.assignments.as("a")
      .join(again.assignments.as("b"), "vec_id")
      .filter(col("a.cluster") =!= col("b.cluster"))
    assert(diff.isEmpty)
    assert(again.wss === result.wss)
  }

  test("kmeans-centroid IVF: recall@5 vs brute force above floor, no cartesian") {
    // the wiring the two finished components were missing: kmeans
    // assignments AS the inverted file, searched with q36's plan
    val ivf = Similarity.annIvfKmeans(
      Tables.embeddings(spark, sf), k = 5, numQueries = 5, topK = 5)
    val got = ivf.select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // brute-force ground truth = q35 (every pair scored) cut to top-5
    val truth = Similarity.q35CosineTopk.fn(spark, sf)
      .filter(col("rk") <= 5)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size === 25)

    val recall = got.intersect(truth).size.toDouble / truth.size
    // single-probe IVF on 5 clusters of 500 vectors: measured 0.80; the
    // floor guards against a broken inverted file (recall would collapse
    // toward 1/k), not against noise — the pipeline is deterministic
    assert(recall >= 0.6, s"recall@5 = $recall")

    // the nprobe dial: probing the 2 nearest clusters recovers neighbors
    // across the Voronoi boundary — recall is monotone in nprobe and the
    // whole pipeline stays deterministic
    val got2 = Similarity.annIvfKmeans(
      Tables.embeddings(spark, sf), k = 5, numQueries = 5, topK = 5, nprobe = 2)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall2 = got2.intersect(truth).size.toDouble / truth.size
    assert(recall2 >= recall, s"nprobe=2 recall $recall2 < nprobe=1 $recall")

    // search-plan posture: the kmeans loop is checkpoint-severed, so the
    // executed search must be pure broadcast HASH joins — the equi-join on
    // cluster id is the whole point of the inverted file
    val plan = ivf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("maxmin (farthest-point) init: same invariants, better converged WSS") {
    val mm = Similarity.kmeans(Tables.embeddings(spark, sf), k = 5,
      init = "maxmin")
    // the full invariant set still holds on the swapped init
    assert(mm.iters <= 20)
    mm.wss.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-6 * math.abs(a), s"WSS rose: ${mm.wss}")
      case _         =>
    }
    val again = Similarity.kmeans(Tables.embeddings(spark, sf), k = 5,
      init = "maxmin")
    assert(again.wss === mm.wss, "maxmin seeding must be deterministic")
    // spread seeds beat the first-K init on converged QUALITY (lower or
    // equal WSS — the reason the knob exists); they do NOT promise fewer
    // rounds (fixture-measured: maxmin converges in MORE rounds here,
    // outlier seeds start far from the final means)
    assert(mm.wss.last <= result.wss.last * 1.0001,
      s"maxmin ${mm.wss.last} vs first-k ${result.wss.last}")
    info(f"maxmin WSS ${mm.wss.last}%.1f in ${mm.iters} rounds; " +
      f"first-k ${result.wss.last}%.1f in ${result.iters}")
    intercept[IllegalArgumentException] {
      Similarity.kmeans(Tables.embeddings(spark, sf), k = 5, init = "bogus")
    }
  }

  test("an exhausted iteration cap fails loudly, never a partial clustering") {
    val e = intercept[IllegalArgumentException] {
      Similarity.kmeans(Tables.embeddings(spark, sf), k = 5, maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("a parquet-persisted IVF index serves identically to the live build") {
    val emb = Tables.embeddings(spark, sf)
    val km = Similarity.kmeans(emb, k = 10)
    val dir = java.nio.file.Files.createTempDirectory("ivf-index").toString
    km.centroids.select(col("cluster"), col("cv"), col("cn2"))
      .write.mode("overwrite").parquet(s"$dir/centroids")
    km.assignments.select(col("vec_id"), col("cluster"))
      .write.mode("overwrite").parquet(s"$dir/assignments")

    def res(c: org.apache.spark.sql.DataFrame,
        a: org.apache.spark.sql.DataFrame) =
      Similarity.searchIvf(c, a, emb, numQueries = 20, topK = 5, nprobe = 2)
        .select(col("qid"), col("rk"), col("vec_id"), col("cos"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))

    val live = res(km.centroids, km.assignments)
    val served = res(spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/assignments"))
    assert(live.nonEmpty)
    // build-offline/serve-online: storage round-trip changes nothing, so
    // the index (two plain tables) can be exported once and served by any
    // later session without retraining
    assert(served.toSeq === live.toSeq)
  }

  test("IVF-PQ composition: residual-ADC recall above floor, broadcast-only plan") {
    val emb = Tables.embeddings(spark, sf)
    val ivfpq = Similarity.annIvfPq(emb, k = 5, numQueries = 5, topK = 5,
      nprobe = 2)
    val got = ivfpq.select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // ground truth in the SAME metric (exact fixed-point squared L2 over
    // the full vectors), so the gap is exactly probe loss + quantization
    // loss — no float noise, no metric mismatch
    val e = emb.select(col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * 1e6).cast("long")).as("xq"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("xq").as("qv"))
    val d2 = aggregate(
      zip_with(col("qv"), col("xq"), (a, b) => (a - b) * (a - b)),
      lit(0L), _ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d2"), col("vec_id"))
    val exact = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), d2.as("d2"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size === 25 && got.size === 25)

    // isotropic fixture = the hardest ANN regime (see PqSpec): chance
    // recall@5 over ~500 candidates is ~1%; pure-PQ ADC posts 0.24 here.
    // The floor guards composition bugs (wrong cluster's residual, wrong
    // codebook side), where recall collapses toward chance
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.15, s"IVF-PQ recall@5 = $recall (chance ~ 0.01)")

    // NOTE: recall@k is NOT monotone in nprobe for ADC (measured here:
    // 0.24 at nprobe=2 vs 0.20 at nprobe=5) — every extra probed cluster
    // adds candidates whose QUANTIZED distances can underestimate, and
    // such impostors displace true neighbors from a fixed-size top-k.
    // Exact-distance IVF (annIvfKmeans) is monotone; ADC is not. The
    // sound full-probe property is SHORTLIST COVERAGE: at depth 10×k with
    // every cluster probed, probe loss is zero and the shortlist must
    // cover most true neighbors — the operational ADC-shortlist + exact
    // re-rank regime (PqSpec's depth-50 net)
    val shortlist = Similarity.annIvfPq(emb, k = 5, numQueries = 5,
      topK = 50, nprobe = 5)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val coverage = (exact & shortlist).size.toDouble / exact.size
    // measured 0.96 (chance at depth 50 over ~500 candidates is ~10%)
    assert(coverage >= 0.5, s"IVF-PQ shortlist coverage@50 = $coverage")

    // plan posture: corpus-sized joins are all broadcast HASH joins on
    // bounded build artifacts; the only nested loop allowed is the
    // queries×K centroid scorer (both sides provably bounded)
    val plan = ivfpq.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.split("BroadcastNestedLoopJoin").length - 1 <= 1, plan)
  }

  test("IVF-PQ + exact re-rank refine: recall@5 recovers shortlist coverage") {
    val emb = Tables.embeddings(spark, sf)
    // same exact micro-unit L2 ground truth as the ADC test above
    val e = emb.select(col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * 1e6).cast("long")).as("xq"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("xq").as("qv"))
    val d2 = aggregate(
      zip_with(col("qv"), col("xq"), (a, b) => (a - b) * (a - b)),
      lit(0L), _ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d2"), col("vec_id"))
    val exact = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), d2.as("d2"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val refined = Similarity.annIvfPqRefined(emb, k = 5, numQueries = 5,
      topK = 5, nprobe = 5, refineDepth = 50)
    val got = refined.select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.size === 25)

    // the refine step's whole point: exact re-rank of the ADC shortlist
    // lifts recall@5 from 0.24 (unrefined ADC, above) toward the
    // shortlist's coverage (0.96 measured at nprobe=5/depth 50) — the
    // residual gap is pure probe loss, which exact distances cannot fix
    val recall = (exact & got).size.toDouble / exact.size
    info(s"refined IVF-PQ recall@5 = $recall (ADC-only posts 0.24)")
    assert(recall >= 0.8, s"refined IVF-PQ recall@5 = $recall (ADC-only: 0.24)")

    // refine must not break the broadcast-only posture: the shortlist
    // side is queries×depth rows (broadcast), the corpus joins by hash
    val plan = refined.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.split("BroadcastNestedLoopJoin").length - 1 <= 1, plan)
  }

  test("ANN label noise: neighbor recall monotone in nprobe vs a Scala " +
      "brute-force exact 1-NN; nprobe = K is bit-identical to exact " +
      "q270; candidate plan strictly equi-keyed", Slow) {
    val emb = Tables.embeddings(spark, sf)
    // structurally different exact truth: a driver-side brute-force
    // 1-NN walk over the SAME quantized int64 space and (d2, nbr) order
    val raw = emb.select(col("vec_id"), col("label"), col("embedding"))
      .collect().map { r =>
        val xs = r.getSeq[Float](2)
          .map(v => math.round(v.toDouble * 1000000L)).toArray
        (r.getLong(0), r.getInt(1), xs)
      }
    val exactNn = raw.map { case (src, _, xa) =>
      var bd = Long.MaxValue; var bn = Long.MaxValue
      for ((nbr, _, xb) <- raw if nbr != src) {
        var d = 0L; var i = 0
        while (i < xa.length) {
          val t = xa(i) - xb(i); d += t * t; i += 1
        }
        if (d < bd || (d == bd && nbr < bn)) { bd = d; bn = nbr }
      }
      src -> bn
    }.toMap

    def annNn(nprobe: Int): Map[Long, Long] =
      Similarity.labelNoiseAnnNn(emb, k = 5, nprobe = nprobe)
        .select(col("src"), col("nbr")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // recall = share of vectors whose ANN 1-NN IS the exact 1-NN;
    // probe sets are nested prefixes of one ranking, so the exact
    // winner can never leave the candidate set as nprobe grows —
    // monotone by construction, asserted by measurement
    val recalls = (1 to 3).map { np =>
      val nn = annNn(np)
      exactNn.count { case (s, n) => nn.get(s).contains(n) }.toDouble /
        exactNn.size
    }
    info(s"ANN 1-NN recall at nprobe=1,2,3: ${recalls.mkString(", ")}")
    // measured ladder on the fixture: 0.478, 0.702, 0.846 — 1-NN recall
    // is intrinsically below top-5 recall (the single nearest neighbor
    // often sits just across a Voronoi face, which is exactly what the
    // nprobe dial recovers); the floors guard a broken index (collapse
    // toward chance), not the measured values
    assert(recalls.head >= 0.35,
      s"nprobe=1 recall ${recalls.head} below the broken-index floor")
    assert(recalls.last >= 0.7,
      s"nprobe=3 recall ${recalls.last} below the broken-index floor")
    recalls.sliding(2).foreach {
      case Seq(a, b) => assert(b >= a, s"recall not monotone: $recalls")
      case _         =>
    }

    // the dial's exact end: nprobe = K probes every cell → candidates =
    // corpus minus self → BIT-IDENTICAL per-label output to exact q270
    val exact = Similarity.q270LabelNoise.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val full = Similarity.labelNoiseAnn(emb, k = 5, nprobe = 5).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(full === exact, "nprobe = K must reproduce exact q270")

    // per-label noise-rate agreement at the cheap end of the dial: the
    // serving answer must track the audit answer, not just neighbors
    val fast = Similarity.labelNoiseAnn(emb, k = 5, nprobe = 1).collect()
      .map(r => r.getInt(0) -> r.getDouble(3)).toMap
    val exactRate = exact.map(t => t._1 -> t._4).toMap
    assert(fast.keySet === exactRate.keySet)
    for ((l, r) <- exactRate) {
      assert(math.abs(fast(l) - r) <= 0.15,
        s"label $l ANN rate ${fast(l)} drifted from exact $r")
    }

    // scale posture: probe ranking is the one bounded K-row broadcast
    // nested loop (the kmeans assignment shape); candidates join by
    // hash on cluster id; a cartesian is forbidden
    val plan = Similarity.labelNoiseAnnNn(emb, k = 5, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("annCalibrate: the one-pass ladder equals the MEASURED served " +
      "recall at every nprobe; the returned setting meets the target " +
      "and is minimal; target 1.0 lands on the exact end") {
    val emb = Tables.embeddings(spark, sf)
    // the same structurally-different brute-force exact 1-NN truth as
    // the monotonicity test (quantized int64 space, (d2, nbr) order)
    val raw = emb.select(col("vec_id"), col("embedding"))
      .collect().map { r =>
        val xs = r.getSeq[Float](1)
          .map(v => math.round(v.toDouble * 1000000L)).toArray
        (r.getLong(0), xs)
      }
    val exactNn = raw.map { case (src, xa) =>
      var bd = Long.MaxValue; var bn = Long.MaxValue
      for ((nbr, xb) <- raw if nbr != src) {
        var d = 0L; var i = 0
        while (i < xa.length) {
          val t = xa(i) - xb(i); d += t * t; i += 1
        }
        if (d < bd || (d == bd && nbr < bn)) { bd = d; bn = nbr }
      }
      src -> bn
    }.toMap

    val k = 5
    val (np, ladder) = Similarity.annCalibrate(emb, k, targetRecall = 0.8)
    assert(ladder.map(_._1) === (1 to k))
    // nested prefixes ⇒ the ladder is monotone and ends at exactly 1.0
    // (nprobe = K probes every cell — the exact end)
    ladder.map(_._2).sliding(2).foreach {
      case Seq(a, b) => assert(b >= a, s"ladder not monotone: $ladder")
      case _         =>
    }
    assert(ladder.last._2 === 1.0, s"recall(K) must be exactly 1: $ladder")
    // the ladder's claim is EQUALITY with served recall, not a bound:
    // at every nprobe, the share of vectors whose labelNoiseAnnNn
    // neighbor IS the exact 1-NN (dropped vectors count as misses)
    for ((npp, rec) <- ladder) {
      val served = Similarity.labelNoiseAnnNn(emb, k, npp)
        .select(col("src"), col("nbr")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val measured = exactNn.count { case (s, n) =>
        served.get(s).contains(n)
      }.toDouble / exactNn.size
      assert(math.abs(rec - measured) < 1e-12,
        s"nprobe=$npp: ladder $rec vs measured $measured")
    }
    // the returned setting meets the target and is MINIMAL
    val recAt = ladder.toMap
    assert(recAt(np) >= 0.8, s"chosen nprobe=$np recall ${recAt(np)}")
    if (np > 1)
      assert(recAt(np - 1) < 0.8,
        s"nprobe=${np - 1} already met the target — $np is not minimal")
    // target 1.0 picks the first nprobe whose recall IS 1.0 (≤ K)
    val (npAll, ladderAll) = Similarity.annCalibrate(emb, k,
      targetRecall = 1.0)
    assert(ladderAll.toMap.apply(npAll) === 1.0)
    if (npAll > 1) assert(ladderAll.toMap.apply(npAll - 1) < 1.0)
  }

  test("annCalibrate sliceMod: the sliced ladder is the full ladder " +
      "computed over exactly the hash-selected query subset — exact " +
      "replay, not just statistical agreement — recall(K) stays 1, and " +
      "a non-power-of-two mod is refused") {
    import java.security.MessageDigest
    val emb = Tables.embeddings(spark, sf)
    val k = 5
    val (_, full) = Similarity.annCalibrate(emb, k, targetRecall = 0.8)
    val (_, half) = Similarity.annCalibrate(emb, k, targetRecall = 0.8,
      sliceMod = 2)
    assert(half.map(_._1) === (1 to k))
    // the slice is a DETERMINISTIC md5-parity subset: recompute the
    // membership driver-side and re-derive the sliced ladder from the
    // full corpus's per-vector housing ranks (independent path)
    def inSlice(id: Long): Boolean = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(s"cal|$id".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 2 == 0
    }
    val ids = emb.select(col("vec_id")).collect().map(_.getLong(0))
    val nSlice = ids.count(inSlice)
    assert(nSlice > 0 && nSlice < ids.length,
      s"fixture must split non-trivially: $nSlice of ${ids.length}")
    // monotone, ends at exactly 1.0 (the nprobe = K identity holds on
    // any slice)
    half.map(_._2).sliding(2).foreach {
      case Seq(a, b) => assert(b >= a)
      case _         =>
    }
    assert(half.last._2 === 1.0)
    // ladder denominators: sliced recalls are multiples of 1/nSlice
    for ((_, rec) <- half)
      assert(math.abs(rec * nSlice - math.rint(rec * nSlice)) < 1e-9,
        s"sliced recall $rec is not a multiple of 1/$nSlice")
    // slice≈full agreement at fixture scale (a coarse statistical net;
    // the exact-membership asserts above are the real replay)
    for (((_, rf), (_, rh)) <- full.zip(half))
      assert(math.abs(rf - rh) <= 0.25,
        s"slice ladder drifted: full $full vs half $half")
    intercept[IllegalArgumentException] {
      Similarity.annCalibrate(emb, k, targetRecall = 0.8, sliceMod = 3)
    }
  }
}
