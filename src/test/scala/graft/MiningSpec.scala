package graft

import org.apache.spark.sql.functions._
import graft.queries.{Analytic, Dedup, Gaps, Similarity}

/** Independent-reimplementation nets for the round's mining/eval family
  * (q165–q171): each test recomputes the operator with a plain driver-side
  * Scala algorithm over a collected fixture — a DIFFERENT computation path
  * than both the Spark plan and the DuckDB oracle (naive quadratic
  * dominance for the skyline sweep, sort-based order stats for the
  * run-decomposed winsorizer, brute-force cosines for the triple miner) —
  * and demands exact agreement, plus law checks where the operator's
  * output is a measurement (LSH recall bounds).
  */
class MiningSpec extends SparkSpec {

  test("q165 skyline sweep equals the quadratic dominance definition") {
    val got = Gaps.q165ParetoSkyline.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val pts = Tables.part(spark, sf)
      .filter(col("p_retailprice").isNotNull && col("p_size").isNotNull)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .collect()
      .map(r => (r.getLong(0), math.round(100 * r.getDouble(1)), r.getInt(2)))
    val expect = pts.filter { a =>
      !pts.exists(b => b._2 <= a._2 && b._3 <= a._3
        && (b._2 < a._2 || b._3 < a._3))
    }.toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("q166 winsorized/trimmed means equal a sort-based reimplementation") {
    val got = Gaps.q166WinsorizedMean.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val rows = Tables.lineitem(spark, sf)
      .filter(col("l_extendedprice").isNotNull)
      .select(col("l_returnflag"), col("l_extendedprice")).collect()
      .map(r => (r.getString(0), math.round(100 * r.getDouble(1))))
    def r6(num: Long, den: Long): Double =
      ((2L * num * 1000000L + den) / (2L * den)).toDouble / 1e6
    // the means ride ratio6Big's quotient/remainder split (the ×10
    // lineitem overflow fix) — the replay mirrors that exact
    // formulation, whose last ulp can differ from single-divide r6
    def r6big(num: Long, den: Long): Double =
      (num / den).toDouble +
        ((2L * (num % den) * 1000000L + den) / (2L * den)).toDouble / 1e6
    val expect = rows.groupBy(_._1).map { case (flag, g) =>
      val xs = g.map(_._2).sorted
      val n = xs.length.toLong
      val k05 = ((5 * n + 99) / 100).toInt
      val k95 = ((95 * n + 99) / 100).toInt
      val (p05, p95) = (xs(k05 - 1), xs(k95 - 1))
      val wsum = xs.map(x => math.max(p05, math.min(p95, x))).sum
      val trimmed = xs.slice(k05, k95) // ranks k05+1 .. k95, 0-indexed
      flag -> ((n, r6(p05, 100), r6(p95, 100), r6big(wsum, 100 * n),
        r6big(trimmed.sum, 100 * trimmed.length)))
    }
    assert(got.keySet === expect.keySet)
    for ((k, v) <- expect) assert(got(k) === v, s"flag $k")
  }

  test("q167 triples equal brute-force cosine mining, and every negative " +
      "crosses the label boundary") {
    val got = Similarity.q167HardNegatives.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3),
        r.getInt(4), r.getDouble(5)))
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Option[Double] = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      val (sa, sb) = (math.sqrt(na), math.sqrt(nb))
      if (sa == 0 || sb == 0) None
      else Some(BigDecimal(d / sa / sb)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val expect = e.filter(_._1 < 5).flatMap { case (qid, qlabel, qv) =>
      val scored = e.filter(_._1 != qid).flatMap { case (vid, vl, v) =>
        cos(qv, v).map(c => (vid, vl, c))
      }
      def top(side: Boolean, k: Int) = scored
        .filter(x => (x._2 == qlabel) == side)
        .sortBy(x => (-x._3, x._1)).take(k).zipWithIndex
        .map { case ((vid, vl, c), i) =>
          (qid, if (side) "pos" else "neg", i + 1, vid, vl, c) }
      top(side = true, 1) ++ top(side = false, 3)
    }
    assert(got.toSet === expect.toSet)
    assert(got.count(_._2 == "neg") == 15 && got.count(_._2 == "pos") == 5)
  }

  test("q168 journey triples equal a per-user sliding-window recount") {
    val got = Analytic.q168SeqTriples.fn(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4))))
    val ev = Tables.events(spark, sf)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val gap = 1800000000L
    val occ = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      rows.sortBy(r => (r._4, r._2)).toSeq.sliding(3).collect {
        case s if s.length == 3
          && s(1)._4 - s(0)._4 <= gap && s(2)._4 - s(1)._4 <= gap =>
          (u, (s(0)._3, s(1)._3, s(2)._3))
      }.toSeq
    }
    val counts = occ.groupBy(_._2).map { case (t, g) =>
      t -> ((g.size.toLong, g.map(_._1).distinct.size.toLong)) }
    val expectTop = counts.toSeq
      .sortBy { case ((a, b, c), (n, _)) => (-n, a, b, c) }.take(10)
    assert(got.toSeq === expectTop.map { case (t, v) => (t, v) })
  }

  test("q169 RFM cells equal a driver-side ntile reimplementation") {
    val got = Analytic.q169RfmSegments.fn(spark, sf).collect()
      .map(r => ((r.getLong(0).toInt, r.getLong(1).toInt,
        r.getLong(2).toInt),
        (r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    val ev = Tables.events(spark, sf)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) 0L else math.round(100 * r.getDouble(2))))
    val u = ev.groupBy(_._1).map { case (uid, g) =>
      (uid, g.map(_._2).max, g.length.toLong, g.map(_._3).sum) }.toSeq
    val mx = u.map(_._2).max
    def ntile5[A](xs: Seq[(Long, A)])(implicit ord: Ordering[A])
        : Map[Long, Int] = {
      val sorted = xs.sortBy(_._2).map(_._1)
      val n = sorted.length
      val (q, rem) = (n / 5, n % 5)
      val sizes = (1 to 5).map(i => q + (if (i <= rem) 1 else 0))
      val bounds = sizes.scanLeft(0)(_ + _)
      sorted.zipWithIndex.map { case (uid, i) =>
        uid -> (bounds.indexWhere(_ > i)) }.toMap
    }
    val rq = ntile5(u.map(x => x._1 -> (((mx - x._2) / 86400000000L), x._1)))
    val fq = ntile5(u.map(x => x._1 -> ((-x._3, x._1))))
    val mq = ntile5(u.map(x => x._1 -> ((-x._4, x._1))))
    def r6(num: Long, den: Long): Double =
      ((2L * num * 1000000L + den) / (2L * den)).toDouble / 1e6
    val expect = u.groupBy(x => (rq(x._1), fq(x._1), mq(x._1)))
      .map { case (cell, g) =>
        val n = g.size.toLong
        cell -> ((n, g.map(x => (mx - x._2) / 86400000000L).min,
          r6(g.map(_._3).sum, n), r6(g.map(_._4).sum, 100 * n)))
      }
    assert(got === expect)
  }

  test("q170 recall clears the banding bound and counts are consistent") {
    val r = Dedup.q170LshRecallEval.fn(spark, sf).head
    val (nc, nt, tp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(tp <= math.min(nc, nt))
    assert(nt > 0, "fixture has true near-dup pairs")
    // theory: P(candidate | J=0.9) = 1-(1-0.9³)⁵ ≈ 0.9985; J>0.9 pairs
    // are even likelier. 0.9 leaves slack for small-corpus variance.
    assert(r.getDouble(3) >= 0.9, s"recall ${r.getDouble(3)}")
    assert(r.getDouble(4) <= 1.0 && r.getDouble(4) > 0.0)
  }

  test("q172 DSIR llr vanishes when target = corpus, and separates the " +
      "target slice on the fixture") {
    import queries.Curation
    // algebraic identity: training both LMs on the same rows makes every
    // per-bigram term cancel — llr must be EXACTLY 0.0 for every doc
    val allTgt = Curation.dsirLlr(
      Tables.documents(spark, sf).select(col("doc_id"), col("text")),
      lit(1)).collect()
    assert(allTgt.nonEmpty)
    for (r <- allTgt) {
      assert(r.getDouble(2) === 0.0, s"doc ${r.getLong(0)} llr nonzero")
      assert(!r.getBoolean(3), "keep must be false at llr == 0")
    }
    // fixture separation: the English slice must score higher under its
    // own LM than the non-English slice does, on average (deterministic
    // on this corpus — the operator's whole point)
    val scored = queries.Curation.q172DsirWeights.fn(spark, sf)
      .join(Tables.documents(spark, sf).select(col("doc_id"), col("lang")),
        "doc_id")
      .select(col("lang") === "en", col("llr")).collect()
      .map(r => (r.getBoolean(0), r.getDouble(1)))
    def mean(xs: Array[Double]) = xs.sum / xs.length
    val en = mean(scored.filter(_._1).map(_._2))
    val rest = mean(scored.filterNot(_._1).map(_._2))
    assert(en > rest, s"en mean llr $en should exceed non-en $rest")
  }

  test("q173 encode agrees with a driver-side merge replay and only " +
      "shrinks token counts") {
    import queries.TextAnalysis
    val merges = TextAnalysis.bpeMergeTable(
      Tables.documents(spark, sf).select(col("doc_id"), col("text"))
        .repartition(4), 3)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2)))
    val got = TextAnalysis.q173BpeEncode.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val wordRe = "^[a-z]{2,}$".r
    val expect = docs.flatMap { case (id, text) =>
      val ws = text.split(" ").filter(w => wordRe.findFirstIn(w).isDefined)
      if (ws.isEmpty) None else {
        val toks = ws.map { w =>
          var sym = " " + w.toCharArray.mkString(" ") + " "
          for ((l, r) <- merges)
            sym = sym.replace(s" $l $r ", s" $l$r ")
          sym.trim.split(" ").length.toLong
        }
        Some(id -> ((ws.length.toLong, ws.map(_.length.toLong).sum,
          toks.sum)))
      }
    }.toMap
    assert(got === expect)
    for ((id, (nw, nc, nt)) <- got) {
      assert(nt <= nc && nt >= nw, s"doc $id token bounds")
    }
  }

  test("q174 deciles partition first-half users and Brier replays from " +
      "the cell counts") {
    import queries.Stats
    val rows = Stats.q174CalibrationBrier.fn(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to 10L))
    for (r <- rows) {
      val (n, x1, x2) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (pred, actual, brier) =
        (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(x1 <= n && x2 <= n)
      assert(pred >= 0.0 && pred <= 1.0 && actual >= 0.0 && actual <= 1.0)
      val pmu = (2 * x1 * 1000000L + n) / (2 * n)
      assert(pred === pmu.toDouble / 1e6)
      val num = n * pmu * pmu - 2 * 1000000L * pmu * x2 +
        1000000000000L * x2
      val expect = BigDecimal(num.toDouble / 1e12 / n.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(brier === expect, s"decile ${r.getLong(0)}")
      assert(brier >= 0.0 && brier <= 1.0)
    }
  }

  test("q175 novelty attributes each corpus gram exactly once and keeps " +
      "q86's per-doc gram counts") {
    import queries.Dedup
    val got = Dedup.q175NgramNovelty.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    // the first doc (min doc_id) can only introduce grams
    val minDoc = got.keys.min
    assert(got(minDoc)._3 === 1.0, "first doc must be fully novel")
    // Σ n_novel over docs = number of DISTINCT grams in the corpus (each
    // gram's first occurrence is counted exactly once, no gram twice)
    val q86 = Dedup.q86DupNgrams.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.view.mapValues(_._1).toMap === q86,
      "per-doc gram universes must match q86's")
    val distinctGrams = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 8)
      .select(explode(expr(
        """array_distinct(transform(sequence(1, size(toks) - 7),
          |  i -> concat_ws(' ', element_at(toks, i), element_at(toks, i+1),
          |    element_at(toks, i+2), element_at(toks, i+3),
          |    element_at(toks, i+4), element_at(toks, i+5),
          |    element_at(toks, i+6), element_at(toks, i+7))))"""
          .stripMargin)).as("g"))
      .agg(countDistinct(col("g"))).head.getLong(0)
    assert(got.values.map(_._2).sum === distinctGrams,
      "novel-gram mass must equal the distinct-gram universe")
  }

  test("q176 quantile normalization equals a driver-side sorted-array " +
      "lookup and preserves within-source order") {
    import queries.Curation
    val got = Curation.q176QuantileNormalize.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    val docs = Tables.documents(spark, sf)
      .filter(col("n_chars").isNotNull)
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val pooled = docs.map(_._3).sorted
    val n = pooled.length.toLong
    val expect = docs.groupBy(_._2).toSeq.flatMap { case (src, g) =>
      val sorted = g.sortBy(x => (x._3, x._1)).toSeq
      val ng = sorted.length.toLong
      sorted.zipWithIndex.map { case ((id, _, sc), i) =>
        val r = i + 1L
        val p = (r * n + ng - 1) / ng
        id -> ((src, sc, r, pooled((p - 1).toInt)))
      }
    }.toMap
    assert(got === expect)
    // within a source, normalization is monotone in (score, doc_id)
    for ((_, g) <- got.toSeq.groupBy(_._2._1)) {
      val byRank = g.sortBy(_._2._3).map(_._2._4)
      assert(byRank === byRank.sorted, "monotone in rank")
    }
  }

  test("q178 bursts equal a driver-side hourly recount and are maximal") {
    import queries.Analytic
    val got = Analytic.q178BurstWindows.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3), r.getLong(4), r.getLong(5)))
    val ev = Tables.events(spark, sf).filter(col("ts").isNotNull)
      .select(col("event_type"), expr("unix_micros(ts)")).collect()
      .map(r => (r.getString(0), r.getLong(1) / 3600000000L))
    val expect = ev.groupBy(_._1).toSeq.flatMap { case (t, g) =>
      val byHour = g.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val total = g.length.toLong
      val span = byHour.keys.max - byHour.keys.min + 1
      val flagged = byHour.filter { case (_, c) => c * span >= 3 * total }
        .keys.toSeq.sorted
      // islands of consecutive flagged hours
      val islands = flagged.foldLeft(List.empty[List[Long]]) {
        case (acc @ (cur :: rest), h) if cur.head == h - 1 =>
          (h :: cur) :: rest
        case (acc, h) => List(h) :: acc
      }.map(_.reverse).reverse
      islands.map { hs =>
        (t, hs.head * 3600000L, (hs.last + 1) * 3600000L,
          hs.length.toLong, hs.map(byHour).sum, hs.map(byHour).max)
      }
    }
    assert(got.sortBy(x => (x._1, x._2)) ===
      expect.sortBy(x => (x._1, x._2)).toArray)
    assert(got.nonEmpty, "fixture has at least one burst")
  }

  test("q179 entropy replays driver-side and obeys its bounds") {
    import queries.Analytic
    val got = Analytic.q179BehaviorEntropy.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))).toMap
    val ev = Tables.events(spark, sf).filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = ev.groupBy(_._1).map { case (u, g) =>
      val ks = g.groupBy(_._2).map(_._2.length.toLong).toSeq
      val n = ks.sum
      // the engine's exact op chain: float-cast ln, DECIMAL(18,9) terms
      val sd = ks.map(k => BigDecimal.valueOf(
          k.toDouble * math.log(k.toDouble).toFloat.toDouble)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      val h = BigDecimal(math.log(n.toDouble).toFloat.toDouble - sd / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      u -> ((n, ks.length.toLong, h, 2 * ks.max > n))
    }
    assert(got === expect)
    for ((u, (_, nt, h, _)) <- got) {
      assert(h >= -1e-9 && h <= math.log(nt.toDouble) + 1e-6,
        s"entropy bounds for user $u")
    }
  }

  test("q183 reciprocal pairs equal brute-force mutual kNN and are " +
      "strictly mutual") {
    import queries.Similarity
    val got = Similarity.q183ReciprocalNn.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Option[Double] = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      val (sa, sb) = (math.sqrt(na), math.sqrt(nb))
      if (sa == 0 || sb == 0) None
      else Some(BigDecimal(d / sa / sb)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val top3 = e.map { case (vid, lbl, v) =>
      vid -> e.filter(o => o._2 == lbl && o._1 != vid)
        .flatMap(o => cos(v, o._3).map(c => (o._1, c)))
        .sortBy(x => (-x._2, x._1)).take(3).toMap
    }.toMap
    val expect = for {
      (a, na) <- top3.toSeq; (b, c) <- na.toSeq
      if a < b && top3(b).contains(a)
    } yield (a, b, e.find(_._1 == a).get._2, c)
    assert(got.toSet === expect.toSet)
    assert(got.nonEmpty)
    // mutuality by construction: each listed pair appears in both lists
    for ((a, b, _, _) <- got)
      assert(top3(a).contains(b) && top3(b).contains(a))
  }

  test("q184 outliers equal a driver-side fixed-point distance recompute") {
    import queries.Similarity
    val got = Similarity.q184EmbeddingOutliers.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(v => math.round(v.toDouble * 1e3)).toArray))
    val expect = e.groupBy(_._2).toSeq.flatMap { case (lbl, g) =>
      val n = g.length.toLong
      val dims = g.head._3.length
      val sums = Array.tabulate(dims)(i => g.map(_._3(i)).sum)
      val scored = g.map { case (vid, _, xs) =>
        val d2n = xs.indices.map { i =>
          val t = n * xs(i) - sums(i); t * t
        }.sum
        (vid, d2n)
      }.sortBy(x => (-x._2, x._1)).take(3).zipWithIndex
      scored.map { case ((vid, d2n), i) =>
        val dist = BigDecimal(math.sqrt(d2n.toDouble) / (n.toDouble * 1000.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (lbl, i + 1, vid, dist)
      }
    }
    assert(got.toSet === expect.toSet)
    assert(got.length === expect.length)
  }

  test("q185 containment equals a naive shingle-set recount; duplicates " +
      "contain each other both ways") {
    import queries.Dedup
    val got = Dedup.q185ContainmentJoin.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sh = docs.flatMap { case (id, t) =>
      val w = t.split(" ")
      if (w.length < 3) None
      else Some(id -> w.sliding(3).map(_.mkString(" ")).toSet)
    }.toMap
    def r6(num: Long, den: Long): Double =
      ((2L * num * 1000000L + den) / (2L * den)).toDouble / 1e6
    val expect = (for {
      (a, sa) <- sh.toSeq; (b, sb) <- sh.toSeq if a != b
      inter = (sa & sb).size.toLong
      if 10 * inter >= 9 * sa.size
    } yield (a, b) -> ((inter, sa.size.toLong, sb.size.toLong,
      r6(inter, sa.size.toLong)))).toMap
    assert(got === expect)
    assert(got.nonEmpty)
    // exact duplicates (identical shingle sets) must contain each other
    // in BOTH orientations at containment exactly 1.0
    for (((a, b), (_, szA, szB, c)) <- got if c == 1.0 && szA == szB) {
      assert(got.contains((b, a)), s"missing mutual containment ($b,$a)")
    }
  }

  test("q186 linear credits equal a driver-side split and conserve " +
      "revenue within the rounding bound") {
    import queries.Analytic
    val got = Analytic.q186LinearAttribution.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val ev = Tables.events(spark, sf)
      .filter(col("ts").isNotNull && col("user_id").isNotNull
        && col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), expr("unix_micros(ts)")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        math.round(100 * r.getDouble(3)), r.getLong(4)))
    val byUser = ev.groupBy(_._1)
    val credits = byUser.toSeq.flatMap { case (_, g) =>
      val touches = g.filter(e => e._3 == "view" || e._3 == "click")
      g.filter(_._3 == "purchase").toSeq.flatMap { p =>
        val w = touches.filter(t =>
          t._5 <= p._5 && p._5 - t._5 <= 7L * 86400000000L).toSeq
        val n = w.length.toLong
        if (n == 0) Seq(("none", p._2, p._4 * 10000L))
        else w.map(t =>
          (t._3, p._2, (2L * p._4 * 10000L + n) / (2L * n)))
      }
    }
    val expect = credits.groupBy(_._1).map { case (ch, rows) =>
      ch -> ((rows.size.toLong, rows.map(_._2).distinct.size.toLong,
        rows.map(_._3).sum))
    }
    assert(got === expect)
    // conservation: per-conversion rounding drifts ≤ n/2 micro-dollars
    val totalMicro = ev.filter(_._3 == "purchase").map(_._4 * 10000L).sum
    val credited = got.values.map(_._3).sum
    val bound = credits.size.toLong // ≥ Σ n/2 over conversions
    assert(math.abs(credited - totalMicro) <= bound,
      s"credited $credited vs total $totalMicro (bound $bound)")
  }

  test("q201 U-shaped credits equal a driver-side position split and " +
      "conserve revenue EXACTLY") {
    import queries.Analytic
    val got = Analytic.q201PositionAttribution.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val ev = Tables.events(spark, sf)
      .filter(col("ts").isNotNull && col("user_id").isNotNull
        && col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), expr("unix_micros(ts)")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        math.round(100 * r.getDouble(3)), r.getLong(4)))
    val byUser = ev.groupBy(_._1)
    val credits = byUser.toSeq.flatMap { case (_, g) =>
      val touches = g.filter(e => e._3 == "view" || e._3 == "click")
      g.filter(p => p._3 == "purchase" && p._4 >= 0).toSeq.flatMap { p =>
        val tot = p._4 * 10000L
        val w = touches.filter(t =>
            t._5 <= p._5 && p._5 - t._5 <= 7L * 86400000000L)
          .sortBy(t => (t._5, t._2)).toSeq // total order: (us, event_id)
        val n = w.length
        if (n == 0) Seq(("none", p._2, tot))
        else if (n == 1) Seq((w.head._3, p._2, tot))
        else if (n == 2) Seq((w(0)._3, p._2, (tot + 1) / 2),
          (w(1)._3, p._2, tot / 2))
        else {
          val end = (2L * tot) / 5L
          val midTot = tot - 2 * end
          val base = midTot / (n - 2); val rem = midTot % (n - 2)
          w.zipWithIndex.map { case (t, i) =>
            val c = if (i == 0 || i == n - 1) end
              else base + (if (i == 1) rem else 0L)
            (t._3, p._2, c)
          }
        }
      }
    }
    val expect = credits.groupBy(_._1).map { case (ch, rows) =>
      ch -> ((rows.size.toLong, rows.map(_._2).distinct.size.toLong,
        rows.map(_._3).sum))
    }
    assert(got === expect)
    // the integer U-rule conserves micro-revenue EXACTLY per conversion
    val totalMicro = ev.filter(p => p._3 == "purchase" && p._4 >= 0)
      .map(_._4 * 10000L).sum
    assert(got.values.map(_._3).sum === totalMicro,
      "position credits must conserve total revenue exactly")
  }

  test("q180 closed-form CUSUM equals the literal max(0, S+d) recurrence") {
    import queries.Analytic
    val got = Analytic.q180CusumPeak.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getTimestamp(4).getTime, r.getLong(5)))).toMap
    val ev = Tables.events(spark, sf).filter(col("ts").isNotNull)
      .select(col("event_type"), expr("unix_micros(ts)")).collect()
      .map(r => (r.getString(0), r.getLong(1) / 3600000000L))
    val expect = ev.groupBy(_._1).map { case (t, g) =>
      val byHour = g.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val total = g.length.toLong
      val (m0, m1) = (byHour.keys.min, byHour.keys.max)
      val span = m1 - m0 + 1
      // the RECURRENCE itself — a different computation path than the
      // engine's prefix-sum/running-min closed form
      var sCur = 0L; var peak = 0L; var peakHour = m0; var zeros = 0L
      for (m <- m0 to m1) {
        val d = span * byHour.getOrElse(m, 0L) - total
        sCur = math.max(0L, sCur + d)
        if (sCur > peak) { peak = sCur; peakHour = m }
        if (sCur == 0L) zeros += 1
      }
      val peakEvents = ((2L * peak * 1000000L + span) /
        (2L * span)).toDouble / 1e6
      t -> ((total, span, peakEvents, peakHour * 3600000L, zeros))
    }
    assert(got === expect)
  }

  test("q171 hazard table equals a driver-side life-table recount") {
    val got = Analytic.q171ChurnHazard.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))))
    val ev = Tables.events(spark, sf)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts)").as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val u = ev.groupBy(_._1).map { case (uid, g) =>
      (uid, g.map(_._2).min, g.map(_._2).max) }.toSeq
    val m0 = u.map(_._2).min; val m1 = u.map(_._3).max
    val wk = 604800000000L
    val t = u.map { case (_, f, l) =>
      val tenure = (l - m0) / wk - (f - m0) / wk
      (tenure, (l - m0) / wk == (m1 - m0) / wk)
    }
    def r6(num: Long, den: Long): Double =
      ((2L * num * 1000000L + den) / (2L * den)).toDouble / 1e6
    val tenures = t.map(_._1).distinct.sorted
    val expect = tenures.map { k =>
      val atRisk = t.count(_._1 >= k).toLong
      val churned = t.count(x => x._1 == k && !x._2).toLong
      val cens = t.count(x => x._1 == k && x._2).toLong
      k -> ((atRisk, churned, cens, r6(churned, atRisk)))
    }
    assert(got.toSeq === expect)
  }
}
