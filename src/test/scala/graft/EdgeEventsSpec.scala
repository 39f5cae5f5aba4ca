package graft

import org.apache.spark.sql.functions._

/** Degenerate EVENTS inputs (the ShortDocSpec discipline for the other
  * fact table): operators must survive shapes the driver fixtures never
  * contain. The found-in-review case: a type whose activity all lands in
  * ONE hour bucket gives q94 a zero-variance x — the slope must be NULL
  * (DuckDB's division semantics), never an ANSI divide-by-zero crash.
  */
class EdgeEventsSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = "/tmp/graft_edge_events"
    import spark.implicits._
    def ns(hour: Int, min: Int): Long =
      (java.time.LocalDateTime.of(2024, 1, 1, hour, min)
        .toEpochSecond(java.time.ZoneOffset.UTC)) * 1000000000L
    // "solo": three events in one hour bucket; "multi": one per hour
    val rows = Seq(
      (1L, ns(10, 0), 1L, "solo", 1.0, "{}"),
      (2L, ns(10, 20), 1L, "solo", 2.0, "{}"),
      (3L, ns(10, 40), 2L, "solo", 3.0, "{}"),
      (4L, ns(8, 0), 3L, "multi", 1.0, "{}"),
      (5L, ns(9, 0), 3L, "multi", 2.0, "{}"),
      (6L, ns(10, 0), 4L, "multi", 6.0, "{}"),
    )
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("q94: a single-hour event type yields NULL slope, not a crash") {
    val rows = SparkEntry.queries("q94_trend_slope")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("solo").isNullAt(2), "zero x-variance must give NULL slope")
    assert(rows("solo").isNullAt(3), "NULL slope propagates to intercept")
    // sanity on the regular case: one event per hour → flat counts,
    // slope 0, intercept 1
    assert(rows("multi").getDouble(2) === 0.0)
    assert(rows("multi").getDouble(3) === 1.0)
  }

  test("q88: a NULL join key survives salting — the NULL group is kept") {
    // the salted join must stay provably identical to the unsalted
    // GROUP BY, which RETAINS a NULL key group; a null-unsafe equi-join
    // would silently drop these rows
    val d = "/tmp/graft_edge_events_nullkey"
    import spark.implicits._
    Seq(
      (1L, 1000000000L, 1L, Option("a"), 1.0, "{}"),
      (2L, 1000000000L, 1L, Option.empty[String], 2.0, "{}"),
      (3L, 1000000000L, 2L, Option.empty[String], 3.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("q88_salted_join")(spark, d).collect()
      .map(r => Option(r.getString(0)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got === Map(Option("a") -> ((1L, 1.0)), None -> ((2L, 5.0))))
  }

  test("events operators survive the tiny degenerate fixture") {
    for (name <- Seq("q84_cohort_retention", "q92_sessions_batch",
      "q80_gap_fill", "q89_partial_merge", "q119_rolling_p95",
      "q169_rfm_segments", "q174_calibration_brier",
      "q179_behavior_entropy"))
      assert(SparkEntry.queries(name)(spark, dir).collect().nonEmpty,
        s"$name returned no rows")
    // q168: no user here has 3 events — zero journeys is the correct
    // answer, not a lag-window crash
    assert(SparkEntry.queries("q168_seq_triples")(spark, dir)
      .collect().isEmpty)
    // q76: every z-score is NULL here (one window per (type,hour) family
    // has zero variance) — the correct result is an EMPTY alert set, the
    // broken one an ANSI divide-by-zero crash
    assert(SparkEntry.queries("q76_window_anomaly")(spark, dir)
      .collect().isEmpty)
  }

  test("q133: overlap counting and half-open back-to-back endpoints") {
    val d = "/tmp/graft_edge_events_sweep"
    import spark.implicits._
    def ns(hour: Int, min: Int): Long =
      (java.time.LocalDateTime.of(2024, 1, 1, hour, min)
        .toEpochSecond(java.time.ZoneOffset.UTC)) * 1000000000L
    Seq(
      // value 3000 → dur 60+3000 = 3060 s (51 min): all three overlap at
      // 10:40, none before → max 3 first reached exactly at 10:40
      (1L, ns(10, 0), 1L, "ol", 3000.0, "{}"),
      (2L, ns(10, 20), 1L, "ol", 3000.0, "{}"),
      (3L, ns(10, 40), 2L, "ol", 3000.0, "{}"),
      // value 0 → dur 60 s: second interval starts EXACTLY at the first's
      // end — half-open [s, e) must not count them as concurrent
      (4L, ns(12, 0), 3L, "b2b", 0.0, "{}"),
      (5L, ns(12, 1), 3L, "b2b", 0.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("q133_max_concurrency")(spark, d)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getTimestamp(3).toInstant.toString)))
      .toMap
    assert(got("ol") === ((3L, 3L, "2024-01-01T10:40:00Z")))
    assert(got("b2b") === ((1L, 2L, "2024-01-01T12:00:00Z")))
  }

  test("q137: hop latencies pick exact disc ranks; stalled funnels drop out") {
    val d = "/tmp/graft_edge_events_funnel"
    import spark.implicits._
    def ns(hour: Int, min: Int): Long =
      (java.time.LocalDateTime.of(2024, 1, 1, hour, min)
        .toEpochSecond(java.time.ZoneOffset.UTC)) * 1000000000L
    Seq(
      // users 1-3: view→click at 10/20/30 min; only user 2 purchases
      (1L, ns(9, 0), 1L, "view", 0.0, "{}"),
      (2L, ns(9, 10), 1L, "click", 0.0, "{}"),
      (3L, ns(9, 0), 2L, "view", 0.0, "{}"),
      (4L, ns(9, 20), 2L, "click", 0.0, "{}"),
      (5L, ns(10, 20), 2L, "purchase", 0.0, "{}"),
      (6L, ns(9, 0), 3L, "view", 0.0, "{}"),
      (7L, ns(9, 30), 3L, "click", 0.0, "{}"),
      // user 4 views but never clicks: contributes to NO hop population
      (8L, ns(9, 0), 4L, "view", 0.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("q137_funnel_latency")(spark, d).collect()
      .map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getLong(2), r.getLong(3))))
      .toMap
    val min = 60L * 1000000
    // n=3 hops: p50 rank ceil(1.5)=2 → 20 min; p90 rank ceil(2.7)=3 → 30
    assert(got(("view_click", 0.5)) === ((3L, 20 * min)))
    assert(got(("view_click", 0.9)) === ((3L, 30 * min)))
    // only user 2 purchased: both purchase hops are singleton populations
    assert(got(("click_purchase", 0.5)) === ((1L, 60 * min)))
    assert(got(("view_purchase", 0.9)) === ((1L, 80 * min)))
  }

  test("q147: hand-computed Gini and top-decile share on a 4-user corpus") {
    val d = "/tmp/graft_edge_events_gini"
    import spark.implicits._
    // users 1-3: one event each; user 4: nine events → counts {1,1,1,9}:
    // Σ rank·count = 1+2+3+36 = 42, Gini = (84 − 5·12)/(4·12) = 0.5,
    // k = ⌈4/10⌉ = 1, top share = 9/12 = 0.75
    val rows = (1L to 3L).map(u => (u, u * 1000000000L, u, "view", 1.0, "{}")) ++
      (1L to 9L).map(i => (100L + i, i * 1000000000L, 4L, "view", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = SparkEntry.queries("q147_pareto_gini")(spark, d).collect()
    assert(r.length === 1)
    assert((r.head.getLong(0), r.head.getLong(1), r.head.getLong(2),
      r.head.getDouble(3), r.head.getDouble(4)) === ((4L, 12L, 1L, 0.5, 0.75)))
  }

  test("q148: weights follow the half-life table; stale events drop out") {
    val d = "/tmp/graft_edge_events_decay"
    import spark.implicits._
    val day = 86400000000L
    val base = 1700000000000000L // µs, post-epoch
    def ns(ageDays: Long) = (base - ageDays * day) * 1000L
    Seq(
      (1L, ns(0), 1L, "view", 1.0, "{}"),   // w = 1.000000
      (2L, ns(7), 1L, "view", 1.0, "{}"),   // w = 0.500000 (exact half-life)
      (3L, ns(14), 2L, "view", 1.0, "{}"),  // w = 0.250000
      (4L, ns(30), 3L, "view", 1.0, "{}"),  // beyond horizon → dropped
      (5L, ns(29), 4L, "view", 1.0, "{}"),  // last in-horizon day
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("q148_decayed_score")(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) === ((2L, 1500000L)))
    assert(got(2L) === ((1L, 250000L)))
    assert(!got.contains(3L), "a 30-day-old event is outside the horizon")
    assert(got(4L) === ((1L,
      math.round(math.pow(2.0, -29 / 7.0) * 1e6))))
  }

  test("q149: credit goes to the latest in-window touch, else 'none'") {
    val d = "/tmp/graft_edge_events_attr"
    import spark.implicits._
    def ns(day: Int, hour: Int): Long =
      (java.time.LocalDateTime.of(2024, 1, day, hour, 0)
        .toEpochSecond(java.time.ZoneOffset.UTC)) * 1000000000L
    Seq(
      // user 1: view then click then purchase → click (latest touch) wins
      (1L, ns(1, 8), 1L, "view", 0.0, "{}"),
      (2L, ns(1, 9), 1L, "click", 0.0, "{}"),
      (3L, ns(1, 10), 1L, "purchase", 100.0, "{}"),
      // user 2: touch 8 days before purchase → outside lookback → none
      (4L, ns(1, 0), 2L, "view", 0.0, "{}"),
      (5L, ns(9, 1), 2L, "purchase", 50.0, "{}"),
      // user 3: purchase with no touch at all → none
      (6L, ns(2, 0), 3L, "purchase", 25.0, "{}"),
      // user 4: touch AFTER the purchase must not credit backwards
      (7L, ns(3, 10), 4L, "purchase", 10.0, "{}"),
      (8L, ns(3, 11), 4L, "click", 0.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("q149_last_touch_attribution")(spark, d)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === Map(
      "click" -> ((1L, 100.0)),
      "none" -> ((3L, 85.0))))
  }

  test("q150: a perfect halving curve fits rate ln2 and half-life 1 day") {
    val d = "/tmp/graft_edge_events_decayfit"
    import spark.implicits._
    def ns(day: Int): Long =
      (java.time.LocalDateTime.of(2024, 1, 1 + day, 12, 0)
        .toEpochSecond(java.time.ZoneOffset.UTC)) * 1000000000L
    // 8 users on day 0, halving daily: 8, 4, 2, 1 → slope −ln2 exactly
    val rows = for {
      day <- 0 to 3
      u <- 1 to (8 >> day)
    } yield ((day * 100 + u).toLong, ns(day), u.toLong, "view", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = SparkEntry.queries("q150_retention_decay_fit")(spark, d).collect()
    assert(r.length === 1)
    assert(r.head.getLong(1) === 4L)
    assert(r.head.getDouble(2) === 0.693147)
    assert(r.head.getDouble(3) === 1.0)
  }

  test("q151/q152: hand-computed TWA and silence on a step signal") {
    val d = "/tmp/graft_edge_events_twa"
    import spark.implicits._
    def ns(min: Int): Long =
      (java.time.LocalDateTime.of(2024, 1, 1, 8, 0)
        .toEpochSecond(java.time.ZoneOffset.UTC) + min * 60L) * 1000000000L
    Seq(
      // value 10 held 10 min, then 20 held 30 min, final sample no area:
      // TWA = (1000·10 + 2000·30)/40 = 1750 centi
      (1L, ns(0), 1L, "sig", 10.0, "{}"),
      (2L, ns(10), 1L, "sig", 20.0, "{}"),
      (3L, ns(40), 1L, "sig", 99.0, "{}"),
      // single-sample type: no gap exists — q151 reports (n=1, NULL
      // span, NULL twa); q152 emits NO row (the oracle's inner-join
      // semantics, matched exactly by the r17 rewrite — the old window
      // plan emitted a NULL row the oracle dropped)
      (4L, ns(5), 2L, "solo", 42.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val twa = SparkEntry.queries("q151_time_weighted_avg")(spark, d).collect()
    assert(twa.length === 2)
    val sig = twa.find(_.getString(0) == "sig").get
    assert((sig.getLong(1), sig.getLong(2),
      sig.getDouble(3)) === ((3L, 40L * 60 * 1000000, 1750.0)))
    val solo = twa.find(_.getString(0) == "solo").get
    assert(solo.getLong(1) === 1L && solo.isNullAt(2) && solo.isNullAt(3))
    val sil = SparkEntry.queries("q152_max_silence")(spark, d).collect()
    assert(sil.length === 1 && sil.head.getString(0) === "sig")
    // the longest silence is the 30-minute gap starting at 08:10
    assert((sil.head.getLong(1), sil.head.getLong(2),
      sil.head.getTimestamp(3).toInstant.toString) ===
      ((30L * 60 * 1000000, 2L, "2024-01-01T08:10:00Z")))
  }

  test("q120: single-event users contribute no transitions; solo rows stay") {
    // users 2 and 4 have exactly one event — the lag window must emit no
    // pair for them, and a corpus of ONLY such users yields an empty
    // (not crashing) matrix
    val t = SparkEntry.queries("q120_markov_transitions")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    // user 1: solo->solo; user 3: multi->multi — exactly two transition
    // kinds, each from the multi-event users only
    assert(t === Map(("solo", "solo") -> 1L, ("multi", "multi") -> 1L), t.toString)
  }

  test("q123: users with no dimension version get NULL tier, not a drop") {
    // no 'purchase' events exist in this fixture at all — every fact must
    // still appear, with NULL tier and NULL valid_from (the ASOF LEFT
    // semantics); an inner formulation would return nothing
    val rows = SparkEntry.queries("q123_temporal_lookup")(spark, dir).collect()
    assert(rows.length === 6)
    assert(rows.forall(_.isNullAt(4)), "tier must be NULL with no versions")
    assert(rows.forall(_.isNullAt(5)), "valid_from must be NULL too")
  }

  test("q163: a type whose users all tie on both metrics gives NULL rho") {
    // 'solo' has users {1: 2 events, 2: 1 event} — variance exists; build
    // a sharper fixture where every user has identical (f, m): zero
    // midrank variance on BOTH axes must yield NULL, never a NaN or crash
    val d = "/tmp/graft_edge_events_tied"
    import spark.implicits._
    Seq(
      (1L, 1000000000L, 1L, "t", 5.0, "{}"),
      (2L, 2000000000L, 2L, "t", 5.0, "{}"),
      (3L, 3000000000L, 3L, "t", 5.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = SparkEntry.queries("q163_spearman_corr")(spark, d).collect()
    assert(r.length === 1 && r.head.getLong(1) === 3L)
    assert(r.head.isNullAt(2), "zero rank variance must give NULL rho")
  }

  test("q164: an arm too small to resample reports a NULL-bounded CI " +
      "deterministically, never a crash") {
    // ONE event: many of the 64 Poisson replicates draw Σw = 0 → NULL
    // replicate means; the explicit nulls-first rank keeps order stats
    // well-defined (and identical to the DuckDB twin's NULLS FIRST)
    val d = "/tmp/graft_edge_events_single"
    import spark.implicits._
    Seq((1L, 1000000000L, 1L, "t", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = SparkEntry.queries("q164_bootstrap_ci")(spark, d).collect()
    assert(r.length === 1)
    assert(r.head.getDouble(2) === 5.0, "point estimate is the lone value")
    // with P(w=0) = e⁻¹ per replicate, rank 2 of 64 is a NULL (empty)
    // replicate with overwhelming probability — deterministic given the
    // fixed hash universe; assert the CI fields are well-defined either
    // way (NULL or the lone value)
    assert(r.head.isNullAt(3) || r.head.getDouble(3) === 5.0)
    assert(r.head.isNullAt(4) || r.head.getDouble(4) === 5.0)
  }

  test("q178: a single active hour can never be a burst of its own span") {
    // all 'solo'/'multi' activity sits inside a 3-hour morning: with
    // span = 1 for a one-hour type, cnt·span ≥ 3·total is 1 ≥ 3 — false;
    // the operator must return no bursts rather than flagging everything
    val rows = SparkEntry.queries("q178_burst_windows")(spark, dir).collect()
    assert(rows.isEmpty, rows.mkString(","))
  }

  test("q171: a one-user corpus is one fully-censored life-table row") {
    val d = "/tmp/graft_edge_events_single"
    val rows = SparkEntry.queries("q171_churn_hazard")(spark, d).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(0) === 0L && r.getLong(1) === 1L) // tenure 0, at risk 1
    assert(r.getLong(2) === 0L && r.getLong(3) === 1L) // censored, not churned
    assert(r.getDouble(4) === 0.0)
  }

  test("q189: hand-computed KM curve; extinction row pins survival to 0") {
    import spark.implicits._
    def dayNs(d: Int): Long = d * 86400L * 1000000000L
    // corpus weeks 0..3: u1/u2 churn at tenure 0, u3 at tenure 1,
    // u4 censored at tenure 3, u5 censored at tenure 2
    val d1 = "/tmp/graft_edge_events_km"
    Seq(
      (1L, dayNs(0), 1L, "t", 1.0, "{}"), (2L, dayNs(2), 1L, "t", 1.0, "{}"),
      (3L, dayNs(0), 2L, "t", 1.0, "{}"),
      (4L, dayNs(0), 3L, "t", 1.0, "{}"), (5L, dayNs(8), 3L, "t", 1.0, "{}"),
      (6L, dayNs(0), 4L, "t", 1.0, "{}"), (7L, dayNs(22), 4L, "t", 1.0, "{}"),
      (8L, dayNs(7), 5L, "t", 1.0, "{}"), (9L, dayNs(22), 5L, "t", 1.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d1/events.parquet")
    val got = SparkEntry.queries("q189_km_survival")(spark, d1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // KM by hand: S(0) = 3/5 = 0.6; S(1) = 0.6·(2/3) = 0.4; flat after
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSeq === Seq(
      (0L, 5L, 2L, 0L), (1L, 3L, 1L, 0L), (2L, 2L, 0L, 1L),
      (3L, 1L, 0L, 1L)))
    assert(math.abs(got(0)._5 - 0.6) < 1e-6 &&
      math.abs(got(1)._5 - 0.4) < 1e-6 &&
      math.abs(got(2)._5 - 0.4) < 1e-6 && math.abs(got(3)._5 - 0.4) < 1e-6,
      got.mkString(","))

    // extinction: the max-tenure cohort all churns (its at-risk set does
    // not reach the censor week) → survival exactly 0.0, no ln(0)/NaN
    val d2 = "/tmp/graft_edge_events_km0"
    Seq(
      (1L, dayNs(0), 1L, "t", 1.0, "{}"),
      (2L, dayNs(0), 2L, "t", 1.0, "{}"), (3L, dayNs(16), 2L, "t", 1.0, "{}"),
      (4L, dayNs(15), 3L, "t", 1.0, "{}"), (5L, dayNs(22), 3L, "t", 1.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d2/events.parquet")
    val got2 = SparkEntry.queries("q189_km_survival")(spark, d2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(got2.length === 3)
    assert(got2(2)._1 === 2L && got2(2)._2 === 1L && got2(2)._3 === 1L)
    assert(got2(2)._4 === 0.0, s"extinct row must be exactly 0: ${got2(2)}")
    assert(math.abs(got2(0)._4 - 2.0 / 3) < 1e-6)
  }

  test("q193: closed form ≡ the z = λx + (1−λ)z recursion; single-hour " +
      "type gives NULL limits; planted step goes out of control") {
    // degenerate: the shared fixture's 'solo' type spans ONE hour — no
    // sample variance, limits must be NULL, ewma must equal the count
    val rows = SparkEntry.queries("q193_ewma_chart")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2),
        r.getDouble(3), r.isNullAt(4)))
    val solo = rows.filter(_._1 == "solo")
    assert(solo.length === 1 && solo.head._4, s"solo limits: ${solo.toSeq}")
    // z_0 = 0.2·x + 0.8·μ with span 1 → μ = x → z = x
    assert(math.abs(solo.head._3 - solo.head._2) < 1e-6)

    // planted step: 20 calm hours at 2/hour then 10 hours at 30/hour —
    // the chart must flag the elevated tail; verify EVERY ewma value
    // against a driver-side replay of the RECURSION (a genuinely
    // different formulation than the engine's closed-form explode)
    val d = "/tmp/graft_edge_events_ewma"
    import spark.implicits._
    def hourNs(h: Int, k: Int): Long = (h * 3600L + k * 60) * 1000000000L
    val evs = (0 until 30).flatMap { h =>
      val n = if (h < 20) 2 else 30
      (0 until n).map(k => ((h * 100 + k).toLong, hourNs(h, k), 1L, "s",
        1.0, "{}"))
    }
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("q193_ewma_chart")(spark, d).collect()
      .map(r => (r.getLong(2), r.getDouble(3), r.getString(6) == "oob"))
    assert(got.length === 30)
    val xs = got.map(_._1.toDouble)
    val mu = xs.sum / xs.length
    var zref = mu
    for (t <- 0 until 30) {
      zref = 0.2 * xs(t) + 0.8 * zref
      assert(math.abs(got(t)._2 - zref) < 1e-4,
        s"hour $t: engine ${got(t)._2} vs recursion $zref")
    }
    // the chart flags once z crosses μ + 3σ√(λ/(2−λ)): with μ/σ drawn
    // from the whole (contaminated) series that happens at the 8th
    // elevated hour — detection LAG is the λ = 0.2 design trade
    assert(got.takeRight(3).forall(_._3), "elevated tail must be flagged")
    assert(!got.take(10).exists(_._3), "calm head must not be flagged")
  }

  test("q203 Brown closed form ≡ the coupled s1/s2 recursion; trend " +
      "tracks a planted ramp; solo hour gives zero trend") {
    // degenerate: a single-hour type — s1 = s2 = μ = x, trend exactly 0
    val solo = SparkEntry.queries("q203_brown_trend")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(6)))
      .filter(_._1 == "solo")
    assert(solo.length === 1)
    assert(math.abs(solo.head._3 - solo.head._2) < 1e-6, "s1 = x")
    assert(math.abs(solo.head._4 - solo.head._2) < 1e-6, "s2 = x")
    assert(math.abs(solo.head._5) < 1e-6, "trend = 0")

    // planted linear ramp: k events in hour k — the recursion replay is
    // a genuinely different algorithm (sequential, coupled state) than
    // the engine's single-explode closed form, and on a ramp the trend
    // must converge near the true slope 1
    val d = "/tmp/graft_edge_events_brown"
    import spark.implicits._
    val evs = (0 until 40).flatMap { h =>
      (0 to h).map(k => ((h * 100 + k).toLong,
        (h * 3600L + k * 60) * 1000000000L, 1L, "r", 1.0, "{}"))
    }
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("q203_brown_trend")(spark, d).collect()
      .map(r => (r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(got.length === 40)
    val xs = got.map(_._1.toDouble)
    val mu = xs.sum / xs.length
    var s1 = mu; var s2 = mu
    for (t <- 0 until 40) {
      s1 = 0.2 * xs(t) + 0.8 * s1
      s2 = 0.2 * s1 + 0.8 * s2
      val (_, gs1, gs2, glvl, gtr, gfc) = got(t)
      assert(math.abs(gs1 - s1) < 1e-4, s"hour $t s1 $gs1 vs $s1")
      assert(math.abs(gs2 - s2) < 1e-4, s"hour $t s2 $gs2 vs $s2")
      assert(math.abs(glvl - (2 * s1 - s2)) < 1e-4, s"hour $t level")
      assert(math.abs(gtr - 0.25 * (s1 - s2)) < 1e-4, s"hour $t trend")
      assert(math.abs(gfc - (2 * s1 - s2 + 0.25 * (s1 - s2))) < 1e-4)
    }
    // x_t = t + 1 exactly: the steady-state double-smoothing trend is 1
    assert(math.abs(got.last._5 - 1.0) < 0.15,
      s"ramp trend ${got.last._5} far from slope 1")
  }

  test("q193/q203 W-truncation is bit-lossless where it is ACTIVE: " +
      "a 240-hour span (> wlag) collects identical rows full vs truncated") {
    // The sf fixtures' 720-hour span exercises truncation through the
    // untruncated DuckDB oracle at every verify; this net pins the same
    // equality in-suite on a planted fixture whose span (240 h) exceeds
    // the truncation lag (~110 at xmax ≈ 5), so the truncated plan
    // genuinely drops lags — and must still match the full explode
    // EXACTLY (dropped terms sit below the DECIMAL(18,9) cast quantum).
    val d = "/tmp/graft_edge_events_trunc"
    import spark.implicits._
    val evs = (0 until 240).flatMap { h =>
      val n = 1 + (h * h % 5) // 1..5 events/hour, deterministic wobble
      (0 until n).map(k => ((h * 10 + k).toLong,
        (h * 3600L + k * 60) * 1000000000L, 1L, "w", 1.0, "{}"))
    }
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val ev = Tables.events(spark, d)
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq
    val (ef, et) = (canon(graft.queries.Analytic.ewmaChartPlan(ev, truncate = false)),
      canon(graft.queries.Analytic.ewmaChartPlan(ev, truncate = true)))
    assert(ef.length === 240 && ef === et,
      "q193 truncated must equal full bit-for-bit")
    val (bf, bt) = (canon(graft.queries.Analytic.brownTrendPlan(ev, truncate = false)),
      canon(graft.queries.Analytic.brownTrendPlan(ev, truncate = true)))
    assert(bf.length === 240 && bf === bt,
      "q203 truncated must equal full bit-for-bit")
  }

  test("q243/q244/q245 degenerate: single-hour spans NULL the JB " +
      "statistics, zero out the seasonal residual with a NULL forecast, " +
      "and an all-tied type NULLs H") {
    // q243 on the shared fixture: 'solo' spans one hour → m2 = 0 → every
    // statistic NULL, never NaN; 'multi' (1,1,1 counts) is constant too
    val jb = SparkEntry.queries("q243_jarque_bera")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(jb("solo").isNullAt(2) && jb("solo").isNullAt(4)
      && jb("solo").isNullAt(5), "solo JB must be NULL")
    assert(jb("multi").isNullAt(4), "constant series JB must be NULL")
    // q244 on 'solo': the single hour IS its own hour-of-day profile →
    // seasonal = n, residual exactly 0, adjusted level exactly 0, and
    // the NEXT hour-of-day never occurred → forecast NULL, not invented
    val se = SparkEntry.queries("q244_seasonal_ewma")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.isNullAt(6)))
    val solo = se.filter(_._1 == "solo")
    assert(solo.length === 1)
    assert(solo.head._2 === 3L && solo.head._3 === 3.0)
    assert(solo.head._4 === 0.0 && solo.head._5 === 0.0)
    assert(solo.head._6, "unseen next hour-of-day must forecast NULL")
    // q245 all-tied: every value identical → N³−N = Σ(t³−t) → the tie
    // correction is 0 and H must be explicit NULL on a crafted corpus
    // whose users land in all three md5 arms (uids 1..30)
    val d = "/tmp/graft_edge_events_kw"
    import spark.implicits._
    val evs = (1 to 30).map(u =>
      (u.toLong, 1000000000L * u, u.toLong, "tied", 7.0, "{}"))
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val kw = SparkEntry.queries("q245_kruskal_wallis")(spark, d).collect()
    assert(kw.length === 1)
    assert(kw.head.getLong(1) > 0 && kw.head.getLong(2) > 0
      && kw.head.getLong(3) > 0, "30 uids must populate all three arms")
    assert(kw.head.isNullAt(4) && kw.head.isNullAt(5),
      "all-tied H and p must be NULL, never a division crash")
  }

  test("q246/q247/q248 degenerate: evenly spaced gaps score B = -1, a " +
      "point-mass value distribution has no exceeders, single-hour " +
      "spans NULL the ANOVA") {
    // shared fixture: 'solo' = 3 events 20 min apart → two equal gaps →
    // σ = 0 → the metronome reading B = −1, CV = 0, exactly
    val b = SparkEntry.queries("q246_burstiness")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(b("solo").getLong(1) === 2L)
    assert(b("solo").getDouble(3) === 0.0, "equal gaps → CV 0")
    assert(b("solo").getDouble(4) === -1.0, "equal gaps → B -1")
    // all events in the same millisecond → every gap 0 ms → NULL B
    val d0 = "/tmp/graft_edge_events_samems"
    import spark.implicits._
    (1 to 3).map(i => (i.toLong, 1000000000L, i.toLong, "z", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d0/events.parquet")
    val bz = SparkEntry.queries("q246_burstiness")(spark, d0).collect()
    assert(bz.length === 1 && bz.head.isNullAt(4),
      "zero-ms gaps must NULL B, never 0/0")
    // q247 on the all-tied corpus from the q245 edge: v·n = S < 2S for
    // every row → zero exceeders → NULL excess and index, rate 0
    val me = SparkEntry.queries("q247_mean_excess")(
      spark, "/tmp/graft_edge_events_kw").collect()
    assert(me.length === 1 && me.head.getLong(3) === 0L)
    assert(me.head.isNullAt(5) && me.head.isNullAt(6))
    // q248 on the shared fixture: 'solo' spans one hour → SST = 0 →
    // NULL eta2/F; 'multi' (1,1,1) is constant → NULL as well
    val an = SparkEntry.queries("q248_hod_anova")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(an("solo").isNullAt(3) && an("solo").isNullAt(4))
    assert(an("multi").isNullAt(3), "constant series must NULL eta2")
    // q249: two types fail the k > 3 James–Stein dominance condition —
    // raw means stay, shrinkage columns are NULL, never a fabricated c
    val js = SparkEntry.queries("q249_james_stein")(spark, dir).collect()
    assert(js.length === 2)
    assert(js.forall(r => r.isNullAt(4) && r.isNullAt(5)),
      "k <= 3 must NULL the shrinkage, not invent one")
  }

  test("q177: zero pre-period variance gives NULL theta and adjusted " +
      "means, with raw means intact") {
    // every user's first-half spend is identical → var(x) = 0 → θ and the
    // adjusted means must be NULL (nullif), never a divide-by-zero crash
    val d = "/tmp/graft_edge_events_novar"
    import spark.implicits._
    def us(h: Int): Long = h * 3600L * 1000000000L
    Seq(
      (1L, us(1), 1L, "t", 5.0, "{}"), (2L, us(1), 2L, "t", 5.0, "{}"),
      (3L, us(10), 1L, "t", 7.0, "{}"), (4L, us(10), 2L, "t", 3.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = SparkEntry.queries("q177_cuped")(spark, d).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(!r.isNullAt(2), "raw mean must survive")
      assert(r.isNullAt(3), "adjusted mean must be NULL at zero variance")
      assert(r.isNullAt(4), "theta must be NULL at zero variance")
    }
  }
  test("q208/q209/q211 degenerate day shapes: single-day spans and the " +
      "(us, event_id) open/close order") {
    // every edge-fixture event lands on one calendar day → zero day
    // pairs: q208 and q209 return empty BY DEFINITION (documented), not
    // a crash or a NULL-slope row
    assert(SparkEntry.queries("q208_kendall_tau")(spark, dir).collect()
      .isEmpty)
    assert(SparkEntry.queries("q209_theil_sen")(spark, dir).collect()
      .isEmpty)
    // q207 survives the 3-observation types; a degenerate variant split
    // or all-tied sample must yield NULL z², never NaN
    val mw = SparkEntry.queries("q207_mann_whitney")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(mw.keySet === Set("solo", "multi"))
    for ((t, r) <- mw) {
      assert(r.getLong(1) + r.getLong(2) === 3L, s"$t arm sizes")
      if (!r.isNullAt(4)) assert(!r.getDouble(4).isNaN, s"$t z² NaN")
    }
    // q211: open/close follow the (us, event_id) total order
    val oh = SparkEntry.queries("q211_ohlc_bars")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(6)))).toMap
    assert(oh("solo") === ((100L, 300L)))
    assert(oh("multi") === ((100L, 600L)))
  }
  test("q217/q220 degenerate: single-hour span NULLs the alarm; a corpus " +
      "with no view/click days yields an empty correlation series") {
    val ph = SparkEntry.queries("q217_page_hinkley")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    // 'solo' has one hour: σ undefined → alarm NULL; m_t = x − x/1 = 0
    val solo = ph("solo")
    assert(solo.getDouble(3) === 0.0 && solo.getDouble(4) === 0.0)
    assert(solo.isNullAt(5), "single-hour series must NULL the alarm")
    // 'multi' spans 3 hours → a real (possibly false) boolean
    assert(ph.collect { case (t, r) if t == "multi" => r }
      .forall(!_.isNullAt(5)))
    // the fixture has no 'view'/'click' events at all → empty series,
    // not a crash on the empty-bounds grid
    assert(SparkEntry.queries("q220_rolling_corr")(spark, dir).collect()
      .isEmpty)
  }
  test("q221/q222/q224 degenerate: lag-2 needs 3 hours; single-day " +
      "leaderboards have no pairs; an all-post split NULLs the DiD") {
    val acf = SparkEntry.queries("q221_acf_ljungbox")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!acf.contains("solo"), "single-hour series has no lag-2 ACF")
    assert(acf.contains("multi") && acf("multi").getLong(1) === 3L)
    assert(SparkEntry.queries("q222_leaderboard_churn")(spark, dir)
      .collect().isEmpty, "one day → no consecutive-day pairs")
    // all edge events land on one day → mid = d0, every row post=1,
    // pre cells missing → DiD must be NULL on every row, not a crash
    val did = SparkEntry.queries("q224_diff_in_diff")(spark, dir)
      .collect()
    assert(did.nonEmpty)
    assert(did.forall(_.isNullAt(4)), "missing pre-period → NULL effect")
    assert(did.forall(_.getLong(1) === 1L), "all cells post")
  }
  test("q225/q226/q228 degenerate: one week has no recapture pair; a " +
      "flat series excludes every hour from the runs test; a 3-hour " +
      "span supports only Haar level 1 with zero flat-energy share") {
    assert(SparkEntry.queries("q225_capture_recapture")(spark, dir)
      .collect().isEmpty, "single week → no consecutive pair")
    // solo: 1 hour (mean = own value); multi: 1 event/hour, all equal
    // the mean → every hour excluded → both types absent
    assert(SparkEntry.queries("q226_runs_test")(spark, dir).collect()
      .isEmpty, "flat/single-hour series have no runs sequence")
    val haar = SparkEntry.queries("q228_haar_energy")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    assert(haar.keySet === Set(("multi", 1L)),
      "3-hour multi → one level-1 pair; 1-hour solo → nothing")
    val r = haar(("multi", 1L))
    assert(r.getLong(2) === 1L && r.getLong(3) === 0L)
    assert(r.isNullAt(4), "zero total energy → NULL share")
  }

  test("q252/q253/q254 degenerate: one user concentrates the split; one " +
      "stratum misses an arm; single-day spans carry no MDE") {
    val d = "/tmp/graft_edge_events_oneuser"
    import spark.implicits._
    Seq((1L, 1000000000L, 7L, "t", 5.0, "{}"),
      (2L, 2000000000L, 7L, "t", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    // one user → one arm observed, chi2 = (3·1 − 1)/1 = 2 exactly (the
    // absent arms' (0 − n/3)² terms are in the closed form by algebra)
    val srm = SparkEntry.queries("q252_srm_check")(spark, d).collect()
    assert(srm.length === 1)
    assert(srm.head.getLong(1) === 1L && srm.head.getDouble(2) === 1.0)
    assert(srm.head.getDouble(3) === 2.0)
    assert(srm.head.getString(5) === "ok", "p = e^{-1} is not an SRM flag")
    // one user → its stratum has a single arm → no contrast → NULL ATE
    val ate = SparkEntry.queries("q253_post_strat_ate")(spark, d).collect()
    assert(ate.length === 1)
    assert(ate.head.isNullAt(3), "missing arm must NULL the diff")
    assert(ate.head.isNullAt(4), "unsupported stratum must NULL the ATE")
    // the shared fixture spans one calendar day → n = 1 for every type →
    // no variance, no MDE row (WHERE n > 1, stated)
    assert(SparkEntry.queries("q254_mde_power")(spark, dir).collect()
      .isEmpty, "single-day spans are excluded from the MDE readout")
  }

  test("q255/q256/q257 degenerate: bandwidth-starved sides NULL the RD " +
      "fit; a control-free corpus NULLs every Qini coordinate; a " +
      "metronome passes CvM with an exactly summable W2") {
    // shared fixture: only ONE user has first-half activity → n = 1,
    // bandwidth h = 0 → both side windows are empty → empty readout
    // (stated: a corpus too small for a bandwidth has no RD answer)
    assert(SparkEntry.queries("q255_reg_discontinuity")(spark, dir)
      .collect().isEmpty, "h = 0 must empty the readout, not crash")
    // 4 first-half-active users → h = 1 → one rank per side — a single
    // point has zero x-variance → NULL slope/intercept/effect
    val drd = "/tmp/graft_edge_events_rd4"
    import spark.implicits._
    val rdRows = (1L to 4L).map(u =>
      (u, 0L, u, "view", 1.0, "{}")) :+
      (9L, 10 * 3600L * 1000000000L, 1L, "view", 1.0, "{}")
    rdRows
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$drd/events.parquet")
    val rd = SparkEntry.queries("q255_reg_discontinuity")(spark, drd)
      .collect()
    assert(rd.length === 2)
    for (r <- rd) {
      assert(r.getLong(1) === 1L, "one rank per side at n = 4")
      assert(r.isNullAt(2) && r.isNullAt(3),
        "a 1-point side cannot support a linear fit")
      assert(r.isNullAt(4), "missing intercepts must NULL the effect")
    }
    // all users hash into one arm here? not guaranteed — build one where
    // user ids all land treated is fragile; instead: a corpus whose
    // every decile lacks a control user would NULL qini — covered
    // structurally by the nullif; assert instead the fixture's ledger
    // identity: cumulative columns are monotone and the uplift exists
    // wherever both arms are present
    val qn = SparkEntry.queries("q256_uplift_qini")(spark, dir).collect()
    for (r <- qn) {
      if (r.getLong(1) > 0 && r.getLong(3) > 0) assert(!r.isNullAt(5))
      if (r.getLong(1) == 0 || r.getLong(3) == 0) assert(r.isNullAt(5))
    }
    // metronome: 4 equally spaced events → every gap g equals the mean,
    // F̂(g) = 1 − e^{−1} for all three gaps → W² computable by hand
    val d = "/tmp/graft_edge_events_metronome"
    import spark.implicits._
    (0 to 3).map(i => ((i + 1).toLong, i * 3600L * 1000000000L, 1L,
      "m", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val cvm = SparkEntry.queries("q257_cramer_von_mises")(spark, d)
      .collect()
    assert(cvm.length === 1 && cvm.head.getLong(1) === 3L)
    val f = 1 - math.exp(-1.0).toFloat
    val w2 = 1.0 / 36 + Seq(1, 3, 5).map { odd =>
      val u = odd / 6.0; (f - u) * (f - u)
    }.sum
    assert(math.abs(cvm.head.getDouble(3) - w2) < 1e-5,
      "metronome W2 must match the closed three-term sum")
  }

  test("q258/q259/q260 degenerate: a perfect linear fit NULLs DW; a " +
      "single-day span still ranks one block; a one-arm corpus NULLs " +
      "the dispersion z2") {
    // counts exactly on a line → zero residuals → Σe² = 0 → NULL DW
    val d = "/tmp/graft_edge_events_line"
    import spark.implicits._
    val rows = for {
      day <- 0 to 2; i <- 0 to day // day d has d+1 events: slope 1 line
    } yield ((day * 10 + i + 1).toLong,
      day * 86400L * 1000000000L + i * 1000000000L, 1L, "ln", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val dw = SparkEntry.queries("q258_durbin_watson")(spark, d).collect()
    assert(dw.length === 1)
    assert(math.abs(dw.head.getDouble(2) - 1.0) < 1e-9, "slope 1 exact")
    assert(dw.head.isNullAt(3) && dw.head.isNullAt(4),
      "zero residual variance must NULL DW, never 0/0")
    // shared fixture: one calendar day → one block, both types tie or
    // rank within it; Q must still be finite and df = k−1 = 1
    val fr = SparkEntry.queries("q259_friedman")(spark, dir).collect()
    assert(fr.length === 2)
    assert(fr.forall(_.getLong(1) === 1L), "single block")
    assert(fr.forall(_.getLong(4) === 1L), "df = k - 1")
    // one-arm corpus: Var(W) has an n₂ = 0 factor → NULL z2, the W
    // score itself still reported
    val d1 = "/tmp/graft_edge_events_onearm"
    Seq((1L, 1000000000L, 7L, "t", 1.0, "{}"),
      (2L, 2000000000L, 7L, "t", 2.0, "{}"),
      (3L, 3000000000L, 7L, "t", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d1/events.parquet")
    val ab = SparkEntry.queries("q260_ansari_bradley")(spark, d1).collect()
    assert(ab.length === 1)
    // N = 3 scores are min(i, 4-i) = 1, 2, 1 → W = 4
    assert(ab.head.getLong(2) === 4L, "one-arm W is the full score sum")
    assert(ab.head.isNullAt(4), "zero variance must NULL z2")
  }

  test("q261/q262/q263 degenerate: spans shorter than the smallest " +
      "block yield no R/S rows; a single demand point NULLs Croston; " +
      "zero deviations NULL the BF F") {
    // shared fixture spans ≤ 3 hours → no full block of size 8 → empty
    assert(SparkEntry.queries("q261_hurst_rs")(spark, dir).collect()
      .isEmpty, "sub-block spans have no rescaled range")
    // one calendar day → M = 1 demand point per type → smoothed size is
    // the single 0.2·z term, gap smoother empty, forecast NULL
    val cr = SparkEntry.queries("q262_croston")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(cr.keySet === Set("solo", "multi"))
    for ((t, r) <- cr) {
      assert(r.getLong(1) === 1L, s"$t one demand point")
      assert(math.abs(r.getDouble(3) - 0.2 * r.getLong(2)) < 1e-9,
        s"$t single-point smoothed size is alpha*z")
      assert(r.getDouble(4) === 0.0, s"$t empty gap smoother")
      assert(r.isNullAt(5), s"$t forecast must be NULL at M = 1")
    }
    // n = 1 day per type → every deviation 0 → SSW = 0 → NULL F
    val bf = SparkEntry.queries("q263_brown_forsythe")(spark, dir)
      .collect()
    assert(bf.length === 2)
    assert(bf.forall(_.isNullAt(4)), "zero SSW must NULL the F")
  }

  test("q264/q265/q266 degenerate: spans too short for lag 3 are " +
      "excluded; a constant grid NULLs Grubbs; a metronome attains the " +
      "Greenwood floor exactly") {
    // shared fixture: solo spans 1 hour, multi spans 3 → n ≤ 3 → both
    // excluded from the PACF readout (n > 3 required for rho3)
    assert(SparkEntry.queries("q264_pacf")(spark, dir).collect().isEmpty,
      "lag-3 PACF needs more than 3 grid hours")
    // single-day spans are excluded from Grubbs (n > 1); a two-day
    // constant series has nQ = S² → NULL G, never 0/0
    val d = "/tmp/graft_edge_events_const2d"
    import spark.implicits._
    Seq((1L, 0L, 1L, "c", 1.0, "{}"),
      (2L, 86400L * 1000000000L, 1L, "c", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val gr = SparkEntry.queries("q265_grubbs")(spark, d).collect()
    assert(gr.length === 1)
    assert(gr.head.isNullAt(4) && gr.head.isNullAt(5),
      "a constant series must NULL G and the flag")
    // the metronome from the q257 edge: 3 equal spacings → G = 1/3
    // exactly, uniformity index (m+1)/(2m) = 2/3
    val gw = SparkEntry.queries("q266_greenwood")(
      spark, "/tmp/graft_edge_events_metronome").collect()
    assert(gw.length === 1 && gw.head.getLong(1) === 3L)
    assert(math.abs(gw.head.getDouble(3) - 1.0 / 3) < 1e-6,
      "equal spacings attain the Greenwood floor")
    assert(gw.head.getString(5) === "uniform",
      "a metronome is not clumped")
  }

  test("q267 degenerate: the exact-line fixture is one unbroken streak " +
      "where every day is a record") {
    // /tmp/graft_edge_events_line: counts 1, 2, 3 across 3 days (built
    // by the q258 edge — rebuild here to stay order-independent)
    val d = "/tmp/graft_edge_events_line267"
    import spark.implicits._
    val rows = for { day <- 0 to 2; i <- 0 to day }
      yield ((day * 10 + i + 1).toLong,
        day * 86400L * 1000000000L + i * 1000000000L, 1L, "ln", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val sr = SparkEntry.queries("q267_streaks_records")(spark, d).collect()
    assert(sr.length === 1)
    assert(sr.head.getLong(1) === 3L, "3 grid days")
    assert(sr.head.getLong(2) === 3L, "every day a record on a rising line")
    assert(sr.head.getLong(3) === 2L, "last record is day index 2")
    assert(sr.head.getLong(4) === 2L, "two rising steps")
  }

  test("q273/q275 degenerate: a single-group corpus has t-closeness " +
      "exactly 0; purchase-free and touch-free corpora degrade honestly") {
    import spark.implicits._
    // every event in ONE (type, hod) group → the group IS the global
    // distribution → every cumulative term cancels exactly
    val d = "/tmp/graft_edge_events_onegroup"
    (1 to 12).map(i => (i.toLong, i * 1000000000L, 1L, "g",
      i.toDouble, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val lt = SparkEntry.queries("q273_ldiv_tcloseness")(spark, d).collect()
    assert(lt.length === 1)
    assert(lt.head.getDouble(4) === 0.0, "self-distance must be exactly 0")
    assert(lt.head.getLong(3) === 10L, "12 rows spread all 10 deciles")
    // no purchases at all → zero conversions → the 3 channel rows
    // survive (the literal grid seeds them) with phi 0 and NULL share
    val sh0 = SparkEntry.queries("q275_shapley_attribution")(spark, dir)
      .collect()
    assert(sh0.length === 3 && sh0.forall(_.getLong(1) === 0L),
      "no conversions → zero attribution everywhere")
    assert(sh0.forall(_.isNullAt(3)), "zero total → NULL shares")
    // a purchase with NO prior touches → all v mass on the empty set →
    // each channel's only nonzero marginal is the S = ∅ term
    // 2·(v({i}) − v(∅)) = −2: the count-based v is NOT monotone, so
    // negative Shapley values are the honest answer ("absence of every
    // channel co-occurs with the conversion"), and efficiency
    // Σφ6 = 6·(v(all) − v(∅)) = −6 still holds exactly
    val d2 = "/tmp/graft_edge_events_untouched"
    Seq((1L, 1000000000L, 1L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d2/events.parquet")
    val sh = SparkEntry.queries("q275_shapley_attribution")(spark, d2)
      .collect()
    assert(sh.length === 3)
    assert(sh.forall(_.getLong(1) === -2L),
      "unattributable mass drags each channel to phi6 = -2")
    assert(sh.map(_.getLong(1)).sum === -6L, "efficiency at v(all)=0")
    assert(sh.forall(r => math.abs(r.getDouble(3) - 1.0 / 3) < 1e-6),
      "shares split the (negative) total evenly")
  }

  test("q277/q278 degenerate: an out-of-order chain never converts; a " +
      "metronome's zero-D Pareto fit is NULL") {
    import spark.implicits._
    // purchase BEFORE click (both after view) → level 3 never fires;
    // the membership funnel would have counted this user
    val d = "/tmp/graft_edge_events_ooo"
    Seq(
      (1L, 1000000000L, 1L, "view", 1.0, "{}"),
      (2L, 2000000000L, 1L, "purchase", 1.0, "{}"),
      (3L, 3000000000L, 1L, "click", 1.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val wf = SparkEntry.queries("q277_window_funnel")(spark, d).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(wf === Map(1 -> 1L, 2 -> 1L, 3 -> 0L),
      "view>click holds but the ordered 3-chain must not")
    // the metronome: every gap equals gmin → D = 0 → the Pareto MLE
    // diverges → NULL likelihood and verdict, exponential LL intact
    val llr = SparkEntry.queries("q278_gap_model_llr")(
      spark, "/tmp/graft_edge_events_metronome").collect()
    assert(llr.length === 1)
    assert(!llr.head.isNullAt(3), "exponential LL exists")
    assert(llr.head.isNullAt(4) && llr.head.isNullAt(6),
      "degenerate Pareto must NULL, never divide by zero")
  }

  test("q279/q280/q281 degenerate: a monotone line has zero turning " +
      "points and RVN rank diffs of exactly n-1; a perfect fit leaves " +
      "no influence readout") {
    val d = "/tmp/graft_edge_events_line267"
    // (already built by the q267 edge — rebuild defensively)
    import spark.implicits._
    val rows = for { day <- 0 to 2; i <- 0 to day }
      yield ((day * 10 + i + 1).toLong,
        day * 86400L * 1000000000L + i * 1000000000L, 1L, "ln", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    // counts 1,2,3 by day: daily ranks are the identity permutation →
    // every rank diff is 1 → sd2 = n−1 = 2, RVN = 12·2/(3·8) = 1
    val rvn = SparkEntry.queries("q280_bartels_rvn")(spark, d).collect()
    assert(rvn.length === 1)
    assert(rvn.head.getLong(2) === 2L, "identity ranks diff by 1")
    assert(math.abs(rvn.head.getDouble(3) - 1.0) < 1e-9,
      "monotone series → RVN exactly 1")
    // the same exact line fits perfectly → SSE = 0 → Cook's D has
    // nothing to diagnose → NULL cd on the (deterministic) argmax row
    val cd = SparkEntry.queries("q281_cooks_distance")(spark, d).collect()
    assert(cd.length === 1)
    assert(cd.head.isNullAt(5) && cd.head.isNullAt(6),
      "a perfect fit must NULL Cook's D, never 0/0")
    // turning points on the hourly axis of the shared fixture: solo is
    // a single hour (n < 3, excluded); multi spans 3 hours with counts
    // (1,1,1) → interior point ties both neighbors → T = 0
    val tp = SparkEntry.queries("q279_turning_points")(spark, dir)
      .collect()
    assert(tp.length === 1 && tp.head.getString(0) === "multi")
    assert(tp.head.getLong(2) === 0L, "flat interior is not an extremum")
  }

  test("q285/q286/q287 degenerate: same-microsecond events count as " +
      "double fires; a lone cohort owns the whole curve; one-arm " +
      "corpora NULL the Simpson verdict") {
    import spark.implicits._
    // two events in the SAME microsecond → gap 0 ≤ threshold → 1 dup
    val d = "/tmp/graft_edge_events_samems2"
    Seq((1L, 1000000000L, 7L, "t", 1.0, "{}"),
      (2L, 1000000000L, 7L, "t", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val df0 = SparkEntry.queries("q285_double_fire")(spark, d).collect()
    assert(df0.length === 1)
    assert(df0.head.getLong(2) === 1L, "same-us pair is one double fire")
    assert(df0.head.getLong(4) === 7L, "worst user identified")
    // one user, one week → one cohort at age 0 carrying all revenue
    val ltv = SparkEntry.queries("q286_cohort_ltv")(spark, d).collect()
    assert(ltv.length === 1)
    assert(ltv.head.getLong(0) === 0L && ltv.head.getLong(1) === 0L)
    assert(math.abs(ltv.head.getDouble(5) - 3.0) < 1e-9,
      "3 dollars across 1 user at age 0")
    // a single user lands in one arm → the other arm is empty
    // everywhere → NULL verdict, overall sign still reported
    val sa = SparkEntry.queries("q287_simpson_audit")(spark, d).collect()
    assert(sa.length === 1)
    assert(sa.head.isNullAt(5), "one-arm corpora carry no verdict")
  }

  test("q288/q289/q290 degenerate: a constant series is Poisson-exact " +
      "(no NB fit); 2-event users have no trigram; single-day spans " +
      "have no seasonal pairs") {
    import spark.implicits._
    // two equal-count days → s² = 0 ≤ μ → underdispersed → NULL k/p
    val d = "/tmp/graft_edge_events_const2d"
    Seq((1L, 0L, 1L, "c", 1.0, "{}"),
      (2L, 86400L * 1000000000L, 1L, "c", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val nb = SparkEntry.queries("q288_negbinomial_fit")(spark, d).collect()
    assert(nb.length === 1)
    assert(nb.head.isNullAt(3) && nb.head.isNullAt(4),
      "underdispersed series have no NB fit")
    // shared fixture: no user reaches 3 events → zero trigrams →
    // EMPTY readout (short sequences carry no 2-history, stated)
    assert(SparkEntry.queries("q289_order2_entropy")(spark, dir)
      .collect().isEmpty, "sub-trigram sequences have no order-2 state")
    // one 3-event user → exactly one trigram: both entropies are 0 and
    // the gain is exactly 0 (a deterministic sequence has no surprise)
    val d3 = "/tmp/graft_edge_events_tri"
    Seq((1L, 1000000000L, 1L, "a", 1.0, "{}"),
      (2L, 2000000000L, 1L, "b", 1.0, "{}"),
      (3L, 3000000000L, 1L, "a", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d3/events.parquet")
    val o2 = SparkEntry.queries("q289_order2_entropy")(spark, d3)
      .collect()
    assert(o2.length === 1 && o2.head.getLong(2) === 1L)
    assert(o2.head.getDouble(4) === 0.0 && o2.head.getDouble(5) === 0.0)
    assert(o2.head.getDouble(6) === 0.0, "one trigram → zero gain")
    // single-day span → every hod slice has one observation → zero
    // day pairs anywhere → the pair aggregate is EMPTY → no readout
    // (a span too short to compare same-hod days has no seasonal-MK
    // answer, same stance as q255's h = 0)
    assert(SparkEntry.queries("q290_seasonal_mann_kendall")(spark, dir)
      .collect().isEmpty, "no same-hod day pairs, no readout")
  }

  test("q292 degenerate: a single-day span has no concentration scale; " +
      "a one-day point mass is maximally concentrated") {
    // shared fixture: each type spans one day → n = 1 → NULL normalized
    val hhi = SparkEntry.queries("q292_volume_hhi")(spark, dir).collect()
    assert(hhi.length === 2)
    assert(hhi.forall(_.getDouble(3) === 1.0), "single day → HHI 1")
    assert(hhi.forall(_.isNullAt(4)),
      "n = 1 has no concentration scale → NULL normalized HHI")
    // hand-computable 3-day shapes: p = (2, 0, 1) → HHI = 5/9,
    // normalized (5/9 − 1/3)/(2/3) = 1/3; q2 = (1, 0, 1) → HHI = 1/2,
    // normalized 1/4
    import spark.implicits._
    val d = "/tmp/graft_edge_events_pointmass"
    Seq((1L, 0L, 1L, "p", 1.0, "{}"),
      (2L, 1000000000L, 1L, "p", 1.0, "{}"),
      (3L, 2 * 86400L * 1000000000L, 1L, "p", 1.0, "{}"),
      (4L, 0L, 1L, "q2", 1.0, "{}"),
      (5L, 2 * 86400L * 1000000000L, 1L, "q2", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val h2 = SparkEntry.queries("q292_volume_hhi")(spark, d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(math.abs(h2("p").getDouble(4) - 1.0 / 3) < 1e-6,
      "(2,0,1) normalizes to exactly 1/3")
    assert(math.abs(h2("q2").getDouble(4) - 0.25) < 1e-6,
      "(1,0,1) normalizes to exactly 1/4")
  }

  test("q293 degenerate: a single-priority (or single-bucket) orders " +
      "corpus has min(r-1, c-1) = 0 — the nullif guard must yield NULL " +
      "cramers_v on both engines, never NaN") {
    import spark.implicits._
    def ts(days: Long) = new java.sql.Timestamp(days * 86400000L)
    // two 30-day buckets, ONE priority → ncol = 1 → 0/0 guarded
    val d1 = "/tmp/graft_edge_orders_onep"
    Seq((1L, 1L, "O", 10.0, ts(0L), "1-URGENT"),
      (2L, 1L, "O", 10.0, ts(40L), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d1/orders.parquet")
    val r1 = SparkEntry.queries("q293_priority_mix_shift")(spark, d1)
      .collect()
    assert(r1.length === 2)
    // degenerate margins: every cell O = R, C = N → chi2 exactly 0
    assert(r1.forall(_.getDouble(4) === 0.0), "degenerate chi2 is 0")
    assert(r1.forall(_.isNullAt(5)),
      "min(r-1, c-1) = 0 must NULL cramers_v, not NaN")
    // one bucket, two priorities → nrow = 1 → same guard, other margin
    val d2 = "/tmp/graft_edge_orders_onemon"
    Seq((1L, 1L, "O", 10.0, ts(1L), "1-URGENT"),
      (2L, 1L, "O", 10.0, ts(2L), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d2/orders.parquet")
    val r2 = SparkEntry.queries("q293_priority_mix_shift")(spark, d2)
      .collect()
    assert(r2.length === 2)
    assert(r2.forall(_.isNullAt(5)),
      "a single bucket must NULL cramers_v too")
  }

  test("q296 degenerate: a metronome attains B = -1 exactly; an all-" +
      "same-second type (zero gap sum) NULLs B and CV, never 0/0") {
    // the 4-event equal-spacing fixture from the q257 edge: sigma = 0
    // makes (0 - mu)/(0 + mu) = -1 with NO floating cancellation
    val gm = SparkEntry.queries("q296_gap_burstiness")(
      spark, "/tmp/graft_edge_events_metronome").collect()
    assert(gm.length === 1 && gm.head.getLong(1) === 3L)
    assert(gm.head.getDouble(5) === -1.0, "a metronome is B = -1 exactly")
    assert(gm.head.getDouble(4) === 0.0, "CV of equal gaps is 0")
    // two events in the same second: the only gap is 0 -> S = 0 and
    // sigma = 0 -> both ratios are 0/0 -> NULL via the nullif guard
    val d = "/tmp/graft_edge_events_samesec"
    import spark.implicits._
    Seq((1L, 1000000000L, 1L, "s", 1.0, "{}"),
      (2L, 1500000000L, 1L, "s", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val gs = SparkEntry.queries("q296_gap_burstiness")(spark, d).collect()
    assert(gs.length === 1 && gs.head.getLong(1) === 1L)
    assert(gs.head.isNullAt(4) && gs.head.isNullAt(5),
      "zero gap mass must NULL CV and B")
  }

  test("q297/q298/q299 degenerate: purchase-free corpora empty a 2x2 " +
      "margin (NULL OR) and have no discordant pairs (NULL McNemar); a " +
      "single-day span has zero total variance (NULL eta2)") {
    // the shared fixture has NO purchase events: the purchase margin is
    // empty → OR undefined → NULL estimate AND NULL string verdict
    val or = SparkEntry.queries("q297_odds_ratio")(spark, dir).collect()
    assert(or.length === 1)
    assert(or.head.isNullAt(4) && or.head.isNullAt(7),
      "an empty 2x2 cell must NULL the OR and the verdict")
    // no purchases → every user is (0, 0) → b = c = 0 → NULL chi2
    val mc = SparkEntry.queries("q298_mcnemar")(spark, dir).collect()
    assert(mc.length === 1)
    assert(mc.head.getLong(2) === 0L && mc.head.getLong(3) === 0L)
    assert(mc.head.isNullAt(5) && mc.head.isNullAt(6),
      "no discordant users must NULL the test")
    // each type spans one day → n = 1 grid cell → SST = 0 → NULL eta2,
    // peak multiple exactly 1 (the one day IS the mean)
    val dw = SparkEntry.queries("q299_dow_seasonality")(spark, dir)
      .collect()
    assert(dw.length === 2)
    assert(dw.forall(_.getLong(1) === 1L))
    assert(dw.forall(_.isNullAt(2)), "SST = 0 must NULL eta2")
    assert(dw.forall(_.getDouble(4) === 1.0), "one day is its own mean")
  }

  test("q301/q302 degenerate: a single event type has no internal " +
      "consistency (k-1 = 0) and no ranking spread (k^2-1 = 0); equal " +
      "user totals zero the total variance") {
    // single-type corpus: the same-second pair fixture from the q296
    // edge has one type 's' and one user
    val d = "/tmp/graft_edge_events_samesec"
    val al = SparkEntry.queries("q301_cronbach_alpha")(spark, d).collect()
    assert(al.length === 1 && al.head.getLong(0) === 1L)
    assert(al.head.isNullAt(2), "k = 1 must NULL alpha")
    val kw = SparkEntry.queries("q302_kendall_w")(spark, d).collect()
    assert(kw.length === 1 && kw.head.getLong(0) === 1L)
    assert(kw.head.isNullAt(2) && kw.head.isNullAt(3),
      "k = 1 must NULL W and the Friedman chi2")
    // two users, two types, each user exactly one event of each type:
    // user totals are all equal -> SST = 0 -> NULL alpha (never 0/0)
    val d2 = "/tmp/graft_edge_events_eqtotals"
    import spark.implicits._
    Seq((1L, 1000000000L, 1L, "a", 1.0, "{}"),
      (2L, 2000000000L, 1L, "b", 1.0, "{}"),
      (3L, 3000000000L, 2L, "a", 1.0, "{}"),
      (4L, 4000000000L, 2L, "b", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d2/events.parquet")
    val a2 = SparkEntry.queries("q301_cronbach_alpha")(spark, d2).collect()
    assert(a2.length === 1 && a2.head.getLong(0) === 2L
      && a2.head.getLong(1) === 2L)
    assert(a2.head.isNullAt(2), "equal totals must NULL alpha via nullif")
  }

  test("q303/q304 degenerate: a single participant has zero Theil and " +
      "no inequality ceiling; a single customer owns the whole decile") {
    // samesec fixture: one user, one type → x = S → every ln term is
    // ln(1) = 0 → T exactly 0; n = 1 → ln(1) = 0 → NULL ratio
    val d = "/tmp/graft_edge_events_samesec"
    val th = SparkEntry.queries("q303_theil_index")(spark, d).collect()
    assert(th.length === 1 && th.head.getLong(1) === 1L)
    assert(th.head.getDouble(3) === 0.0, "one participant → T = 0")
    assert(th.head.isNullAt(4), "ln(1) = 0 must NULL the ratio")
    // the q293 single-priority orders fixture has ONE customer: the
    // top decile is that customer → share exactly 1, HHI exactly 10^4
    val cc = SparkEntry.queries("q304_customer_concentration")(
      spark, "/tmp/graft_edge_orders_onep").collect()
    assert(cc.length === 1 && cc.head.getLong(0) === 1L)
    assert(cc.head.getDouble(3) === 1.0, "one customer owns the decile")
    assert(math.abs(cc.head.getDouble(2) - 10000.0) < 1e-6,
      "a monopoly reads HHI = 10000 points")
  }

  test("q306 degenerate: an order with zero line items counts; equal " +
      "order sizes read D = 0 exactly; a single order NULLs D") {
    import spark.implicits._
    def ts(days: Long) = new java.sql.Timestamp(days * 86400000L)
    // order 1 has 2 items, order 2 has NONE: counts (2, 0) → n=2, S=2,
    // Q=4 → D = (2*4 - 4)/(1*2) = 2 exactly
    val d = "/tmp/graft_edge_orders_disp"
    Seq((1L, 1L, "O", 10.0, ts(1L), "1-URGENT"),
      (2L, 1L, "O", 10.0, ts(2L), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq((1L, 1L, 1L, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ts(3L)),
      (1L, 2L, 1L, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", ts(3L)))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val r = SparkEntry.queries("q306_order_dispersion")(spark, d)
      .collect()
    assert(r.length === 1 && r.head.getLong(0) === 2L)
    assert(r.head.getLong(1) === 2L, "the empty order zero-fills")
    assert(r.head.getDouble(4) === 2.0, "(2,0) disperses to D = 2")
    // both orders with ONE item each: variance 0 → D = 0 exactly
    val d2 = "/tmp/graft_edge_orders_disp0"
    Seq((1L, 1L, "O", 10.0, ts(1L), "1-URGENT"),
      (2L, 1L, "O", 10.0, ts(2L), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d2/orders.parquet")
    Seq((1L, 1L, 1L, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ts(3L)),
      (2L, 2L, 1L, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ts(3L)))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$d2/lineitem.parquet")
    val r2 = SparkEntry.queries("q306_order_dispersion")(spark, d2)
      .collect()
    assert(r2.length === 1 && r2.head.getDouble(4) === 0.0,
      "equal sizes have zero dispersion")
  }

  test("q309/q310 degenerate: all-tied pairs leave no signed ranks " +
      "(NULL verdict); a single type has no volume pairs") {
    import spark.implicits._
    // one user, equal cents in each half → diff = 0 → excluded → n = 0
    val d = "/tmp/graft_edge_events_tiedpairs"
    Seq((1L, 1000000000L, 1L, "t", 5.0, "{}"),
      (2L, 7200L * 1000000000L, 1L, "t", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val w = SparkEntry.queries("q309_wilcoxon_signed_rank")(spark, d)
      .collect()
    assert(w.length === 1 && w.head.getLong(0) === 0L)
    assert(w.head.isNullAt(3) && w.head.isNullAt(4),
      "zero usable pairs must NULL z2 and the verdict")
    // the samesec fixture has ONE type → no pair rows at all
    assert(SparkEntry.queries("q310_type_volume_spearman")(
      spark, "/tmp/graft_edge_events_samesec").collect().isEmpty,
      "one type has no pair matrix")
  }

  test("q312/q313 degenerate: a constant-size catalog NULLs r; a " +
      "single-nation supply chain owns share exactly 1") {
    import spark.implicits._
    // two parts, SAME size, different prices → varx = 0 → NULL r/slope
    val d = "/tmp/graft_edge_parts_constsize"
    Seq((1L, "pa", "B", "T", 5, 10.0), (2L, "pb", "B", "T", 5, 20.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/part.parquet")
    val r = SparkEntry.queries("q312_size_price_corr")(spark, d)
      .collect()
    assert(r.length === 1 && r.head.getLong(0) === 2L)
    assert(r.head.isNullAt(1) && r.head.isNullAt(2),
      "zero size variance must NULL r and the slope")
    // one supplier, one nation: the share is exactly 1 (ratio6 of
    // equal exact integers)
    val d2 = "/tmp/graft_edge_onenation"
    def ts(days: Long) = new java.sql.Timestamp(days * 86400000L)
    Seq((1L, "s1", 0L, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .coalesce(1).write.mode("overwrite").parquet(s"$d2/supplier.parquet")
    Seq((0L, "N0", 0L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$d2/nation.parquet")
    Seq((1L, 1L, 1L, 1, 1.0, 100.0, 0.1, 0.0, "N", "O", ts(3L)),
      (2L, 2L, 1L, 1, 1.0, 250.0, 0.0, 0.0, "N", "O", ts(4L)))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$d2/lineitem.parquet")
    val nr = SparkEntry.queries("q313_nation_revenue_share")(spark, d2)
      .collect()
    assert(nr.length === 1 && nr.head.getString(0) === "N0")
    assert(math.abs(nr.head.getDouble(1) - 340.0) < 1e-9,
      "90 + 250 discounted revenue")
    assert(nr.head.getDouble(3) === 1.0, "a monopoly nation owns share 1")
  }

  test("q143/q144/q153/q165/q166/q304 degenerate: empty date slice, " +
      "zero-share market, pair-free baskets, identical skyline points, " +
      "constant prices, and a single/duopoly customer base") {
    import spark.implicits._
    def ts(days: Long) = new java.sql.Timestamp(days * 86400000L)
    // one fixture family: 2 regions, 3 nations, identical parts, single-
    // item orders dated OUTSIDE q143's 1997 window, no NATION_6 supplier
    val d = "/tmp/graft_edge_tpch_degen"
    Seq((0, "EUROPE"), (1, "AMERICA"))
      .toDF("r_regionkey", "r_name")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/region.parquet")
    Seq((0, "NATION_0", 0), (6, "NATION_6", 1), (7, "NATION_7", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/nation.parquet")
    Seq((1L, "s1", 0, 0.0), (2L, "s2", 7, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/supplier.parquet")
    Seq((1L, "c1", 0, 0.0, "BUILDING"), (2L, "c2", 7, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/customer.parquet")
    // p1 and p2 are IDENTICAL on both skyline axes (price, size)
    Seq((1L, "pa", "B", "PROMO", 5, 10.0), (2L, "pb", "B", "PROMO", 5, 10.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/part.parquet")
    // 1995 dates: inside q144's group-by-year, OUTSIDE q143's 1997 slice
    Seq((1L, 1L, "O", 10.0, ts(9282L), "1-URGENT"),
      (2L, 2L, "O", 10.0, ts(9283L), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq((1L, 1L, 1L, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ts(9284L)),
      (2L, 2L, 2L, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ts(9284L)))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/lineitem.parquet")

    // q143: the 1997 date slice is EMPTY → zero groups, zero rows (the
    // stated exclusion — an empty slice is not a zero-revenue row)
    assert(SparkEntry.queries("q143_local_supplier_revenue")(spark, d)
      .collect().isEmpty, "an empty date slice yields no rows")

    // q144: the AMERICA/PROMO market exists (c2 chain) but NO supplier
    // is NATION_6 → nation_rev and share are exactly 0.0, never NULL
    val ms = SparkEntry.queries("q144_market_share")(spark, d).collect()
    assert(ms.length === 1 && ms.head.getLong(0) === 1995L)
    assert(ms.head.getDouble(1) === 0.0, "no NATION_6 rows → zero rev")
    assert(ms.head.getDouble(3) === 0.0, "zero share exactly, not NULL")

    // q153: single-item baskets have no part pairs → empty lift table
    assert(SparkEntry.queries("q153_basket_lift")(spark, d)
      .collect().isEmpty, "no multi-item basket → no pairs")

    // q165: identical points do not dominate each other (ties on both
    // axes, strict on neither) → BOTH survive the skyline
    val sky = SparkEntry.queries("q165_pareto_skyline")(spark, d)
      .collect().map(_.getLong(0)).sorted
    assert(sky.toSeq === Seq(1L, 2L),
      "identical points must both survive the skyline")

    // q166: a constant-price corpus reads p05 = p95 = winsor = trim
    // exactly (no half-cent ambiguity — all runs are one value)
    val wm = SparkEntry.queries("q166_winsorized_mean")(spark, d)
      .collect()
    assert(wm.length === 1 && wm.head.getLong(1) === 2L)
    for (i <- 2 to 5)
      assert(wm.head.getDouble(i) === 10.0,
        s"constant prices: field $i must be exactly 10.0")

    // q304 duopoly: two equal customers → HHI = 10⁴·(¼+¼) = 5000
    // exactly; top decile k = ⌈2/10⌉ = 1 → share = 1/2 exactly
    val duo = SparkEntry.queries("q304_customer_concentration")(spark, d)
      .collect()
    assert(duo.length === 1 && duo.head.getLong(0) === 2L)
    assert(duo.head.getDouble(2) === 5000.0, "equal duopoly HHI")
    assert(duo.head.getDouble(3) === 0.5, "top-1-of-2 share is 1/2")

    // q304 monopoly: ONE customer owns everything → share 1, HHI 10⁴
    val d2 = "/tmp/graft_edge_tpch_mono"
    Seq((1L, 1L, "O", 10.0, ts(9282L), "1-URGENT"),
      (2L, 1L, "O", 30.0, ts(9283L), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d2/orders.parquet")
    val mono = SparkEntry.queries("q304_customer_concentration")(
      spark, d2).collect()
    assert(mono.length === 1 && mono.head.getLong(0) === 1L)
    assert(mono.head.getDouble(2) === 10000.0, "monopoly HHI is 10^4")
    assert(mono.head.getDouble(3) === 1.0, "monopoly share is 1")

    // q322 on the degen fixture: one line per order, delays 2 and 1
    // days, one priority → n=2, p50 = 1 (k50 = 1), p95 = 2, mean 1.5
    val sd = SparkEntry.queries("q322_shipping_delay")(spark, d).collect()
    assert(sd.length === 1 && sd.head.getString(0) === "1-URGENT")
    assert(sd.head.getLong(1) === 2L)
    assert(sd.head.getLong(2) === 1L && sd.head.getLong(3) === 2L)
    assert(sd.head.getDouble(4) === 1.5, "mean of {1,2} is exactly 1.5")

    // q323 on the degen fixture: every customer has ONE order → zero
    // gaps → EMPTY output (the lag-NULL semantics, stated)
    assert(SparkEntry.queries("q323_repeat_intervals")(spark, d)
      .collect().isEmpty, "single-order customers leave no intervals")
  }

  test("q315/q317 degenerate: a one-user corpus collapses every " +
      "percentile to its count; a metronome's gap spread is exactly 1; " +
      "a zero-second median NULLs the tail ratio") {
    // samesec fixture: one user with two events → p50 = p90 = p99 = 2
    val d = "/tmp/graft_edge_events_samesec"
    val ua = SparkEntry.queries("q315_user_activity_percentiles")(
      spark, d).collect()
    assert(ua.length === 1 && ua.head.getLong(0) === 1L)
    assert(ua.head.getLong(1) === 2L && ua.head.getLong(3) === 2L)
    assert(ua.head.getDouble(4) === 1.0, "degenerate spread is 1")
    // metronome: 3 equal 3600s gaps → all percentiles 3600, ratio 1
    val gp = SparkEntry.queries("q317_gap_percentiles")(
      spark, "/tmp/graft_edge_events_metronome").collect()
    assert(gp.length === 1)
    assert(gp.head.getLong(2) === 3600L && gp.head.getLong(4) === 3600L)
    assert(gp.head.getDouble(5) === 1.0, "equal gaps spread to 1")
    // samesec: the single gap is 0 s → p50 = 0 → NULL ratio via nullif
    val g0 = SparkEntry.queries("q317_gap_percentiles")(spark, d)
      .collect()
    assert(g0.length === 1 && g0.head.getLong(2) === 0L)
    assert(g0.head.isNullAt(5), "zero median must NULL the tail ratio")
  }
}
