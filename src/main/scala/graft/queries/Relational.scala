package graft.queries

import graft.{Q, Tables}
import graft.functions.Exact
import graft.functions.Exact.Sql
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operator coverage: scan/filter/project, every join kind,
  * aggregation (plain, distinct, rollup/cube), conditional aggregation,
  * scalar subqueries. Each query has a DuckDB oracle twin.
  *
  * Conventions for oracle hash-parity (see SURVEY.md §5):
  *  - every aggregate over doubles goes through [[Exact]] (order-independent);
  *  - row-level double arithmetic uses the same IEEE expression tree in both
  *    engines (bit-identical, no rounding needed);
  *  - every query ends in a total deterministic ORDER BY on both sides;
  *  - DuckDB ORDER BY always spells NULLS FIRST/LAST to match Spark defaults;
  *  - timestamps leave the engine as DATE or epoch BIGINT, never raw
  *    timestamps (ns/µs/tz representation differences).
  *
  * Scale notes: all plans here are shuffle-minimal — only BOUNDED dims
  * (region/nation/literal bands) carry broadcast hints; scale-proportional
  * tables (customer/orders/lineitem) always join by shuffle or whatever AQE
  * picks at runtime. Aggregations are partial+final hash aggregates, and no
  * operator ever collects to the driver. They survive a 1000-executor
  * 100 TB run as-is.
  */
object Relational {

  def all: Seq[Q] = Seq(
    q01PricingSummary,
    q02FilterProject,
    q03JoinAgg,
    q04StarBroadcast,
    q05SemiJoin,
    q06AntiJoin,
    q07OuterJoinHistogram,
    q08BandJoin,
    q10AggDistinct,
    q11Rollup,
    q12Cube,
    q25ConditionalAgg,
    q26ScalarSubquery,
    q143LocalSupplierRevenue,
    q144MarketShare,
  )

  /** TPC-H Q1-style pricing summary: filter → hash agg → sort. */
  val q01PricingSummary = Q(
    "q01_pricing_summary",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Sql.dsum("l_quantity")} AS sum_qty,
       |  ${Sql.dsum("l_extendedprice")} AS sum_base_price,
       |  ${Sql.dsum("l_extendedprice * (1.0 - l_discount)", 6)} AS sum_disc_price,
       |  ${Sql.dsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 6)} AS sum_charge,
       |  ${Sql.davg("l_quantity")} AS avg_qty,
       |  ${Sql.davg("l_extendedprice")} AS avg_price,
       |  ${Sql.davg("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    val li = Tables.lineitem(s, d)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Exact.dsum(col("l_quantity")).as("sum_qty"),
        Exact.dsum(col("l_extendedprice")).as("sum_base_price"),
        // scale 6: the 2dp×2dp(×2dp) products have up to 6 true decimals, so
        // a scale-4 cast sits ON a rounding tie (x.xxxx50) where Spark's
        // string-based and DuckDB's binary-based double→decimal casts can
        // disagree; at scale 6 the true value is exact and both recover it.
        Exact
          .dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .as("sum_disc_price"),
        Exact
          .dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax")), 6)
          .as("sum_charge"),
        Exact.davg(col("l_quantity")).as("avg_qty"),
        Exact.davg(col("l_extendedprice")).as("avg_price"),
        Exact.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"),
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Selective filter + projection with row-level arithmetic; predicate and
    * column pruning both push into the parquet scan.
    */
  val q02FilterProject = Q(
    "q02_filter_project",
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice * l_discount AS disc_revenue
      |FROM lineitem
      |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
      |  AND l_shipdate >= TIMESTAMP '1996-01-01'
      |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST,
      |  disc_revenue NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    Tables
      .lineitem(s, d)
      .filter(
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24 &&
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        (col("l_extendedprice") * col("l_discount")).as("disc_revenue"),
      )
      // ALL output columns in the sort (r17, found by the skew axis's
      // repartition: the driver lineitem carries 118k duplicate
      // (l_orderkey, l_linenumber) pairs — §5.7's total-keys row — so a
      // two-column sort left tied rows in physical file order; sorting
      // by every output column makes any remaining ties identical rows)
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("disc_revenue"))
  }

  /** 3-way join (fact-fact-dim) + aggregation. `customer` is NOT broadcast:
    * it is scale-proportional (~1.5B rows on the 100 TB posture), so the
    * join strategy is left to AQE/statistics — broadcast when it actually
    * fits, shuffle-hash/sort-merge otherwise.
    */
  val q03JoinAgg = Q(
    "q03_join_agg",
    s"""SELECT c_mktsegment,
       |  ${Sql.dsum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  COUNT(*) AS n_lines
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |WHERE o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(s, d)
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        Exact
          .dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_lines"),
      )
      .orderBy(col("c_mktsegment"))
  }

  /** TPC-H Q5-style star join. Only the BOUNDED dims (region×nation, ≤25
    * rows at any scale) are broadcast; `customer` grows with the data and
    * joins by shuffle — broadcasting it would OOM executors at 100 TB.
    */
  val q04StarBroadcast = Q(
    "q04_star_broadcast",
    s"""SELECT n_name,
       |  ${Sql.dsum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  COUNT(*) AS n_lines
       |FROM region
       |JOIN nation ON n_regionkey = r_regionkey
       |JOIN customer ON c_nationkey = n_nationkey
       |JOIN orders ON o_custkey = c_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE r_name = 'ASIA'
       |GROUP BY n_name
       |ORDER BY n_name NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    val regions = broadcast(
      Tables.region(s, d)
        .filter(col("r_name") === "ASIA")
        .join(Tables.nation(s, d), col("n_regionkey") === col("r_regionkey")))
    Tables.customer(s, d)
      .join(regions, col("c_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"))
      .agg(
        Exact
          .dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_lines"),
      )
      .orderBy(col("n_name"))
  }

  /** Left-semi join (EXISTS): orders having a high-quantity line. */
  val q05SemiJoin = Q(
    "q05_semi_join",
    """SELECT o_orderstatus, COUNT(*) AS n_orders
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    Tables
      .orders(s, d)
      .join(
        Tables.lineitem(s, d).filter(col("l_quantity") > 45),
        col("o_orderkey") === col("l_orderkey"),
        "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"))
  }

  /** Left-anti join (NOT EXISTS): customers who never ordered. */
  val q06AntiJoin = Q(
    "q06_anti_join",
    """SELECT c_mktsegment, COUNT(*) AS n_customers
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    Tables
      .customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"),
        "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** TPC-H Q13-style: left outer join preserved-side histogram. The probe
    * side is pre-aggregated to one row per o_custkey BEFORE the join
    * (classic Q13 rewrite) — the join then moves ~10× fewer rows, and
    * COUNT(o_orderkey) over the raw join equals COALESCE(pre-agg count, 0)
    * because o_orderkey is never null in orders.
    */
  val q07OuterJoinHistogram = Q(
    "q07_outer_join_histogram",
    """SELECT c_count, COUNT(*) AS n_customers FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey
      |) GROUP BY c_count
      |ORDER BY c_count NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    val perCust = Tables
      .orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"))
    Tables
      .customer(s, d)
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_count"))
  }

  /** Theta/band join against a tiny literal dimension (broadcast nested
    * loop): price-band classification of orders.
    */
  val q08BandJoin = Q(
    "q08_band_join",
    s"""WITH bands(band, lo, hi) AS (VALUES
       |  ('p0_small', 0.0, 50000.0),
       |  ('p1_medium', 50000.0, 150000.0),
       |  ('p2_large', 150000.0, 1e12))
       |SELECT band, COUNT(*) AS n_orders,
       |  ${Sql.dsum("o_totalprice", 2)} AS sum_price
       |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
       |GROUP BY band
       |ORDER BY band NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    val bands = s
      .createDataFrame(Seq(
        ("p0_small", 0.0, 50000.0),
        ("p1_medium", 50000.0, 150000.0),
        ("p2_large", 150000.0, 1e12),
      ))
      .toDF("band", "lo", "hi")
    Tables
      .orders(s, d)
      .join(broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("n_orders"),
        Exact.dsum(col("o_totalprice"), 2).as("sum_price"),
      )
      .orderBy(col("band"))
  }

  /** COUNT(DISTINCT) + exact min/max per group. */
  val q10AggDistinct = Q(
    "q10_agg_distinct",
    """SELECT o_orderpriority,
      |  COUNT(DISTINCT o_custkey) AS n_custs,
      |  MIN(o_totalprice) AS min_price,
      |  MAX(o_totalprice) AS max_price,
      |  COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    Tables
      .orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_custs"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        count(lit(1)).as("n_orders"),
      )
      .orderBy(col("o_orderpriority"))
  }

  /** ROLLUP grouping sets; subtotal NULL markers folded to 'ALL'. */
  val q11Rollup = Q(
    "q11_rollup",
    s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
       |  COALESCE(l_linestatus, 'ALL') AS ls,
       |  ${Sql.dsum("l_quantity")} AS sum_qty, COUNT(*) AS n
       |FROM lineitem
       |GROUP BY ROLLUP (l_returnflag, l_linestatus)
       |HAVING count(*) > 0
       |ORDER BY rf NULLS FIRST, ls NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    Tables
      .lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(Exact.dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"),
        col("n"),
      )
      .orderBy(col("rf"), col("ls"))
  }

  /** CUBE grouping sets over two dims. */
  val q12Cube = Q(
    "q12_cube",
    s"""SELECT COALESCE(o_orderstatus, 'ALL') AS st,
       |  COALESCE(o_orderpriority, 'ALL') AS pri,
       |  COUNT(*) AS n, ${Sql.dsum("o_totalprice", 2)} AS sum_price
       |FROM orders
       |GROUP BY CUBE (o_orderstatus, o_orderpriority)
       |HAVING count(*) > 0
       |ORDER BY st NULLS FIRST, pri NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    Tables
      .orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        Exact.dsum(col("o_totalprice"), 2).as("sum_price"),
      )
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
        col("n"),
        col("sum_price"),
      )
      .orderBy(col("st"), col("pri"))
  }

  /** CASE WHEN + conditional (filtered) aggregation. */
  val q25ConditionalAgg = Q(
    "q25_conditional_agg",
    s"""SELECT l_linestatus,
       |  ${Sql.dsum("CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0.0 END")} AS returned_qty,
       |  ${Sql.dsum("CASE WHEN l_discount > 0.05 THEN l_extendedprice * l_discount ELSE 0.0 END")} AS big_discounts,
       |  COUNT(CASE WHEN l_tax = 0.0 THEN 1 END) AS n_taxfree
       |FROM lineitem
       |GROUP BY l_linestatus
       |ORDER BY l_linestatus NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    Tables
      .lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .agg(
        Exact
          .dsum(when(col("l_returnflag") === "R", col("l_quantity"))
            .otherwise(lit(0.0)))
          .as("returned_qty"),
        Exact
          .dsum(when(col("l_discount") > 0.05,
            col("l_extendedprice") * col("l_discount")).otherwise(lit(0.0)))
          .as("big_discounts"),
        count(when(col("l_tax") === 0.0, lit(1))).as("n_taxfree"),
      )
      .orderBy(col("l_linestatus"))
  }

  /** Scalar subquery: customers above the (exact) global mean balance. */
  val q26ScalarSubquery = Q(
    "q26_scalar_subquery",
    s"""SELECT c_custkey, c_acctbal
       |FROM customer
       |WHERE c_acctbal > (SELECT ${Sql.davg("c_acctbal", 2)} FROM customer)
       |ORDER BY c_custkey NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    val c = Tables.customer(s, d)
    val mean = c.agg(Exact.davg(col("c_acctbal"), 2).as("m"))
    c.join(broadcast(mean))
      .filter(col("c_acctbal") > col("m"))
      .select(col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** FULL TPC-H Q5 shape (q04 is the plain star; this adds the clause
    * that breaks naive star planning): revenue from LOCAL commerce only —
    * the customer's nation must EQUAL the supplier's nation, a
    * cross-dimension equality that correlates two different foreign-key
    * chains of the same fact row. Join graph: region→nation broadcast
    * (bounded, ≤25 rows at any scale), supplier and customer by shuffle,
    * lineitem⋈orders on the fact keys, and the local-only condition rides
    * the customer join as an extra equi-predicate — no post-filter of a
    * wider join. Q5's classic plan risk is the optimizer routing
    * customer⋈supplier through a nation-keyed m×n blowup; keying the
    * customer join on (o_custkey AND c_nationkey = s_nationkey) keeps the
    * build side fact-shaped.
    */
  val q143LocalSupplierRevenue = Q(
    "q143_local_supplier_revenue",
    s"""SELECT n_name,
       |  ${Sql.dsum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  COUNT(*) AS n_lines
       |FROM region
       |JOIN nation ON n_regionkey = r_regionkey
       |JOIN supplier ON s_nationkey = n_nationkey
       |JOIN lineitem ON l_suppkey = s_suppkey
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN customer ON c_custkey = o_custkey
       |  AND c_nationkey = s_nationkey
       |WHERE r_name = 'EUROPE'
       |  AND o_orderdate >= TIMESTAMP '1997-01-01'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY n_name
       |ORDER BY n_name NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    val dims = broadcast(
      Tables.region(s, d).filter(col("r_name") === "EUROPE")
        .join(Tables.nation(s, d), col("n_regionkey") === col("r_regionkey")))
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    Tables.supplier(s, d)
      .join(dims, col("s_nationkey") === col("n_nationkey"))
      .join(Tables.lineitem(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d),
        col("c_custkey") === col("o_custkey")
          && col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        Exact
          .dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_lines"),
      )
      .orderBy(col("n_name"))
  }

  /** TPC-H Q8 shape — MARKET SHARE: within one region's market for one
    * part type, the fraction of yearly revenue supplied by one nation.
    * The interesting operator is the conditional-aggregate RATIO — two
    * exact sums over the same joined rows (numerator gated by the
    * supplier's nation via CASE, denominator total) divided once at the
    * end — which avoids the self-join a naive "share" formulation would
    * take. Both sums go through the house exact-sum, so the final
    * double division is one IEEE op over identical operands on both
    * engines and rounds deterministically.
    */
  val q144MarketShare = Q(
    "q144_market_share",
    s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |  ${Sql.dsum("CASE WHEN n2.n_name = 'NATION_6' " +
           "THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
       |    AS nation_rev,
       |  ${Sql.dsum("l_extendedprice * (1.0 - l_discount)")} AS total_rev,
       |  round(${Sql.dsum("CASE WHEN n2.n_name = 'NATION_6' " +
           "THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
       |    / ${Sql.dsum("l_extendedprice * (1.0 - l_discount)")}, 6)
       |    AS share
       |FROM part
       |JOIN lineitem ON l_partkey = p_partkey
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN nation n2 ON n2.n_nationkey = s_nationkey
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN customer ON c_custkey = o_custkey
       |JOIN nation n1 ON n1.n_nationkey = c_nationkey
       |JOIN region ON r_regionkey = n1.n_regionkey
       |WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
       |GROUP BY year(o_orderdate)
       |ORDER BY o_year NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    val custDims = broadcast(
      Tables.region(s, d).filter(col("r_name") === "AMERICA")
        .join(Tables.nation(s, d).select(
            col("n_nationkey").as("n1_key"), col("n_regionkey")),
          col("n_regionkey") === col("r_regionkey")))
    val suppNation = broadcast(Tables.nation(s, d).select(
      col("n_nationkey").as("n2_key"), col("n_name").as("n2_name")))
    val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val gated = when(col("n2_name") === "NATION_6", vol).otherwise(lit(0.0))
    Tables.part(s, d).filter(col("p_type") === "PROMO")
      .join(Tables.lineitem(s, d), col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .join(suppNation, col("n2_key") === col("s_nationkey"))
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
      .join(custDims, col("n1_key") === col("c_nationkey"))
      .groupBy(expr("CAST(year(o_orderdate) AS BIGINT)").as("o_year"))
      .agg(
        Exact.dsum(gated).as("nation_rev"),
        Exact.dsum(vol).as("total_rev"))
      .select(col("o_year"), col("nation_rev"), col("total_rev"),
        round(col("nation_rev") / col("total_rev"), 6).as("share"))
      .orderBy(col("o_year"))
  }
}
