package graft.queries

import graft.{Q, Tables}
import graft.functions.Exact.Sql
import org.apache.spark.sql.functions._

/** Scalar-function library coverage: string, date/time, math, JSON, array
  * higher-order functions, and generators (explode). All built-in Spark
  * `functions._` — everything stays inside whole-stage codegen; no UDFs.
  *
  * Oracle-parity notes: libm-backed functions (ln/exp) are cast to float32
  * (both engines are within 1 ulp of true in double, which float rounding
  * almost always absorbs); floor/ceil are BIGINT-cast on the DuckDB side
  * (DuckDB returns DOUBLE, Spark LONG — numerically equal but the driver's
  * hash is type-sensitive); everything else is exact (integer arithmetic,
  * IEEE-identical expression trees, or identical string-op semantics).
  */
object Functions {

  def all: Seq[Q] = Seq(
    q20StringFuncs,
    q21DateFuncs,
    q22MathFuncs,
    q23JsonFuncs,
    q24ArrayFuncs,
    q27ExplodeWordcount,
  )

  val q20StringFuncs = Q(
    "q20_string_funcs",
    """SELECT p_partkey,
      |  lower(p_type) AS type_lc,
      |  upper(p_name) AS name_uc,
      |  length(p_name) AS name_len,
      |  substring(p_name, 1, 4) AS name_pfx,
      |  len(string_split(p_name, ' ')) AS n_words,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_no,
      |  levenshtein(p_name, 'large widget') AS lev_widget,
      |  instr(p_name, 'widget') AS widget_pos,
      |  replace(p_name, ' ', '_') AS name_snake,
      |  trim(lpad(p_brand, 12, '.')) AS brand_pad
      |FROM part
      |ORDER BY p_partkey NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    Tables
      .part(s, d)
      .select(
        col("p_partkey"),
        lower(col("p_type")).as("type_lc"),
        upper(col("p_name")).as("name_uc"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 4).as("name_pfx"),
        size(split(col("p_name"), " ")).as("n_words"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_no"),
        levenshtein(col("p_name"), lit("large widget")).as("lev_widget"),
        instr(col("p_name"), "widget").as("widget_pos"),
        regexp_replace(col("p_name"), " ", "_").as("name_snake"),
        trim(lpad(col("p_brand"), 12, ".")).as("brand_pad"),
      )
      .orderBy(col("p_partkey"))
  }

  val q21DateFuncs = Q(
    "q21_date_funcs",
    s"""SELECT year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
       |  month(o_orderdate) AS mth,
       |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       |  CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
       |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
       |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
       |  COUNT(*) AS n, ${Sql.dsum("o_totalprice", 2)} AS sum_price
       |FROM orders
       |GROUP BY ALL
       |ORDER BY yr NULLS FIRST, qtr NULLS FIRST, mth NULLS FIRST, month_start NULLS FIRST,
       |  month_end NULLS FIRST, days_since_95 NULLS FIRST, due_date NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    import graft.functions.Exact
    Tables
      .orders(s, d)
      .select(
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"),
        month(col("o_orderdate")).as("mth"),
        to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
        last_day(to_date(col("o_orderdate"))).as("month_end"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
          .as("days_since_95"),
        date_add(to_date(col("o_orderdate")), 30).as("due_date"),
        col("o_totalprice"),
      )
      .groupBy(col("yr"), col("qtr"), col("mth"), col("month_start"),
        col("month_end"), col("days_since_95"), col("due_date"))
      .agg(count(lit(1)).as("n"), Exact.dsum(col("o_totalprice"), 2).as("sum_price"))
      .orderBy(col("yr"), col("qtr"), col("mth"), col("month_start"),
        col("month_end"), col("days_since_95"), col("due_date"))
  }

  val q22MathFuncs = Q(
    "q22_math_funcs",
    """SELECT l_orderkey, l_linenumber,
      |  sqrt(l_quantity) AS qty_sqrt,
      |  abs(l_discount - 0.05) AS disc_dev,
      |  CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_k_floor,
      |  CAST(ceil(l_extendedprice / 1000.0) AS BIGINT) AS price_k_ceil,
      |  round(l_tax * 100.0, 1) AS tax_pct,
      |  l_quantity * l_quantity AS qty_sq,
      |  l_orderkey % 7 AS key_mod,
      |  greatest(l_discount, l_tax) AS max_rate,
      |  least(l_discount, l_tax) AS min_rate,
      |  CAST(sign(l_discount - l_tax) AS INTEGER) AS rate_sign,
      |  CAST(ln(1.0 + l_quantity) AS REAL) AS qty_ln,
      |  CAST(exp(l_discount) AS REAL) AS disc_exp
      |FROM lineitem
      |WHERE l_orderkey < 500
      |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST,
      |  qty_sqrt NULLS FIRST, disc_dev NULLS FIRST,
      |  price_k_floor NULLS FIRST, price_k_ceil NULLS FIRST,
      |  tax_pct NULLS FIRST, qty_sq NULLS FIRST, key_mod NULLS FIRST,
      |  max_rate NULLS FIRST, min_rate NULLS FIRST,
      |  rate_sign NULLS FIRST, qty_ln NULLS FIRST, disc_exp NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    Tables
      .lineitem(s, d)
      .filter(col("l_orderkey") < 500)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        abs(col("l_discount") - 0.05).as("disc_dev"),
        floor(col("l_extendedprice") / 1000.0).as("price_k_floor"),
        ceil(col("l_extendedprice") / 1000.0).as("price_k_ceil"),
        round(col("l_tax") * 100.0, 1).as("tax_pct"),
        (col("l_quantity") * col("l_quantity")).as("qty_sq"),
        (col("l_orderkey") % 7).as("key_mod"),
        greatest(col("l_discount"), col("l_tax")).as("max_rate"),
        least(col("l_discount"), col("l_tax")).as("min_rate"),
        // sign: cast to int on both sides (engine return types differ, and
        // int kills any -0.0 representation risk in the hash compare).
        signum(col("l_discount") - col("l_tax")).cast("int").as("rate_sign"),
        // ln/exp are libm-backed and NOT correctly rounded — JVM Math.log
        // and DuckDB's libm can differ by 1 ulp. Casting the double to
        // float32 almost always absorbs a 1-ulp double wobble (float
        // rounding boundaries are ~1e8 double-ulps apart), though a value
        // sitting within 1 double-ulp of a float boundary could still split.
        log(lit(1.0) + col("l_quantity")).cast("float").as("qty_ln"),
        exp(col("l_discount")).cast("float").as("disc_exp"),
      )
      // ALL output columns in the sort (r17, the q02 finding: duplicate
      // (l_orderkey, l_linenumber) pairs make a two-column sort
      // non-total — ties left in physical file order diverge the moment
      // the files are rewritten; every column sorted = remaining ties
      // are identical rows)
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("qty_sqrt"),
        col("disc_dev"), col("price_k_floor"), col("price_k_ceil"),
        col("tax_pct"), col("qty_sq"), col("key_mod"), col("max_rate"),
        col("min_rate"), col("rate_sign"), col("qty_ln"), col("disc_exp"))
  }

  /** JSON extraction from `events.props` + exact integer aggregation. */
  val q23JsonFuncs = Q(
    "q23_json_funcs",
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
      |  COUNT(*) AS n
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    val k = get_json_object(col("props"), "$.k").cast("long")
    Tables
      .events(s, d)
      .groupBy(col("event_type"))
      .agg(
        sum(k).as("sum_k"),
        min(k).as("min_k"),
        max(k).as("max_k"),
        count(lit(1)).as("n"),
      )
      .orderBy(col("event_type"))
  }

  /** Array higher-order functions over `embeddings.embedding`: size,
    * element access, max, and an L2 norm via an explicit left fold (the
    * fold order is pinned so both engines add in the same sequence).
    */
  val q24ArrayFuncs = Q(
    "q24_array_funcs",
    """SELECT vec_id, label,
      |  len(embedding) AS dim,
      |  CAST(embedding[1] AS DOUBLE) AS e1,
      |  CAST(list_max(embedding) AS DOUBLE) AS e_max,
      |  round(sqrt(list_reduce(list_prepend(0.0,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |    (acc, x) -> acc + x)), 6) AS l2_norm,
      |  len(list_filter(embedding, x -> x > 0)) AS n_positive
      |FROM embeddings
      |ORDER BY vec_id NULLS FIRST""".stripMargin,
  ) { (s, d) =>
    Tables
      .embeddings(s, d)
      .select(
        col("vec_id"),
        col("label"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).cast("double").as("e1"),
        array_max(col("embedding")).cast("double").as("e_max"),
        round(
          sqrt(aggregate(
            transform(col("embedding"),
              x => x.cast("double") * x.cast("double")),
            lit(0.0),
            (acc, x) => acc + x)),
          6).as("l2_norm"),
        size(filter(col("embedding"), _ > 0)).as("n_positive"),
      )
      .orderBy(col("vec_id"))
  }

  /** Generator (explode) + aggregation: corpus word frequencies. */
  val q27ExplodeWordcount = Q(
    "q27_explode_wordcount",
    """SELECT word, COUNT(*) AS n FROM (
      |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |WHERE word <> ''
      |GROUP BY word
      |ORDER BY n DESC, word NULLS FIRST
      |LIMIT 20""".stripMargin,
  ) { (s, d) =>
    Tables
      .documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)
  }
}
