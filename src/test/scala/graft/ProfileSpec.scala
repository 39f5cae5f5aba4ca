package graft

import graft.operators.Profile
import graft.queries.Gaps
import org.apache.spark.sql.functions._

/** The q79/q81 profile operator: exactness of the oracle-checked part is
  * the driver's job; THIS suite pins the two claims the oracle can't —
  * the plan shape (no Expand, one aggregate) and the sketch-NDV accuracy —
  * plus the profile-consumer loop (stats pick the broadcast side).
  */
class ProfileSpec extends SparkSpec {

  test("profile plans ONE aggregate pass with no Expand") {
    val p = Profile.profile(Tables.lineitem(spark, sf), Gaps.profileCols)
    p.write.format("noop").mode("overwrite").save()
    val plan = p.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"profile must not Expand:\n$plan")
    // one scan of lineitem, not one per column
    val scans = plan.linesIterator.count(_.contains("lineitem.parquet"))
    assert(scans <= 2, s"expected a single lineitem scan, plan:\n$plan")
  }

  test("sketch NDV tracks exact NDV within 10% on every profiled column") {
    val li = Tables.lineitem(spark, sf)
    val p = Profile.profile(li, Gaps.profileCols)
      .select(col("column_name"), col("n_distinct_approx"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    Gaps.profileCols.foreach { c =>
      val exact = li.select(countDistinct(col(c))).head.getLong(0)
      val approx = p(c)
      val err = math.abs(approx - exact).toDouble / exact
      assert(err <= 0.10, s"$c: approx $approx vs exact $exact (err $err)")
    }
  }

  test("hostile column names (dots, spaces, quotes, backticks) profile cleanly") {
    // the Column-API long format + backtick-quoted references: none of
    // these names may be parsed as a field path or SQL text
    val names = Seq("a.b", "with space", """has"quote""", "tick`tock")
    val df = spark.range(7).select(
      names.map(n => (col("id") * 2).as(n)): _*)
    val p = Profile.profile(df, names).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getString(4))).toMap
    assert(p.keySet === names.toSet)
    names.foreach { n =>
      assert(p(n)._1 === 0L, s"$n nulls")
      assert(p(n)._2 === "12", s"$n max")
    }
  }

  test("fed catalog stats flip the static join strategy under CBO") {
    // the ANALYZE-equivalent loop closed: profile → catalog column stats →
    // FilterEstimation shrinks the selective dim branch below the
    // broadcast threshold → the COST-BASED planner (no hint anywhere)
    // flips SortMergeJoin into BroadcastHashJoin. Assertions read the
    // STATIC plan (queryExecution.sparkPlan): AQE would eventually rescue
    // the no-stats case at runtime; CBO gets it right at plan time.
    val dir = java.nio.file.Files.createTempDirectory("graft_cbo").toString
    spark.range(10000)
      .select(col("id"), concat(lit("padding-padding-"), col("id")).as("pad"))
      .write.parquet(s"$dir/dim")
    spark.range(100000)
      .select((col("id") % 10000).as("fk"), col("id").as("v"))
      .write.parquet(s"$dir/fact")
    spark.sql("DROP TABLE IF EXISTS cbo_dim")
    spark.sql("DROP TABLE IF EXISTS cbo_fact")
    spark.sql(s"CREATE TABLE cbo_dim (id BIGINT, pad STRING) USING parquet LOCATION '$dir/dim'")
    spark.sql(s"CREATE TABLE cbo_fact (fk BIGINT, v BIGINT) USING parquet LOCATION '$dir/fact'")
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
    try {
      def q = spark.table("cbo_fact")
        .join(spark.table("cbo_dim").filter(col("id") <= 5),
          col("fk") === col("id"))
      // without stats the dim relation is its file size (≫ 1KB) and the
      // filter can't be estimated — static plan stays a SortMergeJoin
      val before = q.queryExecution.sparkPlan.toString
      assert(!before.contains("BroadcastHashJoin"), before)

      Profile.feedCatalogStats(spark, "cbo_dim",
        Profile.profile(spark.table("cbo_dim"), Seq("id", "pad")),
        sizeInBytes = 400000L)
      // with rowCount + (min, max, ndv) on id, `id <= 5` estimates ~6 of
      // 10000 rows → far under 1KB → cost-based BroadcastHashJoin
      val after = q.queryExecution.sparkPlan.toString
      assert(after.contains("BroadcastHashJoin"), after)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS cbo_dim")
      spark.sql("DROP TABLE IF EXISTS cbo_fact")
    }
  }

  test("profile row counts drive the broadcast side (BuildLeft = smaller)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // disable Catalyst's own size-based broadcast so only the profile
    // decision can produce a broadcast join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val cust = Tables.customer(spark, sf)
      val ord = Tables.orders(spark, sf)
      val joined = Profile.joinWithProfiledBroadcast(
        cust, Profile.profile(cust, Seq("c_custkey")),
        ord, Profile.profile(ord, Seq("o_custkey")),
        col("o_custkey") === col("c_custkey"))
      joined.write.format("noop").mode("overwrite").save()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan)
      // customer (1.5k rows) is the left arg and the profiled-smaller side
      assert(plan.contains("BuildLeft"), s"expected BuildLeft (customer):\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
