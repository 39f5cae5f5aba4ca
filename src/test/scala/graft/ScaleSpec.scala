package graft

import org.apache.spark.sql.functions._

/** Executable evidence for the two physical-layout levers that carry a
  * repeated-join / time-filtered workload at 100 TB, beyond what any
  * single-query plan can show:
  *
  *  - BUCKETING: both join sides pre-bucketed on the join key join with NO
  *    shuffle exchange at all — on a cluster this converts every future
  *    join on that key from a full network shuffle into a local merge.
  *  - PARTITION PRUNING: a date-partitioned layout turns a time-range
  *    filter into directory pruning — the scan never opens the other
  *    partitions' files.
  *
  * Both asserted on the executed plan, not just on results.
  */
class ScaleSpec extends SparkSpec {

  test("bucketed tables join without any shuffle exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a non-broadcast join so the demo proves bucketing (a broadcast
    // would also be shuffle-free, but only because one side is tiny)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      Tables.orders(spark, sf).write
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("b_orders")
      Tables.customer(spark, sf).write
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("b_customer")

      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"))
      joined.write.format("noop").mode("overwrite").save()

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"), s"expected NO exchange in:\n$plan")

      // same rows as the plain shuffled join
      val expected = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf),
          col("o_custkey") === col("c_custkey"))
        .count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("date-partitioned layout prunes non-matching partitions at scan") {
    val dir = "/tmp/graft_part_events"
    val events = Tables.events(spark, sf)
      .withColumn("day", to_date(col("ts")))
    events.write.partitionBy("day").mode("overwrite").parquet(dir)

    val oneDay = events.select(min(col("day"))).head.getDate(0)
    val pruned = spark.read.parquet(dir).filter(col("day") === lit(oneDay))
    // collect() executes pruned's own QueryExecution — count() or a write
    // would spawn a fresh one whose metrics this plan instance never sees
    val nPruned = pruned.collect().length.toLong

    val scan = pruned.queryExecution.executedPlan.collectLeaves().head
    val scanStr = scan.toString
    assert(scanStr.contains("PartitionFilters"), scanStr)
    // the pruned scan reads exactly the one matching partition
    val partitionCount = events.select(col("day")).distinct().count()
    assert(partitionCount > 1, "fixture must span multiple days")
    val selected = scan.metrics.get("numPartitions").map(_.value)
    assert(selected.contains(1L),
      s"expected 1 selected partition of $partitionCount, got $selected")
    assert(nPruned ===
      events.filter(col("day") === lit(oneDay)).count())
  }

  test("single-pass operators scan their source exactly once") {
    // these queries are documented as one-scan plans (window/aggregate
    // stages sharing a partitioning); a second Scan leaf means someone
    // reintroduced a recompute-the-subtree shape (q69 once scanned and
    // re-tokenized the whole corpus twice for its 1-row totals side)
    for (name <- Seq("q67_seq_packing", "q69_domain_mixture",
      "q71_scd2_compact", "q72_int8_quant")) {
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      val scans = "Scan parquet".r.findAllIn(plan).length
      assert(scans === 1, s"$name plans $scans scans:\n$plan")
    }
  }

  test("candidate generators never plan a cartesian or nested-loop join") {
    // the near-dup / ANN pair sources must stay banded EQUI-joins at any
    // scale — a cartesian/BNLJ here is the difference between O(n) and
    // O(n²) at 100 TB. q36's centroid assignment crossJoins a BROADCAST
    // 10-row centroid table by design (bounded side), so broadcast NLJ is
    // asserted absent only for the corpus-sized pair generators.
    for (name <- Seq("q32_minhash_neardup", "q51_ngram_jaccard", "q64_ann_srp",
      "q66_decontaminate")) {
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name planned a cartesian product:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name planned a nested-loop join:\n$plan")
    }
  }
}
