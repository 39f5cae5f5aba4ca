package graft

import org.apache.spark.sql.functions._

/** Ad-hoc debugging entry point (not part of the driver contract).
  * `runMain graft.Tool envprobe` drives the env-driven export job
  * ([[graft.vera.Export.runFromEnv]]) against a synthetic VerA-shaped
  * `contracts` table.
  */
object Tool {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(8, "graft-tool")
    args.headOption match {
      case Some("smoke") =>
        // Driver-shaped smoke: flagship query on sf0.001 must return rows.
        val n = SparkEntry.entry(spark).count()
        println(s"SMOKE rows=$n queries=${SparkEntry.queries.size} " +
          s"oracles=${SparkEntry.oracleSql.size}")
        require(n > 0, "flagship query returned no rows")
      case Some("sql") =>
        // Ad-hoc SQL against the session (extensions loaded): Tool sql "<q>"
        spark.sql(args(1)).show(20, truncate = false)
      case Some("timesql") =>
        // Hot-loop timing: `Tool timesql "<sql>"` — noop-writes the query
        // 3× and prints each wall time (first run includes codegen warmup).
        for (i <- 1 to 3) {
          val t0 = System.nanoTime()
          spark.sql(args(1)).write.format("noop").mode("overwrite").save()
          println(f"RUN$i=${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      case Some("explain") =>
        // Plan audit: `runMain graft.Tool explain <query> [sfDir]`
        val name = args(1)
        val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
        SparkEntry.queries(name)(spark, dir).explain("formatted")
      case Some("verify1") =>
        // Targeted correctness dump, comma-separated names:
        // `runMain graft.Tool verify1 <q1[,q2,...]> [sfDir] [outDir]`
        // then `python3 tools/check.py <sfDir> <outDir>`.
        val names = args(1).split(",").toSeq
        val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
        val out = if (args.length > 3) args(3) else "/tmp/verify_one"
        new java.io.File(out).mkdirs()
        val oracles = names.flatMap { name =>
          SparkEntry.queries(name)(spark, dir).coalesce(1).write
            .mode("overwrite").parquet(s"$out/$name")
          val o = SparkEntry.oracleSql.get(name)
          if (o.isEmpty)
            println(s"[verify1] $name has no oracle (rows-only check); dump written")
          o.map { sql =>
            val esc = sql.replace("\\", "\\\\").replace("\"", "\\\"")
              .replace("\n", "\\n").replace("\t", "\\t")
            s""""$name": "$esc""""
          }
        }
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$out/oracle_sql.json"),
          oracles.mkString("{", ", ", "}"))
      case Some("rollbench") =>
        // q119/q124 frame-width crossover measurement (the numbers in
        // Analytic.scala's q124 comment; keep runnable so future rewrites
        // re-measure): `runMain graft.Tool rollbench [sfDir]`
        val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
        val ev = Tables.events(spark, dir).localCheckpoint()
        import graft.queries.Analytic
        for ((label, f) <- Seq[(String, () => org.apache.spark.sql.DataFrame)](
          "q119 exact 1h" -> (() => Analytic.rollingP95Exact(ev, 1)),
          "q124 sketch 1h (12 buckets)" ->
            (() => Analytic.rollingP95Sketch(ev, 12)),
          "q119 exact 6h" -> (() => Analytic.rollingP95Exact(ev, 6)),
          "q124 sketch 6h (72 buckets)" ->
            (() => Analytic.rollingP95Sketch(ev, 72)))) {
          for (i <- 1 to 2) {
            val t0 = System.nanoTime()
            f().write.format("noop").mode("overwrite").save()
            println(f"$label run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
          }
        }
      case Some("dedupbench") =>
        // dev-loop micro-bench for the q32 collapse pipeline (the tool
        // behind the measured pin/unpin numbers in Dedup.scala's comments;
        // keep it runnable so future rewrites re-measure the same shapes)
        val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
        val docs = Tables.documentsWide(spark, dir)
          .select(col("doc_id"), col("text"))
        def time(label: String)(f: => Unit): Unit = {
          for (i <- 1 to 2) {
            val t0 = System.nanoTime()
            f
            println(f"$label run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
          }
        }
        import graft.queries.Dedup
        time("raw (pre-collapse shape)") {
          val dsh = Dedup.shingleRows(docs)
          Dedup.verifyJaccard(
            Dedup.candidatePairs(Dedup.minhashBands(dsh)), dsh)
            .write.format("noop").mode("overwrite").save()
        }
        time("collapse only") {
          val (r, m) = Dedup.collapseByText(docs)
          r.write.format("noop").mode("overwrite").save()
          m.write.format("noop").mode("overwrite").save()
        }
        time("collapsed full") {
          Dedup.nearDups(docs).write.format("noop").mode("overwrite").save()
        }
      case Some("envprobe") =>
        import graft.vera._
        val df = spark.range(0, 5000).selectExpr(
          "cast(id as string) AS id",
          "sha2(cast(id as string), 256) AS creation_code_hash",
          "sha2(cast(id + 1 as string), 256) AS runtime_code_hash",
          "timestamp_micros(1700000000000000 + id * 1000000) AS created_at",
          "timestamp_micros(1700000000000000 + id * 2000000) AS updated_at",
          "'alice' AS created_by", "'bob' AS updated_by")
        val m = Export.runFromEnv(
          source = _ => df,
          orderBy = _ => Seq("id"),
          outDir = "/tmp/graft_probe_env",
          env = Map("DEBUG_TABLE" -> "contracts", "DEBUG" -> "1",
            "DEBUG_OFFSET" -> "100"))
        println("MANIFEST=" + m.files)
        val back = spark.read.parquet("/tmp/graft_probe_env/contracts_*.parquet")
        println("ROWS=" + back.count() + " SCHEMA=" +
          back.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(","))
        println("MIN_ID=" + back.agg(min(col("id").cast("long"))).head.getLong(0))
      case _ =>
        val d = "/root/testdata/sf0.01"
        val prod = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        Tables
          .lineitem(spark, d)
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            format_string("%.17e", prod).as("p17"),
            prod.cast("decimal(18,4)").cast("string").as("dec"),
          )
          .orderBy(col("l_orderkey"), col("l_linenumber"))
          .coalesce(1)
          .write
          .mode("overwrite")
          .parquet("/tmp/dbg_prod")
    }
    spark.stop()
  }
}
