package graft

import org.apache.spark.sql.SparkSession

/** Session factory for tests / local tools.
  *
  * The driver's entry points ([[Verify]], [[Bench]]) build their own session
  * from `SPARK_GRAFT_CPUS`; this one is for ScalaTest suites and ad-hoc
  * tooling. Shuffle partitions are pinned to the core count — at 100 TB on a
  * real cluster this would instead be sized to ~2-3x total executor cores
  * with AQE coalescing partitions at runtime (enabled here too).
  */
object Engine {
  def session(cores: Int = 8, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
