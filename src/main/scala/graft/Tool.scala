package graft

import org.apache.spark.sql.functions._

/** Ad-hoc debugging entry point (not part of the driver contract). */
object Tool {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(8, "graft-tool")
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
    spark.stop()
  }
}
