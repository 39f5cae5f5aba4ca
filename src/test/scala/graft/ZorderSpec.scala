package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Measured data-skipping proof for [[Layout.zorderBy]]: write the same
  * table linear-sorted and z-ordered, read back each FILE's min/max box
  * (with one row group per small file, file boxes ARE the row-group
  * stats a parquet reader prunes on), and count which files a predicate
  * could skip. The claim under test: a y-only band prunes nothing on an
  * x-sorted layout and prunes most files on the z-ordered one, while
  * query RESULTS are identical on both layouts.
  */
class ZorderSpec extends SparkSpec {

  private val nFiles = 32

  private def fileBoxes(dir: String): Array[(Double, Double, Double, Double)] =
    spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(min(col("l_extendedprice")), max(col("l_extendedprice")),
        min(col("l_quantity")), max(col("l_quantity")))
      .collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))

  test("z-order layout lets a y-band prune files; linear layout cannot") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_extendedprice"), col("l_quantity"))
    val base = "/tmp/graft_zorder"
    li.repartitionByRange(nFiles, col("l_extendedprice"))
      .sortWithinPartitions(col("l_extendedprice"))
      .write.mode("overwrite").parquet(s"$base/linear")
    Layout.zorderBy(li, "l_extendedprice", "l_quantity", nFiles)
      .write.mode("overwrite").parquet(s"$base/zorder")

    val st = li.agg(min(col("l_quantity")), max(col("l_quantity"))).head
    val (ymin, ymax) = (st.getDouble(0), st.getDouble(1))
    val mid = (ymin + ymax) / 2
    val half = (ymax - ymin) * 0.05
    val (lo, hi) = (mid - half, mid + half)

    def intersecting(dir: String): Int =
      fileBoxes(dir).count { case (_, _, fyMin, fyMax) =>
        fyMax >= lo && fyMin <= hi
      }
    val linear = intersecting(s"$base/linear")
    val zorder = intersecting(s"$base/zorder")
    val linFiles = fileBoxes(s"$base/linear").length
    val zFiles = fileBoxes(s"$base/zorder").length
    assert(linFiles === nFiles && zFiles === nFiles)
    // x-sorted files each span ~the full quantity range → nothing skips
    assert(linear >= (nFiles * 0.9).toInt,
      s"linear layout unexpectedly pruned a y-band: $linear of $linFiles")
    // z-ordered files cover ~square 2-D regions → most miss the band
    assert(zorder <= (nFiles * 0.6).toInt,
      s"z-order failed to prune a y-band: $zorder of $zFiles intersect")

    // layout must never change results: same band query on both layouts
    def run(dir: String): (Long, java.math.BigDecimal) = {
      val r = spark.read.parquet(dir)
        .filter(col("l_quantity").between(lo, hi))
        .agg(count(lit(1)),
          sum(col("l_extendedprice").cast("decimal(18,4)"))).head
      (r.getLong(0), r.getDecimal(1))
    }
    assert(run(s"$base/linear") === run(s"$base/zorder"))
  }

  test("a 2-D box prunes on the z-ordered layout too") {
    // the box case: selective on BOTH dims. The x-sorted layout already
    // prunes via x; z-order must also prune substantially (its guarantee
    // is good-for-every-dimension, not best-for-one)
    val base = "/tmp/graft_zorder"
    val li: DataFrame = Tables.lineitem(spark, sf)
      .select(col("l_extendedprice"), col("l_quantity"))
    val st = li.agg(
      min(col("l_extendedprice")), max(col("l_extendedprice")),
      min(col("l_quantity")), max(col("l_quantity"))).head
    def band(mn: Double, mx: Double): (Double, Double) = {
      val mid = (mn + mx) / 2; val half = (mx - mn) * 0.1
      (mid - half, mid + half)
    }
    val (xlo, xhi) = band(st.getDouble(0), st.getDouble(1))
    val (ylo, yhi) = band(st.getDouble(2), st.getDouble(3))
    val boxes = fileBoxes(s"$base/zorder")
    val hit = boxes.count { case (fxMin, fxMax, fyMin, fyMax) =>
      fxMax >= xlo && fxMin <= xhi && fyMax >= ylo && fyMin <= yhi
    }
    assert(hit <= (boxes.length * 0.5).toInt,
      s"2-D box failed to prune z-ordered files: $hit of ${boxes.length}")
  }
}
