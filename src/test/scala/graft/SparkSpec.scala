package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base for all suites: one local session (getOrCreate —
  * every suite in the forked test JVM reuses it), UTC, shuffle partitions
  * pinned to cores.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session(4, "graft-test")
  val sf: String = "/root/testdata/sf0.001"
}
