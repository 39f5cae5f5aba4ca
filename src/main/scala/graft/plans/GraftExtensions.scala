package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.BinaryType

import graft.functions.{BloomMightContainLong, BucketI64, CmsEstimateString, DotF64, NormF64, SortedIntersectI64, SqL2I64}

/** Engine extension point (`spark.sql.extensions=graft.plans.GraftExtensions`):
  * registers the native vector expressions so they are first-class SQL
  * functions — usable from `call_function`, `expr("graft_dot(...)")`, and
  * plain `spark.sql`. All graft session builders ([[graft.Engine]],
  * [[graft.Verify]], [[graft.Bench]]) install this; a user embedding the
  * library sets the config on their own builder.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotF64].getName, "graft_dot"),
      (children: Seq[Expression]) => DotF64(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_norm"),
      new ExpressionInfo(classOf[NormF64].getName, "graft_norm"),
      (children: Seq[Expression]) => NormF64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_l2sq_i64"),
      new ExpressionInfo(classOf[SqL2I64].getName, "graft_l2sq_i64"),
      (children: Seq[Expression]) => SqL2I64(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_intersect_i64"),
      new ExpressionInfo(classOf[SortedIntersectI64].getName,
        "graft_sorted_intersect_i64"),
      (children: Seq[Expression]) =>
        SortedIntersectI64(children(0), children(1))))
    // sketch probes take the serialized sketch as a BINARY LITERAL first
    // argument (a plan constant, like Spark's own BloomFilterMightContain):
    // the sketch is deserialized once per task via the codegen reference
    // array, never per row
    ext.injectFunction((
      FunctionIdentifier("graft_bucket"),
      new ExpressionInfo(classOf[BucketI64].getName, "graft_bucket"),
      (children: Seq[Expression]) =>
        BucketI64(children(0), children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContainLong].getName,
        "graft_bloom_might_contain"),
      (children: Seq[Expression]) => children match {
        case Seq(Literal(b: Array[Byte], BinaryType), key) =>
          BloomMightContainLong(b, key)
        case _ => throw new IllegalArgumentException(
          "graft_bloom_might_contain(<binary literal sketch>, <bigint key>)")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimateString].getName,
        "graft_cms_estimate"),
      (children: Seq[Expression]) => children match {
        case Seq(Literal(b: Array[Byte], BinaryType), key) =>
          CmsEstimateString(b, key)
        case _ => throw new IllegalArgumentException(
          "graft_cms_estimate(<binary literal sketch>, <string key>)")
      }))
  }
}
