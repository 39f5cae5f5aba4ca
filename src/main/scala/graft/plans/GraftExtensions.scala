package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotF64, NormF64}

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
  }
}
