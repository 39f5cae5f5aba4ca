package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Native Catalyst probe expressions for the two driver-built, broadcast
  * sketches the scale operators use (SURVEY.md §2.10 policy: a custom
  * `Expression` with `doGenCode` only where built-ins can't express the
  * semantics — Spark exposes no public probe function for either sketch).
  *
  * Both sketches are BUILT distributively over the (small) build side via
  * the public `DataFrameStatFunctions` aggregates, serialized once on the
  * driver, and carried into the fact-side scan as a plan constant — the
  * same ship-a-sketch pattern as Spark's internal runtime row-level
  * filtering (`BloomFilterMightContain`), which is not reachable from the
  * public DataFrame API. The probe is a tight branch inside whole-stage
  * codegen: the deserialized sketch rides the codegen reference array
  * (`ctx.addReferenceObj`), so deserialization happens once per task, not
  * per row.
  *
  * Null discipline matches the built-in predicates: NULL input → NULL
  * output (a bloom can answer nothing about NULL; the join/filter that
  * consumes the probe drops it either way).
  */
object SketchOps {
  private[functions] def readBloom(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  private[functions] def readCms(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
}

/** `graft_bloom_might_contain(<plan-constant bloom>, key)` — membership
  * probe of a LONG key against a driver-built [[BloomFilter]]. False
  * positives possible (rate = the build's fpp), false negatives never —
  * callers keep an exact confirming join AFTER the probe; the probe's job
  * is to drop the (1 - selectivity) mass of a 100 TB fact scan BEFORE the
  * shuffle.
  */
case class BloomMightContainLong(bytes: Array[Byte], child: Expression)
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter = SketchOps.readBloom(bytes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain expects a bigint key, got $t")
  }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bloom_might_contain"

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bf.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

/** `graft_cms_estimate(<plan-constant sketch>, key)` — estimated frequency
  * of a STRING key from a driver-built [[CountMinSketch]]. Estimates never
  * undercount; overcount is bounded by eps·N with the build's confidence.
  * The probe string goes through `estimateCount(String)`, the same hash
  * path `DataFrameStatFunctions.countMinSketch` used to add it.
  */
case class CmsEstimateString(bytes: Array[Byte], child: Expression)
    extends UnaryExpression {

  @transient private lazy val cms: CountMinSketch = SketchOps.readCms(bytes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_cms_estimate expects a string key, got $t")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_cms_estimate"

  override protected def nullSafeEval(v: Any): Any =
    cms.estimateCount(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCms", cms,
      classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $ref.estimateCount($c.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimateString =
    copy(child = newChild)
}
