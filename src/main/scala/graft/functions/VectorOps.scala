package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expressions for the vector hot path (SURVEY.md §2.10
  * policy: built-ins first; a custom `Expression` with `doGenCode` only
  * where the built-ins measurably can't keep up).
  *
  * Why these exist: the similarity operators' inner loop is a dot product
  * over ARRAY<DOUBLE>. The built-in formulation
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` allocates an intermediate
  * array per pair and evaluates the fold through interpreted lambda calls —
  * measured on this repo's bench, a fused fold variant of the same shape ran
  * 10× slower than flat passes, and the pairwise path (125M pairs at sf0.1)
  * is the single hottest loop in the engine. These expressions generate a
  * tight scalar Java loop inside whole-stage codegen: no allocation, no
  * virtual calls.
  *
  * SEMANTICS ARE PINNED to the built-in formulation they replace: ascending
  * index order, `acc + a(i)*b(i)` left fold from 0.0 — bit-identical to
  * `aggregate(zip_with(...))` and to the DuckDB oracle's
  * `list_reduce(list_prepend(0.0, list_transform(...)))`, so swapping them
  * in changes nothing in any hash compare. The null cases are pinned too:
  * a null array, arrays of UNEQUAL length (zip_with pads the short side
  * with null), or any null element all yield NULL — a corrupt/short vector
  * diverges loudly, exactly like the built-ins, instead of silently
  * contributing a prefix dot product.
  */
object VectorOps {

  /** Shared scalar fold: Σ a(i)·b(i), or null on length mismatch / null
    * element (boxed so the null can flow through eval).
    */
  private[functions] def dotOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

/** `graft_dot(a, b)` — fused dot product over two ARRAY<DOUBLE> columns. */
case class DotF64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_dot expects (array<double>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on length mismatch / null elem
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF64 =
    copy(left = newLeft, right = newRight)
}

/** `graft_l2sq_i64(a, b)` — fused exact squared L2 distance over two
  * ARRAY<BIGINT> (fixed-point) columns: Σ (a(i)−b(i))². Same semantics
  * pinning as [[DotF64]]: ascending-index left fold, NULL on null array /
  * unequal length / null element — bit-identical to the
  * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0L, _+_)` formulation
  * it replaces in the PQ hot path (q103/q104 evaluate it rows×subs×codes
  * times; the interpreted HOF fold was the measured cost center there,
  * same lesson as the double dot product above). All math stays in long:
  * the PQ fixed-point components are ≤ 2·10⁶ in magnitude, so a squared
  * difference is ≤ 1.6·10¹³ and a [[PqSubs]]-term sum is far below 2⁶³.
  */
case class SqL2I64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_l2sq_i64 expects (array<bigint>, array<bigint>), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // null on length mismatch / null elem
  override def prettyName: String = "graft_l2sq_i64"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqL2I64 =
    copy(left = newLeft, right = newRight)
}

/** `graft_norm(a)` — fused L2 norm: sqrt(Σ a(i)²), same fold discipline
  * (null elements → NULL).
  */
case class NormF64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_norm expects array<double>, got $t")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on null element
  override def prettyName: String = "graft_norm"

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val d = VectorOps.dotOrNull(arr, arr)
    if (d == null) null else math.sqrt(d.doubleValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final double $x = $a.getDouble($i);
         |  $acc += $x * $x;
         |}
         |if (!${ev.isNull}) ${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NormF64 =
    copy(child = newChild)
}

/** `graft_sorted_intersect_i64(a, b)` — intersection SIZE of two
  * ascending-sorted ARRAY<BIGINT> columns via a two-pointer merge walk:
  * O(|a|+|b|) primitive comparisons, zero allocation. Replaces
  * `size(array_intersect(a, b))` on the similarity-join verification hot
  * path (q132 scores 3.3M candidate pairs at sf0.1; the built-in builds a
  * boxed hash set PER ROW — the walk measured 12.1 s → 4.9 s end-to-end
  * there). CONTRACT: both inputs ascending; caller sorts once upstream
  * (`sort_array`), which amortizes over every pair the row joins into.
  * On arrays with duplicates the walk counts matched POSITIONS (multiset
  * semantics); q132 feeds distinct-element arrays so set == multiset.
  * NULL on null array / null element, the house fold discipline.
  */
case class SortedIntersectI64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_sorted_intersect_i64 expects (array<bigint>, array<bigint>), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // null on null elem
  override def prettyName: String = "graft_sorted_intersect_i64"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (n, m) = (x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    var j = 0
    while (i < n && j < m) {
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val (xv, yv) = (x.getLong(i), y.getLong(j))
      if (xv == yv) { acc += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |long $acc = 0L;
         |int $i = 0; int $j = 0;
         |while ($i < $n && $j < $m) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $acc++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |if (!${ev.isNull}) ${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectI64 =
    copy(left = newLeft, right = newRight)
}
