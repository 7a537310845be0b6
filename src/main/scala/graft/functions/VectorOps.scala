package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding hot path: dot product
  * and squared L2 distance over `array<double>` columns.
  *
  * Why custom Expressions (SURVEY.md §4 preference order (b)): the
  * higher-order-function forms — `aggregate(zip_with(a, b, (x,y) =>
  * x*y), 0.0, (acc,v) => acc+v)` — build an intermediate 64-element
  * array per row pair and evaluate two interpreted lambdas per element;
  * worse, `ArrayAggregate`/`ZipWith` are CodegenFallback, so every
  * expression tree containing them drops out of whole-stage codegen.
  * These expressions are one tight fused loop (no intermediate array,
  * no closures) that participates in codegen via a static call, keeping
  * the surrounding filter/project pipeline compiled.
  *
  * Numeric contract (the oracle-parity invariant): the accumulation is
  * the SAME strict left fold as the HOF form — `acc = acc + a(i)*b(i)`
  * in index order, double arithmetic throughout (inputs are the
  * `array<double>`-cast embeddings, [[graft.operators.Similarity]]) —
  * so results are bit-identical to both the HOF form and the DuckDB
  * `list_reduce(list_prepend(0.0, ...))` mirror. No FMA, no pairwise
  * re-association, no Kahan: those would be faster/more accurate and
  * WRONG (hash-unstable across engines).
  *
  * Null contract, matching the HOF composition it replaces: NULL input
  * array → NULL (BinaryExpression's default); length mismatch → NULL
  * (zip_with pads the shorter side with nulls, poisoning the fold);
  * NULL element → NULL (null propagates through `*` and `+`).
  */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two array<double> columns, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }
}

/** `vector_dot(a, b)` — strict-left-fold dot product. */
case class DotF64(left: Expression, right: Expression) extends VectorFold {
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot64(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.VectorOps.dot64($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF64 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_dot"
}

/** `vector_sqdist(a, b)` — strict-left-fold squared L2 distance. */
case class SqDistF64(left: Expression, right: Expression) extends VectorFold {
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.sqDist64(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.VectorOps.sqDist64($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistF64 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_sqdist"
}

object VectorOps {

  /** Boxed so the null contract survives the static call: null result
    * encodes "length mismatch or null element" for both entry points.
    */
  def dot64(a: ArrayData, b: ArrayData): java.lang.Double = {
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

  def sqDist64(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Column-API entry points (Spark 4 Column↔Expression bridge). */
  def vector_dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      DotF64(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  def vector_sqdist(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      SqDistF64(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }
}
