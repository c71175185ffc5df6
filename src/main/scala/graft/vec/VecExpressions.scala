package graft.vec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dense-vector kernels as native codegen expressions. Spark's
  * higher-order functions (`zip_with`/`aggregate`) are CodegenFallback:
  * every pair scored through them pays interpreted lambda dispatch and
  * per-element boxing — measured 65 s for the 4M-pair exact kNN graph
  * at sf0.1. One tight while-loop per row brings the same arithmetic
  * inside whole-stage codegen.
  *
  * Bit-exactness contract (load-bearing for the DuckDB oracle gates):
  * the kernel folds in INDEX ORDER with independent accumulators and
  * divides as `dot / (sqrt(na) * sqrt(nb))` — exactly the fold order
  * and association of the previous `aggregate(zip_with(...))` form, so
  * swapping implementations changes no query output bit.
  */
object VecKernels {
  /** Cosine similarity of two double arrays (index-ordered folds). */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Plain dot product (index-ordered fold). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var d = 0.0; var i = 0
    while (i < n) { d += a.getDouble(i) * b.getDouble(i); i += 1 }
    d
  }

  /** Squared L2 distance (index-ordered fold — the association of
    * aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0.0, +), so the
    * swap changes no output bit). Same equal-length/non-null-element
    * contract as [[cosine]]. */
  def l2sq(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var d = 0.0; var i = 0
    while (i < n) {
      val t = a.getDouble(i) - b.getDouble(i)
      d += t * t
      i += 1
    }
    d
  }

  /** PQ asymmetric-distance table lookup: sum_i tables(i)(codes(i)) —
    * index-ordered fold, the association of
    * aggregate(zip_with(codes, tables, (c, t) -> element_at(t, c+1)),
    * 0.0, +). codes are 0-based ints, tables per-subspace double
    * arrays. */
  def adcLookup(codes: ArrayData, tables: ArrayData): Double = {
    val n = codes.numElements()
    var d = 0.0; var i = 0
    while (i < n) {
      d += tables.getArray(i).getDouble(codes.getInt(i))
      i += 1
    }
    d
  }
}

case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.vec.VecKernels.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.vec.VecKernels.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

case class L2SqExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2sq"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.vec.VecKernels.l2sq($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqExpr =
    copy(left = newLeft, right = newRight)
}

case class AdcLookupExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_lookup"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.adcLookup(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.vec.VecKernels.adcLookup($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcLookupExpr =
    copy(left = newLeft, right = newRight)
}

object VecExpressions {
  import org.apache.spark.sql.graftx.{toColumn, toExpression}

  /** Codegen cosine similarity over two double-array columns. */
  def cosineSim(a: Column, b: Column): Column =
    toColumn(CosineSimExpr(toExpression(a), toExpression(b)))

  /** Codegen dot product over two double-array columns. */
  def dotProduct(a: Column, b: Column): Column =
    toColumn(DotProductExpr(toExpression(a), toExpression(b)))

  /** Codegen squared L2 distance over two double-array columns. */
  def l2Sq(a: Column, b: Column): Column =
    toColumn(L2SqExpr(toExpression(a), toExpression(b)))

  /** Codegen ADC table-lookup sum: codes array<int> x tables
    * array<array<double>>. */
  def adcLookup(codes: Column, tables: Column): Column =
    toColumn(AdcLookupExpr(toExpression(codes), toExpression(tables)))
}
