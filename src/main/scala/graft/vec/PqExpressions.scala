package graft.vec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization encode kernel: one static method so both
  * interpreted eval and generated code share the implementation (the
  * [[graft.functions.HashOps]] discipline). */
object PqKernels {

  /** Argmin codebook entry per subspace, squared-L2, summed in index
    * order (matches `l2sq`'s aggregate(zip_with(...)) fold order so the
    * doubles — and therefore the lossless-codebook oracle gate — agree
    * bit-for-bit). Strict `<` keeps the FIRST minimal entry: ties break
    * toward the smaller code, the min_by(struct(d, code)) convention. */
  def pqEncode(vec: ArrayData, m: Int, subDim: Int,
               cbs: Array[Array[Array[Double]]]): ArrayData = {
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cb = cbs(j)
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cb.length) {
        val e = cb(c)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val x = vec.getDouble(j * subDim + i) - e(i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    ArrayData.toArrayData(codes)
  }
}

/** Encode a (double-cast) vector to its m PQ codes in ONE tight loop per
  * row. The codebook rides along as a codegen REFERENCE OBJECT
  * (`ctx.addReferenceObj`), not an inlined literal — ksub=256 x subDim
  * doubles as array literals per subspace would blow past codegen
  * limits, which is why the old implementation went through a broadcast
  * join + min_by aggregate instead. That join materialized N x m x ksub
  * rows per pass; this is a projection over N rows with zero exchanges,
  * and the whole corpus-encode stays inside whole-stage codegen. */
case class PqEncodeExpr(child: Expression, m: Int, subDim: Int,
                        codebooks: Seq[Seq[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val cbArr: Array[Array[Array[Double]]] =
    codebooks.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    PqKernels.pqEncode(input.asInstanceOf[ArrayData], m, subDim, cbArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", cbArr, "double[][][]")
    defineCodeGen(ctx, ev,
      c => s"graft.vec.PqKernels.pqEncode($c, $m, $subDim, $cbRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

object PqExpressions {
  import org.apache.spark.sql.graftx.{toColumn, toExpression}

  /** Column form over a double-array vector column. */
  def encode(vec: Column, model: VectorOps.PqModel): Column =
    toColumn(PqEncodeExpr(toExpression(vec), model.m, model.subDim, model.codebooks))
}
