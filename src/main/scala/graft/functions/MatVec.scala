package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Constant-matrix × vector product in ONE generated pass — the shared
  * projection primitive behind [[graft.ops.VectorOps.randomProject]]
  * (JL), [[graft.ops.VectorOps.pcaProject]] and the logistic dot: for
  * each output row `j`, `out_j = Σ_i mat(j,i) · v_i` accumulated
  * left-to-right in ascending `i` (double widening before multiply) —
  * BIT-IDENTICAL to the unrolled `element_at` multiply-add chains those
  * ops previously built (differential spec), but with a CONSTANT-size
  * generated loop instead of an `outDim × inDim`-node expression tree:
  * the tree costs seconds of per-query analysis/codegen at 64×16 and
  * ships ~1.5 MB task binaries; here the matrix rides the plan via
  * `addReferenceObj` (the [[TopCentroids]] contract — a few KB shipped
  * once per executor).
  *
  * Input is `array<float>` or `array<double>` (runtime-dispatched); a
  * vector whose length differs from `inDim` or with a null element is
  * NULL — the [[TopCentroids]]/[[HyperplaneBandSigs]] null-on-mismatch
  * contract.
  */
case class MatVec(child: Expression, mat: Array[Double], inDim: Int)
    extends UnaryExpression {
  require(inDim > 0 && mat.length % inDim == 0,
    s"matrix length ${mat.length} is not a multiple of inDim $inDim")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mat_vec needs array<float> or array<double>, got $other")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val isFloat =
    child.dataType == ArrayType(FloatType, containsNull = true) ||
      child.dataType == ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    MatVec.apply0(a.asInstanceOf[ArrayData], mat, inDim, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("projMat", mat, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MatVec.apply0($c, $matRef, $inDim, $isFloat);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "mat_vec"
}

object MatVec {

  def apply0(v: ArrayData, mat: Array[Double], inDim: Int,
      isFloat: Boolean): GenericArrayData = {
    if (v.numElements() != inDim) return null
    val outDim = mat.length / inDim
    val x = new Array[Double](inDim)
    var i = 0
    while (i < inDim) {
      if (v.isNullAt(i)) return null
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val out = new Array[Any](outDim)
    var j = 0
    while (j < outDim) {
      var acc = 0.0
      val base = j * inDim
      var k = 0
      while (k < inDim) { acc += mat(base + k) * x(k); k += 1 }
      out(j) = java.lang.Double.valueOf(acc)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry: `rows` are the matrix rows (each length
    * `inDim`). */
  def matVec(v: Column, rows: Array[Array[Double]]): Column = {
    require(rows.nonEmpty, "matVec: empty matrix")
    val inDim = rows.head.length
    require(rows.forall(_.length == inDim), "matVec: ragged matrix")
    ColumnBridge.column(MatVec(
      ColumnBridge.expression(v), rows.flatten, inDim))
  }
}
