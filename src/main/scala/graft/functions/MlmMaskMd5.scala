package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The whole portable-hash MLM masking decision fused into one pass —
  * the [[SimHash64]]/[[MinShingleMd5]] treatment for OP-55's oracle
  * form (q33), whose cost is NOT the md5 primitive (intrinsified) but
  * the interpreted per-draw machinery: each draw walked a
  * concat_ws/cast/divide expression tree inside a higher-order
  * `transform`, three times per selected token.
  *
  * Draw strings replicate [[graft.ops.MaskingOps.Portable]] byte-wise
  * (`"key#i#seed#salt"`, salts `sel`/`sub`/`rand`), the uniform is the
  * same `md5Long60 / 2⁶⁰`, and the branch structure is identical —
  * `sub`/`rand` draws happen ONLY for selected tokens / the 10%
  * random-replacement branch, so the md5 COUNT matches the lazy
  * CaseWhen form and the result is bit-identical (differential spec;
  * q33 stays oracle-green). Null token elements mirror the column
  * algebra: a null id stays null where the algebra yields null.
  */
case class MlmMaskMd5(
    left: Expression, right: Expression,
    maskProb: Double, maskToken: Int, vocabSize: Int, seed: Long)
    extends BinaryExpression with ExpectsInputTypes {
  require(vocabSize > 0, "vocabSize must be positive")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("ids", ArrayType(LongType)),
    StructField("labels", ArrayType(LongType))))

  override def nullSafeEval(toks: Any, key: Any): Any =
    MlmMaskMd5.compute(toks.asInstanceOf[ArrayData], key.asInstanceOf[UTF8String],
      maskProb, maskToken, vocabSize, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) =>
      s"graft.functions.MlmMaskMd5.compute($t, $k, $maskProb, $maskToken, $vocabSize, ${seed}L)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "mlm_mask_md5"
}

object MlmMaskMd5 {

  private val two60 = 1152921504606846976.0 // 2^60

  private def draw(base: String, salt: String): Long =
    Md5Long.top(UTF8String.fromString(base + salt), 60)

  def compute(toks: ArrayData, key: UTF8String, maskProb: Double,
      maskToken: Int, vocabSize: Int, seed: Long): InternalRow = {
    val n = toks.numElements()
    val ids = new Array[Any](n)
    val labels = new Array[Any](n)
    val prefix = key.toString + "#"
    val seedPart = "#" + seed + "#"
    var i = 0
    while (i < n) {
      val tNull = toks.isNullAt(i)
      val t = if (tNull) 0L else toks.getLong(i)
      val base = prefix + i + seedPart
      val uSel = draw(base, "sel").toDouble / two60
      if (uSel < maskProb) {
        val uSub = draw(base, "sub").toDouble / two60
        ids(i) =
          if (uSub < 0.8) java.lang.Long.valueOf(maskToken.toLong)
          else if (uSub < 0.9) java.lang.Long.valueOf(draw(base, "rand") % vocabSize)
          else if (tNull) null
          else java.lang.Long.valueOf(t)
        labels(i) = if (tNull) null else java.lang.Long.valueOf(t)
      } else {
        ids(i) = if (tNull) null else java.lang.Long.valueOf(t)
        labels(i) = java.lang.Long.valueOf(graft.ops.MaskingOps.IgnoreLabel.toLong)
      }
      i += 1
    }
    InternalRow(new GenericArrayData(ids), new GenericArrayData(labels))
  }

  def mlmMaskMd5(toks: Column, key: Column, maskProb: Double,
      maskToken: Int, vocabSize: Int, seed: Long): Column =
    ColumnBridge.column(MlmMaskMd5(
      ColumnBridge.expression(toks), ColumnBridge.expression(key),
      maskProb, maskToken, vocabSize, seed))
}
