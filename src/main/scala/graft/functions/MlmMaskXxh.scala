package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** [[MlmMaskMd5]]'s production sibling: the xxhash64-family MLM
  * decision fused into one pass. Draws replicate
  * [[graft.ops.MaskingOps.Xxh]] exactly — `xxhash64(key, i, seed,
  * salt)` is Spark's left fold `hash(salt, hash(seed, hash(i,
  * hash(key, 42))))` over the children's native types (long key, int
  * position, long seed, string salt), the uniform is the top 53 bits
  * over 2⁵³ and the long draw is the low 63 — with the same lazy branch
  * structure, so results are bit-identical to
  * `mlmMask(toks, key, …, rng = Xxh)` over `array<int>` ids and a
  * LONG key (differential spec). This is the hot expression of the
  * end-to-end ETL path (`b_pipeline_etl`), where the HOF machinery —
  * not the hash — dominated.
  */
case class MlmMaskXxh(
    left: Expression, right: Expression,
    maskProb: Double, maskToken: Int, vocabSize: Int, seed: Long)
    extends BinaryExpression with ExpectsInputTypes {
  require(vocabSize > 0, "vocabSize must be positive")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(IntegerType), LongType)
  override def dataType: DataType = StructType(Seq(
    StructField("ids", ArrayType(IntegerType)),
    StructField("labels", ArrayType(IntegerType))))

  override def nullSafeEval(toks: Any, key: Any): Any =
    MlmMaskXxh.compute(toks.asInstanceOf[ArrayData], key.asInstanceOf[Long],
      maskProb, maskToken, vocabSize, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) =>
      s"graft.functions.MlmMaskXxh.compute($t, $k, $maskProb, $maskToken, $vocabSize, ${seed}L)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "mlm_mask_xxh"
}

object MlmMaskXxh {

  private val two53 = 9007199254740992.0 // 2^53
  private val SEL = UTF8String.fromString("sel")
  private val SUB = UTF8String.fromString("sub")
  private val RAND = UTF8String.fromString("rand")

  /** = xxhash64(key, i, seed, salt): Spark's seed-42 left fold over the
    * children's native types.
    */
  private def draw(key: Long, i: Int, seed: Long, salt: UTF8String): Long =
    XXH64.hashUTF8String(salt,
      XXH64.hashLong(seed,
        XXH64.hashInt(i,
          XXH64.hashLong(key, 42L))))

  def compute(toks: ArrayData, key: Long, maskProb: Double,
      maskToken: Int, vocabSize: Int, seed: Long): InternalRow = {
    val n = toks.numElements()
    val ids = new Array[Any](n)
    val labels = new Array[Any](n)
    var i = 0
    while (i < n) {
      val tNull = toks.isNullAt(i)
      val t = if (tNull) 0 else toks.getInt(i)
      val uSel = (draw(key, i, seed, SEL) >>> 11).toDouble / two53
      if (uSel < maskProb) {
        val uSub = (draw(key, i, seed, SUB) >>> 11).toDouble / two53
        ids(i) =
          if (uSub < 0.8) Integer.valueOf(maskToken)
          else if (uSub < 0.9)
            Integer.valueOf(((draw(key, i, seed, RAND) >>> 1) % vocabSize).toInt)
          else if (tNull) null
          else Integer.valueOf(t)
        labels(i) = if (tNull) null else Integer.valueOf(t)
      } else {
        ids(i) = if (tNull) null else Integer.valueOf(t)
        labels(i) = Integer.valueOf(graft.ops.MaskingOps.IgnoreLabel)
      }
      i += 1
    }
    InternalRow(new GenericArrayData(ids), new GenericArrayData(labels))
  }

  def mlmMaskXxh(toks: Column, key: Column, maskProb: Double,
      maskToken: Int, vocabSize: Int, seed: Long): Column =
    ColumnBridge.column(MlmMaskXxh(
      ColumnBridge.expression(toks), ColumnBridge.expression(key),
      maskProb, maskToken, vocabSize, seed))
}
