package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** 64-bit SimHash of a token array, fused into ONE pass.
  *
  * Value-identical to the composable form
  * `DedupOps.simHash(toks, 64, xxhash64(_))` — per token
  * `h = xxhash64(token)` (seed 42, via [[XXH64.hashUTF8String]], the
  * exact routine the builtin uses for strings), each of the 64 sign
  * counters moves by ±1 on bit b of h, and the signature sets bit b iff
  * counter b ends positive. The HOF form pays an interpreted
  * 64-element `zip_with` array allocation per TOKEN (higher-order
  * lambdas never enter whole-stage codegen); here a token costs one
  * hash plus 64 add/shifts in a tight generated loop and no
  * intermediate array ever materializes.
  *
  * Null tokens are skipped; an empty/all-null array yields signature 0
  * (all counters at zero, ties clear no bits) — matching the HOF form.
  * NOT portable across engines by design: the oracle-checked portable
  * signature (q29) is the md5-family `simHash(toks, 48, md5Long48)`.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    SimHash64.sig(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.sig($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "sim_hash64"
}

object SimHash64 {

  /** One pass over the tokens: hash, 64 counter updates, sign fold. */
  def sig(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val len = arr.numElements()
    var j = 0
    while (j < len) {
      if (!arr.isNullAt(j)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
        var b = 0
        while (b < 64) {
          counts(b) += ((((h >>> b) & 1L) << 1) - 1L).toInt
          b += 1
        }
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  def simHash64(toks: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(toks)))
}
