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
  def sig(arr: ArrayData): Long = fold(arr, 64, xxh = true)

  /** The md5-family ORACLE variant (`nBits` ≤ 60, portable draws): same
    * fold with `md5Long(nBits)` per token — used by
    * [[SimHashMd5.sig]]; DuckDB replays it hex-wise.
    */
  private[functions] def fold(arr: ArrayData, nBits: Int, xxh: Boolean): Long = {
    val counts = new Array[Int](nBits)
    val len = arr.numElements()
    var j = 0
    while (j < len) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        val h = if (xxh) XXH64.hashUTF8String(s, 42L) else Md5Long.top(s, nBits)
        var b = 0
        while (b < nBits) {
          counts(b) += ((((h >>> b) & 1L) << 1) - 1L).toInt
          b += 1
        }
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < nBits) {
      if (counts(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  def simHash64(toks: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(toks)))
}

/** [[SimHash64]]'s portable sibling: `nBits`-bit SimHash with one
  * md5Long draw per token — bit-identical to
  * `DedupOps.simHash(toks, nBits, md5Long(nBits))` (the q29 oracle
  * form), fused for the same reason: the HOF fold allocates an
  * `nBits`-element counter array per TOKEN outside codegen.
  */
case class SimHashMd5(child: Expression, nBits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nBits > 0 && nBits <= 60 && nBits % 4 == 0,
    s"nBits must be a positive multiple of 4 up to 60, got $nBits")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    SimHashMd5.sig(a.asInstanceOf[ArrayData], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashMd5.sig($c, $nBits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "sim_hash_md5"
}

object SimHashMd5 {

  def sig(arr: ArrayData, nBits: Int): Long = SimHash64.fold(arr, nBits, xxh = false)

  def simHashMd5(toks: Column, nBits: Int): Column =
    ColumnBridge.column(SimHashMd5(ColumnBridge.expression(toks), nBits))
}
