package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All unordered co-occurrence pair keys within `window` positions,
  * fused into one pass over the token array: for every position i and
  * every j in (i, i+window], emits `min(t_i, t_j) + " " + max(t_i,
  * t_j)` (binary UTF8 order — exactly Spark's `least`/`greatest` on
  * strings). The space join is unambiguous because whitespace-split
  * tokens cannot contain a space; callers split the key back with
  * `substring_index`.
  *
  * The [[ShingleHashes64]] treatment for the PMI pair stream
  * ([[graft.ops.TextAnalysis.pmiPairs]]): the composable nested
  * `transform`+`flatten`+`struct` tower is interpreted per element
  * (higher-order functions never enter whole-stage codegen) — the
  * fusion removes the index array, the per-center slice allocation,
  * and per-pair struct boxing. Null tokens are skipped.
  */
case class WindowedPairKeys(child: Expression, window: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(window >= 1, s"window must be >= 1, got $window")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    WindowedPairKeys.pairKeys(a.asInstanceOf[ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WindowedPairKeys.pairKeys($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "windowed_pair_keys"
}

object WindowedPairKeys {

  private val space = UTF8String.fromString(" ")

  def pairKeys(arr: ArrayData, window: Int): ArrayData = {
    val len = arr.numElements()
    if (len < 2) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[UTF8String](
      math.min(len.toLong * window, 1 << 20).toInt)
    var i = 0
    while (i < len - 1) {
      if (!arr.isNullAt(i)) {
        val a = arr.getUTF8String(i)
        val hi = math.min(i + window, len - 1)
        var j = i + 1
        while (j <= hi) {
          if (!arr.isNullAt(j)) {
            val b = arr.getUTF8String(j)
            val key =
              if (a.compareTo(b) <= 0) UTF8String.concatWs(space, a, b)
              else UTF8String.concatWs(space, b, a)
            out.add(key)
          }
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def windowedPairKeys(toks: Column, window: Int): Column =
    ColumnBridge.column(
      WindowedPairKeys(ColumnBridge.expression(toks), window))
}
