package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (gear-hash CDC) in ONE native pass per
  * row: the rolling `h ← 2h + gear(cp) mod 2^hashBits` recurrence, the
  * `h mod 2^maskBits = 0` cut rule, and the chunk substrings — exactly
  * [[graft.ops.DedupOps.cdcChunksComposable]]'s algebra (differential
  * spec pins bit-identity), which the DuckDB oracle replays through
  * the trailing-window closed form.
  *
  * Exists because the composable fold walks an interpreted
  * struct-accumulator HOF per character with a copy-on-append chunk
  * array — measured 28 s at sf0.1 for the q230 census whose chunking
  * stage this is; the native loop is a plain char scan.
  * CodegenFallback like [[TopNgramFrac]]: per-row work is a loop over
  * the text, so the one-object-call overhead is noise. `gear(cp)` is
  * the Knuth multiplicative mix of the CODE POINT (matching `ascii`
  * in the composable form), so supplementary-plane characters hash and
  * split identically in both forms.
  */
case class CdcChunks(child: Expression, maskBits: Int, hashBits: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(maskBits >= 1 && maskBits <= hashBits && hashBits <= 30,
    s"need 1 <= maskBits <= hashBits <= 30, got ($maskBits, $hashBits)")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val mod = 1L << hashBits
  private val mask = 1L << maskBits

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val len = s.length
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var h = 0L
    var start = 0
    var i = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      h = (2 * h + (cp.toLong * 2654435761L) % mod) % mod
      if (i + w < len && h % mask == 0) {
        out += UTF8String.fromString(s.substring(start, i + w))
        start = i + w
      }
      i += w
    }
    out += UTF8String.fromString(s.substring(start))
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "cdc_chunks"
}

object CdcChunks {
  def cdcChunks(text: Column, maskBits: Int = 6, hashBits: Int = 20): Column =
    ColumnBridge.column(
      CdcChunks(ColumnBridge.expression(text), maskBits, hashBits))
}
