package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Share of all word n-grams taken by the most frequent one — the
  * top-n-gram repetition signal of the Gopher quality rules — computed
  * in ONE pass over the token array: build each n-gram, sort, scan the
  * longest equal run. 0.0 when the doc has fewer than n tokens.
  *
  * Exists because the composable form (transform(sequence)+slice+
  * concat_ws → array_sort → run scan) costs ~1.6 s per EVALUATION at
  * sf0.1 and higher-order functions are interpreted AND excluded from
  * subexpression elimination, so a struct touching the gram list twice
  * paid it 2-3× (q52 measured ~5.5 s; this form ~0.3 s).
  * CodegenFallback like [[WordPieceTokenize]]: the sort+scan loop is
  * irregular, and the one-object-call-per-row overhead is noise next
  * to the removed HOF tower. Null tokens are treated as empty strings
  * (the whitespace tokenizer never emits them).
  */
case class TopNgramFrac(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(n >= 1, s"n must be >= 1, got $n")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = DoubleType

  private val space = UTF8String.fromString(" ")
  private val empty = UTF8String.fromString("")

  override def nullSafeEval(arr: Any): Any = {
    val toks = arr.asInstanceOf[ArrayData]
    val nToks = toks.numElements()
    val nGrams = nToks - n + 1
    if (nGrams <= 0) return 0.0
    val grams = new Array[UTF8String](nGrams)
    var i = 0
    while (i < nGrams) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (toks.isNullAt(i + j)) empty else toks.getUTF8String(i + j)
        j += 1
      }
      grams(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    java.util.Arrays.sort(grams.asInstanceOf[Array[AnyRef]])
    var best = 0
    var run = 0
    var prev: UTF8String = null
    i = 0
    while (i < nGrams) {
      val v = grams(i)
      run = if (prev != null && v.equals(prev)) run + 1 else 1
      if (run > best) best = run
      prev = v
      i += 1
    }
    best.toDouble / nGrams
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "top_ngram_frac"
}

object TopNgramFrac {
  def topNgramFrac(toks: Column, n: Int): Column =
    ColumnBridge.column(TopNgramFrac(ColumnBridge.expression(toks), n))
}
