package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenization as a Catalyst expression (OP-15; reference
  * tokenizer `hfl/chinese-roberta-wwm-ext` via HF BertTokenizer,
  * `src/data_helper.py:55-57,94`).
  *
  * Pipeline per the BERT basic tokenizer: lowercase → split on
  * whitespace → isolate CJK ideographs as single chars → split off
  * punctuation → greedy longest-match WordPiece per word (continuations
  * carry the `##` prefix), unknown words → [UNK]. Output is framed
  * `[CLS] ... [SEP]` like the reference's per-field encodings.
  *
  * Full parity with the HF vocab is not oracle-checkable (SURVEY
  * §7.4.7); the algorithm is pinned by frozen vocab+case tests, and the
  * vocabulary is injectable so the real 21128-entry file drops in
  * unchanged. CodegenFallback: the greedy trie loop is irregular
  * control flow with no vectorization win; the expression form still
  * avoids UDF encoder overhead and keeps null semantics native.
  */
case class WordPieceTokenize(
    child: Expression,
    vocab: Seq[String],
    lowercase: Boolean = true) extends UnaryExpression with CodegenFallback {

  @transient private lazy val vocabIds: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocab.size * 2)
    vocab.zipWithIndex.foreach { case (w, i) => m.put(w, i) }
    m
  }
  @transient private lazy val clsId = vocabIds.get("[CLS]")
  @transient private lazy val sepId = vocabIds.get("[SEP]")
  @transient private lazy val unkId = vocabIds.get("[UNK]")
  @transient private lazy val maxPieceLen =
    if (vocab.isEmpty) 0 else vocab.iterator.map(_.length).max

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def isCjk(c: Char): Boolean =
    (c >= 0x4E00 && c <= 0x9FFF) || (c >= 0x3400 && c <= 0x4DBF)

  private def isPunct(c: Char): Boolean =
    !Character.isLetterOrDigit(c) && !Character.isWhitespace(c)

  /** basic tokenizer: whitespace split + CJK isolation + punct split. */
  private[functions] def basicTokens(text: String): Seq[String] = {
    val t = if (lowercase) text.toLowerCase else text
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    def flush(): Unit = { if (cur.nonEmpty) { out += cur.toString; cur.clear() } }
    t.foreach { c =>
      if (Character.isWhitespace(c)) flush()
      else if (isCjk(c) || isPunct(c)) { flush(); out += c.toString }
      else cur.append(c)
    }
    flush()
    out.result()
  }

  /** greedy longest-match WordPiece of one basic token. */
  private[functions] def wordPieces(word: String): Seq[Int] = {
    val pieces = Seq.newBuilder[Int]
    var start = 0
    while (start < word.length) {
      var end = math.min(word.length, start + maxPieceLen)
      var found = -1
      while (end > start && found < 0) {
        val sub = (if (start > 0) "##" else "") + word.substring(start, end)
        val id = vocabIds.get(sub)
        if (id != null) found = id else end -= 1
      }
      if (found < 0) return Seq(unkId) // whole word → [UNK], HF behavior
      pieces += found
      start = end
    }
    pieces.result()
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val ids = Array.newBuilder[Int]
    ids += clsId
    basicTokens(text).foreach(w => wordPieces(w).foreach(ids += _))
    ids += sepId
    ArrayData.toArrayData(ids.result())
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "wordpiece_tokenize"
}

object WordPieceTokenize {
  /** Column-API entry point. */
  def wordpiece(text: Column, vocab: Seq[String], lowercase: Boolean = true): Column =
    ColumnBridge.column(WordPieceTokenize(ColumnBridge.expression(text), vocab, lowercase))
}
