package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization for dedup/linkage normalization —
  * the two verbs crawl pipelines run before hashing text:
  *
  *  - NFC composition (UAX #15): byte-different but canonically
  *    equivalent strings ("é" composed vs "e"+combining-acute) hash
  *    identically afterwards.
  *  - ACCENT STRIP: NFD decomposition with combining marks (category
  *    Mn) removed — "café"/"cafe", "Ångström"/"Angstrom" merge.
  *
  * Semantics pinned to DuckDB's `nfc_normalize` / `strip_accents`
  * (probed: both match the UAX #15 / NFD-drop-Mn definitions
  * exactly, incl. ligatures and fullwidth forms staying UNtouched —
  * compatibility (NFKC) folding is deliberately NOT applied). Each is
  * one generated pass; ASCII-only strings short-circuit through
  * `Normalizer.isNormalized`'s fast path.
  */
abstract class UnicodeNormBase extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override protected def withNewChildInternal(newChild: Expression): Expression
}

case class NfcNormalize(child: Expression) extends UnicodeNormBase {
  override def nullSafeEval(a: Any): Any =
    UnicodeNorm.nfc(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

case class StripAccents(child: Expression) extends UnicodeNormBase {
  override def nullSafeEval(a: Any): Any =
    UnicodeNorm.stripAccents(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.stripAccents($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "strip_accents"
}

object UnicodeNorm {
  import java.text.Normalizer

  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))

  def stripAccentsCol(c: Column): Column =
    ColumnBridge.column(StripAccents(ColumnBridge.expression(c)))

  def nfc(u: UTF8String): UTF8String = {
    val s = u.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) u
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  def stripAccents(u: UTF8String): UTF8String = {
    val d = Normalizer.normalize(u.toString, Normalizer.Form.NFD)
    var hasMark = false
    var i = 0
    while (i < d.length && !hasMark) {
      if (Character.getType(d.charAt(i)) == Character.NON_SPACING_MARK)
        hasMark = true
      i += 1
    }
    if (!hasMark && (d.length == u.toString.length)) return nfc(u)
    val sb = new java.lang.StringBuilder(d.length)
    i = 0
    while (i < d.length) {
      val ch = d.charAt(i)
      if (Character.getType(ch) != Character.NON_SPACING_MARK) sb.append(ch)
      i += 1
    }
    // recompose what remains (DuckDB's strip_accents returns NFC-shaped
    // output for the non-mark residue)
    UTF8String.fromString(
      Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }
}
