package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as ONE generated pass — the record-linkage
  * scorer (Winkler 1990) complementing the Levenshtein surface
  * (`editKeepers` family): order-tolerant, prefix-boosted, O(len·w)
  * per pair with two small boolean scratch arrays and no DP matrix
  * (Levenshtein is O(len²) memory-bound).
  *
  * Semantics pinned to DuckDB's `jaro_winkler_similarity` (probed,
  * spec'd): match window `max(0, ⌊max(l1,l2)/2⌋−1)`, transpositions =
  * ⌊mismatched-alignment/2⌋ (INTEGER halving — the 3-cycle case
  * distinguishes this from /2.0), Winkler boost `+ℓ·0.1·(1−jaro)`
  * with prefix ℓ ≤ 4 applied only when `jaro > 0.7`, and either-empty
  * (and the degenerate m = 0) scoring 0.0. Comparison is per UTF-16
  * char — identical to byte-wise for ASCII keys; supplementary-plane
  * input differs from DuckDB's byte view, so keep linkage keys ASCII
  * (the spec pins the contract).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinkler.jw($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}

object JaroWinkler {

  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def jw(ua: UTF8String, ub: UTF8String): Double = {
    val s = ua.toString
    val t = ub.toString
    val l1 = s.length
    val l2 = t.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val sM = new Array[Boolean](l1)
    val tM = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val c = s.charAt(i)
      var j = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var found = false
      while (j <= hi && !found) {
        if (!tM(j) && c == t.charAt(j)) {
          sM(i) = true; tM(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0
    var mismatches = 0
    i = 0
    while (i < l1) {
      if (sM(i)) {
        while (!tM(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) mismatches += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val trans = (mismatches / 2).toDouble
    val jaro = (md / l1 + md / l2 + (md - trans) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(l1, l2))
    while (prefix < maxPrefix && s.charAt(prefix) == t.charAt(prefix))
      prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}
