package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** The `combine_text` budgeted three-field assembly (OP-16/17) fused
  * into one pass — value-identical to
  * [[graft.ops.TextOps.budgetedAssemble]], whose column form
  * materializes ~a dozen intermediate arrays per row (two slices and a
  * concat per `cut_min`, plus the conditional copies). The cut algebra
  * is pure INDEX arithmetic — which field is cut, where its head/tail
  * keep-ranges lie, what debt remains — so the fused form computes the
  * ranges with plain ints (the same `floor((len-need)/2)` / floor /
  * debt rules, branch for branch) and copies each kept element exactly
  * once into the single output array. Null elements copy through like
  * `slice`/`concat` would; a null input array is null.
  */
case class BudgetedAssembleExpr(
    first: Expression, second: Expression, third: Expression,
    budget: Int, minFirst: Int, minSecond: Int, minThird: Int)
    extends TernaryExpression with ExpectsInputTypes {
  require(minFirst >= 2 && minSecond >= 2 && minThird >= 2,
    "cut_min floors must be >= 2 (mid = minLen/2 must stay positive)")

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType)

  override def nullSafeEval(f: Any, s: Any, t: Any): Any =
    BudgetedAssembleExpr.assemble(
      f.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData], t.asInstanceOf[ArrayData],
      budget, minFirst, minSecond, minThird)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, s, t) =>
      s"graft.functions.BudgetedAssembleExpr.assemble($f, $s, $t, $budget, $minFirst, $minSecond, $minThird)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "budgeted_assemble"
}

object BudgetedAssembleExpr {

  /** Keep-ranges of one field after its `cut_min` step: (start, len)
    * pairs into the source array, plus the remaining debt. Mirrors
    * `TextOps.cutStep`/`cutMin` branch for branch.
    */
  private def cutStep(len: Int, need: Int, minLen: Int): (Array[Int], Int) =
    if (need > 0 && len > minLen) {
      val fits = need < len - minLen
      val mid = if (fits) (len - need) / 2 else minLen / 2
      val debt = if (fits) -1 else need - (len - minLen)
      (Array(0, mid, len - mid, mid), debt)
    } else (Array(0, len), need)

  def assemble(f: ArrayData, s: ArrayData, t: ArrayData,
      budget: Int, minFirst: Int, minSecond: Int, minThird: Int): ArrayData = {
    val lf = f.numElements(); val ls = s.numElements(); val lt = t.numElements()
    val need0 = lf + ls + lt - budget
    val (rs, debt2) = cutStep(ls, need0, minSecond)
    val (rt, debt3) = cutStep(lt, debt2, minThird)
    val (rf, _) = cutStep(lf, debt3, minFirst)
    var total = 0
    var i = 1
    while (i < rf.length) { total += rf(i); i += 2 }
    i = 1
    while (i < rs.length) { total += rs(i); i += 2 }
    i = 1
    while (i < rt.length) { total += rt(i); i += 2 }
    val out = new Array[Any](total)
    var o = 0
    def copy(src: ArrayData, ranges: Array[Int]): Unit = {
      var r = 0
      while (r < ranges.length) {
        val start = ranges(r); val len = ranges(r + 1)
        var j = 0
        while (j < len) {
          out(o) = if (src.isNullAt(start + j)) null else src.getUTF8String(start + j)
          o += 1; j += 1
        }
        r += 2
      }
    }
    copy(f, rf); copy(s, rs); copy(t, rt)
    new GenericArrayData(out)
  }

  def budgetedAssemble(
      first: Column, second: Column, third: Column,
      budget: Int, minFirst: Int, minSecond: Int, minThird: Int): Column =
    ColumnBridge.column(BudgetedAssembleExpr(
      ColumnBridge.expression(first), ColumnBridge.expression(second),
      ColumnBridge.expression(third), budget, minFirst, minSecond, minThird))
}
