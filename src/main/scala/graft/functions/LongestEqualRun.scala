package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Longest run of equal ADJACENT elements in a `array<string>` — on a
  * sorted array this is the multiset mode count, the top-n-gram
  * numerator of the Gopher repetition rules. 0 for an empty array.
  *
  * Exists because the composable form — `aggregate` with a
  * (prev, run, best) struct accumulator — runs as an interpreted
  * lambda projection per element (~20 µs/step: 5k docs × 53 bigrams
  * measured ~6 s at sf0.1); this is one generated loop of adjacent
  * UTF8String compares (~ms). Null elements are skipped (never part
  * of a run), matching the HOF form where null never equals anything.
  */
case class LongestEqualRun(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = IntegerType

  override def nullSafeEval(arr: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val n = a.numElements()
    var best = 0
    var run = 0
    var prev: org.apache.spark.unsafe.types.UTF8String = null
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) { run = 0; prev = null }
      else {
        val v = a.getUTF8String(i)
        run = if (prev != null && v.equals(prev)) run + 1 else 1
        if (run > best) best = run
        prev = v
      }
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val best = ctx.freshName("best"); val run = ctx.freshName("run")
      val prev = ctx.freshName("prev"); val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |int $best = 0, $run = 0;
         |UTF8String $prev = null;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $run = 0; $prev = null; }
         |  else {
         |    UTF8String $v = $a.getUTF8String($i);
         |    $run = ($prev != null && $v.equals($prev)) ? $run + 1 : 1;
         |    if ($run > $best) $best = $run;
         |    $prev = $v;
         |  }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "longest_equal_run"
}

object LongestEqualRun {
  def longestEqualRun(sortedArr: Column): Column =
    ColumnBridge.column(LongestEqualRun(ColumnBridge.expression(sortedArr)))
}
