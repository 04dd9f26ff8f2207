package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.ops.TextOps

/** The fused budgeted assembly must be bit-identical to the composable
  * cut_min column algebra across every branch: no cut needed, satisfied
  * cuts, floor-clamped cuts with rolling debt, and empty fields.
  */
class BudgetedAssembleExprSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("fused expression is bit-identical to the composable formulation") {
    val rnd = new scala.util.Random(47)
    def arr() = Seq.fill(rnd.nextInt(25))("w" + rnd.nextInt(30))
    val rows = (0 until 500).map(i => (i.toLong, arr(), arr(), arr()))
    val docs = rows.toDF("id", "f", "s", "t")
    val hof = TextOps.budgetedAssemble(col("f"), col("s"), col("t"), 16, 4, 5, 5)
    val fused = TextOps.budgetedAssembleFused(col("f"), col("s"), col("t"), 16, 4, 5, 5)
    val diff = docs.select(hof.as("h"), fused.as("x"))
      .filter(not(col("h") <=> col("x")))
    assert(diff.count() == 0)
    // different budgets/floors hit different branches
    val hof2 = TextOps.budgetedAssemble(col("f"), col("s"), col("t"), 40, 2, 2, 2)
    val fused2 = TextOps.budgetedAssembleFused(col("f"), col("s"), col("t"), 40, 2, 2, 2)
    assert(docs.select(hof2.as("h"), fused2.as("x"))
      .filter(not(col("h") <=> col("x"))).count() == 0)
  }

  test("empty fields and null arrays") {
    val docs = Seq(
      (1L, Seq[String](), Seq("a", "b"), Seq[String]()),
      (2L, Seq[String](), Seq[String](), Seq[String]())
    ).toDF("id", "f", "s", "t")
    val hof = TextOps.budgetedAssemble(col("f"), col("s"), col("t"), 16, 4, 5, 5)
    val fused = TextOps.budgetedAssembleFused(col("f"), col("s"), col("t"), 16, 4, 5, 5)
    assert(docs.select(hof.as("h"), fused.as("x"))
      .filter(not(col("h") <=> col("x"))).count() == 0)
    val gotNull = Seq(1L).toDF("id")
      .select(TextOps.budgetedAssembleFused(
        lit(null).cast("array<string>"), lit(null).cast("array<string>"),
        lit(null).cast("array<string>"), 16, 4, 5, 5))
      .collect()(0)
    assert(gotNull.isNullAt(0))
  }
}
