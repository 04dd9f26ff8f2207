package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.ops.MaskingOps

/** The fused portable MLM mask must be bit-identical to the lazy
  * CaseWhen column algebra it replaces — ids AND labels, across empty
  * arrays, null elements, and both branches of every draw.
  */
class MlmMaskMd5Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("fused expression is bit-identical to mlmMask(Portable) on long token arrays") {
    val rnd = new scala.util.Random(41)
    val docs = (0 until 300).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(40))(rnd.nextInt(1000).toLong))
    }.toDF("doc_id", "toks")
    val hof = MaskingOps.mlmMask(col("toks"), col("doc_id"),
      maskProb = 0.25, maskToken = 999999, vocabSize = 1000, seed = 7L)
    val fused = MaskingOps.mlmMaskPortableFused(col("toks"), col("doc_id"),
      maskProb = 0.25, maskToken = 999999, vocabSize = 1000, seed = 7L)
    val diff = docs.select(
      hof.getField("ids").as("hi"), hof.getField("labels").as("hl"),
      fused.getField("ids").as("fi"), fused.getField("labels").as("fl"))
      .filter(not(col("hi") <=> col("fi")) || not(col("hl") <=> col("fl")))
    assert(diff.count() == 0)
    // sanity: selection actually happened somewhere
    val nMask = docs.select(fused.getField("ids").as("ids"))
      .select(sum(size(filter(col("ids"), x => x === 999999)))).as[Long].head()
    assert(nMask > 0)
  }

  test("null elements and empty arrays mirror the column algebra") {
    val docs = Seq(
      (1L, Seq[Option[Long]]()),
      (2L, Seq[Option[Long]](Some(5L), None, Some(7L))),
      (3L, Seq[Option[Long]](None, None))
    ).toDF("doc_id", "toks")
    val hof = MaskingOps.mlmMask(col("toks"), col("doc_id"),
      maskProb = 0.9, maskToken = 42, vocabSize = 10, seed = 3L)
    val fused = MaskingOps.mlmMaskPortableFused(col("toks"), col("doc_id"),
      maskProb = 0.9, maskToken = 42, vocabSize = 10, seed = 3L)
    val diff = docs.select(
      hof.getField("ids").as("hi"), hof.getField("labels").as("hl"),
      fused.getField("ids").as("fi"), fused.getField("labels").as("fl"))
      .filter(not(col("hi") <=> col("fi")) || not(col("hl") <=> col("fl")))
    assert(diff.count() == 0)
  }
}
