package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.ops.MaskingOps

/** The fused xxhash MLM mask must be bit-identical to
  * `mlmMask(rng = Xxh)` — the production ETL surface.
  */
class MlmMaskXxhSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("fused expression is bit-identical to mlmMask(Xxh) on int token arrays") {
    val rnd = new scala.util.Random(43)
    val docs = (0 until 300).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(40))(rnd.nextInt(1000)))
    }.toDF("doc_id", "toks")
    val hof = MaskingOps.mlmMask(col("toks"), col("doc_id"),
      maskProb = 0.25, maskToken = 999999, vocabSize = 1000, seed = 5L,
      rng = MaskingOps.Xxh)
    val fused = MaskingOps.mlmMaskXxhFused(col("toks"), col("doc_id"),
      maskProb = 0.25, maskToken = 999999, vocabSize = 1000, seed = 5L)
    val diff = docs.select(
      hof.getField("ids").as("hi"), hof.getField("labels").as("hl"),
      fused.getField("ids").as("fi"), fused.getField("labels").as("fl"))
      .filter(not(col("hi") <=> col("fi")) || not(col("hl") <=> col("fl")))
    assert(diff.count() == 0)
    val nMask = docs.select(fused.getField("ids").as("ids"))
      .select(sum(size(filter(col("ids"), x => x === 999999)))).as[Long].head()
    assert(nMask > 0)
  }

  test("empty arrays and null elements mirror the column algebra") {
    val docs = Seq(
      (1L, Seq[Option[Int]]()),
      (2L, Seq[Option[Int]](Some(5), None, Some(7)))
    ).toDF("doc_id", "toks")
    val hof = MaskingOps.mlmMask(col("toks"), col("doc_id"),
      maskProb = 0.9, maskToken = 42, vocabSize = 10, seed = 3L,
      rng = MaskingOps.Xxh)
    val fused = MaskingOps.mlmMaskXxhFused(col("toks"), col("doc_id"),
      maskProb = 0.9, maskToken = 42, vocabSize = 10, seed = 3L)
    assert(docs.select(
      hof.getField("ids").as("hi"), hof.getField("labels").as("hl"),
      fused.getField("ids").as("fi"), fused.getField("labels").as("fl"))
      .filter(not(col("hi") <=> col("fi")) || not(col("hl") <=> col("fl")))
      .count() == 0)
  }
}
