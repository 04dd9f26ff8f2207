package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Production-hash (xxhash64) masking family: same distributional
  * contract as the oracle-checked Portable family (q33/q37), different
  * bits. Pins selection rate, the 80/10/10 substitution split, label
  * sentinels, and partitioning-independence.
  */
class XxhMaskingSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val nDocs = 400
  private val tokensPerDoc = 24

  private lazy val docs = (0 until nDocs).map { d =>
    (d.toLong, (0 until tokensPerDoc).map(t => (d * 31 + t) % 1000))
  }.toDF("doc_id", "toks")

  private lazy val masked = docs.select(
    col("doc_id"), col("toks"),
    MaskingOps.mlmMask(col("toks"), col("doc_id"),
      maskProb = 0.25, maskToken = 999999, vocabSize = 1000,
      rng = MaskingOps.Xxh).as("m"))

  test("xxh MLM: selection rate ~ maskProb and 80/10/10 split, labels carry originals") {
    val stats = masked.select(
        size(col("toks")).as("n"),
        size(filter(col("m.labels"), l => l =!= MaskingOps.IgnoreLabel)).as("n_sel"),
        size(filter(col("m.ids"), i => i === 999999)).as("n_mask"),
        // changed-but-not-[MASK]: the 10% random-substitution arm
        size(filter(zip_with(col("m.ids"), col("toks"), (a, b) => (a =!= b) && (a =!= 999999)),
          x => x)).as("n_rand"))
      .agg(sum("n"), sum("n_sel"), sum("n_mask"), sum("n_rand"))
      .as[(Long, Long, Long, Long)].head()
    val (n, nSel, nMask, nRand) = stats
    val selRate = nSel.toDouble / n
    assert(math.abs(selRate - 0.25) < 0.03, f"selection rate $selRate%.3f vs 0.25")
    val maskFrac = nMask.toDouble / nSel
    assert(math.abs(maskFrac - 0.8) < 0.05, f"[MASK] fraction $maskFrac%.3f vs 0.8")
    // random arm: 10% of selected, minus ~1/1000 collisions with the original
    val randFrac = nRand.toDouble / nSel
    assert(randFrac > 0.05 && randFrac < 0.15, f"random fraction $randFrac%.3f vs ~0.1")
    // labels: original token where selected, -100 elsewhere
    val badLabels = masked.select(
      size(filter(zip_with(col("m.labels"), col("toks"),
        (l, t) => (l =!= MaskingOps.IgnoreLabel) && (l =!= t)), x => x)).as("bad"))
      .agg(sum("bad")).as[Long].head()
    assert(badLabels == 0L)
  }

  test("xxh draws are key-derived: identical under repartitioning") {
    val a = masked.select(col("doc_id"), col("m")).collect().map(r => r.getLong(0) -> r.get(1)).toMap
    val b = docs.repartition(7).select(
        col("doc_id"),
        MaskingOps.mlmMask(col("toks"), col("doc_id"),
          maskProb = 0.25, maskToken = 999999, vocabSize = 1000,
          rng = MaskingOps.Xxh).as("m"))
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(a == b)
  }

  test("xxh MFM: masked frames zero-filled, label sentinel elsewhere, rate ~ maskProb") {
    val frames = (0 until 200).map { d =>
      (d.toLong, (0 until 16).map(f => (0 until 4).map(i => (d + f + i).toFloat)))
    }.toDF("vec_id", "frames")
    val m = frames.select(col("vec_id"),
      MaskingOps.mfmMask(col("frames"), col("vec_id"), maskProb = 0.25,
        rng = MaskingOps.Xxh).as("m"))
    val (nFrames, nMasked, badZero) = m.select(
        size(col("m.frames")).as("nf"),
        size(filter(col("m.labelIdx"), l => l =!= MaskingOps.IgnoreLabel)).as("nm"),
        // every masked frame must be all zeros
        size(filter(zip_with(col("m.frames"), col("m.labelIdx"), (f, l) => struct(f.as("f"), l.as("l"))),
          p => p.getField("l") =!= MaskingOps.IgnoreLabel &&
            exists(p.getField("f"), x => x =!= 0.0f))).as("bad"))
      .agg(sum("nf"), sum("nm"), sum("bad")).as[(Long, Long, Long)].head()
    assert(badZero == 0L)
    val rate = nMasked.toDouble / nFrames
    assert(math.abs(rate - 0.25) < 0.04, f"mask rate $rate%.3f vs 0.25")
  }
}
