package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.PortableHash

/** Pretraining data-augmentation operators (SURVEY §2.8) — the
  * *data semantics* of the reference's MLM/MFM/ITM batch transforms,
  * reproduced as deterministic, key-seeded column algebra:
  *
  *  - MLM token masking (reference `src/pretrained_model.py:23-57`):
  *    select tokens w.p. `maskProb`; of the selected, 80% → [MASK],
  *    10% → random vocab id, 10% unchanged; labels carry the original
  *    id where selected, else -100.
  *  - MFM frame masking (reference `src/pretrained_model.py:58-76`):
  *    zero out selected frames, -100-sentinel label index elsewhere.
  *  - ITM batch shuffle (reference `src/pretrained_model.py:77-89`):
  *    within a bucket of `batch`, the first half keeps its own pair,
  *    the second half is reversed; match label = (partner == self).
  *
  * All randomness is key-derived ([[graft.core.PortableHash]]):
  * u = md5(key#position#salt)/2^60 — reproducible on any engine and
  * under any partitioning. The reference's torch RNG draws are NOT
  * bit-reproduced (different generator); the *distributional contract*
  * (probabilities, branch structure, sentinels) is what is pinned.
  */
object MaskingOps {

  val IgnoreLabel: Int = -100

  /** Key-derived RNG family: uniform-[0,1) and nonnegative-long draws
    * from (rowKey, position, seed, salt). [[Portable]] (the default) is
    * md5-based and bit-reproducible in any engine — the oracle-checked
    * family. [[Xxh]] is the production family: xxhash64, codegen'd,
    * far cheaper per draw; same distributional contract, different bits.
    */
  final case class Rng(
      uniform01: (Column, Column, Long, String) => Column,
      nonNegLong: (Column, Column, Long, String) => Column)

  /** md5-based draws, identical in Spark and DuckDB ([[PortableHash]]). */
  val Portable: Rng = Rng(
    (key, i, seed, salt) => PortableHash.uniform01(
      concat_ws("#", key.cast("string"), i.cast("string"), lit(seed.toString)), lit(salt)),
    (key, i, seed, salt) => PortableHash.md5Long(
      concat_ws("#", key.cast("string"), i.cast("string"), lit(seed.toString)), lit(salt)))

  /** xxhash64-based draws (production): top-53-bit uniform, bottom-63-bit
    * long — both key-derived, so identical under any partitioning.
    */
  val Xxh: Rng = Rng(
    (key, i, seed, salt) =>
      shiftrightunsigned(xxhash64(key, i, lit(seed), lit(salt)), 11).cast("double") /
        lit((1L << 53).toDouble),
    (key, i, seed, salt) => shiftrightunsigned(xxhash64(key, i, lit(seed), lit(salt)), 1))

  /** [[mlmMask]] with the [[Portable]] family fused into one codegen
    * pass ([[graft.functions.MlmMaskMd5]]) — bit-identical to
    * `mlmMask(toks, key, …, rng = Portable)` over `array<long>` token
    * ids (differential spec), ~3× cheaper: the HOF form walks an
    * interpreted concat/cast/divide tree per draw. Use for the md5
    * oracle surface; the production path stays `mlmMask(rng = Xxh)`.
    */
  def mlmMaskPortableFused(toks: Column, key: Column, maskProb: Double,
      maskToken: Int, vocabSize: Int, seed: Long = 0L): Column =
    graft.functions.MlmMaskMd5.mlmMaskMd5(
      toks, key.cast("string"), maskProb, maskToken, vocabSize, seed)

  /** [[mlmMask]] with the [[Xxh]] family fused
    * ([[graft.functions.MlmMaskXxh]]) — bit-identical over `array<int>`
    * ids and a LONG key (differential spec). The production ETL
    * surface (`b_pipeline_etl` / `b_mlm_mask_xxh`).
    */
  def mlmMaskXxhFused(toks: Column, key: Column, maskProb: Double,
      maskToken: Int, vocabSize: Int, seed: Long = 0L): Column =
    graft.functions.MlmMaskXxh.mlmMaskXxh(
      toks, key, maskProb, maskToken, vocabSize, seed)

  /** Per-position decision columns for MLM over a token array.
    * Returns struct(ids, labels): masked input ids and MLM labels.
    *
    * @param toks      array<int> token ids
    * @param key       row key column (e.g. doc id) seeding the draws
    * @param maskProb  selection probability (reference: 0.25)
    * @param maskToken the [MASK] id
    * @param vocabSize random-replacement draws uniform in [0, vocabSize)
    */
  def mlmMask(toks: Column, key: Column, maskProb: Double,
      maskToken: Int, vocabSize: Int, seed: Long = 0L,
      rng: Rng = Portable): Column = {
    // index via transform's (element, index) lambda, NOT
    // sequence(0, size-1): for an EMPTY array the latter is
    // sequence(0, -1) = [0, -1] (a descending sequence), which
    // zip_with pads with null tokens — two PHANTOM maskable positions
    // per empty doc (latent until the MlmMaskMd5 differential spec
    // caught it; fixtures have no empty texts).
    // The SELECTION draw is materialized in its own pass: HOF lambdas
    // re-evaluate the expression tree per REFERENCE (no codegen
    // subexpression elimination), and uSel is referenced by BOTH output
    // fields on every token — materializing halves the hashing on the
    // ~(1-maskProb) unselected majority. uSub/rand stay INSIDE the lazy
    // CaseWhen: they only evaluate for selected tokens (uSub) / the 10%
    // random-replacement branch (rand), which materializing would force
    // on every token. Value-identical for every Rng family.
    val zipped = transform(toks, (t, i) => struct(t.as("t"), i.as("i")))
    val drawn = transform(zipped, p => {
      val t = p.getField("t"); val i = p.getField("i")
      struct(t.as("t"), i.as("i"),
        rng.uniform01(key, i, seed, "sel").as("uSel"))
    })
    val decided = transform(drawn, p => {
      val t = p.getField("t"); val i = p.getField("i")
      val uSub = rng.uniform01(key, i, seed, "sub")
      val randTok = (rng.nonNegLong(key, i, seed, "rand") % vocabSize).cast("int")
      val selected = p.getField("uSel") < maskProb
      val newId = when(!selected, t)
        .when(uSub < 0.8, lit(maskToken))
        .when(uSub < 0.9, randTok)
        .otherwise(t)
      val label = when(selected, t).otherwise(lit(IgnoreLabel))
      struct(newId.as("id"), label.as("label"))
    })
    struct(
      transform(decided, d => d.getField("id")).as("ids"),
      transform(decided, d => d.getField("label")).as("labels"))
  }

  /** MFM frame masking over array<array<float>>: selected real frames
    * are zero-filled; returns struct(frames, labelIdx) where labelIdx(i)
    * = i for masked frames else -100 (the reference's label-index matrix
    * with sentinel).
    */
  def mfmMask(frames: Column, key: Column, maskProb: Double, seed: Long = 0L,
      rng: Rng = Portable): Column = {
    // index via transform's (element, index) lambda — see mlmMask for
    // why sequence(0, size-1) is wrong on empty arrays. Draw
    // materialized once per frame (HOF lambdas re-evaluate per
    // reference, and `selected` is referenced twice).
    val zipped = transform(frames, (f, i) => struct(f.as("f"), i.as("i"),
      (rng.uniform01(key, i, seed, "mfm") < maskProb).as("sel")))
    val decided = transform(zipped, p => {
      val f = p.getField("f"); val i = p.getField("i")
      val selected = p.getField("sel")
      struct(
        when(selected, transform(f, _ => lit(0.0f))).otherwise(f).as("f"),
        when(selected, i.cast("int")).otherwise(lit(IgnoreLabel)).as("li"))
    })
    struct(
      transform(decided, d => d.getField("f")).as("frames"),
      transform(decided, d => d.getField("li")).as("labelIdx"))
  }

  /** ITM partner assignment within consecutive buckets of `batch` rows
    * (by a dense 0-based position column): positions [0, batch/2) keep
    * their own row; [batch/2, batch) are reversed among themselves.
    * Returns struct(partnerPos, match).
    */
  def itmPartner(pos: Column, batch: Int): Column = {
    val b = pos.cast("long")
    val bucket = floor(b / batch)
    val p = b % batch
    val half = batch / 2
    val partnerP = when(p < half, p).otherwise(lit(batch - 1 + half) - p)
    val partner = (bucket * batch + partnerP).cast("long")
    struct(partner.as("partnerPos"), (partner === b).as("match"))
  }
}
