package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.ops.{DedupOps, TextOps}

/** Differential spec: the fused shingle-hash set must be bit-identical
  * to the composable `hashedNgramSet` column form it replaces in
  * [[DedupOps.dedupKeepersNgram]].
  */
class ShingleHashes64Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b a b a b a b",                   // duplicate shingles
    "one two",                           // exactly n for n=2, below for n=3
    "solo",
    "",
    "  spaced   out   tokens  here ",
    "punct, heavy! text? with. marks;")

  private def fused(n: Int): Seq[Seq[Long]] =
    texts.toDF("t")
      .select(ShingleHashes64.shingleHashes64(
        TextOps.whitespaceTokenize(col("t")), n).as("h"))
      .as[Seq[Long]].collect().toSeq

  private def composable(n: Int): Seq[Seq[Long]] =
    texts.toDF("t")
      .select(DedupOps.hashedNgramSet(col("t"), n).as("h"))
      .as[Seq[Long]].collect().toSeq

  test("bit-identical to the composable hashedNgramSet for n = 1, 2, 3, 5") {
    for (n <- Seq(1, 2, 3, 5))
      assert(fused(n) == composable(n), s"mismatch at n=$n")
  }

  test("n = 1 equals the token-set representation (hashedTokenSet)") {
    val viaTokens = texts.toDF("t")
      .select(DedupOps.hashedTokenSet(col("t")).as("h"))
      .as[Seq[Long]].collect().toSeq
    assert(fused(1) == viaTokens)
  }

  test("fewer than n tokens yields an empty set; null input is null") {
    assert(fused(3)(3).isEmpty) // "solo"
    assert(fused(2)(4).isEmpty) // ""
    val got = Seq(Option.empty[String]).toDF("t")
      .select(ShingleHashes64.shingleHashes64(
        TextOps.whitespaceTokenize(col("t")), 2)).collect()
    assert(got.head.isNullAt(0))
  }
}
