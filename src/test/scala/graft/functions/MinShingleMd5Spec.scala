package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.ops.TextAnalysis

/** The fused min-shingle fingerprint must be bit-identical to the
  * composable distinct-then-hash construction (a MIN is invariant under
  * distinct, concat_ws semantics are reproduced byte-wise).
  */
class MinShingleMd5Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("fused expression is bit-identical to the composable formulation") {
    val rnd = new scala.util.Random(31)
    val vocab = (0 until 25).map(i => s"w$i")
    val docs = (0 until 300).map { i =>
      // lengths 0..24 cover the <n null branch and heavy duplicate shingles
      (i.toLong, Seq.fill(rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val both = docs.select(
      TextAnalysis.minShingleFingerprint(col("text"), 3).as("fused"),
      TextAnalysis.minShingleFingerprintComposable(col("text"), 3).as("hof"))
    assert(both.filter(
      not(col("fused") <=> col("hof"))).count() == 0)
    // both branches exercised
    assert(both.filter(col("fused").isNull).count() > 0)
    assert(both.filter(col("fused").isNotNull).count() > 0)
  }

  test("short and empty docs are null; single-shingle doc hashes that shingle") {
    val got = Seq((1L, ""), (2L, "a b"), (3L, "a b c"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.minShingleFingerprint(col("text"), 3).as("fp"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(1L) == None && got(2L) == None)
    val direct = Seq(Tuple1("a b c")).toDF("g")
      .select(graft.core.PortableHash.md5Long(col("g"))).as[Long].head()
    assert(got(3L) == Some(direct))
  }
}
