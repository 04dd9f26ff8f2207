package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Md5Long is the portable-hash contract with the DuckDB oracle: its
  * value must equal the top bits of the real RFC-1321 digest for EVERY
  * input — including across the single-block fast-path boundary at
  * 55 bytes.
  */
class Md5LongSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def expected(s: String, bits: Int): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> (64 - bits)
  }

  test("every length 0..70 matches MessageDigest (single-block path and fallback)") {
    val rnd = new scala.util.Random(5)
    for (len <- 0 to 70; rep <- 0 until 3) {
      val s = rnd.alphanumeric.take(len).mkString
      assert(Md5Long.top(UTF8String.fromString(s), 60) == expected(s, 60),
        s"mismatch at byte length $len (rep $rep)")
      assert(Md5Long.top(UTF8String.fromString(s), 48) == expected(s, 48),
        s"48-bit mismatch at byte length $len (rep $rep)")
    }
  }

  test("multi-byte UTF-8 crosses the boundary by BYTES, not chars") {
    // 20 chars × 3 bytes = 60 bytes > 55 → fallback; 18 chars = 54 → fast
    for (chars <- Seq(1, 5, 18, 19, 20, 30)) {
      val s = "中" * chars
      assert(Md5Long.top(UTF8String.fromString(s), 60) == expected(s, 60),
        s"mismatch at $chars CJK chars (${chars * 3} bytes)")
    }
  }

  test("column expression equals the conv(substr(md5)) oracle composition") {
    val rnd = new scala.util.Random(17)
    val docs = (0 until 500).map(i => (i.toLong, rnd.alphanumeric.take(rnd.nextInt(60)).mkString))
      .toDF("id", "s")
    val mismatches = docs.select(
      Md5Long.md5Long60(col("s")).as("fast"),
      expr("CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)").as("oracle"))
      .filter(col("fast") =!= col("oracle")).count()
    assert(mismatches == 0)
  }
}
