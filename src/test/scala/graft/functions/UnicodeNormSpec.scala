package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class UnicodeNormSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def run(s: String): (String, String) =
    Seq(s).toDF("s")
      .select(UnicodeNorm.nfcNormalize(col("s")),
        UnicodeNorm.stripAccentsCol(col("s")))
      .as[(String, String)].collect().head

  test("NFC composes decomposed sequences; identity on composed/ASCII") {
    assert(run("café")._1 == "café", "e+combining acute composes")
    assert(run("café")._1 == "café")
    assert(run("plain ascii")._1 == "plain ascii")
  }

  test("stripAccents drops Mn marks and recomposes the residue") {
    // golden values probed from DuckDB strip_accents
    assert(run("café")._2 == "cafe")
    assert(run("café")._2 == "cafe")
    assert(run("Ångström")._2 == "Angstrom")
    assert(run("ḉệ")._2 == "ce", "multi-mark letters strip fully")
    assert(run("é̂")._2 == "e", "stacked marks all drop")
    // Hangul: NFD decomposes to Jamo (category Lo, kept) and must
    // RECOMPOSE on the way out — the case that distinguishes
    // NFC(drop(NFD)) from drop(NFD)
    assert(run("\ud55c\uad6d")._2 == "\ud55c\uad6d")
    // compatibility forms deliberately untouched (no NFKC):
    // fullwidth ABC and halfwidth katakana pass through
    assert(run("\uff21\uff22\uff23")._2 == "\uff21\uff22\uff23")
    assert(run("\uff76\uff80")._2 == "\uff76\uff80")
  }

  test("null propagates; empty is identity") {
    val n = Seq(Option.empty[String]).toDF("s")
      .select(UnicodeNorm.nfcNormalize(col("s"))).collect().head
    assert(n.isNullAt(0))
    assert(run("") == (("", "")))
  }
}
