package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Curation-stage contracts: decontamination flags exactly the train
  * docs sharing an n-gram with the eval set, the decision path drops
  * exactly those, and the eval gram set arrives by broadcast (the
  * 100 TB plan shape).
  */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val train = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs"),     // clean
    (3L, "sphinx of black quartz judge my vow today"),   // clean
    (4L, "a quick brown fox ran far away yesterday"),    // shares "quick brown fox"
    (5L, "xx yy")                                        // shorter than n: never flagged
  ).toDF("doc_id", "text")

  private val evalSet = Seq(
    (100L, "benchmark asks about the quick brown fox story"),
    (101L, "totally unrelated benchmark question here")
  ).toDF("doc_id", "text")

  test("contaminatedIds flags exactly the overlapping train docs") {
    val ids = CurationOps.contaminatedIds(train, evalSet, "text", "doc_id", n = 3)
      .as[Long].collect().toSet
    assert(ids == Set(1L, 4L))
  }

  test("decontaminate keeps the complement with schema unchanged") {
    val kept = CurationOps.decontaminate(train, evalSet, "text", "doc_id", n = 3)
    assert(kept.columns.toSeq == train.columns.toSeq)
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(2L, 3L, 5L))
  }

  test("a doc is flagged only for full n-gram matches, not shared words") {
    // shares words "quick" and "fox" but no 3-gram
    val t = Seq((9L, "fox saw a quick result")).toDF("doc_id", "text")
    assert(CurationOps.contaminatedIds(t, evalSet, "text", "doc_id", 3).count() == 0L)
  }

  test("eval gram set joins by broadcast; no text attribute crosses an exchange") {
    val plan = CurationOps.decontaminate(train, evalSet, "text", "doc_id", 3)
      .queryExecution.executedPlan
    val asText = plan.toString
    assert(asText.contains("BroadcastExchange"),
      s"expected broadcast of the eval gram set in:\n$asText")
    // every shuffle in the plan carries only ids/hashes, never strings
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    shuffles.foreach { s =>
      s.child.output.foreach { attr =>
        assert(!attr.dataType.typeName.contains("string"),
          s"string attribute ${attr.name} crosses a shuffle:\n$asText")
      }
    }
  }

  test("spanList: non-overlapping m-token chunks, short tail kept, empty-safe") {
    val got = Seq("a b c d e f g", "a b", "").toDF("text")
      .select(CurationOps.spanList(col("text"), 3).as("s"))
      .as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("a b c", "d e f", "g"))
    assert(got(1) == Seq("a b"))
    assert(got(2) == Seq())
  }

  test("scrubFrequentSpans removes exactly the corpus-frequent spans, in-place") {
    val docs = Seq(
      (1L, "spam spam spam alpha beta gamma"),
      (2L, "spam spam spam delta epsilon zeta"),
      (3L, "spam spam spam eta theta iota"),
      (4L, "unique words only here today now")
    ).toDF("doc_id", "text")
    val out = CurationOps.scrubFrequentSpans(docs, "text", m = 3, minCount = 3)
      .orderBy("doc_id").select("text").as[String].collect().toSeq
    assert(out == Seq("alpha beta gamma", "delta epsilon zeta",
      "eta theta iota", "unique words only here today now"))
  }

  test("scrubFrequentSpans with nothing frequent is the identity (incl. row count)") {
    val docs = Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
    val out = CurationOps.scrubFrequentSpans(docs, "text", 3, minCount = 2)
    assert(out.orderBy("doc_id").select("text").as[String].collect().toSeq ==
      Seq("a b c", "d e f"))
  }

  test("a doc whose every span is frequent survives with empty text") {
    val docs = Seq(
      (1L, "x y z"), (2L, "x y z"), (3L, "x y z w w w")).toDF("doc_id", "text")
    val out = CurationOps.scrubFrequentSpans(docs, "text", 3, minCount = 3)
      .orderBy("doc_id").select("text").as[String].collect().toSeq
    assert(out == Seq("", "", "w w w"))
  }

  test("scrub plan: span counting shuffles longs only; frequent set broadcasts") {
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val plan = CurationOps.scrubFrequentSpans(docs, "text", 3, 2)
      .queryExecution.executedPlan
    assert(plan.toString.contains("BroadcastExchange"))
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    plan.collect { case s: ShuffleExchangeExec => s }.foreach { s =>
      s.child.output.foreach { attr =>
        assert(!attr.dataType.typeName.contains("string"),
          s"string attribute ${attr.name} crosses a shuffle:\n$plan")
      }
    }
  }

  test("scrubPii redacts emails, IPv4 and phone formats; clean text unchanged") {
    val got = Seq(
      "contact jane.doe+spam@sub.example.co.uk for details",
      "server at 192.168.1.254 timed out",
      "call 415-555-0199 or (415) 555-0199 or +1 415.555.0199",
      "version 1.2 costs 3.50 and pi is 3.14159",   // no false positives
      "plain text with no pii at all"
    ).toDF("text").select(CurationOps.scrubPii(col("text")).as("t"))
      .as[String].collect().toSeq
    assert(got(0) == "contact <EMAIL> for details")
    assert(got(1) == "server at <IP> timed out")
    assert(got(2) == "call <PHONE> or <PHONE> or <PHONE>")
    assert(got(3) == "version 1.2 costs 3.50 and pi is 3.14159")
    assert(got(4) == "plain text with no pii at all")
  }

  test("gramKey is pluggable: portable md5 family matches xxhash64 decisions") {
    val a = CurationOps.contaminatedIds(train, evalSet, "text", "doc_id", 3)
      .as[Long].collect().toSet
    val b = CurationOps.contaminatedIds(train, evalSet, "text", "doc_id", 3,
        gramKey = graft.core.PortableHash.md5Long).as[Long].collect().toSet
    assert(a == b)
  }
}
