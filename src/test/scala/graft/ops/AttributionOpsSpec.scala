package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class AttributionOpsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def ts(min: Long) = new Timestamp((86400 + min * 60) * 1000L)

  // user 1: view(0), click(10), view(20) then purchase(25); an old
  // view(-120min rel.) outside the 30min horizon; user 2: purchase
  // with no touches (unattributed); user 3: single view then purchase
  private lazy val events = Seq(
    (1L, ts(-120), 1L, "view", 0.0, "{}"),
    (10L, ts(0), 1L, "view", 0.0, "{}"),
    (11L, ts(10), 1L, "click", 0.0, "{}"),
    (12L, ts(20), 1L, "view", 0.0, "{}"),
    (13L, ts(25), 1L, "purchase", 9.0, "{}"),
    (20L, ts(5), 2L, "purchase", 5.0, "{}"),
    (30L, ts(0), 3L, "view", 0.0, "{}"),
    (31L, ts(15), 3L, "purchase", 7.0, "{}")
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("touchCredits: horizon filter, position models, degenerate paths") {
    val got = AttributionOps.touchCredits(
        events, Seq("view", "click"), "purchase", horizonSec = 1800L)
      .select("conv_id", "touch_id", "pos", "n_touches",
        "credit_linear", "credit_first", "credit_last", "credit_position")
      .as[(Long, Long, Int, Long, Double, Double, Double, Double)]
      .collect().sortBy(r => (r._1, r._3))
    val byConv = got.groupBy(_._1)
    assert(!byConv.contains(20L), "conversion without touches is absent")
    assert(!got.exists(_._2 == 1L), "touch outside the horizon is excluded")
    val u1 = byConv(13L)
    assert(u1.map(_._2).toSeq == Seq(10L, 11L, 12L), "ordered by touch_ts")
    assert(u1.map(_._5).forall(c => math.abs(c - 1.0 / 3) < 1e-12))
    assert(u1.map(_._6).toSeq == Seq(1.0, 0.0, 0.0), "first-touch")
    assert(u1.map(_._7).toSeq == Seq(0.0, 0.0, 1.0), "last-touch")
    assert(u1.map(_._8).toSeq == Seq(0.4, 0.2, 0.4), "U-shaped 40/20/40")
    val u3 = byConv(31L)
    assert(u3.length == 1 && u3.head._8 == 1.0 && u3.head._5 == 1.0,
      "single-touch path gets full credit under every model")
  }

  test("channelAttribution: every model's total equals attributed conversions") {
    val credits = AttributionOps.touchCredits(
      events, Seq("view", "click"), "purchase", horizonSec = 1800L)
    val roll = AttributionOps.channelAttribution(credits)
      .as[(String, Long, Double, Double, Double, Double)].collect()
    val attributedConvs = 2.0 // conv 13 and 31
    Seq(3, 4, 5, 6).foreach { i =>
      val tot = roll.map(r => i match {
        case 3 => r._3; case 4 => r._4; case 5 => r._5; case _ => r._6
      }).sum
      // round(.,9) quantizes each credit, so a 3-touch path sums to
      // 0.999999999 — allow the quantization, not real drift
      assert(math.abs(tot - attributedConvs) < 1e-7,
        s"model column $i total $tot != $attributedConvs")
    }
    val byChan = roll.map(r => r._1 -> r._2).toMap
    assert(byChan == Map("view" -> 3L, "click" -> 1L))
  }

  test("transitionProbs: journeys split at conversions; probs normalize") {
    // user 1: view -> click -> purchase | view -> (data ends)
    // user 2: purchase (no touches) | view -> (data ends)
    val ev = Seq(
      (1L, ts(0), 1L, "view", 0.0, "{}"),
      (2L, ts(1), 1L, "click", 0.0, "{}"),
      (3L, ts(2), 1L, "purchase", 1.0, "{}"),
      (4L, ts(3), 1L, "view", 0.0, "{}"),
      (10L, ts(0), 2L, "purchase", 1.0, "{}"),
      (11L, ts(1), 2L, "view", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = AttributionOps.transitionProbs(ev, Seq("view", "click"), "purchase")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got(("START", "view"))._1 == 3L) // j1a, j1b, j2b
    assert(got(("START", "CONV"))._1 == 1L) // user2 j0: conv, no touches
    assert(got(("view", "click"))._1 == 1L)
    assert(got(("click", "CONV"))._1 == 1L)
    assert(got(("view", "NULL"))._1 == 2L) // both trailing views
    // normalization per src
    val bySrc = got.toSeq.groupBy(_._1._1)
    bySrc.foreach { case (src, rows) =>
      val tot = rows.map(_._2._2).sum
      assert(math.abs(tot - 1.0) < 1e-12, s"$src probs sum to $tot")
    }
  }

  test("markovRemovalEffects: hand-solvable chain gives exact removal effects") {
    // Every journey: START -> view -> click -> CONV or START -> view -> NULL.
    // 2 conv journeys, 2 null journeys (per user pattern), so
    // p(view|START)=1, p(click|view)=.5, p(NULL|view)=.5, p(CONV|click)=1.
    // Full chain: p(CONV from START) = 0.5 (within >= 3 steps).
    // Remove view: START has no outgoing left except... all journeys
    // redirect to NULL -> p=0 -> RE(view)=1. Remove click: view's click
    // mass redirects to NULL -> p=0 -> RE(click)=1.
    val ev = (for (u <- 1L to 2L) yield Seq(
      (u * 100 + 1, ts(0), u, "view", 0.0, "{}"),
      (u * 100 + 2, ts(1), u, "click", 0.0, "{}"),
      (u * 100 + 3, ts(2), u, "purchase", 1.0, "{}"),
      (u * 100 + 4, ts(3), u, "view", 0.0, "{}")
    )).flatten.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = AttributionOps.markovRemovalEffects(
        ev, Seq("view", "click"), "purchase", steps = 8)
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(math.abs(got("view")._1 - 0.5) < 1e-12, "p_full = 0.5")
    assert(got("view")._2 == 0.0 && got("view")._3 == 1.0)
    assert(got("click")._2 == 0.0 && got("click")._3 == 1.0)
  }

  test("touchCredits pair set equals the streaming attribution join on batch") {
    val viaStreamOp = graft.streaming.StreamingOps.streamingAttribution(
        events, "view", "purchase", horizonSec = 1800L, watermark = "1 hour")
      .select("touch_id", "conv_id").as[(Long, Long)].collect().toSet
    val viaCredits = AttributionOps.touchCredits(
        events, Seq("view"), "purchase", horizonSec = 1800L)
      .select("touch_id", "conv_id").as[(Long, Long)].collect().toSet
    assert(viaCredits == viaStreamOp,
      "batch credit base and streaming join emit the same pairs")
  }
}
