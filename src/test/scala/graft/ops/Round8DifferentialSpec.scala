package graft.ops

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Randomized DIFFERENTIAL specs for the round-8 operators: each op is
  * checked against an independent, obviously-correct in-memory
  * reference on seeded random inputs — the cheap exactness proof that
  * hand cases can't give (they only pin the shapes someone thought
  * of). Seeds are fixed, so failures reproduce.
  */
class Round8DifferentialSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("KMinDistinct == sorted-distinct-take-k on random multisets") {
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val k = Seq(2, 7, 32, 64, 256)(trial - 1)
      val xs = Seq.fill(2000)(rnd.nextLong() % 500) // heavy duplication
      val want = xs.distinct.sorted.take(k)
      val got = xs.toDF("h")
        .agg(graft.functions.KMinDistinct.kMinUdaf(k)(col("h")))
        .as[Seq[Long]].collect().head
      assert(got == want, s"trial $trial (k=$k)")
    }
  }

  test("weightedQuantile == brute-force cumulative scan on random data") {
    val rnd = new Random(7)
    val rows = Seq.fill(400)((s"g${rnd.nextInt(3)}",
      rnd.nextInt(20).toDouble, (rnd.nextInt(5) + 1).toDouble))
    def ref(q: Double): Map[String, Double] =
      rows.groupBy(_._1).map { case (g, rs) =>
        val byV = rs.sortBy(_._2)
        val tot = rs.map(_._3).sum
        var cum = 0.0
        // RANGE semantics: all ties accumulate before the comparison
        val grouped = byV.groupBy(_._2).toSeq.sortBy(_._1)
        var ans = Double.NaN
        grouped.foreach { case (v, ties) =>
          cum += ties.map(_._3).sum
          if (ans.isNaN && cum >= q * tot) ans = v
        }
        g -> ans
      }
    for (q <- Seq(0.25, 0.5, 0.9)) {
      val got = StatsOps.weightedQuantile(
          rows.toDF("g", "v", "w"), "g", "v", "w", q)
        .select("g", "weighted_quantile").as[(String, Double)]
        .collect().toMap
      assert(got == ref(q), s"q=$q")
    }
  }

  test("resampleInterpolate == pointwise scala lerp on random series") {
    val rnd = new Random(13)
    val obs = (1 to 3).flatMap { key =>
      val times = (Seq.fill(25)(rnd.nextInt(1000).toLong)).distinct.sorted
      times.map(t => (s"k$key", new java.sql.Timestamp(t * 1000L),
        rnd.nextInt(100).toDouble))
    }
    val step = 50L
    val got = TrendOps.resampleInterpolate(
        obs.toDF("k", "ts", "v"), "k", "ts", "v", step)
      .select(col("k"), unix_seconds(col("grid_ts")), col("value"))
      .as[(String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val want = obs.groupBy(_._1).flatMap { case (k, rs) =>
      val pts = rs.map(r => (r._2.getTime / 1000L, r._3)).sortBy(_._1)
      val (mn, mx) = (pts.head._1, pts.last._1)
      (mn - mn % step to mx - mx % step by step).filter(_ >= mn).map { g =>
        val prev = pts.filter(_._1 <= g).last
        val v = if (prev._1 == g) prev._2
        else {
          val next = pts.find(_._1 > g).get
          prev._2 + (next._2 - prev._2) *
            (g - prev._1).toDouble / (next._1 - prev._1).toDouble
        }
        (k, g) -> v
      }
    }
    assert(got.keySet == want.keySet)
    want.foreach { case (kg, v) =>
      assert(math.abs(got(kg) - v) < 1e-9, s"$kg: ${got(kg)} vs $v") }
  }

  test("markov hitProb truncation converges to the exact absorbing solve") {
    // random 3-channel chain, dense enough to converge well before 8
    // steps is NOT guaranteed — so compare the 64-step truncation (op
    // run with steps=64) to a long-truncation reference, and check
    // monotone convergence from below as steps grow
    val rnd = new Random(21)
    val ev = (1L to 40L).flatMap { u =>
      var t = 0
      val n = 3 + rnd.nextInt(6)
      (0 until n).map { i =>
        t += 1 + rnd.nextInt(3)
        val tpe = if (i == n - 1 && rnd.nextBoolean()) "purchase"
        else Seq("view", "click", "share")(rnd.nextInt(3))
        (u * 1000 + i, new java.sql.Timestamp((86400L + t * 60L) * 1000L),
          u, tpe, 1.0, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val chans = Seq("view", "click", "share")
    def pFull(steps: Int): Double =
      AttributionOps.markovRemovalEffects(ev, chans, "purchase", steps)
        .select("p_full").as[Double].collect().head
    val p8 = pFull(8)
    val p16 = pFull(16)
    val p64 = pFull(64)
    val p256 = pFull(256)
    assert(p8 <= p16 + 1e-12 && p16 <= p64 + 1e-12 && p64 <= p256 + 1e-12,
      "k-step hit probability is monotone in k")
    // geometric convergence: each quadrupling of steps shrinks the
    // remaining gap (the chain's recurrent mass decays per step)
    assert(p256 - p64 < (p64 - p16) / 2 + 1e-12,
      s"gaps ${p64 - p16} -> ${p256 - p64} do not contract")
    assert(p256 - p64 < 1e-4,
      s"64 vs 256 steps differ by ${p256 - p64}: not converging")
  }
}
