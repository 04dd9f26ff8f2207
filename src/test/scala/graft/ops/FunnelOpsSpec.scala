package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.core.Tables

class FunnelOpsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("funnelCounts enforces step order and first-qualifying-occurrence") {
    val events = Seq(
      // u1 completes view -> click -> buy in order
      (1L, ts(0), "view"), (1L, ts(5), "click"), (1L, ts(9), "buy"),
      // u2 clicks BEFORE viewing; the click can't count, so stalls at view
      (2L, ts(3), "click"), (2L, ts(4), "view"),
      // u3 views only
      (3L, ts(1), "view"),
      // u4 buys with no view: contributes to nothing
      (4L, ts(2), "buy"),
      // u5 same-instant view+click (ties allowed by >=), then buy
      (5L, ts(7), "view"), (5L, ts(7), "click"), (5L, ts(8), "buy")
    ).toDF("user_id", "ts", "event_type")
    val got = FunnelOps.funnelCounts(events, "user_id", "ts", "event_type",
        Seq("view", "click", "buy"))
      .select("step", "step_idx", "n_users")
      .as[(String, Int, Long)].collect().toSet
    assert(got == Set(("view", 1, 4L), ("click", 2, 2L), ("buy", 3, 2L)))
  }

  test("funnel is monotonically decreasing on the real fixture") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val got = FunnelOps.funnelCounts(events, "user_id", "ts", "event_type",
        Seq("signup", "view", "click", "purchase"))
      .orderBy("step_idx").select("n_users").as[Long].collect()
    assert(got.length == 4 && got.head > 0)
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b, s"funnel must not grow: $a -> $b") }
  }

  test("windowFunnel: anchor choice matters — a later anchor can succeed where the first fails") {
    val events = Seq(
      // u1: first view's 10-min window misses the click; the second
      // view anchors a complete chain
      (1L, ts(0), "view"), (1L, ts(40), "view"),
      (1L, ts(45), "click"), (1L, ts(49), "buy"),
      // u2: click inside the window, buy outside it
      (2L, ts(0), "view"), (2L, ts(5), "click"), (2L, ts(30), "buy"),
      // u3: click before view never counts
      (3L, ts(10), "click"), (3L, ts(12), "view")
    ).toDF("user_id", "ts", "event_type")
    val got = FunnelOps.windowFunnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "buy"), windowUs = 10L * 60 * 1000000)
      .select("step", "n_users").as[(String, Long)].collect().toMap
    assert(got == Map("view" -> 3L, "click" -> 2L, "buy" -> 1L))
  }

  test("windowFunnel matches a brute-force fold on random event streams") {
    val rnd = new scala.util.Random(21)
    val types = Vector("a", "b", "c")
    val rows = for (u <- 0L until 40L; _ <- 0 until 30) yield
      (u, ts(rnd.nextInt(600)), types(rnd.nextInt(3)))
    val events = rows.toDF("user_id", "ts", "event_type")
    val w = 90L * 60 * 1000000 // 90 min

    def brute(evs: Seq[(Long, Long)]): Int = { // (tsUs, stepIdx) per user -> level
      val byStep = (0 until 3).map(i => evs.filter(_._2 == i).map(_._1).sorted)
      def reach(level: Int): Boolean = byStep(0).exists { t1 =>
        var c = t1
        var ok = true
        for (k <- 1 to level if ok)
          byStep(k).find(t => t >= c && t < t1 + w) match {
            case Some(t) => c = t
            case None => ok = false
          }
        ok
      }
      if (byStep(0).isEmpty) 0 else (2 to 0 by -1).find(reach).map(_ + 1).getOrElse(0)
    }
    val perUser = rows.groupBy(_._1).map { case (u, es) =>
      u -> brute(es.map(e => (e._2.getTime * 1000L, types.indexOf(e._3))))
    }
    val want = (1 to 3).map(l => l.toLong -> perUser.values.count(_ >= l).toLong).toMap

    val got = FunnelOps.windowFunnel(events, "user_id", "ts", "event_type",
        Seq("a", "b", "c"), w)
      .select("step_idx", "n_users").as[(Int, Long)].collect()
      .map { case (i, n) => i.toLong -> n }.toMap
    assert(got == want, s"windowFunnel $got != brute $want")
  }

  test("windowFunnel: 4-step funnel matches brute force across seeds") {
    val types = Vector("a", "b", "c", "d")
    for (seed <- Seq(3, 9)) {
      val rnd = new scala.util.Random(seed)
      val rows = for (u <- 0L until 30L; _ <- 0 until 24) yield
        (u, ts(rnd.nextInt(400)), types(rnd.nextInt(4)))
      val events = rows.toDF("user_id", "ts", "event_type")
      val w = 60L * 60 * 1000000 // 60 min

      def brute(evs: Seq[(Long, Int)]): Int = {
        val byStep = (0 until 4).map(i => evs.filter(_._2 == i).map(_._1).sorted)
        def reach(level: Int): Boolean = byStep(0).exists { t1 =>
          var c = t1; var ok = true
          for (k <- 1 to level if ok)
            byStep(k).find(t => t >= c && t < t1 + w) match {
              case Some(t) => c = t
              case None => ok = false
            }
          ok
        }
        if (byStep(0).isEmpty) 0 else (3 to 0 by -1).find(reach).map(_ + 1).getOrElse(0)
      }
      val perUser = rows.groupBy(_._1).map { case (u, es) =>
        u -> brute(es.map(e => (e._2.getTime * 1000L, types.indexOf(e._3))))
      }
      val want = (1 to 4).map(l => l -> perUser.values.count(_ >= l).toLong).toMap
      val got = FunnelOps.windowFunnel(events, "user_id", "ts", "event_type",
          Seq("a", "b", "c", "d"), w)
        .select("step_idx", "n_users").as[(Int, Long)].collect().toMap
      assert(got == want, s"seed $seed: $got != $want")
    }
  }

  test("cross-operator invariant: windowFunnel never exceeds the unbounded funnel per level") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val steps = Seq("view", "click", "purchase")
    val unbounded = FunnelOps.funnelCounts(events, "user_id", "ts", "event_type", steps)
      .select("step_idx", "n_users").as[(Int, Long)].collect().toMap
    val windowed = FunnelOps.windowFunnel(events, "user_id", "ts", "event_type",
        steps, windowUs = 6L * 3600 * 1000000)
      .select("step_idx", "n_users").as[(Int, Long)].collect().toMap
    steps.indices.foreach { i =>
      assert(windowed(i + 1) <= unbounded(i + 1),
        s"level ${i + 1}: window-constrained ${windowed(i + 1)} > unbounded ${unbounded(i + 1)}")
    }
    // level 1 is identical by definition (any anchor counts)
    assert(windowed(1) == unbounded(1))
  }

  test("cohortRetention matches an independent fold on random events") {
    val rnd = new scala.util.Random(31)
    val day = 86400L
    val rows = for (u <- 0L until 60L; _ <- 0 until 15) yield
      (u, new Timestamp(rnd.nextInt(20 * day.toInt).toLong * 1000L))
    val got = FunnelOps.cohortRetention(
        rows.toDF("user_id", "ts"), "user_id", "ts", day)
      .as[(Long, Long, Long)].collect().toSet
    val bucket = (t: Timestamp) => t.getTime / (day * 1000L)
    val firstSeen = rows.groupBy(_._1).view.mapValues(es => es.map(e => bucket(e._2)).min)
    val want = rows.map { case (u, t) => (firstSeen(u), bucket(t), u) }
      .groupBy(r => (r._1, r._2))
      .map { case ((c, b), rs) => (c, b - c, rs.map(_._3).distinct.size.toLong) }.toSet
    assert(got == want)
  }

  test("cohortRetention: hand-checked grid, period 0 counts whole cohort") {
    val day = 86400L
    def dts(d: Long, min: Long) = new Timestamp(d * day * 1000L + min * 60000L)
    val events = Seq(
      (1L, dts(0, 10)), (1L, dts(0, 50)), (1L, dts(2, 0)), // cohort 0, active d0,d2
      (2L, dts(0, 30)), (2L, dts(1, 0)),                   // cohort 0, active d0,d1
      (3L, dts(1, 5))                                      // cohort 1, active d1
    ).toDF("user_id", "ts")
    val got = FunnelOps.cohortRetention(events, "user_id", "ts", day)
      .as[(Long, Long, Long)].collect().toSet
    // buckets are epoch-aligned: day d -> cohort/bucket index d (1970 epoch)
    assert(got == Set(
      (0L, 0L, 2L), // cohort d0: both users active on day 0
      (0L, 1L, 1L), // u2 on day 1
      (0L, 2L, 1L), // u1 on day 2
      (1L, 0L, 1L)  // cohort d1: u3
    ))
  }

  test("cohortRetention on the fixture: period-0 row equals cohort size; no negative periods") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val grid = FunnelOps.cohortRetention(events, "user_id", "ts", 604800L)
    val rows = grid.as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall(_._2 >= 0), "period must be >= 0")
    val cohortSizes = events.groupBy("user_id").agg(min("ts").as("f"))
      .select(floor(unix_micros(col("f")) / (604800L * 1000000L)).as("cohort"))
      .groupBy("cohort").count().as[(Long, Long)].collect().toMap
    rows.filter(_._2 == 0L).foreach { case (c, _, n) =>
      assert(n == cohortSizes(c), s"cohort $c period-0 $n != size ${cohortSizes(c)}")
    }
    // retention never exceeds the cohort size at any period
    rows.foreach { case (c, _, n) => assert(n <= cohortSizes(c)) }
  }

  test("cohortLtv: revenue per age cell, cumulative per-user LTV, zero ages") {
    import java.sql.Timestamp
    def ts(week: Int, off: Int = 0) =
      new Timestamp((week * 604800L + off) * 1000L)
    // cohort 0: users 1,2. week0: u1 buys 10; week1: u2 buys 20, u1
    // views (activity, no revenue); week2: u1 buys 5.
    // cohort 1: user 3, buys 8 in its week 0.
    val ev = Seq(
      (1L, ts(0), 1L, "purchase", 10.0, "{}"),
      (2L, ts(0, 60), 2L, "view", 0.0, "{}"),
      (3L, ts(1), 2L, "purchase", 20.0, "{}"),
      (4L, ts(1, 60), 1L, "view", 0.0, "{}"),
      (5L, ts(2), 1L, "purchase", 5.0, "{}"),
      (6L, ts(1, 120), 3L, "purchase", 8.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = FunnelOps.cohortLtv(ev, "user_id", "ts", "value",
        "purchase", "event_type", bucketSeconds = 604800L)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got((0L, 0L)) == ((2L, 10.0, 5.0)), "week-0 LTV = 10/2")
    assert(got((0L, 1L)) == ((2L, 20.0, 15.0)), "cumulative 30/2")
    assert(got((0L, 2L)) == ((2L, 5.0, 17.5)), "cumulative 35/2")
    assert(got((1L, 0L)) == ((1L, 8.0, 8.0)))
    assert(got.size == 4, "only active (cohort, age) cells appear")
    val re = FunnelOps.cohortLtv(ev.repartition(5), "user_id", "ts",
        "value", "purchase", "event_type", 604800L)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(re == got)
  }
}
