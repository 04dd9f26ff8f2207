package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class TrendIslandsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("islands collapses consecutive equal values, including null runs") {
    val df = Seq(
      (1L, 1L, ts(0), Some("a")), (1L, 2L, ts(1), Some("a")),
      (1L, 3L, ts(2), Some("b")),
      (1L, 4L, ts(3), None), (1L, 5L, ts(4), None),
      (1L, 6L, ts(5), Some("a")),
      (2L, 7L, ts(0), Some("x"))
    ).toDF("user_id", "event_id", "ts", "v")
    val got = SessionOps.islands(df, "user_id", "ts", "v")
      .select("user_id", "island_id", "v", "n")
      .as[(Long, Long, Option[String], Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, Some("a"), 2L), (1L, 2L, Some("b"), 1L),
      (1L, 3L, None, 2L), (1L, 4L, Some("a"), 1L),
      (2L, 1L, Some("x"), 1L)))
  }

  test("islands: start/end carry the run's order bounds") {
    val df = Seq(
      (1L, 1L, ts(10), "a"), (1L, 2L, ts(20), "a"), (1L, 3L, ts(30), "b")
    ).toDF("user_id", "event_id", "ts", "v")
    val got = SessionOps.islands(df, "user_id", "ts", "v")
      .select("island_id", "start_ts", "end_ts")
      .as[(Long, Timestamp, Timestamp)].collect()
      .map { case (k, s, e) => k -> ((s.getTime, e.getTime)) }.toMap
    assert(got(1L) == ((ts(10).getTime, ts(20).getTime)))
    assert(got(2L) == ((ts(30).getTime, ts(30).getTime)))
  }

  test("rollingZScore: current point excluded, minPoints and zero-variance guard") {
    import org.apache.spark.sql.types.DecimalType
    val daily = Seq((0L, 10.0), (1L, 10.0), (2L, 10.0), (3L, 22.0), (4L, 10.0))
      .toDF("day", "v")
      .select(col("day"), col("v").cast(DecimalType(19, 6)).as("v"))
    val got = TrendOps.rollingZScore(daily, "day", "v", window = 7, minPoints = 3)
      .select("day", "n_prev", "z")
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(0L) == ((0L, None)), "no history -> null z")
    assert(got(2L) == ((2L, None)), "below minPoints -> null z")
    // day 3: trailing {10,10,10} has zero variance -> null despite n>=3
    assert(got(3L) == ((3L, None)))
    // day 4: trailing {10,10,10,22}: mean 13, var 27, z = (10-13)/sqrt(27)
    val (n4, z4) = got(4L)
    assert(n4 == 4L && z4.isDefined)
    assert(math.abs(z4.get - (10.0 - 13.0) / math.sqrt(27.0)) < 1e-12)
  }

  test("islands matches an independent fold on random sequences") {
    val rnd = new scala.util.Random(17)
    val rows = for (u <- 0L until 25L; i <- 0 until 40) yield
      (u, u * 1000 + i, ts(i), if (rnd.nextBoolean()) "a" else "b")
    val got = SessionOps.islands(
        rows.toDF("user_id", "event_id", "ts", "v"), "user_id", "ts", "v")
      .select("user_id", "island_id", "v", "n")
      .as[(Long, Long, String, Long)].collect().toSet
    val want = rows.groupBy(_._1).flatMap { case (u, es) =>
      val ordered = es.sortBy(e => (e._3.getTime, e._2)).map(_._4)
      val runs = ordered.foldLeft(List.empty[(String, Long)]) {
        case ((v, n) :: tail, x) if v == x => (v, n + 1) :: tail
        case (acc, x) => (x, 1L) :: acc
      }.reverse
      runs.zipWithIndex.map { case ((v, n), i) => (u, i + 1L, v, n) }
    }.toSet
    assert(got == want)
  }

  test("transitionMatrix: hand-checked counts and row-stochastic probabilities") {
    val df = Seq(
      (1L, 1L, ts(0), "a"), (1L, 2L, ts(1), "b"), (1L, 3L, ts(2), "a"),
      (1L, 4L, ts(3), "a"),
      (2L, 5L, ts(0), "a"), (2L, 6L, ts(1), "b")
    ).toDF("user_id", "event_id", "ts", "v")
    val got = SessionOps.transitionMatrix(df, "user_id", "ts", "v")
      .select("from_v", "to_v", "n", "p")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // u1: a->b, b->a, a->a; u2: a->b  =>  from a: {b:2, a:1}; from b: {a:1}
    assert(got(("a", "b")) == ((2L, 2.0 / 3.0)))
    assert(got(("a", "a")) == ((1L, 1.0 / 3.0)))
    assert(got(("b", "a")) == ((1L, 1.0)))
    assert(got.size == 3, "sequences never cross user boundaries")
    // rows of the matrix sum to 1
    got.groupBy(_._1._1).foreach { case (_, rows) =>
      assert(math.abs(rows.values.map(_._2).sum - 1.0) < 1e-12)
    }
  }

  test("invertedIndex: sorted postings, df cap, in-doc dups count once") {
    val df = Seq(
      (3L, "x y x"), (1L, "x z"), (2L, "x")
    ).toDF("doc_id", "text")
    val got = SearchOps.invertedIndex(df, "text", "doc_id")
      .as[(String, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("x") == ((3L, "1,2,3")), "postings sorted; doc-3 dup counted once")
    assert(got("y") == ((1L, "3")) && got("z") == ((1L, "1")))
    val capped = SearchOps.invertedIndex(df, "text", "doc_id", maxDf = 2)
      .as[(String, Long, String)].collect().map(_._1).toSet
    assert(capped == Set("y", "z"), "stop-word-grade tokens dropped by maxDf")
  }

  test("twap weights by duration-until-next; last observation dropped") {
    val df = Seq(
      // u1: value 10 held 3 min, value 40 held 1 min -> twap 17.5
      (1L, 1L, ts(0), 10.0), (1L, 2L, ts(3), 40.0), (1L, 3L, ts(4), 99.0),
      // u2: single observation -> no duration, no output row
      (2L, 4L, ts(0), 5.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val got = TrendOps.twap(df, "user_id", "ts", "value")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == Set(1L))
    assert(got(1L) == (((10.0 * 3 + 40.0 * 1) / 4.0, 2L)))
  }

  test("eventSequence orders by (order, tiebreak) within each key") {
    val df = Seq(
      (1L, 2L, ts(1), "b"), (1L, 1L, ts(0), "a"), (1L, 3L, ts(1), "c"),
      (2L, 4L, ts(5), "z")
    ).toDF("user_id", "event_id", "ts", "v")
    val got = SessionOps.eventSequence(df, "user_id", "ts", col("v"))
      .as[(Long, String)].collect().toMap
    // same-ts events (ids 2,3) break ties on event_id: b before c
    assert(got == Map(1L -> "abc", 2L -> "z"))
  }

  test("rollingAgg: hand-checked trailing window with a gap in the axis") {
    import org.apache.spark.sql.types.DecimalType
    val daily = Seq((0L, 10.0), (1L, 20.0), (2L, 30.0), (5L, 60.0))
      .toDF("day", "v")
      .select(col("day"), col("v").cast(DecimalType(19, 6)).as("v"))
    val got = TrendOps.rollingAgg(daily, "day", "v", window = 3)
      .select("day", "roll_sum", "roll_avg", "n_terms")
      .as[(Long, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0L) == ((0L, 10.0, 10.0, 1L)))
    assert(got(1L) == ((1L, 30.0, 15.0, 2L)))
    assert(got(2L) == ((2L, 60.0, 20.0, 3L)))
    // day 5: days 3-4 are absent — only day 5 contributes
    assert(got(5L) == ((5L, 60.0, 60.0, 1L)))
    assert(got.size == 4, "only real axis points are emitted")
  }

  test("rollingAgg / rollingZScore abort on a duplicated axis point (ADVICE r6)") {
    import org.apache.spark.sql.types.DecimalType
    val dup = Seq((0L, 10.0), (1L, 20.0), (1L, 25.0), (2L, 30.0))
      .toDF("day", "v")
      .select(col("day"), col("v").cast(DecimalType(19, 6)).as("v"))
    val e1 = intercept[Exception] {
      TrendOps.rollingAgg(dup, "day", "v", window = 3).collect()
    }
    assert(e1.getMessage.contains("duplicated axis point"),
      s"expected the uniqueness guard, got: ${e1.getMessage}")
    val e2 = intercept[Exception] {
      TrendOps.rollingZScore(dup, "day", "v", window = 3, minPoints = 1).collect()
    }
    assert(e2.getMessage.contains("duplicated axis point"))
  }

  test("intervalUnion merges overlapping/touching spans; guards bad rows") {
    val spans = Seq(
      ("a", 1L, 5L), ("a", 3L, 7L), ("a", 7L, 9L), ("a", 20L, 25L),
      ("b", 0L, 100L), ("b", 10L, 20L),
      ("c", 5L, 3L) // inverted -> excluded, key absent
    ).toDF("k", "s", "e")
    val got = SessionOps.intervalUnion(spans.repartition(5), "k", "s", "e")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", 1L, 1L, 9L, 3L), // touching at 7 merges
      ("a", 2L, 20L, 25L, 1L),
      ("b", 1L, 0L, 100L, 2L))) // nested span absorbed
    // covered-time property: merged intervals never overlap
    val perKey = got.groupBy(_._1).values
    perKey.foreach { ivs =>
      val sorted = ivs.toSeq.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Seq(x, y) => assert(y._3 > x._4, "merged intervals are disjoint")
        case _ => ()
      }
    }
  }

  test("resampleInterpolate: exact hits, interior lerp, no extrapolation") {
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    // key a: obs at 100->1.0, 130->4.0, 220->1.0; 10s grid from 100
    val df = Seq(
      ("a", ts(100), 1.0), ("a", ts(130), 4.0), ("a", ts(220), 1.0),
      ("b", ts(95), 7.0), ("b", ts(95), 9.0), // same-second dup -> max
      ("b", ts(105), 5.0)
    ).toDF("k", "t", "v")
    val got = TrendOps.resampleInterpolate(df, "k", "t", "v", stepSec = 10L)
      .select(col("k"), unix_seconds(col("grid_ts")), col("value"))
      .as[(String, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val a = got.filter(_._1 == "a").map(r => r._2 -> r._3).toMap
    assert(a(100) == 1.0 && a(220) == 1.0, "grid on an observation is exact")
    assert(a(110) == 2.0 && a(120) == 3.0, "linear between 100 and 130")
    assert(math.abs(a(140) - (4.0 - 3.0 / 90 * 10)) < 1e-12,
      "linear between 130 and 220")
    assert(a.size == 13, "grid spans [100, 220] every 10s, nothing beyond")
    val b = got.filter(_._1 == "b").map(r => r._2 -> r._3).toMap
    // b's span is [95, 105]: grid floor(95)=90 drops (before first obs);
    // dup at 95 collapses to max 9.0, so lerp(100) = 9 + (5-9)*0.5 = 7
    assert(b == Map(100L -> 7.0), "dup collapses to max; 90 extrapolates out")
    val re = TrendOps.resampleInterpolate(
        df.repartition(5), "k", "t", "v", 10L)
      .select(col("k"), unix_seconds(col("grid_ts")), col("value"))
      .as[(String, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(re.toSeq == got.toSeq, "partitioning-independent")
  }

  test("fillForward: carry-forward per key, leading nulls stay, multi-col one pass") {
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val df = Seq(
      ("a", ts(1), Option.empty[Double], Option("x")),
      ("a", ts(2), Some(5.0), Option.empty[String]),
      ("a", ts(3), Option.empty[Double], Option("y")),
      ("a", ts(4), Option.empty[Double], Option.empty[String]),
      ("b", ts(1), Some(9.0), Option.empty[String])
    ).toDF("k", "ts", "v", "s").withColumn("event_id", col("ts").cast("long"))
    val got = TrendOps.fillForward(df, "k", "ts", Seq("v", "s"))
      .select("k", "event_id", "v", "s")
      .as[(String, Long, Option[Double], Option[String])]
      .collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      ("a", 1L, None, Some("x")), // leading null NOT back-filled
      ("a", 2L, Some(5.0), Some("x")),
      ("a", 3L, Some(5.0), Some("y")),
      ("a", 4L, Some(5.0), Some("y")),
      ("b", 1L, Some(9.0), None)))
    // single Window node: both columns fill from one pass
    val plan = TrendOps.fillForward(df, "k", "ts", Seq("v", "s"))
      .queryExecution.executedPlan.toString
    assert(plan.split("Window ").length <= 3, "window expressions must fuse")
  }

  test("topNWithOther: collapse, shares sum to 1, deterministic tie cut") {
    val rows = Seq(("a", 50.0), ("b", 30.0), ("c", 10.0), ("d", 6.0),
      ("e", 4.0)).flatMap { case (c, v) => Seq((c, v / 2), (c, v / 2)) }
    val got = ProfileOps.topNWithOther(rows.toDF("cat", "v"), "cat", "v", 2)
      .as[(String, Int, Double, Double, Double)].collect().sortBy(_._2)
    assert(got.map(_._1).toSeq == Seq("a", "b", "__other__"))
    assert(got.map(_._3).toSeq == Seq(50.0, 30.0, 20.0))
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-12)
    assert(math.abs(got.last._5 - 1.0) < 1e-12, "cum share ends at 1")
    // tie on the metric: category name breaks it deterministically
    val tied = Seq(("x", 1.0), ("y", 1.0), ("z", 1.0)).toDF("cat", "v")
    val t = ProfileOps.topNWithOther(tied, "cat", "v", 2)
      .as[(String, Int, Double, Double, Double)].collect().sortBy(_._2)
    assert(t.map(_._1).toSeq == Seq("x", "y", "__other__"))
  }

  test("acfByKey: hand values, gap = no pair, zero variance, invariance") {
    // series 1,2,3,4 at idx 0..3: mean 2.5, dev -1.5,-0.5,0.5,1.5
    // den = 5; lag1 num = 1.25 -> 0.25; lag2 = -1.5 -> -0.3;
    // lag3 = -2.25 -> -0.45; lag4 has no pair -> 0/den = 0
    val s = Seq(("a", 0L, 1.0), ("a", 1L, 2.0), ("a", 2L, 3.0),
      ("a", 3L, 4.0)).toDF("k", "i", "v")
    val r = TrendOps.acfByKey(s, "k", "i", "v", 4)
      .as[(String, Int, Long, Option[Double])].collect()
      .sortBy(_._2).toSeq
    assert(r.map(_._3) == Seq(3L, 2L, 1L, 0L))
    assert(math.abs(r(0)._4.get - 0.25) < 1e-9)
    assert(math.abs(r(1)._4.get - (-0.3)) < 1e-9)
    assert(math.abs(r(2)._4.get - (-0.45)) < 1e-9)
    assert(r(3)._4.contains(0.0), "pairless lag: acf 0, not NULL")

    // gap at idx 2: lag1 pairs only (0,1); lag2 only (1,3)
    val gap = Seq(("g", 0L, 1.0), ("g", 1L, 5.0), ("g", 3L, 9.0))
      .toDF("k", "i", "v")
    val g = TrendOps.acfByKey(gap, "k", "i", "v", 2)
      .as[(String, Int, Long, Option[Double])].collect().sortBy(_._2)
    assert(g.map(_._3).toSeq == Seq(1L, 1L),
      s"exact-offset pairs across the gap: ${g.toSeq}")

    val flat = Seq(("f", 0L, 3.0), ("f", 1L, 3.0), ("f", 2L, 3.0))
      .toDF("k", "i", "v")
    assert(TrendOps.acfByKey(flat, "k", "i", "v", 1)
      .select("acf").collect().head.isNullAt(0),
      "zero-variance series: acf undefined")

    val rep = TrendOps.acfByKey(s.repartition(5), "k", "i", "v", 4)
      .as[(String, Int, Long, Option[Double])].collect().sortBy(_._2).toSeq
    assert(rep == r, "acf must be partitioning-proof")
  }

  test("decayedSum: half-life weights, reference at corpus max ts") {
    // newest event weights 1; one and two half-lives older weight
    // 0.5 / 0.25 -> every term contributes exactly 2
    def at(days: Long) = new java.sql.Timestamp(days * 86400000L)
    val df = Seq(("u", at(0), 8.0), ("u", at(30), 4.0), ("u", at(60), 2.0))
      .toDF("k", "t", "v")
    val r = TrendOps.decayedSum(df, "k", "t", "v", halfLifeDays = 30.0)
      .as[(String, Long, Double)].collect().head
    assert(r._2 == 3L)
    assert(math.abs(r._3 - 6.0) < 1e-6, s"got ${r._3}")
  }

  test("seasonalDecompose: exact pattern recovered; gaps NULL the trend") {
    // x = 10 + s[phase], s = (-1, 0, 1): 3-point centered MA = 10 on
    // interior points, seasonal means recover s exactly, residual 0
    val s = Map(0 -> -1.0, 1 -> 0.0, 2 -> 1.0)
    val rows = (0L to 8L).map(i => ("a", i, 10.0 + s((i % 3).toInt)))
    val r = TrendOps.seasonalDecompose(rows.toDF("k", "i", "v"), "k", "i",
        "v", 3)
      .as[(String, Long, Double, Option[Double], Option[Double],
        Option[Double])].collect().sortBy(_._2).toSeq
    assert(r.head._4.isEmpty && r.last._4.isEmpty,
      "boundary points have no full centered frame")
    r.filter(x => x._2 >= 1 && x._2 <= 7).foreach { x =>
      assert(math.abs(x._4.get - 10.0) < 1e-9, s"trend at ${x._2}: ${x._4}")
      assert(math.abs(x._5.get - s((x._2 % 3).toInt)) < 1e-9)
      assert(math.abs(x._6.get) < 1e-9, s"residual at ${x._2}: ${x._6}")
    }

    // removing idx 4 breaks the RANGE frame of its neighbors too
    val gap = rows.filterNot(_._2 == 4L)
    val g = TrendOps.seasonalDecompose(gap.toDF("k", "i", "v"), "k", "i",
        "v", 3)
      .as[(String, Long, Double, Option[Double], Option[Double],
        Option[Double])].collect().map(x => x._2 -> x._4).toMap
    assert(g(3L).isEmpty && g(5L).isEmpty,
      "gap neighbors must not fake a trend from shifted rows")
    assert(g(2L).nonEmpty && g(6L).nonEmpty)
  }

  test("cusumChangepoint: level shift located; earliest index on ties") {
    // 0,0,10,10: mean 5, S = -5,-10,-5,0 -> cp at idx 1, |S| = 10
    val s = Seq(("a", 0L, 0.0), ("a", 1L, 0.0), ("a", 2L, 10.0),
      ("a", 3L, 10.0)).toDF("k", "i", "v")
    val r = TrendOps.cusumChangepoint(s, "k", "i", "v")
      .as[(String, Long, Long, Double)].collect().head
    assert(r == (("a", 4L, 1L, 10.0)), s"got $r")

    // 0,10,0,10: S = -5,0,-5,0 -> |S| = 5 at idx 0 and 2 -> earliest
    val tie = Seq(("t", 0L, 0.0), ("t", 1L, 10.0), ("t", 2L, 0.0),
      ("t", 3L, 10.0)).toDF("k", "i", "v")
    val rt = TrendOps.cusumChangepoint(tie, "k", "i", "v")
      .as[(String, Long, Long, Double)].collect().head
    assert(rt._3 == 0L && rt._4 == 5.0, s"tie must break earliest: $rt")

    val rep = TrendOps.cusumChangepoint(s.repartition(7), "k", "i", "v")
      .as[(String, Long, Long, Double)].collect().head
    assert(rep == r, "cusum must be partitioning-proof")
  }
}
