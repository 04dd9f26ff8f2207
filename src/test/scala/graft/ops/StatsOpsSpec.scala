package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class StatsOpsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("chiSquare: hand-checked 2x2 table") {
    // classic 2x2: a={x:30,y:10}, b={x:10,y:30} -> chi2 = 20·(sum of
    // (|o-e|=10)^2/e over cells e=20) = 4·(100/20) = 20, dof = 1
    val rows = Seq.fill(30)(("g1", "x")) ++ Seq.fill(10)(("g1", "y")) ++
      Seq.fill(10)(("g2", "x")) ++ Seq.fill(30)(("g2", "y"))
    val got = StatsOps.chiSquare(rows.toDF("g", "v"), "g", "v")
      .as[(Double, Long, Long)].collect().head
    assert(got._2 == 1L && got._3 == 80L)
    assert(math.abs(got._1 - 20.0) < 1e-9, s"chi2 ${got._1} != 20")
  }

  test("chiSquare: perfectly independent table scores ~0; dof tracks level counts") {
    // counts exactly proportional -> every observed == expected
    val rows = for (g <- Seq("a", "b", "c"); v <- Seq("p", "q"); _ <- 0 until (
      (if (g == "a") 2 else if (g == "b") 4 else 6) * (if (v == "p") 3 else 1)))
      yield (g, v)
    val got = StatsOps.chiSquare(rows.toDF("g", "v"), "g", "v")
      .as[(Double, Long, Long)].collect().head
    assert(got._1 == 0.0, s"independent table must score exactly 0, got ${got._1}")
    assert(got._2 == 2L) // (3-1)(2-1)
  }

  test("chiSquare: sparse table counts unobserved cells (ADVICE r6)") {
    // 2x2 with cell (g2, x) NEVER observed: a={x:10,y:10}, b={y:20}.
    // marginals: rn(g1)=20, rn(g2)=20, cn(x)=10, cn(y)=30, tot=40
    // e(g1,x)=5  o=10 -> 5 ; e(g1,y)=15 o=10 -> 25/15
    // e(g2,x)=5  o=0  -> 5 ; e(g2,y)=15 o=20 -> 25/15
    // chi2 = 5 + 5 + 50/15 = 13.3333...; omitting the empty cell
    // would understate it by exactly e = 5
    val rows = Seq.fill(10)(("g1", "x")) ++ Seq.fill(10)(("g1", "y")) ++
      Seq.fill(20)(("g2", "y"))
    val got = StatsOps.chiSquare(rows.toDF("g", "v"), "g", "v")
      .as[(Double, Long, Long)].collect().head
    assert(got._2 == 1L && got._3 == 40L)
    assert(math.abs(got._1 - (10.0 + 50.0 / 15.0)) < 1e-8,
      s"chi2 ${got._1} must include the zero cell's (0-e)^2/e = e term")
  }

  test("entropy: uniform = ln(k); single category = 0; skew lowers it") {
    val uniform = (0 until 800).map(i => Tuple1(s"c${i % 8}")).toDF("cat")
    val (e1, k1, n1) = StatsOps.entropy(uniform, "cat")
      .as[(Double, Long, Long)].collect().head
    assert(k1 == 8L && n1 == 800L)
    assert(math.abs(e1 - math.log(8.0)) < 1e-8, s"uniform entropy $e1 != ln 8")

    val single = Seq.fill(50)(Tuple1("only")).toDF("cat")
    assert(StatsOps.entropy(single, "cat")
      .as[(Double, Long, Long)].collect().head._1 == 0.0)

    val skewed = ((0 until 700).map(_ => "big") ++ (0 until 100).map(i => s"c${i % 4}"))
      .map(Tuple1(_)).toDF("cat")
    val e2 = StatsOps.entropy(skewed, "cat").as[(Double, Long, Long)].collect().head._1
    assert(e2 < e1, "a collapsing mix must lower entropy")
  }

  test("chiSquare is repartition-invariant") {
    val rows = (0 until 700).map(i => (s"g${i % 4}", s"v${i % 3 + i % 5}"))
    val a = StatsOps.chiSquare(rows.toDF("g", "v"), "g", "v")
      .as[(Double, Long, Long)].collect().head
    val b = StatsOps.chiSquare(rows.toDF("g", "v").repartition(11), "g", "v")
      .as[(Double, Long, Long)].collect().head
    assert(a == b)
  }

  test("gini: uniform = 0, concentrated = (n-1)/n shape, hand value") {
    def g(xs: Seq[Double]): Option[Double] =
      StatsOps.gini(xs.map(Tuple1(_)).toDF("v"), "v").collect().headOption
        .flatMap(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(g(Seq(5.0, 5.0, 5.0, 5.0)) == Some(0.0))
    // all mass on one of four rows: G = (2*4 - 4 - 1)/(4) ... = 0.75
    assert(g(Seq(0.0, 0.0, 0.0, 9.0)) == Some(0.75))
    // hand: [1,2,3,4] -> ((-3)+(-2)+3+12)/40 = 0.25
    assert(g(Seq(1.0, 2.0, 3.0, 4.0)) == Some(0.25))
    assert(g(Seq.empty) == None)
    assert(g(Seq(0.0, 0.0)) == None, "zero total mass has no Gini")
  }

  test("gini is repartition-invariant and tie-stable") {
    val xs = (0 until 500).map(i => ((i % 13) + 1).toDouble)
    val a = StatsOps.gini(xs.map(Tuple1(_)).toDF("v"), "v")
      .as[(Option[Double], Long, Double)].collect().head
    val b = StatsOps.gini(xs.map(Tuple1(_)).toDF("v").repartition(9), "v")
      .as[(Option[Double], Long, Double)].collect().head
    assert(a == b && a._1.exists(v => v > 0 && v < 1))
  }

  test("weightedQuantile: hand case, tie mass, exclusions, repartition-proof") {
    // group g: values 1(w2), 2(w1), 3(w3): W=6, half=3 -> cum(1)=2,
    // cum(2)=3 >= 3 -> weighted median 2. group h: tied values share
    // the RANGE frame: 5(w1),5(w1),9(w2): cum(5)=2 >= 2 -> median 5
    val df = Seq(
      ("g", 1.0, 2.0), ("g", 2.0, 1.0), ("g", 3.0, 3.0),
      ("h", 5.0, 1.0), ("h", 5.0, 1.0), ("h", 9.0, 2.0),
      ("h", 4.0, -1.0), ("h", 4.0, 0.0) // non-positive weights excluded
    ).toDF("k", "v", "w")
    val got = StatsOps.weightedQuantile(df, "k", "v", "w", q = 0.5)
      .as[(String, Double, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("g", 2.0, 6.0), ("h", 5.0, 4.0)))
    val re = StatsOps.weightedQuantile(df.repartition(7), "k", "v", "w", 0.5)
      .as[(String, Double, Double)].collect().sortBy(_._1)
    assert(re.toSeq == got.toSeq)
    val p90 = StatsOps.weightedQuantile(df, "k", "v", "w", q = 0.9)
      .as[(String, Double, Double)].collect().sortBy(_._1)
    assert(p90.map(r => (r._1, r._2)).toSeq == Seq(("g", 3.0), ("h", 9.0)))
  }

  test("twoProportionZ: hand-computed pooled z; non-binary variants abort") {
    // A: 100 trials 60 conv; B: 100 trials 40 conv
    // pp=0.5 -> z = 0.2 / sqrt(0.25 * 0.02) = 2.8284271...
    val df = ((1 to 100).map(i => ("A", i <= 60)) ++
      (1 to 100).map(i => ("B", i <= 40))).toDF("variant", "conv")
    val got = StatsOps.twoProportionZ(df, "variant", "conv")
      .as[(String, String, Long, Long, Long, Long, Double, Double, Double)]
      .collect().head
    assert(got._1 == "A" && got._2 == "B")
    assert((got._3, got._4, got._5, got._6) == ((100L, 60L, 100L, 40L)))
    assert(math.abs(got._9 - 0.2 / math.sqrt(0.25 * 0.02)) < 1e-12)
    val bad = df.union(Seq(("C", true)).toDF("variant", "conv"))
    intercept[Exception] {
      StatsOps.twoProportionZ(bad, "variant", "conv").collect()
    }
  }

  test("groupwiseRegression: exact line recovered; degenerate x -> nulls") {
    // group g: y = 3 + 2x exactly -> slope 2, intercept 3, r2 = 1
    val pts = (1 to 20).map(i => ("g", i.toDouble, 3.0 + 2.0 * i)) ++
      Seq(("z", 5.0, 1.0), ("z", 5.0, 9.0)) // zero x-variance
    val got = StatsOps.groupwiseRegression(
        pts.toDF("k", "x", "y"), "k", "x", "y")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().sortBy(_._1).toSeq
    val g = got.head
    assert(g._2 == 20L)
    assert(math.abs(g._3.get - 2.0) < 1e-9 &&
      math.abs(g._4.get - 3.0) < 1e-8 && math.abs(g._5.get - 1.0) < 1e-12)
    val z = got.last
    assert(z._3.isEmpty && z._4.isEmpty && z._5.isEmpty,
      "vertical fit is undefined, not a crash or a garbage number")
  }

  test("benfordDeviation: Benford-conforming sample, digit extraction edges") {
    // synthetic Benford-ish magnitudes: 10^(u) for uniform-ish u gives
    // a first-digit law close to log10(1+1/d)
    val xs = (0 until 3000).map(i => math.pow(10.0, (i % 1000) / 1000.0 * 3))
    val got = StatsOps.benfordDeviation(xs.map(Tuple1(_)).toDF("v"), "v")
      .as[(Int, Long, Double, Double, Double, Double)].collect()
    assert(got.length == 9 && got.map(_._1).sorted.sameElements(1 to 9))
    val mad = got.head._6
    assert(mad < 0.01, s"near-Benford sample should conform, MAD $mad")
    got.foreach { r =>
      assert(math.abs(r._5 - (r._3 - r._4)) < 1e-15,
        "deviation must equal observed - expected") }
    // extraction edges: leading zeros, sub-1 magnitudes, negatives out
    val edge = Seq(0.00042, 1000.0, 7.0, -5.0, 0.0)
      .map(Tuple1(_)).toDF("v")
    val digits = StatsOps.benfordDeviation(edge, "v")
      .select("d", "n").as[(Int, Long)].collect().toMap
    assert(digits == Map(4 -> 1L, 1 -> 1L, 7 -> 1L),
      s"0.00042->4, 1000->1, 7->7; negatives/zero excluded: $digits")
  }

  test("welchTTest: hand case with unequal variances; guard on 3 variants") {
    // A: 1,2,3 (mean 2, var 1); B: 10,14 (mean 12, var 8)
    // se = 1/3 + 4; t = -10/sqrt(13/3)
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 10.0), ("B", 14.0))
      .toDF("v", "x")
    val r = StatsOps.welchTTest(df, "v", "x")
      .as[(String, String, Long, Long, Double, Double, Double, Double,
        Double, Double)].collect().head
    assert(r._1 == "A" && r._2 == "B" && r._3 == 3L && r._4 == 2L)
    assert(math.abs(r._5 - 2.0) < 1e-12 && math.abs(r._6 - 12.0) < 1e-12)
    assert(math.abs(r._7 - 1.0) < 1e-9 && math.abs(r._8 - 8.0) < 1e-9)
    assert(math.abs(r._9 - (-10.0 / math.sqrt(1.0 / 3 + 4.0))) < 1e-9)
    val badDf = df.union(Seq(("C", 1.0)).toDF("v", "x"))
    intercept[Exception] {
      StatsOps.welchTTest(badDf, "v", "x").collect()
    }
  }

  test("winsorize: clamps into the exact quantile band; nulls pass through") {
    val df = ((1 to 100).map(i => ("g", i.toDouble)) :+
      ("g", Double.NaN)).filter(!_._2.isNaN) // 1..100
      .toDF("k", "v")
    val got = StatsOps.winsorize(df, "k", "v", 0.1, 0.9)
      .select("v", "p_lo", "p_hi", "winsorized")
      .as[(Double, Double, Double, Double)].collect()
    val (lo, hi) = (got.head._2, got.head._3)
    assert(lo == 10.0 && hi == 90.0, s"exact lower-edge deciles: $lo, $hi")
    got.foreach { case (v, _, _, w) =>
      assert(w == math.min(math.max(v, 10.0), 90.0))
    }
    val n = Seq(("g", Option.empty[Double]), ("g", Some(5.0)))
      .toDF("k", "v")
    val nw = StatsOps.winsorize(n, "k", "v", 0.5, 0.9)
      .select("winsorized").collect()
    assert(nw.exists(_.isNullAt(0)), "null value stays null")
  }

  test("mannWhitneyU: separated groups, tie correction, guard, invariance") {
    // A: 1,2,3  B: 4,5,6 -> R1 = 6, U1 = 0, ties = 0,
    // s2 = 9/12*7 = 5.25, z = -4.5/sqrt(5.25), r = 1
    val sep = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0),
      ("B", 4.0), ("B", 5.0), ("B", 6.0)).toDF("v", "x")
    val r1 = StatsOps.mannWhitneyU(sep, "v", "x")
      .as[(String, String, Long, Long, Double, Double, Double)]
      .collect().head
    assert(r1._1 == "A" && r1._2 == "B" && r1._3 == 3L && r1._4 == 3L)
    assert(r1._5 == 0.0, s"U1 ${r1._5} != 0")
    assert(math.abs(r1._6 - (-4.5 / math.sqrt(5.25))) < 1e-12)
    assert(math.abs(r1._7 - 1.0) < 1e-12)

    // A: 1,2,2  B: 2,3,3 -> avg-rank blocks: {1}:1, {2,2,2}:3, {3,3}:5.5
    // R1 = 1+3+3 = 7, U1 = 1; ties = (27-3)+(8-2) = 30
    // s2 = 0.75*(7 - 30/30) = 4.5, z = -3.5/sqrt(4.5)
    val tied = Seq(("A", 1.0), ("A", 2.0), ("A", 2.0),
      ("B", 2.0), ("B", 3.0), ("B", 3.0)).toDF("v", "x")
    val r2 = StatsOps.mannWhitneyU(tied, "v", "x")
      .as[(String, String, Long, Long, Double, Double, Double)]
      .collect().head
    assert(r2._5 == 1.0, s"tied U1 ${r2._5} != 1")
    assert(math.abs(r2._6 - (-3.5 / math.sqrt(4.5))) < 1e-12)

    // all-tied input: zero variance -> NULL z
    val flat = Seq(("A", 7.0), ("A", 7.0), ("B", 7.0), ("B", 7.0))
      .toDF("v", "x")
    assert(StatsOps.mannWhitneyU(flat, "v", "x")
      .select("z").collect().head.isNullAt(0), "all-tied z must be NULL")

    intercept[Exception] {
      StatsOps.mannWhitneyU(
        sep.union(Seq(("C", 9.0)).toDF("v", "x")), "v", "x").collect()
    }

    val rep = StatsOps.mannWhitneyU(tied.repartition(7), "v", "x")
      .as[(String, String, Long, Long, Double, Double, Double)]
      .collect().head
    assert(rep == r2, "rank algebra must be partitioning-proof")
  }

  test("cuped: perfect covariate removes all variance; flat covariate NULLs") {
    // y = 10x exactly -> pooled theta = 10, xbar = 2.5, y' = 25 for
    // every unit -> var_adj = 0, variance_reduction = 1
    val df = Seq(("A", 1.0, 10.0), ("A", 2.0, 20.0),
      ("B", 3.0, 30.0), ("B", 4.0, 40.0)).toDF("v", "x", "y")
    val r = StatsOps.cuped(df, "v", "y", "x")
      .as[(String, Long, Double, Double, Double, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq
    assert(r.map(_._1) == Seq("A", "B") && r.forall(_._2 == 2L))
    r.foreach { row =>
      assert(math.abs(row._3 - 10.0) < 1e-9, s"theta ${row._3} != 10")
      assert(math.abs(row._5 - 25.0) < 1e-9, s"mean_adj ${row._5} != 25")
      assert(math.abs(row._7) < 1e-9, s"var_adj ${row._7} != 0")
      assert(math.abs(row._8 - 1.0) < 1e-9)
    }
    assert(math.abs(r.head._6 - 50.0) < 1e-9, "var_raw(A) = 50")

    val flat = Seq(("A", 5.0, 1.0), ("A", 5.0, 2.0), ("B", 5.0, 3.0))
      .toDF("v", "x", "y")
    val rf = StatsOps.cuped(flat, "v", "y", "x")
      .select("theta", "mean_adj", "var_adj").collect()
    rf.foreach { row =>
      assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2),
        s"flat covariate: adjustment undefined, got $row")
    }
  }

  test("theilSen: outlier-proof slope; singleton keys emit nothing") {
    // (0,0),(1,1),(2,2),(3,100): median of pairwise slopes is 1 — the
    // fat-finger point owns an OLS fit but not this
    val df = Seq(("a", 0.0, 0.0), ("a", 1.0, 1.0), ("a", 2.0, 2.0),
      ("a", 3.0, 100.0), ("b", 5.0, 5.0)).toDF("k", "x", "y")
    val r = StatsOps.theilSen(df, "k", "x", "y")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(r == Seq(("a", 6L, 1.0, 0.0)),
      s"median slope 1, intercept 0, singleton b dropped: $r")
    val ols = StatsOps.groupwiseRegression(
        df.filter($"k" === "a"), "k", "x", "y")
      .select("slope").as[Double].collect().head
    assert(ols > 20.0, s"OLS is owned by the outlier ($ols); Theil-Sen is not")
  }

  test("equalFreqBins: even split, tie mass shares a bin") {
    val even = (1 to 16).map(i => ("g", i.toDouble)).toDF("k", "v")
    val r = StatsOps.equalFreqBins(even, "k", "v", 4)
      .as[(String, Int, Long, Double, Double)].collect().sortBy(_._2).toSeq
    assert(r.map(x => (x._2, x._3)) ==
      Seq((1, 4L), (2, 4L), (3, 4L), (4, 4L)))
    assert(r.head._4 == 1.0 && r.head._5 == 4.0 && r.last._4 == 13.0)

    // 4 copies of 1 then 2,3,4,5 with k=2: the tie block fills bin 1
    val tied = (Seq.fill(4)(1.0) ++ Seq(2.0, 3.0, 4.0, 5.0))
      .map(("g", _)).toDF("k", "v")
    val rt = StatsOps.equalFreqBins(tied, "k", "v", 2)
      .as[(String, Int, Long, Double, Double)].collect().sortBy(_._2).toSeq
    assert(rt == Seq(("g", 1, 4L, 1.0, 1.0), ("g", 2, 4L, 2.0, 5.0)),
      s"got $rt")
  }

  test("corrMatrix: perfect/anti correlation, zero-variance NULL cells") {
    val df = Seq((1.0, 2.0, -1.0, 5.0), (2.0, 4.0, -2.0, 5.0),
      (3.0, 6.0, -3.0, 5.0)).toDF("a", "b", "c", "z")
    val r = StatsOps.corrMatrix(df, Seq("a", "b", "c", "z"))
      .as[(String, String, Long, Option[Double])].collect()
      .map(x => (x._1, x._2) -> x._4).toMap
    assert(r.size == 6)
    assert(math.abs(r(("a", "b")).get - 1.0) < 1e-9)
    assert(math.abs(r(("a", "c")).get + 1.0) < 1e-9)
    assert(r(("a", "z")).isEmpty && r(("c", "z")).isEmpty,
      "constant column: correlation undefined")
  }

  test("spearman: monotone = 1 through nonlinearity, ties averaged") {
    val cubic = (1 to 20).map(i => (i.toDouble, math.pow(i, 3)))
      .toDF("x", "y")
    val r = StatsOps.spearman(cubic, "x", "y")
      .as[(Long, Option[Double])].collect().head
    assert(r._1 == 20L && math.abs(r._2.get - 1.0) < 1e-12,
      s"monotone rho must be exactly 1: $r")

    // tie blocks on both sides, same pattern -> still 1
    val tied = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 40.0))
      .toDF("x", "y")
    val rt = StatsOps.spearman(tied, "x", "y")
      .as[(Long, Option[Double])].collect().head
    assert(math.abs(rt._2.get - 1.0) < 1e-12, s"tied rho: $rt")

    // Pearson is dragged by the outlier; Spearman is not
    val out = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, 1000.0))
      .toDF("x", "y")
    assert(math.abs(StatsOps.spearman(out, "x", "y")
      .as[(Long, Option[Double])].collect().head._2.get - 1.0) < 1e-12)
  }

  test("targetEncode: smoothing shrinks to global mean, LOO drops own row") {
    // a: [1,2,3] (S=6), b: [10] singleton; global mean 4, m=2
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0))
      .toDF("cat", "y")
    val r = StatsOps.targetEncode(df, "cat", "y", m = 2.0)
      .as[(String, Double, Double, Double)].collect()
      .map(x => (x._1, x._2) -> (x._3, x._4)).toMap
    assert(math.abs(r(("a", 1.0))._1 - 14.0 / 5.0) < 1e-12)
    assert(math.abs(r(("b", 10.0))._1 - 6.0) < 1e-12)
    assert(math.abs(r(("a", 1.0))._2 - 2.5) < 1e-12, "LOO of y=1")
    assert(math.abs(r(("a", 3.0))._2 - 1.5) < 1e-12, "LOO of y=3")
    assert(math.abs(r(("b", 10.0))._2 - 4.0) < 1e-12,
      "singleton LOO falls back to the global mean")
  }

  test("hhi: uniform floor and single-category ceiling") {
    val uni = (0 until 16).map(i => Tuple1(s"c${i % 4}")).toDF("c")
    val r = StatsOps.hhi(uni, "c")
      .as[(Double, Long, Long)].collect().head
    assert(r == ((2500.0, 4L, 16L)), s"got $r")
    val one = Seq.fill(5)(Tuple1("only")).toDF("c")
    assert(StatsOps.hhi(one, "c").as[(Double, Long, Long)]
      .collect().head._1 == 10000.0)
  }

  test("huberMean: matches a plain-Scala 3-pass IRLS; zero-MAD keeps median") {
    val xs = Seq(0.0, 1.0, 2.0, 3.0, 4.0, 100.0)
    // independent reference: same lower-edge median/MAD, same 3 passes
    def loEdge(vs: Seq[Double], q: Double): Double = {
      val s = vs.sorted; s(math.ceil(q * s.size).toInt - 1)
    }
    val med = loEdge(xs, 0.5)
    val scale = 1.4826 * loEdge(xs.map(x => math.abs(x - med)), 0.5)
    var m = med
    for (_ <- 1 to 3) {
      val w = xs.map { x =>
        val adx = math.abs(x - m)
        if (adx <= 1.345 * scale) 1.0 else 1.345 * scale / adx
      }
      m = w.zip(xs).map { case (a, b) => a * b }.sum / w.sum
    }
    val got = StatsOps.huberMean(xs.map(("g", _)).toDF("k", "v"), "k", "v")
      .as[(String, Long, Double, Double, Double)].collect().head
    assert(got._2 == 6L && got._3 == med)
    assert(math.abs(got._4 - scale) < 1e-12)
    assert(math.abs(got._5 - m) < 1e-6, s"engine ${got._5} vs ref $m")
    assert(math.abs(got._5 - 2.0) < 1.0,
      "the fat-finger point must not own the location")

    // over half the mass on one value -> MAD 0 -> keep the median
    val flat = Seq(5.0, 5.0, 5.0, 5.0, 1.0).map(("f", _)).toDF("k", "v")
    val gf = StatsOps.huberMean(flat, "k", "v")
      .as[(String, Long, Double, Double, Double)].collect().head
    assert(gf._4 == 0.0 && gf._5 == 5.0, s"zero-MAD keeps the median: $gf")
  }

  test("trimmedMean: tails dropped, winsorize clamps instead") {
    // 1..20: [p10, p90] lower-edge band = [2, 18]; trimmed mean of
    // 2..18 = 10; raw mean 10.5
    val df = (1 to 20).map(i => ("g", i.toDouble)).toDF("k", "v")
    val r = StatsOps.trimmedMean(df, "k", "v", 0.1, 0.9)
      .as[(String, Long, Long, Double, Double, Double, Double)]
      .collect().head
    assert(r._2 == 20L && r._3 == 17L && r._4 == 2.0 && r._5 == 18.0)
    assert(math.abs(r._6 - 10.5) < 1e-12 && math.abs(r._7 - 10.0) < 1e-12)
  }

  test("jackknifeMean: hand SE over three buckets") {
    // buckets a:[1,2] b:[3,4] c:[5,6] -> leave-one-out means
    // 4.5, 3.5, 2.5 -> SS = 2, SE = sqrt(2/3 * 2)
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 5.0), ("c", 6.0)).toDF("g", "v")
    val r = StatsOps.jackknifeMean(df, "g", "v")
      .as[(Long, Long, Double, Double)].collect().head
    assert(r._1 == 6L && r._2 == 3L)
    assert(math.abs(r._3 - 3.5) < 1e-12)
    assert(math.abs(r._4 - math.sqrt(4.0 / 3.0)) < 1e-12, s"SE ${r._4}")
  }

  test("mantelHaenszel: hand pooled OR; 3-variant guard aborts") {
    // s1: a=4 b=1 c=2 d=3 -> ad/n=1.2, bc/n=0.2
    // s2: a=1 b=4 c=1 d=4 -> 0.4, 0.4  => OR_MH = 1.6/0.6
    def rows(s: String, v: String, p: Boolean, n: Int) =
      Seq.fill(n)((s, v, p))
    val df = (rows("s1", "t", true, 4) ++ rows("s1", "t", false, 1) ++
      rows("s1", "u", true, 2) ++ rows("s1", "u", false, 3) ++
      rows("s2", "t", true, 1) ++ rows("s2", "t", false, 4) ++
      rows("s2", "u", true, 1) ++ rows("s2", "u", false, 4))
      .toDF("s", "v", "p")
    val r = StatsOps.mantelHaenszel(df, "s", "v", "p")
      .as[(String, String, Long, Option[Double])].collect().head
    assert(r._1 == "t" && r._2 == "u" && r._3 == 2L)
    assert(math.abs(r._4.get - 1.6 / 0.6) < 1e-12, s"OR ${r._4}")
    intercept[Exception] {
      StatsOps.mantelHaenszel(
        df.union(Seq(("s1", "w", true)).toDF("s", "v", "p")),
        "s", "v", "p").collect()
    }
  }

  test("madOutliers: hand case, zero-MAD group NULLs, null exclusion") {
    // 1..9 plus 100: median = 5 (lower edge of 10), absdevs sorted
    // 0,1,1,2,2,3,3,4,4,95 -> MAD = 2; only 100 flags
    // (|0.6745*95/2| = 32.04); max |z| matches it
    val df = ((1 to 9).map(i => ("a", i.toDouble)) :+ ("a", 100.0))
      .toDF("k", "v")
    val r = StatsOps.madOutliers(df, "k", "v")
      .as[(String, Long, Double, Double, Option[Long], Option[Double])]
      .collect().head
    assert(r._2 == 10L && r._3 == 5.0 && r._4 == 2.0)
    assert(r._5.contains(1L), s"exactly the fat-finger row flags: ${r._5}")
    assert(math.abs(r._6.get - 0.6745 * 95.0 / 2.0) < 1e-12)

    // > half the mass on one value -> MAD = 0 -> score undefined
    val flat = Seq(("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 5.0),
      ("b", 1.0)).toDF("k", "v")
    val rf = StatsOps.madOutliers(flat, "k", "v")
      .as[(String, Long, Double, Double, Option[Long], Option[Double])]
      .collect().head
    assert(rf._4 == 0.0 && rf._5.isEmpty && rf._6.isEmpty,
      s"zero-MAD group must emit NULL outlier stats: $rf")

    val withNull = Seq(("c", Some(1.0)), ("c", Some(2.0)), ("c", None),
      ("c", Some(3.0))).toDF("k", "v")
    assert(StatsOps.madOutliers(withNull, "k", "v")
      .select("n").as[Long].collect().head == 3L, "NULL values excluded")
  }

  test("quantileNormalize: groups end with identical marginals; order " +
      "preserved within group; hand mapping on a 2-group fixture") {
    // group a: 1, 2, 3, 4 (ranks 1..4); group b: 10, 20 (ranks 1, 2)
    // pooled sorted: 1 2 3 4 10 20 (N = 6)
    // a: k = ceil(r*6/4) -> 2, 3, 5, 6 -> 2.0, 3.0, 10.0, 20.0
    // b: k = ceil(r*6/2) -> 3, 6 -> 3.0, 20.0
    val df = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (4L, "a", 4.0), (5L, "b", 10.0), (6L, "b", 20.0))
      .toDF("id", "g", "x")
    val got = StatsOps.quantileNormalize(df, "g", "x", "id")
      .as[(Long, String, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._4 == 2.0 && got(2L)._4 == 3.0 &&
      got(3L)._4 == 10.0 && got(4L)._4 == 20.0, s"group a: $got")
    assert(got(5L)._4 == 3.0 && got(6L)._4 == 20.0, s"group b: $got")
    // within-group order preserved
    assert(got(1L)._4 <= got(2L)._4 && got(2L)._4 <= got(3L)._4)
    // balanced groups get IDENTICAL normalized value sets
    val bal = ((1L to 50L).map(i => (i, "p", i.toDouble * 3)) ++
      (51L to 100L).map(i => (i, "q", 1000.0 - i))).toDF("id", "g", "x")
    val n = StatsOps.quantileNormalize(bal, "g", "x", "id")
      .as[(Long, String, Double, Double)].collect()
    val p = n.filter(_._2 == "p").map(_._4).sorted.toSeq
    val q = n.filter(_._2 == "q").map(_._4).sorted.toSeq
    assert(p == q, "equal-size groups must share one marginal")
  }

  test("poissonBootstrapCIByGroup: single-group result equals the global " +
      "form; multi-group independence; repartition-proof") {
    val a = (1L to 150L).map(i => ("a", i, (i % 7).toDouble + 0.5))
    val b = (151L to 260L).map(i => ("b", i, (i % 11).toDouble + 0.25))
    val df = (a ++ b).toDF("g", "id", "v")
    val grouped = StatsOps.poissonBootstrapCIByGroup(
        df, "g", "v", "id", reps = 16, seed = "gb", alpha = 0.1)
      .as[(String, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // each group must equal the GLOBAL op run on that group alone
    Seq("a" -> a, "b" -> b).foreach { case (g, rows) =>
      val solo = StatsOps.poissonBootstrapCI(
          rows.toDF("g", "id", "v"), "v", "id", reps = 16,
          seed = "gb", alpha = 0.1)
        .as[(Long, Double, Double, Double, Double)].head()
      val got = grouped(g)
      assert(got._2 == solo._1 && got._3 == solo._2, s"$g point: $got vs $solo")
      assert(got._4 == solo._3 && got._5 == solo._4 && got._6 == solo._5,
        s"$g CI/SE: $got vs $solo")
    }
    val re = StatsOps.poissonBootstrapCIByGroup(
        df.repartition(9), "g", "v", "id", reps = 16, seed = "gb",
        alpha = 0.1)
      .as[(String, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(re == grouped)
  }

  test("poissonBootstrapCI: full plain-Scala replay of draws, replicate " +
      "means, trimmed CI and SE; repartition-proof") {
    // values exactly representable in binary, so the round-at-9 step
    // is exact on both paths
    val vals = (1L to 200L).map(i => (i, (i % 13).toDouble + 0.25))
    val df = vals.toDF("id", "v")
    val reps = 20
    val alpha = 0.3 // k = floor(0.15 * 19) = 2 -> real trimming
    val got = StatsOps.poissonBootstrapCI(df, "v", "id", reps, "bs", alpha)
      .as[(Long, Double, Double, Double, Double)].head()
    def u01(s: String): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val hex = d.map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16).toDouble / 1152921504606846976.0
    }
    def pois(u: Double): Int =
      StatsOps.poisson1Cdf.indexWhere(u < _) match {
        case -1 => 6
        case k => k
      }
    val means = (0 until reps).flatMap { b =>
      val ws = vals.map { case (id, v) => (pois(u01(s"$id#$b#bs")), v) }
      val c = ws.map(_._1.toLong).sum
      if (c == 0) None
      else {
        val s = ws.map { case (w, v) =>
          BigDecimal(w * v).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }.sum
        Some(s.toDouble / c.toDouble)
      }
    }.sorted
    val k = math.floor(alpha / 2.0 * (means.length - 1)).toInt
    assert(k == 2, s"fixture must exercise trimming, k = $k")
    assert(got._1 == 200L)
    val mean = vals.map(_._2).sum / 200.0
    assert(math.abs(got._2 - mean) < 1e-9)
    assert(math.abs(got._3 - means(k)) < 1e-12, s"lo ${got._3} vs ${means(k)}")
    assert(math.abs(got._4 - means(means.length - 1 - k)) < 1e-12)
    val mm = means.reduceLeft(_ + _) / means.length
    val se = math.sqrt(means.map(m => (m - mm) * (m - mm)).reduceLeft(_ + _)
      / (means.length - 1))
    assert(math.abs(got._5 - se) < 1e-12, s"se ${got._5} vs $se")
    assert(got._3 <= got._2 && got._2 <= got._4, "CI brackets the mean")
    val re = StatsOps.poissonBootstrapCI(
        df.repartition(7), "v", "id", reps, "bs", alpha)
      .as[(Long, Double, Double, Double, Double)].head()
    assert(re == got, "exact decimal sums make the CI order-free")
  }

  test("poissonBootstrapCI production form (plain double sums, xxh draws, " +
      "fan-out repartition) matches the exact DECIMAL form to 6 decimals") {
    // values NOT exactly representable so the two accumulation paths
    // genuinely differ in ulps — the differential must absorb that
    val vals = (1L to 500L).map(i => (i, math.sin(i.toDouble) * 10.0 + 15.0))
    val df = vals.toDF("id", "v")
    def run(exact: Boolean, par: Option[Int]) =
      StatsOps.poissonBootstrapCI(df, "v", "id", reps = 24, seed = "pd",
          alpha = 0.1, uniform = StatsOps.xxhUniform, exact = exact,
          parallelism = par)
        .as[(Long, Double, Double, Double, Double)].head()
    val ex = run(exact = true, None)
    val fast = run(exact = false, Some(8))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(fast._1 == ex._1)
    assert(r6(fast._2) == r6(ex._2), s"mean ${fast._2} vs ${ex._2}")
    assert(r6(fast._3) == r6(ex._3), s"boot_lo ${fast._3} vs ${ex._3}")
    assert(r6(fast._4) == r6(ex._4), s"boot_hi ${fast._4} vs ${ex._4}")
    assert(r6(fast._5) == r6(ex._5), s"boot_se ${fast._5} vs ${ex._5}")
  }

  test("poissonBootstrapCIByGroup production form matches exact per group " +
      "to 6 decimals") {
    val rows = (1L to 400L).map(i =>
      (s"g${i % 3}", i, math.cos(i.toDouble) * 5.0 + 7.0))
    val df = rows.toDF("g", "id", "v")
    def run(exact: Boolean, par: Option[Int]) =
      StatsOps.poissonBootstrapCIByGroup(df, "g", "v", "id", reps = 24,
          seed = "pg", alpha = 0.1, uniform = StatsOps.xxhUniform,
          exact = exact, parallelism = par)
        .as[(String, Long, Double, Double, Double, Double)].collect()
        .map(r => r._1 -> r).toMap
    val ex = run(exact = true, None)
    val fast = run(exact = false, Some(8))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(fast.keySet == ex.keySet)
    ex.foreach { case (g, e) =>
      val f = fast(g)
      assert(f._2 == e._2, s"$g n")
      Seq((f._3, e._3, "mean"), (f._4, e._4, "lo"), (f._5, e._5, "hi"),
        (f._6, e._6, "se")).foreach { case (a, b, what) =>
        assert(r6(a) == r6(b), s"$g $what: $a vs $b")
      }
    }
  }
}
