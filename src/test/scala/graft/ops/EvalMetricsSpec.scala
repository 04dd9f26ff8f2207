package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class EvalMetricsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("f1Block matches sklearn-precomputed constants") {
    // y_true = [0,1,2,2], y_pred = [0,1,1,2]
    // sklearn: accuracy 0.75; micro-F1 0.75;
    // macro-F1 = (1 + 2/3 + 2/3) / 3 = 7/9
    val df = Seq((0, 0), (1, 1), (1, 2), (2, 2)).toDF("pred", "label")
    val r = EvalMetrics.f1Block(df, "pred", "label")
      .as[(Double, Double, Double)].head()
    assert(math.abs(r._1 - 0.75) < 1e-12, s"micro ${r._1}")
    assert(math.abs(r._2 - 7.0 / 9.0) < 1e-12, s"macro ${r._2}")
    assert(math.abs(r._3 - 0.75) < 1e-12, s"acc ${r._3}")
  }

  test("micro-F1 equals accuracy in single-label multiclass") {
    val df = Seq((0, 1), (1, 0), (2, 2), (3, 3), (1, 1), (0, 2)).toDF("pred", "label")
    val r = EvalMetrics.f1Block(df, "pred", "label").as[(Double, Double, Double)].head()
    assert(math.abs(r._1 - r._3) < 1e-12)
  }

  test("class present only in predictions contributes a zero-F1 term (sklearn rule)") {
    // labels {0}, preds {0,1}: class 1 has tp=0,fp=1,fn=0 -> f1=0
    // class 0: tp=1, fp=0, fn=1 -> f1 = 2/3; macro = 1/3
    val df = Seq((0, 0), (1, 0)).toDF("pred", "label")
    val r = EvalMetrics.f1Block(df, "pred", "label").as[(Double, Double, Double)].head()
    assert(math.abs(r._2 - 1.0 / 3.0) < 1e-12, s"macro ${r._2}")
  }

  test("perfect predictions give all ones") {
    val df = Seq((0, 0), (1, 1), (2, 2)).toDF("pred", "label")
    val r = EvalMetrics.f1Block(df, "pred", "label").as[(Double, Double, Double)].head()
    assert(r == ((1.0, 1.0, 1.0)))
  }

  test("hierarchicalF1 fails loudly when a lv2 id is absent from the dim") {
    val dim = Seq((10, 1), (20, 2)).toDF("lv2id", "lv1id")
    val ok = Seq((10, 20), (20, 20)).toDF("pred", "label")
    assert(EvalMetrics.hierarchicalF1(ok, dim).collect().length == 1)
    val bad = Seq((10, 20), (99, 20)).toDF("pred", "label") // 99 not in dim
    val e = intercept[Exception] {
      EvalMetrics.hierarchicalF1(bad, dim).collect()
    }
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(messages.contains("absent from category dim"),
      s"expected the raise_error contract, got:\n$messages")
  }
}
