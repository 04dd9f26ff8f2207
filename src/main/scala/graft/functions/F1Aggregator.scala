package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Streaming-capable classification-metric aggregator (SURVEY §4 item 2):
  * one pass over (pred, label) pairs accumulating per-class TP/FP/FN in
  * a mergeable buffer, finishing to (micro_f1, macro_f1, accuracy) with
  * exactly the [[graft.ops.EvalMetrics.f1Block]] semantics (sklearn
  * zero-division→0, macro over classes seen in preds ∪ labels).
  *
  * Because the buffer is a small map and `merge` is associative, the
  * same aggregator runs in batch `ds.select(F1Aggregator.toColumn)`,
  * grouped aggregation, and Structured Streaming (complete/update
  * output modes) — the one-pass form the pure-SQL rewrite can't give a
  * stream.
  */
object F1Aggregator extends Aggregator[(Int, Int), Map[Int, (Long, Long, Long)], (Double, Double, Double)] {

  override def zero: Map[Int, (Long, Long, Long)] = Map.empty

  private def bump(
      b: Map[Int, (Long, Long, Long)], cls: Int,
      tp: Long, fp: Long, fn: Long): Map[Int, (Long, Long, Long)] = {
    val (a, c, d) = b.getOrElse(cls, (0L, 0L, 0L))
    b.updated(cls, (a + tp, c + fp, d + fn))
  }

  override def reduce(
      b: Map[Int, (Long, Long, Long)], x: (Int, Int)): Map[Int, (Long, Long, Long)] = {
    val (pred, label) = x
    if (pred == label) bump(b, pred, 1, 0, 0)
    else bump(bump(b, pred, 0, 1, 0), label, 0, 0, 1)
  }

  override def merge(
      a: Map[Int, (Long, Long, Long)],
      b: Map[Int, (Long, Long, Long)]): Map[Int, (Long, Long, Long)] =
    b.foldLeft(a) { case (acc, (cls, (tp, fp, fn))) => bump(acc, cls, tp, fp, fn) }

  override def finish(b: Map[Int, (Long, Long, Long)]): (Double, Double, Double) = {
    if (b.isEmpty) return (0.0, 0.0, 0.0)
    def f1(tp: Long, fp: Long, fn: Long): Double = {
      val den = 2.0 * tp + fp + fn
      if (den == 0.0) 0.0 else 2.0 * tp / den
    }
    val (tps, fps, fns) = b.values.foldLeft((0L, 0L, 0L)) {
      case ((a, c, d), (tp, fp, fn)) => (a + tp, c + fp, d + fn)
    }
    val micro = f1(tps, fps, fns)
    // deterministic macro: sum per-class f1 in class-id order
    val macroF1 = b.toSeq.sortBy(_._1).map { case (_, (tp, fp, fn)) => f1(tp, fp, fn) }
      .sum / b.size
    val total = b.values.map(_._1).sum + fns // tp total + fn total = n rows
    val acc = if (total == 0) 0.0 else tps.toDouble / total
    (micro, macroF1, acc)
  }

  override def bufferEncoder: Encoder[Map[Int, (Long, Long, Long)]] =
    Encoders.kryo[Map[Int, (Long, Long, Long)]]

  override def outputEncoder: Encoder[(Double, Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble, Encoders.scalaDouble)
}
