package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class MultimodalOpsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val payloads = Seq(
    (1L, "abcdefgh" * 20),  // 160 bytes -> 3 frames @ 64
    (2L, "xy"),             // 2 bytes -> 1 frame
    (3L, "")                // empty payload
  ).toDF("doc_id", "data")

  test("bundle: schema matches the declared contract, metadata without decode") {
    val b = MultimodalOps.bundle(payloads, "doc_id", "data", "text/plain", 64, 8)
    // names + types must match the contract (nullability flags differ
    // depending on the literal/derived provenance of each column)
    assert(b.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq ==
      MultimodalOps.bundleSchema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq)
    val rows = b.select(col("id"), col("meta.n_bytes"), col("meta.n_frames"))
      .as[(Long, Int, Int)].collect()
    assert(rows.contains((1L, 160, 3)))
    assert(rows.contains((2L, 2, 1)))
    assert(rows.contains((3L, 0, 0)))
  }

  test("decodeFrames: deterministic stub, shape follows metadata, empty-safe") {
    val b = MultimodalOps.bundle(payloads, "doc_id", "data", "text/plain", 64, 8)
    val d1 = MultimodalOps.decodeFrames(b).collect().map(d => d.id -> d.frames).toMap
    val d2 = MultimodalOps.decodeFrames(b.repartition(3)).collect().map(d => d.id -> d.frames).toMap
    assert(d1(1L).length == 3 && d1(1L).forall(_.length == 8))
    assert(d1(3L).isEmpty)
    d1.foreach { case (id, frames) =>
      assert(frames.map(_.toSeq).toSeq == d2(id).map(_.toSeq).toSeq,
        "decode must not depend on partitioning")
    }
    // stub formula spot check: first byte of 'a' = 97 -> 97/128
    assert(math.abs(d1(1L)(0)(0) - 97.0f / 128.0f) < 1e-7)
  }

  test("frameMeans composes decoded frames into a feature DataFrame") {
    val b = MultimodalOps.bundle(payloads, "doc_id", "data", "text/plain", 64, 8)
    val fm = MultimodalOps.frameMeans(MultimodalOps.decodeFrames(b))
      .as[(Long, Seq[Double])].collect().toMap
    assert(fm(1L).length == 3)
    assert(fm(3L).isEmpty)
  }
}
