package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The multi-column data-skipping claim behind
  * [[Sources.writeZOrdered]]: after a z-ordered write, EVERY clustered
  * column's per-file value range is a small slice of its global range
  * (so parquet min/max footer stats prune files for filters on any of
  * them), where a lexicographic sort delivers that only for the
  * leading column.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  // deterministic independent uniforms from a counter hash
  private def uniforms(n: Int) = {
    val rnd = new scala.util.Random(99)
    (0 until n).map(_ => (rnd.nextDouble(), rnd.nextDouble()))
      .toDF("x", "y").repartition(8)
  }

  private def perFileRanges(path: String): Seq[(Double, Double)] =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("rx"), (max("y") - min("y")).as("ry"))
      .select("rx", "ry").as[(Double, Double)].collect().toSeq

  test("z-ordered files are narrow in BOTH dims; lexicographic only in one") {
    val df = uniforms(20000)
    val zDir = Files.createTempDirectory("graft_zorder").toString
    val lexDir = Files.createTempDirectory("graft_lex").toString
    Sources.writeZOrdered(df, Seq("x", "y"), zDir, numFiles = 16, bits = 6)
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(lexDir)

    val z = perFileRanges(zDir)
    val lex = perFileRanges(lexDir)
    assert(z.size == 16 && lex.size == 16)
    val (zx, zy) = (z.map(_._1).sum / z.size, z.map(_._2).sum / z.size)
    val (lx, ly) = (lex.map(_._1).sum / lex.size, lex.map(_._2).sum / lex.size)
    // 16 files over a 2-bit-deep shared z prefix = a 4x4 grid: ideal
    // per-file extent 0.25 in each dim (quantile-bin noise on top)
    assert(zx < 0.5 && zy < 0.5,
      s"z-order must be narrow in both dims, got x=$zx y=$zy")
    assert(lx < 0.15, s"lexicographic leading dim should be ~1/16, got $lx")
    assert(ly > 0.8, s"lexicographic trailing dim covers ~everything, got $ly")
  }

  test("zOrderKey: equal rows get equal keys; nulls bin low; key is bounded") {
    val df = Seq((0.25, 0.75), (0.25, 0.75), (0.9, 0.1),
      (Double.NaN, 0.5)).toDF("x", "y")
      .select(when(isnan(col("x")), lit(null).cast("double"))
        .otherwise(col("x")).as("x"), col("y"))
    val keys = Sources.zOrderKey(df, Seq("x", "y"), bits = 4)
      .select("__z").as[Long].collect()
    assert(keys(0) == keys(1), "identical rows must share a z key")
    assert(keys.forall(k => k >= 0 && k < (1L << 8)),
      "4-bit x 2-col keys fit 8 bits")
    // the null-x row keeps only y bits set at odd positions interleaved
    assert(keys(3) >= 0)
  }
}
