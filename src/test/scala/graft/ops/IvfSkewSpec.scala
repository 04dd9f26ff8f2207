package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.core.Tables

class IvfSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("ivfCosineTopK finds the planted duplicate (same centroid by construction)") {
    val vecs = ((0 until 60).map { i =>
      val r = new scala.util.Random(i)
      (i.toLong, Seq.fill(8)(r.nextFloat() * 2 - 1))
    } :+ (100L, Seq(0.9f, 0.1f, 0.2f, 0.3f, 0.4f, 0.5f, 0.6f, 0.7f))
      :+ (101L, Seq(0.9f, 0.1f, 0.2f, 0.3f, 0.4f, 0.5f, 0.6f, 0.7f)))
      .toDF("vec_id", "embedding")
    val got = SimilarityOps.ivfCosineTopK(vecs, k = 1, nlist = 8, nprobe = 3)
      .filter(col("query_id") === 100L)
      .select("neighbor_id", "cosine").as[(Long, Double)].collect()
    assert(got.nonEmpty)
    assert(got.head._1 == 101L && math.abs(got.head._2 - 1.0) < 1e-9)
  }

  test("ivf recall vs brute force on the fixture embeddings") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = e.filter(col("vec_id") < 30)
    val brute = SimilarityOps.bruteCosineTopK(queries, e, 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val ivf = SimilarityOps.ivfCosineTopK(e, k = 1, nlist = 16, nprobe = 6)
      .filter(col("query_id") < 30)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val hits = brute.count { case (q, n) => ivf.get(q).contains(n) }
    assert(hits >= 15, s"IVF top-1 recall too low: $hits/30")
  }
}

class SkewOpsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("saltedJoin returns exactly the plain join's rows under heavy skew") {
    // 90% of fact rows share one key
    val fact = (0 until 1000).map(i => (if (i % 10 == 0) i % 7 else 42, s"row$i")).toDF("k", "payload")
    val dim = (0 until 50).map(i => (i, s"dim$i")).toDF("k", "attr")
    val plain = fact.join(dim, Seq("k")).select("k", "payload", "attr")
      .as[(Int, String, String)].collect().toSet
    val salted = SkewOps.saltedJoin(fact, dim, "k", salts = 8)
      .select("k", "payload", "attr").as[(Int, String, String)].collect().toSet
    assert(salted == plain)
    assert(plain.count(_._1 == 42) == 900)
  }

  test("saltedJoin left join keeps unmatched rows once") {
    val fact = Seq((1, "a"), (99, "b")).toDF("k", "payload")
    val dim = Seq((1, "d1")).toDF("k", "attr")
    val got = SkewOps.saltedJoin(fact, dim, "k", salts = 4, joinType = "left")
      .select("k", "payload", "attr").collect()
    assert(got.length == 2)
    assert(got.count(_.isNullAt(2)) == 1)
  }

  test("keyHistogram surfaces the hot key") {
    val fact = (0 until 100).map(i => (if (i < 80) 7 else i, i)).toDF("k", "v")
    val top = SkewOps.keyHistogram(fact, "k", 1).as[(Int, Long)].head()
    assert(top == ((7, 80L)))
  }
}
