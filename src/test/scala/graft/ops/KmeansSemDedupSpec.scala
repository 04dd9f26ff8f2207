package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Spherical k-means (Lloyd) + SemDeDup contracts: planted angular
  * clusters separate, the iteration is deterministic, invalid vectors
  * stay out of the assignment but keep their rows in the dedup, and
  * every SemDeDup drop is justified by a cosine to its cluster rep.
  */
class KmeansSemDedupSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val Dim = 8

  /** A deterministic unit-ish vector near `axis` with a small
    * id-dependent wobble on the next component.
    */
  private def near(axis: Int, id: Long): Seq[Float] = {
    val v = Array.fill(Dim)(0.0f)
    v(axis) = 1.0f
    v((axis + 1) % Dim) = 0.05f * ((id % 5) + 1)
    v.toSeq
  }

  // three planted angular groups on axes 0, 3, 6
  private def planted = (0L until 30L).map { id =>
    (id, near((id % 3).toInt * 3, id))
  }.toDF("vec_id", "embedding")
    .withColumn("embedding", col("embedding").cast("array<float>"))

  test("planted angular clusters end up internally pure") {
    val out = SimilarityOps.kmeansAssign(
        planted, "embedding", "vec_id", k = 3, iters = 3, dim = Dim)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(out.length == 30)
    // every planted group maps to exactly one cluster, and the three
    // groups use three distinct clusters
    val byGroup = out.groupBy(_._1 % 3).map { case (g, xs) => g -> xs.map(_._2).toSet }
    assert(byGroup.values.forall(_.size == 1), s"impure clusters: $byGroup")
    assert(byGroup.values.flatten.toSet.size == 3)
  }

  test("assignment is deterministic across runs and excludes invalid vectors") {
    val withBad = planted.union(Seq(
      (100L, null.asInstanceOf[Seq[Float]]),              // null vector
      (101L, Seq(1.0f, 2.0f)),                            // wrong dim
      (102L, (0 until Dim).map(_ => 1.0f))                // valid filler
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>")))
    def run() = SimilarityOps.kmeansAssign(
        withBad, "embedding", "vec_id", k = 4, iters = 2, dim = Dim)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    val a = run(); val b = run()
    assert(a == b)
    val ids = a.map(_._1).toSet
    assert(!ids.contains(100L) && !ids.contains(101L) && ids.contains(102L))
  }

  test("a cluster that loses all members keeps its seed centroid (k > groups)") {
    // 2 groups of IDENTICAL vectors, k=5. Seeds by min id: clusters
    // 0,2,4 = axis-0 copies, 1,3 = axis-4 copies. Equal-cosine ties go
    // to the LOWEST cluster, so only clusters 0 and 1 ever win; 2-4 go
    // empty after the first update, keep their seed centroids, and the
    // iteration stays total and deterministic.
    def axisVec(axis: Int): Seq[Float] = {
      val v = Array.fill(Dim)(0.0f); v(axis) = 1.0f; v.toSeq
    }
    val docs = (0L until 20L).map(id => (id, axisVec((id % 2).toInt * 4)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val out = SimilarityOps.kmeansAssign(
        docs, "embedding", "vec_id", k = 5, iters = 3, dim = Dim)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(out.length == 20)
    assert(out.forall { case (id, cl) => cl == (id % 2).toInt })
  }

  test("semDedupKeepers drops exact twins of cluster reps, keeps min id, keeps invalid rows") {
    // the decision is REP-based (one verify per doc, vs the cluster's
    // min-id member) — so plant twins of the reps themselves: id 0 is
    // the axis-0 cluster's rep, id 1 the axis-3 cluster's
    val base = planted
    val twins = Seq(
      (200L, near(0, 0L)),   // exact twin of rep 0 (axis-0 cluster)
      (201L, near(3, 1L)),   // exact twin of rep 1 (axis-3 cluster)
      (202L, null.asInstanceOf[Seq[Float]])
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val out = DedupOps.semDedupKeepers(
        base.union(twins), "embedding", "vec_id", minCosine = 0.999,
        k = 3, iters = 2, dim = Dim)
      .select("vec_id").as[Long].collect().toSet
    // twins lose to their lower-id reps; the null-vector row stays
    assert(!out.contains(200L) && !out.contains(201L))
    assert(out.contains(0L) && out.contains(1L) && out.contains(202L))
  }

  test("every semDedup drop has cosine >= tau to a kept doc in its cluster") {
    val docs = planted
    val tau = 0.98
    val kept = DedupOps.semDedupKeepers(
        docs, "embedding", "vec_id", minCosine = tau, k = 3, iters = 2, dim = Dim)
      .select("vec_id").as[Long].collect().toSet
    val mat = SimilarityOps.kmeansCentroids(
      docs, "embedding", "vec_id", k = 3, iters = 2, dim = Dim)
    val all = SimilarityOps.assignClusters(docs, "embedding", "vec_id", mat, Dim)
      .join(docs, "vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2)))
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      if (na * nb == 0) 0.0 else dot / (na * nb)
    }
    val dropped = all.filterNot(x => kept.contains(x._1))
    assert(dropped.nonEmpty, "fixture should drop at least one (wobble repeats every 5 ids)")
    dropped.foreach { case (id, cl, v) =>
      val rep = all.filter(x => kept.contains(x._1) && x._2 == cl).minBy(_._1)
      assert(cos(v, rep._3) >= tau,
        s"dropped $id has cosine ${cos(v, rep._3)} < $tau to kept rep ${rep._1}")
    }
  }

  test("kmeans assignment plan: one narrow fused pass, no exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val mat = SimilarityOps.kmeansCentroids(
      planted, "embedding", "vec_id", k = 3, iters = 1, dim = Dim)
    val assigned = SimilarityOps.assignClusters(planted, "embedding", "vec_id", mat, Dim)
    val plan = assigned.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    assert(plan.collect { case s: ShuffleExchangeExec => s }.isEmpty,
      s"assignment should be exchange-free:\n$plan")
  }
}
