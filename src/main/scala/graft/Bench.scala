package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{DedupOps, MaskingOps, SimilarityOps}

/** Per-round benchmark runner: prints ONE JSON line with per-query
  * wall-clock over `SPARK_GRAFT_SF_DIR`.
  *
  * The oracle registry's exact-pairwise dedup validators (q18/q21/q22/
  * q23) are deliberately O(n²)-by-contract — they exist to hash-check
  * the scale paths at fixture scale, and benching them at sf0.1 only
  * measures the cross product. Bench swaps them for the production
  * formulations of the same operators (the `dedupKeepers` decision path,
  * SimHash banding, hyperplane-LSH cosine top-k) so the recorded numbers
  * reflect the engine's actual 100 TB-shaped plans.
  */
object Bench {

  /** Quadratic-by-design oracle validators excluded from timing. */
  private val excluded = Set(
    "q18_dedup", "q21_dedup_minhash", "q22_dedup_ngram", "q23_dedup_cosine")

  /** Evaluation-forcing action: xxhash64 of EVERY output column, folded
    * with bit_xor. Under a bare `count()` Catalyst is free to prune
    * deterministic projections entirely (a per-row-transform query would
    * time as a parquet row count); hashing the full row forces every
    * projection to actually evaluate while still aggregating to one
    * driver-side value. bit_xor, not sum: summing 64-bit hashes
    * overflows Long under ANSI mode.
    */
  private def force(df: DataFrame): Unit =
    df.select(xxhash64(struct(df.columns.map(col): _*)).as("__h"))
      .agg(expr("bit_xor(__h)")).collect()

  /** Production-path scale benches. Correctness of each operator is
    * pinned by its oracle variant and/or unit spec; these rows record
    * the xxhash64/codegen formulations on the scale fixture.
    */
  private[graft] def scaleBenches: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the dedup DECISION path: keep/drop per doc, linear in docs × bands
    "b_minhash_lsh" -> ((s, dir) =>
      DedupOps.dedupKeepers(Tables.documents(s, dir), "text", "doc_id", 0.6)),
    // the pair-level form — output is inherently quadratic on the
    // duplicate-dense fixture (kept for comparison with the decision path)
    "b_minhash_pairs" -> ((s, dir) =>
      DedupOps.minHashDedup(Tables.documents(s, dir), "text", "doc_id", 0.6)),
    // ingest-shaped workload: dedup a 20% batch against the 80% corpus
    // (key-derived split), then within itself
    "b_minhash_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val part = pmod(xxhash64(col("doc_id")), lit(5))
      DedupOps.dedupIncremental(
        docs.filter(part =!= 0), docs.filter(part === 0), "text", "doc_id", 0.6)
    }),
    "b_simhash_pairs" -> ((s, dir) =>
      DedupOps.simHashPairs(Tables.documents(s, dir), "text", "doc_id", 3)),
    // the simhash DECISION path (keep/drop per doc, Hamming verify at
    // the bucket join — no pair list, no second shuffle)
    "b_simhash_lsh" -> ((s, dir) =>
      DedupOps.simHashKeepers(Tables.documents(s, dir), "text", "doc_id", 3)),
    "b_lsh_cosine_topk" -> ((s, dir) =>
      SimilarityOps.lshCosineTopK(Tables.embeddings(s, dir), k = 10)),
    "b_ivf_cosine_topk" -> ((s, dir) =>
      SimilarityOps.ivfCosineTopK(Tables.embeddings(s, dir), k = 10, nlist = 32, nprobe = 4)),
    "b_exact_dedup" -> ((s, dir) =>
      DedupOps.exactDupGroups(Tables.documents(s, dir), "text", "doc_id")),
    "b_approx_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir).groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("n"))),
    // production-hash masking (q33/q37 pin the portable-hash semantics;
    // these time the xxhash64 family the engine defaults to at scale)
    "b_mlm_mask_xxh" -> ((s, dir) => {
      val tokIds = transform(split(col("text"), " "),
        t => pmod(xxhash64(t), lit(1000)).cast("int"))
      val m = MaskingOps.mlmMaskXxhFused(tokIds, col("doc_id"),
        maskProb = 0.25, maskToken = 999999, vocabSize = 1000)
      Tables.documents(s, dir).select(col("doc_id"),
        m.getField("ids").as("ids"), m.getField("labels").as("labels"))
    }),
    // end-to-end create_dataloaders shape: text branch (tokenize → id-map
    // → truncate/pad/attention-mask → MLM) joined to the frame branch
    // (slice → pad → frame-mask → MFM); the 2k-row frame side broadcasts.
    // Rows/s from this row is the engine's single-node ETL throughput
    // claim vs the reference's single-process pass (BASELINE.md).
    "b_pipeline_etl" -> ((s, dir) => {
      import graft.ops.{TextOps, VectorOps}
      val ids = transform(TextOps.whitespaceTokenize(col("text")),
        t => pmod(xxhash64(t), lit(1000)).cast("int"))
      val textSide = Tables.documents(s, dir)
        .select(col("doc_id"), ids.as("ids0"))
        .withColumn("ids_t", TextOps.padTo(slice(col("ids0"), 1, 256), 256))
        .withColumn("att", TextOps.attentionMask(col("ids0"), 256))
      val mlm = MaskingOps.mlmMaskXxhFused(col("ids_t"), col("doc_id"),
        maskProb = 0.25, maskToken = 999999, vocabSize = 1000)
      val frames = transform(sequence(lit(0), lit(15)),
        f => slice(col("embedding"), f * 4 + 1, lit(4)))
      val frameSide = Tables.embeddings(s, dir).select(col("vec_id"),
        VectorOps.padFrames(frames, 16, 4).as("frames"),
        VectorOps.frameMask(frames, 16).as("fmask"))
      val mfm = MaskingOps.mfmMask(col("frames"), col("vec_id"),
        maskProb = 0.25, rng = MaskingOps.Xxh)
      textSide.join(frameSide, pmod(col("doc_id"), lit(2000)) === col("vec_id"))
        .select(col("doc_id"),
          mlm.getField("ids").as("mlm_ids"), mlm.getField("labels").as("mlm_labels"),
          col("att"),
          mfm.getField("frames").as("mfm_frames"),
          mfm.getField("labelIdx").as("mfm_label_idx"),
          col("fmask"))
    }),
    "b_mfm_mask_xxh" -> ((s, dir) => {
      val frames = transform(sequence(lit(0), lit(15)),
        f => slice(col("embedding"), f * 4 + 1, lit(4)))
      val m = MaskingOps.mfmMask(frames, col("vec_id"), maskProb = 0.25,
        rng = MaskingOps.Xxh)
      Tables.embeddings(s, dir).select(col("vec_id"),
        m.getField("frames").as("frames"), m.getField("labelIdx").as("label_idx"))
    }))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // events.parquet stores ts as TIMESTAMP(NANOS); see Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: pay the one-time session/codegen/scan setup outside the
    // per-query timings (otherwise the first query absorbs ~5s of it)
    Tables.lineitem(spark, sfDir).count()
    Tables.events(spark, sfDir).count()
    Tables.documents(spark, sfDir).count()
    Tables.embeddings(spark, sfDir).count()
    val benched =
      SparkEntry.queries.view.filterKeys(!excluded.contains(_)).toMap ++ scaleBenches
    // (name, seconds, error): failures are REPORTED, never silently
    // recorded as a plausible timing.
    val results = benched.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { force(fn(spark, sfDir)); None } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
          Some(e.getClass.getSimpleName)
      }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val qs = results.map { case (k, v, err) =>
      "\"" + k + "\":" + (if (err.isDefined) "-1" else v.toString)
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) =>
      "\"" + k + "\":\"" + m + "\""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
