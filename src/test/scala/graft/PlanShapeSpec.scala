package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Plan-SHAPE regression tests: the scale properties the engine is
  * designed around — no accidental cross products anywhere in the
  * registry, broadcast joins on dictionary dims, predicate pushdown
  * reaching the parquet scan — asserted on the physical plan, so a
  * refactor that silently degrades the 100 TB plan fails CI instead of
  * failing on a cluster. Plans are inspected unexecuted (sf0.001 paths
  * only feed schema/statistics).
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** The pre-execution physical plan with the AQE wrapper unwrapped:
    * `AdaptiveSparkPlanExec` is a LEAF node (its `collect` visits only
    * itself), so node-level assertions must walk `initialPlan` — the
    * plan after EnsureRequirements, where exchanges/windows are real
    * operators — or they pass vacuously.
    */
  private def physical(df: DataFrame): org.apache.spark.sql.execution.SparkPlan =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }

  /** Queries where a nested-loop family join IS the contract — each has
    * a bounded broadcast side or is a fixture-scale-only oracle
    * validator, so none becomes a 100 TB cross product:
    *  - q05: deliberate theta join (non-equi predicate), bounded sides;
    *  - q08: `orders × broadcast(1-row percentile)` — the canonical
    *    scalar-broadcast threshold pattern;
    *  - q17: join of two single-row metric aggregates;
    *  - q24: brute-force cosine top-k BASELINE — all (query, corpus)
    *    pairs by definition, bounded query side; the scale paths are
    *    the LSH/IVF variants;
    *  - q18/q22/q23: quadratic-by-design pairwise oracle validators
    *    (excluded from bench for the same reason);
    *  - q54: `docs × broadcast(1-row frequent-span set)` — the same
    *    scalar-broadcast pattern as q08 (CurationOps.scrubFrequentSpans
    *    aggregates the heavy-hitter set to one row by construction);
    *  - q60: `docs × broadcast(1-row BM25 corpus stats)` — ditto;
    *  - q64: `occurrences × broadcast(1-row vocab size V)` — ditto
    *    (CurationOps.perplexity aggregates V to one row by
    *    construction);
    *  - q67: q64's V broadcast plus `docs × broadcast(1-row quantile
    *    cutoff array)` (CurationOps.quantileBuckets) — ditto;
    *  - q70: `tf × broadcast(1-row corpus doc count)` (hashedTfidf's
    *    idf scalar) — ditto;
    *  - q71: `tf × broadcast(L-row label stats)` — the NB label dim is
    *    a bounded dimension (class cardinality) and the fan-out to all
    *    L labels per token IS the scoring contract; plus the 1-row V
    *    broadcast;
    *  - q72: `tf × broadcast(1-row N_target / N_raw totals)` — ditto;
    *  - q77: `embeddings × broadcast(1-row query vector)` for the dense
    *    retriever leg — the q08/q60 scalar-broadcast pattern;
    *  - q79: hard-negative brute-force BASELINE (q24's contract) —
    *    bounded query side, non-equi (id/label inequality) broadcast
    *    join by definition; the scale path is hardNegativesLsh
    *    (swept as b_hard_negatives below).
    */
  private val nestedLoopByContract = Set(
    "q05_theta_join", "q08_set_ops", "q17_eval_f1", "q24_sim_topk",
    "q18_dedup", "q22_dedup_ngram", "q23_dedup_cosine", "q54_span_scrub",
    "q59_curation_chain", // q59 embeds q54's scrub stage
    "q60_bm25", "q64_perplexity", "q67_ppl_buckets",
    "q70_hashed_tfidf", "q71_nb_classifier", "q72_dsir_weights",
    "q77_hybrid_rrf", "q79_hard_negatives",
    // q80: corpus × broadcast(1-row ordered-fold share total) — the
    // q72 1-row-totals pattern over the |strata| dim
    "q80_temperature_mix",
    // q98: pair dim × broadcast(1-row basket total) — the q08 scalar
    // pattern; the pair frame itself comes from a basket-KEYED
    // equi-join, never a cross product
    "q98_market_basket",
    // q100/q101: |categories|-row term frame × broadcast(1-row
    // totals), twice (smoothing totals + PSI total) — scalar pattern
    // over dims whose size is the category/bin count, not the data
    "q100_drift_psi", "q101_numeric_drift",
    // q106/q107: contingency/category dim × broadcast(1-row totals) —
    // the same scalar pattern
    "q106_chi2", "q107_entropy",
    // q111: q24's brute-force run baseline (bounded query side) plus
    // the 20×50 judgment-dim cross — both bounded evaluation dims,
    // never corpus-sized
    "q111_ranking_metrics",
    // q113: ≤bins-row reliability frame × broadcast(1-row N/ECE
    // totals) — the q08 scalar pattern
    "q113_calibration",
    // q116: |categories|-row term frame × broadcast(1-row totals)
    // twice (marginal totals + JSD total) — q100's pattern
    "q116_jsd_drift",
    // q117: vocab-sized PMI frame × broadcast(1-row pair/token
    // totals) — the q08 scalar pattern (the pair groupBy itself is a
    // plain equi-keyed aggregate)
    "q117_pmi",
    // q119: per-node triangle frame × broadcast(1-row global total) —
    // the q08 scalar pattern
    "q119_triangles",
    // q127: scored positions × broadcast(1-row N/V totals) — q64's
    // scalar pattern one LM order up
    "q127_stupid_backoff",
    // q128: value-dim running-sum frame × broadcast(1-row n_a/n_b
    // totals) — the q08 scalar pattern (the dim itself is a plain
    // full-outer value join; the prefix scan shuffles nothing extra)
    "q128_ks_drift",
    // q131: ranked rows × broadcast(1-row n/total) — the q08 scalar
    // pattern (ranks via the range-partitioned zipWithIndex, no
    // unpartitioned window)
    "q131_gini",
    // q132: dim²-row covariance cells × broadcast(1-row n) — the q08
    // scalar pattern over a constant-size matrix frame
    "q132_covariance",
    // q133: dim-row gradient frame × broadcast(1-row n) — ditto
    "q133_logistic_gradient",
    // q154: |a|×|b|-cell MI frame × broadcast(1-row grand total) —
    // the q08 scalar pattern (marginals ride broadcast equi-joins)
    "q154_mutual_info",
    // q156: ≤ k candidate exact counts × broadcast(1-row corpus N)
    // for the minFrac threshold — the q08 scalar pattern
    "q156_heavy_hitters",
    // q157: per-key RFM metric frame × broadcast(1-row corpus max
    // date) for recency — the q08 scalar pattern (scores come from
    // range-partitioned row indexes, swept non-degenerate below)
    "q157_rfm",
    // q159: 2-row variant frame × broadcast(1-row min-variant label)
    // — the q08 scalar pattern
    "q159_ab_ztest",
    // q160: rides q98's pair frame × broadcast(1-row basket total)
    "q160_item_neighbors",
    // q164: ≤9-digit dev frame × broadcast(1-row total, then 1-row
    // MAD) — the q08 scalar pattern twice
    "q164_benford",
    // q165: 2-row variant frame × broadcast(1-row min-variant label)
    // — q159's pattern
    "q165_welch_ttest",
    // q166: per-user lifetime frame × broadcast(1-row corpus max ts)
    // for the censoring edge — the q08 scalar pattern
    "q166_kaplan_meier",
    // q169: ≤ n+1-row report × broadcast(1-row grand total) — the q08
    // scalar pattern
    "q169_contribution",
    // q171: value rows × broadcast(1-row min/max variant labels), and
    // the distinct-value frame × broadcast(maxLag-row lag dim) — the
    // q08 scalar pattern
    "q171_mann_whitney",
    // q173: per-key stats × broadcast(maxLag-row lag dim) grid — the
    // q08 scalar pattern
    "q173_acf",
    // q179: unit rows × broadcast(1-row pooled θ/x̄) — the q08 scalar
    // pattern
    "q179_cuped",
    // q180: rides q98/q160's pair machinery (1-row basket-total
    // broadcast)
    "q180_recommend",
    // q184: term rows × broadcast(1-row corpus doc count) for the
    // smoothed idf — the q08 scalar pattern
    "q184_keywords",
    // q188: G-row bucket dim × broadcast(1-row totals) — the q08
    // scalar pattern
    "q188_jackknife",
    // q189: rows × broadcast(1-row min/max variant labels) — q159's
    // pattern
    "q189_mantel_haenszel",
    // q191: rows × broadcast(1-row corpus max ts) — the q08 scalar
    // pattern
    "q191_decayed_sum",
    // q192: |systems|-row dim × broadcast(1-row normalizer) per MM
    // pass — the q08 scalar pattern
    "q192_bradley_terry",
    // q194: item dim × broadcast(1-row grand total) — the q08 scalar
    // pattern
    "q194_abc",
    // q196: ranked rows × broadcast(1-row population totals) — the
    // q08 scalar pattern
    "q196_gains",
    // q197: split dim × broadcast(1-row leak census) — the q08 scalar
    // pattern
    "q197_leakproof_split",
    // q202: rows × broadcast(1-row global mean) — the q08 scalar
    // pattern
    "q202_target_encoding",
    // q203/q204: category dim × broadcast(1-row totals / ESS) — the
    // q08 scalar pattern
    "q203_importance_weights", "q204_hhi",
    // q206: vocab dim × broadcast(1-row corpus totals) — the q08
    // scalar pattern
    "q206_vocab_coverage",
    // q210: rides twoProportionZ's 2-row variant frame ×
    // broadcast(1-row min-variant label) — q159's pattern
    "q210_funnel_ab",
    // q211: 1-row report × broadcast(1-row median) — the q08 scalar
    // pattern
    "q211_session_report",
    // q214: broadcast(query batch) theta-joined to the m-byte PQ code
    // table — the q24 bounded-query-side contract
    "q214_pq_adc",
    // q219/q220: |domains|-row weight dim × broadcast(1-row total) —
    // the q08 scalar pattern (q220 then equi-joins the plan back)
    "q219_epoch_plan", "q220_epoch_apply",
    // q225: 1-row totals × broadcast(1-row pe term) — scalar meet
    "q225_cohens_kappa",
    // q227: per-group frame × broadcast(1-row overall rates) — the
    // q08 scalar pattern
    "q227_fairness",
    // q229/q233: brute rankings = broadcast(bounded query batch) ×
    // corpus — the q24 contract; the recall/disagreement folds add
    // only keyed joins
    "q229_truncated_recall", "q233_label_noise",
    // q235: rides q65's k-means (k-row centroid meets) + the PSI
    // tail's 1-row totals broadcast — q100's pattern
    "q235_cluster_drift",
    // q236: |domains|-row frame × broadcast(1-row count, then 1-row
    // normalizer) — the q08 scalar pattern
    "q236_doremi_step",
    // q238: ranked rows × broadcast(1-row corpus count) — the q08
    // scalar pattern (the pooled lookup itself is an equi-join)
    "q238_quantile_norm",
    // q242/q245: the q24 bounded-query brute contract again — MMR
    // pools and the retrieval-metrics rankings come from
    // bruteCosineTopK (broadcast(20-anchor batch) × corpus); the MMR
    // greedy and the metrics tails themselves add only keyed
    // joins/groups
    "q242_mmr_rerank", "q245_retrieval_metrics",
    // q247: the composed stack — the exact top-5 baseline is q24's
    // bounded-query brute contract, the PQ stage broadcasts the
    // 20-query LUT batch, and the CI/means tails cross-join two
    // 1-row aggregates (the q08 scalar pattern)
    "q247_retrieval_stack",
    // q249: q247's stack with the candidate stage served from the
    // standing index — same bounded-query brute baseline + 1-row
    // CI/means cross-joins; the indexed search itself is a keyed
    // centroid join over the pruned codes scan
    "q249_indexed_stack",
    // q250: categoricalDrift's ≤nlist-row term frame × broadcast(1-row
    // totals) twice — q100's scalar pattern over the coarse-list dim
    "q250_index_rebuild",
    // q251: the recall curve — the exact baseline is q24's
    // bounded-query brute contract, the query-bounded candidate frame
    // crosses the |nprobes|-row cut dim (broadcast), and the grid is
    // queries × |nprobes| (both evaluation dims, never corpus-sized)
    "q251_nprobe_curve",
    // q252: q251's curve run twice (stale vs rebuilt standing index)
    // over the drift-augmented corpus — same bounded contracts: the
    // 10-query brute baseline, the broadcast 1-row nprobe cut dim,
    // and the queries × 1 grid
    "q252_stale_vs_rebuilt")

  test("no cross-product family joins outside the documented contracts") {
    val offenders = SparkEntry.queries.toSeq
      .filterNot { case (name, _) => nestedLoopByContract.contains(name) }
      .flatMap { case (name, fn) =>
        val p = plan(fn(spark, sfDir))
        if (p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"))
          Some(name)
        else None
      }
    assert(offenders.isEmpty,
      s"cross-product family joins appeared in: ${offenders.mkString(", ")}")
  }

  test("dictionary dims join via broadcast, not shuffle (q03 five-way, q11 hierarchy)") {
    for (name <- Seq("q03_five_way_join", "q11_category_hierarchy")) {
      val p = plan(SparkEntry.queries(name)(spark, sfDir))
      assert(p.contains("BroadcastHashJoin"),
        s"$name lost its broadcast dim join:\n$p")
    }
  }

  test("q01's date filter reaches the parquet scan as a pushed filter") {
    val p = plan(SparkEntry.queries("q01_pricing_summary")(spark, sfDir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed to scan:\n$p")
  }

  test("no unpartitioned window anywhere in the query registry (single-partition coalesce)") {
    // `Window [...] ORDER BY ...` with an empty partition spec prints
    // without a `PARTITION BY`-style partition expression list; the
    // reliable physical signature is WindowExec with an empty partition
    // spec, which Spark itself flags via "No Partition Defined". We
    // assert on the executed plan's Window nodes: each must carry a
    // partition expression.
    // q169's rank/cumulative windows run on the |categories| DIM (the
    // report is ≤ n+1 rows by construction) — the documented
    // report-dim window contract, the window analog of the
    // nestedLoopByContract scalar broadcasts
    val unpartWindowByContract = Set("q169_contribution")
    val offenders = SparkEntry.queries.toSeq
      .filterNot { case (name, _) => unpartWindowByContract.contains(name) }
      .flatMap { case (name, fn) =>
      val windows = physical(fn(spark, sfDir)).collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
      }
      if (windows.nonEmpty) Some(name) else None
    }
    // the sweep must not be vacuous: windowed queries exist in the
    // registry, so SOME WindowExec must be visible to the traversal
    val anyWindow = SparkEntry.queries.toSeq.exists { case (_, fn) =>
      physical(fn(spark, sfDir)).collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.nonEmpty
    }
    assert(anyWindow, "window sweep found no WindowExec at all — traversal is broken")
    assert(offenders.isEmpty,
      s"unpartitioned Window (all rows → one task) in: ${offenders.mkString(", ")}")
  }

  test("bench-only scale paths: no cross products, no unpartitioned windows") {
    // the b_* production formulations are not in SparkEntry.queries, so
    // the registry sweeps above never see them — sweep Bench's map too.
    // b_minhash_pairs has quadratic OUTPUT by contract but its PLAN is
    // a banded equi-join; nothing here may plan a cross product.
    // b_minhash_converged is EXCLUDED: its return value is a persisted,
    // already-materialized frame, so the visible plan is just an
    // InMemoryTableScan (assertions on it would be vacuous) and sweeping
    // it would leave that cache pinned for the rest of the suite; its
    // per-pass plan is the dedupKeepers shape already swept via
    // b_minhash_lsh (pinned equal by DedupKeepersSpec's differential
    // test).
    // b_span_scrub and b_curation_full share q54's documented
    // 1-row-broadcast cross join; b_perplexity shares q64's (the
    // vocabulary size V rides a one-row broadcast) and b_ppl_buckets
    // adds q67's 1-row quantile-cutoff broadcast on top.
    // b_dup_components is excluded for b_minhash_converged's reason:
    // construction RUNS the propagation passes, so the visible plan is
    // a join over an InMemoryTableScan (vacuous to assert on) and the
    // sweep would pin its cache; the per-pass shape is a plain
    // (id, long) equi-join + min agg, swept nowhere else but spec'd in
    // ConnectedComponentsSpec.
    // b_tfidf_vectors/b_tfidf_ann carry q70's 1-row doc-count
    // broadcast, b_nb_classifier q71's L-row label-dim fan-out + 1-row
    // V, b_dsir q72's 1-row totals, b_blocklist the 1-row sorted
    // blocklist-key broadcast, b_temperature_mix q80's 1-row
    // ordered-fold share total, b_market_basket q98's 1-row basket
    // total, b_drift_psi q100's twin 1-row totals — the registry
    // sweep's documented scalar/dim-broadcast contracts (see
    // nestedLoopByContract).
    val offenders = graft.Bench.scaleBenches.toSeq
      .filterNot(n => Set("b_minhash_converged", "b_span_scrub",
        "b_curation_full", "b_perplexity", "b_ppl_buckets",
        "b_dup_components", "b_tfidf_vectors", "b_tfidf_ann",
        "b_nb_classifier", "b_dsir", "b_blocklist",
        "b_temperature_mix", "b_market_basket", "b_drift_psi",
        // b_dup_components_reps runs its propagation at construction
        // (b_dup_components' reason); b_ranking_metrics carries q111's
        // bounded judgment-dim cross by contract; b_calibration q113's
        // 1-row totals broadcast; b_lsh_indexed BUILDS its bucketed
        // index table at construction (side-effecting write — its plan
        // claims are asserted directly in LshBucketCapSpec)
        "b_dup_components_reps", "b_ranking_metrics", "b_calibration",
        "b_lsh_indexed",
        // b_pmi carries q117's 1-row totals broadcast; b_triangles
        // q119's 1-row global-total broadcast; b_pagerank runs its
        // checkpointed passes at construction (b_dup_components'
        // vacuous-plan reason) — per-pass shape spec'd in GraphOpsSpec
        "b_pmi", "b_triangles", "b_pagerank",
        // b_bpe_train runs its 20 checkpointed merge rounds at
        // construction (vacuous final plan); per-round shape spec'd
        // in BpeOpsSpec
        "b_bpe_train",
        // b_ks_drift carries q128's 1-row totals broadcast and runs
        // its two-pass prefix scan at construction (LogicalRDD leaf);
        // b_stupid_backoff q127's 1-row N/V totals broadcast;
        // b_cc_alternating runs its checkpointed star-contraction
        // rounds at construction (b_pagerank's vacuous-plan reason);
        // b_pca trains at construction (treeAggregate job) — its
        // projection plan is pure chains
        "b_ks_drift", "b_stupid_backoff", "b_cc_alternating", "b_pca",
        // b_unigram_lm trains at construction (seed + EM collects —
        // b_bpe_train's reason); the encode plan is a broadcast join
        "b_unigram_lm",
        // b_heavy_hitters carries q156's 1-row corpus-N broadcast for
        // the minFrac threshold (the q08 scalar pattern);
        // b_item_neighbors rides q98's 1-row basket-total broadcast
        // b_kaplan_meier carries q166's 1-row max-ts broadcast
        "b_heavy_hitters", "b_item_neighbors", "b_kaplan_meier",
        // b_pq_adc: broadcast(bounded query batch) theta-joined to
        // the m-byte code table — the q24/q214 contract
        "b_pq_adc")
        .contains(n._1))
      .flatMap { case (name, fn) =>
      val p = physical(fn(spark, sfDir))
      val crossProduct = {
        val s = p.toString
        s.contains("CartesianProduct") || s.contains("BroadcastNestedLoopJoin")
      }
      val unpartWindow = p.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
      }.nonEmpty
      if (crossProduct || unpartWindow) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"degenerate plan in bench scale paths: ${offenders.mkString(", ")}")
  }

  test("LSH occupancy cap adds no exchange: the rank window shares the bucket join's shuffle") {
    // the claim is about the AT-SCALE regime where both banded sides
    // are too big to broadcast (sort-merge join, one exchange per
    // side) — at fixture scale the join is a BroadcastHashJoin and the
    // capped window's exchange would read as +1; disable broadcast to
    // plan the 100 TB shape.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val e = graft.core.Tables.embeddings(spark, sfDir)
    def shuffles(df: DataFrame): Int =
      physical(df).collect { case ex: ShuffleExchangeExec => ex }.size
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val capped = graft.ops.SimilarityOps.lshCosineTopK(e, k = 5, maxBucket = 64)
      val uncapped = graft.ops.SimilarityOps.lshCosineTopK(e, k = 5, maxBucket = 0)
      assert(shuffles(capped) == shuffles(uncapped),
        s"capping must ride the join's own exchange (capped ${shuffles(capped)}, " +
          s"uncapped ${shuffles(uncapped)})")
      // and every window in the capped plan is properly partitioned
      val w = physical(capped).collect {
        case wx: org.apache.spark.sql.execution.window.WindowExec => wx
      }
      assert(w.nonEmpty && w.forall(_.partitionSpec.nonEmpty),
        "no unpartitioned window in the capped plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("exact dedup shuffles only (hash64, id) — no string attribute crosses an exchange") {
    // the groupBy key is xxhash64(normText), NOT the normalized text:
    // at 100 TB a full-text shuffle key would make the exchange payload
    // the corpus itself (VERDICT r4 #1).
    val df = graft.ops.DedupOps.exactDupGroups(
      graft.core.Tables.documents(spark, sfDir), "text", "doc_id")
    val exchanges = physical(df).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.nonEmpty, "expected the hash-partitioned aggregate exchange")
    val stringy = exchanges.filter(_.output.exists(a =>
      a.dataType == org.apache.spark.sql.types.StringType))
    assert(stringy.isEmpty,
      s"string-typed attribute rides the dedup exchange:\n${stringy.mkString("\n")}")
  }

  test("projection-only queries prune the parquet scan to the referenced columns") {
    // q28 reads only (doc_id, text) of the wider documents table
    val p = plan(SparkEntry.queries("q28_fingerprint")(spark, sfDir))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan not pruned to doc_id+text:\n$p")
    // q27 additionally reads n_chars — and nothing more
    val p27 = plan(SparkEntry.queries("q27_token_stats")(spark, sfDir))
    assert(p27.contains("ReadSchema: struct<doc_id:bigint,text:string,n_chars:bigint>"),
      s"scan not pruned to doc_id+text+n_chars:\n$p27")
  }
}
