package graft.core

import org.apache.spark.sql.DataFrame

/** Plan-shape levers shared by the CPU-heavy statistical operators
  * (optimization guide §2.2/§2.4/§6.1 applied to this engine's two
  * recurring local-mode pathologies).
  *
  * 1. [[fanOutSmall]] — the test fixtures are single-row-group parquet
  *    files, so every scan is ONE task no matter how many cores the
  *    session has; an operator whose cost is per-row compute in the
  *    scan stage (round-then-DECIMAL sufficient statistics, md5 draw
  *    chains) runs single-threaded. The fix is the one
  *    [[graft.ops.StatsOps.poissonBootstrapCI]] already documented:
  *    repartition the NARROW projection (a few dozen bytes/row) before
  *    the heavy stage. This helper makes that fan-out SCALE-ADAPTIVE
  *    instead of a per-call-site constant: it fires only when the
  *    optimizer's size estimate says the whole input fits inside ONE
  *    scan split (`spark.sql.files.maxPartitionBytes`) — i.e. the scan
  *    cannot parallelize at all — and is a structural no-op on any
  *    production-sized source, where the scan itself supplies
  *    parallelism. Only order-free downstream math may sit above it
  *    (exact DECIMAL sums, counts, min/max, key-derived hashing):
  *    every caller in this repo qualifies by the engine's own
  *    determinism rules (SURVEY §7.4.2 — no partition-dependent
  *    randomness anywhere).
  *
  * 2. [[localDim]] — iterative estimators (Huber IRLS, MAD gates,
  *    Theil–Sen) join a ≤|groups|-row center dim back over the rows,
  *    per iteration. Left lazy, iteration k's plan NESTS iterations
  *    1..k-1's whole trees, so the quantile windows re-execute
  *    O(iters²) times (the b_curation_full nested-lineage finding, in
  *    miniature). These dims are already `broadcast()`-bound by each
  *    operator's contract — they must fit on the driver anyway — so
  *    collecting them into a LocalRelation costs nothing beyond the
  *    broadcast that was about to happen, and truncates the lineage so
  *    every downstream reference replays a literal table instead of
  *    the subtree that produced it.
  */
object PlanOps {

  /** Round-robin repartition of `df` to the session's default
    * parallelism IFF the optimizer estimates the whole input below one
    * scan split (the single-task-scan case). No-op otherwise, and on
    * single-core sessions.
    */
  def fanOutSmall(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val cores = spark.sparkContext.defaultParallelism
    if (cores <= 1) df
    else {
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      if (bytes <= BigInt(spark.sessionState.conf.filesMaxPartitionBytes))
        df.repartition(cores)
      else df
    }
  }

  /** Materialize a broadcast-sized dim as a LocalRelation: one collect
    * (the size bound is the caller's existing `broadcast()` contract),
    * then a literal local table that downstream plans reference
    * without re-executing the dim's subtree.
    */
  def localDim(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val rows = java.util.Arrays.asList(df.collect(): _*)
    spark.createDataFrame(rows, df.schema)
  }

  /** 3. [[stageNarrow]] — an iterative estimator's cleaned NARROW frame
    * (a key plus a handful of numerics) is re-read by EVERY eager pass
    * the estimator runs: each [[localDim]] collect re-executes the
    * scan + filter + projection (+ [[fanOutSmall]] exchange) lineage
    * from the parquet files. For a K-pass estimator that is K full
    * re-reads to produce the same few-dozen-bytes-per-row frame
    * (guide §5: cache exactly when a frame is reused AND recomputing
    * it costs more than holding it). One eager `localCheckpoint`
    * materializes the narrow frame once; every subsequent pass starts
    * from the in-memory blocks. Values are unchanged — checkpointing
    * only truncates lineage — and the memory bound is the narrow
    * projection itself (MEMORY_AND_DISK spills rather than OOMs at
    * scale, where K re-scans of the pruned columns are what it
    * competes against). Callers: multi-pass estimators only — a
    * single-pass operator gains nothing and pays the materialization.
    */
  def stageNarrow(df: DataFrame): DataFrame = df.localCheckpoint()
}
