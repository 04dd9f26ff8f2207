package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RECORD LINKAGE (entity resolution): find pairs of records whose
  * linkage keys are nearly identical — the blocking + compare
  * architecture (Fellegi–Sunter shape) with
  * [[graft.functions.JaroWinkler]] as the comparator: order-tolerant
  * and prefix-boosted, the standard scorer for person/company-name
  * keys where Levenshtein (`DedupOps.editKeepers`) over-penalizes
  * swapped tokens.
  */
object LinkageOps {

  /** Within-`blockCol` candidate pairs `(id_a, id_b, jw)` with
    * `jaroWinkler(key_a, key_b) >= threshold`, `id_a < id_b`.
    *
    * Scale shape: the self-join keys on the BLOCK column, so each
    * block is one shuffle partition's local quadratic — the classic
    * linkage contract: blocking bounds the candidate space (pick
    * blocks like region+zip, not gender). The JW compare runs inside
    * the join's generated stage; only (block, id, key) rows shuffle.
    * Per-block cost is |block|² comparisons by design — cap or split
    * oversized blocks upstream ([[SkewOps.keyHistogram]] probes for
    * that decision).
    */
  def jaroLinkagePairs(
      df: DataFrame, keyCol: String, idCol: String, blockCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val a = df.select(col(blockCol).as("__blk"), col(idCol).as("id_a"),
      col(keyCol).as("__ka"))
    val b = df.select(col(blockCol).as("__blk"), col(idCol).as("id_b"),
      col(keyCol).as("__kb"))
    val jw = graft.functions.JaroWinkler.jaroWinkler(col("__ka"), col("__kb"))
    a.join(b, "__blk")
      .filter(col("id_a") < col("id_b"))
      .withColumn("jw", jw)
      .filter(col("jw") >= threshold)
      .select("id_a", "id_b", "jw")
  }
}
