package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket analysis (association rules): pair support /
  * confidence / lift over (basket, item) observations — the classic
  * co-occurrence miner (Agrawal & Srikant 1994's A-priori restricted
  * to pair rules, which is the overwhelmingly common production case).
  *
  * Scale shape: baskets collapse to DISTINCT (basket, item) pairs
  * first (one keyed shuffle with map-side distinct), then pairs form
  * by a self-equi-join ON THE BASKET KEY — output is bounded by
  * sum_b |items_b|² which the caller controls via the item vocabulary
  * (pair mining presumes a bounded catalog per basket, not free
  * text). Item supports are a |vocabulary|-row dim that broadcasts
  * back onto the pair frame; every metric is an exact integer count
  * ratio evaluated in one double division, so it replays anywhere.
  */
object BasketOps {

  /** Pair association rules A → B (directed, A ≠ B):
    * `support = n(A,B) / n_baskets`, `confidence = n(A,B) / n(A)`,
    * `lift = confidence / (n(B) / n_baskets)`. Baskets are the
    * distinct combinations of `basketCols`; multiple occurrences of
    * an item in one basket count once.
    */
  def associationRules(
      df: DataFrame, basketCols: Seq[String], itemCol: String,
      minPairCount: Long = 1L): DataFrame = {
    require(basketCols.nonEmpty, "need at least one basket column")
    val basket = struct(basketCols.map(col): _*).as("__basket")
    val obs = df.select(basket, col(itemCol).as("__item")).distinct()

    // basket total as a 1-row broadcast (the perplexity `v` contract) —
    // no driver action, the scalar rides the plan
    val nBaskets = obs.select("__basket").distinct()
      .agg(count(lit(1)).as("__nb"))
    val itemCounts = obs.groupBy("__item")
      .agg(count(lit(1)).as("__n_item"))

    val a = obs.select(col("__basket"), col("__item").as("item_a"))
    val b = obs.select(col("__basket"), col("__item").as("item_b"))
    val pairs = a.join(b, Seq("__basket"))
      .filter(col("item_a") =!= col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)

    val d = (c: Column) => c.cast("double")
    pairs
      .join(broadcast(itemCounts.withColumnRenamed("__item", "item_a")
        .withColumnRenamed("__n_item", "n_a")), Seq("item_a"))
      .join(broadcast(itemCounts.withColumnRenamed("__item", "item_b")
        .withColumnRenamed("__n_item", "n_b")), Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        (d(col("n_ab")) / d(col("__nb"))).as("support"),
        (d(col("n_ab")) / d(col("n_a"))).as("confidence"),
        (d(col("n_ab")) * d(col("__nb")) / (d(col("n_a")) * d(col("n_b"))))
          .as("lift"))
  }
}
