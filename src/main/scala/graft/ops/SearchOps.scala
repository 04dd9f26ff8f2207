package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword-search scoring over the document corpus — the lexical
  * counterpart of the embedding ANN paths in [[SimilarityOps]].
  *
  * Scale shape (100 TB): a keyword query is a handful of terms, so
  * every corpus-level statistic BM25 needs (N, avg doc length, per-term
  * document frequency) fits in ONE aggregate row computed in a single
  * corpus pass and broadcast back; per-doc term frequencies are pure
  * column algebra inside the scan, and the final top-k is Spark's
  * TakeOrderedAndProject (per-partition partial top-k, no global sort).
  * Document text never crosses an exchange.
  */
object SearchOps {

  /** Corpus vocabulary: the `maxSize` most frequent whitespace tokens
    * as (token, occurrence count, dense id), ids assigned by count
    * descending with token ascending as the deterministic tiebreak —
    * the tokenizer-training input (write `token` in id order and
    * [[graft.io.Sources.readVocab]] reads it back into
    * [[graft.functions.WordPieceTokenize]]).
    *
    * Scale shape: counting is one map-side-combined shuffle of
    * (token, partial count) — distinct-tokens-sized, not corpus-sized;
    * the top-`maxSize` cut is TakeOrdered (per-partition partial
    * top-k); ids come from the zipWithIndex pattern
    * ([[JoinOps.withRowIndex]] over the range-partitioned sort), never
    * an unpartitioned window.
    */
  def buildVocab(df: DataFrame, textCol: String, maxSize: Int): DataFrame = {
    val counted = df
      .select(explode(TextOps.whitespaceTokenize(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(maxSize)
    JoinOps.withRowIndex(
      counted.sort(col("n").desc, col("token")), "id")
  }

  /** BM25 (Lucene idf form) top-k: (idCol, score) for the `k`
    * best-scoring docs against `query` terms, score descending with
    * `idCol` ascending as the deterministic tiebreak. Docs matching no
    * term score 0 and still rank (filter upstream if unwanted).
    * `k1`/`b` are the standard saturation/length-normalization knobs.
    *
    * The term sum folds LEFT-TO-RIGHT in query order with plain IEEE
    * double arithmetic (+ one `ln` per term), so a SQL oracle can
    * replay scores exactly.
    */
  def bm25TopK(
      df: DataFrame, textCol: String, idCol: String,
      query: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "bm25TopK: empty query")
    val toks = TextOps.whitespaceTokenize(col(textCol))
    // one corpus pass: N, average doc length, df per query term
    val statAggs =
      count(lit(1)).cast("double").as("n_docs") +:
      avg(size(toks).cast("double")).as("avgdl") +:
      query.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(toks, lit(t)), 1L).otherwise(0L))
          .cast("double").as(s"df_$i")
      }
    val stats = df.agg(statAggs.head, statAggs.tail: _*)
    val dl = size(toks).cast("double")
    val score = query.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(toks, x => x === lit(t))).cast("double")
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df_$i") + lit(0.5)) / (col(s"df_$i") + lit(0.5)))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / col("avgdl")))
    }.reduceLeft(_ + _)
    df.crossJoin(broadcast(stats))
      .select(col(idCol), score.as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
