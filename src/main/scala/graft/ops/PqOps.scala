package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization training, encoding and ADC search over an
  * embedding column — the compressed-index ANN path (Jégou et al.
  * 2011) complementing [[SimilarityOps]]' brute / LSH / IVF legs and
  * the int8 ([[SimilarityOps.quantizeInt8]]) and fp16
  * ([[graft.functions.Fp16Pack]]) storage codecs: a corpus row at
  * rest is `m` small ints (≤1 B each dictionary-encoded) instead of
  * `dim` floats, and search touches only the codes.
  *
  * Everything deterministic and engine-portable, the
  * [[SimilarityOps.kmeansCentroids]] discipline: seeds are the `ksub`
  * smallest-id valid vectors (code c = c-th smallest, per subspace the
  * same rows), each Lloyd round assigns by squared-L2 argmin (ties →
  * lowest code — [[graft.functions.PqEncode]]'s strictly-less scan)
  * and recenters per (subspace, code) at the per-dimension mean
  * ROUNDED to 6 decimals and cast to float; an emptied code keeps its
  * previous entry. A DuckDB oracle replays training, codes and
  * distances bit-for-bit (q214).
  */
object PqOps {

  /** Rows able to participate: non-null, exactly `dim` elements, no
    * null element — [[graft.functions.TopCentroids]]' null contract
    * as a filter (kept local: SimilarityOps' twin is private).
    */
  private def validVecs(
      df: DataFrame, vecCol: String, idCol: String, dim: Int): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .filter(col("vec").isNotNull && size(col("vec")) === dim &&
        !exists(col("vec"), _.isNull))

  /** Row-major `[s][c][j]` codebook (`m·ksub·dim/m` floats).
    *
    * Scale shape (100 TB): per Lloyd round = ONE narrow corpus pass
    * (the fused [[graft.functions.PqEncode]] assignment — no exchange,
    * no blowup) + a posexplode to `(s, code, subvec)` rows — `m`× the
    * row count but the SAME total bytes as the vector column, since
    * each row carries a `dim/m` slice — feeding a map-side-combined
    * partial agg down to `m·ksub` rows + a constant-size driver
    * collect. The returned matrix ships inside the serialized plan of
    * the encode/search expressions, like a broadcast dim.
    */
  def trainCodebooks(
      df: DataFrame, vecCol: String, idCol: String,
      m: Int, ksub: Int, iters: Int, dim: Int): Array[Float] = {
    require(m >= 1 && ksub >= 1 && iters >= 0 && dim >= 1 && dim % m == 0,
      s"need dim ($dim) divisible by m ($m), ksub >= 1, iters >= 0")
    val subdim = dim / m
    val valid = validVecs(df, vecCol, idCol, dim)
    val seeds = valid.orderBy("id").limit(ksub).orderBy("id").select("vec").collect()
    require(seeds.length == ksub,
      s"trainCodebooks: need >= $ksub valid vectors to seed, got ${seeds.length}")
    var cb = new Array[Float](m * ksub * subdim)
    seeds.zipWithIndex.foreach { case (r, c) =>
      val v = r.getSeq[Float](0)
      var s = 0
      while (s < m) {
        var j = 0
        while (j < subdim) {
          cb((s * ksub + c) * subdim + j) = v(s * subdim + j)
          j += 1
        }
        s += 1
      }
    }
    for (_ <- 1 to iters) {
      val aggs = (0 until subdim).map(j =>
        round(avg(element_at(col("v"), j + 1).cast("double")), 6)
          .cast("float").as(s"c$j"))
      val next = cb.clone()
      valid
        .select(col("vec"),
          posexplode(graft.functions.Pq.pqCodes(col("vec"), cb, m, ksub, dim)))
        .withColumnRenamed("pos", "s")
        .withColumnRenamed("col", "code")
        .select(col("s"), col("code"),
          slice(col("vec"), col("s") * lit(subdim) + lit(1), lit(subdim)).as("v"))
        .groupBy("s", "code").agg(aggs.head, aggs.tail: _*)
        .collect().foreach { r =>
          val s = r.getInt(0); val c = r.getInt(1)
          var j = 0
          while (j < subdim) {
            next((s * ksub + c) * subdim + j) = r.getFloat(j + 2)
            j += 1
          }
        }
      cb = next
    }
    cb
  }

  /** `(idCol, codes array<int> length m)` for every valid vector —
    * the corpus-at-rest form. One narrow fused pass.
    */
  def pqEncode(
      df: DataFrame, vecCol: String, idCol: String,
      cb: Array[Float], m: Int, ksub: Int, dim: Int): DataFrame =
    validVecs(df, vecCol, idCol, dim)
      .select(col("id").as(idCol),
        graft.functions.Pq.pqCodes(col("vec"), cb, m, ksub, dim).as("codes"))

  /** ADC top-`k`: train on `corpus`, encode it once, give each query
    * its `m·ksub` lookup table, and rank candidates by the O(m) table
    * walk — ascending distance, `neighbor_id` tiebreak, self-pairs
    * excluded on id collision. Returns
    * `(query_id, neighbor_id, adc6, rank)` with the distance rounded
    * to 6 decimals (ranking uses the raw double — bit-identical
    * across engines by the accumulation-order contract).
    *
    * Scale shape: queries (with tables, `m·ksub` doubles each)
    * broadcast against the encoded corpus — corpus rows carry `m`
    * ints, never their vectors, so the scan side of the join is
    * ~`4m` B/row; the window partitions by query over k-bounded
    * candidate sets. Compose with an IVF/LSH blocking stage upstream
    * when |Q|·|C| pairs are too many even at O(m) each.
    */
  def pqSearchADC(
      queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int = 4, ksub: Int = 8, iters: Int = 1, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cb = trainCodebooks(corpus, vecCol, idCol, m, ksub, iters, dim)
    val enc = pqEncode(corpus, vecCol, idCol, cb, m, ksub, dim)
      .withColumnRenamed(idCol, "neighbor_id")
    val q = validVecs(queries, vecCol, idCol, dim)
      .select(col("id").as("query_id"),
        graft.functions.Pq.pqLutCol(col("vec"), cb, m, ksub, dim).as("lut"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc").asc, col("neighbor_id"))
    broadcast(q).join(enc, col("query_id") =!= col("neighbor_id"))
      .withColumn("adc",
        graft.functions.Pq.adcLookup(col("lut"), col("codes"), ksub))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("adc"), 6).as("adc6"), col("rank"))
  }
}
