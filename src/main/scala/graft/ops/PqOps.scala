package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  /** IVF-PQ ADC search (Jégou et al. 2011's full construction) — the
    * 100 TB ANN deployment shape: an IVF coarse quantizer prunes the
    * corpus to `nprobe` inverted lists per query, and within the
    * probed lists candidates are ranked by the O(m) PQ table walk
    * over their `m`-byte codes. Composes [[SimilarityOps.ivfCosineSearch]]'s
    * deterministic index (md5-ordered centroid pick, fused
    * [[graft.functions.TopCentroids]] assignment) with this object's
    * PQ train/encode/ADC.
    *
    * `byResidual = true` (the FAISS IVFPQ default) encodes each
    * vector's RESIDUAL against its assigned centroid — residuals
    * cluster far tighter than raw vectors, so the same `m·ksub`
    * codebook budget buys a finer quantization; each (query, probe)
    * pair then gets its own LUT from the query's residual against
    * THAT centroid. `byResidual = false` is the cheaper gated form
    * (one LUT per query, computed before the probe explode) and with
    * `nprobe = nlist` is exactly [[pqSearchADC]] — the differential
    * the spec pins.
    *
    * Scale shape: two narrow corpus passes (assign + encode/train
    * pass per Lloyd round), then the search join keys on the centroid
    * id — probe rows carry an `m·ksub`-double LUT, list rows carry
    * `m` ints; neither side ever shuffles a raw vector. Residual
    * arithmetic is float IEEE (`x − c` per element) on both engines.
    * Returns `(query_id, neighbor_id, adc6, rank)`.
    */
  def ivfPqSearchADC(
      queries: DataFrame, corpus: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4,
      m: Int = 4, ksub: Int = 8, iters: Int = 1, dim: Int = 64,
      byResidual: Boolean = true,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && nlist >= 1 && nprobe >= 1 && nprobe <= nlist,
      s"ivfPqSearchADC: need k,nlist,nprobe >= 1 and nprobe <= nlist")
    // deterministic centroid pick — the ivfCosineSearch contract
    val picked = corpus
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).as("c_id"), col(vecCol).as("c_vec"))
      .orderBy(graft.core.PortableHash.md5Long(col("c_id"), lit("ivf")),
        col("c_id"))
      .limit(nlist)
      .orderBy("c_id")
      .collect()
    require(picked.nonEmpty, "ivfPqSearchADC: empty corpus")
    val mat = new Array[Float](picked.length * dim)
    picked.zipWithIndex.foreach { case (r, c) =>
      val v = r.getSeq[Float](1)
      require(v.length == dim,
        s"ivfPqSearchADC: centroid ${r.get(0)} has dim ${v.length}, expected $dim")
      var j = 0
      while (j < dim) { mat(c * dim + j) = v(j); j += 1 }
    }
    // the centroid VECTOR is staged once per row (element_at on the
    // nested literal inside a transform lambda would re-extract it per
    // ELEMENT — measured 4× on the whole search); zip_with then walks
    // both arrays once
    val centLit = typedLit(picked.map(_.getSeq[Float](1)).toSeq)
    def residual(vec: Column, centroid: Column): Column =
      zip_with(vec, element_at(centLit, centroid + 1),
        (x, c) => (x - c).cast("float"))
    def top(vec: Column, n: Int): Column =
      graft.functions.TopCentroids.topCentroids(vec, mat, dim, n)

    val assigned = validVecs(corpus, vecCol, idCol, dim)
      .select(col("id").as("neighbor_id"), col("vec"),
        element_at(top(col("vec"), 1), 1).as("centroid"))
      .withColumn("enc_vec",
        if (byResidual) residual(col("vec"), col("centroid"))
        else col("vec"))
    val cb = trainCodebooks(assigned, "enc_vec", "neighbor_id",
      m, ksub, iters, dim)
    val enc = assigned.select(col("centroid"), col("neighbor_id"),
      graft.functions.Pq.pqCodes(col("enc_vec"), cb, m, ksub, dim)
        .as("codes"))

    val qv = validVecs(queries, vecCol, idCol, dim)
    val probes =
      if (byResidual)
        qv.select(col("id").as("query_id"), col("vec"),
            explode(slice(top(col("vec"), nprobe), 1, nprobe)).as("centroid"))
          .select(col("query_id"), col("centroid"),
            graft.functions.Pq.pqLutCol(
              residual(col("vec"), col("centroid")), cb, m, ksub, dim)
              .as("lut"))
      else
        qv.select(col("id").as("query_id"),
            graft.functions.Pq.pqLutCol(col("vec"), cb, m, ksub, dim)
              .as("lut"),
            explode(slice(top(col("vec"), nprobe), 1, nprobe)).as("centroid"))
          .select(col("query_id"), col("centroid"), col("lut"))

    val w = Window.partitionBy("query_id")
      .orderBy(col("adc").asc, col("neighbor_id"))
    probes.join(enc, Seq("centroid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc",
        graft.functions.Pq.adcLookup(col("lut"), col("codes"), ksub))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("adc"), 6).as("adc6"), col("rank"))
  }

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
