package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.catalyst.expressions.Literal

import graft.functions.{CosineSimilarity, FirstEqualIndex, HyperplaneBandSigs, JaroWinkler, NfcNormalize, StripAccents, MinHashBandHashes, MinShingleMd5, MlmMaskMd5, MlmMaskXxh, ShingleHashes64, SimHash64, SortedIntersectCount, SortedLongContains, SpanCorruptMd5, TopNgramFrac}

/** SparkSessionExtensions injector: makes the engine's native
  * expressions first-class SQL functions in any session created with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`),
  * so pure-SQL users — spark-sql shell, thrift server, notebooks — get
  * `cosine_sim`, `sorted_intersect_count`, and `first_equal_index`
  * without any Scala import. This is the public, cluster-safe
  * registration path (survives session cloning, unlike temp functions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "", "", "", "", "", "", "built-in")

  private def fn(name: String, usage: String, builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) =
    (FunctionIdentifier(name), info(name, usage), builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("cosine_sim",
      "cosine_sim(array<float>, array<float>) - fused one-pass cosine similarity",
      exprs => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction(fn("sorted_intersect_count",
      "sorted_intersect_count(array<bigint>, array<bigint>) - |A∩B| of sorted arrays",
      exprs => SortedIntersectCount(exprs(0), exprs(1))))
    ext.injectFunction(fn("first_equal_index",
      "first_equal_index(array<bigint>, array<bigint>) - first index where arrays agree, else -1",
      exprs => FirstEqualIndex(exprs(0), exprs(1))))
    ext.injectFunction(fn("sim_hash64",
      "sim_hash64(array<string>) - fused one-pass 64-bit SimHash (xxhash64 family)",
      exprs => SimHash64(exprs(0))))
    ext.injectFunction(fn("min_shingle_md5",
      "min_shingle_md5(array<string>, n) - one-pass min-wise n-token shingle fingerprint (portable md5)",
      exprs => MinShingleMd5(exprs(0), litInt(exprs(1), "min_shingle_md5", "n"))))
    ext.injectFunction(fn("shingle_hashes64",
      "shingle_hashes64(array<string>, n) - sorted distinct xxhash64 set of all n-token shingles",
      exprs => ShingleHashes64(exprs(0), litInt(exprs(1), "shingle_hashes64", "n"))))
    ext.injectFunction(fn("sorted_long_contains",
      "sorted_long_contains(array<bigint> sorted asc, bigint) - binary-search membership",
      exprs => SortedLongContains(exprs(0), exprs(1))))
    ext.injectFunction(fn("top_ngram_frac",
      "top_ngram_frac(array<string>, n) - most frequent word n-gram's share of all n-grams",
      exprs => TopNgramFrac(exprs(0), litInt(exprs(1), "top_ngram_frac", "n"))))
    ext.injectFunction(fn("hyperplane_band_sigs",
      "hyperplane_band_sigs(array<float>, bands, planesPerBand, dim) - fused hyperplane-LSH band signatures",
      exprs => HyperplaneBandSigs(exprs(0),
        litInt(exprs(1), "hyperplane_band_sigs", "bands"),
        litInt(exprs(2), "hyperplane_band_sigs", "planesPerBand"),
        litInt(exprs(3), "hyperplane_band_sigs", "dim"))))
    ext.injectFunction(fn("min_hash_band_hashes",
      "min_hash_band_hashes(array<bigint> token hashes, bands, rowsPerBand) - fused MinHash LSH band hashes",
      exprs => MinHashBandHashes(exprs(0),
        litInt(exprs(1), "min_hash_band_hashes", "bands"),
        litInt(exprs(2), "min_hash_band_hashes", "rowsPerBand"))))
    ext.injectFunction(fn("mlm_mask_md5",
      "mlm_mask_md5(array<bigint>, key string, maskProb, maskToken, vocabSize, seed) - fused portable MLM masking",
      exprs => MlmMaskMd5(exprs(0), exprs(1),
        litDouble(exprs(2), "mlm_mask_md5", "maskProb"),
        litInt(exprs(3), "mlm_mask_md5", "maskToken"),
        litInt(exprs(4), "mlm_mask_md5", "vocabSize"),
        litLong(exprs(5), "mlm_mask_md5", "seed"))))
    ext.injectFunction(fn("mlm_mask_xxh",
      "mlm_mask_xxh(array<int>, key bigint, maskProb, maskToken, vocabSize, seed) - fused production MLM masking",
      exprs => MlmMaskXxh(exprs(0), exprs(1),
        litDouble(exprs(2), "mlm_mask_xxh", "maskProb"),
        litInt(exprs(3), "mlm_mask_xxh", "maskToken"),
        litInt(exprs(4), "mlm_mask_xxh", "vocabSize"),
        litLong(exprs(5), "mlm_mask_xxh", "seed"))))
    ext.injectFunction(fn("span_corrupt_md5",
      "span_corrupt_md5(array<int>, key string, corruptRate, meanSpan, sentinelBase, seed) - fused T5 span corruption",
      exprs => SpanCorruptMd5(exprs(0), exprs(1),
        litDouble(exprs(2), "span_corrupt_md5", "corruptRate"),
        litInt(exprs(3), "span_corrupt_md5", "meanSpan"),
        litInt(exprs(4), "span_corrupt_md5", "sentinelBase"),
        litLong(exprs(5), "span_corrupt_md5", "seed"))))
    ext.injectFunction(fn("jaro_winkler",
      "jaro_winkler(string, string) - Jaro-Winkler similarity (DuckDB-parity semantics)",
      exprs => JaroWinkler(exprs(0), exprs(1))))
    ext.injectFunction(fn("nfc_normalize",
      "nfc_normalize(string) - UAX #15 NFC composition (DuckDB-parity)",
      exprs => NfcNormalize(exprs(0))))
    ext.injectFunction(fn("strip_accents",
      "strip_accents(string) - NFD, drop combining marks, NFC recompose (DuckDB-parity)",
      exprs => StripAccents(exprs(0))))
    ext.injectFunction(fn("cdc_chunks",
      "cdc_chunks(string, maskBits, hashBits) - content-defined (gear-hash CDC) chunk array",
      exprs => graft.functions.CdcChunks(exprs(0),
        litInt(exprs(1), "cdc_chunks", "maskBits"),
        litInt(exprs(2), "cdc_chunks", "hashBits"))))
  }

  /** Extract a literal double argument (SQL decimal literals arrive as
    * DECIMAL — accept exact conversions of int/decimal/double).
    */
  private def litDouble(e: Expression, fn: String, arg: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: Int, _) => v.toDouble
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn: argument '$arg' must be a numeric literal, got $other")
  }

  /** Extract a literal long argument. */
  private def litLong(e: Expression, fn: String, arg: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$fn: argument '$arg' must be an integer literal, got $other")
  }

  /** Extract a literal int argument (the SQL surface for expressions
    * parameterized at plan time).
    */
  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) =>
      // SQL integer literals can parse as BIGINT; accept them only when
      // they fit — silent truncation would turn e.g. 8000000000 into a
      // nonsense parameter instead of an analysis-time error.
      if (v != v.toInt) throw new IllegalArgumentException(
        s"$fn: argument '$arg' must fit in a 32-bit int, got $v")
      v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: argument '$arg' must be an integer literal, got $other")
  }
}
