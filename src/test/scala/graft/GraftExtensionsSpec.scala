package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The extension injector makes the native expressions plain SQL
  * functions in every GraftSession-built session (SharedSpark uses the
  * factory, so they must resolve here with no registration call).
  */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("cosine_sim resolves from SQL via spark.sql.extensions") {
    Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)), (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)))
      .toDF("a", "b").createOrReplaceTempView("ext_t")
    val got = spark.sql("SELECT cosine_sim(a, b) FROM ext_t ORDER BY 1 DESC")
      .as[Double].collect().toSeq
    assert(got == Seq(1.0, 0.0))
  }

  test("sorted_intersect_count and first_equal_index resolve from SQL") {
    val r = spark.sql(
      """SELECT sorted_intersect_count(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS i,
        |       first_equal_index(array(7L, 8L, 9L), array(1L, 8L, 9L)) AS f
        |""".stripMargin).as[(Int, Int)].head()
    assert(r == ((2, 1)))
  }

  test("sorted_long_contains and top_ngram_frac resolve from SQL") {
    val r = spark.sql(
      """SELECT sorted_long_contains(array(1L, 5L, 9L), 5L) AS hit,
        |       sorted_long_contains(array(1L, 5L, 9L), 6L) AS miss,
        |       top_ngram_frac(array('a', 'a', 'a'), 2) AS f
        |""".stripMargin).as[(Boolean, Boolean, Double)].head()
    assert(r == ((true, false, 1.0)))
  }

  test("DESCRIBE FUNCTION shows the registered usage text") {
    val desc = spark.sql("DESCRIBE FUNCTION cosine_sim").as[String].collect().mkString("\n")
    assert(desc.contains("cosine_sim"))
  }

  test("parameterized fingerprint/LSH expressions resolve from SQL with literal args") {
    val r = spark.sql(
      """SELECT min_shingle_md5(array('a','b','c','d'), 3) AS fp,
        |       size(hyperplane_band_sigs(array(CAST(0.5 AS FLOAT), CAST(-0.25 AS FLOAT)), 4, 4, 2)) AS nb
        |""".stripMargin).as[(Long, Int)].head()
    assert(r._1 > 0 && r._2 == 4)
    val err = intercept[Exception] {
      spark.sql("SELECT min_shingle_md5(array('a'), CAST(rand() * 3 AS INT))").collect()
    }
    assert(err.getMessage.contains("integer literal"))
  }

  test("an out-of-int-range BIGINT literal parameter is an analysis error, not a truncation") {
    val err = intercept[Exception] {
      spark.sql("SELECT min_shingle_md5(array('a','b'), 8000000000)").collect()
    }
    assert(err.getMessage.contains("32-bit"), s"got: ${err.getMessage}")
    // an in-range BIGINT literal (the 2L suffix parses as a LONG literal) is accepted
    val ok = spark.sql("SELECT min_shingle_md5(array('a','b','c'), 2L) AS fp")
      .as[Long].head()
    assert(ok != 0L)
  }

  test("masking / span-corruption / banding expressions resolve from SQL") {
    val bands = spark.sql(
      "SELECT size(min_hash_band_hashes(array(1L, 2L, 3L), 4, 4)) AS nb")
      .as[Int].head()
    assert(bands == 4)
    val mlm = spark.sql(
      """SELECT mlm_mask_md5(array(1L, 2L, 3L, 4L), 'k1', 0.25, 103, 1000, 0) AS m""")
      .select(col("m.ids")).as[Seq[Long]].head()
    assert(mlm.length == 4)
    val sc = spark.sql(
      """SELECT span_corrupt_md5(array(1, 2, 3, 4, 5), 'doc1', 0.3, 2, 1000, 0) AS s""")
      .select(col("s.input_ids"), col("s.target_ids"), col("s.n_corrupted"))
      .as[(Seq[Int], Seq[Int], Int)].head()
    // reassembly invariant holds through the SQL surface too
    val spans = {
      var m = Map.empty[Int, Seq[Int]]; var cur = -1
      sc._2.foreach(t => if (t >= 1000) { cur = t; m += cur -> Seq() }
        else m += cur -> (m(cur) :+ t))
      m
    }
    val rebuilt = sc._1.flatMap(t => if (t >= 1000) spans(t) else Seq(t))
    assert(rebuilt == Seq(1, 2, 3, 4, 5))
    // a non-literal probability is an analysis error
    val err = intercept[Exception] {
      spark.sql("SELECT mlm_mask_md5(array(1L), 'k', rand(), 1, 10, 0)").collect()
    }
    assert(err.getMessage.contains("numeric literal"))
  }

  test("jaro_winkler resolves from SQL with the golden Winkler value") {
    val r = spark.sql(
      "SELECT jaro_winkler('DWAYNE', 'DUANE') AS jw").as[Double].head()
    assert(r == 0.8400000000000001)
  }

  test("nfc_normalize and strip_accents resolve from SQL") {
    val r = spark.sql(
      "SELECT strip_accents('caf\u00e9') AS a, nfc_normalize('cafe\u0301') AS b")
      .as[(String, String)].head()
    assert(r == (("cafe", "caf\u00e9")))
  }

  test("cdc_chunks resolves from SQL and rejoins losslessly") {
    val r = spark.sql(
      "SELECT cdc_chunks('the quick brown fox jumps over the lazy dog', " +
        "6, 20) AS c").as[Seq[String]].head()
    assert(r.mkString == "the quick brown fox jumps over the lazy dog")
  }
}
