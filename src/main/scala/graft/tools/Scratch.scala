package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}

/** Disposable stage-timing probe (not committed). */
object Scratch {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(appName = "scratch")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir)
    t("docs.count")(docs.count())

    val bands = 16; val rowsPerBand = 4
    val banded = docs
      .select(col("doc_id").as("id"),
        graft.functions.MinHashBandHashes.minHashBandHashes(
          graft.ops.DedupOps.hashedTokenSet(col("text")), bands, rowsPerBand).as("band_arr"))
      .select(col("id"), col("band_arr"), posexplode(col("band_arr")))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
    t("banded count")(println("banded=" + banded.count()))
    val l = banded.select(col("band"), col("band_hash"),
      col("id").as("id_a"), col("band_arr").as("ba_a"))
    val r = banded.select(col("band"), col("band_hash"),
      col("id").as("id_b"), col("band_arr").as("ba_b"))
    val joined = l.join(r, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
    t("joined count")(println("joined=" + joined.count()))
    val cands = joined
      .filter(graft.functions.FirstEqualIndex
        .firstEqualIndex(col("ba_a"), col("ba_b")) === col("band"))
      .select("id_a", "id_b")
    t("cands count")(println("cands=" + cands.count()))
    val full = graft.ops.DedupOps.minHashDedup(docs, "text", "doc_id", 0.6)
    t("full minHashDedup")(println("pairs=" + full.count()))
    t("full again")(full.count())
    // bucket-size distribution of the hottest band buckets
    banded.groupBy("band", "band_hash").count()
      .orderBy(desc("count")).limit(10).collect()
      .foreach(r0 => println("[scratch] hot bucket: " + r0))
    spark.stop()
  }
}
