package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Category-hierarchy dimension (OP-14, reference
  * `src/category_id_map.py:29-52`): 4-char level-2 codes whose first two
  * characters are the level-1 code; dense lv2 ids are positions in the
  * declared code list; lv1 ids come from the code prefix.
  *
  * The dimension is tiny (200 rows in the reference) — always broadcast.
  * The bidirectional maps become two broadcast equi-joins; the lv1
  * derivation is a pure substring, usable without the dim at all.
  */
object CategoryOps {

  /** Build the dimension DataFrame from an ordered code list:
    * (category_id, lv2id = list position, lv1id = int(code[0:2])).
    */
  def categoryDim(spark: SparkSession, codes: Seq[String]): DataFrame = {
    import spark.implicits._
    codes.zipWithIndex.toDF("category_id", "lv2id")
      .withColumn("lv1id", substring(col("category_id"), 1, 2).cast("int"))
  }

  /** Dictionary-encode a dynamic code column when no authoritative list
    * exists: dense ids by sorted distinct order (Q11's construction).
    */
  def dimFromData(df: DataFrame, codeCol: String): DataFrame =
    df.select(col(codeCol).as("category_id")).distinct()
      .withColumn("lv2id", (dense_rank().over(Window.orderBy("category_id")) - 1))
      .withColumn("lv1id", substring(col("category_id"), 1, 2).cast("int"))

  /** category_id string → (lv2id, lv1id) via broadcast join
    * (`category_id_to_lv2id`, reference `:39-41`).
    */
  def attachIds(df: DataFrame, dim: DataFrame, codeCol: String): DataFrame =
    df.join(broadcast(dim.withColumnRenamed("category_id", codeCol)), Seq(codeCol), "left")

  /** lv2id → category string (`lv2id_to_category_id`, reference `:43-44`). */
  def attachCode(df: DataFrame, dim: DataFrame, lv2Col: String): DataFrame =
    df.join(broadcast(dim.select(col("lv2id").as(lv2Col),
      col("category_id").as("category_id_rt"))), Seq(lv2Col), "left")

  /** lv2id → lv1id without strings (`lv2id_to_lv1id`, reference `:50-52`). */
  def lv2ToLv1(df: DataFrame, dim: DataFrame, lv2Col: String): DataFrame =
    df.join(broadcast(dim.select(col("lv2id").as(lv2Col), col("lv1id"))), Seq(lv2Col), "left")
}
