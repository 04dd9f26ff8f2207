package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Join helpers beyond plain equi-joins.
  *
  * The reference attaches features to annotations BY ARRAY POSITION
  * (OP-22, `src/data_helper.py:29-30`) — a single-node artifact. The
  * engine rule is to join on id (OP-23); `positionalJoin` exists for
  * ingest-time compatibility with index-aligned inputs and is
  * implemented with `RDD.zipWithIndex` (one pass to count partition
  * sizes, no shuffle beyond the final equi-join).
  */
object JoinOps {

  /** Stable 0-based row index in the DataFrame's current order.
    * Unlike `monotonically_increasing_id`, indices are dense and
    * positional. Triggers one extra job (partition-size count).
    */
  def withRowIndex(df: DataFrame, indexCol: String = "row_index"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(indexCol, LongType, nullable = false))
    val rdd = df.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** OP-22 positional zip join: pair the i-th row of `left` with the
    * i-th row of `right` (current orders). Prefer key joins; this is
    * for index-aligned ingest only.
    */
  def positionalJoin(left: DataFrame, right: DataFrame): DataFrame =
    withRowIndex(left, "__zip_idx").join(
      withRowIndex(right, "__zip_idx"), "__zip_idx").drop("__zip_idx")
}
