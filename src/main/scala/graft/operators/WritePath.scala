package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's write path (SURVEY.md §3.2, M3): `insert_order` =
  * mutex → SELECT MAX(order_id)+1 → round/cast fields → timestamp →
  * append (`DatabaseAccessor.py:119-136`).
  *
  * Two id modes, per SURVEY.md §7.2 M3:
  *  - compat: MAX+1, reproducing the reference exactly. Single-writer
  *    only — the reference's mutex doesn't span processes either
  *    (`DatabaseAccessor.py:121,135`), so this mode is for parity
  *    tests, not for a 1000-executor cluster.
  *  - scalable: driver-epoch snowflake-style ids
  *    (`monotonically_increasing_id` offset into a caller-supplied
  *    epoch block), collision-free across executors without any
  *    global MAX scan.
  */
object WritePath {

  /** Build the appended row(s) the compat way: next id = MAX+1, price
    * rounded to 1 decimal (F4, `DatabaseAccessor.py:127`), timestamp
    * formatted 'yyyy-MM-dd HH:mm:ss' (F2, `:130`).
    */
  def insertOrderCompat(existing: DataFrame, newRows: DataFrame): DataFrame = {
    val maxId = existing.agg(coalesce(max(col("o_orderkey")), lit(0L)).as("mx"))
    newRows.crossJoin(maxId)
      .withColumn("o_orderkey",
        col("mx") + row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(lit(0)).orderBy(monotonically_increasing_id())))
      .drop("mx")
      .withColumn("o_totalprice", round(col("o_totalprice"), 1))
      .withColumn("o_orderdate", current_timestamp())
  }

  /** Scalable id assignment: caller allocates an epoch (e.g. batch id
    * << 40); ids are unique per row without scanning existing data.
    */
  def assignScalableIds(newRows: DataFrame, epoch: Long): DataFrame =
    newRows.withColumn("o_orderkey", lit(epoch) + monotonically_increasing_id())

  /** Append to a parquet table directory (the `INSERT INTO` sink, S6). */
  def appendOrders(rows: DataFrame, tableDir: String): Unit =
    rows.write.mode("append").parquet(tableDir)
}
