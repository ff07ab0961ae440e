package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink surface beyond plain parquet scans (SURVEY.md §2.1):
  * canonicalization into layouts that keep working at 100 TB.
  *
  *  - Date-partitioned fact tables: `.write.partitionBy(y, m)` so
  *    time-range queries prune whole directories (PartitionFilters,
  *    not data filters) — the Spark-native version of the reference's
  *    create_time prefix filters (`DatabaseAccessor.py:107`).
  *  - Bucketed tables: `.bucketBy(n, key)` so repeated fact-fact joins
  *    on the key are co-located — no exchange on either side at query
  *    time; the shuffle is paid once at write time.
  */
object Ingest {

  /** Canonicalize orders into a year/month-partitioned parquet layout. */
  def writeOrdersPartitioned(s: SparkSession, sfDir: String, outDir: String): Unit =
    Tables.orders(s, sfDir)
      .withColumn("y", year(col("o_orderdate")))
      .withColumn("m", month(col("o_orderdate")))
      .write.mode("overwrite")
      .partitionBy("y", "m")
      .parquet(outDir)

  /** Read back a partitioned layout (partition columns become y/m). */
  def readPartitioned(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(dir)

  /** Write orders + lineitem bucketed by the join key into `database`
    * (both 8 buckets on the orderkey): subsequent joins are
    * exchange-free on both sides.
    */
  def writeBucketedJoinTables(s: SparkSession, sfDir: String,
                              database: String, buckets: Int = 8): Unit = {
    s.sql(s"CREATE DATABASE IF NOT EXISTS $database")
    Tables.orders(s, sfDir).write.mode("overwrite")
      .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(s"$database.orders_bucketed")
    Tables.lineitem(s, sfDir).write.mode("overwrite")
      .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable(s"$database.lineitem_bucketed")
  }

  /** The co-located join over the bucketed tables. */
  def bucketedJoin(s: SparkSession, database: String): DataFrame =
    s.table(s"$database.lineitem_bucketed")
      .join(s.table(s"$database.orders_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("total"))

  /** Small-file compaction — the table-maintenance pass every
    * long-running ingest needs: streaming/append sinks leave thousands
    * of KB-sized files whose per-file open/footer costs eventually
    * dominate scans. Rewrites a directory into ceil(bytes/target)
    * files via a round-robin repartition (no key skew: output files
    * are uniformly sized, unlike coalesce which merges adjacent
    * in-memory partitions unevenly and can under-parallelize the
    * write). Returns the file count written.
    */
  def compact(s: SparkSession, inDir: String, outDir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val df = s.read.parquet(inDir)
    // Size via ONE recursive listing (listFiles returns located status
    // batches — no per-file RPC): a per-file getFileStatus loop would
    // cost O(n) sequential namenode round trips on exactly the
    // many-small-files input this method exists to fix, and a
    // non-recursive listing would see 0 bytes under partitioned
    // layouts and funnel everything through one task.
    val root = new org.apache.hadoop.fs.Path(inDir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    var totalBytes = 0L
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) totalBytes += f.getLen
    }
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    df.repartition(nFiles)
      .write.mode("overwrite").parquet(outDir)
    nFiles
  }
}
