package graft.sources

import graft.Tables
import graft.functions.Vectors
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN indexes over the `embeddings` table — the build-once
  * side of the similarity-search scale path. Round-3 `sim3`/`sim4`
  * re-bucketed (LSH) / re-assigned (IVF) the WHOLE corpus inside every
  * query; an index is precisely the artifact that amortizes that work
  * across queries, so it is materialized once per (dataset, params)
  * into a parquet layout laid out for probing:
  *
  *  - rows are range-partitioned and sorted by the probe key
  *    (`bkey` = table·2^16 + bucket for LSH; `cell` for IVF), so a
  *    probe's `IN (...)` filter prunes at parquet row-group statistics
  *    level — at 100 TB a query touches only the files holding its
  *    buckets, never the corpus;
  *  - the embedding travels WITH the key, so the exact re-rank needs
  *    no join back to the base table.
  *
  * Contents are fully deterministic (seeded hyperplanes / seed
  * centroids), which is what lets the DuckDB oracle recompute the
  * index inline and hash-check the probing queries (OracleGen.sim*).
  *
  * Lifecycle: `target/graft-index/<sf-leaf>/<kind>`; built lazily on
  * first use (guarded by parquet's `_SUCCESS` marker + object lock),
  * reused by every later query in any JVM. Param changes land in a
  * fresh `kind` directory.
  */
object VectorIndex {

  private def indexPath(d: String, kind: String): java.nio.file.Path =
    java.nio.file.Paths.get("target", "graft-index",
      java.nio.file.Paths.get(d).getFileName.toString, kind)

  private def ensure(path: java.nio.file.Path)(build: => Unit): Unit =
    synchronized {
      if (!java.nio.file.Files.exists(path.resolve("_SUCCESS"))) build
    }

  /** Multi-table hyperplane-LSH index: one (vec_id, embedding, tbl,
    * bucket, bkey) row per (vector, table). Same plane family as
    * round 3's inline form (L tables × p planes, seeds 42+t), so
    * probe results — and the sim8 recall audit — are unchanged.
    */
  def lshIndex(s: SparkSession, d: String,
               numTables: Int = 8, planesPerTable: Int = 4,
               dim: Int = 64): DataFrame = {
    val path = indexPath(d, s"lsh_${numTables}x$planesPerTable")
    ensure(path) {
      val tb = (0 until numTables).map { t =>
        val planes = Vectors.randomPlanes(planesPerTable, dim, 42L + t)
        struct(lit(t).as("tbl"),
          Vectors.lshBucket(col("embedding"), planes).as("bucket"))
      }
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"), explode(array(tb: _*)).as("e"))
        .select(col("vec_id"), col("embedding"),
          col("e.tbl").as("tbl"), col("e.bucket").as("bucket"),
          (col("e.tbl").cast("long") * lit(65536L) + col("e.bucket")).as("bkey"))
        .repartitionByRange(col("bkey"))
        .sortWithinPartitions("bkey")
        .write.mode("overwrite").parquet(path.toString)
    }
    s.read.parquet(path.toString)
  }

  /** IVF (coarse-quantizer) index: (vec_id, embedding, cell), cell
    * assigned by the caller-supplied rule — the SAME `cellOf`
    * projection the query side uses for probe selection, passed in so
    * build and probe can never drift.
    */
  def ivfIndex(s: SparkSession, d: String, numCells: Int)
              (cellOf: Column => Column): DataFrame = {
    val path = indexPath(d, s"ivf_$numCells")
    ensure(path) {
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          cellOf(col("embedding")).as("cell"))
        .repartitionByRange(col("cell"))
        .sortWithinPartitions("cell")
        .write.mode("overwrite").parquet(path.toString)
    }
    s.read.parquet(path.toString)
  }
}
