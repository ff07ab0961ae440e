package graft

import graft.functions.Vectors
import graft.sources.VectorIndex
import org.apache.spark.sql.functions._

/** The persisted ANN index layer: built once per (dataset, params),
  * reused afterwards, and byte-for-byte consistent with the inline
  * bucket math the oracle replays.
  */
class VectorIndexSpec extends SparkTestBase {

  // The index dir is <sf-leaf>-<source-fingerprint>/<kind>; the test
  // globs on the leaf prefix rather than reproducing the fingerprint.
  private def indexFiles(kind: String): Map[String, Long] = {
    val root = java.nio.file.Paths.get("target", "graft-index").toFile
    val leaf = java.nio.file.Paths.get(sf).getFileName.toString
    Option(root.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith(leaf + "-"))
      .flatMap { d =>
        val k = new java.io.File(d, kind)
        if (!k.isDirectory) Array.empty[(String, Long)]
        else k.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => s"${d.getName}/${f.getName}" -> f.lastModified())
      }.toMap
  }

  test("LSH index builds once: a second access reuses the same files") {
    val n = Tables.embeddings(spark, sf).count()
    val idx1 = VectorIndex.lshIndex(spark, sf)
    assert(idx1.count() == n * 8, "one row per (vector, table)")
    val files1 = indexFiles("lsh_8x4x64")
    assert(files1.nonEmpty)
    VectorIndex.lshIndex(spark, sf).count()
    assert(indexFiles("lsh_8x4x64") == files1,
      "second access must not rewrite the index")
  }

  test("index bucket assignment equals inline recomputation") {
    val idx = VectorIndex.lshIndex(spark, sf)
      .select("vec_id", "tbl", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val tb = (0 until 8).map { t =>
      val planes = Vectors.randomPlanes(4, 64, 42L + t)
      struct(lit(t).as("tbl"),
        Vectors.lshBucket(col("embedding"), planes).as("bucket"))
    }
    val inline = Tables.embeddings(spark, sf)
      .select(col("vec_id"), explode(array(tb: _*)).as("e"))
      .select(col("vec_id"), col("e.tbl"), col("e.bucket")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(idx == inline, "persisted buckets must equal the inline math")
  }

  test("bkey probe key is consistent with (tbl, bucket)") {
    val bad = VectorIndex.lshIndex(spark, sf)
      .filter(col("bkey") =!= col("tbl").cast("long") * 65536L + col("bucket"))
      .count()
    assert(bad == 0)
  }
}
