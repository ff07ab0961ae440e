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

  test("Lloyd trainer: builds once, grid-snapped, and a further step from " +
       "a fixed point is a no-op") {
    val k = 4
    val c8 = VectorIndex.lloydCentroidArrays(spark, sf, k, 8)
    assert(c8.length == k && c8.forall(_.length == 64))
    // every trained coordinate sits on the 1e-6 grid (the snap is what
    // makes the loop cross-engine replayable)
    c8.flatten.foreach { f =>
      val d = f.toDouble
      val grid = math.floor(d * 1e6 + 0.5) / 1e6
      assert(math.abs(grid.toFloat - f) == 0f, s"$f not float-snapped to grid")
    }
    // reuse: second access must not rewrite
    val files1 = indexFiles(s"lloyd_4x8x64t${VectorIndex.LloydTrainCap}")
    assert(files1.nonEmpty)
    VectorIndex.lloydCentroidArrays(spark, sf, k, 8)
    assert(indexFiles(s"lloyd_4x8x64t${VectorIndex.LloydTrainCap}") == files1)
    // monotone prefix property: iters=7 then one more M-step must give
    // exactly the iters=8 table (the definition km3's final step and
    // the oracle's unrolled CTE chain both rely on)
    val c7 = VectorIndex.lloydCentroidArrays(spark, sf, k, 7)
    val stepped = graft.operators.Similarity.lloydConvergence(spark, sf, k, 8)
      .select("cluster", "dim", "centroid").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getFloat(2))).toMap
    (0 until k).foreach { c =>
      (0 until 64).foreach { i =>
        assert(stepped((c, i + 1)) == c8(c)(i),
          s"km3's reported step must equal the persisted iters=8 centroid ($c,$i)")
      }
    }
    assert(c7.flatten.toSeq != c8.flatten.toSeq ||
      graft.operators.Similarity.lloydConvergence(spark, sf, k, 8)
        .filter(!col("dim_converged")).count() == 0,
      "if c7 == c8 the convergence flags must all be true")
  }

  test("Scala-side training assignment equals the codegen argmax expression") {
    // The trainer assigns via Vectors.nearestCellScala (broadcast map);
    // probes and the persisted IVF assignment use the codegen literal
    // argmax. The two must agree on every corpus vector, or training
    // and probing would drift.
    val cents = VectorIndex.lloydCentroidArrays(spark, sf, 4, 8)
    val viaExpr = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        Vectors.nearestCellByDot(cents)(col("embedding")).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaScala = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) ->
        Vectors.nearestCellScala(cents, r.getSeq[Float](1).toArray)).toMap
    assert(viaExpr == viaScala)
  }

  test("bounded training sample: a capped build trains on vec_id % mod == 0 " +
       "and still produces a grid-snapped table") {
    val n = Tables.embeddings(spark, sf).count()
    val cap = math.max(1L, n / 4) // force mod > 1
    val c = VectorIndex.lloydCentroidArrays(spark, sf, 4, 2,
      maxTrainRows = cap)
    assert(c.length == 4 && c.forall(_.length == 64))
    c.flatten.foreach { f =>
      val grid = math.floor(f.toDouble * 1e6 + 0.5) / 1e6
      assert(math.abs(grid.toFloat - f) == 0f, s"$f not float-snapped")
    }
    assert(indexFiles(s"lloyd_4x2x64t$cap").nonEmpty,
      "the cap is part of the index identity")
  }

  test("incremental ANN: base ∪ delta == full index, base untouched; sim10 == sim3") {
    import org.apache.spark.sql.functions.{col, max}
    val maxId = Tables.embeddings(spark, sf)
      .agg(max(col("vec_id"))).head.getLong(0)
    val boundary = maxId * 4 / 5 + 1
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "tbl", "bucket", "bkey").collect()
        .map(_.toString).toSet

    val base = VectorIndex.lshIndexBase(spark, sf, boundary)
    val baseDir = new java.io.File(
      new java.net.URI(base.inputFiles.head)).getParentFile
    def snapshot() = baseDir.listFiles()
      .map(f => (f.getName, f.length, f.lastModified)).toSet
    val before = snapshot()
    val delta = VectorIndex.lshIndexDelta(spark, sf, boundary)
    assert(snapshot() == before,
      "building the delta must not touch any base index file")
    assert(rows(base) ++ rows(delta) == rows(VectorIndex.lshIndex(spark, sf)),
      "bucketing is per-vector pure: base ∪ delta must equal the full index")
    assert(base.select("vec_id").collect().map(_.getLong(0)).forall(_ < boundary))
    assert(delta.select("vec_id").collect().map(_.getLong(0)).forall(_ >= boundary))

    val inc = graft.operators.Similarity.lshAnnIncremental(spark, sf).collect()
    val mono = graft.operators.Similarity.lshAnn(spark, sf).collect()
    assert(inc.map(_.toString).toSeq == mono.map(_.toString).toSeq,
      "the split index must answer identically to the monolithic one")
  }
}
