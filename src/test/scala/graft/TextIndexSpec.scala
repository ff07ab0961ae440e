package graft

import graft.operators.Dedup
import graft.sources.TextIndex

/** The persisted text-dedup index layer: built once per corpus,
  * reused afterwards, and bit-identical to the inline gram/signature
  * computation the DuckDB oracles replay.
  */
class TextIndexSpec extends SparkTestBase {

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

  test("gram index builds once: a second access reuses the same files") {
    TextIndex.gramIndex(spark, sf, 3, portable = true).count()
    val files1 = indexFiles("grams_3_h60")
    assert(files1.nonEmpty)
    TextIndex.gramIndex(spark, sf, 3, portable = true).count()
    assert(indexFiles("grams_3_h60") == files1,
      "second access must not rewrite the index")
  }

  test("gram index content equals the inline gram relation (both bases)") {
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(asSet(TextIndex.gramIndex(spark, sf, 3, portable = true)) ==
      asSet(Dedup.gramRowsPortable(spark, sf, 3)))
    assert(asSet(TextIndex.gramIndex(spark, sf, 3)) ==
      asSet(Dedup.gramRows(spark, sf, 3)))
  }

  test("repeated-gram catalog: index equals inline build and builds once") {
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val idx = asSet(TextIndex.repeatedGramIndex(spark, sf, 8))
    assert(idx.nonEmpty, "sf corpus should contain repeated 8-grams")
    assert(idx == asSet(Dedup.repeatedGramCatalog(spark, sf, 8, 2L)),
      "persisted catalog must equal the inline count-and-recover chain")
    val files1 = indexFiles("repgrams_8_f2")
    assert(files1.nonEmpty)
    // dd13 must probe this index, not rebuild it
    Dedup.boilerplateSpans(spark, sf).collect()
    assert(indexFiles("repgrams_8_f2") == files1,
      "boilerplateSpans must reuse the catalog, not rewrite it")
    // and every cataloged gram is genuinely repeated at the floor
    assert(idx.forall(_._2 >= 2L))
  }

  test("band index content equals inline banding of the signatures") {
    val idx = TextIndex.bandIndex(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val inline = Dedup.bandedSignatures(
        Dedup.gramRowsPortable(spark, sf, 3), 64, 16).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(idx == inline, "persisted banding must equal the inline chain")
  }

  test("incremental maintenance: base ∪ delta == full index, base files untouched") {
    import org.apache.spark.sql.functions.col
    val maxId = Tables.documents(spark, sf)
      .agg(org.apache.spark.sql.functions.max(col("doc_id"))).head.getLong(0)
    val boundary = maxId * 4 / 5 + 1
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet

    val base = TextIndex.bandIndexBase(spark, sf, boundary)
    // snapshot the base directory BEFORE the delta build
    val baseDir = new java.io.File(
      new java.net.URI(base.inputFiles.head)).getParentFile
    def snapshot() = baseDir.listFiles()
      .map(f => (f.getName, f.length, f.lastModified)).toSet
    val before = snapshot()

    val delta = TextIndex.bandIndexDelta(spark, sf, boundary)
    assert(snapshot() == before,
      "building the delta must not touch any base index file")

    val union = rows(base) ++ rows(delta)
    assert(rows(TextIndex.bandIndex(spark, sf)) == union,
      "base ∪ delta must be row-identical to the full band index")
    assert(rows(base).nonEmpty && rows(delta).nonEmpty)
    assert(rows(base).forall(_._1 < boundary))
    assert(rows(delta).forall(_._1 >= boundary))
  }

  test("compaction folds base + delta into a successor, row-identical to the full index") {
    import org.apache.spark.sql.functions.col
    val maxId = Tables.documents(spark, sf)
      .agg(org.apache.spark.sql.functions.max(col("doc_id"))).head.getLong(0)
    val boundary = maxId * 4 / 5 + 1
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val compacted = TextIndex.compactBandIndex(spark, sf, boundary)
    assert(rows(compacted) == rows(TextIndex.bandIndex(spark, sf)),
      "compaction must be a pure file fold: successor == full index")
    // the successor is re-clustered on the probe key: within every
    // file, (band, bucket) runs are sorted
    import org.apache.spark.sql.functions.input_file_name
    val perFile = compacted
      .select(input_file_name().as("f"), col("band"), col("bucket"))
      .collect().groupBy(_.getString(0))
    perFile.values.foreach { rs =>
      val keys = rs.map(r => (r.getInt(1), r.getString(2))).toSeq
      assert(keys == keys.sorted, "file not sorted on (band, bucket)")
    }
  }

  test("token catalog: equals inline distinct tokens; tx23/tx27 reuse it") {
    import org.apache.spark.sql.functions._
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val idx = asSet(TextIndex.tokenCatalog(spark, sf))
    val inline = asSet(Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("token"))
      .distinct()
      .select(xxhash64(col("token")).as("h"), col("token")))
    assert(idx.nonEmpty && idx == inline,
      "persisted catalog must equal the inline vocabulary")
    val files1 = indexFiles("tokcat_ws")
    assert(files1.nonEmpty)
    // the winner-string probes must reuse the catalog, never rebuild
    // it (and never re-tokenize the corpus for name recovery)
    graft.operators.TextAnalysis.burstiness(spark, sf).collect()
    graft.operators.TextAnalysis.sourceDivergence(spark, sf).collect()
    assert(indexFiles("tokcat_ws") == files1,
      "tx27/tx23 must probe the catalog, not rewrite it")
  }

  test("repeated-gram state: base ∪ delta compaction == from-scratch catalog, base untouched") {
    import org.apache.spark.sql.functions.col
    val maxId = Tables.documents(spark, sf)
      .agg(org.apache.spark.sql.functions.max(col("doc_id"))).head.getLong(0)
    val boundary = maxId * 4 / 5 + 1
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    val base = TextIndex.repGramStateBase(spark, sf, boundary)
    val baseDir = new java.io.File(
      new java.net.URI(base.inputFiles.head)).getParentFile
    def snapshot() = baseDir.listFiles()
      .map(f => (f.getName, f.length, f.lastModified)).toSet
    val before = snapshot()

    val delta = TextIndex.repGramStateDelta(spark, sf, boundary)
    assert(snapshot() == before,
      "building the state delta must not touch any base state file")
    assert(base.count() > 0 && delta.count() > 0)

    // monolithic equivalence: summed states + floor == the from-scratch
    // build dd13/dd22 probe (same rows, including grams repeated only
    // ACROSS the boundary — the non-distributive floor case)
    val compacted = rows(TextIndex.compactRepeatedGramIndex(spark, sf, boundary))
    assert(compacted == rows(TextIndex.repeatedGramIndex(spark, sf, 8)),
      "compacted catalog must be row-identical to the from-scratch build")
    // and the merge genuinely exercises cross-slice addition: some gram
    // must be sub-floor in every single slice yet repeated overall
    val baseOnly = base.filter(col("n_docs") >= 2)
      .select("gram").collect().map(_.getString(0)).toSet
    val deltaOnly = delta.filter(col("n_docs") >= 2)
      .select("gram").collect().map(_.getString(0)).toSet
    val crossOnly = compacted.map(_._1) -- baseOnly -- deltaOnly
    assert(crossOnly.nonEmpty,
      "boundary should split at least one repeated gram across slices")
  }

  test("token catalog: base ∪ delta compaction == from-scratch, base untouched") {
    import org.apache.spark.sql.functions.col
    val maxId = Tables.documents(spark, sf)
      .agg(org.apache.spark.sql.functions.max(col("doc_id"))).head.getLong(0)
    val boundary = maxId * 4 / 5 + 1
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

    val base = TextIndex.tokenCatalogBase(spark, sf, boundary)
    val baseDir = new java.io.File(
      new java.net.URI(base.inputFiles.head)).getParentFile
    def snapshot() = baseDir.listFiles()
      .map(f => (f.getName, f.length, f.lastModified)).toSet
    val before = snapshot()

    val delta = TextIndex.tokenCatalogDelta(spark, sf, boundary)
    assert(snapshot() == before,
      "building the vocabulary delta must not touch any base file")
    assert(base.count() > 0 && delta.count() > 0)

    // the vocabulary union is NOT disjoint (shared tokens live in
    // both slices) — compaction dedups; the result must equal the
    // from-scratch catalog exactly
    assert(rows(TextIndex.compactTokenCatalog(spark, sf, boundary)) ==
      rows(TextIndex.tokenCatalog(spark, sf)),
      "compacted vocabulary must equal the from-scratch catalog")
    assert((rows(base) intersect rows(delta)).nonEmpty,
      "slices should share vocabulary — the dedup must be exercised")
  }

  test("simhash index: base ∪ delta compaction == from-scratch, base untouched") {
    import org.apache.spark.sql.functions.col
    val maxId = Tables.documents(spark, sf)
      .agg(org.apache.spark.sql.functions.max(col("doc_id"))).head.getLong(0)
    val boundary = maxId * 4 / 5 + 1
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val base = TextIndex.simhashIndexBase(spark, sf, boundary)
    val baseDir = new java.io.File(
      new java.net.URI(base.inputFiles.head)).getParentFile
    def snapshot() = baseDir.listFiles()
      .map(f => (f.getName, f.length, f.lastModified)).toSet
    val before = snapshot()

    val delta = TextIndex.simhashIndexDelta(spark, sf, boundary)
    assert(snapshot() == before,
      "building the signature delta must not touch any base file")
    assert(rows(base).forall(_._1 < boundary))
    assert(rows(delta).forall(_._1 >= boundary))
    assert(rows(base).nonEmpty && rows(delta).nonEmpty)
    assert(rows(TextIndex.compactSimhashIndex(spark, sf, boundary)) ==
      rows(TextIndex.simhashIndex(spark, sf)),
      "compacted signatures must equal the from-scratch index")
  }

  test("DD17 incremental pairs == full-corpus LSH pairs involving the batch") {
    import org.apache.spark.sql.functions.col
    val maxId = Tables.documents(spark, sf)
      .agg(org.apache.spark.sql.functions.max(col("doc_id"))).head.getLong(0)
    val boundary = maxId * 4 / 5 + 1
    val inc = Dedup.incrementalLshPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = Dedup.minhashLshPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(_._2 >= boundary).toSet
    assert(inc == full,
      "the incremental path must find exactly the full path's batch pairs")
  }

  test("components index builds once and equals the from-scratch fixpoint") {
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    TextIndex.componentsIndex(spark, sf).count()
    val files1 = indexFiles("comps_t50")
    assert(files1.nonEmpty)
    assert(asSet(TextIndex.componentsIndex(spark, sf)) ==
      asSet(Dedup.componentsFromScratch(spark, sf)),
      "persisted component assignment must equal the fixpoint")
    assert(indexFiles("comps_t50") == files1,
      "second access must not rewrite the index")
    // the routed operator serves the same relation
    assert(asSet(Dedup.dedupComponents(spark, sf)) ==
      asSet(Dedup.componentsFromScratch(spark, sf)))
  }

  test("prefix index builds once and equals the inline prefix relation") {
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    TextIndex.prefixIndex(spark, sf, 3, 0.5).count()
    val files1 = indexFiles("prefix_3_t50")
    assert(files1.nonEmpty)
    assert(asSet(TextIndex.prefixIndex(spark, sf, 3, 0.5)) ==
      asSet(Dedup.prefixRelation(TextIndex.gramIndex(spark, sf, 3), 0.5)),
      "persisted prefix relation must equal the inline computation")
    assert(indexFiles("prefix_3_t50") == files1,
      "second access must not rewrite the index")
  }
}
