package graft

import graft.operators.Graph
import graft.sources.GraphIndex
import org.apache.spark.sql.DataFrame

/** The persisted graph-index layer: built once per corpus, reused
  * afterwards, and bit-transparent — every consumer reads exactly the
  * rows the inline derivation (which the DuckDB oracles replay)
  * produces.
  */
class GraphIndexSpec extends SparkTestBase {

  private def indexFiles(kindPrefix: String): Map[String, Long] = {
    val root = java.nio.file.Paths.get("target", "graft-index").toFile
    val leaf = java.nio.file.Paths.get(sf).getFileName.toString
    Option(root.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith(leaf + "-"))
      .flatMap { d =>
        d.listFiles().filter(k => k.isDirectory && k.getName.startsWith(kindPrefix))
          .flatMap(k => k.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => s"${d.getName}/${k.getName}/${f.getName}" -> f.lastModified()))
      }.toMap
  }

  private def pairSet(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("trade index builds once: a second access reuses the same files") {
    GraphIndex.tradeEdges(spark, sf).count()
    val files1 = indexFiles("trade_o")
    assert(files1.nonEmpty)
    GraphIndex.tradeEdges(spark, sf).count()
    assert(indexFiles("trade_o") == files1,
      "second access must not rewrite the index")
  }

  test("trade index content equals the inline orders⋈lineitem distinct pairs") {
    assert(pairSet(GraphIndex.tradeEdges(spark, sf)) ==
      pairSet(Graph.tradeEdgesInline(spark, sf)))
  }

  test("weighted trade index equals the inline min-quantity aggregation") {
    def wset(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    import org.apache.spark.sql.functions._
    val inline = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .groupBy((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .agg(min(col("l_quantity")).cast("long").as("w"))
    assert(wset(GraphIndex.tradeWeightedEdges(spark, sf)) == wset(inline))
  }

  test("incremental edge index: base ∪ delta min-merge equals the monolithic relation, base untouched") {
    import org.apache.spark.sql.functions._
    def wset(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val maxKey = Tables.orders(spark, sf)
      .agg(max(col("o_orderkey"))).head.getLong(0)
    val boundary = maxKey * 4 / 5 + 1
    // build base first, snapshot its files, then build the delta —
    // ingest must never read-modify-rewrite the base directory
    GraphIndex.tradeWeightedBase(spark, sf, boundary).count()
    val baseFiles = indexFiles(s"trade_w_lt$boundary")
    assert(baseFiles.nonEmpty)
    val merged = GraphIndex.tradeWeightedMerged(spark, sf, boundary)
    assert(wset(merged) == wset(GraphIndex.tradeWeightedEdges(spark, sf)),
      "slicing on the ingest axis must be invisible after the min-merge")
    assert(indexFiles(s"trade_w_lt$boundary") == baseFiles,
      "delta build must leave the base index files byte-untouched")
  }

  test("basket pair index is unthresholded; filtered view equals inline supportedEdges") {
    // one index serves every minSupport — the threshold is a scan filter
    for (ms <- Seq(1, 2, 3))
      assert(pairSet(Graph.supportedEdges(spark, sf, ms)) ==
        pairSet(Graph.supportedEdgesInline(spark, sf, ms)),
        s"minSupport=$ms view must equal the inline derivation")
  }

  test("basket items index equals the inline distinct (ok, pk) relation") {
    import org.apache.spark.sql.functions.col
    val inline = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    assert(pairSet(GraphIndex.basketItems(spark, sf)) == pairSet(inline))
  }
}
