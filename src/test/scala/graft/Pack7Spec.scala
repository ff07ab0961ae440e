package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-6 additions beyond the graph
  * pack: the prefix-filtered exact Jaccard join (dd19) and BM25
  * ranked retrieval (tx19).
  */
class Pack7Spec extends SparkTestBase {

  test("dd19: prefix-filtered join returns EXACTLY dd2's all-pairs relation") {
    // the lossless-filter claim, checked end-to-end: a different
    // candidate-generation algorithm must land on the identical rows
    val filtered = Dedup.prefixFilterJaccardPairs(spark, sf).collect()
    val allPairs = Dedup.ngramJaccardPairs(spark, sf).collect()
    assert(filtered.length == allPairs.length)
    assert(filtered.map(_.toString).sameElements(allPairs.map(_.toString)))
    assert(filtered.nonEmpty) // non-vacuous at sf0.001
  }

  test("dd19: the prefix relation is a strict subset of the gram relation") {
    val gr = graft.sources.TextIndex.gramIndex(spark, sf, 3)
    val grN = gr.count()
    // reproduce the operator's prefix selection to measure its pruning
    val dfreq = gr.groupBy("gh").agg(count(lit(1)).as("df"))
    val sizes = gr.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df").asc, col("gh").asc)
    val prefN = gr.join(dfreq, "gh")
      .withColumn("pos", row_number().over(w))
      .join(sizes, "doc_id")
      .filter(col("pos") <= col("n") - ceil(lit(0.5) * col("n")).cast("long") + 1)
      .count()
    // t = 0.5 exposes about half of each doc's grams (+1)
    assert(prefN < grN * 6 / 10, s"prefix $prefN of $grN grams — filter not pruning")
    assert(prefN > 0)
  }

  test("tx19: top-k ordered by rounded score, positive, distinct docs") {
    val rows = TextAnalysis.bm25TopDocs(spark, sf).collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getAs[Double]("bm25"))
    assert(scores.forall(_ > 0.0))
    assert(scores.sameElements(scores.sorted.reverse))
    val ids = rows.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == ids.length)
  }

  test("tx19: every returned doc actually contains a query term") {
    val hits = TextAnalysis.bm25TopDocs(spark, sf)
      .join(Tables.documents(spark, sf), "doc_id")
    val offenders = hits.filter(
      !col("text").contains("window") && !col("text").contains("merge") &&
        !col("text").contains("scan")).count()
    assert(offenders == 0)
  }
}
