package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus-selection pipeline (north-star M6 capstone): the
  * composition a pre-training data pipeline actually runs — language
  * filter, quality floor, length band, near-dup removal — as ONE
  * declarative plan. Each stage is an operator that already exists on
  * its own (tx4 quality, dd2/dd5 near-dup); composing them keeps
  * Catalyst free to pipeline the filters into the scan and reuse the
  * gram-hash shuffle, instead of materializing intermediate corpora
  * (what file-at-a-time pipelines do, and the single biggest waste at
  * 100 TB — every materialization is a full write+read of the corpus).
  */
object Pipeline {

  /** DP1: the final kept corpus: English docs, quality >= floor,
    * token count in [20, 2000], not the dropped side of any near-dup
    * pair. Output is the keep-list with its audit columns.
    */
  def corpusSelect(s: SparkSession, d: String,
                   qualityFloor: Double = 0.55,
                   jaccardThreshold: Double = 0.5): DataFrame =
    corpusSelectFrom(s, d,
      Dedup.ngramJaccardPairsRaw(s, d, jaccardThreshold), qualityFloor)

  /** Corpus selection over ANY (…, doc_b, …) near-dup pair relation.
    * The exact pair source (DD2) is the small-scale default; at 100 TB
    * the same plan runs with `Dedup.minhashLshPairsRaw` (DD3) — banded
    * candidates, never all-pairs — which is exactly the composition
    * registered as dp11_corpus_select_lsh.
    */
  def corpusSelectFrom(s: SparkSession, d: String, pairs: DataFrame,
                       qualityFloor: Double = 0.55): DataFrame = {
    val quality = TextAnalysis.qualityScoreRaw(s, d) // (doc_id, quality)
    val drops = pairs.select(col("doc_b").as("doc_id")).distinct()
    Tables.documents(s, d)
      .filter(col("lang") === "en")
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .filter(col("n_tokens").between(20, 2000))
      .join(quality, Seq("doc_id"))
      .filter(col("quality") >= qualityFloor)
      .join(drops, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("n_tokens"), col("quality"))
      .orderBy("doc_id")
  }
}
