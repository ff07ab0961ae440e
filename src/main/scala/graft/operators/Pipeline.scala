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

  // --- DP18: filter-funnel attrition report — the per-stage survival
  // table a corpus pipeline publishes next to its dataset card (the
  // C4/RefinedWeb-style "docs in → docs out" funnel): language gate →
  // length gate → quality floor → near-dup drop, the exact stage chain
  // corpusSelect applies, but reporting the ATTRITION instead of the
  // survivors. One scan computes every doc's deepest-surviving stage
  // as cumulative conjunctions inside a single hash-agg (no per-stage
  // re-scan), the drop set comes from the LSH pair relation (the
  // 100 TB candidate source), and the 4-row report is exploded from
  // the one agg row. Exact counts; pct_kept is a per-row ratio. ---
  def filterFunnel(s: SparkSession, d: String,
                   qualityFloor: Double = 0.55,
                   jaccardThreshold: Double = 0.5): DataFrame = {
    val quality = TextAnalysis.qualityScoreRaw(s, d)
    val drops = Dedup.minhashLshPairsRaw(s, d, jaccardThreshold)
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("is_dup", lit(1))
    val m = Tables.documents(s, d)
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .join(quality, Seq("doc_id"))
      .join(drops, Seq("doc_id"), "left_outer")
      .select((col("lang") === "en").cast("long").as("s1"),
        col("n_tokens").between(20, 2000).cast("long").as("lenok"),
        (col("quality") >= qualityFloor).cast("long").as("qok"),
        col("is_dup").isNull.cast("long").as("notdup"))
      .agg(count(lit(1)).as("n0"), sum(col("s1")).as("n1"),
        sum(col("s1") * col("lenok")).as("n2"),
        sum(col("s1") * col("lenok") * col("qok")).as("n3"),
        sum(col("s1") * col("lenok") * col("qok") * col("notdup")).as("n4"))
    val stages = Seq(("1_lang_en", "n0", "n1"),
      ("2_length_20_2000", "n1", "n2"),
      ("3_quality_floor", "n2", "n3"),
      ("4_near_dup_drop", "n3", "n4"))
    m.select(explode(array(stages.map { case (name, in, out) =>
        struct(lit(name).as("stage"), col(in).as("docs_in"),
          col(out).as("docs_out"))
      }: _*)).as("r"))
      .select(col("r.stage").as("stage"), col("r.docs_in").as("docs_in"),
        col("r.docs_out").as("docs_out"),
        round(col("r.docs_out").cast("double")
          / col("r.docs_in").cast("double"), 6).as("pct_kept"))
      .orderBy("stage")
  }
}
