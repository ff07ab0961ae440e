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

  // --- DP20: dataset card — the one-row summary a corpus release
  // publishes next to the funnel: corpus size, selected docs/tokens,
  // mean quality of the selection, source spread, and the near-dup
  // drop rate. Composes the SAME survivor relation as dp11 (LSH pair
  // source), so card and selection cannot disagree. Mean quality is
  // exact despite being an average of doubles: the per-doc quality is
  // already rounded to 4dp, so quality·10000 is an exact integer —
  // summed as a long and divided once per-row, no cross-row FP
  // accumulation (the a26 discipline applied to a score column). ---
  def datasetCard(s: SparkSession, d: String,
                  qualityFloor: Double = 0.55,
                  jaccardThreshold: Double = 0.5): DataFrame = {
    def dbl(c: org.apache.spark.sql.Column) = c.cast("double")
    val drops = Dedup.minhashLshPairsRaw(s, d, jaccardThreshold)
      .select(col("doc_b").as("doc_id")).distinct()
    val survivors = corpusSelectFrom(s, d,
      Dedup.minhashLshPairsRaw(s, d, jaccardThreshold), qualityFloor)
    val totals = Tables.documents(s, d)
      .agg(count(lit(1)).as("docs_total"))
    val nDrops = drops.agg(count(lit(1)).as("n_dropped"))
    survivors
      .agg(count(lit(1)).as("docs_selected"),
        sum(col("n_tokens").cast("long")).as("tokens_selected"),
        // round() before the cast: 0.8432·10000 can land a hair under
        // 8432.0 in binary, and a bare cast would truncate
        sum(round(col("quality") * 10000).cast("long")).as("q10k"),
        countDistinct(col("source")).as("n_sources"))
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(nDrops))
      .select(col("docs_total"), col("docs_selected"),
        col("tokens_selected"), col("n_sources"),
        round(dbl(col("q10k")) / dbl(col("docs_selected")) / 10000.0, 6)
          .as("mean_quality"),
        round(dbl(col("n_dropped")) / dbl(col("docs_total")), 6)
          .as("near_dup_rate"))
  }

  // --- DP21: TOKEN-weighted scrub funnel — dp18 counts DOCS through
  // the gate chain; training budgets are set in TOKENS, and the span
  // scrub (dd21) is sub-document, so its attrition is invisible to a
  // doc-count funnel. Three stages on the token axis: boilerplate
  // chunks scrubbed out (dd21's ban list, token-weighted), exact-dup
  // documents dropped (dd1's keep-smallest-id rule over the md5
  // fingerprint), then the quality floor (tx4's score). One scan
  // builds per-doc (total, kept) token sums off the shared chunk
  // segmentation; dedup keep-bits and quality join in and a single
  // agg emits the cumulative-conjunction sums — the dp18 shape, per
  // token. Every count is an exact integer, so the report
  // hash-oracles (the DuckDB twin replays chunk ban, fingerprint
  // keep, and the quality formula). ---
  def scrubTokenFunnel(s: SparkSession, d: String, k: Int = 8,
                       minDocs: Long = 3L,
                       qualityFloor: Double = 0.55): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val chunks = Dedup.chunkRowsOf(docs, k)
      .withColumn("ctoks", size(split(col("chunk"), " ")).cast("long"))
    val banned = chunks.groupBy("gh")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("gh"), lit(1).as("is_banned"))
    val perDoc = chunks.join(broadcast(banned), Seq("gh"), "left_outer")
      .groupBy("doc_id")
      .agg(sum(col("ctoks")).as("toks"),
        sum(when(col("is_banned").isNull, col("ctoks")).otherwise(0L))
          .as("kept_toks"))
    val wFp = org.apache.spark.sql.expressions.Window.partitionBy("fp")
    val keepers = docs
      .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
      .withColumn("keep",
        (col("doc_id") === min(col("doc_id")).over(wFp)).cast("long"))
      .select("doc_id", "keep")
    val quality = TextAnalysis.qualityScoreRaw(s, d)
    val m = perDoc.join(keepers, "doc_id").join(quality, "doc_id")
      .select(col("toks"), col("kept_toks"), col("keep"),
        (col("quality") >= qualityFloor).cast("long").as("qok"))
      .agg(sum(col("toks")).as("t0"),
        sum(col("kept_toks")).as("t1"),
        sum(col("kept_toks") * col("keep")).as("t2"),
        sum(col("kept_toks") * col("keep") * col("qok")).as("t3"))
    val stages = Seq(("1_span_scrub", "t0", "t1"),
      ("2_exact_dedup", "t1", "t2"),
      ("3_quality_floor", "t2", "t3"))
    m.select(explode(array(stages.map { case (name, in, out) =>
        struct(lit(name).as("stage"), col(in).as("tokens_in"),
          col(out).as("tokens_out"))
      }: _*)).as("r"))
      .select(col("r.stage").as("stage"),
        col("r.tokens_in").as("tokens_in"),
        col("r.tokens_out").as("tokens_out"),
        round(col("r.tokens_out").cast("double")
          / col("r.tokens_in").cast("double"), 6).as("pct_kept"))
      .orderBy("stage")
  }
}
