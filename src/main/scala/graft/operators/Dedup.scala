package graft.operators

import graft.Tables
import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines (north-star,
  * SURVEY.md §7.2 M6): exact, n-gram Jaccard (exact pairwise baseline),
  * MinHash+LSH (the scale path), and SimHash.
  *
  * Scale design: the exact-pairwise ops (`ngramJaccardPairs`) exist as
  * correctness baselines and are quadratic in docs-per-shared-shingle —
  * at 100 TB you run `minhashLshPairs` (LSH banding: only docs sharing
  * a band bucket are ever paired, so the join is linear in bucket
  * occupancy) or `simhashPairs` (pigeonhole on 16-bit chunks). Nothing
  * here collects to the driver; every step is a shuffle-partitioned
  * DataFrame op.
  */
object Dedup {

  private def docGrams(s: SparkSession, d: String, n: Int = 3): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        array_distinct(Text.wordNgrams(Text.tokens(col("text")), n)).as("grams"))

  // --- DD1: exact dedup — group identical texts, keep min doc_id.
  // Shuffles the md5 fingerprint (32 bytes), not the document body:
  // at 100 TB the exchange carries fingerprints only. ---
  def exactDedup(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(Text.fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
      .orderBy("keep_id")

  // --- DD2: exact n-gram Jaccard near-dup pairs (correctness baseline
  // for DD3). Candidate pairs = docs sharing >= 1 word-3-gram; exact
  // Jaccard from shared/ per-doc distinct counts. ---
  def ngramJaccardPairs(s: SparkSession, d: String,
                        threshold: Double = 0.5): DataFrame = {
    val grams = docGrams(s, d)
      .select(col("doc_id"), explode(col("grams")).as("g"))
    val cnt = grams.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val shared = grams.as("a")
      .join(grams.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
      .withColumn("jac",
        col("shared").cast("double") / (col("ca.n") + col("cb.n") - col("shared")))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  // --- DD3: MinHash + LSH banding — the 100 TB dedup path. 64-hash
  // signature, 16 bands x 4 rows; candidate pairs only within band
  // buckets; candidates verified with exact Jaccard so output quality
  // equals DD2 minus LSH misses (P[miss] = (1-j^4)^16, <2% at j=0.8). ---
  def minhashLshPairs(s: SparkSession, d: String,
                      threshold: Double = 0.5,
                      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val rows = numHashes / bands
    val sigs = docGrams(s, d)
      .filter(size(col("grams")) > 0)
      .select(col("doc_id"), col("grams"),
        Text.minhashSignature(col("grams"), numHashes).as("sig"))
    val banded = sigs.select(
      col("doc_id"), col("grams"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          xxhash64(b, slice(col("sig"), b * rows + 1, lit(rows))).as("bucket"))))
        .as("bb"))
      .select(col("doc_id"), col("grams"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.grams").as("ga"), col("b.grams").as("gb"))
      .dropDuplicates("doc_a", "doc_b") // same pair can collide in many bands
    cand
      .withColumn("jac", Text.jaccard(col("ga"), col("gb")))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  // --- DD4: SimHash near-dup pairs. 64-bit signature; pairs sharing
  // any of four 16-bit chunks (pigeonhole: hamming <= 3 implies >= 1
  // identical chunk) verified by bit_count(xor). ---
  def simhashPairs(s: SparkSession, d: String,
                   maxHamming: Int = 3): DataFrame = {
    val sigs = Tables.documents(s, d)
      .select(col("doc_id"), Text.simhash64(Text.tokens(col("text"))).as("sig"))
    val chunked = sigs
      .select(col("doc_id"), col("sig"), explode(sequence(lit(0), lit(3))).as("c"))
      .withColumn("chunk",
        when(col("c") === 0, col("sig").bitwiseAND(lit(0xFFFFL)))
          .when(col("c") === 1, shiftright(col("sig"), 16).bitwiseAND(lit(0xFFFFL)))
          .when(col("c") === 2, shiftright(col("sig"), 32).bitwiseAND(lit(0xFFFFL)))
          .otherwise(shiftright(col("sig"), 48).bitwiseAND(lit(0xFFFFL))))
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.c") === col("b.c") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }
}
