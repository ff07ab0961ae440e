package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders (north-star extension surface,
  * SURVEY.md §7.2 M6). Everything here is pure `Column` expressions
  * via the Scala higher-order-function API — whole-stage-codegen'd,
  * no UDFs, no driver-side loops — so the same code scales from 500
  * docs to 100 TB of documents: tokenization, n-gram shingling,
  * MinHash signatures, SimHash, Jaccard, language-ID.
  */
object Text {

  /** Whitespace tokenization. Single-space-delimited corpora only;
    * use `split(text, "\\s+")` upstream for messy whitespace.
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles, the unit for Jaccard/MinHash dedup.
    * Guarded: Spark's `sequence(1, 0)` counts DOWN, so docs shorter
    * than n yield an explicit empty array.
    */
  def wordNgrams(ws: Column, n: Int): Column =
    when(size(ws) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(ws) - lit(n - 1)),
        i => concat_ws(" ", slice(ws, i, lit(n)))))

  /** Cross-engine 60-bit content hash: the leading 15 hex chars of
    * md5, parsed as a non-negative BIGINT. This is the hash basis for
    * every pipeline whose DuckDB oracle must REPLAY the hash chain
    * (MinHash/SimHash dedup, the stubbed media decode) — DuckDB
    * computes the identical value as
    * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`. At 100 TB, swap
    * the basis to xxhash64 for raw hash throughput: every consumer's
    * relational shape is hash-agnostic (same trade tx7_winnowing
    * documents for its md5 fingerprints).
    */
  def h60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** MinHash permutations as a universal affine family over the
    * Mersenne field 2^31−1: h_i(x) = (a_i·(x mod 2^31) + b_i) mod P,
    * with (a_i, b_i) drawn from a fixed seed. All arithmetic stays
    * under 2^62 (no BIGINT overflow in ANSI engines), so the chain is
    * bit-reproducible in plain SQL — the property the dd3/dd12 DuckDB
    * oracles rely on.
    */
  val MinhashP: Long = 2147483647L // 2^31 − 1 (Mersenne prime)
  val MinhashM: Long = 2147483648L // 2^31

  def minhashParams(numHashes: Int, seed: Long = 42L): Array[(Long, Long)] = {
    val rng = new scala.util.Random(seed)
    Array.fill(numHashes)(
      (1L + rng.nextInt((MinhashP - 1).toInt), rng.nextInt(MinhashP.toInt).toLong))
  }

  def affineHash(h: Column, a: Long, b: Long): Column =
    (lit(a) * (h % lit(MinhashM)) + lit(b)) % lit(MinhashP)

  /** MinHash signature as a single array Column: `numHashes`
    * affine permutations of the portable h60 gram hash, each taking
    * the min over the doc's shingle set.
    *
    * PERF: higher-order functions are CodegenFallback (interpreted,
    * ~5µs/element) — fine for ad-hoc use, but the hot dedup pipeline
    * (operators.Dedup.minhashLshPairs) computes the same signature as
    * a codegen'd hash-aggregate over exploded gram rows instead
    * (measured ~50x faster). The hash chain here is intentionally
    * identical — affineHash_i(h60(gram)) — so the two forms produce
    * bit-equal signatures; TextFunctionsSpec asserts that equivalence
    * against Dedup's aggregate on real documents.
    */
  def minhashSignature(grams: Column, numHashes: Int): Column = {
    // hash each gram ONCE (md5 is the expensive step — embedding
    // h60(g) inside every per-function lambda would evaluate it
    // numHashes times per gram: interpreted HOFs get no common-
    // subexpression elimination), then fan each 8-byte hash out to the
    // cheap affine family and fold element-wise minima.
    val perGram = transform(transform(grams, g => h60(g)),
      h => array(minhashParams(numHashes).map { case (a, b) =>
        affineHash(h, a, b)
      }: _*))
    aggregate(perGram,
      array(Seq.fill(numHashes)(lit(Long.MaxValue)): _*),
      (acc, hs) => zip_with(acc, hs, (x, y) => least(x, y)))
  }

  /** 64-bit SimHash over the token multiset: per bit, sum +1/-1 by
    * the token-hash's bit value; the sign becomes the output bit.
    * The bit index is a Scala-level loop (64 static expression terms),
    * keeping every shift amount a literal so the whole thing stays in
    * the codegen'd expression domain — no UDF.
    */
  def simhash64(ws: Column): Column = {
    val hashes = transform(ws, t => xxhash64(t))
    (0 until 64).map { b =>
      val balance = aggregate(hashes, lit(0),
        (bal, h) => bal + when(shiftright(h, b).bitwiseAND(lit(1L)) === lit(1L), 1).otherwise(-1))
      shiftleft(when(balance >= 0, lit(1L)).otherwise(lit(0L)), b)
    }.reduce(_ + _)
  }

  /** Exact Jaccard similarity of two shingle arrays (the candidate-
    * pair verification step after LSH banding).
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val uni = size(a) + size(b) - inter
    when(uni === 0, lit(0.0)).otherwise(inter.cast("double") / uni.cast("double"))
  }

  /** Content fingerprint: md5 of the raw text (exact-dup key that
    * travels as 32 bytes instead of the full doc — what you shuffle
    * at 100 TB instead of `text` itself).
    */
  def fingerprint(text: Column): Column = md5(text.cast("binary"))

  /** Canonical "fuzzy-exact" normalization: casefold, strip everything
    * but [a-z0-9 ], collapse runs of spaces, trim. The one definition
    * shared by the DD11 operator and its spec so they can't drift.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))
}
