package graft.operators

import graft.Tables
import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines (north-star,
  * SURVEY.md §7.2 M6): exact, n-gram Jaccard (exact pairwise baseline),
  * MinHash+LSH (the scale path), and SimHash.
  *
  * Scale + codegen design:
  *  - Everything hot is expressed in row form (explode + hash-agg +
  *    equi-join), NOT higher-order array lambdas: Spark's HOFs
  *    (`transform`/`aggregate`) are CodegenFallback — interpreted,
  *    ~5µs/element — while the row form stays inside whole-stage
  *    codegen (measured 50x difference on the MinHash signature step).
  *  - Shuffles carry 8-byte gram hashes, never gram strings or arrays.
  *  - The exact-pairwise op (`ngramJaccardPairs`) is the correctness
  *    baseline and quadratic in docs-per-shared-shingle; at 100 TB you
  *    run `minhashLshPairs` (candidates only within LSH band buckets)
  *    or `simhashPairs` (pigeonhole on 16-bit chunks). No step
  *    collects to the driver.
  */
object Dedup {

  /** Distinct (doc_id, gram-hash) rows, fully codegen'd: positions
    * exploded from a sequence, grams assembled with element_at/concat
    * (no HOF lambdas), hashed to longs immediately.
    */
  private[graft] def gramRows(s: SparkSession, d: String, n: Int = 3): DataFrame =
    gramRowsRaw(s, d, n).dropDuplicates("doc_id", "gh")

  /** Undeduplicated (doc_id, gram) STRING rows in the codegen
    * explode + element_at shape — the ONE definition of word-n-gram
    * generation every hot pipeline builds on (`Text.wordNgrams` is the
    * CodegenFallback HOF twin, fine for ad-hoc column use only). Pure
    * map-side projection, no exchange.
    */
  private[operators] def gramStrings(s: SparkSession, d: String, n: Int): DataFrame =
    gramStringsOf(Tables.documents(s, d), n)

  /** Same projection over an arbitrary (doc_id, text) relation — the
    * form a streaming micro-batch grams its incoming documents with
    * (Streams.incrementalDedupStream).
    */
  private[graft] def gramStringsOf(docs: DataFrame, n: Int): DataFrame = {
    val ws = col("ws")
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(ws) >= n)
      .select(col("doc_id"), ws,
        explode(sequence(lit(1), size(ws) - lit(n - 1))).as("i"))
      .select(col("doc_id"), concat_ws(" ",
        (0 until n).map(k => element_at(ws, col("i") + lit(k))): _*).as("gram"))
  }

  /** Undeduplicated (doc_id, gram-hash) rows — a pure map-side
    * projection (no exchange). Consumers that only need distinct
    * counts after a later join key on this and dedup in their own
    * aggregate instead of paying a corpus-wide shuffle here.
    */
  private[operators] def gramRowsRaw(s: SparkSession, d: String, n: Int): DataFrame =
    gramStrings(s, d, n)
      .select(col("doc_id"), xxhash64(col("gram")).as("gh"))

  /** Distinct (doc_id, gh) grams of an arbitrary (doc_id, text)
    * relation — the micro-batch side of the streaming ingest path.
    */
  private[graft] def gramRowsOf(docs: DataFrame, n: Int): DataFrame =
    gramStringsOf(docs, n)
      .select(col("doc_id"), xxhash64(col("gram")).as("gh"))
      .dropDuplicates("doc_id", "gh")

  /** Portable-hash twin of [[gramRowsOf]] — the basis the LSH band
    * index persists, for micro-batches maintaining that index
    * (Streams.lshIndexMaintainStream).
    */
  private[graft] def gramRowsPortableOf(docs: DataFrame, n: Int): DataFrame =
    gramStringsOf(docs, n)
      .select(col("doc_id"), Text.h60(col("gram")).as("gh"))
      .dropDuplicates("doc_id", "gh")

  // --- DD1: exact dedup — group identical texts, keep min doc_id.
  // Shuffles the md5 fingerprint (32 bytes), not the document body:
  // at 100 TB the exchange carries fingerprints only. ---
  def exactDedup(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(Text.fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
      .orderBy("keep_id")

  /** From a (doc_a, doc_b, shared) relation and the distinct
    * (doc_id, gh) gram relation: exact Jaccard, thresholded. Returns
    * (doc_a, doc_b, jac) UNSORTED and unrounded — presentation
    * (round + orderBy) belongs to the query boundary, not the 100 TB
    * pipeline interior.
    */
  private[graft] def jaccardFromShared(shared: DataFrame, gr: DataFrame,
                                threshold: Double): DataFrame = {
    val cnt = gr.groupBy("doc_id").agg(count(lit(1)).as("n"))
    shared
      .join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
      .withColumn("jac",
        col("shared").cast("double") / (col("ca.n") + col("cb.n") - col("shared")))
      .filter(col("jac") >= threshold)
      .select("doc_a", "doc_b", "jac")
  }

  /** Presentation boundary for a near-dup pair relation: round + global
    * sort. The hash `repartition` directly under the sort is load-
    * bearing: a range sort runs a SAMPLING job over its child to pick
    * partition bounds, and when the child is an unbroken broadcast-join
    * chain that sampling pass re-executes the whole dedup pipeline a
    * second time (measured: dd19 8.0 s sorted vs 3.3 s unsorted at
    * sf0.1, pure recompute). A shuffle boundary there means the
    * pipeline computes ONCE into the map stage's shuffle files, which
    * Spark reuses across the sampling and sort jobs — and unlike a
    * checkpoint wall, the full plan stays visible to explain() and the
    * PlanHygieneSpec bans. The shuffled relation is only the
    * post-threshold survivors (the duplicate pairs, not the corpus).
    */
  private[graft] def presentPairs(pairs: DataFrame): DataFrame =
    pairs.select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard"))
      .repartition(col("doc_a"))
      .orderBy("doc_a", "doc_b")

  /** Shared-gram counts for a set of (doc_a, doc_b) candidate pairs,
    * by counting shared gram-hashes — one codegen'd join+agg, no array
    * intersections. `gr` must be the distinct (doc_id, gh) relation.
    * Right only for SMALL candidate sets (LSH band collisions); the
    * all-candidates form is [[sharedGramCounts]].
    */
  private[graft] def sharedOfCandidates(pairs: DataFrame, gr: DataFrame): DataFrame =
    pairs
      .join(gr.as("ga"), col("doc_a") === col("ga.doc_id"))
      .join(gr.as("gb"),
        col("doc_b") === col("gb.doc_id") && col("ga.gh") === col("gb.gh"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("shared"))

  // --- DD2: exact n-gram Jaccard near-dup pairs (correctness baseline
  // for DD3): candidate pairs = docs sharing >= 1 word-3-gram. The
  // pair join keys on xxhash64(gram) longs (collision odds ~n²/2⁶⁵ —
  // immaterial even at 100 TB gram cardinalities). ---
  def ngramJaccardPairs(s: SparkSession, d: String,
                        threshold: Double = 0.5): DataFrame =
    presentPairs(ngramJaccardPairsRaw(s, d, threshold))

  /** Unsorted/unrounded pair relation — the form downstream pipeline
    * stages (e.g. [[dedupKeepSet]]) consume without paying a global
    * sort. Shared counts fall straight out of the gram self-join's
    * groupBy — one shuffle over the match rows, no candidate re-join
    * (that pattern is only right for small LSH candidate sets, DD3).
    */
  private[operators] def ngramJaccardPairsRaw(s: SparkSession, d: String,
                                              threshold: Double): DataFrame = {
    val gr = graft.sources.TextIndex.gramIndex(s, d, 3)
    jaccardFromShared(sharedGramCounts(gr), gr, threshold)
  }

  /** Default document-frequency cap for the exact gram self-join. A
    * gram appearing in f documents contributes C(f,2) join rows, so ONE
    * ubiquitous shingle (cookie banner, license header) turns the
    * "exact" path quadratic — the classic shingle-DF cap drops such
    * grams before the join. Grams this common carry no Jaccard signal
    * anyway (they don't discriminate between documents); the per-doc
    * denominators stay uncapped, so the only effect on scores is
    * removing the hot grams' shared-count contribution. The default
    * sits far above this corpus family's max DF (25 at sf0.1), so
    * every oracled result is provably identical to the uncapped run;
    * a 100 TB deployment tunes it to its boilerplate profile (and
    * feeds [[boilerplateSpans]]'s catalog back as the evidence).
    */
  val DefaultMaxGramDocFreq = 500L

  /** Drop grams whose document frequency exceeds the cap. The window
    * hash-partitions by `gh` — the same partitioning the self-join
    * needs next, so the cap rides the exchange the join pays anyway
    * instead of adding one.
    *
    * `strict = true` is the INCREMENTAL paths' mode: their
    * "equals batch under any schedule" contract applies the cap to an
    * at-admission / base-slice view of the corpus, so a gram whose
    * corpus-wide DF crosses the cap AFTER a doc's admission would make
    * the incremental answer silently diverge from the batch one. The
    * contract therefore only holds while the cap never engages — and
    * strict mode turns the unguarded assumption into a loud runtime
    * failure (raise_error rides the same window exchange; zero extra
    * shuffles, and it can never fire on a corpus whose max DF is
    * below the cap).
    */
  private[graft] def capByDocFreq(gr: DataFrame, maxDocFreq: Long,
                                  strict: Boolean = false): DataFrame = {
    val byGh = org.apache.spark.sql.expressions.Window.partitionBy("gh")
    val withDf = gr.withColumn("df", count(lit(1)).over(byGh))
    val guarded =
      if (!strict) withDf
      else withDf.withColumn("df",
        when(col("df") > maxDocFreq, raise_error(format_string(
          "gram DF cap engaged on an incremental path (df = %d > cap = %d): " +
            "the stream/batch equivalence contract does not cover an " +
            "engaged cap — re-run the batch operator or raise the cap",
          col("df"), lit(maxDocFreq)))).otherwise(col("df")))
    guarded.filter(col("df") <= maxDocFreq).drop("df")
  }

  /** Per-pair shared-gram counts from the distinct gram relation's
    * self-join — one shuffle over the match rows, with the hot-gram
    * fan-out bounded by the DF cap (≤ C(maxDocFreq, 2) pair rows per
    * gram, making the worst-case join size a corpus-independent
    * constant times the gram count).
    */
  private def sharedGramCounts(gr: DataFrame,
                               maxDocFreq: Long = DefaultMaxGramDocFreq): DataFrame =
    sharedGramCountsWhere(gr, maxDocFreq)(identity)

  /** [[sharedGramCounts]] with the BUILD side restricted by `bSide` —
    * the join and DF cap exist once; the full self-join passes
    * identity, dd25's delta probe passes the batch filter (pairs with
    * at least one batch member, since batch ids exceed base ids).
    */
  private def sharedGramCountsWhere(gr: DataFrame, maxDocFreq: Long,
                                    strict: Boolean = false)
                                   (bSide: DataFrame => DataFrame): DataFrame = {
    val g = capByDocFreq(gr, maxDocFreq, strict)
    g.as("a")
      .join(bSide(g).as("b"),
        col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
  }

  /** Distinct (doc_id, h60-gram-hash) rows — the PORTABLE twin of
    * [[gramRows]] for the pipelines whose DuckDB oracle replays the
    * full hash chain (dd3/dd12). Same explode shape; the hash basis is
    * `Text.h60` (top 60 bits of md5) instead of xxhash64, which any
    * ANSI engine can recompute. At 100 TB swap the basis back to
    * xxhash64 — every downstream shape is hash-agnostic.
    */
  private[graft] def gramRowsPortable(s: SparkSession, d: String,
                                          n: Int = 3): DataFrame =
    gramStrings(s, d, n)
      .select(col("doc_id"), Text.h60(col("gram")).as("gh"))
      .dropDuplicates("doc_id", "gh")

  // --- DD3: MinHash + LSH banding — the 100 TB dedup path. 64-hash
  // signature as ONE hash-aggregate (64 codegen'd min columns), 16
  // bands x 4 rows concatenated straight from the agg columns;
  // candidate pairs only within band buckets; candidates verified
  // exactly, so output quality equals DD2 minus LSH misses
  // (P[miss] = (1-j^4)^16, <2% at j=0.8). The whole chain — h60 gram
  // hash, affine permutations, band keys, exact verify — is replayed
  // verbatim by the DuckDB oracle (OracleGen.dd3), so this
  // approximate op is HASH-checked, not rows-only. ---
  /** (doc_id, h0..h{n-1}) MinHash signatures as one codegen'd
    * hash-aggregate over a (doc_id, gh) gram relation. Bit-equal to
    * the HOF form `functions.Text.minhashSignature` (same
    * affineHash_i(h60(gram)) chain) — TextFunctionsSpec asserts the
    * equivalence.
    */
  private def minhashSignaturesFrom(gr: DataFrame, numHashes: Int): DataFrame = {
    val minCols = Text.minhashParams(numHashes).zipWithIndex.map {
      case ((a, b), i) => min(Text.affineHash(col("gh"), a, b)).as(s"h$i")
    }
    gr.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
  }

  private[graft] def minhashSignatures(s: SparkSession, d: String,
                                       numHashes: Int, n: Int = 3): DataFrame =
    minhashSignaturesFrom(gramRowsPortable(s, d, n), numHashes)

  def minhashLshPairs(s: SparkSession, d: String,
                      threshold: Double = 0.5,
                      numHashes: Int = 64, bands: Int = 16): DataFrame =
    presentPairs(minhashLshPairsRaw(s, d, threshold, numHashes, bands))

  /** Unsorted/unrounded LSH near-dup pair relation — the form
    * downstream stages ([[dedupKeepSetFrom]], `Pipeline
    * .corpusSelectFrom`) consume as their 100 TB pair source: candidate
    * generation is banded (never all-pairs) and the exact verify only
    * touches candidate rows. Both the gram relation and the banding
    * come from the PERSISTED text index (built once per corpus,
    * `sources.TextIndex`) — the signature chain is never recomputed at
    * query time, the round-3 ANN-index lesson applied one layer over.
    */
  private[graft] def minhashLshPairsRaw(s: SparkSession, d: String,
                                        threshold: Double = 0.5,
                                        numHashes: Int = 64,
                                        bands: Int = 16): DataFrame = {
    val gr = graft.sources.TextIndex.gramIndex(s, d, 3, portable = true)
    jaccardFromShared(sharedOfCandidates(
      candidatesFromBanded(
        graft.sources.TextIndex.bandIndex(s, d, numHashes, bands)),
      gr), gr, threshold)
  }

  /** (doc_id, band, bucket) LSH banding of the MinHash signatures —
    * the relation `sources.TextIndex.bandIndex` persists. Band keys
    * are the concatenated row hashes as a string — ~40 bytes vs an
    * 8-byte hash, the price of oracle replay; at 100 TB wrap the
    * concat in xxhash64 before the shuffle (shape unchanged).
    */
  private[graft] def bandedSignatures(gr: DataFrame, numHashes: Int,
                                      bands: Int): DataFrame = {
    val rows = numHashes / bands
    val sigs = minhashSignaturesFrom(gr, numHashes)
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("-", (b * rows until (b + 1) * rows).map(i => col(s"h$i")): _*)
          .as("bucket"))
    }
    sigs
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  // --- DD16: near-dups of ONE query document by POINT-PROBING the
  // persisted band index — the steady-state "is this doc already in
  // the corpus?" check an ingest service runs before admitting a
  // document (the text twin of sim3's bucket probe). The query doc's
  // `bands` band keys are collected (a bands-row driver collect) and
  // pushed down as an IN filter over the band table, so the probe
  // reads only the buckets the doc lands in — never the corpus; the
  // exact Jaccard verify then touches only collided candidates. ---
  def docNearDupProbe(s: SparkSession, d: String,
                      queryDoc: Long = 8L,
                      threshold: Double = 0.3,
                      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val banded = graft.sources.TextIndex.bandIndex(s, d, numHashes, bands)
    val gr = graft.sources.TextIndex.gramIndex(s, d, 3, portable = true)
    // Probe predicate as an OR of (band, bucket) equalities on STORED
    // columns — this reaches the parquet scan as pushed data filters
    // (row-group pruning); an isin over a concat would be a computed
    // expression Spark cannot push below the scan.
    val probePairs = banded.filter(col("doc_id") === queryDoc)
      .select(col("band"), col("bucket")).collect()
      .map(r => (r.getInt(0), r.getString(1)))
    val probePred = probePairs
      .map { case (b, k) => col("band") === b && col("bucket") === k }
      .reduceOption(_ || _).getOrElse(lit(false))
    val cand = banded
      .filter(probePred && col("doc_id") =!= queryDoc)
      .select(lit(queryDoc).as("doc_a"), col("doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    presentPairs(jaccardFromShared(sharedOfCandidates(cand, gr), gr, threshold))
      .select(col("doc_b").as("match_doc"), col("jaccard"))
      .orderBy("match_doc")
  }

  // --- DD17: incremental BAND-INDEX maintenance — the batch-arrival
  // twin of dd16's single-doc probe. A batch of new documents lands;
  // signatures are computed for the BATCH ONLY and published as a
  // delta directory (the base index is never read-modified-rewritten —
  // TextIndexSpec asserts its files are byte-untouched), and the
  // batch's near-dup pairs come from band collisions of delta × (base
  // ∪ delta). At 100 TB this is the ingest loop: per-batch cost is
  // proportional to the BATCH, never the corpus; a nightly compaction
  // can fold deltas, but correctness never requires it (MinHash
  // signatures are per-document, so base ∪ delta IS the full index).
  // Batch boundary = max_id·4/5 + 1 in exact integer arithmetic (the
  // dd15 lesson: parameters must scale with the corpus), replayed
  // verbatim by the DuckDB oracle. ---
  def incrementalLshPairs(s: SparkSession, d: String,
                          threshold: Double = 0.5,
                          numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val maxId = graft.Tables.documents(s, d)
      .agg(max(col("doc_id"))).head.getLong(0)
    val boundary = maxId * 4 / 5 + 1
    val base = graft.sources.TextIndex.bandIndexBase(s, d, boundary, numHashes, bands)
    val delta = graft.sources.TextIndex.bandIndexDelta(s, d, boundary, numHashes, bands)
    // delta on the BUILD side: every pair involves a batch doc, and
    // batch ids are all > base ids, so the batch member is always the
    // pair's doc_b — the probe side streams base ∪ delta past it.
    val cand = base.unionByName(delta).as("a")
      .join(delta.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val gr = graft.sources.TextIndex.gramIndex(s, d, 3, portable = true)
    presentPairs(jaccardFromShared(sharedOfCandidates(cand, gr), gr, threshold))
  }

  // --- DD25: INCREMENTAL COMPONENT maintenance — the append story
  // for the persisted cluster assignment (componentsIndex is built
  // once; this is its delta path). Components are NOT additive — one
  // new document can merge two old clusters — but the EXPENSIVE leg
  // is incrementalizable: pair discovery. On a batch arrival only
  // delta-involving pairs are computed (gram join of corpus × batch,
  // never corpus × corpus), and the relabel fixpoint runs over the
  // base assignment's STAR EDGES (doc→label, diameter ≤ 2 by
  // construction — min-label output IS a star forest) plus the new
  // pairs. The union's transitive closure equals the from-scratch
  // pair graph's (star edges preserve base connectivity exactly), so
  // the min labels agree EXACTLY — which is why the oracle for this
  // query is dd8's own from-scratch replay: equivalence is the hash
  // gate, not a spec-only claim. Batch boundary = max_id·4/5 + 1
  // (dd17's integer rule). At 100 TB the per-batch cost is the
  // batch's gram probe plus a shallow fixpoint; the corpus is never
  // re-paired. ---
  def incrementalComponents(s: SparkSession, d: String,
                            threshold: Double = 0.5): DataFrame = {
    val maxId = graft.Tables.documents(s, d)
      .agg(max(col("doc_id"))).head.getLong(0)
    val boundary = maxId * 4 / 5 + 1
    val gr = graft.sources.TextIndex.gramIndex(s, d, 3)
    val docs = graft.Tables.documents(s, d).select("doc_id")
    // base labels — the PERSISTED pre-append assignment (built once
    // per (dataset, boundary, threshold), exactly the artifact a
    // production append starts from), so the steady-state query pays
    // only the delta probe and the shallow relabel
    val baseLabels = graft.sources.TextIndex
      .componentsIndexBase(s, d, boundary, threshold)
    // delta-involving pairs only: batch ids all exceed base ids, so
    // the batch member is always doc_b — probe the full gram relation
    // with the batch slice on the build side
    // strict: the delta probe caps the full-corpus view but the base
    // labels were built on the base-slice view — divergence is only
    // impossible while the cap never engages (see capByDocFreq)
    val deltaShared = sharedGramCountsWhere(gr, DefaultMaxGramDocFreq,
      strict = true)(_.filter(col("doc_id") >= boundary))
    val deltaPairs = jaccardFromShared(deltaShared, gr, threshold)
      .select("doc_a", "doc_b")
    val starEdges = baseLabels.filter(col("comp") =!= col("doc_id"))
      .select(col("comp").as("doc_a"), col("doc_id").as("doc_b"))
    componentsFromPairs(docs, starEdges.unionByName(deltaPairs))
      .orderBy("doc_id")
  }

  /** Near-dup pairs TOUCHING a fresh document set — the streaming
    * ingest pair delta: every over-threshold pair whose LATER-ADMITTED
    * member is in `freshGrams` (one side fresh against all admitted
    * grams; both-fresh pairs are generated from both directions, so
    * the (pair, gh) dedup precedes the shared count). Stream arrival
    * order is arbitrary, so pairs normalize by (least, greatest)
    * instead of assuming monotone ids. DF cap semantics: capped at
    * the at-admission corpus view — same caveat as the base-slice cap
    * in dd25 (no-op below the cap, which this corpus family is by two
    * orders of magnitude).
    */
  private[graft] def pairsTouching(allGrams: DataFrame,
                                   freshGrams: DataFrame,
                                   threshold: Double,
                                   maxDocFreq: Long = DefaultMaxGramDocFreq)
      : DataFrame = {
    // strict: an ENGAGED cap would break the equals-batch contract
    // (see capByDocFreq) — fail loudly instead of diverging from dd8
    val g = capByDocFreq(allGrams, maxDocFreq, strict = true)
    val fg = g.join(freshGrams.select("doc_id").distinct(), Seq("doc_id"))
    val shared = g.as("a")
      .join(fg.as("b"),
        col("a.gh") === col("b.gh") && col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"),
        col("a.gh").as("gh"))
      .dropDuplicates("doc_a", "doc_b", "gh")
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
    jaccardFromShared(shared, allGrams, threshold).select("doc_a", "doc_b")
  }

  /** The base-slice fixpoint [[componentsFromPairs]] over base-only
    * pairs — the build side of
    * [[graft.sources.TextIndex.componentsIndexBase]].
    */
  private[graft] def baseComponentsOf(s: SparkSession, d: String,
                                      boundary: Long,
                                      threshold: Double): DataFrame = {
    val grBase = graft.sources.TextIndex.gramIndex(s, d, 3)
      .filter(col("doc_id") < boundary)
    componentsFromPairs(
      graft.Tables.documents(s, d).select("doc_id")
        .filter(col("doc_id") < boundary),
      // strict: the base slice's cap view must agree with the full
      // corpus view for the incremental contract to hold
      jaccardFromShared(
        sharedGramCountsWhere(grBase, DefaultMaxGramDocFreq,
          strict = true)(identity),
        grBase, threshold)
        .select("doc_a", "doc_b"))
  }

  /** Unverified LSH candidate pairs (band-bucket collisions) from a
    * banded relation — one equi-join on (band, bucket).
    */
  private def candidatesFromBanded(banded: DataFrame): DataFrame =
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b") // same pair can collide in many bands

  // --- DD12: LSH recall audit — the quality gate a pipeline runs on a
  // SAMPLE before trusting LSH at full scale: exact truth pairs vs
  // LSH candidate pairs, one summary row. At 100 TB the exact side is
  // only ever computed on a sampled slice; the audit shape (two pair
  // relations, a semi-join, three tiny counts) is identical. Banding
  // theory: P[miss] = (1-j^r)^b, so at j=0.7, r=4, b=16 expected
  // recall is ~0.99 — the spec asserts the realized floor. ---
  def lshRecallAudit(s: SparkSession, d: String,
                     threshold: Double = 0.7,
                     numHashes: Int = 64, bands: Int = 16): DataFrame = {
    // n_true and n_hits come from ONE pass over the truth relation (a
    // left-outer join against candidates), so the quadratic gram
    // self-join executes once. The gram relation and the banding both
    // come from the persisted text index (a parquet scan per consumer
    // — no checkpointing needed now that the md5/signature pass isn't
    // recomputed inline); Jaccard over distinct h60 hashes equals
    // Jaccard over grams modulo the same ~n²/2⁶⁰ collision odds the
    // whole family accepts. The candidate relation feeds two branches
    // (the join + its own count) → localCheckpoint.
    val gr = graft.sources.TextIndex.gramIndex(s, d, 3, portable = true)
    val truth = jaccardFromShared(sharedGramCounts(gr), gr, threshold)
      .select(col("doc_a"), col("doc_b"))
    val cand = candidatesFromBanded(
      graft.sources.TextIndex.bandIndex(s, d, numHashes, bands))
      .localCheckpoint()
    truth.join(cand.withColumn("hit", lit(1)), Seq("doc_a", "doc_b"),
        "left_outer")
      .agg(count(lit(1)).as("n_true"), count(col("hit")).as("n_hits"))
      .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
      .select(col("n_true"), col("n_candidates"), col("n_hits"),
        when(col("n_true") === 0, lit(1.0))
          .otherwise(round(col("n_hits").cast("double") / col("n_true"), 4))
          .as("recall"))
  }

  // --- DD5: the end-to-end "deduplicate the corpus" result: the keep
  // set after greedy near-dup removal — a doc survives unless it is
  // the higher-id member of some near-dup pair (doc_b side). One
  // anti-join over the pair relation; at 100 TB the pair relation
  // comes from DD3 (LSH) instead of DD2 with identical downstream
  // shape — that composition is [[dedupKeepSetFrom]] with
  // [[minhashLshPairsRaw]] (registered as dd14_keepset_lsh). ---
  def dedupKeepSet(s: SparkSession, d: String,
                   threshold: Double = 0.5): DataFrame =
    dedupKeepSetFrom(s, d, ngramJaccardPairsRaw(s, d, threshold))

  /** Keep set over ANY (…, doc_b, …) near-dup pair relation — the pair
    * source is a parameter precisely so the exact baseline (DD2) and
    * the LSH scale path (DD3) share one downstream shape.
    */
  def dedupKeepSetFrom(s: SparkSession, d: String,
                       pairs: DataFrame): DataFrame =
    Tables.documents(s, d)
      .join(pairs.select(col("doc_b").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .select("doc_id", "source")
      .orderBy("doc_id")

  // --- DD7: n-gram containment — |grams(A) ∩ grams(B)| / |grams(A)|,
  // the asymmetric near-dup measure that catches A ⊂ B (quote/boiler-
  // plate inclusion) where Jaccard stays low because |B| >> |A|. Same
  // shared-gram-count join as DD2, divided by the smaller side only;
  // both (a,b) and (b,a) directions emitted from the one shared
  // relation. ---
  def containmentPairs(s: SparkSession, d: String,
                       threshold: Double = 0.8): DataFrame = {
    val gr = graft.sources.TextIndex.gramIndex(s, d, 3)
    val cnt = gr.groupBy("doc_id").agg(count(lit(1)).as("n"))
    sharedGramCounts(gr)
      .join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(col("shared").cast("double") / col("ca.n"), 4).as("cont_a_in_b"),
        round(col("shared").cast("double") / col("cb.n"), 4).as("cont_b_in_a"))
      .filter(col("cont_a_in_b") >= threshold || col("cont_b_in_a") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

  // --- DD8: dedup CLUSTERS — connected components of the near-dup
  // pair graph, labeled with the component's min doc_id. DD5's greedy
  // pair-side drop under-merges chains (A~B, B~C but A!~C); components
  // give the transitive closure, which is what "keep one per duplicate
  // group" actually means. Rounds run neighbor min-label propagation;
  // from round `jumpFrom` on, each round ALSO does POINTER JUMPING
  // (every node adopts its current label's label — the label table
  // self-joined on comp = doc_id), which halves label distances per
  // round, making convergence O(log diameter) instead of O(diameter):
  // a million-node chain settles in ~20 + jumpFrom rounds, which is
  // what makes the fixed cap safe at corpus scale. The jump join is
  // deferred because real near-dup graphs are almost always shallow
  // (profiled: always-jump costs +50% per round at sf0.1 and saves
  // nothing when diameter <= 3). The driver loop only checks a
  // convergence COUNT — no data is collected; lineage is cut per
  // round via localCheckpoint so plans don't nest across iterations. ---
  def dedupComponents(s: SparkSession, d: String,
                      threshold: Double = 0.5, maxIter: Int = 20,
                      jumpFrom: Int = 4): DataFrame =
    // Default-parameter calls (dd8, dd18, dd24, dp22 — every
    // registered consumer) read the persisted component assignment:
    // the label-propagation fixpoint is the expensive leg of the dedup
    // pipeline and its output is a pure corpus function, so it
    // materializes once per (dataset, threshold) and every post-dedup
    // stage probes it — the dd13 repeated-gram treatment applied to
    // the cluster relation. Non-default iteration knobs compute
    // directly (they parameterize the ALGORITHM, not the answer, so
    // they must not key new artifacts).
    if (maxIter == 20 && jumpFrom == 4)
      graft.sources.TextIndex.componentsIndex(s, d, threshold)
        .orderBy("doc_id")
    else componentsFromScratch(s, d, threshold, maxIter, jumpFrom)

  /** The from-scratch fixpoint [[componentsFromPairs]] over the
    * corpus pair relation — the build side of
    * [[graft.sources.TextIndex.componentsIndex]], kept callable so the
    * index spec can pin index == scratch.
    */
  private[graft] def componentsFromScratch(s: SparkSession, d: String,
                                           threshold: Double = 0.5,
                                           maxIter: Int = 20,
                                           jumpFrom: Int = 4): DataFrame = {
    val pairs = ngramJaccardPairsRaw(s, d, threshold)
      .select(col("doc_a"), col("doc_b"))
    val nodes = Tables.documents(s, d).select(col("doc_id"))
    componentsFromPairs(nodes, pairs, maxIter, jumpFrom).orderBy("doc_id")
  }

  // --- DD24: cluster SIZE DISTRIBUTION — the dedup report's headline
  // figure: how many near-dup clusters exist at each size, and how
  // many documents they absorb? Singleton-heavy = clean corpus; a fat
  // tail = template farms (and the expected post-dedup corpus size is
  // n_total − Σ(size−1)·n_clusters, readable straight off this
  // relation). One rollup over dd8's component relation — component
  // ids are data-parallel, both aggregates are integer counts. ---
  def clusterSizeDistribution(s: SparkSession, d: String,
                              threshold: Double = 0.5): DataFrame =
    dedupComponents(s, d, threshold)
      .groupBy("comp").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))
      .orderBy("cluster_size")

  // --- DD18: cluster REPRESENTATIVE selection — the decision step
  // after dd8's components: of each near-dup cluster, exactly one
  // document survives into the corpus, chosen by quality (tx4's score)
  // with the smaller id on ties — the policy-made-explicit version of
  // dd5's blunt keep-smallest-id rule. One window over the components
  // relation (partitioned by component, never global) plus a count
  // join; at 100 TB this is the reduce side of dedup — components and
  // quality are both already partition-parallel relations. ---
  def clusterRepresentatives(s: SparkSession, d: String,
                             threshold: Double = 0.5): DataFrame = {
    val comps = dedupComponents(s, d, threshold)
    val q = TextAnalysis.qualityScoreRaw(s, d)
    val jq = comps.join(q, "doc_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("comp").orderBy(col("quality").desc, col("doc_id").asc)
    val members = comps.groupBy("comp").agg(count(lit(1)).as("n_members"))
    jq.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(members, "comp")
      .select(col("comp"), col("doc_id").as("rep_doc"),
        col("quality").as("rep_quality"), col("n_members"))
      .orderBy("comp")
  }

  /** Min-label connected components over an undirected (doc_a, doc_b)
    * pair relation; `nodes` supplies the full vertex set (isolated
    * docs label themselves). See [[dedupComponents]] for the round
    * structure and the pointer-jumping convergence argument.
    */
  private[graft] def componentsFromPairs(nodes: DataFrame, pairs: DataFrame,
                                         maxIter: Int = 20,
                                         jumpFrom: Int = 4): DataFrame = {
    val edgesCk = pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .localCheckpoint()
    // near-dup pair relations are tiny next to the corpus (they're the
    // DUPLICATES); below Graph's cap, broadcasting the edge side makes
    // each propagation round a labels-scan + hash probe instead of a
    // co-shuffle of labels + edges (same checkpointed-stats rationale
    // as Graph.guardedBroadcast — a LogicalRDD never broadcasts on its
    // own). Past the cap the plain shuffle join is the right plan.
    val edges = Graph.guardedBroadcast(edgesCk, edgesCk.count())
    var labels = nodes
      .select(col("doc_id"), col("doc_id").as("comp"))
      .localCheckpoint()
    // min-label propagation is MONOTONE (labels only decrease, node
    // set fixed), so "no label changed" is exactly "sum(comp)
    // unchanged" — one cheap agg per round instead of a full
    // next⋈prev comparison join (the gr4/gr6 convergence read).
    // decimal(38,0), not long: at extreme id scales Σ ids could
    // overflow BIGINT and ANSI mode would fail the query.
    // sum over an EMPTY label set is SQL NULL — map it to zero so the
    // degenerate empty-state read converges on round one instead of
    // NPE-ing in compareTo
    def totalOf(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("comp").cast("decimal(38,0)"))).head.getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = totalOf(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val viaNeighbor = edges
        .join(labels, edges("doc_b") === labels("doc_id"))
        .select(edges("doc_a").as("doc_id"), col("comp"))
      val withJump =
        if (iter < jumpFrom) labels.unionByName(viaNeighbor)
        else {
          val viaParent = labels.as("x")
            .join(labels.as("p"), col("x.comp") === col("p.doc_id"))
            .select(col("x.doc_id").as("doc_id"), col("p.comp").as("comp"))
          labels.unionByName(viaNeighbor).unionByName(viaParent)
        }
      val next = withJump
        .groupBy("doc_id").agg(min(col("comp")).as("comp"))
        .localCheckpoint()
      val nextSum = totalOf(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      iter += 1
    }
    // A silent partial propagation would split genuine components, so
    // fail loudly instead of returning labels that diverge from the
    // transitive closure. (With pointer jumping the cap corresponds to
    // components of diameter ~2^maxIter — beyond any real pair graph.)
    require(converged,
      s"component propagation did not converge within $maxIter rounds; " +
        "rounds needed = log2(pair-graph diameter)")
    labels
  }

  // --- DD4: SimHash near-dup pairs. 60-bit signature computed as one
  // hash-agg pass (60 conditional-sum columns, partial agg map-side);
  // pairs sharing any of four 15-bit chunks (pigeonhole: hamming <= 3
  // implies >= 1 identical chunk) verified by bit_count(xor).
  // Token instances collapse to (doc_id, h, cnt) FIRST — a cheap
  // 2-column agg — so the wide 60-sum agg runs over |vocab|-per-doc
  // rows, not token instances (3.5x on the repetitive test corpus;
  // real corpora repeat tokens too). Weighted balance sums are
  // identical to per-instance sums. 60 bits, not 64: the token hash is
  // the portable Text.h60, so the ENTIRE pipeline — hash, balance
  // signs, chunks, hamming — is replayed by the DuckDB oracle
  // (OracleGen.dd4) and hash-checked, not rows-only. ---
  /** The 60-bit SimHash signature relation (doc_id, sig) — the
    * deterministic per-document function [[graft.sources.TextIndex
    * .simhashIndex]] persists (same build-once rationale as the
    * MinHash band index: the signature pass is corpus-wide work no
    * QUERY should repeat).
    */
  private[graft] def simhashSignatures(s: SparkSession, d: String,
                                       bits: Int = 60): DataFrame =
    simhashSignaturesOf(Tables.documents(s, d), bits)

  /** Same signature pass over an arbitrary (doc_id, text) relation —
    * the form the incremental index slices (TextIndex.simhashIndex
    * Base/Delta) compute per document slice.
    */
  private[graft] def simhashSignaturesOf(docs: DataFrame,
                                         bits: Int = 60): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("t"))
      .select(col("doc_id"), Text.h60(col("t")).as("h"))
      .groupBy("doc_id", "h").agg(count(lit(1)).as("cnt"))
    val balanceCols = (0 until bits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === lit(1L),
        col("cnt")).otherwise(-col("cnt"))).as(s"b$b")
    }
    tok.groupBy("doc_id")
      .agg(balanceCols.head, balanceCols.tail: _*)
      .select(col("doc_id"),
        (0 until bits).map(b =>
          shiftleft(when(col(s"b$b") >= 0, lit(1L)).otherwise(lit(0L)), b))
          .reduce(_ + _).as("sig"))
  }

  def simhashPairs(s: SparkSession, d: String,
                   maxHamming: Int = 3): DataFrame = {
    val sigs = graft.sources.TextIndex.simhashIndex(s, d)
    val chunked = sigs
      .select(col("doc_id"), col("sig"), explode(sequence(lit(0), lit(3))).as("c"))
      .withColumn("chunk",
        when(col("c") === 0, col("sig").bitwiseAND(lit(0x7FFFL)))
          .when(col("c") === 1, shiftright(col("sig"), 15).bitwiseAND(lit(0x7FFFL)))
          .when(col("c") === 2, shiftright(col("sig"), 30).bitwiseAND(lit(0x7FFFL)))
          .otherwise(shiftright(col("sig"), 45).bitwiseAND(lit(0x7FFFL))))
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

  // --- DD9: train/eval decontamination — the pre-training hygiene
  // pass: find every training document that shares a word n-gram with
  // any held-out (eval) document, so eval-contaminated docs can be
  // dropped before the corpus ships. Eval membership here is the
  // deterministic doc_id % evalMod slice; a real pipeline passes the
  // benchmark suite as the eval side.
  //
  // Scale shape: the eval side is tiny by construction (benchmarks are
  // KBs, corpora are TBs), so only IT is deduplicated (a small
  // exchange) and broadcast; the 100 TB train side stays a raw
  // map-side gram projection — its only shuffle is the post-join
  // aggregate over MATCHED rows, which dedups per pair via
  // countDistinct (same result as pre-deduplicating, without
  // exchanging the full train gram set). At extreme eval sizes, swap
  // the broadcast for a bloom-filter prefilter + shuffled equi-join;
  // the relation shape is unchanged. Counting shared distinct
  // gram-hashes equals counting shared grams modulo xxhash64
  // collisions — the same ~n²/2⁶⁵ odds DD2 already accepts. ---
  // --- DD10: incremental dedup — match an INCOMING batch against the
  // EXISTING corpus and report, per incoming doc, its best near-dup
  // match (max Jaccard, smallest existing id on ties). This is the
  // steady-state ingest path: the existing side is the (already
  // deduped) corpus gram index you persist between runs; only the
  // batch's grams are new work. Shape mirrors DD2's gram join but
  // one-sided — candidates are (incoming x existing) sharing a gram,
  // never existing x existing, so steady-state cost scales with the
  // batch, not the corpus. ---
  def incrementalDedup(s: SparkSession, d: String,
                       threshold: Double = 0.5,
                       incomingMod: Long = 4L): DataFrame = {
    // The corpus side reads the persisted gram index — the steady-state
    // ingest shape: only the incoming batch's grams are new work (here
    // both sides slice the one index because the test corpus is static).
    val gr = graft.sources.TextIndex.gramIndex(s, d, 3)
    // The batch×corpus gram join has the same hot-gram quadratic mode
    // as the self-join (|inc_f|·|ex_f| rows per gram), so the DF cap
    // applies here too; per-doc Jaccard denominators stay uncapped.
    val capped = capByDocFreq(gr, DefaultMaxGramDocFreq)
    val inc = capped.filter(col("doc_id") % incomingMod === 0)
      .select(col("doc_id").as("doc_a"), col("gh"))
    val ex = capped.filter(col("doc_id") % incomingMod =!= 0)
      .select(col("doc_id").as("doc_b"), col("gh"))
    val shared = inc.join(ex, "gh")
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
    val jac = jaccardFromShared(shared, gr, threshold)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_a").orderBy(col("jac").desc, col("doc_b").asc)
    jac.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_a").as("inc_doc"), col("doc_b").as("match_doc"),
        round(col("jac"), 4).as("jaccard"))
      .orderBy("inc_doc")
  }

  /** Broadcast-safe bound on the eval-side gram row count. Spark's
    * broadcast ceiling is 8 GB / 512 M rows; an (id, hash) gram row
    * hashes into ~32 bytes of relation, so 50 M rows keeps the built
    * hash relation ~1.6 GB — comfortably under the ceiling while
    * still broadcasting any real benchmark suite (KBs of text per
    * task ⇒ well under a million grams).
    */
  private[graft] val EvalBroadcastBound = 50_000_000L

  /** Deliver the eval gram set to the train-side probe join by
    * whichever physical shape its SIZE allows:
    *
    *  - under `bound` rows: broadcast-hash join — the steady-state
    *    benchmark-suite shape (KBs against TBs), no train-side
    *    exchange beyond what its aggregate already pays;
    *  - over `bound`: the documented alternative (dd9/dd20 scale
    *    note) — a compact BLOOM FILTER over the eval gram hashes is
    *    aggregated distributed (`stat.bloomFilter`, ~1.2 bytes/item
    *    at 1% fpp, so the blob stays MBs when the gram rows are GBs),
    *    the 100 TB train side is prefiltered MAP-SIDE through Spark's
    *    native `BloomFilterMightContain` (codegen predicate, no UDF),
    *    and only the surviving sliver pays the shuffled equi-join.
    *    False positives are removed by the join itself, so the result
    *    relation is IDENTICAL on both paths — the same oracle proves
    *    both (DedupPathSpec forces the shuffled path).
    *
    * `bound` = Long.MaxValue force-broadcasts without counting (the
    * registered queries' zero-extra-job default); `bound` <= 0 forces
    * the bloom + shuffle path. Anything between counts the (small,
    * localCheckpoint'd so the decision doesn't recompute it) eval side
    * and selects.
    */
  private[graft] def evalGramProbeJoin(trainGrams: DataFrame,
                                       evalGrams: DataFrame,
                                       bound: Long): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graftbridge.Bridge
    val (ev, useBroadcast) =
      if (bound == Long.MaxValue) (evalGrams, true)
      else {
        // pin the (small) eval side so the size decision, the bloom
        // build, and the join read one materialization, not three
        val pinned = evalGrams.localCheckpoint()
        (pinned, bound > 0L && pinned.count() <= bound)
      }
    if (useBroadcast) trainGrams.join(broadcast(ev), "gh")
    else {
      val bloom = ev.select("gh").stat
        .bloomFilter("gh", math.max(ev.count(), 1L), 0.01)
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      val mightContain = Bridge.column(BloomFilterMightContain(
        Literal(bos.toByteArray,
          org.apache.spark.sql.types.BinaryType),
        Bridge.expression(col("gh"))))
      trainGrams.filter(mightContain).join(ev, "gh")
    }
  }

  /** `broadcastEval`: the default force-broadcasts the eval gram set —
    * right when the eval side is a benchmark suite (KBs against TBs).
    * The modulus slice used here grows WITH the corpus, so a caller
    * decontaminating against a large eval fraction passes false to get
    * the scale path: bloom-prefilter on the gram hash + shuffled
    * equi-join ([[evalGramProbeJoin]]) instead of collecting ~1% of
    * corpus grams to the driver.
    */
  def decontaminate(s: SparkSession, d: String, n: Int = 3,
                    evalMod: Long = 97L,
                    broadcastEval: Boolean = true): DataFrame = {
    val raw = gramRowsRaw(s, d, n)
    val evalGrams = raw.filter(col("doc_id") % evalMod === 0)
      .select(col("doc_id").as("eval_doc"), col("gh"))
      .dropDuplicates("eval_doc", "gh")
    val trainGrams = raw.filter(col("doc_id") % evalMod =!= 0)
      .select(col("doc_id").as("train_doc"), col("gh"))
    evalGramProbeJoin(trainGrams, evalGrams,
      if (broadcastEval) Long.MaxValue else 0L)
      .groupBy("train_doc", "eval_doc")
      .agg(countDistinct(col("gh")).as("n_shared"))
      .orderBy("train_doc", "eval_doc")
  }

  // --- DD19: PREFIX-FILTERED exact Jaccard join (the SSJoin/PPJoin
  // family) — the third exact-pair candidate source next to
  // share-any-gram (dd2) and LSH banding (dd3), and the one that stays
  // EXACT while shrinking the candidate set. Grams get a global total
  // order by (document frequency, hash) — rarest first; a doc with n
  // grams exposes only its first n − ⌈t·n⌉ + 1 grams (its "prefix") to
  // the candidate self-join. Lossless by the prefix-filter lemma
  // [Chaudhuri et al., SSJoin, ICDE'06]: J(A,B) ≥ t ⇒ |A∩B| ≥
  // ⌈t·max(|A|,|B|)⌉ = α, and sets with overlap ≥ α must collide
  // within their (|X| − α + 1)-prefixes — our per-set ⌈t·|X|⌉ prefix is
  // at least that long. At 100 TB the win is structural: candidates
  // key on the RARE end of the gram spectrum (prefix grams have the
  // lowest DF by construction), so the self-join fan-out concentrates
  // where C(f,2) is smallest — the hot-gram problem the dd2 path
  // handles with a DF cap simply cannot arise. The length filter
  // (t·|A| ≤ |B| ∧ t·|B| ≤ |A|) prunes survivors before the exact
  // verify. The prefix relation is a PURE CORPUS FUNCTION (grams,
  // document frequencies, and the threshold — nothing query-local),
  // so it is persisted in TextIndex.prefixIndex next to bandIndex
  // and each probe starts from a 3-column parquet scan instead of
  // re-ranking the whole gram index (two groupBys + a window saved
  // per query — this was the suite's #2 most expensive query).
  // Oracled by dd2's independent all-pairs formulation: the filter is
  // lossless, so the result relation is bit-identical. ---
  def prefixFilterJaccardPairs(s: SparkSession, d: String,
                               threshold: Double = 0.5): DataFrame = {
    val gr = graft.sources.TextIndex.gramIndex(s, d, 3)
    val prefix = graft.sources.TextIndex.prefixIndex(s, d, 3, threshold)
    // Candidate pairs CARRY the per-doc gram counts (na, nb) out of
    // the index — they ride along functionally on (doc_a, doc_b), so
    // the Jaccard denominators need no count re-aggregation of the
    // gram index and no join-back (two agg shuffles + two broadcasts
    // fewer than the jaccardFromShared tail the LSH paths use, which
    // lack a count-bearing candidate source).
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
      // length filter: J >= t forces t·|A| <= |B| and t·|B| <= |A|
      .filter(lit(threshold) * col("a.n") <= col("b.n") &&
        lit(threshold) * col("b.n") <= col("a.n"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .dropDuplicates("doc_a", "doc_b")
    // PPJoin-style verify: each side's full gram SET rides the pair as
    // one array column, and the shared count is a per-row
    // array_intersect — no exploded-gram join. The relational
    // alternative (cand ⋈ gr ⋈ gr + groupBy) shuffles |pairs|·avg(n)
    // match rows (17.7M at sf0.1 for 310k candidates) where this
    // shuffles |docs| array rows + 2 joins keyed on doc_id; per-row
    // intersect of distinct-hash arrays is O(na+nb). A doc in many
    // pairs replicates its array through the join — that's the verify
    // reading exactly the bytes it must, and AQE splits any hot doc.
    val docGrams = gr.groupBy("doc_id").agg(collect_list("gh").as("grams"))
    val shared = cand
      .join(docGrams.as("ga"), col("doc_a") === col("ga.doc_id"))
      .join(docGrams.as("gb"), col("doc_b") === col("gb.doc_id"))
      .withColumn("shared",
        size(array_intersect(col("ga.grams"), col("gb.grams"))).cast("long"))
    // same double expression as jaccardFromShared (na + nb − shared
    // denominators), so the dd2 oracle replay stays bit-identical
    presentPairs(shared
      .withColumn("jac",
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
      .filter(col("jac") >= threshold)
      .select("doc_a", "doc_b", "jac"))
  }

  /** The (doc_id, gh, n) SSJoin prefix relation over a gram index —
    * dd19's candidate-generation input, extracted so
    * [[graft.sources.TextIndex.prefixIndex]] can persist it. Grams get
    * a global (document frequency ASC, hash ASC) total order — rarest
    * first; a doc with n grams exposes only its first
    * n − ⌈t·n⌉ + 1 grams. Per-doc selection is one window PARTITIONED
    * BY doc_id — no global rank is ever materialized (the (df, gh)
    * pair IS the global order, computed per row).
    */
  private[graft] def prefixRelation(gr: DataFrame,
                                    threshold: Double): DataFrame = {
    val dfreq = gr.groupBy("gh").agg(count(lit(1)).as("df"))
    val sizes = gr.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df").asc, col("gh").asc)
    gr.join(dfreq, "gh")
      .withColumn("pos", row_number().over(w))
      .join(sizes, "doc_id")
      .filter(col("pos") <=
        col("n") - ceil(lit(threshold) * col("n")).cast("long") + 1)
      .select("doc_id", "gh", "n")
  }

  /** Build side of [[graft.sources.TextIndex.repeatedGramIndex]]: the
    * (gram, n_docs, n_occurrences) catalog of word n-grams appearing
    * in >= `floor` distinct documents. Counting runs on 8-byte gram
    * hashes (map-side combined, strings never shuffle); only the
    * surviving repeated set — tiny relative to the corpus — recovers
    * its strings via a broadcast join back onto the gram stream, so
    * the only string shuffle is the repeated subset's dropDuplicates.
    * This pays the corpus gram stream twice (counts + recovery), which
    * is exactly why it lives behind the build-once index and not in
    * the per-query path (the round-7 dd13 ran this shape per query and
    * was the suite's slowest entry at 3.66 s).
    */
  private[graft] def repeatedGramCatalog(s: SparkSession, d: String,
                                         n: Int, floor: Long): DataFrame = {
    def grams = gramStrings(s, d, n)
      .select(col("doc_id"), col("gram"), xxhash64(col("gram")).as("gh"))
    val counts = grams.groupBy("gh")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= floor)
    grams.join(broadcast(counts), "gh")
      .dropDuplicates("gh") // counts are per-gh constants; gram likewise
      .select(col("gram"), col("n_docs"), col("n_occurrences"))
  }

  // --- DD13: boilerplate-span catalog — word 8-grams repeated across
  // >= minDocs distinct documents, the substring-level signal that
  // doc-level dedup misses (license headers, navigation chrome,
  // quoted passages). The count-on-hash pass and winner-string
  // recovery are a pure corpus function, persisted once as
  // TextIndex.repeatedGramIndex (floor = 2, the weakest meaningful
  // repetition bound); the query is then a scan of that small catalog
  // — filter, order, topK — with no corpus scan at all, the
  // steady-state shape a boilerplate service has at 100 TB. ---
  def boilerplateSpans(s: SparkSession, d: String, n: Int = 8,
                       minDocs: Long = 3L, topK: Int = 25): DataFrame = {
    require(minDocs >= 2L,
      s"boilerplate is by definition repeated text; minDocs=$minDocs < 2 " +
        "would catalog every unique n-gram in the corpus")
    graft.sources.TextIndex.repeatedGramIndex(s, d, n)
      .filter(col("n_docs") >= minDocs)
      .select(col("gram"), col("n_docs"), col("n_occurrences"))
      .orderBy(col("n_docs").desc, col("n_occurrences").desc, col("gram").asc)
      .limit(topK)
  }

  // --- DD22: boilerplate COVERAGE — per-document share of 8-gram
  // occurrences hitting the corpus boilerplate catalog (dd13's
  // repeated-gram index, filtered to minDocs), the per-doc diagnostic
  // a scrub policy thresholds on ("this page is 80% chrome"). The
  // catalog side is the persisted index (tiny, broadcast); the
  // per-doc side is the one corpus gram pass a coverage report
  // irreducibly requires — counts ride on 8-byte hashes, strings
  // never shuffle. ---
  def boilerplateCoverage(s: SparkSession, d: String, n: Int = 8,
                          minDocs: Long = 3L, topK: Int = 25): DataFrame = {
    val winners = graft.sources.TextIndex.repeatedGramIndex(s, d, n)
      .filter(col("n_docs") >= minDocs)
      .select(xxhash64(col("gram")).as("gh"), lit(1L).as("hit"))
    gramStrings(s, d, n)
      .select(col("doc_id"), xxhash64(col("gram")).as("gh"))
      .join(broadcast(winners), Seq("gh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).cast("long").as("n_boiler"))
      .filter(col("n_boiler") > 0)
      .withColumn("coverage",
        round(col("n_boiler").cast("double") / col("n_grams"), 6))
      .orderBy(col("coverage").desc, col("doc_id").asc)
      .limit(topK)
      .select("doc_id", "n_grams", "n_boiler", "coverage")
  }

  // --- DD11: normalized ("fuzzy-exact") dedup — casefold, strip
  // punctuation, collapse whitespace, then hash. Catches the
  // boilerplate-variant duplicates exact dedup misses and near-dup
  // sketches overkill. Pure per-row projection + one window keyed on
  // the fingerprint (hash-partitions evenly — fingerprints are
  // uniform), so it scales as a single shuffle of (doc_id, fp). ---
  def normalizedDedup(s: SparkSession, d: String): DataFrame = {
    val byFp = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        Text.fingerprint(Text.normalized(col("text"))).as("fp"))
      .withColumn("canonical_id", min(col("doc_id")).over(byFp))
      .withColumn("is_dup", (col("doc_id") =!= col("canonical_id")).cast("int"))
      .orderBy("doc_id")
  }

  // --- DD20: TIERED contamination report — the eval-leakage audit a
  // lab runs before trusting a benchmark score, composing the three
  // detection legs this engine already maintains indexes for, at
  // three severities:
  //   tier 3 (near-duplicate): a train doc with exact Jaccard ≥ 0.5
  //     among the LSH band candidates (dd3's verified pair relation);
  //   tier 2 (n-gram overlap): a train doc sharing ≥ minShared
  //     distinct 3-grams (dd9's containment signal — catches quoted
  //     spans that don't make a whole-doc near-dup);
  //   tier 1 (semantic): a same-IVF-cell train vector with cosine ≥
  //     0.3 (dd15's SemDeDup signal — paraphrase-level leakage no
  //     lexical test sees).
  // Every leg is index-probed (gram/band/IVF from TextIndex and
  // VectorIndex, built once per corpus) and eval-restricted BEFORE
  // its join, so the audit costs eval×candidates, never corpus².
  // A doc's tier is its worst hit; clean docs are omitted. All counts
  // are exact integers, so the whole report hash-oracles (OracleGen
  // .dd20Sql replays all three legs). ---
  def contaminationTiers(s: SparkSession, d: String,
                         evalMod: Long = 97L, minShared: Int = 5,
                         nearThreshold: Double = 0.5,
                         semThreshold: Double = 0.3,
                         numCells: Int = 16,
                         evalBroadcastBound: Long = Long.MaxValue)
      : DataFrame = {
    val gh = graft.sources.TextIndex.gramIndex(s, d, 3, portable = true)
    // exact-overlap leg: train grams probe the (small) eval gram set —
    // dd9's decontamination shape, broadcast under the bound, bloom-
    // prefilter + shuffled equi-join over it (evalGramProbeJoin)
    val evalG = gh.filter(col("doc_id") % evalMod === 0)
      .select(col("doc_id").as("eval_doc"), col("gh"))
    val trainG = gh.filter(col("doc_id") % evalMod =!= 0)
      .select(col("doc_id").as("train_doc"), col("gh"))
    val nExact = evalGramProbeJoin(trainG, evalG, evalBroadcastBound)
      .groupBy("eval_doc", "train_doc").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .groupBy("eval_doc").agg(count(lit(1)).as("n_exact"))
    // near-dup leg: dd3's banded-candidate + exact-verify pair
    // relation, kept to eval×train pairs
    val isEvalA = col("doc_a") % evalMod === 0
    val isEvalB = col("doc_b") % evalMod === 0
    val nNear = minhashLshPairsRaw(s, d, nearThreshold)
      .filter(isEvalA =!= isEvalB)
      .select(when(isEvalA, col("doc_a")).otherwise(col("doc_b"))
        .as("eval_doc"))
      .groupBy("eval_doc").agg(count(lit(1)).as("n_near"))
    // semantic leg: dd15's cell-bounded cosine pairs (vec ids are doc
    // ids), eval×train only
    val isEvA = col("id_a") % evalMod === 0
    val isEvB = col("id_b") % evalMod === 0
    val nSem = Similarity.semanticDedupPairs(s, d, semThreshold, numCells)
      .filter(isEvA =!= isEvB)
      .select(when(isEvA, col("id_a")).otherwise(col("id_b")).as("eval_doc"))
      .groupBy("eval_doc").agg(count(lit(1)).as("n_sem"))
    nExact.join(nNear, Seq("eval_doc"), "full_outer")
      .join(nSem, Seq("eval_doc"), "full_outer")
      .na.fill(0L, Seq("n_exact", "n_near", "n_sem"))
      .withColumn("tier",
        when(col("n_near") > 0, 3)
          .when(col("n_exact") > 0, 2)
          .when(col("n_sem") > 0, 1).otherwise(0))
      .filter(col("tier") > 0)
      .select(col("eval_doc"), col("n_exact"), col("n_near"),
        col("n_sem"), col("tier"))
      .orderBy("eval_doc")
  }

  // --- DD21: boilerplate SCRUB — the rewrite side of dd13's span
  // catalog, i.e. C4's line-level dedup re-expressed for a corpus with
  // no newlines: segment every document into NON-overlapping k-word
  // chunks (the "lines"), ban any chunk whose exact text appears in
  // >= minDocs distinct documents, and reassemble each document from
  // its surviving chunks in order. Emits the per-doc audit row
  // (chunk totals + md5 of the rewritten text) rather than the
  // rewritten corpus itself, so the whole transform hash-oracles.
  //
  // Scale shape: chunking is a pure map-side projection (sequence +
  // slice + concat_ws, all codegen — no HOF lambdas); the ban list is
  // counted on 8-byte chunk hashes (map-side combined, strings never
  // shuffle) and is TINY after the min-docs filter, so the scrub
  // itself is a broadcast anti-join — at 100 TB the corpus streams
  // past a broadcast hash set, one shuffle total (the per-doc
  // reassembly, keyed on doc_id, which hash-partitions evenly). The
  // per-doc chunk arrays are bounded by document length, so the one
  // HOF (field extraction after array_sort) runs on aggregated
  // ~dozens-element arrays, never the corpus-wide chunk stream. ---
  def spanScrub(s: SparkSession, d: String, k: Int = 8,
                minDocs: Long = 3L): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val banned = chunkRowsOf(docs, k).groupBy("gh")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select("gh")
    spanScrubFrom(docs, banned, k)
  }

  /** Non-overlapping k-word chunk rows (doc_id, ci, chunk, gh) — the
    * segmentation both the batch scrub and the streaming chunk-index
    * maintenance share (one definition, or the stream-maintained ban
    * list would drift from the batch one). Chunk ci covers words
    * [ci·k+1, ci·k+k]; the last chunk is the (possibly short)
    * remainder — slice clamps. Pure map-side projection.
    */
  private[graft] def chunkRowsOf(docs: DataFrame, k: Int): DataFrame = {
    val ws = col("ws")
    docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        explode(sequence(lit(0L), ((size(ws) + lit(k - 1)) / k - 1)
          .cast("long"))).as("ci"), ws)
      .select(col("doc_id"), col("ci"),
        concat_ws(" ", slice(ws, (col("ci") * k + 1).cast("int"), lit(k)))
          .as("chunk"))
      .select(col("doc_id"), col("ci"), col("chunk"),
        xxhash64(col("chunk")).as("gh"))
  }

  /** The scrub tail against an externally supplied ban list (gh
    * column) — fed by [[spanScrub]]'s inline count or by the
    * stream-maintained chunk index (Streams.readSpanScrub).
    */
  private[graft] def spanScrubFrom(docs: DataFrame, banned: DataFrame,
                                   k: Int): DataFrame = {
    val chunks = chunkRowsOf(docs, k)
    val keptAgg = chunks.join(broadcast(banned.select("gh")), Seq("gh"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_sort(collect_list(struct(col("ci"), col("chunk"))))
          .as("ordered"))
      .select(col("doc_id"), col("n_kept"),
        md5(array_join(transform(col("ordered"), _.getField("chunk")),
          " ")).as("scrubbed_md5"))
    docs
      .select(col("doc_id"),
        ((size(split(col("text"), " ")) + lit(k - 1)) / k).cast("long")
          .as("n_chunks"))
      .join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        (col("n_chunks") - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"),
        coalesce(col("scrubbed_md5"), md5(lit(""))).as("scrubbed_md5"))
      .orderBy("doc_id")
  }

  // --- DD23: SHINGLE-SIZE SENSITIVITY — how robust is the near-dup
  // threshold to the n-gram size choice? The tuning audit a dedup
  // rollout runs before fixing n: for each candidate shingle size,
  // the exact-Jaccard pair counts on the keyed subsample (dd2's
  // oracle-checkable slice) at the deployment threshold. A pair
  // census that swings wildly across n means the corpus sits near the
  // threshold and the chosen n is load-bearing; a flat census means
  // any n works. Shape per n: one gram explode over the SUBSAMPLE
  // (never the corpus), per-doc distinct counts, one shared-gram
  // self-join — all counts exact integers, three relations unioned.
  // At 100 TB this runs on the same keyed sample dd2/dd6 use; the
  // full-corpus decision stays with the LSH family. ---
  def shingleSensitivity(s: SparkSession, d: String,
                         ns: Seq[Int] = Seq(2, 3, 5),
                         threshold: Double = 0.5,
                         sampleMod: Long = 5L): DataFrame = {
    val docs = Tables.documents(s, d)
      .filter(col("doc_id") % sampleMod === 0)
      .select("doc_id", "text")
    ns.map { n =>
      val grams = gramStringsOf(docs, n)
        .select(col("doc_id"), xxhash64(col("gram")).as("gh"))
        .dropDuplicates("doc_id", "gh")
      val cnt = grams.groupBy("doc_id").agg(count(lit(1)).as("ng"))
      val shared = grams.as("a").join(grams.as("b"),
          col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("sh"))
      shared
        .join(cnt.withColumnRenamed("doc_id", "da")
          .withColumnRenamed("ng", "na"), "da")
        .join(cnt.withColumnRenamed("doc_id", "db")
          .withColumnRenamed("ng", "nb"), "db")
        .agg(count(lit(1)).as("n_candidate_pairs"),
          sum(when(col("sh").cast("double")
            / (col("na") + col("nb") - col("sh")).cast("double")
            >= threshold, 1L).otherwise(0L)).as("n_pairs_ge_threshold"))
        .select(lit(n).as("n"), col("n_candidate_pairs"),
          col("n_pairs_ge_threshold"))
    }.reduce(_ unionByName _)
      .orderBy("n")
  }

  /** Oracle twin of [[shingleSensitivity]] — dd19's exact-Jaccard
    * formulation replayed once per shingle size on token strings.
    */
  def shingleSensitivityOracleSql(ns: Seq[Int] = Seq(2, 3, 5),
                                  threshold: Double = 0.5,
                                  sampleMod: Long = 5L): String =
    ns.map { n =>
      s"""SELECT $n AS n,
         |  CAST(count(*) AS BIGINT) AS n_candidate_pairs,
         |  CAST(sum(CASE WHEN CAST(sh AS DOUBLE)
         |      / CAST(na + nb - sh AS DOUBLE) >= $threshold
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs_ge_threshold
         |FROM (
         |  SELECT da, db, sh, ca.ng AS na, cb.ng AS nb FROM (
         |    SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS sh
         |    FROM (
         |      SELECT DISTINCT doc_id,
         |        unnest(list_transform(
         |          generate_series(1, greatest(len(ws) - ${n - 1}, 0)),
         |          i -> array_to_string(ws[i:i+${n - 1}], ' '))) AS g
         |      FROM (SELECT doc_id, string_split(text, ' ') AS ws
         |            FROM documents WHERE doc_id % $sampleMod = 0)) a
         |    JOIN (
         |      SELECT DISTINCT doc_id,
         |        unnest(list_transform(
         |          generate_series(1, greatest(len(ws) - ${n - 1}, 0)),
         |          i -> array_to_string(ws[i:i+${n - 1}], ' '))) AS g
         |      FROM (SELECT doc_id, string_split(text, ' ') AS ws
         |            FROM documents WHERE doc_id % $sampleMod = 0)) b
         |      ON a.g = b.g AND a.doc_id < b.doc_id
         |    GROUP BY 1, 2) sp
         |  JOIN (SELECT doc_id, count(*) AS ng FROM (
         |      SELECT DISTINCT doc_id,
         |        unnest(list_transform(
         |          generate_series(1, greatest(len(ws) - ${n - 1}, 0)),
         |          i -> array_to_string(ws[i:i+${n - 1}], ' '))) AS g
         |      FROM (SELECT doc_id, string_split(text, ' ') AS ws
         |            FROM documents WHERE doc_id % $sampleMod = 0))
         |    GROUP BY doc_id) ca ON ca.doc_id = sp.da
         |  JOIN (SELECT doc_id, count(*) AS ng FROM (
         |      SELECT DISTINCT doc_id,
         |        unnest(list_transform(
         |          generate_series(1, greatest(len(ws) - ${n - 1}, 0)),
         |          i -> array_to_string(ws[i:i+${n - 1}], ' '))) AS g
         |      FROM (SELECT doc_id, string_split(text, ' ') AS ws
         |            FROM documents WHERE doc_id % $sampleMod = 0))
         |    GROUP BY doc_id) cb ON cb.doc_id = sp.db)""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY n")

  // --- DD26: EXACT SUBSTRING dedup (the ExactSubstr family — public
  // approach: suffix-array the corpus, emit verbatim token runs >= L
  // shared across documents; the operator every set-similarity dedup
  // in this suite misses, because a 50-token verbatim quote inside two
  // otherwise-different documents moves n-gram Jaccard (dd2/dd19) only
  // marginally and lives BELOW the CDC chunk grain (dd13/dd21)).
  //
  // Spark-first shape — anchors instead of a suffix array:
  //  * INDEX side: every positional anchor-k-gram (doc_id, pos, gh) —
  //    a linear relation, one map-side projection (same explode +
  //    element_at idiom as gramRows, persisted by
  //    TextIndex.anchorIndex like every other corpus-pure relation).
  //  * PROBE side: the SAME relation restricted to positions on a
  //    stride s = minRun − k + 1. Detection is GUARANTEED, not
  //    heuristic: a shared run of length R >= minRun spans anchor
  //    starts [st, st + R − k], a window of R − k + 1 >= s consecutive
  //    positions, and the strided lattice {1, 1+s, 1+2s, …} intersects
  //    every s-length window. The stride only removes redundant
  //    discoveries of the same run (factor ~s fewer candidates).
  //  * Candidates: one equi-join on gh across distinct docs. Hot
  //    anchors are guarded by a STRICT frequency cap (dd25's
  //    discipline): dropping a hot anchor would silently lose runs,
  //    so an engaged cap fails loudly and names the fix (raise k —
  //    anchor DF is monotone non-increasing in k).
  //  * VERIFY + EXTEND per candidate: join each side's token array in
  //    (arrays shuffle once, keyed on doc_id, only for docs that
  //    appear in candidates) and extend the match maximally left and
  //    right with per-row array expressions — the right extension
  //    re-compares the anchor window itself, so an xxhash64 anchor
  //    collision is verified away rather than trusted. Every anchor
  //    inside one run extends to the SAME maximal (start_a, start_b,
  //    run_len), so dropDuplicates on the normalized pair+start yields
  //    exactly the maximal-run relation a suffix array would emit.
  //
  // 100 TB shape: index is linear in corpus tokens; probe is 1/s of
  // it; candidate fan-out is bounded by the anchor-DF cap; extension
  // cost is O(run length) per surviving candidate. No driver-side
  // state, no all-pairs stage. Oracled by an independent DuckDB
  // formulation (single-token matches grouped into diagonal islands —
  // brute force, no anchors), so the anchor+extension machinery is
  // hash-checked against a different algorithm end to end. ---

  /** Positional anchor k-grams (doc_id, pos, gh) of an arbitrary
    * (doc_id, text) relation — UNLIKE [[gramRowsOf]] the position
    * survives (runs are positional objects) and nothing is
    * deduplicated. Pure map-side projection.
    */
  private[graft] def anchorRowsOf(docs: DataFrame, k: Int): DataFrame = {
    val ws = col("ws")
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(ws) >= k)
      .select(col("doc_id"), ws,
        explode(sequence(lit(1), size(ws) - lit(k - 1))).as("pos"))
      .select(col("doc_id"), col("pos"), xxhash64(concat_ws(" ",
        (0 until k).map(i => element_at(ws, col("pos") + lit(i))): _*)).as("gh"))
  }

  /** [[anchorRowsOf]] over the corpus — the build side of
    * [[graft.sources.TextIndex.anchorIndex]].
    */
  private[graft] def anchorRows(s: SparkSession, d: String, k: Int): DataFrame =
    anchorRowsOf(Tables.documents(s, d), k)

  /** Anchor-frequency guard for dd26's candidate join. STRICT like
    * dd25's gram cap, for the same reason with sharper teeth: the cap
    * exists to bound the gh-join fan-out, but an ENGAGED cap here
    * would drop anchors and silently lose whole runs (not merely skew
    * a score), so it must fail loudly. The window hash-partitions by
    * gh — the exchange the candidate join needs anyway.
    */
  private def capAnchorFreq(anch: DataFrame, maxFreq: Long): DataFrame = {
    val byGh = org.apache.spark.sql.expressions.Window.partitionBy("gh")
    anch.withColumn("af", count(lit(1)).over(byGh))
      .withColumn("af",
        when(col("af") > maxFreq, raise_error(format_string(
          "dd26 anchor frequency cap engaged (freq = %d > cap = %d): " +
            "dropping a hot anchor would silently lose verbatim runs — " +
            "raise the anchor size k (anchor DF is non-increasing in k) " +
            "or the cap",
          col("af"), lit(maxFreq)))).otherwise(col("af")))
      .filter(col("af") <= maxFreq).drop("af")
  }

  /** Maximal cross-document verbatim token runs of >= `minRun` tokens
    * over an arbitrary (doc_id, text) relation — the testable core
    * (specs plant runs in synthetic docs; the corpus form is
    * [[exactSubstringRuns]]). `index` optionally supplies a persisted
    * positional anchor relation so the corpus path reuses
    * TextIndex.anchorIndex instead of re-gramming.
    */
  private[graft] def exactSubstringRunsOf(docs: DataFrame,
                                          anchor: Int = 8,
                                          minRun: Int = 15,
                                          maxAnchorFreq: Long = DefaultMaxGramDocFreq,
                                          index: Option[DataFrame] = None)
      : DataFrame = {
    require(minRun >= anchor,
      s"minRun ($minRun) must be >= anchor size ($anchor)")
    val stride = minRun - anchor + 1
    val anch = capAnchorFreq(
      index.getOrElse(anchorRowsOf(docs, anchor)), maxAnchorFreq)
    val probe = anch.filter(((col("pos") - 1) % stride) === 0)
    val cand = probe.as("p").join(anch.as("x"),
        col("p.gh") === col("x.gh") && col("p.doc_id") =!= col("x.doc_id"))
      .select(col("p.doc_id").as("da"), col("p.pos").as("pa"),
        col("x.doc_id").as("db"), col("x.pos").as("pb"))
    extendToMaximalRuns(cand, docs, anchor, minRun)
  }

  /** Candidate verification + maximal extension — the shared tail of
    * [[exactSubstringRunsOf]] (corpus self-join) and
    * [[exactSubstringProbe]] (single-doc index probe): anchored
    * candidate (da, pa, db, pb) positions extend to their maximal
    * verbatim run, normalize to (min-id, max-id) with matching starts,
    * and dedup to the maximal-run relation.
    */
  private[graft] def extendToMaximalRuns(cand: DataFrame, docs: DataFrame,
                                         anchor: Int,
                                         minRun: Int): DataFrame = {
    val arrs = docs.select(col("doc_id"),
      split(col("text"), " ").as("ws"))
    // per-candidate verify + maximal extension. All slice bounds are
    // in-range by construction, so the zip_with equality arrays are
    // null-free and array_position(…, false) is exactly "first
    // mismatch" (0 = none: the run reaches the array boundary).
    val eq = (x: org.apache.spark.sql.Column,
              y: org.apache.spark.sql.Column) => x === y
    val withArrs = cand
      .join(arrs.as("ia"), col("da") === col("ia.doc_id"))
      .join(arrs.as("ib"), col("db") === col("ib.doc_id"))
      .select(col("da"), col("pa"), col("db"), col("pb"),
        col("ia.ws").as("wsa"), col("ib.ws").as("wsb"))
    val runs = withArrs
      // right window INCLUDES the anchor tokens — the hash-collision
      // verify rides the extension for free
      .withColumn("m", least(size(col("wsa")) - col("pa"),
        size(col("wsb")) - col("pb")) + lit(1))
      .withColumn("ffr", array_position(zip_with(
        slice(col("wsa"), col("pa"), col("m")),
        slice(col("wsb"), col("pb"), col("m")), eq), false))
      .withColumn("right_len",
        when(col("ffr") === 0, col("m").cast("long"))
          .otherwise(col("ffr") - 1))
      .filter(col("right_len") >= anchor)
      .withColumn("pl", least(col("pa"), col("pb")) - lit(1))
      .withColumn("ffl", array_position(zip_with(
        reverse(slice(col("wsa"), col("pa") - col("pl"), col("pl"))),
        reverse(slice(col("wsb"), col("pb") - col("pl"), col("pl"))), eq),
        false))
      .withColumn("left_ext",
        when(col("ffl") === 0, col("pl").cast("long"))
          .otherwise(col("ffl") - 1))
      .withColumn("run_len", col("left_ext") + col("right_len"))
      .filter(col("run_len") >= minRun)
    // normalization: smaller doc first; for SAME-doc candidates (the
    // dd31 self-repetition form) the earlier position first — the two
    // discovery orders of one run land on the same row either way
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("pa") < col("pb"))
    runs
      .select(
        least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"),
        when(aFirst, col("pa") - col("left_ext"))
          .otherwise(col("pb") - col("left_ext")).cast("long").as("start_a"),
        when(aFirst, col("pb") - col("left_ext"))
          .otherwise(col("pa") - col("left_ext")).cast("long").as("start_b"),
        col("run_len"))
      .dropDuplicates("doc_a", "doc_b", "start_a", "start_b")
      .repartition(col("doc_a"))
      .orderBy("doc_a", "doc_b", "start_a", "start_b")
  }

  /** DD26 over the corpus: every maximal verbatim token run of >=
    * `minRun` tokens shared between two distinct documents, as
    * (doc_a, doc_b, start_a, start_b, run_len) with doc_a < doc_b and
    * 1-based token starts. Reference data shape: the free-text review
    * corpus (`Codes/MovieShoppingServer/DatabaseAccessor.py:22-23`,
    * review.csv `content` column) is where verbatim cross-review
    * quoting lives below dd13/dd21's chunk grain.
    */
  def exactSubstringRuns(s: SparkSession, d: String,
                         anchor: Int = 8, minRun: Int = 15): DataFrame =
    exactSubstringRunsOf(Tables.documents(s, d), anchor, minRun,
      index = Some(graft.sources.TextIndex.anchorIndex(s, d, anchor)))

  // --- DD28: SINGLE-DOC SUBSTRING PROBE — dd26's ingest-time serving
  // form (the dd16 pattern applied to the anchor index): "does this
  // incoming document verbatim-quote the corpus, and where?". The
  // probe doc's STRIDED anchors are collected (bounded: ⌈len/stride⌉
  // hashes for one document — the sanctioned tiny-key-set collect) and
  // pushed into the persisted anchor index scan as an In filter on the
  // stored gh column (row-group pruning — PlanSpec asserts the push),
  // so per-probe cost is proportional to the matching index rows,
  // never the corpus. Candidates then verify + extend through the
  // dd26 tail. Same detection guarantee as dd26 (every >= minRun run
  // contains a strided probe anchor); no frequency cap needed — the
  // fan-out is one doc's anchors times their index hits, linear by
  // construction. ---
  def exactSubstringProbe(s: SparkSession, d: String,
                          queryDoc: Long = 8L,
                          anchor: Int = 8, minRun: Int = 15): DataFrame = {
    import s.implicits._
    val idx = graft.sources.TextIndex.anchorIndex(s, d, anchor)
    val stride = minRun - anchor + 1
    // one doc's strided (pos, gh) anchors — the probe key set
    val probeAnchors = idx
      .filter(col("doc_id") === queryDoc &&
        ((col("pos") - 1) % stride) === 0)
      .select(col("pos"), col("gh")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    val ghs = probeAnchors.map(_._2).distinct
    val cand = idx
      .filter(col("gh").isin(ghs: _*) && col("doc_id") =!= queryDoc)
      .join(broadcast(probeAnchors.toDF("pa", "gh")), "gh")
      .select(lit(queryDoc).as("da"), col("pa"),
        col("doc_id").as("db"), col("pos").as("pb"))
    extendToMaximalRuns(cand, Tables.documents(s, d), anchor, minRun)
      .select(
        when(col("doc_a") === queryDoc, col("doc_b"))
          .otherwise(col("doc_a")).as("match_doc"),
        when(col("doc_a") === queryDoc, col("start_a"))
          .otherwise(col("start_b")).as("start_probe"),
        when(col("doc_a") === queryDoc, col("start_b"))
          .otherwise(col("start_a")).as("start_match"),
        col("run_len"))
      .orderBy("match_doc", "start_probe", "start_match")
  }

  /** Oracle twin of [[exactSubstringProbe]] — the dd26 brute-force
    * island relation restricted to pairs involving the probe doc,
    * re-keyed probe-centric.
    */
  def exactSubstringProbeOracleSql(queryDoc: Long = 8L,
                                   minRun: Int = 15): String =
    s"""WITH t AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
       |    generate_subscripts(string_split(text, ' '), 1) AS pos
       |  FROM documents),
       |j AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa, b.pos AS pb
       |  FROM t a JOIN t b ON a.w = b.w AND a.doc_id < b.doc_id
       |  WHERE a.doc_id = $queryDoc OR b.doc_id = $queryDoc),
       |g AS (
       |  SELECT da, db, pa - pb AS diag, pa,
       |    pa - row_number() OVER (PARTITION BY da, db, pa - pb
       |                            ORDER BY pa) AS isl
       |  FROM j),
       |r AS (
       |  SELECT da, db,
       |    CAST(min(pa) AS BIGINT) AS start_a,
       |    CAST(min(pa) - diag AS BIGINT) AS start_b,
       |    CAST(count(*) AS BIGINT) AS run_len
       |  FROM g GROUP BY da, db, diag, isl
       |  HAVING count(*) >= $minRun)
       |SELECT
       |  CASE WHEN da = $queryDoc THEN db ELSE da END AS match_doc,
       |  CASE WHEN da = $queryDoc THEN start_a ELSE start_b END
       |    AS start_probe,
       |  CASE WHEN da = $queryDoc THEN start_b ELSE start_a END
       |    AS start_match,
       |  run_len
       |FROM r
       |ORDER BY match_doc, start_probe, start_match""".stripMargin

  // --- DD27: VERBATIM-RUN SCRUB — the removal side of the ExactSubstr
  // family (public pipeline: after finding cross-document verbatim
  // runs, cut every copy but one out of the corpus; dd26 finds, dd27
  // cuts). Policy is deterministic: the EARLIER document (smaller
  // doc_id — the dd5 keep-first convention) keeps its copy; the later
  // document loses the span, token-precise (dd21 scrubs at chunk
  // grain; this is the token-exact complement). A doc can win some
  // pairs and lose others — each duplicated span class keeps at least
  // its minimum-id copy. Shape: dd26's run relation (index-bucketed,
  // never all-pairs) → per-doc interval UNION of the losing spans (one
  // window per doc — overlapping runs from different partners merge,
  // so removal counts never double-count a token) → one range
  // anti-join of positional tokens against the merged intervals
  // (equi-keyed on doc_id; intervals per doc are few) → per-doc
  // reassembly exactly like dd21 (md5 of the kept tokens in order —
  // scrubbed text compared by hash, the oracle replays it verbatim).
  // Every doc reports, touched or not: (n_tokens, n_removed, n_spans,
  // scrubbed_md5), so the relation doubles as the corpus-shrinkage
  // audit (Σ n_removed / Σ n_tokens is the dedup savings). ---
  def exactSubstringScrub(s: SparkSession, d: String,
                          anchor: Int = 8, minRun: Int = 15): DataFrame =
    exactSubstringScrubOf(Tables.documents(s, d),
      exactSubstringRuns(s, d, anchor, minRun))

  /** The scrub tail over any (doc_id, text) relation and a dd26-shaped
    * run relation — extracted so specs can plant runs directly.
    */
  private[graft] def exactSubstringScrubOf(docs: DataFrame,
                                           runs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the later doc loses its copy: spans to remove, inclusive 1-based.
    // DISTINCT is load-bearing for determinism, not just size: two
    // partners can contribute the IDENTICAL (st, en) span, and exact
    // ties make the (st ASC, en DESC) window order non-total — an
    // engine evaluating the flag pass and the island-sum pass with
    // different tie orders then splits one island in two (observed as
    // a flaky n_spans in DuckDB). After the dedup the order is total
    // per doc, so every engine agrees.
    val spans = runs.select(col("doc_b").as("doc_id"),
      col("start_b").as("st"),
      (col("start_b") + col("run_len") - 1).as("en"))
      .dropDuplicates("doc_id", "st", "en")
    // interval union per doc: a span starts a new island iff it begins
    // past everything seen so far (max(en) over preceding, st-ordered)
    val byDoc = Window.partitionBy("doc_id")
      .orderBy(col("st").asc, col("en").desc)
    val merged = spans
      .withColumn("prev_max",
        max(col("en")).over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_max").isNull || col("st") > col("prev_max"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("new_island"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(min(col("st")).as("st"), max(col("en")).as("en"))
    // reassembly runs ONLY over touched docs (those owning a span):
    // split-then-join with one delimiter is an identity, so an
    // untouched doc's scrubbed hash IS md5(text) — no explode, no
    // per-token shuffle, no per-doc re-hash for the (at 100 TB,
    // overwhelming) clean majority. Was the suite's #8 query at sf0.1
    // (1.46 s) when it rebuilt all 5k docs; the corpus-scale cost now
    // tracks the duplicate tail, not the corpus.
    val touched = merged.select("doc_id").distinct()
    val toks = docs.join(touched, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("ws"),
        explode(sequence(lit(1), size(col("ws")))).as("pos"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        element_at(col("ws"), col("pos")).as("w"))
    val kept = toks.as("t").join(merged.as("m"),
        col("t.doc_id") === col("m.doc_id") &&
          col("t.pos").between(col("m.st"), col("m.en")), "left_anti")
    val keptAgg = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("w")))),
          _.getField("w")), " ")).as("scrubbed_md5"))
    val spanCounts = merged.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"))
    docs
      .select(col("doc_id"), col("text"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(keptAgg, Seq("doc_id"), "left")
      .join(spanCounts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        // untouched: nothing removed; touched-with-no-kept-rows: the
        // whole doc was one duplicated span
        when(col("n_spans").isNull, lit(0L))
          .otherwise(col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        when(col("n_spans").isNull, md5(col("text")))
          .otherwise(coalesce(col("scrubbed_md5"), md5(lit(""))))
          .as("scrubbed_md5"))
      .orderBy("doc_id")
  }

  /** Oracle twin of [[exactSubstringScrub]] — the dd26 brute-force
    * island relation, the same interval union (SQL window form), a
    * NOT EXISTS range anti-join, and DuckDB's ordered string_agg
    * replaying the reassembly hash.
    */
  def exactSubstringScrubOracleSql(minRun: Int = 15): String =
    s"""WITH t AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
       |    generate_subscripts(string_split(text, ' '), 1) AS pos
       |  FROM documents),
       |j AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa, b.pos AS pb
       |  FROM t a JOIN t b ON a.w = b.w AND a.doc_id < b.doc_id),
       |g AS (
       |  SELECT da, db, pa - pb AS diag, pa,
       |    pa - row_number() OVER (PARTITION BY da, db, pa - pb
       |                            ORDER BY pa) AS isl
       |  FROM j),
       |r AS (
       |  -- DISTINCT makes the (st ASC, en DESC) window order TOTAL
       |  -- per doc (identical spans from two partners would otherwise
       |  -- tie, and the flag and island-sum windows may see different
       |  -- tie orders — nondeterministic n_spans)
       |  SELECT DISTINCT doc_id, st, en FROM (
       |    SELECT db AS doc_id,
       |      CAST(min(pa) - diag AS BIGINT) AS st,
       |      CAST(min(pa) - diag + count(*) - 1 AS BIGINT) AS en
       |    FROM g GROUP BY da, db, diag, isl
       |    HAVING count(*) >= $minRun)),
       |iu AS (
       |  SELECT doc_id, st, en,
       |    CASE WHEN st > coalesce(max(en) OVER (PARTITION BY doc_id
       |        ORDER BY st ASC, en DESC
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      -1) THEN 1 ELSE 0 END AS new_island
       |  FROM r),
       |mi AS (
       |  SELECT doc_id, island, min(st) AS st, max(en) AS en FROM (
       |    SELECT doc_id, st, en,
       |      sum(new_island) OVER (PARTITION BY doc_id
       |        ORDER BY st ASC, en DESC
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |    FROM iu)
       |  GROUP BY doc_id, island),
       |kept AS (
       |  SELECT t.doc_id, t.pos, t.w FROM t
       |  WHERE NOT EXISTS (SELECT 1 FROM mi
       |    WHERE mi.doc_id = t.doc_id AND t.pos BETWEEN mi.st AND mi.en)),
       |ka AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       |    md5(string_agg(w, ' ' ORDER BY pos)) AS scrubbed_md5
       |  FROM kept GROUP BY doc_id),
       |sc AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans
       |  FROM mi GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       |  CAST(len(string_split(d.text, ' '))
       |    - coalesce(ka.n_kept, 0) AS BIGINT) AS n_removed,
       |  CAST(coalesce(sc.n_spans, 0) AS BIGINT) AS n_spans,
       |  coalesce(ka.scrubbed_md5, md5('')) AS scrubbed_md5
       |FROM documents d
       |LEFT JOIN ka ON ka.doc_id = d.doc_id
       |LEFT JOIN sc ON sc.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // --- DD32: TOKEN-LEVEL DECONTAMINATION — the public n-gram-overlap
  // eval scrub at run precision (the GPT-3 appendix convention:
  // 13-gram overlap between a training document and an eval document
  // marks contamination): dd9 counts shared 3-grams set-wise and dd20
  // tiers them; this finds the verbatim RUNS >= minRun = 13 tokens and
  // WHERE they sit in both documents — the evidence a scrub actually
  // cuts (dd27's span shape), not just a score. Same anchor machinery,
  // split across the dd9 eval convention (doc_id % evalMod == 0): the
  // eval side is the small side, so its STRIDED anchors probe the
  // train anchors — per-eval-doc cost proportional to its anchor hits,
  // the dd28 serving shape batched over the whole eval suite. ---
  def substringDecontaminate(s: SparkSession, d: String,
                             anchor: Int = 8, minRun: Int = 13,
                             evalMod: Long = 97L): DataFrame = {
    val idx = graft.sources.TextIndex.anchorIndex(s, d, anchor)
    val stride = minRun - anchor + 1
    val probe = idx.filter(col("doc_id") % evalMod === 0 &&
      ((col("pos") - 1) % stride) === 0)
    val train = idx.filter(col("doc_id") % evalMod =!= 0)
    val cand = probe.as("p").join(train.as("x"),
        col("p.gh") === col("x.gh"))
      .select(col("p.doc_id").as("da"), col("p.pos").as("pa"),
        col("x.doc_id").as("db"), col("x.pos").as("pb"))
    // pairs are always (eval, train) — the split is disjoint, so the
    // min-id normalization is undone into eval/train presentation
    extendToMaximalRuns(cand, Tables.documents(s, d), anchor, minRun)
      .select(
        when(col("doc_a") % evalMod === 0, col("doc_a"))
          .otherwise(col("doc_b")).as("eval_doc"),
        when(col("doc_a") % evalMod === 0, col("doc_b"))
          .otherwise(col("doc_a")).as("train_doc"),
        when(col("doc_a") % evalMod === 0, col("start_a"))
          .otherwise(col("start_b")).as("start_eval"),
        when(col("doc_a") % evalMod === 0, col("start_b"))
          .otherwise(col("start_a")).as("start_train"),
        col("run_len"))
      .orderBy("eval_doc", "train_doc", "start_eval", "start_train")
  }

  /** Oracle twin of [[substringDecontaminate]] — brute-force islands
    * restricted to cross-split pairs, re-keyed eval-first.
    */
  def substringDecontaminateOracleSql(minRun: Int = 13,
                                      evalMod: Long = 97L): String =
    s"""WITH t AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
       |    generate_subscripts(string_split(text, ' '), 1) AS pos
       |  FROM documents),
       |j AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa, b.pos AS pb
       |  FROM t a JOIN t b ON a.w = b.w AND a.doc_id < b.doc_id
       |  WHERE (a.doc_id % $evalMod = 0) <> (b.doc_id % $evalMod = 0)),
       |g AS (
       |  SELECT da, db, pa - pb AS diag, pa,
       |    pa - row_number() OVER (PARTITION BY da, db, pa - pb
       |                            ORDER BY pa) AS isl
       |  FROM j),
       |r AS (
       |  SELECT da, db,
       |    CAST(min(pa) AS BIGINT) AS start_a,
       |    CAST(min(pa) - diag AS BIGINT) AS start_b,
       |    CAST(count(*) AS BIGINT) AS run_len
       |  FROM g GROUP BY da, db, diag, isl
       |  HAVING count(*) >= $minRun)
       |SELECT
       |  CASE WHEN da % $evalMod = 0 THEN da ELSE db END AS eval_doc,
       |  CASE WHEN da % $evalMod = 0 THEN db ELSE da END AS train_doc,
       |  CASE WHEN da % $evalMod = 0 THEN start_a ELSE start_b END
       |    AS start_eval,
       |  CASE WHEN da % $evalMod = 0 THEN start_b ELSE start_a END
       |    AS start_train,
       |  run_len
       |FROM r
       |ORDER BY eval_doc, train_doc, start_eval, start_train""".stripMargin

  // --- DD31: SELF-REPETITION RUNS — the WITHIN-document complement of
  // dd26 (the ExactSubstr pipeline dedups within-doc repeats too): a
  // maximal verbatim token run appearing at two positions of the SAME
  // document, the repetition/degeneration signal ("the model said it
  // three times") a corpus gate scores before training. Same anchor
  // machinery at a finer grain (k = 3, minRun = 4 — self-repeats live
  // shorter than cross-doc quotes), candidates from the persisted
  // anchor index self-joined WITHIN doc (pos differs), the shared
  // extension tail, positions normalized earlier-first. Tandem repeats
  // overlap their own image (diag < run length) — both the extension
  // and the oracle's diagonal islands count them identically. Fan-out
  // is per-document (an anchor's matches within one doc are bounded by
  // doc length), so no frequency cap is needed. ---
  def selfRepetitionRuns(s: SparkSession, d: String,
                         anchor: Int = 3, minRun: Int = 4): DataFrame =
    selfRepetitionRunsOf(Tables.documents(s, d), anchor, minRun,
      index = Some(graft.sources.TextIndex.anchorIndex(s, d, anchor)))

  /** The testable core over any (doc_id, text) relation — specs plant
    * tandem and distant repeats directly.
    */
  private[graft] def selfRepetitionRunsOf(docs: DataFrame,
                                          anchor: Int = 3, minRun: Int = 4,
                                          index: Option[DataFrame] = None)
      : DataFrame = {
    require(minRun >= anchor)
    val anch = index.getOrElse(anchorRowsOf(docs, anchor))
    val stride = minRun - anchor + 1
    val probe = anch.filter(((col("pos") - 1) % stride) === 0)
    val cand = probe.as("p").join(anch.as("x"),
        col("p.gh") === col("x.gh") &&
          col("p.doc_id") === col("x.doc_id") &&
          col("p.pos") =!= col("x.pos"))
      .select(col("p.doc_id").as("da"), col("p.pos").as("pa"),
        col("x.doc_id").as("db"), col("x.pos").as("pb"))
    extendToMaximalRuns(cand, docs, anchor, minRun)
      .select(col("doc_a").as("doc_id"), col("start_a"), col("start_b"),
        col("run_len"))
      .orderBy("doc_id", "start_a", "start_b")
  }

  /** Oracle twin of [[selfRepetitionRuns]] — brute-force within-doc
    * positional matches (pa < pb), diagonal islands, no anchors.
    */
  def selfRepetitionOracleSql(minRun: Int = 4): String =
    s"""WITH t AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
       |    generate_subscripts(string_split(text, ' '), 1) AS pos
       |  FROM documents),
       |j AS (
       |  SELECT a.doc_id AS d, a.pos AS pa, b.pos AS pb
       |  FROM t a JOIN t b
       |    ON a.w = b.w AND a.doc_id = b.doc_id AND a.pos < b.pos),
       |g AS (
       |  SELECT d, pb - pa AS diag, pa,
       |    pa - row_number() OVER (PARTITION BY d, pb - pa
       |                            ORDER BY pa) AS isl
       |  FROM j),
       |r AS (
       |  SELECT d AS doc_id,
       |    CAST(min(pa) AS BIGINT) AS start_a,
       |    CAST(min(pa) + diag AS BIGINT) AS start_b,
       |    CAST(count(*) AS BIGINT) AS run_len
       |  FROM g GROUP BY d, diag, isl)
       |SELECT doc_id, start_a, start_b, run_len
       |FROM r WHERE run_len >= $minRun
       |ORDER BY doc_id, start_a, start_b""".stripMargin

  // --- DD30: INCREMENTAL SUBSTRING PAIRS — dd26's batch-arrival twin
  // (the dd17 shape applied to the anchor index): a batch of new
  // documents lands, anchors are computed for the BATCH ONLY and
  // published as a delta directory (positional anchors are a pure
  // per-document function — no corpus statistics, so base ∪ delta IS
  // the full index and existing files are never rewritten), and the
  // batch's verbatim runs come from the delta's STRIDED anchors
  // probing base ∪ delta. Per-batch cost is proportional to the
  // batch's anchors times their hits — never the corpus. Emits every
  // maximal run INVOLVING a batch doc (two-old-docs runs were found
  // when their own batches landed — the dd17/dd25 contract). Batch
  // boundary = max_id·4/5 + 1 in exact integer arithmetic, replayed
  // verbatim by the oracle. ---
  def incrementalSubstringPairs(s: SparkSession, d: String,
                                anchor: Int = 8,
                                minRun: Int = 15): DataFrame = {
    val maxId = Tables.documents(s, d)
      .agg(max(col("doc_id"))).head.getLong(0)
    val boundary = maxId * 4 / 5 + 1
    val base = graft.sources.TextIndex.anchorIndexBase(s, d, boundary, anchor)
    val delta = graft.sources.TextIndex.anchorIndexDelta(s, d, boundary, anchor)
    val stride = minRun - anchor + 1
    val probe = delta.filter(((col("pos") - 1) % stride) === 0)
    val cand = probe.as("p").join(base.unionByName(delta).as("x"),
        col("p.gh") === col("x.gh") && col("p.doc_id") =!= col("x.doc_id"))
      .select(col("p.doc_id").as("da"), col("p.pos").as("pa"),
        col("x.doc_id").as("db"), col("x.pos").as("pb"))
    extendToMaximalRuns(cand, Tables.documents(s, d), anchor, minRun)
  }

  /** Oracle twin of [[incrementalSubstringPairs]] — the dd26 brute
    * force restricted to batch-involving pairs, boundary replayed in
    * the same exact integer arithmetic.
    */
  def incrementalSubstringOracleSql(minRun: Int = 15): String =
    s"""WITH bnd AS (
       |  SELECT CAST(max(doc_id) AS BIGINT) * 4 // 5 + 1 AS v
       |  FROM documents),
       |t AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
       |    generate_subscripts(string_split(text, ' '), 1) AS pos
       |  FROM documents),
       |j AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa, b.pos AS pb
       |  FROM t a JOIN t b ON a.w = b.w AND a.doc_id < b.doc_id
       |  WHERE a.doc_id >= (SELECT v FROM bnd)
       |     OR b.doc_id >= (SELECT v FROM bnd)),
       |g AS (
       |  SELECT da, db, pa - pb AS diag, pa,
       |    pa - row_number() OVER (PARTITION BY da, db, pa - pb
       |                            ORDER BY pa) AS isl
       |  FROM j),
       |r AS (
       |  SELECT da AS doc_a, db AS doc_b,
       |    CAST(min(pa) AS BIGINT) AS start_a,
       |    CAST(min(pa) - diag AS BIGINT) AS start_b,
       |    CAST(count(*) AS BIGINT) AS run_len
       |  FROM g GROUP BY da, db, diag, isl)
       |SELECT doc_a, doc_b, start_a, start_b, run_len
       |FROM r WHERE run_len >= $minRun
       |ORDER BY doc_a, doc_b, start_a, start_b""".stripMargin

  // --- DD29: WINNOWING MATCH PAIRS — the MOSS report [Schleimer,
  // Wilkerson & Aiken, SIGMOD'03] over tx7's fingerprint relation:
  // candidate near-dup pairs ranked by shared winnowed fingerprints,
  // scored by CONTAINMENT (shared / min(|fp_a|, |fp_b|)) so a short
  // document quoted inside a long one scores high where symmetric
  // Jaccard (dd2) dilutes it — the robust, cheap screen that sits
  // between the LSH families (probabilistic, whole-doc) and dd26
  // (exact, token-precise): the winnowing guarantee (every window of
  // w consecutive grams selects a fingerprint) makes any verbatim run
  // of >= k + w − 1 = 6 tokens share a fingerprint DETERMINISTICALLY,
  // no banding luck involved. Shape at 100 TB: the fingerprint
  // relation is a 1/w-dense sample of the gram stream (the whole
  // point of winnowing — index size ~25% of dd2's), the pair join
  // keys on fingerprint equality, and both count joins are plain
  // doc-keyed equi-joins. Composes tx7 verbatim — one fingerprint
  // definition, two consumers (Pack3Spec's guarantee test and this
  // report), the posting-list amortization discipline. ---
  def winnowMatchPairs(s: SparkSession, d: String,
                       minShared: Long = 2L): DataFrame = {
    val fp = TextAnalysis.winnowingFingerprints(s, d)
    val cnt = fp.groupBy("doc_id").agg(count(lit(1)).as("nfp"))
    val shared = fp.as("a").join(fp.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    shared
      .join(cnt.select(col("doc_id").as("doc_a"), col("nfp").as("nf_a")),
        "doc_a")
      .join(cnt.select(col("doc_id").as("doc_b"), col("nfp").as("nf_b")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        col("nf_a"), col("nf_b"),
        round(col("n_shared").cast("double")
          / least(col("nf_a"), col("nf_b")).cast("double"), 4)
          .as("containment"))
      .orderBy("doc_a", "doc_b")
  }

  /** Oracle twin of [[winnowMatchPairs]] — tx7's fingerprint CTE
    * replayed (md5 hex min-compare, 4-window), then the same pair
    * join, floor, and containment arithmetic.
    */
  def winnowMatchPairsOracleSql(minShared: Long = 2L): String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
       |           FROM documents
       |           WHERE len(string_split(text, ' ')) >= 3),
       |p AS (SELECT doc_id, ws,
       |        unnest(generate_series(1, len(ws) - 2)) AS pos
       |      FROM w),
       |g AS (SELECT doc_id, pos,
       |        md5(array_to_string(ws[pos:pos+2], ' ')) AS gh
       |      FROM p),
       |m AS (SELECT doc_id,
       |        min(gh) OVER (PARTITION BY doc_id ORDER BY pos
       |          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
       |      FROM g),
       |fps AS (SELECT DISTINCT doc_id, fp FROM m),
       |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nfp
       |        FROM fps GROUP BY 1),
       |sh AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         CAST(count(*) AS BIGINT) AS n_shared
       |       FROM fps a JOIN fps b
       |         ON a.fp = b.fp AND a.doc_id < b.doc_id
       |       GROUP BY 1, 2 HAVING count(*) >= $minShared)
       |SELECT doc_a, doc_b, n_shared,
       |  ca.nfp AS nf_a, cb.nfp AS nf_b,
       |  round(CAST(n_shared AS DOUBLE) / least(ca.nfp, cb.nfp), 4)
       |    AS containment
       |FROM sh
       |JOIN cnt ca ON ca.doc_id = doc_a
       |JOIN cnt cb ON cb.doc_id = doc_b
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Oracle twin of [[exactSubstringRuns]] — a DIFFERENT algorithm:
    * brute-force single-token positional matches grouped into
    * diagonal islands (pa − pb constant, consecutive pa), no anchors,
    * no extension. Quadratic in matching token positions — fine at
    * oracle SF, unrunnable at scale, which is the point.
    */
  def exactSubstringOracleSql(minRun: Int = 15): String =
    s"""WITH t AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
       |    generate_subscripts(string_split(text, ' '), 1) AS pos
       |  FROM documents),
       |j AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa, b.pos AS pb
       |  FROM t a JOIN t b ON a.w = b.w AND a.doc_id < b.doc_id),
       |g AS (
       |  SELECT da, db, pa - pb AS diag, pa,
       |    pa - row_number() OVER (PARTITION BY da, db, pa - pb
       |                            ORDER BY pa) AS isl
       |  FROM j),
       |r AS (
       |  SELECT da AS doc_a, db AS doc_b,
       |    CAST(min(pa) AS BIGINT) AS start_a,
       |    CAST(min(pa) - diag AS BIGINT) AS start_b,
       |    CAST(count(*) AS BIGINT) AS run_len
       |  FROM g GROUP BY da, db, diag, isl)
       |SELECT doc_a, doc_b, start_a, start_b, run_len
       |FROM r WHERE run_len >= $minRun
       |ORDER BY doc_a, doc_b, start_a, start_b""".stripMargin
}
