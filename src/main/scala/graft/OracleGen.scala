package graft

import graft.functions.Text

/** Programmatic DuckDB oracle SQL for pipelines whose hash/math
  * chains are replayed cross-engine: the MinHash/LSH and SimHash
  * dedup families (dd3/dd4/dd12) and the ANN index probes
  * (sim3/sim4/sim8). The SQL embeds the exact literal parameters the
  * Spark operators fold into their plans — affine minhash
  * coefficients, band layouts, LSH hyperplanes — over portable
  * primitives: `Text.h60` (top 60 bits of md5, which DuckDB parses as
  * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`) for hashing, and
  * explicit left-associative double-precision dot products (term
  * order identical to FloatVecDot's accumulation loop, so every sign
  * bit, argmax, and 4dp rounding agrees bit-for-bit) for vector math.
  * The oracle therefore computes the IDENTICAL result, and these
  * approximate ops are hash-checked by the driver rather than
  * rows-only.
  */
object OracleGen {

  /** DuckDB twin of [[graft.functions.Text.h60]]. */
  def h60(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 15)) AS BIGINT)"

  /** DuckDB twin of [[graft.functions.Text.affineHash]]. */
  def affine(h: String, a: Long, b: Long): String =
    s"($a * ($h % ${Text.MinhashM}) + $b) % ${Text.MinhashP}"

  /** Shared CTE block: word-3-gram shingles and their distinct h60
    * hashes per doc — the DuckDB twin of Dedup.gramRowsPortable.
    */
  private val gramCtes: String =
    s"""w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |grams AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(list_transform(generate_series(1, greatest(len(ws) - 2, 0)),
       |           i -> array_to_string(ws[i:i+2], ' '))) AS g
       |  FROM w),
       |gh AS (SELECT DISTINCT doc_id, ${h60("g")} AS h FROM grams)""".stripMargin

  /** CTE block from gh → the (doc_id, band, bucket) banded MinHash
    * relation (twin of Dedup.minhashSignatures + bandedSignatures —
    * what sources.TextIndex.bandIndex persists).
    */
  private def lshBandedCtes(numHashes: Int, bands: Int): String = {
    val rows = numHashes / bands
    val minCols = Text.minhashParams(numHashes).zipWithIndex.map {
      case ((a, b), i) => s"  min(${affine("h", a, b)}) AS h$i"
    }.mkString(",\n")
    val bandStructs = (0 until bands).map { b =>
      val key = (b * rows until (b + 1) * rows)
        .map(i => s"CAST(h$i AS VARCHAR)").mkString(" || '-' || ")
      s"      {'band': $b, 'bucket': $key}"
    }.mkString(",\n")
    s"""sig AS (SELECT doc_id,
       |$minCols
       |  FROM gh GROUP BY doc_id),
       |banded AS (
       |  SELECT doc_id, u.band AS band, u.bucket AS bucket FROM (
       |    SELECT doc_id, unnest([
       |$bandStructs
       |    ]) AS u FROM sig) t)""".stripMargin
  }

  /** CTE block from gh → LSH band-bucket candidate pairs (twin of
    * Dedup.candidatesFromBanded over the banded relation).
    */
  private def lshCandCtes(numHashes: Int, bands: Int): String =
    s"""${lshBandedCtes(numHashes, bands)},
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM banded a JOIN banded b
       |           ON a.band = b.band AND a.bucket = b.bucket
       |          AND a.doc_id < b.doc_id)""".stripMargin

  /** dd16_doc_neardup_probe: near-dups of ONE document by probing the
    * banded relation with the query doc's own band keys — the twin of
    * Dedup.docNearDupProbe's pushed-down IN probe.
    */
  def dd16Sql(queryDoc: Long = 8L, threshold: Double = 0.3,
              numHashes: Int = 64, bands: Int = 16): String =
    s"""WITH $gramCtes,
       |${lshBandedCtes(numHashes, bands)},
       |cand AS (SELECT DISTINCT CAST($queryDoc AS BIGINT) AS doc_a,
       |                c.doc_id AS doc_b
       |         FROM banded q JOIN banded c
       |           ON q.band = c.band AND q.bucket = c.bucket
       |         WHERE q.doc_id = $queryDoc AND c.doc_id <> $queryDoc),
       |$lshVerifyCtes
       |SELECT doc_b AS match_doc,
       |  round(CAST(s AS DOUBLE) / (ca.n + cb.n - s), 4) AS jaccard
       |FROM shared JOIN cnt ca ON ca.doc_id = doc_a
       |            JOIN cnt cb ON cb.doc_id = doc_b
       |WHERE CAST(s AS DOUBLE) / (ca.n + cb.n - s) >= $threshold
       |ORDER BY match_doc""".stripMargin

  /** dd3_minhash_lsh: LSH candidates verified by exact Jaccard over
    * the shared distinct-h60 gram counts.
    */
  /** cnt + shared CTEs from cand + gh: the exact-Jaccard verify over
    * shared distinct-h60 gram counts — ONE definition composed by the
    * dd3 pair query and every keep-set/corpus-select twin, so a change
    * to the verify shape cannot diverge between them.
    */
  private val lshVerifyCtes: String =
    s"""cnt AS (SELECT doc_id, count(*) AS n FROM gh GROUP BY doc_id),
       |shared AS (SELECT c.doc_a, c.doc_b, count(*) AS s
       |           FROM cand c
       |           JOIN gh ga ON ga.doc_id = c.doc_a
       |           JOIN gh gb ON gb.doc_id = c.doc_b AND ga.h = gb.h
       |           GROUP BY 1, 2)""".stripMargin

  def dd3Sql(threshold: Double = 0.5,
             numHashes: Int = 64, bands: Int = 16): String =
    s"""WITH $gramCtes,
       |${lshCandCtes(numHashes, bands)},
       |$lshVerifyCtes,
       |j AS (SELECT doc_a, doc_b, CAST(s AS DOUBLE) / (ca.n + cb.n - s) AS jac
       |      FROM shared JOIN cnt ca ON ca.doc_id = doc_a
       |                  JOIN cnt cb ON cb.doc_id = doc_b)
       |SELECT doc_a, doc_b, round(jac, 4) AS jaccard FROM j
       |WHERE jac >= $threshold ORDER BY doc_a, doc_b""".stripMargin

  /** zo1_zorder_keys: DuckDB replay of the Morton interleave — the
    * same five binary-magic-numbers spread rounds as
    * `graft.plans.MortonInterleave.spread`, constants interpolated
    * from the very masks the Scala code uses so the two can never
    * drift. Hour index = epoch microseconds integer-divided to hours
    * (the floor semantics of Spark's `unix_timestamp`).
    */
  def zo1Sql(k: Int = 20): String = {
    val masks = Seq(16 -> 0x0000FFFF0000FFFFL, 8 -> 0x00FF00FF00FF00FFL,
      4 -> 0x0F0F0F0F0F0F0F0FL, 2 -> 0x3333333333333333L,
      1 -> 0x5555555555555555L)
    val rounds = masks.zipWithIndex.map { case ((sh, m), i) =>
      val prev = if (i == 0) "src" else s"r$i"
      s"""r${i + 1} AS (SELECT event_id, user_id,
         |  (xa | (xa << $sh)) & $m AS xa,
         |  (ya | (ya << $sh)) & $m AS ya FROM $prev)""".stripMargin
    }.mkString(",\n")
    s"""WITH dims AS (
       |  SELECT max(user_id) + 1 AS uden,
       |    min((epoch_us(ts) // 1000000) // 3600) AS hmin,
       |    max((epoch_us(ts) // 1000000) // 3600)
       |      - min((epoch_us(ts) // 1000000) // 3600) + 1 AS hden
       |  FROM events),
       |src AS (
       |  SELECT event_id, user_id,
       |    ((user_id * 1024) // (SELECT uden FROM dims)) & 4294967295 AS xa,
       |    (((((epoch_us(ts) // 1000000) // 3600) - (SELECT hmin FROM dims))
       |       * 1024) // (SELECT hden FROM dims)) & 4294967295 AS ya
       |  FROM events),
       |$rounds
       |SELECT event_id, user_id, (xa | (ya << 1)) AS zkey
       |FROM r5 ORDER BY zkey, event_id LIMIT $k""".stripMargin
  }

  /** dd17_incremental_index: dd3's chain restricted to pairs whose
    * larger member is in the arriving batch (doc_id >= max·4/5 + 1,
    * exact integer arithmetic — batch ids are all above base ids, so
    * the batch member of any base×batch pair is always doc_b). The
    * Spark side answers this from base + delta index directories; the
    * oracle replays the full signature chain and applies the same
    * boundary, proving the incremental layout is answer-identical.
    */
  def dd17Sql(threshold: Double = 0.5,
              numHashes: Int = 64, bands: Int = 16): String =
    s"""WITH $gramCtes,
       |${lshBandedCtes(numHashes, bands)},
       |bound AS (SELECT max(doc_id) * 4 // 5 + 1 AS b FROM documents),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM banded a JOIN banded b
       |           ON a.band = b.band AND a.bucket = b.bucket
       |          AND a.doc_id < b.doc_id
       |         WHERE b.doc_id >= (SELECT b FROM bound)),
       |$lshVerifyCtes,
       |j AS (SELECT doc_a, doc_b, CAST(s AS DOUBLE) / (ca.n + cb.n - s) AS jac
       |      FROM shared JOIN cnt ca ON ca.doc_id = doc_a
       |                  JOIN cnt cb ON cb.doc_id = doc_b)
       |SELECT doc_a, doc_b, round(jac, 4) AS jaccard FROM j
       |WHERE jac >= $threshold ORDER BY doc_a, doc_b""".stripMargin

  /** CTE block from cand + gh → the verified LSH drop set (distinct
    * doc_b of pairs at/above the Jaccard threshold) — the shared tail
    * of every keep-set/corpus-select twin running on LSH pairs.
    */
  private def lshDropsCtes(threshold: Double): String =
    s"""$lshVerifyCtes,
       |drops AS (SELECT DISTINCT doc_b FROM shared
       |          JOIN cnt ca ON ca.doc_id = doc_a
       |          JOIN cnt cb ON cb.doc_id = doc_b
       |          WHERE CAST(s AS DOUBLE) / (ca.n + cb.n - s) >= $threshold)""".stripMargin

  /** dd14_keepset_lsh: DD5's keep set with the pair relation sourced
    * from the LSH path (dd3) instead of the exact self-join — the
    * documented 100 TB composition, hash-checked end to end.
    */
  def dd14Sql(threshold: Double = 0.5,
              numHashes: Int = 64, bands: Int = 16): String =
    s"""WITH $gramCtes,
       |${lshCandCtes(numHashes, bands)},
       |${lshDropsCtes(threshold)}
       |SELECT doc_id, source FROM documents
       |WHERE doc_id NOT IN (SELECT doc_b FROM drops)
       |ORDER BY doc_id""".stripMargin

  /** dp11_corpus_select_lsh: DP1's corpus selection with the near-dup
    * drop side sourced from the LSH pair relation.
    */
  def dp11Sql(qualityFloor: Double = 0.55, threshold: Double = 0.5,
              numHashes: Int = 64, bands: Int = 16): String =
    s"""WITH $gramCtes,
       |${lshCandCtes(numHashes, bands)},
       |${lshDropsCtes(threshold)},
       |q AS (
       |  SELECT doc_id, round(
       |    (CASE WHEN len(ws) BETWEEN 20 AND 2000 THEN 1.0 ELSE 0.4 END) * 0.4
       |    + (CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)) * 0.4
       |    + (1.0 - least(CAST(len(list_filter(ws, t -> t IN ('the', 'a')))
       |                        AS DOUBLE) / len(ws) * 2.0, 1.0)) * 0.2, 4)
       |    AS quality
       |  FROM w)
       |SELECT d.doc_id, d.source,
       |  CAST(len(string_split(d.text, ' ')) AS INTEGER) AS n_tokens,
       |  q.quality
       |FROM documents d JOIN q ON q.doc_id = d.doc_id
       |WHERE d.lang = 'en'
       |  AND len(string_split(d.text, ' ')) BETWEEN 20 AND 2000
       |  AND q.quality >= $qualityFloor
       |  AND d.doc_id NOT IN (SELECT doc_b FROM drops)
       |ORDER BY d.doc_id""".stripMargin

  /** dd12_lsh_audit: exact-Jaccard truth pairs vs the LSH candidate
    * set — n_true / n_candidates / n_hits / recall, one row.
    */
  /** dp18_filter_funnel: the corpus-select stage chain replayed as
    * cumulative-conjunction counts, exploded into the 4-row attrition
    * report.
    */
  def dp18Sql(qualityFloor: Double = 0.55, threshold: Double = 0.5,
              numHashes: Int = 64, bands: Int = 16): String =
    s"""WITH $gramCtes,
       |${lshCandCtes(numHashes, bands)},
       |${lshDropsCtes(threshold)},
       |q AS (
       |  SELECT doc_id, round(
       |    (CASE WHEN len(ws) BETWEEN 20 AND 2000 THEN 1.0 ELSE 0.4 END) * 0.4
       |    + (CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)) * 0.4
       |    + (1.0 - least(CAST(len(list_filter(ws, t -> t IN ('the', 'a')))
       |                        AS DOUBLE) / len(ws) * 2.0, 1.0)) * 0.2, 4)
       |    AS quality
       |  FROM w),
       |f AS (
       |  SELECT CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS s1,
       |    CASE WHEN len(string_split(d.text, ' ')) BETWEEN 20 AND 2000
       |         THEN 1 ELSE 0 END AS lenok,
       |    CASE WHEN q.quality >= $qualityFloor THEN 1 ELSE 0 END AS qok,
       |    CASE WHEN d.doc_id NOT IN (SELECT doc_b FROM drops)
       |         THEN 1 ELSE 0 END AS notdup
       |  FROM documents d JOIN q ON q.doc_id = d.doc_id),
       |m AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n0,
       |    CAST(sum(s1) AS BIGINT) AS n1,
       |    CAST(sum(s1 * lenok) AS BIGINT) AS n2,
       |    CAST(sum(s1 * lenok * qok) AS BIGINT) AS n3,
       |    CAST(sum(s1 * lenok * qok * notdup) AS BIGINT) AS n4
       |  FROM f)
       |SELECT '1_lang_en' AS stage, n0 AS docs_in, n1 AS docs_out,
       |  round(CAST(n1 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) AS pct_kept
       |FROM m
       |UNION ALL SELECT '2_length_20_2000', n1, n2,
       |  round(CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) FROM m
       |UNION ALL SELECT '3_quality_floor', n2, n3,
       |  round(CAST(n3 AS DOUBLE) / CAST(n2 AS DOUBLE), 6) FROM m
       |UNION ALL SELECT '4_near_dup_drop', n3, n4,
       |  round(CAST(n4 AS DOUBLE) / CAST(n3 AS DOUBLE), 6) FROM m
       |ORDER BY stage""".stripMargin

  /** dp20_dataset_card: the one-row release summary over dp11's
    * survivor chain — counts, tokens, scaled-int mean quality, source
    * spread, near-dup drop rate.
    */
  def dp20Sql(qualityFloor: Double = 0.55, threshold: Double = 0.5,
              numHashes: Int = 64, bands: Int = 16): String =
    s"""WITH $gramCtes,
       |${lshCandCtes(numHashes, bands)},
       |${lshDropsCtes(threshold)},
       |q AS (
       |  SELECT doc_id, round(
       |    (CASE WHEN len(ws) BETWEEN 20 AND 2000 THEN 1.0 ELSE 0.4 END) * 0.4
       |    + (CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)) * 0.4
       |    + (1.0 - least(CAST(len(list_filter(ws, t -> t IN ('the', 'a')))
       |                        AS DOUBLE) / len(ws) * 2.0, 1.0)) * 0.2, 4)
       |    AS quality
       |  FROM w),
       |sel AS (
       |  SELECT d.doc_id, d.source,
       |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       |    q.quality
       |  FROM documents d JOIN q ON q.doc_id = d.doc_id
       |  WHERE d.lang = 'en'
       |    AND len(string_split(d.text, ' ')) BETWEEN 20 AND 2000
       |    AND q.quality >= $qualityFloor
       |    AND d.doc_id NOT IN (SELECT doc_b FROM drops)),
       |t AS (SELECT CAST(count(*) AS BIGINT) AS docs_total FROM documents),
       |dr AS (SELECT CAST(count(*) AS BIGINT) AS n_dropped FROM drops)
       |SELECT t.docs_total,
       |  CAST(count(*) AS BIGINT) AS docs_selected,
       |  CAST(sum(n_tokens) AS BIGINT) AS tokens_selected,
       |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       |  round(CAST(sum(CAST(round(quality * 10000) AS BIGINT)) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) / 10000.0, 6) AS mean_quality,
       |  round(CAST(dr.n_dropped AS DOUBLE) / CAST(t.docs_total AS DOUBLE), 6)
       |    AS near_dup_rate
       |FROM sel, t, dr
       |GROUP BY t.docs_total, dr.n_dropped""".stripMargin

  def dd12Sql(threshold: Double = 0.7,
              numHashes: Int = 64, bands: Int = 16): String =
    s"""WITH $gramCtes,
       |${lshCandCtes(numHashes, bands)},
       |cnt AS (SELECT doc_id, count(*) AS n FROM gh GROUP BY doc_id),
       |tshared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |              count(*) AS s
       |            FROM gh a JOIN gh b ON a.h = b.h AND a.doc_id < b.doc_id
       |            GROUP BY 1, 2),
       |truth AS (SELECT doc_a, doc_b FROM tshared
       |          JOIN cnt ca ON ca.doc_id = doc_a
       |          JOIN cnt cb ON cb.doc_id = doc_b
       |          WHERE CAST(s AS DOUBLE) / (ca.n + cb.n - s) >= $threshold),
       |t AS (SELECT count(*) AS n_true FROM truth),
       |c2 AS (SELECT count(*) AS n_candidates FROM cand),
       |h AS (SELECT count(*) AS n_hits
       |      FROM truth tr JOIN cand ca
       |        ON tr.doc_a = ca.doc_a AND tr.doc_b = ca.doc_b)
       |SELECT n_true, n_candidates, n_hits,
       |  CASE WHEN n_true = 0 THEN 1.0
       |       ELSE round(CAST(n_hits AS DOUBLE) / n_true, 4) END AS recall
       |FROM t, c2, h""".stripMargin

  // ---- ANN oracle machinery ----------------------------------------

  /** A double literal that parses back to the exact double Spark
    * computes with (Float→Double widening is exact; Double.toString
    * round-trips).
    */
  private def fmtF(v: Double): String = {
    val s = java.lang.Double.toString(v)
    if (s.startsWith("-")) s"($s)" else s
  }

  /** Explicit left-associative double dot product of two FLOAT[]
    * columns — bit-identical to FloatVecDot's `acc += (double)a[i] *
    * (double)b[i]` loop.
    */
  def pairDot(a: String, b: String, dim: Int = 64): String =
    (1 to dim).map(k =>
      s"CAST($a[$k] AS DOUBLE) * CAST($b[$k] AS DOUBLE)").mkString(" + ")

  /** Dot of a FLOAT[] column with a literal plane — the plane values
    * are the FLOAT-truncated literals Spark folds into its plan
    * (Vectors.hyperplaneBit uses lit(p.toFloat)).
    */
  private def litDot(a: String, plane: Array[Double]): String =
    plane.zipWithIndex.map { case (p, i) =>
      s"CAST($a[${i + 1}] AS DOUBLE) * ${fmtF(p.toFloat.toDouble)}"
    }.mkString(" + ")

  /** norms CTE: per-vector L2 norm with FloatVecDot's exact
    * accumulation (vecCosine computes dAB / (sqrt(dAA)·sqrt(dBB));
    * hoisting the sqrt into a CTE changes nothing bit-wise).
    */
  private def normsCte(dim: Int): String =
    s"""norms AS (
       |  SELECT vec_id, sqrt(${pairDot("embedding", "embedding", dim)}) AS nrm
       |  FROM embeddings)""".stripMargin

  /** buckets CTE: the multi-table hyperplane-LSH assignment — twin of
    * sources.VectorIndex.lshIndex (same seeded planes, same sign/shift
    * packing).
    */
  private def lshBucketsCte(numTables: Int, planesPerTable: Int,
                            dim: Int): String = {
    val structs = (0 until numTables).map { t =>
      val planes = graft.functions.Vectors.randomPlanes(planesPerTable, dim, 42L + t)
      val bucket = planes.zipWithIndex.map { case (p, i) =>
        s"(CASE WHEN ${litDot("embedding", p)} >= 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"      {'tbl': $t, 'bucket': $bucket}"
    }.mkString(",\n")
    s"""buckets AS (
       |  SELECT vec_id, u.tbl AS tbl, u.bucket AS bucket FROM (
       |    SELECT vec_id, unnest([
       |$structs
       |    ]) AS u FROM embeddings) t)""".stripMargin
  }

  /** candidate → exact-rerank → top-k tail shared by sim3/sim4:
    * expects a `cand(query_id, vec_id)` CTE in scope.
    */
  private def rerankTail(k: Int, dim: Int): String =
    s"""scored AS (
       |  SELECT cand.query_id, cand.vec_id,
       |    round((${pairDot("e.embedding", "qe.embedding", dim)})
       |          / (ne.nrm * nq.nrm), 4) AS cos_sim
       |  FROM cand
       |  JOIN embeddings e  ON e.vec_id = cand.vec_id
       |  JOIN embeddings qe ON qe.vec_id = cand.query_id
       |  JOIN norms ne ON ne.vec_id = cand.vec_id
       |  JOIN norms nq ON nq.vec_id = cand.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos_sim,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cos_sim DESC, vec_id ASC) AS rnk
       |  FROM scored)
       |SELECT query_id, vec_id, cos_sim, CAST(rnk AS INTEGER) AS rnk
       |FROM ranked WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin

  /** sim3_lsh_ann: multi-table LSH bucket probe + exact re-rank. */
  def sim3Sql(numQueryVecs: Int = 5, k: Int = 3,
              numTables: Int = 8, planesPerTable: Int = 4,
              dim: Int = 64): String =
    s"""WITH ${normsCte(dim)},
       |${lshBucketsCte(numTables, planesPerTable, dim)},
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS vec_id
       |  FROM buckets q JOIN buckets c
       |    ON q.tbl = c.tbl AND q.bucket = c.bucket
       |   AND c.vec_id <> q.vec_id
       |  WHERE q.vec_id < $numQueryVecs),
       |${rerankTail(k, dim)}""".stripMargin

  /** sim15_lsh_filtered: sim3's bucket probe with the label keep-set
    * gating candidates before the exact re-rank.
    */
  def sim15Sql(labelValue: Int = 7, numQueryVecs: Int = 5, k: Int = 3,
               numTables: Int = 8, planesPerTable: Int = 4,
               dim: Int = 64): String =
    s"""WITH ${normsCte(dim)},
       |${lshBucketsCte(numTables, planesPerTable, dim)},
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS vec_id
       |  FROM buckets q JOIN buckets c
       |    ON q.tbl = c.tbl AND q.bucket = c.bucket
       |   AND c.vec_id <> q.vec_id
       |  JOIN embeddings ce ON ce.vec_id = c.vec_id
       |    AND ce.label = $labelValue
       |  WHERE q.vec_id < $numQueryVecs),
       |${rerankTail(k, dim)}""".stripMargin

  /** Lloyd-training CTE chain: cent0 = the first k corpus vectors,
    * then `iters` unrolled M-steps (cent1..cent$iters), each the
    * exact twin of sources.VectorIndex.lloydCentroids' driver loop —
    * argmax-dot assignment with ties to the LARGER cid, per-dim AVG
    * snapped to REAL on the 1e-6 grid via floor(avg·1e6 + 0.5)/1e6,
    * empty clusters carrying the previous centroid. The grid snap
    * absorbs cross-engine partial-sum ULP drift, so every iteration
    * starts from bit-identical REAL centroids in both engines (the
    * Spark trainer's early stop only fires at an exact fixed point,
    * where further unrolled iterations are no-ops).
    */
  private def lloydCtes(k: Int, iters: Int, dim: Int): String = {
    val head =
      s"""ldims AS (SELECT unnest(generate_series(1, $dim)) AS dim),
         |cent0 AS (SELECT vec_id AS cid, embedding AS cemb
         |          FROM embeddings WHERE vec_id < $k)""".stripMargin
    // Every cent$t is referenced TWICE (next scores + next carry-over
    // coalesce); MATERIALIZED stops DuckDB from inlining the chain,
    // which would otherwise expand the plan 2^iters-fold.
    val steps = (1 to iters).map { t =>
      s"""lsc$t AS MATERIALIZED (
         |  SELECT e.vec_id, c.cid,
         |    ${pairDot("e.embedding", "c.cemb", dim)} AS score
         |  FROM embeddings e CROSS JOIN cent${t - 1} c),
         |lasg$t AS MATERIALIZED (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id
         |                         ORDER BY score DESC, cid DESC) AS rn
         |    FROM lsc$t) t WHERE rn = 1),
         |lavg$t AS MATERIALIZED (
         |  SELECT a.cid, g.dim,
         |    CAST(floor(avg(CAST(e.embedding[g.dim] AS DOUBLE))
         |               * 1000000.0 + 0.5) / 1000000.0 AS REAL) AS val,
         |    count(*) AS n
         |  FROM lasg$t a JOIN embeddings e ON e.vec_id = a.vec_id
         |  CROSS JOIN ldims g
         |  GROUP BY a.cid, g.dim),
         |cent$t AS MATERIALIZED (
         |  SELECT c.cid,
         |    list(coalesce(av.val, c.cemb[g.dim]) ORDER BY g.dim) AS cemb
         |  FROM cent${t - 1} c CROSS JOIN ldims g
         |  LEFT JOIN lavg$t av ON av.cid = c.cid AND av.dim = g.dim
         |  GROUP BY c.cid)""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  /** scores/cells/probes CTEs for IVF: LLOYD-TRAINED centroids
    * (cent$iters of [[lloydCtes]] — the twin of the persisted
    * VectorIndex.lloydCentroids/ivfIndex build); argmax ties to the
    * LARGER cid (Spark's array_max over (score, cid) structs).
    */
  private def ivfCtes(numQueryVecs: Int, numCells: Int, nProbe: Int,
                      dim: Int,
                      iters: Int = graft.operators.Similarity.IvfLloydIters): String =
    s"""${lloydCtes(numCells, iters, dim)},
       |scores AS (
       |  SELECT e.vec_id, c.cid,
       |    ${pairDot("e.embedding", "c.cemb", dim)} AS score
       |  FROM embeddings e CROSS JOIN cent$iters c),
       |cells AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id
       |                         ORDER BY score DESC, cid DESC) AS rn
       |    FROM scores) t WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, cid AS probe_cell FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id
       |                         ORDER BY score DESC, cid DESC) AS rn
       |    FROM scores WHERE vec_id < $numQueryVecs) t
       |  WHERE rn <= $nProbe)""".stripMargin

  /** sim4_ivf_ann: IVF cell probe + exact re-rank. `iters` must be
    * Similarity.IvfLloydIters — SparkEntry passes it through so the
    * Spark index and the oracle replay can never train differently.
    */
  def sim4Sql(numQueryVecs: Int = 5, k: Int = 3,
              numCells: Int = 16, nProbe: Int = 2,
              dim: Int = 64,
              iters: Int = graft.operators.Similarity.IvfLloydIters): String =
    s"""WITH ${normsCte(dim)},
       |${ivfCtes(numQueryVecs, numCells, nProbe, dim, iters)},
       |cand AS (
       |  SELECT DISTINCT p.query_id, cl.vec_id
       |  FROM probes p JOIN cells cl ON cl.cell = p.probe_cell
       |  WHERE cl.vec_id <> p.query_id),
       |${rerankTail(k, dim)}""".stripMargin

  /** dd15_semantic_dedup: within-cell pairwise cosine over the
    * Lloyd-trained IVF cells — SemDeDup's cluster-bounded pair mining,
    * replayed exactly (training chain + assignment + explicit dots).
    */
  def dd15Sql(threshold: Double = 0.3,
              numCells: Int = 16, dim: Int = 64,
              iters: Int = graft.operators.Similarity.IvfLloydIters): String =
    s"""WITH ${normsCte(dim)},
       |${lloydCtes(numCells, iters, dim)},
       |scores AS (
       |  SELECT e.vec_id, c.cid,
       |    ${pairDot("e.embedding", "c.cemb", dim)} AS score
       |  FROM embeddings e CROSS JOIN cent$iters c),
       |cells AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id
       |                         ORDER BY score DESC, cid DESC) AS rn
       |    FROM scores) t WHERE rn = 1),
       |pairs AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM cells a JOIN cells b
       |    ON a.cell = b.cell AND a.vec_id < b.vec_id),
       |scored AS (
       |  SELECT p.id_a, p.id_b,
       |    (${pairDot("ea.embedding", "eb.embedding", dim)})
       |      / (na.nrm * nb.nrm) AS cs
       |  FROM pairs p
       |  JOIN embeddings ea ON ea.vec_id = p.id_a
       |  JOIN embeddings eb ON eb.vec_id = p.id_b
       |  JOIN norms na ON na.vec_id = p.id_a
       |  JOIN norms nb ON nb.vec_id = p.id_b)
       |SELECT id_a, id_b, round(cs, 4) AS cos_sim FROM scored
       |WHERE cs >= $threshold ORDER BY id_a, id_b""".stripMargin

  /** dd20_contamination_tiers: all three leakage legs replayed — the
    * dd9 gram-overlap join, dd3's banded-candidate + exact-Jaccard
    * verify, and dd15's Lloyd-trained cell-bounded cosine — fused into
    * the per-eval-doc tier report with the same worst-hit CASE.
    */
  def dd20Sql(evalMod: Long = 97L, minShared: Int = 5,
              nearThreshold: Double = 0.5, semThreshold: Double = 0.3,
              numCells: Int = 16, dim: Int = 64,
              numHashes: Int = 64, bands: Int = 16,
              iters: Int = graft.operators.Similarity.IvfLloydIters): String =
    s"""WITH $gramCtes,
       |${lshCandCtes(numHashes, bands)},
       |$lshVerifyCtes,
       |j AS (SELECT doc_a, doc_b, CAST(s AS DOUBLE) / (ca.n + cb.n - s) AS jac
       |      FROM shared JOIN cnt ca ON ca.doc_id = doc_a
       |                  JOIN cnt cb ON cb.doc_id = doc_b),
       |nnear AS (
       |  SELECT CASE WHEN doc_a % $evalMod = 0 THEN doc_a ELSE doc_b END
       |      AS eval_doc,
       |    CAST(count(*) AS BIGINT) AS n_near
       |  FROM j
       |  WHERE jac >= $nearThreshold
       |    AND (doc_a % $evalMod = 0) <> (doc_b % $evalMod = 0)
       |  GROUP BY 1),
       |evg AS (SELECT doc_id AS eval_doc, h FROM gh
       |  WHERE doc_id % $evalMod = 0),
       |trg AS (SELECT doc_id AS train_doc, h FROM gh
       |  WHERE doc_id % $evalMod <> 0),
       |exd AS (SELECT e.eval_doc, t.train_doc FROM trg t
       |  JOIN evg e ON t.h = e.h
       |  GROUP BY 1, 2 HAVING count(*) >= $minShared),
       |nex AS (SELECT eval_doc, CAST(count(*) AS BIGINT) AS n_exact
       |  FROM exd GROUP BY 1),
       |${normsCte(dim)},
       |${lloydCtes(numCells, iters, dim)},
       |scores AS (
       |  SELECT e.vec_id, c.cid,
       |    ${pairDot("e.embedding", "c.cemb", dim)} AS score
       |  FROM embeddings e CROSS JOIN cent$iters c),
       |cells AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id
       |                         ORDER BY score DESC, cid DESC) AS rn
       |    FROM scores) t WHERE rn = 1),
       |vpairs AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM cells a JOIN cells b
       |    ON a.cell = b.cell AND a.vec_id < b.vec_id),
       |vscored AS (
       |  SELECT p.id_a, p.id_b,
       |    (${pairDot("ea.embedding", "eb.embedding", dim)})
       |      / (na.nrm * nb.nrm) AS cs
       |  FROM vpairs p
       |  JOIN embeddings ea ON ea.vec_id = p.id_a
       |  JOIN embeddings eb ON eb.vec_id = p.id_b
       |  JOIN norms na ON na.vec_id = p.id_a
       |  JOIN norms nb ON nb.vec_id = p.id_b),
       |nsem AS (
       |  SELECT CASE WHEN id_a % $evalMod = 0 THEN id_a ELSE id_b END
       |      AS eval_doc,
       |    CAST(count(*) AS BIGINT) AS n_sem
       |  FROM vscored
       |  WHERE cs >= $semThreshold
       |    AND (id_a % $evalMod = 0) <> (id_b % $evalMod = 0)
       |  GROUP BY 1)
       |SELECT COALESCE(nex.eval_doc, nnear.eval_doc, nsem.eval_doc)
       |    AS eval_doc,
       |  COALESCE(n_exact, CAST(0 AS BIGINT)) AS n_exact,
       |  COALESCE(n_near, CAST(0 AS BIGINT)) AS n_near,
       |  COALESCE(n_sem, CAST(0 AS BIGINT)) AS n_sem,
       |  CASE WHEN COALESCE(n_near, 0) > 0 THEN 3
       |       WHEN COALESCE(n_exact, 0) > 0 THEN 2
       |       WHEN COALESCE(n_sem, 0) > 0 THEN 1 ELSE 0 END AS tier
       |FROM nex
       |FULL OUTER JOIN nnear ON nex.eval_doc = nnear.eval_doc
       |FULL OUTER JOIN nsem
       |  ON COALESCE(nex.eval_doc, nnear.eval_doc) = nsem.eval_doc
       |ORDER BY eval_doc""".stripMargin

  /** tx17_bpe_merges: the BPE training loop unrolled as CTE blocks —
    * per round, adjacent-pair counts over the delimited symbol strings
    * (|sym| framing, see TextAnalysis.bpeMerges), argmax with
    * (count DESC, pair ASC) tie-break, then a plain replace() merge
    * (same left-to-right non-overlap semantics in both engines). Pair
    * extraction indexes the symbol list against a bounded series —
    * words here are ≤ 64 symbols; a longer corpus raises the bound.
    */
  /** tx20's oracle: replay tx17's training rounds, then ENCODE — the
    * final vocabulary's symbols, weighted by word frequency, ranked.
    */
  def tx20Sql(merges: Int = 10, topK: Int = 30): String =
    s"""WITH words_0 AS (
       |  SELECT regexp_replace(w, '(.)', '|\\1|', 'g') AS wstr,
       |    CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) > 0
       |  GROUP BY 1),
       |${bpeRounds(merges)}
       |SELECT token, CAST(sum(freq) AS BIGINT) AS n FROM (
       |  SELECT unnest(string_split(substr(wstr, 2, length(wstr) - 2), '||'))
       |    AS token, freq
       |  FROM words_$merges)
       |GROUP BY token ORDER BY n DESC, token ASC LIMIT $topK""".stripMargin

  private def bpeRounds(merges: Int): String =
    (0 until merges).map { i =>
      s"""sy_$i AS (
         |  SELECT freq,
         |    string_split(substr(wstr, 2, length(wstr) - 2), '||') AS sy
         |  FROM words_$i),
         |pc_$i AS (
         |  SELECT sy[g.j] AS a, sy[g.j + 1] AS b, sum(freq) AS cnt
         |  FROM sy_$i, (SELECT unnest(generate_series(1, 64)) AS j) g
         |  WHERE g.j <= len(sy) - 1
         |  GROUP BY 1, 2),
         |best_$i AS (
         |  SELECT a, b, cnt FROM pc_$i
         |  ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
         |words_${i + 1} AS (
         |  SELECT replace(w.wstr, '|' || bb.a || '||' || bb.b || '|',
         |                 '|' || bb.a || bb.b || '|') AS wstr, w.freq
         |  FROM words_$i w CROSS JOIN best_$i bb)""".stripMargin
    }.mkString(",\n")

  def tx17Sql(merges: Int = 10): String = {
    val rounds = bpeRounds(merges)
    val out = (0 until merges).map { i =>
      s"""SELECT $i AS step, a AS sym_a, b AS sym_b,
         |  CAST(cnt AS BIGINT) AS pair_count, a || b AS merged
         |FROM best_$i""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH words_0 AS (
       |  SELECT regexp_replace(w, '(.)', '|\\1|', 'g') AS wstr,
       |    CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) > 0
       |  GROUP BY 1),
       |$rounds
       |$out
       |ORDER BY step""".stripMargin
  }

  /** The boundary hash of plans.CdcBoundaries as an explicit w-term
    * sum of products — Σ ascii(text[pos+i]) · B^{w-1-i}, every term
    * under 2^43 so plain BIGINT arithmetic replays the rolling loop's
    * value exactly (the outer mod M is applied once at the call site,
    * matching the loop's running reduction).
    */
  private def rollingPoly(window: Int): String =
    (0 until window).map { i =>
      s"CAST(ascii(substr(text, g.pos + $i, 1)) AS BIGINT)" +
        s" * ${graft.plans.CdcBoundaries.pow(window - 1 - i)}"
    }.mkString("\n       + ")

  /** tx18_cdc_shared: content-defined chunking replay — boundary
    * positions where the CdcBoundaries rolling polynomial of the
    * w-char window ≡ 0 (mod divisor), chunks from the per-doc lead()
    * window, h60 chunk fingerprints, shared-chunk rollup.
    *
    * Replay assumptions, GUARDED in the SQL itself: CdcBoundaries
    * hashes UTF-8 BYTES while this replay reads CHARACTERS via
    * ascii()/substr, and the position series is bounded at 1024 — the
    * two agree exactly iff the corpus is ASCII-only (char == byte) and
    * every document is ≤ 1024 chars. This corpus family satisfies both
    * (≤ 600-char ASCII documents); if a corpus change ever broke
    * either, the guard CTE raises a DuckDB error() naming the cause,
    * so the correctness gate fails LOUDLY instead of producing a
    * silently-divergent oracle. (Non-ASCII detection: any multi-byte
    * codepoint makes length(text) <> strlen(text).)
    */
  def tx18Sql(window: Int = 16, divisor: Int = 64, topK: Int = 25): String =
    s"""WITH guard AS (
       |  SELECT CASE WHEN max(strlen(text)) > 1024 THEN
       |      error('tx18 oracle: document over 1024 chars; raise the position bound')
       |    WHEN sum(CASE WHEN length(text) <> strlen(text) THEN 1
       |             ELSE 0 END) > 0 THEN
       |      error('tx18 oracle: non-ASCII corpus; char-based replay diverges from the byte hash')
       |    ELSE 0 END AS chk
       |  FROM documents),
       |bounds AS (
       |  SELECT doc_id, g.pos FROM documents,
       |    (SELECT unnest(generate_series(2, 1024)) AS pos) g, guard
       |  WHERE length(text) >= ${window + 1}
       |    AND g.pos <= length(text) - ${window - 1}
       |    AND guard.chk = 0
       |    AND (${rollingPoly(window)})
       |        % ${graft.plans.CdcBoundaries.M} % $divisor = 0),
       |starts AS (
       |  SELECT doc_id, 1 AS pos FROM documents
       |  UNION ALL SELECT doc_id, pos FROM bounds),
       |spans AS (
       |  SELECT doc_id, pos,
       |    lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS next
       |  FROM starts),
       |ch AS (
       |  SELECT s.doc_id,
       |    coalesce(s.next, length(d.text) + 1) - s.pos AS clen,
       |    ${h60("substr(d.text, s.pos, coalesce(s.next, length(d.text) + 1) - s.pos)")} AS fp
       |  FROM spans s JOIN documents d ON d.doc_id = s.doc_id)
       |SELECT fp, CAST(clen AS BIGINT) AS clen,
       |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  CAST(count(*) AS BIGINT) AS n_occurrences
       |FROM ch GROUP BY fp, clen
       |HAVING count(DISTINCT doc_id) >= 2 AND clen >= $window
       |ORDER BY n_docs DESC, clen DESC, fp ASC LIMIT $topK""".stripMargin

  /** sim9_ivf_knn_join: every vector's top-k within-cell neighbors —
    * dd15's candidate chain with the threshold replaced by a per-vector
    * (cs DESC, id ASC) rank, both pair orientations.
    */
  def sim9Sql(k: Int = 3, numCells: Int = 16, dim: Int = 64,
              iters: Int = graft.operators.Similarity.IvfLloydIters): String =
    s"""WITH ${normsCte(dim)},
       |${lloydCtes(numCells, iters, dim)},
       |scores AS (
       |  SELECT e.vec_id, c.cid,
       |    ${pairDot("e.embedding", "c.cemb", dim)} AS score
       |  FROM embeddings e CROSS JOIN cent$iters c),
       |cells AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id
       |                         ORDER BY score DESC, cid DESC) AS rn
       |    FROM scores) t WHERE rn = 1),
       |pairs AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM cells a JOIN cells b
       |    ON a.cell = b.cell AND a.vec_id <> b.vec_id),
       |scored AS (
       |  SELECT p.id_a, p.id_b,
       |    (${pairDot("ea.embedding", "eb.embedding", dim)})
       |      / (na.nrm * nb.nrm) AS cs
       |  FROM pairs p
       |  JOIN embeddings ea ON ea.vec_id = p.id_a
       |  JOIN embeddings eb ON eb.vec_id = p.id_b
       |  JOIN norms na ON na.vec_id = p.id_a
       |  JOIN norms nb ON nb.vec_id = p.id_b),
       |ranked AS (
       |  SELECT id_a, id_b, cs,
       |    row_number() OVER (PARTITION BY id_a
       |                       ORDER BY cs DESC, id_b ASC) AS rnk
       |  FROM scored)
       |SELECT id_a AS vec_id, id_b AS nbr_id, round(cs, 4) AS cos_sim,
       |  CAST(rnk AS INTEGER) AS rnk
       |FROM ranked WHERE rnk <= $k ORDER BY vec_id, rnk""".stripMargin

  /** km3_lloyd_converged: iterations 1..iters-1 from [[lloydCtes]],
    * then the FINAL E/M step reported per (cluster, dim) — member
    * count, updated centroid, grid-rounded shift vs the previous
    * iterate, and the float fixed-point flag. Twin of
    * Similarity.lloydConvergence.
    */
  def km3Sql(k: Int = graft.operators.Similarity.Km3K,
             iters: Int = graft.operators.Similarity.Km3Iters,
             dim: Int = 64): String = {
    val p = iters - 1
    val cNew = s"coalesce(CAST(sa.val AS REAL), c.cemb[g.dim])"
    s"""WITH ${lloydCtes(k, p, dim)},
       |fsc AS (
       |  SELECT e.vec_id, c.cid,
       |    ${pairDot("e.embedding", "c.cemb", dim)} AS score
       |  FROM embeddings e CROSS JOIN cent$p c),
       |fasg AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id
       |                         ORDER BY score DESC, cid DESC) AS rn
       |    FROM fsc) t WHERE rn = 1),
       |favg AS (
       |  SELECT a.cid, g.dim,
       |    floor(avg(CAST(e.embedding[g.dim] AS DOUBLE))
       |          * 1000000.0 + 0.5) / 1000000.0 AS val,
       |    count(*) AS n
       |  FROM fasg a JOIN embeddings e ON e.vec_id = a.vec_id
       |  CROSS JOIN ldims g
       |  GROUP BY a.cid, g.dim)
       |SELECT CAST(c.cid AS INTEGER) AS cluster,
       |  CAST(g.dim AS INTEGER) AS dim,
       |  CAST(coalesce(sa.n, 0) AS BIGINT) AS n_members,
       |  $cNew AS centroid,
       |  floor(abs(CAST($cNew AS DOUBLE) - CAST(c.cemb[g.dim] AS DOUBLE))
       |        * 1000000.0 + 0.5) / 1000000.0 AS shift,
       |  ($cNew = c.cemb[g.dim]) AS dim_converged
       |FROM cent$p c CROSS JOIN ldims g
       |LEFT JOIN favg sa ON sa.cid = c.cid AND sa.dim = g.dim
       |ORDER BY cluster, dim""".stripMargin
  }

  /** sim8_ann_recall: brute-force top-k truth (UNROUNDED ordering,
    * FloatVecDot-exact) vs the sim3/sim4 result sets — n_truth,
    * n_hits, recall per method.
    */
  def sim8Sql(numQueryVecs: Int = 5, k: Int = 3,
              numTables: Int = 8, planesPerTable: Int = 4,
              numCells: Int = 16, nProbe: Int = 2,
              dim: Int = 64): String = {
    def resCte(name: String, candCte: String): String =
      s"""$candCte,
         |${name}_scored AS (
         |  SELECT cand_$name.query_id, cand_$name.vec_id,
         |    round((${pairDot("e.embedding", "qe.embedding", dim)})
         |          / (ne.nrm * nq.nrm), 4) AS cos_sim
         |  FROM cand_$name
         |  JOIN embeddings e  ON e.vec_id = cand_$name.vec_id
         |  JOIN embeddings qe ON qe.vec_id = cand_$name.query_id
         |  JOIN norms ne ON ne.vec_id = cand_$name.vec_id
         |  JOIN norms nq ON nq.vec_id = cand_$name.query_id),
         |${name}_res AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY cos_sim DESC, vec_id ASC) AS rnk
         |    FROM ${name}_scored) t WHERE rnk <= $k)""".stripMargin
    val lshCand =
      s"""cand_lsh AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS vec_id
         |  FROM buckets q JOIN buckets c
         |    ON q.tbl = c.tbl AND q.bucket = c.bucket
         |   AND c.vec_id <> q.vec_id
         |  WHERE q.vec_id < $numQueryVecs)""".stripMargin
    val ivfCand =
      s"""cand_ivf AS (
         |  SELECT DISTINCT p.query_id, cl.vec_id
         |  FROM probes p JOIN cells cl ON cl.cell = p.probe_cell
         |  WHERE cl.vec_id <> p.query_id)""".stripMargin
    s"""WITH ${normsCte(dim)},
       |${lshBucketsCte(numTables, planesPerTable, dim)},
       |${ivfCtes(numQueryVecs, numCells, nProbe, dim)},
       |truth AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id
       |                         ORDER BY cs DESC, vec_id ASC) AS rnk
       |    FROM (
       |      SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
       |        (${pairDot("e.embedding", "q.embedding", dim)})
       |          / (ne.nrm * nq.nrm) AS cs
       |      FROM embeddings e
       |      JOIN norms ne ON ne.vec_id = e.vec_id
       |      CROSS JOIN (SELECT vec_id, embedding FROM embeddings
       |                  WHERE vec_id < $numQueryVecs) q
       |      JOIN norms nq ON nq.vec_id = q.vec_id
       |      WHERE e.vec_id <> q.vec_id) s) r
       |  WHERE rnk <= $k),
       |${resCte("ivf", ivfCand)},
       |${resCte("lsh", lshCand)}
       |SELECT method, n_truth, n_hits,
       |  round(CAST(n_hits AS DOUBLE) / n_truth, 4) AS recall
       |FROM (
       |  SELECT 'ivf' AS method,
       |    (SELECT count(*) FROM truth) AS n_truth,
       |    (SELECT count(*) FROM truth t
       |     JOIN ivf_res a ON t.query_id = a.query_id
       |                   AND t.vec_id = a.vec_id) AS n_hits
       |  UNION ALL
       |  SELECT 'lsh' AS method,
       |    (SELECT count(*) FROM truth) AS n_truth,
       |    (SELECT count(*) FROM truth t
       |     JOIN lsh_res a ON t.query_id = a.query_id
       |                   AND t.vec_id = a.vec_id) AS n_hits) x
       |ORDER BY method""".stripMargin
  }

  /** a28_equidepth_hist: quantile boundaries + comparison-sum bucket
    * assignment — the same Scala-printed probability literals the
    * Spark operator embeds.
    */
  def a28Sql(buckets: Int = 8): String = {
    val ps = (1 until buckets).map(i => i.toDouble / buckets)
    val caseTerms = (1 until buckets).map(i =>
      s"(CASE WHEN o_totalprice > bs[$i] THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH b AS (SELECT quantile_cont(o_totalprice, [${ps.mkString(", ")}]) AS bs
       |           FROM orders)
       |SELECT bucket, count(*) AS n, min(o_totalprice) AS min_price,
       |  max(o_totalprice) AS max_price,
       |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
       |    AS sum_price
       |FROM (SELECT o_totalprice, CAST($caseTerms + 1 AS INTEGER) AS bucket
       |      FROM orders, b) t
       |GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  /** w14_ewma: truncated-EWMA unrolled with the exact coefficient
    * literals the Spark window folds in (α·(1−α)^j, Double.toString).
    */
  def w14Sql(alpha: Double = 0.3, span: Int = 20): String = {
    val terms = (0 until span).map { j =>
      val coef = alpha * math.pow(1 - alpha, j)
      val x = if (j == 0) "day_sales"
              else s"coalesce(lag(day_sales, $j) OVER w, 0.0)"
      s"$x * $coef"
    }.mkString(" + ")
    s"""WITH daily AS (
       |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
       |         round(sum(o_totalprice), 2) AS day_sales
       |  FROM orders GROUP BY 1)
       |SELECT day, day_sales, round($terms, 4) AS ewma$span
       |FROM daily
       |WINDOW w AS (ORDER BY day)
       |ORDER BY day""".stripMargin
  }

  /** dd4_simhash: 60-bit SimHash signatures, 4×15-bit pigeonhole
    * chunks, hamming-verified pairs — the full chain replayed.
    */
  def dd4Sql(maxHamming: Int = 3, bits: Int = 60): String = {
    val bal = (0 until bits).map(b =>
      s"  sum(CASE WHEN (h // ${1L << b}) % 2 = 1 THEN cnt ELSE -cnt END) AS b$b")
      .mkString(",\n")
    val sig = (0 until bits).map(b =>
      s"(CASE WHEN b$b >= 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
    val chunks = (0 until 4).map(c =>
      s"      {'c': $c, 'chunk': (sig // ${1L << (15 * c)}) % 32768}")
      .mkString(",\n")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
       |th AS (SELECT doc_id, ${h60("t")} AS h, count(*) AS cnt
       |       FROM tok GROUP BY 1, 2),
       |bal AS (SELECT doc_id,
       |$bal
       |  FROM th GROUP BY doc_id),
       |sg AS (SELECT doc_id, $sig AS sig FROM bal),
       |chunked AS (
       |  SELECT doc_id, sig, u.c AS c, u.chunk AS chunk FROM (
       |    SELECT doc_id, sig, unnest([
       |$chunks
       |    ]) AS u FROM sg) t)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
       |FROM chunked a JOIN chunked b
       |  ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sig, b.sig)) <= $maxHamming
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** pairDot over a SUB-slice: left side indexed lo+1..lo+len (the
    * full embedding), right side 1..len (a subspace codebook entry) —
    * the replay of FloatVecDot over `slice(embedding, lo+1, len)`.
    */
  private def pairDotOff(a: String, b: String, lo: Int, len: Int): String =
    (1 to len).map(i =>
      s"CAST($a[${lo + i}] AS DOUBLE) * CAST($b[$i] AS DOUBLE)").mkString(" + ")

  /** One product-quantizer subspace Lloyd chain (the slice-bounded
    * twin of [[lloydCtes]] — same seed rule, argmax-dot assignment
    * with ties to the larger cid, 1e-6 grid snap, empty-cluster
    * carry-over), CTEs prefixed `$p` so [[sim12Sql]] can unroll PqM
    * independent chains in one WITH.
    */
  private def subLloydCtes(p: String, k: Int, iters: Int,
                           lo: Int, len: Int): String = {
    val head =
      s"""${p}dims AS (SELECT unnest(generate_series(1, $len)) AS dim),
         |${p}cent0 AS (SELECT vec_id AS cid,
         |    embedding[${lo + 1}:${lo + len}] AS cemb
         |  FROM embeddings WHERE vec_id < $k)""".stripMargin
    val steps = (1 to iters).map { t =>
      s"""${p}lsc$t AS MATERIALIZED (
         |  SELECT e.vec_id, c.cid,
         |    ${pairDotOff("e.embedding", "c.cemb", lo, len)} AS score
         |  FROM embeddings e CROSS JOIN ${p}cent${t - 1} c),
         |${p}lasg$t AS MATERIALIZED (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id
         |                         ORDER BY score DESC, cid DESC) AS rn
         |    FROM ${p}lsc$t) t WHERE rn = 1),
         |${p}lavg$t AS MATERIALIZED (
         |  SELECT a.cid, g.dim,
         |    CAST(floor(avg(CAST(e.embedding[g.dim + $lo] AS DOUBLE))
         |               * 1000000.0 + 0.5) / 1000000.0 AS REAL) AS val,
         |    count(*) AS n
         |  FROM ${p}lasg$t a JOIN embeddings e ON e.vec_id = a.vec_id
         |  CROSS JOIN ${p}dims g
         |  GROUP BY a.cid, g.dim),
         |${p}cent$t AS MATERIALIZED (
         |  SELECT c.cid,
         |    list(coalesce(av.val, c.cemb[g.dim]) ORDER BY g.dim) AS cemb
         |  FROM ${p}cent${t - 1} c CROSS JOIN ${p}dims g
         |  LEFT JOIN ${p}lavg$t av ON av.cid = c.cid AND av.dim = g.dim
         |  GROUP BY c.cid)""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  /** The PqM independent subspace chains of [[subLloydCtes]]. */
  private def pqChains(mSub: Int, kk: Int, iters: Int, subDim: Int): String =
    (0 until mSub).map(m =>
      subLloydCtes(s"p${m}_", kk, iters, m * subDim, subDim)).mkString(",\n")

  /** Per-subspace encode CTEs (argmax-dot against the trained chain,
    * ties to the larger cid — Vectors.nearestCellByDot) + the unioned
    * (vec_id, m, code) relation, the replay of VectorIndex.pqIndex.
    * `whereSql` bounds the encoded set ("" = whole corpus).
    */
  private def pqCodesCtes(mSub: Int, iters: Int, subDim: Int,
                          whereSql: String): String = {
    val perSub = (0 until mSub).map { m =>
      s"""p${m}_code AS MATERIALIZED (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        ${pairDotOff("e.embedding", "c.cemb", m * subDim, subDim)}
         |          DESC, c.cid DESC) AS rn
         |    FROM embeddings e CROSS JOIN p${m}_cent$iters c
         |    $whereSql) t WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val union = (0 until mSub).map(m =>
      s"SELECT vec_id, $m AS m, cid AS code FROM p${m}_code")
      .mkString("\n  UNION ALL ")
    s"""$perSub,
       |codes AS MATERIALIZED (
       |  $union)""".stripMargin
  }

  /** The query-side (q_id, m, cid, dotv) distance LUT. */
  private def pqLutCte(mSub: Int, iters: Int, subDim: Int,
                       numQueryVecs: Int): String = {
    val union = (0 until mSub).map(m =>
      s"""SELECT q.vec_id AS q_id, $m AS m, c.cid,
         |    ${pairDotOff("q.embedding", "c.cemb", m * subDim, subDim)} AS dotv
         |  FROM embeddings q CROSS JOIN p${m}_cent$iters c
         |  WHERE q.vec_id < $numQueryVecs""".stripMargin)
      .mkString("\n  UNION ALL ")
    s"""lut AS MATERIALIZED (
       |  $union)""".stripMargin
  }

  private def pqSumCols(mSub: Int): String =
    (0 until mSub).map(m =>
      s"sum(CASE WHEN l.m = $m THEN l.dotv END) AS s$m").mkString(",\n    ")

  private def pqSumExpr(mSub: Int): String =
    (0 until mSub).map(m => s"s$m").mkString(" + ")

  /** SIM12 replay: PqM subspace Lloyd chains → corpus codes → query
    * LUT → pivoted ADC sum (fixed s0+s1+s2+s3 association, matching
    * Similarity.pqAdcTopK) → per-query top-k with the exact-dot flag.
    */
  def sim12Sql(numQueryVecs: Int = 5, k: Int = 3,
               mSub: Int = graft.operators.Similarity.PqM,
               kk: Int = graft.operators.Similarity.PqK,
               iters: Int = graft.operators.Similarity.PqIters,
               subDim: Int = graft.operators.Similarity.PqSubDim,
               dim: Int = 64): String = {
    val chains = pqChains(mSub, kk, iters, subDim)
    val codeCtes = pqCodesCtes(mSub, iters, subDim,
      s"WHERE e.vec_id >= $numQueryVecs")
    val lutCte = pqLutCte(mSub, iters, subDim, numQueryVecs)
    val sCols = pqSumCols(mSub)
    val sSum = pqSumExpr(mSub)
    s"""WITH $chains,
       |$codeCtes,
       |$lutCte,
       |adc AS (
       |  SELECT l.q_id, c.vec_id,
       |    $sCols
       |  FROM codes c JOIN lut l ON c.m = l.m AND c.code = l.cid
       |  GROUP BY 1, 2),
       |top AS (
       |  SELECT q_id, vec_id, $sSum AS adcv,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY $sSum DESC, vec_id ASC) AS rk
       |  FROM adc),
       |ex AS (
       |  SELECT q.vec_id AS q_id, e.vec_id,
       |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |      ${pairDot("q.embedding", "e.embedding", dim)} DESC,
       |      e.vec_id ASC) AS xrk
       |  FROM embeddings q CROSS JOIN embeddings e
       |  WHERE q.vec_id < $numQueryVecs AND e.vec_id >= $numQueryVecs)
       |SELECT t.q_id, t.vec_id, CAST(t.rk AS INTEGER) AS rk,
       |  round(t.adcv, 6) AS adc,
       |  CASE WHEN x.vec_id IS NOT NULL THEN 1 ELSE 0 END AS in_exact
       |FROM top t LEFT JOIN (SELECT q_id, vec_id FROM ex WHERE xrk <= $k) x
       |  ON t.q_id = x.q_id AND t.vec_id = x.vec_id
       |WHERE t.rk <= $k
       |ORDER BY t.q_id, t.rk""".stripMargin
  }

  /** SIM16 replay: sim12's chains/codes/LUT score the whole indexed
    * corpus, the top-`shortlist` ADC ranks per query join back to raw
    * embeddings, and the exact left-assoc dot reranks to top-k —
    * identical to Similarity.pqRefineTopK including the `reordered`
    * rank-change flag.
    */
  def sim16Sql(numQueryVecs: Int = 5, k: Int = 3, shortlist: Int = 12,
               mSub: Int = graft.operators.Similarity.PqM,
               kk: Int = graft.operators.Similarity.PqK,
               iters: Int = graft.operators.Similarity.PqIters,
               subDim: Int = graft.operators.Similarity.PqSubDim,
               dim: Int = 64): String = {
    val chains = pqChains(mSub, kk, iters, subDim)
    val codeCtes = pqCodesCtes(mSub, iters, subDim,
      s"WHERE e.vec_id >= $numQueryVecs")
    val lutCte = pqLutCte(mSub, iters, subDim, numQueryVecs)
    val sCols = pqSumCols(mSub)
    val sSum = pqSumExpr(mSub)
    s"""WITH $chains,
       |$codeCtes,
       |$lutCte,
       |adc AS (
       |  SELECT l.q_id, c.vec_id,
       |    $sCols
       |  FROM codes c JOIN lut l ON c.m = l.m AND c.code = l.cid
       |  GROUP BY 1, 2),
       |short AS (
       |  SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY $sSum DESC, vec_id ASC) AS srk
       |  FROM adc),
       |rr AS (
       |  SELECT t.q_id, t.vec_id, t.srk,
       |    ${pairDot("q.embedding", "e.embedding", dim)} AS xdot
       |  FROM short t
       |  JOIN embeddings e ON e.vec_id = t.vec_id
       |  JOIN embeddings q ON q.vec_id = t.q_id
       |  WHERE t.srk <= $shortlist),
       |rr2 AS (
       |  SELECT q_id, vec_id, srk, xdot,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY xdot DESC, vec_id ASC) AS rk
       |  FROM rr)
       |SELECT q_id, vec_id, CAST(rk AS INTEGER) AS rk,
       |  CAST(srk AS INTEGER) AS srk, round(xdot, 6) AS dot,
       |  rk <> srk AS reordered
       |FROM rr2 WHERE rk <= $k ORDER BY q_id, rk""".stripMargin
  }

  /** SIM18 replay: one Lloyd chain + assignment, a rank-exposing
    * probe relation sliced per nProbe level, exact re-rank per level,
    * and per-level recall against the shared brute-force truth.
    */
  def sim18Sql(numQueryVecs: Int = 5, k: Int = 3,
               numCells: Int = 16, probes: Seq[Int] = Seq(1, 2, 4),
               dim: Int = 64,
               iters: Int = graft.operators.Similarity.IvfLloydIters): String = {
    val maxP = probes.max
    val pList = probes.mkString(", ")
    s"""WITH ${normsCte(dim)},
       |${lloydCtes(numCells, iters, dim)},
       |scores AS (
       |  SELECT e.vec_id, c.cid,
       |    ${pairDot("e.embedding", "c.cemb", dim)} AS score
       |  FROM embeddings e CROSS JOIN cent$iters c),
       |cells AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id
       |                         ORDER BY score DESC, cid DESC) AS rn
       |    FROM scores) t WHERE rn = 1),
       |pr AS (
       |  SELECT vec_id AS query_id, cid AS probe_cell, rn AS prank FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id
       |                         ORDER BY score DESC, cid DESC) AS rn
       |    FROM scores WHERE vec_id < $numQueryVecs) t
       |  WHERE rn <= $maxP),
       |truth AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id
       |                         ORDER BY cs DESC, vec_id ASC) AS rnk
       |    FROM (
       |      SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
       |        (${pairDot("e.embedding", "q.embedding", dim)})
       |          / (ne.nrm * nq.nrm) AS cs
       |      FROM embeddings e
       |      JOIN norms ne ON ne.vec_id = e.vec_id
       |      CROSS JOIN (SELECT vec_id, embedding FROM embeddings
       |                  WHERE vec_id < $numQueryVecs) q
       |      JOIN norms nq ON nq.vec_id = q.vec_id
       |      WHERE e.vec_id <> q.vec_id) s) r
       |  WHERE rnk <= $k),
       |np AS (SELECT unnest([$pList]) AS n_probe),
       |cand AS (
       |  SELECT np.n_probe, p.query_id, cl.vec_id
       |  FROM np JOIN pr p ON p.prank <= np.n_probe
       |  JOIN cells cl ON cl.cell = p.probe_cell
       |  WHERE cl.vec_id <> p.query_id),
       |scored AS (
       |  SELECT c.n_probe, c.query_id, c.vec_id,
       |    round((${pairDot("e.embedding", "qe.embedding", dim)})
       |          / (ne.nrm * nq.nrm), 4) AS cos_sim
       |  FROM cand c
       |  JOIN embeddings e  ON e.vec_id = c.vec_id
       |  JOIN embeddings qe ON qe.vec_id = c.query_id
       |  JOIN norms ne ON ne.vec_id = c.vec_id
       |  JOIN norms nq ON nq.vec_id = c.query_id),
       |res AS (
       |  SELECT n_probe, query_id, vec_id FROM (
       |    SELECT n_probe, query_id, vec_id,
       |      row_number() OVER (PARTITION BY n_probe, query_id
       |                         ORDER BY cos_sim DESC, vec_id ASC) AS rnk
       |    FROM scored) t WHERE rnk <= $k)
       |SELECT np.n_probe,
       |  (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
       |  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       |  round(CAST(coalesce(h.n_hits, 0) AS DOUBLE)
       |    / (SELECT count(*) FROM truth), 4) AS recall
       |FROM np LEFT JOIN (
       |  SELECT r.n_probe, count(*) AS n_hits
       |  FROM res r JOIN truth t
       |    ON t.query_id = r.query_id AND t.vec_id = r.vec_id
       |  GROUP BY r.n_probe) h ON h.n_probe = np.n_probe
       |ORDER BY np.n_probe""".stripMargin
  }

  /** SIM17 replay: sim12's ADC top-k and the exact-dot top-k, their
    * per-query intersection counted — integer-exact recall@k.
    */
  def sim17Sql(numQueryVecs: Int = 5, k: Int = 10,
               mSub: Int = graft.operators.Similarity.PqM,
               kk: Int = graft.operators.Similarity.PqK,
               iters: Int = graft.operators.Similarity.PqIters,
               subDim: Int = graft.operators.Similarity.PqSubDim,
               dim: Int = 64): String = {
    val chains = pqChains(mSub, kk, iters, subDim)
    val codeCtes = pqCodesCtes(mSub, iters, subDim,
      s"WHERE e.vec_id >= $numQueryVecs")
    val lutCte = pqLutCte(mSub, iters, subDim, numQueryVecs)
    val sCols = pqSumCols(mSub)
    val sSum = pqSumExpr(mSub)
    s"""WITH $chains,
       |$codeCtes,
       |$lutCte,
       |adc AS (
       |  SELECT l.q_id, c.vec_id,
       |    $sCols
       |  FROM codes c JOIN lut l ON c.m = l.m AND c.code = l.cid
       |  GROUP BY 1, 2),
       |top AS (
       |  SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY $sSum DESC, vec_id ASC) AS rk
       |  FROM adc),
       |ex AS (
       |  SELECT q.vec_id AS q_id, e.vec_id,
       |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |      ${pairDot("q.embedding", "e.embedding", dim)} DESC,
       |      e.vec_id ASC) AS xrk
       |  FROM embeddings q CROSS JOIN embeddings e
       |  WHERE q.vec_id < $numQueryVecs AND e.vec_id >= $numQueryVecs),
       |hits AS (
       |  SELECT t.q_id, CAST(count(*) AS BIGINT) AS n_hit
       |  FROM (SELECT q_id, vec_id FROM top WHERE rk <= $k) t
       |  JOIN (SELECT q_id, vec_id FROM ex WHERE xrk <= $k) x
       |    ON t.q_id = x.q_id AND t.vec_id = x.vec_id
       |  GROUP BY t.q_id),
       |qs AS (SELECT vec_id AS q_id FROM embeddings
       |  WHERE vec_id < $numQueryVecs)
       |SELECT qs.q_id, coalesce(n_hit, 0) AS n_hit,
       |  CAST($k AS INTEGER) AS k,
       |  round(CAST(coalesce(n_hit, 0) AS DOUBLE) / $k.0, 4) AS recall
       |FROM qs LEFT JOIN hits ON qs.q_id = hits.q_id
       |ORDER BY qs.q_id""".stripMargin
  }

  /** SIM19 replay: the full-width cosine truth (sim8's convention —
    * candidates are every other vector) versus one prefix-cosine leg
    * per dim, each with prefix dots and prefix norms, recalls unioned
    * per dim.
    */
  def sim19Sql(numQueryVecs: Int = 5, k: Int = 10,
               dims: Seq[Int] = Seq(16, 32, 64), dim: Int = 64): String = {
    // the truth CTE ranks on cs$dim, which only exists as a scored
    // column when dim is one of the scored prefix widths — fail fast
    // instead of emitting SQL that references a nonexistent column
    require(dims.contains(dim),
      s"sim19Sql: truth dim $dim must be one of the scored dims $dims")
    // ONE cross join computes every prefix cosine as a plain column;
    // the per-dim windows then rank small materialized columns. The
    // window-inside-giant-expression form leaked ~0.5 GB of DuckDB
    // buffer reservation PER EXECUTION (duckdb 1.0 accounting bug) —
    // enough to tip a 300+-oracle gate run over the process limit.
    val csCols = dims.map(m =>
      s"""(${pairDot("e.embedding", "q.embedding", m)})
         |      / (sqrt(${pairDot("e.embedding", "e.embedding", m)})
         |         * sqrt(${pairDot("q.embedding", "q.embedding", m)}))
         |      AS cs$m""".stripMargin).mkString(",\n    ")
    def legCte(m: Int): String =
      s"""leg$m AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY cs$m DESC, vec_id ASC) AS rnk
         |    FROM scored) t WHERE rnk <= $k)""".stripMargin
    val unions = dims.map(m =>
      s"""SELECT $m AS dim,
         |    (SELECT count(*) FROM truth) AS n_truth,
         |    (SELECT count(*) FROM truth t JOIN leg$m a
         |       ON t.query_id = a.query_id AND t.vec_id = a.vec_id)
         |      AS n_hits""".stripMargin).mkString("\n  UNION ALL ")
    s"""WITH scored AS MATERIALIZED (
       |  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
       |    $csCols
       |  FROM embeddings e
       |  CROSS JOIN (SELECT vec_id, embedding FROM embeddings
       |              WHERE vec_id < $numQueryVecs) q
       |  WHERE e.vec_id <> q.vec_id),
       |truth AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY cs$dim DESC, vec_id ASC) AS rnk
       |    FROM scored) t WHERE rnk <= $k),
       |${dims.map(legCte).mkString(",\n")}
       |SELECT dim, n_truth, n_hits,
       |  round(CAST(n_hits AS DOUBLE) / n_truth, 4) AS recall
       |FROM (
       |  $unions)
       |ORDER BY dim""".stripMargin
  }

  /** SR3 replay: sim17's ADC-vs-exact legs, then the position-
    * sensitive metrics — per-rank hit flags pivot into the SAME fixed
    * written-order nDCG expression the Spark side evaluates, with the
    * identical weight literals ([[graft.operators.Retrieval
    * .ndcgWeights]], shortest-round-trip strings CAST to DOUBLE), and
    * MRR as a single integer division.
    */
  def sr3Sql(numQueryVecs: Int = 5, k: Int = 10,
             mSub: Int = graft.operators.Similarity.PqM,
             kk: Int = graft.operators.Similarity.PqK,
             iters: Int = graft.operators.Similarity.PqIters,
             subDim: Int = graft.operators.Similarity.PqSubDim,
             dim: Int = 64): String = {
    val chains = pqChains(mSub, kk, iters, subDim)
    val codeCtes = pqCodesCtes(mSub, iters, subDim,
      s"WHERE e.vec_id >= $numQueryVecs")
    val lutCte = pqLutCte(mSub, iters, subDim, numQueryVecs)
    val sCols = pqSumCols(mSub)
    val sSum = pqSumExpr(mSub)
    val (ws, idcg) = graft.operators.Retrieval.ndcgWeights(k)
    val hCols = (1 to k).map(i =>
      s"max(CASE WHEN rk = $i THEN hit END) AS h$i").mkString(",\n    ")
    val dcgExpr = (1 to k).map(i =>
      s"CASE WHEN h$i = 1 THEN CAST('${ws(i - 1)}' AS DOUBLE) " +
        "ELSE CAST(0.0 AS DOUBLE) END").mkString("\n      + ")
    s"""WITH $chains,
       |$codeCtes,
       |$lutCte,
       |adc AS (
       |  SELECT l.q_id, c.vec_id,
       |    $sCols
       |  FROM codes c JOIN lut l ON c.m = l.m AND c.code = l.cid
       |  GROUP BY 1, 2),
       |top AS (
       |  SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY $sSum DESC, vec_id ASC) AS rk
       |  FROM adc),
       |ex AS (
       |  SELECT q.vec_id AS q_id, e.vec_id,
       |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |      ${pairDot("q.embedding", "e.embedding", dim)} DESC,
       |      e.vec_id ASC) AS xrk
       |  FROM embeddings q CROSS JOIN embeddings e
       |  WHERE q.vec_id < $numQueryVecs AND e.vec_id >= $numQueryVecs),
       |flags AS (
       |  SELECT t.q_id, t.rk,
       |    CASE WHEN x.vec_id IS NOT NULL THEN 1 ELSE 0 END AS hit
       |  FROM (SELECT q_id, vec_id, rk FROM top WHERE rk <= $k) t
       |  LEFT JOIN (SELECT q_id, vec_id FROM ex WHERE xrk <= $k) x
       |    ON t.q_id = x.q_id AND t.vec_id = x.vec_id),
       |piv AS (
       |  SELECT q_id,
       |    $hCols,
       |    min(CASE WHEN hit = 1 THEN rk END) AS first_hit,
       |    CAST(sum(hit) AS BIGINT) AS n_hit
       |  FROM flags GROUP BY q_id)
       |SELECT q_id, n_hit,
       |  round(CAST(n_hit AS DOUBLE) / $k.0, 4) AS recall,
       |  round(CASE WHEN first_hit IS NOT NULL
       |    THEN CAST(1.0 AS DOUBLE) / CAST(first_hit AS DOUBLE)
       |    ELSE CAST(0.0 AS DOUBLE) END, 6) AS mrr,
       |  round(($dcgExpr)
       |    / CAST('$idcg' AS DOUBLE), 6) AS ndcg
       |FROM piv
       |ORDER BY q_id""".stripMargin
  }

  /** SR1 replay: BOTH legs of the hybrid fusion independently — the
    * BM25 leg is tx19's CTE chain cut at r, the vector leg is sim16's
    * PQ chain for ONE query vector (codes trained/encoded in SQL,
    * ADC shortlist, exact-dot refine) cut at r — then the RRF tail
    * with integer-exact ranks (row_number, equal to the Spark side's
    * count-of-better under the same total orders) and the identical
    * 1/(k+rank) arithmetic.
    */
  def sr1Sql(terms: Seq[String] = Seq("window", "merge", "scan"),
             r: Int = 50, adcShort: Int = 60, kRrf: Int = 60,
             topK: Int = 20, dim: Int = 64): String = {
    import graft.operators.Similarity.{PqM, PqK, PqIters, PqSubDim}
    val chains = pqChains(PqM, PqK, PqIters, PqSubDim)
    val codeCtes = pqCodesCtes(PqM, PqIters, PqSubDim, "WHERE e.vec_id >= 1")
    val lutCte = pqLutCte(PqM, PqIters, PqSubDim, 1)
    val sCols = pqSumCols(PqM)
    val sSum = pqSumExpr(PqM)
    val termList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH $chains,
       |$codeCtes,
       |$lutCte,
       |adc AS (
       |  SELECT l.q_id, c.vec_id,
       |    $sCols
       |  FROM codes c JOIN lut l ON c.m = l.m AND c.code = l.cid
       |  GROUP BY 1, 2),
       |vshort AS (
       |  SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY $sSum DESC, vec_id ASC) AS srk
       |  FROM adc),
       |vrr AS (
       |  SELECT t.vec_id, ${pairDot("q.embedding", "e.embedding", dim)} AS xdot
       |  FROM vshort t
       |  JOIN embeddings e ON e.vec_id = t.vec_id
       |  JOIN embeddings q ON q.vec_id = t.q_id
       |  WHERE t.srk <= $adcShort),
       |rankb AS (
       |  SELECT doc_id, r_vec FROM (
       |    SELECT vec_id AS doc_id, CAST(row_number() OVER
       |      (ORDER BY xdot DESC, vec_id ASC) AS INTEGER) AS r_vec
       |    FROM vrr) WHERE r_vec <= $r),
       |btok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
       |  FROM documents),
       |bdl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM btok GROUP BY 1),
       |bst AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM bdl),
       |btf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM btok
       |  WHERE token IN ($termList) GROUP BY 1, 2),
       |bdfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM btf GROUP BY 1),
       |bc AS (
       |  SELECT btf.doc_id,
       |    ln(1.0 + (bst.n_docs - bdfq.df + 0.5) / (CAST(bdfq.df AS DOUBLE) + 0.5))
       |      * (CAST(btf.tf AS DOUBLE) * 2.2)
       |      / (CAST(btf.tf AS DOUBLE)
       |         + 1.2 * (1.0 - 0.75 + 0.75 * CAST(bdl.dl AS DOUBLE) / bst.avgdl))
       |      AS contrib
       |  FROM btf JOIN bdfq ON btf.token = bdfq.token
       |  JOIN bdl ON btf.doc_id = bdl.doc_id, bst),
       |lega AS (
       |  SELECT doc_id, round(sum(contrib), 6) AS bm25
       |  FROM bc GROUP BY doc_id
       |  ORDER BY bm25 DESC, doc_id ASC LIMIT $r),
       |ranka AS (
       |  SELECT doc_id, CAST(row_number() OVER
       |    (ORDER BY bm25 DESC, doc_id ASC) AS INTEGER) AS r_bm25
       |  FROM lega),
       |fused AS (
       |  SELECT coalesce(ranka.doc_id, rankb.doc_id) AS doc_id,
       |    CAST(coalesce(r_bm25, 0) AS INTEGER) AS r_bm25,
       |    CAST(coalesce(r_vec, 0) AS INTEGER) AS r_vec
       |  FROM ranka FULL OUTER JOIN rankb ON ranka.doc_id = rankb.doc_id)
       |SELECT doc_id, r_bm25, r_vec,
       |  round(CASE WHEN r_bm25 > 0
       |          THEN 1.0 / ($kRrf.0 + CAST(r_bm25 AS DOUBLE)) ELSE 0.0 END
       |      + CASE WHEN r_vec > 0
       |          THEN 1.0 / ($kRrf.0 + CAST(r_vec AS DOUBLE)) ELSE 0.0 END,
       |    6) AS rrf
       |FROM fused
       |ORDER BY rrf DESC, doc_id ASC LIMIT $topK""".stripMargin
  }

  /** SIM13 replay: the full IVF-PQ — sim4's coarse Lloyd chain +
    * cell/probe assignment bounds the candidate set, sim12's subspace
    * chains + code/LUT machinery scores it. Candidates follow sim4's
    * convention (everything in a probed cell except the query itself),
    * so codes cover the whole corpus.
    */
  def sim13Sql(numQueryVecs: Int = 5, k: Int = 3,
               numCells: Int = 16, nProbe: Int = 2,
               mSub: Int = graft.operators.Similarity.PqM,
               kk: Int = graft.operators.Similarity.PqK,
               pqIters: Int = graft.operators.Similarity.PqIters,
               subDim: Int = graft.operators.Similarity.PqSubDim,
               dim: Int = 64,
               coarseIters: Int = graft.operators.Similarity.IvfLloydIters): String = {
    val sCols = pqSumCols(mSub)
    val sSum = pqSumExpr(mSub)
    s"""WITH ${ivfCtes(numQueryVecs, numCells, nProbe, dim, coarseIters)},
       |${pqChains(mSub, kk, pqIters, subDim)},
       |${pqCodesCtes(mSub, pqIters, subDim, "")},
       |${pqLutCte(mSub, pqIters, subDim, numQueryVecs)},
       |cand AS (
       |  SELECT DISTINCT p.query_id, cl.vec_id
       |  FROM probes p JOIN cells cl ON cl.cell = p.probe_cell
       |  WHERE cl.vec_id <> p.query_id),
       |adc AS (
       |  SELECT ca.query_id, ca.vec_id,
       |    $sCols
       |  FROM cand ca
       |  JOIN codes c ON c.vec_id = ca.vec_id
       |  JOIN lut l ON l.m = c.m AND l.cid = c.code AND l.q_id = ca.query_id
       |  GROUP BY 1, 2),
       |top AS (
       |  SELECT query_id, vec_id, $sSum AS adcv,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY $sSum DESC, vec_id ASC) AS rk
       |  FROM adc)
       |SELECT query_id, vec_id, CAST(rk AS INTEGER) AS rk,
       |  round(adcv, 6) AS adc
       |FROM top WHERE rk <= $k
       |ORDER BY query_id, rk""".stripMargin
  }
}
