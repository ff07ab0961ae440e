package graft

import graft.functions.Text

/** Programmatic DuckDB oracle SQL for pipelines whose hash chains are
  * replayed cross-engine: the MinHash/LSH and SimHash dedup families
  * (dd3/dd4/dd12). The SQL embeds the exact literal parameters the
  * Spark operators fold into their plans — affine minhash
  * coefficients, band layouts, chunk widths — over the portable
  * `Text.h60` hash basis (top 60 bits of md5, which DuckDB parses as
  * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`). The oracle
  * therefore computes the IDENTICAL result, and these approximate ops
  * are hash-checked by the driver rather than rows-only.
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

  /** CTE block from gh → LSH band-bucket candidate pairs (twin of
    * Dedup.minhashSignatures + lshCandidates).
    */
  private def lshCandCtes(numHashes: Int, bands: Int): String = {
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
       |    ]) AS u FROM sig) t),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM banded a JOIN banded b
       |           ON a.band = b.band AND a.bucket = b.bucket
       |          AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** dd3_minhash_lsh: LSH candidates verified by exact Jaccard over
    * the shared distinct-h60 gram counts.
    */
  def dd3Sql(threshold: Double = 0.5,
             numHashes: Int = 64, bands: Int = 16): String =
    s"""WITH $gramCtes,
       |${lshCandCtes(numHashes, bands)},
       |cnt AS (SELECT doc_id, count(*) AS n FROM gh GROUP BY doc_id),
       |shared AS (SELECT c.doc_a, c.doc_b, count(*) AS s
       |           FROM cand c
       |           JOIN gh ga ON ga.doc_id = c.doc_a
       |           JOIN gh gb ON gb.doc_id = c.doc_b AND ga.h = gb.h
       |           GROUP BY 1, 2),
       |j AS (SELECT doc_a, doc_b, CAST(s AS DOUBLE) / (ca.n + cb.n - s) AS jac
       |      FROM shared JOIN cnt ca ON ca.doc_id = doc_a
       |                  JOIN cnt cb ON cb.doc_id = doc_b)
       |SELECT doc_a, doc_b, round(jac, 4) AS jaccard FROM j
       |WHERE jac >= $threshold ORDER BY doc_a, doc_b""".stripMargin

  /** dd12_lsh_audit: exact-Jaccard truth pairs vs the LSH candidate
    * set — n_true / n_candidates / n_hits / recall, one row.
    */
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
}
