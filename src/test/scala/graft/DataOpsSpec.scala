package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Specs for the north-star data-pipeline ops that the driver only
  * rows-checks (sketch/LSH/stub ops) — cross-validated against their
  * exact counterparts.
  */
class DataOpsSpec extends SparkTestBase {

  test("DD3 MinHash-LSH pairs match exact n-gram Jaccard pairs (high recall)") {
    val exact = Dedup.ngramJaccardPairs(spark, sf, threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(spark, sf, threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH must not invent pairs (it verifies exactly)")
    assert(exact.nonEmpty, "test corpus should contain planted near-dups")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall too low (found ${lsh.size}/${exact.size})")
  }

  test("DF cap bounds per-gram fan-out and is inert at/above the corpus max DF") {
    val gr = Dedup.gramRows(spark, sf, 3)
    val maxDf = gr.groupBy("gh").count().agg(max("count")).head.getLong(0)
    // a binding cap: every surviving gram's doc frequency is <= cap,
    // so the self-join's per-gram contribution is <= C(cap, 2) rows
    val cap = math.max(1L, maxDf - 1)
    val worst = Dedup.capByDocFreq(gr, cap)
      .groupBy("gh").count().agg(max("count")).head.getLong(0)
    assert(worst <= cap, s"gram with df=$worst survived cap=$cap")
    // a non-binding cap passes the relation through untouched
    assert(Dedup.capByDocFreq(gr, maxDf).count() == gr.count())
    // the shipped default must sit far above this corpus family's max
    // DF — that is what makes every oracled dd-result provably equal
    // to the uncapped computation
    assert(maxDf < Dedup.DefaultMaxGramDocFreq,
      s"corpus max DF $maxDf reached the default cap; oracles would drift")
  }

  test("DD14 keep set on LSH pairs contains the exact-pair keep set") {
    val exact = Dedup.dedupKeepSet(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaLsh = Dedup.dedupKeepSetFrom(spark, sf,
        Dedup.minhashLshPairsRaw(spark, sf))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // LSH can only MISS pairs, so its drop set is a subset and its
    // keep set a superset of the exact path's
    assert(exact.subsetOf(viaLsh),
      "LSH keep set must contain every exactly-kept doc")
    val total = Tables.documents(spark, sf).count()
    assert(viaLsh.size < total, "planted dups mean something gets dropped")
  }

  test("SP4 weighted sample: k per source, weight tilts selection toward long docs") {
    val k = 8
    val out = Sampling.weightedSample(spark, sf, k).collect()
    val sizes = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bySource = out.groupBy(_.getString(0))
    assert(bySource.keySet == sizes.keySet)
    bySource.foreach { case (src, rows) =>
      assert(rows.length == math.min(k.toLong, sizes(src)),
        s"source $src must yield min(k, |source|) rows")
    }
    // the weight actually matters: sampled docs skew longer than average
    val avgAll = Tables.documents(spark, sf).agg(avg(col("n_chars")))
      .head.getDouble(0)
    val avgSampled = out.map(_.getAs[Long]("n_chars").toDouble).sum / out.length
    assert(avgSampled > avgAll,
      s"weighted sample should favor long docs: sampled=$avgSampled vs corpus=$avgAll")
    val again = Sampling.weightedSample(spark, sf, k).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("A28 equi-depth histogram: buckets tile all orders with ~equal depth") {
    val buckets = 8
    val rows = Analytics.equiDepthHistogram(spark, sf, buckets).collect()
    val total = Tables.orders(spark, sf).count()
    assert(rows.length == buckets)
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    val target = total.toDouble / buckets
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(math.abs(n - target) <= target * 0.05 + 2,
        s"bucket ${r.getAs[Int]("bucket")} depth $n far from $target")
    }
    // boundaries are real: bucket ranges are disjoint and ordered
    val ordered = rows.sortBy(_.getAs[Int]("bucket"))
    ordered.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("max_price") <= b.getAs[Double]("min_price"))
      case _ =>
    }
  }

  test("W14 EWMA matches a direct Scala recomputation of the truncated sum") {
    val alpha = 0.3; val span = 20
    val rows = Windows.ewmaDailySales(spark, sf, alpha, span)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length > span, "needs more days than the span")
    val sales = rows.map(_._2)
    rows.zipWithIndex.foreach { case ((day, _, got), i) =>
      val expect = (0 until span).map { j =>
        val x = if (i - j >= 0) sales(i - j) else 0.0
        x * (alpha * math.pow(1 - alpha, j))
      }.sum
      // got is rounded to 4dp by the operator — compare on that grid
      assert(math.abs(got - expect) < 5.1e-5,
        s"$day: ewma $got != recomputed $expect")
    }
  }

  test("W15 TWAP is duration-weighted: bounded by min/max and != plain AVG somewhere") {
    val rows = Windows.twapDaily(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute one user-day directly from the events
    val r0 = rows.head
    val (u, day) = (r0.getLong(0), r0.getString(1))
    val evs = Tables.events(spark, sf)
      .filter(col("user_id") === u &&
        date_format(col("ts"), "yyyy-MM-dd") === day)
      .select(unix_timestamp(col("ts")).as("sec"), col("value"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy(t => (t._1, t._3))
    val weighted = evs.zip(evs.tail).collect {
      case ((s0, v, _), (s1, _, _)) if s1 > s0 => (v, s1 - s0)
    }
    val expect = weighted.map { case (v, g) =>
      math.round(v * 1e6) * g }.sum / 1e6 / weighted.map(_._2).sum
    assert(math.abs(r0.getAs[Double]("twap") - expect) < 1e-6,
      s"user $u $day: twap ${r0.getAs[Double]("twap")} != direct $expect")
    // the weighting is real: some user-day differs from the unweighted mean
    val diffs = rows.take(50).count { r =>
      val vals = Tables.events(spark, sf)
        .filter(col("user_id") === r.getLong(0) &&
          date_format(col("ts"), "yyyy-MM-dd") === r.getString(1))
        .agg(avg(col("value"))).head.getDouble(0)
      math.abs(vals - r.getAs[Double]("twap")) > 1e-3
    }
    assert(diffs > 0, "TWAP never differing from AVG would mean the weights are dead")
  }

  test("TX14 vocabulary growth: cumulative curve lands exactly on corpus totals") {
    val rows = TextAnalysis.vocabGrowth(spark, sf).collect()
    val tok = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
    val totalTokens = tok.count()
    val totalTypes = tok.distinct().count()
    val last = rows.maxBy(_.getAs[Long]("bucket"))
    assert(last.getAs[Long]("cum_tokens") == totalTokens)
    assert(last.getAs[Long]("cum_types") == totalTypes)
    // curve is monotone and new_types can never exceed tokens in bucket
    val ordered = rows.sortBy(_.getAs[Long]("bucket"))
    ordered.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("cum_types") <= b.getAs[Long]("cum_types"))
        assert(a.getAs[Long]("cum_tokens") < b.getAs[Long]("cum_tokens"))
      case _ =>
    }
    rows.foreach(r =>
      assert(r.getAs[Long]("new_types") <= r.getAs[Long]("n_tokens")))
  }

  test("TX15 trigram LM: probabilities are exact count ratios in (0,1]") {
    val rows = TextAnalysis.trigramLm(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nTri = r.getAs[Long]("n_tri"); val nCtx = r.getAs[Long]("n_ctx")
      val prob = r.getAs[Double]("prob")
      assert(nTri >= 1 && nTri <= nCtx)
      assert(prob > 0 && prob <= 1.0)
      assert(math.abs(prob -
        BigDecimal(nTri.toDouble / nCtx)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
  }

  test("TX16 trigram commonality: exact ratios, bounded, planted dups score high") {
    val rows = TextAnalysis.trigramNovelty(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_trigrams"); val c = r.getAs[Long]("n_common")
      assert(c >= 0 && c <= n)
      val ratio = r.getAs[Double]("common_ratio")
      assert(math.abs(ratio - BigDecimal(c.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
    // exact-duplicate docs (dd1 finds n_copies >= 3 groups at this SF)
    // must score common_ratio 1.0 — their every trigram repeats
    val dupIds = Dedup.exactDedup(spark, sf)
      .filter(col("n_copies") >= 3).select("keep_id")
      .collect().map(_.getLong(0)).toSet
    if (dupIds.nonEmpty) {
      val byId = rows.map(r => r.getLong(0) -> r.getAs[Double]("common_ratio")).toMap
      dupIds.flatMap(byId.get).foreach(v => assert(v == 1.0))
    }
  }

  test("DD4 SimHash is deterministic and pairs have low hamming distance") {
    val a = Dedup.simhashPairs(spark, sf).collect()
    val b = Dedup.simhashPairs(spark, sf).collect()
    assert(a.sameElements(b), "simhash must be deterministic")
    assert(a.forall(_.getInt(2) <= 3))
  }

  test("SIM3 LSH-ANN is deterministic, bucket-consistent, and rank-ordered") {
    // On uniform random embeddings bucket-mates need not be global
    // top-k (no cluster structure), so recall vs brute force is not a
    // meaningful assertion here; the structural contract is.
    val a = Similarity.lshAnn(spark, sf).collect()
    val b = Similarity.lshAnn(spark, sf).collect()
    assert(a.sameElements(b), "ANN must be deterministic (fixed-seed planes)")
    assert(a.nonEmpty)
    // per query: ranks dense from 1, cos_sim non-increasing
    a.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to sorted.length))
      val sims = sorted.map(_.getDouble(2)).toSeq
      assert(sims == sims.sorted.reverse)
    }
    // every returned neighbor shares the query's bucket in >= 1 of the
    // L hash tables (multi-table LSH: any single collision qualifies);
    // all 8 bucket columns computed in ONE pass over the embeddings
    import org.apache.spark.sql.functions.col
    val bucketCols = (0 until 8).map { t =>
      graft.functions.Vectors.lshBucket(col("embedding"),
        graft.functions.Vectors.randomPlanes(4, 64, 42L + t)).as(s"b$t")
    }
    val rows = Tables.embeddings(spark, sf)
      .select(col("vec_id") +: bucketCols: _*).collect()
    val perTable = (0 until 8).map(t =>
      rows.map(r => r.getLong(0) -> r.getLong(1 + t)).toMap)
    a.foreach { r =>
      assert(perTable.exists(m => m(r.getLong(0)) == m(r.getLong(1))),
        s"neighbor ${r.getLong(1)} shares no table bucket with query ${r.getLong(0)}")
    }
  }

  test("SIM4 IVF-ANN is deterministic, rank-ordered, and probes its own cell") {
    val a = Similarity.ivfAnn(spark, sf).collect()
    val b = Similarity.ivfAnn(spark, sf).collect()
    assert(a.sameElements(b), "IVF must be deterministic (fixed seed centroids)")
    assert(a.nonEmpty)
    a.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sims = rows.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(sims == sims.sorted.reverse)
    }
    // a query's own cell is among its probes, so a same-cell exact
    // near-dup could never be missed: query 0's top ivf neighbor must
    // be at least as similar as any same-cell vector found by brute force
    assert(a.count(_.getLong(0) == 0L) > 0, "query 0 must get candidates")
  }

  test("SIM1 brute-force top-k is ordered by similarity desc") {
    val sims = Similarity.cosineTopK(spark, sf).select("cos_sim")
      .collect().map(_.getDouble(0)).toSeq
    assert(sims == sims.sorted.reverse)
    assert(sims.forall(v => v >= -1.0001 && v <= 1.0001))
  }

  test("MM2 real decode: PNG round-trip is exact, deterministic, and headers agree") {
    import spark.implicits._
    val recs = Multimodal.pngRecords(spark, sf)
    // every fixture payload is a real PNG (magic bytes)
    val pngMagic = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)
    assert(recs.collect().forall(_.payload.take(4).sameElements(pngMagic)))
    val feats = Multimodal.mediaFeatures(spark, sf)
    // decoded dimensions must equal the closed form the fixture painted
    val badDims = feats
      .filter(col("width") =!= (col("doc_id") % 14 + 3).cast("int") ||
        col("height") =!= (col("doc_id") % 11 + 3).cast("int"))
    assert(badDims.count() == 0, "decoded dims must match the painted dims")
    assert(feats.filter(col("luma_sum") < 0).count() == 0,
      "every fixture PNG must take the real-decode path, not the fallback")
    val a = feats.collect(); val b = Multimodal.mediaFeatures(spark, sf).collect()
    assert(a.sameElements(b))
  }

  test("MM2 mixed fixture: JPEG rows are real JPEGs and decode bit-exact") {
    // The blockwise-constant paint + quality-1.0 encode is what makes
    // the JPEG leg losslessly replayable (see imageRecords scaladoc);
    // if any JDK codec drift broke that, luma_sum would differ and the
    // mm2/mm7/mm8 oracles would silently be wrong — pin it here.
    val recs = Multimodal.imageRecords(spark, sf).collect()
    val jpegs = recs.filter(_.doc_id % 3 == 0)
    val pngs = recs.filter(_.doc_id % 3 != 0)
    assert(jpegs.nonEmpty && pngs.nonEmpty, "need both formats in the corpus")
    // JPEG/JFIF magic: FF D8 FF
    assert(jpegs.forall(r => (r.payload(0) & 0xff) == 0xff &&
      (r.payload(1) & 0xff) == 0xd8 && r.mime == "image/jpeg"))
    val feats = Multimodal.decodeImage(Multimodal.imageRecords(spark, sf))
      .collect().map(f => f.doc_id -> f).toMap
    jpegs.foreach { r =>
      val id = r.doc_id
      val w = (id % 14 + 3).toInt; val h = (id % 11 + 3).toInt
      var expect = 0L
      for (y <- 0 until h; x <- 0 until w)
        expect += (id * 37 + 11L * (x / 8) + 17L * (y / 8)) % 256
      val f = feats(id)
      assert(f.width == w && f.height == h,
        s"doc $id: JPEG decode returned ${f.width}x${f.height}, painted ${w}x$h")
      assert(f.luma_sum == expect,
        s"doc $id: JPEG round-trip not bit-exact (${f.luma_sum} != $expect) — " +
          "codec drift would silently skew the mm oracles")
    }
  }

  test("MM2 undecodable payloads degrade per-row to the fingerprint fallback") {
    import spark.implicits._
    val garbage = Seq(
      Multimodal.MediaRecord(1L, "not an image".getBytes("UTF-8"), "x", "s"),
      Multimodal.MediaRecord(2L, Array.empty[Byte], "x", "s")).toDS()
    val out = Multimodal.decodeImage(garbage).collect()
    assert(out.length == 2)
    assert(out.forall(f => f.width == -1 && f.height == -1 &&
      f.luma_sum == -1L && f.fingerprint > 0L),
      "undecodable rows must carry the md5 fallback, not fail the task")
  }

  // the mixed fixture's painted pixel value (PNG per-pixel form or the
  // JPEG blockwise-constant form) — the spec-side twin of the paint in
  // Multimodal.imageRecords
  private def paintedPixel(id: Long, x: Int, y: Int): Long =
    if (id % 3 == 0) (id * 37 + 11L * (x / 8) + 17L * (y / 8)) % 256
    else (id * 31 + 7L * x + 13L * y) % 256

  test("MM7 decoded aHash equals the closed-form hash, independently recomputed") {
    // recompute the 4×4 block-mean hash from the PAINTED closed form
    // (never touching the decoder) — if either codec's round-trip or
    // the raster pass drifted by one sample, some bit would flip
    def closedFormAhash(id: Long): Long = {
      val w = (id % 14 + 3).toInt; val h = (id % 11 + 3).toInt
      val bsum = new Array[Long](16); val bcnt = new Array[Long](16)
      var sum = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val b = y * 4 / h * 4 + x * 4 / w
        val v = paintedPixel(id, x, y)
        sum += v; bsum(b) += v; bcnt(b) += 1
      }
      (0 until 16).map { b =>
        if (bsum(b) * w * h > sum * bcnt(b)) 1L << b else 0L
      }.sum
    }
    val decoded = Multimodal.decodeImage(Multimodal.imageRecords(spark, sf))
      .collect()
    assert(decoded.nonEmpty)
    decoded.foreach { f =>
      assert(f.ahash == closedFormAhash(f.doc_id),
        s"doc ${f.doc_id}: decoded ahash ${f.ahash} != closed form")
    }
    // and the bucket relation only reports genuine collisions
    val buckets = Multimodal.ahashBuckets(spark, sf).collect()
    assert(buckets.forall(_.getLong(1) >= 2))
  }

  test("MM8 decoded dHash equals the closed-form gradient hash") {
    // 4×5 grid means from the painted closed form; bit = left cell
    // mean > right cell mean, empty cells (narrow images) compare
    // deterministically false
    def closedFormDhash(id: Long): Long = {
      val w = (id % 14 + 3).toInt; val h = (id % 11 + 3).toInt
      val dsum = new Array[Long](20); val dcnt = new Array[Long](20)
      for (y <- 0 until h; x <- 0 until w) {
        val g = y * 4 / h * 5 + x * 5 / w
        dsum(g) += paintedPixel(id, x, y)
        dcnt(g) += 1
      }
      (for (by <- 0 until 4; bx <- 0 until 4) yield {
        val l = by * 5 + bx
        if (dsum(l) * dcnt(l + 1) > dsum(l + 1) * dcnt(l))
          1L << (by * 4 + bx)
        else 0L
      }).sum
    }
    val decoded = Multimodal.decodeImage(Multimodal.imageRecords(spark, sf))
      .collect()
    assert(decoded.nonEmpty)
    decoded.foreach { f =>
      assert(f.dhash == closedFormDhash(f.doc_id),
        s"doc ${f.doc_id}: decoded dhash ${f.dhash} != closed form")
    }
    // gradients and levels are different signals: the two hashes must
    // not be the same function on this corpus
    assert(decoded.exists(f => f.dhash != f.ahash))
  }

  test("TX5 lang-id is deterministic and emits a known language") {
    val langs = TextAnalysis.langId(spark, sf).select("predicted")
      .distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(TextAnalysis.langProfiles.keySet))
  }

  test("DD1 exact dedup keeps every distinct fingerprint exactly once") {
    val docs = Tables.documents(spark, sf)
    val nDistinct = docs.select(md5(col("text").cast("binary"))).distinct().count()
    assert(Dedup.exactDedup(spark, sf).count() == nDistinct)
  }

  test("dp12: length bucketing beats arrival-order batching on padding waste") {
    val r = DataPrep.lengthBucketedPack(spark, sf).collect()
    assert(r.length == 2)
    val m = r.map(x => x.getString(0) -> x).toMap
    // both policies account for every char exactly once
    assert(m("bucketed").getAs[Long]("total_chars") ==
      m("id_block").getAs[Long]("total_chars"))
    r.foreach { row =>
      assert(row.getAs[Long]("padded_chars") >= row.getAs[Long]("total_chars"))
    }
    assert(m("bucketed").getAs[Double]("waste_ratio") <
      m("id_block").getAs[Double]("waste_ratio"),
      s"bucketing must reduce padding: ${r.toSeq}")
  }

  test("DD21 scrub round-trips untouched docs and only removes shared chunks") {
    val rows = Dedup.spanScrub(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    assert(rows.length == docs.count())
    // chunk accounting: ceil(words/8) per doc, removals within bounds
    val wordCounts = docs
      .select(col("doc_id"), size(split(col("text"), " ")).as("nw"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_chunks") == (wordCounts(id) + 7) / 8)
      val rem = r.getAs[Long]("n_removed")
      assert(rem >= 0 && rem <= r.getAs[Long]("n_chunks"))
    }
    // segmentation/reassembly identity: a doc that lost nothing must
    // hash back to its original text verbatim
    val untouched = rows.filter(_.getAs[Long]("n_removed") == 0L)
      .map(_.getAs[Long]("doc_id")).toSet
    assert(untouched.nonEmpty)
    val origMd5 = docs.select(col("doc_id"), md5(col("text").cast("binary")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.filter(r => untouched(r.getAs[Long]("doc_id"))).foreach { r =>
      assert(r.getAs[String]("scrubbed_md5") ==
        origMd5(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")} round-trip failed")
    }
    // the synthetic corpus plants shared boilerplate — the scrub must
    // actually fire somewhere
    assert(rows.exists(_.getAs[Long]("n_removed") > 0L))
  }

  test("DP21 token funnel matches a from-scratch Scala recompute of all stages") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // independent segmentation: 8-word non-overlapping chunks as
    // plain Scala strings (no hashes anywhere)
    def chunksOf(t: String): Seq[String] =
      t.split(" ", -1).grouped(8).map(_.mkString(" ")).toSeq
    val chunkDocs = docs.toSeq
      .flatMap { case (id, t) => chunksOf(t).map(c => (c, id)) }
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).distinct.size }
    val bannedSet = chunkDocs.filter(_._2 >= 3).keySet
    val perDoc = docs.map { case (id, t) =>
      val cs = chunksOf(t)
      val toks = cs.map(_.split(" ", -1).length.toLong).sum
      val kept = cs.filterNot(bannedSet)
        .map(_.split(" ", -1).length.toLong).sum
      id -> (toks, kept)
    }
    val keepIds = docs.toSeq.groupBy(_._2).map(_._2.map(_._1).min).toSet
    val qok = TextAnalysis.qualityScore(spark, sf)
      .select("doc_id", "quality").collect()
      .filter(_.getDouble(1) >= 0.55).map(_.getLong(0)).toSet
    val t0 = perDoc.values.map(_._1).sum
    val t1 = perDoc.values.map(_._2).sum
    val t2 = perDoc.filter(p => keepIds(p._1)).values.map(_._2).sum
    val t3 = perDoc.filter(p => keepIds(p._1) && qok(p._1)).values.map(_._2).sum
    val rows = Pipeline.scrubTokenFunnel(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("tokens_in"), r.getAs[Long]("tokens_out"))).toMap
    assert(rows("1_span_scrub") == (t0, t1), s"scrub: ${rows("1_span_scrub")} != ($t0,$t1)")
    assert(rows("2_exact_dedup") == (t1, t2))
    assert(rows("3_quality_floor") == (t2, t3))
    assert(t0 > t1 && t1 >= t2 && t2 >= t3 && t3 > 0)
  }

  test("W21 streak histogram matches a brute-force per-user recompute") {
    val got = Windows.activityStreaks(spark, sf).collect()
      .map(r => (r.getAs[Long]("streak_len"), r.getAs[Long]("n_users"),
        r.getAs[Long]("example_user")))
    val byUser = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().collect()
      .map(r => r.getLong(0) -> r.getDate(1).toLocalDate.toEpochDay)
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).sorted.toSeq }
    def longest(days: collection.Seq[Long]): Long = {
      var best = 1L; var cur = 1L
      days.zip(days.tail).foreach { case (a, b) =>
        cur = if (b == a + 1) cur + 1 else 1L
        best = math.max(best, cur)
      }
      best
    }
    val expected = byUser.map { case (u, ds) => (u, longest(ds)) }.toSeq
      .groupBy(_._2).map { case (len, us) =>
        (len, us.size.toLong, us.map(_._1).min)
      }.toSeq.sortBy(-_._1)
    assert(got.toSeq == expected,
      s"histogram mismatch:\n got=${got.toSeq}\n exp=$expected")
  }
}
