package graft

import graft.operators.{Analytics, DataPrep, Graph, Similarity}
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-6 session-path / mixture /
  * weighted-path / MMR additions (sq3, dp13, gr6, sim11). Each is
  * also hash-oracled end-to-end (SparkEntry.oracleSql); these tests
  * pin the properties the hash can't express.
  */
class Pack8Spec extends SparkTestBase {

  test("sq3: every counted path has 3 steps and n >= 1, ordered by n desc") {
    val rows = DataPrep.sessionPaths(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("path").split(">").length == 3))
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.forall(_ >= 1L))
    assert(ns.sameElements(ns.sorted.reverse))
    // n_users can never exceed the path count
    assert(rows.forall(r => r.getAs[Long]("n_users") <= r.getAs[Long]("n")))
  }

  test("sq3: total path instances == sum over sessions of max(len-2, 0)") {
    // conservation: each session of m events contributes exactly m-2
    // 3-grams (0 if m < 3) — paths never cross session boundaries
    val expected = graft.operators.Analytics.sessionize(spark, sf)
      .select(greatest(col("n_events") - 2, lit(0L)).as("c"))
      .agg(sum("c")).head.getLong(0)
    val got = DataPrep.sessionPaths(spark, sf)
      .agg(sum("n")).head.getLong(0)
    assert(got == expected, s"path instances $got != $expected")
  }

  test("dp13: per-source take respects the temperature quota and the md5 rank order") {
    val out = DataPrep.temperatureMix(spark, sf)
    val perSrc = out.groupBy("source")
      .agg(count(lit(1)).as("taken"), max("rk").as("max_rk"),
        max("target_n").as("tgt"))
      .collect()
    assert(perSrc.nonEmpty)
    perSrc.foreach { r =>
      // dense rank prefix: exactly target_n rows, ranks 1..target_n
      assert(r.getAs[Long]("taken") == r.getAs[Long]("tgt"))
      assert(r.getAs[Long]("max_rk") == r.getAs[Long]("tgt"))
    }
  }

  test("dp13: alpha < 1 flattens the mix — small sources keep a larger fraction") {
    val counts = Tables.documents(spark, sf)
      .groupBy("source").agg(count(lit(1)).as("n_src"))
    val frac = DataPrep.temperatureMix(spark, sf)
      .groupBy("source").agg(count(lit(1)).as("taken"))
      .join(counts, "source")
      .select(col("source"), col("n_src"),
        col("taken").cast("double") / col("n_src").cast("double"))
      .collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    if (frac.length >= 2 && frac.head._1 < frac.last._1) {
      assert(frac.head._2 >= frac.last._2 - 1e-9,
        s"smallest source kept ${frac.head._2}, largest ${frac.last._2}")
    }
  }

  test("gr6: weighted distances are positive, triangle-consistent vs hops") {
    val hops = Graph.hopDistance(spark, sf).withColumnRenamed("dist", "h")
    val cheap = Graph.cheapestRoute(spark, sf).withColumnRenamed("dist", "c")
    val joined = hops.join(cheap, "node").collect()
    assert(joined.nonEmpty)
    // same reachable set (same edge relation, weights >= 1)
    assert(hops.count() == cheap.count())
    joined.foreach { r =>
      val (h, c) = (r.getAs[Long]("h"), r.getAs[Long]("c"))
      // each hop costs at least 1 (min quantity >= 1), at most 50
      assert(c >= h, s"node ${r.get(0)}: weighted $c < hops $h")
      assert(c <= h * 50, s"node ${r.get(0)}: weighted $c > 50x hops $h")
    }
  }

  test("sim11: picks are distinct, from the pool, first pick is the relevance argmax") {
    val rows = Similarity.mmrDiversify(spark, sf, k = 5).collect()
    assert(rows.length == 5)
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == ids.length)
    val byOrder = rows.sortBy(_.getAs[Int]("pick_order"))
    // pick 1 maximizes plain relevance (score = relW * rel)
    val first = byOrder.head
    assert(math.abs(first.getAs[Double]("score")
      - 0.7 * first.getAs[Double]("rel")) < 1e-12)
    assert(rows.map(_.getAs[Double]("rel")).max
      == first.getAs[Double]("rel"))
  }

  test("tx20: encoding conserves character mass and compresses the token stream") {
    import graft.operators.TextAnalysis
    val tokens = TextAnalysis.bpeEncodeTopTokens(spark, sf, topK = 1000000)
    // token-weighted char mass == raw corpus char mass (spaces removed):
    // merges rewrite segmentation, never content
    val tokChars = tokens
      .agg(sum(length(col("token")) * col("n"))).head.getLong(0)
    val rawChars = Tables.documents(spark, sf)
      .select(sum(length(regexp_replace(col("text"), " ", ""))))
      .head.getLong(0)
    assert(tokChars == rawChars, s"char mass $tokChars != $rawChars")
    // 10 merges must strictly shrink the token count vs char count
    val nTokens = tokens.agg(sum("n")).head.getLong(0)
    assert(nTokens < rawChars, s"no compression: $nTokens tokens vs $rawChars chars")
    // the LAST merge's target must survive into the emitted vocabulary
    // (earlier targets can legitimately be consumed by later merges)
    val lastMerged = TextAnalysis.bpeMerges(spark, sf)
      .orderBy(col("step").desc).limit(1).head.getAs[String]("merged")
    val emitted = tokens.select("token").collect().map(_.getString(0)).toSet
    assert(emitted.contains(lastMerged),
      s"last trained merge '$lastMerged' missing from encoding")
  }

  test("gr7: labels are graph nodes and propagation merges communities") {
    val labels = Graph.labelPropagation(spark, sf).collect()
    assert(labels.nonEmpty)
    val nodes = labels.map(_.getAs[Long]("node")).toSet
    val lbls = labels.map(_.getAs[Long]("lbl")).toSet
    // a label is always some node's id (labels start as identities)
    assert(lbls.subsetOf(nodes), s"foreign labels: ${lbls -- nodes}")
    // propagation must coarsen: strictly fewer communities than nodes
    assert(lbls.size < nodes.size,
      s"no merging: ${lbls.size} labels over ${nodes.size} nodes")
  }

  test("a31: equal-frequency bins, shares sum to 1, cumulative monotone") {
    val rows = Analytics.decileLift(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("decile")).toSeq == (1 to 10))
    val ns = rows.map(_.getAs[Long]("n_cust"))
    assert(ns.max - ns.min <= 1, s"ntile bins uneven: ${ns.mkString(",")}")
    val shares = rows.map(_.getAs[Double]("share"))
    assert(math.abs(shares.sum - 1.0) < 1e-5)
    val cums = rows.map(_.getAs[Double]("cum_share"))
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a })
    assert(math.abs(cums.last - 1.0) < 1e-5)
    // ranked by spend: the top decile carries the largest share
    assert(shares.head == shares.max)
  }

  test("tx21: ranks are positive, rank mass is conserved within teleport bounds") {
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.textRank(spark, sf, topK = 1000).collect()
    assert(rows.nonEmpty)
    val prs = rows.map(_.getAs[Long]("pr"))
    assert(prs.forall(_ > 0L))
    // every node's rank is at least the teleport floor
    assert(prs.forall(_ >= 150000000L))
    // ordered by salience desc with word tie-break
    assert(prs.sameElements(prs.sorted.reverse))
    // stochastic fixed point: total mass stays within [85%, 100%] of
    // n*scale (integer floor-division only ever loses mass)
    val n = rows.length.toLong
    assert(prs.sum <= n * 1000000000L)
    assert(prs.sum >= n * 850000000L)
  }

  test("dp14: bands partition the corpus, batches are contiguous rank blocks") {
    val out = DataPrep.curriculumOrder(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(out.length.toLong == total, "curriculum must cover every doc")
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length == out.length)
    out.groupBy(_.getAs[Int]("band")).foreach { case (_, rows) =>
      val rns = rows.map(_.getAs[Long]("rn")).sorted
      assert(rns.head == 1L && rns.last == rns.length.toLong,
        "within-band ranks must be dense 1..n")
      rows.foreach(r =>
        assert(r.getAs[Long]("batch_id") == (r.getAs[Long]("rn") - 1) / 32))
    }
  }

  test("w16: z-scores come only from full 7-day windows and flag consistently") {
    import graft.operators.Windows
    val rows = Windows.rollingAnomaly(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (z, flag) = (r.getAs[Double]("z"), r.getAs[Int]("is_anomaly"))
      assert((math.abs(z) > 1.5) == (flag == 1), s"flag mismatch at z=$z")
    }
    // each series' first 6 days never score (partial windows filtered)
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
      .groupBy("event_type").agg(count(lit(1)).as("days"))
      .collect().map(r => (r.getString(0), r.getAs[Long]("days"))).toMap
    val scored = rows.groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.length.toLong).toMap
    scored.foreach { case (typ, nScored) =>
      assert(nScored == daily(typ) - 6,
        s"$typ: scored $nScored of ${daily(typ)} days")
    }
  }

  test("gr8: every surviving node has >= k neighbors inside the core") {
    val core = Graph.kCore(spark, sf, k = 3).collect()
    assert(core.nonEmpty)
    assert(core.forall(_.getAs[Long]("deg") >= 3L),
      "k-core member below k inside the core")
  }

  test("mm6: cut counts bounded by frames, checksum consistent") {
    import graft.operators.Multimodal
    val rows = Multimodal.sceneCuts(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nf, nc, ps) = (r.getAs[Long]("n_frames"), r.getAs[Long]("n_cuts"),
        r.getAs[Long]("cut_possum"))
      assert(nc < nf, "first frame can never be a cut")
      // cut positions are frame_nos >= 1, so the checksum bounds hold
      assert(if (nc == 0) ps == 0 else ps >= nc)
      assert(ps <= nc * nf)
    }
  }

  test("a32: KS statistic matches a driver-side recomputation") {
    val out = Analytics.ksTest(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    val (na, nb, d) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Double]("d_stat"))
    assert(d >= 0.0 && d <= 1.0)
    // brute-force ECDF sup-gap over the pooled sample
    val seg = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("c_mktsegment").as("seg"))
      .collect().map(r2 => (r2.getLong(0), r2.getString(1)))
    val a = seg.filter(_._2 == "BUILDING").map(_._1).sorted
    val b = seg.filter(_._2 == "MACHINERY").map(_._1).sorted
    assert(a.length.toLong == na && b.length.toLong == nb)
    val values = (a ++ b).distinct.sorted
    val dExp = values.map { v =>
      math.abs(a.count(_ <= v).toDouble / a.length
        - b.count(_ <= v).toDouble / b.length)
    }.max
    assert(math.abs(d - dExp) < 1e-6, s"D $d != brute-force $dExp")
  }

  test("a34: Gini is in [0,1) and matches a driver-side recomputation") {
    val r = Analytics.giniSpend(spark, sf).head
    val g = r.getAs[Double]("gini")
    assert(g >= 0.0 && g < 1.0)
    val cents = Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
      .collect().map(_.getLong(1)).sorted
    val n = cents.length.toDouble
    val iw = cents.zipWithIndex.map { case (x, i) => (i + 1).toDouble * x }.sum
    val exp = 2.0 * iw / (n * cents.map(_.toDouble).sum) - (n + 1) / n
    assert(math.abs(g - exp) < 1e-6, s"gini $g != brute-force $exp")
  }

  test("gr9: predicted links are non-edges with valid Jaccard bounds") {
    val edges = Graph.supportedEdges(spark, sf, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val preds = Graph.linkPrediction(spark, sf).collect()
    assert(preds.nonEmpty)
    preds.foreach { r =>
      val (a, c) = (r.getAs[Long]("a"), r.getAs[Long]("c"))
      assert(a < c, "canonical pair order violated")
      assert(!edges.contains((a, c)), s"predicted an existing edge ($a,$c)")
      val j = r.getAs[Double]("jaccard")
      assert(j > 0.0 && j <= 1.0)
      assert(r.getAs[Long]("cn") >= 1L)
    }
  }

  test("tx22: Zipf fit slope is negative with high explanatory power on ranked freqs") {
    import graft.operators.TextAnalysis
    val r = TextAnalysis.zipfFit(spark, sf).head
    assert(r.getAs[Long]("n_tokens") > 10L)
    assert(r.getAs[Double]("slope") < 0.0,
      "frequency must decay with rank")
    val r2 = r.getAs[Double]("r2")
    assert(r2 > 0.0 && r2 <= 1.0)
  }

  test("sq4: deltas positive; every converted user truly has view-then-purchase") {
    val rows = DataPrep.funnelLatency(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("delta_s") > 0L))
    // recompute one user's delta from raw events
    val u = rows.head.getAs[Long]("user_id")
    val evs = Tables.events(spark, sf)
      .filter(col("user_id") === u)
      .select(col("ts"), col("event_type")).collect()
      .map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1)))
    val tv = evs.filter(_._2 == "view").map(_._1).min
    val tp = evs.filter(t => t._2 == "purchase" && t._1 > tv).map(_._1).min
    assert(rows.head.getAs[Long]("delta_s") == tp - tv)
  }

  test("a35: digit shares sum to 1, Benford expectations sum to 1, chi2 constant") {
    val rows = Analytics.benfordAudit(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("digit")).toSeq.sorted == (1 to 9))
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getAs[Double]("exp_share")).sum - 1.0) < 1e-4)
    assert(rows.map(_.getAs[Double]("chi2")).distinct.length == 1)
  }

  test("dp15: no near-dup pair straddles a split boundary") {
    import graft.operators.Dedup
    val splits = DataPrep.leakageSafeSplit(spark, sf)
      .select(col("doc_id"), col("split"))
    val pairs = Dedup.ngramJaccardPairs(spark, sf)
      .select(col("doc_a"), col("doc_b"))
    val straddling = pairs
      .join(splits.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("split", "sa"), "doc_a")
      .join(splits.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("split", "sb"), "doc_b")
      .filter(col("sa") =!= col("sb"))
      .count()
    assert(straddling == 0, s"$straddling near-dup pairs leak across splits")
    // and the split is still a real 3-way partition of the corpus
    val dist = splits.groupBy("split").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(dist.keySet == Set("train", "val", "test"), s"splits: $dist")
  }

  test("w17: peak is monotone, drawdown nonnegative and zero at each new peak") {
    import graft.operators.Windows
    val rows = Windows.revenueDrawdown(spark, sf).collect()
    assert(rows.nonEmpty)
    val peaks = rows.map(_.getAs[Long]("peak"))
    assert(peaks.zip(peaks.tail).forall { case (a, b) => b >= a })
    rows.foreach { r =>
      val (c, p, dd) = (r.getAs[Long]("cents"), r.getAs[Long]("peak"),
        r.getAs[Long]("drawdown"))
      assert(dd == p - c && dd >= 0)
      if (c == p) assert(dd == 0)
    }
    // the peak is actually attained by some day at or before each row
    assert(rows.head.getAs[Long]("drawdown") == 0L, "first day is its own peak")
  }

  test("sim11: diversification changes the order vs plain top-k") {
    val mmr = Similarity.mmrDiversify(spark, sf, k = 8)
      .orderBy("pick_order")
      .collect().map(_.getAs[Long]("vec_id"))
    val topk = Similarity.cosineTopK(spark, sf, k = 8)
      .collect().map(_.getAs[Long]("vec_id"))
    // same universe of candidates, but MMR must not be the identity
    // permutation of relevance order (the corpus has near-dup clusters)
    assert(!mmr.sameElements(topk), "MMR degenerated to plain top-k")
  }
}
