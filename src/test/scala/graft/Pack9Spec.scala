package graft

import graft.operators.{Analytics, Graph, Windows}
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-6 rank-statistics / interval /
  * mixing additions (a36, a37, w18, gr10, st8). Each is also
  * hash-oracled end-to-end (SparkEntry.oracleSql); these tests pin the
  * properties the hash can't express, via independent driver-side
  * brute-force recomputations at sf0.001.
  */
class Pack9Spec extends SparkTestBase {

  private def pooledSeg(): (Array[Long], Array[Long]) = {
    val seg = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("c_mktsegment").as("seg"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    (seg.filter(_._2 == "BUILDING").map(_._1),
      seg.filter(_._2 == "MACHINERY").map(_._1))
  }

  test("a36: doubled rank-sum and U match a brute-force tie-averaged ranking") {
    val r = Analytics.mannWhitney(spark, sf).head
    val (a, b) = pooledSeg()
    assert(r.getAs[Long]("n_a") == a.length.toLong)
    assert(r.getAs[Long]("n_b") == b.length.toLong)
    // brute-force tie-averaged ranks over the pooled sample (doubled)
    val pooled = (a.map((_, 'a')) ++ b.map((_, 'b'))).sortBy(_._1)
    val rank2 = pooled.map(_._1).zipWithIndex.groupBy(_._1).map {
      case (v, idxs) =>
        // 1-based positions i..j of the tie run → doubled avg = i + j
        (v, (idxs.map(_._2 + 1).min + idxs.map(_._2 + 1).max).toLong)
    }
    val r2aExp = a.map(rank2).sum
    assert(r.getAs[Long]("r2_a") == r2aExp, s"2R_A != brute force $r2aExp")
    val u2aExp = r2aExp - a.length.toLong * (a.length + 1)
    assert(r.getAs[Long]("u2_a") == u2aExp)
    // 2U_A + 2U_B = 2·n_a·n_b — the U identity survives ties
    val r2bExp = b.map(rank2).sum
    val u2bExp = r2bExp - b.length.toLong * (b.length + 1)
    assert(u2aExp + u2bExp == 2L * a.length * b.length)
  }

  test("a37: rho matches a brute-force Spearman and lies in [-1, 1]") {
    val r = Analytics.spearmanBalSpend(spark, sf).head
    val rho = r.getAs[Double]("rho")
    assert(rho >= -1.0 && rho <= 1.0)
    val rows = Tables.customer(spark, sf)
      .select(col("c_custkey"), round(col("c_acctbal") * 100).cast("long").as("x"))
      .join(Tables.orders(spark, sf).groupBy("o_custkey")
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y")),
        col("c_custkey") === col("o_custkey"))
      .select(col("x"), col("y"))
      .collect().map(rr => (rr.getLong(0), rr.getLong(1)))
    assert(r.getAs[Long]("n") == rows.length.toLong)
    def rank2(vs: Array[Long]): Map[Long, Double] = {
      val sorted = vs.sorted
      sorted.zipWithIndex.groupBy(_._1).map { case (v, idxs) =>
        (v, (idxs.map(_._2 + 1).min + idxs.map(_._2 + 1).max).toDouble / 2)
      }
    }
    val rx = rank2(rows.map(_._1)); val ry = rank2(rows.map(_._2))
    val xs = rows.map(t => rx(t._1)); val ys = rows.map(t => ry(t._2))
    val n = rows.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val num = n * xs.zip(ys).map(t => t._1 * t._2).sum - sx * sy
    val den = math.sqrt((n * xs.map(v => v * v).sum - sx * sx)
      * (n * ys.map(v => v * v).sum - sy * sy))
    assert(math.abs(rho - num / den) < 1e-6,
      s"rho $rho != brute-force ${num / den}")
  }

  test("w18: islands partition the intervals; coverage matches a sweep") {
    val out = Windows.intervalUnion(spark, sf).collect()
    assert(out.nonEmpty)
    val iv = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"),
        datediff(col("l_shipdate").cast("date"), to_date(lit("1992-01-01")))
          .cast("long").as("s"),
        col("l_quantity").cast("long").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(1) + 3 + r.getLong(2) % 14))
    val bySupp = iv.groupBy(_._1)
    out.foreach { r =>
      val sk = r.getAs[Long]("sk")
      val ivs = bySupp(sk).map(t => (t._2, t._3))
      assert(r.getAs[Long]("n_intervals") == ivs.length.toLong)
      // brute-force day sweep: union of covered integer days
      val days = ivs.flatMap { case (s0, e0) => s0 to e0 }.distinct
      assert(r.getAs[Long]("covered_days") == days.length.toLong,
        s"supplier $sk coverage mismatch")
      // merged islands by the sweep: sorted intervals, count the gaps
      val sorted = ivs.sortBy(identity)
      var islands = 0; var maxE = Long.MinValue
      sorted.foreach { case (s0, e0) =>
        if (s0 > maxE) islands += 1
        maxE = math.max(maxE, e0)
      }
      assert(r.getAs[Long]("n_islands") == islands.toLong)
    }
  }

  test("gr10: r matches a brute-force degree correlation over the edge list") {
    val r = Graph.assortativity(spark, sf).head
    val rv = r.getAs[Double]("r")
    assert(rv >= -1.0 && rv <= 1.0)
    val und = Graph.supportedEdges(spark, sf, 2)
      .collect().map(e => (e.getLong(0), e.getLong(1)))
    val directed = und ++ und.map(e => (e._2, e._1))
    assert(r.getAs[Long]("m") == directed.length.toLong)
    val deg = directed.groupBy(_._1).map { case (k, v) => (k, v.length.toDouble) }
    val pairs = directed.map { case (s0, d0) => (deg(s0), deg(d0)) }
    val m = pairs.length.toDouble
    val (sj, sk2) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val num = m * pairs.map(t => t._1 * t._2).sum - sj * sk2
    val den = math.sqrt((m * pairs.map(t => t._1 * t._1).sum - sj * sj)
      * (m * pairs.map(t => t._2 * t._2).sum - sk2 * sk2))
    assert(math.abs(rv - num / den) < 1e-6, s"r $rv != brute-force ${num / den}")
  }

  test("sim12: codes are in range, ADC approximates the true dot, recall is real") {
    import graft.operators.Similarity
    val codes = graft.sources.VectorIndex.pqIndex(spark, sf,
      Similarity.PqM, Similarity.PqK, Similarity.PqIters, Similarity.PqSubDim)
      .collect()
    val nVec = Tables.embeddings(spark, sf).count()
    assert(codes.length.toLong == nVec * Similarity.PqM,
      "every vector carries exactly PqM codes")
    assert(codes.forall { r =>
      val c = r.getAs[Int]("code"); c >= 0 && c < Similarity.PqK
    })
    val out = Similarity.pqAdcTopK(spark, sf).collect()
    assert(out.nonEmpty)
    // per query: exactly k rows, ranks 1..k
    out.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to rs.length))
    }
    // the ADC score of a top hit must be close to its TRUE dot product
    // (quantization error bound: here just assert the correlation is
    // meaningful — every adc within 50% relative of the true dot)
    val emb = Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    out.foreach { r =>
      val truth = emb(r.getAs[Long]("q_id")).zip(emb(r.getAs[Long]("vec_id")))
        .map { case (a, b) => a.toDouble * b.toDouble }.sum
      val adc = r.getAs[Double]("adc")
      assert(math.abs(adc - truth) <= 0.5 * math.abs(truth) + 0.5,
        s"ADC $adc too far from true dot $truth")
    }
    // the in_exact flag is a real recall signal: at least one PQ top-k
    // hit per run is also in the exact top-k (sanity floor, not a tuning bar)
    assert(out.map(_.getAs[Int]("in_exact")).sum >= 1)
  }

  test("sim13: IVF-PQ hits come from probed cells and score like sim12's ADC") {
    import graft.operators.Similarity
    val out = Similarity.ivfPqTopK(spark, sf).collect()
    assert(out.nonEmpty)
    // scores descend within each query and ranks are consecutive
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val byRk = rs.sortBy(_.getAs[Int]("rk"))
      assert(byRk.map(_.getAs[Int]("rk")).toSeq == (1 to rs.length))
      val scores = byRk.map(_.getAs[Double]("adc"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // the ADC value of a (q, vec) pair is the same number sim12
    // computes — the coarse stage only prunes candidates, never
    // changes scoring
    val full = Similarity.pqAdcTopK(spark, sf, k = 1000000).collect()
      .map(r => ((r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")),
        r.getAs[Double]("adc"))).toMap
    out.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))
      // sim12 excludes query vectors from its corpus; sim13 may rank
      // another query vector (sim4 convention) — skip those
      if (key._2 >= 5)
        assert(full(key) == r.getAs[Double]("adc"),
          s"ADC drift at $key: ${full(key)} vs ${r.getAs[Double]("adc")}")
    }
  }

  test("a38: the CUSUM argmax matches a brute-force scan of all split points") {
    val r = Analytics.changepoint(spark, sf).head
    val daily = Tables.orders(spark, sf)
      .groupBy(date_format(date_trunc("day", col("o_orderdate")),
        "yyyy-MM-dd").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
      .orderBy("day")
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val n = daily.length.toLong
    val total = daily.map(_._2).sum
    var cs = 0L
    val scored = daily.dropRight(1).zipWithIndex.map { case ((day, c), i) =>
      cs += c
      (day, i + 1L, math.abs(n * cs - (i + 1L) * total))
    }
    // maxBy keeps the FIRST maximal element — scored is day-ordered,
    // so ties resolve to the earliest day, matching the operator
    val best = scored.maxBy(_._3)
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("g_stat") == best._3)
    assert(r.getAs[String]("split_day") == best._1)
    assert(r.getAs[Long]("t") == best._2)
    // the two segment means really differ at the chosen split
    assert(r.getAs[Double]("mean_left") != r.getAs[Double]("mean_right"))
  }

  test("sp5: replicate sizes concentrate near n and totals near the true total") {
    import graft.operators.Sampling
    val rows = Sampling.poissonBootstrap(spark, sf).collect()
    assert(rows.length == 8)
    val n = rows.head.getAs[Long]("n_orders")
    val trueTotal = Tables.orders(spark, sf)
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))).head.getLong(0)
    rows.foreach { r =>
      val nEff = r.getAs[Long]("n_eff")
      // Poisson(1) resample size: n ± ~√n; allow 6σ
      assert(math.abs(nEff - n) <= 6 * math.sqrt(n.toDouble) + 1,
        s"replicate size $nEff too far from $n")
      val boot = r.getAs[Long]("boot_cents")
      assert(math.abs(boot - trueTotal).toDouble / trueTotal < 0.25,
        s"replicate total $boot too far from $trueTotal")
    }
    // replicates differ from each other (the hash really varies by rep)
    assert(rows.map(_.getAs[Long]("boot_cents")).distinct.length > 1)
  }

  test("a39: RFM scores are 1..5, customers conserved, ntile buckets balanced") {
    val rows = Analytics.rfmSegments(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val v = r.getAs[Int](c); assert(v >= 1 && v <= 5)
      }
    }
    val nCust = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == nCust)
    // each r_score bucket holds n/5 ± 1 customers (ntile balance)
    val byR = rows.groupBy(_.getAs[Int]("r_score"))
      .map { case (k, v) => (k, v.map(_.getAs[Long]("n_customers")).sum) }
    assert(byR.keySet == Set(1, 2, 3, 4, 5))
    byR.values.foreach(c => assert(math.abs(c - nCust / 5.0) <= 1.0))
  }

  test("gr11: rules are confident and lifted consistently with raw counts") {
    val rows = Graph.associationRules(spark, sf).collect()
    assert(rows.nonEmpty)
    val nBaskets = Tables.lineitem(spark, sf)
      .select("l_orderkey").distinct().count()
    rows.foreach { r =>
      val (pn, an, cn) = (r.getAs[Long]("pair_n"), r.getAs[Long]("ante_n"),
        r.getAs[Long]("cons_n"))
      assert(pn >= 3 && pn <= an && pn <= cn)
      val conf = r.getAs[Double]("confidence")
      assert(math.abs(conf - pn.toDouble / an) < 1e-6)
      val lift = r.getAs[Double]("lift")
      assert(math.abs(lift - pn.toDouble * nBaskets / (an.toDouble * cn)) < 1e-4)
      assert(lift > 1.0, "top-ranked rules must be positively associated")
    }
    // lifts descend
    val lifts = rows.map(_.getAs[Double]("lift"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
  }

  test("tx23: divergence sign matches the leaning source; chi2 recomputes") {
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.sourceDivergence(spark, sf).collect()
    assert(rows.nonEmpty)
    val Seq(na, nb) = {
      val t = Tables.documents(spark, sf)
        .filter(col("source").isin("src0", "src1"))
        .select(col("source"), explode(split(col("text"), " ")).as("tk"))
        .groupBy("source").agg(count(lit(1)).as("n"))
        .collect().sortBy(_.getString(0)).map(_.getLong(1)).toSeq
      t
    }
    rows.foreach { r =>
      val (oa, ob, d) = (r.getAs[Long]("oa"), r.getAs[Long]("ob"),
        r.getAs[Long]("dcross"))
      assert(d == oa * nb - ob * na, "cross statistic mismatch")
      // sign convention: d > 0 ⇒ the token is relatively more frequent
      // in source A (oa/na > ob/nb)
      if (d > 0) assert(oa.toDouble / na > ob.toDouble / nb)
      if (d < 0) assert(oa.toDouble / na < ob.toDouble / nb)
      val nn = (na + nb).toDouble
      val chi2 = nn * d.toDouble * d.toDouble /
        (na.toDouble * nb.toDouble * (oa + ob) * (nn - oa - ob))
      assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-5)
    }
  }

  test("gr12: HITS scores are L1-normalized to ~scale and sides are disjoint") {
    val rows = Graph.hits(spark, sf).collect()
    assert(rows.nonEmpty)
    val hubs = rows.filter(_.getAs[String]("kind") == "hub")
    val auths = rows.filter(_.getAs[String]("kind") == "auth")
    assert(hubs.nonEmpty && auths.nonEmpty)
    // bipartite: the same node id never appears on both sides
    assert(hubs.map(_.getAs[Long]("node")).toSet
      .intersect(auths.map(_.getAs[Long]("node")).toSet).isEmpty)
    // integer-div L1 normalization: the truncated divisor (tot div
    // scale) makes per-row quotients slightly LARGE, so the total can
    // overshoot scale by ~scale²/tot — bound it at ±10%
    val scale = 1000000000L
    Seq(hubs, auths).foreach { side =>
      val tot = side.map(_.getAs[Long]("score")).sum
      assert(tot <= scale * 11 / 10, s"normalized total $tot far above scale")
      assert(tot > scale / 2, s"normalized total $tot collapsed")
    }
    assert(rows.forall(_.getAs[Long]("score") >= 0L))
  }

  test("a41: Theil-Sen slope is the exact median of all pairwise slopes") {
    val r = Analytics.theilSen(spark, sf).head
    val monthly = Tables.orders(spark, sf)
      .groupBy(((year(col("o_orderdate")) - 1992) * 12
        + month(col("o_orderdate")) - 1).cast("long").as("x"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
    val slopes = (for {
      (a, i) <- monthly.zipWithIndex; b <- monthly.drop(i + 1)
    } yield (b._2 - a._2).toDouble / (b._1 - a._1)).sorted
    assert(r.getAs[Long]("n_months") == monthly.length.toLong)
    assert(r.getAs[Long]("n_pairs") == slopes.length.toLong)
    val med = slopes((slopes.length + 1) / 2 - 1) // lower median, 1-based
    assert(math.abs(r.getAs[Double]("slope_cents_per_month") - med) < 1e-6)
    // intercept is the median residual against that slope, whole cents
    val resid = monthly.map { case (x, c) => c.toDouble - med * x }.sorted
    val medR = resid((resid.length + 1) / 2 - 1)
    assert(r.getAs[Long]("intercept_cents") == math.floor(medR + 0.5).toLong)
  }

  test("dp16: negatives are reproducible, non-near-dup, hash-priority-ordered") {
    import graft.operators.DataPrep
    val rows = DataPrep.contrastiveNegatives(spark, sf).collect()
    assert(rows.nonEmpty)
    // every emitted negative clears the near-dup gate
    assert(rows.forall(_.getAs[Double]("cos_sim") < 0.3))
    // per anchor: ranks consecutive from 1, at most k
    rows.groupBy(_.getAs[Long]("a_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to rs.length))
      assert(rs.length <= 4)
    }
    // reproducible: a second run is identical
    val again = DataPrep.contrastiveNegatives(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // the priority really is the md5-uniform: recompute one anchor's
    // shortlist by brute force and check the chosen ids are a prefix
    // of the hash order after the cosine gate
    val aId = rows.head.getAs[Long]("a_id")
    val negIds = rows.filter(_.getAs[Long]("a_id") == aId)
      .sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("neg_id")).toSeq
    val cand = Tables.embeddings(spark, sf)
      .filter(col("vec_id") >= 6).select("vec_id").collect().map(_.getLong(0))
    def u32(a: Long, c: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest((a * 1000000L + c).toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
    }
    val hashOrder = cand.map(c => (u32(aId, c), c)).sorted.map(_._2).take(8)
    assert(negIds.forall(hashOrder.contains),
      s"negatives $negIds not drawn from the 8 smallest priorities $hashOrder")
  }

  test("st8: batch attribution equals the streamed interval join on the same events") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect()
    val clicks = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val purchases = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    def named(df: org.apache.spark.sql.DataFrame) = df
      .toDF("event_id", "ts", "user_id", "value")
    val q = graft.streaming.Streams.purchaseAttribution(
        named(clicks.toDF()), named(purchases.toDF()))
      .writeStream.format("memory").queryName("st8eq").outputMode("append").start()
    try {
      def tup(t: String) = ev.filter(_.getAs[String]("event_type") == t)
        .map(r => (r.getAs[Long]("event_id"), r.getAs[java.sql.Timestamp]("ts"),
          r.getAs[Long]("user_id"), r.getAs[Double]("value")))
      clicks.addData(tup("click").toSeq)
      purchases.addData(tup("purchase").toSeq)
      q.processAllAvailable()
      val streamed = spark.table("st8eq")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val batch = Analytics.attribution(spark, sf)
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(streamed == batch,
        s"stream/batch divergence: ${streamed.size} vs ${batch.size} rows")
      assert(batch.nonEmpty)
    } finally q.stop()
  }
}
