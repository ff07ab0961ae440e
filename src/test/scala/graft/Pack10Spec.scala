package graft

import graft.operators.{Analytics, DataQuality, Similarity}
import org.apache.spark.sql.functions._

/** Round-6 pack: hybrid retrieval fusion, the data-quality/privacy
  * audit family, and autocorrelation.
  */
class Pack10Spec extends SparkTestBase {

  test("sim14: rrf is exactly the fusion of the leg ranks; order is (rrf, id)") {
    val rows = Similarity.hybridRrf(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val rl = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val rs = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(rl.isDefined || rs.isDefined, "a fused doc must appear in a leg")
      val expect = rl.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rs.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getDouble(3) - expect) < 1e-6,
        s"rrf must equal the rank fusion for doc ${r.getLong(0)}")
    }
    val rrfs = rows.map(r => (r.getDouble(3), r.getLong(0)))
    assert(rrfs.sameElements(rrfs.sortBy { case (v, id) => (-v, id) }),
      "output must be ordered by (rrf DESC, doc_id ASC)")
  }

  test("sim14: a doc ranked #1 in both legs dominates the fusion ceiling") {
    val best = Similarity.hybridRrf(spark, sf).collect().head.getDouble(3)
    assert(best <= 2.0 / 61 + 1e-9, "rrf is bounded by two rank-1 terms")
  }

  test("dq1: profile row per column, exact distincts bounded, completeness exact") {
    val rows = DataQuality.profile(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == Set("o_orderkey", "o_custkey",
      "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"))
    val n = rows.head.getLong(1)
    rows.foreach { r =>
      assert(r.getLong(1) == n, "one scan: all columns see the same row count")
      assert(r.getLong(3) <= n - r.getLong(2),
        "distinct count is bounded by non-null rows")
      assert(r.getDouble(4) ==
        BigDecimal(1.0 - r.getLong(2).toDouble / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val key = rows.find(_.getString(0) == "o_orderkey").get
    assert(key.getLong(3) == n - key.getLong(2),
      "o_orderkey must profile as unique")
  }

  test("dq2: uniqueness/referential/domain rules hold; checked counts match tables") {
    val m = DataQuality.constraints(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val nOrders = Tables.orders(spark, sf).count()
    val nLines = Tables.lineitem(spark, sf).count()
    assert(m("o_orderkey_unique") == ((0L, nOrders)))
    assert(m("orders_custkey_in_customer") == ((0L, nOrders)))
    assert(m("l_quantity_in_1_50")._1 == 0L)
    assert(m("l_quantity_in_1_50")._2 == nLines)
    assert(m("o_totalprice_positive")._1 == 0L)
    // the synthetic generator draws ship dates independently of order
    // dates, so the temporal rule FIRES — the audit's job is to report
    // it, not to hide it
    assert(m("l_shipdate_not_before_orderdate")._2 == nLines)
  }

  test("dq3: flagged buckets are exactly the mutated docs' buckets, counts equal") {
    val flagged = DataQuality.bucketDiff(spark, sf).collect()
    val mutBuckets = Tables.documents(spark, sf)
      .filter(col("doc_id") % 97 === 0)
      .select((col("doc_id") % 64).as("b")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(flagged.map(_.getLong(0)).toSet == mutBuckets,
      "digest diff must localize exactly the mutated buckets")
    flagged.foreach { r =>
      assert(r.getLong(1) == r.getLong(3),
        "membership unchanged: only content digests differ")
      assert(r.getLong(2) != r.getLong(4))
    }
  }

  test("pv2: reported groups are segment-homogeneous below l; recount agrees") {
    val rows = DataQuality.lDiversity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(3) < 3 && r.getLong(3) >= 1 &&
      r.getLong(3) <= r.getLong(2)))
    val r0 = rows.head
    val recount = Tables.customer(spark, sf)
      .filter(col("c_nationkey") === r0.getInt(0) &&
        floor(col("c_acctbal") / 1000.0).cast("long") === r0.getLong(1))
      .select("c_mktsegment").distinct().count()
    assert(recount == r0.getLong(3))
  }

  test("pv1: every reported group is below k and matches a recount") {
    val rows = DataQuality.kAnonymity(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(3) < 5))
    val r0 = rows.head
    val recount = Tables.customer(spark, sf)
      .filter(col("c_nationkey") === r0.getInt(0) &&
        col("c_mktsegment") === r0.getString(1) &&
        floor(col("c_acctbal") / 1000.0).cast("long") === r0.getLong(2))
      .count()
    assert(recount == r0.getLong(3))
  }

  test("dq4: PSI matches a from-scratch recompute and is non-negative") {
    val got = DataQuality.psiDrift(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == Set("totalprice_bucket", "orderpriority"))
    val os = Tables.orders(spark, sf)
      .select(month(col("o_orderdate")).as("m"),
        col("o_totalprice"), col("o_orderpriority"))
      .collect()
    def brute(pairs: Seq[(String, Boolean)]): (Double, Long, Long, Long) = {
      val by = pairs.groupBy(_._1).map { case (b, xs) =>
        b -> (xs.count(_._2).toLong, xs.count(!_._2).toLong)
      }
      val ta = by.values.map(_._1).sum.toDouble
      val tb = by.values.map(_._2).sum.toDouble
      val c9 = by.values.map { case (na, nb) =>
        if (na > 0 && nb > 0) {
          val pa = na / ta; val pb = nb / tb
          math.round((pa - pb) * math.log(pa / pb) * 1e9)
        } else 0L
      }.sum
      val psi = BigDecimal(c9.toDouble / 1e9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (psi, by.size.toLong, by.values.count(_._2 == 0L).toLong,
        by.values.count(_._1 == 0L).toLong)
    }
    val price = brute(os.toSeq.map(r =>
      (math.floor(r.getDouble(1) / 25000.0).toLong.toString,
        r.getInt(0) <= 6)))
    val prio = brute(os.toSeq.map(r => (r.getString(2), r.getInt(0) <= 6)))
    assert(got("totalprice_bucket") == price,
      s"${got("totalprice_bucket")} != $price")
    assert(got("orderpriority") == prio)
    // (p_a − p_b) and ln(p_a/p_b) always share a sign — PSI can't go
    // negative; a negative value means the formula broke
    got.values.foreach { case (psi, _, _, _) => assert(psi >= 0.0) }
  }

  test("pv3: Laplace release is deterministic, bounded, and actually noisy") {
    val a = DataQuality.dpNoisyCounts(spark, sf).collect()
    val b = DataQuality.dpNoisyCounts(spark, sf).collect()
    assert(a.nonEmpty && a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "keyed-uniform draws must make the release reproducible")
    a.foreach { r =>
      val noise = r.getAs[Double]("n_noisy") - r.getAs[Long]("n_true")
      // the 32-bit keyed uniform floors the tail at 1/2^32, so
      // |noise| <= b·ln(2^32) = 2·ln(2^32) ≈ 44.4; anything bigger
      // means the transform broke
      assert(math.abs(noise) <= 44.4, s"noise $noise out of range")
      assert(r.getAs[Double]("epsilon") == 0.5)
    }
    // noise must not be degenerate: some release differs from truth
    assert(a.exists(r =>
      r.getAs[Double]("n_noisy") != r.getAs[Long]("n_true").toDouble))
  }

  test("sim15: every hit carries the filter label; rank is computed post-gate") {
    val rows = Similarity.lshAnnFiltered(spark, sf).collect()
    assert(rows.nonEmpty)
    val labels = Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach(r => assert(labels(r.getLong(1)) == 7,
      s"vec ${r.getLong(1)} leaked through the label gate"))
    // ranks are dense per query starting at 1 (computed AMONG eligible
    // candidates, not filtered out of a global ranking)
    rows.groupBy(_.getLong(0)).values.foreach { qs =>
      assert(qs.map(_.getInt(3)).sorted.toSeq == (1 to qs.length))
    }
    // and the gate binds: the unfiltered probe returns non-7 hits
    val unfiltered = Similarity.lshAnn(spark, sf).collect()
    assert(unfiltered.exists(r => labels(r.getLong(1)) != 7),
      "test premise: sim3's candidates are not all label 7")
  }

  test("dd20: tier is the worst hit, docs are eval-side, legs agree with dd9") {
    import graft.operators.Dedup
    // loosen the gram leg so tier 2 is exercised on the synthetic
    // corpus (default minShared=5 yields semantic-only hits there)
    val rows = Dedup.contaminationTiers(spark, sf, minShared = 1).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 97 == 0, "only eval docs may be reported")
      val (ne, nn, ns, tier) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))
      val expect = if (nn > 0) 3 else if (ne > 0) 2 else if (ns > 0) 1 else 0
      assert(tier == expect && tier > 0)
    }
    assert(rows.exists(_.getInt(4) == 2),
      "minShared=1 must surface gram-overlap (tier 2) hits")
    // the exact leg must agree with dd9's decontamination counts
    val dd9 = Dedup.decontaminate(spark, sf).collect()
      .groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    val reported = rows.filter(_.getLong(1) > 0)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reported == dd9.map { case (k, v) => k -> v.toLong },
      "tier-2 counts must equal dd9's per-eval-doc partner counts")
  }

  test("a43: trim keeps exactly n - 2*floor(n*5/100); means agree with a recount") {
    val rows = Analytics.trimmedStats(spark, sf).collect()
    assert(rows.nonEmpty)
    val cents = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).sorted).toMap
    rows.foreach { r =>
      val (pr, n, kept) = (r.getString(0), r.getLong(1), r.getLong(2))
      val lo = n * 5 / 100
      assert(kept == n - 2 * lo)
      val xs = cents(pr)
      assert(n == xs.length)
      val trimmed = xs.slice(lo.toInt, (n - lo).toInt)
      val expect = BigDecimal(trimmed.map(BigDecimal(_)).sum.toDouble
        / trimmed.length / 100.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - expect) < 1e-6,
        s"trimmed mean mismatch for $pr")
      // winsorized mean is pinned between the clamp bounds
      assert(r.getDouble(4) >= trimmed.head / 100.0 &&
        r.getDouble(4) <= trimmed.last / 100.0)
    }
  }

  test("a44: seven dow rows cover every day; revenue-weighted index centers on 1") {
    val rows = Analytics.dowSeasonality(spark, sf).collect()
    assert(rows.map(_.getInt(0)).sorted.toSeq == (0 to 6))
    val days = Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate"))).distinct().count()
    assert(rows.map(_.getLong(1)).sum == days)
    // mean of per-dow indices weighted by day counts is 1 by identity
    val weighted = rows.map(r => r.getDouble(2) * r.getLong(1)).sum / days
    assert(math.abs(weighted - 1.0) < 1e-3)
  }

  test("j10: every purchase appears once; state is the last prior non-purchase type") {
    import graft.operators.Relational
    val rows = Relational.pointInTimeJoin(spark, sf).collect()
    val events = Tables.events(spark, sf)
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3)))
    val purchases = events.filter(_._4 == "purchase")
    assert(rows.length == purchases.length,
      "point-in-time join must keep exactly one row per fact")
    val byUser = events.filter(_._4 != "purchase").groupBy(_._1)
    val expected = purchases.map { case (u, id, t, _) =>
      val prior = byUser.getOrElse(u, Array.empty)
        .filter(e => e._3.compareTo(t) <= 0)
      // the dimension's state at t = type of the latest change row
      // whose interval contains t = type of the latest event <= t.
      // Timestamp.compareTo keeps sub-millisecond precision (getTime
      // would truncate micros and could misorder same-ms events)
      id -> prior.sortWith { (a, b) =>
        val c = a._3.compareTo(b._3); c < 0 || (c == 0 && a._2 < b._2)
      }.lastOption.map(_._4)
    }.toMap
    rows.foreach { r =>
      val got = if (r.isNullAt(3)) None else Some(r.getString(3))
      assert(got == expected(r.getLong(0)),
        s"state mismatch for purchase ${r.getLong(0)}")
    }
    assert(rows.exists(!_.isNullAt(3)), "some purchase must find a state")
  }

  test("dp18: funnel is monotone and its tail equals the corpus-select survivors") {
    import graft.operators.{Dedup, Pipeline}
    val rows = Pipeline.filterFunnel(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("1_lang_en",
      "2_length_20_2000", "3_quality_floor", "4_near_dup_drop"))
    // chained: stage k's docs_in == stage k-1's docs_out; never grows
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(1) == a.getLong(2)); case _ => }
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    // the funnel's tail IS dp11's survivor count (same stages, same
    // LSH pair source) — the report and the selection cannot drift
    val survivors = Pipeline.corpusSelectFrom(spark, sf,
      Dedup.minhashLshPairsRaw(spark, sf)).count()
    assert(rows.last.getLong(2) == survivors)
  }

  test("a46: z recomputes from the exact counts; buckets partition the users") {
    val r = Analytics.abTest(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val (na, ca, nb, cb) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3))
    assert(na + nb ==
      Tables.events(spark, sf).select("user_id").distinct().count())
    assert(ca <= na && cb <= nb && ca > 0 && cb > 0,
      "conversion must be non-degenerate at every SF or z is undefined")
    val (pa, pb) = (ca.toDouble / na, cb.toDouble / nb)
    val pool = (ca + cb).toDouble / (na + nb)
    val z = (pa - pb) / math.sqrt(pool * (1 - pool) * (1.0 / na + 1.0 / nb))
    assert(math.abs(row.getDouble(6) - z) < 1e-5)
    assert(row.getBoolean(7) == (math.abs(z) > 1.96))
  }

  test("gr14: modularity recomputes from its exact integer columns and is bounded") {
    import graft.operators.Graph
    val row = Graph.modularity(spark, sf).collect().head
    val (nc, e, intra, degsq, q) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getDouble(4))
    assert(nc >= 1 && intra <= e && degsq >= e,
      "every community holds at least its own internal degree mass")
    val expect = (e.toDouble * intra - degsq) / (e.toDouble * e)
    assert(math.abs(q - expect) < 1e-5)
    assert(q >= -0.5 && q <= 1.0, "modularity is bounded")
  }

  test("dp19: plan rows decompose exactly; totals respect the budget") {
    import graft.operators.DataPrep
    val rows = DataPrep.tokenBudget(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      val (n, target, reps, rem) = (r.getLong(1), r.getLong(3),
        r.getLong(4), r.getLong(5))
      assert(target == reps * n + rem && rem >= 0 && rem < n,
        "target must decompose into full epochs + remainder")
      assert(math.abs(r.getDouble(6) - target.toDouble / n) < 1e-3)
    }
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-3,
      "shares must sum to 1")
    val planned = rows.map(_.getLong(3)).sum
    assert(planned <= 2 * total && planned > 2 * total - 2L * rows.length,
      "floor-rounding loses < 1 token per source off the 2x budget")
    // temperature flattening: the smallest source gets the largest
    // epoch multiplier
    val byTokens = rows.sortBy(_.getLong(1))
    assert(byTokens.head.getDouble(6) >= byTokens.last.getDouble(6))
  }

  test("a45: candles are internally consistent (low <= open/close <= high)") {
    val rows = Analytics.ohlcBars(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (o, h, l, c, n, v) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))
      assert(l <= o && o <= h && l <= c && c <= h)
      assert(n >= 1 && v >= n * l && v <= n * h)
    }
    assert(rows.map(_.getLong(5)).sum == Tables.orders(spark, sf).count())
  }

  test("sq5: held-out scoring is consistent and the split leaks nothing") {
    import graft.operators.DataPrep
    val rows = DataPrep.markovBacktest(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ne, nc, acc) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nc <= ne && ne > 0)
      assert(math.abs(acc - nc.toDouble / ne) < 1e-6)
    }
    // all transitions are either trained on or evaluated — the per-
    // state eval counts must sum to the transitions in the last 20%
    // of the time range
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val tr = Tables.events(spark, sf)
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .select(unix_micros(col("ts")).as("tsu"))
    val Array(lo, hi) = tr.agg(min(col("tsu")), max(col("tsu"))).head
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val cut = lo + (hi - lo) * 4 / 5
    assert(rows.map(_.getLong(1)).sum == tr.filter(col("tsu") >= cut).count())
  }

  test("w20: rolling correlation bounded in [-1,1] over full frames only") {
    import graft.operators.Windows
    val rows = Windows.rollingCorrelation(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(1)) {
        val c = r.getDouble(1)
        assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      }
    }
    // full frames only: the emitted day count is (joined days − 29)
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, sf)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
        .as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val joined = daily.filter(col("event_type") === "click").select("day")
      .join(daily.filter(col("event_type") === "purchase").select("day"),
        "day").count()
    assert(rows.length == math.max(0L, joined - 29).toInt)
  }

  test("tx24: confusion cells partition the corpus; recalls sum to 1 per actual") {
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.langIdConfusion(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(2)).sum ==
      Tables.documents(spark, sf).count(),
      "every document lands in exactly one confusion cell")
    rows.groupBy(_.getString(0)).values.foreach { cells =>
      assert(math.abs(cells.map(_.getDouble(3)).sum - 1.0) < 1e-3,
        "per-actual recalls partition to 1")
    }
    // cross-check one cell against the per-doc prediction relation
    val perDoc = TextAnalysis.langId(spark, sf).collect()
    val cell0 = rows.head
    assert(cell0.getLong(2) == perDoc.count(r =>
      r.getString(1) == cell0.getString(0) &&
        r.getString(2) == cell0.getString(1)))
  }

  test("dp20: the card's selected count equals the funnel tail and the survivors") {
    import graft.operators.{Dedup, Pipeline}
    val card = Pipeline.datasetCard(spark, sf).collect().head
    assert(card.getLong(0) == Tables.documents(spark, sf).count())
    val funnelTail = Pipeline.filterFunnel(spark, sf).collect()
      .last.getLong(2)
    assert(card.getLong(1) == funnelTail,
      "card and funnel must report the same selection")
    val survivors = Pipeline.corpusSelectFrom(spark, sf,
      Dedup.minhashLshPairsRaw(spark, sf)).collect()
    assert(card.getLong(2) == survivors.map(_.getInt(2).toLong).sum,
      "token total must recount from the survivor rows")
    assert(card.getDouble(4) >= 0.55 && card.getDouble(4) <= 1.0,
      "mean selected quality cannot be below the floor")
    assert(card.getDouble(5) >= 0.0 && card.getDouble(5) < 1.0)
  }

  test("a47: HHI bounded between uniform floor 10000/n and monopoly 10000") {
    val rows = Analytics.hhi(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, h) = (r.getLong(1), r.getDouble(2))
      assert(h >= 10000.0 / n - 1e-6 && h <= 10000.0 + 1e-6,
        s"HHI $h out of [10000/$n, 10000]")
    }
  }

  test("j12: interleaved mixed-unit as-of exercises both branches, matches never postdate") {
    import org.apache.spark.sql.functions.{col, date_add, lit, to_date}
    val out = graft.operators.Relational.asofPromo(spark, sf)
    val n = out.count()
    val nulls = out.filter(col("promo_order_key").isNull).count()
    assert(n > 0 && nulls > 0 && nulls < n,
      s"need both branches at corpus scale (n=$n, nulls=$nulls)")
    // semantic invariant the oracle hash can't state directly: every
    // matched promotion's date is at-or-before its event's timestamp —
    // exactly the comparison a raw days-vs-micros compare gets wrong
    val promoDate = date_add(to_date(lit("2023-12-18")),
      (col("promo_order_key") % 50).cast("int"))
    val late = out.join(Tables.events(spark, sf), Seq("event_id"))
      .filter(col("promo_order_key").isNotNull)
      .filter(promoDate.cast("timestamp") > col("ts"))
    assert(late.count() == 0, "a matched promotion postdates its event")
  }

  test("dd22: coverage in (0,1], boiler grams bounded, top rows sorted") {
    val rows = graft.operators.Dedup.boilerplateCoverage(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ng, nb, cov) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nb >= 1 && nb <= ng, s"boiler count out of range: $r")
      assert(cov > 0.0 && cov <= 1.0, s"coverage out of range: $r")
    }
    val covs = rows.map(_.getDouble(3)).toSeq
    assert(covs == covs.sorted.reverse, "rows must sort by coverage desc")
  }

  test("mm9: both formats profiled, doc counts partition the corpus") {
    val rows = graft.operators.Multimodal.mimeProfile(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("image/jpeg", "image/png"))
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total,
      "every document must decode into exactly one format bucket")
    rows.foreach(r => assert(r.getLong(2) > 0 && r.getLong(3) > 0))
  }

  test("j13/j14: forward matches never predate; nearest is at least as close as either side") {
    import org.apache.spark.sql.functions.{abs => cabs, coalesce, date_add, lit, to_date, unix_micros}
    def promoTs(keyCol: org.apache.spark.sql.Column) =
      date_add(to_date(lit("2023-12-18")), (keyCol % 50).cast("int"))
        .cast("timestamp")
    val ev = Tables.events(spark, sf)
    val fwd = graft.operators.Relational.asofForward(spark, sf)
    val lateF = fwd.join(ev, Seq("event_id"))
      .filter(col("next_promo_key").isNotNull)
      .filter(promoTs(col("next_promo_key")) < col("ts"))
    assert(lateF.count() == 0, "a forward match predates its event")
    // nearest must be no farther than the one-sided matches
    val near = graft.operators.Relational.asofNearest(spark, sf)
      .withColumnRenamed("near_promo_key", "nk")
    val back = graft.operators.Relational.asofPromo(spark, sf)
      .withColumnRenamed("promo_order_key", "bk").select("event_id", "bk")
    val huge = lit(Long.MaxValue)
    val joinedAll = near.join(fwd.select("event_id", "next_promo_key"), Seq("event_id"))
      .join(back, Seq("event_id")).join(ev, Seq("event_id"))
      .withColumn("dn", coalesce(cabs(unix_micros(promoTs(col("nk")))
        - unix_micros(col("ts"))), huge))
      .withColumn("df_", coalesce(cabs(unix_micros(promoTs(col("next_promo_key")))
        - unix_micros(col("ts"))), huge))
      .withColumn("db", coalesce(cabs(unix_micros(promoTs(col("bk")))
        - unix_micros(col("ts"))), huge))
    assert(joinedAll.filter(col("dn") > col("df_") || col("dn") > col("db"))
      .count() == 0, "nearest must dominate both one-sided matches")
  }

  test("sp6: systematic sample is exactly every 97th key in global order") {
    val rows = graft.operators.Sampling.systematic(spark, sf).collect()
    val n = Tables.orders(spark, sf).count()
    assert(rows.length == ((n - 1) / 97 + 1).toInt,
      "exact 1/step rate: one pick per stride")
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i.toLong * 97 + 1, s"rank stride broken at $i")
    }
    // replay the selection exactly: rank = position in the sorted keys
    val keys = Tables.orders(spark, sf).select("o_orderkey")
      .collect().map(_.getLong(0)).sorted
    val expect = keys.indices.collect { case i if i % 97 == 0 => keys(i) }
    assert(rows.map(_.getLong(1)).toSeq == expect.toSeq,
      "sampled keys must be the every-97th elements of the total order")
  }

  test("tx25: spectrum statistics match a local replay; shares bounded") {
    val rows = graft.operators.TextAnalysis.lexicalDiversity(spark, sf)
      .collect()
    val srcs = rows.map(_.getString(0)).toSeq
    assert(srcs == srcs.sorted && srcs.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0,
        s"simpson out of (0,1]: $r")
      assert(r.getDouble(4) > 0.0, s"yule_k must be positive: $r")
    }
    // exact replay for one source from the raw text
    val src = srcs.head
    val freq = Tables.documents(spark, sf).filter(col("source") === src)
      .select("text").collect().iterator
      .flatMap(_.getString(0).split(" ", -1))
      .foldLeft(Map.empty[String, Long]) { (m, t) =>
        m.updated(t, m.getOrElse(t, 0L) + 1L)
      }
    val bigN = freq.values.sum
    val rep = freq.values.map(v => v * (v - 1)).sum
    val sq = freq.values.map(v => v * v).sum
    val row = rows.find(_.getString(0) == src).get
    assert(row.getLong(1) == bigN && row.getLong(2) == freq.size)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getDouble(3) == r6(rep.toDouble / (bigN * (bigN - 1)).toDouble))
    assert(row.getDouble(4) ==
      r4(10000.0 * (sq - bigN).toDouble / (bigN * bigN).toDouble))
  }

  test("tx26: per-doc NLL matches a local replay; non-negative everywhere") {
    val rows = graft.operators.TextAnalysis.perplexityScore(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(3) >= 0.0,
      s"n_ctx >= n_tri makes every term non-negative: $r"))
    // full local replay of the LM and the scoring chain
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(2)))
    val tris = docs.flatMap { case (id, tx) =>
      val ws = tx.split(" ", -1)
      if (ws.length < 3) Seq.empty
      else (0 to ws.length - 3).map(i => (id, (ws(i), ws(i + 1), ws(i + 2))))
    }
    val triCnt = tris.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val ctxCnt = triCnt.toSeq.groupBy { case ((a, b, _), _) => (a, b) }
      .map { case (k, v) => k -> v.map(_._2).sum }
    val byDoc = tris.groupBy(_._1)
    rows.take(5).foreach { r =>
      val terms = byDoc(r.getLong(0)).map { case (_, t) =>
        math.log(ctxCnt((t._1, t._2)).toDouble) - math.log(triCnt(t).toDouble)
      }
      assert(r.getLong(2) == terms.size, s"trigram count off for $r")
      // local summation order differs from Spark's partial aggs; agree
      // within the 4dp rounding half-width
      assert(math.abs(r.getDouble(3) - terms.sum / terms.size) <= 5.1e-5,
        s"NLL replay off for $r")
    }
  }

  test("a48: CUPED preserves the contrast frame and matches a local replay") {
    val rows = Analytics.cupedAbTest(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L), "one row per arm")
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == users, "every user lands in an arm")
    // local replay: per-user pre/post sums, pooled theta, adjusted means
    val pu = Tables.events(spark, sf)
      .select(col("user_id"), dayofmonth(col("ts")).as("dom"), col("value"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, rs) =>
        (u, rs.filter(_.getInt(1) <= 15).map(_.getDouble(2)).sum,
          rs.filter(_.getInt(1) > 15).map(_.getDouble(2)).sum)
      }.toSeq
    val n = pu.size.toDouble
    val (sx, sy) = (pu.map(_._2).sum, pu.map(_._3).sum)
    val sxy = pu.map(r => r._2 * r._3).sum
    val sxx = pu.map(r => r._2 * r._2).sum
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val xbar = sx / n
    rows.foreach { r =>
      val arm = pu.filter(_._1 % 2 == r.getLong(0))
      val my = arm.map(_._3).sum / arm.size
      val mya = arm.map(t => t._3 - theta * (t._2 - xbar)).sum / arm.size
      assert(math.abs(r.getDouble(2) - my) <= 5.1e-5, s"mean_y replay: $r")
      assert(math.abs(r.getDouble(3) - mya) <= 5.1e-5, s"cuped replay: $r")
      // CUPED shifts the mean by theta * (arm pre-mean - pooled pre-mean);
      // with both arms populated the reduction is a ratio in (-inf, 1]
      assert(r.getDouble(4) <= 1.0, s"var reduction bounded above: $r")
    }
  }

  test("dp22: quota respected per cluster, sample is a subset of the assignment") {
    val quota = 40
    val rows = graft.operators.DataPrep
      .clusterBalancedSample(spark, sf, 4, quota).collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getInt(0))
    val sizes = Similarity.nearestCentroid(spark, sf, 4).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    byCluster.foreach { case (c, rs) =>
      assert(rs.length == math.min(quota.toLong, sizes(c)),
        s"cluster $c must fill min(quota, members)")
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length),
        s"ranks in cluster $c must be the 1..n prefix")
    }
    val ids = rows.map(_.getLong(2))
    assert(ids.distinct.length == ids.length, "a vector is sampled once")
  }

  test("sim16: refine reranks within the ADC shortlist and never loses to stage one") {
    val k = 3
    val rows = Similarity.pqRefineTopK(spark, sf, 5, k, 12).collect()
    assert(rows.length == 5 * k, "k rows per query")
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to k), s"ranks 1..k for $q")
      val dots = rs.sortBy(_.getInt(2)).map(_.getDouble(4))
      assert(dots.zip(dots.tail).forall { case (a, b) => a >= b },
        s"exact dot must descend with rank for $q")
      rs.foreach(r => assert(r.getInt(3) >= 1 && r.getInt(3) <= 12,
        s"candidates come from the shortlist: $r"))
      rs.foreach(r => assert(r.getBoolean(5) == (r.getInt(2) != r.getInt(3)),
        s"reordered flag must equal rank-change: $r"))
    }
    // refinement can only improve the served top-1: its exact dot is
    // >= the exact dot of stage one's ADC-rank-1 candidate
    val adc1 = Similarity.pqAdcTopK(spark, sf, 5, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.map(i => a(i) * b(i)).sum
    rows.filter(_.getInt(2) == 1).foreach { r =>
      val q = r.getLong(0)
      val stage1 = dot(e(q), e(adc1(q)))
      // dot column is rounded to 6dp; compare within its half-width
      assert(r.getDouble(4) >= stage1 - 5.1e-7,
        s"refined top-1 must dominate the unrefined pick for $q")
    }
  }

  test("pv4: RR conserves mass and the debiased estimate is near truth") {
    val rows = DataQuality.randomizedResponse(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("click", "error", "purchase", "signup", "view"))
    val (nt, nr) = (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
    assert(nt == nr, "RR permutes contributions; totals must be conserved")
    // debiasing is exactly unbiased in expectation; on a finite corpus
    // the estimate sits within a few binomial sd of truth. sd of
    // n_reported is <= sqrt(N)/2; the (p-q) divisor (~0.28 at eps=1,
    // K=5) inflates it — 8 * sqrt(N) is a generous deterministic bound
    val bound = 8.0 * math.sqrt(nt.toDouble)
    rows.foreach(r => assert(math.abs(r.getDouble(4) - r.getLong(1)) <= bound,
      s"debiased estimate implausibly far from truth: $r"))
    // estimates must also sum back to ~N (the debias map is affine)
    assert(math.abs(rows.map(_.getDouble(4)).sum - nt) <= 0.01 * nt + 5,
      "affine debias must conserve total mass up to rounding")
  }

  test("dq5: split sizes add up and self-consistency of ratios holds") {
    val rows = DataQuality.profileDrift(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("event_type", "props", "user_id", "value"))
    val total = Tables.events(spark, sf).count()
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(4) == total,
        s"halves must partition the table: $r")
      assert(r.getLong(3) <= r.getLong(1) && r.getLong(6) <= r.getLong(4),
        s"distinct cannot exceed rows: $r")
      val expect = r.getLong(6).toDouble / r.getLong(3).toDouble
      assert(math.abs(r.getDouble(7) - expect) <= 5.1e-5,
        s"distinct_ratio replay: $r")
    }
  }

  test("tx27: burstiness matches a local replay on the winner set") {
    val rows = graft.operators.TextAnalysis.burstiness(spark, sf).collect()
    assert(rows.length == 20)
    val vmrs = rows.map(_.getDouble(3))
    assert(vmrs.zip(vmrs.tail).forall { case (a, b) => a >= b },
      "ranking must descend in vmr")
    // local replay of the dispersion index for the winners
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val n = docs.length.toDouble
    val counts = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Map[Long, Long]]
    docs.foreach { case (id, tx) =>
      tx.split(" ", -1).foreach { t =>
        val m = counts.getOrElseUpdate(t,
          scala.collection.mutable.Map.empty)
        m(id) = m.getOrElse(id, 0L) + 1L
      }
    }
    rows.foreach { r =>
      val m = counts(r.getString(0))
      assert(m.size.toLong == r.getLong(1), s"df replay off: $r")
      val tf = m.values.sum
      assert(tf == r.getLong(2), s"tf replay off: $r")
      val mean = tf / n
      val vmr = (m.values.map(c => c.toDouble * c).sum / n - mean * mean) / mean
      assert(math.abs(r.getDouble(3) - vmr) <= 5.1e-5, s"vmr replay off: $r")
      assert(r.getDouble(3) >= 0.0)
    }
  }

  test("a49: strengths are in [0,1] and the MA frame is interior-only") {
    val r = Analytics.seasonalityStrength(spark, sf).collect()
    assert(r.length == 1)
    val (n, fs, ft) = (r.head.getLong(0), r.head.getDouble(1),
      r.head.getDouble(2))
    assert(fs >= 0.0 && fs <= 1.0, s"F_s out of range: $fs")
    assert(ft >= 0.0 && ft <= 1.0, s"F_t out of range: $ft")
    // interior days only: the count must be <= distinct days - 6 when
    // the calendar is gap-free, and strictly less than distinct days
    val days = Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate"))).distinct().count()
    assert(n >= 1 && n < days, s"MA frame must drop edge days: $n vs $days")
    // local replay of the whole chain
    val daily = Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate")).as("day"), col("o_totalprice"))
      .collect()
      .groupBy(_.getDate(0).toLocalDate)
      .map { case (d, rs) =>
        d -> rs.map(r => math.round(r.getDouble(1) * 100)).sum.toDouble
      }
    val interior = daily.keys.filter(d =>
      (-3 to 3).forall(o => daily.contains(d.plusDays(o)))).toSeq
    assert(interior.size.toLong == n, "interior-day count replay")
    val det = interior.map { d =>
      val trend = (-3 to 3).map(o => daily(d.plusDays(o))).sum / 7.0
      (d.getDayOfWeek.getValue % 7, daily(d) - trend, daily(d))
    }
    val seas = det.groupBy(_._1).map { case (k, v) =>
      k -> v.map(_._2).sum / v.size
    }
    def varp(xs: Seq[Double]) = {
      val m = xs.sum / xs.size
      xs.map(x => x * x).sum / xs.size - m * m
    }
    val rem = det.map { case (dw, dv, _) => dv - seas(dw) }
    val sa = det.map { case (dw, _, x) => x - seas(dw) }
    val expFs = math.max(0.0, 1.0 - varp(rem) / varp(det.map(_._2)))
    val expFt = math.max(0.0, 1.0 - varp(rem) / varp(sa))
    assert(math.abs(fs - expFs) <= 5.1e-5, s"F_s replay: $fs vs $expFs")
    assert(math.abs(ft - expFt) <= 5.1e-5, s"F_t replay: $ft vs $expFt")
  }

  test("dp23: epoch permutations are near-independent; identical epochs give rho 1") {
    val r = graft.operators.DataPrep.epochShuffleAudit(spark, sf).collect()
    assert(r.length == 1)
    val (n, sd2, rho) = (r.head.getLong(0), r.head.getLong(1),
      r.head.getDouble(2))
    assert(n == Tables.documents(spark, sf).count())
    // two independent uniform permutations: E[rho] = 0, sd ~ 1/sqrt(n-1);
    // 6 sd is a generous deterministic bound at any test SF
    assert(math.abs(rho) <= 6.0 / math.sqrt((n - 1).toDouble),
      s"keyed epochs must decorrelate: rho=$rho n=$n")
    // rho replay from the exact integer sum
    val expect = 1.0 - 6.0 * sd2.toDouble / (n.toDouble * (n.toDouble * n - 1))
    assert(math.abs(rho - expect) <= 5.1e-7, "rho must derive from sum_d2")
    // degenerate check via the formula: identical permutations -> d2=0 -> rho=1
    assert(1.0 - 6.0 * 0.0 / (n.toDouble * (n.toDouble * n - 1)) == 1.0)
  }

  test("tx28: counts replay locally; clamps guarantee positive denominators") {
    val rows = graft.operators.TextAnalysis.readability(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf).select("source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val bySource = docs.groupBy(_._1)
    rows.foreach { r =>
      val ds = bySource(r.getString(0))
      assert(r.getLong(1) == ds.length)
      val w = ds.map(_._2.split(" ", -1).length.toLong).sum
      val st = ds.map(d => math.max(
        "[.!?]+".r.findAllIn(d._2).length, 1).toLong).sum
      val sy = ds.map(_._2.split(" ", -1).map(t => math.max(
        "[aeiouy]+".r.findAllIn(t.toLowerCase).length, 1).toLong).sum).sum
      assert(r.getLong(2) == w, s"word count replay: ${r.getString(0)}")
      assert(r.getLong(3) == st, s"sentence count replay: ${r.getString(0)}")
      assert(r.getLong(4) == sy, s"syllable count replay: ${r.getString(0)}")
      val flesch = 206.835 - 1.015 * w.toDouble / st - 84.6 * sy.toDouble / w
      assert(math.abs(r.getDouble(5) - flesch) <= 5.1e-5,
        s"flesch replay: ${r.getString(0)}")
    }
  }

  test("sp7: replicate ratios replay locally; variance is non-negative") {
    val r = graft.operators.Sampling.jackknifeQuality(spark, sf).collect()
    assert(r.length == 1)
    val (k, n, th, v) = (r.head.getLong(0), r.head.getLong(1),
      r.head.getDouble(2), r.head.getDouble(3))
    assert(v >= 0.0, s"a sum of squares about the mean: $v")
    // local replay from per-doc qualities
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "text")
      .collect().map(x => (x.getString(1), x.getString(2)))
    assert(n == docs.length)
    def quality(tx: String): Long = {
      val ws = tx.split(" ", -1)
      val lenOk = if (ws.length >= 20 && ws.length <= 2000) 1.0 else 0.4
      val div = ws.distinct.length.toDouble / ws.length
      val stop = ws.count(t => t == "the" || t == "a").toDouble / ws.length
      val q = BigDecimal(lenOk * 0.4 + div * 0.4
        + (1.0 - math.min(stop * 2.0, 1.0)) * 0.2)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      math.round(q * 10000)
    }
    val g = docs.groupBy(_._1).map { case (s0, ds) =>
      (s0, ds.length.toLong, ds.map(d => quality(d._2)).sum)
    }.toSeq
    assert(k == g.length)
    val (nn, tsq) = (g.map(_._2).sum, g.map(_._3).sum)
    assert(math.abs(th - tsq.toDouble / nn / 10000.0) <= 5.1e-7)
    val thetas = g.map(t => (tsq - t._3).toDouble / (nn - t._2) / 10000.0)
    val vexp = (k - 1).toDouble / k *
      (thetas.map(x => x * x).sum - math.pow(thetas.sum, 2) / k)
    assert(math.abs(v - vexp) <= 5.1e-7, s"variance replay: $v vs $vexp")
  }

  test("sq6: survival is a decreasing step function matching a local KM replay") {
    val rows = graft.operators.DataPrep.kaplanMeier(spark, sf).collect()
    assert(rows.nonEmpty)
    val sv = rows.map(_.getDouble(4))
    assert(sv.zip(sv.tail).forall { case (a, b) => a >= b },
      "S(t) must be non-increasing")
    assert(sv.forall(x => x >= 0.0 && x <= 1.0))
    // local replay of the risk sets and the product-limit estimator
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d"),
        col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate,
        r.getString(2), r.getDouble(3)))
    val mx = ev.map(_._2).max
    // .toSeq BEFORE map: mapping a Map to (dur, censored) tuples would
    // dedupe users sharing the same pair and understate the risk sets
    val du = ev.groupBy(_._1).toSeq.map { case (_, xs) =>
      val fd = xs.map(_._2).min
      val cv = xs.filter(x => x._3 == "purchase" && x._4 > 150)
        .map(_._2).sorted.headOption
      (java.time.temporal.ChronoUnit.DAYS.between(fd, cv.getOrElse(mx)),
        cv.isEmpty)
    }
    var surv = 1.0
    var checked = 0
    du.map(_._1).distinct.sorted.foreach { t =>
      val nRisk = du.count(_._1 >= t).toLong
      val d = du.count(x => x._1 == t && !x._2).toLong
      if (d > 0) {
        surv *= 1.0 - d.toDouble / nRisk
        val row = rows.find(_.getLong(0) == t)
          .getOrElse(fail(s"missing event time $t"))
        assert(row.getLong(1) == nRisk && row.getLong(2) == d,
          s"risk set replay at t=$t")
        assert(math.abs(row.getDouble(4) - surv) <= 5.1e-6,
          s"S($t) replay: ${row.getDouble(4)} vs $surv")
        checked += 1
      }
    }
    assert(checked == rows.length, "one output row per event time")
  }

  test("sr1: RRF fusion replays from its own legs; ranks bounded by R") {
    val r = 50
    val fused = operators.Retrieval.hybridRrf(spark, sf).collect()
    assert(fused.nonEmpty && fused.length <= 20)
    // replay the fusion from the legs' own outputs
    val legA = operators.TextAnalysis.bm25TopDocs(spark, sf, topK = r)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1) }.toMap
    val legB = operators.Similarity.refinedLeg(spark, sf, r, 60)
      .collect().map(row => row.getLong(0) -> row.getInt(1)).toMap
    fused.foreach { row =>
      val (id, ra, rb, rrf) =
        (row.getLong(0), row.getInt(1), row.getInt(2), row.getDouble(3))
      assert(ra >= 0 && ra <= r && rb >= 0 && rb <= r)
      assert(ra == legA.getOrElse(id, 0), s"bm25 rank mismatch for $id")
      assert(rb == legB.getOrElse(id, 0), s"vector rank mismatch for $id")
      val expect =
        (if (ra > 0) 1.0 / (60 + ra) else 0.0) +
          (if (rb > 0) 1.0 / (60 + rb) else 0.0)
      assert(math.abs(rrf - expect) <= 5.1e-7, s"rrf replay for $id")
    }
    // fusion is genuinely hybrid: the top fused doc set is not just
    // one leg's prefix unless the corpus makes it so — at minimum the
    // scores must be non-increasing
    val scores = fused.map(_.getDouble(3)).toSeq
    assert(scores == scores.sorted.reverse, "fused order by rrf desc")
  }

  test("sr2: QL scores are negative log-probs, ordered, bounded by topK") {
    val rows = operators.Retrieval.queryLikelihoodTopDocs(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // (tf + mu·p)/(dl + mu) < 1 for any real corpus term, so each of
    // the three ln terms is negative
    rows.foreach(r => assert(r.getDouble(1) < 0.0))
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  test("sim17: one recall row per query, recall = n_hit/k in [0,1]") {
    val rows = operators.Similarity.pqRecallAudit(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L until 5L))
    rows.foreach { r =>
      val (nHit, k, rec) = (r.getLong(1), r.getInt(2), r.getDouble(3))
      assert(nHit >= 0 && nHit <= k)
      assert(math.abs(rec - nHit.toDouble / k) <= 5.1e-5)
    }
  }

  test("dq6: seven FK edges, zero orphans on consistent data, counts replay") {
    val rows = operators.DataQuality.referentialIntegrity(spark, sf).collect()
    assert(rows.length == 7)
    rows.foreach(r => assert(r.getLong(2) == 0L,
      s"${r.getString(0)} reported orphans on referentially-intact data"))
    val byName = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName("lineitem->orders") == Tables.lineitem(spark, sf).count())
    assert(byName("nation->region") == Tables.nation(spark, sf).count())
  }

  test("a50: Mann-Kendall S bounded by pair count, variance positive") {
    val r = Analytics.mannKendall(spark, sf).collect()
    assert(r.length == 1)
    val (n, s, varS, z) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getDouble(2), r(0).getDouble(3))
    assert(math.abs(s) <= n * (n - 1) / 2)
    assert(varS > 0 && !z.isNaN)
    // z sign agrees with S
    assert(s == 0 || (s > 0) == (z > 0) || z == 0.0)
  }

  test("a51: runs count within [1, n1+n2], z finite") {
    val r = Analytics.runsTest(spark, sf).collect()
    assert(r.length == 1)
    val (n1, n2, runs, z) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getDouble(3))
    assert(n1 > 0 && n2 > 0)
    assert(runs >= 1 && runs <= n1 + n2)
    assert(!z.isNaN && !z.isInfinite)
  }

  test("gr18: one row per k, phi in [0,1], counts shrink as k grows") {
    val rows = operators.Graph.richClub(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 4, 8))
    rows.foreach { r =>
      val (nn, ne, phi) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(phi >= 0.0 && phi <= 1.0)
      assert(ne <= nn * (nn - 1) / 2)
    }
    val ns = rows.map(_.getLong(1)).toSeq
    assert(ns == ns.sorted.reverse, "node counts must shrink as k grows")
  }

  test("tx29: G2 non-negative, pairs above the floor, deterministic cut") {
    val rows = operators.TextAnalysis.collocations(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getLong(2) >= 5L, "n_pair under the minPair floor")
      // 2x2 G2 with MLE expectations is always >= 0
      assert(r.getDouble(5) >= 0.0)
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(2) <= r.getLong(4),
        "pair count cannot exceed its marginals")
    }
    val g2s = rows.map(_.getDouble(5)).toSeq
    assert(g2s == g2s.sorted.reverse)
  }

  test("dp24: rates feasible, binding source saturates, shares normalize") {
    val rows = operators.DataPrep.mixtureCalibration(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf)
      .select("source").distinct().count())
    val rates = rows.map(_.getDouble(4))
    assert(rates.forall(r => r > 0.0 && r <= 1.0 + 5e-6),
      "subsampling-only calibration must never upsample")
    assert(rates.max >= 1.0 - 5e-6,
      "the binding source must run at rate ~1")
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) <= 1e-4,
      "target shares must normalize")
    rows.foreach(r => assert(r.getLong(5) <= r.getLong(1),
      "output tokens cannot exceed the source's tokens"))
  }

  test("pv5: coarsening monotonicity — min class grows, suppression shrinks") {
    val rows = operators.DataQuality.generalizationLadder(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    val minC = rows.map(_.getLong(2)).toSeq
    assert(minC == minC.sorted,
      "each level merges classes, so the smallest class cannot shrink")
    val sup = rows.map(_.getDouble(4)).toSeq
    assert(sup == sup.sorted.reverse,
      "suppression rate must be non-increasing up the ladder")
    assert(rows.last.getLong(1) == 1L, "the top of the ladder is one class")
    val total = Tables.customer(spark, sf).count()
    rows.foreach(r => assert(r.getLong(3) <= total))
  }

  test("gr19: degree classes partition the nodes, knn within degree bounds") {
    val rows = operators.Graph.neighborDegree(spark, sf).collect()
    assert(rows.nonEmpty)
    val ks = rows.map(_.getLong(0)).toSeq
    assert(ks == ks.sorted && ks.distinct.length == ks.length)
    val maxDeg = ks.max
    rows.foreach { r =>
      // an average of neighbor degrees lives inside [1, maxDeg]
      assert(r.getDouble(2) >= 1.0 - 5e-7 &&
        r.getDouble(2) <= maxDeg + 5e-7)
    }
    // every node is in exactly one degree class
    val und = operators.Graph.supportedEdges(spark, sf, 2)
    val nNodes = und.select(col("pa").as("n"))
      .unionByName(und.select(col("pb").as("n"))).distinct().count()
    assert(rows.map(_.getLong(1)).sum == nNodes)
  }

  test("tx30: vocabulary growth is monotone and sublinear per doc") {
    val rows = operators.TextAnalysis.heapsCurve(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10).map(_ * 10))
    val vocab = rows.map(_.getLong(2)).toSeq
    val nd = rows.map(_.getLong(1)).toSeq
    assert(vocab == vocab.sorted, "vocabulary can only grow with the prefix")
    assert(nd == nd.sorted && nd.last == Tables.documents(spark, sf).count())
    // full-prefix vocab equals the corpus vocabulary
    val full = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " "))).distinct().count()
    assert(vocab.last == full)
  }

  test("dd23: candidate pairs shrink as shingles grow; thresholds bounded") {
    val rows = operators.Dedup.shingleSensitivity(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(2, 3, 5))
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1),
      "thresholded pairs are a subset of candidates"))
    val cands = rows.map(_.getLong(1)).toSeq
    assert(cands == cands.sorted.reverse,
      "longer shingles can only prune shared-gram candidates")
  }

  test("mm10: decoded moments replay the closed-form paint; flags partition") {
    val rows = operators.Multimodal.contrastGate(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("image/jpeg", "image/png"))
    assert(rows.map(_.getLong(1)).sum == Tables.documents(spark, sf).count(),
      "every document decodes — no fingerprint fallbacks on the fixture")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // the JPEG paint is constant per 8x8 block (tiny fixtures are
    // mostly one block), the PNG paint a per-pixel gradient — so the
    // low-contrast rate must be far higher on the JPEG side
    val byMime = rows.map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(byMime("image/jpeg") > byMime("image/png"),
      "block-constant JPEG paint must flag low-contrast more often")
  }

  test("dd24: size histogram conserves documents and matches dd8") {
    val rows = operators.Dedup.clusterSizeDistribution(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) == r.getLong(0) * r.getLong(1)))
    assert(rows.map(_.getLong(2)).sum ==
      Tables.documents(spark, sf).count(),
      "every document lives in exactly one cluster")
    val comps = operators.Dedup.dedupComponents(spark, sf)
      .groupBy("comp").count().groupBy("count").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(comps(r.getLong(0)) == r.getLong(1)))
  }

  test("pv6: t in [0,1]; a class distributed like the global scores ~0") {
    val rows = operators.DataQuality.tCloseness(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    // classes partition the table
    assert(rows.map(_.getLong(2)).sum == Tables.customer(spark, sf).count())
    // small classes drift more than the population on average: the
    // largest class should sit below the max t (sanity, not a theorem
    // - it holds for any non-degenerate synthetic draw)
    val maxT = rows.map(_.getDouble(3)).max
    assert(maxT > 0.0, "identical distributions everywhere is a red flag")
  }

  test("sp8: power math replays; MDE shrinks with more users") {
    val r = operators.Sampling.powerAnalysis(spark, sf).collect()
    assert(r.length == 1)
    val row = r(0)
    val (na, nb) = (row.getLong(0), row.getLong(1))
    val (pa, pb) = (row.getDouble(2), row.getDouble(3))
    val delta = row.getDouble(4)
    val nReq = row.getLong(5)
    val mde = row.getDouble(6)
    assert(math.abs(delta - math.abs(pa - pb)) <= 2.1e-6)
    // replay the Fleiss formula
    val pbar = (pa * na + pb * nb) / (na + nb)
    val zsum = 1.959964 * math.sqrt(2.0 * pbar * (1.0 - pbar)) +
      0.841621 * math.sqrt(pa * (1.0 - pa) + pb * (1.0 - pb))
    assert(math.abs(nReq - math.ceil(zsum * zsum / (delta * delta))) <= 1.0)
    assert(math.abs(mde - zsum / math.sqrt(math.min(na, nb).toDouble)) <= 1e-4)
    assert(mde > 0 && nReq > 0)
  }

  test("dq7/dq8: calendar accounting balances; PK dependencies hold") {
    val gaps = operators.DataQuality.calendarGaps(spark, sf).collect()
    if (gaps.nonEmpty) {
      val r = gaps(0)
      assert(r.getLong(0) == r.getLong(1) + r.getLong(2),
        "expected = observed + missing")
      assert(r.getDate(3) != null && r.getDate(4) != null)
    } else {
      // empty relation == complete calendar; cross-check directly
      val days = Tables.orders(spark, sf)
        .select(to_date(col("o_orderdate"))).distinct().count()
      val span = Tables.orders(spark, sf)
        .agg(datediff(max(to_date(col("o_orderdate"))),
          min(to_date(col("o_orderdate")))) + 1).head.getInt(0)
      assert(days == span)
    }
    val fds = operators.DataQuality.functionalDependencies(spark, sf)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(fds("c_custkey->c_nationkey"), "a key determines its row")
    assert(fds("o_orderkey->o_custkey"), "a key determines its row")
  }

  test("sim18: recall is monotone in nProbe and consistent with sim8") {
    val rows = operators.Similarity.ivfProbeSweep(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 4))
    val recalls = rows.map(_.getDouble(3)).toSeq
    assert(recalls == recalls.sorted,
      "probing more cells can only add candidates")
    recalls.foreach(r => assert(r >= 0.0 && r <= 1.0))
    // the nProbe=2 point must equal sim8's ivf row (same truth, same
    // index, same k)
    val sim8Ivf = operators.Similarity.annRecallAudit(spark, sf)
      .filter(col("method") === "ivf").head.getDouble(3)
    val p2 = rows.find(_.getInt(0) == 2).get.getDouble(3)
    assert(math.abs(p2 - sim8Ivf) <= 1e-9,
      "the sweep's nProbe=2 point must replay sim8's audit")
  }

  test("sr3: eval triple is bounded, internally consistent, and replays sim17's recall") {
    val rows = operators.Retrieval.retrievalEval(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    rows.foreach { r =>
      val (nHit, recall, mrr, ndcg) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(nHit >= 0 && nHit <= 10)
      assert(math.abs(recall - nHit / 10.0) <= 1e-9)
      assert(mrr >= 0.0 && mrr <= 1.0)
      assert(ndcg >= 0.0 && ndcg <= 1.0)
      // the position-sensitive metrics are zero exactly when no hit
      assert((mrr > 0.0) == (nHit > 0), "mrr > 0 iff any hit")
      assert((ndcg > 0.0) == (nHit > 0), "ndcg > 0 iff any hit")
    }
    // same legs, same convention, same k as sim17 — recalls must agree
    val sim17 = operators.Similarity.pqRecallAudit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    rows.foreach(r =>
      assert(math.abs(r.getDouble(2) - sim17(r.getLong(0))) <= 1e-9,
        "sr3 recall must replay sim17's audit"))
  }

  test("a52: kappa bounded by raw agreement, exact on a hand confusion matrix") {
    val row = Analytics.cohenKappa(spark, sf).collect().head
    val (nDocs, nAgree, po, pe, kappa) = (row.getLong(0), row.getLong(1),
      row.getDouble(2), row.getDouble(3), row.getDouble(4))
    assert(nAgree <= nDocs && math.abs(po - nAgree.toDouble / nDocs) <= 1e-6)
    assert(pe > 0.0 && pe < 1.0, "three-category raters: chance agreement interior")
    assert(kappa <= po + 1e-9, "kappa discounts chance, never exceeds raw agreement")
    assert(kappa >= -1.0 && kappa <= 1.0)
    // hand-checked matrix: perfect agreement on a balanced sample -> kappa 1
    import spark.implicits._
    val perfect = Seq(("low", "low"), ("mid", "mid"), ("high", "high"))
      .toDF("rater_a", "rater_b")
    assert(Analytics.cohenKappaFrom(perfect).collect().head.getDouble(4) == 1.0)
    // independent marginals: agreement at chance -> kappa 0
    val chance = (for { a <- Seq("low", "mid", "high")
                        b <- Seq("low", "mid", "high") } yield (a, b))
      .toDF("rater_a", "rater_b")
    assert(math.abs(Analytics.cohenKappaFrom(chance).collect().head.getDouble(4)) <= 1e-9)
    // degenerate single-cell corpus: p_e = 1, so kappa is NULL BY
    // CONSTRUCTION — an unguarded 0/0 here is engine-dependent
    // (Spark NULL or ANSI error, DuckDB NaN) and would split the
    // oracle twins
    val oneCell = Seq(("low", "low"), ("low", "low"))
      .toDF("rater_a", "rater_b")
    val deg = Analytics.cohenKappaFrom(oneCell).collect().head
    assert(deg.getDouble(3) == 1.0, "single-cell corpus: p_e = 1")
    assert(deg.isNullAt(4), "p_e = 1 must answer NULL kappa, not NaN/error")
  }

  test("tx31: classifier covers every doc; squash is bounded, centered, and monotone") {
    val rows = operators.TextAnalysis.qualityClassifier(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val (n, raw, p, keep) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))
      assert(n >= 1)
      assert(math.abs(raw) <= 500L * n, "weights live in [-500, 500]")
      assert(p > 0.0 && p < 1.0, "rational logistic never saturates")
      assert(keep == (p >= 0.5))
      assert((p >= 0.5) == (raw >= 0), "squash is centered at raw = 0")
    }
    // monotone: sort by margin, p_keep must sort the same way
    val byMargin = rows.sortBy(r => r.getLong(2).toDouble / r.getLong(1))
      .map(_.getDouble(3)).toSeq
    assert(byMargin == byMargin.sorted, "p_keep monotone in the margin")
  }

  test("incremental pieces degenerate exactly: all-fresh pair probe == full pair relation; full-width base slice == full labels") {
    // pairsTouching with everything fresh must BE the batch pair
    // relation (same caps, same denominators, same threshold)
    val gr = graft.sources.TextIndex.gramIndex(spark, sf, 3)
    val probed = operators.Dedup.pairsTouching(gr, gr, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = operators.Dedup.ngramJaccardPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probed == full, "a probe where every doc is fresh is the full join")
    // a base boundary past every id makes the slice the whole corpus
    val maxId = Tables.documents(spark, sf)
      .agg(max(col("doc_id"))).head.getLong(0)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(asSet(graft.sources.TextIndex
        .componentsIndexBase(spark, sf, maxId + 1)) ==
      asSet(operators.Dedup.componentsFromScratch(spark, sf)),
      "the full-width base slice must equal the full assignment")
  }

  test("dd25: star-edge relabel over delta pairs equals the from-scratch assignment") {
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(asSet(operators.Dedup.incrementalComponents(spark, sf)) ==
      asSet(operators.Dedup.componentsFromScratch(spark, sf)),
      "incremental labels must equal the from-scratch fixpoint")
  }

  test("sq7: positions contiguous, credits sum to 1, U endpoints at 40%") {
    val rows = operators.Analytics.ushapeAttribution(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, ts) =>
      val n = ts.head.getLong(4)
      assert(ts.length == n, "every touch carries the partition count")
      assert(ts.map(_.getInt(3)).sorted.toSeq == (1 to n.toInt))
      val total = ts.map(_.getDouble(5)).sum
      assert(math.abs(total - 1.0) <= 1e-4,
        s"per-purchase credit must sum to 1, got $total")
      if (n >= 3) {
        assert(ts.find(_.getInt(3) == 1).get.getDouble(5) == 0.4)
        assert(ts.find(_.getInt(3) == n.toInt).get.getDouble(5) == 0.4)
      }
    }
  }

  test("a53: Fleiss kappa replays an independent Scala recomputation of the panel") {
    val row = Analytics.fleissKappa(spark, sf).collect().head
    val labels = operators.TextAnalysis.annotatorLabels3(spark, sf)
      .collect().map(r => Seq(r.getString(1), r.getString(2), r.getString(3)))
    val cats = Seq("low", "mid", "high")
    val m = 3.0
    val piSum = labels.map { rs =>
      cats.map(c => rs.count(_ == c).toLong).map(x => x * x).sum - 3L
    }.sum
    val n = labels.length.toDouble
    val pBar = piSum / (n * 6.0)
    val pe = cats.map(c =>
      labels.map(rs => rs.count(_ == c)).sum / (n * m)).map(p => p * p).sum
    assert(row.getLong(0) == labels.length)
    assert(math.abs(row.getDouble(1) - pBar) <= 1e-6, "p_bar replays")
    assert(math.abs(row.getDouble(2) - pe) <= 1e-6, "p_e replays")
    assert(math.abs(row.getDouble(3) - (pBar - pe) / (1.0 - pe)) <= 1e-6)
  }

  test("tx32: fertility >= 1 per language and the doc partition is exhaustive") {
    val rows = operators.TextAnalysis.tokenizerFertility(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == Tables.documents(spark, sf).count(),
      "every document lands in exactly one predicted-language row")
    rows.foreach { r =>
      assert(r.getLong(3) >= r.getLong(2) || r.getDouble(4) < 1.0)
      assert(r.getDouble(4) > 0.0, "fertility is a positive ratio")
    }
  }

  test("dp25: DSIR never re-selects the exemplar, weights ordered, k-bounded") {
    val rows = operators.DataPrep.dsirSelect(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    assert(rows.forall(_.getString(1) != "src0"),
      "the target exemplar defines the distribution, it is not re-selected")
    val ws = rows.map(_.getDouble(3)).toSeq
    assert(ws == ws.sorted.reverse, "selection is ranked by importance weight")
    ws.foreach(w => assert(!w.isNaN && !w.isInfinite,
      "add-one smoothing keeps every weight finite"))
  }

  test("sim19: prefix-dim recall is monotone and the full-width leg is its own truth") {
    val rows = operators.Similarity.dimSweepRecall(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(16, 32, 64))
    val recalls = rows.map(_.getDouble(3)).toSeq
    assert(recalls == recalls.sorted,
      "more dimensions can only sharpen the cosine ranking on average")
    assert(recalls.last == 1.0,
      "the 64-dim leg IS the truth — the sweep's built-in self-check")
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    // the oracle generator's truth CTE ranks on cs$dim — a dims list
    // that omits the truth width must fail fast, not emit SQL against
    // a nonexistent column
    intercept[IllegalArgumentException] {
      OracleGen.sim19Sql(dims = Seq(16, 32), dim = 64)
    }
  }

  test("a54: HL sits in [min, max], matches hand values, and degrades to the median") {
    import spark.implicits._
    val row = Analytics.hodgesLehmann(spark, sf).collect().head
    val (nM, nP, med, hl) = (row.getLong(0), row.getLong(1),
      row.getDouble(2), row.getDouble(3))
    assert(nP == nM * (nM + 1) / 2, "Walsh pair count is n(n+1)/2")
    val monthly = Analytics.monthlyRevenueState(Tables.orders(spark, sf))
      .select("c").as[Long].collect().map(_ / 100.0)
    assert(hl >= monthly.min && hl <= monthly.max,
      "a location estimate lives inside the sample range")
    assert(med >= monthly.min && med <= monthly.max)
    // hand series (cents): Walsh sums of {100,200,400} ->
    // {200,300,500,400,600,800}, median = (400+500)/2 = 450 -> HL 2.25
    val hand = Seq((0L, 100L), (1L, 200L), (2L, 400L)).toDF("x", "c")
    val h = Analytics.hodgesLehmannFromMonthly(hand).collect().head
    assert(h.getDouble(3) == 2.25, s"hand HL, got ${h.getDouble(3)}")
    assert(h.getDouble(2) == 2.0, "hand median is the middle element")
    // a symmetric series: HL equals the median exactly
    val sym = Seq((0L, 100L), (1L, 200L), (2L, 300L)).toDF("x", "c")
    val hs = Analytics.hodgesLehmannFromMonthly(sym).collect().head
    assert(hs.getDouble(2) == hs.getDouble(3),
      "symmetry: Walsh median = plain median")
  }

  test("tx33: full ordered matrix, Gibbs non-negativity, genuine asymmetry, brute-force spot check") {
    import spark.implicits._
    val rows = operators.TextAnalysis.sourceKlMatrix(spark, sf).collect()
    val nSrc = Tables.documents(spark, sf).select("source").distinct().count()
    assert(rows.length == nSrc * (nSrc - 1), "every ordered pair, no diagonal")
    rows.foreach(r => assert(r.getDouble(4) >= -1e-4,
      s"KL(p||q) >= 0 by Gibbs: ${r.getString(0)}->${r.getString(1)} = ${r.getDouble(4)}"))
    val byPair = rows.map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(byPair.exists { case ((a, b), v) => math.abs(v - byPair((b, a))) > 1e-4 },
      "KL is asymmetric — a symmetric matrix means a formula bug")
    // brute-force one pair from raw token counts (the unfactored
    // definition over the global vocabulary)
    val cnt = Tables.documents(spark, sf)
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .groupBy("source", "t").count()
      .as[(String, String, Long)].collect()
    val v = cnt.map(_._2).distinct.length
    def dist(src: String): (Map[String, Long], Long) = {
      val m = cnt.filter(_._1 == src).map(x => x._2 -> x._3).toMap
      (m, m.values.sum)
    }
    val (ca, na) = dist("src0"); val (cb, nb) = dist("src1")
    val vocab = cnt.map(_._2).distinct
    val brute = vocab.map { t =>
      val p = (ca.getOrElse(t, 0L) + 1.0) / (na + v)
      val q = (cb.getOrElse(t, 0L) + 1.0) / (nb + v)
      p * math.log(p / q)
    }.sum
    assert(math.abs(byPair(("src0", "src1")) - brute) < 5e-4,
      s"factorized KL must equal the definition: got ${byPair(("src0", "src1"))} vs $brute")
  }

  test("sp9: priority estimate degenerates to exact when k covers the source, stays sane otherwise") {
    // at sf0.001 every source has 25 docs: k = 100 ⇒ τ absent ⇒ the
    // DLT estimator reduces to Σ max(w, 0) = the exact total — an
    // identity, not an approximation
    val full = operators.Sampling.priorityEstimate(spark, sf, k = 100).collect()
    assert(full.nonEmpty)
    full.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), "k >= n: whole source sampled")
      assert(math.abs(r.getDouble(4) - r.getLong(3).toDouble) < 1e-6,
        s"k >= n must be EXACT: ${r.getString(0)} est=${r.getDouble(4)} vs ${r.getLong(3)}")
    }
    // genuine sampling: k = 8 of 25 — unbiased in expectation, and on
    // this corpus (mild weight spread) a single draw stays in a loose
    // sanity band; m_sampled is exactly k
    val sampled = operators.Sampling.priorityEstimate(spark, sf, k = 8).collect()
    sampled.foreach { r =>
      assert(r.getLong(2) == 8L, "k < n: exactly k docs sampled")
      val ratio = r.getDouble(4) / r.getLong(3)
      assert(ratio > 0.2 && ratio < 5.0,
        s"estimate wildly off for ${r.getString(0)}: ratio $ratio")
    }
  }

  test("a42: one row per lag, |acf| <= 1, pair counts bounded by the series") {
    val rows = Analytics.autocorrelation(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 7))
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0))
    // the series may have calendar gaps (sparse at tiny SF), so pair
    // counts per lag are only bounded by the day count, not monotone
    val days = Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate"))).distinct().count()
    rows.foreach(r => assert(r.getLong(1) >= 1 && r.getLong(1) < days))
  }
}
