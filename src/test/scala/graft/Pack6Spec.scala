package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-4 pack: histogram profiling,
  * weighted statistics, day-over-day retention, rolling 7-day
  * actives, PMI collocations, the regex function family, per-source
  * quotas, and normalized dedup. Cross-engine value parity is the
  * oracle gate's job; these pin internal consistency and plan shape.
  */
class Pack6Spec extends SparkTestBase {

  test("a23: buckets tile the value range and counts sum to the table") {
    val rows = Analytics.totalpriceHistogram(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.foreach { r =>
      val b = r.getAs[Int]("bucket")
      val lo = b * 25000.0
      val hi = (b + 1) * 25000.0
      assert(r.getAs[Double]("min_price") >= lo)
      assert(r.getAs[Double]("max_price") < hi)
      assert(r.getAs[Double]("min_price") <= r.getAs[Double]("max_price"))
    }
  }

  test("a23: single partial+final hash agg, no join, no window") {
    val plan = Analytics.totalpriceHistogram(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
  }

  test("a24: weighted mean within the unweighted quantity range, var >= 0") {
    val rows = Analytics.weightedStats(spark, sf).collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      val m = r.getAs[Double]("w_mean")
      assert(m >= 1.0 && m <= 50.0) // quantity domain
      assert(r.getAs[Double]("w_var") >= 0.0)
    }
  }

  test("st5: retained <= dau, retention in [0,1], retained recomputable") {
    val rows = Analytics.dayRetention(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dau = r.getAs[Long]("dau")
      val ret = r.getAs[Long]("retained")
      assert(ret <= dau)
      val rate = r.getAs[Double]("retention")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(math.abs(rate - ret.toDouble / dau) < 5e-5)
    }
  }

  test("st6: window count >= that day's dau and <= total users") {
    val wau = Analytics.rollingWau(spark, sf).collect()
      .map(r => r.getAs[String]("window_end") -> r.getAs[Long]("wau")).toMap
    val dau = Analytics.dayRetention(spark, sf).collect()
      .map(r => r.getAs[String]("day") -> r.getAs[Long]("dau")).toMap
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(wau.keySet == dau.keySet) // same observed days
    dau.foreach { case (day, n) =>
      assert(wau(day) >= n, s"$day: wau ${wau(day)} < dau $n")
      assert(wau(day) <= users)
    }
  }

  test("tx13: top-k sorted by lift desc; counts consistent") {
    val rows = TextAnalysis.pmiCollocations(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val lifts = rows.map(_.getAs[Double]("lift"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      // a bigram can't occur more often than either of its words
      assert(r.getAs[Long]("n_ab") <= r.getAs[Long]("n_a"))
      assert(r.getAs[Long]("n_ab") <= r.getAs[Long]("n_b"))
      assert(r.getAs[Long]("n_ab") >= 5L)
    }
  }

  test("f_regex: extraction consistent with count and test columns") {
    val rows = FunctionSuites.regexSuite(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sWord = r.getAs[String]("first_s_word")
      assert(sWord.isEmpty || sWord.startsWith("s"))
      assert(r.getAs[Long]("n_table") >= 0L)
      val longWord = r.getAs[String]("first_long_word")
      assert(longWord.isEmpty || longWord.length >= 8)
    }
  }

  test("dp9: at most `quota` rows per source, ranked by n_chars desc") {
    val rows = DataPrep.sourceQuota(spark, sf, quota = 10).collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.nonEmpty)
    bySource.values.foreach { g =>
      assert(g.length <= 10)
      val sorted = g.sortBy(_.getAs[Int]("rk"))
      assert(sorted.map(_.getAs[Int]("rk")).toSeq == (1 to g.length))
      val chars = sorted.map(_.getAs[Long]("n_chars"))
      assert(chars.zip(chars.tail).forall { case (a, b) => a >= b })
    }
  }

  test("dd13: spans are 8 tokens, counts consistent, sorted by spread") {
    val rows = Dedup.boilerplateSpans(spark, sf).collect()
    assert(rows.nonEmpty) // corpus contains near-dup docs by construction
    rows.foreach { r =>
      assert(r.getAs[String]("gram").split(" ").length == 8)
      val nd = r.getAs[Long]("n_docs")
      assert(nd >= 3L)
      assert(r.getAs[Long]("n_occurrences") >= nd)
    }
    val spreads = rows.map(r =>
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_occurrences")))
    assert(spreads.zip(spreads.tail).forall { case ((d1, o1), (d2, o2)) =>
      d1 > d2 || (d1 == d2 && o1 >= o2)
    })
  }

  test("a26: power-sum fit matches Spark's built-in regr_slope/regr_intercept") {
    // no assumption about the synthetic data's correlation (it has
    // essentially none) — the invariant is agreement with the built-in
    // incremental-covariance implementation
    val expected = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(
        expr("regr_slope(round(l_extendedprice * 100), l_quantity)").as("es"),
        expr("regr_intercept(round(l_extendedprice * 100), l_quantity)").as("ei"))
      .collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("es"), r.getAs[Double]("ei"))).toMap
    val rows = Analytics.linearFit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (es, ei) = expected(r.getAs[String]("l_returnflag"))
      assert(math.abs(r.getAs[Double]("slope_cents") - es)
        <= 1e-3 * math.max(1.0, math.abs(es)))
      assert(math.abs(r.getAs[Double]("intercept_cents") - ei)
        <= 1e-3 * math.max(1.0, math.abs(ei)))
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }

  test("sim8: audit counts consistent; probed IVF finds some true neighbors") {
    val rows = Similarity.annRecallAudit(spark, sf).collect()
    assert(rows.map(_.getAs[String]("method")).toSeq == Seq("ivf", "lsh"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_truth") == 15L) // 5 queries x k=3
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_truth"))
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
    // the IVF index probes the 2 nearest of 16 cells — it must do
    // better than finding nothing on a 64-dim corpus of this size
    val ivf = rows.find(_.getAs[String]("method") == "ivf").get
    assert(ivf.getAs[Long]("n_hits") > 0L)
    // multi-table LSH (8 tables x 4 planes) must find true neighbors
    // too — the single-table design this replaced measured 0 hits
    val lsh = rows.find(_.getAs[String]("method") == "lsh").get
    assert(lsh.getAs[Long]("n_hits") > 0L)
  }

  test("st7: per-user intervals tile the timeline; exactly one open interval") {
    val rows = Windows.scdBuild(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[String]("valid_from"))
      sorted.foreach { r =>
        assert(r.getAs[String]("valid_from") < r.getAs[String]("valid_to"))
      }
      // consecutive intervals chain: each closes where the next opens
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("valid_to") == b.getAs[String]("valid_from"))
          // a change row means the state actually changed
          assert(a.getAs[String]("event_type") != b.getAs[String]("event_type"))
        case _ => ()
      }
      assert(g.count(_.getAs[Int]("is_current") == 1) == 1)
      assert(sorted.last.getAs[String]("valid_to") == "9999-12-31 00:00:00")
    }
  }

  test("a27: cell counts sum to the table; expected positive; chi2 finite") {
    val rows = Analytics.contingency(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("observed")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Int]("dow") >= 0 && r.getAs[Int]("dow") <= 6)
      assert(r.getAs[Double]("expected") > 0.0)
      assert(r.getAs[Double]("chi2_cell") >= 0.0)
    }
  }

  test("dp10: positions dense from 1, rows ordered by shuffle key") {
    val rows = DataPrep.deterministicShuffle(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("pos")).toSeq == (1L to rows.length).toSeq)
    val keys = rows.map(_.getAs[String]("shuffle_key")).toSeq
    assert(keys == keys.sorted)
    // reproducible run to run
    assert(DataPrep.deterministicShuffle(spark, sf).collect().toSeq == rows.toSeq)
  }

  test("dd11: canonical is the min doc of its fingerprint group") {
    val rows = Dedup.normalizedDedup(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    val byFp = rows.groupBy(_.getAs[String]("fp"))
    byFp.values.foreach { g =>
      val canon = g.map(_.getAs[Long]("canonical_id")).distinct
      assert(canon.length == 1)
      assert(canon.head == g.map(_.getAs[Long]("doc_id")).min)
      g.foreach { r =>
        val expected = if (r.getAs[Long]("doc_id") == canon.head) 0 else 1
        assert(r.getAs[Int]("is_dup") == expected)
      }
    }
  }

  test("j9: overlap is symmetric-consistent, positive-length, same part") {
    val rows = Relational.intervalOverlapJoin(spark, sf, sampleMod = 50L)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("okey_a") < r.getAs[Long]("okey_b"))
      assert(r.getAs[Long]("overlap_secs") >= 0L)
    }
    // pair set is unique
    val keys = rows.map(r => (r.getAs[Long]("l_partkey"),
      r.getAs[Long]("okey_a"), r.getAs[Long]("okey_b")))
    assert(keys.distinct.length == keys.length)
  }

  test("j9: planned as a hash join on the partkey anchor, not BNLJ") {
    val plan = Relational.intervalOverlapJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"interval join degenerated to BNLJ:\n$plan")
  }

  test("sim7: quantization error bounded by half a quant step") {
    val rows = Similarity.vecQuantizeAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val maxAbs = r.getAs[Double]("max_abs")
      assert(maxAbs > 0.0)
      // |x - recon| <= step/2 where step = max_abs/127; mean over dims
      // is bounded the same (1e-6 slack for the 8dp rounding)
      assert(r.getAs[Double]("mean_qerr") <= maxAbs / 127.0 / 2.0 + 1e-6)
      assert(r.getAs[Double]("l2_norm") > 0.0)
    }
  }

  test("a25: MAD bounded by half the quantity range, median in-domain") {
    val rows = Analytics.madStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val med = r.getAs[Double]("med_qty")
      val mad = r.getAs[Double]("mad_qty")
      assert(med >= 1.0 && med <= 50.0)
      // every |x - med| <= max(med - 1, 50 - med), so the median of them is too
      assert(mad >= 0.0 && mad <= math.max(med - 1.0, 50.0 - med))
    }
  }

  test("w13: cohort sizes never grow with offset beyond the week-0 size") {
    val rows = Analytics.cohortRetention(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("cohort_week")).values.foreach { g =>
      val byOff = g.map(r =>
        r.getAs[Int]("week_offset") -> r.getAs[Long]("n_users")).toMap
      assert(byOff.contains(0)) // every cohort is active in its first week
      byOff.foreach { case (off, n) =>
        assert(off >= 0)
        assert(n <= byOff(0), s"offset $off count $n exceeds cohort size ${byOff(0)}")
      }
    }
  }

  test("dd12: audit counts consistent and recall above the banding-theory floor") {
    val r = Dedup.lshRecallAudit(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val nTrue = row.getAs[Long]("n_true")
    val nHits = row.getAs[Long]("n_hits")
    assert(nHits <= nTrue)
    assert(nHits <= row.getAs[Long]("n_candidates"))
    // at j >= 0.7, r=4, b=16: per-pair P[miss] = (1-j^4)^16 <= 0.013
    assert(nTrue > 0, "test corpus should contain j>=0.7 pairs")
    assert(row.getAs[Double]("recall") >= 0.8,
      s"LSH recall ${row.getAs[Double]("recall")} below floor")
  }

  test("dd11: whitespace/punctuation variants collapse to one fingerprint") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello,  World! this IS a test"),
      (2L, "hello world this is a test"),
      (3L, "hello world; THIS is a test."),
      (4L, "a different document entirely")
    ).toDF("doc_id", "text")
    // the operator's own normalization+fingerprint, not a copy of it
    val fps = docs.select(col("doc_id"),
        graft.functions.Text.fingerprint(
          graft.functions.Text.normalized(col("text"))).as("fp"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fp")).toMap
    assert(fps(1L) == fps(2L) && fps(2L) == fps(3L))
    assert(fps(4L) != fps(1L))
  }

  test("tx18: CDC chunking is shift-invariant — a prefixed copy shares long chunks") {
    import spark.implicits._
    val base = ("the quick brown fox jumps over the lazy dog and keeps " +
      "running through the open field while the watchful farmer counts " +
      "sheep beside the old stone wall near the river bend at dusk ") * 3
    val docs = Seq((0L, base), (1L, "INSERTED PREFIX 12345 " + base))
      .toDF("doc_id", "text")
    val shared = TextAnalysis.cdcSharedChunksOf(docs, 16, 64, 25).collect()
    // boundaries depend only on local content, so after the insertion
    // the chunking re-synchronizes and interior chunks match EXACTLY —
    // the property fixed-size chunking cannot have
    assert(shared.exists(r => r.getAs[Long]("n_docs") == 2 &&
      r.getAs[Int]("clen") >= 64),
      s"expected a long chunk shared across the shifted copy, got ${shared.toSeq}")
    // and the real corpus yields shared passages too
    val corpus = TextAnalysis.cdcSharedChunks(spark, sf).collect()
    assert(corpus.nonEmpty)
    assert(corpus.forall(r => r.getAs[Long]("n_docs") >= 2 &&
      r.getAs[Int]("clen") >= 16))
  }

  test("tx17: BPE merges are monotone in count and compose learned symbols") {
    val m = TextAnalysis.bpeMerges(spark, sf, merges = 8).collect()
    assert(m.length == 8)
    assert(m.map(_.getAs[Int]("step")).toSeq == (0 until 8))
    // greedy BPE invariant: counts never increase as merges consume mass
    val counts = m.map(_.getAs[Long]("pair_count")).toSeq
    assert(counts.zip(counts.tail).forall { case (x, y) => x >= y },
      s"merge counts must be non-increasing: $counts")
    assert(counts.forall(_ > 0))
    // merged symbol is the concatenation and unique per step
    m.foreach { r =>
      assert(r.getAs[String]("merged") ==
        r.getAs[String]("sym_a") + r.getAs[String]("sym_b"))
    }
    assert(m.map(_.getAs[String]("merged")).distinct.length == 8)
    // determinism: a second run reproduces the identical merge table
    val again = TextAnalysis.bpeMerges(spark, sf, merges = 8).collect()
    assert(m.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
