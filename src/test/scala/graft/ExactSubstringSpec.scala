package graft

import org.apache.spark.sql.functions._

/** dd26 (exact substring dedup) — the operator the set-similarity
  * suite cannot express: a long verbatim quote inside two otherwise-
  * different documents. The flagship vector plants a 60-token verbatim
  * overlap that n-gram Jaccard (the dd2 family) scores well below its
  * 0.5 threshold — dd26 must report it exactly (maximal bounds, not
  * just existence). The remaining vectors pin the operator's edges:
  * the >= minRun cut, maximality, multiple runs per pair, stride
  * alignment, boundary runs, symmetric emission, and the strict
  * anchor-frequency cap.
  */
class ExactSubstringSpec extends SparkTestBase {
  import operators.Dedup

  private def docsOf(rows: (Long, Seq[String])*) = {
    import spark.implicits._
    rows.toSeq.map { case (id, ws) => (id, ws.mkString(" ")) }
      .toDF("doc_id", "text")
  }

  private def toks(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  test("planted 60-token verbatim overlap: dd26 catches what dd2's Jaccard misses") {
    val shared = toks("s", 60)
    val docs = docsOf(
      1L -> (toks("a", 40) ++ shared ++ toks("x", 40)),
      2L -> (toks("b", 40) ++ shared ++ toks("y", 40)))
    // dd2's verdict on the same pair: 3-gram Jaccard = 58 shared grams
    // over a 218-gram union ≈ 0.27 — BELOW the 0.5 near-dup threshold,
    // so the whole set-similarity family reports no pair at all
    val grams = Dedup.gramRowsOf(docs, 3)
    assert(Dedup.pairsTouching(grams, grams, 0.5).count() == 0,
      "n-gram Jaccard at its own threshold must miss the quoted span")
    // dd26's verdict: exactly the maximal run, with exact bounds
    val runs = Dedup.exactSubstringRunsOf(docs).collect()
    assert(runs.length == 1, s"one maximal run expected, got ${runs.toSeq}")
    val r = runs.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 41L && r.getLong(3) == 41L,
      "1-based starts just after each 40-token unique prefix")
    assert(r.getLong(4) == 60L, "the run is maximal — all 60 tokens")
  }

  test("minRun cut is exact: 15 reported, 14 silent") {
    val r15 = toks("r", 15)
    val r14 = toks("q", 14)
    val docs = docsOf(
      1L -> (toks("a", 9) ++ r15 ++ toks("x", 5)),
      2L -> (toks("b", 3) ++ r15 ++ toks("y", 11)),
      3L -> (toks("c", 9) ++ r14 ++ toks("z", 6)),
      4L -> (toks("d", 5) ++ r14 ++ toks("w", 8)))
    val runs = Dedup.exactSubstringRunsOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(runs.toSeq == Seq((1L, 2L, 10L, 4L, 15L)),
      "exactly the >= 15 run, with its exact starts; the 14 run silent")
  }

  test("two separate runs between one pair are both reported, once each") {
    val run1 = toks("p", 20)
    val run2 = toks("r", 18)
    val docs = docsOf(
      5L -> (toks("a", 10) ++ run1 ++ toks("x", 10) ++ run2 ++ toks("u", 5)),
      9L -> (toks("b", 7) ++ run1 ++ toks("y", 12) ++ run2 ++ toks("v", 9)))
    val runs = Dedup.exactSubstringRunsOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // run1 spans 20 >= 2 strides — multiple anchors discover it, the
    // normalized maximal bounds dedup it to ONE row
    assert(runs == Seq(
      (5L, 9L, 11L, 8L, 20L),
      (5L, 9L, 41L, 40L, 18L)),
      s"both maximal runs, each once: $runs")
  }

  test("stride alignment: a minimum-length run at an awkward offset is still found") {
    // detection guarantee: a 15-run has anchor starts spanning
    // 15 - 8 + 1 = 8 consecutive positions = exactly one stride window,
    // wherever it sits
    for (off <- 0 to 9) {
      val run = toks("r", 15)
      val docs = docsOf(
        1L -> (toks("a", off) ++ run ++ toks("x", 4)),
        2L -> (toks("b", 23) ++ run))
      val runs = Dedup.exactSubstringRunsOf(docs).collect()
      assert(runs.length == 1 && runs.head.getLong(4) == 15L &&
        runs.head.getLong(2) == off + 1L && runs.head.getLong(3) == 24L,
        s"offset $off: run must be found with exact bounds")
    }
  }

  test("containment: a whole document inside another extends to both boundaries") {
    val inner = toks("s", 25)
    val docs = docsOf(
      7L -> inner,
      3L -> (toks("a", 13) ++ inner ++ toks("x", 11)))
    val runs = Dedup.exactSubstringRunsOf(docs).collect()
    assert(runs.length == 1)
    val r = runs.head
    // ids normalized: doc_a = 3 (smaller), start in 3 is 14, start in
    // the contained doc is its own position 1 — left extension must
    // stop cleanly at the array boundary
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((3L, 7L, 14L, 1L, 25L)))
  }

  test("input id order does not matter: runs emit as (min_id, max_id) once") {
    val run = toks("r", 16)
    val a = docsOf(2L -> (toks("a", 5) ++ run), 1L -> (run ++ toks("b", 6)))
    val b = docsOf(1L -> (run ++ toks("b", 6)), 2L -> (toks("a", 5) ++ run))
    val ra = Dedup.exactSubstringRunsOf(a).collect().map(_.toString).toSeq
    val rb = Dedup.exactSubstringRunsOf(b).collect().map(_.toString).toSeq
    assert(ra == rb && ra.length == 1)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("dd27 scrub: the later doc loses the span, the earlier doc keeps it") {
    val shared = toks("s", 60)
    val d1 = toks("a", 40) ++ shared ++ toks("x", 40)
    val d2 = toks("b", 40) ++ shared ++ toks("y", 40)
    val docs = docsOf(1L -> d1, 2L -> d2)
    val out = Dedup.exactSubstringScrubOf(docs,
        Dedup.exactSubstringRunsOf(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSeq
    assert(out == Seq(
      (1L, 140L, 0L, 0L, md5hex(d1.mkString(" "))),
      (2L, 140L, 60L, 1L,
        md5hex((toks("b", 40) ++ toks("y", 40)).mkString(" ")))),
      s"earlier doc untouched, later doc cut token-exact: $out")
  }

  test("dd27 scrub: overlapping losing spans merge before counting") {
    // doc 9 shares tokens r0..r29 with doc 1 and r15..r44 with doc 2 —
    // two runs overlapping in doc 9 must union into ONE 45-token span
    val r = toks("r", 45)
    val docs = docsOf(
      1L -> (toks("a", 5) ++ r.take(30)),
      2L -> (toks("b", 8) ++ r.drop(15)),
      9L -> (toks("c", 10) ++ r ++ toks("z", 5)))
    val out = Dedup.exactSubstringScrubOf(docs,
        Dedup.exactSubstringRunsOf(docs))
      .collect().map(x => (x.getLong(0), x.getLong(2), x.getLong(3))).toSeq
    // docs 1 and 2 share r15..r29 (15 tokens >= minRun): doc 2 loses it
    assert(out == Seq((1L, 0L, 0L), (2L, 15L, 1L), (9L, 45L, 1L)),
      s"merged interval, no double-count: $out")
  }

  test("dd27 scrub: a duplicate class keeps exactly its minimum-id copy") {
    val shared = toks("s", 20)
    val docs = docsOf(
      3L -> (toks("a", 6) ++ shared),
      5L -> (shared ++ toks("b", 7)),
      8L -> (toks("c", 4) ++ shared ++ toks("d", 3)))
    val out = Dedup.exactSubstringScrubOf(docs,
        Dedup.exactSubstringRunsOf(docs))
      .collect().map(x => (x.getLong(0), x.getLong(2))).toSeq
    assert(out == Seq((3L, 0L), (5L, 20L), (8L, 20L)),
      s"min-id doc keeps, every later doc scrubs its copy once: $out")
  }

  test("dd28 probe equals the dd26 relation restricted to the probe doc") {
    val q = 8L
    val probe = Dedup.exactSubstringProbe(spark, sf, q)
      .collect().map(_.toString).toSeq
    val full = Dedup.exactSubstringRuns(spark, sf)
      .filter(col("doc_a") === q || col("doc_b") === q)
      .select(
        when(col("doc_a") === q, col("doc_b"))
          .otherwise(col("doc_a")).as("match_doc"),
        when(col("doc_a") === q, col("start_a"))
          .otherwise(col("start_b")).as("start_probe"),
        when(col("doc_a") === q, col("start_b"))
          .otherwise(col("start_a")).as("start_match"),
        col("run_len"))
      .orderBy("match_doc", "start_probe", "start_match")
      .collect().map(_.toString).toSeq
    assert(probe.nonEmpty, "probe doc 8 must have corpus matches at sf0.001")
    assert(probe == full,
      "the index probe and the corpus self-join must agree on doc 8's runs")
  }

  test("dd29 winnow screen covers every dd26 exact-run pair (the guarantee bridge)") {
    // the winnowing guarantee: every window of w consecutive grams
    // selects a fingerprint, so a verbatim run of >= k + w − 1 tokens
    // shares one deterministically — a >= 15-token run (dd26's floor)
    // spans 10 interior windows and must surface in the dd29 report.
    // This pins the screen/confirm contract: dd29 is the cheap wide
    // net, dd26 the exact confirm, and nothing exact escapes the net.
    val exact = Dedup.exactSubstringRuns(spark, sf)
      .select("doc_a", "doc_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val screened = Dedup.winnowMatchPairs(spark, sf)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "sf0.001 must have exact-run pairs")
    assert(exact.subsetOf(screened),
      s"dd26 pairs missing from the dd29 screen: ${exact -- screened}")
  }

  test("anchor index is delta-composable: base ∪ delta is row-identical to the full index") {
    // positional anchors are a pure per-document function — the dd30
    // ingest loop's foundation: a batch writes ONLY its own delta and
    // the logical index is the union, no rewrite of existing files
    val maxId = Tables.documents(spark, sf)
      .agg(org.apache.spark.sql.functions.max(col("doc_id"))).head.getLong(0)
    val boundary = maxId * 4 / 5 + 1
    val full = sources.TextIndex.anchorIndex(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val union = sources.TextIndex.anchorIndexBase(spark, sf, boundary)
      .unionByName(sources.TextIndex.anchorIndexDelta(spark, sf, boundary))
      .collect().map(_.toString).sorted.toSeq
    assert(union == full, "base ∪ delta must equal the full anchor index")
  }

  test("anchor compaction is a pure file fold: successor == full index, re-clustered on gh") {
    val maxId = Tables.documents(spark, sf)
      .agg(org.apache.spark.sql.functions.max(col("doc_id"))).head.getLong(0)
    val boundary = maxId * 4 / 5 + 1
    val compacted = sources.TextIndex.compactAnchorIndex(spark, sf, boundary)
    assert(compacted.collect().map(_.toString).sorted.toSeq ==
      sources.TextIndex.anchorIndex(spark, sf)
        .collect().map(_.toString).sorted.toSeq,
      "compaction must fold files without recomputing anchors")
    // the re-cluster restores dd28's point-probe locality: per file,
    // gh ranges must not all overlap (row-group stats become useful)
    val perFile = compacted
      .withColumn("f", org.apache.spark.sql.functions.input_file_name())
      .groupBy("f")
      .agg(org.apache.spark.sql.functions.min("gh").as("lo"),
        org.apache.spark.sql.functions.max("gh").as("hi"))
      .collect()
    if (perFile.length > 1) {
      val sorted = perFile.map(r => (r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      val disjoint = sorted.sliding(2).forall {
        case Array((_, hi1), (lo2, _)) => lo2 >= hi1
        case _ => true
      }
      assert(disjoint, "range-clustered files must have ordered gh ranges")
    }
  }

  test("dd30 equals the dd26 relation restricted to batch-involving pairs") {
    val maxId = Tables.documents(spark, sf)
      .agg(org.apache.spark.sql.functions.max(col("doc_id"))).head.getLong(0)
    val boundary = maxId * 4 / 5 + 1
    val incr = Dedup.incrementalSubstringPairs(spark, sf)
      .collect().map(_.toString).toSeq
    val full = Dedup.exactSubstringRuns(spark, sf)
      .filter(col("doc_a") >= boundary || col("doc_b") >= boundary)
      .collect().map(_.toString).toSeq
    assert(incr == full,
      "the ingest loop and the corpus self-join must agree on batch pairs")
  }

  test("dd31 self-repetition: distant within-doc repeats, exact bounds") {
    val r = toks("r", 6)
    val docs = docsOf(
      1L -> (toks("a", 5) ++ r ++ toks("b", 7) ++ r ++ toks("c", 3)),
      2L -> toks("u", 20)) // no repeats — must stay silent
    val runs = Dedup.selfRepetitionRunsOf(docs)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3))).toSeq
    assert(runs == Seq((1L, 6L, 19L, 6L)),
      s"one maximal repeat with exact positions: $runs")
  }

  test("dd31 self-repetition: a tandem repeat reports every diagonal, overlap included") {
    // 8 copies of one token: the run on diagonal d is (1, 1+d, 8−d) —
    // a repeat may overlap its own image, and both the extension and
    // the island oracle count it the same way
    val docs = docsOf(4L -> (Seq.fill(8)("w") ++ toks("t", 6)))
    val runs = Dedup.selfRepetitionRunsOf(docs)
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getLong(3))).toSeq
    assert(runs == Seq((1L, 2L, 7L), (1L, 3L, 6L), (1L, 4L, 5L),
      (1L, 5L, 4L)), s"diagonals 1-4 of the tandem repeat: $runs")
  }

  test("dd31 is strictly within-doc: cross-document runs are not its business") {
    val shared = toks("s", 10)
    val docs = docsOf(
      1L -> (toks("a", 4) ++ shared),
      2L -> (toks("b", 6) ++ shared))
    assert(Dedup.selfRepetitionRunsOf(docs).count() == 0,
      "a cross-doc quote must not appear in the self-repetition relation")
  }

  test("dd32 equals the cross-split restriction of the 13-token run relation") {
    val m = 97L
    val decon = Dedup.substringDecontaminate(spark, sf)
      .collect().map(_.toString).toSeq
    val isEval = (c: org.apache.spark.sql.Column) => c % m === 0
    val full = Dedup.exactSubstringRunsOf(
        Tables.documents(spark, sf), anchor = 8, minRun = 13)
      .filter(isEval(col("doc_a")) =!= isEval(col("doc_b")))
      .select(
        when(isEval(col("doc_a")), col("doc_a"))
          .otherwise(col("doc_b")).as("eval_doc"),
        when(isEval(col("doc_a")), col("doc_b"))
          .otherwise(col("doc_a")).as("train_doc"),
        when(isEval(col("doc_a")), col("start_a"))
          .otherwise(col("start_b")).as("start_eval"),
        when(isEval(col("doc_a")), col("start_b"))
          .otherwise(col("start_a")).as("start_train"),
        col("run_len"))
      .orderBy("eval_doc", "train_doc", "start_eval", "start_train")
      .collect().map(_.toString).toSeq
    assert(decon.nonEmpty, "sf0.001 must have planted contamination")
    assert(decon == full,
      "the split probe and the full self-join must agree on contamination")
  }

  test("strict anchor cap: a hot anchor fails loudly instead of losing runs") {
    val hot = toks("h", 8)
    val docs = docsOf((1L to 6L).map(i =>
      i -> (Seq(s"u$i") ++ hot ++ toks(s"t$i", 10))): _*)
    val e = intercept[Throwable] {
      Dedup.exactSubstringRunsOf(docs, maxAnchorFreq = 4L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("dd26 anchor frequency cap")),
      s"cap engagement must name itself: $e")
  }
}
