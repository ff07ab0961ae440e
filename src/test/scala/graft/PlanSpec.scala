package graft

import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan audits: the properties that make these queries hold
  * up at 100 TB (predicate pushdown into the parquet scan, column
  * pruning, broadcast of dims, true top-k, codegen) asserted against
  * the actual executed plan, so a regression in plan shape fails CI
  * even while results stay correct.
  */
class PlanSpec extends SparkTestBase {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("P1/P2 filters are pushed into the parquet scan") {
    val p1 = plan(Relational.pointFilter(spark, sf))
    assert(p1.contains("PushedFilters") && p1.contains("EqualTo(o_orderkey,42)"),
      s"point filter not pushed:\n$p1")
    val p2 = plan(Relational.likeSubstring(spark, sf))
    assert(p2.contains("StringContains(p_name,wid)"), s"LIKE not pushed:\n$p2")
  }

  test("column pruning: Q1 scan reads only the 7 needed lineitem columns") {
    val p = plan(Analytics.q1PricingSummary(spark, sf))
    val readSchema = p.linesIterator.find(_.trim.startsWith("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_partkey"),
      s"unused columns not pruned: $readSchema")
    assert(readSchema.contains("l_quantity") && readSchema.contains("l_returnflag"))
  }

  test("J4 star join broadcasts all three dims (no dim-side shuffle)") {
    val p = plan(Relational.starJoinRevenue(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"expected >=3 broadcast joins (one per dim):\n$p")
  }

  test("O3 top-k plans as TakeOrderedAndProject (no full sort)") {
    val p = plan(Relational.topKByScore(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"top-k fell back to full sort:\n$p")
  }

  // AQE's pre-execution plan hides codegen spans — run the query, then
  // read the finalized adaptive plan.
  // Drive THIS df's QueryExecution (count() would plan anew), then read
  // the finalized adaptive plan; formatted mode annotates codegen spans
  // as "[codegen id : N]".
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  // The rank-filtered window families' correctness-at-scale depends on
  // Catalyst rewriting `row_number() <= k` over a window into a
  // WindowGroupLimit pair — a PARTIAL group-limit BELOW the shuffle
  // (each map task keeps k rows per group) and a Final one above.
  // Without it, every one of these becomes a one-task-per-group full
  // sort at 100 TB. Nothing else in the suite would catch a silent
  // regression (results stay identical), so the plan shape is pinned
  // here: a refactor to a non-rank function, or an upstream default
  // change to spark.sql.optimizer.windowGroupLimitThreshold, fails CI.
  test("rank-filter top-k (sp2/sp4/w1) plans a Partial WindowGroupLimit below the shuffle") {
    for ((name, df) <- Seq(
      ("sp2_reservoir", Sampling.reservoirPerGroup(spark, sf)),
      ("sp4_weighted_sample", Sampling.weightedSample(spark, sf)),
      ("w1_topn_per_group", Relational.topNPerGroup(spark, sf)))) {
      val p = plan(df)
      assert(p.contains("WindowGroupLimit"),
        s"$name: rank filter no longer plans a WindowGroupLimit —\n$p")
      assert(p.contains("Partial"),
        s"$name: no PARTIAL (map-side) group limit below the shuffle — " +
          s"the top-k is being computed by a full per-group sort:\n$p")
      assert(p.contains("Final"),
        s"$name: partial group limit present but no Final above the " +
          s"shuffle:\n$p")
    }
  }

  test("sp9's ranked relation must NOT group-limit: the exact side reads every rank") {
    // sp9 is the one rank-consumer where a WindowGroupLimit would be
    // WRONG: the checkpointed ranked relation feeds the k-row sample
    // AND the exact per-source totals (count + sum over ALL docs), so
    // the window must materialize every rank. The rank filters sit
    // beyond the checkpoint boundary precisely so Catalyst cannot push
    // them into the window — pin that the full window survives.
    val ranked = Sampling.priorityEstimateRanked(spark, sf)
    val p = plan(ranked)
    assert(p.contains("Window") && !p.contains("WindowGroupLimit"),
      s"sp9's shared ranked relation must keep the FULL window (the " +
        s"exact-total consumer reads every row):\n$p")
  }

  test("Q1 aggregation runs inside whole-stage codegen with partial aggregation") {
    val p = plan(Analytics.q1PricingSummary(spark, sf))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial+final HashAggregate pair")
    val fp = finalPlan(Analytics.q1PricingSummary(spark, sf))
    assert(fp.contains("codegen id"), s"no codegen spans:\n$fp")
  }

  test("SIM1 broadcasts the query vector (no corpus shuffle)") {
    val p = plan(Similarity.cosineTopK(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"query row should broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), "corpus must not shuffle for a 1-row query")
  }

  test("DD3 MinHash signature aggregation is codegen'd (no HOF fallback in the hot path)") {
    val p = plan(Dedup.minhashLshPairs(spark, sf))
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    val fp = finalPlan(Dedup.minhashLshPairs(spark, sf))
    assert(fp.contains("codegen id"), s"no codegen spans:\n$fp")
  }

  test("SIM3/SIM4 probe the persisted index: pushed IN filter, broadcast queries") {
    val p3 = plan(Similarity.lshAnn(spark, sf))
    assert(p3.contains("In(bkey"),
      s"LSH probe must push the bucket-key IN filter into the index scan:\n$p3")
    assert(p3.contains("graft-index"),
      s"LSH probe must scan the persisted index, not the base table:\n$p3")
    assert(!p3.contains("SortMergeJoin"),
      "probe joins broadcast — the index side must not shuffle")
    val p4 = plan(Similarity.ivfAnn(spark, sf))
    assert(p4.contains("In(cell"),
      s"IVF probe must push the cell IN filter into the index scan:\n$p4")
    assert(p4.contains("graft-index"),
      s"IVF probe must scan the persisted index:\n$p4")
  }

  test("dd28 substring probe pushes the anchor-hash IN filter into the index scan") {
    // the probe's per-query cost contract: one doc's strided anchor
    // hashes reach the persisted anchor index as a pushed In filter
    // (row-group pruning), and the corpus text is never rescanned for
    // candidate generation
    val p = plan(Dedup.exactSubstringProbe(spark, sf))
    assert(p.contains("In(gh"),
      s"probe must push the gh In filter into the anchor index scan:\n$p")
    assert(p.contains("graft-index"),
      s"probe must scan the persisted anchor index:\n$p")
  }

  test("token-catalog probes push the winner-hash IN filter into the index scan") {
    // the scaladoc's row-group-pruning claim, asserted on the plan:
    // an isin probe of the persisted (h, token) catalog must reach
    // the parquet reader as a pushed filter on the h-sorted layout
    import org.apache.spark.sql.functions.col
    val cat = graft.sources.TextIndex.tokenCatalog(spark, sf)
    val someHashes = cat.limit(5).collect().map(_.getLong(0)).toSeq
    val probe = cat.filter(col("h").isin(someHashes: _*))
    val p = plan(probe)
    assert(p.contains("In(h") || p.contains("EqualTo(h"),
      s"catalog probe must push the hash filter into the scan:\n$p")
    assert(p.contains("graft-index"),
      s"catalog probe must scan the persisted catalog:\n$p")
  }

  test("Q5 broadcasts supplier/nation/region; facts join without cartesian") {
    val p = plan(Benchmark2.q5RegionVolume(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"dims should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), "no cartesian in a star join")
  }

  test("Q19 pushes the part-side disjuncts below the join") {
    val p = plan(Benchmark2.q19Disjunction(spark, sf))
    // the (brand, size) part of the OR must reach the part scan as a
    // data filter, not stay above the join: look for brand literals in
    // a Filter over the part side
    assert(p.contains("Brand#12") && p.contains("BroadcastHashJoin"),
      s"disjunctive predicate lost:\n$p")
  }

  test("Q2 window-min stays partitioned by part (no global sort/exchange-all)") {
    val p = plan(Benchmark2.q2MinCostSupplier(spark, sf))
    assert(p.contains("Window"), s"expected window operator:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"per-part window must not collapse to one partition:\n$p")
  }

  test("Q18 HAVING aggregates before joining back (partial+final pair present)") {
    val p = plan(Benchmark2.q18BigOrders(spark, sf))
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(p.contains("TakeOrderedAndProject"), "top-100 should be top-k, not full sort")
  }

  test("W5 ranking family computes all five functions in ONE window pass") {
    val p = plan(Windows.rankSuite(spark, sf))
    assert("Window".r.findAllIn(p).size <= 2, // running + one for ntile frame at most
      s"ranking family fragmented into too many Window nodes:\n$p")
  }

  test("F-DATE scan reads only the two needed order columns") {
    val p = plan(FunctionSuites.dateSuite(spark, sf))
    val readSchema = p.linesIterator.find(_.trim.startsWith("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("o_totalprice") && !readSchema.contains("o_custkey"),
      s"unused columns not pruned: $readSchema")
  }

  test("Q4 EXISTS decorrelates to a left-semi join (no row duplication)") {
    val p = plan(Benchmark3.q4PriorityExists(spark, sf))
    assert(p.contains("LeftSemi"), s"EXISTS did not become a semi join:\n$p")
  }

  test("Q22 anti join runs broadcast (tiny recent-order keys side)") {
    val p = plan(Benchmark3.q22IdleCustomers(spark, sf))
    assert(p.contains("LeftAnti"), s"NOT EXISTS did not become an anti join:\n$p")
    // the scalar pos_avg must be a broadcast, never a shuffle of customer
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"scalar subquery side not broadcast:\n$p")
  }

  test("Q17 per-part average joins fact without exchanging lineitem twice") {
    val p = plan(Benchmark3.q17SmallQuantity(spark, sf))
    // both the fact scan and the partAvg derivation read lineitem; the
    // physical plan must keep the brand-filtered side pruned to the
    // three needed columns
    val schemas = p.linesIterator.filter(_.trim.startsWith("ReadSchema")).mkString("\n")
    assert(schemas.nonEmpty && !schemas.contains("l_shipdate"),
      s"unused lineitem columns not pruned:\n$schemas")
  }

  test("TX1 per-doc stats plan is shuffle-free (map-only projection)") {
    val p = plan(TextAnalysis.textStats(spark, sf))
    // one exchange is allowed for the presentation orderBy; none before it
    assert(!p.contains("HashAggregate"),
      s"per-doc stats should not aggregate at all:\n$p")
  }

  test("KM1 nearest-centroid assignment is a pure projection (no join, no shuffle before the rollup)") {
    val p = plan(Similarity.nearestCentroid(spark, sf))
    assert(!p.contains("Join"), s"centroid assignment must not join:\n$p")
    // formatted explain lists each node twice (tree + details) — count
    // the numbered detail headers only
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size <= 2, // agg + sort only
      s"too many exchanges:\n$p")
  }

  test("W11 funnel reuses the window's user_id partitioning for the aggregate") {
    val p = plan(Windows.conversionFunnel(spark, sf))
    // one exchange into the window, one for the presentation sort — the
    // groupBy(user_id) must NOT add a third (WindowExec preserves its
    // child's hash(user_id) partitioning)
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size <= 2,
      s"funnel aggregate re-shuffled after the window:\n$p")
    assert(p.contains("Window"), s"expected a window node:\n$p")
  }

  test("A20 moments run as ONE partial+final hash-agg pass") {
    val p = plan(Analytics.momentsSuite(spark, sf))
    // two HashAggregate headers = one partial + one final; the four
    // power sums must not fan out into separate aggregations
    assert("\\(\\d+\\) HashAggregate".r.findAllIn(p).size == 2,
      s"moments should be a single partial+final agg pair:\n$p")
  }

  test("KM2 centroid update never shuffles embeddings before the (cluster,dim) agg") {
    val p = plan(Similarity.centroidUpdate(spark, sf))
    assert(!p.contains("Join"), s"centroid update must not join:\n$p")
    // partial agg runs on the exploded rows map-side; the only
    // exchanges carry (cluster, dim) partials and the final sort
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size <= 2,
      s"too many exchanges:\n$p")
  }

  test("TX12 broadcasts DF and N back onto the TF relation (no vocab shuffle of TF)") {
    val p = plan(TextAnalysis.tfidfTopTerms(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1 &&
      p.contains("BroadcastNestedLoopJoin"),
      s"DF/N should broadcast onto TF:\n$p")
  }

  test("DD10 joins incoming grams to existing grams on the hash, then aggregates") {
    val p = plan(Dedup.incrementalDedup(spark, sf))
    // the pair join must KEY on gh (hashed grams), never gram strings:
    // assert gh appears in an equi-join key list, not merely as a
    // projected column somewhere in the plan
    assert("keys \\[\\d+\\]: \\[gh#".r.findFirstIn(p).nonEmpty,
      s"expected an equi-join keyed on gh:\n$p")
    assert(!p.contains("CartesianProduct"), s"must not cross-join docs:\n$p")
  }

  test("DP6 domain-mix factors broadcast back onto the corpus scan") {
    val p = plan(graft.operators.DataPrep.domainMix(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1,
      s"factor table should broadcast, not shuffle the corpus:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus side must not sort-merge for a 5-row factor table:\n$p")
  }

  test("SIM12 wide-code ADC: per-row LUT sum, no reconstitution agg, broadcast-only joins") {
    val p = plan(Similarity.pqAdcTopK(spark, sf))
    // the pre-round-9 long layout rebuilt per-vector scores through a
    // (q_id, vec_id) groupBy — a corpus-rows×4 shuffle per sweep; the
    // wide layout must show NO aggregate anywhere in this plan
    assert(!p.contains("HashAggregate"),
      s"ADC must be a per-row element_at sum, not a reconstitution agg:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the LUT and exact legs must broadcast, never co-shuffle:\n$p")
  }

  test("DD18 probes the persisted component index, never the gram self-join") {
    val p = plan(Dedup.clusterRepresentatives(spark, sf))
    assert(p.contains("comps_t50"),
      s"representatives must read the persisted assignment:\n$p")
    assert(!p.contains("grams_3"),
      s"the gram relation must not appear — that is the fixpoint's input:\n$p")
  }

  test("DQ6 scans the lineitem fact exactly once for its three FK edges") {
    // the count-based tail's whole point: per-key counts aggregate
    // map-side off ONE fact pass, and only vocabulary-sized count
    // relations reach the parent joins — a per-edge formulation would
    // re-scan the big table three times
    // the counts are localCheckpoint'd at construction (one fact scan
    // happens THERE), so the query plan itself must contain NO
    // lineitem scan at all — the three edges slice the pinned counts
    val p = plan(DataQuality.referentialIntegrity(spark, sf))
    val liScans = p.linesIterator
      .count(l => l.contains("Location") && l.contains("lineitem.parquet"))
    assert(liScans == 0,
      s"the three FK edges must slice the pinned counts, got $liScans scans:\n$p")
    assert(p.contains("ExistingRDD") || p.contains("LogicalRDD") ||
      p.contains("Scan ExistingRDD"),
      s"expected the pinned count relation in the plan:\n$p")
  }

  test("TX33 computes the full KL matrix without rescanning documents per pair") {
    // the per-source count relation is localCheckpoint'd at
    // construction (the corpus tokenize happens ONCE there), so the
    // query plan itself must contain no documents scan — its five
    // consumers (A/L aggregates, V, both self-join sides) all slice
    // the pinned counts
    val p = plan(operators.TextAnalysis.sourceKlMatrix(spark, sf))
    val docScans = p.linesIterator
      .count(l => l.contains("Location") && l.contains("documents.parquet"))
    assert(docScans == 0,
      s"every consumer must slice the pinned counts, got $docScans scans:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"tiny crosses must plan as broadcast nested loops:\n$p")
  }
}
