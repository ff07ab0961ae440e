package graft

import graft.sources.Marts
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{ExplainMode, FileSourceScanExec}
import org.apache.spark.sql.functions._

/** Derived-layout marts: results must be IDENTICAL to the raw tables
  * (layout changes plans, never answers), and the plans must show the
  * layout paying off — directory-level pruning for the partitioned
  * mart, a shuffle-free fact-fact join for the bucketed pair.
  */
class MartsSpec extends SparkTestBase {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("PP1 reads only the sliced day partitions (directory pruning)") {
    val all = Marts.eventsByDay(spark, sf)
    val sliced = all.filter(
      col("event_date") >= lit("2024-01-10") && col("event_date") < lit("2024-01-13"))
    // filter-only plan: no exchange, so the scan exec is directly visible
    sliced.collect()
    val scan = sliced.queryExecution.executedPlan
      .collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec in pruned plan"))
    assert(scan.metadata("PartitionFilters").contains("event_date"),
      s"date slice did not become a partition filter: ${scan.metadata}")
    val readFiles = scan.metrics("numFiles").value
    all.collect()
    val allScan = all.queryExecution.executedPlan
      .collectFirst { case f: FileSourceScanExec => f }.get
    val totalFiles = allScan.metrics("numFiles").value
    assert(readFiles > 0 && readFiles < totalFiles,
      s"pruning read $readFiles of $totalFiles files — expected a strict subset")
  }

  test("PP1 rollup equals the same aggregate over the RAW events table") {
    val mart = Marts.partitionPrunedDaily(spark, sf).collect()
    val raw = Tables.events(spark, sf)
      .withColumn("event_date", to_date(col("ts")))
      .filter(col("event_date") >= lit("2024-01-10") && col("event_date") < lit("2024-01-13"))
      .groupBy("event_date")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy("event_date").collect()
    assert(mart.nonEmpty)
    assert(mart.map(_.toString).toSeq == raw.map(_.toString).toSeq,
      "partitioned mart must be answer-identical to the raw table")
  }

  test("BK1 bucketed fact-fact join shuffles NEITHER side") {
    val joinOnly = Marts.bucketedLineitem(spark, sf).hint("merge")
      .join(Marts.bucketedOrders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_extendedprice", "o_orderpriority")
    val p = plan(joinOnly)
    assert(p.contains("SortMergeJoin"), s"merge hint not honored:\n$p")
    // shuffle exchanges render as "(n) Exchange"; BroadcastExchange is a
    // different node name and would indicate the hint was ignored
    assert("\\(\\d+\\) Exchange\\b".r.findAllIn(p).isEmpty,
      s"bucketed join must not shuffle either side:\n$p")
    assert(p.contains("Bucketed: true"),
      s"scan does not report bucketed read:\n$p")
    // full query: the ONLY exchange is the tiny post-join rollup
    val full = plan(Marts.bucketedJoin(spark, sf))
    assert("\\(\\d+\\) Exchange\\b".r.findAllIn(full).size <= 2, // agg + sort
      s"unexpected exchanges in bucketed rollup:\n$full")
  }

  test("BK1 equals the plain raw-table join") {
    val mart = Marts.bucketedJoin(spark, sf).collect()
    val raw = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        (sum(graft.operators.Benchmark2.lineRevenueCents1e4) / 10000.0).as("revenue"))
      .orderBy("o_orderpriority").collect()
    assert(mart.nonEmpty)
    assert(mart.map(_.toString).toSeq == raw.map(_.toString).toSeq,
      "bucketed layout must be answer-identical to the raw join")
  }
}
