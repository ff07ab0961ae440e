package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Second analytical pack: the remaining classic TPC-H query shapes,
  * adapted to the harness schema (no partsupp/shipmode/commitdate
  * columns — supply cost derives from lineitem, shipmode analogues use
  * order priority). Together with [[Benchmark]] this covers every join/
  * agg/subquery pattern in the TPC-H read surface that the schema can
  * express.
  *
  * Scale notes (100 TB posture): every dimension join below broadcasts
  * the dim side explicitly; the only fact-fact shuffles are
  * lineitem⋈orders keyed on the join key, and pre-aggregation
  * (partial+final) runs map-side before each shuffle. Window steps
  * partition by high-cardinality keys (partkey), never globally.
  */
object Benchmark2 {

  /** Exact discounted revenue in 1e-4 currency units, as integers:
    * price (2dp) and discount (2dp) snap to their decimal grids as
    * longs, so the per-group sum is exact integer arithmetic and the
    * final /10000.0 is one division of identical integers in any
    * engine — no float-accumulation or half-way-rounding divergence
    * (round(sum(price*(1-disc)),2) lands on half-cent boundaries where
    * Spark's BigDecimal string rounding and C-style binary rounding
    * disagree).
    */
  /** Exact price in integer cents — THE parity-critical snap-to-grid
    * primitive every cents-exact aggregate builds on; keep the one
    * definition so a dtype/rounding adjustment can never drift between
    * query packs.
    */
  private[graft] def priceCents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(c * 100).cast("long")

  /** Exact per-row line revenue in 1e-4 currency units as a long. */
  private[graft] def lineRevenueCents1e4: org.apache.spark.sql.Column =
    priceCents(col("l_extendedprice")) *
      (lit(100L) - priceCents(col("l_discount")))

  private def revenueExact: org.apache.spark.sql.Column =
    sum(lineRevenueCents1e4) / 10000.0

  // --- Q2 shape: min-cost supplier per part. The reference pattern is
  // a correlated scalar subquery (min supply cost per part);
  // decorrelated here as a window-min over the per-(part,supplier)
  // aggregate — one shuffle on partkey, no subquery re-execution. ---
  def q2MinCostSupplier(s: SparkSession, d: String): DataFrame = {
    val unitCost = Tables.lineitem(s, d)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
    val perPartMin = Window.partitionBy("l_partkey")
    unitCost
      .join(broadcast(Tables.part(s, d).filter(col("p_size") === 15)
        .select("p_partkey", "p_name")), col("l_partkey") === col("p_partkey"))
      .withColumn("min_cost", min(col("unit_cost")).over(perPartMin))
      .filter(col("unit_cost") === col("min_cost"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      // unrounded on purpose: min() picks one exact division result, so
      // both engines hold the bit-identical double; rounding would
      // re-introduce the string-vs-binary half-way divergence on exact
      // 5e-5-boundary quotients (observed at sf0.1)
      .select(col("p_partkey"), col("s_suppkey"), col("s_name"), col("n_name"),
        col("unit_cost"))
      .orderBy("p_partkey", "s_suppkey")
  }

  // --- Q5 shape: local-supplier volume — 6-way join where customer and
  // supplier must share a nation, region-filtered. nation/region/
  // supplier broadcast; the c_nationkey = s_nationkey condition rides
  // on the lineitem⋈supplier join, not a separate shuffle. ---
  def q5RegionVolume(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(revenueExact.as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)

  // --- Q10 shape: returned-item reporting — revenue lost to returns
  // per customer in a quarter, top 20. ---
  def q10ReturnedItems(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1996-04-01 00:00:00"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(revenueExact.as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)

  // --- Q12 shape: priority distribution per line status (shipmode
  // analogue) — CASE-conditional counts after one fact-fact join. ---
  def q12PriorityDist(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
          .as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0).otherwise(1))
          .as("low_line_count"))
      .orderBy("l_linestatus")

  // --- Q14 shape: promo revenue share — conditional aggregate ratio
  // over a broadcast part join, one month of lineitem. ---
  def q14PromoShare(s: SparkSession, d: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-09-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1996-10-01 00:00:00")))
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0) * sum(when(col("p_type") === "PROMO", rev).otherwise(0.0))
        / sum(rev), 4).as("promo_share"))
  }

  // --- Q18 shape: large-volume orders — HAVING over a grouped fact,
  // then joins back to orders/customer. The qty aggregate shuffles
  // (orderkey, partial-sum) pairs only. ---
  def q18BigOrders(s: SparkSession, d: String, minQty: Double = 300.0): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
      .filter(col("total_qty") > minQty)
    Tables.orders(s, d)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
  }

  // --- Q19 shape: disjunctive pushdown — OR of three (brand, size,
  // qty) conjunctions. Catalyst extracts the common l_partkey join key
  // and pushes the part-only disjuncts below the join. ---
  def q19Disjunction(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(20, 50) &&
          col("l_quantity").between(20, 30)))
      .agg((sum(lineRevenueCents1e4) / 10000.0).as("revenue"))
}
