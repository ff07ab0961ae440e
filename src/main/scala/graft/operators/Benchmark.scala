package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classic analytical query shapes beyond the reference's own surface
  * (general-case breadth the engine must support once users bring real
  * workloads): TPC-H-style Q3/Q6, scalar and correlated subqueries,
  * CUBE grouping sets, pivot. All oracled against DuckDB.
  */
object Benchmark {

  // --- Q3 shape: shipping-priority — 3-way join, range predicates,
  // grouped revenue, top-10. Dims broadcast; one fact-fact shuffle. ---
  def q3ShippingPriority(s: SparkSession, d: String): DataFrame = {
    val cutoff = to_timestamp(lit("1997-03-15 00:00:00"))
    Tables.lineitem(s, d).filter(col("l_shipdate") > cutoff)
      .join(Tables.orders(s, d).filter(col("o_orderdate") < cutoff),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_orderpriority"))
      .agg((sum(Benchmark2.lineRevenueCents1e4) / 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  // --- Q6 shape: pure filter + ungrouped agg — the codegen showcase
  // (scan -> filter -> partial/final agg, zero shuffle rows). ---
  def q6ForecastRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")) &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))

  // --- Scalar subquery: customers above the global average balance.
  // The 1-row aggregate is broadcast, not recomputed per row. ---
  def aboveAvgBalance(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val globalAvg = c.agg(avg(col("c_acctbal")).as("global_avg"))
    c.crossJoin(broadcast(globalAvg))
      .filter(col("c_acctbal") > col("global_avg"))
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")
  }

  // --- Correlated subquery shape: orders 1.5x above their own
  // customer's average — decorrelated into a grouped self-join (what
  // Catalyst does to the subquery form internally). ---
  def aboveCustomerAvg(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val perCust = o.groupBy(col("o_custkey").as("k"))
      .agg(avg(col("o_totalprice")).as("cust_avg"))
    o.join(perCust, col("o_custkey") === col("k"))
      .filter(col("o_totalprice") > col("cust_avg") * 1.5)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  // --- CUBE: all grouping-set combinations of (year, priority). ---
  def cubeSales(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(year(col("o_orderdate")).as("y"), col("o_orderpriority"))
      .agg(round(sum(col("o_totalprice")), 2).as("sales"))
      .orderBy(col("y").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  // --- Pivot: order status -> columns (conditional-agg equivalent). ---
  def pivotStatus(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("y"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(round(sum(col("o_totalprice")), 2))
      .orderBy("y")
}
