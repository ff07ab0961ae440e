package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TPC-H-style pack 3: the correlated-subquery family (EXISTS / NOT
  * EXISTS / IN / NOT IN / correlated scalar), adapted to the synthetic
  * schema (no commitdate/receiptdate/partsupp — see TESTDATA.md).
  * These are the query shapes the reference's Impala engine serves
  * implicitly (SURVEY.md §2.3 "ABSENT ... semi/anti joins — all free
  * via Catalyst"); each decorrelates to a semi/anti/aggregate join.
  *
  * Scale notes per query in the scaladocs; nothing here collects,
  * every correlated predicate becomes a shuffled-or-broadcast join
  * Catalyst picks by size.
  */
object Benchmark3 {

  // --- Q4: order-priority checking. EXISTS a line item shipped more
  // than 30 days after the order date (the "late" surrogate for
  // commitdate < receiptdate). Decorrelates to a left-semi join on
  // orderkey; the count is a tiny hash-agg over priorities. ---
  def q4PriorityExists(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
    val late = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(late,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > date_add(col("o_orderdate"), 30),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  // --- Q15: top supplier(s) by quarterly revenue. The "create view +
  // max" form becomes one aggregate reused twice; the scalar max is a
  // 1-row broadcast, not a recompute. ---
  def q15TopSupplier(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg((sum(Benchmark2.lineRevenueCents1e4) / 10000.0).as("total_revenue"))
    val maxRev = rev.agg(max(col("total_revenue")).as("mr"))
    rev.join(broadcast(maxRev), col("total_revenue") === col("mr"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  // --- Q16: supplier-count by part attributes, excluding a brand and
  // suppliers in deficit. The oracle's NOT IN is implemented as a plain
  // left_anti join — equivalent ONLY because s_suppkey is a non-null
  // key; a nullable exclusion-set key would need a null-aware anti
  // join (NOT IN yields no rows once the set contains NULL). The
  // deficit set is tiny → broadcast. countDistinct over the join. ---
  def q16SupplierCount(s: SparkSession, d: String): DataFrame = {
    val deficit = Tables.supplier(s, d)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val p = Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#45" && col("p_size").isin(9, 19, 49))
    Tables.lineitem(s, d)
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(deficit, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  // --- Q17: small-quantity-order revenue. Correlated scalar subquery
  // avg(l_quantity) per part decorrelates to an aggregate + equi-join;
  // the per-part avg relation is orders of magnitude smaller than
  // lineitem → broadcast side of the join. ---
  def q17SmallQuantity(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val partAvg = li.groupBy(col("l_partkey").as("pk"))
      .agg((avg(col("l_quantity")) * 0.5).as("half_avg_qty"))
    val brandParts = Tables.part(s, d)
      .filter(col("p_brand") === "Brand#23").select(col("p_partkey"))
    li.join(brandParts, col("l_partkey") === col("p_partkey"))
      .join(partAvg, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("half_avg_qty"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
  }

  // --- Q20: suppliers with significant shipped volume of a part
  // family — nested IN over a grouped HAVING subquery; decorrelates to
  // aggregate → semi join → dim join. ---
  def q20VolumeSuppliers(s: SparkSession, d: String,
                         nameKey: String = "gear", minQty: Double = 400.0): DataFrame = {
    val fam = Tables.part(s, d)
      .filter(col("p_name").contains(nameKey)).select(col("p_partkey"))
    val bigShippers = Tables.lineitem(s, d)
      .join(fam, col("l_partkey") === col("p_partkey"))
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("qty"))
      .filter(col("qty") > minQty)
      .select(col("l_suppkey"))
    Tables.supplier(s, d)
      .join(bigShippers, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy("s_suppkey")
  }

  // --- Q21: suppliers who were the sole returnflag='R' supplier on a
  // multi-supplier order (the waiting-supplier shape: EXISTS another
  // supplier's line, NOT EXISTS another supplier's R line). Both
  // correlated predicates decorrelate to semi/anti joins on
  // (orderkey, suppkey-inequality). ---
  def q21SoleFaultSupplier(s: SparkSession, d: String, topN: Int = 50): DataFrame = {
    val li = Tables.lineitem(s, d)
    val l1 = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("okey"), col("l_suppkey").as("skey"))
      .dropDuplicates("okey", "skey")
    val others = li.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
      .dropDuplicates("o2", "s2")
    val othersR = l1.select(col("okey").as("o3"), col("skey").as("s3"))
    val candidates = l1
      .join(others, col("okey") === col("o2") && col("skey") =!= col("s2"),
        "left_semi")
      .join(othersR, col("okey") === col("o3") && col("skey") =!= col("s3"),
        "left_anti")
    candidates
      .join(Tables.supplier(s, d), col("skey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey").asc)
      .limit(topN)
  }

  // --- Q22: idle high-balance customers by segment: acctbal above the
  // positive-balance average (uncorrelated scalar → broadcast) and no
  // RECENT orders (anti join on the date-filtered fact — "no orders at
  // all" is empty here: every synthetic customer has some order). ---
  def q22IdleCustomers(s: SparkSession, d: String,
                       since: String = "1999-01-01"): DataFrame = {
    val c = Tables.customer(s, d)
    val posAvg = c.filter(col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal")).as("pos_avg"))
    c.join(broadcast(posAvg))
      .filter(col("c_acctbal") > col("pos_avg"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit(since).cast("timestamp"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"),
        round(sum(col("c_acctbal")), 2).as("totacctbal"))
      .orderBy("c_mktsegment")
  }
}
