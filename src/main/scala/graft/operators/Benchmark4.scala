package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fourth analytical pack: the remaining classic TPC-H read shapes the
  * harness schema can express — Q7 (two-nation volume), Q8 (market
  * share), Q9 (product profit), Q11 (important stock, adapted: supply
  * value derives from lineitem since there is no partsupp table), Q13
  * (customer order-count distribution). Together with
  * [[Benchmark]]/[[Benchmark2]]/[[Benchmark3]] this closes out the
  * TPC-H pattern inventory.
  *
  * Reference scope note: the reference engine's own SQL surface is six
  * point/LIKE queries (`Codes/MovieShoppingServer/DatabaseAccessor.py`
  * 88-131); these packs exist because our engine must also serve the
  * analytical workloads the reference offloads to Impala
  * (`Document/Hive&Hdfs.md:691-695`).
  *
  * Scale posture: all dimension joins broadcast; the only fact-fact
  * shuffle is lineitem⋈orders on the join key; revenue sums run as
  * exact integer arithmetic in 1e-4 currency units (see
  * [[Benchmark2]]'s revenueExact rationale) so results are
  * engine-stable and the aggregation stays map-side partial.
  */
object Benchmark4 {

  /** Exact line revenue in 1e-4 currency units as a long — price and
    * discount snap to their 2dp grids, so sums are integer-exact.
    * Shared definition: [[Benchmark2.lineRevenueCents1e4]].
    */
  private def revCents1e4: Column = Benchmark2.lineRevenueCents1e4

  // --- Q7 shape: volume shipping between two nations, by supplier
  // nation / customer nation / ship year. The nation pair filter is
  // pushed below the joins (both nation joins broadcast); lineitem and
  // orders shuffle once on orderkey. ---
  def q7NationVolume(s: SparkSession, d: String,
                     nationA: String = "NATION_3",
                     nationB: String = "NATION_7"): DataFrame = {
    val n1 = broadcast(Tables.nation(s, d)
      .filter(col("n_name").isin(nationA, nationB))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val n2 = broadcast(Tables.nation(s, d)
      .filter(col("n_name").isin(nationA, nationB))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey"))
      .join(n1, col("s_nationkey") === col("s_nk"))
      .join(n2, col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg((sum(revCents1e4) / 10000.0).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  // --- Q8 shape: market share of one nation inside a region's market
  // for one part type — conditional-sum ratio per order year. The
  // numerator/denominator are exact integer sums; one double division
  // at the end. ---
  def q8MarketShare(s: SparkSession, d: String,
                    nation: String = "NATION_3", region: String = "ASIA",
                    pType: String = "PROMO"): DataFrame = {
    val nat = broadcast(Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk")))
    val suppNation = broadcast(Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").as("sk"), col("n_name").as("supp_nation")))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_type") === pType)),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey"))
      .join(nat, col("c_nationkey") === col("c_nk"), "left_semi")
      .join(suppNation, col("l_suppkey") === col("sk"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === nation, revCents1e4).otherwise(0L))
          .cast("double") / sum(revCents1e4).cast("double"), 6)
        .as("mkt_share"))
      .orderBy("o_year")
  }

  // --- Q9 shape: product-type profit by nation and year. No partsupp
  // table in the harness schema, so supply cost is modeled as 60% of
  // p_retailprice (same expression on the oracle side — the SHAPE
  // under test is the multi-way join + two-key rollup, not TPC-H
  // pricing). Profit stays in exact 1e-4 integer units:
  // ext_cents*(100-disc_pct) - retail_cents*60*qty. ---
  def q9ProductProfit(s: SparkSession, d: String,
                      nameLike: String = "%widget%"): DataFrame = {
    val costCents1e4 =
      Benchmark2.priceCents(col("p_retailprice")) * lit(60L) *
        col("l_quantity").cast("long")
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_name").like(nameLike))),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg((sum(revCents1e4 - costCents1e4) / 10000.0).as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  // --- Q11 shape: important parts — per-part supply value with a
  // HAVING threshold against the global total (a scalar aggregate the
  // plan broadcasts, not a re-scan). Supply value derives from
  // lineitem of one nation's suppliers. ---
  def q11ImportantParts(s: SparkSession, d: String,
                        nation: String = "NATION_5",
                        fraction: Double = 0.001): DataFrame = {
    val suppKeys = broadcast(Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).filter(col("n_name") === nation)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey")))
    val cents = Benchmark2.priceCents(col("l_extendedprice"))
    val perPart = Tables.lineitem(s, d)
      .join(suppKeys, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(cents).as("value_cents"))
    val total = perPart.agg(
      (sum(col("value_cents")) * fraction).as("threshold_cents"))
    perPart.join(broadcast(total))
      .filter(col("value_cents") > col("threshold_cents"))
      .select(col("l_partkey"), (col("value_cents") / 100.0).as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  // --- Q13 shape: customer distribution by order count — left outer
  // join so zero-order customers land in the c_count=0 bucket, then a
  // second aggregation over the counts (tiny). ---
  def q13CustomerDistribution(s: SparkSession, d: String,
                              excludePriority: String = "1-URGENT"): DataFrame = {
    val perCust = Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderpriority") =!= excludePriority),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }
}
