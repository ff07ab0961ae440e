package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-2 query pack (TPC-H pack 2,
  * window pack, agg pack, join pack, embedding ops, corpus pipeline).
  * Cross-engine value parity is the oracle gate's job; these pin the
  * *internal* consistency each operator promises.
  */
class Pack2Spec extends SparkTestBase {

  test("q2: every returned supplier achieves its part's minimum unit cost") {
    val rows = Benchmark2.q2MinCostSupplier(spark, sf)
    val costs = Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("uc"))
      .groupBy(col("l_partkey")).agg(min(col("uc")).as("true_min"))
    val bad = rows.join(costs, col("p_partkey") === col("l_partkey"))
      .filter(col("unit_cost") =!= col("true_min"))
    assert(bad.count() == 0)
    // and only size-15 parts appear
    val size15 = Tables.part(spark, sf).filter(col("p_size") === 15)
      .select("p_partkey")
    assert(rows.join(size15, Seq("p_partkey"), "left_anti").count() == 0)
  }

  test("q12: high + low counts partition the joined row count") {
    val out = Benchmark2.q12PriorityDist(spark, sf)
      .agg(sum(col("high_line_count") + col("low_line_count"))).head.getLong(0)
    val total = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(out == total)
  }

  test("q14: promo share is a percentage in [0, 100]") {
    val v = Benchmark2.q14PromoShare(spark, sf).head.getDouble(0)
    assert(v >= 0.0 && v <= 100.0)
  }

  test("q18: every order exceeds the quantity floor, verified independently") {
    val out = Benchmark2.q18BigOrders(spark, sf)
    val recomputed = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey").agg(sum(col("l_quantity")).as("q"))
      .filter(col("q") <= 300.0).select(col("l_orderkey").as("o_orderkey"))
    assert(out.join(recomputed, Seq("o_orderkey"), "left_semi").count() == 0)
  }

  test("q19: disjunction revenue equals the sum of its disjoint branches") {
    val li = Tables.lineitem(spark, sf)
      .join(broadcast(Tables.part(spark, sf)), col("l_partkey") === col("p_partkey"))
    val branches = Seq(
      col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 11),
      col("p_brand") === "Brand#23" && col("p_size").between(10, 30) &&
        col("l_quantity").between(10, 20),
      col("p_brand") === "Brand#34" && col("p_size").between(20, 50) &&
        col("l_quantity").between(20, 30))
    val perBranch = branches.map(b => li.filter(b)
      .agg(coalesce(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), lit(0.0)))
      .head.getDouble(0)).sum
    val whole = Benchmark2.q19Disjunction(spark, sf).head.getDouble(0)
    // branches are brand-disjoint, so the union is the sum
    assert(math.abs(whole - (math.rint(perBranch * 100) / 100)) < 0.02)
  }

  test("w5: ranks are unique per segment and quartiles balanced within 1") {
    val r = Windows.rankSuite(spark, sf)
    val dupRanks = r.groupBy("c_mktsegment", "rnk").count().filter(col("count") > 1)
    assert(dupRanks.count() == 0)
    val spread = r.groupBy("c_mktsegment", "quartile").count()
      .groupBy("c_mktsegment").agg((max("count") - min("count")).as("spread"))
      .filter(col("spread") > 1)
    assert(spread.count() == 0)
  }

  test("w6: first frame is itself; frames never exceed 7 days") {
    val rows = Windows.movingAvgSales(spark, sf).collect()
    assert(rows.head.getAs[Double]("ma7") == rows.head.getAs[Double]("day_sales"))
    assert(rows.forall(_.getAs[Long]("n_days_in_frame") <= 7))
  }

  test("w7: first/last navigation is constant per supplier partition") {
    val r = Windows.firstLastNav(spark, sf)
    val perSupp = r.select("l_suppkey", "first_order", "last_order").distinct()
    assert(perSupp.count() == r.select("l_suppkey").distinct().count())
  }

  test("j7: full outer keeps the union of both key sets") {
    val rich = Tables.customer(spark, sf).filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("k"))
    val jan = Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) === 1996 && month(col("o_orderdate")) === 1)
      .select(col("o_custkey").as("k")).distinct()
    val expected = rich.union(jan).distinct().count()
    assert(Relational.fullOuterActivity(spark, sf).count() == expected)
  }

  test("j8: cross grid is |region| x |nation| with |nation| true flags") {
    val g = Relational.crossGrid(spark, sf)
    val nNation = Tables.nation(spark, sf).count()
    assert(g.count() == Tables.region(spark, sf).count() * nNation)
    assert(g.filter(col("in_region")).count() == nNation)
  }

  test("a13: grand total equals the sum of the year-level set") {
    val r = Analytics.groupingSetsSales(spark, sf).collect()
    val total = r.filter(_.getAs[Int]("gid") == 3).map(_.getAs[Double]("sales")).sum
    val byYear = r.filter(_.getAs[Int]("gid") == 1).map(_.getAs[Double]("sales")).sum
    assert(math.abs(total - byYear) < 0.02)
    assert(r.map(_.getAs[Int]("gid")).toSet == Set(1, 2, 3))
  }

  test("a16: top_order really has the group's max (price, key) pair") {
    val out = Analytics.argmaxSuite(spark, sf)
    val best = Tables.orders(spark, sf)
      .withColumn("key", format_string("%018.2f#%012d", col("o_totalprice"), col("o_orderkey")))
      .groupBy("o_orderpriority").agg(max_by(col("o_orderkey"), col("key")).as("expect"))
    val bad = out.join(best, "o_orderpriority")
      .filter(col("top_order") =!= col("expect"))
    assert(bad.count() == 0)
  }

  test("km1: clusters partition the corpus across ids 0..3") {
    val r = Similarity.nearestCentroid(spark, sf).collect()
    assert(r.map(_.getAs[Long]("n_members")).sum ==
      Tables.embeddings(spark, sf).count())
    assert(r.map(_.getAs[Int]("cluster")).toSet.subsetOf(Set(0, 1, 2, 3)))
  }

  test("sim5: every hit clears the similarity threshold") {
    val r = Similarity.rangeSearch(spark, sf)
    assert(r.filter(col("cos_sim") < 0.25).count() == 0)
  }

  test("dp1: kept docs are English, long enough, and above the quality floor") {
    val kept = Pipeline.corpusSelect(spark, sf)
    assert(kept.filter(col("quality") < 0.55).count() == 0)
    assert(kept.filter(!col("n_tokens").between(20, 2000)).count() == 0)
    val nonEn = kept.join(
      Tables.documents(spark, sf).filter(col("lang") =!= "en").select("doc_id"),
      Seq("doc_id"), "left_semi")
    assert(nonEn.count() == 0)
    assert(kept.count() > 0)
  }
}
