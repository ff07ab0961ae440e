package graft

import graft.operators._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Semantic invariants for the round-3 additions: TPC-H pack 4
  * (Q7/Q8/Q9/Q11/Q13 shapes), the training-data-prep pack (splits,
  * token packing, histograms, source stats, unpivot, HOF suite), and
  * the distributed global cumsum. Cross-engine value parity is the
  * oracle gate's job; these pin internal consistency and plan shape.
  */
class Pack4Spec extends SparkTestBase {

  test("q7: only the two configured nations appear, never paired with self") {
    val r = Benchmark4.q7NationVolume(spark, sf).collect()
    assert(r.nonEmpty)
    val nations = Set("NATION_3", "NATION_7")
    assert(r.forall { row =>
      val sn = row.getAs[String]("supp_nation")
      val cn = row.getAs[String]("cust_nation")
      nations(sn) && nations(cn) && sn != cn
    })
  }

  test("q8: market share is a proper fraction per year") {
    val r = Benchmark4.q8MarketShare(spark, sf).collect()
    assert(r.nonEmpty)
    assert(r.forall { row =>
      val v = row.getAs[Double]("mkt_share"); v >= 0.0 && v <= 1.0
    })
  }

  test("q9: per-(nation,year) profit sums to the global profit") {
    val out = Benchmark4.q9ProductProfit(spark, sf)
    val total = out.agg(round(sum("profit"), 2)).head.getDouble(0)
    val rev = round(col("l_extendedprice") * 100).cast("long") *
      (lit(100L) - round(col("l_discount") * 100).cast("long"))
    val cost = round(col("p_retailprice") * 100).cast("long") * lit(60L) *
      col("l_quantity").cast("long")
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_name").like("%widget%")),
        col("l_partkey") === col("p_partkey"))
      .agg(round(sum(rev - cost) / 10000.0, 2)).head.getDouble(0)
    assert(math.abs(total - expected) < 0.02)
  }

  test("q11: every retained part clears the global threshold") {
    // sf0.001 has ~10 suppliers; NATION_3 is one that exists there
    // (the oracle-gated default NATION_5 only appears from sf0.01 up)
    val r = Benchmark4.q11ImportantParts(spark, sf, nation = "NATION_3",
      fraction = 0.001)
    val vals = r.collect().map(_.getAs[Double]("value"))
    assert(vals.nonEmpty)
    // values are sorted desc and all positive
    assert(vals.sameElements(vals.sorted(Ordering[Double].reverse)))
    assert(vals.forall(_ > 0))
  }

  test("q13: distribution covers every customer exactly once") {
    val r = Benchmark4.q13CustomerDistribution(spark, sf)
    val covered = r.agg(sum("custdist")).head.getLong(0)
    assert(covered == Tables.customer(spark, sf).count())
  }

  test("dp2: split is a bucket-determined partition of the corpus") {
    val r = DataPrep.splitAssign(spark, sf)
    assert(r.filter(col("bucket") < 0 || col("bucket") >= 100).count() == 0)
    assert(r.filter(
      (col("bucket") < 80 && col("split") =!= "train") ||
        (col("bucket") >= 80 && col("bucket") < 90 && col("split") =!= "val") ||
        (col("bucket") >= 90 && col("split") =!= "test")).count() == 0)
    // deterministic: same assignment on re-run
    val twice = DataPrep.splitAssign(spark, sf)
    assert(r.exceptAll(twice).count() == 0)
  }

  test("dp3: prefix sums reconstruct, bins are monotone within source") {
    val r = DataPrep.tokenBudgetPack(spark, sf, budget = 4096L)
    // prefix_chars = previous prefix + previous n_chars, per source
    val w = Window.partitionBy("source").orderBy("doc_id")
    val bad = r
      .withColumn("expect_prefix",
        coalesce(lag(col("prefix_chars") + col("n_chars"), 1).over(w), lit(0L)))
      .filter(col("prefix_chars") =!= col("expect_prefix"))
    assert(bad.count() == 0)
    val nonMono = r
      .withColumn("prev_bin", lag(col("bin_id"), 1).over(w))
      .filter(col("prev_bin").isNotNull && col("bin_id") < col("prev_bin"))
    assert(nonMono.count() == 0)
  }

  test("dp4: log2 buckets bound their member lengths") {
    val r = DataPrep.lengthHistogram(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val b = row.getAs[Number]("log2_bucket").intValue
      val lo = row.getAs[Number]("min_chars").longValue
      val hi = row.getAs[Number]("max_chars").longValue
      assert(lo >= (1L << b) && hi < (1L << (b + 1)) && lo <= hi)
    }
    val total = r.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.documents(spark, sf).count())
  }

  test("dp5: one row per source; pct_long within [0,100]") {
    val r = DataPrep.sourceStats(spark, sf)
    assert(r.count() ==
      Tables.documents(spark, sf).select("source").distinct().count())
    assert(r.filter(col("pct_long") < 0 || col("pct_long") > 100).count() == 0)
  }

  test("a19: unpivot conserves the order count") {
    val r = DataPrep.unpivotStatus(spark, sf)
    assert(r.agg(sum("n")).head.getLong(0) ==
      Tables.orders(spark, sf).count())
    assert(r.select("status").distinct().count() == 3)
  }

  test("f_hof: aggregate matches the closed form k(k+1)(2k+1)/6") {
    val r = DataPrep.hofSuite(spark, sf)
      .withColumn("k",
        (col("p_partkey") % 5 + 3).cast("long"))
      .filter(col("sum_sq") =!=
        col("k") * (col("k") + 1) * (col("k") * 2 + 1) / 2 / 3)
    assert(r.count() == 0)
  }

  test("w9: distributed cumsum equals the single-window reference") {
    val dist = DataPrep.distributedCumsum(spark, sf)
    val w = Window.orderBy("o_orderkey")
    val naive = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        (sum(round(col("o_totalprice") * 100).cast("long")).over(w) / 100.0)
          .as("cum_spend"))
    assert(dist.exceptAll(naive).count() == 0 &&
      naive.exceptAll(dist).count() == 0)
  }

  test("w9 plan: the full-table window partitions by pid, never global") {
    val plan = DataPrep.distributedCumsum(spark, sf)
      .queryExecution.executedPlan.toString
    // every Window over the fact data must carry a partition spec;
    // the only permissible global window runs over the per-partition
    // offset table (#partitions rows). Check: no window sorts the
    // whole orders relation without a partition key.
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toList
    assert(windowLines.exists(_.contains("pid")),
      s"expected a pid-partitioned window in:\n$plan")
  }
}
