package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkTestBase {

  test("CMS estimates never underestimate and are deterministic across runs") {
    val est = Sketches.cmsHeavyHitters(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf)
      .filter(col("l_suppkey").between(1, 20))
      .groupBy("l_suppkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"CMS underestimated key $k: ${est(k)} < $c")
    }
    val again = Sketches.cmsHeavyHitters(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est == again, "CMS must be deterministic (fixed seed, exact merges)")
  }

  test("bloom-pruned semi join returns EXACTLY the plain semi join") {
    val pruned = Sketches.bloomSemiJoin(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    val plain = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey"),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .orderBy("o_orderkey")
      .collect().map(_.getLong(0)).toSeq
    assert(pruned == plain,
      "bloom false positives must be removed by the exact join")
    assert(pruned.nonEmpty)
  }

  test("bloom filter has no false negatives on the dim keys") {
    val dim = Tables.customer(spark, sf).filter(col("c_mktsegment") === "BUILDING")
    val bloom = dim.stat.bloomFilter("c_custkey", math.max(dim.count(), 1L), 0.01)
    dim.select("c_custkey").collect().map(_.getLong(0)).foreach { k =>
      assert(bloom.mightContain(k), s"false negative for $k")
    }
  }
}
