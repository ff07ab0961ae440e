package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkTestBase {

  test("CMS estimates never underestimate and are deterministic across runs") {
    val audit = Sketches.cmsHeavyHitters(spark, sf).collect()
    assert(audit.nonEmpty)
    assert(audit.forall(_.getAs[Boolean]("est_ok")),
      "every probe key must satisfy exact <= est <= exact + eps*N")
    // raw-sketch re-check, independent of the audit's own flag logic
    val cms = Tables.lineitem(spark, sf)
      .stat.countMinSketch("l_suppkey", 0.001, 0.99, 42)
    val exact = Tables.lineitem(spark, sf)
      .filter(col("l_suppkey").between(1, 20))
      .groupBy("l_suppkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) =>
      assert(cms.estimateCount(k) >= c,
        s"CMS underestimated key $k: ${cms.estimateCount(k)} < $c")
    }
    val again = Sketches.cmsHeavyHitters(spark, sf).collect()
    assert(audit.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "CMS must be deterministic (fixed seed, exact merges)")
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

  test("bloom probe is codegen-native: no ScalaUDF anywhere in the plan") {
    val plan = Sketches.bloomSemiJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"ScalaUDF found in bloom probe plan:\n$plan")
    assert(plan.contains("might_contain"),
      "expected the native might_contain predicate in the probe plan")
  }

  test("bloom filter has no false negatives on the dim keys") {
    val dim = Tables.customer(spark, sf).filter(col("c_mktsegment") === "BUILDING")
    val bloom = dim.stat.bloomFilter("c_custkey", math.max(dim.count(), 1L), 0.01)
    dim.select("c_custkey").collect().map(_.getLong(0)).foreach { k =>
      assert(bloom.mightContain(k), s"false negative for $k")
    }
  }

  test("A29 sketch reaggregation: estimates in bounds, TOTAL from merged sketches") {
    val out = Sketches.sketchReagg(spark, sf).collect()
    assert(out.length > 2, "expected monthly rows plus a TOTAL row")
    assert(out.forall(_.getAs[Boolean]("est_ok")),
      "every monthly estimate and the union-merged TOTAL must be in bounds")
    val total = out.filter(_.getAs[Int]("ym") == 999999)
    assert(total.length == 1)
    // TOTAL's exact side really is the global distinct (not the sum of
    // monthly distincts — customers order in many months)
    val globalDistinct = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(total.head.getAs[Long]("exact_cust") == globalDistinct)
    val monthlySum = out.filter(_.getAs[Int]("ym") != 999999)
      .map(_.getAs[Long]("exact_cust")).sum
    assert(monthlySum > globalDistinct,
      "reaggregation must be non-trivial: monthly distincts overlap")
  }

  test("MG1: Misra-Gries guarantee holds on the corpus and on adversarial hand streams") {
    import graft.functions.MisraGries.{MGAgg, MGSummary}
    // corpus audit: every true heavy hitter found, counter in bounds
    val rows = Sketches.mgHeavyHitters(spark, sf).collect()
    assert(rows.nonEmpty, "a Zipf token stream has > n/(k+1) stopwords")
    assert(rows.forall(_.getAs[Boolean]("mg_ok")),
      "the deterministic MG bound must hold for every heavy hitter")
    // hand stream, sequential fold: k=2 counters, stream of 12 items
    // where 'a' appears 6 times (> 12/3 = 4) — 'a' must survive with
    // counter in [6-4, 6]
    val agg = new MGAgg(2)
    val stream = Seq("a", "b", "a", "c", "a", "d", "a", "e", "a", "f", "a", "g")
    val folded = stream.foldLeft(agg.zero)(agg.reduce)
    assert(folded.processed == 12L)
    assert(folded.counters.size <= 2, "summary never exceeds k counters")
    val ca = folded.counters.getOrElse("a", 0L)
    assert(ca >= 2L && ca <= 6L, s"'a' must survive in [2, 6], got $ca")
    // merge path: two disjoint partial summaries, summed then trimmed
    // to k — the merged guarantee uses the COMBINED n
    val left = stream.take(6).foldLeft(agg.zero)(agg.reduce)
    val right = stream.drop(6).foldLeft(agg.zero)(agg.reduce)
    val merged = agg.merge(left, right)
    assert(merged.processed == 12L)
    assert(merged.counters.size <= 2)
    val ma = merged.counters.getOrElse("a", 0L)
    assert(ma >= 2L && ma <= 6L, s"merged 'a' in [2, 6], got $ma")
    // counters are lower bounds: never above truth on any key
    (folded.counters.toSeq ++ merged.counters.toSeq).foreach {
      case (key, v) => assert(v <= stream.count(_ == key),
        s"counter for '$key' must not exceed its true frequency")
    }
    // merge must be commutative on these inputs
    assert(agg.merge(right, left).counters == merged.counters)
    MGSummary(Map.empty, 0L) // exercise the case class ctor
    ()
  }
}
