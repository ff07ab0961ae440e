package graft

import graft.operators.GlobalOrder
import org.apache.spark.sql.functions._

/** The boundary-pair ntile (withNtiles) must be VALUE-IDENTICAL to the
  * rank-based fold (withNtile) it replaces — including when the metric
  * column carries NULLs, which sort NULLS FIRST under asc / NULLS LAST
  * under desc in both the range shuffle and the rank window. The
  * boundary comparison used to evaluate lit(null) < metric to NULL and
  * silently drop null-metric rows into bucket 1; this spec pins the
  * null-safe rewrite against the rank-based ground truth.
  */
class GlobalOrderSpec extends SparkTestBase {

  test("withNtiles matches the withNtile fold when metrics contain NULLs") {
    import spark.implicits._
    val df = Seq(
      (1, Some(5.0)), (2, None), (3, Some(1.0)), (4, None),
      (5, Some(9.0)), (6, Some(2.0)), (7, Some(2.0)), (8, None),
      (9, Some(7.0)), (10, Some(0.5)), (11, Some(3.5)), (12, None),
      (13, Some(8.25)), (14, Some(1.0))
    ).toDF("k", "m")
    for (asc <- Seq(true, false)) {
      val fused = GlobalOrder
        .withNtiles(df, "k", 4, Seq(("b", col("m"), asc)))
        .select("k", "b").collect()
        .map(r => r.getInt(0) -> r.getInt(1)).toMap
      val order =
        if (asc) Seq(col("m").asc, col("k").asc)
        else Seq(col("m").desc, col("k").asc)
      val folded = GlobalOrder.withNtile(df, 4, "b", order: _*)
        .select("k", "b").collect()
        .map(r => r.getInt(0) -> r.getInt(1)).toMap
      assert(fused === folded, s"asc=$asc")
    }
  }

  test("withNtiles on all-null metric puts every row in bucket order by key") {
    import spark.implicits._
    val df = Seq((1, Option.empty[Double]), (2, None), (3, None), (4, None))
      .toDF("k", "m")
    val fused = GlobalOrder
      .withNtiles(df, "k", 2, Seq(("b", col("m"), true)))
      .select("k", "b").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    val folded = GlobalOrder
      .withNtile(df, 2, "b", col("m").asc, col("k").asc)
      .select("k", "b").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(fused === folded)
  }
}
