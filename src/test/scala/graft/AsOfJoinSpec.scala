package graft

import graft.operators.Relational
import graft.plans.AsOfJoin
import org.apache.spark.sql.functions._

/** The native rung-(c) as-of join (AsOfJoinPlan/Strategy/Exec) against
  * its independently-formulated twin: j6's union + ignore-nulls-window
  * composition. Value equality on the real tables is the operator's
  * correctness anchor (the oracle gate then hashes it against DuckDB's
  * replay as j11); these specs add plan-shape and edge-semantics pins
  * the hash can't see.
  */
class AsOfJoinSpec extends SparkTestBase {

  test("native as-of equals the union+window composition row for row") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    val native = rows(Relational.asofJoinNative(spark, sf))
    val composed = rows(Relational.asofJoin(spark, sf))
    assert(native.nonEmpty && native == composed)
    // at sf0.001 every event user has a prior order, so this relation
    // exercises only the matched branch; the crafted tests below pin
    // the null (no-qualifying-row) branch
    assert(native.exists(_._3 != -1L), "need some matched events")
  }

  test("plan: AsOfJoinExec, two exchanges, no window and no join fallback") {
    val plan = Relational.asofJoinNative(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"native exec missing:\n$plan")
    assert(!plan.contains("Window"), s"window fallback leaked in:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashJoin"),
      s"join fallback leaked in:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected the two SMJ-style exchanges:\n$plan")
  }

  test("equal-time right rows resolve to the max tie-break; strict future excluded") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L), (1L, 9L, 101L), (2L, 5L, 102L))
      .toDF("k", "t", "lid")
    val r = Seq((1L, 10L, 5L), (1L, 10L, 9L), (1L, 11L, 77L), (2L, 6L, 1L))
      .toDF("k", "t", "tie")
      .select(col("k").as("rk"), col("t").as("rt"), col("tie"))
    val out = AsOfJoin.asof(l, "k", "t", r, "rk", "rt", "tie")
      .select(col("lid"), col("tie")).collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toMap
    // lid 100 (t=10): ties 5 and 9 both qualify at t=10 — max wins;
    // the t=11 row is the future and must not
    assert(out(100L) == 9L, s"tie policy broke: $out")
    // lid 101 (t=9): no right row at-or-before -> null
    assert(out(101L) == -1L)
    // lid 102 (t=5): right row exists only at t=6 -> null (left outer)
    assert(out(102L) == -1L)
  }

  test("per-key independence: a key's match never leaks to another key") {
    import spark.implicits._
    val l = Seq((1L, 100L, 1L), (2L, 100L, 2L), (3L, 100L, 3L))
      .toDF("k", "t", "lid")
    val r = Seq((2L, 50L, 42L)).toDF("rk", "rt", "tie")
    val out = AsOfJoin.asof(l, "k", "t", r, "rk", "rt", "tie")
      .select(col("lid"), col("tie")).collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toMap
    assert(out == Map(1L -> -1L, 2L -> 42L, 3L -> -1L))
  }

  test("mixed timestamp/date times compare in one unit (date lifted to micros)") {
    import spark.implicits._
    // Internal representations differ by ~14 orders of magnitude
    // (micros vs days); compared raw, every right date would qualify
    // and the future row below would wrongly win. A right DATE that
    // POSTDATES the left timestamp must not match.
    val l = Seq((1L, "2024-06-15 12:00:00", 100L), (1L, "2024-01-02 00:00:00", 101L))
      .toDF("k", "ts", "lid")
      .select(col("k"), col("ts").cast("timestamp").as("t"), col("lid"))
    val r = Seq((1L, "2024-06-10", 7L), (1L, "2024-12-25", 9L))
      .toDF("rk", "d", "tie")
      .select(col("rk"), col("d").cast("date").as("rt"), col("tie"))
    val out = AsOfJoin.asof(l, "k", "t", r, "rk", "rt", "tie")
      .select(col("lid"), col("tie")).collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toMap
    // lid 100 (Jun 15): Jun 10 is at-or-before, Dec 25 is the future
    assert(out(100L) == 7L, s"mixed-unit compare broke: $out")
    // lid 101 (Jan 2): both right dates are in its future -> null
    assert(out(101L) == -1L, s"future date matched: $out")
    // and date-vs-integral has no principled unit: rejected up front
    val rInt = Seq((1L, 5L, 1L)).toDF("rk", "rt", "tie")
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, "k", "t", rInt, "rk", "rt", "tie")
    }
  }

  test("type contract is enforced at the API boundary") {
    import spark.implicits._
    val l = Seq(("a", 1L, 1L)).toDF("k", "t", "lid")
    val r = Seq((1L, 1L, 1L)).toDF("rk", "rt", "tie")
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, "missing", "t", r, "rk", "rt", "tie")
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, "k", "t", r, "rk", "rt", "tie") // string key
    }
  }
}
