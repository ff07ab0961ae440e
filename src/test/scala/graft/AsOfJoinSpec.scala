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

  test("tolerance bounds every direction's reach; zero and unbounded edges hold") {
    import spark.implicits._
    val l = Seq((1L, 100L, 1L), (1L, 103L, 2L), (1L, 110L, 3L))
      .toDF("k", "t", "lid")
    val r = Seq((1L, 98L, 11L), (1L, 104L, 12L))
      .toDF("rk", "rt", "tie")
    def run(dir: String, tol: Long) =
      AsOfJoin.asof(l, "k", "t", r, "rk", "rt", "tie", dir, tol)
        .select(col("lid"), col("tie")).collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
        .toMap
    // backward, tol=3: lid1 (t=100) reaches rt=98 (dist 2); lid2
    // (t=103) cannot (dist 5) -> null; lid3 (t=110) cannot reach 104
    // (dist 6) -> null
    assert(run("backward", 3L) == Map(1L -> 11L, 2L -> -1L, 3L -> -1L))
    // forward, tol=3: lid1 can't reach 104 (dist 4); lid2 can (dist 1)
    assert(run("forward", 3L) == Map(1L -> -1L, 2L -> 12L, 3L -> -1L))
    // nearest, tol=3: lid1 takes backward 98 (fwd 104 out of reach
    // anyway dist 4 > 3); lid2 takes forward 104 (backward dist 5 out);
    // lid3 has neither side in reach
    assert(run("nearest", 3L) == Map(1L -> 11L, 2L -> 12L, 3L -> -1L))
    // tol=0: only exact-time hits qualify — none here
    assert(run("backward", 0L) == Map(1L -> -1L, 2L -> -1L, 3L -> -1L))
    // unbounded default reproduces the plain directions
    assert(run("backward", Long.MaxValue) ==
      Map(1L -> 11L, 2L -> 11L, 3L -> 12L))
    assert(run("nearest", Long.MaxValue) ==
      Map(1L -> 11L, 2L -> 12L, 3L -> 12L))
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, "k", "t", r, "rk", "rt", "tie", "backward", -1L)
    }
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

  test("forward: earliest at-or-after wins, min tie on equal times, past excluded") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L), (1L, 12L, 101L), (2L, 5L, 102L))
      .toDF("k", "t", "lid")
    val r = Seq((1L, 10L, 5L), (1L, 10L, 9L), (1L, 11L, 77L), (1L, 8L, 3L),
      (2L, 4L, 1L)).toDF("rk", "rt", "tie")
    val out = AsOfJoin.asof(l, "k", "t", r, "rk", "rt", "tie", "forward")
      .select(col("lid"), col("tie")).collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toMap
    // lid 100 (t=10): at-or-after includes the t=10 rows — MIN tie
    // wins forward (first in right sort order); t=8 is the past
    assert(out(100L) == 5L, s"forward tie policy broke: $out")
    // lid 101 (t=12): nothing at-or-after -> null (left outer)
    assert(out(101L) == -1L)
    // lid 102 (t=5): the only key-2 row is in the past -> null
    assert(out(102L) == -1L)
  }

  test("nearest: closer side wins, equal distances resolve backward") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L), (1L, 20L, 101L), (1L, 33L, 102L),
      (2L, 7L, 103L), (3L, 1L, 104L)).toDF("k", "t", "lid")
    val r = Seq((1L, 7L, 1L), (1L, 12L, 2L), (1L, 26L, 3L), (1L, 30L, 4L),
      (2L, 9L, 5L)).toDF("rk", "rt", "tie")
    val out = AsOfJoin.asof(l, "k", "t", r, "rk", "rt", "tie", "nearest")
      .select(col("lid"), col("tie")).collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toMap
    // lid 100 (t=10): back 7 (d=3) vs fwd 12 (d=2) -> forward
    assert(out(100L) == 2L, s"nearest chose wrong side: $out")
    // lid 101 (t=20): back 12 (d=8) vs fwd 26 (d=6) -> forward
    assert(out(101L) == 3L)
    // lid 102 (t=33): back 30 (d=3), no forward -> backward
    assert(out(102L) == 4L)
    // lid 103 (t=7): only a future row (d=2) -> forward
    assert(out(103L) == 5L)
    // lid 104: key 3 has no right rows at all -> null
    assert(out(104L) == -1L)
    // equal distances resolve to the BACKWARD row
    val l2 = Seq((1L, 10L, 200L)).toDF("k", "t", "lid")
    val r2 = Seq((1L, 8L, 1L), (1L, 12L, 2L)).toDF("rk", "rt", "tie")
    val tie = AsOfJoin.asof(l2, "k", "t", r2, "rk", "rt", "tie", "nearest")
      .select(col("tie")).collect().head.getLong(0)
    assert(tie == 1L, "equal distance must resolve backward")
  }

  test("nearest with equal-t right rows: distance zero wins as the backward max-tie") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L)).toDF("k", "t", "lid")
    val r = Seq((1L, 10L, 5L), (1L, 10L, 9L), (1L, 11L, 77L))
      .toDF("rk", "rt", "tie")
    val out = AsOfJoin.asof(l, "k", "t", r, "rk", "rt", "tie", "nearest")
      .select(col("tie")).collect().head.getLong(0)
    // the == t rows are the backward candidate (distance 0); max tie
    // wins among them, beating the strictly-future row
    assert(out == 9L)
  }

  test("forward directions share the mixed-unit lift and reject bad directions") {
    import spark.implicits._
    val l = Seq((1L, "2024-06-15 12:00:00", 100L))
      .toDF("k", "ts", "lid")
      .select(col("k"), col("ts").cast("timestamp").as("t"), col("lid"))
    val r = Seq((1L, "2024-06-10", 7L), (1L, "2024-12-25", 9L))
      .toDF("rk", "d", "tie")
      .select(col("rk"), col("d").cast("date").as("rt"), col("tie"))
    // forward must pick the FUTURE date — compared raw (days vs
    // micros) every date would sort into the past and yield null
    val out = AsOfJoin.asof(l, "k", "t", r, "rk", "rt", "tie", "forward")
      .select(col("tie")).collect().head.getLong(0)
    assert(out == 9L, "date lift must hold for forward matches")
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, "k", "t", r, "rk", "rt", "tie", "sideways")
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
