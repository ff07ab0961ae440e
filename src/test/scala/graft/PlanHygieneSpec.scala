package graft

/** Global plan hygiene over the ENTIRE query surface: every registered
  * query is built and its final physical plan checked for the
  * operators that do not survive contact with real data volumes.
  *
  * - `CartesianProduct` (the non-broadcast full cross) is banned
  *   outright: at 100 TB any accidental cartesian is a job that never
  *   finishes. Intentional tiny crosses (j8's region×nation grid,
  *   1-row aggregate attachment) plan as BroadcastNestedLoopJoin,
  *   which is fine precisely because one side is broadcast-small.
  * - Every query must also analyze/plan successfully — a resolution
  *   error anywhere in the surface fails here before the oracle gate.
  *
  * Known limits: queries that localCheckpoint intermediates (the
  * iterative/audit ops) execute those stages during build, and the
  * checkpointed subtree surfaces as an ExistingRDD scan — operators
  * UPSTREAM of a checkpoint are invisible to this check (their own
  * specs audit those pipelines: Pack5/Pack6/DataOpsSpec).
  */
class PlanHygieneSpec extends SparkTestBase {

  // One planning pass over the whole surface; every check below reads
  // these. sparkPlan, not executedPlan: the pre-AQE physical plan
  // keeps the whole tree visible without executing adaptive stages.
  private lazy val plans: Seq[(String, org.apache.spark.sql.execution.SparkPlan)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, sf).queryExecution.sparkPlan
    }

  test("no query plans a non-broadcast CartesianProduct") {
    val offenders = plans.collect {
      case (name, p) if p.toString.contains("CartesianProduct") => name
    }
    assert(offenders.isEmpty,
      s"queries planning a CartesianProduct: ${offenders.mkString(", ")}")
  }

  // An unpartitioned window over raw (non-aggregated) input funnels
  // the full relation through ONE task — the plan shape that is
  // correctness-green at sf0.01 and dead at 100 TB. Unpartitioned
  // windows are legitimate only above an aggregate (w6's daily rollup,
  // W9/DP10's #partitions-row offset tables, pareto's 5-row shares):
  // there the aggregate has already collapsed the input to group
  // cardinality. This is the guard that keeps the dp10 fix fixed.
  test("no query plans an unpartitioned WindowExec over non-aggregate input") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    val offenders = plans.collect {
      case (name, p) if p.collect {
        case w: WindowExec if w.partitionSpec.isEmpty &&
            w.child.collectFirst { case a: BaseAggregateExec => a }.isEmpty => w
      }.nonEmpty => name
    }
    assert(offenders.isEmpty,
      s"queries with an unpartitioned WindowExec over non-aggregate input: " +
        offenders.mkString(", "))
  }

  // The whole surface is UDF-free: every expression is a codegen'd
  // builtin or a native Catalyst Expression (FloatVecDot,
  // bloom_filter_agg/might_contain) — a ScalaUDF anywhere means a
  // boxed per-row call crept into a hot path.
  test("no query plans a ScalaUDF — the surface stays codegen-native") {
    val offenders = plans.collect {
      case (name, p) if p.toString.contains("UDF") => name
    }
    assert(offenders.isEmpty,
      s"queries planning a ScalaUDF: ${offenders.mkString(", ")}")
  }

  test("every oracleSql entry has a matching registered query") {
    val missingQuery = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missingQuery.isEmpty,
      s"oracleSql entries with no matching query: ${missingQuery.mkString(", ")}")
  }
}
