package graft

/** Global plan hygiene over the ENTIRE query surface: every registered
  * query is planned (not executed) and its physical plan checked for
  * the operators that do not survive contact with real data volumes.
  *
  * - `CartesianProduct` (the non-broadcast full cross) is banned
  *   outright: at 100 TB any accidental cartesian is a job that never
  *   finishes. Intentional tiny crosses (j8's region×nation grid,
  *   1-row aggregate attachment) plan as BroadcastNestedLoopJoin,
  *   which is fine precisely because one side is broadcast-small.
  * - Every query must also plan successfully — a resolution error
  *   anywhere in the 150+ query surface fails here even before the
  *   oracle gate runs it.
  */
class PlanHygieneSpec extends SparkTestBase {

  test("no query plans a non-broadcast CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"queries planning a CartesianProduct: ${offenders.mkString(", ")}")
  }

  test("every oracleSql entry has a matching registered query") {
    val missingQuery = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missingQuery.isEmpty,
      s"oracleSql entries with no matching query: ${missingQuery.mkString(", ")}")
  }
}
