package graft

/** Shared log hygiene for the forked bench/verify/test JVMs.
  *
  * Two known-benign warnings flood the output tail at WARN level and
  * camouflage real signals (the driver keeps only ~2.5 KB of tail):
  *
  *  - `WindowExec: No Partition Defined` — fired by the documented
  *    ≤#partitions-row offset tables in [[operators.GlobalOrder]].
  *    The plan-level fix (`partitionBy(lit(0))`) is constant-folded
  *    away by Spark 4's EliminateWindowPartitions rule, so the
  *    executed spec is empty again and warns. PlanHygieneSpec — which
  *    treats all-constant specs as global and bans them on
  *    grow-with-data aggregates — is the real guard; the log line is
  *    noise.
  *  - `MapPartitionsRDD: RDD n was locally checkpointed` — fired by
  *    the bench harness's between-query `release()` unpersisting the
  *    per-round localCheckpoint frames of iterative operators, which
  *    is exactly the intended lifecycle.
  *
  * Silenced per-logger via log4j2's Configurator (narrower and more
  * robust than shipping a full log4j2.properties that would replace
  * Spark's default config wholesale). Call AFTER
  * `sparkContext.setLogLevel`, which resets the root level.
  */
object Logs {
  def quietNoise(): Unit = {
    import org.apache.logging.log4j.Level
    import org.apache.logging.log4j.core.config.Configurator
    Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec", Level.ERROR)
    Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD", Level.ERROR)
  }
}
