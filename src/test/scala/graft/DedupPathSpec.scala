package graft

import org.apache.spark.sql.functions._

/** The dd9/dd20 eval-side join has two physical shapes — broadcast
  * (benchmark-suite steady state) and bloom-prefilter + shuffled
  * equi-join (the scale path for an eval side past the broadcast-safe
  * bound). The RELATION must be identical either way: false positives
  * from the bloom are removed by the equi-join itself. This spec
  * forces both paths and compares rows exactly; the registered
  * `dd9_decontam_shuffled` / `dd20_contam_shuffled` twins additionally
  * prove the same identity against the DuckDB oracle at the gate.
  */
class DedupPathSpec extends SparkTestBase {

  test("dd9: forced bloom+shuffle path is row-identical to the broadcast path") {
    val viaBroadcast = operators.Dedup.decontaminate(spark, sf)
    val viaShuffle =
      operators.Dedup.decontaminate(spark, sf, broadcastEval = false)
    // ordered relations (ORDER BY train_doc, eval_doc) — exact compare
    assert(viaShuffle.collect().toSeq == viaBroadcast.collect().toSeq,
      "the two physical paths must produce the identical relation")
    // and they really are different physics: the scale path carries
    // the native bloom predicate, the broadcast path does not
    val shuffledPlan = viaShuffle.queryExecution.executedPlan.toString
    val broadcastPlan = viaBroadcast.queryExecution.executedPlan.toString
    assert(shuffledPlan.contains("might_contain"),
      "forced path must prefilter through BloomFilterMightContain")
    assert(!broadcastPlan.contains("might_contain"),
      "broadcast path must not pay the bloom")
  }

  test("dd20: forced bloom+shuffle exact leg preserves the tier report") {
    val viaBroadcast = operators.Dedup.contaminationTiers(spark, sf)
    val viaShuffle =
      operators.Dedup.contaminationTiers(spark, sf, evalBroadcastBound = 0L)
    assert(viaShuffle.collect().toSeq == viaBroadcast.collect().toSeq,
      "the contamination tiers must be path-independent")
  }

  test("evalGramProbeJoin selects by the counted bound and never changes the relation") {
    import spark.implicits._
    val train = Seq((10L, 1L), (11L, 1L), (12L, 2L), (13L, 99L))
      .toDF("train_doc", "gh")
    val eval = Seq((1L, 1L), (1L, 2L), (2L, 2L), (3L, 42L))
      .toDF("eval_doc", "gh")
    val expected = train.join(eval, "gh")
      .select("gh", "train_doc", "eval_doc").collect()
      .map(_.toString).sorted.toSeq
    def got(bound: Long): Seq[String] =
      operators.Dedup.evalGramProbeJoin(train, eval, bound)
        .select("gh", "train_doc", "eval_doc").collect()
        .map(_.toString).sorted.toSeq
    // force-broadcast, auto-over-bound (4 rows > 1 → bloom), auto-
    // under-bound (4 rows <= 1000 → broadcast), force-shuffle
    assert(got(Long.MaxValue) == expected)
    assert(got(1L) == expected)
    assert(got(1000L) == expected)
    assert(got(0L) == expected)
  }
}
