package graft

/** Every declared query must be bit-deterministic across runs — the
  * driver's t2 gate hashes values, so ANY nondeterminism (unordered
  * output, rand(), unstable ties, partial-agg FP order) fails the
  * round. Cheaper to catch here at sf0.001.
  */
class DeterminismSpec extends SparkTestBase {

  test("every query returns identical rows on a second run") {
    val flaky = SparkEntry.queries.flatMap { case (name, fn) =>
      val a = fn(spark, sf).collect()
      val b = fn(spark, sf).collect()
      if (a.length != b.length ||
          !a.zip(b).forall { case (x, y) => x == y }) Some(name)
      else None
    }
    assert(flaky.isEmpty, s"nondeterministic queries: ${flaky.toList.sorted}")
  }
}
