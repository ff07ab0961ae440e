package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {

  test("salted join equals plain join on a skewed key distribution") {
    import spark.implicits._
    // 10k fact rows, 90% on one hot key — the salt spreads them
    val fact = (1 to 10000)
      .map(i => (if (i % 10 == 0) i.toLong % 100 else 7L, i.toLong))
      .toDF("k", "v")
    val dim = (0L to 99L).map(k => (k, s"dim_$k")).toDF("dk", "name")

    val salted = Skew.saltedEquiJoin(fact, dim, col("k"), col("dk"),
        saltSource = col("v"), saltFactor = 8)
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
    val plain = fact.join(dim, col("k") === col("dk"))
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("v").as("sv"))

    assert(salted.orderBy("k").collect().toSeq ==
      plain.orderBy("k").collect().toSeq)
    // and the hot key really is spread: fact rows on key 7 carry >1 salt
    val saltSpread = fact.filter(col("k") === 7)
      .select(pmod(xxhash64(col("v")), lit(8)).cast("int").as("s"))
      .distinct().count()
    assert(saltSpread > 4, s"salt should spread the hot key, got $saltSpread buckets")
  }

  // Manual salting (above) is the do-it-yourself fix; AQE's skew-join
  // handling is the runtime fix the engine applies on its own. This
  // pins that a genuinely skewed sort-merge join actually triggers the
  // split (plan marks `skew=true`) — thresholds lowered to match test
  // data volumes, broadcast disabled so the join stays sort-merge.
  test("AQE splits the skewed partition of a skewed sort-merge join") {
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prior = keys.map { case (k, _) =>
      k -> (try Some(spark.conf.get(k)) catch { case _: Throwable => None })
    }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 100k fact rows, 95% on key 7, fat payload: the key-7 shuffle
      // partition is ~12 MB while the rest are KBs — far past the
      // 2x-median + 64KB detection bar.
      val fact = spark.range(100000).select(
        when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"),
        rpad(col("id").cast("string"), 120, "x").as("pay"))
      val dim = spark.range(100).select(col("id").as("dk"),
        concat(lit("d"), col("id")).as("name"))
      val joined = fact.join(dim, col("k") === col("dk"))
      val n = joined.collect().length
      assert(n == 100000, s"every fact row joins exactly one dim row, got $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark the skewed SMJ partition split (skew=true):\n$plan")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
