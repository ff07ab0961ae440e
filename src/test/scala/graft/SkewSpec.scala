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
}
