package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-backed scale operators: Count-Min heavy-hitter estimation
  * and Bloom-filter join pruning. With HLL (a8) and the t-digest
  * percentiles (a12) these complete the classic streaming-sketch
  * quartet an engine needs once exact state no longer fits:
  * cardinality (HLL), quantiles (t-digest), frequency (CMS),
  * membership (Bloom).
  *
  * Both sketches build distributed (merge is exact counter/bitmap
  * addition, so partitioning never changes the result) and ship to
  * executors as a broadcast — constant size regardless of data scale.
  */
object Sketches {

  // --- CMS1: Count-Min frequency estimates for probe keys. The
  // sketch (eps x delta counters) replaces a full groupBy-count whose
  // shuffle would carry every distinct key; estimates are upper bounds
  // (collisions only ADD), asserted against exact counts in the spec.
  // Deterministic: fixed seed, exact integer counter merges. Driver
  // does a rows-only check (no DuckDB CMS to compare against). ---
  def cmsHeavyHitters(s: SparkSession, d: String,
                      probeKeys: Seq[Long] = (1L to 20L).toSeq,
                      eps: Double = 0.001, confidence: Double = 0.99,
                      seed: Int = 42): DataFrame = {
    import s.implicits._
    val cms = Tables.lineitem(s, d)
      .stat.countMinSketch("l_suppkey", eps, confidence, seed)
    probeKeys.map(k => (k, cms.estimateCount(k)))
      .toDF("l_suppkey", "est_count")
      .orderBy("l_suppkey")
  }

  // --- BF1: Bloom-pruned semi join. The bloom filter over the dim's
  // keys broadcasts (~1.2 bytes/key at 1% fpp) and prunes fact rows
  // BEFORE the shuffle — at 100 TB this is the difference between
  // shuffling the whole fact table and shuffling the ~selectivity
  // fraction that can possibly match. False positives pass the bloom
  // but are removed by the exact semi join that follows, so the result
  // is EXACTLY the plain semi join (oracled as such). ---
  def bloomSemiJoin(s: SparkSession, d: String,
                    segment: String = "BUILDING", fpp: Double = 0.01): DataFrame = {
    val dim = Tables.customer(s, d).filter(col("c_mktsegment") === segment)
    val n = math.max(dim.count(), 1L) // sketch sizing needs an estimate
    val bloom = dim.stat.bloomFilter("c_custkey", n, fpp)
    val bBloom = s.sparkContext.broadcast(bloom)
    val mightContain = udf((k: Long) => bBloom.value.mightContain(k))
    Tables.orders(s, d)
      .filter(mightContain(col("o_custkey"))) // pre-shuffle prune
      .join(dim.select("c_custkey"),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }
}
