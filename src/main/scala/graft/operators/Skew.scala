package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (the "salting for skew" leg of the scale posture;
  * AQE's skew-join split handles sort-merge skew at runtime, salting
  * is the static fallback for pathological keys and for shuffled hash
  * joins).
  *
  * `saltedEquiJoin`: the fact side gets a deterministic per-row salt
  * in [0, n) derived from `saltSource` (any expression that varies
  * within a hot key — a line number, an id; NOT rand(), which breaks
  * retry determinism); the dim side is replicated n times with an
  * exploded salt column, so one hot key fans out over n shuffle
  * partitions instead of one straggler.
  */
object Skew {

  def saltedEquiJoin(fact: DataFrame, dim: DataFrame,
                     factKey: Column, dimKey: Column,
                     saltSource: Column, saltFactor: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(saltFactor)).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedFact.join(saltedDim,
        factKey === dimKey && saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }
}
