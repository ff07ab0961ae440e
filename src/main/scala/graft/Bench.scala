package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, timed end-to-end. Results are fully
  * materialized through the noop sink — `count()` would let Catalyst
  * prune projections and under-report the real work.
  * Prints exactly ONE JSON line (driver contract).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Full untimed warm-up pass: one execution of EVERY query before
    // any timing. Best-of-2 alone doesn't absorb cold-JVM effects — the
    // first queries alphabetically otherwise pay JIT compilation of
    // shared Spark internals for the whole suite (observed 4-8x
    // inflation on the first few queries in round-1 driver runs).
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () } // failures surface in the timed pass
    }

    // best-of-3 per query: a single local[32] pass is GC/OS-noisy
    // (observed 3x run-to-run swings on projection-only queries, and
    // best-of-2 still left ±15% swings between identical-code runs —
    // the round-4 q18/q19 "regressions" were exactly that noise)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val attempts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val succeeded = attempts.filter(_._2).map(_._1)
      // a crashed query must not masquerade as a fast success
      (name, if (succeeded.nonEmpty) succeeded.min else -1.0,
        succeeded.nonEmpty)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    // The driver keeps only a truncated tail of stdout; persist the
    // complete per-query map as its own artifact so every timing is
    // reviewable (BENCH_FULL.json sits next to the driver's BENCH_r*.json).
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_FULL.json"), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write BENCH_FULL.json: ${e.getMessage}")
    }
    spark.stop()
  }
}
