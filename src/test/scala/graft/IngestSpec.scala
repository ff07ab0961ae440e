package graft

import graft.sources.Ingest
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IngestSpec extends SparkTestBase {

  test("partitioned layout prunes by partition, not by data filter") {
    val out = Files.createTempDirectory("graft_part").toString
    Ingest.writeOrdersPartitioned(spark, sf, out)
    val df = Ingest.readPartitioned(spark, out).filter(col("y") === 1996)
    // correctness: same rows as filtering the source
    val expected = Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) === 1996).count()
    assert(df.count() == expected && expected > 0)
    // plan: the year filter must be a PartitionFilter on the scan
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PartitionFilters:[^\\n]*y[^\\n]*1996.*"),
      s"year filter not applied at partition level:\n$plan")
  }

  test("compaction rewrites many small files into the target count, rows intact") {
    val base = Files.createTempDirectory("graft_compact").toString
    // simulate a streaming sink's small-file mess: 20 files
    Tables.orders(spark, sf).repartition(20)
      .write.mode("overwrite").parquet(s"$base/in")
    val inFiles = new java.io.File(s"$base/in").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(inFiles == 20)
    // target ~= total size -> single output file
    val totalBytes = new java.io.File(s"$base/in").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val n = Ingest.compact(spark, s"$base/in", s"$base/out", totalBytes + 1)
    assert(n == 1)
    val outFiles = new java.io.File(s"$base/out").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(outFiles == 1)
    assert(spark.read.parquet(s"$base/out").orderBy("o_orderkey").collect().toSeq ==
      Tables.orders(spark, sf).orderBy("o_orderkey").collect().toSeq)
  }

  test("multi-format round-trips: json and orc preserve rows and schema") {
    val src = Tables.nation(spark, sf)
    val base = Files.createTempDirectory("graft_fmt").toString
    src.write.mode("overwrite").json(s"$base/json")
    src.write.mode("overwrite").orc(s"$base/orc")
    val fromJson = spark.read.schema(src.schema).json(s"$base/json")
    val fromOrc = spark.read.orc(s"$base/orc")
    assert(fromJson.orderBy("n_nationkey").collect().toSeq ==
      src.orderBy("n_nationkey").collect().toSeq)
    assert(fromOrc.orderBy("n_nationkey").collect().toSeq ==
      src.orderBy("n_nationkey").collect().toSeq)
    assert(fromOrc.schema == src.schema)
  }

  test("bucketed join runs without an exchange on either side") {
    Ingest.writeBucketedJoinTables(spark, sf, "graft_test_db", buckets = 4)
    // at sf0.001 AQE would broadcast the tiny side, hiding the property
    // under test — force the shuffled-join path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = Ingest.bucketedJoin(spark, "graft_test_db")
    val plan =
      try {
        joined.collect()
        joined.queryExecution.executedPlan.toString
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffled join shape:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scans not bucketed:\n$plan")
    // the join itself must not shuffle either input (only the final
    // aggregation exchanges, on o_orderstatus)
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles:\n$plan")
    // and results match the unbucketed join
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("total"))
    assert(joined.orderBy("o_orderstatus").collect().toSeq ==
      expected.orderBy("o_orderstatus").collect().toSeq)
  }
}
