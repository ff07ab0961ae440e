package graft

import org.apache.spark.sql.types._

/** Physical-schema drift guard over the driver-generated testdata.
  *
  * Round-5 lesson: the driver regenerated `events.parquet` with `ts` as
  * TIMESTAMP(MICROS) where it had been TIMESTAMP(NANOS), and every
  * events-based query failed analysis at the driver while `sbt test`
  * stayed green — no test loaded the real parquet through
  * [[Tables.events]]. This spec closes that gap: every loader must
  * produce its contracted Spark schema from the actual testdata files,
  * whatever the physical parquet types underneath.
  */
class TablesSpec extends SparkTestBase {

  test("events loader normalizes ts to TimestampType and is non-empty") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType === TimestampType,
      s"events.ts must normalize to TimestampType, got ${ev.schema("ts").dataType}")
    // Analysis alone isn't enough — force execution through the scan.
    assert(ev.count() > 0)
    // Timestamp arithmetic must resolve (the exact expression that broke
    // in round 5 ran `ts div 1000` against a non-long column).
    val hours = ev.selectExpr("date_trunc('hour', ts) AS h").distinct().count()
    assert(hours > 1, "expected events spread over multiple hours")
  }

  test("all table loaders read the real parquet with expected key columns") {
    val expect = Map(
      "region"    -> Seq("r_regionkey", "r_name"),
      "nation"    -> Seq("n_nationkey", "n_name", "n_regionkey"),
      "customer"  -> Seq("c_custkey", "c_name", "c_mktsegment"),
      "supplier"  -> Seq("s_suppkey", "s_name", "s_nationkey"),
      "part"      -> Seq("p_partkey", "p_name", "p_type"),
      "orders"    -> Seq("o_orderkey", "o_custkey", "o_orderdate"),
      "lineitem"  -> Seq("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"),
      "documents" -> Seq("doc_id", "text"),
      "embeddings"-> Seq("vec_id", "embedding")
    )
    expect.foreach { case (name, cols) =>
      val df = Tables.table(spark, sf, name)
      val missing = cols.filterNot(df.columns.contains)
      assert(missing.isEmpty, s"$name missing columns: $missing")
      assert(df.limit(1).count() == 1, s"$name is empty")
    }
  }

  test("an events query runs end-to-end on the real parquet") {
    // st1's batch twin is the canonical events consumer.
    val out = operators.Analytics.hourlyEvents(spark, sf)
    assert(out.count() > 0)
  }
}
