package graft

import graft.operators.WritePath
import org.apache.spark.sql.functions._
import java.nio.file.Files

class WritePathSpec extends SparkTestBase {

  test("compat insert: MAX+1 ids, price rounded to 1 decimal (DatabaseAccessor.py:119-136)") {
    import spark.implicits._
    val existing = Tables.orders(spark, sf)
    val mx = existing.agg(max("o_orderkey")).collect()(0).getLong(0)
    val newRows = Seq(
      (0L, 10L, "O", 123.456, "1-URGENT"),
      (0L, 11L, "O", 99.999, "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
    val inserted = WritePath.insertOrderCompat(existing, newRows)
    val ids = inserted.select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(mx + 1, mx + 2))
    val prices = inserted.orderBy("o_orderkey").select("o_totalprice")
      .collect().map(_.getDouble(0))
    assert(prices.toSeq == Seq(123.5, 100.0))
  }

  test("scalable ids are unique and don't require scanning existing data") {
    import spark.implicits._
    val newRows = (1 to 1000).map(i => (0L, i.toLong)).toDF("o_orderkey", "o_custkey")
      .repartition(8)
    val epoch = 1L << 40
    val ids = WritePath.assignScalableIds(newRows, epoch)
      .select("o_orderkey").collect().map(_.getLong(0))
    assert(ids.length == 1000)
    assert(ids.distinct.length == 1000, "ids must be unique across partitions")
    assert(ids.forall(_ >= epoch))
  }

  test("append sink writes and reads back (S6)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_orders").toString
    val batch1 = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val batch2 = Seq((3L, "z")).toDF("id", "v")
    WritePath.appendOrders(batch1, dir)
    WritePath.appendOrders(batch2, dir)
    assert(spark.read.parquet(dir).count() == 3)
  }
}
