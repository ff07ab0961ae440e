package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session; suites run
  * in the same forked test JVM).
  */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session
  val sf: String = "/root/testdata/sf0.001"
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", // static conf; keep out of the repo
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      // Hive catalog (S2/S3 exact-DDL parity); derby metastore in tmp
      .config("spark.hadoop.javax.jdo.option.ConnectionURL",
        "jdbc:derby:;databaseName=" +
          java.nio.file.Files.createTempDirectory("graft_ms").toString +
          "/metastore_db;create=true")
      .enableHiveSupport()
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.Logs.quietNoise()
    s
  }
}
