package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

/** The SQL surface of the native vector expressions: injection list
  * sanity, live-session registration, and value parity between the
  * SQL functions, the Column API, and the interpreted HOF reference.
  */
class ExtensionsSpec extends SparkTestBase {

  test("extension applies its injection list to a fresh SparkSessionExtensions") {
    new GraftExtensions().apply(new SparkSessionExtensions) // must not throw
    assert(GraftExtensions.functions.map(_._1.funcName).sorted ==
      Seq("cdc_bounds", "morton_interleave", "vec_cos", "vec_dot"))
  }

  test("vec_dot SQL function matches the HOF fold on real embeddings") {
    GraftExtensions.register(spark)
    Tables.embeddings(spark, sf).limit(50).createOrReplaceTempView("emb_ext")
    val viaSql = spark.sql(
      """SELECT vec_id, vec_dot(embedding, embedding) AS dp
        |FROM emb_ext ORDER BY vec_id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaHof = spark.sql(
      """SELECT vec_id,
        |  aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |            CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS dp
        |FROM emb_ext ORDER BY vec_id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaSql.keySet == viaHof.keySet)
    viaSql.foreach { case (id, d) => assert(d == viaHof(id), s"vec $id") }
  }

  test("vec_cos SQL function is 1.0 on itself and symmetric") {
    GraftExtensions.register(spark)
    Tables.embeddings(spark, sf).limit(20).createOrReplaceTempView("emb_ext2")
    val selfSim = spark.sql(
      "SELECT vec_cos(embedding, embedding) AS c FROM emb_ext2")
      .collect().map(_.getDouble(0))
    assert(selfSim.forall(c => math.abs(c - 1.0) < 1e-9))
    val sym = spark.sql(
      """SELECT a.vec_id, vec_cos(a.embedding, b.embedding) AS ab,
        |       vec_cos(b.embedding, a.embedding) AS ba
        |FROM emb_ext2 a JOIN emb_ext2 b ON b.vec_id = a.vec_id + 1""".stripMargin)
      .collect()
    assert(sym.nonEmpty)
    sym.foreach(r => assert(r.getDouble(1) == r.getDouble(2)))
  }

  test("optimizer rule rewrites the HOF dot product to vec_dot") {
    GraftExtensions.register(spark)
    Tables.embeddings(spark, sf).limit(30).createOrReplaceTempView("emb_rw")
    val hof = spark.sql(
      """SELECT vec_id,
        |  aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |            CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS dp
        |FROM emb_rw""".stripMargin)
    val optimized = hof.queryExecution.optimizedPlan.toString
    assert(optimized.contains("vec_dot"),
      s"rewrite did not fire:\n$optimized")
    assert(!optimized.contains("aggregate(zip_with"),
      s"HOF survived optimization:\n$optimized")
    // and the rewritten plan computes the same values as the native API
    val viaRule = hof.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val direct = Tables.embeddings(spark, sf).limit(30)
      .select(col("vec_id"),
        graft.plans.VectorExpressions.vecDot(col("embedding"), col("embedding")).as("dp"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaRule == direct)
  }

  test("optimizer rule leaves non-matching HOF aggregates alone") {
    GraftExtensions.register(spark)
    Tables.embeddings(spark, sf).limit(10).createOrReplaceTempView("emb_rw2")
    // sum (not product) inside zip_with: must NOT rewrite
    val df = spark.sql(
      """SELECT aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) + CAST(y AS DOUBLE)),
        |                 CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS s
        |FROM emb_rw2""".stripMargin)
    assert(!df.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    df.collect() // still executes correctly
  }

  test("cdc_bounds SQL accepts any integral literal width and rejects the rest properly") {
    GraftExtensions.register(spark)
    Tables.documents(spark, sf).limit(5).createOrReplaceTempView("docs_cdc")
    // BIGINT literals (CAST and L-typed) must coerce, not ClassCast
    val viaLong = spark.sql(
      """SELECT doc_id, cdc_bounds(text, CAST(64 AS BIGINT), CAST(512 AS BIGINT)) AS b
        |FROM docs_cdc ORDER BY doc_id""".stripMargin).collect()
    val viaInt = spark.sql(
      "SELECT doc_id, cdc_bounds(text, 64, 512) AS b FROM docs_cdc ORDER BY doc_id")
      .collect()
    assert(viaLong.map(_.toString).toSeq == viaInt.map(_.toString).toSeq)
    // a non-foldable argument raises an AnalysisException, not an NPE
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cdc_bounds(text, CAST(doc_id AS INT), 512) FROM docs_cdc")
        .collect()
    }
    assert(e1.getMessage.contains("cdc_bounds"))
    // a non-integral literal raises the same proper error, not a CCE
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cdc_bounds(text, 'x', 512) FROM docs_cdc").collect()
    }
    assert(e2.getMessage.contains("cdc_bounds"))
  }

  test("SQL vec_dot agrees with the Column API vecDot") {
    GraftExtensions.register(spark)
    val e = Tables.embeddings(spark, sf).limit(50)
    val viaCol = e.select(col("vec_id"),
        graft.plans.VectorExpressions.vecDot(col("embedding"), col("embedding")).as("dp"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    e.createOrReplaceTempView("emb_ext3")
    val viaSql = spark.sql("SELECT vec_id, vec_dot(embedding, embedding) AS dp FROM emb_ext3")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaCol == viaSql)
  }
}
