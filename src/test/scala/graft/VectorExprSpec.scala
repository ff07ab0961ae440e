package graft

import graft.functions.Vectors
import graft.plans.{GraftExtensions, VectorExpressions}
import org.apache.spark.sql.functions._

class VectorExprSpec extends SparkTestBase {

  test("native FloatVecDot equals the HOF fold-left reference implementation") {
    val e = Tables.embeddings(spark, sf).limit(100)
    val both = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        VectorExpressions.vecDot(col("a.embedding"), col("b.embedding")).as("native"),
        Vectors.dot(col("a.embedding"), col("b.embedding")).as("hof"),
        VectorExpressions.vecCosine(col("a.embedding"), col("b.embedding")).as("ncos"),
        Vectors.cosine(col("a.embedding"), col("b.embedding")).as("hcos"))
    val bad = both.filter(col("native") =!= col("hof") || col("ncos") =!= col("hcos"))
    assert(bad.count() == 0, "native and HOF must agree bit-for-bit (same fold order)")
  }

  test("FloatVecDot handles null arrays (null-safe)") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f))),
      (Some(Array(1.0f)), None))
      .toDF("a", "b")
    val out = df.select(VectorExpressions.vecDot(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0) && out(2).isNullAt(0))
  }

  test("FloatVecDot matches HOF semantics on null elements and length mismatch") {
    // HOF reference: zip_with pads the shorter array with null and a
    // null product nulls the whole fold — vec_dot must agree
    val sqlBoth =
      """SELECT
        |  vd AS native, hof,
        |  (vd <=> hof) AS agree FROM (SELECT
        |    %NATIVE% AS vd,
        |    aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)),
        |              cast(0.0 as double), (acc, v) -> acc + v) AS hof
        |  FROM vals)""".stripMargin
    graft.plans.GraftExtensions.register(spark)
    Seq(
      "array(cast(1.0 as float), cast(null as float))" ->
        "array(cast(2.0 as float), cast(2.0 as float))", // null element
      "array(cast(1.0 as float))" ->
        "array(cast(2.0 as float), cast(3.0 as float))"  // length mismatch
    ).foreach { case (a, b) =>
      val row = spark.sql(
        sqlBoth.replace("%NATIVE%", "vec_dot(a, b)")
          .replace("FROM vals", s"FROM (SELECT $a AS a, $b AS b)"))
        .collect()(0)
      assert(row.isNullAt(0), s"native must be null for ($a, $b)")
      assert(row.isNullAt(1), "HOF reference should also be null")
    }
  }

  test("vec_dot registers as a SQL function via GraftExtensions.register") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT vec_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
      "array(cast(3.0 as float), cast(4.0 as float))) AS d").collect()
    assert(r(0).getDouble(0) == 11.0)
  }

  test("CdcBoundaries rolling hash equals the per-position polynomial") {
    import graft.plans.CdcBoundaries
    // brute force: evaluate the w-term polynomial independently at
    // every position — the rolling recurrence must reproduce it, and
    // the reported positions are exactly the mod-divisor hits
    def brute(s: String, w: Int, div: Int): Seq[Int] = {
      val bytes = s.getBytes("UTF-8")
      (2 to bytes.length - w + 1).filter { p =>
        val h = (0 until w).foldLeft(0L) { (acc, i) =>
          (acc * CdcBoundaries.B + (bytes(p - 1 + i) & 0xff)) % CdcBoundaries.M
        }
        h % div == 0
      }
    }
    val rnd = new scala.util.Random(7)
    val samples = Seq(
      "", "x", "a" * 16, "a" * 17,
      ("the quick brown fox jumps over the lazy dog ") * 8,
      // multi-byte UTF-8: CDC is a BYTE-stream notion — positions and
      // windows count bytes of the encoding, which the brute force
      // (also over getBytes) must agree on
      "héllo wörld ünïcode " * 6, "日本語のテキストです " * 4) ++
      (1 to 20).map(_ => rnd.alphanumeric.take(40 + rnd.nextInt(400)).mkString)
    samples.foreach { s =>
      val got = CdcBoundaries
        .bounds(org.apache.spark.unsafe.types.UTF8String.fromString(s), 16, 8)
        .toIntArray().toSeq
      assert(got == brute(s, 16, 8), s"mismatch on ${s.take(40)}…")
    }
  }

  test("cdc_bounds runs codegen'd through SQL and matches the direct eval") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    docs.createOrReplaceTempView("cdc_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, cdc_bounds(text, 16, 64) AS bs FROM cdc_docs")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val direct = docs.collect().map { r =>
      r.getLong(0) -> graft.plans.CdcBoundaries
        .bounds(org.apache.spark.unsafe.types.UTF8String
          .fromString(r.getString(1)), 16, 64).toIntArray().toSeq
    }.toMap
    assert(viaSql.keySet == direct.keySet)
    direct.foreach { case (id, bs) => assert(viaSql(id) == bs, s"doc $id") }
    assert(direct.values.exists(_.nonEmpty), "corpus should produce boundaries")
  }
}
