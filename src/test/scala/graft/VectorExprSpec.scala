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
}
