package graft

import graft.functions.Text
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Unit coverage for the `functions.Text` column builders, most
  * importantly the cross-check promised in their scaladoc: the HOF
  * MinHash signature and Dedup's hash-aggregate signature are the SAME
  * function (xxhash64(i, xxhash64(gram)) minimized per doc), verified
  * bit-for-bit on real documents.
  */
class TextFunctionsSpec extends SparkTestBase {

  private val numHashes = 8

  test("HOF minhashSignature == Dedup.minhashSignatures aggregate, bit-for-bit") {
    val hof = Tables.documents(spark, sf)
      .select(col("doc_id"), Text.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 3) // gramRows drops <n-token docs too
      .select(col("doc_id"),
        Text.minhashSignature(Text.wordNgrams(col("ws"), 3), numHashes).as("sig"))

    val agg = Dedup.minhashSignatures(spark, sf, numHashes)

    val joined = hof.join(agg, "doc_id")
    assert(joined.count() === hof.count(), "doc sets must match")
    val mismatches = joined.filter(
      (0 until numHashes).map(i => col("sig")(i) =!= col(s"h$i")).reduce(_ || _))
    assert(mismatches.count() === 0L,
      s"signature mismatch rows: ${mismatches.take(3).mkString("; ")}")
  }

  test("wordNgrams yields empty array for docs shorter than n") {
    import spark.implicits._
    val df = Seq("one two", "a b c d").toDF("text")
      .select(Text.wordNgrams(Text.tokens(col("text")), 3).as("g"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0).isEmpty)
    assert(rows(1) === Seq("a b c", "b c d"))
  }

  test("jaccard: identical sets 1.0, disjoint 0.0, both-empty 0.0") {
    import spark.implicits._
    val df = Seq(
      (Seq("a", "b"), Seq("a", "b")),
      (Seq("a"), Seq("b")),
      (Seq.empty[String], Seq.empty[String]),
      (Seq("a", "b", "c"), Seq("b", "c", "d"))
    ).toDF("x", "y").select(Text.jaccard(col("x"), col("y")).as("j"))
    assert(df.collect().map(_.getDouble(0)).toSeq === Seq(1.0, 0.0, 0.0, 0.5))
  }
}
