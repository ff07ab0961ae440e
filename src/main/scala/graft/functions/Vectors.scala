package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `Array[Float]` embedding columns as pure Column
  * expressions (codegen'd; no UDF, no MLlib dependency). All math in
  * double to keep results oracle-comparable.
  */
object Vectors {

  /** Σ a_i * b_i, folded left in element order (deterministic FP). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign bit of v · plane for one deterministic hyperplane — the unit
    * of a random-hyperplane LSH bucket id. The plane is a Scala-side
    * constant array folded into the plan as a float literal, and the
    * dot runs through the native codegen'd expression (this is a
    * corpus-wide per-row path — no interpreted HOF fold here).
    */
  def hyperplaneBit(v: Column, plane: Array[Double]): Column = {
    val planeCol = array(plane.map(p => lit(p.toFloat)): _*)
    when(graft.plans.VectorExpressions.vecDot(v, planeCol) >= 0, lit(1L))
      .otherwise(lit(0L))
  }

  /** Pack `planes.length` hyperplane sign bits into one long bucket id. */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      shiftleft(hyperplaneBit(v, p), i)
    }.reduce(_ + _)

  /** Deterministic pseudo-random hyperplanes (fixed seed — bucket ids
    * must be reproducible across runs and across the cluster).
    */
  def randomPlanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }

  private def dotScoreStructs(cents: Array[Array[Float]], v: Column) =
    cents.zipWithIndex.map { case (c, cid) =>
      struct(graft.plans.VectorExpressions.vecDot(v,
        array(c.map(f => lit(f)): _*)).as("score"), lit(cid).as("cid"))
    }

  /** Argmax-by-dot cell assignment against a literal centroid table:
    * one codegen'd projection, ties to the LARGER cid (lexicographic
    * struct max == `ORDER BY score DESC, cid DESC` in the oracle).
    */
  def nearestCellByDot(cents: Array[Array[Float]])(v: Column): Column =
    array_max(array(dotScoreStructs(cents, v): _*)).getField("cid")

  /** Top-n cells by dot score (the nProbe probe-cell rule) — same
    * ordering and tie rule as [[nearestCellByDot]].
    */
  def nearestCellsByDot(cents: Array[Array[Float]], n: Int)(v: Column): Column =
    slice(reverse(array_sort(array(dotScoreStructs(cents, v): _*))), 1, n)
      .getField("cid")

  /** Scala-side twin of [[nearestCellByDot]], for the Lloyd TRAINING
    * loop only (VectorIndex.lloydCentroids). Identical arithmetic —
    * left-to-right double accumulation over float products, exactly
    * FloatVecDot's loop — and identical tie rule: `Double.compare`
    * matches Spark's total order on doubles (NaN greatest), and `>=`
    * under ascending cid iteration resolves ties to the LARGER cid,
    * as array_max's lexicographic (score, cid) struct max does.
    * Exists because the expression form re-codegens a k×dim-literal
    * argmax every training iteration: at large k the janino compile,
    * not the data scan, dominates the build (measured ~15 s/iteration
    * at k=160). The PROBE side keeps the codegen expression — it
    * compiles once and runs inside whole-stage codegen.
    */
  def nearestCellScala(cents: Array[Array[Float]], v: Array[Float]): Int = {
    var bestCid = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cc = cents(c)
      var acc = 0.0
      var i = 0
      while (i < cc.length) {
        acc += v(i).toDouble * cc(i).toDouble
        i += 1
      }
      if (java.lang.Double.compare(acc, bestScore) >= 0) {
        bestScore = acc; bestCid = c
      }
      c += 1
    }
    bestCid
  }
}
