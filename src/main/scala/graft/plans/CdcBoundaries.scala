package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking boundary detector as a native codegen
  * expression (ladder rung (b), like [[FloatVecDot]]): returns the
  * 1-based positions p in [2, len-w+1] where the Rabin-Karp polynomial
  * hash of the w-byte window starting at p is ≡ 0 (mod divisor).
  *
  * Why an expression and not the declarative form: the declarative
  * chain (`explode(sequence) + hash(substring)`) evaluates a full hash
  * per CHARACTER POSITION — with the md5-based portable hash that was
  * tx18's whole cost (one md5 per char, ~6.5M md5s at sf0.1). The
  * rolling form pays O(1) per position — one multiply-add and one
  * subtract in 64-bit registers — the same trick rsync/LBFS/FastCDC
  * use, and it stays inside whole-stage codegen because doGenCode
  * emits a plain static call (the pattern of Spark's own
  * `StringSplit`-style expressions: codegen'd dispatch, primitive
  * loop in a JIT-friendly helper).
  *
  * Hash basis: h(p) = Σ_{i=0..w-1} byte[p+i]·B^{w-1-i} mod M with
  * B = 257, M = 2^31−1. Every intermediate stays under 2^43, so the
  * identical value is computable in ANSI SQL as a 16-term
  * sum-of-products — which is exactly how the DuckDB oracle replays
  * the boundary decision (OracleGen.tx18Sql). Byte-oriented on the
  * UTF-8 encoding (positions == character positions on ASCII corpora;
  * content-defined chunking is a byte-stream notion, so this is the
  * production semantic, not a shortcut).
  */
case class CdcBoundaries(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_bounds expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_bounds"

  override def nullSafeEval(t: Any): Any =
    CdcBoundaries.bounds(t.asInstanceOf[UTF8String], window, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.CdcBoundaries$$.MODULE$$.bounds($c, $window, $divisor)")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

object CdcBoundaries {
  /** Polynomial base/modulus — small enough that a 16-term replay fits
    * BIGINT in any ANSI engine, large enough that `mod divisor` is
    * uniform on text.
    */
  val B: Long = 257L
  val M: Long = 2147483647L // 2^31 − 1

  /** B^k mod M — the constant vector the SQL replay inlines. */
  def pow(k: Int): Long = {
    var r = 1L
    var i = 0
    while (i < k) { r = r * B % M; i += 1 }
    r
  }

  def bounds(t: UTF8String, w: Int, divisor: Int): GenericArrayData = {
    val bytes = t.getBytes
    val n = bytes.length
    if (n < w + 1) return new GenericArrayData(Array.empty[Int])
    // window at 1-based position p covers byte indices p-1 .. p+w-2;
    // seed the hash for p = 2 (a chunk always starts at 1, so position
    // 1 is never a boundary candidate)
    var h = 0L
    var i = 1
    while (i <= w) { h = (h * B + (bytes(i) & 0xff)) % M; i += 1 }
    val powW1 = pow(w - 1)
    val out = new scala.collection.mutable.ArrayBuilder.ofInt
    var p = 2
    val last = n - w + 1
    while (p <= last) {
      if (h % divisor == 0) out += p
      if (p < last) {
        val cOut = (bytes(p - 1) & 0xffL) * powW1 % M
        val cIn = bytes(p + w - 1) & 0xffL
        h = ((h - cOut + M) % M * B + cIn) % M
      }
      p += 1
    }
    new GenericArrayData(out.result())
  }

  /** Column API. */
  def cdcBounds(text: Column, window: Int, divisor: Int): Column =
    Bridge.column(CdcBoundaries(Bridge.expression(text), window, divisor))
}
