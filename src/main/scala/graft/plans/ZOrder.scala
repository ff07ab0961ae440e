package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two dimension keys — the sort key
  * behind multi-dimensional data clustering: sorting a table by
  * `morton(x, y)` gives every output file a NARROW range in BOTH
  * dimensions, so parquet min/max row-group stats prune a 2-D slice
  * predicate (`x BETWEEN … AND y BETWEEN …`) the way a 1-D sort can
  * only prune its single leading dimension. The layout lever is
  * `Marts.eventsZOrdered`; this expression is just the key.
  *
  * Bit spread uses the binary-magic-numbers construction (the classic
  * public bit-twiddling identity): five mask-and-shift rounds per
  * dimension, fully codegen'd — and exactly replayable in ANSI SQL
  * with the same shift/mask constants, which is what lets the DuckDB
  * oracle hash-check the key (OracleGen.zorderSpreadSql).
  *
  * Contract: inputs are taken modulo 2³² (low 32 bits interleave into
  * one 64-bit key; x gets the even bits, y the odd). Negative inputs
  * are masked the same way — callers index dimensions with
  * non-negative bucket numbers.
  */
case class MortonInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"morton_interleave expects (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "morton_interleave"

  override def nullSafeEval(a: Any, b: Any): Any =
    MortonInterleave.spread(a.asInstanceOf[Long]) |
      (MortonInterleave.spread(b.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = MortonInterleave.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.spread($a) | ($cls.spread($b) << 1);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonInterleave =
    copy(left = newLeft, right = newRight)
}

object MortonInterleave {
  /** Spread the low 32 bits of `v` onto the even bit positions of a
    * long. Shared by the interpreted and generated paths so the two
    * can never diverge.
    */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Column API: `morton(x, y)` over two bigint columns. */
  def morton(x: Column, y: Column): Column =
    Bridge.column(MortonInterleave(Bridge.expression(x), Bridge.expression(y)))
}
