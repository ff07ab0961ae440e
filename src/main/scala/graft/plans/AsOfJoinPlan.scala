package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge

/** Native AS-OF JOIN — the full rung-(c) ladder of SURVEY.md §4.2:
  * a custom `LogicalPlan` node, a `SparkStrategy` planning it, and a
  * `SparkPlan` executing it, registered through
  * `SparkSessionExtensions`. Semantics (LEFT OUTER, three directions
  * — pandas merge_asof parity): each left row pairs with the single
  * right row sharing its key whose time is the LATEST at-or-before
  * (`backward`, default; max-tie wins, matching j6's composed form),
  * the EARLIEST at-or-after (`forward`; min-tie wins), or whichever
  * of those two is closer (`nearest`; equal distances resolve to the
  * backward row) — or all-null right columns when no right row
  * qualifies. All three run the same one-pass merge: backward holds
  * one consumed row, forward IS the merge lookahead, nearest compares
  * the two.
  *
  * Why a physical operator when j6's union + ignore-nulls-window
  * composition already scales: the composition materializes the
  * union and pays one wide window over |L|+|R| rows; the native exec
  * is a streaming ONE-PASS MERGE per co-partition — each side read
  * once in its sort order, O(|L|+|R|) compares, state = one held
  * right row. Same two exchanges and two sorts as a sort-merge join
  * (EnsureRequirements inserts them from the declared distribution /
  * ordering requirements), so the 100 TB posture is exactly SMJ's:
  * hash-partition both sides on the key, never a candidate
  * explosion. Typing contract (checked at API entry): keys and the
  * tie-break are integral; times are timestamp/date/integral —
  * everything compares as a long, which keeps the merge loop free of
  * per-row ordering dispatch.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        rightTie: Expression,
                        direction: String = "backward",
                        tolerance: Long = Long.MaxValue) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tie, dir, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie, dir,
        tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        rightTie: Expression,
                        direction: String,
                        tolerance: Long = Long.MaxValue)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition on the key (the SMJ contract); EnsureRequirements
  // adds compatible hash exchanges
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  // each partition arrives in merge order; the right side's tie-break
  // is part of ITS sort so "last qualifying row" == max (time, tie)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case other => throw new IllegalStateException(
      s"as-of join key/time must evaluate to an integral: $other")
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lkB = BindReferences.bindReference(leftKey, lOut)
    val ltB = BindReferences.bindReference(leftTime, lOut)
    val rkB = BindReferences.bindReference(rightKey, rOut)
    val rtB = BindReferences.bindReference(rightTime, rOut)
    val outAtts = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)
      val toUnsafe = UnsafeProjection.create(outAtts, outAtts)
      // one-row lookahead over the right side; rows with a null key
      // or time can never match and are skipped at admission
      var rRow: InternalRow = null
      var rKey = 0L
      var rTime = 0L
      var haveR = false
      def advanceRight(): Unit = {
        haveR = false
        while (!haveR && rIter.hasNext) {
          val r = rIter.next()
          val k = rkB.eval(r)
          val t = rtB.eval(r)
          if (k != null && t != null) {
            rRow = r; rKey = asLong(k); rTime = asLong(t); haveR = true
          }
        }
      }
      advanceRight()
      // direction hoisted to an int switch outside the row loop:
      // 0 = backward, 1 = forward, 2 = nearest
      val dir = direction match {
        case "backward" => 0
        case "forward" => 1
        case "nearest" => 2
        case other => throw new IllegalStateException(
          s"unknown as-of direction '$other'")
      }
      // the held candidate: the latest right row consumed so far whose
      // key matches the current left key (copied — iterator rows are
      // reused buffers). Forward never looks back, so it skips the
      // copies; nearest also records the candidate's time for the
      // distance compare.
      var best: InternalRow = null
      var bestKey = 0L
      var bestTime = 0L
      lIter.map { l =>
        val lk = lkB.eval(l)
        val lt = ltB.eval(l)
        if (lk == null || lt == null) {
          toUnsafe(joined(l, nullRight))
        } else {
          val k = asLong(lk)
          val t = asLong(lt)
          if (best != null && bestKey != k) best = null
          // drain right rows that can never serve this (or any later —
          // left times ascend) left row as a forward candidate; each
          // consumed same-key row becomes the running backward
          // candidate. Forward keeps an == t row in the lookahead
          // (at-or-after includes the tie); backward/nearest consume
          // it (at-or-before / distance zero).
          while (haveR && (rKey < k ||
              (rKey == k && (if (dir == 1) rTime < t else rTime <= t)))) {
            if (rKey == k && dir != 1) {
              best = rRow.copy(); bestKey = k; bestTime = rTime
            }
            advanceRight()
          }
          // the lookahead is the FIRST same-key row strictly after t
          // (at-or-after t for forward) — in right sort order, so the
          // min (time, tie) among qualifying rows. Tolerance bounds
          // each side's reach: both differences are non-negative by
          // the merge invariants (bestTime <= t <= lookahead rTime),
          // so Long.MaxValue means "unbounded" with no overflow.
          val bOk = best != null && t - bestTime <= tolerance
          val fwdOk = haveR && rKey == k && rTime - t <= tolerance
          val m = dir match {
            case 0 => if (bOk) best else null
            case 1 => if (fwdOk) rRow else null
            case _ => // nearest: closer side wins, distance ties to the
              // backward row (pandas merge_asof convention)
              if (bOk && (!fwdOk || t - bestTime <= rTime - t)) best
              else if (fwdOk) rRow
              else null
          }
          toUnsafe(joined(l, if (m != null) m else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  import org.apache.spark.sql.types._
  private val Integral = Set("long", "int", "smallint", "tinyint",
    "bigint", "integer")
  private def isTemporal(t: DataType): Boolean = t match {
    case TimestampType | TimestampNTZType | DateType => true
    case _ => false
  }
  private def timeOk(t: DataType): Boolean =
    isTemporal(t) || Integral.contains(t.simpleString)

  /** DataFrame API: as-of join of `left` to `right` on integral key
    * columns. `direction` selects the match rule (pandas merge_asof's
    * three modes, one shared merge pass):
    *  - `"backward"` (default): the LATEST right row at-or-before the
    *    left time; right ties broken by max `rightTie`.
    *  - `"forward"`: the EARLIEST right row at-or-after the left time;
    *    ties broken by min `rightTie` (the first row in right sort
    *    order — no extra state, the merge lookahead IS the match).
    *  - `"nearest"`: whichever of those two is closer in time, equal
    *    distances resolving to the backward row.
    * Columns are resolved against each side's ANALYZED plan, so the
    * node enters the optimizer fully resolved (no dependence on
    * analyzer behavior for foreign nodes).
    */
  def asof(leftDf: DataFrame, leftKey: String, leftTime: String,
           rightDf: DataFrame, rightKey: String, rightTime: String,
           rightTie: String, direction: String = "backward",
           tolerance: Long = Long.MaxValue): DataFrame = {
    require(Set("backward", "forward", "nearest").contains(direction),
      s"as-of direction must be backward|forward|nearest, got '$direction'")
    // the node needs its strategy in the session or planning asserts
    // "No plan for AsOfJoinPlan" — register is idempotent, so the API
    // carries its own requirement instead of leaving a footgun
    GraftExtensions.register(leftDf.sparkSession)
    // merge_asof's tolerance, in the compared unit: MICROSECONDS once
    // a temporal pair is lifted (date sides cast up), raw units for
    // integral time columns
    require(tolerance >= 0L, s"as-of tolerance must be >= 0, got $tolerance")
    val lp = leftDf.queryExecution.analyzed
    val rp = rightDf.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"as-of $side column '$n' not in ${p.output.map(_.name).mkString(", ")}"))
    val (lk, lt) = (attr(lp, leftKey, "left"), attr(lp, leftTime, "left"))
    val (rk, rt, tie) = (attr(rp, rightKey, "right"),
      attr(rp, rightTime, "right"), attr(rp, rightTie, "right"))
    require(Integral.contains(lk.dataType.simpleString) &&
      Integral.contains(rk.dataType.simpleString) &&
      Integral.contains(tie.dataType.simpleString),
      s"as-of keys/tie must be integral, got ${lk.dataType.simpleString}/" +
        s"${rk.dataType.simpleString}/${tie.dataType.simpleString}")
    require(timeOk(lt.dataType) && timeOk(rt.dataType),
      s"as-of times must be timestamp/date/integral, got " +
        s"${lt.dataType.simpleString}/${rt.dataType.simpleString}")
    // The exec compares times as raw internal longs, so both sides
    // MUST evaluate in one unit. Temporal internals differ per type —
    // TimestampType/NTZ hold MICROSECONDS, DateType holds DAYS — so a
    // mixed date/timestamp pairing compared raw would make every
    // `rTime <= t` true (~1e4 days vs ~1.7e18 micros) and silently
    // degrade "latest at-or-before" to "latest". Normalize by casting
    // the DateType side up to the other side's timestamp flavor (a
    // monotone cast, so the declared sort orders are unaffected).
    // Temporal-vs-integral has no principled unit and is rejected.
    require(isTemporal(lt.dataType) == isTemporal(rt.dataType),
      s"as-of time columns must share a family (both temporal or both " +
        s"integral), got ${lt.dataType.simpleString}/${rt.dataType.simpleString}")
    // The lift zone is pinned to UTC, NOT the session zone: the
    // comparison must be timezone-invariant like the oracle's naive
    // timestamp arithmetic. A session zone with a DST transition
    // inside the joined window would shift lifted midnights by an
    // hour and could flip nearest-side choices or an exact tolerance
    // boundary relative to the naive result. UTC has no transitions,
    // so date-midnight micros equal the naive micros DuckDB compares.
    val zone = Some("UTC")
    def lift(e: Expression, other: DataType): Expression =
      (e.dataType, other) match {
        case (DateType, TimestampNTZType) =>
          org.apache.spark.sql.catalyst.expressions.Cast(e, TimestampNTZType, zone)
        case (DateType, TimestampType) =>
          org.apache.spark.sql.catalyst.expressions.Cast(e, TimestampType, zone)
        case _ => e
      }
    val (ltU, rtU) = (lift(lt, rt.dataType), lift(rt, lt.dataType))
    Bridge.dataFrame(leftDf.sparkSession,
      AsOfJoinPlan(lp, rp, lk, rk, ltU, rtU, tie, direction, tolerance))
  }
}
