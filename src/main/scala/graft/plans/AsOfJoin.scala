package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, BindReferences, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join: custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan` (SURVEY's preference ladder (c) — used only because no
  * composition of built-ins produces this plan shape).
  *
  * Why a dedicated physical operator when the union+window form
  * ([[graft.operators.TemporalJoin.asOfBackward]]) is already
  * single-shuffle: the union form pays for schema PADDING — every left
  * row shuffles carrying null slots for the right value columns and every
  * right row carries null slots for ALL left columns, then one WindowExec
  * buffers the merged partition and runs two last(ignoreNulls) frames
  * over it. This operator shuffles each side with its OWN schema (no
  * padding), lets the sorts run per side (map-side spillable, codegen'd
  * UnsafeSort), and replaces the window buffering with a streaming two-
  * pointer merge that holds exactly ONE right record at a time — O(1)
  * memory beyond the sort, no frame re-evaluation. Same two exchanges,
  * strictly narrower rows, no WindowExec stage.
  *
  * Semantics (pandas `merge_asof(direction="backward")`): for each left
  * row, the LATEST right row of the same key with `right.ts <= left.ts`,
  * nulls when none (left outer); optional tolerance drops matches older
  * than `left.ts - tolerance`. `ts` must be LongType on both sides;
  * right rows unique per (key, ts). NULL keys/timestamps never match
  * (SQL join discipline).
  */
object AsOfJoin {

  /** Logical node. Created already-resolved (attributes are taken from
    * analyzed child plans); `asofOutput` attributes are constructor-held
    * so exprIds stay stable across tree copies.
    */
  final case class AsOfJoinPlan(
      left: LogicalPlan, right: LogicalPlan,
      leftKey: Attribute, leftTs: Attribute,
      rightKey: Attribute, rightTs: Attribute,
      rightValues: Seq[Attribute],
      asofOutput: Seq[Attribute],
      tolerance: Option[Long]) extends BinaryNode {
    override def output: Seq[Attribute] = left.output ++ asofOutput
    override def producedAttributes: AttributeSet = AttributeSet(asofOutput)
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
      copy(left = newLeft, right = newRight)
  }

  /** Planner strategy — register once per session via
    * [[GraftExtensions.register]] (experimental.extraStrategies).
    */
  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinPlan(l, r, lk, lt, rk, rt, rv, out, tol) =>
        AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, rv, out,
          tol) :: Nil
      case _ => Nil
    }
  }

  /** One right record, detached from the (reused) source row buffer. */
  private final class RightRec(val key: Any, val ts: Long,
                               val vals: Array[Any])

  final case class AsOfJoinExec(
      left: SparkPlan, right: SparkPlan,
      leftKey: Attribute, leftTs: Attribute,
      rightKey: Attribute, rightTs: Attribute,
      rightValues: Seq[Attribute],
      asofOutput: Seq[Attribute],
      tolerance: Option[Long]) extends BinaryExecNode {

    override def output: Seq[Attribute] = left.output ++ asofOutput

    // co-partition both sides on the key: EnsureRequirements inserts the
    // two hash exchanges (or reuses existing compatible partitioning —
    // e.g. the right side's groupBy(key, ts) aggregate already hashes on
    // a superset, so only a sort may be needed)
    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKey :: Nil) ::
        ClusteredDistribution(rightKey :: Nil) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

    // left rows pass through in order with columns appended
    override def outputPartitioning: Partitioning = left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] =
      requiredChildOrdering.head

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      import org.apache.spark.sql.catalyst.expressions.Expression
      val lk = BindReferences.bindReference(leftKey: Expression, left.output)
      val lt = BindReferences.bindReference(leftTs: Expression, left.output)
      val rk = BindReferences.bindReference(rightKey: Expression, right.output)
      val rt = BindReferences.bindReference(rightTs: Expression, right.output)
      val rvs = rightValues.map(v =>
        BindReferences.bindReference(v: Expression, right.output))
      val ord = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      val nVals = rightValues.length
      val tol = tolerance

      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val joined = new JoinedRow
        val matched = new GenericInternalRow(1 + nVals)
        val missed = new GenericInternalRow(1 + nVals) // stays all-null

        // sorted-run cursor over the right side; rows from the sorter
        // reuse their buffer, so each record detaches (copies) the few
        // fields it needs — never the whole row
        def pullRight(): RightRec = {
          while (rIter.hasNext) {
            val r = rIter.next()
            val k = rk.eval(r)
            val t = rt.eval(r)
            if (k != null && t != null)
              return new RightRec(InternalRow.copyValue(k),
                t.asInstanceOf[Long],
                rvs.map(e => InternalRow.copyValue(e.eval(r))).toArray)
            // null key/ts can never match — skip
          }
          null
        }

        new Iterator[InternalRow] {
          private var ahead: RightRec = pullRight()
          private var held: RightRec = null // latest right row <= cursor

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val l = lIter.next()
            val lKey = lk.eval(l)
            val lTsRaw = lt.eval(l)
            if (lKey == null || lTsRaw == null) return joined(l, missed)
            val lTs = lTsRaw.asInstanceOf[Long]
            // advance: consume every right record at-or-before (key, ts);
            // the last one consumed is the as-of match candidate
            var c = if (ahead == null) 1 else ord.compare(ahead.key, lKey)
            while (ahead != null && (c < 0 || (c == 0 && ahead.ts <= lTs))) {
              held = ahead
              ahead = pullRight()
              if (ahead != null) c = ord.compare(ahead.key, lKey)
            }
            val hit = held != null && ord.compare(held.key, lKey) == 0 &&
              held.ts <= lTs && tol.forall(t => held.ts >= lTs - t)
            if (hit) {
              matched.update(0, held.ts)
              var i = 0
              while (i < nVals) { matched.update(i + 1, held.vals(i)); i += 1 }
              joined(l, matched)
            } else joined(l, missed)
          }
        }
      }
    }
  }
}
