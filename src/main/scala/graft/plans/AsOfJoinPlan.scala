package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, BinaryNode => LogicalBinaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Tier-(c) of the Catalyst extension ladder (SURVEY §4): a custom
  * LOGICAL operator + planner Strategy + PHYSICAL operator for the
  * backward as-of join — the whole-operator semantics Spark's built-in
  * joins cannot express (a range join degenerates to per-band
  * re-shuffles; the union+window form in [[graft.operators.AsOf]] is
  * the compositional workaround and stays the reference
  * implementation this node is proven equal to).
  *
  * Physical shape: both children hash-CO-PARTITIONED on the keys
  * (`requiredChildDistribution`) and sorted by (keys, ts)
  * (`requiredChildOrdering`) — Spark's EnsureRequirements inserts the
  * exchanges/sorts exactly as it would for a shuffled join — then ONE
  * forward streaming merge per partition: each partition's right
  * cursor advances monotonically, holding only the single latest
  * candidate row per key, never buffering a window frame or unioning
  * the inputs. At 100 TB that is one exchange of each side and O(1)
  * state per partition.
  *
  * Semantics (matching `AsOf.joinBackward` and DuckDB `ASOF LEFT
  * JOIN`): for every left row, attach the payload of the LATEST right
  * row with the same keys and `rightTs <= leftTs` (ties among equal
  * (keys, ts) right rows resolved by `rightOrder`, last wins); no
  * match → null payload. `toleranceUs` bounds leftTs − rightTs.
  * Ts columns must be LongType (integer event time — the engine's
  * events contract); the caller wrapper enforces null-key/null-ts
  * right rows are dropped (SQL equi-join semantics).
  */
final case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightPayload: Seq[Attribute],
    rightOrder: Seq[Attribute],
    toleranceUs: Option[Long]) extends LogicalBinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: [[AsOfJoin]] → [[AsOfJoinExec]], registered via
  * `graft.GraftExtensions` (builder-time) and `Engine.session`
  * (live-session `spark.experimental.extraStrategies`).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      AsOfJoinExec(planLater(j.left), planLater(j.right),
        j.leftKeys, j.rightKeys, j.leftTs, j.rightTs,
        j.rightPayload, j.rightOrder, j.toleranceUs) :: Nil
    case _ => Nil
  }
}

/** Physical backward as-of join. See [[AsOfJoin]] for the contract. */
final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightPayload: Seq[Attribute],
    rightOrder: Seq[Attribute],
    toleranceUs: Option[Long]) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  // Co-partition like a shuffled join: EnsureRequirements matches the
  // two ClusteredDistributions' shuffle specs position-by-position, so
  // both sides land in compatible HashPartitionings (and AQE validates
  // any coalescing against this same requirement).
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(a => SortOrder(a, Ascending)),
    (rightKeys ++ Seq(rightTs) ++ rightOrder).map(a => SortOrder(a, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTsB = leftTs
    val rTsB = rightTs
    val payloadB = rightPayload
    val outB = output
    val keyTypes = leftKeys.map(_.dataType)
    val tol = toleranceUs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsB), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsB), rOut)
      val payloadProj = UnsafeProjection.create(payloadB, rOut)
      // bind the payload side NULLABLE (same as output): unmatched left
      // rows read the all-null row below, and a projection bound to a
      // non-nullable payload attribute would skip the null check —
      // emitting 0 for primitives or NPE-ing on strings instead of NULL
      // (SortMergeJoinExec widens its buffered side the same way)
      val resultProj = UnsafeProjection.create(
        outB, lOut ++ payloadB.map(_.withNullability(true)))
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val joined = new JoinedRow
      val nullPayload = new GenericInternalRow(payloadB.length)

      new Iterator[InternalRow] {
        // the un-consumed head of the right side, with its key/ts
        // hoisted out of the per-left-row loop (projected exactly once
        // per cursor advance, not once per comparison): sorter
        // iterators re-point their row buffer only on next(), and the
        // key projection's buffer is re-pointed only by the next
        // rKeyProj call — both happen solely inside advance(). The
        // candidate is copied because the cursor DOES move past it.
        private var rRow: InternalRow = null
        private var rKey: UnsafeRow = null
        private var rTs: Long = 0L
        private var candKey: UnsafeRow = null
        private var candTs: Long = 0L
        private var candPayload: UnsafeRow = null

        private def advance(): Unit = {
          rRow = if (rIter.hasNext) rIter.next() else null
          if (rRow != null) {
            rKey = rKeyProj(rRow)
            rTs = rTsProj(rRow).getLong(0)
          }
        }
        advance()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTsRow = lTsProj(l)
          val lTsNull = lTsRow.isNullAt(0)
          val lTs = if (lTsNull) 0L else lTsRow.getLong(0)
          // advance the right cursor through every row that is still
          // at-or-before this left row; the last one seen per key is
          // the latest match (right side is (keys, ts, order)-sorted)
          var advancing = !lTsNull
          while (advancing && rRow != null) {
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) {
              // right key already below every remaining left key
              // (left is key-ascending too): discard
              advance()
            } else if (c == 0 && rTs <= lTs) {
              candKey = rKey.copy()
              candTs = rTs
              candPayload = payloadProj(rRow).copy()
              advance()
            } else {
              advancing = false
            }
          }
          // subtractExact: a pathological sentinel ts would wrap the
          // gap negative and attach a stale match — fail loudly like
          // the window form's ANSI arithmetic would
          val matched = !lTsNull && candKey != null &&
            keyOrd.compare(candKey, lKey) == 0 &&
            tol.forall(t => java.lang.Math.subtractExact(lTs, candTs) <= t)
          resultProj(joined(l, if (matched) candPayload else nullPayload))
        }
      }
    }
  }
}
