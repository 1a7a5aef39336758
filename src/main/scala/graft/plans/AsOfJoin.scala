package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graft.bridge

/** Native as-of join — the one relational operator in the engine's surface
  * that Spark's built-ins genuinely can't express as a single operator
  * (SURVEY.md §2.4: the declarative fallback is the union + running-`last`
  * window trick, implemented as q18). This is the full custom-operator
  * stack from the build rules: LogicalPlan node → Strategy → SparkPlan,
  * activated through [[graft.GraftExtensions]] (`injectPlannerStrategy`).
  *
  * Semantics (backward as-of, left outer): for each left row, the right
  * row with the same key and the greatest time ≤ left time; unmatched left
  * rows keep nulls on the right — exactly DuckDB's
  * `ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts`, which is the
  * oracle.
  *
  * Scale: requiredChildDistribution/Ordering let EnsureRequirements plan
  * ONE hash shuffle per side on the key plus a per-partition sort — after
  * which the merge is a single forward pass with O(1) state (current right
  * row per key). Equivalent work to a sort-merge join; no window state, no
  * union blow-up, and AQE still handles the exchanges.
  *
  * Column pruning: the node's `references` derives from its key/time
  * expressions only, so Catalyst's generic ColumnPruning case
  * (`Project(_, child)` over any node) pushes projections through it —
  * `SELECT two cols FROM asof_join(wide, wide)` reads only
  * key + time + referenced columns at each parquet scan, no custom rule
  * needed. Gated in `PlanSpec` ("native as-of join: unused wide columns
  * pruned down to the parquet scan").
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceNs: Option[Long] = None,
    forward: Boolean = false,
    useBroadcast: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy turning the logical node into the physical merge. */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tol, fwd, bcast) =>
      if (bcast)
        AsOfJoinBroadcastExec(planLater(l), planLater(r), lk, rk, lt, rt, tol, fwd) :: Nil
      else
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol, fwd) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceNs: Option[Long] = None,
    forward: Boolean = false) extends BinaryExecNode {
  require(toleranceNs.isEmpty ||
    leftTime.dataType == org.apache.spark.sql.types.LongType,
    "tolerance requires long-typed time columns")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // one shuffle per side on the equi keys…
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // …then sort within partitions by (key, time) so the merge is one pass
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val keyTypes = lKeys.map(_.dataType)
    val timeType = lTime.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
      val lTimeEval = UnsafeProjection.create(Seq(lTime), leftOut)
      val rTimeEval = UnsafeProjection.create(Seq(rTime), rightOut)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(keyTypes)
      val timeOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(Seq(timeType))
      val nullRight = new GenericInternalRow(rightOut.length)
      // bind against NULLABLE right attributes: unmatched lefts emit a
      // null row on the right, so non-nullable binding would read garbage
      val outProj = UnsafeProjection.create(output,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      // NULL right times are dropped up front: a row with no time can
      // never be a well-defined as-of match (DuckDB ASOF `l.ts >= r.ts`
      // is never true on NULL) — and with nulls-first sort ordering it
      // would otherwise sit FIRST in its key group and match everything
      val rBuf = rIter.filter(r => !rTimeEval(r).isNullAt(0)).buffered

      val tol = toleranceNs
      // backward: candidate = LAST right row with time ≤ left time (consumed
      // as we pass it). forward: candidate = FIRST right row with
      // time ≥ left time (peeked, not consumed — later lefts may share it).
      var matchKey: InternalRow = null
      var matchRow: InternalRow = null
      var matchTime: Long = Long.MinValue

      lIter.map { lRow =>
        val lk = lKeyProj(lRow).copy()
        val lt = lTimeEval(lRow).copy()
        // a NULL left time has no as-of point: emit unmatched. Without
        // this guard, a match retained from a PREVIOUS left row of the
        // same key would leak into the null-time row's output.
        if (lt.isNullAt(0)) outProj(joined(lRow, nullRight))
        else {
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val head = rBuf.head
          val hk = rKeyProj(head)
          val kc = keyOrd.compare(hk, lk)
          if (kc < 0) {
            rBuf.next() // behind on key: discard
          } else if (!forward && kc == 0 &&
              timeOrd.compare(rTimeEval(head), lt) <= 0) {
            matchKey = hk.copy()
            if (tol.isDefined) matchTime = rTimeEval(head).getLong(0)
            matchRow = rBuf.next().copy()
          } else if (forward && kc == 0 &&
              timeOrd.compare(rTimeEval(head), lt) < 0) {
            rBuf.next() // forward: rights strictly before left are dead
          } else {
            advancing = false
          }
        }
        val matched =
          if (forward) {
            // peek: head is the first right with key ≥ lk and time ≥ lt
            if (rBuf.hasNext && keyOrd.compare(rKeyProj(rBuf.head), lk) == 0) {
              matchRow = rBuf.head
              if (tol.isDefined) matchTime = rTimeEval(rBuf.head).getLong(0)
              tol.forall(t => matchTime - lt.getLong(0) <= t)
            } else false
          } else {
            matchRow != null && matchKey != null &&
              keyOrd.compare(matchKey.asInstanceOf[InternalRow], lk) == 0 &&
              tol.forall(t => lt.getLong(0) - matchTime <= t)
          }
        outProj(joined(lRow, if (matched) matchRow else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Broadcast variant: the right side is dimension-sized, so it ships to
  * every executor as a per-key sorted timeline and the left side does a
  * binary search per row — NO shuffle and NO sort of the (100 TB) left
  * side. This is the second physical strategy for the same logical
  * operator; callers pick it when they know the right side is small (a
  * planner with stats would choose automatically, like broadcast-vs-SMJ).
  * Requires long-backed time columns (LongType/TimestampType).
  */
object AsOfJoinBroadcastExec {
  private type Index =
    java.util.HashMap[InternalRow, (Array[Long], Array[InternalRow])]
  // executor-side index cache keyed by the broadcast value's IDENTITY in
  // a weak map: the broadcast manager caches one value object per
  // executor, so all tasks share one index build, and GC of the broadcast
  // releases the index with it. A benign double-build race (two first
  // tasks) resolves to whichever finishes last — both are equivalent.
  private val indexCache =
    new java.util.WeakHashMap[AnyRef, Index]()

  private[plans] def indexFor(key: AnyRef, build: () => Index): Index = {
    indexCache.synchronized {
      val hit = indexCache.get(key)
      if (hit != null) return hit
    }
    val built = build()
    indexCache.synchronized { indexCache.put(key, built) }
    built
  }
}

case class AsOfJoinBroadcastExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceNs: Option[Long],
    forward: Boolean) extends BinaryExecNode {
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
  require(Seq(leftTime.dataType, rightTime.dataType).forall(t =>
    t == LongType || t == TimestampType || t == TimestampNTZType),
    "broadcast as-of requires long-backed time columns")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution,
    org.apache.spark.sql.catalyst.plans.physical.BroadcastDistribution(
      org.apache.spark.sql.catalyst.plans.physical.IdentityBroadcastMode))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val rel = right.asInstanceOf[SparkPlan]
      .executeBroadcast[Array[InternalRow]]()
    val leftOut = left.output
    val rightOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val tol = toleranceNs
    val fwd = forward
    left.execute().mapPartitions { lIter =>
      val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rightOut)
      // per-key sorted timeline, built ONCE PER BROADCAST VALUE per
      // executor (identity-keyed weak cache) — not once per task: a 10k-
      // partition left side over a 1M-row broadcast would otherwise
      // re-hash and re-sort the right side 10k times. NULL right times
      // are dropped at build (no time = no well-defined as-of match;
      // indexing them as epoch-0 would fabricate matches).
      val sorted = AsOfJoinBroadcastExec.indexFor(rel.value, { () =>
        val byKey = new java.util.HashMap[InternalRow,
          scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]]()
        for (row <- rel.value) {
          val t = rTimeProj(row)
          if (!t.isNullAt(0)) {
            val k = rKeyProj(row).copy()
            var buf = byKey.get(k)
            if (buf == null) {
              buf = scala.collection.mutable.ArrayBuffer.empty
              byKey.put(k, buf)
            }
            buf.append((t.getLong(0), row.copy()))
          }
        }
        val out = new java.util.HashMap[InternalRow, (Array[Long], Array[InternalRow])]()
        byKey.forEach { (k, buf) =>
          val s = buf.sortBy(_._1)
          out.put(k, (s.map(_._1).toArray, s.map(_._2).toArray))
        }
        out
      })
      val nullRight = new GenericInternalRow(rightOut.length)
      val outProj = UnsafeProjection.create(output,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val joined = new JoinedRow

      lIter.map { lRow =>
        val entry = sorted.get(lKeyProj(lRow))
        var m: InternalRow = null
        val ltRow = lTimeProj(lRow)
        // NULL left time: no as-of point, emit unmatched
        if (entry != null && !ltRow.isNullAt(0)) {
          val (times, rows) = entry
          val lt = ltRow.getLong(0)
          if (!fwd) {
            // rightmost index with times(i) <= lt
            var lo = 0; var hi = times.length - 1; var idx = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (times(mid) <= lt) { idx = mid; lo = mid + 1 } else hi = mid - 1
            }
            if (idx >= 0 && tol.forall(t => lt - times(idx) <= t)) m = rows(idx)
          } else {
            // leftmost index with times(i) >= lt
            var lo = 0; var hi = times.length - 1; var idx = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (times(mid) >= lt) { idx = mid; hi = mid - 1 } else lo = mid + 1
            }
            if (idx >= 0 && tol.forall(t => times(idx) - lt <= t)) m = rows(idx)
          }
        }
        outProj(joined(lRow, if (m != null) m else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinBroadcastExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API: backward as-of left join. */
object AsOfJoinOps {
  def asofJoin(spark: SparkSession, l: DataFrame, r: DataFrame,
      lKey: String, rKey: String, lTime: String, rTime: String,
      toleranceNs: Option[Long] = None, forward: Boolean = false,
      broadcastRight: Boolean = false): DataFrame = {
    val lPlan = bridge.logicalPlan(l)
    val rPlan = bridge.logicalPlan(r)
    def resolve(p: LogicalPlan, n: String): Expression =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    bridge.ofRows(spark, AsOfJoin(lPlan, rPlan,
      Seq(resolve(lPlan, lKey)), Seq(resolve(rPlan, rKey)),
      resolve(lPlan, lTime), resolve(rPlan, rTime), toleranceNs, forward,
      broadcastRight))
  }
}
