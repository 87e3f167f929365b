package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** AS-OF JOIN as a first-class operator — extension tier (c) of the
  * engine's Catalyst surface (custom `LogicalPlan` + `Strategy` +
  * `SparkPlan`), alongside the tier-(b) custom expressions
  * (`CosineSimilarity`, `DotProduct`) and the `FuseDotProduct` rule.
  *
  * Semantics: for every left row, append the LATEST right row of the
  * same key whose timestamp is ≤ the left timestamp (left outer —
  * unmatched left rows null-pad the right side). Ties on the right
  * timestamp resolve to the last row in (key, ts) sort order, so
  * callers wanting a deterministic winner pre-dedup the right side to
  * one row per (key, ts) — exactly what the composed form (q54) does.
  *
  * Why a physical operator: the composable forms either build a range
  * join (candidate pairs ∝ purchases × clicks per user, then a window
  * to keep the max) or a tagged union + running `last()` window over
  * BOTH streams. This exec co-partitions the two sides by key, has the
  * planner sort each by (key, ts) — declared via
  * `requiredChildDistribution`/`requiredChildOrdering`, so Catalyst
  * plans the shuffles/sorts and AQE still applies — and then does ONE
  * forward merge pass per partition: O(|L| + |R|), zero candidate
  * amplification, no per-row state beyond the current match. At 100 TB
  * that is the difference between a join whose intermediate explodes
  * with per-key event density and a scan.
  *
  * Scope guard (this is a demo of the extension tier, not a general
  * join): keys must be BIGINT and timestamps TIMESTAMP. NULL keys or
  * timestamps never match (SQL ASOF semantics): a NULL left row
  * null-pads, a NULL right row is skipped.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    toleranceMicros: Option[Long] = None,
    forward: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]; inject via
  * `spark.experimental.extraStrategies` (see `GraftExtensions`). */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tol, fwd) =>
      AsOfJoinExec(lk, rk, lt, rt, tol, fwd, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    toleranceMicros: Option[Long], forward: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  require(leftKey.dataType == LongType && rightKey.dataType == LongType,
    "as-of join keys must be BIGINT")
  require(leftTs.dataType == TimestampType && rightTs.dataType == TimestampType,
    "as-of join timestamps must be TIMESTAMP")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // the planner inserts the co-partitioning exchanges and per-partition
  // sorts; the exec itself never shuffles or sorts anything
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTs, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTs, right.output)
    val rWidth = right.output.size
    val schema = output
    val tol = toleranceMicros // locals, so the closure captures values, not the plan
    val fwd = forward
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rWidth)
      val project = UnsafeProjection.create(schema, schema)
      new Iterator[InternalRow] {
        // rHead is the TRANSIENT row from the child iterator — the
        // object is stable until the next rIter.next() call, which only
        // happens when rHead is being discarded or retained. Only the
        // retained match is copied (like SortMergeJoin's buffered side),
        // so rows whose key never appears on the left cost no allocation.
        private var rHead: InternalRow = advance()
        private var matchRow: InternalRow = null
        private var matchKey = 0L
        private var matchTs = 0L
        private def advance(): InternalRow =
          if (rIter.hasNext) rIter.next() else null
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val kAny = lkB.eval(l)
          val tAny = ltB.eval(l)
          // SQL ASOF semantics for NULLs: a null key/ts never matches —
          // emit the null-padded row without consuming the right side
          // (null-first sort order means no right progress is lost)
          if (kAny == null || tAny == null)
            return project(joined(l, nullRight))
          val k = kAny.asInstanceOf[Long]
          val t = tAny.asInstanceOf[Long]
          if (fwd) return project(joined(l, forwardMatch(k, t)))
          if (matchRow != null && matchKey != k) matchRow = null
          var scanning = rHead != null
          while (scanning) {
            val rkAny = rkB.eval(rHead)
            // ts is only evaluated on the rk == k path — the rk < k
            // fast-skip and the rk > k stop probe never need it (a
            // null-ts row with a smaller key is skipped either way)
            if (rkAny == null) { // null keys match nothing: skip
              rHead = advance()
              scanning = rHead != null
            } else {
              val rk = rkAny.asInstanceOf[Long]
              if (rk < k) {
                rHead = advance()
                scanning = rHead != null
              } else if (rk == k) {
                val rtAny = rtB.eval(rHead)
                if (rtAny == null || rtAny.asInstanceOf[Long] <= t) {
                  if (rtAny != null) {
                    matchRow = rHead.copy(); matchKey = k
                    matchTs = rtAny.asInstanceOf[Long]
                  }
                  rHead = advance()
                  scanning = rHead != null
                } else scanning = false
              } else scanning = false
            }
          }
          // tolerance (pandas merge_asof semantics): the match is still
          // the LATEST at-or-before row — if that one is too stale the
          // result is null, never an older in-tolerance row
          val fresh = matchRow != null && tol.forall(t - matchTs <= _)
          project(joined(l, if (fresh) matchRow else nullRight))
        }

        /** Forward direction: the EARLIEST right row of key `k` with
          * ts ≥ `t`. Rows behind the frontier are never needed again
          * (left t only grows within a key), so the scan just parks
          * `rHead` on the candidate — which is NOT consumed: the same
          * right row may match many left rows. No copy is ever made. */
        private def forwardMatch(k: Long, t: Long): InternalRow = {
          var scanning = rHead != null
          while (scanning) {
            val rkAny = rkB.eval(rHead)
            if (rkAny == null) { rHead = advance(); scanning = rHead != null }
            else {
              val rk = rkAny.asInstanceOf[Long]
              if (rk < k) { rHead = advance(); scanning = rHead != null }
              else if (rk == k) {
                val rtAny = rtB.eval(rHead)
                if (rtAny == null || rtAny.asInstanceOf[Long] < t) {
                  rHead = advance(); scanning = rHead != null
                } else scanning = false // parked on the earliest ts ≥ t
              } else scanning = false
            }
          }
          val ok = rHead != null && {
            val rkAny = rkB.eval(rHead)
            rkAny != null && rkAny.asInstanceOf[Long] == k &&
              tol.forall(rtB.eval(rHead).asInstanceOf[Long] - t <= _)
          }
          if (ok) rHead else nullRight
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry point (also surfaced as `Graft.asofJoin`). */
object AsOfJoinApi {

  /** Left as-of join: each `left` row gains the latest `right` row with
    * the same key at-or-before its timestamp (`direction = "backward"`,
    * the default) or the earliest at-or-after one (`"forward"`),
    * null-padded when none. With `tolerance`, a match farther than the
    * tolerance window is null-padded instead (pandas `merge_asof`
    * semantics: the match is always the closest row in the direction,
    * never a farther in-window one).
    *
    * The two inputs must have disjoint output columns (alias before
    * joining — enforced) and, for a self-join, come from independent
    * reads so the analyzer can tell the lineages apart. Keys are
    * BIGINT, timestamps TIMESTAMP; NULLs never match.
    */
  def asofJoin(left: org.apache.spark.sql.DataFrame, right: org.apache.spark.sql.DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               tolerance: Option[java.time.Duration] = None,
               direction: String = "backward"): org.apache.spark.sql.DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got '$direction'")
    val names = Seq(leftKey, rightKey, leftTs, rightTs)
    require(names.toSet.size == 4,
      s"as-of join needs four distinct column names, got $names (alias before joining)")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"as-of join inputs must have disjoint columns; both sides carry $overlap " +
        "(alias before joining)")
    tolerance.foreach(d => require(!d.isNegative, s"tolerance must be non-negative, got $d"))
    import org.apache.spark.sql.GraftDatasetFactory.{expr => cExpr}
    val plan = AsOfJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      cExpr(left.col(leftKey)), cExpr(right.col(rightKey)),
      cExpr(left.col(leftTs)), cExpr(right.col(rightTs)),
      tolerance.map(toMicrosSaturating), direction == "forward")
    org.apache.spark.sql.GraftDatasetFactory.ofRows(left.sparkSession, plan)
  }

  /** Duration → micros, saturating at Long.MaxValue — `toNanos` throws
    * for ≥ ~292-year durations, and a huge tolerance should mean
    * "effectively unbounded", not a crash. */
  private def toMicrosSaturating(d: java.time.Duration): Long =
    if (d.getSeconds > Long.MaxValue / 1000000L - 1) Long.MaxValue
    else d.getSeconds * 1000000L + d.getNano / 1000L
}
