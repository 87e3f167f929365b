package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, BoundReference, Descending, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** AS-OF JOIN as a first-class operator — extension tier (c) of the
  * engine's Catalyst surface (custom `LogicalPlan` + `Strategy` +
  * `SparkPlan`), alongside the tier-(b) custom expressions
  * (`CosineSimilarity`, `DotProduct`) and the `FuseDotProduct` rule.
  *
  * Semantics: for every left row, append the LATEST right row of the
  * same key whose timestamp is ≤ the left timestamp (left outer —
  * unmatched left rows null-pad the right side). Equal-timestamp right
  * rows resolve through `tieBreak`: the row with the GREATEST tie-break
  * value wins (both directions). The operator folds the tie-break into
  * the planner-requested right-side sort — ascending behind the
  * backward frontier so the last-overwritten match is the max,
  * descending ahead of the forward frontier so the first-parked row is
  * the max — so callers never pre-dedup the right side (a whole
  * window + exchange saved vs the dedup-then-join form).
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
    forward: Boolean = false,
    tieBreak: Seq[Expression] = Nil) extends BinaryNode {

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
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tol, fwd, tie) =>
      AsOfJoinExec(lk, rk, lt, rt, tol, fwd, tie, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    toleranceMicros: Option[Long], forward: Boolean,
    tieBreak: Seq[Expression],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode with CodegenSupport {

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

  // tie-break columns ride the planner-requested right sort: ascending
  // for the backward merge (the scan overwrites through equal ts, so
  // the LAST row — the max tie-break — wins), descending for the
  // forward merge (the scan PARKS on the first row at the frontier, so
  // descending puts the max tie-break first). Either way "greatest
  // tie-break wins" without the caller pre-deduplicating the right side.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      tieBreak.map(e => SortOrder(e, if (forward) Descending else Ascending)))

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

  // -------------------------------------------------------------------
  // Whole-stage codegen (round-5/6 carried item): same SMJ-style shape —
  // the two sorted children stay their own stages and feed this stage as
  // row ITERATORS (WholeStageCodegenExec zips two input RDDs), while the
  // merge loop itself is generated straight-line Java: primitive
  // key/ts access (no eval() boxing), the match held as a mutable field,
  // and the output columns extracted into locals consumed by the parent
  // operator — so a downstream projection/aggregate fuses with the merge
  // instead of paying a per-row UnsafeProjection + iterator hop.
  // -------------------------------------------------------------------

  private def boundOrdinal(e: Expression, from: Seq[Attribute]): Option[Int] =
    BindReferences.bindReference(e, from, allowFailures = true) match {
      case b: BoundReference => Some(b.ordinal)
      case _ => None
    }

  // generated primitive access needs plain column references; anything
  // fancier (a computed key) falls back to the interpreted doExecute
  override def supportCodegen: Boolean =
    boundOrdinal(leftKey, left.output).isDefined &&
      boundOrdinal(leftTs, left.output).isDefined &&
      boundOrdinal(rightKey, right.output).isDefined &&
      boundOrdinal(rightTs, right.output).isDefined

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // the emitted row mixes a live left row with a retained/parked right
  // row; downstream buffering operators must copy (same contract as SMJ)
  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val lkOrd = boundOrdinal(leftKey, left.output).get
    val ltOrd = boundOrdinal(leftTs, left.output).get
    val rkOrd = boundOrdinal(rightKey, right.output).get
    val rtOrd = boundOrdinal(rightTs, right.output).get

    val leftInput = ctx.addMutableState("scala.collection.Iterator", "asofLeftInput",
      v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator", "asofRightInput",
      v => s"$v = inputs[1];")
    val rHead = ctx.addMutableState("InternalRow", "asofRHead")
    val started = ctx.addMutableState("boolean", "asofStarted")
    val matchRow = ctx.addMutableState("InternalRow", "asofMatchRow")
    val matchKey = ctx.addMutableState("long", "asofMatchKey")
    val matchTs = ctx.addMutableState("long", "asofMatchTs")

    val leftRow = ctx.freshName("leftRow")
    val matched = ctx.freshName("matched")
    val k = ctx.freshName("k")
    val t = ctx.freshName("t")

    val advance =
      s"$rHead = $rightInput.hasNext() ? (InternalRow) $rightInput.next() : null;"

    // merge body: mirrors doExecute()'s interpreted loop line for line
    val mergeBody = if (!forward) {
      val freshCond = toleranceMicros
        .map(v => s" && ($t - $matchTs) <= ${v}L").getOrElse("")
      s"""
         |if ($matchRow != null && $matchKey != $k) $matchRow = null;
         |boolean scanning = $rHead != null;
         |while (scanning) {
         |  if ($rHead.isNullAt($rkOrd)) { $advance scanning = $rHead != null; }
         |  else {
         |    long rk = $rHead.getLong($rkOrd);
         |    if (rk < $k) { $advance scanning = $rHead != null; }
         |    else if (rk == $k) {
         |      if ($rHead.isNullAt($rtOrd)) { $advance scanning = $rHead != null; }
         |      else {
         |        long rt = $rHead.getLong($rtOrd);
         |        if (rt <= $t) {
         |          $matchRow = (InternalRow) $rHead.copy();
         |          $matchKey = $k; $matchTs = rt;
         |          $advance scanning = $rHead != null;
         |        } else scanning = false;
         |      }
         |    } else scanning = false;
         |  }
         |}
         |if ($matchRow != null$freshCond) $matched = $matchRow;
       """.stripMargin
    } else {
      val tolCond = toleranceMicros
        .map(v => s" && ($rHead.getLong($rtOrd) - $t) <= ${v}L").getOrElse("")
      s"""
         |boolean scanning = $rHead != null;
         |while (scanning) {
         |  if ($rHead.isNullAt($rkOrd)) { $advance scanning = $rHead != null; }
         |  else {
         |    long rk = $rHead.getLong($rkOrd);
         |    if (rk < $k) { $advance scanning = $rHead != null; }
         |    else if (rk == $k) {
         |      if ($rHead.isNullAt($rtOrd) || $rHead.getLong($rtOrd) < $t) {
         |        $advance scanning = $rHead != null;
         |      } else scanning = false; // parked on the earliest ts >= t
         |    } else scanning = false;
         |  }
         |}
         |if ($rHead != null && !$rHead.isNullAt($rkOrd)
         |    && $rHead.getLong($rkOrd) == $k$tolCond) $matched = $rHead;
       """.stripMargin
    }

    // output columns: left side reads the live left row; right side is
    // null-padded when there is no match, otherwise reads the retained/
    // parked right row — evaluated into locals BEFORE consume, so the
    // transient row objects never escape this iteration
    ctx.currentVars = null
    ctx.INPUT_ROW = leftRow
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    ctx.INPUT_ROW = matched
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      val ev = BoundReference(i, a.dataType, nullable = true).genCode(ctx)
      val isNull = ctx.freshName("isNull")
      val value = ctx.freshName("value")
      val javaType = CodeGenerator.javaType(a.dataType)
      val wrapped =
        code"""
              |boolean $isNull = true;
              |$javaType $value = ${CodeGenerator.defaultValue(a.dataType)};
              |if ($matched != null) {
              |  ${ev.code}
              |  $isNull = ${ev.isNull};
              |  $value = ${ev.value};
              |}
         """.stripMargin
      ExprCode(wrapped, JavaCode.isNullVariable(isNull),
        JavaCode.variable(value, a.dataType))
    }

    s"""
       |while ($leftInput.hasNext()) {
       |  InternalRow $leftRow = (InternalRow) $leftInput.next();
       |  InternalRow $matched = null;
       |  if (!$leftRow.isNullAt($lkOrd) && !$leftRow.isNullAt($ltOrd)) {
       |    long $k = $leftRow.getLong($lkOrd);
       |    long $t = $leftRow.getLong($ltOrd);
       |    if (!$started) { $advance $started = true; }
       |    $mergeBody
       |  }
       |  ${consume(ctx, leftVars ++ rightVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }
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
    *
    * `tieBreak` names right-side columns that decide among EQUAL-
    * timestamp candidates: the row with the greatest tie-break value
    * wins, in both directions. Without it, the winner among duplicates
    * is whichever equal-ts row the sort emitted last (backward) /
    * first (forward) — fine when the right side is unique per
    * (key, ts), nondeterministic otherwise. The tie-break costs
    * nothing: it rides the sort the planner already inserts, where the
    * dedup-then-join alternative pays a whole extra window + exchange.
    */
  def asofJoin(left: org.apache.spark.sql.DataFrame, right: org.apache.spark.sql.DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               tolerance: Option[java.time.Duration] = None,
               direction: String = "backward",
               tieBreak: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
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
      tolerance.map(toMicrosSaturating), direction == "forward",
      tieBreak.map(c => cExpr(right.col(c))))
    org.apache.spark.sql.GraftDatasetFactory.ofRows(left.sparkSession, plan)
  }

  /** Duration → micros, saturating at Long.MaxValue — `toNanos` throws
    * for ≥ ~292-year durations, and a huge tolerance should mean
    * "effectively unbounded", not a crash. */
  private def toMicrosSaturating(d: java.time.Duration): Long =
    if (d.getSeconds > Long.MaxValue / 1000000L - 1) Long.MaxValue
    else d.getSeconds * 1000000L + d.getNano / 1000L
}
