package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types.DataType

/** Native AS-OF JOIN — the whole-operator rung of this library's
  * custom-operator ladder: a [[LogicalPlan]] node, a planner
  * [[Strategy]], and a [[SparkPlan]] registered through
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions).
  *
  * Semantics (DuckDB's `ASOF JOIN` / pandas `merge_asof` backward,
  * inclusive): for each left row, the single right row with equal keys
  * and the GREATEST right time ≤ left time — optionally within a
  * tolerance — with inner or left-outer null-extension behavior.
  *
  * Why a custom operator instead of composition: Spark's built-in ways
  * to express as-of are (a) the union + `last(_, ignoreNulls)` window
  * trick (q25) — one shuffle but the window drags BOTH sides' payload
  * columns through a single per-key sort partition and null-pads every
  * column of both sides; or (b) a banded range join — tuning-sensitive
  * and duplicating. This exec is the textbook shape instead: both
  * children hash-clustered on the keys (`ClusteredDistribution`, the
  * same contract SortMergeJoin declares, so EnsureRequirements/AQE
  * plan and coalesce the two shuffles exactly like an equi-join's) and
  * sorted by (keys, time); a single forward-only merge pass per
  * partition holds ONE buffered right row — O(1) memory, zero
  * candidate duplication, no band constant to mis-tune, and each
  * side's shuffle carries only its own columns.
  *
  * At 100 TB: two co-partitioned shuffles (or zero/one if a side is
  * already clustered — the node advertises ordinary required
  * distributions, so reuse kicks in), merge cost linear in the two
  * sides' sorted runs.
  *
  * Directions: backward (default — greatest right time ≤ left time,
  * DuckDB `l.t >= r.t`) and forward (smallest right time ≥ left time,
  * DuckDB `l.t <= r.t`, pandas merge_asof direction='forward') — the
  * forward form is what conversion-label generation needs (q513).
  * `strict` excludes exact time equality (pandas
  * allow_exact_matches=false, DuckDB `>`/`<`): the knob self-joins
  * need so a row doesn't match itself (q517's previous-order lookup).
  * Any orderable time type works (DateType in q517); tolerance is
  * restricted to long-backed types by a constructor guard.
  *
  * Determinism contract: among right rows tied on (keys, time) the
  * merge keeps the LAST in sort order for backward and the FIRST for
  * forward, i.e. ties are resolved by the right child's `tieBreak`
  * ordering columns; gated queries pass an explicit tie-break (q510:
  * event_id) or have unique (key, time). Null left time or null left
  * key never matches (SQL join-key convention); null right times/keys
  * are skipped.
  */
final case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    toleranceUs: Option[Long],
    leftOuter: Boolean,
    forward: Boolean = false,
    strict: Boolean = false,
    broadcastHint: Option[Boolean] = None) extends BinaryNode {

  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]]; injected by GraftExtensions.
  *
  * Exec choice, mirroring JoinSelection's broadcast-vs-sort-merge
  * decision: [[BroadcastAsOfJoinExec]] when the right (dimension) side's
  * optimized-plan stats fit under `spark.sql.autoBroadcastJoinThreshold`
  * — the fact side then never shuffles or sorts — else the
  * co-partitioned sorted-merge [[AsOfJoinExec]]. `broadcastHint`
  * overrides in either direction: gated big-big queries pin merge so
  * the 100 TB plan shape is the one the gate exercises (both sides
  * fact-scale — tiny only at test SF), and callers with external
  * knowledge of dimension size can force broadcast.
  */
object AsOfJoinStrategy extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j @ AsOfJoin(l, r, lk, rk, lt, rt, tie, tol, outer, fwd, strict, hint) =>
      val useBroadcast = hint.getOrElse {
        val thr = org.apache.spark.sql.internal.SQLConf.get
          .autoBroadcastJoinThreshold
        thr > 0 && r.stats.sizeInBytes >= 0 && r.stats.sizeInBytes <= thr
      }
      if (useBroadcast) {
        BroadcastAsOfJoinExec(lk, rk, lt, rt, tie, tol, outer, fwd, strict,
          planLater(l), planLater(r)) :: Nil
      } else {
        AsOfJoinExec(lk, rk, lt, rt, tie, tol, outer, fwd, strict,
          planLater(l), planLater(r)) :: Nil
      }
    case _ => Nil
  }
}

/** Co-partitioned sorted-merge as-of join (see [[AsOfJoin]] scaladoc).
  *
  * Required child layout mirrors SortMergeJoinExec: clustered on the
  * join keys, sorted by (keys, time[, tieBreak on the right]); the
  * merge is a single forward pass per partition buffering exactly one
  * candidate right row (the current best match), so memory is O(1)
  * regardless of group size.
  *
  * WHOLE-STAGE CODEGEN (all modes, incl. left-outer): the exec
  * participates the way [[RangeJoinExec]] does — `inputRDDs` hands the
  * stage both sorted children, and the generated loop drives a
  * compiled per-task [[AsOfMergeState]] (the same state machines the
  * interpreted path uses: the single-long-key fast backward merge or
  * the generic one), feeding the matched pair's COLUMNS straight into
  * the downstream consume. The joined output row is never materialized
  * on the codegen path; outer null-extensions read from a shared
  * all-null right row through nullable accessors.
  */
final case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    toleranceUs: Option[Long],
    leftOuter: Boolean,
    forward: Boolean,
    strict: Boolean,
    left: SparkPlan,
    right: SparkPlan,
    isSkewJoin: Boolean = false)
  extends BinaryExecNode with CodegenSupport {

  require(leftKeys.length == rightKeys.length,
    "as-of join: key arity mismatch")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of join: time type mismatch " +
      s"(${leftTime.dataType.sql} vs ${rightTime.dataType.sql})")
  // a negative tolerance would silently produce an empty/near-empty join
  require(toleranceUs.forall(_ >= 0L),
    s"as-of join: tolerance must be >= 0, got ${toleranceUs.get}")
  require(toleranceUs.isEmpty || AsOfJoinExec.isLongBacked(leftTime.dataType),
    s"as-of join: tolerance needs a long-backed time type, " +
      s"got ${leftTime.dataType.sql}")

  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  /** After the AQE skew rewrite (AsOfSkewMitigation) the children are
    * AQEShuffleRead sub-partitions — mapper-range slices of the left's
    * reducer partitions paired with full duplicates of the right's —
    * whose partitioning no longer reports as clustered; the flag
    * relaxes the declared requirement exactly the way
    * SortMergeJoinExec.isSkewJoin does, while the rewrite itself
    * guarantees the stronger pairwise invariant the merge needs (each
    * left slice sees its keys' FULL right run).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    if (isSkewJoin)
      org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution ::
        org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution :: Nil
    else
      ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def nodeName: String =
    if (isSkewJoin) super.nodeName + "(skew=true)" else super.nodeName

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending))
      :+ SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending),
    rightKeys.map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending))
      ++ (SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)
        +: rightTieBreak.map(SortOrder(_,
          org.apache.spark.sql.catalyst.expressions.Ascending))))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext,
      "number of matched left rows"))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  /** Driver-built, serializable; shipped to tasks either inside the
    * zipPartitions closure (interpreted path) or through the generated
    * class's references array (codegen path). The
    * `graft.asof.timeCompare` knob is read HERE, driver-side, so both
    * paths honor it.
    */
  private lazy val mergeFactory: AsOfMergeFactory = {
    val lOut = left.output
    val rOut = right.output
    val rBind = if (leftOuter) rOut.map(_.withNullability(true)) else rOut
    new AsOfMergeFactory(
      leftKeys.map(BindReferences.bindReference(_, lOut)),
      rightKeys.map(BindReferences.bindReference(_, rOut)),
      leftKeys.map(_.dataType),
      leftTime.dataType,
      BindReferences.bindReference(leftTime, lOut),
      BindReferences.bindReference(rightTime, rOut),
      toleranceUs, leftOuter, forward, strict,
      org.apache.spark.sql.internal.SQLConf.get
        .getConfString("graft.asof.timeCompare", "auto"),
      rBind.map(_.dataType).toArray,
      longMetric("numMatched"))
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val outer = leftOuter
    val lOut = left.output
    val rOut = right.output
    val rBind = if (outer) rOut.map(_.withNullability(true)) else rOut
    val outAtts = output
    val factory = mergeFactory
    val numOut = longMetric("numOutputRows")
    val lRdd = left.execute()
    val rRdd = right.execute()
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      "as-of join children are not co-partitioned " +
        s"(${lRdd.getNumPartitions} vs ${rRdd.getNumPartitions})")

    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val state = factory.create(lIter, rIter)
      // per-pair output goes through the codegen'd bitwise
      // UnsafeRowJoiner (row concatenation, no per-field copy); the
      // field-by-field projection remains as the non-UnsafeRow fallback
      val urj = org.apache.spark.sql.catalyst.expressions.codegen
        .GenerateUnsafeRowJoiner.create(
          org.apache.spark.sql.catalyst.types.DataTypeUtils
            .fromAttributes(lOut),
          org.apache.spark.sql.catalyst.types.DataTypeUtils
            .fromAttributes(rBind))
      val joiner = UnsafeProjection.create(outAtts, lOut ++ rBind)
      val joined = new JoinedRow()
      def emit(l: InternalRow, r: InternalRow): InternalRow = (l, r) match {
        case (lu: org.apache.spark.sql.catalyst.expressions.UnsafeRow,
            ru: org.apache.spark.sql.catalyst.expressions.UnsafeRow) =>
          urj.join(lu, ru)
        case _ => joiner(joined(l, r))
      }
      new Iterator[InternalRow] {
        private var ready = false
        override def hasNext: Boolean = {
          if (!ready) ready = state.advance()
          ready
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty iterator")
          ready = false
          numOut += 1
          emit(state.leftRow, state.rightRow)
        }
      }
    }
  }

  // ---- whole-stage codegen (the RangeJoinExec participation shape) --

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  /** Pair rows are operator-owned buffers (the left child's reused row,
    * the buffered best-match copy, or the peeked forward candidate) —
    * a buffering parent must copy, as after SMJ.
    */
  override def needCopyResult: Boolean = true

  /** The produce loop consumes both inputs itself, so limit checks can
    * short-circuit it (the same contract SMJ declares).
    */
  override def canCheckLimitNotReached: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    // identifier-safe prefix: the default variablePrefix lowercases
    // nodeName, whose "(skew=true)" suffix after the AQE rewrite is not
    // a valid Java identifier fragment (the RangeJoinExec lesson)
    ctx.freshNamePrefix = "asofjoin"
    val leftInput = ctx.addMutableState("scala.collection.Iterator",
      "asofLeftInput", v => s"$v = inputs[0];", forceInline = true)
    val rightInput = ctx.addMutableState("scala.collection.Iterator",
      "asofRightInput", v => s"$v = inputs[1];", forceInline = true)
    val factoryRef = ctx.addReferenceObj("asofMergeFactory", mergeFactory,
      classOf[AsOfMergeFactory].getName)
    val state = ctx.addMutableState(classOf[AsOfMergeState].getName,
      "asofMergeState",
      v => s"$v = $factoryRef.create($leftInput, $rightInput);",
      forceInline = true)
    val numOutput = metricTerm(ctx, "numOutputRows")
    val leftRow = ctx.freshName("asofLeftRow")
    val rightRow = ctx.freshName("asofRightRow")
    // column accessors read straight off the pair's two rows — the
    // joined row of the interpreted path is never materialized; outer
    // null-extension reads the shared all-null right row through
    // NULLABLE accessors (rBind), matching the output's nullability
    val rBind =
      if (leftOuter) right.output.map(_.withNullability(true))
      else right.output
    ctx.currentVars = null
    ctx.INPUT_ROW = leftRow
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    ctx.INPUT_ROW = rightRow
    val rightVars = rBind.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    val allVars = leftVars ++ rightVars
    s"""
       |while ($limitNotReachedCond $state.advance()) {
       |  InternalRow $leftRow = $state.leftRow();
       |  InternalRow $rightRow = $state.rightRow();
       |  $numOutput.add(1);
       |  ${evaluateVariables(allVars)}
       |  ${consume(ctx, allVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }
}

/** Serializable bundle of the bound as-of merge expressions; builds one
  * [[AsOfMergeState]] per task from the two co-partitioned sorted
  * iterators, picking the single-long-key FAST backward merge when
  * eligible (knob `graft.asof.timeCompare`=auto) and the generic
  * machine otherwise. Shared by [[AsOfJoinExec]]'s interpreted and
  * codegen paths.
  */
final class AsOfMergeFactory(
    lKeysB: Seq[Expression],
    rKeysB: Seq[Expression],
    keyTypes: Seq[DataType],
    timeType: DataType,
    lTimeB: Expression,
    rTimeB: Expression,
    tol: Option[Long],
    outer: Boolean,
    fwd: Boolean,
    excl: Boolean,
    mode: String,
    nullRightTypes: Array[DataType],
    numMatched: SQLMetric) extends Serializable {

  def create(
      lIter: Iterator[InternalRow],
      rIter: Iterator[InternalRow]): AsOfMergeState = {
    val nullRight: InternalRow = UnsafeProjection.create(nullRightTypes)
      .apply(new GenericInternalRow(nullRightTypes.length)).copy()
    // FAST backward path eligibility: single long-backed key column on
    // both sides (read primitively, no per-row key projection or
    // UnsafeRow key compare) — the round-13 boxing adjudication showed
    // the merge loop is PROJECTION-bound
    val lKeyGetter =
      if (lKeysB.length == 1) TimeGetter.create(lKeysB.head) else None
    val rKeyGetter =
      if (rKeysB.length == 1) TimeGetter.create(rKeysB.head) else None
    val lGet = TimeGetter.create(lTimeB)
    val rGet = TimeGetter.create(rTimeB)
    if (mode == "auto" && !fwd && lGet.isDefined && rGet.isDefined
        && lKeyGetter.isDefined && rKeyGetter.isDefined) {
      new AsOfFastBackwardState(lIter, rIter, lKeyGetter.get,
        rKeyGetter.get, lGet.get, rGet.get, tol, outer, excl, nullRight,
        numMatched)
    } else {
      new AsOfGenericState(lIter, rIter, lKeysB, rKeysB, keyTypes,
        timeType, lTimeB, rTimeB, lGet, rGet, tol, outer, fwd, excl,
        mode == "generic", nullRight, numMatched)
    }
  }
}

/** Per-task as-of merge state machine: `advance()` positions the next
  * output pair and returns false at stream end; [[leftRow]]/[[rightRow]]
  * expose the current pair (for left-outer, an unmatched left pairs
  * with a shared all-null right row). The left row is the child
  * iterator's reused buffer and the forward candidate is a peeked
  * right-child buffer — both valid until the next `advance()`.
  */
private[plans] abstract class AsOfMergeState {
  def advance(): Boolean
  def leftRow: InternalRow
  def rightRow: InternalRow
}

/** Single-long-key backward merge: keys and times read primitively,
  * zero boxing and zero per-row projections in the loop.
  */
private[plans] final class AsOfFastBackwardState(
    lIter: Iterator[InternalRow],
    rIter: Iterator[InternalRow],
    lkG: TimeGetter,
    rkG: TimeGetter,
    lG: TimeGetter,
    rG: TimeGetter,
    tol: Option[Long],
    outer: Boolean,
    excl: Boolean,
    nullRight: InternalRow,
    numMatched: SQLMetric) extends AsOfMergeState {

  private val rBuf = rIter.buffered
  private var lastKey = 0L
  private var haveLast = false
  private var lastRow: InternalRow = null
  private var outL: InternalRow = _
  private var outR: InternalRow = _

  def leftRow: InternalRow = outL
  def rightRow: InternalRow = outR

  def advance(): Boolean = {
    while (lIter.hasNext) {
      val l = lIter.next()
      if (!lG.isNull(l) && !lkG.isNull(l)) {
        val lk = lkG.get(l)
        val lt = lG.get(l)
        var go = true
        while (go && rBuf.hasNext) {
          val r = rBuf.head
          if (rkG.isNull(r) || rG.isNull(r)) {
            rBuf.next(): Unit
          } else {
            val rk = rkG.get(r)
            if (rk < lk) {
              rBuf.next(): Unit
            } else if (rk == lk && {
                val tc = java.lang.Long.compare(rG.get(r), lt)
                if (excl) tc < 0 else tc <= 0
              }) {
              lastKey = rk
              haveLast = true
              lastRow = rBuf.next().copy()
            } else {
              go = false
            }
          }
        }
        val matches = haveLast && lastKey == lk && lastRow != null &&
          tol.forall(t => lt - rG.get(lastRow) <= t)
        if (matches) {
          outL = l
          outR = lastRow
          numMatched += 1
          return true
        } else if (outer) {
          outL = l
          outR = nullRight
          return true
        }
      } else if (outer) {
        outL = l
        outR = nullRight
        return true
      }
    }
    false
  }
}

/** General merge: multi-column/arbitrary-type keys through projected
  * UnsafeRow comparison, backward and forward directions, primitive or
  * interpreted time ordering (`forceGeneric` pins the boxed path for
  * measurement).
  */
private[plans] final class AsOfGenericState(
    lIter: Iterator[InternalRow],
    rIter: Iterator[InternalRow],
    lKeysB: Seq[Expression],
    rKeysB: Seq[Expression],
    keyTypes: Seq[DataType],
    timeType: DataType,
    lTimeB: Expression,
    rTimeB: Expression,
    lGet: Option[TimeGetter],
    rGet: Option[TimeGetter],
    tol: Option[Long],
    outer: Boolean,
    fwd: Boolean,
    excl: Boolean,
    forceGeneric: Boolean,
    nullRight: InternalRow,
    numMatched: SQLMetric) extends AsOfMergeState {

  private val lKeyProj = UnsafeProjection.create(lKeysB)
  private val rKeyProj = UnsafeProjection.create(rKeysB)
  // codegen'd key ordering over the projected UnsafeRow key schema
  // (interpreted fallback inside RowOrdering.create) — no
  // per-comparison interpreted dispatch
  private val keyOrd = RowOrdering.create(
    keyTypes.zipWithIndex.map { case (dt, i) =>
      SortOrder(BoundReference(i, dt, nullable = true), Ascending)
    }, Nil)
  // Primitive time path (TimeGetter): long-backed/date times compare
  // as primitive longs — zero boxed allocations in the merge loop.
  // Non-long-backed orderable types (rare) fall back to eval + the
  // type's interpreted ordering.
  private val primitive = !forceGeneric && lGet.isDefined && rGet.isDefined
  private val lG = lGet.orNull
  private val rG = rGet.orNull
  private val anyOrd =
    if (primitive) null
    else TypeUtils.getInterpretedOrdering(timeType)
      .asInstanceOf[Ordering[Any]]
  private val rBuf = rIter.buffered

  // Current best match (backward): the last right row seen with key ==
  // lastKey and time ≤ the current left time. Copied out of the
  // iterator's reused buffers.
  private var lastKey: InternalRow = null
  private var lastRow: InternalRow = null
  private var outL: InternalRow = _
  private var outR: InternalRow = _

  def leftRow: InternalRow = outL
  def rightRow: InternalRow = outR

  // sign of (right row's time − left row's time); callers ensure both
  // are non-null
  private def cmpRL(r: InternalRow, l: InternalRow): Int =
    if (primitive) java.lang.Long.compare(rG.get(r), lG.get(l))
    else anyOrd.compare(rTimeB.eval(r), lTimeB.eval(l))
  private def leftTimeNull(l: InternalRow): Boolean =
    if (primitive) lG.isNull(l) else lTimeB.eval(l) == null
  private def rightTimeNull(r: InternalRow): Boolean =
    if (primitive) rG.isNull(r) else rTimeB.eval(r) == null

  def advance(): Boolean = {
    while (lIter.hasNext) {
      val l = lIter.next()
      val ltNull = leftTimeNull(l)
      var lk: InternalRow = null
      var keyIsNull = false
      if (!ltNull) {
        val k = lKeyProj(l)
        keyIsNull = lKeysB.indices.exists(k.isNullAt)
        lk = k
      }
      if (!ltNull && !keyIsNull && !fwd) {
        // BACKWARD: consume right rows that can never match a future
        // left row: smaller key, null key/time, or same key with time
        // ≤ lt (each such row becomes the new best match).
        var go = true
        while (go && rBuf.hasNext) {
          val r = rBuf.head
          val rk = rKeyProj(r)
          val rKeyNull = rKeysB.indices.exists(rk.isNullAt)
          if (rKeyNull || rightTimeNull(r)) {
            rBuf.next(): Unit
          } else {
            val c = keyOrd.compare(rk, lk)
            if (c < 0) {
              rBuf.next(): Unit
            } else if (c == 0 && {
                val tc = cmpRL(r, l)
                if (excl) tc < 0 else tc <= 0
              }) {
              lastKey = rk.copy()
              lastRow = rBuf.next().copy()
            } else {
              go = false
            }
          }
        }
        val matches = lastRow != null &&
          keyOrd.compare(lastKey, lk) == 0 &&
          tol.forall { t =>
            // tolerance only defined for long-backed time types,
            // which always take the primitive path
            lG.get(l) - rG.get(lastRow) <= t
          }
        if (matches) {
          outL = l
          outR = lastRow
          numMatched += 1
          return true
        } else if (outer) {
          outL = l
          outR = nullRight
          return true
        }
      } else if (!ltNull && !keyIsNull) {
        // FORWARD: consume right rows strictly behind (smaller key, or
        // same key with time < lt — left times ascend, so they can't
        // match later lefts either); the surviving head, if same-keyed,
        // is the smallest time ≥ lt. It is only PEEKED, never consumed:
        // the same right row may be the next-event match of many
        // earlier left rows.
        var go = true
        while (go && rBuf.hasNext) {
          val r = rBuf.head
          val rk = rKeyProj(r)
          if (rKeysB.indices.exists(rk.isNullAt) || rightTimeNull(r)) {
            rBuf.next(): Unit
          } else {
            val c = keyOrd.compare(rk, lk)
            if (c < 0 || (c == 0 && {
                val tc = cmpRL(r, l)
                if (excl) tc <= 0 else tc < 0
              })) {
              rBuf.next(): Unit
            } else {
              go = false
            }
          }
        }
        val cand = if (rBuf.hasNext) rBuf.head else null
        val matches = cand != null && {
          val rk = rKeyProj(cand)
          keyOrd.compare(rk, lk) == 0 &&
            tol.forall(t => rG.get(cand) - lG.get(l) <= t)
        }
        if (matches) {
          outL = l
          outR = cand
          numMatched += 1
          return true
        } else if (outer) {
          outL = l
          outR = nullRight
          return true
        }
      } else if (outer) {
        outL = l
        outR = nullRight
        return true
      }
    }
    false
  }
}

object AsOfJoinExec {
  /** Time types whose values are long-backed in InternalRow — the types
    * tolerance arithmetic (and the exec's primitive comparison path)
    * supports. Matched on the DataType itself, not its `.sql` string.
    */
  def isLongBacked(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.TimestampType => true
    case org.apache.spark.sql.types.TimestampNTZType => true
    case org.apache.spark.sql.types.LongType => true
    case _ => false
  }

  /** Unit family of a time/bound column. The range-join execs compare
    * the raw stored longs, which is only meaningful when every bound
    * shares one family: DATE/INT store days, TIMESTAMP/TIMESTAMP_NTZ/
    * BIGINT store micros (or caller-defined long units). Mixing a DATE
    * lower bound with a TIMESTAMP right-time would silently compare
    * days against micros — the exec constructors reject it.
    */
  def timeUnitFamily(dt: org.apache.spark.sql.types.DataType): String = dt match {
    case org.apache.spark.sql.types.DateType => "day-backed"
    case org.apache.spark.sql.types.IntegerType => "day-backed"
    case d if isLongBacked(d) => "long-backed"
    case _ => "unsupported"
  }
}

/** Primitive time access for the merge loop: null check + long value
  * without a boxed allocation per comparison. The common case — the
  * time expression is a bound column of a long-backed type (every
  * gated query: TIMESTAMP/TIMESTAMP_NTZ/BIGINT, plus DATE/INT widened)
  * — reads `row.getLong/getInt` directly; a computed long-backed
  * expression falls back to eval+unbox (one young-gen box per ROW, not
  * per comparison); other orderable types take the generic interpreted
  * ordering path in the exec.
  */
private[plans] abstract class TimeGetter extends Serializable {
  def isNull(r: InternalRow): Boolean
  def get(r: InternalRow): Long
}

private[plans] object TimeGetter {
  import org.apache.spark.sql.types._

  def create(bound: Expression): Option[TimeGetter] = bound match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference =>
      b.dataType match {
        case TimestampType | TimestampNTZType | LongType =>
          Some(new TimeGetter {
            private val ord = b.ordinal
            def isNull(r: InternalRow): Boolean = r.isNullAt(ord)
            def get(r: InternalRow): Long = r.getLong(ord)
          })
        case DateType | IntegerType =>
          Some(new TimeGetter {
            private val ord = b.ordinal
            def isNull(r: InternalRow): Boolean = r.isNullAt(ord)
            def get(r: InternalRow): Long = r.getInt(ord).toLong
          })
        case _ => None
      }
    case e => e.dataType match {
      case TimestampType | TimestampNTZType | LongType |
           DateType | IntegerType =>
        Some(new TimeGetter {
          def isNull(r: InternalRow): Boolean = e.eval(r) == null
          def get(r: InternalRow): Long =
            e.eval(r).asInstanceOf[Number].longValue()
        })
      case _ => None
    }
  }
}

/** Public API for the native as-of join. */
object AsOf {

  /** `asofJoin(left, right, keys, ...)`: for each left row, append the
    * right row with equal key columns and the greatest `rightTimeCol` ≤
    * `leftTimeCol` (within `toleranceUs`, if given). Key and time
    * column NAMES are resolved on each side; output carries every
    * column of both inputs, so right-side columns must be renamed to
    * avoid collisions before calling (the method asserts this).
    * `rightTieBreak` columns resolve on the right side and break
    * equal-(key, time) ties deterministically (last in ascending
    * order wins). Column names resolve with the session's resolver
    * (case-insensitive unless `spark.sql.caseSensitive`). `broadcast`:
    * None = auto (strategy broadcasts the right side under the session
    * broadcast threshold), Some(true)/Some(false) = force.
    */
  def asofJoin(
      leftDf: DataFrame,
      rightDf: DataFrame,
      leftKeyCols: Seq[String],
      rightKeyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      rightTieBreak: Seq[String] = Nil,
      toleranceUs: Option[Long] = None,
      leftOuter: Boolean = false,
      forward: Boolean = false,
      strict: Boolean = false,
      broadcast: Option[Boolean] = None): DataFrame = {
    val spark = leftDf.sparkSession
    // name resolution follows the session's resolver (case-insensitive by
    // default, matching DataFrame.col), not raw string equality
    val resolver = spark.sessionState.conf.resolver
    var lPlan = leftDf.queryExecution.analyzed
    var rPlan = rightDf.queryExecution.analyzed
    val dupNames = lPlan.output.map(_.name)
      .filter(ln => rPlan.output.exists(ra => resolver(ra.name, ln)))
    require(dupNames.isEmpty,
      s"as-of join: rename right-side columns first, duplicates: $dupNames")
    // Self-joins reuse expression IDs across sides; re-alias the right
    // side so attribute binding stays unambiguous (what ResolveReferences
    // does for built-in Join nodes).
    if (lPlan.outputSet.intersect(rPlan.outputSet).nonEmpty) {
      rPlan = Project(rPlan.output.map(a => Alias(a, a.name)()), rPlan)
    }
    def resolve(plan: LogicalPlan, name: String): Attribute = {
      val hits = plan.output.filter(a => resolver(a.name, name))
      require(hits.length == 1, s"as-of join: column '$name' is " +
        s"${if (hits.isEmpty) "missing" else "ambiguous"} in " +
        s"${plan.output.map(_.name)}")
      hits.head
    }
    val node = AsOfJoin(
      lPlan, rPlan,
      leftKeyCols.map(resolve(lPlan, _)),
      rightKeyCols.map(resolve(rPlan, _)),
      resolve(lPlan, leftTimeCol),
      resolve(rPlan, rightTimeCol),
      rightTieBreak.map(resolve(rPlan, _)),
      toleranceUs,
      leftOuter,
      forward,
      strict,
      broadcast)
    PlanBridge.ofRows(spark, node)
  }

  /** EXPLICIT skew-mitigated as-of join for BIG × BIG shapes with a
    * hot key. Since round 14 the session also carries an AUTOMATIC
    * runtime form — `org.apache.spark.sql.graft.AsOfSkewMitigation`,
    * an injected AQE rule that splits a skewed left partition by
    * mapper ranges with right-partition duplication, measured FASTER
    * than this helper (BenchAsOf: auto ~0.9 s vs salted ~1.8 s at the
    * 98 %-hot point) — so prefer plain [[asofJoin]] and let the rule
    * fire; this helper remains for sessions running without AQE or
    * with skew handling disabled, and as the portable formulation.
    *
    * AQE's OptimizeSkewedJoin only rewrites SMJ/SHJ, so a hot key (one
    * user with 10⁸ events) funnels one [[AsOfJoinExec]] partition with
    * no builtin runtime mitigation. This helper applies the salting scheme
    * that IS safe for as-of (unlike equi-join salting, which splits
    * the right side): the left side salts each row into one of
    * `salts` buckets (hash of its time value — any deterministic
    * per-row assignment works, since every left row is matched
    * independently), and the right side is REPLICATED to all salts, so
    * each salt bucket sees the FULL right run of its key and the merge
    * semantics are unchanged in every mode (backward/forward/strict/
    * tolerance/outer) — proven by the equality checks in BenchAsOf and
    * AsOfJoinSpec. Cost: the right shuffle grows ×salts; worth it when
    * the hot key's left run dwarfs the whole right side (the typical
    * skew shape). For fact × small-dim skew prefer the broadcast exec
    * ([[BroadcastAsOfJoinExec]]), which is immune for free.
    */
  def asofJoinSalted(
      leftDf: DataFrame,
      rightDf: DataFrame,
      leftKeyCols: Seq[String],
      rightKeyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      rightTieBreak: Seq[String] = Nil,
      toleranceUs: Option[Long] = None,
      leftOuter: Boolean = false,
      forward: Boolean = false,
      strict: Boolean = false,
      salts: Int = 16): DataFrame = {
    import org.apache.spark.sql.functions.{col, explode, hash, lit, pmod, sequence}
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val saltCol = "__graft_asof_salt"
    val rSaltCol = "__graft_asof_rsalt"
    require(!(leftDf.columns ++ rightDf.columns).exists(
        c => c == saltCol || c == rSaltCol),
      s"column name collision with $saltCol/$rSaltCol")
    val l2 = leftDf.withColumn(saltCol,
      pmod(hash(col(leftTimeCol)), lit(salts)).cast("long"))
    val r2 = rightDf.withColumn(rSaltCol,
      explode(sequence(lit(0L), lit(salts - 1L))))
    asofJoin(l2, r2,
      leftKeyCols :+ saltCol, rightKeyCols :+ rSaltCol,
      leftTimeCol, rightTimeCol, rightTieBreak, toleranceUs,
      leftOuter, forward, strict, broadcast = Some(false))
      .drop(saltCol, rSaltCol)
  }
}
