package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types.DataType

/** Native INTERVAL-CONTAINMENT RANGE JOIN — the second whole-operator
  * rung after [[AsOfJoin]]: for each left row, every right row with
  * equal keys and `lo <= r.time <= hi` (bounds inclusive; left carries
  * the interval, right the point — the event-correlation / effective-
  * dated-probe shape q26/q191/q193 previously expressed by hand-banded
  * bucket joins).
  *
  * Why a custom operator: Spark plans a key-equal θ-join either as the
  * equi-join on keys with the range as a post-filter — per-key
  * CROSS-product work, quadratic in hot-key run length — or the caller
  * hand-bands the time axis (q26's old form: two bucket equi-joins +
  * exact filter), which duplicates probe rows, needs a tuning constant,
  * and double-scans. This exec is the textbook merge form instead
  * (DuckDB's IEJoin lineage, Sedona's range-join layout): both children
  * hash-clustered on the keys (same contract SortMergeJoin declares, so
  * EnsureRequirements/AQE plan the two shuffles exactly like an
  * equi-join's) and sorted by (keys, lo) / (keys, time); a single
  * forward pass per partition keeps a SLIDING WINDOW of right rows —
  * rows with `time < lo` are evicted permanently (left los ascend, so
  * they can never match a later left), rows stream in while
  * `time <= hi`, and each left row emits exactly its window slice. Work
  * is O(sorted runs + output); memory is the peak concurrent window
  * (reported by the `maxWindowRows` metric) — bounded by interval width
  * × per-key event density, the operator's natural working set, never
  * the whole key run.
  *
  * Bound columns must be long-backed (TIMESTAMP/TIMESTAMP_NTZ/BIGINT,
  * or DATE/INT widened) — the merge compares primitive longs, zero
  * boxing (the [[TimeGetter]] path the as-of exec proved out).
  * Inclusive bounds by convention; long-backed callers express strict
  * bounds by ±1. Null left key/bounds never match (left-outer
  * null-extends them); null right keys/times are skipped. `hi < lo`
  * yields no match for that row (not an error).
  *
  * At 100 TB: two co-partitioned shuffles (or fewer when a side is
  * already clustered — ordinary required distributions, so exchange
  * reuse applies), merge cost linear + output. Hot-key intervals
  * degrade only with genuine output size, not with banding constants.
  */
final case class RangeJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftLo: Expression,
    leftHi: Expression,
    rightTime: Expression,
    leftOuter: Boolean,
    broadcastHint: Option[Boolean] = None) extends BinaryNode {

  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[RangeJoin]]; injected by GraftExtensions. Same pick as
  * [[AsOfJoinStrategy]]: broadcast exec when the right side's
  * optimized-plan stats fit under `autoBroadcastJoinThreshold` (or
  * the node pins it via `broadcastHint`), co-partitioned merge
  * otherwise.
  */
object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoin(l, r, lk, rk, lo, hi, rt, outer, hint) =>
      val useBroadcast = hint.getOrElse {
        val thr = org.apache.spark.sql.internal.SQLConf.get
          .autoBroadcastJoinThreshold
        thr > 0 && r.stats.sizeInBytes >= 0 && r.stats.sizeInBytes <= thr
      }
      if (useBroadcast)
        BroadcastRangeJoinExec(lk, rk, lo, hi, rt, outer,
          planLater(l), planLater(r)) :: Nil
      else
        RangeJoinExec(lk, rk, lo, hi, rt, outer,
          planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Co-partitioned sliding-window merge range join (see [[RangeJoin]]
  * scaladoc for the algorithm and its bounds).
  *
  * WHOLE-STAGE CODEGEN (inner case): the exec participates in codegen
  * the way [[org.apache.spark.sql.execution.joins.SortMergeJoinExec]]
  * does — `inputRDDs` hands both sorted children to the stage, and the
  * generated loop drives a compiled per-task [[RangeMergeState]] (the
  * same state machine the interpreted path uses) and feeds the current
  * (left, right) pair's COLUMNS directly into the downstream consume.
  * The win is on output-heavy plans: the interpreted path materializes
  * one joined row per pair (an UnsafeRowJoiner memcpy of both sides —
  * ~10⁸ × row-width bytes at the measured sf3 hot-key point), while
  * the codegen'd consumer reads just the columns it needs and the
  * joined row is never built. Left-outer participates too: the state
  * machine null-extends through a shared all-null UnsafeRow and the
  * generated right-side accessors bind NULLABLE, matching the output
  * schema.
  */
final case class RangeJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftLo: Expression,
    leftHi: Expression,
    rightTime: Expression,
    leftOuter: Boolean,
    left: SparkPlan,
    right: SparkPlan,
    isSkewJoin: Boolean = false) extends BinaryExecNode with CodegenSupport {

  require(leftKeys.length == rightKeys.length,
    "range join: key arity mismatch")
  locally {
    val fams = Seq(leftLo, leftHi, rightTime)
      .map(e => e.dataType -> AsOfJoinExec.timeUnitFamily(e.dataType))
    for ((dt, fam) <- fams)
      require(fam != "unsupported",
        "range join: bound/time must be day-backed (DATE/INT) or " +
          s"long-backed (TIMESTAMP/TIMESTAMP_NTZ/BIGINT), got ${dt.sql}")
    require(fams.map(_._2).distinct.size == 1,
      "range join: lo/hi/time must share one unit family (all " +
        "day-backed or all long-backed) — raw-long comparison across " +
        s"families is meaningless, got ${fams.map(_._1.sql).mkString(", ")}")
  }

  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  /** Relaxed after the AQE skew rewrite, same contract as
    * [[AsOfJoinExec.requiredChildDistribution]]: a skewed left
    * partition is split into mapper-range slices and the right
    * partition duplicated per slice — every left interval still sees
    * its keys' full right run, so the window semantics are unchanged
    * and each left row is emitted from exactly one slice.
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
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftLo, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "maxWindowRows" -> SQLMetrics.createMetric(sparkContext,
      "sum of per-task peak sliding-window rows"))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)

  /** Driver-built, serializable; shipped to tasks either inside the
    * zipPartitions closure (interpreted path) or through the generated
    * class's references array (codegen path).
    */
  private lazy val mergeFactory: RangeMergeFactory = {
    val lOut = left.output
    val rOut = right.output
    val rBind = if (leftOuter) rOut.map(_.withNullability(true)) else rOut
    new RangeMergeFactory(
      leftKeys.map(BindReferences.bindReference(_, lOut)),
      rightKeys.map(BindReferences.bindReference(_, rOut)),
      leftKeys.map(_.dataType),
      BindReferences.bindReference(leftLo, lOut),
      BindReferences.bindReference(leftHi, lOut),
      BindReferences.bindReference(rightTime, rOut),
      leftOuter,
      rBind.map(_.dataType).toArray,
      longMetric("maxWindowRows"))
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
      "range join children are not co-partitioned " +
        s"(${lRdd.getNumPartitions} vs ${rRdd.getNumPartitions})")

    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val state = factory.create(lIter, rIter)
      // per-pair output goes through the codegen'd bitwise
      // UnsafeRowJoiner (row concatenation) rather than a field-by-field
      // UnsafeProjection — the output side dominates wide hot windows
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

  // ---- whole-stage codegen (SortMergeJoinExec's participation shape:
  // the stage zips this node's two sorted inputs, the generated loop
  // drives the compiled merge state machine) -------------------------

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  /** Pair rows are operator-owned buffers (the left child's reused row,
    * window copies) — a buffering parent must copy, as after SMJ.
    */
  override def needCopyResult: Boolean = true

  /** The produce loop consumes both inputs itself, so limit checks can
    * short-circuit it (the same contract SMJ declares).
    */
  override def canCheckLimitNotReached: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    // produce() seeds ctx.freshNamePrefix with the lowercased nodeName;
    // after the AQE skew rewrite that is "rangejoin(skew=true)", which
    // freshName splices verbatim into generated identifiers and Janino
    // rejects at parse time (the builtin joins dodge this only via
    // their hardcoded "smj"/"shj" prefixes). Pin an identifier-safe
    // prefix before the first freshName/addMutableState call.
    ctx.freshNamePrefix = "rangejoin"
    val leftInput = ctx.addMutableState("scala.collection.Iterator",
      "rangeLeftInput", v => s"$v = inputs[0];", forceInline = true)
    val rightInput = ctx.addMutableState("scala.collection.Iterator",
      "rangeRightInput", v => s"$v = inputs[1];", forceInline = true)
    val factoryRef = ctx.addReferenceObj("rangeMergeFactory", mergeFactory,
      classOf[RangeMergeFactory].getName)
    val state = ctx.addMutableState(classOf[RangeMergeState].getName,
      "rangeMergeState",
      v => s"$v = $factoryRef.create($leftInput, $rightInput);",
      forceInline = true)
    val numOutput = metricTerm(ctx, "numOutputRows")
    val leftRow = ctx.freshName("rangeLeftRow")
    val rightRow = ctx.freshName("rangeRightRow")
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

/** Serializable bundle of the bound merge expressions; builds one
  * [[RangeMergeState]] per task from the two co-partitioned sorted
  * iterators. Shared by [[RangeJoinExec]]'s interpreted and codegen
  * paths (the generated class holds it in its references array and
  * calls [[create]] from `init`).
  */
final class RangeMergeFactory(
    lKeysB: Seq[Expression],
    rKeysB: Seq[Expression],
    keyTypes: Seq[DataType],
    loB: Expression,
    hiB: Expression,
    rtB: Expression,
    outer: Boolean,
    nullRightTypes: Array[DataType],
    maxWin: SQLMetric) extends Serializable {

  def create(
      lIter: Iterator[InternalRow],
      rIter: Iterator[InternalRow]): RangeMergeState =
    new RangeMergeState(lIter, rIter, lKeysB, rKeysB, keyTypes,
      loB, hiB, rtB, outer, nullRightTypes, maxWin)
}

/** Per-task sliding-window merge state machine (the algorithm of
  * [[RangeJoin]]'s scaladoc): `advance()` positions the next
  * (left, right) output pair and returns false at stream end;
  * [[leftRow]]/[[rightRow]] expose the current pair. For left-outer,
  * an unmatched or unmatchable left row pairs with a shared all-null
  * right row. The left row is the child iterator's reused buffer —
  * valid until the next `advance()`; window rows are copies.
  */
final class RangeMergeState(
    lIter: Iterator[InternalRow],
    rIter: Iterator[InternalRow],
    lKeysB: Seq[Expression],
    rKeysB: Seq[Expression],
    keyTypes: Seq[DataType],
    loB: Expression,
    hiB: Expression,
    rtB: Expression,
    outer: Boolean,
    nullRightTypes: Array[DataType],
    maxWin: SQLMetric) {

  private val lKeyProj = UnsafeProjection.create(lKeysB)
  private val rKeyProj = UnsafeProjection.create(rKeysB)
  private val keyOrd = RowOrdering.create(
    keyTypes.zipWithIndex.map { case (dt, i) =>
      SortOrder(BoundReference(i, dt, nullable = true), Ascending)
    }, Nil)
  // long-backed by the exec's constructor guard, so the getters always
  // exist — the merge loop compares primitives only
  private val loG = TimeGetter.create(loB).get
  private val hiG = TimeGetter.create(hiB).get
  private val rtG = TimeGetter.create(rtB).get
  private val nullRight: InternalRow =
    if (outer) UnsafeProjection.create(nullRightTypes)
      .apply(new GenericInternalRow(nullRightTypes.length)).copy()
    else null
  private val rBuf = rIter.buffered

  // sliding window for the current key: times ascending, rows are
  // copies (the child iterator reuses its buffers)
  private val winTimes = scala.collection.mutable.ArrayDeque.empty[Long]
  private val winRows = scala.collection.mutable.ArrayDeque.empty[InternalRow]
  private var winKey: InternalRow = null
  // SQLMetrics merge by SUM, so the "peak" is tracked as a task-local
  // high-water mark whose increases are added — the reported number is
  // the sum of per-task peaks (aggregate peak memory demand), not a
  // global max
  private var localPeak = 0L

  private var curL: InternalRow = _
  private var curHi = 0L
  private var matchIdx = 0
  private var outLeft: InternalRow = _
  private var outRight: InternalRow = _

  def leftRow: InternalRow = outLeft
  def rightRow: InternalRow = outRight

  /** Load the next matchable left row into `curL`, maintaining the
    * window for it. Returns true when an outer null-extension of an
    * UNMATCHABLE left (null key/bounds) became the ready pair instead.
    */
  private def advanceLeft(): Boolean = {
    curL = null
    while (lIter.hasNext) {
      val l = lIter.next()
      val loNull = loG.isNull(l)
      val hiNull = hiG.isNull(l)
      var lk: InternalRow = null
      var keyIsNull = false
      if (!loNull && !hiNull) {
        val k = lKeyProj(l)
        keyIsNull = lKeysB.indices.exists(k.isNullAt)
        lk = k
      }
      if (!loNull && !hiNull && !keyIsNull) {
        val lo = loG.get(l)
        val hi = hiG.get(l)
        if (winKey == null || keyOrd.compare(winKey, lk) != 0) {
          winTimes.clear()
          winRows.clear()
          winKey = lk.copy()
        }
        // evict rows no later left of this key can match
        while (winTimes.nonEmpty && winTimes.head < lo) {
          winTimes.removeHead(): Unit
          winRows.removeHead(): Unit
        }
        // stream right rows in: drop smaller keys and
        // behind-the-interval times; buffer rows inside [lo, hi];
        // stop at the first row beyond hi or with a larger key
        var go = true
        while (go && rBuf.hasNext) {
          val r = rBuf.head
          val rk = rKeyProj(r)
          if (rKeysB.indices.exists(rk.isNullAt) || rtG.isNull(r)) {
            rBuf.next(): Unit
          } else {
            val c = keyOrd.compare(rk, lk)
            if (c < 0) rBuf.next(): Unit
            else if (c > 0) go = false
            else {
              val t = rtG.get(r)
              if (t < lo) rBuf.next(): Unit
              else if (t <= hi) {
                winTimes.append(t): Unit
                winRows.append(rBuf.next().copy()): Unit
                if (winTimes.length > localPeak) {
                  maxWin += winTimes.length - localPeak
                  localPeak = winTimes.length
                }
              } else go = false
            }
          }
        }
        curL = l
        curHi = hi
        matchIdx = 0
        return false
      } else if (outer) {
        outLeft = l
        outRight = nullRight
        return true
      }
    }
    false
  }

  /** Positions the next output pair; false when both inputs are
    * drained. Called from the generated produce loop and the
    * interpreted iterator alike.
    */
  def advance(): Boolean = {
    while (true) {
      if (curL == null) {
        if (advanceLeft()) return true // outer-ready unmatchable left
        if (curL == null) return false // exhausted
      }
      // window times ascend and all are >= this row's lo; emit the
      // prefix with t <= hi (a previous wider interval may have
      // buffered beyond it)
      if (matchIdx < winTimes.length && winTimes(matchIdx) <= curHi) {
        outLeft = curL
        outRight = winRows(matchIdx)
        matchIdx += 1
        return true
      }
      val l = curL
      val unmatched = matchIdx == 0
      curL = null
      if (outer && unmatched) {
        outLeft = l
        outRight = nullRight
        return true
      }
    }
    false // unreachable
  }
}

/** Public API for the native range join. */
object RangeJoinOps {

  /** `rangeJoin(left, right, ...)`: for each left row, append every
    * right row with equal key columns and `loCol <= rightTimeCol <=
    * hiCol` (inclusive). Column names resolve per side with the
    * session's resolver; right-side columns must not collide with left
    * ones (asserted, as in [[AsOf.asofJoin]]). All three bound/time
    * columns must be long-backed types.
    */
  def rangeJoin(
      leftDf: DataFrame,
      rightDf: DataFrame,
      leftKeyCols: Seq[String],
      rightKeyCols: Seq[String],
      loCol: String,
      hiCol: String,
      rightTimeCol: String,
      leftOuter: Boolean = false,
      broadcastHint: Option[Boolean] = None): DataFrame = {
    val spark = leftDf.sparkSession
    val resolver = spark.sessionState.conf.resolver
    val lPlan = leftDf.queryExecution.analyzed
    var rPlan = rightDf.queryExecution.analyzed
    val dupNames = lPlan.output.map(_.name)
      .filter(ln => rPlan.output.exists(ra => resolver(ra.name, ln)))
    require(dupNames.isEmpty,
      s"range join: rename right-side columns first, duplicates: $dupNames")
    if (lPlan.outputSet.intersect(rPlan.outputSet).nonEmpty) {
      rPlan = Project(rPlan.output.map(a => Alias(a, a.name)()), rPlan)
    }
    def resolve(plan: LogicalPlan, name: String): Attribute = {
      val hits = plan.output.filter(a => resolver(a.name, name))
      require(hits.length == 1, s"range join: column '$name' is " +
        s"${if (hits.isEmpty) "missing" else "ambiguous"} in " +
        s"${plan.output.map(_.name)}")
      hits.head
    }
    PlanBridge.ofRows(spark, RangeJoin(
      lPlan, rPlan,
      leftKeyCols.map(resolve(lPlan, _)),
      rightKeyCols.map(resolve(rPlan, _)),
      resolve(lPlan, loCol),
      resolve(lPlan, hiCol),
      resolve(rPlan, rightTimeCol),
      leftOuter,
      broadcastHint))
  }
}
