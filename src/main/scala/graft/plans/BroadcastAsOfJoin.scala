package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, GenerateUnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType}

/** Broadcast variant of the native as-of join (see [[AsOfJoin]]).
  *
  * The commonest production as-of shape is fact × small dimension — a
  * point-in-time lookup of a slowly-changing dimension's state at each
  * fact row's own timestamp (q512's shape). The sorted-merge exec
  * ([[AsOfJoinExec]]) plans two clustered shuffles; at 100 TB that
  * means shuffling the entire fact table to look up a dimension that
  * fits in memory. This exec is the BroadcastHashJoin analogue: the
  * right side is broadcast once (`IdentityBroadcastMode` — the plain
  * collected rows, so EnsureRequirements/AQE insert and reuse an
  * ordinary BroadcastExchange), each executor builds a per-key
  * time-sorted index ONCE (weak-keyed cache on the broadcast value —
  * partitions share the build, and the entry dies with the broadcast),
  * and each left partition probes by hash-lookup + binary search.
  * The left side needs NO distribution and NO ordering: zero fact-side
  * exchanges, zero sorts, and the node preserves the left child's
  * partitioning and ordering for downstream reuse.
  *
  * Semantics are identical to [[AsOfJoinExec]] across the whole matrix
  * (backward/forward × strict × tolerance × inner/outer × tie-break) —
  * asserted by BroadcastAsOfJoinSpec's exec-vs-exec equality on
  * randomized fixtures. Tie resolution falls out of the same sort: the
  * group's rows are sorted by (time, tieBreak); backward takes the
  * LAST index with time ≤ t (greatest tie-break), forward the FIRST
  * with time ≥ t (smallest tie-break).
  *
  * Strategy choice ([[AsOfJoinStrategy]]): broadcast when the right
  * side's optimized-plan stats fit under
  * `spark.sql.autoBroadcastJoinThreshold`, overridable per-node via
  * `AsOfJoin.broadcastHint` (gated big-big queries pin the merge exec
  * the same way q382 pins merge after the AQE broadcast cliff).
  *
  * Skew note: a hot left key (one user with 10⁸ events) is HARMLESS
  * here — the left side is never shuffled, so the hot key stays spread
  * across whatever partitioning the fact scan produced. The broadcast
  * variant is therefore also the skew escape hatch for fact×dim as-of;
  * big-big skew is handled by [[AsOf.asofJoinSalted]].
  */
final case class BroadcastAsOfJoinExec(
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
    right: SparkPlan)
  extends BinaryExecNode with CodegenSupport {

  require(leftKeys.length == rightKeys.length,
    "as-of join: key arity mismatch")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of join: key type mismatch")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of join: time type mismatch " +
      s"(${leftTime.dataType.sql} vs ${rightTime.dataType.sql})")
  require(toleranceUs.forall(_ >= 0L),
    s"as-of join: tolerance must be >= 0, got ${toleranceUs.get}")
  require(toleranceUs.isEmpty || AsOfJoinExec.isLongBacked(leftTime.dataType),
    s"as-of join: tolerance needs a long-backed time type, " +
      s"got ${leftTime.dataType.sql}")

  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext,
      "number of matched left rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  // Long-backed times (every gated query: TIMESTAMP/TIMESTAMP_NTZ/BIGINT,
  // plus DATE/INT widened) binary-search over a primitive Array[Long];
  // anything else falls back to Array[Any] + the type's interpreted
  // ordering.
  private def isPrimitiveTime: Boolean =
    AsOfJoinExec.isLongBacked(leftTime.dataType) ||
      leftTime.dataType == DateType || leftTime.dataType == IntegerType

  private def toLongTime(v: Any): Long = v match {
    case l: java.lang.Long => l.longValue()
    case i: java.lang.Integer => i.longValue()
    case other => other.asInstanceOf[Long]
  }

  /** Bound-expression bundle + per-executor index memo shared by the
    * interpreted and codegen paths. Built at EXECUTION time (it holds
    * the broadcast handle), shipped to tasks in the closure or the
    * generated class's references array.
    */
  private def makeLookup(): BroadcastAsOfLookup = {
    val rOut = right.output
    val lOut = left.output
    val rBind = if (leftOuter) rOut.map(_.withNullability(true)) else rOut
    new BroadcastAsOfLookup(
      right.executeBroadcast[Array[InternalRow]](),
      rightKeys.map(BindReferences.bindReference(_, rOut)),
      BindReferences.bindReference(rightTime, rOut),
      rightTieBreak.map(t => BindReferences.bindReference(t, rOut)),
      leftKeys.map(BindReferences.bindReference(_, lOut)),
      BindReferences.bindReference(leftTime, lOut),
      isPrimitiveTime, leftTime.dataType,
      forward, strict, toleranceUs,
      rBind.map(_.dataType).toArray,
      longMetric("numMatched"))
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val rOut = right.output
    val lOut = left.output
    val outer = leftOuter
    val outAtts = output
    val numOut = longMetric("numOutputRows")
    val lookup = makeLookup()

    left.execute().mapPartitions { lIter =>
      val rBind = if (outer) rOut.map(_.withNullability(true)) else rOut
      val joiner = UnsafeProjection.create(outAtts, lOut ++ rBind)
      val joined = new JoinedRow()
      val nullRight = lookup.nullRow()
      lIter.flatMap { l =>
        val matched = lookup.findRow(l)
        if (matched != null) {
          numOut += 1
          Iterator.single(joiner(joined(l, matched)))
        } else if (outer) {
          numOut += 1
          Iterator.single(joiner(joined(l, nullRight)))
        } else Iterator.empty
      }
    }
  }

  // ---- whole-stage codegen (the BroadcastHashJoin participation
  // shape: the streamed fact side produces THROUGH this node, and
  // doConsume appends the broadcast lookup inline — scan → as-of →
  // downstream fuse into one stage with zero fact-side exchanges) ----

  /** Primitive (long-backed/date) times only — the generated call site
    * passes the time as a primitive long; other orderable types take
    * the interpreted path (rare, and tolerance already requires
    * long-backed).
    */
  override def supportCodegen: Boolean = isPrimitiveTime

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.asInstanceOf[CodegenSupport].inputRDDs()

  /** ≤1 output row per streamed row and the matched right rows live in
    * the stable broadcast array, so copy requirements are exactly the
    * streamed side's (the default implementation throws on binary
    * nodes — every codegen join must answer this itself).
    */
  override def needCopyResult: Boolean = left match {
    case c: CodegenSupport => c.needCopyResult
    case _ => false
  }

  override protected def doProduce(ctx: CodegenContext): String =
    left.asInstanceOf[CodegenSupport].produce(ctx, this)

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode],
      row: ExprCode): String = {
    ctx.freshNamePrefix = "bcasof"
    val lOut = left.output
    val lKeysBnd = leftKeys.map(BindReferences.bindReference(_, lOut))
    val lTimeBnd = BindReferences.bindReference(leftTime, lOut)
    val lookupTerm = ctx.addReferenceObj("bcasofLookup", makeLookup(),
      classOf[BroadcastAsOfLookup].getName)
    // left key (UnsafeRow) + primitive time evaluated from the streamed
    // side's column variables
    ctx.currentVars = input
    val keyEv = GenerateUnsafeProjection.createCode(ctx, lKeysBnd)
    val timeEv = lTimeBnd.genCode(ctx)
    val matched = ctx.freshName("bcasofMatched")
    val numOutput = metricTerm(ctx, "numOutputRows")
    val rBind =
      if (leftOuter) right.output.map(_.withNullability(true))
      else right.output
    ctx.currentVars = null
    ctx.INPUT_ROW = matched
    val rightVars = rBind.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    if (leftOuter) {
      s"""
         |${keyEv.code}
         |${timeEv.code}
         |InternalRow $matched = null;
         |if (!(${timeEv.isNull}) && !${keyEv.value}.anyNull()) {
         |  $matched = $lookupTerm.find(${keyEv.value}, ${timeEv.value});
         |}
         |if ($matched == null) { $matched = $lookupTerm.nullRow(); }
         |$numOutput.add(1);
         |${evaluateVariables(rightVars)}
         |${consume(ctx, input ++ rightVars)}
       """.stripMargin
    } else {
      s"""
         |${keyEv.code}
         |${timeEv.code}
         |InternalRow $matched = null;
         |if (!(${timeEv.isNull}) && !${keyEv.value}.anyNull()) {
         |  $matched = $lookupTerm.find(${keyEv.value}, ${timeEv.value});
         |}
         |if ($matched != null) {
         |  $numOutput.add(1);
         |  ${evaluateVariables(rightVars)}
         |  ${consume(ctx, input ++ rightVars)}
         |}
       """.stripMargin
    }
  }
}

/** Serializable bound-expression bundle for the broadcast as-of
  * lookup: builds (once per executor, memoized on the broadcast value
  * through [[AsOfIndexCache]]) the per-key time-sorted index, and
  * resolves one left row to its matched right row (or null).
  * [[find]] is the codegen entry point (primitive time passed as a
  * long); [[findRow]] the interpreted one (evaluates key/time off the
  * row, any orderable time type).
  */
private[plans] final class BroadcastAsOfLookup(
    bc: Broadcast[Array[InternalRow]],
    rKeysB: Seq[Expression],
    rTimeB: Expression,
    rTieB: Seq[Expression],
    lKeysB: Seq[Expression],
    lTimeB: Expression,
    primitive: Boolean,
    timeType: DataType,
    fwd: Boolean,
    excl: Boolean,
    tol: Option[Long],
    nullRightTypes: Array[DataType],
    numMatched: SQLMetric) extends Serializable {

  private def toLongTime(v: Any): Long = v match {
    case l: java.lang.Long => l.longValue()
    case i: java.lang.Integer => i.longValue()
    case other => other.asInstanceOf[Long]
  }

  /** Everything that shapes the BUILT index (not the probe): bound
    * key/time/tie expressions + the primitive-extraction flag. Two
    * lookups sharing one broadcast array but differing in any of these
    * must build separate indexes — see [[AsOfIndexCache]].
    */
  private val indexFingerprint: String =
    "asof:" + (rKeysB ++ (rTimeB +: rTieB)).map(_.toString)
      .mkString(";") + s"|prim=$primitive"

  @transient private lazy val index = AsOfIndexCache.getOrBuild(bc.value,
    indexFingerprint,
    () => {
      val keyProj = UnsafeProjection.create(rKeysB)
      // codegen'd (time, tieBreak) ordering over right rows
      val ord = RowOrdering.create(
        SortOrder(rTimeB, Ascending) +:
          rTieB.map(SortOrder(_, Ascending)), Nil)
      val map = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.ArrayBuffer[InternalRow]]()
      bc.value.foreach { r =>
        val rt = rTimeB.eval(r)
        if (rt != null) {
          val k = keyProj(r)
          if (!rKeysB.indices.exists(k.isNullAt)) {
            var buf = map.get(k)
            if (buf == null) {
              buf = new scala.collection.mutable.ArrayBuffer[InternalRow]()
              map.put(k.copy(), buf)
            }
            buf += r
          }
        }
      }
      val groups = new java.util.HashMap[UnsafeRow, AsOfGroup](
        map.size * 2 + 1)
      map.forEach { (k, buf) =>
        val rows = buf.toArray.sortWith((a, b) => ord.compare(a, b) < 0)
        val g =
          if (primitive) {
            val times = rows.map(r => toLongTime(rTimeB.eval(r)))
            new AsOfGroup(rows, times, null)
          } else {
            val times = rows.map(r => rTimeB.eval(r))
            new AsOfGroup(rows, null, times)
          }
        groups.put(k, g)
      }
      groups
    })

  @transient private lazy val lKeyProj = UnsafeProjection.create(lKeysB)
  @transient private lazy val anyOrd =
    if (primitive) null
    else TypeUtils.getInterpretedOrdering(timeType).asInstanceOf[Ordering[Any]]
  @transient private lazy val nullRowU: InternalRow =
    UnsafeProjection.create(nullRightTypes)
      .apply(new GenericInternalRow(nullRightTypes.length)).copy()

  /** Shared all-null right row for outer extension. */
  def nullRow(): InternalRow = nullRowU

  /** Codegen entry: match for (key, primitive time), or null. */
  def find(key: UnsafeRow, t: Long): InternalRow = {
    val g = index.get(key)
    if (g == null) return null
    // first index with time > t (inclusive bound) or >= t (strict
    // bound); classic lower/upper-bound bisection
    val n = g.rows.length
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val c = java.lang.Long.compare(g.timesLong(mid), t)
      val goRight = if (fwd) {
        if (excl) c <= 0 else c < 0 // first >= / > t
      } else {
        if (excl) c < 0 else c <= 0 // first > / >= t
      }
      if (goRight) lo = mid + 1 else hi = mid
    }
    // backward: candidate = lo-1 (last ≤/< t); forward: lo (first ≥/> t)
    val cand = if (fwd) lo else lo - 1
    if (cand >= 0 && cand < n) {
      val within = tol.forall { w =>
        val rt = g.timesLong(cand)
        if (fwd) rt - t <= w else t - rt <= w
      }
      if (within) {
        numMatched += 1
        return g.rows(cand)
      }
    }
    null
  }

  /** Interpreted entry: evaluates key/time off the left row; handles
    * non-primitive orderable time types through the interpreted
    * ordering.
    */
  def findRow(l: InternalRow): InternalRow = {
    val lt = lTimeB.eval(l)
    if (lt == null) return null
    val k = lKeyProj(l)
    if (lKeysB.indices.exists(k.isNullAt)) return null
    if (primitive) return find(k, toLongTime(lt))
    val g = index.get(k)
    if (g == null) return null
    val n = g.rows.length
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val c = anyOrd.compare(g.timesAny(mid), lt)
      val goRight = if (fwd) {
        if (excl) c <= 0 else c < 0
      } else {
        if (excl) c < 0 else c <= 0
      }
      if (goRight) lo = mid + 1 else hi = mid
    }
    val cand = if (fwd) lo else lo - 1
    // tolerance requires long-backed times (constructor guard), which
    // always take the primitive branch — no tolerance check here
    if (cand >= 0 && cand < n) {
      numMatched += 1
      g.rows(cand)
    } else null
  }
}

/** One key group of the broadcast as-of index: rows sorted by
  * (time, tieBreak) with the time column pre-extracted — primitive
  * longs for long-backed/date times, boxed otherwise.
  */
private[plans] final class AsOfGroup(
    val rows: Array[InternalRow],
    val timesLong: Array[Long],
    val timesAny: Array[Any])

/** Executor-local memo of (broadcast-value, lookup fingerprint) →
  * built index, so the per-key sort happens once per executor instead
  * of once per partition.
  *
  * TWO-LEVEL on purpose: `IdentityBroadcastMode` carries no key info,
  * so ReuseExchange/AQE can feed the SAME broadcast row array to two
  * different lookups (e.g. a range join and an as-of join against one
  * dim, or two range joins with different right keys/time columns). A
  * cache keyed on the bare array would silently serve the first-built
  * index to the second lookup — wrong matches. The outer map stays
  * weak-keyed on the broadcast value (entries are collectible as soon
  * as the broadcast itself is released, so the cache cannot pin freed
  * broadcasts); the inner map keys on the caller's expression
  * fingerprint (bound right keys/time/sort exprs + probe semantics).
  * `computeIfAbsent` is atomic at both levels, so concurrent
  * partitions block on one build instead of duplicating it.
  */
private[plans] object AsOfIndexCache {
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[
      AnyRef, java.util.concurrent.ConcurrentHashMap[String, AnyRef]]())

  def getOrBuild[T <: AnyRef](
      key: AnyRef, fingerprint: String, build: () => T): T = {
    val inner = {
      val got = cache.get(key)
      if (got != null) got
      else cache.computeIfAbsent(key, _ =>
        new java.util.concurrent.ConcurrentHashMap[String, AnyRef]())
    }
    inner.computeIfAbsent(fingerprint, _ => build()).asInstanceOf[T]
  }
}
