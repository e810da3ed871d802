package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, GenerateUnsafeProjection, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.DataType

/** Broadcast variant of the native range join (see [[RangeJoin]]) —
  * the [[BroadcastAsOfJoinExec]] analogue for interval containment.
  *
  * The fact×dim range shape: a huge fact table whose rows each carry
  * their own [lo, hi] window, probing a SMALL timestamped dimension
  * (calendar entries, policy revisions, deploy markers) for the rows
  * inside each window. The merge exec plans two clustered shuffles;
  * at 100 TB that shuffles the whole fact table to look up a dim that
  * fits in memory. Here the right side is broadcast once
  * (`IdentityBroadcastMode`, so EnsureRequirements/AQE insert and
  * reuse an ordinary BroadcastExchange), each executor builds a
  * per-key time-sorted index once (weak-keyed memo on the broadcast
  * value — [[AsOfIndexCache]], shared with the as-of exec), and each
  * left row probes by hash lookup + lower-bound bisection, emitting
  * the run of right rows with `lo <= t <= hi`. Zero fact-side
  * exchanges or sorts; left partitioning/ordering preserved. A hot
  * left key is harmless — the left side is never shuffled.
  *
  * Semantics are identical to [[RangeJoinExec]] (inclusive bounds,
  * null left key/bounds never match and null-extend under outer,
  * `hi < lo` empty, null right keys/times skipped) — asserted
  * exec-vs-exec on randomized fixtures by BroadcastRangeJoinSpec.
  * Strategy pick ([[RangeJoinStrategy]]): broadcast when the right
  * side's stats fit under `autoBroadcastJoinThreshold`, overridable
  * via `RangeJoin.broadcastHint`.
  *
  * WHOLE-STAGE CODEGEN: the streamed fact side produces through this
  * node and doConsume emits the probe loop inline — the
  * BroadcastHashJoin participation shape, with the outer case using
  * BHJ's found-flag loop and null-guarded right-column accessors so
  * one consume covers both the matched and null-extended emissions.
  */
final case class BroadcastRangeJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftLo: Expression,
    leftHi: Expression,
    rightTime: Expression,
    leftOuter: Boolean,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode with CodegenSupport {

  require(leftKeys.length == rightKeys.length,
    "range join: key arity mismatch")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "range join: key type mismatch")
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

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext,
      "number of matched pairs"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastRangeJoinExec =
    copy(left = newLeft, right = newRight)

  /** Bound-expression bundle + per-executor index memo shared by the
    * interpreted and codegen paths (built at execution time — holds
    * the broadcast handle).
    */
  private def makeLookup(): BroadcastRangeLookup = {
    val rOut = right.output
    val lOut = left.output
    val rBind = if (leftOuter) rOut.map(_.withNullability(true)) else rOut
    new BroadcastRangeLookup(
      right.executeBroadcast[Array[InternalRow]](),
      rightKeys.map(BindReferences.bindReference(_, rOut)),
      BindReferences.bindReference(rightTime, rOut),
      leftKeys.map(BindReferences.bindReference(_, lOut)),
      BindReferences.bindReference(leftLo, lOut),
      BindReferences.bindReference(leftHi, lOut),
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
        // resolve the match run [start, end) eagerly (cheap: one hash
        // lookup + bisection), then stream the emissions — projected
        // rows are reused per the standard exec-iterator contract
        val g = lookup.groupFor(l)
        val lohi = lookup.bounds(l)
        var start = 0
        var end = 0
        if (g != null && lohi != null) {
          start = lookup.lowerBound(g, lohi(0))
          end = start
          val hi = lohi(1)
          val nRows = g.rows.length
          while (end < nRows && g.timesLong(end) <= hi) end += 1
        }
        if (end > start) {
          numOut += (end - start)
          (start until end).iterator.map { j =>
            lookup.countMatch()
            joiner(joined(l, g.rows(j)))
          }
        } else if (outer) {
          numOut += 1
          Iterator.single(joiner(joined(l, nullRight)))
        } else Iterator.empty
      }
    }
  }

  // ---- whole-stage codegen (BroadcastHashJoin participation shape) --

  override def supportCodegen: Boolean = true

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.asInstanceOf[CodegenSupport].inputRDDs()

  /** One streamed row can emit MANY output rows whose right columns
    * point into the stable broadcast array but whose streamed columns
    * are re-consumed per emission — same contract as
    * BroadcastHashJoin with non-unique keys: downstream must copy.
    */
  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String =
    left.asInstanceOf[CodegenSupport].produce(ctx, this)

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode],
      row: ExprCode): String = {
    ctx.freshNamePrefix = "bcrange"
    val lOut = left.output
    val lKeysBnd = leftKeys.map(BindReferences.bindReference(_, lOut))
    val lLoBnd = BindReferences.bindReference(leftLo, lOut)
    val lHiBnd = BindReferences.bindReference(leftHi, lOut)
    val lookupTerm = ctx.addReferenceObj("bcrangeLookup", makeLookup(),
      classOf[BroadcastRangeLookup].getName)
    val groupCls = classOf[AsOfGroup].getName
    ctx.currentVars = input
    val keyEv = GenerateUnsafeProjection.createCode(ctx, lKeysBnd)
    val loEv = lLoBnd.genCode(ctx)
    val hiEv = lHiBnd.genCode(ctx)
    val g = ctx.freshName("bcrangeGroup")
    val i = ctx.freshName("bcrangeIdx")
    val n = ctx.freshName("bcrangeLen")
    val matched = ctx.freshName("bcrangeMatched")
    val numOutput = metricTerm(ctx, "numOutputRows")
    val rBind =
      if (leftOuter) right.output.map(_.withNullability(true))
      else right.output

    if (leftOuter) {
      // BHJ's outer shape: null-guarded right accessors, found-flag
      // loop, ONE consume for matched and null-extended emissions
      val found = ctx.freshName("bcrangeFound")
      val rightVars = rBind.zipWithIndex.map { case (a, idx) =>
        val isNull = ctx.freshName("bcrIsNull")
        val value = ctx.freshName("bcrValue")
        val javaType = CodeGenerator.javaType(a.dataType)
        val valueCode =
          CodeGenerator.getValue(matched, a.dataType, idx.toString)
        val cde =
          code"""
             |boolean $isNull = true;
             |$javaType $value = ${CodeGenerator.defaultValue(a.dataType)};
             |if ($matched != null) {
             |  $isNull = $matched.isNullAt($idx);
             |  $value = $isNull
             |    ? ${CodeGenerator.defaultValue(a.dataType)} : ($valueCode);
             |}
           """.stripMargin
        ExprCode(cde, JavaCode.isNullVariable(isNull),
          JavaCode.variable(value, a.dataType))
      }
      s"""
         |${keyEv.code}
         |${loEv.code}
         |${hiEv.code}
         |$groupCls $g = null;
         |if (!(${loEv.isNull}) && !(${hiEv.isNull})
         |    && !${keyEv.value}.anyNull()) {
         |  $g = $lookupTerm.group(${keyEv.value});
         |}
         |int $n = ($g == null) ? 0 : $g.rows().length;
         |int $i = ($g == null) ? 0 : $lookupTerm.lowerBound($g, ${loEv.value});
         |boolean $found = false;
         |while (($g != null && $i < $n
         |    && $g.timesLong()[$i] <= ${hiEv.value}) || !$found) {
         |  InternalRow $matched = null;
         |  if ($g != null && $i < $n
         |      && $g.timesLong()[$i] <= ${hiEv.value}) {
         |    $matched = $g.rows()[$i];
         |    $lookupTerm.countMatch();
         |  }
         |  $i++;
         |  $found = true;
         |  $numOutput.add(1);
         |  ${evaluateVariables(rightVars)}
         |  ${consume(ctx, input ++ rightVars)}
         |}
       """.stripMargin
    } else {
      ctx.currentVars = null
      ctx.INPUT_ROW = matched
      val rightVars = rBind.zipWithIndex.map { case (a, idx) =>
        org.apache.spark.sql.catalyst.expressions
          .BoundReference(idx, a.dataType, a.nullable).genCode(ctx)
      }
      s"""
         |${keyEv.code}
         |${loEv.code}
         |${hiEv.code}
         |$groupCls $g = null;
         |if (!(${loEv.isNull}) && !(${hiEv.isNull})
         |    && !${keyEv.value}.anyNull()) {
         |  $g = $lookupTerm.group(${keyEv.value});
         |}
         |if ($g != null) {
         |  int $n = $g.rows().length;
         |  int $i = $lookupTerm.lowerBound($g, ${loEv.value});
         |  while ($i < $n && $g.timesLong()[$i] <= ${hiEv.value}) {
         |    InternalRow $matched = $g.rows()[$i];
         |    $i++;
         |    $lookupTerm.countMatch();
         |    $numOutput.add(1);
         |    ${evaluateVariables(rightVars)}
         |    ${consume(ctx, input ++ rightVars)}
         |  }
         |}
       """.stripMargin
    }
  }
}

/** Serializable bound-expression bundle for the broadcast range
  * lookup: builds (once per executor, memoized on the broadcast value
  * through [[AsOfIndexCache]]) the per-key time-sorted index — times
  * pre-extracted to a primitive long array (the logical node requires
  * long-backed bounds) — and serves group lookup + lower-bound
  * bisection to both the interpreted and generated probe loops.
  */
private[plans] final class BroadcastRangeLookup(
    bc: Broadcast[Array[InternalRow]],
    rKeysB: Seq[Expression],
    rTimeB: Expression,
    lKeysB: Seq[Expression],
    lLoB: Expression,
    lHiB: Expression,
    nullRightTypes: Array[DataType],
    numMatched: SQLMetric) extends Serializable {

  private def toLongTime(v: Any): Long = v match {
    case l: java.lang.Long => l.longValue()
    case i: java.lang.Integer => i.longValue()
    case other => other.asInstanceOf[Long]
  }

  /** Everything that shapes the BUILT index: bound key/time
    * expressions (probe bounds don't affect the index). Distinguishes
    * this range index from an as-of index built over the same reused
    * broadcast array — see [[AsOfIndexCache]].
    */
  private val indexFingerprint: String =
    "range:" + (rKeysB :+ rTimeB).map(_.toString).mkString(";")

  @transient private lazy val index = AsOfIndexCache.getOrBuild(bc.value,
    indexFingerprint,
    () => {
      val keyProj = UnsafeProjection.create(rKeysB)
      val ord = RowOrdering.create(
        Seq(SortOrder(rTimeB, Ascending)), Nil)
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
        val times = rows.map(r => toLongTime(rTimeB.eval(r)))
        groups.put(k, new AsOfGroup(rows, times, null))
      }
      groups
    })

  @transient private lazy val lKeyProj = UnsafeProjection.create(lKeysB)
  @transient private lazy val nullRowU: InternalRow =
    UnsafeProjection.create(nullRightTypes)
      .apply(new GenericInternalRow(nullRightTypes.length)).copy()

  /** Shared all-null right row for outer extension. */
  def nullRow(): InternalRow = nullRowU

  /** Codegen/interpreted entry: the key's group, or null. */
  def group(key: UnsafeRow): AsOfGroup = index.get(key)

  /** First index in the group with time >= lo (classic lower bound). */
  def lowerBound(g: AsOfGroup, lo: Long): Int = {
    val times = g.timesLong
    var loI = 0
    var hiI = times.length
    while (loI < hiI) {
      val mid = (loI + hiI) >>> 1
      if (times(mid) < lo) loI = mid + 1 else hiI = mid
    }
    loI
  }

  /** Matched-pair metric tick (callable from generated code). */
  def countMatch(): Unit = numMatched += 1

  /** Interpreted helpers: evaluate the left row's key → group, and its
    * bounds → [lo, hi] (null if either bound is null).
    */
  def groupFor(l: InternalRow): AsOfGroup = {
    val k = lKeyProj(l)
    if (lKeysB.indices.exists(k.isNullAt)) null else index.get(k)
  }

  def bounds(l: InternalRow): Array[Long] = {
    val lo = lLoB.eval(l)
    val hi = lHiB.eval(l)
    if (lo == null || hi == null) null
    else Array(toLongTime(lo), toLongTime(hi))
  }
}
