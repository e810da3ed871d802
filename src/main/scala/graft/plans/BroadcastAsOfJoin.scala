package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.{DateType, IntegerType}

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
    right: SparkPlan) extends BinaryExecNode {

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

  override protected def doExecute(): RDD[InternalRow] = {
    val rOut = right.output
    val lOut = left.output
    val rKeysB = rightKeys.map(BindReferences.bindReference(_, rOut))
    val lKeysB = leftKeys.map(BindReferences.bindReference(_, lOut))
    val rTimeB = BindReferences.bindReference(rightTime, rOut)
    val lTimeB = BindReferences.bindReference(leftTime, lOut)
    val sortOrders = (SortOrder(rTimeB,
        org.apache.spark.sql.catalyst.expressions.Ascending)
      +: rightTieBreak.map(t => SortOrder(
        BindReferences.bindReference(t, rOut),
        org.apache.spark.sql.catalyst.expressions.Ascending)))
    val primitive = isPrimitiveTime
    val timeType = leftTime.dataType
    val tol = toleranceUs
    val outer = leftOuter
    val fwd = forward
    val excl = strict
    val outAtts = output
    val numOut = longMetric("numOutputRows")
    val numMatchedM = longMetric("numMatched")

    val bc = right.executeBroadcast[Array[InternalRow]]()

    left.execute().mapPartitions { lIter =>
      val index = AsOfIndexCache.getOrBuild(bc.value, () => {
        val keyProj = UnsafeProjection.create(rKeysB)
        // codegen'd (time, tieBreak) ordering over right rows
        val ord = RowOrdering.create(sortOrders, Nil)
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

      val lKeyProj = UnsafeProjection.create(lKeysB)
      val rBind = if (outer) rOut.map(_.withNullability(true)) else rOut
      val joiner = UnsafeProjection.create(outAtts, lOut ++ rBind)
      val joined = new JoinedRow()
      val nullRight = new GenericInternalRow(rOut.length)
      val anyOrd =
        if (primitive) null
        else TypeUtils.getInterpretedOrdering(timeType).asInstanceOf[Ordering[Any]]

      lIter.flatMap { l =>
        val lt = lTimeB.eval(l)
        var matched: InternalRow = null
        if (lt != null) {
          val k = lKeyProj(l)
          if (!lKeysB.indices.exists(k.isNullAt)) {
            val g = index.get(k)
            if (g != null) {
              // first index with time > lt (inclusive bound) or >= lt
              // (strict bound); classic lower/upper-bound bisection
              val n = g.rows.length
              val idx =
                if (primitive) {
                  val t = toLongTime(lt)
                  var lo = 0; var hi = n
                  while (lo < hi) {
                    val mid = (lo + hi) >>> 1
                    val c = java.lang.Long.compare(g.timesLong(mid), t)
                    val goRight = if (fwd) {
                      if (excl) c <= 0 else c < 0 // first >= / > lt
                    } else {
                      if (excl) c < 0 else c <= 0 // first > / >= lt
                    }
                    if (goRight) lo = mid + 1 else hi = mid
                  }
                  lo
                } else {
                  var lo = 0; var hi = n
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
                  lo
                }
              // backward: candidate = idx-1 (last ≤/< lt);
              // forward: candidate = idx (first ≥/> lt)
              val cand = if (fwd) idx else idx - 1
              if (cand >= 0 && cand < n) {
                val within = tol.forall { t =>
                  val rt = g.timesLong(cand)
                  val lv = toLongTime(lt)
                  if (fwd) rt - lv <= t else lv - rt <= t
                }
                if (within) matched = g.rows(cand)
              }
            }
          }
        }
        if (matched != null) {
          numMatchedM += 1
          numOut += 1
          Iterator.single(joiner(joined(l, matched)))
        } else if (outer) {
          numOut += 1
          Iterator.single(joiner(joined(l, nullRight)))
        } else Iterator.empty
      }
    }
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

/** Executor-local memo of broadcast-value → built as-of index, so the
  * per-key sort happens once per executor instead of once per
  * partition. Weak keys: the entry is collectible as soon as the
  * broadcast value itself is released, so the cache cannot pin freed
  * broadcasts. `computeIfAbsent` on the synchronized wrapper is atomic,
  * so concurrent partitions block on one build instead of duplicating
  * it.
  */
private[plans] object AsOfIndexCache {
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[AnyRef, AnyRef]())

  def getOrBuild[T <: AnyRef](key: AnyRef, build: () => T): T = {
    val got = cache.get(key)
    if (got != null) got.asInstanceOf[T]
    else cache.computeIfAbsent(key, _ => build()).asInstanceOf[T]
  }
}
