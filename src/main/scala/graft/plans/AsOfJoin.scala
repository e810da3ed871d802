package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.graft.PlanBridge

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
    strict: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] to [[AsOfJoinExec]]; injected by GraftExtensions. */
object AsOfJoinStrategy extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tie, tol, outer, fwd, strict) =>
      AsOfJoinExec(lk, rk, lt, rt, tie, tol, outer, fwd, strict,
        planLater(l), planLater(r)) :: Nil
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
    right: SparkPlan) extends BinaryExecNode {

  require(leftKeys.length == rightKeys.length,
    "as-of join: key arity mismatch")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of join: time type mismatch " +
      s"(${leftTime.dataType.sql} vs ${rightTime.dataType.sql})")
  require(toleranceUs.isEmpty || Seq("TIMESTAMP_NTZ", "TIMESTAMP", "BIGINT")
      .contains(leftTime.dataType.sql),
    s"as-of join: tolerance needs a long-backed time type, " +
      s"got ${leftTime.dataType.sql}")

  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

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

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val tol = toleranceUs
    val outer = leftOuter
    val fwd = forward
    val excl = strict
    val lOut = left.output
    val rOut = right.output
    val lKeysB = leftKeys.map(BindReferences.bindReference(_, lOut))
    val rKeysB = rightKeys.map(BindReferences.bindReference(_, rOut))
    val lTimeB = BindReferences.bindReference(leftTime, lOut)
    val rTimeB = BindReferences.bindReference(rightTime, rOut)
    val outAtts = output

    val numOut = longMetric("numOutputRows")
    val numMatchedM = longMetric("numMatched")
    val lRdd = left.execute()
    val rRdd = right.execute()
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      "as-of join children are not co-partitioned " +
        s"(${lRdd.getNumPartitions} vs ${rRdd.getNumPartitions})")

    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB)
      val rKeyProj = UnsafeProjection.create(rKeysB)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      // In outer mode the null-extended right side must bind as nullable,
      // or non-nullable right columns would read 0/"" instead of null.
      val rBind = if (outer) rOut.map(_.withNullability(true)) else rOut
      val joiner = UnsafeProjection.create(outAtts, lOut ++ rBind)
      val joined = new JoinedRow()
      val nullRight = new GenericInternalRow(rOut.length)
      val rBuf = rIter.buffered

      // Current best match: the last right row seen with key == lastKey
      // and time ≤ the current left time. Copied out of the iterator's
      // reused buffers.
      var lastKey: InternalRow = null
      var lastTime: Any = null
      var lastRow: InternalRow = null

      new Iterator[InternalRow] {
        private var nextRow: InternalRow = _
        private var ready = false

        private def advance(): Unit = {
          while (!ready && lIter.hasNext) {
            val l = lIter.next()
            val lt = lTimeB.eval(l)
            var lk: InternalRow = null
            var keyIsNull = false
            if (lt != null) {
              val k = lKeyProj(l)
              keyIsNull = lKeysB.indices.exists(k.isNullAt)
              lk = k
            }
            if (lt != null && !keyIsNull && !fwd) {
              // BACKWARD: consume right rows that can never match a
              // future left row: smaller key, null key/time, or same
              // key with time ≤ lt (each such row becomes the new best
              // match).
              var go = true
              while (go && rBuf.hasNext) {
                val r = rBuf.head
                val rt = rTimeB.eval(r)
                val rk = rKeyProj(r)
                val rKeyNull = rKeysB.indices.exists(rk.isNullAt)
                if (rKeyNull || rt == null) {
                  rBuf.next()
                } else {
                  val c = keyOrd.compare(rk, lk)
                  if (c < 0) {
                    rBuf.next()
                  } else if (c == 0 && {
                      val tc = timeOrd.asInstanceOf[Ordering[Any]].compare(rt, lt)
                      if (excl) tc < 0 else tc <= 0
                    }) {
                    lastKey = rk.copy()
                    lastTime = rt
                    lastRow = rBuf.next().copy()
                  } else {
                    go = false
                  }
                }
              }
              val matches = lastRow != null &&
                keyOrd.compare(lastKey, lk) == 0 &&
                tol.forall { t =>
                  // tolerance only defined for long-backed time types
                  lt.asInstanceOf[Long] - lastTime.asInstanceOf[Long] <= t
                }
              if (matches) {
                nextRow = joiner(joined(l, lastRow))
                numMatchedM += 1
                numOut += 1
                ready = true
              } else if (outer) {
                nextRow = joiner(joined(l, nullRight))
                numOut += 1
                ready = true
              }
            } else if (lt != null && !keyIsNull) {
              // FORWARD: consume right rows strictly behind (smaller
              // key, or same key with time < lt — left times ascend, so
              // they can't match later lefts either); the surviving
              // head, if same-keyed, is the smallest time ≥ lt. It is
              // only PEEKED, never consumed: the same right row may be
              // the next-event match of many earlier left rows.
              var go = true
              while (go && rBuf.hasNext) {
                val r = rBuf.head
                val rt = rTimeB.eval(r)
                val rk = rKeyProj(r)
                if (rKeysB.indices.exists(rk.isNullAt) || rt == null) {
                  rBuf.next()
                } else {
                  val c = keyOrd.compare(rk, lk)
                  if (c < 0 || (c == 0 && {
                      val tc = timeOrd.asInstanceOf[Ordering[Any]].compare(rt, lt)
                      if (excl) tc <= 0 else tc < 0
                    })) {
                    rBuf.next()
                  } else {
                    go = false
                  }
                }
              }
              val cand = if (rBuf.hasNext) rBuf.head else null
              val matches = cand != null && {
                val rk = rKeyProj(cand)
                keyOrd.compare(rk, lk) == 0 && {
                  val rt = rTimeB.eval(cand)
                  tol.forall { t =>
                    rt.asInstanceOf[Long] - lt.asInstanceOf[Long] <= t
                  }
                }
              }
              if (matches) {
                nextRow = joiner(joined(l, cand))
                numMatchedM += 1
                numOut += 1
                ready = true
              } else if (outer) {
                nextRow = joiner(joined(l, nullRight))
                numOut += 1
                ready = true
              }
            } else if (outer) {
              nextRow = joiner(joined(l, nullRight))
              numOut += 1
              ready = true
            }
          }
        }

        override def hasNext: Boolean = { advance(); ready }
        override def next(): InternalRow = {
          advance()
          if (!ready) throw new NoSuchElementException("empty iterator")
          ready = false
          nextRow
        }
      }
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
    * order wins).
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
      strict: Boolean = false): DataFrame = {
    val spark = leftDf.sparkSession
    var lPlan = leftDf.queryExecution.analyzed
    var rPlan = rightDf.queryExecution.analyzed
    val dupNames = lPlan.output.map(_.name).toSet
      .intersect(rPlan.output.map(_.name).toSet)
    require(dupNames.isEmpty,
      s"as-of join: rename right-side columns first, duplicates: $dupNames")
    // Self-joins reuse expression IDs across sides; re-alias the right
    // side so attribute binding stays unambiguous (what ResolveReferences
    // does for built-in Join nodes).
    if (lPlan.outputSet.intersect(rPlan.outputSet).nonEmpty) {
      rPlan = Project(rPlan.output.map(a => Alias(a, a.name)()), rPlan)
    }
    def resolve(plan: LogicalPlan, name: String): Attribute = {
      val hits = plan.output.filter(_.name == name)
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
      strict)
    PlanBridge.ofRows(spark, node)
  }
}
