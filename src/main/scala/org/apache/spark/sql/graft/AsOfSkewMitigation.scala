package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{CoalescedPartitionSpec, ShufflePartitionSpec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, ShufflePartitionsUtil, ShuffleQueryStageExec}
import org.apache.spark.sql.internal.SQLConf

import graft.plans.{AsOfJoinExec, RangeJoinExec}

/** AQE skew mitigation for the native as-of AND range joins — the
  * automatic form of `AsOf.asofJoinSalted`, with no caller-side API
  * change.
  *
  * Spark's own `OptimizeSkewedJoin` rewrites only SMJ/SHJ, so a hot
  * key (one user with 10⁸ events) funnels one [[AsOfJoinExec]] merge
  * partition with no runtime help. This rule runs in the AQE
  * query-stage optimizer slot (`injectQueryStageOptimizerRule`) where
  * both child shuffle stages are MATERIALIZED and carry
  * MapOutputStatistics, and applies the identical mechanism
  * OptimizeSkewedJoin uses for SMJ:
  *
  *  - a LEFT reducer partition whose size exceeds both
  *    `skewedPartitionFactor × median` and `skewedPartitionThreshold`
  *    is split into mapper-range slices
  *    (`ShufflePartitionsUtil.createSkewPartitionSpecs` →
  *    `PartialReducerPartitionSpec`s, each ≈ the advisory size);
  *  - the RIGHT side's matching partition is DUPLICATED once per
  *    slice (`CoalescedPartitionSpec` repeated), so every slice sees
  *    its keys' FULL right run — which is exactly what makes the
  *    rewrite semantics-invisible for as-of in every mode
  *    (backward/forward/strict/tolerance/outer): each left row matches
  *    independently against the full right run, the salted-variant
  *    argument with mapper-ranges in place of hash salts. Left rows
  *    land in exactly one slice, so no duplicates and no losses.
  *
  * Only the LEFT side is ever split (as-of is asymmetric — the right
  * side cannot be split without breaking "greatest time ≤ t" across
  * slice boundaries); right-side skew is the broadcast exec's job.
  * The SortExec above each read stays in place and re-sorts each
  * sub-partition, satisfying the exec's ordering requirement; the
  * rewritten join sets `isSkewJoin = true`, relaxing its declared
  * distribution the way SortMergeJoinExec does.
  *
  * Bails (returns the plan unchanged) unless: skew-join handling is
  * enabled (`spark.sql.adaptive.skewJoin.enabled`), both children are
  * sorts over materialized shuffle stages (raw, or AQE-coalesced with
  * ALIGNED boundaries — CoalesceShufflePartitions produces one shared
  * boundary list for co-partitioned siblings), some partition is
  * actually skewed, and splitting produced more than one slice.
  */
object AsOfSkewMitigation extends Rule[SparkPlan] {

  /** One join child: its sort and the materialized stage under it —
    * either directly, or under an existing AQE read whose specs are
    * plain coalesced ranges (CoalesceShufflePartitions runs BEFORE
    * injected rules and may have merged the skewed reducer into a
    * wider range; the rewrite discards those specs and rebuilds from
    * RAW reducer boundaries, trading the small-partition coalescing
    * back for the split — only when a split actually happens).
    */
  private final case class Side(
      sort: SortExec,
      stage: ShuffleQueryStageExec) {
    def bounds: Seq[(Int, Int)] = {
      val n = stage.mapStats.get.bytesByPartitionId.length
      (0 until n).map(i => (i, i + 1))
    }
  }

  private def extract(p: SparkPlan): Option[Side] = p match {
    case s @ SortExec(_, _, st: ShuffleQueryStageExec, _)
        if st.mapStats.isDefined =>
      Some(Side(s, st))
    case s @ SortExec(_, _, AQEShuffleReadExec(st: ShuffleQueryStageExec,
        specs), _)
        if st.mapStats.isDefined
          && specs.forall(_.isInstanceOf[CoalescedPartitionSpec]) =>
      Some(Side(s, st))
    case _ => None
  }

  private def sizeOf(side: Side, b: (Int, Int)): Long = {
    val bytes = side.stage.mapStats.get.bytesByPartitionId
    (b._1 until b._2).map(bytes(_)).sum
  }

  override def apply(plan: SparkPlan): SparkPlan = {
    if (!conf.getConf(SQLConf.SKEW_JOIN_ENABLED)) return plan
    plan.transformUp {
      case j: AsOfJoinExec if !j.isSkewJoin =>
        (extract(j.left), extract(j.right)) match {
          case (Some(l), Some(r)) if l.bounds.length == r.bounds.length =>
            rewrite(j, l, r,
              (nl, nr) => j.copy(left = nl, right = nr, isSkewJoin = true))
              .getOrElse(j)
          case _ => j
        }
      case j: RangeJoinExec if !j.isSkewJoin =>
        // identical argument: every left interval row matches
        // independently against its keys' FULL right run, which a
        // duplicated right partition provides to every slice
        (extract(j.left), extract(j.right)) match {
          case (Some(l), Some(r)) if l.bounds.length == r.bounds.length =>
            rewrite(j, l, r,
              (nl, nr) => j.copy(left = nl, right = nr, isSkewJoin = true))
              .getOrElse(j)
          case _ => j
        }
    }
  }

  private def rewrite(j: SparkPlan, l: Side, r: Side,
      mk: (SparkPlan, SparkPlan) => SparkPlan): Option[SparkPlan] = {
    val sizes = l.bounds.map(sizeOf(l, _))
    if (sizes.isEmpty) return None
    val median = {
      val sorted = sizes.sorted
      sorted(sorted.length / 2)
    }
    val factor = conf.getConf(SQLConf.SKEW_JOIN_SKEWED_PARTITION_FACTOR)
    val threshold = conf.getConf(SQLConf.SKEW_JOIN_SKEWED_PARTITION_THRESHOLD)
    val advisory = conf.getConf(SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES)
    // slice target: the advisory size, but never above half the skew
    // threshold — with Spark's defaults (256m threshold / 64m advisory)
    // this IS the advisory, and when a deployment lowers the threshold
    // below the advisory (local-mode benches) a just-over-threshold
    // partition still splits into ≥2 slices instead of one advisory-
    // sized non-split
    val targetSize = math.max(median, math.min(advisory, threshold / 2))
    def isSkewed(size: Long): Boolean =
      size > median * factor && size > threshold

    val leftSpecs = Seq.newBuilder[ShufflePartitionSpec]
    val rightSpecs = Seq.newBuilder[ShufflePartitionSpec]
    var split = false
    // CoalescedPartitionSpec carries its dataSize: AQEShuffleReadExec's
    // driver metrics assert it is defined whenever skew specs are mixed
    // in (partitionDataSizes)
    l.bounds.zip(r.bounds).zip(sizes).foreach {
      case (((ls, le), (rs, re)), size) =>
        val slices: Seq[ShufflePartitionSpec] =
          if (isSkewed(size) && le == ls + 1) {
            ShufflePartitionsUtil.createSkewPartitionSpecs(
              l.stage.mapStats.get.shuffleId, ls, targetSize)
              .map(_.toSeq)
              .getOrElse(Seq(CoalescedPartitionSpec(ls, le, size)))
          } else Seq(CoalescedPartitionSpec(ls, le, size))
        if (slices.length > 1) split = true
        leftSpecs ++= slices
        rightSpecs ++= Seq.fill(slices.length)(
          CoalescedPartitionSpec(rs, re, sizeOf(r, (rs, re)))
            : ShufflePartitionSpec)
    }
    if (!split) None
    else {
      logInfo(s"graft as-of skew mitigation: split " +
        s"${sizes.count(isSkewed)} skewed left partition(s)")
      val newLeft = l.sort.copy(child =
        AQEShuffleReadExec(l.stage, leftSpecs.result()))
      val newRight = r.sort.copy(child =
        AQEShuffleReadExec(r.stage, rightSpecs.result()))
      Some(mk(newLeft, newRight))
    }
  }
}
