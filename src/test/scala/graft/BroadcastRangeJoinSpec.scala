package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{BroadcastRangeJoinExec, RangeJoinExec}
import graft.plans.RangeJoinOps.rangeJoin

/** Broadcast range join (BroadcastRangeJoinExec): exec-vs-exec
  * equality against the co-partitioned merge exec on randomized keyed
  * intervals (inner/outer, multi-match runs), plan shape (broadcast
  * exchange right, ZERO left-side shuffles or sorts), the
  * stats-threshold auto pick and both hint directions, whole-stage
  * codegen (results equal interpreted, stage recompiles), and the
  * null/empty edge matrix.
  */
class BroadcastRangeJoinSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = GraftSession.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def collectNodes(p: SparkPlan)(
      pred: SparkPlan => Boolean): Seq[SparkPlan] = {
    val out = scala.collection.mutable.ArrayBuffer[SparkPlan]()
    def walk(x: SparkPlan): Unit = {
      if (pred(x)) out += x
      x.children.foreach(walk)
      x match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _ =>
      }
    }
    walk(p)
    out.toSeq
  }

  private def randFrames(seed: Int): (DataFrame, DataFrame) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    // windows of mixed width (incl. empty hi<lo ones) over few keys so
    // match runs are long — the multi-emission path must agree
    val lRows = Seq.fill(300) {
      val lo = rnd.nextInt(200).toLong
      (rnd.nextInt(6).toLong, lo, lo + rnd.nextInt(40) - 5L, rnd.nextLong())
    }.distinct
    val rRows = Seq.fill(300)((rnd.nextInt(6).toLong,
      rnd.nextInt(200).toLong, rnd.nextLong())).distinct
    (lRows.toDF("k", "lo", "hi", "lid").repartition(5),
      rRows.toDF("rk", "t", "rid").repartition(3))
  }

  private def run(l: DataFrame, r: DataFrame, outer: Boolean,
      bcast: Boolean): Set[(Long, Option[Long])] =
    rangeJoin(l, r, Seq("k"), Seq("rk"), "lo", "hi", "t",
      leftOuter = outer, broadcastHint = Some(bcast))
      .select(col("lid"), col("rid")).collect()
      .map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)))).toSet

  test("equality vs merge exec, inner and outer, randomized fixtures") {
    for (seed <- Seq(17, 23, 47); outer <- Seq(false, true)) {
      val (l, r) = randFrames(seed)
      val merge = run(l, r, outer, bcast = false)
      val bc = run(l, r, outer, bcast = true)
      assert(bc === merge, s"mismatch at seed=$seed outer=$outer")
      assert(bc.nonEmpty)
      // pair-level multiplicity must agree too, not just the set
      val mergeN = rangeJoin(l, r, Seq("k"), Seq("rk"), "lo", "hi", "t",
        leftOuter = outer, broadcastHint = Some(false)).count()
      val bcN = rangeJoin(l, r, Seq("k"), Seq("rk"), "lo", "hi", "t",
        leftOuter = outer, broadcastHint = Some(true)).count()
      assert(bcN === mergeN, s"row-count mismatch at seed=$seed outer=$outer")
    }
  }

  test("broadcast plan: right side broadcast, zero left-side exchanges " +
    "or sorts required") {
    val (l, r) = randFrames(29)
    val df = rangeJoin(l, r, Seq("k"), Seq("rk"), "lo", "hi", "t",
      broadcastHint = Some(true))
    df.collect()
    val plan = df.queryExecution.executedPlan
    val execs = collectNodes(plan)(_.isInstanceOf[BroadcastRangeJoinExec])
    assert(execs.length === 1, s"broadcast exec not planned:\n$plan")
    val exec = execs.head.asInstanceOf[BroadcastRangeJoinExec]
    val rightBcast = collectNodes(exec.right)(_.isInstanceOf[
      org.apache.spark.sql.execution.exchange.BroadcastExchangeExec])
    assert(rightBcast.nonEmpty, s"no broadcast exchange on the right:\n$plan")
    assert(exec.requiredChildDistribution.head ==
      org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution)
    assert(exec.requiredChildOrdering.forall(_.isEmpty),
      "broadcast range join must not require child ordering")
    val leftSorts = collectNodes(exec.left)(
      _.isInstanceOf[org.apache.spark.sql.execution.SortExec])
    assert(leftSorts.isEmpty, s"left side sorted:\n$plan")
    val leftShuffles = collectNodes(exec.left)(_.isInstanceOf[
      org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    // the only left shuffle allowed is the fixture's own repartition(5)
    assert(leftShuffles.length <= 1, s"extra left shuffle:\n$plan")
  }

  test("auto pick: tiny right side broadcasts, threshold=-1 pins merge, " +
    "hints override both ways") {
    val (l, r) = randFrames(31)
    def planWith(threshold: String, hint: Option[Boolean]): SparkPlan = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      try {
        val df = rangeJoin(l, r, Seq("k"), Seq("rk"), "lo", "hi", "t",
          broadcastHint = hint)
        df.collect()
        df.queryExecution.executedPlan
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    val auto = planWith("10MB", None)
    assert(collectNodes(auto)(
      _.isInstanceOf[BroadcastRangeJoinExec]).nonEmpty,
      s"tiny right side did not auto-broadcast:\n$auto")
    val off = planWith("-1", None)
    assert(collectNodes(off)(_.isInstanceOf[RangeJoinExec]).nonEmpty,
      s"threshold=-1 did not pin merge:\n$off")
    val forced = planWith("-1", Some(true))
    assert(collectNodes(forced)(
      _.isInstanceOf[BroadcastRangeJoinExec]).nonEmpty,
      s"broadcast hint did not override threshold=-1:\n$forced")
    val pinned = planWith("10MB", Some(false))
    assert(collectNodes(pinned)(_.isInstanceOf[RangeJoinExec]).nonEmpty,
      s"merge hint did not override a tiny right side:\n$pinned")
  }

  test("whole-stage codegen: inner AND outer compile and equal the " +
    "interpreted path") {
    val (l, r) = randFrames(37)
    for (outer <- Seq(false, true)) {
      val m = rangeJoin(l, r, Seq("k"), Seq("rk"), "lo", "hi", "t",
        leftOuter = outer, broadcastHint = Some(true))
      m.collect(): Unit
      CodegenTestUtil.assertStageCompiles(m) {
        case _: BroadcastRangeJoinExec =>
      }
      val on = run(l, r, outer, bcast = true)
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val off = try run(l, r, outer, bcast = true)
        finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
      assert(on === off, s"outer=$outer")
      assert(on.nonEmpty)
    }
  }

  test("null keys/bounds never match; outer null-extends them; " +
    "hi<lo empty; empty right side") {
    import spark.implicits._
    val l = Seq(
      (Some(1L), Some(0L), Some(100L), 1L),   // matches
      (None, Some(0L), Some(100L), 2L),        // null key
      (Some(1L), None, Some(100L), 3L),        // null lo
      (Some(1L), Some(0L), None, 4L),          // null hi
      (Some(1L), Some(50L), Some(40L), 5L))    // hi < lo
      .toDF("k", "lo", "hi", "lid")
    val r = Seq((Some(1L), Some(10L), 7L), (None, Some(10L), 8L),
      (Some(1L), None, 9L)).toDF("rk", "t", "rid")
    val inner = rangeJoin(l, r, Seq("k"), Seq("rk"), "lo", "hi", "t",
      broadcastHint = Some(true))
    assert(inner.select("lid", "rid").as[(Long, Long)].collect().toSeq
      === Seq((1L, 7L)))
    val outer = rangeJoin(l, r, Seq("k"), Seq("rk"), "lo", "hi", "t",
      leftOuter = true, broadcastHint = Some(true))
    assert(outer.count() === 5L)
    assert(outer.where(col("rid").isNull).count() === 4L)

    val rEmpty = r.where(lit(false))
    assert(rangeJoin(l, rEmpty, Seq("k"), Seq("rk"), "lo", "hi", "t",
      broadcastHint = Some(true)).count() === 0L)
    assert(rangeJoin(l, rEmpty, Seq("k"), Seq("rk"), "lo", "hi", "t",
      leftOuter = true, broadcastHint = Some(true))
      .where(col("rid").isNull).count() === 5L)
  }

  test("SQL surface honors broadcast and merge options") {
    val (l, r) = randFrames(41)
    l.createOrReplaceTempView("bcrspec_l")
    r.createOrReplaceTempView("bcrspec_r")
    try {
      def executed(opts: String): String = {
        val df = spark.sql(s"""SELECT * FROM graft_range_join(
          'bcrspec_l', 'bcrspec_r', 'k', 'rk', 'lo', 'hi', 't', '$opts')""")
        df.collect()
        df.queryExecution.executedPlan.toString
      }
      val mergePlan = executed("merge")
      assert(mergePlan.contains("RangeJoin")
        && !mergePlan.contains("BroadcastRangeJoin"), mergePlan)
      assert(executed("broadcast").contains("BroadcastRangeJoin"))
      val e = intercept[Exception](spark.sql(
        """SELECT * FROM graft_range_join('bcrspec_l', 'bcrspec_r',
          'k', 'rk', 'lo', 'hi', 't', 'broadcast,merge')""").collect())
      assert(e.getMessage.contains("mutually exclusive"))
    } finally {
      spark.catalog.dropTempView("bcrspec_l"): Unit
      spark.catalog.dropTempView("bcrspec_r"): Unit
    }
  }
}
