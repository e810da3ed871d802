package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{AsOf, AsOfJoinExec, BroadcastAsOfJoinExec}

/** Broadcast as-of join (BroadcastAsOfJoinExec): exec-vs-exec equality
  * against the sorted-merge exec across the FULL semantics matrix
  * (direction × strict × tolerance × inner/outer) on randomized keyed
  * streams, plan shape (broadcast exchange on the right, ZERO left-side
  * shuffles/sorts), the stats-threshold auto pick, and both force
  * directions of the hint.
  */
class BroadcastAsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = GraftSession.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def collectNodes(p: SparkPlan)(pred: SparkPlan => Boolean): Seq[SparkPlan] = {
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
    // duplicate (k, t) pairs included on purpose: the tie-break path
    // must agree between the two execs
    val lRows = Seq.fill(400)((rnd.nextInt(8).toLong,
      rnd.nextInt(200).toLong, rnd.nextLong())).distinct
    val rRows = Seq.fill(400)((rnd.nextInt(8).toLong,
      rnd.nextInt(200).toLong, rnd.nextLong())).distinct
    (lRows.toDF("k", "t", "lid").repartition(5),
      rRows.toDF("rk", "rt", "rid").repartition(3))
  }

  test("equality vs merge exec across direction × strict × tolerance × outer") {
    val (l, r) = randFrames(17)
    for {
      fwd <- Seq(false, true)
      strict <- Seq(false, true)
      tol <- Seq(None, Some(25L))
      outer <- Seq(false, true)
    } {
      def run(bcast: Boolean): Seq[org.apache.spark.sql.Row] =
        AsOf.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt",
          rightTieBreak = Seq("rid"), toleranceUs = tol,
          leftOuter = outer, forward = fwd, strict = strict,
          broadcast = Some(bcast))
          .orderBy("k", "t", "lid").collect().toSeq
      val merge = run(bcast = false)
      val bcast = run(bcast = true)
      assert(bcast === merge,
        s"mismatch at fwd=$fwd strict=$strict tol=$tol outer=$outer")
    }
  }

  test("broadcast plan: right side broadcast, zero left-side exchanges or sorts") {
    val (l, r) = randFrames(23)
    val df = AsOf.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt",
      rightTieBreak = Seq("rid"), broadcast = Some(true))
    df.collect()
    val plan = df.queryExecution.executedPlan
    val execs = collectNodes(plan)(_.isInstanceOf[BroadcastAsOfJoinExec])
    assert(execs.length === 1, s"broadcast exec not planned:\n$plan")
    val exec = execs.head.asInstanceOf[BroadcastAsOfJoinExec]
    // right child path carries a broadcast exchange
    val rightBcast = collectNodes(exec.right)(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.BroadcastExchangeExec])
    assert(rightBcast.nonEmpty, s"no broadcast exchange on the right:\n$plan")
    // the left (fact) side must plan NO shuffle and NO sort
    val leftShuffles = collectNodes(exec.left)(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    val leftSorts = collectNodes(exec.left)(
      _.isInstanceOf[org.apache.spark.sql.execution.SortExec])
    // the repartition(5) in the fixture is the scan's own, below the join
    // input boundary; assert the join itself required none by checking
    // requiredChildDistribution
    assert(exec.requiredChildDistribution.head ==
      org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution)
    assert(exec.requiredChildOrdering.forall(_.isEmpty),
      "broadcast as-of must not require child ordering")
    assert(leftSorts.isEmpty, s"left side sorted:\n$plan")
    // the only left shuffle allowed is the fixture's own repartition(5)
    assert(leftShuffles.length <= 1, s"extra left shuffle:\n$plan")
  }

  test("auto pick: tiny right side broadcasts, threshold=-1 pins merge") {
    val (l, r) = randFrames(29)
    def planWith(threshold: String): SparkPlan = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      try {
        val df = AsOf.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt",
          rightTieBreak = Seq("rid"))
        df.collect()
        df.queryExecution.executedPlan
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    val auto = planWith("10MB")
    assert(collectNodes(auto)(_.isInstanceOf[BroadcastAsOfJoinExec]).nonEmpty,
      s"tiny right side did not auto-broadcast:\n$auto")
    val off = planWith("-1")
    assert(collectNodes(off)(_.isInstanceOf[AsOfJoinExec]).nonEmpty,
      s"threshold=-1 did not pin merge:\n$off")
  }

  test("force-merge hint overrides a tiny right side") {
    val (l, r) = randFrames(31)
    val df = AsOf.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt",
      rightTieBreak = Seq("rid"), broadcast = Some(false))
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(collectNodes(plan)(_.isInstanceOf[AsOfJoinExec]).nonEmpty,
      s"merge exec not planned under force-merge:\n$plan")
    assert(collectNodes(plan)(_.isInstanceOf[BroadcastAsOfJoinExec]).isEmpty)
  }

  test("date-typed time (int-backed) and multi-column string keys") {
    import spark.implicits._
    val l = Seq(("a", 1L, "2024-03-05", 1L), ("a", 2L, "2024-03-07", 2L),
      ("b", 1L, "2024-03-05", 3L))
      .toDF("g", "k", "d", "lid").withColumn("d", to_date(col("d")))
    val r = Seq(("a", 1L, "2024-03-01", 10L), ("a", 2L, "2024-03-08", 11L),
      ("b", 1L, "2024-03-05", 12L), ("a", 1L, "2024-03-04", 13L))
      .toDF("rg", "rk", "rd", "rid").withColumn("rd", to_date(col("rd")))
    def run(bcast: Boolean) =
      AsOf.asofJoin(l, r, Seq("g", "k"), Seq("rg", "rk"), "d", "rd",
        rightTieBreak = Seq("rid"), leftOuter = true,
        broadcast = Some(bcast))
        .select("lid", "rid").as[(Long, Option[Long])].collect().toSet
    val expect = Set((1L, Some(13L)), (2L, None), (3L, Some(12L)))
    assert(run(bcast = true) === expect)
    assert(run(bcast = false) === expect)
  }

  test("null keys/times never match; outer emits them (broadcast path)") {
    import spark.implicits._
    val l = Seq((Some(1L), Some(100L), 1L), (None, Some(100L), 2L),
      (Some(1L), None, 3L)).toDF("k", "t", "lid")
    val r = Seq((Some(1L), Some(90L), 7L), (None, Some(80L), 8L),
      (Some(1L), None, 9L)).toDF("rk", "rt", "rid")
    val inner = AsOf.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt",
      rightTieBreak = Seq("rid"), broadcast = Some(true))
    assert(inner.select("lid", "rid").as[(Long, Long)].collect().toSeq
      === Seq((1L, 7L)))
    val outer = AsOf.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt",
      rightTieBreak = Seq("rid"), leftOuter = true, broadcast = Some(true))
    assert(outer.count() === 3L)
    assert(outer.where(col("rid").isNull).count() === 2L)
  }

  test("empty right side: inner empty, outer null-extends all") {
    import spark.implicits._
    val l = Seq((1L, 10L, 1L)).toDF("k", "t", "lid")
    val r = Seq((1L, 10L, 1L)).toDF("rk", "rt", "rid").where(col("rt") < 0)
    assert(AsOf.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt",
      broadcast = Some(true)).count() === 0L)
    val outer = AsOf.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt",
      leftOuter = true, broadcast = Some(true))
    assert(outer.count() === 1L)
    assert(outer.where(col("rid").isNotNull).count() === 0L)
  }

  test("whole-stage codegen: the streamed side produces THROUGH the " +
    "broadcast exec (fused stage compiles), results equal codegen-off") {
    import spark.implicits._
    val (l, r) = randFrames(41)
    for ((fwd, outer, tol) <- Seq(
      (false, false, None), (false, true, Some(25L)),
      (true, true, None))) {
      def run(): Set[(Long, Long, Option[Long])] =
        AsOf.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt",
          rightTieBreak = Seq("rid"), toleranceUs = tol,
          leftOuter = outer, forward = fwd, broadcast = Some(true))
          .select(col("t"), col("lid"), col("rid"))
          .as[(Long, Long, Option[Long])].collect().toSet
      val df = AsOf.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt",
        rightTieBreak = Seq("rid"), toleranceUs = tol,
        leftOuter = outer, forward = fwd, broadcast = Some(true))
      df.collect(): Unit
      CodegenTestUtil.assertStageCompiles(df) {
        case _: BroadcastAsOfJoinExec =>
      }
      val on = run()
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val off = try run()
        finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
      assert(on === off, s"fwd=$fwd outer=$outer tol=$tol")
      assert(on.nonEmpty)
    }
  }
}
