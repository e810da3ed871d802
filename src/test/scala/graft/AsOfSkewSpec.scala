package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** AQE skew mitigation for the native as-of and range joins
  * (org.apache.spark.sql.graft.AsOfSkewMitigation): with a hot key and
  * a low skew threshold, the merge exec's plan must be rewritten to
  * the split-left / duplicate-right form (visible as `skew=true` in
  * the final adaptive plan) with IDENTICAL results to the unmitigated
  * forms — and with the rule disabled the plan must stay unrewritten.
  */
class AsOfSkewSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = GraftSession.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val Rows = 400000

  // 98% of left rows on key 0 (BenchAsOf's skew shape)
  private def skewedSides(): (DataFrame, DataFrame) = {
    val l = spark.range(Rows.toLong)
      .select(when(col("id") % 50 < 49, lit(0L))
          .otherwise(col("id") % 512).as("k"),
        (col("id") * 7 % 1000003).as("t"), col("id").as("lid"))
    val r = spark.range((Rows / 16).toLong)
      .select(when(col("id") % 50 < 49, lit(0L))
          .otherwise(col("id") % 512).as("rk"),
        (col("id") * 11 % 1000003).as("rt"), col("id").as("rid"))
    (l, r)
  }

  private def withSkewConf[T](f: => T): T = {
    // size the trigger to this tiny fixture: hot partition ~a few MB
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "200k")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "100k")
    try f finally {
      spark.conf.unset(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    }
  }

  /** Execute the projected join and return (sorted rows, FINAL
    * adaptive plan string) — the plan must be read off the DataFrame
    * that actually ran, or AQE shows isFinalPlan=false.
    */
  private def runAndPlan(df: DataFrame): (Seq[(Long, Long)], String) = {
    val proj = df.select(col("lid"),
      coalesce(col("rid"), lit(-1L)).as("rid"))
    val rows = proj.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    (rows, proj.queryExecution.executedPlan.toString)
  }

  test("as-of merge under a hot key: plan rewritten to skew=true, " +
    "results equal broadcast; disabled => no rewrite") {
    val (l, r) = skewedSides()
    def merged() = graft.plans.AsOf.asofJoin(l, r, Seq("k"), Seq("rk"),
      "t", "rt", rightTieBreak = Seq("rid"), leftOuter = true,
      broadcast = Some(false))
    withSkewConf {
      val m0 = merged()
      val (got, plan) = runAndPlan(m0)
      assert(plan.contains("skew=true"),
        s"as-of skew mitigation did not fire:\n$plan")
      assert(plan.contains("AQEShuffleRead"),
        s"expected AQE read specs in the final plan:\n$plan")
      // the rewritten "(skew=true)" nodeName must not leak into
      // generated identifiers (the Janino-fallback regression class)
      m0.collect(): Unit
      CodegenTestUtil.assertStageCompiles(m0) {
        case _: graft.plans.AsOfJoinExec =>
      }
      val (want, _) = runAndPlan(graft.plans.AsOf.asofJoin(l, r,
        Seq("k"), Seq("rk"), "t", "rt", rightTieBreak = Seq("rid"),
        leftOuter = true, broadcast = Some(true)))
      assert(got === want)
      assert(got.nonEmpty)
    }
    // rule respects the skew-join kill switch
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try {
      val (_, plan2) = withSkewConf(runAndPlan(merged()))
      assert(!plan2.contains("skew=true"))
    } finally spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
  }

  test("as-of skew rewrite holds across the mode matrix " +
    "(forward/strict/tolerance/inner)") {
    val (l, r) = skewedSides()
    withSkewConf {
      for ((fwd, strict, tol, outer) <- Seq(
        (true, false, None, true),
        (false, true, None, false),
        (false, false, Some(500000L), true))) {
        val (got, plan) = runAndPlan(graft.plans.AsOf.asofJoin(l, r,
          Seq("k"), Seq("rk"), "t", "rt", rightTieBreak = Seq("rid"),
          toleranceUs = tol, leftOuter = outer, forward = fwd,
          strict = strict, broadcast = Some(false)))
        assert(plan.contains("skew=true"),
          s"no rewrite for fwd=$fwd strict=$strict tol=$tol:\n$plan")
        val (want, _) = runAndPlan(graft.plans.AsOf.asofJoin(l, r,
          Seq("k"), Seq("rk"), "t", "rt", rightTieBreak = Seq("rid"),
          toleranceUs = tol, leftOuter = outer, forward = fwd,
          strict = strict, broadcast = Some(true)))
        assert(got === want, s"fwd=$fwd strict=$strict tol=$tol")
      }
    }
  }

  test("range join under a hot key: plan rewritten to skew=true, " +
    "results equal the theta-join") {
    val (l0, r0) = skewedSides()
    val l = l0.select(col("k"), col("t").as("lo"),
      (col("t") + 2000L).as("hi"), col("lid"))
    val r = r0.select(col("rk"), col("rt"), col("rid"))
    withSkewConf {
      // merge pinned: this test exercises the AQE skew rewrite, which
      // exists for the co-partitioned exec (the tiny fixture would
      // auto-broadcast since the round-14 strategy pick)
      val m = graft.plans.RangeJoinOps.rangeJoin(l, r,
        Seq("k"), Seq("rk"), "lo", "hi", "rt",
        broadcastHint = Some(false))
        .select(col("lid"), col("rid"))
      val got = m.collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(m.queryExecution.executedPlan.toString.contains("skew=true"),
        s"range-join skew mitigation did not fire:\n" +
          m.queryExecution.executedPlan.toString)
      val want = l.join(r, col("k") === col("rk")
          && col("rt") >= col("lo") && col("rt") <= col("hi"))
        .select(col("lid"), col("rid")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got === want)
      assert(got.nonEmpty)
    }
  }
}
