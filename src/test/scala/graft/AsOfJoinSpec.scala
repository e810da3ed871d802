package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{AsOf, AsOfJoinExec}

/** Native as-of join (AsOfJoinExec): equivalence against the
  * independent union+window formulation (q25), plan shape (custom exec
  * planned, co-partitioned, no cartesian/broadcast-nested-loop), outer
  * and tolerance semantics, tie-break determinism, and null handling.
  */
class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = GraftSession.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  private val sf = "/root/testdata/sf0.001"

  private def ev: DataFrame = Fixtures.table(spark, sf, "events")

  /** AsOf.asofJoin pinned to the MERGE exec — this suite tests the
    * sorted-merge path specifically; the tiny fixtures would otherwise
    * auto-broadcast (BroadcastAsOfJoinSpec covers that exec).
    */
  private def asofM(
      leftDf: DataFrame, rightDf: DataFrame,
      leftKeyCols: Seq[String], rightKeyCols: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      rightTieBreak: Seq[String] = Nil,
      toleranceUs: Option[Long] = None,
      leftOuter: Boolean = false,
      forward: Boolean = false,
      strict: Boolean = false): DataFrame =
    AsOf.asofJoin(leftDf, rightDf, leftKeyCols, rightKeyCols, leftTimeCol,
      rightTimeCol, rightTieBreak, toleranceUs, leftOuter, forward, strict,
      broadcast = Some(false))

  private def nativeAsOf(outer: Boolean, tolUs: Option[Long] = None): DataFrame = {
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
        col("event_id").as("c_event_id"))
    asofM(purchases, clicks,
      Seq("user_id"), Seq("c_user_id"), "ts", "click_ts",
      rightTieBreak = Seq("c_event_id"), toleranceUs = tolUs,
      leftOuter = outer)
  }

  test("inner as-of equals the q25 union+window formulation") {
    val native = nativeAsOf(outer = false)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts"), col("click_ts").as("last_click_ts"))
    val q25 = SparkEntry.queries("q25_asof_join")(spark, sf)
    assert(native.count() === q25.count())
    assert(native.exceptAll(q25).count() === 0L)
    assert(q25.exceptAll(native).count() === 0L)
  }

  test("plan uses AsOfJoinExec with co-partitioned children, no cartesian") {
    val df = nativeAsOf(outer = false)
    df.collect() // materialize the AQE-final plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinExec") || plan.contains("AsOfJoin"),
      s"native exec not planned:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("left-outer null-extends unmatched purchases") {
    val inner = nativeAsOf(outer = false)
    val outer = nativeAsOf(outer = true)
    val purchases = ev.where(col("event_type") === "purchase")
    assert(outer.count() === purchases.count())
    val unmatched = outer.where(col("click_ts").isNull).count()
    assert(unmatched === purchases.count() - inner.count())
  }

  test("tolerance drops matches older than the window") {
    val all = nativeAsOf(outer = false)
    val hour = 3600L * 1000000L
    val tol = nativeAsOf(outer = false, tolUs = Some(hour))
    val expected = all.where(
      expr("timestampdiff(MICROSECOND, click_ts, ts)") <= hour).count()
    assert(tol.count() === expected)
    assert(tol.count() < all.count()) // the window actually bites
  }

  test("ties on (key, time) resolve to the greatest tie-break value") {
    import spark.implicits._
    val l = Seq((1L, 100L, 10L)).toDF("k", "t", "lid")
    val r = Seq((1L, 100L, 1L), (1L, 100L, 2L), (1L, 50L, 3L))
      .toDF("rk", "rt", "rid")
    val out = asofM(l, r, Seq("k"), Seq("rk"), "t", "rt",
      rightTieBreak = Seq("rid")).select("rid").as[Long].collect()
    assert(out.toSeq === Seq(2L))
  }

  test("null keys and null times never match; outer still emits them") {
    import spark.implicits._
    val l = Seq((Some(1L), Some(100L), 1L), (None, Some(100L), 2L),
      (Some(1L), None, 3L)).toDF("k", "t", "lid")
    val r = Seq((Some(1L), Some(90L), 7L), (None, Some(80L), 8L),
      (Some(1L), None, 9L)).toDF("rk", "rt", "rid")
    val inner = asofM(l, r, Seq("k"), Seq("rk"), "t", "rt",
      rightTieBreak = Seq("rid"))
    assert(inner.select("lid", "rid").as[(Long, Long)].collect().toSeq
      === Seq((1L, 7L)))
    val outer = asofM(l, r, Seq("k"), Seq("rk"), "t", "rt",
      rightTieBreak = Seq("rid"), leftOuter = true)
    assert(outer.count() === 3L)
    assert(outer.where(col("rid").isNull).count() === 2L)
  }

  test("left-only filters written ABOVE the join push into the left scan") {
    val purchases = ev.select(col("user_id"), col("ts"), col("event_id"),
      col("value"))
    val clicks = ev.select(col("user_id").as("c_user_id"),
      col("ts").as("click_ts"), col("event_id").as("c_event_id"))
    val df = asofM(purchases, clicks,
      Seq("user_id"), Seq("c_user_id"), "ts", "click_ts",
      rightTieBreak = Seq("c_event_id"))
      .where(col("value") > 900.0) // left-side filter above the node
    df.collect()
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val leftScan = scans.find(_.contains("value"))
    assert(leftScan.exists(_.contains("GreaterThan(value,900.0)")),
      s"left filter not pushed to scan:\n${scans.mkString("\n\n")}")
    // equivalent to filtering before the join
    val pre = asofM(
      purchases.where(col("value") > 900.0), clicks,
      Seq("user_id"), Seq("c_user_id"), "ts", "click_ts",
      rightTieBreak = Seq("c_event_id"))
    assert(df.count() === pre.count())
    assert(df.exceptAll(pre).count() === 0L)
  }

  test("right-side filters above the join do NOT push (they would change the match)") {
    import spark.implicits._
    // k=1 at t=100 matches rt=90; a filter rt<90 ABOVE the join drops
    // the row, while (wrongly) pushing it below would re-expose rt=50.
    val l = Seq((1L, 100L, 1L)).toDF("k", "t", "lid")
    val r = Seq((1L, 50L, 10L), (1L, 90L, 11L)).toDF("rk", "rt", "rid")
    def join() = asofM(l, r, Seq("k"), Seq("rk"),
      "t", "rt", rightTieBreak = Seq("rid"))
    val above = join().where(col("rt") < 90L)
    assert(above.count() === 0L,
      "right-side filter was pushed below the as-of join")
    val pushedWrong = asofM(l, r.where(col("rt") < 90L),
      Seq("k"), Seq("rk"), "t", "rt", rightTieBreak = Seq("rid"))
    assert(pushedWrong.count() === 1L) // the semantics genuinely differ
  }

  test("narrow select above the join prunes unused right columns from the scan") {
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val wideClicks = ev.where(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
        col("event_id").as("c_event_id"), col("value").as("c_value"),
        col("props").as("c_props"))
    val df = asofM(purchases, wideClicks,
      Seq("user_id"), Seq("c_user_id"), "ts", "click_ts",
      rightTieBreak = Seq("c_event_id"))
      .select(col("event_id"), col("click_ts")) // c_value/c_props unused
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("c_value") && !plan.contains("props"),
      s"unused right columns not pruned:\n$plan")
  }

  test("forward direction: ties resolve to smallest tie-break; peek does not consume") {
    import spark.implicits._
    // two lefts before the same right row: both must match it (peek,
    // not consume); equal-time right ties resolve to the FIRST rid.
    val l = Seq((1L, 10L, 100L), (1L, 20L, 101L)).toDF("k", "t", "lid")
    val r = Seq((1L, 30L, 1L), (1L, 30L, 2L), (1L, 5L, 3L))
      .toDF("rk", "rt", "rid")
    val out = asofM(l, r, Seq("k"), Seq("rk"), "t", "rt",
      rightTieBreak = Seq("rid"), forward = true)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(out === Set((100L, 1L), (101L, 1L)))
  }

  test("forward brute-force equivalence on a random keyed stream") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val lRows = Seq.fill(300)((rnd.nextInt(8).toLong,
      rnd.nextInt(1000).toLong, rnd.nextLong())).distinct
    val rRows = Seq.fill(300)((rnd.nextInt(8).toLong,
      rnd.nextInt(1000).toLong, rnd.nextLong())).distinct
    val l = lRows.toDF("k", "t", "lid").repartition(5)
    val r = rRows.toDF("rk", "rt", "rid").repartition(3)
    val native = asofM(l, r, Seq("k"), Seq("rk"), "t", "rt",
      rightTieBreak = Seq("rid"), leftOuter = true, forward = true)
      .select(col("k"), col("t"), col("lid"), col("rid"))
    val byKey = rRows.groupBy(_._1)
    val expect = lRows.map { case (k, t, lid) =>
      val m = byKey.getOrElse(k, Seq.empty).filter(_._2 >= t)
      val best = if (m.isEmpty) None
        else Some(m.minBy(x => (x._2, x._3))._3)
      (k, t, lid, best)
    }.toSet
    val got = native.as[(Long, Long, Long, Option[Long])].collect().toSet
    assert(got === expect)
  }

  test("composed as-ofs reuse the left layout: 3 base exchanges, no mid re-sort") {
    val df = SparkEntry.queries("q516_asof_bracketing")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    def countNodes(p: org.apache.spark.sql.execution.SparkPlan,
        pred: org.apache.spark.sql.execution.SparkPlan => Boolean): Int = {
      var n = 0
      def walk(x: org.apache.spark.sql.execution.SparkPlan): Unit = {
        if (pred(x)) n += 1
        x.children.foreach(walk)
        x match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan)
          case _ =>
        }
      }
      walk(p)
      n
    }
    val asofs = countNodes(plan, _.isInstanceOf[graft.plans.AsOfJoinExec])
    assert(asofs === 2, s"expected 2 AsOfJoinExec nodes:\n$plan")
    // The layout-reuse invariant itself (not node counts, which are
    // brittle to AQE/version changes): the OUTER as-of join — the one
    // whose left subtree contains the inner as-of — must plan NO
    // shuffle and NO sort between itself and the inner join, because
    // AsOfJoinExec advertises its left child's partitioning/ordering.
    def findOuter(p: org.apache.spark.sql.execution.SparkPlan)
        : Option[graft.plans.AsOfJoinExec] = {
      var found: Option[graft.plans.AsOfJoinExec] = None
      def walk(x: org.apache.spark.sql.execution.SparkPlan): Unit = {
        x match {
          case a: graft.plans.AsOfJoinExec if found.isEmpty &&
              countNodes(a.left, _.isInstanceOf[graft.plans.AsOfJoinExec]) > 0 =>
            found = Some(a)
          case _ =>
        }
        x.children.foreach(walk)
        x match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan)
          case _ =>
        }
      }
      walk(p)
      found
    }
    val outer = findOuter(plan)
    assert(outer.isDefined, s"no composed as-of found:\n$plan")
    // walk the outer join's left spine down to the inner as-of join
    var spine: org.apache.spark.sql.execution.SparkPlan = outer.get.left
    var hops = 0
    while (!spine.isInstanceOf[graft.plans.AsOfJoinExec] && hops < 50) {
      assert(!spine.isInstanceOf[
          org.apache.spark.sql.execution.exchange.ShuffleExchangeExec],
        s"outer as-of re-shuffled its left side:\n$plan")
      assert(!spine.isInstanceOf[org.apache.spark.sql.execution.SortExec],
        s"outer as-of re-sorted its left side:\n$plan")
      spine = spine match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q.plan
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case other =>
          assert(other.children.length == 1,
            s"unexpected branch on the left spine: ${other.nodeName}\n$plan")
          other.children.head
      }
      hops += 1
    }
    assert(spine.isInstanceOf[graft.plans.AsOfJoinExec],
      s"inner as-of not reachable on the left spine:\n$plan")
  }

  test("forward tolerance: match further than the window is dropped") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L), (2L, 10L, 200L)).toDF("k", "t", "lid")
    val r = Seq((1L, 15L, 1L), (2L, 50L, 2L)).toDF("rk", "rt", "rid")
    val out = asofM(l, r, Seq("k"), Seq("rk"), "t", "rt",
      rightTieBreak = Seq("rid"), toleranceUs = Some(10L),
      leftOuter = true, forward = true)
      .select("lid", "rid").as[(Long, Option[Long])].collect().toSet
    assert(out === Set((100L, Some(1L)), (200L, None)))
  }

  test("strict mode excludes exact-time matches in both directions") {
    import spark.implicits._
    val l = Seq((1L, 100L, 1L)).toDF("k", "t", "lid")
    val r = Seq((1L, 100L, 10L), (1L, 90L, 11L), (1L, 110L, 12L))
      .toDF("rk", "rt", "rid")
    def run(fwd: Boolean, strict: Boolean) =
      asofM(l, r, Seq("k"), Seq("rk"), "t", "rt",
        rightTieBreak = Seq("rid"), forward = fwd, strict = strict)
        .select("rid").as[Long].collect().toSeq
    assert(run(fwd = false, strict = false) === Seq(10L)) // inclusive: 100
    assert(run(fwd = false, strict = true) === Seq(11L))  // strict: 90
    assert(run(fwd = true, strict = false) === Seq(10L))  // inclusive: 100
    assert(run(fwd = true, strict = true) === Seq(12L))   // strict: 110
  }

  test("multi-column and string keys; empty right side") {
    import spark.implicits._
    val l = Seq(("a", 1L, 100L, 1L), ("a", 2L, 100L, 2L),
      ("b", 1L, 100L, 3L)).toDF("g", "k", "t", "lid")
    val r = Seq(("a", 1L, 90L, 10L), ("a", 2L, 80L, 11L),
      ("b", 1L, 95L, 12L), ("a", 1L, 99L, 13L))
      .toDF("rg", "rk", "rt", "rid")
    val out = asofM(l, r, Seq("g", "k"), Seq("rg", "rk"),
      "t", "rt", rightTieBreak = Seq("rid"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 13L), (2L, 11L), (3L, 12L)))
    // empty right: inner → empty, outer → all-left null-extended
    val empty = r.where(col("rt") < 0L)
    assert(asofM(l, empty, Seq("g", "k"), Seq("rg", "rk"),
      "t", "rt").count() === 0L)
    val outer = asofM(l, empty, Seq("g", "k"), Seq("rg", "rk"),
      "t", "rt", leftOuter = true)
    assert(outer.count() === 3L)
    assert(outer.where(col("rid").isNotNull).count() === 0L)
  }

  test("salted as-of equals unsalted across the mode matrix on a skewed stream") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    // hot key 0 carries ~70% of rows on both sides
    def gen(n: Int) = Seq.fill(n)((
      if (rnd.nextInt(10) < 7) 0L else rnd.nextInt(6).toLong,
      rnd.nextInt(500).toLong, rnd.nextLong())).distinct
    val l = gen(500).toDF("k", "t", "lid").repartition(5)
    val r = gen(500).toDF("rk", "rt", "rid").repartition(3)
    for {
      fwd <- Seq(false, true)
      strict <- Seq(false, true)
      outer <- Seq(false, true)
      tol <- Seq(None, Some(60L))
    } {
      val plain = asofM(l, r, Seq("k"), Seq("rk"), "t", "rt",
        rightTieBreak = Seq("rid"), toleranceUs = tol, leftOuter = outer,
        forward = fwd, strict = strict)
        .orderBy("k", "t", "lid").collect().toSeq
      val salted = AsOf.asofJoinSalted(l, r, Seq("k"), Seq("rk"), "t", "rt",
        rightTieBreak = Seq("rid"), toleranceUs = tol, leftOuter = outer,
        forward = fwd, strict = strict, salts = 7)
        .orderBy("k", "t", "lid").collect().toSeq
      assert(salted === plain,
        s"salted mismatch at fwd=$fwd strict=$strict outer=$outer tol=$tol")
    }
  }

  test("brute-force equivalence on a random keyed stream") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val lRows = Seq.fill(300)((rnd.nextInt(8).toLong,
      rnd.nextInt(1000).toLong, rnd.nextLong())).distinct
    val rRows = Seq.fill(300)((rnd.nextInt(8).toLong,
      rnd.nextInt(1000).toLong, rnd.nextLong())).distinct
    val l = lRows.toDF("k", "t", "lid").repartition(5)
    val r = rRows.toDF("rk", "rt", "rid").repartition(3)
    val native = asofM(l, r, Seq("k"), Seq("rk"), "t", "rt",
      rightTieBreak = Seq("rid"), leftOuter = true)
      .select(col("k"), col("t"), col("lid"), col("rid"))
    // driver-side oracle
    val byKey = rRows.groupBy(_._1)
    val expect = lRows.map { case (k, t, lid) =>
      val m = byKey.getOrElse(k, Seq.empty).filter(_._2 <= t)
      val best = if (m.isEmpty) None
        else Some(m.maxBy(x => (x._2, x._3))._3)
      (k, t, lid, best)
    }.toSet
    val got = native.as[(Long, Long, Long, Option[Long])].collect().toSet
    assert(got === expect)
  }

  test("whole-stage codegen: merge exec fuses into a compiling stage " +
    "across the mode matrix, results equal the interpreted path") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val l = Seq.fill(400)((rnd.nextInt(8).toLong,
      rnd.nextInt(1000).toLong, rnd.nextLong()))
      .distinct.toDF("k", "t", "lid").repartition(5)
    val r = Seq.fill(400)((rnd.nextInt(8).toLong,
      rnd.nextInt(1000).toLong, rnd.nextLong()))
      .distinct.toDF("rk", "rt", "rid").repartition(3)
    // backward = the fast single-long-key machine, forward = the
    // generic one; outer exercises the nullable null-extension
    // accessors inside generated code
    for ((fwd, outer, tol) <- Seq(
      (false, false, None), (false, true, Some(100L)),
      (true, true, None))) {
      def run(): Set[(Long, Long, Option[Long])] =
        asofM(l, r, Seq("k"), Seq("rk"), "t", "rt",
          rightTieBreak = Seq("rid"), toleranceUs = tol,
          leftOuter = outer, forward = fwd)
          .select(col("t"), col("lid"), col("rid"))
          .as[(Long, Long, Option[Long])].collect().toSet
      val df = asofM(l, r, Seq("k"), Seq("rk"), "t", "rt",
        rightTieBreak = Seq("rid"), toleranceUs = tol,
        leftOuter = outer, forward = fwd)
      df.collect(): Unit
      CodegenTestUtil.assertStageCompiles(df) {
        case _: AsOfJoinExec =>
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
