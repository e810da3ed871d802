package graft

import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide physical-plan lint: executes every registered query
  * ONCE at sf0.01 and walks its AQE-final plan, failing on the shapes
  * that are scale-killers at 100 TB no matter how fast they run on a
  * fixture —
  *
  *  - `CartesianProduct`: an unbroadcast all-pairs join; corpus² work.
  *    Allowed only for q21, the DECLARED exact all-pairs baseline whose
  *    scale paths (q23 LSH, q34/q78 IVF, q57 sparse) sit beside it.
  *  - `BroadcastNestedLoopJoin` with a large build side: fine when the
  *    broadcast side is a 1-row scalar aggregate or a bounded query
  *    set/codebook, quadratic when something unbounded slips in. The
  *    lint reads the build side's ACTUAL broadcast row count from the
  *    executed exchange's metrics, so the threshold tracks runtime
  *    reality, not a static estimate.
  *
  * PLANS.md shows the same plans for human review; this spec is the
  * gate that keeps a refactor from silently reintroducing either shape.
  */
class PlanLintSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = GraftSession.builder("8").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  /** Queries whose contract is explicitly all-pairs. */
  private val cartesianAllowed = Set("q21_embedding_neardup")

  /** Scalar aggregates broadcast 1 row; query sets ≤8; codebooks =
    * |cells|; date/user spines ≤ a few hundred at any SF because they
    * are bounded by the calendar / the declared query set, not the
    * corpus. Anything past this is a corpus-sized relation in a
    * nested-loop join — a bug. */
  private val MaxNestedLoopBuildRows = 1000L

  /** Full-tree walk that descends through the AQE wrappers `collect`
    * cannot see past (QueryStageExec and ReusedExchangeExec are leaf
    * nodes whose payload hangs off a field, not `children`). */
  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => p.children
    }
    p +: kids.flatMap(walk)
  }

  /** Rows flowing INTO a window exec, from runtime metrics. WindowExec
    * itself carries no row metric (only spillSize in Spark 4), so read
    * the nearest descendant that does: the single-partition exchange
    * below it ("shuffleRecordsWritten") or the first operator with
    * "numOutputRows" (a join/scan child when no exchange intervenes,
    * e.g. chained global windows). Windows are 1:1, so input rows =
    * the serialized work the gate bounds.
    */
  private def windowInputRows(w: SparkPlan): Long =
    walk(w).drop(1).iterator.flatMap { n =>
      n.metrics.get("numOutputRows").orElse(
        n.metrics.get("shuffleRecordsWritten")).map(_.value)
    }.nextOption().getOrElse(0L)

  // (The cartesian/BNLJ gate runs inside the single consolidated sweep
  // below — one execution of the registry serves all three lints.)

  /** A tiny aggregate (decile curves, survival tables, monthly series)
    * may legitimately collapse to one partition; a corpus-sized input
    * must not. The round-8 gate ran at sf0.001, where tables that are
    * corpus-PROPORTIONAL but key-compressed (sessions, distinct
    * doubles, converters) are only a few hundred rows and slipped
    * under the threshold (the round-8 q129/q114 blind spot). Running
    * the volume gate at sf0.01 keeps bounded tables bounded (they do
    * not grow with SF) while every corpus-proportional table crosses
    * 2000 rows by an order of magnitude — reverting any RangeNtile
    * migration back to an unpartitioned window now turns this test
    * red. */
  private val MaxSinglePartitionRows = 2000L
  private val sfVolume = "/root/testdata/sf0.01"

  /** Global-window allowlist: queries whose UNPARTITIONED window may
    * legitimately process more than [[MaxSinglePartitionRows]] rows,
    * with the reason recorded here (none today — every global window
    * in the registry runs over a provably bounded frame: calendar
    * spines, |sources|-row aggregates, constant grids). The logs
    * stream `WindowExec: No Partition Defined` warnings for all of
    * them; this gate is what keeps a future CORPUS-sized global
    * sort-window from hiding in that noise. */
  private val globalWindowAllowed = Map.empty[String, String]

  test("registry sweep at sf0.01: every query returns rows; no " +
    "cartesian product, corpus-sized nested-loop broadcast, or " +
    s">$MaxSinglePartitionRows-row single-partition shuffle") {
    // ONE execution of the registry serves all three gates (the suite
    // previously ran three full sweeps — cartesian at sf0.001, volume
    // at sf0.01, rows>0 in RelationalSpec — for no added coverage):
    //  - rows > 0: the smoke check formerly in RelationalSpec;
    //  - cartesian/BNLJ: corpus² shapes, judged by the ACTUAL broadcast
    //    row count from the executed exchange's metrics (at sf0.01 a
    //    corpus-sized build side is 10x more visible than at the old
    //    sf0.001 gate, while declared-bounded build sides — scalar
    //    aggregates, ≤8-row query sets, codebooks, calendar spines —
    //    do not grow with SF at all);
    //  - single-partition shuffle volume: the round-8 migration class
    //    (Window.orderBy with no partition key plans a numPartitions=1
    //    exchange below the WindowExec) — the runtime metric, not a
    //    static estimate, decides.
    // The sweep submits queries from a bounded pool (6 threads, one
    // shared session — Spark schedules concurrent jobs FIFO and
    // PlanCache.getOrBuild is synchronized), because a 500-query
    // serial sweep dominated the suite's wall time (~7.7 of 12.6 min
    // in round 12); the assertions are per-query and order-free.
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = Executors.newFixedThreadPool(6)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    def lintOne(q: QueryDef): Seq[String] = {
      val df = q.fn(spark, sfVolume)
      val n = df.queryExecution.toRdd.count() // materialize → AQE-final
      val nodes = walk(df.queryExecution.executedPlan)
      val empty = if (n > 0) Seq.empty
        else Seq(s"${q.name}: returned 0 rows at sf0.01")
      val cart =
        if (cartesianAllowed(q.name)) Seq.empty
        else nodes.collect { case c: CartesianProductExec =>
          s"${q.name}: CartesianProduct in final plan"
        }
      val bigBnlj =
        if (cartesianAllowed(q.name)) Seq.empty
        else nodes.collect {
          case b: BroadcastNestedLoopJoinExec => b
        }.flatMap { b =>
          val build = b.buildSide match {
            case BuildLeft => b.left
            case BuildRight => b.right
          }
          val rows = walk(build).collectFirst {
            case e: BroadcastExchangeExec =>
              e.metrics("numOutputRows").value
          }
          if (rows.exists(_ <= MaxNestedLoopBuildRows)) None
          else Some(s"${q.name}: BroadcastNestedLoopJoin build side " +
            s"broadcast ${rows.getOrElse("?")} rows " +
            s"(limit $MaxNestedLoopBuildRows)")
        }
      val volume = nodes.collect {
        case e: ShuffleExchangeExec
            if e.outputPartitioning.numPartitions == 1 =>
          e.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
      }.filter(_ > MaxSinglePartitionRows).map { rows =>
        s"${q.name}: single-partition shuffle carries $rows rows " +
          s"(limit $MaxSinglePartitionRows)"
      }
      // Global-window gate: an UNPARTITIONED WindowExec serializes its
      // whole input through one task. Every registry instance runs over
      // a bounded frame (spines, per-source aggregates, constant
      // grids) — this asserts it from the runtime row count, so a
      // corpus-sized global window fails here instead of hiding among
      // the `No Partition Defined` warnings. Complements the
      // single-partition SHUFFLE gate above: a window fed by an
      // already-single-partition child (chained global windows, AQE
      // 1-partition coalesce) has no exchange of its own to trip that
      // lint, but its own numOutputRows (= input rows, windows are
      // 1:1) still counts here.
      val globalWin =
        if (globalWindowAllowed.contains(q.name)) Seq.empty
        else nodes.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => windowInputRows(w)
        }.filter(_ > MaxSinglePartitionRows).map { rows =>
          s"${q.name}: UNPARTITIONED window processed $rows rows " +
            s"(limit $MaxSinglePartitionRows); partition it, migrate " +
            "to the Range* rewrite, or allowlist with a reason"
        }
      empty ++ cart ++ bigBnlj ++ volume ++ globalWin
    }
    val failures =
      try Await.result(
        Future.sequence(SparkEntry.registry.map(q => Future(lintOne(q)))),
        Duration.Inf).flatten
      finally pool.shutdown()
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("the global-window detector fires on a corpus-sized " +
    "unpartitioned window (negative control)") {
    // a lint that never fails is untested: build the exact shape the
    // gate exists for and assert the detection logic sees it
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    val df = spark.range(5000).toDF("id")
      .withColumn("rn", row_number().over(
        Window.orderBy(org.apache.spark.sql.functions.col("id"))))
    df.queryExecution.toRdd.count(): Unit
    val hits = walk(df.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => windowInputRows(w)
    }.filter(_ > MaxSinglePartitionRows)
    assert(hits.nonEmpty,
      "global-window detector failed to flag a 5000-row " +
        "unpartitioned window — the registry gate above is blind")
  }

  test("PlanCache cap covers 2x the committed subplan key inventory") {
    // A bench run touches two fixture dirs (warm + target), so the cap
    // must be >= 2x the per-dir key inventory or live entries are
    // evicted mid-run and silently rebuilt (the round-4 q44/q45
    // regression). The inventory asserted here is the COMMITTED
    // constant PlanCache.KnownKeyNames — not whatever happens to be in
    // the cache — so this test is meaningful even when run in
    // isolation, before any registry query has populated the cache.
    val known = graft.ops.PlanCache.KnownKeyNames
    assert(graft.ops.PlanCache.cap >= 2 * known.size,
      s"PlanCache.cap=${graft.ops.PlanCache.cap} but the committed key " +
        s"inventory has ${known.size} entries; raise the cap past " +
        s"${2 * known.size}")
    // Drift tripwire: any key the registry actually requested (the
    // preceding test drives all of them when the suite runs in full)
    // must be committed in KnownKeyNames, so a new getOrBuild call site
    // can't grow the working set without updating the constant above.
    val unknown = graft.ops.PlanCache.distinctKeyNames
      .filterNot(k => known.contains(k) || k.startsWith("cc_"))
    assert(unknown.isEmpty,
      s"PlanCache keys not committed in KnownKeyNames: " +
        s"${unknown.toSeq.sorted.mkString(", ")} — add them and recheck " +
        "the cap")
  }

  test("freeze scratch is released; getOrBuild entries survive release") {
    import org.apache.spark.storage.StorageLevel
    // a bare freeze is per-query scratch: gone after releaseScratch
    val scratchDf = spark.range(100).toDF("sc_r16_scratch_probe")
    val frozen = graft.ops.PlanCache.freeze(scratchDf)
    assert(frozen.storageLevel != StorageLevel.NONE,
      "freeze must persist an unpersisted plan")
    graft.ops.PlanCache.releaseScratch()
    assert(frozen.storageLevel == StorageLevel.NONE,
      "releaseScratch must unpersist per-query freezes — the r15 " +
        "board-wide leak was exactly this entry surviving")
    // a getOrBuild entry is shared infrastructure: it must survive
    val shared = graft.ops.PlanCache.getOrBuild(spark, "r16probe",
      "corpus_sigs")(spark.range(50).toDF("sc_r16_shared_probe"))
    graft.ops.PlanCache.releaseScratch()
    assert(shared.storageLevel != StorageLevel.NONE,
      "releaseScratch must NOT unpersist LRU-owned getOrBuild entries")
    // self-heal: if a release unpersisted a shared entry (canonical-plan
    // collision), the next getOrBuild access re-persists it
    shared.unpersist(blocking = true)
    val again = graft.ops.PlanCache.getOrBuild(spark, "r16probe",
      "corpus_sigs")(fail("builder must not re-run on a cache hit"))
    assert(again.storageLevel != StorageLevel.NONE,
      "getOrBuild hit must re-persist an entry lost to a collision")
    again.unpersist(blocking = false)
  }
}
