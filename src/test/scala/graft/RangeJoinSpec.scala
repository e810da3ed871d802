package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.RangeJoinOps.rangeJoin

/** Native range join (RangeJoinExec) vs the θ-join reference across
  * the semantics matrix: inner/outer, empty windows, hi < lo,
  * non-monotone interval widths (a wide interval buffering rows past a
  * later narrow one's hi), null keys/bounds/times on both sides, key
  * boundaries, and the fixture-scale q26 shape. Plus plan-shape: both
  * sides hash-clustered on the keys (equi-join shuffle shape), no
  * cartesian anywhere.
  */
class RangeJoinSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = GraftSession.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  private val sf = "/root/testdata/sf0.001"

  import scala.jdk.CollectionConverters._
  private def mkLeft(rows: Seq[(java.lang.Long, java.lang.Long, java.lang.Long, Long)]): DataFrame =
    spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3, r._4)).asJava,
      org.apache.spark.sql.types.StructType.fromDDL(
        "k BIGINT, lo BIGINT, hi BIGINT, lid BIGINT"))

  private def mkRight(rows: Seq[(java.lang.Long, java.lang.Long, Long)]): DataFrame =
    spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3)).asJava,
      org.apache.spark.sql.types.StructType.fromDDL(
        "rk BIGINT, t BIGINT, rid BIGINT"))

  /** θ-join reference with identical null/inclusive-bounds semantics. */
  private def reference(l: DataFrame, r: DataFrame,
      outer: Boolean): Set[(Long, Option[Long])] = {
    val joined = l.join(r,
      col("k") === col("rk") && col("t") >= col("lo")
        && col("t") <= col("hi"),
      if (outer) "left_outer" else "inner")
    joined.select(col("lid"), col("rid")).collect()
      .map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)))).toSet
  }

  private def native(l: DataFrame, r: DataFrame,
      outer: Boolean): Set[(Long, Option[Long])] =
    rangeJoin(l, r, Seq("k"), Seq("rk"), "lo", "hi", "t",
      leftOuter = outer, broadcastHint = Some(false))
      .select(col("lid"), col("rid")).collect()
      .map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)))).toSet

  test("matrix: inner and outer equal the θ-join on a hand case with " +
    "nulls, hi<lo, empty windows, non-monotone widths, key boundaries") {
    val jnull: java.lang.Long = null
    val l = mkLeft(Seq(
      (1L: java.lang.Long, 0L: java.lang.Long, 100L: java.lang.Long, 1L), // wide
      (1L: java.lang.Long, 5L: java.lang.Long, 6L: java.lang.Long, 2L), // narrow AFTER wide: must not see t=50
      (1L: java.lang.Long, 90L: java.lang.Long, 80L: java.lang.Long, 3L), // hi < lo: empty
      (1L: java.lang.Long, 200L: java.lang.Long, 300L: java.lang.Long, 4L), // empty window
      (2L: java.lang.Long, 10L: java.lang.Long, 20L: java.lang.Long, 5L), // other key
      (jnull, 0L: java.lang.Long, 10L: java.lang.Long, 6L), // null key
      (3L: java.lang.Long, jnull, 10L: java.lang.Long, 7L), // null lo
      (3L: java.lang.Long, 0L: java.lang.Long, jnull, 8L))) // null hi
    val r = mkRight(Seq(
      (1L: java.lang.Long, 0L: java.lang.Long, 10L), // boundary t == lo
      (1L: java.lang.Long, 5L: java.lang.Long, 11L),
      (1L: java.lang.Long, 6L: java.lang.Long, 12L),
      (1L: java.lang.Long, 50L: java.lang.Long, 13L),
      (1L: java.lang.Long, 100L: java.lang.Long, 14L), // boundary t == hi
      (1L: java.lang.Long, 101L: java.lang.Long, 15L), // just past hi
      (2L: java.lang.Long, 15L: java.lang.Long, 16L),
      (2L: java.lang.Long, 21L: java.lang.Long, 17L),
      (3L: java.lang.Long, 5L: java.lang.Long, 18L),
      (jnull, 5L: java.lang.Long, 19L), // null right key
      (1L: java.lang.Long, jnull, 20L))) // null right time
    for (outer <- Seq(false, true)) {
      assert(native(l, r, outer) === reference(l, r, outer),
        s"outer=$outer")
    }
    // sanity on the hand case itself
    assert(native(l, r, false) ===
      Set((1L, Some(10L)), (1L, Some(11L)), (1L, Some(12L)),
        (1L, Some(13L)), (1L, Some(14L)),
        (2L, Some(11L)), (2L, Some(12L)),
        (5L, Some(16L))).map { case (a, b) => (a, b) })
  }

  test("empty sides: no rows, and outer null-extends every left row") {
    val l = mkLeft(Seq((1L: java.lang.Long, 0L: java.lang.Long,
      10L: java.lang.Long, 1L)))
    val r = mkRight(Nil)
    assert(native(l, r, false).isEmpty)
    assert(native(l, r, true) === Set((1L, None: Option[Long])))
    val l0 = mkLeft(Nil)
    val r1 = mkRight(Seq((1L: java.lang.Long, 5L: java.lang.Long, 9L)))
    assert(native(l0, r1, false).isEmpty)
    assert(native(l0, r1, true).isEmpty)
  }

  test("fixture scale: q26's pairs equal the θ-join over events, and " +
    "the plan is the equi-join shuffle shape (no cartesian)") {
    val e = Fixtures.table(spark, sf, "events")
      .where(col("event_type") === "error")
      .select(col("user_id"), col("event_id"),
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ " +
          "'1970-01-01 00:00:00', ts)").as("us"))
    val W = 21600000000L
    val a = e.select(col("user_id").as("u"), col("event_id").as("a_id"),
      col("us").as("a_us"), (col("us") + W).as("a_hi"))
    val b = e.select(col("user_id").as("bu"), col("event_id").as("b_id"),
      col("us").as("b_us"))
    val nat = rangeJoin(a, b, Seq("u"), Seq("bu"), "a_us", "a_hi", "b_us")
    val plan = nat.queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoinExec")
      || plan.contains("RangeJoin"), s"native exec expected:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
    val got = nat.select(col("a_id"), col("b_id")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val want = a.join(b,
      col("u") === col("bu") && col("b_us") >= col("a_us")
        && col("b_us") <= col("a_hi"))
      .select(col("a_id"), col("b_id")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  /** Recompiles every codegen stage containing the range join — see
    * [[CodegenTestUtil.assertStageCompiles]] for why the `*(n)` plan
    * marker alone cannot prove no silent Janino fallback happened.
    */
  private def assertStageCompiles(df: DataFrame): Unit =
    CodegenTestUtil.assertStageCompiles(df) {
      case _: graft.plans.RangeJoinExec =>
    }

  test("whole-stage codegen: inner AND outer fuse into a compiling " +
    "stage, results equal the interpreted path with codegen off") {
    val l = mkLeft(Seq(
      (1L: java.lang.Long, 0L: java.lang.Long, 100L: java.lang.Long, 1L),
      (1L: java.lang.Long, 5L: java.lang.Long, 6L: java.lang.Long, 2L),
      (2L: java.lang.Long, 10L: java.lang.Long, 20L: java.lang.Long, 5L),
      (3L: java.lang.Long, 0L: java.lang.Long, 1L: java.lang.Long, 9L)))
    val r = mkRight(Seq(
      (1L: java.lang.Long, 0L: java.lang.Long, 10L),
      (1L: java.lang.Long, 5L: java.lang.Long, 11L),
      (1L: java.lang.Long, 50L: java.lang.Long, 13L),
      (2L: java.lang.Long, 15L: java.lang.Long, 16L)))
    for (outer <- Seq(false, true)) {
      def run(): Set[(Long, Option[Long])] = native(l, r, outer)
      val m = rangeJoin(l, r, Seq("k"), Seq("rk"), "lo", "hi", "t",
        leftOuter = outer, broadcastHint = Some(false))
      m.collect(): Unit
      assertStageCompiles(m)
      val on = run()
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val off = try run()
        finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
      assert(on === off, s"outer=$outer")
      assert(on.nonEmpty)
      // outer: key 3's empty window must null-extend through codegen
      if (outer) assert(on.contains((9L, None: Option[Long])))
    }
  }

  test("whole-stage codegen survives the AQE skew rewrite: " +
    "skew=true plan, stage still compiles, results equal θ-join") {
    // 98%-hot key, small thresholds to force the rewrite (the
    // AsOfSkewSpec shape)
    val l = spark.range(200000L)
      .select(when(col("id") % 50 < 49, lit(0L))
          .otherwise(col("id") % 512).as("k"),
        (col("id") * 7 % 1000003).as("lo"),
        (col("id") * 7 % 1000003 + 2000L).as("hi"),
        col("id").as("lid"))
    val r = spark.range(20000L)
      .select(when(col("id") % 50 < 49, lit(0L))
          .otherwise(col("id") % 512).as("rk"),
        (col("id") * 11 % 1000003).as("rt"), col("id").as("rid"))
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "200k")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "100k")
    try {
      val m = rangeJoin(l, r, Seq("k"), Seq("rk"), "lo", "hi", "rt",
        broadcastHint = Some(false))
        .select(col("lid"), col("rid"))
      val got = m.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val plan = m.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"skew mitigation did not fire:\n$plan")
      assertStageCompiles(m)
      val want = l.join(r, col("k") === col("rk")
          && col("rt") >= col("lo") && col("rt") <= col("hi"))
        .select(col("lid"), col("rid")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got === want)
      assert(got.nonEmpty)
    } finally {
      spark.conf.unset(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    }
  }
}
