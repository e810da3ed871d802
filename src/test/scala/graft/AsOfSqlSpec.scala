package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{AsOf, AsOfJoinExec, BroadcastAsOfJoinExec}

/** SQL-text surface for the native as-of join: the `graft_asof_join`
  * table-valued function must produce the SAME result and the SAME
  * physical exec as the Scala API across modes, honor the
  * broadcast/merge options, and reject malformed calls with clear
  * errors.
  */
class AsOfSqlSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = GraftSession.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  private val sf = "/root/testdata/sf0.001"

  private def mkViews(): Unit = {
    val e = Fixtures.table(spark, sf, "events")
    e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
      .createOrReplaceTempView("sqlspec_purchases")
    e.where(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
        col("event_id").as("c_event_id"))
      .createOrReplaceTempView("sqlspec_clicks")
  }

  private def scalaForm(outer: Boolean, fwd: Boolean, strict: Boolean,
      tol: Option[Long]): DataFrame = {
    val e = Fixtures.table(spark, sf, "events")
    val p = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val c = e.where(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
        col("event_id").as("c_event_id"))
    AsOf.asofJoin(p, c, Seq("user_id"), Seq("c_user_id"), "ts", "click_ts",
      rightTieBreak = Seq("c_event_id"), toleranceUs = tol,
      leftOuter = outer, forward = fwd, strict = strict)
  }

  private def sqlForm(opts: String, tol: Option[Long]): DataFrame = {
    val tolArg = tol.map(t => s", ${t}L").getOrElse("")
    spark.sql(s"""SELECT * FROM graft_asof_join(
      'sqlspec_purchases', 'sqlspec_clicks',
      'user_id', 'c_user_id', 'ts', 'click_ts',
      'c_event_id', '$opts'$tolArg)""")
  }

  test("SQL form equals Scala form across the mode matrix") {
    mkViews()
    for {
      outer <- Seq(false, true)
      fwd <- Seq(false, true)
      strict <- Seq(false, true)
      tol <- Seq(None, Some(3600L * 1000000L))
    } {
      val opts = Seq(
        if (outer) Some("outer") else None,
        if (fwd) Some("forward") else None,
        if (strict) Some("strict") else None).flatten.mkString(",")
      val a = scalaForm(outer, fwd, strict, tol)
        .orderBy("event_id").collect().toSeq
      val b = sqlForm(opts, tol).orderBy("event_id").collect().toSeq
      assert(a === b, s"SQL/Scala mismatch at opts='$opts' tol=$tol")
    }
  }

  test("SQL form plans the same native execs: merge and broadcast options") {
    mkViews()
    def executed(opts: String) = {
      val df = sqlForm(opts, None)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    val merged = executed("outer,merge")
    assert(merged.contains("AsOfJoin") && !merged.contains("BroadcastAsOfJoin"),
      s"merge option not honored:\n$merged")
    val bcast = executed("outer,broadcast")
    assert(bcast.contains("BroadcastAsOfJoin"),
      s"broadcast option not honored:\n$bcast")
    // auto (tiny right side at sf0.001) picks broadcast
    val auto = executed("outer")
    assert(auto.contains("BroadcastAsOfJoin"),
      s"auto pick did not broadcast a tiny dim:\n$auto")
  }

  test("SQL form works in a CTE + downstream aggregation") {
    mkViews()
    val n = spark.sql("""
      WITH j AS (
        SELECT * FROM graft_asof_join(
          'sqlspec_purchases', 'sqlspec_clicks',
          'user_id', 'c_user_id', 'ts', 'click_ts', 'c_event_id', 'outer')
      )
      SELECT count(*) AS n, count(click_ts) AS matched FROM j
    """).collect().head
    val expect = scalaForm(outer = true, fwd = false, strict = false, None)
      .agg(count(lit(1)), count(col("click_ts"))).collect().head
    assert(n === expect)
  }

  test("multi-column keys via comma-separated lists") {
    import spark.implicits._
    Seq(("a", 1L, 100L, 1L), ("a", 2L, 100L, 2L), ("b", 1L, 100L, 3L))
      .toDF("g", "k", "t", "lid").createOrReplaceTempView("sqlspec_ml")
    Seq(("a", 1L, 90L, 10L), ("a", 2L, 80L, 11L), ("b", 1L, 95L, 12L),
      ("a", 1L, 99L, 13L))
      .toDF("rg", "rk", "rt", "rid").createOrReplaceTempView("sqlspec_mr")
    val out = spark.sql("""SELECT lid, rid FROM graft_asof_join(
      'sqlspec_ml', 'sqlspec_mr', 'g,k', 'rg,rk', 't', 'rt', 'rid', '')""")
      .as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 13L), (2L, 11L), (3L, 12L)))
  }

  test("malformed calls fail with clear errors") {
    mkViews()
    def fails(sql: String, fragment: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.getMessage != null && e.getMessage.contains(fragment),
        s"expected '$fragment' in: ${e.getMessage}")
    }
    fails("""SELECT * FROM graft_asof_join('sqlspec_purchases')""",
      "expects 8 or 9 arguments")
    fails("""SELECT * FROM graft_asof_join('sqlspec_purchases',
      'sqlspec_clicks', 'user_id', 'c_user_id', 'ts', 'click_ts',
      'c_event_id', 'sideways')""", "unknown option")
    fails("""SELECT * FROM graft_asof_join('sqlspec_purchases',
      'sqlspec_clicks', 'user_id', 'c_user_id', 'ts', 'click_ts',
      'c_event_id', 'broadcast,merge')""", "mutually exclusive")
    fails("""SELECT * FROM graft_asof_join('sqlspec_purchases',
      'sqlspec_clicks', 'no_such_col', 'c_user_id', 'ts', 'click_ts',
      'c_event_id', '')""", "missing")
    fails("""SELECT * FROM graft_asof_join('sqlspec_purchases',
      'sqlspec_clicks', 'user_id,extra', 'c_user_id', 'ts', 'click_ts',
      'c_event_id', '')""", "arity")
  }
}
