package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.RangeJoinOps

/** SQL-text surface for the native range join: the `graft_range_join`
  * table-valued function must produce the SAME result and the SAME
  * physical exec as the Scala API (inner and left-outer), compose in
  * CTEs, resolve comma-separated multi-column keys, and reject
  * malformed calls with clear errors — the q520/AsOfSqlSpec contract,
  * applied to the second native operator.
  */
class RangeSqlSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = GraftSession.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  private val sf = "/root/testdata/sf0.001"

  private def mkViews(): Unit = {
    val e = Fixtures.table(spark, sf, "events")
    val us = expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ " +
      "'1970-01-01 00:00:00', ts)")
    e.where(col("event_type") === "purchase")
      .select(col("user_id").as("u"), col("event_id").as("p_id"),
        us.as("p_us"))
      .withColumn("p_hi", col("p_us") + lit(7200000000L))
      .createOrReplaceTempView("rsqlspec_purch")
    e.where(col("event_type") === "error")
      .select(col("user_id").as("eu"), col("event_id").as("e_id"),
        us.as("e_us"))
      .createOrReplaceTempView("rsqlspec_err")
  }

  private def scalaForm(outer: Boolean): DataFrame =
    RangeJoinOps.rangeJoin(
      spark.table("rsqlspec_purch"), spark.table("rsqlspec_err"),
      Seq("u"), Seq("eu"), "p_us", "p_hi", "e_us", leftOuter = outer)

  private def sqlForm(opts: String): DataFrame =
    spark.sql(s"""SELECT * FROM graft_range_join(
      'rsqlspec_purch', 'rsqlspec_err',
      'u', 'eu', 'p_us', 'p_hi', 'e_us', '$opts')""")

  test("SQL form equals Scala form, inner and left-outer") {
    mkViews()
    for (outer <- Seq(false, true)) {
      val opts = if (outer) "outer" else ""
      val a = scalaForm(outer).orderBy("p_id", "e_id").collect().toSeq
      val b = sqlForm(opts).orderBy("p_id", "e_id").collect().toSeq
      assert(a === b, s"SQL/Scala mismatch at opts='$opts'")
      assert(a.nonEmpty)
    }
    // outer actually null-extends something at this SF
    assert(sqlForm("outer").where(col("e_id").isNull).count() > 0)
  }

  test("SQL form plans the native RangeJoinExec") {
    mkViews()
    val df = sqlForm("outer")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoin"), s"native exec missing:\n$plan")
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoop"),
      s"SQL surface fell back to a cross-product plan:\n$plan")
  }

  test("SQL form works in a CTE + downstream aggregation") {
    mkViews()
    val got = spark.sql("""
      WITH j AS (
        SELECT * FROM graft_range_join(
          'rsqlspec_purch', 'rsqlspec_err',
          'u', 'eu', 'p_us', 'p_hi', 'e_us', 'outer')
      )
      SELECT count(*) AS n, count(e_id) AS matched FROM j
    """).collect().head
    val expect = scalaForm(outer = true)
      .agg(count(lit(1)), count(col("e_id"))).collect().head
    assert(got === expect)
  }

  test("multi-column keys via comma-separated lists") {
    import spark.implicits._
    Seq(("a", 1L, 100L, 200L, 1L), ("a", 2L, 100L, 200L, 2L),
      ("b", 1L, 100L, 200L, 3L))
      .toDF("g", "k", "lo", "hi", "lid")
      .createOrReplaceTempView("rsqlspec_ml")
    Seq(("a", 1L, 150L, 10L), ("a", 2L, 250L, 11L), ("b", 1L, 200L, 12L),
      ("a", 1L, 99L, 13L))
      .toDF("rg", "rk", "rt", "rid").createOrReplaceTempView("rsqlspec_mr")
    val out = spark.sql("""SELECT lid, rid FROM graft_range_join(
      'rsqlspec_ml', 'rsqlspec_mr', 'g,k', 'rg,rk', 'lo', 'hi', 'rt', '')""")
      .as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 10L), (3L, 12L)))
  }

  test("malformed calls fail with clear errors") {
    mkViews()
    def fails(sql: String, fragment: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.getMessage != null && e.getMessage.contains(fragment),
        s"expected '$fragment' in: ${e.getMessage}")
    }
    fails("""SELECT * FROM graft_range_join('rsqlspec_purch')""",
      "expects 7 or 8 arguments")
    fails("""SELECT * FROM graft_range_join('rsqlspec_purch',
      'rsqlspec_err', 'u', 'eu', 'p_us', 'p_hi', 'e_us', 'sideways')""",
      "unknown option")
    fails("""SELECT * FROM graft_range_join('rsqlspec_purch',
      'rsqlspec_err', 'no_such_col', 'eu', 'p_us', 'p_hi', 'e_us', '')""",
      "missing")
    fails("""SELECT * FROM graft_range_join('rsqlspec_purch',
      'rsqlspec_err', 'u,extra', 'eu', 'p_us', 'p_hi', 'e_us', '')""",
      "arity")
  }
}
