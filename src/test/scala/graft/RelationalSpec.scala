package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("registry is consistent: every query oracled, names unique") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
    // EVERY query carries an oracle: none silently degrades to the
    // driver's weaker rows-only check
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet,
      s"unoracled: ${SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet}")
    // Single committed constant: bump SparkEntry.registrySize with every
    // new query; asserting against it here keeps the count from rotting.
    assert(names.size == SparkEntry.registrySize,
      s"registry has ${names.size} queries but SparkEntry.registrySize is " +
        s"${SparkEntry.registrySize} — bump the constant with the new queries")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // (The "every query runs and returns rows" sweep lives in
  // PlanLintSpec's consolidated sf0.01 registry execution — one sweep
  // serves the rows>0 smoke check and both plan lints.)

  test("q01 projects exactly two pruned columns") {
    val df = run("q01_scan_project")
    assert(df.columns.toSeq == Seq("n_nationkey", "n_name"))
    assert(df.count() == 25)
  }

  test("q02 watermark is strict >") {
    val df = run("q02_incremental_watermark")
    val minTs = df.agg(min("ts")).head().getAs[java.time.LocalDateTime](0)
    assert(minTs.isAfter(java.time.LocalDateTime.parse("2024-01-20T00:00:00")))
  }

  test("q04 produces the four TPC-H Q1 flag/status groups") {
    val df = run("q04_agg_lineitem")
    assert(df.count() >= 4)
    val sumQty = df.agg(sum("sum_qty")).head().getDouble(0)
    assert(sumQty > 0)
  }

  test("q05 plan broadcasts the dimension tables") {
    val plan = run("q05_join_broadcast").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("q06 top-k is computed as TakeOrdered (no global sort)") {
    val plan = run("q06_join_agg_topk").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q09 window emits at most 3 rows per customer") {
    val df = run("q09_window_topn")
    val mx = df.groupBy("o_custkey").count().agg(max("count")).head().getLong(0)
    assert(mx <= 3)
  }

  test("filter pushdown reaches the parquet scan") {
    val df = run("q02_incremental_watermark")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(ts)") ||
      scan.contains("PushedFilters: [GreaterThan(ts") ||
      scan.contains("GreaterThan(ts"), s"no pushdown visible:\n$scan")
  }
}
