package graft

import graft.ops.RangeNtile
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The boundary-broadcast ntile must agree with the window-form ntile
  * row-for-row AND plan without any single-partition collapse — the
  * whole point of the variant is that no task ever sees the full input.
  */
class RangeNtileSpec extends SparkSpec {

  private def scoredDocs = {
    // a total order with ties on the first key, like real quality scores
    Fixtures.table(spark, sf, "documents")
      .select(col("doc_id"), (length(col("text")) % 97).as("score"))
  }

  test("withNtile(k) equals ntile(k) over the global window, including " +
    "the remainder rule, for several k") {
    val df = scoredDocs
    val sortKey = Seq(col("score").desc, col("doc_id"))
    Seq(3, 10, 32).foreach { k =>
      val want = df.withColumn("b",
          ntile(k).over(Window.orderBy(sortKey: _*)).cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val got = RangeNtile.withNtile(df, sortKey, k, "b")
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === want, s"k=$k")
    }
  }

  test("withNtile handles the degenerate N < k input like SQL ntile") {
    val df = scoredDocs.limit(4)
    val sortKey = Seq(col("score").desc, col("doc_id"))
    val want = df.withColumn("b",
        ntile(10).over(Window.orderBy(sortKey: _*)).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = RangeNtile.withNtile(df, sortKey, 10, "b")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === want)
  }

  test("withNtile's plan has per-shard sorts only — no SinglePartition " +
    "exchange anywhere (the scale contract)") {
    val out = RangeNtile.withNtile(scoredDocs,
      Seq(col("score").desc, col("doc_id")), 10, "b")
    out.queryExecution.toRdd.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"boundary-broadcast ntile collapsed to one partition:\n$plan")
    assert(plan.contains("rangepartitioning"),
      s"expected a range repartition in:\n$plan")
  }

  test("withRowNumber equals row_number() over the global window") {
    val df = scoredDocs
    val sortKey = Seq(col("score").desc, col("doc_id"))
    val want = df.withColumn("rn",
        row_number().over(Window.orderBy(sortKey: _*)).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = RangeNtile.withRowNumber(df, sortKey, "rn")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === want)
  }

  test("q149's default (boundary-broadcast) ntile equals the " +
    "graft.ntile.strategy=window form") {
    val got = run("q149_quality_budget_curve").collect()
      .map(_.toString).sorted
    spark.conf.set("graft.ntile.strategy", "window")
    try {
      val want = run("q149_quality_budget_curve").collect()
        .map(_.toString).sorted
      assert(got === want)
    } finally spark.conf.unset("graft.ntile.strategy")
  }

  test("every migrated global-window consumer (q89/q91/q98/q105/q114/" +
    "q129/q138/q141/q199/q234) matches its graft.ntile.strategy=window " +
    "form") {
    val names = Seq("q89_skew_report", "q91_curriculum_grid", "q98_rfm",
      "q105_psi_drift", "q114_ks_drift", "q129_session_percentiles",
      "q138_quality_calibration", "q141_conversion_lag",
      "q199_quality_quantile_norm", "q234_spearman_balance_spend")
    names.foreach { n =>
      val got = run(n).collect().map(_.toString).sorted
      spark.conf.set("graft.ntile.strategy", "window")
      try {
        val want = run(n).collect().map(_.toString).sorted
        assert(got === want, n)
      } finally spark.conf.unset("graft.ntile.strategy")
    }
  }
}
