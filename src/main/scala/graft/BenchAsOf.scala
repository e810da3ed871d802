package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, TimestampNTZType}

/** As-of join implementation benchmark: the native merge AsOfJoinExec
  * vs the union+window composition (q25's shape) vs the broadcast
  * BroadcastAsOfJoinExec, at several payload widths, over the events
  * fixture at the given SF; plus a high-row-count narrow point (where
  * per-comparison cost, not shuffle width, dominates) and a skewed-key
  * point (one hot key carrying ~all left rows).
  *
  * The structural claims under test (AsOfJoin scaladoc):
  *  - the window form null-pads every column of BOTH sides into one
  *    union and drags them through a single per-key window sort, paying
  *    one `last(_, ignoreNulls)` PER right payload column; the native
  *    merge exec shuffles each side's columns separately and merges
  *    sorted runs;
  *  - the broadcast exec never shuffles or sorts the left side at all
  *    (zero fact-side exchanges) — the fact×dim shape;
  *  - the skewed point: a hot key serializes ONE merge partition, but
  *    the broadcast exec is immune (left stays scan-partitioned) —
  *    measured here, mitigation documented in AsOf.asofJoinSalted.
  *
  * All impls end in the same checksum aggregate (sum of lengths +
  * count) so column pruning cannot silently drop the payloads being
  * measured, and results are asserted equal before times are reported.
  *
  * Prints ONE JSON line: seconds per (impl × point), best of 2, after
  * an sf0.001 warmup. Recorded in BASELINE.md; no driver gate.
  */
object BenchAsOf {

  /** Purchases enriched with the latest click ≤ ts (inner, no
    * tolerance), both sides carrying `extra` copies of the props
    * payload; returns the checksum frame (1 row).
    */
  private def native(spark: SparkSession, dir: String, extra: Int,
      broadcast: Boolean): DataFrame = {
    val e = Fixtures.table(spark, dir, "events")
    val pay = (1 to extra).map(i => col("props").as(s"lp$i"))
    val rpay = (1 to extra).map(i => col("props").as(s"rp$i"))
    val purchases = e.where(col("event_type") === "purchase")
      .select(Seq(col("user_id"), col("ts"), col("event_id")) ++ pay: _*)
    val clicks = e.where(col("event_type") === "click")
      .select(Seq(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
        col("event_id").as("c_event_id")) ++ rpay: _*)
    val j = graft.plans.AsOf.asofJoin(purchases, clicks,
      Seq("user_id"), Seq("c_user_id"), "ts", "click_ts",
      rightTieBreak = Seq("c_event_id"), broadcast = Some(broadcast))
    checksum(j, extra)
  }

  private def windowForm(spark: SparkSession, dir: String, extra: Int): DataFrame = {
    val e = Fixtures.table(spark, dir, "events")
    val nullStr = lit(null).cast(StringType)
    val purchases = e.where(col("event_type") === "purchase")
      .select(Seq(col("user_id"), col("ts"), lit(1).as("side"),
        lit(null).cast(TimestampNTZType).as("click_ts"),
        lit(null).cast(LongType).as("c_event_id"),
        col("event_id")) ++
        (1 to extra).map(i => col("props").as(s"lp$i")) ++
        (1 to extra).map(i => nullStr.as(s"rp$i")): _*)
    val clicks = e.where(col("event_type") === "click")
      .select(Seq(col("user_id"), col("ts"), lit(0).as("side"),
        col("ts").as("click_ts"), col("event_id").as("c_event_id"),
        lit(null).cast(LongType).as("event_id")) ++
        (1 to extra).map(i => nullStr.as(s"lp$i")) ++
        (1 to extra).map(i => col("props").as(s"rp$i")): _*)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("c_event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // one running last() per right-side column — the per-column cost
    // the native exec does not pay
    var u = clicks.unionAll(purchases)
      .withColumn("last_click_ts", last(col("click_ts"), true).over(w))
    (1 to extra).foreach { i =>
      u = u.withColumn(s"last_rp$i", last(col(s"rp$i"), true).over(w))
    }
    val j = u.where(col("side") === 1 && col("last_click_ts").isNotNull)
      .select(Seq(col("user_id"), col("ts"), col("event_id"),
        col("last_click_ts").as("click_ts")) ++
        (1 to extra).map(i => col(s"lp$i")) ++
        (1 to extra).map(i => col(s"last_rp$i").as(s"rp$i")): _*)
    checksum(j, extra)
  }

  private def checksum(j: DataFrame, extra: Int): DataFrame = {
    val payLen = (1 to extra).map(i =>
      sum(length(col(s"lp$i")) + length(col(s"rp$i"))))
      .reduceOption(_ + _).getOrElse(lit(0L)).as("pay_len")
    j.agg(count(lit(1)).as("n"),
      sum(expr("timestampdiff(MICROSECOND, click_ts, ts)")).as("lag_sum"),
      payLen)
  }

  /** Narrow high-row-count point: synthetic (key, time, id) streams —
    * per-comparison cost dominates (the boxing the primitive merge
    * path removes), not shuffle width. `mult` scales row count.
    */
  private def narrow(spark: SparkSession, rows: Int, impl: String): DataFrame = {
    // deterministic synthetic streams; id() is a pure projection so
    // the generation cost is identical across impls
    val l = spark.range(rows.toLong)
      .select((col("id") % 4096).as("k"), (col("id") * 7 % 1000003).as("t"),
        col("id").as("lid"))
    val r = spark.range(rows.toLong)
      .select((col("id") % 4096).as("rk"), (col("id") * 11 % 1000003).as("rt"),
        col("id").as("rid"))
    val j = impl match {
      case "merge" => graft.plans.AsOf.asofJoin(l, r, Seq("k"), Seq("rk"),
        "t", "rt", rightTieBreak = Seq("rid"), leftOuter = true,
        broadcast = Some(false))
      case "bcast" => graft.plans.AsOf.asofJoin(l, r, Seq("k"), Seq("rk"),
        "t", "rt", rightTieBreak = Seq("rid"), leftOuter = true,
        broadcast = Some(true))
    }
    j.agg(count(lit(1)).as("n"), sum(col("rid")).as("rid_sum"),
      sum(col("t") - col("rt")).as("lag_sum"))
  }

  /** Skewed point: ONE hot key carries 98% of left rows (the one-user-
    * with-10⁸-events shape). The merge exec funnels the hot key into a
    * single partition's merge; the broadcast exec keeps the left side
    * scan-partitioned (immune, but only viable while the right side
    * fits the broadcast budget); the salted variant balances the hot
    * key across 16 buckets at the cost of replicating the (much
    * smaller) right side ×16 — the big-big mitigation.
    */
  private def skewed(spark: SparkSession, rows: Int, impl: String): DataFrame = {
    val l = spark.range(rows.toLong)
      .select(when(col("id") % 50 < 49, lit(0L)).otherwise(col("id") % 4096)
          .as("k"), // 98% of rows on key 0
        (col("id") * 7 % 1000003).as("t"), col("id").as("lid"))
    val r = spark.range((rows / 16).toLong)
      .select(when(col("id") % 50 < 49, lit(0L)).otherwise(col("id") % 4096)
          .as("rk"),
        (col("id") * 11 % 1000003).as("rt"), col("id").as("rid"))
    val j = impl match {
      case "merge" => graft.plans.AsOf.asofJoin(l, r, Seq("k"), Seq("rk"),
        "t", "rt", rightTieBreak = Seq("rid"), leftOuter = true,
        broadcast = Some(false))
      case "bcast" => graft.plans.AsOf.asofJoin(l, r, Seq("k"), Seq("rk"),
        "t", "rt", rightTieBreak = Seq("rid"), leftOuter = true,
        broadcast = Some(true))
      case "salted" => graft.plans.AsOf.asofJoinSalted(l, r,
        Seq("k"), Seq("rk"), "t", "rt", rightTieBreak = Seq("rid"),
        leftOuter = true, salts = 16)
    }
    j.agg(count(lit(1)).as("n"), sum(col("rid")).as("rid_sum"),
      sum(col("t") - col("rt")).as("lag_sum"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup + results-equal assertion at the small SF
    Seq(0, 8, 32).foreach { extra =>
      val a = native(spark, "/root/testdata/sf0.001", extra, broadcast = false)
        .collect().toSeq
      val b = windowForm(spark, "/root/testdata/sf0.001", extra)
        .collect().toSeq
      val c = native(spark, "/root/testdata/sf0.001", extra, broadcast = true)
        .collect().toSeq
      require(a == b, s"merge != window at extra=$extra: $a vs $b")
      require(a == c, s"merge != broadcast at extra=$extra: $a vs $c")
    }
    // narrow + skew impl-equality at a small row count
    require(narrow(spark, 50000, "merge").collect().toSeq ==
      narrow(spark, 50000, "bcast").collect().toSeq, "narrow merge != bcast")
    val sk = Seq("merge", "bcast", "salted")
      .map(i => skewed(spark, 50000, i).collect().toSeq)
    require(sk.distinct.length == 1, s"skewed impls disagree: $sk")

    def time(f: => DataFrame): Double = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f.collect()
        (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }

    // baselines for the merge hot path, selected via the debug knob:
    //  - "generic"   boxed eval + interpreted-Ordering comparisons
    //    (the exec before the TimeGetter path)
    //  - "projected" primitive comparisons but per-row UnsafeProjection
    //    key/output work (the exec before the round-14 fast path:
    //    single-long-key getters + bitwise UnsafeRowJoiner output)
    def timeWith(knob: String)(f: => DataFrame): Double = {
      spark.conf.set("graft.asof.timeCompare", knob)
      try time(f) finally spark.conf.unset("graft.asof.timeCompare")
    }
    def timeBoxed(f: => DataFrame): Double = timeWith("generic")(f)

    val wide = for {
      extra <- Seq(0, 8, 32)
      (name, fn) <- Seq(
        "native" -> (() => native(spark, sfDir, extra, broadcast = false)),
        "window" -> (() => windowForm(spark, sfDir, extra)),
        "bcast" -> (() => native(spark, sfDir, extra, broadcast = true)))
    } yield s""""${name}_x$extra":${"%.3f".format(time(fn()))}"""
    val wideBoxed = s""""native_x32_boxed":${"%.3f".format(
      timeBoxed(native(spark, sfDir, 32, broadcast = false)))}"""

    val nRows = 4000000
    val narrowPts = Seq(
      s""""narrow_merge":${"%.3f".format(time(narrow(spark, nRows, "merge")))}""",
      s""""narrow_merge_projected":${"%.3f".format(
        timeWith("projected")(narrow(spark, nRows, "merge")))}""",
      s""""narrow_merge_boxed":${"%.3f".format(
        timeBoxed(narrow(spark, nRows, "merge")))}""")
    val skewPts = Seq("merge", "bcast", "salted").map(i =>
      s""""skew_$i":${"%.3f".format(time(skewed(spark, nRows, i)))}""")

    println(s"""{"metric":"asof_impl_sec",${(wide :+ wideBoxed) ++ narrowPts ++ skewPts mkString ","},"narrow_rows":$nRows,"sf":"$sfDir"}""")
    spark.stop()
  }
}
