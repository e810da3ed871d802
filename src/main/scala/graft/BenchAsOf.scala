package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, TimestampNTZType}

/** As-of join implementation benchmark: the native AsOfJoinExec
  * (graft.plans.AsOf) vs the union+window composition (q25's shape),
  * at two payload widths, over the events fixture at the given SF.
  *
  * The structural claim under test (AsOfJoin scaladoc): the window
  * form null-pads every column of BOTH sides into one union and drags
  * them through a single per-key window sort, paying one
  * `last(_, ignoreNulls)` PER right payload column; the native exec
  * shuffles each side's columns separately and merges sorted runs. On
  * narrow payloads the two are shuffle-bound and tie (BASELINE.md,
  * round 12); this main measures whether/where the wide-payload
  * separation appears. Both forms end in the same checksum aggregate
  * (sum of lengths + count) so column pruning cannot silently drop
  * the payloads being measured, and both results are asserted equal
  * before times are reported.
  *
  * Prints ONE JSON line: seconds per (impl × width), best of 2, after
  * an sf0.001 warmup. Recorded in BASELINE.md; no driver gate.
  */
object BenchAsOf {

  /** Purchases enriched with the latest click ≤ ts (inner, no
    * tolerance), both sides carrying `extra` copies of the props
    * payload; returns the checksum frame (1 row).
    */
  private def native(spark: SparkSession, dir: String, extra: Int): DataFrame = {
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
      rightTieBreak = Seq("c_event_id"))
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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup + results-equal assertion at the small SF
    Seq(0, 8, 32).foreach { extra =>
      val a = native(spark, "/root/testdata/sf0.001", extra).collect().toSeq
      val b = windowForm(spark, "/root/testdata/sf0.001", extra).collect().toSeq
      require(a == b, s"native != window at extra=$extra: $a vs $b")
    }

    def time(f: => DataFrame): Double = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f.collect()
        (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }

    val results = for {
      extra <- Seq(0, 8, 32)
      (name, fn) <- Seq(
        "native" -> (() => native(spark, sfDir, extra)),
        "window" -> (() => windowForm(spark, sfDir, extra)))
    } yield s""""${name}_x$extra":${"%.3f".format(time(fn()))}"""

    println(s"""{"metric":"asof_impl_sec",${results.mkString(",")},"sf":"$sfDir"}""")
    spark.stop()
  }
}
