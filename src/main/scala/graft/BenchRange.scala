package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range-join implementation benchmark: the native sliding-window
  * merge RangeJoinExec vs the hand-banded composition (q26's old
  * shape: two bucket equi-joins + exact filter + distinct-free union),
  * across interval WIDTHS (1 h / 6 h / 24 h — wider intervals inflate
  * the banded form's candidate duplication while the native window
  * just grows its buffer) and a SKEW point (every error event forced
  * onto one user — the hot-key shape where the banded form's bucket
  * runs go quadratic in-bucket and the native form degrades only with
  * genuine output size).
  *
  * Both impls end in the same checksum aggregate (sum of dt + pair
  * count) so pruning can't drop the join, and results are asserted
  * equal before times are reported. Prints ONE JSON line, best-of-2,
  * after an sf0.001 warmup. Recorded in BASELINE.md; no driver gate.
  */
object BenchRange {

  private def errs(spark: SparkSession, dir: String,
      hot: Boolean): DataFrame = {
    val e = Fixtures.table(spark, dir, "events")
      .where(col("event_type") === "error")
      .select(
        (if (hot) lit(7L) else col("user_id")).as("user_id"),
        col("event_id"),
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ " +
          "'1970-01-01 00:00:00', ts)").as("us"))
    e
  }

  // DECIMAL sum: the skew point's pair count × µs-scale deltas
  // overflows int64 at sf3 under ANSI
  private def checksum(pairs: DataFrame): DataFrame =
    pairs.agg(count(lit(1)).as("n"),
      sum((col("b_us") - col("a_us")).cast("decimal(38,0)")).as("s"))

  private def native(spark: SparkSession, dir: String, widthUs: Long,
      hot: Boolean): DataFrame = {
    val e = errs(spark, dir, hot)
    val a = e.select(col("user_id").as("u"), col("event_id").as("a_id"),
      col("us").as("a_us"), (col("us") + widthUs).as("a_hi"))
    val b = e.select(col("user_id").as("bu"), col("event_id").as("b_id"),
      col("us").as("b_us"))
    checksum(graft.plans.RangeJoinOps.rangeJoin(a, b,
      Seq("u"), Seq("bu"), "a_us", "a_hi", "b_us",
      broadcastHint = Some(false))
      .where(col("a_id") < col("b_id")))
  }

  private def banded(spark: SparkSession, dir: String, widthUs: Long,
      hot: Boolean): DataFrame = {
    val e = errs(spark, dir, hot)
      .withColumn("bucket", expr(s"us div ${widthUs}L"))
    val a = e.select(col("user_id").as("u"), col("event_id").as("a_id"),
      col("us").as("a_us"), col("bucket").as("a_b"))
    val b = e.select(col("user_id").as("u"), col("event_id").as("b_id"),
      col("us").as("b_us"), col("bucket").as("b_b"))
    val same = a.join(b, Seq("u"), "inner").where(col("a_b") === col("b_b"))
    val next = a.join(b, Seq("u"), "inner")
      .where(col("a_b") + 1 === col("b_b"))
    checksum(same.unionAll(next)
      .where((col("b_us") - col("a_us")).between(0, widthUs)
        && col("a_id") < col("b_id")))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val H = 3600000000L
    // the skew point uses a 10-minute width: with EVERY event on one
    // key the output itself grows with width × density² — 10 min keeps
    // the genuine output bounded at sf3 so the point measures the
    // join, not the result write
    val points: Seq[(String, Long, Boolean)] = Seq(
      ("w1h", H, false), ("w6h", 6 * H, false), ("w24h", 24 * H, false),
      ("skew10m", H / 6, true))
    val impls: Seq[(String, (SparkSession, String, Long, Boolean) => DataFrame)] =
      Seq(("native", native), ("banded", banded))

    // warmup + equality assertion at the smallest SF
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      for ((_, w, hot) <- points) {
        val rows = impls.map(_._2(spark, warmDir, w, hot).collect().head)
        require(rows.forall(_ == rows.head),
          s"impl mismatch at width=$w hot=$hot: $rows")
      }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // equality at the bench SF too, once, before timing
    for ((pn, w, hot) <- points) {
      val rows = impls.map(_._2(spark, sfDir, w, hot).collect().head)
      require(rows.forall(_ == rows.head), s"impl mismatch at $pn: $rows")
    }
    val fields = (for ((pn, w, hot) <- points; (in, impl) <- impls) yield {
      val sec = (1 to 2).map(_ => time {
        impl(spark, sfDir, w, hot).queryExecution.toRdd.count(): Unit
      }).min
      f""""${pn}_$in":$sec%.3f"""
    }).mkString(",")

    // fact×dim point (q532's shape): every order's 30-day window over
    // the ≤5×months policy-revision dim — the shape where the
    // BROADCAST exec exists: merge shuffles+sorts the whole fact side,
    // broadcast leaves it in scan order. Same count() checksum both
    // ways, equality asserted before timing.
    def dimShape(bcast: Boolean): DataFrame = {
      val o = Fixtures.table(spark, sfDir, "orders")
      val facts = o.select(col("o_orderkey"), col("o_orderpriority"),
          col("o_orderdate"))
        .withColumn("win_hi", expr("timestampadd(DAY, 30, o_orderdate)"))
      val dim = o.where(col("o_totalprice") > 480000.0)
        .select(col("o_orderpriority").as("p_priority"),
          date_trunc("month", col("o_orderdate")).cast("timestamp_ntz")
            .as("policy_ts"))
        .distinct()
      graft.plans.RangeJoinOps.rangeJoin(facts, dim,
        Seq("o_orderpriority"), Seq("p_priority"),
        "o_orderdate", "win_hi", "policy_ts",
        leftOuter = true, broadcastHint = Some(bcast))
        .agg(count(lit(1)).as("n"), count(col("policy_ts")).as("m"))
    }
    require(dimShape(bcast = true).collect().head
      == dimShape(bcast = false).collect().head, "dim-shape impl mismatch")
    val dimFields = Seq(true, false).map { b =>
      val sec = (1 to 2).map(_ => time {
        dimShape(b).queryExecution.toRdd.count(): Unit
      }).min
      f""""dim30d_${if (b) "bcast" else "merge"}":$sec%.3f"""
    }.mkString(",")
    println(s"""{"metric":"range_join",$fields,$dimFields,"sf":"$sfDir"}""")
    spark.stop()
  }
}
