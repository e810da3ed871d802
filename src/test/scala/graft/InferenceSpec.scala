package graft

import org.apache.spark.sql.functions._

/** Brute-force equivalence checks for the round-10 inference wave —
  * laws the DuckDB oracle gate cannot see because both dialects share
  * each query's construction: the runs count equals a direct scan of
  * the day-ordered sign sequence, the Jonckheere J equals full
  * pair enumeration over raw orders, Somers' D equals the O(n²) pair
  * count over raw line items, RBO equals the direct formula on two
  * Scala-ranked lists, Kaplan–Meier survival equals the hand product
  * over distinct lifetimes, and Cook's summary equals a direct
  * per-point evaluation of the textbook formula.
  */
class InferenceSpec extends SparkSpec {

  private def day(col0: String) =
    expr(s"""timestampdiff(MICROSECOND,
      TIMESTAMP_NTZ '1970-01-01 00:00:00', $col0) div 86400000000""")

  test("q418 runs/median/z equal a direct scan of the day-ordered " +
    "sign sequence") {
    val daily = Fixtures.table(spark, sf, "events")
      .select(day("ts").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = daily.length
    val sortedC = daily.map(_._2).sorted
    val med = sortedC((n + 1) / 2 - 1)
    val signs = daily.map { case (d, c) => (d, c > med) }
    var switches = 0L
    for (i <- 1 until n)
      if (signs(i)._1 == signs(i - 1)._1 + 1
        && signs(i)._2 != signs(i - 1)._2) switches += 1
    val runs = switches + 1
    val n1 = signs.count(_._2).toLong
    val n2 = n - n1
    val ez = 1.0 + 2.0 * n1 * n2 / n.toDouble
    val vz = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) /
      (n.toDouble * n * (n - 1.0))
    val r = run("q418_runs_test").collect()(0)
    assert(r.getLong(0) === n.toLong)
    assert(r.getLong(1) === n1)
    assert(r.getLong(2) === n2)
    assert(r.getLong(3) === runs)
    assert(math.abs(r.getDouble(4) - (runs - ez) / math.sqrt(vz)) < 1e-5)
  }

  test("q420 Jonckheere J equals full pair enumeration over raw orders") {
    val rows = Fixtures.table(spark, sf, "orders")
      .select(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)")
          .as("g"),
        expr("CAST(round(o_totalprice) AS BIGINT) div 4000").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var twoJ = 0L
    for (i <- rows.indices; j <- rows.indices) {
      val (g1, v1) = rows(i); val (g2, v2) = rows(j)
      if (g1 < g2) {
        if (v1 < v2) twoJ += 2
        else if (v1 == v2) twoJ += 1
      }
    }
    val r = run("q420_jonckheere").collect()(0)
    assert(r.getLong(0) === rows.length.toLong)
    assert(math.abs(r.getDouble(1) - twoJ / 2.0) < 0.11,
      s"J ${r.getDouble(1)} != brute ${twoJ / 2.0}")
  }

  test("q423 Somers' D and gamma equal the O(n^2) pair count over " +
    "raw line items") {
    val rows = Fixtures.table(spark, sf, "lineitem")
      .select(expr("CAST(round(l_discount * 100.0) AS BIGINT)").as("x"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var c = 0L; var d = 0L; var ty = 0L
    for (i <- rows.indices; j <- (i + 1) until rows.length) {
      val (x1, y1) = rows(i); val (x2, y2) = rows(j)
      if (x1 != x2) {
        val (lo, hi) = if (x1 < x2) ((x1, y1), (x2, y2))
          else ((x2, y2), (x1, y1))
        if (lo._2 < hi._2) c += 1
        else if (lo._2 > hi._2) d += 1
        else ty += 1
      }
    }
    val r = run("q423_somers_d").collect()(0)
    assert(r.getDouble(1) === c.toDouble)
    assert(r.getDouble(2) === d.toDouble)
    assert(r.getDouble(3) === ty.toDouble)
    assert(math.abs(r.getDouble(4)
      - (c - d).toDouble / (c + d + ty)) < 1e-9)
    assert(math.abs(r.getDouble(5) - (c - d).toDouble / (c + d)) < 1e-9)
  }

  test("q431 RBO equals the direct formula on two Scala-ranked brand " +
    "lists") {
    val per = Fixtures.table(spark, sf, "lineitem")
      .join(broadcast(Fixtures.table(spark, sf, "part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100.0) AS BIGINT)"))
          .as("rev"),
        sum(expr("CAST(l_quantity AS BIGINT)")).as("vol"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byRev = per.sortBy(t => (-t._2, t._1)).map(_._1)
    val byVol = per.sortBy(t => (-t._3, t._1)).map(_._1)
    var rbo = 0.0
    var o5 = 0; var o10 = 0
    for (dd <- 1 to 20) {
      val ov = byRev.take(dd).toSet.intersect(byVol.take(dd).toSet).size
      rbo += math.pow(0.9, dd - 1.0) * ov / dd
      if (dd == 5) o5 = ov
      if (dd == 10) o10 = ov
    }
    val r = run("q431_rank_biased_overlap").collect()(0)
    assert(math.abs(r.getDouble(0) - rbo * 0.1) < 1e-6)
    assert(math.abs(r.getDouble(1) - o5 / 5.0) < 1e-9)
    assert(math.abs(r.getDouble(2) - o10 / 10.0) < 1e-9)
  }

  test("q435 Kaplan-Meier survival equals the hand product over " +
    "distinct lifetimes") {
    val users = Fixtures.table(spark, sf, "events")
      .select(day("ts").as("d"), col("user_id"))
      .groupBy(col("user_id"))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val dmax = users.map(_._2).max
    val lt = users.map { case (d0, d1) =>
      (d1 - d0, d1 > dmax - 7) } // (t, censored)
    def kmAt(h: Long): Double = {
      val times = lt.map(_._1).distinct.sorted.filter(_ <= h)
      var surv = 1.0
      for (t <- times) {
        val nRisk = lt.count(_._1 >= t)
        val d = lt.count(u => u._1 == t && !u._2)
        if (d > 0) surv *= 1.0 - d.toDouble / nRisk
      }
      surv
    }
    val rows = run("q435_kaplan_meier").collect()
    val byH = rows.map(r => r.getLong(0) -> r.getDouble(4)).toMap
    for (h <- Seq(7L, 14L, 30L))
      assert(math.abs(byH(h) - kmAt(h)) < 1e-6,
        s"KM($h) ${byH(h)} != brute ${kmAt(h)}")
  }

  test("q413 Cook's distance summary equals direct per-point " +
    "evaluation") {
    val cnt = Fixtures.table(spark, sf, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("y"))
    val pts = Fixtures.table(spark, sf, "customer")
      .join(cnt, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(expr("CAST(round(c_acctbal) AS BIGINT)").as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
      .collect().map(r => (r.getLong(0).toDouble, r.getLong(1).toDouble))
    val n = pts.length
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    val xbar = sx / n; val sxxc = sxx - sx * sx / n
    def e(p: (Double, Double)) = p._2 - icept - slope * p._1
    def h(p: (Double, Double)) =
      1.0 / n + (p._1 - xbar) * (p._1 - xbar) / sxxc
    val s2 = pts.map(p => e(p) * e(p)).sum / (n - 2.0)
    def dD(p: (Double, Double)) = e(p) * e(p) * h(p) /
      (2.0 * s2 * (1.0 - h(p)) * (1.0 - h(p)))
    val nInf = pts.count(p => dD(p) > 4.0 / n).toLong
    val maxD = pts.map(dD).max
    val meanD = pts.map(dD).sum / n
    val r = run("q413_cooks_distance").collect()(0)
    assert(r.getLong(0) === n.toLong)
    assert(r.getLong(1) === nInf)
    assert(math.abs(r.getDouble(3) - maxD) < 1e-5)
    assert(math.abs(r.getDouble(4) - meanD) < 1e-6)
  }

  test("q445 weekend stratum matches java.time Sat/Sun classification") {
    val perDay = Fixtures.table(spark, sf, "events")
      .select(day("ts").as("day"), col("event_type"))
      .groupBy(col("day"))
      .agg(sum(when(col("event_type") === "error", 1L).otherwise(0L))
        .as("errs"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    import java.time.{DayOfWeek, LocalDate}
    def isWkend(d: Long): Boolean = {
      val dow = LocalDate.ofEpochDay(d).getDayOfWeek
      dow == DayOfWeek.SATURDAY || dow == DayOfWeek.SUNDAY
    }
    val (we, wd) = perDay.partition(p => isWkend(p._1))
    val r = run("q445_rate_ratio").collect()(0)
    assert(r.getLong(0) === we.map(_._2).sum)
    assert(r.getLong(1) === we.length.toLong)
    assert(r.getLong(2) === wd.map(_._2).sum)
    assert(r.getLong(3) === wd.length.toLong)
    val rr = (we.map(_._2).sum.toDouble / we.length) /
      (wd.map(_._2).sum.toDouble / wd.length)
    assert(math.abs(r.getDouble(4) - rr) < 1e-6)
  }

  test("q442 effect sizes equal direct double evaluation (and the " +
    "DECIMAL SSB path carries no BIGINT intermediate to overflow)") {
    val rows = Fixtures.table(spark, sf, "orders")
      .select(col("o_orderpriority").as("g"),
        expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = rows.groupBy(_._1).map { case (g, vs) =>
      val ys = vs.map(_._2)
      (g, ys.length.toLong, ys.sum, ys.map(y => BigInt(y) * y).sum)
    }.toSeq
    val nt = groups.map(_._2).sum.toDouble
    val syt = groups.map(_._3).sum.toDouble
    val syyt = groups.map(_._4).sum.toDouble
    // same pinning as the query: round(sy^2/n) per group — computed in
    // doubles, never through an int64 (the overflow the fix removed)
    val ssbRaw = groups.map(g =>
      math.rint(g._3.toDouble * g._3 / g._2)).sum
    val k = groups.length.toDouble
    val ssb = ssbRaw - syt * syt / nt
    val sst = syyt - syt * syt / nt
    val mse = (sst - ssb) / (nt - k)
    val r = run("q442_effect_sizes").collect()(0)
    assert(r.getLong(0) === groups.length.toLong)
    assert(r.getLong(1) === nt.toLong)
    assert(math.abs(r.getDouble(2) - ssb / sst) < 1e-6)
    assert(math.abs(r.getDouble(3)
      - (ssb - (k - 1.0) * mse) / (sst + mse)) < 1e-6)
  }
}
