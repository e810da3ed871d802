package graft

import org.apache.spark.sql.functions._

/** Brute-force equivalence checks for the round-11 planning wave —
  * laws the DuckDB oracle cannot see because both dialects share each
  * query's construction: Welch's F equals the textbook formula over
  * collected group stats, the Cochran–Armitage z equals the direct
  * contingency computation, Taylor's exponent equals a from-scratch
  * log-log OLS, the BY rejection set obeys the step-up definition
  * against directly computed p-values, and the Bloom audit's observed
  * FP rate equals a hand-built bit-set simulation.
  */
class PlanningSpec extends SparkSpec {

  test("q447 Welch F equals the textbook formula over collected " +
    "group moments") {
    val rows = Fixtures.table(spark, sf, "orders")
      .select(col("o_orderpriority").as("g"),
        expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val gs = rows.groupBy(_._1).values.map { vs =>
      val ys = vs.map(_._2.toDouble)
      val n = ys.length
      val m = ys.sum / n
      val s2 = ys.map(y => (y - m) * (y - m)).sum / (n - 1)
      (n.toDouble, m, s2)
    }.toSeq
    val k = gs.length
    val w = gs.map { case (n, _, s2) => n / s2 }
    val bw = w.sum
    val mw = gs.zip(w).map { case ((_, m, _), wi) => wi * m }.sum / bw
    val a = gs.zip(w).map { case ((_, m, _), wi) =>
      wi * (m - mw) * (m - mw) }.sum / (k - 1)
    val bs = gs.zip(w).map { case ((n, _, _), wi) =>
      (1.0 - wi / bw) * (1.0 - wi / bw) / (n - 1.0) }.sum
    val f = a / (1.0 + 2.0 * (k - 2.0) / (k.toDouble * k - 1.0) * bs)
    val df2 = (k.toDouble * k - 1.0) / (3.0 * bs)
    val r = run("q447_welch_anova").collect()(0)
    assert(r.getLong(0) === k.toLong)
    assert(math.abs(r.getDouble(2) - f) < 1e-3,
      s"F ${r.getDouble(2)} != brute $f")
    assert(math.abs(r.getDouble(4) - df2) / df2 < 1e-3)
  }

  test("q453 Cochran-Armitage z equals the direct computation") {
    val rows = Fixtures.table(spark, sf, "lineitem")
      .select(expr("CAST(round(l_discount * 100.0) AS BIGINT)").as("w"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = rows.length.toDouble
    val rr = rows.map(_._2).sum.toDouble
    val p = rr / n
    val t = rows.map { case (w, r) => w * r }.sum.toDouble
    val sw = rows.map(_._1).sum.toDouble
    val sw2 = rows.map { case (w, _) => w * w }.sum.toDouble
    val z = (t - p * sw) / math.sqrt(p * (1 - p) * (sw2 - sw * sw / n))
    val r = run("q453_cochran_armitage").collect()(0)
    assert(r.getLong(0) === rows.length.toLong)
    assert(math.abs(r.getDouble(2) - z) < 1e-4,
      s"z ${r.getDouble(2)} != brute $z")
  }

  test("q457 Taylor exponent equals a from-scratch log-log OLS over " +
    "per-brand daily moments") {
    val bd = Fixtures.table(spark, sf, "lineitem")
      .join(broadcast(Fixtures.table(spark, sf, "part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), expr("CAST(l_shipdate AS DATE)").as("d"))
      .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val pts = bd.groupBy(_._1).values.flatMap { vs =>
      val qs = vs.map(_._2.toDouble)
      val nd = qs.length
      if (nd < 2) None
      else {
        val m = qs.sum / nd
        val v = qs.map(q => (q - m) * (q - m)).sum / (nd - 1)
        if (v > 0) Some((math.log(m), math.log(v))) else None
      }
    }.toSeq
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val r = run("q457_taylor_power_law").collect()(0)
    assert(r.getLong(0) === pts.length.toLong)
    assert(math.abs(r.getDouble(1) - slope) < 1e-4,
      s"b ${r.getDouble(1)} != brute $slope")
  }

  test("q458 BY rejection set obeys the step-up definition and is a " +
    "subset of BH's") {
    val rows = run("q458_benjamini_yekutieli").collect()
    val m = rows.length
    val c = (1 to m).map(1e9 / _).map(math.round(_).toDouble).sum / 1e9
    val ps = rows.map(_.getDouble(2)) // ordered by p
    assert(ps.sorted.sameElements(ps))
    val bhSet = rows.filter(_.getBoolean(3)).map(_.getString(0)).toSet
    val bySet = rows.filter(_.getBoolean(4)).map(_.getString(0)).toSet
    assert(bySet.subsetOf(bhSet), "BY must be more conservative than BH")
    // step-up law: rejected = a prefix of the p-ordered list
    val byFlags = rows.map(_.getBoolean(4))
    assert(!byFlags.dropWhile(identity).contains(true))
    val bhFlags = rows.map(_.getBoolean(3))
    assert(!bhFlags.dropWhile(identity).contains(true))
    // the BY cut uses c(m): every rejected row satisfies p <= i*alpha/(m*c)
    rows.zipWithIndex.foreach { case (r, idx) =>
      if (r.getBoolean(4)) {
        val iMaxOk = rows.zipWithIndex.exists { case (r2, j) =>
          r2.getDouble(2) <= (j + 1) * 0.05 / (m * c) + 1e-12 && j >= idx
        }
        assert(iMaxOk, s"row $idx BY-rejected without a covering i")
      }
    }
  }

  test("q459 unweighted-means two-way F values equal the textbook " +
    "cell-mean computation") {
    val rows = Fixtures.table(spark, sf, "orders")
      .join(broadcast(Fixtures.table(spark, sf, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderpriority"), col("c_mktsegment"),
        expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").as("y"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getLong(2).toDouble))
    val cells = rows.groupBy(_._1).map { case (k, vs) =>
      val ys = vs.map(_._2)
      val n = ys.length; val m = ys.sum / n
      (k._1, k._2, n, m, ys.map(y => (y - m) * (y - m)).sum)
    }.toSeq
    val p = cells.map(_._1).distinct.length
    val q = cells.map(_._2).distinct.length
    val nc = cells.length
    val nh = nc / cells.map(1.0 / _._3).sum
    val u = cells.map(_._4).sum / nc
    val ua = cells.groupBy(_._1).map(_._2.map(_._4).sum / q)
    val ub = cells.groupBy(_._2).map(_._2.map(_._4).sum / p)
    val ssa = nh * q * ua.map(x => (x - u) * (x - u)).sum
    val ssb = nh * p * ub.map(x => (x - u) * (x - u)).sum
    val uaM = cells.groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._4).sum / q }
    val ubM = cells.groupBy(_._2)
      .map { case (k, v) => k -> v.map(_._4).sum / p }
    val ssab = nh * cells.map(c =>
      math.pow(c._4 - uaM(c._1) - ubM(c._2) + u, 2)).sum
    val nt = cells.map(_._3).sum
    val mse = cells.map(_._5).sum / (nt - nc)
    val fs = Map(
      "priority" -> ssa / (p - 1) / mse,
      "segment" -> ssb / (q - 1) / mse,
      "interaction" -> ssab / ((p - 1) * (q - 1)) / mse)
    val got = run("q459_two_way_anova").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    fs.foreach { case (k, f) =>
      assert(math.abs(got(k) - f) / math.max(f, 1e-9) < 1e-2,
        s"$k F ${got(k)} != brute $f")
    }
  }

  test("q462 Granger F equals direct restricted/unrestricted OLS over " +
    "collected daily pairs") {
    val daily = Fixtures.table(spark, sf, "events")
      .select(expr("""timestampdiff(MICROSECOND,
        TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000""")
        .as("day"), col("event_type"))
      .groupBy(col("day"))
      .agg(sum(when(col("event_type") === "purchase", 1L)
        .otherwise(0L)).as("y"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val byDay = daily.map(d => d._1 -> (d._2, d._3)).toMap
    val pairs = daily.flatMap { case (d, y, _) =>
      byDay.get(d - 1).map { case (yl, xl) =>
        (y.toDouble, yl.toDouble, xl.toDouble) }
    }
    def rss(preds: Seq[Array[Double]], ys: Seq[Double]): Double = {
      // normal equations for up to 2 predictors + intercept, by hand
      val n = ys.length.toDouble
      val k = preds.head.length
      if (k == 1) {
        val x = preds.map(_(0))
        val sxy =
          x.zip(ys).map(p => p._1 * p._2).sum - x.sum * ys.sum / n
        val sxx = x.map(v => v * v).sum - x.sum * x.sum / n
        val syy = ys.map(v => v * v).sum - ys.sum * ys.sum / n
        syy - sxy * sxy / sxx
      } else {
        val x1 = preds.map(_(0)); val x2 = preds.map(_(1))
        val c11 = x1.map(v => v * v).sum - x1.sum * x1.sum / n
        val c22 = x2.map(v => v * v).sum - x2.sum * x2.sum / n
        val c12 =
          x1.zip(x2).map(p => p._1 * p._2).sum - x1.sum * x2.sum / n
        val c1y =
          x1.zip(ys).map(p => p._1 * p._2).sum - x1.sum * ys.sum / n
        val c2y =
          x2.zip(ys).map(p => p._1 * p._2).sum - x2.sum * ys.sum / n
        val syy = ys.map(v => v * v).sum - ys.sum * ys.sum / n
        syy - (c22 * c1y * c1y - 2 * c12 * c1y * c2y
          + c11 * c2y * c2y) / (c11 * c22 - c12 * c12)
      }
    }
    val ys = pairs.map(_._1)
    val rssR = rss(pairs.map(p => Array(p._2)), ys)
    val rssU = rss(pairs.map(p => Array(p._2, p._3)), ys)
    val f = (rssR - rssU) / (rssU / (pairs.length - 3.0))
    val r = run("q462_granger_one_lag").collect()(0)
    assert(r.getLong(0) === pairs.length.toLong)
    assert(math.abs(r.getDouble(3) - f) < 1e-3,
      s"F ${r.getDouble(3)} != brute $f")
  }

  test("q450 Bloom observed FP equals a hand-built bit-set simulation") {
    import graft.ops.Portable.h32Spark
    val m = 4096
    val build = Fixtures.table(spark, sf, "orders")
      .select(col("o_custkey")).distinct()
      .collect().map(_.getLong(0)).toSet
    val probe = Fixtures.table(spark, sf, "customer")
      .select(col("c_custkey")).collect().map(_.getLong(0))
      .filterNot(build.contains)
    // replicate the md5-based positions via one Spark round-trip so the
    // hash contract stays the single Portable definition
    val allKeys = (build.toSeq ++ probe).distinct
    val hdf = spark.createDataFrame(allKeys.map(Tuple1(_))).toDF("k")
      .select(col("k"),
        expr(s"${h32Spark("concat('bf1_', k)")} % $m").as("b1"),
        expr(s"${h32Spark("concat('bf2_', k)")} % $m").as("b2"),
        expr(s"${h32Spark("concat('bf3_', k)")} % $m").as("b3"))
      .collect().map(r => r.getLong(0)
        -> Set(r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val bits = build.flatMap(hdf)
    val fp = probe.count(k => hdf(k).subsetOf(bits))
    val r = run("q450_bloom_prefilter_audit").collect()(0)
    assert(r.getLong(0) === build.size.toLong)
    assert(r.getLong(4) === probe.length.toLong)
    val expected =
      if (probe.isEmpty) 0.0 else fp.toDouble / probe.length
    assert(math.abs(r.getDouble(5) - expected) < 1e-9)
  }
}
