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
