package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-4 statistics/chunking additions that the
  * oracle gate can't see: conservation laws (CDC chunks partition every
  * byte), definitional equivalence against a brute-force reference
  * (rank-sum AUC vs all-pairs AUC), and shape laws (survival curves are
  * monotone from 1.0; a power-iteration output is max-normalized).
  */
class StatOpsSpec extends SparkSpec {

  test("q166 CDC chunks conserve bytes: per-source total_bytes equals " +
    "the source's summed document length, and every doc yields a chunk") {
    val got = run("q166_cdc_chunking").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val want = Fixtures.table(spark, sf, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("bytes"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet === want.keySet)
    for ((src, (nDocs, bytes)) <- want) {
      val (nChunks, totalBytes) = got(src)
      assert(totalBytes === bytes, s"byte conservation broken for $src")
      assert(nChunks >= nDocs, s"fewer chunks than docs for $src")
    }
  }

  test("q170 rank-sum AUC equals the brute-force all-pairs AUC") {
    val rows = Fixtures.table(spark, sf, "documents")
      .select(col("n_chars"), (col("lang") === "en").as("pos"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val posS = rows.filter(_._2).map(_._1)
    val negS = rows.filterNot(_._2).map(_._1)
    var num = 0.0
    for (p <- posS; n <- negS)
      num += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
    val want = num / (posS.length.toDouble * negS.length)
    val r = run("q170_rank_auc").collect()(0)
    assert(r.getLong(0) === posS.length.toLong)
    assert(r.getLong(1) === negS.length.toLong)
    assert(math.abs(r.getDouble(2) - want) < 1e-9,
      s"rank AUC ${r.getDouble(2)} != brute force $want")
  }

  test("q254 histogram Mann-Whitney U equals the brute-force all-pairs " +
    "U with half-credit ties, per brand") {
    val rows = Fixtures.table(spark, sf, "lineitem")
      .join(Fixtures.table(spark, sf, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_quantity").cast("long"),
        (col("l_returnflag") === "R").as("isa"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val want = rows.groupBy(_._1).map { case (brand, rs) =>
      val a = rs.filter(_._3).map(_._2)
      val b = rs.filterNot(_._3).map(_._2)
      var u = 0.0
      for (x <- a; y <- b)
        u += (if (x > y) 1.0 else if (x == y) 0.5 else 0.0)
      brand -> (a.length.toLong, b.length.toLong, u)
    }
    val got = run("q254_mannwhitney").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (na, nb, u) = want(r.getString(0))
      assert(r.getLong(1) === na)
      assert(r.getLong(2) === nb)
      assert(math.abs(r.getDouble(3) - u) < 1e-6,
        s"${r.getString(0)}: U ${r.getDouble(3)} != brute force $u")
    }
  }

  test("q273 Shapley values satisfy efficiency: sum(phi) == v(full) - " +
    "v(empty)") {
    val got = run("q273_shapley_attribution").collect()
    assert(got.length === 4)
    val sumPhi = got.map(_.getDouble(1)).sum
    val vFull = got.head.getDouble(2)
    val vEmpty = got.head.getDouble(3)
    assert(math.abs(sumPhi - (vFull - vEmpty)) < 1e-8,
      s"sum(phi) $sumPhi != v_full - v_empty ${vFull - vEmpty}")
  }

  test("q159 survival is monotone non-increasing and starts at 1.0") {
    val rows = run("q159_survival").collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(math.abs(rows.head._2 - 1.0) < 1e-12,
      "survival at the minimum lifetime must be 1.0")
    rows.sliding(2).foreach {
      case Array((t0, s0), (t1, s1)) =>
        assert(s1 <= s0 + 1e-12, s"survival rose from t=$t0 to t=$t1")
      case _ =>
    }
  }

  test("q167 power-step output is max-normalized over all 64 dims") {
    val vs = run("q167_pca_power_step").collect().map(_.getDouble(1))
    assert(vs.length === 64)
    assert(math.abs(vs.map(math.abs).max - 1.0) < 1e-12)
  }

  test("q188 Theil decomposition sums: within + between == total " +
    "(up to the documented pico/nano quantization)") {
    val r = run("q188_theil_decomposition").collect().head
    val (total, within, between) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(total > 0.0, "length inequality should be nonzero")
    assert(within >= -1e-9 && between >= -1e-9,
      "Theil components are non-negative")
    // terms are pinned at 1e-9 per doc / 1e-12 per group; the identity
    // holds up to that quantization budget
    assert(math.abs(total - (within + between)) < 1e-6,
      s"decomposition broken: $total vs $within + $between")
  }

  test("q189 HHI lies in [1/n_nations, 1] for every region") {
    val rows = run("q189_market_hhi").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (region, n, hhi) =>
      assert(hhi >= 1.0 / n - 1e-9 && hhi <= 1.0 + 1e-9,
        s"$region: hhi $hhi outside [1/$n, 1]")
    }
  }

  test("q180 rendezvous hashing moves ~1/17 of keys on 16->17 growth; " +
    "mod-N moves an order of magnitude more") {
    val rows = run("q180_reshard_audit").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val (hrw, mod) = (rows("hrw"), rows("mod"))
    // theory: HRW moves 1/17 ~ 5.9% in expectation; mod moves 1 - 1/17
    // of residues ~ 94%. Wide tolerances: sf0.001 has 500 keys.
    assert(hrw < 0.15, s"HRW moved $hrw - should be near 1/17")
    assert(mod > 0.8, s"mod-N moved only $mod - should be near 16/17")
    assert(hrw < mod / 4,
      "rendezvous must beat mod-N by a wide margin or the audit lies")
  }

  test("q295 binned tau-b equals the brute-force pair count over the " +
    "same binned variables") {
    val row = run("q295_kendall_binned").collect().head
    // rebuild the binned pairs driver-side from the same definition
    val spend = Fixtures.table(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice")).as("spend"))
    val pts = Fixtures.table(spark, sf, "customer")
      .join(spend, col("c_custkey") === col("o_custkey"))
      .select(
        least(greatest(expr(
          "CAST(floor((c_acctbal + 1000.0) / 1100.0) AS BIGINT)"),
          lit(0L)), lit(9L)).as("bx"),
        least(greatest(expr(
          "CAST(floor(spend / 350000.0) AS BIGINT)"), lit(0L)),
          lit(19L)).as("by"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var conc = 0L; var disc = 0L; var tx = 0L; var ty = 0L
    for (i <- pts.indices; j <- (i + 1) until pts.length) {
      val ((x1, y1), (x2, y2)) = (pts(i), pts(j))
      val sx = java.lang.Long.signum(x2 - x1)
      val sy = java.lang.Long.signum(y2 - y1)
      if (sx != 0 && sy != 0) { if (sx == sy) conc += 1 else disc += 1 }
      if (sx == 0) tx += 1
      if (sy == 0) ty += 1
    }
    assert(row.getLong(1) === conc, "concordant")
    assert(row.getLong(2) === disc, "discordant")
    assert(row.getLong(3) === tx, "ties_x")
    assert(row.getLong(4) === ty, "ties_y")
    val n = pts.length.toLong
    val want = (conc - disc).toDouble / math.sqrt(
      (n * (n - 1) / 2 - tx).toDouble * (n * (n - 1) / 2 - ty))
    assert(math.abs(row.getDouble(5) - want) < 1e-9, "tau_b")
  }

  test("q351 one-step Newton update equals the driver-side closed form") {
    val row = run("q351_logit_newton_step").collect().head
    val pts = Fixtures.table(spark, sf, "lineitem")
      .select(expr("CAST(round(l_discount * 1e6) AS BIGINT)").as("x"),
        (col("l_returnflag") === "R").as("y"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val n = pts.length.toDouble
    val g0 = pts.count(_._2) - n / 2.0
    val g1 = pts.map { case (x, y) => x * ((if (y) 1.0 else 0.0) - 0.5) }
      .sum
    val h00 = n / 4.0
    val h01 = pts.map(_._1.toDouble).sum / 4.0
    val h11 = pts.map(p => p._1.toDouble * p._1).sum / 4.0
    val det = h00 * h11 - h01 * h01
    val b0 = (h11 * g0 - h01 * g1) / det
    val b1 = (h00 * g1 - h01 * g0) / det * 1e6
    assert(math.abs(row.getDouble(2) - b0) < 1e-6, "beta0")
    assert(math.abs(row.getDouble(3) - b1) < 1e-6, "beta1")
  }

  test("q349 order-statistic CI brackets the binned median per segment") {
    run("q349_median_ci").collect().foreach { r =>
      val (lo, med, hi) = (r.getLong(3), r.getLong(2), r.getLong(4))
      assert(lo <= med && med <= hi,
        s"CI [${lo}, ${hi}] must bracket the median $med " +
          s"for ${r.getString(0)}")
    }
  }

  test("q340 hub-attack invariants: surviving <= edges; isolation only " +
    "among non-hubs; rates in [0,1]") {
    val r = run("q340_hub_attack").collect().head
    val (nNodes, nEdges, nSurv) = (r.getLong(0), r.getLong(2),
      r.getLong(3))
    val (loss, nIso, isoRate) = (r.getDouble(4), r.getLong(5),
      r.getDouble(6))
    assert(nSurv <= nEdges)
    assert(nIso <= nNodes)
    assert(loss >= 0.0 && loss <= 1.0)
    assert(isoRate >= 0.0 && isoRate <= 1.0)
    assert(math.abs(loss - (1.0 - nSurv.toDouble / nEdges)) < 1e-8)
  }
}
