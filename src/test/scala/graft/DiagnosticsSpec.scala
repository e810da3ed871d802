package graft

import org.apache.spark.sql.functions._

/** Brute-force equivalence and invariant checks for the round-9
  * diagnostics wave — laws the DuckDB oracle gate cannot see because
  * both dialects share each query's construction: the binned Theil–Sen
  * weighted median equals a direct enumeration over the same cells, the
  * signed-rank statistic equals a from-scratch average-tie ranking, the
  * clustering-coefficient histogram equals adjacency-set counting, the
  * ANOVA F equals the textbook two-pass formula, average precision
  * equals the sequential scan definition, and the dHash histogram
  * equals an independently-recomputed signature set.
  */
class DiagnosticsSpec extends SparkSpec {

  test("q362 binned Theil-Sen slope equals the brute-force weighted " +
    "median over the same grid cells") {
    val spend = Fixtures.table(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
        .cast("double").as("spend"))
    val cells = Fixtures.table(spark, sf, "customer")
      .join(spend, col("c_custkey") === col("o_custkey"))
      .select(
        least(greatest(expr(
          "CAST(floor((c_acctbal + 1000.0) / 1100.0) AS BIGINT)"),
          lit(0L)), lit(9L)).as("bx"),
        least(greatest(expr(
          "CAST(floor(spend / 350000.0) AS BIGINT)"),
          lit(0L)), lit(19L)).as("by"))
      .groupBy(col("bx"), col("by")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val slopes = for {
      (ax, ay, na) <- cells
      (cx, cy, nb) <- cells
      if cx > ax
    } yield (math.round((cy - ay) * 350000.0 / ((cx - ax) * 1100.0)
      * 1e6), na * nb, ax, ay, cx, cy)
    val sorted = slopes.sortBy(t => (t._1, t._3, t._4, t._5, t._6))
    val w = sorted.map(_._2).sum
    var cum = 0L
    val med = sorted.find { t => cum += t._2; 2 * cum >= w }.get._1
    val r = run("q362_theil_sen").collect()(0)
    assert(r.getLong(0) === slopes.length.toLong)
    assert(r.getLong(1) === w)
    assert(math.abs(r.getDouble(2) - med / 1e6) < 1e-9,
      s"theil-sen ${r.getDouble(2)} != brute force ${med / 1e6}")
  }

  test("q364 signed-rank W+/W-/z equal a from-scratch average-tie " +
    "ranking of the per-user deltas") {
    val ev = Fixtures.table(spark, sf, "events")
      .select(col("user_id"),
        expr("""timestampdiff(MICROSECOND,
          TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000""")
          .as("day"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val d0 = ev.map(_._2).min
    val dd = ev.groupBy(_._1).flatMap { case (_, rows) =>
      val (pre, post) = rows.partition(_._2 - d0 < 15)
      if (pre.isEmpty || post.isEmpty) None
      else {
        val d = math.round((post.map(_._3).sum / post.size
          - pre.map(_._3).sum / pre.size) * 1e6)
        if (d == 0) None else Some(d)
      }
    }.toSeq
    val byAbs = dd.groupBy(math.abs).toSeq.sortBy(_._1)
    var cumLess = 0L
    val r2 = byAbs.map { case (a, g) =>
      val v = (a, 2L * cumLess + g.size + 1)
      cumLess += g.size
      v
    }.toMap
    val w2p = dd.filter(_ > 0).map(d => r2(math.abs(d))).sum
    val n = dd.size.toLong
    val tsum = byAbs.map { case (_, g) =>
      g.size.toLong * g.size * g.size - g.size
    }.sum
    val z = (w2p / 2.0 - n * (n + 1) / 4.0) /
      math.sqrt(n * (n + 1) * (2 * n + 1) / 24.0 - tsum / 48.0)
    val r = run("q364_signed_rank").collect()(0)
    assert(r.getLong(0) === n)
    assert(math.abs(r.getDouble(1) - w2p / 2.0) < 1e-6)
    assert(math.abs(r.getDouble(3) - z) < 1e-5,
      s"z ${r.getDouble(3)} != brute force $z")
  }

  test("q373 clustering-coefficient histogram equals adjacency-set " +
    "counting on the same co-purchase graph") {
    val pairs = Fixtures.table(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
      .groupBy(col("o")).agg(collect_set(col("p")).as("ps"))
      .select(explode(expr(
        """flatten(transform(array_sort(ps), (x, i) ->
             transform(slice(array_sort(ps), i + 2, size(ps)),
               y -> struct(x AS a, y AS b))))""")).as("e"))
      .select(col("e.a"), col("e.b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
      .where(col("c") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.Set[Long]]
    for ((a, b) <- pairs) {
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val hist = scala.collection.mutable.Map.empty[Long, Long]
    for ((n, nbrs) <- adj if nbrs.size >= 2) {
      val ns = nbrs.toSeq
      var t = 0L
      for (i <- ns.indices; j <- (i + 1) until ns.size
           if adj(ns(i)).contains(ns(j))) t += 1
      val d = nbrs.size.toLong
      val bin = math.min(9L, (20 * t) / (d * (d - 1)))
      hist(bin) = hist.getOrElse(bin, 0L) + 1
    }
    val got = run("q373_local_clustering").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === hist.toMap,
      s"decile histogram $got != brute force $hist")
  }

  test("q358 ANOVA F equals the textbook two-pass computation") {
    val rows = Fixtures.table(spark, sf, "orders")
      .select(col("o_orderpriority"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val gmean = rows.map(_._2).sum / rows.length
    val d = rows.map { case (g, v) => (g, math.round(v - gmean)) }
    val groups = d.groupBy(_._1).values.toSeq
    val k = groups.size
    val n = d.length
    val ssb = groups.map { g =>
      val m = g.map(_._2).sum.toDouble / g.size
      g.size * m * m
    }.sum - math.pow(d.map(_._2).sum.toDouble, 2) / n
    val ssw = groups.map { g =>
      val m = g.map(_._2).sum.toDouble / g.size
      g.map(r => (r._2 - m) * (r._2 - m)).sum
    }.sum
    val want = (ssb / (k - 1)) / (ssw / (n - k))
    val r = run("q358_anova_f").collect()(0)
    assert(r.getLong(0) === k.toLong)
    assert(r.getLong(1) === n.toLong)
    assert(math.abs(r.getDouble(2) - want) / want < 1e-6,
      s"F ${r.getDouble(2)} != brute force $want")
  }

  test("q380 average precision equals the sequential-scan definition " +
    "(sf0.01, where the ranking exceeds 100 rows)") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = Fixtures.table(spark, sf01, "documents")
      .select(col("n_chars"), col("doc_id"), (col("lang") === "en"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(t => (-t._1, t._2))
    var cum = 0L
    var ap = 0L
    var relAt100 = 0L
    rows.zipWithIndex.foreach { case ((_, _, rel), i) =>
      if (rel) { cum += 1; ap += math.round(cum * 1e9 / (i + 1)) }
      if (i + 1 == 100) relAt100 = cum
    }
    val nPos = rows.count(_._3).toLong
    val r = SparkEntry.queries("q380_avg_precision")(spark, sf01)
      .collect()(0)
    assert(r.getLong(0) === nPos)
    assert(math.abs(r.getDouble(2) - ap.toDouble / nPos / 1e9) < 1e-6)
    assert(math.abs(r.getDouble(3) - relAt100 / 100.0) < 1e-9)
  }

  test("q382 dHash histogram equals independently recomputed " +
    "signatures with all-pairs banded hamming") {
    val texts = Fixtures.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def sig(text: String): Long = {
      val bytes = text.getBytes("UTF-8")
      val n = bytes.length
      val cells = new Array[Long](63)
      for (k <- 0 until 63) {
        val s0 = (k.toLong * n / 63).toInt
        val e0 = ((k + 1).toLong * n / 63).toInt
        if (e0 > s0)
          cells(k) = (s0 until e0).map(bytes(_) & 0xff).sum.toLong /
            (e0 - s0)
      }
      (0 until 56).foldLeft(0L) { (h, i) =>
        val r = i / 8
        val c = i % 8
        if (cells(r * 9 + c + 1) > cells(r * 9 + c)) h | (1L << i)
        else h
      }
    }
    val sigs = texts.map { case (id, t) => (id, sig(t)) }
    val hist = scala.collection.mutable.Map.empty[Long, Long]
    for (i <- sigs.indices; j <- (i + 1) until sigs.length) {
      val (ia, ha) = sigs(i)
      val (ib, hb) = sigs(j)
      val shareBand = (0 until 7).exists(b =>
        ((ha >> (8 * b)) & 255) == ((hb >> (8 * b)) & 255))
      val ham = java.lang.Long.bitCount(ha ^ hb).toLong
      if (shareBand && ham <= 12 && ia != ib)
        hist(ham) = hist.getOrElse(ham, 0L) + 1
    }
    val got = run("q382_dhash_neardup").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === hist.toMap,
      s"dhash histogram $got != brute force $hist")
  }
}
