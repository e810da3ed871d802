package graft

import org.apache.spark.sql.functions._

/** Dedup-family invariants beyond the oracle gate: the component
  * labeling used by q49 on synthetic graphs with known answers, and the
  * df-cap contract of q48.
  */
class DedupSpec extends SparkSpec {

  private def pairs(ps: (Long, Long)*) = {
    import spark.implicits._
    ps.toDF("a", "b")
  }

  private def labelsOf(ps: (Long, Long)*): Map[Long, Long] =
    graft.ops.Dedup.connectedComponents(pairs(ps: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("connectedComponents labels a chain with its min id " +
    "(multi-round propagation)") {
    // diameter 4: labels need several rounds to reach the tail
    val got = labelsOf((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("connectedComponents keeps disjoint components separate") {
    val got = labelsOf((10L, 11L), (20L, 21L), (21L, 22L), (30L, 31L))
    assert(got === Map(
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 30L))
  }

  test("connectedComponents handles a star and edge order/direction") {
    // hub presented as the larger id on some edges: direction must not
    // matter, and the min label must win regardless
    val got = labelsOf((7L, 3L), (3L, 8L), (9L, 3L))
    assert(got === Map(3L -> 3L, 7L -> 3L, 8L -> 3L, 9L -> 3L))
  }

  test("large-star/small-star labels equal propagation labels on " +
    "chains, disjoint components, stars, and the real near-dup graph") {
    val cases = Seq(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)),
      Seq((10L, 11L), (20L, 21L), (21L, 22L), (30L, 31L)),
      Seq((7L, 3L), (3L, 8L), (9L, 3L)))
    cases.foreach { ps =>
      val star = graft.ops.Dedup.connectedComponentsStar(pairs(ps: _*))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star === labelsOf(ps: _*), s"star labels diverge on $ps")
    }
    // the real graph q49 runs on: both algorithms, identical labeling
    val real = graft.ops.Dedup.jaccardPairs(spark, sf, 0.8)
      .select(col("doc_a"), col("doc_b"))
    val wantReal = graft.ops.Dedup.connectedComponents(real)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotReal = graft.ops.Dedup.connectedComponentsStar(real)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotReal === wantReal)
    assert(gotReal.nonEmpty)
  }

  test("large-star/small-star converges in strictly fewer rounds than " +
    "propagation on a chain (the high-diameter case it exists for)") {
    val chain = (0L until 32L).sliding(2).map(w => (w(0), w(1))).toSeq
    val (starLabels, starRounds) =
      graft.ops.Dedup.connectedComponentsStarWithRounds(pairs(chain: _*))
    val got = starLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (0L until 32L).map(_ -> 0L).toMap)
    // propagation moves labels one hop per round: a 32-node chain needs
    // ~diameter rounds; the star transform contracts in ~log rounds
    assert(starRounds <= 8,
      s"star took $starRounds rounds on a 32-chain — expected O(log n)")
  }

  test("q49 cluster sizes are consistent and include a chained cluster " +
    "the greedy q39 rule cannot represent") {
    val rows = run("q49_dedup_components").collect()
    assert(rows.nonEmpty)
    // cluster_size really is the member count of cluster_id
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (_, members) =>
      members.foreach(r => assert(r.getLong(2) === members.length.toLong))
    }
    // every cluster's id is its min member (canonicalization contract)
    byCluster.foreach { case (cid, members) =>
      assert(cid === members.map(_.getLong(0)).min)
    }
  }

  test("q48 df-cap: no shingle above the cap survives into the join " +
    "(bounded posting lists by construction)") {
    val inv = graft.ops.Dedup.inverted(spark, sf)
    val hot = inv.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .where(col("df") > 25).count()
    // the fixture genuinely has hot shingles at this cap OR none; either
    // way the capped query must agree with the oracle (gate) — here we
    // assert the query still finds the planted near-dup pairs
    val capped = run("q48_jaccard_dfcap").collect()
    val exact = run("q20_ngram_jaccard").collect()
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      exact.map(r => (r.getLong(0), r.getLong(1))).toSet,
      s"df-cap (hot=$hot) changed the detected pair set at fixture scale")
  }

  test("q76 prefix filtering is lossless: identical result set and " +
    "scores to the exhaustive q20 join") {
    val sf = "/root/testdata/sf0.001"
    def rows(q: String) = SparkEntry.queries(q)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = rows("q20_ngram_jaccard")
    val prefix = rows("q76_prefix_jaccard")
    assert(prefix === exact,
      "prefix-filtered candidates must recover every qualifying pair")
    assert(exact.nonEmpty)
  }

  test("q151 repeated spans agree with an independent driver-side " +
    "recomputation (span set, doc counts, example docs)") {
    // independent formulation: Scala sliding windows over collected
    // docs — none of the Spark-side transform/sequence/slice machinery
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .flatMap { r =>
        val parts = r.getString(1).split(" ", -1) // keep trailing empties,
        // matching Spark's split semantics
        if (parts.length >= 8)
          parts.sliding(8).map(w => (w.mkString(" "), r.getLong(0))).toSet
        else Set.empty[(String, Long)]
      }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      .collect { case (span, ids) if ids.length >= 2 =>
        (span, ids.length.toLong, ids.min, ids.max)
      }.toSet
    val got = run("q151_repeated_spans").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got === expected)
    // span_key really is md5(span), the map-side shuffle key
    val md = run("q151_repeated_spans").collect().map { r =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(r.getString(1).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (r.getString(0), d)
    }
    md.foreach { case (key, recomputed) => assert(key === recomputed) }
  }

  test("q150 threshold sensitivity is consistent with q20: the 0.8 " +
    "count equals q20's pair count and counts are monotone in tau") {
    val row = run("q150_threshold_sensitivity").collect().head
    val (p07, p08, p09) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(p09 <= p08 && p08 <= p07, "pair counts must shrink as tau rises")
    assert(p08 === run("q20_ngram_jaccard").count(),
      "one-pass conditional count must match the dedicated 0.8 query")
  }

  test("q154 span strip matches an independent driver-side " +
    "recomputation of the remove-all-but-one rule") {
    val raw = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    // all window occurrences per doc (positions 1-based)
    val inst = raw.toSeq.flatMap { case (id, p) =>
      if (p.length >= 8)
        (1 to p.length - 7).map(i => (id, i, p.slice(i - 1, i + 7)
          .mkString(" ")))
      else Seq.empty
    }
    val owners = inst.groupBy(_._3).view
      .mapValues(_.map(_._1).distinct).toMap
      .collect { case (span, ids) if ids.size >= 2 => span -> ids.min }
    val expected = raw.map { case (id, p) =>
      val covered = inst.collect {
        case (d, i, span) if d == id &&
          owners.get(span).exists(_ != id) => i until i + 8
      }.flatten.toSet
      val keptToks = p.indices.collect {
        case j if !covered.contains(j + 1) => p(j)
      }
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(keptToks.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      id -> (p.length.toLong, covered.size.toLong,
        (p.length - covered.size).toLong, md)
    }
    val got = run("q154_span_strip").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got === expected)
  }

  test("q156 leakage matrix partitions q20's pairs exactly and only " +
    "off-diagonal cells are flagged") {
    val cells = run("q156_split_leakage").collect()
    assert(cells.map(_.getLong(2)).sum === run("q20_ngram_jaccard").count(),
      "every near-dup pair lands in exactly one split x split cell")
    cells.foreach { r =>
      assert(r.getBoolean(5) === (r.getString(0) != r.getString(1)))
    }
  }

  test("q157 spectrum conserves the distinct-shingle count and bounds " +
    "each bucket's max_df") {
    val spec = run("q157_df_spectrum").collect()
    val distinctShingles = graft.ops.Dedup.inverted(spark, sf)
      .select("h").distinct().count()
    assert(spec.map(_.getLong(2)).sum === distinctShingles)
    spec.foreach { r =>
      val (k, lo, maxDf) = (r.getLong(0), r.getLong(1), r.getLong(3))
      assert(lo === (1L << k))
      assert(maxDf >= lo && maxDf < 2 * lo,
        s"bucket $k: max_df $maxDf outside [2^$k, 2^${k + 1})")
    }
  }

  test("q152 template strip applies exactly q148's detection and " +
    "conserves char counts") {
    val stripped = run("q152_template_strip").collect()
    val nStripped = stripped.count(_.getBoolean(2))
    val detected = run("q148_template_prefixes").collect()
      .map(_.getLong(1)).sum // sum of group sizes = docs in a template
    assert(nStripped.toLong === detected,
      "every doc in a detected template group is stripped, no others")
    stripped.foreach { r =>
      val (before, after) = (r.getLong(3), r.getLong(4))
      if (r.getBoolean(2))
        assert(after <= math.max(0L, before - 128L),
          s"doc ${r.getLong(0)}: strip must remove the 128-char template")
      else assert(after === before)
    }
  }
}
