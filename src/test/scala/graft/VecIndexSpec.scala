package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Similarity, StandingVecIndex}

/** The persisted standing ANN index contract (q531): bootstrap writes
  * the (cell, sub)-bucketed member table plus the frozen codebook and
  * census; probes read them through the catalog. Pins:
  *
  *  - ARTIFACT PARITY: members/codebook/census row-equal the in-plan
  *    structures q474 computes per run;
  *  - FROZEN GEOMETRY: the census artifact carries exactly the s_bits
  *    the in-plan occupancy expression yields — the parameter ships
  *    with the index;
  *  - FRESH-SESSION PROBE: q531's gated output equals q474's in-plan
  *    output row-for-row, and the q531 plan read from a `newSession()`
  *    still resolves the artifacts through the shared catalog;
  *  - LAYOUT: with broadcast off, the (cell, sub) member join leaves
  *    the persisted side bucket-scanned (SelectedBucketsCount) and
  *    only the probe side exchanges on the join key.
  */
class VecIndexSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = GraftSession.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  private val sf = "/root/testdata/sf0.001"

  test("artifacts row-equal the in-plan member/codebook/census structures") {
    val arts = StandingVecIndex.ensure(spark, sf)
    val standing = Fixtures.table(spark, sf, "embeddings")
      .where(col("vec_id") % 10 >= 2)
    val censusGot = spark.table(arts.censusTable).collect()
    assert(censusGot.length === 1)
    val sBitsWant = standing
      .agg(count(lit(1)).as("n_stand"),
        countDistinct(col("label")).as("n_cells"))
      .select(expr(Similarity.subBitsExpr)).collect().head.getInt(0)
    assert(censusGot.head.getInt(0) === sBitsWant)

    val cbGot = spark.table(arts.codebookTable)
      .collect().map(r => (r.getInt(0),
        r.getSeq[Double](1).toList)).toSet
    val cbWant = Similarity.standingCodebook(spark, sf)
      .collect().map(r => (r.getInt(0),
        r.getSeq[Double](1).toList)).toSet
    assert(cbGot === cbWant)
    assert(cbGot.nonEmpty)

    val memGot = spark.table(arts.membersTable)
      .select(col("cell"), col("sub"), col("neighbor_id"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val memWant = standing
      .withColumn("s_bits", lit(sBitsWant))
      .select(col("label"),
        expr(Similarity.subcellSpark("embedding")).as("sub"),
        col("vec_id"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(memGot === memWant)
    assert(memGot.nonEmpty)
  }

  test("q531 through the artifacts == q474 in-plan, row-for-row; " +
    "fresh session resolves the artifacts") {
    val gated = SparkEntry.queries("q531_ann_persisted_index")(spark, sf)
      .collect().toSeq
    val inPlan = SparkEntry.queries("q474_ingest_ann_assign")(spark, sf)
      .collect().toSeq
    assert(gated === inPlan)
    assert(gated.nonEmpty)
    // a genuinely fresh session still reaches the artifacts
    val arts = StandingVecIndex.ensure(spark, sf)
    val s2 = spark.newSession()
    assert(s2.table(arts.membersTable).count() > 0)
    assert(s2.table(arts.codebookTable).count() > 0)
  }

  test("member join bucket-scans the persisted side; only the probe " +
    "side exchanges on (cell, sub)") {
    val arts = StandingVecIndex.ensure(spark, sf)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val census = s2.table(arts.censusTable)
      val probe = Fixtures.table(s2, sf, "embeddings")
        .where(col("vec_id") % 10 < 2)
        .crossJoin(census)
        .select(col("vec_id").as("query_id"),
          col("label").as("cell"),
          expr(Similarity.subcellSpark("embedding")).as("sub"))
        .join(s2.table(arts.membersTable), Seq("cell", "sub"))
        .select(col("query_id"), col("neighbor_id"))
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"),
        s"persisted member side should bucket-scan:\n$plan")
      val nExchanges = "Exchange hashpartitioning\\(cell".r
        .findAllIn(plan).length
      assert(nExchanges == 1,
        s"only the probe side may shuffle on (cell, sub), " +
          s"saw $nExchanges:\n$plan")
      assert(probe.count() > 0)
    } finally s2.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("q533 multi-probe recall is monotone in P and the member table " +
    "never exchanges at either P") {
    val df = SparkEntry.queries("q533_persisted_ann_multiprobe_recall")(
      spark, sf)
    // the member table is only ever read through its bucket layout —
    // no exchange whose child is the members scan, at P=1 or P=3 (the
    // two probe legs share one plan here)
    val plan = df.queryExecution.executedPlan.toString
    val memberScans = "graft_veccells".r.findAllIn(plan).length
    assert(memberScans >= 2, s"expected both probe legs in plan:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p1, p3) = (r.getDouble(3), r.getDouble(5))
      assert(p3 >= p1,
        s"recall must be monotone in P: query ${r.getLong(0)} " +
          s"has p1=$p1 > p3=$p3")
      assert(p1 >= 0.0 && p3 <= 1.0)
    }
    // probe sets nest, so hits nest too: p3 hits >= p1 hits per query
    assert(rows.map(_.getLong(4)).sum >= rows.map(_.getLong(2)).sum)
  }
}
