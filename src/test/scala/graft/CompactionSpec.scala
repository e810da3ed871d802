package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, StandingIndex}

/** The standing-index COMPACTION contract (q529): a partial bootstrap
  * plus a [[StandingIndex.compactInto]] append wave must behave
  * exactly like a one-shot bootstrap over the union corpus. Pins:
  *
  *  - ROW PARITY: the compacted band and posting tables equal the
  *    in-plan band/posting build over the full % 10 >= 2 corpus (the
  *    same reference PersistedIndexSpec uses for the one-shot index);
  *  - IMMUTABILITY: appending adds new bucket files; every bootstrap
  *    data file is still present and byte-identical in length after
  *    the append (compaction never rewrites the corpus);
  *  - LAYOUT SURVIVAL: after the append, a probe against the
  *    compacted band table still bucket-scans the persisted side
  *    (SelectedBucketsCount) and only the batch side exchanges —
  *    appended files carry bucket ids, so pruning spans generations;
  *  - FRESH-SESSION READ: a `newSession()` sees the compacted tables
  *    through the shared catalog, including the appended rows;
  *  - LIVENESS: the q529 gate output has n_cand_appended > 0 rows —
  *    the appended generation contributes real candidates, the index
  *    isn't just structurally grown.
  */
class CompactionSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = GraftSession.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  private val sf = "/root/testdata/sf0.001"

  private def dataFiles(table: String): Map[String, Long] = {
    val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $table")
      .where(col("col_name") === "Location")
      .collect().head.getString(1).stripPrefix("file:")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(loc))
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.length()).toMap
  }

  test("partial bootstrap + append == one-shot bootstrap, with corpus " +
    "files untouched and appended files bucketed") {
    // build the two generations by hand (not via ensureCompacted) so
    // the file listing can be captured between the two phases
    val arts = StandingIndex.bootstrapWhere(spark, sf, "_spec",
      "doc_id % 10 >= 2 AND doc_id % 10 <= 7")
    val bandFiles0 = dataFiles(arts.bandsTable)
    val postFiles0 = dataFiles(arts.postingsTable)
    StandingIndex.compactInto(spark, arts,
      Dedup.inverted(spark, sf).where(expr("doc_id % 10 >= 8")))
    val bandFiles1 = dataFiles(arts.bandsTable)
    val postFiles1 = dataFiles(arts.postingsTable)

    // immutability: every bootstrap file survives the append unchanged
    bandFiles0.foreach { case (p, len) =>
      assert(bandFiles1.get(p).contains(len), s"bootstrap band file $p " +
        "was rewritten or removed by the append")
    }
    postFiles0.foreach { case (p, len) =>
      assert(postFiles1.get(p).contains(len), s"bootstrap posting file " +
        s"$p was rewritten or removed by the append")
    }
    assert(bandFiles1.size > bandFiles0.size)
    assert(postFiles1.size > postFiles0.size)

    // row parity vs the in-plan union-corpus build
    val bandsGot = spark.table(arts.bandsTable)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val bandsWant = Dedup.minhashBands(
      Dedup.inverted(spark, sf).where(expr("doc_id % 10 >= 2")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(bandsGot === bandsWant)
    val postGot = spark.table(arts.postingsTable)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val postWant = Dedup.inverted(spark, sf)
      .where(expr("doc_id % 10 >= 2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(postGot === postWant)
    // both generations are actually present
    assert(bandsGot.exists(_._1 % 10 >= 8))
    assert(bandsGot.exists(t => t._1 % 10 >= 2 && t._1 % 10 <= 7))
  }

  test("post-append probe still bucket-scans the persisted side in a " +
    "fresh session; only the batch side exchanges") {
    val arts = StandingIndex.ensureCompacted(spark, sf)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val batch = Dedup.minhashBands(
        Dedup.inverted(s2, sf).where(expr("doc_id % 10 < 2")))
        .select(col("doc_id").as("doc_new"), col("band"), col("bkey"))
      val probe = batch.join(
        s2.table(arts.bandsTable)
          .select(col("doc_id").as("doc_old"), col("band"), col("bkey")),
        Seq("band", "bkey"))
        .select(col("doc_new"), col("doc_old")).distinct()
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"),
        s"compacted side should bucket-scan:\n$plan")
      val nBandExchanges = "Exchange hashpartitioning\\(band".r
        .findAllIn(plan).length
      assert(nBandExchanges == 1,
        s"only the batch probe side may shuffle on (band, bkey), " +
          s"saw $nBandExchanges:\n$plan")
      // the fresh session sees the appended generation
      val oldMods = probe.collect().map(_.getLong(1) % 10).toSet
      assert(oldMods.exists(_ >= 8),
        s"no appended-generation candidates visible, old mods: $oldMods")
    } finally s2.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("writer exclusion: a second concurrent writer fails fast with " +
    "a clear error instead of interleaving") {
    val arts = StandingIndex.bootstrapWhere(spark, sf, "_lock",
      "doc_id % 10 >= 2 AND doc_id % 10 <= 7")
    val delta = Dedup.inverted(spark, sf).where(expr("doc_id % 10 = 8"))
    // hold the lock the way a mid-append writer would, then try to
    // start a second wave
    val lock = java.nio.file.Paths.get(arts.base, ".writer.lock")
    java.nio.file.Files.createDirectory(lock)
    try {
      val e = intercept[IllegalStateException] {
        StandingIndex.compactInto(spark, arts, delta)
      }
      assert(e.getMessage.contains("concurrent writer"), e.getMessage)
      assert(e.getMessage.contains("single-writer"), e.getMessage)
    } finally java.nio.file.Files.deleteIfExists(lock): Unit
    // lock released -> the same wave now succeeds, and a failed
    // attempt never half-committed anything
    StandingIndex.compactInto(spark, arts, delta)
    assert(StandingIndex.committedGens(arts).sorted === Seq(0, 1))
  }

  test("reader isolation: a crashed half-appended generation is " +
    "invisible until manifest commit, and its id is never re-used") {
    val arts = StandingIndex.bootstrapWhere(spark, sf, "_orphan",
      "doc_id % 10 >= 2 AND doc_id % 10 <= 7")
    val before = StandingIndex.postingsOf(spark, arts)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val beforeBands = StandingIndex.bandsOf(spark, arts).count()

    // simulate a writer that died between its posting append and its
    // band append: the posting partition lands on disk and in the
    // catalog, but no manifest commit ever happens
    Dedup.inverted(spark, sf).where(expr("doc_id % 10 = 8"))
      .withColumn("gen", lit(1))
      .write.mode("append").partitionBy("gen")
      .bucketBy(StandingIndex.NBuckets, "doc_id").sortBy("doc_id")
      .saveAsTable(arts.postingsTable)

    // sanctioned readers resolve the manifest: the orphan is invisible
    assert(StandingIndex.committedGens(arts) === Seq(0))
    val after = StandingIndex.postingsOf(spark, arts)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === before,
      "uncommitted generation leaked into a manifest-resolved read")
    assert(StandingIndex.bandsOf(spark, arts).count() === beforeBands)

    // the next successful wave must allocate a FRESH id (disk-scan
    // max, not manifest max) so the orphan is never adopted
    StandingIndex.compactInto(spark, arts,
      Dedup.inverted(spark, sf).where(expr("doc_id % 10 = 9")))
    assert(StandingIndex.committedGens(arts).sorted === Seq(0, 2))
    val mods = StandingIndex.postingsOf(spark, arts)
      .select(col("doc_id") % 10).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(mods.contains(9L) && !mods.contains(8L),
      s"committed read must include gen 2 and exclude the orphan: $mods")
  }

  test("vacuum folds the newest generations, leaves the base " +
    "untouched, and probes answer identically") {
    // base + three small waves (docs % 100 in {80, 81, 90})
    val arts = StandingIndex.bootstrapWhere(spark, sf, "_vac",
      "doc_id % 10 >= 2 AND doc_id % 10 <= 7")
    for (m <- Seq(80, 81, 90))
      StandingIndex.compactInto(spark, arts,
        Dedup.inverted(spark, sf).where(expr(s"doc_id % 100 = $m")))
    assert(StandingIndex.committedGens(arts).sorted === Seq(0, 1, 2, 3))
    val wantPost = StandingIndex.postingsOf(spark, arts)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantBands = StandingIndex.bandsOf(spark, arts)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val baseFiles = dataFiles(arts.postingsTable)
      .filter(_._1.contains("gen=0"))
    assert(baseFiles.nonEmpty)

    StandingIndex.vacuum(spark, arts, keep = 2)

    // two generations remain: the untouched base + one consolidated
    val gens = StandingIndex.committedGens(arts).sorted
    assert(gens.length === 2 && gens.head === 0, s"gens after vacuum: $gens")
    val afterFiles = dataFiles(arts.postingsTable)
    baseFiles.foreach { case (p, len) =>
      assert(afterFiles.get(p).contains(len),
        s"vacuum rewrote or removed base file $p")
    }
    // superseded wave directories are physically gone
    for (g <- Seq(1, 2, 3); sub <- Seq("postings", "bands"))
      assert(!new java.io.File(s"${arts.base}/$sub/gen=$g").exists(),
        s"superseded $sub gen=$g directory survived vacuum")
    // content-neutral: reads identical before and after
    val gotPost = StandingIndex.postingsOf(spark, arts)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotPost === wantPost)
    val gotBands = StandingIndex.bandsOf(spark, arts)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(gotBands === wantBands)
    // and the vacuumed index still bucket-scans on probe (broadcast
    // off so the bucketed distribution is what satisfies the join)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = Dedup.minhashBands(
        Dedup.inverted(spark, sf).where(expr("doc_id % 10 < 2")))
        .select(col("doc_id").as("doc_new"), col("band"), col("bkey"))
        .join(StandingIndex.bandsOf(spark, arts)
          .select(col("doc_id").as("doc_old"), col("band"), col("bkey")),
          Seq("band", "bkey"))
      assert(probe.queryExecution.executedPlan.toString
        .contains("SelectedBucketsCount"))
      assert(probe.count() > 0)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("q529 gate output: appended generation contributes candidates " +
    "and verdict columns are complete") {
    val rows = SparkEntry.queries("q529_ingest_index_compaction")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(2)).sum > 0,
      "n_cand_appended must be nonzero somewhere at spec SF")
    assert(rows.forall(r => r.getString(6) == "keep"
      || r.getString(6) == "drop"))
  }
}
