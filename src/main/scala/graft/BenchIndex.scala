package graft

import graft.ops.StandingIndex

/** Bootstrap-write benchmark for the persisted standing LSH index —
  * the one-time cost the two-job ingest pipeline pays so every later
  * ingest probe is O(batch): shingle + minhash the standing corpus
  * once and write the bucketed band + posting artifacts through the
  * catalog. Prints ONE JSON line (best-of-2 wall seconds plus artifact
  * row counts); numbers are recorded in BASELINE.md §"Standing-index
  * bootstrap" — no driver gate (the registry bench is the gated
  * artifact), they exist so a bootstrap regression is visible across
  * rounds and so the amortization claim ("daily ingest ∝ batch, not
  * corpus") has a measured denominator.
  */
object BenchIndex {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JIT/codegen warmup at the smallest SF, mirroring Bench's protocol
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      StandingIndex.bootstrap(spark, warmDir): Unit

    def once(): (Double, StandingIndex.Artifacts) = {
      val t0 = System.nanoTime()
      val arts = StandingIndex.bootstrap(spark, sfDir)
      ((System.nanoTime() - t0) / 1e9, arts)
    }
    val (sec, arts) = (1 to 2).map(_ => once()).minBy(_._1)
    val bandRows = spark.table(arts.bandsTable).count()
    val postRows = spark.table(arts.postingsTable).count()

    // COMPACTION cost: appending one accepted wave (docs % 10 >= 8,
    // ~1/4 of the corpus slice — a deliberately OVERSIZED day so the
    // number is conservative) into existing artifacts, vs the full
    // re-bootstrap above. This is the daily-maintenance numerator the
    // q529 contract claims is ∝ batch, not corpus.
    def compactOnce(i: Int, wavePred: String): Double = {
      val base = StandingIndex.bootstrapWhere(spark, sfDir, s"_bench$i",
        "doc_id % 10 >= 2 AND doc_id % 10 <= 7")
      val delta = graft.ops.Dedup.inverted(spark, sfDir)
        .where(org.apache.spark.sql.functions.expr(wavePred))
      val t0 = System.nanoTime()
      StandingIndex.compactInto(spark, base, delta)
      (System.nanoTime() - t0) / 1e9
    }
    // two wave sizes: q529's gate shape (25 % of the corpus slice — a
    // deliberately oversized day) and a realistic 2 % daily wave; the
    // ∝-batch claim is the GAP between them shrinking toward the fixed
    // two-write floor, vs the corpus-sized bootstrap above
    val compactSec = (1 to 2)
      .map(i => compactOnce(i, "doc_id % 10 >= 8")).min
    val compactSmallSec = (3 to 4)
      .map(i => compactOnce(i, "doc_id % 100 = 98")).min

    // VACUUM cost: fold three small daily waves into one consolidated
    // generation (keep = 2: untouched base + 1). The retention claim
    // is that vacuum is ∝ the folded waves, NOT the corpus — so this
    // number should track compact_append_2pct_sec × waves, never sec.
    val vacuumSec = {
      val base = StandingIndex.bootstrapWhere(spark, sfDir, "_benchvac",
        "doc_id % 10 >= 2 AND doc_id % 10 <= 7")
      for (m <- Seq(96, 97, 98))
        StandingIndex.compactInto(spark, base,
          graft.ops.Dedup.inverted(spark, sfDir)
            .where(org.apache.spark.sql.functions.expr(s"doc_id % 100 = $m")))
      val t0 = System.nanoTime()
      StandingIndex.vacuum(spark, base, keep = 2)
      (System.nanoTime() - t0) / 1e9
    }
    println(f"""{"metric":"standing_index_bootstrap","sec":$sec%.2f,""" +
      f""""compact_append_sec":$compactSec%.2f,""" +
      f""""compact_append_2pct_sec":$compactSmallSec%.2f,""" +
      f""""vacuum_fold3_sec":$vacuumSec%.2f,""" +
      s""""band_rows":$bandRows,"posting_rows":$postRows,""" +
      s""""buckets":${StandingIndex.NBuckets},"sf":"$sfDir"}""")
    spark.stop()
  }
}
