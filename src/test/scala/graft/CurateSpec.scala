package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end curation pipeline: quality gate → dedup → split →
  * partitioned layout, verified for count accounting, dedup
  * effectiveness, split stability, and partition pruning.
  */
class CurateSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = GraftSession.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  private val sf = "/root/testdata/sf0.001"

  test("curation pipeline accounts for every document") {
    val out = java.nio.file.Files.createTempDirectory("graft_curated").toString
    val r = graft.ops.Curate.run(spark, sf, s"$out/corpus")
    assert(r.input === 500L)
    assert(r.afterQuality <= r.input && r.afterQuality > 0)
    assert(r.afterDedup <= r.afterQuality && r.afterDedup > 0)
    assert(r.bySplit.values.sum === r.afterDedup)
    assert(r.bySplit.keySet.subsetOf(Set("train", "val", "test")))
    // the 25 planted near-dup pairs lose at most one member each
    assert(r.afterQuality - r.afterDedup <= 25)

    // split assignment is a pure function of doc_id: identical on re-run
    val r2 = graft.ops.Curate.run(spark, sf, s"$out/corpus2")
    assert(r2.bySplit === r.bySplit)

    // partitioned layout: reading one split only lists that directory
    val train = spark.read.parquet(s"$out/corpus")
      .where(col("split") === "train")
    assert(train.count() === r.bySplit.getOrElse("train", 0L))
    // a real pruning predicate, not the always-present empty
    // "PartitionFilters: []" key
    val scan = train.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(split")
      || scan.contains("PartitionFilters: [(split"), scan)
  }

  test("keep-best dedup policy removes the same count as min-id but " +
    "keeps each cluster's highest-quality member") {
    import graft.ops.Curate
    val minId = SparkEntry.queries("q49_dedup_components")(spark, sf)
      .where(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val best = Curate.nearDupVictimsKeepBest(spark, sf, 0.8)
      .collect().map(_.getLong(0)).toSet
    // any keep-one policy removes exactly size-1 docs per cluster
    assert(best.size === minId.size)
    // the survivors are exactly q118's keep_doc choices
    val keeps = SparkEntry.queries("q118_canonical_selection")(spark, sf)
      .select(col("keep_doc")).collect().map(_.getLong(0)).toSet
    val clustered = minId ++ best ++ keeps
    assert((clustered -- best) === keeps)
  }
}
