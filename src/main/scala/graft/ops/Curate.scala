package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data build
  * actually runs, wiring the operator families together as one library
  * pipeline:
  *
  *   quality filter  →  near-dup removal  →  split assignment  →
  *   partitioned parquet layout
  *
  * Every stage is one of the registry operators (q14 quality scoring,
  * q20/q39 near-dup pairs + apply, q37 hash splits) applied as a
  * DataFrame→DataFrame transform, so the pipeline inherits their scale
  * properties: the only corpus-wide shuffles are the dedup posting-table
  * joins; quality and split are narrow projections; the final write is
  * partitioned by split so downstream training jobs prune to their
  * split at the file-listing level.
  */
object Curate {

  /** Quality score (same formula as q14_text_quality). */
  def withQuality(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    docs
      .withColumn("n_tokens", size(toks))
      .withColumn("quality",
        lit(0.3) * (size(array_distinct(toks)).cast("double") / col("n_tokens"))
          + lit(0.2) * (lit(1.0) -
            expr("size(filter(split(text, ' '), t -> t IN ('the','a','of','to','and')))")
              .cast("double") / col("n_tokens"))
          + lit(0.2) * (lit(1.0) - length(regexp_replace(col("text"), "[a-z ]", ""))
            .cast("double") / length(col("text")))
          + lit(0.3) * least(col("n_tokens").cast("double") / lit(50.0), lit(1.0)))
  }

  /** Split assignment — literally q37_split_assign's expression
    * (Portable.splitCaseSpark), so pipeline and registry query cannot
    * drift apart.
    */
  def withSplit(docs: DataFrame): DataFrame =
    docs.withColumn("split", expr(Portable.splitCaseSpark))

  /** Near-dup victims under the quality-aware keep policy
    * (q118_canonical_selection): every clustered doc EXCEPT its
    * cluster's highest-quality member ((quality DESC, doc_id) argmax —
    * q14's exact formula via [[withQuality]], so pipeline and registry
    * query share one scoring definition). Same cluster labeling as the
    * transitive min-id policy — any keep-one rule removes exactly
    * size−1 docs per cluster, only WHICH doc survives differs.
    */
  def nearDupVictimsKeepBest(spark: SparkSession, sfDir: String,
      threshold: Double = 0.8): DataFrame = {
    val cl = Dedup.ccLabels(spark, sfDir, threshold)
      .select(col("node").as("doc_id"), col("component"))
    val scored = withQuality(graft.Fixtures.table(spark, sfDir, "documents"))
      .select(col("doc_id"), col("quality"))
      .join(cl, "doc_id")
    val w = Window.partitionBy(col("component"))
      .orderBy(col("quality").desc, col("doc_id"))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") > 1)
      .select(col("doc_id"))
  }

  final case class CurationReport(
      input: Long, afterQuality: Long, afterDedup: Long,
      bySplit: Map[String, Long], outPath: String)

  /** Run the full pipeline over a fixture directory and write the
    * curated corpus partitioned by split. `minQuality` gates stage 1;
    * near-dup removal keeps one canonical doc (the min doc_id) per
    * connected ≥0.8-Jaccard component (q49 semantics — correct when
    * pairs chain; `transitive = false` restores q39's cheaper greedy
    * pair rule, exact for disjoint pairs; `keepBest = true` switches
    * the transitive policy to keep each cluster's highest-QUALITY
    * member instead of its min id — the q118 policy).
    */
  def run(spark: SparkSession, sfDir: String, outPath: String,
      minQuality: Double = 0.5, transitive: Boolean = true,
      keepBest: Boolean = false): CurationReport = {
    val docs = graft.Fixtures.table(spark, sfDir, "documents")
    val input = docs.count()

    // materialize the gated set once: it feeds the count, the anti-join,
    // and the write — without the persist the quality scan and the dedup
    // join would re-execute per action
    val qualified = withQuality(docs).where(col("quality") >= minQuality)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val afterQuality = qualified.count()

      // near-dup victims from the full corpus (dedup before OR after the
      // quality gate is a policy choice; here after, so borderline dups of
      // a high-quality doc don't survive via the removed twin)
      val victims =
        if (keepBest) nearDupVictimsKeepBest(spark, sfDir, 0.8)
        else if (transitive)
          graft.ops.Dedup.nearDupVictimsTransitive(spark, sfDir, 0.8)
        else graft.ops.Dedup.nearDupVictims(spark, sfDir, 0.8)
      val curated = withSplit(
        qualified.join(victims, Seq("doc_id"), "left_anti"))
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("quality"), col("split"))
      curated.write.mode("overwrite").partitionBy("split").parquet(outPath)

      // read the written corpus back for the split accounting; its total
      // IS the post-dedup count (one pipeline execution, not two)
      val bySplit = spark.read.parquet(outPath)
        .groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      CurationReport(input, afterQuality, bySplit.values.sum, bySplit, outPath)
    } finally qualified.unpersist(blocking = false): Unit
  }
}
