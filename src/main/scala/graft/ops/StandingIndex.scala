package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PERSISTED standing LSH index — the two-job production contract
  * behind the incremental-dedup family (q473/q490/q500), made real:
  *
  *  - a BOOTSTRAP job scans the standing corpus once and WRITES two
  *    bucketed parquet artifacts through the catalog:
  *      * the BAND table (doc_id, band, bkey), bucketed + sorted by
  *        (band, bkey) — the per-ingest candidate probe joins against
  *        the bucket layout directly, so the corpus side never
  *        exchanges (ScaleSpec's `SelectedBucketsCount` assertion);
  *      * the POSTING table (doc_id, h), bucketed + sorted by doc_id —
  *        the exact-Jaccard verify join and the per-doc size aggregate
  *        both key on doc_id, so candidate verification reads only the
  *        buckets its candidates live in and re-uses the layout as its
  *        aggregation distribution;
  *  - the INGEST queries then READ the artifacts via `spark.table`
  *    (bucket metadata comes from the catalog; a plain parquet read
  *    would discard it) — the standing corpus is never re-shingled or
  *    re-banded per ingest, which is the whole 100 TB economics: daily
  *    cost ∝ batch size + collisions, bootstrap cost paid once.
  *
  * Within one JVM the bootstrap runs AT MOST ONCE per (SparkContext,
  * fixture dir) — gated queries calling [[bands]]/[[postings]]
  * back-to-back share the artifacts the way production jobs share the
  * published table. Artifacts are EXTERNAL tables: data files live
  * under java.io.tmpdir suffixed with the applicationId (two
  * concurrent runs can't clobber each other — the q521 lesson), table
  * names carry the same suffix, and `SparkSession.newSession()` sees
  * them through the shared catalog — PersistedIndexSpec proves the
  * bootstrap → fresh-session → probe round-trip with row parity
  * against the in-plan form ([[Dedup.corpusBands]], kept as the
  * single-job formulation and the streaming twin's static side).
  *
  * Corpus membership follows the family's fixed convention:
  * doc_id % 10 >= 2 is the standing corpus, % 10 < 2 the arriving
  * batch (see q104's scaladoc).
  */
object StandingIndex {

  final case class Artifacts(bandsTable: String, postingsTable: String)

  /** Bucket count for both artifacts — 8 matches the local-mode spec
    * fixtures; production sizes this to cluster width (the bucket
    * count is a one-time bootstrap decision; probes adapt to it).
    */
  val NBuckets = 8

  private val built =
    scala.collection.mutable.Map[(Int, String), Artifacts]()

  /** Idempotent bootstrap: write both artifacts if this (context, dir)
    * hasn't yet, return the catalog table names.
    */
  def ensure(s: SparkSession, dir: String): Artifacts = built.synchronized {
    built.getOrElseUpdate(
      (System.identityHashCode(s.sparkContext), dir), bootstrap(s, dir))
  }

  /** The bootstrap job body (unconditional write; callers outside
    * benchmarks want [[ensure]]). One corpus scan feeds both writes:
    * the shingle/posting build is the expensive pass, so it is
    * persisted for the duration of the two writes and released after.
    */
  def bootstrap(s: SparkSession, dir: String): Artifacts =
    bootstrapWhere(s, dir, "", "doc_id % 10 >= 2")

  /** Parameterized bootstrap: write band + posting artifacts for the
    * corpus slice selected by `pred`, under tables/paths suffixed with
    * `gen` (so generations coexist — [[ensureCompacted]] keeps its
    * artifacts separate from [[ensure]]'s, the way production keeps
    * one mutable standing table per index, not per query).
    */
  def bootstrapWhere(s: SparkSession, dir: String, gen: String,
      pred: String): Artifacts = {
    val tag = (dir + "_" + s.sparkContext.applicationId)
      .replaceAll("[^A-Za-z0-9]", "_") + gen
    val base = s"${sys.props("java.io.tmpdir")}/graft_standing_index/$tag"
    val arts = Artifacts(s"graft_bands_$tag", s"graft_postings_$tag")
    val inv = PlanCache.freeze(
      graft.ops.Dedup.inverted(s, dir).where(expr(pred)))
    try {
      inv.write.mode("overwrite").option("path", s"$base/postings")
        .bucketBy(NBuckets, "doc_id").sortBy("doc_id")
        .saveAsTable(arts.postingsTable)
      graft.ops.Dedup.minhashBands(inv)
        .write.mode("overwrite").option("path", s"$base/bands")
        .bucketBy(NBuckets, "band", "bkey").sortBy("band", "bkey")
        .saveAsTable(arts.bandsTable)
    } finally inv.unpersist(blocking = false): Unit
    arts
  }

  /** Day-over-day COMPACTION: append an accepted batch's posting and
    * band rows INTO existing standing artifacts — the job that runs
    * after each ingest wave so tomorrow's probe sees today's accepted
    * docs without ever re-shingling the corpus. Cost ∝ batch (one
    * shingle pass over `acceptedInv` feeds both appends); the corpus
    * files are untouched — `mode("append")` with the table's own
    * bucketBy/sortBy adds NEW per-bucket files alongside the old ones,
    * and bucket pruning keeps applying across generations (each file
    * carries its bucket id; readers union the per-bucket file lists).
    * The only property appending trades away is the one-sorted-file-
    * per-bucket ordering guarantee, which no consumer here relies on
    * (probes use bucket PRUNING and PARTITIONING, not ordering).
    * CompactionSpec pins append ≡ full re-bootstrap row parity, the
    * post-append bucket scan, and corpus-file immutability.
    */
  def compactInto(s: SparkSession, arts: Artifacts,
      acceptedInv: DataFrame): Unit = {
    val inv = PlanCache.freeze(acceptedInv)
    try {
      inv.write.mode("append")
        .bucketBy(NBuckets, "doc_id").sortBy("doc_id")
        .saveAsTable(arts.postingsTable)
      graft.ops.Dedup.minhashBands(inv)
        .write.mode("append")
        .bucketBy(NBuckets, "band", "bkey").sortBy("band", "bkey")
        .saveAsTable(arts.bandsTable)
    } finally inv.unpersist(blocking = false): Unit
  }

  private val compactedBuilt =
    scala.collection.mutable.Map[(Int, String), Artifacts]()

  /** The q529 generation story, idempotent per (context, dir): a
    * PARTIAL bootstrap (standing corpus = doc_id % 10 in 2..7) followed
    * by one [[compactInto]] wave appending the accepted docs
    * (doc_id % 10 in {8, 9}) — together covering exactly the % 10 >= 2
    * corpus [[ensure]] builds in one shot, which is what makes the
    * compacted index ORACLE-GATEABLE: a probe against it must answer
    * identically to a probe against the plain union corpus, so any
    * append defect (lost rows, wrong bucket file, missed postings)
    * shifts candidates and fails the hash gate.
    */
  def ensureCompacted(s: SparkSession, dir: String): Artifacts =
    compactedBuilt.synchronized {
      compactedBuilt.getOrElseUpdate(
        (System.identityHashCode(s.sparkContext), dir), {
          val arts = bootstrapWhere(s, dir, "_g2",
            "doc_id % 10 >= 2 AND doc_id % 10 <= 7")
          compactInto(s, arts,
            graft.ops.Dedup.inverted(s, dir).where(expr("doc_id % 10 >= 8")))
          arts
        })
    }

  /** Standing corpus band table (doc_id, band, bkey), bucket-layout
    * (band, bkey) — bootstrap-if-absent, then a catalog read.
    */
  def bands(s: SparkSession, dir: String): DataFrame =
    s.table(ensure(s, dir).bandsTable)

  /** Standing corpus posting table (doc_id, h), bucket-layout doc_id. */
  def postings(s: SparkSession, dir: String): DataFrame =
    s.table(ensure(s, dir).postingsTable)
}
