package graft.ops

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

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
  * ==Commit protocol (single-writer, manifest-isolated readers)==
  *
  * Both artifacts are PARTITIONED by an integer `gen` (generation)
  * column on top of their bucket layout — the bootstrap is gen 0,
  * each [[compactInto]] wave a fresh generation directory. Mutations
  * are governed by two mechanisms, spec-pinned by CompactionSpec:
  *
  *  - WRITER EXCLUSION (lock-or-fail): every mutator
  *    ([[bootstrapWhere]], [[compactInto]], [[vacuum]]) first takes
  *    an exclusive lock via atomic directory creation
  *    (`$base/.writer.lock`). A second concurrent writer FAILS FAST
  *    with a clear error instead of interleaving partial bucket
  *    files — the single-writer contract is enforced, not implied.
  *  - READER ISOLATION (manifest commit): a generation becomes
  *    visible only when BOTH its band and posting partitions are
  *    durably written and its id is published in `$base/MANIFEST.json`
  *    via write-temp + atomic rename. The sanctioned readers
  *    ([[bands]]/[[postings]]/[[bandsOf]]/[[postingsOf]]) filter to
  *    the manifest's committed generations — partition pruning, so an
  *    uncommitted (crashed, half-appended) generation's directory is
  *    never even listed. A writer dying between its posting append
  *    and its band append leaves an orphan directory that no reader
  *    resolves; the next writer allocates a FRESH generation id
  *    (disk-scan max, not manifest max), so the orphan can never be
  *    adopted into a later commit.
  *
  * [[vacuum]] bounds generation sprawl: fold the oldest generations
  * into one consolidated partition, atomically swap the manifest, then
  * drop the superseded directories — probes answer identically before
  * and after (the CompactionSpec vacuum case re-runs the parity gate).
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

  final case class Artifacts(bandsTable: String, postingsTable: String,
      base: String)

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
    * one mutable standing table per index, not per query). The
    * bootstrap is generation 0 and is committed to the manifest only
    * after both tables are written.
    */
  def bootstrapWhere(s: SparkSession, dir: String, genTag: String,
      pred: String): Artifacts = {
    val tag = (dir + "_" + s.sparkContext.applicationId)
      .replaceAll("[^A-Za-z0-9]", "_") + genTag
    val base = s"${sys.props("java.io.tmpdir")}/graft_standing_index/$tag"
    val arts = Artifacts(s"graft_bands_$tag", s"graft_postings_$tag", base)
    withWriterLock(arts) {
      val inv = PlanCache.freeze(
        graft.ops.Dedup.inverted(s, dir).where(expr(pred)))
      try {
        inv.withColumn("gen", lit(0))
          .write.mode("overwrite").option("path", s"$base/postings")
          .partitionBy("gen")
          .bucketBy(NBuckets, "doc_id").sortBy("doc_id")
          .saveAsTable(arts.postingsTable)
        graft.ops.Dedup.minhashBands(inv).withColumn("gen", lit(0))
          .write.mode("overwrite").option("path", s"$base/bands")
          .partitionBy("gen")
          .bucketBy(NBuckets, "band", "bkey").sortBy("band", "bkey")
          .saveAsTable(arts.bandsTable)
      } finally inv.unpersist(blocking = false): Unit
      commitManifest(arts, Seq(0))
    }
    arts
  }

  /** Day-over-day COMPACTION: append an accepted batch's posting and
    * band rows INTO existing standing artifacts as a NEW GENERATION —
    * the job that runs after each ingest wave so tomorrow's probe sees
    * today's accepted docs without ever re-shingling the corpus. Cost
    * ∝ batch (one shingle pass over `acceptedInv` feeds both appends);
    * the corpus files are untouched — the generation lands in its own
    * partition directory with the table's bucketBy/sortBy, and bucket
    * pruning keeps applying across generations (each file carries its
    * bucket id; readers union the per-bucket file lists). The only
    * property appending trades away is the one-sorted-file-per-bucket
    * ordering guarantee, which no consumer here relies on (probes use
    * bucket PRUNING and PARTITIONING, not ordering). The generation is
    * manifest-committed only after BOTH appends succeed — a crash in
    * between leaves an invisible orphan, never a half-visible index.
    * CompactionSpec pins append ≡ full re-bootstrap row parity, the
    * post-append bucket scan, corpus-file immutability, writer
    * exclusion, and orphan invisibility.
    */
  def compactInto(s: SparkSession, arts: Artifacts,
      acceptedInv: DataFrame): Unit = withWriterLock(arts) {
    val gen = nextGen(arts)
    val inv = PlanCache.freeze(acceptedInv)
    try {
      inv.withColumn("gen", lit(gen))
        .write.mode("append")
        .partitionBy("gen")
        .bucketBy(NBuckets, "doc_id").sortBy("doc_id")
        .saveAsTable(arts.postingsTable)
      graft.ops.Dedup.minhashBands(inv).withColumn("gen", lit(gen))
        .write.mode("append")
        .partitionBy("gen")
        .bucketBy(NBuckets, "band", "bkey").sortBy("band", "bkey")
        .saveAsTable(arts.bandsTable)
    } finally inv.unpersist(blocking = false): Unit
    commitManifest(arts, committedGens(arts) :+ gen)
  }

  /** Retention: fold the NEWEST committed generations into one fresh
    * consolidated generation so at most `keep` generations remain,
    * atomically swap the manifest, then drop the superseded partition
    * directories. Newest-first on purpose (the LSM shape): generation
    * 0 is the corpus-sized bootstrap and the tail is small daily
    * waves, so folding the tail bounds file-count sprawl at a cost ∝
    * the waves — the base is never rewritten (CompactionSpec asserts
    * its files survive vacuum byte-identical). Content-neutral by
    * construction (the new generation is the exact union of the
    * folded ones), so probes answer identically — re-gated by
    * CompactionSpec.
    *
    * The physical deletes run AFTER the manifest swap — a reader that
    * resolved the old manifest mid-vacuum can transiently race the
    * deletes; production inserts a grace period keyed on reader lease
    * age before the delete wave. Single-node spec scope accepts the
    * race (the manifest itself never points at deleted generations).
    */
  def vacuum(s: SparkSession, arts: Artifacts, keep: Int): Unit =
    withWriterLock(arts) {
      require(keep >= 1, s"vacuum: keep must be >= 1, got $keep")
      val gens = committedGens(arts).sorted
      if (gens.length > keep) {
        val fold = gens.drop(keep - 1)
        val newGen = nextGen(arts)
        val genCol = col("gen").isin(fold.map(Integer.valueOf): _*)
        s.table(arts.postingsTable).where(genCol).drop("gen")
          .withColumn("gen", lit(newGen))
          .write.mode("append").partitionBy("gen")
          .bucketBy(NBuckets, "doc_id").sortBy("doc_id")
          .saveAsTable(arts.postingsTable)
        s.table(arts.bandsTable).where(genCol).drop("gen")
          .withColumn("gen", lit(newGen))
          .write.mode("append").partitionBy("gen")
          .bucketBy(NBuckets, "band", "bkey").sortBy("band", "bkey")
          .saveAsTable(arts.bandsTable)
        commitManifest(arts, gens.filterNot(fold.contains) :+ newGen)
        for (g <- fold; sub <- Seq("postings", "bands"))
          dropPartition(s,
            if (sub == "postings") arts.postingsTable else arts.bandsTable,
            s"${arts.base}/$sub", g)
      }
    }

  // ---- commit-protocol internals ------------------------------------

  /** Atomic-creation writer mutex: `Files.createDirectory` either
    * creates `.writer.lock` or throws — no TOCTOU window. Held for the
    * whole mutation including the manifest swap; always released, even
    * on failure (a failed mutation leaves an orphan generation the
    * manifest never references).
    */
  private def withWriterLock[T](arts: Artifacts)(body: => T): T = {
    val lock = Paths.get(arts.base, ".writer.lock")
    Files.createDirectories(lock.getParent)
    try Files.createDirectory(lock)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"standing index at ${arts.base} has a concurrent writer " +
            s"(lock $lock held, age " +
            s"${System.currentTimeMillis - lock.toFile.lastModified} ms); " +
            "the index is single-writer — serialize ingest jobs, or " +
            "remove a stale lock left by a crashed writer")
    }
    try body finally { Files.deleteIfExists(lock): Unit }
  }

  private def manifestPath(arts: Artifacts): Path =
    Paths.get(arts.base, "MANIFEST.json")

  /** Publish the committed-generation set: write a temp sibling, then
    * ATOMIC_MOVE over MANIFEST.json — readers see the old list or the
    * new list, never a torn write.
    */
  private def commitManifest(arts: Artifacts, gens: Seq[Int]): Unit = {
    val dir = Paths.get(arts.base)
    Files.createDirectories(dir)
    val tmp = dir.resolve(
      s".MANIFEST.tmp.${java.util.UUID.randomUUID().toString}")
    Files.write(tmp,
      s"""{"generations":[${gens.distinct.sorted.mkString(",")}]}"""
        .getBytes("UTF-8"))
    Files.move(tmp, manifestPath(arts),
      StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING): Unit
  }

  /** The committed generation ids — empty for a never-bootstrapped (or
    * bootstrap-crashed) index.
    */
  def committedGens(arts: Artifacts): Seq[Int] = {
    val p = manifestPath(arts)
    if (!Files.exists(p)) Seq.empty
    else {
      val s = new String(Files.readAllBytes(p), "UTF-8")
      "-?\\d+".r.findAllIn(
        s.replaceAll(""".*\[""", "").replaceAll("""\].*""", ""))
        .map(_.toInt).toSeq
    }
  }

  /** Next generation id = 1 + max over committed AND on-disk gens, so
    * an orphan directory from a crashed writer is never re-used (and
    * thus never silently adopted by a later manifest commit).
    */
  private def nextGen(arts: Artifacts): Int = {
    def diskGens(sub: String): Seq[Int] =
      Option(new java.io.File(s"${arts.base}/$sub").listFiles())
        .map(_.toSeq.map(_.getName).filter(_.startsWith("gen="))
          .flatMap(n => scala.util.Try(n.stripPrefix("gen=").toInt).toOption))
        .getOrElse(Seq.empty)
    (committedGens(arts) ++ diskGens("postings") ++ diskGens("bands"))
      .foldLeft(-1)(math.max) + 1
  }

  /** Drop one superseded generation: catalog partition entry first
    * (best-effort — the in-memory catalog and Hive both accept the
    * DDL; a catalog that doesn't is still safe because the manifest
    * filter prunes the partition before the file index lists it),
    * then the directory itself.
    */
  private def dropPartition(s: SparkSession, table: String, root: String,
      gen: Int): Unit = {
    try s.sql(s"ALTER TABLE $table DROP IF EXISTS PARTITION (gen=$gen)")
    catch { case _: Exception => () }
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty)
        .foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(s"$root/gen=$gen"))
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
    * (band, bkey) — bootstrap-if-absent, then a manifest-resolved
    * catalog read.
    */
  def bands(s: SparkSession, dir: String): DataFrame =
    bandsOf(s, ensure(s, dir))

  /** Standing corpus posting table (doc_id, h), bucket-layout doc_id. */
  def postings(s: SparkSession, dir: String): DataFrame =
    postingsOf(s, ensure(s, dir))

  /** Manifest-resolved band read over existing artifacts: committed
    * generations only (partition pruning — an uncommitted generation's
    * directory is never listed), original schema (the `gen` partition
    * column is dropped).
    */
  def bandsOf(s: SparkSession, arts: Artifacts): DataFrame =
    manifestRead(s, arts, arts.bandsTable)

  /** Manifest-resolved posting read; see [[bandsOf]]. */
  def postingsOf(s: SparkSession, arts: Artifacts): DataFrame =
    manifestRead(s, arts, arts.postingsTable)

  private def manifestRead(s: SparkSession, arts: Artifacts,
      table: String): DataFrame = {
    val gens = committedGens(arts)
    s.table(table)
      .where(col("gen").isin(gens.map(Integer.valueOf): _*))
      .drop("gen")
  }
}
