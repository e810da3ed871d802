package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PERSISTED standing ANN index — the vector-side analogue of
  * [[StandingIndex]]: q474's ingest-batch ANN search routes arriving
  * vectors through a standing (codebook, census, member) structure
  * that is session-built today; this object writes that structure as
  * catalog artifacts once, so later probe jobs (q531, or a fresh
  * session entirely) search it without ever rescanning the standing
  * corpus:
  *
  *  - the MEMBER table (cell, sub, neighbor_id, ne), BUCKETED by
  *    (cell, sub) — the probe's equi-join key — so the standing
  *    vectors never exchange at probe time (the bucket layout IS the
  *    index clustering; production co-locates each IVF list the same
  *    way);
  *  - the CODEBOOK table (label, cvec): the standing-members-only
  *    centroids the router broadcasts (must be frozen at build time —
  *    a probe that recomputes centroids over a grown corpus is being
  *    routed by an index that no longer matches the member layout);
  *  - the CENSUS table (one row, s_bits): the occupancy-derived
  *    sub-cell bit count, frozen at build time for the same reason —
  *    member `sub` ids were computed under it, so query `sub` ids
  *    must be too. This is the general contract of persisted ANN
  *    indexes: GEOMETRY PARAMETERS ship with the index, not with the
  *    query.
  *
  * Idempotent per (SparkContext, fixture dir); artifacts are external
  * tables under java.io.tmpdir suffixed with the applicationId (the
  * q521 concurrency lesson). VecIndexSpec pins artifact ⇄ in-plan
  * parity, the fresh-session probe round-trip, and the bucket-scan
  * plan property; q531 gates the probe end-to-end against the same
  * DuckDB oracle as the in-plan q474.
  */
object StandingVecIndex {

  final case class Artifacts(membersTable: String, codebookTable: String,
      censusTable: String)

  /** Bucket count for the member table — matches [[StandingIndex]]'s
    * local-mode sizing; production sizes to cluster width.
    */
  val NBuckets = 8

  private val built =
    scala.collection.mutable.Map[(Int, String), Artifacts]()

  def ensure(s: SparkSession, dir: String): Artifacts = built.synchronized {
    built.getOrElseUpdate(
      (System.identityHashCode(s.sparkContext), dir), bootstrap(s, dir))
  }

  /** The bootstrap job body: one standing-corpus pass feeds the census
    * aggregate, the centroid aggregate, and the member write.
    */
  def bootstrap(s: SparkSession, dir: String): Artifacts = {
    val tag = (dir + "_" + s.sparkContext.applicationId)
      .replaceAll("[^A-Za-z0-9]", "_")
    val base = s"${sys.props("java.io.tmpdir")}/graft_standing_vec/$tag"
    val arts = Artifacts(s"graft_veccells_$tag", s"graft_codebook_$tag",
      s"graft_veccensus_$tag")
    val standing = PlanCache.freeze(
      graft.Fixtures.table(s, dir, "embeddings")
        .where(col("vec_id") % 10 >= 2))
    try {
      val census = standing
        .agg(count(lit(1)).as("n_stand"),
          countDistinct(col("label")).as("n_cells"))
        .select(expr(Similarity.subBitsExpr).as("s_bits"))
      census.write.mode("overwrite").option("path", s"$base/census")
        .saveAsTable(arts.censusTable)
      Similarity.standingCodebook(s, dir)
        .write.mode("overwrite").option("path", s"$base/codebook")
        .saveAsTable(arts.codebookTable)
      standing.crossJoin(broadcast(s.table(arts.censusTable)))
        .select(col("label").as("cell"),
          expr(Similarity.subcellSpark("embedding")).as("sub"),
          col("vec_id").as("neighbor_id"),
          col("embedding").as("ne"))
        .write.mode("overwrite").option("path", s"$base/members")
        .bucketBy(NBuckets, "cell", "sub").sortBy("cell", "sub")
        .saveAsTable(arts.membersTable)
    } finally standing.unpersist(blocking = false): Unit
    arts
  }
}
