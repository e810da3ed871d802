package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each implemented operator registers a QueryDef in one of the
  * graft.queries.* modules; this object is just the assembly point.
  */
object SparkEntry {

  /** Committed registry size — the single place the count lives.
    * RelationalSpec asserts `queries.size == registrySize`, so adding a
    * query without bumping this fails the suite loudly instead of the
    * tripwire silently rotting (the round-4 157-vs-170 failure mode).
    */
  val registrySize: Int = 533

  def registry: Seq[QueryDef] =
    queries_registry

  private lazy val queries_registry: Seq[QueryDef] =
    graft.queries.Relational.all ++
      graft.queries.TextOps.all ++
      graft.ops.Dedup.all ++
      graft.ops.Similarity.all ++
      graft.ops.Events.all ++
      graft.ops.Multimodal.all ++
      graft.ops.TopK.all ++
      graft.ops.Analytics.all ++
      graft.ops.Inference.all ++
      graft.ops.Planning.all ++
      graft.ops.Sketch.all ++
      graft.ops.Quality.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q06_join_agg_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
