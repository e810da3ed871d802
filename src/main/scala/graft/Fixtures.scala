package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-table loader: presents the driver-generated parquet tables
  * (TESTDATA.md) as clean logical DataFrames.
  *
  * The only physical quirk handled here: `events.ts` is parquet
  * TIMESTAMP(NANOS), which Spark's vectorized reader rejects unless
  * `spark.sql.legacy.parquet.nanosAsLong=true` (see GraftSession). We read
  * the nanos as a long and floor-truncate to microseconds as TIMESTAMP_NTZ
  * — the same truncation DuckDB applies when reading ns into its us-
  * precision naive timestamp, so oracle comparisons stay exact.
  */
object Fixtures {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet schema per fixture path, inferred once per JVM. Metadata
    * only (never data): every `spark.read.parquet` without an explicit
    * schema re-reads a file footer on the DRIVER during analysis, and a
    * bench session builds ~10⁴ fixture DataFrames — that footer I/O and
    * per-call inference is pure per-query floor (guide §7.3: driver-side
    * single-threaded work). Production pipelines pass explicit schemas
    * for the same reason.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val sch = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    val df = spark.read.schema(sch).parquet(path)
    if (name == "events" && df.schema("ts").dataType == LongType) {
      // ns → us integer floor division (values are all positive; `/` would
      // be double division and lose precision above 2^53 ns). The NTZ value
      // is built by adding the micros to an NTZ epoch literal — no
      // TimestampType hop, so the result is session-timezone-independent.
      df.withColumn(
        "ts", expr("timestampadd(MICROSECOND, ts div 1000, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00')"))
    } else df
  }

  /** Scale-adaptive scan spread for HEAVY per-row work rooted at a scan.
    *
    * The driver's fixture files are written as a single parquet row
    * group, so a scan stage is exactly ONE task no matter what
    * `spark.sql.files.maxPartitionBytes` says: Spark splits files into
    * byte ranges, but a row group is processed by the one task owning
    * its byte midpoint. Any expensive per-row work planned into that
    * stage — explode fan-outs, md5/shingle hashing, the Expand of a
    * multi-countDistinct, percentile state building — therefore runs on
    * one core while the other 31 idle (measured: q195's 40× explode ran
    * wall 2.20 s ≈ cpu 2.11 s, i.e. fully serial).
    *
    * spread() inserts one round-robin exchange of the (projected) scan
    * output, but ONLY when the file's byte-range split count at the
    * session's maxPartitionBytes is below the default parallelism — the
    * decision derives from input size (guide §2: scale-adaptive, not a
    * constant). At production file sizes splits ≥ cores, the condition
    * is false and spread() is the identity: the plan keeps the scan's
    * natural partitioning and pays no exchange. Use it only where the
    * work above the first natural exchange is heavy relative to one
    * narrow row shuffle; plain scan→partial-aggregate queries are
    * better off serial than paying a raw-row shuffle.
    */
  def spread(spark: SparkSession, dir: String, name: String): DataFrame =
    spreadDf(spark, dir, name, table(spark, dir, name))

  /** [[spread]] over an already-PROJECTED view of fixture `name` —
    * same input-size gate, but the round-robin exchange carries only
    * the columns the query needs (guide §2.3 "project before the
    * exchange"): the r15 q62 spread was driver-measured slower because
    * it shuffled full orders rows (o_comment included) to parallelize
    * an Expand that reads five narrow columns.
    */
  def spreadDf(spark: SparkSession, dir: String, name: String,
      df: DataFrame): DataFrame = {
    val p = spark.sparkContext.defaultParallelism
    val bytes =
      try new java.io.File(s"$dir/$name.parquet").length
      catch { case _: Throwable => Long.MaxValue }
    val maxSplit =
      try spark.conf.get("spark.sql.files.maxPartitionBytes")
        .stripSuffix("b").stripSuffix("B") match {
          case s if s.endsWith("m") || s.endsWith("M") =>
            s.dropRight(1).toLong << 20
          case s if s.endsWith("g") || s.endsWith("G") =>
            s.dropRight(1).toLong << 30
          case s if s.endsWith("k") || s.endsWith("K") =>
            s.dropRight(1).toLong << 10
          case s => s.toLong
        }
      catch { case _: Throwable => 128L << 20 }
    val splits = math.max(1L, (bytes + maxSplit - 1) / maxSplit)
    if (splits < p) df.repartition(p) else df
  }
}

/** Session defaults shared by Verify / Bench / tests.
  *
  * Scale stance: shuffle partitions sized to local cores here, but every
  * query in the library is written so the same plan scales by raising
  * `spark.sql.shuffle.partitions` — AQE coalesces/splits at runtime.
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // split single-file fixtures across the local cores: the default
      // 128 MB put a 113 MB sf1 lineitem into ONE scan task and made
      // every consumer of the basket build serial (q373 measured 3x
      // slower at sf1 than sf3 purely from this); production tunes the
      // same knob against executor memory, SURVEY §7.4
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      // protect less cached data from execution-pressure eviction: the
      // round-13 sf3 canary showed cached subplan blocks pinning
      // old-gen in a single 8g JVM until one heavy aggregation OOM'd
      // and wedged the heap for every query after it; with
      // MEMORY_AND_DISK persists (PlanCache.freeze) an evicted block
      // just drops to disk, so a small protected fraction trades a
      // re-read for not OOMing the canary
      .config("spark.memory.storageFraction", "0.3")
      // skew-split trigger sized to local-mode data: the default 256m
      // threshold never fires on bench-scale partitions (hot keys here
      // are 5–50 MB of shuffle bytes), so neither Spark's
      // OptimizeSkewedJoin nor the graft AsOfSkewMitigation rule would
      // ever demonstrate the mitigation they exist for; production
      // keeps the default (its partitions are gigabytes). The factor×
      // median condition still guards against splitting uniform loads.
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "4m")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.enableNestedColumnVectorizedReader", "true")
      .config("spark.ui.enabled", "false")
}
