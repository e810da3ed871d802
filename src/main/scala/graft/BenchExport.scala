package graft

import graft.etl.{Exporter, FileCheckpointStore, ParquetDirSource}
import java.nio.file.Files

/** Sink-throughput benchmark: times a full `Exporter.run` over every
  * fixture table at the given SF — the end-to-end ETL surface
  * (scan → watermark routing → coercions → sink) the per-query
  * registry bench never exercises. Three configurations:
  *
  *  - `json_serial`   — JSON-array sink, tableParallelism 1: the
  *    reference's faithful shape (its reap-inside-spawn loop makes the
  *    per-table fan-out effectively serial — BASELINE.md).
  *  - `json_par4`     — JSON-array sink, tableParallelism 4: the
  *    bounded opt-in fan-out.
  *  - `parquet_serial` — Parquet sink: the engine's production path
  *    (sharded columnar, no driver-serial completion step).
  *
  * Prints ONE JSON line: wall seconds and rows/s per configuration,
  * plus the total row count exported. Numbers are recorded in
  * BASELINE.md §"Export-sink throughput"; there is no driver gate on
  * them (the registry bench is the gated artifact) — they exist so a
  * sink regression is visible across rounds.
  */
object BenchExport {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val source = new ParquetDirSource(spark, sfDir)
    val totalRows = source.tableNames.map(t => source.read(t).count()).sum

    def once(sink: Exporter.SinkMode, par: Int): Double = {
      val out = Files.createTempDirectory("graft_bexp").toString
      val store = FileCheckpointStore(s"$out/ckpt.json")
      val t0 = System.nanoTime()
      val r = Exporter.run(source, out, store,
        tableParallelism = par, sink = sink)
      val sec = (System.nanoTime() - t0) / 1e9
      require(r.exported.nonEmpty && r.checkpointAdvanced,
        s"export run failed: ${r.outcomes}")
      sec
    }

    // JIT/codegen warmup at the smallest SF, mirroring Bench's protocol
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      val warmSource = new ParquetDirSource(spark, warmDir)
      val wout = Files.createTempDirectory("graft_bexp_warm").toString
      Exporter.run(warmSource, wout, FileCheckpointStore(s"$wout/ckpt.json"),
        sink = Exporter.Parquet): Unit
    }

    val configs = Seq(
      ("json_serial", Exporter.JsonArray: Exporter.SinkMode, 1),
      ("json_par4", Exporter.JsonArray: Exporter.SinkMode, 4),
      ("parquet_serial", Exporter.Parquet: Exporter.SinkMode, 1))
    val timings = configs.map { case (tag, sink, par) =>
      val sec = (1 to 2).map(_ => once(sink, par)).min // best-of-2
      tag -> sec
    }
    val fields = timings.map { case (tag, sec) =>
      f""""$tag":{"sec":$sec%.2f,"rows_per_sec":${totalRows / sec}%.0f}"""
    }.mkString(",")
    println(s"""{"metric":"export_sink","rows":$totalRows,$fields,"sf":"$sfDir"}""")
    spark.stop()
  }
}
