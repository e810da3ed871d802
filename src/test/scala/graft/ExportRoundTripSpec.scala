package graft

import graft.etl.{Exporter, FileCheckpointStore, ParquetDirSource}

/** ETL → analytics round trip: the Parquet the exporter writes must be
  * a valid input for the analytics registry — same schemas, same
  * coercions, same answers. This is the integration contract a real
  * deployment exercises daily (export the operational DB, run the
  * curation/analytics queries over the export), so it gets its own
  * gate: three registry queries spanning relational aggregation, text
  * ops, and the timestamp-coerced events table must return identical
  * rows over the exported directory and over the original fixtures.
  */
class ExportRoundTripSpec extends SparkSpec {

  test("registry queries over Exporter Parquet output equal the same " +
    "queries over the source fixtures (schema/coercion round trip)") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_export_rt").toString
    val res = Exporter.run(
      source = new ParquetDirSource(spark, sf),
      outDir = out,
      store = FileCheckpointStore(s"$out/ckpt.json"),
      ignore = Set.empty,
      sink = Exporter.Parquet)
    assert(res.checkpointAdvanced)
    val exportDir = f"$out/db_data/${res.serial}%06d"
    val exported = res.exported.map(_.table).toSet
    // every fixture table made it out (none hit the skip routing)
    assert(Fixtures.names.toSet.subsetOf(exported),
      s"missing from export: ${Fixtures.names.toSet -- exported}")

    // relational agg, text op, and an events query whose ts column
    // exercises the NANOS→NTZ coercion surviving a write+read cycle
    Seq("q04_agg_lineitem", "q15_lang_id", "q02_incremental_watermark")
      .foreach { q =>
        val want = SparkEntry.queries(q)(spark, sf)
          .collect().map(_.toString).sorted
        val got = SparkEntry.queries(q)(spark, exportDir)
          .collect().map(_.toString).sorted
        assert(got.length === want.length, s"$q row count over export")
        assert(got === want, s"$q over export diverges from fixtures")
      }
  }
}
