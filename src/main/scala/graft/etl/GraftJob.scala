package graft.etl

/** The reference's whole-invocation entry point — `lambda_handler`
  * (src/lambda_function.py:5-19): one invoke runs the schema dump, then
  * the data extractor, each with its own error containment (the
  * reference logs and continues; the handler never throws).
  *
  * Same contract here: both phases always run; a phase failure is
  * captured in the result instead of propagating, so a broken schema
  * dump never blocks data export (and vice versa) — matching
  * lambda_function.py:10-19's try/except-per-phase shape.
  */
object GraftJob {

  final case class Result(
      schema: Either[String, SchemaDump.Result],
      data: Either[String, Exporter.RunResult])

  def run(
      source: TableSource,
      outDir: String,
      store: CheckpointStore,
      sink: Exporter.SinkMode = Exporter.JsonArray,
      tableParallelism: Int = 1): Result = {
    val schema =
      try Right(SchemaDump.run(source, outDir, store))
      catch { case e: Exception => Left(String.valueOf(e.getMessage)) }
    val data =
      try Right(Exporter.run(source, outDir, store,
        sink = sink, tableParallelism = tableParallelism))
      catch { case e: Exception => Left(String.valueOf(e.getMessage)) }
    Result(schema, data)
  }
}
