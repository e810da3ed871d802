package graft.etl

import org.apache.spark.sql.DataFrame
import java.io.{BufferedReader, BufferedWriter}
import java.nio.file.{Files, Path, Paths}

/** The reference's signature sink: ONE JSON **array** per table
  * (db_extractor_full.py:121-297 — multipart S3 upload of `[` + comma-
  * joined row objects + `]`; empty table → literal `[]`,
  * db_extractor_full.py:262-278).
  *
  * Scale design, mirroring the reference's multipart mechanics:
  *  - executors do the expensive work in parallel — coercion + JSON
  *    encoding runs inside whole-stage codegen and each partition lands as
  *    one "part" (exactly the reference's encoded fragments, which its
  *    4-thread pool uploads as S3 parts);
  *  - the driver then *completes* the object by splicing parts in
  *    partition order with `[ , ]` delimiters — the analogue of
  *    CompleteMultipartUpload's ordered part list
  *    (db_extractor_full.py:289-296). On S3 this step is a part-list
  *    API call; on a local FS it is a sequential byte copy (the only
  *    inherently serial step — the price of the single-object contract).
  *
  * Production output at 100 TB should be sharded Parquet/JSONL + manifest
  * (SURVEY.md §7.4 risk 2); this sink exists for reference fidelity and is
  * exercised by golden tests.
  */
object JsonArraySink {

  /** Write `df` as a single JSON-array file at `outPath`. Rows appear in
    * partition order, then row order within each partition — matching the
    * reference's `next_to_write` submission-order stitching
    * (db_extractor_full.py:243-258). Completion strategy per
    * [[Composer]]: local byte-splice (default, golden byte shape) or
    * object-store part-list completion (framing baked into the
    * distributed encode; zero fragment bytes through the driver).
    */
  def write(df: DataFrame, outPath: String,
      uuidCols: Set[String] = Set.empty,
      composer: Composer = Composer.LocalByteSplice): Unit = {
    val out = Paths.get(outPath)
    Files.createDirectories(out.toAbsolutePath.getParent)
    val tmp = Files.createTempDirectory(
      out.toAbsolutePath.getParent, ".json_parts_")
    try {
      val rows = Coercions.jsonRow(df, uuidCols)
      composer match {
        case Composer.LocalByteSplice =>
          // distributed encode: one text line per bare row object
          rows.write.mode("overwrite").text(tmp.resolve("parts").toString)
          compose(partFiles(tmp.resolve("parts")), out)
        case Composer.PartList(store) =>
          // framing baked in distributedly: every row `,{obj}` —
          // uniform, so the projection stays one codegen'd concat and
          // no partition needs global first-ness
          rows.select(org.apache.spark.sql.functions.concat(
              org.apache.spark.sql.functions.lit(","),
              rows.col("json")).as("json"))
            .write.mode("overwrite").text(tmp.resolve("parts").toString)
          val frags = partFiles(tmp.resolve("parts"))
            .filter(p => Files.size(p) > 0)
          val specs = PartSpec.lit("[") +:
            frags.zipWithIndex.map { case (p, i) =>
              PartSpec.fragment(p, skipLeadingByte = i == 0)
            } :+ PartSpec.lit("]")
          store.completeByParts(out, specs)
      }
    } finally deleteRecursively(tmp)
  }

  /** part-NNNNN files in partition order — sorted by the PARSED part
    * index, not the raw name: Spark widens part-%05d to 6 digits past
    * partition 99999, where a lexicographic sort would place
    * part-100000 before part-99999 and scramble the stitching order.
    */
  private[graft] def partFiles(dir: Path): Seq[Path] = {
    val d = dir.toFile
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .sortBy(f => f.getName.split('-')(1).toLong)
      .map(_.toPath).toSeq
  }

  /** Ordered completion: `[` + rows comma-joined across all parts + `]`.
    * Streams line-by-line — bounded memory regardless of table size.
    */
  private def compose(parts: Seq[Path], out: Path): Unit = {
    // explicit UTF-8: Spark writes the part files as UTF-8; the platform
    // default charset must not leak into the re-encode
    val w = new BufferedWriter(Files.newBufferedWriter(out,
      java.nio.charset.StandardCharsets.UTF_8), 1 << 20)
    try {
      w.write("[")
      var first = true
      parts.foreach { p =>
        val r = new BufferedReader(Files.newBufferedReader(p,
          java.nio.charset.StandardCharsets.UTF_8), 1 << 20)
        try {
          var line = r.readLine()
          while (line != null) {
            if (!first) w.write(",")
            w.write(line)
            first = false
            line = r.readLine()
          }
        } finally r.close()
      }
      w.write("]")
    } finally w.close()
  }

  private def deleteRecursively(p: Path): Unit = {
    val f = p.toFile
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty)
      .foreach(c => deleteRecursively(c.toPath))
    f.delete(): Unit
  }
}
