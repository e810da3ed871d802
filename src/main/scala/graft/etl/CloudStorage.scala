package graft.etl

import org.apache.spark.sql.SparkSession

/** Mapping of the reference's S3 upload semantics onto Spark's Hadoop
  * S3A connector (reference src/db_extractor_full.py:125-141,174-217):
  * the hand-rolled multipart machinery — 50 MB min part size, SSE
  * AES256 on object creation, 64-connection client pool, a 4-worker
  * async upload pool overlapping encode with upload — is exactly what
  * S3A's block output stream already does, so the engine's port is
  * CONFIG, not code: write to an `s3a://` path with these settings and
  * every sink in this library (JsonArraySink's part stage, the Parquet
  * sink, streaming checkpoints) streams multipart PUTs with the same
  * encryption and parallelism.
  *
  * No S3 endpoint (or AWS SDK) exists in this offline environment, so
  * the surface is config-mapping only, unit-tested for the mapping
  * itself — the documented-stub boundary from SURVEY.md §7.4.
  */
object CloudStorage {

  /** The reference's upload tuning, as data (defaults = its constants). */
  final case class S3Config(
      sseAlgorithm: String = "AES256", // ServerSideEncryption="AES256"
      multipartSizeBytes: Long = 50L * 1024 * 1024, // min_part_size
      maxConnections: Int = 64, // Config(max_pool_connections=64)
      uploadActiveBlocks: Int = 4, // ThreadPoolExecutor(max_workers=4)
      extra: Map[String, String] = Map.empty)

  /** The `fs.s3a.*` keys implementing [[S3Config]]. `extra` wins on
    * conflict (e.g. a custom endpoint or a bucket-specific override).
    */
  def s3aOptions(c: S3Config = S3Config()): Map[String, String] = Map(
    // SSE on every object the connector creates (parts inherit it)
    "fs.s3a.server-side-encryption-algorithm" -> c.sseAlgorithm,
    // one S3A "block" = one multipart part
    "fs.s3a.multipart.size" -> c.multipartSizeBytes.toString,
    "fs.s3a.connection.maximum" -> c.maxConnections.toString,
    // stream blocks as they fill (the reference's overlapped uploads)
    "fs.s3a.fast.upload.active.blocks" -> c.uploadActiveBlocks.toString,
    // task commits become completeMultipartUpload calls, not renames —
    // the correct committer against an object store
    "fs.s3a.committer.name" -> "magic"
  ) ++ c.extra

  /** Apply the mapping to a session's Hadoop configuration; any
    * subsequent `s3a://` write by any sink picks it up.
    */
  def configure(spark: SparkSession, c: S3Config = S3Config()): Unit =
    s3aOptions(c).foreach { case (k, v) =>
      spark.sparkContext.hadoopConfiguration.set(k, v)
    }
}
