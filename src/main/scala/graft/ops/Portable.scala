package graft.ops

/** Cross-engine portable primitives shared by the signature operators
  * (dedup q17–q21, sketches q35/q37, quality q43–q44, Curate): one
  * definition per contract so the Spark and DuckDB dialects — and the
  * pipeline code that composes them — can never de-synchronize.
  */
private[graft] object Portable {
  /** 32-bit string hash: first 8 md5 hex chars as int64. */
  def h32Spark(e: String): String =
    s"cast(conv(substring(md5($e), 1, 8), 16, 10) AS BIGINT)"
  def h32Duck(e: String): String =
    s"('0x' || substring(md5($e), 1, 8))::BIGINT"

  /** Deterministic 80/10/10 train/val/test assignment from doc_id —
    * the q37_split_assign contract (pure hash function: stable across
    * runs, engines, and corpus growth).
    */
  val splitCaseSpark: String =
    s"CASE WHEN ${h32Spark("concat('doc_', doc_id)")} % 100 < 80 " +
      "THEN 'train' WHEN " +
      s"${h32Spark("concat('doc_', doc_id)")} % 100 < 90 " +
      "THEN 'val' ELSE 'test' END"
  val splitCaseDuck: String =
    s"CASE WHEN ${h32Duck("'doc_' || doc_id")} % 100 < 80 THEN 'train' " +
      s"WHEN ${h32Duck("'doc_' || doc_id")} % 100 < 90 THEN 'val' " +
      "ELSE 'test' END"
}
