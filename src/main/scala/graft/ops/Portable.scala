package graft.ops

/** The cross-engine portable hash primitive — the keystone of every
  * signature operator (dedup q17–q21, sketches q35/q37): the first
  * 8 md5 hex chars as an int64, expressible identically in Spark SQL
  * and DuckDB SQL. One definition so the two dialects can never
  * de-synchronize.
  */
private[graft] object Portable {
  def h32Spark(e: String): String =
    s"cast(conv(substring(md5($e), 1, 8), 16, 10) AS BIGINT)"
  def h32Duck(e: String): String =
    s"('0x' || substring(md5($e), 1, 8))::BIGINT"
}
