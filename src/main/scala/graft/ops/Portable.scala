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

  /** 52-bit string hash: first 13 md5 hex chars as int64. Used where a
    * hash IS the sampled identity (q482's bottom-k sample): 32 bits
    * collide visibly at corpus scale (birthday bound ≈ n²/2³³), 52 bits
    * keep the collision probability ≪ 1 at 10⁷ keys while still fitting
    * a non-negative BIGINT in both engines (and, when a caller ever
    * needs it in a DOUBLE, an exact IEEE-754 integer).
    */
  def h52Spark(e: String): String =
    s"cast(conv(substring(md5($e), 1, 13), 16, 10) AS BIGINT)"
  def h52Duck(e: String): String =
    s"('0x' || substring(md5($e), 1, 13))::BIGINT"

  /** Deterministic simulated ARRIVAL sequence for the event log — the
    * q494/q502/q508 lateness family's shared contract: the fixture's
    * event_id order is perfectly time-sorted per user (a synthetic
    * artifact no production ingest enjoys), so disorder is modeled as
    * a 5 % late tail: hash-chosen events arrive 5 positions behind
    * their slot (≈ 20 min of event time on the fixture's cadence),
    * everything else in order. (A full hash permutation —
    * the first-cut model — made ~93 % of rows "late", which turns the
    * watermark decision and the backfill plan degenerate; a bounded
    * displaced tail matches how real queues misbehave.)
    */
  val arrivalSeqSpark: String =
    s"event_id + CASE WHEN ${h32Spark("concat('arr_', event_id)")} " +
      "% 100 < 5 THEN 5 ELSE 0 END"
  val arrivalSeqDuck: String =
    s"event_id + CASE WHEN ${h32Duck("'arr_' || event_id")} " +
      "% 100 < 5 THEN 5 ELSE 0 END"

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

  /** Standard normal CDF Φ(z) for z ≥ 0 as ONE SQL expression —
    * Abramowitz & Stegun 26.2.17 (|ε| < 7.5e-8): Φ(z) = 1 − φ(z)·
    * (b₁t + b₂t² + b₃t³ + b₄t⁴ + b₅t⁵), t = 1/(1 + 0.2316419·z).
    * Neither Spark nor DuckDB ships Φ/erf as a builtin, so the
    * polynomial IS the portability contract: the same literal
    * arithmetic (plus one libm exp on an identical input) evaluates
    * bit-identically on both engines. `z` must be a non-negative
    * expression (callers pass abs(z) and double for two-sided tests).
    * Dialect-free: only arithmetic, exp() and literals — the returned
    * text is valid in BOTH Spark SQL and DuckDB.
    */
  /** Upper-tail χ²(k) p-value via the Wilson–Hilferty cube-root
    * normal approximation (|ε| < 1e-3 for k ≥ 3, the regime the
    * k-group tests use; the χ²(1) callers keep the exact 2·Q(√x)
    * identity instead). Same dialect-free contract as
    * [[normCdfUpper]]: arithmetic + pow/sqrt/exp only, evaluates
    * bit-identically in Spark SQL and DuckDB. `x` and `k` must be
    * non-negative expressions.
    */
  def chi2UpperP(x: String, k: String): String = {
    // 1.0e0/3.0e0, NOT 1.0/3.0: Spark parses plain decimal literals as
    // DECIMAL and 1.0/3.0 becomes a 6-digit DECIMAL quotient (0.333333),
    // skewing the cube root by 1e-6 relative; the e0 suffix forces
    // DOUBLE in both dialects (caught by the q419 oracle gate). The df
    // is CAST to DOUBLE for the same reason: a caller passing a literal
    // k ("2.0") would otherwise make 2.0/(9.0*k) a DECIMAL quotient
    // (caught by the q436 oracle gate).
    val kd = s"(CAST(($k) AS DOUBLE))"
    val z = s"((pow(($x) / $kd, 1.0e0 / 3.0e0)" +
      s" - (1.0 - 2.0 / (9.0 * $kd))) / sqrt(2.0 / (9.0 * $kd)))"
    s"(CASE WHEN $z >= 0.0 THEN ${normCdfUpper(z)} " +
      s"ELSE 1.0 - ${normCdfUpper(s"(0.0 - ($z))")} END)"
  }

  def normCdfUpper(z: String): String = {
    // upper tail Q(z) = 1 − Φ(z); callers build p-values directly
    val t = s"(1.0 / (1.0 + 0.2316419 * ($z)))"
    val poly = s"(0.319381530 * $t - 0.356563782 * $t * $t " +
      s"+ 1.781477937 * $t * $t * $t " +
      s"- 1.821255978 * $t * $t * $t * $t " +
      s"+ 1.330274429 * $t * $t * $t * $t * $t)"
    s"(exp(-(($z) * ($z)) / 2.0) / 2.5066282746310002 * $poly)"
  }
}
