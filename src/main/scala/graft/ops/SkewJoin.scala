package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual key-salting for skewed equi-joins.
  *
  * A hash-partitioned join sends every row of a hot key to ONE reducer;
  * with heavy skew (one user/id owning a large fraction of a 100 TB
  * fact table) that reducer becomes the job. Salting splits each hot
  * key into `salts` sub-keys: the large side gets a deterministic salt
  * derived from a per-row column, the small side is replicated `salts`
  * times — the hot key's rows now spread over `salts` reducers.
  *
  * AQE's skew-join handling (on in GraftSession) covers sort-merge
  * joins automatically at runtime; explicit salting remains the tool
  * when the skew is extreme, the join is not SMJ, or the salt must be
  * baked into a persisted layout. The salt here is `pmod(hash(salt
  * source), salts)` — deterministic, so results are reproducible
  * run-to-run (no rand()).
  */
object SkewJoin {

  /** Equi-join `large ⋈ small` on `key`, salted `salts` ways.
    * `small` is replicated `salts`× (explode of a literal range), so it
    * must be broadcast-sized or at least small relative to `large`.
    */
  def saltedEquiJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // deterministic per-row salt: hash every non-key column so rows of
    // a hot key spread evenly without rand()'s non-reproducibility
    val saltSrc = large.columns.filterNot(_ == key).map(col).toSeq
    val l = large.withColumn("__salt",
      if (saltSrc.isEmpty) lit(0)
      else pmod(hash(saltSrc: _*), lit(salts)))
    val r = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
