package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ntile / row_number WITHOUT a single-partition sort —
  * the 100 TB path for every corpus-sized single-total-order consumer
  * (q91/q98/q105/q141/q149/q199/q214/q234): `Window.orderBy(...)` with
  * no partition key collapses the whole input onto ONE task, which is
  * fine for a 10-row aggregate and fatal for a corpus. This helper
  * computes bit-identical labels in two distributed passes:
  *
  *  1. range-repartition on the sort key (Spark samples boundaries —
  *     the "boundary broadcast"; ranges are disjoint under a total
  *     order, so shard s holds exactly the ranks after shards < s),
  *     then count rows per shard — a `|shards|`-row driver scalar, the
  *     same class as Pregel's convergence count, NOT a data collect;
  *  2. per-shard local sort + row_number, plus the broadcast shard
  *     offset, = exact global rank; the ntile bucket is then pure
  *     arithmetic on (rank, N, k) replicating SQL ntile's remainder
  *     rule (first N mod k buckets get one extra row).
  *
  * Every operation is per-shard (the plan shows per-partition sorts
  * only — RangeNtileSpec asserts no SinglePartition exchange), so the
  * operator scales with executor count while agreeing with
  * `ntile(k).over(Window.orderBy(...))` row-for-row at any size.
  */
private[graft] object RangeNtile {

  /** The shared two-pass core: (input + `__shard` + `__rank`, N).
    * `__rank` is the exact global row_number under `sortCols` (1-based,
    * int64); callers drop the working columns. Kept private-to-object so
    * the freeze rule below can't be bypassed.
    */
  private def globalRank(df: DataFrame, sortCols: Seq[Column],
      shards: Int): (DataFrame, Long) = {
    // persist FREEZES the ranged partitioning: repartitionByRange
    // samples its boundaries per execution, so without a
    // materialization between them the count pass and the rank pass
    // could each resample and land rows in DIFFERENT shards, silently
    // corrupting the broadcast offsets. The counts collect below is
    // the first action, so it populates the cache and the rank pass
    // reads the SAME blocks (same boundaries, same __shard values).
    // At fixture scale the boundary sample happens to cover the whole
    // input (deterministic by accident); at the corpus scale this
    // helper exists for, the freeze is load-bearing.
    val ranged = PlanCache.freeze(
      df.repartitionByRange(shards, sortCols: _*)
        .withColumn("__shard", spark_partition_id()))
    // one narrow count pass; offsets/N broadcast back as a literal map
    val counts = ranged.groupBy(col("__shard")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val offsets = (0 until shards).scanLeft(0L) {
      (acc, s) => acc + counts.getOrElse(s, 0L)
    }
    val offsetExpr = (0 until shards).foldLeft(lit(0L)) { (e, s) =>
      when(col("__shard") === s, lit(offsets(s))).otherwise(e)
    }
    val localW = Window.partitionBy(col("__shard")).orderBy(sortCols: _*)
    val withRank = ranged.withColumn("__rank",
      row_number().over(localW).cast("long") + offsetExpr)
    (withRank, total)
  }

  /** Adds `rankCol` = exact global row_number() under `sortCols` (must
    * be a total order — add a tiebreak column as the window form would)
    * without a single-partition sort; output keeps input columns.
    * rank()-with-ties consumers derive 1 + min(row_number) per tie group
    * via an ordinary partitionBy window on top of this (distributed —
    * the tie key hashes across executors).
    */
  def withRowNumber(df: DataFrame, sortCols: Seq[Column],
      rankCol: String, shards: Int = 32): DataFrame = {
    val (withRank, _) = globalRank(df, sortCols, shards)
    withRank.withColumn(rankCol, col("__rank")).drop("__shard", "__rank")
  }

  /** Adds one exact global running sum per `(inCol, outCol)` pair under
    * `sortCols` — the distributed form of
    * `sum(inCol).over(Window.orderBy(sortCols).rowsBetween(
    * unboundedPreceding, currentRow))` — without the single-partition
    * sort that form plans. `sortCols` must be a total order (one row
    * per key), so ROWS and RANGE framing agree and the prefix is
    * well-defined; the CDF consumers (q114) key by distinct value, which
    * satisfies this by construction. Same two passes as [[globalRank]]:
    * range-repartition + per-shard TOTALS collected (a `|shards|`-row
    * driver scalar per column), then per-shard local running sums plus
    * the broadcast exclusive-prefix offset of the preceding shards'
    * totals. Input columns must be integral (the offsets ride int64);
    * exactness therefore matches the window form bit-for-bit.
    */
  def withRunningSums(df: DataFrame, sortCols: Seq[Column],
      sums: Seq[(String, String)], shards: Int = 32): DataFrame = {
    // same freeze rationale as globalRank: persist pins the sampled
    // range boundaries so the totals pass and the prefix pass read the
    // SAME shard assignment.
    val ranged = PlanCache.freeze(
      df.repartitionByRange(shards, sortCols: _*)
        .withColumn("__shard", spark_partition_id()))
    val aggs = sums.map { case (in, _) => sum(col(in)).cast("long").as(in) }
    val totals = ranged.groupBy(col("__shard"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => r.getInt(0) -> sums.indices.map(i => r.getLong(i + 1)))
      .toMap
    val localW = Window.partitionBy(col("__shard")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = sums.zipWithIndex.foldLeft(ranged) {
      case (d, ((in, outCol), i)) =>
        val offsets = (0 until shards).scanLeft(0L) { (acc, s) =>
          acc + totals.get(s).map(_(i)).getOrElse(0L)
        }
        val offsetExpr = (0 until shards).foldLeft(lit(0L)) { (e, s) =>
          when(col("__shard") === s, lit(offsets(s))).otherwise(e)
        }
        d.withColumn(outCol,
          sum(col(in)).over(localW).cast("long") + offsetExpr)
    }
    out.drop("__shard")
  }

  /** Adds `bucketCol` = exact global ntile(k) under `sortCols` (total
    * order required as above). `shards` bounds pass-1 parallelism.
    */
  def withNtile(df: DataFrame, sortCols: Seq[Column], k: Int,
      bucketCol: String, shards: Int = 32): DataFrame = {
    val (withRank, total) = globalRank(df, sortCols, shards)
    // SQL ntile remainder rule: base = N/k rows per bucket, the first
    // N%k buckets take one extra. `div` keeps it exact int64 (a double
    // `/` would cap exactness at 2^53 ranks).
    val base = total / k
    val rem = total % k
    val bucket =
      if (base == 0L) col("__rank") // degenerate N < k: bucket = rank
      else when(col("__rank") <= (base + 1) * rem,
          expr(s"(__rank - 1) div ${base + 1} + 1"))
        .otherwise(
          expr(s"$rem + (__rank - 1 - ${(base + 1) * rem}) div $base + 1"))
    withRank.withColumn(bucketCol, bucket.cast("long"))
      .drop("__shard", "__rank")
  }
}
