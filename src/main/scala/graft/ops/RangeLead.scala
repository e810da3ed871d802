package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed successor-gap computation WITHOUT a per-key window — the
  * 100 TB path for `lead()` over LOW-CARDINALITY partition keys
  * (q95's TWAP: 5 event types means 5 window tasks, so one type = one
  * straggler holding 20 % of the corpus; the window form is fine for
  * high-cardinality keys like user_id where partitions are small).
  *
  * Two distributed passes over ONE materialized range partitioning:
  *
  *  1. range-repartition on (key, ts, tie) — persist freezes the
  *     sampled boundaries (the RangeNtile rule) — and sort WITHIN each
  *     of the `shards` partitions: every row's successor is either the
  *     next in-partition row or the first row of its key in a later
  *     shard;
  *  2. a per-partition iterator pass emits the in-partition gaps
  *     (successor's ts − row's ts for same-key neighbors) plus, per
  *     (shard, key), the boundary rows: the key's LAST row (needs a
  *     successor elsewhere) and its FIRST ts (is a successor for an
  *     earlier shard). Boundary rows number ≤ 2·shards·|keys| — a
  *     driver scalar like RangeNtile's shard counts, NOT a data
  *     collect — and are stitched into the missing cross-shard gaps
  *     driver-side.
  *
  * Output: one row per input row that HAS a successor within its key:
  * (key, value, gap_us). Agreement with the window form is spec-gated
  * (RangeLeadSpec) and, through q95's oracle, DuckDB-gated.
  */
private[graft] object RangeLead {

  // public at the top of the object: Catalyst's generated
  // (de)serializers access these reflectively and via janino-compiled
  // code, which cannot see private members
  final case class InRow(k: String, ts: Long, tie: Long, v: Double)
  final case class GapRow(key: String, value: Double, gap_us: Long)
  final case class EdgeRow(shard: Int, k: String, firstTs: Long,
      lastTs: Long, lastTie: Long, lastV: Double)

  /** `df` must have columns (key string, ts_us long, tie long,
    * value double); (ts_us, tie) must be unique per key — the same
    * total-order contract as the window form's ORDER BY.
    */
  def gaps(df: DataFrame, shards: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranged = PlanCache.freeze(df
      .select(col("key").as("k"), col("ts_us").as("ts"),
        col("tie"), col("value").as("v"))
      .as[InRow]
      .repartitionByRange(shards, col("k"), col("ts"), col("tie"))
      .sortWithinPartitions(col("k"), col("ts"), col("tie")))
    val inner: Dataset[GapRow] = ranged.mapPartitions { it =>
      new Iterator[GapRow] {
        private var prev: InRow = null
        private var nextGap: GapRow = null
        private def advance(): Unit = {
          while (nextGap == null && it.hasNext) {
            val cur = it.next()
            if (prev != null && prev.k == cur.k)
              nextGap = GapRow(prev.k, prev.v, cur.ts - prev.ts)
            prev = cur
          }
        }
        override def hasNext: Boolean = { advance(); nextGap != null }
        override def next(): GapRow = {
          advance(); val g = nextGap; nextGap = null; g
        }
      }
    }
    // boundary rows: per (shard, key) the first ts and the last row —
    // O(shards × |keys|), the helper's "driver scalar" contract
    val edges = ranged.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val acc = scala.collection.mutable.LinkedHashMap[String, EdgeRow]()
      it.foreach { r =>
        acc.get(r.k) match {
          case None =>
            acc(r.k) = EdgeRow(pid, r.k, r.ts, r.ts, r.tie, r.v)
          case Some(e) =>
            acc(r.k) = e.copy(lastTs = r.ts, lastTie = r.tie, lastV = r.v)
        }
      }
      acc.values.iterator
    }.collect()
    // stitch cross-shard gaps: a key's last row in shard s succeeds to
    // the key's first ts in the next shard (by range order) holding it
    val crossGaps = edges.groupBy(_.k).iterator.flatMap { case (k, es) =>
      val sorted = es.sortBy(_.shard)
      sorted.iterator.zip(sorted.iterator.drop(1)).map { case (a, b) =>
        GapRow(k, a.lastV, b.firstTs - a.lastTs)
      }
    }.toSeq
    // ranged stays persisted until its RDD is GC'd (ContextCleaner):
    // `inner` is lazy, so an eager unpersist here would force the gap
    // pass to RECOMPUTE the range shuffle — resampling the boundaries
    // this helper exists to freeze.
    inner.toDF()
      .unionAll(spark.createDataset(crossGaps).toDF())
  }
}
