package graft.ops

import graft.{Fixtures, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoder

/** Distributed top-k as a typed Aggregator — the scale-correct
  * alternative to `row_number().over(Window)` for per-group top-k.
  *
  * A window sorts EVERY scored row inside each group partition; this
  * aggregator keeps a bounded k-element buffer, so map-side partial
  * aggregation reduces each partition's contribution to ≤ k rows per
  * group BEFORE the shuffle. At 100 TB (billions of scored pairs,
  * millions of query groups) the shuffle carries k·groups rows instead
  * of all pairs — the same reason TakeOrderedAndProject beats global
  * sort for ORDER BY..LIMIT (RelationalSpec asserts that plan for q06).
  *
  * q30 re-runs q22's brute-force KNN through this aggregator; it must
  * (and does) hash-match q22's oracle exactly — same scores, same
  * (-score, id) tie order.
  */
object TopK {

  /** One scored candidate (e.g. an ANN neighbor). */
  final case class Scored(id: Long, score: Double)
  /** Aggregator input: a scored candidate within a query group. */
  final case class QScored(query_id: Long, id: Long, score: Double)

  /** Bounded top-k by (score desc, id asc). Buffer stays sorted and
    * ≤ k elements, so reduce is O(k) and merge O(k log k).
    */
  final class TopKAgg(k: Int) extends Aggregator[QScored, Seq[Scored], Seq[Scored]] {
    private def bound(xs: Seq[Scored]): Seq[Scored] =
      xs.sortBy(s => (-s.score, s.id)).take(k)
    override def zero: Seq[Scored] = Seq.empty
    override def reduce(b: Seq[Scored], a: QScored): Seq[Scored] =
      bound(b :+ Scored(a.id, a.score))
    override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
      bound(b1 ++ b2)
    override def finish(r: Seq[Scored]): Seq[Scored] = r
    override def bufferEncoder: Encoder[Seq[Scored]] =
      ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      ExpressionEncoder[Seq[Scored]]()
  }

  /** One scored string-id candidate within a string group, with an
    * int64 payload carried through (q145: the in-language count). */
  final case class GScored(grp: String, id: String, score: Double, c: Long)
  /** A kept candidate inside the bounded buffer. */
  final case class GTop(id: String, score: Double, c: Long)

  /** Bounded per-group top-k by (score desc, id asc) over string ids —
    * the scale path for per-group windows whose groups are few but
    * vocab-sized (q145's per-language keyness): the window form sorts
    * one language's whole vocabulary on one task; this buffer caps the
    * map-side contribution at k rows per (partition, group) before the
    * shuffle.
    */
  final class TopKStrAgg(k: Int)
      extends Aggregator[GScored, Seq[GTop], Seq[GTop]] {
    private def bound(xs: Seq[GTop]): Seq[GTop] =
      xs.sortBy(t => (-t.score, t.id)).take(k)
    override def zero: Seq[GTop] = Seq.empty
    override def reduce(b: Seq[GTop], a: GScored): Seq[GTop] =
      bound(b :+ GTop(a.id, a.score, a.c))
    override def merge(b1: Seq[GTop], b2: Seq[GTop]): Seq[GTop] =
      bound(b1 ++ b2)
    override def finish(r: Seq[GTop]): Seq[GTop] = r
    override def bufferEncoder: Encoder[Seq[GTop]] =
      ExpressionEncoder[Seq[GTop]]()
    override def outputEncoder: Encoder[Seq[GTop]] =
      ExpressionEncoder[Seq[GTop]]()
  }

  // same query-set contract as q22 (the shared oracle requires it)
  private val K = Similarity.K
  private val NQueries = Similarity.NQueries

  /** q22's KNN, but the per-query top-k runs through the partial-agg
    * path instead of a window sort. Identical output contract (and the
    * identical DuckDB oracle) as q22_knn_bruteforce.
    */
  private val q30 = QueryDef(
    "q30_topk_aggregator",
    (s, dir) => {
      import s.implicits._
      val e = Fixtures.table(s, dir, "embeddings")
      val q = broadcast(e.where(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe")))
      val scored = e.join(q, col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("id"),
          expr("graft_cosine(qe, embedding)").as("score"))
        .as[QScored]
      scored.groupByKey(_.query_id)
        .agg(new TopKAgg(K).toColumn.name("topk"))
        .flatMap { case (qid, top) =>
          top.zipWithIndex.map { case (sc, i) =>
            (qid, i + 1, sc.id, sc.score)
          }
        }
        .toDF("query_id", "rnk", "neighbor_id", "cosine")
        .orderBy("query_id", "rnk")
    },
    Some(s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings WHERE vec_id < $NQueries),
      s AS (SELECT query_id, b.vec_id AS neighbor_id,
          ${Dedup.cosDuck("qe", "b.embedding")} AS cosine
        FROM q JOIN embeddings b ON b.vec_id <> query_id),
      r AS (SELECT query_id, neighbor_id, cosine,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS rnk FROM s)
      SELECT query_id, rnk, neighbor_id, cosine FROM r
      WHERE rnk <= $K ORDER BY query_id, rnk"""))

  // ---------- q481: incremental top-k maintenance ----------------------

  /** Top-k state maintenance across an ingest boundary — and the
    * classic mistake it exists to catch: the MERGEABLE state for
    * "top-10 parts by revenue" is the full per-key aggregate (one
    * DECIMAL sum per part — compressed corpus state, |parts| rows),
    * NOT the top-10 list. Merging two top-10 lists silently drops a
    * part that ranks 11th in both halves but 8th overall; this query
    * computes the merge BOTH ways and reports each against an
    * independent full recompute: `merge_equals_full` (per-key-state
    * merge — exact, DECIMAL sums are associative) is true,
    * `naive_equals_full` (top-list merge) is FALSE on this very
    * fixture. Orders split at a date watermark (q479's 4/5-range cut,
    * integer-day arithmetic). Shape: per-(part, side) partials → one
    * |parts|-row merge; three TakeOrdered(10)s; 10-row output.
    */
  private val q481 = QueryDef(
    "q481_ingest_topk_merge",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val o = Fixtures.table(s, dir, "orders")
        .select(col("o_orderkey"),
          expr("datediff(o_orderdate, DATE '1970-01-01')").as("d"))
      val mm = o.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      val term = expr("l_extendedprice * (1 - l_discount)")
        .cast(DecimalType(28, 6))
      // frozen + spread (r15): `li` feeds both the side-state build and
      // the independent full recompute — the lineitem⋈orders join ran
      // twice before (the oracle's fullr likewise re-aggregates the
      // shared li CTE, so independence-of-recompute is unchanged)
      val li = PlanCache.freeze(Fixtures.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), term.as("t"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .crossJoin(broadcast(mm))
        .withColumn("isb",
          (col("d") >= col("lo") + expr("(hi - lo) * 4 div 5"))
            .cast("long")))
      // the per-side per-key states (what an ingest keeps between runs)
      val rev = PlanCache.freeze(li.groupBy(col("l_partkey"), col("isb"))
        .agg(sum(col("t")).as("r")))
      // state merge: sum the side partials per key
      val merged = rev.groupBy(col("l_partkey")).agg(sum(col("r")).as("rr"))
      // independent full recompute (no side split in the plan)
      val full = li.groupBy(col("l_partkey")).agg(sum(col("t")).as("rr"))
      val wTop = Window.orderBy(col("rr").desc, col("l_partkey"))
      def top10(df: DataFrame) = df
        .orderBy(col("rr").desc, col("l_partkey")).limit(10)
        .withColumn("rnk", row_number().over(wTop))
      val f10 = top10(full)
      val m10 = top10(merged)
      // the naive (WRONG at scale) merge: union of the two side top-10
      // lists, re-summed and re-ranked — keys outside both lists are
      // unrecoverable
      val s10 = rev.where(col("isb") === 0)
        .orderBy(col("r").desc, col("l_partkey")).limit(10)
        .select(col("l_partkey"))
      val b10 = rev.where(col("isb") === 1)
        .orderBy(col("r").desc, col("l_partkey")).limit(10)
        .select(col("l_partkey"))
      val n10 = top10(merged.join(
        s10.unionAll(b10).distinct(), Seq("l_partkey"), "left_semi"))
      def matches(a: DataFrame, b: DataFrame) = a.alias("a")
        .join(b.alias("b"), Seq("rnk"), "full_outer")
        .agg(min(when(col("a.l_partkey") === col("b.l_partkey")
          && col("a.rr") === col("b.rr"), 1L).otherwise(0L))
          .as("all_eq"))
      val mEq = matches(f10, m10).select(col("all_eq").as("m_eq"))
      val nEq = matches(f10, n10).select(col("all_eq").as("n_eq"))
      f10.crossJoin(broadcast(mEq)).crossJoin(broadcast(nEq))
        .select(col("rnk"), col("l_partkey").as("p_partkey"),
          col("rr").cast(DoubleType).as("revenue"),
          (col("m_eq") === 1L).as("merge_equals_full"),
          (col("n_eq") === 1L).as("naive_equals_full"))
        .orderBy("rnk")
    },
    Some("""WITH o AS (SELECT o_orderkey,
          datediff('day', DATE '1970-01-01', o_orderdate) AS d
        FROM orders),
      mm AS (SELECT min(d) AS lo, max(d) AS hi FROM o),
      li AS (SELECT l_partkey,
          CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)) AS t,
          CASE WHEN d >= lo + (hi - lo) * 4 // 5 THEN 1 ELSE 0 END
            AS isb
        FROM lineitem JOIN o ON l_orderkey = o_orderkey, mm),
      rev AS (SELECT l_partkey, isb, sum(t) AS r FROM li GROUP BY 1, 2),
      merged AS (SELECT l_partkey, sum(r) AS rr FROM rev GROUP BY 1),
      fullr AS (SELECT l_partkey, sum(t) AS rr FROM li GROUP BY 1),
      f10 AS (SELECT l_partkey, rr, row_number() OVER
          (ORDER BY rr DESC, l_partkey) AS rnk
        FROM fullr ORDER BY rr DESC, l_partkey LIMIT 10),
      m10 AS (SELECT l_partkey, rr, row_number() OVER
          (ORDER BY rr DESC, l_partkey) AS rnk
        FROM merged ORDER BY rr DESC, l_partkey LIMIT 10),
      sb AS (SELECT l_partkey FROM (SELECT l_partkey FROM rev
          WHERE isb = 0 ORDER BY r DESC, l_partkey LIMIT 10)
        UNION SELECT l_partkey FROM (SELECT l_partkey FROM rev
          WHERE isb = 1 ORDER BY r DESC, l_partkey LIMIT 10)),
      n10 AS (SELECT l_partkey, rr, row_number() OVER
          (ORDER BY rr DESC, l_partkey) AS rnk
        FROM (SELECT m.l_partkey, m.rr FROM merged m
          JOIN sb ON sb.l_partkey = m.l_partkey)
        ORDER BY rr DESC, l_partkey LIMIT 10),
      meq AS (SELECT min(CASE WHEN f.l_partkey = m.l_partkey
            AND f.rr = m.rr THEN 1 ELSE 0 END) AS m_eq
        FROM f10 f FULL JOIN m10 m USING (rnk)),
      neq AS (SELECT min(CASE WHEN f.l_partkey = n.l_partkey
            AND f.rr = n.rr THEN 1 ELSE 0 END) AS n_eq
        FROM f10 f FULL JOIN n10 n USING (rnk))
      SELECT rnk::BIGINT AS rnk, f10.l_partkey AS p_partkey,
        rr::DOUBLE AS revenue,
        (m_eq = 1) AS merge_equals_full,
        (n_eq = 1) AS naive_equals_full
      FROM f10, meq, neq ORDER BY rnk"""))

  val all: Seq[QueryDef] = Seq(q30, q481)
}
