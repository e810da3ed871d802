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

  val all: Seq[QueryDef] = Seq(q30)
}
