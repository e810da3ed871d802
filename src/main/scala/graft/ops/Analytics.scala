package graft.ops

import graft.{Fixtures, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational-breadth operators the warehouse layer exposes beyond the
  * round-1 core (q01–q12): multi-level aggregation (ROLLUP) and set
  * operations. Both are pure Catalyst built-ins — the engine's job is
  * to declare them and let Expand/aggregate planning do the work.
  */
object Analytics {

  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** ROLLUP (priority, status): detail + subtotal + grand-total rows in
    * one pass (Spark plans a single Expand + hash aggregate — each input
    * row is replicated per grouping set map-side, still one shuffle).
    */
  private val q31 = QueryDef(
    "q31_rollup",
    (s, dir) => Fixtures.table(s, dir, "orders")
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first),
    Some("""SELECT o_orderpriority, o_orderstatus, count(*) AS n,
      cast(sum(cast(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
      ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST"""))

  /** INTERSECT / EXCEPT over the nation domains of two tables, tagged
    * and unioned. Set semantics (dedup built in); Spark plans these as
    * left-semi / left-anti aggregated joins.
    */
  private val q32 = QueryDef(
    "q32_setops",
    (s, dir) => {
      val c = Fixtures.table(s, dir, "customer")
        .select(col("c_nationkey").as("nationkey"))
      val p = Fixtures.table(s, dir, "supplier")
        .select(col("s_nationkey").as("nationkey"))
      c.intersect(p).withColumn("tag", lit("both"))
        .unionAll(c.except(p).withColumn("tag", lit("cust_only")))
        .unionAll(p.except(c).withColumn("tag", lit("supp_only")))
        .select(col("tag"), col("nationkey"))
        .orderBy("tag", "nationkey")
    },
    Some("""WITH c AS (SELECT c_nationkey AS nationkey FROM customer),
      p AS (SELECT s_nationkey AS nationkey FROM supplier)
      SELECT 'both' AS tag, nationkey FROM (SELECT * FROM c INTERSECT SELECT * FROM p)
      UNION ALL
      SELECT 'cust_only', nationkey FROM (SELECT * FROM c EXCEPT SELECT * FROM p)
      UNION ALL
      SELECT 'supp_only', nationkey FROM (SELECT * FROM p EXCEPT SELECT * FROM c)
      ORDER BY tag, nationkey"""))

  /** FULL OUTER join: per-nation counts of high-balance customers vs
    * high-balance suppliers — the filters make each side miss some
    * nations, so both outer sides are exercised. `coalesce` restores
    * the key and zero-fills the missing side.
    */
  private val q40 = QueryDef(
    "q40_full_outer",
    (s, dir) => {
      val c = Fixtures.table(s, dir, "customer")
        .where(col("c_acctbal") > 9000.0)
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
      val p = Fixtures.table(s, dir, "supplier")
        .where(col("s_acctbal") > 9000.0)
        .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
      c.join(p, col("c_nationkey") === col("s_nationkey"), "full_outer")
        .select(
          coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nationkey")
    },
    Some("""SELECT coalesce(c.nationkey, p.nationkey) AS nationkey,
      coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
      FROM (SELECT c_nationkey AS nationkey, count(*) AS n_cust
            FROM customer WHERE c_acctbal > 9000.0 GROUP BY 1) c
      FULL OUTER JOIN
           (SELECT s_nationkey AS nationkey, count(*) AS n_supp
            FROM supplier WHERE s_acctbal > 9000.0 GROUP BY 1) p
      ON c.nationkey = p.nationkey
      ORDER BY nationkey"""))

  val all: Seq[QueryDef] = Seq(q31, q32, q40)
}
