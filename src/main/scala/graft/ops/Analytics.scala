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

  /** Order-independent exact sum of an exact-≤4-decimal double term.
    *
    * r16 (guide §1.2 per-task work): the old `cast(c AS DECIMAL(18,4))`
    * paid a Double.toString + BigDecimal parse per row. Every call site
    * feeds an exact ≤4-decimal rational (2-decimal money columns,
    * price×(1−disc) products, the Q9 profit difference — audited per
    * site), so `floor(c·10⁴ + 0.5)` recovers the same integer the
    * HALF_UP decimal cast produced (|c·10⁴ − k| < 2e-5 ≪ 0.5), the sum
    * lifts to DECIMAL(38,0) (compact adds, more headroom than the old
    * (28,4)), and ONE exact descale per group (/10⁴ at true scale ≤ 4
    * is exact in the (38,6) division result) feeds the same
    * cast-to-double — bit-identical results, oracle SQL unchanged.
    */
  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (sum(floor(c * lit(10000.0) + lit(0.5)).cast(DecimalType(38, 0)))
      / lit(10000)).cast(DoubleType)

  /** Per-order sorted distinct part baskets — shared by the basket
    * family (q158 pairs, q181 triples, q182 graph). */
  private def copurchaseBaskets(s: SparkSession, dir: String): DataFrame =
    PlanCache.getOrBuild(s, dir, "copurchase_baskets")(
      Fixtures.table(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("parts")))

  /** Co-purchase pair counts (part_a < part_b, n_orders) — the basket
    * family's most expensive aggregate (Σ C(b,2) exploded rows through
    * one shuffle); q158's lift report and q182's graph both start
    * here, so it materializes once per run. */
  private[ops] def copurchasePairs(s: SparkSession, dir: String): DataFrame =
    PlanCache.getOrBuild(s, dir, "copurchase_pairs")(
      copurchaseBaskets(s, dir)
        // graft_pairs replaces the interpreted flatten/transform/slice
        // HOF: same (i < j) struct rows from one codegen-reachable tight
        // loop, no O(b²) slice copies (r15; see expressions/BasketCombos)
        .select(explode(expr("graft_pairs(parts)")).as("p"))
        .select(col("p.part_a").as("part_a"), col("p.part_b").as("part_b"))
        .groupBy(col("part_a"), col("part_b"))
        .agg(count(lit(1)).as("n_orders")))

  /** Doubled (undirected) adjacency of the co-purchase graph — a
    * narrow projection over the cached pair list, so it carries no
    * cache entry of its own; the aggregates built on it below do.
    */
  private[ops] def copurchaseAdj(s: SparkSession, dir: String): DataFrame = {
    val pairs = copurchasePairs(s, dir).select(col("part_a"), col("part_b"))
    pairs.select(col("part_a").as("node"), col("part_b").as("nbr"))
      .union(pairs.select(col("part_b").as("node"), col("part_a").as("nbr")))
  }

  /** Per-node degree table (node, deg) of the co-purchase graph — one
    * 2|E|-row aggregate shared by every graph query on the unfiltered
    * graph (q294/q326/q340/q429/q439), materialized once per run.
    */
  private[ops] def copurchaseDegrees(s: SparkSession, dir: String): DataFrame =
    PlanCache.getOrBuild(s, dir, "copurchase_degree")(
      copurchaseAdj(s, dir).groupBy(col("node"))
        .agg(count(lit(1)).as("deg")))

  /** Adjacency annotated with the CENTER node's degree (node, nbr,
    * deg) — the df-cap filter input every capped wedge/candidate join
    * starts from (q294 [2,64], q429 [2,64], q439 <=64); sharing the
    * adj⋈deg join here saves each consumer a 2|E|-row shuffle.
    */
  private[ops] def copurchaseAdjDeg(s: SparkSession, dir: String): DataFrame =
    PlanCache.getOrBuild(s, dir, "copurchase_adj_deg")(
      copurchaseAdj(s, dir).join(copurchaseDegrees(s, dir), "node"))

  /** Degree table (n, d) of the REPEAT co-purchase graph (pairs with
    * n_orders >= 2) — the q373/q401 triangle family's graph.
    */
  private[ops] def copurchaseDeg2(s: SparkSession, dir: String): DataFrame =
    PlanCache.getOrBuild(s, dir, "copurchase_deg_min2")({
      val pairs = copurchasePairs(s, dir).where(col("n_orders") >= 2)
        .select(col("part_a").as("a"), col("part_b").as("b"))
      pairs.select(col("a").as("n")).unionAll(
          pairs.select(col("b").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
    })

  /** Doubled (u, v) adjacency of the REPEAT (support-≥2) co-purchase
    * graph — r16: q182, q207, q226 and q372 each re-derived this from
    * the pair cache, and every reference re-scanned the full ~1.2M-row
    * cached pair table to produce a ~7k-row edge list (the r15 session
    * leak used to hide the rebuilds; with per-query scratch release the
    * cost surfaced as +20–30 executor-cpu-s across the family). One
    * tiny shared materialization; consumers rename columns as needed.
    */
  private[ops] def copurchaseEdges2(s: SparkSession, dir: String): DataFrame =
    PlanCache.getOrBuild(s, dir, "copurchase_edges_min2")({
      val pairs = copurchasePairs(s, dir).where(col("n_orders") >= 2)
        .select(col("part_a"), col("part_b"))
      pairs.select(col("part_a").as("u"), col("part_b").as("v"))
        .unionAll(pairs.select(col("part_b").as("u"), col("part_a").as("v")))
    })

  /** Degree-ordered (Ortmann–Brandes) oriented edge list (a, b) over
    * the repeat co-purchase graph: edges point low→high under the
    * (deg, id) total order, so two-hop triangle enumeration's fan-out
    * is bounded O(√|E|) per node even at hubs. Three join sides per
    * consumer (q373, q401) and two consumers per run — one
    * materialization.
    */
  private[ops] def copurchaseOriented(s: SparkSession, dir: String): DataFrame =
    PlanCache.getOrBuild(s, dir, "copurchase_oriented")({
      val pairs = copurchasePairs(s, dir).where(col("n_orders") >= 2)
        .select(col("part_a").as("a"), col("part_b").as("b"))
      val deg = copurchaseDeg2(s, dir)
      val lowFirst = col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b"))
      pairs
        .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
        .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
        .select(when(lowFirst, col("a")).otherwise(col("b")).as("a"),
          when(lowFirst, col("b")).otherwise(col("a")).as("b"))
    })

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

  /** Window-function breadth: ranking (rank/dense_rank/ntile),
    * distribution (percent_rank/cume_dist — both single divisions of
    * ints, so cross-engine exact), and a running sum in DECIMAL (a
    * running double sum would be bit-exact only if both engines
    * accumulate in the same association order, which sliding-window
    * implementations do not guarantee — DECIMAL is order-independent).
    * One shuffle + one sort per partition key, all functions share the
    * same window.
    */
  private val q41 = QueryDef(
    "q41_window_stats",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Fixtures.table(s, dir, "orders")
        .where(col("o_totalprice") > 350000.0)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .withColumn("run_sum",
          sum(col("o_totalprice").cast(DecimalType(18, 4)))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(DoubleType))
        .orderBy("o_orderstatus", "rnk")
    },
    Some("""SELECT o_orderstatus, o_orderkey, o_totalprice,
      rank() OVER w AS rnk,
      dense_rank() OVER w AS drnk,
      ntile(4) OVER w AS quartile,
      percent_rank() OVER w AS pct_rank,
      cume_dist() OVER w AS cume,
      cast(sum(cast(o_totalprice AS DECIMAL(18,4)))
        OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS run_sum
      FROM orders WHERE o_totalprice > 350000.0
      WINDOW w AS (PARTITION BY o_orderstatus
        ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_orderstatus, rnk"""))

  /** Pivot as conditional aggregation (the portable formulation; Spark's
    * .pivot() plans the identical aggregate, but explicit CASE columns
    * pin the output names for the oracle). Wide-format order counts and
    * exact sums per priority × status.
    */
  private val q42 = QueryDef(
    "q42_pivot",
    (s, dir) => {
      val statuses = Seq("F", "O", "P")
      val o = Fixtures.table(s, dir, "orders")
      o.groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
          statuses.tail.map(st =>
            sum(when(col("o_orderstatus") === st, 1).otherwise(0))
              .as(s"n_${st.toLowerCase}")) ++
          statuses.map(st =>
            sum(when(col("o_orderstatus") === st,
              col("o_totalprice").cast(DecimalType(18, 4)))
              .otherwise(lit(0).cast(DecimalType(18, 4))))
              .cast(DoubleType).as(s"sum_${st.toLowerCase}")): _*)
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
      sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS n_f,
      sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS n_o,
      sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS n_p,
      cast(sum(CASE WHEN o_orderstatus = 'F'
        THEN cast(o_totalprice AS DECIMAL(18,4))
        ELSE cast(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS sum_f,
      cast(sum(CASE WHEN o_orderstatus = 'O'
        THEN cast(o_totalprice AS DECIMAL(18,4))
        ELSE cast(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS sum_o,
      cast(sum(CASE WHEN o_orderstatus = 'P'
        THEN cast(o_totalprice AS DECIMAL(18,4))
        ELSE cast(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS sum_p
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** CUBE over (priority, status) with an explicit grouping_id — all
    * four grouping sets in one Expand pass. grouping_id disambiguates
    * "NULL because subtotal" from a (hypothetical) NULL group value,
    * and Spark's bitmask convention matches DuckDB's GROUPING().
    */
  private val q45 = QueryDef(
    "q45_cube",
    (s, dir) => Fixtures.table(s, dir, "orders")
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("gid"), col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first),
    Some("""SELECT o_orderpriority, o_orderstatus,
      GROUPING(o_orderpriority, o_orderstatus) AS gid, count(*) AS n,
      cast(sum(cast(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
      ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST"""))

  /** Deterministic equi-width histogram — the portable alternative to
    * engine-specific histogram sketches: bin = floor(value / width) in
    * exact arithmetic, one hash aggregation. The standard first look at
    * any numeric column's distribution at scale (map-side partials;
    * cardinality = #bins regardless of input size).
    */
  private val q46 = QueryDef(
    "q46_histogram",
    (s, dir) => Fixtures.table(s, dir, "orders")
      .select((floor(col("o_totalprice") / 50000.0)).cast("long").as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bin"),
    Some("""SELECT cast(floor(o_totalprice / 50000.0) AS BIGINT) AS bin,
      count(*) AS n FROM orders GROUP BY 1 ORDER BY bin"""))

  // ---------- q58: z-score outlier detection --------------------------

  /** Per-group z-score outliers over event values: mean and variance
    * from exact DECIMAL sums (order-independent), widened to double
    * only for the final identical-on-both-engines expression
    * `(x − μ) / sqrt(σ²)`, so flags hash-match bit-exactly. Shape:
    * one small per-group aggregate broadcast back over the events —
    * the two-pass variance formulation that distributes cleanly
    * (Welford's single-pass is execution-order-dependent and could
    * never cross-engine match). Output: only the outliers, so result
    * size tracks anomalies, not events.
    */
  private val q58 = QueryDef(
    "q58_outliers",
    (s, dir) => {
      val e = Fixtures.table(s, dir, "events")
      val stats = e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(28, 6))).as("s1"),
          sum((col("value") * col("value")).cast(DecimalType(28, 6))).as("s2"))
        .select(col("event_type"),
          (col("s1").cast(DoubleType) / col("n")).as("mu"),
          ((col("s2").cast(DoubleType) - col("s1").cast(DoubleType)
            * col("s1").cast(DoubleType) / col("n")) / col("n")).as("variance"))
      e.join(broadcast(stats), "event_type")
        .select(col("event_type"), col("event_id"), col("value"),
          ((col("value") - col("mu")) / sqrt(col("variance"))).as("z"))
        .where(abs(col("z")) > lit(3.0))
        .orderBy("event_type", "event_id")
    },
    Some("""WITH stats AS (SELECT event_type, count(*) AS n,
        sum(cast(value AS DECIMAL(28,6))) AS s1,
        sum(cast(value * value AS DECIMAL(28,6))) AS s2
        FROM events GROUP BY 1),
      m AS (SELECT event_type, s1::DOUBLE / n AS mu,
        (s2::DOUBLE - s1::DOUBLE * s1::DOUBLE / n) / n AS variance
        FROM stats)
      SELECT e.event_type, event_id, value,
        (value - mu) / sqrt(variance) AS z
      FROM events e JOIN m ON m.event_type = e.event_type
      WHERE abs((value - mu) / sqrt(variance)) > 3.0
      ORDER BY e.event_type, event_id"""))

  // ---------- q59: time-series gap fill -------------------------------

  /** Dense daily series per event type with explicit zero rows for
    * silent days — the resample/gap-fill every time-series consumer
    * needs before diffing or windowing (a missing day must read as 0,
    * not as absent). The day spine is generated from the observed
    * [min, max] range (integer epoch-days — exact) and cross-joined
    * with the type dimension, then the sparse counts left-join on.
    * Spine cardinality = days × types regardless of event volume, so
    * the dense side stays tiny while the counts side is one hash agg.
    */
  private val q59 = QueryDef(
    "q59_gapfill",
    (s, dir) => {
      val e = Fixtures.table(s, dir, "events")
        .select(col("event_type"),
          expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)" +
            " div 86400000000").as("day"))
      val counts = e.groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"))
      val range = e.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(explode(expr("sequence(d0, d1)")).as("day"))
      val types = e.select(col("event_type")).distinct()
      range.crossJoin(types)
        .join(counts, Seq("event_type", "day"), "left_outer")
        .select(col("event_type"), col("day"),
          coalesce(col("n"), lit(0L)).as("n"))
        .orderBy("event_type", "day")
    },
    Some("""WITH days AS (SELECT event_type,
        epoch_us(ts) // 86400000000 AS day FROM events),
      counts AS (SELECT event_type, day, count(*) AS n
        FROM days GROUP BY 1, 2),
      spine AS (SELECT unnest(range((SELECT min(day) FROM days),
        (SELECT max(day) FROM days) + 1)) AS day),
      types AS (SELECT DISTINCT event_type FROM days)
      SELECT event_type, day, coalesce(n, 0) AS n
      FROM spine CROSS JOIN types
      LEFT JOIN counts USING (event_type, day)
      ORDER BY event_type, day"""))

  // ---------- q60: fixed-point PageRank over the trade graph ----------

  private val prScale = 1000000000000L // rank × 10¹²
  private val prIters = 5

  /** PageRank over the nation-level trade graph (customer nation →
    * supplier nation, edge weight = lineitem count), `prIters` unrolled
    * iterations in scaled-integer fixed point so every step is exact
    * BIGINT arithmetic: damping 0.85 becomes the integer identity
    * rank' = 3·S/(20·N) + 17·Σ⌊rank·w/outw⌋/20, where every operand is
    * positive so Spark's truncating `div` and DuckDB's flooring `//`
    * agree. Double-precision PageRank could never cross-engine
    * hash-match (summation order changes the low bits); fixed point
    * makes the whole fixpoint iteration order-independent.
    *
    * Distributed shape: the edge build is the only large work — the
    * lineitem⋈orders shuffle with both dimension joins broadcast —
    * aggregated down to ≤|V|² weighted edges and persisted (PlanCache)
    * so the 5 unrolled iterations don't replay it. Each iteration is
    * then one join + hash aggregate over the edge list with the rank
    * vector as the small side — the classic edge-partitioned PageRank
    * layout: at 100 TB the edge list partitions across executors and
    * the rank vector stays the broadcast side.
    *
    * Oracle: the same unrolled chain as five DuckDB CTEs, generated
    * from the same iteration count so the dialects cannot drift.
    */
  private val q60 = QueryDef(
    "q60_pagerank",
    (s, dir) => {
      val edges = PlanCache.getOrBuild(s, dir, "trade_edges") {
        val cust = Fixtures.table(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey").cast("long").as("u"))
        val supp = Fixtures.table(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey").cast("long").as("v"))
        Fixtures.table(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
          .join(Fixtures.table(s, dir, "orders")
            .select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))
      }
      val outw = edges.groupBy(col("u")).agg(sum(col("w")).as("ow"))
      val nodes = Fixtures.table(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as("node"))
      val nv = nodes.agg(count(lit(1)).as("nv"))
      var ranks = nodes.crossJoin(nv)
        .select(col("node"), expr(s"$prScale div nv").as("rank"))
      for (_ <- 1 to prIters) {
        val contrib = ranks.withColumnRenamed("node", "u")
          .join(edges, "u").join(outw, "u")
          .select(col("v").as("node"), expr("(rank * w) div ow").as("c"))
          .groupBy(col("node")).agg(sum(col("c")).as("contrib"))
        ranks = nodes.crossJoin(nv)
          .join(contrib, Seq("node"), "left_outer")
          .select(col("node"),
            expr(s"${3 * prScale} div (20 * nv) " +
              "+ (17 * coalesce(contrib, cast(0 AS BIGINT))) div 20")
              .as("rank"))
      }
      ranks.select(col("node").as("nationkey"), col("rank").as("pr_fp"))
        .orderBy("nationkey")
    },
    Some {
      val step = (i: Int) =>
        s"""pr$i AS (SELECT n.node,
          ((${3 * prScale} // (20 * nn.n))
            + (17 * COALESCE(c.s, 0)) // 20)::BIGINT AS rank
        FROM nodes n CROSS JOIN nn
        LEFT JOIN (SELECT e.v AS node, sum((p.rank * e.w) // o.ow)::BIGINT AS s
                   FROM pr${i - 1} p JOIN edges e ON e.u = p.node
                   JOIN outw o ON o.u = p.node GROUP BY e.v) c
          ON c.node = n.node)"""
      s"""WITH edges AS (
        SELECT c.c_nationkey::BIGINT AS u, s.s_nationkey::BIGINT AS v,
               count(*)::BIGINT AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2),
      outw AS (SELECT u, sum(w)::BIGINT AS ow FROM edges GROUP BY u),
      nodes AS (SELECT n_nationkey::BIGINT AS node FROM nation),
      nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
      pr0 AS (SELECT node, ($prScale // nn.n)::BIGINT AS rank
              FROM nodes, nn),
      ${(1 to prIters).map(step).mkString(",\n      ")}
      SELECT node AS nationkey, rank AS pr_fp FROM pr$prIters
      ORDER BY nationkey"""
    })

  // ---------- q71: order-independent table checksum -------------------

  /** Replication / export validation checksum — the anti-entropy
    * primitive: per customer segment, a row-count plus a `bit_xor` fold
    * of the portable h32 over a canonical row rendering. XOR is
    * commutative-associative, so the checksum is independent of row
    * order, partitioning, AND engine — source and replica compare one
    * tiny row per segment instead of moving data (the scalable form of
    * the reference's per-table MD5 digest, SURVEY §2.4, which hashes a
    * serialized whole table and so needs a total order). Doubles are
    * excluded from the rendering: float formatting is engine-specific;
    * checksum the exact columns, validate doubles via q58-style stats.
    *
    * Shape: one map-side-combined hash aggregate, output ∝ segments.
    */
  private val q71 = QueryDef(
    "q71_table_checksum",
    (s, dir) => {
      import graft.ops.Portable.h32Spark
      Fixtures.table(s, dir, "customer")
        .select(col("c_mktsegment"), expr(h32Spark(
          "concat_ws('|', c_custkey, c_name, c_nationkey)")).as("h"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(h)").as("xor_sig"))
        .orderBy("c_mktsegment")
    },
    Some(s"""SELECT c_mktsegment, count(*)::BIGINT AS n_rows,
        bit_xor(${graft.ops.Portable.h32Duck(
      "c_custkey::VARCHAR || '|' || c_name || '|' || c_nationkey::VARCHAR")})
          AS xor_sig
      FROM customer GROUP BY 1 ORDER BY c_mktsegment"""))

  // ---------- q74: equi-depth (quantile-bucket) histogram -------------

  /** Decile histogram of order value per status — the equi-DEPTH
    * complement of q46's equi-width bins: `ntile(10)` splits each
    * status's orders into ten equal-count buckets and the output is
    * each bucket's [lo, hi] value range and population. Equi-depth is
    * what an optimizer's column statistics and a skew report actually
    * want (equi-width collapses under heavy-tailed value
    * distributions — most rows land in one bin). The ntile ordering is
    * made TOTAL with the (value, key) tie-break, so bucket assignment
    * — and therefore every bucket boundary — is deterministic and
    * engine-independent; lo/hi are selections, never arithmetic.
    *
    * Shape: one window sort per status partition, then a hash
    * aggregate on (status, bucket) — same two-exchange plan class as
    * every order-statistic query here; at 100 TB use the two-pass
    * count + global-sort-position selection exactly as q36 notes.
    */
  private val q74 = QueryDef(
    "q74_equidepth",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Fixtures.table(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("bucket", ntile(10).over(w))
        .groupBy(col("o_orderstatus"), col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy("o_orderstatus", "bucket")
    },
    Some("""WITH b AS (SELECT o_orderstatus, o_totalprice,
        ntile(10) OVER (PARTITION BY o_orderstatus
          ORDER BY o_totalprice, o_orderkey) AS bucket
        FROM orders)
      SELECT o_orderstatus, bucket, count(*)::BIGINT AS n,
        min(o_totalprice) AS lo, max(o_totalprice) AS hi
      FROM b GROUP BY 1, 2 ORDER BY o_orderstatus, bucket"""))

  // ---------- q77: multi-way star join (regional revenue) -------------

  /** Revenue by nation for intra-nation trade inside one region and one
    * order year — the TPC-H Q5 plan shape: the lineitem fact stream
    * joins orders on the shuffle key, while customer, supplier, nation
    * and region are all BROADCAST dimensions (nation/region pre-joined
    * and reduced to a nationkey list before touching the fact side).
    * The co-nation predicate (customer's nation = supplier's nation)
    * runs as a post-broadcast filter, never a join explosion. Revenue
    * follows the DECIMAL-term convention: price·(1−discount) is two
    * IEEE ops identical on both engines, the per-row product is cast to
    * DECIMAL for the order-independent sum, and only the final sum
    * returns to double.
    *
    * At 100 TB the only shuffle is lineitem⋈orders on orderkey (AQE
    * picks SMJ or bucketed co-location); every dimension stays
    * broadcast — the canonical star-join layout.
    */
  private val q77 = QueryDef(
    "q77_regional_revenue",
    (s, dir) => {
      val asiaNations = Fixtures.table(s, dir, "nation")
        .join(Fixtures.table(s, dir, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA")
        .select(col("n_nationkey"), col("n_name"))
      val cust = Fixtures.table(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val supp = Fixtures.table(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      Fixtures.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(Fixtures.table(s, dir, "orders")
          .where(expr("o_orderdate >= TIMESTAMP '1996-01-01' AND " +
            "o_orderdate < TIMESTAMP '1997-01-01'"))
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .where(col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(expr("cast(l_extendedprice * (1.0 - l_discount) " +
          "AS DECIMAL(18,4))")).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name,
        cast(sum(cast(l_extendedprice * (1.0 - l_discount)
          AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        count(*)::BIGINT AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
        AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
      GROUP BY 1 ORDER BY revenue DESC, n_name"""))

  // ---------- q75: Pearson correlation from exact moments -------------

  /** Correlation between an order's value and its line-item count, per
    * priority — computed from the five moment sums (Σx, Σy, Σxy, Σx²,
    * Σy²) accumulated as exact DECIMALs, with the Pearson formula
    * applied once at the end in double. Engine corr() built-ins use
    * streaming covariance updates whose result depends on accumulation
    * order — unmatchable across engines; exact integer/decimal moments
    * make the aggregation order-independent, and the final formula is
    * textually identical on both sides, so even its floating-point
    * rounding agrees bit-for-bit (the q35 estimate-arithmetic rule).
    *
    * Shape: lineitem collapses to (orderkey, count) in a map-side
    * combined aggregate, joins orders on the key, then one moments
    * aggregate per priority — two shuffles, output 5 rows. At 100 TB
    * the per-order count is the only large intermediate and it is
    * one row per order.
    */
  private val q75 = QueryDef(
    "q75_correlation",
    (s, dir) => {
      // r16 (guide §1.2, §2.3 narrower types — the q233 pattern): the
      // DECIMAL(18,4) moments paid per-order-row one double→decimal
      // cast and three BigDecimal multiplies (x·y and x² exceed
      // precision 18, leaving the compact-long fast path). x is an
      // exact 2-decimal value, so the SAME rational moments come from
      // xl = 100·x in plain long (floor(v·100+0.5) recovers the
      // integer exactly), per-row products in long (xl² ≤ 3.6e15),
      // sums in DECIMAL(38,0), and one exact descale per GROUP (5
      // rows): S/10⁴ at true scale ≤ 4 is exact in the (38,6) HALF_UP
      // result, so every cast-to-double sees the bit-identical value
      // the decimal plan produced. Oracle SQL unchanged.
      val li = Fixtures.table(s, dir, "lineitem")
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("y"))
      Fixtures.table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            .as("xl"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("xl").cast(DecimalType(38, 0))).as("sxl"),
          sum(col("y")).as("sy"),
          sum((col("xl") * col("y")).cast(DecimalType(38, 0))).as("sxyl"),
          sum((col("xl") * col("xl")).cast(DecimalType(38, 0))).as("sxxl"),
          sum(col("y") * col("y")).as("syy"))
        .selectExpr("o_orderpriority", "n", "sxl / 100 AS sx", "sy",
          "sxyl / 100 AS sxy", "sxxl / 10000 AS sxx", "syy")
        .selectExpr("o_orderpriority", "n",
          // round to 12 decimals: the formula is textually identical on
          // both engines, but the wide-DECIMAL→DOUBLE input conversions
          // round differently in the last ulp; 12 digits is far beyond
          // any statistical meaning of r and both engines' round()
          // reduce to one correctly-rounded division by 10^12
          "round((cast(n AS DOUBLE) * cast(sxy AS DOUBLE) - " +
            "cast(sx AS DOUBLE) * cast(sy AS DOUBLE)) / " +
            "(sqrt(cast(n AS DOUBLE) * cast(sxx AS DOUBLE) - " +
            "cast(sx AS DOUBLE) * cast(sx AS DOUBLE)) * " +
            "sqrt(cast(n AS DOUBLE) * cast(syy AS DOUBLE) - " +
            "cast(sy AS DOUBLE) * cast(sy AS DOUBLE))), 12) AS r")
        .orderBy("o_orderpriority")
    },
    // oracle x is DECIMAL(19,4): DuckDB's product type is p1+p2 wide, so
    // 19+19 = 38 keeps x*x inside DECIMAL(38,8) (18+18 would overflow
    // at input width before promotion); the VALUES are identical
    Some("""WITH pairs AS (
        SELECT o_orderpriority, cast(o_totalprice AS DECIMAL(19,4)) AS x,
          y FROM orders JOIN (
            SELECT l_orderkey, count(*)::BIGINT AS y
            FROM lineitem GROUP BY 1) li
          ON o_orderkey = l_orderkey),
      m AS (SELECT o_orderpriority, count(*)::BIGINT AS n,
          sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
          sum(x * x) AS sxx, sum(y * y) AS syy
        FROM pairs GROUP BY 1)
      SELECT o_orderpriority, n,
        round((cast(n AS DOUBLE) * cast(sxy AS DOUBLE) -
          cast(sx AS DOUBLE) * cast(sy AS DOUBLE)) /
          (sqrt(cast(n AS DOUBLE) * cast(sxx AS DOUBLE) -
          cast(sx AS DOUBLE) * cast(sx AS DOUBLE)) *
          sqrt(cast(n AS DOUBLE) * cast(syy AS DOUBLE) -
          cast(sy AS DOUBLE) * cast(sy AS DOUBLE))), 12) AS r
      FROM m ORDER BY o_orderpriority"""))

  // ---------- q88: robust outliers via MAD ----------------------------

  /** Median-absolute-deviation outlier detection per event type — the
    * robust twin of q58's z-score: a single extreme value inflates the
    * mean AND the stddev (masking itself), while the median/MAD pair is
    * immune to 50 % contamination. Both medians are exact lower-median
    * rank selections (the q36 contract: row_number with an id
    * tie-break, never interpolation — so no percentile formula can
    * diverge between engines), deviations are exact IEEE subtractions
    * of stored doubles, and the 3×MAD cut is one multiply both sides.
    * Shape: two windowed rank-selection passes over the same
    * event_type partitioning (the second over deviations), medians
    * broadcast back — the event payload shuffles twice on the same
    * key; at 100 TB the medians would come from a two-pass kth-select
    * instead of a full partition sort, same contract.
    */
  private val q88 = QueryDef(
    "q88_mad_outliers",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Fixtures.table(s, dir, "events")
        .select(col("event_type"), col("event_id"), col("value"))
      def lowerMedian(df: DataFrame, c: String, out: String): DataFrame = {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col(c), col("event_id"))
        val wa = Window.partitionBy(col("event_type"))
        df.withColumn("rn", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(wa))
          .where(expr("rn = (cnt + 1) div 2"))
          .select(col("event_type"), col(c).as(out))
      }
      val med = lowerMedian(e, "value", "med")
      val dev = e.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("value") - col("med")))
      val mad = lowerMedian(dev, "adev", "mad")
      dev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(first(col("med")).as("med"), first(col("mad")).as("mad"),
          sum(when(col("adev") > lit(3.0) * col("mad"), 1L)
            .otherwise(0L)).as("n_out"))
        .orderBy("event_type")
    },
    Some("""WITH e AS (SELECT event_type, event_id, value FROM events),
      r1 AS (SELECT event_type, value,
        row_number() OVER (PARTITION BY event_type
          ORDER BY value, event_id) AS rn,
        count(*) OVER (PARTITION BY event_type) AS cnt FROM e),
      med AS (SELECT event_type, value AS med FROM r1
        WHERE rn = (cnt + 1) // 2),
      dev AS (SELECT e.event_type, event_id,
          abs(value - med) AS adev, med
        FROM e JOIN med ON med.event_type = e.event_type),
      r2 AS (SELECT event_type, adev,
        row_number() OVER (PARTITION BY event_type
          ORDER BY adev, event_id) AS rn,
        count(*) OVER (PARTITION BY event_type) AS cnt FROM dev),
      mad AS (SELECT event_type, adev AS mad FROM r2
        WHERE rn = (cnt + 1) // 2)
      SELECT dev.event_type, min(dev.med) AS med, min(mad.mad) AS mad,
        sum(CASE WHEN adev > 3.0 * mad.mad THEN 1 ELSE 0 END)::BIGINT
          AS n_out
      FROM dev JOIN mad ON mad.event_type = dev.event_type
      GROUP BY dev.event_type ORDER BY dev.event_type"""))

  // ---------- q89: partition-skew report ------------------------------

  /** Per-key cardinality skew diagnostics over the lineitem→supplier
    * foreign key — the profile that decides whether a planned shuffle
    * needs salting (`SkewJoin`) or AQE skew splitting BEFORE running
    * the join: key count, max/mean ratio, and exact p50/p90/p99 of the
    * per-key row counts. Two aggregations: rows → per-key counts (one
    * shuffle, map-side partials), then the KEY-cardinality-sized count
    * table → one exact global rank selection through the RangeNtile
    * boundary-broadcast row_number (per-shard sorts only — a 10 M+-key
    * fact's count table no longer funnels through one task;
    * graft.ntile.strategy=window restores the single-sort window form
    * the equality spec compares against). The key count rides a 1-row
    * broadcast scalar instead of an unpartitioned count window. mean
    * is one BIGINT/BIGINT division; skew is one division of that
    * exact pair.
    */
  private val q89 = QueryDef(
    "q89_skew_report",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val counts = Fixtures.table(s, dir, "lineitem")
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("c"))
      val sortKey = Seq(col("c"), col("l_suppkey"))
      val ranked =
        if (s.conf.getOption("graft.ntile.strategy").contains("window"))
          counts.withColumn("rn",
            row_number().over(Window.orderBy(sortKey: _*)).cast("long"))
        else RangeNtile.withRowNumber(counts, sortKey, "rn")
      val nkAgg = counts.agg(count(lit(1)).as("nk"))
      val r = ranked.crossJoin(broadcast(nkAgg))
      def pick(p: Double, out: String) =
        max(when(col("rn") ===
          ceil(lit(p) * col("nk")).cast("long"), col("c"))).as(out)
      r.agg(max(col("nk")).as("n_keys"), sum(col("c")).as("n_rows"),
          max(col("c")).as("max_c"), pick(0.5, "p50"), pick(0.9, "p90"),
          pick(0.99, "p99"))
        .select(col("n_keys"), col("n_rows"), col("max_c"),
          col("p50"), col("p90"), col("p99"),
          (col("max_c") / (col("n_rows") / col("n_keys"))).as("skew"))
    },
    Some("""WITH counts AS (SELECT l_suppkey, count(*) AS c
        FROM lineitem GROUP BY 1),
      r AS (SELECT c, row_number() OVER (ORDER BY c, l_suppkey) AS rn
        FROM counts),
      n AS (SELECT count(*)::BIGINT AS n_keys,
        sum(c)::BIGINT AS n_rows, max(c)::BIGINT AS max_c FROM counts)
      SELECT n_keys, n_rows, max_c,
        (SELECT c FROM r, n WHERE rn = ceil(0.5 * n_keys)::BIGINT)
          ::BIGINT AS p50,
        (SELECT c FROM r, n WHERE rn = ceil(0.9 * n_keys)::BIGINT)
          ::BIGINT AS p90,
        (SELECT c FROM r, n WHERE rn = ceil(0.99 * n_keys)::BIGINT)
          ::BIGINT AS p99,
        max_c / (n_rows / n_keys) AS skew
      FROM n"""))

  // ---------- q94: explicit grouping sets -----------------------------

  /** GROUPING SETS ((priority, status), (priority), ()) — the
    * middle ground rollup (q31) and cube (q45) can't express: an
    * arbitrary, non-prefix list of aggregation levels in ONE pass
    * (a reporting layer asks for exactly the cells it renders, not a
    * lattice). Keys are coalesced to 'ALL' so the level marker is a
    * plain string on both engines, plus the explicit grouping-bit gid
    * (grouping(a)·2 + grouping(b) — engine-neutral, unlike the
    * engines' differently-ordered native grouping_id builtins).
    * Aggregates: exact count + DECIMAL-summed revenue cast to double
    * once. Spark expands to a union-style Expand node feeding ONE
    * hash aggregate — each input row contributes to all three levels
    * in a single shuffle, the same partial-agg property as a plain
    * groupBy; output is cells, not rows.
    */
  private val q94 = QueryDef(
    "q94_grouping_sets",
    (s, dir) => {
      val o = Fixtures.table(s, dir, "orders")
      o.groupingSets(
          Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
            Seq(col("o_orderpriority")), Seq()),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg((grouping(col("o_orderpriority")) * 2
            + grouping(col("o_orderstatus"))).cast("long").as("gid"),
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(28, 6)))
            .cast("double").as("revenue"))
        .select(col("gid"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n_orders"), col("revenue"))
        .orderBy("gid", "priority", "status")
    },
    Some("""SELECT (grouping(o_orderpriority) * 2
          + grouping(o_orderstatus))::BIGINT AS gid,
        coalesce(o_orderpriority, 'ALL') AS priority,
        coalesce(o_orderstatus, 'ALL') AS status,
        count(*)::BIGINT AS n_orders,
        sum(cast(o_totalprice AS DECIMAL(28,6)))::DOUBLE AS revenue
      FROM orders
      GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
        (o_orderpriority), ())
      ORDER BY gid, priority, status"""))

  // ---------- q105: PSI feature drift ---------------------------------

  /** Population Stability Index between a reference slice (80 %,
    * event_id % 10 ≥ 2) and a current slice (20 %) of the event value
    * distribution — the standard train/serve drift alarm (PSI < 0.1
    * stable, > 0.25 investigate). Deciles are cut on the COMBINED
    * population by ntile(10) under a (value, event_id) total order
    * (engine-exact, the q74 contract), so both slices are bucketed by
    * one shared rule; per-bucket shares are exact-int divisions, the
    * (pa−pb)·ln(pa/pb) term is pinned to integer nano-units (q96
    * rule) with an explicit both-sides-nonzero guard standing in for
    * the usual epsilon, and PSI is the exact unit sum — repeated per
    * row via an unpartitioned window over the 10-row bucket table.
    * Shape: the decile cut over ALL events runs the two-pass
    * quantile-boundary-broadcast ntile (RangeNtile, per-shard sorts
    * only — the q149 default; graft.ntile.strategy=window restores
    * the single-sort window form the spec compares against), then
    * constant-size aggregates.
    */
  private val q105 = QueryDef(
    "q105_psi_drift",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val vals = Fixtures.table(s, dir, "events")
        .select(col("event_id"), col("value"))
      val sortKey = Seq(col("value"), col("event_id"))
      val labeled =
        if (s.conf.getOption("graft.ntile.strategy").contains("window"))
          vals.withColumn("bucket",
            ntile(10).over(Window.orderBy(sortKey: _*)).cast("long"))
        else RangeNtile.withNtile(vals, sortKey, 10, "bucket")
      val b = labeled
        .withColumn("cur", (col("event_id") % 10 < 2).cast("long"))
      val agg = b.groupBy(col("bucket"))
        .agg(sum(lit(1L) - col("cur")).as("n_ref"), sum(col("cur")).as("n_cur"))
      val tot = agg.agg(sum(col("n_ref")).as("t_ref"), sum(col("n_cur")).as("t_cur"))
      val units = agg.crossJoin(broadcast(tot))
        .withColumn("pa", col("n_ref").cast("double") / col("t_ref"))
        .withColumn("pb", col("n_cur").cast("double") / col("t_cur"))
        .withColumn("units", when(col("n_ref") > 0 && col("n_cur") > 0,
          round((col("pa") - col("pb")) * log(col("pa") / col("pb"))
            * lit(1e9)).cast("long")).otherwise(0L))
      // the PSI total repeats on every row: a 1-row broadcast scalar
      // (exact int sum), not an unpartitioned window — same values,
      // no single-partition WindowExec even over the 10-row table
      val psum = units.agg(sum(col("units")).as("su"))
      units.crossJoin(broadcast(psum))
        .withColumn("psi", col("su").cast("double") / lit(1e9))
        .select(col("bucket"), col("n_ref"), col("n_cur"),
          col("pa"), col("pb"), col("psi"))
        .orderBy("bucket")
    },
    Some("""WITH b AS (SELECT event_id, value,
        ntile(10) OVER (ORDER BY value, event_id) AS bucket,
        CASE WHEN event_id % 10 < 2 THEN 1 ELSE 0 END AS cur
      FROM events),
      agg AS (SELECT bucket, sum(1 - cur) AS n_ref, sum(cur) AS n_cur
        FROM b GROUP BY 1),
      tot AS (SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM agg),
      terms AS (SELECT bucket, n_ref, n_cur,
          n_ref::DOUBLE / t_ref AS pa, n_cur::DOUBLE / t_cur AS pb,
          CASE WHEN n_ref > 0 AND n_cur > 0 THEN
            round((n_ref::DOUBLE / t_ref - n_cur::DOUBLE / t_cur)
              * ln((n_ref::DOUBLE / t_ref) / (n_cur::DOUBLE / t_cur))
              * 1e9)::BIGINT
          ELSE 0 END AS units
        FROM agg, tot)
      SELECT bucket::BIGINT AS bucket, n_ref::BIGINT AS n_ref,
        n_cur::BIGINT AS n_cur, pa, pb,
        (sum(units) OVER ())::DOUBLE / 1e9 AS psi
      FROM terms ORDER BY bucket"""))

  // ---------- q114: two-sample Kolmogorov–Smirnov drift ----------------

  /** Two-sample KS statistic between the same reference/current event
    * slices q105 buckets (ref = event_id % 10 ≥ 2, cur = < 2), over the
    * raw `value` distribution — the distribution-free companion to
    * PSI: D = max |F_ref(x) − F_cur(x)| sees shape drift that decile
    * binning smooths away, and needs no bucket-count choice at all.
    * Exactness: per-distinct-value slice counts, one running-sum window
    * for both CDFs, and the max gap compared as the INTEGER cross
    * product |c_ref·n_cur − c_cur·n_ref| — every comparison exact
    * int64 (at 100 TB widen to DECIMAL(38,0)); the only division is
    * D itself, once, on the single surviving row. The argmax value is
    * made deterministic by the (gap DESC, value ASC) total order.
    * Shape: one hash agg on value, then — because `value` is a
    * continuous double, so distinct values ≈ rows at corpus scale —
    * the running CDF rides RangeNtile.withRunningSums (range shards on
    * value + broadcast per-shard prefix offsets; per-shard sorts only;
    * graft.ntile.strategy=window restores the single-sort window form
    * the equality spec compares against), 1-row output.
    */
  private val q114 = QueryDef(
    "q114_ks_drift",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val sl = Fixtures.table(s, dir, "events")
        .select(col("value"), (col("event_id") % 10 < 2).cast("long").as("cur"))
      val pv = sl.groupBy(col("value"))
        .agg(sum(lit(1L) - col("cur")).as("da"), sum(col("cur")).as("db"))
      val tot = pv.agg(sum(col("da")).as("n_ref"), sum(col("db")).as("n_cur"))
      val cdf =
        if (s.conf.getOption("graft.ntile.strategy").contains("window")) {
          val w = Window.orderBy(col("value"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          pv.withColumn("ca", sum(col("da")).over(w))
            .withColumn("cb", sum(col("db")).over(w))
        } else RangeNtile.withRunningSums(pv, Seq(col("value")),
          Seq("da" -> "ca", "db" -> "cb"))
      cdf.crossJoin(broadcast(tot))
        .withColumn("gap", abs(col("ca") * col("n_cur") - col("cb") * col("n_ref")))
        .orderBy(col("gap").desc, col("value"))
        .limit(1)
        .select(col("n_ref"), col("n_cur"), col("value").as("ks_at"),
          (col("gap").cast("double")
            / (col("n_ref") * col("n_cur")).cast("double")).as("d_stat"))
    },
    Some("""WITH sl AS (SELECT value,
        CASE WHEN event_id % 10 < 2 THEN 1 ELSE 0 END AS cur FROM events),
      pv AS (SELECT value, sum(1 - cur)::BIGINT AS da, sum(cur)::BIGINT AS db
        FROM sl GROUP BY 1),
      tot AS (SELECT sum(da)::BIGINT AS n_ref, sum(db)::BIGINT AS n_cur FROM pv),
      cdf AS (SELECT value,
          sum(da) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)::BIGINT AS ca,
          sum(db) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)::BIGINT AS cb
        FROM pv)
      SELECT n_ref, n_cur, value AS ks_at,
        abs(ca * n_cur - cb * n_ref)::DOUBLE / (n_ref * n_cur)::DOUBLE AS d_stat
      FROM cdf, tot
      ORDER BY abs(ca * n_cur - cb * n_ref) DESC, value LIMIT 1"""))

  // ---------- q147: lognormal parameter fit ----------------------------

  /** Per-priority lognormal fit of order value: μ and σ of ln(price)
    * from exact moment sums — the distribution-parameter estimate that
    * turns a heavy-tailed money/latency column into two numbers a
    * monitoring bound can be derived from (the z-score machinery of
    * q58 applied in LOG space, where multiplicative data is actually
    * normal; fitting the raw values instead lets the tail own the
    * variance). Per-row ln is pinned to integer nano-units the moment
    * it is computed (same-input libm calls can differ in the last ulp
    * ACROSS engines; whole-number rounding of the same double kills
    * that — the q105 rule) at MICRO-unit scale (u² in nano-units
    * overflows int64 before the sum even starts), the squared-moment
    * sum is carried in DECIMAL(38,0) (exact at any corpus size), and
    * μ, σ come out of one identical expression chain rounded to 12.
    * Shape: one map-side-combined aggregate into |priorities| rows.
    */
  private val q147 = QueryDef(
    "q147_lognormal_fit",
    (s, dir) => {
      val u = Fixtures.table(s, dir, "orders")
        .select(col("o_orderpriority"),
          round(log(col("o_totalprice").cast("double")) * lit(1e6))
            .cast("long").as("u"))
      u.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("u")).as("su"),
          sum((col("u") * col("u")).cast(DecimalType(38, 0))).as("su2"))
        .select(col("o_orderpriority"), col("n"),
          round(col("su").cast("double") / lit(1e6) / col("n"), 12)
            .as("mu"),
          round(
            sqrt(col("su2").cast("double") / lit(1e12) / col("n")
              - (col("su").cast("double") / lit(1e6) / col("n"))
                * (col("su").cast("double") / lit(1e6) / col("n"))), 12)
            .as("sigma"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH u AS (SELECT o_orderpriority,
          round(ln(o_totalprice::DOUBLE) * 1e6)::BIGINT AS u
        FROM orders),
      m AS (SELECT o_orderpriority, count(*)::BIGINT AS n,
          sum(u)::BIGINT AS su,
          sum(cast(u * u AS DECIMAL(38,0))) AS su2
        FROM u GROUP BY 1)
      SELECT o_orderpriority, n,
        round(su::DOUBLE / 1e6 / n, 12) AS mu,
        round(sqrt(su2::DOUBLE / 1e12 / n
          - (su::DOUBLE / 1e6 / n) * (su::DOUBLE / 1e6 / n)), 12)
          AS sigma
      FROM m ORDER BY o_orderpriority"""))

  // ---------- q158: market-basket co-purchase lift ---------------------

  /** Part pairs that co-occur in the same order, with lift against
    * independence — the classic association-rule screen, built the
    * basket way instead of a fact-table self-join: ONE shuffle on
    * l_orderkey collapses lineitems to sorted part-set baskets, and
    * the k(k−1)/2 pairs per basket (k ≤ 7 in TPC-H — bounded by
    * basket size, invariant of corpus scale) are generated MAP-SIDE
    * by a nested-transform explode. The alternative self-join reads
    * the fact table five times under AQE and shuffles it twice; here
    * the per-part counts and the order total both derive from the
    * same basket spine (PlanCache'd — one materialization per run).
    * Lift joins the pair counts against two broadcast copies of the
    * per-part counts. Top-50 by support with full (n, a, b) tiebreak
    * so the limit is deterministic on both engines.
    */
  private val q158 = QueryDef(
    "q158_copurchase",
    (s, dir) => {
      val baskets = copurchaseBaskets(s, dir)
      val pairs = copurchasePairs(s, dir)
      val pc = baskets.select(explode(col("parts")).as("pk"))
        .groupBy(col("pk")).agg(count(lit(1)).as("n"))
      val tot = baskets.agg(count(lit(1)).as("n_ord"))
      pairs
        .join(broadcast(pc.select(col("pk").as("part_a"),
          col("n").as("n_a"))), "part_a")
        .join(broadcast(pc.select(col("pk").as("part_b"),
          col("n").as("n_b"))), "part_b")
        .crossJoin(broadcast(tot))
        .select(col("part_a"), col("part_b"), col("n_orders"),
          round(col("n_orders").cast("double") * col("n_ord")
            / (col("n_a") * col("n_b")), 12).as("lift"))
        .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
        .limit(50)
    },
    Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      pc AS (SELECT l_partkey, count(*) AS n FROM li GROUP BY 1),
      tot AS (SELECT count(DISTINCT l_orderkey) AS n_ord FROM lineitem),
      pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
          count(*) AS n_orders
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
          AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2)
      SELECT part_a, part_b, n_orders::BIGINT AS n_orders,
        round(n_orders::DOUBLE * n_ord / (pa.n * pb.n), 12) AS lift
      FROM pr
      JOIN pc pa ON pa.l_partkey = part_a
      JOIN pc pb ON pb.l_partkey = part_b
      CROSS JOIN tot
      ORDER BY n_orders DESC, part_a, part_b LIMIT 50"""))

  // ---------- q160: Benford first-digit audit --------------------------

  /** First-significant-digit distribution of order totals vs Benford's
    * law — the standard forensic screen for fabricated or truncated
    * monetary data. The digit is extracted from the integer cents
    * value (`round(price·100)` → BIGINT → first character), never from
    * float formatting: integer-to-string is byte-identical across
    * engines while double repr is not, and shifting by 10² preserves
    * the leading significant digit. One narrow scan + 9-group
    * aggregate; the χ² contribution per digit comes from the exact
    * expected share ln(1+1/d)/ln 10.
    */
  private val q160 = QueryDef(
    "q160_benford",
    (s, dir) => {
      val d = Fixtures.table(s, dir, "orders")
        .select(substring(round(col("o_totalprice") * 100)
          .cast("long").cast("string"), 1, 1).cast("long").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val tot = d.agg(sum(col("n")).as("t"))
      d.crossJoin(broadcast(tot))
        .withColumn("p",
          round(log(10.0, lit(1.0) + lit(1.0) / col("digit")), 12))
        .select(col("digit"), col("n"),
          round(col("n").cast("double") / col("t"), 12).as("share"),
          col("p").as("benford"),
          round(pow(col("n").cast("double") - col("t") * col("p"), 2)
            / (col("t") * col("p")), 12).as("chi2_term"))
        .orderBy("digit")
    },
    Some("""WITH d AS (SELECT
          substring((round(o_totalprice * 100)::BIGINT)::VARCHAR, 1, 1)
            ::BIGINT AS digit,
          count(*) AS n
        FROM orders GROUP BY 1),
      tot AS (SELECT sum(n) AS t FROM d),
      e AS (SELECT digit, n, t,
          round(log10(1 + 1 / digit), 12) AS p
        FROM d CROSS JOIN tot)
      SELECT digit, n::BIGINT AS n,
        round(n::DOUBLE / t, 12) AS share,
        p AS benford,
        round(pow(n::DOUBLE - t * p, 2) / (t * p), 12) AS chi2_term
      FROM e ORDER BY digit"""))

  // ---------- q161: blocked record linkage (entity resolution) ---------

  /** Fuzzy entity resolution over part names with two-key blocking —
    * the standard ER shape: candidate pairs are generated only inside
    * (brand, size) blocks, so the quadratic Levenshtein step is
    * bounded by block size (≈16 parts per block at sf0.1, invariant of
    * corpus scale because block count grows with the data while block
    * size stays put). The self-join shuffles once on the compound
    * block key; per-block match stats and one deterministic example
    * pair (arg-min on a fixed-width zero-padded "a:b" pair code, whose
    * lexicographic min IS the numeric (a,b) min — exact for partkeys
    * < 10¹², i.e. any realistic scale factor, where an int64 a·10⁹+b
    * code would collide) aggregate in the same pass, then per-brand
    * rollup. No all-pairs comparison anywhere — the design survives
    * 100× the parts table.
    */
  private val q161 = QueryDef(
    "q161_record_linkage",
    (s, dir) => {
      val p = Fixtures.table(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size"),
          col("p_name"))
      val pairs = p.as("a").join(p.as("b"),
          col("a.p_brand") === col("b.p_brand") &&
            col("a.p_size") === col("b.p_size") &&
            col("a.p_partkey") < col("b.p_partkey"))
        .select(col("a.p_brand").as("brand"),
          col("a.p_partkey").as("key_a"), col("b.p_partkey").as("key_b"),
          levenshtein(col("a.p_name"), col("b.p_name")).as("dist"))
      pairs.groupBy(col("brand"))
        .agg(count(lit(1)).as("n_candidates"),
          sum(when(col("dist") <= 12, 1L).otherwise(0L)).as("n_matches"),
          min(when(col("dist") <= 12,
            concat(lpad(col("key_a").cast("string"), 12, "0"), lit(":"),
              lpad(col("key_b").cast("string"), 12, "0"))))
            .as("example_pair"))
        .orderBy("brand")
    },
    Some("""WITH p AS (SELECT p_partkey, p_brand, p_size, p_name FROM part),
      pr AS (SELECT a.p_brand AS brand, a.p_partkey AS key_a,
          b.p_partkey AS key_b, levenshtein(a.p_name, b.p_name) AS dist
        FROM p a JOIN p b ON a.p_brand = b.p_brand
          AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey)
      SELECT brand, count(*)::BIGINT AS n_candidates,
        sum(CASE WHEN dist <= 12 THEN 1 ELSE 0 END)::BIGINT AS n_matches,
        min(CASE WHEN dist <= 12
          THEN lpad(key_a::VARCHAR, 12, '0') || ':'
            || lpad(key_b::VARCHAR, 12, '0') END) AS example_pair
      FROM pr GROUP BY brand ORDER BY brand"""))

  // ---------- q162: Pareto revenue concentration -----------------------

  /** Decile concentration curve of customer revenue (the 80/20 audit):
    * per-customer revenue (one shuffle on custkey), customers ranked
    * into revenue deciles, per-decile exact revenue share and the
    * running cumulative share. The global ntile runs over the
    * per-customer AGGREGATE (|customers| rows, ~10³× smaller than the
    * fact table) with a total (rev desc, custkey) order so ties are
    * deterministic; at the 100 TB north star the exact ntile is
    * replaced by approx-quantile cutpoints — the aggregate shape is
    * unchanged. Cumulative share is a 10-row window; revenue sums use
    * the exact DECIMAL-term convention.
    */
  private val q162 = QueryDef(
    "q162_pareto_revenue",
    (s, dir) => {
      val rev = Fixtures.table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(dsum(col("o_totalprice")).as("rev"))
      val t = rev.withColumn("decile",
        ntile(10).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("rev").desc, col("o_custkey"))))
      val d = t.groupBy(col("decile"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("rev").cast(DecimalType(28, 4))).as("drev"))
      val tot = d.agg(sum(col("drev")).as("trev"))
      d.crossJoin(broadcast(tot))
        .select(col("decile").cast("long").as("decile"),
          col("n_customers"),
          col("drev").cast(DoubleType).as("revenue"),
          round(col("drev").cast(DoubleType)
            / col("trev").cast(DoubleType), 12).as("share"),
          round(sum(col("drev")).over(org.apache.spark.sql.expressions
            .Window.orderBy("decile")).cast(DoubleType)
            / col("trev").cast(DoubleType), 12).as("cum_share"))
        .orderBy("decile")
    },
    Some("""WITH rev AS (SELECT o_custkey,
          cast(sum(cast(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
        FROM orders GROUP BY 1),
      t AS (SELECT rev, ntile(10) OVER (ORDER BY rev DESC, o_custkey)
          AS decile FROM rev),
      d AS (SELECT decile, count(*) AS n_customers,
          sum(cast(rev AS DECIMAL(28,4))) AS drev
        FROM t GROUP BY 1),
      tot AS (SELECT sum(drev) AS trev FROM d)
      SELECT decile::BIGINT AS decile, n_customers::BIGINT AS n_customers,
        drev::DOUBLE AS revenue,
        round(drev::DOUBLE / trev::DOUBLE, 12) AS share,
        round((sum(drev) OVER (ORDER BY decile))::DOUBLE / trev::DOUBLE,
          12) AS cum_share
      FROM d CROSS JOIN tot ORDER BY decile"""))

  // ---------- q174: bilateral volume shipping (TPC-H Q7 shape) --------

  /** Shipped revenue between one REGION pair, by direction and ship
    * year — TPC-H Q7's plan shape on the fixture schema: the lineitem
    * fact stream carries supplier region via a BROADCAST
    * supplier→nation→region map, joins orders on the one shuffle key
    * (orderkey) to pick up customer region via a second broadcast map,
    * and the pair predicate ((EUROPE,ASIA) or (ASIA,EUROPE)) runs as
    * a post-broadcast filter that prunes most rows before the 4-group
    * aggregate. Region (not nation) pair because the sf0.001 fixture
    * has 10 suppliers covering 10 of 25 nations — a nation pair is
    * empty at smoke scale; every region keeps supplier coverage at
    * all scales. Revenue follows the DECIMAL-term convention. At
    * 100 TB: one fact shuffle, two tiny broadcasts, output
    * |directions|×|years| rows — the canonical bilateral-flow report.
    */
  private val q174 = QueryDef(
    "q174_volume_shipping",
    (s, dir) => {
      val supR = Fixtures.table(s, dir, "supplier")
        .join(Fixtures.table(s, dir, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .join(Fixtures.table(s, dir, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("r_name").as("supp_region"))
      val custR = Fixtures.table(s, dir, "customer")
        .join(Fixtures.table(s, dir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .join(Fixtures.table(s, dir, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("r_name").as("cust_region"))
      Fixtures.table(s, dir, "lineitem")
        .where(expr("l_shipdate >= TIMESTAMP '1996-01-01' AND " +
          "l_shipdate < TIMESTAMP '1998-01-01'"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).as("l_year"),
          col("l_extendedprice"), col("l_discount"))
        .join(Fixtures.table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supR), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(custR), col("o_custkey") === col("c_custkey"))
        .where((col("supp_region") === "EUROPE" &&
          col("cust_region") === "ASIA") ||
          (col("supp_region") === "ASIA" &&
            col("cust_region") === "EUROPE"))
        .groupBy(col("supp_region"), col("cust_region"), col("l_year"))
        .agg(dsum(expr("l_extendedprice * (1.0 - l_discount)"))
          .as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("supp_region", "cust_region", "l_year")
    },
    Some("""SELECT sr.r_name AS supp_region, cr.r_name AS cust_region,
        year(l_shipdate)::INT AS l_year,
        cast(sum(cast(l_extendedprice * (1.0 - l_discount)
          AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN region sr ON sn.n_regionkey = sr.r_regionkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region cr ON cn.n_regionkey = cr.r_regionkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND ((sr.r_name = 'EUROPE' AND cr.r_name = 'ASIA')
          OR (sr.r_name = 'ASIA' AND cr.r_name = 'EUROPE'))
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  // ---------- q175: product-line profit (TPC-H Q9 shape) --------------

  /** Profit by supplier nation and order year for one product family
    * (p_name containing 'widget') — TPC-H Q9's plan shape adapted to
    * the fixture schema, which has no partsupp: supply cost is proxied
    * as 10 % of p_retailprice (documented deviation; the PLAN is the
    * point). The selective part filter reduces parts to a ~17 % list
    * that BROADCASTS to the lineitem scan — at 100 TB this semi-join
    * prunes the fact stream before its one shuffle onto orders, which
    * is exactly where a name-filtered profit query wants its
    * selectivity. Per-row amount is the identical 4-op IEEE chain in
    * both dialects; the sum is order-independent DECIMAL.
    */
  private val q175 = QueryDef(
    "q175_product_profit",
    (s, dir) => {
      val parts = Fixtures.table(s, dir, "part")
        .where(col("p_name").contains("widget"))
        .select(col("p_partkey"), col("p_retailprice"))
      val supN = Fixtures.table(s, dir, "supplier")
        .join(Fixtures.table(s, dir, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      Fixtures.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
        .join(Fixtures.table(s, dir, "orders")
          .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("nation"), col("o_year"))
        .agg(dsum(expr("l_extendedprice * (1.0 - l_discount) " +
          "- p_retailprice * 0.1 * l_quantity")).as("profit"),
          count(lit(1)).as("n_items"))
        .orderBy(col("nation"), col("o_year"))
    },
    Some("""SELECT n_name AS nation, year(o_orderdate)::INT AS o_year,
        cast(sum(cast(l_extendedprice * (1.0 - l_discount)
          - p_retailprice * 0.1 * l_quantity AS DECIMAL(18,4)))
          AS DOUBLE) AS profit,
        count(*) AS n_items
      FROM lineitem
      JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  // ---------- q176: returned-item customer ranking (TPC-H Q10) --------

  /** Top-20 customers by revenue lost to returns in one order quarter —
    * TPC-H Q10's shape: the returnflag filter prunes lineitem in the
    * scan, the quarter filter prunes orders in ITS scan (both
    * predicates push down to parquet), they meet on the one orderkey
    * shuffle, and customer+nation broadcast onto the aggregated
    * per-customer totals. The final top-20 is a TakeOrdered, never a
    * full sort. At 100 TB the aggregate output is |customers|-sized —
    * the ranking never materializes more than k rows past it.
    */
  private val q176 = QueryDef(
    "q176_returned_items",
    (s, dir) => {
      val custN = Fixtures.table(s, dir, "customer")
        .join(Fixtures.table(s, dir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name").as("nation"))
      Fixtures.table(s, dir, "lineitem")
        .where(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"),
          col("l_discount"))
        .join(Fixtures.table(s, dir, "orders")
          .where(expr("o_orderdate >= TIMESTAMP '1996-01-01' AND " +
            "o_orderdate < TIMESTAMP '1996-04-01'"))
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(dsum(expr("l_extendedprice * (1.0 - l_discount)"))
          .as("revenue"), count(lit(1)).as("n_items"))
        .join(broadcast(custN), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("nation"),
          col("c_acctbal"), col("revenue"), col("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name, n_name AS nation, c_acctbal,
        cast(sum(cast(l_extendedprice * (1.0 - l_discount)
          AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1996-04-01'
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
      GROUP BY 1, 2, 3, 4
      ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  // ---------- q181: frequent co-purchase triples ----------------------

  /** Frequent 3-itemsets over order baskets — the next A-priori level
    * past q158's pairs. Triples generate inside the basket array via a
    * nested-combination HOF (i<j<k over the sorted distinct parts),
    * so the fan-out is per-basket C(b,3), bounded by the basket size
    * the schema itself bounds (max 13 here; the `size(parts) <= 64`
    * guard caps any pathological basket at 100 TB) — never a corpus
    * self-join. One shuffle groups candidate triples. The DuckDB
    * oracle is an INDEPENDENT formulation (three-way self-join with
    * ordering predicates) — agreement checks the combination
    * enumeration itself, not a shared code path. The basket cap is
    * MIRRORED in the oracle (orders with > 64 distinct parts are
    * excluded on both sides), so the contract is scale-invariant —
    * not an accident of the fixture's max basket size.
    */
  private val q181 = QueryDef(
    "q181_frequent_triples",
    (s, dir) => {
      copurchaseBaskets(s, dir)
        .where(size(col("parts")) <= 64)
        // graft_triples replaces the doubly-nested interpreted HOF —
        // measured 21 executor-CPU-s at sf0.1, the board's 2nd-largest
        // CPU burner; same i<j<k rows, one tight loop (r15)
        .select(explode(expr("graft_triples(parts)")).as("t"))
        .groupBy(col("t.p1").as("p1"), col("t.p2").as("p2"),
          col("t.p3").as("p3"))
        .agg(count(lit(1)).as("support"))
        .where(col("support") >= 2)
        .orderBy(col("support").desc, col("p1"), col("p2"), col("p3"))
    },
    Some("""WITH it0 AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
          FROM lineitem),
        ok AS (SELECT o FROM it0 GROUP BY o HAVING count(*) <= 64),
        it AS (SELECT it0.o, it0.p FROM it0 JOIN ok ON it0.o = ok.o)
      SELECT a.p AS p1, b.p AS p2, c.p AS p3, count(*) AS support
      FROM it a
      JOIN it b ON a.o = b.o AND a.p < b.p
      JOIN it c ON b.o = c.o AND b.p < c.p
      GROUP BY 1, 2, 3 HAVING count(*) >= 2
      ORDER BY support DESC, p1, p2, p3"""))

  // ---------- q182: two-hop reach on the co-purchase graph ------------

  /** Two-hop neighborhood size for the 20 highest-degree parts of the
    * support-≥2 co-purchase graph — the "how far does a recommendation
    * radiate" audit. Seeds are a TakeOrdered top-k (k rows cross the
    * driver, never the graph); hop-1 and hop-2 are joins on the node
    * key with the seed side BROADCAST, so the frontier is |seeds|×deg
    * — at 100 TB a per-node neighbor cap (the q48 posting-cap rule)
    * bounds the hop-2 fan-out; the fixture graph needs none. The
    * union-distinct reach count shuffles at most frontier rows.
    */
  private val q182 = QueryDef(
    "q182_two_hop_reach",
    (s, dir) => {
      // shared ≥2-support doubled adjacency (r16): same rows the local
      // derivation produced, one cached ~7k-row table instead of a full
      // pair-cache scan per edge reference (this plan has five)
      val edges = copurchaseEdges2(s, dir)
      val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("d"))
      val seeds = deg.orderBy(col("d").desc, col("u")).limit(20)
        .select(col("u").as("seed"), col("d").as("degree"))
      val hop1 = edges.join(broadcast(seeds), col("u") === col("seed"))
        .select(col("seed"), col("degree"), col("v"))
      val hop2 = hop1.select(col("seed"), col("v").as("m"))
        .join(edges.withColumnRenamed("u", "m"), "m")
        .select(col("seed"), col("v"))
      val reach = hop1.select(col("seed"), col("v"))
        .unionAll(hop2).distinct()
      reach.join(broadcast(seeds), "seed")
        .where(col("v") =!= col("seed"))
        .groupBy(col("seed"), col("degree"))
        .agg(count(lit(1)).as("n_reach2"))
        .select(col("seed").as("part"), col("degree"), col("n_reach2"))
        .orderBy("part")
    },
    Some("""WITH it AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
          FROM lineitem),
      pairs AS (SELECT a.p AS p1, b.p AS p2, count(*) AS n
        FROM it a JOIN it b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= 2),
      edges AS (SELECT p1 AS u, p2 AS v FROM pairs
        UNION ALL SELECT p2, p1 FROM pairs),
      deg AS (SELECT u, count(*) AS d FROM edges GROUP BY 1),
      seeds AS (SELECT u AS seed, d AS degree FROM deg
        ORDER BY d DESC, u LIMIT 20),
      hop1 AS (SELECT s.seed, e.v FROM seeds s
        JOIN edges e ON e.u = s.seed),
      hop2 AS (SELECT h.seed, e2.v FROM hop1 h
        JOIN edges e2 ON e2.u = h.v),
      reach AS (SELECT seed, v FROM hop1 UNION SELECT seed, v FROM hop2)
      SELECT s.seed AS part, s.degree, count(*) AS n_reach2
      FROM reach r JOIN seeds s USING (seed)
      WHERE r.v <> s.seed
      GROUP BY 1, 2 ORDER BY part"""))

  // ---------- q186: month-over-year revenue growth --------------------

  /** Monthly revenue with year-over-year growth — the standard finance
    * trend report: one orders aggregate to |months| rows, then a
    * lag-12 window over the month sequence. The window is a GLOBAL
    * order but over a calendar-bounded spine (the q59 argument —
    * ~36.5k rows for a century, driver-trivial at any corpus size);
    * the corpus-sized work is only the first aggregate. lag-12
    * assumes a dense month sequence (true here: orders span every
    * month; a sparse calendar would first pass through q59's
    * gapfill). Growth is one subtract + divide on DECIMAL-sum-derived
    * doubles — identical IEEE ops both engines; first-year months
    * report NULL growth.
    */
  private val q186 = QueryDef(
    "q186_monthly_yoy",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("month"))
      Fixtures.table(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
          .as("month"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("revenue"))
        .withColumn("prev", lag(col("revenue"), 12).over(w))
        .select(col("month"), col("n_orders"), col("revenue"),
          ((col("revenue") - col("prev")) / col("prev")).as("yoy_growth"))
        .orderBy("month")
    },
    Some("""WITH m AS (SELECT date_trunc('month', o_orderdate)::DATE
          AS month, count(*) AS n_orders,
          cast(sum(cast(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
            AS revenue
        FROM orders GROUP BY 1)
      SELECT month, n_orders, revenue,
        (revenue - lag(revenue, 12) OVER (ORDER BY month))
          / lag(revenue, 12) OVER (ORDER BY month) AS yoy_growth
      FROM m ORDER BY month"""))

  // ---------- q188: Theil inequality decomposition --------------------

  /** Theil T index of document-length inequality, decomposed into
    * within-source and between-source components — the decomposable
    * inequality measure (Gini, q99, is not decomposable): T = T_within
    * + T_between exactly, so the report says HOW MUCH of corpus length
    * skew is source mix vs within-source spread. Per-doc terms
    * (x/μ)·ln(x/μ) use ratios of exact int64 counts (identical doubles
    * both engines), are pinned to int64 nano-units at the row (the
    * q172 rule — ln differs in the last ulp across libms), and sum
    * exactly; the 5-per-group scalar combinations pin to pico-units
    * the same way. Shape: two corpus aggregates (total, per-source)
    * + one per-doc projection pass against broadcast totals — no
    * shuffle wider than |sources|.
    */
  private val q188 = QueryDef(
    "q188_theil_decomposition",
    (s, dir) => {
      val x = Fixtures.table(s, dir, "documents")
        .select(col("source"), col("n_chars"))
      val tot = broadcast(x.agg(sum(col("n_chars")).as("s_all"),
        count(lit(1)).as("n_all")))
      val grp = x.groupBy(col("source"))
        .agg(sum(col("n_chars")).as("s_g"), count(lit(1)).as("n_g"))
      val nanoTot = x.crossJoin(tot)
        .select(expr("""CAST(round(
            (CAST(n_chars * n_all AS DOUBLE) / CAST(s_all AS DOUBLE))
            * ln(CAST(n_chars * n_all AS DOUBLE) / CAST(s_all AS DOUBLE))
            * 1e9) AS BIGINT)""").as("nano"))
        .agg(sum(col("nano")).as("nano_tot"))
      val nanoG = x.join(broadcast(grp), "source")
        .select(col("source"), expr("""CAST(round(
            (CAST(n_chars * n_g AS DOUBLE) / CAST(s_g AS DOUBLE))
            * ln(CAST(n_chars * n_g AS DOUBLE) / CAST(s_g AS DOUBLE))
            * 1e9) AS BIGINT)""").as("nano"))
        .groupBy(col("source")).agg(sum(col("nano")).as("nano_g"))
      val parts = grp.join(nanoG, "source").crossJoin(tot)
        .select(
          expr("""CAST(round(CAST(s_g AS DOUBLE) / CAST(s_all AS DOUBLE)
              * (CAST(nano_g AS DOUBLE) / 1e9 / CAST(n_g AS DOUBLE))
              * 1e12) AS BIGINT)""").as("w_pico"),
          expr("""CAST(round(CAST(s_g AS DOUBLE) / CAST(s_all AS DOUBLE)
              * ln(CAST(s_g AS DOUBLE) / CAST(s_all AS DOUBLE)
                * CAST(n_all AS DOUBLE) / CAST(n_g AS DOUBLE))
              * 1e12) AS BIGINT)""").as("b_pico"))
        .agg(sum(col("w_pico")).as("w"), sum(col("b_pico")).as("b"))
      nanoTot.crossJoin(parts).crossJoin(tot)
        .select(col("n_all").as("n_docs"),
          (col("nano_tot").cast("double") / 1e9 / col("n_all").cast("double"))
            .as("theil_total"),
          (col("w").cast("double") / 1e12).as("theil_within"),
          (col("b").cast("double") / 1e12).as("theil_between"))
    },
    Some("""WITH tot AS (SELECT sum(n_chars)::BIGINT AS s_all,
          count(*) AS n_all FROM documents),
      grp AS (SELECT source, sum(n_chars)::BIGINT AS s_g,
          count(*) AS n_g FROM documents GROUP BY 1),
      nano_tot AS (SELECT sum(round(
          ((n_chars * n_all)::DOUBLE / s_all::DOUBLE)
          * ln((n_chars * n_all)::DOUBLE / s_all::DOUBLE)
          * 1e9)::BIGINT)::BIGINT AS nano_tot FROM documents, tot),
      nano_g AS (SELECT d.source, sum(round(
          ((n_chars * n_g)::DOUBLE / s_g::DOUBLE)
          * ln((n_chars * n_g)::DOUBLE / s_g::DOUBLE)
          * 1e9)::BIGINT)::BIGINT AS nano_g
        FROM documents d JOIN grp g ON g.source = d.source GROUP BY 1),
      parts AS (SELECT
          sum(round(s_g::DOUBLE / s_all::DOUBLE
            * (nano_g::DOUBLE / 1e9 / n_g::DOUBLE)
            * 1e12)::BIGINT)::BIGINT AS w,
          sum(round(s_g::DOUBLE / s_all::DOUBLE
            * ln(s_g::DOUBLE / s_all::DOUBLE
              * n_all::DOUBLE / n_g::DOUBLE)
            * 1e12)::BIGINT)::BIGINT AS b
        FROM grp JOIN nano_g USING (source), tot)
      SELECT n_all AS n_docs,
        nano_tot::DOUBLE / 1e9 / n_all::DOUBLE AS theil_total,
        w::DOUBLE / 1e12 AS theil_within,
        b::DOUBLE / 1e12 AS theil_between
      FROM nano_tot, parts, tot"""))

  // ---------- q189: market concentration (HHI) ------------------------

  /** Herfindahl–Hirschman concentration of supplier-nation revenue
    * within each region — the antitrust-style concentration metric a
    * marketplace reports per market: HHI = Σ share² over the region's
    * nations (1/n = perfectly split, 1 = monopoly). Revenue sums stay
    * DECIMAL end-to-end (never summing doubles), shares are one
    * division of the exact sums, and the ≤|nations| share² terms pin
    * to pico-units before summing so group iteration order can't
    * perturb the double. Shape: one fact aggregate on (region,
    * nation) via broadcast dims, then a |nations|-row rollup.
    */
  private val q189 = QueryDef(
    "q189_market_hhi",
    (s, dir) => {
      val supGeo = Fixtures.table(s, dir, "supplier")
        .join(Fixtures.table(s, dir, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .join(Fixtures.table(s, dir, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("n_name"), col("r_name"))
      val revN = Fixtures.table(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
        .join(broadcast(supGeo), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(expr("cast(l_extendedprice * (1.0 - l_discount) " +
          "AS DECIMAL(18,4))")).as("rev_n"))
      val revR = revN.groupBy(col("r_name"))
        .agg(sum(col("rev_n")).as("rev_r"), count(lit(1)).as("n_nations"))
      revN.join(revR, "r_name")
        .select(col("r_name"), col("n_nations"),
          expr("""CAST(round(
              CAST(rev_n AS DOUBLE) / CAST(rev_r AS DOUBLE)
              * (CAST(rev_n AS DOUBLE) / CAST(rev_r AS DOUBLE))
              * 1e12) AS BIGINT)""").as("pico"))
        .groupBy(col("r_name"), col("n_nations"))
        .agg(sum(col("pico")).as("p"))
        .select(col("r_name"), col("n_nations"),
          (col("p").cast("double") / 1e12).as("hhi"))
        .orderBy("r_name")
    },
    Some("""WITH rev_n AS (SELECT r_name, n_name,
          sum(cast(l_extendedprice * (1.0 - l_discount)
            AS DECIMAL(18,4))) AS rev_n
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2),
      rev_r AS (SELECT r_name, sum(rev_n) AS rev_r,
          count(*) AS n_nations FROM rev_n GROUP BY 1)
      SELECT r_name, n_nations,
        sum(round(rev_n::DOUBLE / rev_r::DOUBLE
          * (rev_n::DOUBLE / rev_r::DOUBLE) * 1e12)::BIGINT)::DOUBLE
          / 1e12 AS hhi
      FROM rev_n JOIN rev_r USING (r_name)
      GROUP BY 1, 2 ORDER BY r_name"""))

  // ---------- q192: running stock balance ------------------------------

  /** Monthly cumulative shipped quantity for the 5 highest-volume
    * parts — the running-balance ledger shape (inventory, account
    * balances, capacity burn-down): one fact aggregate to (part,
    * month) rows, then a cumulative window PARTITIONED BY part, so
    * each sort is |months|-bounded and parts parallelize freely — the
    * global-sort-free way to compute balances at any scale. Seeds are
    * a TakeOrdered top-k. Quantities stay DECIMAL through both the
    * monthly sum and the cumulative window sum (a window over doubles
    * would accumulate order-dependently), cast to double only in the
    * final projection.
    */
  private val q192 = QueryDef(
    "q192_running_balance",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = Fixtures.table(s, dir, "lineitem")
        .select(col("l_partkey"),
          date_trunc("month", col("l_shipdate")).cast("date").as("month"),
          col("l_quantity"))
      val seeds = li.groupBy(col("l_partkey"))
        .agg(sum(expr("cast(l_quantity AS DECIMAL(18,4))")).as("tq"))
        .orderBy(col("tq").desc, col("l_partkey")).limit(5)
        .select(col("l_partkey"))
      val monthly = li.join(broadcast(seeds), "l_partkey")
        .groupBy(col("l_partkey"), col("month"))
        .agg(sum(expr("cast(l_quantity AS DECIMAL(18,4))")).as("q_month"),
          count(lit(1)).as("n_lines"))
      val w = Window.partitionBy(col("l_partkey")).orderBy(col("month"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      monthly
        .withColumn("balance", sum(col("q_month")).over(w))
        .select(col("l_partkey"), col("month"), col("n_lines"),
          col("q_month").cast("double").as("q_month"),
          col("balance").cast("double").as("balance"))
        .orderBy("l_partkey", "month")
    },
    Some("""WITH li AS (SELECT l_partkey,
          date_trunc('month', l_shipdate)::DATE AS month,
          l_quantity FROM lineitem),
      seeds AS (SELECT l_partkey FROM li
        GROUP BY 1 ORDER BY sum(cast(l_quantity AS DECIMAL(18,4))) DESC,
          l_partkey LIMIT 5),
      monthly AS (SELECT l_partkey, month,
          sum(cast(l_quantity AS DECIMAL(18,4))) AS q_month,
          count(*) AS n_lines
        FROM li JOIN seeds USING (l_partkey) GROUP BY 1, 2)
      SELECT l_partkey, month, n_lines,
        q_month::DOUBLE AS q_month,
        (sum(q_month) OVER (PARTITION BY l_partkey ORDER BY month
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
          AS balance
      FROM monthly ORDER BY l_partkey, month"""))

  // ---------- q196: cohort lifetime value -------------------------------

  /** Cumulative revenue per customer by acquisition-quarter cohort —
    * the LTV curve that prices acquisition spend: cohort = quarter of
    * the customer's FIRST order (one min-aggregate on custkey), age =
    * quarters since, and the curve is a cumulative DECIMAL window sum
    * per cohort divided by the cohort's customer count. The window
    * partitions by cohort and sorts the ≤|quarters| ages — calendar-
    * bounded per partition (the q59/q186 argument). Quarter index
    * arithmetic (year·4 + quarter) is exact integer in both engines.
    * Two shuffles total: first-order aggregate, (cohort, age)
    * aggregate.
    */
  private val q196 = QueryDef(
    "q196_cohort_ltv",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = Fixtures.table(s, dir, "orders")
        .select(col("o_custkey"), col("o_totalprice"),
          (year(col("o_orderdate")) * 4 + quarter(col("o_orderdate")))
            .as("qi"))
      val first = o.groupBy(col("o_custkey"))
        .agg(min(col("qi")).as("cohort_qi"))
      val sizes = first.groupBy(col("cohort_qi"))
        .agg(count(lit(1)).as("n_customers"))
      val rev = o.join(first, "o_custkey")
        .groupBy(col("cohort_qi"), (col("qi") - col("cohort_qi")).as("age_q"))
        .agg(sum(expr("cast(o_totalprice AS DECIMAL(18,4))")).as("rev_q"))
      val w = Window.partitionBy(col("cohort_qi")).orderBy(col("age_q"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rev.withColumn("cum_rev", sum(col("rev_q")).over(w))
        .join(broadcast(sizes), "cohort_qi")
        .select(col("cohort_qi"), col("age_q"), col("n_customers"),
          col("rev_q").cast("double").as("rev_q"),
          (col("cum_rev").cast("double") / col("n_customers").cast("double"))
            .as("ltv_per_customer"))
        .orderBy("cohort_qi", "age_q")
    },
    Some("""WITH o AS (SELECT o_custkey, o_totalprice,
          year(o_orderdate) * 4 + quarter(o_orderdate) AS qi FROM orders),
      first AS (SELECT o_custkey, min(qi) AS cohort_qi FROM o GROUP BY 1),
      sizes AS (SELECT cohort_qi, count(*) AS n_customers FROM first
        GROUP BY 1),
      rev AS (SELECT cohort_qi, qi - cohort_qi AS age_q,
          sum(cast(o_totalprice AS DECIMAL(18,4))) AS rev_q
        FROM o JOIN first USING (o_custkey) GROUP BY 1, 2)
      SELECT cohort_qi, age_q, n_customers,
        rev_q::DOUBLE AS rev_q,
        (sum(rev_q) OVER (PARTITION BY cohort_qi ORDER BY age_q
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
          / n_customers::DOUBLE AS ltv_per_customer
      FROM rev JOIN sizes USING (cohort_qi)
      ORDER BY cohort_qi, age_q"""))

  // ---------- q197: single-source supply risk ---------------------------

  /** Supply-concentration risk: for every part, how much its TOP
    * supplier dominates, measured scale-free as concentration ratio =
    * top_share · n_suppliers (1 = perfectly even split, n = single-
    * sourced) and bucketed into four dependency bands — the
    * procurement audit that finds over-reliant parts regardless of how
    * many suppliers a part nominally has (absolute-share cutoffs
    * degenerate when every part has ~15 suppliers, as here). Ratios
    * divide DECIMAL quantity sums (identical doubles both engines, so
    * band boundaries can't flip); the per-band mean pins to exact
    * micro-units before summing. Shape: one (part, supplier)
    * aggregate, an argmax inside the per-part partition, a 4-row
    * rollup.
    */
  private val q197 = QueryDef(
    "q197_supply_risk",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ps = Fixtures.table(s, dir, "lineitem")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(expr("cast(l_quantity AS DECIMAL(18,4))")).as("q"))
      val w = Window.partitionBy(col("l_partkey"))
      val top = ps
        .withColumn("q_max", max(col("q")).over(w))
        .withColumn("q_tot", sum(col("q")).over(w))
        .withColumn("n_supp", count(lit(1)).over(w))
        .where(col("q") === col("q_max"))
        .groupBy(col("l_partkey"))
        .agg(max(col("n_supp")).as("n_supp"),
          max((col("q_max").cast("double") / col("q_tot").cast("double")))
            .as("top_share"))
      top
        .withColumn("ratio",
          col("top_share") * col("n_supp").cast("double"))
        .select(col("l_partkey"), col("n_supp"),
          expr("""CASE WHEN ratio > 3.0 THEN 'd_ratio>3'
            WHEN ratio > 2.0 THEN 'c_ratio(2,3]'
            WHEN ratio > 1.5 THEN 'b_ratio(1.5,2]'
            ELSE 'a_ratio<=1.5' END""").as("band"),
          expr("CAST(round(ratio * 1e6) AS BIGINT)").as("ratio_micro"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_parts"),
          sum((col("n_supp") === 1).cast("long")).as("n_single_sourced"),
          (sum(col("ratio_micro")).cast("double")
            / count(lit(1)).cast("double") / 1e6).as("mean_ratio"))
        .orderBy("band")
    },
    Some("""WITH ps AS (SELECT l_partkey, l_suppkey,
          sum(cast(l_quantity AS DECIMAL(18,4))) AS q
        FROM lineitem GROUP BY 1, 2),
      agg AS (SELECT l_partkey, q,
          max(q) OVER (PARTITION BY l_partkey) AS q_max,
          sum(q) OVER (PARTITION BY l_partkey) AS q_tot,
          count(*) OVER (PARTITION BY l_partkey) AS n_supp
        FROM ps),
      top AS (SELECT l_partkey, max(n_supp) AS n_supp,
          max(q_max::DOUBLE / q_tot::DOUBLE) AS top_share
        FROM agg WHERE q = q_max GROUP BY 1),
      banded AS (SELECT l_partkey, n_supp,
          CASE WHEN top_share * n_supp > 3.0 THEN 'd_ratio>3'
            WHEN top_share * n_supp > 2.0 THEN 'c_ratio(2,3]'
            WHEN top_share * n_supp > 1.5 THEN 'b_ratio(1.5,2]'
            ELSE 'a_ratio<=1.5' END AS band,
          round(top_share * n_supp * 1e6)::BIGINT AS ratio_micro
        FROM top)
      SELECT band, count(*) AS n_parts,
        sum(CASE WHEN n_supp = 1 THEN 1 ELSE 0 END)::BIGINT
          AS n_single_sourced,
        sum(ratio_micro)::DOUBLE / count(*)::DOUBLE / 1e6
          AS mean_ratio
      FROM banded GROUP BY 1 ORDER BY band"""))

  // ---------- q203: substitute detection (anti-lift) -------------------

  /** The NEGATIVE space of q158's co-purchase lift: among the 20 most
    * frequently ordered parts, which pairs co-occur far BELOW their
    * independence expectation (observed/expected lowest, including
    * observed 0)? Those are substitute candidates — two popular parts
    * the same order almost never contains both of. The pair table
    * alone can't answer this (absent pairs aren't rows); the audit
    * joins the C(20,2)=190 candidate pairs of the top set LEFT OUTER
    * against the cached pair counts and coalesces misses to 0.
    * Everything after the cached aggregates is |top|²-sized. Ratio is
    * one division of exact-int-derived doubles, identical both
    * engines.
    */
  private val q203 = QueryDef(
    "q203_substitute_pairs",
    (s, dir) => {
      val baskets = copurchaseBaskets(s, dir)
      val pc = baskets.select(explode(col("parts")).as("pk"))
        .groupBy(col("pk")).agg(count(lit(1)).as("n"))
      val topP = pc.orderBy(col("n").desc, col("pk")).limit(20)
      val tot = baskets.agg(count(lit(1)).as("n_ord"))
      val cand = topP.select(col("pk").as("part_a"), col("n").as("n_a"))
        .join(topP.select(col("pk").as("part_b"), col("n").as("n_b")),
          col("part_a") < col("part_b"))
      cand
        .join(copurchasePairs(s, dir), Seq("part_a", "part_b"),
          "left_outer")
        .crossJoin(broadcast(tot))
        .select(col("part_a"), col("part_b"), col("n_a"), col("n_b"),
          coalesce(col("n_orders"), lit(0L)).as("n_both"),
          expr("""CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
            / CAST(n_ord AS DOUBLE)""").as("expected"),
          expr("""CAST(coalesce(n_orders, 0L) AS DOUBLE)
            / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
              / CAST(n_ord AS DOUBLE))""").as("obs_over_exp"))
        .orderBy(col("obs_over_exp"), col("part_a"), col("part_b"))
        .limit(25)
    },
    Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
          FROM lineitem),
      pc AS (SELECT l_partkey AS pk, count(*) AS n FROM li GROUP BY 1),
      topp AS (SELECT pk, n FROM pc ORDER BY n DESC, pk LIMIT 20),
      tot AS (SELECT count(DISTINCT l_orderkey) AS n_ord FROM lineitem),
      pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
          count(*) AS n_orders
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
          AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2),
      cand AS (SELECT a.pk AS part_a, a.n AS n_a, b.pk AS part_b,
          b.n AS n_b FROM topp a JOIN topp b ON a.pk < b.pk)
      SELECT part_a, part_b, n_a, n_b,
        coalesce(n_orders, 0)::BIGINT AS n_both,
        n_a::DOUBLE * n_b::DOUBLE / n_ord::DOUBLE AS expected,
        coalesce(n_orders, 0)::DOUBLE
          / (n_a::DOUBLE * n_b::DOUBLE / n_ord::DOUBLE) AS obs_over_exp
      FROM cand LEFT JOIN pr USING (part_a, part_b), tot
      ORDER BY obs_over_exp, part_a, part_b LIMIT 25"""))

  // ---------- q207: BFS hop distances on the co-purchase graph ---------

  /** Hop-distance profile (how many parts sit 1, 2, 3 hops from the
    * hub) for the highest-degree node of the support-≥2 co-purchase
    * graph — the reachability complement of q182's reach COUNT: this
    * one keeps the per-distance breakdown, the unit of
    * recommendation-radius analysis. Three UNROLLED frontier
    * expansions: each hop is one join of the current frontier against
    * the edge list on the node key plus an anti-join against the
    * visited set, so per-round shuffle is |frontier|×avg-degree — the
    * textbook distributed BFS whose cost tracks the neighborhood, not
    * the graph (a recursive/loop formulation would be the same three
    * plans; unrolling keeps AQE per-stage). Every hop's frontier is
    * persisted and the seed/result localCheckpoint'ed — the
    * connectedComponents iteration idiom — so no hop ever re-derives
    * an earlier one. The DuckDB oracle is an
    * INDEPENDENT recursive-CTE walk taking min(dist) per node —
    * agreement checks the frontier/visited bookkeeping.
    */
  private val q207 = QueryDef(
    "q207_bfs_distance",
    (s, dir) => {
      // shared ≥2-support doubled adjacency (r16) — identical rows; the
      // three hop joins below re-read a ~7k-row cache, not the 1.2M-row
      // pair table
      val edges = copurchaseEdges2(s, dir)
        .select(col("u").as("node"), col("v"))
      val deg = edges.groupBy(col("node")).agg(count(lit(1)).as("d"))
      // Each hop's frontier is PERSISTED (the connectedComponents
      // idiom): without it the hop-3 plan re-derives hop 1 and hop 2
      // in every branch (frontier join + anti-join + final union) and
      // the unrolled lineage re-executes the pair aggregate ~2^hops
      // times — measured 22 s vs ~1 s at sf0.1. The seed is
      // localCheckpoint'ed so the limit-1 ranking runs once, and the
      // result is localCheckpoint'ed so the returned plan carries no
      // iteration history; intermediates are released before return.
      import org.apache.spark.storage.StorageLevel
      val seed = deg.orderBy(col("d").desc, col("node")).limit(1)
        .select(col("node"), lit(0L).as("dist"))
        .localCheckpoint(true)
      var visited = seed
      var frontier = seed.select(col("node"))
      val hopFrames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      for (h <- 1 to 3) {
        frontier = frontier.join(edges, "node")
          .select(col("v").as("node")).distinct()
          .join(visited.select(col("node")), Seq("node"), "left_anti")
          .persist(StorageLevel.MEMORY_AND_DISK)
        hopFrames += frontier
        visited = visited.unionAll(
          frontier.select(col("node"), lit(h.toLong).as("dist")))
      }
      val out = visited.groupBy(col("dist")).agg(count(lit(1)).as("n_nodes"))
        .orderBy("dist")
        .localCheckpoint(true)
      hopFrames.foreach(_.unpersist(blocking = false))
      out
    },
    Some("""WITH RECURSIVE it AS (SELECT DISTINCT l_orderkey AS o,
          l_partkey AS p FROM lineitem),
      pairs AS (SELECT a.p AS p1, b.p AS p2 FROM it a
        JOIN it b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= 2),
      edges AS (SELECT p1 AS u, p2 AS v FROM pairs
        UNION ALL SELECT p2, p1 FROM pairs),
      deg AS (SELECT u, count(*) AS d FROM edges GROUP BY 1),
      seed AS (SELECT u FROM deg ORDER BY d DESC, u LIMIT 1),
      w(node, dist) AS (
        SELECT u, 0 FROM seed
        UNION ALL
        SELECT e.v, w.dist + 1 FROM w JOIN edges e ON e.u = w.node
        WHERE w.dist < 3),
      walk AS (SELECT node, min(dist) AS dist FROM w GROUP BY 1)
      SELECT dist::BIGINT AS dist, count(*) AS n_nodes FROM walk
      GROUP BY 1 ORDER BY 1"""))

  // ---------- q208: small-quantity revenue (correlated-avg filter) -----

  /** Revenue locked in below-average-quantity lines of one brand — the
    * TPC-H Q17 shape: a per-part correlated average feeding a filter
    * on the same table. Spark-first decorrelation: the brand's part
    * keys BROADCAST-semi-join the scan (so both passes over lineitem
    * read only the brand's lines — predicate pushdown does the rest),
    * the per-part averages are a ~|brand parts|-row aggregate that
    * broadcasts back onto the second pass, and the final filter +
    * one-row aggregate never shuffles more than the brand's lines.
    * The oracle keeps the CORRELATED subquery form — agreement checks
    * Spark's decorrelation against DuckDB's. Averages are
    * DECIMAL-sum/count (order-independent) on both sides.
    */
  private val q208 = QueryDef(
    "q208_small_qty_revenue",
    (s, dir) => {
      val bkeys = Fixtures.table(s, dir, "part")
        .where(col("p_brand") === "Brand#1").select(col("p_partkey"))
      val lb = Fixtures.table(s, dir, "lineitem")
        .join(broadcast(bkeys), col("l_partkey") === col("p_partkey"))
      val aq = lb.groupBy(col("l_partkey").as("ak"))
        .agg((sum(col("l_quantity").cast(DecimalType(18, 4)))
          .cast(DoubleType) / count(lit(1)).cast(DoubleType)).as("aq"))
      lb.join(broadcast(aq), col("l_partkey") === col("ak"))
        .where(col("l_quantity") < lit(0.2) * col("aq"))
        .agg(count(lit(1)).as("n_lines"),
          dsum(col("l_extendedprice")).as("small_qty_revenue"))
    },
    Some("""SELECT count(*) AS n_lines,
        cast(sum(cast(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
          AS small_qty_revenue
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#1'
        AND l_quantity < 0.2 * (
          SELECT cast(sum(cast(l2.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
              / count(*)::DOUBLE
          FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"""))

  // ---------- q209: sole latest shipper in multi-supplier orders -------

  /** Suppliers ranked by how often they were the UNIQUE last shipper
    * of a multi-supplier order — the TPC-H Q21 shape (the
    * who-holds-up-the-order audit) re-expressed with one window pass:
    * per-(order, supplier) max shipdate, then order-level max /
    * supplier-count / achiever-count as three window aggregates over
    * the SAME partition key (one shuffle, one sort serves all three),
    * then a filter and a small aggregate. The oracle is the classic
    * EXISTS / NOT-EXISTS double-correlated form — agreement checks
    * the window reformulation against the subquery semantics.
    */
  private val q209 = QueryDef(
    "q209_latest_shipper",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val sl = Fixtures.table(s, dir, "lineitem")
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("l_shipdate")).as("smax"))
      val w = Window.partitionBy(col("l_orderkey"))
      val marked = sl
        .withColumn("omax", max(col("smax")).over(w))
        .withColumn("nsup", count(lit(1)).over(w))
        .withColumn("nmax",
          sum(when(col("smax") === col("omax"), 1L).otherwise(0L)).over(w))
      marked
        .where(col("nsup") >= 2 && col("nmax") === 1 &&
          col("smax") === col("omax"))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_orders"))
        .join(broadcast(Fixtures.table(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_orders"))
        .orderBy(col("n_orders").desc, col("s_suppkey"))
        .limit(10)
    },
    Some("""WITH sl AS (SELECT l_orderkey AS o, l_suppkey AS sk,
          max(l_shipdate) AS smax
        FROM lineitem GROUP BY 1, 2)
      SELECT s_suppkey, s_name, count(*) AS n_orders
      FROM sl a JOIN supplier ON s_suppkey = a.sk
      WHERE EXISTS (SELECT 1 FROM sl b
          WHERE b.o = a.o AND b.sk <> a.sk)
        AND NOT EXISTS (SELECT 1 FROM sl c
          WHERE c.o = a.o AND c.sk <> a.sk AND c.smax >= a.smax)
      GROUP BY 1, 2 ORDER BY n_orders DESC, s_suppkey LIMIT 10"""))

  // ---------- q210: idle high-balance customers (scalar sub + anti) ----

  /** Per-segment count and balance of customers above the positive-
    * balance average with NO order since 1999 — the TPC-H Q22 shape
    * (lapsed high-value accounts): a global scalar subquery gating an
    * anti join. Spark-first: the scalar average is a one-row broadcast
    * crossJoin (never a recomputed subquery), the "no recent order"
    * test is a LEFT ANTI join against the date-pruned o_custkey
    * projection (the predicate reaches the parquet scan), and the
    * segment rollup shuffles only survivors. The oracle keeps the
    * scalar subquery + NOT EXISTS form — agreement checks Spark's
    * decorrelation. DECIMAL-exact sums both sides.
    */
  private val q210 = QueryDef(
    "q210_idle_customers",
    (s, dir) => {
      val cust = Fixtures.table(s, dir, "customer")
      val ab = cust.where(col("c_acctbal") > 0.0)
        .agg((sum(col("c_acctbal").cast(DecimalType(18, 4)))
          .cast(DoubleType) / count(lit(1)).cast(DoubleType)).as("ab"))
      val recent = Fixtures.table(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      cust.crossJoin(broadcast(ab))
        .where(col("c_acctbal") > col("ab"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_custs"),
          dsum(col("c_acctbal")).as("total_bal"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, count(*) AS n_custs,
        cast(sum(cast(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
      FROM customer
      WHERE c_acctbal > (
          SELECT cast(sum(cast(c2.c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
              / count(*)::DOUBLE
          FROM customer c2 WHERE c2.c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '1999-01-01')
      GROUP BY 1 ORDER BY 1"""))

  // ---------- q211: min-unit-price supplier per part (groupwise min) ---

  /** For every size-25 part, the supplier that has sold it at the
    * lowest observed unit price — the TPC-H Q2 groupwise-min shape.
    * Spark-first: `min(struct(unit, suppkey))` makes the argmin a
    * single hash aggregate (the struct's lexicographic order IS the
    * tie-break), where the naive form would be a join back onto a
    * per-group min. Part keys and the two dimension joins broadcast.
    * The oracle is the NOT-EXISTS "no cheaper offer" correlated form
    * with the same (unit, suppkey) tie-break — agreement checks the
    * argmin encoding. Unit price is one IEEE division on both sides.
    */
  private val q211 = QueryDef(
    "q211_min_cost_supplier",
    (s, dir) => {
      val pz = Fixtures.table(s, dir, "part")
        .where(col("p_size") === 25)
        .select(col("p_partkey"), col("p_name"))
      val lu = Fixtures.table(s, dir, "lineitem")
        .join(broadcast(pz.select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"),
          (col("l_extendedprice") / col("l_quantity")).as("unit"),
          col("l_suppkey"))
      lu.groupBy(col("l_partkey"))
        .agg(min(struct(col("unit"), col("l_suppkey"))).as("b"))
        .select(col("l_partkey").as("p_partkey"),
          col("b.unit").as("best_unit"),
          col("b.l_suppkey").as("s_suppkey"))
        .join(broadcast(pz), "p_partkey")
        .join(broadcast(Fixtures.table(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))), "s_suppkey")
        .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
          col("s_name"), col("best_unit"))
        .orderBy("p_partkey")
    },
    Some("""WITH lu AS (SELECT l_partkey AS pk,
          l_extendedprice / l_quantity AS unit, l_suppkey AS sk
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_size = 25),
      best AS (SELECT DISTINCT pk, unit, sk FROM lu a
        WHERE NOT EXISTS (SELECT 1 FROM lu b
          WHERE b.pk = a.pk AND (b.unit < a.unit
            OR (b.unit = a.unit AND b.sk < a.sk))))
      SELECT p_partkey, p_name, s_suppkey, s_name, unit AS best_unit
      FROM best JOIN part ON p_partkey = pk
        JOIN supplier ON s_suppkey = sk
      ORDER BY p_partkey"""))

  // ---------- q212: trending brands (week-over-week z-score) -----------

  /** Which brands spiked in the latest week: per-brand z-score of the
    * last week's line count against the mean/stddev of ALL prior
    * weeks, on a ZERO-FILLED brand×week grid (a brand with no sales
    * in a week counts 0 — dropping those rows would inflate every
    * mean). The grid is a broadcast cross join of two tiny distinct
    * sets; weekly counts are one shuffle of (brand, week); the
    * z-arithmetic is textually identical closed-form sums (no
    * avg/stddev builtins, whose float order could drift) on both
    * sides. The same shape serves "trending tokens" on a corpus —
    * swap the brand key for the term key; the grid then comes from a
    * df-capped vocabulary, not a cross join.
    */
  private val q212 = QueryDef(
    "q212_trending_brands",
    (s, dir) => {
      val lo = Fixtures.table(s, dir, "lineitem")
        .join(Fixtures.table(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"),
          expr("""timestampdiff(MICROSECOND,
            TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate)
            div 86400000000 div 7""").as("wk"))
      val counts = lo.groupBy(col("p_brand"), col("wk"))
        .agg(count(lit(1)).as("c"))
      val brands = Fixtures.table(s, dir, "part")
        .select(col("p_brand")).distinct()
      val weeks = Fixtures.table(s, dir, "orders")
        .select(expr("""timestampdiff(MICROSECOND,
          TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate)
          div 86400000000 div 7""").as("wk")).distinct()
      val grid = brands.crossJoin(broadcast(weeks))
      val filled = grid.join(counts, Seq("p_brand", "wk"), "left_outer")
        .select(col("p_brand"), col("wk"),
          coalesce(col("c"), lit(0L)).as("c"))
      val lastWk = weeks.agg(max(col("wk")).as("last_wk"))
      val wf = filled.crossJoin(broadcast(lastWk))
      val prior = wf.where(col("wk") < col("last_wk"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
          sum(col("c") * col("c")).as("sc2"))
      val last = wf.where(col("wk") === col("last_wk"))
        .select(col("p_brand"), col("c").as("c_last"))
      prior.join(last, "p_brand")
        .select(col("p_brand"), col("c_last"),
          (col("sc").cast("double") / col("n").cast("double"))
            .as("mean_prev"),
          ((col("c_last").cast("double")
            - col("sc").cast("double") / col("n").cast("double"))
            / sqrt((col("sc2").cast("double")
              - col("sc").cast("double") * col("sc").cast("double")
                / col("n").cast("double"))
              / (col("n").cast("double") - 1.0))).as("z"))
        .orderBy(col("z").desc, col("p_brand"))
        .limit(10)
    },
    Some("""WITH lo AS (SELECT p_brand,
          epoch_us(o_orderdate) // 86400000000 // 7 AS wk
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey),
      counts AS (SELECT p_brand, wk, count(*) AS c FROM lo GROUP BY 1, 2),
      brands AS (SELECT DISTINCT p_brand FROM part),
      weeks AS (SELECT DISTINCT epoch_us(o_orderdate) // 86400000000 // 7
          AS wk FROM orders),
      filled AS (SELECT b.p_brand, w.wk, coalesce(c.c, 0)::BIGINT AS c
        FROM brands b CROSS JOIN weeks w
        LEFT JOIN counts c ON c.p_brand = b.p_brand AND c.wk = w.wk),
      lw AS (SELECT max(wk) AS last_wk FROM weeks),
      prior AS (SELECT p_brand, count(*) AS n, sum(c)::BIGINT AS sc,
          sum(c * c)::BIGINT AS sc2
        FROM filled, lw WHERE wk < last_wk GROUP BY 1),
      lastc AS (SELECT p_brand, c AS c_last FROM filled, lw
        WHERE wk = last_wk)
      SELECT p_brand, c_last,
        sc::DOUBLE / n::DOUBLE AS mean_prev,
        (c_last::DOUBLE - sc::DOUBLE / n::DOUBLE)
          / sqrt((sc2::DOUBLE - sc::DOUBLE * sc::DOUBLE / n::DOUBLE)
            / (n::DOUBLE - 1.0)) AS z
      FROM prior JOIN lastc USING (p_brand)
      ORDER BY z DESC, p_brand LIMIT 10"""))

  // ---------- q214: Z-order vs linear layout zone-map skipping ---------

  /** Data-layout audit: if orders were rewritten in Z-order on
    * (custkey, orderdate) vs sorted by date alone, how many of 32
    * equal-size zones (files) would a rectangle predicate
    * (custkey band × 60-day window) have to read under min/max
    * zone-map pruning? The Z-key interleaves 8+8 bits of the two
    * RANGE-NORMALIZED dims (pure integer arithmetic, no UDF); zone
    * assignment is the boundary-broadcast ntile (RangeNtile — the
    * q149 scale path: per-shard sorts only, no global collapse); the
    * per-zone min/max over the RAW predicate columns is exactly what
    * a parquet footer stores. Output: one row per layout with zones
    * scanned and rows actually matching — the number a table-format
    * optimizer (Z-order clustering, as in public lakehouse formats)
    * would quote as its skipping win. Oracle: same arithmetic with
    * window ntile.
    */
  private val q214 = QueryDef(
    "q214_zorder_skipping",
    (s, dir) => {
      val zbits = (0 until 8).map { i =>
        (shiftright(col("x8"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))) +
          (shiftright(col("y8"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)))
      }.reduce(_ + _)
      val raw = Fixtures.table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          expr("""timestampdiff(MICROSECOND,
            TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate)
            div 86400000000""").as("day"))
      // range-normalize both dims to 8 bits off a one-row broadcast of
      // the dim extents (scale-invariant: works at any sf / custkey
      // cardinality, like a table-format optimizer's column stats)
      val stats = raw.agg((max(col("o_custkey")) + 1L).as("cdiv"),
        min(col("day")).as("d0"),
        (max(col("day")) - min(col("day")) + 1L).as("ddiv"))
      val base = raw.crossJoin(broadcast(stats))
        .withColumn("x8", expr("o_custkey * 256 div cdiv"))
        .withColumn("y8", expr("(day - d0) * 256 div ddiv"))
        .withColumn("zkey", zbits)
      val layouts = Seq(
        ("bydate", Seq(col("day"), col("o_orderkey"))),
        ("zorder", Seq(col("zkey"), col("o_orderkey"))))
      layouts.map { case (name, key) =>
        RangeNtile.withNtile(base, key, 32, "zone")
          .groupBy(col("zone"))
          .agg(min(col("o_custkey")).as("cmin"), max(col("o_custkey")).as("cmax"),
            min(col("day")).as("dmin"), max(col("day")).as("dmax"),
            sum((col("o_custkey").between(375, 749) &&
              col("day").between(10227, 10286)).cast("long")).as("hits"))
          .agg(count(lit(1)).as("n_zones"),
            sum((col("cmax") >= 375 && col("cmin") <= 749 &&
              col("dmax") >= 10227 && col("dmin") <= 10286).cast("long"))
              .as("zones_scanned"),
            sum(col("hits")).as("rows_matched"))
          .select(lit(name).as("layout"), col("n_zones"),
            col("zones_scanned"), col("rows_matched"))
      }.reduce(_ unionAll _)
        .orderBy("layout")
    },
    Some("""WITH raw AS (SELECT o_orderkey, o_custkey,
          epoch_us(o_orderdate) // 86400000000 AS day
        FROM orders),
      stats AS (SELECT max(o_custkey) + 1 AS cdiv, min(day) AS d0,
          max(day) - min(day) + 1 AS ddiv
        FROM raw),
      base AS (SELECT o_orderkey, o_custkey, day,
          (o_custkey * 256) // cdiv AS x8,
          ((day - d0) * 256) // ddiv AS y8
        FROM raw, stats),
      zk AS (SELECT o_orderkey, o_custkey, day,
          (((x8 >> 0) & 1) * 2 + ((y8 >> 0) & 1) * 1
           + ((x8 >> 1) & 1) * 8 + ((y8 >> 1) & 1) * 4
           + ((x8 >> 2) & 1) * 32 + ((y8 >> 2) & 1) * 16
           + ((x8 >> 3) & 1) * 128 + ((y8 >> 3) & 1) * 64
           + ((x8 >> 4) & 1) * 512 + ((y8 >> 4) & 1) * 256
           + ((x8 >> 5) & 1) * 2048 + ((y8 >> 5) & 1) * 1024
           + ((x8 >> 6) & 1) * 8192 + ((y8 >> 6) & 1) * 4096
           + ((x8 >> 7) & 1) * 32768 + ((y8 >> 7) & 1) * 16384) AS zkey
        FROM base),
      zoned AS (
        SELECT 'zorder' AS layout,
          ntile(32) OVER (ORDER BY zkey, o_orderkey) AS zone,
          o_custkey, day FROM zk
        UNION ALL
        SELECT 'bydate',
          ntile(32) OVER (ORDER BY day, o_orderkey),
          o_custkey, day FROM zk),
      zstats AS (SELECT layout, zone, min(o_custkey) AS cmin,
          max(o_custkey) AS cmax, min(day) AS dmin, max(day) AS dmax,
          sum(CASE WHEN o_custkey BETWEEN 375 AND 749
            AND day BETWEEN 10227 AND 10286 THEN 1 ELSE 0 END)::BIGINT
            AS hits
        FROM zoned GROUP BY 1, 2)
      SELECT layout, count(*) AS n_zones,
        sum(CASE WHEN cmax >= 375 AND cmin <= 749 AND dmax >= 10227
          AND dmin <= 10286 THEN 1 ELSE 0 END)::BIGINT AS zones_scanned,
        sum(hits)::BIGINT AS rows_matched
      FROM zstats GROUP BY 1 ORDER BY layout"""))

  // ---------- q218: top supplier of a quarter (TPC-H Q15) -------------

  /** Supplier(s) achieving the maximum shipped revenue in one quarter —
    * the TPC-H Q15 shape (aggregate view + scalar-max filter against
    * itself). Spark-first: the per-supplier revenue aggregate is ONE
    * lineitem shuffle (the quarter predicate pushes down to the scan);
    * the scalar max is a 1-row broadcast crossJoin back onto the same
    * aggregate (never a recomputed subquery — Spark materializes the
    * aggregate once under ReusedExchange), and the equality compare is
    * safe because both sides derive the double from the identical
    * exact DECIMAL sum. Supplier names broadcast. The oracle keeps the
    * view + scalar-subquery form — agreement checks the reuse
    * reformulation. At 100 TB: one fact shuffle to a |suppliers|-row
    * aggregate; everything after is |suppliers|-sized.
    */
  private val q218 = QueryDef(
    "q218_top_supplier_quarter",
    (s, dir) => {
      val rev = Fixtures.table(s, dir, "lineitem")
        .where(expr("l_shipdate >= TIMESTAMP '1998-01-01' AND " +
          "l_shipdate < TIMESTAMP '1998-04-01'"))
        .groupBy(col("l_suppkey"))
        .agg(dsum(expr("l_extendedprice * (1.0 - l_discount)"))
          .as("total_revenue"))
      val top = rev.agg(max(col("total_revenue")).as("max_rev"))
      rev.crossJoin(broadcast(top))
        .where(col("total_revenue") === col("max_rev"))
        .join(broadcast(Fixtures.table(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    },
    Some("""WITH rev AS (SELECT l_suppkey,
        cast(sum(cast(l_extendedprice * (1.0 - l_discount)
          AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01'
          AND l_shipdate < TIMESTAMP '1998-04-01'
        GROUP BY 1)
      SELECT s_suppkey, s_name, total_revenue
      FROM rev JOIN supplier ON s_suppkey = l_suppkey
      WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
      ORDER BY s_suppkey"""))

  // ---------- q219: large-volume orders (TPC-H Q18) -------------------

  /** Orders whose total line quantity exceeds 300, with their customer —
    * the TPC-H Q18 shape (HAVING filter on a fact aggregate, joined
    * back to the header tables). One lineitem shuffle on orderkey with
    * map-side partials; the rare survivors join orders ON THE SAME KEY
    * (co-partitioned — shuffle-free when both are bucketed by
    * orderkey), customer broadcasts, and the top-20 is a TakeOrdered
    * with full (qty desc, orderkey) tiebreak — never a global sort.
    * Quantity sums follow the DECIMAL-term convention so the threshold
    * compare cannot flip across engines.
    */
  private val BigOrderQty = 300.0

  private val q219 = QueryDef(
    "q219_large_orders",
    (s, dir) => {
      val big = Fixtures.table(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("total_qty"))
        .where(col("total_qty") > BigOrderQty)
      big.join(Fixtures.table(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Fixtures.table(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(20)
    },
    Some(s"""WITH big AS (SELECT l_orderkey,
        cast(sum(cast(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
          AS total_qty
        FROM lineitem GROUP BY 1
        HAVING cast(sum(cast(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
          > $BigOrderQty)
      SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        total_qty
      FROM big JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY total_qty DESC, o_orderkey LIMIT 20"""))

  // ---------- q221: MERGE/upsert audit --------------------------------

  /** The lakehouse MERGE INTO shape, audited: a standing snapshot
    * (orders before 2000) merged with a delta batch (a hash-selected
    * 10 % of the snapshot re-emitted with status 'U', plus every order
    * from 2000 on as inserts), classified into insert / update /
    * untouched with per-class row counts and a portable content digest
    * (sum of h32(key:status) over the merged rows — verifies the
    * merged STATE, not just the counts). The merge itself is ONE
    * full-outer join on the key — at 100 TB with both sides bucketed
    * by the key it is shuffle-free, and the delta side is the only
    * small input; this is the day-to-day incremental-ingest shape
    * (q104's dedup analogue for upserts). The update selection is the
    * q37 pure-hash contract (salt 'upd_'), so the delta is identical
    * in both engines.
    */
  private val q221 = QueryDef(
    "q221_upsert_merge",
    (s, dir) => {
      val orders = Fixtures.table(s, dir, "orders")
      val base = orders
        .where(expr("o_orderdate < TIMESTAMP '2000-01-01'"))
        .select(col("o_orderkey"), col("o_orderstatus"))
      val updates = base
        .where(expr(
          s"${Portable.h32Spark("concat('upd_', o_orderkey)")} % 10 = 0"))
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"))
      val inserts = orders
        .where(expr("o_orderdate >= TIMESTAMP '2000-01-01'"))
        .select(col("o_orderkey"), col("o_orderstatus"))
      val delta = updates.unionByName(inserts)
      base.select(col("o_orderkey").as("bk"), col("o_orderstatus").as("bs"))
        .join(delta.select(col("o_orderkey").as("dk"),
          col("o_orderstatus").as("ds")),
          col("bk") === col("dk"), "full_outer")
        .select(coalesce(col("bk"), col("dk")).as("okey"),
          coalesce(col("ds"), col("bs")).as("status"),
          when(col("bk").isNull, "insert")
            .when(col("dk").isNull, "untouched")
            .otherwise("update").as("action"))
        .groupBy(col("action"))
        .agg(count(lit(1)).as("n_rows"),
          sum(expr(Portable.h32Spark("concat(okey, ':', status)")))
            .as("digest"))
        .orderBy("action")
    },
    Some(s"""WITH base AS (SELECT o_orderkey, o_orderstatus FROM orders
        WHERE o_orderdate < TIMESTAMP '2000-01-01'),
      upd AS (SELECT o_orderkey, 'U' AS o_orderstatus FROM base
        WHERE ${Portable.h32Duck("'upd_' || o_orderkey")} % 10 = 0),
      ins AS (SELECT o_orderkey, o_orderstatus FROM orders
        WHERE o_orderdate >= TIMESTAMP '2000-01-01'),
      delta AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
      merged AS (SELECT coalesce(b.o_orderkey, d.o_orderkey) AS okey,
          coalesce(d.o_orderstatus, b.o_orderstatus) AS status,
          CASE WHEN b.o_orderkey IS NULL THEN 'insert'
            WHEN d.o_orderkey IS NULL THEN 'untouched'
            ELSE 'update' END AS action
        FROM base b FULL OUTER JOIN delta d
          ON b.o_orderkey = d.o_orderkey)
      SELECT action, count(*)::BIGINT AS n_rows,
        sum(${Portable.h32Duck("okey || ':' || status")})::BIGINT
          AS digest
      FROM merged GROUP BY 1 ORDER BY action"""))

  // ---------- q224: UNPIVOT (wide aggregate → long metrics) -----------

  /** The per-priority order aggregate melted to (priority, metric,
    * value) rows via Spark's native `Dataset.unpivot` — the UNPIVOT
    * operator, the inverse of q223's PIVOT and the shape that feeds
    * generic metric stores (one row per measure, schema fixed as
    * metrics evolve). Unpivot is a zero-shuffle Expand over the
    * |priorities|-row aggregate — all the distributed work is the one
    * orders aggregate before it; counts cast to double once so the
    * value column has the single common type unpivot requires. The
    * oracle is an independent UNION ALL formulation.
    */
  private val q224 = QueryDef(
    "q224_unpivot_metrics",
    (s, dir) => {
      val wide = Fixtures.table(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).cast("double").as("n_orders"),
          dsum(col("o_totalprice")).as("revenue"))
      wide.unpivot(
          Array(col("o_orderpriority")),
          Array(col("n_orders"), col("revenue")),
          "metric", "value")
        .orderBy("o_orderpriority", "metric")
    },
    Some("""WITH wide AS (SELECT o_orderpriority,
        count(*)::DOUBLE AS n_orders,
        cast(sum(cast(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
          AS revenue
        FROM orders GROUP BY 1)
      SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value
        FROM wide
      UNION ALL
      SELECT o_orderpriority, 'revenue' AS metric, revenue AS value
        FROM wide
      ORDER BY o_orderpriority, metric"""))

  // ---------- q226: degree assortativity of the co-purchase graph ----

  /** Pearson degree assortativity of the support-≥2 co-purchase graph —
    * do hubs connect to hubs (r > 0) or to leaves (r < 0)? The graph-
    * health scalar beside q122's degree histogram and q82's triangles:
    * disassortative graphs concentrate recommendation traffic through
    * hubs, which is exactly where q182's fan-out caps bite. Computed
    * over the DOUBLED edge list (each undirected edge contributes both
    * orientations — the standard estimator, and it makes Σx = Σy so
    * one moment pass suffices): two keyed joins pick up endpoint
    * degrees, moments accumulate as exact DECIMAL(38,0) sums of int64
    * products (q75's convention — engine corr() builtins float-drift),
    * and the Pearson formula is applied once in double, rounded 12.
    * Shape: all work is |edges|-sized off the PlanCache'd pair table;
    * the degree table joins on the node key.
    */
  private val q226 = QueryDef(
    "q226_assortativity",
    (s, dir) => {
      // shared ≥2-support doubled adjacency (r16) — identical rows
      val edges = copurchaseEdges2(s, dir)
      val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("d"))
      val dd = edges
        .join(deg.select(col("u"), col("d").as("du")), "u")
        .join(deg.select(col("u").as("v"), col("d").as("dv")), "v")
      dd.agg(count(lit(1)).as("n"),
          sum(col("du").cast(DecimalType(38, 0))).as("sx"),
          sum((col("du") * col("du")).cast(DecimalType(38, 0))).as("sxx"),
          sum((col("du") * col("dv")).cast(DecimalType(38, 0))).as("sxy"))
        .select((col("n") / lit(2)).cast("long").as("n_edges"),
          round((col("n").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sx").cast("double"))
            / (col("n").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double")), 12)
            .as("assortativity"))
    },
    Some("""WITH it AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        FROM lineitem),
      pairs AS (SELECT a.p AS p1, b.p AS p2 FROM it a
        JOIN it b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= 2),
      edges AS (SELECT p1 AS u, p2 AS v FROM pairs
        UNION ALL SELECT p2, p1 FROM pairs),
      deg AS (SELECT u, count(*) AS d FROM edges GROUP BY 1),
      dd AS (SELECT e.u, e.v, a.d AS du, b.d AS dv FROM edges e
        JOIN deg a ON a.u = e.u JOIN deg b ON b.u = e.v),
      m AS (SELECT count(*) AS n,
          sum((du)::DECIMAL(38,0)) AS sx,
          sum((du * du)::DECIMAL(38,0)) AS sxx,
          sum((du * dv)::DECIMAL(38,0)) AS sxy
        FROM dd)
      SELECT (n / 2)::BIGINT AS n_edges,
        round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sx::DOUBLE)
          / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 12)
          AS assortativity
      FROM m"""))

  // ---------- q228: disjunctive-predicate revenue (TPC-H Q19 shape) --

  /** Revenue under an OR-of-ANDs predicate mixing part attributes
    * (brand, size) with fact attributes (quantity) — TPC-H Q19's plan
    * shape. The point at 100 TB is what Catalyst does with the
    * disjunction: the optimizer extracts the per-side unions of the
    * disjuncts (brand/size legs → the part scan as PushedFilters;
    * quantity ∈ [1,30] → the lineitem scan), so both scans prune
    * BEFORE the broadcast hash join instead of evaluating the full
    * predicate post-join. Part broadcasts (4-col projection); the fact
    * side never shuffles — single partial-agg rollup to one row.
    */
  private val q228 = QueryDef(
    "q228_disjunctive_revenue",
    (s, dir) => {
      val pt = Fixtures.table(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      Fixtures.table(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
        .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
        .where((col("p_brand") === "Brand#12" &&
            col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" &&
            col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" &&
            col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(dsum(expr("l_extendedprice * (1.0 - l_discount)"))
          .as("revenue"), count(lit(1)).as("n_items"))
    },
    Some("""SELECT cast(sum(cast(l_extendedprice * (1.0 - l_discount)
          AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        count(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
          AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
          AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
          AND l_quantity BETWEEN 20 AND 30)"""))

  // ---------- q229: waiting suppliers (TPC-H Q21 shape) ---------------

  /** Suppliers who were the SOLE late shipper on multi-supplier orders
    * — TPC-H Q21's semantics (the fixture has no commit/receipt dates,
    * so "late" is shipdate > orderdate + 60 days, documented
    * deviation). Q21's textbook form is EXISTS + NOT EXISTS self-joins
    * on lineitem — quadratic blowup risk on big orders; here it is
    * rewritten as two cascaded aggregations: per (order, supplier)
    * late flags, then a per-order rollup (supplier count, late count,
    * the late supplier's key via max-over-conditional), filtered to
    * n_supp ≥ 2 ∧ n_late = 1. At 100 TB: one fact shuffle onto
    * orderkey (the o_orderdate pickup joins on the same key first),
    * then strictly shrinking aggregates — no self-join ever
    * materializes. Top 20 by wait count, suppkey-tiebroken.
    */
  private val q229 = QueryDef(
    "q229_waiting_suppliers",
    (s, dir) => {
      val perSupp = Fixtures.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(Fixtures.table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(when(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 60 DAY"), 1).otherwise(0))
          .as("late"))
      perSupp.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"), sum(col("late")).as("n_late"),
          max(when(col("late") === 1, col("l_suppkey"))).as("s_suppkey"))
        .where(col("n_supp") >= 2 && col("n_late") === 1)
        .groupBy(col("s_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
        .limit(20)
    },
    Some("""WITH ls AS (SELECT l_orderkey, l_suppkey,
          max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
            THEN 1 ELSE 0 END) AS late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2),
      o AS (SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late,
          max(CASE WHEN late = 1 THEN l_suppkey END) AS s_suppkey
        FROM ls GROUP BY 1)
      SELECT s_suppkey, count(*) AS numwait FROM o
      WHERE n_supp >= 2 AND n_late = 1
      GROUP BY 1 ORDER BY numwait DESC, s_suppkey LIMIT 20"""))

  // ---------- q230: customer order-count distribution (TPC-H Q13) -----

  /** How many customers placed exactly k qualifying orders — TPC-H
    * Q13's two-level aggregation, zero-order customers included (the
    * LEFT OUTER join is the semantic point; an inner join silently
    * drops the k=0 bucket, the largest one). The priority filter
    * stands in for Q13's comment NOT LIKE (no comment column in the
    * fixture). At 100 TB: orders shuffles onto custkey once
    * (pre-filtered map-side), the customer side joins on its key, and
    * the second aggregate is over ≤ |distinct k| ≈ dozens of rows.
    * Tie-safe total order (custdist desc, then k desc).
    */
  private val q230 = QueryDef(
    "q230_custdist",
    (s, dir) => Fixtures.table(s, dir, "customer")
      .select(col("c_custkey"))
      .join(Fixtures.table(s, dir, "orders")
        .where(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc),
    Some("""WITH co AS (SELECT c_custkey,
          count(o_orderkey)::BIGINT AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          AND o_orderpriority <> '1-URGENT'
        GROUP BY 1)
      SELECT c_count, count(*) AS custdist FROM co
      GROUP BY 1 ORDER BY custdist DESC, c_count DESC"""))

  // ---------- q231: part supplier-variety report (TPC-H Q16 shape) ----

  /** Distinct-supplier counts per (brand, type, size) for an attribute-
    * filtered part family, excluding a supplier denylist — TPC-H Q16
    * with lineitem's (partkey, suppkey) pairs standing in for partsupp
    * and `s_suppkey % 10 = 7` standing in for the complaints list
    * (documented deviations; the fixture has neither). Shape at
    * 100 TB: the pair-distinct is the only fact shuffle (on partkey ∥
    * suppkey), the filtered part list broadcasts (~11 % of parts:
    * 8 sizes × non-PROMO × one brand removed), and the count-distinct
    * rides the same hash partitioning. Catalyst plans the denylist
    * filter BEFORE the distinct, shrinking the shuffle 10 %.
    */
  private val q231 = QueryDef(
    "q231_supplier_variety",
    (s, dir) => {
      val ps = Fixtures.table(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"))
        .where(col("l_suppkey") % 10 =!= 7)
        .distinct()
      val pt = Fixtures.table(s, dir, "part")
        .where(col("p_brand") =!= "Brand#45" &&
          !col("p_type").startsWith("PROMO") &&
          col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          col("p_size"))
      ps.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },
    Some("""SELECT p_brand, p_type, p_size,
        count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        WHERE l_suppkey % 10 <> 7) ps
      JOIN part ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#45' AND p_type NOT LIKE 'PROMO%'
        AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      GROUP BY 1, 2, 3
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""))

  // ---------- q232: national market share (TPC-H Q8 shape) ------------

  /** NATION_3's share of STANDARD-part revenue sold to AMERICA-region
    * customers, per order year — TPC-H Q8's conditional-share plan.
    * The share is a ratio of two sums over the SAME filtered join
    * (numerator gated on supplier nation), so it costs one pass: the
    * fact stream is pruned by the broadcast part filter (p_type =
    * 'STANDARD', ~17 %) before its single shuffle onto orders; the
    * supplier→nation and customer→nation→region lookups broadcast.
    * Both sums are exact DECIMAL(18,4); the share divides once in
    * double, rounded 12 — no float accumulation anywhere. At 100 TB
    * the plan is Q7's (q174) with one extra broadcast: still exactly
    * one fact shuffle.
    */
  private val q232 = QueryDef(
    "q232_market_share",
    (s, dir) => {
      val supN = Fixtures.table(s, dir, "supplier")
        .join(Fixtures.table(s, dir, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val custAmerica = Fixtures.table(s, dir, "customer")
        .join(Fixtures.table(s, dir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .join(Fixtures.table(s, dir, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "AMERICA")
        .select(col("c_custkey"))
      val stdParts = Fixtures.table(s, dir, "part")
        .where(col("p_type") === "STANDARD").select(col("p_partkey"))
      Fixtures.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(broadcast(stdParts), col("l_partkey") === col("p_partkey"))
        .join(Fixtures.table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).as("yr")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(custAmerica), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("yr"))
        .agg(dsum(when(col("supp_nation") === "NATION_3",
            expr("l_extendedprice * (1.0 - l_discount)")).otherwise(0.0))
          .as("nation_rev"),
          dsum(expr("l_extendedprice * (1.0 - l_discount)"))
            .as("total_rev"))
        .select(col("yr"), col("nation_rev"), col("total_rev"),
          round(col("nation_rev") / col("total_rev"), 12).as("mkt_share"))
        .orderBy("yr")
    },
    Some("""WITH rev AS (SELECT year(o_orderdate)::INT AS yr,
          cast(sum(cast(CASE WHEN sn.n_name = 'NATION_3'
              THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
            AS DECIMAL(18,4))) AS DOUBLE) AS nation_rev,
          cast(sum(cast(l_extendedprice * (1.0 - l_discount)
            AS DECIMAL(18,4))) AS DOUBLE) AS total_rev
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region cr ON cn.n_regionkey = cr.r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE cr.r_name = 'AMERICA' AND p_type = 'STANDARD'
        GROUP BY 1)
      SELECT yr, nation_rev, total_rev,
        round(nation_rev / total_rev, 12) AS mkt_share
      FROM rev ORDER BY yr"""))

  // ---------- q233: per-brand OLS price-on-quantity fit ----------------

  /** Ordinary least squares of extendedprice on quantity per brand —
    * slope, intercept, R² from one grouped pass. Moments follow q75's
    * exactness convention: inputs cast to DECIMAL(18,4) (exact — the
    * fixture's doubles carry ≤ 2 decimals), products and sums stay
    * decimal (Spark (18,4)² → DECIMAL(37,8); DuckDB oracle uses
    * (19,4) so its product type lands at (38,8) without input-width
    * overflow), and the closed-form fit runs once per brand in double.
    * Slope and R² round at 12; the intercept (magnitude ~5e4, double
    * ulp ~7e-12) rounds at 6 so engine-specific decimal→double
    * conversion noise in the last ulp cannot leak into the hash. Shape at 100 TB: broadcast part lookup, one
    * map-side-combined aggregate into |brands| ≈ 25 rows — the fact
    * table never shuffles on a data-dependent key.
    */
  private val q233 = QueryDef(
    "q233_ols_price_qty",
    // r16 (guide §1.2 "per-task work", §2.3 narrower types): the
    // DECIMAL(18,4) moment aggregate paid, per row, two double→decimal
    // casts (each a Double.toString + BigDecimal parse) and three
    // BigDecimal multiplies (the (18,4)² product's 37-digit precision
    // leaves Decimal's compact-long fast path). Both inputs are exact
    // 2-decimal values, so the SAME rational moments come from scaled
    // int64: xl = 100·x, yl = 100·y (floor(v·100+0.5) recovers the
    // integer exactly — |v·100 − k| < 1e-6 ≪ 0.5), per-row products in
    // long, sums in DECIMAL(38,0) (compact adds; never overflows at any
    // SF), and the exact decimal moments reconstructed by one division
    // per GROUP (25 rows): S/10⁴ at true scale ≤ 4 is exact in the
    // (38,6) HALF_UP result, so every cast-to-double below sees the
    // bit-identical value the old plan produced. Oracle SQL unchanged.
    (s, dir) => Fixtures.table(s, dir, "lineitem")
      .select(col("l_partkey"),
        expr("CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)").as("xl"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
          .as("yl"))
      .join(broadcast(Fixtures.table(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        sum(col("xl").cast(DecimalType(38, 0))).as("sxl"),
        sum(col("yl").cast(DecimalType(38, 0))).as("syl"),
        sum((col("xl") * col("yl")).cast(DecimalType(38, 0))).as("sxyl"),
        sum((col("xl") * col("xl")).cast(DecimalType(38, 0))).as("sxxl"),
        sum((col("yl") * col("yl")).cast(DecimalType(38, 0))).as("syyl"))
      // exact descale: the true quotients have ≤ 2 (sums) / ≤ 4
      // (product sums) decimals, within the (38,6) division result
      .selectExpr("p_brand", "n", "sxl / 100 AS sx", "syl / 100 AS sy",
        "sxyl / 10000 AS sxy", "sxxl / 10000 AS sxx",
        "syyl / 10000 AS syy")
      .selectExpr("p_brand", "n",
        "round((cast(n AS DOUBLE) * cast(sxy AS DOUBLE) - " +
          "cast(sx AS DOUBLE) * cast(sy AS DOUBLE)) / " +
          "(cast(n AS DOUBLE) * cast(sxx AS DOUBLE) - " +
          "cast(sx AS DOUBLE) * cast(sx AS DOUBLE)), 12) AS slope",
        "round((cast(sy AS DOUBLE) - ((cast(n AS DOUBLE) * " +
          "cast(sxy AS DOUBLE) - cast(sx AS DOUBLE) * " +
          "cast(sy AS DOUBLE)) / (cast(n AS DOUBLE) * " +
          "cast(sxx AS DOUBLE) - cast(sx AS DOUBLE) * " +
          "cast(sx AS DOUBLE))) * cast(sx AS DOUBLE)) / " +
          "cast(n AS DOUBLE), 6) AS intercept",
        "round(pow((cast(n AS DOUBLE) * cast(sxy AS DOUBLE) - " +
          "cast(sx AS DOUBLE) * cast(sy AS DOUBLE)), 2) / " +
          "((cast(n AS DOUBLE) * cast(sxx AS DOUBLE) - " +
          "cast(sx AS DOUBLE) * cast(sx AS DOUBLE)) * " +
          "(cast(n AS DOUBLE) * cast(syy AS DOUBLE) - " +
          "cast(sy AS DOUBLE) * cast(sy AS DOUBLE))), 12) AS r2")
      .orderBy("p_brand"),
    Some("""WITH xy AS (SELECT p_brand,
          cast(l_quantity AS DECIMAL(19,4)) AS x,
          cast(l_extendedprice AS DECIMAL(19,4)) AS y
        FROM lineitem JOIN part ON l_partkey = p_partkey),
      m AS (SELECT p_brand, count(*)::BIGINT AS n,
          sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
          sum(x * x) AS sxx, sum(y * y) AS syy
        FROM xy GROUP BY 1)
      SELECT p_brand, n,
        round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
          / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 12)
          AS slope,
        round((sy::DOUBLE - ((n::DOUBLE * sxy::DOUBLE
            - sx::DOUBLE * sy::DOUBLE)
          / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE))
          * sx::DOUBLE) / n::DOUBLE, 6) AS intercept,
        round(pow(n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE, 2)
          / ((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
            * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 12)
          AS r2
      FROM m ORDER BY p_brand"""))

  // ---------- q234: Spearman rank correlation (balance vs spend) ------

  /** Spearman rank correlation between a customer's account balance
    * and their lifetime spend (zero-order customers spend 0 — the
    * left-outer join keeps them; dropping them biases ρ upward).
    * Ties get textbook average ranks, computed WITHOUT floats:
    * 2·avgrank = 2·rank() + count_over_ties − 1 is an integer, and
    * Pearson on ranks is invariant under the ×2 (affine) transform,
    * so all moments are exact int64/DECIMAL(38,0) sums (q226's
    * convention) and ρ is one double formula rounded 12. Scale note:
    * the two global rank()s run the RangeNtile two-pass boundary-
    * broadcast row_number (per-shard sort + offset broadcast) with
    * rank() recovered as min(row_number) per tie group via an ordinary
    * hash-partitioned window — no single-partition sort anywhere
    * (graft.ntile.strategy=window restores the window form the spec
    * compares against); the moment pass is partitioning-agnostic.
    */
  private val q234 = QueryDef(
    "q234_spearman_balance_spend",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val spend = Fixtures.table(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"))
        .join(Fixtures.table(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(col("o_totalprice").cast(DecimalType(18, 4)))
            .as("spend_d")),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .select(col("c_custkey"), col("c_acctbal"),
          coalesce(col("spend_d"), lit(0).cast(DecimalType(18, 4)))
            .as("spend"))
      val wx = Window.partitionBy(col("c_acctbal"))
      val wy = Window.partitionBy(col("spend"))
      val ranked =
        if (s.conf.getOption("graft.ntile.strategy").contains("window"))
          spend
            .withColumn("rx2",
              lit(2) * rank().over(Window.orderBy(col("c_acctbal")))
                + count(lit(1)).over(wx) - lit(1))
            .withColumn("ry2",
              lit(2) * rank().over(Window.orderBy(col("spend")))
                + count(lit(1)).over(wy) - lit(1))
        else {
          // rank() = min(global row_number) within the tie group; the
          // tie-group window hashes on the key, so both passes stay
          // distributed end-to-end.
          val rn = RangeNtile.withRowNumber(
            RangeNtile.withRowNumber(spend,
              Seq(col("c_acctbal"), col("c_custkey")), "__rnx"),
            Seq(col("spend"), col("c_custkey")), "__rny")
          rn.withColumn("rx2",
              lit(2) * min(col("__rnx")).over(wx)
                + count(lit(1)).over(wx) - lit(1))
            .withColumn("ry2",
              lit(2) * min(col("__rny")).over(wy)
                + count(lit(1)).over(wy) - lit(1))
            .drop("__rnx", "__rny")
        }
      ranked.agg(count(lit(1)).as("n"),
          sum(col("rx2").cast("long")).as("sx"),
          sum(col("ry2").cast("long")).as("sy"),
          sum((col("rx2").cast("long") * col("ry2").cast("long"))
            .cast(DecimalType(38, 0))).as("sxy"),
          sum((col("rx2").cast("long") * col("rx2").cast("long"))
            .cast(DecimalType(38, 0))).as("sxx"),
          sum((col("ry2").cast("long") * col("ry2").cast("long"))
            .cast(DecimalType(38, 0))).as("syy"))
        .selectExpr("n",
          "round((cast(n AS DOUBLE) * cast(sxy AS DOUBLE) - " +
            "cast(sx AS DOUBLE) * cast(sy AS DOUBLE)) / " +
            "(sqrt(cast(n AS DOUBLE) * cast(sxx AS DOUBLE) - " +
            "cast(sx AS DOUBLE) * cast(sx AS DOUBLE)) * " +
            "sqrt(cast(n AS DOUBLE) * cast(syy AS DOUBLE) - " +
            "cast(sy AS DOUBLE) * cast(sy AS DOUBLE))), 12) AS spearman")
    },
    Some("""WITH spend AS (SELECT c_custkey, c_acctbal,
          coalesce(sp, cast(0 AS DECIMAL(19,4))) AS spend
        FROM customer LEFT JOIN (
          SELECT o_custkey,
            sum(cast(o_totalprice AS DECIMAL(19,4))) AS sp
          FROM orders GROUP BY 1) o ON c_custkey = o_custkey),
      ranked AS (SELECT
          2 * rank() OVER (ORDER BY c_acctbal)
            + count(*) OVER (PARTITION BY c_acctbal) - 1 AS rx2,
          2 * rank() OVER (ORDER BY spend)
            + count(*) OVER (PARTITION BY spend) - 1 AS ry2
        FROM spend),
      m AS (SELECT count(*)::BIGINT AS n,
          sum(rx2)::BIGINT AS sx, sum(ry2)::BIGINT AS sy,
          sum(cast(rx2 * ry2 AS DECIMAL(38,0))) AS sxy,
          sum(cast(rx2 * rx2 AS DECIMAL(38,0))) AS sxx,
          sum(cast(ry2 * ry2 AS DECIMAL(38,0))) AS syy
        FROM ranked)
      SELECT n,
        round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
          / (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
            * sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)),
          12) AS spearman
      FROM m"""))

  // ---------- q235: shipping priority (unshipped-order revenue) -------

  /** Top-10 open revenue among a market segment's orders placed before
    * a cutoff whose lines ship after it — the TPC-H Q3 shape (the
    * order-book backlog report). Shape: the date predicates push into
    * BOTH parquet scans (orders and lineitem each arrive pre-filtered),
    * the segment filter rides the customer⋈orders equi-join (shuffled
    * on custkey — the segment keeps ~1/5 of a customer table that is
    * NOT broadcast-able at warehouse scale), then one shuffle on
    * orderkey joins the open lines and the top-10 is a TakeOrdered,
    * never a global sort. Revenue is the DECIMAL term-sum convention.
    */
  private val q235 = QueryDef(
    "q235_shipping_priority",
    (s, dir) => {
      val bcust = Fixtures.table(s, dir, "customer")
        .where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ords = Fixtures.table(s, dir, "orders")
        .where(expr("o_orderdate < TIMESTAMP '1998-01-01'"))
        .join(bcust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_orderdate"))
      Fixtures.table(s, dir, "lineitem")
        .where(expr("l_shipdate > TIMESTAMP '1998-01-01'"))
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .join(ords, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("odate"))
        .agg(dsum(expr("l_extendedprice * (1.0 - l_discount)"))
          .as("revenue"), count(lit(1)).as("n_open_lines"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""SELECT l_orderkey, o_orderdate::DATE AS odate,
        cast(sum(cast(l_extendedprice * (1.0 - l_discount)
          AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        count(*) AS n_open_lines
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""))

  // ---------- q236: promo revenue share per month ---------------------

  /** Monthly share of revenue attributable to promotional parts — the
    * TPC-H Q14 shape extended from one month to the full time series
    * (the marketing-effect trend line). Shape: the part⋈lineitem join
    * is a plain equi-join on partkey (a 100 TB part table is
    * executor-sized, not driver-sized — AQE may still elect broadcast
    * at fixture scale), then ONE monthly aggregate computes both the
    * conditional promo sum and the total in the same pass (no second
    * scan, no self-join). Both sums keep the DECIMAL term convention;
    * the share is one double division rounded at the end.
    */
  private val q236 = QueryDef(
    "q236_promo_share",
    (s, dir) => {
      val flag = Fixtures.table(s, dir, "part")
        .select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo"))
      Fixtures.table(s, dir, "lineitem")
        .select(col("l_partkey"),
          date_trunc("month", col("l_shipdate")).cast("date").as("month"),
          col("l_extendedprice"), col("l_discount"))
        .join(flag, col("l_partkey") === col("p_partkey"))
        .groupBy(col("month"))
        .agg(
          dsum(expr("CASE WHEN is_promo THEN " +
            "l_extendedprice * (1.0 - l_discount) ELSE 0 END"))
            .as("promo_revenue"),
          dsum(expr("l_extendedprice * (1.0 - l_discount)"))
            .as("total_revenue"))
        .select(col("month"), col("promo_revenue"), col("total_revenue"),
          round(lit(100.0) * col("promo_revenue") / col("total_revenue"), 9)
            .as("promo_share"))
        .orderBy("month")
    },
    Some("""SELECT date_trunc('month', l_shipdate)::DATE AS month,
        cast(sum(cast(CASE WHEN p_type = 'PROMO'
          THEN l_extendedprice * (1.0 - l_discount) ELSE 0 END
          AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue,
        cast(sum(cast(l_extendedprice * (1.0 - l_discount)
          AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue,
        round(100.0 * cast(sum(cast(CASE WHEN p_type = 'PROMO'
            THEN l_extendedprice * (1.0 - l_discount) ELSE 0 END
            AS DECIMAL(18,4))) AS DOUBLE)
          / cast(sum(cast(l_extendedprice * (1.0 - l_discount)
            AS DECIMAL(18,4))) AS DOUBLE), 9) AS promo_share
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1 ORDER BY 1"""))

  // ---------- q237: order-priority count with late-line EXISTS --------

  /** Orders per priority class that contain at least one slow line
    * (shipped > 90 days after the order date) — the TPC-H Q4 shape:
    * an EXISTS subquery that Spark should plan as a LEFT SEMI join.
    * The semi-join runs on the orderkey equi-key with the lateness
    * comparison as the join residual, so each order's lines are
    * examined once and short-circuit on the first hit — never a
    * distinct-then-join materializing the full late-line set. The
    * oracle keeps the correlated EXISTS form, checking Spark's
    * semi-join plan against DuckDB's subquery decorrelation.
    */
  private val q237 = QueryDef(
    "q237_late_order_priority",
    (s, dir) => {
      val li = Fixtures.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      Fixtures.table(s, dir, "orders")
        .join(li,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > expr("o_orderdate + INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS n_orders
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
      GROUP BY 1 ORDER BY 1"""))

  // ---------- q238: local-supplier volume (TPC-H Q5) ------------------

  /** Revenue per nation from orders where the customer and the line's
    * supplier share the nation, restricted to one region and one
    * order-year — the TPC-H Q5 shape (the does-local-supply-matter
    * report) and the classic multi-join benchmark. Shape: the
    * region-filtered supplier geography broadcasts onto the lineitem
    * scan (q189's supGeo idiom — region cuts it to ~1/5), the
    * date-filtered orders join on orderkey, customers join on custkey
    * (two fact-sized shuffles, each on the natural key), and the
    * customer=supplier nation equality is a post-join residual — the
    * join graph Catalyst reorders freely. DECIMAL revenue convention.
    */
  private val q238 = QueryDef(
    "q238_local_supplier_volume",
    (s, dir) => {
      val supGeo = Fixtures.table(s, dir, "supplier")
        .join(Fixtures.table(s, dir, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .join(Fixtures.table(s, dir, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "AMERICA")
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val ords = Fixtures.table(s, dir, "orders")
        .where(expr("o_orderdate >= TIMESTAMP '1996-01-01' AND " +
          "o_orderdate < TIMESTAMP '1997-01-01'"))
        .select(col("o_orderkey"), col("o_custkey"))
      Fixtures.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(broadcast(supGeo), col("l_suppkey") === col("s_suppkey"))
        .join(ords, col("l_orderkey") === col("o_orderkey"))
        .join(Fixtures.table(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .where(col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum(expr("l_extendedprice * (1.0 - l_discount)"))
          .as("revenue"), count(lit(1)).as("n_lines"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name,
        cast(sum(cast(l_extendedprice * (1.0 - l_discount)
          AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        count(*) AS n_lines
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
        AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'AMERICA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY 1 ORDER BY revenue DESC, n_name"""))

  // ---------- q239: shipping-delay bucket × priority matrix -----------

  /** Order-to-ship delay distribution (30-day buckets) broken down by
    * order priority, with each bucket's share of its priority class —
    * the fulfillment-SLA heatmap. Shape: one orderkey shuffle joins
    * the facts, the bucket is a pure projection (floor of one
    * division — day arithmetic on both engines truncates the
    * timestamp to a date first), the matrix aggregate lands on
    * |priorities|×|buckets| rows, and the per-priority share is a
    * window over that TINY aggregate — a global window would be a
    * red flag on raw rows, but here it sorts dozens of rows, not the
    * fact table. Share rounded 12 for cross-engine double identity.
    */
  private val q239 = QueryDef(
    "q239_delay_matrix",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val joined = Fixtures.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
        .join(Fixtures.table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          (floor(datediff(col("l_shipdate"), col("o_orderdate"))
            .cast(DoubleType) / lit(30.0)) * lit(30)).cast("long")
            .as("delay_bucket"))
      val m = joined.groupBy(col("o_orderpriority"), col("delay_bucket"))
        .agg(count(lit(1)).as("n_lines"))
      val w = Window.partitionBy(col("o_orderpriority"))
      m.select(col("o_orderpriority"), col("delay_bucket"), col("n_lines"),
          round(col("n_lines").cast(DoubleType)
            / sum(col("n_lines")).over(w).cast(DoubleType), 12)
            .as("share"))
        .orderBy("o_orderpriority", "delay_bucket")
    },
    Some("""WITH m AS (SELECT o_orderpriority,
          (floor(date_diff('day', o_orderdate::DATE, l_shipdate::DATE)::DOUBLE
            / 30.0) * 30)::BIGINT AS delay_bucket,
          count(*) AS n_lines
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2)
      SELECT o_orderpriority, delay_bucket, n_lines,
        round(n_lines::DOUBLE / sum(n_lines)
          OVER (PARTITION BY o_orderpriority), 12) AS share
      FROM m ORDER BY o_orderpriority, delay_bucket"""))

  // ---------- q240: monthly full-fulfillment rate ---------------------

  /** Share of each month's orders whose EVERY line shipped within 60
    * days — the all-or-nothing fulfillment KPI (an order is only as
    * fast as its slowest line). Shape: one orderkey shuffle, a
    * per-order bool_and folded as min(flag) (partial-aggregable, so
    * the map side combines before the shuffle), then a monthly rollup
    * of |orders| rows. The universal quantifier is an aggregate, not
    * a NOT EXISTS anti-join — one pass instead of two.
    */
  private val q240 = QueryDef(
    "q240_fulfillment_rate",
    (s, dir) => {
      val perOrder = Fixtures.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
        .join(Fixtures.table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(min(when(
          col("l_shipdate") <= expr("o_orderdate + INTERVAL 60 DAYS"), 1L)
          .otherwise(0L)).as("all_fast"))
      perOrder.groupBy(col("month"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("all_fast")).as("n_fully_fast"))
        .select(col("month"), col("n_orders"), col("n_fully_fast"),
          round(col("n_fully_fast").cast(DoubleType)
            / col("n_orders").cast(DoubleType), 12).as("fast_share"))
        .orderBy("month")
    },
    Some("""WITH per_order AS (SELECT o_orderkey,
          date_trunc('month', o_orderdate)::DATE AS month,
          CASE WHEN bool_and(l_shipdate <= o_orderdate + INTERVAL 60 DAY)
            THEN 1 ELSE 0 END AS all_fast
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2)
      SELECT month, count(*) AS n_orders,
        sum(all_fast)::BIGINT AS n_fully_fast,
        round(sum(all_fast)::DOUBLE / count(*)::DOUBLE, 12) AS fast_share
      FROM per_order GROUP BY 1 ORDER BY 1"""))

  // ---------- q241: significant parts (revenue share HAVING) ---------

  /** Parts whose lifetime revenue exceeds 0.07 % of TOTAL lineitem
    * revenue — the TPC-H Q11 shape (group-by with a HAVING against a
    * global scalar; Q11's partsupp table is not in the fixture set, so
    * the same shape runs on lineitem revenue). The threshold compare
    * is EXACT: both sides stay DECIMAL (value·1000 > total) rather
    * than comparing against a double fraction, so boundary rows can't
    * flip between engines. Shape: one partkey-keyed aggregate
    * (map-side combined), a 1-row global total broadcast back, and a
    * filter — the HAVING never shuffles the fact table twice; output
    * is the surviving parts only.
    */
  private val q241 = QueryDef(
    "q241_significant_parts",
    (s, dir) => {
      val perPart = Fixtures.table(s, dir, "lineitem")
        .select(col("l_partkey"),
          expr("l_extendedprice * (1.0 - l_discount)")
            .cast(DecimalType(18, 4)).as("rev"))
        .groupBy(col("l_partkey"))
        .agg(sum(col("rev")).as("value_d"), count(lit(1)).as("n_lines"))
      val tot = perPart.agg(sum(col("value_d")).as("t"))
      perPart.crossJoin(broadcast(tot))
        .where(col("value_d") * lit(10000) > col("t") * lit(7))
        .select(col("l_partkey"),
          col("value_d").cast(DoubleType).as("value"), col("n_lines"))
        .orderBy(col("value").desc, col("l_partkey"))
    },
    Some("""WITH per_part AS (SELECT l_partkey,
          sum(cast(l_extendedprice * (1.0 - l_discount)
            AS DECIMAL(18,4))) AS value_d,
          count(*) AS n_lines
        FROM lineitem GROUP BY 1),
      tot AS (SELECT sum(value_d) AS t FROM per_part)
      SELECT l_partkey, value_d::DOUBLE AS value, n_lines::BIGINT AS n_lines
      FROM per_part, tot WHERE value_d * 10000 > t * 7
      ORDER BY value DESC, l_partkey"""))

  // ---------- q242: priority class by return flag (Q12 shape) ---------

  /** Lines shipped in 1996 split per return flag into high-priority
    * (URGENT/HIGH orders) vs low-priority line counts — the TPC-H Q12
    * shape (two-class conditional aggregation over a line-side
    * dimension after an orders join; the fixture lineitem has no
    * shipmode/receiptdate, so returnflag and shipdate stand in).
    * Shape: the date range pushes into the lineitem scan, the join
    * shuffles on orderkey only (two narrow columns from orders), and
    * both classes fold in ONE conditional aggregate pass — never two
    * scans. Share rounded 12 for cross-engine double identity.
    */
  private val q242 = QueryDef(
    "q242_priority_class",
    (s, dir) => {
      Fixtures.table(s, dir, "lineitem")
        .where(expr("l_shipdate >= TIMESTAMP '1996-01-01' " +
          "AND l_shipdate < TIMESTAMP '1997-01-01'"))
        .select(col("l_orderkey"), col("l_returnflag"))
        .join(Fixtures.table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .select(col("l_returnflag"), col("high_line_count"),
          col("low_line_count"),
          round(col("high_line_count").cast(DoubleType)
            / (col("high_line_count") + col("low_line_count"))
              .cast(DoubleType), 12).as("high_share"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
        sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
        sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          THEN 0 ELSE 1 END)::BIGINT AS low_line_count,
        round(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END)::DOUBLE
          / count(*)::DOUBLE, 12) AS high_share
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1 ORDER BY l_returnflag"""))

  // ---------- q243: dominant small-part suppliers (Q20 shape) ---------

  /** Suppliers who shipped MORE THAN 30 % of some 'small'-named part's
    * total 1996 volume — the TPC-H Q20 shape (a nested semi-join chain
    * whose inner threshold is CORRELATED per part; Q20's partsupp
    * availqty is not in the fixture set, so the per-part volume share
    * is the correlated quantity). The dominance compare is exact
    * decimal (sq·10 > pq·3 — never a double fraction). Shape: the
    * part-name filter semi-joins into the lineitem scan as a
    * broadcast (parts ≪ lines), quantities aggregate once per
    * (part, supplier) with the per-part total derived from THAT
    * aggregate (no second fact scan), the qualifying supplier set
    * enters supplier as a LEFT SEMI join, and nation broadcasts.
    */
  private val q243 = QueryDef(
    "q243_dominant_supplier",
    (s, dir) => {
      val smallParts = Fixtures.table(s, dir, "part")
        .where(col("p_name").startsWith("small"))
        .select(col("p_partkey"))
      val pair = Fixtures.table(s, dir, "lineitem")
        .where(expr("l_shipdate >= TIMESTAMP '1996-01-01' " +
          "AND l_shipdate < TIMESTAMP '1997-01-01'"))
        .select(col("l_partkey"), col("l_suppkey"),
          col("l_quantity").cast(DecimalType(18, 4)).as("q"))
        .join(broadcast(smallParts),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("q")).as("sq"))
      val ptot = pair.groupBy(col("l_partkey")).agg(sum(col("sq")).as("pq"))
      val dominant = pair.join(ptot, "l_partkey")
        .where(col("sq") * lit(10) > col("pq") * lit(3))
        .select(col("l_suppkey"))
      Fixtures.table(s, dir, "supplier")
        .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(Fixtures.table(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_name"), col("n_name"), col("s_acctbal"))
        .orderBy("s_name")
    },
    Some("""WITH li AS (SELECT l_partkey, l_suppkey,
          cast(l_quantity AS DECIMAL(18,4)) AS q
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_partkey IN (SELECT p_partkey FROM part
            WHERE p_name LIKE 'small%')),
      pair AS (SELECT l_partkey, l_suppkey, sum(q) AS sq
        FROM li GROUP BY 1, 2),
      ptot AS (SELECT l_partkey, sum(sq) AS pq FROM pair GROUP BY 1)
      SELECT s_name, n_name, s_acctbal
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE s_suppkey IN (SELECT l_suppkey
        FROM pair JOIN ptot USING (l_partkey) WHERE sq * 10 > pq * 3)
      ORDER BY s_name"""))

  // ---------- q248: order-total reconciliation audit ------------------

  /** Does the order header's total agree with the sum of its lines
    * (extendedprice discounted and taxed)? — the classic warehouse
    * reconciliation invariant, run after every load beside q106's FK
    * audit (keys can all resolve while the MONEY is still wrong).
    * Reports, per order status: orders with no lines at all, orders
    * reconciling exactly, and the mean/max absolute discrepancy.
    * Every delta is exact DECIMAL end-to-end (terms cast before the
    * sum, header cast to the same scale, subtraction exact) and is
    * pinned to integer ten-thousandths BEFORE any double appears —
    * engines round the decimal→double conversion differently at the
    * last ulp, and a reconciliation that rounds before comparing
    * would miss the one-cent drifts it exists to catch. Shape: one
    * orderkey-keyed line aggregate (map-side
    * combined) LEFT-joined back to orders on the SAME key, then a
    * |statuses|-row rollup.
    */
  private val q248 = QueryDef(
    "q248_order_reconciliation",
    (s, dir) => {
      // every factor is an exact 2-decimal value — the declared plan
      // casts each to a small-scale decimal BEFORE multiplying so the
      // product is exact rational arithmetic at scale 6. r16 (guide
      // §1.2 per-task work): that paid, per lineitem row, three
      // double→decimal casts (Double.toString + BigDecimal parse) and
      // two BigDecimal multiplies (the (12,2)×(7,2) product's 20-digit
      // precision leaves Decimal's compact-long fast path). The SAME
      // exact rationals come from scaled int64: with ep = 100·price,
      // d = 100·discount, t = 100·tax (floor(v·100+0.5) recovers each
      // integer exactly — |v·100 − k| ≪ 0.5 for exact 2-decimal
      // doubles), term·10⁶ = ep·(100−d)·(100+t) ≤ 1.1e7·100·108 ≈
      // 1.2e11 in plain long, and the per-order sum (≤ 7 lines/order,
      // any SF) stays far under 2⁶³. Downstream, au (micro-units of
      // |header − computed|) is abs(10⁴·hl − Σterm·10⁶) with
      // hl = 100·o_totalprice — bit-identical to the decimal plan's
      // au, so every aggregate below is unchanged. Oracle SQL keeps
      // the decimal form; hashes match because au is the same integer.
      val lines = Fixtures.table(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)" +
          " * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))" +
          " * (100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT))"))
          .as("computed_u"))
      Fixtures.table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * 10000")
            .as("header_u"))
        .join(lines, col("o_orderkey") === col("l_orderkey"), "left_outer")
        .select(col("o_orderstatus"),
          col("computed_u").isNull.cast("long").as("no_lines"),
          abs(col("header_u") - coalesce(col("computed_u"), lit(0L)))
            .as("au"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("no_lines")).as("n_no_lines"),
          sum(when(col("au") === 0L, 1L).otherwise(0L)).as("n_exact"),
          (sum(col("au")).cast(DoubleType) / lit(1e6)
            / count(lit(1)).cast(DoubleType)).as("mean_abs_delta"),
          (max(col("au")).cast(DoubleType) / lit(1e6)).as("max_abs_delta"))
        .orderBy("o_orderstatus")
    },
    Some("""WITH lines AS (SELECT l_orderkey,
          sum(cast(l_extendedprice AS DECIMAL(12,2))
            * (1 - cast(l_discount AS DECIMAL(6,2)))
            * (1 + cast(l_tax AS DECIMAL(6,2)))) AS computed
        FROM lineitem GROUP BY 1),
      recon AS (SELECT o_orderstatus,
          CASE WHEN computed IS NULL THEN 1 ELSE 0 END AS no_lines,
          (abs(cast(o_totalprice AS DECIMAL(12,2))
            - coalesce(computed, 0)) * 1000000)::BIGINT AS au
        FROM orders LEFT JOIN lines ON o_orderkey = l_orderkey)
      SELECT o_orderstatus, count(*)::BIGINT AS n_orders,
        sum(no_lines)::BIGINT AS n_no_lines,
        sum(CASE WHEN au = 0 THEN 1 ELSE 0 END)::BIGINT AS n_exact,
        sum(au)::DOUBLE / 1e6 / count(*)::DOUBLE AS mean_abs_delta,
        max(au)::DOUBLE / 1e6 AS max_abs_delta
      FROM recon GROUP BY 1 ORDER BY o_orderstatus"""))

  // ---------- q252: functional-dependency discovery audit -------------

  /** Data-profiling pass: for a fixed battery of candidate functional
    * dependencies (determinant → dependent), does the data actually
    * satisfy them? Reports, per candidate: distinct determinant
    * values, how many of those map to MORE than one dependent value
    * (violations), the worst fan-out, and how many base rows sit under
    * a violating determinant. Warehouse teams run exactly this after
    * every load to validate assumed keys and denormalization
    * invariants before queries start silently double-counting.
    * Distributed shape: each candidate is ONE determinant-keyed
    * aggregate (map-side combined — the per-group state is a distinct
    * set of dependents, bounded by the dependent's cardinality) whose
    * result re-aggregates to a single verdict row; candidates union to
    * a |battery|-row table, so output never scales with the data.
    */
  private def fdAudit(df: DataFrame, det: String, dep: String): DataFrame =
    df.groupBy(col(det))
      .agg(countDistinct(col(dep)).as("n_dep"), count(lit(1)).as("n_rows"))
      .agg(count(lit(1)).as("n_det"),
        sum(when(col("n_dep") > 1, 1L).otherwise(0L)).as("n_violating"),
        max(col("n_dep")).as("max_fanout"),
        sum(when(col("n_dep") > 1, col("n_rows")).otherwise(0L))
          .as("n_rows_violating"))
      .select(lit(s"$det->$dep").as("fd"), col("n_det"),
        col("n_violating"), col("max_fanout"), col("n_rows_violating"))

  private def fdOracle(table: String, det: String, dep: String): String =
    s"""SELECT '$det->$dep' AS fd, count(*)::BIGINT AS n_det,
      sum(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END)::BIGINT AS n_violating,
      max(n_dep)::BIGINT AS max_fanout,
      sum(CASE WHEN n_dep > 1 THEN n_rows ELSE 0 END)::BIGINT
        AS n_rows_violating
    FROM (SELECT $det, count(DISTINCT $dep)::BIGINT AS n_dep,
        count(*)::BIGINT AS n_rows
      FROM $table GROUP BY 1)"""

  private val FdBattery: Seq[(String, String, String)] = Seq(
    ("part", "p_brand", "p_type"),
    ("part", "p_name", "p_brand"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("customer", "c_name", "c_mktsegment"),
    ("nation", "n_name", "n_regionkey"))

  private val q252 = QueryDef(
    "q252_fd_discovery",
    (s, dir) => FdBattery
      .map { case (t, det, dep) => fdAudit(Fixtures.table(s, dir, t), det, dep) }
      .reduce(_ union _)
      .orderBy("fd"),
    Some(FdBattery
      .map { case (t, det, dep) => fdOracle(t, det, dep) }
      .mkString("", " UNION ALL ", " ORDER BY fd")))

  // ---------- q253: smoothed target encoding --------------------------

  /** ML feature engineering: encode the categorical p_brand by the
    * empirical rate of a binary label (line was returned), smoothed
    * toward the global prior so rare categories don't memorize noise —
    * enc = (n_pos + α·prior) / (n + α), α = 50 (the standard
    * additive-smoothing form of mean target encoding). Shape: the
    * label lives on the fact table, the category on a broadcast-sized
    * dim — one broadcast hash join, one 25-group aggregate (map-side
    * combined), and the global prior re-aggregates the 25 brand rows
    * on the driver-side plan (a 1-row broadcast crossJoin), so nothing
    * after the fact scan scales with the data.
    */
  private val q253 = QueryDef(
    "q253_target_encoding",
    (s, dir) => {
      val byBrand = Fixtures.table(s, dir, "lineitem")
        .select(col("l_partkey"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
      val prior = byBrand.agg(
        (sum(col("n_pos")).cast(DoubleType)
          / sum(col("n")).cast(DoubleType)).as("prior"))
      byBrand.crossJoin(broadcast(prior))
        .select(col("p_brand"), col("n"), col("n_pos"),
          round(col("prior"), 12).as("prior"),
          round((col("n_pos").cast(DoubleType) + lit(50.0) * col("prior"))
            / (col("n").cast(DoubleType) + lit(50.0)), 12).as("enc"))
        .orderBy("p_brand")
    },
    Some("""WITH b AS (SELECT p_brand, count(*)::BIGINT AS n,
          sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT
            AS n_pos
        FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
      g AS (SELECT sum(n_pos)::DOUBLE / sum(n)::DOUBLE AS prior FROM b)
      SELECT p_brand, n, n_pos, round(prior, 12) AS prior,
        round((n_pos::DOUBLE + 50.0 * prior) / (n::DOUBLE + 50.0), 12)
          AS enc
      FROM b, g ORDER BY p_brand"""))

  // ---------- q254: Mann-Whitney U from a value histogram -------------

  /** Nonparametric two-sample test per brand: do returned lines
    * ('R') ship in different quantities than kept lines? Mann-Whitney
    * U with midranks and the tie-corrected normal approximation. The
    * scale design is the point: quantity is a small-domain integer
    * (1..50), so instead of ranking individual lines (a corpus-sized
    * sort), the test is computed EXACTLY from a (brand × quantity)
    * count histogram — midranks fall out of a running sum over ≤50
    * rows per brand, and every rank-sum term stays in integer
    * arithmetic (2·R keeps midrank halves exact) until the final
    * z-score. One fact-scan aggregate, windows only over the ≤50-row
    * histogram, |brands| output rows.
    */
  private val q254 = QueryDef(
    "q254_mannwhitney",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hist = Fixtures.table(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("isa"))
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("qty"))
        .agg(sum(col("isa")).as("ca"),
          sum(lit(1L) - col("isa")).as("cb"))
      val w = Window.partitionBy(col("p_brand")).orderBy(col("qty"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val ranked = hist
        .withColumn("t", col("ca") + col("cb"))
        .withColumn("cum", coalesce(sum(col("t")).over(w), lit(0L)))
      ranked
        .groupBy(col("p_brand"))
        // rank-sum terms are exact but EXCEED int64 at warehouse row
        // counts (ca·2cum ≈ 1e8·8e9 per term, summed) — every sum that
        // mixes counts with cumulative ranks lifts to DECIMAL(38,0)
        // (exact integer arithmetic both engines share) before summing
        .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
          // 2·Σ ca·midrank with midrank = cum + (t+1)/2 — kept doubled
          // so tie midranks (halves) stay in exact integer arithmetic
          sum((col("ca") * (lit(2L) * col("cum") + col("t") + 1L))
            .cast(DecimalType(38, 0))).as("two_r_a"),
          sum(col("t").cast(DecimalType(38, 0)) * col("t") * col("t")
            - col("t")).as("tie3"))
        .select(col("p_brand"), col("n_a"), col("n_b"), col("tie3"),
          ((col("two_r_a") - col("n_a").cast(DecimalType(38, 0))
            * (col("n_a") + 1L)).cast(DoubleType) / 2.0).as("u_a"),
          (col("n_a").cast(DoubleType) * col("n_b").cast(DoubleType) / 2.0)
            .as("mu"))
        .select(col("p_brand"), col("n_a"), col("n_b"),
          col("u_a"), round(col("mu"), 12).as("mu"),
          round((col("u_a") - col("mu"))
            / sqrt(col("n_a").cast(DoubleType) * col("n_b").cast(DoubleType)
              / 12.0
              * ((col("n_a") + col("n_b") + 1L).cast(DoubleType)
                - col("tie3").cast(DoubleType)
                  / ((col("n_a") + col("n_b")).cast(DoubleType)
                    * (col("n_a") + col("n_b") - 1L).cast(DoubleType)))),
            12).as("z"))
        .orderBy("p_brand")
    },
    Some("""WITH hist AS (SELECT p_brand, l_quantity::BIGINT AS qty,
          sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT
            AS ca,
          sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END)::BIGINT
            AS cb
        FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2),
      ranked AS (SELECT p_brand, ca, cb, ca + cb AS t,
          coalesce(sum(ca + cb) OVER (PARTITION BY p_brand ORDER BY qty
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        FROM hist),
      m AS (SELECT p_brand, sum(ca)::BIGINT AS n_a, sum(cb)::BIGINT AS n_b,
          sum(ca * (2 * cum + t + 1)) AS two_r_a,
          sum(t::HUGEINT * t * t - t) AS tie3
        FROM ranked GROUP BY 1)
      SELECT p_brand, n_a, n_b,
        (two_r_a - n_a * (n_a + 1))::DOUBLE / 2.0 AS u_a,
        round(n_a::DOUBLE * n_b::DOUBLE / 2.0, 12) AS mu,
        round(((two_r_a - n_a * (n_a + 1))::DOUBLE / 2.0
            - n_a::DOUBLE * n_b::DOUBLE / 2.0)
          / sqrt(n_a::DOUBLE * n_b::DOUBLE / 12.0
            * ((n_a + n_b + 1)::DOUBLE
              - tie3::DOUBLE / ((n_a + n_b)::DOUBLE
                * (n_a + n_b - 1)::DOUBLE))), 12) AS z
      FROM m ORDER BY p_brand"""))

  // ---------- q261: k-core peel (one iteration) ------------------------

  /** Graph pruning for the co-purchase graph: one peeling iteration of
    * k-core decomposition (k = 3) — drop every part whose co-purchase
    * degree is below k, keep only edges whose BOTH endpoints survive,
    * and report the post-peel degree histogram (survivors stranded at
    * degree 0 included, which a naive edges-only recount would lose).
    * The full decomposition iterates this to a fixed point; each
    * iteration is what ships here — the pre-peel degrees ARE the shared
    * degree cache (copurchase_degree), the survivor-induced recount is
    * one semi-join + aggregate over the shared adj⋈deg materialization
    * (copurchase_adj_deg), all linear in |edges|, with the 1-row peel
    * summary broadcast onto the histogram (a |degrees|-row table)
    * rather than recomputed.
    */
  private val q261 = QueryDef(
    "q261_kcore_peel",
    (s, dir) => {
      val KCore = 3
      // deg0 IS the shared degree table (copurchase_degree) and the
      // survivor-filtered adjacency rides the shared adj⋈deg
      // materialization (copurchase_adj_deg) — q261 previously rebuilt
      // both from the pair list (two 2|E|-row shuffles per run)
      val deg0 = copurchaseDegrees(s, dir)
      val survivors = deg0.where(col("deg") >= KCore).select(col("node"))
      // post-peel degree: directed adjacency rows whose CENTER survives
      // (deg >= k rides the cached adj⋈deg) and whose neighbor survives
      val deg1 = copurchaseAdjDeg(s, dir)
        .where(col("deg") >= KCore)
        .join(survivors.select(col("node").as("nbr")), Seq("nbr"),
          "left_semi")
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val hist = survivors.join(deg1, Seq("node"), "left_outer")
        .select(coalesce(col("deg"), lit(0L)).as("degree"))
        .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
      val summary = deg0.agg(count(lit(1)).as("n_initial"),
        sum(when(col("deg") < KCore, 1L).otherwise(0L)).as("n_peeled"))
      hist.crossJoin(broadcast(summary))
        .select(col("degree"), col("n_nodes"), col("n_initial"),
          col("n_peeled"))
        .orderBy("degree")
    },
    Some("""WITH baskets AS (SELECT l_orderkey,
          list_sort(list_distinct(list(l_partkey))) AS parts
        FROM lineitem GROUP BY 1),
      pairs AS (SELECT DISTINCT part_a, part_b FROM (
        SELECT l_orderkey, a.part_a, b.part_b FROM (
          SELECT l_orderkey, unnest(parts) AS part_a FROM baskets) a
        JOIN (SELECT l_orderkey, unnest(parts) AS part_b FROM baskets) b
        USING (l_orderkey) WHERE a.part_a < b.part_b)),
      deg0 AS (SELECT node, count(*)::BIGINT AS deg FROM (
          SELECT part_a AS node FROM pairs
          UNION ALL SELECT part_b FROM pairs) GROUP BY 1),
      survivors AS (SELECT node FROM deg0 WHERE deg >= 3),
      edges1 AS (SELECT part_a, part_b FROM pairs
        WHERE part_a IN (SELECT node FROM survivors)
          AND part_b IN (SELECT node FROM survivors)),
      deg1 AS (SELECT node, count(*)::BIGINT AS deg FROM (
          SELECT part_a AS node FROM edges1
          UNION ALL SELECT part_b FROM edges1) GROUP BY 1),
      hist AS (SELECT coalesce(deg, 0) AS degree,
          count(*)::BIGINT AS n_nodes
        FROM survivors s LEFT JOIN deg1 d ON s.node = d.node GROUP BY 1),
      summary AS (SELECT count(*)::BIGINT AS n_initial,
          sum(CASE WHEN deg < 3 THEN 1 ELSE 0 END)::BIGINT AS n_peeled
        FROM deg0)
      SELECT degree, n_nodes, n_initial, n_peeled
      FROM hist, summary ORDER BY degree"""))

  // ---------- q263: Simpson's-paradox audit ----------------------------

  /** Aggregation-reversal detector: the OLS slope of extended price on
    * quantity, pooled across the whole fact table, versus the same
    * slope within each brand — Simpson's paradox is a within-group
    * sign that contradicts the pooled sign, and any metrics layer
    * serving both drill-down and rollup views needs to KNOW when its
    * data does this. The slope's sign is decided entirely by the
    * numerator n·Σxy − Σx·Σy (the denominator is a positive variance),
    * and with DECIMAL-lifted sums that numerator is EXACT — so the
    * reversal verdict is integer-arithmetic-certain, never a last-ulp
    * coin flip; only the reported pooled slope itself is a (rounded)
    * double. One fact scan into a 25-group aggregate, pooled moments
    * re-aggregated from the group rows, one output row.
    */
  private val q263 = QueryDef(
    "q263_simpson_audit",
    (s, dir) => {
      // r16 (guide §1.2 — the q233 pattern): y's DECIMAL(18,4) cast and
      // the y·x product ran BigDecimal per lineitem row; the identical
      // rational sums come from yl = 100·y in plain long (exact for
      // 2-decimal values), products in long (yl·x ≤ 5.5e8), sums in
      // DECIMAL(38,0), descaled ONCE per 25-row group: S/100 at true
      // scale ≤ 2 is exact in the (38,6) division result, so num's
      // sign test and every downstream double are bit-identical.
      val byBrand = Fixtures.table(s, dir, "lineitem")
        .select(col("l_partkey"),
          col("l_quantity").cast("long").as("x"),
          expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
            .as("yl"))
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("yl").cast(DecimalType(38, 0))).as("syl"),
          sum((col("yl") * col("x")).cast(DecimalType(38, 0))).as("sxyl"),
          sum(col("x") * col("x")).as("sxx"))
        .selectExpr("p_brand", "n", "sx", "syl / 100 AS sy",
          "sxyl / 100 AS sxy", "sxx")
      val num = (col("n").cast(DecimalType(38, 4)) * col("sxy")
        - col("sx").cast(DecimalType(38, 4)) * col("sy"))
      val flags = byBrand.select(
        when(num > 0, 1L).otherwise(0L).as("pos"),
        when(num < 0, 1L).otherwise(0L).as("neg"),
        col("n"), col("sx"), col("sy"), col("sxy"), col("sxx"))
      flags.agg(
        count(lit(1)).as("n_groups"),
        sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
        sum(col("n")).as("tn"), sum(col("sx")).as("tsx"),
        sum(col("sy")).as("tsy"), sum(col("sxy")).as("tsxy"),
        sum(col("sxx")).as("tsxx"))
        .select(col("n_groups"), col("n_pos"), col("n_neg"),
          round((col("tn").cast("double") * col("tsxy").cast("double")
            - col("tsx").cast("double") * col("tsy").cast("double"))
            / (col("tn").cast("double") * col("tsxx").cast("double")
              - col("tsx").cast("double") * col("tsx").cast("double")), 12)
            .as("pooled_slope"),
          when((col("tn").cast(DecimalType(38, 4)) * col("tsxy")
            - col("tsx").cast(DecimalType(38, 4)) * col("tsy")) > 0,
            col("n_neg")).otherwise(col("n_pos")).as("n_reversed"))
    },
    Some("""WITH b AS (SELECT p_brand, count(*)::BIGINT AS n,
          sum(l_quantity::BIGINT)::BIGINT AS sx,
          sum(cast(l_extendedprice AS DECIMAL(18,4))) AS sy,
          sum(cast(l_extendedprice AS DECIMAL(18,4)) * l_quantity::BIGINT)
            AS sxy,
          sum(l_quantity::BIGINT * l_quantity::BIGINT)::BIGINT AS sxx
        FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
      f AS (SELECT
          CASE WHEN n * sxy - sx * sy > 0 THEN 1 ELSE 0 END AS pos,
          CASE WHEN n * sxy - sx * sy < 0 THEN 1 ELSE 0 END AS neg,
          n, sx, sy, sxy, sxx FROM b),
      m AS (SELECT count(*)::BIGINT AS n_groups,
          sum(pos)::BIGINT AS n_pos, sum(neg)::BIGINT AS n_neg,
          sum(n)::BIGINT AS tn, sum(sx)::BIGINT AS tsx,
          sum(sy) AS tsy, sum(sxy) AS tsxy, sum(sxx)::BIGINT AS tsxx
        FROM f)
      SELECT n_groups, n_pos, n_neg,
        round((tn::DOUBLE * tsxy::DOUBLE - tsx::DOUBLE * tsy::DOUBLE)
          / (tn::DOUBLE * tsxx::DOUBLE - tsx::DOUBLE * tsx::DOUBLE), 12)
          AS pooled_slope,
        CASE WHEN tn * tsxy - tsx * tsy > 0 THEN n_neg ELSE n_pos END
          AS n_reversed
      FROM m"""))

  // ---------- q266: join-cardinality estimator audit -------------------

  /** The optimizer's blind spot, measured: for the three core FK joins,
    * the EXACT join output size Σₖ aₖ·bₖ next to the textbook
    * uniformity estimate |A|·|B| / max(dA, dB) every cost-based
    * optimizer falls back to — the ratio is the skew-driven
    * misestimate that turns a planned broadcast into an OOM or a
    * shuffle into a nested loop at 100 TB. Each audit is two per-key
    * count aggregates (map-side combined) joined on the key — the
    * exact product sum DECIMAL-lifted (aₖ·bₖ sums pass int64 under
    * skew) — and a 1-row verdict; the battery unions to 3 rows.
    */
  private def cardAudit(name: String, left: DataFrame, lk: String,
      right: DataFrame, rk: String): DataFrame = {
    val la = left.groupBy(col(lk).as("k")).agg(count(lit(1)).as("a"))
    val lb = right.groupBy(col(rk).as("k")).agg(count(lit(1)).as("b"))
    val sides = la.agg(sum(col("a")).as("n_left"),
        count(lit(1)).as("d_left"))
      .crossJoin(lb.agg(sum(col("b")).as("n_right"),
        count(lit(1)).as("d_right")))
    val exact = la.join(lb, Seq("k"))
      .agg(coalesce(sum((col("a") * col("b")).cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("n_exact"))
    sides.crossJoin(exact)
      .select(lit(name).as("join_key"), col("n_left"), col("n_right"),
        col("d_left"), col("d_right"),
        col("n_exact").cast("long").as("n_exact"),
        round(col("n_left").cast("double") * col("n_right").cast("double")
          / greatest(col("d_left"), col("d_right")).cast("double"), 3)
          .as("n_est"),
        round(col("n_exact").cast("double")
          / (col("n_left").cast("double") * col("n_right").cast("double")
            / greatest(col("d_left"), col("d_right")).cast("double")), 12)
          .as("ratio"))
  }

  private def cardOracle(name: String, lt: String, lk: String,
      rt: String, rk: String): String =
    s"""SELECT '$name' AS join_key,
      (SELECT count(*) FROM $lt)::BIGINT AS n_left,
      (SELECT count(*) FROM $rt)::BIGINT AS n_right,
      (SELECT count(DISTINCT $lk) FROM $lt)::BIGINT AS d_left,
      (SELECT count(DISTINCT $rk) FROM $rt)::BIGINT AS d_right,
      coalesce((SELECT sum(a * b) FROM
        (SELECT $lk AS k, count(*)::BIGINT AS a FROM $lt GROUP BY 1) la
        JOIN (SELECT $rk AS k, count(*)::BIGINT AS b FROM $rt GROUP BY 1)
          lb USING (k)), 0)::BIGINT AS n_exact,
      round((SELECT count(*) FROM $lt)::DOUBLE
        * (SELECT count(*) FROM $rt)::DOUBLE
        / greatest((SELECT count(DISTINCT $lk) FROM $lt),
            (SELECT count(DISTINCT $rk) FROM $rt))::DOUBLE, 3) AS n_est,
      round(coalesce((SELECT sum(a * b) FROM
          (SELECT $lk AS k, count(*)::BIGINT AS a FROM $lt GROUP BY 1) la
          JOIN (SELECT $rk AS k, count(*)::BIGINT AS b FROM $rt GROUP BY 1)
            lb USING (k)), 0)::DOUBLE
        / ((SELECT count(*) FROM $lt)::DOUBLE
          * (SELECT count(*) FROM $rt)::DOUBLE
          / greatest((SELECT count(DISTINCT $lk) FROM $lt),
              (SELECT count(DISTINCT $rk) FROM $rt))::DOUBLE), 12)
        AS ratio"""

  private val q266 = QueryDef(
    "q266_join_cardinality_audit",
    (s, dir) => Seq(
      cardAudit("custkey", Fixtures.table(s, dir, "customer"), "c_custkey",
        Fixtures.table(s, dir, "orders"), "o_custkey"),
      cardAudit("orderkey", Fixtures.table(s, dir, "orders"), "o_orderkey",
        Fixtures.table(s, dir, "lineitem"), "l_orderkey"),
      cardAudit("partkey", Fixtures.table(s, dir, "part"), "p_partkey",
        Fixtures.table(s, dir, "lineitem"), "l_partkey"))
      .reduce(_ union _)
      .orderBy("join_key"),
    Some(Seq(
      cardOracle("custkey", "customer", "c_custkey", "orders", "o_custkey"),
      cardOracle("orderkey", "orders", "o_orderkey", "lineitem",
        "l_orderkey"),
      cardOracle("partkey", "part", "p_partkey", "lineitem", "l_partkey"))
      .mkString("", " UNION ALL ", " ORDER BY join_key")))

  // ---------- q267: propensity decile lift table -----------------------

  /** The campaign-targeting readout: customers deciled by a train-period
    * score (1995 spend), each decile's holdout response rate (placed a
    * 1996 order) and the cumulative lift over the base rate — the
    * gains table every propensity model ships with. The decile is a
    * CORPUS-SIZED global ntile, so it runs on the RangeNtile
    * boundary-broadcast two-pass by default (per-shard sorts only;
    * `graft.ntile.strategy=window` restores the window form the oracle
    * uses, spec-proven bit-identical). Spend ties (the no-train-order
    * mass at 0) are totalized by the custkey tiebreak. After labeling,
    * everything is a 10-row aggregate with cumulative windows over 10
    * rows.
    */
  private val q267 = QueryDef(
    "q267_decile_lift",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val orders = Fixtures.table(s, dir, "orders")
      val train = orders
        .where(expr("o_orderdate < TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 4))).as("spend"))
      val resp = orders
        .where(expr("o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'" +
          " AND o_orderdate < TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
        .select(col("o_custkey").as("rk")).distinct()
      val cust = Fixtures.table(s, dir, "customer")
        .select(col("c_custkey"))
        .join(train, col("c_custkey") === col("o_custkey"), "left_outer")
        .join(resp, col("c_custkey") === col("rk"), "left_outer")
        .select(col("c_custkey"),
          coalesce(col("spend"), lit(0).cast(DecimalType(18, 4)))
            .as("spend"),
          when(col("rk").isNotNull, 1L).otherwise(0L).as("resp"))
      val sortKey = Seq(col("spend").desc, col("c_custkey"))
      val labeled =
        if (s.conf.getOption("graft.ntile.strategy").contains("window"))
          cust.withColumn("decile",
            ntile(10).over(Window.orderBy(sortKey: _*)).cast("long"))
        else RangeNtile.withNtile(cust, sortKey, 10, "decile")
      val d = labeled.groupBy(col("decile"))
        .agg(count(lit(1)).as("n_cust"), sum(col("resp")).as("n_resp"))
      val wCum = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = d.agg(sum(col("n_cust")).as("tn"),
        sum(col("n_resp")).as("tr"))
      d.withColumn("cum_cust", sum(col("n_cust")).over(wCum))
        .withColumn("cum_resp", sum(col("n_resp")).over(wCum))
        .crossJoin(broadcast(tot))
        .select(col("decile"), col("n_cust"), col("n_resp"),
          round(col("n_resp").cast("double") / col("n_cust").cast("double"),
            12).as("resp_rate"),
          round((col("cum_resp").cast("double")
              / col("cum_cust").cast("double"))
            / (col("tr").cast("double") / col("tn").cast("double")), 12)
            .as("cum_lift"))
        .orderBy("decile")
    },
    Some("""WITH train AS (SELECT o_custkey,
          sum(cast(o_totalprice AS DECIMAL(18,4))) AS spend
        FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY 1),
      resp AS (SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
      cust AS (SELECT c_custkey,
          coalesce(spend, cast(0 AS DECIMAL(18,4))) AS spend,
          CASE WHEN r.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS resp
        FROM customer
        LEFT JOIN train t ON c_custkey = t.o_custkey
        LEFT JOIN resp r ON c_custkey = r.o_custkey),
      lab AS (SELECT c_custkey, resp,
          ntile(10) OVER (ORDER BY spend DESC, c_custkey) AS decile
        FROM cust),
      d AS (SELECT decile, count(*)::BIGINT AS n_cust,
          sum(resp)::BIGINT AS n_resp
        FROM lab GROUP BY 1),
      tot AS (SELECT sum(n_cust)::BIGINT AS tn, sum(n_resp)::BIGINT AS tr
        FROM d),
      c AS (SELECT decile, n_cust, n_resp,
          sum(n_cust) OVER (ORDER BY decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cust,
          sum(n_resp) OVER (ORDER BY decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_resp
        FROM d)
      SELECT decile::BIGINT AS decile, n_cust, n_resp,
        round(n_resp::DOUBLE / n_cust::DOUBLE, 12) AS resp_rate,
        round((cum_resp::DOUBLE / cum_cust::DOUBLE)
          / (tr::DOUBLE / tn::DOUBLE), 12) AS cum_lift
      FROM c, tot ORDER BY decile"""))


  // ---------- q269: partition modularity of the co-purchase graph -----

  /** Community-quality audit: Newman modularity Q = Σ_c (e_c/m −
    * (d_c/2m)²) of the co-purchase graph under the BRAND partition —
    * "do parts of a brand actually get bought together?", the number
    * that says whether brand is a real community structure or just a
    * label, complementing q226's assortativity (which correlates
    * degrees, not communities). All inputs are exact integer counts
    * (within-community edge count, community degree sums, |edges|)
    * from two broadcast-dim joins over the cached pair table and two
    * tiny rollups; only the final contribution is a rounded double.
    * Output: per-brand contribution rows with the graph total
    * broadcast onto each.
    */
  private val q269 = QueryDef(
    "q269_modularity",
    (s, dir) => {
      val brand = broadcast(Fixtures.table(s, dir, "part")
        .select(col("p_partkey"), col("p_brand")))
      // frozen: three aggregates (m, within, degree) consume the
      // brand-annotated edge list — one materialization, not three
      // re-joins over the cached pair table
      val edges = PlanCache.freeze(copurchasePairs(s, dir)
        .select(col("part_a"), col("part_b"))
        .join(brand.select(col("p_partkey").as("part_a"),
          col("p_brand").as("brand_a")), Seq("part_a"))
        .join(brand.select(col("p_partkey").as("part_b"),
          col("p_brand").as("brand_b")), Seq("part_b")))
      val m = edges.agg(count(lit(1)).as("m"))
      val within = edges.where(col("brand_a") === col("brand_b"))
        .groupBy(col("brand_a").as("p_brand"))
        .agg(count(lit(1)).as("e_within"))
      val degree = edges.select(col("brand_a").as("p_brand")).union(
          edges.select(col("brand_b").as("p_brand")))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("d_c"))
      // the graph's node set IS the shared degree table's key set
      val nodes = Fixtures.table(s, dir, "part")
        .join(copurchaseDegrees(s, dir)
          .select(col("node").as("p_partkey")), Seq("p_partkey"),
          "left_semi")
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n_nodes"))
      val contrib = (col("e_within").cast("double") / col("m").cast("double")
        - (col("d_c").cast("double") / (lit(2.0) * col("m").cast("double")))
          * (col("d_c").cast("double") / (lit(2.0) * col("m").cast("double"))))
      // per-brand contribution pinned to integer pico-units BEFORE the
      // graph total sums them (a float sum over brands would be
      // accumulation-order-dependent across engines)
      val perBrand = nodes
        .join(degree, Seq("p_brand"), "left_outer")
        .join(within, Seq("p_brand"), "left_outer")
        .select(col("p_brand"), col("n_nodes"),
          coalesce(col("d_c"), lit(0L)).as("d_c"),
          coalesce(col("e_within"), lit(0L)).as("e_within"))
        .crossJoin(broadcast(m))
        .select(col("p_brand"), col("n_nodes"), col("d_c"),
          col("e_within"),
          round(contrib * lit(1e12)).cast("long").as("pico"))
      val qTot = perBrand.agg(
        (sum(col("pico")).cast("double") / 1e12).as("q_modularity"))
      perBrand.crossJoin(broadcast(qTot))
        .select(col("p_brand"), col("n_nodes"), col("d_c"),
          col("e_within"),
          (col("pico").cast("double") / 1e12).as("contribution"),
          col("q_modularity"))
        .orderBy("p_brand")
    },
    Some("""WITH baskets AS (SELECT l_orderkey,
          list_sort(list_distinct(list(l_partkey))) AS parts
        FROM lineitem GROUP BY 1),
      pairs AS (SELECT DISTINCT part_a, part_b FROM (
        SELECT l_orderkey, a.part_a, b.part_b FROM (
          SELECT l_orderkey, unnest(parts) AS part_a FROM baskets) a
        JOIN (SELECT l_orderkey, unnest(parts) AS part_b FROM baskets) b
        USING (l_orderkey) WHERE a.part_a < b.part_b)),
      lab AS (SELECT part_a, part_b, pa.p_brand AS brand_a,
          pb.p_brand AS brand_b
        FROM pairs JOIN part pa ON part_a = pa.p_partkey
        JOIN part pb ON part_b = pb.p_partkey),
      m AS (SELECT count(*)::BIGINT AS m FROM lab),
      w AS (SELECT brand_a AS p_brand, count(*)::BIGINT AS e_within
        FROM lab WHERE brand_a = brand_b GROUP BY 1),
      deg AS (SELECT p_brand, count(*)::BIGINT AS d_c FROM (
          SELECT brand_a AS p_brand FROM lab
          UNION ALL SELECT brand_b FROM lab) GROUP BY 1),
      nodes AS (SELECT p_brand, count(*)::BIGINT AS n_nodes FROM part
        WHERE p_partkey IN (SELECT part_a FROM pairs
          UNION SELECT part_b FROM pairs)
        GROUP BY 1),
      pb AS (SELECT n.p_brand, n_nodes, coalesce(d_c, 0) AS d_c,
          coalesce(e_within, 0) AS e_within,
          round((coalesce(e_within, 0)::DOUBLE / m::DOUBLE
            - (coalesce(d_c, 0)::DOUBLE / (2.0 * m::DOUBLE))
              * (coalesce(d_c, 0)::DOUBLE / (2.0 * m::DOUBLE))) * 1e12)
            ::BIGINT AS pico
        FROM nodes n
        LEFT JOIN deg d ON n.p_brand = d.p_brand
        LEFT JOIN w ON n.p_brand = w.p_brand, m),
      qt AS (SELECT sum(pico)::DOUBLE / 1e12 AS q_modularity FROM pb)
      SELECT p_brand, n_nodes, d_c::BIGINT AS d_c,
        e_within::BIGINT AS e_within, pico::DOUBLE / 1e12 AS contribution,
        q_modularity
      FROM pb, qt ORDER BY p_brand"""))

  // ---------- q270: split-conformal prediction interval ----------------

  /** Distribution-free uncertainty for a warehouse predictor: predict a
    * line's price by its brand's TRAIN-period mean, take the
    * ceil(0.9·(n+1))-th smallest calibration-period absolute residual
    * as the conformal radius q̂ (the split-conformal guarantee:
    * ≥ 90 % coverage on exchangeable data, no model assumptions), then
    * MEASURE the coverage on the held-out test period. Everything is
    * integer-exact: prices in cents, the per-brand mean in micro-cents
    * by integer division, residuals as int64 — so the order statistic
    * is over integers and coverage can't wobble on an ulp. The k-th
    * order statistic runs on the RangeNtile boundary-broadcast
    * row_number (per-shard sorts; `graft.ntile.strategy=window`
    * restores the single-partition window the oracle uses,
    * RangeNtileSpec-proven identical) — exact quantile selection
    * WITHOUT a corpus sort, the primitive an assumption-free
    * prediction layer needs at 100 TB.
    */
  private val q270 = QueryDef(
    "q270_conformal_interval",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = Fixtures.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_shipdate"),
          expr("cast(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
      def period(lo: String, hi: String) = {
        val loC = if (lo.isEmpty) lit(true)
          else expr(s"l_shipdate >= TIMESTAMP_NTZ '$lo'")
        val hiC = if (hi.isEmpty) lit(true)
          else expr(s"l_shipdate < TIMESTAMP_NTZ '$hi'")
        li.where(loC && hiC)
      }
      val mean = period("", "1996-01-01 00:00:00")
        .groupBy(col("p_brand"))
        .agg(expr("(sum(cents) * 1000000) div count(*)").as("mean_micro"))
      def resid(df: DataFrame) = df.join(broadcast(mean), Seq("p_brand"))
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(col("cents") * lit(1000000L) - col("mean_micro")).as("r"))
      val cal = resid(period("1996-01-01 00:00:00", "1997-01-01 00:00:00"))
      val nCal = cal.agg(count(lit(1)).as("n_cal"),
        expr("cast(ceil(0.9 * (count(*) + 1)) AS BIGINT)").as("k"))
      val sortKey = Seq(col("r").asc, col("l_orderkey"), col("l_linenumber"))
      val ranked =
        if (s.conf.getOption("graft.ntile.strategy").contains("window"))
          cal.withColumn("rk",
            row_number().over(Window.orderBy(sortKey: _*)).cast("long"))
        else RangeNtile.withRowNumber(cal, sortKey, "rk")
      val qHat = ranked.crossJoin(broadcast(nCal))
        .where(col("rk") === col("k"))
        .select(col("n_cal"), col("k"), col("r").as("q_hat_micro"))
      val test = resid(period("1997-01-01 00:00:00", ""))
      test.crossJoin(broadcast(qHat))
        .agg(first(col("n_cal")).as("n_cal"), first(col("k")).as("k"),
          first(col("q_hat_micro")).as("q_hat_micro"),
          count(lit(1)).as("n_test"),
          sum(when(col("r") <= col("q_hat_micro"), 1L).otherwise(0L))
            .as("n_covered"))
        .select(col("n_cal"), col("k"), col("q_hat_micro"), col("n_test"),
          col("n_covered"),
          round(col("n_covered").cast("double")
            / col("n_test").cast("double"), 12).as("coverage"))
    },
    Some("""WITH li AS (SELECT l_orderkey, l_linenumber, l_shipdate,
          p_brand, round(l_extendedprice * 100)::BIGINT AS cents
        FROM lineitem JOIN part ON l_partkey = p_partkey),
      mean AS (SELECT p_brand,
          (sum(cents) * 1000000) // count(*) AS mean_micro
        FROM li WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY 1),
      cal AS (SELECT l_orderkey, l_linenumber,
          abs(cents * 1000000 - mean_micro) AS r
        FROM li JOIN mean USING (p_brand)
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'),
      nc AS (SELECT count(*)::BIGINT AS n_cal,
          ceil(0.9 * (count(*) + 1))::BIGINT AS k FROM cal),
      ranked AS (SELECT r, row_number() OVER (
          ORDER BY r, l_orderkey, l_linenumber) AS rk FROM cal),
      qh AS (SELECT n_cal, k, r AS q_hat_micro FROM ranked, nc
        WHERE rk = k),
      test AS (SELECT abs(cents * 1000000 - mean_micro) AS r
        FROM li JOIN mean USING (p_brand)
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00')
      SELECT n_cal, k, q_hat_micro::BIGINT AS q_hat_micro,
        count(*)::BIGINT AS n_test,
        sum(CASE WHEN r <= q_hat_micro THEN 1 ELSE 0 END)::BIGINT
          AS n_covered,
        round(sum(CASE WHEN r <= q_hat_micro THEN 1 ELSE 0 END)::DOUBLE
          / count(*)::DOUBLE, 12) AS coverage
      FROM test, qh GROUP BY 1, 2, 3"""))

  // ---------- q272: expected calibration error -------------------------

  /** Is the q253 target encoding honest as a PROBABILITY? Reliability
    * table + expected calibration error: each line's predicted return
    * probability (its brand's smoothed encoding, pinned once per brand
    * to integer micro-units) against the realized return rate, in
    * fixed-width 2 % confidence bins — ECE = Σ nᵦ/N·|accᵦ − confᵦ|, the
    * number that separates a useful score from a well-ranked but
    * miscalibrated one (q170's AUC can be perfect while this is
    * terrible). Per-bin gaps pin to nano-units before the N-weighted
    * total (exact integer products, DECIMAL-lifted), so ECE is
    * bit-stable across engines and run orders. Shape: one 25-row
    * encoding broadcast, one fact pass into ten bins.
    */
  private val q272 = QueryDef(
    "q272_calibration_ece",
    (s, dir) => {
      val byBrand = Fixtures.table(s, dir, "lineitem")
        .select(col("l_partkey"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
      val prior = byBrand.agg(
        (sum(col("n_pos")).cast("double") / sum(col("n")).cast("double"))
          .as("prior"))
      val enc = byBrand.crossJoin(broadcast(prior))
        .select(col("p_brand"),
          expr("""CAST(round((CAST(n_pos AS DOUBLE) + 50.0 * prior)
            / (CAST(n AS DOUBLE) + 50.0) * 1e6) AS BIGINT)""")
            .as("conf_micro"))
      val binned = Fixtures.table(s, dir, "lineitem")
        .select(col("l_partkey"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(enc), Seq("p_brand"))
        .select(col("y"), col("conf_micro"),
          least(expr("conf_micro div 20000"), lit(49L)).as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum(col("conf_micro").cast("decimal(38,0)")).as("sconf"))
        .select(col("bin"), col("n"), col("sy"),
          expr("""CAST(round(abs(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
            - CAST(sconf AS DOUBLE) / 1e6 / CAST(n AS DOUBLE)) * 1e9)
            AS BIGINT)""").as("gap_nano"))
      val ece = binned.agg(
        (sum((col("n") * col("gap_nano")).cast("decimal(38,0)"))
          .cast("double") / sum(col("n")).cast("double") / 1e9).as("ece"))
      binned.crossJoin(broadcast(ece))
        .select(col("bin"), col("n"), col("sy").as("n_returned"),
          round(col("sy").cast("double") / col("n").cast("double"), 12)
            .as("acc"),
          (col("gap_nano").cast("double") / 1e9).as("gap"),
          round(col("ece"), 12).as("ece"))
        .orderBy("bin")
    },
    Some("""WITH b AS (SELECT p_brand, count(*)::BIGINT AS n,
          sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT
            AS n_pos
        FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
      g AS (SELECT sum(n_pos)::DOUBLE / sum(n)::DOUBLE AS prior FROM b),
      enc AS (SELECT p_brand,
          round((n_pos::DOUBLE + 50.0 * prior) / (n::DOUBLE + 50.0)
            * 1e6)::BIGINT AS conf_micro
        FROM b, g),
      binned AS (SELECT bin, count(*)::BIGINT AS n,
          sum(y)::BIGINT AS sy, sum(conf_micro) AS sconf
        FROM (SELECT least(conf_micro // 20000, 49) AS bin,
            CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
            conf_micro
          FROM lineitem JOIN part ON l_partkey = p_partkey
          JOIN enc USING (p_brand))
        GROUP BY 1),
      gaps AS (SELECT bin, n, sy,
          round(abs(sy::DOUBLE / n::DOUBLE
            - sconf::DOUBLE / 1e6 / n::DOUBLE) * 1e9)::BIGINT AS gap_nano
        FROM binned),
      e AS (SELECT sum(n::HUGEINT * gap_nano)::DOUBLE / sum(n)::DOUBLE
          / 1e9 AS ece
        FROM gaps)
      SELECT bin::BIGINT AS bin, n, sy AS n_returned,
        round(sy::DOUBLE / n::DOUBLE, 12) AS acc,
        gap_nano::DOUBLE / 1e9 AS gap, round(ece, 12) AS ece
      FROM gaps, e ORDER BY bin"""))


  // ---------- q275: price indices (Laspeyres / Paasche / Fisher) -------

  /** Did prices move, holding the BASKET fixed? The three classic
    * bilateral price indices between 1995 (base) and 1996 (current)
    * over parts traded in BOTH years: Laspeyres weights price
    * relatives by base-year quantities, Paasche by current-year,
    * Fisher is their geometric mean. Per part-year unit prices pin to
    * integer micro-cents by INTEGER DIVISION of exact cent/quantity
    * sums (deterministic, no float mean), index numerators and
    * denominators are then exact integer dot products (DECIMAL-lifted
    * — price·quantity sums pass int64 at warehouse volume), and each
    * index is one final division. Shape: one fact pass into per
    * (part, year) cells, a self-join on partkey, one verdict row.
    */
  private val q275 = QueryDef(
    "q275_price_index",
    (s, dir) => {
      val cells = Fixtures.table(s, dir, "lineitem")
        .select(col("l_partkey"),
          expr("year(l_shipdate)").as("yr"),
          expr("cast(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
          col("l_quantity").cast("long").as("q"))
        .where(col("yr").isin(1995, 1996))
        .groupBy(col("l_partkey"), col("yr"))
        .agg(sum(col("cents")).as("sc"), sum(col("q")).as("sq"))
        .select(col("l_partkey"), col("yr"),
          expr("(sc * 10000) div sq").as("p_micro"), col("sq"))
      val base = cells.where(col("yr") === 1995)
        .select(col("l_partkey"), col("p_micro").as("p0"),
          col("sq").as("q0"))
      val cur = cells.where(col("yr") === 1996)
        .select(col("l_partkey"), col("p_micro").as("p1"),
          col("sq").as("q1"))
      base.join(cur, Seq("l_partkey"))
        .agg(count(lit(1)).as("n_parts"),
          sum((col("p1") * col("q0")).cast("decimal(38,0)")).as("l_num"),
          sum((col("p0") * col("q0")).cast("decimal(38,0)")).as("l_den"),
          sum((col("p1") * col("q1")).cast("decimal(38,0)")).as("p_num"),
          sum((col("p0") * col("q1")).cast("decimal(38,0)")).as("p_den"))
        .select(col("n_parts"),
          round(col("l_num").cast("double") / col("l_den").cast("double"),
            12).as("laspeyres"),
          round(col("p_num").cast("double") / col("p_den").cast("double"),
            12).as("paasche"),
          round(sqrt((col("l_num").cast("double")
              / col("l_den").cast("double"))
            * (col("p_num").cast("double") / col("p_den").cast("double"))),
            12).as("fisher"))
    },
    Some("""WITH cells AS (SELECT l_partkey, year(l_shipdate) AS yr,
          (sum(round(l_extendedprice * 100)::BIGINT) * 10000)
            // sum(l_quantity::BIGINT) AS p_micro,
          sum(l_quantity::BIGINT)::BIGINT AS sq
        FROM lineitem WHERE year(l_shipdate) IN (1995, 1996)
        GROUP BY 1, 2),
      base AS (SELECT l_partkey, p_micro AS p0, sq AS q0 FROM cells
        WHERE yr = 1995),
      cur AS (SELECT l_partkey, p_micro AS p1, sq AS q1 FROM cells
        WHERE yr = 1996),
      j AS (SELECT count(*)::BIGINT AS n_parts,
          sum(p1::HUGEINT * q0) AS l_num, sum(p0::HUGEINT * q0) AS l_den,
          sum(p1::HUGEINT * q1) AS p_num, sum(p0::HUGEINT * q1) AS p_den
        FROM base JOIN cur USING (l_partkey))
      SELECT n_parts,
        round(l_num::DOUBLE / l_den::DOUBLE, 12) AS laspeyres,
        round(p_num::DOUBLE / p_den::DOUBLE, 12) AS paasche,
        round(sqrt((l_num::DOUBLE / l_den::DOUBLE)
          * (p_num::DOUBLE / p_den::DOUBLE)), 12) AS fisher
      FROM j"""))

  // ---------- q277: isotonic calibration (PAV via bounded-bin minimax) -

  /** The repair step for what q272 diagnoses: monotone (isotonic)
    * regression of realized return rate on the q253 brand encoding —
    * the pool-adjacent-violators calibration map every production
    * scorer ships behind its raw output. The corpus collapses to the
    * same fact pass as q272, folded into 0.2 %-wide confidence bins; the PAV fit
    * is then computed on the bin sequence via the minimax identity
    * g(t) = max_{lo≤t} min_{hi≥t} avg(lo..hi) — equivalent to PAV's
    * pooled blocks, but expressible as two range joins over the
    * bounded bin table (≤500 bins ⇒ ≤500³ tuples worst case; observed
    * bins are further capped by distinct encodings) instead of a
    * sequential merge loop, which keeps BOTH engines on the identical
    * declarative formula. Determinism: every block average is one IEEE
    * division of exact int64 prefix-sum differences; correctly-rounded
    * division is monotone in the real value, so min/max over those
    * doubles equals the double of the rational minimax — bit-stable
    * across engines and join orders. Shape at 100 TB: the only
    * corpus-sized work is the binning aggregate; everything after runs
    * on the bounded bin table (broadcast nested-loop joins with a
    * ≤500-row build side, inside PlanLint's bound).
    */
  private val q277 = QueryDef(
    "q277_isotonic_calibration",
    (s, dir) => {
      val byBrand = Fixtures.table(s, dir, "lineitem")
        .select(col("l_partkey"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
      val prior = byBrand.agg(
        (sum(col("n_pos")).cast("double") / sum(col("n")).cast("double"))
          .as("prior"))
      val enc = byBrand.crossJoin(broadcast(prior))
        .select(col("p_brand"),
          expr("""CAST(round((CAST(n_pos AS DOUBLE) + 50.0 * prior)
            / (CAST(n AS DOUBLE) + 50.0) * 1e6) AS BIGINT)""")
            .as("conf_micro"))
      val binned = Fixtures.table(s, dir, "lineitem")
        .select(col("l_partkey"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(enc), Seq("p_brand"))
        .select(when(expr("conf_micro div 2000") > 499L, 499L)
          .otherwise(expr("conf_micro div 2000")).as("bin"), col("y"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
      // bounded-bin prefix sums; the single-partition window is
      // bin-sized, never corpus-sized (the q159 tiny-aggregate class).
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
      val pre = binned
        .withColumn("cn", sum(col("n")).over(w))
        .withColumn("cs", sum(col("sy")).over(w))
      val lo = pre.select(col("bin").as("lo"), col("n").as("lo_n"),
        col("sy").as("lo_sy"), col("cn").as("lo_cn"), col("cs").as("lo_cs"))
      val hi = pre.select(col("bin").as("hi"), col("cn").as("hi_cn"),
        col("cs").as("hi_cs"))
      val pairs = lo.join(broadcast(hi), col("lo") <= col("hi"))
        .select(col("lo"), col("hi"),
          ((col("hi_cs") - col("lo_cs") + col("lo_sy")).cast("double")
            / (col("hi_cn") - col("lo_cn") + col("lo_n")).cast("double"))
            .as("avgv"))
      val ts = pre.select(col("bin").as("t"))
      val inner = pairs.join(broadcast(ts),
          col("lo") <= col("t") && col("hi") >= col("t"))
        .groupBy(col("lo"), col("t")).agg(min(col("avgv")).as("mn"))
      val fit = inner.groupBy(col("t")).agg(max(col("mn")).as("fitted"))
      binned.join(broadcast(fit), col("bin") === col("t"))
        .select(col("bin"), col("n"), col("sy").as("n_returned"),
          round(col("sy").cast("double") / col("n").cast("double"), 12)
            .as("rate"),
          round(col("fitted"), 12).as("fitted"))
        .orderBy("bin")
    },
    Some("""WITH b AS (SELECT p_brand, count(*)::BIGINT AS n,
          sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT
            AS n_pos
        FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
      g AS (SELECT sum(n_pos)::DOUBLE / sum(n)::DOUBLE AS prior FROM b),
      enc AS (SELECT p_brand,
          round((n_pos::DOUBLE + 50.0 * prior) / (n::DOUBLE + 50.0)
            * 1e6)::BIGINT AS conf_micro
        FROM b, g),
      binned AS (SELECT least(conf_micro // 2000, 499) AS bin,
          count(*)::BIGINT AS n,
          sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT
            AS sy
        FROM lineitem JOIN part ON l_partkey = p_partkey
        JOIN enc USING (p_brand) GROUP BY 1),
      pre AS (SELECT bin, n, sy,
          sum(n) OVER (ORDER BY bin)::BIGINT AS cn,
          sum(sy) OVER (ORDER BY bin)::BIGINT AS cs
        FROM binned),
      pairs AS (SELECT a.bin AS lo, c.bin AS hi,
          (c.cs - a.cs + a.sy)::DOUBLE
            / (c.cn - a.cn + a.n)::DOUBLE AS avgv
        FROM pre a JOIN pre c ON a.bin <= c.bin),
      inn AS (SELECT p.lo, t.bin AS t, min(avgv) AS mn
        FROM pairs p JOIN pre t ON p.lo <= t.bin AND p.hi >= t.bin
        GROUP BY 1, 2),
      fit AS (SELECT t, max(mn) AS fitted FROM inn GROUP BY 1)
      SELECT bin::BIGINT AS bin, n, sy AS n_returned,
        round(sy::DOUBLE / n::DOUBLE, 12) AS rate,
        round(fitted, 12) AS fitted
      FROM binned JOIN fit ON bin = t ORDER BY bin"""))

  // ---------- q281: data-contract expectations battery -----------------

  /** The Great-Expectations-style contract gate a warehouse runs before
    * promoting a load: a battery of declarative rules — range, domain,
    * positivity, cross-column and referential — each reported as
    * (rule, n_checked, n_violations, violation_rate). Engineering
    * shape, not per-rule scans: the six single-table lineitem rules
    * fold into ONE conditional-aggregate pass (map-side partials, one
    * row out), the referential rule is the q106 anti-join idiom
    * (LEFT ANTI on the FK), and the cross-table ordering rule is one
    * equi-join pass — so the battery costs two lineitem scans + one
    * orders broadcast at any corpus size, not |rules| scans. All
    * counts exact int64; the rate is one division rounded to 12.
    */
  private val q281 = QueryDef(
    "q281_expectations_audit",
    (s, dir) => {
      val li = Fixtures.table(s, dir, "lineitem")
      val ord = Fixtures.table(s, dir, "orders")
      def viol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        sum(when(c, 1L).otherwise(0L))
      val single = li.agg(
        count(lit(1)).as("n"),
        viol(!(col("l_quantity") >= 1.0 && col("l_quantity") <= 50.0))
          .as("v1"),
        viol(!(col("l_discount") >= 0.0 && col("l_discount") <= 0.10))
          .as("v2"),
        viol(!col("l_returnflag").isin("A", "N", "R")).as("v3"),
        viol(!col("l_linestatus").isin("O", "F")).as("v4"),
        viol(!(col("l_extendedprice") > 0.0)).as("v5"),
        viol(!(col("l_tax") >= 0.0 && col("l_tax") <= 0.08)).as("v6"))
        .selectExpr("""stack(6,
          'quantity_in_1_50',   n, v1,
          'discount_in_0_010',  n, v2,
          'returnflag_domain',  n, v3,
          'linestatus_domain',  n, v4,
          'extendedprice_pos',  n, v5,
          'tax_in_0_008',       n, v6) AS (rule, n_checked, n_viol)""")
      val orphan = li.select(col("l_orderkey"))
        .join(ord.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left")
        .agg(count(lit(1)).as("n_checked"),
          sum(when(col("o_orderkey").isNull, 1L).otherwise(0L))
            .as("n_viol"))
        .select(lit("lineitem_has_order").as("rule"), col("n_checked"),
          col("n_viol"))
      val shipAfter = li.select(col("l_orderkey"), col("l_shipdate"))
        .join(ord.select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n_checked"),
          sum(when(col("l_shipdate") < col("o_orderdate"), 1L)
            .otherwise(0L)).as("n_viol"))
        .select(lit("ship_after_order").as("rule"), col("n_checked"),
          col("n_viol"))
      single.unionAll(orphan).unionAll(shipAfter)
        .select(col("rule"), col("n_checked"), col("n_viol"),
          round(col("n_viol").cast("double")
            / col("n_checked").cast("double"), 12).as("viol_rate"))
        .orderBy("rule")
    },
    Some("""WITH single AS (
        SELECT count(*)::BIGINT AS n,
          sum(CASE WHEN NOT (l_quantity >= 1.0 AND l_quantity <= 50.0)
            THEN 1 ELSE 0 END)::BIGINT AS v1,
          sum(CASE WHEN NOT (l_discount >= 0.0 AND l_discount <= 0.10)
            THEN 1 ELSE 0 END)::BIGINT AS v2,
          sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
            THEN 1 ELSE 0 END)::BIGINT AS v3,
          sum(CASE WHEN l_linestatus NOT IN ('O', 'F')
            THEN 1 ELSE 0 END)::BIGINT AS v4,
          sum(CASE WHEN NOT (l_extendedprice > 0.0)
            THEN 1 ELSE 0 END)::BIGINT AS v5,
          sum(CASE WHEN NOT (l_tax >= 0.0 AND l_tax <= 0.08)
            THEN 1 ELSE 0 END)::BIGINT AS v6
        FROM lineitem),
      rules AS (
        SELECT 'quantity_in_1_50' AS rule, n AS n_checked, v1 AS n_viol
          FROM single
        UNION ALL SELECT 'discount_in_0_010', n, v2 FROM single
        UNION ALL SELECT 'returnflag_domain', n, v3 FROM single
        UNION ALL SELECT 'linestatus_domain', n, v4 FROM single
        UNION ALL SELECT 'extendedprice_pos', n, v5 FROM single
        UNION ALL SELECT 'tax_in_0_008', n, v6 FROM single
        UNION ALL SELECT 'lineitem_has_order', count(*)::BIGINT,
            sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT
          FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
        UNION ALL SELECT 'ship_after_order', count(*)::BIGINT,
            sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0
              END)::BIGINT
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      SELECT rule, n_checked, n_viol,
        round(n_viol::DOUBLE / n_checked::DOUBLE, 12) AS viol_rate
      FROM rules ORDER BY rule"""))

  // ---------- q284: decision-stump split search ------------------------

  /** The depth-1 CART fit — per feature, the threshold that maximizes
    * Gini impurity reduction on the return outcome — which is both the
    * first boosting iteration and the standard "is this feature worth
    * anything" screen a feature platform runs before training. The
    * distributed shape is what matters at 100 TB: the fact table folds
    * in ONE pass into (feature × bounded-bin) cells (a stack unpivot
    * feeding map-side partial aggregation — never one scan per
    * feature), every candidate threshold's left/right counts then come
    * from prefix sums over that ≤4×51-row table, and the per-feature
    * argmax tie-breaks on the bin. Counts are exact int64; the Gini
    * expressions are the identical IEEE tree over those ints on both
    * engines, so the argmax is deterministic.
    */
  private val q284 = QueryDef(
    "q284_decision_stump",
    (s, dir) => {
      val wf = org.apache.spark.sql.expressions.Window
        .partitionBy(col("feature")).orderBy(col("bin"))
      val wt = org.apache.spark.sql.expressions.Window
        .partitionBy(col("feature"))
      val cells = Fixtures.table(s, dir, "lineitem")
        .select(
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"),
          col("l_quantity").cast("long").as("qbin"),
          round(col("l_discount") * 100).cast("long").as("dbin"),
          round(col("l_tax") * 100).cast("long").as("tbin"),
          least(expr("cast(floor(l_extendedprice) AS BIGINT) div 10000"),
            lit(9L)).as("pbin"))
        .selectExpr("y", """stack(4,
          'quantity',  qbin,
          'discount',  dbin,
          'tax',       tbin,
          'price_10k', pbin) AS (feature, bin)""")
        .groupBy(col("feature"), col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      val gains = cells
        .withColumn("nl", sum(col("n")).over(wf))
        .withColumn("posl", sum(col("pos")).over(wf))
        .withColumn("ntot", sum(col("n")).over(wt))
        .withColumn("postot", sum(col("pos")).over(wt))
        .where(col("ntot") > col("nl"))
        .selectExpr("feature", "bin", "nl", "ntot - nl AS nr",
          """1.0 - (CAST(postot AS DOUBLE) * CAST(postot AS DOUBLE)
              + CAST(ntot - postot AS DOUBLE)
                * CAST(ntot - postot AS DOUBLE))
              / (CAST(ntot AS DOUBLE) * CAST(ntot AS DOUBLE))
            - (CAST(nl AS DOUBLE) * (1.0
                - (CAST(posl AS DOUBLE) * CAST(posl AS DOUBLE)
                  + CAST(nl - posl AS DOUBLE) * CAST(nl - posl AS DOUBLE))
                / (CAST(nl AS DOUBLE) * CAST(nl AS DOUBLE)))
              + CAST(ntot - nl AS DOUBLE) * (1.0
                - (CAST(postot - posl AS DOUBLE)
                    * CAST(postot - posl AS DOUBLE)
                  + CAST((ntot - nl) - (postot - posl) AS DOUBLE)
                    * CAST((ntot - nl) - (postot - posl) AS DOUBLE))
                / (CAST(ntot - nl AS DOUBLE)
                  * CAST(ntot - nl AS DOUBLE))))
              / CAST(ntot AS DOUBLE) AS gain""")
      val wr = org.apache.spark.sql.expressions.Window
        .partitionBy(col("feature"))
        .orderBy(col("gain").desc, col("bin"))
      gains.withColumn("rk", row_number().over(wr))
        .where(col("rk") === 1)
        .select(col("feature"), col("bin").as("split_bin"),
          col("nl").as("n_left"), col("nr").as("n_right"),
          round(col("gain"), 12).as("gini_gain"))
        .orderBy("feature")
    },
    Some("""WITH cells AS (SELECT feature, bin, count(*)::BIGINT AS n,
          sum(y)::BIGINT AS pos
        FROM (SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
            unnest(['quantity', 'discount', 'tax', 'price_10k'])
              AS feature,
            unnest([l_quantity::BIGINT,
              round(l_discount * 100)::BIGINT,
              round(l_tax * 100)::BIGINT,
              least(floor(l_extendedprice)::BIGINT // 10000, 9)]) AS bin
          FROM lineitem)
        GROUP BY 1, 2),
      gains AS (SELECT feature, bin, nl, ntot - nl AS nr,
          1.0 - (postot::DOUBLE * postot::DOUBLE
              + (ntot - postot)::DOUBLE * (ntot - postot)::DOUBLE)
              / (ntot::DOUBLE * ntot::DOUBLE)
            - (nl::DOUBLE * (1.0
                - (posl::DOUBLE * posl::DOUBLE
                  + (nl - posl)::DOUBLE * (nl - posl)::DOUBLE)
                / (nl::DOUBLE * nl::DOUBLE))
              + (ntot - nl)::DOUBLE * (1.0
                - ((postot - posl)::DOUBLE * (postot - posl)::DOUBLE
                  + ((ntot - nl) - (postot - posl))::DOUBLE
                    * ((ntot - nl) - (postot - posl))::DOUBLE)
                / ((ntot - nl)::DOUBLE * (ntot - nl)::DOUBLE)))
              / ntot::DOUBLE AS gain
        FROM (SELECT feature, bin,
            sum(n) OVER (PARTITION BY feature ORDER BY bin)::BIGINT AS nl,
            sum(pos) OVER (PARTITION BY feature ORDER BY bin)::BIGINT
              AS posl,
            sum(n) OVER (PARTITION BY feature)::BIGINT AS ntot,
            sum(pos) OVER (PARTITION BY feature)::BIGINT AS postot
          FROM cells)
        WHERE ntot > nl)
      SELECT feature, bin AS split_bin, nl AS n_left, nr AS n_right,
        round(gain, 12) AS gini_gain
      FROM (SELECT *, row_number() OVER (PARTITION BY feature
          ORDER BY gain DESC, bin) AS rk FROM gains)
      WHERE rk = 1 ORDER BY feature"""))

  // ---------- q285: Mantel–Haenszel adjusted odds ratio ----------------

  /** The FIX for what q263 detects: when strata (user activity bands)
    * confound an exposure→outcome table, the crude odds ratio lies;
    * Cochran–Mantel–Haenszel pools the per-stratum 2×2 tables into the
    * stratum-adjusted OR_MH = Σₖ(aₖdₖ/nₖ) / Σₖ(bₖcₖ/nₖ) — the
    * epidemiology-standard adjusted effect, here applied to the q255
    * arm assignment (user_id mod 2) → purchase outcome with users
    * stratified by total activity band. Exactness: all 2×2 cells are
    * exact int64 from ONE user-keyed aggregate; each stratum's aₖdₖ/nₖ
    * term is one double division of exact ints pinned to nano, the CMH
    * numerator/denominator are exact integer sums of those, and the
    * final OR is one division. Per-stratum ORs and the crude OR ship
    * beside it so the confounding gap is visible. Shape: one
    * corpus-sized groupBy(user); everything after is |strata| rows.
    */
  private val q285 = QueryDef(
    "q285_mantel_haenszel",
    (s, dir) => {
      val users = Fixtures.table(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_ev"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n_pur"))
        .select(pmod(col("user_id"), lit(2L)).as("exposed"),
          when(col("n_pur") >= 14L, 1L).otherwise(0L).as("outcome"),
          least(greatest(expr("(n_ev - 50) div 10"), lit(0L)), lit(3L))
            .as("stratum"))
      val cells = users.groupBy(col("stratum"))
        .agg(
          sum(when(col("exposed") === 1L && col("outcome") === 1L, 1L)
            .otherwise(0L)).as("a"),
          sum(when(col("exposed") === 1L && col("outcome") === 0L, 1L)
            .otherwise(0L)).as("b"),
          sum(when(col("exposed") === 0L && col("outcome") === 1L, 1L)
            .otherwise(0L)).as("c"),
          sum(when(col("exposed") === 0L && col("outcome") === 0L, 1L)
            .otherwise(0L)).as("d"))
        .withColumn("nk", col("a") + col("b") + col("c") + col("d"))
      val mh = cells.agg(
        sum(round(col("a").cast("double") * col("d").cast("double")
          / col("nk").cast("double") * lit(1e9)).cast("long"))
          .as("num_nano"),
        sum(round(col("b").cast("double") * col("c").cast("double")
          / col("nk").cast("double") * lit(1e9)).cast("long"))
          .as("den_nano"),
        sum(col("a")).as("ta"), sum(col("b")).as("tb"),
        sum(col("c")).as("tc"), sum(col("d")).as("td"))
        .select(
          round(col("num_nano").cast("double")
            / expr("nullif(CAST(den_nano AS DOUBLE), 0.0)"), 12)
            .as("or_mh"),
          round(col("ta").cast("double") * col("td").cast("double")
            / expr("nullif(CAST(tb AS DOUBLE) * CAST(tc AS DOUBLE), 0.0)"),
            12).as("or_crude"))
      cells.crossJoin(broadcast(mh))
        .select(col("stratum"), col("a"), col("b"), col("c"), col("d"),
          round(col("a").cast("double") * col("d").cast("double")
            / expr("nullif(CAST(b AS DOUBLE) * CAST(c AS DOUBLE), 0.0)"),
            12).as("or_stratum"),
          col("or_mh"), col("or_crude"))
        .orderBy("stratum")
    },
    Some("""WITH users AS (SELECT user_id % 2 AS exposed,
          CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
            END) >= 14 THEN 1 ELSE 0 END AS outcome,
          least(greatest((count(*) - 50) // 10, 0), 3) AS stratum
        FROM events GROUP BY user_id),
      cells AS (SELECT stratum,
          sum(CASE WHEN exposed = 1 AND outcome = 1 THEN 1 ELSE 0
            END)::BIGINT AS a,
          sum(CASE WHEN exposed = 1 AND outcome = 0 THEN 1 ELSE 0
            END)::BIGINT AS b,
          sum(CASE WHEN exposed = 0 AND outcome = 1 THEN 1 ELSE 0
            END)::BIGINT AS c,
          sum(CASE WHEN exposed = 0 AND outcome = 0 THEN 1 ELSE 0
            END)::BIGINT AS d
        FROM users GROUP BY 1),
      ck AS (SELECT *, a + b + c + d AS nk FROM cells),
      mh AS (SELECT
          sum(round(a::DOUBLE * d::DOUBLE / nk::DOUBLE * 1e9)::BIGINT)
            ::BIGINT AS num_nano,
          sum(round(b::DOUBLE * c::DOUBLE / nk::DOUBLE * 1e9)::BIGINT)
            ::BIGINT AS den_nano,
          sum(a)::BIGINT AS ta, sum(b)::BIGINT AS tb,
          sum(c)::BIGINT AS tc, sum(d)::BIGINT AS td
        FROM ck)
      SELECT stratum, a, b, c, d,
        round(a::DOUBLE * d::DOUBLE
          / nullif(b::DOUBLE * c::DOUBLE, 0.0), 12) AS or_stratum,
        round(num_nano::DOUBLE / nullif(den_nano::DOUBLE, 0.0), 12)
          AS or_mh,
        round(ta::DOUBLE * td::DOUBLE
          / nullif(tb::DOUBLE * tc::DOUBLE, 0.0), 12) AS or_crude
      FROM ck, mh ORDER BY stratum"""))

  // ---------- q288: out-of-fold target encoding ------------------------

  /** The leakage-SAFE version of q253: a row's own outcome must not
    * leak into the feature that encodes it, so production target
    * encoding is fit out-of-fold — fold f's encoding for a brand uses
    * the OTHER folds' counts, enc_f = ((pos − pos_f) + 50·prior) /
    * ((n − n_f) + 50). One fact pass into (brand × fold) cells is the
    * only corpus-sized work; per-brand totals re-aggregate from the
    * tiny cell table, so the whole fit costs the same single scan as
    * the leaky version. The leak gap (full-fit minus OOF encoding,
    * exact difference of micro-pinned ints) ships per cell — the
    * measured size of the bias q253 silently bakes in. Deterministic
    * fold = l_orderkey mod 5 (hash-free: orderkey is already
    * uniform), prior from the full table (documented convention).
    */
  private val q288 = QueryDef(
    "q288_oof_target_encoding",
    (s, dir) => {
      val cells = Fixtures.table(s, dir, "lineitem")
        .select(col("l_partkey"), pmod(col("l_orderkey"), lit(5L)).as("fold"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("fold"))
        .agg(count(lit(1)).as("nf"), sum(col("y")).as("posf"))
      val byBrand = cells.groupBy(col("p_brand"))
        .agg(sum(col("nf")).as("n"), sum(col("posf")).as("pos"))
      val prior = byBrand.agg(
        (sum(col("pos")).cast("double") / sum(col("n")).cast("double"))
          .as("prior"))
      cells.join(byBrand, "p_brand").crossJoin(broadcast(prior))
        .select(col("p_brand"), col("fold"), col("nf"),
          expr("""CAST(round((CAST(pos - posf AS DOUBLE) + 50.0 * prior)
            / (CAST(n - nf AS DOUBLE) + 50.0) * 1e6) AS BIGINT)""")
            .as("enc_oof_micro"),
          (expr("""CAST(round((CAST(pos AS DOUBLE) + 50.0 * prior)
            / (CAST(n AS DOUBLE) + 50.0) * 1e6) AS BIGINT)""")
            - expr("""CAST(round((CAST(pos - posf AS DOUBLE)
              + 50.0 * prior)
            / (CAST(n - nf AS DOUBLE) + 50.0) * 1e6) AS BIGINT)"""))
            .as("leak_gap_micro"))
        .orderBy("p_brand", "fold")
    },
    Some("""WITH cells AS (SELECT p_brand, l_orderkey % 5 AS fold,
          count(*)::BIGINT AS nf,
          sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT
            AS posf
        FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2),
      b AS (SELECT p_brand, sum(nf)::BIGINT AS n,
          sum(posf)::BIGINT AS pos FROM cells GROUP BY 1),
      g AS (SELECT sum(pos)::DOUBLE / sum(n)::DOUBLE AS prior FROM b)
      SELECT p_brand, fold, nf,
        round(((pos - posf)::DOUBLE + 50.0 * prior)
          / ((n - nf)::DOUBLE + 50.0) * 1e6)::BIGINT AS enc_oof_micro,
        round((pos::DOUBLE + 50.0 * prior) / (n::DOUBLE + 50.0)
            * 1e6)::BIGINT
          - round(((pos - posf)::DOUBLE + 50.0 * prior)
            / ((n - nf)::DOUBLE + 50.0) * 1e6)::BIGINT
          AS leak_gap_micro
      FROM cells JOIN b USING (p_brand), g
      ORDER BY p_brand, fold"""))

  // ---------- q289: pinball-loss evaluation of a quantile predictor ----

  /** Closes the loop q135 opens: the per-priority P90 ship-delay
    * "predictor" is only as good as its measured quantile loss, and
    * pinball (check) loss at τ = 0.9 is the proper scoring rule for a
    * quantile — under-prediction costs 9×, so the minimizer IS the
    * true P90. Both the predictor AND its evaluation run off the same
    * (priority × delay-day) HISTOGRAM (the q135 bounded-domain trick):
    * P90 is the smallest delay whose cumulative count reaches ⌈0.9n⌉,
    * and the loss sum Σ c·max(9·(d−ŷ), ŷ−d) is an EXACT integer in
    * tenth-day units computed from the same histogram cells — the
    * corpus is scanned once, and nothing downstream exceeds
    * |priorities|×|delays| rows. One division per priority at the end.
    */
  private val q289 = QueryDef(
    "q289_pinball_eval",
    (s, dir) => {
      val hist = Fixtures.table(s, dir, "lineitem")
        .select(col("l_orderkey"),
          expr("""timestampdiff(MICROSECOND,
            TIMESTAMP_NTZ '1970-01-01 00:00:00', l_shipdate)""")
            .as("ship_us"))
        .join(Fixtures.table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            expr("""timestampdiff(MICROSECOND,
              TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate)""")
              .as("ord_us")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          expr("(ship_us - ord_us) div 86400000000").as("d"))
        .groupBy(col("o_orderpriority"), col("d"))
        .agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderpriority"))
      val cum = hist
        .withColumn("n", sum(col("c")).over(w))
        .withColumn("cum", sum(col("c")).over(w.orderBy(col("d"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, org.apache.spark.sql.expressions.Window
            .currentRow)))
      val p90 = cum
        .groupBy(col("o_orderpriority").as("prio"), col("n"))
        .agg(min(when(col("cum") >= ceil(col("n") * lit(0.9)), col("d")))
          .as("yhat"))
      hist.join(p90, col("o_orderpriority") === col("prio"))
        .groupBy(col("o_orderpriority"), col("n"), col("yhat"))
        .agg(sum(col("c") * greatest(lit(9L) * (col("d") - col("yhat")),
          col("yhat") - col("d"))).as("loss_tenths"))
        .select(col("o_orderpriority"), col("n").as("n_items"),
          col("yhat").as("p90_days"), col("loss_tenths"),
          round(col("loss_tenths").cast("double") / lit(10.0)
            / col("n").cast("double"), 12).as("mean_pinball"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH h AS (SELECT o_orderpriority,
          (epoch_us(l_shipdate) - epoch_us(o_orderdate)) // 86400000000
            AS d, count(*)::BIGINT AS c
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        GROUP BY 1, 2),
      cum AS (SELECT o_orderpriority, d, c,
          sum(c) OVER (PARTITION BY o_orderpriority)::BIGINT AS n,
          sum(c) OVER (PARTITION BY o_orderpriority ORDER BY d)::BIGINT
            AS cum
        FROM h),
      p90 AS (SELECT o_orderpriority, n,
          min(CASE WHEN cum >= ceil(n * 0.9) THEN d END)::BIGINT AS yhat
        FROM cum GROUP BY 1, 2)
      SELECT h.o_orderpriority, n AS n_items, yhat AS p90_days,
        sum(c * greatest(9 * (d - yhat), yhat - d))::BIGINT
          AS loss_tenths,
        round(sum(c * greatest(9 * (d - yhat), yhat - d))::DOUBLE / 10.0
          / n::DOUBLE, 12) AS mean_pinball
      FROM h JOIN p90 USING (o_orderpriority)
      GROUP BY 1, 2, 3 ORDER BY o_orderpriority"""))

  // ---------- q291: directed association rules -------------------------

  /** The rule-mining deliverable q158's symmetric lift table stops
    * short of: DIRECTED rules A→B with the four standard measures —
    * confidence n_AB/n_A (the recommender's conditional), lift,
    * leverage (observed-minus-expected support) and conviction
    * ((1−supp_B)/(1−conf), the implication-strength odds) — filtered
    * by minimum support and ranked by confidence. Each undirected
    * co-purchase pair fans into exactly two candidate rules (a ×2 map
    * on the cached pair table — zero new corpus passes; baskets,
    * pairs and part counts all come from the PlanCache). Measures are
    * single divisions of exact int64 counts in identical textual
    * order; conviction NULLIF-guards confidence = 1. TakeOrdered
    * top-30, tie-broken on (antecedent, consequent).
    */
  private val q291 = QueryDef(
    "q291_association_rules",
    (s, dir) => {
      val baskets = copurchaseBaskets(s, dir)
      val pairs = copurchasePairs(s, dir)
      val pc = baskets.select(explode(col("parts")).as("pk"))
        .groupBy(col("pk")).agg(count(lit(1)).as("n"))
      val tot = baskets.agg(count(lit(1)).as("n_ord"))
      val directed = pairs.select(col("part_a").as("ante"),
          col("part_b").as("cons"), col("n_orders").as("n_both"))
        .unionAll(pairs.select(col("part_b").as("ante"),
          col("part_a").as("cons"), col("n_orders").as("n_both")))
      directed
        .where(col("n_both") >= 3L)
        .join(broadcast(pc.select(col("pk").as("ante"),
          col("n").as("n_a"))), "ante")
        .join(broadcast(pc.select(col("pk").as("cons"),
          col("n").as("n_c"))), "cons")
        .crossJoin(broadcast(tot))
        .selectExpr("ante", "cons", "n_both", "n_a", "n_c",
          """round(CAST(n_both AS DOUBLE) / CAST(n_a AS DOUBLE), 12)
            AS confidence""",
          """round(CAST(n_both AS DOUBLE) * CAST(n_ord AS DOUBLE)
            / (CAST(n_a AS DOUBLE) * CAST(n_c AS DOUBLE)), 12) AS lift""",
          """round(CAST(n_both AS DOUBLE) / CAST(n_ord AS DOUBLE)
            - (CAST(n_a AS DOUBLE) / CAST(n_ord AS DOUBLE))
              * (CAST(n_c AS DOUBLE) / CAST(n_ord AS DOUBLE)), 12)
            AS leverage""",
          """round((1.0 - CAST(n_c AS DOUBLE) / CAST(n_ord AS DOUBLE))
            / nullif(1.0 - CAST(n_both AS DOUBLE) / CAST(n_a AS DOUBLE),
              0.0), 12) AS conviction""")
        .orderBy(col("confidence").desc, col("ante"), col("cons"))
        .limit(30)
    },
    Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
          FROM lineitem),
      pc AS (SELECT l_partkey, count(*)::BIGINT AS n FROM li
        GROUP BY 1),
      tot AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS n_ord
        FROM lineitem),
      pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
          count(*)::BIGINT AS n_both
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
          AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2),
      directed AS (
        SELECT part_a AS ante, part_b AS cons, n_both FROM pr
        UNION ALL
        SELECT part_b AS ante, part_a AS cons, n_both FROM pr)
      SELECT ante, cons, n_both, pa.n AS n_a, pb.n AS n_c,
        round(n_both::DOUBLE / pa.n::DOUBLE, 12) AS confidence,
        round(n_both::DOUBLE * n_ord::DOUBLE
          / (pa.n::DOUBLE * pb.n::DOUBLE), 12) AS lift,
        round(n_both::DOUBLE / n_ord::DOUBLE
          - (pa.n::DOUBLE / n_ord::DOUBLE)
            * (pb.n::DOUBLE / n_ord::DOUBLE), 12) AS leverage,
        round((1.0 - pb.n::DOUBLE / n_ord::DOUBLE)
          / nullif(1.0 - n_both::DOUBLE / pa.n::DOUBLE, 0.0), 12)
          AS conviction
      FROM directed
      JOIN pc pa ON pa.l_partkey = ante
      JOIN pc pb ON pb.l_partkey = cons
      CROSS JOIN tot
      WHERE n_both >= 3
      ORDER BY confidence DESC, ante, cons LIMIT 30"""))

  // ---------- q292: Benjamini–Hochberg FDR over per-brand tests --------

  /** Which brands have a return rate GENUINELY different from the
    * corpus, after multiple-testing correction? 25 simultaneous
    * one-sample z-tests at α = 0.05 would expect ~1.25 false alarms;
    * Benjamini–Hochberg controls the false-discovery rate instead:
    * sort p-values, find the largest i with p₍ᵢ₎ ≤ i·α/m, reject
    * everything at or below it. Neither engine ships a normal CDF, so
    * the p-value runs through [[graft.ops.Portable.normCdfUpper]] —
    * the A&S 26.2.17 polynomial as ONE dialect-free expression text,
    * bit-identical on both engines (the portability contract is the
    * polynomial itself). Shape: one fact pass into |brands| cells;
    * the sort, rank and step-up scan are windows over 25 rows.
    */
  private val q292 = QueryDef(
    "q292_bh_fdr",
    (s, dir) => {
      val cells = Fixtures.table(s, dir, "lineitem")
        .select(col("l_partkey"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_b"), sum(col("y")).as("pos_b"))
      val glob = cells.agg(sum(col("n_b")).as("n"),
        sum(col("pos_b")).as("pos"))
      val scored = cells.crossJoin(broadcast(glob))
        .selectExpr("p_brand", "n_b", "pos_b",
          """(CAST(pos_b AS DOUBLE) / CAST(n_b AS DOUBLE)
             - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
            / sqrt((CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
              * (1.0 - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
              / CAST(n_b AS DOUBLE)) AS z""")
        .selectExpr("p_brand", "n_b", "pos_b", "z",
          s"2.0 * ${graft.ops.Portable.normCdfUpper("abs(z)")} AS p")
      val m = 25
      val wRank = org.apache.spark.sql.expressions.Window
        .orderBy(col("p"), col("p_brand"))
      val wAll = org.apache.spark.sql.expressions.Window
        .orderBy(col("p"), col("p_brand"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .unboundedFollowing)
      scored
        .withColumn("i", row_number().over(wRank).cast("long"))
        .withColumn("thr", col("i").cast("double") * lit(0.05) / lit(m))
        .withColumn("kmax", max(when(col("p") <= col("thr"), col("i")))
          .over(wAll))
        .select(col("p_brand"), col("n_b"), col("pos_b"),
          round(col("z"), 12).as("z"), round(col("p"), 12).as("p_value"),
          col("i").as("p_rank"),
          round(col("thr"), 12).as("bh_threshold"),
          (col("i") <= coalesce(col("kmax"), lit(0L))).as("rejected"))
        .orderBy("p_rank")
    },
    Some(s"""WITH cells AS (SELECT p_brand, count(*)::BIGINT AS n_b,
          sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT
            AS pos_b
        FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
      g AS (SELECT sum(n_b)::BIGINT AS n, sum(pos_b)::BIGINT AS pos
        FROM cells),
      scored AS (SELECT p_brand, n_b, pos_b,
          (pos_b::DOUBLE / n_b::DOUBLE - pos::DOUBLE / n::DOUBLE)
            / sqrt((pos::DOUBLE / n::DOUBLE)
              * (1.0 - pos::DOUBLE / n::DOUBLE) / n_b::DOUBLE) AS z
        FROM cells, g),
      pv AS (SELECT *,
          2.0 * ${graft.ops.Portable.normCdfUpper("abs(z)")} AS p
        FROM scored),
      ranked AS (SELECT *,
          row_number() OVER (ORDER BY p, p_brand) AS i FROM pv),
      thr AS (SELECT *, i::DOUBLE * 0.05 / 25 AS thr FROM ranked),
      k AS (SELECT max(CASE WHEN p <= thr THEN i END) AS kmax FROM thr)
      SELECT p_brand, n_b, pos_b, round(z, 12) AS z,
        round(p, 12) AS p_value, i::BIGINT AS p_rank,
        round(thr, 12) AS bh_threshold,
        i <= coalesce(kmax, 0) AS rejected
      FROM thr, k ORDER BY p_rank"""))

  // ---------- q293: Brier-score (Murphy) decomposition -----------------

  /** The third calibration lens beside q272's ECE and q277's isotonic
    * repair: Murphy's decomposition Brier = REL − RES + UNC splits the
    * quadratic score of the q253 brand encoding into reliability (how
    * far predicted probabilities sit from realized rates — what
    * calibration can fix), resolution (how much the bins separate
    * outcomes — what only a better MODEL can improve) and the
    * outcome's inherent uncertainty. Per-bin and base rates come from
    * the same q272 bin cells; every squared-gap term pins to integer
    * nano-units BEFORE the N-weighted total (exact DECIMAL-lifted
    * integer sums), so all three components and their recombination
    * are bit-stable. Shape: one fact pass into ≤50 bins, constant
    * work after.
    */
  private val q293 = QueryDef(
    "q293_brier_decomposition",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val byBrand = Fixtures.table(s, dir, "lineitem")
        .select(col("l_partkey"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
      val prior = byBrand.agg(
        (sum(col("n_pos")).cast("double") / sum(col("n")).cast("double"))
          .as("prior"))
      val enc = byBrand.crossJoin(broadcast(prior))
        .select(col("p_brand"),
          expr("""CAST(round((CAST(n_pos AS DOUBLE) + 50.0 * prior)
            / (CAST(n AS DOUBLE) + 50.0) * 1e6) AS BIGINT)""")
            .as("conf_micro"))
      val binned = Fixtures.table(s, dir, "lineitem")
        .select(col("l_partkey"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(enc), Seq("p_brand"))
        .select(col("y"), col("conf_micro"),
          least(expr("conf_micro div 20000"), lit(49L)).as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum(col("conf_micro").cast("decimal(38,0)")).as("sconf"))
      val base = binned.agg((sum(col("sy")).cast("double")
        / sum(col("n")).cast("double")).as("base"),
        sum(col("n")).as("ntot"))
      binned.crossJoin(broadcast(base))
        .selectExpr("n", "ntot", "base",
          """CAST(round(power(CAST(sconf AS DOUBLE) / 1e6
              / CAST(n AS DOUBLE)
            - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 2) * 1e9)
            AS BIGINT) AS rel_nano""",
          """CAST(round(power(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
            - base, 2) * 1e9) AS BIGINT) AS res_nano""")
        .groupBy(col("ntot"), col("base"))
        .agg(count(lit(1)).as("n_bins"),
          sum((col("n") * col("rel_nano"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .as("srel"),
          sum((col("n") * col("res_nano"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .as("sres"))
        .selectExpr("n_bins",
          """round(CAST(srel AS DOUBLE) / CAST(ntot AS DOUBLE) / 1e9, 12)
            AS reliability""",
          """round(CAST(sres AS DOUBLE) / CAST(ntot AS DOUBLE) / 1e9, 12)
            AS resolution""",
          "round(base * (1.0 - base), 12) AS uncertainty",
          """round(CAST(srel AS DOUBLE) / CAST(ntot AS DOUBLE) / 1e9
            - CAST(sres AS DOUBLE) / CAST(ntot AS DOUBLE) / 1e9
            + base * (1.0 - base), 12) AS brier""")
    },
    Some("""WITH b AS (SELECT p_brand, count(*)::BIGINT AS n,
          sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT
            AS n_pos
        FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
      g AS (SELECT sum(n_pos)::DOUBLE / sum(n)::DOUBLE AS prior FROM b),
      enc AS (SELECT p_brand,
          round((n_pos::DOUBLE + 50.0 * prior) / (n::DOUBLE + 50.0)
            * 1e6)::BIGINT AS conf_micro
        FROM b, g),
      binned AS (SELECT bin, count(*)::BIGINT AS n,
          sum(y)::BIGINT AS sy, sum(conf_micro) AS sconf
        FROM (SELECT least(conf_micro // 20000, 49) AS bin,
            CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
            conf_micro
          FROM lineitem JOIN part ON l_partkey = p_partkey
          JOIN enc USING (p_brand))
        GROUP BY 1),
      base AS (SELECT sum(sy)::DOUBLE / sum(n)::DOUBLE AS base,
          sum(n)::BIGINT AS ntot FROM binned),
      terms AS (SELECT n, ntot, base,
          round(power(sconf::DOUBLE / 1e6 / n::DOUBLE
            - sy::DOUBLE / n::DOUBLE, 2) * 1e9)::BIGINT AS rel_nano,
          round(power(sy::DOUBLE / n::DOUBLE - base, 2)
            * 1e9)::BIGINT AS res_nano
        FROM binned, base)
      SELECT count(*)::BIGINT AS n_bins,
        round(sum(n::HUGEINT * rel_nano)::DOUBLE / ntot::DOUBLE / 1e9,
          12) AS reliability,
        round(sum(n::HUGEINT * res_nano)::DOUBLE / ntot::DOUBLE / 1e9,
          12) AS resolution,
        round(base * (1.0 - base), 12) AS uncertainty,
        round(sum(n::HUGEINT * rel_nano)::DOUBLE / ntot::DOUBLE / 1e9
          - sum(n::HUGEINT * res_nano)::DOUBLE / ntot::DOUBLE / 1e9
          + base * (1.0 - base), 12) AS brier
      FROM terms GROUP BY ntot, base"""))

  // ---------- q294: Adamic–Adar link prediction ------------------------

  /** Adamic–Adar link prediction over the co-purchase graph: for every
    * part pair NOT directly co-purchased, score the likelihood of a
    * future association as Σ_w 1/ln(deg(w)) over common neighbors w —
    * the classic common-neighbor weight that discounts promiscuous
    * hubs (Adamic & Adar 2003). Scale shape: the candidate generator
    * is a self-join of the adjacency list on the CENTER node, so the
    * blow-up is Σ_w C(deg(w),2) — quadratic in hub degree — and is
    * bounded the q48 way with an explicit df-cap: centers with more
    * than 64 distinct partners are excluded from evidence (stated in
    * both dialects, so the cap is semantics, not an engine accident).
    * Per-center fan-out ≤ C(64,2); everything is an equi-join that
    * hash-partitions on the center key, never a cartesian. Each
    * 1/ln(deg) term pins to integer pico-units before the sum, so the
    * score, its total order, and the LIMIT cutoff are bit-stable
    * across engines; the direct-edge exclusion is one LEFT ANTI join
    * against the observed pair list.
    */
  private val q294 = QueryDef(
    "q294_adamic_adar",
    (s, dir) => {
      val pairs = copurchasePairs(s, dir)
        .select(col("part_a"), col("part_b"))
      val adjW = copurchaseAdjDeg(s, dir)
        .where(col("deg") >= 2 && col("deg") <= 64)
        .select(col("node"), col("nbr"),
          expr("CAST(round(1e12 / ln(CAST(deg AS DOUBLE))) AS BIGINT)")
            .as("w_pico"))
      val a = adjW.select(col("node"), col("nbr").as("cand_a"),
        col("w_pico"))
      val b = adjW.select(col("node"), col("nbr").as("cand_b"))
      val scored = a.join(b, Seq("node"))
        .where(col("cand_a") < col("cand_b"))
        .groupBy(col("cand_a"), col("cand_b"))
        .agg(count(lit(1)).as("n_common"), sum(col("w_pico")).as("aa_pico"))
      scored
        .join(pairs, scored("cand_a") === pairs("part_a")
          && scored("cand_b") === pairs("part_b"), "left_anti")
        .select(col("cand_a").as("part_a"), col("cand_b").as("part_b"),
          col("n_common"), col("aa_pico"),
          round(col("aa_pico").cast("double") / 1e12, 12).as("aa_score"))
        .orderBy(col("aa_pico").desc, col("part_a"), col("part_b"))
        .limit(40)
        .drop("aa_pico")
    },
    Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
          AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2),
      adj AS (SELECT part_a AS node, part_b AS nbr FROM pr
        UNION ALL SELECT part_b, part_a FROM pr),
      deg AS (SELECT node, count(*)::BIGINT AS deg FROM adj GROUP BY 1),
      adjw AS (SELECT a.node, a.nbr,
          round(1e12 / ln(deg::DOUBLE))::BIGINT AS w_pico
        FROM adj a JOIN deg d ON a.node = d.node
        WHERE deg BETWEEN 2 AND 64),
      cand AS (SELECT a.nbr AS cand_a, b.nbr AS cand_b,
          count(*)::BIGINT AS n_common, sum(a.w_pico)::BIGINT AS aa_pico
        FROM adjw a JOIN adjw b ON a.node = b.node AND a.nbr < b.nbr
        GROUP BY 1, 2)
      SELECT cand_a AS part_a, cand_b AS part_b, n_common,
        round(aa_pico::DOUBLE / 1e12, 12) AS aa_score
      FROM cand c
      WHERE NOT EXISTS (SELECT 1 FROM pr
        WHERE part_a = c.cand_a AND part_b = c.cand_b)
      ORDER BY aa_pico DESC, part_a, part_b LIMIT 40"""))

  // ---------- q295: binned Kendall tau-b --------------------------------

  /** Kendall's τ-b between customer account balance and realized spend,
    * computed the way a rank correlation CAN be computed at corpus
    * scale: exact pair counting is O(n²) (or an n·log n inversion
    * merge that still needs one total order), so the variables are
    * first discretized onto fixed engine-exact grids — balance into 10
    * equal-width bands, spend into 20 fixed-width bands — and τ-b is
    * then EXACT for the binned variables from the contingency table
    * alone: concordant/discordant/tie pair counts are sums of n_ij ×
    * n_i'j' products over ≤200 occupied cells. Shape: one per-customer
    * aggregate (the only corpus-sized pass), one ≤200-row cell table,
    * and a bounded cell×cell join (the q277 tiny-broadcast class);
    * every pair count is exact int64, the final τ is one sqrt.
    */
  private val q295 = QueryDef(
    "q295_kendall_binned",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val spend = Fixtures.table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 6)))
          .cast("double").as("spend"))
      val cells = Fixtures.table(s, dir, "customer")
        .join(spend, col("c_custkey") === col("o_custkey"))
        .select(
          least(greatest(expr(
            "CAST(floor((c_acctbal + 1000.0) / 1100.0) AS BIGINT)"),
            lit(0L)), lit(9L)).as("bx"),
          least(greatest(expr(
            "CAST(floor(spend / 350000.0) AS BIGINT)"),
            lit(0L)), lit(19L)).as("by"))
        .groupBy(col("bx"), col("by")).agg(count(lit(1)).as("nij"))
      val a = cells.select(col("bx").as("ax"), col("by").as("ay"),
        col("nij").as("na"))
      val b = cells.select(col("bx").as("cx"), col("by").as("cy"),
        col("nij").as("nb"))
      val nTot = cells.agg(sum(col("nij")).as("n"))
      val cross = a.join(broadcast(b), lit(true))
      val counts = cross.agg(
        sum(when(col("cx") > col("ax") && col("cy") > col("ay"),
          col("na") * col("nb")).otherwise(0L)).as("concordant"),
        sum(when(col("cx") > col("ax") && col("cy") < col("ay"),
          col("na") * col("nb")).otherwise(0L)).as("discordant"),
        sum(when(col("cx") === col("ax") && col("cy") === col("ay"),
          expr("na * (nb - 1) div 2")).otherwise(0L)).as("same_cell"),
        sum(when(col("cx") === col("ax") && col("cy") > col("ay"),
          col("na") * col("nb")).otherwise(0L)).as("tx_only"),
        sum(when(col("cy") === col("ay") && col("cx") > col("ax"),
          col("na") * col("nb")).otherwise(0L)).as("ty_only"))
      counts.crossJoin(broadcast(nTot))
        .select(col("n"), col("concordant"), col("discordant"),
          (col("same_cell") + col("tx_only")).as("ties_x"),
          (col("same_cell") + col("ty_only")).as("ties_y"),
          round((col("concordant") - col("discordant")).cast("double")
            / sqrt(
              ((expr("n * (n - 1) div 2") - col("same_cell")
                - col("tx_only"))
                * (expr("n * (n - 1) div 2") - col("same_cell")
                  - col("ty_only"))).cast("double")), 12).as("tau_b"))
    },
    Some("""WITH spend AS (SELECT o_custkey,
          sum(CAST(o_totalprice AS DECIMAL(18,6)))::DOUBLE AS spend
        FROM orders GROUP BY 1),
      cells AS (SELECT
          least(greatest(floor((c_acctbal + 1000.0) / 1100.0)::BIGINT,
            0), 9) AS bx,
          least(greatest(floor(spend / 350000.0)::BIGINT,
            0), 19) AS by,
          count(*)::BIGINT AS nij
        FROM customer JOIN spend ON c_custkey = o_custkey
        GROUP BY 1, 2),
      tot AS (SELECT sum(nij)::BIGINT AS n FROM cells),
      x AS (SELECT
          sum(CASE WHEN b.bx > a.bx AND b.by > a.by
            THEN a.nij * b.nij ELSE 0 END)::BIGINT AS concordant,
          sum(CASE WHEN b.bx > a.bx AND b.by < a.by
            THEN a.nij * b.nij ELSE 0 END)::BIGINT AS discordant,
          sum(CASE WHEN b.bx = a.bx AND b.by = a.by
            THEN a.nij * (b.nij - 1) // 2 ELSE 0 END)::BIGINT AS same_cell,
          sum(CASE WHEN b.bx = a.bx AND b.by > a.by
            THEN a.nij * b.nij ELSE 0 END)::BIGINT AS tx_only,
          sum(CASE WHEN b.by = a.by AND b.bx > a.bx
            THEN a.nij * b.nij ELSE 0 END)::BIGINT AS ty_only
        FROM cells a CROSS JOIN cells b)
      SELECT n, concordant, discordant,
        (same_cell + tx_only)::BIGINT AS ties_x,
        (same_cell + ty_only)::BIGINT AS ties_y,
        round((concordant - discordant)::DOUBLE
          / sqrt((((n * (n - 1)) // 2 - same_cell - tx_only)
            * ((n * (n - 1)) // 2 - same_cell - ty_only))::DOUBLE),
          12) AS tau_b
      FROM x CROSS JOIN tot"""))

  // ---------- q296: NDCG@10 ranker evaluation ---------------------------

  /** NDCG@10 per brand for the "rank parts by revenue" ranker scored
    * against realized demand (total quantity) as graded relevance —
    * the standard offline ranking-quality gate before a ranker ships.
    * DCG@10 = Σ_{r≤10} rel_r / log2(r+1) under the ranker's order;
    * IDCG@10 is the same sum under the relevance-ideal order; NDCG is
    * their ratio. Shape: one lineitem pass into a per-part aggregate
    * (revenue and demand both DECIMAL-lifted so the two orderings are
    * exact, not float-tie-dependent), then two windows PARTITIONED BY
    * brand — per-group top-10 sorts that hash across executors, never
    * a global collapse — and a ≤10-term DCG sum per brand pinned to
    * integer micro-units before summing so the ratio is bit-stable.
    */
  private val q296 = QueryDef(
    "q296_ndcg_at_10",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val perPart = Fixtures.table(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 6)))
            .as("revenue"),
          sum(col("l_quantity").cast(DecimalType(18, 6))).as("demand"))
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
      val wPred = Window.partitionBy(col("p_brand"))
        .orderBy(col("revenue").desc, col("l_partkey"))
      val wIdeal = Window.partitionBy(col("p_brand"))
        .orderBy(col("demand").desc, col("l_partkey"))
      val ranked = perPart
        .withColumn("r_pred", row_number().over(wPred))
        .withColumn("r_ideal", row_number().over(wIdeal))
      val dcgTerm = (r: String) =>
        sum(when(col(r) <= 10, expr(
          s"""CAST(round(CAST(demand AS DOUBLE)
             / (ln(CAST($r AS DOUBLE) + 1.0) / ln(2.0)) * 1e6)
             AS BIGINT)""")).otherwise(0L))
      ranked.groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          dcgTerm("r_pred").as("dcg_micro"),
          dcgTerm("r_ideal").as("idcg_micro"))
        .select(col("p_brand"), col("n_items"),
          round(col("dcg_micro").cast("double") / 1e6, 6).as("dcg10"),
          round(col("idcg_micro").cast("double") / 1e6, 6).as("idcg10"),
          round(col("dcg_micro").cast("double")
            / col("idcg_micro").cast("double"), 12).as("ndcg10"))
        .orderBy(col("p_brand"))
    },
    Some("""WITH pp AS (SELECT l_partkey,
          sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS revenue,
          sum(CAST(l_quantity AS DECIMAL(18,6))) AS demand
        FROM lineitem GROUP BY 1),
      ranked AS (SELECT p_brand, demand,
          row_number() OVER (PARTITION BY p_brand
            ORDER BY revenue DESC, l_partkey) AS r_pred,
          row_number() OVER (PARTITION BY p_brand
            ORDER BY demand DESC, l_partkey) AS r_ideal
        FROM pp JOIN part ON l_partkey = p_partkey),
      agg AS (SELECT p_brand, count(*)::BIGINT AS n_items,
          sum(CASE WHEN r_pred <= 10 THEN round(demand::DOUBLE
            / (ln(r_pred::DOUBLE + 1.0) / ln(2.0)) * 1e6)::BIGINT
            ELSE 0 END)::BIGINT AS dcg_micro,
          sum(CASE WHEN r_ideal <= 10 THEN round(demand::DOUBLE
            / (ln(r_ideal::DOUBLE + 1.0) / ln(2.0)) * 1e6)::BIGINT
            ELSE 0 END)::BIGINT AS idcg_micro
        FROM ranked GROUP BY 1)
      SELECT p_brand, n_items,
        round(dcg_micro::DOUBLE / 1e6, 6) AS dcg10,
        round(idcg_micro::DOUBLE / 1e6, 6) AS idcg10,
        round(dcg_micro::DOUBLE / idcg_micro::DOUBLE, 12) AS ndcg10
      FROM agg ORDER BY p_brand"""))

  // ---------- q297: weight-of-evidence / information value --------------

  /** Weight-of-evidence and information value — the credit-scoring
    * standard feature screen (Siddiqi 2006) — for two candidate
    * predictors of the return event: part size (5 bands) and line
    * quantity (5 bands). WoE_i = ln((good_i/G)/(bad_i/B)) with a +0.5
    * Laplace guard on both numerators so an empty band is defined, and
    * IV = Σ_i (good_i/G − bad_i/B)·WoE_i grades the whole feature
    * (<0.02 useless, >0.3 strong). Shape: ONE fact pass — the part
    * join is a broadcast dimension, both features come off the same
    * scan via an in-scan stack() unpivot (map-side, no second shuffle)
    * — into a 10-cell aggregate; the per-feature totals and the IV
    * roll-up are windows over the BOUNDED band table partitioned by
    * feature (the q159 tiny-aggregate class). WoE/IV terms pin to
    * integer nano-units before summation for cross-engine stability.
    */
  private val q297 = QueryDef(
    "q297_woe_iv",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val bands = Fixtures.table(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("bad"))
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_size"))),
          col("l_partkey") === col("p_partkey"))
        .select(expr("(p_size - 1) div 10").cast("long").as("size_band"),
          expr("(CAST(l_quantity AS BIGINT) - 1) div 10").as("qty_band"),
          col("bad"))
        .select(expr(
          "stack(2, 'p_size', size_band, 'l_quantity', qty_band)")
          .as(Seq("feature", "band")), col("bad"))
        .groupBy(col("feature"), col("band"))
        .agg(sum(lit(1L) - col("bad")).as("n_good"),
          sum(col("bad")).as("n_bad"))
      val w = Window.partitionBy(col("feature"))
      val woe = bands
        .withColumn("tg", sum(col("n_good")).over(w))
        .withColumn("tb", sum(col("n_bad")).over(w))
        .withColumn("woe_nano", expr(
          """CAST(round(ln(((CAST(n_good AS DOUBLE) + 0.5)
             / CAST(tg AS DOUBLE))
             / ((CAST(n_bad AS DOUBLE) + 0.5) / CAST(tb AS DOUBLE)))
             * 1e9) AS BIGINT)"""))
        .withColumn("iv_term_nano", expr(
          """CAST(round((CAST(n_good AS DOUBLE) / CAST(tg AS DOUBLE)
             - CAST(n_bad AS DOUBLE) / CAST(tb AS DOUBLE))
             * (CAST(woe_nano AS DOUBLE) / 1e9) * 1e9) AS BIGINT)"""))
      woe
        .withColumn("iv_nano", sum(col("iv_term_nano")).over(w))
        .select(col("feature"), col("band"), col("n_good"), col("n_bad"),
          round(col("woe_nano").cast("double") / 1e9, 12).as("woe"),
          round(col("iv_nano").cast("double") / 1e9, 12).as("iv"))
        .orderBy(col("feature"), col("band"))
    },
    Some("""WITH base AS (SELECT (p_size - 1) // 10 AS size_band,
          (CAST(l_quantity AS BIGINT) - 1) // 10 AS qty_band,
          CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS bad
        FROM lineitem JOIN part ON l_partkey = p_partkey),
      unp AS (SELECT 'p_size' AS feature, size_band AS band, bad
          FROM base
        UNION ALL SELECT 'l_quantity', qty_band, bad FROM base),
      cells AS (SELECT feature, band::BIGINT AS band,
          sum(1 - bad)::BIGINT AS n_good, sum(bad)::BIGINT AS n_bad
        FROM unp GROUP BY 1, 2),
      tot AS (SELECT *, sum(n_good) OVER (PARTITION BY feature)::BIGINT
            AS tg,
          sum(n_bad) OVER (PARTITION BY feature)::BIGINT AS tb
        FROM cells),
      terms AS (SELECT *,
          round(ln(((n_good::DOUBLE + 0.5) / tg::DOUBLE)
            / ((n_bad::DOUBLE + 0.5) / tb::DOUBLE)) * 1e9)::BIGINT
            AS woe_nano
        FROM tot),
      iv AS (SELECT *,
          round((n_good::DOUBLE / tg::DOUBLE - n_bad::DOUBLE / tb::DOUBLE)
            * (woe_nano::DOUBLE / 1e9) * 1e9)::BIGINT AS iv_term_nano
        FROM terms)
      SELECT feature, band, n_good, n_bad,
        round(woe_nano::DOUBLE / 1e9, 12) AS woe,
        round(sum(iv_term_nano) OVER (PARTITION BY feature)::DOUBLE / 1e9,
          12) AS iv
      FROM iv ORDER BY feature, band"""))

  // ---------- q301: inclusion-dependency discovery ---------------------

  /** Unary inclusion-dependency discovery — the schema-profiling pass
    * (SPIDER/Binder family) that finds FOREIGN-KEY CANDIDATES by
    * measuring value containment A ⊆ B between declared column pairs:
    * the complement of q106's FK violation audit (which checks a KNOWN
    * key) and q252's FD discovery (intra-table). For each candidate,
    * containment = |distinct(A) ∩ distinct(B)| / |distinct(A)|; a
    * ratio of 1 certifies the inclusion holds. Shape: each side
    * reduces to its DISTINCT value set FIRST (one narrow shuffle per
    * column — at 100 TB the dedup happens before the join, so the
    * join never sees fact-table volume), then one LEFT join per pair
    * on the dedup'd sets; six bounded results union driver-cheap.
    * Four true FKs, one decoy (nationkey ⊄ regionkey) keeps the audit
    * honest.
    */
  private val q301 = QueryDef(
    "q301_inclusion_deps",
    (s, dir) => {
      def side(table: String, c: String): DataFrame =
        Fixtures.table(s, dir, table)
          .select(col(c).cast("long").as("k")).distinct()
      def dep(name: String, ta: String, ca: String, tb: String,
          cb: String): DataFrame =
        side(ta, ca).join(side(tb, cb).withColumn("hit", lit(1)),
            Seq("k"), "left")
          .agg(count(lit(1)).as("n_distinct"),
            sum(coalesce(col("hit"), lit(0))).as("n_contained"))
          .select(lit(name).as("dependency"), col("n_distinct"),
            col("n_contained"),
            round(col("n_contained").cast("double")
              / col("n_distinct").cast("double"), 12).as("containment"),
            (col("n_contained") === col("n_distinct")).as("holds"))
      dep("lineitem.l_orderkey -> orders.o_orderkey",
          "lineitem", "l_orderkey", "orders", "o_orderkey")
        .union(dep("lineitem.l_partkey -> part.p_partkey",
          "lineitem", "l_partkey", "part", "p_partkey"))
        .union(dep("lineitem.l_suppkey -> supplier.s_suppkey",
          "lineitem", "l_suppkey", "supplier", "s_suppkey"))
        .union(dep("orders.o_custkey -> customer.c_custkey",
          "orders", "o_custkey", "customer", "c_custkey"))
        .union(dep("supplier.s_nationkey -> nation.n_nationkey",
          "supplier", "s_nationkey", "nation", "n_nationkey"))
        .union(dep("customer.c_nationkey -> region.r_regionkey",
          "customer", "c_nationkey", "region", "r_regionkey"))
        .orderBy(col("dependency"))
    },
    Some("""WITH
      d1 AS (SELECT 'lineitem.l_orderkey -> orders.o_orderkey' AS dep,
          a.k, b.k AS bk
        FROM (SELECT DISTINCT l_orderkey::BIGINT AS k FROM lineitem) a
        LEFT JOIN (SELECT DISTINCT o_orderkey::BIGINT AS k FROM orders) b
          ON a.k = b.k),
      d2 AS (SELECT 'lineitem.l_partkey -> part.p_partkey', a.k, b.k
        FROM (SELECT DISTINCT l_partkey::BIGINT AS k FROM lineitem) a
        LEFT JOIN (SELECT DISTINCT p_partkey::BIGINT AS k FROM part) b
          ON a.k = b.k),
      d3 AS (SELECT 'lineitem.l_suppkey -> supplier.s_suppkey', a.k, b.k
        FROM (SELECT DISTINCT l_suppkey::BIGINT AS k FROM lineitem) a
        LEFT JOIN (SELECT DISTINCT s_suppkey::BIGINT AS k FROM supplier) b
          ON a.k = b.k),
      d4 AS (SELECT 'orders.o_custkey -> customer.c_custkey', a.k, b.k
        FROM (SELECT DISTINCT o_custkey::BIGINT AS k FROM orders) a
        LEFT JOIN (SELECT DISTINCT c_custkey::BIGINT AS k FROM customer) b
          ON a.k = b.k),
      d5 AS (SELECT 'supplier.s_nationkey -> nation.n_nationkey', a.k, b.k
        FROM (SELECT DISTINCT s_nationkey::BIGINT AS k FROM supplier) a
        LEFT JOIN (SELECT DISTINCT n_nationkey::BIGINT AS k FROM nation) b
          ON a.k = b.k),
      d6 AS (SELECT 'customer.c_nationkey -> region.r_regionkey', a.k, b.k
        FROM (SELECT DISTINCT c_nationkey::BIGINT AS k FROM customer) a
        LEFT JOIN (SELECT DISTINCT r_regionkey::BIGINT AS k FROM region) b
          ON a.k = b.k),
      u AS (SELECT * FROM d1 UNION ALL SELECT * FROM d2
        UNION ALL SELECT * FROM d3 UNION ALL SELECT * FROM d4
        UNION ALL SELECT * FROM d5 UNION ALL SELECT * FROM d6)
      SELECT dep AS dependency, count(*)::BIGINT AS n_distinct,
        count(bk)::BIGINT AS n_contained,
        round(count(bk)::DOUBLE / count(*)::DOUBLE, 12) AS containment,
        count(bk) = count(*) AS holds
      FROM u GROUP BY dep ORDER BY dependency"""))

  // ---------- q302: propensity-stratified ATE --------------------------

  /** Observational causal estimate of "does a deep discount cause
    * returns": treatment = discount ≥ 6 %, outcome = returned, and
    * because discount assignment correlates with brand, the naive
    * treated-minus-control gap is confounded. The estimator is
    * classic propensity STRATIFICATION (Rosenbaum & Rubin 1983,
    * subclassification form): within each brand stratum the
    * treated/control outcome means are compared, and strata average
    * with weights n_s/N — equivalent to IPW with the stratum-exact
    * propensity, and the form that needs NO iterative model fit.
    * Completes the q255 DiD / q256 CUPED causal family. Shape: one
    * fact pass (part is a broadcast dimension) into a |brands|-row
    * conditional aggregate; strata lacking either arm are excluded
    * (reported), per-stratum gaps pin to nano-units weighted by exact
    * int64 n_s, and the final division happens once.
    */
  private val q302 = QueryDef(
    "q302_stratified_ate",
    (s, dir) => {
      val strata = Fixtures.table(s, dir, "lineitem")
        .select(col("l_partkey"),
          when(col("l_discount") >= 0.06, 1L).otherwise(0L).as("t"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(col("t")).as("nt"),
          sum(lit(1L) - col("t")).as("nc"),
          sum(col("t") * col("y")).as("yt"),
          sum((lit(1L) - col("t")) * col("y")).as("yc"))
      val usable = strata.where(col("nt") > 0 && col("nc") > 0)
      usable.agg(
          count(lit(1)).as("n_strata"),
          sum(col("n")).as("n"),
          sum(col("yt")).as("syt"), sum(col("nt")).as("snt"),
          sum(col("yc")).as("syc"), sum(col("nc")).as("snc"),
          sum(col("n") * expr(
            """CAST(round((CAST(yt AS DOUBLE) / nt
               - CAST(yc AS DOUBLE) / nc) * 1e9) AS BIGINT)"""))
            .as("wsum_nano"))
        .select(col("n_strata"), col("n"),
          round(col("syt").cast("double") / col("snt")
            - col("syc").cast("double") / col("snc"), 12)
            .as("naive_diff"),
          round(col("wsum_nano").cast("double") / col("n") / 1e9, 12)
            .as("stratified_ate"))
    },
    Some("""WITH s AS (SELECT p_brand, count(*)::BIGINT AS n,
          sum(t)::BIGINT AS nt, sum(1 - t)::BIGINT AS nc,
          sum(t * y)::BIGINT AS yt, sum((1 - t) * y)::BIGINT AS yc
        FROM (SELECT l_partkey,
            CASE WHEN l_discount >= 0.06 THEN 1 ELSE 0 END AS t,
            CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
          FROM lineitem) li JOIN part ON l_partkey = p_partkey
        GROUP BY 1),
      u AS (SELECT * FROM s WHERE nt > 0 AND nc > 0)
      SELECT count(*)::BIGINT AS n_strata, sum(n)::BIGINT AS n,
        round(sum(yt)::DOUBLE / sum(nt) - sum(yc)::DOUBLE / sum(nc),
          12) AS naive_diff,
        round(sum(n * round((yt::DOUBLE / nt - yc::DOUBLE / nc)
            * 1e9)::BIGINT)::DOUBLE / sum(n) / 1e9, 12)
          AS stratified_ate
      FROM u"""))

  // ---------- q303: label-propagation step -----------------------------

  /** One synchronous label-propagation step (Raghavan 2007) over the
    * co-purchase graph with BRAND as the seed labeling — the
    * semi-supervised community primitive between q49's connected
    * components (pure structure) and q269's modularity (evaluation):
    * each part adopts the majority brand among its co-purchase
    * neighbors (ties → lexicographically smallest), and the emitted
    * old-brand × adopted-label transition matrix shows how much the
    * purchase graph agrees with the catalog taxonomy. Shape: the
    * neighbor-label count is one shuffle keyed on the node (part ids,
    * never baskets); the argmax is a window PARTITIONED by node —
    * per-node label counts are ≤ |brands|, hashed across executors —
    * and the output is a bounded |brands|² matrix. Every count is
    * exact int64; no floats anywhere.
    */
  private val q303 = QueryDef(
    "q303_label_propagation",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val pairs = copurchasePairs(s, dir)
        .select(col("part_a"), col("part_b"))
      val adj = pairs.select(col("part_a").as("node"), col("part_b").as("nbr"))
        .union(pairs.select(col("part_b").as("node"), col("part_a").as("nbr")))
      val brands = Fixtures.table(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))
      val cnt = adj
        .join(broadcast(brands.select(col("p_partkey").as("nbr"),
          col("p_brand").as("nbr_brand"))), Seq("nbr"))
        .groupBy(col("node"), col("nbr_brand"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("node"))
        .orderBy(col("c").desc, col("nbr_brand"))
      val adopted = cnt.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("node"), col("nbr_brand").as("new_label"))
      adopted
        .join(broadcast(brands), col("node") === col("p_partkey"))
        .groupBy(col("p_brand").as("old_brand"), col("new_label"))
        .agg(count(lit(1)).as("n_parts"))
        .orderBy(col("old_brand"), col("new_label"))
    },
    Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
          AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2),
      adj AS (SELECT part_a AS node, part_b AS nbr FROM pr
        UNION ALL SELECT part_b, part_a FROM pr),
      cnt AS (SELECT node, p.p_brand AS nbr_brand, count(*)::BIGINT AS c
        FROM adj JOIN part p ON nbr = p.p_partkey GROUP BY 1, 2),
      win AS (SELECT node, nbr_brand,
          row_number() OVER (PARTITION BY node
            ORDER BY c DESC, nbr_brand) AS rn
        FROM cnt)
      SELECT p.p_brand AS old_brand, w.nbr_brand AS new_label,
        count(*)::BIGINT AS n_parts
      FROM win w JOIN part p ON w.node = p.p_partkey
      WHERE rn = 1
      GROUP BY 1, 2 ORDER BY old_brand, new_label"""))

  // ---------- q304: Horvitz–Thompson estimator audit -------------------

  /** Horvitz–Thompson estimation under deterministic unequal-
    * probability sampling — the survey-sampling workhorse behind every
    * "estimate the full-corpus total from a biased sample" shortcut:
    * orders are sampled at band-dependent rates (small 10 %, medium
    * 50 %, large 100 % — large orders dominate the total, so they are
    * taken with certainty) via the q37 portable-hash coin, and the HT
    * estimator Σ y_i/π_i is compared against the TRUE total the audit
    * can still afford to compute. Inverse weights are the exact
    * integers 10/2/1, revenue sums are DECIMAL-lifted, so estimate,
    * truth, and relative error are all bit-stable. Shape: one orders
    * pass, |bands| output rows plus exact integer arithmetic — the
    * sample membership is a pure hash predicate that pushes into the
    * scan.
    */
  private val q304 = QueryDef(
    "q304_horvitz_thompson",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val banded = Fixtures.table(s, dir, "orders")
        .select(col("o_totalprice"),
          when(col("o_totalprice") < 250000.0, "1_small")
            .when(col("o_totalprice") < 420000.0, "2_medium")
            .otherwise("3_large").as("band"),
          when(col("o_totalprice") < 250000.0, 10L)
            .when(col("o_totalprice") < 420000.0, 2L)
            .otherwise(1L).as("inv_w"),
          (expr(Portable.h32Spark("concat('ht_', o_orderkey)"))
            % 1000).as("coin"))
        .withColumn("sampled",
          when(col("coin") < lit(1000L) / col("inv_w"), 1L).otherwise(0L))
      banded.groupBy(col("band"))
        .agg(count(lit(1)).as("n_pop"),
          sum(col("sampled")).as("n_sampled"),
          round(sum(col("o_totalprice").cast(DecimalType(18, 6)))
            .cast("double"), 2).as("true_total"),
          round(sum(when(col("sampled") === 1,
              col("o_totalprice").cast(DecimalType(18, 6)) * col("inv_w"))
            .otherwise(lit(0).cast(DecimalType(18, 6))))
            .cast("double"), 2).as("ht_total"))
        .select(col("band"), col("n_pop"), col("n_sampled"),
          col("true_total"), col("ht_total"),
          round((col("ht_total") - col("true_total"))
            / col("true_total"), 12).as("rel_err"))
        .orderBy(col("band"))
    },
    Some(s"""WITH banded AS (SELECT o_totalprice,
          CASE WHEN o_totalprice < 250000.0 THEN '1_small'
            WHEN o_totalprice < 420000.0 THEN '2_medium'
            ELSE '3_large' END AS band,
          CASE WHEN o_totalprice < 250000.0 THEN 10
            WHEN o_totalprice < 420000.0 THEN 2 ELSE 1 END AS inv_w,
          ${Portable.h32Duck("'ht_' || o_orderkey")} % 1000 AS coin
        FROM orders),
      f AS (SELECT *, CASE WHEN coin < 1000 / inv_w THEN 1 ELSE 0 END
          AS sampled
        FROM banded),
      agg AS (SELECT band, count(*)::BIGINT AS n_pop,
          sum(sampled)::BIGINT AS n_sampled,
          round(sum(CAST(o_totalprice AS DECIMAL(18,6)))::DOUBLE, 2)
            AS true_total,
          round(sum(CASE WHEN sampled = 1
              THEN CAST(o_totalprice AS DECIMAL(18,6)) * inv_w
              ELSE CAST(0 AS DECIMAL(18,6)) END)::DOUBLE, 2) AS ht_total
        FROM f GROUP BY 1)
      SELECT band, n_pop, n_sampled, true_total, ht_total,
        round((ht_total - true_total) / true_total, 12) AS rel_err
      FROM agg ORDER BY band"""))

  // ---------- q306: MCC / F1 threshold sweep ---------------------------

  /** Confusion-matrix threshold sweep for the q253 brand-rate return
    * scorer: at every distinct score cutoff, the full (TP, FP, FN, TN)
    * plus Matthews correlation and F1 — the operating-point picker
    * that complements q170's threshold-free AUC and q267's decile
    * lift. Because the score is a brand-level encoding it takes at
    * most |brands| distinct values, so after ONE fact pass the sweep
    * table is brand-sized: cumulative TP/FP come from a window over
    * the ≤|score| bounded cutoff table (q159 tiny-aggregate class,
    * never corpus-sized). MCC's numerator stays exact int64; the
    * four-factor denominator product would overflow int64, so it is
    * evaluated in double from exact counts — bit-stable since both
    * engines convert and multiply identically.
    */
  private val q306 = QueryDef(
    "q306_mcc_sweep",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val base = Fixtures.table(s, dir, "lineitem")
        .select(col("l_partkey"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
      val prior = base.agg(
        (sum(col("n_pos")).cast("double") / sum(col("n")).cast("double"))
          .as("prior"))
      val scored = base.crossJoin(broadcast(prior))
        .select(
          expr("""CAST(round((CAST(n_pos AS DOUBLE) + 50.0 * prior)
            / (CAST(n AS DOUBLE) + 50.0) * 1e6) AS BIGINT)""")
            .as("conf_micro"),
          col("n"), col("n_pos"))
        .groupBy(col("conf_micro"))
        .agg(sum(col("n")).as("n"), sum(col("n_pos")).as("pos"))
      val w = Window.orderBy(col("conf_micro").desc)
      val tot = scored.agg(sum(col("n")).as("nn"),
        sum(col("pos")).as("npos"))
      scored
        .withColumn("tp", sum(col("pos")).over(w))
        .withColumn("pp", sum(col("n")).over(w))
        .crossJoin(broadcast(tot))
        .select(col("conf_micro"),
          col("tp"), (col("pp") - col("tp")).as("fp"),
          (col("npos") - col("tp")).as("fn"),
          (col("nn") - col("pp") - col("npos") + col("tp")).as("tn"))
        .select(col("conf_micro"), col("tp"), col("fp"), col("fn"),
          col("tn"),
          // undefined-denominator convention: MCC = 0 when any
          // confusion margin is empty (the all-positive cutoff)
          round(when(col("tp") + col("fp") === 0
              || col("tp") + col("fn") === 0
              || col("tn") + col("fp") === 0
              || col("tn") + col("fn") === 0,
              lit(0.0))
            .otherwise((col("tp") * col("tn") - col("fp") * col("fn"))
              .cast("double")
              / sqrt((col("tp") + col("fp")).cast("double")
                * (col("tp") + col("fn")).cast("double")
                * (col("tn") + col("fp")).cast("double")
                * (col("tn") + col("fn")).cast("double"))), 12)
            .as("mcc"),
          round((lit(2L) * col("tp")).cast("double")
            / (lit(2L) * col("tp") + col("fp") + col("fn"))
              .cast("double"), 12).as("f1"))
        .orderBy(col("conf_micro"))
    },
    Some("""WITH b AS (SELECT p_brand, count(*)::BIGINT AS n,
          sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT
            AS n_pos
        FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
      g AS (SELECT sum(n_pos)::DOUBLE / sum(n)::DOUBLE AS prior FROM b),
      sc AS (SELECT round((n_pos::DOUBLE + 50.0 * prior)
            / (n::DOUBLE + 50.0) * 1e6)::BIGINT AS conf_micro,
          sum(n)::BIGINT AS n, sum(n_pos)::BIGINT AS pos
        FROM b, g GROUP BY 1),
      tot AS (SELECT sum(n)::BIGINT AS nn, sum(pos)::BIGINT AS npos
        FROM sc),
      cum AS (SELECT conf_micro,
          sum(pos) OVER (ORDER BY conf_micro DESC)::BIGINT AS tp,
          sum(n) OVER (ORDER BY conf_micro DESC)::BIGINT AS pp
        FROM sc),
      cm AS (SELECT conf_micro, tp, pp - tp AS fp, npos - tp AS fn,
          nn - pp - npos + tp AS tn
        FROM cum, tot)
      SELECT conf_micro, tp, fp, fn, tn,
        round(CASE WHEN tp + fp = 0 OR tp + fn = 0 OR tn + fp = 0
            OR tn + fn = 0 THEN 0.0
          ELSE (tp * tn - fp * fn)::DOUBLE
            / sqrt((tp + fp)::DOUBLE * (tp + fn)::DOUBLE
              * (tn + fp)::DOUBLE * (tn + fn)::DOUBLE) END, 12) AS mcc,
        round((2 * tp)::DOUBLE / (2 * tp + fp + fn)::DOUBLE, 12) AS f1
      FROM cm ORDER BY conf_micro"""))

  // ---------- q307: Levene's test -------------------------------------

  /** Levene's test for variance homogeneity of order totals across the
    * five order priorities — the assumption gate run BEFORE trusting
    * an ANOVA or pooled t-test (q163): W is the one-way ANOVA F
    * statistic applied to absolute deviations z = |x − x̄_g| from the
    * group mean. Two passes, both map-side-combining aggregates: one
    * for exact group means (DECIMAL sums), one for the z moments with
    * the means joined back as a ≤5-row broadcast. z pins to integer
    * dollars (W is scale-invariant; dollar units keep sz²/n_g inside
    * int64 through sf100) and z² sums in DECIMAL(38,0), so every sum is
    * exact and W is bit-stable. Output is one row — the statistic,
    * its degrees of freedom, and the decision against the
    * conservative F(4, ∞) = 4.62 upper-0.1 % critical value.
    */
  private val q307 = QueryDef(
    "q307_levene",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val means = Fixtures.table(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg((sum(col("o_totalprice").cast(DecimalType(18, 6)))
          .cast("double") / count(lit(1))).as("mean_g"))
      val z = Fixtures.table(s, dir, "orders")
        .join(broadcast(means), Seq("o_orderpriority"))
        .select(col("o_orderpriority"),
          // whole-dollar units: W is scale-invariant, and dollar
          // deviations keep sz²/n_g inside int64 through sf100
          expr("CAST(round(abs(o_totalprice - mean_g)) AS BIGINT)")
            .as("z_cents"))
      val g = z.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_g"), sum(col("z_cents")).as("sz"),
          sum((col("z_cents") * col("z_cents"))
            .cast(DecimalType(38, 0))).as("szz"))
      g.agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
          sum(col("sz")).as("tz"),
          sum(col("szz")).cast(DecimalType(38, 0)).as("tzz"),
          sum(expr("""CAST(round(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
            / CAST(n_g AS DOUBLE)) AS BIGINT)""")).as("sgm"))
        .select(col("k"), col("n"),
          round((((col("sgm").cast("double")
              - col("tz").cast("double") * col("tz").cast("double")
                / col("n").cast("double")) / (col("k") - 1))
            / ((col("tzz").cast("double") - col("sgm").cast("double"))
              / (col("n") - col("k")))) / 1.0, 9).as("w_stat"))
        .select(col("k"), col("n"), col("w_stat"),
          (col("w_stat") > 4.62).as("heteroscedastic"))
    },
    Some("""WITH means AS (SELECT o_orderpriority,
          sum(CAST(o_totalprice AS DECIMAL(18,6)))::DOUBLE / count(*)
            AS mean_g
        FROM orders GROUP BY 1),
      z AS (SELECT o.o_orderpriority,
          round(abs(o_totalprice - mean_g))::BIGINT AS z_cents
        FROM orders o JOIN means m
          ON o.o_orderpriority = m.o_orderpriority),
      g AS (SELECT o_orderpriority, count(*)::BIGINT AS n_g,
          sum(z_cents)::BIGINT AS sz,
          sum(z_cents::HUGEINT * z_cents) AS szz
        FROM z GROUP BY 1),
      t AS (SELECT count(*)::BIGINT AS k, sum(n_g)::BIGINT AS n,
          sum(sz)::BIGINT AS tz, sum(szz) AS tzz,
          sum(round(sz::DOUBLE * sz::DOUBLE / n_g::DOUBLE)::BIGINT)
            ::BIGINT AS sgm
        FROM g)
      SELECT k, n,
        round((((sgm - tz::DOUBLE * tz::DOUBLE / n::DOUBLE) / (k - 1))
          / ((tzz::DOUBLE - sgm) / (n - k))), 9) AS w_stat,
        (((sgm - tz::DOUBLE * tz::DOUBLE / n::DOUBLE) / (k - 1))
          / ((tzz::DOUBLE - sgm) / (n - k))) > 4.62 AS heteroscedastic
      FROM t"""))

  // ---------- q311: capture–recapture population estimate --------------

  /** Lincoln–Petersen capture–recapture (Chapman-corrected) estimate of
    * the active-customer population from two INDEPENDENT deterministic
    * 10 % order samples — the ecology-borrowed estimator a pipeline
    * uses when the full distinct-count is too expensive but two cheap
    * overlapping samples are not: N̂ = (n₁+1)(n₂+1)/(m+1) − 1, where m
    * is the recapture overlap. Sits beside the sketch family (q35 KMV,
    * q85 HLL) as the SAMPLE-based alternative, and the audit emits the
    * true count and relative error because the fixture can still
    * afford the truth. Shape: two hash-coin predicates push into one
    * orders scan; each sample reduces to a distinct-customer set (one
    * narrow shuffle each, the q301 dedup-before-join rule), the
    * overlap is one equi-join on customer, and everything after is
    * exact integer arithmetic on three scalars.
    */
  private val q311 = QueryDef(
    "q311_capture_recapture",
    (s, dir) => {
      val ord = Fixtures.table(s, dir, "orders")
        .select(col("o_custkey"),
          (expr(Portable.h32Spark("concat('cap1_', o_orderkey)"))
            % 10 === 0).as("in_a"),
          (expr(Portable.h32Spark("concat('cap2_', o_orderkey)"))
            % 10 === 0).as("in_b"))
      val sa = ord.where(col("in_a")).select(col("o_custkey")).distinct()
      val sb = ord.where(col("in_b")).select(col("o_custkey")).distinct()
      val n1 = sa.agg(count(lit(1)).as("n1"))
      val n2 = sb.agg(count(lit(1)).as("n2"))
      val m = sa.join(sb, Seq("o_custkey")).agg(count(lit(1)).as("m"))
      val truth = ord.select(col("o_custkey")).distinct()
        .agg(count(lit(1)).as("true_n"))
      n1.crossJoin(broadcast(n2)).crossJoin(broadcast(m))
        .crossJoin(broadcast(truth))
        .select(col("n1"), col("n2"), col("m"), col("true_n"),
          round((col("n1") + 1).cast("double") * (col("n2") + 1)
            / (col("m") + 1) - 1.0, 4).as("est_n"))
        .select(col("n1"), col("n2"), col("m"), col("true_n"),
          col("est_n"),
          round((col("est_n") - col("true_n"))
            / col("true_n").cast("double"), 9).as("rel_err"))
    },
    Some(s"""WITH ord AS (SELECT o_custkey,
          ${Portable.h32Duck("'cap1_' || o_orderkey")} % 10 = 0 AS in_a,
          ${Portable.h32Duck("'cap2_' || o_orderkey")} % 10 = 0 AS in_b
        FROM orders),
      sa AS (SELECT DISTINCT o_custkey FROM ord WHERE in_a),
      sb AS (SELECT DISTINCT o_custkey FROM ord WHERE in_b),
      x AS (SELECT (SELECT count(*) FROM sa)::BIGINT AS n1,
          (SELECT count(*) FROM sb)::BIGINT AS n2,
          (SELECT count(*) FROM sa JOIN sb USING (o_custkey))::BIGINT
            AS m,
          (SELECT count(DISTINCT o_custkey) FROM ord)::BIGINT AS true_n),
      e AS (SELECT *, round((n1 + 1)::DOUBLE * (n2 + 1) / (m + 1) - 1.0,
          4) AS est_n FROM x)
      SELECT n1, n2, m, true_n, est_n,
        round((est_n - true_n) / true_n::DOUBLE, 9) AS rel_err
      FROM e"""))

  // ---------- q314: weighted quantiles from a biased sample ------------

  /** Design-weighted quantile estimation — the q304 companion: given
    * the SAME band-rate sample (small 10 %, medium 50 %, large 100 %)
    * with exact inverse-probability weights 10/2/1, estimate the
    * population's order-total median and P90 per market segment.
    * Unweighted sample quantiles would skew high (large orders are
    * oversampled); HT weighting undoes the design bias. Exactness at
    * scale: the quantile is computed over FIXED $5 000 price cells —
    * a weighted cumulative over a ≤|cells| bounded table per segment
    * (window PARTITIONED by segment, q159 class), never a
    * corpus-sized per-group sort — and the answer is the lower edge
    * of the first cell whose cumulative weight crosses the target,
    * exact for the binned distribution in both engines (all weights
    * int64). The true binned quantiles ride along for the audit.
    */
  private val q314 = QueryDef(
    "q314_weighted_quantiles",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val base = Fixtures.table(s, dir, "orders")
        .join(broadcast(Fixtures.table(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"),
          expr("CAST(floor(o_totalprice / 5000.0) AS BIGINT)").as("cell"),
          when(col("o_totalprice") < 250000.0, 10L)
            .when(col("o_totalprice") < 420000.0, 2L)
            .otherwise(1L).as("inv_w"),
          (expr(Portable.h32Spark("concat('ht_', o_orderkey)"))
            % 1000).as("coin"))
        .withColumn("sampled",
          when(col("coin") < lit(1000L) / col("inv_w"), 1L).otherwise(0L))
      val cells = base.groupBy(col("segment"), col("cell"))
        .agg(sum(when(col("sampled") === 1, col("inv_w")).otherwise(0L))
          .as("w"), count(lit(1)).as("n_true"))
      val wseg = Window.partitionBy(col("segment"))
      val wcum = Window.partitionBy(col("segment")).orderBy(col("cell"))
      val cum = cells
        .withColumn("tw", sum(col("w")).over(wseg))
        .withColumn("tn", sum(col("n_true")).over(wseg))
        .withColumn("cw", sum(col("w")).over(wcum))
        .withColumn("cn", sum(col("n_true")).over(wcum))
      def pick(c: String, t: String, frac: Double, out: String) =
        cum.where(col(c) * 100 >= col(t) * math.round(frac * 100))
          .groupBy(col("segment"))
          .agg((min(col("cell")) * 5000).as(out))
      pick("cw", "tw", 0.5, "est_p50")
        .join(pick("cw", "tw", 0.9, "est_p90"), Seq("segment"))
        .join(pick("cn", "tn", 0.5, "true_p50"), Seq("segment"))
        .join(pick("cn", "tn", 0.9, "true_p90"), Seq("segment"))
        .orderBy(col("segment"))
    },
    Some(s"""WITH base AS (SELECT c_mktsegment AS segment,
          floor(o_totalprice / 5000.0)::BIGINT AS cell,
          CASE WHEN o_totalprice < 250000.0 THEN 10
            WHEN o_totalprice < 420000.0 THEN 2 ELSE 1 END AS inv_w,
          ${Portable.h32Duck("'ht_' || o_orderkey")} % 1000 AS coin
        FROM orders JOIN customer ON o_custkey = c_custkey),
      cells AS (SELECT segment, cell,
          sum(CASE WHEN coin < 1000 / inv_w THEN inv_w ELSE 0
            END)::BIGINT AS w,
          count(*)::BIGINT AS n_true
        FROM base GROUP BY 1, 2),
      cum AS (SELECT segment, cell, w, n_true,
          sum(w) OVER (PARTITION BY segment)::BIGINT AS tw,
          sum(n_true) OVER (PARTITION BY segment)::BIGINT AS tn,
          sum(w) OVER (PARTITION BY segment ORDER BY cell)::BIGINT AS cw,
          sum(n_true) OVER (PARTITION BY segment ORDER BY cell)::BIGINT
            AS cn
        FROM cells)
      SELECT segment,
        (SELECT min(cell) FROM cum c2 WHERE c2.segment = c.segment
          AND c2.cw * 100 >= c2.tw * 50) * 5000 AS est_p50,
        (SELECT min(cell) FROM cum c2 WHERE c2.segment = c.segment
          AND c2.cw * 100 >= c2.tw * 90) * 5000 AS est_p90,
        (SELECT min(cell) FROM cum c2 WHERE c2.segment = c.segment
          AND c2.cn * 100 >= c2.tn * 50) * 5000 AS true_p50,
        (SELECT min(cell) FROM cum c2 WHERE c2.segment = c.segment
          AND c2.cn * 100 >= c2.tn * 90) * 5000 AS true_p90
      FROM (SELECT DISTINCT segment FROM cum) c
      ORDER BY segment"""))

  // ---------- q315: quantile treatment effects -------------------------

  /** Quantile treatment effects — where q302's ATE answers "does a deep
    * discount shift the MEAN", this answers "WHERE in the outcome
    * distribution does it act": the P25/P50/P75 of line revenue under
    * treatment (discount ≥ 6 %) minus the same quantiles under
    * control, the standard heterogeneity read-out when an effect is
    * suspected to live in one tail. Same scale discipline as q314:
    * quantiles are exact over fixed $2 000 revenue cells — cumulative
    * windows over a ≤|cells| bounded table PARTITIONED by arm — so no
    * corpus-sized per-arm sort exists at any scale, and every count
    * is int64. Output: one row per quantile with both arm values and
    * the effect.
    */
  private val q315 = QueryDef(
    "q315_quantile_effects",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cells = Fixtures.table(s, dir, "lineitem")
        .select(
          when(col("l_discount") >= 0.06, 1L).otherwise(0L).as("arm"),
          expr("CAST(floor(l_extendedprice / 2000.0) AS BIGINT)").as("cell"))
        .groupBy(col("arm"), col("cell")).agg(count(lit(1)).as("n"))
      val wa = Window.partitionBy(col("arm"))
      val wc = Window.partitionBy(col("arm")).orderBy(col("cell"))
      val cum = cells
        .withColumn("tn", sum(col("n")).over(wa))
        .withColumn("cn", sum(col("n")).over(wc))
      val qs = s.createDataFrame(Seq((25, "p25"), (50, "p50"),
        (75, "p75"))).toDF("pct", "q")
      val picked = cum.crossJoin(broadcast(qs))
        .where(col("cn") * 100 >= col("tn") * col("pct"))
        .groupBy(col("q"), col("pct"), col("arm"))
        .agg((min(col("cell")) * 2000).as("v"))
      picked
        .groupBy(col("q"), col("pct"))
        .agg(sum(when(col("arm") === 1, col("v")).otherwise(0L))
          .as("treated"),
          sum(when(col("arm") === 0, col("v")).otherwise(0L))
            .as("control"))
        .select(col("q").as("quantile"), col("treated"), col("control"),
          (col("treated") - col("control")).as("qte"))
        .orderBy(col("quantile"))
    },
    Some("""WITH cells AS (SELECT
          CASE WHEN l_discount >= 0.06 THEN 1 ELSE 0 END AS arm,
          floor(l_extendedprice / 2000.0)::BIGINT AS cell,
          count(*)::BIGINT AS n
        FROM lineitem GROUP BY 1, 2),
      cum AS (SELECT arm, cell, n,
          sum(n) OVER (PARTITION BY arm)::BIGINT AS tn,
          sum(n) OVER (PARTITION BY arm ORDER BY cell)::BIGINT AS cn
        FROM cells),
      qs AS (SELECT * FROM (VALUES (25, 'p25'), (50, 'p50'),
        (75, 'p75')) AS t(pct, q)),
      picked AS (SELECT q, pct, arm, min(cell) * 2000 AS v
        FROM cum CROSS JOIN qs
        WHERE cn * 100 >= tn * pct
        GROUP BY 1, 2, 3)
      SELECT q AS quantile,
        sum(CASE WHEN arm = 1 THEN v ELSE 0 END)::BIGINT AS treated,
        sum(CASE WHEN arm = 0 THEN v ELSE 0 END)::BIGINT AS control,
        (sum(CASE WHEN arm = 1 THEN v ELSE 0 END)
          - sum(CASE WHEN arm = 0 THEN v ELSE 0 END))::BIGINT AS qte
      FROM picked GROUP BY q ORDER BY quantile"""))

  // ---------- q316: Moran's I network autocorrelation ------------------

  /** Moran's I of part retail price over the co-purchase graph — "are
    * co-purchased parts similarly priced?" — the ATTRIBUTE
    * autocorrelation that complements q226's structural (degree)
    * assortativity: I = (n/W)·Σ_ij w_ij z_i z_j / Σ z_i² with w = 1
    * on co-purchase edges, z the price deviation from the graph-node
    * mean. I > 0 means baskets cluster by price tier (bundling);
    * I < 0 means cross-tier attachment (accessories with big-ticket
    * items). Shape: the node set and its exact moments come from one
    * bounded aggregate over parts WITH edges (z pinned to integer
    * cents); the numerator is ONE equi-join of the edge list against
    * the z table on each endpoint — shuffle ∝ |edges|, never degree².
    * All sums exact int64 at fixture scale with DECIMAL-lift on the
    * product sum for 100× headroom.
    */
  private val q316 = QueryDef(
    "q316_moran_i",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val pairs = copurchasePairs(s, dir)
        .select(col("part_a"), col("part_b"))
      // the graph's node set IS the shared degree table's key set —
      // no pair-table rescan + distinct
      val nodes = copurchaseDegrees(s, dir).select(col("node").as("pk"))
        .join(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_retailprice")),
          col("pk") === col("p_partkey"))
        .select(col("pk"),
          expr("CAST(round(p_retailprice * 100.0) AS BIGINT)")
            .as("price_cents"))
      val mean = nodes.agg(count(lit(1)).as("n"),
        expr("CAST(round(sum(price_cents) * 1.0 / count(1)) AS BIGINT)")
          .as("mean_cents"))
      // frozen: z feeds the denominator and both endpoint joins
      val z = PlanCache.freeze(nodes.crossJoin(broadcast(mean))
        .select(col("pk"), col("n"),
          (col("price_cents") - col("mean_cents")).as("zc")))
      val denom = z.agg(first(col("n")).as("n"),
        sum((col("zc") * col("zc")).cast(DecimalType(38, 0)))
          .cast("double").as("szz"))
      val num = pairs
        .join(z.select(col("pk").as("part_a"), col("zc").as("za")),
          Seq("part_a"))
        .join(z.select(col("pk").as("part_b"), col("zc").as("zb")),
          Seq("part_b"))
        .agg(count(lit(1)).as("n_edges"),
          sum((col("za") * col("zb")).cast(DecimalType(38, 0)))
            .cast("double").as("szazb"))
      num.crossJoin(broadcast(denom))
        .select(col("n").as("n_nodes"), col("n_edges"),
          round((col("n").cast("double")
            / (lit(2.0) * col("n_edges")))
            * (lit(2.0) * col("szazb") / col("szz")), 9).as("moran_i"))
    },
    Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
          AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2),
      nodes AS (SELECT pk, round(p_retailprice * 100.0)::BIGINT
            AS price_cents
        FROM (SELECT part_a AS pk FROM pr
          UNION SELECT part_b FROM pr) n
        JOIN part ON pk = p_partkey),
      m AS (SELECT count(*)::BIGINT AS n,
          round(sum(price_cents) * 1.0 / count(*))::BIGINT AS mean_cents
        FROM nodes),
      z AS (SELECT pk, n, price_cents - mean_cents AS zc
        FROM nodes, m),
      den AS (SELECT any_value(n) AS n,
          sum(zc::HUGEINT * zc)::DOUBLE AS szz FROM z),
      num AS (SELECT count(*)::BIGINT AS n_edges,
          sum(za.zc::HUGEINT * zb.zc)::DOUBLE AS szazb
        FROM pr JOIN z za ON pr.part_a = za.pk
        JOIN z zb ON pr.part_b = zb.pk)
      SELECT n AS n_nodes, n_edges,
        round((n::DOUBLE / (2.0 * n_edges)) * (2.0 * szazb / szz), 9)
          AS moran_i
      FROM num, den"""))

  // ---------- q317: partial correlation --------------------------------

  /** Partial correlation r(balance, spend | activity): the raw
    * balance↔spend correlation (q75's moment machinery) confounded by
    * order COUNT — active customers both spend more and hold
    * different balances — and the first-order partialling-out
    * r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)) that removes
    * the linear activity effect. The emitted gap between raw and
    * partial is the confounding share. Shape: one orders pass into a
    * per-customer aggregate, one joined customer pass into a single
    * 1-row moment vector (all sums of cent-pinned int64 products,
    * DECIMAL-lifted for 100× headroom); the three Pearson r's and the
    * partial are scalar arithmetic.
    */
  private val q317 = QueryDef(
    "q317_partial_correlation",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val per = Fixtures.table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(expr("CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6)))" +
          " * 100.0) AS BIGINT) div 100000").as("y"),
          count(lit(1)).as("z"))
      val base = Fixtures.table(s, dir, "customer")
        .join(per, col("c_custkey") === col("o_custkey"))
        .select(expr("CAST(round(c_acctbal * 100.0) AS BIGINT) div 100")
          .as("x"), col("y"), col("z"))
      def d(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
      val mom = base.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("z")).as("sz"),
        sum(d(col("x") * col("x"))).cast("double").as("sxx"),
        sum(d(col("y") * col("y"))).cast("double").as("syy"),
        sum(d(col("z") * col("z"))).cast("double").as("szz"),
        sum(d(col("x") * col("y"))).cast("double").as("sxy"),
        sum(d(col("x") * col("z"))).cast("double").as("sxz"),
        sum(d(col("y") * col("z"))).cast("double").as("syz"))
      val r = (sab: String, sa: String, sb: String, saa: String,
          sbb: String) =>
        s"""(($sab - CAST($sa AS DOUBLE) * $sb / n)
           / sqrt(($saa - CAST($sa AS DOUBLE) * $sa / n)
             * ($sbb - CAST($sb AS DOUBLE) * $sb / n)))"""
      val rxy = r("sxy", "sx", "sy", "sxx", "syy")
      val rxz = r("sxz", "sx", "sz", "sxx", "szz")
      val ryz = r("syz", "sy", "sz", "syy", "szz")
      mom.select(col("n"),
        round(expr(rxy), 9).as("r_xy"),
        round(expr(rxz), 9).as("r_xz"),
        round(expr(ryz), 9).as("r_yz"),
        round(expr(s"""(($rxy) - ($rxz) * ($ryz))
          / sqrt((1.0 - ($rxz) * ($rxz)) * (1.0 - ($ryz) * ($ryz)))"""),
          9).as("r_xy_given_z"))
    },
    Some {
      val r = (sab: String, sa: String, sb: String, saa: String,
          sbb: String) =>
        s"""(($sab - $sa::DOUBLE * $sb / n)
           / sqrt(($saa - $sa::DOUBLE * $sa / n)
             * ($sbb - $sb::DOUBLE * $sb / n)))"""
      val rxy = r("sxy", "sx", "sy", "sxx", "syy")
      val rxz = r("sxz", "sx", "sz", "sxx", "szz")
      val ryz = r("syz", "sy", "sz", "syy", "szz")
      s"""WITH per AS (SELECT o_custkey,
          round(sum(CAST(o_totalprice AS DECIMAL(18,6))) * 100.0)::BIGINT
            // 100000 AS y,
          count(*)::BIGINT AS z
        FROM orders GROUP BY 1),
      base AS (SELECT round(c_acctbal * 100.0)::BIGINT // 100 AS x, y, z
        FROM customer JOIN per ON c_custkey = o_custkey),
      mom AS (SELECT count(*)::BIGINT AS n,
          sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
          sum(z)::BIGINT AS sz,
          sum(x::HUGEINT * x)::DOUBLE AS sxx,
          sum(y::HUGEINT * y)::DOUBLE AS syy,
          sum(z::HUGEINT * z)::DOUBLE AS szz,
          sum(x::HUGEINT * y)::DOUBLE AS sxy,
          sum(x::HUGEINT * z)::DOUBLE AS sxz,
          sum(y::HUGEINT * z)::DOUBLE AS syz
        FROM base)
      SELECT n, round($rxy, 9) AS r_xy, round($rxz, 9) AS r_xz,
        round($ryz, 9) AS r_yz,
        round((($rxy) - ($rxz) * ($ryz))
          / sqrt((1.0 - ($rxz) * ($rxz)) * (1.0 - ($ryz) * ($ryz))),
          9) AS r_xy_given_z
      FROM mom"""
    })

  // ---------- q323: upper tail dependence ------------------------------

  /** Upper-tail dependence λ_U between customer balance and spend:
    * q234's Spearman and q317's partial correlation measure BODY
    * association; risk lives in the JOINT TAIL — λ_U = P(spend >
    * Q90(spend) | balance > Q90(balance)) ≈ 0.1 under independence,
    * → 1 under comonotone extremes, the copula diagnostic that
    * decides whether "whale balance" predicts "whale spend" where it
    * matters. Completes the EVT family (q290 Hill, q308 Gumbel) on
    * the JOINT side. Scale shape: both Q90 thresholds are exact over
    * fixed cells — cumulative windows over BOUNDED cell tables (q314
    * rule, ≤ a few hundred rows even at 100 TB) — broadcast back as
    * 1-row scalars; the exceedance count is one conditional aggregate
    * over the per-customer pass. All counts int64.
    */
  private val q323 = QueryDef(
    "q323_tail_dependence",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val per = Fixtures.table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(expr("CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6)))" +
          " * 100.0) AS BIGINT)").as("y_cents"))
      val base = Fixtures.table(s, dir, "customer")
        .join(per, col("c_custkey") === col("o_custkey"))
        .select(expr("CAST(round(c_acctbal * 100.0) AS BIGINT)")
          .as("x_cents"), col("y_cents"))
      def q90(c: String, width: Long, out: String): DataFrame = {
        val cells = base.select((col(c) - (col(c) % width)).as("cell"))
          .groupBy(col("cell")).agg(count(lit(1)).as("n"))
        val w = Window.orderBy(col("cell"))
        cells.withColumn("cn", sum(col("n")).over(w))
          .crossJoin(broadcast(cells.agg(sum(col("n")).as("tn"))))
          .where(col("cn") * 10 >= col("tn") * 9)
          .agg(min(col("cell")).as(out))
      }
      val tx = q90("x_cents", 10000L, "x90")
      val ty = q90("y_cents", 10000000L, "y90")
      base.crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
        .agg(count(lit(1)).as("n"),
          sum(when(col("x_cents") > col("x90"), 1L).otherwise(0L))
            .as("n_x_exceed"),
          sum(when(col("y_cents") > col("y90"), 1L).otherwise(0L))
            .as("n_y_exceed"),
          sum(when(col("x_cents") > col("x90")
            && col("y_cents") > col("y90"), 1L).otherwise(0L))
            .as("n_joint"))
        .select(col("n"), col("n_x_exceed"), col("n_y_exceed"),
          col("n_joint"),
          round(col("n_joint").cast("double") / col("n_x_exceed"), 9)
            .as("lambda_u"),
          round(col("n_x_exceed").cast("double") * col("n_y_exceed")
            / col("n") / col("n"), 9).as("independent_baseline"))
    },
    Some("""WITH per AS (SELECT o_custkey,
          round(sum(CAST(o_totalprice AS DECIMAL(18,6))) * 100.0)::BIGINT
            AS y_cents
        FROM orders GROUP BY 1),
      base AS (SELECT round(c_acctbal * 100.0)::BIGINT AS x_cents,
          y_cents
        FROM customer JOIN per ON c_custkey = o_custkey),
      xc AS (SELECT x_cents - (x_cents % 10000) AS cell,
          count(*)::BIGINT AS n FROM base GROUP BY 1),
      xq AS (SELECT min(cell) AS x90 FROM (SELECT cell,
          sum(n) OVER (ORDER BY cell) AS cn, sum(n) OVER () AS tn
        FROM xc) WHERE cn * 10 >= tn * 9),
      yc AS (SELECT y_cents - (y_cents % 10000000) AS cell,
          count(*)::BIGINT AS n FROM base GROUP BY 1),
      yq AS (SELECT min(cell) AS y90 FROM (SELECT cell,
          sum(n) OVER (ORDER BY cell) AS cn, sum(n) OVER () AS tn
        FROM yc) WHERE cn * 10 >= tn * 9)
      SELECT count(*)::BIGINT AS n,
        sum(CASE WHEN x_cents > x90 THEN 1 ELSE 0 END)::BIGINT
          AS n_x_exceed,
        sum(CASE WHEN y_cents > y90 THEN 1 ELSE 0 END)::BIGINT
          AS n_y_exceed,
        sum(CASE WHEN x_cents > x90 AND y_cents > y90 THEN 1 ELSE 0
          END)::BIGINT AS n_joint,
        round(sum(CASE WHEN x_cents > x90 AND y_cents > y90 THEN 1
            ELSE 0 END)::DOUBLE
          / sum(CASE WHEN x_cents > x90 THEN 1 ELSE 0 END), 9)
          AS lambda_u,
        round(sum(CASE WHEN x_cents > x90 THEN 1 ELSE 0 END)::DOUBLE
          * sum(CASE WHEN y_cents > y90 THEN 1 ELSE 0 END)
          / count(*) / count(*), 9) AS independent_baseline
      FROM base, xq, yq"""))

  // ---------- q325: histogram selectivity-error audit ------------------

  /** Optimizer-statistics quality audit: how well does the 20-bucket
    * equi-width histogram an optimizer keeps (q46's statistic) predict
    * range-predicate selectivity? For ten $50 000-wide probe ranges,
    * the histogram estimate (full buckets + linear interpolation in
    * the edge buckets — the textbook uniform-within-bucket
    * assumption) is compared to the TRUE row count, and the relative
    * error is emitted per probe. Exactly the number a cost model's
    * row estimates are wrong by — the cause of every bad join order.
    * Shape: one pass builds the bounded histogram; one pass computes
    * all ten true counts as conditional aggregates; the estimate math
    * is a bounded bucket×probe join. Counts int64; interpolation
    * double from exact ints.
    */
  private val q325 = QueryDef(
    "q325_selectivity_error",
    (s, dir) => {
      val width = 25000L
      val hist = Fixtures.table(s, dir, "orders")
        .select(least(expr(s"CAST(floor(o_totalprice / $width.0) AS BIGINT)"),
          lit(19L)).as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("n"))
      val probes = s.range(0, 10)
        .select(col("id").as("probe"),
          (col("id") * 50000L).as("lo"),
          (col("id") * 50000L + 50000L).as("hi"))
      val est = hist.crossJoin(broadcast(probes))
        .select(col("probe"), col("lo"), col("hi"),
          // overlap of bucket [b*w, (b+1)*w) with [lo, hi) under the
          // uniform-within-bucket assumption, in exact micro-fractions
          expr(s"""CAST(round(n * 1e6 * greatest(0.0,
              (CAST(least(hi, (b + 1) * $width) AS DOUBLE)
               - CAST(greatest(lo, b * $width) AS DOUBLE)) / $width))
            AS BIGINT)""").as("est_micro"))
        .groupBy(col("probe"))
        .agg(sum(col("est_micro")).as("est_micro"))
      val truth = Fixtures.table(s, dir, "orders")
        .crossJoin(broadcast(probes))
        .groupBy(col("probe"))
        .agg(sum(when(col("o_totalprice") >= col("lo")
          && col("o_totalprice") < col("hi"), 1L).otherwise(0L))
          .as("true_n"))
      est.join(truth, Seq("probe"))
        .select(col("probe"),
          round(col("est_micro").cast("double") / 1e6, 3).as("est_n"),
          col("true_n"),
          round(when(col("true_n") === 0, lit(0.0))
            .otherwise((col("est_micro").cast("double") / 1e6
              - col("true_n")) / col("true_n")), 6).as("rel_err"))
        .orderBy(col("probe"))
    },
    Some("""WITH hist AS (SELECT least(floor(o_totalprice / 25000.0)::BIGINT, 19) AS b,
          count(*)::BIGINT AS n
        FROM orders GROUP BY 1),
      probes AS (SELECT p AS probe, p * 50000 AS lo,
          p * 50000 + 50000 AS hi
        FROM (SELECT unnest(range(0, 10)) AS p)),
      est AS (SELECT probe,
          sum(round(n * 1e6 * greatest(0.0,
            (least(hi, (b + 1) * 25000)::DOUBLE
             - greatest(lo, b * 25000)::DOUBLE) / 25000))::BIGINT)
            ::BIGINT AS est_micro
        FROM hist CROSS JOIN probes GROUP BY 1),
      tr AS (SELECT probe,
          sum(CASE WHEN o_totalprice >= lo AND o_totalprice < hi
            THEN 1 ELSE 0 END)::BIGINT AS true_n
        FROM orders CROSS JOIN probes GROUP BY 1)
      SELECT probe, round(est_micro::DOUBLE / 1e6, 3) AS est_n, true_n,
        round(CASE WHEN true_n = 0 THEN 0.0
          ELSE (est_micro::DOUBLE / 1e6 - true_n) / true_n END, 6)
          AS rel_err
      FROM est JOIN tr USING (probe) ORDER BY probe"""))

  // ---------- q326: rich-club coefficient ------------------------------

  /** Rich-club coefficient of the co-purchase graph at degree
    * thresholds k ∈ {2,4,8,16}: among the nodes of degree > k, the
    * realized edge density φ(k) = 2·E_k / (N_k(N_k−1)) — do the
    * best-connected parts preferentially co-occur with EACH OTHER
    * (φ rising with k: a hub "club" — bundle anchors), or do hubs
    * only bridge the periphery? Completes the graph-structure family
    * (q122 degrees, q226 assortativity, q261 k-core, q269
    * modularity). Shape: degrees are one aggregate over the edge
    * list; each edge is checked against both endpoints' degrees via
    * two equi-joins, the four thresholds fold into conditional
    * aggregates (no per-k passes); all counts exact int64.
    */
  private val q326 = QueryDef(
    "q326_rich_club",
    (s, dir) => {
      val pairs = copurchasePairs(s, dir)
        .select(col("part_a"), col("part_b"))
      val deg = copurchaseDegrees(s, dir)
      val edges = pairs
        .join(deg.select(col("node").as("part_a"), col("deg").as("da")),
          Seq("part_a"))
        .join(deg.select(col("node").as("part_b"), col("deg").as("db")),
          Seq("part_b"))
      val ks = s.createDataFrame(Seq(Tuple1(2L), Tuple1(4L), Tuple1(8L),
        Tuple1(16L))).toDF("k")
      val ek = edges.crossJoin(broadcast(ks))
        .groupBy(col("k"))
        .agg(sum(when(col("da") > col("k") && col("db") > col("k"), 1L)
          .otherwise(0L)).as("n_edges"))
      val nk = deg.crossJoin(broadcast(ks))
        .groupBy(col("k"))
        .agg(sum(when(col("deg") > col("k"), 1L).otherwise(0L))
          .as("n_nodes"))
      ek.join(nk, Seq("k"))
        .select(col("k"), col("n_nodes"), col("n_edges"),
          round(when(col("n_nodes") < 2, lit(0.0))
            .otherwise(lit(2.0) * col("n_edges")
              / (col("n_nodes") * (col("n_nodes") - 1)).cast("double")),
            9).as("phi"))
        .orderBy(col("k"))
    },
    Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
          AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2),
      adj AS (SELECT part_a AS node, part_b AS nbr FROM pr
        UNION ALL SELECT part_b, part_a FROM pr),
      deg AS (SELECT node, count(*)::BIGINT AS deg FROM adj GROUP BY 1),
      e AS (SELECT part_a, part_b, da.deg AS da, db.deg AS db
        FROM pr JOIN deg da ON part_a = da.node
        JOIN deg db ON part_b = db.node),
      ks AS (SELECT unnest([2, 4, 8, 16])::BIGINT AS k),
      ek AS (SELECT k, sum(CASE WHEN da > k AND db > k THEN 1 ELSE 0
          END)::BIGINT AS n_edges
        FROM e CROSS JOIN ks GROUP BY 1),
      nk AS (SELECT k, sum(CASE WHEN deg > k THEN 1 ELSE 0 END)::BIGINT
          AS n_nodes
        FROM deg CROSS JOIN ks GROUP BY 1)
      SELECT k, n_nodes, n_edges,
        round(CASE WHEN n_nodes < 2 THEN 0.0
          ELSE 2.0 * n_edges / (n_nodes * (n_nodes - 1))::DOUBLE END,
          9) AS phi
      FROM ek JOIN nk USING (k) ORDER BY k"""))

  // ---------- q327: delta-method ratio-metric SE -----------------------

  /** The ratio-metric standard error done RIGHT — the most common A/B
    * analysis mistake: revenue-per-order is a ratio of PER-USER sums
    * (users are the randomization unit), so the naive per-order SE
    * that treats orders as independent understates the variance
    * wherever users cluster. Per market segment, the delta-method SE
    * of R = Σy/Σx (Fieller/Taylor expansion: Var ≈ (s_y² + R²s_x² −
    * 2R·s_xy)/(n·x̄²)) is compared with the naive per-order SE, and
    * the emitted design effect (ratio of the two) is the correction
    * factor every clustered experiment needs. Shape: per-customer
    * aggregate (corpus pass), then a per-segment moment vector of
    * cent-pinned int64 products (DECIMAL lift); scalar math after.
    */
  private val q327 = QueryDef(
    "q327_ratio_metric_se",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val perUser = Fixtures.table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("x"),
          expr("""CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6)))
            * 100.0) AS BIGINT) div 100""").as("y"))
      val perOrder = Fixtures.table(s, dir, "orders")
        .join(broadcast(Fixtures.table(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(expr("CAST(round(o_totalprice * 100.0) AS BIGINT) div 100"))
            .as("s_ord"),
          sum((expr("CAST(round(o_totalprice * 100.0) AS BIGINT) div 100")
            * expr("CAST(round(o_totalprice * 100.0) AS BIGINT) div 100"))
            .cast(DecimalType(38, 0))).cast("double").as("s_ord2"))
      def d(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
      val mom = perUser
        .join(broadcast(Fixtures.table(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(d(col("x") * col("x"))).cast("double").as("sxx"),
          sum(d(col("y") * col("y"))).cast("double").as("syy"),
          sum(d(col("x") * col("y"))).cast("double").as("sxy"))
      mom.join(perOrder, Seq("c_mktsegment"))
        .select(col("c_mktsegment").as("segment"), col("n"),
          col("n_orders"),
          round(col("sy").cast("double") / col("sx"), 6).as("ratio"),
          round(expr("""sqrt(((syy - CAST(sy AS DOUBLE) * sy / n)
              / (n - 1)
            + (CAST(sy AS DOUBLE) / sx) * (CAST(sy AS DOUBLE) / sx)
              * ((sxx - CAST(sx AS DOUBLE) * sx / n) / (n - 1))
            - 2.0 * (CAST(sy AS DOUBLE) / sx)
              * ((sxy - CAST(sx AS DOUBLE) * sy / n) / (n - 1)))
            / n) / (CAST(sx AS DOUBLE) / n)"""), 6).as("se_delta"),
          round(expr("""sqrt(((s_ord2 - CAST(s_ord AS DOUBLE) * s_ord
              / n_orders) / (n_orders - 1)) / n_orders)"""), 6)
            .as("se_naive"))
        .select(col("segment"), col("n"), col("n_orders"), col("ratio"),
          col("se_delta"), col("se_naive"),
          round(col("se_delta") / col("se_naive"), 6).as("design_effect"))
        .orderBy(col("segment"))
    },
    Some("""WITH pu AS (SELECT o_custkey, count(*)::BIGINT AS x,
          round(sum(CAST(o_totalprice AS DECIMAL(18,6))) * 100.0)::BIGINT
            // 100 AS y
        FROM orders GROUP BY 1),
      po AS (SELECT c_mktsegment, count(*)::BIGINT AS n_orders,
          sum(round(o_totalprice * 100.0)::BIGINT // 100)::BIGINT
            AS s_ord,
          sum((round(o_totalprice * 100.0)::BIGINT // 100)::HUGEINT
            * (round(o_totalprice * 100.0)::BIGINT // 100))::DOUBLE
            AS s_ord2
        FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1),
      mom AS (SELECT c_mktsegment, count(*)::BIGINT AS n,
          sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
          sum(x::HUGEINT * x)::DOUBLE AS sxx,
          sum(y::HUGEINT * y)::DOUBLE AS syy,
          sum(x::HUGEINT * y)::DOUBLE AS sxy
        FROM pu JOIN customer ON o_custkey = c_custkey GROUP BY 1),
      pre AS (SELECT c_mktsegment AS segment, n, n_orders,
          round(sy::DOUBLE / sx, 6) AS ratio,
          round(sqrt(((syy - sy::DOUBLE * sy / n) / (n - 1)
            + (sy::DOUBLE / sx) * (sy::DOUBLE / sx)
              * ((sxx - sx::DOUBLE * sx / n) / (n - 1))
            - 2.0 * (sy::DOUBLE / sx)
              * ((sxy - sx::DOUBLE * sy / n) / (n - 1)))
            / n) / (sx::DOUBLE / n), 6) AS se_delta,
          round(sqrt(((s_ord2 - s_ord::DOUBLE * s_ord / n_orders)
            / (n_orders - 1)) / n_orders), 6) AS se_naive
        FROM mom JOIN po USING (c_mktsegment))
      SELECT segment, n, n_orders, ratio, se_delta, se_naive,
        round(se_delta / se_naive, 6) AS design_effect
      FROM pre ORDER BY segment"""))

  // ---------- q330: 1-D Gaussian-mixture EM step -----------------------

  /** One EM step of a two-component 1-D Gaussian mixture over order
    * totals — the soft-clustering primitive behind "is this price
    * distribution one population or two" (the 1-D, closed-form member
    * of the family whose k-means hard-assignment step is q134): from
    * a fixed symmetric init (μ = 150 k / 350 k, σ = 100 k, w = ½),
    * E-step responsibilities and the full M-step update (w, μ, σ per
    * component). A production fit iterates this to convergence; ONE
    * deterministic step is what a SQL engine should expose (the q134
    * precedent). Scale discipline: the fact table first folds into ≤20
    * fixed $25 k cells, so the E-step's exp() runs on BOUNDED cell
    * midpoints (identical literal inputs on both engines),
    * responsibilities pin to nano ints, and every M-step sum is a
    * DECIMAL-lifted exact integer product over the cell table.
    */
  private val q330 = QueryDef(
    "q330_em_step",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val cells = Fixtures.table(s, dir, "orders")
        .select(least(expr("CAST(floor(o_totalprice / 25000.0) AS BIGINT)"),
          lit(19L)).as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("n"))
        .withColumn("x", col("b") * 25000L + 12500L)
      val resp = cells.withColumn("r1_nano", expr(
        """CAST(round(
          exp(-pow((CAST(x AS DOUBLE) - 150000.0) / 100000.0, 2) / 2.0)
          / (exp(-pow((CAST(x AS DOUBLE) - 150000.0) / 100000.0, 2)
              / 2.0)
            + exp(-pow((CAST(x AS DOUBLE) - 350000.0) / 100000.0, 2)
              / 2.0)) * 1e9) AS BIGINT)"""))
      def dl(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
      val m = resp.agg(sum(col("n")).as("nn"),
        sum(dl(col("n") * col("r1_nano"))).cast("double").as("s1"),
        sum(dl(col("n") * (lit(1000000000L) - col("r1_nano"))))
          .cast("double").as("s2"),
        sum(dl(col("n") * col("r1_nano")) * dl(col("x")))
          .cast("double").as("sx1"),
        sum(dl(col("n") * (lit(1000000000L) - col("r1_nano")))
          * dl(col("x"))).cast("double").as("sx2"),
        sum(dl(col("n") * col("r1_nano")) * dl(col("x") * col("x")))
          .cast("double").as("sxx1"),
        sum(dl(col("n") * (lit(1000000000L) - col("r1_nano")))
          * dl(col("x") * col("x"))).cast("double").as("sxx2"))
      m.select(col("nn").as("n"),
          round(col("s1") / 1e9 / col("nn"), 9).as("w1_new"),
          round(col("sx1") / col("s1"), 3).as("mu1_new"),
          round(sqrt(col("sxx1") / col("s1")
            - (col("sx1") / col("s1")) * (col("sx1") / col("s1"))), 3)
            .as("sigma1_new"),
          round(col("sx2") / col("s2"), 3).as("mu2_new"),
          round(sqrt(col("sxx2") / col("s2")
            - (col("sx2") / col("s2")) * (col("sx2") / col("s2"))), 3)
            .as("sigma2_new"))
    },
    Some("""WITH cells AS (SELECT b, count(*)::BIGINT AS n,
          b * 25000 + 12500 AS x
        FROM (SELECT least(floor(o_totalprice / 25000.0)::BIGINT, 19)
            AS b FROM orders)
        GROUP BY b),
      resp AS (SELECT *, round(
          exp(-pow((x::DOUBLE - 150000.0) / 100000.0, 2) / 2.0)
          / (exp(-pow((x::DOUBLE - 150000.0) / 100000.0, 2) / 2.0)
            + exp(-pow((x::DOUBLE - 350000.0) / 100000.0, 2) / 2.0))
          * 1e9)::BIGINT AS r1_nano
        FROM cells),
      m AS (SELECT sum(n)::BIGINT AS nn,
          sum(n::HUGEINT * r1_nano)::DOUBLE AS s1,
          sum(n::HUGEINT * (1000000000 - r1_nano))::DOUBLE AS s2,
          sum(n::HUGEINT * r1_nano * x)::DOUBLE AS sx1,
          sum(n::HUGEINT * (1000000000 - r1_nano) * x)::DOUBLE AS sx2,
          sum(n::HUGEINT * r1_nano * x * x)::DOUBLE AS sxx1,
          sum(n::HUGEINT * (1000000000 - r1_nano) * x * x)::DOUBLE
            AS sxx2
        FROM resp)
      SELECT nn AS n,
        round(s1 / 1e9 / nn, 9) AS w1_new,
        round(sx1 / s1, 3) AS mu1_new,
        round(sqrt(sxx1 / s1 - (sx1 / s1) * (sx1 / s1)), 3)
          AS sigma1_new,
        round(sx2 / s2, 3) AS mu2_new,
        round(sqrt(sxx2 / s2 - (sx2 / s2) * (sx2 / s2)), 3)
          AS sigma2_new
      FROM m"""))

  // ---------- q333: Jarque–Bera normality test -------------------------

  /** Jarque–Bera normality screen of order totals per priority — the
    * assumption gate beside q307's Levene: JB = n/6·(S² + (K−3)²/4)
    * from sample skewness and kurtosis, against the 2-df upper-0.1 %
    * critical value. A fat-tailed or skewed group invalidates the
    * normal-theory intervals q163/q205 hand out — this query says so
    * BEFORE they run. Shape: two map-side passes (exact DECIMAL
    * means, then central moments with the ≤5-row mean broadcast
    * back); deviations pin to integer cents and the z²/z³/z⁴ sums are
    * DECIMAL(38)-lifted exact products, so S, K and JB are bit-stable
    * scalar math per group.
    */
  private val q333 = QueryDef(
    "q333_jarque_bera",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val means = Fixtures.table(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg((sum(col("o_totalprice").cast(DecimalType(18, 6)))
          .cast("double") / count(lit(1))).as("mean_g"))
      val z = Fixtures.table(s, dir, "orders")
        .join(broadcast(means), Seq("o_orderpriority"))
        .select(col("o_orderpriority"),
          expr("CAST(round((o_totalprice - mean_g) * 100.0) AS BIGINT)")
            .as("zc"))
      def dl(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
      val mom = z.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          (sum(dl(col("zc")) * dl(col("zc"))).cast("double")
            / count(lit(1))).as("m2"),
          (sum(dl(col("zc")) * dl(col("zc")) * dl(col("zc")))
            .cast("double") / count(lit(1))).as("m3"),
          (sum(dl(col("zc")) * dl(col("zc")) * dl(col("zc"))
            * dl(col("zc"))).cast("double") / count(lit(1))).as("m4"))
      mom.select(col("o_orderpriority"), col("n"),
          round(col("m3") / pow(col("m2"), 1.5), 9).as("skewness"),
          round(col("m4") / (col("m2") * col("m2")), 9).as("kurtosis"))
        .select(col("o_orderpriority"), col("n"), col("skewness"),
          col("kurtosis"),
          round(col("n") / 6.0 * (col("skewness") * col("skewness")
            + (col("kurtosis") - 3.0) * (col("kurtosis") - 3.0) / 4.0),
            6).as("jb_stat"),
          (col("n") / 6.0 * (col("skewness") * col("skewness")
            + (col("kurtosis") - 3.0) * (col("kurtosis") - 3.0) / 4.0)
            > 13.816).as("non_normal"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""WITH means AS (SELECT o_orderpriority,
          sum(CAST(o_totalprice AS DECIMAL(18,6)))::DOUBLE / count(*)
            AS mean_g
        FROM orders GROUP BY 1),
      z AS (SELECT o.o_orderpriority,
          round((o_totalprice - mean_g) * 100.0)::BIGINT AS zc
        FROM orders o JOIN means m
          ON o.o_orderpriority = m.o_orderpriority),
      mom AS (SELECT o_orderpriority, count(*)::BIGINT AS n,
          sum(zc::HUGEINT * zc)::DOUBLE / count(*) AS m2,
          sum(zc::HUGEINT * zc * zc)::DOUBLE / count(*) AS m3,
          sum(zc::HUGEINT * zc * zc * zc)::DOUBLE / count(*) AS m4
        FROM z GROUP BY 1),
      sk AS (SELECT o_orderpriority, n,
          round(m3 / pow(m2, 1.5), 9) AS skewness,
          round(m4 / (m2 * m2), 9) AS kurtosis
        FROM mom)
      SELECT o_orderpriority, n, skewness, kurtosis,
        round(n / 6.0 * (skewness * skewness
          + (kurtosis - 3.0) * (kurtosis - 3.0) / 4.0), 6) AS jb_stat,
        (n / 6.0 * (skewness * skewness
          + (kurtosis - 3.0) * (kurtosis - 3.0) / 4.0)) > 13.816
          AS non_normal
      FROM sk ORDER BY o_orderpriority"""))

  // ---------- q338: one ALS sweep (rank-1) -----------------------------

  /** One alternating-least-squares sweep of the rank-1 implicit-
    * feedback factorization of the customer × brand purchase matrix —
    * the recommender primitive in its deterministic, closed-form
    * slice (the q134/q330 "one exact step, no convergence loop"
    * contract): from v ≡ 1, the user-factor solve is u_c = Σ_b r_cb /
    * n_b(c), and the brand update v_b = Σ_c r_cb·u_c / Σ_c u_c² is
    * one least-squares division per brand. The emitted v is the
    * first-iteration "brand strength" — already the popularity-
    * debiased ordering a cold-start ranker uses. Shape: the rating
    * table is one fact pass (broadcast part dim, shuffle on customer
    * × brand); each solve is a keyed aggregate; u pins to micro ints
    * and the v numerator/denominator are DECIMAL-lifted exact sums.
    */
  private val q338 = QueryDef(
    "q338_als_sweep",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val r = Fixtures.table(s, dir, "lineitem")
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Fixtures.table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"), col("p_brand"))
        .agg(count(lit(1)).as("r"))
      val u = r.groupBy(col("o_custkey"))
        .agg(expr("CAST(round(sum(r) * 1e6 / count(1)) AS BIGINT)")
          .as("u_micro"))
      def dl(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
      r.join(u, Seq("o_custkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_customers"),
          sum(dl(col("r") * col("u_micro"))).cast("double").as("num"),
          sum(dl(col("u_micro")) * dl(col("u_micro"))).cast("double")
            .as("den"))
        .select(col("p_brand"), col("n_customers"),
          round(col("num") * 1e6 / col("den"), 9).as("v_strength"))
        .orderBy(col("p_brand"))
    },
    Some("""WITH r AS (SELECT o_custkey, p_brand, count(*)::BIGINT AS r
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2),
      u AS (SELECT o_custkey,
          round(sum(r)::BIGINT * 1e6 / count(*))::BIGINT AS u_micro
        FROM r GROUP BY 1)
      SELECT p_brand, count(*)::BIGINT AS n_customers,
        round(sum(r::HUGEINT * u_micro)::DOUBLE * 1e6
          / sum(u_micro::HUGEINT * u_micro)::DOUBLE, 9) AS v_strength
      FROM r JOIN u USING (o_custkey)
      GROUP BY p_brand ORDER BY p_brand"""))

  // ---------- q340: hub-attack robustness ------------------------------

  /** Targeted-attack robustness of the co-purchase graph: remove the
    * top-decile-degree hubs and measure what survives — edge loss and
    * newly-isolated nodes. A network whose connectivity collapses
    * under hub removal routes everything through few products (q326's
    * rich club made concrete as a failure mode); a robust one keeps
    * its periphery connected. The 90th-percentile degree cut is exact
    * over the BOUNDED degree histogram (q314 rule — a cumulative
    * window over ≤|distinct degrees| rows). Shape: degrees from one
    * edge-list aggregate, then ONE node-level stats pass (per node:
    * degree, own-hub flag, hub-neighbor count) from which every output
    * folds — surviving edges = Σ non-hub (deg − hub_nbrs) / 2, and
    * isolation is the folded condition n_hub_nbrs = deg (every
    * neighbor was a hub), no second pass over the edge list. The
    * DuckDB twin keeps the equivalent NOT IN form. All counts exact.
    */
  private val q340 = QueryDef(
    "q340_hub_attack",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val adj = copurchaseAdj(s, dir)
      val deg = copurchaseDegrees(s, dir)
      val hist = deg.groupBy(col("deg")).agg(count(lit(1)).as("n"))
      val wc = Window.orderBy(col("deg"))
      val cut = hist
        .withColumn("cn", sum(col("n")).over(wc))
        .crossJoin(broadcast(hist.agg(sum(col("n")).as("tn"))))
        .where(col("cn") * 10 >= col("tn") * 9)
        .agg(min(col("deg")).as("deg_cut"))
      // every metric folds out of ONE node-level stats table: per node
      // its degree, own-hub flag, and hub-neighbor count — the edge
      // list is touched exactly once (edges halve back out of the
      // doubled adjacency), instead of rebuilding the pair⋈deg⋈deg
      // pipeline per metric (measured 4× the cost at sf0.1)
      val nodeStats = adj
        .join(deg.select(col("node").as("nbr"), col("deg").as("nbr_deg")),
          Seq("nbr"))
        .crossJoin(broadcast(cut))
        .groupBy(col("node"))
        .agg(count(lit(1)).as("deg"),
          sum(when(col("nbr_deg") >= col("deg_cut"), 1L).otherwise(0L))
            .as("n_hub_nbrs"),
          first(col("deg_cut")).as("deg_cut"))
        .withColumn("is_hub", col("deg") >= col("deg_cut"))
      nodeStats.agg(
          count(lit(1)).as("n_nodes"),
          first(col("deg_cut")).as("deg_cut"),
          expr("sum(deg) div 2").as("n_edges"),
          expr("""sum(CASE WHEN NOT is_hub THEN deg - n_hub_nbrs
            ELSE 0 END) div 2""").as("n_surviving"),
          sum(when(!col("is_hub")
            && col("n_hub_nbrs") === col("deg"), 1L).otherwise(0L))
            .as("n_isolated"))
        .select(col("n_nodes"), col("deg_cut"), col("n_edges"),
          col("n_surviving"),
          round(lit(1.0) - col("n_surviving").cast("double")
            / col("n_edges"), 9).as("edge_loss"),
          col("n_isolated"),
          round(col("n_isolated").cast("double") / col("n_nodes"), 9)
            .as("isolation_rate"))
    },
    Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
          AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2),
      adj AS (SELECT part_a AS node, part_b AS nbr FROM pr
        UNION ALL SELECT part_b, part_a FROM pr),
      deg AS (SELECT node, count(*)::BIGINT AS deg FROM adj GROUP BY 1),
      hist AS (SELECT deg, count(*)::BIGINT AS n FROM deg GROUP BY 1),
      cut AS (SELECT min(deg) AS deg_cut FROM (SELECT deg,
          sum(n) OVER (ORDER BY deg) AS cn, sum(n) OVER () AS tn
        FROM hist) WHERE cn * 10 >= tn * 9),
      e AS (SELECT part_a, part_b, da.deg AS da, db.deg AS db
        FROM pr JOIN deg da ON part_a = da.node
        JOIN deg db ON part_b = db.node),
      st AS (SELECT count(*)::BIGINT AS n_edges,
          sum(CASE WHEN da < deg_cut AND db < deg_cut THEN 1 ELSE 0
            END)::BIGINT AS n_surviving
        FROM e, cut),
      alive AS (SELECT DISTINCT node FROM (
        SELECT part_a AS node FROM e, cut
          WHERE da < deg_cut AND db < deg_cut
        UNION ALL SELECT part_b FROM e, cut
          WHERE da < deg_cut AND db < deg_cut)),
      iso AS (SELECT count(*)::BIGINT AS n_isolated
        FROM deg, cut WHERE deg < deg_cut
          AND node NOT IN (SELECT node FROM alive)),
      nn AS (SELECT count(*)::BIGINT AS n_nodes FROM deg)
      SELECT n_nodes, deg_cut, n_edges, n_surviving,
        round(1.0 - n_surviving::DOUBLE / n_edges, 9) AS edge_loss,
        n_isolated,
        round(n_isolated::DOUBLE / n_nodes, 9) AS isolation_rate
      FROM st, iso, nn, cut"""))

  // ---------- q341: Qini uplift curve ----------------------------------

  /** Qini uplift curve — the eval that decides whether a TARGETING
    * model targets: rank lineitems by the q253 brand return-score,
    * and per score decile compare the return rate of the treated
    * (deep-discount) vs control arm; the cumulative treated-minus-
    * scaled-control gap IS the Qini curve, and a model with no uplift
    * signal flatlines even when its outcome AUC (q170) looks fine —
    * uplift ≠ prediction. Shape: the score is brand-level (bounded);
    * deciles come from the cumulative score-cell table (bounded
    * window, q306 class); per-decile arms are conditional aggregates
    * off ONE fact pass; the cumulative Qini is a second bounded
    * window. Rates pinned nano; counts exact int64.
    */
  private val q341 = QueryDef(
    "q341_qini_curve",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byBrand = Fixtures.table(s, dir, "lineitem")
        .select(col("l_partkey"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
      val prior = byBrand.agg(
        (sum(col("n_pos")).cast("double") / sum(col("n")).cast("double"))
          .as("prior"))
      val enc = byBrand.crossJoin(broadcast(prior))
        .select(col("p_brand"),
          expr("""CAST(round((CAST(n_pos AS DOUBLE) + 50.0 * prior)
            / (CAST(n AS DOUBLE) + 50.0) * 1e6) AS BIGINT)""")
            .as("conf_micro"), col("n"))
      // decile boundaries over the bounded brand-score table
      val wd = Window.orderBy(col("conf_micro").desc, col("p_brand"))
      val deciled = enc
        .withColumn("cum_n", sum(col("n")).over(wd))
        .crossJoin(broadcast(enc.agg(sum(col("n")).as("tn"))))
        .select(col("p_brand"),
          least(expr("(cum_n - 1) * 10 div tn"), lit(9L)).as("decile"))
      val cells = Fixtures.table(s, dir, "lineitem")
        .select(col("l_partkey"),
          when(col("l_discount") >= 0.06, 1L).otherwise(0L).as("t"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(deciled), Seq("p_brand"))
        .groupBy(col("decile"))
        .agg(sum(col("t")).as("nt"),
          sum(col("t") * col("y")).as("yt"),
          sum(lit(1L) - col("t")).as("nc"),
          sum((lit(1L) - col("t")) * col("y")).as("yc"))
      val wq = Window.orderBy(col("decile"))
      cells
        .withColumn("cyt", sum(col("yt")).over(wq))
        .withColumn("cnt", sum(col("nt")).over(wq))
        .withColumn("cyc", sum(col("yc")).over(wq))
        .withColumn("cnc", sum(col("nc")).over(wq))
        .select(col("decile"), col("nt"), col("nc"),
          round(col("yt").cast("double") / col("nt")
            - col("yc").cast("double") / col("nc"), 9).as("uplift"),
          round(col("cyt").cast("double")
            - col("cyc").cast("double") * col("cnt") / col("cnc"), 6)
            .as("qini"))
        .orderBy(col("decile"))
    },
    Some("""WITH b AS (SELECT p_brand, count(*)::BIGINT AS n,
          sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT
            AS n_pos
        FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
      g AS (SELECT sum(n_pos)::DOUBLE / sum(n)::DOUBLE AS prior FROM b),
      enc AS (SELECT p_brand,
          round((n_pos::DOUBLE + 50.0 * prior) / (n::DOUBLE + 50.0)
            * 1e6)::BIGINT AS conf_micro, n
        FROM b, g),
      tn AS (SELECT sum(n)::BIGINT AS tn FROM enc),
      dec AS (SELECT p_brand,
          least((sum(n) OVER (ORDER BY conf_micro DESC, p_brand) - 1)
            * 10 // tn, 9) AS decile
        FROM enc, tn),
      cells AS (SELECT decile,
          sum(t)::BIGINT AS nt, sum(t * y)::BIGINT AS yt,
          sum(1 - t)::BIGINT AS nc, sum((1 - t) * y)::BIGINT AS yc
        FROM (SELECT l_partkey,
            CASE WHEN l_discount >= 0.06 THEN 1 ELSE 0 END AS t,
            CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
          FROM lineitem) li
        JOIN part ON l_partkey = p_partkey
        JOIN dec USING (p_brand)
        GROUP BY 1)
      SELECT decile::BIGINT AS decile, nt, nc,
        round(yt::DOUBLE / nt - yc::DOUBLE / nc, 9) AS uplift,
        round(sum(yt) OVER (ORDER BY decile)::DOUBLE
          - sum(yc) OVER (ORDER BY decile)::DOUBLE
            * sum(nt) OVER (ORDER BY decile)
            / sum(nc) OVER (ORDER BY decile), 6) AS qini
      FROM cells ORDER BY decile"""))

  // ---------- q342: unit-price consistency audit -----------------------

  /** Unit-price consistency audit: the same part should sell at
    * (roughly) one unit price — a part whose extendedprice/quantity
    * spread across lines is wide signals data corruption, unmodeled
    * discount tiers, or price discrimination, and it is the first
    * thing a revenue-integrity review pulls. Per part: exact min/max/
    * spread of the cent-pinned unit price and the line count; emitted
    * are the top 25 widest-spread parts (TakeOrdered under a total
    * (spread, partkey) order — never a global sort) plus each one's
    * brand. Shape: unit price is in-scan arithmetic; one hash
    * aggregate keyed on partkey; broadcast dim for the brand.
    */
  private val q342 = QueryDef(
    "q342_price_consistency",
    (s, dir) => {
      val per = Fixtures.table(s, dir, "lineitem")
        .select(col("l_partkey"),
          expr("""CAST(round(l_extendedprice / l_quantity * 100.0)
            AS BIGINT)""").as("unit_cents"))
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_lines"),
          min(col("unit_cents")).as("min_cents"),
          max(col("unit_cents")).as("max_cents"))
        .where(col("n_lines") >= 3)
        .select(col("l_partkey"), col("n_lines"), col("min_cents"),
          col("max_cents"),
          (col("max_cents") - col("min_cents")).as("spread_cents"))
      per
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey").as("partkey"), col("p_brand"),
          col("n_lines"),
          round(col("min_cents").cast("double") / 100.0, 2)
            .as("min_price"),
          round(col("max_cents").cast("double") / 100.0, 2)
            .as("max_price"),
          col("spread_cents"))
        .orderBy(col("spread_cents").desc, col("partkey"))
        .limit(25)
        .select(col("partkey"), col("p_brand"), col("n_lines"),
          col("min_price"), col("max_price"),
          round(col("spread_cents").cast("double") / 100.0, 2)
            .as("spread"))
    },
    Some("""WITH per AS (SELECT l_partkey, count(*)::BIGINT AS n_lines,
          min(round(l_extendedprice / l_quantity * 100.0)::BIGINT)
            AS min_cents,
          max(round(l_extendedprice / l_quantity * 100.0)::BIGINT)
            AS max_cents
        FROM lineitem GROUP BY 1 HAVING count(*) >= 3),
      top AS (SELECT l_partkey AS partkey, p_brand, n_lines, min_cents,
          max_cents, max_cents - min_cents AS spread_cents
        FROM per JOIN part ON l_partkey = p_partkey
        ORDER BY spread_cents DESC, partkey LIMIT 25)
      SELECT partkey, p_brand, n_lines,
        round(min_cents::DOUBLE / 100.0, 2) AS min_price,
        round(max_cents::DOUBLE / 100.0, 2) AS max_price,
        round(spread_cents::DOUBLE / 100.0, 2) AS spread
      FROM top ORDER BY spread_cents DESC, partkey"""))

  // ---------- q345: price/volume revenue bridge ------------------------

  /** The FP&A revenue bridge per brand between the first and second
    * half of the order history: ΔR decomposed EXACTLY into a price
    * effect Δp·q₂ and a volume effect Δq·p₁ (the standard two-factor
    * bridge — the cross term is conventionally assigned to price),
    * answering "did we sell MORE or sell DEARER" where q186's YoY
    * growth only says "more revenue". The halves split at the
    * data-derived midpoint day (a 1-row broadcast scalar), so the
    * query needs no calendar constants. Shape: one lineitem⋈orders
    * pass (broadcast part dim) into (brand × half) cells; revenue
    * DECIMAL-exact cents, unit price pinned micro; the bridge is
    * per-brand scalar arithmetic whose two effects are emitted with
    * the exact ΔR they reconstruct.
    */
  private val q345 = QueryDef(
    "q345_revenue_bridge",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val lines = Fixtures.table(s, dir, "lineitem")
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .join(Fixtures.table(s, dir, "orders")
          .select(col("o_orderkey"), expr("""timestampdiff(MICROSECOND,
            TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate)
            div 86400000000""").as("oday")),
          col("l_orderkey") === col("o_orderkey"))
      val mid = lines.agg(expr("(min(oday) + max(oday)) div 2")
        .as("mid_day"))
      val cells = lines.crossJoin(broadcast(mid))
        .groupBy(col("p_brand"),
          when(col("oday") <= col("mid_day"), 1L).otherwise(2L)
            .as("half"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 6)))
            .cast("long").as("qty"),
          expr("""CAST(round(sum(CAST(l_extendedprice
            AS DECIMAL(18,6))) * 100.0) AS BIGINT)""").as("rev_cents"))
      val h1 = cells.where(col("half") === 1)
        .select(col("p_brand"), col("qty").as("q1"),
          col("rev_cents").as("r1"))
      val h2 = cells.where(col("half") === 2)
        .select(col("p_brand"), col("qty").as("q2"),
          col("rev_cents").as("r2"))
      h1.join(h2, Seq("p_brand"))
        .select(col("p_brand"),
          round(col("r1").cast("double") / 100.0, 2).as("rev_h1"),
          round(col("r2").cast("double") / 100.0, 2).as("rev_h2"),
          // volume effect at h1 price, price effect takes the rest —
          // the two reconstruct ΔR exactly in cents
          expr("""CAST(round((q2 - q1) * (CAST(r1 AS DOUBLE) / q1))
            AS BIGINT)""").as("vol_cents"))
        .select(col("p_brand"), col("rev_h1"), col("rev_h2"),
          round(col("vol_cents").cast("double") / 100.0, 2)
            .as("volume_effect"),
          round((expr("CAST(round(rev_h2 * 100.0) AS BIGINT)")
            - expr("CAST(round(rev_h1 * 100.0) AS BIGINT)")
            - col("vol_cents")).cast("double") / 100.0, 2)
            .as("price_effect"))
        .orderBy(col("p_brand"))
    },
    Some("""WITH lines AS (SELECT p_brand, l_quantity, l_extendedprice,
          epoch_us(o_orderdate) // 86400000000 AS oday
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey),
      mid AS (SELECT (min(oday) + max(oday)) // 2 AS mid_day
        FROM lines),
      cells AS (SELECT p_brand,
          CASE WHEN oday <= mid_day THEN 1 ELSE 2 END AS half,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS BIGINT) AS qty,
          round(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
            * 100.0)::BIGINT AS rev_cents
        FROM lines, mid GROUP BY 1, 2),
      j AS (SELECT a.p_brand, a.qty AS q1, a.rev_cents AS r1,
          b.qty AS q2, b.rev_cents AS r2
        FROM cells a JOIN cells b ON a.p_brand = b.p_brand
          AND a.half = 1 AND b.half = 2),
      v AS (SELECT p_brand,
          round(r1::DOUBLE / 100.0, 2) AS rev_h1,
          round(r2::DOUBLE / 100.0, 2) AS rev_h2,
          round((q2 - q1) * (r1::DOUBLE / q1))::BIGINT AS vol_cents
        FROM j)
      SELECT p_brand, rev_h1, rev_h2,
        round(vol_cents::DOUBLE / 100.0, 2) AS volume_effect,
        round((round(rev_h2 * 100.0)::BIGINT
          - round(rev_h1 * 100.0)::BIGINT - vol_cents)::DOUBLE / 100.0,
          2) AS price_effect
      FROM v ORDER BY p_brand"""))

  // ---------- q348: shrunken per-brand elasticity ----------------------

  /** Per-brand log-log price elasticity with James–Stein / empirical-
    * Bayes shrinkage — the panel version of q233's single OLS: a
    * thin brand's raw slope is noise, so each slope shrinks toward
    * the pooled slope by its reliability w = τ²/(τ² + se²), where τ²
    * (the TRUE between-brand slope variance) is the method-of-moments
    * estimate var(slopes) − mean(se²) floored at 0 — exactly the
    * partial pooling a hierarchical model would fit, in closed form.
    * Shape: ln(price)/ln(qty) pin to micro ints in-scan; per-brand
    * moment vectors are one aggregate (DECIMAL-lifted products); the
    * shrinkage stage runs on the bounded ≤|brands| table with its own
    * 1-row moment broadcast. Emitted: raw slope, se, weight, shrunk
    * slope per brand.
    */
  private val q348 = QueryDef(
    "q348_shrunk_elasticity",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      // spread (r15): two ln()s + decimal cross-moments per row ran
      // serial inside the single-row-group scan task
      val pts = Fixtures.spread(s, dir, "lineitem")
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"),
          expr("""CAST(round(ln(l_extendedprice / l_quantity) * 1e6)
            AS BIGINT)""").as("x"),
          expr("CAST(round(ln(l_quantity) * 1e6) AS BIGINT)").as("y"))
      def dl(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
      val mom = pts.groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(dl(col("x")) * dl(col("x"))).cast("double").as("sxx"),
          sum(dl(col("x")) * dl(col("y"))).cast("double").as("sxy"),
          sum(dl(col("y")) * dl(col("y"))).cast("double").as("syy"))
      // frozen (r15): `per` feeds both the pooled-moment broadcast and
      // the final projection — one |brands|-row table, two consumers
      val per = PlanCache.freeze(mom.select(col("p_brand"), col("n"),
          (col("sxx") - col("sx").cast("double") * col("sx") / col("n"))
            .as("vxx"),
          (col("sxy") - col("sx").cast("double") * col("sy") / col("n"))
            .as("vxy"),
          (col("syy") - col("sy").cast("double") * col("sy") / col("n"))
            .as("vyy"))
        .select(col("p_brand"), col("n"),
          (col("vxy") / col("vxx")).as("slope"),
          // se² = (SSE/(n-2)) / Sxx, SSE = Syy − Sxy²/Sxx
          (((col("vyy") - col("vxy") * col("vxy") / col("vxx"))
            / (col("n") - 2)) / col("vxx")).as("se2")))
      val pool = per.agg(count(lit(1)).as("k"),
        (sum(col("slope")) / count(lit(1))).as("slope_bar"),
        (sum(col("slope") * col("slope")) / count(lit(1))).as("s2bar"),
        (sum(col("se2")) / count(lit(1))).as("se2_bar"))
      per.crossJoin(broadcast(pool))
        .select(col("p_brand"), col("n"),
          round(col("slope"), 9).as("slope"),
          round(sqrt(col("se2")), 9).as("se"),
          greatest(col("s2bar") - col("slope_bar") * col("slope_bar")
            - col("se2_bar"), lit(0.0)).as("tau2"),
          col("slope_bar"), col("slope").as("raw"), col("se2"))
        .select(col("p_brand"), col("n"), col("slope"), col("se"),
          round(col("tau2") / (col("tau2") + col("se2")), 9).as("w"),
          round((col("tau2") / (col("tau2") + col("se2"))) * col("raw")
            + (lit(1.0) - col("tau2") / (col("tau2") + col("se2")))
              * col("slope_bar"), 9).as("slope_shrunk"))
        .orderBy(col("p_brand"))
    },
    Some("""WITH pts AS (SELECT p_brand,
          round(ln(l_extendedprice / l_quantity) * 1e6)::BIGINT AS x,
          round(ln(l_quantity) * 1e6)::BIGINT AS y
        FROM lineitem JOIN part ON l_partkey = p_partkey),
      mom AS (SELECT p_brand, count(*)::BIGINT AS n,
          sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
          sum(x::HUGEINT * x)::DOUBLE AS sxx,
          sum(x::HUGEINT * y)::DOUBLE AS sxy,
          sum(y::HUGEINT * y)::DOUBLE AS syy
        FROM pts GROUP BY 1),
      per AS (SELECT p_brand, n, vxy / vxx AS slope,
          ((vyy - vxy * vxy / vxx) / (n - 2)) / vxx AS se2
        FROM (SELECT p_brand, n,
            sxx - sx::DOUBLE * sx / n AS vxx,
            sxy - sx::DOUBLE * sy / n AS vxy,
            syy - sy::DOUBLE * sy / n AS vyy
          FROM mom)),
      pool AS (SELECT count(*)::BIGINT AS k,
          sum(slope) / count(*) AS slope_bar,
          sum(slope * slope) / count(*) AS s2bar,
          sum(se2) / count(*) AS se2_bar
        FROM per),
      shr AS (SELECT p_brand, n, slope, se2, slope_bar,
          greatest(s2bar - slope_bar * slope_bar - se2_bar, 0.0) AS tau2
        FROM per, pool)
      SELECT p_brand, n, round(slope, 9) AS slope,
        round(sqrt(se2), 9) AS se,
        round(tau2 / (tau2 + se2), 9) AS w,
        round((tau2 / (tau2 + se2)) * slope
          + (1.0 - tau2 / (tau2 + se2)) * slope_bar, 9) AS slope_shrunk
      FROM shr ORDER BY p_brand"""))

  // ---------- q349: distribution-free median CI ------------------------

  /** Order-statistic confidence interval for the median per market
    * segment — the distribution-free answer to "how sure is this
    * median": ranks ⌊n/2 − z√n/2⌋ and ⌈n/2 + 1 + z√n/2⌉ bracket the
    * true median with ≈95 % coverage REGARDLESS of the distribution
    * (binomial order-statistic argument) — no normality, no
    * bootstrap resampling (q195's heavier hammer). Values at those
    * ranks are exact over the q314 fixed $5 000 cells: per-segment
    * cumulative windows over a BOUNDED cell table, three rank picks.
    * All counts int64; the rank bounds are one sqrt.
    */
  private val q349 = QueryDef(
    "q349_median_ci",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cells = Fixtures.table(s, dir, "orders")
        .join(broadcast(Fixtures.table(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"),
          expr("CAST(floor(o_totalprice / 5000.0) AS BIGINT)").as("cell"))
        .groupBy(col("segment"), col("cell")).agg(count(lit(1)).as("n"))
      val wseg = Window.partitionBy(col("segment"))
      val wcum = Window.partitionBy(col("segment")).orderBy(col("cell"))
      val cum = cells
        .withColumn("tn", sum(col("n")).over(wseg))
        .withColumn("cn", sum(col("n")).over(wcum))
        .withColumn("r_lo", expr(
          "CAST(floor(tn / 2.0 - 1.959963985 * sqrt(CAST(tn AS DOUBLE))" +
            " / 2.0) AS BIGINT)"))
        .withColumn("r_hi", expr(
          "CAST(ceil(tn / 2.0 + 1.0 + 1.959963985 * " +
            "sqrt(CAST(tn AS DOUBLE)) / 2.0) AS BIGINT)"))
      def pick(rankCond: org.apache.spark.sql.Column, out: String) =
        cum.where(rankCond)
          .groupBy(col("segment"))
          .agg((min(col("cell")) * 5000).as(out))
      val med = pick(col("cn") * 2 >= col("tn"), "median")
      val lo = pick(col("cn") >= col("r_lo"), "ci_lo")
      val hi = pick(col("cn") >= col("r_hi"), "ci_hi")
      cells.groupBy(col("segment")).agg(sum(col("n")).as("n"))
        .join(med, Seq("segment")).join(lo, Seq("segment"))
        .join(hi, Seq("segment"))
        .orderBy(col("segment"))
    },
    Some("""WITH cells AS (SELECT c_mktsegment AS segment,
          floor(o_totalprice / 5000.0)::BIGINT AS cell,
          count(*)::BIGINT AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2),
      cum AS (SELECT segment, cell, n,
          sum(n) OVER (PARTITION BY segment)::BIGINT AS tn,
          sum(n) OVER (PARTITION BY segment ORDER BY cell)::BIGINT
            AS cn
        FROM cells),
      r AS (SELECT *,
          floor(tn / 2.0 - 1.959963985 * sqrt(tn::DOUBLE) / 2.0)::BIGINT
            AS r_lo,
          ceil(tn / 2.0 + 1.0 + 1.959963985 * sqrt(tn::DOUBLE)
            / 2.0)::BIGINT AS r_hi
        FROM cum)
      SELECT segment, any_value(tn) AS n,
        (SELECT min(cell) FROM r r2 WHERE r2.segment = r.segment
          AND cn * 2 >= tn) * 5000 AS median,
        (SELECT min(cell) FROM r r2 WHERE r2.segment = r.segment
          AND cn >= r_lo) * 5000 AS ci_lo,
        (SELECT min(cell) FROM r r2 WHERE r2.segment = r.segment
          AND cn >= r_hi) * 5000 AS ci_hi
      FROM r GROUP BY segment ORDER BY segment"""))

  // ---------- q350: two-way fixed-effects within estimator -------------

  /** The panel-data workhorse: does a bigger discount move quantity,
    * net of WHAT is sold (brand fixed effects) and WHEN (order-month
    * fixed effects)? The within (TWFE) estimator double-demeans both
    * variables — x̃ = x − x̄_brand − x̄_month + x̄ — and regresses the
    * residuals, absorbing both confounders without building dummy
    * columns; the naive no-FE slope rides along so the emitted gap IS
    * the confounding. Shape: one fact pass pins x (discount) and y
    * (quantity) to micro ints; the three mean tables are bounded
    * (|brands|, |months|, 1) broadcasts joined back; demeaned
    * products are DECIMAL-lifted exact; two scalar divisions finish.
    */
  private val q350 = QueryDef(
    "q350_twfe_within",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      // frozen + spread (r15): this 3-table panel is consumed FOUR
      // times (brand means, month means, grand means, demeaned pass) —
      // the whole fact join re-executed per consumer before (wall
      // 1.59 s ≈ cpu); one materialization now feeds all four
      val base = PlanCache.freeze(Fixtures.spread(s, dir, "lineitem")
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .join(Fixtures.table(s, dir, "orders")
          .select(col("o_orderkey"), expr("""timestampdiff(MICROSECOND,
            TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate)
            div 86400000000 div 30""").as("month")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("p_brand"), col("month"),
          expr("CAST(round(l_discount * 1e6) AS BIGINT)").as("x"),
          expr("CAST(round(l_quantity * 1e6) AS BIGINT)").as("y")))
      def means(k: Seq[String], px: String) = {
        val g = if (k.isEmpty) base.groupBy() else base.groupBy(
          k.map(col): _*)
        g.agg(expr("CAST(round(sum(x) * 1.0 / count(1)) AS BIGINT)")
            .as(s"mx_$px"),
          expr("CAST(round(sum(y) * 1.0 / count(1)) AS BIGINT)")
            .as(s"my_$px"))
      }
      val mb = means(Seq("p_brand"), "b")
      val mm = means(Seq("month"), "m")
      val mg = means(Seq.empty, "g")
      def dl(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
      val dem = base
        .join(broadcast(mb), Seq("p_brand"))
        .join(broadcast(mm), Seq("month"))
        .crossJoin(broadcast(mg))
        .select(
          (col("x") - col("mx_b") - col("mx_m") + col("mx_g")).as("xt"),
          (col("y") - col("my_b") - col("my_m") + col("my_g")).as("yt"),
          col("x"), col("y"))
      dem.agg(count(lit(1)).as("n"),
          sum(dl(col("xt")) * dl(col("yt"))).cast("double").as("sxy"),
          sum(dl(col("xt")) * dl(col("xt"))).cast("double").as("sxx"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(dl(col("x")) * dl(col("y"))).cast("double").as("rxy"),
          sum(dl(col("x")) * dl(col("x"))).cast("double").as("rxx"))
        .select(col("n"),
          round(col("sxy") / col("sxx"), 9).as("twfe_slope"),
          round((col("rxy") - col("sx").cast("double") * col("sy")
              / col("n"))
            / (col("rxx") - col("sx").cast("double") * col("sx")
              / col("n")), 9).as("naive_slope"))
    },
    Some("""WITH base AS (SELECT p_brand,
          epoch_us(o_orderdate) // 86400000000 // 30 AS month,
          round(l_discount * 1e6)::BIGINT AS x,
          round(l_quantity * 1e6)::BIGINT AS y
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey),
      mb AS (SELECT p_brand,
          round(sum(x) * 1.0 / count(*))::BIGINT AS mx_b,
          round(sum(y) * 1.0 / count(*))::BIGINT AS my_b
        FROM base GROUP BY 1),
      mm AS (SELECT month,
          round(sum(x) * 1.0 / count(*))::BIGINT AS mx_m,
          round(sum(y) * 1.0 / count(*))::BIGINT AS my_m
        FROM base GROUP BY 1),
      mg AS (SELECT round(sum(x) * 1.0 / count(*))::BIGINT AS mx_g,
          round(sum(y) * 1.0 / count(*))::BIGINT AS my_g
        FROM base),
      dem AS (SELECT x - mx_b - mx_m + mx_g AS xt,
          y - my_b - my_m + my_g AS yt, x, y
        FROM base
        JOIN mb USING (p_brand) JOIN mm USING (month)
        CROSS JOIN mg)
      SELECT count(*)::BIGINT AS n,
        round(sum(xt::HUGEINT * yt)::DOUBLE
          / sum(xt::HUGEINT * xt)::DOUBLE, 9) AS twfe_slope,
        round((sum(x::HUGEINT * y)::DOUBLE
            - sum(x)::DOUBLE * sum(y) / count(*))
          / (sum(x::HUGEINT * x)::DOUBLE
            - sum(x)::DOUBLE * sum(x) / count(*)), 9) AS naive_slope
      FROM dem"""))

  // ---------- q351: logistic Newton (IRLS) step ------------------------

  /** One Newton–Raphson step of the logistic regression of "returned"
    * on discount — the exact IRLS update q262's gradient stops short
    * of: from β = 0 (where p ≡ ½, so the weight matrix is ¼·I and
    * both gradient and Hessian are CLOSED-FORM moment sums), Δβ =
    * H⁻¹g with the 2×2 intercept+slope Hessian inverted in scalar
    * math. This is the deterministic one-step slice of the fit every
    * GLM library iterates (the q134/q330/q338 contract); the emitted
    * β₁ after one step already has the right sign and scale for a
    * screening read. Shape: ONE fact pass into five moment sums
    * (x pinned micro, DECIMAL-lifted squares), then pure arithmetic.
    */
  private val q351 = QueryDef(
    "q351_logit_newton_step",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val base = Fixtures.table(s, dir, "lineitem")
        .select(expr("CAST(round(l_discount * 1e6) AS BIGINT)").as("x"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      def dl(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
      base.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(dl(col("x")) * dl(col("x"))).cast("double").as("sxx"),
          sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("n"), col("sy").as("n_returned"),
          // g = Σ(y−½)·[1,x]; H = ¼·[[n, Σx],[Σx, Σx²]] (x in units
          // of 1e6 — β₁ is per unit discount after rescaling)
          (col("sy").cast("double") - col("n") / 2.0).as("g0"),
          (col("sxy").cast("double")
            - col("sx").cast("double") / 2.0).as("g1"),
          (col("n").cast("double") / 4.0).as("h00"),
          (col("sx").cast("double") / 4.0).as("h01"),
          (col("sxx") / 4.0).as("h11"))
        .select(col("n"), col("n_returned"),
          round((col("h11") * col("g0") - col("h01") * col("g1"))
            / (col("h00") * col("h11") - col("h01") * col("h01")), 9)
            .as("beta0_step"),
          round((col("h00") * col("g1") - col("h01") * col("g0"))
            / (col("h00") * col("h11") - col("h01") * col("h01"))
            * 1e6, 9).as("beta1_step"))
    },
    Some("""WITH base AS (SELECT
          round(l_discount * 1e6)::BIGINT AS x,
          CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem),
      mom AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
          sum(x::HUGEINT * x)::DOUBLE AS sxx, sum(y)::BIGINT AS sy,
          sum(x * y)::BIGINT AS sxy
        FROM base),
      g AS (SELECT n, sy AS n_returned,
          sy::DOUBLE - n / 2.0 AS g0,
          sxy::DOUBLE - sx::DOUBLE / 2.0 AS g1,
          n::DOUBLE / 4.0 AS h00, sx::DOUBLE / 4.0 AS h01,
          sxx / 4.0 AS h11
        FROM mom)
      SELECT n, n_returned,
        round((h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01), 9)
          AS beta0_step,
        round((h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01) * 1e6,
          9) AS beta1_step
      FROM g"""))

  // ---------- q352: intraclass correlation -----------------------------

  /** ICC(1) of order totals within customers — the variance-
    * components number that JUSTIFIES q327's design effect: how much
    * of order-value variance is BETWEEN customers (a stable per-
    * customer level) vs within? One-way random-effects ANOVA: MSB
    * and MSW from exact cent-pinned sums, the unequal-group-size
    * correction k₀ = (N − Σn_g²/N)/(G−1), and ICC = (MSB − MSW)/
    * (MSB + (k₀−1)·MSW). ICC ≈ 0 means orders are exchangeable
    * (cluster-robust machinery is overkill); high ICC means every
    * per-order analysis MUST cluster by customer. Shape: one
    * per-customer aggregate (corpus pass), per-group squared terms
    * DECIMAL-lifted, a 1-row combine, scalar math.
    */
  private val q352 = QueryDef(
    "q352_icc",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val per = Fixtures.table(s, dir, "orders")
        .select(col("o_custkey"),
          expr("CAST(round(o_totalprice) AS BIGINT)").as("y"))
      def dl(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
      val grp = per.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_g"), sum(col("y")).as("sy_g"),
          sum(dl(col("y")) * dl(col("y"))).cast("double").as("syy_g"))
      grp.agg(count(lit(1)).as("g"), sum(col("n_g")).as("n"),
          sum(col("sy_g")).as("sy"),
          sum(col("syy_g")).as("syy"),
          sum(dl(col("n_g")) * dl(col("n_g"))).cast("double").as("snn"),
          sum(expr("""CAST(round(CAST(sy_g AS DOUBLE) * sy_g / n_g)
            AS BIGINT)""")).as("sbg"))
        .select(col("g"), col("n"),
          ((col("sbg").cast("double")
            - col("sy").cast("double") * col("sy") / col("n"))
            / (col("g") - 1)).as("msb"),
          ((col("syy") - col("sbg").cast("double"))
            / (col("n") - col("g"))).as("msw"),
          ((col("n") - col("snn") / col("n")) / (col("g") - 1))
            .as("k0"))
        .select(col("g").as("n_customers"), col("n").as("n_orders"),
          round(col("msb"), 3).as("msb"), round(col("msw"), 3)
            .as("msw"),
          round(col("k0"), 6).as("k0"),
          round((col("msb") - col("msw"))
            / (col("msb") + (col("k0") - 1.0) * col("msw")), 9)
            .as("icc"))
    },
    Some("""WITH per AS (SELECT o_custkey,
          round(o_totalprice)::BIGINT AS y
        FROM orders),
      grp AS (SELECT o_custkey, count(*)::BIGINT AS n_g,
          sum(y)::BIGINT AS sy_g,
          sum(y::HUGEINT * y)::DOUBLE AS syy_g
        FROM per GROUP BY 1),
      c AS (SELECT count(*)::BIGINT AS g, sum(n_g)::BIGINT AS n,
          sum(sy_g)::BIGINT AS sy, sum(syy_g) AS syy,
          sum(n_g::HUGEINT * n_g)::DOUBLE AS snn,
          sum(round(sy_g::DOUBLE * sy_g / n_g)::BIGINT)::BIGINT AS sbg
        FROM grp),
      m AS (SELECT g, n,
          (sbg::DOUBLE - sy::DOUBLE * sy / n) / (g - 1) AS msb,
          (syy - sbg::DOUBLE) / (n - g) AS msw,
          (n - snn / n) / (g - 1) AS k0
        FROM c)
      SELECT g AS n_customers, n AS n_orders,
        round(msb, 3) AS msb, round(msw, 3) AS msw,
        round(k0, 6) AS k0,
        round((msb - msw) / (msb + (k0 - 1.0) * msw), 9) AS icc
      FROM m"""))

  // ---------- q353: Ledoit–Wolf covariance shrinkage -------------------

  /** Ledoit–Wolf shrinkage of the per-customer feature covariance —
    * the estimator every portfolio/embedding pipeline uses when the
    * sample covariance is noisy: S shrinks toward the scaled identity
    * μI with the DATA-DRIVEN intensity λ* = min(1, (b²/n)/d²), where
    * d² = ‖S − μI‖²_F and b² is the average squared per-sample
    * deviation ‖x xᵀ − S‖²_F — both computable from second and FOURTH
    * cross-moments, so the whole estimator is one moment pass + scalar
    * math (no resampling). Features: order count, spend (10 k$ units),
    * balance (100 $ units) — integer-pinned so the fourth moments stay
    * exact int64 with DECIMAL lift. Emitted: each covariance entry raw
    * and shrunk, with λ — the regularized matrix a downstream whitener
    * (q265) should use.
    */
  private val q353 = QueryDef(
    "q353_ledoit_wolf",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val feats = Fixtures.table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("x1"),
          expr("""CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6)))
            / 10000.0) AS BIGINT)""").as("x2"))
        .join(Fixtures.table(s, dir, "customer")
          .select(col("c_custkey"),
            expr("CAST(round(c_acctbal / 100.0) AS BIGINT)").as("x3")),
          col("o_custkey") === col("c_custkey"))
      val xs = Seq("x1", "x2", "x3")
      def dl(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
      // One-pass rewrite (r15, guide §2.4): the original computed means
      // in a first aggregate, broadcast them, re-read feats to center,
      // and aggregated again — two passes over feats plus a broadcast
      // barrier (measured wall 1.35 s vs 0.24 cpu-s: almost all stage
      // latency). The means are ROUNDED INTEGERS, so every centered
      // moment expands exactly in integer (DECIMAL(38,0)) arithmetic
      // over raw power sums collected in ONE aggregate:
      //   Σ(a−ma)(b−mb)   = Sab − ma·Sb − mb·Sa + n·ma·mb
      //   Σ(a−ma)²(b−mb)² = Sa²b² − 2mb·Sa²b − 2ma·Sab² + mb²·Sa²
      //                     + ma²·Sb² + 4mamb·Sab − 2mamb²·Sa
      //                     − 2ma²mb·Sb + n·ma²mb²
      // The double values cast at the end are casts of the SAME exact
      // integers the two-pass form produced, so results are bit-equal
      // (oracle unchanged, re-proven at the gate per run).
      val rawAggs: Seq[org.apache.spark.sql.Column] =
        count(lit(1)).as("n") +:
          (xs.map(a => sum(col(a)).as(s"r_$a")) ++
          (for (a <- xs; b <- xs if a <= b)
            yield sum(dl(col(a)) * dl(col(b))).as(s"p2_${a}_$b")) ++
          (for (a <- xs; b <- xs)
            yield sum(dl(col(a)) * dl(col(a)) * dl(col(b)))
              .as(s"p3_${a}_$b")) ++
          (for (a <- xs; b <- xs if a <= b)
            yield sum(dl(col(a)) * dl(col(a)) * dl(col(b)) * dl(col(b)))
              .as(s"p4_${a}_$b")))
      val raw = feats.agg(rawAggs.head, rawAggs.tail: _*)
        .select((col("*") +:
          xs.map(a => expr(s"CAST(round(r_$a * 1.0 / n) AS BIGINT)")
            .as(s"m_$a"))): _*)
      def D(x: String): String = s"CAST($x AS DECIMAL(38,0))"
      def p2(a: String, b: String): String = {
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        s"p2_${lo}_$hi"
      }
      val momCols: Seq[org.apache.spark.sql.Column] =
        col("n") +:
          ((for (a <- xs; b <- xs if a <= b) yield expr(
            s"""${D(p2(a, b))} - ${D(s"m_$a")} * ${D(s"r_$b")}
              - ${D(s"m_$b")} * ${D(s"r_$a")}
              + ${D("n")} * ${D(s"m_$a")} * ${D(s"m_$b")}""")
            .cast("double").as(s"s_${a}_$b")) ++
          (for (a <- xs; b <- xs if a <= b) yield expr(
            s"""${D(s"p4_${a}_$b")}
              - 2 * ${D(s"m_$b")} * ${D(s"p3_${a}_$b")}
              - 2 * ${D(s"m_$a")} * ${D(s"p3_${b}_$a")}
              + ${D(s"m_$b")} * ${D(s"m_$b")} * ${D(p2(a, a))}
              + ${D(s"m_$a")} * ${D(s"m_$a")} * ${D(p2(b, b))}
              + 4 * ${D(s"m_$a")} * ${D(s"m_$b")} * ${D(p2(a, b))}
              - 2 * ${D(s"m_$a")} * ${D(s"m_$b")} * ${D(s"m_$b")}
                * ${D(s"r_$a")}
              - 2 * ${D(s"m_$a")} * ${D(s"m_$a")} * ${D(s"m_$b")}
                * ${D(s"r_$b")}
              + ${D("n")} * ${D(s"m_$a")} * ${D(s"m_$a")}
                * ${D(s"m_$b")} * ${D(s"m_$b")}""")
            .cast("double").as(s"q_${a}_$b")))
      val mom = raw.select(momCols: _*)
      // r16 (guide §7.3 "very large plans … planning time itself the
      // bottleneck"): the old form inlined λ — itself built from the
      // full d²/b̄² expansions — TWELVE times into the 6-way explode
      // (measured: 1.44 s wall, 0.25 cpu-s — the wall was Catalyst
      // analyzing thousands of duplicated expression nodes, not
      // executors). Staged NAMED single-row columns below perform the
      // IDENTICAL double operations in the identical order (Catalyst
      // never reassociates fp arithmetic, and CollapseProject does not
      // re-inline non-cheap multiply-referenced aliases), so every
      // emitted double is bit-equal; only the expression-tree size
      // changes. Oracle SQL unchanged.
      val pairs = for (a <- xs; b <- xs if a <= b) yield (a, b)
      def covc(a: String, b: String): String = {
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        s"c_${lo}_$hi"
      }
      val covd = mom.select(col("n") +:
        (pairs.map { case (a, b) =>
          expr(s"(s_${a}_$b / n)").as(s"c_${a}_$b") } ++
        pairs.map { case (a, b) =>
          expr(s"(q_${a}_$b / n)").as(s"f_${a}_$b") }): _*)
      val withMu = covd.select(col("*"),
        expr("((c_x1_x1 + c_x2_x2 + c_x3_x3) / 3.0)").as("mu"))
      def q4c(a: String, b: String): String = {
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        s"f_${lo}_$hi"
      }
      // same 3×3 term ORDER as the inline form — fp sums must not
      // reassociate
      val d2 = xs.flatMap(a => xs.map(b =>
        if (a == b) s"(${covc(a, b)} - mu) * (${covc(a, b)} - mu)"
        else s"${covc(a, b)} * ${covc(a, b)}")).mkString(" + ")
      // b̄² = (1/n)·(Σ_ab q_ab/n − Σ_ab S_ab²): the average squared
      // Frobenius deviation ‖x xᵀ − S‖² of one CENTERED sample
      val b2 = "((" + xs.flatMap(a => xs.map(b =>
          s"${q4c(a, b)} - ${covc(a, b)} * ${covc(a, b)}"))
        .mkString(" + ") + ") / n)"
      val withLam = withMu.select(col("*"),
        expr(s"least(1.0, greatest(0.0, ($b2) / ($d2)))").as("lam"))
      withLam.select(expr(s"""explode(array(${pairs.map { case (a, b) =>
          s"""struct('${a}_$b' AS pair, CAST(round(${covc(a, b)}, 9)
            AS DOUBLE) AS s_raw, CAST(round(lam
            * (CASE WHEN '$a' = '$b' THEN mu ELSE 0.0 END)
            + (1.0 - lam) * ${covc(a, b)}, 9) AS DOUBLE) AS s_shrunk,
            CAST(round(lam, 9) AS DOUBLE) AS lambda)"""
        }.mkString(", ")}))""").as("r"))
        .select(col("r.pair").as("pair"), col("r.s_raw").as("s_raw"),
          col("r.s_shrunk").as("s_shrunk"), col("r.lambda").as("lambda"))
        .orderBy(col("pair"))
    },
    Some {
      val xs = Seq("x1", "x2", "x3")
      def cov(a: String, b: String): String = {
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        s"(s_${lo}_$hi / n)"
      }
      def q4(a: String, b: String): String = {
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        s"(q_${lo}_$hi / n)"
      }
      val mu = s"((${cov("x1", "x1")} + ${cov("x2", "x2")} " +
        s"+ ${cov("x3", "x3")}) / 3.0)"
      val d2 = xs.flatMap(a => xs.map(b =>
        if (a == b) s"(${cov(a, b)} - $mu) * (${cov(a, b)} - $mu)"
        else s"${cov(a, b)} * ${cov(a, b)}")).mkString(" + ")
      val b2 = "((" + xs.flatMap(a => xs.map(b =>
          s"${q4(a, b)} - ${cov(a, b)} * ${cov(a, b)}"))
        .mkString(" + ") + ") / n)"
      val lam = s"least(1.0, greatest(0.0, ($b2) / ($d2)))"
      val pairs = for (a <- xs; b <- xs if a <= b) yield (a, b)
      val selects = pairs.map { case (a, b) =>
        s"""SELECT '${a}_$b' AS pair,
          round(${cov(a, b)}, 9) AS s_raw,
          round($lam * (CASE WHEN '$a' = '$b' THEN $mu ELSE 0.0 END)
            + (1.0 - $lam) * ${cov(a, b)}, 9) AS s_shrunk,
          round($lam, 9) AS lambda
        FROM mom"""
      }.mkString(" UNION ALL ")
      val sums =
        (for (a <- xs; b <- xs if a <= b)
          yield s"sum($a::HUGEINT * $b)::DOUBLE AS s_${a}_$b") ++
        (for (a <- xs; b <- xs if a <= b)
          yield s"sum($a::HUGEINT * $a * $b * $b)::DOUBLE AS q_${a}_$b")
      s"""WITH feats AS (SELECT o.o_custkey,
          count(*)::BIGINT AS x1,
          round(sum(CAST(o_totalprice AS DECIMAL(18,6)))
            / 10000.0)::BIGINT AS x2,
          any_value(round(c_acctbal / 100.0)::BIGINT) AS x3
        FROM orders o JOIN customer ON o_custkey = c_custkey
        GROUP BY 1),
      means AS (SELECT round(sum(x1) * 1.0 / count(*))::BIGINT AS m1,
          round(sum(x2) * 1.0 / count(*))::BIGINT AS m2,
          round(sum(x3) * 1.0 / count(*))::BIGINT AS m3
        FROM feats),
      cent AS (SELECT x1 - m1 AS x1, x2 - m2 AS x2, x3 - m3 AS x3
        FROM feats, means),
      mom AS (SELECT count(*)::BIGINT AS n, ${sums.mkString(", ")}
        FROM cent)
      SELECT * FROM ($selects) ORDER BY pair"""
    })

  // ---------- q355: newsvendor stock level -----------------------------

  /** Newsvendor stocking per brand: the profit-optimal stock equals
    * the critical-ratile quantile of weekly demand — here the 80 %
    * service target (underage:overage = 4:1) — and the classic error
    * is computing it over weeks WITH demand only: the zero weeks are
    * exactly what overstocking protects against, so the demand
    * distribution is densified over the full brand × calendar-week
    * spine before the quantile. Shape: weekly demand is one fact
    * pass; the spine is bounded |brands| × |weeks| (broadcast week
    * list); the quantile is exact over the per-brand demand-value
    * histogram (bounded cumulative window, q314 rule). Output: the
    * stock level with the mean demand and realized service level it
    * implies.
    */
  private val q355 = QueryDef(
    "q355_newsvendor",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // frozen + spread (r15): `demand` (the only fact pass) feeds the
      // week spine AND the densified table, and `dense` feeds THREE
      // consumers (histogram, stats, service join) — each re-ran the
      // full fact aggregate before; both are bounded |brands × weeks|
      val demand = PlanCache.freeze(Fixtures.table(s, dir, "lineitem")
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"),
          expr("""timestampdiff(MICROSECOND,
            TIMESTAMP_NTZ '1970-01-01 00:00:00', l_shipdate)
            div 604800000000""").as("week"))
        .agg(expr("CAST(round(sum(l_quantity)) AS BIGINT)").as("d")))
      val weeks = demand.select(col("week")).distinct()
      val brands = Fixtures.table(s, dir, "part")
        .select(col("p_brand")).distinct()
      val dense = PlanCache.freeze(brands.crossJoin(weeks)
        .join(demand, Seq("p_brand", "week"), "left")
        .select(col("p_brand"), coalesce(col("d"), lit(0L)).as("d")))
      val hist = dense.groupBy(col("p_brand"), col("d"))
        .agg(count(lit(1)).as("n"))
      val wb = Window.partitionBy(col("p_brand"))
      val wc = Window.partitionBy(col("p_brand")).orderBy(col("d"))
      val cum = hist
        .withColumn("tn", sum(col("n")).over(wb))
        .withColumn("cn", sum(col("n")).over(wc))
      val stock = cum.where(col("cn") * 5 >= col("tn") * 4)
        .groupBy(col("p_brand")).agg(min(col("d")).as("stock"))
      val stats = dense.groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_weeks"),
          round(sum(col("d")).cast("double") / count(lit(1)), 6)
            .as("mean_demand"))
      val served = dense.join(broadcast(stock), Seq("p_brand"))
        .groupBy(col("p_brand"))
        .agg(first(col("stock")).as("stock"),
          round(sum(when(col("d") <= col("stock"), 1L).otherwise(0L))
            .cast("double") / count(lit(1)), 6).as("service_level"))
      stats.join(served, Seq("p_brand"))
        .select(col("p_brand"), col("n_weeks"), col("mean_demand"),
          col("stock"), col("service_level"))
        .orderBy(col("p_brand"))
    },
    Some("""WITH demand AS (SELECT p_brand,
          epoch_us(l_shipdate) // 604800000000 AS week,
          round(sum(l_quantity))::BIGINT AS d
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2),
      weeks AS (SELECT DISTINCT week FROM demand),
      brands AS (SELECT DISTINCT p_brand FROM part),
      dense AS (SELECT b.p_brand, coalesce(d, 0) AS d
        FROM brands b CROSS JOIN weeks w
        LEFT JOIN demand dm ON dm.p_brand = b.p_brand
          AND dm.week = w.week),
      hist AS (SELECT p_brand, d, count(*)::BIGINT AS n FROM dense
        GROUP BY 1, 2),
      cum AS (SELECT p_brand, d, n,
          sum(n) OVER (PARTITION BY p_brand)::BIGINT AS tn,
          sum(n) OVER (PARTITION BY p_brand ORDER BY d)::BIGINT AS cn
        FROM hist),
      stock AS (SELECT p_brand, min(d) AS stock FROM cum
        WHERE cn * 5 >= tn * 4 GROUP BY 1),
      stats AS (SELECT p_brand, count(*)::BIGINT AS n_weeks,
          round(sum(d)::DOUBLE / count(*), 6) AS mean_demand
        FROM dense GROUP BY 1),
      served AS (SELECT d2.p_brand, any_value(stock) AS stock,
          round(sum(CASE WHEN d <= stock THEN 1 ELSE 0 END)::DOUBLE
            / count(*), 6) AS service_level
        FROM dense d2 JOIN stock st ON d2.p_brand = st.p_brand
        GROUP BY 1)
      SELECT p_brand, n_weeks, mean_demand, stock, service_level
      FROM stats JOIN served USING (p_brand) ORDER BY p_brand"""))

  // ---------- q357: price-point clustering audit -----------------------

  /** Price-point forensics: real retail prices cluster at charm
    * endings (.99, .49, .00); synthetic, corrupted, or
    * currency-converted data does not. The audit measures the share
    * of line extended prices at each cent ending against the uniform
    * 1 % baseline and emits the top-10 endings by lift plus the χ²
    * against uniformity — a Benford-family (q160) screen on the OTHER
    * end of the number. Shape: one in-scan cents-ending projection
    * into a ≤100-cell aggregate; exact counts, scalar χ².
    */
  private val q357 = QueryDef(
    "q357_price_points",
    (s, dir) => {
      val ends = Fixtures.table(s, dir, "lineitem")
        .select(expr("CAST(round(l_extendedprice * 100.0) AS BIGINT)" +
          " % 100").as("ending"))
        .groupBy(col("ending")).agg(count(lit(1)).as("n"))
      val chi = ends.crossJoin(broadcast(ends.agg(sum(col("n"))
          .as("tn"))))
        .select(col("ending"), col("n"), col("tn"),
          expr("""CAST(round((n - tn / 100.0) * (n - tn / 100.0)
            / (tn / 100.0) * 1e6) AS BIGINT)""").as("chi_micro"))
      val chiTot = chi.agg(
        round(sum(col("chi_micro")).cast("double") / 1e6, 6)
          .as("chi2_uniform"))
      chi.crossJoin(broadcast(chiTot))
        .select(col("ending"), col("n"),
          round(col("n").cast("double") / col("tn"), 9).as("share"),
          round(col("n").cast("double") / col("tn") * 100.0, 6)
            .as("lift_vs_uniform"),
          col("chi2_uniform"))
        .orderBy(col("n").desc, col("ending"))
        .limit(10)
    },
    Some("""WITH ends AS (SELECT
          round(l_extendedprice * 100.0)::BIGINT % 100 AS ending,
          count(*)::BIGINT AS n
        FROM lineitem GROUP BY 1),
      tot AS (SELECT sum(n)::BIGINT AS tn FROM ends),
      chi AS (SELECT ending, n, tn,
          round((n - tn / 100.0) * (n - tn / 100.0) / (tn / 100.0)
            * 1e6)::BIGINT AS chi_micro
        FROM ends, tot),
      ct AS (SELECT round(sum(chi_micro)::DOUBLE / 1e6, 6)
          AS chi2_uniform FROM chi)
      SELECT ending, n,
        round(n::DOUBLE / tn, 9) AS share,
        round(n::DOUBLE / tn * 100.0, 6) AS lift_vs_uniform,
        chi2_uniform
      FROM chi, ct
      ORDER BY n DESC, ending LIMIT 10"""))

  // ---------- q358: one-way ANOVA F across priority classes -----------

  /** One-way ANOVA F on order value across the five priority classes —
    * the MEAN-shift companion to q307's Levene VARIANCE test on the
    * same grouping: together they answer "do priorities pay
    * differently, and with different spread?". Values are centered on
    * the broadcast grand mean and pinned to whole dollars (F is
    * shift-invariant, and dollar deviations keep sd²/n_g inside int64
    * through sf100 — the q307 rule), per-group moments ride
    * BIGINT/DECIMAL(38) exact sums, and the between/within split folds
    * from k=5 group rows into one moment row, so the statistic is pure
    * single-row expression math. Shape: one broadcast scalar + one
    * grouped pass over orders; shuffle carries k rows at any corpus
    * size.
    */
  private val q358 = QueryDef(
    "q358_anova_f",
    (s, dir) => {
      val gm = Fixtures.table(s, dir, "orders")
        .agg((sum(col("o_totalprice").cast(DecimalType(18, 6)))
          .cast("double") / count(lit(1))).as("gmean"))
      val d = Fixtures.table(s, dir, "orders")
        .crossJoin(broadcast(gm))
        .select(col("o_orderpriority"),
          expr("CAST(round(o_totalprice - gmean) AS BIGINT)").as("d"))
      val g = d.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_g"), sum(col("d")).as("sd"),
          sum((col("d") * col("d")).cast(DecimalType(38, 0))).as("sdd"))
      g.agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
          sum(col("sd")).as("td"),
          sum(col("sdd")).cast(DecimalType(38, 0)).as("tdd"),
          sum(expr("""CAST(round(CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)
            / CAST(n_g AS DOUBLE)) AS BIGINT)""")).as("sgm"))
        .select(col("k"), col("n"),
          round(((col("sgm").cast("double")
              - col("td").cast("double") * col("td").cast("double")
                / col("n").cast("double")) / (col("k") - 1))
            / ((col("tdd").cast("double") - col("sgm").cast("double"))
              / (col("n") - col("k"))), 9).as("f_stat"))
        .select(col("k"), col("n"), col("f_stat"),
          (col("f_stat") > 2.372).as("mean_shift"))
    },
    Some("""WITH gm AS (SELECT
          sum(CAST(o_totalprice AS DECIMAL(18,6)))::DOUBLE / count(*)
            AS gmean FROM orders),
      d AS (SELECT o_orderpriority,
          round(o_totalprice - gmean)::BIGINT AS d
        FROM orders, gm),
      g AS (SELECT o_orderpriority, count(*)::BIGINT AS n_g,
          sum(d)::BIGINT AS sd, sum(d::HUGEINT * d) AS sdd
        FROM d GROUP BY 1),
      t AS (SELECT count(*)::BIGINT AS k, sum(n_g)::BIGINT AS n,
          sum(sd)::BIGINT AS td, sum(sdd) AS tdd,
          sum(round(sd::DOUBLE * sd::DOUBLE / n_g::DOUBLE)::BIGINT)
            ::BIGINT AS sgm
        FROM g)
      SELECT k, n,
        round(((sgm - td::DOUBLE * td::DOUBLE / n::DOUBLE) / (k - 1))
          / ((tdd::DOUBLE - sgm) / (n - k)), 9) AS f_stat,
        (((sgm - td::DOUBLE * td::DOUBLE / n::DOUBLE) / (k - 1))
          / ((tdd::DOUBLE - sgm) / (n - k))) > 2.372 AS mean_shift
      FROM t"""))

  // ---------- q360: instrumental-variable (Wald) elasticity ------------

  /** Wald/IV estimate of the discount→quantity response with a
    * supplier-side cost-shifter instrument, next to the naive OLS
    * slope — the textbook cure when the regressor is endogenous
    * (discounts are SET in response to demand, so OLS mixes the two
    * directions; an instrument that moves discount but not demand
    * recovers the causal slope). The instrument here is the synthetic
    * supplier-parity coin (documented as a stand-in for any cost-side
    * shifter). Both estimators fold from ONE pass of exact integer
    * moments — discount pinned to basis points, quantity already
    * integral, cross-products DECIMAL(38)-lifted — into single-row
    * expression math: β_OLS from (n·Σxy − ΣxΣy)/(n·Σxx − Σx²), β_IV
    * from the two instrument-group mean differences (Wald form).
    * Shape: one scan, a 1-row aggregate, zero joins.
    */
  private val q360 = QueryDef(
    "q360_iv_wald",
    (s, dir) => {
      val li = Fixtures.table(s, dir, "lineitem")
        .select(
          expr("CAST(round(l_discount * 10000) AS BIGINT)").as("x_bp"),
          expr("CAST(l_quantity AS BIGINT)").as("y"),
          (col("l_suppkey") % 2 === 0).as("z"))
      val mom = li.agg(count(lit(1)).as("n"),
        sum(col("x_bp")).as("sx"), sum(col("y")).as("sy"),
        sum((col("x_bp") * col("x_bp")).cast(DecimalType(38, 0)))
          .as("sxx"),
        sum((col("x_bp") * col("y")).cast(DecimalType(38, 0)))
          .as("sxy"),
        sum(when(col("z"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("z"), col("x_bp")).otherwise(0L)).as("sx1"),
        sum(when(col("z"), col("y")).otherwise(0L)).as("sy1"))
      mom.select(col("n"), col("n1"),
          (col("sx1").cast("double") / col("n1")
            - (col("sx") - col("sx1")).cast("double")
              / (col("n") - col("n1"))).as("dx_bp"),
          (col("sy1").cast("double") / col("n1")
            - (col("sy") - col("sy1")).cast("double")
              / (col("n") - col("n1"))).as("dy"),
          ((col("n").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
            / (col("n").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double")))
            .as("b_bp"))
        .select(col("n"), col("n1"),
          round(col("b_bp") * 10000.0, 9).as("beta_ols"),
          round(col("dy") / col("dx_bp") * 10000.0, 9).as("beta_iv"),
          round(col("dx_bp") / 10000.0, 9).as("first_stage"))
    },
    Some("""WITH li AS (SELECT
          round(l_discount * 10000)::BIGINT AS x_bp,
          l_quantity::BIGINT AS y,
          l_suppkey % 2 = 0 AS z
        FROM lineitem),
      mom AS (SELECT count(*)::BIGINT AS n,
          sum(x_bp)::BIGINT AS sx, sum(y)::BIGINT AS sy,
          sum(x_bp::HUGEINT * x_bp) AS sxx,
          sum(x_bp::HUGEINT * y) AS sxy,
          sum(CASE WHEN z THEN 1 ELSE 0 END)::BIGINT AS n1,
          sum(CASE WHEN z THEN x_bp ELSE 0 END)::BIGINT AS sx1,
          sum(CASE WHEN z THEN y ELSE 0 END)::BIGINT AS sy1
        FROM li),
      e AS (SELECT n, n1,
          sx1::DOUBLE / n1 - (sx - sx1)::DOUBLE / (n - n1) AS dx_bp,
          sy1::DOUBLE / n1 - (sy - sy1)::DOUBLE / (n - n1) AS dy,
          (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
            / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
            AS b_bp
        FROM mom)
      SELECT n, n1,
        round(b_bp * 10000.0, 9) AS beta_ols,
        round(dy / dx_bp * 10000.0, 9) AS beta_iv,
        round(dx_bp / 10000.0, 9) AS first_stage
      FROM e"""))

  // ---------- q361: regression-discontinuity effect --------------------

  /** Sharp regression-discontinuity estimate at the zero-balance
    * cutoff: customers just below vs just above acctbal 0, outcome =
    * lifetime spend, local-linear fit on each side inside a ±$2000
    * bandwidth, effect = the jump between the two intercepts AT the
    * cutoff — the design a pipeline uses to measure a
    * threshold-triggered policy (credit hold, eligibility) without an
    * experiment. Running variable pinned to cents, outcome to whole
    * dollars (keeps r·y products well inside DECIMAL(38) at sf100);
    * each side's closed-form OLS folds from when()-pivoted exact
    * moments in ONE aggregate row, so the whole query is one
    * broadcast-join pass over customers plus single-row math. Orders
    * aggregate first (the q301 dedup-before-join rule), then join the
    * bounded customer dimension.
    */
  private val q361 = QueryDef(
    "q361_rdd_effect",
    (s, dir) => {
      val spend = Fixtures.table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 6)))
          .cast("double").as("spend"))
      val pts = Fixtures.table(s, dir, "customer")
        .join(spend, col("c_custkey") === col("o_custkey"), "left")
        .select(
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("r"),
          expr("CAST(round(coalesce(spend, 0.0)) AS BIGINT)").as("y"))
        .where(abs(col("r")) <= 200000L)
        .withColumn("rt", (col("r") >= 0L).cast("long"))
      val mom = pts.agg(
        sum(when(col("rt") === 0L, 1L).otherwise(0L)).as("nl"),
        sum(when(col("rt") === 0L, col("r")).otherwise(0L)).as("srl"),
        sum(when(col("rt") === 0L, col("y")).otherwise(0L)).as("syl"),
        sum(when(col("rt") === 0L, col("r") * col("r")).otherwise(0L)
          .cast(DecimalType(38, 0))).as("srrl"),
        sum(when(col("rt") === 0L, col("r") * col("y")).otherwise(0L)
          .cast(DecimalType(38, 0))).as("sryl"),
        sum(when(col("rt") === 1L, 1L).otherwise(0L)).as("nr"),
        sum(when(col("rt") === 1L, col("r")).otherwise(0L)).as("srr"),
        sum(when(col("rt") === 1L, col("y")).otherwise(0L)).as("syr"),
        sum(when(col("rt") === 1L, col("r") * col("r")).otherwise(0L)
          .cast(DecimalType(38, 0))).as("srrr"),
        sum(when(col("rt") === 1L, col("r") * col("y")).otherwise(0L)
          .cast(DecimalType(38, 0))).as("sryr"))
      mom.select(col("nl").as("n_left"), col("nr").as("n_right"),
          ((col("nl").cast("double") * col("sryl").cast("double")
            - col("srl").cast("double") * col("syl").cast("double"))
            / (col("nl").cast("double") * col("srrl").cast("double")
              - col("srl").cast("double") * col("srl").cast("double")))
            .as("bl"),
          ((col("nr").cast("double") * col("sryr").cast("double")
            - col("srr").cast("double") * col("syr").cast("double"))
            / (col("nr").cast("double") * col("srrr").cast("double")
              - col("srr").cast("double") * col("srr").cast("double")))
            .as("br"),
          col("srl"), col("syl"), col("nl"),
          col("srr"), col("syr"), col("nr"))
        .select(col("n_left"), col("n_right"),
          ((col("syl").cast("double")
            - col("bl") * col("srl").cast("double"))
            / col("nl").cast("double")).as("il"),
          ((col("syr").cast("double")
            - col("br") * col("srr").cast("double"))
            / col("nr").cast("double")).as("ir"))
        .select(col("n_left"), col("n_right"),
          round(col("il"), 6).as("int_left"),
          round(col("ir"), 6).as("int_right"),
          round(col("ir") - col("il"), 6).as("rd_effect"))
    },
    Some("""WITH spend AS (SELECT o_custkey,
          sum(CAST(o_totalprice AS DECIMAL(18,6)))::DOUBLE AS spend
        FROM orders GROUP BY 1),
      pts AS (SELECT round(c_acctbal * 100)::BIGINT AS r,
          round(coalesce(spend, 0.0))::BIGINT AS y,
          CASE WHEN round(c_acctbal * 100)::BIGINT >= 0
            THEN 1 ELSE 0 END AS rt
        FROM customer c LEFT JOIN spend s ON c.c_custkey = s.o_custkey
        WHERE abs(round(c_acctbal * 100)::BIGINT) <= 200000),
      mom AS (SELECT
          sum(CASE WHEN rt = 0 THEN 1 ELSE 0 END)::BIGINT AS nl,
          sum(CASE WHEN rt = 0 THEN r ELSE 0 END)::BIGINT AS srl,
          sum(CASE WHEN rt = 0 THEN y ELSE 0 END)::BIGINT AS syl,
          sum(CASE WHEN rt = 0 THEN r::HUGEINT * r ELSE 0 END) AS srrl,
          sum(CASE WHEN rt = 0 THEN r::HUGEINT * y ELSE 0 END) AS sryl,
          sum(CASE WHEN rt = 1 THEN 1 ELSE 0 END)::BIGINT AS nr,
          sum(CASE WHEN rt = 1 THEN r ELSE 0 END)::BIGINT AS srr,
          sum(CASE WHEN rt = 1 THEN y ELSE 0 END)::BIGINT AS syr,
          sum(CASE WHEN rt = 1 THEN r::HUGEINT * r ELSE 0 END) AS srrr,
          sum(CASE WHEN rt = 1 THEN r::HUGEINT * y ELSE 0 END) AS sryr
        FROM pts),
      sl AS (SELECT nl, nr, srl, syl, srr, syr,
          (nl::DOUBLE * sryl::DOUBLE - srl::DOUBLE * syl::DOUBLE)
            / (nl::DOUBLE * srrl::DOUBLE - srl::DOUBLE * srl::DOUBLE)
            AS bl,
          (nr::DOUBLE * sryr::DOUBLE - srr::DOUBLE * syr::DOUBLE)
            / (nr::DOUBLE * srrr::DOUBLE - srr::DOUBLE * srr::DOUBLE)
            AS br
        FROM mom),
      ic AS (SELECT nl AS n_left, nr AS n_right,
          (syl::DOUBLE - bl * srl::DOUBLE) / nl::DOUBLE AS il,
          (syr::DOUBLE - br * srr::DOUBLE) / nr::DOUBLE AS ir
        FROM sl)
      SELECT n_left, n_right,
        round(il, 6) AS int_left, round(ir, 6) AS int_right,
        round(ir - il, 6) AS rd_effect
      FROM ic"""))

  // ---------- q362: Theil–Sen robust slope (binned) --------------------

  /** Theil–Sen robust slope of spend on account balance next to the
    * OLS slope it robustifies — the median of pairwise slopes shrugs
    * off the outlier customers that drag OLS around. Exact pairwise
    * slopes over a corpus are pairs², so this runs the ESTIMATOR over
    * the q295 bounded grid (10×20 balance×spend cells with counts):
    * the slope multiset between cell centers weighted by nᵢ·nⱼ is a
    * ≤C(200,2) CONSTANT-size table at any corpus size, its weighted
    * median is exact over that table, and the only corpus-sized work
    * is the grid-build aggregate. The weighted-median prefix scan
    * rides RangeNtile.withRunningSums (per-shard prefix sums + a
    * boundary broadcast — no single-partition sort even though the
    * pair table is constant-bounded). Slopes pinned to micro units;
    * the weighted OLS twin folds from exact integer cell moments.
    */
  private val q362 = QueryDef(
    "q362_theil_sen",
    (s, dir) => {
      val spend = Fixtures.table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 6)))
          .cast("double").as("spend"))
      val cells = Fixtures.table(s, dir, "customer")
        .join(spend, col("c_custkey") === col("o_custkey"))
        .select(
          least(greatest(expr(
            "CAST(floor((c_acctbal + 1000.0) / 1100.0) AS BIGINT)"),
            lit(0L)), lit(9L)).as("bx"),
          least(greatest(expr(
            "CAST(floor(spend / 350000.0) AS BIGINT)"),
            lit(0L)), lit(19L)).as("by"))
        .groupBy(col("bx"), col("by")).agg(count(lit(1)).as("nij"))
      val a = cells.select(col("bx").as("ax"), col("by").as("ay"),
        col("nij").as("na"))
      val b = cells.select(col("bx").as("cx"), col("by").as("cy"),
        col("nij").as("nb"))
      val slopes = a.join(broadcast(b), col("cx") > col("ax"))
        .select(
          expr("""CAST(round((cy - ay) * 350000.0 / ((cx - ax) * 1100.0)
            * 1e6) AS BIGINT)""").as("slope_micro"),
          (col("na") * col("nb")).as("w"),
          col("ax"), col("ay"), col("cx"), col("cy"))
      val tot = slopes.agg(sum(col("w")).as("tw"),
        count(lit(1)).as("n_pairs"))
      val cum = RangeNtile.withRunningSums(slopes,
        Seq(col("slope_micro"), col("ax"), col("ay"), col("cx"),
          col("cy")),
        Seq("w" -> "cw"))
      val olsm = cells.select(col("nij"),
          (col("bx") * 1100L - 450L).as("xc"),
          (col("by") * 350000L + 175000L).as("yc"))
        .agg(sum(col("nij")).as("sw"),
          sum(col("nij") * col("xc")).as("swx"),
          sum((col("nij") * col("yc")).cast(DecimalType(38, 0)))
            .as("swy"),
          sum((col("nij") * col("xc") * col("xc"))
            .cast(DecimalType(38, 0))).as("swxx"),
          sum((col("nij") * col("xc") * col("yc"))
            .cast(DecimalType(38, 0))).as("swxy"))
      cum.crossJoin(broadcast(tot))
        .where(col("cw") * 2 >= col("tw")
          && (col("cw") - col("w")) * 2 < col("tw"))
        .crossJoin(broadcast(olsm))
        .select(col("n_pairs"), col("tw").as("w_pairs"),
          round(col("slope_micro").cast("double") / 1e6, 9)
            .as("slope_ts"),
          round((col("sw").cast("double") * col("swxy").cast("double")
            - col("swx").cast("double") * col("swy").cast("double"))
            / (col("sw").cast("double") * col("swxx").cast("double")
              - col("swx").cast("double") * col("swx").cast("double")),
            9).as("slope_ols"))
    },
    Some("""WITH spend AS (SELECT o_custkey,
          sum(CAST(o_totalprice AS DECIMAL(18,6)))::DOUBLE AS spend
        FROM orders GROUP BY 1),
      cells AS (SELECT
          least(greatest(floor((c_acctbal + 1000.0) / 1100.0)::BIGINT,
            0), 9) AS bx,
          least(greatest(floor(spend / 350000.0)::BIGINT, 0), 19)
            AS by,
          count(*)::BIGINT AS nij
        FROM customer JOIN spend ON c_custkey = o_custkey
        GROUP BY 1, 2),
      slopes AS (SELECT
          round((b.by - a.by) * 350000.0 / ((b.bx - a.bx) * 1100.0)
            * 1e6)::BIGINT AS slope_micro,
          (a.nij * b.nij)::BIGINT AS w,
          a.bx AS ax, a.by AS ay, b.bx AS cx, b.by AS cy
        FROM cells a JOIN cells b ON b.bx > a.bx),
      tot AS (SELECT sum(w)::BIGINT AS tw, count(*)::BIGINT AS n_pairs
        FROM slopes),
      cum AS (SELECT slope_micro, w,
          sum(w) OVER (ORDER BY slope_micro, ax, ay, cx, cy
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
            AS cw
        FROM slopes),
      med AS (SELECT slope_micro FROM cum, tot
        WHERE cw * 2 >= tw AND (cw - w) * 2 < tw),
      olsm AS (SELECT sum(nij)::BIGINT AS sw,
          sum(nij * (bx * 1100 - 450))::BIGINT AS swx,
          sum(nij::HUGEINT * (by * 350000 + 175000)) AS swy,
          sum(nij::HUGEINT * (bx * 1100 - 450) * (bx * 1100 - 450))
            AS swxx,
          sum(nij::HUGEINT * (bx * 1100 - 450) * (by * 350000 + 175000))
            AS swxy
        FROM cells)
      SELECT n_pairs, tw AS w_pairs,
        round(slope_micro::DOUBLE / 1e6, 9) AS slope_ts,
        round((sw::DOUBLE * swxy::DOUBLE - swx::DOUBLE * swy::DOUBLE)
          / (sw::DOUBLE * swxx::DOUBLE - swx::DOUBLE * swx::DOUBLE), 9)
          AS slope_ols
      FROM med, tot, olsm"""))

  // ---------- q363: Cochran–Armitage trend test ------------------------

  /** Cochran–Armitage trend test of return rate across the ORDERED
    * priority ladder (1-URGENT … 5-LOW, scored by their leading
    * digit) — the right test when the question is "does the rate rise
    * MONOTONICALLY with priority", where an unordered chi² (q109's
    * class) throws the ordering away. The binary outcome is "order
    * contains a returned line", built by aggregating lineitem to
    * distinct returned order keys BEFORE the join (the q301 rule —
    * the join carries one row per returned order, not one per line).
    * Per-class counts collapse to k=5 rows; the z statistic folds
    * from exact integer sums (scores are single digits, so every
    * product stays tiny) in single-row math. Shape: one lineitem
    * semi-reduction, one orders pass, k-row shuffle.
    */
  private val q363 = QueryDef(
    "q363_cochran_armitage",
    (s, dir) => {
      val ret = Fixtures.table(s, dir, "lineitem")
        .where(col("l_returnflag") === "R")
        .select(col("l_orderkey")).distinct()
        .withColumn("is_ret", lit(1L))
      val byClass = Fixtures.table(s, dir, "orders")
        .join(ret, col("o_orderkey") === col("l_orderkey"), "left")
        .select(
          expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)")
            .as("s_i"),
          coalesce(col("is_ret"), lit(0L)).as("ret"))
        .groupBy(col("s_i"))
        .agg(count(lit(1)).as("n_i"), sum(col("ret")).as("k_i"))
      val mom = byClass.agg(sum(col("n_i")).as("n"),
        sum(col("k_i")).as("kk"),
        sum(col("s_i") * col("k_i")).as("sk"),
        sum(col("s_i") * col("n_i")).as("sn"),
        sum(col("s_i") * col("s_i") * col("n_i")).as("ssn"))
      mom.select(col("n"), col("kk").as("k_ret"),
          (col("sk").cast("double") - col("kk").cast("double")
            * col("sn").cast("double") / col("n").cast("double"))
            .as("num"),
          (col("kk").cast("double") / col("n")
            * (lit(1.0) - col("kk").cast("double") / col("n"))
            * (col("ssn").cast("double") - col("sn").cast("double")
              * col("sn").cast("double") / col("n").cast("double")))
            .as("vr"))
        .select(col("n"), col("k_ret"),
          round(col("num") / sqrt(col("vr")), 6).as("z_trend"),
          (abs(col("num") / sqrt(col("vr"))) > 1.96).as("monotone"))
    },
    Some("""WITH ret AS (SELECT DISTINCT l_orderkey, 1::BIGINT AS is_ret
        FROM lineitem WHERE l_returnflag = 'R'),
      byc AS (SELECT
          CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS s_i,
          count(*)::BIGINT AS n_i,
          sum(coalesce(is_ret, 0))::BIGINT AS k_i
        FROM orders o LEFT JOIN ret r ON o.o_orderkey = r.l_orderkey
        GROUP BY 1),
      mom AS (SELECT sum(n_i)::BIGINT AS n, sum(k_i)::BIGINT AS kk,
          sum(s_i * k_i)::BIGINT AS sk, sum(s_i * n_i)::BIGINT AS sn,
          sum(s_i * s_i * n_i)::BIGINT AS ssn
        FROM byc),
      e AS (SELECT n, kk,
          sk::DOUBLE - kk::DOUBLE * sn::DOUBLE / n::DOUBLE AS num,
          kk::DOUBLE / n * (1.0 - kk::DOUBLE / n)
            * (ssn::DOUBLE - sn::DOUBLE * sn::DOUBLE / n::DOUBLE)
            AS vr
        FROM mom)
      SELECT n, kk AS k_ret,
        round(num / sqrt(vr), 6) AS z_trend,
        abs(num / sqrt(vr)) > 1.96 AS monotone
      FROM e"""))

  // ---------- q371: HITS hubs/authorities ------------------------------

  /** HITS hub/authority scores over the customer→supplier purchase
    * bipartite graph (2.5 mutual-reinforcement rounds): authorities
    * are suppliers bought by high-hub customers, hubs are customers
    * buying from high-authority suppliers — the ranking q60's
    * PageRank cannot express because it needs BOTH roles at once.
    * Every iteration is two hash-distributed edge aggregates (the
    * edge list is the distinct customer–supplier pair table, one
    * corpus-sized distinct then reused from cache); scores are pinned
    * to integer nano after each L1 normalization (the broadcast 1-row
    * total), so the fixed-point arithmetic is bit-identical across
    * engines and partitionings. Top-10 authorities via TakeOrdered.
    */
  private val q371 = QueryDef(
    "q371_hits",
    (s, dir) => {
      val edges = PlanCache.getOrBuild(s, dir, "cust_supp_edges")(
        Fixtures.table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
          .join(Fixtures.table(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
          .distinct())
      def l1norm(df: DataFrame, key: String, v: String): DataFrame = {
        // freeze BEFORE the total: the normalization reads df twice
        // (total + scale-back), and each of the 5 chained iterations
        // would otherwise DOUBLE the unrolled lineage — measured 30
        // re-executions of the edge join (15.8 s) without this, 5
        // with (1.6 s). Same idiom as q207's per-hop persist.
        val f = PlanCache.freeze(df)
        val tot = f.agg(sum(col(v)).cast(DecimalType(38, 0)).as("tot"))
        f.crossJoin(broadcast(tot))
          .select(col(key),
            expr(s"""CAST(round(CAST($v AS DOUBLE) * 1e9
              / CAST(tot AS DOUBLE)) AS BIGINT)""").as(v))
      }
      // h0 = 1 per customer → a1_s ∝ in-degree
      val a1 = l1norm(edges.groupBy(col("sp"))
        .agg(count(lit(1)).as("a")), "sp", "a")
      val h1 = l1norm(edges.join(a1, Seq("sp"))
        .groupBy(col("c")).agg(sum(col("a")).as("h")), "c", "h")
      val a2 = l1norm(edges.join(h1, Seq("c"))
        .groupBy(col("sp")).agg(sum(col("h")).as("a")), "sp", "a")
      val h2 = l1norm(edges.join(a2, Seq("sp"))
        .groupBy(col("c")).agg(sum(col("a")).as("h")), "c", "h")
      val a3 = l1norm(edges.join(h2, Seq("c"))
        .groupBy(col("sp")).agg(sum(col("h")).as("a")), "sp", "a")
      a3.select(col("sp").as("suppkey"),
          round(col("a").cast("double") / 1e9, 9).as("authority"))
        .orderBy(col("authority").desc, col("suppkey"))
        .limit(10)
    },
    Some("""WITH edges AS (SELECT DISTINCT o_custkey AS c,
          l_suppkey AS sp
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      a1r AS (SELECT sp, count(*)::BIGINT AS a FROM edges GROUP BY 1),
      a1 AS (SELECT sp, round(a::DOUBLE * 1e9
          / (SELECT sum(a)::DOUBLE FROM a1r))::BIGINT AS a FROM a1r),
      h1r AS (SELECT c, sum(a)::BIGINT AS h
        FROM edges JOIN a1 USING (sp) GROUP BY 1),
      h1 AS (SELECT c, round(h::DOUBLE * 1e9
          / (SELECT sum(h)::DOUBLE FROM h1r))::BIGINT AS h FROM h1r),
      a2r AS (SELECT sp, sum(h)::BIGINT AS a
        FROM edges JOIN h1 USING (c) GROUP BY 1),
      a2 AS (SELECT sp, round(a::DOUBLE * 1e9
          / (SELECT sum(a)::DOUBLE FROM a2r))::BIGINT AS a FROM a2r),
      h2r AS (SELECT c, sum(a)::BIGINT AS h
        FROM edges JOIN a2 USING (sp) GROUP BY 1),
      h2 AS (SELECT c, round(h::DOUBLE * 1e9
          / (SELECT sum(h)::DOUBLE FROM h2r))::BIGINT AS h FROM h2r),
      a3r AS (SELECT sp, sum(h)::BIGINT AS a
        FROM edges JOIN h2 USING (c) GROUP BY 1),
      a3 AS (SELECT sp, round(a::DOUBLE * 1e9
          / (SELECT sum(a)::DOUBLE FROM a3r))::BIGINT AS a FROM a3r)
      SELECT sp AS suppkey, round(a::DOUBLE / 1e9, 9) AS authority
      FROM a3
      ORDER BY authority DESC, suppkey LIMIT 10"""))

  // ---------- q372: closeness centrality from sampled sources ----------

  /** Closeness and harmonic centrality of 8 hash-sampled seed parts
    * over the co-purchase graph, BFS truncated at 4 hops — the
    * sampled-sources approximation that makes centrality affordable
    * when exact all-pairs BFS is |V|·|E| (the standard
    * Eppstein–Wang trade). BIT-PARALLEL multi-source BFS (the MS-BFS
    * idiom): the frontier is node-keyed with an 8-bit seed MASK, not
    * (seed, node) pairs — 8× fewer frontier rows, per-hop dedup is one
    * `bit_or` aggregate instead of distinct + anti-join, and
    * already-visited suppression is mask arithmetic
    * (`reached & ~visited`) inside the node-keyed merge join. The
    * adjacency is repartitioned on the join key once and persisted, so
    * each hop shuffles only the frontier side — at 100 TB that is 1
    * corpus shuffle instead of 4. Per-seed hop counts (8 rows/hop via
    * a broadcast bit-test join) are all the final fold needs:
    * n = Σcnt, Σdist = Σ h·cnt, harmonic pinned to exact micro
    * integers so the fold is order-independent. Truncation is a
    * documented horizon: scores are "within-4-hops" centralities, the
    * form monitoring uses.
    */
  private val q372 = QueryDef(
    "q372_closeness_sampled",
    (s, dir) => {
      import org.apache.spark.storage.StorageLevel
      // shared ≥2-support doubled adjacency (r16) — identical rows
      val edges = copurchaseEdges2(s, dir)
        .select(col("u").as("node"), col("v"))
        .repartition(col("node"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val seedBits = edges.select(col("node")).distinct()
        .where(expr(Portable.h32Spark("concat('close_', node)"))
          % 10 === 0)
        .orderBy(col("node")).limit(8)
        .select(col("node").as("seed"),
          (row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("node"))) - 1).as("bit"))
        .localCheckpoint(true)
      val seedMasks = seedBits.select(col("seed").as("node"),
        expr("shiftleft(CAST(1 AS BIGINT), bit)").as("mask"))
      // each hop's state is localCheckpoint(true)-truncated: the
      // newv/visited recursion otherwise grows the LOGICAL plan
      // Fibonacci-style (hop 4's analysis alone cost seconds on a
      // 2-row frontier when measured with lazy persist)
      var visited = seedMasks.select(col("node"),
        col("mask").as("vmask")).localCheckpoint(true)
      var frontier = seedMasks
      var hopStats = seedBits.select(col("seed"), lit(0L).as("dist"),
        lit(0L).as("cnt")).where(lit(false))
      for (h <- 1 to 4) {
        // reached-this-hop masks: one bit_or aggregate dedups both the
        // multi-edge fanout and the multi-seed overlap in one shuffle
        val reached = frontier.join(edges, "node")
          .groupBy(col("v").as("node"))
          .agg(expr("bit_or(mask)").as("rmask"))
        // newly-set bits only: mask arithmetic replaces the anti-join
        val newv = reached
          .join(visited, Seq("node"), "left_outer")
          .select(col("node"), expr(
            "rmask & ~coalesce(vmask, CAST(0 AS BIGINT))").as("mask"))
          .where(col("mask") =!= 0L)
          .localCheckpoint(true)
        hopStats = hopStats.unionAll(newv
          .join(broadcast(seedBits),
            expr("(mask & shiftleft(CAST(1 AS BIGINT), bit)) <> 0"))
          .groupBy(col("seed"))
          .agg(count(lit(1)).as("cnt"))
          .select(col("seed"), lit(h.toLong).as("dist"), col("cnt")))
        // visited merge: union + bit_or re-group (ONE node-keyed
        // shuffle; a full-outer join would shuffle both sides)
        visited = visited
          .unionAll(newv.select(col("node"), col("mask").as("vmask")))
          .groupBy(col("node"))
          .agg(expr("bit_or(vmask)").as("vmask"))
          .localCheckpoint(true)
        frontier = newv.select(col("node"), col("mask"))
      }
      val out = hopStats
        .groupBy(col("seed"))
        .agg(sum(col("cnt")).as("n_reached"),
          sum(col("dist") * col("cnt")).as("sum_dist"),
          sum(expr("cnt * (1000000 div dist)")).as("harm_micro"))
        .select(col("seed"), col("n_reached"), col("sum_dist"),
          round(col("n_reached").cast("double") / col("sum_dist"), 9)
            .as("closeness"),
          round(col("harm_micro").cast("double") / 1e6, 6)
            .as("harmonic"))
        .orderBy(col("seed"))
        .localCheckpoint(true)
      edges.unpersist(blocking = false): Unit
      out
    },
    Some(s"""WITH RECURSIVE it AS (SELECT DISTINCT l_orderkey AS o,
          l_partkey AS p FROM lineitem),
      pairs AS (SELECT a.p AS p1, b.p AS p2 FROM it a
        JOIN it b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= 2),
      edges AS (SELECT p1 AS u, p2 AS v FROM pairs
        UNION ALL SELECT p2, p1 FROM pairs),
      seeds AS (SELECT u AS seed FROM (SELECT DISTINCT u FROM edges)
        WHERE ${Portable.h32Duck("'close_' || u")} % 10 = 0
        ORDER BY u LIMIT 8),
      w(seed, node, dist) AS (
        SELECT seed, seed, 0 FROM seeds
        UNION ALL
        SELECT w.seed, e.v, w.dist + 1
        FROM w JOIN edges e ON e.u = w.node
        WHERE w.dist < 4),
      walk AS (SELECT seed, node, min(dist) AS dist FROM w
        GROUP BY 1, 2)
      SELECT seed, count(*)::BIGINT AS n_reached,
        sum(dist)::BIGINT AS sum_dist,
        round(count(*)::DOUBLE / sum(dist), 9) AS closeness,
        round(sum(1000000 // dist)::DOUBLE / 1e6, 6) AS harmonic
      FROM walk WHERE dist > 0
      GROUP BY seed ORDER BY seed"""))

  // ---------- q373: local clustering-coefficient distribution ----------

  /** Local clustering coefficient distribution over the co-purchase
    * graph — per node, the fraction of its neighbor pairs that are
    * themselves connected, binned into deciles: the
    * community-structure fingerprint that separates tight product
    * families (cc→1) from accessory hubs bridging unrelated baskets
    * (cc→0); complements q82 (triangle counts on the DOC graph) and
    * q226 (assortativity). Triangles enumerate once via the
    * degree-ordered orientation (the q82 Ortmann–Brandes shape —
    * two-hop fan-out bounded by O(√|E|) per node); per-node
    * membership counts explode the 3 corners; cc = 2T/(d(d−1)) stays
    * in EXACT integer arithmetic for the decile binning
    * ((20·T) div (d(d−1))), so no float crosses the bin edge
    * differently per engine. Zero-triangle nodes enter bin 0 via the
    * degree-side left join.
    */
  private val q373 = QueryDef(
    "q373_local_clustering",
    (s, dir) => {
      val deg = copurchaseDeg2(s, dir)
      val e = copurchaseOriented(s, dir)
      val tri = e.alias("e1")
        .join(e.alias("e2"), col("e1.b") === col("e2.a"))
        .join(e.alias("e3"),
          col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
        .select(col("e1.a").as("x"), col("e1.b").as("y"),
          col("e2.b").as("z"))
      val perNode = tri
        .select(explode(array(col("x"), col("y"), col("z"))).as("n"))
        .groupBy(col("n")).agg(count(lit(1)).as("t"))
      deg.where(col("d") >= 2)
        .join(perNode, Seq("n"), "left")
        .select(col("n"), col("d"), coalesce(col("t"), lit(0L)).as("t"))
        .select(least(lit(9L), expr("(20 * t) div (d * (d - 1))"))
          .as("cc_decile"),
          expr("""CAST(round(CAST(2 * t AS DOUBLE) / (d * (d - 1))
            * 1e6) AS BIGINT)""").as("cc_micro"))
        .groupBy(col("cc_decile"))
        .agg(count(lit(1)).as("n_nodes"),
          round(sum(col("cc_micro")).cast("double")
            / count(lit(1)) / 1e6, 6).as("avg_cc"))
        .orderBy(col("cc_decile"))
    },
    Some("""WITH it AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        FROM lineitem),
      pairs AS (SELECT a.p AS a, b.p AS b FROM it a
        JOIN it b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= 2),
      deg AS (SELECT n, count(*)::BIGINT AS d FROM (
          SELECT a AS n FROM pairs UNION ALL SELECT b FROM pairs)
        GROUP BY 1),
      e AS (SELECT CASE WHEN da.d < db.d
            OR (da.d = db.d AND p.a < p.b) THEN p.a ELSE p.b END AS a,
          CASE WHEN da.d < db.d OR (da.d = db.d AND p.a < p.b)
            THEN p.b ELSE p.a END AS b
        FROM pairs p
        JOIN deg da ON da.n = p.a JOIN deg db ON db.n = p.b),
      tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1
        JOIN e e2 ON e2.a = e1.b
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      pn AS (SELECT n, count(*)::BIGINT AS t FROM (
          SELECT x AS n FROM tri UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri)
        GROUP BY 1),
      cc AS (SELECT deg.n, deg.d, coalesce(pn.t, 0)::BIGINT AS t
        FROM deg LEFT JOIN pn ON pn.n = deg.n
        WHERE deg.d >= 2)
      SELECT least(9, (20 * t) // (d * (d - 1)))::BIGINT AS cc_decile,
        count(*)::BIGINT AS n_nodes,
        round(sum(round((2 * t)::DOUBLE / (d * (d - 1)) * 1e6)::BIGINT)
          ::DOUBLE / count(*) / 1e6, 6) AS avg_cc
      FROM cc
      GROUP BY 1 ORDER BY 1"""))

  // ---------- q374: empirical-Bayes rate shrinkage ---------------------

  /** Empirical-Bayes (method-of-moments) shrinkage of per-supplier
    * return rates toward the pooled rate — the small-sample fix for
    * every per-key rate leaderboard: a supplier with 3 lines and one
    * return is NOT a 33 % returner, and the shrunk estimate
    * (k + M·p̄)/(n + M) with prior strength M = p̄(1−p̄)/τ̂² says by
    * how much. τ̂² is the unweighted between-supplier variance of the
    * micro-pinned raw rates minus the average binomial sampling
    * variance (both folded from ONE exact-integer moment row;
    * reciprocals of n pinned to nano). The report is the ten largest
    * movers — where the prior changed the answer most — ordered by
    * pinned move size. Shape: one grouped pass over lineitem, a
    * 1-row broadcast, a second bounded pass over the supplier-rate
    * table.
    */
  private val q374 = QueryDef(
    "q374_eb_shrinkage",
    (s, dir) => {
      val rates = Fixtures.table(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("k"))
        .select(col("l_suppkey"), col("n"), col("k"),
          expr("CAST(round(CAST(k AS DOUBLE) * 1e6 / n) AS BIGINT)")
            .as("p_micro"),
          expr("1000000000 div n").as("inv_nano"))
      val mom = rates.agg(count(lit(1)).as("g"),
        sum(col("n")).as("tn"), sum(col("k")).as("tk"),
        sum(col("p_micro")).as("sp"),
        sum((col("p_micro") * col("p_micro"))
          .cast(DecimalType(38, 0))).as("spp"),
        sum(col("inv_nano")).as("sinv"))
      val prior = mom.select(
        (col("tk").cast("double") / col("tn")).as("pbar"),
        ((col("spp").cast("double")
          - col("sp").cast("double") * col("sp").cast("double")
            / col("g")) / (col("g") - 1) / 1e12).as("s2u"),
        (col("sinv").cast("double") / 1e9 / col("g")).as("invbar"))
        .select(col("pbar"),
          greatest(col("s2u") - col("pbar") * (lit(1.0) - col("pbar"))
            * col("invbar"), lit(1e-9)).as("tau2"))
        .select(col("pbar"),
          (col("pbar") * (lit(1.0) - col("pbar")) / col("tau2"))
            .as("m"))
      rates.crossJoin(broadcast(prior))
        .select(col("l_suppkey").as("suppkey"), col("n").as("n_lines"),
          round(col("p_micro").cast("double") / 1e6, 9).as("raw_rate"),
          round((col("k").cast("double") + col("m") * col("pbar"))
            / (col("n").cast("double") + col("m")), 9)
            .as("shrunk_rate"),
          expr("""CAST(round(abs((CAST(k AS DOUBLE) + m * pbar)
            / (CAST(n AS DOUBLE) + m) - CAST(p_micro AS DOUBLE) / 1e6)
            * 1e9) AS BIGINT)""").as("move_nano"))
        .select(col("suppkey"), col("n_lines"), col("raw_rate"),
          col("shrunk_rate"),
          round(col("move_nano").cast("double") / 1e9, 9).as("move"))
        .orderBy(col("move").desc, col("suppkey"))
        .limit(10)
    },
    Some("""WITH rates AS (SELECT l_suppkey, count(*)::BIGINT AS n,
          sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT
            AS k,
          round(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0
            END)::DOUBLE * 1e6 / count(*))::BIGINT AS p_micro,
          1000000000 // count(*) AS inv_nano
        FROM lineitem GROUP BY 1),
      mom AS (SELECT count(*)::BIGINT AS g, sum(n)::BIGINT AS tn,
          sum(k)::BIGINT AS tk, sum(p_micro)::BIGINT AS sp,
          sum(p_micro::HUGEINT * p_micro) AS spp,
          sum(inv_nano)::BIGINT AS sinv
        FROM rates),
      pr AS (SELECT tk::DOUBLE / tn AS pbar,
          (spp::DOUBLE - sp::DOUBLE * sp::DOUBLE / g) / (g - 1) / 1e12
            AS s2u,
          sinv::DOUBLE / 1e9 / g AS invbar
        FROM mom),
      pm AS (SELECT pbar,
          pbar * (1.0 - pbar)
            / greatest(s2u - pbar * (1.0 - pbar) * invbar, 1e-9) AS m
        FROM pr),
      sh AS (SELECT l_suppkey AS suppkey, n AS n_lines,
          round(p_micro::DOUBLE / 1e6, 9) AS raw_rate,
          round((k::DOUBLE + m * pbar) / (n::DOUBLE + m), 9)
            AS shrunk_rate,
          round(abs((k::DOUBLE + m * pbar) / (n::DOUBLE + m)
            - p_micro::DOUBLE / 1e6) * 1e9)::BIGINT AS move_nano
        FROM rates, pm)
      SELECT suppkey, n_lines, raw_rate, shrunk_rate,
        round(move_nano::DOUBLE / 1e9, 9) AS move
      FROM sh
      ORDER BY move DESC, suppkey LIMIT 10"""))

  // ---------- q375: physical-layout (sort-key) planner -----------------

  /** Sort/cluster-key planner: for four candidate layout keys, the
    * total number of per-group distinct values each co-accessed
    * column would collapse to — the zone-map/RLE proxy that predicts
    * how well min-max file skipping (q214's z-order audit measures
    * the CHOSEN layout; this ranks the CANDIDATES first) and
    * run-length encoding would work if the table were
    * bucketed+sorted by that key. Σ_groups distinct(col) is exactly
    * the number of value runs a group-sorted layout yields, so
    * rows/Σruns is the mean run length. Each candidate costs one
    * grouped two-distinct aggregate (hash-distributed; partial
    * aggregation applies), all four union into a 4-row report —
    * nothing here is ever larger than |groups|.
    */
  private val q375 = QueryDef(
    "q375_layout_planner",
    (s, dir) => {
      // r15: two rewrites were tried and MEASURED SLOWER, both kept out:
      // (a) a single-pass form (4-way key explode into one global
      // multi-distinct; 12 exchanges → 2 on paper) ran 1.65 → 4.02 s —
      // the union's four branches execute concurrently inside one job,
      // and the collapse serialized a 3× Expand of the 4×-exploded rows
      // through one shuffle; (b) spread() on the shared scan also
      // regressed (the Expand is memory-bound, and 4 branches × 32
      // tasks oversubscribe bandwidth). Original shape retained.
      val li = Fixtures.table(s, dir, "lineitem")
      def cand(name: String, key: org.apache.spark.sql.Column)
          : DataFrame =
        li.select(key.as("k"), col("l_orderkey"), col("l_partkey"))
          .groupBy(col("k"))
          .agg(countDistinct(col("l_orderkey")).as("r_ok"),
            countDistinct(col("l_partkey")).as("r_pk"),
            count(lit(1)).as("rows_g"))
          .agg(lit(name).as("candidate"),
            count(lit(1)).as("n_groups"),
            sum(col("r_ok")).as("runs_orderkey"),
            sum(col("r_pk")).as("runs_partkey"),
            sum(col("rows_g")).as("n_rows"))
      val rep = cand("flag_status",
          concat(col("l_returnflag"), col("l_linestatus")))
        .unionAll(cand("part_bucket", expr("l_partkey div 100")))
        .unionAll(cand("ship_month",
          expr("year(l_shipdate) * 100 + month(l_shipdate)")))
        .unionAll(cand("supplier", col("l_suppkey")))
      rep.select(col("candidate"), col("n_groups"),
          col("runs_orderkey"), col("runs_partkey"),
          round(col("n_rows").cast("double") * 2.0
            / (col("runs_orderkey") + col("runs_partkey")), 6)
            .as("mean_run_len"))
        .orderBy(col("candidate"))
    },
    Some("""WITH c1 AS (SELECT 'flag_status' AS candidate,
          count(*)::BIGINT AS n_groups,
          sum(r_ok)::BIGINT AS runs_orderkey,
          sum(r_pk)::BIGINT AS runs_partkey,
          sum(rows_g)::BIGINT AS n_rows
        FROM (SELECT l_returnflag || l_linestatus AS k,
            count(DISTINCT l_orderkey)::BIGINT AS r_ok,
            count(DISTINCT l_partkey)::BIGINT AS r_pk,
            count(*)::BIGINT AS rows_g
          FROM lineitem GROUP BY 1)),
      c2 AS (SELECT 'part_bucket', count(*)::BIGINT,
          sum(r_ok)::BIGINT, sum(r_pk)::BIGINT, sum(rows_g)::BIGINT
        FROM (SELECT l_partkey // 100 AS k,
            count(DISTINCT l_orderkey)::BIGINT AS r_ok,
            count(DISTINCT l_partkey)::BIGINT AS r_pk,
            count(*)::BIGINT AS rows_g
          FROM lineitem GROUP BY 1)),
      c3 AS (SELECT 'ship_month', count(*)::BIGINT,
          sum(r_ok)::BIGINT, sum(r_pk)::BIGINT, sum(rows_g)::BIGINT
        FROM (SELECT year(l_shipdate) * 100 + month(l_shipdate) AS k,
            count(DISTINCT l_orderkey)::BIGINT AS r_ok,
            count(DISTINCT l_partkey)::BIGINT AS r_pk,
            count(*)::BIGINT AS rows_g
          FROM lineitem GROUP BY 1)),
      c4 AS (SELECT 'supplier', count(*)::BIGINT,
          sum(r_ok)::BIGINT, sum(r_pk)::BIGINT, sum(rows_g)::BIGINT
        FROM (SELECT l_suppkey AS k,
            count(DISTINCT l_orderkey)::BIGINT AS r_ok,
            count(DISTINCT l_partkey)::BIGINT AS r_pk,
            count(*)::BIGINT AS rows_g
          FROM lineitem GROUP BY 1)),
      u AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2
        UNION ALL SELECT * FROM c3 UNION ALL SELECT * FROM c4)
      SELECT candidate, n_groups, runs_orderkey, runs_partkey,
        round(n_rows::DOUBLE * 2.0 / (runs_orderkey + runs_partkey), 6)
          AS mean_run_len
      FROM u ORDER BY candidate"""))

  // ---------- q383: covariate-balance (SMD) diagnostics ----------------

  /** Standardized-mean-difference balance table: within each market
    * segment, do high-priority and normal orders differ on price and
    * customer balance? — the diagnostic an observational-causal
    * pipeline (q302's stratified ATE, q255's DiD) runs FIRST, because
    * an ATE over unbalanced strata is confounded no matter the
    * estimator. SMD = (m₁−m₀)/√((v₁+v₀)/2), flagged at the standard
    * 0.1 threshold. One grouped pass per stratum with
    * treatment-pivoted exact moments (cents-pinned, DECIMAL(38)
    * second moments); the fold to SMDs is per-row math on k=5
    * bounded stratum rows.
    */
  private val q383 = QueryDef(
    "q383_smd_balance",
    (s, dir) => {
      val base = Fixtures.table(s, dir, "orders")
        .join(Fixtures.table(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("stratum"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L).as("tr"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("pr"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("ab"))
      def mom(v: String, t: Int, out: String) = Seq(
        sum(when(col("tr") === t, col(v)).otherwise(0L)).as(s"s_$out"),
        sum(when(col("tr") === t, col(v) * col(v)).otherwise(0L)
          .cast(DecimalType(38, 0))).as(s"ss_$out"))
      val aggs = Seq(sum(col("tr")).as("n1"),
        (count(lit(1)) - sum(col("tr"))).as("n0")) ++
        mom("pr", 1, "pr1") ++ mom("pr", 0, "pr0") ++
        mom("ab", 1, "ab1") ++ mom("ab", 0, "ab0")
      val g = base.groupBy(col("stratum"))
        .agg(aggs.head, aggs.tail: _*)
      def smd(a: String, b: String) = {
        val m1 = col(s"s_$a").cast("double") / col("n1")
        val m0 = col(s"s_$b").cast("double") / col("n0")
        val v1 = (col(s"ss_$a").cast("double")
          - col(s"s_$a").cast("double") * col(s"s_$a").cast("double")
            / col("n1")) / (col("n1") - 1)
        val v0 = (col(s"ss_$b").cast("double")
          - col(s"s_$b").cast("double") * col(s"s_$b").cast("double")
            / col("n0")) / (col("n0") - 1)
        (m1 - m0) / sqrt((v1 + v0) / 2.0)
      }
      g.select(col("stratum"), col("n1"), col("n0"),
          round(smd("pr1", "pr0"), 6).as("smd_price"),
          round(smd("ab1", "ab0"), 6).as("smd_balance"))
        .select(col("stratum"), col("n1"), col("n0"), col("smd_price"),
          col("smd_balance"),
          (abs(col("smd_price")) < 0.1
            && abs(col("smd_balance")) < 0.1).as("balanced"))
        .orderBy(col("stratum"))
    },
    Some("""WITH base AS (SELECT c_mktsegment AS stratum,
          CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END AS tr,
          round(o_totalprice * 100)::BIGINT AS pr,
          round(c_acctbal * 100)::BIGINT AS ab
        FROM orders JOIN customer ON o_custkey = c_custkey),
      g AS (SELECT stratum, sum(tr)::BIGINT AS n1,
          (count(*) - sum(tr))::BIGINT AS n0,
          sum(CASE WHEN tr = 1 THEN pr ELSE 0 END)::BIGINT AS s_pr1,
          sum(CASE WHEN tr = 1 THEN pr::HUGEINT * pr ELSE 0 END)
            AS ss_pr1,
          sum(CASE WHEN tr = 0 THEN pr ELSE 0 END)::BIGINT AS s_pr0,
          sum(CASE WHEN tr = 0 THEN pr::HUGEINT * pr ELSE 0 END)
            AS ss_pr0,
          sum(CASE WHEN tr = 1 THEN ab ELSE 0 END)::BIGINT AS s_ab1,
          sum(CASE WHEN tr = 1 THEN ab::HUGEINT * ab ELSE 0 END)
            AS ss_ab1,
          sum(CASE WHEN tr = 0 THEN ab ELSE 0 END)::BIGINT AS s_ab0,
          sum(CASE WHEN tr = 0 THEN ab::HUGEINT * ab ELSE 0 END)
            AS ss_ab0
        FROM base GROUP BY 1),
      e AS (SELECT stratum, n1, n0,
          round((s_pr1::DOUBLE / n1 - s_pr0::DOUBLE / n0)
            / sqrt(((ss_pr1::DOUBLE - s_pr1::DOUBLE * s_pr1::DOUBLE
              / n1) / (n1 - 1)
              + (ss_pr0::DOUBLE - s_pr0::DOUBLE * s_pr0::DOUBLE / n0)
                / (n0 - 1)) / 2.0), 6) AS smd_price,
          round((s_ab1::DOUBLE / n1 - s_ab0::DOUBLE / n0)
            / sqrt(((ss_ab1::DOUBLE - s_ab1::DOUBLE * s_ab1::DOUBLE
              / n1) / (n1 - 1)
              + (ss_ab0::DOUBLE - s_ab0::DOUBLE * s_ab0::DOUBLE / n0)
                / (n0 - 1)) / 2.0), 6) AS smd_balance
        FROM g)
      SELECT stratum, n1, n0, smd_price, smd_balance,
        (abs(smd_price) < 0.1 AND abs(smd_balance) < 0.1) AS balanced
      FROM e ORDER BY stratum"""))

  // ---------- q385: Cliff's delta effect size --------------------------

  /** Cliff's delta between purchase-event and view-event value
    * distributions — the ordinal effect size that answers "HOW MUCH
    * do purchases run higher", where q254's Mann–Whitney only answers
    * "do they". δ = P(a>b) − P(a<b) over all cross-pairs, computed
    * EXACTLY over the bounded 40-bin grid the q295/q365 discipline
    * prescribes (within-bin pairs count as ties — the documented
    * binned approximation): dominance sums are products of bin
    * counts, so the corpus-sized work is one grouped pass and the
    * cross-pair fold is a constant 40×40 broadcast join in exact
    * int64/DECIMAL arithmetic. Magnitude labels use the standard
    * 0.147/0.33/0.474 cuts.
    */
  private val q385 = QueryDef(
    "q385_cliffs_delta",
    (s, dir) => {
      val vals = Fixtures.table(s, dir, "events")
        .where(col("event_type").isin("purchase", "view"))
        .select((col("event_type") === "purchase").as("is_a"),
          col("value"))
      val rng = vals.agg(min(col("value")).as("mn"),
        max(col("value")).as("mx"))
      val bins = vals.crossJoin(broadcast(rng))
        .select(least(lit(39L), greatest(lit(0L),
          expr("CAST(floor((value - mn) * 40.0 / (mx - mn)) AS BIGINT)")))
          .as("bin"), col("is_a"))
        .groupBy(col("bin"))
        .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("na"),
          sum(when(!col("is_a"), 1L).otherwise(0L)).as("nb"))
      val a = bins.select(col("bin").as("ba"), col("na"))
      val b = bins.select(col("bin").as("bb"), col("nb"))
      val dom = a.join(broadcast(b), lit(true))
        .agg(
          sum(when(col("ba") > col("bb"), col("na") * col("nb"))
            .otherwise(0L).cast(DecimalType(38, 0))).as("gt"),
          sum(when(col("ba") < col("bb"), col("na") * col("nb"))
            .otherwise(0L).cast(DecimalType(38, 0))).as("lt"),
          sum((col("na") * col("nb")).cast(DecimalType(38, 0)))
            .as("tot"))
      dom.select(
          round((col("gt").cast("double") - col("lt").cast("double"))
            / col("tot").cast("double"), 9).as("delta"))
        .select(col("delta"),
          when(abs(col("delta")) < 0.147, "negligible")
            .when(abs(col("delta")) < 0.33, "small")
            .when(abs(col("delta")) < 0.474, "medium")
            .otherwise("large").as("magnitude"))
    },
    Some("""WITH vals AS (SELECT event_type = 'purchase' AS is_a, value
        FROM events WHERE event_type IN ('purchase', 'view')),
      rng AS (SELECT min(value) AS mn, max(value) AS mx FROM vals),
      bins AS (SELECT least(39, greatest(0,
            floor((value - mn) * 40.0 / (mx - mn))))::BIGINT AS bin,
          sum(CASE WHEN is_a THEN 1 ELSE 0 END)::BIGINT AS na,
          sum(CASE WHEN is_a THEN 0 ELSE 1 END)::BIGINT AS nb
        FROM vals, rng GROUP BY 1),
      dom AS (SELECT
          sum(CASE WHEN a.bin > b.bin
            THEN a.na::HUGEINT * b.nb ELSE 0 END) AS gt,
          sum(CASE WHEN a.bin < b.bin
            THEN a.na::HUGEINT * b.nb ELSE 0 END) AS lt,
          sum(a.na::HUGEINT * b.nb) AS tot
        FROM bins a CROSS JOIN bins b),
      e AS (SELECT round((gt::DOUBLE - lt::DOUBLE) / tot::DOUBLE, 9)
          AS delta FROM dom)
      SELECT delta,
        CASE WHEN abs(delta) < 0.147 THEN 'negligible'
          WHEN abs(delta) < 0.33 THEN 'small'
          WHEN abs(delta) < 0.474 THEN 'medium'
          ELSE 'large' END AS magnitude
      FROM e"""))

  // ---------- q388: regression leverage audit --------------------------

  /** Leverage audit of the spend-on-balance regression: hat values
    * hᵢ = 1/n + (xᵢ−x̄)²/Sxx say which customers' balance positions
    * give them outsized pull on the fitted slope — the influence
    * screen run BEFORE trusting q233-style OLS coefficients (q58
    * flags outliers in y; leverage flags extremity in x, which is
    * invisible to residual checks). The moment row broadcasts; hᵢ is
    * per-row expression math flagged at the 2·p/n = 4/n rule; the
    * report is one fold plus the top-5 by pinned hat value. Balance
    * pinned to cents; Sxx DECIMAL-lifted.
    */
  private val q388 = QueryDef(
    "q388_leverage_audit",
    (s, dir) => {
      val spend = Fixtures.table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 6)))
          .cast("double").as("spend"))
      val pts = Fixtures.table(s, dir, "customer")
        .join(spend, col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("x"))
      val mom = pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum((col("x") * col("x")).cast(DecimalType(38, 0))).as("sxx"))
      val hat = pts.crossJoin(broadcast(mom))
        .select(col("c_custkey"), col("n"),
          expr("""CAST(round((1.0 / n
            + (x - CAST(sx AS DOUBLE) / n) * (x - CAST(sx AS DOUBLE)
              / n)
              / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                * CAST(sx AS DOUBLE) / n)) * 1e12) AS BIGINT)""")
            .as("h_pico"))
      val rep = hat.agg(max(col("n")).as("n"),
        // h·n compared in double: the pico-pinned product would cross
        // int64 once n reaches corpus scale
        sum(when(col("h_pico").cast("double")
            > lit(4e12) / col("n"), 1L)
          .otherwise(0L)).as("n_flagged"),
        max(col("h_pico")).as("max_pico"),
        sum(col("h_pico")).as("sh"))
      rep.select(col("n"), col("n_flagged"),
        round(col("max_pico").cast("double") / 1e12, 9).as("max_h"),
        round(col("sh").cast("double") / col("n") / 1e12, 9)
          .as("mean_h"))
    },
    Some("""WITH spend AS (SELECT o_custkey,
          sum(CAST(o_totalprice AS DECIMAL(18,6)))::DOUBLE AS spend
        FROM orders GROUP BY 1),
      pts AS (SELECT c_custkey, round(c_acctbal * 100)::BIGINT AS x
        FROM customer JOIN spend ON c_custkey = o_custkey),
      mom AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
          sum(x::HUGEINT * x) AS sxx
        FROM pts),
      hat AS (SELECT c_custkey, n,
          round((1.0 / n + (x - sx::DOUBLE / n) * (x - sx::DOUBLE / n)
            / (sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n)) * 1e12)
            ::BIGINT AS h_pico
        FROM pts, mom)
      SELECT max(n) AS n,
        sum(CASE WHEN h_pico::DOUBLE > 4e12 / n THEN 1 ELSE 0
          END)::BIGINT AS n_flagged,
        round(max(h_pico)::DOUBLE / 1e12, 9) AS max_h,
        round(sum(h_pico)::DOUBLE / max(n) / 1e12, 9) AS mean_h
      FROM hat"""))

  // ---------- q389: Breusch–Pagan heteroscedasticity test --------------

  /** Breusch–Pagan LM test on the spend-on-balance regression — do
    * the residuals' VARIANCES move with the regressor? If yes, every
    * q233-style OLS standard error is miscalibrated and q359's
    * HAC-class corrections are mandatory, so this is the gate between
    * the two. Two passes: the broadcast moment row fixes (α, β);
    * residuals square per row (whole-dollar pinning keeps e² and its
    * cross-moments inside DECIMAL(38) at sf100), and the auxiliary
    * e²-on-x regression's R² folds from one exact moment row;
    * LM = n·R² against χ²₁.
    */
  private val q389 = QueryDef(
    "q389_breusch_pagan",
    (s, dir) => {
      val spend = Fixtures.table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 6)))
          .cast("double").as("spend"))
      val pts = Fixtures.table(s, dir, "customer")
        .join(spend, col("c_custkey") === col("o_custkey"))
        .select(expr("CAST(round(c_acctbal) AS BIGINT)").as("x"),
          expr("CAST(round(spend) AS BIGINT)").as("y"))
      val m1 = pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum((col("x") * col("x")).cast(DecimalType(38, 0))).as("sxx"),
        sum((col("x") * col("y")).cast(DecimalType(38, 0))).as("sxy"))
      val ab = m1.select(col("n"),
        ((col("n").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double"))
          / (col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double")))
          .as("beta"), col("sx"), col("sy"))
        .select(col("n"), col("beta"),
          ((col("sy").cast("double") - col("beta")
            * col("sx").cast("double")) / col("n")).as("alpha"))
      val e2 = pts.crossJoin(broadcast(ab))
        .select(col("x"),
          expr("""CAST(round((y - alpha - beta * x)
            * (y - alpha - beta * x)) AS DECIMAL(38,0))""").as("e2"))
      val m2 = e2.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum((col("x") * col("x")).cast(DecimalType(38, 0))).as("sxx"),
        sum(col("e2")).as("se"),
        sum((col("e2") * col("e2"))).as("see"),
        sum((col("e2") * col("x"))).as("sxe"))
      m2.select(col("n"),
          (((col("n").cast("double") * col("sxe").cast("double")
            - col("sx").cast("double") * col("se").cast("double"))
            * (col("n").cast("double") * col("sxe").cast("double")
              - col("sx").cast("double") * col("se").cast("double")))
            / ((col("n").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double"))
              * (col("n").cast("double") * col("see").cast("double")
                - col("se").cast("double")
                  * col("se").cast("double")))).as("r2"))
        .select(col("n"), round(col("r2"), 9).as("r2_aux"),
          round(col("n") * col("r2"), 6).as("lm_stat"),
          (col("n") * col("r2") > 3.841).as("heteroscedastic"))
    },
    Some("""WITH spend AS (SELECT o_custkey,
          sum(CAST(o_totalprice AS DECIMAL(18,6)))::DOUBLE AS spend
        FROM orders GROUP BY 1),
      pts AS (SELECT round(c_acctbal)::BIGINT AS x,
          round(spend)::BIGINT AS y
        FROM customer JOIN spend ON c_custkey = o_custkey),
      m1 AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
          sum(y)::BIGINT AS sy, sum(x::HUGEINT * x) AS sxx,
          sum(x::HUGEINT * y) AS sxy
        FROM pts),
      ab AS (SELECT n,
          (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
            / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
            AS beta, sx, sy
        FROM m1),
      ab2 AS (SELECT n, beta,
          (sy::DOUBLE - beta * sx::DOUBLE) / n AS alpha
        FROM ab),
      e2 AS (SELECT x,
          round((y - alpha - beta * x) * (y - alpha - beta * x))
            ::HUGEINT AS e2
        FROM pts, ab2),
      m2 AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
          sum(x::HUGEINT * x) AS sxx, sum(e2) AS se,
          sum(e2 * e2) AS see, sum(e2 * x) AS sxe
        FROM e2),
      r AS (SELECT n,
          ((n::DOUBLE * sxe::DOUBLE - sx::DOUBLE * se::DOUBLE)
            * (n::DOUBLE * sxe::DOUBLE - sx::DOUBLE * se::DOUBLE))
            / ((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
              * (n::DOUBLE * see::DOUBLE - se::DOUBLE * se::DOUBLE))
            AS r2
        FROM m2)
      SELECT n, round(r2, 9) AS r2_aux, round(n * r2, 6) AS lm_stat,
        (n * r2 > 3.841) AS heteroscedastic
      FROM r"""))

  // ---------- q397: blocking-strategy evaluation -----------------------

  /** Blocking-strategy evaluation for record linkage: for three
    * candidate blocking keys, the REDUCTION RATIO (how many of the
    * all-pairs comparisons the blocking avoids — computed purely from
    * block-size aggregates, Σ C(bᵢ,2), so no pair set ever
    * materializes) against PAIR COMPLETENESS (what fraction of the
    * q161 ground-truth matches the blocking keeps co-blocked) — the
    * precision/recall tradeoff of entity-resolution candidate
    * generation, decided BEFORE paying the q161 comparison join. The
    * truth set is q161's brand+size-blocked Levenshtein matches
    * (documented proxy); completeness joins it against each
    * strategy's key pair. Everything is |part|-dimension-sized.
    */
  private val q397 = QueryDef(
    "q397_blocking_eval",
    (s, dir) => {
      val p = Fixtures.table(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size"),
          col("p_name"),
          substring(col("p_name"), 1, 4).as("pfx"))
      val truth = p.as("a").join(p.as("b"),
          col("a.p_brand") === col("b.p_brand") &&
            col("a.p_size") === col("b.p_size") &&
            col("a.p_partkey") < col("b.p_partkey"))
        .where(levenshtein(col("a.p_name"), col("b.p_name")) <= 12)
        .select(col("a.p_partkey").as("ka"),
          col("b.p_partkey").as("kb"))
      val nTruth = truth.agg(count(lit(1)).as("nt"))
      val nAll = p.agg((count(lit(1)) * (count(lit(1)) - 1) / 2)
        .as("all_pairs"))
      def strat(name: String, key: org.apache.spark.sql.Column)
          : DataFrame = {
        val keyed = p.select(col("p_partkey"), key.as("blk"))
        val cand = keyed.groupBy(col("blk"))
          .agg(count(lit(1)).as("b"))
          .agg(sum(expr("b * (b - 1) div 2")).as("n_cand"))
        val kept = truth
          .join(keyed.select(col("p_partkey").as("ka"),
            col("blk").as("blka")), Seq("ka"))
          .join(keyed.select(col("p_partkey").as("kb"),
            col("blk").as("blkb")), Seq("kb"))
          .agg(sum(when(col("blka") === col("blkb"), 1L).otherwise(0L))
            .as("n_kept"))
        cand.crossJoin(broadcast(kept))
          .select(lit(name).as("strategy"), col("n_cand"),
            col("n_kept"))
      }
      strat("brand", col("p_brand"))
        .unionAll(strat("name_prefix4", col("pfx")))
        .unionAll(strat("size", col("p_size").cast("string")))
        .crossJoin(broadcast(nTruth)).crossJoin(broadcast(nAll))
        .select(col("strategy"), col("n_cand"),
          round(lit(1.0) - col("n_cand").cast("double")
            / col("all_pairs"), 9).as("reduction_ratio"),
          round(col("n_kept").cast("double") / col("nt"), 9)
            .as("pair_completeness"))
        .orderBy(col("strategy"))
    },
    Some("""WITH p AS (SELECT p_partkey, p_brand, p_size, p_name,
          substring(p_name, 1, 4) AS pfx FROM part),
      truth AS (SELECT a.p_partkey AS ka, b.p_partkey AS kb
        FROM p a JOIN p b ON a.p_brand = b.p_brand
          AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 12),
      nt AS (SELECT count(*)::BIGINT AS nt FROM truth),
      na AS (SELECT (count(*) * (count(*) - 1) // 2)::BIGINT
          AS all_pairs FROM p),
      s1c AS (SELECT sum(b * (b - 1) // 2)::BIGINT AS n_cand FROM
        (SELECT p_brand, count(*)::BIGINT AS b FROM p GROUP BY 1)),
      s1k AS (SELECT count(*)::BIGINT AS n_kept FROM truth t
        JOIN p a ON a.p_partkey = t.ka
        JOIN p b ON b.p_partkey = t.kb
        WHERE a.p_brand = b.p_brand),
      s2c AS (SELECT sum(b * (b - 1) // 2)::BIGINT AS n_cand FROM
        (SELECT pfx, count(*)::BIGINT AS b FROM p GROUP BY 1)),
      s2k AS (SELECT count(*)::BIGINT AS n_kept FROM truth t
        JOIN p a ON a.p_partkey = t.ka
        JOIN p b ON b.p_partkey = t.kb
        WHERE a.pfx = b.pfx),
      s3c AS (SELECT sum(b * (b - 1) // 2)::BIGINT AS n_cand FROM
        (SELECT p_size, count(*)::BIGINT AS b FROM p GROUP BY 1)),
      s3k AS (SELECT count(*)::BIGINT AS n_kept FROM truth t
        JOIN p a ON a.p_partkey = t.ka
        JOIN p b ON b.p_partkey = t.kb
        WHERE a.p_size = b.p_size),
      u AS (
        SELECT 'brand' AS strategy, s1c.n_cand, s1k.n_kept
          FROM s1c, s1k
        UNION ALL SELECT 'name_prefix4', s2c.n_cand, s2k.n_kept
          FROM s2c, s2k
        UNION ALL SELECT 'size', s3c.n_cand, s3k.n_kept
          FROM s3c, s3k)
      SELECT strategy, n_cand,
        round(1.0 - n_cand::DOUBLE / all_pairs, 9) AS reduction_ratio,
        round(n_kept::DOUBLE / nt, 9) AS pair_completeness
      FROM u, nt, na
      ORDER BY strategy"""))

  // ---------- q398: shuffle-partition skew audit -----------------------

  /** Hash-partition skew audit: for four candidate shuffle keys, the
    * row distribution across 200 model partitions (the portable h32
    * coin standing in for the engine's partitioner) — max/mean skew
    * factor, occupancy, and the p99 partition — the pre-flight a
    * pipeline runs before keying a corpus-sized shuffle on a column,
    * because a 37× skew on l_returnflag means one straggler task
    * carries 37 tasks' worth of a 100 TB shuffle (the q89 key-
    * cardinality report says HOW MANY keys; this says where the ROWS
    * land). Each candidate is one grouped count (hash-distributed,
    * partial-agg combinable) into a bounded 200-row histogram; the
    * skew fold is constant-size.
    */
  private val q398 = QueryDef(
    "q398_shuffle_skew_audit",
    (s, dir) => {
      val li = Fixtures.table(s, dir, "lineitem")
      def cand(name: String, key: org.apache.spark.sql.Column)
          : DataFrame =
        li.select(key.cast("string").as("k"))
          .select(expr(Portable.h32Spark("concat('pt_', k)") + " % 200")
            .as("pid"))
          .groupBy(col("pid")).agg(count(lit(1)).as("c"))
          .agg(lit(name).as("shuffle_key"), sum(col("c")).as("n_rows"),
            count(lit(1)).as("n_used"), max(col("c")).as("max_rows"))
      cand("orderkey", col("l_orderkey"))
        .unionAll(cand("partkey", col("l_partkey")))
        .unionAll(cand("returnflag", col("l_returnflag")))
        .unionAll(cand("suppkey", col("l_suppkey")))
        .select(col("shuffle_key"), col("n_used"), col("max_rows"),
          round(col("max_rows").cast("double")
            / (col("n_rows").cast("double") / 200.0), 6)
            .as("skew_factor"))
        .orderBy(col("shuffle_key"))
    },
    Some(s"""WITH
      c1 AS (SELECT 'orderkey' AS shuffle_key, sum(c)::BIGINT AS n_rows,
          count(*)::BIGINT AS n_used, max(c)::BIGINT AS max_rows FROM
        (SELECT ${Portable.h32Duck("'pt_' || l_orderkey::VARCHAR")}
            % 200 AS pid, count(*)::BIGINT AS c
          FROM lineitem GROUP BY 1)),
      c2 AS (SELECT 'partkey', sum(c)::BIGINT, count(*)::BIGINT,
          max(c)::BIGINT FROM
        (SELECT ${Portable.h32Duck("'pt_' || l_partkey::VARCHAR")}
            % 200 AS pid, count(*)::BIGINT AS c
          FROM lineitem GROUP BY 1)),
      c3 AS (SELECT 'returnflag', sum(c)::BIGINT, count(*)::BIGINT,
          max(c)::BIGINT FROM
        (SELECT ${Portable.h32Duck("'pt_' || l_returnflag")}
            % 200 AS pid, count(*)::BIGINT AS c
          FROM lineitem GROUP BY 1)),
      c4 AS (SELECT 'suppkey', sum(c)::BIGINT, count(*)::BIGINT,
          max(c)::BIGINT FROM
        (SELECT ${Portable.h32Duck("'pt_' || l_suppkey::VARCHAR")}
            % 200 AS pid, count(*)::BIGINT AS c
          FROM lineitem GROUP BY 1)),
      u AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2
        UNION ALL SELECT * FROM c3 UNION ALL SELECT * FROM c4)
      SELECT shuffle_key, n_used, max_rows,
        round(max_rows::DOUBLE / (n_rows::DOUBLE / 200.0), 6)
          AS skew_factor
      FROM u ORDER BY shuffle_key"""))

  // ---------- q400: one-step LAD (median) regression -------------------

  /** One IRLS step from OLS toward least-absolute-deviations (median)
    * regression of spend on balance — the robust-slope move when
    * q388's leverage audit or q58's outliers indict the OLS fit:
    * reweight each point by 1/max(|residual|, $1) (the guarded LAD
    * weight) and refit in closed form. Two passes, both broadcast
    * moment rows: (α,β) from exact pinned moments, then micro-pinned
    * weights with DECIMAL-lifted weighted cross-moments — the q351
    * "one deterministic step, no loop" discipline applied to
    * quantile-flavored regression (q289 EVALUATES pinball loss; this
    * FITS toward its minimizer).
    */
  private val q400 = QueryDef(
    "q400_lad_step",
    (s, dir) => {
      val spend = Fixtures.table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 6)))
          .cast("double").as("spend"))
      val pts = Fixtures.table(s, dir, "customer")
        .join(spend, col("c_custkey") === col("o_custkey"))
        .select(expr("CAST(round(c_acctbal) AS BIGINT)").as("x"),
          expr("CAST(round(spend) AS BIGINT)").as("y"))
      val m1 = pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum((col("x") * col("x")).cast(DecimalType(38, 0))).as("sxx"),
        sum((col("x") * col("y")).cast(DecimalType(38, 0))).as("sxy"))
      val ab = m1.select(col("n"),
        ((col("n").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double"))
          / (col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double")))
          .as("b0"), col("sx"), col("sy"))
        .select(col("n"), col("b0"),
          ((col("sy").cast("double") - col("b0")
            * col("sx").cast("double")) / col("n")).as("a0"))
      val wtd = pts.crossJoin(broadcast(ab))
        .select(col("x"), col("y"), col("n"), col("a0"), col("b0"),
          expr("""CAST(round(1e6 / greatest(abs(y - a0 - b0 * x), 1.0))
            AS BIGINT)""").as("w"))
      val m2 = wtd.groupBy(col("n"), col("a0"), col("b0"))
        .agg(sum(col("w")).as("sw"),
          sum((col("w") * col("x")).cast(DecimalType(38, 0))).as("swx"),
          sum((col("w") * col("y")).cast(DecimalType(38, 0))).as("swy"),
          sum((col("w") * col("x") * col("x"))
            .cast(DecimalType(38, 0))).as("swxx"),
          sum((col("w") * col("x") * col("y"))
            .cast(DecimalType(38, 0))).as("swxy"))
      m2.select(col("n"), round(col("b0"), 9).as("beta_ols"),
          ((col("sw").cast("double") * col("swxy").cast("double")
            - col("swx").cast("double") * col("swy").cast("double"))
            / (col("sw").cast("double") * col("swxx").cast("double")
              - col("swx").cast("double") * col("swx").cast("double")))
            .as("b1"), col("swy"), col("swx"), col("sw"))
        .select(col("n"), col("beta_ols"),
          round(col("b1"), 9).as("beta_lad1"),
          round((col("swy").cast("double") - col("b1")
            * col("swx").cast("double")) / col("sw").cast("double"), 6)
            .as("alpha_lad1"))
    },
    Some("""WITH spend AS (SELECT o_custkey,
          sum(CAST(o_totalprice AS DECIMAL(18,6)))::DOUBLE AS spend
        FROM orders GROUP BY 1),
      pts AS (SELECT round(c_acctbal)::BIGINT AS x,
          round(spend)::BIGINT AS y
        FROM customer JOIN spend ON c_custkey = o_custkey),
      m1 AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
          sum(y)::BIGINT AS sy, sum(x::HUGEINT * x) AS sxx,
          sum(x::HUGEINT * y) AS sxy
        FROM pts),
      ab AS (SELECT n,
          (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
            / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
            AS b0, sx, sy
        FROM m1),
      ab2 AS (SELECT n, b0,
          (sy::DOUBLE - b0 * sx::DOUBLE) / n AS a0
        FROM ab),
      wtd AS (SELECT x, y, n, a0, b0,
          round(1e6 / greatest(abs(y - a0 - b0 * x), 1.0))::BIGINT
            AS w
        FROM pts, ab2),
      m2 AS (SELECT n, a0, b0, sum(w)::BIGINT AS sw,
          sum(w::HUGEINT * x) AS swx, sum(w::HUGEINT * y) AS swy,
          sum(w::HUGEINT * x * x) AS swxx,
          sum(w::HUGEINT * x * y) AS swxy
        FROM wtd GROUP BY n, a0, b0),
      f AS (SELECT n, b0,
          (sw::DOUBLE * swxy::DOUBLE - swx::DOUBLE * swy::DOUBLE)
            / (sw::DOUBLE * swxx::DOUBLE - swx::DOUBLE * swx::DOUBLE)
            AS b1, swy, swx, sw
        FROM m2)
      SELECT n, round(b0, 9) AS beta_ols, round(b1, 9) AS beta_lad1,
        round((swy::DOUBLE - b1 * swx::DOUBLE) / sw::DOUBLE, 6)
          AS alpha_lad1
      FROM f"""))

  // ---------- q401: k-truss edge-support peel --------------------------

  /** One peeling iteration of k-truss decomposition (k = 4) over the
    * co-purchase graph: per-EDGE triangle support, drop every edge
    * supported by fewer than k−2 = 2 triangles, and report the support
    * histogram with the peel summary — the edge-level sibling of q261's
    * k-core (node-degree peel): trusses isolate cohesive product
    * communities that degree alone can't see (a hub with many weak
    * one-off neighbors survives a k-core but none of its edges survive
    * the truss). Triangles enumerate once via the degree-ordered
    * orientation (q373's Ortmann–Brandes shape — two-hop fan-out
    * bounded by O(√|E|) per node); each triangle then explodes into
    * its 3 canonical (least, greatest) edges for ONE integer-keyed
    * support aggregate, and zero-triangle edges enter the histogram at
    * support 0 via the pair-side left join. Everything is linear in
    * |edges| + |triangle corners|; the 1-row summary joins by
    * broadcast onto the bounded support histogram. The full
    * decomposition iterates this to a fixed point — one verified
    * iteration pins the contract.
    */
  private val q401 = QueryDef(
    "q401_ktruss_peel",
    (s, dir) => {
      val pairs = copurchasePairs(s, dir)
        .where(col("n_orders") >= 2)
        .select(col("part_a").as("a"), col("part_b").as("b"))
      val e = copurchaseOriented(s, dir)
      val tri = e.alias("e1")
        .join(e.alias("e2"), col("e1.b") === col("e2.a"))
        .join(e.alias("e3"),
          col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
        .select(col("e1.a").as("x"), col("e1.b").as("y"),
          col("e2.b").as("z"))
      val sup = tri.select(explode(array(
          struct(least(col("x"), col("y")).as("u"),
            greatest(col("x"), col("y")).as("v")),
          struct(least(col("y"), col("z")).as("u"),
            greatest(col("y"), col("z")).as("v")),
          struct(least(col("x"), col("z")).as("u"),
            greatest(col("x"), col("z")).as("v")))).as("ed"))
        .select(col("ed.u").as("u"), col("ed.v").as("v"))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("supp"))
      val edgeSupp = pairs
        .join(sup, col("a") === col("u") && col("b") === col("v"),
          "left_outer")
        .select(coalesce(col("supp"), lit(0L)).as("supp"))
      val summary = edgeSupp.agg(count(lit(1)).as("n_edges"),
        sum(when(col("supp") >= 2, 1L).otherwise(0L)).as("n_kept"))
      edgeSupp.groupBy(col("supp")).agg(count(lit(1)).as("n_at_supp"))
        .crossJoin(broadcast(summary))
        .select(col("supp"), col("n_at_supp"), col("n_edges"),
          col("n_kept"))
        .orderBy("supp")
    },
    Some("""WITH it AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        FROM lineitem),
      pairs AS (SELECT a.p AS a, b.p AS b FROM it a
        JOIN it b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= 2),
      deg AS (SELECT n, count(*)::BIGINT AS d FROM (
          SELECT a AS n FROM pairs UNION ALL SELECT b FROM pairs)
        GROUP BY 1),
      e AS (SELECT CASE WHEN da.d < db.d
            OR (da.d = db.d AND p.a < p.b) THEN p.a ELSE p.b END AS a,
          CASE WHEN da.d < db.d OR (da.d = db.d AND p.a < p.b)
            THEN p.b ELSE p.a END AS b
        FROM pairs p
        JOIN deg da ON da.n = p.a JOIN deg db ON db.n = p.b),
      tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1
        JOIN e e2 ON e2.a = e1.b
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      sup AS (SELECT u, v, count(*)::BIGINT AS supp FROM (
          SELECT least(x, y) AS u, greatest(x, y) AS v FROM tri
          UNION ALL SELECT least(y, z), greatest(y, z) FROM tri
          UNION ALL SELECT least(x, z), greatest(x, z) FROM tri)
        GROUP BY 1, 2),
      es AS (SELECT coalesce(sup.supp, 0)::BIGINT AS supp
        FROM pairs LEFT JOIN sup ON pairs.a = sup.u AND pairs.b = sup.v),
      summary AS (SELECT count(*)::BIGINT AS n_edges,
          sum(CASE WHEN supp >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_kept
        FROM es)
      SELECT supp, count(*)::BIGINT AS n_at_supp, n_edges, n_kept
      FROM es, summary GROUP BY supp, n_edges, n_kept
      ORDER BY supp"""))

  // ---------- q403: one IRLS step of Poisson regression ----------------

  /** One IRLS (Fisher-scoring) step of a Poisson log-linear regression
    * of per-customer order counts on account balance, from the
    * intercept-only MLE start β = (ln ȳ, 0) — the GLM count-model
    * sibling of q351 (logit Newton step) and q400 (LAD step): the full
    * fit iterates this to convergence; one deterministic verified step
    * pins the contract. At the intercept-only start the working
    * weights are the constant μ₀ = ȳ, so the weighted normal
    * equations fold to CLOSED FORM over five exact integer/DECIMAL
    * moments (n, Σx, Σy, Σx², Σxy — x = whole-dollar balance,
    * y = order count): β₁ = (nΣxy−ΣxΣy)/(μ₀(nΣx²−(Σx)²)) and
    * β₀ = ln μ₀ − β₁·Σx/n. The same moment row also yields the
    * Pearson dispersion Σ(y−μ₀)²/μ₀/(n−1) — the overdispersion
    * screen that says whether Poisson is even the right family
    * (q329 then fits the negative-binomial alternative). Shape: one
    * grouped count over orders, one broadcast join onto customer, one
    * moment reduce, one output row — no iteration, no collect.
    */
  private val q403 = QueryDef(
    "q403_poisson_irls_step",
    (s, dir) => {
      val cnt = Fixtures.table(s, dir, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("y"))
      val pts = Fixtures.table(s, dir, "customer")
        .join(cnt, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(expr("CAST(round(c_acctbal) AS BIGINT)").as("x"),
          coalesce(col("y"), lit(0L)).as("y"))
      val m = pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum((col("x") * col("x")).cast(DecimalType(38, 0))).as("sxx"),
        sum((col("x") * col("y")).cast(DecimalType(38, 0))).as("sxy"),
        sum((col("y") * col("y")).cast(DecimalType(38, 0))).as("syy"))
      m.select(col("n"),
          (col("sy").cast("double") / col("n")).as("mu0"),
          ((col("n").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
            / (col("n").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double")))
            .as("b_ols"),
          col("sx"), col("sy"), col("syy"))
        .select(col("n"), round(col("mu0"), 9).as("mu0"),
          round((col("b_ols") / col("mu0")), 12).as("beta1_step1"),
          round(expr("ln(mu0)") - (col("b_ols") / col("mu0"))
            * col("sx").cast("double") / col("n"), 9).as("beta0_step1"),
          round((col("syy").cast("double")
            - col("sy").cast("double") * col("sy").cast("double")
              / col("n"))
            / col("mu0") / (col("n") - 1), 6).as("pearson_dispersion"))
    },
    Some("""WITH cnt AS (SELECT o_custkey, count(*)::BIGINT AS y
        FROM orders GROUP BY 1),
      pts AS (SELECT round(c_acctbal)::BIGINT AS x,
          coalesce(y, 0)::BIGINT AS y
        FROM customer LEFT JOIN cnt ON c_custkey = o_custkey),
      m AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
          sum(y)::BIGINT AS sy, sum(x::HUGEINT * x) AS sxx,
          sum(x::HUGEINT * y) AS sxy, sum(y::HUGEINT * y) AS syy
        FROM pts),
      b AS (SELECT n, sy::DOUBLE / n AS mu0,
          (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
            / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
            AS b_ols, sx, sy, syy
        FROM m)
      SELECT n, round(mu0, 9) AS mu0,
        round(b_ols / mu0, 12) AS beta1_step1,
        round(ln(mu0) - (b_ols / mu0) * sx::DOUBLE / n, 9)
          AS beta0_step1,
        round((syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n) / mu0
          / (n - 1), 6) AS pearson_dispersion
      FROM b"""))

  // ---------- q407: Kruskal–Wallis k-group rank test --------------------

  /** Kruskal–Wallis H across the five order-priority groups on binned
    * order value — the k-group nonparametric location test missing
    * between q254 (Mann–Whitney, 2 groups), q358 (ANOVA F, parametric)
    * and q370 (Friedman, repeated measures): it asks whether ANY
    * priority class has shifted order values without assuming
    * normality or equal variances (q307's Levene result decides which
    * of F or H to trust). Values ride the binned-rank convention
    * (q295): $1000 bins bound the distinct-value table by the PRICE
    * RANGE (~600 bins), never the corpus, so the rank prefix-sum
    * window is over a bounded spine and the massive ties that binning
    * creates are handled EXACTLY by average ranks (doubled to stay
    * integer) plus the Σ(t³−t) tie correction. Per-group rank sums
    * are exact DECIMAL integers; the 5 per-group H terms are pinned
    * to DECIMAL(38,6) before the k-row reduce so the sum is
    * order-free. df = k−1 = 4 gives the closed-form chi-square
    * survival exp(−H/2)(1+H/2) — no CDF table needed. One scan, one
    * bounded shuffle, 1-row output.
    */
  private val q407 = QueryDef(
    "q407_kruskal_wallis",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val b = Fixtures.table(s, dir, "orders")
        .select(col("o_orderpriority").as("grp"),
          expr("CAST(floor(o_totalprice / 1000.0) AS BIGINT)").as("bin"))
      val bt = b.groupBy(col("bin")).agg(count(lit(1)).as("nb"))
      val w = Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val rk = bt.withColumn("r2",
        lit(2L) * (sum(col("nb")).over(w) - col("nb")) + col("nb") + 1)
      val gr = b.groupBy(col("grp"), col("bin"))
        .agg(count(lit(1)).as("ngb"))
        .join(rk, "bin")
        .groupBy(col("grp"))
        .agg(sum(col("ngb")).as("ng"),
          sum((col("ngb").cast(DecimalType(38, 0)) * col("r2")))
            .as("r2g"))
      val nt = gr.agg(sum(col("ng")).as("n"), count(lit(1)).as("k"))
      val tp = gr.select(
          round((col("r2g").cast("double") / 2.0)
            * (col("r2g").cast("double") / 2.0) / col("ng"), 6)
            .cast(DecimalType(38, 6)).as("t"))
        .agg(sum(col("t")).as("st"))
      val tie = bt.agg(sum(col("nb").cast(DecimalType(38, 0))
        * col("nb") * col("nb") - col("nb")).as("tadj"))
      nt.crossJoin(broadcast(tp)).crossJoin(broadcast(tie))
        .select(col("k"), col("n"),
          ((lit(12.0) / (col("n").cast("double")
              * (col("n") + 1).cast("double")) * col("st").cast("double")
            - lit(3.0) * (col("n") + 1).cast("double"))
            / (lit(1.0) - col("tadj").cast("double")
              / (col("n").cast("double") * col("n").cast("double")
                * col("n").cast("double") - col("n").cast("double"))))
            .as("hc"))
        .select(col("k"), col("n"), round(col("hc"), 9).as("h_stat"),
          round(exp(-col("hc") / 2.0) * (lit(1.0) + col("hc") / 2.0), 9)
            .as("p_value"),
          when(col("hc") > 9.488, "reject_equal").otherwise("no_shift")
            .as("verdict"))
    },
    Some("""WITH b AS (SELECT o_orderpriority AS grp,
          CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS bin
        FROM orders),
      bt AS (SELECT bin, count(*)::BIGINT AS nb FROM b GROUP BY 1),
      rk AS (SELECT bin, nb,
          2 * (sum(nb) OVER (ORDER BY bin) - nb) + nb + 1 AS r2
        FROM bt),
      gr AS (SELECT grp, sum(ngb)::BIGINT AS ng,
          sum(ngb::HUGEINT * r2) AS r2g
        FROM (SELECT grp, bin, count(*)::BIGINT AS ngb
            FROM b GROUP BY 1, 2) gc
        JOIN rk USING (bin) GROUP BY 1),
      nt AS (SELECT sum(ng)::BIGINT AS n, count(*)::BIGINT AS k FROM gr),
      tp AS (SELECT sum(round((r2g::DOUBLE / 2.0) * (r2g::DOUBLE / 2.0)
          / ng, 6)::DECIMAL(38,6)) AS st FROM gr),
      tie AS (SELECT sum(nb::HUGEINT * nb * nb - nb) AS tadj FROM bt),
      h AS (SELECT n, k,
          (12.0 / (n::DOUBLE * (n + 1)::DOUBLE) * st::DOUBLE
            - 3.0 * (n + 1)::DOUBLE)
            / (1.0 - tadj::DOUBLE / (n::DOUBLE * n::DOUBLE * n::DOUBLE
              - n::DOUBLE)) AS hc
        FROM nt, tp, tie)
      SELECT k, n, round(hc, 9) AS h_stat,
        round(exp(-hc / 2.0) * (1.0 + hc / 2.0), 9) AS p_value,
        CASE WHEN hc > 9.488 THEN 'reject_equal' ELSE 'no_shift' END
          AS verdict
      FROM h"""))

  // ---------- q408: ridge regression shrinkage path --------------------

  /** Closed-form ridge path for the two-predictor regression of
    * customer spend on account balance and order count — the
    * REGULARIZED member the regression family lacks (q233 OLS, q400
    * LAD, q351 logit, q403 Poisson, q362 Theil–Sen are all
    * unpenalized): in correlation form the 2×2 system (R+λI)β = r_y
    * inverts by hand, so the whole λ grid {0, 0.1, 0.5, 1, 10} is
    * pure expression arithmetic over ONE row of exact moments — the
    * classic coefficient-shrinkage trace (and, when predictors
    * correlate, the variance-trading crossover) a feature-selection
    * pass reads before fitting anything iterative. Scale shape: one
    * grouped pass over orders, one broadcast-joined pass over
    * customer, nine DECIMAL-lifted raw moments in a 1-row reduce,
    * then a 5-row explode of the λ grid. Nothing downstream of the
    * moment row touches the corpus.
    */
  private val q408 = QueryDef(
    "q408_ridge_path",
    (s, dir) => {
      val sp = Fixtures.table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("x2o"),
          expr("CAST(round(sum(o_totalprice)) AS BIGINT)").as("yv"))
      val pts = Fixtures.table(s, dir, "customer")
        .join(sp, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(expr("CAST(round(c_acctbal) AS BIGINT)").as("x1"),
          coalesce(col("x2o"), lit(0L)).as("x2"),
          coalesce(col("yv"), lit(0L)).as("y"))
      val m = pts.agg(count(lit(1)).as("n"), sum(col("x1")).as("s1"),
        sum(col("x2")).as("s2"), sum(col("y")).as("sy"),
        sum((col("x1") * col("x1")).cast(DecimalType(38, 0))).as("s11"),
        sum((col("x2") * col("x2")).cast(DecimalType(38, 0))).as("s22"),
        sum((col("x1") * col("x2")).cast(DecimalType(38, 0))).as("s12"),
        sum((col("x1") * col("y")).cast(DecimalType(38, 0))).as("s1y"),
        sum((col("x2") * col("y")).cast(DecimalType(38, 0))).as("s2y"),
        sum((col("y") * col("y")).cast(DecimalType(38, 0))).as("syy"))
      val c = m.select(col("n"),
        (col("n").cast("double") * col("s11").cast("double")
          - col("s1").cast("double") * col("s1").cast("double")).as("c11"),
        (col("n").cast("double") * col("s22").cast("double")
          - col("s2").cast("double") * col("s2").cast("double")).as("c22"),
        (col("n").cast("double") * col("s12").cast("double")
          - col("s1").cast("double") * col("s2").cast("double")).as("c12"),
        (col("n").cast("double") * col("s1y").cast("double")
          - col("s1").cast("double") * col("sy").cast("double")).as("c1y"),
        (col("n").cast("double") * col("s2y").cast("double")
          - col("s2").cast("double") * col("sy").cast("double")).as("c2y"),
        (col("n").cast("double") * col("syy").cast("double")
          - col("sy").cast("double") * col("sy").cast("double")).as("cyy"))
      val r = c.select(col("n"),
        (col("c12") / sqrt(col("c11") * col("c22"))).as("r12"),
        (col("c1y") / sqrt(col("c11") * col("cyy"))).as("r1y"),
        (col("c2y") / sqrt(col("c22") * col("cyy"))).as("r2y"))
      r.select(col("n"), col("r12"), col("r1y"), col("r2y"),
          explode(array(lit(0.0), lit(0.1), lit(0.5), lit(1.0),
            lit(10.0))).as("lambda"))
        .select(col("lambda"), col("n"), round(col("r12"), 6).as("r12"),
          round(((lit(1.0) + col("lambda")) * col("r1y")
            - col("r12") * col("r2y"))
            / ((lit(1.0) + col("lambda")) * (lit(1.0) + col("lambda"))
              - col("r12") * col("r12")), 9).as("beta1_std"),
          round(((lit(1.0) + col("lambda")) * col("r2y")
            - col("r12") * col("r1y"))
            / ((lit(1.0) + col("lambda")) * (lit(1.0) + col("lambda"))
              - col("r12") * col("r12")), 9).as("beta2_std"))
        .orderBy(col("lambda"))
    },
    Some("""WITH sp AS (SELECT o_custkey, count(*)::BIGINT AS x2o,
          CAST(round(sum(o_totalprice)) AS BIGINT) AS yv
        FROM orders GROUP BY 1),
      pts AS (SELECT CAST(round(c_acctbal) AS BIGINT) AS x1,
          coalesce(x2o, 0)::BIGINT AS x2, coalesce(yv, 0)::BIGINT AS y
        FROM customer LEFT JOIN sp ON c_custkey = o_custkey),
      m AS (SELECT count(*)::BIGINT AS n, sum(x1)::BIGINT AS s1,
          sum(x2)::BIGINT AS s2, sum(y)::BIGINT AS sy,
          sum(x1::HUGEINT * x1) AS s11, sum(x2::HUGEINT * x2) AS s22,
          sum(x1::HUGEINT * x2) AS s12, sum(x1::HUGEINT * y) AS s1y,
          sum(x2::HUGEINT * y) AS s2y, sum(y::HUGEINT * y) AS syy
        FROM pts),
      c AS (SELECT n,
          n::DOUBLE * s11::DOUBLE - s1::DOUBLE * s1::DOUBLE AS c11,
          n::DOUBLE * s22::DOUBLE - s2::DOUBLE * s2::DOUBLE AS c22,
          n::DOUBLE * s12::DOUBLE - s1::DOUBLE * s2::DOUBLE AS c12,
          n::DOUBLE * s1y::DOUBLE - s1::DOUBLE * sy::DOUBLE AS c1y,
          n::DOUBLE * s2y::DOUBLE - s2::DOUBLE * sy::DOUBLE AS c2y,
          n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE AS cyy
        FROM m),
      r AS (SELECT n, c12 / sqrt(c11 * c22) AS r12,
          c1y / sqrt(c11 * cyy) AS r1y, c2y / sqrt(c22 * cyy) AS r2y
        FROM c),
      g AS (SELECT unnest([0.0, 0.1, 0.5, 1.0, 10.0]) AS lambda)
      SELECT lambda, n, round(r12, 6) AS r12,
        round(((1.0 + lambda) * r1y - r12 * r2y)
          / ((1.0 + lambda) * (1.0 + lambda) - r12 * r12), 9)
          AS beta1_std,
        round(((1.0 + lambda) * r2y - r12 * r1y)
          / ((1.0 + lambda) * (1.0 + lambda) - r12 * r12), 9)
          AS beta2_std
      FROM r, g ORDER BY lambda"""))

  // ---------- q409: PRESS / leave-one-out cross-validation --------------

  /** PRESS statistic and predicted R² for the order-frequency
    * regression (y = per-customer order count on x = account balance,
    * q403's point set) — the MODEL-VALIDATION member the regression
    * family lacks: q388 stops at leverage (which points COULD distort
    * the fit), PRESS = Σ(eᵢ/(1−hᵢᵢ))² turns the hat values into the
    * exact leave-one-out prediction error WITHOUT refitting n models,
    * and R²_pred = 1 − PRESS/TSS < R² quantifies how much of the
    * in-sample fit is real versus memorized. Shape: one exact-moment
    * reduce gives slope/intercept/x̄/Sxx, one broadcast of that 1-row
    * result back over the points computes each deleted residual in a
    * single codegen'd projection, and both quadratic sums are pinned
    * to DECIMAL(38,6) micro-units before the reduce (order-free,
    * overflow-free at any corpus size). Two linear passes, 1-row
    * output.
    */
  private val q409 = QueryDef(
    "q409_press_loocv",
    (s, dir) => {
      val cnt = Fixtures.table(s, dir, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("y"))
      val pts = Fixtures.table(s, dir, "customer")
        .join(cnt, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(expr("CAST(round(c_acctbal) AS BIGINT)").as("x"),
          coalesce(col("y"), lit(0L)).as("y"))
      val m = pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum((col("x") * col("x")).cast(DecimalType(38, 0))).as("sxx"),
        sum((col("x") * col("y")).cast(DecimalType(38, 0))).as("sxy"),
        sum((col("y") * col("y")).cast(DecimalType(38, 0))).as("syy"))
      val b = m.select(col("n"),
          ((col("n").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
            / (col("n").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double")))
            .as("slope"), col("sx"), col("sy"), col("sxx"), col("syy"))
        .select(col("n"), col("slope"),
          ((col("sy").cast("double") - col("slope")
            * col("sx").cast("double")) / col("n").cast("double"))
            .as("icept"),
          (col("sx").cast("double") / col("n").cast("double")).as("xbar"),
          (col("sxx").cast("double") - col("sx").cast("double")
            * col("sx").cast("double") / col("n").cast("double"))
            .as("sxxc"),
          (col("syy").cast("double") - col("sy").cast("double")
            * col("sy").cast("double") / col("n").cast("double"))
            .as("tss"))
      val e = (col("y").cast("double") - col("icept")
        - col("slope") * col("x").cast("double"))
      val h = (lit(1.0) / col("n").cast("double")) +
        ((col("x").cast("double") - col("xbar")) *
          (col("x").cast("double") - col("xbar")) / col("sxxc"))
      val res = pts.crossJoin(broadcast(b))
        .groupBy(col("n"), col("slope"), col("icept"), col("tss"))
        .agg(sum(round(e * e, 6).cast(DecimalType(38, 6))).as("rss"),
          sum(round((e / (lit(1.0) - h)) * (e / (lit(1.0) - h)), 6)
            .cast(DecimalType(38, 6))).as("press"))
      res.select(col("n"), round(col("slope"), 12).as("slope"),
        round(col("icept"), 9).as("intercept"),
        round(col("rss").cast("double"), 3).as("rss"),
        round(col("press").cast("double"), 3).as("press"),
        round(lit(1.0) - col("rss").cast("double") / col("tss"), 9)
          .as("r2"),
        round(lit(1.0) - col("press").cast("double") / col("tss"), 9)
          .as("r2_pred"))
    },
    Some("""WITH cnt AS (SELECT o_custkey, count(*)::BIGINT AS y
        FROM orders GROUP BY 1),
      pts AS (SELECT CAST(round(c_acctbal) AS BIGINT) AS x,
          coalesce(y, 0)::BIGINT AS y
        FROM customer LEFT JOIN cnt ON c_custkey = o_custkey),
      m AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
          sum(y)::BIGINT AS sy, sum(x::HUGEINT * x) AS sxx,
          sum(x::HUGEINT * y) AS sxy, sum(y::HUGEINT * y) AS syy
        FROM pts),
      b AS (SELECT n,
          (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
            / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
            AS slope, sx, sy, sxx, syy
        FROM m),
      b2 AS (SELECT n, slope,
          (sy::DOUBLE - slope * sx::DOUBLE) / n::DOUBLE AS icept,
          sx::DOUBLE / n::DOUBLE AS xbar,
          sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n::DOUBLE AS sxxc,
          syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE AS tss
        FROM b),
      res AS (SELECT n, slope, icept, tss,
          sum(round((y::DOUBLE - icept - slope * x::DOUBLE)
            * (y::DOUBLE - icept - slope * x::DOUBLE), 6)
            ::DECIMAL(38,6)) AS rss,
          sum(round(((y::DOUBLE - icept - slope * x::DOUBLE)
              / (1.0 - (1.0 / n::DOUBLE + (x::DOUBLE - xbar)
                * (x::DOUBLE - xbar) / sxxc)))
            * ((y::DOUBLE - icept - slope * x::DOUBLE)
              / (1.0 - (1.0 / n::DOUBLE + (x::DOUBLE - xbar)
                * (x::DOUBLE - xbar) / sxxc))), 6)::DECIMAL(38,6))
            AS press
        FROM pts, b2 GROUP BY 1, 2, 3, 4)
      SELECT n, round(slope, 12) AS slope, round(icept, 9) AS intercept,
        round(rss::DOUBLE, 3) AS rss, round(press::DOUBLE, 3) AS press,
        round(1.0 - rss::DOUBLE / tss, 9) AS r2,
        round(1.0 - press::DOUBLE / tss, 9) AS r2_pred
      FROM res"""))

  // ---------- q410: zero-inflation score test --------------------------

  /** Van den Broek score test for zero inflation in per-customer
    * order counts over ONE year (1995) — the distribution-family
    * screen between q403 (Poisson step: assumes the family) and q329
    * (negative-binomial fit: one specific alternative): excess zeros
    * are a DIFFERENT failure than overdispersion (a dormant-customer
    * mixture inflates P(y=0) without fattening the tail), and the
    * score statistic S = (n₀/p̃₀ − n)² / (n(1−p̃₀)/p̃₀ − nȳ) with
    * p̃₀ = e^(−ȳ) detects it from THREE plain moments (n, n₀, Σy) —
    * no model fit, no iteration. The one-year window is what makes
    * the test live: lifetime counts have no zeros by construction
    * (every customer row exists because it ordered), while a bounded
    * window exposes the dormant mass. S is χ²(1) under H₀, so
    * p = 2·Q(√S) via the shared normal-tail polynomial. One filtered
    * grouped pass + one broadcast left join + a 1-row reduce.
    */
  private val q410 = QueryDef(
    "q410_zero_inflation",
    (s, dir) => {
      val cnt = Fixtures.table(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1995-01-01").cast("date")
          && col("o_orderdate") < lit("1996-01-01").cast("date"))
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("y"))
      val pts = Fixtures.table(s, dir, "customer")
        .join(cnt, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(coalesce(col("y"), lit(0L)).as("y"))
      val m = pts.agg(count(lit(1)).as("n"),
        sum(when(col("y") === 0, 1L).otherwise(0L)).as("n0"),
        sum(col("y")).as("sy"))
      m.select(col("n"), col("n0"),
          (col("sy").cast("double") / col("n").cast("double")).as("ybar"),
          exp(-(col("sy").cast("double") / col("n").cast("double")))
            .as("p0"))
        .select(col("n"), col("n0"), col("ybar"), col("p0"),
          (col("n0").cast("double") / col("n").cast("double"))
            .as("p0_obs"),
          ((col("n0").cast("double") / col("p0") - col("n").cast("double"))
            * (col("n0").cast("double") / col("p0")
              - col("n").cast("double"))
            / (col("n").cast("double") * (lit(1.0) - col("p0"))
              / col("p0") - col("n").cast("double") * col("ybar")))
            .as("score"))
        .select(col("n"), col("n0"), round(col("ybar"), 9)
            .as("mean_orders"),
          round(col("p0_obs"), 9).as("p0_obs"),
          round(col("p0"), 9).as("p0_poisson"),
          round(col("score"), 6).as("score_stat"),
          round(expr("2.0 * " + graft.ops.Portable.normCdfUpper(
            "sqrt(score)")), 9).as("p_value"),
          when(col("score") > 3.841, "zero_inflated")
            .otherwise("poisson_ok").as("verdict"))
    },
    Some(s"""WITH cnt AS (SELECT o_custkey, count(*)::BIGINT AS y
        FROM orders
        WHERE o_orderdate >= DATE '1995-01-01'
          AND o_orderdate < DATE '1996-01-01'
        GROUP BY 1),
      pts AS (SELECT coalesce(y, 0)::BIGINT AS y
        FROM customer LEFT JOIN cnt ON c_custkey = o_custkey),
      m AS (SELECT count(*)::BIGINT AS n,
          sum(CASE WHEN y = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
          sum(y)::BIGINT AS sy FROM pts),
      s AS (SELECT n, n0, sy::DOUBLE / n::DOUBLE AS ybar,
          exp(-(sy::DOUBLE / n::DOUBLE)) AS p0 FROM m),
      st AS (SELECT n, n0, ybar, p0,
          n0::DOUBLE / n::DOUBLE AS p0_obs,
          (n0::DOUBLE / p0 - n::DOUBLE) * (n0::DOUBLE / p0 - n::DOUBLE)
            / (n::DOUBLE * (1.0 - p0) / p0 - n::DOUBLE * ybar) AS score
        FROM s)
      SELECT n, n0, round(ybar, 9) AS mean_orders,
        round(p0_obs, 9) AS p0_obs, round(p0, 9) AS p0_poisson,
        round(score, 6) AS score_stat,
        round(2.0 * ${graft.ops.Portable.normCdfUpper("sqrt(score)")}, 9)
          AS p_value,
        CASE WHEN score > 3.841 THEN 'zero_inflated' ELSE 'poisson_ok'
          END AS verdict
      FROM st"""))

  // ---------- q411: Atkinson inequality indices -------------------------

  /** Atkinson inequality indices A(ε=1) and A(ε=2) of customer
    * lifetime spend per nation — the WELFARE-WEIGHTED members of the
    * inequality family (q99 Gini is rank-based, q188 Theil is
    * entropy-based): A(1) = 1 − geomean/mean and A(2) = 1 −
    * harmonic/mean make the inequality-aversion parameter explicit,
    * and A(2) > A(1) everywhere quantifies how much of each nation's
    * revenue concentration sits in the LOW tail (small accounts) that
    * Gini underweights — the read a market-coverage planner wants
    * next to q189's HHI. Both reduce to three per-row terms (cents,
    * ln cents pinned to nano, 10¹⁵/cents pinned integer) summed
    * DECIMAL-exact and order-free; scale-invariance of A makes the
    * cent units safe. One grouped pass over orders, two broadcast
    * dimension joins, one bounded (≤|nations|) reduce.
    */
  private val q411 = QueryDef(
    "q411_atkinson_index",
    (s, dir) => {
      val sp = Fixtures.table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(round(o_totalprice * 100.0) AS BIGINT)"))
          .as("cents"))
      val pts = sp
        .join(Fixtures.table(s, dir, "customer"),
          col("c_custkey") === col("o_custkey"))
        .join(broadcast(Fixtures.table(s, dir, "nation")),
          col("n_nationkey") === col("c_nationkey"))
        .select(col("n_name"), col("cents"))
      pts.groupBy(col("n_name"))
        .agg(count(lit(1)).as("n"),
          sum(col("cents").cast(DecimalType(38, 0))).as("sc"),
          sum(expr("CAST(round(ln(CAST(cents AS DOUBLE)) " +
            "* 1000000000.0) AS BIGINT)").cast(DecimalType(38, 0)))
            .as("sln"),
          sum(expr("CAST(round(CAST(1000000000000000 AS DOUBLE) " +
            "/ CAST(cents AS DOUBLE)) AS BIGINT)")
            .cast(DecimalType(38, 0))).as("sinv"))
        .select(col("n_name"), col("n"),
          round(col("sc").cast("double") / col("n").cast("double")
            / 100.0, 2).as("mean_spend"),
          round(lit(1.0) - exp(col("sln").cast("double") / 1.0e9
            / col("n").cast("double"))
            / (col("sc").cast("double") / col("n").cast("double")), 9)
            .as("atkinson_1"),
          round(lit(1.0) - (col("n").cast("double")
            / (col("sinv").cast("double") / 1.0e15))
            / (col("sc").cast("double") / col("n").cast("double")), 9)
            .as("atkinson_2"))
        .orderBy(col("n_name"))
    },
    Some("""WITH sp AS (SELECT o_custkey,
          sum(CAST(round(o_totalprice * 100.0) AS BIGINT))::BIGINT
            AS cents
        FROM orders GROUP BY 1),
      pts AS (SELECT n_name, cents FROM sp
        JOIN customer ON c_custkey = o_custkey
        JOIN nation ON n_nationkey = c_nationkey),
      agg AS (SELECT n_name, count(*)::BIGINT AS n,
          sum(cents::HUGEINT) AS sc,
          sum(CAST(round(ln(cents::DOUBLE) * 1000000000.0) AS BIGINT)
            ::HUGEINT) AS sln,
          sum(CAST(round(CAST(1000000000000000 AS DOUBLE)
            / cents::DOUBLE) AS BIGINT)::HUGEINT) AS sinv
        FROM pts GROUP BY 1)
      SELECT n_name, n,
        round(sc::DOUBLE / n::DOUBLE / 100.0, 2) AS mean_spend,
        round(1.0 - exp(sln::DOUBLE / 1.0e9 / n::DOUBLE)
          / (sc::DOUBLE / n::DOUBLE), 9) AS atkinson_1,
        round(1.0 - (n::DOUBLE / (sinv::DOUBLE / 1.0e15))
          / (sc::DOUBLE / n::DOUBLE), 9) AS atkinson_2
      FROM agg ORDER BY n_name"""))

  // ---------- q412: binned distance correlation -------------------------

  /** Distance correlation over two column pairs — the
    * NONLINEAR-dependence audit the association family lacks (q75
    * Pearson and q234/q295 rank measures only see monotone trends;
    * q168 MI needs a grid too but loses the [0,1] "0 iff independent"
    * calibration dCor carries): pair `qty_vs_price` asks whether line
    * quantity predicts line price (the business expectation), pair
    * `items_vs_totalqty` (order width vs order volume, mechanically
    * coupled) is the positive control proving the estimator isn't
    * just returning zero. Values ride the q295 binned convention, so
    * the cell table is bounded by the VALUE RANGES (≤ ~130 cells),
    * never the corpus; the V-statistic then expands EXACTLY as
    * S₁ − 2S₂ + S₃ where every Sᵢ is an integer sum over cell pairs
    * (DECIMAL-lifted — w·ra·rb crosses int64 fast), so no double
    * centering matrix, no per-point n² work, and the reduce is
    * order-free. Per pair: one corpus scan into cells, one broadcast
    * cell self-join (≤ 130² rows), three exact moments; Pearson from
    * the same cells for the linear-vs-total contrast. 2-row output.
    */
  private val q412 = QueryDef(
    "q412_distance_correlation",
    (s, dir) => {
      def dcor(cells0: DataFrame, label: String): DataFrame = {
        val cells = cells0.groupBy(col("bx"), col("by"))
          .agg(count(lit(1)).as("w"))
        val c2 = cells.select(col("bx").as("bx2"), col("by").as("by2"),
          col("w").as("w2"))
        val pr = cells.crossJoin(broadcast(c2))
          .select(col("bx"), col("by"), col("w"), col("w2"),
            abs(col("bx") - col("bx2")).as("a"),
            abs(col("by") - col("by2")).as("b"))
        val rws = pr.groupBy(col("bx"), col("by"), col("w"))
          .agg(sum((col("w2") * col("a")).cast(DecimalType(38, 0)))
            .as("ra"),
            sum((col("w2") * col("b")).cast(DecimalType(38, 0)))
            .as("rb"))
        val tot = rws.agg(sum(col("w")).as("n"),
          count(lit(1)).as("n_cells"),
          sum(col("w").cast(DecimalType(38, 0)) * col("ra")).as("ta"),
          sum(col("w").cast(DecimalType(38, 0)) * col("rb")).as("tb"))
        val s1 = pr.agg(
          sum(col("w").cast(DecimalType(38, 0)) * col("w2") * col("a")
            * col("b")).as("sab"),
          sum(col("w").cast(DecimalType(38, 0)) * col("w2") * col("a")
            * col("a")).as("saa"),
          sum(col("w").cast(DecimalType(38, 0)) * col("w2") * col("b")
            * col("b")).as("sbb"))
        val s2 = rws.agg(
          sum(col("w").cast(DecimalType(38, 0)) * col("ra") * col("rb"))
            .as("qab"),
          sum(col("w").cast(DecimalType(38, 0)) * col("ra") * col("ra"))
            .as("qaa"),
          sum(col("w").cast(DecimalType(38, 0)) * col("rb") * col("rb"))
            .as("qbb"))
        val p = cells.agg(sum(col("w")).as("np"),
          sum(col("w") * col("bx")).as("sx"),
          sum(col("w") * col("by")).as("sy"),
          sum((col("w") * col("bx") * col("bx"))
            .cast(DecimalType(38, 0))).as("sxx"),
          sum((col("w") * col("by") * col("by"))
            .cast(DecimalType(38, 0))).as("syy"),
          sum((col("w") * col("bx") * col("by"))
            .cast(DecimalType(38, 0))).as("sxy"))
        val nD = col("n").cast("double")
        def term(x: String, q: String, t1: String, t2: String) =
          (col(x).cast("double") / nD / nD) -
            (lit(2.0) * col(q).cast("double") / nD / nD / nD) +
            (col(t1).cast("double") * col(t2).cast("double") /
              nD / nD / nD / nD)
        tot.crossJoin(broadcast(s1)).crossJoin(broadcast(s2))
          .crossJoin(broadcast(p))
          .select(lit(label).as("pair"), col("n"), col("n_cells"),
            round(sqrt(greatest(term("sab", "qab", "ta", "tb"),
              lit(0.0)) / sqrt(term("saa", "qaa", "ta", "ta")
                * term("sbb", "qbb", "tb", "tb"))), 9).as("dcor"),
            round((col("np").cast("double") * col("sxy").cast("double")
              - col("sx").cast("double") * col("sy").cast("double"))
              / sqrt((col("np").cast("double")
                  * col("sxx").cast("double") - col("sx").cast("double")
                  * col("sx").cast("double"))
                * (col("np").cast("double") * col("syy").cast("double")
                  - col("sy").cast("double") * col("sy").cast("double"))),
              9).as("pearson_r"))
      }
      val li = Fixtures.table(s, dir, "lineitem")
      val pair1 = li.select(
        expr("CAST(l_quantity AS BIGINT) div 5").as("bx"),
        expr("CAST(floor(l_extendedprice / 10000.0) AS BIGINT)")
          .as("by"))
      val pair2 = li.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("ni"),
          expr("CAST(sum(l_quantity) AS BIGINT)").as("sq"))
        .select(col("ni").as("bx"), expr("sq div 20").as("by"))
      dcor(pair1, "qty_vs_price")
        .unionAll(dcor(pair2, "items_vs_totalqty"))
        .orderBy(col("pair"))
    },
    Some("""WITH p1 AS (SELECT CAST(l_quantity AS BIGINT) // 5 AS bx,
          CAST(floor(l_extendedprice / 10000.0) AS BIGINT) AS by
        FROM lineitem),
      p2 AS (SELECT count(*)::BIGINT AS bx,
          CAST(sum(l_quantity) AS BIGINT) // 20 AS by
        FROM lineitem GROUP BY l_orderkey),
      c1 AS (SELECT bx, by, count(*)::BIGINT AS w FROM p1 GROUP BY 1, 2),
      c2 AS (SELECT bx, by, count(*)::BIGINT AS w FROM p2 GROUP BY 1, 2),
      pr1 AS (SELECT a.bx, a.by, a.w, b.w AS w2,
          abs(a.bx - b.bx)::BIGINT AS a, abs(a.by - b.by)::BIGINT AS b
        FROM c1 a, c1 b),
      pr2 AS (SELECT a.bx, a.by, a.w, b.w AS w2,
          abs(a.bx - b.bx)::BIGINT AS a, abs(a.by - b.by)::BIGINT AS b
        FROM c2 a, c2 b),
      rw1 AS (SELECT bx, by, w, sum(w2::HUGEINT * a) AS ra,
          sum(w2::HUGEINT * b) AS rb FROM pr1 GROUP BY 1, 2, 3),
      rw2 AS (SELECT bx, by, w, sum(w2::HUGEINT * a) AS ra,
          sum(w2::HUGEINT * b) AS rb FROM pr2 GROUP BY 1, 2, 3),
      one AS (
        SELECT 'qty_vs_price' AS pair,
          (SELECT sum(w)::BIGINT FROM rw1) AS n,
          (SELECT count(*)::BIGINT FROM rw1) AS n_cells,
          (SELECT sum(w::HUGEINT * ra) FROM rw1) AS ta,
          (SELECT sum(w::HUGEINT * rb) FROM rw1) AS tb,
          (SELECT sum(w::HUGEINT * w2 * a * b) FROM pr1) AS sab,
          (SELECT sum(w::HUGEINT * w2 * a * a) FROM pr1) AS saa,
          (SELECT sum(w::HUGEINT * w2 * b * b) FROM pr1) AS sbb,
          (SELECT sum(w::HUGEINT * ra * rb) FROM rw1) AS qab,
          (SELECT sum(w::HUGEINT * ra * ra) FROM rw1) AS qaa,
          (SELECT sum(w::HUGEINT * rb * rb) FROM rw1) AS qbb,
          (SELECT sum(w * bx)::BIGINT FROM c1) AS sx,
          (SELECT sum(w * by)::BIGINT FROM c1) AS sy,
          (SELECT sum(w::HUGEINT * bx * bx) FROM c1) AS sxx,
          (SELECT sum(w::HUGEINT * by * by) FROM c1) AS syy,
          (SELECT sum(w::HUGEINT * bx * by) FROM c1) AS sxy
        UNION ALL
        SELECT 'items_vs_totalqty',
          (SELECT sum(w)::BIGINT FROM rw2),
          (SELECT count(*)::BIGINT FROM rw2),
          (SELECT sum(w::HUGEINT * ra) FROM rw2),
          (SELECT sum(w::HUGEINT * rb) FROM rw2),
          (SELECT sum(w::HUGEINT * w2 * a * b) FROM pr2),
          (SELECT sum(w::HUGEINT * w2 * a * a) FROM pr2),
          (SELECT sum(w::HUGEINT * w2 * b * b) FROM pr2),
          (SELECT sum(w::HUGEINT * ra * rb) FROM rw2),
          (SELECT sum(w::HUGEINT * ra * ra) FROM rw2),
          (SELECT sum(w::HUGEINT * rb * rb) FROM rw2),
          (SELECT sum(w * bx)::BIGINT FROM c2),
          (SELECT sum(w * by)::BIGINT FROM c2),
          (SELECT sum(w::HUGEINT * bx * bx) FROM c2),
          (SELECT sum(w::HUGEINT * by * by) FROM c2),
          (SELECT sum(w::HUGEINT * bx * by) FROM c2))
      SELECT pair, n, n_cells,
        round(sqrt(greatest(
            sab::DOUBLE / n::DOUBLE / n::DOUBLE
              - 2.0 * qab::DOUBLE / n::DOUBLE / n::DOUBLE / n::DOUBLE
              + ta::DOUBLE * tb::DOUBLE / n::DOUBLE / n::DOUBLE
                / n::DOUBLE / n::DOUBLE, 0.0)
          / sqrt((saa::DOUBLE / n::DOUBLE / n::DOUBLE
              - 2.0 * qaa::DOUBLE / n::DOUBLE / n::DOUBLE / n::DOUBLE
              + ta::DOUBLE * ta::DOUBLE / n::DOUBLE / n::DOUBLE
                / n::DOUBLE / n::DOUBLE)
            * (sbb::DOUBLE / n::DOUBLE / n::DOUBLE
              - 2.0 * qbb::DOUBLE / n::DOUBLE / n::DOUBLE / n::DOUBLE
              + tb::DOUBLE * tb::DOUBLE / n::DOUBLE / n::DOUBLE
                / n::DOUBLE / n::DOUBLE))), 9) AS dcor,
        round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
          / sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
            * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 9)
          AS pearson_r
      FROM one ORDER BY pair"""))

  // ---------- q492: snapshot diff (CDC classify) ------------------------

  /** Change-data-capture reconciliation between two table snapshots —
    * the operator the reference's at-least-once watermark export makes
    * necessary downstream (SURVEY §2.9: re-delivered windows mean the
    * warehouse holds OVERLAPPING snapshots; the consumer must classify
    * per key what actually changed). Snapshots are carved
    * deterministically from `orders`: the old snapshot misses keys
    * ≡3 (mod 97) (later inserts), the new snapshot misses keys ≡7
    * (mod 89) (deletes) and perturbs the cent value of keys ≡5
    * (mod 13) (updates). One FULL OUTER equi-join on the key
    * classifies every key into insert/update/delete/unchanged, with
    * cent-exact value sums per class for the reconciliation ledger.
    * Shape: the single sort-merge join on the key IS the whole
    * operator; at 100 TB both snapshots are bucketed by key and the
    * join co-locates shuffle-free, and the classify+sum is one
    * map-side pass over the joined stream. 4-row output. All money
    * handled in integer cents (one deterministic round per row).
    */
  private val q492 = QueryDef(
    "q492_snapshot_diff",
    (s, dir) => {
      val base = Fixtures.table(s, dir, "orders")
        .select(col("o_orderkey").as("k"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val snapOld = base.where(expr("k % 97 <> 3"))
        .select(col("k"), col("cents").as("v_old"))
      val snapNew = base.where(expr("k % 89 <> 7"))
        .select(col("k"),
          (col("cents") + expr(
            "CASE WHEN k % 13 = 5 THEN k % 100 + 1 ELSE 0 END"))
            .as("v_new"))
      snapOld.join(snapNew, Seq("k"), "full_outer")
        .select(
          when(col("v_old").isNull, "insert")
            .when(col("v_new").isNull, "delete")
            .when(col("v_old") =!= col("v_new"), "update")
            .otherwise("unchanged").as("status"),
          col("v_old"), col("v_new"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_keys"),
          sum(coalesce(col("v_old"), lit(0L))).as("sum_old_cents"),
          sum(coalesce(col("v_new"), lit(0L))).as("sum_new_cents"))
        .orderBy("status")
    },
    Some("""WITH base AS (SELECT o_orderkey AS k,
          CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      so AS (SELECT k, cents AS v_old FROM base WHERE k % 97 <> 3),
      sn AS (SELECT k, cents + CASE WHEN k % 13 = 5 THEN k % 100 + 1
          ELSE 0 END AS v_new
        FROM base WHERE k % 89 <> 7),
      j AS (SELECT
          CASE WHEN v_old IS NULL THEN 'insert'
            WHEN v_new IS NULL THEN 'delete'
            WHEN v_old <> v_new THEN 'update'
            ELSE 'unchanged' END AS status, v_old, v_new
        FROM so FULL JOIN sn USING (k))
      SELECT status, count(*)::BIGINT AS n_keys,
        sum(coalesce(v_old, 0))::BIGINT AS sum_old_cents,
        sum(coalesce(v_new, 0))::BIGINT AS sum_new_cents
      FROM j GROUP BY status ORDER BY status"""))

  // ---------- q501: snapshot value-profile drift -------------------------

  /** Column-level VALUE drift between two table snapshots — the data
    * counterpart of the reference's schema dump (its MD5 gate catches
    * structural change; nothing catches a column whose VALUES quietly
    * shift): per column, both snapshots are profiled to (row count,
    * distinct count, min, max, order-independent content fingerprint)
    * and compared. The snapshots reuse q492's deterministic carve and
    * add two value drifts on the new side — perturbed cents (q492's
    * update rule) and a NEW ENUM VALUE in o_orderpriority (keys ≡2
    * mod 17 become 'UNKNOWN', the classic upstream-code-change
    * signature). String columns profile through their h32 hash (what
    * a profiler stores when values aren't ordinal — ranges are
    * hash-ranges, the fingerprint is the drift signal); everything is
    * exact int64, the fingerprint a sum of bounded residues. Shape:
    * each snapshot is ONE scan fanned 5-wide by `stack` inside the
    * projection (no join, no window), profiles are a 10-cell
    * aggregate, the comparison a 5-row join. |columns|-row output.
    */
  private val q501 = QueryDef(
    "q501_snapshot_profile_drift",
    (s, dir) => {
      val h = (e: String) => Portable.h32Spark(e)
      def snap(isNew: Boolean): DataFrame = {
        // spread (r15): the 5-wide stack + two per-row md5s otherwise
        // run serial in the single-row-group scan task, twice
        val base = Fixtures.spread(s, dir, "orders")
          .select(col("o_orderkey").as("k"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents0"),
            expr("CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT)")
              .as("oday"),
            col("o_custkey"), col("o_orderpriority"), col("o_orderstatus"))
        val carved =
          if (!isNew) base.where(expr("k % 97 <> 3"))
            .withColumn("cents", col("cents0"))
            .withColumn("prio", col("o_orderpriority"))
          else base.where(expr("k % 89 <> 7"))
            .withColumn("cents", col("cents0") + expr(
              "CASE WHEN k % 13 = 5 THEN k % 100 + 1 ELSE 0 END"))
            .withColumn("prio", expr(
              "CASE WHEN k % 17 = 2 THEN 'UNKNOWN' ELSE o_orderpriority END"))
        carved.select(expr(s"""stack(5,
            'cents', cents,
            'custkey', o_custkey,
            'oday', oday,
            'priority', ${h("prio")},
            'status', ${h("o_orderstatus")})""").as(Seq("cname", "v")))
      }
      def profile(df: DataFrame, sfx: String) = df
        .groupBy(col("cname"))
        .agg(count(lit(1)).as(s"n_$sfx"),
          countDistinct(col("v")).as(s"nd_$sfx"),
          min(col("v")).as(s"min_$sfx"), max(col("v")).as(s"max_$sfx"),
          sum(col("v") % 1048573L).as(s"fp_$sfx"))
      profile(snap(isNew = false), "old")
        .join(profile(snap(isNew = true), "new"), "cname")
        .select(col("cname"), col("n_old"), col("n_new"),
          col("nd_old"), col("nd_new"),
          col("min_old"), col("max_old"), col("min_new"), col("max_new"),
          (col("fp_old") =!= col("fp_new")).as("content_drift"),
          (col("min_new") < col("min_old")
            || col("max_new") > col("max_old")).as("range_widened"),
          (col("nd_new") > col("nd_old")).as("new_values"))
        .orderBy("cname")
    },
    Some {
      val hD = (e: String) => Portable.h32Duck(e)
      def snapSql(isNew: Boolean): String = {
        val (filter, cents, prio) =
          if (!isNew) ("k % 97 <> 3", "cents0",
            "o_orderpriority")
          else ("k % 89 <> 7",
            "cents0 + CASE WHEN k % 13 = 5 THEN k % 100 + 1 ELSE 0 END",
            "CASE WHEN k % 17 = 2 THEN 'UNKNOWN' ELSE o_orderpriority END")
        s"""SELECT 'cents' AS cname, $cents AS v FROM b WHERE $filter
          UNION ALL SELECT 'custkey', o_custkey FROM b WHERE $filter
          UNION ALL SELECT 'oday', oday FROM b WHERE $filter
          UNION ALL SELECT 'priority', ${hD(s"($prio)")} FROM b
            WHERE $filter
          UNION ALL SELECT 'status', ${hD("o_orderstatus")} FROM b
            WHERE $filter"""
      }
      s"""WITH b AS (SELECT o_orderkey AS k,
          CAST(round(o_totalprice * 100) AS BIGINT) AS cents0,
          CAST(datediff('day', DATE '1970-01-01', o_orderdate)
            AS BIGINT) AS oday,
          o_custkey, o_orderpriority, o_orderstatus FROM orders),
      po AS (SELECT cname, count(*)::BIGINT AS n_old,
          count(DISTINCT v)::BIGINT AS nd_old,
          min(v)::BIGINT AS min_old, max(v)::BIGINT AS max_old,
          sum(v % 1048573)::BIGINT AS fp_old
        FROM (${snapSql(isNew = false)}) GROUP BY cname),
      pn AS (SELECT cname, count(*)::BIGINT AS n_new,
          count(DISTINCT v)::BIGINT AS nd_new,
          min(v)::BIGINT AS min_new, max(v)::BIGINT AS max_new,
          sum(v % 1048573)::BIGINT AS fp_new
        FROM (${snapSql(isNew = true)}) GROUP BY cname)
      SELECT cname, n_old, n_new, nd_old, nd_new,
        min_old, max_old, min_new, max_new,
        (fp_old <> fp_new) AS content_drift,
        (min_new < min_old OR max_new > max_old) AS range_widened,
        (nd_new > nd_old) AS new_values
      FROM po JOIN pn USING (cname) ORDER BY cname"""
    })

  // ---------- q517: previous-order gap features (strict as-of) ----------

  /** Repeat-purchase recency features: every order joined to the SAME
    * customer's most recent STRICTLY EARLIER order — the native as-of
    * join's `strict` knob (pandas allow_exact_matches=false), which is
    * what makes a self-as-of well-defined: inclusive matching would
    * return the row itself at distance zero. First orders survive
    * null-extended (left outer). Emits the inter-order gap in days —
    * the recency feature a churn/LTV model trains on. Oracle: DuckDB
    * ASOF LEFT JOIN with the strict inequality (l.date > r.date).
    * Scale: one self-clustered shuffle pair on o_custkey, merge O(1);
    * ties on (custkey, date) can't leak the self-row back in (strict
    * excludes the whole equal-time class, self included).
    */
  private val q517 = QueryDef(
    "q517_prev_order_gap",
    (s, dir) => {
      val o = Fixtures.table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val prev = o.select(col("o_custkey").as("p_custkey"),
        col("o_orderdate").as("prev_date"),
        col("o_orderkey").as("p_orderkey"))
      // self-as-of over the full orders table: fact-scale both sides,
      // merge exec pinned (q510's convention)
      graft.plans.AsOf.asofJoin(o, prev,
        Seq("o_custkey"), Seq("p_custkey"), "o_orderdate", "prev_date",
        rightTieBreak = Seq("p_orderkey"), leftOuter = true, strict = true,
        broadcast = Some(false))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("prev_date"),
          expr("CAST(timestampdiff(DAY, prev_date, o_orderdate) AS BIGINT)")
            .as("gap_days"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT l.o_orderkey, l.o_custkey, l.o_orderdate,
      r.o_orderdate AS prev_date,
      date_diff('day', r.o_orderdate, l.o_orderdate)::BIGINT AS gap_days
      FROM orders l ASOF LEFT JOIN orders r
      ON l.o_custkey = r.o_custkey AND l.o_orderdate > r.o_orderdate
      ORDER BY l.o_orderkey"""))

  // ---------- q522: broadcast as-of — calendar-bounded dimension --------

  /** The canonical BroadcastAsOfJoinExec shape, with a dimension that
    * is small AT ANY CORPUS SIZE: "policy revisions" = the distinct
    * (priority, month-start) pairs that saw a >480 k order — bounded
    * by 5 priorities × months-in-history (~400 rows forever, calendar-
    * bounded), while the fact side grows with the corpus. Each order
    * is enriched with the latest revision ≤ its own date (left-outer:
    * orders before their priority's first revision survive null).
    * `broadcast = Some(true)` is PINNED — unlike q512's stats-adaptive
    * pick, this dim is known-small at 100 TB, so the fact table must
    * never shuffle: the plan is scan → broadcast probe → aggregate-
    * free projection, zero fact-side exchanges (BroadcastAsOfJoinSpec
    * asserts the exec's contract; PLANS.md shows the shape). The
    * per-executor index build is once per broadcast (weak-keyed memo).
    * Oracle: DuckDB ASOF LEFT JOIN against the same derived dim.
    */
  private val q522 = QueryDef(
    "q522_asof_policy_lookup",
    (s, dir) => {
      val o = Fixtures.table(s, dir, "orders")
      val facts = o.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderpriority"), col("o_orderdate"))
      val dim = o.where(col("o_totalprice") > 480000.0)
        .select(col("o_orderpriority").as("p_priority"),
          // cast back to the facts' TIMESTAMP_NTZ (date_trunc yields
          // TIMESTAMP; value-identical under the UTC session zone)
          date_trunc("month", col("o_orderdate")).cast("timestamp_ntz")
            .as("policy_ts"))
        .distinct()
      graft.plans.AsOf.asofJoin(facts, dim,
        Seq("o_orderpriority"), Seq("p_priority"),
        "o_orderdate", "policy_ts",
        leftOuter = true, broadcast = Some(true))
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_orderdate"), col("policy_ts"),
          expr("CAST(timestampdiff(DAY, policy_ts, o_orderdate) AS BIGINT)")
            .as("days_since_policy"))
        .orderBy("o_orderkey")
    },
    Some("""WITH d AS (SELECT DISTINCT o_orderpriority AS p_priority,
        date_trunc('month', o_orderdate) AS policy_ts
      FROM orders WHERE o_totalprice > 480000)
      SELECT o.o_orderkey, o.o_orderpriority, o.o_orderdate, d.policy_ts,
        date_diff('day', d.policy_ts, o.o_orderdate)::BIGINT
          AS days_since_policy
      FROM orders o ASOF LEFT JOIN d
      ON o.o_orderpriority = d.p_priority AND o.o_orderdate >= d.policy_ts
      ORDER BY o.o_orderkey"""))

  // ---------- q524: broadcast as-of, forward direction -------------------

  /** q522's calendar-bounded policy dim probed in the FORWARD
    * direction: each order → the NEXT policy revision at-or-after its
    * date (smallest policy_ts ≥ o_orderdate), left-outer so orders
    * after their priority's last revision survive null — "how long
    * until the rules change" exposure windows. Completes the gate
    * coverage of BroadcastAsOfJoinExec's direction matrix (q522
    * backward, here forward — the binary-search lower-bound path);
    * broadcast PINNED for the same calendar-bounded-dim reason.
    * Oracle: DuckDB ASOF LEFT JOIN with the reversed inequality.
    */
  private val q524 = QueryDef(
    "q524_asof_policy_forward",
    (s, dir) => {
      val o = Fixtures.table(s, dir, "orders")
      val facts = o.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderpriority"), col("o_orderdate"))
      val dim = o.where(col("o_totalprice") > 480000.0)
        .select(col("o_orderpriority").as("p_priority"),
          date_trunc("month", col("o_orderdate")).cast("timestamp_ntz")
            .as("policy_ts"))
        .distinct()
      graft.plans.AsOf.asofJoin(facts, dim,
        Seq("o_orderpriority"), Seq("p_priority"),
        "o_orderdate", "policy_ts",
        leftOuter = true, forward = true, broadcast = Some(true))
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_orderdate"), col("policy_ts"),
          expr("CAST(timestampdiff(DAY, o_orderdate, policy_ts) AS BIGINT)")
            .as("days_until_policy"))
        .orderBy("o_orderkey")
    },
    Some("""WITH d AS (SELECT DISTINCT o_orderpriority AS p_priority,
        date_trunc('month', o_orderdate) AS policy_ts
      FROM orders WHERE o_totalprice > 480000)
      SELECT o.o_orderkey, o.o_orderpriority, o.o_orderdate, d.policy_ts,
        date_diff('day', o.o_orderdate, d.policy_ts)::BIGINT
          AS days_until_policy
      FROM orders o ASOF LEFT JOIN d
      ON o.o_orderpriority = d.p_priority AND o.o_orderdate <= d.policy_ts
      ORDER BY o.o_orderkey"""))

  // ---------- q532: broadcast RANGE join — revisions inside a window ----

  /** The canonical BroadcastRangeJoinExec shape (round 14): q522's
    * calendar-bounded policy dim probed by INTERVAL — every revision
    * inside each order's own 30-day monitoring window
    * [o_orderdate, o_orderdate + 30 d], not just the latest-before
    * (as-of answers "which revision governs this order"; this answers
    * "how much churn does the order sit through"). The dim stays ≤ 5
    * priorities × months forever, so `broadcastHint = Some(true)` is
    * PINNED: the fact table never shuffles or sorts — scan → broadcast
    * probe loop (per-key time-sorted index, lower-bound bisection,
    * emit the run) → partial-aggregable count, zero fact-side
    * exchanges at 100 TB where the merge exec would shuffle the fact
    * twice. Left-outer keeps revision-free windows (count 0 via
    * count(col)'s null-skipping). BroadcastRangeJoinSpec pins the
    * exec-vs-exec matrix; this gates it end-to-end against the plain
    * DuckDB inequality LEFT JOIN.
    */
  private val q532 = QueryDef(
    "q532_range_policy_churn",
    (s, dir) => {
      val o = Fixtures.table(s, dir, "orders")
      val facts = o.select(col("o_orderkey"), col("o_orderpriority"),
          col("o_orderdate"))
        .withColumn("win_hi",
          expr("timestampadd(DAY, 30, o_orderdate)"))
      val dim = o.where(col("o_totalprice") > 480000.0)
        .select(col("o_orderpriority").as("p_priority"),
          date_trunc("month", col("o_orderdate")).cast("timestamp_ntz")
            .as("policy_ts"))
        .distinct()
      graft.plans.RangeJoinOps.rangeJoin(facts, dim,
        Seq("o_orderpriority"), Seq("p_priority"),
        "o_orderdate", "win_hi", "policy_ts",
        leftOuter = true, broadcastHint = Some(true))
        .groupBy(col("o_orderkey"))
        .agg(count(col("policy_ts")).as("n_revisions"),
          min(col("policy_ts")).as("first_revision"))
        .orderBy("o_orderkey")
    },
    Some("""WITH d AS (SELECT DISTINCT o_orderpriority AS p_priority,
        date_trunc('month', o_orderdate) AS policy_ts
      FROM orders WHERE o_totalprice > 480000)
      SELECT o.o_orderkey, count(d.policy_ts)::BIGINT AS n_revisions,
        min(d.policy_ts) AS first_revision
      FROM orders o LEFT JOIN d
      ON d.p_priority = o.o_orderpriority
      AND d.policy_ts >= o.o_orderdate
      AND d.policy_ts <= o.o_orderdate + INTERVAL 30 DAY
      GROUP BY 1 ORDER BY 1"""))

  val all: Seq[QueryDef] =
    Seq(q31, q32, q40, q41, q42, q45, q46, q58, q59, q60, q71, q74, q75,
      q77, q88, q89, q94, q105, q114, q147, q158, q160, q161, q162,
      q174, q175, q176, q181, q182, q186, q188, q189, q192, q196, q197,
      q203, q207, q208, q209, q210, q211, q212, q214, q218, q219, q221,
      q224, q226, q228, q229, q230, q231, q232, q233, q234, q235, q236,
      q237, q238, q239, q240, q241, q242, q243, q248, q252, q253, q254,
      q261, q263, q266, q267, q269, q270, q272, q275, q277, q281, q284,
      q285, q288, q289, q291, q292, q293, q294, q295, q296, q297, q301,
      q302, q303, q304, q306, q307, q311, q314, q315, q316, q317, q323,
      q325, q326, q327, q330, q333, q338, q340, q341, q342, q345, q348,
      q349, q350, q351, q352, q353, q355, q357, q358, q360, q361, q362,
      q363, q371, q372, q373, q374, q375, q383, q385, q388, q389, q397,
      q398, q400, q401, q403, q407, q408, q409, q410, q411, q412, q492,
      q501, q517, q522, q524, q532)
}
