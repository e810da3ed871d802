package graft.queries

import graft.{Fixtures, QueryDef}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational core: the reference's live operator set (SURVEY.md §2.1-§2.6
  * scans / watermark predicates / sort) plus the relational operators the
  * rebuilt engine supplies via Catalyst (joins, aggregation, windows,
  * distinct, top-k) exercised over the TPC-H-ish fixtures.
  *
  * Determinism rules (so DuckDB-oracle hashes match exactly):
  *  - every query ends with an explicit total ORDER BY;
  *  - double aggregates go through DECIMAL terms (exact sum, any order)
  *    and cast back to double — see `dsum`;
  *  - timestamps stay TIMESTAMP_NTZ (naive), matching DuckDB.
  *
  * Scale notes are on each query: what the plan does at 100 TB.
  */
object Relational {

  /** Order-independent exact sum of a double column: cast each term to
    * DECIMAL(18,scale) (exact for our fixed-point fixture data), sum
    * exactly, cast back. Survives any partitioning / AQE re-plan.
    */
  private def dsum(c: Column, scale: Int = 2): Column = {
    // r16 scaled-int64 form (see Analytics.dsum): every call site feeds
    // an exact ≤`scale`-decimal rational, so floor(c·10^s + 0.5)
    // recovers the integer the HALF_UP decimal cast produced; the sum
    // lifts to DECIMAL(38,0) and descales once per group, exactly.
    val m = math.pow(10, scale)
    (sum(floor(c * lit(m) + lit(0.5)).cast(DecimalType(38, 0)))
      / lit(m.toLong)).cast(DoubleType)
  }

  /** Same, for derived terms that need a deterministic per-row rounding
    * before the exact sum (e.g. price * (1-discount)) — for the exact
    * ≤4-decimal products at every call site, round()+cast and the
    * scaled floor produce the same integer.
    */
  private def dsumRound(c: Column, scale: Int = 4): Column = dsum(c, scale)

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Fixtures.table(s, dir, n)

  // --- S4: full scan + P1 projection (column pruning reaches the footer) --
  private val q01 = QueryDef(
    "q01_scan_project",
    (s, dir) => t(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
      .orderBy("n_nationkey"),
    Some("SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey"))

  // --- S5/P2: incremental scan, strict-> watermark predicate, pushed down.
  // Reference: db_extractor_full.py:383-396 (created_at > :wm ORDER BY).
  // At scale: the predicate is pushed to the parquet scan (PushedFilters),
  // so only row groups whose ts-max passes the watermark are read.
  private val q02 = QueryDef(
    "q02_incremental_watermark",
    (s, dir) => t(s, dir, "events")
      .filter(col("ts") > lit("2024-01-20 00:00:00").cast(TimestampNTZType))
      .orderBy("ts", "event_id"),
    Some("SELECT * FROM events WHERE ts > TIMESTAMP '2024-01-20 00:00:00' " +
      "ORDER BY ts, event_id"))

  // --- S6/P2: OR of two pushable predicates (created_at OR updated_at
  // shape, db_extractor_full.py:398-408).
  private val q03 = QueryDef(
    "q03_incremental_or",
    (s, dir) => t(s, dir, "events")
      .filter(col("ts") > lit("2024-01-28 00:00:00").cast(TimestampNTZType)
        || col("value") > lit(195.0))
      .orderBy("event_id"),
    Some("SELECT * FROM events WHERE ts > TIMESTAMP '2024-01-28 00:00:00' " +
      "OR value > 195.0 ORDER BY event_id"))

  // --- Aggregation (TPC-H Q1 shape): hash-agg with map-side partials;
  // one shuffle on the (tiny) group key. Scales linearly in input.
  private val q04 = QueryDef(
    "q04_agg_lineitem",
    (s, dir) => t(s, dir, "lineitem")
      .filter(col("l_shipdate") <=
        lit("2000-09-02 00:00:00").cast(TimestampNTZType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumRound(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
      cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      cast(sum(cast(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      cast(sum(cast(round(l_extendedprice * (1.0 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
      count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""".stripMargin))

  // --- Broadcast join chain: dims (region 5 rows, nation 25 rows) are
  // broadcast; the fact side streams with zero shuffle for the joins.
  private val q05 = QueryDef(
    "q05_join_broadcast",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region"))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          dsum(col("c_acctbal")).as("sum_acctbal"))
        .orderBy("r_name", "n_name")
    },
    Some("""SELECT r_name, n_name, count(*) AS n_cust,
      cast(sum(cast(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name"""))

  // --- Shuffle (sort-merge / shuffled-hash) join + agg + top-k (TPC-H Q3
  // shape). At 100 TB: orders/lineitem co-partition on orderkey (bucketing
  // in a real deployment); AQE handles skew. The final top-10 is a
  // TakeOrderedAndProject — no global sort materialization.
  private val q06 = QueryDef(
    "q06_join_agg_topk",
    (s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_orderstatus") =!= lit("F"))
      val l = t(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(dsumRound(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },
    Some("""SELECT o_orderkey, o_orderdate,
      cast(sum(cast(round(l_extendedprice * (1.0 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus <> 'F'
      GROUP BY o_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderkey LIMIT 10"""))

  // --- Anti join (NOT EXISTS): customers with no high-value order,
  // per segment (predicate keeps the result non-trivial at every SF).
  private val q07 = QueryDef(
    "q07_anti_join",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > lit(400000.0))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_no_big_order"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, count(*) AS n_no_big_order FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  // --- Semi join (EXISTS): suppliers that ship any high-quantity line.
  private val q08 = QueryDef(
    "q08_semi_join",
    (s, dir) => {
      val sup = t(s, dir, "supplier")
      val l = t(s, dir, "lineitem").filter(col("l_quantity") >= lit(49.0))
      sup.join(l, sup("s_suppkey") === l("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy("s_suppkey")
    },
    Some("""SELECT s_suppkey, s_name FROM supplier
      WHERE EXISTS (SELECT 1 FROM lineitem
        WHERE l_suppkey = s_suppkey AND l_quantity >= 49.0)
      ORDER BY s_suppkey"""))

  // --- Window function: per-customer top-3 orders by totalprice.
  // row_number ties broken by o_orderkey for determinism.
  private val q09 = QueryDef(
    "q09_window_topn",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rn"))
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
        row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  // --- Distinct / count-distinct (expand + two-phase agg in Spark).
  private val q10 = QueryDef(
    "q10_distinct",
    (s, dir) => t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust,
      count(*) AS n_orders FROM orders
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // --- Set op: UNION ALL + aggregate over both fixture "ledgers".
  private val q11 = QueryDef(
    "q11_union",
    (s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_nationkey").as("nationkey"),
          col("c_acctbal").as("acctbal"))
      val sup = t(s, dir, "supplier")
        .select(col("s_nationkey").as("nationkey"),
          col("s_acctbal").as("acctbal"))
      c.unionAll(sup)
        .groupBy(col("nationkey"))
        .agg(count(lit(1)).as("n"), dsum(col("acctbal")).as("sum_bal"))
        .orderBy("nationkey")
    },
    Some("""SELECT nationkey, count(*) AS n,
      cast(sum(cast(acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      FROM (SELECT c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer
            UNION ALL
            SELECT s_nationkey, s_acctbal FROM supplier)
      GROUP BY nationkey ORDER BY nationkey"""))

  // --- Scalar-function layer incl. the reference's JSON coercions
  // (db_extractor_full.py:151-158): timestamp → 'Y-M-D H:M:S.ffffff'
  // string, decimal → exact string. Pure per-row project: no shuffle,
  // whole-stage codegen, scales embarrassingly.
  private val q12 = QueryDef(
    "q12_coercions",
    (s, dir) => t(s, dir, "events")
      .filter(col("event_id") < lit(1000L))
      .select(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"),
        col("value").cast(DecimalType(12, 2)).cast(StringType)
          .as("value_str"),
        upper(col("event_type")).as("type_upper"),
        substring(col("props"), 1, 8).as("props_prefix"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
      strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
      cast(cast(value AS DECIMAL(12,2)) AS VARCHAR) AS value_str,
      upper(event_type) AS type_upper,
      substring(props, 1, 8) AS props_prefix
      FROM events WHERE event_id < 1000 ORDER BY event_id"""))

  // ---------- q62: single-pass column profiler -------------------------

  /** `ANALYZE TABLE`-style column statistics — per column: non-null
    * count, distinct count, min/max (rendered as strings so one result
    * schema covers every column type). All five columns profile in ONE
    * scan: Spark plans the multi-distinct aggregate with a single
    * Expand (one shuffle), and the wide single-row result is unpivoted
    * row-side with `stack` — at 100 TB this is one pass over the table
    * either way, where the naive per-column UNION would be five.
    *
    * min/max are computed in the column's native type and THEN cast to
    * string (min of the string rendering would order "10" < "9").
    * Doubles are excluded: the two engines' shortest-roundtrip float
    * formatting differs, so their profile belongs to a numeric-typed
    * variant, not this portable one.
    */
  private val profiledCols =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
      "o_orderpriority")

  private val q62 = QueryDef(
    "q62_profile",
    (s, dir) => {
      val aggs = profiledCols.flatMap { c =>
        Seq(count(col(c)).as(s"${c}_n"),
          countDistinct(col(c)).as(s"${c}_d"),
          min(col(c)).cast(StringType).as(s"${c}_min"),
          max(col(c)).cast(StringType).as(s"${c}_max"))
      }
      val stackArgs = profiledCols
        .map(c => s"'$c', ${c}_n, ${c}_d, ${c}_min, ${c}_max")
        .mkString(", ")
      // spread: the multi-countDistinct plans an Expand (one projection
      // per distinct group) into the scan stage; on the single-row-group
      // fixture that 6× fan-out ran serial (wall 1.90 s ≈ cpu 1.75 s).
      // r16: PROJECTED spread — the r15 full-row exchange (o_comment
      // included) was driver-measured slower than no spread at all; the
      // Expand only reads the five profiled columns, so only they cross
      // the exchange (guide §2.3)
      Fixtures.spreadDf(s, dir, "orders",
          Fixtures.table(s, dir, "orders")
            .select(profiledCols.map(col): _*))
        .agg(aggs.head, aggs.tail: _*)
        .select(expr(s"stack(${profiledCols.size}, $stackArgs) AS " +
          "(column_name, n_nonnull, n_distinct, min_str, max_str)"))
        .orderBy("column_name")
    },
    Some(profiledCols.map(c =>
      s"""SELECT '$c' AS column_name, count($c)::BIGINT AS n_nonnull,
        count(DISTINCT $c)::BIGINT AS n_distinct,
        min($c)::VARCHAR AS min_str, max($c)::VARCHAR AS max_str
      FROM orders""").mkString(" UNION ALL ") + " ORDER BY column_name"))

  // ---------- q106: referential-integrity audit -----------------------

  /** Orphan counts across every foreign-key edge of the warehouse —
    * including the cross-modal embeddings→documents edge — the
    * load-validation query run after each ingest (the reference
    * exports tables independently with per-table watermarks, SURVEY
    * §2.9, so a child table CAN land rows before its parent: this
    * audit is the detector). One row per FK edge: child rows, orphan
    * rows (left-anti against the parent key), and the exact orphan
    * rate. Each edge is a broadcast-able anti-join on the parent's
    * key column only (column-pruned scan; parent key sets ≪ child
    * row counts), and the 8 edge audits are independent — Spark runs
    * the unioned plan's branches concurrently. At 100 TB each
    * anti-join shuffles at most the child's key column, or none of it
    * when the parent key set broadcasts.
    */
  private val fkEdges = Seq(
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
      "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
      "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
      "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
      "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
      "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
      "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey",
      "region", "r_regionkey"),
    ("embeddings.vec_id->documents", "embeddings", "vec_id",
      "documents", "doc_id"))

  private val q106 = QueryDef(
    "q106_fk_audit",
    (s, dir) => {
      // r16 (guide §2.4 fewer passes/shuffles): the old form ran, per
      // edge, a separate child scan for the row count, a second child
      // scan anti-joined to the parent, and a crossJoin to pair the two
      // 1-row counts — 8 edges ≈ 24 stages of mostly scheduler latency
      // (measured 1.25 s wall vs 0.31 cpu-s), and lineitem was scanned
      // SIX times. Now each child table is scanned ONCE with one
      // broadcast LEFT OUTER join per outgoing edge and a single
      // aggregate emits every edge's (n_child, n_orphans) in one pass,
      // stack()ed to rows. Parent keys are primary keys (the old
      // comment already leaned on that to skip distinct), so the outer
      // join is row-preserving and "parent key IS NULL" counts exactly
      // the anti-join's orphans — including NULL child keys, which
      // match nothing under either form. Identical rows out; at 100 TB
      // this is 3 lineitem passes saved, with the per-edge shuffle
      // replaced by broadcast probes.
      val byChild = fkEdges.groupBy(_._2).toSeq.sortBy(_._1)
      val audits = byChild.map { case (child, edges) =>
        val cks = edges.map(_._3).distinct
        var c = t(s, dir, child).select(cks.map(col): _*)
        for (((_, _, ck, parent, pk), i) <- edges.zipWithIndex)
          c = c.join(
            broadcast(t(s, dir, parent).select(col(pk).as(s"pk_$i"))),
            col(ck) === col(s"pk_$i"), "left_outer")
        val aggs = count(lit(1)).as("n_child") +:
          edges.indices.map(i =>
            sum(when(col(s"pk_$i").isNull, 1L).otherwise(0L))
              .as(s"orph_$i"))
        val stackArgs = edges.zipWithIndex.map { case ((edge, _, _, _, _), i) =>
          s"'$edge', n_child, orph_$i, CAST(orph_$i AS DOUBLE) / n_child"
        }.mkString(", ")
        c.agg(aggs.head, aggs.tail: _*)
          .select(expr(s"stack(${edges.size}, $stackArgs) AS " +
            "(fk_edge, n_child, n_orphans, orphan_rate)"))
      }
      audits.reduce(_.unionAll(_)).orderBy("fk_edge")
    },
    Some(fkEdges.map { case (edge, child, ck, parent, pk) =>
      s"""SELECT '$edge' AS fk_edge,
        (SELECT count(*) FROM $child)::BIGINT AS n_child,
        (SELECT count(*) FROM $child c WHERE NOT EXISTS
          (SELECT 1 FROM $parent p WHERE p.$pk = c.$ck))::BIGINT
          AS n_orphans,
        (SELECT count(*) FROM $child c WHERE NOT EXISTS
          (SELECT 1 FROM $parent p WHERE p.$pk = c.$ck))::DOUBLE
          / (SELECT count(*) FROM $child) AS orphan_rate"""
    }.mkString(" UNION ALL ") + " ORDER BY fk_edge"))

  // ---------- q132: predicate-pushdown filter scan (TPC-H Q6 shape) ----

  /** The revenue-impact-of-discounts query — TPC-H Q6's shape, which
    * exists in every warehouse as the canonical "filter-scan + single
    * aggregate": three selective range predicates, two columns of
    * arithmetic, one row out. It earns its registry slot as the
    * pushdown showcase: all three predicates reach the parquet reader
    * as PushedFilters and the scan reads exactly four columns
    * (ReadSchema) — at 100 TB this query is min/max-statistics row-
    * group skipping plus a map-side partial sum, with nothing
    * shuffled but 1-row partials. Revenue terms are rounded to fixed
    * point per row and summed as exact DECIMAL (the dsumRound
    * contract), so the one number hash-matches.
    */
  private val q132 = QueryDef(
    "q132_filter_scan_revenue",
    (s, dir) => t(s, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01")
        && col("l_shipdate") < lit("1997-01-01")
        && col("l_discount").between(0.05, 0.07)
        && col("l_quantity") < 24)
      .agg(count(lit(1)).as("n_items"),
        dsumRound(col("l_extendedprice") * col("l_discount"))
          .as("lost_revenue")),
    Some("""SELECT count(*)::BIGINT AS n_items,
        sum(cast(round(l_extendedprice * l_discount, 4)
          AS DECIMAL(18,4)))::DOUBLE AS lost_revenue
      FROM lineitem
      WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""))

  // ---------- q135: shipping-delay percentiles -------------------------

  /** Days from order placement to line-item shipment, p50/p90/p99 per
    * order priority — the fulfillment-SLA query every order system
    * reports. Delay is an exact integer day difference (µs floor-div,
    * the q98 rule — calendar date_diff semantics diverge across
    * engines); the percentile is ⌈p·n⌉ rank selection, computed off a
    * (priority, delay) HISTOGRAM rather than a row sort: delay has a
    * small integer domain, so the exact value at rank r is the
    * smallest delay whose cumulative count reaches r — a groupBy that
    * pre-aggregates map-side to |priorities|×|delays| rows, then a
    * cumulative window over that tiny table. Tie-break columns are
    * unnecessary (equal delays are interchangeable AT a rank), so the
    * 100 TB plan shuffles the histogram, never the joined rows — the
    * low-cardinality analogue of the q149 boundary-broadcast rank.
    * The oracle keeps the full row_number() selection form —
    * agreement checks the histogram rank algebra against real ranks.
    */
  private val q135 = QueryDef(
    "q135_ship_delay_percentiles",
    (s, dir) => {
      val joined = t(s, dir, "lineitem")
        .select(col("l_orderkey"),
          expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', l_shipdate)")
            .as("ship_us"))
        .join(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate)")
              .as("ord_us")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          expr("(ship_us - ord_us) div 86400000000").as("delay_days"))
      val hist = joined
        .groupBy(col("o_orderpriority"), col("delay_days"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("o_orderpriority"))
      val cum = hist
        .withColumn("n", sum(col("c")).over(w))
        .withColumn("cum", sum(col("c")).over(
          w.orderBy(col("delay_days"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      cum
        .groupBy(col("o_orderpriority"), col("n"))
        .agg(
          min(when(col("cum") >= ceil(col("n") * lit(0.5)),
            col("delay_days"))).as("p50_days"),
          min(when(col("cum") >= ceil(col("n") * lit(0.9)),
            col("delay_days"))).as("p90_days"),
          min(when(col("cum") >= ceil(col("n") * lit(0.99)),
            col("delay_days"))).as("p99_days"))
        .select(col("o_orderpriority"), col("n").as("n_items"),
          col("p50_days"), col("p90_days"), col("p99_days"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH d AS (SELECT o_orderpriority, l_orderkey, l_linenumber,
          (epoch_us(l_shipdate) - epoch_us(o_orderdate)) // 86400000000
            AS delay_days
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
      ranked AS (SELECT *,
          row_number() OVER (PARTITION BY o_orderpriority
            ORDER BY delay_days, l_orderkey, l_linenumber) AS rn,
          count(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM d)
      SELECT o_orderpriority, n::BIGINT AS n_items,
        min(CASE WHEN rn = ceil(n * 0.5) THEN delay_days END)::BIGINT
          AS p50_days,
        min(CASE WHEN rn = ceil(n * 0.9) THEN delay_days END)::BIGINT
          AS p90_days,
        min(CASE WHEN rn = ceil(n * 0.99) THEN delay_days END)::BIGINT
          AS p99_days
      FROM ranked
      WHERE rn = ceil(n * 0.5) OR rn = ceil(n * 0.9)
        OR rn = ceil(n * 0.99)
      GROUP BY o_orderpriority, n ORDER BY o_orderpriority"""))

  // ---------- q136: above-group-average (decorrelation shape) ----------

  /** Customers whose total spend exceeds their NATION's average — the
    * classic correlated-subquery reporting shape. The oracle states it
    * AS the correlated subquery (the form analysts write); the Spark
    * plan is the decorrelated form Catalyst would rewrite to anyway,
    * made explicit: per-customer totals (one aggregate), the nation
    * average as a window over that |customers|-sized table (NOT a
    * second orders scan), filter, total order. Agreement proves the
    * rewrite is semantics-preserving on real data. DECIMAL-exact sums;
    * the average is one division; the comparison is on DECIMAL-derived
    * doubles computed identically both sides. Shape: one orders
    * shuffle on custkey + one window over customers — at 100 TB the
    * window input is customers, never orders.
    */
  private val q136 = QueryDef(
    "q136_above_avg_spenders",
    (s, dir) => {
      val spend = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("spent"))
        .join(t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
      val w = Window.partitionBy(col("c_nationkey"))
      spend
        .withColumn("nation_avg",
          sum(col("spent")).over(w).cast("double")
            / count(lit(1)).over(w))
        .where(col("spent").cast("double") > col("nation_avg"))
        .select(col("c_custkey"), col("c_nationkey"),
          col("spent").cast("double").as("spent"), col("nation_avg"))
        .orderBy("c_custkey")
    },
    Some("""WITH spend AS (SELECT o_custkey AS c_custkey, c_nationkey,
          sum(cast(o_totalprice AS DECIMAL(18,2))) AS spent
        FROM orders JOIN customer ON c_custkey = o_custkey
        GROUP BY 1, 2)
      SELECT c_custkey, c_nationkey, spent::DOUBLE AS spent,
        (SELECT sum(spent)::DOUBLE / count(*) FROM spend s2
          WHERE s2.c_nationkey = s1.c_nationkey) AS nation_avg
      FROM spend s1
      WHERE spent::DOUBLE > (SELECT sum(spent)::DOUBLE / count(*)
        FROM spend s3 WHERE s3.c_nationkey = s1.c_nationkey)
      ORDER BY c_custkey"""))

  // ---------- q169: cascading-delete impact audit ----------------------

  /** Right-to-erasure dry run: given a deletion predicate on the root
    * entity (customers with deeply negative balance — any predicate
    * slots in), report how many rows each downstream table loses when
    * the delete cascades customer → orders → lineitem. The FK walk is
    * two semi-joins — the victim key set is tiny relative to the fact
    * tables, so Spark broadcasts it at every hop and the fact tables
    * are never shuffled; each hop's key set feeds the next (orders'
    * keys for lineitem). Output is one row per affected table — the
    * compliance-report shape — with a stable table ordering.
    */
  private val q169 = QueryDef(
    "q169_cascade_delete",
    (s, dir) => {
      val victims = Fixtures.table(s, dir, "customer")
        .where(col("c_acctbal") < -900)
        .select(col("c_custkey"))
      val vOrders = Fixtures.table(s, dir, "orders")
        .join(broadcast(victims),
          col("o_custkey") === col("c_custkey"), "left_semi")
      val vLineitem = Fixtures.table(s, dir, "lineitem")
        .join(broadcast(vOrders.select(col("o_orderkey"))),
          Seq("l_orderkey" -> "o_orderkey").map(t =>
            col(t._1) === col(t._2)).reduce(_ && _), "left_semi")
      victims.agg(count(lit(1)).as("n_rows"))
        .select(lit("customer").as("tbl"), col("n_rows"))
        .unionAll(vOrders.agg(count(lit(1)).as("n_rows"))
          .select(lit("orders").as("tbl"), col("n_rows")))
        .unionAll(vLineitem.agg(count(lit(1)).as("n_rows"))
          .select(lit("lineitem").as("tbl"), col("n_rows")))
        .orderBy("tbl")
    },
    Some("""WITH victims AS (SELECT c_custkey FROM customer
        WHERE c_acctbal < -900),
      vo AS (SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM victims)),
      vl AS (SELECT 1 AS x FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM vo))
      SELECT tbl, n_rows::BIGINT AS n_rows FROM (
        SELECT 'customer' AS tbl, count(*) AS n_rows FROM victims
        UNION ALL SELECT 'orders', count(*) FROM vo
        UNION ALL SELECT 'lineitem', count(*) FROM vl)
      ORDER BY tbl"""))

  // ---------- q187: line-sequence contiguity audit --------------------

  /** Data-integrity audit of l_linenumber sequences: per order, are
    * the line numbers the contiguous run 1..n, and how many sequence
    * slots are missing (max − count; duplicates would drive it
    * negative, which the audit also surfaces)? Reported per order
    * status — the q106/q169 integrity family extended from referential
    * to ORDINAL integrity, the check an incremental exporter needs
    * before trusting l_linenumber as a stable dedup key. Shape: one
    * map-side-combined aggregate of lineitem on orderkey, joined to
    * orders ON THE SAME KEY (co-partitioned shuffles — at 100 TB with
    * both tables bucketed by orderkey this join is shuffle-free), then
    * a |status|-row rollup.
    */
  private val q187 = QueryDef(
    "q187_line_sequence_audit",
    (s, dir) => {
      val per = Fixtures.table(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_lines"),
          max(col("l_linenumber")).cast("long").as("max_ln"),
          min(col("l_linenumber")).as("min_ln"))
        .select(col("l_orderkey"),
          ((col("max_ln") === col("n_lines")) && (col("min_ln") === 1))
            .cast("long").as("contiguous"),
          (col("max_ln") - col("n_lines")).as("n_missing"))
      per.join(Fixtures.table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("contiguous")).as("n_contiguous"),
          sum(col("n_missing")).as("total_missing"),
          max(col("n_missing")).as("max_missing"))
        .select(col("o_orderstatus"), col("n_orders"), col("n_contiguous"),
          (col("n_contiguous").cast("double") / col("n_orders").cast("double"))
            .as("contiguous_share"),
          col("total_missing"), col("max_missing"))
        .orderBy("o_orderstatus")
    },
    Some("""WITH per AS (SELECT l_orderkey,
          CASE WHEN max(l_linenumber) = count(*)
            AND min(l_linenumber) = 1 THEN 1 ELSE 0 END AS contiguous,
          max(l_linenumber)::BIGINT - count(*) AS n_missing
        FROM lineitem GROUP BY 1)
      SELECT o_orderstatus, count(*) AS n_orders,
        sum(contiguous)::BIGINT AS n_contiguous,
        sum(contiguous)::DOUBLE / count(*)::DOUBLE AS contiguous_share,
        sum(n_missing)::BIGINT AS total_missing,
        max(n_missing)::BIGINT AS max_missing
      FROM per JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1 ORDER BY o_orderstatus"""))

  val all: Seq[QueryDef] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q62,
      q106, q132, q135, q136, q169, q187)
}
