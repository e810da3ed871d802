package graft.ops

import graft.{Fixtures, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temporal / event-stream operators over the `events` table. The
  * reference's only temporal semantics are watermark scans
  * (SURVEY.md §2.9, /root/reference/src/db_extractor_full.py:383-408);
  * these queries supply the event-analytics layer a warehouse consumer
  * builds on top of the exported stream: windowed aggregation, as-of
  * join, range join, sessionization, and JSON-property extraction.
  *
  * Determinism: all time arithmetic is integer microseconds
  * (`timestampdiff` / `epoch_us`), aggregated doubles go through the
  * DECIMAL-term convention (QueryDef.doc), every query ends in a total
  * ORDER BY.
  */
object Events {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Fixtures.table(s, dir, "events")

  /** Exact order-independent sum of a double column (see Relational).
    * r16: scaled-int64 form — `value` is exact 2-decimal in the fixture
    * contract (verified: 0 rows with value ≠ round(value,2)), so
    * floor(c·10⁴+0.5) recovers the exact integer the DECIMAL(18,4) cast
    * produced without the per-row Double.toString+BigDecimal parse;
    * descale is one exact (38,6) division per group. Bit-identical.
    */
  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (sum(floor(c * lit(10000.0) + lit(0.5)).cast(DecimalType(38, 0)))
      / lit(10000)).cast(DoubleType)

  // ---------- q24: tumbling-window aggregation ------------------------

  /** 6-hour tumbling windows via Spark's `window()` (epoch-aligned, same
    * alignment as DuckDB `time_bucket`). Map-side partial aggregation,
    * one shuffle on (window, event_type) — at 100 TB the window key is
    * derived, so partition pruning on a date-partitioned layout still
    * applies upstream.
    */
  private val q24 = QueryDef(
    "q24_window_agg",
    (s, dir) => ev(s, dir)
      .groupBy(window(col("ts"), "6 hours").getField("start").as("bucket"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy("bucket", "event_type"),
    Some("""SELECT time_bucket(INTERVAL '6 hours', ts) AS bucket, event_type,
      count(*) AS n,
      cast(sum(cast(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY bucket, event_type"""))

  // ---------- q25: as-of join -----------------------------------------

  /** For each purchase, the latest click by the same user at-or-before
    * the purchase time. Implemented with the scalable union trick: tag
    * both sides, one shuffle on user_id, a running `last(_, ignoreNulls)`
    * window — O(n log n) per user partition, no range-explosion join.
    * The oracle is DuckDB's *native* ASOF JOIN — an independent
    * implementation of the same semantics.
    * Clicks tie-ordered before purchases at equal ts (inclusive bound).
    */
  private val q25 = QueryDef(
    "q25_asof_join",
    (s, dir) => {
      val e = ev(s, dir)
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(0).as("side"),
          col("ts").as("click_ts"), lit(null).cast(LongType).as("event_id"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("side"),
          lit(null).cast(TimestampNTZType).as("click_ts"), col("event_id"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionAll(purchases)
        .withColumn("last_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
        .where(col("side") === 1 && col("last_click_ts").isNotNull)
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts"), col("last_click_ts"))
        .orderBy("purchase_id")
    },
    Some("""SELECT p.event_id AS purchase_id, p.user_id, p.ts,
      c.ts AS last_click_ts
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY purchase_id"""))

  // ---------- q26: range join (banded) --------------------------------

  /** Pairs of error events by the same user within 6 h of each other,
    * on the NATIVE interval-containment operator
    * ([[graft.plans.RangeJoinOps.rangeJoin]] → `RangeJoinExec`): each
    * left error carries the interval [ts, ts + 6 h], the right side is
    * the same error stream as points, and the co-partitioned
    * sliding-window merge emits exactly the in-interval pairs — no
    * banding constant, no duplicate candidates to `distinct` away, no
    * double scan (the old hand-banded form ran TWO bucket equi-joins +
    * an exact filter). Shuffle shape is unchanged (both sides
    * hash-clustered on user_id, as any equi-join would be); merge work
    * is linear + output; peak memory is the 6 h window's per-user
    * event density (the exec's `maxWindowRows` metric), never a key's
    * whole run. RangeJoinSpec pins the operator against the θ-join on
    * the mode matrix; BenchRange measures native vs banded across
    * widths and a hot-key point.
    * The oracle is the plain θ-join (exact, fine at oracle scale).
    */
  private val q26 = QueryDef(
    "q26_range_join",
    (s, dir) => {
      val BandUs = 21600000000L // 6 h in µs
      val err = ev(s, dir).where(col("event_type") === "error")
        .select(col("user_id"), col("event_id"),
          expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
            .as("us"))
      val a = err.select(col("user_id").as("u"), col("event_id").as("a_id"),
        col("us").as("a_us"), (col("us") + BandUs).as("a_hi"))
      val b = err.select(col("user_id").as("bu"), col("event_id").as("b_id"),
        col("us").as("b_us"))
      graft.plans.RangeJoinOps.rangeJoin(a, b,
        Seq("u"), Seq("bu"), "a_us", "a_hi", "b_us")
        .where(col("a_id") < col("b_id"))
        .select(col("u").as("user_id"), col("a_id"), col("b_id"),
          (col("b_us") - col("a_us")).as("dt_us"))
        .orderBy("user_id", "a_id", "b_id")
    },
    Some("""SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
      epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
      FROM (SELECT * FROM events WHERE event_type = 'error') a
      JOIN (SELECT * FROM events WHERE event_type = 'error') b
      ON a.user_id = b.user_id
      AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 6 HOUR
      AND a.event_id < b.event_id
      ORDER BY 1, 2, 3"""))

  // ---------- q27: sessionization (gaps-and-islands) ------------------

  /** 30-minute-inactivity sessions per user: lag → new-session flag →
    * running sum (the gaps-and-islands pattern; the streaming twin with
    * mapGroupsWithState lives in graft.streaming). One shuffle on
    * user_id; both windows reuse the same sort order.
    */
  /** Shared 30-min-gap session assignment — the gaps-and-islands window
    * pass (lag → flag → running sum) materialized ONCE per run via
    * PlanCache: q27 (session aggregate), q128 (co-occurrence
    * membership) and q129 (duration percentiles) all consume the same
    * per-event (user, session_seq) labeling, and the per-user window
    * sort it costs is the expensive part of all three.
    */
  private[ops] def sessionAssigned(s: SparkSession, dir: String): DataFrame =
    PlanCache.getOrBuild(s, dir, "sessions") {
      val GapUs = 1800000000L // 30 min
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("is_new",
          when(col("prev_ts").isNull
            || expr("timestampdiff(MICROSECOND, prev_ts, ts)") > GapUs, 1)
            .otherwise(0))
        .withColumn("session_seq", sum(col("is_new")).over(wRun))
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"), col("session_seq"))
    }

  private val q27 = QueryDef(
    "q27_sessionize",
    (s, dir) =>
      sessionAssigned(s, dir)
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id", "session_seq"),
    Some("""WITH flagged AS (
        SELECT user_id, ts, event_id,
          CASE WHEN lag(ts) OVER w IS NULL
            OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
            THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      numbered AS (
        SELECT user_id, ts,
          -- ::BIGINT: DuckDB integer sum() yields HUGEINT, which the
          -- driver's pandas hasher renders as float64 ("3.0" vs "3")
          (sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING))::BIGINT AS session_seq
        FROM flagged)
      SELECT user_id, session_seq, min(ts) AS session_start,
        max(ts) AS session_end, count(*) AS n_events
      FROM numbered GROUP BY user_id, session_seq
      ORDER BY user_id, session_seq"""))

  // ---------- q28: JSON property extraction ---------------------------

  /** The `props` column is a JSON document (the shape the reference's
    * export emits — SURVEY.md §2.7/K1). Extract + aggregate: pure
    * projection then one small shuffle. Integer math only.
    */
  private val q28 = QueryDef(
    "q28_json_extract",
    (s, dir) => ev(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type"),
    Some("""SELECT event_type, count(*) AS n,
      sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
      min(json_extract_string(props, '$.k')::BIGINT) AS min_k,
      max(json_extract_string(props, '$.k')::BIGINT) AS max_k
      FROM events GROUP BY event_type ORDER BY event_type"""))

  // ---------- q53: funnel analysis (ordered step sequence) ------------

  /** Per-user view → click → purchase funnel: the earliest view, the
    * earliest click strictly after it, the earliest purchase strictly
    * after that — the standard ordered-sequence conversion funnel.
    * Distributed shape: one tiny aggregate per step, each joined back
    * on user_id (broadcast-able — per-user step times are one row per
    * user regardless of event volume); no window over raw events, so
    * nothing corpus-wide is sorted. All comparisons are exact
    * timestamp minima; users who never reach a step carry NULLs.
    */
  private val q53 = QueryDef(
    "q53_funnel",
    (s, dir) => {
      val e = ev(s, dir)
      val v = e.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
      val c = e.where(col("event_type") === "click").join(v, "user_id")
        .where(col("ts") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
      val p = e.where(col("event_type") === "purchase").join(c, "user_id")
        .where(col("ts") > col("t_click"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
      v.join(c, Seq("user_id"), "left_outer")
        .join(p, Seq("user_id"), "left_outer")
        .orderBy("user_id")
    },
    Some("""WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
        JOIN v ON v.user_id = e.user_id AND e.ts > v.t_view
        WHERE e.event_type = 'click' GROUP BY 1),
      p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
        JOIN c ON c.user_id = e.user_id AND e.ts > c.t_click
        WHERE e.event_type = 'purchase' GROUP BY 1)
      SELECT v.user_id, t_view, t_click, t_purchase
      FROM v LEFT JOIN c ON c.user_id = v.user_id
      LEFT JOIN p ON p.user_id = v.user_id
      ORDER BY v.user_id"""))

  // ---------- q54: cohort retention ------------------------------------

  /** Weekly cohort retention: users grouped by first-seen week, counted
    * as retained in each later week they were active. All-integer
    * arithmetic (epoch-day → week index), so the matrix is bit-exact:
    * cohort_week = first active week since epoch, offset = active week
    * − cohort week. Two aggregates (per-user first day; per (user,
    * week) activity) then one count-distinct — shuffle keys are user
    * and (cohort, offset), never raw events.
    */
  private val q54 = QueryDef(
    "q54_cohort_retention",
    (s, dir) => {
      val days = ev(s, dir).select(col("user_id"),
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)" +
          " div 86400000000").as("day"))
      val first = days.groupBy(col("user_id"))
        .agg(min(col("day")).as("day0"))
      days.join(first, "user_id")
        .select(col("user_id"), expr("day0 div 7").as("cohort_week"),
          expr("(day - day0) div 7").as("offset_week"))
        .distinct()
        .groupBy(col("cohort_week"), col("offset_week"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "offset_week")
    },
    Some("""WITH days AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day
        FROM events),
      first AS (SELECT user_id, min(day) AS day0 FROM days GROUP BY 1),
      weeks AS (SELECT DISTINCT d.user_id, day0 // 7 AS cohort_week,
          (day - day0) // 7 AS offset_week
        FROM days d JOIN first f ON f.user_id = d.user_id)
      SELECT cohort_week, offset_week, count(*) AS n_users
      FROM weeks GROUP BY 1, 2 ORDER BY cohort_week, offset_week"""))

  // ---------- q56: native session windows -----------------------------

  /** q27's sessions via Spark's NATIVE `session_window` operator — the
    * idiomatic form (one aggregation, no explicit lag/flag/running-sum
    * windows) and the exact plan a streaming deployment gets from the
    * same expression. Boundary semantics differ from q27 by design:
    * `session_window` is half-open (an event at exactly gap after the
    * last one starts a NEW session), where q27's strict-> keeps it —
    * so this query carries its own oracle with `>=` in the island flag
    * rather than sharing q27's. One shuffle on (user_id, window);
    * Spark merges overlapping per-partition sessions in the same
    * aggregation pass.
    */
  private val q56 = QueryDef(
    "q56_session_window",
    (s, dir) => ev(s, dir)
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start"),
    Some("""WITH flagged AS (
        SELECT user_id, ts, event_id,
          CASE WHEN lag(ts) OVER w IS NULL
            OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
            THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      numbered AS (
        SELECT user_id, ts,
          (sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING))::BIGINT AS session_seq
        FROM flagged)
      SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        count(*) AS n_events
      FROM numbered GROUP BY user_id, session_seq
      ORDER BY user_id, session_start"""))

  // ---------- q61: SCD2 versioning from a change log ------------------

  /** Slowly-changing-dimension (type 2) build: compress each user's
    * event stream into versioned rows of their "current event_type" —
    * consecutive no-change events collapse, each surviving change opens
    * a version `[valid_from, valid_to)` closed by the next change
    * (`lead`), with the open version flagged current. This is the
    * standard warehouse history-table derivation from a CDC/change
    * stream (the consumer-side complement of the reference's
    * incremental export).
    *
    * Shape: two window passes over the same (user_id → ts, event_id)
    * partitioning — Catalyst plans ONE shuffle+sort and evaluates both
    * windows on it, so cost is a single sort within user partitions
    * regardless of corpus size. Ties on ts are broken by event_id in
    * both engines, keeping the collapse deterministic.
    */
  private val q61 = QueryDef(
    "q61_scd2",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      ev(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .where(col("prev").isNull || col("prev") =!= col("event_type"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("event_type"),
          col("ts").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
        .orderBy("user_id", "valid_from")
    },
    Some("""WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
          lag(event_type) OVER w AS prev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      changes AS (
        SELECT user_id, event_type, ts, event_id FROM ordered
        WHERE prev IS NULL OR prev <> event_type),
      versioned AS (
        SELECT user_id, event_type, ts AS valid_from,
          lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS valid_to
        FROM changes)
      SELECT user_id, event_type, valid_from, valid_to,
        (valid_to IS NULL) AS is_current
      FROM versioned ORDER BY user_id, valid_from"""))

  // ---------- q251: SCD2 point-in-time (AS OF) state --------------------

  /** Every user's state AS OF a fixed instant (2024-01-15 mid-corpus)
    * — the time-travel query run against q61's versioned table, but
    * implemented the Spark-first way: the point-in-time state is just
    * the LATEST change ≤ T per user, which is ONE argmax aggregate
    * (`max(struct(ts, event_id, event_type))` over the pre-filtered
    * scan — the q211 encoding, struct order IS the tiebreak), so the
    * engine never materializes version intervals, never runs a
    * window, and the T-predicate pushes into the parquet scan. The
    * ORACLE deliberately keeps the SCD2-interval form (build q61's
    * versioned CTE, filter valid_from ≤ T < valid_to) — agreement
    * proves the argmax shortcut equals interval semantics, including
    * consecutive-duplicate collapsing (the latest EVENT's type equals
    * the open version's type precisely because repeats collapse) and
    * users with no event before T (absent from both sides). The
    * version's valid_from is deliberately NOT emitted: it is a
    * property of the interval representation (run start), not of the
    * point-in-time STATE the two formulations agree on.
    */
  private val q251 = QueryDef(
    "q251_scd2_asof",
    (s, dir) => {
      val asOf = "TIMESTAMP_NTZ '2024-01-15 00:00:00'"
      ev(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .where(expr(s"ts <= $asOf"))
        .groupBy(col("user_id"))
        .agg(max(struct(col("ts"), col("event_id"), col("event_type")))
          .as("last"))
        .select(col("user_id"), col("last.event_type").as("state"))
        .orderBy("user_id")
    },
    Some("""WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
          lag(event_type) OVER w AS prev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      changes AS (
        SELECT user_id, event_type, ts, event_id FROM ordered
        WHERE prev IS NULL OR prev <> event_type),
      versioned AS (
        SELECT user_id, event_type, ts AS valid_from,
          lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS valid_to
        FROM changes)
      SELECT user_id, event_type AS state
      FROM versioned
      WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
        AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
      ORDER BY user_id"""))

  // ---------- q68: rolling 7-day window (RANGE frame) -----------------

  /** 7-day rolling order volume per priority — a RANGE frame over the
    * integer epoch-day, not a ROWS frame: days with no orders must
    * still age out of the window (ROWS BETWEEN 6 PRECEDING would span
    * 7 *observed* days, silently stretching over gaps). The rolling
    * average is the one double division of two exact BIGINTs, computed
    * identically on both engines.
    *
    * Distributed shape: raw orders collapse to one row per
    * (priority, day) in a map-side-combined aggregate FIRST, so the
    * window pass sorts ≤ days×priorities rows regardless of order
    * volume — the window never sees the fact table. At 100 TB the
    * pre-aggregate is the whole cost and the windowed daily table is
    * driver-trivial.
    */
  private val q68 = QueryDef(
    "q68_rolling_daily",
    (s, dir) => {
      val daily = Fixtures.table(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
          expr("datediff(cast(o_orderdate AS DATE), DATE '1970-01-01')")
            .as("day"))
        .agg(count(lit(1)).as("n_day"))
      val w7 = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("day")).rangeBetween(-6, 0)
      daily
        .withColumn("n_7d", sum(col("n_day")).over(w7))
        .withColumn("days_present", count(lit(1)).over(w7))
        .withColumn("avg_7d",
          col("n_7d").cast(DoubleType) / col("days_present"))
        .orderBy("o_orderpriority", "day")
    },
    Some("""WITH daily AS (SELECT o_orderpriority,
        (o_orderdate::DATE - DATE '1970-01-01') AS day,
        count(*)::BIGINT AS n_day
        FROM orders GROUP BY 1, 2)
      SELECT o_orderpriority, day, n_day,
        sum(n_day) OVER w::BIGINT AS n_7d,
        count(*) OVER w::BIGINT AS days_present,
        (sum(n_day) OVER w)::DOUBLE / (count(*) OVER w) AS avg_7d
      FROM daily
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY day
        RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      ORDER BY o_orderpriority, day"""))

  // ---------- q69: keyed snapshot diff (CDC classify) -----------------

  /** Snapshot-to-snapshot change classification — the diff a CDC
    * consumer materializes between two export watermarks: each user's
    * "current event_type" as of Jan 15 vs. as of the full stream, full
    * outer join on the key, rows classified added / changed / removed
    * (removed is impossible here since the later snapshot is a
    * superset, but the classifier carries it — real snapshots delete).
    * Unchanged rows are FILTERED OUT, so output ∝ churn, not corpus:
    * at 100 TB both snapshot states are per-key aggregates (one
    * shuffle each on the same key, so the final join co-partitions),
    * and only the changed tail survives to the result.
    *
    * Latest-state selection uses the same (ts, event_id) total order
    * as q61's SCD2, keeping the two CDC views consistent.
    */
  private val q69 = QueryDef(
    "q69_snapshot_diff",
    (s, dir) => {
      def state(df: DataFrame, alias: String): DataFrame = {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        df.select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("user_id"), col("event_type").as(alias))
      }
      val events = ev(s, dir)
      val old = state(events.where(
        expr("ts < TIMESTAMP_NTZ '2024-01-15 00:00:00'")), "old_type")
      val neu = state(events, "new_type")
      old.join(neu, Seq("user_id"), "full_outer")
        .withColumn("change", expr(
          """CASE WHEN old_type IS NULL THEN 'added'
                  WHEN new_type IS NULL THEN 'removed'
                  WHEN old_type <> new_type THEN 'changed'
                  ELSE 'unchanged' END"""))
        .where(col("change") =!= "unchanged")
        .select("user_id", "old_type", "new_type", "change")
        .orderBy("user_id")
    },
    Some("""WITH old_state AS (
        SELECT user_id, event_type AS old_type FROM (
          SELECT user_id, event_type, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00')
        WHERE rn = 1),
      new_state AS (
        SELECT user_id, event_type AS new_type FROM (
          SELECT user_id, event_type, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        WHERE rn = 1),
      diff AS (
        SELECT user_id, old_type, new_type,
          CASE WHEN old_type IS NULL THEN 'added'
               WHEN new_type IS NULL THEN 'removed'
               WHEN old_type <> new_type THEN 'changed'
               ELSE 'unchanged' END AS change
        FROM old_state FULL JOIN new_state USING (user_id))
      SELECT user_id, old_type, new_type, change FROM diff
      WHERE change <> 'unchanged' ORDER BY user_id"""))

  // ---------- q70: incremental view maintenance -----------------------

  /** Incremental materialized-view maintenance — the consumer-side
    * complement of the reference's incremental export (SURVEY §2.9):
    * the daily (day, event_type) aggregate view is maintained as
    * base-partial ⊎ delta-partial → merge, where base is everything
    * before the watermark and delta only what arrived after. The
    * ORACLE is the full single-pass recompute over all events — so the
    * driver's gate proves the maintenance algebra (merge of partials ≡
    * recompute) cross-engine, which is the property that lets a 100 TB
    * pipeline re-aggregate only the day's delta instead of the corpus.
    *
    * Exactness: partial value sums stay DECIMAL through the merge and
    * cast to double only at the end — the one representation where
    * merge order cannot perturb low bits (QueryDef.doc).
    */
  private val q70 = QueryDef(
    "q70_incremental_view",
    (s, dir) => {
      val day = expr("datediff(cast(ts AS DATE), DATE '1970-01-01')").as("day")
      def partial(df: DataFrame): DataFrame = df
        .groupBy(day, col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 4))).as("s"))
      val events = ev(s, dir)
      val base = partial(events.where(
        expr("ts < TIMESTAMP_NTZ '2024-01-25 00:00:00'")))
      val delta = partial(events.where(
        expr("ts >= TIMESTAMP_NTZ '2024-01-25 00:00:00'")))
      base.unionByName(delta)
        .groupBy(col("day"), col("event_type"))
        .agg(sum(col("n")).as("n"),
          sum(col("s")).cast(DoubleType).as("sum_value"))
        .orderBy("day", "event_type")
    },
    Some("""SELECT (ts::DATE - DATE '1970-01-01') AS day, event_type,
        count(*)::BIGINT AS n,
        cast(sum(cast(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY day, event_type"""))

  // ---------- q72: event debounce (burst dedup) -----------------------

  /** Burst deduplication — keep only the first event of each
    * (user, type) burst, where a burst is a run of repeats within 60 s
    * of the previous occurrence. This is the curation filter for
    * repeated pings / double-fires before events enter training
    * aggregates (the row-FILTERING complement of q27's sessionize,
    * which labels rows). Gap is computed in integer microseconds —
    * no double time arithmetic anywhere.
    *
    * Shape: one window sort per (user, type) partition, output is the
    * surviving head rows — shuffle key is the dedup key, so at 100 TB
    * this is one shuffle of the event stream and the comparison is a
    * lag within sorted partitions.
    */
  private val q72 = QueryDef(
    "q72_debounce",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      ev(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
        .withColumn("gap_us",
          expr("timestampdiff(MICROSECOND, lag(ts) OVER (" +
            "PARTITION BY user_id, event_type ORDER BY ts, event_id), ts)"))
        .where(col("gap_us").isNull || col("gap_us") > lit(60000000L))
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
        .orderBy("event_id")
    },
    Some("""WITH g AS (SELECT event_id, user_id, event_type, ts,
        date_diff('microsecond', lag(ts) OVER (
          PARTITION BY user_id, event_type ORDER BY ts, event_id), ts)
          AS gap_us
        FROM events)
      SELECT event_id, user_id, event_type, ts FROM g
      WHERE gap_us IS NULL OR gap_us > 60000000
      ORDER BY event_id"""))

  // ---------- q73: sweep-line max concurrency -------------------------

  /** Peak interval overlap — treat each event as a 5-minute activity
    * interval and compute, per event type, the maximum number of
    * simultaneously open intervals. Classic sweep line as pure
    * relational algebra: every interval contributes a +1 at its start
    * and a −1 at its end, a running sum over the merged timeline is the
    * live concurrency, and the answer is its max. Intervals are
    * half-open [ts, ts+5 min): at an exact boundary instant the −1
    * sorts before the +1 (ORDER BY t, d), so a close and an open at the
    * same microsecond never double-count — the tie rule IS the boundary
    * semantics, stated identically in both engines.
    *
    * Shape: 2 rows per event, one shuffle on event_type, one window
    * pass — no interval self-join (the naive overlap join is O(n²) per
    * type; the sweep line is O(n log n) and partitions cleanly).
    */
  private val q73 = QueryDef(
    "q73_concurrency",
    (s, dir) => {
      val e = ev(s, dir).select(col("event_type"), col("ts"))
      val deltas = e.select(col("event_type"), col("ts").as("t"),
        lit(1).as("d"))
        .unionByName(e.select(col("event_type"),
          expr("timestampadd(MINUTE, 5, ts)").as("t"), lit(-1).as("d")))
      val w = Window.partitionBy(col("event_type")).orderBy(col("t"), col("d"))
      deltas
        .withColumn("live", sum(col("d")).over(w))
        .groupBy(col("event_type"))
        .agg(max(col("live")).cast("long").as("max_concurrent"),
          (count(lit(1)) / 2).cast("long").as("n_intervals"))
        .orderBy("event_type")
    },
    Some("""WITH deltas AS (
        SELECT event_type, ts AS t, 1 AS d FROM events
        UNION ALL
        SELECT event_type, ts + INTERVAL 5 MINUTE AS t, -1 AS d
        FROM events),
      swept AS (SELECT event_type,
        sum(d) OVER (PARTITION BY event_type ORDER BY t, d) AS live
        FROM deltas)
      SELECT event_type, max(live)::BIGINT AS max_concurrent,
        (count(*) / 2)::BIGINT AS n_intervals
      FROM swept GROUP BY 1 ORDER BY event_type"""))

  // ---------- q83: inter-arrival time statistics ----------------------

  /** Per-user inter-arrival gaps — the activity-cadence profile behind
    * rate-limit tuning, bot detection (impossibly regular or
    * impossibly fast cadence), and the gap-threshold choice q27's
    * sessionizer depends on. All time arithmetic is integer
    * microseconds (lag within one window sort, same shuffle key as
    * sessionize); the mean is the single sum/count double division
    * computed identically on both engines — no double accumulation.
    */
  private val q83 = QueryDef(
    "q83_interarrival",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      ev(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .where(col("prev_ts").isNotNull)
        .withColumn("gap_us",
          expr("timestampdiff(MICROSECOND, prev_ts, ts)"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_gaps"),
          min(col("gap_us")).as("min_gap_us"),
          max(col("gap_us")).as("max_gap_us"),
          (sum(col("gap_us")).cast("double")
            / count(lit(1))).as("avg_gap_us"))
        .orderBy("user_id")
    },
    Some("""WITH g AS (SELECT user_id,
        epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
          ORDER BY ts, event_id)) AS gap_us
      FROM events)
      SELECT user_id, count(*)::BIGINT AS n_gaps,
        min(gap_us)::BIGINT AS min_gap_us,
        max(gap_us)::BIGINT AS max_gap_us,
        sum(gap_us)::DOUBLE / count(*) AS avg_gap_us
      FROM g WHERE gap_us IS NOT NULL
      GROUP BY user_id ORDER BY user_id"""))

  // ---------- q87: Markov transition matrix ---------------------------

  /** First-order Markov transition probabilities over per-user event
    * sequences — P(next event type | current event type), the behavior
    * model behind next-action prediction, anomaly scoring (improbable
    * transitions), and funnel design. Successor pairing is one `lead`
    * window over the same (user_id; ts, event_id) sort q27's
    * sessionizer uses; the pair counts then aggregate on the tiny
    * (cur, nxt) key space — map-side partials reduce each partition to
    * ≤ |types|² rows before the exchange, so the second shuffle is
    * O(types²) regardless of corpus size. The probability is one
    * division of two exact int64 counts (no double accumulation), and
    * the per-cur total comes from a window over the already-tiny
    * transition table, not a second pass over events.
    */
  private val q87 = QueryDef(
    "q87_markov_transitions",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wc = Window.partitionBy(col("cur"))
      ev(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("cur"))
        .withColumn("nxt", lead(col("cur"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("cur"), col("nxt"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p", col("n") / sum(col("n")).over(wc))
        .select(col("cur"), col("nxt"), col("n"), col("p"))
        .orderBy("cur", "nxt")
    },
    Some("""WITH seq AS (SELECT user_id, event_type AS cur,
        lead(event_type) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS nxt
      FROM events),
      t AS (SELECT cur, nxt, count(*) AS n FROM seq
        WHERE nxt IS NOT NULL GROUP BY 1, 2)
      SELECT cur, nxt, n::BIGINT AS n,
        n / ((sum(n) OVER (PARTITION BY cur))::BIGINT) AS p
      FROM t ORDER BY cur, nxt"""))

  // ---------- q95: time-weighted average (TWAP) -----------------------

  /** Duration-weighted mean value per event type — each observation
    * holds until the next one, so its weight is the µs gap to the
    * successor (the metering/pricing average where arithmetic means
    * over-count bursts: ten readings in one second must not out-vote
    * one reading held for an hour). Integer-µs weights come from the
    * q83 lead/timestampdiff contract; the one value·weight product per
    * row is a single IEEE multiply on identical inputs, carried in
    * exact DECIMAL(38,6) so the SUM is accumulation-order-free, and
    * the final weighted mean is one division. The last observation per
    * type (no successor) is excluded on both engines. Shape: the
    * successor gaps come from [[graft.ops.RangeLead]] BY DEFAULT —
    * a `lead()` window partitioned by event_type has only |types|
    * partitions, so at 100 TB one type is one straggler task holding
    * a fifth of the corpus; RangeLead range-shards on (type, ts, id),
    * computes gaps per shard, and stitches the ≤ shards×|types|
    * boundary rows driver-side. `graft.lead.strategy=window` restores
    * the window form; RangeLeadSpec proves the two produce identical
    * gap multisets, and the DuckDB oracle runs the window form.
    */
  private val q95 = QueryDef(
    "q95_twap",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val base = ev(s, dir)
        .select(col("event_type"), col("ts"), col("event_id"), col("value"))
      val gaps =
        if (s.conf.getOption("graft.lead.strategy").contains("window")) {
          val w = Window.partitionBy(col("event_type"))
            .orderBy(col("ts"), col("event_id"))
          base
            .withColumn("next_ts", lead(col("ts"), 1).over(w))
            .where(col("next_ts").isNotNull)
            .select(col("event_type"), col("value"),
              expr("timestampdiff(MICROSECOND, ts, next_ts)").as("gap_us"))
        } else
          graft.ops.RangeLead.gaps(base.select(
              col("event_type").as("key"),
              expr("""timestampdiff(MICROSECOND,
                TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)""").as("ts_us"),
              col("event_id").as("tie"), col("value")))
            .select(col("key").as("event_type"), col("value"), col("gap_us"))
      gaps
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_held"),
          sum(col("gap_us")).as("held_us"),
          (sum((col("value") * col("gap_us")).cast(DecimalType(38, 6)))
            .cast("double") / sum(col("gap_us"))).as("twap"))
        .orderBy("event_type")
    },
    Some("""WITH g AS (SELECT event_type, value,
        epoch_us(lead(ts) OVER (PARTITION BY event_type
          ORDER BY ts, event_id)) - epoch_us(ts) AS gap_us
      FROM events)
      SELECT event_type, count(*)::BIGINT AS n_held,
        sum(gap_us)::BIGINT AS held_us,
        sum(cast(value * gap_us AS DECIMAL(38,6)))::DOUBLE
          / sum(gap_us) AS twap
      FROM g WHERE gap_us IS NOT NULL
      GROUP BY event_type ORDER BY event_type"""))

  // ---------- q98: RFM segmentation -----------------------------------

  /** Recency / Frequency / Monetary quintile segmentation per user —
    * the classic audience-targeting cut (churn risk = high R bucket,
    * whales = top M bucket), and the event-side twin of q91's document
    * curriculum grid. Recency is exact integer arithmetic end-to-end:
    * µs since the user's last event relative to the corpus max
    * timestamp (a 1-row broadcast), floor-divided to whole days — the
    * calendar-day date_diff counts boundary crossings and diverges
    * between engines, so it is deliberately avoided. Monetary sums in
    * exact DECIMAL(28,6) (q58 rule) and widens to double once. The
    * three ntile(5) quintile labels run over the per-USER aggregate
    * (users ≪ events; the only corpus-sized pass is the first groupBy),
    * each under a total (metric, user_id) order — and each through the
    * two-pass quantile-boundary-broadcast ntile (RangeNtile, per-shard
    * sorts only — the q149 default; graft.ntile.strategy=window
    * restores the single-sort window form the spec compares against):
    * a per-user table is corpus-sized at 1e9 users.
    */
  private val q98 = QueryDef(
    "q98_rfm",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val perUser = ev(s, dir)
        .groupBy(col("user_id"))
        .agg(max(col("ts")).as("last_ts"),
          count(lit(1)).as("frequency"),
          sum(col("value").cast(DecimalType(28, 6)))
            .cast("double").as("monetary"))
      val maxTs = perUser.agg(max(col("last_ts")).as("max_ts"))
      val base = perUser.crossJoin(broadcast(maxTs))
        .withColumn("recency_days",
          expr("timestampdiff(MICROSECOND, last_ts, max_ts) " +
            "div 86400000000"))
      val useWindow =
        s.conf.getOption("graft.ntile.strategy").contains("window")
      def quintile(df: DataFrame,
          sortKey: Seq[org.apache.spark.sql.Column], name: String) =
        if (useWindow) df.withColumn(name,
          ntile(5).over(Window.orderBy(sortKey: _*)).cast("long"))
        else RangeNtile.withNtile(df, sortKey, 5, name)
      val labeled = quintile(quintile(quintile(base,
          Seq(col("recency_days"), col("user_id")), "r_bucket"),
          Seq(col("frequency").desc, col("user_id")), "f_bucket"),
          Seq(col("monetary").desc, col("user_id")), "m_bucket")
      labeled
        .select(col("user_id"), col("recency_days"), col("frequency"),
          col("monetary"), col("r_bucket"), col("f_bucket"), col("m_bucket"))
        .orderBy("user_id")
    },
    Some("""WITH per_user AS (SELECT user_id, max(ts) AS last_ts,
        count(*) AS frequency,
        sum(cast(value AS DECIMAL(28,6)))::DOUBLE AS monetary
      FROM events GROUP BY 1),
      mx AS (SELECT max(last_ts) AS max_ts FROM per_user),
      r AS (SELECT user_id,
        (epoch_us(max_ts) - epoch_us(last_ts)) // 86400000000
          AS recency_days,
        frequency, monetary FROM per_user, mx)
      SELECT user_id, recency_days::BIGINT AS recency_days,
        frequency::BIGINT AS frequency, monetary,
        ntile(5) OVER (ORDER BY recency_days, user_id)::BIGINT
          AS r_bucket,
        ntile(5) OVER (ORDER BY frequency DESC, user_id)::BIGINT
          AS f_bucket,
        ntile(5) OVER (ORDER BY monetary DESC, user_id)::BIGINT
          AS m_bucket
      FROM r ORDER BY user_id"""))

  // ---------- q99: Gini concentration of activity ---------------------

  /** Gini coefficient of per-user event counts, per event type — the
    * single-number concentration alarm (bot farms and scraped-feed
    * skew push it toward 1; organic traffic sits mid-range), and the
    * summary statistic behind q89's shuffle-skew decisions. Computed
    * from the rank formulation G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) over
    * counts sorted ascending with a user_id tie-break — EVERY term is
    * exact int64 (ranks, counts, their products), so the one final
    * double division hash-matches bit-for-bit; no Lorenz-curve
    * interpolation anywhere. Shape: corpus pass → per-(type, user)
    * counts, rank window + sums over the user-cardinality table
    * (users ≪ events). At 100 TB the i·xᵢ sum outgrows int64 (n ~ 1e9
    * × count products) — widen the two sums to DECIMAL(38,0), same
    * contract.
    */
  private val q99 = QueryDef(
    "q99_gini",
    (s, dir) => {
      val counts = ev(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("x"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("x"), col("user_id"))
      counts.withColumn("i", row_number().over(w).cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_users"), sum(col("x")).as("sx"),
          sum(col("i") * col("x")).as("six"))
        .select(col("event_type"), col("n_users"), col("sx"),
          ((lit(2L) * col("six") - (col("n_users") + 1L) * col("sx"))
            .cast("double")
            / (col("n_users") * col("sx")).cast("double")).as("gini"))
        .orderBy("event_type")
    },
    Some("""WITH counts AS (SELECT event_type, user_id, count(*) AS x
        FROM events GROUP BY 1, 2),
      r AS (SELECT event_type, x, row_number() OVER (
          PARTITION BY event_type ORDER BY x, user_id) AS i FROM counts)
      SELECT event_type, count(*)::BIGINT AS n_users,
        sum(x)::BIGINT AS sx,
        (2 * sum(i * x) - (count(*) + 1) * sum(x))::DOUBLE
          / (count(*) * sum(x))::DOUBLE AS gini
      FROM r GROUP BY event_type ORDER BY event_type"""))

  // ---------- q100: top user journeys ---------------------------------

  /** Most common opening event paths — each user's first 4 events (by
    * the q27 total order) joined into a '>'-delimited journey string,
    * counted, top-20 under a (count desc, path) total order. The
    * product-analytics "how do sessions start" query. Path assembly is
    * the ordered-fold contract: Spark sorts the (rank, type) structs
    * per user and folds in rank order; DuckDB string_agg's ORDER BY
    * clause is the same fold — identical strings, exact counts, no
    * doubles at all. Shape: one user_id shuffle for the window, first-4
    * filter drops the corpus to ≤ 4 rows per user BEFORE the fold, and
    * the path-count table is at most |type|⁴ rows.
    */
  private val q100 = QueryDef(
    "q100_top_paths",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      ev(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 4)
        .groupBy(col("user_id"))
        .agg(array_join(transform(
          sort_array(collect_list(struct(col("rn"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path"))
        .limit(20)
    },
    Some("""WITH r AS (SELECT user_id, event_type, row_number() OVER (
          PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events),
      paths AS (SELECT user_id,
          string_agg(event_type, '>' ORDER BY rn) AS path
        FROM r WHERE rn <= 4 GROUP BY user_id)
      SELECT path, count(*)::BIGINT AS n_users FROM paths
      GROUP BY path ORDER BY n_users DESC, path LIMIT 20"""))

  // ---------- q103: Markov anomaly scoring ----------------------------

  /** Per-user negative log-likelihood of the observed event sequence
    * under q87's first-order transition model — the anomaly score that
    * turns the transition matrix into a detector: a session full of
    * improbable transitions (scripted abuse, broken client) scores
    * high; a canonical journey scores near the corpus entropy rate.
    * The model table is tiny (≤ |types|² rows), so ln(p) is pinned to
    * integer nano-units ONCE per transition type (round(ln(p)·1e9),
    * the q96 rule) and broadcast; each user's NLL is then an exact
    * BIGINT sum of those units — order-free — with the /1e9 and /n
    * divisions applied once at the end in a fixed sequence. Every
    * observed transition exists in the model by construction (it was
    * counted), so the broadcast join never drops rows. Shape: one
    * user_id shuffle for the successor window (shared with
    * q27/q83/q87), broadcast model join, one per-user aggregate.
    */
  private val q103 = QueryDef(
    "q103_markov_anomaly",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wc = Window.partitionBy(col("cur"))
      val pairs = ev(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("cur"))
        .withColumn("nxt", lead(col("cur"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(col("user_id"), col("cur"), col("nxt"))
      val model = pairs.groupBy(col("cur"), col("nxt"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p", col("n") / sum(col("n")).over(wc))
        .select(col("cur"), col("nxt"),
          round(log(col("p")) * lit(1e9)).cast("long").as("ln_units"))
      pairs.join(broadcast(model), Seq("cur", "nxt"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_trans"), sum(col("ln_units")).as("su"))
        .select(col("user_id"), col("n_trans"),
          ((-col("su")).cast("double") / lit(1e9)).as("nll"),
          (((-col("su")).cast("double") / lit(1e9)) / col("n_trans"))
            .as("avg_nll"))
        .orderBy("user_id")
    },
    Some("""WITH seq AS (SELECT user_id, event_type AS cur,
        lead(event_type) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS nxt
      FROM events),
      pairs AS (SELECT user_id, cur, nxt FROM seq WHERE nxt IS NOT NULL),
      t AS (SELECT cur, nxt, count(*) AS n FROM pairs GROUP BY 1, 2),
      model AS (SELECT cur, nxt,
        round(ln(n / ((sum(n) OVER (PARTITION BY cur))::BIGINT)) * 1e9)
          ::BIGINT AS ln_units FROM t)
      SELECT user_id, count(*)::BIGINT AS n_trans,
        (-sum(ln_units))::DOUBLE / 1e9 AS nll,
        ((-sum(ln_units))::DOUBLE / 1e9) / count(*) AS avg_nll
      FROM pairs JOIN model USING (cur, nxt)
      GROUP BY user_id ORDER BY user_id"""))

  // ---------- q108: hopping (sliding) window aggregates ---------------

  /** 6-hour windows sliding every 3 hours — the overlapping-window
    * semantics tumbling q24 cannot express (a burst near a tumbling
    * boundary is split across two buckets and understated in both;
    * the hop sees it whole in the window centered on it). Spark's
    * `window(ts, size, slide)` expands each event into size/slide = 2
    * window memberships BEFORE the aggregate — the fan-out is a
    * constant factor on the map side, partial aggregation still
    * applies, and no state is held (this is the batch twin of the
    * streaming hop). The oracle derives the same two epoch-aligned
    * starts arithmetically (time_bucket by the SLIDE, minus k·slide
    * for k = 0, 1 — every event lies in exactly those two windows).
    * Counts exact, value sums in DECIMAL (q24's dsum contract).
    */
  private val q108 = QueryDef(
    "q108_hopping_window",
    (s, dir) => ev(s, dir)
      .groupBy(window(col("ts"), "6 hours", "3 hours").getField("start")
        .as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy("bucket", "event_type"),
    Some("""SELECT time_bucket(INTERVAL '3 hours', ts) - to_hours(3 * k)
        AS bucket, event_type, count(*) AS n,
      cast(sum(cast(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events CROSS JOIN range(0, 2) t(k)
      GROUP BY 1, 2 ORDER BY bucket, event_type"""))

  // ---------- q113: event run-length profile --------------------------

  /** Run-length structure of each user's event-type sequence —
    * consecutive repeats collapsed to runs (the RLE view): run count,
    * longest run, and the events-per-run compression ratio. A ratio
    * near 1 is a user who alternates actions; a long max-run is a
    * stuck client or scripted hammering (the q72 debounce signal,
    * quantified per user instead of filtered). Runs are delimited by
    * the standard gaps-and-islands flag (type ≠ lag(type) under the
    * q27 total order), run ids are the running flag sum over the SAME
    * window sort (no extra shuffle — one user_id exchange feeds both
    * windows and the aggregates), and everything is exact integers
    * except the one final ratio division.
    */
  private val q113 = QueryDef(
    "q113_event_rle",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val runs = ev(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("isStart",
          when(lag(col("event_type"), 1).over(w).isNull
            || lag(col("event_type"), 1).over(w) =!= col("event_type"),
            1L).otherwise(0L))
        .withColumn("run_id", sum(col("isStart")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("run_id"))
        .agg(count(lit(1)).as("run_len"))
      runs.groupBy(col("user_id"))
        .agg(sum(col("run_len")).as("n_events"),
          count(lit(1)).as("n_runs"),
          max(col("run_len")).as("max_run"))
        .select(col("user_id"), col("n_events"), col("n_runs"),
          col("max_run"),
          (col("n_events").cast("double") / col("n_runs"))
            .as("events_per_run"))
        .orderBy("user_id")
    },
    Some("""WITH s AS (SELECT user_id, event_type,
        CASE WHEN lag(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) IS DISTINCT FROM event_type
          THEN 1 ELSE 0 END AS is_start,
        ts, event_id
      FROM events),
      r AS (SELECT user_id,
        sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS UNBOUNDED PRECEDING) AS run_id
      FROM s),
      runs AS (SELECT user_id, run_id, count(*) AS run_len
        FROM r GROUP BY 1, 2)
      SELECT user_id, sum(run_len)::BIGINT AS n_events,
        count(*)::BIGINT AS n_runs, max(run_len)::BIGINT AS max_run,
        sum(run_len)::DOUBLE / count(*) AS events_per_run
      FROM runs GROUP BY user_id ORDER BY user_id"""))

  // ---------- q117: rolling 7-day distinct users (DAU/WAU) -------------

  /** Rolling 7-day distinct active users per day, plus DAU and the
    * DAU/WAU stickiness ratio — the engagement triple every product
    * dashboard leads with. DISTINCT-over-a-sliding-range is the one
    * window shape SQL window frames cannot express (COUNT(DISTINCT)
    * is illegal in a frame), so the scalable form is membership
    * EXPANSION: each (user, day) activity row fans into the ≤ 7 report
    * days whose trailing window contains it (map-side `sequence` +
    * explode, the q108 hop idea pointed backwards), then one exact
    * distinct + count per report day. Shape: dedup to user-days (one
    * shuffle, rows = users × active days ≪ events), 7× that in flight
    * after the explode, grouped with map-side partials; no self-join,
    * no spine × users cross product. Days are integer epoch-days
    * (q54's contract); the 1-row max-day bound broadcasts to clip the
    * fan-out at the corpus edge; stickiness is one final division.
    */
  private val q117 = QueryDef(
    "q117_rolling_distinct_users",
    (s, dir) => {
      val ud = ev(s, dir).select(col("user_id"),
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)" +
          " div 86400000000").as("d"))
        .distinct()
      val span = ud.agg(max(col("d")).as("dmax"))
      val mem = ud.crossJoin(broadcast(span))
        .select(col("user_id"),
          explode(expr("sequence(d, least(d + 6, dmax))")).as("day"))
        .distinct()
      val wau = mem.groupBy(col("day")).agg(count(lit(1)).as("wau"))
      val dau = ud.groupBy(col("d").as("day")).agg(count(lit(1)).as("dau"))
      wau.join(dau, Seq("day"), "left_outer")
        .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"),
          col("wau"),
          (coalesce(col("dau"), lit(0L)).cast("double") / col("wau"))
            .as("stickiness"))
        .orderBy("day")
    },
    Some("""WITH ud AS (SELECT DISTINCT user_id,
          epoch_us(ts) // 86400000000 AS d FROM events),
      span AS (SELECT max(d) AS dmax FROM ud),
      mem AS (SELECT DISTINCT user_id, day
        FROM ud, span,
          unnest(generate_series(d, least(d + 6, dmax))) AS t(day)),
      wau AS (SELECT day, count(*) AS wau FROM mem GROUP BY 1),
      dau AS (SELECT d AS day, count(*) AS dau FROM ud GROUP BY 1)
      SELECT wau.day, coalesce(dau.dau, 0)::BIGINT AS dau,
        wau.wau::BIGINT AS wau,
        coalesce(dau.dau, 0)::DOUBLE / wau.wau AS stickiness
      FROM wau LEFT JOIN dau ON dau.day = wau.day
      ORDER BY wau.day"""))

  // ---------- q126: last-touch attribution -----------------------------

  /** Which channel gets credit for each purchase: the last view/click
    * by the same user strictly before the purchase (within a 7-day
    * lookback; none → 'direct') — last-touch attribution, the default
    * revenue-attribution model and the business-side twin of q25's
    * as-of join (same union trick: one running `last(ignoreNulls)`
    * carries the most recent touch's type and time forward, so there
    * is no per-purchase range scan, no touch×purchase join at all).
    * "Strictly before" is the (ts, event_id) total order's 1-PRECEDING
    * frame — same-instant touches don't claim the purchase, matching
    * q25's tie rule. Revenue sums use the DECIMAL-term convention;
    * the purchase share is one division against the 1-row total.
    * Shape: one shuffle on user_id (the window), then a |channels|-row
    * aggregate — at 100 TB identical to sessionize's cost.
    */
  private val q126 = QueryDef(
    "q126_attribution",
    (s, dir) => {
      val LookbackUs = 604800000000L // 7 days in µs
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val base = ev(s, dir)
        .where(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"),
          expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
            .as("us"))
        .withColumn("touch_type",
          when(col("event_type") =!= "purchase", col("event_type")))
        .withColumn("touch_us",
          when(col("event_type") =!= "purchase", col("us")))
      val purchases = base
        .withColumn("lt", last(col("touch_type"), ignoreNulls = true).over(w))
        .withColumn("lus", last(col("touch_us"), ignoreNulls = true).over(w))
        .where(col("event_type") === "purchase")
        .select(when(col("lt").isNotNull
            && col("us") - col("lus") <= LookbackUs, col("lt"))
          .otherwise(lit("direct")).as("channel"), col("value"))
      val tot = purchases.agg(count(lit(1)).as("t"))
      purchases.groupBy(col("channel"))
        .agg(count(lit(1)).as("n_purchases"), dsum(col("value")).as("revenue"))
        .crossJoin(broadcast(tot))
        .select(col("channel"), col("n_purchases"), col("revenue"),
          (col("n_purchases").cast("double") / col("t")).as("purchase_share"))
        .orderBy("channel")
    },
    Some("""WITH base AS (SELECT user_id, event_id, event_type, value,
          epoch_us(ts) AS us,
          CASE WHEN event_type <> 'purchase' THEN event_type END
            AS touch_type,
          CASE WHEN event_type <> 'purchase' THEN epoch_us(ts) END
            AS touch_us
        FROM events WHERE event_type IN ('view', 'click', 'purchase')),
      lasts AS (SELECT *,
          last_value(touch_type IGNORE NULLS) OVER win AS lt,
          last_value(touch_us IGNORE NULLS) OVER win AS lus
        FROM base
        WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      p AS (SELECT CASE WHEN lt IS NOT NULL
            AND us - lus <= 604800000000 THEN lt
            ELSE 'direct' END AS channel, value
        FROM lasts WHERE event_type = 'purchase'),
      tot AS (SELECT count(*) AS t FROM p)
      SELECT channel, count(*)::BIGINT AS n_purchases,
        sum(cast(value AS DECIMAL(18,4)))::DOUBLE AS revenue,
        count(*)::DOUBLE / t AS purchase_share
      FROM p, tot GROUP BY channel, t ORDER BY channel"""))

  // ---------- q128: session co-occurrence rules ------------------------

  /** Association rules over sessions: which event-type PAIRS occur in
    * the same session more than their marginals predict — the
    * market-basket view of behavior (q55 is the same statistic for
    * adjacent tokens; this is order-independent set co-occurrence,
    * which adjacency cannot see). Support and lift are exact-integer
    * end-to-end: lift = (n_ab·n) / (n_a·n_b) as ONE division of exact
    * int64 products (at 100 TB widen the products to DECIMAL(38,0)).
    * Shape: q27's sessionize pass (same user_id shuffle), distinct
    * (session, type) memberships, then a self-join bounded by
    * ≤ |types| rows per session — pair volume ≤ C(|types|,2) per
    * session, output ≤ C(|types|,2) cells total; the marginals table
    * is |types|-sized and broadcasts.
    */
  private val q128 = QueryDef(
    "q128_event_cooccurrence",
    (s, dir) => {
      val mem = sessionAssigned(s, dir)
        .select(col("user_id"), col("session_seq"), col("event_type"))
        .distinct()
      val n = mem.select(col("user_id"), col("session_seq")).distinct()
        .agg(count(lit(1)).as("n"))
      val marg = mem.groupBy(col("event_type")).agg(count(lit(1)).as("m"))
      val pairs = mem.alias("a")
        .join(mem.alias("b"),
          col("a.user_id") === col("b.user_id")
            && col("a.session_seq") === col("b.session_seq")
            && col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_ab"))
      pairs
        .join(broadcast(marg.select(col("event_type").as("type_a"),
          col("m").as("n_a"))), "type_a")
        .join(broadcast(marg.select(col("event_type").as("type_b"),
          col("m").as("n_b"))), "type_b")
        .crossJoin(broadcast(n))
        .select(col("type_a"), col("type_b"), col("n_ab"),
          (col("n_ab").cast("double") / col("n")).as("support"),
          ((col("n_ab") * col("n")).cast("double")
            / (col("n_a") * col("n_b")).cast("double")).as("lift"))
        .orderBy("type_a", "type_b")
    },
    Some("""WITH flagged AS (SELECT user_id, ts, event_id, event_type,
          CASE WHEN lag(ts) OVER w IS NULL
            OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
          THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (SELECT user_id, event_type,
          sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged),
      mem AS (SELECT DISTINCT user_id, session_seq, event_type FROM sess),
      n AS (SELECT count(*) AS n FROM
        (SELECT DISTINCT user_id, session_seq FROM mem)),
      marg AS (SELECT event_type, count(*) AS m FROM mem GROUP BY 1),
      pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
          count(*) AS n_ab
        FROM mem a JOIN mem b
        ON a.user_id = b.user_id AND a.session_seq = b.session_seq
          AND a.event_type < b.event_type
        GROUP BY 1, 2)
      SELECT type_a, type_b, n_ab::BIGINT AS n_ab,
        n_ab::DOUBLE / n AS support,
        (n_ab * n)::DOUBLE / (ma.m * mb.m)::DOUBLE AS lift
      FROM pairs
      JOIN marg ma ON ma.event_type = type_a
      JOIN marg mb ON mb.event_type = type_b, n
      ORDER BY type_a, type_b"""))

  // ---------- q129: session duration percentiles -----------------------

  /** The latency-style summary of session behavior: p50/p90/p99
    * session duration plus mean — composed from q27's sessionize pass
    * and q67's selection-percentile contract (percentile_disc at
    * ⌈p·n⌉ under a (duration, user, seq) total order; selection, not
    * interpolation, so the answer is an actual observed duration and
    * cross-engine exact). The mean is an exact µs sum with one
    * division. Shape: sessions scale with users × activity, so the
    * rank pass rides the RangeNtile boundary-broadcast row_number
    * (per-shard sorts only; graft.ntile.strategy=window restores the
    * single-sort window form the equality spec compares against) —
    * the q141 migration class.
    */
  private val q129 = QueryDef(
    "q129_session_percentiles",
    (s, dir) => {
      val sess = sessionAssigned(s, dir)
        .groupBy(col("user_id"), col("session_seq"))
        .agg(expr("timestampdiff(MICROSECOND, min(ts), max(ts))").as("dur_us"))
      val sortKey = Seq(col("dur_us"), col("user_id"), col("session_seq"))
      val ranked =
        if (s.conf.getOption("graft.ntile.strategy").contains("window"))
          sess.withColumn("rn",
            row_number().over(Window.orderBy(sortKey: _*)).cast("long"))
        else RangeNtile.withRowNumber(sess, sortKey, "rn")
      val n = sess.agg(count(lit(1)).as("n"), sum(col("dur_us")).as("su"))
      ranked.crossJoin(broadcast(n))
        .where(col("rn") === ceil(col("n") * lit(0.5))
          || col("rn") === ceil(col("n") * lit(0.9))
          || col("rn") === ceil(col("n") * lit(0.99)))
        .groupBy(col("n"), col("su"))
        .agg(
          min(when(col("rn") === ceil(col("n") * lit(0.5)), col("dur_us")))
            .as("p50_us"),
          min(when(col("rn") === ceil(col("n") * lit(0.9)), col("dur_us")))
            .as("p90_us"),
          min(when(col("rn") === ceil(col("n") * lit(0.99)), col("dur_us")))
            .as("p99_us"))
        .select(col("n").as("n_sessions"), col("p50_us"), col("p90_us"),
          col("p99_us"),
          (col("su").cast("double") / col("n")).as("mean_us"))
    },
    Some("""WITH flagged AS (SELECT user_id, ts, event_id,
          CASE WHEN lag(ts) OVER w IS NULL
            OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
          THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (SELECT user_id,
          sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS session_seq, ts
        FROM flagged),
      durs AS (SELECT user_id, session_seq,
          epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
        FROM sess GROUP BY 1, 2),
      ranked AS (SELECT dur_us, row_number() OVER (
          ORDER BY dur_us, user_id, session_seq) AS rn FROM durs),
      n AS (SELECT count(*) AS n, sum(dur_us)::BIGINT AS su FROM durs)
      SELECT n::BIGINT AS n_sessions,
        min(CASE WHEN rn = ceil(n * 0.5) THEN dur_us END)::BIGINT AS p50_us,
        min(CASE WHEN rn = ceil(n * 0.9) THEN dur_us END)::BIGINT AS p90_us,
        min(CASE WHEN rn = ceil(n * 0.99) THEN dur_us END)::BIGINT AS p99_us,
        su::DOUBLE / n AS mean_us
      FROM ranked, n
      WHERE rn = ceil(n * 0.5) OR rn = ceil(n * 0.9)
        OR rn = ceil(n * 0.99)
      GROUP BY n, su"""))

  // ---------- q137: time-decayed popularity ----------------------------

  /** Exponentially recency-weighted activity per event type
    * (half-life-style decay, τ = 30 days against the corpus's max
    * day) beside the raw count — the feature-engineering staple for
    * ranking/trending signals, where yesterday's burst must outrank
    * last quarter's steady drip. Determinism contract for exp(): like
    * the ln() rule (q96/q103), the libm call is evaluated once per
    * DISTINCT AGE (≤ day-range rows, not per event) on an identical
    * double input (exact int age / 30.0) and pinned to integer
    * nano-units; each type's decayed score is then the exact int64
    * sum of count·unit products, scaled back once. Shape: one
    * (type, day) aggregate with map-side partials (≤ types·days
    * cells), the 1-row max-day broadcast, weights computed on the
    * tiny cell table — the corpus is scanned once, nothing wide
    * shuffles.
    */
  private val q137 = QueryDef(
    "q137_decayed_popularity",
    (s, dir) => {
      val byDay = ev(s, dir)
        .select(col("event_type"),
          expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)" +
            " div 86400000000").as("day"))
        .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("c"))
      val span = byDay.agg(max(col("day")).as("dmax"))
      byDay.crossJoin(broadcast(span))
        .withColumn("wu", round(
          exp((col("day") - col("dmax")).cast("double") / lit(30.0))
            * lit(1e9)).cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(col("c")).as("n_events"),
          sum(col("c") * col("wu")).as("su"))
        .select(col("event_type"), col("n_events"),
          (col("su").cast("double") / lit(1e9)).as("decayed_score"),
          (col("su").cast("double") / lit(1e9) / col("n_events"))
            .as("recency_ratio"))
        .orderBy("event_type")
    },
    Some("""WITH byday AS (SELECT event_type,
          epoch_us(ts) // 86400000000 AS day, count(*) AS c
        FROM events GROUP BY 1, 2),
      span AS (SELECT max(day) AS dmax FROM byday),
      w AS (SELECT event_type, c,
          round(exp((day - dmax)::DOUBLE / 30.0) * 1e9)::BIGINT AS wu
        FROM byday, span)
      SELECT event_type, sum(c)::BIGINT AS n_events,
        sum(c * wu)::DOUBLE / 1e9 AS decayed_score,
        sum(c * wu)::DOUBLE / 1e9 / sum(c) AS recency_ratio
      FROM w GROUP BY event_type ORDER BY event_type"""))

  // ---------- q141: conversion-lag percentiles --------------------------

  /** How long conversion takes: per user, the lag from FIRST view to
    * the first purchase AT OR AFTER it, summarized as p50/p90/p99 +
    * mean — the time-to-convert distribution that prices retargeting
    * windows (q53's funnel counts who converts; this measures how
    * fast). Lags are exact µs differences of two per-user min
    * aggregates (no event×event join — the earliest-qualifying
    * purchase is min(purchase_ts ≥ first_view_ts) inside ONE
    * conditional aggregate pass); percentiles are q67 selection under
    * a (lag, user) total order; mean is an exact sum with one
    * division. Shape: one user_id-keyed aggregate (map-side
    * combined), then the rank pass over converters — through the
    * RangeNtile boundary-broadcast row_number (per-shard sorts only;
    * graft.ntile.strategy=window restores the single-sort window form
    * the spec compares against), because |converters| grows with the
    * user base.
    */
  private val q141 = QueryDef(
    "q141_conversion_lag",
    (s, dir) => {
      val base = ev(s, dir)
        .where(col("event_type").isin("view", "purchase"))
        .select(col("user_id"), col("event_type"),
          expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
            .as("us"))
      val perUser = base.groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", col("us"))).as("v0"))
      val lag = base.where(col("event_type") === "purchase")
        .join(perUser, "user_id")
        .where(col("v0").isNotNull && col("us") >= col("v0"))
        .groupBy(col("user_id"), col("v0"))
        .agg(min(col("us")).as("p0"))
        .select(col("user_id"), (col("p0") - col("v0")).as("lag_us"))
      val sortKey = Seq(col("lag_us"), col("user_id"))
      val ranked =
        if (s.conf.getOption("graft.ntile.strategy").contains("window"))
          lag.withColumn("rn",
            row_number().over(Window.orderBy(sortKey: _*)).cast("long"))
        else RangeNtile.withRowNumber(lag, sortKey, "rn")
      val n = lag.agg(count(lit(1)).as("n"), sum(col("lag_us")).as("su"))
      ranked.crossJoin(broadcast(n))
        .where(col("rn") === ceil(col("n") * lit(0.5))
          || col("rn") === ceil(col("n") * lit(0.9))
          || col("rn") === ceil(col("n") * lit(0.99)))
        .groupBy(col("n"), col("su"))
        .agg(
          min(when(col("rn") === ceil(col("n") * lit(0.5)), col("lag_us")))
            .as("p50_us"),
          min(when(col("rn") === ceil(col("n") * lit(0.9)), col("lag_us")))
            .as("p90_us"),
          min(when(col("rn") === ceil(col("n") * lit(0.99)), col("lag_us")))
            .as("p99_us"))
        .select(col("n").as("n_converters"), col("p50_us"), col("p90_us"),
          col("p99_us"),
          (col("su").cast("double") / col("n")).as("mean_us"))
    },
    Some("""WITH base AS (SELECT user_id, event_type, epoch_us(ts) AS us
        FROM events WHERE event_type IN ('view', 'purchase')),
      v AS (SELECT user_id,
          min(CASE WHEN event_type = 'view' THEN us END) AS v0
        FROM base GROUP BY 1),
      lag AS (SELECT b.user_id, min(us) - v0 AS lag_us
        FROM base b JOIN v ON v.user_id = b.user_id
        WHERE event_type = 'purchase' AND v0 IS NOT NULL AND us >= v0
        GROUP BY b.user_id, v0),
      ranked AS (SELECT lag_us, row_number() OVER (
          ORDER BY lag_us, user_id) AS rn FROM lag),
      n AS (SELECT count(*) AS n, sum(lag_us)::BIGINT AS su FROM lag)
      SELECT n::BIGINT AS n_converters,
        min(CASE WHEN rn = ceil(n * 0.5) THEN lag_us END)::BIGINT AS p50_us,
        min(CASE WHEN rn = ceil(n * 0.9) THEN lag_us END)::BIGINT AS p90_us,
        min(CASE WHEN rn = ceil(n * 0.99) THEN lag_us END)::BIGINT AS p99_us,
        su::DOUBLE / n AS mean_us
      FROM ranked, n
      WHERE rn = ceil(n * 0.5) OR rn = ceil(n * 0.9) OR rn = ceil(n * 0.99)
      GROUP BY n, su"""))

  // ---------- q142: lag-1 autocorrelation of daily volumes --------------

  /** First-order autocorrelation of the daily event-count series, per
    * type — the "is today predicted by yesterday" number behind
    * trend/seasonality decisions and anomaly thresholds (a series with
    * r₁ ≈ 0 justifies q58's independent z-scores; r₁ near 1 demands
    * the rolling baselines of q68). Built on the day spine so GAPS ARE
    * ZEROS (a lag over observed-days-only silently skips missing days
    * and biases r₁ upward — the q59 gap-fill lesson applied to
    * autocorrelation); pairs are (day, day−1) via one lag window per
    * type; the Pearson arithmetic is q75's exact-moment contract over
    * int64 counts, rounded 12. Shape: events collapse to ≤ types·days
    * cells, everything after is spine-sized.
    */
  private val q142 = QueryDef(
    "q142_autocorrelation",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val byDay = ev(s, dir)
        .select(col("event_type"),
          expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)" +
            " div 86400000000").as("day"))
        .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("c"))
      val span = byDay.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val spine = byDay.select(col("event_type")).distinct()
        .crossJoin(broadcast(span))
        .select(col("event_type"),
          explode(expr("sequence(d0, d1)")).as("day"))
      val filled = spine.join(byDay, Seq("event_type", "day"), "left_outer")
        .select(col("event_type"), col("day"),
          coalesce(col("c"), lit(0L)).as("c"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val pairs = filled
        .withColumn("prev", lag(col("c"), 1).over(w))
        .where(col("prev").isNotNull)
      def d(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 0))
      pairs
        .select(col("event_type"), d(col("c")).as("x"), d(col("prev")).as("y"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .selectExpr("event_type", "n",
          "round((cast(n AS DOUBLE) * cast(sxy AS DOUBLE) - " +
            "cast(sx AS DOUBLE) * cast(sy AS DOUBLE)) / " +
            "nullif(sqrt(cast(n AS DOUBLE) * cast(sxx AS DOUBLE) - " +
            "cast(sx AS DOUBLE) * cast(sx AS DOUBLE)) * " +
            "sqrt(cast(n AS DOUBLE) * cast(syy AS DOUBLE) - " +
            "cast(sy AS DOUBLE) * cast(sy AS DOUBLE)), cast(0 AS DOUBLE)), " +
            "12) AS r1")
        .orderBy("event_type")
    },
    Some("""WITH byday AS (SELECT event_type,
          epoch_us(ts) // 86400000000 AS day, count(*) AS c
        FROM events GROUP BY 1, 2),
      span AS (SELECT min(day) AS d0, max(day) AS d1 FROM byday),
      spine AS (SELECT event_type, day
        FROM (SELECT DISTINCT event_type FROM byday), span,
          unnest(generate_series(d0, d1)) AS t(day)),
      filled AS (SELECT spine.event_type, spine.day,
          coalesce(c, 0) AS c
        FROM spine LEFT JOIN byday ON byday.event_type = spine.event_type
          AND byday.day = spine.day),
      pairs AS (SELECT event_type,
          cast(c AS DECIMAL(18,0)) AS x,
          cast(lag(c) OVER (PARTITION BY event_type ORDER BY day)
            AS DECIMAL(18,0)) AS y
        FROM filled),
      m AS (SELECT event_type, count(*)::BIGINT AS n,
          sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
          sum(x * x) AS sxx, sum(y * y) AS syy
        FROM pairs WHERE y IS NOT NULL GROUP BY 1)
      SELECT event_type, n,
        round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
          / nullif(sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
            * sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE),
            0::DOUBLE), 12) AS r1
      FROM m ORDER BY event_type"""))

  // ---------- q143: seasonality profile ---------------------------------

  /** Hour-of-day × day-of-week activity heat table with each cell's
    * share of its event type — the load-shape profile behind capacity
    * planning, anomaly baselines (q58's z-scores per cell, not
    * globally), and bot detection (human traffic has a diurnal shape;
    * scripted traffic is flat). Hour and weekday are integer
    * arithmetic on epoch days/µs (1970-01-01 was a Thursday — the +4
    * mod 7 pins Monday = 0 identically on both engines; calendar
    * EXTRACT functions vary across engines and sessions). Exact
    * counts, one share division per cell. Shape: one corpus pass into
    * ≤ types·168 cells, map-side combined.
    */
  private val q143 = QueryDef(
    "q143_seasonality",
    (s, dir) => {
      val cells = ev(s, dir)
        .select(col("event_type"),
          expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
            .as("us"))
        .select(col("event_type"),
          expr("(us div 3600000000) % 24").as("hour"),
          expr("((us div 86400000000) + 4) % 7").as("weekday"))
        .groupBy(col("event_type"), col("weekday"), col("hour"))
        .agg(count(lit(1)).as("n"))
      val tot = cells.groupBy(col("event_type")).agg(sum(col("n")).as("t"))
      cells.join(broadcast(tot), "event_type")
        .select(col("event_type"), col("weekday"), col("hour"), col("n"),
          (col("n").cast("double") / col("t")).as("share"))
        .orderBy("event_type", "weekday", "hour")
    },
    Some("""WITH cells AS (SELECT event_type,
          (epoch_us(ts) // 3600000000) % 24 AS hour,
          ((epoch_us(ts) // 86400000000) + 4) % 7 AS weekday,
          count(*) AS n
        FROM events GROUP BY 1, 2, 3),
      tot AS (SELECT event_type, sum(n) AS t FROM cells GROUP BY 1)
      SELECT cells.event_type AS event_type, weekday, hour, n::BIGINT AS n,
        n::DOUBLE / t AS share
      FROM cells JOIN tot ON tot.event_type = cells.event_type
      ORDER BY cells.event_type, weekday, hour"""))

  // ---------- q159: user-lifetime survival curve -----------------------

  /** Kaplan–Meier-style survival over user lifetimes: lifetime = whole
    * days between a user's first and last event (calendar-date diff —
    * integer on both engines), S(t) = fraction of users still active at
    * age t. One groupBy(user) pass over the corpus, then the survival
    * accumulation runs over the DISTINCT-lifetime table (≤ the day span
    * of the dataset, a few hundred rows) — so the unpartitioned
    * descending window is driver-trivial by construction, never a
    * corpus-wide single-partition sort. The 1-row total joins by
    * broadcast.
    */
  private val q159 = QueryDef(
    "q159_survival",
    (s, dir) => {
      val lt = ev(s, dir).groupBy(col("user_id"))
        .agg(min(col("ts").cast("date")).as("d0"),
          max(col("ts").cast("date")).as("d1"))
        .select(datediff(col("d1"), col("d0")).cast("long").as("t"))
      val d = lt.groupBy(col("t")).agg(count(lit(1)).as("n_ending"))
      val tot = d.agg(sum(col("n_ending")).as("tt"))
      d.withColumn("n_surviving",
          sum(col("n_ending")).over(Window.orderBy(col("t").desc)))
        .crossJoin(broadcast(tot))
        .select(col("t"), col("n_ending"), col("n_surviving"),
          round(col("n_surviving").cast("double") / col("tt"), 12)
            .as("survival"))
        .orderBy("t")
    },
    Some("""WITH lt AS (SELECT user_id,
          date_diff('day', min(ts)::DATE, max(ts)::DATE) AS t
        FROM events GROUP BY 1),
      d AS (SELECT t, count(*) AS n_ending FROM lt GROUP BY 1),
      tot AS (SELECT sum(n_ending) AS tt FROM d)
      SELECT t::BIGINT AS t, n_ending::BIGINT AS n_ending,
        sum(n_ending) OVER (ORDER BY t DESC)::BIGINT AS n_surviving,
        round(sum(n_ending) OVER (ORDER BY t DESC)::DOUBLE / tt, 12)
          AS survival
      FROM d CROSS JOIN tot ORDER BY t"""))

  // ---------- q163: A/B Welch t-test on purchase value ------------------

  /** Experiment readout: users split into variants by `user_id % 2`
    * (deterministic, engine-portable), metric = purchase event value,
    * compared with Welch's unequal-variance t statistic. (A
    * two-proportion conversion z-test is degenerate on this corpus —
    * every user purchases, pooled p = 1 — so the continuous-metric
    * test is the meaningful readout.) One conditional-aggregation
    * reduce over the purchase scan produces both variants' exact
    * moments: values are lifted to fixed-point micros (q147's trick)
    * so the order-independent integer/DECIMAL sums make mean and
    * variance bit-identical across engines; the t arithmetic then
    * runs on identical doubles, rounded to 12.
    */
  private val q163 = QueryDef(
    "q163_ab_value_ttest",
    (s, dir) => {
      val pe = ev(s, dir).where(col("event_type") === "purchase")
        .select(pmod(col("user_id"), lit(2L)).as("variant"),
          round(col("value") * 1e6).cast("long").as("u"))
      val m = pe.agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("variant") === 0, col("u")).otherwise(0L)).as("su_a"),
        sum(when(col("variant") === 1, col("u")).otherwise(0L)).as("su_b"),
        // u is lifted to DECIMAL(38,0) BEFORE squaring: u² overflows
        // int64 once a purchase value exceeds ~3034 (u > 3.03e9), and
        // Spark non-ANSI would wrap silently where DuckDB errors.
        sum(when(col("variant") === 0,
          col("u").cast(DecimalType(38, 0)) * col("u"))
          .otherwise(lit(0).cast(DecimalType(38, 0)))).as("su2_a"),
        sum(when(col("variant") === 1,
          col("u").cast(DecimalType(38, 0)) * col("u"))
          .otherwise(lit(0).cast(DecimalType(38, 0)))).as("su2_b"))
      val ma = col("su_a").cast("double") / 1e6 / col("n_a")
      val mb = col("su_b").cast("double") / 1e6 / col("n_b")
      val s2a = ((col("su2_a").cast("double") / 1e12
        - (col("su_a").cast("double") / 1e6)
          * (col("su_a").cast("double") / 1e6) / col("n_a"))
        / (col("n_a") - 1))
      val s2b = ((col("su2_b").cast("double") / 1e12
        - (col("su_b").cast("double") / 1e6)
          * (col("su_b").cast("double") / 1e6) / col("n_b"))
        / (col("n_b") - 1))
      m.select(col("n_a"), col("n_b"),
        round(ma, 12).as("mean_a"), round(mb, 12).as("mean_b"),
        round(s2a, 12).as("var_a"), round(s2b, 12).as("var_b"),
        round((ma - mb) / sqrt(s2a / col("n_a") + s2b / col("n_b")), 12)
          .as("t"))
    },
    Some("""WITH pe AS (SELECT user_id % 2 AS variant,
          round(value * 1e6)::BIGINT AS u
        FROM events WHERE event_type = 'purchase'),
      m AS (SELECT
          sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
          sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
          sum(CASE WHEN variant = 0 THEN u ELSE 0 END)::BIGINT AS su_a,
          sum(CASE WHEN variant = 1 THEN u ELSE 0 END)::BIGINT AS su_b,
          sum(CASE WHEN variant = 0
            THEN cast(u AS HUGEINT) * u
            ELSE cast(0 AS HUGEINT) END) AS su2_a,
          sum(CASE WHEN variant = 1
            THEN cast(u AS HUGEINT) * u
            ELSE cast(0 AS HUGEINT) END) AS su2_b
        FROM pe)
      SELECT n_a, n_b,
        round(su_a::DOUBLE / 1e6 / n_a, 12) AS mean_a,
        round(su_b::DOUBLE / 1e6 / n_b, 12) AS mean_b,
        round((su2_a::DOUBLE / 1e12
          - (su_a::DOUBLE / 1e6) * (su_a::DOUBLE / 1e6) / n_a)
          / (n_a - 1), 12) AS var_a,
        round((su2_b::DOUBLE / 1e12
          - (su_b::DOUBLE / 1e6) * (su_b::DOUBLE / 1e6) / n_b)
          / (n_b - 1), 12) AS var_b,
        round((su_a::DOUBLE / 1e6 / n_a - su_b::DOUBLE / 1e6 / n_b)
          / sqrt(((su2_a::DOUBLE / 1e12
              - (su_a::DOUBLE / 1e6) * (su_a::DOUBLE / 1e6) / n_a)
              / (n_a - 1)) / n_a
            + ((su2_b::DOUBLE / 1e12
              - (su_b::DOUBLE / 1e6) * (su_b::DOUBLE / 1e6) / n_b)
              / (n_b - 1)) / n_b), 12) AS t
      FROM m"""))

  // ---------- q164: seasonal-naive forecast backtest --------------------

  /** Weekly-seasonal-naive backtest over daily event volume: the
    * forecast for day d is the actual from d−7 (the strongest cheap
    * baseline for weekly-cycled traffic), joined by calendar-date
    * arithmetic — never row-offset lag, so holes in the date spine
    * can't silently misalign the season. Per-day absolute percentage
    * error is pure integer-count arithmetic lifted to double at the
    * end (round 12); the daily aggregate is one shuffle, the
    * self-join is on (event_type, date) against an aggregate ~10⁶×
    * smaller than the event stream.
    */
  private val q164 = QueryDef(
    "q164_seasonal_forecast",
    (s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), col("ts").cast("date").as("d"))
        .agg(count(lit(1)).as("actual"))
      daily.join(daily.select(col("event_type"),
          date_add(col("d"), 7).as("d"), col("actual").as("forecast")),
          Seq("event_type", "d"))
        .select(col("event_type"),
          datediff(col("d"), lit("1970-01-01").cast("date")).cast("long")
            .as("day"),
          col("actual"), col("forecast"),
          round(abs(col("actual") - col("forecast")).cast("double")
            / col("actual"), 12).as("ape"))
        .orderBy("event_type", "day")
    },
    Some("""WITH daily AS (SELECT event_type, ts::DATE AS d,
          count(*) AS actual
        FROM events GROUP BY 1, 2)
      SELECT a.event_type AS event_type,
        (a.d - DATE '1970-01-01')::BIGINT AS day,
        a.actual::BIGINT AS actual, f.actual::BIGINT AS forecast,
        round(abs(a.actual - f.actual)::DOUBLE / a.actual, 12) AS ape
      FROM daily a JOIN daily f ON f.event_type = a.event_type
        AND f.d + 7 = a.d
      ORDER BY event_type, day"""))

  // ---------- q171: CUSUM changepoint over daily volume -----------------

  /** Two-sided CUSUM changepoint detector over daily event volume — the
    * ingestion-monitoring alarm q164's backtest doesn't give: a slow
    * drift that never breaks a single day's seasonal forecast still
    * accumulates in S⁺/S⁻ and trips the threshold. Page's recursion
    * S⁺_t = max(0, S⁺_{t-1} + (x_t − μ − k)), S⁻ symmetric, with slack
    * k = μ/20 and alarm threshold h = 4μ (four mean-days of cumulative
    * excess), all in exact integer micro-units: counts are int64, μ is
    * an integer division of the int64 totals, so the recursion is
    * bit-exact in both engines (daily counts up to ~9e12 stay inside
    * int64 after the 1e6 lift). Shape: the distributed work is the ONE
    * corpus pass into |days| rows; the inherently sequential recursion
    * then runs over the collected day array via `aggregate` — bounded
    * by the calendar (~36.5k rows even for a century), never by corpus
    * size, the same bounded-spine argument as q59's gapfill. Oracle is
    * an independent DuckDB `WITH RECURSIVE` formulation of the same
    * recursion.
    */
  private val q171 = QueryDef(
    "q171_cusum_changepoint",
    (s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("ts").cast("date").as("d"))
        .agg(count(lit(1)).as("n"))
      val dev = "(x.n * 1000000L - mu_micro - k_micro)"
      val vde = "(mu_micro - k_micro - x.n * 1000000L)"
      val fold =
        s"""aggregate(xs,
          named_struct('out',
            cast(array() AS array<struct<d:date,n:bigint,sp:bigint,sn:bigint>>),
            'sp', 0L, 'sn', 0L),
          (acc, x) -> named_struct(
            'out', concat(acc.out, array(named_struct('d', x.d, 'n', x.n,
              'sp', greatest(0L, acc.sp + $dev),
              'sn', greatest(0L, acc.sn + $vde)))),
            'sp', greatest(0L, acc.sp + $dev),
            'sn', greatest(0L, acc.sn + $vde)),
          acc -> acc.out)"""
      daily
        .agg(sort_array(collect_list(struct(col("d"), col("n")))).as("xs"),
          sum(col("n")).as("tot"), count(lit(1)).as("nd"))
        .withColumn("mu_micro", expr("(tot * 1000000L) div nd"))
        .withColumn("k_micro", expr("mu_micro div 20"))
        .select(explode(expr(fold)).as("r"), col("mu_micro"))
        .select(col("r.d").as("d"), col("r.n").as("n"),
          (col("r.sp").cast("double") / 1e6).as("cusum_pos"),
          (col("r.sn").cast("double") / 1e6).as("cusum_neg"),
          (col("r.sp") > col("mu_micro") * 4).cast("int").as("spike"),
          (col("r.sn") > col("mu_micro") * 4).cast("int").as("dip"))
        .orderBy("d")
    },
    Some("""WITH RECURSIVE
      daily AS (SELECT ts::DATE AS d, count(*) AS n FROM events GROUP BY 1),
      stats AS (SELECT (sum(n) * 1000000) // count(*) AS mu,
        ((sum(n) * 1000000) // count(*)) // 20 AS k FROM daily),
      ord AS (SELECT d, n, row_number() OVER (ORDER BY d) AS rn FROM daily),
      c AS (
        SELECT o.rn, o.d, o.n,
          greatest(0, o.n * 1000000 - mu - k) AS sp,
          greatest(0, mu - k - o.n * 1000000) AS sn
        FROM ord o, stats WHERE o.rn = 1
        UNION ALL
        SELECT o.rn, o.d, o.n,
          greatest(0, c.sp + (o.n * 1000000 - mu - k)),
          greatest(0, c.sn + (mu - k - o.n * 1000000))
        FROM c, ord o, stats WHERE o.rn = c.rn + 1)
      SELECT d, n::BIGINT AS n,
        sp::DOUBLE / 1e6 AS cusum_pos, sn::DOUBLE / 1e6 AS cusum_neg,
        (sp > 4 * mu)::INT AS spike, (sn > 4 * mu)::INT AS dip
      FROM c, stats ORDER BY d"""))

  // ---------- q179: EWMA smoothing + deviation alarm --------------------

  /** Exponentially-weighted moving average of daily event volume with a
    * ±20 % deviation alarm — the smoothing companion to q171's CUSUM:
    * CUSUM catches slow drifts, the EWMA deviation catches single-day
    * spikes against a decaying baseline that (unlike q164's fixed
    * seasonal lag) adapts to level shifts. α = 1/4 keeps the recursion
    * in EXACT int64 micro-units: e_t = (3·e_{t-1} + n_t·10⁶) div 4,
    * dev_t = n_t·10⁶ − e_{t-1}, alarm iff 5·|dev| > e_{t-1} — no
    * floating point inside the recursion, so both engines agree
    * bit-for-bit (3·e stays under int64 for daily counts up to ~7·10¹¹).
    * Shape: the q171 bounded-spine contract — one distributed pass to
    * |days| rows, then the inherently sequential fold over the
    * calendar-bounded day array; oracle is an independent DuckDB
    * WITH RECURSIVE of the same recursion.
    */
  private val q179 = QueryDef(
    "q179_ewma_anomaly",
    (s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("ts").cast("date").as("d"))
        .agg(count(lit(1)).as("n"))
      val fold =
        """aggregate(xs,
          named_struct('out',
            cast(array() AS
              array<struct<d:date,n:bigint,e:bigint,dev:bigint,a:int>>),
            'e', -1L),
          (acc, x) -> named_struct(
            'out', concat(acc.out, array(named_struct('d', x.d, 'n', x.n,
              'e', CASE WHEN acc.e < 0L THEN x.n * 1000000L
                ELSE (3L * acc.e + x.n * 1000000L) div 4 END,
              'dev', CASE WHEN acc.e < 0L THEN 0L
                ELSE x.n * 1000000L - acc.e END,
              'a', CASE WHEN acc.e >= 0L
                  AND abs(x.n * 1000000L - acc.e) * 5L > acc.e
                THEN 1 ELSE 0 END))),
            'e', CASE WHEN acc.e < 0L THEN x.n * 1000000L
              ELSE (3L * acc.e + x.n * 1000000L) div 4 END),
          acc -> acc.out)"""
      daily
        .agg(sort_array(collect_list(struct(col("d"), col("n")))).as("xs"))
        .select(explode(expr(fold)).as("r"))
        .select(col("r.d").as("d"), col("r.n").as("n"),
          (col("r.e").cast("double") / 1e6).as("ewma"),
          (col("r.dev").cast("double") / 1e6).as("deviation"),
          col("r.a").as("alarm"))
        .orderBy("d")
    },
    Some("""WITH RECURSIVE
      daily AS (SELECT ts::DATE AS d, count(*) AS n FROM events GROUP BY 1),
      ord AS (SELECT d, n, row_number() OVER (ORDER BY d) AS rn FROM daily),
      c AS (
        SELECT rn, d, n, n * 1000000 AS e, 0::BIGINT AS dev, 0 AS a
        FROM ord WHERE rn = 1
        UNION ALL
        SELECT o.rn, o.d, o.n,
          (3 * c.e + o.n * 1000000) // 4,
          o.n * 1000000 - c.e,
          CASE WHEN abs(o.n * 1000000 - c.e) * 5 > c.e
            THEN 1 ELSE 0 END
        FROM c JOIN ord o ON o.rn = c.rn + 1)
      SELECT d, n::BIGINT AS n, e::DOUBLE / 1e6 AS ewma,
        dev::DOUBLE / 1e6 AS deviation, a::INT AS alarm
      FROM c ORDER BY d"""))

  // ---------- q191: linear multi-touch attribution --------------------

  /** Linear (equal-credit) multi-touch attribution — the fairness
    * counterpart to q126's last-touch: each purchase splits one unit
    * of credit (and its revenue) EQUALLY across the distinct non-
    * purchase channels the user touched in the 7-day lookback;
    * touchless purchases credit 'direct'. Credit quantizes to exact
    * integer micro-units (round(1e6/n)) so channel totals sum exact
    * int64 regardless of aggregation order — the documented cost is
    * ≤0.5 µ-credit per purchase. Shape: purchases range-join their own
    * user's touch rows on the NATIVE interval-containment operator
    * ([[graft.plans.RangeJoinOps.rangeJoin]] → `RangeJoinExec`): each
    * purchase carries [us − 7 d, us − 1 µs] and the touch stream is the
    * point side, so a hot user costs its genuine output, not the
    * key-equal θ-join's per-key cross product — then distinct channels
    * per purchase and two bounded aggregates. The anti-join for
    * 'direct' reuses the same join key.
    */
  private val q191 = QueryDef(
    "q191_linear_attribution",
    (s, dir) => {
      val LookbackUs = 604800000000L // 7 days in µs
      val base = ev(s, dir)
        .where(col("event_type").isin("view", "click", "signup", "purchase"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"),
          expr("timestampdiff(MICROSECOND, " +
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)").as("us"))
      val touches = base.where(col("event_type") =!= "purchase")
        .select(col("user_id").as("t_user"),
          col("event_type").as("channel"), col("us").as("t_us"))
      val purch = base.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("us"), col("value"))
      // inclusive-bounds native range join: strict t_us < us becomes
      // hi = us − 1 on the µs-integer axis
      val j = graft.plans.RangeJoinOps.rangeJoin(
          purch.withColumn("lo", col("us") - LookbackUs)
            .withColumn("hi", col("us") - 1L),
          touches, Seq("user_id"), Seq("t_user"), "lo", "hi", "t_us")
        .select(col("event_id"), col("value"), col("channel")).distinct()
      val n = j.groupBy(col("event_id")).agg(count(lit(1)).as("n_ch"))
      val credited = j.join(n, "event_id")
        .select(col("channel"),
          expr("CAST(round(1e6 / n_ch) AS BIGINT)").as("c_micro"),
          expr("CAST(round(value * 1e6 / n_ch) AS BIGINT)").as("v_micro"))
      val direct = purch
        .join(j.select(col("event_id")).distinct(), Seq("event_id"),
          "left_anti")
        .select(lit("direct").as("channel"), lit(1000000L).as("c_micro"),
          expr("CAST(round(value * 1e6) AS BIGINT)").as("v_micro"))
      credited.unionAll(direct)
        .groupBy(col("channel"))
        .agg((sum(col("c_micro")).cast("double") / 1e6)
          .as("credited_purchases"),
          (sum(col("v_micro")).cast("double") / 1e6).as("credited_revenue"))
        .orderBy("channel")
    },
    Some("""WITH base AS (SELECT user_id, event_id, event_type, value,
          epoch_us(ts) AS us FROM events
        WHERE event_type IN ('view', 'click', 'signup', 'purchase')),
      touches AS (SELECT user_id, event_type AS channel, us AS t_us
        FROM base WHERE event_type <> 'purchase'),
      purch AS (SELECT user_id, event_id, us, value FROM base
        WHERE event_type = 'purchase'),
      j AS (SELECT DISTINCT p.event_id, p.value, t.channel
        FROM purch p JOIN touches t ON t.user_id = p.user_id
          AND t.t_us < p.us AND t.t_us >= p.us - 604800000000),
      n AS (SELECT event_id, count(*) AS n_ch FROM j GROUP BY 1),
      credited AS (SELECT channel,
          round(1e6 / n_ch)::BIGINT AS c_micro,
          round(value * 1e6 / n_ch)::BIGINT AS v_micro
        FROM j JOIN n USING (event_id)),
      direct AS (SELECT 'direct' AS channel, 1000000::BIGINT AS c_micro,
          round(value * 1e6)::BIGINT AS v_micro
        FROM purch WHERE event_id NOT IN (SELECT event_id FROM j))
      SELECT channel,
        sum(c_micro)::DOUBLE / 1e6 AS credited_purchases,
        sum(v_micro)::DOUBLE / 1e6 AS credited_revenue
      FROM (SELECT * FROM credited UNION ALL SELECT * FROM direct)
      GROUP BY 1 ORDER BY channel"""))

  // ---------- q193: time-boxed conversion funnel -----------------------

  /** The q53 funnel with CONVERSION WINDOWS — the form product
    * analytics actually reports: a click counts only within 1 hour of
    * the user's first view, a purchase only within 24 hours of that
    * click. Time-boxing changes the answer (q53's unbounded funnel
    * over-counts late conversions) and the implementation: each stage
    * is one min-aggregate advanced through the NATIVE range join
    * ([[graft.plans.RangeJoinOps.rangeJoin]]) — the per-user stage
    * table carries the conversion window as its interval and the next
    * event stream is the point side, so stage matching is the linear
    * sliding-window merge rather than an equi-join's per-key cross
    * product with a post-filter. Per-user work, one shuffle per stage
    * on the same key, |users| rows between stages. Output is the
    * 3-row stage table with exact counts and one division per rate.
    */
  private val q193 = QueryDef(
    "q193_timeboxed_funnel",
    (s, dir) => {
      val HourUs = 3600000000L
      val DayUs = 86400000000L
      val base = ev(s, dir)
        .select(col("user_id"), col("event_type"),
          expr("timestampdiff(MICROSECOND, " +
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)").as("us"))
      val v = base.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t_view"))
      // strict us > t_stage on the µs-integer axis → lo = t_stage + 1
      val c = graft.plans.RangeJoinOps.rangeJoin(
          v.withColumn("lo", col("t_view") + 1L)
            .withColumn("hi", col("t_view") + HourUs),
          base.where(col("event_type") === "click")
            .select(col("user_id").as("cu"), col("us")),
          Seq("user_id"), Seq("cu"), "lo", "hi", "us")
        .groupBy(col("user_id")).agg(min(col("us")).as("t_click"))
      val p = graft.plans.RangeJoinOps.rangeJoin(
          c.withColumn("lo", col("t_click") + 1L)
            .withColumn("hi", col("t_click") + DayUs),
          base.where(col("event_type") === "purchase")
            .select(col("user_id").as("pu"), col("us")),
          Seq("user_id"), Seq("pu"), "lo", "hi", "us")
        .groupBy(col("user_id")).agg(min(col("us")).as("t_purchase"))
      val nv = v.agg(count(lit(1)).as("n")).select(lit(1).as("stage"),
        lit("view").as("name"), col("n"))
      val nc = c.agg(count(lit(1)).as("n")).select(lit(2).as("stage"),
        lit("click_1h").as("name"), col("n"))
      val np = p.agg(count(lit(1)).as("n")).select(lit(3).as("stage"),
        lit("purchase_24h").as("name"), col("n"))
      val stages = nv.unionAll(nc).unionAll(np)
      val first = nv.select(col("n").as("n0"))
      stages.crossJoin(broadcast(first))
        .select(col("stage"), col("name"), col("n"),
          (col("n").cast("double") / col("n0").cast("double"))
            .as("rate_vs_first"))
        .orderBy("stage")
    },
    Some("""WITH base AS (SELECT user_id, event_type, epoch_us(ts) AS us
          FROM events),
      v AS (SELECT user_id, min(us) AS t_view FROM base
        WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT b.user_id, min(b.us) AS t_click FROM base b
        JOIN v ON v.user_id = b.user_id AND b.us > v.t_view
          AND b.us <= v.t_view + 3600000000
        WHERE b.event_type = 'click' GROUP BY 1),
      p AS (SELECT b.user_id, min(b.us) AS t_purchase FROM base b
        JOIN c ON c.user_id = b.user_id AND b.us > c.t_click
          AND b.us <= c.t_click + 86400000000
        WHERE b.event_type = 'purchase' GROUP BY 1),
      stages AS (
        SELECT 1 AS stage, 'view' AS name, count(*) AS n FROM v
        UNION ALL SELECT 2, 'click_1h', count(*) FROM c
        UNION ALL SELECT 3, 'purchase_24h', count(*) FROM p),
      f AS (SELECT n AS n0 FROM stages WHERE stage = 1)
      SELECT stage, name, n::BIGINT AS n,
        n::DOUBLE / n0::DOUBLE AS rate_vs_first
      FROM stages, f ORDER BY stage"""))

  // ---------- q205: daily error rate with Wilson interval --------------

  /** Daily error-event share with a 95 % Wilson score interval — the
    * uncertainty-aware SLO report: a 2 %-error day on 50 events and
    * one on 50 000 events are different facts, and the Wilson bounds
    * say so. Counts are exact ints off one events pass; the interval
    * is the textbook closed form evaluated in textually identical
    * double arithmetic (sqrt is IEEE correctly-rounded, so unlike
    * ln/exp it cannot diverge across engines; z = 1.96 is a shared
    * literal). |days| output rows, calendar-bounded.
    */
  private val q205 = QueryDef(
    "q205_error_rate_ci",
    (s, dir) => {
      val z2 = "3.8416" // 1.96^2 as a shared literal
      val daily = ev(s, dir)
        .groupBy(col("ts").cast("date").as("d"))
        .agg(count(lit(1)).as("n"),
          sum((col("event_type") === "error").cast("long")).as("k"))
      daily.select(col("d"), col("n"), col("k"),
        expr("CAST(k AS DOUBLE) / CAST(n AS DOUBLE)").as("rate"),
        expr(s"""(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
            + $z2 / (2.0 * CAST(n AS DOUBLE))
            - 1.96 * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
              * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                / CAST(n AS DOUBLE)
              + $z2 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
            / (1.0 + $z2 / CAST(n AS DOUBLE))""").as("wilson_lo"),
        expr(s"""(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
            + $z2 / (2.0 * CAST(n AS DOUBLE))
            + 1.96 * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
              * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                / CAST(n AS DOUBLE)
              + $z2 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
            / (1.0 + $z2 / CAST(n AS DOUBLE))""").as("wilson_hi"))
        .orderBy("d")
    },
    Some("""WITH daily AS (SELECT ts::DATE AS d, count(*) AS n,
          sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT
            AS k
        FROM events GROUP BY 1)
      SELECT d, n, k, k::DOUBLE / n::DOUBLE AS rate,
        (k::DOUBLE / n::DOUBLE + 3.8416 / (2.0 * n::DOUBLE)
          - 1.96 * sqrt(k::DOUBLE / n::DOUBLE
            * (1.0 - k::DOUBLE / n::DOUBLE) / n::DOUBLE
            + 3.8416 / (4.0 * n::DOUBLE * n::DOUBLE)))
          / (1.0 + 3.8416 / n::DOUBLE) AS wilson_lo,
        (k::DOUBLE / n::DOUBLE + 3.8416 / (2.0 * n::DOUBLE)
          + 1.96 * sqrt(k::DOUBLE / n::DOUBLE
            * (1.0 - k::DOUBLE / n::DOUBLE) / n::DOUBLE
            + 3.8416 / (4.0 * n::DOUBLE * n::DOUBLE)))
          / (1.0 + 3.8416 / n::DOUBLE) AS wilson_hi
      FROM daily ORDER BY d"""))

  // ---------- q206: month-over-month churn ------------------------------

  /** Weekly churn: of the users active in epoch-week w, how many have
    * NO event in week w+1 — the retention complement of q117's
    * DAU/WAU and q54's fixed-cohort retention (churn re-baselines
    * every week; weekly because the events fixture spans ~one month,
    * so a monthly grain has no m+1 to compare). Week index is pure
    * integer epoch-day division by 7 — portable, no calendar
    * library. One distinct (user, week) projection; churned = anti
    * join of week-w actives against week-w+1 actives ON THE USER KEY
    * (shuffle tracks distinct actives, not events); the last week
    * drops out. Exact counts, one division.
    */
  private val q206 = QueryDef(
    "q206_weekly_churn",
    (s, dir) => {
      val um = ev(s, dir)
        .select(col("user_id"),
          expr("""timestampdiff(MICROSECOND,
            TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)
            div 86400000000 div 7""").as("mi"))
        .distinct()
      val maxM = um.agg(max(col("mi")).as("max_mi"))
      val next = um.select(col("user_id"), (col("mi") - 1).as("mi"))
      val churned = um.join(next, Seq("user_id", "mi"), "left_anti")
      val act = um.groupBy(col("mi")).agg(count(lit(1)).as("n_active"))
      val chn = churned.groupBy(col("mi")).agg(count(lit(1)).as("n_churned"))
      act.join(chn, Seq("mi"), "left_outer")
        .crossJoin(broadcast(maxM))
        .where(col("mi") < col("max_mi"))
        .select(col("mi"), col("n_active"),
          coalesce(col("n_churned"), lit(0L)).as("n_churned"),
          (coalesce(col("n_churned"), lit(0L)).cast("double")
            / col("n_active").cast("double")).as("churn_rate"))
        .orderBy("mi")
    },
    Some("""WITH um AS (SELECT DISTINCT user_id,
          epoch_us(ts) // 86400000000 // 7 AS mi FROM events),
      mm AS (SELECT max(mi) AS max_mi FROM um),
      churned AS (SELECT a.mi, count(*) AS n_churned FROM um a
        WHERE NOT EXISTS (SELECT 1 FROM um b
          WHERE b.user_id = a.user_id AND b.mi = a.mi + 1)
        GROUP BY 1),
      act AS (SELECT mi, count(*) AS n_active FROM um GROUP BY 1)
      SELECT mi::BIGINT AS mi, n_active,
        coalesce(n_churned, 0)::BIGINT AS n_churned,
        coalesce(n_churned, 0)::DOUBLE / n_active::DOUBLE AS churn_rate
      FROM act LEFT JOIN churned USING (mi), mm
      WHERE mi < max_mi ORDER BY mi"""))

  // ---------- q222: throttle dedup (alert suppression) ----------------

  /** Rate-limit suppression per (user, event_type): keep an event only
    * if the key's PREVIOUS event is more than 24 hours older — the
    * alert-throttle / notification-dedup shape (a burst collapses to
    * its first event; a sustained drizzle under the gap stays
    * suppressed because every event refreshes the clock — trailing
    * daily-digest throttle, not session-start detection, which q27's
    * 30-min gap handles). One window pass per key with a (ts, event_id) total
    * order; at 100 TB the shuffle is on the (user, type) key and each
    * partition sort is that key's event count. The streaming twin
    * ([[graft.streaming.EventStream.throttle]]) holds ONE timestamp of
    * state per key — constant state, spec-proven equal under
    * `Trigger.AvailableNow`.
    */
  private[graft] val ThrottleGapUs = 86400000000L // 24 h

  private val q222 = QueryDef(
    "q222_throttle_dedup",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      ev(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts"),
          expr("""timestampdiff(MICROSECOND,
            TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)""").as("us"))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .where(col("prev_us").isNull
          || col("us") - col("prev_us") > ThrottleGapUs)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts"))
        .orderBy("user_id", "event_type", "ts", "event_id")
    },
    Some(s"""WITH e AS (SELECT event_id, user_id, event_type, ts,
        epoch_us(ts) AS us,
        lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
          ORDER BY ts, event_id) AS prev_us
      FROM events)
      SELECT event_id, user_id, event_type, ts FROM e
      WHERE prev_us IS NULL OR us - prev_us > $ThrottleGapUs
      ORDER BY user_id, event_type, ts, event_id"""))

  // ---------- q223: PIVOT (day × event-type count matrix) -------------

  /** Daily event counts pivoted to one column per event type — the
    * PIVOT relational operator (Spark `RelationalGroupedDataset.pivot`
    * with an EXPLICIT value list: an inferred list would be a separate
    * distinct job AND nondeterministic column order). Pivot compiles
    * to one hash aggregate with a conditional count per column — one
    * shuffle on the day key, |days| × |types| cells, map-side
    * partials; empty cells are filled 0 to match the oracle's FILTER
    * counts. The day key is pure epoch integer arithmetic (the q143
    * rule — calendar EXTRACT is engine/session-varying). At 100 TB
    * this is the wide-report shape: output rows are calendar-bounded,
    * so the pivot never materializes more than |days| rows past the
    * aggregate.
    */
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  private val q223 = QueryDef(
    "q223_pivot_counts",
    (s, dir) => ev(s, dir)
      .groupBy(expr("""timestampdiff(MICROSECOND,
        TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000""")
        .as("day"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("day"),
    Some(s"""SELECT epoch_us(ts) // 86400000000 AS day,
      ${EventTypes.map(t =>
        s"count(*) FILTER (WHERE event_type = '$t')::BIGINT AS $t")
        .mkString(",\n      ")}
      FROM events GROUP BY 1 ORDER BY day"""))

  // ---------- q227: Fano-factor burstiness ----------------------------

  /** Fano factor (variance / mean of daily counts) per event type — the
    * burstiness scalar the monitoring stack reads next to q142's
    * autocorrelation and q143's seasonality: F ≈ 1 is Poisson-like
    * arrivals, F ≫ 1 means bursty traffic (retry storms, batch
    * replays) where per-day alarms misfire. Days with NO events count
    * as zeros (the q142/q212 rule — dropping them biases F down), via
    * the broadcast type×day grid over the observed span. All moments
    * are exact int64 sums (daily counts ≤ ~3·10⁹ keep Σc² inside
    * DECIMAL(38,0) at any scale); F = (nΣc² − (Σc)²)/(n·Σc) is one
    * double chain on the exact sums, rounded 12. Shape: one (type,
    * day) shuffle, a |types|-row rollup.
    */
  private val q227 = QueryDef(
    "q227_fano_burstiness",
    (s, dir) => {
      val days = ev(s, dir)
        .select(expr("""timestampdiff(MICROSECOND,
          TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)
          div 86400000000""").as("day"))
        .distinct()
      val types = ev(s, dir).select(col("event_type")).distinct()
      val counts = ev(s, dir)
        .groupBy(col("event_type"),
          expr("""timestampdiff(MICROSECOND,
            TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)
            div 86400000000""").as("day"))
        .agg(count(lit(1)).as("c"))
      broadcast(types).crossJoin(broadcast(days))
        .join(counts, Seq("event_type", "day"), "left_outer")
        .select(col("event_type"),
          coalesce(col("c"), lit(0L)).as("c"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("c")).as("sc"),
          sum((col("c") * col("c")).cast(DecimalType(38, 0))).as("scc"))
        .select(col("event_type"), col("n_days"),
          round(col("sc").cast("double") / col("n_days").cast("double"), 12)
            .as("mean_daily"),
          round((col("n_days").cast("double") * col("scc").cast("double")
            - col("sc").cast("double") * col("sc").cast("double"))
            / (col("n_days").cast("double") * col("sc").cast("double")), 12)
            .as("fano"))
        .orderBy("event_type")
    },
    Some("""WITH days AS (SELECT DISTINCT epoch_us(ts) // 86400000000
          AS day FROM events),
      types AS (SELECT DISTINCT event_type FROM events),
      counts AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
          count(*) AS c
        FROM events GROUP BY 1, 2),
      grid AS (SELECT t.event_type, d.day, coalesce(c.c, 0) AS c
        FROM types t CROSS JOIN days d
        LEFT JOIN counts c ON c.event_type = t.event_type
          AND c.day = d.day),
      m AS (SELECT event_type, count(*) AS n_days,
          sum(c)::BIGINT AS sc, sum((c * c)::DECIMAL(38,0)) AS scc
        FROM grid GROUP BY 1)
      SELECT event_type, n_days,
        round(sc::DOUBLE / n_days::DOUBLE, 12) AS mean_daily,
        round((n_days::DOUBLE * scc::DOUBLE - sc::DOUBLE * sc::DOUBLE)
          / (n_days::DOUBLE * sc::DOUBLE), 12) AS fano
      FROM m ORDER BY event_type"""))

  // ---------- q255: difference-in-differences -------------------------

  /** Quasi-experimental readout: purchase value in treated vs control
    * (the q163 hash-arm convention, user_id % 2) across a mid-corpus
    * policy cutoff — DiD = (post_t − pre_t) − (post_c − pre_c), the
    * causal estimate when arms share a pre-trend. One conditional
    * aggregate over the fact stream (map-side combined to four
    * (arm × period) cells), one output row; values go through the
    * round-to-integer-micros convention (q163) so the cell sums are
    * exact and order-independent on both engines.
    */
  private val q255 = QueryDef(
    "q255_diff_in_diff",
    (s, dir) => {
      val cut = "TIMESTAMP_NTZ '2024-01-16 00:00:00'"
      val pe = ev(s, dir).where(col("event_type") === "purchase")
        .select(pmod(col("user_id"), lit(2L)).as("arm"),
          expr(s"ts >= $cut").as("post"),
          round(col("value") * 1e6).cast("long").as("u"))
      val cells = pe.agg(
        sum(when(col("arm") === 0 && !col("post"), 1L).otherwise(0L))
          .as("n_pre_c"),
        sum(when(col("arm") === 0 && col("post"), 1L).otherwise(0L))
          .as("n_post_c"),
        sum(when(col("arm") === 1 && !col("post"), 1L).otherwise(0L))
          .as("n_pre_t"),
        sum(when(col("arm") === 1 && col("post"), 1L).otherwise(0L))
          .as("n_post_t"),
        sum(when(col("arm") === 0 && !col("post"), col("u")).otherwise(0L))
          .as("su_pre_c"),
        sum(when(col("arm") === 0 && col("post"), col("u")).otherwise(0L))
          .as("su_post_c"),
        sum(when(col("arm") === 1 && !col("post"), col("u")).otherwise(0L))
          .as("su_pre_t"),
        sum(when(col("arm") === 1 && col("post"), col("u")).otherwise(0L))
          .as("su_post_t"))
      def m(su: String, n: String) =
        col(su).cast(DoubleType) / 1e6 / col(n).cast(DoubleType)
      cells.select(
        col("n_pre_c"), col("n_post_c"), col("n_pre_t"), col("n_post_t"),
        round(m("su_pre_c", "n_pre_c"), 12).as("mean_pre_c"),
        round(m("su_post_c", "n_post_c"), 12).as("mean_post_c"),
        round(m("su_pre_t", "n_pre_t"), 12).as("mean_pre_t"),
        round(m("su_post_t", "n_post_t"), 12).as("mean_post_t"),
        round((m("su_post_t", "n_post_t") - m("su_pre_t", "n_pre_t"))
          - (m("su_post_c", "n_post_c") - m("su_pre_c", "n_pre_c")), 12)
          .as("did"))
    },
    Some("""WITH pe AS (SELECT user_id % 2 AS arm,
          ts >= TIMESTAMP '2024-01-16 00:00:00' AS post,
          round(value * 1e6)::BIGINT AS u
        FROM events WHERE event_type = 'purchase'),
      c AS (SELECT
          sum(CASE WHEN arm = 0 AND NOT post THEN 1 ELSE 0 END)::BIGINT
            AS n_pre_c,
          sum(CASE WHEN arm = 0 AND post THEN 1 ELSE 0 END)::BIGINT
            AS n_post_c,
          sum(CASE WHEN arm = 1 AND NOT post THEN 1 ELSE 0 END)::BIGINT
            AS n_pre_t,
          sum(CASE WHEN arm = 1 AND post THEN 1 ELSE 0 END)::BIGINT
            AS n_post_t,
          sum(CASE WHEN arm = 0 AND NOT post THEN u ELSE 0 END)::BIGINT
            AS su_pre_c,
          sum(CASE WHEN arm = 0 AND post THEN u ELSE 0 END)::BIGINT
            AS su_post_c,
          sum(CASE WHEN arm = 1 AND NOT post THEN u ELSE 0 END)::BIGINT
            AS su_pre_t,
          sum(CASE WHEN arm = 1 AND post THEN u ELSE 0 END)::BIGINT
            AS su_post_t
        FROM pe)
      SELECT n_pre_c, n_post_c, n_pre_t, n_post_t,
        round(su_pre_c::DOUBLE / 1e6 / n_pre_c::DOUBLE, 12) AS mean_pre_c,
        round(su_post_c::DOUBLE / 1e6 / n_post_c::DOUBLE, 12)
          AS mean_post_c,
        round(su_pre_t::DOUBLE / 1e6 / n_pre_t::DOUBLE, 12) AS mean_pre_t,
        round(su_post_t::DOUBLE / 1e6 / n_post_t::DOUBLE, 12)
          AS mean_post_t,
        round((su_post_t::DOUBLE / 1e6 / n_post_t::DOUBLE
            - su_pre_t::DOUBLE / 1e6 / n_pre_t::DOUBLE)
          - (su_post_c::DOUBLE / 1e6 / n_post_c::DOUBLE
            - su_pre_c::DOUBLE / 1e6 / n_pre_c::DOUBLE), 12) AS did
      FROM c"""))

  // ---------- q256: CUPED variance reduction ---------------------------

  /** Experiment-analysis workhorse: adjust each arm's post-period
    * purchase metric by the user's PRE-period spend (the covariate a
    * controlled experiment gets for free), θ = pooled cov(pre, post) /
    * var(pre). By linearity the adjusted arm mean needs only arm-level
    * aggregates — mean_post − θ·(mean_pre_arm − mean_pre_pooled) — so
    * the plan is one user-keyed aggregate (the only shuffle), a 2-row
    * arm rollup carrying exact integer-micro sums and DECIMAL-lifted
    * second moments (the q163 overflow discipline), and a 1-row pooled
    * broadcast. Also reports the realized per-arm variance reduction
    * 1 − var(post − θ·pre)/var(post), the number CUPED exists to
    * deliver.
    */
  private val q256 = QueryDef(
    "q256_cuped",
    (s, dir) => {
      val cut = "TIMESTAMP_NTZ '2024-01-16 00:00:00'"
      val perUser = ev(s, dir)
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type") === "purchase" && expr(s"ts < $cut"),
            round(col("value") * 1e6).cast("long")).otherwise(0L))
            .as("pre_u"),
          sum(when(col("event_type") === "purchase" && expr(s"ts >= $cut"),
            round(col("value") * 1e6).cast("long")).otherwise(0L))
            .as("post_u"))
        .select(pmod(col("user_id"), lit(2L)).as("arm"),
          col("pre_u"), col("post_u"))
      val arms = perUser.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"),
          sum(col("pre_u")).as("sp"), sum(col("post_u")).as("so"),
          sum(col("pre_u").cast(DecimalType(38, 0)) * col("pre_u"))
            .as("spp"),
          sum(col("pre_u").cast(DecimalType(38, 0)) * col("post_u"))
            .as("spo"),
          sum(col("post_u").cast(DecimalType(38, 0)) * col("post_u"))
            .as("soo"))
      val pooled = arms.agg(
        sum(col("n")).as("tn"), sum(col("sp")).as("tsp"),
        sum(col("so")).as("tso"), sum(col("spp")).as("tspp"),
        sum(col("spo")).as("tspo"))
        .select(
          round((col("tn").cast(DoubleType) * col("tspo").cast(DoubleType)
            - col("tsp").cast(DoubleType) * col("tso").cast(DoubleType))
            / (col("tn").cast(DoubleType) * col("tspp").cast(DoubleType)
              - col("tsp").cast(DoubleType) * col("tsp").cast(DoubleType)),
            12).as("theta"),
          (col("tsp").cast(DoubleType) / 1e6 / col("tn").cast(DoubleType))
            .as("gm_pre"))
      val nD = col("n").cast(DoubleType)
      val mPre = col("sp").cast(DoubleType) / 1e6 / nD
      val mPost = col("so").cast(DoubleType) / 1e6 / nD
      val varPost = (col("soo").cast(DoubleType) / 1e12
        - (col("so").cast(DoubleType) / 1e6)
          * (col("so").cast(DoubleType) / 1e6) / nD) / (nD - 1)
      val varPre = (col("spp").cast(DoubleType) / 1e12
        - (col("sp").cast(DoubleType) / 1e6)
          * (col("sp").cast(DoubleType) / 1e6) / nD) / (nD - 1)
      val covPP = (col("spo").cast(DoubleType) / 1e12
        - (col("sp").cast(DoubleType) / 1e6)
          * (col("so").cast(DoubleType) / 1e6) / nD) / (nD - 1)
      val varAdj = (varPost - lit(2.0) * col("theta") * covPP
        + col("theta") * col("theta") * varPre)
      arms.crossJoin(broadcast(pooled))
        .select(col("arm"), col("n").as("n_users"),
          round(mPost, 12).as("raw_mean"),
          round(mPost - col("theta") * (mPre - col("gm_pre")), 12)
            .as("adjusted_mean"),
          col("theta"),
          round(lit(1.0) - varAdj / varPost, 12).as("var_reduction"))
        .orderBy("arm")
    },
    Some("""WITH pu AS (SELECT user_id,
          sum(CASE WHEN event_type = 'purchase'
              AND ts < TIMESTAMP '2024-01-16 00:00:00'
            THEN round(value * 1e6)::BIGINT ELSE 0 END)::BIGINT AS pre_u,
          sum(CASE WHEN event_type = 'purchase'
              AND ts >= TIMESTAMP '2024-01-16 00:00:00'
            THEN round(value * 1e6)::BIGINT ELSE 0 END)::BIGINT AS post_u
        FROM events GROUP BY 1),
      arms AS (SELECT user_id % 2 AS arm, count(*)::BIGINT AS n,
          sum(pre_u)::BIGINT AS sp, sum(post_u)::BIGINT AS so,
          sum(pre_u::HUGEINT * pre_u) AS spp,
          sum(pre_u::HUGEINT * post_u) AS spo,
          sum(post_u::HUGEINT * post_u) AS soo
        FROM pu GROUP BY 1),
      pooled AS (SELECT
          round((sum(n)::DOUBLE * sum(spo)::DOUBLE
            - sum(sp)::DOUBLE * sum(so)::DOUBLE)
            / (sum(n)::DOUBLE * sum(spp)::DOUBLE
              - sum(sp)::DOUBLE * sum(sp)::DOUBLE), 12) AS theta,
          sum(sp)::DOUBLE / 1e6 / sum(n)::DOUBLE AS gm_pre
        FROM arms)
      SELECT arm, n AS n_users,
        round(so::DOUBLE / 1e6 / n::DOUBLE, 12) AS raw_mean,
        round(so::DOUBLE / 1e6 / n::DOUBLE
          - theta * (sp::DOUBLE / 1e6 / n::DOUBLE - gm_pre), 12)
          AS adjusted_mean,
        theta,
        round(1.0 - ((soo::DOUBLE / 1e12
            - (so::DOUBLE / 1e6) * (so::DOUBLE / 1e6) / n::DOUBLE)
              / (n::DOUBLE - 1)
          - 2.0 * theta * ((spo::DOUBLE / 1e12
            - (sp::DOUBLE / 1e6) * (so::DOUBLE / 1e6) / n::DOUBLE)
              / (n::DOUBLE - 1))
          + theta * theta * ((spp::DOUBLE / 1e12
            - (sp::DOUBLE / 1e6) * (sp::DOUBLE / 1e6) / n::DOUBLE)
              / (n::DOUBLE - 1)))
          / ((soo::DOUBLE / 1e12
            - (so::DOUBLE / 1e6) * (so::DOUBLE / 1e6) / n::DOUBLE)
              / (n::DOUBLE - 1)), 12) AS var_reduction
      FROM arms, pooled ORDER BY arm"""))

  // ---------- q268: binary-segmentation changepoint --------------------

  /** Optimal single changepoint per event type — the first step of
    * binary segmentation over the daily count series, complementing
    * q171's CUSUM (which detects THAT drift happened; binseg says
    * WHERE to cut): the split maximizing the between-segment variance
    * reduction R(t) = nₗ·nᵣ/n · (meanₗ − meanᵣ)². The series
    * collapses to |types| × |days| rows at the first aggregate, so
    * every window below runs on ≤31-row partitions — prefix sums give
    * every candidate split's two means from ONE pass, R is evaluated
    * for all splits simultaneously, and the argmax ties break on the
    * earliest day. Integer count sums keep both engines' R inputs
    * identical; R itself is one rounded double per candidate.
    */
  private val q268 = QueryDef(
    "q268_binseg_changepoint",
    (s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"),
          expr("datediff(cast(ts AS DATE), DATE '1970-01-01')").as("day"))
        .agg(count(lit(1)).as("c"))
      val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val wAll = Window.partitionBy(col("event_type"))
      val pre = daily
        .withColumn("t", row_number().over(wOrd).cast("long"))
        .withColumn("s_t", sum(col("c")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n_days", count(lit(1)).over(wAll))
        .withColumn("s_all", sum(col("c")).over(wAll))
      val cand = pre.where(col("t") < col("n_days"))
      val meanL = col("s_t").cast("double") / col("t").cast("double")
      val meanR = (col("s_all") - col("s_t")).cast("double") /
        (col("n_days") - col("t")).cast("double")
      val gain = (col("t").cast("double")
        * (col("n_days") - col("t")).cast("double")
        / col("n_days").cast("double"))
        .*( (meanL - meanR) * (meanL - meanR) )
      val scored = cand.select(col("event_type"), col("day"), col("t"),
        round(meanL, 12).as("mean_left"), round(meanR, 12).as("mean_right"),
        round(gain, 12).as("gain"))
      val wBest = Window.partitionBy(col("event_type"))
        .orderBy(col("gain").desc, col("day"))
      scored.withColumn("rn", row_number().over(wBest))
        .where(col("rn") === 1)
        .select(col("event_type"), col("day").as("split_day"),
          col("t").as("n_days_left"), col("mean_left"), col("mean_right"),
          col("gain"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (SELECT event_type,
          (ts::DATE - DATE '1970-01-01') AS day, count(*)::BIGINT AS c
        FROM events GROUP BY 1, 2),
      pre AS (SELECT event_type, day, c,
          row_number() OVER (PARTITION BY event_type ORDER BY day)
            ::BIGINT AS t,
          sum(c) OVER (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_t,
          count(*) OVER (PARTITION BY event_type)::BIGINT AS n_days,
          sum(c) OVER (PARTITION BY event_type) AS s_all
        FROM daily),
      scored AS (SELECT event_type, day, t,
          round(s_t::DOUBLE / t::DOUBLE, 12) AS mean_left,
          round((s_all - s_t)::DOUBLE / (n_days - t)::DOUBLE, 12)
            AS mean_right,
          round((t::DOUBLE * (n_days - t)::DOUBLE / n_days::DOUBLE)
            * ((s_t::DOUBLE / t::DOUBLE
                - (s_all - s_t)::DOUBLE / (n_days - t)::DOUBLE)
              * (s_t::DOUBLE / t::DOUBLE
                - (s_all - s_t)::DOUBLE / (n_days - t)::DOUBLE)), 12)
            AS gain
        FROM pre WHERE t < n_days),
      best AS (SELECT event_type, day, t, mean_left, mean_right, gain,
          row_number() OVER (PARTITION BY event_type
            ORDER BY gain DESC, day) AS rn
        FROM scored)
      SELECT event_type, day AS split_day, t AS n_days_left,
        mean_left, mean_right, gain
      FROM best WHERE rn = 1 ORDER BY event_type"""))

  // ---------- q273: exact Shapley channel attribution ------------------

  /** Game-theoretic attribution over the four non-purchase channels —
    * the fair-division answer beside q126's last-touch and q191's
    * linear rules: each user contributes their PRE-first-purchase
    * touch-set (a 4-bit mask) and a conversion flag; the coalition
    * value v(S) is the conversion rate of users whose touch-set fits
    * inside S, and each channel's Shapley value is the
    * factorially-weighted average of its marginal contributions. The
    * corpus work is ONE user-keyed aggregate; everything after runs on
    * a 16-row signature table × 16 literal subsets × 4 channels —
    * constant-size no matter the event volume. Determinism: v(S) pins
    * to nano-units, the Shapley sum multiplies pinned integers by the
    * integer weight numerators |S|!·(3−|S|)! ∈ {6,2,2,6} and divides
    * ONCE by 24·1e9 — no float accumulates across subsets. The
    * efficiency identity Σφ = v(full) − v(∅) ships in the output as
    * its own audit columns.
    */
  private val q273 = QueryDef(
    "q273_shapley_attribution",
    (s, dir) => {
      val e = ev(s, dir)
      val firstBuy = e.where(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(min(col("ts")).as("fb"))
      val perUser = e
        .join(firstBuy, Seq("user_id"), "left_outer")
        .select(col("user_id"),
          when(col("event_type") === "click"
            && (col("fb").isNull || col("ts") < col("fb")), 1L)
            .when(col("event_type") === "error"
              && (col("fb").isNull || col("ts") < col("fb")), 2L)
            .when(col("event_type") === "signup"
              && (col("fb").isNull || col("ts") < col("fb")), 4L)
            .when(col("event_type") === "view"
              && (col("fb").isNull || col("ts") < col("fb")), 8L)
            .otherwise(0L).as("bit"),
          when(col("fb").isNotNull, 1L).otherwise(0L).as("conv"))
        .groupBy(col("user_id"))
        .agg(expr("CAST(bit_or(bit) AS BIGINT)").as("mask"),
          max(col("conv")).as("conv"))
      val sig = perUser.groupBy(col("mask"))
        .agg(count(lit(1)).as("n_u"), sum(col("conv")).as("n_c"))
      val subsets = s.range(16).select(col("id").as("ss"))
      val v = subsets.join(broadcast(sig),
          expr("(mask & ~ss) = 0"), "left_outer")
        .groupBy(col("ss"))
        .agg(coalesce(sum(col("n_u")), lit(0L)).as("nu"),
          coalesce(sum(col("n_c")), lit(0L)).as("nc"))
        .select(col("ss"),
          when(col("nu") > 0,
            expr("CAST(round(CAST(nc AS DOUBLE) / CAST(nu AS DOUBLE) " +
              "* 1e9) AS BIGINT)")).otherwise(0L).as("v_nano"))
      val channels = s.range(4)
        .select(expr("CAST(1 << id AS BIGINT)").as("bit"),
          expr("element_at(array('click','error','signup','view'), " +
            "CAST(id AS INT) + 1)").as("channel"))
      val phi = broadcast(channels)
        .join(v.select(col("ss").as("s0"), col("v_nano").as("v_without")),
          expr("(s0 & bit) = 0"))
        .join(broadcast(v.select(col("ss").as("s1"),
          col("v_nano").as("v_with"))), expr("s1 = (s0 | bit)"))
        .select(col("channel"),
          (expr("""CASE bit_count(s0) WHEN 0 THEN 6 WHEN 1 THEN 2
             WHEN 2 THEN 2 ELSE 6 END""")
            * (col("v_with") - col("v_without"))).as("term"))
        .groupBy(col("channel"))
        .agg((sum(col("term")).cast("double") / 24.0 / 1e9).as("phi_raw"))
      val audit = v.agg(
        (max(when(col("ss") === 15, col("v_nano"))).cast("double") / 1e9)
          .as("v_full"),
        (max(when(col("ss") === 0, col("v_nano"))).cast("double") / 1e9)
          .as("v_empty"))
      phi.crossJoin(broadcast(audit))
        .select(col("channel"), round(col("phi_raw"), 12).as("phi"),
          round(col("v_full"), 12).as("v_full"),
          round(col("v_empty"), 12).as("v_empty"))
        .orderBy("channel")
    },
    Some("""WITH fb AS (SELECT user_id, min(ts) AS fb FROM events
        WHERE event_type = 'purchase' GROUP BY 1),
      pu AS (SELECT e.user_id,
          bit_or(CASE
            WHEN event_type = 'click'
              AND (fb IS NULL OR ts < fb) THEN 1
            WHEN event_type = 'error'
              AND (fb IS NULL OR ts < fb) THEN 2
            WHEN event_type = 'signup'
              AND (fb IS NULL OR ts < fb) THEN 4
            WHEN event_type = 'view'
              AND (fb IS NULL OR ts < fb) THEN 8
            ELSE 0 END)::BIGINT AS mask,
          max(CASE WHEN fb IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS conv
        FROM events e LEFT JOIN fb ON e.user_id = fb.user_id
        GROUP BY 1),
      sig AS (SELECT mask, count(*)::BIGINT AS n_u,
          sum(conv)::BIGINT AS n_c
        FROM pu GROUP BY 1),
      v AS (SELECT ss,
          CASE WHEN coalesce(sum(n_u), 0) > 0
            THEN round(coalesce(sum(n_c), 0)::DOUBLE
              / coalesce(sum(n_u), 0)::DOUBLE * 1e9)::BIGINT
            ELSE 0 END AS v_nano
        FROM range(0, 16) t(ss) LEFT JOIN sig ON (mask & ~ss) = 0
        GROUP BY 1),
      ch AS (SELECT (1 << i)::BIGINT AS bit,
          ['click', 'error', 'signup', 'view'][i + 1] AS channel
        FROM range(0, 4) t(i)),
      phi AS (SELECT channel,
          sum((CASE bit_count(s0.ss) WHEN 0 THEN 6 WHEN 1 THEN 2
              WHEN 2 THEN 2 ELSE 6 END)
            * (s1.v_nano - s0.v_nano))::DOUBLE / 24.0 / 1e9 AS phi_raw
        FROM ch JOIN v s0 ON (s0.ss & bit) = 0
        JOIN v s1 ON s1.ss = (s0.ss | bit)
        GROUP BY 1),
      audit AS (SELECT
          max(CASE WHEN ss = 15 THEN v_nano END)::DOUBLE / 1e9 AS v_full,
          max(CASE WHEN ss = 0 THEN v_nano END)::DOUBLE / 1e9 AS v_empty
        FROM v)
      SELECT channel, round(phi_raw, 12) AS phi,
        round(v_full, 12) AS v_full, round(v_empty, 12) AS v_empty
      FROM phi, audit ORDER BY channel"""))

  // ---------- q276: per-user feature-store materialization -------------

  /** The feature-assembly deliverable an ML platform schedules nightly:
    * one wide per-user feature vector — activity counts, exact
    * integer-micro monetary sum, first/last activity days, distinct
    * active days, recency against the corpus horizon, and error share
    * — materialized in ONE conditional aggregate pass over the event
    * stream (no joins: every feature is an aggregate of the same
    * user-keyed shuffle, which is what keeps a 100 TB feature refresh
    * a single-stage job). All features are integer-exact except the
    * one final share division; day arithmetic is integer days since
    * epoch (the q68 idiom).
    */
  private val q276 = QueryDef(
    "q276_feature_store",
    (s, dir) => {
      val horizon = lit(19754L) // 2024-01-31 as days since 1970-01-01
      ev(s, dir)
        .select(col("user_id"),
          expr("datediff(cast(ts AS DATE), DATE '1970-01-01')")
            .cast("long").as("day"),
          col("event_type"),
          when(col("event_type") === "purchase",
            expr("cast(round(value * 1e6) AS BIGINT)")).otherwise(0L)
            .as("u"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n_purchases"),
          sum(col("u")).as("value_micro"),
          min(col("day")).as("first_day"),
          max(col("day")).as("last_day"),
          countDistinct(col("day")).as("active_days"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("n_errors"))
        .select(col("user_id"), col("n_events"), col("n_purchases"),
          col("value_micro"), col("first_day"), col("last_day"),
          col("active_days"),
          (horizon - col("last_day")).as("recency_days"),
          round(col("n_errors").cast("double")
            / col("n_events").cast("double"), 12).as("error_share"))
        .orderBy("user_id")
    },
    Some("""WITH f AS (SELECT user_id,
          (ts::DATE - DATE '1970-01-01') AS day, event_type,
          CASE WHEN event_type = 'purchase'
            THEN round(value * 1e6)::BIGINT ELSE 0 END AS u
        FROM events)
      SELECT user_id, count(*)::BIGINT AS n_events,
        sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
          AS n_purchases,
        sum(u)::BIGINT AS value_micro,
        min(day)::BIGINT AS first_day, max(day)::BIGINT AS last_day,
        count(DISTINCT day)::BIGINT AS active_days,
        (19754 - max(day))::BIGINT AS recency_days,
        round(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::DOUBLE
          / count(*)::DOUBLE, 12) AS error_share
      FROM f GROUP BY 1 ORDER BY user_id"""))

  // ---------- q282: SPRT error-rate monitor -----------------------------

  /** Wald's sequential probability ratio test on the daily error rate —
    * the release-health monitor that is allowed to STOP EARLY: unlike
    * q205's fixed-horizon CI, the SPRT walks a cumulative
    * log-likelihood ratio (H₀: p = 0.18 vs H₁: p = 0.22, α = β = 0.05)
    * and declares the moment the walk crosses ln((1−β)/α) (reject H₀ —
    * error rate has regressed) or ln(β/(1−α)) (accept H₀), with exact
    * error-rate guarantees at any peeking cadence — the fix for the
    * peeking problem that invalidates naive daily re-testing of a CI.
    * Determinism: both per-observation log-LR increments are constants
    * computed by one ln() each and pinned to integer nano-units; a
    * day's increment is then x·A + (n−x)·B exact int64, the cumulative
    * walk is an integer prefix sum over the ≤|days| daily table, and
    * the boundary compare is integer-vs-integer. Shape: one
    * corpus-sized conditional aggregate into |days| rows; the window
    * runs on the tiny daily table.
    */
  private val q282 = QueryDef(
    "q282_sprt_monitor",
    (s, dir) => {
      val a = round(log(lit(0.22) / lit(0.18)) * lit(1e9)).cast("long")
      val b = round(log(lit(0.78) / lit(0.82)) * lit(1e9)).cast("long")
      val up = round(log(lit(0.95) / lit(0.05)) * lit(1e9)).cast("long")
      val lo = round(log(lit(0.05) / lit(0.95)) * lit(1e9)).cast("long")
      val wd = Window.orderBy(col("day"))
      ev(s, dir)
        .select(col("ts").cast("date").as("day"),
          when(col("event_type") === "error", 1L).otherwise(0L).as("e"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n"), sum(col("e")).as("x"))
        .withColumn("llr_nano",
          sum(col("x") * a + (col("n") - col("x")) * b).over(wd))
        .select(col("day"), col("n"), col("x"),
          round(col("llr_nano").cast("double") / lit(1e9), 12).as("llr"),
          when(col("llr_nano") >= up, "reject_h0")
            .when(col("llr_nano") <= lo, "accept_h0")
            .otherwise("continue").as("decision"))
        .orderBy("day")
    },
    Some("""WITH daily AS (SELECT ts::DATE AS day, count(*)::BIGINT AS n,
          sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT
            AS x
        FROM events GROUP BY 1),
      c AS (SELECT round(ln(0.22 / 0.18) * 1e9)::BIGINT AS a,
          round(ln(0.78 / 0.82) * 1e9)::BIGINT AS b,
          round(ln(0.95 / 0.05) * 1e9)::BIGINT AS up,
          round(ln(0.05 / 0.95) * 1e9)::BIGINT AS lo),
      walk AS (SELECT day, n, x,
          sum(x * a + (n - x) * b) OVER (ORDER BY day)::BIGINT
            AS llr_nano, up, lo
        FROM daily, c)
      SELECT day, n, x,
        round(llr_nano::DOUBLE / 1e9, 12) AS llr,
        CASE WHEN llr_nano >= up THEN 'reject_h0'
          WHEN llr_nano <= lo THEN 'accept_h0'
          ELSE 'continue' END AS decision
      FROM walk ORDER BY day"""))

  // ---------- q283: Markov entropy rate ---------------------------------

  /** How predictable is user behavior? The entropy rate of q87's
    * empirical Markov chain — H = −Σᵢ πᵢ Σⱼ Pᵢⱼ ln Pᵢⱼ, with πᵢ the
    * empirical share of transitions leaving state i — plus each
    * state's conditional entropy H(next|cur = i): the single number
    * that says whether a next-action model can possibly beat chance,
    * and which states drive the uncertainty. Determinism: ln runs once
    * per (cur, nxt) CELL of the |types|² transition table (never per
    * event) and pins to nano-units; every weighted sum after that is
    * exact integer arithmetic (DECIMAL-lifted products), divided once
    * per output row. Shape: the corpus collapses through q87's lead
    * window + |types|²-row aggregate; everything downstream is
    * constant-size.
    */
  private val q283 = QueryDef(
    "q283_entropy_rate",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val trans = ev(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("cur"))
        .withColumn("nxt", lead(col("cur"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("cur"), col("nxt"))
        .agg(count(lit(1)).as("n"))
      val perCur = trans.groupBy(col("cur"))
        .agg(sum(col("n")).as("ncur"),
          sum((col("n") * round(log(col("n").cast("double"))
              * lit(1e9)).cast("long")).cast(DecimalType(38, 0)))
            .as("s_nlogn"))
        .select(col("cur"), col("ncur"),
          // H_i = ln(n_i·) − Σ n_ij ln n_ij / n_i·  (exact ints + 2 ln)
          (round(log(col("ncur").cast("double")) * lit(1e9))
            .cast("long").cast("double") / lit(1e9)
            - col("s_nlogn").cast("double")
              / col("ncur").cast("double") / lit(1e9)).as("h_cond"))
      val total = perCur.agg(sum(col("ncur")).as("ntot"),
        sum((col("ncur") * round(col("h_cond") * lit(1e9)).cast("long"))
          .cast(DecimalType(38, 0))).as("s_wh"))
        .select(col("ntot"),
          (col("s_wh").cast("double") / col("ntot").cast("double")
            / lit(1e9)).as("h_rate"))
      perCur.crossJoin(broadcast(total))
        .select(col("cur"), col("ncur").as("n_out"),
          round(col("ncur").cast("double") / col("ntot").cast("double"),
            12).as("pi"),
          round(col("h_cond"), 12).as("h_cond"),
          round(col("h_rate"), 12).as("h_rate"))
        .orderBy("cur")
    },
    Some("""WITH seq AS (SELECT user_id, event_type AS cur,
          lead(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS nxt
        FROM events),
      t AS (SELECT cur, nxt, count(*)::BIGINT AS n FROM seq
        WHERE nxt IS NOT NULL GROUP BY 1, 2),
      pc AS (SELECT cur, sum(n)::BIGINT AS ncur,
          sum(n::HUGEINT * round(ln(n::DOUBLE) * 1e9)::BIGINT) AS s_nlogn
        FROM t GROUP BY 1),
      hc AS (SELECT cur, ncur,
          round(ln(ncur::DOUBLE) * 1e9)::BIGINT::DOUBLE / 1e9
            - s_nlogn::DOUBLE / ncur::DOUBLE / 1e9 AS h_cond
        FROM pc),
      tot AS (SELECT sum(ncur)::BIGINT AS ntot,
          sum(ncur::HUGEINT * round(h_cond * 1e9)::BIGINT)::DOUBLE
            / sum(ncur)::DOUBLE / 1e9 AS h_rate
        FROM hc)
      SELECT cur, ncur AS n_out,
        round(ncur::DOUBLE / ntot::DOUBLE, 12) AS pi,
        round(h_cond, 12) AS h_cond, round(h_rate, 12) AS h_rate
      FROM hc, tot ORDER BY cur"""))

  // ---------- q286: finite-horizon absorption probabilities ------------

  /** "From each state, how likely is a user to PURCHASE within k steps
    * before hitting an ERROR?" — the absorbing-chain read of q87's
    * transition matrix that turns next-step probabilities into an
    * actionable funnel metric (which states are k steps from revenue,
    * which are error traps). fₖ(s) is the exact k-step recursion
    * f₀ = [s=purchase], fₖ₊₁(s) = [s=purchase] + [s transient]·Σₜ
    * P(s→t)·fₖ(t), unrolled four fixed iterations — a deterministic,
    * SQL-expressible quantity (no convergence loop). Exactness: the
    * transition probabilities pin once to nano-units, each iteration's
    * matrix–vector product is an exact integer dot product
    * (DECIMAL-lifted: pₙₐₙₒ·fₙₐₙₒ ≈ 1e18 per term) renormalized by the
    * SAME integer-rounding division on both engines, so all four
    * vectors are bit-identical. Shape: the corpus collapses through
    * q87's window+aggregate into a |types|²-row matrix; the four
    * chained joins run on constant-size tables (broadcast).
    */
  private val q286 = QueryDef(
    "q286_absorption_horizon",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val trans = ev(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("cur"))
        .withColumn("nxt", lead(col("cur"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("cur"), col("nxt"))
        .agg(count(lit(1)).as("n"))
      // frozen: the 4 power steps below each join against the matrix —
      // without the persist the transitions window+aggregate (the
      // query's dominant cost) re-runs once per step
      val matrix = graft.ops.PlanCache.freeze(trans
        .withColumn("ncur", sum(col("n"))
          .over(Window.partitionBy(col("cur"))))
        .select(col("cur"), col("nxt"),
          round(col("n").cast("double") / col("ncur").cast("double")
            * lit(1e9)).cast("long").as("p_nano")))
      val states = graft.ops.PlanCache.freeze(
        matrix.select(col("cur").as("state")).distinct())
      // f0: 1e9 at the purchase state, 0 elsewhere
      val f0 = states.select(col("state"),
        when(col("state") === "purchase", lit(1000000000L)).otherwise(0L)
          .as("f"))
      def step(fk: DataFrame): DataFrame =
        matrix.join(broadcast(fk), col("nxt") === col("state"))
          .groupBy(col("cur"))
          .agg(expr("""(CAST(sum(CAST(p_nano AS DECIMAL(38,0))
              * CAST(f AS DECIMAL(38,0))) + 500000000
              AS DECIMAL(38,0))) div 1000000000""").as("acc"))
          .join(broadcast(states), col("cur") === col("state"), "right")
          .select(col("state"),
            when(col("state") === "purchase", lit(1000000000L))
              .when(col("state") === "error", lit(0L))
              .otherwise(coalesce(col("acc"), lit(0L))).as("f"))
      val f1 = step(f0); val f2 = step(f1)
      val f3 = step(f2); val f4 = step(f3)
      def named(df: DataFrame, c: String): DataFrame =
        df.select(col("state"),
          round(col("f").cast("double") / lit(1e9), 9).as(c))
      named(f1, "p_hit_1")
        .join(named(f2, "p_hit_2"), "state")
        .join(named(f3, "p_hit_3"), "state")
        .join(named(f4, "p_hit_4"), "state")
        .orderBy("state")
    },
    Some("""WITH seq AS (SELECT user_id, event_type AS cur,
          lead(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS nxt
        FROM events),
      t AS (SELECT cur, nxt, count(*)::BIGINT AS n FROM seq
        WHERE nxt IS NOT NULL GROUP BY 1, 2),
      m AS (SELECT cur, nxt,
          round(n::DOUBLE / (sum(n) OVER (PARTITION BY cur))::DOUBLE
            * 1e9)::BIGINT AS p_nano
        FROM t),
      states AS (SELECT DISTINCT cur AS state FROM m),
      f0 AS (SELECT state, CASE WHEN state = 'purchase'
          THEN 1000000000 ELSE 0 END::BIGINT AS f FROM states),
      f1 AS (SELECT s.state, CASE WHEN s.state = 'purchase'
            THEN 1000000000 WHEN s.state = 'error' THEN 0
            ELSE coalesce(a.acc, 0) END::BIGINT AS f
        FROM states s LEFT JOIN (SELECT cur,
            (sum(p_nano::HUGEINT * f::HUGEINT) + 500000000)
              // 1000000000 AS acc
          FROM m JOIN f0 ON nxt = state GROUP BY cur) a
          ON a.cur = s.state),
      f2 AS (SELECT s.state, CASE WHEN s.state = 'purchase'
            THEN 1000000000 WHEN s.state = 'error' THEN 0
            ELSE coalesce(a.acc, 0) END::BIGINT AS f
        FROM states s LEFT JOIN (SELECT cur,
            (sum(p_nano::HUGEINT * f::HUGEINT) + 500000000)
              // 1000000000 AS acc
          FROM m JOIN f1 ON nxt = state GROUP BY cur) a
          ON a.cur = s.state),
      f3 AS (SELECT s.state, CASE WHEN s.state = 'purchase'
            THEN 1000000000 WHEN s.state = 'error' THEN 0
            ELSE coalesce(a.acc, 0) END::BIGINT AS f
        FROM states s LEFT JOIN (SELECT cur,
            (sum(p_nano::HUGEINT * f::HUGEINT) + 500000000)
              // 1000000000 AS acc
          FROM m JOIN f2 ON nxt = state GROUP BY cur) a
          ON a.cur = s.state),
      f4 AS (SELECT s.state, CASE WHEN s.state = 'purchase'
            THEN 1000000000 WHEN s.state = 'error' THEN 0
            ELSE coalesce(a.acc, 0) END::BIGINT AS f
        FROM states s LEFT JOIN (SELECT cur,
            (sum(p_nano::HUGEINT * f::HUGEINT) + 500000000)
              // 1000000000 AS acc
          FROM m JOIN f3 ON nxt = state GROUP BY cur) a
          ON a.cur = s.state)
      SELECT f1.state, round(f1.f::DOUBLE / 1e9, 9) AS p_hit_1,
        round(f2.f::DOUBLE / 1e9, 9) AS p_hit_2,
        round(f3.f::DOUBLE / 1e9, 9) AS p_hit_3,
        round(f4.f::DOUBLE / 1e9, 9) AS p_hit_4
      FROM f1 JOIN f2 USING (state) JOIN f3 USING (state)
        JOIN f4 USING (state)
      ORDER BY state"""))

  // ---------- q290: Hill tail-index of per-user spend -------------------

  /** HOW heavy is the whale tail? q162's Pareto table says the top 20 %
    * hold X % of revenue; the Hill estimator gives the tail EXPONENT
    * α̂ = 1 + k/Σᵢ ln(xᵢ/x₍ₖ₊₁₎) over the k largest per-user
    * spends (k = 50, degrading to n/2 on tiny fixtures)
    * — the number that says whether mean spend even CONVERGES (α ≤ 2:
    * plan for single users moving aggregate metrics). Scale shape: the
    * corpus folds into per-user integer-micro spend (one shuffle), the
    * k+1 head comes from a TakeOrdered limit (per-shard heads, no
    * global sort), and everything after runs on 51 rows. Exactness:
    * spends are exact int64 micro; each ln(xᵢ/x₍ₖ₊₁₎) is one libm call
    * on an identical double ratio, pinned to nano; the Σ is an exact
    * integer sum; α̂ is one guarded division. Ties at the boundary are
    * broken by user_id — the same total order on both engines.
    */
  private val q290 = QueryDef(
    "q290_hill_tail_index",
    (s, dir) => {
      val wTop = Window.orderBy(col("spend_micro").desc, col("user_id"))
      val spend = ev(s, dir)
        .where(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(sum(expr("cast(round(value * 1e6) AS BIGINT)"))
          .as("spend_micro"))
      // adaptive k: 50 at corpus scale, n/2 on tiny fixtures, so the
      // estimator is defined at any SF
      val kk = spend.agg(least(lit(50L),
        (count(lit(1)) / 2).cast("long")).as("kv"))
      val top = spend
        .orderBy(col("spend_micro").desc, col("user_id"))
        .limit(51)
        // 51-row table from here on: the single-partition window is
        // k-sized by construction, never corpus-sized
        .withColumn("rn", row_number().over(wTop))
        .crossJoin(broadcast(kk))
      val xk = top.where(col("rn") === col("kv") + 1)
        .select(col("spend_micro").as("xk"))
      top.where(col("rn") <= col("kv"))
        .crossJoin(broadcast(xk))
        .select(round(log(col("spend_micro").cast("double")
          / col("xk").cast("double")) * lit(1e9)).cast("long")
          .as("t_nano"), col("xk"))
        .groupBy(col("xk"))
        .agg(count(lit(1)).as("k"), sum(col("t_nano")).as("sum_log_nano"))
        .select(col("k"), col("xk").as("xk_micro"), col("sum_log_nano"),
          round(lit(1.0) + col("k").cast("double") * lit(1e9)
            / expr("nullif(CAST(sum_log_nano AS DOUBLE), 0.0)"), 12)
            .as("alpha"))
    },
    Some("""WITH spend AS (SELECT user_id,
          sum(round(value * 1e6)::BIGINT)::BIGINT AS spend_micro
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      kk AS (SELECT least(50, count(*) // 2)::BIGINT AS kv FROM spend),
      ranked AS (SELECT spend_micro, row_number() OVER
          (ORDER BY spend_micro DESC, user_id) AS rn FROM spend),
      xk AS (SELECT spend_micro AS xk FROM ranked, kk
        WHERE rn = kv + 1),
      t AS (SELECT round(ln(spend_micro::DOUBLE / xk::DOUBLE)
            * 1e9)::BIGINT AS t_nano, xk
        FROM ranked, xk, kk WHERE rn <= kv)
      SELECT count(*)::BIGINT AS k, xk AS xk_micro,
        sum(t_nano)::BIGINT AS sum_log_nano,
        round(1.0 + count(*)::DOUBLE * 1e9
          / nullif(sum(t_nano)::DOUBLE, 0.0), 12) AS alpha
      FROM t GROUP BY xk"""))

  // ---------- q300: DFT spectral periodicity --------------------------

  /** Single-frequency DFT power scan over the daily event-count series
    * — the spectral twin of q142's autocorrelation and q143's fixed
    * weekly seasonality: instead of assuming period 7, it MEASURES
    * which candidate period (2–10 days) carries the most energy, the
    * way a periodicity detector screens telemetry before fitting a
    * seasonal model. Power(p) = Re² + Im² of Σ_d ĉ_d·e^{−2πi·d/p}
    * over mean-centered daily counts ĉ. Shape: the only corpus-sized
    * work is the per-day count aggregate; the series is
    * calendar-bounded (|days| rows at ANY corpus size), the candidate
    * spine is 9 rows, and their join is a bounded broadcast. The mean
    * pins to integer micro-units and every cos/sin term to micro-units
    * before the sum, so Re/Im/power are bit-stable; cos and sin get
    * bit-identical arguments on both engines (exact int64 day and
    * period into one libm call).
    */
  private val q300 = QueryDef(
    "q300_spectral_period",
    (s, dir) => {
      val daily = ev(s, dir)
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("c"))
      val stats = daily.agg(min(col("day")).as("d0"),
        count(lit(1)).as("n_days"),
        expr("CAST(round(sum(c) * 1e6 / count(1)) AS BIGINT)")
          .as("mean_micro"))
      val periods = s.range(2, 11).select(col("id").as("period"))
      daily.crossJoin(broadcast(stats))
        .crossJoin(broadcast(periods))
        .select(col("period"), col("n_days"),
          expr("""CAST(round((CAST(c AS DOUBLE) - mean_micro / 1e6)
            * cos(2.0 * pi() * CAST(day - d0 AS DOUBLE) / period) * 1e6)
            AS BIGINT)""").as("re_micro"),
          expr("""CAST(round((CAST(c AS DOUBLE) - mean_micro / 1e6)
            * sin(2.0 * pi() * CAST(day - d0 AS DOUBLE) / period) * 1e6)
            AS BIGINT)""").as("im_micro"))
        .groupBy(col("period"))
        .agg(first(col("n_days")).as("n_days"),
          sum(col("re_micro")).as("re_micro"),
          sum(col("im_micro")).as("im_micro"))
        .select(col("period"), col("n_days"),
          round(pow(col("re_micro").cast("double") / 1e6, 2)
            + pow(col("im_micro").cast("double") / 1e6, 2), 6)
            .as("power"))
        .orderBy(col("period"))
    },
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          count(*)::BIGINT AS c
        FROM events GROUP BY 1),
      st AS (SELECT min(day) AS d0, count(*)::BIGINT AS n_days,
          round(sum(c)::BIGINT * 1e6 / count(*))::BIGINT AS mean_micro
        FROM daily),
      periods AS (SELECT unnest(range(2, 11))::BIGINT AS period),
      terms AS (SELECT period, n_days,
          round((c::DOUBLE - mean_micro / 1e6)
            * cos(2.0 * pi() * (day - d0)::DOUBLE / period) * 1e6)::BIGINT
            AS re_micro,
          round((c::DOUBLE - mean_micro / 1e6)
            * sin(2.0 * pi() * (day - d0)::DOUBLE / period) * 1e6)::BIGINT
            AS im_micro
        FROM daily, st, periods)
      SELECT period, any_value(n_days) AS n_days,
        round(pow(sum(re_micro)::DOUBLE / 1e6, 2)
          + pow(sum(im_micro)::DOUBLE / 1e6, 2), 6) AS power
      FROM terms GROUP BY period ORDER BY period"""))

  // ---------- q308: Gumbel block maxima -------------------------------

  /** Extreme-value analysis of daily event VALUE totals by the block-
    * maxima method: weekly maxima fit to a Gumbel distribution via the
    * method of moments (β = s·√6/π, μ = m − γ·β, γ Euler–Mascheroni),
    * then return levels x_T = μ − β·ln(−ln(1 − 1/T)) — "the biggest
    * day we should expect every T weeks" — the capacity-planning twin
    * of q290's Hill tail index (which fits the tail SHAPE; this fits
    * the block EXTREMES). Shape: the only corpus-sized pass is the
    * per-day total (exact DECIMAL cents); days and weeks are
    * calendar-bounded at any corpus size, maxima land in hecto-unit
    * int64 so the two block moments are exact integer sums, and the
    * fit plus return levels are one deterministic expression over a
    * 1-row aggregate.
    */
  private val q308 = QueryDef(
    "q308_gumbel_extremes",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val daily = ev(s, dir)
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"), col("value"))
        .groupBy(col("day"))
        .agg(sum(col("value").cast(DecimalType(18, 4))).as("tot"))
      val weekly = daily
        .groupBy(expr("day div 7").as("week"))
        .agg(expr("CAST(round(max(tot) * 100.0) AS BIGINT) div 100")
          .as("m"))
      weekly.agg(count(lit(1)).as("n_blocks"), sum(col("m")).as("sm"),
          sum(col("m") * col("m")).as("smm"))
        .select(col("n_blocks"),
          (col("sm").cast("double") / col("n_blocks")).as("mean_m"),
          (sqrt((col("n_blocks") * col("smm") - col("sm") * col("sm"))
            .cast("double")) / col("n_blocks")).as("sd_m"),
          col("n_blocks").as("nb"))
        .select(col("n_blocks"),
          round(col("mean_m"), 2).as("block_mean"),
          round(col("sd_m") * 0.7796968012336093, 4).as("beta"),
          round(col("mean_m")
            - lit(0.5772156649015329) * col("sd_m")
              * 0.7796968012336093, 4)
            .as("mu"))
        .select(col("n_blocks"), col("block_mean"), col("beta"),
          col("mu"),
          round(col("mu") - col("beta")
            * math.log(-math.log(0.5)), 4).as("rl_2"),
          round(col("mu") - col("beta")
            * math.log(-math.log(0.9)), 4).as("rl_10"))
    },
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          sum(CAST(value AS DECIMAL(18,4))) AS tot
        FROM events GROUP BY 1),
      weekly AS (SELECT day // 7 AS week,
          round(max(tot) * 100.0)::BIGINT // 100 AS m
        FROM daily GROUP BY 1),
      st AS (SELECT count(*)::BIGINT AS n_blocks, sum(m)::BIGINT AS sm,
          sum(m * m)::BIGINT AS smm FROM weekly),
      fit AS (SELECT n_blocks, sm::DOUBLE / n_blocks AS mean_m,
          sqrt((n_blocks * smm - sm * sm)::DOUBLE) / n_blocks AS sd_m
        FROM st),
      p AS (SELECT n_blocks, round(mean_m, 2) AS block_mean,
          round(sd_m * 0.7796968012336093, 4) AS beta,
          round(mean_m
            - 0.5772156649015329 * sd_m * 0.7796968012336093, 4) AS mu
        FROM fit)
      SELECT n_blocks, block_mean, beta, mu,
        round(mu - beta * ln(-ln(0.5)), 4) AS rl_2,
        round(mu - beta * ln(-ln(0.9)), 4) AS rl_10
      FROM p"""))

  // ---------- q312: Bayesian A/B posterior ----------------------------

  /** Bayesian A/B read-out on a binary conversion metric — the
    * decision layer beside q163's frequentist t-test and q282's SPRT:
    * users split 50/50 by the portable hash coin, conversion = "the
    * user's total purchase value cleared 600", and the emitted
    * quantity is P(p_B > p_A | data) under independent Beta(1,1)
    * priors via the normal approximation to the posterior difference
    * — Φ evaluated with the shared A&S polynomial (Portable
    * .normCdfUpper), the project's engine-portable Φ contract. Shape:
    * one events pass into a per-user aggregate (the only corpus-sized
    * shuffle, keyed on user), then a 2-row arm aggregate and pure
    * scalar arithmetic; posterior means/variances are exact-ratio
    * doubles from int64 counts.
    */
  private val q312 = QueryDef(
    "q312_bayes_ab",
    (s, dir) => {
      val perUser = ev(s, dir)
        .where(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(sum(col("value").cast(DecimalType(18, 4))).cast("double")
          .as("purch"))
        .select(
          when(expr(graft.ops.Portable.h32Spark(
            "concat('ab_', user_id)")) % 2 === 0, "A").otherwise("B")
            .as("arm"),
          when(col("purch") > 600.0, 1L).otherwise(0L).as("conv"))
      val arms = perUser.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
      val wide = arms.agg(
        sum(when(col("arm") === "A", col("n")).otherwise(0L)).as("na"),
        sum(when(col("arm") === "A", col("c")).otherwise(0L)).as("ca"),
        sum(when(col("arm") === "B", col("n")).otherwise(0L)).as("nb"),
        sum(when(col("arm") === "B", col("c")).otherwise(0L)).as("cb"))
      // Beta(1,1) posterior moments; z = (mB - mA)/sqrt(vA + vB)
      val z = """((CAST(cb AS DOUBLE) + 1.0) / (CAST(nb AS DOUBLE) + 2.0)
          - (CAST(ca AS DOUBLE) + 1.0) / (CAST(na AS DOUBLE) + 2.0))
        / sqrt((CAST(ca AS DOUBLE) + 1.0) * (CAST(na - ca AS DOUBLE) + 1.0)
            / ((CAST(na AS DOUBLE) + 2.0) * (CAST(na AS DOUBLE) + 2.0)
              * (CAST(na AS DOUBLE) + 3.0))
          + (CAST(cb AS DOUBLE) + 1.0) * (CAST(nb - cb AS DOUBLE) + 1.0)
            / ((CAST(nb AS DOUBLE) + 2.0) * (CAST(nb AS DOUBLE) + 2.0)
              * (CAST(nb AS DOUBLE) + 3.0)))"""
      val phiUpperAbs = graft.ops.Portable.normCdfUpper(s"abs($z)")
      wide.select(col("na"), col("ca"), col("nb"), col("cb"),
        round(expr("(CAST(ca AS DOUBLE) + 1.0) / (CAST(na AS DOUBLE) + 2.0)"), 9).as("post_mean_a"),
        round(expr("(CAST(cb AS DOUBLE) + 1.0) / (CAST(nb AS DOUBLE) + 2.0)"), 9).as("post_mean_b"),
        round(expr(s"""CASE WHEN $z >= 0 THEN 1.0 - $phiUpperAbs
          ELSE $phiUpperAbs END"""), 9).as("prob_b_beats_a"))
    },
    Some {
      val z = """((CAST(cb AS DOUBLE) + 1.0) / (CAST(nb AS DOUBLE) + 2.0)
          - (CAST(ca AS DOUBLE) + 1.0) / (CAST(na AS DOUBLE) + 2.0))
        / sqrt((CAST(ca AS DOUBLE) + 1.0) * (CAST(na - ca AS DOUBLE) + 1.0)
            / ((CAST(na AS DOUBLE) + 2.0) * (CAST(na AS DOUBLE) + 2.0)
              * (CAST(na AS DOUBLE) + 3.0))
          + (CAST(cb AS DOUBLE) + 1.0) * (CAST(nb - cb AS DOUBLE) + 1.0)
            / ((CAST(nb AS DOUBLE) + 2.0) * (CAST(nb AS DOUBLE) + 2.0)
              * (CAST(nb AS DOUBLE) + 3.0)))"""
      val phiUpperAbs = graft.ops.Portable.normCdfUpper(s"abs($z)")
      s"""WITH pu AS (SELECT
          CASE WHEN ${graft.ops.Portable.h32Duck("'ab_' || user_id")}
            % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
          CASE WHEN sum(CAST(value AS DECIMAL(18,4)))::DOUBLE > 600.0
            THEN 1 ELSE 0 END AS conv
        FROM events WHERE event_type = 'purchase' GROUP BY user_id),
      wide AS (SELECT
          sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)::BIGINT AS na,
          sum(CASE WHEN arm = 'A' THEN conv ELSE 0 END)::BIGINT AS ca,
          sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)::BIGINT AS nb,
          sum(CASE WHEN arm = 'B' THEN conv ELSE 0 END)::BIGINT AS cb
        FROM pu)
      SELECT na, ca, nb, cb,
        round((CAST(ca AS DOUBLE) + 1.0) / (CAST(na AS DOUBLE) + 2.0), 9) AS post_mean_a,
        round((CAST(cb AS DOUBLE) + 1.0) / (CAST(nb AS DOUBLE) + 2.0), 9) AS post_mean_b,
        round(CASE WHEN $z >= 0 THEN 1.0 - $phiUpperAbs
          ELSE $phiUpperAbs END, 9) AS prob_b_beats_a
      FROM wide"""
    })

  // ---------- q322: partial autocorrelation ---------------------------

  /** PACF of the daily event-count series at lags 1–3 via the
    * Durbin–Levinson recursion — the model-order tool q142's plain ACF
    * cannot provide: ACF at lag 2 conflates direct dependence with
    * lag-1 flow-through; the partial coefficient φ_kk isolates the
    * direct effect, and the lag where PACF cuts off IS the AR order a
    * forecaster should fit. φ11 = r1; φ22 = (r2 − r1²)/(1 − r1²);
    * φ33 from one more DL step — all closed-form scalar arithmetic on
    * the three ACF values. Shape: per-day counts (the only
    * corpus-sized pass), mean-centered deviations pinned to milli
    * units, lag products via THREE bounded self-equi-joins on day+k
    * (|days| rows each at any corpus size), one 1-row moment
    * aggregate, then pure expression math. Gap convention (both
    * dialects, deliberately shared): a calendar day with NO events has
    * no row, and coalesce(d_k, 0) treats a lag term across the gap as
    * zero-deviation while n counts only OBSERVED days — on a gappy
    * series this deviates from the textbook ACF over a densified
    * spine (a zero-count day's true deviation is −mean). Event fixture
    * days are dense, and the convention is the one a missing-data ACF
    * ("available-case" products) uses; densify upstream if exact
    * textbook semantics over gaps are needed. Moment products ride
    * DECIMAL(38,0)/HUGEINT (the q333/q352 headroom convention):
    * d ≈ count·10³ can reach ~10⁹ at corpus scale, so Σd² crowds
    * int64.
    */
  private val q322 = QueryDef(
    "q322_pacf",
    (s, dir) => {
      val daily = ev(s, dir)
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("c"))
      val st = daily.agg(
        expr("CAST(round(sum(c) * 1000.0 / count(1)) AS BIGINT)")
          .as("mean_milli"))
      val dev = daily.crossJoin(broadcast(st))
        .select(col("day"), (col("c") * 1000 - col("mean_milli"))
          .as("d"))
      def lagged(k: Int) = dev.select((col("day") - k).as("day"),
        col("d").as(s"d$k"))
      val dDec = col("d").cast("decimal(38,0)")
      val moments = dev
        .join(lagged(1), Seq("day"), "left")
        .join(lagged(2), Seq("day"), "left")
        .join(lagged(3), Seq("day"), "left")
        .agg(sum(dDec * col("d")).as("s0"),
          sum(dDec * coalesce(col("d1"), lit(0L))).as("s1"),
          sum(dDec * coalesce(col("d2"), lit(0L))).as("s2"),
          sum(dDec * coalesce(col("d3"), lit(0L))).as("s3"))
      val rs = moments.select(
        (col("s1").cast("double") / col("s0")).as("r1"),
        (col("s2").cast("double") / col("s0")).as("r2"),
        (col("s3").cast("double") / col("s0")).as("r3"))
      rs.withColumn("p2", (col("r2") - col("r1") * col("r1"))
          / (lit(1.0) - col("r1") * col("r1")))
        .withColumn("p21", col("r1") - col("p2") * col("r1"))
        .select(round(col("r1"), 9).as("r1"),
          round(col("r2"), 9).as("r2"),
          round(col("r3"), 9).as("r3"),
          round(col("r1"), 9).as("pacf1"),
          round(col("p2"), 9).as("pacf2"),
          round((col("r3") - col("p21") * col("r2")
            - col("p2") * col("r1"))
            / (lit(1.0) - col("p21") * col("r1")
              - col("p2") * col("r2")), 9).as("pacf3"))
    },
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          count(*)::BIGINT AS c
        FROM events GROUP BY 1),
      st AS (SELECT round(sum(c)::BIGINT * 1000.0 / count(*))::BIGINT
          AS mean_milli FROM daily),
      dev AS (SELECT day, c * 1000 - mean_milli AS d FROM daily, st),
      mom AS (SELECT sum(a.d::HUGEINT * a.d) AS s0,
          sum(a.d::HUGEINT * coalesce(l1.d, 0)) AS s1,
          sum(a.d::HUGEINT * coalesce(l2.d, 0)) AS s2,
          sum(a.d::HUGEINT * coalesce(l3.d, 0)) AS s3
        FROM dev a
        LEFT JOIN dev l1 ON l1.day = a.day + 1
        LEFT JOIN dev l2 ON l2.day = a.day + 2
        LEFT JOIN dev l3 ON l3.day = a.day + 3),
      rs AS (SELECT s1::DOUBLE / s0 AS r1, s2::DOUBLE / s0 AS r2,
          s3::DOUBLE / s0 AS r3 FROM mom),
      p AS (SELECT r1, r2, r3, r1 AS p1,
          (r2 - r1 * r1) / (1.0 - r1 * r1) AS p2
        FROM rs),
      p2 AS (SELECT *, r1 - p2 * r1 AS p21 FROM p)
      SELECT round(r1, 9) AS r1, round(r2, 9) AS r2, round(r3, 9) AS r3,
        round(p1, 9) AS pacf1, round(p2, 9) AS pacf2,
        round((r3 - p21 * r2 - p2 * r1)
          / (1.0 - p21 * r1 - p2 * r2), 9) AS pacf3
      FROM p2"""))

  // ---------- q324: compaction planner --------------------------------

  /** Small-files compaction planner — the table-maintenance pass every
    * lakehouse runs: daily event partitions (sized here as rows × a
    * 64-byte estimated width) are packed in day order into target-
    * sized output files by the cumulative-fill rule (a partition
    * starts a new bin when the running total crosses the target), and
    * the plan is emitted as bin → (days, bytes, fill ratio) so the
    * rewrite job is pure mechanical IO. Day-ordered packing preserves
    * time-range pruning in the compacted layout — the reason not to
    * bin-pack optimally. Shape: the per-day size table is the only
    * corpus-sized pass; the packing is a cumulative window over the
    * calendar-bounded day table (q159 class) and exact integer
    * arithmetic.
    */
  private val q324 = QueryDef(
    "q324_compaction_planner",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val target = 131072L // 128 KiB target bins at fixture scale
      val daily = ev(s, dir)
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"))
        .groupBy(col("day"))
        .agg((count(lit(1)) * 64L).as("bytes"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, -1)
      daily
        .withColumn("cum_before", coalesce(sum(col("bytes")).over(w),
          lit(0L)))
        .withColumn("bin", expr(s"cum_before div ${target}L"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_partitions"),
          min(col("day")).as("first_day"), max(col("day")).as("last_day"),
          sum(col("bytes")).as("total_bytes"))
        .select(col("bin"), col("n_partitions"), col("first_day"),
          col("last_day"), col("total_bytes"),
          round(col("total_bytes").cast("double") / target, 6)
            .as("fill_ratio"))
        .orderBy(col("bin"))
    },
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          count(*)::BIGINT * 64 AS bytes
        FROM events GROUP BY 1),
      packed AS (SELECT day, bytes,
          coalesce(sum(bytes) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            // 131072 AS bin
        FROM daily)
      SELECT bin::BIGINT AS bin, count(*)::BIGINT AS n_partitions,
        min(day) AS first_day, max(day) AS last_day,
        sum(bytes)::BIGINT AS total_bytes,
        round(sum(bytes)::DOUBLE / 131072, 6) AS fill_ratio
      FROM packed GROUP BY bin ORDER BY bin"""))

  // ---------- q329: negative-binomial overdispersion fit ---------------

  /** Overdispersion diagnosis of per-user purchase counts: a Poisson
    * user model (the default assumption behind every "events ~ rate ×
    * time" capacity estimate) is checked against the moment-fitted
    * negative binomial — r = m²/(v−m), p₀ = (r/(r+m))^r — and the
    * verdict is read off the zero class: if the OBSERVED share of
    * never-purchasing users matches NB and not Poisson e^{−m}, per-
    * user heterogeneity is real and downstream models need the NB (or
    * a mixed) rate. Complements q227 (Fano over TIME windows) with
    * the PER-USER dispersion cut. Shape: the user spine LEFT-joins
    * purchase counts so zeros COUNT (the whole point); one bounded
    * moment aggregate (counts int64, squares DECIMAL-lifted); the fit
    * is scalar math with one pow.
    */
  private val q329 = QueryDef(
    "q329_overdispersion_fit",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val users = ev(s, dir).select(col("user_id")).distinct()
      val pc = ev(s, dir).where(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      val counts = users.join(pc, Seq("user_id"), "left")
        .select(coalesce(col("c"), lit(0L)).as("c"))
      counts.agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
          sum((col("c") * col("c")).cast(DecimalType(38, 0)))
            .cast("double").as("scc"),
          sum(when(col("c") === 0, 1L).otherwise(0L)).as("n_zero"))
        .select(col("n"), col("n_zero"),
          (col("sc").cast("double") / col("n")).as("m"),
          ((col("scc") - col("sc").cast("double") * col("sc")
            / col("n")) / (col("n") - 1)).as("v"))
        .select(col("n"), col("n_zero"),
          round(col("m"), 9).as("mean_c"),
          round(col("v"), 9).as("var_c"),
          round(col("v") / col("m"), 9).as("dispersion"),
          round(col("n_zero").cast("double") / col("n"), 9).as("p0_obs"),
          round(exp(-col("m")), 9).as("p0_poisson"),
          round(when(col("v") <= col("m"), lit(null))
            .otherwise(pow(
              (col("m") * col("m") / (col("v") - col("m")))
                / (col("m") * col("m") / (col("v") - col("m"))
                  + col("m")),
              col("m") * col("m") / (col("v") - col("m")))), 9)
            .as("p0_negbin"))
    },
    Some("""WITH users AS (SELECT DISTINCT user_id FROM events),
      pc AS (SELECT user_id, count(*)::BIGINT AS c FROM events
        WHERE event_type = 'purchase' GROUP BY 1),
      counts AS (SELECT coalesce(c, 0) AS c FROM users
        LEFT JOIN pc USING (user_id)),
      mom AS (SELECT count(*)::BIGINT AS n, sum(c)::BIGINT AS sc,
          sum(c::HUGEINT * c)::DOUBLE AS scc,
          sum(CASE WHEN c = 0 THEN 1 ELSE 0 END)::BIGINT AS n_zero
        FROM counts),
      mv AS (SELECT n, n_zero, sc::DOUBLE / n AS m,
          (scc - sc::DOUBLE * sc / n) / (n - 1) AS v
        FROM mom)
      SELECT n, n_zero, round(m, 9) AS mean_c, round(v, 9) AS var_c,
        round(v / m, 9) AS dispersion,
        round(n_zero::DOUBLE / n, 9) AS p0_obs,
        round(exp(-m), 9) AS p0_poisson,
        round(CASE WHEN v <= m THEN NULL
          ELSE pow((m * m / (v - m)) / (m * m / (v - m) + m),
            m * m / (v - m)) END, 9) AS p0_negbin
      FROM mv"""))

  // ---------- q331: experiment power / MDE calculator ------------------

  /** Sample-size calculator grounded in the corpus's own base rate —
    * the pre-registration step before any q163/q282/q312 test: for
    * minimum detectable effects of 1/2/5/10 percentage points on the
    * purchase-conversion rate, the required users per arm at 80 %
    * power / 5 % two-sided α, n = 2(z_{0.975}+z_{0.8})²·p(1−p)/δ²,
    * and whether the CURRENT user population could even staff the two
    * arms — the feasibility bit that kills underpowered tests before
    * they run. Shape: one per-user pass for the base rate (the only
    * corpus-sized work), a 4-row MDE spine, scalar math; z constants
    * are shared literals.
    */
  private val q331 = QueryDef(
    "q331_power_mde",
    (s, dir) => {
      val base = ev(s, dir)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("conv"))
        .agg(count(lit(1)).as("n_users"), sum(col("conv")).as("n_conv"))
      val mdes = s.createDataFrame(Seq(Tuple1(1L), Tuple1(2L),
        Tuple1(5L), Tuple1(10L))).toDF("mde_pp")
      base.crossJoin(broadcast(mdes))
        .select(col("mde_pp"), col("n_users"),
          round(col("n_conv").cast("double") / col("n_users"), 9)
            .as("base_rate"),
          expr("""CAST(ceil(2.0 * 7.849033973655844
            * (CAST(n_conv AS DOUBLE) / n_users)
            * (1.0 - CAST(n_conv AS DOUBLE) / n_users)
            / ((CAST(mde_pp AS DOUBLE) / 100.0)
              * (CAST(mde_pp AS DOUBLE) / 100.0))) AS BIGINT)""")
            .as("n_per_arm"))
        .select(col("mde_pp"), col("base_rate"), col("n_per_arm"),
          col("n_users"),
          (col("n_per_arm") * 2 <= col("n_users")).as("feasible"))
        .orderBy(col("mde_pp"))
    },
    // (z_{0.975} + z_{0.8})² = (1.959963985 + 0.8416212336)² —
    // the shared literal 7.849033973655844 in both dialects
    Some("""WITH base AS (SELECT count(*)::BIGINT AS n_users,
          sum(conv)::BIGINT AS n_conv
        FROM (SELECT user_id,
            max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS conv
          FROM events GROUP BY 1)),
      mdes AS (SELECT unnest([1, 2, 5, 10])::BIGINT AS mde_pp)
      SELECT mde_pp,
        round(n_conv::DOUBLE / n_users, 9) AS base_rate,
        ceil(2.0 * 7.849033973655844
          * (n_conv::DOUBLE / n_users) * (1.0 - n_conv::DOUBLE / n_users)
          / ((mde_pp::DOUBLE / 100.0) * (mde_pp::DOUBLE / 100.0)))
          ::BIGINT AS n_per_arm,
        n_users,
        ceil(2.0 * 7.849033973655844
          * (n_conv::DOUBLE / n_users) * (1.0 - n_conv::DOUBLE / n_users)
          / ((mde_pp::DOUBLE / 100.0) * (mde_pp::DOUBLE / 100.0)))
          ::BIGINT * 2 <= n_users AS feasible
      FROM base CROSS JOIN mdes ORDER BY mde_pp"""))

  // ---------- q334: Mann–Kendall trend test ---------------------------

  /** Mann–Kendall monotonic-trend test on daily event counts — the
    * NONPARAMETRIC growth detector: S = Σ_{i<j} sign(c_j − c_i) needs
    * no linearity or normality assumption (q233's OLS needs both),
    * the tie-corrected variance gives an exact z, and the p-value
    * comes from the shared portable Φ. The question it answers —
    * "is traffic actually trending or just noisy?" — gates every
    * capacity extrapolation. Shape: per-day counts (corpus pass),
    * then a BOUNDED day-pair self-join (≤ |days|²/2 rows at any
    * corpus size — the calendar, not the corpus), a tie-group
    * aggregate, and scalar math. All counts exact int64.
    */
  private val q334 = QueryDef(
    "q334_mann_kendall",
    (s, dir) => {
      val daily = ev(s, dir)
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("c"))
      val a = daily.select(col("day").as("di"), col("c").as("ci"))
      val b = daily.select(col("day").as("dj"), col("c").as("cj"))
      val sStat = a.join(b, col("di") < col("dj"))
        .agg(sum(when(col("cj") > col("ci"), 1L)
          .when(col("cj") < col("ci"), -1L).otherwise(0L)).as("s"))
      val ties = daily.groupBy(col("c")).agg(count(lit(1)).as("t"))
        .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie_corr"))
      val nDays = daily.agg(count(lit(1)).as("n"))
      val z = """CASE WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0)
          / sqrt(var_s)
        WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0) / sqrt(var_s)
        ELSE 0.0 END"""
      val phiUpper = graft.ops.Portable.normCdfUpper(s"abs($z)")
      sStat.crossJoin(broadcast(ties)).crossJoin(broadcast(nDays))
        .select(col("n"), col("s").as("s_stat"),
          expr("""(CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
            - coalesce(tie_corr, 0)) / 18.0""").as("var_s"))
        .select(col("n"), col("s_stat"), round(col("var_s"), 6)
            .as("var_s"),
          round(expr(z), 9).as("z"))
        .select(col("n"), col("s_stat"), col("var_s"), col("z"),
          round(expr("2.0 * " + graft.ops.Portable.normCdfUpper(
            "abs(z)")), 9).as("p_value"),
          expr("""CASE WHEN abs(z) < 1.959963985 THEN 'no_trend'
            WHEN z > 0 THEN 'increasing' ELSE 'decreasing' END""")
            .as("trend"))
    },
    Some {
      val z = """CASE WHEN s > 0 THEN (s::DOUBLE - 1.0) / sqrt(var_s)
        WHEN s < 0 THEN (s::DOUBLE + 1.0) / sqrt(var_s)
        ELSE 0.0 END"""
      s"""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          count(*)::BIGINT AS c
        FROM events GROUP BY 1),
      ss AS (SELECT sum(CASE WHEN b.c > a.c THEN 1
          WHEN b.c < a.c THEN -1 ELSE 0 END)::BIGINT AS s
        FROM daily a JOIN daily b ON a.day < b.day),
      ties AS (SELECT sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tie_corr
        FROM (SELECT c, count(*)::BIGINT AS t FROM daily GROUP BY 1)),
      nd AS (SELECT count(*)::BIGINT AS n FROM daily),
      v AS (SELECT n, s,
          (n::DOUBLE * (n - 1) * (2 * n + 5) - coalesce(tie_corr, 0))
            / 18.0 AS var_s
        FROM ss, ties, nd),
      zz AS (SELECT n, s AS s_stat, round(var_s, 6) AS var_s,
          round($z, 9) AS z
        FROM v)
      SELECT n, s_stat, var_s, z,
        round(2.0 * ${graft.ops.Portable.normCdfUpper("abs(z)")}, 9)
          AS p_value,
        CASE WHEN abs(z) < 1.959963985 THEN 'no_trend'
          WHEN z > 0 THEN 'increasing' ELSE 'decreasing' END AS trend
      FROM zz"""
    })

  // ---------- q335: Hurst exponent (R/S) ------------------------------

  /** Hurst exponent of daily event counts by rescaled-range analysis:
    * for block sizes k = 5/10/15 days, each block's range of
    * cumulative deviations over its standard deviation, averaged per
    * k, and H = the log–log slope — H ≈ 0.5 is memoryless, H > 0.5
    * long-range persistent (busy days cluster, so capacity must plan
    * for RUNS of peaks, not independent ones). Completes the
    * dependence family: q142 ACF (linear, fixed lag), q322 PACF
    * (direct effect), q334 trend — this measures SCALING of memory.
    * Shape: after the per-day count pass everything is calendar-
    * bounded: per-block windows (PARTITIONED by block), a ≤|blocks|
    * aggregate, R/S pinned nano before the per-k mean, and a 3-point
    * OLS slope in scalar math.
    */
  private val q335 = QueryDef(
    "q335_hurst_rs",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = ev(s, dir)
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("c"))
      val d0 = daily.agg(min(col("day")).as("d0"))
      val ks = s.createDataFrame(Seq(Tuple1(5L), Tuple1(10L),
        Tuple1(15L))).toDF("k")
      val blocks = daily.crossJoin(broadcast(d0))
        .crossJoin(broadcast(ks))
        .select(col("k"), expr("(day - d0) div k").as("blk"),
          col("day"), col("c"))
      val wb = Window.partitionBy(col("k"), col("blk"))
      val wcum = Window.partitionBy(col("k"), col("blk"))
        .orderBy(col("day"))
      val rs = blocks
        .withColumn("n_b", count(lit(1)).over(wb))
        .where(col("n_b") === col("k")) // full blocks only
        .withColumn("sum_b", sum(col("c")).over(wb))
        .withColumn("cum_milli", sum(col("c") * 1000L
          - expr("CAST(round(sum_b * 1000.0 / k) AS BIGINT)")).over(wcum))
        .groupBy(col("k"), col("blk"))
        .agg((max(col("cum_milli")) - min(col("cum_milli")))
            .as("r_milli"),
          first(col("k")).as("kk"),
          sum(col("c") * col("c")).as("scc"),
          first(col("sum_b")).as("sb"))
        .select(col("k"), col("r_milli"),
          sqrt((col("scc").cast("double")
            - col("sb").cast("double") * col("sb") / col("k"))
            / col("k")).as("s_b"))
        .where(col("s_b") > 0)
        .select(col("k"),
          expr("CAST(round(r_milli / 1000.0 / s_b * 1e9) AS BIGINT)")
            .as("rs_nano"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_blocks"),
          (sum(col("rs_nano")).cast("double") / count(lit(1)) / 1e9)
            .as("rs_mean"))
      val pts = rs.select(col("k"), col("n_blocks"),
        expr("ln(CAST(k AS DOUBLE))").as("lx"),
        expr("ln(rs_mean)").as("ly"))
      val fit = pts.agg(count(lit(1)).as("np"),
        sum(col("lx")).as("sx"), sum(col("ly")).as("sy"),
        sum(col("lx") * col("lx")).as("sxx"),
        sum(col("lx") * col("ly")).as("sxy"))
      pts.select(col("k"), col("n_blocks"),
          round(exp(col("ly")), 6).as("rs_mean"))
        .crossJoin(broadcast(fit.select(
          round((col("np") * col("sxy") - col("sx") * col("sy"))
            / (col("np") * col("sxx") - col("sx") * col("sx")), 9)
            .as("hurst"))))
        .orderBy(col("k"))
    },
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          count(*)::BIGINT AS c
        FROM events GROUP BY 1),
      d0 AS (SELECT min(day) AS d0 FROM daily),
      ks AS (SELECT unnest([5, 10, 15])::BIGINT AS k),
      blocks AS (SELECT k, (day - d0) // k AS blk, day, c
        FROM daily, d0, ks),
      fullb AS (SELECT * FROM (SELECT *,
          count(*) OVER (PARTITION BY k, blk) AS n_b,
          sum(c) OVER (PARTITION BY k, blk)::BIGINT AS sum_b
        FROM blocks) WHERE n_b = k),
      cum AS (SELECT k, blk, sum_b,
          sum(c * 1000 - round(sum_b * 1000.0 / k)::BIGINT)
            OVER (PARTITION BY k, blk ORDER BY day)::BIGINT AS cum_milli,
          c
        FROM fullb),
      perblk AS (SELECT k, blk,
          (max(cum_milli) - min(cum_milli))::BIGINT AS r_milli,
          sum(c * c)::BIGINT AS scc, any_value(sum_b) AS sb
        FROM cum GROUP BY 1, 2),
      sb2 AS (SELECT k, r_milli,
          sqrt((scc::DOUBLE - sb::DOUBLE * sb / k) / k) AS s_b
        FROM perblk),
      rsn AS (SELECT k,
          round(r_milli / 1000.0 / s_b * 1e9)::BIGINT AS rs_nano
        FROM sb2 WHERE s_b > 0),
      rs AS (SELECT k, count(*)::BIGINT AS n_blocks,
          sum(rs_nano)::DOUBLE / count(*) / 1e9 AS rs_mean
        FROM rsn GROUP BY 1),
      pts AS (SELECT k, n_blocks, ln(k::DOUBLE) AS lx,
          ln(rs_mean) AS ly FROM rs),
      fit AS (SELECT round((count(*) * sum(lx * ly)
            - sum(lx) * sum(ly))
          / (count(*) * sum(lx * lx) - sum(lx) * sum(lx)), 9) AS hurst
        FROM pts)
      SELECT k, n_blocks, round(exp(ly), 6) AS rs_mean, hurst
      FROM pts, fit ORDER BY k"""))

  // ---------- q337: Bass diffusion fit --------------------------------

  /** Bass diffusion coefficients from the adoption curve — the product-
    * growth decomposition into innovation (p: adopters arriving
    * independently of installed base) vs imitation (q: adopters
    * recruited by existing ones): the discrete Bass identity
    * n_t/(M−N_{t−1}) = p + q·N_{t−1}/M is LINEAR in (p, q), so one
    * bounded two-parameter OLS over the daily adoption series fits it
    * with no iteration. q ≫ p means word-of-mouth dynamics (expect an
    * S-curve and a peak); p ≫ q means advertising-driven flat uptake.
    * Shape: first-purchase day per user is the only corpus-sized pass
    * (one shuffle on user); the adoption series is calendar-bounded,
    * the hazard/penetration points pin to nano ints, and the OLS is
    * scalar math on bounded sums.
    */
  private val q337 = QueryDef(
    "q337_bass_diffusion",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val firstDay = ev(s, dir)
        .where(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(min(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000"))
          .as("day"))
      val m = firstDay.agg(count(lit(1)).as("m"))
      val adopt = firstDay.groupBy(col("day"))
        .agg(count(lit(1)).as("n_new"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val pts = adopt
        .withColumn("n_prev", coalesce(sum(col("n_new")).over(w), lit(0L)))
        .crossJoin(broadcast(m))
        .where(col("n_prev") < col("m"))
        .select(
          expr("""CAST(round(CAST(n_new AS DOUBLE) / (m - n_prev) * 1e9)
            AS BIGINT)""").as("z_nano"),
          expr("CAST(round(CAST(n_prev AS DOUBLE) / m * 1e9) AS BIGINT)")
            .as("w_nano"))
      val fit = pts.agg(count(lit(1)).as("np"),
        sum(col("w_nano")).as("sw"), sum(col("z_nano")).as("sz"),
        sum(expr("""CAST(round(CAST(w_nano AS DOUBLE) * w_nano / 1e9)
          AS BIGINT)""")).as("sww"),
        sum(expr("""CAST(round(CAST(w_nano AS DOUBLE) * z_nano / 1e9)
          AS BIGINT)""")).as("swz"))
      fit.crossJoin(broadcast(m))
        .select(col("m").as("n_adopters"), col("np").as("n_days"),
          ((col("np") * col("swz") - expr(
            "CAST(round(CAST(sw AS DOUBLE) * sz / 1e9) AS BIGINT)"))
            .cast("double")
            / (col("np") * col("sww") - expr(
              "CAST(round(CAST(sw AS DOUBLE) * sw / 1e9) AS BIGINT)"))
              .cast("double")).as("q_raw"))
        .crossJoin(broadcast(pts.agg(
          (sum(col("z_nano")).cast("double") / count(lit(1)) / 1e9)
            .as("zbar"),
          (sum(col("w_nano")).cast("double") / count(lit(1)) / 1e9)
            .as("wbar"))))
        .select(col("n_adopters"), col("n_days"),
          round(col("q_raw"), 9).as("q_imitation"),
          round(col("zbar") - col("q_raw") * col("wbar"), 9)
            .as("p_innovation"))
    },
    Some("""WITH fd AS (SELECT user_id,
          min(epoch_us(ts) // 86400000000) AS day
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      m AS (SELECT count(*)::BIGINT AS m FROM fd),
      ad AS (SELECT day, count(*)::BIGINT AS n_new FROM fd GROUP BY 1),
      pts AS (SELECT
          round(n_new::DOUBLE / (m - n_prev) * 1e9)::BIGINT AS z_nano,
          round(n_prev::DOUBLE / m * 1e9)::BIGINT AS w_nano
        FROM (SELECT day, n_new,
            coalesce(sum(n_new) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS n_prev
          FROM ad), m
        WHERE n_prev < m),
      fit AS (SELECT count(*)::BIGINT AS np, sum(w_nano)::BIGINT AS sw,
          sum(z_nano)::BIGINT AS sz,
          sum(round(w_nano::DOUBLE * w_nano / 1e9)::BIGINT)::BIGINT
            AS sww,
          sum(round(w_nano::DOUBLE * z_nano / 1e9)::BIGINT)::BIGINT
            AS swz
        FROM pts),
      zb AS (SELECT sum(z_nano)::DOUBLE / count(*) / 1e9 AS zbar,
          sum(w_nano)::DOUBLE / count(*) / 1e9 AS wbar FROM pts),
      qq AS (SELECT m AS n_adopters, np AS n_days,
          (np * swz - round(sw::DOUBLE * sz / 1e9)::BIGINT)::DOUBLE
            / (np * sww - round(sw::DOUBLE * sw / 1e9)::BIGINT)::DOUBLE
            AS q_raw
        FROM fit, m)
      SELECT n_adopters, n_days, round(q_raw, 9) AS q_imitation,
        round(zbar - q_raw * wbar, 9) AS p_innovation
      FROM qq, zb"""))

  // ---------- q339: Ljung–Box whiteness test --------------------------

  /** Ljung–Box portmanteau test on daily event counts — "is the series
    * white noise?" asked jointly over lags 1–5 rather than one lag at
    * a time: Q = n(n+2)·Σ_k r_k²/(n−k), against the 5-df upper-0.1 %
    * χ² critical value 20.515. The go/no-go BEFORE fitting any of the
    * q164/q322/q335 time-series machinery — white noise means there is
    * nothing to model. Shape: identical scale discipline to q322 (the
    * milli-pinned deviation table, five bounded lag self-joins, a
    * 1-row moment vector); the statistic is scalar math. Shares q322's
    * documented gap convention (missing calendar days contribute
    * zero-deviation lag terms, n counts observed days — see q322) and
    * its DECIMAL(38,0)/HUGEINT lift on the Σd·d_k products.
    */
  private val q339 = QueryDef(
    "q339_ljung_box",
    (s, dir) => {
      val daily = ev(s, dir)
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("c"))
      val st = daily.agg(
        expr("CAST(round(sum(c) * 1000.0 / count(1)) AS BIGINT)")
          .as("mean_milli"))
      val dev = daily.crossJoin(broadcast(st))
        .select(col("day"), (col("c") * 1000 - col("mean_milli"))
          .as("d"))
      def lagged(k: Int) = dev.select((col("day") - k).as("day"),
        col("d").as(s"d$k"))
      val dDec = col("d").cast("decimal(38,0)")
      val mom = (1 to 5).foldLeft(dev) { (df, k) =>
          df.join(lagged(k), Seq("day"), "left")
        }
        .agg(count(lit(1)).as("n"),
          (sum(dDec * col("d")).as("s0") +:
            (1 to 5).map(k => sum(dDec * coalesce(col(s"d$k"),
              lit(0L))).as(s"s$k"))): _*)
      val rTerm = (1 to 5).map(k =>
        s"""(CAST(s$k AS DOUBLE) / s0) * (CAST(s$k AS DOUBLE) / s0)
           / (n - $k)""").mkString(" + ")
      mom.select(col("n"),
          round(expr(s"n * (n + 2.0) * ($rTerm)"), 9).as("q_stat"))
        .select(col("n"), col("q_stat"),
          (col("q_stat") > 20.515).as("serially_dependent"))
    },
    Some {
      val joins = (1 to 5).map(k =>
        s"LEFT JOIN dev l$k ON l$k.day = a.day + $k").mkString(" ")
      val sums = (1 to 5).map(k =>
        s"sum(a.d::HUGEINT * coalesce(l$k.d, 0)) AS s$k").mkString(", ")
      val rTerm = (1 to 5).map(k =>
        s"(s$k::DOUBLE / s0) * (s$k::DOUBLE / s0) / (n - $k)")
        .mkString(" + ")
      s"""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          count(*)::BIGINT AS c
        FROM events GROUP BY 1),
      st AS (SELECT round(sum(c)::BIGINT * 1000.0 / count(*))::BIGINT
          AS mean_milli FROM daily),
      dev AS (SELECT day, c * 1000 - mean_milli AS d FROM daily, st),
      mom AS (SELECT count(*)::BIGINT AS n,
          sum(a.d::HUGEINT * a.d) AS s0, $sums
        FROM dev a $joins),
      qs AS (SELECT n, round(n * (n + 2.0) * ($rTerm), 9) AS q_stat
        FROM mom)
      SELECT n, q_stat, q_stat > 20.515 AS serially_dependent
      FROM qs"""
    })

  // ---------- q343: ratio-to-moving-average seasonal index -------------

  /** Classical ratio-to-moving-average seasonal indices — the
    * decomposition method behind every "deseasonalized" business
    * series: each day's count over its CENTERED 7-day moving average
    * isolates the seasonal+noise component with trend removed (q143's
    * raw weekday means conflate trend into the index when traffic
    * grows), and averaging those ratios per weekday, then normalizing
    * the seven indices to mean 1, yields the multiplicative index a
    * deseasonalizer divides by. Windows must be full (7 rows) AND
    * calendar-contiguous (max−min day = 6): a gapped day spine would
    * otherwise let a 7-row window span >7 days and mix weekday phases
    * into the ratio. Shape: after the per-day count pass
    * everything is calendar-bounded — the centered MA is a ±3-row
    * window over the day table, ratios pin to nano, and the
    * normalization is a 7-row aggregate broadcast back.
    */
  private val q343 = QueryDef(
    "q343_seasonal_index",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = ev(s, dir)
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("c"))
      val wma = Window.orderBy(col("day")).rowsBetween(-3, 3)
      val ratios = daily
        .withColumn("n_win", count(lit(1)).over(wma))
        .withColumn("sum_win", sum(col("c")).over(wma))
        .withColumn("span_win", max(col("day")).over(wma)
          - min(col("day")).over(wma))
        // full centered windows only, AND calendar-contiguous: a 7-ROW
        // window spanning more than 7 days (a gap in the day spine)
        // would mix weekday phases into the ratio-to-MA index
        .where(col("n_win") === 7 && col("span_win") === 6)
        .select(expr("((day % 7) + 7) % 7").as("weekday"),
          expr("""CAST(round(CAST(c AS DOUBLE) * 7.0 / sum_win * 1e9)
            AS BIGINT)""").as("ratio_nano"))
      val perDay = ratios.groupBy(col("weekday"))
        .agg(count(lit(1)).as("n_obs"),
          expr("CAST(round(sum(ratio_nano) * 1.0 / count(1)) AS BIGINT)")
            .as("idx_nano"))
      val norm = perDay.agg(
        expr("CAST(round(sum(idx_nano) * 1.0 / count(1)) AS BIGINT)")
          .as("mean_nano"))
      perDay.crossJoin(broadcast(norm))
        .select(col("weekday"), col("n_obs"),
          round(col("idx_nano").cast("double") / 1e9, 9).as("raw_index"),
          round(col("idx_nano").cast("double")
            / col("mean_nano"), 9).as("seasonal_index"))
        .orderBy(col("weekday"))
    },
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          count(*)::BIGINT AS c
        FROM events GROUP BY 1),
      win AS (SELECT day, c,
          count(*) OVER (ORDER BY day
            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n_win,
          sum(c) OVER (ORDER BY day
            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)::BIGINT AS sum_win,
          max(day) OVER (ORDER BY day
            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
          - min(day) OVER (ORDER BY day
            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS span_win
        FROM daily),
      ratios AS (SELECT ((day % 7) + 7) % 7 AS weekday,
          round(c::DOUBLE * 7.0 / sum_win * 1e9)::BIGINT AS ratio_nano
        FROM win WHERE n_win = 7 AND span_win = 6),
      pd AS (SELECT weekday, count(*)::BIGINT AS n_obs,
          round(sum(ratio_nano) * 1.0 / count(*))::BIGINT AS idx_nano
        FROM ratios GROUP BY 1),
      nm AS (SELECT round(sum(idx_nano) * 1.0 / count(*))::BIGINT
          AS mean_nano FROM pd)
      SELECT weekday, n_obs,
        round(idx_nano::DOUBLE / 1e9, 9) AS raw_index,
        round(idx_nano::DOUBLE / mean_nano, 9) AS seasonal_index
      FROM pd, nm ORDER BY weekday"""))

  // ---------- q344: retention decay exponent --------------------------

  /** Power-law fit of the retention curve — q54 emits the cohort
    * retention TABLE; this fits the single number product teams
    * actually steer by: pooling cohorts, the share of users still
    * PURCHASING k weeks after their first purchase week decays ≈ r_k = r_1·k^{−α},
    * and α (the log–log OLS slope over k ≥ 1) IS the "how leaky is
    * the bucket" constant — α near 0 = habit, α > 1 = churn-dominated.
    * Shape: per-user first-week and active-weeks come from one
    * distinct (user, week) pass; the pooled k-offset table is
    * calendar-bounded; shares pin to nano; the OLS is scalar math on
    * ≤|weeks| points.
    */
  private val q344 = QueryDef(
    "q344_retention_decay",
    (s, dir) => {
      val weeks = ev(s, dir)
        .where(col("event_type") === "purchase")
        .select(col("user_id"),
          expr("timestampdiff(MICROSECOND, " +
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) " +
            "div 604800000000").as("week"))
        .distinct()
      val first = weeks.groupBy(col("user_id"))
        .agg(min(col("week")).as("week0"))
      val offsets = weeks.join(first, Seq("user_id"))
        .select(col("user_id"), (col("week") - col("week0")).as("k"))
      val cohortSize = first.agg(count(lit(1)).as("n_users"))
      val curve = offsets.where(col("k") >= 1)
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_active"))
        .crossJoin(broadcast(cohortSize))
        .select(col("k"), col("n_active"), col("n_users"),
          expr("""CAST(round(CAST(n_active AS DOUBLE) / n_users * 1e9)
            AS BIGINT)""").as("r_nano"))
      val pts = curve.select(col("k"), col("n_active"), col("r_nano"),
        expr("ln(CAST(k AS DOUBLE))").as("lx"),
        expr("ln(CAST(r_nano AS DOUBLE) / 1e9)").as("ly"))
      val fit = pts.agg(count(lit(1)).as("np"),
        sum(col("lx")).as("sx"), sum(col("ly")).as("sy"),
        sum(col("lx") * col("lx")).as("sxx"),
        sum(col("lx") * col("ly")).as("sxy"))
      pts.crossJoin(broadcast(fit.select(
          (round(-(col("np") * col("sxy") - col("sx") * col("sy"))
            / (col("np") * col("sxx") - col("sx") * col("sx")), 9)
            + lit(0.0)).as("decay_alpha"))))
        .select(col("k"), col("n_active"),
          round(col("r_nano").cast("double") / 1e9, 9).as("retention"),
          col("decay_alpha"))
        .orderBy(col("k"))
    },
    Some("""WITH weeks AS (SELECT DISTINCT user_id,
          epoch_us(ts) // 604800000000 AS week
        FROM events WHERE event_type = 'purchase'),
      first AS (SELECT user_id, min(week) AS week0 FROM weeks
        GROUP BY 1),
      offs AS (SELECT w.user_id, week - week0 AS k
        FROM weeks w JOIN first f ON w.user_id = f.user_id),
      cs AS (SELECT count(*)::BIGINT AS n_users FROM first),
      curve AS (SELECT k, count(*)::BIGINT AS n_active, n_users,
          round(count(*)::DOUBLE / n_users * 1e9)::BIGINT AS r_nano
        FROM offs, cs WHERE k >= 1 GROUP BY k, n_users),
      pts AS (SELECT k, n_active, r_nano, ln(k::DOUBLE) AS lx,
          ln(r_nano::DOUBLE / 1e9) AS ly
        FROM curve),
      fit AS (SELECT round(-(count(*) * sum(lx * ly)
            - sum(lx) * sum(ly))
          / (count(*) * sum(lx * lx) - sum(lx) * sum(lx)), 9) + 0.0
          AS decay_alpha
        FROM pts)
      SELECT k, n_active, round(r_nano::DOUBLE / 1e9, 9) AS retention,
        decay_alpha
      FROM pts, fit ORDER BY k"""))

  // ---------- q346: McNemar paired test -------------------------------

  /** McNemar's test on paired user behavior — did purchase propensity
    * CHANGE between the first and last week, asked the PAIRED way:
    * each user is their own control, so only the discordant pairs
    * (purchased week 1 but not week 4, or vice versa) carry
    * information, and χ² = (|b−c|−1)²/(b+c) with continuity
    * correction. The unpaired q163/q312 machinery would throw away
    * the within-user pairing and drown the signal in between-user
    * variance. Shape: one events pass into per-user (week1, week4)
    * purchase flags (conditional max aggregates — no joins), a 2×2
    * aggregate, scalar χ² vs the 1-df upper-0.1 % critical 10.828.
    */
  private val q346 = QueryDef(
    "q346_mcnemar",
    (s, dir) => {
      val wk = ev(s, dir)
        .select(col("user_id"), col("event_type"),
          expr("timestampdiff(MICROSECOND, " +
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) " +
            "div 604800000000").as("week"))
      val bounds = wk.agg(min(col("week")).as("wmin"),
        max(col("week")).as("wmax"))
      val flags = wk.crossJoin(broadcast(bounds))
        .groupBy(col("user_id"))
        .agg(
          max(when(col("event_type") === "purchase"
            && col("week") === col("wmin"), 1L).otherwise(0L))
            .as("w_first"),
          max(when(col("event_type") === "purchase"
            && col("week") === col("wmax"), 1L).otherwise(0L))
            .as("w_last"))
      flags.agg(count(lit(1)).as("n_users"),
          sum(when(col("w_first") === 1 && col("w_last") === 0, 1L)
            .otherwise(0L)).as("b"),
          sum(when(col("w_first") === 0 && col("w_last") === 1, 1L)
            .otherwise(0L)).as("c"))
        .select(col("n_users"), col("b"), col("c"),
          round(when(col("b") + col("c") === 0, lit(0.0))
            .otherwise(pow(abs(col("b") - col("c"))
              .cast("double") - 1.0, 2)
              / (col("b") + col("c")).cast("double")), 9)
            .as("chi2"),
          (when(col("b") + col("c") === 0, lit(0.0))
            .otherwise(pow(abs(col("b") - col("c"))
              .cast("double") - 1.0, 2)
              / (col("b") + col("c")).cast("double")) > 10.828)
            .as("changed"))
    },
    Some("""WITH wk AS (SELECT user_id, event_type,
          epoch_us(ts) // 604800000000 AS week
        FROM events),
      bounds AS (SELECT min(week) AS wmin, max(week) AS wmax FROM wk),
      flags AS (SELECT user_id,
          max(CASE WHEN event_type = 'purchase' AND week = wmin
            THEN 1 ELSE 0 END) AS w_first,
          max(CASE WHEN event_type = 'purchase' AND week = wmax
            THEN 1 ELSE 0 END) AS w_last
        FROM wk, bounds GROUP BY 1),
      x AS (SELECT count(*)::BIGINT AS n_users,
          sum(CASE WHEN w_first = 1 AND w_last = 0 THEN 1 ELSE 0
            END)::BIGINT AS b,
          sum(CASE WHEN w_first = 0 AND w_last = 1 THEN 1 ELSE 0
            END)::BIGINT AS c
        FROM flags)
      SELECT n_users, b, c,
        round(CASE WHEN b + c = 0 THEN 0.0
          ELSE pow(abs(b - c)::DOUBLE - 1.0, 2) / (b + c)::DOUBLE END,
          9) AS chi2,
        (CASE WHEN b + c = 0 THEN 0.0
          ELSE pow(abs(b - c)::DOUBLE - 1.0, 2) / (b + c)::DOUBLE END)
          > 10.828 AS changed
      FROM x"""))

  // ---------- q347: VaR / CVaR of daily revenue ------------------------

  /** Value-at-risk and conditional VaR (expected shortfall) of daily
    * event revenue at the 5 % level — the LOWER-tail risk twins of
    * q308's upper-tail Gumbel: VaR₉₅ = the worst-5 % daily-total
    * threshold, CVaR₉₅ = the mean of the days at or below it (the
    * coherent risk measure Basel moved to, because VaR alone ignores
    * HOW BAD the bad days are). Shape: per-day DECIMAL totals
    * (corpus pass) land in exact cents; the 5 % cut is an exact rank
    * over the calendar-bounded day table (q159 class), and the
    * shortfall mean is one conditional aggregate of exact cents.
    */
  private val q347 = QueryDef(
    "q347_cvar",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val daily = ev(s, dir)
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"), col("value"))
        .groupBy(col("day"))
        .agg(expr("""CAST(round(sum(CAST(value AS DECIMAL(18,4)))
          * 100.0) AS BIGINT)""").as("tot_cents"))
      val w = Window.orderBy(col("tot_cents"), col("day"))
      val ranked = daily.withColumn("rnk", row_number().over(w))
        .crossJoin(broadcast(daily.agg(count(lit(1)).as("nd"))))
      val varRow = ranked
        .where(col("rnk") * 20 >= col("nd"))
        .agg(min(col("tot_cents")).as("var_cents"))
      ranked.crossJoin(broadcast(varRow))
        .agg(first(col("nd")).as("n_days"),
          first(col("var_cents")).as("vc"),
          sum(when(col("tot_cents") <= col("var_cents"),
            col("tot_cents")).otherwise(0L)).as("short_cents"),
          sum(when(col("tot_cents") <= col("var_cents"), 1L)
            .otherwise(0L)).as("n_tail"))
        .select(col("n_days"), col("n_tail"),
          round(col("vc").cast("double") / 100.0, 2).as("var_95"),
          round(col("short_cents").cast("double") / col("n_tail")
            / 100.0, 2).as("cvar_95"))
    },
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          round(sum(CAST(value AS DECIMAL(18,4))) * 100.0)::BIGINT
            AS tot_cents
        FROM events GROUP BY 1),
      ranked AS (SELECT day, tot_cents,
          row_number() OVER (ORDER BY tot_cents, day) AS rnk,
          count(*) OVER () AS nd
        FROM daily),
      v AS (SELECT min(tot_cents) AS var_cents FROM ranked
        WHERE rnk * 20 >= nd)
      SELECT any_value(nd) AS n_days,
        sum(CASE WHEN tot_cents <= var_cents THEN 1 ELSE 0 END)::BIGINT
          AS n_tail,
        round(any_value(var_cents)::DOUBLE / 100.0, 2) AS var_95,
        round(sum(CASE WHEN tot_cents <= var_cents THEN tot_cents
            ELSE 0 END)::DOUBLE
          / sum(CASE WHEN tot_cents <= var_cents THEN 1 ELSE 0 END)
          / 100.0, 2) AS cvar_95
      FROM ranked, v"""))

  // ---------- q356: MASE forecast evaluation --------------------------

  /** Mean absolute SCALED error of the seasonal-naive forecast — the
    * forecast-eval metric that fixed MAPE's divide-by-zero and
    * scale-dependence problems (Hyndman & Koehler 2006): the 7-day-
    * lag forecast's MAE over the 1-day-lag random-walk's MAE, per
    * event type. MASE < 1 means the weekly pattern q164 exploits
    * genuinely beats persistence; ≥ 1 means the "seasonal" model is
    * worse than doing nothing — the go/no-go on shipping q164.
    * Shape: per-(type, day) counts are the corpus pass; both lag
    * joins are bounded calendar self-joins keyed on (type, day);
    * absolute errors are exact int64 sums; one division per type.
    */
  private val q356 = QueryDef(
    "q356_mase_eval",
    (s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"),
          expr("timestampdiff(MICROSECOND, " +
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
            .as("day"))
        .agg(count(lit(1)).as("c"))
      def lagged(k: Int, out: String) = daily.select(col("event_type"),
        (col("day") + k).as("day"), col("c").as(out))
      daily
        .join(lagged(7, "f7"), Seq("event_type", "day"))
        .join(lagged(1, "f1"), Seq("event_type", "day"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(abs(col("c") - col("f7"))).as("ae7"),
          sum(abs(col("c") - col("f1"))).as("ae1"))
        .select(col("event_type"), col("n_days"),
          round(col("ae7").cast("double") / col("n_days"), 6)
            .as("mae_seasonal"),
          round(col("ae1").cast("double") / col("n_days"), 6)
            .as("mae_naive"),
          round(col("ae7").cast("double") / col("ae1"), 9).as("mase"))
        .orderBy(col("event_type"))
    },
    Some("""WITH daily AS (SELECT event_type,
          epoch_us(ts) // 86400000000 AS day, count(*)::BIGINT AS c
        FROM events GROUP BY 1, 2),
      j AS (SELECT d.event_type, d.day, d.c, f7.c AS f7, f1.c AS f1
        FROM daily d
        JOIN daily f7 ON f7.event_type = d.event_type
          AND f7.day = d.day - 7
        JOIN daily f1 ON f1.event_type = d.event_type
          AND f1.day = d.day - 1)
      SELECT event_type, count(*)::BIGINT AS n_days,
        round(sum(abs(c - f7))::DOUBLE / count(*), 6) AS mae_seasonal,
        round(sum(abs(c - f1))::DOUBLE / count(*), 6) AS mae_naive,
        round(sum(abs(c - f7))::DOUBLE / sum(abs(c - f1)), 9) AS mase
      FROM j GROUP BY 1 ORDER BY event_type"""))

  // ---------- q359: Newey–West (HAC) standard error --------------------

  /** Newey–West / HAC standard error of the daily-traffic mean with a
    * Bartlett kernel at lag 3, reported against the iid standard
    * error it corrects — daily counts are autocorrelated (q142
    * measures exactly that), so the iid SE understates uncertainty
    * and every "is traffic up" test built on it over-rejects; the
    * HAC ratio is the calibration factor. Shares q322's machinery
    * verbatim: milli-pinned deviations from the broadcast mean, THREE
    * bounded day+k self-equi-joins (|days| rows each at any corpus
    * size — the day table is calendar-bounded), DECIMAL(38)/HUGEINT
    * lag products, q322's documented gap convention, then one moment
    * row and pure expression math: lrv = γ₀ + 2Σ(1 − k/4)γ_k,
    * se = √(lrv/n).
    */
  private val q359 = QueryDef(
    "q359_newey_west",
    (s, dir) => {
      val daily = ev(s, dir)
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("c"))
      val st = daily.agg(
        expr("CAST(round(sum(c) * 1000.0 / count(1)) AS BIGINT)")
          .as("mean_milli"))
      val dev = daily.crossJoin(broadcast(st))
        .select(col("day"), (col("c") * 1000 - col("mean_milli"))
          .as("d"), col("mean_milli"))
      def lagged(k: Int) = dev.select((col("day") - k).as("day"),
        col("d").as(s"d$k"))
      val dDec = col("d").cast("decimal(38,0)")
      val mom = dev
        .join(lagged(1), Seq("day"), "left")
        .join(lagged(2), Seq("day"), "left")
        .join(lagged(3), Seq("day"), "left")
        .agg(count(lit(1)).as("n"), max(col("mean_milli")).as("mm"),
          sum(dDec * col("d")).as("s0"),
          sum(dDec * coalesce(col("d1"), lit(0L))).as("s1"),
          sum(dDec * coalesce(col("d2"), lit(0L))).as("s2"),
          sum(dDec * coalesce(col("d3"), lit(0L))).as("s3"))
      val g = mom.select(col("n"), col("mm"),
        (col("s0").cast("double") / 1e6 / col("n")).as("g0"),
        (col("s1").cast("double") / 1e6 / col("n")).as("g1"),
        (col("s2").cast("double") / 1e6 / col("n")).as("g2"),
        (col("s3").cast("double") / 1e6 / col("n")).as("g3"))
      g.select(col("n"),
          round(col("mm").cast("double") / 1e3, 6).as("mean_daily"),
          round(sqrt(col("g0") / col("n")), 9).as("se_iid"),
          round(sqrt((col("g0") + lit(2.0) * (lit(0.75) * col("g1")
            + lit(0.5) * col("g2") + lit(0.25) * col("g3")))
            / col("n")), 9).as("se_hac"))
        .select(col("n"), col("mean_daily"), col("se_iid"),
          col("se_hac"),
          round(col("se_hac") / col("se_iid"), 6).as("hac_ratio"))
    },
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          count(*)::BIGINT AS c
        FROM events GROUP BY 1),
      st AS (SELECT round(sum(c)::BIGINT * 1000.0 / count(*))::BIGINT
          AS mean_milli FROM daily),
      dev AS (SELECT day, c * 1000 - mean_milli AS d, mean_milli
        FROM daily, st),
      mom AS (SELECT count(*)::BIGINT AS n, max(a.mean_milli) AS mm,
          sum(a.d::HUGEINT * a.d) AS s0,
          sum(a.d::HUGEINT * coalesce(l1.d, 0)) AS s1,
          sum(a.d::HUGEINT * coalesce(l2.d, 0)) AS s2,
          sum(a.d::HUGEINT * coalesce(l3.d, 0)) AS s3
        FROM dev a
        LEFT JOIN dev l1 ON l1.day = a.day + 1
        LEFT JOIN dev l2 ON l2.day = a.day + 2
        LEFT JOIN dev l3 ON l3.day = a.day + 3),
      g AS (SELECT n, mm,
          s0::DOUBLE / 1e6 / n AS g0, s1::DOUBLE / 1e6 / n AS g1,
          s2::DOUBLE / 1e6 / n AS g2, s3::DOUBLE / 1e6 / n AS g3
        FROM mom),
      e AS (SELECT n, round(mm::DOUBLE / 1e3, 6) AS mean_daily,
          round(sqrt(g0 / n), 9) AS se_iid,
          round(sqrt((g0 + 2.0 * (0.75 * g1 + 0.5 * g2 + 0.25 * g3))
            / n), 9) AS se_hac
        FROM g)
      SELECT n, mean_daily, se_iid, se_hac,
        round(se_hac / se_iid, 6) AS hac_ratio
      FROM e"""))

  // ---------- q364: Wilcoxon signed-rank (paired pre/post) -------------

  /** Wilcoxon signed-rank test of per-user mean event value, first
    * half of the window vs second half — the nonparametric paired
    * test a launch review uses when per-user deltas are skewed and a
    * paired t-test's normality assumption fails. Users are
    * corpus-proportional, so the rank machinery must not
    * single-partition: |Δ| ranks come from the tie-group table
    * (distinct |Δ| values, counts) put through
    * RangeNtile.withRunningSums — per-shard prefix sums plus the
    * boundary broadcast — and joined back by |Δ| (hash-distributed).
    * Average ranks for ties ride the integer form 2r̄ = 2·cnt_less +
    * cnt_eq + 1, so W⁺/W⁻ accumulate exactly in int64 halves; the
    * normal approximation applies the standard tie correction
    * Σ(t³−t)/48. Deltas pinned to micro units; zero deltas dropped
    * (the standard convention).
    */
  private val q364 = QueryDef(
    "q364_signed_rank",
    (s, dir) => {
      val d0 = ev(s, dir).agg(
        expr("""min(timestampdiff(MICROSECOND,
          TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)
          div 86400000000)""").as("d0"))
      val byUser = ev(s, dir).crossJoin(broadcast(d0))
        .select(col("user_id"),
          (expr("timestampdiff(MICROSECOND, " +
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)" +
            " div 86400000000") - col("d0") < 15).as("pre"),
          col("value"))
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("pre"), 1L).otherwise(0L)).as("n_pre"),
          sum(when(col("pre"), col("value").cast(DecimalType(18, 6)))
            .otherwise(lit(0).cast(DecimalType(18, 6)))).as("s_pre"),
          sum(when(!col("pre"), 1L).otherwise(0L)).as("n_post"),
          sum(when(!col("pre"), col("value").cast(DecimalType(18, 6)))
            .otherwise(lit(0).cast(DecimalType(18, 6)))).as("s_post"))
        .where(col("n_pre") > 0 && col("n_post") > 0)
        .select(col("user_id"),
          expr("""CAST(round((CAST(s_post AS DOUBLE) / n_post
            - CAST(s_pre AS DOUBLE) / n_pre) * 1e6) AS BIGINT)""")
            .as("dd"))
        .where(col("dd") =!= 0L)
        .withColumn("absd", abs(col("dd")))
      val ties = byUser.groupBy(col("absd"))
        .agg(count(lit(1)).as("cnt"))
      val cum = RangeNtile.withRunningSums(ties, Seq(col("absd")),
        Seq("cnt" -> "cum"))
        .select(col("absd"), col("cnt"),
          (lit(2L) * (col("cum") - col("cnt")) + col("cnt") + 1L)
            .as("r2"))
      val w = byUser.join(cum, Seq("absd"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("dd") > 0, col("r2")).otherwise(0L)).as("w2p"),
          sum(when(col("dd") < 0, col("r2")).otherwise(0L)).as("w2m"))
      val tc = cum.agg(sum(col("cnt") * col("cnt") * col("cnt")
        - col("cnt")).as("tsum"))
      w.crossJoin(broadcast(tc))
        .select(col("n").as("n_pairs"),
          (col("w2p").cast("double") / 2.0).as("w_plus"),
          (col("w2m").cast("double") / 2.0).as("w_minus"),
          col("w2p"), col("tsum"))
        .select(col("n_pairs"), col("w_plus"), col("w_minus"),
          round((col("w2p").cast("double") / 2.0
            - col("n_pairs").cast("double") * (col("n_pairs") + 1)
              / 4.0)
            / sqrt(col("n_pairs").cast("double") * (col("n_pairs") + 1)
              * (col("n_pairs") * 2 + 1) / 24.0
              - col("tsum").cast("double") / 48.0), 6).as("z_stat"))
    },
    Some("""WITH d0 AS (SELECT min(epoch_us(ts) // 86400000000) AS d0
        FROM events),
      bu AS (SELECT user_id,
          sum(CASE WHEN epoch_us(ts) // 86400000000 - d0 < 15
            THEN 1 ELSE 0 END)::BIGINT AS n_pre,
          sum(CASE WHEN epoch_us(ts) // 86400000000 - d0 < 15
            THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END) AS s_pre,
          sum(CASE WHEN epoch_us(ts) // 86400000000 - d0 >= 15
            THEN 1 ELSE 0 END)::BIGINT AS n_post,
          sum(CASE WHEN epoch_us(ts) // 86400000000 - d0 >= 15
            THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END) AS s_post
        FROM events, d0 GROUP BY 1),
      dd AS (SELECT user_id,
          round((s_post::DOUBLE / n_post - s_pre::DOUBLE / n_pre)
            * 1e6)::BIGINT AS dd
        FROM bu WHERE n_pre > 0 AND n_post > 0),
      nz AS (SELECT user_id, dd, abs(dd) AS absd FROM dd
        WHERE dd <> 0),
      ties AS (SELECT absd, count(*)::BIGINT AS cnt FROM nz GROUP BY 1),
      cum AS (SELECT absd, cnt,
          2 * (sum(cnt) OVER (ORDER BY absd
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - cnt)::BIGINT + cnt + 1 AS r2
        FROM ties),
      w AS (SELECT count(*)::BIGINT AS n,
          sum(CASE WHEN dd > 0 THEN r2 ELSE 0 END)::BIGINT AS w2p,
          sum(CASE WHEN dd < 0 THEN r2 ELSE 0 END)::BIGINT AS w2m
        FROM nz JOIN cum USING (absd)),
      tc AS (SELECT sum(cnt * cnt * cnt - cnt)::BIGINT AS tsum
        FROM ties)
      SELECT n AS n_pairs,
        w2p::DOUBLE / 2.0 AS w_plus, w2m::DOUBLE / 2.0 AS w_minus,
        round((w2p::DOUBLE / 2.0 - n::DOUBLE * (n + 1) / 4.0)
          / sqrt(n::DOUBLE * (n + 1) * (2 * n + 1) / 24.0
            - tsum::DOUBLE / 48.0), 6) AS z_stat
      FROM w, tc"""))

  // ---------- q365: Cramér–von Mises drift (binned) --------------------

  /** Binned two-sample Cramér–von Mises statistic between the value
    * distributions of purchase and view events — the integral-of-
    * squared-ECDF-gap drift test that weights the WHOLE distribution,
    * complementing q114's KS (supremum gap, tail-sensitive) and q105's
    * PSI (log-ratio, bin-mass-sensitive). Both samples bin into 40
    * equal-width cells of the broadcast global [min,max] range, so the
    * corpus-sized work is one grouped pass and everything after is a
    * CONSTANT 40-row table; the ECDF prefix is a bounded-window scan
    * and each bin's contribution is pinned to nano units before the
    * exact integer total (order-independent — the 40-term double sum
    * would be associativity-dependent otherwise).
    */
  private val q365 = QueryDef(
    "q365_cvm_drift",
    (s, dir) => {
      val vals = ev(s, dir)
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
      val w = Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = bins.agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
      val terms = bins.crossJoin(broadcast(tot))
        .withColumn("ca", sum(col("na")).over(w))
        .withColumn("cb", sum(col("nb")).over(w))
        .select(col("ta"), col("tb"), col("na"), col("nb"),
          expr("""CAST(round((na + nb) *
            (CAST(ca AS DOUBLE) / ta - CAST(cb AS DOUBLE) / tb) *
            (CAST(ca AS DOUBLE) / ta - CAST(cb AS DOUBLE) / tb) * 1e9)
            AS BIGINT)""").as("t_nano"))
      terms.groupBy(col("ta"), col("tb"))
        .agg(sum(col("t_nano")).as("tsum"))
        .select(col("ta").as("n_a"), col("tb").as("n_b"),
          round(col("ta").cast("double") * col("tb")
            / ((col("ta") + col("tb")).cast("double")
              * (col("ta") + col("tb")))
            * col("tsum").cast("double") / 1e9, 9).as("t_stat"))
        .select(col("n_a"), col("n_b"), col("t_stat"),
          (col("t_stat") > 0.461).as("drift"))
    },
    Some("""WITH vals AS (SELECT event_type = 'purchase' AS is_a, value
        FROM events WHERE event_type IN ('purchase', 'view')),
      rng AS (SELECT min(value) AS mn, max(value) AS mx FROM vals),
      bins AS (SELECT least(39, greatest(0,
            floor((value - mn) * 40.0 / (mx - mn))))::BIGINT AS bin,
          sum(CASE WHEN is_a THEN 1 ELSE 0 END)::BIGINT AS na,
          sum(CASE WHEN is_a THEN 0 ELSE 1 END)::BIGINT AS nb
        FROM vals, rng GROUP BY 1),
      tot AS (SELECT sum(na)::BIGINT AS ta, sum(nb)::BIGINT AS tb
        FROM bins),
      cum AS (SELECT bin, na, nb, ta, tb,
          sum(na) OVER (ORDER BY bin
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
            AS ca,
          sum(nb) OVER (ORDER BY bin
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
            AS cb
        FROM bins, tot),
      terms AS (SELECT ta, tb,
          round((na + nb) * (ca::DOUBLE / ta - cb::DOUBLE / tb)
            * (ca::DOUBLE / ta - cb::DOUBLE / tb) * 1e9)::BIGINT
            AS t_nano
        FROM cum),
      e AS (SELECT ta AS n_a, tb AS n_b,
          round(ta::DOUBLE * tb / ((ta + tb)::DOUBLE * (ta + tb))
            * sum(t_nano)::DOUBLE / 1e9, 9) AS t_stat
        FROM terms GROUP BY ta, tb)
      SELECT n_a, n_b, t_stat, t_stat > 0.461 AS drift
      FROM e"""))

  // ---------- q366: maximum drawdown of cumulative revenue -------------

  /** Maximum drawdown of the cumulative purchase-revenue curve — the
    * worst peak-to-trough give-back, the risk statistic a revenue
    * dashboard pairs with q347's VaR/CVaR (those bound the DAILY tail;
    * drawdown bounds the CUMULATIVE one). Revenue pinned to cents at
    * the daily aggregate; the equity curve, running peak, and
    * drawdown are three windows over the calendar-BOUNDED day table
    * (≤|days| rows at any corpus size — the q68 class), and the
    * trough row is a deterministic argmax (drawdown desc, earliest
    * day ties).
    */
  private val q366 = QueryDef(
    "q366_max_drawdown",
    (s, dir) => {
      val daily = ev(s, dir)
        .where(col("event_type") === "purchase")
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"), col("value"))
        .groupBy(col("day"))
        .agg(expr("""CAST(round(sum(CAST(value AS DECIMAL(18,6)))
          * 100.0) AS BIGINT)""").as("rev_cents"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dd = daily
        .withColumn("equity", sum(col("rev_cents")).over(w))
        .withColumn("peak", max(col("equity")).over(w))
        .withColumn("dd_cents", col("peak") - col("equity"))
      val nd = daily.agg(count(lit(1)).as("n_days"))
      dd.crossJoin(broadcast(nd))
        .orderBy(col("dd_cents").desc, col("day"))
        .limit(1)
        .select(col("n_days"), col("day").as("trough_day"),
          round(col("dd_cents").cast("double") / 100.0, 2)
            .as("max_drawdown"),
          round(col("dd_cents").cast("double")
            / col("peak").cast("double"), 9).as("dd_frac"))
    },
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          round(sum(CAST(value AS DECIMAL(18,6))) * 100.0)::BIGINT
            AS rev_cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      cum AS (SELECT day, rev_cents,
          sum(rev_cents) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
            AS equity
        FROM daily),
      pk AS (SELECT day, equity,
          max(equity) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
            AS peak
        FROM cum),
      dd AS (SELECT day, peak - equity AS dd_cents, peak FROM pk),
      nd AS (SELECT count(*)::BIGINT AS n_days FROM daily)
      SELECT n_days, day AS trough_day,
        round(dd_cents::DOUBLE / 100.0, 2) AS max_drawdown,
        round(dd_cents::DOUBLE / peak::DOUBLE, 9) AS dd_frac
      FROM dd, nd
      ORDER BY dd_cents DESC, day LIMIT 1"""))

  // ---------- q367: Granger-style lead–lag F test ----------------------

  /** Granger-style lead–lag test: do yesterday's CLICKS predict
    * today's PURCHASES beyond what yesterday's purchases already do?
    * Restricted (AR(1)) vs unrestricted (AR(1) + click lag) daily
    * regressions, F on the RSS drop — the causal-ordering screen a
    * funnel team runs before attributing conversions. Both daily
    * series are calendar-bounded; lags come from inner day+1
    * self-joins (observed-triple sample — gaps drop, q322's
    * convention noted), the joined sample is centered on ITS OWN
    * broadcast means (milli-pinned), second moments ride
    * DECIMAL(38)/HUGEINT, and both closed-form regressions fold from
    * ONE moment row — no iteration, no matrix solver.
    */
  private val q367 = QueryDef(
    "q367_granger_lite",
    (s, dir) => {
      val daily = ev(s, dir)
        .where(col("event_type").isin("purchase", "click"))
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"),
          (col("event_type") === "purchase").as("is_a"))
        .groupBy(col("day"))
        .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("a"),
          sum(when(!col("is_a"), 1L).otherwise(0L)).as("b"))
      val lag = daily.select((col("day") + 1).as("day"),
        col("a").as("a1"), col("b").as("b1"))
      val tri = daily.join(lag, Seq("day"))
        .select((col("a") * 1000).as("y"), (col("a1") * 1000).as("x1"),
          (col("b1") * 1000).as("x2"))
      val means = tri.agg(
        expr("CAST(round(avg(y)) AS BIGINT)").as("my"),
        expr("CAST(round(avg(x1)) AS BIGINT)").as("m1"),
        expr("CAST(round(avg(x2)) AS BIGINT)").as("m2"))
      val c = tri.crossJoin(broadcast(means))
        .select((col("y") - col("my")).as("cy"),
          (col("x1") - col("m1")).as("c1"),
          (col("x2") - col("m2")).as("c2"))
      val dec = (x: org.apache.spark.sql.Column) =>
        x.cast("decimal(38,0)")
      val mom = c.agg(count(lit(1)).as("n"),
        sum(dec(col("cy")) * col("cy")).as("syy"),
        sum(dec(col("c1")) * col("c1")).as("s11"),
        sum(dec(col("c2")) * col("c2")).as("s22"),
        sum(dec(col("c1")) * col("c2")).as("s12"),
        sum(dec(col("c1")) * col("cy")).as("s1y"),
        sum(dec(col("c2")) * col("cy")).as("s2y"))
      val e = mom.select(col("n"),
        col("syy").cast("double").as("syy"),
        col("s11").cast("double").as("s11"),
        col("s22").cast("double").as("s22"),
        col("s12").cast("double").as("s12"),
        col("s1y").cast("double").as("s1y"),
        col("s2y").cast("double").as("s2y"))
      e.select(col("n"),
          (col("syy") - col("s1y") * col("s1y") / col("s11"))
            .as("rss_r"),
          (col("syy") - (col("s1y") * col("s1y") * col("s22")
            - lit(2.0) * col("s1y") * col("s2y") * col("s12")
            + col("s2y") * col("s2y") * col("s11"))
            / (col("s11") * col("s22") - col("s12") * col("s12")))
            .as("rss_u"),
          ((col("s2y") * col("s11") - col("s1y") * col("s12"))
            / (col("s11") * col("s22") - col("s12") * col("s12")))
            .as("beta_b"))
        .select(col("n"),
          round((col("rss_r") - col("rss_u"))
            / (col("rss_u") / (col("n") - 3)), 6).as("f_stat"),
          round(col("beta_b"), 9).as("beta_click_lag"),
          round((col("rss_r") - col("rss_u")) / col("rss_r"), 9)
            .as("r2_gain"))
    },
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
            END)::BIGINT AS a,
          sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
            END)::BIGINT AS b
        FROM events WHERE event_type IN ('purchase', 'click')
        GROUP BY 1),
      tri AS (SELECT d.a * 1000 AS y, l.a * 1000 AS x1,
          l.b * 1000 AS x2
        FROM daily d JOIN daily l ON d.day = l.day + 1),
      means AS (SELECT round(avg(y))::BIGINT AS my,
          round(avg(x1))::BIGINT AS m1, round(avg(x2))::BIGINT AS m2
        FROM tri),
      c AS (SELECT y - my AS cy, x1 - m1 AS c1, x2 - m2 AS c2
        FROM tri, means),
      mom AS (SELECT count(*)::BIGINT AS n,
          sum(cy::HUGEINT * cy) AS syy, sum(c1::HUGEINT * c1) AS s11,
          sum(c2::HUGEINT * c2) AS s22, sum(c1::HUGEINT * c2) AS s12,
          sum(c1::HUGEINT * cy) AS s1y, sum(c2::HUGEINT * cy) AS s2y
        FROM c),
      e AS (SELECT n, syy::DOUBLE AS syy, s11::DOUBLE AS s11,
          s22::DOUBLE AS s22, s12::DOUBLE AS s12, s1y::DOUBLE AS s1y,
          s2y::DOUBLE AS s2y
        FROM mom),
      f AS (SELECT n,
          syy - s1y * s1y / s11 AS rss_r,
          syy - (s1y * s1y * s22 - 2.0 * s1y * s2y * s12
            + s2y * s2y * s11) / (s11 * s22 - s12 * s12) AS rss_u,
          (s2y * s11 - s1y * s12) / (s11 * s22 - s12 * s12) AS beta_b
        FROM e)
      SELECT n,
        round((rss_r - rss_u) / (rss_u / (n - 3)), 6) AS f_stat,
        round(beta_b, 9) AS beta_click_lag,
        round((rss_r - rss_u) / rss_r, 9) AS r2_gain
      FROM f"""))

  // ---------- q368: Page–Hinkley drift monitor -------------------------

  /** Page–Hinkley drift monitor over the daily mean event value — the
    * sequential mean-shift detector a data-quality pipeline runs on
    * every numeric feed (CUSUM's one-sided cousin; q171 covers CUSUM
    * changepoints, this is the alarm-threshold form λ=10 value
    * units, δ=0). The PH path needs the running mean at EACH step, so
    * it is a cumulative of a cumulative — all of it windows over the
    * calendar-BOUNDED day table, never the event corpus: daily means
    * pinned to micro units, per-day terms re-pinned after the
    * running-mean subtraction, then a second prefix and a running
    * minimum give the excess statistic PH_t − min PH; the report is
    * the max-excess row and the first alarm day.
    */
  private val q368 = QueryDef(
    "q368_page_hinkley",
    (s, dir) => {
      val daily = ev(s, dir)
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"), col("value"))
        .groupBy(col("day"))
        .agg(expr("""CAST(round(CAST(sum(CAST(value AS DECIMAL(18,6)))
          AS DOUBLE) / count(1) * 1e6) AS BIGINT)""").as("x_micro"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ph = daily
        .withColumn("t", count(lit(1)).over(w))
        .withColumn("cx", sum(col("x_micro")).over(w))
        .withColumn("term", expr("""CAST(round(x_micro
          - CAST(cx AS DOUBLE) / t) AS BIGINT)"""))
        .withColumn("ph", sum(col("term")).over(w))
        .withColumn("ph_min", min(col("ph")).over(w))
        .withColumn("excess", col("ph") - col("ph_min"))
      val alarm = ph.where(col("excess") > 10000000L)
        .agg(min(col("day")).as("first_alarm"))
      ph.orderBy(col("excess").desc, col("day")).limit(1)
        .crossJoin(broadcast(alarm))
        .select(col("day").as("peak_day"),
          round(col("excess").cast("double") / 1e6, 6)
            .as("max_excess"),
          coalesce(col("first_alarm"), lit(-1L)).as("first_alarm"))
    },
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          round(sum(CAST(value AS DECIMAL(18,6)))::DOUBLE / count(*)
            * 1e6)::BIGINT AS x_micro
        FROM events GROUP BY 1),
      c1 AS (SELECT day, x_micro,
          count(*) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            ::BIGINT AS t,
          sum(x_micro) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            ::BIGINT AS cx
        FROM daily),
      tm AS (SELECT day,
          round(x_micro - cx::DOUBLE / t)::BIGINT AS term
        FROM c1),
      c2 AS (SELECT day,
          sum(term) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            ::BIGINT AS ph
        FROM tm),
      c3 AS (SELECT day, ph,
          min(ph) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            ::BIGINT AS ph_min
        FROM c2),
      ex AS (SELECT day, ph - ph_min AS excess FROM c3),
      al AS (SELECT min(day) AS first_alarm FROM ex
        WHERE excess > 10000000)
      SELECT day AS peak_day,
        round(excess::DOUBLE / 1e6, 6) AS max_excess,
        coalesce(first_alarm, -1) AS first_alarm
      FROM ex, al
      ORDER BY excess DESC, day LIMIT 1"""))

  // ---------- q369: Kupiec proportion-of-failures VaR backtest ---------

  /** Kupiec POF backtest of a daily-revenue VaR model: fit the 10 %
    * VaR on the first 20 days (exact interpolated percentile — both
    * engines' type-7), count test-window days breaching it, and run
    * the likelihood-ratio test of "breach rate = 10 %" — the
    * regulator-standard check that a risk threshold is calibrated,
    * completing the q347 (VaR/CVaR) family with its VALIDATION step.
    * Revenue pinned to cents; the train percentile aggregates 20
    * bounded rows; the test count is one filtered aggregate; the LR
    * statistic is single-row math with the 0·ln0 = 0 convention
    * guarded explicitly.
    */
  private val q369 = QueryDef(
    "q369_kupiec_pof",
    (s, dir) => {
      val d0 = ev(s, dir).agg(
        expr("""min(timestampdiff(MICROSECOND,
          TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)
          div 86400000000)""").as("d0"))
      val daily = ev(s, dir)
        .where(col("event_type") === "purchase")
        .crossJoin(broadcast(d0))
        .select((expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)" +
          " div 86400000000") - col("d0")).as("rel_day"), col("value"))
        .groupBy(col("rel_day"))
        .agg(expr("""CAST(round(sum(CAST(value AS DECIMAL(18,6)))
          * 100.0) AS BIGINT)""").as("rev_cents"))
      val varT = daily.where(col("rel_day") < 20)
        .agg(expr("percentile(rev_cents, 0.1)").as("var_cents"))
      val test = daily.where(col("rel_day") >= 20)
        .crossJoin(broadcast(varT))
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("rev_cents").cast("double") < col("var_cents"),
            1L).otherwise(0L)).as("x_viol"),
          max(col("var_cents")).as("var_cents"))
      test.select(col("n_test"), col("x_viol"),
          round(col("var_cents") / 100.0, 6).as("var_thresh"),
          (col("x_viol").cast("double") / col("n_test")).as("phat"))
        .select(col("n_test"), col("x_viol"), col("var_thresh"),
          round(lit(-2.0) * ((col("n_test") - col("x_viol"))
            * log(lit(0.9)) + col("x_viol") * log(lit(0.1))
            - when(col("x_viol") === col("n_test"), lit(0.0))
              .otherwise((col("n_test") - col("x_viol"))
                * log(lit(1.0) - col("phat")))
            - when(col("x_viol") === 0L, lit(0.0))
              .otherwise(col("x_viol") * log(col("phat")))), 6)
            .as("lr_pof"))
        .select(col("n_test"), col("x_viol"), col("var_thresh"),
          col("lr_pof"), (col("lr_pof") > 3.841).as("reject"))
    },
    Some("""WITH d0 AS (SELECT min(epoch_us(ts) // 86400000000) AS d0
        FROM events),
      daily AS (SELECT epoch_us(ts) // 86400000000 - d0 AS rel_day,
          round(sum(CAST(value AS DECIMAL(18,6))) * 100.0)::BIGINT
            AS rev_cents
        FROM events, d0 WHERE event_type = 'purchase' GROUP BY 1),
      vt AS (SELECT quantile_cont(rev_cents, 0.1) AS var_cents
        FROM daily WHERE rel_day < 20),
      test AS (SELECT count(*)::BIGINT AS n_test,
          sum(CASE WHEN rev_cents::DOUBLE < var_cents THEN 1 ELSE 0
            END)::BIGINT AS x_viol,
          max(var_cents) AS var_cents
        FROM daily, vt WHERE rel_day >= 20),
      e AS (SELECT n_test, x_viol,
          round(var_cents / 100.0, 6) AS var_thresh,
          x_viol::DOUBLE / n_test AS phat
        FROM test),
      lr AS (SELECT n_test, x_viol, var_thresh,
          round(-2.0 * ((n_test - x_viol) * ln(0.9)
            + x_viol * ln(0.1)
            - CASE WHEN x_viol = n_test THEN 0.0
              ELSE (n_test - x_viol) * ln(1.0 - phat) END
            - CASE WHEN x_viol = 0 THEN 0.0
              ELSE x_viol * ln(phat) END), 6) AS lr_pof
        FROM e)
      SELECT n_test, x_viol, var_thresh, lr_pof,
        lr_pof > 3.841 AS reject
      FROM lr"""))

  // ---------- q370: Friedman rank test across event types --------------

  /** Friedman rank test of event-type intensity across days — each
    * day is a BLOCK, the five event types are TREATMENTS ranked
    * within the day by count, and the statistic asks whether any type
    * systematically out-ranks the others once day-level traffic shifts
    * are blocked out (the nonparametric repeated-measures ANOVA; the
    * parametric q358 cousin assumes normal residuals). The (day,type)
    * grid is densified by a bounded cross join so absent cells rank
    * as zero-count days; within-day ranks are 5-row window
    * partitions (hash-distributed by day); ties break
    * deterministically by type name (documented convention — both
    * dialects identical). Per-type rank sums are exact integers; the
    * χ²_F fold pins each type's squared deviation to micro units
    * before the k-term total.
    */
  private val q370 = QueryDef(
    "q370_friedman_ranks",
    (s, dir) => {
      val counts = ev(s, dir)
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"), col("event_type"))
        .groupBy(col("day"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val days = counts.select(col("day")).distinct()
      val types = counts.select(col("event_type")).distinct()
      val dense = days.crossJoin(broadcast(types))
        .join(counts, Seq("day", "event_type"), "left")
        .select(col("day"), col("event_type"),
          coalesce(col("c"), lit(0L)).as("c"))
      val wd = Window.partitionBy(col("day"))
        .orderBy(col("c"), col("event_type"))
      val ranked = dense.withColumn("r", rank().over(wd).cast("long"))
      val perType = ranked.groupBy(col("event_type"))
        .agg(sum(col("r")).as("sr"), count(lit(1)).as("n"))
      val kk = perType.agg(count(lit(1)).as("k"),
        max(col("n")).as("n_blocks"))
      val chi = perType.crossJoin(broadcast(kk))
        .select(col("event_type"), col("sr"), col("n"), col("k"),
          expr("""CAST(round((CAST(sr AS DOUBLE) / n - (k + 1) / 2.0)
            * (CAST(sr AS DOUBLE) / n - (k + 1) / 2.0) * 1e6)
            AS BIGINT)""").as("dev_micro"))
      val stat = chi.agg(max(col("n")).as("n"), max(col("k")).as("k"),
        sum(col("dev_micro")).as("devsum"))
        .select(round(lit(12.0) * col("n")
          / (col("k") * (col("k") + 1))
          * col("devsum").cast("double") / 1e6, 6).as("chi2_f"))
      chi.crossJoin(broadcast(stat))
        .select(col("event_type"),
          round(col("sr").cast("double") / col("n"), 6)
            .as("mean_rank"),
          col("chi2_f"), (col("chi2_f") > 9.488).as("signif"))
        .orderBy(col("event_type"))
    },
    Some("""WITH counts AS (SELECT epoch_us(ts) // 86400000000 AS day,
          event_type, count(*)::BIGINT AS c
        FROM events GROUP BY 1, 2),
      days AS (SELECT DISTINCT day FROM counts),
      types AS (SELECT DISTINCT event_type FROM counts),
      dense AS (SELECT d.day, t.event_type,
          coalesce(c.c, 0)::BIGINT AS c
        FROM days d CROSS JOIN types t
        LEFT JOIN counts c ON c.day = d.day
          AND c.event_type = t.event_type),
      ranked AS (SELECT day, event_type,
          rank() OVER (PARTITION BY day ORDER BY c, event_type)
            ::BIGINT AS r
        FROM dense),
      pt AS (SELECT event_type, sum(r)::BIGINT AS sr,
          count(*)::BIGINT AS n
        FROM ranked GROUP BY 1),
      kk AS (SELECT count(*)::BIGINT AS k, max(n)::BIGINT AS n
        FROM pt),
      chi AS (SELECT event_type, sr, pt.n, k,
          round((sr::DOUBLE / pt.n - (k + 1) / 2.0)
            * (sr::DOUBLE / pt.n - (k + 1) / 2.0) * 1e6)::BIGINT
            AS dev_micro
        FROM pt, kk),
      stat AS (SELECT round(12.0 * max(n) / (max(k) * (max(k) + 1))
          * sum(dev_micro)::DOUBLE / 1e6, 6) AS chi2_f
        FROM chi)
      SELECT event_type, round(sr::DOUBLE / n, 6) AS mean_rank,
        chi2_f, chi2_f > 9.488 AS signif
      FROM chi, stat
      ORDER BY event_type"""))

  // ---------- q386: generalized-ESD outlier rounds ---------------------

  /** Three rounds of the generalized extreme studentized deviate
    * (ESD) procedure over daily purchase revenue — the
    * multiple-outlier test that fixes Grubbs' masking problem (one
    * big outlier inflates the SD and hides the second; ESD removes
    * and re-tests). Each round recomputes cents-pinned moments over
    * the REMAINING calendar-bounded day table, pins the studentized
    * deviate to nano, takes the deterministic argmax (deviate desc,
    * earliest day), and anti-joins it out. The fixed 3.0 flag
    * threshold approximates the n≈30, α=0.05 critical values
    * (documented simplification — the exact λᵢ need a t-quantile).
    */
  private val q386 = QueryDef(
    "q386_esd_outliers",
    (s, dir) => {
      val daily = ev(s, dir)
        .where(col("event_type") === "purchase")
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"), col("value"))
        .groupBy(col("day"))
        .agg(expr("""CAST(round(sum(CAST(value AS DECIMAL(18,6)))
          * 100.0) AS BIGINT)""").as("x"))
      var cur = daily
      var out: DataFrame = null
      for (i <- 1 to 3) {
        val mom = cur.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum((col("x") * col("x"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .as("sxx"))
        val top = cur.crossJoin(broadcast(mom))
          .select(col("day"), col("x"),
            expr("""CAST(round(abs(x - CAST(sx AS DOUBLE) / n)
              / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                * CAST(sx AS DOUBLE) / n) / (n - 1)) * 1e9)
              AS BIGINT)""").as("r_nano"))
          .orderBy(col("r_nano").desc, col("day")).limit(1)
          .select(lit(i.toLong).as("round"), col("day"),
            col("r_nano"))
        out = if (out == null) top else out.unionAll(top)
        cur = cur.join(top.select(col("day")), Seq("day"), "left_anti")
      }
      out.select(col("round"), col("day"),
          round(col("r_nano").cast("double") / 1e9, 6).as("r_stat"),
          (col("r_nano") > 3000000000L).as("outlier"))
        .orderBy(col("round"))
    },
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          round(sum(CAST(value AS DECIMAL(18,6))) * 100.0)::BIGINT
            AS x
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      m1 AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
          sum(x::HUGEINT * x) AS sxx FROM daily),
      r1 AS (SELECT day, x, round(abs(x - sx::DOUBLE / n)
          / sqrt((sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n) / (n - 1))
          * 1e9)::BIGINT AS r_nano
        FROM daily, m1),
      t1 AS (SELECT 1::BIGINT AS round, day, r_nano FROM r1
        ORDER BY r_nano DESC, day LIMIT 1),
      d2 AS (SELECT day, x FROM daily
        WHERE day NOT IN (SELECT day FROM t1)),
      m2 AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
          sum(x::HUGEINT * x) AS sxx FROM d2),
      r2 AS (SELECT day, x, round(abs(x - sx::DOUBLE / n)
          / sqrt((sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n) / (n - 1))
          * 1e9)::BIGINT AS r_nano
        FROM d2, m2),
      t2 AS (SELECT 2::BIGINT AS round, day, r_nano FROM r2
        ORDER BY r_nano DESC, day LIMIT 1),
      d3 AS (SELECT day, x FROM d2
        WHERE day NOT IN (SELECT day FROM t2)),
      m3 AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
          sum(x::HUGEINT * x) AS sxx FROM d3),
      r3 AS (SELECT day, x, round(abs(x - sx::DOUBLE / n)
          / sqrt((sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n) / (n - 1))
          * 1e9)::BIGINT AS r_nano
        FROM d3, m3),
      t3 AS (SELECT 3::BIGINT AS round, day, r_nano FROM r3
        ORDER BY r_nano DESC, day LIMIT 1),
      u AS (SELECT * FROM t1 UNION ALL SELECT * FROM t2
        UNION ALL SELECT * FROM t3)
      SELECT round, day, round(r_nano::DOUBLE / 1e9, 6) AS r_stat,
        r_nano > 3000000000 AS outlier
      FROM u ORDER BY round"""))

  // ---------- q387: seasonal-strength feature --------------------------

  /** Wang–Hyndman seasonal-strength feature of daily traffic:
    * 1 − Var(remainder)/Var(detrended), where trend is the q343
    * centered 7-day MA (full AND calendar-contiguous windows only)
    * and the seasonal component is the per-weekday mean of the
    * detrended series — the single number that says whether the
    * weekday cycle is load-bearing (≈1) or noise (≈0), gating
    * whether a forecaster needs q343's index at all. Every window is
    * calendar-bounded; deviations pin to milli, weekday means pin
    * before subtraction, and both variances fold from one exact
    * moment row.
    */
  private val q387 = QueryDef(
    "q387_seasonal_strength",
    (s, dir) => {
      val daily = ev(s, dir)
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("c"))
      val wma = Window.orderBy(col("day")).rowsBetween(-3, 3)
      val detr = daily
        .withColumn("n_win", count(lit(1)).over(wma))
        .withColumn("sum_win", sum(col("c")).over(wma))
        .withColumn("span_win", max(col("day")).over(wma)
          - min(col("day")).over(wma))
        .where(col("n_win") === 7 && col("span_win") === 6)
        .select(expr("((day % 7) + 7) % 7").as("weekday"),
          (col("c") * 1000
            - expr("CAST(round(sum_win * 1000.0 / 7) AS BIGINT)"))
            .as("d"))
      val sw = detr.groupBy(col("weekday"))
        .agg(expr("CAST(round(avg(d)) AS BIGINT)").as("s_w"))
      val r = detr.join(broadcast(sw), Seq("weekday"))
        .select(col("d"), (col("d") - col("s_w")).as("r"))
      val dec = (x: org.apache.spark.sql.Column) =>
        x.cast("decimal(38,0)")
      val mom = r.agg(count(lit(1)).as("n"),
        sum(col("d")).as("sd"), sum(dec(col("d")) * col("d")).as("sdd"),
        sum(col("r")).as("sr"), sum(dec(col("r")) * col("r")).as("srr"))
      mom.select(col("n"),
          ((col("sdd").cast("double") - col("sd").cast("double")
            * col("sd").cast("double") / col("n")) / (col("n") - 1)
            / 1e6).as("vd"),
          ((col("srr").cast("double") - col("sr").cast("double")
            * col("sr").cast("double") / col("n")) / (col("n") - 1)
            / 1e6).as("vr"))
        .select(col("n").as("n_days_used"),
          round(col("vd"), 6).as("var_detrended"),
          round(col("vr"), 6).as("var_remainder"),
          round(greatest(lit(0.0), lit(1.0) - col("vr") / col("vd")),
            9).as("seasonal_strength"))
    },
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          count(*)::BIGINT AS c
        FROM events GROUP BY 1),
      win AS (SELECT day, c,
          count(*) OVER (ORDER BY day
            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n_win,
          sum(c) OVER (ORDER BY day
            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)::BIGINT
            AS sum_win,
          max(day) OVER (ORDER BY day
            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
          - min(day) OVER (ORDER BY day
            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS span_win
        FROM daily),
      detr AS (SELECT ((day % 7) + 7) % 7 AS weekday,
          c * 1000 - round(sum_win * 1000.0 / 7)::BIGINT AS d
        FROM win WHERE n_win = 7 AND span_win = 6),
      sw AS (SELECT weekday, round(avg(d))::BIGINT AS s_w
        FROM detr GROUP BY 1),
      r AS (SELECT d, d - s_w AS r
        FROM detr JOIN sw USING (weekday)),
      mom AS (SELECT count(*)::BIGINT AS n, sum(d)::BIGINT AS sd,
          sum(d::HUGEINT * d) AS sdd, sum(r)::BIGINT AS sr,
          sum(r::HUGEINT * r) AS srr
        FROM r),
      e AS (SELECT n,
          (sdd::DOUBLE - sd::DOUBLE * sd::DOUBLE / n) / (n - 1) / 1e6
            AS vd,
          (srr::DOUBLE - sr::DOUBLE * sr::DOUBLE / n) / (n - 1) / 1e6
            AS vr
        FROM mom)
      SELECT n AS n_days_used, round(vd, 6) AS var_detrended,
        round(vr, 6) AS var_remainder,
        round(greatest(0.0, 1.0 - vr / vd), 9) AS seasonal_strength
      FROM e"""))

  // ---------- q390: Durbin–Watson serial-correlation test --------------

  /** Durbin–Watson statistic of the residuals from the daily-revenue
    * trend regression — the canonical "are my regression errors
    * serially correlated" check (DW ≈ 2 means none; < ~1.35 at n≈30
    * flags positive autocorrelation, which silently shrinks OLS
    * standard errors — the same disease q359's HAC corrects for the
    * MEAN). The trend fit folds from one exact moment row; residuals
    * pin to cents per day; the first-difference sum is one bounded
    * day+1 self-join over the calendar-bounded table.
    */
  private val q390 = QueryDef(
    "q390_durbin_watson",
    (s, dir) => {
      val d0 = ev(s, dir).agg(
        expr("""min(timestampdiff(MICROSECOND,
          TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)
          div 86400000000)""").as("d0"))
      val daily = ev(s, dir)
        .where(col("event_type") === "purchase")
        .crossJoin(broadcast(d0))
        .select((expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)" +
          " div 86400000000") - col("d0")).as("t"), col("value"))
        .groupBy(col("t"))
        .agg(expr("""CAST(round(sum(CAST(value AS DECIMAL(18,6)))
          * 100.0) AS BIGINT)""").as("y"))
      val dec = (x: org.apache.spark.sql.Column) =>
        x.cast("decimal(38,0)")
      val mom = daily.agg(count(lit(1)).as("n"), sum(col("t")).as("st"),
        sum(col("y")).as("sy"), sum(dec(col("t")) * col("t")).as("stt"),
        sum(dec(col("t")) * col("y")).as("sty"))
      val ab = mom.select(col("n"),
        ((col("n").cast("double") * col("sty").cast("double")
          - col("st").cast("double") * col("sy").cast("double"))
          / (col("n").cast("double") * col("stt").cast("double")
            - col("st").cast("double") * col("st").cast("double")))
          .as("beta"), col("st"), col("sy"))
        .select(col("n"), col("beta"),
          ((col("sy").cast("double") - col("beta")
            * col("st").cast("double")) / col("n")).as("alpha"))
      val res = daily.crossJoin(broadcast(ab))
        .select(col("t"),
          expr("CAST(round(y - alpha - beta * t) AS BIGINT)").as("e"))
      val lag = res.select((col("t") + 1).as("t"), col("e").as("e1"))
      val dw = res.join(lag, Seq("t"), "left")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("e")) * col("e")).as("see"),
          sum(when(col("e1").isNotNull,
            dec(col("e") - col("e1")) * (col("e") - col("e1")))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("sdd"))
      dw.select(col("n"),
          round(col("sdd").cast("double") / col("see").cast("double"),
            6).as("dw_stat"))
        .select(col("n"), col("dw_stat"),
          (col("dw_stat") < 1.35).as("positive_autocorr"))
    },
    Some("""WITH d0 AS (SELECT min(epoch_us(ts) // 86400000000) AS d0
        FROM events),
      daily AS (SELECT epoch_us(ts) // 86400000000 - d0 AS t,
          round(sum(CAST(value AS DECIMAL(18,6))) * 100.0)::BIGINT
            AS y
        FROM events, d0 WHERE event_type = 'purchase' GROUP BY 1),
      mom AS (SELECT count(*)::BIGINT AS n, sum(t)::BIGINT AS st,
          sum(y)::BIGINT AS sy, sum(t::HUGEINT * t) AS stt,
          sum(t::HUGEINT * y) AS sty
        FROM daily),
      ab AS (SELECT n,
          (n::DOUBLE * sty::DOUBLE - st::DOUBLE * sy::DOUBLE)
            / (n::DOUBLE * stt::DOUBLE - st::DOUBLE * st::DOUBLE)
            AS beta, st, sy
        FROM mom),
      ab2 AS (SELECT n, beta,
          (sy::DOUBLE - beta * st::DOUBLE) / n AS alpha
        FROM ab),
      res AS (SELECT t,
          round(y - alpha - beta * t)::BIGINT AS e
        FROM daily, ab2),
      dw AS (SELECT count(*)::BIGINT AS n,
          sum(a.e::HUGEINT * a.e) AS see,
          sum(CASE WHEN l.e IS NOT NULL
            THEN (a.e - l.e)::HUGEINT * (a.e - l.e) ELSE 0 END)
            AS sdd
        FROM res a LEFT JOIN res l ON a.t = l.t + 1)
      SELECT n, round(sdd::DOUBLE / see::DOUBLE, 6) AS dw_stat,
        (sdd::DOUBLE / see::DOUBLE < 1.35) AS positive_autocorr
      FROM dw"""))

  // ---------- q391: Chow structural-break test -------------------------

  /** Chow test for a structural break in the daily-traffic trend at
    * mid-window (day 15): does one line fit the whole month, or do
    * the two halves demand different intercept/slope? — the
    * regime-change check a forecaster runs before pooling history
    * (q268's binary-segmentation finds WHERE a break is; Chow tests
    * a KNOWN candidate with an F sampling distribution). Counts pin
    * to milli; per-segment raw moments come from ONE
    * conditionally-pivoted pass; the three residual sums of squares
    * and the F fold are single-row closed-form math.
    */
  private val q391 = QueryDef(
    "q391_chow_break",
    (s, dir) => {
      val d0 = ev(s, dir).agg(
        expr("""min(timestampdiff(MICROSECOND,
          TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)
          div 86400000000)""").as("d0"))
      val daily = ev(s, dir).crossJoin(broadcast(d0))
        .select((expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)" +
          " div 86400000000") - col("d0")).as("t"))
        .groupBy(col("t")).agg((count(lit(1)) * 1000).as("y"))
        .withColumn("g", (col("t") >= 15).cast("long"))
      val dec = (x: org.apache.spark.sql.Column) =>
        x.cast("decimal(38,0)")
      def seg(g: Int, suf: String) = Seq(
        sum(when(col("g") === g, 1L).otherwise(0L)).as(s"n$suf"),
        sum(when(col("g") === g, col("t")).otherwise(0L))
          .as(s"st$suf"),
        sum(when(col("g") === g, col("y")).otherwise(0L))
          .as(s"sy$suf"),
        sum(when(col("g") === g, col("t") * col("t")).otherwise(0L)
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .as(s"stt$suf"),
        sum(when(col("g") === g, col("t") * col("y")).otherwise(0L)
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .as(s"sty$suf"),
        sum(when(col("g") === g, dec(col("y")) * col("y"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as(s"syy$suf"))
      val aggs = seg(0, "0") ++ seg(1, "1")
      val mom = daily.agg(aggs.head, aggs.tail: _*)
      def ssr(n: String, st: String, sy: String, stt: String,
          sty: String, syy: String) = {
        val nn = col(n).cast("double")
        val sxx = col(stt).cast("double") -
          col(st).cast("double") * col(st).cast("double") / nn
        val sxy = col(sty).cast("double") -
          col(st).cast("double") * col(sy).cast("double") / nn
        val syyC = col(syy).cast("double") -
          col(sy).cast("double") * col(sy).cast("double") / nn
        syyC - sxy * sxy / sxx
      }
      val pooled = mom.select(
        (col("n0") + col("n1")).as("n"),
        (col("st0") + col("st1")).as("st"),
        (col("sy0") + col("sy1")).as("sy"),
        (col("stt0") + col("stt1")).as("stt"),
        (col("sty0") + col("sty1")).as("sty"),
        (col("syy0") + col("syy1")).as("syy"),
        ssr("n0", "st0", "sy0", "stt0", "sty0", "syy0").as("ssr0"),
        ssr("n1", "st1", "sy1", "stt1", "sty1", "syy1").as("ssr1"))
      pooled.select(col("n"),
          ssr("n", "st", "sy", "stt", "sty", "syy").as("ssr_p"),
          col("ssr0"), col("ssr1"))
        .select(col("n"),
          round(((col("ssr_p") - col("ssr0") - col("ssr1")) / 2.0)
            / ((col("ssr0") + col("ssr1")) / (col("n") - 4)), 6)
            .as("f_stat"))
        .select(col("n"), col("f_stat"),
          (col("f_stat") > 3.37).as("structural_break"))
    },
    Some("""WITH d0 AS (SELECT min(epoch_us(ts) // 86400000000) AS d0
        FROM events),
      daily AS (SELECT epoch_us(ts) // 86400000000 - d0 AS t,
          count(*)::BIGINT * 1000 AS y
        FROM events, d0 GROUP BY 1),
      dg AS (SELECT t, y, CASE WHEN t >= 15 THEN 1 ELSE 0 END AS g
        FROM daily),
      mom AS (SELECT
          sum(CASE WHEN g = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
          sum(CASE WHEN g = 0 THEN t ELSE 0 END)::BIGINT AS st0,
          sum(CASE WHEN g = 0 THEN y ELSE 0 END)::BIGINT AS sy0,
          sum(CASE WHEN g = 0 THEN t::HUGEINT * t ELSE 0 END) AS stt0,
          sum(CASE WHEN g = 0 THEN t::HUGEINT * y ELSE 0 END) AS sty0,
          sum(CASE WHEN g = 0 THEN y::HUGEINT * y ELSE 0 END) AS syy0,
          sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
          sum(CASE WHEN g = 1 THEN t ELSE 0 END)::BIGINT AS st1,
          sum(CASE WHEN g = 1 THEN y ELSE 0 END)::BIGINT AS sy1,
          sum(CASE WHEN g = 1 THEN t::HUGEINT * t ELSE 0 END) AS stt1,
          sum(CASE WHEN g = 1 THEN t::HUGEINT * y ELSE 0 END) AS sty1,
          sum(CASE WHEN g = 1 THEN y::HUGEINT * y ELSE 0 END) AS syy1
        FROM dg),
      e AS (SELECT n0 + n1 AS n,
          ((syy0::DOUBLE - sy0::DOUBLE * sy0::DOUBLE / n0)
            - (sty0::DOUBLE - st0::DOUBLE * sy0::DOUBLE / n0)
              * (sty0::DOUBLE - st0::DOUBLE * sy0::DOUBLE / n0)
              / (stt0::DOUBLE - st0::DOUBLE * st0::DOUBLE / n0))
            AS ssr0,
          ((syy1::DOUBLE - sy1::DOUBLE * sy1::DOUBLE / n1)
            - (sty1::DOUBLE - st1::DOUBLE * sy1::DOUBLE / n1)
              * (sty1::DOUBLE - st1::DOUBLE * sy1::DOUBLE / n1)
              / (stt1::DOUBLE - st1::DOUBLE * st1::DOUBLE / n1))
            AS ssr1,
          (((syy0 + syy1)::DOUBLE
            - (sy0 + sy1)::DOUBLE * (sy0 + sy1)::DOUBLE / (n0 + n1))
            - ((sty0 + sty1)::DOUBLE - (st0 + st1)::DOUBLE
              * (sy0 + sy1)::DOUBLE / (n0 + n1))
              * ((sty0 + sty1)::DOUBLE - (st0 + st1)::DOUBLE
                * (sy0 + sy1)::DOUBLE / (n0 + n1))
              / ((stt0 + stt1)::DOUBLE - (st0 + st1)::DOUBLE
                * (st0 + st1)::DOUBLE / (n0 + n1))) AS ssr_p
        FROM mom)
      SELECT n,
        round(((ssr_p - ssr0 - ssr1) / 2.0)
          / ((ssr0 + ssr1) / (n - 4)), 6) AS f_stat,
        (((ssr_p - ssr0 - ssr1) / 2.0)
          / ((ssr0 + ssr1) / (n - 4)) > 3.37) AS structural_break
      FROM e"""))

  // ---------- q392: Hampel rolling-median outlier filter ---------------

  /** Hampel filter over daily mean event value: a ±3-day rolling
    * median and MAD flag days deviating more than 3·1.4826·MAD — the
    * robust cousin of z-score spike detection (q179's EWMA reacts to
    * level shifts; Hampel is immune to the outlier polluting its own
    * baseline, because median and MAD ignore it). Daily means pin to
    * micro; the 7-element window materializes as an ordered array
    * (full + calendar-contiguous windows only, the q343 gates), the
    * median/MAD are exact element picks on the sorted 7-array, and
    * the flag comparison is pure integer arithmetic
    * (|x−med|·10⁴ > 44478·MAD replicates the 3·1.4826 constant with
    * zero float boundary risk).
    */
  private val q392 = QueryDef(
    "q392_hampel_filter",
    (s, dir) => {
      val daily = ev(s, dir)
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"), col("value"))
        .groupBy(col("day"))
        .agg(expr("""CAST(round(CAST(sum(CAST(value AS DECIMAL(18,6)))
          AS DOUBLE) / count(1) * 1e6) AS BIGINT)""").as("x"))
      val wma = Window.orderBy(col("day")).rowsBetween(-3, 3)
      daily
        .withColumn("arr", collect_list(col("x")).over(wma))
        .withColumn("n_win", count(lit(1)).over(wma))
        .withColumn("span_win", max(col("day")).over(wma)
          - min(col("day")).over(wma))
        .where(col("n_win") === 7 && col("span_win") === 6)
        .withColumn("med", expr("element_at(array_sort(arr), 4)"))
        .withColumn("mad", expr(
          "element_at(array_sort(transform(arr, v -> abs(v - med))), 4)"))
        .select(col("day"),
          round(col("x").cast("double") / 1e6, 6).as("x_val"),
          round(col("med").cast("double") / 1e6, 6).as("med_val"),
          round(col("mad").cast("double") / 1e6, 6).as("mad_val"),
          (abs(col("x") - col("med")) * 10000L
            > col("mad") * 44478L).as("outlier"))
        .orderBy(col("day"))
    },
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          round(sum(CAST(value AS DECIMAL(18,6)))::DOUBLE / count(*)
            * 1e6)::BIGINT AS x
        FROM events GROUP BY 1),
      win AS (SELECT day, x,
          list(x) OVER (ORDER BY day
            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS arr,
          count(*) OVER (ORDER BY day
            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n_win,
          max(day) OVER (ORDER BY day
            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
          - min(day) OVER (ORDER BY day
            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS span_win
        FROM daily),
      md AS (SELECT day, x, list_sort(arr)[4] AS med, arr
        FROM win WHERE n_win = 7 AND span_win = 6),
      hm AS (SELECT day, x, med,
          list_sort(list_transform(arr, v -> abs(v - med)))[4] AS mad
        FROM md)
      SELECT day, round(x::DOUBLE / 1e6, 6) AS x_val,
        round(med::DOUBLE / 1e6, 6) AS med_val,
        round(mad::DOUBLE / 1e6, 6) AS mad_val,
        (abs(x - med) * 10000 > mad * 44478) AS outlier
      FROM hm ORDER BY day"""))

  // ---------- q393: kernel MMD drift (binned) --------------------------

  /** Binned kernel maximum-mean-discrepancy between purchase and view
    * value distributions — the RBF-kernel drift statistic that sees
    * SHAPE differences even when every moment matches, rounding out
    * the drift family (q105 PSI, q114 KS, q274 EMD, q365 CvM): each
    * has blind spots, a monitoring suite runs several. Both samples
    * bin into the shared broadcast 40-cell grid (corpus work = one
    * grouped pass); MMD² = Σᵢⱼ dᵢdⱼK(i,j) folds over the CONSTANT
    * 40×40 grid with probability gaps pinned to nano and the kernel
    * pinned to micro BEFORE the product (exp() differs in the last
    * ulp across engines — q172's precedent — so the kernel is
    * quantized first and every product is exact DECIMAL).
    */
  private val q393 = QueryDef(
    "q393_mmd_drift",
    (s, dir) => {
      val vals = ev(s, dir)
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
      val tot = bins.agg(sum(col("na")).as("ta"),
        sum(col("nb")).as("tb"))
      val d = bins.crossJoin(broadcast(tot))
        .select(col("bin"),
          expr("""CAST(round((CAST(na AS DOUBLE) / ta
            - CAST(nb AS DOUBLE) / tb) * 1e9) AS BIGINT)""")
            .as("d_nano"), col("ta"), col("tb"))
      val terms = d.alias("a").join(broadcast(d.alias("b")), lit(true))
        .select(col("a.ta").as("ta"), col("a.tb").as("tb"),
          (col("a.d_nano").cast("decimal(38,0)") * col("b.d_nano")
            * expr("""CAST(round(exp(-CAST((a.bin - b.bin)
              * (a.bin - b.bin) AS DOUBLE) / 50.0) * 1e6) AS BIGINT)"""))
            .as("term"))
      terms.groupBy(col("ta"), col("tb"))
        .agg(sum(col("term")).as("tsum"))
        .select(col("ta").as("n_a"), col("tb").as("n_b"),
          round(col("tsum").cast("double") / 1e24, 12).as("mmd2"))
        .select(col("n_a"), col("n_b"), col("mmd2"),
          (col("mmd2") > 0.001).as("drift"))
    },
    Some("""WITH vals AS (SELECT event_type = 'purchase' AS is_a, value
        FROM events WHERE event_type IN ('purchase', 'view')),
      rng AS (SELECT min(value) AS mn, max(value) AS mx FROM vals),
      bins AS (SELECT least(39, greatest(0,
            floor((value - mn) * 40.0 / (mx - mn))))::BIGINT AS bin,
          sum(CASE WHEN is_a THEN 1 ELSE 0 END)::BIGINT AS na,
          sum(CASE WHEN is_a THEN 0 ELSE 1 END)::BIGINT AS nb
        FROM vals, rng GROUP BY 1),
      tot AS (SELECT sum(na)::BIGINT AS ta, sum(nb)::BIGINT AS tb
        FROM bins),
      d AS (SELECT bin,
          round((na::DOUBLE / ta - nb::DOUBLE / tb) * 1e9)::BIGINT
            AS d_nano, ta, tb
        FROM bins, tot),
      terms AS (SELECT a.ta, a.tb,
          a.d_nano::HUGEINT * b.d_nano
            * round(exp(-((a.bin - b.bin) * (a.bin - b.bin))::DOUBLE
              / 50.0) * 1e6)::BIGINT AS term
        FROM d a CROSS JOIN d b)
      SELECT ta AS n_a, tb AS n_b,
        round(sum(term)::DOUBLE / 1e24, 12) AS mmd2,
        (round(sum(term)::DOUBLE / 1e24, 12) > 0.001) AS drift
      FROM terms GROUP BY ta, tb"""))

  // ---------- q395: peaks-over-threshold GPD tail fit ------------------

  /** Peaks-over-threshold tail model of daily revenue: exceedances
    * over the empirical 20th-percentile floor (low-revenue risk) fit
    * a generalized Pareto by method of moments, yielding the shape ξ
    * (heavy vs bounded tail) and a 90-day return level — the EVT
    * cousin of q308's block-maxima Gumbel fit (POT uses every
    * exceedance; block maxima discard all but one per block, which at
    * 30 days means almost everything). Threshold = exact interpolated
    * percentile over the calendar-bounded day table; exceedance
    * moments pin to cents; MoM ξ̂ = (ȳ²/s² − 1)/2,
    * σ̂ = ȳ(ȳ²/s² + 1)/2 and the return level are single-row math.
    * Deficits (u − x for x below u) make the fit one-sided on the
    * LOW tail, matching the q347 VaR orientation.
    */
  private val q395 = QueryDef(
    "q395_pot_gpd",
    (s, dir) => {
      val daily = ev(s, dir)
        .where(col("event_type") === "purchase")
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"), col("value"))
        .groupBy(col("day"))
        .agg(expr("""CAST(round(sum(CAST(value AS DECIMAL(18,6)))
          * 100.0) AS BIGINT)""").as("x"))
      val th = daily.agg(expr("percentile(x, 0.2)").as("u"),
        count(lit(1)).as("n_days"))
      val exc = daily.crossJoin(broadcast(th))
        .where(col("x").cast("double") < col("u"))
        .select(expr("CAST(round(u - x) AS BIGINT)").as("y"), col("u"),
          col("n_days"))
      val mom = exc.groupBy(col("u"), col("n_days"))
        .agg(count(lit(1)).as("k"), sum(col("y")).as("sy"),
          sum((col("y") * col("y"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .as("syy"))
      val fit = mom.select(col("u"), col("n_days"), col("k"),
          (col("sy").cast("double") / col("k")).as("m"),
          ((col("syy").cast("double") - col("sy").cast("double")
            * col("sy").cast("double") / col("k")) / (col("k") - 1))
            .as("s2"))
        .select(col("u"), col("n_days"), col("k"), col("m"),
          ((col("m") * col("m") / col("s2") - 1.0) / 2.0).as("xi"),
          (col("m") * (col("m") * col("m") / col("s2") + 1.0) / 2.0)
            .as("sigma"))
      fit.select(col("k").as("n_exceed"),
          round(col("u") / 100.0, 6).as("threshold"),
          round(col("xi"), 6).as("xi"),
          round(col("sigma") / 100.0, 6).as("sigma"),
          // 90-day return level of the LOW tail: u minus the GPD
          // quantile at the 1/(90*zeta) exceedance rate
          round((col("u") - col("sigma") / col("xi")
            * (pow(lit(90.0) * col("k") / col("n_days"), col("xi"))
              - 1.0)) / 100.0, 6).as("return_level_90d"))
    },
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          round(sum(CAST(value AS DECIMAL(18,6))) * 100.0)::BIGINT
            AS x
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      th AS (SELECT quantile_cont(x, 0.2) AS u,
          count(*)::BIGINT AS n_days FROM daily),
      exc AS (SELECT round(u - x)::BIGINT AS y, u, n_days
        FROM daily, th WHERE x::DOUBLE < u),
      mom AS (SELECT u, n_days, count(*)::BIGINT AS k,
          sum(y)::BIGINT AS sy, sum(y::HUGEINT * y) AS syy
        FROM exc GROUP BY u, n_days),
      fit AS (SELECT u, n_days, k, sy::DOUBLE / k AS m,
          (syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / k) / (k - 1) AS s2
        FROM mom),
      gp AS (SELECT u, n_days, k, m,
          (m * m / s2 - 1.0) / 2.0 AS xi,
          m * (m * m / s2 + 1.0) / 2.0 AS sigma
        FROM fit)
      SELECT k AS n_exceed, round(u / 100.0, 6) AS threshold,
        round(xi, 6) AS xi, round(sigma / 100.0, 6) AS sigma,
        round((u - sigma / xi
          * (pow(90.0 * k / n_days, xi) - 1.0)) / 100.0, 6)
          AS return_level_90d
      FROM gp"""))

  // ---------- q399: sessionization gap-threshold sensitivity -----------

  /** Sensitivity of the session count to the inactivity-gap
    * threshold: the 5/15/30/60-minute session totals and mean
    * events-per-session from ONE pass over the per-user
    * inter-arrival gaps — the tuning curve behind q27's fixed
    * 30-minute rule (a knee in this curve is where the threshold
    * belongs; a flat curve means the choice doesn't matter). Gaps
    * come from a per-user window (user_id is high-cardinality, so
    * partitions stay small at any corpus size — the documented
    * RangeLead boundary: windows for high-cardinality keys, the
    * boundary-broadcast pass for low); all four thresholds are
    * conditional sums over the SAME gap table, so sensitivity costs
    * one corpus pass, not four. Sessions(g) = users + gaps > g,
    * exact integers throughout.
    */
  private val q399 = QueryDef(
    "q399_session_gap_sensitivity",
    (s, dir) => {
      val ts = ev(s, dir)
        .select(col("user_id"),
          expr("timestampdiff(MICROSECOND, " +
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)").as("us"),
          col("event_id"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val gaps = ts
        .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(when(col("gap") > 5L * 60000000L, 1L).otherwise(0L))
            .as("g5"),
          sum(when(col("gap") > 15L * 60000000L, 1L).otherwise(0L))
            .as("g15"),
          sum(when(col("gap") > 30L * 60000000L, 1L).otherwise(0L))
            .as("g30"),
          sum(when(col("gap") > 60L * 60000000L, 1L).otherwise(0L))
            .as("g60"))
      gaps.select(explode(expr(
          """array(struct(5L AS gap_min, n_users + g5 AS n_sessions,
                   n_events AS n_events),
                 struct(15L AS gap_min, n_users + g15 AS n_sessions,
                   n_events AS n_events),
                 struct(30L AS gap_min, n_users + g30 AS n_sessions,
                   n_events AS n_events),
                 struct(60L AS gap_min, n_users + g60 AS n_sessions,
                   n_events AS n_events))""")).as("r"))
        .select(col("r.gap_min"), col("r.n_sessions"),
          round(col("r.n_events").cast("double") / col("r.n_sessions"),
            6).as("mean_events_per_session"))
        .orderBy(col("gap_min"))
    },
    Some("""WITH ts AS (SELECT user_id, epoch_us(ts) AS us, event_id
        FROM events),
      gaps AS (SELECT user_id,
          us - lag(us) OVER (PARTITION BY user_id
            ORDER BY us, event_id) AS gap
        FROM ts),
      agg AS (SELECT count(*)::BIGINT AS n_events,
          count(DISTINCT user_id)::BIGINT AS n_users,
          sum(CASE WHEN gap > 5::BIGINT * 60000000 THEN 1 ELSE 0 END)::BIGINT
            AS g5,
          sum(CASE WHEN gap > 15::BIGINT * 60000000 THEN 1 ELSE 0 END)::BIGINT
            AS g15,
          sum(CASE WHEN gap > 30::BIGINT * 60000000 THEN 1 ELSE 0 END)::BIGINT
            AS g30,
          sum(CASE WHEN gap > 60::BIGINT * 60000000 THEN 1 ELSE 0 END)::BIGINT
            AS g60
        FROM gaps),
      u AS (
        SELECT 5::BIGINT AS gap_min, n_users + g5 AS n_sessions,
            n_events FROM agg
        UNION ALL SELECT 15, n_users + g15, n_events FROM agg
        UNION ALL SELECT 30, n_users + g30, n_events FROM agg
        UNION ALL SELECT 60, n_users + g60, n_events FROM agg)
      SELECT gap_min, n_sessions,
        round(n_events::DOUBLE / n_sessions, 6)
          AS mean_events_per_session
      FROM u ORDER BY gap_min"""))

  // ---------- q402: two-group log-rank survival test -------------------

  /** Log-rank (Mantel–Cox) test comparing the user-lifetime survival
    * curves of two deterministic user cohorts (`user_id % 2`, the q163
    * split): at each distinct lifetime t the observed cohort-A deaths
    * are compared against the hypergeometric expectation d·n_A/n from
    * the shared at-risk sets, and the standardized sum is the chi-free
    * z statistic — the hypothesis-test companion to q159's single
    * Kaplan–Meier curve (all lifetimes fully observed in this corpus,
    * i.e. no censoring — the same convention q159 states). Scale
    * shape: one groupBy(user) pass over the corpus reduces to the
    * distinct-lifetime table (≤ the day span, a few hundred rows), so
    * the descending at-risk window is driver-trivial by construction
    * (q159's argument); per-row expectations and variances are pinned
    * to nano-unit integers BEFORE the final sum, so the reduce is
    * exact-integer and order-free. Output is one row.
    */
  private val q402 = QueryDef(
    "q402_logrank_test",
    (s, dir) => {
      val lt = ev(s, dir).groupBy(col("user_id"))
        .agg(min(col("ts").cast("date")).as("d0"),
          max(col("ts").cast("date")).as("d1"))
        .select(pmod(col("user_id"), lit(2L)).as("grp"),
          datediff(col("d1"), col("d0")).cast("long").as("t"))
      val d = lt.groupBy(col("t")).agg(
        sum(when(col("grp") === 0, 1L).otherwise(0L)).as("d_a"),
        sum(when(col("grp") === 1, 1L).otherwise(0L)).as("d_b"))
      val w = Window.orderBy(col("t").desc)
      val tab = d
        .withColumn("n_a", sum(col("d_a")).over(w))
        .withColumn("n_b", sum(col("d_b")).over(w))
        .select(col("d_a"),
          (col("d_a") + col("d_b")).as("d"),
          (col("n_a") + col("n_b")).as("n"), col("n_a"), col("n_b"))
        .select(col("d_a"),
          expr("""CAST(round(CAST(d AS DOUBLE) * n_a / n * 1e9)
            AS BIGINT)""").as("e_a_nano"),
          expr("""CAST(round(CASE WHEN n > 1 THEN
              CAST(d AS DOUBLE) * n_a / n * n_b / n * (n - d) / (n - 1)
            ELSE 0.0 END * 1e9) AS BIGINT)""").as("v_nano"))
      val mom = tab.agg(sum(col("d_a")).as("o_a"),
        sum(col("e_a_nano")).as("se"), sum(col("v_nano")).as("sv"))
      val nTot = lt.agg(count(lit(1)).as("n_users"))
      mom.crossJoin(broadcast(nTot))
        .select(col("n_users"), col("o_a"),
          round(col("se").cast("double") / 1e9, 6).as("e_a"),
          round((col("o_a").cast("double") - col("se").cast("double")
            / 1e9) / expr("sqrt(CAST(sv AS DOUBLE) / 1e9)"), 9)
            .as("z"))
        .select(col("n_users"), col("o_a"), col("e_a"), col("z"),
          round(expr("2.0 * " + graft.ops.Portable.normCdfUpper(
            "abs(z)")), 9).as("p_value"))
    },
    Some(s"""WITH lt AS (SELECT user_id % 2 AS grp,
          date_diff('day', min(ts)::DATE, max(ts)::DATE) AS t
        FROM events GROUP BY user_id),
      d AS (SELECT t,
          sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END)::BIGINT AS d_a,
          sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END)::BIGINT AS d_b
        FROM lt GROUP BY 1),
      ar AS (SELECT d_a, d_a + d_b AS d,
          sum(d_a + d_b) OVER (ORDER BY t DESC)::BIGINT AS n,
          sum(d_a) OVER (ORDER BY t DESC)::BIGINT AS n_a,
          sum(d_b) OVER (ORDER BY t DESC)::BIGINT AS n_b
        FROM d),
      pin AS (SELECT d_a,
          round(d::DOUBLE * n_a / n * 1e9)::BIGINT AS e_a_nano,
          round(CASE WHEN n > 1 THEN
              d::DOUBLE * n_a / n * n_b / n * (n - d) / (n - 1)
            ELSE 0.0 END * 1e9)::BIGINT AS v_nano
        FROM ar),
      mom AS (SELECT sum(d_a)::BIGINT AS o_a, sum(e_a_nano)::BIGINT AS se,
          sum(v_nano)::BIGINT AS sv FROM pin),
      nt AS (SELECT count(*)::BIGINT AS n_users FROM lt),
      zz AS (SELECT n_users, o_a, round(se::DOUBLE / 1e9, 6) AS e_a,
          round((o_a::DOUBLE - se::DOUBLE / 1e9)
            / sqrt(sv::DOUBLE / 1e9), 9) AS z
        FROM mom, nt)
      SELECT n_users, o_a, e_a, z,
        round(2.0 * ${graft.ops.Portable.normCdfUpper("abs(z)")}, 9)
          AS p_value
      FROM zz"""))

  // ---------- q405: Dickey–Fuller unit-root test -----------------------

  /** Dickey–Fuller unit-root regression Δc_t = α + ρ·c_{t−1} + ε over
    * the daily event-count series, reporting ρ̂ and its t statistic
    * against the constant-only 5 % critical value (−2.86) — the
    * stationarity screen that decides whether q334's trend test and
    * q142's autocorrelations are even well-posed (a unit root makes
    * both spurious), and the missing member of the time-series-health
    * family (q334 monotone trend, q390 residual autocorrelation, q335
    * long-memory). Only CONSECUTIVE observed-day pairs enter (the lag
    * join is on day−1; q322's documented gap convention, stated here
    * as "gaps drop the pair"). All five regression moments are exact
    * integer/DECIMAL sums from one bounded daily table (≤ the day
    * span); slope, intercept, RSS, and the t statistic are closed-form
    * doubles computed once from exact sums. Output is one row.
    */
  private val q405 = QueryDef(
    "q405_df_unit_root",
    (s, dir) => {
      val daily = ev(s, dir)
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("c"))
      val pairsD = daily.alias("t")
        .join(daily.alias("p"), col("t.day") === col("p.day") + 1)
        .select((col("t.c") - col("p.c")).as("dy"),
          col("p.c").as("yl"))
      val m = pairsD.agg(count(lit(1)).as("n"), sum(col("yl")).as("sx"),
        sum(col("dy")).as("sy"),
        sum((col("yl") * col("yl")).cast(DecimalType(38, 0))).as("sxx"),
        sum((col("yl") * col("dy")).cast(DecimalType(38, 0))).as("sxy"),
        sum((col("dy") * col("dy")).cast(DecimalType(38, 0))).as("syy"))
      m.select(col("n"),
          ((col("n").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
            / (col("n").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double")))
            .as("rho"),
          col("sx"), col("sy"), col("sxx"), col("sxy"), col("syy"))
        .select(col("n"), col("rho"),
          ((col("sy").cast("double") - col("rho")
            * col("sx").cast("double")) / col("n")).as("alpha"),
          col("sxx"), col("sxy"), col("syy"), col("sx"), col("sy"))
        .select(col("n"), col("rho"), col("alpha"),
          (col("syy").cast("double") - col("alpha")
            * col("sy").cast("double") - col("rho")
            * col("sxy").cast("double")).as("rss"),
          (col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double"))
            .as("dxx"))
        .select(col("n"), round(col("rho"), 12).as("rho"),
          round(col("alpha"), 9).as("alpha"),
          round((col("rho") / expr("""sqrt(rss / (n - 2)
            * CAST(n AS DOUBLE) / dxx)""")).as("t_df"), 9).as("t_df"))
        .select(col("n"), col("rho"), col("alpha"), col("t_df"),
          expr("CASE WHEN t_df < -2.86 THEN 'stationary' " +
            "ELSE 'unit_root' END").as("verdict"))
    },
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          count(*)::BIGINT AS c
        FROM events GROUP BY 1),
      pr AS (SELECT t.c - p.c AS dy, p.c AS yl
        FROM daily t JOIN daily p ON t.day = p.day + 1),
      m AS (SELECT count(*)::BIGINT AS n, sum(yl)::BIGINT AS sx,
          sum(dy)::BIGINT AS sy, sum(yl::HUGEINT * yl) AS sxx,
          sum(yl::HUGEINT * dy) AS sxy, sum(dy::HUGEINT * dy) AS syy
        FROM pr),
      b AS (SELECT n,
          (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
            / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
            AS rho, sx, sy, sxx, sxy, syy
        FROM m),
      b2 AS (SELECT n, rho,
          (sy::DOUBLE - rho * sx::DOUBLE) / n AS alpha,
          sxx, sxy, syy, sx, sy
        FROM b),
      f AS (SELECT n, rho, alpha,
          syy::DOUBLE - alpha * sy::DOUBLE - rho * sxy::DOUBLE AS rss,
          n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS dxx
        FROM b2),
      z AS (SELECT n, round(rho, 12) AS rho, round(alpha, 9) AS alpha,
          round(rho / sqrt(rss / (n - 2) * n::DOUBLE / dxx), 9)
            AS t_df
        FROM f)
      SELECT n, rho, alpha, t_df,
        CASE WHEN t_df < -2.86 THEN 'stationary' ELSE 'unit_root' END
          AS verdict
      FROM z"""))

  // ---------- q479: incremental sessionization merge -------------------

  /** Session-state maintenance across an ingest boundary — the batch
    * form of what `mapGroupsWithState` keeps live in the streaming
    * twin family: events split at a TIME watermark (cut = min +
    * 4/5·range, integer-µs arithmetic — the shape the ETL layer's
    * incremental scan produces), the STANDING window is sessionized
    * once, the arriving window is sessionized alone, and the only
    * cross-boundary work is one per-user comparison: a user's first
    * batch event within the session gap of their last standing event
    * FUSES the two edge sessions (q27's strict-> rule, so fuse is
    * <= gap). The gap here is 6 h — the daily-activity session
    * definition (q24's window width), chosen so the fixture actually
    * exercises the fuse path (16 spanned users at sf0.01; a 30-min
    * gap never spans the cut on this corpus and would gate nothing). Sessions merged incrementally = standing + batch −
    * fused, and the query carries the full-recompute count beside it:
    * `merge_equals_full` is the q70 merge≡recompute contract for
    * session state. The identity is exact because the time split
    * makes every standing event of a user precede every batch event —
    * per user, only the edge pair can interact. Shape: three
    * user-partitioned window passes (standing, batch, full-audit) +
    * one per-user boundary aggregate; 1-row output.
    */
  private val q479 = QueryDef(
    "q479_ingest_session_merge",
    (s, dir) => {
      val GapUs = 21600000000L
      val evu = ev(s, dir).select(col("user_id"), col("event_id"),
        expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)").as("us"))
      val mm = evu.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
      val cut = evu.crossJoin(broadcast(mm))
        .withColumn("isb",
          (col("us") >= col("lo") + expr("(hi - lo) * 4 div 5"))
            .cast("long"))
        .select(col("user_id"), col("event_id"), col("us"), col("isb"))
      val w = Window.partitionBy(col("user_id"), col("isb"))
        .orderBy(col("us"), col("event_id"))
      val sides = cut
        .withColumn("prev", lag(col("us"), 1).over(w))
        .withColumn("is_new", when(col("prev").isNull
          || col("us") - col("prev") > GapUs, 1L).otherwise(0L))
      val nSide = sides.groupBy(col("isb"))
        .agg(sum(col("is_new")).as("n"))
      val nStanding = nSide.where(col("isb") === 0)
        .select(col("n").as("n_standing"))
      val nBatch = nSide.where(col("isb") === 1)
        .select(col("n").as("n_batch"))
      val edges = cut.groupBy(col("user_id"))
        .agg(max(when(col("isb") === 0, col("us"))).as("last_old"),
          min(when(col("isb") === 1, col("us"))).as("first_new"))
        .where(col("last_old").isNotNull && col("first_new").isNotNull
          && col("first_new") - col("last_old") <= GapUs)
      val nSpanned = edges.agg(
        count(lit(1)).as("n_spanned"))
      val wf = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val nFull = cut
        .withColumn("prev", lag(col("us"), 1).over(wf))
        .withColumn("is_new", when(col("prev").isNull
          || col("us") - col("prev") > GapUs, 1L).otherwise(0L))
        .agg(sum(col("is_new")).as("n_full"))
      nStanding.crossJoin(nBatch).crossJoin(nSpanned).crossJoin(nFull)
        .select(col("n_standing"), col("n_batch"), col("n_spanned"),
          (col("n_standing") + col("n_batch") - col("n_spanned"))
            .as("n_incremental"),
          col("n_full"),
          (col("n_standing") + col("n_batch") - col("n_spanned")
            === col("n_full")).as("merge_equals_full"))
    },
    Some("""WITH evu AS (SELECT user_id, event_id, epoch_us(ts) AS us
        FROM events),
      mm AS (SELECT min(us) AS lo, max(us) AS hi FROM evu),
      cut AS (SELECT user_id, event_id, us,
          CASE WHEN us >= lo + (hi - lo) * 4 // 5 THEN 1 ELSE 0 END
            AS isb
        FROM evu, mm),
      sides AS (SELECT isb, CASE WHEN lag(us) OVER w IS NULL
            OR us - lag(us) OVER w > 21600000000 THEN 1 ELSE 0 END
            AS is_new
        FROM cut
        WINDOW w AS (PARTITION BY user_id, isb ORDER BY us, event_id)),
      ns AS (SELECT sum(CASE WHEN isb = 0 THEN is_new ELSE 0 END)::BIGINT
            AS n_standing,
          sum(CASE WHEN isb = 1 THEN is_new ELSE 0 END)::BIGINT
            AS n_batch
        FROM sides),
      sp AS (SELECT count(*)::BIGINT AS n_spanned FROM (
          SELECT user_id,
            max(CASE WHEN isb = 0 THEN us END) AS last_old,
            min(CASE WHEN isb = 1 THEN us END) AS first_new
          FROM cut GROUP BY user_id)
        WHERE last_old IS NOT NULL AND first_new IS NOT NULL
          AND first_new - last_old <= 21600000000),
      fl AS (SELECT CASE WHEN lag(us) OVER wf IS NULL
            OR us - lag(us) OVER wf > 21600000000 THEN 1 ELSE 0 END
            AS is_new
        FROM cut
        WINDOW wf AS (PARTITION BY user_id ORDER BY us, event_id)),
      nf AS (SELECT sum(is_new)::BIGINT AS n_full FROM fl)
      SELECT n_standing, n_batch, n_spanned,
        (n_standing + n_batch - n_spanned)::BIGINT AS n_incremental,
        n_full,
        (n_standing + n_batch - n_spanned = n_full) AS merge_equals_full
      FROM ns, sp, nf"""))

  // ---------- q493: SCD2 interval build ---------------------------------

  /** Slowly-changing-dimension type-2 history from an event log — the
    * warehouse-side transform the reference's snapshot export feeds:
    * each change of a user's event_type (ordered by ts, event_id)
    * opens a validity interval; the next change closes it; the last
    * interval per user stays open (valid_to NULL — the current
    * state). Reported per state (event_type): interval counts,
    * open-interval count, and closed-interval duration stats — the
    * dwell-time profile of each state. Shape: one lag window
    * (partitioned by user_id — never a global sort) marks change
    * rows, a second lead window over ONLY the change rows (a small
    * fraction of the log) closes intervals; both windows reuse the
    * same per-user sort. At 100 TB this is the standard two-window
    * gaps-and-islands pass: one shuffle on user_id, durations in
    * exact int64 microseconds, |states|-row output.
    */
  private val q493 = QueryDef(
    "q493_scd2_intervals",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val starts = ev(s, dir)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .where(col("prev_type").isNull
          || col("prev_type") =!= col("event_type"))
      val closed = starts
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("event_type"),
          expr("timestampdiff(MICROSECOND, ts, valid_to)").as("dur_us"))
      closed.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(when(col("dur_us").isNull, 1L).otherwise(0L)).as("n_open"),
          sum(col("dur_us")).as("sum_dur_us"),
          max(col("dur_us")).as("max_dur_us"))
        .select(col("event_type"), col("n_intervals"), col("n_open"),
          (col("n_intervals") - col("n_open")).as("n_closed"),
          round(col("sum_dur_us").cast("double")
            / (col("n_intervals") - col("n_open")) / 1e6, 6)
            .as("avg_dur_sec"),
          col("max_dur_us"))
        .orderBy("event_type")
    },
    Some("""WITH marked AS (SELECT user_id, event_id, ts, event_type,
          lag(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS prev_type
        FROM events),
      starts AS (SELECT user_id, event_id, ts, event_type FROM marked
        WHERE prev_type IS NULL OR prev_type <> event_type),
      closed AS (SELECT event_type,
          epoch_us(lead(ts) OVER (PARTITION BY user_id
            ORDER BY ts, event_id)) - epoch_us(ts) AS dur_us
        FROM starts),
      agg AS (SELECT event_type, count(*)::BIGINT AS n_intervals,
          sum(CASE WHEN dur_us IS NULL THEN 1 ELSE 0 END)::BIGINT
            AS n_open,
          sum(dur_us)::BIGINT AS sum_dur_us,
          max(dur_us)::BIGINT AS max_dur_us
        FROM closed GROUP BY 1)
      SELECT event_type, n_intervals, n_open,
        (n_intervals - n_open)::BIGINT AS n_closed,
        round(sum_dur_us::DOUBLE / (n_intervals - n_open) / 1e6, 6)
          AS avg_dur_sec,
        max_dur_us
      FROM agg ORDER BY event_type"""))

  // ---------- q494: watermark-lateness audit -----------------------------

  /** Event-time disorder audit — the measurement that SETS a streaming
    * watermark delay instead of guessing it: within each user's
    * ARRIVAL order, an event is LATE iff some earlier-arriving event
    * carries a later event time; its lateness is the gap to the
    * running event-time maximum. The fixture's event_id sequence is
    * already time-sorted per user (zero disorder — a synthetic-data
    * artifact no production ingest enjoys), so arrival is modeled by
    * [[Portable.arrivalSeqSpark]]: a 5 % hash-chosen late tail
    * displaced 50 slots, everything else in order — the bounded
    * disorder real queues exhibit.
    * Per event_type: late share, the lateness histogram at the
    * operationally interesting cuts (≤ 1 min, ≤ 1 h, > 1 h), and
    * the max — read directly as "a 1-minute watermark delay loses
    * X % of rows, an hour loses Y %". Shape: one running-max window
    * per user (rowsBetween to 1 PRECEDING, partitioned — no global
    * sort), one grouped pass of conditional sums; exact int64
    * microseconds end to end. |event_types|-row output.
    */
  private val q494 = QueryDef(
    "q494_watermark_lateness",
    (s, dir) => {
      val arr = Portable.arrivalSeqSpark
      val w = Window.partitionBy(col("user_id"))
        .orderBy(expr(arr), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val late = ev(s, dir)
        .withColumn("hwm", max(col("ts")).over(w))
        .select(col("event_type"),
          greatest(lit(0L),
            coalesce(expr("timestampdiff(MICROSECOND, ts, hwm)"),
              lit(0L))).as("late_us"))
      late.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("late_us") > 0L, 1L).otherwise(0L)).as("n_late"),
          sum(when(col("late_us") > 0L
            && col("late_us") <= 60000000L, 1L).otherwise(0L))
            .as("n_late_1m"),
          sum(when(col("late_us") > 60000000L
            && col("late_us") <= 3600000000L, 1L).otherwise(0L))
            .as("n_late_1h"),
          sum(when(col("late_us") > 3600000000L, 1L).otherwise(0L))
            .as("n_late_over_1h"),
          max(col("late_us")).as("max_late_us"))
        .select(col("event_type"), col("n_events"), col("n_late"),
          round(col("n_late").cast("double") / col("n_events"), 9)
            .as("late_share"),
          col("n_late_1m"), col("n_late_1h"), col("n_late_over_1h"),
          col("max_late_us"))
        .orderBy("event_type")
    },
    Some(s"""WITH hw AS (SELECT event_type,
          greatest(0, coalesce(
            epoch_us(max(ts) OVER (PARTITION BY user_id
              ORDER BY ${Portable.arrivalSeqDuck}, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
            - epoch_us(ts), 0))::BIGINT AS late_us
        FROM events)
      SELECT event_type, count(*)::BIGINT AS n_events,
        sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END)::BIGINT AS n_late,
        round(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END)::DOUBLE
          / count(*), 9) AS late_share,
        sum(CASE WHEN late_us > 0 AND late_us <= 60000000
          THEN 1 ELSE 0 END)::BIGINT AS n_late_1m,
        sum(CASE WHEN late_us > 60000000 AND late_us <= 3600000000
          THEN 1 ELSE 0 END)::BIGINT AS n_late_1h,
        sum(CASE WHEN late_us > 3600000000 THEN 1 ELSE 0 END)::BIGINT
          AS n_late_over_1h,
        max(late_us)::BIGINT AS max_late_us
      FROM hw GROUP BY event_type ORDER BY event_type"""))

  // ---------- q510: native as-of join (attribution with tolerance) -----

  /** Click→purchase attribution through the library's NATIVE as-of join
    * operator (graft.plans.AsOfJoin → AsOfJoinExec, injected planner
    * strategy): every purchase left-outer as-of joined to the same
    * user's latest click at-or-before it, attributed only when the
    * click is within a 7-day window (tolerance), else null-extended.
    *
    * vs q25 (the union+window composition of plain as-of): this gated
    * path exercises the whole-operator rung — co-partitioned sorted
    * merge, one buffered right row per partition, tolerance and outer
    * semantics inside the exec. The oracle is DuckDB's native
    * ASOF LEFT JOIN (an independent implementation) with the tolerance
    * as a post-CASE — equivalent because as-of picks the single
    * greatest click ≤ ts, so "outside window" and "no match" coincide.
    * Scale: two key-clustered shuffles (the SortMergeJoin contract),
    * merge O(1) memory; no band constant, no candidate duplication.
    */
  private val q510 = QueryDef(
    "q510_asof_attribution",
    (s, dir) => {
      val e = ev(s, dir)
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
          col("event_id").as("c_event_id"))
      val week = 7L * 86400L * 1000000L
      // both sides are fact-scale at 100 TB: pin the merge exec (the
      // broadcast auto-pick would fire at test SF only — q382's
      // merge-pinning convention)
      graft.plans.AsOf.asofJoin(purchases, clicks,
        Seq("user_id"), Seq("c_user_id"), "ts", "click_ts",
        rightTieBreak = Seq("c_event_id"),
        toleranceUs = Some(week), leftOuter = true, broadcast = Some(false))
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts"), col("click_ts"),
          expr("timestampdiff(MICROSECOND, click_ts, ts)").as("latency_us"))
        .orderBy("purchase_id")
    },
    Some("""SELECT p.event_id AS purchase_id, p.user_id, p.ts,
      CASE WHEN c.ts >= p.ts - INTERVAL 7 DAY THEN c.ts END AS click_ts,
      CASE WHEN c.ts >= p.ts - INTERVAL 7 DAY
        THEN epoch_us(p.ts) - epoch_us(c.ts) END AS latency_us
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY purchase_id"""))

  // ---------- q512: point-in-time dimension lookup (native as-of) ------

  /** The canonical as-of use: fact rows enriched with a slowly-changing
    * dimension's state AS OF each fact's own time. Facts = purchases;
    * dimension stream = every other event of the same user (its
    * event_type is the user's "state"); each purchase picks the
    * greatest state change ≤ its timestamp via the native AsOfJoinExec,
    * left-outer so first-touch purchases survive with null state.
    *
    * vs q251 (one fixed AS-OF instant for all users, an argmax
    * aggregate): here every fact row has its OWN as-of instant, which
    * is exactly the case composition can't do with one aggregate — and
    * where the union+window trick (q25) must null-pad and carry both
    * sides' payloads through one window. The native exec keeps each
    * side's columns in its own shuffle and merges sorted runs.
    * (user_id, ts) is unique in the fixture at every sf (verified
    * 0.001/0.01/0.1), and event_id tie-breaks defensively, so emitting
    * the matched row's type/time is deterministic. Oracle: DuckDB's
    * native ASOF LEFT JOIN.
    *
    * Strategy: left on AUTO (no pin) — the dimension side fits under
    * the broadcast threshold at every gate SF, so AsOfJoinStrategy
    * plans BroadcastAsOfJoinExec and the fact side never shuffles or
    * sorts (zero fact-side exchanges, the BroadcastHashJoin analogue).
    * At 100 TB this dimension is fact-scale and the same stats pick
    * flips to the merge exec — the adaptive behavior is the point of
    * this gate entry; hash is identical under both execs
    * (BroadcastAsOfJoinSpec proves exec equality on the full matrix).
    */
  private val q512 = QueryDef(
    "q512_asof_state_lookup",
    (s, dir) => {
      val e = ev(s, dir)
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val dim = e.where(col("event_type") =!= "purchase")
        .select(col("user_id").as("d_user_id"), col("ts").as("state_ts"),
          col("event_type").as("state"), col("event_id").as("d_event_id"))
      graft.plans.AsOf.asofJoin(purchases, dim,
        Seq("user_id"), Seq("d_user_id"), "ts", "state_ts",
        rightTieBreak = Seq("d_event_id"), leftOuter = true)
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts"), col("state"), col("state_ts"),
          expr("timestampdiff(MICROSECOND, state_ts, ts)").as("state_age_us"))
        .orderBy("purchase_id")
    },
    Some("""SELECT p.event_id AS purchase_id, p.user_id, p.ts,
      d.event_type AS state, d.ts AS state_ts,
      epoch_us(p.ts) - epoch_us(d.ts) AS state_age_us
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type <> 'purchase') d
      ON p.user_id = d.user_id AND p.ts >= d.ts
      ORDER BY purchase_id"""))

  // ---------- q513: conversion labels (forward as-of) ------------------

  /** Training-label generation by FORWARD as-of join: for every click,
    * the same user's NEXT purchase (smallest purchase ts ≥ click ts)
    * within a 7-day attribution window — label = converted, plus the
    * click→purchase lag. The forward direction is the one the
    * union+window trick cannot do in the same pass as backward (it
    * needs a reversed sort), and is AsOfJoinExec's peek-don't-consume
    * path: one purchase row can label MANY preceding clicks. Oracle:
    * DuckDB ASOF LEFT JOIN with the reversed inequality (c.ts ≤ p.ts),
    * tolerance as a post-CASE (equivalent because forward as-of picks
    * the single smallest ≥, so "beyond window" and "no match"
    * coincide). Scale: the q510 contract — two key-clustered shuffles,
    * O(1) merge memory.
    */
  private val q513 = QueryDef(
    "q513_asof_conversion",
    (s, dir) => {
      val e = ev(s, dir)
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user_id"), col("ts").as("conv_ts"),
          col("event_id").as("p_event_id"))
      val week = 7L * 86400L * 1000000L
      // fact-scale × fact-scale: merge exec pinned (q510's convention)
      graft.plans.AsOf.asofJoin(clicks, purchases,
        Seq("user_id"), Seq("p_user_id"), "ts", "conv_ts",
        rightTieBreak = Seq("p_event_id"),
        toleranceUs = Some(week), leftOuter = true, forward = true,
        broadcast = Some(false))
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts"), col("conv_ts"),
          expr("timestampdiff(MICROSECOND, ts, conv_ts)").as("conv_lag_us"),
          col("conv_ts").isNotNull.as("converted"))
        .orderBy("click_id")
    },
    Some("""SELECT c.event_id AS click_id, c.user_id, c.ts,
      CASE WHEN p.ts <= c.ts + INTERVAL 7 DAY THEN p.ts END AS conv_ts,
      CASE WHEN p.ts <= c.ts + INTERVAL 7 DAY
        THEN epoch_us(p.ts) - epoch_us(c.ts) END AS conv_lag_us,
      CASE WHEN p.ts <= c.ts + INTERVAL 7 DAY
        THEN TRUE ELSE FALSE END AS converted
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts <= p.ts
      ORDER BY click_id"""))

  // ---------- q514: time-to-next-error survival features ----------------

  /** Survival-analysis features by FORWARD as-of join: for every
    * non-error event, the same user's NEXT error (smallest error ts ≥
    * event ts, unbounded window), aggregated per event type — exposure
    * count, observed-failure count (the rest are right-censored), mean
    * and max time-to-failure. The feature a reliability model trains
    * on, and the aggregate consumer shape for AsOfJoinExec's forward
    * path: one error row labels MANY preceding events (peek, never
    * consume). (user_id, ts) is unique at every sf, so matches are
    * deterministic; mean stays portable via exact int64 lag sums
    * divided once at the end. Oracle: DuckDB forward ASOF LEFT JOIN +
    * the same aggregate.
    */
  private val q514 = QueryDef(
    "q514_time_to_error",
    (s, dir) => {
      val e = ev(s, dir)
      val exposed = e.where(col("event_type") =!= "error")
        .select(col("user_id"), col("ts"), col("event_type"),
          col("event_id"))
      val errors = e.where(col("event_type") === "error")
        .select(col("user_id").as("x_user_id"), col("ts").as("err_ts"),
          col("event_id").as("x_event_id"))
      // fact-scale × fact-scale: merge exec pinned (q510's convention)
      graft.plans.AsOf.asofJoin(exposed, errors,
        Seq("user_id"), Seq("x_user_id"), "ts", "err_ts",
        rightTieBreak = Seq("x_event_id"), leftOuter = true, forward = true,
        broadcast = Some(false))
        .select(col("event_type"),
          expr("timestampdiff(MICROSECOND, ts, err_ts)").as("lag_us"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_exposed"),
          count(col("lag_us")).as("n_observed"),
          (count(lit(1)) - count(col("lag_us"))).as("n_censored"),
          round(sum(col("lag_us")).cast("double")
            / count(col("lag_us")), 9).as("mean_lag_us"),
          max(col("lag_us")).as("max_lag_us"))
        .orderBy("event_type")
    },
    Some("""SELECT e.event_type, count(*)::BIGINT AS n_exposed,
      count(x.ts)::BIGINT AS n_observed,
      (count(*) - count(x.ts))::BIGINT AS n_censored,
      round(sum(epoch_us(x.ts) - epoch_us(e.ts))::DOUBLE
        / count(x.ts), 9) AS mean_lag_us,
      max(epoch_us(x.ts) - epoch_us(e.ts))::BIGINT AS max_lag_us
      FROM (SELECT * FROM events WHERE event_type <> 'error') e
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') x
      ON e.user_id = x.user_id AND e.ts <= x.ts
      GROUP BY e.event_type ORDER BY e.event_type"""))

  // ---------- q516: session bracketing (composed as-ofs) ----------------

  /** Each purchase bracketed by the user's LAST signup before it
    * (backward as-of) and NEXT error after it (forward as-of) — two
    * native as-of joins composed in one plan. The composition is the
    * point: AsOfJoinExec declares `outputPartitioning = left's` and
    * `outputOrdering = left's`, so the second join sees its left side
    * already hash-clustered on user_id and sorted by (user_id, ts) and
    * plans NO new exchange or sort for it — three exchanges total for
    * three base relations (asserted by AsOfJoinSpec), exactly how
    * SortMergeJoin chains reuse layout. Oracle: two chained DuckDB
    * ASOF LEFT JOINs with opposite inequalities.
    */
  private val q516 = QueryDef(
    "q516_asof_bracketing",
    (s, dir) => {
      val e = ev(s, dir)
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val signups = e.where(col("event_type") === "signup")
        .select(col("user_id").as("s_user_id"), col("ts").as("signup_ts"),
          col("event_id").as("s_event_id"))
      val errors = e.where(col("event_type") === "error")
        .select(col("user_id").as("x_user_id"), col("ts").as("err_ts"),
          col("event_id").as("x_event_id"))
      // merge exec pinned on BOTH joins: the composed layout-reuse
      // shape (3 exchanges for 3 relations) is the thing under test
      val back = graft.plans.AsOf.asofJoin(purchases, signups,
        Seq("user_id"), Seq("s_user_id"), "ts", "signup_ts",
        rightTieBreak = Seq("s_event_id"), leftOuter = true,
        broadcast = Some(false))
      graft.plans.AsOf.asofJoin(back, errors,
        Seq("user_id"), Seq("x_user_id"), "ts", "err_ts",
        rightTieBreak = Seq("x_event_id"), leftOuter = true, forward = true,
        broadcast = Some(false))
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts"), col("signup_ts"), col("err_ts"),
          expr("CASE WHEN signup_ts IS NOT NULL AND err_ts IS NOT NULL " +
            "THEN timestampdiff(MICROSECOND, signup_ts, err_ts) END")
            .as("bracket_us"))
        .orderBy("purchase_id")
    },
    Some("""SELECT p.event_id AS purchase_id, p.user_id, p.ts,
      s.ts AS signup_ts, x.ts AS err_ts,
      CASE WHEN s.ts IS NOT NULL AND x.ts IS NOT NULL
        THEN epoch_us(x.ts) - epoch_us(s.ts) END AS bracket_us
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        ON p.user_id = s.user_id AND p.ts >= s.ts
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') x
        ON p.user_id = x.user_id AND p.ts <= x.ts
      ORDER BY purchase_id"""))

  // ---------- q518: nearest-event alignment (composed as-ofs) -----------

  /** merge_asof direction='nearest', composed: for every click the
    * CLOSEST purchase by the same user in EITHER direction — backward
    * and forward native as-ofs chained (the second reuses the first's
    * clustering and order, q516's proven 3-exchange shape), then a
    * projection picks the nearer side (ties prefer the past, the
    * pandas convention). Signed lag: negative = purchase preceded the
    * click. The stream-alignment primitive for joining two
    * irregularly-sampled series. Oracle: two chained DuckDB ASOF LEFT
    * JOINs with opposite inequalities + the same CASE.
    */
  private val q518 = QueryDef(
    "q518_asof_nearest",
    (s, dir) => {
      val e = ev(s, dir)
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val pB = e.where(col("event_type") === "purchase")
        .select(col("user_id").as("b_user_id"), col("ts").as("b_ts"),
          col("event_id").as("b_event_id"))
      val pF = e.where(col("event_type") === "purchase")
        .select(col("user_id").as("f_user_id"), col("ts").as("f_ts"),
          col("event_id").as("f_event_id"))
      // merge exec pinned (fact-scale sides; composed layout reuse)
      val back = graft.plans.AsOf.asofJoin(clicks, pB,
        Seq("user_id"), Seq("b_user_id"), "ts", "b_ts",
        rightTieBreak = Seq("b_event_id"), leftOuter = true,
        broadcast = Some(false))
      graft.plans.AsOf.asofJoin(back, pF,
        Seq("user_id"), Seq("f_user_id"), "ts", "f_ts",
        rightTieBreak = Seq("f_event_id"), leftOuter = true, forward = true,
        broadcast = Some(false))
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"),
          expr("""CASE
            WHEN b_ts IS NULL THEN f_ts
            WHEN f_ts IS NULL THEN b_ts
            WHEN timestampdiff(MICROSECOND, b_ts, ts)
              <= timestampdiff(MICROSECOND, ts, f_ts) THEN b_ts
            ELSE f_ts END""").as("nearest_ts"))
        .withColumn("signed_lag_us",
          expr("timestampdiff(MICROSECOND, ts, nearest_ts)"))
        .orderBy("click_id")
    },
    Some("""SELECT c.event_id AS click_id, c.user_id, c.ts,
      CASE
        WHEN b.ts IS NULL THEN f.ts
        WHEN f.ts IS NULL THEN b.ts
        WHEN epoch_us(c.ts) - epoch_us(b.ts)
          <= epoch_us(f.ts) - epoch_us(c.ts) THEN b.ts
        ELSE f.ts END AS nearest_ts,
      epoch_us(CASE
        WHEN b.ts IS NULL THEN f.ts
        WHEN f.ts IS NULL THEN b.ts
        WHEN epoch_us(c.ts) - epoch_us(b.ts)
          <= epoch_us(f.ts) - epoch_us(c.ts) THEN b.ts
        ELSE f.ts END) - epoch_us(c.ts) AS signed_lag_us
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
        ON c.user_id = b.user_id AND c.ts >= b.ts
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') f
        ON c.user_id = f.user_id AND c.ts <= f.ts
      ORDER BY click_id"""))

  // ---------- q520: as-of join through the SQL-text surface ------------

  /** q512's point-in-time lookup expressed ENTIRELY in SQL text through
    * the `graft_asof_join` table-valued function (plans/AsOfSqlSurface,
    * injectTableFunction + a resolution rule) — the surface the
    * reference's SQL-driven consumers would call. Same relations, same
    * semantics, same ORACLE SQL shape as q512 (hash equality between
    * the two gate entries is the point: the SQL form lowers to the
    * identical AsOfJoin node, then the identical strategy pick —
    * broadcast at gate SFs, merge at scale). AsOfSqlSpec proves
    * form-equality and option handling; this entry gates it end-to-end
    * against DuckDB.
    */
  private val q520 = QueryDef(
    "q520_asof_sql_surface",
    (s, dir) => {
      val e = ev(s, dir)
      // Unique per-call view names, dropped once the plan is analyzed
      // (spark.sql analyzes eagerly, binding the view plans into the
      // returned DataFrame) — so a gated query leaves no catalog state
      // behind and concurrent executions in one session cannot race on
      // the names.
      val tag = java.util.UUID.randomUUID().toString.replace("-", "")
      val factsView = s"q520_facts_$tag"
      val dimView = s"q520_dim_$tag"
      e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
        .createOrReplaceTempView(factsView)
      e.where(col("event_type") =!= "purchase")
        .select(col("user_id").as("d_user_id"), col("ts").as("state_ts"),
          col("event_type").as("state"), col("event_id").as("d_event_id"))
        .createOrReplaceTempView(dimView)
      try s.sql(s"""
        SELECT event_id AS purchase_id, user_id, ts, state, state_ts,
          timestampdiff(MICROSECOND, state_ts, ts) AS state_age_us
        FROM graft_asof_join(
          '$factsView', '$dimView',
          'user_id', 'd_user_id', 'ts', 'state_ts', 'd_event_id', 'outer')
        ORDER BY purchase_id""")
      finally {
        s.catalog.dropTempView(factsView): Unit
        s.catalog.dropTempView(dimView): Unit
      }
    },
    Some("""SELECT p.event_id AS purchase_id, p.user_id, p.ts,
      d.event_type AS state, d.ts AS state_ts,
      epoch_us(p.ts) - epoch_us(d.ts) AS state_age_us
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type <> 'purchase') d
      ON p.user_id = d.user_id AND p.ts >= d.ts
      ORDER BY purchase_id"""))

  // ---------- q523: salted as-of join (hot-key mitigation, gated) -------

  /** The big-big skew mitigation path of the native as-of join, gated
    * for semantics: purchases enriched with the same user's latest
    * VIEW event ≤ ts via `AsOf.asofJoinSalted` (salts = 8) — the left
    * side hash-salted into 8 buckets, the right side replicated to all
    * salts so every bucket sees its key's FULL right run, which is
    * what makes salting SAFE for as-of in every mode (unlike equi-join
    * salting, which may split the right side). Salting is semantics-
    * invisible: the oracle is the plain DuckDB ASOF LEFT JOIN with no
    * notion of salt. Use when one hot key (one user with 10⁸ events)
    * would serialize a merge partition and the right side is too big
    * to broadcast — measured in BenchAsOf (skew_salted vs skew_merge);
    * AQE's OptimizeSkewedJoin does not rewrite custom execs, so this
    * and the broadcast exec are the two documented mitigations.
    */
  private val q523 = QueryDef(
    "q523_asof_salted_views",
    (s, dir) => {
      val e = ev(s, dir)
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val views = e.where(col("event_type") === "view")
        .select(col("user_id").as("v_user_id"), col("ts").as("view_ts"),
          col("event_id").as("v_event_id"))
      graft.plans.AsOf.asofJoinSalted(purchases, views,
        Seq("user_id"), Seq("v_user_id"), "ts", "view_ts",
        rightTieBreak = Seq("v_event_id"), leftOuter = true, salts = 8)
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts"), col("view_ts"),
          expr("timestampdiff(MICROSECOND, view_ts, ts)").as("dwell_us"))
        .orderBy("purchase_id")
    },
    Some("""SELECT p.event_id AS purchase_id, p.user_id, p.ts,
      v.ts AS view_ts,
      epoch_us(p.ts) - epoch_us(v.ts) AS dwell_us
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
      ORDER BY purchase_id"""))

  // ---------- q525: SCD2 effective-dated join via native as-of ----------

  /** The warehouse-standard effective-dated join: facts matched to the
    * SCD2 dimension row whose validity interval CONTAINS the fact's
    * instant — here the dim is the per-user state history (each
    * non-purchase event opens [ts, next_ts)). Spark side: build the
    * intervals with one lead() window, then the native backward as-of
    * on `valid_from` — when intervals tile time, "greatest valid_from
    * ≤ ts" IS interval containment, so the as-of exec replaces the
    * usual non-equi range join (which Spark plans as a broadcast
    * nested loop or a banded join) with one co-partitioned merge.
    * The ORACLE is deliberately the OTHER formulation — a plain
    * inequality interval-containment join (ts >= valid_from AND
    * (valid_to IS NULL OR ts < valid_to)), not DuckDB's ASOF — so the
    * gate proves the equivalence of the two semantics, not just two
    * ASOF implementations. Merge exec pinned (dim is fact-scale).
    */
  private val q525 = QueryDef(
    "q525_asof_scd2_enrich",
    (s, dir) => {
      val e = ev(s, dir)
      val dim = e.where(col("event_type") =!= "purchase")
        .select(col("user_id").as("d_user_id"),
          col("ts").as("valid_from"),
          col("event_type").as("state"),
          col("event_id").as("d_event_id"))
        .withColumn("valid_to",
          org.apache.spark.sql.functions.lead(col("valid_from"), 1)
            .over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("d_user_id"))
              .orderBy(col("valid_from"), col("d_event_id"))))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      graft.plans.AsOf.asofJoin(purchases, dim,
        Seq("user_id"), Seq("d_user_id"), "ts", "valid_from",
        rightTieBreak = Seq("d_event_id"), leftOuter = true,
        broadcast = Some(false))
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts"), col("state"), col("valid_from"), col("valid_to"))
        .orderBy("purchase_id")
    },
    Some("""WITH dim AS (SELECT user_id AS d_user_id, ts AS valid_from,
        event_type AS state, event_id AS d_event_id,
        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS valid_to
      FROM events WHERE event_type <> 'purchase')
      SELECT p.event_id AS purchase_id, p.user_id, p.ts,
        d.state, d.valid_from, d.valid_to
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      LEFT JOIN dim d ON p.user_id = d.d_user_id
        AND p.ts >= d.valid_from
        AND (d.valid_to IS NULL OR p.ts < d.valid_to)
      ORDER BY purchase_id"""))

  // ---------- q527: variable-width outer range join (native) ------------

  /** Post-purchase error exposure through the NATIVE range join's full
    * surface: each purchase carries its OWN monitoring window
    * [ts, ts + (1 + event_id % 3) hours] — VARIABLE per-row width, the
    * case hand-banding fundamentally mis-fits (a single bucket constant
    * under-covers wide rows or floods narrow ones with candidates) and
    * the case that exercises the exec's non-monotone-hi window slicing
    * (a wide interval buffers rows past a later narrow one's hi; the
    * emit guard must re-check per row). LEFT OUTER keeps error-free
    * purchases (count 0), gating the null-extension path; the
    * downstream per-purchase aggregate shows the operator composing
    * like any join (count skips the null-extended rows exactly as SQL
    * count(col) does). Scale shape identical to q26's: two key-
    * clustered shuffles, sliding-window merge, memory = per-user
    * window density; [[graft.plans.RangeJoinOps.rangeJoin]], skew
    * mitigation via AsOfSkewMitigation applies automatically.
    */
  private val q527 = QueryDef(
    "q527_range_exposure",
    (s, dir) => {
      val e = ev(s, dir)
      val us = expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ " +
        "'1970-01-01 00:00:00', ts)")
      val H = 3600000000L
      val p = e.where(col("event_type") === "purchase")
        .select(col("user_id").as("u"), col("event_id").as("p_id"),
          us.as("p_us"))
        .withColumn("p_hi",
          col("p_us") + (lit(1L) + col("p_id") % 3) * H)
      val err = e.where(col("event_type") === "error")
        .select(col("user_id").as("eu"), col("event_id").as("e_id"),
          us.as("e_us"))
      graft.plans.RangeJoinOps.rangeJoin(p, err,
        Seq("u"), Seq("eu"), "p_us", "p_hi", "e_us", leftOuter = true)
        .groupBy(col("p_id"))
        .agg(count(col("e_id")).as("n_errors"),
          min(col("e_id")).as("first_error_id"),
          max(col("e_us") - col("p_us")).as("max_lag_us"))
        .select(col("p_id").as("purchase_id"), col("n_errors"),
          col("first_error_id"), col("max_lag_us"))
        .orderBy("purchase_id")
    },
    Some("""SELECT p.event_id AS purchase_id,
      count(e.event_id) AS n_errors,
      min(e.event_id) AS first_error_id,
      max(epoch_us(e.ts) - epoch_us(p.ts)) AS max_lag_us
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON e.user_id = p.user_id
      AND epoch_us(e.ts) >= epoch_us(p.ts)
      AND epoch_us(e.ts) <= epoch_us(p.ts)
        + (1 + p.event_id % 3) * 3600000000
      GROUP BY 1 ORDER BY 1"""))

  // ---------- q528: interval OVERLAP join (both sides intervals) -------

  /** Interval-overlap join — the temporal-join workhorse q26/q527
    * don't cover: BOTH sides carry intervals (purchase monitoring
    * windows [ts, ts+2 h] vs error incident windows [ts, ts+1 h]) and
    * a pair matches iff the intervals intersect (`p_lo <= e_hi AND
    * e_lo <= p_hi`). Spark plans that θ-join as a per-key cross
    * product; hand-banding needs a constant that mis-fits one side's
    * width. Instead the overlap predicate DECOMPOSES into two DISJOINT
    * native-range-join cases — (1) the error window STARTS inside the
    * purchase window (`e_lo ∈ [p_lo, p_hi]`), or (2) the purchase
    * window starts STRICTLY inside the error window
    * (`p_lo ∈ (e_lo, e_hi]`, strict lower bound = +1 µs so a shared
    * start point isn't double-counted) — each a co-partitioned
    * sliding-window merge ([[graft.plans.RangeJoinOps.rangeJoin]],
    * codegen'd, AQE-skew-mitigated), unioned then aggregated to
    * per-user overlap counts and durations (min(hi) − max(lo),
    * closed-interval convention so touching endpoints count with
    * duration 0). Scale: two linear merges on the same (user) key —
    * the exchanges are reused across the two cases — never a per-key
    * cross product; the oracle is the plain θ-join.
    */
  private val q528 = QueryDef(
    "q528_interval_overlap_join",
    (s, dir) => {
      val e = ev(s, dir)
      val us = expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ " +
        "'1970-01-01 00:00:00', ts)")
      val H = 3600000000L
      val p = e.where(col("event_type") === "purchase")
        .select(col("user_id").as("u"), col("event_id").as("p_id"),
          us.as("p_lo"))
        .withColumn("p_hi", col("p_lo") + 2 * H)
      val err = e.where(col("event_type") === "error")
        .select(col("user_id").as("eu"), col("event_id").as("e_id"),
          us.as("e_lo"))
        .withColumn("e_hi", col("e_lo") + H)
      val cols = Seq(col("u"), col("p_id"), col("e_id"),
        col("p_lo"), col("p_hi"), col("e_lo"), col("e_hi"))
      val c1 = graft.plans.RangeJoinOps.rangeJoin(p, err,
          Seq("u"), Seq("eu"), "p_lo", "p_hi", "e_lo")
        .select(cols: _*)
      val c2 = graft.plans.RangeJoinOps.rangeJoin(
          err.withColumn("olo", col("e_lo") + 1L), p,
          Seq("eu"), Seq("u"), "olo", "e_hi", "p_lo")
        .select((col("eu").as("u") +: cols.tail): _*)
      c1.unionAll(c2)
        .withColumn("ov_us",
          least(col("p_hi"), col("e_hi")) -
            greatest(col("p_lo"), col("e_lo")))
        .groupBy(col("u"))
        .agg(count(lit(1)).as("n_overlaps"),
          sum(col("ov_us")).as("overlap_us_total"),
          max(col("ov_us")).as("overlap_us_max"))
        .select(col("u").as("user_id"), col("n_overlaps"),
          col("overlap_us_total"), col("overlap_us_max"))
        .orderBy("user_id")
    },
    Some("""WITH p AS (SELECT user_id AS u, event_id AS p_id,
          epoch_us(ts) AS p_lo, epoch_us(ts) + 7200000000 AS p_hi
        FROM events WHERE event_type = 'purchase'),
      e AS (SELECT user_id AS eu, event_id AS e_id,
          epoch_us(ts) AS e_lo, epoch_us(ts) + 3600000000 AS e_hi
        FROM events WHERE event_type = 'error'),
      pairs AS (SELECT u, p_id, e_id,
          least(p_hi, e_hi) - greatest(p_lo, e_lo) AS ov
        FROM p JOIN e ON eu = u AND p_lo <= e_hi AND e_lo <= p_hi)
      SELECT u AS user_id, count(*)::BIGINT AS n_overlaps,
        sum(ov)::BIGINT AS overlap_us_total,
        max(ov)::BIGINT AS overlap_us_max
      FROM pairs GROUP BY 1 ORDER BY 1"""))

  // ---------- q530: range join through the SQL-text surface ------------

  /** q527's variable-width outer range join expressed ENTIRELY in SQL
    * text through the `graft_range_join` table-valued function
    * (plans/RangeSqlSurface, injectTableFunction + a resolution rule)
    * — the second native operator reaching the SQL-text rung the way
    * q520 proved for the as-of join, so BOTH whole-operator additions
    * are available to SQL-driven consumers without a line of Scala.
    * Same relations, same window arithmetic, same ORACLE SQL shape as
    * q527: the TVF lowers to the identical [[graft.plans.RangeJoin]]
    * node and from there the identical codegen'd co-partitioned merge,
    * so hash equality between the two gate entries is the point.
    * View hygiene per q520's convention: unique per-call names, bound
    * eagerly by spark.sql's analysis, dropped before returning.
    */
  private val q530 = QueryDef(
    "q530_range_sql_surface",
    (s, dir) => {
      val e = ev(s, dir)
      val us = expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ " +
        "'1970-01-01 00:00:00', ts)")
      val H = 3600000000L
      val tag = java.util.UUID.randomUUID().toString.replace("-", "")
      val purchView = s"q530_purch_$tag"
      val errView = s"q530_err_$tag"
      e.where(col("event_type") === "purchase")
        .select(col("user_id").as("u"), col("event_id").as("p_id"),
          us.as("p_us"))
        .withColumn("p_hi",
          col("p_us") + (lit(1L) + col("p_id") % 3) * H)
        .createOrReplaceTempView(purchView)
      e.where(col("event_type") === "error")
        .select(col("user_id").as("eu"), col("event_id").as("e_id"),
          us.as("e_us"))
        .createOrReplaceTempView(errView)
      try s.sql(s"""
        SELECT p_id AS purchase_id, count(e_id) AS n_errors,
          min(e_id) AS first_error_id,
          max(e_us - p_us) AS max_lag_us
        FROM graft_range_join(
          '$purchView', '$errView',
          'u', 'eu', 'p_us', 'p_hi', 'e_us', 'outer')
        GROUP BY p_id ORDER BY purchase_id""")
      finally {
        s.catalog.dropTempView(purchView): Unit
        s.catalog.dropTempView(errView): Unit
      }
    },
    Some("""SELECT p.event_id AS purchase_id,
      count(e.event_id) AS n_errors,
      min(e.event_id) AS first_error_id,
      max(epoch_us(e.ts) - epoch_us(p.ts)) AS max_lag_us
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON e.user_id = p.user_id
      AND epoch_us(e.ts) >= epoch_us(p.ts)
      AND epoch_us(e.ts) <= epoch_us(p.ts)
        + (1 + p.event_id % 3) * 3600000000
      GROUP BY 1 ORDER BY 1"""))

  val all: Seq[QueryDef] =
    Seq(q24, q25, q26, q27, q28, q53, q54, q56, q61, q68, q69, q70, q72,
      q73, q83, q87, q95, q98, q99, q100, q103, q108, q113, q117, q126,
      q128, q129, q137, q141, q142, q143, q159, q163, q164, q171, q179,
      q191, q193, q205, q206, q222, q223, q227, q251, q255, q256, q268,
      q273, q276, q282, q283, q286, q290, q300, q308, q312, q322, q324,
      q329, q331, q334, q335, q337, q339, q343, q344, q346, q347, q356,
      q359, q364, q365, q366, q367, q368, q369, q370, q386, q387, q390,
      q391, q392, q393, q395, q399, q402, q405, q479, q493, q494, q510,
      q512, q513, q514, q516, q518, q520, q523, q525, q527, q528,
      q530)
}
