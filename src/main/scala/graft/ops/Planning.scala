package graft.ops

import graft.{Fixtures, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 planning wave: the capacity-planning, data-engineering and
  * residual classical-testing members the registry still lacked. No
  * reference counterpart (the reference is an ETL Lambda — SURVEY.md
  * §2.11a extension contract): each query pairs a Spark plan with an
  * independent DuckDB oracle and follows the standing exactness
  * convention (integer/DECIMAL-pinned term sums, double math only on
  * 1-row / bounded frames, total ORDER BY).
  *
  * Scale design shared by the file: every query reduces the corpus in
  * one (occasionally two) linear grouped passes to a FIXED-size or
  * dimension-bounded frame; grids fan in-projection via explode, never
  * via joins; windows run only over bounded aggregate tables (the
  * PlanLint 2000-row single-partition gate). Nothing materializes a
  * corpus-sized sort or collects to the driver.
  */
object Planning {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Fixtures.table(s, dir, "events")

  // ---------- q447: Welch's heteroscedastic one-way ANOVA ---------------

  /** Welch's F over the priority → order-value groups — the
    * UNEQUAL-VARIANCE member of the location family: q358's classical
    * F assumes homoscedasticity that q307/q419 exist to test, and when
    * they reject, Welch's w_i = n_i/s_i² weighting with its
    * Satterthwaite df is the test that stays valid. All inputs fold
    * from the same per-group exact moments (n, Σcents, Σcents²) as
    * q358/q442; the per-group Welch terms (w, w·m, the A and B
    * summands) are femto/nano-pinned BEFORE the ≤k-row sums so the
    * bounded reduces are order-free in both engines. p-value uses the
    * χ²(k−1) limit of (k−1)·F (documented large-df2 approximation —
    * df2 here is in the thousands). One grouped corpus pass, 1-row
    * output.
    */
  private val q447 = QueryDef(
    "q447_welch_anova",
    (s, dir) => {
      val g = Fixtures.table(s, dir, "orders")
        .select(col("o_orderpriority").as("grp"),
          expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").as("y"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum(col("y").cast(DecimalType(38, 0)) * col("y")).as("syy"))
      val t = g.select(col("n"),
        expr("CAST(sy AS DOUBLE) / n").as("m"),
        expr("""(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
          * CAST(sy AS DOUBLE) / n) / (CAST(n AS DOUBLE) - 1.0)""")
          .as("s2"))
        // zero-variance group ⇒ w = n/s2 is infinite; drop it identically
        // in both dialects (q457's `vv > 0` convention) so Spark's
        // Inf→Long cast and DuckDB's cast error can never diverge
        .where(col("s2") > 0.0)
        .select(col("n"), col("m"),
          expr("CAST(round(n / s2 * 1e15) AS BIGINT)").as("w_femto"),
          expr("CAST(round(n / s2 * m * 1e9) AS BIGINT)").as("wm_nano"))
      val s1 = t.agg(count(lit(1)).as("k"), sum(col("n")).as("nt"),
        sum(col("w_femto")).as("sw"), sum(col("wm_nano")).as("swm"))
      val terms = t.crossJoin(broadcast(s1))
        .select(col("k"), col("nt"),
          expr("w_femto / 1e15").as("w"),
          expr("sw / 1e15").as("bw"),
          expr("(swm / 1e9) / (sw / 1e15)").as("mw"),
          col("n"), col("m"))
        .select(col("k"), col("nt"),
          expr("CAST(round(w * (m - mw) * (m - mw) * 1e9) AS BIGINT)")
            .as("a_nano"),
          expr("""CAST(round((1.0 - w / bw) * (1.0 - w / bw)
            / (CAST(n AS DOUBLE) - 1.0) * 1e15) AS BIGINT)""")
            .as("b_femto"))
      terms.groupBy(col("k"), col("nt"))
        .agg(sum(col("a_nano")).as("sa"), sum(col("b_femto")).as("sb"))
        .select(col("k"), col("nt"),
          expr("(sa / 1e9) / (CAST(k AS DOUBLE) - 1.0)").as("aa"),
          expr("sb / 1e15").as("bs"))
        .select(col("k").as("k_groups"), col("nt").as("n_total"),
          round(expr("""aa / (1.0 + 2.0 * (CAST(k AS DOUBLE) - 2.0)
            / (CAST(k AS DOUBLE) * k - 1.0) * bs)"""), 6).as("f_welch"),
          (col("k") - 1).as("df1"),
          round(expr("(CAST(k AS DOUBLE) * k - 1.0) / (3.0 * bs)"), 3)
            .as("df2"),
          round(expr(Portable.chi2UpperP(
            """(CAST(k AS DOUBLE) - 1.0) * (aa / (1.0 + 2.0
              * (CAST(k AS DOUBLE) - 2.0)
              / (CAST(k AS DOUBLE) * k - 1.0) * bs))""",
            "CAST(k AS DOUBLE) - 1.0")), 9).as("p_approx"))
    },
    Some(s"""WITH g AS (SELECT o_orderpriority AS grp,
          count(*)::BIGINT AS n,
          sum(CAST(round(o_totalprice * 100.0) AS BIGINT))::BIGINT AS sy,
          sum(CAST(round(o_totalprice * 100.0) AS BIGINT)::HUGEINT
            * CAST(round(o_totalprice * 100.0) AS BIGINT)) AS syy
        FROM orders GROUP BY 1),
      t AS (SELECT n, CAST(sy AS DOUBLE) / n AS m,
          (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
            * CAST(sy AS DOUBLE) / n) / (CAST(n AS DOUBLE) - 1.0) AS s2
        FROM g),
      tp AS (SELECT n, m,
          CAST(round(n / s2 * 1e15) AS BIGINT) AS w_femto,
          CAST(round(n / s2 * m * 1e9) AS BIGINT) AS wm_nano
        FROM t WHERE s2 > 0.0),
      s1 AS (SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS nt,
          sum(w_femto)::BIGINT AS sw, sum(wm_nano)::BIGINT AS swm
        FROM tp),
      terms AS (SELECT k, nt,
          CAST(round((w_femto / 1e15) * (m - (swm / 1e9) / (sw / 1e15))
            * (m - (swm / 1e9) / (sw / 1e15)) * 1e9) AS BIGINT) AS a_nano,
          CAST(round((1.0 - (w_femto / 1e15) / (sw / 1e15))
            * (1.0 - (w_femto / 1e15) / (sw / 1e15))
            / (CAST(n AS DOUBLE) - 1.0) * 1e15) AS BIGINT) AS b_femto
        FROM tp, s1),
      red AS (SELECT k, nt, sum(a_nano)::BIGINT AS sa,
          sum(b_femto)::BIGINT AS sb
        FROM terms GROUP BY 1, 2),
      fin AS (SELECT k, nt,
          (sa / 1e9) / (CAST(k AS DOUBLE) - 1.0) AS aa,
          sb / 1e15 AS bs
        FROM red)
      SELECT k AS k_groups, nt AS n_total,
        round(aa / (1.0 + 2.0 * (CAST(k AS DOUBLE) - 2.0)
          / (CAST(k AS DOUBLE) * k - 1.0) * bs), 6) AS f_welch,
        k - 1 AS df1,
        round((CAST(k AS DOUBLE) * k - 1.0) / (3.0 * bs), 3) AS df2,
        round(${Portable.chi2UpperP(
          """(CAST(k AS DOUBLE) - 1.0) * (aa / (1.0 + 2.0
            * (CAST(k AS DOUBLE) - 2.0)
            / (CAST(k AS DOUBLE) * k - 1.0) * bs))""",
          "CAST(k AS DOUBLE) - 1.0")}, 9) AS p_approx
      FROM fin"""))

  // ---------- q448: KPSS stationarity test -------------------------------

  /** KPSS level-stationarity test on the daily event-count series —
    * the COMPLEMENT of q405's ADF: ADF's null is a unit root (failing
    * to reject proves nothing), KPSS's null is stationarity, and
    * running both brackets the answer (reject-ADF + accept-KPSS is
    * the only clean "stationary" verdict). η = n⁻²ΣS_t² / s²(l) with
    * S_t the partial sums of milli-pinned exact deviations and s²(l)
    * the Bartlett-window (l = 4) long-run variance from the lag
    * autocovariances. Convention: the series is the OBSERVED-day
    * sequence (row-indexed; calendar gaps collapse — the q418 runs
    * convention, stated in both dialects). The per-day reduce is the
    * only corpus-sized pass; partial sums, lags and all test math run
    * on the bounded ≤|days| frame (PlanLint's single-partition-window
    * class). 1-row output vs the 0.463 5 % critical value.
    */
  private val q448 = QueryDef(
    "q448_kpss_stationarity",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = ev(s, dir)
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("c"))
      val st = daily.agg(count(lit(1)).as("n"),
        expr("CAST(round(sum(c) * 1000.0 / count(1)) AS BIGINT)")
          .as("mean_milli"))
      val e = daily.crossJoin(broadcast(st))
        .select(col("day"), col("n"),
          (col("c") * 1000 - col("mean_milli")).as("e_milli"))
      val w = Window.orderBy(col("day"))
      val withS = e
        .withColumn("s_t", sum(col("e_milli")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("e1", lag(col("e_milli"), 1).over(w))
        .withColumn("e2", lag(col("e_milli"), 2).over(w))
        .withColumn("e3", lag(col("e_milli"), 3).over(w))
        .withColumn("e4", lag(col("e_milli"), 4).over(w))
      def dl(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
      val red = withS.groupBy(col("n")).agg(
        sum(dl(col("s_t")) * col("s_t")).as("ss2"),
        sum(dl(col("e_milli")) * col("e_milli")).as("g0"),
        sum(dl(col("e_milli")) * coalesce(col("e1"), lit(0L))).as("g1"),
        sum(dl(col("e_milli")) * coalesce(col("e2"), lit(0L))).as("g2"),
        sum(dl(col("e_milli")) * coalesce(col("e3"), lit(0L))).as("g3"),
        sum(dl(col("e_milli")) * coalesce(col("e4"), lit(0L))).as("g4"))
      red.select(col("n").as("n_days"),
        round(expr("""(CAST(ss2 AS DOUBLE) / (CAST(n AS DOUBLE) * n))
          / ((CAST(g0 AS DOUBLE) + 2.0 * (0.8e0 * CAST(g1 AS DOUBLE)
            + 0.6e0 * CAST(g2 AS DOUBLE) + 0.4e0 * CAST(g3 AS DOUBLE)
            + 0.2e0 * CAST(g4 AS DOUBLE))) / n)"""), 9).as("kpss_eta"),
        round(expr("""(CAST(g0 AS DOUBLE) + 2.0 * (0.8e0
          * CAST(g1 AS DOUBLE) + 0.6e0 * CAST(g2 AS DOUBLE)
          + 0.4e0 * CAST(g3 AS DOUBLE) + 0.2e0 * CAST(g4 AS DOUBLE)))
          / n / 1e6"""), 6).as("longrun_var"),
        expr("""(CAST(ss2 AS DOUBLE) / (CAST(n AS DOUBLE) * n))
          / ((CAST(g0 AS DOUBLE) + 2.0 * (0.8e0 * CAST(g1 AS DOUBLE)
            + 0.6e0 * CAST(g2 AS DOUBLE) + 0.4e0 * CAST(g3 AS DOUBLE)
            + 0.2e0 * CAST(g4 AS DOUBLE))) / n) < 0.463e0""")
          .as("stationary_5pct"))
    },
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          count(*)::BIGINT AS c
        FROM events GROUP BY 1),
      st AS (SELECT count(*)::BIGINT AS n,
          CAST(round(sum(c) * 1000.0 / count(*)) AS BIGINT) AS mean_milli
        FROM daily),
      e AS (SELECT day, n, c * 1000 - mean_milli AS e_milli
        FROM daily, st),
      ws AS (SELECT n, e_milli,
          sum(e_milli) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_t,
          lag(e_milli, 1) OVER (ORDER BY day) AS e1,
          lag(e_milli, 2) OVER (ORDER BY day) AS e2,
          lag(e_milli, 3) OVER (ORDER BY day) AS e3,
          lag(e_milli, 4) OVER (ORDER BY day) AS e4
        FROM e),
      red AS (SELECT n,
          sum(s_t::HUGEINT * s_t) AS ss2,
          sum(e_milli::HUGEINT * e_milli) AS g0,
          sum(e_milli::HUGEINT * coalesce(e1, 0)) AS g1,
          sum(e_milli::HUGEINT * coalesce(e2, 0)) AS g2,
          sum(e_milli::HUGEINT * coalesce(e3, 0)) AS g3,
          sum(e_milli::HUGEINT * coalesce(e4, 0)) AS g4
        FROM ws GROUP BY 1)
      SELECT n AS n_days,
        round((CAST(ss2 AS DOUBLE) / (CAST(n AS DOUBLE) * n))
          / ((CAST(g0 AS DOUBLE) + 2.0 * (0.8e0 * CAST(g1 AS DOUBLE)
            + 0.6e0 * CAST(g2 AS DOUBLE) + 0.4e0 * CAST(g3 AS DOUBLE)
            + 0.2e0 * CAST(g4 AS DOUBLE))) / n), 9) AS kpss_eta,
        round((CAST(g0 AS DOUBLE) + 2.0 * (0.8e0 * CAST(g1 AS DOUBLE)
          + 0.6e0 * CAST(g2 AS DOUBLE) + 0.4e0 * CAST(g3 AS DOUBLE)
          + 0.2e0 * CAST(g4 AS DOUBLE))) / n / 1e6, 6) AS longrun_var,
        (CAST(ss2 AS DOUBLE) / (CAST(n AS DOUBLE) * n))
          / ((CAST(g0 AS DOUBLE) + 2.0 * (0.8e0 * CAST(g1 AS DOUBLE)
            + 0.6e0 * CAST(g2 AS DOUBLE) + 0.4e0 * CAST(g3 AS DOUBLE)
            + 0.2e0 * CAST(g4 AS DOUBLE))) / n) < 0.463e0
          AS stationary_5pct
      FROM red"""))

  // ---------- q449: Theil's U2 forecast-quality ratio --------------------

  /** Theil's U2 for the daily event-count series: RMSE of the
    * seasonal-naive forecast (ŷ_t = y_{t−7}, q143's weekly cycle) over
    * RMSE of the last-value naive (ŷ_t = y_{t−1}) — the scale-free
    * eval that says whether the seasonal structure q143/q343 model is
    * worth USING for prediction (U < 1) or the series is better
    * forecast by pure persistence (U ≥ 1); complements q356's MASE
    * (which grades one model against in-sample naive). Lags are
    * CALENDAR joins on day−1 / day−7 and only days with BOTH lags
    * observed score (gaps drop the day — the q426 convention, stated
    * in both dialects). Squared errors are exact integers
    * DECIMAL-summed; one per-day pass + two bounded equi-joins; 1-row
    * output.
    */
  private val q449 = QueryDef(
    "q449_theil_u_forecast",
    (s, dir) => {
      val daily = ev(s, dir)
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("c"))
      val l1 = daily.select((col("day") + 1).as("day"), col("c").as("c1"))
      val l7 = daily.select((col("day") + 7).as("day"), col("c").as("c7"))
      def dl(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
      daily.join(l1, "day").join(l7, "day")
        .select(col("day"),
          (col("c") - col("c7")).as("es"), (col("c") - col("c1")).as("en"))
        .agg(count(lit(1)).as("n_scored"),
          sum(dl(col("es")) * col("es")).as("sss"),
          sum(dl(col("en")) * col("en")).as("ssn"))
        .select(col("n_scored"),
          round(expr("sqrt(CAST(sss AS DOUBLE) / n_scored)"), 6)
            .as("rmse_seasonal"),
          round(expr("sqrt(CAST(ssn AS DOUBLE) / n_scored)"), 6)
            .as("rmse_naive"),
          round(expr("sqrt(CAST(sss AS DOUBLE) / CAST(ssn AS DOUBLE))"),
            9).as("theil_u2"))
    },
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          count(*)::BIGINT AS c
        FROM events GROUP BY 1),
      sc AS (SELECT d.day, d.c - l7.c AS es, d.c - l1.c AS en
        FROM daily d
        JOIN daily l1 ON l1.day = d.day - 1
        JOIN daily l7 ON l7.day = d.day - 7),
      red AS (SELECT count(*)::BIGINT AS n_scored,
          sum(es::HUGEINT * es) AS sss, sum(en::HUGEINT * en) AS ssn
        FROM sc)
      SELECT n_scored,
        round(sqrt(CAST(sss AS DOUBLE) / n_scored), 6) AS rmse_seasonal,
        round(sqrt(CAST(ssn AS DOUBLE) / n_scored), 6) AS rmse_naive,
        round(sqrt(CAST(sss AS DOUBLE) / CAST(ssn AS DOUBLE)), 9)
          AS theil_u2
      FROM red"""))

  // ---------- q450: Bloom-filter join-prefilter audit ---------------------

  /** Realized vs expected false-positive rate of a Bloom-filter join
    * prefilter — the runtime-filter sizing audit behind every
    * large-join pushdown (Spark's own runtime bloom filters, DPP-style
    * probe pruning): build the m = 4096-bit, k = 3 filter over the
    * customers that HAVE orders (the build side of the q07 anti-join),
    * probe it with the customers that have none, and compare the
    * measured FP share against the closed-form (1−e^(−kn/m))^k. The
    * fixture-scaled m demonstrates saturation as n grows past m/10 —
    * production sizes m ∝ n at ~10 bits/key for 1 % FP (documented).
    * Hash positions are the portable md5-based h32 per (hash index,
    * key), so both engines build bit-identical filters; membership is
    * exact set logic (distinct bit list ⋈ probe positions), never
    * engine-native bloom primitives. Two distinct-aggregates + one
    * broadcast-sized join; 1-row output.
    */
  private val q450 = QueryDef(
    "q450_bloom_prefilter_audit",
    (s, dir) => {
      val m = 4096
      val build = Fixtures.table(s, dir, "orders")
        .select(col("o_custkey").as("k")).distinct()
      val buildBits = build.select(explode(array((1 to 3).map(j =>
          expr(s"${Portable.h32Spark(s"concat('bf${j}_', k)")} % $m"))
          : _*)).as("bit"))
        .distinct()
      val probe = Fixtures.table(s, dir, "customer")
        .join(Fixtures.table(s, dir, "orders")
          .select(col("o_custkey").as("c_custkey")).distinct(),
          Seq("c_custkey"), "left_anti")
        .select(col("c_custkey").as("k"))
      val probePos = probe.select(col("k"), explode(array((1 to 3).map(j =>
          expr(s"${Portable.h32Spark(s"concat('bf${j}_', k)")} % $m"))
          : _*)).as("bit"))
        .distinct()
      val hits = probePos
        .join(buildBits.select(col("bit"), lit(1L).as("hit")),
          Seq("bit"), "left_outer")
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_pos"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      val probeAgg = hits.agg(count(lit(1)).as("n_probe_neg"),
        coalesce(sum(when(col("n_hit") === col("n_pos"), 1L)
          .otherwise(0L)), lit(0L)).as("n_fp"))
      val buildAgg = build.agg(count(lit(1)).as("n_build"))
        .crossJoin(broadcast(buildBits.agg(count(lit(1)).as("bits_set"))))
      buildAgg.crossJoin(broadcast(probeAgg))
        .select(col("n_build"), lit(m.toLong).as("m_bits"),
          lit(3L).as("k_hashes"), col("bits_set"),
          col("n_probe_neg"),
          round(expr("""CASE WHEN n_probe_neg = 0 THEN 0.0
            ELSE CAST(n_fp AS DOUBLE) / n_probe_neg END"""), 9)
            .as("fp_observed"),
          round(expr(s"""pow(1.0 - exp(-(3.0 * n_build) / $m.0e0),
            3.0)"""), 9).as("fp_expected"))
    },
    Some(s"""WITH build AS (SELECT DISTINCT o_custkey AS k FROM orders),
      bbits AS (SELECT DISTINCT bit FROM (
        SELECT ${Portable.h32Duck("'bf1_' || k")} % 4096 AS bit FROM build
        UNION ALL
        SELECT ${Portable.h32Duck("'bf2_' || k")} % 4096 FROM build
        UNION ALL
        SELECT ${Portable.h32Duck("'bf3_' || k")} % 4096 FROM build)),
      probe AS (SELECT c_custkey AS k FROM customer
        WHERE c_custkey NOT IN (SELECT k FROM build)),
      ppos AS (SELECT DISTINCT k, bit FROM (
        SELECT k, ${Portable.h32Duck("'bf1_' || k")} % 4096 AS bit
          FROM probe
        UNION ALL
        SELECT k, ${Portable.h32Duck("'bf2_' || k")} % 4096 FROM probe
        UNION ALL
        SELECT k, ${Portable.h32Duck("'bf3_' || k")} % 4096 FROM probe)),
      hits AS (SELECT k, count(*)::BIGINT AS n_pos,
          sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
            AS n_hit
        FROM ppos p LEFT JOIN bbits b ON p.bit = b.bit
        GROUP BY 1),
      pa AS (SELECT count(*)::BIGINT AS n_probe_neg,
          coalesce(sum(CASE WHEN n_hit = n_pos THEN 1 ELSE 0 END), 0)
            ::BIGINT AS n_fp
        FROM hits),
      ba AS (SELECT (SELECT count(*)::BIGINT FROM build) AS n_build,
          (SELECT count(*)::BIGINT FROM bbits) AS bits_set)
      SELECT n_build, 4096::BIGINT AS m_bits, 3::BIGINT AS k_hashes,
        bits_set, n_probe_neg,
        round(CASE WHEN n_probe_neg = 0 THEN 0.0
          ELSE CAST(n_fp AS DOUBLE) / n_probe_neg END, 9) AS fp_observed,
        round(pow(1.0 - exp(-(3.0 * n_build) / 4096.0e0), 3.0), 9)
          AS fp_expected
      FROM ba, pa"""))

  // ---------- q451: data-constrained scaling (repeat-epoch value) --------

  /** Effective-data curve for repeated training epochs over the
    * document corpus — the data-constrained scaling read (Muennighoff
    * et al. 2023: repeated tokens decay in value with R* ≈ 15.39, so
    * effective data D' = U·(1 + R*·(1 − e^(−R/R*))) with R = epochs−1
    * repeat passes): for epochs ∈ {1,2,4,8,16}, the raw token budget,
    * the effective unique-token equivalent, and the marginal utility
    * of the LAST epoch (e^(−R/R*) — the number that says when to stop
    * repeating and go buy data instead). The corpus contributes ONE
    * token-count reduce (the standing whitespace tokenizer); the whole
    * curve is scalar math fanned over a 5-row grid. 5-row output.
    */
  private val q451 = QueryDef(
    "q451_data_constrained_epochs",
    (s, dir) => {
      val u = Fixtures.table(s, dir, "documents")
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("u"))
      u.select(col("u"),
          explode(array(lit(1L), lit(2L), lit(4L), lit(8L), lit(16L)))
            .as("epochs"))
        .select(col("epochs"), col("u").as("unique_tokens"),
          (col("epochs") * col("u")).as("raw_tokens"),
          expr("""CAST(round(u * (1.0 + 15.39e0
            * (1.0 - exp(-(CAST(epochs - 1 AS DOUBLE)) / 15.39e0))))
            AS BIGINT)""").as("effective_tokens"),
          round(expr(
            "exp(-(CAST(epochs - 1 AS DOUBLE)) / 15.39e0)"), 9)
            .as("marginal_utility"))
        .orderBy(col("epochs"))
    },
    Some("""WITH u AS (SELECT sum(len(string_split(text, ' ')))::BIGINT
          AS u FROM documents),
      grid AS (SELECT CAST(unnest([1, 2, 4, 8, 16]) AS BIGINT) AS epochs)
      SELECT epochs, u AS unique_tokens,
        epochs * u AS raw_tokens,
        CAST(round(u * (1.0 + 15.39e0
          * (1.0 - exp(-(CAST(epochs - 1 AS DOUBLE)) / 15.39e0))))
          AS BIGINT) AS effective_tokens,
        round(exp(-(CAST(epochs - 1 AS DOUBLE)) / 15.39e0), 9)
          AS marginal_utility
      FROM u, grid ORDER BY epochs"""))

  // ---------- q452: Chinchilla compute allocation ------------------------

  /** Compute-optimal (N, D) allocation against THIS corpus's token
    * supply — the planning read in front of q451: under the Chinchilla
    * rule (Hoffmann et al. 2022, D_opt ≈ 20·N_opt with C = 6·N·D, so
    * N_opt = √(C/120)), each compute budget implies a token demand
    * D_opt, and dividing by the corpus's unique tokens says how many
    * epochs the data must stretch — the single-epoch / mild-repeat /
    * heavy-repeat / data-bound verdict (bands at 1/4/16 epochs, the
    * q451 repeat-value cliff). One corpus token reduce + scalar grid
    * math; 3-row output.
    */
  private val q452 = QueryDef(
    "q452_chinchilla_allocation",
    (s, dir) => {
      val u = Fixtures.table(s, dir, "documents")
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("u"))
      u.select(col("u"),
          explode(array(lit(1e19), lit(1e21), lit(1e23)))
            .as("compute_flops"))
        .select(col("compute_flops"),
          expr("CAST(round(sqrt(compute_flops / 120.0e0)) AS BIGINT)")
            .as("n_opt_params"),
          expr("""CAST(round(20.0e0 * sqrt(compute_flops / 120.0e0))
            AS BIGINT)""").as("d_opt_tokens"),
          round(expr("20.0e0 * sqrt(compute_flops / 120.0e0) / u"), 3)
            .as("epochs_needed"),
          expr("""CASE
            WHEN 20.0e0 * sqrt(compute_flops / 120.0e0) / u <= 1.0
              THEN 'single_epoch'
            WHEN 20.0e0 * sqrt(compute_flops / 120.0e0) / u <= 4.0
              THEN 'mild_repeat'
            WHEN 20.0e0 * sqrt(compute_flops / 120.0e0) / u <= 16.0
              THEN 'heavy_repeat'
            ELSE 'data_bound' END""").as("regime"))
        .orderBy(col("compute_flops"))
    },
    Some("""WITH u AS (SELECT sum(len(string_split(text, ' ')))::BIGINT
          AS u FROM documents),
      grid AS (SELECT unnest([1e19, 1e21, 1e23]) AS compute_flops)
      SELECT compute_flops,
        CAST(round(sqrt(compute_flops / 120.0e0)) AS BIGINT)
          AS n_opt_params,
        CAST(round(20.0e0 * sqrt(compute_flops / 120.0e0)) AS BIGINT)
          AS d_opt_tokens,
        round(20.0e0 * sqrt(compute_flops / 120.0e0) / u, 3)
          AS epochs_needed,
        CASE
          WHEN 20.0e0 * sqrt(compute_flops / 120.0e0) / u <= 1.0
            THEN 'single_epoch'
          WHEN 20.0e0 * sqrt(compute_flops / 120.0e0) / u <= 4.0
            THEN 'mild_repeat'
          WHEN 20.0e0 * sqrt(compute_flops / 120.0e0) / u <= 16.0
            THEN 'heavy_repeat'
          ELSE 'data_bound' END AS regime
      FROM u, grid ORDER BY compute_flops"""))

  // ---------- q453: Cochran–Armitage trend test ---------------------------

  /** Cochran–Armitage test for a LINEAR trend in return rate across
    * the 11 ordered discount levels — the standard ordered-proportions
    * test the association family still lacked: q423's Somers' D
    * measures the ordinal association's SIZE, χ² (q109) ignores the
    * ordering entirely; CA pools all its power into the one-df linear
    * contrast z = (Σw·r − p̄Σw·n) / √(p̄(1−p̄)(Σn·w² − (Σn·w)²/N))
    * with scores w = discount points. Every sum is an exact int64
    * line-level reduce (w ≤ 10 keeps all products tiny); z and the
    * two-sided p are scalar math on the 1-row frame. One corpus pass.
    */
  private val q453 = QueryDef(
    "q453_cochran_armitage",
    (s, dir) => {
      val red = Fixtures.table(s, dir, "lineitem")
        .select(expr("CAST(round(l_discount * 100.0) AS BIGINT)").as("w"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("r"))
        .agg(count(lit(1)).as("n"), sum(col("r")).as("rr"),
          sum(col("w") * col("r")).as("swr"),
          sum(col("w")).as("sw"),
          sum(col("w") * col("w")).as("sw2"))
      red.select(col("n").as("n_lines"), col("rr").as("n_returned"),
        round(expr("""(swr - (CAST(rr AS DOUBLE) / n) * sw)
          / sqrt((CAST(rr AS DOUBLE) / n) * (1.0 - CAST(rr AS DOUBLE) / n)
            * (sw2 - CAST(sw AS DOUBLE) * sw / n))"""), 6).as("z_trend"),
        round(expr("2.0 * " + Portable.normCdfUpper(
          """abs((swr - (CAST(rr AS DOUBLE) / n) * sw)
            / sqrt((CAST(rr AS DOUBLE) / n)
              * (1.0 - CAST(rr AS DOUBLE) / n)
              * (sw2 - CAST(sw AS DOUBLE) * sw / n)))""")), 9)
          .as("p_value"))
    },
    Some(s"""WITH red AS (SELECT count(*)::BIGINT AS n,
          sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT
            AS rr,
          sum(CAST(round(l_discount * 100.0) AS BIGINT)
            * CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT
            AS swr,
          sum(CAST(round(l_discount * 100.0) AS BIGINT))::BIGINT AS sw,
          sum(CAST(round(l_discount * 100.0) AS BIGINT)
            * CAST(round(l_discount * 100.0) AS BIGINT))::BIGINT AS sw2
        FROM lineitem)
      SELECT n AS n_lines, rr AS n_returned,
        round((swr - (CAST(rr AS DOUBLE) / n) * sw)
          / sqrt((CAST(rr AS DOUBLE) / n) * (1.0 - CAST(rr AS DOUBLE) / n)
            * (sw2 - CAST(sw AS DOUBLE) * sw / n)), 6) AS z_trend,
        round(2.0 * ${Portable.normCdfUpper(
          """abs((swr - (CAST(rr AS DOUBLE) / n) * sw)
            / sqrt((CAST(rr AS DOUBLE) / n)
              * (1.0 - CAST(rr AS DOUBLE) / n)
              * (sw2 - CAST(sw AS DOUBLE) * sw / n)))""")}, 9)
          AS p_value
      FROM red"""))

  // ---------- q454: skew salt-factor planner ------------------------------

  /** Salt-factor plan for the l_partkey join key — the mitigation step
    * that turns q398's skew DIAGNOSIS into an executable plan: given a
    * per-task row target T (32 at fixture scale; production uses ~10⁵
    * — the constant scales with executor memory, not the corpus), the
    * planner reports the hottest key's row count, the salt factor
    * ceil(max/T) that bounds any single (key, salt) cell, the post-salt
    * max cell size, how many keys even need salting, and the dim-side
    * duplication bill (hot keys × salt — selective salting replicates
    * the small side only for hot keys, the SkewJoin contract). One
    * grouped count over the fact table + one bounded reduce; 1-row
    * output, all exact integers.
    */
  private val q454 = QueryDef(
    "q454_salt_factor_planner",
    (s, dir) => {
      val cnts = Fixtures.table(s, dir, "lineitem")
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
      cnts.agg(count(lit(1)).as("n_keys"),
          max(col("cnt")).as("max_key_rows"),
          sum(when(col("cnt") > 32, 1L).otherwise(0L))
            .as("keys_over_target"))
        .select(col("n_keys"), col("max_key_rows"),
          lit(32L).as("target_rows"),
          expr("(max_key_rows + 31) div 32").as("salt_factor"),
          expr("""(max_key_rows + (max_key_rows + 31) div 32 - 1)
            div ((max_key_rows + 31) div 32)""").as("post_salt_max"),
          col("keys_over_target"),
          (expr("(max_key_rows + 31) div 32") * col("keys_over_target"))
            .as("dim_dup_rows"))
    },
    Some("""WITH cnts AS (SELECT l_partkey, count(*)::BIGINT AS cnt
        FROM lineitem GROUP BY 1),
      red AS (SELECT count(*)::BIGINT AS n_keys,
          max(cnt)::BIGINT AS max_key_rows,
          sum(CASE WHEN cnt > 32 THEN 1 ELSE 0 END)::BIGINT
            AS keys_over_target
        FROM cnts)
      SELECT n_keys, max_key_rows, 32::BIGINT AS target_rows,
        (max_key_rows + 31) // 32 AS salt_factor,
        (max_key_rows + (max_key_rows + 31) // 32 - 1)
          // ((max_key_rows + 31) // 32) AS post_salt_max,
        keys_over_target,
        ((max_key_rows + 31) // 32) * keys_over_target AS dim_dup_rows
      FROM red"""))

  // ---------- q455: broadcast-join threshold planner ----------------------

  /** Estimated in-memory size of every dimension table against the
    * 10 MB default broadcast threshold — the plan-shape decision that
    * matters most at 100 TB (a dim that fits broadcasts and deletes a
    * fact-table shuffle; one that doesn't forces sort-merge): per
    * table, rows and a byte estimate from the standing width model
    * (8 bytes per fixed-width column + 4 + length per string — the
    * UnsafeRow-flavored convention, stated identically in both
    * dialects). Five single-table aggregates unioned (dimension scans
    * are noise next to any fact pass); 5-row output ordered by name.
    */
  private val q455 = QueryDef(
    "q455_broadcast_planner",
    (s, dir) => {
      def one(name: String, bytesExpr: String): DataFrame =
        Fixtures.table(s, dir, name)
          .agg(count(lit(1)).as("n_rows"),
            sum(expr(bytesExpr)).as("est_bytes"))
          .select(lit(name).as("table_name"), col("n_rows"),
            col("est_bytes"))
      one("customer",
          "CAST(32 + length(c_name) + length(c_mktsegment) AS BIGINT)")
        .unionAll(one("nation", "CAST(20 + length(n_name) AS BIGINT)"))
        .unionAll(one("part",
          "CAST(36 + length(p_name) + length(p_brand) + length(p_type)"
            + " AS BIGINT)"))
        .unionAll(one("region", "CAST(12 + length(r_name) AS BIGINT)"))
        .unionAll(one("supplier", "CAST(28 + length(s_name) AS BIGINT)"))
        .select(col("table_name"), col("n_rows"), col("est_bytes"),
          round(expr("est_bytes / 1048576.0e0"), 6).as("est_mb"),
          (col("est_bytes") < 10485760L).as("fits_10mb"))
        .orderBy(col("table_name"))
    },
    Some("""WITH sizes AS (
        SELECT 'customer' AS table_name, count(*)::BIGINT AS n_rows,
          sum(CAST(32 + length(c_name) + length(c_mktsegment) AS BIGINT))
            ::BIGINT AS est_bytes FROM customer
        UNION ALL
        SELECT 'nation', count(*)::BIGINT,
          sum(CAST(20 + length(n_name) AS BIGINT))::BIGINT FROM nation
        UNION ALL
        SELECT 'part', count(*)::BIGINT,
          sum(CAST(36 + length(p_name) + length(p_brand)
            + length(p_type) AS BIGINT))::BIGINT FROM part
        UNION ALL
        SELECT 'region', count(*)::BIGINT,
          sum(CAST(12 + length(r_name) AS BIGINT))::BIGINT FROM region
        UNION ALL
        SELECT 'supplier', count(*)::BIGINT,
          sum(CAST(28 + length(s_name) AS BIGINT))::BIGINT FROM supplier)
      SELECT table_name, n_rows, est_bytes,
        round(est_bytes / 1048576.0e0, 6) AS est_mb,
        est_bytes < 10485760 AS fits_10mb
      FROM sizes ORDER BY table_name"""))

  // ---------- q456: watermark-lag re-export cost ---------------------------

  /** Re-export volume as a function of checkpoint lag — the cost model
    * behind the reference's incremental contract (strict `>` watermark,
    * SURVEY §2.2/P2): if the stored watermark trails the table's true
    * max event time by {1, 6, 24} hours (a failed run, a paused
    * schedule), the next incremental pass re-sends every row above the
    * stale mark. Per lag: rows re-sent, their payload-byte estimate
    * (the q455 width model on the string columns), and the share of
    * the table — the number that decides between tighter checkpoint
    * cadence and cheap idempotent sinks. ONE events scan fanned across
    * the 3-lag grid in-projection against the broadcast max-ts row;
    * 3-row output.
    */
  private val q456 = QueryDef(
    "q456_watermark_lag_cost",
    (s, dir) => {
      val wm = ev(s, dir).agg(max(expr("timestampdiff(MICROSECOND, " +
        "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")).as("wm_us"),
        count(lit(1)).as("n_total"))
      ev(s, dir)
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)").as("ts_us"),
          expr("CAST(32 + length(event_type) + length(props) AS BIGINT)")
            .as("row_bytes"))
        .crossJoin(broadcast(wm))
        .select(col("ts_us"), col("row_bytes"), col("wm_us"),
          col("n_total"),
          explode(array(lit(1L), lit(6L), lit(24L))).as("lag_hours"))
        .groupBy(col("lag_hours"), col("n_total"))
        .agg(sum(when(col("ts_us") > col("wm_us")
            - col("lag_hours") * 3600000000L, 1L).otherwise(0L))
            .as("rows_resent"),
          sum(when(col("ts_us") > col("wm_us")
            - col("lag_hours") * 3600000000L, col("row_bytes"))
            .otherwise(0L)).as("est_bytes"))
        .select(col("lag_hours"), col("rows_resent"), col("est_bytes"),
          round(expr("CAST(rows_resent AS DOUBLE) / n_total"), 9)
            .as("pct_of_table"))
        .orderBy(col("lag_hours"))
    },
    Some("""WITH wm AS (SELECT max(epoch_us(ts))::BIGINT AS wm_us,
          count(*)::BIGINT AS n_total FROM events),
      fan AS (SELECT epoch_us(ts)::BIGINT AS ts_us,
          CAST(32 + length(event_type) + length(props) AS BIGINT)
            AS row_bytes,
          wm_us, n_total, lag_hours
        FROM events, wm,
          (SELECT CAST(unnest([1, 6, 24]) AS BIGINT) AS lag_hours)),
      red AS (SELECT lag_hours, n_total,
          sum(CASE WHEN ts_us > wm_us - lag_hours * 3600000000
            THEN 1 ELSE 0 END)::BIGINT AS rows_resent,
          sum(CASE WHEN ts_us > wm_us - lag_hours * 3600000000
            THEN row_bytes ELSE 0 END)::BIGINT AS est_bytes
        FROM fan GROUP BY 1, 2)
      SELECT lag_hours, rows_resent, est_bytes,
        round(CAST(rows_resent AS DOUBLE) / n_total, 9) AS pct_of_table
      FROM red ORDER BY lag_hours"""))

  // ---------- q457: Taylor's power law (fluctuation scaling) --------------

  /** Taylor's power-law exponent over per-brand daily demand — the
    * fluctuation-scaling read on top of q227's per-type Fano factors:
    * across brands, daily-quantity variance grows as mean^b, and b
    * (the slope of ln var on ln mean across the bounded brand frame)
    * is the one number separating Poisson-like demand (b ≈ 1, safety
    * stock ∝ √mean) from synchronized/bursty demand (b → 2, safety
    * stock ∝ mean — a different warehouse). Per-(brand, day) integer
    * quantity sums are the only corpus-sized pass; per-brand moments,
    * the nano-pinned logs, and the DECIMAL-lifted OLS over ≤|brands|
    * rows are all dimension-bounded. 1-row output (slope, intercept,
    * R²).
    */
  private val q457 = QueryDef(
    "q457_taylor_power_law",
    (s, dir) => {
      val bd = Fixtures.table(s, dir, "lineitem")
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"),
          expr("CAST(l_shipdate AS DATE)").as("d"))
        .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("q"))
      def dl(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
      val br = bd.groupBy(col("p_brand"))
        .agg(count(lit(1)).as("nd"), sum(col("q")).as("sq"),
          sum(dl(col("q")) * col("q")).as("sqq"))
        .where(col("nd") >= 2)
        .select(expr("CAST(sq AS DOUBLE) / nd").as("mv"),
          expr("""(CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq / nd)
            / (CAST(nd AS DOUBLE) - 1.0)""").as("vv"))
        // degenerate brands (constant daily demand -> var 0) carry no
        // log-scale information and would blow up ln; both dialects drop
        .where(col("vv") > 0.0)
        .select(
          expr("CAST(round(ln(mv) * 1e9) AS BIGINT)").as("x"),
          expr("CAST(round(ln(vv) * 1e9) AS BIGINT)").as("y"))
      val m = br.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(dl(col("x")) * col("x")).as("sxx"),
        sum(dl(col("x")) * col("y")).as("sxy"),
        sum(dl(col("y")) * col("y")).as("syy"))
      m.select(col("n").as("n_brands"),
        round(expr("""(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
          / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)"""), 9)
          .as("taylor_b"),
        round(expr("""(CAST(sy AS DOUBLE) - (n * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * sy) / (n * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * sx) * sx) / n / 1e9"""), 9)
          .as("intercept_ln_a"),
        round(expr("""((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
          * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy))
          / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
            * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy))"""),
          9).as("r2"))
    },
    Some("""WITH bd AS (SELECT p_brand, l_shipdate::DATE AS d,
          sum(CAST(l_quantity AS BIGINT))::BIGINT AS q
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2),
      mv AS (SELECT CAST(sq AS DOUBLE) / nd AS mv,
          (CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq / nd)
            / (CAST(nd AS DOUBLE) - 1.0) AS vv
        FROM (SELECT p_brand, count(*)::BIGINT AS nd,
            sum(q)::BIGINT AS sq, sum(q::HUGEINT * q) AS sqq
          FROM bd GROUP BY 1)
        WHERE nd >= 2),
      br AS (SELECT
          CAST(round(ln(mv) * 1e9) AS BIGINT) AS x,
          CAST(round(ln(vv) * 1e9) AS BIGINT) AS y
        FROM mv WHERE vv > 0.0),
      m AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
          sum(y)::BIGINT AS sy, sum(x::HUGEINT * x) AS sxx,
          sum(x::HUGEINT * y) AS sxy, sum(y::HUGEINT * y) AS syy
        FROM br)
      SELECT n AS n_brands,
        round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
          / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx), 9)
          AS taylor_b,
        round((CAST(sy AS DOUBLE) - (n * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * sy) / (n * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * sx) * sx) / n / 1e9, 9)
          AS intercept_ln_a,
        round(((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
          * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy))
          / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
            * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)), 9)
          AS r2
      FROM m"""))

  // ---------- q458: Benjamini–Yekutieli FDR under dependence --------------

  /** BH vs BY multiplicity control over the per-brand return-rate
    * screen — the DEPENDENCE-ROBUST member next to q292's plain BH:
    * brand tests share the pooled rate (positively dependent), and BY
    * divides each BH threshold by c(m) = Σ1/i, the price of arbitrary
    * dependence; reporting both reject sets shows what that insurance
    * costs in discoveries. Per-brand z vs the pooled rate is the
    * standard one-sample screen; p-values are nano-pinned, ranked by
    * (p, brand) over the bounded ≤|brands| frame, c(m) folds from
    * nano-pinned 1/i terms (order-free), and both step-up thresholds
    * compare in EXACT integer arithmetic (p·m ≤ i·α·10⁹, lifted to
    * DECIMAL for the BY product). One grouped corpus pass; bounded
    * window math; one row per brand ordered by p.
    */
  private val q458 = QueryDef(
    "q458_benjamini_yekutieli",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val g = Fixtures.table(s, dir, "lineitem")
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("r"))
      val tot = g.agg(sum(col("n")).as("nt"), sum(col("r")).as("rt"),
        count(lit(1)).as("m"))
      val p = g.crossJoin(broadcast(tot))
        .select(col("p_brand"), col("n"), col("m"),
          expr("CAST(round(2.0 * " + Portable.normCdfUpper(
            """abs((CAST(r AS DOUBLE) / n - CAST(rt AS DOUBLE) / nt)
              / sqrt((CAST(rt AS DOUBLE) / nt)
                * (1.0 - CAST(rt AS DOUBLE) / nt) / n))""") +
            " * 1e9) AS BIGINT)").as("p_nano"))
      val w = Window.orderBy(col("p_nano"), col("p_brand"))
      val ranked = p
        .withColumn("i", row_number().over(w))
        .withColumn("c_nano",
          sum(expr("CAST(round(1e9 / i) AS BIGINT)")).over(
            Window.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)))
        .withColumn("bh_ok", col("p_nano") * col("m")
          <= col("i") * 50000000L)
        .withColumn("by_ok",
          col("p_nano").cast(DecimalType(38, 0)) * col("m")
            * col("c_nano")
          <= col("i").cast(DecimalType(38, 0)) * 50000000L
            * 1000000000L)
      val cut = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      ranked
        .withColumn("bh_imax",
          max(when(col("bh_ok"), col("i"))).over(cut))
        .withColumn("by_imax",
          max(when(col("by_ok"), col("i"))).over(cut))
        .select(col("p_brand"), col("n").as("n_lines"),
          round(col("p_nano") / lit(1e9), 9).as("p_value"),
          (col("i") <= coalesce(col("bh_imax"), lit(0))).as("bh_reject"),
          (col("i") <= coalesce(col("by_imax"), lit(0))).as("by_reject"))
        .orderBy(col("p_value"), col("p_brand"))
    },
    Some(s"""WITH g AS (SELECT p_brand, count(*)::BIGINT AS n,
          sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT
            AS r
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1),
      tot AS (SELECT sum(n)::BIGINT AS nt, sum(r)::BIGINT AS rt,
          count(*)::BIGINT AS m FROM g),
      p AS (SELECT p_brand, n, m,
          CAST(round(2.0 * ${Portable.normCdfUpper(
            """abs((CAST(r AS DOUBLE) / n - CAST(rt AS DOUBLE) / nt)
              / sqrt((CAST(rt AS DOUBLE) / nt)
                * (1.0 - CAST(rt AS DOUBLE) / nt) / n))""")}
            * 1e9) AS BIGINT) AS p_nano
        FROM g, tot),
      ranked AS (SELECT p_brand, n, m, p_nano,
          row_number() OVER (ORDER BY p_nano, p_brand) AS i
        FROM p),
      withc AS (SELECT *,
          sum(CAST(round(1e9 / i) AS BIGINT)) OVER () AS c_nano
        FROM ranked),
      flags AS (SELECT *,
          p_nano * m <= i * 50000000 AS bh_ok,
          p_nano::HUGEINT * m * c_nano
            <= i::HUGEINT * 50000000 * 1000000000 AS by_ok
        FROM withc),
      cuts AS (SELECT *,
          max(CASE WHEN bh_ok THEN i END) OVER () AS bh_imax,
          max(CASE WHEN by_ok THEN i END) OVER () AS by_imax
        FROM flags)
      SELECT p_brand, n AS n_lines,
        round(p_nano / 1e9, 9) AS p_value,
        i <= coalesce(bh_imax, 0) AS bh_reject,
        i <= coalesce(by_imax, 0) AS by_reject
      FROM cuts ORDER BY p_value, p_brand"""))

  // ---------- q459: two-way ANOVA (unweighted means) ----------------------

  /** Two-way factorial ANOVA of order value on priority × market
    * segment via the UNWEIGHTED-MEANS analysis — the factorial member
    * the location family lacked (q358/q447 are one-way; q302
    * stratifies but doesn't test interaction): with unbalanced cells
    * the unweighted-means method (each cell mean counts once,
    * effective n = harmonic mean of cell sizes) is the classical
    * closed-form decomposition into SSA (priority), SSB (segment) and
    * SSAB (interaction), each tested against the pooled within-cell
    * MSE. Everything folds from the bounded p×q cell-moment table
    * (n, Σcents, Σcents² per cell — one corpus pass through two
    * broadcast-joined dims); cell means and the three effect sums are
    * nano-pinned before the ≤25-row reduces. p-values via the χ²
    * limit of df1·F (denominator df in the thousands — documented).
    * 3-row output, one per effect.
    */
  private val q459 = QueryDef(
    "q459_two_way_anova",
    (s, dir) => {
      // spread + freeze (r15): the cents round + decimal square ran
      // serial in the single-row-group scan task, and the bounded cell
      // table `m` feeds FOUR consumers (tot/ra/rb/gab) — each re-ran
      // the whole fact aggregate before (wall 1.36 s vs 0.9 cpu-s)
      val cells = Fixtures.spread(s, dir, "orders")
        .join(broadcast(Fixtures.table(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderpriority").as("a"),
          col("c_mktsegment").as("b"),
          expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").as("y"))
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum(col("y").cast(DecimalType(38, 0)) * col("y")).as("syy"))
      val m = PlanCache.freeze(cells.select(col("a"), col("b"), col("n"),
        expr("CAST(round(CAST(sy AS DOUBLE) / n * 1e3) AS BIGINT)")
          .as("m_milli"),
        expr("""CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
          * CAST(sy AS DOUBLE) / n""").as("ssw"),
        expr("CAST(round(1e12 / n) AS BIGINT)").as("inv_pico")))
      // p and q come from GLOBAL distinct level counts of the two dims —
      // per-group counts (levels present per a / per b) would silently
      // diverge from these if any p×q cell were empty, mixing
      // inconsistent level counts into SSA/SSB/MS
      val tot = m.agg(count(lit(1)).as("cells"), sum(col("n")).as("nt"),
        countDistinct(col("a")).as("p"),
        countDistinct(col("b")).as("q"),
        sum(expr("CAST(round(ssw * 1e-3) AS DECIMAL(38,0))"))
          .as("ssw_kilo"),
        sum(col("inv_pico")).as("sinv"),
        sum(col("m_milli")).as("sm"))
      val ra = m.groupBy(col("a")).agg(sum(col("m_milli")).as("sma"))
      val rb = m.groupBy(col("b")).agg(sum(col("m_milli")).as("smb"))
      val ga = ra.crossJoin(broadcast(tot))
        .select(expr("""CAST(round((sma / CAST(q AS DOUBLE)
            - sm / CAST(cells AS DOUBLE))
            * (sma / CAST(q AS DOUBLE) - sm / CAST(cells AS DOUBLE))
            * 1e-3) AS DECIMAL(38,0))""").as("da_kilo"))
        .agg(sum(col("da_kilo")).as("ssa_kilo"))
      val gb = rb.crossJoin(broadcast(tot))
        .select(expr("""CAST(round((smb / CAST(p AS DOUBLE)
            - sm / CAST(cells AS DOUBLE))
            * (smb / CAST(p AS DOUBLE) - sm / CAST(cells AS DOUBLE))
            * 1e-3) AS DECIMAL(38,0))""").as("db_kilo"))
        .agg(sum(col("db_kilo")).as("ssb_kilo"))
      val gab = m
        .join(broadcast(ra.select(col("a"), col("sma"))), "a")
        .join(broadcast(rb.select(col("b"), col("smb"))), "b")
        .crossJoin(broadcast(tot))
        .select(expr("""CAST(round((m_milli - sma / CAST(q AS DOUBLE)
          - smb / CAST(p AS DOUBLE) + sm / CAST(cells AS DOUBLE))
          * (m_milli - sma / CAST(q AS DOUBLE) - smb / CAST(p AS DOUBLE)
          + sm / CAST(cells AS DOUBLE)) * 1e-3) AS DECIMAL(38,0))""")
          .as("dab_kilo"))
        .agg(sum(col("dab_kilo")).as("ssab_kilo"))
      val base = tot.crossJoin(broadcast(ga)).crossJoin(broadcast(gb))
        .crossJoin(broadcast(gab))
        .select(col("cells"), col("nt"), col("p"), col("q"),
          // harmonic-mean cell size; ssw is already cents^2 (kilo-pinned),
          // the effect sums are milli-cents^2 (kilo-pinned) -> /1e6 to cents^2
          expr("CAST(cells AS DOUBLE) / (sinv / 1e12)").as("nh"),
          expr("CAST(ssw_kilo AS DOUBLE) * 1e3").as("ssw_c2"),
          expr("CAST(ssa_kilo AS DOUBLE) * 1e3 / 1e6").as("ssa_m2"),
          expr("CAST(ssb_kilo AS DOUBLE) * 1e3 / 1e6").as("ssb_m2"),
          expr("CAST(ssab_kilo AS DOUBLE) * 1e3 / 1e6").as("ssab_m2"))
        .select(col("cells"), col("nt"), col("p"), col("q"), col("nh"),
          expr("ssw_c2 / (CAST(nt AS DOUBLE) - cells)").as("mse"),
          col("ssa_m2"), col("ssb_m2"), col("ssab_m2"))
      base.select(explode(array(
          struct(lit("priority").as("effect"),
            expr("nh * q * ssa_m2 / (CAST(p AS DOUBLE) - 1.0)")
              .as("ms"),
            (col("p") - 1).as("df1")),
          struct(lit("segment").as("effect"),
            expr("nh * p * ssb_m2 / (CAST(q AS DOUBLE) - 1.0)")
              .as("ms"),
            (col("q") - 1).as("df1")),
          struct(lit("interaction").as("effect"),
            expr("""nh * ssab_m2 / ((CAST(p AS DOUBLE) - 1.0)
              * (CAST(q AS DOUBLE) - 1.0))""").as("ms"),
            ((col("p") - 1) * (col("q") - 1)).as("df1")))).as("e"),
          col("mse"))
        .select(col("e.effect").as("effect"), col("e.df1").as("df1"),
          round(expr("e.ms / mse"), 6).as("f_stat"),
          round(expr(Portable.chi2UpperP(
            "CAST(e.df1 AS DOUBLE) * (e.ms / mse)",
            "CAST(e.df1 AS DOUBLE)")), 9).as("p_approx"))
        .orderBy(col("effect"))
    },
    Some(s"""WITH cells AS (SELECT o_orderpriority AS a,
          c_mktsegment AS b, count(*)::BIGINT AS n,
          sum(CAST(round(o_totalprice * 100.0) AS BIGINT))::BIGINT AS sy,
          sum(CAST(round(o_totalprice * 100.0) AS BIGINT)::HUGEINT
            * CAST(round(o_totalprice * 100.0) AS BIGINT)) AS syy
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2),
      m AS (SELECT a, b, n,
          CAST(round(CAST(sy AS DOUBLE) / n * 1e3) AS BIGINT) AS m_milli,
          CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
            * CAST(sy AS DOUBLE) / n AS ssw,
          CAST(round(1e12 / n) AS BIGINT) AS inv_pico
        FROM cells),
      tot AS (SELECT count(*)::BIGINT AS cells, sum(n)::BIGINT AS nt,
          count(DISTINCT a)::BIGINT AS p, count(DISTINCT b)::BIGINT AS q,
          sum(CAST(round(ssw * 1e-3) AS DECIMAL(38,0))) AS ssw_kilo,
          sum(inv_pico)::BIGINT AS sinv, sum(m_milli)::BIGINT AS sm
        FROM m),
      ra AS (SELECT a, sum(m_milli)::BIGINT AS sma FROM m GROUP BY 1),
      rb AS (SELECT b, sum(m_milli)::BIGINT AS smb FROM m GROUP BY 1),
      ga AS (SELECT
          sum(CAST(round((sma / CAST(q AS DOUBLE)
            - sm / CAST(cells AS DOUBLE))
            * (sma / CAST(q AS DOUBLE) - sm / CAST(cells AS DOUBLE))
            * 1e-3) AS DECIMAL(38,0))) AS ssa_kilo
        FROM ra, tot),
      gb AS (SELECT
          sum(CAST(round((smb / CAST(p AS DOUBLE)
            - sm / CAST(cells AS DOUBLE))
            * (smb / CAST(p AS DOUBLE) - sm / CAST(cells AS DOUBLE))
            * 1e-3) AS DECIMAL(38,0))) AS ssb_kilo
        FROM rb, tot),
      gab AS (SELECT sum(CAST(round((m_milli - sma / CAST(q AS DOUBLE)
            - smb / CAST(p AS DOUBLE) + sm / CAST(cells AS DOUBLE))
            * (m_milli - sma / CAST(q AS DOUBLE)
              - smb / CAST(p AS DOUBLE) + sm / CAST(cells AS DOUBLE))
            * 1e-3) AS DECIMAL(38,0))) AS ssab_kilo
        FROM m JOIN ra USING (a) JOIN rb USING (b), tot),
      base AS (SELECT cells, nt, p, q,
          CAST(cells AS DOUBLE) / (sinv / 1e12) AS nh,
          (CAST(ssw_kilo AS DOUBLE) * 1e3)
            / (CAST(nt AS DOUBLE) - cells) AS mse,
          CAST(ssa_kilo AS DOUBLE) * 1e3 / 1e6 AS ssa_m2,
          CAST(ssb_kilo AS DOUBLE) * 1e3 / 1e6 AS ssb_m2,
          CAST(ssab_kilo AS DOUBLE) * 1e3 / 1e6 AS ssab_m2
        FROM tot, ga, gb, gab),
      rows3 AS (
        SELECT 'priority' AS effect, p - 1 AS df1,
          nh * q * ssa_m2 / (CAST(p AS DOUBLE) - 1.0) AS ms, mse
          FROM base
        UNION ALL
        SELECT 'segment', q - 1,
          nh * p * ssb_m2 / (CAST(q AS DOUBLE) - 1.0), mse FROM base
        UNION ALL
        SELECT 'interaction', (p - 1) * (q - 1),
          nh * ssab_m2 / ((CAST(p AS DOUBLE) - 1.0)
            * (CAST(q AS DOUBLE) - 1.0)), mse FROM base)
      SELECT effect, df1, round(ms / mse, 6) AS f_stat,
        round(${Portable.chi2UpperP("CAST(df1 AS DOUBLE) * (ms / mse)",
          "CAST(df1 AS DOUBLE)")}, 9) AS p_approx
      FROM rows3 ORDER BY effect"""))

  // ---------- q460: Wilson score intervals --------------------------------

  /** Wilson score 95 % intervals for the per-priority rate of 'F'
    * (finished) orders, next to the naive Wald interval — the
    * PROPORTION-interval member the family lacked (q205 does Wald
    * error-rate CIs; q312 is Bayesian): Wilson inverts the score test,
    * never leaves [0,1], and stays honest at extreme rates where Wald
    * collapses; the emitted wald_defective flag marks exactly those
    * rows (Wald bound outside [0,1]). One grouped counting pass, all
    * interval math on the bounded ≤k-row frame. 5-row output.
    */
  private val q460 = QueryDef(
    "q460_wilson_ci",
    (s, dir) => {
      val g = Fixtures.table(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
            .as("r"))
      g.select(col("o_orderpriority").as("priority"), col("n"),
          col("r"), expr("CAST(r AS DOUBLE) / n").as("ph"))
        .select(col("priority"), col("n"), col("r"),
          round(col("ph"), 9).as("rate"),
          round(expr("""(ph + 1.9208e0 / n - 1.96e0
            * sqrt(ph * (1.0 - ph) / n + 0.9604e0 / (n * CAST(n AS
            DOUBLE)))) / (1.0 + 3.8416e0 / n)"""), 9).as("wilson_lo"),
          round(expr("""(ph + 1.9208e0 / n + 1.96e0
            * sqrt(ph * (1.0 - ph) / n + 0.9604e0 / (n * CAST(n AS
            DOUBLE)))) / (1.0 + 3.8416e0 / n)"""), 9).as("wilson_hi"),
          round(expr("ph - 1.96e0 * sqrt(ph * (1.0 - ph) / n)"), 9)
            .as("wald_lo"),
          round(expr("ph + 1.96e0 * sqrt(ph * (1.0 - ph) / n)"), 9)
            .as("wald_hi"),
          expr("""ph - 1.96e0 * sqrt(ph * (1.0 - ph) / n) < 0.0
            OR ph + 1.96e0 * sqrt(ph * (1.0 - ph) / n) > 1.0""")
            .as("wald_defective"))
        .orderBy(col("priority"))
    },
    Some("""WITH g AS (SELECT o_orderpriority AS priority,
          count(*)::BIGINT AS n,
          sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT
            AS r
        FROM orders GROUP BY 1),
      ph AS (SELECT priority, n, r, CAST(r AS DOUBLE) / n AS ph FROM g)
      SELECT priority, n, r, round(ph, 9) AS rate,
        round((ph + 1.9208e0 / n - 1.96e0 * sqrt(ph * (1.0 - ph) / n
          + 0.9604e0 / (n * CAST(n AS DOUBLE)))) / (1.0 + 3.8416e0 / n),
          9) AS wilson_lo,
        round((ph + 1.9208e0 / n + 1.96e0 * sqrt(ph * (1.0 - ph) / n
          + 0.9604e0 / (n * CAST(n AS DOUBLE)))) / (1.0 + 3.8416e0 / n),
          9) AS wilson_hi,
        round(ph - 1.96e0 * sqrt(ph * (1.0 - ph) / n), 9) AS wald_lo,
        round(ph + 1.96e0 * sqrt(ph * (1.0 - ph) / n), 9) AS wald_hi,
        (ph - 1.96e0 * sqrt(ph * (1.0 - ph) / n) < 0.0
          OR ph + 1.96e0 * sqrt(ph * (1.0 - ph) / n) > 1.0)
          AS wald_defective
      FROM ph ORDER BY priority"""))

  // ---------- q461: two-sample Cramér–von Mises (binned) ------------------

  /** Two-sample Cramér–von Mises ω² between open ('O') and finished
    * ('F') order values — the INTEGRAL-metric sibling of q114's KS
    * (which sees only the single largest ECDF gap; CvM integrates the
    * squared gap over the whole distribution and catches spread-out
    * differences KS dilutes). Values ride the $4000-bin convention
    * (q441 geometry), so both ECDFs are exact cumulative shares over
    * the bounded bin table, the per-bin (F₁−F₂)² mass is nano-pinned
    * before the bounded sum, and T = n₁n₂/N² Σ t_bin·Δ² follows the
    * ties-as-bins convention (stated in both dialects). One corpus
    * counting pass, bounded window math, 1-row output against the
    * 0.461 asymptotic 5 % critical value.
    */
  private val q461 = QueryDef(
    "q461_cvm_two_sample",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cells = Fixtures.table(s, dir, "orders")
        .where(col("o_orderstatus").isin("O", "F"))
        .select(col("o_orderstatus").as("g"),
          expr("CAST(round(o_totalprice) AS BIGINT) div 4000").as("v"))
        .groupBy(col("v"))
        .agg(sum(when(col("g") === "O", 1L).otherwise(0L)).as("w1"),
          sum(when(col("g") === "F", 1L).otherwise(0L)).as("w2"))
      val nn = cells.agg(sum(col("w1")).as("n1"), sum(col("w2")).as("n2"))
      val wv = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val scored = cells.crossJoin(broadcast(nn))
        .withColumn("c1", sum(col("w1")).over(wv))
        .withColumn("c2", sum(col("w2")).over(wv))
        .select(col("n1"), col("n2"), (col("w1") + col("w2")).as("t"),
          expr("""CAST(round((CAST(c1 AS DOUBLE) / n1
            - CAST(c2 AS DOUBLE) / n2) * (CAST(c1 AS DOUBLE) / n1
            - CAST(c2 AS DOUBLE) / n2) * 1e9) AS BIGINT)""")
            .as("d2_nano"))
      scored.groupBy(col("n1"), col("n2"))
        .agg(sum(col("t").cast(DecimalType(38, 0)) * col("d2_nano"))
          .as("sd2"))
        .select(col("n1"), col("n2"),
          round(expr("""CAST(n1 AS DOUBLE) * n2
            / ((CAST(n1 AS DOUBLE) + n2) * (CAST(n1 AS DOUBLE) + n2))
            * (CAST(sd2 AS DOUBLE) / 1e9)"""), 9).as("cvm_t"),
          expr("""CAST(n1 AS DOUBLE) * n2
            / ((CAST(n1 AS DOUBLE) + n2) * (CAST(n1 AS DOUBLE) + n2))
            * (CAST(sd2 AS DOUBLE) / 1e9) > 0.461e0""")
            .as("reject_5pct"))
    },
    Some("""WITH cells AS (SELECT
          CAST(round(o_totalprice) AS BIGINT) // 4000 AS v,
          sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT
            AS w1,
          sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT
            AS w2
        FROM orders WHERE o_orderstatus IN ('O', 'F')
        GROUP BY 1),
      nn AS (SELECT sum(w1)::BIGINT AS n1, sum(w2)::BIGINT AS n2
        FROM cells),
      scored AS (SELECT n1, n2, w1 + w2 AS t,
          CAST(round((CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2)
            * (CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2)
            * 1e9) AS BIGINT) AS d2_nano
        FROM (SELECT v, w1, w2, n1, n2,
            sum(w1) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
            sum(w2) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2
          FROM cells, nn)),
      red AS (SELECT n1, n2, sum(t::HUGEINT * d2_nano) AS sd2
        FROM scored GROUP BY 1, 2)
      SELECT n1, n2,
        round(CAST(n1 AS DOUBLE) * n2
          / ((CAST(n1 AS DOUBLE) + n2) * (CAST(n1 AS DOUBLE) + n2))
          * (CAST(sd2 AS DOUBLE) / 1e9), 9) AS cvm_t,
        CAST(n1 AS DOUBLE) * n2
          / ((CAST(n1 AS DOUBLE) + n2) * (CAST(n1 AS DOUBLE) + n2))
          * (CAST(sd2 AS DOUBLE) / 1e9) > 0.461e0 AS reject_5pct
      FROM red"""))

  // ---------- q462: one-lag Granger causality ------------------------------

  /** One-lag Granger test of "do yesterday's error events predict
    * today's purchases beyond purchases' own history?" — the
    * cross-series CAUSALITY read the time-series family lacked (q142
    * autocorrelates ONE series; q75-style correlations are
    * contemporaneous): restricted model y_t ~ y_{t−1}, unrestricted
    * adds x_{t−1}, F = (RSS_r − RSS_u)/(RSS_u/(n−3)). Both RSS fold
    * CLOSED-FORM from one exact integer moment vector over the day−1
    * lag join (observed consecutive days only — gaps drop the pair,
    * the standing q405/q426 convention): the 2-predictor normal
    * equations are 2×2 by hand exactly as q414. One per-day pass +
    * one lag join; every moment DECIMAL-lifted; 1-row output with the
    * χ²(1) p (the F(1, n−3) large-n limit, documented).
    */
  private val q462 = QueryDef(
    "q462_granger_one_lag",
    (s, dir) => {
      val daily = ev(s, dir)
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"), col("event_type"))
        .groupBy(col("day"))
        .agg(sum(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("y"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("x"))
      val lagd = daily.select((col("day") + 1).as("day"),
        col("y").as("yl"), col("x").as("xl"))
      def dl(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
      val m = daily.join(lagd, "day")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum(col("yl")).as("syl"), sum(col("xl")).as("sxl"),
          sum(dl(col("y")) * col("y")).as("syy"),
          sum(dl(col("yl")) * col("yl")).as("sylyl"),
          sum(dl(col("xl")) * col("xl")).as("sxlxl"),
          sum(dl(col("y")) * col("yl")).as("syyl"),
          sum(dl(col("y")) * col("xl")).as("syxl"),
          sum(dl(col("yl")) * col("xl")).as("sylxl"))
      // centered second moments (doubles from exact sums — identical
      // IEEE folds in both dialects)
      val c = m.select(col("n"),
        expr("CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n")
          .as("cyy"),
        expr("CAST(sylyl AS DOUBLE) - CAST(syl AS DOUBLE) * syl / n")
          .as("c11"),
        expr("CAST(sxlxl AS DOUBLE) - CAST(sxl AS DOUBLE) * sxl / n")
          .as("c22"),
        expr("CAST(syyl AS DOUBLE) - CAST(sy AS DOUBLE) * syl / n")
          .as("c1y"),
        expr("CAST(syxl AS DOUBLE) - CAST(sy AS DOUBLE) * sxl / n")
          .as("c2y"),
        expr("CAST(sylxl AS DOUBLE) - CAST(syl AS DOUBLE) * sxl / n")
          .as("c12"))
      c.select(col("n").as("n_pairs"),
          expr("cyy - c1y * c1y / c11").as("rss_r"),
          expr("""cyy - (c22 * c1y * c1y - 2.0 * c12 * c1y * c2y
            + c11 * c2y * c2y) / (c11 * c22 - c12 * c12)""")
            .as("rss_u"))
        .select(col("n_pairs"),
          round(col("rss_r"), 3).as("rss_restricted"),
          round(col("rss_u"), 3).as("rss_unrestricted"),
          round(expr("""(rss_r - rss_u)
            / (rss_u / (CAST(n_pairs AS DOUBLE) - 3.0))"""), 6)
            .as("f_stat"),
          round(expr("2.0 * " + Portable.normCdfUpper(
            """sqrt((rss_r - rss_u)
              / (rss_u / (CAST(n_pairs AS DOUBLE) - 3.0)))""")), 9)
            .as("p_value"))
    },
    Some(s"""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            ::BIGINT AS y,
          sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT
            AS x
        FROM events GROUP BY 1),
      j AS (SELECT d.y, l.y AS yl, l.x AS xl
        FROM daily d JOIN daily l ON l.day = d.day - 1),
      m AS (SELECT count(*)::BIGINT AS n, sum(y)::BIGINT AS sy,
          sum(yl)::BIGINT AS syl, sum(xl)::BIGINT AS sxl,
          sum(y::HUGEINT * y) AS syy, sum(yl::HUGEINT * yl) AS sylyl,
          sum(xl::HUGEINT * xl) AS sxlxl, sum(y::HUGEINT * yl) AS syyl,
          sum(y::HUGEINT * xl) AS syxl, sum(yl::HUGEINT * xl) AS sylxl
        FROM j),
      c AS (SELECT n,
          CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS cyy,
          CAST(sylyl AS DOUBLE) - CAST(syl AS DOUBLE) * syl / n AS c11,
          CAST(sxlxl AS DOUBLE) - CAST(sxl AS DOUBLE) * sxl / n AS c22,
          CAST(syyl AS DOUBLE) - CAST(sy AS DOUBLE) * syl / n AS c1y,
          CAST(syxl AS DOUBLE) - CAST(sy AS DOUBLE) * sxl / n AS c2y,
          CAST(sylxl AS DOUBLE) - CAST(syl AS DOUBLE) * sxl / n AS c12
        FROM m),
      r AS (SELECT n AS n_pairs,
          cyy - c1y * c1y / c11 AS rss_r,
          cyy - (c22 * c1y * c1y - 2.0 * c12 * c1y * c2y
            + c11 * c2y * c2y) / (c11 * c22 - c12 * c12) AS rss_u
        FROM c)
      SELECT n_pairs, round(rss_r, 3) AS rss_restricted,
        round(rss_u, 3) AS rss_unrestricted,
        round((rss_r - rss_u)
          / (rss_u / (CAST(n_pairs AS DOUBLE) - 3.0)), 6) AS f_stat,
        round(2.0 * ${Portable.normCdfUpper(
          """sqrt((rss_r - rss_u)
            / (rss_u / (CAST(n_pairs AS DOUBLE) - 3.0)))""")}, 9)
          AS p_value
      FROM r"""))

  // ---------- q463: cross-language vocabulary overlap ----------------------

  /** Pairwise top-200 vocabulary Jaccard between languages — the
    * tokenizer-sharing read a multilingual pipeline makes before
    * sizing a shared vocab (q433 sizes ONE language's budget; q110/
    * q125 compare corpus shares and term keyness, not the head-vocab
    * SETS a tokenizer actually allocates): high head overlap means a
    * shared vocabulary is cheap, low overlap means per-language merges
    * compete for slots. Shape: one tokenize+count pass into the
    * (lang, token) table, per-language top-200 by (count, token)
    * window (lang-partitioned — bounded output, deterministic ties),
    * then the pairwise intersection equi-join on token over the
    * ≤200·|langs| head table with |∪| = |A| + |B| − |∩| from measured
    * per-language head sizes (a language with < 200 distinct tokens
    * gets its true head size, not an assumed 200). Output one row per
    * language pair, ordered.
    */
  private val q463 = QueryDef(
    "q463_vocab_overlap",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tc = Fixtures.table(s, dir, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) > 0)
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("c").desc, col("tok"))
      val top = tc.withColumn("rk", row_number().over(w))
        .where(col("rk") <= 200)
        .select(col("lang"), col("tok"))
      // actual head size per language — a language with < 200 distinct
      // tokens would make the hardcoded |∪| = 400 − shared wrong, so
      // |∪| = |A| + |B| − shared with measured |A|, |B| (bounded table,
      // broadcast both sides of the size join)
      val hs = top.groupBy(col("lang")).agg(count(lit(1)).as("hn"))
      val a = top.select(col("lang").as("lang_a"), col("tok"))
      val b = top.select(col("lang").as("lang_b"), col("tok"))
      a.join(b, Seq("tok"))
        .where(col("lang_a") < col("lang_b"))
        .groupBy(col("lang_a"), col("lang_b"))
        .agg(count(lit(1)).as("n_shared"))
        .join(broadcast(hs.select(col("lang").as("lang_a"),
          col("hn").as("na"))), Seq("lang_a"))
        .join(broadcast(hs.select(col("lang").as("lang_b"),
          col("hn").as("nb"))), Seq("lang_b"))
        .select(col("lang_a"), col("lang_b"), col("n_shared"),
          round(expr("""CAST(n_shared AS DOUBLE)
            / (CAST(na AS DOUBLE) + nb - n_shared)"""), 9).as("jaccard"))
        .orderBy(col("lang_a"), col("lang_b"))
    },
    Some("""WITH tc AS (SELECT lang, tok, count(*)::BIGINT AS c
        FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
          FROM documents)
        WHERE length(tok) > 0
        GROUP BY 1, 2),
      top AS (SELECT lang, tok FROM (SELECT lang, tok,
          row_number() OVER (PARTITION BY lang
            ORDER BY c DESC, tok) AS rk
        FROM tc) WHERE rk <= 200),
      hs AS (SELECT lang, count(*)::BIGINT AS hn FROM top GROUP BY 1),
      pr AS (SELECT a.lang AS lang_a, b.lang AS lang_b,
          count(*)::BIGINT AS n_shared
        FROM top a JOIN top b ON a.tok = b.tok AND a.lang < b.lang
        GROUP BY 1, 2)
      SELECT lang_a, lang_b, n_shared,
        round(CAST(n_shared AS DOUBLE)
          / (CAST(ha.hn AS DOUBLE) + hb.hn - n_shared), 9) AS jaccard
      FROM pr JOIN hs ha ON pr.lang_a = ha.lang
        JOIN hs hb ON pr.lang_b = hb.lang
      ORDER BY lang_a, lang_b"""))

  // ---------- q464: streaming session-state planner ------------------------

  /** Peak concurrent session STATE of the 30-minute sessionizer — the
    * executor-memory planning read behind the graft.streaming
    * mapGroupsWithState twin: each open session holds state from its
    * first event until the inactivity timeout fires (end + 30 min),
    * so peak concurrent open sessions bounds the state store. Sessions
    * come from the PlanCache'd q27 assignment; lifetimes sweep at
    * HOURLY resolution (starts minus frees per hour, running sum over
    * the calendar-bounded hour frame — the documented convention: a
    * session freed within hour h counts closed by h's end, and the
    * upper-bound column re-adds hour-h frees). One bounded window; the
    * corpus cost is the shared session assignment. 1-row output.
    */
  private val q464 = QueryDef(
    "q464_session_state_planner",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val GapUs = 1800000000L
      val sess = Events.sessionAssigned(s, dir)
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")).as("s_us"),
          max(expr("timestampdiff(MICROSECOND, " +
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")).as("e_us"))
        .select(expr("s_us div 3600000000").as("sh"),
          expr(s"(e_us + $GapUs) div 3600000000").as("eh"))
      val deltas = sess.select(col("sh").as("h"), lit(1L).as("d"))
        .unionAll(sess.select(col("eh").as("h"), lit(-1L).as("d")))
        .groupBy(col("h")).agg(sum(col("d")).as("net"),
          sum(when(col("d") === -1L, 1L).otherwise(0L)).as("frees"))
      // densify to EVERY hour in the calendar span (idle hours where the
      // open count stays constant still count toward n_hours/mean_open —
      // the "hourly resolution" the docstring promises)
      val frame = deltas.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(explode(sequence(col("h0"), col("h1"))).as("h"))
      val dense = frame.join(deltas, Seq("h"), "left")
        .select(col("h"),
          coalesce(col("net"), lit(0L)).as("net"),
          coalesce(col("frees"), lit(0L)).as("frees"))
      val w = Window.orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val open = dense
        .withColumn("open_end", sum(col("net")).over(w))
        .select(col("h"), col("open_end"),
          (col("open_end") + col("frees")).as("open_upper"))
      val tot = sess.agg(count(lit(1)).as("n_sessions"))
      open.agg(count(lit(1)).as("n_hours"),
          max(col("open_end")).as("peak_open"),
          max(col("open_upper")).as("peak_open_upper"),
          expr("CAST(round(sum(open_end) * 1e6 / count(1)) AS BIGINT)")
            .as("mean_open_micro"))
        .crossJoin(broadcast(tot))
        .select(col("n_sessions"), col("n_hours"), col("peak_open"),
          col("peak_open_upper"),
          round(col("mean_open_micro") / lit(1e6), 6).as("mean_open"))
    },
    Some("""WITH flagged AS (
        SELECT user_id, ts, event_id,
          CASE WHEN lag(ts) OVER w IS NULL
            OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
            THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      numbered AS (
        SELECT user_id, ts,
          (sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING))::BIGINT AS session_seq
        FROM flagged),
      sess AS (SELECT min(epoch_us(ts)) // 3600000000 AS sh,
          (max(epoch_us(ts)) + 1800000000) // 3600000000 AS eh
        FROM numbered GROUP BY user_id, session_seq),
      deltas AS (SELECT h, sum(d)::BIGINT AS net,
          sum(CASE WHEN d = -1 THEN 1 ELSE 0 END)::BIGINT AS frees
        FROM (SELECT sh AS h, 1 AS d FROM sess
          UNION ALL SELECT eh, -1 FROM sess)
        GROUP BY 1),
      frame AS (SELECT unnest(range(h0, h1 + 1)) AS h
        FROM (SELECT min(h) AS h0, max(h) AS h1 FROM deltas)),
      dense AS (SELECT f.h,
          coalesce(d.net, 0)::BIGINT AS net,
          coalesce(d.frees, 0)::BIGINT AS frees
        FROM frame f LEFT JOIN deltas d ON f.h = d.h),
      open_t AS (SELECT h,
          (sum(net) OVER (ORDER BY h
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
            AS open_end,
          frees
        FROM dense),
      tot AS (SELECT count(*)::BIGINT AS n_sessions FROM sess),
      red AS (SELECT count(*)::BIGINT AS n_hours,
          max(open_end)::BIGINT AS peak_open,
          max(open_end + frees)::BIGINT AS peak_open_upper,
          CAST(round(sum(open_end) * 1e6 / count(*)) AS BIGINT)
            AS mean_open_micro
        FROM open_t)
      SELECT n_sessions, n_hours, peak_open, peak_open_upper,
        round(mean_open_micro / 1e6, 6) AS mean_open
      FROM red, tot"""))

  // ---------- q465: contamination n-gram-width sweep -----------------------

  /** Benchmark-contamination rate as a function of shingle width
    * (n ∈ {4, 8}) — the sensitivity sweep in front of q44's fixed-n
    * contamination check and q183's apply step: short shingles
    * over-flag (common phrases), long shingles under-flag (any edit
    * breaks the match), and the n-sweep shows where the rate
    * stabilizes — how decontamination n is actually chosen. Test docs
    * are the standing q37 hash split; per n, the test set's distinct
    * n-gram hashes form the (broadcast-sized) probe set and train
    * docs sharing ≥ 1 hash are flagged. Shingle hash = the rolling
    * (((h·K + h)·K…) mod P) chain over the per-token md5 hashes (K, P
    * = the q18 constants; mod applied per step so products stay
    * exact, stated identically in both dialects). Two window passes
    * over the posting rows (lead chains share one per-doc sort); the
    * candidate join is an equi-join on the hash. 2-row output.
    */
  private val q465 = QueryDef(
    "q465_contamination_sweep",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val K = Dedup.C1
      val P = Dedup.P
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val base = Fixtures.table(s, dir, "documents")
        .select(col("doc_id"), expr(Portable.splitCaseSpark).as("split"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .select(col("doc_id"), col("split"), col("pos"),
          expr(Portable.h32Spark("tok")).as("h0"))
      // frozen ONCE for BOTH widths (r16): the tokenize+md5+7-lead
      // window chain over ~1M token rows was re-executed inside each
      // width's frozen shingle build (≈half this query's executor cpu);
      // both gram(4) and gram(8) read the same h0..h7 columns, so one
      // materialization (pos dropped — only the leads matter) serves
      // the two sweep arms. Released after the query like every freeze.
      val withLeads = PlanCache.freeze(
        (1 to 7).foldLeft(base) { (df, i) =>
          df.withColumn(s"h$i", lead(col("h0"), i).over(w))
        }.select(col("doc_id") +: col("split") +:
          (0 to 7).map(i => col(s"h$i")): _*))
      def gram(n: Int): String =
        (1 until n).foldLeft("h0") { (acc, i) =>
          s"pmod(($acc) * $K + h$i, $P)"
        }
      def leak(n: Int): DataFrame = {
        // frozen (r15): each width's distinct shingle table feeds THREE
        // consumers (test probe set, train side, train totals) — the
        // tokenize+md5+7-lead window chain executed per consumer before
        val sh = PlanCache.freeze(withLeads
          .where(col(s"h${n - 1}").isNotNull)
          .select(col("doc_id"), col("split"),
            expr(gram(n)).as("g")).distinct())
        val testSet = sh.where(col("split") === "test")
          .select(col("g")).distinct()
        val trainDocs = sh.where(col("split") === "train")
        val hit = trainDocs.join(testSet, Seq("g"), "left_semi")
          .select(col("doc_id")).distinct()
          .agg(count(lit(1)).as("n_train_docs_hit"))
        val stats = trainDocs.select(col("doc_id")).distinct()
          .agg(count(lit(1)).as("n_train_docs"))
          .crossJoin(broadcast(testSet.agg(count(lit(1))
            .as("n_test_shingles"))))
        stats.crossJoin(broadcast(hit))
          .select(lit(n.toLong).as("n_gram"), col("n_test_shingles"),
            col("n_train_docs"), col("n_train_docs_hit"),
            round(expr("CAST(n_train_docs_hit AS DOUBLE) / n_train_docs"),
              9).as("hit_rate"))
      }
      leak(4).unionAll(leak(8)).orderBy(col("n_gram"))
    },
    Some {
      val K = Dedup.C1
      val P = Dedup.P
      def gramDuck(n: Int): String =
        (1 until n).foldLeft("hts[i]") { (acc, i) =>
          s"(($acc) * $K + hts[i + $i]) % $P"
        }
      def oneN(n: Int): String =
        s"""SELECT $n::BIGINT AS n_gram,
          (SELECT count(DISTINCT g) FROM sh$n WHERE split = 'test')
            ::BIGINT AS n_test_shingles,
          (SELECT count(DISTINCT doc_id) FROM sh$n WHERE split = 'train')
            ::BIGINT AS n_train_docs,
          (SELECT count(DISTINCT doc_id) FROM sh$n
            WHERE split = 'train' AND g IN
              (SELECT g FROM sh$n WHERE split = 'test'))::BIGINT
            AS n_train_docs_hit,
          round((SELECT count(DISTINCT doc_id) FROM sh$n
              WHERE split = 'train' AND g IN
                (SELECT g FROM sh$n WHERE split = 'test'))::DOUBLE
            / (SELECT count(DISTINCT doc_id) FROM sh$n
              WHERE split = 'train'), 9) AS hit_rate"""
      s"""WITH toks AS (SELECT doc_id, ${Portable.splitCaseDuck} AS split,
          string_split(text, ' ') AS toks FROM documents),
      hts AS (SELECT doc_id, split,
          list_transform(toks, t -> ${Portable.h32Duck("t")}) AS hts
        FROM toks),
      sh4 AS (SELECT DISTINCT doc_id, split, g FROM (
        SELECT doc_id, split,
          unnest(list_transform(range(1, len(hts) - 2),
            i -> ${gramDuck(4)})) AS g
        FROM hts WHERE len(hts) >= 4)),
      sh8 AS (SELECT DISTINCT doc_id, split, g FROM (
        SELECT doc_id, split,
          unnest(list_transform(range(1, len(hts) - 6),
            i -> ${gramDuck(8)})) AS g
        FROM hts WHERE len(hts) >= 8))
      ${oneN(4)} UNION ALL ${oneN(8)} ORDER BY n_gram"""
    })

  // ---------- q466: quality-gate Venn census --------------------------------

  /** Joint census of three independent quality gates — the
    * filter-correlation read a curation pipeline makes before stacking
    * gates (if two gates reject the same docs, the second buys
    * nothing; if they're independent, the stack multiplies): gate A =
    * length (≥ 50 tokens), gate B = lexical diversity (distinct/total
    * ≥ 0.3, compared in exact integers as 10·distinct ≥ 3·total),
    * gate C = mean token length in [3, 10] chars (token chars = len −
    * spaces under the single-space convention, again exact integers).
    * One projection pass; the census is the 8-cell (a, b, c) group
    * with shares, plus each gate's marginal pass rate folded from the
    * same cells. ≤8-row output, ordered.
    */
  private val q466 = QueryDef(
    "q466_quality_filter_venn",
    (s, dir) => {
      val flags = Fixtures.table(s, dir, "documents")
        .select(
          (size(split(col("text"), " ")) >= 50).as("pass_len"),
          (size(array_distinct(split(col("text"), " "))) * 10
            >= size(split(col("text"), " ")) * 3).as("pass_ttr"),
          expr("""length(text) - (size(split(text, ' ')) - 1)
              BETWEEN 3 * size(split(text, ' '))
              AND 10 * size(split(text, ' '))""").as("pass_wlen"))
      val tot = flags.agg(count(lit(1)).as("n_docs"))
      flags.groupBy(col("pass_len"), col("pass_ttr"), col("pass_wlen"))
        .agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(tot))
        .select(col("pass_len"), col("pass_ttr"), col("pass_wlen"),
          col("n"),
          round(expr("CAST(n AS DOUBLE) / n_docs"), 9).as("share"))
        .orderBy(col("pass_len"), col("pass_ttr"), col("pass_wlen"))
    },
    Some("""WITH flags AS (SELECT
          len(string_split(text, ' ')) >= 50 AS pass_len,
          len(list_distinct(string_split(text, ' '))) * 10
            >= len(string_split(text, ' ')) * 3 AS pass_ttr,
          length(text) - (len(string_split(text, ' ')) - 1)
            BETWEEN 3 * len(string_split(text, ' '))
            AND 10 * len(string_split(text, ' ')) AS pass_wlen
        FROM documents),
      tot AS (SELECT count(*)::BIGINT AS n_docs FROM flags)
      SELECT pass_len, pass_ttr, pass_wlen, count(*)::BIGINT AS n,
        round(count(*)::DOUBLE / n_docs, 9) AS share
      FROM flags, tot
      GROUP BY pass_len, pass_ttr, pass_wlen, n_docs
      ORDER BY pass_len, pass_ttr, pass_wlen"""))

  // ---------- q467: length-stratified duplicate rate -------------------------

  /** Exact-duplicate rate by document-length class — the WHERE of
    * duplication q17's flat count hides: template spam concentrates in
    * specific length bands (short boilerplate, fixed-form pages), and
    * a curation pass reads this before deciding whether dedup should
    * gate on length at all. Doc → q17's normalized md5 content key,
    * reduced ONCE to (key, len_class, n) cells — both the key totals
    * and the census fold from that cell table, so the expensive
    * regex+md5 scan runs once and the cell exchange is reused across
    * the join's two sides (the plan-level point: joining raw keyed
    * rows to key counts would rescan the corpus per side). Strata =
    * n_chars div 500 capped at 9. 10-row output.
    */
  private val q467 = QueryDef(
    "q467_length_dup_strata",
    (s, dir) => {
      val cells = Fixtures.table(s, dir, "documents")
        .select(least(expr("n_chars div 500"), lit(9L)).as("len_class"),
          md5(expr("graft_norm_text(text)")).as("k"))
        .groupBy(col("k"), col("len_class"))
        .agg(count(lit(1)).as("n"))
      val kc = cells.groupBy(col("k")).agg(sum(col("n")).as("nk"))
      cells.join(kc, "k")
        .groupBy(col("len_class"))
        .agg(sum(col("n")).as("n_docs"),
          sum(when(col("nk") > 1, col("n")).otherwise(0L))
            .as("n_dup_docs"))
        .select(col("len_class"), col("n_docs"), col("n_dup_docs"),
          round(expr("CAST(n_dup_docs AS DOUBLE) / n_docs"), 9)
            .as("dup_rate"))
        .orderBy(col("len_class"))
    },
    Some("""WITH cells AS (SELECT
          least(n_chars // 500, 9)::BIGINT AS len_class,
          md5(trim(regexp_replace(
            regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
            ' +', ' ', 'g'))) AS k,
          count(*)::BIGINT AS n
        FROM documents GROUP BY 1, 2),
      kc AS (SELECT k, sum(n)::BIGINT AS nk FROM cells GROUP BY 1)
      SELECT len_class, sum(n)::BIGINT AS n_docs,
        sum(CASE WHEN nk > 1 THEN n ELSE 0 END)::BIGINT AS n_dup_docs,
        round(sum(CASE WHEN nk > 1 THEN n ELSE 0 END)::DOUBLE
          / sum(n), 9) AS dup_rate
      FROM cells JOIN kc USING (k)
      GROUP BY 1 ORDER BY 1"""))

  // ---------- q468: cross-split LSH leakage --------------------------------

  /** Near-duplicate leakage between the train and test splits via
    * MinHash-LSH bands — the SCALE path of q156's exact shingle-overlap
    * leakage check: at corpus scale the exact cross-split join is a
    * full posting-table self-join, while band collisions cost shuffle
    * ∝ collisions (the q18 contract) and candidates are verified
    * downstream by q156's exact pass on the flagged pairs only. Bands
    * ride the PlanCache'd inverted index and the q18 signature
    * pipeline; the split is the standing q37 hash assignment; the
    * cross join is train-side × test-side on (band, bkey) — never
    * within-split. 1-row output: candidate pairs + flagged-test-doc
    * share.
    */
  private val q468 = QueryDef(
    "q468_split_leakage_lsh",
    (s, dir) => {
      val splits = Fixtures.table(s, dir, "documents")
        .select(col("doc_id"), expr(Portable.splitCaseSpark).as("split"))
      val bands = Dedup.minhashBands(Dedup.persistedInverted(s, dir))
        .join(splits, "doc_id")
      val tr = bands.where(col("split") === "train")
        .select(col("band"), col("bkey"), col("doc_id").as("train_doc"))
      val te = bands.where(col("split") === "test")
        .select(col("band"), col("bkey"), col("doc_id").as("test_doc"))
      val cand = tr.join(te, Seq("band", "bkey"))
        .select(col("train_doc"), col("test_doc")).distinct()
      val nTest = splits.where(col("split") === "test")
        .agg(count(lit(1)).as("n_test_docs"))
      val nTrain = splits.where(col("split") === "train")
        .agg(count(lit(1)).as("n_train_docs"))
      cand.agg(count(lit(1)).as("n_candidate_pairs"),
          countDistinct(col("test_doc")).as("n_test_docs_flagged"))
        .crossJoin(broadcast(nTest)).crossJoin(broadcast(nTrain))
        .select(col("n_train_docs"), col("n_test_docs"),
          col("n_candidate_pairs"), col("n_test_docs_flagged"),
          round(expr("CAST(n_test_docs_flagged AS DOUBLE) / n_test_docs"),
            9).as("flagged_rate"))
    },
    Some {
      val bandSelects = (0 until Dedup.NBands).map { bnd =>
        s"SELECT doc_id, $bnd AS band, md5(mh${2 * bnd}::VARCHAR || ','" +
          s" || mh${2 * bnd + 1}::VARCHAR) AS bkey FROM mh"
      }.mkString(" UNION ALL ")
      s"""WITH ${Dedup.shingledDuckCte},
      mh AS (SELECT doc_id, ${Dedup.minSelectsDuck} FROM inv
        GROUP BY doc_id),
      bands AS ($bandSelects),
      splits AS (SELECT doc_id, ${Portable.splitCaseDuck} AS split
        FROM documents),
      sb AS (SELECT b.doc_id, band, bkey, split
        FROM bands b JOIN splits s ON s.doc_id = b.doc_id),
      cand AS (SELECT DISTINCT tr.doc_id AS train_doc,
          te.doc_id AS test_doc
        FROM sb tr JOIN sb te
          ON tr.band = te.band AND tr.bkey = te.bkey
          AND tr.split = 'train' AND te.split = 'test'),
      red AS (SELECT count(*)::BIGINT AS n_candidate_pairs,
          count(DISTINCT test_doc)::BIGINT AS n_test_docs_flagged
        FROM cand),
      nt AS (SELECT
          sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END)::BIGINT
            AS n_test_docs,
          sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)::BIGINT
            AS n_train_docs
        FROM splits)
      SELECT n_train_docs, n_test_docs, n_candidate_pairs,
        n_test_docs_flagged,
        round(CAST(n_test_docs_flagged AS DOUBLE) / n_test_docs, 9)
          AS flagged_rate
      FROM red, nt"""
    })

  // ---------- q469: supplier Pareto skyline ---------------------------------

  /** Skyline (Pareto-dominance) operator over suppliers on (ship
    * delay ↓, revenue ↑) — the classic multi-criteria DB operator the
    * registry lacked: a supplier is on the skyline iff no other is at
    * least as good on both objectives and strictly better on one;
    * top-k by any single score (q06 et al.) can't surface these
    * trade-offs. Objectives pin exactly (mean delay to micro-days
    * from integer day sums, revenue to cents), so dominance is
    * exact-integer in both dialects. The dominance test is a
    * self-join of the BOUNDED per-supplier frame (≤|suppliers|² —
    * dimension-sized, never the fact table; at huge |S| the standard
    * grid/sort-filter prefilter applies, documented). One fact pass
    * for the per-supplier aggregate; skyline rows ordered by
    * supplier.
    */
  private val q469 = QueryDef(
    "q469_skyline_suppliers",
    (s, dir) => {
      val per = Fixtures.table(s, dir, "lineitem")
        .join(Fixtures.table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_lines"),
          sum(expr("""timestampdiff(MICROSECOND, o_orderdate,
            l_shipdate) div 86400000000""")).as("sdelay"),
          sum(expr("CAST(round(l_extendedprice * 100.0) AS BIGINT)"))
            .as("rev_cents"))
        .select(col("l_suppkey").as("suppkey"), col("n_lines"),
          expr("CAST(round(CAST(sdelay AS DOUBLE) * 1e6 / n_lines) " +
            "AS BIGINT)").as("delay_micro"), col("rev_cents"))
      val other = per.select(col("delay_micro").as("d2"),
        col("rev_cents").as("r2"))
      val dominated = per.join(other,
          (col("d2") <= col("delay_micro")) && (col("r2") >= col("rev_cents"))
            && ((col("d2") < col("delay_micro"))
              || (col("r2") > col("rev_cents"))),
          "left_semi")
      per.join(dominated.select(col("suppkey")), Seq("suppkey"),
          "left_anti")
        .select(col("suppkey"), col("n_lines"),
          round(col("delay_micro") / lit(1e6), 6).as("avg_delay_days"),
          col("rev_cents"))
        .orderBy(col("suppkey"))
    },
    Some("""WITH per AS (SELECT l_suppkey AS suppkey,
          count(*)::BIGINT AS n_lines,
          CAST(round(CAST(sum((epoch_us(l_shipdate)
              - epoch_us(o_orderdate)) // 86400000000) AS DOUBLE)
            * 1e6 / count(*)) AS BIGINT) AS delay_micro,
          sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))::BIGINT
            AS rev_cents
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1),
      sky AS (SELECT * FROM per p WHERE NOT EXISTS (
        SELECT 1 FROM per q
        WHERE q.delay_micro <= p.delay_micro
          AND q.rev_cents >= p.rev_cents
          AND (q.delay_micro < p.delay_micro
            OR q.rev_cents > p.rev_cents)))
      SELECT suppkey, n_lines,
        round(delay_micro / 1e6, 6) AS avg_delay_days, rev_cents
      FROM sky ORDER BY suppkey"""))

  // ---------- q470: Chao1 vocabulary estimate -------------------------------

  /** Chao1 species-richness estimate of the corpus vocabulary from a
    * 10 % document hash-sample, audited against the exact distinct
    * count — the sample-based sizing read behind every "how big will
    * the vocab get" decision (q84's Heaps fit EXTRAPOLATES a growth
    * law; Chao1 lower-bounds the asymptote from one sample's
    * singleton/doubleton counts: D + f1(f1−1)/(2(f2+1)), the
    * bias-corrected form defined even at f2 = 0). Shape: one token
    * pass over the hash-sampled docs into per-token counts, a
    * frequency-of-frequencies fold (bounded), and one full-corpus
    * distinct count as ground truth. 1-row output with the relative
    * error — the audit that says whether sampling the vocab census at
    * 100 TB is safe.
    */
  private val q470 = QueryDef(
    "q470_chao1_vocab_estimate",
    (s, dir) => {
      val toks = Fixtures.table(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) > 0)
      val sample = toks
        .where(expr(s"${Portable.h32Spark("concat('smp_', doc_id)")} % 10")
          === 0)
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val fof = sample.agg(count(lit(1)).as("d_sample"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      val truth = toks.agg(countDistinct(col("tok")).as("d_true"))
      fof.crossJoin(broadcast(truth))
        .select(col("d_sample"), col("f1"), col("f2"),
          expr("""CAST(round(d_sample + CAST(f1 AS DOUBLE) * (f1 - 1)
            / (2.0 * (f2 + 1))) AS BIGINT)""").as("chao1"),
          col("d_true"),
          round(expr("""(d_sample + CAST(f1 AS DOUBLE) * (f1 - 1)
            / (2.0 * (f2 + 1)) - d_true) / d_true"""), 9)
            .as("rel_error"))
    },
    Some(s"""WITH toks AS (SELECT doc_id,
          unnest(string_split(text, ' ')) AS tok FROM documents),
      toksf AS (SELECT doc_id, tok FROM toks WHERE length(tok) > 0),
      sample AS (SELECT tok, count(*)::BIGINT AS c FROM toksf
        WHERE ${Portable.h32Duck("'smp_' || doc_id")} % 10 = 0
        GROUP BY 1),
      fof AS (SELECT count(*)::BIGINT AS d_sample,
          sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS f1,
          sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT AS f2
        FROM sample),
      truth AS (SELECT count(DISTINCT tok)::BIGINT AS d_true FROM toksf)
      SELECT d_sample, f1, f2,
        CAST(round(d_sample + CAST(f1 AS DOUBLE) * (f1 - 1)
          / (2.0 * (f2 + 1))) AS BIGINT) AS chao1,
        d_true,
        round((d_sample + CAST(f1 AS DOUBLE) * (f1 - 1)
          / (2.0 * (f2 + 1)) - d_true) / d_true, 9) AS rel_error
      FROM fof, truth"""))

  // ---------- q471: shuffle-partition sizer ---------------------------------

  /** Rows-per-partition profile of the orders⋈lineitem shuffle key at
    * candidate partition counts P ∈ {32, 200, 2000} — the
    * spark.sql.shuffle.partitions sizing read q398's skew audit stops
    * short of: per P, the max/mean partition load and the skew ratio
    * under the portable hash say which P keeps every partition under
    * the spill target (32 768 rows at fixture scale; production
    * targets bytes — same arithmetic on the q455 width model).
    * Shape: one grouped per-key count (the only fact pass), the key
    * table fans across the P grid in-projection, and the partition
    * census is ≤ ΣP cells. 3-row output.
    */
  private val q471 = QueryDef(
    "q471_shuffle_partition_sizer",
    (s, dir) => {
      val keys = Fixtures.table(s, dir, "lineitem")
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
      val fan2 = keys.select(col("l_orderkey"), col("cnt"),
          explode(array(lit(32L), lit(200L), lit(2000L))).as("p"))
        .select(col("p"), col("cnt"),
          expr(s"pmod(${Portable.h32Spark("concat('sp_', l_orderkey)")}, p)")
            .as("part"))
      val cells = fan2.groupBy(col("p"), col("part"))
        .agg(sum(col("cnt")).as("rows_in_part"))
      cells.groupBy(col("p"))
        .agg(count(lit(1)).as("n_parts_hit"),
          max(col("rows_in_part")).as("max_rows"),
          expr("CAST(round(sum(rows_in_part) * 1e6 / count(1)) " +
            "AS BIGINT)").as("mean_rows_micro"))
        .select(col("p").as("n_partitions"), col("n_parts_hit"),
          col("max_rows"),
          round(col("mean_rows_micro") / lit(1e6), 6).as("mean_rows"),
          round(expr("max_rows * 1e6 / mean_rows_micro"), 6)
            .as("skew_ratio"),
          (col("max_rows") <= 32768L).as("meets_target"))
        .orderBy(col("n_partitions"))
    },
    Some(s"""WITH keys AS (SELECT l_orderkey, count(*)::BIGINT AS cnt
        FROM lineitem GROUP BY 1),
      fan AS (SELECT p, cnt,
          ${Portable.h32Duck("'sp_' || l_orderkey")} % p AS part
        FROM keys, (SELECT CAST(unnest([32, 200, 2000]) AS BIGINT)
          AS p)),
      cells AS (SELECT p, part, sum(cnt)::BIGINT AS rows_in_part
        FROM fan GROUP BY 1, 2),
      red AS (SELECT p, count(*)::BIGINT AS n_parts_hit,
          max(rows_in_part)::BIGINT AS max_rows,
          CAST(round(sum(rows_in_part) * 1e6 / count(*)) AS BIGINT)
            AS mean_rows_micro
        FROM cells GROUP BY 1)
      SELECT p AS n_partitions, n_parts_hit, max_rows,
        round(mean_rows_micro / 1e6, 6) AS mean_rows,
        round(max_rows * 1e6 / mean_rows_micro, 6) AS skew_ratio,
        max_rows <= 32768 AS meets_target
      FROM red ORDER BY n_partitions"""))

  // ---------- q472: join-strategy planning matrix ----------------------------

  /** Strategy decision table for the schema's four standing fact⋈dim
    * joins — the plan-shape read that matters most at 100 TB, folded
    * from measured statistics instead of guessed: per join, the dim's
    * estimated bytes (q455 width model) against the 10 MB broadcast
    * default, the fact side's hottest-key multiplicity against the
    * 32× mean skew bound (q454's trigger), and the resulting verdict
    * (broadcast / sort-merge / sort-merge+salt). Each fact pass is
    * one grouped count; dim sizes are dimension scans; the matrix is
    * a 4-row union of bounded aggregates.
    */
  private val q472 = QueryDef(
    "q472_join_strategy_matrix",
    (s, dir) => {
      def factStats(df: DataFrame, key: String): DataFrame =
        df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
          .agg(sum(col("cnt")).as("fact_rows"),
            count(lit(1)).as("n_keys"), max(col("cnt")).as("max_key"))
      def dimStats(df: DataFrame, bytesExpr: String): DataFrame =
        df.agg(count(lit(1)).as("dim_rows"),
          sum(expr(bytesExpr)).as("dim_bytes"))
      def one(name: String, fact: DataFrame, key: String,
          dim: DataFrame, bytesExpr: String): DataFrame =
        factStats(fact, key).crossJoin(broadcast(
            dimStats(dim, bytesExpr)))
          .select(lit(name).as("join_name"), col("fact_rows"),
            col("n_keys"), col("max_key"), col("dim_rows"),
            col("dim_bytes"))
      val li = Fixtures.table(s, dir, "lineitem")
      val rows =
        one("lineitem_x_part", li, "l_partkey",
          Fixtures.table(s, dir, "part"),
          "CAST(36 + length(p_name) + length(p_brand) + length(p_type)"
            + " AS BIGINT)")
        .unionAll(one("lineitem_x_supplier", li, "l_suppkey",
          Fixtures.table(s, dir, "supplier"),
          "CAST(28 + length(s_name) AS BIGINT)"))
        .unionAll(one("orders_x_customer",
          Fixtures.table(s, dir, "orders"), "o_custkey",
          Fixtures.table(s, dir, "customer"),
          "CAST(32 + length(c_name) + length(c_mktsegment) AS BIGINT)"))
        .unionAll(one("lineitem_x_orders", li, "l_orderkey",
          Fixtures.table(s, dir, "orders"),
          "CAST(40 + length(o_orderstatus) + length(o_orderpriority)"
            + " AS BIGINT)"))
      rows.select(col("join_name"), col("fact_rows"), col("dim_rows"),
          col("dim_bytes"),
          (col("max_key") * col("n_keys") > col("fact_rows") * 32L)
            .as("skewed"),
          expr("""CASE WHEN dim_bytes < 10485760 THEN 'broadcast'
            WHEN max_key * n_keys > fact_rows * 32 THEN
              'sort_merge_salted'
            ELSE 'sort_merge' END""").as("strategy"))
        .orderBy(col("join_name"))
    },
    Some("""WITH
      fp AS (SELECT sum(c)::BIGINT AS fact_rows, count(*)::BIGINT
          AS n_keys, max(c)::BIGINT AS max_key
        FROM (SELECT count(*)::BIGINT AS c FROM lineitem
          GROUP BY l_partkey)),
      fsu AS (SELECT sum(c)::BIGINT AS fact_rows, count(*)::BIGINT
          AS n_keys, max(c)::BIGINT AS max_key
        FROM (SELECT count(*)::BIGINT AS c FROM lineitem
          GROUP BY l_suppkey)),
      foc AS (SELECT sum(c)::BIGINT AS fact_rows, count(*)::BIGINT
          AS n_keys, max(c)::BIGINT AS max_key
        FROM (SELECT count(*)::BIGINT AS c FROM orders
          GROUP BY o_custkey)),
      flo AS (SELECT sum(c)::BIGINT AS fact_rows, count(*)::BIGINT
          AS n_keys, max(c)::BIGINT AS max_key
        FROM (SELECT count(*)::BIGINT AS c FROM lineitem
          GROUP BY l_orderkey)),
      dp AS (SELECT count(*)::BIGINT AS dim_rows,
          sum(CAST(36 + length(p_name) + length(p_brand)
            + length(p_type) AS BIGINT))::BIGINT AS dim_bytes
        FROM part),
      dsu AS (SELECT count(*)::BIGINT AS dim_rows,
          sum(CAST(28 + length(s_name) AS BIGINT))::BIGINT AS dim_bytes
        FROM supplier),
      dc AS (SELECT count(*)::BIGINT AS dim_rows,
          sum(CAST(32 + length(c_name) + length(c_mktsegment)
            AS BIGINT))::BIGINT AS dim_bytes
        FROM customer),
      dor AS (SELECT count(*)::BIGINT AS dim_rows,
          sum(CAST(40 + length(o_orderstatus) + length(o_orderpriority)
            AS BIGINT))::BIGINT AS dim_bytes
        FROM orders),
      rows4 AS (
        SELECT 'lineitem_x_part' AS join_name, fact_rows, n_keys,
          max_key, dim_rows, dim_bytes FROM fp, dp
        UNION ALL
        SELECT 'lineitem_x_supplier', fact_rows, n_keys, max_key,
          dim_rows, dim_bytes FROM fsu, dsu
        UNION ALL
        SELECT 'orders_x_customer', fact_rows, n_keys, max_key,
          dim_rows, dim_bytes FROM foc, dc
        UNION ALL
        SELECT 'lineitem_x_orders', fact_rows, n_keys, max_key,
          dim_rows, dim_bytes FROM flo, dor)
      SELECT join_name, fact_rows, dim_rows, dim_bytes,
        max_key * n_keys > fact_rows * 32 AS skewed,
        CASE WHEN dim_bytes < 10485760 THEN 'broadcast'
          WHEN max_key * n_keys > fact_rows * 32 THEN
            'sort_merge_salted'
          ELSE 'sort_merge' END AS strategy
      FROM rows4 ORDER BY join_name"""))

  // ---------- q486: data-layout zone-map pruning audit -----------------------

  /** Which physical LAYOUT should a 100-TB table be written in? The
    * question every lakehouse writer answers once and pays for on
    * every query: this audit simulates three layouts of the orders
    * table — insertion order, sort-by-date, and Z-ORDER (Morton
    * interleave of 8 date bits × 8 customer bits) — cuts each into
    * 128 files, computes each file's zone maps (min/max of both
    * dims), and counts how many files a mid-range date predicate, a
    * customer predicate, and their conjunction actually have to scan.
    * The structural result the numbers show: sort-by-date prunes the
    * date filter to ~13 files but scans ALL files for the customer
    * filter; Z-order prunes BOTH to a fraction — the multi-dimensional
    * locality that makes it the default clustering for multi-filter
    * scan tables. All layout assignment is integer arithmetic off one
    * broadcast min/max row (bit extraction via div/mod — identical
    * text both engines); zone maps are one grouped pass over the
    * 3-layout fan; the verdict frame is ≤ 384 file cells. 3-row
    * output.
    */
  private val q486 = QueryDef(
    "q486_layout_pruning_audit",
    (s, dir) => {
      def zText(a: String, b: String, divOp: String) = (0 until 8).map {
        i =>
          s"((($a $divOp ${1 << i}) % 2) * ${1 << (2 * i + 1)} + " +
            s"(($b $divOp ${1 << i}) % 2) * ${1 << (2 * i)})"
      }.mkString(" + ")
      val o = Fixtures.table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          expr("datediff(o_orderdate, DATE '1970-01-01')").as("d"))
      val mm = o.agg(min(col("d")).as("dmin"), max(col("d")).as("dmax"),
        min(col("o_custkey")).as("cmin"), max(col("o_custkey")).as("cmax"),
        min(col("o_orderkey")).as("okmin"),
        max(col("o_orderkey")).as("okmax"))
      val bits = o.crossJoin(broadcast(mm))
        .select(col("d"), col("o_custkey").as("c"),
          expr("(d - dmin) * 256 div (dmax - dmin + 1)").as("dbit"),
          expr("(o_custkey - cmin) * 256 div (cmax - cmin + 1)")
            .as("cbit"),
          expr("(o_orderkey - okmin) * 128 div (okmax - okmin + 1)")
            .as("f_ins"),
          expr("dmin + (dmax - dmin + 1) * 45 div 100").as("d_lo"),
          expr("dmin + (dmax - dmin + 1) * 55 div 100").as("d_hi"),
          expr("cmin + (cmax - cmin + 1) * 45 div 100").as("c_lo"),
          expr("cmin + (cmax - cmin + 1) * 55 div 100").as("c_hi"))
        .withColumn("f_day", expr("dbit div 2"))
        .withColumn("f_z", expr(s"(${zText("dbit", "cbit", "div")}) div 512"))
      val fan = bits.select(col("d"), col("c"),
        col("d_lo"), col("d_hi"), col("c_lo"), col("c_hi"),
        explode(array(
          struct(lit("insertion").as("layout"), col("f_ins").as("f")),
          struct(lit("sort_day").as("layout"), col("f_day").as("f")),
          struct(lit("zorder").as("layout"), col("f_z").as("f"))))
          .as("lf"))
        .select(col("lf.layout").as("layout"), col("lf.f").as("f"),
          col("d"), col("c"),
          col("d_lo"), col("d_hi"), col("c_lo"), col("c_hi"))
      val zones = fan.groupBy(col("layout"), col("f"))
        .agg(min(col("d")).as("dmn"), max(col("d")).as("dmx"),
          min(col("c")).as("cmn"), max(col("c")).as("cmx"),
          min(col("d_lo")).as("d_lo"), min(col("d_hi")).as("d_hi"),
          min(col("c_lo")).as("c_lo"), min(col("c_hi")).as("c_hi"))
      zones.groupBy(col("layout"))
        .agg(count(lit(1)).as("n_files"),
          sum(when(col("dmx") >= col("d_lo")
            && col("dmn") <= col("d_hi"), 1L).otherwise(0L))
            .as("files_day_scan"),
          sum(when(col("cmx") >= col("c_lo")
            && col("cmn") <= col("c_hi"), 1L).otherwise(0L))
            .as("files_cust_scan"),
          sum(when(col("dmx") >= col("d_lo") && col("dmn") <= col("d_hi")
            && col("cmx") >= col("c_lo") && col("cmn") <= col("c_hi"),
            1L).otherwise(0L)).as("files_both_scan"))
        .orderBy("layout")
    },
    Some {
      def zText(a: String, b: String) = (0 until 8).map { i =>
        s"((($a // ${1 << i}) % 2) * ${1 << (2 * i + 1)} + " +
          s"(($b // ${1 << i}) % 2) * ${1 << (2 * i)})"
      }.mkString(" + ")
      s"""WITH o AS (SELECT o_orderkey, o_custkey,
          datediff('day', DATE '1970-01-01', o_orderdate) AS d
        FROM orders),
      mm AS (SELECT min(d) AS dmin, max(d) AS dmax,
          min(o_custkey) AS cmin, max(o_custkey) AS cmax,
          min(o_orderkey) AS okmin, max(o_orderkey) AS okmax FROM o),
      bits AS (SELECT d, o_custkey AS c,
          (d - dmin) * 256 // (dmax - dmin + 1) AS dbit,
          (o_custkey - cmin) * 256 // (cmax - cmin + 1) AS cbit,
          (o_orderkey - okmin) * 128 // (okmax - okmin + 1) AS f_ins,
          dmin + (dmax - dmin + 1) * 45 // 100 AS d_lo,
          dmin + (dmax - dmin + 1) * 55 // 100 AS d_hi,
          cmin + (cmax - cmin + 1) * 45 // 100 AS c_lo,
          cmin + (cmax - cmin + 1) * 55 // 100 AS c_hi
        FROM o, mm),
      fan AS (
        SELECT 'insertion' AS layout, f_ins AS f, d, c,
          d_lo, d_hi, c_lo, c_hi FROM bits
        UNION ALL
        SELECT 'sort_day', dbit // 2, d, c, d_lo, d_hi, c_lo, c_hi
          FROM bits
        UNION ALL
        SELECT 'zorder', (${zText("dbit", "cbit")}) // 512, d, c,
          d_lo, d_hi, c_lo, c_hi FROM bits),
      zones AS (SELECT layout, f, min(d) AS dmn, max(d) AS dmx,
          min(c) AS cmn, max(c) AS cmx,
          min(d_lo) AS d_lo, min(d_hi) AS d_hi,
          min(c_lo) AS c_lo, min(c_hi) AS c_hi
        FROM fan GROUP BY 1, 2)
      SELECT layout, count(*)::BIGINT AS n_files,
        sum(CASE WHEN dmx >= d_lo AND dmn <= d_hi THEN 1 ELSE 0
          END)::BIGINT AS files_day_scan,
        sum(CASE WHEN cmx >= c_lo AND cmn <= c_hi THEN 1 ELSE 0
          END)::BIGINT AS files_cust_scan,
        sum(CASE WHEN dmx >= d_lo AND dmn <= d_hi
          AND cmx >= c_lo AND cmn <= c_hi THEN 1 ELSE 0
          END)::BIGINT AS files_both_scan
      FROM zones GROUP BY layout ORDER BY layout"""
    })

  // ---------- q487: compaction bin-packing planner ----------------------------

  /** Small-file compaction planning — the table-service pass every
    * lakehouse runs when ingest leaves thousands of sub-target files:
    * simulate the file inventory (one file per 64-doc ingest chunk per
    * source, bytes = its text volume), then plan the rewrite with the
    * DISTRIBUTED packing rule production compactors actually use —
    * order files (bytes DESC, id), take the running exclusive byte
    * offset, and cut a bin wherever the offset crosses the 256 KiB
    * target (next-fit over a sorted manifest: one window pass,
    * deterministic, no sequential first-fit state). Reports, per
    * source: the before inventory (file count, sub-¼-target stragglers,
    * bytes), the planned after state (bin count, fattest bin, mean
    * fill), and the compaction ratio. Shape: the corpus reduces to a
    * ≤ |sources|·chunks file manifest in one grouped pass; the window
    * sorts file rows, never documents; |sources|-row output.
    */
  private val q487 = QueryDef(
    "q487_compaction_planner",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val target = 262144L
      val files = Fixtures.table(s, dir, "documents")
        .groupBy(col("source"), expr("doc_id div 64").as("chunk"))
        .agg(sum(col("n_chars")).as("bytes"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("bytes").desc, col("chunk"))
      val planned = files
        .withColumn("off",
          coalesce(sum(col("bytes")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("bin", expr(s"off div $target"))
      val bins = planned.groupBy(col("source"), col("bin"))
        .agg(sum(col("bytes")).as("bin_bytes"))
      val before = files.groupBy(col("source"))
        .agg(count(lit(1)).as("n_files_before"),
          sum(when(col("bytes") < target / 4, 1L).otherwise(0L))
            .as("n_small_before"),
          sum(col("bytes")).as("bytes_total"))
      val after = bins.groupBy(col("source"))
        .agg(count(lit(1)).as("n_bins_after"),
          max(col("bin_bytes")).as("max_bin_bytes"))
      before.join(after, "source")
        .select(col("source"), col("n_files_before"),
          col("n_small_before"), col("bytes_total"),
          col("n_bins_after"), col("max_bin_bytes"),
          round(expr(s"bytes_total * 1e2 / (n_bins_after * $target.0)"),
            6).as("fill_pct"),
          round(expr("n_files_before * 1e0 / n_bins_after"), 6)
            .as("compaction_ratio"))
        .orderBy("source")
    },
    Some(s"""WITH files AS (SELECT source, doc_id // 64 AS chunk,
          sum(n_chars)::BIGINT AS bytes
        FROM documents GROUP BY 1, 2),
      planned AS (SELECT source, chunk, bytes,
          COALESCE(sum(bytes) OVER (PARTITION BY source
            ORDER BY bytes DESC, chunk
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS off
        FROM files),
      bins AS (SELECT source, off // 262144 AS bin,
          sum(bytes)::BIGINT AS bin_bytes
        FROM planned GROUP BY 1, 2),
      before AS (SELECT source, count(*)::BIGINT AS n_files_before,
          sum(CASE WHEN bytes < 65536 THEN 1 ELSE 0 END)::BIGINT
            AS n_small_before,
          sum(bytes)::BIGINT AS bytes_total
        FROM files GROUP BY 1),
      aft AS (SELECT source, count(*)::BIGINT AS n_bins_after,
          max(bin_bytes)::BIGINT AS max_bin_bytes
        FROM bins GROUP BY 1)
      SELECT source, n_files_before, n_small_before, bytes_total,
        n_bins_after, max_bin_bytes,
        round(bytes_total * 1e2 / (n_bins_after * 262144.0), 6)
          AS fill_pct,
        round(n_files_before * 1e0 / n_bins_after, 6)
          AS compaction_ratio
      FROM before JOIN aft USING (source) ORDER BY source"""))

  // ---------- q488: delete-strategy planner (COW vs deletion vectors) --------

  /** How should a 100-TB table physically execute a delete?
    * Copy-on-write rewrites every file a victim row touches; a
    * deletion vector appends a tombstone bitmap per touched file and
    * defers the rewrite. Which wins depends on the DELETE SHAPE, and
    * this planner measures exactly that on the simulated 256-file
    * insertion layout (q486's file arithmetic, 128 B/row): a
    * key-scattered predicate (`o_custkey % 97 = 0`, ~1 % of rows
    * spread uniformly) touches ~every file — COW rewrites the whole
    * table for a 1 % delete (write amplification ~100×) while DVs
    * write bytes ∝ victims; a contiguous predicate (the oldest 1/32
    * of order keys) clusters its victims into ~8 files — COW
    * amplification collapses to ~1× and the rewrite also reclaims the
    * space DVs would leave behind. Shape: ONE grouped pass builds the
    * per-file census (both shapes as conditional sums), all strategy
    * math on the 256-row frame, 4-row output (shape × strategy).
    */
  private val q488 = QueryDef(
    "q488_delete_strategy_planner",
    (s, dir) => {
      val rowBytes = 128L
      val o = Fixtures.table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val mm = o.agg(min(col("o_orderkey")).as("okmin"),
        max(col("o_orderkey")).as("okmax"))
      val census = o.crossJoin(broadcast(mm))
        .select(
          expr("(o_orderkey - okmin) * 256 div (okmax - okmin + 1)")
            .as("f"),
          when(col("o_custkey") % 97 === 0, 1L).otherwise(0L)
            .as("del_scat"),
          when(expr("o_orderkey < okmin + (okmax - okmin + 1) div 32"),
            1L).otherwise(0L).as("del_clus"))
        .groupBy(col("f"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("del_scat")).as("d_scat"),
          sum(col("del_clus")).as("d_clus"))
      val fan = census.select(col("n_rows"),
        explode(array(
          struct(lit("scattered").as("shape"), col("d_scat").as("nd")),
          struct(lit("contiguous").as("shape"), col("d_clus").as("nd"))))
          .as("x"))
        .select(col("x.shape").as("shape"), col("x.nd").as("nd"),
          col("n_rows"))
      val perShape = fan.groupBy(col("shape")).agg(
        sum(col("nd")).as("rows_deleted"),
        sum(when(col("nd") > 0, 1L).otherwise(0L)).as("files_touched"),
        sum(when(col("nd") > 0, col("n_rows") * rowBytes)
          .otherwise(0L)).as("bytes_cow"),
        sum(when(col("nd") > 0, lit(256L) + col("nd") * 8L)
          .otherwise(0L)).as("bytes_dv"))
      perShape.select(col("shape"), col("rows_deleted"),
        col("files_touched"),
        explode(array(
          struct(lit("copy_on_write").as("strategy"),
            col("bytes_cow").as("bytes_written")),
          struct(lit("deletion_vector").as("strategy"),
            col("bytes_dv").as("bytes_written")))).as("y"))
        .select(col("shape"), col("y.strategy").as("strategy"),
          col("rows_deleted"), col("files_touched"),
          col("y.bytes_written").as("bytes_written"),
          round(expr(s"y.bytes_written * 1e0 / " +
            s"(rows_deleted * $rowBytes.0)"), 6)
            .as("write_amplification"))
        .orderBy("shape", "strategy")
    },
    Some("""WITH mm AS (SELECT min(o_orderkey) AS okmin,
          max(o_orderkey) AS okmax FROM orders),
      census AS (SELECT
          (o_orderkey - okmin) * 256 // (okmax - okmin + 1) AS f,
          count(*)::BIGINT AS n_rows,
          sum(CASE WHEN o_custkey % 97 = 0 THEN 1 ELSE 0 END)::BIGINT
            AS d_scat,
          sum(CASE WHEN o_orderkey < okmin + (okmax - okmin + 1) // 32
            THEN 1 ELSE 0 END)::BIGINT AS d_clus
        FROM orders, mm GROUP BY 1),
      fan AS (SELECT 'scattered' AS shape, d_scat AS nd, n_rows
          FROM census
        UNION ALL
        SELECT 'contiguous', d_clus, n_rows FROM census),
      pershape AS (SELECT shape,
          sum(nd)::BIGINT AS rows_deleted,
          sum(CASE WHEN nd > 0 THEN 1 ELSE 0 END)::BIGINT
            AS files_touched,
          sum(CASE WHEN nd > 0 THEN n_rows * 128 ELSE 0 END)::BIGINT
            AS bytes_cow,
          sum(CASE WHEN nd > 0 THEN 256 + nd * 8 ELSE 0 END)::BIGINT
            AS bytes_dv
        FROM fan GROUP BY 1),
      strat AS (SELECT shape, 'copy_on_write' AS strategy,
          rows_deleted, files_touched, bytes_cow AS bytes_written
          FROM pershape
        UNION ALL
        SELECT shape, 'deletion_vector', rows_deleted, files_touched,
          bytes_dv FROM pershape)
      SELECT shape, strategy, rows_deleted, files_touched,
        bytes_written,
        round(bytes_written * 1e0 / (rows_deleted * 128.0), 6)
          AS write_amplification
      FROM strat ORDER BY shape, strategy"""))

  // ---------- q489: KV-cache capacity planner ---------------------------------

  /** Serving-side capacity planning from the real sequence-length
    * distribution: a transformer's KV cache costs
    * 2(K,V) × layers × kv-heads × head-dim × 2 B ≈ 128 KiB per token
    * (32L × 8H × 128D fp16 literals below), and the planner compares,
    * per context cap C ∈ {24, 48, 96}, the two allocation policies —
    * RESERVED (every sequence pre-books C tokens; the pre-paging
    * default) vs PAGED (block-granular allocation sized by the
    * actual token demand, the vLLM model) — against an 8 GiB cache
    * budget. Fleet sizes come out as exact integer divisions of the
    * budget by per-seq bytes; the paged gain is the reciprocal of cap
    * utilization, here ~2–4× more concurrent sequences from the same
    * HBM. p50/p99 effective lengths are exact rank selections off a
    * token-DOMAIN histogram cumsum (≤ cap distinct lengths per grid
    * row — the q135 bounded-window contract, never a corpus-row
    * window). Shape: one token-count pass, grid fan in-projection,
    * all math on ≤ 3×100 histogram cells; 3-row output.
    */
  private val q489 = QueryDef(
    "q489_kv_cache_planner",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val bytesPerTok = 131072L // 2 * 32 layers * 8 heads * 128 dim * 2B
      val budget = 8589934592L  // 8 GiB
      val lens = Fixtures.table(s, dir, "documents")
        .select(size(split(col("text"), " ")).cast("long").as("n_toks"))
      val fan = lens.select(col("n_toks"),
          explode(array(lit(24L), lit(48L), lit(96L))).as("cap"))
        .select(col("cap"), least(col("n_toks"), col("cap")).as("eff"))
      val hist = fan.groupBy(col("cap"), col("eff"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("cap")).orderBy(col("eff"))
      val cum = hist
        .withColumn("cum", sum(col("c")).over(w))
        .withColumn("n", sum(col("c")).over(
          Window.partitionBy(col("cap"))))
        .withColumn("s_eff", sum(col("eff") * col("c")).over(
          Window.partitionBy(col("cap"))))
      cum.groupBy(col("cap"), col("n"), col("s_eff"))
        .agg(min(when(col("cum") * 100 >= col("n") * 50, col("eff")))
          .as("p50_eff"),
          min(when(col("cum") * 100 >= col("n") * 99, col("eff")))
            .as("p99_eff"))
        .select(col("cap").as("context_cap"), col("n").as("n_seqs"),
          col("p50_eff"), col("p99_eff"),
          expr(s"$budget div (cap * $bytesPerTok)")
            .as("max_seqs_reserved"),
          expr(s"$budget * n div (s_eff * $bytesPerTok)")
            .as("max_seqs_paged"),
          round(expr("s_eff * 1e2 / (cap * n)"), 6)
            .as("cap_utilization_pct"),
          round(expr(s"($budget * n div (s_eff * $bytesPerTok)) * 1e0 " +
            s"/ ($budget div (cap * $bytesPerTok))"), 6)
            .as("paged_gain"))
        .orderBy("context_cap")
    },
    Some("""WITH lens AS (SELECT len(string_split(text, ' '))::BIGINT
          AS n_toks FROM documents),
      fan AS (SELECT cap, least(n_toks, cap) AS eff
        FROM lens, (SELECT CAST(unnest([24, 48, 96]) AS BIGINT)
          AS cap)),
      hist AS (SELECT cap, eff, count(*)::BIGINT AS c
        FROM fan GROUP BY 1, 2),
      cum AS (SELECT cap, eff, c,
          sum(c) OVER (PARTITION BY cap ORDER BY eff)::BIGINT AS cum,
          sum(c) OVER (PARTITION BY cap)::BIGINT AS n,
          sum(eff * c) OVER (PARTITION BY cap)::BIGINT AS s_eff
        FROM hist),
      red AS (SELECT cap, n, s_eff,
          min(CASE WHEN cum * 100 >= n * 50 THEN eff END)::BIGINT
            AS p50_eff,
          min(CASE WHEN cum * 100 >= n * 99 THEN eff END)::BIGINT
            AS p99_eff
        FROM cum GROUP BY 1, 2, 3)
      SELECT cap AS context_cap, n AS n_seqs, p50_eff, p99_eff,
        8589934592 // (cap * 131072) AS max_seqs_reserved,
        8589934592 * n // (s_eff * 131072) AS max_seqs_paged,
        round(s_eff * 1e2 / (cap * n), 6) AS cap_utilization_pct,
        round((8589934592 * n // (s_eff * 131072)) * 1e0
          / (8589934592 // (cap * 131072)), 6) AS paged_gain
      FROM red ORDER BY context_cap"""))

  // ---------- q495: balanced-quota stratified sampler --------------------

  /** Power-allocation stratified sampling — the corpus-balancing step
    * a multilingual training mix needs: proportional sampling lets the
    * head language swamp the mix, equal quotas starve it, so the
    * standard compromise allocates per-language quotas ∝ √n (power
    * 0.5, the Neyman-style balance used for low-resource upsampling).
    * Admission is a deterministic hash gate (admit iff
    * h32('qs_'‖doc_id) mod 1e6 < quota·1e6 div n — reproducible,
    * coordinator-free, exactly the property a 1000-executor sampler
    * needs: no global shuffle, no RNG state, every executor decides
    * each row locally from the broadcast 5-row quota table). All
    * allocation math in exact int64 (√n through floor(sqrt) — an
    * integer both engines compute identically; the integer-sum
    * denominator keeps the plan order-independent where a double
    * Σ√n would not be). Per-language output: stratum size, quota,
    * gate rate, admitted count, realized rate.
    */
  private val q495 = QueryDef(
    "q495_quota_sampler",
    (s, dir) => {
      val d = Fixtures.table(s, dir, "documents")
        .select(col("doc_id"), col("lang"))
      val strata = d.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("isq",
          expr("CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT)"))
      val tot = strata.agg(sum(col("n_docs")).as("n_tot"),
        sum(col("isq")).as("s_isq"))
      val quotas = strata.crossJoin(broadcast(tot))
        .select(col("lang"), col("n_docs"),
          expr("(n_tot div 2) * isq div s_isq").as("quota"))
        .withColumn("rate_ppm", expr("quota * 1000000 div n_docs"))
      val admitted = d
        .join(broadcast(quotas.select(col("lang"), col("rate_ppm"))),
          "lang")
        .where(expr(
          s"${Portable.h32Spark("concat('qs_', doc_id)")} % 1000000")
          < col("rate_ppm"))
        .groupBy(col("lang")).agg(count(lit(1)).as("n_admitted"))
      quotas.join(admitted, Seq("lang"), "left_outer")
        .select(col("lang"), col("n_docs"), col("quota"),
          col("rate_ppm"),
          coalesce(col("n_admitted"), lit(0L)).as("n_admitted"),
          expr("coalesce(n_admitted, 0) * 1000000 div n_docs")
            .as("realized_ppm"))
        .orderBy("lang")
    },
    Some(s"""WITH strata AS (SELECT lang, count(*)::BIGINT AS n_docs,
          CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS isq
        FROM documents GROUP BY lang),
      tot AS (SELECT sum(n_docs)::BIGINT AS n_tot,
          sum(isq)::BIGINT AS s_isq FROM strata),
      quotas AS (SELECT lang, n_docs,
          (n_tot // 2) * isq // s_isq AS quota,
          (n_tot // 2) * isq // s_isq * 1000000 // n_docs AS rate_ppm
        FROM strata, tot),
      adm AS (SELECT d.lang, count(*)::BIGINT AS n_admitted
        FROM documents d JOIN quotas q ON q.lang = d.lang
        WHERE ${Portable.h32Duck("'qs_' || doc_id")} % 1000000
          < q.rate_ppm
        GROUP BY d.lang)
      SELECT q.lang, n_docs, quota, rate_ppm,
        coalesce(n_admitted, 0)::BIGINT AS n_admitted,
        coalesce(n_admitted, 0) * 1000000 // n_docs AS realized_ppm
      FROM quotas q LEFT JOIN adm ON adm.lang = q.lang
      ORDER BY q.lang"""))

  // ---------- q496: token-budget admission ledger -------------------------

  /** Greedy token-budget fill — the "which sources make the cut" step
    * of assembling a fixed-size training mix: sources are ranked by a
    * deterministic quality proxy (mean tokens per doc, in exact milli
    * units), then admitted in rank order until the budget (60 % of
    * the corpus's tokens) is exhausted; the boundary source is
    * admitted partially, everything after it is excluded. Shape: one
    * corpus pass folds to a |sources|-row frame; the running
    * cumulative sum is a window over that BOUNDED aggregate (the
    * PlanLint-sanctioned single-partition class — 20 rows, never the
    * corpus); all arithmetic exact int64. Per-source output: tokens,
    * rank metric, cumulative tokens before, admitted tokens, status.
    */
  private val q496 = QueryDef(
    "q496_token_budget",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val src = Fixtures.table(s, dir, "documents")
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("tk"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tk")).as("tokens"))
        .withColumn("avg_tok_milli",
          expr("tokens * 1000 div n_docs"))
      val tot = src.agg(sum(col("tokens")).as("t_tot"))
      val w = Window.orderBy(col("avg_tok_milli").desc, col("source"))
        .rowsBetween(Window.unboundedPreceding, -1)
      src.crossJoin(broadcast(tot))
        .withColumn("budget", expr("t_tot * 6 div 10"))
        .withColumn("cum_before",
          coalesce(sum(col("tokens")).over(w), lit(0L)))
        .select(col("source"), col("n_docs"), col("tokens"),
          col("avg_tok_milli"), col("cum_before"),
          greatest(lit(0L),
            least(col("tokens"), col("budget") - col("cum_before")))
            .as("admitted_tokens"))
        .withColumn("status",
          when(col("admitted_tokens") === col("tokens"), "full")
            .when(col("admitted_tokens") > 0L, "partial")
            .otherwise("excluded"))
        .orderBy("source")
    },
    Some("""WITH src AS (SELECT source, count(*)::BIGINT AS n_docs,
          sum(len(string_split(text, ' ')))::BIGINT AS tokens
        FROM documents GROUP BY source),
      rk AS (SELECT source, n_docs, tokens,
          tokens * 1000 // n_docs AS avg_tok_milli FROM src),
      tot AS (SELECT sum(tokens)::BIGINT AS t_tot FROM rk),
      led AS (SELECT source, n_docs, tokens, avg_tok_milli,
          t_tot * 6 // 10 AS budget,
          coalesce(sum(tokens) OVER (
            ORDER BY avg_tok_milli DESC, source
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            ::BIGINT AS cum_before
        FROM rk, tot)
      SELECT source, n_docs, tokens, avg_tok_milli, cum_before,
        greatest(0, least(tokens, budget - cum_before))::BIGINT
          AS admitted_tokens,
        CASE WHEN greatest(0, least(tokens, budget - cum_before))
            = tokens THEN 'full'
          WHEN greatest(0, least(tokens, budget - cum_before)) > 0
            THEN 'partial'
          ELSE 'excluded' END AS status
      FROM led ORDER BY source"""))

  // ---------- q497: clustering-decay audit --------------------------------

  /** What an unsorted ingest append does to zone-map pruning — the
    * lakehouse maintenance question q486 (layout choice) and q487
    * (compaction) bracket: the standing corpus is value-range
    * clustered on n_chars (each of 32 files carries a tight min/max),
    * the arriving batch lands in arrival-order files (doc_id chunks —
    * each spanning nearly the full n_chars range), and a selective
    * band predicate (the middle decile) is costed against both
    * layouts. Before: scan ∝ selectivity. After the append: every
    * batch file straddles the band, so the scanned-row share decays
    * toward the batch's share of the corpus — the measured argument
    * for re-clustering after ingest (q487's job). Shape: file
    * assignment is integer arithmetic off one broadcast min/max row;
    * zone maps are one grouped pass; the verdict frame is ≤ 40 file
    * cells fanned to the 2-phase report. 2-row output.
    */
  private val q497 = QueryDef(
    "q497_clustering_decay",
    (s, dir) => {
      val d = Fixtures.table(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      val standing = d.where(expr("doc_id % 10 >= 2"))
      val mm = standing.agg(min(col("n_chars")).as("mn"),
        max(col("n_chars")).as("mx"))
      val sFiles = standing.crossJoin(broadcast(mm))
        .select(expr("(n_chars - mn) * 32 div (mx - mn + 1)").as("f"),
          col("n_chars"))
        .groupBy(col("f"))
        .agg(min(col("n_chars")).as("fmin"), max(col("n_chars")).as("fmax"),
          count(lit(1)).as("rows"))
        .withColumn("phase_batch", lit(0))
      val bFiles = d.where(expr("doc_id % 10 < 2"))
        .select(expr("doc_id div 64").as("f"), col("n_chars"))
        .groupBy(col("f"))
        .agg(min(col("n_chars")).as("fmin"), max(col("n_chars")).as("fmax"),
          count(lit(1)).as("rows"))
        .withColumn("phase_batch", lit(1))
      val files = sFiles.unionAll(bFiles).crossJoin(broadcast(mm))
        .withColumn("lo", expr("mn + (mx - mn + 1) * 45 div 100"))
        .withColumn("hi", expr("mn + (mx - mn + 1) * 55 div 100"))
        .withColumn("hit",
          (col("fmax") >= col("lo") && col("fmin") <= col("hi"))
            .cast("long"))
      files
        .select(explode(when(col("phase_batch") === 0,
          array(lit("before"), lit("after")))
          .otherwise(array(lit("after")))).as("phase"),
          col("rows"), col("hit"))
        .groupBy(col("phase"))
        .agg(count(lit(1)).as("n_files"),
          sum(col("hit")).as("n_scanned_files"),
          sum(col("rows")).as("n_rows"),
          sum(col("rows") * col("hit")).as("n_scanned_rows"))
        .withColumn("scan_share",
          round(col("n_scanned_rows").cast("double") / col("n_rows"), 9))
        .orderBy("phase")
    },
    Some("""WITH d AS (SELECT doc_id, n_chars FROM documents),
      mm AS (SELECT min(n_chars) AS mn, max(n_chars) AS mx
        FROM d WHERE doc_id % 10 >= 2),
      sf AS (SELECT (n_chars - mn) * 32 // (mx - mn + 1) AS f,
          min(n_chars) AS fmin, max(n_chars) AS fmax,
          count(*)::BIGINT AS rows_, 0 AS phase_batch
        FROM d, mm WHERE doc_id % 10 >= 2 GROUP BY 1),
      bf AS (SELECT doc_id // 64 AS f,
          min(n_chars) AS fmin, max(n_chars) AS fmax,
          count(*)::BIGINT AS rows_, 1 AS phase_batch
        FROM d WHERE doc_id % 10 < 2 GROUP BY 1),
      files AS (SELECT *,
          (SELECT mn + (mx - mn + 1) * 45 // 100 FROM mm) AS lo,
          (SELECT mn + (mx - mn + 1) * 55 // 100 FROM mm) AS hi
        FROM (SELECT * FROM sf UNION ALL SELECT * FROM bf)),
      hits AS (SELECT *, CASE WHEN fmax >= lo AND fmin <= hi
          THEN 1 ELSE 0 END AS hit FROM files),
      fanned AS (
        SELECT 'before' AS phase, rows_, hit FROM hits
          WHERE phase_batch = 0
        UNION ALL
        SELECT 'after', rows_, hit FROM hits)
      SELECT phase, count(*)::BIGINT AS n_files,
        sum(hit)::BIGINT AS n_scanned_files,
        sum(rows_)::BIGINT AS n_rows,
        sum(rows_ * hit)::BIGINT AS n_scanned_rows,
        round(sum(rows_ * hit)::DOUBLE / sum(rows_), 9) AS scan_share
      FROM fanned GROUP BY phase ORDER BY phase"""))

  // ---------- q502: watermark-delay planner -------------------------------

  /** Turning q494's lateness MEASUREMENT into the streaming config
    * DECISION: for each candidate watermark delay (0 s, 1 s, 10 s,
    * 1 min, 10 min, 1 h) compute exactly how many rows the pipeline
    * would drop (an event is lost iff its lateness under the hashed
    * arrival order exceeds the delay), and mark the smallest delay
    * meeting a 0.1 % loss SLA — the number an engineer actually sets
    * `withWatermark` to, derived from the data instead of folklore.
    * Shape: ONE per-user running-max window pass (q494's), one 1-row
    * aggregate of 6 conditional sums, the grid fanned from that row;
    * the SLA pick is a second 1-row aggregate joined back broadcast.
    * All integer µs/ppm. 6-row output.
    */
  private val q502 = QueryDef(
    "q502_watermark_delay_planner",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val arr = Portable.arrivalSeqSpark
      val w = Window.partitionBy(col("user_id"))
        .orderBy(expr(arr), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val grid = Seq(0L, 1000000L, 10000000L, 60000000L, 600000000L,
        3600000000L)
      val late = Fixtures.table(s, dir, "events")
        .withColumn("hwm", max(col("ts")).over(w))
        .select(greatest(lit(0L),
          coalesce(expr("timestampdiff(MICROSECOND, ts, hwm)"), lit(0L)))
          .as("late_us"))
      val one = late.agg(count(lit(1)).as("n"),
        grid.map(d => sum(when(col("late_us") > d, 1L).otherwise(0L))
          .as(s"lost_$d")): _*)
      val fanned = one.select(col("n"),
        explode(array(grid.map(d => struct(lit(d).as("delay_us"),
          col(s"lost_$d").as("n_lost"))): _*)).as("r"))
        .select(col("r.delay_us").as("delay_us"), col("n"),
          col("r.n_lost").as("n_lost"))
        .withColumn("loss_ppm", expr("n_lost * 1000000 div n"))
        .withColumn("meets_sla", col("loss_ppm") <= 1000L)
      val pick = fanned.agg(min(when(col("meets_sla"),
        col("delay_us"))).as("chosen_us"))
      fanned.crossJoin(broadcast(pick))
        .select(col("delay_us"), col("n_lost"), col("loss_ppm"),
          col("meets_sla"),
          (col("delay_us") === coalesce(col("chosen_us"), lit(-1L)))
            .as("chosen"))
        .orderBy("delay_us")
    },
    Some(s"""WITH hw AS (SELECT greatest(0, coalesce(
          epoch_us(max(ts) OVER (PARTITION BY user_id
            ORDER BY ${Portable.arrivalSeqDuck}, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
          - epoch_us(ts), 0))::BIGINT AS late_us
        FROM events),
      g AS (SELECT CAST(unnest([0, 1000000, 10000000, 60000000,
          600000000, 3600000000]) AS BIGINT) AS delay_us),
      f AS (SELECT delay_us,
          (SELECT count(*) FROM hw WHERE late_us > delay_us)::BIGINT
            AS n_lost,
          (SELECT count(*) FROM hw)::BIGINT AS n
        FROM g),
      f2 AS (SELECT delay_us, n_lost,
          n_lost * 1000000 // n AS loss_ppm,
          n_lost * 1000000 // n <= 1000 AS meets_sla
        FROM f),
      pick AS (SELECT min(CASE WHEN meets_sla THEN delay_us END)
          AS chosen_us FROM f2)
      SELECT delay_us, n_lost, loss_ppm, meets_sla,
        (delay_us = coalesce(chosen_us, -1)) AS chosen
      FROM f2, pick ORDER BY delay_us"""))

  // ---------- q504: retention / vacuum planner ----------------------------

  /** Time-travel retention planning — the VACUUM decision a versioned
    * (lakehouse) table needs: snapshots are daily versions of the
    * event log (epoch-day), the policy keeps the trailing R days plus
    * weekly anchor versions (day ≡ 0 mod 7 — the long-term audit
    * trail), and everything else is reclaimable. Swept over
    * R ∈ {7, 30, 90}: versions dropped, rows and bytes reclaimed
    * (payload-proxy = JSON props length), reclaim share — the
    * storage-vs-history curve the retention knob trades along.
    * Shape: one grouped pass folds the log to a ≤|days|-row version
    * manifest; the 3-policy sweep fans THAT frame, never the log.
    * 3-row output, exact int64.
    */
  private val q504 = QueryDef(
    "q504_retention_vacuum",
    (s, dir) => {
      val vers = Fixtures.table(s, dir, "events")
        .select(expr("CAST(datediff(ts, DATE '1970-01-01') AS BIGINT)")
          .as("v"),
          length(col("props")).cast("long").as("b"))
        .groupBy(col("v"))
        .agg(count(lit(1)).as("n_rows"), sum(col("b")).as("bytes"))
      val latest = vers.agg(max(col("v")).as("latest"),
        count(lit(1)).as("n_versions_total"),
        sum(col("n_rows")).as("rows_total"),
        sum(col("bytes")).as("bytes_total"))
      vers.crossJoin(broadcast(latest))
        .select(explode(array(Seq(7L, 30L, 90L).map(lit): _*))
          .as("retention_days"),
          col("v"), col("latest"), col("n_rows"), col("bytes"),
          col("n_versions_total"), col("rows_total"), col("bytes_total"))
        .withColumn("keep",
          col("v") > col("latest") - col("retention_days")
            || col("v") % 7 === 0L)
        .groupBy(col("retention_days"))
        .agg(max(col("n_versions_total")).as("n_versions_total"),
          sum(when(!col("keep"), 1L).otherwise(0L)).as("n_versions_dropped"),
          sum(when(!col("keep"), col("n_rows")).otherwise(0L))
            .as("rows_reclaimed"),
          sum(when(!col("keep"), col("bytes")).otherwise(0L))
            .as("bytes_reclaimed"),
          max(col("bytes_total")).as("bytes_total"))
        .select(col("retention_days"), col("n_versions_total"),
          col("n_versions_dropped"), col("rows_reclaimed"),
          col("bytes_reclaimed"),
          round(col("bytes_reclaimed").cast("double")
            / col("bytes_total"), 9).as("reclaim_share"))
        .orderBy("retention_days")
    },
    Some("""WITH vers AS (SELECT epoch_us(ts) // 86400000000 AS v,
          count(*)::BIGINT AS n_rows,
          sum(length(props))::BIGINT AS bytes
        FROM events GROUP BY 1),
      tot AS (SELECT max(v) AS latest, count(*)::BIGINT
            AS n_versions_total,
          sum(n_rows)::BIGINT AS rows_total,
          sum(bytes)::BIGINT AS bytes_total FROM vers),
      fan AS (SELECT r.retention_days, v, latest, n_rows, bytes,
          n_versions_total, bytes_total,
          (v > latest - r.retention_days OR v % 7 = 0) AS keep
        FROM vers, tot,
          (SELECT CAST(unnest([7, 30, 90]) AS BIGINT)
            AS retention_days) r)
      SELECT retention_days, max(n_versions_total)::BIGINT
          AS n_versions_total,
        sum(CASE WHEN keep THEN 0 ELSE 1 END)::BIGINT
          AS n_versions_dropped,
        sum(CASE WHEN keep THEN 0 ELSE n_rows END)::BIGINT
          AS rows_reclaimed,
        sum(CASE WHEN keep THEN 0 ELSE bytes END)::BIGINT
          AS bytes_reclaimed,
        round(sum(CASE WHEN keep THEN 0 ELSE bytes END)::DOUBLE
          / max(bytes_total), 9) AS reclaim_share
      FROM fan GROUP BY retention_days ORDER BY retention_days"""))

  // ---------- q508: backfill partition planner ----------------------------

  /** What late data COSTS in rewrites — the operational consequence of
    * q502's watermark choice on a date-partitioned sink: every event
    * later than the chosen delay (60 s here, q502's grid point) misses
    * its micro-batch and must be backfilled into its EVENT-DATE
    * partition; on a copy-on-write table each dirtied partition
    * rewrites whole, so the cost is (partition rows) per touched
    * partition, not (late rows). Per event-date partition: resident
    * rows, late arrivals landing there, and the rewrite amplification
    * (partition rows div late rows — how many clean rows each dirty
    * row drags through the writer); the 1-row summary a merge-on-read
    * vs copy-on-write decision reads (q488's delete-shape logic, at
    * the ingest end) rides along on every row. Shape: q494's one
    * running-max window pass, one per-day aggregate, one ≤|days|-row
    * join; exact int64. Only dirtied partitions emit.
    */
  private val q508 = QueryDef(
    "q508_backfill_partitions",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val arr = Portable.arrivalSeqSpark
      val w = Window.partitionBy(col("user_id"))
        .orderBy(expr(arr), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val ev = Fixtures.table(s, dir, "events")
        .withColumn("hwm", max(col("ts")).over(w))
        .select(expr("CAST(datediff(ts, DATE '1970-01-01') AS BIGINT)")
          .as("day"),
          (greatest(lit(0L), coalesce(
            expr("timestampdiff(MICROSECOND, ts, hwm)"), lit(0L)))
            > 60000000L).cast("long").as("is_late"))
      val perDay = ev.groupBy(col("day"))
        .agg(count(lit(1)).as("n_rows"), sum(col("is_late")).as("n_late"))
      val tot = perDay.agg(
        sum(col("n_rows")).as("rows_total"),
        sum(when(col("n_late") > 0L, col("n_rows")).otherwise(0L))
          .as("rows_rewritten"),
        sum(col("n_late")).as("late_total"),
        sum(when(col("n_late") > 0L, 1L).otherwise(0L))
          .as("n_dirty_partitions"))
      perDay.where(col("n_late") > 0L)
        .crossJoin(broadcast(tot))
        .select(col("day"), col("n_rows"), col("n_late"),
          expr("n_rows div n_late").as("rewrite_amplification"),
          col("n_dirty_partitions"), col("late_total"),
          round(col("rows_rewritten").cast("double")
            / col("rows_total"), 9).as("corpus_rewrite_share"))
        .orderBy("day")
    },
    Some(s"""WITH ev AS (SELECT
          epoch_us(ts) // 86400000000 AS day,
          CASE WHEN greatest(0, coalesce(
            epoch_us(max(ts) OVER (PARTITION BY user_id
              ORDER BY ${Portable.arrivalSeqDuck}, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
            - epoch_us(ts), 0)) > 60000000 THEN 1 ELSE 0 END
            ::BIGINT AS is_late
        FROM events),
      pd AS (SELECT day, count(*)::BIGINT AS n_rows,
          sum(is_late)::BIGINT AS n_late FROM ev GROUP BY 1),
      tot AS (SELECT sum(n_rows)::BIGINT AS rows_total,
          sum(CASE WHEN n_late > 0 THEN n_rows ELSE 0 END)::BIGINT
            AS rows_rewritten,
          sum(n_late)::BIGINT AS late_total,
          sum(CASE WHEN n_late > 0 THEN 1 ELSE 0 END)::BIGINT
            AS n_dirty_partitions
        FROM pd)
      SELECT day, n_rows, n_late,
        n_rows // n_late AS rewrite_amplification,
        n_dirty_partitions, late_total,
        round(rows_rewritten::DOUBLE / rows_total, 9)
          AS corpus_rewrite_share
      FROM pd, tot WHERE n_late > 0 ORDER BY day"""))

  val all: Seq[QueryDef] = Seq(q447, q448, q449, q450, q451, q452,
    q453, q454, q455, q456, q457, q458, q459, q460, q461, q462, q463,
    q464, q465, q466, q467, q468, q469, q470, q471, q472, q486, q487,
    q488, q489, q495, q496, q497, q502, q504, q508)
}
