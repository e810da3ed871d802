package graft.ops

import graft.{Fixtures, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-10 inference wave: the model-validation and classical-testing
  * members the regression / nonparametric / time-series families still
  * lacked. No reference counterpart (the reference is an ETL Lambda —
  * SURVEY.md §2.11a extension contract): each query pairs a Spark plan
  * with an independent DuckDB oracle and follows the standing exactness
  * convention (integer/DECIMAL-pinned moment sums, double math only on
  * 1-row / bounded frames, total ORDER BY).
  *
  * Scale design shared by the whole file: every statistic here reduces
  * to a FIXED number of exact moments collected in one (or two) linear
  * passes — the per-row work is codegen'd arithmetic, the shuffles
  * carry 1-row (or ≤|grid|-row) aggregate states, and all post-reduce
  * math runs on broadcast scalars. Nothing in this file materializes a
  * per-row sort, a corpus-sized window, or a driver-side loop.
  */
object Inference {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Fixtures.table(s, dir, "events")

  /** Shared q409/q413 point set: per-customer lifetime order count (y)
    * against rounded account balance (x) — zero-order customers kept
    * through the left join so the intercept is honest.
    */
  private def balancePoints(s: SparkSession, dir: String): DataFrame = {
    val cnt = Fixtures.table(s, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("y"))
    Fixtures.table(s, dir, "customer")
      .join(cnt, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(expr("CAST(round(c_acctbal) AS BIGINT)").as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
  }

  private val ptsDuck: String =
    """cnt AS (SELECT o_custkey, count(*)::BIGINT AS y
        FROM orders GROUP BY 1),
      pts AS (SELECT CAST(round(c_acctbal) AS BIGINT) AS x,
          coalesce(y, 0)::BIGINT AS y
        FROM customer LEFT JOIN cnt ON c_custkey = o_custkey)"""

  // ---------- q413: Cook's distance influence audit ---------------------

  /** Cook's distance over the balance→order-count regression — the
    * INFLUENCE member closing the q388 (leverage: could distort) /
    * q409 (PRESS: aggregate out-of-sample error) triangle: D_i =
    * e_i²·h_i / (p·s²·(1−h_i)²) names the individual points that DID
    * move the fit, and the count above the 4/n rule is the screening
    * number an analyst acts on. Shape: one exact-moment reduce
    * (slope/intercept/x̄/Sxx), one broadcast pass for RSS → s², one
    * more broadcast pass folding every D_i into a bounded summary
    * (count over threshold, max, micro-pinned mean) — three linear
    * scans, no per-point output, 1-row result at any corpus size.
    */
  private val q413 = QueryDef(
    "q413_cooks_distance",
    (s, dir) => {
      val pts = balancePoints(s, dir)
      val m = pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum((col("x") * col("x")).cast(DecimalType(38, 0))).as("sxx"),
        sum((col("x") * col("y")).cast(DecimalType(38, 0))).as("sxy"))
      val b = m.select(col("n"),
          ((col("n").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
            / (col("n").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double")))
            .as("slope"), col("sx"), col("sy"), col("sxx"))
        .select(col("n"), col("slope"),
          ((col("sy").cast("double") - col("slope")
            * col("sx").cast("double")) / col("n").cast("double"))
            .as("icept"),
          (col("sx").cast("double") / col("n").cast("double")).as("xbar"),
          (col("sxx").cast("double") - col("sx").cast("double")
            * col("sx").cast("double") / col("n").cast("double"))
            .as("sxxc"))
      val e = (col("y").cast("double") - col("icept")
        - col("slope") * col("x").cast("double"))
      val h = (lit(1.0) / col("n").cast("double")) +
        ((col("x").cast("double") - col("xbar")) *
          (col("x").cast("double") - col("xbar")) / col("sxxc"))
      val rss = pts.crossJoin(broadcast(b))
        .groupBy(col("n"))
        .agg(sum(round(e * e, 6).cast(DecimalType(38, 6))).as("rss"))
        .select(col("n").as("n2"),
          (col("rss").cast("double") / (col("n").cast("double") - 2.0))
            .as("s2"))
      val d = (e * e * h) /
        (lit(2.0) * col("s2") * (lit(1.0) - h) * (lit(1.0) - h))
      pts.crossJoin(broadcast(b)).crossJoin(broadcast(rss))
        .groupBy(col("n"))
        .agg(sum(when(d > lit(4.0) / col("n").cast("double"), 1L)
            .otherwise(0L)).as("n_influential"),
          max(d).as("mx"),
          sum(expr("CAST(round(" +
            "((y - icept - slope * x) * (y - icept - slope * x) " +
            " * (1.0 / n + (x - xbar) * (x - xbar) / sxxc)) " +
            "/ (2.0 * s2 * (1.0 - (1.0 / n + (x - xbar) * (x - xbar)" +
            " / sxxc)) * (1.0 - (1.0 / n + (x - xbar) * (x - xbar)" +
            " / sxxc))) * 1e9) AS BIGINT)").cast(DecimalType(38, 0)))
            .as("sd_nano"))
        .select(col("n"), col("n_influential"),
          round(lit(4.0) / col("n").cast("double"), 9).as("threshold"),
          round(col("mx"), 6).as("max_cookd"),
          round(col("sd_nano").cast("double") / 1e9
            / col("n").cast("double"), 9).as("mean_cookd"))
    },
    Some(s"""WITH $ptsDuck,
      m AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
          sum(y)::BIGINT AS sy, sum(x::HUGEINT * x) AS sxx,
          sum(x::HUGEINT * y) AS sxy FROM pts),
      b0 AS (SELECT n,
          (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
            / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
            AS slope, sx, sy, sxx FROM m),
      b AS (SELECT n, slope,
          (sy::DOUBLE - slope * sx::DOUBLE) / n::DOUBLE AS icept,
          sx::DOUBLE / n::DOUBLE AS xbar,
          sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n::DOUBLE AS sxxc
        FROM b0),
      r AS (SELECT n,
          (sum(round((y::DOUBLE - icept - slope * x)
            * (y::DOUBLE - icept - slope * x), 6)::DECIMAL(38,6))::DOUBLE
            / (n::DOUBLE - 2.0)) AS s2
        FROM pts, b GROUP BY n),
      dsum AS (SELECT b.n,
          sum(CASE WHEN
            ((y::DOUBLE - icept - slope * x) * (y::DOUBLE - icept - slope * x)
              * (1.0 / b.n + (x - xbar) * (x - xbar) / sxxc))
            / (2.0 * s2 * (1.0 - (1.0 / b.n + (x - xbar) * (x - xbar) / sxxc))
              * (1.0 - (1.0 / b.n + (x - xbar) * (x - xbar) / sxxc)))
            > 4.0 / b.n THEN 1 ELSE 0 END)::BIGINT AS n_influential,
          max(((y::DOUBLE - icept - slope * x) * (y::DOUBLE - icept - slope * x)
              * (1.0 / b.n + (x - xbar) * (x - xbar) / sxxc))
            / (2.0 * s2 * (1.0 - (1.0 / b.n + (x - xbar) * (x - xbar) / sxxc))
              * (1.0 - (1.0 / b.n + (x - xbar) * (x - xbar) / sxxc)))) AS mx,
          sum(CAST(round(
            ((y::DOUBLE - icept - slope * x) * (y::DOUBLE - icept - slope * x)
              * (1.0 / b.n + (x - xbar) * (x - xbar) / sxxc))
            / (2.0 * s2 * (1.0 - (1.0 / b.n + (x - xbar) * (x - xbar) / sxxc))
              * (1.0 - (1.0 / b.n + (x - xbar) * (x - xbar) / sxxc)))
            * 1e9) AS BIGINT)::HUGEINT) AS sd_nano
        FROM pts, b, r GROUP BY b.n)
      SELECT n, n_influential, round(4.0 / n::DOUBLE, 9) AS threshold,
        round(mx, 6) AS max_cookd,
        round(sd_nano::DOUBLE / 1e9 / n::DOUBLE, 9) AS mean_cookd
      FROM dsum"""))

  // ---------- q414: Mallows Cp model selection --------------------------

  /** Mallows Cp across the three candidate linear models for line
    * revenue (y = extended price in cents on x1 = quantity, x2 =
    * discount points) — the SELECTION member on top of q408's
    * shrinkage path and q409's validation number: Cp = RSS_p/s²_full
    * − n + 2p compares under-specified models against the full fit's
    * error variance, and Cp ≈ p flags the model whose bias is
    * negligible. Both single-variable RSS values and the 2-regressor
    * RSS come CLOSED-FORM from one exact-moment scan (the normal
    * equations of a 2-var regression are 2×2 — no iteration), so the
    * entire model lattice costs one linear pass + scalar math. 3-row
    * output, every sum DECIMAL-lifted (y² in cents² crosses int64 on
    * any real corpus).
    */
  private val q414 = QueryDef(
    "q414_mallows_cp",
    (s, dir) => {
      val pts = Fixtures.table(s, dir, "lineitem").select(
        expr("CAST(l_quantity AS BIGINT)").as("x1"),
        expr("CAST(round(l_discount * 100.0) AS BIGINT)").as("x2"),
        expr("CAST(round(l_extendedprice * 100.0) AS BIGINT)").as("y"))
      val m = pts.agg(count(lit(1)).as("n"), sum(col("x1")).as("s1"),
        sum(col("x2")).as("s2"), sum(col("y")).as("sy"),
        sum((col("x1") * col("x1")).cast(DecimalType(38, 0))).as("s11"),
        sum((col("x2") * col("x2")).cast(DecimalType(38, 0))).as("s22"),
        sum((col("x1") * col("x2")).cast(DecimalType(38, 0))).as("s12"),
        sum((col("x1") * col("y")).cast(DecimalType(38, 0))).as("s1y"),
        sum((col("x2") * col("y")).cast(DecimalType(38, 0))).as("s2y"),
        sum((col("y").cast(DecimalType(38, 0)) * col("y"))).as("syy"))
      val c = m.select(col("n"),
        (col("s11").cast("double") - col("s1").cast("double")
          * col("s1").cast("double") / col("n").cast("double")).as("c11"),
        (col("s22").cast("double") - col("s2").cast("double")
          * col("s2").cast("double") / col("n").cast("double")).as("c22"),
        (col("s12").cast("double") - col("s1").cast("double")
          * col("s2").cast("double") / col("n").cast("double")).as("c12"),
        (col("s1y").cast("double") - col("s1").cast("double")
          * col("sy").cast("double") / col("n").cast("double")).as("c1y"),
        (col("s2y").cast("double") - col("s2").cast("double")
          * col("sy").cast("double") / col("n").cast("double")).as("c2y"),
        (col("syy").cast("double") - col("sy").cast("double")
          * col("sy").cast("double") / col("n").cast("double")).as("cyy"))
      val rs = c.select(col("n"), col("cyy"),
        (col("cyy") - col("c1y") * col("c1y") / col("c11")).as("rss1"),
        (col("cyy") - col("c2y") * col("c2y") / col("c22")).as("rss2"),
        (col("cyy")
          - ((col("c22") * col("c1y") - col("c12") * col("c2y"))
            * col("c1y")
            + (col("c11") * col("c2y") - col("c12") * col("c1y"))
              * col("c2y"))
            / (col("c11") * col("c22") - col("c12") * col("c12")))
          .as("rssf"))
        .withColumn("s2f", col("rssf") / (col("n").cast("double") - 3.0))
      rs.select(col("n"),
          explode(array(
            struct(lit("x1_qty").as("model"), lit(2L).as("p_params"),
              col("rss1").as("rss")),
            struct(lit("x2_disc").as("model"), lit(2L).as("p_params"),
              col("rss2").as("rss")),
            struct(lit("x1_x2_full").as("model"), lit(3L).as("p_params"),
              col("rssf").as("rss")))).as("mrow"),
          col("cyy"), col("s2f"))
        .select(col("mrow.model").as("model"),
          col("mrow.p_params").as("p_params"),
          round(lit(1.0) - col("mrow.rss") / col("cyy"), 9).as("r2"),
          round(col("mrow.rss") / col("s2f") - col("n").cast("double")
            + lit(2.0) * col("mrow.p_params").cast("double"), 6)
            .as("cp"))
        .orderBy(col("model"))
    },
    Some("""WITH pts AS (SELECT CAST(l_quantity AS BIGINT) AS x1,
          CAST(round(l_discount * 100.0) AS BIGINT) AS x2,
          CAST(round(l_extendedprice * 100.0) AS BIGINT) AS y
        FROM lineitem),
      m AS (SELECT count(*)::BIGINT AS n, sum(x1)::BIGINT AS s1,
          sum(x2)::BIGINT AS s2, sum(y)::BIGINT AS sy,
          sum(x1::HUGEINT * x1) AS s11, sum(x2::HUGEINT * x2) AS s22,
          sum(x1::HUGEINT * x2) AS s12, sum(x1::HUGEINT * y) AS s1y,
          sum(x2::HUGEINT * y) AS s2y, sum(y::HUGEINT * y) AS syy
        FROM pts),
      c AS (SELECT n,
          s11::DOUBLE - s1::DOUBLE * s1::DOUBLE / n::DOUBLE AS c11,
          s22::DOUBLE - s2::DOUBLE * s2::DOUBLE / n::DOUBLE AS c22,
          s12::DOUBLE - s1::DOUBLE * s2::DOUBLE / n::DOUBLE AS c12,
          s1y::DOUBLE - s1::DOUBLE * sy::DOUBLE / n::DOUBLE AS c1y,
          s2y::DOUBLE - s2::DOUBLE * sy::DOUBLE / n::DOUBLE AS c2y,
          syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE AS cyy
        FROM m),
      rs AS (SELECT n, cyy,
          cyy - c1y * c1y / c11 AS rss1,
          cyy - c2y * c2y / c22 AS rss2,
          cyy - ((c22 * c1y - c12 * c2y) * c1y
            + (c11 * c2y - c12 * c1y) * c2y)
            / (c11 * c22 - c12 * c12) AS rssf
        FROM c),
      rs2 AS (SELECT *, rssf / (n::DOUBLE - 3.0) AS s2f FROM rs),
      rows3 AS (
        SELECT n, cyy, s2f, 'x1_qty' AS model, 2::BIGINT AS p_params,
          rss1 AS rss FROM rs2
        UNION ALL SELECT n, cyy, s2f, 'x2_disc', 2::BIGINT, rss2 FROM rs2
        UNION ALL SELECT n, cyy, s2f, 'x1_x2_full', 3::BIGINT, rssf
          FROM rs2)
      SELECT model, p_params, round(1.0 - rss / cyy, 9) AS r2,
        round(rss / s2f - n::DOUBLE + 2.0 * p_params::DOUBLE, 6) AS cp
      FROM rows3 ORDER BY model"""))

  // ---------- q415: ARCH LM volatility-clustering test ------------------

  /** Engle's ARCH LM test on the daily event-count series — the
    * CONDITIONAL-variance member of the diagnostics family: q389
    * (Breusch–Pagan) asks whether error variance moves with a
    * regressor, q390 (Durbin–Watson) whether LEVELS are serially
    * dependent; ARCH asks whether VOLATILITY clusters (today's squared
    * deviation predicting tomorrow's), the effect that makes naive CI
    * widths wrong on bursty traffic. LM = n_pairs·r² where r is the
    * lag-1 autocorrelation of squared deviations; χ²(1) under H₀.
    * Shape: one per-day count pass (the only corpus-sized scan),
    * deviations pinned to whole counts, squares lifted to
    * DECIMAL(38,0) BEFORE the lag-1 self-equi-join on day+1 (adjacent
    * observed days only — a calendar gap drops the pair rather than
    * fabricating one; same documented convention as q322/q339), one
    * 1-row moment reduce. Headroom: Σ(z²)² stays under 10³⁸ for daily
    * deviations up to ~1.7·10⁸ over ~10⁵ days ((1.7e8)⁴·10⁵ ≈
    * 8.4·10³⁷) — beyond the fixture's corpus-growth envelope by
    * construction.
    */
  private val q415 = QueryDef(
    "q415_arch_lm",
    (s, dir) => {
      val daily = ev(s, dir)
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("c"))
      val st = daily.agg(
        expr("CAST(round(sum(c) * 1000.0 / count(1)) AS BIGINT)")
          .as("mean_milli"))
      val sq = daily.crossJoin(broadcast(st))
        .select(col("day"),
          expr("CAST(round((c * 1000 - mean_milli) / 1000.0) AS BIGINT)")
            .as("z"))
        .select(col("day"),
          (col("z").cast(DecimalType(38, 0)) * col("z")).as("sq"))
      val lag = sq.select((col("day") - 1).as("day"),
        col("sq").as("sq1"))
      val mom = sq.join(lag, Seq("day"))
        .agg(count(lit(1)).as("np"),
          sum(col("sq")).as("sa"), sum(col("sq1")).as("sb"),
          sum(col("sq") * col("sq1")).as("sab"),
          sum(col("sq") * col("sq")).as("saa"),
          sum(col("sq1") * col("sq1")).as("sbb"))
      mom.select(col("np"),
          ((col("np").cast("double") * col("sab").cast("double")
            - col("sa").cast("double") * col("sb").cast("double"))
            / sqrt((col("np").cast("double") * col("saa").cast("double")
                - col("sa").cast("double") * col("sa").cast("double"))
              * (col("np").cast("double") * col("sbb").cast("double")
                - col("sb").cast("double") * col("sb").cast("double"))))
            .as("r"))
        .select(col("np").as("n_pairs"), round(col("r"), 9).as("arch_r"),
          round(col("np").cast("double") * col("r") * col("r"), 6)
            .as("lm_stat"),
          round(expr("2.0 * " + Portable.normCdfUpper(
            "sqrt(np * r * r)")), 9).as("p_value"),
          when(col("np").cast("double") * col("r") * col("r") > 3.841,
            "volatility_clustering").otherwise("homoskedastic")
            .as("verdict"))
    },
    Some(s"""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          count(*)::BIGINT AS c
        FROM events GROUP BY 1),
      st AS (SELECT round(sum(c)::BIGINT * 1000.0 / count(*))::BIGINT
          AS mean_milli FROM daily),
      sq AS (SELECT day,
          CAST(round((c * 1000 - mean_milli) / 1000.0) AS BIGINT)::HUGEINT
            * CAST(round((c * 1000 - mean_milli) / 1000.0) AS BIGINT)
            AS sq
        FROM daily, st),
      mom AS (SELECT count(*)::BIGINT AS np, sum(a.sq) AS sa,
          sum(b.sq) AS sb, sum(a.sq * b.sq) AS sab,
          sum(a.sq * a.sq) AS saa, sum(b.sq * b.sq) AS sbb
        FROM sq a JOIN sq b ON b.day = a.day + 1),
      rr AS (SELECT np,
          (np::DOUBLE * sab::DOUBLE - sa::DOUBLE * sb::DOUBLE)
            / sqrt((np::DOUBLE * saa::DOUBLE - sa::DOUBLE * sa::DOUBLE)
              * (np::DOUBLE * sbb::DOUBLE - sb::DOUBLE * sb::DOUBLE))
            AS r
        FROM mom)
      SELECT np AS n_pairs, round(r, 9) AS arch_r,
        round(np::DOUBLE * r * r, 6) AS lm_stat,
        round(2.0 * ${Portable.normCdfUpper("sqrt(np * r * r)")}, 9)
          AS p_value,
        CASE WHEN np::DOUBLE * r * r > 3.841
          THEN 'volatility_clustering' ELSE 'homoskedastic' END
          AS verdict
      FROM rr"""))

  // ---------- q416: Box–Cox transform selection -------------------------

  /** Box–Cox profile log-likelihood over λ ∈ {−1,−½,0,½,1} for
    * per-customer lifetime spend — the TRANSFORM-selection step that
    * should precede every normality-assuming test in the family (q333
    * Jarque–Bera rejects skewed spend; Box–Cox says WHICH power fixes
    * it): ℓ(λ) = −n/2·ln(SS(z_λ)/n) over the geomean-scaled transform
    * z_λ = (y^λ−1)/(λ·g^(λ−1)) (z₀ = g·ln y), whose scaling absorbs
    * the Jacobian so the five likelihoods are directly comparable.
    * Shape: pass 1 reduces n and nano-pinned Σln y (the geomean);
    * pass 2 fans each row across the 5-λ grid via explode (grid ×
    * corpus stays ONE linear scan — λ is a projection constant, not a
    * join), z micro-pinned into DECIMAL sums; all likelihood math on
    * the ≤5-row aggregate. Buyers only (y > 0 is the transform's
    * domain), stated in the output row count.
    */
  private val q416 = QueryDef(
    "q416_boxcox",
    (s, dir) => {
      val spend = Fixtures.table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(round(o_totalprice) AS BIGINT)"))
          .as("dollars"))
        .select(col("dollars"))
      val g = spend.agg(count(lit(1)).as("n"),
          sum(expr("CAST(round(ln(CAST(dollars AS DOUBLE)) * 1e9) " +
            "AS BIGINT)").cast(DecimalType(38, 0))).as("sln"))
        .select(col("n"),
          exp(col("sln").cast("double") / 1e9 / col("n").cast("double"))
            .as("gm"))
      val z = expr("""CASE WHEN lambda = 0.0
          THEN gm * ln(CAST(dollars AS DOUBLE))
          ELSE (pow(CAST(dollars AS DOUBLE), lambda) - 1.0)
            / (lambda * pow(gm, lambda - 1.0)) END""")
      spend.crossJoin(broadcast(g))
        .select(col("dollars"), col("n"), col("gm"),
          explode(array(lit(-1.0), lit(-0.5), lit(0.0), lit(0.5),
            lit(1.0))).as("lambda"))
        .groupBy(col("lambda"), col("n"))
        .agg(sum(round(z, 6).cast(DecimalType(38, 6))).as("sz"),
          sum(round(z * z, 2).cast(DecimalType(38, 2))).as("szz"))
        .select(col("lambda"), col("n"),
          round(lit(-0.5) * col("n").cast("double")
            * log((col("szz").cast("double")
              - col("sz").cast("double") * col("sz").cast("double")
                / col("n").cast("double")) / col("n").cast("double")),
            6).as("profile_loglik"))
        .orderBy(col("lambda"))
    },
    Some("""WITH spend AS (SELECT
          sum(CAST(round(o_totalprice) AS BIGINT))::BIGINT AS dollars
        FROM orders GROUP BY o_custkey),
      g AS (SELECT count(*)::BIGINT AS n,
          exp(sum(CAST(round(ln(dollars::DOUBLE) * 1e9) AS BIGINT)
            ::HUGEINT)::DOUBLE / 1e9 / count(*)::DOUBLE) AS gm
        FROM spend),
      fan AS (SELECT dollars, n, gm,
          CAST(unnest([-1.0, -0.5, 0.0, 0.5, 1.0]) AS DOUBLE) AS lambda
        FROM spend, g),
      zrows AS (SELECT lambda, n,
          CASE WHEN lambda = 0.0 THEN gm * ln(dollars::DOUBLE)
            ELSE (pow(dollars::DOUBLE, lambda) - 1.0)
              / (lambda * pow(gm, lambda - 1.0)) END AS z
        FROM fan),
      agg AS (SELECT lambda, n,
          sum(round(z, 6)::DECIMAL(38,6)) AS sz,
          sum(round(z * z, 2)::DECIMAL(38,2)) AS szz
        FROM zrows GROUP BY 1, 2)
      SELECT lambda, n,
        round(-0.5 * n::DOUBLE * ln((szz::DOUBLE
          - sz::DOUBLE * sz::DOUBLE / n::DOUBLE) / n::DOUBLE), 6)
          AS profile_loglik
      FROM agg ORDER BY lambda"""))

  // ---------- q417: variance-inflation-factor panel ---------------------

  /** VIF panel for the three lineitem pricing regressors (quantity,
    * discount points, tax points) — the COLLINEARITY screen q408's
    * ridge path presupposes and q353's shrunk covariance works
    * around: VIF_j = 1/(1−R²_j) from regressing each x_j on the other
    * two, all closed-form from the 3×3 correlation matrix (R²_1 =
    * (r₁₂² + r₁₃² − 2r₁₂r₁₃r₂₃)/(1−r₂₃²) and rotations). One
    * exact-moment scan (9 integer DECIMAL sums), scalar math on the
    * 1-row reduce, 3-row output — the answer "can I interpret these
    * coefficients separately?" costs one pass at any corpus size.
    */
  private val q417 = QueryDef(
    "q417_vif_panel",
    (s, dir) => {
      val pts = Fixtures.table(s, dir, "lineitem").select(
        expr("CAST(l_quantity AS BIGINT)").as("x1"),
        expr("CAST(round(l_discount * 100.0) AS BIGINT)").as("x2"),
        expr("CAST(round(l_tax * 100.0) AS BIGINT)").as("x3"))
      val m = pts.agg(count(lit(1)).as("n"),
        sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
        sum(col("x3")).as("s3"),
        sum((col("x1") * col("x1")).cast(DecimalType(38, 0))).as("s11"),
        sum((col("x2") * col("x2")).cast(DecimalType(38, 0))).as("s22"),
        sum((col("x3") * col("x3")).cast(DecimalType(38, 0))).as("s33"),
        sum((col("x1") * col("x2")).cast(DecimalType(38, 0))).as("s12"),
        sum((col("x1") * col("x3")).cast(DecimalType(38, 0))).as("s13"),
        sum((col("x2") * col("x3")).cast(DecimalType(38, 0))).as("s23"))
      def cij(sij: String, si: String, sj: String) =
        (col(sij).cast("double") - col(si).cast("double")
          * col(sj).cast("double") / col("n").cast("double"))
      val r = m.select(col("n"),
          (cij("s12", "s1", "s2") / sqrt(cij("s11", "s1", "s1")
            * cij("s22", "s2", "s2"))).as("r12"),
          (cij("s13", "s1", "s3") / sqrt(cij("s11", "s1", "s1")
            * cij("s33", "s3", "s3"))).as("r13"),
          (cij("s23", "s2", "s3") / sqrt(cij("s22", "s2", "s2")
            * cij("s33", "s3", "s3"))).as("r23"))
      def r2of(ra: String, rb: String, rc: String) =
        ((col(ra) * col(ra) + col(rb) * col(rb)
          - lit(2.0) * col(ra) * col(rb) * col(rc))
          / (lit(1.0) - col(rc) * col(rc)))
      r.select(col("n"),
          explode(array(
            struct(lit("x1_qty").as("v"),
              r2of("r12", "r13", "r23").as("r2")),
            struct(lit("x2_disc").as("v"),
              r2of("r12", "r23", "r13").as("r2")),
            struct(lit("x3_tax").as("v"),
              r2of("r13", "r23", "r12").as("r2")))).as("vr"))
        .select(col("vr.v").as("regressor"),
          round(col("vr.r2"), 9).as("r2_others"),
          round(lit(1.0) / (lit(1.0) - col("vr.r2")), 9).as("vif"))
        .orderBy(col("regressor"))
    },
    Some("""WITH pts AS (SELECT CAST(l_quantity AS BIGINT) AS x1,
          CAST(round(l_discount * 100.0) AS BIGINT) AS x2,
          CAST(round(l_tax * 100.0) AS BIGINT) AS x3
        FROM lineitem),
      m AS (SELECT count(*)::BIGINT AS n, sum(x1)::BIGINT AS s1,
          sum(x2)::BIGINT AS s2, sum(x3)::BIGINT AS s3,
          sum(x1::HUGEINT * x1) AS s11, sum(x2::HUGEINT * x2) AS s22,
          sum(x3::HUGEINT * x3) AS s33, sum(x1::HUGEINT * x2) AS s12,
          sum(x1::HUGEINT * x3) AS s13, sum(x2::HUGEINT * x3) AS s23
        FROM pts),
      r AS (SELECT n,
          (s12::DOUBLE - s1::DOUBLE * s2::DOUBLE / n::DOUBLE)
            / sqrt((s11::DOUBLE - s1::DOUBLE * s1::DOUBLE / n::DOUBLE)
              * (s22::DOUBLE - s2::DOUBLE * s2::DOUBLE / n::DOUBLE))
            AS r12,
          (s13::DOUBLE - s1::DOUBLE * s3::DOUBLE / n::DOUBLE)
            / sqrt((s11::DOUBLE - s1::DOUBLE * s1::DOUBLE / n::DOUBLE)
              * (s33::DOUBLE - s3::DOUBLE * s3::DOUBLE / n::DOUBLE))
            AS r13,
          (s23::DOUBLE - s2::DOUBLE * s3::DOUBLE / n::DOUBLE)
            / sqrt((s22::DOUBLE - s2::DOUBLE * s2::DOUBLE / n::DOUBLE)
              * (s33::DOUBLE - s3::DOUBLE * s3::DOUBLE / n::DOUBLE))
            AS r23
        FROM m),
      rows3 AS (
        SELECT 'x1_qty' AS regressor,
          (r12 * r12 + r13 * r13 - 2.0 * r12 * r13 * r23)
            / (1.0 - r23 * r23) AS r2 FROM r
        UNION ALL SELECT 'x2_disc',
          (r12 * r12 + r23 * r23 - 2.0 * r12 * r23 * r13)
            / (1.0 - r13 * r13) FROM r
        UNION ALL SELECT 'x3_tax',
          (r13 * r13 + r23 * r23 - 2.0 * r13 * r23 * r12)
            / (1.0 - r12 * r12) FROM r)
      SELECT regressor, round(r2, 9) AS r2_others,
        round(1.0 / (1.0 - r2), 9) AS vif
      FROM rows3 ORDER BY regressor"""))

  // ---------- q418: Wald–Wolfowitz runs test ---------------------------

  /** Runs test on the daily event-count series against its median —
    * the DISTRIIBUTION-FREE serial-dependence screen next to q390
    * (Durbin–Watson assumes a regression) and q339 (Ljung–Box assumes
    * moments): too FEW runs of above/below-median days means regimes,
    * too many means oscillation, and the test needs nothing but signs.
    * The median is the lower-median taken EXACTLY from the cumulative
    * of the bounded per-value histogram (distinct daily counts ≤
    * |days|, q314 rule — never a corpus-sized sort), signs are a
    * projection, and runs are counted by the adjacent-day lag join
    * (observed consecutive days only; a calendar gap neither starts
    * nor ends a run — documented convention, same family as q415).
    * One per-day pass + bounded-histogram math + one lag join, 1-row
    * output.
    */
  private val q418 = QueryDef(
    "q418_runs_test",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = ev(s, dir)
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("c"))
      val hist = daily.groupBy(col("c")).agg(count(lit(1)).as("w"))
      val tot = hist.agg(sum(col("w")).as("n"))
      val med = hist.crossJoin(broadcast(tot))
        .withColumn("cum", sum(col("w")).over(Window.orderBy(col("c"))))
        .where(col("cum") >= expr("(n + 1) div 2"))
        .agg(min(col("c")).as("med"))
      val signs = daily.crossJoin(broadcast(med))
        .select(col("day"), (col("c") > col("med")).cast("long")
          .as("sgn"))
      val lag = signs.select((col("day") - 1).as("day"),
        col("sgn").as("sgn1"))
      val sw = signs.join(lag, Seq("day"))
        .agg(sum(when(col("sgn") =!= col("sgn1"), 1L).otherwise(0L))
          .as("switches"))
      val cnt = signs.agg(count(lit(1)).as("nd"),
        sum(col("sgn")).as("n1"))
      cnt.crossJoin(broadcast(sw))
        .select(col("nd"), col("n1"), (col("nd") - col("n1")).as("n2"),
          (col("switches") + 1).as("runs"))
        .select(col("nd").as("n_days"), col("n1").as("n_above"),
          col("n2").as("n_below"), col("runs"),
          round((col("runs").cast("double")
            - (lit(1.0) + lit(2.0) * col("n1").cast("double")
              * col("n2").cast("double") / col("nd").cast("double")))
            / sqrt(lit(2.0) * col("n1").cast("double")
              * col("n2").cast("double")
              * (lit(2.0) * col("n1").cast("double")
                * col("n2").cast("double") - col("nd").cast("double"))
              / (col("nd").cast("double") * col("nd").cast("double")
                * (col("nd").cast("double") - 1.0))), 6).as("z_stat"),
          round(expr("2.0 * " + Portable.normCdfUpper(
            """abs((runs - (1.0 + 2.0 * n1 * n2 / CAST(nd AS DOUBLE)))
              / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - nd)
                / (CAST(nd AS DOUBLE) * nd * (nd - 1.0))))""")), 9)
            .as("p_value"))
    },
    Some(s"""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          count(*)::BIGINT AS c
        FROM events GROUP BY 1),
      hist AS (SELECT c, count(*)::BIGINT AS w FROM daily GROUP BY 1),
      tot AS (SELECT sum(w)::BIGINT AS n FROM hist),
      med AS (SELECT min(c) AS med FROM (
          SELECT c, sum(w) OVER (ORDER BY c) AS cum, n
          FROM hist, tot) WHERE cum >= (n + 1) // 2),
      signs AS (SELECT day, (c > med)::BIGINT AS sgn FROM daily, med),
      sw AS (SELECT sum(CASE WHEN a.sgn <> b.sgn THEN 1 ELSE 0 END)
            ::BIGINT AS switches
        FROM signs a JOIN signs b ON b.day = a.day + 1),
      cnt AS (SELECT count(*)::BIGINT AS nd, sum(sgn)::BIGINT AS n1
        FROM signs),
      f AS (SELECT nd, n1, nd - n1 AS n2, switches + 1 AS runs
        FROM cnt, sw)
      SELECT nd AS n_days, n1 AS n_above, n2 AS n_below, runs,
        round((runs - (1.0 + 2.0 * n1 * n2 / nd::DOUBLE))
          / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - nd)
            / (nd::DOUBLE * nd * (nd - 1.0))), 6) AS z_stat,
        round(2.0 * ${Portable.normCdfUpper(
          """abs((runs - (1.0 + 2.0 * n1 * n2 / nd::DOUBLE))
            / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - nd)
              / (nd::DOUBLE * nd * (nd - 1.0))))""")}, 9) AS p_value
      FROM f"""))

  // ---------- q419: Bartlett variance-homogeneity test ------------------

  /** Bartlett's test for equal order-value variance across the five
    * order priorities — the PARAMETRIC complement of q307 (Levene is
    * robust but low-power; Bartlett is the sharp instrument when q333
    * has not rejected normality, and running both brackets the
    * answer). T = [(N−k)·ln s_p² − Σ(n_i−1)·ln s_i²]/C with the usual
    * C correction, χ²(k−1) under H₀ via the Wilson–Hilferty tail.
    * Exactness: per-group (n, Σ cents, Σ cents²) are the ONLY
    * corpus-sized reductions; s_i² is pinned to whole cents² and
    * ln s_i² to nano before the ≤k-row sums (group-ORDER-free by
    * construction — summing raw doubles over groups would tie the
    * result to reduce order), and every cross-group term rides
    * DECIMAL. One grouped scan, bounded math, 1-row output.
    */
  private val q419 = QueryDef(
    "q419_bartlett",
    (s, dir) => {
      val g = Fixtures.table(s, dir, "orders")
        .select(col("o_orderpriority").as("grp"),
          expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").as("y"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum((col("y").cast(DecimalType(38, 0)) * col("y"))).as("syy"))
      val per = g.select(col("grp"), col("n"),
          expr("""CAST(round((CAST(syy AS DOUBLE)
            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)
            / (n - 1.0)) AS BIGINT)""").as("s2c"))
        .select(col("grp"), col("n"), col("s2c"),
          expr("CAST(round(ln(CAST(s2c AS DOUBLE)) * 1e9) AS BIGINT)")
            .as("ln_nano"),
          expr("CAST(round(1e15 / (n - 1.0)) AS BIGINT)").as("inv_f"))
      val agg = per.agg(count(lit(1)).as("k"), sum(col("n")).as("nt"),
        sum(((col("n") - 1).cast(DecimalType(38, 0)) * col("s2c")))
          .as("spnum"),
        sum(((col("n") - 1).cast(DecimalType(38, 0)) * col("ln_nano")))
          .as("slnw"),
        sum(col("inv_f")).as("sinv"))
      agg.select(col("k"), col("nt"),
          ((col("nt") - col("k")).cast("double")
            * log(col("spnum").cast("double")
              / (col("nt") - col("k")).cast("double"))
            - col("slnw").cast("double") / 1e9).as("num"),
          (lit(1.0) + (col("sinv").cast("double") / 1e15
            - lit(1.0) / (col("nt") - col("k")).cast("double"))
            / (lit(3.0) * (col("k").cast("double") - 1.0))).as("cc"))
        .select(col("k").as("k_groups"), col("nt").as("n_total"),
          round(col("num") / col("cc"), 6).as("bartlett_t"),
          (col("k") - 1).as("df"),
          round(expr(Portable.chi2UpperP("num / cc",
            "CAST(k_groups AS DOUBLE) - 1.0")), 9).as("p_value"))
        .withColumn("verdict", when(col("p_value") < 0.01,
          "heteroskedastic").otherwise("variance_homogeneous"))
    },
    Some(s"""WITH g AS (SELECT o_orderpriority AS grp,
          count(*)::BIGINT AS n,
          sum(CAST(round(o_totalprice * 100.0) AS BIGINT))::BIGINT AS sy,
          sum(CAST(round(o_totalprice * 100.0) AS BIGINT)::HUGEINT
            * CAST(round(o_totalprice * 100.0) AS BIGINT)) AS syy
        FROM orders GROUP BY 1),
      per AS (SELECT grp, n,
          CAST(round((syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n)
            / (n - 1.0)) AS BIGINT) AS s2c,
          n FROM g),
      per2 AS (SELECT grp, n, s2c,
          CAST(round(ln(s2c::DOUBLE) * 1e9) AS BIGINT) AS ln_nano,
          CAST(round(1e15 / (n - 1.0)) AS BIGINT) AS inv_f
        FROM per),
      agg AS (SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS nt,
          sum((n - 1)::HUGEINT * s2c) AS spnum,
          sum((n - 1)::HUGEINT * ln_nano) AS slnw,
          sum(inv_f)::BIGINT AS sinv
        FROM per2),
      st AS (SELECT k, nt,
          (nt - k)::DOUBLE * ln(spnum::DOUBLE / (nt - k)::DOUBLE)
            - slnw::DOUBLE / 1e9 AS num,
          1.0 + (sinv::DOUBLE / 1e15 - 1.0 / (nt - k)::DOUBLE)
            / (3.0 * (k::DOUBLE - 1.0)) AS cc
        FROM agg)
      SELECT k AS k_groups, nt AS n_total,
        round(num / cc, 6) AS bartlett_t, k - 1 AS df,
        round(${Portable.chi2UpperP("num / cc", "k::DOUBLE - 1.0")}, 9)
          AS p_value,
        CASE WHEN ${Portable.chi2UpperP("num / cc", "k::DOUBLE - 1.0")}
          < 0.01 THEN 'heteroskedastic' ELSE 'variance_homogeneous' END
          AS verdict
      FROM st"""))

  // ---------- q420: Jonckheere–Terpstra ordered-trend test --------------

  /** Jonckheere–Terpstra test for a MONOTONE order-value trend across
    * the five priority classes — the ordered-alternative member the
    * k-group family lacks: q358/q407 (ANOVA, Kruskal–Wallis) test
    * "any difference" and waste power when the business question is
    * "does value rise as priority rises". J counts cross-group
    * concordant pairs (ties half-weighted, kept exact by accumulating
    * 2J as an integer). Values ride the q295 binned convention
    * ($1000 bins), so the pair count collapses to the bounded
    * (group × bin) cell table: the cross-cell join is ≤ (k·|bins|)²
    * broadcast rows at ANY corpus size, and the corpus contributes
    * one grouped counting pass. Mean/variance under H₀ use the
    * no-tie normal approximation (documented; bins make ties common
    * so z is conservative) — DECIMAL-exact integer moments, double
    * math on the 1-row reduce.
    */
  private val q420 = QueryDef(
    "q420_jonckheere",
    (s, dir) => {
      val cells = Fixtures.table(s, dir, "orders")
        .select(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)")
            .as("g"),
          expr("CAST(round(o_totalprice) AS BIGINT) div 4000").as("v"))
        .groupBy(col("g"), col("v")).agg(count(lit(1)).as("w"))
      val c2 = cells.select(col("g").as("g2"), col("v").as("v2"),
        col("w").as("w2"))
      val twoJ = cells.crossJoin(broadcast(c2))
        .where(col("g") < col("g2"))
        .agg(sum((col("w").cast(DecimalType(38, 0)) * col("w2")
          * (when(col("v") < col("v2"), 2L)
            .when(col("v") === col("v2"), 1L).otherwise(0L))))
          .as("two_j"))
      val sizes = cells.groupBy(col("g")).agg(sum(col("w")).as("ng"))
        .agg(sum(col("ng")).as("n"),
          sum(col("ng").cast(DecimalType(38, 0)) * col("ng")).as("sn2"),
          sum(col("ng").cast(DecimalType(38, 0)) * col("ng")
            * (lit(2L) * col("ng") + lit(3L))).as("sn23"))
      sizes.crossJoin(broadcast(twoJ))
        .select(col("n"),
          (col("two_j").cast("double") / 2.0).as("j"),
          ((col("n").cast("double") * col("n").cast("double")
            - col("sn2").cast("double")) / 4.0).as("ej"),
          ((col("n").cast("double") * col("n").cast("double")
            * (lit(2.0) * col("n").cast("double") + 3.0)
            - col("sn23").cast("double")) / 72.0).as("vj"))
        .select(col("n"), round(col("j"), 1).as("j_stat"),
          round(col("ej"), 1).as("expected_j"),
          round((col("j") - col("ej")) / sqrt(col("vj")), 6).as("z_stat"),
          round(expr("2.0 * " + Portable.normCdfUpper(
            "abs((j - ej) / sqrt(vj))")), 9).as("p_value"),
          when(abs((col("j") - col("ej")) / sqrt(col("vj"))) > 3.29,
            "monotone_trend").otherwise("no_ordered_trend").as("verdict"))
    },
    Some(s"""WITH cells AS (SELECT
          CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS g,
          CAST(round(o_totalprice) AS BIGINT) // 4000 AS v,
          count(*)::BIGINT AS w
        FROM orders GROUP BY 1, 2),
      tj AS (SELECT sum(a.w::HUGEINT * b.w
            * (CASE WHEN a.v < b.v THEN 2
               WHEN a.v = b.v THEN 1 ELSE 0 END)) AS two_j
        FROM cells a, cells b WHERE a.g < b.g),
      gs AS (SELECT g, sum(w)::BIGINT AS ng FROM cells GROUP BY 1),
      sizes AS (SELECT sum(ng)::BIGINT AS n,
          sum(ng::HUGEINT * ng) AS sn2,
          sum(ng::HUGEINT * ng * (2 * ng + 3)) AS sn23
        FROM gs),
      st AS (SELECT n, two_j::DOUBLE / 2.0 AS j,
          (n::DOUBLE * n::DOUBLE - sn2::DOUBLE) / 4.0 AS ej,
          (n::DOUBLE * n::DOUBLE * (2.0 * n::DOUBLE + 3.0)
            - sn23::DOUBLE) / 72.0 AS vj
        FROM sizes, tj)
      SELECT n, round(j, 1) AS j_stat, round(ej, 1) AS expected_j,
        round((j - ej) / sqrt(vj), 6) AS z_stat,
        round(2.0 * ${Portable.normCdfUpper(
          "abs((j - ej) / sqrt(vj))")}, 9) AS p_value,
        CASE WHEN abs((j - ej) / sqrt(vj)) > 3.29
          THEN 'monotone_trend' ELSE 'no_ordered_trend' END AS verdict
      FROM st"""))

  // ---------- q421: Mood's median test ----------------------------------

  /** Mood's median test for line quantity across return flags — the
    * MOST-robust k-group location test (only above/below the grand
    * median enters, so a single corrupt extreme moves nothing; the
    * price paid vs q407 Kruskal–Wallis is power, which is exactly why
    * both belong on the board). Quantity's value domain is BOUNDED
    * (1–50), so the grand lower-median is exact from the cumulative
    * of the 50-bin histogram — no percentile sketch, no sort — and
    * the test collapses to a (mode × above/below) contingency χ²(k−1)
    * with Wilson–Hilferty tail. One grouped counting pass over
    * lineitem, bounded math after; per-cell χ² terms nano-pinned so
    * the ≤2k-cell sum is reduce-order-free. 1-row output.
    */
  private val q421 = QueryDef(
    "q421_mood_median",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cells = Fixtures.table(s, dir, "lineitem")
        .select(col("l_returnflag").as("g"),
          expr("CAST(l_quantity AS BIGINT)").as("q"))
        .groupBy(col("g"), col("q")).agg(count(lit(1)).as("w"))
      val hist = cells.groupBy(col("q")).agg(sum(col("w")).as("wq"))
      val tot = hist.agg(sum(col("wq")).as("n"))
      val med = hist.crossJoin(broadcast(tot))
        .withColumn("cum", sum(col("wq")).over(Window.orderBy(col("q"))))
        .where(col("cum") >= expr("(n + 1) div 2"))
        .agg(min(col("q")).as("med"))
      val byg = cells.crossJoin(broadcast(med))
        .groupBy(col("g"))
        .agg(sum(col("w")).as("ng"),
          sum(when(col("q") > col("med"), col("w")).otherwise(0L))
          .as("ag"))
      val gl = byg.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
        sum(col("ag")).as("a"))
      val term = expr("""CAST(round(
          (CAST(ag AS DOUBLE) - CAST(ng AS DOUBLE) * a / n)
          * (CAST(ag AS DOUBLE) - CAST(ng AS DOUBLE) * a / n)
          / (CAST(ng AS DOUBLE) * a / n) * 1e9) AS BIGINT)
        + CAST(round(
          (CAST(ng - ag AS DOUBLE) - CAST(ng AS DOUBLE) * (n - a) / n)
          * (CAST(ng - ag AS DOUBLE) - CAST(ng AS DOUBLE) * (n - a) / n)
          / (CAST(ng AS DOUBLE) * (n - a) / n) * 1e9) AS BIGINT)""")
      byg.crossJoin(broadcast(gl)).crossJoin(broadcast(med))
        .agg(max(col("k")).as("k2"), max(col("n")).as("n2"),
          max(col("med")).as("med2"),
          sum(term.cast(DecimalType(38, 0))).as("chi_nano"))
        .select(col("k2").as("k_groups"), col("n2").as("n_total"),
          col("med2").as("median_qty"),
          round(col("chi_nano").cast("double") / 1e9, 6).as("chi2"),
          (col("k2") - 1).as("df"),
          round(expr(Portable.chi2UpperP("chi_nano / 1e9",
            "CAST(k_groups AS DOUBLE) - 1.0")), 9).as("p_value"))
        .withColumn("verdict", when(col("p_value") < 0.01,
          "medians_differ").otherwise("consistent_medians"))
    },
    Some(s"""WITH cells AS (SELECT l_returnflag AS g,
          CAST(l_quantity AS BIGINT) AS q, count(*)::BIGINT AS w
        FROM lineitem GROUP BY 1, 2),
      hist AS (SELECT q, sum(w)::BIGINT AS wq FROM cells GROUP BY 1),
      tot AS (SELECT sum(wq)::BIGINT AS n FROM hist),
      med AS (SELECT min(q) AS med FROM (
          SELECT q, sum(wq) OVER (ORDER BY q) AS cum, n
          FROM hist, tot) WHERE cum >= (n + 1) // 2),
      byg AS (SELECT g, sum(w)::BIGINT AS ng,
          sum(CASE WHEN q > med THEN w ELSE 0 END)::BIGINT AS ag
        FROM cells, med GROUP BY 1),
      gl AS (SELECT count(*)::BIGINT AS k, sum(ng)::BIGINT AS n,
          sum(ag)::BIGINT AS a FROM byg),
      chi AS (SELECT max(k) AS k, max(n) AS n, max(med) AS med,
          sum((CAST(round(
            (ag::DOUBLE - ng::DOUBLE * a / n)
            * (ag::DOUBLE - ng::DOUBLE * a / n)
            / (ng::DOUBLE * a / n) * 1e9) AS BIGINT)
          + CAST(round(
            ((ng - ag)::DOUBLE - ng::DOUBLE * (n - a) / n)
            * ((ng - ag)::DOUBLE - ng::DOUBLE * (n - a) / n)
            / (ng::DOUBLE * (n - a) / n) * 1e9) AS BIGINT))::HUGEINT)
            AS chi_nano
        FROM byg, gl, med)
      SELECT k AS k_groups, n AS n_total, med AS median_qty,
        round(chi_nano::DOUBLE / 1e9, 6) AS chi2, k - 1 AS df,
        round(${Portable.chi2UpperP("chi_nano / 1e9", "k::DOUBLE - 1.0")},
          9) AS p_value,
        CASE WHEN ${Portable.chi2UpperP("chi_nano / 1e9",
          "k::DOUBLE - 1.0")} < 0.01
          THEN 'medians_differ' ELSE 'consistent_medians' END AS verdict
      FROM chi"""))

  // ---------- q422: Cramér's V association panel ------------------------

  /** Cramér's V over three categorical pairs (line return-flag ×
    * line-status, order priority × order status, customer segment ×
    * nation) — the EFFECT-SIZE companion the χ²-based family lacks:
    * q109's χ² grows with N (everything is "significant" at corpus
    * scale), while V = sqrt(χ²/(N·(min(r,c)−1))) stays in [0,1] and
    * answers "how strongly are these actually coupled". Shape: per
    * pair, one grouped counting pass to the BOUNDED contingency cells
    * (levels × levels, never corpus-sized), margins and expecteds by
    * broadcast joins on those cells, per-cell χ² contributions
    * nano-pinned before the ≤|cells| sum (reduce-order-free), and a
    * 3-row union. The corpus cost is three counting scans; all test
    * math is on dimension-bounded frames.
    */
  private val q422 = QueryDef(
    "q422_cramers_v",
    (s, dir) => {
      def one(src: DataFrame, a: String, bcol: String, label: String)
          : DataFrame = {
        val cells = src.select(col(a).cast("string").as("ra"),
            col(bcol).cast("string").as("cb"))
          .groupBy(col("ra"), col("cb")).agg(count(lit(1)).as("o"))
        val rm = cells.groupBy(col("ra")).agg(sum(col("o")).as("rw"))
        val cm = cells.groupBy(col("cb")).agg(sum(col("o")).as("cw"))
        val nn = cells.agg(sum(col("o")).as("n"),
          countDistinct(col("ra")).as("rl"),
          countDistinct(col("cb")).as("cl"))
        val term = expr("""CAST(round(
            (o - CAST(rw AS DOUBLE) * cw / n)
            * (o - CAST(rw AS DOUBLE) * cw / n)
            / (CAST(rw AS DOUBLE) * cw / n) * 1e9) AS BIGINT)""")
        cells.join(broadcast(rm), "ra").join(broadcast(cm), "cb")
          .crossJoin(broadcast(nn))
          .agg(max(col("n")).as("n2"), max(col("rl")).as("rl2"),
            max(col("cl")).as("cl2"),
            sum(term.cast(DecimalType(38, 0))).as("chi_nano"))
          .select(lit(label).as("pair"), col("n2").as("n"),
            col("rl2").as("r_levels"), col("cl2").as("c_levels"),
            ((col("rl2") - 1) * (col("cl2") - 1)).as("df"),
            round(col("chi_nano").cast("double") / 1e9, 6).as("chi2"),
            round(sqrt(col("chi_nano").cast("double") / 1e9
              / (col("n2").cast("double")
                * (least(col("rl2"), col("cl2")) - 1).cast("double"))),
              9).as("cramers_v"))
      }
      val li = Fixtures.table(s, dir, "lineitem")
      val od = Fixtures.table(s, dir, "orders")
      val cu = Fixtures.table(s, dir, "customer")
      one(li, "l_returnflag", "l_linestatus", "flag_status")
        .unionAll(one(od, "o_orderpriority", "o_orderstatus",
          "priority_status"))
        .unionAll(one(cu, "c_mktsegment", "c_nationkey",
          "segment_nation"))
        .orderBy(col("pair"))
    },
    Some("""WITH
      c1 AS (SELECT l_returnflag::VARCHAR AS ra,
          l_linestatus::VARCHAR AS cb, count(*)::BIGINT AS o
        FROM lineitem GROUP BY 1, 2),
      c2 AS (SELECT o_orderpriority::VARCHAR AS ra,
          o_orderstatus::VARCHAR AS cb, count(*)::BIGINT AS o
        FROM orders GROUP BY 1, 2),
      c3 AS (SELECT c_mktsegment::VARCHAR AS ra,
          c_nationkey::VARCHAR AS cb, count(*)::BIGINT AS o
        FROM customer GROUP BY 1, 2),
      u AS (
        SELECT 'flag_status' AS pair, * FROM c1
        UNION ALL SELECT 'priority_status', * FROM c2
        UNION ALL SELECT 'segment_nation', * FROM c3),
      rm AS (SELECT pair, ra, sum(o)::BIGINT AS rw FROM u GROUP BY 1, 2),
      cm AS (SELECT pair, cb, sum(o)::BIGINT AS cw FROM u GROUP BY 1, 2),
      nn AS (SELECT pair, sum(o)::BIGINT AS n,
          count(DISTINCT ra)::BIGINT AS rl,
          count(DISTINCT cb)::BIGINT AS cl
        FROM u GROUP BY 1),
      agg AS (SELECT u.pair, max(n) AS n, max(rl) AS rl, max(cl) AS cl,
          sum(CAST(round(
            (o - rw::DOUBLE * cw / n) * (o - rw::DOUBLE * cw / n)
            / (rw::DOUBLE * cw / n) * 1e9) AS BIGINT)::HUGEINT)
            AS chi_nano
        FROM u
        JOIN rm ON rm.pair = u.pair AND rm.ra = u.ra
        JOIN cm ON cm.pair = u.pair AND cm.cb = u.cb
        JOIN nn ON nn.pair = u.pair
        GROUP BY 1)
      SELECT pair, n, rl AS r_levels, cl AS c_levels,
        (rl - 1) * (cl - 1) AS df,
        round(chi_nano::DOUBLE / 1e9, 6) AS chi2,
        round(sqrt(chi_nano::DOUBLE / 1e9
          / (n::DOUBLE * (least(rl, cl) - 1)::DOUBLE)), 9) AS cramers_v
      FROM agg ORDER BY pair"""))

  // ---------- q423: Somers' D ordinal association -----------------------

  /** Somers' D of return outcome on discount level — the ASYMMETRIC
    * ordinal measure completing the q234/q295 (symmetric rank
    * correlations) and q170 (AUC) corner: D_{Y|X} = (C−D)/(C+D+T_Y)
    * conditions on pairs that DIFFER in the predictor, which is the
    * right denominator when X (discount, 11 levels) is the dial a
    * planner turns and Y (returned or not) is the outcome — with
    * Goodman–Kruskal γ alongside as the ties-dropped upper read.
    * Both collapse to the bounded (discount × outcome) cell table:
    * concordant/discordant/Y-tied pair masses are exact integer sums
    * over ordered cell pairs (≤ 22² broadcast rows), DECIMAL-lifted
    * (pair masses are corpus²). One counting pass over lineitem,
    * bounded pair math, 1-row output.
    */
  private val q423 = QueryDef(
    "q423_somers_d",
    (s, dir) => {
      val cells = Fixtures.table(s, dir, "lineitem")
        .select(expr("CAST(round(l_discount * 100.0) AS BIGINT)")
            .as("x"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
        .groupBy(col("x"), col("y")).agg(count(lit(1)).as("w"))
      val c2 = cells.select(col("x").as("x2"), col("y").as("y2"),
        col("w").as("w2"))
      val pairsAgg = cells.crossJoin(broadcast(c2))
        .where(col("x") < col("x2"))
        .agg(
          sum(when(col("y") < col("y2"),
            col("w").cast(DecimalType(38, 0)) * col("w2"))
            .otherwise(lit(0L).cast(DecimalType(38, 0)))).as("cc"),
          sum(when(col("y") > col("y2"),
            col("w").cast(DecimalType(38, 0)) * col("w2"))
            .otherwise(lit(0L).cast(DecimalType(38, 0)))).as("dd"),
          sum(when(col("y") === col("y2"),
            col("w").cast(DecimalType(38, 0)) * col("w2"))
            .otherwise(lit(0L).cast(DecimalType(38, 0)))).as("ty"))
      val n = cells.agg(sum(col("w")).as("n"))
      n.crossJoin(broadcast(pairsAgg))
        .select(col("n"),
          col("cc").cast("double").as("c"),
          col("dd").cast("double").as("d"),
          col("ty").cast("double").as("t"))
        .select(col("n"), round(col("c"), 1).as("concordant"),
          round(col("d"), 1).as("discordant"),
          round(col("t"), 1).as("ties_y_only"),
          round((col("c") - col("d")) / (col("c") + col("d") + col("t")),
            9).as("somers_d_yx"),
          round((col("c") - col("d")) / (col("c") + col("d")), 9)
            .as("gamma"))
    },
    Some("""WITH cells AS (SELECT
          CAST(round(l_discount * 100.0) AS BIGINT) AS x,
          (CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT AS y,
          count(*)::BIGINT AS w
        FROM lineitem GROUP BY 1, 2),
      pr AS (SELECT
          sum(CASE WHEN a.y < b.y THEN a.w::HUGEINT * b.w
            ELSE 0::HUGEINT END) AS cc,
          sum(CASE WHEN a.y > b.y THEN a.w::HUGEINT * b.w
            ELSE 0::HUGEINT END) AS dd,
          sum(CASE WHEN a.y = b.y THEN a.w::HUGEINT * b.w
            ELSE 0::HUGEINT END) AS ty
        FROM cells a, cells b WHERE a.x < b.x),
      nn AS (SELECT sum(w)::BIGINT AS n FROM cells)
      SELECT n, round(cc::DOUBLE, 1) AS concordant,
        round(dd::DOUBLE, 1) AS discordant,
        round(ty::DOUBLE, 1) AS ties_y_only,
        round((cc::DOUBLE - dd::DOUBLE)
          / (cc::DOUBLE + dd::DOUBLE + ty::DOUBLE), 9) AS somers_d_yx,
        round((cc::DOUBLE - dd::DOUBLE) / (cc::DOUBLE + dd::DOUBLE), 9)
          AS gamma
      FROM nn, pr"""))

  // ---------- q424: Tukey HSD pairwise panel ----------------------------

  /** Tukey HSD pairwise comparisons across the five order priorities —
    * the FOLLOW-UP q358's omnibus F deliberately does not give: which
    * PAIRS of groups differ, with the studentized-range statistic
    * q = |m_i−m_j| / sqrt(MSE/2·(1/n_i+1/n_j)) held against the
    * k=5, df=∞ critical value 3.858 (α=0.05) so the 10 verdicts carry
    * family-wise control. Shape: one grouped moment pass (n, Σcents,
    * Σcents² per group — the only corpus work), pooled MSE from
    * cents²-pinned per-group variances exactly as q419, then a ≤k²
    * broadcast self-join of the 5-row group frame for the pairwise
    * panel. 10-row output, ordered.
    */
  private val q424 = QueryDef(
    "q424_tukey_hsd",
    (s, dir) => {
      val g = Fixtures.table(s, dir, "orders")
        .select(col("o_orderpriority").as("grp"),
          expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").as("y"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum((col("y").cast(DecimalType(38, 0)) * col("y"))).as("syy"))
      val per = g.select(col("grp"), col("n"), col("sy"),
        expr("""CAST(round((CAST(syy AS DOUBLE)
          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)
          / (n - 1.0)) AS BIGINT)""").as("s2c"))
      val mse = per.agg(sum(col("n")).as("nt"), count(lit(1)).as("k"),
          sum(((col("n") - 1).cast(DecimalType(38, 0)) * col("s2c")))
            .as("spnum"))
        .select((col("spnum").cast("double")
          / (col("nt") - col("k")).cast("double")).as("mse"))
      val b = per.select(col("grp").as("g2"), col("n").as("n2"),
        col("sy").as("sy2"))
      per.crossJoin(broadcast(b)).where(col("grp") < col("g2"))
        .crossJoin(broadcast(mse))
        .select(col("grp").as("group_a"), col("g2").as("group_b"),
          round((col("sy").cast("double") / col("n").cast("double")
            - col("sy2").cast("double") / col("n2").cast("double"))
            / 100.0, 2).as("mean_diff_dollars"),
          round(abs(col("sy").cast("double") / col("n").cast("double")
            - col("sy2").cast("double") / col("n2").cast("double"))
            / sqrt(col("mse") / 2.0
              * (lit(1.0) / col("n").cast("double")
                + lit(1.0) / col("n2").cast("double"))), 6).as("q_stat"))
        .withColumn("significant", col("q_stat") > 3.858)
        .orderBy(col("group_a"), col("group_b"))
    },
    Some("""WITH g AS (SELECT o_orderpriority AS grp,
          count(*)::BIGINT AS n,
          sum(CAST(round(o_totalprice * 100.0) AS BIGINT))::BIGINT AS sy,
          sum(CAST(round(o_totalprice * 100.0) AS BIGINT)::HUGEINT
            * CAST(round(o_totalprice * 100.0) AS BIGINT)) AS syy
        FROM orders GROUP BY 1),
      per AS (SELECT grp, n, sy,
          CAST(round((syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n)
            / (n - 1.0)) AS BIGINT) AS s2c
        FROM g),
      mse AS (SELECT sum((n - 1)::HUGEINT * s2c)::DOUBLE
          / (sum(n) - count(*))::DOUBLE AS mse
        FROM per)
      SELECT a.grp AS group_a, b.grp AS group_b,
        round((a.sy::DOUBLE / a.n - b.sy::DOUBLE / b.n) / 100.0, 2)
          AS mean_diff_dollars,
        round(abs(a.sy::DOUBLE / a.n - b.sy::DOUBLE / b.n)
          / sqrt(mse / 2.0 * (1.0 / a.n + 1.0 / b.n)), 6) AS q_stat,
        abs(a.sy::DOUBLE / a.n - b.sy::DOUBLE / b.n)
          / sqrt(mse / 2.0 * (1.0 / a.n + 1.0 / b.n)) > 3.858
          AS significant
      FROM per a, per b, mse WHERE a.grp < b.grp
      ORDER BY group_a, group_b"""))

  // ---------- q425: Lomb–Scargle periodogram ----------------------------

  /** Lomb–Scargle periodogram of daily event counts at periods 28/k
    * days (k = 1..8) — the GAP-HONEST spectral read: q300's classical
    * periodogram (like every FFT-style estimate) silently assumes an
    * evenly-sampled series, while the q322/q339/q415 family documents
    * that missing calendar days simply have no row; Lomb–Scargle is
    * the estimator DESIGNED for exactly that, weighting only observed
    * days and staying unbiased under gaps via the per-frequency phase
    * shift τ = atan2(Σsin 2ωt, Σcos 2ωt)/2ω. Shape: the per-day count
    * reduce is the only corpus-sized pass; the day table fans across
    * the 8-frequency grid in-projection (explode — no join), per-row
    * trig terms are micro-pinned so the per-frequency sums are exact
    * and reduce-order-free, and the two-stage (τ, then power) math
    * runs on ≤8-row broadcast frames. 8-row output.
    */
  private val q425 = QueryDef(
    "q425_lomb_scargle",
    (s, dir) => {
      val daily = ev(s, dir)
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("c"))
      val st = daily.agg(
        expr("CAST(round(sum(c) * 1000.0 / count(1)) AS BIGINT)")
          .as("mean_milli"))
      val fan = daily.crossJoin(broadcast(st))
        .select(col("day"),
          ((col("c") * 1000 - col("mean_milli")).cast("double") / 1000.0)
            .as("d"),
          explode(array((1 to 8).map(k => lit(k.toLong)): _*)).as("k"))
        .withColumn("omega",
          lit(2.0) * lit(math.Pi) * col("k").cast("double") / 28.0)
      val tau = fan.groupBy(col("k"), col("omega"))
        .agg(sum(expr("CAST(round(sin(2.0 * omega * day) * 1e6) " +
            "AS BIGINT)").cast(DecimalType(38, 0))).as("s2"),
          sum(expr("CAST(round(cos(2.0 * omega * day) * 1e6) " +
            "AS BIGINT)").cast(DecimalType(38, 0))).as("c2"))
        .select(col("k").as("k2"),
          (expr("atan2(CAST(s2 AS DOUBLE), CAST(c2 AS DOUBLE))")
            / (lit(2.0) * col("omega"))).as("tau"))
      val pw = fan.join(broadcast(tau), col("k") === col("k2"))
        .groupBy(col("k"), col("omega"))
        .agg(count(lit(1)).as("nd"),
          sum(expr("CAST(round(d * cos(omega * (day - tau)) * 1e6) " +
            "AS BIGINT)").cast(DecimalType(38, 0))).as("dc"),
          sum(expr("CAST(round(d * sin(omega * (day - tau)) * 1e6) " +
            "AS BIGINT)").cast(DecimalType(38, 0))).as("ds"),
          sum(expr("CAST(round(cos(omega * (day - tau)) " +
            "* cos(omega * (day - tau)) * 1e9) AS BIGINT)")
            .cast(DecimalType(38, 0))).as("cc"),
          sum(expr("CAST(round(sin(omega * (day - tau)) " +
            "* sin(omega * (day - tau)) * 1e9) AS BIGINT)")
            .cast(DecimalType(38, 0))).as("ss"),
          sum(expr("CAST(round(d * d * 1e6) AS BIGINT)")
            .cast(DecimalType(38, 0))).as("dd"))
      pw.select(col("k"), round(lit(28.0) / col("k").cast("double"), 3)
            .as("period_days"), col("nd").as("n_days"),
          (lit(0.5) * ((col("dc").cast("double") / 1e6)
              * (col("dc").cast("double") / 1e6)
              / (col("cc").cast("double") / 1e9)
            + (col("ds").cast("double") / 1e6)
              * (col("ds").cast("double") / 1e6)
              / (col("ss").cast("double") / 1e9))).as("power"),
          ((col("dd").cast("double") / 1e6)
            / col("nd").cast("double")).as("variance"))
        .select(col("k"), col("period_days"), col("n_days"),
          round(col("power"), 6).as("ls_power"),
          round(col("power") / col("variance"), 9).as("normalized_power"))
        .orderBy(col("k"))
    },
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          count(*)::BIGINT AS c
        FROM events GROUP BY 1),
      st AS (SELECT round(sum(c)::BIGINT * 1000.0 / count(*))::BIGINT
          AS mean_milli FROM daily),
      fan AS (SELECT day,
          (c * 1000 - mean_milli)::DOUBLE / 1000.0 AS d,
          CAST(unnest([1, 2, 3, 4, 5, 6, 7, 8]) AS BIGINT) AS k
        FROM daily, st),
      fan2 AS (SELECT *, 2.0 * pi() * k::DOUBLE / 28.0 AS omega
        FROM fan),
      tau AS (SELECT k,
          atan2(
            sum(CAST(round(sin(2.0 * omega * day) * 1e6) AS BIGINT)
              ::HUGEINT)::DOUBLE,
            sum(CAST(round(cos(2.0 * omega * day) * 1e6) AS BIGINT)
              ::HUGEINT)::DOUBLE)
            / (2.0 * max(omega)) AS tau
        FROM fan2 GROUP BY k),
      pw AS (SELECT f.k, f.omega, count(*)::BIGINT AS nd,
          sum(CAST(round(d * cos(omega * (day - tau)) * 1e6) AS BIGINT)
            ::HUGEINT) AS dc,
          sum(CAST(round(d * sin(omega * (day - tau)) * 1e6) AS BIGINT)
            ::HUGEINT) AS ds,
          sum(CAST(round(cos(omega * (day - tau))
            * cos(omega * (day - tau)) * 1e9) AS BIGINT)::HUGEINT) AS cc,
          sum(CAST(round(sin(omega * (day - tau))
            * sin(omega * (day - tau)) * 1e9) AS BIGINT)::HUGEINT) AS ss,
          sum(CAST(round(d * d * 1e6) AS BIGINT)::HUGEINT) AS dd
        FROM fan2 f JOIN tau ON tau.k = f.k
        GROUP BY 1, 2),
      res AS (SELECT k, round(28.0 / k::DOUBLE, 3) AS period_days,
          nd AS n_days,
          0.5 * ((dc::DOUBLE / 1e6) * (dc::DOUBLE / 1e6)
              / (cc::DOUBLE / 1e9)
            + (ds::DOUBLE / 1e6) * (ds::DOUBLE / 1e6)
              / (ss::DOUBLE / 1e9)) AS power,
          (dd::DOUBLE / 1e6) / nd::DOUBLE AS variance
        FROM pw)
      SELECT k, period_days, n_days, round(power, 6) AS ls_power,
        round(power / variance, 9) AS normalized_power
      FROM res ORDER BY k"""))

  // ---------- q426: Lo–MacKinlay variance-ratio test --------------------

  /** Variance-ratio test on daily log-count returns at horizons q ∈
    * {2, 4, 8} — the RANDOM-WALK screen the trend family brackets
    * from the other side: q334 (Mann–Kendall) asks "is there a
    * monotone drift", VR asks "is what remains a random walk"
    * (VR ≈ 1) or mean-reverting (VR < 1) / momentum-driven (VR > 1),
    * the read that decides whether q164's forecast machinery has
    * anything to model. The q-period return is taken DIRECTLY as
    * x_t − x_{t−q} via a day+q self-equi-join (observed pairs only —
    * gaps drop pairs, the standing convention), never a running
    * window; returns are nano-pinned so all moments are exact.
    * One per-day pass + 4 bounded lag joins + a ≤4-row reduce;
    * 3-row output.
    */
  private val q426 = QueryDef(
    "q426_variance_ratio",
    (s, dir) => {
      val x = ev(s, dir)
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("c"))
        .select(col("day"), expr("ln(CAST(c AS DOUBLE))").as("x"))
      def rq(q: Int): DataFrame = {
        val lag = x.select((col("day") - q).as("day"),
          col("x").as("xl"))
        x.join(lag, Seq("day"))
          .select(lit(q.toLong).as("q"),
            expr("CAST(round((xl - x) * 1e9) AS BIGINT)").as("r"))
      }
      val moms = rq(1).unionAll(rq(2)).unionAll(rq(4)).unionAll(rq(8))
        .groupBy(col("q"))
        .agg(count(lit(1)).as("np"), sum(col("r")).as("sr"),
          sum((col("r").cast(DecimalType(38, 0)) * col("r"))).as("srr"))
        .select(col("q"), col("np"),
          ((col("srr").cast("double")
            - col("sr").cast("double") * col("sr").cast("double")
              / col("np").cast("double"))
            / col("np").cast("double") / 1e18).as("v"))
      val base = moms.where(col("q") === 1)
        .select(col("v").as("v1"))
      moms.where(col("q") > 1).crossJoin(broadcast(base))
        .select(col("q"), col("np").as("n_pairs"),
          (col("v") / (col("q").cast("double") * col("v1"))).as("vr"))
        .select(col("q"), col("n_pairs"), round(col("vr"), 9).as("vr"),
          round((col("vr") - 1.0)
            / sqrt(lit(2.0) * (lit(2.0) * col("q").cast("double") - 1.0)
              * (col("q").cast("double") - 1.0)
              / (lit(3.0) * col("q").cast("double")
                * col("n_pairs").cast("double"))), 6).as("z_stat"),
          round(expr("2.0 * " + Portable.normCdfUpper(
            """abs((vr - 1.0) / sqrt(2.0 * (2.0 * q - 1.0) * (q - 1.0)
              / (3.0 * q * CAST(n_pairs AS DOUBLE))))""")), 9)
            .as("p_value"))
        .orderBy(col("q"))
    },
    Some(s"""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          ln(count(*)::DOUBLE) AS x
        FROM events GROUP BY 1),
      rr AS (
        SELECT 1::BIGINT AS q,
          CAST(round((b.x - a.x) * 1e9) AS BIGINT) AS r
        FROM daily a JOIN daily b ON b.day = a.day + 1
        UNION ALL SELECT 2::BIGINT,
          CAST(round((b.x - a.x) * 1e9) AS BIGINT)
        FROM daily a JOIN daily b ON b.day = a.day + 2
        UNION ALL SELECT 4::BIGINT,
          CAST(round((b.x - a.x) * 1e9) AS BIGINT)
        FROM daily a JOIN daily b ON b.day = a.day + 4
        UNION ALL SELECT 8::BIGINT,
          CAST(round((b.x - a.x) * 1e9) AS BIGINT)
        FROM daily a JOIN daily b ON b.day = a.day + 8),
      moms AS (SELECT q, count(*)::BIGINT AS np, sum(r)::BIGINT AS sr,
          sum(r::HUGEINT * r) AS srr
        FROM rr GROUP BY 1),
      v AS (SELECT q, np,
          (srr::DOUBLE - sr::DOUBLE * sr::DOUBLE / np::DOUBLE)
            / np::DOUBLE / 1e18 AS v
        FROM moms),
      f AS (SELECT a.q, a.np AS n_pairs,
          a.v / (a.q::DOUBLE * b.v) AS vr
        FROM v a, v b WHERE a.q > 1 AND b.q = 1)
      SELECT q, n_pairs, round(vr, 9) AS vr,
        round((vr - 1.0) / sqrt(2.0 * (2.0 * q - 1.0) * (q - 1.0)
          / (3.0 * q * n_pairs::DOUBLE)), 6) AS z_stat,
        round(2.0 * ${Portable.normCdfUpper(
          """abs((vr - 1.0) / sqrt(2.0 * (2.0 * q - 1.0) * (q - 1.0)
            / (3.0 * q * n_pairs::DOUBLE)))""")}, 9) AS p_value
      FROM f ORDER BY q"""))

  // ---------- q427: spectral entropy ------------------------------------

  /** Spectral entropy of the daily event-count series over the k =
    * 1..14 periodogram bins — the one-number FORECASTABILITY read on
    * top of the spectral family: q300 finds the dominant period, q425
    * reads power honestly under gaps; normalized entropy H =
    * −Σp·ln p / ln K answers "is the energy concentrated (predictable,
    * H → 0) or flat (noise, H → 1)", the triage number that decides
    * whether seasonal machinery (q143/q343/q164) is worth running at
    * all. Shape: same fan-out discipline as q425 — one per-day pass,
    * explode across 14 frequencies, micro-pinned trig sums, then all
    * entropy math on the bounded ≤14-row frame (per-bin p ln p
    * nano-pinned before the final sum so the bounded reduce is also
    * order-free). 1-row output.
    */
  private val q427 = QueryDef(
    "q427_spectral_entropy",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = ev(s, dir)
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
          .as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("c"))
      val st = daily.agg(
        expr("CAST(round(sum(c) * 1000.0 / count(1)) AS BIGINT)")
          .as("mean_milli"), count(lit(1)).as("nd"))
      val fan = daily.crossJoin(broadcast(st))
        .select(col("day"), col("nd"),
          ((col("c") * 1000 - col("mean_milli")).cast("double") / 1000.0)
            .as("d"),
          explode(array((1 to 14).map(k => lit(k.toLong)): _*)).as("k"))
        .withColumn("omega",
          lit(2.0) * lit(math.Pi) * col("k").cast("double") / 28.0)
      val pw = fan.groupBy(col("k"))
        .agg(max(col("nd")).as("nd"),
          sum(expr("CAST(round(d * cos(omega * day) * 1e6) AS BIGINT)")
            .cast(DecimalType(38, 0))).as("dc"),
          sum(expr("CAST(round(d * sin(omega * day) * 1e6) AS BIGINT)")
            .cast(DecimalType(38, 0))).as("ds"))
        .select(col("k"), col("nd"),
          (((col("dc").cast("double") / 1e6)
            * (col("dc").cast("double") / 1e6)
            + (col("ds").cast("double") / 1e6)
              * (col("ds").cast("double") / 1e6))
            / col("nd").cast("double")).as("p"))
      val tot = pw.agg(
        sum(expr("CAST(round(p * 1e6) AS BIGINT)")).as("ptot_micro"))
      val probs = pw.crossJoin(broadcast(tot))
        .select(col("k"), col("nd"), col("p"),
          (col("p") / (col("ptot_micro").cast("double") / 1e6))
            .as("pk"))
      val ent = probs.agg(max(col("nd")).as("n_days"),
        sum(expr("CAST(round(CASE WHEN pk > 0.0 " +
          "THEN -pk * ln(pk) ELSE 0.0 END * 1e9) AS BIGINT)"))
          .as("h_nano"),
        max(col("pk")).as("pmax"))
      val dom = probs
        .withColumn("rk", row_number().over(Window.orderBy(
          col("pk").desc, col("k"))))
        .where(col("rk") === 1)
        .select(col("k").as("dominant_k"),
          round(lit(28.0) / col("k").cast("double"), 3)
            .as("dominant_period_days"))
      ent.crossJoin(broadcast(dom))
        .select(col("n_days"),
          round(col("h_nano").cast("double") / 1e9
            / math.log(14.0), 9).as("spectral_entropy"),
          round(col("pmax"), 9).as("top_bin_share"),
          col("dominant_k"), col("dominant_period_days"))
    },
    Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
          count(*)::BIGINT AS c
        FROM events GROUP BY 1),
      st AS (SELECT round(sum(c)::BIGINT * 1000.0 / count(*))::BIGINT
          AS mean_milli, count(*)::BIGINT AS nd FROM daily),
      fan AS (SELECT day, nd,
          (c * 1000 - mean_milli)::DOUBLE / 1000.0 AS d,
          CAST(unnest([1,2,3,4,5,6,7,8,9,10,11,12,13,14]) AS BIGINT)
            AS k
        FROM daily, st),
      fan2 AS (SELECT *, 2.0 * pi() * k::DOUBLE / 28.0 AS omega
        FROM fan),
      pw AS (SELECT k, max(nd) AS nd,
          ((sum(CAST(round(d * cos(omega * day) * 1e6) AS BIGINT)
              ::HUGEINT)::DOUBLE / 1e6)
            * (sum(CAST(round(d * cos(omega * day) * 1e6) AS BIGINT)
              ::HUGEINT)::DOUBLE / 1e6)
           + (sum(CAST(round(d * sin(omega * day) * 1e6) AS BIGINT)
              ::HUGEINT)::DOUBLE / 1e6)
            * (sum(CAST(round(d * sin(omega * day) * 1e6) AS BIGINT)
              ::HUGEINT)::DOUBLE / 1e6)) / max(nd)::DOUBLE AS p
        FROM fan2 GROUP BY k),
      tot AS (SELECT sum(CAST(round(p * 1e6) AS BIGINT))::BIGINT
          AS ptot_micro FROM pw),
      probs AS (SELECT k, nd, p,
          p / (ptot_micro::DOUBLE / 1e6) AS pk
        FROM pw, tot),
      ent AS (SELECT max(nd) AS n_days,
          sum(CAST(round(CASE WHEN pk > 0.0
            THEN -pk * ln(pk) ELSE 0.0 END * 1e9) AS BIGINT))::BIGINT
            AS h_nano,
          max(pk) AS pmax
        FROM probs),
      dom AS (SELECT k AS dominant_k,
          round(28.0 / k::DOUBLE, 3) AS dominant_period_days
        FROM probs ORDER BY pk DESC, k LIMIT 1)
      SELECT n_days,
        round(h_nano::DOUBLE / 1e9 / ln(14.0), 9) AS spectral_entropy,
        round(pmax, 9) AS top_bin_share,
        dominant_k, dominant_period_days
      FROM ent, dom"""))

  // ---------- q428: mean reciprocal rank at 10 --------------------------

  /** MRR@10 of the revenue ranking against each brand's true
    * top-demand part — the FIRST-HIT member of the ranking-eval
    * family: q296 (NDCG) grades the whole list, q380 (AP) the full
    * precision profile; MRR answers the narrower product question
    * "how high does the one right answer sit?", the metric of record
    * for retrieval UIs where only the first relevant hit matters.
    * Per brand: rank parts by revenue (bounded per-brand windows —
    * partitions are brand-sized, never corpus-global), mark the
    * top-demand part as relevant (demand ties broken by part key),
    * score 1/rank if it lands in the top 10 else 0, micro-pinned
    * before the cross-brand mean so the bounded reduce is exact.
    * One grouped revenue/demand pass + bounded window math; 1-row
    * output.
    */
  private val q428 = QueryDef(
    "q428_mrr_at_10",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val perPart = Fixtures.table(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(expr("CAST(round(l_extendedprice * 100.0) AS BIGINT)"))
            .as("rev_c"),
          sum(expr("CAST(l_quantity AS BIGINT)")).as("demand"))
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
      val wRev = Window.partitionBy(col("p_brand"))
        .orderBy(col("rev_c").desc, col("l_partkey"))
      val wDem = Window.partitionBy(col("p_brand"))
        .orderBy(col("demand").desc, col("l_partkey"))
      val ranked = perPart
        .withColumn("rev_rank", row_number().over(wRev))
        .withColumn("dem_rank", row_number().over(wDem))
      val hits = ranked.where(col("dem_rank") === 1)
        .select(col("p_brand"), col("rev_rank"))
      hits.agg(count(lit(1)).as("n_brands"),
          sum(when(col("rev_rank") <= 10,
            expr("CAST(round(1e6 / rev_rank) AS BIGINT)"))
            .otherwise(0L)).as("rr_micro"),
          sum(when(col("rev_rank") === 1, 1L).otherwise(0L)).as("h1"),
          sum(when(col("rev_rank") <= 10, 1L).otherwise(0L)).as("h10"))
        .select(col("n_brands"),
          round(col("rr_micro").cast("double") / 1e6
            / col("n_brands").cast("double"), 9).as("mrr_at_10"),
          round(col("h1").cast("double")
            / col("n_brands").cast("double"), 9).as("hit_rate_at_1"),
          round(col("h10").cast("double")
            / col("n_brands").cast("double"), 9).as("hit_rate_at_10"))
    },
    Some("""WITH per AS (SELECT l_partkey,
          sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))::BIGINT
            AS rev_c,
          sum(CAST(l_quantity AS BIGINT))::BIGINT AS demand
        FROM lineitem GROUP BY 1),
      j AS (SELECT per.*, p_brand FROM per
        JOIN part ON p_partkey = l_partkey),
      ranked AS (SELECT p_brand,
          row_number() OVER (PARTITION BY p_brand
            ORDER BY rev_c DESC, l_partkey) AS rev_rank,
          row_number() OVER (PARTITION BY p_brand
            ORDER BY demand DESC, l_partkey) AS dem_rank
        FROM j),
      hits AS (SELECT p_brand, rev_rank FROM ranked WHERE dem_rank = 1)
      SELECT count(*)::BIGINT AS n_brands,
        round(sum(CASE WHEN rev_rank <= 10
            THEN CAST(round(1e6 / rev_rank) AS BIGINT) ELSE 0 END)
          ::DOUBLE / 1e6 / count(*)::DOUBLE, 9) AS mrr_at_10,
        round(sum(CASE WHEN rev_rank = 1 THEN 1 ELSE 0 END)::DOUBLE
          / count(*)::DOUBLE, 9) AS hit_rate_at_1,
        round(sum(CASE WHEN rev_rank <= 10 THEN 1 ELSE 0 END)::DOUBLE
          / count(*)::DOUBLE, 9) AS hit_rate_at_10
      FROM hits"""))

  // ---------- q429: link-prediction metric panel ------------------------

  /** Head-to-head evaluation of three link predictors on the
    * co-purchase graph — q294 SCORES candidate pairs with one metric
    * (Adamic–Adar); this query asks the prior question "which metric
    * is worth scoring with": common-neighbor count, Jaccard overlap,
    * and resource-allocation are computed for every 2-hop candidate
    * pair from the SAME df-capped adjacency join (centers with > 64
    * partners excluded — the q48/q294 cap, stated in both dialects),
    * pairs are labeled edge/non-edge against the observed pair list,
    * and each metric reports its mean on edges vs non-edges plus the
    * lift ratio — the separation read that picks the predictor. All
    * per-pair scores pin to pico/micro integers; the label join is a
    * broadcast-able equi-join; output is a 3-row panel at any corpus
    * size. Convention: cn counts only common neighbors reachable
    * through capped centers (deg ∈ [2,64]) while deg_a/deg_b in the
    * Jaccard denominator are FULL degrees — Jaccard/RA are therefore
    * computed on the capped graph's common neighbors against full
    * degrees, deliberately (identically in both dialects): the cap is
    * a candidate-generation bound, and dividing by full degree keeps
    * hub-adjacent scores conservatively small rather than inflating
    * them by pretending the hub's pruned edges don't exist.
    */
  private val q429 = QueryDef(
    "q429_link_prediction_eval",
    (s, dir) => {
      val pairs = Analytics.copurchasePairs(s, dir)
        .select(col("part_a"), col("part_b"))
      val deg = Analytics.copurchaseDegrees(s, dir)
      val adjW = Analytics.copurchaseAdjDeg(s, dir)
        .where(col("deg") >= 2 && col("deg") <= 64)
        .select(col("node"), col("nbr"),
          expr("CAST(round(1e12 / deg) AS BIGINT)").as("ra_pico"))
      val a = adjW.select(col("node"), col("nbr").as("cand_a"),
        col("ra_pico"))
      val b = adjW.select(col("node"), col("nbr").as("cand_b"))
      val cand = a.join(b, Seq("node"))
        .where(col("cand_a") < col("cand_b"))
        .groupBy(col("cand_a"), col("cand_b"))
        .agg(count(lit(1)).as("cn"), sum(col("ra_pico")).as("ra"))
      val dega = deg.select(col("node").as("cand_a"),
        col("deg").as("deg_a"))
      val degb = deg.select(col("node").as("cand_b"),
        col("deg").as("deg_b"))
      val lab = cand.join(dega, "cand_a").join(degb, "cand_b")
        .join(pairs.select(col("part_a").as("cand_a"),
          col("part_b").as("cand_b"), lit(1L).as("is_edge")),
          Seq("cand_a", "cand_b"), "left_outer")
        .select(coalesce(col("is_edge"), lit(0L)).as("lbl"),
          col("cn"),
          expr("""CAST(round(CAST(cn AS DOUBLE)
            / (deg_a + deg_b - cn) * 1e6) AS BIGINT)""").as("jac_micro"),
          col("ra"))
      val agg = lab.groupBy(col("lbl"))
        .agg(count(lit(1)).as("n"),
          sum(col("cn")).as("s_cn"),
          sum(col("jac_micro")).as("s_jac"),
          sum(col("ra").cast(DecimalType(38, 0))).as("s_ra"))
      val e = agg.where(col("lbl") === 1).select(col("n").as("ne"),
        col("s_cn").as("cn_e"), col("s_jac").as("jac_e"),
        col("s_ra").as("ra_e"))
      val o = agg.where(col("lbl") === 0).select(col("n").as("no"),
        col("s_cn").as("cn_o"), col("s_jac").as("jac_o"),
        col("s_ra").as("ra_o"))
      e.crossJoin(broadcast(o))
        .select(col("ne"), col("no"),
          explode(array(
            struct(lit("common_neighbors").as("metric"),
              (col("cn_e").cast("double") / col("ne").cast("double"))
                .as("me"),
              (col("cn_o").cast("double") / col("no").cast("double"))
                .as("mo")),
            struct(lit("jaccard").as("metric"),
              (col("jac_e").cast("double") / 1e6
                / col("ne").cast("double")).as("me"),
              (col("jac_o").cast("double") / 1e6
                / col("no").cast("double")).as("mo")),
            struct(lit("resource_allocation").as("metric"),
              (col("ra_e").cast("double") / 1e12
                / col("ne").cast("double")).as("me"),
              (col("ra_o").cast("double") / 1e12
                / col("no").cast("double")).as("mo")))).as("m"))
        .select(col("m.metric").as("metric"),
          col("ne").as("n_edge_pairs"), col("no").as("n_nonedge_pairs"),
          round(col("m.me"), 9).as("mean_on_edges"),
          round(col("m.mo"), 9).as("mean_on_nonedges"),
          round(col("m.me") / col("m.mo"), 6).as("separation_lift"))
        .orderBy(col("metric"))
    },
    Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
        FROM lineitem),
      pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
          AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2),
      adj AS (SELECT part_a AS node, part_b AS nbr FROM pr
        UNION ALL SELECT part_b, part_a FROM pr),
      deg AS (SELECT node, count(*)::BIGINT AS deg FROM adj GROUP BY 1),
      adjw AS (SELECT a.node, a.nbr,
          CAST(round(1e12 / deg) AS BIGINT) AS ra_pico
        FROM adj a JOIN deg d ON a.node = d.node
        WHERE deg BETWEEN 2 AND 64),
      cand AS (SELECT a.nbr AS cand_a, b.nbr AS cand_b,
          count(*)::BIGINT AS cn, sum(a.ra_pico)::BIGINT AS ra
        FROM adjw a JOIN adjw b ON a.node = b.node AND a.nbr < b.nbr
        GROUP BY 1, 2),
      lab AS (SELECT
          CASE WHEN pr.part_a IS NULL THEN 0 ELSE 1 END::BIGINT AS lbl,
          cn,
          CAST(round(cn::DOUBLE
            / (da.deg + db.deg - cn) * 1e6) AS BIGINT) AS jac_micro,
          ra
        FROM cand c
        JOIN deg da ON da.node = c.cand_a
        JOIN deg db ON db.node = c.cand_b
        LEFT JOIN pr ON pr.part_a = c.cand_a AND pr.part_b = c.cand_b),
      agg AS (SELECT lbl, count(*)::BIGINT AS n, sum(cn)::BIGINT AS s_cn,
          sum(jac_micro)::BIGINT AS s_jac, sum(ra::HUGEINT) AS s_ra
        FROM lab GROUP BY 1),
      e AS (SELECT n AS ne, s_cn AS cn_e, s_jac AS jac_e, s_ra AS ra_e
        FROM agg WHERE lbl = 1),
      o AS (SELECT n AS no, s_cn AS cn_o, s_jac AS jac_o, s_ra AS ra_o
        FROM agg WHERE lbl = 0),
      rows3 AS (
        SELECT 'common_neighbors' AS metric, ne, no,
          cn_e::DOUBLE / ne::DOUBLE AS me,
          cn_o::DOUBLE / no::DOUBLE AS mo FROM e, o
        UNION ALL SELECT 'jaccard', ne, no,
          jac_e::DOUBLE / 1e6 / ne::DOUBLE,
          jac_o::DOUBLE / 1e6 / no::DOUBLE FROM e, o
        UNION ALL SELECT 'resource_allocation', ne, no,
          ra_e::DOUBLE / 1e12 / ne::DOUBLE,
          ra_o::DOUBLE / 1e12 / no::DOUBLE FROM e, o)
      SELECT metric, ne AS n_edge_pairs, no AS n_nonedge_pairs,
        round(me, 9) AS mean_on_edges, round(mo, 9) AS mean_on_nonedges,
        round(me / mo, 6) AS separation_lift
      FROM rows3 ORDER BY metric"""))

  // ---------- q430: random-failure robustness curve ---------------------

  /** Random-failure robustness of the co-purchase graph at 10/30/50 %
    * node removal — the RANDOM counterpart of q340's targeted hub
    * attack, and together the classic resilience contrast (scale-free
    * graphs shrug off random failure but collapse under targeted
    * attack; measuring ONE side tells you nothing). Removal is a pure
    * hash of the node id (deterministic, engine-portable, no RNG), so
    * each removal fraction is a PROJECTION over the edge list: an
    * edge survives iff both endpoint hashes clear the threshold, so
    * the whole 3-threshold grid folds into CONDITIONAL SUMS — one
    * un-fanned edge pass (global agg, no key) for survival, one
    * 2|E|-row adjacency aggregate carrying the three
    * surviving-neighbor counts side by side, and the threshold fan
    * happens only on the 1-row summary. No 3× explode of the edge
    * list (the round-11 shape shuffled 6|E| rows; this one shuffles
    * 2|E| once), 3-row output.
    */
  private val q430 = QueryDef(
    "q430_random_robustness",
    (s, dir) => {
      val pairs = Analytics.copurchasePairs(s, dir)
        .select(col("part_a"), col("part_b"))
      val ha = Portable.h32Spark("concat('rb_', part_a)")
      val hb = Portable.h32Spark("concat('rb_', part_b)")
      val ps = Seq(10L, 30L, 50L)
      // edge survival: 3 conditional sums over ONE un-fanned pair pass
      val edges = pairs
        .select(expr(s"$ha % 100").as("hash_a"),
          expr(s"$hb % 100").as("hash_b"))
        .agg(count(lit(1)).as("n_edges"),
          ps.map(p => sum((col("hash_a") >= p && col("hash_b") >= p)
            .cast("long")).as(s"ek_$p")): _*)
      // node stats: one adjacency groupBy with per-threshold
      // surviving-neighbor counts as parallel conditional sums
      val hnbr = Portable.h32Spark("concat('rb_', nbr)")
      val hme = Portable.h32Spark("concat('rb_', node)")
      val knCols = ps.map(p =>
        sum((col("h_nbr") >= p).cast("long")).as(s"kn_$p"))
      val nodes = Analytics.copurchaseAdj(s, dir)
        .select(col("node"), expr(s"$hnbr % 100").as("h_nbr"))
        .groupBy(col("node"))
        .agg(knCols.head, knCols.tail: _*)
        .select((expr(s"$hme % 100").as("h_me") +:
          ps.map(p => col(s"kn_$p"))): _*)
        .agg(count(lit(1)).as("n_nodes"),
          ps.flatMap(p => Seq(
            sum((col("h_me") >= p).cast("long")).as(s"kept_$p"),
            sum(when(col("h_me") >= p && col(s"kn_$p") === 0, 1L)
              .otherwise(0L)).as(s"iso_$p"))): _*)
      nodes.crossJoin(broadcast(edges))
        .select(col("n_nodes"), col("n_edges"),
          explode(array(ps.map(p => struct(lit(p).as("p_pct"),
            col(s"kept_$p").as("kept_n"), col(s"iso_$p").as("isolated"),
            col(s"ek_$p").as("edges_kept"))): _*)).as("r"))
        .select(col("r.p_pct").as("p_pct"), col("n_nodes"),
          col("r.kept_n").as("nodes_kept"),
          round(col("r.edges_kept").cast("double")
            / col("n_edges").cast("double"), 9).as("edge_survival"),
          round(col("r.isolated").cast("double")
            / col("r.kept_n").cast("double"), 9).as("isolated_share"))
        .orderBy(col("p_pct"))
    },
    Some(s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
        FROM lineitem),
      pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
          AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2),
      fan AS (SELECT p_pct, part_a, part_b,
          ${Portable.h32Duck("'rb_' || part_a")} % 100 >= p_pct AS keep_a,
          ${Portable.h32Duck("'rb_' || part_b")} % 100 >= p_pct AS keep_b
        FROM pr, (SELECT CAST(unnest([10, 30, 50]) AS BIGINT) AS p_pct)),
      ns AS (SELECT p_pct, node, max(keep_me::BIGINT) AS kept,
          count(*)::BIGINT AS deg, sum(keep_nbr::BIGINT)::BIGINT
            AS kept_nbrs
        FROM (
          SELECT p_pct, part_a AS node, keep_a AS keep_me,
            keep_b AS keep_nbr FROM fan
          UNION ALL
          SELECT p_pct, part_b, keep_b, keep_a FROM fan)
        GROUP BY 1, 2),
      ed AS (SELECT p_pct, count(*)::BIGINT AS n_edges,
          sum((keep_a AND keep_b)::BIGINT)::BIGINT AS edges_kept
        FROM fan GROUP BY 1),
      no AS (SELECT p_pct, count(*)::BIGINT AS n_nodes,
          sum(kept)::BIGINT AS kept_n,
          sum(CASE WHEN kept = 1 AND kept_nbrs = 0 THEN 1 ELSE 0 END)
            ::BIGINT AS isolated
        FROM ns GROUP BY 1)
      SELECT no.p_pct AS p_pct, n_nodes, kept_n AS nodes_kept,
        round(edges_kept::DOUBLE / n_edges::DOUBLE, 9) AS edge_survival,
        round(isolated::DOUBLE / kept_n::DOUBLE, 9) AS isolated_share
      FROM no JOIN ed ON ed.p_pct = no.p_pct
      ORDER BY no.p_pct"""))

  // ---------- q431: rank-biased overlap of rankers ----------------------

  /** Rank-biased overlap (p = 0.9, depth 20) between the brand
    * revenue ranking and the brand volume ranking — the top-weighted
    * ranker-agreement read q190's set overlap flattens: RBO weights
    * agreement at depth d by p^(d−1)/d, so disagreement about the
    * head costs far more than about the tail, matching how ranked
    * lists are consumed. Both rankings live on the BOUNDED brand
    * table (windows over ≤|brands| rows after one grouped pass over
    * lineitem), the per-depth intersection size folds from the joint
    * rank pair via the explode grid (d = 1..20), and the truncated
    * RBO sum is micro-pinned over ≤20 rows. Reports RBO_min (the
    * truncated lower bound — documented) plus head-agreement at
    * depths 5/10. 1-row output.
    */
  private val q431 = QueryDef(
    "q431_rank_biased_overlap",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val perBrand = Fixtures.table(s, dir, "lineitem")
        .join(broadcast(Fixtures.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(expr("CAST(round(l_extendedprice * 100.0) AS BIGINT)"))
            .as("rev_c"),
          sum(expr("CAST(l_quantity AS BIGINT)")).as("vol"))
      val ranked = perBrand
        .withColumn("r_rev", row_number().over(
          Window.orderBy(col("rev_c").desc, col("p_brand"))))
        .withColumn("r_vol", row_number().over(
          Window.orderBy(col("vol").desc, col("p_brand"))))
      val fan = ranked.select(col("r_rev"), col("r_vol"),
        explode(array((1 to 20).map(d => lit(d.toLong)): _*)).as("d"))
      val depth = fan.groupBy(col("d"))
        .agg(sum(when(col("r_rev") <= col("d")
          && col("r_vol") <= col("d"), 1L).otherwise(0L)).as("overlap"))
      val rbo = depth.agg(
        sum(expr("""CAST(round(pow(0.9, d - 1.0)
          * CAST(overlap AS DOUBLE) / d * 1e9) AS BIGINT)"""))
          .as("w_nano"),
        sum(when(col("d") === 5, col("overlap"))).as("o5"),
        sum(when(col("d") === 10, col("overlap"))).as("o10"))
      rbo.select(
        round(col("w_nano").cast("double") / 1e9 * (1.0 - 0.9), 9)
          .as("rbo_min"),
        round(col("o5").cast("double") / 5.0, 9).as("agreement_at_5"),
        round(col("o10").cast("double") / 10.0, 9).as("agreement_at_10"))
    },
    Some("""WITH pb AS (SELECT p_brand,
          sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))::BIGINT
            AS rev_c,
          sum(CAST(l_quantity AS BIGINT))::BIGINT AS vol
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY 1),
      ranked AS (SELECT
          row_number() OVER (ORDER BY rev_c DESC, p_brand) AS r_rev,
          row_number() OVER (ORDER BY vol DESC, p_brand) AS r_vol
        FROM pb),
      fan AS (SELECT r_rev, r_vol,
          CAST(unnest([1,2,3,4,5,6,7,8,9,10,
            11,12,13,14,15,16,17,18,19,20]) AS BIGINT) AS d
        FROM ranked),
      depth AS (SELECT d,
          sum(CASE WHEN r_rev <= d AND r_vol <= d THEN 1 ELSE 0 END)
            ::BIGINT AS overlap
        FROM fan GROUP BY 1),
      rbo AS (SELECT
          sum(CAST(round(pow(0.9, d - 1.0) * overlap::DOUBLE / d * 1e9)
            AS BIGINT))::BIGINT AS w_nano,
          sum(CASE WHEN d = 5 THEN overlap END)::BIGINT AS o5,
          sum(CASE WHEN d = 10 THEN overlap END)::BIGINT AS o10
        FROM depth)
      SELECT round(w_nano::DOUBLE / 1e9 * (1.0 - 0.9), 9) AS rbo_min,
        round(o5::DOUBLE / 5.0, 9) AS agreement_at_5,
        round(o10::DOUBLE / 10.0, 9) AS agreement_at_10
      FROM rbo"""))

  // ---------- q432: sequence-budget planner -----------------------------

  /** Truncation / padding / packing waste across context budgets L ∈
    * {64, 128, 256} whitespace tokens — the PLANNING curve in front
    * of q64 (which packs at ONE length) and q121 (which audits the
    * chosen packing): for each candidate budget, what fraction of
    * corpus tokens a hard truncation throws away, what fraction of
    * slots one-doc-per-row padding burns, how many docs overflow at
    * all, and the ideal greedy bin count — the four numbers that pick
    * L before any packing job runs. Shape: one scan reduces each doc
    * to its token count, the count fans across the 3-budget grid
    * in-projection, and every output is a ratio of exact integer
    * sums. 3-row output at any corpus size.
    */
  private val q432 = QueryDef(
    "q432_seq_budget_planner",
    (s, dir) => {
      val toks = Fixtures.table(s, dir, "documents")
        .select(size(split(col("text"), " ")).cast("long").as("t"))
      toks.select(col("t"),
          explode(array(lit(64L), lit(128L), lit(256L))).as("budget"))
        .groupBy(col("budget"))
        .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("tot"),
          sum(least(col("t"), col("budget"))).as("kept"),
          sum(when(col("t") > col("budget"), 1L).otherwise(0L))
            .as("n_over"))
        .select(col("budget"), col("n_docs"),
          round(lit(1.0) - col("kept").cast("double")
            / col("tot").cast("double"), 9).as("truncation_loss"),
          round(lit(1.0) - col("kept").cast("double")
            / (col("n_docs").cast("double")
              * col("budget").cast("double")), 9).as("padding_waste"),
          round(col("n_over").cast("double")
            / col("n_docs").cast("double"), 9).as("share_over_budget"),
          expr("CAST(ceil(CAST(kept AS DOUBLE) / budget) AS BIGINT)")
            .as("ideal_packed_rows"))
        .orderBy(col("budget"))
    },
    Some("""WITH toks AS (SELECT len(string_split(text, ' '))::BIGINT
          AS t
        FROM documents),
      fan AS (SELECT t, CAST(unnest([64, 128, 256]) AS BIGINT)
          AS budget FROM toks),
      agg AS (SELECT budget, count(*)::BIGINT AS n_docs,
          sum(t)::BIGINT AS tot,
          sum(least(t, budget))::BIGINT AS kept,
          sum(CASE WHEN t > budget THEN 1 ELSE 0 END)::BIGINT AS n_over
        FROM fan GROUP BY 1)
      SELECT budget, n_docs,
        round(1.0 - kept::DOUBLE / tot::DOUBLE, 9) AS truncation_loss,
        round(1.0 - kept::DOUBLE / (n_docs::DOUBLE * budget::DOUBLE), 9)
          AS padding_waste,
        round(n_over::DOUBLE / n_docs::DOUBLE, 9) AS share_over_budget,
        CAST(ceil(kept::DOUBLE / budget) AS BIGINT)
          AS ideal_packed_rows
      FROM agg ORDER BY budget"""))

  // ---------- q433: n-gram coverage budget ------------------------------

  /** Storage budget for a 3-gram table at 50/90/99 % occurrence
    * coverage — the SIZING number behind every n-gram LM / shingle
    * index decision (q119 surprisal, q279 Kneser–Ney, q44
    * contamination all keep such a table): keeping the most frequent
    * grams first, how many distinct grams buy each coverage level?
    * The scale trick is that the answer needs NO corpus-sized
    * ranking: group grams into count classes (count → #grams),
    * a table bounded by the distinct-frequency spectrum (q157's
    * object), then walk the classes from the most frequent down with
    * a cumulative window — coverage jumps only at class boundaries.
    * One tokenize+count pass (the only corpus work), one bounded
    * histogram, one bounded window. 3-row output (one per coverage
    * level, with the count-class threshold that crossed it).
    */
  private val q433 = QueryDef(
    "q433_ngram_coverage_budget",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val grams = Fixtures.table(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(explode(expr(
          """transform(slice(w, 1, greatest(size(w) - 2, 0)),
               (x, i) -> concat(x, ' ', w[i + 1], ' ', w[i + 2]))"""))
          .as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("c"))
      val classes = grams.groupBy(col("c")).agg(count(lit(1)).as("m"))
      val tot = classes.agg(
        sum(col("c").cast(DecimalType(38, 0)) * col("m")).as("occ"),
        sum(col("m")).as("n_grams"))
      val w = Window.orderBy(col("c").desc)
      val cum = classes.crossJoin(broadcast(tot))
        .withColumn("cum_occ", sum(col("c").cast(DecimalType(38, 0))
          * col("m")).over(w))
        .withColumn("cum_grams", sum(col("m")).over(w))
      val fan = cum.select(col("c"), col("m"), col("occ"),
          col("n_grams"), col("cum_occ"), col("cum_grams"),
          explode(array(lit(50L), lit(90L), lit(99L))).as("pct"))
        .where(col("cum_occ").cast("double") * 100.0
          >= col("pct").cast("double") * col("occ").cast("double"))
      fan.groupBy(col("pct"))
        .agg(max(col("n_grams")).as("n_grams_total"),
          min(col("cum_grams")).as("grams_needed"),
          max(col("c")).as("count_threshold"))
        .select(col("pct").as("coverage_pct"), col("n_grams_total"),
          col("grams_needed"), col("count_threshold"),
          round(col("grams_needed").cast("double")
            / col("n_grams_total").cast("double"), 9)
            .as("vocab_share"))
        .orderBy(col("coverage_pct"))
    },
    Some("""WITH grams AS (SELECT g, count(*)::BIGINT AS c FROM (
          SELECT unnest(list_transform(
            list_slice(string_split(text, ' '), 1,
              greatest(len(string_split(text, ' ')) - 2, 0)),
            (x, i) -> x || ' ' || string_split(text, ' ')[i + 1]
              || ' ' || string_split(text, ' ')[i + 2])) AS g
          FROM documents) GROUP BY 1),
      classes AS (SELECT c, count(*)::BIGINT AS m FROM grams
        GROUP BY 1),
      tot AS (SELECT sum(c::HUGEINT * m) AS occ, sum(m)::BIGINT
          AS n_grams FROM classes),
      cum AS (SELECT c, m, occ, n_grams,
          sum(c::HUGEINT * m) OVER (ORDER BY c DESC) AS cum_occ,
          sum(m) OVER (ORDER BY c DESC)::BIGINT AS cum_grams
        FROM classes, tot),
      fan AS (SELECT *, CAST(unnest([50, 90, 99]) AS BIGINT) AS pct
        FROM cum),
      hit AS (SELECT * FROM fan
        WHERE cum_occ::DOUBLE * 100.0 >= pct::DOUBLE * occ::DOUBLE)
      SELECT pct AS coverage_pct, max(n_grams) AS n_grams_total,
        min(cum_grams) AS grams_needed, max(c) AS count_threshold,
        round(min(cum_grams)::DOUBLE / max(n_grams)::DOUBLE, 9)
          AS vocab_share
      FROM hit GROUP BY 1 ORDER BY coverage_pct"""))

  // ---------- q434: embedding hubness audit -----------------------------

  /** Hubness audit of the embedding space — the k-NN pathology check
    * the ANN family (q22/q34/q127) implicitly depends on: in high
    * dimensions a few "hub" vectors crowd into everyone's top-k while
    * "antihubs" appear in nobody's, silently degrading retrieval
    * diversity and recall; the in-degree distribution of the k-NN
    * digraph (k = 5) is the standard diagnostic (Radovanović et al.
    * 2010). Shape: neighbor lists are computed INSIDE hash-quarter
    * sub-cells of the label cells ((label, h32(vec_id)%4) — the q34
    * IVF partitions refined by a deterministic random quarter), so
    * candidate pairs are Σ|cell|²/4 at EVERY scale instead of the
    * raw Σ|cell|² that round-11's sf1 canary measured at 40 s (the
    * q377 class: quadratic in cell size at fixed cell count;
    * production sizes cells ∝ corpus). The sub-sampled k-NN graph is
    * the standard hubness surrogate — each anchor still takes k = 5
    * neighbors, so E[in-degree] = k is preserved and the hub/antihub
    * thresholds keep their meaning. In-degrees by one counting pass
    * over the ≤ n·k top-k edges; per-label output (10 rows), all
    * counts exact integers.
    */
  private val q434 = QueryDef(
    "q434_hubness_audit",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Fixtures.table(s, dir, "embeddings")
      val a = e.select(col("label"),
        expr(s"${Portable.h32Spark("concat('hub_', vec_id)")} % 4")
          .as("sub"),
        col("vec_id").as("a"), col("embedding").as("ea"))
      val b = e.select(col("label"),
        expr(s"${Portable.h32Spark("concat('hub_', vec_id)")} % 4")
          .as("sub"),
        col("vec_id").as("b"), col("embedding").as("eb"))
      val wTop = Window.partitionBy(col("a"))
        .orderBy(col("cos").desc, col("b"))
      val topk = a.join(b, Seq("label", "sub"))
        .where(col("a") =!= col("b"))
        .select(col("label"), col("a"), col("b"),
          expr("graft_cosine(ea, eb)").as("cos"))
        .withColumn("rn", row_number().over(wTop))
        .where(col("rn") <= 5)
      val indeg = topk.groupBy(col("label"), col("b"))
        .agg(count(lit(1)).as("indeg"))
      val nodes = e.select(col("label"), col("vec_id").as("b"))
        .join(indeg, Seq("label", "b"), "left_outer")
        .select(col("label"), coalesce(col("indeg"), lit(0L))
          .as("indeg"))
      nodes.groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("indeg") === 0, 1L).otherwise(0L))
            .as("n_antihubs"),
          sum(when(col("indeg") >= 10, 1L).otherwise(0L)).as("n_hubs"),
          max(col("indeg")).as("max_indegree"))
        .select(col("label"), col("n_vecs"),
          round(col("n_antihubs").cast("double")
            / col("n_vecs").cast("double"), 9).as("antihub_share"),
          round(col("n_hubs").cast("double")
            / col("n_vecs").cast("double"), 9).as("hub_share"),
          col("max_indegree"))
        .orderBy(col("label"))
    },
    Some(s"""WITH pairs AS (SELECT a.label, a.vec_id AS a,
          b.vec_id AS b,
          ${Dedup.cosDuck("a.embedding", "b.embedding")} AS cos
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label
          AND ${Portable.h32Duck("'hub_' || a.vec_id")} % 4
            = ${Portable.h32Duck("'hub_' || b.vec_id")} % 4
          AND a.vec_id <> b.vec_id),
      topk AS (SELECT label, a, b FROM (
          SELECT label, a, b,
            row_number() OVER (PARTITION BY a
              ORDER BY cos DESC, b) AS rn
          FROM pairs) WHERE rn <= 5),
      indeg AS (SELECT label, b, count(*)::BIGINT AS indeg
        FROM topk GROUP BY 1, 2),
      nodes AS (SELECT e.label, coalesce(indeg, 0)::BIGINT AS indeg
        FROM embeddings e LEFT JOIN indeg
          ON indeg.label = e.label AND indeg.b = e.vec_id)
      SELECT label, count(*)::BIGINT AS n_vecs,
        round(sum(CASE WHEN indeg = 0 THEN 1 ELSE 0 END)::DOUBLE
          / count(*)::DOUBLE, 9) AS antihub_share,
        round(sum(CASE WHEN indeg >= 10 THEN 1 ELSE 0 END)::DOUBLE
          / count(*)::DOUBLE, 9) AS hub_share,
        max(indeg) AS max_indegree
      FROM nodes GROUP BY 1 ORDER BY label"""))

  // ---------- q435: Kaplan–Meier with censoring -------------------------

  /** Kaplan–Meier survival of user activity lifetimes WITH right
    * censoring — the estimator q159's raw retention curve
    * approximates badly near the observation edge: a user whose last
    * event falls in the final 7 days of the corpus hasn't churned,
    * we just stopped watching, and counting them as deaths biases
    * the tail down; KM removes censored users from the death count
    * while keeping them in the risk set until their censor time.
    * S(t) = Π(1 − d_u/n_u) over event times u ≤ t, computed as
    * exp(Σ ln(1−d/n)) with each ln term nano-pinned so the
    * cumulative product is exact and order-free. Shape: one per-user
    * reduce (first/last event), a duration-day table BOUNDED by the
    * calendar (q159 class) carrying deaths/censors per day, a
    * cumulative window over that bounded table, and a 3-row probe at
    * t ∈ {7, 14, 30} days.
    */
  private val q435 = QueryDef(
    "q435_kaplan_meier",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val users = ev(s, dir).groupBy(col("user_id"))
        .agg(min(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000"))
            .as("d0"),
          max(expr("timestampdiff(MICROSECOND, " +
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000"))
            .as("d1"))
      val maxd = users.agg(max(col("d1")).as("dmax"))
      val lt = users.crossJoin(broadcast(maxd))
        .select((col("d1") - col("d0")).as("t"),
          (col("d1") > col("dmax") - 7).cast("long").as("censored"))
      val tot = lt.agg(count(lit(1)).as("n_users"))
      val byT = lt.groupBy(col("t"))
        .agg(sum(lit(1L) - col("censored")).as("d"),
          count(lit(1)).as("ending"))
      val w = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val km = byT.crossJoin(broadcast(tot))
        .withColumn("ended_before",
          coalesce(sum(col("ending")).over(w), lit(0L)))
        .withColumn("n_risk", col("n_users") - col("ended_before"))
        .withColumn("ln_nano", expr("""CASE WHEN d > 0 AND n_risk > d
          THEN CAST(round(ln(1.0 - CAST(d AS DOUBLE) / n_risk) * 1e9)
            AS BIGINT)
          WHEN d > 0 THEN -9000000000000 ELSE 0 END"""))
        .withColumn("cum_ln", sum(col("ln_nano")).over(
          Window.orderBy(col("t"))
            .rowsBetween(Window.unboundedPreceding, 0)))
      val probes = km.select(col("t"), col("n_risk"), col("d"),
          col("cum_ln"),
          explode(array(lit(7L), lit(14L), lit(30L))).as("horizon"))
        .where(col("t") <= col("horizon"))
      val perH = probes.groupBy(col("horizon"))
        .agg(max(col("t")).as("last_event_day"),
          min(col("n_risk")).as("n_risk_at_h"),
          sum(col("d")).as("deaths_to_h"),
          min(col("cum_ln")).as("cum"))
      // emit EVERY horizon even when no lifetime ends at or before it
      // (S = 1, full risk set) — the observation window can be shorter
      // than the probe grid
      tot.select(col("n_users"),
          explode(array(lit(7L), lit(14L), lit(30L))).as("horizon"))
        .join(broadcast(perH), Seq("horizon"), "left_outer")
        .select(col("horizon"),
          coalesce(col("last_event_day"), lit(-1L)).as("last_event_day"),
          coalesce(col("n_risk_at_h"), col("n_users")).as("n_risk_at_h"),
          coalesce(col("deaths_to_h"), lit(0L)).as("deaths_to_h"),
          round(exp(coalesce(col("cum"), lit(0L)).cast("double") / 1e9),
            9).as("km_survival"))
        .orderBy(col("horizon"))
    },
    Some("""WITH users AS (SELECT user_id,
          min(epoch_us(ts) // 86400000000) AS d0,
          max(epoch_us(ts) // 86400000000) AS d1
        FROM events GROUP BY 1),
      maxd AS (SELECT max(d1) AS dmax FROM users),
      lt AS (SELECT d1 - d0 AS t,
          (d1 > dmax - 7)::BIGINT AS censored
        FROM users, maxd),
      tot AS (SELECT count(*)::BIGINT AS n_users FROM lt),
      byt AS (SELECT t, sum(1 - censored)::BIGINT AS d,
          count(*)::BIGINT AS ending
        FROM lt GROUP BY 1),
      km0 AS (SELECT t, d, ending, n_users,
          coalesce(sum(ending) OVER (ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS ended_before
        FROM byt, tot),
      km1 AS (SELECT t, d, n_users - ended_before AS n_risk FROM km0),
      km2 AS (SELECT t, d, n_risk,
          CASE WHEN d > 0 AND n_risk > d
            THEN CAST(round(ln(1.0 - d::DOUBLE / n_risk) * 1e9)
              AS BIGINT)
          WHEN d > 0 THEN -9000000000000 ELSE 0 END AS ln_nano
        FROM km1),
      km AS (SELECT t, d, n_risk,
          sum(ln_nano) OVER (ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
            AS cum_ln
        FROM km2),
      probes AS (SELECT t, n_risk, d, cum_ln,
          CAST(unnest([7, 14, 30]) AS BIGINT) AS horizon
        FROM km),
      hit AS (SELECT * FROM probes WHERE t <= horizon),
      perh AS (SELECT horizon, max(t) AS last_event_day,
          min(n_risk)::BIGINT AS n_risk_at_h,
          sum(d)::BIGINT AS deaths_to_h, min(cum_ln)::BIGINT AS cum
        FROM hit GROUP BY 1),
      hz AS (SELECT n_users,
          CAST(unnest([7, 14, 30]) AS BIGINT) AS horizon FROM tot)
      SELECT hz.horizon AS horizon,
        coalesce(last_event_day, -1) AS last_event_day,
        coalesce(n_risk_at_h, n_users) AS n_risk_at_h,
        coalesce(deaths_to_h, 0) AS deaths_to_h,
        round(exp(coalesce(cum, 0)::DOUBLE / 1e9), 9) AS km_survival
      FROM hz LEFT JOIN perh ON perh.horizon = hz.horizon
      ORDER BY hz.horizon"""))

  // ---------- q436: Cochran's Q repeated-measures test ------------------

  /** Cochran's Q across the three conversion-path event types (view,
    * click, purchase) with USERS AS BLOCKS — the within-subject
    * member of the proportion family: q346's McNemar compares two
    * correlated proportions, Cochran's Q generalizes to k ("do these
    * three actions have the same adoption rate AMONG THE SAME
    * users?"), which a naive per-type χ² gets wrong by ignoring that
    * the same users generate all three columns. "Adoption" is ≥ 15
    * events of the type (nearly every user has ≥ 1 of each in any
    * realistic window, which would degenerate Q to 0/0; the
    * heavy-use threshold is the behavioral read and keeps the
    * per-user rows varied). Q = k(k−1)·
    * Σ(C_j − T/k)² / (kT − ΣR_i²) with R_i the per-user hit count
    * and C_j the per-type totals — everything folds from ONE grouped
    * pass over events into three exact moments (T, ΣR², C_j), χ²(2)
    * via Wilson–Hilferty. 1-row output.
    */
  private val q436 = QueryDef(
    "q436_cochran_q",
    (s, dir) => {
      val per = ev(s, dir)
        .where(col("event_type").isin("view", "click", "purchase"))
        .groupBy(col("user_id"))
        .agg(
          when(sum(when(col("event_type") === "view", 1L)
            .otherwise(0L)) >= 15, 1L).otherwise(0L).as("v"),
          when(sum(when(col("event_type") === "click", 1L)
            .otherwise(0L)) >= 15, 1L).otherwise(0L).as("c"),
          when(sum(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)) >= 15, 1L).otherwise(0L).as("p"))
      val m = per.agg(count(lit(1)).as("n_users"),
        sum(col("v")).as("cv"), sum(col("c")).as("cc"),
        sum(col("p")).as("cp"),
        sum((col("v") + col("c") + col("p"))
          * (col("v") + col("c") + col("p"))).as("sr2"))
      // kT − ΣR² = ΣR(k−R) is zero when every user adopts all-or-nothing
      // (the saturated-density regime — at high corpus density all users
      // clear the threshold for all three types); Q is then undefined,
      // and the guard reports that verdict instead of dividing by zero
      m.select(col("n_users"), col("cv"), col("cc"), col("cp"),
          ((col("cv") + col("cc") + col("cp")).cast("double")).as("t"),
          col("sr2").cast("double").as("sr2d"))
        .select(col("n_users"), col("cv").as("n_view"),
          col("cc").as("n_click"), col("cp").as("n_purchase"),
          round(expr("""CASE WHEN 3.0 * t - sr2d <= 0.0 THEN 0.0
            ELSE 3.0 * 2.0 * ((cv - t / 3.0) * (cv - t / 3.0)
            + (cc - t / 3.0) * (cc - t / 3.0)
            + (cp - t / 3.0) * (cp - t / 3.0))
            / (3.0 * t - sr2d) END"""), 6).as("q_stat"),
          round(expr("CASE WHEN 3.0 * t - sr2d <= 0.0 THEN 1.0 ELSE "
            + Portable.chi2UpperP(
            """(3.0 * 2.0 * ((cv - t / 3.0) * (cv - t / 3.0)
              + (cc - t / 3.0) * (cc - t / 3.0)
              + (cp - t / 3.0) * (cp - t / 3.0)) / (3.0 * t - sr2d))""",
            "2.0") + " END"), 9).as("p_value"),
          expr("""CASE WHEN 3.0 * t - sr2d <= 0.0
              THEN 'no_within_user_variation' ELSE '' END""")
            .as("vflag"))
        .withColumn("verdict", when(col("vflag") =!= "", col("vflag"))
          .otherwise(when(col("p_value") < 0.01, "adoption_differs")
            .otherwise("uniform_adoption")))
        .drop("vflag")
    },
    Some(s"""WITH per AS (SELECT user_id,
          (sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            >= 15)::BIGINT AS v,
          (sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
            >= 15)::BIGINT AS c,
          (sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            >= 15)::BIGINT AS p
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
        GROUP BY 1),
      m AS (SELECT count(*)::BIGINT AS n_users, sum(v)::BIGINT AS cv,
          sum(c)::BIGINT AS cc, sum(p)::BIGINT AS cp,
          sum((v + c + p) * (v + c + p))::BIGINT AS sr2
        FROM per),
      st AS (SELECT n_users, cv, cc, cp,
          (cv + cc + cp)::DOUBLE AS t, sr2::DOUBLE AS sr2d FROM m)
      SELECT n_users, cv AS n_view, cc AS n_click, cp AS n_purchase,
        round(CASE WHEN 3.0 * t - sr2d <= 0.0 THEN 0.0
          ELSE 3.0 * 2.0 * ((cv - t / 3.0) * (cv - t / 3.0)
          + (cc - t / 3.0) * (cc - t / 3.0)
          + (cp - t / 3.0) * (cp - t / 3.0)) / (3.0 * t - sr2d) END, 6)
          AS q_stat,
        round(CASE WHEN 3.0 * t - sr2d <= 0.0 THEN 1.0
          ELSE ${Portable.chi2UpperP(
          """(3.0 * 2.0 * ((cv - t / 3.0) * (cv - t / 3.0)
            + (cc - t / 3.0) * (cc - t / 3.0)
            + (cp - t / 3.0) * (cp - t / 3.0)) / (3.0 * t - sr2d))""",
          "2.0")} END, 9) AS p_value,
        CASE WHEN 3.0 * t - sr2d <= 0.0 THEN 'no_within_user_variation'
          WHEN round(CASE WHEN 3.0 * t - sr2d <= 0.0 THEN 1.0
            ELSE ${Portable.chi2UpperP(
          """(3.0 * 2.0 * ((cv - t / 3.0) * (cv - t / 3.0)
            + (cc - t / 3.0) * (cc - t / 3.0)
            + (cp - t / 3.0) * (cp - t / 3.0)) / (3.0 * t - sr2d))""",
          "2.0")} END, 9) < 0.01
          THEN 'adoption_differs' ELSE 'uniform_adoption' END AS verdict
      FROM st"""))

  // ---------- q437: mixture temperature curve ---------------------------

  /** Temperature-reweighted source-mixing curve — the knob every
    * multilingual / multi-domain training run turns (sampling weight
    * ∝ share^τ, τ < 1 upsampling the tail): for τ ∈ {0.3, 0.7, 1.0},
    * report the reweighted mixture's entropy, effective source count
    * exp(H), head share, and the largest single upsampling factor —
    * the four numbers that show what a temperature buys and what it
    * costs (duplication pressure on the smallest source). Next to
    * q116 (fitting weights to a target) and q249 (DoReMi's
    * loss-driven reweighting), this is the simple power-law family
    * those methods are compared against. One grouped token-count
    * pass; ALL curve math on the bounded |sources| × 3 grid,
    * share^τ micro-pinned before the bounded sums. 3-row output.
    */
  private val q437 = QueryDef(
    "q437_mixture_temperature",
    (s, dir) => {
      val src = Fixtures.table(s, dir, "documents")
        .groupBy(col("source"))
        .agg(sum(size(split(col("text"), " ")).cast("long"))
          .as("toks"))
      val tot = src.agg(sum(col("toks")).as("t_all"),
        count(lit(1)).as("n_src"))
      val fan = src.crossJoin(broadcast(tot))
        .select(col("source"), col("toks"), col("t_all"), col("n_src"),
          explode(array(lit(0.3), lit(0.7), lit(1.0))).as("tau"))
        .select(col("source"), col("tau"), col("toks"), col("t_all"),
          col("n_src"),
          expr("""CAST(round(pow(CAST(toks AS DOUBLE) / t_all, tau)
            * 1e9) AS BIGINT)""").as("pw_nano"))
      val norm = fan.groupBy(col("tau"))
        .agg(max(col("n_src")).as("n_sources"),
          sum(col("pw_nano")).as("z_nano"))
      val probs = fan.join(broadcast(norm), "tau")
        .select(col("tau"), col("n_sources"),
          (col("pw_nano").cast("double")
            / col("z_nano").cast("double")).as("w"),
          (col("toks").cast("double") / col("t_all").cast("double"))
            .as("p"))
      probs.groupBy(col("tau"))
        .agg(max(col("n_sources")).as("n_sources"),
          sum(expr("CAST(round(CASE WHEN w > 0.0 THEN -w * ln(w) " +
            "ELSE 0.0 END * 1e9) AS BIGINT)")).as("h_nano"),
          max(col("w")).as("max_share"),
          max(expr("w / p")).as("max_upsample"))
        .select(col("tau"), col("n_sources"),
          round(col("h_nano").cast("double") / 1e9, 9)
            .as("mixture_entropy"),
          round(exp(col("h_nano").cast("double") / 1e9), 6)
            .as("effective_sources"),
          round(col("max_share"), 9).as("max_source_share"),
          round(col("max_upsample"), 6).as("max_upsample_factor"))
        .orderBy(col("tau"))
    },
    Some("""WITH src AS (SELECT source,
          sum(len(string_split(text, ' ')))::BIGINT AS toks
        FROM documents GROUP BY 1),
      tot AS (SELECT sum(toks)::BIGINT AS t_all, count(*)::BIGINT
          AS n_src FROM src),
      fan AS (SELECT source, CAST(unnest([0.3, 0.7, 1.0]) AS DOUBLE)
          AS tau, toks, t_all, n_src
        FROM src, tot),
      fan2 AS (SELECT source, tau, toks, t_all, n_src,
          CAST(round(pow(toks::DOUBLE / t_all, tau) * 1e9) AS BIGINT)
            AS pw_nano
        FROM fan),
      norm AS (SELECT tau, max(n_src) AS n_sources,
          sum(pw_nano)::BIGINT AS z_nano
        FROM fan2 GROUP BY 1),
      probs AS (SELECT f.tau, n_sources,
          pw_nano::DOUBLE / z_nano::DOUBLE AS w,
          toks::DOUBLE / t_all::DOUBLE AS p
        FROM fan2 f JOIN norm ON norm.tau = f.tau)
      SELECT tau, max(n_sources) AS n_sources,
        round(sum(CAST(round(CASE WHEN w > 0.0 THEN -w * ln(w)
          ELSE 0.0 END * 1e9) AS BIGINT))::DOUBLE / 1e9, 9)
          AS mixture_entropy,
        round(exp(sum(CAST(round(CASE WHEN w > 0.0 THEN -w * ln(w)
          ELSE 0.0 END * 1e9) AS BIGINT))::DOUBLE / 1e9), 6)
          AS effective_sources,
        round(max(w), 9) AS max_source_share,
        round(max(w / p), 6) AS max_upsample_factor
      FROM probs GROUP BY 1 ORDER BY tau"""))

  // ---------- q438: demand-pattern quadrants ----------------------------

  /** Syntetos–Boylan demand-pattern classification of parts into
    * smooth / intermittent / erratic / lumpy — the routing decision
    * in front of every demand forecaster (q164/q356 assume a
    * forecastable series; intermittent and lumpy parts need
    * Croston-class methods instead, and the 1.32 / 0.49 cutoffs are
    * the published boundaries): per part, ADI = months-with-demand⁻¹
    * × observed months and CV² of the nonzero monthly quantities,
    * both from exact per-(part, month) integer sums; the quadrant
    * fold is a projection and the output is the 4-row quadrant
    * census with demand share. Per-part state is a fixed moment
    * vector — one grouped pass over lineitem joined to order dates,
    * one bounded reduce. The months span is the CORPUS calendar
    * (bounded), so ADI is well-defined at any scale.
    */
  private val q438 = QueryDef(
    "q438_demand_quadrants",
    (s, dir) => {
      val li = Fixtures.table(s, dir, "lineitem")
        .join(Fixtures.table(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_partkey"),
          expr("year(o_orderdate) * 12 + month(o_orderdate)")
            .as("mon"), expr("CAST(l_quantity AS BIGINT)").as("q"))
      val span = li.agg((max(col("mon")) - min(col("mon")) + 1)
        .as("n_months"))
      val pm = li.groupBy(col("l_partkey"), col("mon"))
        .agg(sum(col("q")).as("mq"))
      val per = pm.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("nz"), sum(col("mq")).as("sq"),
          sum((col("mq") * col("mq")).cast(DecimalType(38, 0)))
            .as("sqq"))
      val cls = per.crossJoin(broadcast(span))
        .select(col("l_partkey"), col("sq"),
          (col("n_months").cast("double") / col("nz").cast("double"))
            .as("adi"),
          expr("""CASE WHEN nz > 1 THEN
              ((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq / nz)
                / (nz - 1.0))
              / ((CAST(sq AS DOUBLE) / nz) * (CAST(sq AS DOUBLE) / nz))
            ELSE 0.0 END""").as("cv2"))
        .select(col("l_partkey"), col("sq"),
          when(col("adi") < 1.32 && col("cv2") < 0.49, "smooth")
            .when(col("adi") >= 1.32 && col("cv2") < 0.49,
              "intermittent")
            .when(col("adi") < 1.32, "erratic")
            .otherwise("lumpy").as("quadrant"))
      val tot = cls.agg(count(lit(1)).as("np"), sum(col("sq"))
        .as("qall"))
      cls.groupBy(col("quadrant"))
        .agg(count(lit(1)).as("n_parts"), sum(col("sq")).as("qsum"))
        .crossJoin(broadcast(tot))
        .select(col("quadrant"), col("n_parts"),
          round(col("n_parts").cast("double") / col("np").cast("double"),
            9).as("part_share"),
          round(col("qsum").cast("double") / col("qall").cast("double"),
            9).as("demand_share"))
        .orderBy(col("quadrant"))
    },
    Some("""WITH li AS (SELECT l_partkey,
          year(o_orderdate) * 12 + month(o_orderdate) AS mon,
          CAST(l_quantity AS BIGINT) AS q
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      span AS (SELECT max(mon) - min(mon) + 1 AS n_months FROM li),
      pm AS (SELECT l_partkey, mon, sum(q)::BIGINT AS mq
        FROM li GROUP BY 1, 2),
      per AS (SELECT l_partkey, count(*)::BIGINT AS nz,
          sum(mq)::BIGINT AS sq, sum(mq::HUGEINT * mq) AS sqq
        FROM pm GROUP BY 1),
      cls AS (SELECT l_partkey, sq,
          CASE
            WHEN n_months::DOUBLE / nz < 1.32 AND (CASE WHEN nz > 1
              THEN ((sqq::DOUBLE - sq::DOUBLE * sq / nz) / (nz - 1.0))
                / ((sq::DOUBLE / nz) * (sq::DOUBLE / nz)) ELSE 0.0 END)
              < 0.49 THEN 'smooth'
            WHEN n_months::DOUBLE / nz >= 1.32 AND (CASE WHEN nz > 1
              THEN ((sqq::DOUBLE - sq::DOUBLE * sq / nz) / (nz - 1.0))
                / ((sq::DOUBLE / nz) * (sq::DOUBLE / nz)) ELSE 0.0 END)
              < 0.49 THEN 'intermittent'
            WHEN n_months::DOUBLE / nz < 1.32 THEN 'erratic'
            ELSE 'lumpy' END AS quadrant
        FROM per, span),
      tot AS (SELECT count(*)::BIGINT AS np, sum(sq)::BIGINT AS qall
        FROM cls)
      SELECT quadrant, count(*)::BIGINT AS n_parts,
        round(count(*)::DOUBLE / max(np)::DOUBLE, 9) AS part_share,
        round(sum(sq)::DOUBLE / max(qall)::DOUBLE, 9) AS demand_share
      FROM cls, tot GROUP BY 1 ORDER BY quadrant"""))

  // ---------- q439: clustering null-model audit -------------------------

  /** Observed co-purchase clustering against the configuration-model
    * expectation — the SIGNIFICANCE read q373's raw clustering
    * deciles cannot give: any graph with hubs shows some triangle
    * closure by accident, and the degree-preserving null expectation
    * E[C] ≈ (⟨k²⟩−⟨k⟩)² / (N·⟨k⟩³) (Newman) is closed-form from the
    * degree moments alone, so "C / E[C]" says whether co-purchase
    * communities are real structure or a degree artifact. Observed C
    * = 3·triangles / wedges over the df-capped adjacency (centers
    * > 64 partners excluded from BOTH counts — the q294 cap, stated
    * in both dialects so numerator and denominator see the same
    * graph). Triangles close candidate wedges via one equi-join of
    * the wedge ends against the edge list; wedges are Σ C(deg,2).
    * One edge pass + one capped wedge join + a 1-row reduce.
    */
  private val q439 = QueryDef(
    "q439_clustering_null_model",
    (s, dir) => {
      val pairs = Analytics.copurchasePairs(s, dir)
        .select(col("part_a"), col("part_b"))
      val deg = Analytics.copurchaseDegrees(s, dir)
      val degm = deg.agg(count(lit(1)).as("n_nodes"),
        sum(col("deg")).as("sk"),
        sum((col("deg") * col("deg")).cast(DecimalType(38, 0)))
          .as("sk2"))
      val adjC = Analytics.copurchaseAdjDeg(s, dir)
        .where(col("deg") <= 64)
        .select(col("node"), col("nbr"))
      val wa = adjC.select(col("node"), col("nbr").as("end_a"))
      val wb = adjC.select(col("node"), col("nbr").as("end_b"))
      val wedges = wa.join(wb, Seq("node"))
        .where(col("end_a") < col("end_b"))
      val closed = wedges.join(pairs,
          wedges("end_a") === pairs("part_a")
            && wedges("end_b") === pairs("part_b"), "left_semi")
        .agg(count(lit(1)).as("tri3"))
      val wcount = wedges.agg(count(lit(1)).as("n_wedges"))
      degm.crossJoin(broadcast(wcount)).crossJoin(broadcast(closed))
        .select(col("n_nodes"), expr("sk div 2").as("n_edges"),
          col("n_wedges"), col("tri3").as("n_closed_wedges"),
          (col("tri3").cast("double") / col("n_wedges").cast("double"))
            .as("c_obs"),
          (((col("sk2").cast("double") / col("n_nodes").cast("double")
            - col("sk").cast("double") / col("n_nodes").cast("double"))
            * (col("sk2").cast("double") / col("n_nodes").cast("double")
              - col("sk").cast("double") / col("n_nodes").cast("double")))
            / (col("n_nodes").cast("double")
              * pow(col("sk").cast("double")
                / col("n_nodes").cast("double"), 3.0))).as("c_null"))
        .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
          col("n_closed_wedges"),
          round(col("c_obs"), 9).as("clustering_observed"),
          round(col("c_null"), 9).as("clustering_null"),
          round(col("c_obs") / col("c_null"), 6).as("lift_over_null"))
    },
    Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
        FROM lineitem),
      pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
          AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2),
      adj AS (SELECT part_a AS node, part_b AS nbr FROM pr
        UNION ALL SELECT part_b, part_a FROM pr),
      deg AS (SELECT node, count(*)::BIGINT AS deg FROM adj GROUP BY 1),
      degm AS (SELECT count(*)::BIGINT AS n_nodes,
          sum(deg)::BIGINT AS sk, sum(deg::HUGEINT * deg) AS sk2
        FROM deg),
      adjc AS (SELECT a.node, a.nbr FROM adj a
        JOIN deg d ON d.node = a.node WHERE deg <= 64),
      wedges AS (SELECT a.node, a.nbr AS end_a, b.nbr AS end_b
        FROM adjc a JOIN adjc b
          ON a.node = b.node AND a.nbr < b.nbr),
      closed AS (SELECT count(*)::BIGINT AS tri3 FROM wedges w
        WHERE EXISTS (SELECT 1 FROM pr
          WHERE part_a = w.end_a AND part_b = w.end_b)),
      wc AS (SELECT count(*)::BIGINT AS n_wedges FROM wedges),
      st AS (SELECT n_nodes, sk // 2 AS n_edges, n_wedges,
          tri3 AS n_closed_wedges,
          tri3::DOUBLE / n_wedges::DOUBLE AS c_obs,
          ((sk2::DOUBLE / n_nodes - sk::DOUBLE / n_nodes)
            * (sk2::DOUBLE / n_nodes - sk::DOUBLE / n_nodes))
            / (n_nodes::DOUBLE
              * pow(sk::DOUBLE / n_nodes::DOUBLE, 3.0)) AS c_null
        FROM degm, wc, closed)
      SELECT n_nodes, n_edges, n_wedges, n_closed_wedges,
        round(c_obs, 9) AS clustering_observed,
        round(c_null, 9) AS clustering_null,
        round(c_obs / c_null, 6) AS lift_over_null
      FROM st"""))

  // ---------- q440: Dunn post-hoc rank comparisons ----------------------

  /** Dunn's post-hoc pairwise rank test after Kruskal–Wallis — the
    * nonparametric sibling of q424 (Tukey follows q358's F exactly as
    * Dunn follows q407's H): which priority PAIRS differ in order
    * value when only ranks can be trusted. Average ranks come exactly
    * from the bounded $4000-bin table (rank of a bin = count below +
    * (w+1)/2 — a cumulative window over ≤700 cells, the q420
    * geometry), the tie-corrected variance term Σ(t³−t) folds from
    * the same bins, and the 10 pairwise z's ride a ≤k² broadcast join
    * with Bonferroni-adjusted p-values. One corpus counting pass;
    * everything after is dimension-bounded.
    */
  private val q440 = QueryDef(
    "q440_dunn_posthoc",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cells = Fixtures.table(s, dir, "orders")
        .select(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)")
            .as("g"),
          expr("CAST(round(o_totalprice) AS BIGINT) div 4000").as("v"))
        .groupBy(col("g"), col("v")).agg(count(lit(1)).as("w"))
      val bins = cells.groupBy(col("v")).agg(sum(col("w")).as("t"))
      val wv = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val ranked = bins
        .withColumn("below", coalesce(sum(col("t")).over(wv), lit(0L)))
        .select(col("v"), col("t"),
          (col("below").cast("double")
            + (col("t").cast("double") + 1.0) / 2.0).as("rk"))
      val tots = ranked.agg(sum(col("t")).as("n"),
        sum((col("t") * col("t") * col("t") - col("t"))
          .cast(DecimalType(38, 0))).as("tie3"))
      val gr = cells.join(broadcast(ranked), "v")
        .groupBy(col("g"))
        .agg(sum(col("w")).as("ng"),
          sum(expr("CAST(round(w * rk * 1e6) AS BIGINT)")
            .cast(DecimalType(38, 0))).as("srk_micro"))
        .select(col("g"), col("ng"),
          (col("srk_micro").cast("double") / 1e6
            / col("ng").cast("double")).as("rbar"))
      val g2 = gr.select(col("g").as("g2"), col("ng").as("ng2"),
        col("rbar").as("rbar2"))
      gr.crossJoin(broadcast(g2)).where(col("g") < col("g2"))
        .crossJoin(broadcast(tots))
        .select(col("g").as("group_a"), col("g2").as("group_b"),
          round(col("rbar") - col("rbar2"), 6).as("rank_diff"),
          round((col("rbar") - col("rbar2"))
            / sqrt((col("n").cast("double")
                * (col("n").cast("double") + 1.0) / 12.0
              - col("tie3").cast("double")
                / (lit(12.0) * (col("n").cast("double") - 1.0)))
              * (lit(1.0) / col("ng").cast("double")
                + lit(1.0) / col("ng2").cast("double"))), 6)
            .as("z_stat"))
        .withColumn("p_bonferroni",
          round(least(lit(1.0), expr("20.0 * "
            + Portable.normCdfUpper("abs(z_stat)"))), 9))
        .withColumn("significant", col("p_bonferroni") < 0.05)
        .orderBy(col("group_a"), col("group_b"))
    },
    Some(s"""WITH cells AS (SELECT
          CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS g,
          CAST(round(o_totalprice) AS BIGINT) // 4000 AS v,
          count(*)::BIGINT AS w
        FROM orders GROUP BY 1, 2),
      bins AS (SELECT v, sum(w)::BIGINT AS t FROM cells GROUP BY 1),
      ranked AS (SELECT v, t,
          coalesce(sum(t) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            ::DOUBLE + (t::DOUBLE + 1.0) / 2.0 AS rk
        FROM bins),
      tots AS (SELECT sum(t)::BIGINT AS n,
          sum((t * t * t - t)::HUGEINT) AS tie3 FROM ranked),
      gr AS (SELECT g, sum(w)::BIGINT AS ng,
          sum(CAST(round(w * rk * 1e6) AS BIGINT)::HUGEINT)::DOUBLE
            / 1e6 / sum(w)::DOUBLE AS rbar
        FROM cells JOIN ranked USING (v) GROUP BY 1),
      pairs AS (SELECT a.g AS group_a, b.g AS group_b,
          a.rbar - b.rbar AS rd,
          (a.rbar - b.rbar) / sqrt((n::DOUBLE * (n + 1.0) / 12.0
            - tie3::DOUBLE / (12.0 * (n - 1.0)))
            * (1.0 / a.ng + 1.0 / b.ng)) AS z
        FROM gr a, gr b, tots WHERE a.g < b.g)
      SELECT group_a, group_b, round(rd, 6) AS rank_diff,
        round(z, 6) AS z_stat,
        round(least(1.0,
          20.0 * ${Portable.normCdfUpper("abs(round(z, 6))")}), 9)
          AS p_bonferroni,
        round(least(1.0,
          20.0 * ${Portable.normCdfUpper("abs(round(z, 6))")}), 9) < 0.05
          AS significant
      FROM pairs ORDER BY group_a, group_b"""))

  // ---------- q441: Mood scale (dispersion) rank test -------------------

  /** Mood's rank-based SCALE test between open and finished orders —
    * the nonparametric member of the variance family (q307 Levene is
    * robust-parametric, q419 Bartlett normal-parametric; Mood's
    * T = Σ(rank − (N+1)/2)² needs no moments at all): do order
    * values DISPERSE differently while the books are open? Exact
    * under ties: per $4000-bin, the sum of squared centered ranks
    * over the bin's rank range [a+1, a+w] is a closed-form arithmetic
    * series (Σr², Σr — same literals in both dialects), so T and the
    * permutation moments E[T] = n₁·S̄ and Var[T] =
    * n₁n₂/(N(N−1))·(N·ΣS² − (ΣS)²)/N fold exactly from the bounded
    * bin table. One corpus counting pass; bounded math; 1-row
    * output.
    */
  private val q441 = QueryDef(
    "q441_mood_scale",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cells = Fixtures.table(s, dir, "orders")
        .select(col("o_orderstatus").as("g"),
          expr("CAST(round(o_totalprice) AS BIGINT) div 4000").as("v"))
        .where(col("g").isin("O", "F"))
        .groupBy(col("g"), col("v")).agg(count(lit(1)).as("w"))
      val bins = cells.groupBy(col("v")).agg(sum(col("w")).as("t"))
      val nn = bins.agg(sum(col("t")).as("n"))
      val wv = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, -1)
      // per-bin Σ score and Σ score² of (r − (N+1)/2)² over the rank
      // range (a, a+t]: closed-form power sums
      val scored = bins.crossJoin(broadcast(nn))
        .withColumn("a", coalesce(sum(col("t")).over(wv), lit(0L)))
        .select(col("v"), col("t"), col("n"),
          expr("""(CAST(a + t AS DOUBLE) * (a + t + 1) * (2 * (a + t) + 1)
              - CAST(a AS DOUBLE) * (a + 1) * (2 * a + 1)) / 6.0
            - (n + 1.0) * (CAST(a + t AS DOUBLE) * (a + t + 1)
              - CAST(a AS DOUBLE) * (a + 1)) / 2.0
            + t * (n + 1.0) * (n + 1.0) / 4.0""").as("s_sum"),
          expr("""t * pow((n + 1.0) / 2.0, 4.0)
            + ((pow(CAST(a + t AS DOUBLE), 5.0) - pow(CAST(a AS DOUBLE), 5.0)) / 5.0
              + (pow(CAST(a + t AS DOUBLE), 4.0) - pow(CAST(a AS DOUBLE), 4.0)) / 2.0
              + (pow(CAST(a + t AS DOUBLE), 3.0) - pow(CAST(a AS DOUBLE), 3.0)) / 3.0
              - (CAST(t AS DOUBLE)) / 30.0)
            - 4.0 * ((n + 1.0) / 2.0)
              * ((pow(CAST(a + t AS DOUBLE), 4.0) - pow(CAST(a AS DOUBLE), 4.0)) / 4.0
                + (pow(CAST(a + t AS DOUBLE), 3.0) - pow(CAST(a AS DOUBLE), 3.0)) / 2.0
                + (pow(CAST(a + t AS DOUBLE), 2.0) - pow(CAST(a AS DOUBLE), 2.0)) / 4.0)
            + 6.0 * pow((n + 1.0) / 2.0, 2.0)
              * ((pow(CAST(a + t AS DOUBLE), 3.0) - pow(CAST(a AS DOUBLE), 3.0)) / 3.0
                + (pow(CAST(a + t AS DOUBLE), 2.0) - pow(CAST(a AS DOUBLE), 2.0)) / 2.0
                + (CAST(t AS DOUBLE)) / 6.0)
            - 4.0 * pow((n + 1.0) / 2.0, 3.0)
              * ((pow(CAST(a + t AS DOUBLE), 2.0) - pow(CAST(a AS DOUBLE), 2.0)) / 2.0
                + (CAST(t AS DOUBLE)) / 2.0)""").as("s2_sum"))
      // the pinned per-bin score sums cross int64 above ~sf0.3 (score²
      // ~ N⁴/16), so they go straight to DECIMAL(38,0) — no BIGINT hop
      val tot = scored.agg(max(col("n")).as("n"),
        sum(expr("CAST(round(s_sum * 1e3) AS DECIMAL(38,0))"))
          .as("ss_milli"),
        sum(expr("CAST(round(s2_sum * 1e-3) AS DECIMAL(38,0))"))
          .as("ss2_kilo"))
      val tstat = cells.join(broadcast(
          scored.select(col("v"), col("t"),
            (col("s_sum") / col("t").cast("double")).as("mean_score"))),
          "v")
        .groupBy(col("g"))
        .agg(sum(col("w")).as("ng"),
          sum(expr("CAST(round(w * mean_score * 1e3) AS DECIMAL(38,0))"))
            .as("t_milli"))
      val t1 = tstat.where(col("g") === "O")
        .select(col("ng").as("n1"),
          (col("t_milli").cast("double") / 1e3).as("t_obs"))
      val t2 = tstat.where(col("g") === "F")
        .select(col("ng").as("n2"))
      t1.crossJoin(broadcast(t2)).crossJoin(broadcast(tot))
        .select(col("n1"), col("n2"), col("n"), col("t_obs"),
          round(col("t_obs"), 3).as("t_stat"),
          ((col("n1").cast("double")
            * (col("ss_milli").cast("double") / 1e3)
            / col("n").cast("double"))).as("et"),
          ((col("n1").cast("double") * col("n2").cast("double")
            / (col("n").cast("double") * (col("n").cast("double") - 1.0)))
            * ((col("ss2_kilo").cast("double") * 1e3)
              - (col("ss_milli").cast("double") / 1e3)
                * (col("ss_milli").cast("double") / 1e3)
                / col("n").cast("double"))).as("vt"))
        .select(col("n1"), col("n2"),
          col("t_stat"), round(col("et"), 3).as("expected_t"),
          round((col("t_obs") - col("et")) / sqrt(col("vt")), 6)
            .as("z_stat"),
          round(expr("2.0 * " + Portable.normCdfUpper(
            "abs((t_obs - et) / sqrt(vt))")), 9).as("p_value"))
    },
    Some(s"""WITH cells AS (SELECT o_orderstatus AS g,
          CAST(round(o_totalprice) AS BIGINT) // 4000 AS v,
          count(*)::BIGINT AS w
        FROM orders WHERE o_orderstatus IN ('O', 'F')
        GROUP BY 1, 2),
      bins AS (SELECT v, sum(w)::BIGINT AS t FROM cells GROUP BY 1),
      nn AS (SELECT sum(t)::BIGINT AS n FROM bins),
      pre AS (SELECT v, t, n,
          coalesce(sum(t) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            ::BIGINT AS a
        FROM bins, nn),
      scored AS (SELECT v, t, n,
          ((a + t)::DOUBLE * (a + t + 1) * (2 * (a + t) + 1)
            - a::DOUBLE * (a + 1) * (2 * a + 1)) / 6.0
          - (n + 1.0) * ((a + t)::DOUBLE * (a + t + 1)
            - a::DOUBLE * (a + 1)) / 2.0
          + t * (n + 1.0) * (n + 1.0) / 4.0 AS s_sum,
          t * pow((n + 1.0) / 2.0, 4.0)
          + ((pow((a + t)::DOUBLE, 5.0) - pow(a::DOUBLE, 5.0)) / 5.0
            + (pow((a + t)::DOUBLE, 4.0) - pow(a::DOUBLE, 4.0)) / 2.0
            + (pow((a + t)::DOUBLE, 3.0) - pow(a::DOUBLE, 3.0)) / 3.0
            - (t::DOUBLE) / 30.0)
          - 4.0 * ((n + 1.0) / 2.0)
            * ((pow((a + t)::DOUBLE, 4.0) - pow(a::DOUBLE, 4.0)) / 4.0
              + (pow((a + t)::DOUBLE, 3.0) - pow(a::DOUBLE, 3.0)) / 2.0
              + (pow((a + t)::DOUBLE, 2.0) - pow(a::DOUBLE, 2.0)) / 4.0)
          + 6.0 * pow((n + 1.0) / 2.0, 2.0)
            * ((pow((a + t)::DOUBLE, 3.0) - pow(a::DOUBLE, 3.0)) / 3.0
              + (pow((a + t)::DOUBLE, 2.0) - pow(a::DOUBLE, 2.0)) / 2.0
              + (t::DOUBLE) / 6.0)
          - 4.0 * pow((n + 1.0) / 2.0, 3.0)
            * ((pow((a + t)::DOUBLE, 2.0) - pow(a::DOUBLE, 2.0)) / 2.0
              + (t::DOUBLE) / 2.0) AS s2_sum
        FROM pre),
      tot AS (SELECT max(n) AS n,
          sum(CAST(round(s_sum * 1e3) AS DECIMAL(38,0))) AS ss_milli,
          sum(CAST(round(s2_sum * 1e-3) AS DECIMAL(38,0)))
            AS ss2_kilo
        FROM scored),
      tst AS (SELECT g, sum(w)::BIGINT AS ng,
          sum(CAST(round(w * (s_sum / t::DOUBLE) * 1e3)
            AS DECIMAL(38,0))) AS t_milli
        FROM cells JOIN scored USING (v) GROUP BY 1),
      t1 AS (SELECT ng AS n1, t_milli::DOUBLE / 1e3 AS t_obs
        FROM tst WHERE g = 'O'),
      t2 AS (SELECT ng AS n2 FROM tst WHERE g = 'F'),
      st AS (SELECT n1, n2, n, t_obs,
          n1::DOUBLE * (ss_milli::DOUBLE / 1e3) / n::DOUBLE AS et,
          (n1::DOUBLE * n2::DOUBLE / (n::DOUBLE * (n::DOUBLE - 1.0)))
            * ((ss2_kilo::DOUBLE * 1e3)
              - (ss_milli::DOUBLE / 1e3) * (ss_milli::DOUBLE / 1e3)
                / n::DOUBLE) AS vt
        FROM t1, t2, tot)
      SELECT n1, n2, round(t_obs, 3) AS t_stat,
        round(et, 3) AS expected_t,
        round((t_obs - et) / sqrt(vt), 6) AS z_stat,
        round(2.0 * ${Portable.normCdfUpper(
          "abs((t_obs - et) / sqrt(vt))")}, 9) AS p_value
      FROM st"""))

  // ---------- q442: ANOVA effect-size panel -----------------------------

  /** Effect sizes for the priority → order-value ANOVA — the
    * magnitude read q358's F deliberately is not: at corpus N
    * everything is "significant", and η² = SSB/SST, the
    * bias-corrected ω², Cohen's f, and the largest pairwise
    * Cohen's d say whether the differences MATTER. All four fold
    * closed-form from the same per-group exact moments (n, Σcents,
    * Σcents²) the q358/q419/q424 family already reduces — one
    * grouped corpus pass, bounded group math (pairwise d over the
    * ≤k² broadcast), 1-row output. The per-group SSB term sy²/n
    * exceeds int64 above ~sf0.05 (sy is total cents), so it
    * accumulates in DECIMAL(38,0) with no BIGINT intermediate —
    * the q333/q350/q352 wide-moment convention.
    */
  private val q442 = QueryDef(
    "q442_effect_sizes",
    (s, dir) => {
      val g = Fixtures.table(s, dir, "orders")
        .select(col("o_orderpriority").as("grp"),
          expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").as("y"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum((col("y").cast(DecimalType(38, 0)) * col("y"))).as("syy"))
      val tot = g.agg(count(lit(1)).as("k"), sum(col("n")).as("nt"),
        sum(col("sy").cast(DecimalType(38, 0))).as("syt"),
        sum(col("syy")).as("syyt"),
        sum(expr("CAST(round(CAST(sy AS DOUBLE) * sy / n) " +
          "AS DECIMAL(38,0))")).as("ssb_raw"))
      val base = tot.select(col("k"), col("nt"),
        (col("ssb_raw").cast("double") - col("syt").cast("double")
          * col("syt").cast("double") / col("nt").cast("double"))
          .as("ssb"),
        (col("syyt").cast("double") - col("syt").cast("double")
          * col("syt").cast("double") / col("nt").cast("double"))
          .as("sst"))
        .select(col("k"), col("nt"), col("ssb"), col("sst"),
          ((col("sst") - col("ssb"))
            / (col("nt").cast("double") - col("k").cast("double")))
            .as("mse"))
      val pairs = g.select(col("grp"), col("n"), col("sy"))
      val p2 = pairs.select(col("grp").as("g2"), col("n").as("n2"),
        col("sy").as("sy2"))
      val maxd = pairs.crossJoin(broadcast(p2))
        .where(col("grp") < col("g2"))
        .crossJoin(broadcast(base.select(col("mse"))))
        .agg(max(abs(col("sy").cast("double") / col("n").cast("double")
          - col("sy2").cast("double") / col("n2").cast("double"))
          / sqrt(col("mse"))).as("max_d"))
      base.crossJoin(broadcast(maxd))
        .select(col("k").as("k_groups"), col("nt").as("n_total"),
          round(col("ssb") / col("sst"), 9).as("eta_sq"),
          round((col("ssb") - (col("k").cast("double") - 1.0)
            * col("mse")) / (col("sst") + col("mse")), 9).as("omega_sq"),
          round(sqrt((col("ssb") / col("sst"))
            / (lit(1.0) - col("ssb") / col("sst"))), 9).as("cohens_f"),
          round(col("max_d"), 9).as("max_pairwise_d"))
    },
    Some("""WITH g AS (SELECT o_orderpriority AS grp,
          count(*)::BIGINT AS n,
          sum(CAST(round(o_totalprice * 100.0) AS BIGINT))::BIGINT AS sy,
          sum(CAST(round(o_totalprice * 100.0) AS BIGINT)::HUGEINT
            * CAST(round(o_totalprice * 100.0) AS BIGINT)) AS syy
        FROM orders GROUP BY 1),
      tot AS (SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS nt,
          sum(sy::HUGEINT) AS syt, sum(syy) AS syyt,
          sum(CAST(round(sy::DOUBLE * sy / n) AS DECIMAL(38,0)))
            AS ssb_raw
        FROM g),
      base AS (SELECT k, nt,
          ssb_raw::DOUBLE - syt::DOUBLE * syt::DOUBLE / nt::DOUBLE
            AS ssb,
          syyt::DOUBLE - syt::DOUBLE * syt::DOUBLE / nt::DOUBLE AS sst
        FROM tot),
      base2 AS (SELECT k, nt, ssb, sst,
          (sst - ssb) / (nt::DOUBLE - k::DOUBLE) AS mse FROM base),
      maxd AS (SELECT max(abs(a.sy::DOUBLE / a.n - b.sy::DOUBLE / b.n)
            / sqrt(mse)) AS max_d
        FROM g a, g b, base2 WHERE a.grp < b.grp)
      SELECT k AS k_groups, nt AS n_total,
        round(ssb / sst, 9) AS eta_sq,
        round((ssb - (k::DOUBLE - 1.0) * mse) / (sst + mse), 9)
          AS omega_sq,
        round(sqrt((ssb / sst) / (1.0 - ssb / sst)), 9) AS cohens_f,
        round(max_d, 9) AS max_pairwise_d
      FROM base2, maxd"""))

  // ---------- q443: Deming and SMA measurement-error regression ---------

  /** Deming (λ = 1) and standardized-major-axis slopes for the
    * log-quantity → log-revenue relation, next to the OLS estimate —
    * the MEASUREMENT-ERROR corner of the slope family (q233 OLS
    * assumes x exact; q362 Theil–Sen fixes outliers, not attenuation;
    * q360 IV needs an instrument): when both variables carry noise,
    * OLS biases toward zero and the errors-in-variables slopes are
    * the honest fit, with OLS/Deming disagreement itself measuring
    * attenuation. Both alternatives are CLOSED-FORM in the centered
    * second moments (Deming: ((Syy−Sxx) + √((Syy−Sxx)² + 4Sxy²)) /
    * 2Sxy; SMA: sign(Sxy)·√(Syy/Sxx)), so the whole panel costs the
    * one micro-pinned moment scan q348 already demonstrates. 1-row
    * output.
    */
  private val q443 = QueryDef(
    "q443_deming_sma",
    (s, dir) => {
      val pts = Fixtures.table(s, dir, "lineitem").select(
        expr("CAST(round(ln(CAST(l_quantity AS DOUBLE)) * 1e6) " +
          "AS BIGINT)").as("x"),
        expr("CAST(round(ln(l_extendedprice) * 1e6) AS BIGINT)")
          .as("y"))
      val m = pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum((col("x").cast(DecimalType(38, 0)) * col("x"))).as("sxx"),
        sum((col("x").cast(DecimalType(38, 0)) * col("y"))).as("sxy"),
        sum((col("y").cast(DecimalType(38, 0)) * col("y"))).as("syy"))
      val c = m.select(col("n"),
        ((col("sxx").cast("double") - col("sx").cast("double")
          * col("sx").cast("double") / col("n").cast("double")) / 1e12)
          .as("cxx"),
        ((col("sxy").cast("double") - col("sx").cast("double")
          * col("sy").cast("double") / col("n").cast("double")) / 1e12)
          .as("cxy"),
        ((col("syy").cast("double") - col("sy").cast("double")
          * col("sy").cast("double") / col("n").cast("double")) / 1e12)
          .as("cyy"))
      c.select(col("n"),
          round(col("cxy") / col("cxx"), 9).as("ols_slope"),
          round(((col("cyy") - col("cxx"))
            + sqrt((col("cyy") - col("cxx")) * (col("cyy") - col("cxx"))
              + lit(4.0) * col("cxy") * col("cxy")))
            / (lit(2.0) * col("cxy")), 9).as("deming_slope"),
          round(signum(col("cxy")) * sqrt(col("cyy") / col("cxx")), 9)
            .as("sma_slope"),
          round(col("cxy") / sqrt(col("cxx") * col("cyy")), 9)
            .as("pearson_r"))
        .withColumn("attenuation_ratio",
          round(col("ols_slope") / col("deming_slope"), 9))
    },
    Some("""WITH pts AS (SELECT
          CAST(round(ln(l_quantity::DOUBLE) * 1e6) AS BIGINT) AS x,
          CAST(round(ln(l_extendedprice) * 1e6) AS BIGINT) AS y
        FROM lineitem),
      m AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
          sum(y)::BIGINT AS sy, sum(x::HUGEINT * x) AS sxx,
          sum(x::HUGEINT * y) AS sxy, sum(y::HUGEINT * y) AS syy
        FROM pts),
      c AS (SELECT n,
          (sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n::DOUBLE) / 1e12
            AS cxx,
          (sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n::DOUBLE) / 1e12
            AS cxy,
          (syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE) / 1e12
            AS cyy
        FROM m),
      r AS (SELECT n,
          round(cxy / cxx, 9) AS ols_slope,
          round(((cyy - cxx) + sqrt((cyy - cxx) * (cyy - cxx)
            + 4.0 * cxy * cxy)) / (2.0 * cxy), 9) AS deming_slope,
          round(sign(cxy) * sqrt(cyy / cxx), 9) AS sma_slope,
          round(cxy / sqrt(cxx * cyy), 9) AS pearson_r
        FROM c)
      SELECT n, ols_slope, deming_slope, sma_slope, pearson_r,
        round(ols_slope / deming_slope, 9) AS attenuation_ratio
      FROM r"""))

  // ---------- q444: Fieller ratio confidence interval -------------------

  /** Fieller CI for the ratio of mean order values between the
    * AUTOMOBILE and BUILDING segments — the correct interval for a
    * RATIO of means, which the naive delta-method band gets wrong
    * exactly when it matters (denominator mean near its own noise):
    * Fieller inverts the t-test on m₁ − ρm₂ and goes unbounded when
    * the denominator is not significantly nonzero — reported via the
    * g statistic. Per-segment (n, Σcents, Σcents²) moments from one
    * grouped corpus pass; all interval math on the 2-row bounded
    * frame. 1-row output.
    */
  private val q444 = QueryDef(
    "q444_fieller_ratio",
    (s, dir) => {
      val seg = Fixtures.table(s, dir, "orders")
        .join(Fixtures.table(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .where(col("c_mktsegment").isin("AUTOMOBILE", "BUILDING"))
        .select(col("c_mktsegment").as("g"),
          expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").as("y"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum((col("y").cast(DecimalType(38, 0)) * col("y"))).as("syy"))
      val a = seg.where(col("g") === "AUTOMOBILE")
        .select(col("n").as("n1"),
          (col("sy").cast("double") / col("n").cast("double"))
            .as("m1"),
          (expr("""(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)
            / (n - 1.0)""") / col("n").cast("double")).as("v1"))
      val b = seg.where(col("g") === "BUILDING")
        .select(col("n").as("n2"),
          (col("sy").cast("double") / col("n").cast("double"))
            .as("m2"),
          (expr("""(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)
            / (n - 1.0)""") / col("n").cast("double")).as("v2"))
      a.crossJoin(broadcast(b))
        .select(col("n1"), col("n2"),
          (col("m1") / col("m2")).as("ratio"),
          (lit(3.8416) * col("v2") / (col("m2") * col("m2"))).as("gg"),
          col("m1"), col("m2"), col("v1"), col("v2"))
        .select(col("n1"), col("n2"), round(col("ratio"), 9).as("ratio"),
          round(col("gg"), 9).as("g_stat"),
          round((col("ratio") - lit(1.96) / col("m2")
            * sqrt(col("v1") + col("ratio") * col("ratio") * col("v2")
              - col("gg") * col("v1"))) / (lit(1.0) - col("gg")), 9)
            .as("ci_lo"),
          round((col("ratio") + lit(1.96) / col("m2")
            * sqrt(col("v1") + col("ratio") * col("ratio") * col("v2")
              - col("gg") * col("v1"))) / (lit(1.0) - col("gg")), 9)
            .as("ci_hi"),
          (col("gg") < 1.0).as("interval_finite"))
    },
    Some("""WITH seg AS (SELECT c_mktsegment AS g,
          count(*)::BIGINT AS n,
          sum(CAST(round(o_totalprice * 100.0) AS BIGINT))::BIGINT AS sy,
          sum(CAST(round(o_totalprice * 100.0) AS BIGINT)::HUGEINT
            * CAST(round(o_totalprice * 100.0) AS BIGINT)) AS syy
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
        GROUP BY 1),
      a AS (SELECT n AS n1, sy::DOUBLE / n AS m1,
          ((syy::DOUBLE - sy::DOUBLE * sy / n) / (n - 1.0)) / n AS v1
        FROM seg WHERE g = 'AUTOMOBILE'),
      b AS (SELECT n AS n2, sy::DOUBLE / n AS m2,
          ((syy::DOUBLE - sy::DOUBLE * sy / n) / (n - 1.0)) / n AS v2
        FROM seg WHERE g = 'BUILDING'),
      st AS (SELECT n1, n2, m1 / m2 AS ratio,
          3.8416 * v2 / (m2 * m2) AS gg, m1, m2, v1, v2
        FROM a, b)
      SELECT n1, n2, round(ratio, 9) AS ratio,
        round(gg, 9) AS g_stat,
        round((ratio - 1.96 / m2 * sqrt(v1 + ratio * ratio * v2
          - gg * v1)) / (1.0 - gg), 9) AS ci_lo,
        round((ratio + 1.96 / m2 * sqrt(v1 + ratio * ratio * v2
          - gg * v1)) / (1.0 - gg), 9) AS ci_hi,
        gg < 1.0 AS interval_finite
      FROM st"""))

  // ---------- q445: Poisson rate-ratio test -----------------------------

  /** Weekend-vs-weekday error-event rate ratio with its log-scale
    * test — the TWO-SAMPLE member of the count family (q403 fits one
    * Poisson regression; q410 screens one sample for zero inflation;
    * operations wants the simpler sharper question "is the error
    * RATE different on weekends?"): RR = (e₁/t₁)/(e₂/t₂), with
    * se(ln RR) = √(1/e₁ + 1/e₂) and exposure measured in observed
    * days of each stratum. One filtered counting pass over events +
    * the bounded day census; all test math scalar. 1-row output.
    */
  private val q445 = QueryDef(
    "q445_rate_ratio",
    (s, dir) => {
      val ed = ev(s, dir)
        .select(expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
            .as("day"),
          col("event_type"))
      val byDay = ed.groupBy(col("day"))
        .agg(sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("errs"))
        .select(col("day"), col("errs"),
          // epoch day 0 = Thursday; (day+4)%7 has 0=Sunday (the q143
          // convention), so weekend {Sun,Sat} = (day+4)%7 IN (0,6),
          // i.e. day%7 IN (2,3) for the non-negative days here.
          (expr("((day % 7) + 7) % 7 IN (2, 3)")).as("is_wkend"))
      val m = byDay.groupBy(col("is_wkend"))
        .agg(count(lit(1)).as("days"), sum(col("errs")).as("errs"))
      val we = m.where(col("is_wkend"))
        .select(col("days").as("d1"), col("errs").as("e1"))
      val wd = m.where(!col("is_wkend"))
        .select(col("days").as("d2"), col("errs").as("e2"))
      we.crossJoin(broadcast(wd))
        .select(col("e1").as("weekend_errors"),
          col("d1").as("weekend_days"),
          col("e2").as("weekday_errors"), col("d2").as("weekday_days"),
          ((col("e1").cast("double") / col("d1").cast("double"))
            / (col("e2").cast("double") / col("d2").cast("double")))
            .as("rr"),
          sqrt(lit(1.0) / col("e1").cast("double")
            + lit(1.0) / col("e2").cast("double")).as("se"))
        .select(col("weekend_errors"), col("weekend_days"),
          col("weekday_errors"), col("weekday_days"),
          round(col("rr"), 9).as("rate_ratio"),
          round(exp(log(col("rr")) - lit(1.96) * col("se")), 9)
            .as("ci_lo"),
          round(exp(log(col("rr")) + lit(1.96) * col("se")), 9)
            .as("ci_hi"),
          round(abs(log(col("rr"))) / col("se"), 6).as("z_stat"),
          round(expr("2.0 * " + Portable.normCdfUpper(
            "abs(ln(rr)) / se")), 9).as("p_value"))
    },
    Some(s"""WITH ed AS (SELECT epoch_us(ts) // 86400000000 AS day,
          event_type FROM events),
      byday AS (SELECT day,
          sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT
            AS errs,
          ((day % 7) + 7) % 7 IN (2, 3) AS is_wkend
        FROM ed GROUP BY 1),
      m AS (SELECT is_wkend, count(*)::BIGINT AS days,
          sum(errs)::BIGINT AS errs
        FROM byday GROUP BY 1),
      we AS (SELECT days AS d1, errs AS e1 FROM m WHERE is_wkend),
      wd AS (SELECT days AS d2, errs AS e2 FROM m WHERE NOT is_wkend),
      st AS (SELECT e1 AS weekend_errors, d1 AS weekend_days,
          e2 AS weekday_errors, d2 AS weekday_days,
          (e1::DOUBLE / d1) / (e2::DOUBLE / d2) AS rr,
          sqrt(1.0 / e1::DOUBLE + 1.0 / e2::DOUBLE) AS se
        FROM we, wd)
      SELECT weekend_errors, weekend_days, weekday_errors, weekday_days,
        round(rr, 9) AS rate_ratio,
        round(exp(ln(rr) - 1.96 * se), 9) AS ci_lo,
        round(exp(ln(rr) + 1.96 * se), 9) AS ci_hi,
        round(abs(ln(rr)) / se, 6) AS z_stat,
        round(2.0 * ${Portable.normCdfUpper("abs(ln(rr)) / se")}, 9)
          AS p_value
      FROM st"""))

  // ---------- q446: E-value confounding sensitivity ---------------------

  /** VanderWeele–Ding E-value for the discount → return association —
    * the SENSITIVITY read the causal family (q255 DiD, q302
    * stratified ATE, q350 TWFE) should always ship with: an observed
    * risk ratio can be explained away by an unmeasured confounder
    * only if that confounder is associated with BOTH treatment and
    * outcome at strength ≥ E = RR + √(RR(RR−1)); a small E means the
    * finding is fragile, and computing E for the CI bound nearer 1
    * says whether even the conservative estimate survives. Treatment:
    * discount > 5 %; outcome: returned. One 2×2 counting pass, scalar
    * math, 1-row output (RR < 1 handled by the standard 1/RR
    * transform, same CASE in both dialects).
    */
  private val q446 = QueryDef(
    "q446_evalue_sensitivity",
    (s, dir) => {
      val m = Fixtures.table(s, dir, "lineitem")
        .select((col("l_discount") > 0.05).as("trt"),
          (col("l_returnflag") === "R").cast("long").as("y"))
        .groupBy(col("trt"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("r"))
      val t1 = m.where(col("trt")).select(col("n").as("n1"),
        col("r").as("r1"))
      val t0 = m.where(!col("trt")).select(col("n").as("n0"),
        col("r").as("r0"))
      val rr = t1.crossJoin(broadcast(t0))
        .select(col("n1"), col("r1"), col("n0"), col("r0"),
          ((col("r1").cast("double") / col("n1").cast("double"))
            / (col("r0").cast("double") / col("n0").cast("double")))
            .as("rr"),
          sqrt(lit(1.0) / col("r1").cast("double")
            - lit(1.0) / col("n1").cast("double")
            + lit(1.0) / col("r0").cast("double")
            - lit(1.0) / col("n0").cast("double")).as("se"))
      val star = rr.select(col("n1"), col("n0"), col("rr"),
        expr("CASE WHEN rr >= 1.0 THEN rr ELSE 1.0 / rr END")
          .as("rr_star"),
        expr("""CASE WHEN rr >= 1.0
            THEN exp(ln(rr) - 1.96 * se)
            ELSE 1.0 / exp(ln(rr) + 1.96 * se) END""").as("ci_star"))
      star.select(col("n1").as("n_treated"), col("n0").as("n_control"),
        round(col("rr"), 9).as("risk_ratio"),
        round(col("rr_star") + sqrt(col("rr_star")
          * (col("rr_star") - 1.0)), 9).as("evalue_point"),
        round(expr("""CASE WHEN ci_star > 1.0
          THEN ci_star + sqrt(ci_star * (ci_star - 1.0))
          ELSE 1.0 END"""), 9).as("evalue_ci"))
    },
    Some("""WITH m AS (SELECT l_discount > 0.05 AS trt,
          count(*)::BIGINT AS n,
          sum((l_returnflag = 'R')::BIGINT)::BIGINT AS r
        FROM lineitem GROUP BY 1),
      t1 AS (SELECT n AS n1, r AS r1 FROM m WHERE trt),
      t0 AS (SELECT n AS n0, r AS r0 FROM m WHERE NOT trt),
      rr AS (SELECT n1, r1, n0, r0,
          (r1::DOUBLE / n1) / (r0::DOUBLE / n0) AS rr,
          sqrt(1.0 / r1::DOUBLE - 1.0 / n1::DOUBLE
            + 1.0 / r0::DOUBLE - 1.0 / n0::DOUBLE) AS se
        FROM t1, t0),
      star AS (SELECT n1, n0, rr,
          CASE WHEN rr >= 1.0 THEN rr ELSE 1.0 / rr END AS rr_star,
          CASE WHEN rr >= 1.0 THEN exp(ln(rr) - 1.96 * se)
            ELSE 1.0 / exp(ln(rr) + 1.96 * se) END AS ci_star
        FROM rr)
      SELECT n1 AS n_treated, n0 AS n_control,
        round(rr, 9) AS risk_ratio,
        round(rr_star + sqrt(rr_star * (rr_star - 1.0)), 9)
          AS evalue_point,
        round(CASE WHEN ci_star > 1.0
          THEN ci_star + sqrt(ci_star * (ci_star - 1.0))
          ELSE 1.0 END, 9) AS evalue_ci
      FROM star"""))

  val all: Seq[QueryDef] = Seq(q413, q414, q415, q416, q417, q418, q419,
    q420, q421, q422, q423, q424, q425, q426, q427, q428, q429, q430,
    q431, q432, q433, q434, q435, q436, q437, q438, q439, q440, q441,
    q442, q443, q444, q445, q446)
}
