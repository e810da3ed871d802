package graft.ops

import graft.{Fixtures, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-quality operators beyond the per-doc scoring of q14:
  * intra-document repetition and benchmark contamination — the two
  * filters a pretraining build runs between dedup and split assignment.
  * Both reuse the dedup family's hashed-shingle posting table
  * (Dedup.inverted), so at scale they share its materialization.
  */
object Quality {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Fixtures.table(s, dir, "documents")

  // ---------- q43: intra-document repetition --------------------------

  /** Repetition score per document: 1 − distinct/total trigrams (the
    * Gopher-style duplicate-n-gram fraction). A doc that repeats a
    * passage scores high even when no OTHER doc matches it — this is
    * the within-doc complement of the cross-doc dedup family. Narrow:
    * one pass over the posting table + a projection join.
    */
  private val q43 = QueryDef(
    "q43_repetition",
    (s, dir) => {
      val nd = Dedup.inverted(s, dir)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_distinct"))
      docs(s, dir)
        .select(col("doc_id"),
          (size(split(col("text"), " ")) - 2).as("n_total"))
        .where(col("n_total") >= 1)
        .join(nd, "doc_id")
        .select(col("doc_id"), col("n_total"), col("n_distinct"),
          (lit(1.0) - col("n_distinct").cast("double") / col("n_total"))
            .as("rep_ratio"))
        .orderBy("doc_id")
    },
    Some(s"""WITH ${Dedup.shingledDuckCte},
      nd AS (SELECT doc_id, count(*) AS n_distinct FROM inv GROUP BY 1),
      tot AS (SELECT doc_id, len(string_split(text, ' ')) - 2 AS n_total
        FROM documents WHERE len(string_split(text, ' ')) - 2 >= 1)
      SELECT tot.doc_id, n_total, n_distinct,
        1.0 - n_distinct::DOUBLE / n_total AS rep_ratio
      FROM tot JOIN nd ON nd.doc_id = tot.doc_id
      ORDER BY 1"""))

  // ---------- q44: benchmark contamination ----------------------------

  private val NBench = 10

  /** Decontamination check: for each "benchmark" document (doc_id <
    * 10 stands in for an eval set), the fraction of its trigrams that
    * appear anywhere in the train split (q37's hash split, benchmark
    * docs excluded). High coverage ⇒ the benchmark leaks into
    * training data. Distributed shape: semi-join of the benchmark's
    * postings against the distinct train-shingle set — shuffle on the
    * 8-byte shingle key, never a doc×doc comparison.
    */
  private val q44 = QueryDef(
    "q44_contamination",
    (s, dir) => {
      val inv = Dedup.persistedInverted(s, dir)
      val trainIds = docs(s, dir)
        .where(col("doc_id") >= NBench &&
          expr(Portable.splitCaseSpark) === "train")
        .select(col("doc_id"))
      val trainShingles = inv.join(trainIds, "doc_id")
        .select(col("h")).distinct()
        .withColumn("in_train", lit(1))
      inv.where(col("doc_id") < NBench)
        .join(trainShingles, Seq("h"), "left_outer")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(coalesce(col("in_train"), lit(0))).as("n_hit"))
        .select(col("doc_id"), col("n_shingles"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_shingles"))
            .as("contamination"))
        .orderBy("doc_id")
    },
    Some(s"""WITH ${Dedup.shingledDuckCte},
      train_ids AS (SELECT doc_id FROM documents
        WHERE doc_id >= $NBench
        AND (${Portable.splitCaseDuck}) = 'train'),
      train_sh AS (SELECT DISTINCT h FROM inv
        JOIN train_ids USING (doc_id)),
      bench AS (SELECT doc_id, h FROM inv WHERE doc_id < $NBench)
      SELECT doc_id, count(*) AS n_shingles,
        sum(CASE WHEN train_sh.h IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit,
        sum(CASE WHEN train_sh.h IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
          / count(*) AS contamination
      FROM bench LEFT JOIN train_sh ON bench.h = train_sh.h
      GROUP BY doc_id ORDER BY doc_id"""))

  // ---------- q47: top terms per document (tf·N/df) -------------------

  /** Keyword extraction: rank each document's terms by tf · N / df —
    * the tf-idf family with a rational idf (no log(), whose libm
    * rounding differs across engines; the ranking is order-isomorphic
    * to tf·log-idf for fixed tf). Distributed shape: one (doc, term)
    * count agg, one term-level df agg joined back (broadcast-able at
    * any corpus size — |vocab| ≪ |corpus|), window top-3.
    */
  private val q47 = QueryDef(
    "q47_top_terms",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = docs(s, dir)
      val nDocs = d.count() // small driver-side scalar, same value both engines
      val tf = d.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      tf.join(df, "term")
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          (col("tf") * lit(nDocs) / col("df")).cast("double").as("score"))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"),
          col("score"))
        .orderBy("doc_id", "rnk")
    },
    Some("""WITH tf AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents),
      tfc AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
      dfc AS (SELECT term, count(DISTINCT doc_id) AS df FROM tfc GROUP BY 1),
      n AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (SELECT doc_id, tfc.term, tf, df,
          cast(tf * n_docs / df AS DOUBLE) AS score
        FROM tfc JOIN dfc ON tfc.term = dfc.term CROSS JOIN n),
      r AS (SELECT doc_id, term, tf, df, score,
          row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, term) AS rnk FROM scored)
      SELECT doc_id, rnk, term, tf, df, score FROM r
      WHERE rnk <= 3 ORDER BY doc_id, rnk"""))

  // ---------- q50: sensitive-term scrub (PII-redaction plumbing) ------

  /** Redaction pass: count and replace occurrences of a sensitive-term
    * pattern, reporting per-doc hit counts and the digest of the
    * scrubbed text (digest equality across engines proves the
    * replacement text is byte-identical, not just counted alike). A
    * real deployment swaps the dictionary for PII regexes (emails,
    * phone numbers, ID formats) — the fixture corpus is synthetic
    * vocabulary, so three of its words stand in; the plumbing (global
    * regex count + global replace inside codegen, narrow projection,
    * no shuffle) is exactly the production shape. Patterns stay inside
    * the RE2 ∩ Java-regex common subset so both engines match
    * identically; DuckDB's regexp_replace needs the explicit 'g' flag
    * (Spark is global by default).
    */
  private val ScrubPat = "\\b(customer|vector|merge)\\b"

  private val q50 = QueryDef(
    "q50_term_scrub",
    (s, dir) => docs(s, dir)
      .select(col("doc_id"),
        regexp_count(col("text"), lit(ScrubPat)).cast("bigint").as("n_hits"),
        md5(regexp_replace(col("text"), ScrubPat, "[REDACTED]"))
          .as("scrub_md5"))
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id,
      len(regexp_extract_all(text, '$ScrubPat')) AS n_hits,
      md5(regexp_replace(text, '$ScrubPat', '[REDACTED]', 'g'))
        AS scrub_md5
      FROM documents ORDER BY doc_id"""))

  // ---------- q91: curriculum grid (quality decile × length bucket) ---

  /** The curriculum-sampling control table: documents cross-tabulated
    * by quality decile (q14's score, ntile(10) with a doc_id tie-break
    * so bucket assignment is total and engine-portable) × length
    * bucket. A staged training run reads this grid to set per-cell
    * sampling rates ("high-quality long docs late, everything early");
    * emitting the grid rather than per-doc labels keeps the control
    * surface at deciles × buckets rows no matter the corpus size.
    * Shape: one corpus pass for the score (all codegen'd string ops),
    * then the two-pass quantile-boundary-broadcast ntile (RangeNtile,
    * per-shard sorts only — the q149 default; graft.ntile.strategy=
    * window restores the single-sort window form the spec compares
    * against), then a tiny cross-tab aggregate.
    */
  private val q91 = QueryDef(
    "q91_curriculum_grid",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val scored = docs(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"), col("n_chars"),
          (lit(0.3) * (size(array_distinct(col("toks"))).cast("double")
              / size(col("toks")))
            + lit(0.3) * least(size(col("toks")).cast("double") / lit(50.0),
              lit(1.0))).as("score"))
      val sortKey = Seq(col("score"), col("doc_id"))
      val labeled =
        if (s.conf.getOption("graft.ntile.strategy").contains("window"))
          scored.withColumn("decile",
            ntile(10).over(Window.orderBy(sortKey: _*)).cast("long"))
        else RangeNtile.withNtile(scored, sortKey, 10, "decile")
      labeled
        .withColumn("len_bucket",
          expr("CASE WHEN n_chars < 500 THEN 'short' " +
            "WHEN n_chars < 1500 THEN 'medium' ELSE 'long' END"))
        .groupBy(col("decile"), col("len_bucket"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("decile", "len_bucket")
    },
    Some("""WITH scored AS (SELECT doc_id, n_chars,
        0.3 * (cast(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
          / len(string_split(text, ' ')))
        + 0.3 * least(cast(len(string_split(text, ' ')) AS DOUBLE) / 50.0,
          1.0) AS score
      FROM documents),
      graded AS (SELECT n_chars,
        ntile(10) OVER (ORDER BY score, doc_id) AS decile,
        CASE WHEN n_chars < 500 THEN 'short'
          WHEN n_chars < 1500 THEN 'medium' ELSE 'long' END AS len_bucket
      FROM scored)
      SELECT decile::BIGINT AS decile, len_bucket,
        count(*)::BIGINT AS n_docs
      FROM graded GROUP BY 1, 2 ORDER BY decile, len_bucket"""))

  // ---------- q101: k-anonymity audit ---------------------------------

  /** Quasi-identifier re-identification audit over (lang, source,
    * length-bucket) — the privacy gate run before releasing a corpus
    * or its metadata: any QI combination shared by fewer than k = 5
    * documents singles those documents out (the k-anonymity criterion,
    * Sweeney 2002). Emits each violating cell with its size plus
    * exact severity ordering; the integer-division length bucket
    * (n_chars div 500) is the same engine-exact bucketing q91 uses.
    * One hash aggregate over the corpus (map-side partials, QI-cell
    * output cardinality), one filter — the cheapest query in the
    * privacy family, and the one that must run at full 100 TB scale
    * because rare cells are BY DEFINITION invisible in samples.
    */
  private val AnonK = 5L

  private val q101 = QueryDef(
    "q101_k_anonymity",
    (s, dir) => docs(s, dir)
      .groupBy(col("lang"), col("source"),
        expr("n_chars div 500").as("len_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("example_doc"))
      .where(col("n_docs") < AnonK)
      .orderBy("lang", "source", "len_bucket"),
    Some(s"""SELECT lang, source, n_chars // 500 AS len_bucket,
        count(*)::BIGINT AS n_docs, min(doc_id)::BIGINT AS example_doc
      FROM documents GROUP BY 1, 2, 3
      HAVING count(*) < $AnonK
      ORDER BY lang, source, len_bucket"""))

  // ---------- q109: chi-square independence (lang × source) -----------

  /** Pearson χ² for independence of language and source — the
    * balanced-corpus check: a significant statistic means sources are
    * language-skewed, so source-level sampling decisions silently
    * reweight languages (and vice versa). Observed counts are exact
    * ints; each expected count E = rowN·colN/N is one exact-int
    * multiply (≤ ~2^62 at 100 TB doc counts — the documented bound)
    * and one division; the (O−E)²/E term is pinned to integer
    * micro-units (q96 rule — µ units, not nano: terms can reach 1e6
    * so nano-units would near the 2^53 exact-sum bound at big SF) and
    * summed exactly. Output: one row — χ², degrees of freedom, N.
    * Shape: one corpus aggregate to the cell table, two tiny
    * re-aggregates for margins, broadcast joins — cells × nothing.
    */
  private val q109 = QueryDef(
    "q109_chi2_lang_source",
    (s, dir) => {
      val cells = docs(s, dir)
        .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("o"))
      val rows_ = cells.groupBy(col("lang")).agg(sum(col("o")).as("rn"))
      val cols_ = cells.groupBy(col("source")).agg(sum(col("o")).as("cn"))
      val n = cells.agg(sum(col("o")).as("n"),
        count(lit(1)).as("n_cells"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"))
      cells.join(broadcast(rows_), "lang").join(broadcast(cols_), "source")
        .crossJoin(broadcast(n))
        .withColumn("e", (col("rn") * col("cn")).cast("double") / col("n"))
        .withColumn("units", round((col("o") - col("e"))
          * (col("o") - col("e")) / col("e") * lit(1e6)).cast("long"))
        .groupBy()
        .agg(first(col("n")).as("n_docs"),
          ((first(col("n_langs")) - 1) * (first(col("n_sources")) - 1))
            .as("dof"),
          (sum(col("units")).cast("double") / lit(1e6)).as("chi2"))
    },
    Some("""WITH cells AS (SELECT lang, source, count(*) AS o
        FROM documents GROUP BY 1, 2),
      r AS (SELECT lang, sum(o) AS rn FROM cells GROUP BY 1),
      c AS (SELECT source, sum(o) AS cn FROM cells GROUP BY 1),
      n AS (SELECT sum(o) AS n, count(*) AS n_cells,
        count(DISTINCT lang) AS n_langs,
        count(DISTINCT source) AS n_sources FROM cells),
      terms AS (SELECT o, (rn * cn)::DOUBLE / n.n AS e,
          n.n AS nn, n_langs, n_sources
        FROM cells JOIN r USING (lang) JOIN c USING (source), n)
      SELECT min(nn)::BIGINT AS n_docs,
        ((min(n_langs) - 1) * (min(n_sources) - 1))::BIGINT AS dof,
        sum(round((o - e) * (o - e) / e * 1e6)::BIGINT)::DOUBLE / 1e6
          AS chi2
      FROM terms"""))

  // ---------- q110: effective language diversity (inverse Simpson) ----

  /** Inverse-Simpson diversity 1/Σpᵢ² per source — "how many languages
    * does this source EFFECTIVELY contribute": 5 equal languages
    * score 5.0, a 95/5 split scores barely over 1 — the number a
    * corpus-mix planner reads instead of raw language counts (which
    * ignore balance). Entirely exact integer arithmetic until one
    * final division: 1/Σ(nᵢ/N)² = N²/Σnᵢ², both sides int64 (N ≤
    * ~3 × 10⁹ docs per source before N² hits the 2^63 bound — the
    * documented widen-to-DECIMAL point). Two nested tiny aggregates
    * after one corpus pass.
    */
  private val q110 = QueryDef(
    "q110_lang_diversity",
    (s, dir) => docs(s, dir)
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("ni"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_langs"), sum(col("ni")).as("n_docs"),
        sum(col("ni") * col("ni")).as("s2"))
      .select(col("source"), col("n_langs"), col("n_docs"),
        ((col("n_docs") * col("n_docs")).cast("double") / col("s2"))
          .as("effective_langs"))
      .orderBy("source"),
    Some("""WITH cells AS (SELECT source, lang, count(*) AS ni
        FROM documents GROUP BY 1, 2),
      agg AS (SELECT source, count(*) AS n_langs, sum(ni) AS n_docs,
        sum(ni * ni) AS s2 FROM cells GROUP BY 1)
      SELECT source, n_langs::BIGINT AS n_langs, n_docs::BIGINT AS n_docs,
        (n_docs * n_docs)::DOUBLE / s2 AS effective_langs
      FROM agg ORDER BY source"""))

  // ---------- q116: source mixture weights (temperature sampling) ------

  /** The data-mixture step every pretraining build runs after counting:
    * per-source sampling weights under temperature α = 0.5 —
    * wₛ ∝ tokensₛ^α — which upweights small sources relative to their
    * natural share p (the multilingual-sampling rule; α = 1 is natural,
    * α = 0 is uniform). √tokens is one IEEE sqrt on an exact int64
    * (bit-identical both engines); the normalizing sum — the one place
    * accumulation order could diverge — is pinned to integer
    * micro-units first (round(√n·1e6), whole-number rounding, the q93
    * rule) and summed exactly; w and the natural share are each one
    * division; the boost factor w/p is one further IEEE division on
    * identical inputs. Shape: token counting is one corpus pass with
    * map-side partials into |sources| rows; everything after is
    * constant-size (the 1-row totals broadcast back via crossJoin).
    */
  private val q116 = QueryDef(
    "q116_mixture_weights",
    (s, dir) => {
      val src = docs(s, dir)
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .withColumn("su", round(sqrt(col("n_tokens").cast("double"))
          * lit(1e6)).cast("long"))
      val tot = src.agg(sum(col("n_tokens")).as("t_tok"), sum(col("su")).as("t_su"))
      src.crossJoin(broadcast(tot))
        .withColumn("p_natural",
          col("n_tokens").cast("double") / col("t_tok").cast("double"))
        .withColumn("w_alpha",
          col("su").cast("double") / col("t_su").cast("double"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("p_natural"), col("w_alpha"),
          (col("w_alpha") / col("p_natural")).as("boost"))
        .orderBy("source")
    },
    Some("""WITH src AS (SELECT source, count(*) AS n_docs,
          sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
        FROM documents GROUP BY 1),
      su AS (SELECT source, n_docs, n_tokens,
          round(sqrt(n_tokens::DOUBLE) * 1e6)::BIGINT AS su FROM src),
      tot AS (SELECT sum(n_tokens)::BIGINT AS t_tok,
          sum(su)::BIGINT AS t_su FROM su)
      SELECT source, n_docs::BIGINT AS n_docs, n_tokens,
        n_tokens::DOUBLE / t_tok::DOUBLE AS p_natural,
        su::DOUBLE / t_su::DOUBLE AS w_alpha,
        (su::DOUBLE / t_su::DOUBLE)
          / (n_tokens::DOUBLE / t_tok::DOUBLE) AS boost
      FROM su, tot ORDER BY source"""))

  // ---------- q125: per-source term-distribution divergence ------------

  /** Jensen–Shannon divergence between each source's token
    * distribution and the corpus's, over the global top-100 terms
    * plus an OTHER bucket — the vocabulary-level drift alarm beside
    * q109's categorical chi-square and q105's numeric PSI: a source
    * whose common-word profile diverges is machine-generated,
    * off-language, or template text even when its metadata looks
    * fine. JS (not KL) because it is finite even where a source has
    * zero count for a top term. Determinism: shares are single
    * divisions of exact int64 counts; each bucket's
    * ½p·ln(p/m) + ½q·ln(q/m) term (m the mixture mean, the zero
    * cases handled by explicit CASE guards identical in both
    * dialects) is pinned to integer nano-units and summed exactly,
    * one final scale-back division. Shape: ONE corpus tokenize pass
    * into a (source, term) aggregate; the top-100 spine (from the
    * PlanCache'd unigram table, q97's ranking) broadcasts against
    * it; everything downstream is |sources|·101 cells.
    */
  private val q125 = QueryDef(
    "q125_term_divergence",
    (s, dir) => {
      import graft.ops.PlanCache
      import org.apache.spark.sql.expressions.Window
      val toks = docs(s, dir)
        .select(col("source"),
          explode(split(col("text"), " ")).as("w1"))
      val scounts = PlanCache.getOrBuild(s, dir, "q125_scounts")(
        toks.groupBy(col("source"), col("w1")).agg(count(lit(1)).as("c")))
      val uni = PlanCache.getOrBuild(s, dir, "q55_uni")(
        docs(s, dir)
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "w1")))
          .groupBy(col("w1")).agg(count(lit(1)).as("n")))
      // the rank is only a membership cut — TakeOrdered (per-partition
      // top-100 + merge) replaces the former vocab-sized rank window
      val top = uni
        .orderBy(col("n").desc, col("w1")).limit(100)
        .select(col("w1"), col("n"))
      val nTot = uni.agg(sum(col("n")).as("nn"))
      val topTot = top.agg(sum(col("n")).as("n_top"))
      val sTot = scounts.groupBy(col("source")).agg(sum(col("c")).as("ts"))
      val sTop = scounts.join(broadcast(top.select(col("w1"))), "w1")
        .groupBy(col("source"), col("w1")).agg(sum(col("c")).as("cs"))
      // explicit spine so sources missing a top term contribute p=0 rows
      val spine = sTot.select(col("source"), col("ts"))
        .crossJoin(broadcast(top))
      val cells = spine
        .join(sTop, Seq("source", "w1"), "left_outer")
        .select(col("source"), col("ts"),
          coalesce(col("cs"), lit(0L)).as("cs"), col("n").as("cn"))
      val others = sTot.crossJoin(broadcast(topTot)).crossJoin(broadcast(nTot))
        .join(sTop.groupBy(col("source")).agg(sum(col("cs")).as("s_top")),
          Seq("source"), "left_outer")
        .select(col("source"), col("ts"),
          (col("ts") - coalesce(col("s_top"), lit(0L))).as("cs"),
          (col("nn") - col("n_top")).as("cn"))
      val units = cells.unionAll(others)
        .crossJoin(broadcast(nTot))
        .select(col("source"),
          expr("""CASE WHEN cs = 0 AND cn = 0 THEN 0 ELSE
            round((CASE WHEN cs > 0 THEN
              0.5 * (cast(cs AS DOUBLE) / ts)
                * ln((cast(cs AS DOUBLE) / ts)
                  / (0.5 * (cast(cs AS DOUBLE) / ts
                    + cast(cn AS DOUBLE) / nn))) ELSE 0.0 END
            + CASE WHEN cn > 0 THEN
              0.5 * (cast(cn AS DOUBLE) / nn)
                * ln((cast(cn AS DOUBLE) / nn)
                  / (0.5 * (cast(cs AS DOUBLE) / ts
                    + cast(cn AS DOUBLE) / nn))) ELSE 0.0 END) * 1e9)
            END""").cast("long").as("u"))
      units.groupBy(col("source"))
        .agg(count(lit(1)).as("n_buckets"), sum(col("u")).as("su"))
        .select(col("source"), col("n_buckets"),
          (col("su").cast("double") / lit(1e9)).as("js_divergence"))
        .orderBy("source")
    },
    Some("""WITH toks AS (SELECT source,
          unnest(string_split(text, ' ')) AS w1 FROM documents),
      scounts AS (SELECT source, w1, count(*) AS c FROM toks GROUP BY 1, 2),
      uni AS (SELECT w1, sum(c) AS n FROM scounts GROUP BY 1),
      ranked AS (SELECT w1, n, row_number() OVER (ORDER BY n DESC, w1)
          AS rank FROM uni),
      top AS (SELECT w1, n FROM ranked WHERE rank <= 100),
      ntot AS (SELECT sum(n)::BIGINT AS nn FROM uni),
      toptot AS (SELECT sum(n)::BIGINT AS n_top FROM top),
      stot AS (SELECT source, sum(c)::BIGINT AS ts FROM scounts GROUP BY 1),
      stop AS (SELECT source, s.w1, sum(c)::BIGINT AS cs
        FROM scounts s JOIN top ON top.w1 = s.w1 GROUP BY 1, 2),
      spine AS (SELECT source, ts, w1, n FROM stot, top),
      cells AS (SELECT spine.source, ts, coalesce(cs, 0) AS cs,
          n AS cn
        FROM spine LEFT JOIN stop ON stop.source = spine.source
          AND stop.w1 = spine.w1),
      others AS (SELECT stot.source, ts,
          ts - coalesce((SELECT sum(cs) FROM stop
            WHERE stop.source = stot.source), 0) AS cs,
          nn - n_top AS cn
        FROM stot, toptot, ntot),
      units AS (SELECT source,
          CASE WHEN cs = 0 AND cn = 0 THEN 0 ELSE
            round((CASE WHEN cs > 0 THEN
              0.5 * (cast(cs AS DOUBLE) / ts)
                * ln((cast(cs AS DOUBLE) / ts)
                  / (0.5 * (cast(cs AS DOUBLE) / ts
                    + cast(cn AS DOUBLE) / nn))) ELSE 0.0 END
            + CASE WHEN cn > 0 THEN
              0.5 * (cast(cn AS DOUBLE) / nn)
                * ln((cast(cn AS DOUBLE) / nn)
                  / (0.5 * (cast(cs AS DOUBLE) / ts
                    + cast(cn AS DOUBLE) / nn))) ELSE 0.0 END) * 1e9)
            END::BIGINT AS u
        FROM (SELECT * FROM cells UNION ALL SELECT * FROM others), ntot)
      SELECT source, count(*)::BIGINT AS n_buckets,
        sum(u)::DOUBLE / 1e9 AS js_divergence
      FROM units GROUP BY source ORDER BY source"""))

  // ---------- q138: cross-language quality calibration ------------------

  /** Rank-normalized quality: each document's quality score replaced by
    * its percentile WITHIN ITS LANGUAGE — the calibration step that
    * makes one global quality threshold meaningful across languages
    * (raw q14 scores skew by language structure — stopword lists and
    * length norms bite differently — so a global cut silently filters
    * some languages harder; rank-normalizing makes "keep top 60 %"
    * mean the same thing everywhere). The percentile is the explicit
    * (rank−1)/(n−1) formula under a (quality, doc_id) total order —
    * written out rather than the engines' percent_rank() builtins, so
    * the n = 1 edge is pinned by the same CASE on both sides; one
    * exact int division per row, rounded 12. Shape: language is a
    * heavily skewed key (a majority-English corpus puts most docs in
    * ONE window partition), so the default path ranks under the
    * (lang, quality, doc_id) TOTAL order via the RangeNtile
    * boundary-broadcast row_number — ranges are disjoint, so each
    * language occupies a contiguous rank run and the within-language
    * rank is just global_rank − min(global_rank per lang) + 1, with
    * the per-lang (min-rank, count) table broadcast (|langs| rows).
    * Per-shard sorts only; no task ever holds a language's full share.
    * graft.ntile.strategy=window restores the per-language window
    * form the equality spec compares against.
    */
  private val q138 = QueryDef(
    "q138_quality_calibration",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val scored = docs(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tokens", size(col("toks")))
        .withColumn("n_stop",
          expr("size(filter(toks, t -> t IN ('the', 'a', 'of', 'to', 'and')))"))
        .select(col("doc_id"), col("lang"),
          (lit(0.3) * (size(array_distinct(col("toks"))).cast("double")
              / col("n_tokens"))
            + lit(0.2) * (lit(1.0) - col("n_stop").cast("double") / col("n_tokens"))
            + lit(0.2) * (lit(1.0)
              - length(regexp_replace(col("text"), "[a-z ]", ""))
                .cast("double") / length(col("text")))
            + lit(0.3) * least(col("n_tokens").cast("double") / lit(50.0),
              lit(1.0))).as("quality"))
      val ranked =
        if (s.conf.getOption("graft.ntile.strategy").contains("window")) {
          val w = Window.partitionBy(col("lang"))
          scored
            .withColumn("rn", row_number().over(
              w.orderBy(col("quality"), col("doc_id"))).cast("long"))
            .withColumn("n", count(lit(1)).over(w))
        } else {
          val g = RangeNtile.withRowNumber(scored,
            Seq(col("lang"), col("quality"), col("doc_id")), "grn")
          val perLang = g.groupBy(col("lang"))
            .agg(min(col("grn")).as("g0"), count(lit(1)).as("n"))
          g.join(broadcast(perLang), "lang")
            .withColumn("rn", col("grn") - col("g0") + lit(1L))
        }
      ranked
        .select(col("doc_id"), col("lang"), col("quality"),
          when(col("n") === 1, lit(0.0))
            .otherwise(round((col("rn") - 1).cast("double")
              / (col("n") - 1).cast("double"), 12)).as("cal_rank"))
        .orderBy("doc_id")
    },
    Some("""WITH scored AS (SELECT doc_id, lang,
          0.3 * (cast(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / len(string_split(text, ' ')))
          + 0.2 * (1.0 - cast(len(list_filter(string_split(text, ' '),
              t -> t IN ('the', 'a', 'of', 'to', 'and'))) AS DOUBLE)
            / len(string_split(text, ' ')))
          + 0.2 * (1.0
            - cast(length(regexp_replace(text, '[a-z ]', '', 'g')) AS DOUBLE)
              / length(text))
          + 0.3 * least(cast(len(string_split(text, ' ')) AS DOUBLE) / 50.0,
            1.0) AS quality
        FROM documents),
      ranked AS (SELECT doc_id, lang, quality,
          row_number() OVER (PARTITION BY lang
            ORDER BY quality, doc_id) AS rn,
          count(*) OVER (PARTITION BY lang) AS n
        FROM scored)
      SELECT doc_id, lang, quality,
        CASE WHEN n = 1 THEN 0.0
          ELSE round((rn - 1)::DOUBLE / (n - 1)::DOUBLE, 12) END
          AS cal_rank
      FROM ranked ORDER BY doc_id"""))

  // ---------- q139: corpus datasheet -----------------------------------

  /** The one-row corpus summary a dataset card leads with: volume
    * (docs, tokens), diversity (languages, sources), duplication (docs
    * in ≥ 0.8-Jaccard clusters, clusters, removable docs under any
    * keep-one policy), and central quality — every number pulled from
    * subplans other registry queries already materialize (PlanCache'd
    * cc labels; one token/quality corpus pass), composed as 1-row
    * aggregates crossJoined together. Mean quality is pinned to
    * integer micro-units before the sum (q112's rule); every other
    * field is an exact count. The point of the operator is the
    * composition: the datasheet costs one corpus pass plus
    * already-shared materializations, so it can run per release at
    * any scale.
    */
  private val q139 = QueryDef(
    "q139_corpus_datasheet",
    (s, dir) => {
      val base = docs(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tokens", size(col("toks")))
        .withColumn("n_stop",
          expr("size(filter(toks, t -> t IN ('the', 'a', 'of', 'to', 'and')))"))
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_tokens").cast("long").as("n_toks"),
          (lit(0.3) * (size(array_distinct(col("toks"))).cast("double")
              / col("n_tokens"))
            + lit(0.2) * (lit(1.0) - col("n_stop").cast("double") / col("n_tokens"))
            + lit(0.2) * (lit(1.0)
              - length(regexp_replace(col("text"), "[a-z ]", ""))
                .cast("double") / length(col("text")))
            + lit(0.3) * least(col("n_tokens").cast("double") / lit(50.0),
              lit(1.0))).as("quality"))
      val vol = base.agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        (sum(round(col("quality") * lit(1e6)).cast("long")).cast("double")
          / lit(1e6) / count(lit(1))).as("mean_quality"))
      val cc = Dedup.ccLabels(s, dir, 0.8)
      val dup = cc.agg(count(lit(1)).as("n_clustered_docs"),
        countDistinct(col("component")).as("n_clusters"),
        sum(when(col("node") =!= col("component"), 1L).otherwise(0L))
          .as("n_removable"))
      vol.crossJoin(broadcast(dup))
        .select(col("n_docs"), col("n_tokens"), col("n_langs"),
          col("n_sources"), col("mean_quality"), col("n_clustered_docs"),
          col("n_clusters"), col("n_removable"),
          (col("n_removable").cast("double") / col("n_docs"))
            .as("removable_share"))
    },
    Some(s"""WITH RECURSIVE ${Dedup.jaccardPairsDuckCte(0.8)},
      edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL SELECT doc_b AS u, doc_a AS v FROM pairs),
      reach(u, l) AS (
        SELECT u, u AS l FROM (SELECT DISTINCT u FROM edges) t
        UNION
        SELECT e.u, r.l FROM edges e JOIN reach r ON r.u = e.v),
      comp AS (SELECT u AS doc_id, min(l) AS component
        FROM reach GROUP BY u),
      dup AS (SELECT count(*) AS n_clustered_docs,
          count(DISTINCT component) AS n_clusters,
          sum(CASE WHEN doc_id <> component THEN 1 ELSE 0 END)
            AS n_removable
        FROM comp),
      scored AS (SELECT doc_id, lang, source,
          len(string_split(text, ' '))::BIGINT AS n_toks,
          0.3 * (cast(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / len(string_split(text, ' ')))
          + 0.2 * (1.0 - cast(len(list_filter(string_split(text, ' '),
              t -> t IN ('the', 'a', 'of', 'to', 'and'))) AS DOUBLE)
            / len(string_split(text, ' ')))
          + 0.2 * (1.0
            - cast(length(regexp_replace(text, '[a-z ]', '', 'g')) AS DOUBLE)
              / length(text))
          + 0.3 * least(cast(len(string_split(text, ' ')) AS DOUBLE) / 50.0,
            1.0) AS quality
        FROM documents),
      vol AS (SELECT count(*) AS n_docs, sum(n_toks)::BIGINT AS n_tokens,
          count(DISTINCT lang) AS n_langs,
          count(DISTINCT source) AS n_sources,
          sum(round(quality * 1e6)::BIGINT)::DOUBLE / 1e6 / count(*)
            AS mean_quality
        FROM scored)
      SELECT n_docs::BIGINT AS n_docs, n_tokens,
        n_langs::BIGINT AS n_langs, n_sources::BIGINT AS n_sources,
        mean_quality, n_clustered_docs::BIGINT AS n_clustered_docs,
        n_clusters::BIGINT AS n_clusters, n_removable::BIGINT AS n_removable,
        n_removable::DOUBLE / n_docs AS removable_share
      FROM vol, dup"""))

  // ---------- q149: quality-ordered token budget curve -------------------

  /** "If we keep only the best X % of documents, how many training
    * tokens do we get?" — the curation planning curve, as quality
    * deciles (ntile(10) under a (quality DESC, doc_id) total order —
    * decile 1 = best) with per-decile and CUMULATIVE token counts and
    * the cumulative share of the corpus budget. This is the table a
    * data lead reads to set the q138-calibrated cut: the knee where
    * cumulative tokens flatten is where stricter filtering stops
    * costing budget. Quality is q14's exact chain; token counts exact
    * int64; the running sum is a 10-row window; shares are one
    * division per row. Shape: one corpus pass, then the two-pass
    * quantile-boundary-broadcast ntile (RangeNtile, per-shard sorts
    * only — the default; see below), then 10-row arithmetic.
    */
  private val q149 = QueryDef(
    "q149_quality_budget_curve",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val scored = docs(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tokens", size(col("toks")))
        .withColumn("n_stop",
          expr("size(filter(toks, t -> t IN ('the', 'a', 'of', 'to', 'and')))"))
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_toks"),
          (lit(0.3) * (size(array_distinct(col("toks"))).cast("double")
              / col("n_tokens"))
            + lit(0.2) * (lit(1.0) - col("n_stop").cast("double") / col("n_tokens"))
            + lit(0.2) * (lit(1.0)
              - length(regexp_replace(col("text"), "[a-z ]", ""))
                .cast("double") / length(col("text")))
            + lit(0.3) * least(col("n_tokens").cast("double") / lit(50.0),
              lit(1.0))).as("quality"))
      // The global ntile runs the two-pass quantile-boundary broadcast
      // (RangeNtile — per-shard sorts only) BY DEFAULT: the window form
      // collapses the corpus onto one task, which is fine for DuckDB's
      // oracle run and fatal at 100 TB. graft.ntile.strategy=window
      // restores the window form; RangeNtileSpec proves the two produce
      // bit-identical labels, so the choice is pure plan shape.
      val sortKey = Seq(col("quality").desc, col("doc_id"))
      val labeled =
        if (s.conf.getOption("graft.ntile.strategy").contains("window"))
          scored.withColumn("decile",
            ntile(10).over(Window.orderBy(sortKey: _*)).cast("long"))
        else RangeNtile.withNtile(scored, sortKey, 10, "decile")
      val deciled = labeled
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      val tot = deciled.agg(sum(col("n_tokens")).as("t"))
      deciled
        .withColumn("cum_tokens", sum(col("n_tokens")).over(
          Window.orderBy(col("decile"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(tot))
        .select(col("decile"), col("n_docs"), col("n_tokens"),
          col("cum_tokens"),
          (col("cum_tokens").cast("double") / col("t")).as("cum_share"))
        .orderBy("decile")
    },
    Some("""WITH scored AS (SELECT doc_id,
          len(string_split(text, ' '))::BIGINT AS n_toks,
          0.3 * (cast(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / len(string_split(text, ' ')))
          + 0.2 * (1.0 - cast(len(list_filter(string_split(text, ' '),
              t -> t IN ('the', 'a', 'of', 'to', 'and'))) AS DOUBLE)
            / len(string_split(text, ' ')))
          + 0.2 * (1.0
            - cast(length(regexp_replace(text, '[a-z ]', '', 'g')) AS DOUBLE)
              / length(text))
          + 0.3 * least(cast(len(string_split(text, ' ')) AS DOUBLE) / 50.0,
            1.0) AS quality
        FROM documents),
      deciled AS (SELECT ntile(10) OVER (ORDER BY quality DESC, doc_id)
          AS decile, n_toks
        FROM scored),
      agg AS (SELECT decile, count(*) AS n_docs,
          sum(n_toks)::BIGINT AS n_tokens
        FROM deciled GROUP BY 1),
      tot AS (SELECT sum(n_tokens)::BIGINT AS t FROM agg)
      SELECT decile::BIGINT AS decile, n_docs::BIGINT AS n_docs, n_tokens,
        (sum(n_tokens) OVER (ORDER BY decile
          ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_tokens,
        (sum(n_tokens) OVER (ORDER BY decile
          ROWS UNBOUNDED PRECEDING))::DOUBLE / t AS cum_share
      FROM agg, tot ORDER BY decile"""))

  // ---------- q168: mutual information (lang × source) -----------------

  /** Mutual information (and normalized MI) between language and
    * source — the information-theoretic twin of q109's χ²: how many
    * nats knowing the source tells you about the language. The same
    * margins/cells plan as q109 with the same exactness rule: each
    * cell's (o/N)·ln(oN/(rn·cn)) term — and each margin's entropy
    * term — is pinned to integer pico-units before summing (terms ≤
    * ln 25 ≈ 3, so 1e12 scaling stays far inside int64; the rn·cn
    * products share q109's ≤2^62 doc-count bound). NMI divides the
    * three exact sums once at the end. Shape: one corpus aggregate,
    * margin re-aggregates over the tiny cell table, broadcast joins.
    */
  private val q168 = QueryDef(
    "q168_mutual_information",
    (s, dir) => {
      val cells = docs(s, dir)
        .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("o"))
      val rows_ = cells.groupBy(col("lang")).agg(sum(col("o")).as("rn"))
      val cols_ = cells.groupBy(col("source")).agg(sum(col("o")).as("cn"))
      val n1 = cells.agg(sum(col("o")).as("n"))
      val miU = cells
        .join(broadcast(rows_), "lang").join(broadcast(cols_), "source")
        .crossJoin(broadcast(n1))
        .select(round(log((col("o") * col("n")).cast("double")
            / (col("rn") * col("cn")))
          * col("o") / col("n") * lit(1e12)).cast("long").as("u"))
        .agg(sum(col("u")).as("mi_u"))
      val hlU = rows_.crossJoin(broadcast(n1))
        .select(round(-log(col("rn").cast("double") / col("n"))
          * col("rn") / col("n") * lit(1e12)).cast("long").as("u"))
        .agg(sum(col("u")).as("hl_u"))
      val hsU = cols_.crossJoin(broadcast(n1))
        .select(round(-log(col("cn").cast("double") / col("n"))
          * col("cn") / col("n") * lit(1e12)).cast("long").as("u"))
        .agg(sum(col("u")).as("hs_u"))
      miU.crossJoin(hlU).crossJoin(hsU)
        .select((col("mi_u").cast("double") / 1e12).as("mi"),
          (col("hl_u").cast("double") / 1e12).as("h_lang"),
          (col("hs_u").cast("double") / 1e12).as("h_source"),
          round(col("mi_u").cast("double")
            / sqrt(col("hl_u").cast("double") * col("hs_u")), 12)
            .as("nmi"))
    },
    Some("""WITH cells AS (SELECT lang, source, count(*) AS o
        FROM documents GROUP BY 1, 2),
      r AS (SELECT lang, sum(o) AS rn FROM cells GROUP BY 1),
      c AS (SELECT source, sum(o) AS cn FROM cells GROUP BY 1),
      n1 AS (SELECT sum(o) AS n FROM cells),
      mi AS (SELECT sum(round(ln((o * n)::DOUBLE / (rn * cn))
          * o / n * 1e12)::BIGINT) AS mi_u
        FROM cells JOIN r USING (lang) JOIN c USING (source), n1),
      hl AS (SELECT sum(round(-ln(rn::DOUBLE / n)
          * rn / n * 1e12)::BIGINT) AS hl_u FROM r, n1),
      hs AS (SELECT sum(round(-ln(cn::DOUBLE / n)
          * cn / n * 1e12)::BIGINT) AS hs_u FROM c, n1)
      SELECT mi_u::DOUBLE / 1e12 AS mi,
        hl_u::DOUBLE / 1e12 AS h_lang,
        hs_u::DOUBLE / 1e12 AS h_source,
        round(mi_u::DOUBLE / sqrt(hl_u::DOUBLE * hs_u), 12) AS nmi
      FROM mi, hl, hs"""))

  // ---------- q170: Mann–Whitney AUC ------------------------------------

  /** Rank-sum AUC: how well does document length separate English from
    * non-English — the evaluation primitive for ANY scalar quality
    * signal against ANY binary label, computed the scale-correct way:
    * AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺n⁻) from tie-corrected rank sums,
    * never a pairwise O(n²) comparison. Ranks come from ONE window
    * pass over the DISTINCT-score table (≤ |score domain| rows, not
    * corpus rows; explicit ROWS frame both engines) with midrank tie
    * handling held in integers by doubling: r₂ = 2·cumBefore + n + 1,
    * so every quantity up to the single final division is exact int64
    * (Σ n⁺·r₂ ≤ 2N² — the same ≤2^62 doc bound q109 documents).
    */
  private val q170 = QueryDef(
    "q170_rank_auc",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val g = docs(s, dir)
        .groupBy(col("n_chars").as("sc"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("np"))
      val w = Window.orderBy(col("sc"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranked = g
        .withColumn("cum", sum(col("n")).over(w) - col("n"))
        .withColumn("r2", lit(2L) * col("cum") + col("n") + 1L)
      ranked.agg(sum(col("np")).as("n_pos"),
          (sum(col("n")) - sum(col("np"))).as("n_neg"),
          sum(col("np") * col("r2")).as("sr2"))
        .select(col("n_pos"), col("n_neg"),
          round((col("sr2").cast("double") / 2
            - col("n_pos").cast("double") * (col("n_pos") + 1) / 2)
            / (col("n_pos").cast("double") * col("n_neg")), 12)
            .as("auc"))
    },
    Some("""WITH g AS (SELECT n_chars AS sc, count(*) AS n,
          sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS np
        FROM documents GROUP BY 1),
      ranked AS (SELECT np, n,
          2 * (sum(n) OVER (ORDER BY sc
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n)
            + n + 1 AS r2
        FROM g)
      SELECT sum(np)::BIGINT AS n_pos,
        (sum(n) - sum(np))::BIGINT AS n_neg,
        round((sum(np * r2)::DOUBLE / 2
          - sum(np)::DOUBLE * (sum(np) + 1) / 2)
          / (sum(np)::DOUBLE * (sum(n) - sum(np))), 12) AS auc
      FROM ranked"""))

  // ---------- q172: held-out unigram perplexity -------------------------

  /** Per-source perplexity of the TEST split under an add-one-smoothed
    * unigram LM fit on the TRAIN split (q37's pure-hash assignment, so
    * train/test membership is identical in both engines) — the cheapest
    * LM-based quality signal a data pipeline can compute without a
    * model: sources whose held-out text the corpus's own unigram
    * distribution can't predict are off-distribution (boilerplate,
    * wrong language, machine noise). Per-token negative log-likelihood
    * −ln((c+1)/(N+V)) is computed as one `ln` of a single double
    * division of exact int64 counts (identical inputs → identical IEEE
    * result, the q119/q125 precedent), pinned to nano-units and summed
    * exactly; perplexity is one final `exp`, rounded to 6 decimals
    * because JVM and DuckDB libm exp() differ in the last ulp even on
    * identical inputs (observed at sf0.01). Shape: train counts are
    * ONE pass over the 80 % split into a |vocab| aggregate; test tokens
    * (10 %) LEFT-join it on the term key — a shuffle join, deliberately
    * not a broadcast, because at 100 TB the vocab table is
    * executor-sized, not driver-sized; OOV tokens fall through the
    * join to the smoothing floor (c=0), so no vocab scan is ever
    * corpus-sized.
    */
  /** Unigram counts of the q37 TRAIN split — the smoothed-LM fit table
    * shared by q172 (held-out perplexity) and q225 (CCNet terciles),
    * materialized once per run. |vocab|-sized.
    */
  private[ops] def trainUnigram(s: SparkSession, dir: String): DataFrame =
    PlanCache.getOrBuild(s, dir, "train_unigram")(
      docs(s, dir)
        .select(col("doc_id"), expr(Portable.splitCaseSpark).as("split"),
          explode(split(col("text"), " ")).as("w"))
        .where(col("split") === "train")
        .groupBy(col("w")).agg(count(lit(1)).as("c")))

  private val q172 = QueryDef(
    "q172_heldout_perplexity",
    (s, dir) => {
      val toks = docs(s, dir)
        .select(col("doc_id"), col("source"),
          expr(Portable.splitCaseSpark).as("split"),
          explode(split(col("text"), " ")).as("w"))
      val tr = trainUnigram(s, dir)
      val trs = tr.agg(sum(col("c")).as("n_train"), count(lit(1)).as("v"))
      toks.where(col("split") === "test")
        .join(tr, Seq("w"), "left")
        .crossJoin(broadcast(trs))
        .select(col("doc_id"), col("source"),
          expr("""CAST(round(ln(CAST(n_train + v AS DOUBLE)
            / (coalesce(c, 0L) + 1)) * 1e9) AS BIGINT)""").as("nlp_nano"))
        .groupBy(col("source"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_tokens"), sum(col("nlp_nano")).as("s_nano"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          (col("s_nano").cast("double") / col("n_tokens").cast("double")
            / 1e9).as("avg_nll"),
          round(exp(col("s_nano").cast("double")
            / col("n_tokens").cast("double") / 1e9), 6).as("perplexity"))
        .orderBy("source")
    },
    Some(s"""WITH toks AS (SELECT doc_id, source,
          ${Portable.splitCaseDuck} AS split,
          unnest(string_split(text, ' ')) AS w FROM documents),
      tr AS (SELECT w, count(*) AS c FROM toks
        WHERE split = 'train' GROUP BY 1),
      trs AS (SELECT sum(c)::BIGINT AS n_train, count(*) AS v FROM tr),
      sc AS (SELECT t.doc_id, t.source,
          round(ln((n_train + v)::DOUBLE / (coalesce(c, 0) + 1))
            * 1e9)::BIGINT AS nlp_nano
        FROM toks t LEFT JOIN tr USING (w), trs
        WHERE t.split = 'test')
      SELECT source, count(DISTINCT doc_id) AS n_docs,
        count(*) AS n_tokens,
        sum(nlp_nano)::DOUBLE / count(*)::DOUBLE / 1e9 AS avg_nll,
        round(exp(sum(nlp_nano)::DOUBLE / count(*)::DOUBLE / 1e9), 6)
          AS perplexity
      FROM sc GROUP BY 1 ORDER BY source"""))

  // ---------- q173: mixture-sample apply --------------------------------

  /** The APPLY twin of q116: turn the temperature-α=0.5 mixture weights
    * into an actual deterministic document sample under a token budget
    * B = half the corpus. Per-source accept rate r = min(1, w·B/tokens)
    * (the expected-token-matching rate), quantized to integer
    * micro-units; a document survives iff h32('mix_'‖doc_id) mod 1e6
    * < r_micro — the q37 pure-hash sampling contract, so membership is
    * a stable function of the id (adding documents never resamples
    * existing ones, the property that makes incremental re-mixes
    * cheap). The float chain for r is the same parenthesized
    * (su/t_su)·B/tokens in both dialects on exact int64 inputs.
    * Shape: two corpus passes (count, then filter+count), with the
    * |sources|-row rate table broadcast to the second; achieved shares
    * are ratios against a 1-row broadcast total. Upweighted small
    * sources saturate at r=1 (can't sample more than exists) — the
    * achieved-vs-target gap this query exists to report.
    */
  private val q173 = QueryDef(
    "q173_mixture_sample",
    (s, dir) => {
      val perDoc = docs(s, dir)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          expr(s"${Portable.h32Spark("concat('mix_', doc_id)")} % 1000000")
            .as("u"))
      val src = perDoc.groupBy(col("source"))
        .agg(sum(col("n_tok")).as("n_tokens"))
        .withColumn("su", expr(
          "CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT)"))
      val tot = src.agg(sum(col("n_tokens")).as("t_tok"),
        sum(col("su")).as("t_su"))
      val rates = src.crossJoin(broadcast(tot))
        .select(col("source"),
          (col("su").cast("double") / col("t_su").cast("double"))
            .as("w_alpha"),
          expr("""CAST(round(least(1.0d,
            CAST(su AS DOUBLE) / CAST(t_su AS DOUBLE)
              * CAST(t_tok div 2 AS DOUBLE) / CAST(n_tokens AS DOUBLE))
            * 1e6) AS BIGINT)""").as("r_micro"))
      val kept = perDoc
        .join(broadcast(rates), "source")
        .where(col("u") < col("r_micro"))
        .groupBy(col("source"), col("w_alpha"), col("r_micro"))
        .agg(count(lit(1)).as("n_kept_docs"),
          sum(col("n_tok")).as("kept_tokens"))
      val ktot = kept.agg(sum(col("kept_tokens")).as("t_kept"))
      kept.crossJoin(broadcast(ktot))
        .select(col("source"), col("w_alpha"),
          (col("r_micro").cast("double") / 1e6).as("accept_rate"),
          col("n_kept_docs"), col("kept_tokens"),
          (col("kept_tokens").cast("double") / col("t_kept").cast("double"))
            .as("achieved_share"))
        .orderBy("source")
    },
    Some(s"""WITH per AS (SELECT doc_id, source,
          len(string_split(text, ' '))::BIGINT AS n_tok,
          ${Portable.h32Duck("'mix_' || doc_id")} % 1000000 AS u
        FROM documents),
      src AS (SELECT source, sum(n_tok)::BIGINT AS n_tokens FROM per
        GROUP BY 1),
      su AS (SELECT source, n_tokens,
          round(sqrt(n_tokens::DOUBLE) * 1e6)::BIGINT AS su FROM src),
      tot AS (SELECT sum(n_tokens)::BIGINT AS t_tok,
          sum(su)::BIGINT AS t_su FROM su),
      rates AS (SELECT source, su::DOUBLE / t_su::DOUBLE AS w_alpha,
          round(least(1.0::DOUBLE, su::DOUBLE / t_su::DOUBLE
            * (t_tok // 2)::DOUBLE / n_tokens::DOUBLE) * 1e6)::BIGINT
            AS r_micro
        FROM su, tot),
      kept AS (SELECT p.source, r.w_alpha, r.r_micro,
          count(*) AS n_kept_docs, sum(p.n_tok)::BIGINT AS kept_tokens
        FROM per p JOIN rates r USING (source)
        WHERE p.u < r.r_micro GROUP BY 1, 2, 3),
      ktot AS (SELECT sum(kept_tokens)::BIGINT AS t_kept FROM kept)
      SELECT source, w_alpha, r_micro::DOUBLE / 1e6 AS accept_rate,
        n_kept_docs, kept_tokens,
        kept_tokens::DOUBLE / t_kept::DOUBLE AS achieved_share
      FROM kept, ktot ORDER BY source"""))

  // ---------- q183: decontamination APPLY -----------------------------

  /** The apply twin of q44's contamination detect, pointed the
    * direction a pretraining build actually enforces: drop TRAIN
    * documents more than half of whose trigrams appear in the
    * benchmark set (doc_id < 10 stands in for the eval suite), and
    * report kept/dropped docs and tokens per source. The benchmark
    * shingle set is |eval|-sized — BROADCAST to the corpus posting
    * scan, so the whole decision is one pass over postings plus a
    * |docs|-row aggregate; the threshold compare is exact integer
    * (2·hits > shingles), no float. Docs too short to shingle fall
    * through the left join as kept. At 100 TB this is the shape that
    * matters: eval suites are MBs, the corpus is the only big side,
    * and it is touched exactly once.
    */
  private val q183 = QueryDef(
    "q183_decontaminate_apply",
    (s, dir) => {
      val inv = Dedup.persistedInverted(s, dir)
      val benchSh = broadcast(inv.where(col("doc_id") < NBench)
        .select(col("h")).distinct().withColumn("in_bench", lit(1)))
      val cov = inv.where(col("doc_id") >= NBench)
        .join(benchSh, Seq("h"), "left_outer")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sh"),
          sum(coalesce(col("in_bench"), lit(0))).as("n_hit"))
        .select(col("doc_id"),
          (col("n_hit") * 2 > col("n_sh")).cast("int").as("dropped"))
      docs(s, dir).where(col("doc_id") >= NBench)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .join(cov, Seq("doc_id"), "left_outer")
        .withColumn("dr", coalesce(col("dropped"), lit(0)))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("dr")).as("n_dropped"),
          sum(expr("CASE WHEN dr = 0 THEN n_tok ELSE 0L END"))
            .as("kept_tokens"),
          sum(expr("CASE WHEN dr = 1 THEN n_tok ELSE 0L END"))
            .as("dropped_tokens"))
        .orderBy("source")
    },
    Some(s"""WITH ${Dedup.shingledDuckCte},
      bench_sh AS (SELECT DISTINCT h FROM inv WHERE doc_id < $NBench),
      cov AS (SELECT i.doc_id,
          CASE WHEN 2 * sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END)
            > count(*) THEN 1 ELSE 0 END AS dropped
        FROM inv i LEFT JOIN bench_sh b ON i.h = b.h
        WHERE i.doc_id >= $NBench GROUP BY 1)
      SELECT source, count(*) AS n_docs,
        sum(coalesce(dropped, 0))::BIGINT AS n_dropped,
        sum(CASE WHEN coalesce(dropped, 0) = 0
          THEN len(string_split(text, ' ')) ELSE 0 END)::BIGINT
          AS kept_tokens,
        sum(CASE WHEN coalesce(dropped, 0) = 1
          THEN len(string_split(text, ' ')) ELSE 0 END)::BIGINT
          AS dropped_tokens
      FROM documents d LEFT JOIN cov USING (doc_id)
      WHERE d.doc_id >= $NBench
      GROUP BY 1 ORDER BY source"""))

  // ---------- q216: l-diversity audit ---------------------------------

  /** l-diversity of the sensitive attribute (lang) within each
    * (source, length-bucket) quasi-identifier cell — the privacy gate
    * BEHIND q101's k-anonymity (Machanavajjhala et al. 2007): a cell
    * can hold ≥ k documents yet still leak, because if all of them
    * share one language, knowing a document is in the cell reveals its
    * language. Emits cells whose distinct-language count l < 3, with
    * the dominant language and its share (exact-int division —
    * identical IEEE result both engines). Dominant-language argmax is
    * `max(struct(cnt, lang))` — ONE hash aggregate over the
    * (cell, lang) table, the q211 encoding, with the struct order as
    * the deterministic tiebreak. Shape: one corpus aggregate to
    * ≤ cells×langs rows; everything after is cell-table-sized — like
    * q101 this must run at full scale because rare cells are invisible
    * in samples.
    */
  private val DiversityL = 3L

  private val q216 = QueryDef(
    "q216_l_diversity",
    (s, dir) => {
      val cellLang = docs(s, dir)
        .groupBy(col("source"), expr("n_chars div 500").as("len_bucket"),
          col("lang"))
        .agg(count(lit(1)).as("cnt"))
      cellLang
        .groupBy(col("source"), col("len_bucket"))
        .agg(sum(col("cnt")).as("n_docs"),
          count(lit(1)).as("l_distinct"),
          max(struct(col("cnt"), col("lang"))).as("top"))
        .where(col("l_distinct") < DiversityL)
        .select(col("source"), col("len_bucket"), col("n_docs"),
          col("l_distinct"), col("top.lang").as("top_lang"),
          (col("top.cnt").cast("double") / col("n_docs").cast("double"))
            .as("top_share"))
        .orderBy("source", "len_bucket")
    },
    Some(s"""WITH cl AS (SELECT source, n_chars // 500 AS len_bucket,
        lang, count(*) AS cnt
        FROM documents GROUP BY 1, 2, 3),
      cell AS (SELECT source, len_bucket, sum(cnt) AS n_docs,
          count(*) AS l_distinct,
          max(struct_pack(cnt := cnt, lang := lang)) AS top
        FROM cl GROUP BY 1, 2)
      SELECT source, len_bucket, n_docs::BIGINT AS n_docs,
        l_distinct::BIGINT AS l_distinct,
        top.lang AS top_lang,
        top.cnt::DOUBLE / n_docs::DOUBLE AS top_share
      FROM cell WHERE l_distinct < $DiversityL
      ORDER BY source, len_bucket"""))

  // ---------- q225: CCNet-style perplexity terciles -------------------

  /** Every document scored by the train-split unigram LM (per-token
    * smoothed NLL, q172's exact formula) and bucketed into perplexity
    * terciles WITHIN its language — the CCNet head/middle/tail split
    * (Wenzek et al. 2020), the published curation scheme that keeps
    * "head" text and drops or downweights "tail". Per-doc mean NLL is
    * the exact nano-unit sum divided once and re-pinned to int64, so
    * both engines rank identical keys; the tercile is ntile(3) under a
    * (mean, doc_id) total order per language. Shape: the LM table is
    * the PlanCache'd [[trainUnigram]] (shared with q172), scoring is
    * one posting-scale shuffle join (the q172 vocab-is-executor-sized
    * rule), the window sorts |docs-per-lang| rows — at 100 TB the
    * tercile switches to the q149 boundary-broadcast two-pass like
    * every other global-rank consumer. Output: |langs|×3 rows.
    */
  private val q225 = QueryDef(
    "q225_ccnet_buckets",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = docs(s, dir)
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("w"))
      val tr = trainUnigram(s, dir)
      val trs = tr.agg(sum(col("c")).as("n_train"), count(lit(1)).as("v"))
      val perDoc = toks
        .join(tr, Seq("w"), "left")
        .crossJoin(broadcast(trs))
        .select(col("doc_id"), col("lang"),
          expr("""CAST(round(ln(CAST(n_train + v AS DOUBLE)
            / (coalesce(c, 0L) + 1)) * 1e9) AS BIGINT)""").as("nlp_nano"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_tok"), sum(col("nlp_nano")).as("s_nano"))
        .select(col("doc_id"), col("lang"), col("n_tok"),
          expr("CAST(round(CAST(s_nano AS DOUBLE) / n_tok) AS BIGINT)")
            .as("mean_nano"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("mean_nano"), col("doc_id"))
      perDoc
        .withColumn("bucket", ntile(3).over(w))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .orderBy("lang", "bucket")
    },
    Some(s"""WITH toks AS (SELECT doc_id, lang,
          unnest(string_split(text, ' ')) AS w FROM documents),
      trt AS (SELECT doc_id, ${Portable.splitCaseDuck} AS split,
          unnest(string_split(text, ' ')) AS w FROM documents),
      tr AS (SELECT w, count(*) AS c FROM trt
        WHERE split = 'train' GROUP BY 1),
      trs AS (SELECT sum(c)::BIGINT AS n_train, count(*) AS v FROM tr),
      pd AS (SELECT t.doc_id, t.lang, count(*) AS n_tok,
          sum(round(ln((n_train + v)::DOUBLE / (coalesce(c, 0) + 1))
            * 1e9)::BIGINT) AS s_nano
        FROM toks t LEFT JOIN tr USING (w), trs GROUP BY 1, 2),
      bk AS (SELECT lang, n_tok,
          ntile(3) OVER (PARTITION BY lang
            ORDER BY round(s_nano::DOUBLE / n_tok)::BIGINT, doc_id)
            AS bucket
        FROM pd)
      SELECT lang, bucket, count(*)::BIGINT AS n_docs,
        sum(n_tok)::BIGINT AS n_tokens
      FROM bk GROUP BY 1, 2 ORDER BY lang, bucket"""))

  // ---------- q249: DoReMi-style domain reweighting step ----------------

  /** One mirror-descent step of DoReMi domain reweighting (Xie et al.
    * 2023): each source's mixture weight is its token share boosted by
    * exp(η·excess_loss) with η = 1, where excess loss is the source's
    * held-out avg NLL (q172's model — same cached train-unigram LM,
    * same test split, can't drift) minus the corpus-wide average, then
    * renormalized. Sources the reference LM predicts WORSE than
    * average get upweighted — DoReMi's "train more where the proxy
    * struggles" signal — and well-predicted boilerplate gets cut.
    * Determinism: per-source and global avg NLL pin to integer
    * nano-units BEFORE the subtraction (exact int64 excess); the exp
    * boost rounds to integer micro-units (JVM/DuckDB libm exp differ
    * in the last ulp — q172's rule); the unnormalized weight is then
    * an exact int64 product (token count × micro-boost; at 100 TB
    * widen to DECIMAL(38,0) — same contract) and the normalization is
    * one identical double division of exact integers. Shape: one
    * corpus pass for token counts, the q172 scoring join for losses,
    * then |sources|-row arithmetic with 1-row broadcast totals.
    */
  private val q249 = QueryDef(
    "q249_doremi_step",
    (s, dir) => {
      val toks = docs(s, dir)
        .select(col("doc_id"), col("source"),
          expr(Portable.splitCaseSpark).as("split"),
          explode(split(col("text"), " ")).as("w"))
      val tr = trainUnigram(s, dir)
      val trs = tr.agg(sum(col("c")).as("n_train"), count(lit(1)).as("v"))
      val loss = toks.where(col("split") === "test")
        .join(tr, Seq("w"), "left")
        .crossJoin(broadcast(trs))
        .select(col("source"),
          expr("""CAST(round(ln(CAST(n_train + v AS DOUBLE)
            / (coalesce(c, 0L) + 1)) * 1e9) AS BIGINT)""").as("nlp_nano"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_test_tokens"),
          sum(col("nlp_nano")).as("s_nano"))
        .withColumn("avg_nano",
          expr("CAST(round(CAST(s_nano AS DOUBLE) " +
            "/ CAST(n_test_tokens AS DOUBLE)) AS BIGINT)"))
      val glob = loss.agg(sum(col("s_nano")).as("g_nano"),
          sum(col("n_test_tokens")).as("g_tokens"))
        .select(expr("CAST(round(CAST(g_nano AS DOUBLE) " +
          "/ CAST(g_tokens AS DOUBLE)) AS BIGINT)").as("gavg_nano"))
      val sizes = docs(s, dir)
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .groupBy(col("source")).agg(sum(col("n_tok")).as("n_tokens"))
      val pre = sizes.join(loss, "source").crossJoin(broadcast(glob))
        .select(col("source"), col("n_tokens"), col("avg_nano"),
          col("gavg_nano"),
          (col("n_tokens") * expr("""CAST(round(
            exp(CAST(avg_nano - gavg_nano AS DOUBLE) / 1e9) * 1e6)
            AS BIGINT)""")).as("pre"))
      val tot = pre.agg(sum(col("pre")).as("t_pre"),
        sum(col("n_tokens")).as("t_tok"))
      pre.crossJoin(broadcast(tot))
        .select(col("source"), col("n_tokens"),
          (col("n_tokens").cast("double") / col("t_tok").cast("double"))
            .as("base_share"),
          (col("avg_nano").cast("double") / lit(1e9)).as("avg_nll"),
          ((col("avg_nano") - col("gavg_nano")).cast("double") / lit(1e9))
            .as("excess_nll"),
          (col("pre").cast("double") / col("t_pre").cast("double"))
            .as("new_weight"))
        .orderBy("source")
    },
    Some(s"""WITH toks AS (SELECT doc_id, source,
          ${Portable.splitCaseDuck} AS split,
          unnest(string_split(text, ' ')) AS w FROM documents),
      tr AS (SELECT w, count(*) AS c FROM toks
        WHERE split = 'train' GROUP BY 1),
      trs AS (SELECT sum(c)::BIGINT AS n_train, count(*) AS v FROM tr),
      loss AS (SELECT source, count(*) AS n_test_tokens,
          sum(round(ln((n_train + v)::DOUBLE / (coalesce(c, 0) + 1))
            * 1e9)::BIGINT) AS s_nano
        FROM toks t LEFT JOIN tr USING (w), trs
        WHERE t.split = 'test' GROUP BY 1),
      lavg AS (SELECT source, n_test_tokens, s_nano,
          round(s_nano::DOUBLE / n_test_tokens::DOUBLE)::BIGINT AS avg_nano
        FROM loss),
      gavg AS (SELECT round(sum(s_nano)::DOUBLE
          / sum(n_test_tokens)::DOUBLE)::BIGINT AS gavg_nano FROM loss),
      sizes AS (SELECT source,
          sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
        FROM documents GROUP BY 1),
      pre AS (SELECT s.source, n_tokens, avg_nano, gavg_nano,
          n_tokens * round(exp((avg_nano - gavg_nano)::DOUBLE / 1e9)
            * 1e6)::BIGINT AS pre
        FROM sizes s JOIN lavg USING (source), gavg),
      tot AS (SELECT sum(pre)::BIGINT AS t_pre,
        sum(n_tokens)::BIGINT AS t_tok FROM pre)
      SELECT source, n_tokens,
        n_tokens::DOUBLE / t_tok::DOUBLE AS base_share,
        avg_nano::DOUBLE / 1e9 AS avg_nll,
        (avg_nano - gavg_nano)::DOUBLE / 1e9 AS excess_nll,
        pre::DOUBLE / t_pre::DOUBLE AS new_weight
      FROM pre, tot ORDER BY source"""))

  // ---------- q250: Neyman allocation for a stratified eval set ---------

  /** Neyman-optimal allocation of a 1000-document eval budget across
    * sources: n_h ∝ N_h·S_h (stratum size × within-stratum quality
    * std-dev) against proportional allocation — the survey-sampling
    * answer to "which sources deserve more eval slots": high-variance
    * sources need more samples for the same confidence, uniform ones
    * fewer (Neyman 1934; the same allocation a labeling-budget
    * planner runs before an annotation round). Variance comes from
    * q14's exact scorer via the q75 moment convention (micro-pinned
    * scores, exact int64/DECIMAL(38,0) sums); S_h is one IEEE sqrt on
    * an identical double and is immediately re-pinned to micro-units,
    * so the N_h·S_h weight is an exact int64 product and every share
    * is one double division of exact integers. Shape: one scored
    * corpus pass to a |sources|-row moment table; everything after is
    * broadcast-scalar arithmetic.
    */
  private val q250 = QueryDef(
    "q250_neyman_allocation",
    (s, dir) => {
      val scored = graft.queries.TextOps.q14Fn(s, dir)
        .select(col("doc_id"),
          expr("CAST(round(quality * 1e6) AS BIGINT)").as("qm"))
        .join(docs(s, dir).select(col("doc_id"), col("source")), "doc_id")
      val m = scored.groupBy(col("source"))
        .agg(count(lit(1)).as("nh"),
          sum(col("qm")).as("sq"),
          sum((col("qm") * col("qm"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("sqq"))
        // sample variance in micro² units: (n·Σq² − (Σq)²) / (n·(n−1));
        // the formula is one textually identical double expression on
        // exact integer inputs, its sqrt is correctly-rounded IEEE, and
        // the result re-pins to micro-units before any further use
        .withColumn("s_micro",
          expr("""CAST(round(CASE WHEN nh > 1 THEN
              sqrt((CAST(nh AS DOUBLE) * CAST(sqq AS DOUBLE)
                - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                / (CAST(nh AS DOUBLE) * CAST(nh - 1 AS DOUBLE))) / 1e6
            ELSE 0.0 END * 1e6) AS BIGINT)"""))
        .withColumn("w", col("nh") * col("s_micro"))
      val tot = m.agg(sum(col("nh")).as("t_n"), sum(col("w")).as("t_w"))
      m.crossJoin(broadcast(tot))
        .select(col("source"), col("nh").as("n_docs"),
          (col("s_micro").cast("double") / lit(1e6)).as("quality_std"),
          (col("nh").cast("double") / col("t_n").cast("double"))
            .as("proportional_share"),
          (col("w").cast("double") / col("t_w").cast("double"))
            .as("neyman_share"),
          expr("""CAST(round(1000 * CAST(w AS DOUBLE)
            / CAST(t_w AS DOUBLE)) AS BIGINT)""").as("n_alloc"))
        .orderBy("source")
    },
    Some("""WITH scored AS (SELECT doc_id,
          round((0.3 * (cast(len(list_distinct(string_split(text, ' ')))
              AS DOUBLE) / len(string_split(text, ' ')))
            + 0.2 * (1.0 - cast(len(list_filter(string_split(text, ' '),
                t -> t IN ('the', 'a', 'of', 'to', 'and'))) AS DOUBLE)
              / len(string_split(text, ' ')))
            + 0.2 * (1.0
              - cast(len(regexp_replace(text, '[a-z ]', '', 'g')) AS DOUBLE)
                / len(text))
            + 0.3 * least(cast(len(string_split(text, ' ')) AS DOUBLE)
              / 50.0, 1.0)) * 1e6)::BIGINT AS qm,
          source
        FROM documents),
      m AS (SELECT source, count(*) AS nh, sum(qm)::BIGINT AS sq,
          sum(cast(qm * qm AS DECIMAL(38,0))) AS sqq
        FROM scored GROUP BY 1),
      sm AS (SELECT source, nh, sq, sqq,
          round(CASE WHEN nh > 1 THEN
              sqrt((nh::DOUBLE * sqq::DOUBLE - sq::DOUBLE * sq::DOUBLE)
                / (nh::DOUBLE * (nh - 1)::DOUBLE)) / 1e6
            ELSE 0.0 END * 1e6)::BIGINT AS s_micro
        FROM m),
      w AS (SELECT source, nh, s_micro, nh * s_micro AS w FROM sm),
      tot AS (SELECT sum(nh)::BIGINT AS t_n, sum(w)::BIGINT AS t_w FROM w)
      SELECT source, nh::BIGINT AS n_docs,
        s_micro::DOUBLE / 1e6 AS quality_std,
        nh::DOUBLE / t_n::DOUBLE AS proportional_share,
        w::DOUBLE / t_w::DOUBLE AS neyman_share,
        round(1000 * w::DOUBLE / t_w::DOUBLE)::BIGINT AS n_alloc
      FROM w, tot ORDER BY source"""))

  // ---------- q257: Gopher-style filter battery -----------------------

  /** The pretraining gatekeeper: the four-rule document filter battery
    * in the Gopher/MassiveText style — minimum word count, mean word
    * length band, stop-word presence, and duplicate-trigram fraction —
    * reported as per-source pass counts so a curation run can see WHICH
    * source fails WHICH rule before anything is dropped (the same
    * reporting posture as q139's datasheet). Thresholds are scaled to
    * the synthetic corpus (≥50 words, mean length 3–5, ≥2 distinct
    * stop words, ≤1 % duplicate trigrams); every rule is evaluated in
    * INTEGER arithmetic (cross-multiplied bounds, count×100 ≤ total)
    * so pass/fail can never straddle an engine's last-ulp double.
    * Shape: one projection pass over the scan + the dedup family's
    * shared posting aggregate (Dedup.inverted, already cached by
    * q43/q44), then a |sources|-row rollup — no new shuffle class.
    */
  private val q257 = QueryDef(
    "q257_gopher_rules",
    (s, dir) => {
      val nd = Dedup.inverted(s, dir)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_distinct"))
      val flags = docs(s, dir)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).as("n_words"),
          size(array_intersect(split(col("text"), " "),
            array(lit("a"), lit("the"), lit("key"), lit("value"))))
            .as("n_stop"),
          length(col("text")).as("len_chars"))
        .withColumn("chars", col("len_chars") - (col("n_words") - 1))
        .join(nd, Seq("doc_id"))
        .select(col("source"),
          when(col("n_words").between(50, 100000), 1L).otherwise(0L)
            .as("r_count"),
          when(lit(3) * col("n_words") <= col("chars")
            && col("chars") <= lit(5) * col("n_words"), 1L).otherwise(0L)
            .as("r_len"),
          when(col("n_stop") >= 2, 1L).otherwise(0L).as("r_stop"),
          when((col("n_words") - 2 - col("n_distinct")) * 100
            <= col("n_words") - 2, 1L).otherwise(0L).as("r_rep"))
      flags.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("r_count")).as("n_pass_count"),
          sum(col("r_len")).as("n_pass_len"),
          sum(col("r_stop")).as("n_pass_stop"),
          sum(col("r_rep")).as("n_pass_rep"),
          sum(col("r_count") * col("r_len") * col("r_stop") * col("r_rep"))
            .as("n_pass_all"))
        .withColumn("pass_rate",
          round(col("n_pass_all").cast("double")
            / col("n_docs").cast("double"), 12))
        .orderBy("source")
    },
    Some(s"""WITH ${Dedup.shingledDuckCte},
      nd AS (SELECT doc_id, count(*) AS n_distinct FROM inv GROUP BY 1),
      base AS (SELECT doc_id, source,
          len(string_split(text, ' ')) AS n_words,
          len(list_intersect(string_split(text, ' '),
            ['a', 'the', 'key', 'value'])) AS n_stop,
          len(text) - (len(string_split(text, ' ')) - 1) AS chars
        FROM documents),
      flags AS (SELECT source,
          CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END
            AS r_count,
          CASE WHEN 3 * n_words <= chars AND chars <= 5 * n_words
            THEN 1 ELSE 0 END AS r_len,
          CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS r_stop,
          CASE WHEN (n_words - 2 - n_distinct) * 100 <= n_words - 2
            THEN 1 ELSE 0 END AS r_rep
        FROM base JOIN nd USING (doc_id))
      SELECT source, count(*)::BIGINT AS n_docs,
        sum(r_count)::BIGINT AS n_pass_count,
        sum(r_len)::BIGINT AS n_pass_len,
        sum(r_stop)::BIGINT AS n_pass_stop,
        sum(r_rep)::BIGINT AS n_pass_rep,
        sum(r_count * r_len * r_stop * r_rep)::BIGINT AS n_pass_all,
        round(sum(r_count * r_len * r_stop * r_rep)::DOUBLE
          / count(*)::DOUBLE, 12) AS pass_rate
      FROM flags GROUP BY 1 ORDER BY source"""))

  // ---------- q262: logistic-probe gradient (one exact batch step) ----

  /** Distributed ML training step, reduced to its exact core: the
    * first full-batch gradient of a logistic-regression probe
    * predicting `lang = 'en'` from three cheap per-doc features
    * (word count, stop-word tokens, characters) plus a bias. At
    * w = 0 the sigmoid is exactly ½, so the gradient Σ xⱼ·(σ−y)
    * doubles to Σ xⱼ·(1−2y) — PURE INTEGER arithmetic, summed with a
    * DECIMAL(38,0) lift (feature·count products pass int64 at
    * warehouse scale), which makes a distributed first training step
    * bit-reproducible across engines and run orders — the property
    * every data-parallel trainer wants and float gradient reduction
    * denies. Shape: one corpus-pass conditional aggregate (map-side
    * combined) → a 4-row (feature, mean-gradient, next-weight) table.
    */
  private val q262 = QueryDef(
    "q262_logreg_gradient",
    (s, dir) => {
      val feats = docs(s, dir).select(
        size(split(col("text"), " ")).cast("long").as("x_words"),
        size(filter(split(col("text"), " "),
          t => t === "a" || t === "the" || t === "key" || t === "value"))
          .cast("long").as("x_stop"),
        length(col("text")).cast("long").as("x_chars"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
        .withColumn("s", lit(1L) - lit(2L) * col("y"))
      val m = feats.agg(count(lit(1)).as("n"),
        sum(col("s").cast("decimal(38,0)")).as("g_bias2"),
        sum((col("x_words") * col("s")).cast("decimal(38,0)"))
          .as("g_words2"),
        sum((col("x_stop") * col("s")).cast("decimal(38,0)"))
          .as("g_stop2"),
        sum((col("x_chars") * col("s")).cast("decimal(38,0)"))
          .as("g_chars2"))
      def row(name: String, g2: String) =
        m.select(lit(name).as("feature"),
          round(col(g2).cast("double") / 2.0 / col("n").cast("double"), 12)
            .as("grad_mean"),
          round(col(g2).cast("double") / -20.0 / col("n").cast("double"),
            12).as("w_next"))
      row("bias", "g_bias2")
        .union(row("chars", "g_chars2"))
        .union(row("stop", "g_stop2"))
        .union(row("words", "g_words2"))
        .orderBy("feature")
    },
    Some("""WITH f AS (SELECT
          len(string_split(text, ' '))::BIGINT AS x_words,
          len(list_filter(string_split(text, ' '),
            t -> t IN ('a', 'the', 'key', 'value')))::BIGINT AS x_stop,
          len(text)::BIGINT AS x_chars,
          CASE WHEN lang = 'en' THEN 1 ELSE 0 END::BIGINT AS y
        FROM documents),
      g AS (SELECT count(*)::BIGINT AS n,
          sum(1 - 2 * y) AS g_bias2,
          sum(x_words * (1 - 2 * y)) AS g_words2,
          sum(x_stop * (1 - 2 * y)) AS g_stop2,
          sum(x_chars * (1 - 2 * y)) AS g_chars2
        FROM f)
      SELECT feature, grad_mean, w_next FROM (
        SELECT 'bias' AS feature,
          round(g_bias2::DOUBLE / 2.0 / n::DOUBLE, 12) AS grad_mean,
          round(g_bias2::DOUBLE / -20.0 / n::DOUBLE, 12) AS w_next FROM g
        UNION ALL SELECT 'chars',
          round(g_chars2::DOUBLE / 2.0 / n::DOUBLE, 12),
          round(g_chars2::DOUBLE / -20.0 / n::DOUBLE, 12) FROM g
        UNION ALL SELECT 'stop',
          round(g_stop2::DOUBLE / 2.0 / n::DOUBLE, 12),
          round(g_stop2::DOUBLE / -20.0 / n::DOUBLE, 12) FROM g
        UNION ALL SELECT 'words',
          round(g_words2::DOUBLE / 2.0 / n::DOUBLE, 12),
          round(g_words2::DOUBLE / -20.0 / n::DOUBLE, 12) FROM g)
      ORDER BY feature"""))

  // ---------- q271: importance-weight effective sample size ------------

  /** The resampling health check DSIR (q244) needs before anyone
    * trusts its weights: per source, the effective sample size
    * ESS = (Σw)²/Σw² of the per-document importance weights
    * w = exp(log-weight) — when a few documents hog the weight mass,
    * ESS/n collapses and the resampled corpus is secretly tiny. The
    * per-doc log-weight is q244's exact int64 nano sum; w pins to
    * integer micro-units through one libm exp (identical input bits →
    * identical output bits, the q249 rule), so Σw and Σw² are exact
    * integer sums (DECIMAL(38,0) — micro² passes int64) and ESS is a
    * single double division. One token join + two nested aggregates,
    * |sources| output rows.
    */
  private val q271 = QueryDef(
    "q271_importance_ess",
    (s, dir) => {
      val toks = docs(s, dir)
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("w1"))
      val perDoc = toks
        .join(graft.queries.TextOps.dsirModel(s, dir), "w1")
        .groupBy(col("doc_id"), col("source"))
        .agg(sum(col("lw_units")).as("lw"))
        .select(col("source"),
          expr("CAST(round(exp(CAST(lw AS DOUBLE) / 1e9) * 1e6) AS BIGINT)")
            .as("w_micro"))
      perDoc.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("w_micro").cast("decimal(38,0)")).as("sw"),
          sum((col("w_micro") * col("w_micro")).cast("decimal(38,0)"))
            .as("sww"))
        .select(col("source"), col("n_docs"),
          round(col("sw").cast("double") * col("sw").cast("double")
            / col("sww").cast("double"), 12).as("ess"),
          round(col("sw").cast("double") * col("sw").cast("double")
            / col("sww").cast("double") / col("n_docs").cast("double"), 12)
            .as("ess_ratio"))
        .orderBy("source")
    },
    Some(s"""WITH ${graft.queries.TextOps.dsirModelDuckCte},
      toks AS (SELECT doc_id, source,
          unnest(string_split(text, ' ')) AS w1
        FROM documents),
      perdoc AS (SELECT doc_id, any_value(source) AS source,
          round(exp(sum(lw_units)::DOUBLE / 1e9) * 1e6)::BIGINT AS w_micro
        FROM toks JOIN model USING (w1) GROUP BY doc_id),
      agg AS (SELECT source, count(*)::BIGINT AS n_docs,
          sum(w_micro) AS sw, sum(w_micro::HUGEINT * w_micro) AS sww
        FROM perdoc GROUP BY 1)
      SELECT source, n_docs,
        round(sw::DOUBLE * sw::DOUBLE / sww::DOUBLE, 12) AS ess,
        round(sw::DOUBLE * sw::DOUBLE / sww::DOUBLE / n_docs::DOUBLE, 12)
          AS ess_ratio
      FROM agg ORDER BY source"""))

  // ---------- q274: earth-mover drift (1-D Wasserstein) ----------------

  /** Per-source distribution drift as 1-D earth-mover's distance
    * between each source's document-length distribution and the whole
    * corpus — the metric that sees HOW FAR mass moved where q114's KS
    * sees only the largest gap and q105's PSI explodes on empty bins.
    * On bucketed support, W₁ = Σᵦ |CDFₛ(b) − CDF₉(b)|, and with the
    * common-denominator trick the numerator is PURE INTEGER:
    * Σᵦ |cumₛ(b)·n₉ − cum₉(b)·nₛ| (DECIMAL-lifted — cum·n products
    * pass int64 at corpus counts) divided ONCE by nₛ·n₉ — no float
    * accumulates across buckets. Shape: one |sources|×|buckets|
    * histogram pass, cumulative windows over ≤|buckets| rows per
    * source, |sources| verdict rows.
    */
  private val q274 = QueryDef(
    "q274_emd_drift",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hist = docs(s, dir)
        .select(col("source"), expr("n_chars div 100").as("bucket"))
        .groupBy(col("source"), col("bucket"))
        .agg(count(lit(1)).as("c"))
      val grid = hist.select(col("source")).distinct()
        .crossJoin(broadcast(hist.select(col("bucket")).distinct()))
        .join(hist, Seq("source", "bucket"), "left_outer")
        .select(col("source"), col("bucket"),
          coalesce(col("c"), lit(0L)).as("c"))
      val wCum = Window.partitionBy(col("source")).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cums = grid.withColumn("cum_s", sum(col("c")).over(wCum))
      val glob = hist.groupBy(col("bucket")).agg(sum(col("c")).as("cg"))
        .withColumn("cum_g", sum(col("cg")).over(
          Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("bucket"), col("cum_g"))
      val totals = hist.groupBy(col("source")).agg(sum(col("c")).as("n_s"))
      val ng = hist.agg(sum(col("c")).as("n_g"))
      cums.join(glob, Seq("bucket"))
        .join(broadcast(totals), Seq("source"))
        .crossJoin(broadcast(ng))
        .groupBy(col("source"))
        .agg(max(col("n_s")).as("n_docs"),
          sum(abs(col("cum_s").cast("decimal(38,0)") * col("n_g")
            - col("cum_g").cast("decimal(38,0)") * col("n_s")))
            .as("num"),
          max(col("n_s").cast("decimal(38,0)") * col("n_g")).as("den"))
        .select(col("source"), col("n_docs"),
          round(col("num").cast("double") / col("den").cast("double"), 12)
            .as("emd_buckets"))
        .orderBy("source")
    },
    Some("""WITH hist AS (SELECT source, n_chars // 100 AS bucket,
          count(*)::BIGINT AS c
        FROM documents GROUP BY 1, 2),
      grid AS (SELECT s.source, b.bucket, coalesce(c, 0) AS c
        FROM (SELECT DISTINCT source FROM hist) s
        CROSS JOIN (SELECT DISTINCT bucket FROM hist) b
        LEFT JOIN hist h ON h.source = s.source AND h.bucket = b.bucket),
      cums AS (SELECT source, bucket, sum(c) OVER (PARTITION BY source
          ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
          ROW) AS cum_s
        FROM grid),
      gcum AS (SELECT bucket, sum(cg) OVER (ORDER BY bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_g
        FROM (SELECT bucket, sum(c) AS cg FROM hist GROUP BY 1)),
      tot AS (SELECT source, sum(c)::BIGINT AS n_s FROM hist GROUP BY 1),
      ng AS (SELECT sum(c)::BIGINT AS n_g FROM hist)
      SELECT source, max(n_s)::BIGINT AS n_docs,
        round(sum(abs(cum_s::HUGEINT * n_g - cum_g::HUGEINT * n_s))::DOUBLE
          / (max(n_s)::DOUBLE * max(n_g)::DOUBLE), 12) AS emd_buckets
      FROM cums JOIN gcum USING (bucket) JOIN tot USING (source), ng
      GROUP BY source ORDER BY source"""))

  // ---------- q299: t-closeness audit ---------------------------------

  /** t-closeness privacy audit (Li, Li & Venkatasubramanian 2007) —
    * the gate past q101's k-anonymity and q216's l-diversity: even a
    * large, l-diverse QI cell leaks if its SENSITIVE-attribute
    * distribution sits far from the global one. Sensitive attribute =
    * document length class (3 fixed engine-exact bands, the q91
    * bucket rule); distance = Earth Mover's over the ordered classes,
    * which for k ordered buckets is Σ|cumulative gap|/(k−1). Shape:
    * one corpus pass into a (lang, source)-cell × 3-band conditional
    * aggregate (map-side partials, dense bands so empty classes count
    * as 0), the global distribution is a 1-row broadcast, and every
    * share is an exact int64 ratio so the EMD and its breach flag are
    * bit-stable. Like q101, this audit only means anything at full
    * corpus scale — rare cells vanish in samples.
    */
  private val q299 = QueryDef(
    "q299_t_closeness",
    (s, dir) => {
      def bandCounts(df: DataFrame): DataFrame = df
        .select(col("lang"), col("source"),
          least(expr("n_chars div 700"), lit(2L)).as("band"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("band") === 0, 1L).otherwise(0L)).as("b0"),
          sum(when(col("band") === 1, 1L).otherwise(0L)).as("b1"))
      val cells = bandCounts(docs(s, dir))
      val global = cells.agg(sum(col("n_docs")).as("gn"),
        sum(col("b0")).as("g0"), sum(col("b1")).as("g1"))
      cells.crossJoin(broadcast(global))
        .select(col("lang"), col("source"), col("n_docs"),
          expr("""CAST(round((abs(CAST(b0 AS DOUBLE) / n_docs
              - CAST(g0 AS DOUBLE) / gn)
            + abs(CAST(b0 + b1 AS DOUBLE) / n_docs
              - CAST(g0 + g1 AS DOUBLE) / gn)) / 2.0 * 1e9)
            AS BIGINT)""").as("emd_nano"))
        .select(col("lang"), col("source"), col("n_docs"),
          round(col("emd_nano").cast("double") / 1e9, 12).as("t_dist"),
          (col("emd_nano") > lit(150000000L)).as("breach"))
        .orderBy(col("lang"), col("source"))
    },
    Some("""WITH cells AS (SELECT lang, source, count(*)::BIGINT AS n_docs,
          sum(CASE WHEN least(n_chars // 700, 2) = 0 THEN 1 ELSE 0
            END)::BIGINT AS b0,
          sum(CASE WHEN least(n_chars // 700, 2) = 1 THEN 1 ELSE 0
            END)::BIGINT AS b1
        FROM documents GROUP BY 1, 2),
      g AS (SELECT sum(n_docs)::BIGINT AS gn, sum(b0)::BIGINT AS g0,
          sum(b1)::BIGINT AS g1 FROM cells),
      d AS (SELECT lang, source, n_docs,
          round((abs(b0::DOUBLE / n_docs - g0::DOUBLE / gn)
            + abs((b0 + b1)::DOUBLE / n_docs
              - (g0 + g1)::DOUBLE / gn)) / 2.0 * 1e9)::BIGINT AS emd_nano
        FROM cells, g)
      SELECT lang, source, n_docs,
        round(emd_nano::DOUBLE / 1e9, 12) AS t_dist,
        emd_nano > 150000000 AS breach
      FROM d ORDER BY lang, source"""))

  // ---------- q309: sample-ratio-mismatch gate ------------------------

  /** Sample-ratio-mismatch (SRM) gate over the q37 deterministic
    * 80/10/10 split — the first thing an experimentation platform
    * checks before trusting ANY downstream split metric: if the
    * realized train/val/test counts diverge from the declared ratios
    * beyond chance, the assignment hash is biased or the corpus was
    * filtered after splitting, and every eval on it is suspect. The
    * χ² goodness-of-fit statistic against expected 0.8/0.1/0.1·N is
    * compared to the 2-df upper-0.1 % critical value 13.816. Shape:
    * one corpus pass into a 3-row aggregate; expected counts and χ²
    * terms are exact arithmetic on int64 totals.
    */
  private val q309 = QueryDef(
    "q309_srm_check",
    (s, dir) => {
      val counts = docs(s, dir)
        .select(expr(graft.ops.Portable.splitCaseSpark).as("split"))
        .groupBy(col("split")).agg(count(lit(1)).as("obs"))
      val tot = counts.agg(sum(col("obs")).as("n"))
      counts.crossJoin(broadcast(tot))
        .select(col("split"), col("obs"), col("n"),
          expr("""CASE WHEN split = 'train' THEN n * 0.8
            ELSE n * 0.1 END""").as("exp_n"))
        .agg(sum(col("obs")).as("n_docs"),
          sum(when(col("split") === "train", col("obs")).otherwise(0L))
            .as("n_train"),
          sum(when(col("split") === "val", col("obs")).otherwise(0L))
            .as("n_val"),
          sum(when(col("split") === "test", col("obs")).otherwise(0L))
            .as("n_test"),
          sum(expr("""CAST(round((obs - exp_n) * (obs - exp_n) / exp_n
            * 1e9) AS BIGINT)""")).as("chi2_nano"))
        .select(col("n_docs"), col("n_train"), col("n_val"),
          col("n_test"),
          round(col("chi2_nano").cast("double") / 1e9, 9).as("chi2"),
          (col("chi2_nano") > lit(13816000000L)).as("srm_detected"))
    },
    Some(s"""WITH counts AS (SELECT ${graft.ops.Portable.splitCaseDuck}
          AS split, count(*)::BIGINT AS obs
        FROM documents GROUP BY 1),
      t AS (SELECT sum(obs)::BIGINT AS n FROM counts),
      e AS (SELECT split, obs, n,
          CASE WHEN split = 'train' THEN n * 0.8 ELSE n * 0.1 END
            AS exp_n
        FROM counts, t)
      SELECT sum(obs)::BIGINT AS n_docs,
        sum(CASE WHEN split = 'train' THEN obs ELSE 0 END)::BIGINT
          AS n_train,
        sum(CASE WHEN split = 'val' THEN obs ELSE 0 END)::BIGINT
          AS n_val,
        sum(CASE WHEN split = 'test' THEN obs ELSE 0 END)::BIGINT
          AS n_test,
        round(sum(round((obs - exp_n) * (obs - exp_n) / exp_n
          * 1e9)::BIGINT)::DOUBLE / 1e9, 9) AS chi2,
        sum(round((obs - exp_n) * (obs - exp_n) / exp_n
          * 1e9)::BIGINT) > 13816000000 AS srm_detected
      FROM e"""))

  // ---------- q310: raking (IPF) step ---------------------------------

  /** One iterative-proportional-fitting (raking) step toward UNIFORM
    * lang × source margins — the survey-weighting primitive (Deming &
    * Stephan 1940) a corpus builder runs to rebalance a crawl: scale
    * every (lang, source) cell so language margins hit 1/|langs|
    * exactly, then source margins hit 1/|sources| (which perturbs the
    * language fit — the residual row-margin error emitted per cell is
    * the convergence signal a second sweep would drive down). Shape:
    * one corpus pass into a ≤|langs×sources| cell table; both scaling
    * sweeps are windows PARTITIONED by the margin key over that
    * bounded table. Weights pin to micro-units after each sweep, so
    * the emitted weights and residuals are bit-stable.
    */
  private val q310 = QueryDef(
    "q310_raking_step",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cells = docs(s, dir)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"))
      val tot = cells.agg(sum(col("n")).as("nn"),
        countDistinct(col("lang")).as("nl"),
        countDistinct(col("source")).as("ns"))
      val wl = Window.partitionBy(col("lang"))
      val ws = Window.partitionBy(col("source"))
      val rowScaled = cells.crossJoin(broadcast(tot))
        .withColumn("lang_n", sum(col("n")).over(wl))
        .withColumn("w1_micro", expr(
          """CAST(round(CAST(n AS DOUBLE) * (CAST(nn AS DOUBLE) / nl)
             / CAST(lang_n AS DOUBLE) * 1e6) AS BIGINT)"""))
      val colScaled = rowScaled
        .withColumn("src_w1", sum(col("w1_micro")).over(ws))
        .withColumn("w2_micro", expr(
          """CAST(round(CAST(w1_micro AS DOUBLE)
             * (CAST(nn AS DOUBLE) * 1e6 / ns)
             / CAST(src_w1 AS DOUBLE)) AS BIGINT)"""))
      colScaled
        .withColumn("lang_w2", sum(col("w2_micro")).over(wl))
        .select(col("lang"), col("source"), col("n"),
          round(col("w2_micro").cast("double") / 1e6, 6).as("weight"),
          round(abs(col("lang_w2").cast("double") / 1e6
            - col("nn").cast("double") / col("nl"))
            / (col("nn").cast("double") / col("nl")), 9)
            .as("row_resid"))
        .orderBy(col("lang"), col("source"))
    },
    Some("""WITH cells AS (SELECT lang, source, count(*)::BIGINT AS n
        FROM documents GROUP BY 1, 2),
      t AS (SELECT sum(n)::BIGINT AS nn,
          count(DISTINCT lang)::BIGINT AS nl,
          count(DISTINCT source)::BIGINT AS ns FROM cells),
      r AS (SELECT lang, source, n, nn, nl, ns,
          round(n::DOUBLE * (nn::DOUBLE / nl)
            / (sum(n) OVER (PARTITION BY lang))::DOUBLE * 1e6)::BIGINT
            AS w1_micro
        FROM cells, t),
      c AS (SELECT *, round(w1_micro::DOUBLE
            * (nn::DOUBLE * 1e6 / ns)
            / (sum(w1_micro) OVER (PARTITION BY source))::DOUBLE)::BIGINT
            AS w2_micro
        FROM r)
      SELECT lang, source, n,
        round(w2_micro::DOUBLE / 1e6, 6) AS weight,
        round(abs((sum(w2_micro) OVER (PARTITION BY lang))::DOUBLE / 1e6
          - nn::DOUBLE / nl) / (nn::DOUBLE / nl), 9) AS row_resid
      FROM c ORDER BY lang, source"""))

  // ---------- q319: k-anonymity generalization ladder ------------------

  /** The generalization ladder k-anonymity audit: q101 asks "does the
    * FULL quasi-identifier violate k?"; this asks the operational
    * follow-up — HOW MUCH generalization buys compliance — by scoring
    * three nested QI levels (lang×source×length-band ⊃ lang×source ⊃
    * lang) in ONE pass via ROLLUP (a single Expand + hash aggregate;
    * each level is a prefix, exactly the rollup lattice). Per level:
    * cell count, cells under k = 5, and the share of documents that
    * would need suppression at that level — the privacy/utility curve
    * a release policy reads. All counts exact int64; level names are
    * derived from grouping_id so the two engines label identically.
    */
  private val q319 = QueryDef(
    "q319_anonymity_ladder",
    (s, dir) => {
      val cells = docs(s, dir)
        .select(col("lang"), col("source"),
          least(expr("n_chars div 700"), lit(2L)).as("len_band"))
        .rollup(col("lang"), col("source"), col("len_band"))
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .where(col("gid") < 7)
      cells
        .select(expr("""CASE gid WHEN 0 THEN '1_lang_source_len'
            WHEN 1 THEN '2_lang_source' ELSE '3_lang' END""")
            .as("level"), col("n"))
        .groupBy(col("level"))
        .agg(count(lit(1)).as("n_cells"),
          sum(when(col("n") < 5, 1L).otherwise(0L)).as("n_violating"),
          sum(when(col("n") < 5, col("n")).otherwise(0L))
            .as("n_suppressed"),
          sum(col("n")).as("n_docs"))
        .select(col("level"), col("n_cells"), col("n_violating"),
          col("n_suppressed"),
          round(col("n_suppressed").cast("double") / col("n_docs"), 9)
            .as("suppression_rate"))
        .orderBy(col("level"))
    },
    Some("""WITH cells AS (SELECT lang, source,
          least(n_chars // 700, 2) AS len_band,
          count(*)::BIGINT AS n,
          GROUPING(lang, source, least(n_chars // 700, 2)) AS gid
        FROM documents
        GROUP BY ROLLUP (lang, source, least(n_chars // 700, 2))),
      lv AS (SELECT CASE gid WHEN 0 THEN '1_lang_source_len'
            WHEN 1 THEN '2_lang_source' ELSE '3_lang' END AS level, n
        FROM cells WHERE gid < 7)
      SELECT level, count(*)::BIGINT AS n_cells,
        sum(CASE WHEN n < 5 THEN 1 ELSE 0 END)::BIGINT AS n_violating,
        sum(CASE WHEN n < 5 THEN n ELSE 0 END)::BIGINT AS n_suppressed,
        round(sum(CASE WHEN n < 5 THEN n ELSE 0 END)::DOUBLE
          / sum(n)::DOUBLE, 9) AS suppression_rate
      FROM lv GROUP BY level ORDER BY level"""))

  // ---------- q320: differentially-private release audit ---------------

  /** ε-differentially-private histogram release with a utility audit:
    * per (lang, source) cell, the true count plus Laplace(1/ε) noise
    * (ε = 1) drawn DETERMINISTICALLY by inverse-CDF over the portable
    * hash's uniform — u = (h mod 10⁵ + 0.5)/10⁵, noise = −(1/ε)·
    * sign(u−½)·ln(1−2|u−½|) — so both engines release the SAME noisy
    * table and the audit is reproducible (a production release would
    * use a real RNG; the mechanism, sensitivity-1 counting query, and
    * post-processing clamp-at-0 are exactly the production shape).
    * Emits per-cell released counts and absolute error, the
    * privacy/utility trade the q319 ladder is weighed against. One
    * corpus pass into bounded cells; noise arithmetic is one libm ln
    * on identical rational inputs.
    */
  private val q320 = QueryDef(
    "q320_dp_release",
    (s, dir) => {
      val noisy = docs(s, dir)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"))
        .withColumn("u", (expr(graft.ops.Portable.h32Spark(
          "concat('dp_', lang, '_', source)")) % 100000
          + lit(0.5)) / 100000.0)
        .withColumn("noise", expr(
          """-1.0 * CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END
             * ln(1.0 - 2.0 * abs(u - 0.5))"""))
        .withColumn("released",
          greatest(expr("CAST(round(n + noise) AS BIGINT)"), lit(0L)))
      noisy.select(col("lang"), col("source"), col("released"),
          abs(col("released") - col("n")).as("abs_err"))
        .orderBy(col("lang"), col("source"))
    },
    Some(s"""WITH noisy AS (SELECT lang, source, count(*)::BIGINT AS n,
          (${graft.ops.Portable.h32Duck("'dp_' || lang || '_' || source")}
            % 100000 + 0.5) / 100000.0 AS u
        FROM documents GROUP BY 1, 2),
      r AS (SELECT lang, source, n,
          -1.0 * CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END
            * ln(1.0 - 2.0 * abs(u - 0.5)) AS noise
        FROM noisy),
      rel AS (SELECT lang, source, n,
          greatest(round(n + noise)::BIGINT, 0) AS released
        FROM r)
      SELECT lang, source, released,
        abs(released - n)::BIGINT AS abs_err
      FROM rel ORDER BY lang, source"""))

  // ---------- q354: Cronbach's alpha of the quality battery ------------

  /** Cronbach's α over the three q14-family quality subscores
    * (lexical diversity, length adequacy, stopword grounding) — the
    * psychometric internal-consistency check a COMPOSITE score owes
    * its users: α = k/(k−1)·(1 − Σσᵢ²/σ_total²) says whether the
    * items measure one construct (α ≥ 0.7) or should never have been
    * summed (α ≈ 0 — report them separately). Low α here is a design
    * finding about the q14 composite itself. Shape: one corpus pass
    * pins the three item scores to micro ints in-scan; variances come
    * from one moment aggregate (DECIMAL-lifted squares of the items
    * AND their sum); α is scalar math.
    */
  private val q354 = QueryDef(
    "q354_cronbach_alpha",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val items = docs(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .select(
          expr("""CAST(round(CAST(size(array_distinct(toks)) AS DOUBLE)
            / size(toks) * 1e6) AS BIGINT)""").as("i1"),
          expr("""CAST(round(least(CAST(size(toks) AS DOUBLE) / 50.0,
            1.0) * 1e6) AS BIGINT)""").as("i2"),
          expr("""CAST(round(CAST(size(filter(toks,
            t -> t IN ('a', 'the', 'key', 'value'))) AS DOUBLE)
            / size(toks) * 1e6) AS BIGINT)""").as("i3"))
        .withColumn("tot", col("i1") + col("i2") + col("i3"))
      def dl(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
      def v(c: String) = s"(s2_$c / n - (CAST(s_$c AS DOUBLE) / n) " +
        s"* (CAST(s_$c AS DOUBLE) / n))"
      items.agg(count(lit(1)).as("n"),
          sum(col("i1")).as("s_i1"), sum(col("i2")).as("s_i2"),
          sum(col("i3")).as("s_i3"), sum(col("tot")).as("s_tot"),
          sum(dl(col("i1")) * dl(col("i1"))).cast("double").as("s2_i1"),
          sum(dl(col("i2")) * dl(col("i2"))).cast("double").as("s2_i2"),
          sum(dl(col("i3")) * dl(col("i3"))).cast("double").as("s2_i3"),
          sum(dl(col("tot")) * dl(col("tot"))).cast("double")
            .as("s2_tot"))
        .select(col("n"),
          round(expr(s"${v("i1")} / 1e12"), 9).as("var_diversity"),
          round(expr(s"${v("i2")} / 1e12"), 9).as("var_length"),
          round(expr(s"${v("i3")} / 1e12"), 9).as("var_stopword"),
          round(expr(s"${v("tot")} / 1e12"), 9).as("var_total"),
          round(expr(s"""(3.0 / 2.0) * (1.0 - (${v("i1")} + ${v("i2")}
            + ${v("i3")}) / (${v("tot")}))"""), 9).as("alpha"))
    },
    Some {
      def v(c: String) =
        s"(s2_$c / n - (s_$c::DOUBLE / n) * (s_$c::DOUBLE / n))"
      s"""WITH items AS (SELECT
          round(len(list_distinct(string_split(text, ' ')))::DOUBLE
            / len(string_split(text, ' ')) * 1e6)::BIGINT AS i1,
          round(least(len(string_split(text, ' '))::DOUBLE / 50.0, 1.0)
            * 1e6)::BIGINT AS i2,
          round(len(list_filter(string_split(text, ' '),
            t -> t IN ('a', 'the', 'key', 'value')))::DOUBLE
            / len(string_split(text, ' ')) * 1e6)::BIGINT AS i3
        FROM documents),
      wt AS (SELECT i1, i2, i3, i1 + i2 + i3 AS tot FROM items),
      mom AS (SELECT count(*)::BIGINT AS n,
          sum(i1)::BIGINT AS s_i1, sum(i2)::BIGINT AS s_i2,
          sum(i3)::BIGINT AS s_i3, sum(tot)::BIGINT AS s_tot,
          sum(i1::HUGEINT * i1)::DOUBLE AS s2_i1,
          sum(i2::HUGEINT * i2)::DOUBLE AS s2_i2,
          sum(i3::HUGEINT * i3)::DOUBLE AS s2_i3,
          sum(tot::HUGEINT * tot)::DOUBLE AS s2_tot
        FROM wt)
      SELECT n,
        round(${v("i1")} / 1e12, 9) AS var_diversity,
        round(${v("i2")} / 1e12, 9) AS var_length,
        round(${v("i3")} / 1e12, 9) AS var_stopword,
        round(${v("tot")} / 1e12, 9) AS var_total,
        round((3.0 / 2.0) * (1.0 - (${v("i1")} + ${v("i2")}
          + ${v("i3")}) / (${v("tot")})), 9) AS alpha
      FROM mom"""
    })

  // ---------- q380: average precision of a ranking ---------------------

  /** Average precision (and precision@100) of the length-ranked
    * document list against the lang='en' relevance label — the
    * rank-position-weighted companion to q170's AUC on the SAME
    * ranking task: AUC counts pairwise orderings anywhere in the
    * list, AP concentrates mass at the top, which is what a
    * retrieval/filter pipeline actually consumes. AP needs per-item
    * ranks and cumulative relevance under one global order — both
    * come from ONE RangeNtile.withRunningSums pass (per-shard prefix
    * sums + boundary broadcast; no single-partition sort even though
    * the ranking is corpus-sized). Each relevant item's P@k term is
    * pinned to nano before the exact integer fold, so the AP sum is
    * order-independent. Ties break by doc_id (total order, both
    * dialects identical).
    */
  private val q380 = QueryDef(
    "q380_avg_precision",
    (s, dir) => {
      val base = docs(s, dir)
        .select(col("doc_id"), col("n_chars"),
          when(col("lang") === "en", 1L).otherwise(0L).as("rel"),
          lit(1L).as("one"))
      val cum = RangeNtile.withRunningSums(base,
        Seq(col("n_chars").desc, col("doc_id")),
        Seq("one" -> "rn", "rel" -> "cum_rel"))
      val terms = cum.where(col("rel") === 1L)
        .select(expr("""CAST(round(CAST(cum_rel AS DOUBLE) * 1e9 / rn)
          AS BIGINT)""").as("p_nano"))
        .agg(count(lit(1)).as("n_pos"), sum(col("p_nano")).as("sp"))
      // aggregate form (not a filter): stays 1-row (NULL) when the
      // corpus has fewer than 100 docs, so the final join never empties
      val p100 = cum.agg(max(when(col("rn") === 100L, col("cum_rel")))
        .as("rel_at_100"))
      val nd = docs(s, dir).agg(count(lit(1)).as("n_docs"))
      terms.crossJoin(broadcast(p100)).crossJoin(broadcast(nd))
        .select(col("n_pos"), col("n_docs"),
          round(col("sp").cast("double") / col("n_pos") / 1e9, 6)
            .as("avg_precision"),
          round(col("rel_at_100").cast("double") / 100.0, 6)
            .as("p_at_100"))
    },
    Some("""WITH base AS (SELECT doc_id, n_chars,
          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rel
        FROM documents),
      cum AS (SELECT doc_id, rel,
          row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn,
          sum(rel) OVER (ORDER BY n_chars DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
            AS cum_rel
        FROM base),
      terms AS (SELECT count(*)::BIGINT AS n_pos,
          sum(round(cum_rel::DOUBLE * 1e9 / rn)::BIGINT)::BIGINT AS sp
        FROM cum WHERE rel = 1),
      p1 AS (SELECT max(CASE WHEN rn = 100 THEN cum_rel END)
          AS rel_at_100 FROM cum),
      nd AS (SELECT count(*)::BIGINT AS n_docs FROM documents)
      SELECT n_pos, n_docs,
        round(sp::DOUBLE / n_pos / 1e9, 6) AS avg_precision,
        round(rel_at_100::DOUBLE / 100.0, 6) AS p_at_100
      FROM terms, p1, nd"""))

  // ---------- q384: quadratic-weighted kappa ---------------------------

  /** Quadratic-weighted Cohen's kappa between two ordinal quality
    * raters — the length-based bucket (n_chars) and the
    * lexical-diversity bucket (distinct/total tokens), both on a 0–4
    * scale: ordinal labels make plain kappa (q215's class) too harsh,
    * since "4 vs 3" is near-agreement while "4 vs 0" is not;
    * quadratic weights charge disagreements by (i−j)². κ_w folds
    * ENTIRELY in exact integer arithmetic — observed disagreement
    * N·ΣOᵢⱼ(i−j)² vs chance disagreement Σrᵢcⱼ(i−j)² over the
    * bounded 5×5 contingency/margin tables (one corpus pass, then
    * constant-size folds, DECIMAL-lifted) — so the statistic is one
    * exact rational cast to double at the end.
    */
  private val q384 = QueryDef(
    "q384_weighted_kappa",
    (s, dir) => {
      val rated = docs(s, dir).select(
        least(lit(4L), expr("n_chars div 400")).as("ra"),
        least(lit(4L), expr(
          """(size(array_distinct(split(text, ' '))) * 5)
            div size(split(text, ' '))""")).as("rb"))
      val cells = rated.groupBy(col("ra"), col("rb"))
        .agg(count(lit(1)).as("o"))
      val nTot = cells.agg(sum(col("o")).as("n"))
      val rm = cells.groupBy(col("ra")).agg(sum(col("o")).as("r"))
      val cm = cells.groupBy(col("rb")).agg(sum(col("o")).as("c"))
      val num = cells.agg(sum(col("o") * (col("ra") - col("rb"))
        * (col("ra") - col("rb"))).as("od"))
      val den = rm.join(broadcast(cm), lit(true))
        .agg(sum((col("r") * col("c")).cast(DecimalType(38, 0))
          * ((col("ra") - col("rb")) * (col("ra") - col("rb"))))
          .as("ed"))
      nTot.crossJoin(broadcast(num)).crossJoin(broadcast(den))
        .select(col("n").as("n_docs"),
          round(lit(1.0) - col("n").cast("double")
            * col("od").cast("double") / col("ed").cast("double"), 9)
            .as("kappa_w"))
        .select(col("n_docs"), col("kappa_w"),
          when(col("kappa_w") < 0.2, "poor")
            .when(col("kappa_w") < 0.4, "fair")
            .when(col("kappa_w") < 0.6, "moderate")
            .otherwise("substantial").as("agreement"))
    },
    Some("""WITH rated AS (SELECT
          least(4, n_chars // 400) AS ra,
          least(4, (len(list_distinct(string_split(text, ' '))) * 5)
            // len(string_split(text, ' '))) AS rb
        FROM documents),
      cells AS (SELECT ra, rb, count(*)::BIGINT AS o FROM rated
        GROUP BY 1, 2),
      nt AS (SELECT sum(o)::BIGINT AS n FROM cells),
      rm AS (SELECT ra, sum(o)::BIGINT AS r FROM cells GROUP BY 1),
      cm AS (SELECT rb, sum(o)::BIGINT AS c FROM cells GROUP BY 1),
      num AS (SELECT sum(o * (ra - rb) * (ra - rb))::BIGINT AS od
        FROM cells),
      den AS (SELECT sum(r::HUGEINT * c * (ra - rb) * (ra - rb)) AS ed
        FROM rm CROSS JOIN cm)
      SELECT n AS n_docs,
        round(1.0 - n::DOUBLE * od::DOUBLE / ed::DOUBLE, 9)
          AS kappa_w,
        CASE WHEN 1.0 - n::DOUBLE * od::DOUBLE / ed::DOUBLE < 0.2
            THEN 'poor'
          WHEN 1.0 - n::DOUBLE * od::DOUBLE / ed::DOUBLE < 0.4
            THEN 'fair'
          WHEN 1.0 - n::DOUBLE * od::DOUBLE / ed::DOUBLE < 0.6
            THEN 'moderate'
          ELSE 'substantial' END AS agreement
      FROM nt, num, den"""))

  // ---------- q396: selection-rate fairness audit ----------------------

  /** Four-fifths-rule fairness audit of a quality filter: per
    * language, the selection rate of the "keep" decision (lexical
    * diversity ≥ 0.55 and length in [100, 2000] chars — a
    * representative q14-style gate), each language's rate ratio to
    * the most-selected language, and the 80 %-rule pass flag — the
    * disparate-impact screen a curation pipeline runs before shipping
    * a filter, because a threshold tuned on English quietly guts
    * other languages (exactly what q138's calibration then has to
    * repair). Selection rates pin to micro from exact counts; the
    * reference max is a broadcast scalar off the bounded per-language
    * table. One corpus pass, k-row everything after.
    */
  private val q396 = QueryDef(
    "q396_fairness_audit",
    (s, dir) => {
      val rated = docs(s, dir).select(col("lang"),
        (expr("""(size(array_distinct(split(text, ' '))) * 1000000)
            div size(split(text, ' '))""") >= 550000L
          && col("n_chars").between(100L, 2000L)).as("keep"))
      val byLang = rated.groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("k"))
        .withColumn("rate_micro",
          expr("CAST(round(CAST(k AS DOUBLE) * 1e6 / n) AS BIGINT)"))
      val mx = byLang.agg(max(col("rate_micro")).as("max_micro"))
      byLang.crossJoin(broadcast(mx))
        .select(col("lang"), col("n"), col("k").as("n_kept"),
          round(col("rate_micro").cast("double") / 1e6, 6)
            .as("sel_rate"),
          round(col("rate_micro").cast("double") / col("max_micro"),
            6).as("ratio_to_max"),
          (col("rate_micro").cast("double") / col("max_micro") >= 0.8)
            .as("four_fifths_pass"))
        .orderBy(col("lang"))
    },
    Some("""WITH rated AS (SELECT lang,
          ((len(list_distinct(string_split(text, ' '))) * 1000000)
            // len(string_split(text, ' ')) >= 550000
           AND n_chars BETWEEN 100 AND 2000) AS keep
        FROM documents),
      bl AS (SELECT lang, count(*)::BIGINT AS n,
          sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS k
        FROM rated GROUP BY 1),
      br AS (SELECT lang, n, k,
          round(k::DOUBLE * 1e6 / n)::BIGINT AS rate_micro
        FROM bl),
      mx AS (SELECT max(rate_micro)::BIGINT AS max_micro FROM br)
      SELECT lang, n, k AS n_kept,
        round(rate_micro::DOUBLE / 1e6, 6) AS sel_rate,
        round(rate_micro::DOUBLE / max_micro, 6) AS ratio_to_max,
        (rate_micro::DOUBLE / max_micro >= 0.8) AS four_fifths_pass
      FROM br, mx
      ORDER BY lang"""))

  // ---------- q477: ingest-batch quality gate (frozen-edge PSI) --------

  /** Quality drift of an ingest batch against the STANDING corpus with
    * FROZEN bin edges — the production form of q105's PSI: decile
    * edges are cut on the standing corpus only (the reference
    * distribution a gate is calibrated against), the batch is bucketed
    * by those frozen edges, and the top bucket is open-ended so
    * batch docs better than anything standing still land in decile 10
    * instead of inventing a bin. Edge assignment compares the full
    * (quality, doc_id) sort key against each boundary, so ties break
    * identically in both engines. Per-doc quality is q14's scoring
    * formula verbatim. Shape: the standing decile cut rides
    * RangeNtile (per-shard sorts + broadcast offsets — no
    * corpus-sized single-partition window), the 9 boundaries
    * broadcast onto the batch, PSI is q105's pinned integer-unit sum.
    */
  /** q14's per-doc quality score — exposed so q477's streaming twin
    * spec can pin its row-local reimplementation against the same
    * expression tree.
    */
  private[graft] def scoredDocs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_stop", expr(
        "size(filter(toks, t -> t IN ('the', 'a', 'of', 'to', 'and')))"))
      .select(col("doc_id"),
        (lit(0.3) * (size(array_distinct(col("toks"))).cast("double")
            / col("n_tokens"))
          + lit(0.2) * (lit(1.0) - col("n_stop").cast("double")
            / col("n_tokens"))
          + lit(0.2) * (lit(1.0)
            - length(regexp_replace(col("text"), "[a-z ]", ""))
              .cast("double") / length(col("text")))
          + lit(0.3) * least(col("n_tokens").cast("double") / lit(50.0),
            lit(1.0))).as("quality"))

  /** q477's frozen decile boundaries — (bucket, hq, hd) for buckets
    * 1..9, cut on the STANDING corpus; the streaming twin receives
    * these as its side input.
    */
  private[graft] def standingQualityBounds(s: SparkSession,
      dir: String): DataFrame = {
    val standing = PlanCache.freeze(scoredDocs(s, dir))
      .where(col("doc_id") % 10 >= 2)
    PlanCache.freeze(RangeNtile.withNtile(standing,
        Seq(col("quality"), col("doc_id")), 10, "bucket"))
      .groupBy(col("bucket"))
      .agg(max(struct(col("quality"), col("doc_id"))).as("hi"))
      .where(col("bucket") <= 9)
      .select(col("bucket").as("bb"), col("hi.quality").as("hq"),
        col("hi.doc_id").as("hd"))
  }

  private val q477 = QueryDef(
    "q477_ingest_quality_psi",
    (s, dir) => {
      // frozen: scored feeds both split branches (one corpus scan, not
      // two) and the standing decile labeling feeds both the boundary
      // extraction and the reference counts (one RangeNtile pass, not
      // two) — the PlanCache.freeze dedup idiom
      val scoredF = PlanCache.freeze(scoredDocs(s, dir))
      val standing = scoredF.where(col("doc_id") % 10 >= 2)
      val batch = scoredF.where(col("doc_id") % 10 < 2)
      val labeled = PlanCache.freeze(RangeNtile.withNtile(standing,
        Seq(col("quality"), col("doc_id")), 10, "bucket"))
      val bounds = standingQualityBounds(s, dir)
      val assigned = batch.join(broadcast(bounds),
          col("quality") < col("hq")
            || (col("quality") === col("hq") && col("doc_id") <= col("hd")),
          "left_outer")
        .groupBy(col("doc_id")).agg(min(col("bb")).as("b"))
        .select(coalesce(col("b"), lit(10L)).as("bucket"))
      val refCnt = labeled.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_ref"))
      val batCnt = assigned.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_batch"))
      val agg = refCnt.join(batCnt, Seq("bucket"), "left_outer")
        .select(col("bucket"), col("n_ref"),
          coalesce(col("n_batch"), lit(0L)).as("n_batch"))
      val tot = agg.agg(sum(col("n_ref")).as("t_ref"),
        sum(col("n_batch")).as("t_bat"))
      val units = agg.crossJoin(broadcast(tot))
        .withColumn("pa", col("n_ref").cast("double") / col("t_ref"))
        .withColumn("pb", col("n_batch").cast("double") / col("t_bat"))
        .withColumn("units", when(col("n_ref") > 0 && col("n_batch") > 0,
          round((col("pa") - col("pb")) * log(col("pa") / col("pb"))
            * lit(1e9)).cast("long")).otherwise(0L))
      val psum = units.agg(sum(col("units")).as("su"))
      units.crossJoin(broadcast(psum))
        .withColumn("psi", col("su").cast("double") / lit(1e9))
        .select(col("bucket"), col("n_ref"), col("n_batch"),
          col("pa"), col("pb"), col("psi"))
        .orderBy("bucket")
    },
    Some("""WITH scored AS (SELECT doc_id,
          0.3 * (cast(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / len(string_split(text, ' ')))
          + 0.2 * (1.0 - cast(len(list_filter(string_split(text, ' '),
              t -> t IN ('the', 'a', 'of', 'to', 'and'))) AS DOUBLE)
            / len(string_split(text, ' ')))
          + 0.2 * (1.0 - cast(length(regexp_replace(text, '[a-z ]', '', 'g'))
              AS DOUBLE) / length(text))
          + 0.3 * least(cast(len(string_split(text, ' ')) AS DOUBLE) / 50.0,
              1.0) AS quality
        FROM documents),
      labeled AS (SELECT doc_id, quality,
          ntile(10) OVER (ORDER BY quality, doc_id) AS bucket
        FROM scored WHERE doc_id % 10 >= 2),
      bounds AS (SELECT bucket AS bb, quality AS hq, doc_id AS hd FROM (
          SELECT bucket, quality, doc_id, row_number() OVER (
            PARTITION BY bucket ORDER BY quality DESC, doc_id DESC) AS rn
          FROM labeled) WHERE rn = 1 AND bucket <= 9),
      batch AS (SELECT doc_id, quality FROM scored WHERE doc_id % 10 < 2),
      assigned AS (SELECT b.doc_id,
          coalesce(min(bo.bb), 10)::BIGINT AS bucket
        FROM batch b LEFT JOIN bounds bo
          ON (b.quality < bo.hq
            OR (b.quality = bo.hq AND b.doc_id <= bo.hd))
        GROUP BY 1),
      refc AS (SELECT bucket::BIGINT AS bucket, count(*)::BIGINT AS n_ref
        FROM labeled GROUP BY 1),
      batc AS (SELECT bucket, count(*)::BIGINT AS n_batch
        FROM assigned GROUP BY 1),
      agg AS (SELECT r.bucket, r.n_ref,
          coalesce(b.n_batch, 0)::BIGINT AS n_batch
        FROM refc r LEFT JOIN batc b ON b.bucket = r.bucket),
      tot AS (SELECT sum(n_ref) AS t_ref, sum(n_batch) AS t_bat FROM agg),
      terms AS (SELECT bucket, n_ref, n_batch,
          n_ref::DOUBLE / t_ref AS pa, n_batch::DOUBLE / t_bat AS pb,
          CASE WHEN n_ref > 0 AND n_batch > 0 THEN
            round((n_ref::DOUBLE / t_ref - n_batch::DOUBLE / t_bat)
              * ln((n_ref::DOUBLE / t_ref) / (n_batch::DOUBLE / t_bat))
              * 1e9)::BIGINT
          ELSE 0 END AS units
        FROM agg, tot)
      SELECT bucket, n_ref, n_batch, pa, pb,
        (sum(units) OVER ())::DOUBLE / 1e9 AS psi
      FROM terms ORDER BY bucket"""))

  // ---------- q505: row-level DQ quarantine --------------------------------

  /** Row-level data-quality gating with FIRST-FAILING-RULE attribution
    * — the validation step between the reference's extract and its
    * sink (the reference ships rows unvalidated; any consumer
    * warehouse runs exactly this): an ingest batch of `lineitem`
    * rows (keys ≡0 mod 11) passes through an ordered rule list —
    * negative extended price, non-positive quantity, tax above the
    * 0.07 contract ceiling — and each row lands in the quarantine
    * class of its FIRST violated rule or in 'admitted' (q500's
    * attribution discipline, at row grain). The fixture violates no
    * rule, so corruption is injected deterministically (price negated
    * for linenumber ≡0 mod 3, quantity zeroed for orderkey ≡0
    * mod 13) — the repeatable test harness a DQ gate ships with.
    * Per class: row count, cent-exact absolute value at stake, and
    * the minimal (orderkey, linenumber) example a triage ticket
    * links. Shape: one scan, flags in the projection, one 4-class
    * aggregate; example keys via min over an encoded int64. 4-row
    * output.
    */
  private val q505 = QueryDef(
    "q505_dq_quarantine",
    (s, dir) => {
      val batch = Fixtures.table(s, dir, "lineitem")
        .where(expr("l_orderkey % 11 = 0"))
        .select(col("l_orderkey").as("k"), col("l_linenumber").as("ln"),
          expr("""CASE WHEN l_linenumber % 3 = 0
              THEN -CAST(round(l_extendedprice * 100) AS BIGINT)
              ELSE CAST(round(l_extendedprice * 100) AS BIGINT)
            END""").as("price_c"),
          expr("CASE WHEN l_orderkey % 13 = 0 THEN 0.0 ELSE l_quantity " +
            "END").as("qty"),
          col("l_tax"))
        .select(col("k"), col("ln"), col("price_c"),
          expr("""CASE WHEN price_c < 0 THEN '1_neg_price'
              WHEN qty <= 0.0 THEN '2_zero_qty'
              WHEN l_tax > 0.07 THEN '3_tax_ceiling'
              ELSE '4_admitted' END""").as("class"))
      batch.groupBy(col("class"))
        .agg(count(lit(1)).as("n_rows"),
          sum(abs(col("price_c"))).as("abs_cents_at_stake"),
          min(col("k") * 10L + col("ln")).as("ex"))
        .select(col("class"), col("n_rows"), col("abs_cents_at_stake"),
          expr("ex div 10").as("example_orderkey"),
          expr("ex % 10").as("example_linenumber"))
        .orderBy("class")
    },
    Some("""WITH batch AS (SELECT l_orderkey AS k, l_linenumber AS ln,
          CASE WHEN l_linenumber % 3 = 0
            THEN -CAST(round(l_extendedprice * 100) AS BIGINT)
            ELSE CAST(round(l_extendedprice * 100) AS BIGINT)
          END AS price_c,
          CASE WHEN l_orderkey % 13 = 0 THEN 0.0 ELSE l_quantity END
            AS qty,
          l_tax
        FROM lineitem WHERE l_orderkey % 11 = 0),
      cl AS (SELECT k, ln, price_c,
          CASE WHEN price_c < 0 THEN '1_neg_price'
            WHEN qty <= 0.0 THEN '2_zero_qty'
            WHEN l_tax > 0.07 THEN '3_tax_ceiling'
            ELSE '4_admitted' END AS class
        FROM batch)
      SELECT class, count(*)::BIGINT AS n_rows,
        sum(abs(price_c))::BIGINT AS abs_cents_at_stake,
        min(k * 10 + ln) // 10 AS example_orderkey,
        min(k * 10 + ln) % 10 AS example_linenumber
      FROM cl GROUP BY class ORDER BY class"""))

  // ---------- q507: late-arriving-dimension audit ---------------------------

  /** The referential gate at INGEST time — q106 audits the whole
    * warehouse's FK health after the fact; this classifies each
    * arriving fact row at the door, with the distinction that decides
    * the pipeline's retry design: a batch order whose customer is not
    * yet in the loaded dimension slice is either LATE-ARRIVING (the
    * key exists in the eventual full dimension — park the row and
    * re-join after the next dim load, Kimball's classic case) or a
    * true ORPHAN (the key exists nowhere — quarantine, q505's lane).
    * Batch = keys ≡0,1 mod 10 (the standing convention); the loaded
    * dim slice = customers ≡2–9 mod 10; the eventual dimension is the
    * full table minus a deterministic lost-row injection (keys ≡13
    * mod 997), so the orphan lane is exercised, not vacuous. Shape:
    * two LEFT SEMI-shaped flag joins of the batch against dimension
    * key sets (both broadcast at daily batch scale; bucketed at
    * 100 TB), one 3-class aggregate with cent-exact money at stake
    * and min-key examples. 3-row output.
    */
  private val q507 = QueryDef(
    "q507_late_dim_audit",
    (s, dir) => {
      val batch = Fixtures.table(s, dir, "orders")
        .where(expr("o_orderkey % 10 < 2"))
        .select(col("o_orderkey").as("k"), col("o_custkey").as("ck"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val loaded = Fixtures.table(s, dir, "customer")
        .where(expr("c_custkey % 10 >= 2"))
        .select(col("c_custkey").as("ck")).distinct()
        .withColumn("in_loaded", lit(1L))
      val eventual = Fixtures.table(s, dir, "customer")
        .where(expr("c_custkey % 997 <> 13"))
        .select(col("c_custkey").as("ck")).distinct()
        .withColumn("in_eventual", lit(1L))
      batch
        .join(broadcast(loaded), Seq("ck"), "left_outer")
        .join(broadcast(eventual), Seq("ck"), "left_outer")
        .select(col("k"), col("ck"), col("cents"),
          when(col("in_loaded") === 1L, "1_ok")
            .when(col("in_eventual") === 1L, "2_late_dim")
            .otherwise("3_orphan").as("class"))
        .groupBy(col("class"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("ck")).as("n_custkeys"),
          sum(col("cents")).as("cents_at_stake"),
          min(col("k")).as("example_orderkey"))
        .orderBy("class")
    },
    Some("""WITH batch AS (SELECT o_orderkey AS k, o_custkey AS ck,
          CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey % 10 < 2),
      loaded AS (SELECT DISTINCT c_custkey AS ck FROM customer
        WHERE c_custkey % 10 >= 2),
      eventual AS (SELECT DISTINCT c_custkey AS ck FROM customer
        WHERE c_custkey % 997 <> 13),
      cl AS (SELECT k, ck, cents,
          CASE WHEN ck IN (SELECT ck FROM loaded) THEN '1_ok'
            WHEN ck IN (SELECT ck FROM eventual) THEN '2_late_dim'
            ELSE '3_orphan' END AS class
        FROM batch)
      SELECT class, count(*)::BIGINT AS n_orders,
        count(DISTINCT ck)::BIGINT AS n_custkeys,
        sum(cents)::BIGINT AS cents_at_stake,
        min(k)::BIGINT AS example_orderkey
      FROM cl GROUP BY class ORDER BY class"""))

  val all: Seq[QueryDef] =
    Seq(q43, q44, q47, q50, q91, q101, q109, q110, q116, q125, q138, q139,
      q149, q168, q170, q172, q173, q183, q216, q225, q249, q250, q257,
      q262, q271, q274, q299, q309, q310, q319, q320, q354, q380, q384,
      q396, q477, q505, q507)
}
