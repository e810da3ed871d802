package graft.queries

import graft.{Fixtures, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the LLM-data-
  * pipeline extensions the rebuilt engine adds beyond the reference's ETL
  * surface (BASELINE.json north star; reference itself has no text ops).
  *
  * All of these are pure per-row projections: narrow, shuffle-free,
  * whole-stage-codegen'd — at 100 TB they scale embarrassingly (the only
  * cost is the scan itself, and column pruning keeps it to doc_id+text).
  *
  * Determinism for the DuckDB oracle: integer token counts everywhere;
  * ratios are IEEE double ops applied in identical textual order on both
  * sides, so results are bit-identical.
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Fixtures.table(s, dir, "documents")

  /** Whitespace tokens + BPE-ish regex tokens + distinct-token count.
    * The regex tokenizer is the standard letters|digits|single-symbol
    * fallback pretokenization shape.
    */
  private val q13 = QueryDef(
    "q13_text_tokens",
    (s, dir) => docs(s, dir).select(
      col("doc_id"),
      size(split(col("text"), " ")).as("n_tokens"),
      expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0))")
        .as("n_regex_tokens"),
      size(array_distinct(split(col("text"), " "))).as("n_distinct_tokens"),
      length(col("text")).as("len_chars"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
      len(string_split(text, ' ')) AS n_tokens,
      len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]', 0)) AS n_regex_tokens,
      len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
      length(text) AS len_chars
      FROM documents ORDER BY doc_id"""))

  /** Quality scoring: type-token ratio, stopword ratio, length factor —
    * the length/stopword heuristics used for pretraining-corpus filtering.
    */
  private val q14 = QueryDef(
    "q14_text_quality",
    (s, dir) => docs(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_stop",
        expr("size(filter(toks, t -> t IN ('the', 'a', 'of', 'to', 'and')))"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        (size(array_distinct(col("toks"))).cast("double") / col("n_tokens"))
          .as("ttr"),
        (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
        (lit(1.0) - length(regexp_replace(col("text"), "[a-z ]", ""))
          .cast("double") / length(col("text"))).as("alpha_ratio"),
        least(col("n_tokens").cast("double") / lit(50.0), lit(1.0))
          .as("len_factor"))
      .withColumn("quality",
        lit(0.3) * col("ttr") + lit(0.2) * (lit(1.0) - col("stop_ratio"))
          + lit(0.2) * col("alpha_ratio") + lit(0.3) * col("len_factor"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id, n_tokens, ttr, stop_ratio, alpha_ratio, len_factor,
      0.3 * ttr + 0.2 * (1.0 - stop_ratio) + 0.2 * alpha_ratio
        + 0.3 * len_factor AS quality
      FROM (
        SELECT doc_id,
          len(string_split(text, ' ')) AS n_tokens,
          cast(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / len(string_split(text, ' ')) AS ttr,
          cast(len(list_filter(string_split(text, ' '),
            t -> t IN ('the', 'a', 'of', 'to', 'and'))) AS DOUBLE)
            / len(string_split(text, ' ')) AS stop_ratio,
          1.0 - cast(length(regexp_replace(text, '[a-z ]', '', 'g')) AS DOUBLE)
            / length(text) AS alpha_ratio,
          least(cast(len(string_split(text, ' ')) AS DOUBLE) / 50.0, 1.0)
            AS len_factor
        FROM documents)
      ORDER BY doc_id"""))

  /** Language-ID: stopword-hit heuristic with a fixed language priority
    * for ties. (A char-n-gram profile model is the production variant;
    * the fixture corpus is synthetic ASCII so stopword hits are the
    * discriminating signal available.)
    */
  private val q15 = QueryDef(
    "q15_lang_id",
    (s, dir) => docs(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("hits_en",
        expr("size(filter(toks, t -> t IN ('the','a','of','to','and','is')))"))
      .withColumn("hits_de",
        expr("size(filter(toks, t -> t IN ('der','die','das','und','ist')))"))
      .withColumn("hits_es",
        expr("size(filter(toks, t -> t IN ('el','los','las','y','es')))"))
      .withColumn("hits_fr",
        expr("size(filter(toks, t -> t IN ('le','les','et','est','une')))"))
      .select(
        col("doc_id"), col("lang").as("lang_label"),
        col("hits_en"), col("hits_de"), col("hits_es"), col("hits_fr"),
        expr("""CASE
          WHEN hits_en >= hits_de AND hits_en >= hits_es
            AND hits_en >= hits_fr THEN 'en'
          WHEN hits_de >= hits_es AND hits_de >= hits_fr THEN 'de'
          WHEN hits_es >= hits_fr THEN 'es'
          ELSE 'fr' END""").as("lang_pred"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id, lang AS lang_label, hits_en, hits_de, hits_es,
      hits_fr,
      CASE
        WHEN hits_en >= hits_de AND hits_en >= hits_es
          AND hits_en >= hits_fr THEN 'en'
        WHEN hits_de >= hits_es AND hits_de >= hits_fr THEN 'de'
        WHEN hits_es >= hits_fr THEN 'es'
        ELSE 'fr' END AS lang_pred
      FROM (
        SELECT doc_id, lang,
          len(list_filter(string_split(text, ' '),
            t -> t IN ('the','a','of','to','and','is'))) AS hits_en,
          len(list_filter(string_split(text, ' '),
            t -> t IN ('der','die','das','und','ist'))) AS hits_de,
          len(list_filter(string_split(text, ' '),
            t -> t IN ('el','los','las','y','es'))) AS hits_es,
          len(list_filter(string_split(text, ' '),
            t -> t IN ('le','les','et','est','une'))) AS hits_fr
        FROM documents)
      ORDER BY doc_id"""))

  /** Document fingerprinting: content hash (md5), head-shingle hash, and
    * a rolling polynomial hash over characters (mod a prime, so the fold
    * stays in 64-bit range on both engines).
    *
    * The rolling hash is the native codegen'd
    * [[graft.expressions.RollHash]] — one fused O(n) loop per document.
    * The original HOF formulation (`aggregate(regexp_extract_all(text,
    * '.', 0), ...)`) paid one regex match per CHARACTER plus an
    * interpreted lambda per element, and was the registry's worst
    * scale point at the sf3 canary (48 s, near-serial); RollHashSpec
    * pins the two row-equal.
    */
  private val q16 = QueryDef(
    "q16_fingerprint",
    (s, dir) => docs(s, dir).select(
      col("doc_id"),
      md5(col("text")).as("fp_md5"),
      md5(concat_ws(" ", slice(split(col("text"), " "), 1, 5)))
        .as("fp_head"),
      expr("graft_roll_hash(text)").as("fp_roll"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
      md5(text) AS fp_md5,
      md5(array_to_string(list_slice(string_split(text, ' '), 1, 5), ' '))
        AS fp_head,
      list_reduce(
        list_prepend(cast(0 AS BIGINT),
          list_transform(regexp_extract_all(text, '.', 0),
            c -> cast(ascii(c) AS BIGINT))),
        (acc, c) -> (acc * 31 + c) % 1000000007) AS fp_roll
      FROM documents ORDER BY doc_id"""))

  // ---------- q55: bigram collocations (lift-ranked) ------------------

  /** Corpus-level collocation mining: adjacent token pairs ranked by
    * lift = P(xy) / (P(x)·P(y)) — computed as the single exact-integer
    * division (n_xy · N_uni · N_uni) / (N_bi · n_x · n_y), so the score
    * is bit-identical across engines (PMI's log() would not be). The
    * distributed shape is the posting-table pattern: tokens explode to
    * rows once, bigrams come from a per-doc window `lead`, and the
    * unigram side joins back as two broadcast-able vocab aggregates —
    * never a corpus-wide sort. min-count filter drops rare-pair noise;
    * the final top-20 is a TakeOrdered under a total order.
    */
  private val MinPair = 5

  private val q55 = QueryDef(
    "q55_collocations",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.PlanCache
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val toks = docs(s, dir)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w1")))
      // Both vocab tables live in PlanCache for the run (persist-then-
      // unpersist-before-action dropped the cache before it was ever
      // used); the corpus totals N_uni / N_bi fold into the plan as
      // 1-row aggregates over those SAME cached tables (N_uni = Σ n),
      // so the whole query is one job with zero driver-side passes.
      val uni = PlanCache.getOrBuild(s, dir, "q55_uni")(
        toks.groupBy(col("w1")).agg(count(lit(1)).as("n")))
      val bi = PlanCache.getOrBuild(s, dir, "q55_bi")(
        toks.withColumn("w2", lead(col("w1"), 1).over(w))
          .where(col("w2").isNotNull)
          .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_xy")))
      val nu = uni.agg(sum(col("n")).as("n_uni"))
      val nb = bi.agg(sum(col("n_xy")).as("n_bi"))
      bi.where(col("n_xy") >= MinPair)
        .join(uni.select(col("w1"), col("n").as("n_x")), "w1")
        .join(uni.select(col("w1").as("w2"), col("n").as("n_y")), "w2")
        .crossJoin(nu).crossJoin(nb)
        .select(col("w1"), col("w2"), col("n_xy"),
          ((col("n_xy") * col("n_uni") * col("n_uni")).cast("double")
            / (col("n_x") * col("n_y") * col("n_bi"))).as("lift"))
        .orderBy(col("lift").desc, col("w1"), col("w2"))
        .limit(20)
    },
    Some(s"""WITH toks AS (SELECT doc_id,
          generate_subscripts(parts, 1) AS pos, unnest(parts) AS w1
        FROM (SELECT doc_id, string_split(text, ' ') AS parts
          FROM documents)),
      uni AS (SELECT w1, count(*) AS n FROM toks GROUP BY 1),
      nu AS (SELECT count(*) AS n_uni FROM toks),
      bi AS (SELECT w1, lead(w1) OVER (PARTITION BY doc_id ORDER BY pos)
          AS w2 FROM toks),
      bic AS (SELECT w1, w2, count(*) AS n_xy FROM bi
        WHERE w2 IS NOT NULL GROUP BY 1, 2),
      nb AS (SELECT sum(n_xy)::BIGINT AS n_bi FROM bic)
      SELECT bic.w1, bic.w2, n_xy,
        (n_xy * n_uni * n_uni)::DOUBLE / (x.n * y.n * n_bi) AS lift
      FROM bic, nu, nb
      JOIN uni x ON x.w1 = bic.w1
      JOIN uni y ON y.w1 = bic.w2
      WHERE n_xy >= $MinPair
      ORDER BY lift DESC, bic.w1, bic.w2 LIMIT 20"""))

  // ---------- q64: sequence packing (concat-then-chunk) ----------------

  private val PackCap = 2048L

  /** Pack the corpus into fixed-capacity training sequences: documents
    * are laid end-to-end in deterministic (lang, doc_id) order and
    * chunked every `PackCap` tokens — the concat-then-chunk packing
    * most pretraining pipelines use (not per-doc padding, which wastes
    * capacity). A document's bin is where its FIRST token lands;
    * boundary-spanning docs belong to the bin they start in, the
    * trainer's chunker owns the actual split. Output is the per-bin
    * manifest (doc count, token count, doc-id span) a loader shards by.
    *
    * Scale: the running offset is a window PARTITIONED BY lang —
    * packing is per language shard, so each partition sorts
    * independently and no global total order exists anywhere in the
    * plan (a single global pack would serialize the corpus through one
    * partition; per-shard packing is what real pipelines do anyway —
    * swap `lang` for the shard key of choice).
    */
  private val q64 = QueryDef(
    "q64_seq_packing",
    (s, dir) => {
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      docs(s, dir)
        .select(col("lang"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("off", coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .withColumn("bin", expr(s"off div $PackCap"))
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy("lang", "bin")
    },
    Some(s"""WITH sized AS (SELECT lang, doc_id,
        len(string_split(text, ' '))::BIGINT AS n_tok FROM documents),
      placed AS (SELECT lang, doc_id, n_tok,
        COALESCE(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        FROM sized)
      SELECT lang, (off // $PackCap)::BIGINT AS bin,
        count(*) AS n_docs, sum(n_tok)::BIGINT AS n_tokens,
        min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM placed GROUP BY 1, 2 ORDER BY lang, bin"""))

  // ---------- q84: vocabulary growth curve (Heaps-law audit) ----------

  /** Cumulative vocabulary size at 10 corpus-prefix checkpoints — the
    * Heaps-law curve (vocab ≈ K·nᵝ) data curators read to judge corpus
    * diversity: a flattening curve means new documents stop
    * contributing new vocabulary (duplication / narrow domain), a
    * steep one means the corpus is still "fresh".
    *
    * A running set-union is inherently sequential, so the distributed
    * form inverts it: each token's FIRST document (one min-aggregate
    * over the exploded token table) makes "vocab after the first k
    * docs" a plain count of tokens with first_doc < k — the prefix
    * checkpoints become a 10-row broadcast spine joined by inequality,
    * and the whole curve is one corpus pass + one tiny join, at any
    * scale. Checkpoints are corpus-relative (deciles of the id space,
    * integer arithmetic) so the query is SF-independent.
    */
  private val q84 = QueryDef(
    "q84_vocab_growth",
    (s, dir) => {
      val first = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok")).agg(min(col("doc_id")).as("first_doc"))
      val n = docs(s, dir).agg((max(col("doc_id")) + 1).as("n_docs"))
      val spine = s.range(1, 11).select(col("id").cast("int").as("decile"))
        .crossJoin(n)
        .select(col("decile"),
          expr("(decile * n_docs) div 10").as("docs_seen"))
      first.join(broadcast(spine), col("first_doc") < col("docs_seen"))
        .groupBy(col("decile"), col("docs_seen"))
        .agg(count(lit(1)).as("vocab"))
        .orderBy("decile")
    },
    Some("""WITH first AS (SELECT tok, min(doc_id) AS first_doc
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents) GROUP BY tok),
      n AS (SELECT max(doc_id) + 1 AS n_docs FROM documents),
      spine AS (SELECT d.decile::INTEGER AS decile,
          (d.decile * n_docs) // 10 AS docs_seen
        FROM generate_series(1, 10) d(decile), n)
      SELECT decile, docs_seen, count(*)::BIGINT AS vocab
      FROM first JOIN spine ON first_doc < docs_seen
      GROUP BY decile, docs_seen ORDER BY decile"""))

  // ---------- q97: Zipf-law slope fit ---------------------------------

  /** OLS slope of ln(freq) on ln(rank) over the top-100 corpus terms —
    * the Zipf exponent (natural text ≈ −1): a corpus whose slope
    * drifts is template-heavy (too steep) or boilerplate/ID-rich (too
    * flat), the single cheapest distribution-shape alarm on a new
    * data source, and the complement of q84's Heaps curve (type growth)
    * and q63's heavy-hitter list (which terms, not what law).
    * Rank is total-ordered (n desc, w1) over the PlanCache'd q55
    * unigram table — the corpus appears only through that aggregate;
    * the top-100 is a TakeOrdered, never a full sort. Determinism:
    * both ln() calls are pinned round(…, 12) at the row (q85 rule),
    * the four OLS moment terms are single IEEE products carried in
    * DECIMAL(38,18) for order-free sums, and the closed-form slope is
    * one identical double expression, rounded once to 12.
    */
  private val ZipfK = 100

  private val q97 = QueryDef(
    "q97_zipf_slope",
    (s, dir) => {
      import graft.ops.PlanCache
      import org.apache.spark.sql.types.DecimalType
      val toks = docs(s, dir)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w1")))
      val uni = PlanCache.getOrBuild(s, dir, "q55_uni")(
        toks.groupBy(col("w1")).agg(count(lit(1)).as("n")))
      // TakeOrdered first (per-partition top-K + merge, never a full
      // sort of the vocab table); the rank window then runs over ≤ K
      // rows — the q159 tiny-aggregate class, not a vocab-sized sort.
      val ranked = uni
        .orderBy(col("n").desc, col("w1")).limit(ZipfK)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("n").desc, col("w1"))))
        .withColumn("x", round(log(col("rank").cast("double")), 12))
        .withColumn("y", round(log(col("n").cast("double")), 12))
      def d(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 18))
      ranked
        .agg(count(lit(1)).as("k"), sum(d(col("x"))).as("sx"),
          sum(d(col("y"))).as("sy"), sum(d(col("x") * col("y"))).as("sxy"),
          sum(d(col("x") * col("x"))).as("sxx"))
        .select(col("k"),
          round((col("k").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
            / (col("k").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double")), 12)
            .as("zipf_slope"))
    },
    Some(s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w1
        FROM documents),
      uni AS (SELECT w1, count(*) AS n FROM toks GROUP BY 1),
      ranked AS (SELECT n, row_number() OVER (ORDER BY n DESC, w1)
          AS rank FROM uni),
      pts AS (SELECT round(ln(rank::DOUBLE), 12) AS x,
          round(ln(n::DOUBLE), 12) AS y
        FROM ranked WHERE rank <= $ZipfK),
      m AS (SELECT count(*) AS k,
          sum(cast(x AS DECIMAL(38,18))) AS sx,
          sum(cast(y AS DECIMAL(38,18))) AS sy,
          sum(cast(x * y AS DECIMAL(38,18))) AS sxy,
          sum(cast(x * x AS DECIMAL(38,18))) AS sxx FROM pts)
      SELECT k::BIGINT AS k,
        round((k::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
          / (k::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 12)
          AS zipf_slope
      FROM m"""))

  // ---------- q119: bigram LM surprisal scoring ------------------------

  /** Per-document average surprisal (negative log-likelihood per
    * bigram) under the corpus's own add-one-smoothed bigram model —
    * the cheap LM-quality signal pipelines use to flag gibberish,
    * boilerplate, and out-of-domain text before spending real
    * inference on it (q103's idea, pointed at text instead of event
    * streams). Model: p(w₂|w₁) = (c(w₁w₂)+1) / (ctx(w₁)+V), with
    * ctx(w₁) = bigram occurrences starting at w₁ (so rows sum to 1
    * exactly) and V the unigram vocabulary size. Determinism: ln() is
    * evaluated ONCE per distinct bigram TYPE (≤ |observed bigrams|
    * rows, not per instance) and pinned to integer nano-units (q103's
    * rule); each doc's NLL is then an exact int64 sum over its
    * instances, divided once at the end. Shape: both vocab tables come
    * from the q55 PlanCache (zero extra corpus passes for the model);
    * scoring is one join of doc-bigram instances against the model on
    * the bigram key — by construction every instance hits (the doc IS
    * part of the corpus), so no smoothing fallback path is needed in
    * the join itself.
    */
  private val q119 = QueryDef(
    "q119_bigram_surprisal",
    (s, dir) => {
      import graft.ops.PlanCache
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      // spread (r15): split+posexplode otherwise runs inside the
      // single-row-group scan task before the window's shuffle
      val toks = graft.Fixtures.spread(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w1")))
      // frozen (r15): the scoring join re-derived the tokenize+lead
      // instance table even though the bigram model comes from the
      // PlanCache — one window pass now feeds both the (cached) model
      // build and the scoring side
      val inst = PlanCache.freeze(
        toks.withColumn("w2", lead(col("w1"), 1).over(w))
          .where(col("w2").isNotNull))
      val uni = PlanCache.getOrBuild(s, dir, "q55_uni")(
        toks.groupBy(col("w1")).agg(count(lit(1)).as("n")))
      val bi = PlanCache.getOrBuild(s, dir, "q55_bi")(
        inst.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_xy")))
      val vocab = uni.agg(count(lit(1)).as("v"))
      val ctx = bi.groupBy(col("w1")).agg(sum(col("n_xy")).as("cx"))
      val model = bi.join(ctx, "w1").crossJoin(broadcast(vocab))
        .select(col("w1"), col("w2"),
          (-round(log((col("n_xy") + lit(1L)).cast("double")
            / (col("cx") + col("v")).cast("double")) * lit(1e9)))
            .cast("long").as("nll_units"))
      inst
        .join(model, Seq("w1", "w2"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("nll_units")).as("su"))
        .select(col("doc_id"), col("n_bigrams"),
          (col("su").cast("double")
            / (col("n_bigrams").cast("double") * lit(1e9))).as("avg_nll"))
        .orderBy("doc_id")
    },
    Some("""WITH toks AS (SELECT doc_id,
          generate_subscripts(parts, 1) AS pos, unnest(parts) AS w1
        FROM (SELECT doc_id, string_split(text, ' ') AS parts
          FROM documents)),
      uni AS (SELECT w1, count(*) AS n FROM toks GROUP BY 1),
      vocab AS (SELECT count(*) AS v FROM uni),
      inst AS (SELECT doc_id, w1,
          lead(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM toks),
      bic AS (SELECT w1, w2, count(*) AS n_xy FROM inst
        WHERE w2 IS NOT NULL GROUP BY 1, 2),
      ctx AS (SELECT w1, sum(n_xy) AS cx FROM bic GROUP BY 1),
      model AS (SELECT bic.w1, bic.w2,
          -round(ln((n_xy + 1)::DOUBLE / (cx + v)::DOUBLE) * 1e9)::BIGINT
            AS nll_units
        FROM bic JOIN ctx ON ctx.w1 = bic.w1, vocab)
      SELECT i.doc_id, count(*)::BIGINT AS n_bigrams,
        sum(nll_units)::DOUBLE / (count(*)::DOUBLE * 1e9) AS avg_nll
      FROM inst i JOIN model m ON m.w1 = i.w1 AND m.w2 = i.w2
      WHERE i.w2 IS NOT NULL
      GROUP BY i.doc_id ORDER BY i.doc_id"""))

  // ---------- q121: packing efficiency report --------------------------

  /** The acceptance check on q64's packing manifest: per-language bin
    * utilization — tokens packed vs bin capacity consumed — plus the
    * fill spread (min/max tokens landing in a bin). Concat-then-chunk
    * guarantees interior bins fill to capacity, so utilization below
    * ~1 − 1/(2·bins) means the shard key is fragmenting the corpus
    * into too many short tails (the signal to coarsen shards before a
    * training run wastes accelerator steps on padding). All counts
    * exact int64; utilization and mean fill are one division each.
    * Shape: exactly q64's per-lang window pass (same shuffle), folded
    * to |langs| rows.
    */
  private val q121 = QueryDef(
    "q121_pack_efficiency",
    (s, dir) => {
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      docs(s, dir)
        .select(col("lang"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("off", coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .withColumn("bin", expr(s"off div $PackCap"))
        .groupBy(col("lang"), col("bin"))
        .agg(sum(col("n_tok")).as("bin_tokens"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_bins"), sum(col("bin_tokens")).as("n_tokens"),
          min(col("bin_tokens")).as("min_fill"),
          max(col("bin_tokens")).as("max_fill"))
        .select(col("lang"), col("n_bins"), col("n_tokens"),
          col("min_fill"), col("max_fill"),
          (col("n_tokens").cast("double")
            / (col("n_bins") * lit(PackCap)).cast("double"))
            .as("utilization"))
        .orderBy("lang")
    },
    Some(s"""WITH sized AS (SELECT lang, doc_id,
        len(string_split(text, ' '))::BIGINT AS n_tok FROM documents),
      placed AS (SELECT lang, doc_id, n_tok,
        COALESCE(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          // $PackCap AS bin
        FROM sized),
      bins AS (SELECT lang, bin, sum(n_tok) AS bin_tokens
        FROM placed GROUP BY 1, 2)
      SELECT lang, count(*)::BIGINT AS n_bins,
        sum(bin_tokens)::BIGINT AS n_tokens,
        min(bin_tokens)::BIGINT AS min_fill,
        max(bin_tokens)::BIGINT AS max_fill,
        sum(bin_tokens)::DOUBLE / (count(*) * $PackCap)::DOUBLE
          AS utilization
      FROM bins GROUP BY lang ORDER BY lang"""))

  // ---------- q133: vocabulary coverage / OOV rate ----------------------

  /** Per-document out-of-vocabulary rate against the corpus's own
    * top-1000 token vocabulary — the tokenizer-fit signal: a doc with
    * high OOV share will fragment into byte-fallback pieces under a
    * fixed vocab (inflating its real token cost and degrading model
    * quality on it), so corpus OOV profiles drive vocab size and
    * retraining decisions. The vocab is the q97-style frequency
    * ranking cut at 1000 (deterministic (n DESC, token) order, from
    * the PlanCache'd unigram table — no extra corpus pass); scoring is
    * one broadcast LEFT join of token instances against it, so the
    * corpus is touched once and never shuffled on anything wider than
    * it already was. Counts exact; oov_rate is one division.
    */
  private val q133 = QueryDef(
    "q133_oov_rate",
    (s, dir) => {
      import graft.ops.PlanCache
      val toks = docs(s, dir)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w1")))
      val uni = PlanCache.getOrBuild(s, dir, "q55_uni")(
        toks.groupBy(col("w1")).agg(count(lit(1)).as("n")))
      // the rank is only a membership cut — TakeOrdered (per-partition
      // top-1000 + merge) replaces the former vocab-sized rank window
      val vocab = uni
        .orderBy(col("n").desc, col("w1")).limit(1000)
        .select(col("w1"), lit(1L).as("in_vocab"))
      toks.join(broadcast(vocab), Seq("w1"), "left_outer")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
        .select(col("doc_id"), col("n_tokens"), col("n_oov"),
          (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
        .orderBy("doc_id")
    },
    Some("""WITH toks AS (SELECT doc_id,
          unnest(string_split(text, ' ')) AS w1 FROM documents),
      uni AS (SELECT w1, count(*) AS n FROM toks GROUP BY 1),
      ranked AS (SELECT w1, row_number() OVER (ORDER BY n DESC, w1)
          AS rank FROM uni),
      vocab AS (SELECT w1, 1 AS in_vocab FROM ranked WHERE rank <= 1000)
      SELECT doc_id, count(*)::BIGINT AS n_tokens,
        sum(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END)::BIGINT
          AS n_oov,
        sum(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END)::DOUBLE
          / count(*) AS oov_rate
      FROM toks LEFT JOIN vocab USING (w1)
      GROUP BY doc_id ORDER BY doc_id"""))

  // ---------- q145: language keyness (distinctive terms) ----------------

  /** The 3 most OVER-represented terms per language: keyness lift =
    * (term's in-language share) / (term's corpus share) — the
    * vocabulary fingerprint q15's language-ID heuristic rests on, and
    * the drift check for it (a language whose key terms stop being
    * stopword-like says the lang labels or the corpus changed). A
    * min-count floor (≥ 5 in-language occurrences) keeps singletons
    * from dominating the lift ranking — the standard keyness guard.
    * Lift is one exact-int expression evaluated identically both
    * sides ((c·N)/(T·n) as a single double division); ranking is
    * (lift DESC, term) per language. Shape: one (lang, term) corpus
    * aggregate ⋈ the PlanCache'd unigram table on the term key, then
    * the q30 bounded top-k Aggregator per language (map-side buffers
    * cap each partition's contribution at 3 rows per lang BEFORE the
    * shuffle — the window form would sort one language's whole
    * vocabulary on one task), 3·|langs| rows out.
    */
  private val q145 = QueryDef(
    "q145_lang_keyness",
    (s, dir) => {
      import graft.ops.{PlanCache, TopK}
      import s.implicits._
      val lcounts = docs(s, dir)
        .select(col("lang"), explode(split(col("text"), " ")).as("w1"))
        .groupBy(col("lang"), col("w1")).agg(count(lit(1)).as("c"))
      val toks = docs(s, dir)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w1")))
      val uni = PlanCache.getOrBuild(s, dir, "q55_uni")(
        toks.groupBy(col("w1")).agg(count(lit(1)).as("n")))
      val nTot = uni.agg(sum(col("n")).as("nn"))
      val lTot = lcounts.groupBy(col("lang")).agg(sum(col("c")).as("t"))
      lcounts.where(col("c") >= 5)
        .join(uni, "w1")
        .join(lTot, "lang")
        .crossJoin(broadcast(nTot))
        .select(col("lang").as("grp"), col("w1").as("id"),
          ((col("c") * col("nn")).cast("double")
            / (col("t") * col("n")).cast("double")).as("score"),
          col("c"))
        .as[TopK.GScored]
        .groupByKey(_.grp)
        .agg(new TopK.TopKStrAgg(3).toColumn.name("topk"))
        .flatMap { case (lang, top) =>
          top.zipWithIndex.map { case (t, i) =>
            (lang, i + 1, t.id, t.c, t.score)
          }
        }
        .toDF("lang", "rnk", "w1", "c", "lift")
        .orderBy("lang", "rnk")
    },
    Some("""WITH ltoks AS (SELECT lang,
          unnest(string_split(text, ' ')) AS w1 FROM documents),
      lcounts AS (SELECT lang, w1, count(*) AS c FROM ltoks GROUP BY 1, 2),
      uni AS (SELECT w1, count(*) AS n FROM ltoks GROUP BY 1),
      ntot AS (SELECT sum(n)::BIGINT AS nn FROM uni),
      ltot AS (SELECT lang, sum(c)::BIGINT AS t FROM lcounts GROUP BY 1),
      lifted AS (SELECT lcounts.lang, lcounts.w1, c,
          (c * nn)::DOUBLE / (t * n)::DOUBLE AS lift
        FROM lcounts
        JOIN uni ON uni.w1 = lcounts.w1
        JOIN ltot ON ltot.lang = lcounts.lang, ntot
        WHERE c >= 5),
      ranked AS (SELECT lang, w1, c, lift, row_number() OVER (
          PARTITION BY lang ORDER BY lift DESC, w1) AS rnk
        FROM lifted)
      SELECT lang, rnk, w1, c::BIGINT AS c, lift FROM ranked
      WHERE rnk <= 3 ORDER BY lang, rnk"""))

  // ---------- q153: overlapping context-window chunking -----------------

  /** Split every document into 32-token chunks on a 24-token stride
    * (8-token overlap) — the other half of context-window prep: q64
    * PACKS short documents up to the window, this SPLITS long ones
    * down to it, and real pipelines run both. The overlap is the
    * standard continuity margin so no sentence is ever seen only cut
    * in half. Contract: chunk starts at every stride position ≤ the
    * doc's token count (the tail chunk may be short — downstream
    * packing handles it; a doc shorter than one window is exactly its
    * own single chunk), chunk_idx = (start−1) div stride, and the
    * chunk's identity is the md5 of its token slice, so the output
    * stays (ids, ints, 16-byte key) — chunk TEXT never leaves the
    * executor. Shape: explode of a per-row `sequence` of starts, then
    * a pure projection slicing the already-split token array — no
    * shuffle at all except the output sort; at 100 TB this is scan-
    * bound exactly like q13.
    */
  private val ChunkLen = 32
  private val ChunkStride = 24
  private val q153 = QueryDef(
    "q153_chunk_overlap",
    (s, dir) => {
      val t = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("parts"))
        .withColumn("n", size(col("parts")))
      t.select(col("doc_id"), col("parts"), col("n"),
          explode(sequence(lit(1), col("n"), lit(ChunkStride))).as("start"))
        .select(col("doc_id"),
          expr(s"(start - 1) div $ChunkStride").cast("long").as("chunk_idx"),
          col("start").cast("long").as("start_tok"),
          (least(col("start") + lit(ChunkLen - 1), col("n")) - col("start")
            + lit(1)).cast("long").as("n_tokens"),
          md5(array_join(slice(col("parts"), col("start"),
            least(col("start") + lit(ChunkLen - 1), col("n"))
              - col("start") + lit(1)), " ")).as("chunk_key"))
        .orderBy("doc_id", "chunk_idx")
    },
    Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS parts,
          len(string_split(text, ' ')) AS n FROM documents),
      starts AS (SELECT doc_id, n, parts,
          unnest(range(1, n + 1, $ChunkStride)) AS start FROM t)
      SELECT doc_id,
        ((start - 1) // $ChunkStride)::BIGINT AS chunk_idx,
        start::BIGINT AS start_tok,
        (least(start + ${ChunkLen - 1}, n) - start + 1)::BIGINT AS n_tokens,
        md5(array_to_string(
          parts[start:least(start + ${ChunkLen - 1}, n)], ' ')) AS chunk_key
      FROM starts ORDER BY doc_id, chunk_idx"""))

  // ---------- q155: BPE merge step (tokenizer training's inner loop) ----

  /** The first BPE merge iteration over the corpus: corpus-weighted
    * counts of adjacent character pairs inside whitespace tokens, top
    * 20 — the candidate ranking a byte-pair-encoding tokenizer
    * trainer computes every iteration (the argmax IS the next merge
    * rule; q13's regex pretokenizer is the stage before this, and
    * iterating = re-running with merges applied). Scale shape is the
    * point: the corpus appears ONLY through the cached q55 vocab
    * aggregate — pair generation explodes the DISTINCT vocabulary
    * (thousands of rows) weighted by corpus frequency, never the
    * corpus itself, so the whole step after the shared unigram pass
    * is driver-trivial at any corpus size. Pairs come from
    * `substring(w, i, 2)` directly — no char-array split, whose
    * empty-delimiter semantics differ across engines. Single-char
    * tokens have no pairs and are filtered BEFORE the sequence
    * explode (Spark's `sequence(1, 0)` would go descending, the q20
    * trap). Exact integer counts; ties broken by pair text. The
    * final rank window is global but its input is the top-20 of the
    * distinct char-bigram table (domain ≤ |alphabet|², reduced
    * map-side; the top-20 itself is a distributed TakeOrdered) — the
    * same bounded-scalar class as the 1-row crossJoin aggregates.
    */
  private val q155 = QueryDef(
    "q155_bpe_merge",
    (s, dir) => {
      import graft.ops.PlanCache
      val toks = docs(s, dir)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w1")))
      val uni = PlanCache.getOrBuild(s, dir, "q55_uni")(
        toks.groupBy(col("w1")).agg(count(lit(1)).as("n")))
      val pairs = uni.where(length(col("w1")) >= 2)
        .select(col("w1"), col("n"),
          explode(sequence(lit(1), length(col("w1")) - 1)).as("i"))
        .select(expr("substring(w1, i, 2)").as("pair"), col("n"))
        .groupBy(col("pair")).agg(sum(col("n")).as("n"))
      pairs
        .orderBy(col("n").desc, col("pair")).limit(20)
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("n").desc, col("pair"))))
        .select(col("rnk").cast("long").as("rnk"), col("pair"), col("n"))
        .orderBy("rnk")
    },
    Some("""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w
        FROM documents),
      uni AS (SELECT w, count(*) AS f FROM toks GROUP BY 1),
      ex AS (SELECT w, f, unnest(range(1, length(w))) AS i
        FROM uni WHERE length(w) >= 2),
      agg AS (SELECT substring(w, i, 2) AS pair, sum(f) AS n
        FROM ex GROUP BY 1),
      ranked AS (SELECT pair, n,
          row_number() OVER (ORDER BY n DESC, pair) AS rnk FROM agg)
      SELECT rnk::BIGINT AS rnk, pair, n::BIGINT AS n
      FROM ranked WHERE rnk <= 20 ORDER BY rnk"""))

  // ---------- q165: sentence segmentation stats --------------------------

  /** Sentence-level corpus profile: segment on terminal punctuation
    * runs ([.!?]+ — the regex class both engines' RE dialects read
    * identically), drop whitespace-only fragments, and report per
    * language the sentence count and mean words-per-sentence / chars-
    * per-sentence. Means are exact-integer sums divided once at the
    * end (round 12) — never a float average over an unordered stream.
    * Shape: one explode per document (output rows ∝ corpus sentences,
    * map-side only), one aggregate on lang — segmentation never
    * shuffles the raw text.
    */
  private val q165 = QueryDef(
    "q165_sentence_stats",
    (s, dir) => {
      val sent = docs(s, dir)
        .select(col("lang"),
          explode(split(col("text"), "[.!?]+")).as("sent"))
        .select(col("lang"), trim(col("sent")).as("sent"))
        .where(length(col("sent")) > 0)
      sent.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sentences"),
          sum(size(split(col("sent"), "\\s+"))).as("sw"),
          sum(length(col("sent"))).as("sc"))
        .select(col("lang"), col("n_sentences"),
          round(col("sw").cast("double") / col("n_sentences"), 12)
            .as("avg_words"),
          round(col("sc").cast("double") / col("n_sentences"), 12)
            .as("avg_chars"))
        .orderBy("lang")
    },
    Some("""WITH sent AS (SELECT lang, trim(x.s) AS sent
        FROM documents,
          unnest(string_split_regex(text, '[.!?]+')) AS x(s)
        WHERE length(trim(x.s)) > 0)
      SELECT lang, count(*)::BIGINT AS n_sentences,
        round(sum(length(string_split_regex(sent, '\s+')))::DOUBLE
          / count(*), 12) AS avg_words,
        round(sum(length(sent))::DOUBLE / count(*), 12) AS avg_chars
      FROM sent GROUP BY lang ORDER BY lang"""))

  // ---------- q177: per-document tf-idf keywords ----------------------

  /** Top-3 keywords per document by tf·idf — the per-doc summary a
    * retrieval or curation UI wants next to every document. Reuses the
    * PlanCache'd (doc, tok, tf) table the sparse-retrieval family
    * (q57/q93/q115) already materializes, joins the |vocab|-sized df
    * table on the token key (a shuffle join on purpose — at 100 TB the
    * vocab is executor-sized, not driver-sized; the q172 rule), and
    * ranks inside each doc partition only (|doc| rows each, never a
    * global sort). idf = ln(N/df) is one ln of one double division of
    * exact int64 counts and tf·idf one multiply, pinned round(…, 12)
    * at the row (the q85/q97 ln rule — JVM and DuckDB libm ln differ
    * in the last ulp) BEFORE ranking, so both engines rank identical
    * values — with ties broken lexically so the rank is total.
    */
  private val q177 = QueryDef(
    "q177_tfidf_keywords",
    (s, dir) => {
      val tf = graft.ops.PlanCache.getOrBuild(s, dir, "q57_tf")(
        docs(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf")))
      val dfTab = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val nDocs = docs(s, dir).agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("tok"))
      tf.join(dfTab, "tok")
        .crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("tok"),
          round(col("tf").cast("double") *
            log(col("n_docs").cast("double") / col("df").cast("double")), 12)
            .as("score"))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("tok"), col("score"))
        .orderBy("doc_id", "rank")
    },
    Some("""WITH tf AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents),
      tfc AS (SELECT doc_id, tok, count(*) AS tf FROM tf GROUP BY 1, 2),
      df AS (SELECT tok, count(*) AS df FROM tfc GROUP BY 1),
      n AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (SELECT doc_id, tok,
          round(tf::DOUBLE * ln(n_docs::DOUBLE / df::DOUBLE), 12) AS score
        FROM tfc JOIN df USING (tok), n),
      ranked AS (SELECT doc_id, tok, score,
          row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, tok) AS rank
        FROM scored)
      SELECT doc_id, rank::INT AS rank, tok, score FROM ranked
      WHERE rank <= 3 ORDER BY doc_id, rank"""))

  // ---------- q198: language-ID confusion matrix ----------------------

  /** Confusion matrix of the q15 stopword classifier against the
    * labeled `lang` column — the classifier AUDIT a pipeline runs
    * before trusting an automatic language filter: which labels leak
    * into which predictions, and each label's recall. Reuses q15's
    * exact prediction (same QueryDef function, so the two can never
    * drift), collapses to |langs|² cells, and computes recall as one
    * division of exact counts against the per-label broadcast total.
    * One corpus pass; output is vocabulary-of-labels sized.
    */
  private val q198 = QueryDef(
    "q198_langid_confusion",
    (s, dir) => {
      val pred = q15.fn(s, dir)
        .select(col("lang_label"), col("lang_pred"))
      val cells = pred.groupBy(col("lang_label"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
      val perLabel = cells.groupBy(col("lang_label"))
        .agg(sum(col("n")).as("n_label"))
      cells.join(broadcast(perLabel), "lang_label")
        .select(col("lang_label"), col("lang_pred"), col("n"),
          (col("n").cast("double") / col("n_label").cast("double"))
            .as("label_share"))
        .orderBy("lang_label", "lang_pred")
    },
    Some("""WITH pred AS (SELECT lang AS lang_label,
        CASE
          WHEN hits_en >= hits_de AND hits_en >= hits_es
            AND hits_en >= hits_fr THEN 'en'
          WHEN hits_de >= hits_es AND hits_de >= hits_fr THEN 'de'
          WHEN hits_es >= hits_fr THEN 'es'
          ELSE 'fr' END AS lang_pred
        FROM (
          SELECT lang,
            len(list_filter(string_split(text, ' '),
              t -> t IN ('the','a','of','to','and','is'))) AS hits_en,
            len(list_filter(string_split(text, ' '),
              t -> t IN ('der','die','das','und','ist'))) AS hits_de,
            len(list_filter(string_split(text, ' '),
              t -> t IN ('el','los','las','y','es'))) AS hits_es,
            len(list_filter(string_split(text, ' '),
              t -> t IN ('le','les','et','est','une'))) AS hits_fr
          FROM documents)),
      cells AS (SELECT lang_label, lang_pred, count(*) AS n
        FROM pred GROUP BY 1, 2),
      per_label AS (SELECT lang_label, sum(n)::BIGINT AS n_label
        FROM cells GROUP BY 1)
      SELECT lang_label, lang_pred, n,
        n::DOUBLE / n_label::DOUBLE AS label_share
      FROM cells JOIN per_label USING (lang_label)
      ORDER BY lang_label, lang_pred"""))

  // ---------- q199: quality quantile normalization by source ----------

  /** Rank-normalized quality per source: map every document's q14
    * quality score to its GLOBAL percentile (rank-1)/(N-1), then
    * report each source's mean raw score vs mean percentile — the
    * audit that says whether a curation threshold on the raw score
    * would systematically favor some sources (raw means can differ
    * while percentile means agree, and vice versa). Reuses q14's exact
    * scoring function (same QueryDef fn, can't drift); ranks are a
    * total order with doc_id tie-break; means pin to micro-units
    * before the order-insensitive integer sum. The global rank runs
    * the q149 boundary-broadcast two-pass row_number (RangeNtile,
    * per-shard sorts only; graft.ntile.strategy=window restores the
    * single-sort window form the spec compares against) — the ranked
    * table here is the whole corpus.
    */
  private val q199 = QueryDef(
    "q199_quality_quantile_norm",
    (s, dir) => {
      val joined = q14.fn(s, dir).select(col("doc_id"), col("quality"))
        .join(docs(s, dir).select(col("doc_id"), col("source")), "doc_id")
      val sortKey = Seq(col("quality"), col("doc_id"))
      val scored =
        if (s.conf.getOption("graft.ntile.strategy").contains("window"))
          joined.withColumn("rn",
            row_number().over(Window.orderBy(sortKey: _*)).cast("long"))
        else graft.ops.RangeNtile.withRowNumber(joined, sortKey, "rn")
      val n = scored.agg(count(lit(1)).as("n_all"))
      scored.crossJoin(broadcast(n))
        .select(col("source"),
          expr("CAST(round(quality * 1e6) AS BIGINT)").as("q_micro"),
          expr("""CAST(round(CAST(rn - 1 AS DOUBLE)
            / CAST(n_all - 1 AS DOUBLE) * 1e6) AS BIGINT)""").as("p_micro"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          (sum(col("q_micro")).cast("double")
            / count(lit(1)).cast("double") / 1e6).as("mean_quality"),
          (sum(col("p_micro")).cast("double")
            / count(lit(1)).cast("double") / 1e6).as("mean_percentile"))
        .orderBy("source")
    },
    Some("""WITH scored AS (SELECT doc_id,
          0.3 * ttr + 0.2 * (1.0 - stop_ratio) + 0.2 * alpha_ratio
            + 0.3 * len_factor AS quality
        FROM (
          SELECT doc_id,
            cast(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              / len(string_split(text, ' ')) AS ttr,
            cast(len(list_filter(string_split(text, ' '),
              t -> t IN ('the', 'a', 'of', 'to', 'and'))) AS DOUBLE)
              / len(string_split(text, ' ')) AS stop_ratio,
            1.0 - cast(len(regexp_replace(text, '[a-z ]', '', 'g'))
              AS DOUBLE) / len(text) AS alpha_ratio,
            least(cast(len(string_split(text, ' ')) AS DOUBLE) / 50.0, 1.0)
              AS len_factor
          FROM documents)),
      ranked AS (SELECT s.doc_id, d.source, s.quality,
          row_number() OVER (ORDER BY s.quality, s.doc_id) AS rn
        FROM scored s JOIN documents d ON d.doc_id = s.doc_id),
      n AS (SELECT count(*) AS n_all FROM ranked)
      SELECT source, count(*) AS n_docs,
        sum(round(quality * 1e6)::BIGINT)::DOUBLE
          / count(*)::DOUBLE / 1e6 AS mean_quality,
        sum(round((rn - 1)::DOUBLE / (n_all - 1)::DOUBLE * 1e6)::BIGINT)
          ::DOUBLE / count(*)::DOUBLE / 1e6 AS mean_percentile
      FROM ranked, n GROUP BY 1 ORDER BY source"""))

  /** q14's exact per-doc scorer, shared so cross-module consumers
    * (q199, q204) can never drift from the oracled definition. */
  private[graft] def q14Fn(s: SparkSession, dir: String): DataFrame =
    q14.fn(s, dir)

  // ---------- q215: lang-id chance-corrected agreement (kappa) ---------

  /** Cohen's kappa between the q15 predictor and the metadata label —
    * the chance-corrected score that q198's raw confusion matrix and
    * plain accuracy both overstate when one class (here 'en')
    * dominates: p_exp is what agreement by marginal-frequency luck
    * alone would score, and kappa discounts it. Reuses q15's exact
    * QueryDef fn (predictor can't drift from what q15/q198 gate);
    * everything after the |langs|²-cell confusion aggregate is
    * broadcast scalar arithmetic — marginal products, one diagonal
    * sum, three divisions — textually identical on both sides.
    * Labels the predictor never emits ('zh') contribute zero to
    * p_exp via the inner marginal join, matching the closed form.
    */
  private val q215 = QueryDef(
    "q215_langid_kappa",
    (s, dir) => {
      val cells = q15.fn(s, dir)
        .groupBy(col("lang_label"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
      val tot = cells.agg(sum(col("n")).as("n_docs"))
      val rowm = cells.groupBy(col("lang_label").as("k"))
        .agg(sum(col("n")).as("nr"))
      val colm = cells.groupBy(col("lang_pred").as("k"))
        .agg(sum(col("n")).as("nc"))
      val pe = rowm.join(colm, "k")
        .agg(sum(col("nr") * col("nc")).as("spc"))
      val po = cells.where(col("lang_label") === col("lang_pred"))
        .agg(sum(col("n")).as("diag"))
      po.crossJoin(broadcast(pe)).crossJoin(broadcast(tot))
        .select(col("n_docs"),
          (col("diag").cast("double") / col("n_docs").cast("double"))
            .as("p_obs"),
          (col("spc").cast("double")
            / (col("n_docs").cast("double") * col("n_docs").cast("double")))
            .as("p_exp"),
          ((col("diag").cast("double") / col("n_docs").cast("double")
            - col("spc").cast("double")
              / (col("n_docs").cast("double") * col("n_docs").cast("double")))
            / (lit(1.0) - col("spc").cast("double")
              / (col("n_docs").cast("double") * col("n_docs").cast("double"))))
            .as("kappa"))
    },
    Some("""WITH pred AS (SELECT lang AS lang_label,
        CASE
          WHEN hits_en >= hits_de AND hits_en >= hits_es
            AND hits_en >= hits_fr THEN 'en'
          WHEN hits_de >= hits_es AND hits_de >= hits_fr THEN 'de'
          WHEN hits_es >= hits_fr THEN 'es'
          ELSE 'fr' END AS lang_pred
        FROM (
          SELECT lang,
            len(list_filter(string_split(text, ' '),
              t -> t IN ('the','a','of','to','and','is'))) AS hits_en,
            len(list_filter(string_split(text, ' '),
              t -> t IN ('der','die','das','und','ist'))) AS hits_de,
            len(list_filter(string_split(text, ' '),
              t -> t IN ('el','los','las','y','es'))) AS hits_es,
            len(list_filter(string_split(text, ' '),
              t -> t IN ('le','les','et','est','une'))) AS hits_fr
          FROM documents)),
      cells AS (SELECT lang_label, lang_pred, count(*) AS n
        FROM pred GROUP BY 1, 2),
      tot AS (SELECT sum(n)::BIGINT AS n_docs FROM cells),
      r AS (SELECT lang_label AS k, sum(n)::BIGINT AS nr
        FROM cells GROUP BY 1),
      c AS (SELECT lang_pred AS k, sum(n)::BIGINT AS nc
        FROM cells GROUP BY 1),
      pe AS (SELECT sum(nr * nc)::BIGINT AS spc FROM r JOIN c USING (k)),
      po AS (SELECT sum(n)::BIGINT AS diag FROM cells
        WHERE lang_label = lang_pred)
      SELECT n_docs,
        diag::DOUBLE / n_docs::DOUBLE AS p_obs,
        spc::DOUBLE / (n_docs::DOUBLE * n_docs::DOUBLE) AS p_exp,
        (diag::DOUBLE / n_docs::DOUBLE
          - spc::DOUBLE / (n_docs::DOUBLE * n_docs::DOUBLE))
          / (1.0 - spc::DOUBLE / (n_docs::DOUBLE * n_docs::DOUBLE))
          AS kappa
      FROM po, pe, tot"""))

  // ---------- q217: top-bigram fraction (Gopher repetition rule) ------

  /** Per-source rollup of the "top 2-gram fraction" repetition rule
    * (Rae et al. 2021): the share of a document's bigram occurrences
    * taken by its single most frequent bigram — high values mean the
    * doc is one phrase repeated, the failure mode q43's duplicate-
    * trigram fraction under-weights (q43 asks how many DISTINCT
    * n-grams repeat; this asks how dominant the WORST one is). Bigrams
    * are built map-side with zip_with over two slices of the token
    * array (rows ∝ corpus bigrams, the raw text never shuffles), one
    * (doc, bigram) hash aggregate with map-side partials, a per-doc
    * max/sum, then the |sources|-row report: docs with ANY repeated
    * bigram, and the mean top-bigram share pinned to integer
    * micro-units per doc before the order-insensitive sum (one final
    * division chain, textually identical both engines). Docs with a
    * single token have no bigrams and fall out of the audit (every
    * fixture doc has hundreds).
    */
  private val q217 = QueryDef(
    "q217_top_bigram",
    (s, dir) => {
      val perDoc = docs(s, dir)
        .select(col("doc_id"), col("source"),
          explode(expr(
            """zip_with(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),
                 slice(split(text, ' '), 2, size(split(text, ' ')) - 1),
                 (a, b) -> concat(a, ' ', b))""")).as("bg"))
        .groupBy(col("doc_id"), col("source"), col("bg"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"), col("source"))
        .agg(max(col("c")).as("top_n"), sum(col("c")).as("n_bi"))
      perDoc
        .select(col("source"),
          (col("top_n") >= 2L).cast("long").as("has_rep"),
          round(col("top_n").cast("double") / col("n_bi").cast("double")
            * lit(1e6)).cast("long").as("share_micro"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("has_rep")).as("n_repetitive"),
          ((sum(col("share_micro")).cast("double")
            / count(lit(1)).cast("double")) / lit(1e6))
            .as("mean_top_share"))
        .orderBy("source")
    },
    Some("""WITH toks AS (SELECT doc_id, source,
          string_split(text, ' ') AS t FROM documents),
      bis AS (SELECT doc_id, source, t[i] || ' ' || t[i+1] AS bg
        FROM toks, unnest(range(1, len(t))) AS r(i)),
      bc AS (SELECT doc_id, source, bg, count(*) AS c
        FROM bis GROUP BY 1, 2, 3),
      pd AS (SELECT doc_id, source, max(c) AS top_n, sum(c) AS n_bi
        FROM bc GROUP BY 1, 2)
      SELECT source, count(*)::BIGINT AS n_docs,
        sum(CASE WHEN top_n >= 2 THEN 1 ELSE 0 END)::BIGINT
          AS n_repetitive,
        (sum(round(top_n::DOUBLE / n_bi::DOUBLE * 1e6)::BIGINT)::DOUBLE
          / count(*)::DOUBLE) / 1e6 AS mean_top_share
      FROM pd GROUP BY 1 ORDER BY source"""))

  // ---------- q244: DSIR-style importance weights -----------------------

  /** Data Selection with Importance Resampling (Xie et al. 2023) over
    * hashed-unigram features: per-document log importance weight
    * log p_target(doc) − log p_corpus(doc) under add-one-smoothed
    * unigram LMs, with the English slice standing in for the target
    * domain, reported per source as mean log-weight and the share of
    * documents a DSIR selection would favor (weight > 0). This is the
    * table a curation run reads to resample a raw crawl toward a
    * target domain without training a classifier. Determinism: the
    * per-TYPE log-ratio is computed once per vocab entry and pinned
    * to integer nano-units (q119's rule); each doc's weight is then
    * an exact int64 sum over its instances; per-source means divide
    * once. Shape: both LMs are vocab-sized aggregates off the cached
    * unigram table (the target adds one lang-filtered corpus pass);
    * scoring is one token-key join of instances against the model —
    * the corpus shuffles only its (doc_id, token-hash) projection,
    * exactly the q119 scoring shape.
    */
  /** q244's per-token log-importance model (w1, lw_units), shared with
    * the streaming twin ([[graft.streaming.DocStream.dsirScore]]) so
    * the batch and at-ingest scorers can never drift. Vocab-sized —
    * broadcastable to a stream the way production DSIR ships its
    * hashed-feature ratios to ingest workers.
    */
  private[graft] def dsirModel(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.PlanCache
    val toks = docs(s, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("w1"))
    val uni = PlanCache.getOrBuild(s, dir, "q55_uni")(
      docs(s, dir)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w1")))
        .groupBy(col("w1")).agg(count(lit(1)).as("n")))
    val tgt = toks.where(col("lang") === "en")
      .groupBy(col("w1")).agg(count(lit(1)).as("nt"))
    val scal = uni.agg(count(lit(1)).as("v"), sum(col("n")).as("nc"))
      .crossJoin(broadcast(
        tgt.agg(sum(col("nt")).as("ntot"))))
    uni.join(tgt, Seq("w1"), "left_outer")
      .crossJoin(broadcast(scal))
      .select(col("w1"),
        round((log((coalesce(col("nt"), lit(0L)) + lit(1L)).cast("double")
            / (col("ntot") + col("v")).cast("double"))
          - log((col("n") + lit(1L)).cast("double")
            / (col("nc") + col("v")).cast("double"))) * lit(1e9))
          .cast("long").as("lw_units"))
  }

  /** DuckDB mirror of [[dsirModel]] — one definition shared by q244 and
    * q271 so the two oracles can never de-synchronize from the model
    * contract. Yields a `model(w1, lw_units)` CTE; internal CTE names
    * are prefixed `m` to avoid colliding with consumers' own `toks`.
    */
  private[graft] val dsirModelDuckCte: String =
    """mtoks AS (SELECT lang, unnest(string_split(text, ' ')) AS w1
        FROM documents),
      uni AS (SELECT w1, count(*) AS n FROM mtoks GROUP BY 1),
      tgt AS (SELECT w1, count(*) AS nt FROM mtoks
        WHERE lang = 'en' GROUP BY 1),
      scal AS (SELECT (SELECT count(*) FROM uni) AS v,
        (SELECT sum(n) FROM uni) AS nc,
        (SELECT sum(nt) FROM tgt) AS ntot),
      model AS (SELECT uni.w1,
          round((ln((coalesce(nt, 0) + 1)::DOUBLE / (ntot + v)::DOUBLE)
            - ln((n + 1)::DOUBLE / (nc + v)::DOUBLE)) * 1e9)::BIGINT
            AS lw_units
        FROM uni LEFT JOIN tgt ON tgt.w1 = uni.w1, scal)"""

  private val q244 = QueryDef(
    "q244_dsir_importance",
    (s, dir) => {
      val toks = docs(s, dir)
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("w1"))
      toks.join(dsirModel(s, dir), "w1")
        .groupBy(col("doc_id"), col("source"))
        .agg(sum(col("lw_units")).as("lw"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("lw") > 0L, 1L).otherwise(0L)).as("n_favored"),
          (sum(col("lw")).cast("double")
            / count(lit(1)).cast("double") / lit(1e9)).as("mean_log_w"))
        .select(col("source"), col("n_docs"), col("n_favored"),
          col("mean_log_w"),
          (col("n_favored").cast("double") / col("n_docs").cast("double"))
            .as("favored_share"))
        .orderBy("source")
    },
    Some(s"""WITH $dsirModelDuckCte,
      toks AS (SELECT doc_id, source,
          unnest(string_split(text, ' ')) AS w1 FROM documents),
      perdoc AS (SELECT doc_id, source, sum(lw_units) AS lw
        FROM toks JOIN model ON model.w1 = toks.w1 GROUP BY 1, 2)
      SELECT source, count(*)::BIGINT AS n_docs,
        sum(CASE WHEN lw > 0 THEN 1 ELSE 0 END)::BIGINT AS n_favored,
        sum(lw)::DOUBLE / count(*)::DOUBLE / 1e9 AS mean_log_w,
        sum(CASE WHEN lw > 0 THEN 1 ELSE 0 END)::DOUBLE
          / count(*)::DOUBLE AS favored_share
      FROM perdoc GROUP BY 1 ORDER BY source"""))

  // ---------- q245: tokenizer fertility ---------------------------------

  /** Sub-word fertility (pieces per whitespace word) per language
    * under the corpus's own top-1000 vocabulary, with OOV words
    * costing ceil(len/3) byte-fallback pieces — the tokenizer-fit
    * number a vocab-size decision reads next to q133's OOV rate
    * (fertility says how much MORE compute an ill-fitting vocab burns
    * per word, not just how often it misses; cf. the fertility metric
    * in multilingual-tokenizer audits, e.g. Rust et al. 2021). The
    * piece rule is pure integer arithmetic ((len+2) div 3 — exact in
    * both engines); counts are exact int64; fertility is one final
    * division. Shape: the vocab comes from a TakeOrdered over the
    * cached unigram table (never a vocab-sized sort, the q133 rule)
    * and broadcasts against one token-instance pass.
    */
  private val q245 = QueryDef(
    "q245_tokenizer_fertility",
    (s, dir) => {
      import graft.ops.PlanCache
      val words = docs(s, dir)
        .select(col("lang"), explode(split(col("text"), " ")).as("w1"))
      val uni = PlanCache.getOrBuild(s, dir, "q55_uni")(
        docs(s, dir)
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "w1")))
          .groupBy(col("w1")).agg(count(lit(1)).as("n")))
      val vocab = uni.orderBy(col("n").desc, col("w1")).limit(1000)
        .select(col("w1"), lit(1L).as("in_vocab"))
      words.join(broadcast(vocab), Seq("w1"), "left_outer")
        .select(col("lang"),
          when(col("in_vocab").isNotNull, 1L)
            .otherwise(expr("(length(w1) + 2) div 3")).as("pieces"),
          when(col("in_vocab").isNull, 1L).otherwise(0L).as("oov"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_words"), sum(col("pieces")).as("n_pieces"),
          sum(col("oov")).as("n_oov_words"))
        .select(col("lang"), col("n_words"), col("n_pieces"),
          col("n_oov_words"),
          (col("n_pieces").cast("double") / col("n_words").cast("double"))
            .as("fertility"))
        .orderBy("lang")
    },
    Some("""WITH words AS (SELECT lang,
          unnest(string_split(text, ' ')) AS w1 FROM documents),
      uni AS (SELECT w1, count(*) AS n FROM words GROUP BY 1),
      vocab AS (SELECT w1, 1 AS in_vocab FROM uni
        ORDER BY n DESC, w1 LIMIT 1000),
      pieces AS (SELECT lang,
          CASE WHEN in_vocab IS NOT NULL THEN 1
            ELSE (length(w1) + 2) // 3 END AS pieces,
          CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END AS oov
        FROM words LEFT JOIN vocab USING (w1))
      SELECT lang, count(*)::BIGINT AS n_words,
        sum(pieces)::BIGINT AS n_pieces,
        sum(oov)::BIGINT AS n_oov_words,
        sum(pieces)::DOUBLE / count(*)::DOUBLE AS fertility
      FROM pieces GROUP BY 1 ORDER BY lang"""))

  // ---------- q278: trained Naive Bayes language ID ---------------------

  /** A TRAINED language classifier beside q15's fixed heuristic and
    * q198's confusion audit of it: multinomial Naive Bayes with add-one
    * smoothing, fit on the deterministic 80 % train split (doc_id % 5
    * ≠ 0, the q37 idiom) and evaluated on the held-out 20 % — the
    * fastText-style quality/language gate pipelines train from their
    * own corpus rather than hard-coding. Model: per-(lang, token)
    * log P(w|lang) = ln((c+1)/(N_lang+V)) with V the train vocabulary;
    * log prior = ln(docs_lang/docs). Determinism: every ln() is
    * evaluated once per (token, lang) TYPE and pinned to integer
    * nano-units (q119's rule); each test doc's score is then an exact
    * int64 sum, and the argmax tie-breaks on lang. Shape at 100 TB:
    * the model is VOCAB-sized, so scoring is a plain shuffle join on
    * the token key (never a broadcast); the only fan-out is token ×
    * |langs| (×4, narrow); unseen-token defaults come from a |langs|-row
    * broadcast. Output is the |langs|² confusion matrix.
    */
  private val q278 = QueryDef(
    "q278_nb_langid",
    (s, dir) => {
      val toks = docs(s, dir)
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("w"))
      val train = toks.where(col("doc_id") % 5 =!= 0)
      val counts = train.groupBy(col("lang"), col("w"))
        .agg(count(lit(1)).as("c"))
      val nLang = counts.groupBy(col("lang")).agg(sum(col("c")).as("nl"))
      val vocab = counts.select(col("w")).distinct()
        .agg(count(lit(1)).as("v"))
      val model = counts.join(nLang, "lang").crossJoin(broadcast(vocab))
        .select(col("lang").as("m_lang"), col("w"),
          round(log((col("c") + lit(1L)).cast("double")
            / (col("nl") + col("v")).cast("double")) * lit(1e9))
            .cast("long").as("lp_nano"))
      val defaults = nLang.crossJoin(broadcast(vocab))
        .select(col("lang").as("m_lang"),
          round(log(lit(1.0) / (col("nl") + col("v")).cast("double"))
            * lit(1e9)).cast("long").as("def_nano"))
      val docsTrain = docs(s, dir).where(col("doc_id") % 5 =!= 0)
        .groupBy(col("lang")).agg(count(lit(1)).as("nd"))
      val totTrain = docsTrain.agg(sum(col("nd")).as("ndocs"))
      val priors = docsTrain.crossJoin(broadcast(totTrain))
        .select(col("lang").as("m_lang"),
          round(log(col("nd").cast("double") / col("ndocs").cast("double"))
            * lit(1e9)).cast("long").as("prior_nano"))
      val test = toks.where(col("doc_id") % 5 === 0)
      // token × |langs| fan-out, then vocab-keyed left join to the model
      val fanned = test.crossJoin(broadcast(
          defaults.select(col("m_lang"), col("def_nano"))))
        .join(model, Seq("m_lang", "w"), "left")
        .select(col("doc_id"), col("lang"), col("m_lang"),
          coalesce(col("lp_nano"), col("def_nano")).as("t_nano"))
        .groupBy(col("doc_id"), col("lang"), col("m_lang"))
        .agg(sum(col("t_nano")).as("s_nano"))
        .join(broadcast(priors), "m_lang")
        .select(col("doc_id"), col("lang"),
          col("m_lang"), (col("s_nano") + col("prior_nano")).as("score"))
      val pred = fanned
        .groupBy(col("doc_id"), col("lang"))
        .agg(min(struct((-col("score")).as("neg"), col("m_lang").as("l")))
          .as("best"))
        .select(col("lang").as("true_lang"), col("best.l").as("pred_lang"))
      pred.groupBy(col("true_lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("true_lang", "pred_lang")
    },
    Some("""WITH toks AS (SELECT doc_id, lang, unnest(string_split(text,
          ' ')) AS w FROM documents),
      train AS (SELECT * FROM toks WHERE doc_id % 5 != 0),
      counts AS (SELECT lang, w, count(*)::BIGINT AS c FROM train
        GROUP BY 1, 2),
      nl AS (SELECT lang, sum(c)::BIGINT AS nl FROM counts GROUP BY 1),
      vocab AS (SELECT count(DISTINCT w)::BIGINT AS v FROM counts),
      model AS (SELECT counts.lang AS m_lang, w,
          round(ln((c + 1)::DOUBLE / (nl + v)::DOUBLE) * 1e9)::BIGINT
            AS lp_nano
        FROM counts JOIN nl USING (lang), vocab),
      defaults AS (SELECT lang AS m_lang,
          round(ln(1.0 / (nl + v)::DOUBLE) * 1e9)::BIGINT AS def_nano
        FROM nl, vocab),
      dt AS (SELECT lang, count(*)::BIGINT AS nd FROM documents
        WHERE doc_id % 5 != 0 GROUP BY 1),
      tt AS (SELECT sum(nd)::BIGINT AS ndocs FROM dt),
      priors AS (SELECT lang AS m_lang,
          round(ln(nd::DOUBLE / ndocs::DOUBLE) * 1e9)::BIGINT
            AS prior_nano
        FROM dt, tt),
      test AS (SELECT * FROM toks WHERE doc_id % 5 = 0),
      fanned AS (SELECT t.doc_id, t.lang, d.m_lang,
          sum(coalesce(m.lp_nano, d.def_nano))::BIGINT AS s_nano
        FROM test t CROSS JOIN defaults d
        LEFT JOIN model m ON m.m_lang = d.m_lang AND m.w = t.w
        GROUP BY 1, 2, 3),
      scored AS (SELECT f.doc_id, f.lang, f.m_lang,
          f.s_nano + p.prior_nano AS score
        FROM fanned f JOIN priors p USING (m_lang)),
      pred AS (SELECT lang AS true_lang, m_lang AS pred_lang
        FROM (SELECT lang, m_lang, row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, m_lang) AS rk FROM scored)
        WHERE rk = 1)
      SELECT true_lang, pred_lang, count(*)::BIGINT AS n_docs
      FROM pred GROUP BY 1, 2 ORDER BY true_lang, pred_lang"""))

  // ---------- q279: Kneser–Ney smoothed bigram model --------------------

  /** The standard n-gram LM smoothing beside q119's add-one: absolute
    * discounting (d = 0.75) with the Kneser–Ney continuation
    * distribution — P(w₂|w₁) = max(c−d,0)/c(w₁) + d·N₁₊(w₁·)/c(w₁) ·
    * N₁₊(·w₂)/N₁₊(··), where the continuation counts ask "how many
    * distinct contexts" rather than "how often" (the reason KN survives
    * high-frequency but context-locked tokens). Novel distributed
    * pieces vs q119 are the three continuation aggregates — distinct
    * successors per w₁, distinct predecessors per w₂, total distinct
    * bigram types — all exact int64 counts off the q55 PlanCache bigram
    * table (zero extra corpus passes). Determinism: the probability is
    * the identical IEEE expression tree over exact ints on both
    * engines, rounded once to 12 places. Output: top 50 bigrams by
    * count (TakeOrdered — per-shard heads, no global sort) with the
    * smoothed probability and its two components.
    */
  private val q279 = QueryDef(
    "q279_kneser_ney",
    (s, dir) => {
      import graft.ops.PlanCache
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val toks = docs(s, dir)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w1")))
      val bi = PlanCache.getOrBuild(s, dir, "q55_bi")(
        toks.withColumn("w2", lead(col("w1"), 1).over(w))
          .where(col("w2").isNotNull)
          .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_xy")))
      val ctx = bi.groupBy(col("w1")).agg(sum(col("n_xy")).as("cx"),
        count(lit(1)).as("n1f"))
      val cont = bi.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
      val totalTypes = bi.agg(count(lit(1)).as("nb"))
      bi.join(ctx, "w1").join(cont, "w2")
        .crossJoin(broadcast(totalTypes))
        .select(col("w1"), col("w2"), col("n_xy"),
          col("n1f"), col("n1b"),
          round(greatest(col("n_xy").cast("double") - lit(0.75), lit(0.0))
              / col("cx").cast("double")
            + lit(0.75) * col("n1f").cast("double")
              / col("cx").cast("double")
              * (col("n1b").cast("double") / col("nb").cast("double")),
            12).as("p_kn"))
        .orderBy(col("n_xy").desc, col("w1"), col("w2"))
        .limit(50)
    },
    Some("""WITH toks AS (SELECT doc_id,
          generate_subscripts(parts, 1) AS pos, unnest(parts) AS w1
        FROM (SELECT doc_id, string_split(text, ' ') AS parts
          FROM documents)),
      inst AS (SELECT doc_id, w1,
          lead(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM toks),
      bi AS (SELECT w1, w2, count(*)::BIGINT AS n_xy FROM inst
        WHERE w2 IS NOT NULL GROUP BY 1, 2),
      ctx AS (SELECT w1, sum(n_xy)::BIGINT AS cx,
          count(*)::BIGINT AS n1f FROM bi GROUP BY 1),
      cont AS (SELECT w2, count(*)::BIGINT AS n1b FROM bi GROUP BY 1),
      tot AS (SELECT count(*)::BIGINT AS nb FROM bi)
      SELECT w1, w2, n_xy, n1f, n1b,
        round(greatest(n_xy::DOUBLE - 0.75, 0.0) / cx::DOUBLE
          + 0.75 * n1f::DOUBLE / cx::DOUBLE
            * (n1b::DOUBLE / nb::DOUBLE), 12) AS p_kn
      FROM bi JOIN ctx USING (w1) JOIN cont USING (w2), tot
      ORDER BY n_xy DESC, w1, w2 LIMIT 50"""))

  // ---------- q287: Good–Turing frequency smoothing --------------------

  /** The frequency-of-frequencies table and Good–Turing discounted
    * counts r* = (r+1)·N_{r+1}/N_r for the low-count band r ≤ 10 —
    * the classical answer to "how much probability mass belongs to
    * n-grams we have NOT seen" (p₀ = N₁/N), which calibrates every
    * OOV/smoothing decision (q133's OOV rate, q279's discount) with a
    * measured number instead of a convention. Runs on TRIGRAM types
    * (the unit LM smoothing actually targets — and the sparse regime
    * where GT is meaningful; this fixture's 31-word unigram vocab has
    * no rare words at all, which is itself why real pipelines smooth
    * n-grams, not words). Corpus-sized work is one per-doc window
    * pass + one type-count aggregate; N_r is a count over the type
    * table and everything after runs on ≤|distinct counts| rows. r*,
    * p₀ are single divisions of exact int64 counts, rounded once;
    * N_{r+1} gaps surface as NULL (the signal to switch to a smoothed
    * fit, not a value to invent).
    */
  private val q287 = QueryDef(
    "q287_good_turing",
    (s, dir) => {
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val tri = docs(s, dir)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w1")))
        .withColumn("w2", lead(col("w1"), 1).over(w))
        .withColumn("w3", lead(col("w1"), 2).over(w))
        .where(col("w3").isNotNull)
        .groupBy(col("w1"), col("w2"), col("w3"))
        .agg(count(lit(1)).as("n"))
      val ff = tri.groupBy(col("n").as("r"))
        .agg(count(lit(1)).as("n_r"))
      val tot = tri.agg(sum(col("n")).as("n_grams"),
        sum(when(col("n") === 1L, 1L).otherwise(0L)).as("n1"))
      ff.alias("a")
        .join(ff.alias("b"), col("a.r") + 1 === col("b.r"), "left")
        .where(col("a.r") <= 10)
        .crossJoin(broadcast(tot))
        .select(col("a.r").as("r"), col("a.n_r").as("n_r"),
          col("b.n_r").as("n_r_next"),
          round((col("a.r") + 1).cast("double")
            * col("b.n_r").cast("double") / col("a.n_r").cast("double"),
            12).as("r_star"),
          round(col("n1").cast("double") / col("n_grams").cast("double"),
            12).as("p_unseen"))
        .orderBy("r")
    },
    Some("""WITH toks AS (SELECT doc_id,
          generate_subscripts(parts, 1) AS pos, unnest(parts) AS w1
        FROM (SELECT doc_id, string_split(text, ' ') AS parts
          FROM documents)),
      tri AS (SELECT w1, w2, w3, count(*)::BIGINT AS n
        FROM (SELECT w1,
            lead(w1, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
            lead(w1, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3
          FROM toks)
        WHERE w3 IS NOT NULL GROUP BY 1, 2, 3),
      ff AS (SELECT n AS r, count(*)::BIGINT AS n_r FROM tri
        GROUP BY 1),
      tot AS (SELECT sum(n)::BIGINT AS n_grams,
          sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS n1 FROM tri)
      SELECT a.r::BIGINT AS r, a.n_r, b.n_r AS n_r_next,
        round((a.r + 1)::DOUBLE * b.n_r::DOUBLE / a.n_r::DOUBLE, 12)
          AS r_star,
        round(n1::DOUBLE / n_grams::DOUBLE, 12) AS p_unseen
      FROM ff a LEFT JOIN ff b ON a.r + 1 = b.r, tot
      WHERE a.r <= 10 ORDER BY r"""))

  // ---------- q298: Flesch readability profile ------------------------

  /** Flesch reading-ease profile per (lang, source) — the classic
    * surface readability screen (Flesch 1948) used to route corpora
    * toward grade-level buckets before mixing: 206.835 − 1.015·(words/
    * sentences) − 84.6·(syllables/word). Syllables use the standard
    * cheap proxy (maximal vowel-run count, `[aeiouy]+` on lowercased
    * text) and sentences the terminal-punctuation-run count with a
    * floor of 1 — both regex counts are codegen'd in-scan work, so the
    * whole query is ONE corpus pass into a ≤|lang×source| aggregate.
    * Each per-doc score pins to integer micro-units before the cell
    * sum (exact int64, order-independent), so the per-cell mean is
    * bit-stable across engines.
    */
  private val q298 = QueryDef(
    "q298_flesch_readability",
    (s, dir) => {
      val perDoc = docs(s, dir).select(col("lang"), col("source"),
        expr("size(split(text, ' '))").cast("double").as("w"),
        expr("CAST(greatest(size(regexp_extract_all(text, '[.!?]+', 0)), 1)" +
          " AS DOUBLE)").as("sent"),
        expr("CAST(size(regexp_extract_all(lower(text), '[aeiouy]+', 0))" +
          " AS DOUBLE)").as("syl"))
      perDoc
        .select(col("lang"), col("source"),
          expr("""CAST(round((206.835 - 1.015 * (w / sent)
            - 84.6 * (syl / w)) * 1e6) AS BIGINT)""").as("f_micro"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("f_micro")).cast("double")
            / count(lit(1)) / 1e6, 6).as("flesch_avg"))
        .orderBy(col("lang"), col("source"))
    },
    Some("""WITH perdoc AS (SELECT lang, source,
          round((206.835
            - 1.015 * (len(string_split(text, ' '))::DOUBLE
              / greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::DOUBLE)
            - 84.6 * (len(regexp_extract_all(lower(text), '[aeiouy]+'))::DOUBLE
              / len(string_split(text, ' '))::DOUBLE)) * 1e6)::BIGINT
            AS f_micro
        FROM documents)
      SELECT lang, source, count(*)::BIGINT AS n_docs,
        round(sum(f_micro)::DOUBLE / count(*) / 1e6, 6) AS flesch_avg
      FROM perdoc GROUP BY 1, 2 ORDER BY lang, source"""))

  // ---------- q305: Burrows' delta stylometry --------------------------

  /** Burrows' delta (Burrows 2002) between every source pair — the
    * standard stylometric authorship distance: each source is a
    * vector of relative frequencies over the corpus's top-30 most
    * frequent words ("function words"), z-scored per word across
    * sources, and delta(a,b) = mean |z_a − z_b|. Near-zero delta
    * flags two "sources" that are really the same generator — a
    * provenance check for crawled corpora. Shape: ONE corpus token
    * pass feeds both the top-30 vocabulary (TakeOrdered under a total
    * (count, word) order — never a global sort) and, against that
    * 30-word broadcast, the per-source counts; everything after is
    * bounded |sources|×30. The frequency grid is DENSIFIED (spine
    * cross-join, zeros count) so missing words depress similarity;
    * frequencies pin to micro-units, the per-word variance test is
    * exact integer (words a z-score cannot be defined for are
    * excluded exactly), and |z|-gaps pin to nano-units before the
    * pair mean.
    */
  private val q305 = QueryDef(
    "q305_burrows_delta",
    (s, dir) => {
      val toks = docs(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("word"))
      val top = toks.groupBy(col("word")).agg(count(lit(1)).as("tc"))
        .orderBy(col("tc").desc, col("word")).limit(30)
        .select(col("word"))
      val totals = toks.groupBy(col("source"))
        .agg(count(lit(1)).as("n_toks"))
      val cnts = toks.join(broadcast(top), Seq("word"))
        .groupBy(col("source"), col("word"))
        .agg(count(lit(1)).as("c"))
      val spine = totals.select(col("source"), col("n_toks"))
        .crossJoin(broadcast(top))
      val freq = spine.join(cnts, Seq("source", "word"), "left")
        .select(col("source"), col("word"),
          expr("""CAST(round(coalesce(c, 0) * 1e6
            / CAST(n_toks AS DOUBLE)) AS BIGINT)""").as("f_micro"))
      val stats = freq.groupBy(col("word"))
        .agg(count(lit(1)).as("ns"), sum(col("f_micro")).as("sf"),
          sum(col("f_micro") * col("f_micro")).as("sff"))
        .where(expr("ns * sff - sf * sf") > 0)
        .select(col("word"),
          (col("sf").cast("double") / col("ns")).as("mean_f"),
          (sqrt(expr("CAST(ns * sff - sf * sf AS DOUBLE)"))
            / col("ns")).as("sd_f"))
      val z = freq.join(broadcast(stats), Seq("word"))
        .select(col("word"), col("source"),
          ((col("f_micro") - col("mean_f")) / col("sd_f")).as("z"))
      val a = z.select(col("word"), col("source").as("source_a"),
        col("z").as("za"))
      val b = z.select(col("word"), col("source").as("source_b"),
        col("z").as("zb"))
      a.join(b, Seq("word"))
        .where(col("source_a") < col("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_words"),
          sum(expr("CAST(round(abs(za - zb) * 1e9) AS BIGINT)"))
            .as("d_nano"))
        .select(col("source_a"), col("source_b"), col("n_words"),
          round(col("d_nano").cast("double") / col("n_words") / 1e9, 9)
            .as("delta"))
        .orderBy(col("source_a"), col("source_b"))
    },
    Some("""WITH toks AS (SELECT source, unnest(string_split(text, ' '))
          AS word FROM documents),
      top AS (SELECT word FROM (SELECT word, count(*) AS tc FROM toks
          GROUP BY 1)
        ORDER BY tc DESC, word LIMIT 30),
      totals AS (SELECT source, count(*)::BIGINT AS n_toks FROM toks
        GROUP BY 1),
      cnts AS (SELECT source, word, count(*)::BIGINT AS c
        FROM toks JOIN top USING (word) GROUP BY 1, 2),
      freq AS (SELECT t.source, p.word,
          round(coalesce(c, 0) * 1e6 / t.n_toks::DOUBLE)::BIGINT
            AS f_micro
        FROM totals t CROSS JOIN top p
        LEFT JOIN cnts ON cnts.source = t.source AND cnts.word = p.word),
      stats AS (SELECT word, count(*)::BIGINT AS ns,
          sum(f_micro)::BIGINT AS sf,
          sum(f_micro * f_micro)::BIGINT AS sff
        FROM freq GROUP BY 1),
      ok AS (SELECT word, sf::DOUBLE / ns AS mean_f,
          sqrt((ns * sff - sf * sf)::DOUBLE) / ns AS sd_f
        FROM stats WHERE ns * sff - sf * sf > 0),
      z AS (SELECT f.word, f.source, (f_micro - mean_f) / sd_f AS z
        FROM freq f JOIN ok USING (word)),
      pairs AS (SELECT a.source AS source_a, b.source AS source_b,
          count(*)::BIGINT AS n_words,
          sum(round(abs(a.z - b.z) * 1e9)::BIGINT)::BIGINT AS d_nano
        FROM z a JOIN z b ON a.word = b.word AND a.source < b.source
        GROUP BY 1, 2)
      SELECT source_a, source_b, n_words,
        round(d_nano::DOUBLE / n_words / 1e9, 9) AS delta
      FROM pairs ORDER BY source_a, source_b"""))

  // ---------- q313: chunked type-token lexical diversity ---------------

  /** Moving-window type-token ratio (the MATTR idea, Covington &
    * McFall 2010, in its scalable non-overlapping-chunk form): raw TTR
    * collapses as documents grow (Heaps' law — q84), so diversity is
    * measured as the mean TTR over fixed 50-token chunks, which is
    * length-invariant and comparable across languages and sources.
    * Only FULL chunks score (a short tail chunk would inflate TTR).
    * Shape: one posexplode token pass — the chunk id is in-scan
    * integer arithmetic on the token position — into a (doc, chunk)
    * distinct-count aggregate keyed on doc×chunk (hashes across
    * executors; no per-doc collection), then a ≤|lang| roll-up with
    * micro-pinned TTRs. Output: per-lang chunk count, mean chunked
    * TTR, and the naive whole-corpus TTR it corrects.
    */
  private val q313 = QueryDef(
    "q313_chunked_ttr",
    (s, dir) => {
      val toks = docs(s, dir)
        .select(col("doc_id"), col("lang"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      val chunks = toks
        .groupBy(col("lang"), col("doc_id"),
          expr("pos div 50").as("chunk"))
        .agg(count(lit(1)).as("n_tok"),
          countDistinct(col("word")).as("n_type"))
        .where(col("n_tok") === 50)
      val naive = toks.groupBy(col("lang"))
        .agg((countDistinct(col("word")).cast("double")
          / count(lit(1))).as("naive_ttr"))
      chunks
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(expr("CAST(round(n_type * 1e6 / 50.0) AS BIGINT)"))
            .as("ttr_micro"))
        .join(broadcast(naive), Seq("lang"))
        .select(col("lang"), col("n_chunks"),
          round(col("ttr_micro").cast("double") / col("n_chunks") / 1e6,
            9).as("mattr"),
          round(col("naive_ttr"), 9).as("naive_ttr"))
        .orderBy(col("lang"))
    },
    Some("""WITH toks AS (SELECT doc_id, lang,
          unnest(string_split(text, ' ')) AS word,
          generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
        FROM documents),
      chunks AS (SELECT lang, doc_id, pos // 50 AS chunk,
          count(*)::BIGINT AS n_tok,
          count(DISTINCT word)::BIGINT AS n_type
        FROM toks GROUP BY 1, 2, 3),
      full_c AS (SELECT * FROM chunks WHERE n_tok = 50),
      naive AS (SELECT lang,
          count(DISTINCT word)::DOUBLE / count(*) AS naive_ttr
        FROM toks GROUP BY 1)
      SELECT f.lang, count(*)::BIGINT AS n_chunks,
        round(sum(round(n_type * 1e6 / 50.0)::BIGINT)::DOUBLE
          / count(*) / 1e6, 9) AS mattr,
        round(any_value(naive_ttr), 9) AS naive_ttr
      FROM full_c f JOIN naive n ON f.lang = n.lang
      GROUP BY f.lang ORDER BY f.lang"""))

  // ---------- q328: term burstiness (Church–Gale) ----------------------

  /** Church–Gale term burstiness for the top-50 vocabulary: a word's
    * occurrences are NOT Poisson — once a document mentions a term it
    * tends to repeat it — and the adaptation ratio P(≥2 | ≥1) observed
    * vs Poisson-expected is the canonical measure (Church & Gale
    * 1995). Function words score ≈1 (Poisson-like); topical/content
    * words score ≫1 — the signal that separates them better than raw
    * frequency, and a direct input to q177's keyword weighting.
    * Doc-level Fano (q227) measures TIME burstiness; this measures
    * WITHIN-DOCUMENT adaptation. Shape: one token pass against the
    * broadcast top-50 vocabulary into (term, doc) counts keyed across
    * executors, then a ≤50-row term aggregate; Poisson terms are one
    * libm exp on exact-ratio doubles.
    */
  private val q328 = QueryDef(
    "q328_term_burstiness",
    (s, dir) => {
      val toks = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      val top = toks.groupBy(col("word")).agg(count(lit(1)).as("tc"))
        .orderBy(col("tc").desc, col("word")).limit(50)
        .select(col("word"))
      val nDocs = docs(s, dir).agg(count(lit(1)).as("nd"))
      val perDoc = toks.join(broadcast(top), Seq("word"))
        .groupBy(col("word"), col("doc_id"))
        .agg(count(lit(1)).as("c"))
      perDoc.groupBy(col("word"))
        .agg(sum(col("c")).as("occ"),
          count(lit(1)).as("d1"),
          sum(when(col("c") >= 2, 1L).otherwise(0L)).as("d2"))
        .crossJoin(broadcast(nDocs))
        .select(col("word"), col("occ"), col("d1"), col("d2"),
          round(col("d2").cast("double") / col("d1"), 9).as("obs_adapt"),
          round(expr("""(1.0 - exp(-(CAST(occ AS DOUBLE) / nd))
            - (CAST(occ AS DOUBLE) / nd)
              * exp(-(CAST(occ AS DOUBLE) / nd)))
            / (1.0 - exp(-(CAST(occ AS DOUBLE) / nd)))"""), 9)
            .as("poisson_adapt"))
        .select(col("word"), col("occ"), col("d1"), col("d2"),
          col("obs_adapt"), col("poisson_adapt"),
          round(col("obs_adapt") / col("poisson_adapt"), 6)
            .as("burstiness"))
        .orderBy(col("word"))
    },
    Some("""WITH toks AS (SELECT doc_id,
          unnest(string_split(text, ' ')) AS word FROM documents),
      top AS (SELECT word FROM (SELECT word, count(*) AS tc FROM toks
          GROUP BY 1) ORDER BY tc DESC, word LIMIT 50),
      nd AS (SELECT count(*)::BIGINT AS nd FROM documents),
      pd AS (SELECT word, doc_id, count(*)::BIGINT AS c
        FROM toks JOIN top USING (word) GROUP BY 1, 2),
      t AS (SELECT word, sum(c)::BIGINT AS occ, count(*)::BIGINT AS d1,
          sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END)::BIGINT AS d2
        FROM pd GROUP BY 1),
      p AS (SELECT word, occ, d1, d2,
          round(d2::DOUBLE / d1, 9) AS obs_adapt,
          round((1.0 - exp(-(occ::DOUBLE / nd))
            - (occ::DOUBLE / nd) * exp(-(occ::DOUBLE / nd)))
            / (1.0 - exp(-(occ::DOUBLE / nd))), 9) AS poisson_adapt
        FROM t, nd)
      SELECT word, occ, d1, d2, obs_adapt, poisson_adapt,
        round(obs_adapt / poisson_adapt, 6) AS burstiness
      FROM p ORDER BY word"""))

  // ---------- q378: mean segmental type-token ratio --------------------

  /** Mean Segmental TTR (MSTTR-50) per language next to the naive
    * whole-doc TTR it corrects: naive TTR collapses as documents get
    * longer (more repetition opportunities), so cross-language or
    * cross-length diversity comparisons on it are confounded; slicing
    * every document into fixed 50-token segments and averaging the
    * per-segment TTR removes the length artifact — the standard
    * lexical-diversity measure a corpus datasheet reports. Shape:
    * posexplode → (doc, pos div 50) group → per-segment distinct
    * counts; only FULL segments enter (documented convention);
    * per-segment TTR is the exact integer d·20000 micro (d/50 scaled),
    * so the per-language fold never sums floats. Everything is one
    * corpus pass plus bounded per-language aggregates.
    */
  private val q378 = QueryDef(
    "q378_msttr",
    (s, dir) => {
      val segs = docs(s, dir)
        .select(col("doc_id"), col("lang"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .select(col("doc_id"), col("lang"),
          expr("pos div 50").as("seg"), col("tok"))
        .groupBy(col("doc_id"), col("lang"), col("seg"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("tok")).as("d"))
        .where(col("n") === 50)
      val msttr = segs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_segments"),
          sum(col("d") * 20000L).as("sttr_micro"))
      val naive = docs(s, dir)
        .select(col("lang"),
          expr("""CAST(round(CAST(size(array_distinct(split(text, ' ')))
            AS DOUBLE) * 1e6 / size(split(text, ' '))) AS BIGINT)""")
            .as("ttr_micro"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ttr_micro")).as("snaive"))
      msttr.join(naive, Seq("lang"))
        .select(col("lang"), col("n_segments"),
          round(col("sttr_micro").cast("double") / col("n_segments")
            / 1e6, 6).as("msttr"),
          round(col("snaive").cast("double") / col("n_docs") / 1e6, 6)
            .as("naive_ttr"))
        .orderBy(col("lang"))
    },
    Some("""WITH tk AS (SELECT doc_id, lang,
          string_split(text, ' ') AS parts FROM documents),
      pos AS (SELECT doc_id, lang,
          (generate_subscripts(parts, 1) - 1) // 50 AS seg,
          unnest(parts) AS tok
        FROM tk),
      segs AS (SELECT doc_id, lang, seg, count(*)::BIGINT AS n,
          count(DISTINCT tok)::BIGINT AS d
        FROM pos GROUP BY 1, 2, 3 HAVING count(*) = 50),
      ms AS (SELECT lang, count(*)::BIGINT AS n_segments,
          sum(d * 20000)::BIGINT AS sttr_micro
        FROM segs GROUP BY 1),
      nv AS (SELECT lang, count(*)::BIGINT AS n_docs,
          sum(round(len(list_distinct(string_split(text, ' ')))::DOUBLE
            * 1e6 / len(string_split(text, ' ')))::BIGINT)::BIGINT
            AS snaive
        FROM documents GROUP BY 1)
      SELECT lang, n_segments,
        round(sttr_micro::DOUBLE / n_segments / 1e6, 6) AS msttr,
        round(snaive::DOUBLE / n_docs / 1e6, 6) AS naive_ttr
      FROM ms JOIN nv USING (lang)
      ORDER BY lang"""))

  // ---------- q379: PMI collocation pairs ------------------------------

  /** Top PMI collocations among the 200 highest-df terms — pointwise
    * mutual information over document co-occurrence, the association
    * score that finds "terms that travel together" after q168's MI
    * (event-level) and q217's raw bigram counts (adjacency-level);
    * PMI is doc-level and order-free. The vocabulary cap is the scale
    * contract: term pairs only ever form WITHIN the broadcast top-200
    * vocabulary (TakeOrdered over the df aggregate), so the self-join
    * on doc_id fans out at most C(200,2) per doc and the pair space
    * is constant-bounded; support ≥ 5 prunes noise and ln() runs on
    * exact integer counts in single-row-per-pair math. Top-20 by
    * micro-pinned PMI via TakeOrdered.
    */
  private val q379 = QueryDef(
    "q379_pmi_pairs",
    (s, dir) => {
      val inc = docs(s, dir)
        .select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("term"))
      val vocab = broadcast(inc.groupBy(col("term"))
        .agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("term")).limit(200))
      val vinc = inc.join(vocab.select(col("term")), Seq("term"))
      val nDocs = docs(s, dir).agg(count(lit(1)).as("nd"))
      val pairs = vinc.alias("a")
        .join(vinc.alias("b"),
          col("a.doc_id") === col("b.doc_id")
            && col("a.term") < col("b.term"))
        .groupBy(col("a.term").as("t1"), col("b.term").as("t2"))
        .agg(count(lit(1)).as("n_ab"))
        .where(col("n_ab") >= 5)
      pairs
        .join(vocab.select(col("term").as("t1"), col("df").as("df1")),
          Seq("t1"))
        .join(vocab.select(col("term").as("t2"), col("df").as("df2")),
          Seq("t2"))
        .crossJoin(broadcast(nDocs))
        .select(col("t1"), col("t2"), col("n_ab"), col("df1"),
          col("df2"),
          expr("""CAST(round(ln(CAST(n_ab AS DOUBLE) * nd
            / (CAST(df1 AS DOUBLE) * df2)) * 1e6) AS BIGINT)""")
            .as("pmi_micro"))
        .select(col("t1"), col("t2"), col("n_ab"), col("df1"),
          col("df2"),
          round(col("pmi_micro").cast("double") / 1e6, 6).as("pmi"))
        .orderBy(col("pmi").desc, col("t1"), col("t2"))
        .limit(20)
    },
    Some("""WITH inc AS (SELECT doc_id,
          unnest(list_distinct(string_split(text, ' '))) AS term
        FROM documents),
      vocab AS (SELECT term, count(*)::BIGINT AS df FROM inc
        GROUP BY 1 ORDER BY df DESC, term LIMIT 200),
      vinc AS (SELECT doc_id, term FROM inc
        WHERE term IN (SELECT term FROM vocab)),
      nd AS (SELECT count(*)::BIGINT AS nd FROM documents),
      pairs AS (SELECT a.term AS t1, b.term AS t2,
          count(*)::BIGINT AS n_ab
        FROM vinc a JOIN vinc b ON a.doc_id = b.doc_id
          AND a.term < b.term
        GROUP BY 1, 2 HAVING count(*) >= 5),
      pm AS (SELECT t1, t2, n_ab, v1.df AS df1, v2.df AS df2,
          round(ln(n_ab::DOUBLE * nd / (v1.df::DOUBLE * v2.df)) * 1e6)
            ::BIGINT AS pmi_micro
        FROM pairs
        JOIN vocab v1 ON v1.term = t1
        JOIN vocab v2 ON v2.term = t2, nd)
      SELECT t1, t2, n_ab, df1, df2,
        round(pmi_micro::DOUBLE / 1e6, 6) AS pmi
      FROM pm
      ORDER BY pmi DESC, t1, t2 LIMIT 20"""))

  // ---------- q406: Yule's K vocabulary-richness index ------------------

  /** Yule's characteristic K per language,
    * K = 10⁴·(Σ m²·V_m − N)/N² with V_m = number of types occurring
    * exactly m times — the length-invariant lexical-richness constant
    * that complements q84 (Heaps type GROWTH), q97 (Zipf rank SLOPE)
    * and q313/q378 (windowed TTR, which K replaces when documents vary
    * in length): K rises when a few types dominate (template/
    * boilerplate text), falls for diverse natural prose, and is
    * comparable across corpora of different sizes — the cross-language
    * richness leaderboard a mixture designer reads next to q110's
    * diversity share. Shape: one token scan into the (lang, token)
    * frequency aggregate, folded to the frequency-of-frequencies
    * table (|distinct m| rows per language — log-scale small), then a
    * per-language reduce; Σm²V_m is DECIMAL-lifted (m ≤ N makes the
    * term ≤ N², past int64 at corpus scale) while N and V stay exact
    * int64. Output is one bounded row per language.
    */
  private val q406 = QueryDef(
    "q406_yule_k",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val f = docs(s, dir)
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("m"))
      val vm = f.groupBy(col("lang"), col("m"))
        .agg(count(lit(1)).as("v"))
      vm.groupBy(col("lang"))
        .agg(sum(col("m") * col("v")).as("n_tokens"),
          sum(col("v")).as("n_types"),
          sum((col("m") * col("m") * col("v"))
            .cast(DecimalType(38, 0))).as("smm"))
        .select(col("lang"), col("n_tokens"), col("n_types"),
          round((col("smm").cast("double")
            - col("n_tokens").cast("double")) * 1e4
            / (col("n_tokens").cast("double")
              * col("n_tokens").cast("double")), 9).as("yule_k"))
        .orderBy("lang")
    },
    Some("""WITH f AS (SELECT lang, tok, count(*)::BIGINT AS m
        FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
          FROM documents) GROUP BY 1, 2),
      vm AS (SELECT lang, m, count(*)::BIGINT AS v FROM f GROUP BY 1, 2),
      k AS (SELECT lang, sum(m * v)::BIGINT AS n_tokens,
          sum(v)::BIGINT AS n_types,
          sum(m::HUGEINT * m * v) AS smm
        FROM vm GROUP BY 1)
      SELECT lang, n_tokens, n_types,
        round((smm::DOUBLE - n_tokens::DOUBLE) * 1e4
          / (n_tokens::DOUBLE * n_tokens::DOUBLE), 9) AS yule_k
      FROM k ORDER BY lang"""))

  // ---------- q475: ingest-batch vocabulary delta ----------------------

  /** Tokenizer-maintenance view of an ingest batch (doc_id % 10 < 2,
    * q104's split): per language, how much NEW vocabulary the batch
    * brings relative to the STANDING corpus — distinct batch tokens,
    * out-of-vocabulary share (both type- and token-weighted), and how
    * many OOV tokens clear the frequency bar for admission into the
    * next tokenizer build (count ≥ 3, the rare-token floor). The OOV
    * token rate is the number a pipeline alarms on: a spike means the
    * batch's domain drifted from what the tokenizer was trained on.
    * Shape: the standing VOCABULARY (distinct (lang, token) — already
    * aggregate-compressed, ≪ corpus) joins the batch's token counts on
    * (lang, token); the batch side is batch-bounded, the standing side
    * shuffles its vocab once. Integer counts end-to-end; the two
    * shares are single pinned divisions.
    */
  private val q475 = QueryDef(
    "q475_ingest_vocab_delta",
    (s, dir) => {
      def toks(side: DataFrame) = side
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      val standingVocab = toks(docs(s, dir).where(col("doc_id") % 10 >= 2))
        .distinct()
      val batchCounts = toks(docs(s, dir).where(col("doc_id") % 10 < 2))
        .groupBy(col("lang"), col("tok"))
        .agg(count(lit(1)).as("c"))
      val flagged = batchCounts
        .join(standingVocab.withColumn("known", lit(1L)),
          Seq("lang", "tok"), "left_outer")
        .select(col("lang"), col("c"),
          when(col("known").isNull, 1L).otherwise(0L).as("oov"))
      flagged.groupBy(col("lang"))
        .agg(sum(col("c")).as("n_batch_tokens"),
          count(lit(1)).as("n_batch_distinct"),
          sum(col("oov")).as("oov_distinct"),
          sum(col("oov") * col("c")).as("oov_occurrences"),
          sum(when(col("oov") === 1L && col("c") >= 3L, 1L)
            .otherwise(0L)).as("n_admitted"))
        .select(col("lang"), col("n_batch_tokens"), col("n_batch_distinct"),
          col("oov_distinct"), col("oov_occurrences"), col("n_admitted"),
          round(col("oov_occurrences").cast("double")
            / col("n_batch_tokens"), 9).as("oov_token_rate"),
          round(col("oov_distinct").cast("double")
            / col("n_batch_distinct"), 9).as("oov_type_rate"))
        .orderBy("lang")
    },
    Some("""WITH sv AS (SELECT DISTINCT lang, tok FROM (
          SELECT lang, unnest(string_split(text, ' ')) AS tok
          FROM documents WHERE doc_id % 10 >= 2)),
      bc AS (SELECT lang, tok, count(*) AS c FROM (
          SELECT lang, unnest(string_split(text, ' ')) AS tok
          FROM documents WHERE doc_id % 10 < 2) GROUP BY 1, 2),
      fl AS (SELECT bc.lang, bc.c,
          CASE WHEN sv.tok IS NULL THEN 1 ELSE 0 END AS oov
        FROM bc LEFT JOIN sv ON sv.lang = bc.lang AND sv.tok = bc.tok)
      SELECT lang, sum(c)::BIGINT AS n_batch_tokens,
        count(*)::BIGINT AS n_batch_distinct,
        sum(oov)::BIGINT AS oov_distinct,
        sum(oov * c)::BIGINT AS oov_occurrences,
        sum(CASE WHEN oov = 1 AND c >= 3 THEN 1 ELSE 0 END)::BIGINT
          AS n_admitted,
        round(sum(oov * c)::DOUBLE / sum(c), 9) AS oov_token_rate,
        round(sum(oov)::DOUBLE / count(*), 9) AS oov_type_rate
      FROM fl GROUP BY lang ORDER BY lang"""))

  val all: Seq[QueryDef] =
    Seq(q13, q14, q15, q16, q55, q64, q84, q97, q119, q121, q133, q145,
      q153, q155, q165, q177, q198, q199, q215, q217, q244, q245, q278,
      q279, q287, q298, q305, q313, q328, q378, q379, q406, q475)
}
