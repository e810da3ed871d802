package graft.ops

import graft.{Fixtures, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table — the LLM-data-
  * pipeline extension family (BASELINE.json north star; the reference
  * itself only ships rows to S3, its consumers must dedup — see
  * SURVEY.md §2.9 on the at-least-once watermark semantics that *create*
  * duplicates: /root/reference/src/db_extractor_full.py:383-408).
  *
  * Four strategies, each the standard one at a different cost/recall
  * point, all expressed as declarative Spark plans (no RDDs, no UDFs):
  *
  *  - q17 exact:      hash-groupBy on normalized content. One shuffle on
  *                    md5(norm); at 100 TB this is the cheapest pass and
  *                    runs first to shrink the corpus for the fuzzy passes.
  *  - q18 MinHash+LSH: shingle → 16 minhashes → 8 bands × 2 rows →
  *                    band-bucket self-join → exact-Jaccard verify of
  *                    candidates only. The self-join shuffles on
  *                    (band, bucket-key) so work is proportional to
  *                    colliding candidates, never to |docs|² — this is the
  *                    100 TB-scale near-dup path.
  *  - q19 SimHash:    32-bit signature; byte-banding (4 blocks) to find
  *                    candidate pairs, exact Hamming verify. Signatures are
  *                    8 bytes/doc → the pair search is tiny even at scale.
  *                    NOTE approximate recall: a shared block is
  *                    guaranteed only for Hamming ≤ 3 (pigeonhole over 4
  *                    blocks); pairs at distance 4–8 are reported only if
  *                    their differing bits cluster outside one block —
  *                    the standard SimHash blocking tradeoff (raise block
  *                    count for a stricter guarantee). The oracle
  *                    replicates the identical construction. NOTE scale:
  *                    8-bit blocks = 256 buckets, so the candidate join
  *                    grows ∝ corpus²/256 — measured 6.0× wall on 3× data
  *                    by the round-12 canary; q491's ingest variant bands
  *                    on 2×16-bit blocks for exactly this reason, and a
  *                    100-TB self-join would widen the same way.
  *  - q20 n-gram Jaccard (exact): inverted-index self-join on shingle
  *                    hash. Finds every pair ≥ τ (any such pair shares a
  *                    shingle), cost bounded by posting-list skew — the
  *                    quadratic blowup lives only inside hot shingles
  *                    (mitigate at scale by dropping top-frequency
  *                    shingles, same as stopword pruning).
  *  - q21 embedding near-dup: cosine ≥ τ pairs over `embeddings`.
  *
  * Hashing design (performance + portability):
  *  - each TOKEN is hashed once via `h32` (md5-derived — identical hex
  *    in both engines); trigram-shingle hashes are then an arithmetic
  *    combine of three token hashes mod P. md5 is the only non-codegen
  *    step and runs once per token, not once per shingle character.
  *  - per-doc signature work (minhash, simhash bit counts) runs as
  *    codegen'd hash aggregations over the *exploded* shingle table
  *    (map-side partials), not as interpreted array lambdas.
  *  - all arithmetic stays in exact int64 (largest product ≈ 8.6e15);
  *    the only doubles are final ratios of two ints computed by the
  *    same single division on both sides, so the DuckDB oracle
  *    hash-matches bit-exactly.
  */
object Dedup {
  import Portable.{h32Spark, h32Duck}

  private def docs(s: SparkSession, dir: String): DataFrame =
    Fixtures.table(s, dir, "documents")

  /** Trigram-shingle hash = (h(t1)*C1 + h(t2)*C2 + h(t3)) mod P over the
    * per-token hashes; distinct per doc. Docs with <3 tokens are
    * excluded upstream (Spark `sequence` would go descending on an
    * empty range; DuckDB `range` is half-open).
    */
  private[graft] val P = 2147483647L
  private[graft] val C1 = 1000003L
  private[graft] val C2 = 999983L

  private val shingleDuck =
    s"list_distinct(list_transform(range(1, len(hts) - 1), " +
      s"i -> (hts[i] * $C1 + hts[i + 1] * $C2 + hts[i + 2]) % $P))"

  /** Exploded (doc_id, shingle-hash) inverted-index rows.
    *
    * Deliberately row-relational, not array-HOF: tokens are exploded to
    * rows so each token is md5-hashed exactly once inside codegen, and
    * trigram hashes come from two window `lead`s. (The array formulation
    * — transform over a token-hash array — looks natural but Catalyst's
    * CollapseProject inlines the hash array into every `element_at` of
    * the shingle lambda, re-evaluating every token hash per shingle:
    * ~300× redundant md5 work. HOF lambdas also run interpreted, outside
    * whole-stage codegen.) Docs with <3 tokens drop out naturally (no
    * row has two leads).
    */
  /** Session-scoped posting-table cache: q18/q20/q38/q39/q44 all
    * consume the same inverted index, and a Verify/Bench run invokes
    * them back-to-back — replace-on-call persistence made each query
    * rebuild tokenize+hash from scratch. See [[PlanCache]] for the
    * keying/eviction contract.
    */
  private[ops] def persistedInverted(s: SparkSession, dir: String): DataFrame =
    PlanCache.getOrBuild(s, dir, "inverted")(inverted(s, dir))

  private[graft] def inverted(s: SparkSession, dir: String): DataFrame =
    invertedOf(docs(s, dir))

  /** The shingle/posting build over an arbitrary (doc_id, text)
    * DataFrame — factored from [[inverted]] so foreachBatch index
    * maintenance ([[graft.streaming.DocStream.maintainStandingIndex]])
    * can shingle a micro-batch exactly the way the batch path
    * shingles a fixture slice.
    */
  private[graft] def invertedOf(docsDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    docsDf
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos"), expr(h32Spark("tok")).as("ht"))
      .select(col("doc_id"),
        ((col("ht") * C1 + lead(col("ht"), 1).over(w) * C2
          + lead(col("ht"), 2).over(w)) % P).as("h"))
      .where(col("h").isNotNull)
      .distinct()
  }

  private[ops] val shingledDuckCte =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE len(string_split(text, ' ')) >= 3),
    hts AS (SELECT doc_id,
      list_transform(toks, t -> ${h32Duck("t")}) AS hts FROM toks),
    sh AS (SELECT doc_id, $shingleDuck AS sh FROM hts),
    inv AS (SELECT doc_id, unnest(sh) AS h FROM sh)"""

  /** MinHash constants: 16 universal-hash functions (a*h + b) mod P over
    * the shingle hashes (< 2^31, so a*h ≤ 3821 * 2^31 ≈ 8.2e12 stays
    * exact); 8 bands × 2 rows.
    */
  private val A = Seq(1117, 2971, 3343, 577, 2129, 1847, 919, 3457,
    1231, 2689, 353, 1511, 2017, 761, 3821, 1433)
  private val B = Seq(407, 2011, 89, 1777, 563, 3229, 1399, 241,
    3089, 677, 1901, 2503, 131, 3581, 827, 2273)
  private[ops] val NBands = 8 // × 2 rows per band = 16 hashes

  // ---------- q17: exact dedup on normalized content ------------------

  /** Exact duplicate grouping: normalize (lowercase, strip non-alnum,
    * collapse whitespace) → md5 → groupBy. Output is one row per distinct
    * content key. Single shuffle on the 128-bit key; at 100 TB the map
    * side emits (16-byte key, id) pairs only — network cost is O(rows),
    * not O(bytes of text).
    */
  private val q17 = QueryDef(
    "q17_dedup_exact",
    (s, dir) => docs(s, dir)
      .select(col("doc_id"),
        md5(expr("graft_norm_text(text)")).as("content_key"))
      .groupBy(col("content_key"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_id"))
      .orderBy("canonical_id"),
    Some("""SELECT md5(trim(regexp_replace(
        regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        ' +', ' ', 'g'))) AS content_key,
      count(*) AS n_docs, min(doc_id) AS canonical_id
      FROM documents GROUP BY 1 ORDER BY canonical_id"""))

  // ---------- q18: MinHash + LSH near-dup pairs -----------------------

  /** (doc_id, band, bkey) LSH rows from the inverted index: all 16
    * minhashes in one codegen'd hash aggregation over the exploded
    * shingle table (min of an affine transform per function), then the
    * band key = md5 over the band's two minhash rows, posexplode → the
    * LSH shuffle key. Identical docs collide in every band; j≈0.9
    * pairs collide in ≥1 band w.p. ~1 − (1 − 0.81)^8.
    */
  private[graft] def minhashBands(inv: DataFrame): DataFrame =
    bandsOf(minhashSignatures(inv))

  /** Band rows from an existing signature table (row-local projection).
    * Factored out of [[minhashBands]] (r15) so consumers that already
    * hold signatures — in particular the shared [[corpusSignatures]]
    * cache — band up without re-running the 16-min aggregate.
    */
  private[graft] def bandsOf(mh: DataFrame): DataFrame = {
    val bandCols = (0 until NBands).map { bnd =>
      expr(s"md5(concat_ws(',', cast(mh${2 * bnd} AS STRING), " +
        s"cast(mh${2 * bnd + 1} AS STRING)))")
    }
    mh.select(col("doc_id"),
      posexplode(array(bandCols: _*)).as(Seq("band", "bkey")))
  }

  /** Session-shared full-corpus MinHash signature table (r15): one row
    * per doc, mh0..mh15. Seven registry call sites previously re-ran
    * the 16-min aggregate over the ~1 M-row posting table per query
    * (q18's pair join, q81, q246, q321, the corpus band table, and the
    * ingest family's batch/full sides q473/q490/q500/q529). Signatures
    * are ROW-LOCAL per doc, so any doc-level filter commutes with the
    * aggregate: filter-then-sign ≡ sign-then-filter, which is exactly
    * the q490 union-merge lemma — derived subsets below are therefore
    * row-identical to their previous independent builds (oracles
    * unchanged, re-proven at the gate per run). The table is 1 row per
    * doc (5 k rows at sf0.1), far cheaper to persist than the posting
    * table it derives from.
    */
  private[ops] def corpusSignatures(s: SparkSession, dir: String): DataFrame =
    PlanCache.getOrBuild(s, dir, "corpus_sigs")(
      minhashSignatures(persistedInverted(s, dir)))

  /** One row per doc: its distinct shingle set and set size — the
    * broadcast-verify table (r16). q76's prefix verify and q321's
    * calibration both compute pairwise |intersection| over candidate
    * pairs; with ~52 longs × 5k docs (≈3 MB) the whole corpus's sets
    * broadcast and the intersection is per-row `array_intersect`, so
    * neither query shuffles posting payloads. At 100 TB the per-doc
    * set stays bounded (shingle count ∝ doc length); the table is one
    * row per doc like [[corpusSignatures]].
    */
  private[ops] def docShingleSets(s: SparkSession, dir: String): DataFrame =
    PlanCache.getOrBuild(s, dir, "doc_sets")(
      persistedInverted(s, dir).groupBy(col("doc_id"))
        .agg(collect_set(col("h")).as("hs"), count(lit(1)).as("n")))

  /** One row per doc with its 16 minhash columns mh0..mh15 — the raw
    * signature [[minhashBands]] bands up, also consumed directly by the
    * q81 estimate-accuracy audit. */
  private def minhashSignatures(inv: DataFrame): DataFrame = {
    val minCols = A.zip(B).zipWithIndex.map { case ((a, b), i) =>
      min(expr(s"(h * $a + $b) % $P")).as(s"mh$i")
    }
    inv.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
  }

  /** DuckDB twin of [[minhashSignatures]]'s aggregate list. */
  private[ops] def minSelectsDuck: String =
    A.zip(B).zipWithIndex.map { case ((a, b), i) =>
      s"min((h * $a + $b) % $P) AS mh$i"
    }.mkString(", ")

  /** Streaming twin of [[minhashBands]]: the identical (doc_id, band,
    * bkey) rows computed entirely ROW-LOCALLY — no window, no
    * aggregation; the final posexplode is a stateless generator — so
    * the projection is legal on an unbounded stream (the only stateful
    * stage a streaming near-dup pass needs is the per-bucket
    * membership that follows).
    * The batch path deliberately avoids this formulation (CollapseProject
    * inlines the token-hash array into every shingle access, re-running
    * md5 ~3× per token, and HOF lambdas run interpreted); for a stream
    * the per-row cost is the price of statelessness, paid once per
    * arriving document rather than per corpus pass. StreamingSpec pins
    * both twins row-for-row equal.
    */
  private[graft] def minhashBandsRowLocal(docsDf: DataFrame): DataFrame = {
    val hts = s"transform(split(text, ' '), t -> ${h32Spark("t")})"
    val shs = s"array_distinct(transform(sequence(0, size(hts) - 3), " +
      s"i -> (element_at(hts, i + 1) * $C1 + element_at(hts, i + 2) * $C2" +
      s" + element_at(hts, i + 3)) % $P))"
    val mhs = A.zip(B).map { case (a, b) =>
      s"array_min(transform(shs, h -> (h * $a + $b) % $P))"
    }
    val bandExprs = (0 until NBands).map { bnd =>
      expr(s"md5(concat_ws(',', cast(mhs[${2 * bnd}] AS STRING), " +
        s"cast(mhs[${2 * bnd + 1}] AS STRING)))")
    }
    docsDf
      .where(expr("size(split(text, ' ')) >= 3"))
      .withColumn("hts", expr(hts))
      .withColumn("shs", expr(shs))
      .withColumn("mhs", array(mhs.map(expr): _*))
      .select(col("doc_id"),
        posexplode(array(bandExprs: _*)).as(Seq("band", "bkey")))
  }

  /** Row-local twin of [[inverted]]: the identical exploded
    * (doc_id, n_sh, h) posting rows — n_sh is the doc's distinct
    * shingle count, carried so a downstream Jaccard needs no second
    * aggregate over the stream side — computed without windows or
    * aggregation, so the projection is legal on an unbounded document
    * stream (the ingest-time near-dup twin). Same interpreted-HOF cost
    * caveat as [[minhashBandsRowLocal]]: per arriving document, not per
    * corpus pass.
    */
  private[graft] def shinglesRowLocal(docsDf: DataFrame): DataFrame = {
    val hts = s"transform(split(text, ' '), t -> ${h32Spark("t")})"
    val shs = s"array_distinct(transform(sequence(0, size(hts) - 3), " +
      s"i -> (element_at(hts, i + 1) * $C1 + element_at(hts, i + 2) * $C2" +
      s" + element_at(hts, i + 3)) % $P))"
    docsDf
      .where(expr("size(split(text, ' ')) >= 3"))
      .withColumn("hts", expr(hts))
      .withColumn("shs", expr(shs))
      .select(col("doc_id"), size(col("shs")).cast("long").as("n_sh"),
        explode(col("shs")).as("h"))
  }

  /** Distinct full-corpus LSH band-collision candidate pairs — the
    * (doc_a < doc_b) self-join of the band table, materialized ONCE per
    * run via PlanCache: q18 (the dedup pass itself), q246 (the recall
    * audit) and q321 (the banding planner) all rebuild exactly this
    * minhash-agg + band self-join otherwise, and the pair table is tiny
    * (∝ collisions) so persisting it is far cheaper than persisting the
    * band rows (measured: banding from the persisted inv beats a
    * persisted band table, but sharing the JOINED pair set wins over
    * recomputing the join per consumer).
    */
  private[ops] def lshCandPairs(s: SparkSession, dir: String): DataFrame =
    PlanCache.getOrBuild(s, dir, "lsh_cand_pairs") {
      val bands = bandsOf(corpusSignatures(s, dir))
      bands.alias("a")
        .join(bands.alias("b"),
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
    }

  private val q18 = QueryDef(
    "q18_minhash_lsh",
    (s, dir) => {
      // The inverted index feeds four consumers (minhash agg, sizes,
      // both sides of the verify join); materialize it once instead of
      // recomputing the tokenize+hash pipeline per branch. At scale
      // this is the standard persisted/checkpointed posting table every
      // MinHash pipeline builds first.
      val inv = persistedInverted(s, dir)
      val cand = lshCandPairs(s, dir)
      // exact-Jaccard verify of the candidates only, straight off the
      // inverted index: |A∩B| by joining both sides' postings.
      val sizes = inv.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val common = cand
        .join(inv.select(col("doc_id").as("doc_a"), col("h")), "doc_a")
        .join(inv.select(col("doc_id").as("doc_b"), col("h")), Seq("doc_b", "h"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_common"))
      common
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          (col("n_common").cast("double")
            / (col("na") + col("nb") - col("n_common"))).as("jaccard"))
        .where(col("jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    },
    Some {
      val minSelects = minSelectsDuck
      val bandSelects = (0 until NBands).map { bnd =>
        s"SELECT doc_id, $bnd AS band, md5(mh${2 * bnd}::VARCHAR || ',' || " +
          s"mh${2 * bnd + 1}::VARCHAR) AS bkey FROM mh"
      }.mkString(" UNION ALL ")
      s"""WITH $shingledDuckCte,
      mh AS (SELECT doc_id, $minSelects FROM inv GROUP BY doc_id),
      bands AS ($bandSelects),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
      sizes AS (SELECT doc_id, count(*) AS n FROM inv GROUP BY 1),
      common AS (SELECT c.doc_a, c.doc_b, count(*) AS n_common
        FROM cand c
        JOIN inv a ON a.doc_id = c.doc_a
        JOIN inv b ON b.doc_id = c.doc_b AND b.h = a.h
        GROUP BY 1, 2)
      SELECT doc_a, doc_b,
        n_common::DOUBLE / (sa.n + sb.n - n_common) AS jaccard
      FROM common
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= 0.5
      ORDER BY doc_a, doc_b"""
    })

  // ---------- q19: SimHash signatures + banded Hamming pairs ----------

  private val q19 = QueryDef(
    "q19_simhash",
    (s, dir) => {
      // one codegen'd aggregation computes all 32 bit-counts (sum of
      // CASE per bit) + the shingle count; the 32-bit signature (bit b
      // set iff set in >half the shingles) is then a scalar projection.
      val cnts = inverted(s, dir).groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"),
          (0 until 32).map { b =>
            sum(expr(s"CASE WHEN (h div ${1L << b}) % 2 = 1 THEN 1 ELSE 0 END"))
              .as(s"c$b")
          }: _*)
      val sigExpr = (0 until 32).map { b =>
        s"(CASE WHEN 2 * c$b > n THEN ${1L << b}L ELSE 0L END)"
      }.mkString(" + ")
      val sig = cnts.select(col("doc_id"), expr(sigExpr).as("simhash"))
      // candidate blocking: 4 byte-blocks of the signature; pairs agreeing
      // on ≥1 block are checked with exact Hamming distance (≤ 8 of 32).
      val blockCols = (0 until 4).map(i =>
        expr(s"(simhash div ${1L << (8 * i)}) % 256"))
      val blocks = sig.select(col("doc_id"), col("simhash"),
        posexplode(array(blockCols: _*)).as(Seq("blk", "bval")))
      blocks.alias("a")
        .join(blocks.alias("b"),
          col("a.blk") === col("b.blk") && col("a.bval") === col("b.bval")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
        .distinct()
        .where(col("hamming") <= 8)
        .orderBy("doc_a", "doc_b")
    },
    Some {
      val bitSums = (0 until 32).map { b =>
        s"sum(CASE WHEN (h // ${1L << b}) % 2 = 1 THEN 1 ELSE 0 END) AS c$b"
      }.mkString(", ")
      val sigExpr = (0 until 32).map { b =>
        s"(CASE WHEN 2 * c$b > n THEN ${1L << b}::BIGINT ELSE 0::BIGINT END)"
      }.mkString(" + ")
      val blockSelects = (0 until 4).map { i =>
        s"SELECT doc_id, simhash, $i AS blk, " +
          s"(simhash // ${1L << (8 * i)}) % 256 AS bval FROM sig"
      }.mkString(" UNION ALL ")
      s"""WITH $shingledDuckCte,
      cnts AS (SELECT doc_id, count(*) AS n, $bitSums FROM inv GROUP BY doc_id),
      sig AS (SELECT doc_id, $sigExpr AS simhash FROM cnts),
      blocks AS ($blockSelects)
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        bit_count(xor(a.simhash, b.simhash))::INT AS hamming
      FROM blocks a JOIN blocks b
      ON a.blk = b.blk AND a.bval = b.bval AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
      ORDER BY doc_a, doc_b"""
    })

  // ---------- q20: exact n-gram Jaccard via inverted index ------------

  /** All pairs with exact hashed-shingle Jaccard ≥ `threshold`
    * (inverted-index self-join) — shared by q20, q38, q39.
    */
  private[graft] def jaccardPairs(s: SparkSession, dir: String,
      threshold: Double): DataFrame = {
    // The 0.8 table is the one the registry shares (q20/q38/q39/q124/
    // q194/ccLabels/Curate all start from it); 0.5 is shared by q81's
    // estimate audit and q246's LSH recall truth side (r16 — the r15
    // session leak used to hide the second full posting self-join;
    // with per-query scratch release it surfaced as ~+18 cpu-s on
    // q246). Other thresholds are one-off probes (q150 sensitivity)
    // and stay uncached.
    if (threshold == 0.8 || threshold == 0.5)
      PlanCache.getOrBuild(s, dir, s"pairs_$threshold")(
        jaccardPairsUncached(s, dir, threshold))
    else jaccardPairsUncached(s, dir, threshold)
  }

  private def jaccardPairsUncached(s: SparkSession, dir: String,
      threshold: Double): DataFrame = {
    // three consumers (sizes + both join sides) → materialize once.
    val inv = persistedInverted(s, dir)
    val sizes = inv.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // inverted-index self-join: |A ∩ B| = #common shingles; shuffle is
    // on the shingle key so cost tracks posting-list sizes, not |docs|².
    val inter = inv.alias("a")
      .join(inv.alias("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("n_common").cast("double")
          / (col("na") + col("nb") - col("n_common"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Oracle twin of [[jaccardPairs]] as a `pairs` CTE chain. */
  private[ops] def jaccardPairsDuckCte(threshold: Double): String =
    s"""$shingledDuckCte,
      sizes AS (SELECT doc_id, count(*) AS n FROM inv GROUP BY 1),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          count(*) AS n_common
        FROM inv a JOIN inv b
        ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      pairs AS (SELECT doc_a, doc_b,
          n_common::DOUBLE / (sa.n + sb.n - n_common) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= $threshold)"""

  private val q20 = QueryDef(
    "q20_ngram_jaccard",
    (s, dir) => jaccardPairs(s, dir, 0.8).orderBy("doc_a", "doc_b"),
    Some(s"""WITH ${jaccardPairsDuckCte(0.8)}
      SELECT doc_a, doc_b, jaccard FROM pairs ORDER BY doc_a, doc_b"""))

  // ---------- q48: df-capped n-gram Jaccard (skew-hardened) -----------

  /** Document-frequency cap for the hardened Jaccard variant: shingles
    * appearing in more docs than this are dropped before the self-join.
    */
  private val DfCap = 25L

  /** q20's exact inverted-index self-join, hardened against hot-shingle
    * skew: shingles with document frequency > [[DfCap]] (stopword-like
    * n-grams) are removed BEFORE the self-join, bounding every posting
    * list to ≤ DfCap entries and therefore every shingle's join
    * contribution to ≤ DfCap² pairs — the unbounded quadratic tail that
    * makes the exact q20 formulation a scale risk at 100 TB lives
    * entirely in those hot lists. Jaccard here is computed over the
    * capped shingle universe on BOTH sides (sizes and intersections),
    * so the score is a deterministic, oracle-verifiable quantity, and
    * near-dup pairs (whose shared shingles are overwhelmingly rare ones)
    * keep essentially the same scores — the standard stopword-pruning
    * tradeoff, made explicit as its own query so the exact variant
    * stays available.
    *
    * The hot-shingle set is tiny (only shingles above the cap), so the
    * anti-join broadcasts at any corpus size.
    */
  private val q48 = QueryDef(
    "q48_jaccard_dfcap",
    (s, dir) => {
      val inv0 = persistedInverted(s, dir)
      val hot = inv0.groupBy(col("h")).agg(count(lit(1)).as("df"))
        .where(col("df") > DfCap).select(col("h"))
      val inv = inv0.join(broadcast(hot), Seq("h"), "left_anti")
      val sizes = inv.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = inv.alias("a")
        .join(inv.alias("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_common"))
      inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          (col("n_common").cast("double")
            / (col("na") + col("nb") - col("n_common"))).as("jaccard"))
        .where(col("jaccard") >= 0.8)
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""WITH $shingledDuckCte,
      hot AS (SELECT h FROM inv GROUP BY h HAVING count(*) > $DfCap),
      capped AS (SELECT doc_id, h FROM inv WHERE h NOT IN (SELECT h FROM hot)),
      sizes AS (SELECT doc_id, count(*) AS n FROM capped GROUP BY 1),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          count(*) AS n_common
        FROM capped a JOIN capped b
        ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT doc_a, doc_b,
        n_common::DOUBLE / (sa.n + sb.n - n_common) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= 0.8
      ORDER BY doc_a, doc_b"""))

  // ---------- q49: near-dup cluster connected components --------------

  /** Connected components over the near-dup pair graph — the correct
    * "apply" step when duplicate pairs CHAIN (A~B, B~C without A~C):
    * q39's greedy drop-higher-id rule is exact only for disjoint pairs;
    * component labeling keeps exactly one canonical doc (the component's
    * min id) per transitive cluster.
    *
    * Distributed shape: iterative min-label propagation expressed as
    * DataFrame joins — each round every node takes the min of its own
    * and its neighbors' labels (one shuffle join + one aggregate), and
    * rounds needed = component diameter (near-dup clusters are shallow;
    * the large-star/small-star transform halves rounds if extreme
    * diameters ever matter). The per-round `changed` count is the
    * standard Pregel-style driver-side convergence scalar, not a data
    * collect; each round's labels are persisted and the previous
    * round's released, so lineage and memory stay bounded. The final
    * labels are localCheckpoint'ed so the returned plan doesn't carry
    * the iteration history.
    *
    * Oracle: an independent DuckDB `WITH RECURSIVE` reachability
    * closure (set-semantics UNION bounds it) — same fixpoint, entirely
    * different algorithm, so agreement is strong evidence of
    * correctness.
    */
  /** Min-label propagation over an undirected pair list `(a, b)`:
    * returns one `(node, component)` row per distinct endpoint, where
    * `component` is the smallest node id reachable from `node`. Each
    * round is one shuffle join + one min aggregate; rounds needed =
    * max component diameter (capped by `maxRounds`, then returned
    * as-is — callers at extreme diameters should switch to the
    * large-star/small-star transform). Per-round labels are persisted
    * and the previous round's released; the result is
    * localCheckpoint'ed so the returned plan carries no iteration
    * history. The per-round `changed` count is the standard
    * Pregel-style driver-side convergence scalar, not a data collect.
    */
  private[graft] def connectedComponents(pairs: DataFrame,
      maxRounds: Int = 50): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val Seq(a, b) = pairs.columns.toSeq.take(2)
    val edges = pairs.select(col(a).as("u"), col(b).as("v"))
      .unionAll(pairs.select(col(b).as("u"), col(a).as("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var persisted = edges.select(col("u")).distinct()
      .withColumn("l", col("u"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = persisted
    val lType = persisted.schema("l").dataType
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      val neigh = edges
        .join(labels.select(col("u").as("v"), col("l")), "v")
        .select(col("u"), col("l"))
      // The node's own previous label rides along as `lp` (non-null on
      // exactly the one labels-row per u), so convergence is read off
      // the aggregate itself — min(l) < lp — with no join against the
      // previous round; the count is one scan of the just-persisted
      // aggregate, which doubles as its materialization action.
      val next = labels.select(col("u"), col("l"), col("l").as("lp"))
        .unionAll(neigh.select(col("u"), col("l"),
          lit(null).cast(lType).as("lp")))
        .groupBy(col("u")).agg(min(col("l")).as("l"), max(col("lp")).as("lp"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = next.where(col("l") < col("lp")).count()
      persisted.unpersist(blocking = false): Unit
      persisted = next
      labels = next.select(col("u"), col("l"))
      rounds += 1
    }
    val out = labels.localCheckpoint(true)
    persisted.unpersist(blocking = false): Unit
    edges.unpersist(blocking = false): Unit
    out.select(col("u").as("node"), col("l").as("component"))
  }

  /** Connected components for BATCH-BOUNDED graphs (long-typed ids):
    * when the edge set fits one task (≤ `smallLimit` edges — memory is
    * edges × two longs plus map overhead, a few MB at the default),
    * run a path-compressed min-root union-find inside ONE
    * `mapPartitions` task instead of paying diameter-many
    * shuffle-join-count rounds: the iterative propagation's per-round
    * job overhead is the entire cost on a small graph (measured: a
    * 96-edge contracted graph spent ~3 s in round scheduling at
    * sf0.1). Above the threshold it falls back to the distributed
    * [[connectedComponents]] — the caller's graph must be bounded by
    * something (q140: the ingest batch's contracted component graph)
    * for the single-task path to be the common case; this is the
    * bounded-frame convention, not a collect (rows never reach the
    * driver). Union-by-min-root keeps the [[connectedComponents]]
    * contract: component = min reachable id.
    */
  private[graft] def connectedComponentsBounded(pairs: DataFrame,
      smallLimit: Long = 100000L): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val Seq(a, b) = pairs.columns.toSeq.take(2)
    val e = pairs.select(col(a).cast("long").as("u"),
        col(b).cast("long").as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = e.count()
    val out =
      if (n > smallLimit) connectedComponents(e)
      else {
        val spark = pairs.sparkSession
        import spark.implicits._
        e.as[(Long, Long)].repartition(1).mapPartitions { it =>
          val parent = scala.collection.mutable.HashMap.empty[Long, Long]
          def find(x: Long): Long = {
            var r = x
            while (parent.getOrElse(r, r) != r) r = parent(r)
            var c = x
            while (parent.getOrElse(c, c) != r) {
              val nx = parent(c); parent(c) = r; c = nx
            }
            r
          }
          it.foreach { case (u, v) =>
            parent.getOrElseUpdate(u, u)
            parent.getOrElseUpdate(v, v)
            val ru = find(u); val rv = find(v)
            if (ru != rv) {
              if (ru < rv) parent(rv) = ru else parent(ru) = rv
            }
          }
          parent.keysIterator.map(k => (k, find(k)))
            .toArray.iterator
        }.toDF("node", "component")
      }
    val res = out.localCheckpoint(true)
    e.unpersist(blocking = false): Unit
    res
  }

  /** Connected components via alternating large-star/small-star edge
    * rewriting (Kiveris et al., "Connected Components in MapReduce and
    * Beyond") — the flagged alternative to [[connectedComponents]] for
    * HIGH-DIAMETER graphs: min-label propagation needs diameter rounds
    * (a 10⁶-long chain of near-identical documents = 10⁶ shuffles),
    * while the star transforms contract every component to a star in
    * O(log²) rounds in the worst case and ~log rounds in practice,
    * because each step rewires nodes directly to the current local
    * minimum rather than moving labels one hop.
    *
    * Per round: large-star links every larger neighbor of each node to
    * the neighborhood minimum (one groupBy + one join on the
    * bidirected edge list), small-star does the same for smaller
    * neighbors on the canonicalized list (one groupBy + one join).
    * Convergence is read from a (count, hash-sum) signature of the
    * edge set — two scalars per round, Pregel-style, never a data
    * collect. At the fixpoint the edge set IS the star forest, so
    * labels fall out as (leaf → root) plus (root → root) with no extra
    * pass. Same contract as the propagation variant: one
    * (node, component=min reachable id) row per distinct endpoint,
    * localCheckpoint'ed so no iteration history rides the plan.
    * DedupSpec proves label equality on chains/stars/disjoint graphs
    * and that the round count is strictly below propagation's on a
    * chain.
    */
  private[graft] def connectedComponentsStar(pairs: DataFrame,
      maxRounds: Int = 50): DataFrame =
    connectedComponentsStarWithRounds(pairs, maxRounds)._1

  private[graft] def connectedComponentsStarWithRounds(pairs: DataFrame,
      maxRounds: Int = 50): (DataFrame, Int) = {
    import org.apache.spark.storage.StorageLevel
    val Seq(a, b) = pairs.columns.toSeq.take(2)
    var edges = pairs.select(
        least(col(a), col(b)).as("u"), greatest(col(a), col(b)).as("v"))
      .where(col("u") =!= col("v")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // (count, xor-of-hashes): order-independent, overflow-free under
    // ANSI (a sum of 64-bit hashes would throw), exact on a distinct set
    def sig(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var prevSig = sig(edges)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      // large-star: for every node u, link each LARGER neighbor to the
      // minimum of u's closed neighborhood. m <= u < v, so (m, v) is
      // already canonical and never a self-loop.
      val bi = edges.select(col("u"), col("v"))
        .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = bi.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val ls = bi.where(col("v") > col("u"))
        .join(mins, "u")
        .select(col("m").as("u"), col("v"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      // small-star: on the canonical (u < v) list, group by the larger
      // endpoint; every smaller neighbor (and the endpoint itself)
      // links to the group minimum.
      val g = ls.groupBy(col("v")).agg(min(col("u")).as("m"))
      // localCheckpoint (not persist): each round's plan references the
      // previous round's ~18 times, so lineage left in place grows
      // exponentially in rounds; the eager checkpoint truncates it to
      // a scan of this round's materialized edge set.
      val ss = ls.join(g, "v")
        .where(col("u") =!= col("m"))
        .select(col("m").as("u"), col("u").as("v"))
        .unionAll(g.select(col("m").as("u"), col("v")))
        .distinct()
        .localCheckpoint(true)
      val s = sig(ss)
      ls.unpersist(blocking = false): Unit
      edges.unpersist(blocking = false): Unit
      edges = ss
      converged = s == prevSig
      prevSig = s
      rounds += 1
    }
    val labels = edges.select(col("v").as("node"), col("u").as("component"))
      .unionAll(edges.select(col("u").as("node"), col("u").as("component")))
      .groupBy(col("node")).agg(min(col("component")).as("component"))
    val out = labels.localCheckpoint(true)
    edges.unpersist(blocking = false): Unit
    (out, rounds)
  }

  /** Component labels for the threshold-0.8 near-dup graph, cached per
    * (session, dir) — q49, q90, and the transitive curation path all
    * consume the same labeling, and the iterative loop is the most
    * expensive subplan in the dedup family; one materialization per
    * run serves all three (the result is already localCheckpoint'ed,
    * so the cache holds a plan with no iteration history).
    */
  private[ops] def ccLabels(s: SparkSession, dir: String,
      threshold: Double): DataFrame =
    PlanCache.getOrBuild(s, dir, s"cc_$threshold") {
      val pairs = jaccardPairs(s, dir, threshold)
        .select(col("doc_a"), col("doc_b"))
      // graft.cc.algorithm=star switches to large-star/small-star for
      // high-diameter duplicate graphs (chain-shaped boilerplate);
      // both produce identical (node, min-reachable-id) labels.
      if (s.conf.getOption("graft.cc.algorithm").contains("star"))
        connectedComponentsStar(pairs)
      else connectedComponents(pairs)
    }

  private val q49 = QueryDef(
    "q49_dedup_components",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      ccLabels(s, dir, 0.8)
        .select(col("node").as("doc_id"), col("component").as("cluster_id"))
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
        .orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE ${jaccardPairsDuckCte(0.8)},
      edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL SELECT doc_b AS u, doc_a AS v FROM pairs),
      reach(u, l) AS (
        SELECT u, u AS l FROM (SELECT DISTINCT u FROM edges) t
        UNION
        SELECT e.u, r.l FROM edges e JOIN reach r ON r.u = e.v),
      comp AS (SELECT u AS doc_id, min(l) AS cluster_id
        FROM reach GROUP BY u)
      SELECT doc_id, cluster_id,
        count(*) OVER (PARTITION BY cluster_id) AS cluster_size
      FROM comp ORDER BY doc_id"""))

  // ---------- q57: sparse TF-cosine similarity (IR-style) -------------

  /** Sparse top-k retrieval over term-frequency vectors — the classic
    * information-retrieval scoring join, complementing the dense
    * embedding KNN (q22/q23): a SMALL query set's tf rows broadcast
    * against the corpus posting table, dot products aggregate per
    * (query, doc), norms join back, cosine is ONE double division of
    * exactly-representable integers (so the oracle hash-matches
    * bit-exactly), then per-query top-k.
    *
    * The shape deliberately mirrors q22 (broadcast queries, one corpus
    * pass, never corpus×corpus): the ALL-PAIRS formulation of this
    * join — tf self-join on the term key — measured 113 s at sf0.1 on
    * this fixture, because the synthetic corpus's tiny shared
    * vocabulary makes every posting list corpus-sized (the q20 skew
    * class with no rare-term tail to save it, and a df-cap would empty
    * the vectors). Retrieval against a bounded query set is the form
    * that scales regardless of vocabulary shape: cost = |query terms|
    * × their posting lists, one shuffle on (query, doc).
    */
  private val KSparse = 5
  private val NSparseQueries = 8

  private val q57 = QueryDef(
    "q57_sparse_retrieval",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // PlanCache (not persist-then-unpersist, which dropped the cache
      // before the lazy plan ever executed): the tf table is consumed
      // three times below (norms, broadcast query side, scoring join)
      // and materializes exactly once per run.
      val tf = PlanCache.getOrBuild(s, dir, "q57_tf")(docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf")))
      val n2 = tf.groupBy(col("doc_id")).agg(sum(col("tf") * col("tf")).as("n2"))
      val qtf = broadcast(tf.where(col("doc_id") < NSparseQueries)
        .select(col("doc_id").as("query_id"), col("tok"), col("tf").as("qtf")))
      val dots = tf.join(qtf, "tok")
        .where(col("doc_id") =!= col("query_id"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("tf") * col("qtf")).as("dot"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("doc_id"))
      // the top-k table itself is cached: q115's fusion re-consumes this
      // exact ranking, and it is |queries|·k rows — the cheapest possible
      // thing to hold versus re-running the corpus scoring join
      PlanCache.getOrBuild(s, dir, "q57_topk")(dots
        .join(n2.select(col("doc_id").as("query_id"), col("n2").as("n2q")),
          "query_id")
        .join(n2, "doc_id")
        .select(col("query_id"), col("doc_id"),
          (col("dot").cast("double")
            / sqrt((col("n2q") * col("n2")).cast("double"))).as("cosine"))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= KSparse)
        .select(col("query_id"), col("rnk"), col("doc_id"), col("cosine")))
        .orderBy("query_id", "rnk")
    },
    Some(s"""WITH toks AS (SELECT doc_id,
        unnest(string_split(text, ' ')) AS tok FROM documents),
      tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
      n2 AS (SELECT doc_id, sum(tf * tf)::BIGINT AS n2 FROM tf GROUP BY 1),
      dots AS (SELECT q.doc_id AS query_id, c.doc_id,
          sum(c.tf * q.tf)::BIGINT AS dot
        FROM tf c JOIN tf q ON q.tok = c.tok
        WHERE q.doc_id < $NSparseQueries AND c.doc_id <> q.doc_id
        GROUP BY 1, 2),
      scored AS (SELECT query_id, dots.doc_id AS doc_id,
          dot::DOUBLE / sqrt((x.n2 * y.n2)::DOUBLE) AS cosine
        FROM dots JOIN n2 x ON x.doc_id = query_id
        JOIN n2 y ON y.doc_id = dots.doc_id),
      r AS (SELECT query_id, doc_id, cosine, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS rnk
        FROM scored)
      SELECT query_id, rnk, doc_id, cosine FROM r
      WHERE rnk <= $KSparse ORDER BY query_id, rnk"""))

  // ---------- q21: embedding-cosine near-dup pairs --------------------

  /** Cosine as three sequential left folds (dot, |a|², |b|²) so Spark's
    * `aggregate` and DuckDB's `list_reduce` see the identical operation
    * order → bit-identical doubles. Floats are widened to double before
    * any arithmetic (exact). The Spark side evaluates the fused
    * codegen'd CosineSimilarity expression, which implements the same
    * fold order natively.
    */
  private[graft] def cosFoldSpark(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> cast(x AS DOUBLE) * cast(y AS DOUBLE)), cast(0 AS DOUBLE), (acc, v) -> acc + v) / " +
      s"sqrt(aggregate(transform($a, x -> cast(x AS DOUBLE) * cast(x AS DOUBLE)), cast(0 AS DOUBLE), (acc, v) -> acc + v) * " +
      s"aggregate(transform($b, x -> cast(x AS DOUBLE) * cast(x AS DOUBLE)), cast(0 AS DOUBLE), (acc, v) -> acc + v))"

  private[graft] val cosSpark: String = cosFoldSpark("ea", "eb")

  private[graft] def cosDuck(a: String, b: String): String = {
    def fold(l: String) =
      s"list_reduce(list_prepend(0.0::DOUBLE, $l), (acc, v) -> acc + v)"
    val dot = fold(s"list_transform(range(1, len($a) + 1), " +
      s"i -> $a[i]::DOUBLE * $b[i]::DOUBLE)")
    def nrm(v: String) = fold(s"list_transform($v, x -> x::DOUBLE * x::DOUBLE)")
    s"$dot / sqrt(${nrm(a)} * ${nrm(b)})"
  }

  /** Brute-force O(n²/2) pair scan — correct exact baseline; the 100 TB
    * path is q23's LSH bucketing (Similarity.scala), which reuses the
    * same verify expression over a candidate set instead of all pairs.
    *
    * Parallelism note (round-13 sf3 canary finding): AQE's byte-based
    * coalescing sees only a few MB of vectors per side and planned a
    * 1×1 CartesianProduct grid — serializing the n²/2 CPU-bound cosine
    * evaluations on ONE core (35+ min at sf3, unbounded). Byte-sized
    * planning is blind to CPU-quadratic operators, so the left side
    * pins an explicit core-count round-robin repartition (user-specified
    * → AQE keeps it; width = the session's defaultParallelism, so the
    * grid matches whatever host the job lands on instead of a
    * hardcoded 32): the pair grid becomes cores × right-side tasks
    * with identical semantics, and the exact baseline scales with
    * cores.
    */
  /** Above this corpus size the exact baseline DECLARES a bounded
    * sample: the probe (a) side keeps every k-th vec_id with k chosen
    * so the pair count stays ≤ [[Q21PairBudget]]. Below it (every
    * oracle-gated SF and the sf0.1 bench board, ≤ 60 000 at sf3) the
    * query is the unchanged exhaustive scan — the oracle gates the
    * exact form; the sample only exists so scale canaries (sf10+)
    * measure the engine's other 500 queries instead of being 10×
    * dominated by the one declared quadratic (its 100 TB answer is
    * q23/q78/q258/q531, not a bigger sample).
    */
  private val Q21SampleThreshold = 100000L
  private val Q21PairBudget = 1.2e9

  private val q21 = QueryDef(
    "q21_embedding_neardup",
    (s, dir) => {
      val e = Fixtures.table(s, dir, "embeddings")
      val n = e.count()
      val aAll = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
      val a = (if (n <= Q21SampleThreshold) aAll
        else {
          val k = math.ceil(n.toDouble * n.toDouble / Q21PairBudget).toLong
          aAll.where(col("vec_a") % k === 0)
        }).repartition(s.sparkContext.defaultParallelism)
      val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
      a.join(b, col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          expr("graft_cosine(ea, eb)").as("cosine"))
        .where(col("cosine") >= 0.3)
        .orderBy("vec_a", "vec_b")
    },
    Some(s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      ${cosDuck("a.embedding", "b.embedding")} AS cosine
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE ${cosDuck("a.embedding", "b.embedding")} >= 0.3
      ORDER BY vec_a, vec_b"""))

  // ---------- q38: edit-distance verify of near-dup pairs -------------

  /** Character-level Levenshtein over the near-dup candidate pairs —
    * the fuzzy-match second opinion after set-based Jaccard (catches
    * e.g. in-token edits that shingle sets overweight). Bounded cost:
    * the O(len²) distance runs only on the ≥0.8 pairs, never all pairs,
    * and on a fixed-length prefix.
    */
  private val q38 = QueryDef(
    "q38_edit_distance",
    (s, dir) => {
      val d = docs(s, dir)
      jaccardPairs(s, dir, 0.8)
        .join(d.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
        .join(d.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("jaccard"),
          levenshtein(substring(col("ta"), 1, 100),
            substring(col("tb"), 1, 100)).as("edit_prefix100"))
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""WITH ${jaccardPairsDuckCte(0.8)}
      SELECT doc_a, doc_b, jaccard,
        levenshtein(substring(da.text, 1, 100),
          substring(db.text, 1, 100)) AS edit_prefix100
      FROM pairs
      JOIN documents da ON da.doc_id = doc_a
      JOIN documents db ON db.doc_id = doc_b
      ORDER BY doc_a, doc_b"""))

  // ---------- q39: dedup apply (keep canonical survivors) -------------

  /** The apply step: drop the higher-id member of every near-dup pair
    * (greedy canonicalization — for chained clusters a connected-
    * components pass replaces the greedy rule; pairs here are disjoint)
    * and report the surviving corpus per language. Anti-join against
    * the pair victims — one broadcast-able distinct id set at any
    * scale where dup rate ≪ corpus.
    */
  /** The higher-id member of every near-dup pair — the removal set the
    * apply step (q39) and the curation pipeline (ops.Curate) anti-join
    * against.
    */
  private[ops] def nearDupVictims(s: SparkSession, dir: String,
      threshold: Double): DataFrame =
    jaccardPairs(s, dir, threshold).select(col("doc_b").as("doc_id")).distinct()

  /** Transitive removal set: every non-canonical member of each
    * connected near-dup component (q49 semantics). Strictly more
    * correct than the greedy rule when pairs chain — e.g. pairs
    * (2,3),(1,3) put {1,2,3} in one cluster, where greedy keeps both 1
    * and 2 but only 1 is canonical.
    */
  private[ops] def nearDupVictimsTransitive(s: SparkSession, dir: String,
      threshold: Double): DataFrame =
    ccLabels(s, dir, threshold)
      .where(col("node") =!= col("component"))
      .select(col("node").as("doc_id"))

  private val q39 = QueryDef(
    "q39_dedup_apply",
    (s, dir) => {
      val victims = nearDupVictims(s, dir, 0.8)
      docs(s, dir)
        .join(victims, Seq("doc_id"), "left_anti")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"))
        .orderBy("lang")
    },
    Some(s"""WITH ${jaccardPairsDuckCte(0.8)}
      SELECT lang, count(*) AS n_kept FROM documents
      WHERE doc_id NOT IN (SELECT doc_b FROM pairs)
      GROUP BY lang ORDER BY lang"""))

  // ---------- q76: prefix-filtered exact Jaccard (AllPairs/PPJoin) ----

  /** q20's exact τ=0.8 Jaccard pairs found through PREFIX FILTERING —
    * the AllPairs/PPJoin candidate-pruning technique: order every
    * document's shingles by ascending global document frequency
    * (rarest first, (df, h) as the total order), and self-join only
    * each document's first n − ⌈τ·n⌉ + 1 shingles. Any pair with
    * J ≥ τ must overlap in ≥ ⌈τ·n⌉ shingles, so skipping a document's
    * whole prefix leaves too few positions for the required overlap —
    * no qualifying pair is lost, and the join now touches only RARE
    * shingles' posting lists (a 0.8 threshold indexes ~20 % of each
    * document, and the df ordering makes those entries the low-df
    * tail). Candidates are then verified with the exact Jaccard over
    * the full posting table. Same result set as q20 (DedupSpec asserts
    * equality); the candidate-generation cost drops from Σ df² over
    * ALL shingles to Σ df² over prefix entries — at 100 TB this is the
    * difference between the join being posting-bound and being
    * candidate-bound.
    *
    * Honest crossover note: at fixture scale the exhaustive q20 join is
    * CHEAPER (0.45 s vs 2.1 s at sf0.1) because posting lists are short
    * and q76 pays a df-ranking window plus a verify pass up front; the
    * technique wins only once hot posting lists make Σ df² the
    * dominant term — which is exactly the 100 TB regime. Both variants
    * stay in the registry for that reason.
    */
  private val q76 = QueryDef(
    "q76_prefix_jaccard",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val inv = persistedInverted(s, dir)
      val dfTab = inv.groupBy(col("h")).agg(count(lit(1)).as("df"))
      val sizes = inv.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
      // frozen (r15): the self-join below consumes prefix TWICE, and one
      // side is planned as a broadcast — without the freeze the whole
      // inv⋈df⋈sizes + window chain executed once per side (measured in
      // the AQE-final plan: two independent Window subtrees)
      val prefix = PlanCache.freeze(inv.join(dfTab, "h")
        .withColumn("rk", row_number().over(w))
        .join(sizes, "doc_id")
        .where(col("rk") <= col("n") - expr("(4 * n + 4) div 5") + 1)
        .select(col("doc_id"), col("h")))
      val cand = prefix.alias("a")
        .join(prefix.alias("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      // r16 verify pass (guide §2.3/§8 — decide with small rows): the
      // old form joined every candidate pair against the FULL posting
      // table twice (Σ_pairs n_a ≈ 6.2M intermediate rows at sf0.1,
      // shuffled and re-aggregated to 119k pairs; 63 executor-cpu-s).
      // Per-doc shingle SETS are tiny (avg ~52 longs × 5k docs, ≈3 MB),
      // so both sides broadcast and n_common = |array_intersect| is
      // computed per candidate row with NO payload shuffle. inv is
      // distinct (doc_id, h), so the set-intersection size equals the
      // old equi-join match count exactly; na/nb and the jaccard
      // division are the unchanged expressions — identical rows out.
      // At 100 TB the candidate pair list is the scaling term and it
      // still never carries posting payloads.
      val docSets = docShingleSets(s, dir)
      cand
        .join(broadcast(docSets.select(col("doc_id").as("doc_a"),
          col("hs").as("ha"), col("n").as("na"))), Seq("doc_a"))
        .join(broadcast(docSets.select(col("doc_id").as("doc_b"),
          col("hs").as("hb"), col("n").as("nb"))), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("ha"), col("hb"))).cast("long")
            .as("n_common"), col("na"), col("nb"))
        .select(col("doc_a"), col("doc_b"),
          (col("n_common").cast("double")
            / (col("na") + col("nb") - col("n_common"))).as("jaccard"))
        .where(col("jaccard") >= 0.8)
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""WITH $shingledDuckCte,
      df AS (SELECT h, count(*) AS df FROM inv GROUP BY 1),
      sizes AS (SELECT doc_id, count(*) AS n FROM inv GROUP BY 1),
      ranked AS (SELECT inv.doc_id, inv.h, sizes.n,
          row_number() OVER (PARTITION BY inv.doc_id
            ORDER BY df.df, inv.h) AS rk
        FROM inv JOIN df USING (h) JOIN sizes USING (doc_id)),
      prefix AS (SELECT doc_id, h FROM ranked
        WHERE rk <= n - (4 * n + 4) // 5 + 1),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM prefix a JOIN prefix b
        ON a.h = b.h AND a.doc_id < b.doc_id),
      inter AS (SELECT doc_a, doc_b, count(*) AS n_common
        FROM cand
        JOIN inv ia ON ia.doc_id = doc_a
        JOIN inv ib ON ib.doc_id = doc_b AND ia.h = ib.h
        GROUP BY 1, 2)
      SELECT doc_a, doc_b,
        n_common::DOUBLE / (sa.n + sb.n - n_common) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= 0.8
      ORDER BY doc_a, doc_b"""))

  // ---------- q81: MinHash estimate accuracy audit --------------------

  /** Sketch-accuracy audit: for every exact-Jaccard ≥ 0.5 pair, the
    * MinHash ESTIMATE (fraction of the 16 signature functions that
    * agree — the unbiased estimator LSH banding is built on) next to
    * the exact score and the absolute error. This is the calibration
    * query a production near-dup pipeline runs on a sample before
    * trusting signatures at 100 TB, where only the estimate is
    * affordable: it turns "LSH probably works on our corpus" into a
    * measured error distribution.
    *
    * Cost: the signature table is one aggregate over the PlanCache'd
    * inverted index; the pair list reuses the exact-join machinery.
    * Both joins key on doc id — no new shuffle class. Determinism:
    * est = k/16 with k integer; exact Jaccard is the same single
    * double division as q20; abs-difference of two exactly-computed
    * doubles is itself exact IEEE.
    */
  private val q81 = QueryDef(
    "q81_minhash_estimate",
    (s, dir) => {
      val mh = corpusSignatures(s, dir)
      val agree = (0 until 16).map(i =>
        when(col(s"a.mh$i") === col(s"b.mh$i"), 1).otherwise(0))
        .reduce(_ + _)
      jaccardPairs(s, dir, 0.5)
        .join(mh.alias("a"), col("doc_a") === col("a.doc_id"))
        .join(mh.alias("b"), col("doc_b") === col("b.doc_id"))
        .select(col("doc_a"), col("doc_b"), col("jaccard"),
          (agree.cast("double") / 16).as("est_jaccard"))
        .withColumn("abs_err", abs(col("jaccard") - col("est_jaccard")))
        .orderBy("doc_a", "doc_b")
    },
    Some {
      val agreeDuck = (0 until 16).map(i =>
        s"CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH ${jaccardPairsDuckCte(0.5)},
      mh AS (SELECT doc_id, $minSelectsDuck FROM inv GROUP BY doc_id)
      SELECT doc_a, doc_b, jaccard,
        ($agreeDuck)::DOUBLE / 16 AS est_jaccard,
        abs(jaccard - ($agreeDuck)::DOUBLE / 16) AS abs_err
      FROM pairs
      JOIN mh a ON a.doc_id = doc_a
      JOIN mh b ON b.doc_id = doc_b
      ORDER BY doc_a, doc_b"""
    })

  // ---------- q82: triangle counting over the similarity graph --------

  /** Per-node triangle counts over the near-dup graph (exact Jaccard
    * ≥ 0.8 edges) — the classic graph statistic distinguishing a
    * clique-like duplicate cluster (every member in many triangles)
    * from a chain of pairwise borderline matches (zero triangles),
    * which is exactly the signal that decides whether q39's greedy
    * keep-one rule is safe or q49's full components are needed.
    *
    * Shape: each triangle is found exactly once by the two-hop join
    * e1=(x,y), e2=(y,z), closed by e3=(x,z), over edges oriented
    * low→high under the DEGREE-ORDERED total order ((deg, id), the
    * Ortmann/Brandes orientation): every node's OUT-degree — the join
    * fan-out that two-hop enumeration pays quadratically — is then
    * capped at O(√|E|) even for hub nodes, because a hub's edges all
    * point INTO it from its (necessarily lower-degree) neighbors. The
    * per-node triangle membership counts are orientation-invariant,
    * so the oracle keeps the simpler id-orientation and must agree
    * exactly. Degrees cost two edge-list-sized aggregates — noise
    * next to the join they bound. The oriented edge list is
    * PlanCache'd: three join sides, one materialization, and
    * broadcast-sized whenever the dup rate is low (edges ≪ corpus —
    * AQE picks that up at runtime).
    */
  private val q82 = QueryDef(
    "q82_triangles",
    (s, dir) => {
      val e = PlanCache.getOrBuild(s, dir, "q82_edges")({
        val raw = jaccardPairs(s, dir, 0.8)
          .select(col("doc_a").as("a"), col("doc_b").as("b"))
        val deg = raw.select(col("a").as("n")).unionAll(
            raw.select(col("b").as("n")))
          .groupBy(col("n")).agg(count(lit(1)).as("d"))
        val lowFirst = col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b"))
        raw
          .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
          .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
          .select(when(lowFirst, col("a")).otherwise(col("b")).as("a"),
            when(lowFirst, col("b")).otherwise(col("a")).as("b"))
      })
      val tri = e.alias("e1")
        .join(e.alias("e2"), col("e1.b") === col("e2.a"))
        .join(e.alias("e3"),
          col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
        .select(col("e1.a").as("x"), col("e1.b").as("y"),
          col("e2.b").as("z"))
      tri.select(explode(array(col("x"), col("y"), col("z"))).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_triangles"))
        .orderBy("doc_id")
    },
    Some(s"""WITH ${jaccardPairsDuckCte(0.8)},
      e AS (SELECT doc_a AS a, doc_b AS b FROM pairs),
      tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1
        JOIN e e2 ON e2.a = e1.b
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      nodes AS (SELECT x AS doc_id FROM tri
        UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
      SELECT doc_id, count(*)::BIGINT AS n_triangles
      FROM nodes GROUP BY doc_id ORDER BY doc_id"""))

  // ---------- q90: near-dup cluster-size histogram --------------------

  /** Size distribution of the transitive near-dup clusters — the
    * shape-of-duplication report a curation run reads before choosing
    * a keep-one policy: many small clusters means boilerplate
    * variation (keep-min is safe, q39/q49 remove size−1 docs each);
    * a few giant clusters means template spam where keeping ONE doc
    * per cluster changes corpus statistics and deserves review.
    * Reuses q49's component labeling (same pair graph, same
    * propagation); the extra work past the labels is two aggregates
    * over the component table — component → size, size → cluster
    * count — both tiny relative to the corpus, with exact
    * removal-count arithmetic (size−1 per cluster). Oracle recomputes
    * the components via the independent recursive closure.
    */
  private val q90 = QueryDef(
    "q90_cluster_sizes",
    (s, dir) => {
      ccLabels(s, dir, 0.8)
        .groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          (sum(col("cluster_size"))).as("n_docs"),
          sum(col("cluster_size") - 1).as("n_removable"))
        .orderBy("cluster_size")
    },
    Some(s"""WITH RECURSIVE ${jaccardPairsDuckCte(0.8)},
      edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL SELECT doc_b AS u, doc_a AS v FROM pairs),
      reach(u, l) AS (
        SELECT u, u AS l FROM (SELECT DISTINCT u FROM edges) t
        UNION
        SELECT e.u, r.l FROM edges e JOIN reach r ON r.u = e.v),
      comp AS (SELECT u AS doc_id, min(l) AS component
        FROM reach GROUP BY u),
      csizes AS (SELECT component, count(*) AS cluster_size
        FROM comp GROUP BY 1)
      SELECT cluster_size::BIGINT AS cluster_size,
        count(*)::BIGINT AS n_clusters,
        sum(cluster_size)::BIGINT AS n_docs,
        sum(cluster_size - 1)::BIGINT AS n_removable
      FROM csizes GROUP BY 1 ORDER BY cluster_size"""))

  // ---------- q92: asymmetric containment join ------------------------

  /** Directional shingle containment C(A→B) = |A∩B| / |A| ≥ 0.9 — the
    * quote/boilerplate detector symmetric Jaccard is blind to: a short
    * doc fully embedded in a long one scores near-zero Jaccard (union
    * is the long doc) but containment 1.0. Training-data curation
    * needs the direction, too — drop the contained copy, keep the
    * superset. One inverted-index self-join computes |A∩B| once per
    * unordered pair (a < b guard, same shuffle shape and the same
    * PlanCache'd posting table as q20), then BOTH directions are
    * emitted from that single intersection table and each normalizes
    * by its own subset size — an exact int64/int64 division, so the
    * score hash-matches bit-for-bit. Cost past q20's join is one
    * union + one broadcast-sized join against the doc-size table.
    */
  private val q92 = QueryDef(
    "q92_containment",
    (s, dir) => {
      val inv = persistedInverted(s, dir)
      val sizes = inv.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = inv.alias("a")
        .join(inv.alias("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_common"))
      val both = inter
        .select(col("doc_a").as("doc_sub"), col("doc_b").as("doc_sup"),
          col("n_common"))
        .unionAll(inter.select(col("doc_b").as("doc_sub"),
          col("doc_a").as("doc_sup"), col("n_common")))
      both
        .join(sizes.select(col("doc_id").as("doc_sub"), col("n")), "doc_sub")
        .select(col("doc_sub"), col("doc_sup"),
          (col("n_common").cast("double") / col("n")).as("containment"))
        .where(col("containment") >= lit(0.9))
        .orderBy("doc_sub", "doc_sup")
    },
    Some(s"""WITH $shingledDuckCte,
      sizes AS (SELECT doc_id, count(*) AS n FROM inv GROUP BY 1),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          count(*) AS n_common
        FROM inv a JOIN inv b
        ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      dirs AS (SELECT doc_a AS doc_sub, doc_b AS doc_sup, n_common
          FROM inter
        UNION ALL
        SELECT doc_b AS doc_sub, doc_a AS doc_sup, n_common FROM inter)
      SELECT doc_sub, doc_sup, n_common::DOUBLE / n AS containment
      FROM dirs JOIN sizes ON sizes.doc_id = doc_sub
      WHERE n_common::DOUBLE / n >= 0.9
      ORDER BY doc_sub, doc_sup"""))

  // ---------- q93: BM25 retrieval -------------------------------------

  /** BM25 top-k retrieval (k1 = 1.2, b = 0.75) over the q57 tf table —
    * the default lexical ranking function (Robertson & Spärck Jones;
    * the Lucene +1 idf form, always positive) beside q57's TF-cosine.
    * Determinism contract: the idf's ln() is the one libm call, pinned
    * with round(…, 12) immediately (the q85 rule); every other
    * per-term factor is a single IEEE operation on identical inputs;
    * the per-(query, doc) SUM of term scores — the one place
    * accumulation ORDER could diverge — is pinned to integer
    * nano-units (round(score·1e9) to scale 0 — decimal-SCALE rounding
    * of full-precision doubles is engine-divergent in the last digit,
    * the q96 lesson; whole-number rounding of the same double is
    * exact on both engines), summed exactly, divided once at the
    * end. Shape: query terms
    * broadcast against the corpus tf table (never corpus×corpus, the
    * q57 rationale), df and the 1-row corpus stats broadcast, one
    * shuffle on (query, doc), top-5 per query by (score, doc_id).
    */
  private val q93 = QueryDef(
    "q93_bm25",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tf = PlanCache.getOrBuild(s, dir, "q57_tf")(docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf")))
      val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      val corpus = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      val qterms = broadcast(tf.where(col("doc_id") < NSparseQueries)
        .select(col("doc_id").as("query_id"), col("tok")).distinct())
      // df restricted to QUERY tokens before aggregating: the
      // full-vocabulary df table is corpus-vocabulary-sized (not
      // broadcastable at 100 TB), while query-term df is |query terms|
      // rows from exactly those tokens' posting lists.
      val dft = tf.join(qterms.select(col("tok")).distinct(), "tok")
        .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("bm25").desc, col("doc_id"))
      // cached for the same reason as q57's: q115 fuses this ranking
      PlanCache.getOrBuild(s, dir, "q93_topk")(tf.join(qterms, "tok")
        .where(col("doc_id") =!= col("query_id"))
        .join(broadcast(dft), "tok")
        .join(dl, "doc_id")
        .crossJoin(broadcast(corpus))
        .withColumn("idf", round(
          log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5))
            / (col("df") + lit(0.5))), 12))
        .withColumn("ts", col("idf") * (col("tf") * lit(2.2))
          / (col("tf") + lit(1.2) * (lit(0.25)
            + lit(0.75) * (col("dl") / (col("sum_dl").cast("double")
              / col("n_docs"))))))
        .withColumn("units", round(col("ts") * lit(1e9)).cast("long"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("units")).as("sunits"))
        .select(col("query_id"), col("doc_id"),
          (col("sunits").cast("double") / lit(1e9)).as("bm25"))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= KSparse)
        .select(col("query_id"), col("rnk"), col("doc_id"), col("bm25")))
        .orderBy("query_id", "rnk")
    },
    Some(s"""WITH toks AS (SELECT doc_id,
        unnest(string_split(text, ' ')) AS tok FROM documents),
      tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
      dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
      corpus AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
      dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
      qterms AS (SELECT DISTINCT doc_id AS query_id, tok FROM tf
        WHERE doc_id < $NSparseQueries),
      terms AS (SELECT q.query_id, c.doc_id,
          round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)), 12)
            * (c.tf * 2.2)
            / (c.tf + 1.2 * (0.25
              + 0.75 * (dl.dl / (sum_dl::DOUBLE / n_docs)))) AS ts
        FROM tf c JOIN qterms q ON q.tok = c.tok
        JOIN dft ON dft.tok = c.tok
        JOIN dl ON dl.doc_id = c.doc_id, corpus
        WHERE c.doc_id <> q.query_id),
      scored AS (SELECT query_id, doc_id,
          sum(round(ts * 1e9)::BIGINT)::DOUBLE / 1e9 AS bm25
        FROM terms GROUP BY 1, 2),
      r AS (SELECT query_id, doc_id, bm25, row_number() OVER (
          PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS rnk
        FROM scored)
      SELECT query_id, rnk, doc_id, bm25 FROM r
      WHERE rnk <= $KSparse ORDER BY query_id, rnk"""))

  // ---------- q104: incremental near-dup (new batch vs corpus) --------

  /** The INGEST-time shape of near-dup detection: an arriving batch
    * (here the deterministic 20 % slice doc_id % 10 < 2, standing in
    * for "today's crawl") is checked against the EXISTING corpus only
    * — new×old on the shingle index, never old×old — which is how
    * dedup actually runs day-to-day at 100 TB: the full q20 self-join
    * happens once at bootstrap, then every increment costs
    * |batch postings| × their matching corpus posting lists, and the
    * corpus side of the join is the standing inverted index (here the
    * same PlanCache'd posting table; in production a bucketed table
    * keyed by shingle hash, so the join co-locates without a corpus
    * shuffle). Jaccard and the ≥ 0.8 threshold are exactly q20's
    * arithmetic; output pairs point each new doc at its existing
    * near-duplicates.
    */
  private val q104 = QueryDef(
    "q104_incremental_dedup",
    (s, dir) => {
      val inv = persistedInverted(s, dir)
      val sizes = inv.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = inv.where(col("doc_id") % 10 >= 2).alias("a")
        .join(inv.where(col("doc_id") % 10 < 2).alias("b"),
          col("a.h") === col("b.h"))
        .groupBy(col("a.doc_id").as("doc_old"), col("b.doc_id").as("doc_new"))
        .agg(count(lit(1)).as("n_common"))
      inter
        .join(sizes.select(col("doc_id").as("doc_old"), col("n").as("na")),
          "doc_old")
        .join(sizes.select(col("doc_id").as("doc_new"), col("n").as("nb")),
          "doc_new")
        .select(col("doc_new"), col("doc_old"),
          (col("n_common").cast("double")
            / (col("na") + col("nb") - col("n_common"))).as("jaccard"))
        .where(col("jaccard") >= lit(0.8))
        .orderBy("doc_new", "doc_old")
    },
    Some(s"""WITH $shingledDuckCte,
      sizes AS (SELECT doc_id, count(*) AS n FROM inv GROUP BY 1),
      inter AS (SELECT a.doc_id AS doc_old, b.doc_id AS doc_new,
          count(*) AS n_common
        FROM inv a JOIN inv b ON a.h = b.h
        WHERE a.doc_id % 10 >= 2 AND b.doc_id % 10 < 2
        GROUP BY 1, 2)
      SELECT doc_new, doc_old,
        n_common::DOUBLE / (sa.n + sb.n - n_common) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_old
      JOIN sizes sb ON sb.doc_id = doc_new
      WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= 0.8
      ORDER BY doc_new, doc_old"""))

  // ---------- q473: ingest-batch LSH dedup vs standing band table ------

  /** The standing per-dir corpus BAND table, IN-PLAN form: (doc_id,
    * band, bkey) over the existing corpus (q104's old/new convention:
    * doc_id % 10 >= 2 is the corpus, % 10 < 2 stands in for the
    * watermark window's arriving batch — `etl/Watermark` produces that
    * window in the real pipeline). This single-job formulation is the
    * streaming twin's static side and the parity reference for the
    * PERSISTED form ([[StandingIndex]]): the gated ingest queries
    * (q473/q490/q500) now read the bootstrap-written bucketed
    * artifacts instead, so the standing corpus is banded once per
    * bootstrap, not once per run — PersistedIndexSpec pins the two
    * forms row-equal across a fresh session.
    */
  private[graft] def corpusBands(s: SparkSession, dir: String): DataFrame =
    PlanCache.getOrBuild(s, dir, "corpus_bands")(
      bandsOf(corpusSignatures(s, dir)
        .where(expr("doc_id % 10 >= 2"))))

  /** Cross-snapshot INGEST dedup via the asymmetric LSH band join — the
    * missing half of the incremental story: q104 probes the full
    * shingle POSTING index per new doc (cost ∝ |batch postings| × their
    * corpus posting lists), while real day-to-day dedup probes the far
    * smaller standing BAND table ([[corpusBands]], 8 fixed-width rows
    * per corpus doc) and pays the exact-Jaccard posting join ONLY for
    * banded candidates. New×old only, never old×old (q104's contract —
    * intra-batch and bootstrap dedup are q18's self-join). Per NEW doc
    * the verdict is emitted keep/drop: drop iff some corpus doc's
    * verified Jaccard ≥ 0.5 (q18's threshold), with the minimal such
    * corpus id as the canonical `dup_of`; docs with no banded candidate
    * (including <3-token docs, which have no shingles) keep with
    * n_cand = 0. Scale shape: the batch's 8·|batch| band rows either
    * broadcast (daily batch ≪ corpus) or shuffle on (band, bkey)
    * against the bucketed standing table — the corpus itself never
    * shuffles; verify joins touch candidates' posting lists only, so
    * total cost ∝ batch size + band collisions, never corpus².
    *
    * PERSISTED as of round 14: the standing side is no longer a
    * session-scoped PlanCache build — both corpus artifacts come from
    * [[StandingIndex]] (the bootstrap-written bucketed band + posting
    * tables, read through the catalog so the bucket layout applies),
    * and only the BATCH side's postings/bands/sizes are computed
    * in-plan. Same output rows, same oracle — the in-plan ⇄ persisted
    * parity is pinned by PersistedIndexSpec.
    * Streaming twin: [[graft.streaming.DocStream.ingestLshCandidates]]
    * (stream-static band join, row-parity pinned by StreamingSpec).
    */
  private val q473 = QueryDef(
    "q473_ingest_lsh_dedup",
    (s, dir) => {
      val batchInv = persistedInverted(s, dir)
        .where(expr("doc_id % 10 < 2"))
      val oldBands = StandingIndex.bands(s, dir)
      val oldPost = StandingIndex.postings(s, dir)
      val newBands = bandsOf(corpusSignatures(s, dir)
        .where(expr("doc_id % 10 < 2")))
      val cand = newBands.alias("n")
        .join(oldBands.alias("o"),
          col("n.band") === col("o.band") && col("n.bkey") === col("o.bkey"))
        .select(col("n.doc_id").as("doc_new"), col("o.doc_id").as("doc_old"))
        .distinct()
      val sizesNew = batchInv.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"))
      val sizesOld = oldPost.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"))
      val j = cand
        .join(batchInv.select(col("doc_id").as("doc_new"), col("h")),
          "doc_new")
        .join(oldPost.select(col("doc_id").as("doc_old"), col("h")),
          Seq("doc_old", "h"))
        .groupBy(col("doc_new"), col("doc_old"))
        .agg(count(lit(1)).as("n_common"))
        .join(sizesNew.select(col("doc_id").as("doc_new"), col("n").as("nn")),
          "doc_new")
        .join(sizesOld.select(col("doc_id").as("doc_old"), col("n").as("no")),
          "doc_old")
        .select(col("doc_new"), col("doc_old"),
          (col("n_common").cast("double")
            / (col("nn") + col("no") - col("n_common"))).as("jaccard"))
      val cagg = cand.groupBy(col("doc_new"))
        .agg(count(lit(1)).as("n_cand"))
      val dagg = j.where(col("jaccard") >= 0.5)
        .groupBy(col("doc_new"))
        .agg(count(lit(1)).as("n_dups"),
          max(col("jaccard")).as("best_jaccard"),
          min(col("doc_old")).as("dup_of"))
      docs(s, dir).where(expr("doc_id % 10 < 2")).select(col("doc_id"))
        .join(cagg.withColumnRenamed("doc_new", "doc_id"), Seq("doc_id"),
          "left_outer")
        .join(dagg.withColumnRenamed("doc_new", "doc_id"), Seq("doc_id"),
          "left_outer")
        .select(col("doc_id"),
          coalesce(col("n_cand"), lit(0L)).as("n_cand"),
          coalesce(col("n_dups"), lit(0L)).as("n_dups"),
          col("best_jaccard"), col("dup_of"),
          when(col("dup_of").isNull, "keep").otherwise("drop")
            .as("verdict"))
        .orderBy("doc_id")
    },
    Some {
      val minSelects = minSelectsDuck
      val bandSelects = (0 until NBands).map { bnd =>
        s"SELECT doc_id, $bnd AS band, md5(mh${2 * bnd}::VARCHAR || ',' || " +
          s"mh${2 * bnd + 1}::VARCHAR) AS bkey FROM mh"
      }.mkString(" UNION ALL ")
      s"""WITH $shingledDuckCte,
      mh AS (SELECT doc_id, $minSelects FROM inv GROUP BY doc_id),
      bands AS ($bandSelects),
      cand AS (SELECT DISTINCT n.doc_id AS doc_new, o.doc_id AS doc_old
        FROM bands n JOIN bands o
        ON n.band = o.band AND n.bkey = o.bkey
        WHERE n.doc_id % 10 < 2 AND o.doc_id % 10 >= 2),
      sizes AS (SELECT doc_id, count(*) AS n FROM inv GROUP BY 1),
      jac AS (SELECT c.doc_new, c.doc_old,
          count(*)::DOUBLE / (sn.n + so.n - count(*)) AS jaccard
        FROM cand c
        JOIN inv a ON a.doc_id = c.doc_new
        JOIN inv b ON b.doc_id = c.doc_old AND b.h = a.h
        JOIN sizes sn ON sn.doc_id = c.doc_new
        JOIN sizes so ON so.doc_id = c.doc_old
        GROUP BY c.doc_new, c.doc_old, sn.n, so.n),
      cagg AS (SELECT doc_new, count(*)::BIGINT AS n_cand
        FROM cand GROUP BY 1),
      dagg AS (SELECT doc_new, count(*)::BIGINT AS n_dups,
          max(jaccard) AS best_jaccard, min(doc_old)::BIGINT AS dup_of
        FROM jac WHERE jaccard >= 0.5 GROUP BY 1)
      SELECT d.doc_id, coalesce(n_cand, 0)::BIGINT AS n_cand,
        coalesce(n_dups, 0)::BIGINT AS n_dups, best_jaccard, dup_of,
        CASE WHEN dup_of IS NULL THEN 'keep' ELSE 'drop' END AS verdict
      FROM documents d
      LEFT JOIN cagg ON cagg.doc_new = d.doc_id
      LEFT JOIN dagg ON dagg.doc_new = d.doc_id
      WHERE d.doc_id % 10 < 2
      ORDER BY d.doc_id"""
    })

  // ---------- q111: dedup token savings --------------------------------

  /** What near-dedup actually buys, in the unit budgets are written in:
    * TOKENS kept vs removed per language — q39 reports documents, but
    * training cost and corpus-mix targets are token-denominated, and
    * duplicates skew long (boilerplate), so the doc-level and
    * token-level pictures genuinely differ. Reuses the transitive
    * victim set (ccLabels — already materialized once per run) and
    * one corpus token-count pass; exact integer sums, removal share =
    * one division. The left-anti/victim split is computed as ONE
    * outer join with a flag, not two passes.
    */
  private val q111 = QueryDef(
    "q111_dedup_savings",
    (s, dir) => {
      val victims = nearDupVictimsTransitive(s, dir, 0.8)
        .withColumn("removed", lit(1L))
      docs(s, dir)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_toks"))
        .join(victims, Seq("doc_id"), "left_outer")
        .withColumn("removed", coalesce(col("removed"), lit(0L)))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("removed")).as("n_removed"),
          sum(col("n_toks")).as("n_tokens"),
          sum(col("removed") * col("n_toks")).as("tokens_removed"))
        .select(col("lang"), col("n_docs"), col("n_removed"),
          col("n_tokens"), col("tokens_removed"),
          (col("tokens_removed").cast("double") / col("n_tokens"))
            .as("token_removal_rate"))
        .orderBy("lang")
    },
    Some(s"""WITH RECURSIVE ${jaccardPairsDuckCte(0.8)},
      edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL SELECT doc_b AS u, doc_a AS v FROM pairs),
      reach(u, l) AS (
        SELECT u, u AS l FROM (SELECT DISTINCT u FROM edges) t
        UNION
        SELECT e.u, r.l FROM edges e JOIN reach r ON r.u = e.v),
      comp AS (SELECT u AS doc_id, min(l) AS component
        FROM reach GROUP BY u),
      victims AS (SELECT doc_id FROM comp WHERE doc_id <> component),
      d AS (SELECT d.doc_id, lang, len(string_split(text, ' ')) AS n_toks,
          CASE WHEN v.doc_id IS NULL THEN 0 ELSE 1 END AS removed
        FROM documents d LEFT JOIN victims v ON v.doc_id = d.doc_id)
      SELECT lang, count(*)::BIGINT AS n_docs,
        sum(removed)::BIGINT AS n_removed,
        sum(n_toks)::BIGINT AS n_tokens,
        sum(removed * n_toks)::BIGINT AS tokens_removed,
        sum(removed * n_toks)::DOUBLE / sum(n_toks)
          AS token_removal_rate
      FROM d GROUP BY lang ORDER BY lang"""))

  // ---------- q115: hybrid retrieval fusion (RRF) ----------------------

  /** Reciprocal Rank Fusion (Cormack et al.) of the two retrieval
    * rankings this engine already produces for the SAME query set —
    * q57's TF-cosine and q93's BM25 — the standard way hybrid search
    * combines lexical and vector scores WITHOUT calibrating their
    * incomparable scales: each system contributes 1/(60 + rank), so
    * only rank order matters. Determinism: the contribution table is
    * tiny and fixed (rank 1..K), each unit value is round(1e9/(60+r))
    * — one IEEE division on identical integer inputs, whole-number
    * rounded (exact both engines, q93's rule) — and the fused score is
    * an exact int64 sum divided once for display. A doc missing from
    * one system's top-K contributes 0 from that system (full outer
    * join), which is RRF's defined behavior on truncated lists.
    * Shape: two top-K tables (each |queries|·K rows) full-outer-joined
    * on (query, doc) — bounded by the query set regardless of corpus
    * size; both inputs reuse the PlanCache'd tf table, so the fusion
    * itself adds no corpus pass at all.
    */
  private val q115 = QueryDef(
    "q115_rrf_fusion",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      def units(rnk: org.apache.spark.sql.Column) =
        round(lit(1e9) / (lit(60) + rnk)).cast("long")
      val cosR = q57.fn(s, dir)
        .select(col("query_id"), col("doc_id"), units(col("rnk")).as("u_cos"))
      val bmR = q93.fn(s, dir)
        .select(col("query_id"), col("doc_id"), units(col("rnk")).as("u_bm"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("rrf").desc, col("doc_id"))
      cosR.join(bmR, Seq("query_id", "doc_id"), "full_outer")
        .select(col("query_id"), col("doc_id"),
          (coalesce(col("u_cos"), lit(0L)) + coalesce(col("u_bm"), lit(0L)))
            .as("u"))
        .select(col("query_id"), col("doc_id"),
          (col("u").cast("double") / lit(1e9)).as("rrf"))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= KSparse)
        .select(col("query_id"), col("rnk"), col("doc_id"), col("rrf"))
        .orderBy("query_id", "rnk")
    },
    Some(s"""WITH toks AS (SELECT doc_id,
        unnest(string_split(text, ' ')) AS tok FROM documents),
      tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
      n2 AS (SELECT doc_id, sum(tf * tf)::BIGINT AS n2 FROM tf GROUP BY 1),
      dots AS (SELECT q.doc_id AS query_id, c.doc_id,
          sum(c.tf * q.tf)::BIGINT AS dot
        FROM tf c JOIN tf q ON q.tok = c.tok
        WHERE q.doc_id < $NSparseQueries AND c.doc_id <> q.doc_id
        GROUP BY 1, 2),
      cscored AS (SELECT query_id, dots.doc_id AS doc_id,
          dot::DOUBLE / sqrt((x.n2 * y.n2)::DOUBLE) AS cosine
        FROM dots JOIN n2 x ON x.doc_id = query_id
        JOIN n2 y ON y.doc_id = dots.doc_id),
      cr AS (SELECT query_id, doc_id, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS rnk
        FROM cscored),
      ctop AS (SELECT query_id, doc_id,
          round(1e9 / (60 + rnk))::BIGINT AS u_cos
        FROM cr WHERE rnk <= $KSparse),
      dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
      corpus AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
      dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
      qterms AS (SELECT DISTINCT doc_id AS query_id, tok FROM tf
        WHERE doc_id < $NSparseQueries),
      terms AS (SELECT q.query_id, c.doc_id,
          round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)), 12)
            * (c.tf * 2.2)
            / (c.tf + 1.2 * (0.25
              + 0.75 * (dl.dl / (sum_dl::DOUBLE / n_docs)))) AS ts
        FROM tf c JOIN qterms q ON q.tok = c.tok
        JOIN dft ON dft.tok = c.tok
        JOIN dl ON dl.doc_id = c.doc_id, corpus
        WHERE c.doc_id <> q.query_id),
      bscored AS (SELECT query_id, doc_id,
          sum(round(ts * 1e9)::BIGINT) AS su
        FROM terms GROUP BY 1, 2),
      br AS (SELECT query_id, doc_id, row_number() OVER (
          PARTITION BY query_id ORDER BY su DESC, doc_id) AS rnk
        FROM bscored),
      btop AS (SELECT query_id, doc_id,
          round(1e9 / (60 + rnk))::BIGINT AS u_bm
        FROM br WHERE rnk <= $KSparse),
      fused AS (SELECT coalesce(c.query_id, b.query_id) AS query_id,
          coalesce(c.doc_id, b.doc_id) AS doc_id,
          coalesce(u_cos, 0) + coalesce(u_bm, 0) AS u
        FROM ctop c FULL OUTER JOIN btop b
          ON b.query_id = c.query_id AND b.doc_id = c.doc_id),
      fr AS (SELECT query_id, doc_id, u::DOUBLE / 1e9 AS rrf,
          row_number() OVER (PARTITION BY query_id
            ORDER BY u DESC, doc_id) AS rnk
        FROM fused)
      SELECT query_id, rnk, doc_id, rrf FROM fr
      WHERE rnk <= $KSparse ORDER BY query_id, rnk"""))

  // ---------- q118: canonical doc selection (quality-aware keep) -------

  /** Which doc to KEEP per near-dup cluster. The min-id rule q49's
    * labeling implies is arbitrary; real curation keeps the
    * highest-QUALITY member (the dedup step is exactly where the
    * quality score earns its keep — boilerplate clusters usually
    * contain one clean original plus mangled copies). Reuses the
    * PlanCache'd component labels and scores ONLY clustered docs
    * (members of size ≥ 2 clusters — the quality projection runs over
    * the small clustered subset after a semi-join-shaped inner join,
    * not the whole corpus). Quality is q14's exact formula — an IEEE
    * chain on identical inputs, deterministic both engines; the argmax
    * is made total by the (quality DESC, doc_id) order. Output also
    * flags where quality-keep disagrees with min-id-keep — the audit a
    * pipeline runs before switching keep policies. Shape: labels ⋈
    * docs (shuffle on doc_id), one window over cluster-sized groups.
    */
  private val q118 = QueryDef(
    "q118_canonical_selection",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cl = ccLabels(s, dir, 0.8)
        .select(col("node").as("doc_id"), col("component").as("cluster_id"))
      val scored = docs(s, dir).join(cl, "doc_id")
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tokens", size(col("toks")))
        .withColumn("n_stop",
          expr("size(filter(toks, t -> t IN ('the', 'a', 'of', 'to', 'and')))"))
        .select(col("doc_id"), col("cluster_id"),
          (lit(0.3) * (size(array_distinct(col("toks"))).cast("double")
              / col("n_tokens"))
            + lit(0.2) * (lit(1.0) - col("n_stop").cast("double") / col("n_tokens"))
            + lit(0.2) * (lit(1.0)
              - length(regexp_replace(col("text"), "[a-z ]", ""))
                .cast("double") / length(col("text")))
            + lit(0.3) * least(col("n_tokens").cast("double") / lit(50.0),
              lit(1.0))).as("quality"))
      val w = Window.partitionBy(col("cluster_id"))
      scored
        .withColumn("cluster_size", count(lit(1)).over(w))
        .withColumn("min_id_keep", min(col("doc_id")).over(w))
        .withColumn("rn", row_number().over(
          w.orderBy(col("quality").desc, col("doc_id"))))
        .where(col("rn") === 1)
        .select(col("cluster_id"), col("cluster_size"),
          col("doc_id").as("keep_doc"), col("quality"),
          col("min_id_keep"),
          (col("doc_id") =!= col("min_id_keep")).as("policy_differs"))
        .orderBy("cluster_id")
    },
    Some(s"""WITH RECURSIVE ${jaccardPairsDuckCte(0.8)},
      edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL SELECT doc_b AS u, doc_a AS v FROM pairs),
      reach(u, l) AS (
        SELECT u, u AS l FROM (SELECT DISTINCT u FROM edges) t
        UNION
        SELECT e.u, r.l FROM edges e JOIN reach r ON r.u = e.v),
      comp AS (SELECT u AS doc_id, min(l) AS cluster_id
        FROM reach GROUP BY u),
      scored AS (SELECT d.doc_id, cluster_id,
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
        FROM documents d JOIN comp ON comp.doc_id = d.doc_id),
      ranked AS (SELECT cluster_id,
          count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
          doc_id, quality,
          min(doc_id) OVER (PARTITION BY cluster_id) AS min_id_keep,
          row_number() OVER (PARTITION BY cluster_id
            ORDER BY quality DESC, doc_id) AS rn
        FROM scored)
      SELECT cluster_id, cluster_size::BIGINT AS cluster_size,
        doc_id AS keep_doc, quality, min_id_keep,
        doc_id <> min_id_keep AS policy_differs
      FROM ranked WHERE rn = 1 ORDER BY cluster_id"""))

  // ---------- q120: n-gram novelty score -------------------------------

  /** Per-doc novelty: the share of a document's shingles that occur in
    * NO other document (corpus df = 1) — the memorization/boilerplate
    * spectrum in one number (novelty 1.0 = wholly original text, ~0 =
    * assembled entirely from corpus-shared n-grams). The complement of
    * the dedup family's view: q20 finds documents that share MANY
    * shingles; this scores every document by how little it shares.
    * Shape: one df aggregate over the PlanCache'd posting table
    * (shuffle on the 8-byte shingle key), joined back to the same
    * posting rows — df ≤ 1 collapses to a boolean BEFORE the join-back
    * aggregate, so the second shuffle carries (doc_id, bit) pairs;
    * novelty is one exact int division. Docs with < 3 tokens have no
    * shingles and drop out (q20's documented exclusion).
    */
  private val q120 = QueryDef(
    "q120_ngram_novelty",
    (s, dir) => {
      val inv = persistedInverted(s, dir)
      val df = inv.groupBy(col("h")).agg(count(lit(1)).as("df"))
      inv.join(df, "h")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum((col("df") === 1L).cast("long")).as("n_unique"))
        .select(col("doc_id"), col("n_shingles"), col("n_unique"),
          (col("n_unique").cast("double") / col("n_shingles")).as("novelty"))
        .orderBy("doc_id")
    },
    Some(s"""WITH $shingledDuckCte,
      df AS (SELECT h, count(*) AS df FROM inv GROUP BY 1),
      j AS (SELECT doc_id, CASE WHEN df.df = 1 THEN 1 ELSE 0 END AS uniq
        FROM inv JOIN df ON df.h = inv.h)
      SELECT doc_id, count(*)::BIGINT AS n_shingles,
        sum(uniq)::BIGINT AS n_unique,
        sum(uniq)::DOUBLE / count(*) AS novelty
      FROM j GROUP BY doc_id ORDER BY doc_id"""))

  // ---------- q122: similarity-graph degree distribution ---------------

  /** Degree distribution of the near-dup pair graph — the structural
    * health check behind every graph-algorithm cost model in this
    * family: q82's orientation bound, q49's round count, and the
    * broadcast-ability of the edge list all hinge on whether degrees
    * are flat (boilerplate pairs) or heavy-tailed (template spam hubs).
    * Output is the exact degree → node-count histogram with each
    * degree's share of nodes (one int division). Shape: two edge-list-
    * sized aggregates (endpoint explode → per-node degree → size-of-
    * degree), then a 1-row total broadcast back — cost is bounded by
    * |pairs|, which dedup already paid to find; the corpus never
    * appears.
    */
  private val q122 = QueryDef(
    "q122_degree_distribution",
    (s, dir) => {
      val raw = jaccardPairs(s, dir, 0.8)
      val deg = raw.select(col("doc_a").as("n")).unionAll(
          raw.select(col("doc_b").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("degree"))
      val hist = deg.groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
      val tot = hist.agg(sum(col("n_nodes")).as("t"))
      hist.crossJoin(broadcast(tot))
        .select(col("degree"), col("n_nodes"),
          (col("n_nodes").cast("double") / col("t").cast("double"))
            .as("node_share"))
        .orderBy("degree")
    },
    Some(s"""WITH ${jaccardPairsDuckCte(0.8)},
      ends AS (SELECT doc_a AS n FROM pairs
        UNION ALL SELECT doc_b FROM pairs),
      deg AS (SELECT n, count(*) AS degree FROM ends GROUP BY 1),
      hist AS (SELECT degree, count(*) AS n_nodes FROM deg GROUP BY 1),
      tot AS (SELECT sum(n_nodes) AS t FROM hist)
      SELECT degree::BIGINT AS degree, n_nodes::BIGINT AS n_nodes,
        n_nodes::DOUBLE / t::DOUBLE AS node_share
      FROM hist, tot ORDER BY degree"""))

  // ---------- q124: cross-source duplication matrix --------------------

  /** WHERE duplication comes from: near-dup pairs rolled up by the
    * (source, source) pair of their endpoints — the provenance
    * question behind every dedup report ("is this self-duplication
    * within a crawl, or does source X mirror source Y?"), which
    * decides whether the fix is crawler config or source-level
    * exclusion, not more dedup. Source pairs are emitted unordered
    * (lexicographic min/max) so A→B and B→A collapse into one cell;
    * mean Jaccard per cell comes from nano-unit-pinned sums (q112's
    * rule — whole-number rounding of identical doubles, exact sum,
    * two final divisions). Shape: two broadcast-able joins of the
    * pair list against the (doc_id, source) projection, then a
    * |sources|²-bounded aggregate — the corpus appears only through
    * the pair list dedup already paid for.
    */
  private val q124 = QueryDef(
    "q124_cross_source_dups",
    (s, dir) => {
      val src = docs(s, dir).select(col("doc_id"), col("source"))
      jaccardPairs(s, dir, 0.8)
        .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")),
          "doc_a")
        .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")),
          "doc_b")
        .select(least(col("sa"), col("sb")).as("source_x"),
          greatest(col("sa"), col("sb")).as("source_y"),
          col("jaccard"))
        .groupBy(col("source_x"), col("source_y"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(round(col("jaccard") * lit(1e9)).cast("long")).as("ju"))
        .select(col("source_x"), col("source_y"), col("n_pairs"),
          (col("ju").cast("double") / lit(1e9) / col("n_pairs"))
            .as("mean_jaccard"))
        .orderBy("source_x", "source_y")
    },
    Some(s"""WITH ${jaccardPairsDuckCte(0.8)},
      src AS (SELECT doc_id, source FROM documents),
      cells AS (SELECT least(a.source, b.source) AS source_x,
          greatest(a.source, b.source) AS source_y, jaccard
        FROM pairs
        JOIN src a ON a.doc_id = doc_a
        JOIN src b ON b.doc_id = doc_b)
      SELECT source_x, source_y, count(*)::BIGINT AS n_pairs,
        sum(round(jaccard * 1e9)::BIGINT)::DOUBLE / 1e9 / count(*)
          AS mean_jaccard
      FROM cells GROUP BY 1, 2 ORDER BY source_x, source_y"""))

  // ---------- q140: incremental component labeling ----------------------

  /** q49's cluster labels maintained INCREMENTALLY: the standing
    * corpus (doc_id % 10 ≥ 2, q104's split) is labeled once, then the
    * arriving batch's edges — new×old from the standing index (q104's
    * join) plus new×new within the batch — are merged by CONTRACTING
    * each new-edge endpoint to its standing component id (identity for
    * endpoints the standing labeling doesn't cover) and labeling that
    * contracted graph only ([[connectedComponentsBounded]]: one-task
    * union-find under the batch-bounded limit, distributed min-label
    * propagation above it): |contracted edges| = |new edges|, and a
    * chain of k touched components is k contracted hops instead of
    * ~2k star-graph hops, so the merge cost is bounded by the BATCH,
    * never the corpus.
    * A standing component id is its component's min member id, so the
    * contracted fixpoint's min-label IS the merged graph's min member —
    * the final labeling is two bounded joins (remap touched old
    * components; emit contracted-graph labels for endpoints the
    * standing labeling didn't cover). The old PAIR GRAPH (the
    * expensive part at 100 TB) is never revisited. The oracle
    * recomputes the closure over ALL pairs from scratch: agreement
    * proves merge ≡ recompute (the q70 contract, for graph state).
    * Output = q49's exact labeling, so the equivalence is checked
    * row-for-row by the gate itself.
    */
  private val q140 = QueryDef(
    "q140_incremental_components",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val pairs = jaccardPairs(s, dir, 0.8)
        .select(col("doc_a"), col("doc_b"))
      val oldPairs = pairs
        .where(col("doc_a") % 10 >= 2 && col("doc_b") % 10 >= 2)
      val newEdges = pairs
        .where(col("doc_a") % 10 < 2 || col("doc_b") % 10 < 2)
      // the standing labeling is STANDING STATE in the incremental
      // scenario (on disk between ingests) — cache it so steady-state
      // cost measures what ingest actually pays: the merge propagation
      val oldLabels = PlanCache.getOrBuild(s, dir, "q140_old_labels")(
        connectedComponents(oldPairs))
      // contract: endpoint -> standing component id (or itself when the
      // standing labeling doesn't cover it: new docs, plus old docs
      // whose only edges arrived with the batch)
      val contracted = newEdges
        .join(oldLabels.select(col("node").as("doc_a"),
          col("component").as("ca")), Seq("doc_a"), "left_outer")
        .join(oldLabels.select(col("node").as("doc_b"),
          col("component").as("cb")), Seq("doc_b"), "left_outer")
        .select(coalesce(col("ca"), col("doc_a")).as("u"),
          coalesce(col("cb"), col("doc_b")).as("v"))
      // batch-bounded graph -> the single-task union-find path is the
      // common case; the distributed propagation is the >100k fallback
      val compLabels = connectedComponentsBounded(contracted)
      val remap = compLabels
        .select(col("node").as("l"), col("component").as("merged"))
      // per-node base label: standing nodes keep their component;
      // endpoints outside the standing labeling label themselves
      val endp = newEdges.select(col("doc_a").as("node"))
        .unionAll(newEdges.select(col("doc_b").as("node"))).distinct()
      val base = oldLabels.select(col("node"), col("component").as("l"))
        .unionAll(endp.join(oldLabels.select(col("node")), Seq("node"),
            "left_anti")
          .select(col("node"), col("node").as("l")))
      base.join(remap, Seq("l"), "left_outer")
        .select(col("node").as("doc_id"),
          coalesce(col("merged"), col("l")).as("cluster_id"))
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
        .orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE ${jaccardPairsDuckCte(0.8)},
      edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL SELECT doc_b AS u, doc_a AS v FROM pairs),
      reach(u, l) AS (
        SELECT u, u AS l FROM (SELECT DISTINCT u FROM edges) t
        UNION
        SELECT e.u, r.l FROM edges e JOIN reach r ON r.u = e.v),
      comp AS (SELECT u AS doc_id, min(l) AS cluster_id
        FROM reach GROUP BY u)
      SELECT doc_id, cluster_id,
        count(*) OVER (PARTITION BY cluster_id) AS cluster_size
      FROM comp ORDER BY doc_id"""))

  // ---------- q146: source ablation of duplication mass -----------------

  /** What dropping each source would do to the near-dup pair count —
    * the ablation view q124's matrix implies but doesn't state: a
    * pair dies if EITHER endpoint's source is removed, so each
    * source's `pairs_touched` (pairs with ≥ 1 endpoint in it,
    * counted once even when both endpoints share the source) is the
    * dedup work that source brings in, and `share` ranks the
    * worst offenders for source-level exclusion BEFORE paying for
    * pair-level dedup. Endpoint sources come from two broadcast-able
    * joins; a both-endpoints-same-source pair contributes 1 (distinct
    * (pair, source) before the count); exact ints, one division.
    * Shape: bounded by |pairs| — corpus appears only through the
    * cached pair machinery.
    */
  private val q146 = QueryDef(
    "q146_source_ablation",
    (s, dir) => {
      val src = docs(s, dir).select(col("doc_id"), col("source"))
      val pairs = jaccardPairs(s, dir, 0.8)
        .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")),
          "doc_a")
        .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")),
          "doc_b")
      val tot = pairs.agg(count(lit(1)).as("n_pairs_total"))
      pairs
        .select(col("doc_a"), col("doc_b"),
          explode(array_distinct(array(col("sa"), col("sb"))))
            .as("source"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("pairs_touched"))
        .crossJoin(broadcast(tot))
        .select(col("source"), col("pairs_touched"), col("n_pairs_total"),
          (col("pairs_touched").cast("double") / col("n_pairs_total"))
            .as("share"))
        .orderBy("source")
    },
    Some(s"""WITH ${jaccardPairsDuckCte(0.8)},
      src AS (SELECT doc_id, source FROM documents),
      ends AS (SELECT doc_a, doc_b, a.source AS sa, b.source AS sb
        FROM pairs
        JOIN src a ON a.doc_id = doc_a
        JOIN src b ON b.doc_id = doc_b),
      tot AS (SELECT count(*) AS n_pairs_total FROM ends),
      touched AS (SELECT DISTINCT doc_a, doc_b, source
        FROM (SELECT doc_a, doc_b, sa AS source FROM ends
          UNION ALL SELECT doc_a, doc_b, sb FROM ends))
      SELECT source, count(*)::BIGINT AS pairs_touched,
        n_pairs_total::BIGINT AS n_pairs_total,
        count(*)::DOUBLE / n_pairs_total AS share
      FROM touched, tot GROUP BY source, n_pairs_total
      ORDER BY source"""))

  // ---------- q148: template detection (shared prefixes) -----------------

  /** Documents opening with the SAME first 128 characters, grouped —
    * the boilerplate-header detector: generated pages, license
    * preambles, and scraped templates share exact prefixes long
    * before whole-document similarity fires, and the fix (strip the
    * template, keep the bodies) is different from dedup's keep-one.
    * One md5 per prefix (never the whole doc), one 16-byte-key
    * shuffle — q17's exact-dedup shape applied to a prefix window;
    * groups below 2 docs are dropped, remaining groups report span
    * and an example doc for triage. Short docs (< 128 chars) hash
    * their full text — they simply form their own groups.
    */
  private val q148 = QueryDef(
    "q148_template_prefixes",
    (s, dir) => {
      docs(s, dir)
        .select(col("doc_id"),
          md5(substring(col("text"), 1, 128)).as("prefix_key"))
        .groupBy(col("prefix_key"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("example_doc"),
          max(col("doc_id")).as("last_doc"))
        .where(col("n_docs") >= 2)
        .orderBy("prefix_key")
    },
    Some("""SELECT md5(substring(text, 1, 128)) AS prefix_key,
        count(*)::BIGINT AS n_docs,
        min(doc_id) AS example_doc, max(doc_id) AS last_doc
      FROM documents
      GROUP BY 1 HAVING count(*) >= 2
      ORDER BY prefix_key"""))

  // ---------- q150: dedup threshold sensitivity --------------------------

  /** Near-dup pair counts at τ ∈ {0.7, 0.8, 0.9} from ONE candidate
    * pass — the threshold-tuning evidence behind every q20-family
    * parameter choice: how fast does the pair set grow as the bar
    * drops (a cliff between 0.8 and 0.7 means the corpus has a
    * near-miss band that MinHash banding parameters must respect).
    * The pair scores are computed once at the loosest threshold;
    * the three counts are conditional aggregates over that single
    * result — no per-threshold recomputation, which is the entire
    * point of publishing it as one operator. Exact counts; 1 row.
    */
  private val q150 = QueryDef(
    "q150_threshold_sensitivity",
    (s, dir) => {
      jaccardPairs(s, dir, 0.7)
        .agg(count(lit(1)).as("pairs_at_07"),
          sum(when(col("jaccard") >= 0.8, 1L).otherwise(0L))
            .as("pairs_at_08"),
          sum(when(col("jaccard") >= 0.9, 1L).otherwise(0L))
            .as("pairs_at_09"))
    },
    Some(s"""WITH ${jaccardPairsDuckCte(0.7)}
      SELECT count(*)::BIGINT AS pairs_at_07,
        sum(CASE WHEN jaccard >= 0.8 THEN 1 ELSE 0 END)::BIGINT
          AS pairs_at_08,
        sum(CASE WHEN jaccard >= 0.9 THEN 1 ELSE 0 END)::BIGINT
          AS pairs_at_09
      FROM pairs"""))

  // ---------- q151: repeated cross-document spans ------------------------

  /** The repeated 8-token windows themselves — the unit of removal in
    * exact-substring dedup (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better": duplicated SPANS, not whole
    * documents, are what models memorize; the fix strips the span and
    * keeps both documents). Complements the doc-level family: q120
    * scores each doc's novelty, q148 catches shared prefixes only —
    * this reports every 8-token window occurring in ≥ 2 documents,
    * anywhere in the text, as a concrete strip-worklist (span, doc
    * count, example docs). Shape: windows are built INSIDE the scan
    * projection (one `transform` over the token array — no shuffle, no
    * suffix array; the rolling-window hash table IS the distributed
    * analogue of the suffix-array scan), de-duplicated per doc, then
    * one group-by on the 16-byte md5 span key; `min(span)` rides the
    * same map-side partial, so shuffle rows stay (16-byte key, span,
    * int) triples bounded by distinct windows, never corpus bytes².
    * Docs with < 8 tokens have no windows and drop out.
    */
  private val q151 = QueryDef(
    "q151_repeated_spans",
    (s, dir) => {
      // native one-pass span projection (graft_token_spans): the
      // HOF slice+join form materialized the token array and built
      // every span interpreted -- see expressions/TokenSpans.scala;
      // rows with <8 tokens yield an empty array (the old where-guard)
      docs(s, dir)
        .select(col("doc_id"),
          explode(expr("graft_token_spans(text, 8)")).as("span"))
        .groupBy(md5(col("span")).as("span_key"))
        .agg(min(col("span")).as("span"),
          count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .where(col("n_docs") >= 2)
        .orderBy("span_key")
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS parts
        FROM documents),
      spans AS (SELECT doc_id,
          unnest(list_distinct(list_transform(range(1, len(parts) - 6),
            i -> array_to_string(parts[i:i+7], ' ')))) AS span
        FROM t WHERE len(parts) >= 8)
      SELECT md5(span) AS span_key, min(span) AS span,
        count(*)::BIGINT AS n_docs,
        min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM spans GROUP BY 1 HAVING count(*) >= 2 ORDER BY span_key"""))

  // ---------- q152: template strip (apply twin of q148) -----------------

  /** The transform q148's detector implies: documents whose first 128
    * characters are shared with ≥ 1 other document get that prefix
    * stripped (the template is boilerplate; the BODY is the training
    * signal), everything else passes through unchanged — detect →
    * fix pairing, same as q20 → q39 for whole-doc dedup. Keeps every
    * document (unlike dedup's keep-one): the output is the full
    * corpus with before/after char counts, so the token savings are
    * auditable per doc. Shape: re-derives q148's 16-byte prefix key,
    * one group-by for group sizes, one equi-join back on the key —
    * both shuffles carry the md5 key, never text (the text column
    * stays on the probe side). Docs shorter than the 128-char
    * template whose prefix still collides (exact dups of short docs)
    * strip to empty — the dedup family, not this op, owns that case.
    */
  private val q152 = QueryDef(
    "q152_template_strip",
    (s, dir) => {
      val pk = docs(s, dir)
        .select(col("doc_id"), col("text"),
          md5(substring(col("text"), 1, 128)).as("k"))
      val grp = pk.groupBy(col("k")).agg(count(lit(1)).as("n"))
      pk.join(grp, "k")
        .select(col("doc_id"),
          when(col("n") >= 2, ltrim(expr("substring(text, 129)")))
            .otherwise(col("text")).as("text_out"),
          (col("n") >= 2).as("was_stripped"),
          length(col("text")).cast("long").as("n_chars_before"))
        .withColumn("n_chars_after", length(col("text_out")).cast("long"))
        .orderBy("doc_id")
    },
    Some("""WITH pk AS (SELECT doc_id, text,
          md5(substring(text, 1, 128)) AS k FROM documents),
      grp AS (SELECT k, count(*) AS n FROM pk GROUP BY 1)
      SELECT doc_id,
        CASE WHEN n >= 2 THEN ltrim(substring(text, 129))
          ELSE text END AS text_out,
        n >= 2 AS was_stripped,
        length(text)::BIGINT AS n_chars_before,
        length(CASE WHEN n >= 2 THEN ltrim(substring(text, 129))
          ELSE text END)::BIGINT AS n_chars_after
      FROM pk JOIN grp USING (k) ORDER BY doc_id"""))

  // ---------- q154: span strip (apply twin of q151) ---------------------

  /** The transform q151's worklist implies — exact-substring dedup's
    * remove-all-but-one rule (Lee et al. 2022) at 8-token
    * granularity: every token covered by a cross-doc shared span is
    * removed from every document EXCEPT the span's owner (min doc_id
    * — the same canonicalization q17/q39 use), so exactly one copy of
    * each duplicated span survives the corpus. Output keeps every doc
    * with before/removed/after token counts plus the md5 of the kept
    * token sequence, so the rewrite is auditable AND verifiable
    * without shipping text. Shape: window instances (ALL occurrences,
    * not per-doc distinct — within-doc repeats of a shared span
    * strip too, q43's repetition case) join the shared-span owner
    * table on the 16-byte key; coverage is an ≤8× explode of MARKED
    * instances only (bounded by duplicated text, not corpus), folded
    * to one position-SET row per touched doc; the rewrite itself is a
    * higher-order `filter` over the token array INSIDE the corpus
    * scan projection — the corpus's tokens never shuffle (the
    * round-11 shape posexploded every token and collect_list'd them
    * back, a full-corpus token shuffle; this one joins only the
    * bounded covered-doc frame back to the scan), which is exactly
    * the shape a 100-TB text rewrite needs. Within-owner duplicate
    * occurrences are kept (within-doc dedup is q43's concern, not
    * this op's).
    */
  private val q154 = QueryDef(
    "q154_span_strip",
    (s, dir) => {
      val t = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("parts"))
        .withColumn("n", size(col("parts")))
      // frozen: the window-hash table feeds BOTH the shared-span
      // aggregate and the coverage join below — without the persist the
      // per-window md5 pass (the query's dominant cost) runs twice
      val inst = PlanCache.freeze(t.where(col("n") >= 8)
        .select(col("doc_id"), col("parts"),
          explode(sequence(lit(1), col("n") - 7)).as("i"))
        .select(col("doc_id"), col("i"),
          md5(array_join(slice(col("parts"), col("i"), lit(8)), " "))
            .as("k")))
      val shared = inst.groupBy(col("k"))
        .agg(countDistinct(col("doc_id")).as("nd"),
          min(col("doc_id")).as("owner"))
        .where(col("nd") >= 2)
      // one position-set row per touched doc (collect_set dedups the
      // overlapping-window positions); bounded by duplicated text
      val covAgg = inst.join(shared.select(col("k"), col("owner")), "k")
        .where(col("doc_id") =!= col("owner"))
        .select(col("doc_id"),
          explode(sequence(col("i"), col("i") + 7)).as("pos"))
        .groupBy(col("doc_id"))
        .agg(collect_set(col("pos")).as("cov"))
      t.join(covAgg, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n").cast("long").as("n_before"),
          expr("""filter(transform(parts, (x, j) ->
              struct(j + 1 AS pos, x AS tok)),
            s -> cov IS NULL OR NOT array_contains(cov, s.pos))""")
            .as("kept"))
        .select(col("doc_id"), col("n_before"),
          (col("n_before") - size(col("kept")).cast("long"))
            .as("n_removed"),
          size(col("kept")).cast("long").as("n_after"),
          md5(expr("array_join(transform(kept, s -> s.tok), ' ')"))
            .as("kept_key"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS parts,
          len(string_split(text, ' ')) AS n FROM documents),
      inst0 AS (SELECT doc_id, parts,
          unnest(range(1, n - 6)) AS i FROM t WHERE n >= 8),
      inst AS (SELECT doc_id, i,
          md5(array_to_string(parts[i:i+7], ' ')) AS k FROM inst0),
      shared AS (SELECT k, min(doc_id) AS owner
        FROM (SELECT DISTINCT doc_id, k FROM inst)
        GROUP BY k HAVING count(*) >= 2),
      covered AS (SELECT DISTINCT m.doc_id, m.i + r.d AS pos
        FROM inst m JOIN shared USING (k),
          (SELECT unnest(range(0, 8)) AS d) r
        WHERE m.doc_id <> shared.owner),
      toks AS (SELECT doc_id, unnest(parts) AS tok,
          generate_subscripts(parts, 1) AS pos FROM t),
      kept AS (SELECT toks.doc_id, toks.pos, toks.tok
        FROM toks ANTI JOIN covered USING (doc_id, pos)),
      keptagg AS (SELECT doc_id, count(*) AS n_after,
          md5(array_to_string(list(tok ORDER BY pos), ' ')) AS kept_key
        FROM kept GROUP BY doc_id)
      SELECT t.doc_id, n::BIGINT AS n_before,
        (n - coalesce(n_after, 0))::BIGINT AS n_removed,
        coalesce(n_after, 0)::BIGINT AS n_after,
        coalesce(kept_key, md5('')) AS kept_key
      FROM t LEFT JOIN keptagg USING (doc_id) ORDER BY doc_id"""))

  // ---------- q156: near-dup leakage across the train/test split --------

  /** Near-dup pairs that STRADDLE q37's train/val/test assignment —
    * the canonical eval-contamination audit: a test document with a
    * ≥0.8-Jaccard twin in train inflates every benchmark number, and
    * doc-level random splits guarantee some unless dedup runs FIRST.
    * Output is the full split×split pair matrix (off-diagonal rows
    * are the leaks, flagged) with one deterministic example pair per
    * cell for triage. The split expression is the shared Portable
    * contract (one definition, q37/q107/this can't drift); examples
    * use an arg-min on the scalar pair code doc_a·10⁹+doc_b — the
    * same formula on both engines, unique per pair so no tie
    * ambiguity. Cost: bounded by |pairs| (already paid by the dedup
    * family) + two broadcast-able split-assignment joins; the corpus
    * appears only through the cached pair machinery.
    */
  private val q156 = QueryDef(
    "q156_split_leakage",
    (s, dir) => {
      val sp = docs(s, dir)
        .select(col("doc_id"), expr(Portable.splitCaseSpark).as("split"))
      jaccardPairs(s, dir, 0.8)
        .join(sp.select(col("doc_id").as("doc_a"),
          col("split").as("split_a")), "doc_a")
        .join(sp.select(col("doc_id").as("doc_b"),
          col("split").as("split_b")), "doc_b")
        .groupBy(col("split_a"), col("split_b"))
        .agg(count(lit(1)).as("n_pairs"),
          expr("min_by(doc_a, doc_a * 1000000000 + doc_b)").as("example_a"),
          expr("min_by(doc_b, doc_a * 1000000000 + doc_b)").as("example_b"))
        .withColumn("leaks", col("split_a") =!= col("split_b"))
        .orderBy("split_a", "split_b")
    },
    Some(s"""WITH ${jaccardPairsDuckCte(0.8)},
      sp AS (SELECT doc_id, ${Portable.splitCaseDuck} AS split
        FROM documents),
      j AS (SELECT doc_a, doc_b, a.split AS split_a, b.split AS split_b
        FROM pairs
        JOIN sp a ON a.doc_id = doc_a
        JOIN sp b ON b.doc_id = doc_b)
      SELECT split_a, split_b, count(*)::BIGINT AS n_pairs,
        arg_min(doc_a, doc_a * 1000000000 + doc_b) AS example_a,
        arg_min(doc_b, doc_a * 1000000000 + doc_b) AS example_b,
        split_a <> split_b AS leaks
      FROM j GROUP BY split_a, split_b ORDER BY split_a, split_b"""))

  // ---------- q157: shingle document-frequency spectrum -----------------

  /** Log₂-bucketed histogram of shingle document frequencies — the
    * evidence behind q48's df cap and q76's prefix ordering: the
    * spectrum's tail says exactly how much quadratic pair mass hides
    * in hot shingles (a shingle with df=d creates d(d−1)/2 candidate
    * pairs), so the cap is read off this table instead of guessed.
    * The bucket exponent is `length(bin(df)) − 1` — pure integer
    * string length of the binary representation, identical on both
    * engines, no float log₂ edge cases at exact powers of two. One
    * df aggregate over the cached posting table, then a bucket
    * aggregate over the (tiny) distinct-df spectrum and a 1-row
    * broadcast total.
    */
  private val q157 = QueryDef(
    "q157_df_spectrum",
    (s, dir) => {
      val dfT = persistedInverted(s, dir)
        .groupBy(col("h")).agg(count(lit(1)).as("df"))
      val spec = dfT
        .groupBy((length(expr("bin(df)")) - 1).cast("long")
          .as("bucket_log2"))
        .agg(count(lit(1)).as("n_shingles"), max(col("df")).as("max_df"))
      val tot = spec.agg(sum(col("n_shingles")).as("t"))
      spec.crossJoin(broadcast(tot))
        .select(col("bucket_log2"),
          expr("cast(power(2, bucket_log2) AS BIGINT)").as("bucket_lo"),
          col("n_shingles"), col("max_df"),
          (col("n_shingles").cast("double") / col("t").cast("double"))
            .as("share"))
        .orderBy("bucket_log2")
    },
    Some(s"""WITH $shingledDuckCte,
      dft AS (SELECT h, count(*) AS df FROM inv GROUP BY 1),
      spec AS (SELECT (length(bin(df)) - 1)::BIGINT AS bucket_log2,
          count(*) AS n_shingles, max(df) AS max_df
        FROM dft GROUP BY 1),
      tot AS (SELECT sum(n_shingles) AS t FROM spec)
      SELECT bucket_log2, power(2, bucket_log2)::BIGINT AS bucket_lo,
        n_shingles::BIGINT AS n_shingles, max_df::BIGINT AS max_df,
        n_shingles::DOUBLE / t::DOUBLE AS share
      FROM spec, tot ORDER BY bucket_log2"""))

  // ---------- q190: ranker agreement (cosine vs BM25) ------------------

  /** Top-k set agreement between the two sparse rankers (q57 TF-cosine
    * and q93 BM25) per query — the retrieval-stack audit that says
    * whether the q115 fusion is blending two OPINIONS or two copies:
    * Jaccard of the two top-k doc sets, exact integers until the one
    * final division. Both rankings come off their PlanCache'd top-k
    * tables (|queries|·k rows each), so the audit costs three
    * k-row-scale aggregates — nothing corpus-sized moves. The oracle
    * recomputes both chains independently (the q115 dual-CTE mirror).
    */
  private val q190 = QueryDef(
    "q190_ranker_overlap",
    (s, dir) => {
      val cosR = q57.fn(s, dir).select(col("query_id"), col("doc_id"))
      val bmR = q93.fn(s, dir).select(col("query_id"), col("doc_id"))
      val na = cosR.groupBy(col("query_id")).agg(count(lit(1)).as("n_cos"))
      val nb = bmR.groupBy(col("query_id")).agg(count(lit(1)).as("n_bm25"))
      val common = cosR.join(bmR, Seq("query_id", "doc_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("nc"))
      na.join(nb, "query_id")
        .join(common, Seq("query_id"), "left_outer")
        .select(col("query_id"), col("n_cos"), col("n_bm25"),
          coalesce(col("nc"), lit(0L)).as("n_common"),
          (coalesce(col("nc"), lit(0L)).cast("double")
            / (col("n_cos") + col("n_bm25") - coalesce(col("nc"), lit(0L)))
              .cast("double")).as("jaccard"))
        .orderBy("query_id")
    },
    Some(s"""WITH toks AS (SELECT doc_id,
        unnest(string_split(text, ' ')) AS tok FROM documents),
      tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
      n2 AS (SELECT doc_id, sum(tf * tf)::BIGINT AS n2 FROM tf GROUP BY 1),
      dots AS (SELECT q.doc_id AS query_id, c.doc_id,
          sum(c.tf * q.tf)::BIGINT AS dot
        FROM tf c JOIN tf q ON q.tok = c.tok
        WHERE q.doc_id < $NSparseQueries AND c.doc_id <> q.doc_id
        GROUP BY 1, 2),
      cscored AS (SELECT query_id, dots.doc_id AS doc_id,
          dot::DOUBLE / sqrt((x.n2 * y.n2)::DOUBLE) AS cosine
        FROM dots JOIN n2 x ON x.doc_id = query_id
        JOIN n2 y ON y.doc_id = dots.doc_id),
      cr AS (SELECT query_id, doc_id, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS rnk
        FROM cscored),
      ctop AS (SELECT query_id, doc_id FROM cr WHERE rnk <= $KSparse),
      dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
      corpus AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
      dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
      qterms AS (SELECT DISTINCT doc_id AS query_id, tok FROM tf
        WHERE doc_id < $NSparseQueries),
      terms AS (SELECT q.query_id, c.doc_id,
          round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)), 12)
            * (c.tf * 2.2)
            / (c.tf + 1.2 * (0.25
              + 0.75 * (dl.dl / (sum_dl::DOUBLE / n_docs)))) AS ts
        FROM tf c JOIN qterms q ON q.tok = c.tok
        JOIN dft ON dft.tok = c.tok
        JOIN dl ON dl.doc_id = c.doc_id, corpus
        WHERE c.doc_id <> q.query_id),
      bscored AS (SELECT query_id, doc_id,
          sum(round(ts * 1e9)::BIGINT) AS su
        FROM terms GROUP BY 1, 2),
      br AS (SELECT query_id, doc_id, row_number() OVER (
          PARTITION BY query_id ORDER BY su DESC, doc_id) AS rnk
        FROM bscored),
      btop AS (SELECT query_id, doc_id FROM br WHERE rnk <= $KSparse),
      na AS (SELECT query_id, count(*) AS n_cos FROM ctop GROUP BY 1),
      nb AS (SELECT query_id, count(*) AS n_bm25 FROM btop GROUP BY 1),
      cm AS (SELECT c.query_id, count(*) AS nc FROM ctop c
        JOIN btop b ON b.query_id = c.query_id AND b.doc_id = c.doc_id
        GROUP BY 1)
      SELECT query_id, n_cos, n_bm25,
        coalesce(nc, 0)::BIGINT AS n_common,
        coalesce(nc, 0)::DOUBLE
          / (n_cos + n_bm25 - coalesce(nc, 0))::DOUBLE AS jaccard
      FROM na JOIN nb USING (query_id) LEFT JOIN cm USING (query_id)
      ORDER BY query_id"""))

  // ---------- q194: near-dup transitivity audit ------------------------

  /** How transitive is the ≥0.8 similarity relation — of all wedges
    * (node pairs sharing a neighbor in the near-dup graph), what
    * fraction are themselves a ≥0.8 pair? High closure says the
    * threshold induces coherent clusters (components ≈ cliques, so
    * q49's transitive apply deletes what a pairwise policy would);
    * low closure says components chain unlike documents together and
    * the q118 keep-best policy is deleting non-duplicates. Shape:
    * the pair table is dup-scale (≪ corpus); wedges come from one
    * self-join on the shared-neighbor key and close against the pair
    * table itself — all |pairs|-sized work. Exact integers, one
    * division.
    */
  private val q194 = QueryDef(
    "q194_dedup_transitivity",
    (s, dir) => {
      val p = jaccardPairs(s, dir, 0.8).select(col("doc_a"), col("doc_b"))
      val edges = p.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .unionAll(p.select(col("doc_b").as("u"), col("doc_a").as("v")))
      val wedges = edges.select(col("v").as("mid"), col("u"))
        .join(edges.select(col("v").as("w"), col("u").as("mid2")),
          col("mid") === col("mid2"))
        .where(col("u") < col("w"))
        .select(col("u"), col("w")).distinct()
      val closed = wedges.join(p,
        col("u") === col("doc_a") && col("w") === col("doc_b"))
        .agg(count(lit(1)).as("n_closed"))
      val np = p.agg(count(lit(1)).as("n_pairs"))
      val nw = wedges.agg(count(lit(1)).as("n_wedges"))
      np.crossJoin(nw).crossJoin(closed)
        .select(col("n_pairs"), col("n_wedges"), col("n_closed"),
          (col("n_closed").cast("double") / col("n_wedges").cast("double"))
            .as("closure_rate"))
    },
    Some(s"""WITH ${jaccardPairsDuckCte(0.8)},
      edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs),
      wedges AS (SELECT DISTINCT a.u, b.v AS w
        FROM edges a JOIN edges b ON a.v = b.u AND a.u < b.v),
      closed AS (SELECT count(*) AS n_closed FROM wedges
        JOIN pairs ON u = doc_a AND w = doc_b),
      np AS (SELECT count(*) AS n_pairs FROM pairs),
      nw AS (SELECT count(*) AS n_wedges FROM wedges)
      SELECT n_pairs, n_wedges, n_closed,
        n_closed::DOUBLE / n_wedges::DOUBLE AS closure_rate
      FROM np, nw, closed"""))

  // ---------- q201: shingle df-coverage curve --------------------------

  /** How much of the corpus's shingle mass the top-k most document-
    * frequent shingles cover (k = 10/100/1000) — the coverage curve
    * that sizes dictionary-style optimizations (hot-shingle caches,
    * the q48 df-cap, stop-shingle lists): a steep curve means a tiny
    * hot set dominates the posting table and every cap/cache decision
    * is cheap; a flat curve means none will help. One |vocab|-row
    * aggregate off the cached posting table; ranks only exist ≤ 1000,
    * so the top set comes from a TakeOrdered (per-partition top-k +
    * merge — never a vocab-sized single-task sort; rows past 1000
    * feed only the two rank-free totals), then three conditional sums
    * over the ≤ 1000 survivors. Exact integers until the three final
    * divisions.
    */
  private val q201 = QueryDef(
    "q201_shingle_coverage",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dfs = persistedInverted(s, dir)
        .groupBy(col("h")).agg(count(lit(1)).as("df"))
      val tot = dfs.agg(count(lit(1)).as("n_shingles"),
        sum(col("df")).as("df_total"))
      val top = dfs.orderBy(col("df").desc, col("h")).limit(1000)
        .withColumn("rn", row_number().over(
          Window.orderBy(col("df").desc, col("h"))))
        .agg(sum(expr("CASE WHEN rn <= 10 THEN df ELSE 0L END")).as("c10"),
          sum(expr("CASE WHEN rn <= 100 THEN df ELSE 0L END")).as("c100"),
          sum(col("df")).as("c1000"))
      tot.crossJoin(broadcast(top))
        .select(col("n_shingles"), col("df_total"),
          (col("c10").cast("double") / col("df_total").cast("double"))
            .as("cov_top10"),
          (col("c100").cast("double") / col("df_total").cast("double"))
            .as("cov_top100"),
          (col("c1000").cast("double") / col("df_total").cast("double"))
            .as("cov_top1000"))
    },
    Some(s"""WITH ${shingledDuckCte},
      dfs AS (SELECT h, count(*) AS df FROM inv GROUP BY 1),
      r AS (SELECT df, row_number() OVER (ORDER BY df DESC, h) AS rn
        FROM dfs)
      SELECT count(*) AS n_shingles, sum(df)::BIGINT AS df_total,
        sum(CASE WHEN rn <= 10 THEN df ELSE 0 END)::DOUBLE
          / sum(df)::DOUBLE AS cov_top10,
        sum(CASE WHEN rn <= 100 THEN df ELSE 0 END)::DOUBLE
          / sum(df)::DOUBLE AS cov_top100,
        sum(CASE WHEN rn <= 1000 THEN df ELSE 0 END)::DOUBLE
          / sum(df)::DOUBLE AS cov_top1000
      FROM r"""))

  // ---------- q204: cluster size vs quality interaction ----------------

  /** Does duplication correlate with quality? Mean q14 quality score
    * by near-dup cluster size band (unclustered, pair, 3–4, 5+) — if
    * big duplicate families score systematically lower, dedup is also
    * a quality filter and the curation budget (q149) double-counts
    * the gain. Reuses the cached cc_0.8 labels and q14's exact scorer
    * (both QueryDef-shared, can't drift); unclustered docs come
    * through a left join with a null label. Quality pins to micro
    * int64 before the order-insensitive sum. All work past the two
    * cached/scan passes is |docs|-row.
    */
  private val q204 = QueryDef(
    "q204_cluster_quality",
    (s, dir) => {
      val labels = ccLabels(s, dir, 0.8)
        .select(col("node").as("doc_id"), col("component").as("cluster_id"))
      val sizes = labels.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("csize"))
      val scored = graft.queries.TextOps.q14Fn(s, dir)
        .select(col("doc_id"),
          expr("CAST(round(quality * 1e6) AS BIGINT)").as("q_micro"))
      scored
        .join(broadcast(labels.join(sizes, "cluster_id")
          .select(col("doc_id"), col("csize"))), Seq("doc_id"),
          "left_outer")
        .select(col("q_micro"),
          expr("""CASE WHEN csize IS NULL THEN 'a_unclustered'
            WHEN csize = 2 THEN 'b_pair'
            WHEN csize <= 4 THEN 'c_3_4'
            ELSE 'd_5_plus' END""").as("band"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_docs"),
          (sum(col("q_micro")).cast("double")
            / count(lit(1)).cast("double") / 1e6).as("mean_quality"))
        .orderBy("band")
    },
    Some(s"""WITH RECURSIVE ${jaccardPairsDuckCte(0.8)},
      edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL SELECT doc_b AS u, doc_a AS v FROM pairs),
      reach(u, l) AS (
        SELECT u, u AS l FROM (SELECT DISTINCT u FROM edges) t
        UNION
        SELECT e.u, r.l FROM edges e JOIN reach r ON r.u = e.v),
      comp AS (SELECT u AS doc_id, min(l) AS cluster_id
        FROM reach GROUP BY u),
      csz AS (SELECT cluster_id, count(*) AS csize FROM comp GROUP BY 1),
      mem AS (SELECT doc_id, csize FROM comp JOIN csz USING (cluster_id)),
      scored AS (SELECT doc_id,
          round((0.3 * ttr + 0.2 * (1.0 - stop_ratio) + 0.2 * alpha_ratio
            + 0.3 * len_factor) * 1e6)::BIGINT AS q_micro
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
      banded AS (SELECT q_micro,
          CASE WHEN csize IS NULL THEN 'a_unclustered'
            WHEN csize = 2 THEN 'b_pair'
            WHEN csize <= 4 THEN 'c_3_4'
            ELSE 'd_5_plus' END AS band
        FROM scored LEFT JOIN mem USING (doc_id))
      SELECT band, count(*) AS n_docs,
        sum(q_micro)::DOUBLE / count(*)::DOUBLE / 1e6 AS mean_quality
      FROM banded GROUP BY 1 ORDER BY band"""))

  // ---------- q184: near-dup cluster language purity -------------------

  /** Language purity of the threshold-0.8 near-dup clusters — a
    * histogram of clusters by how many languages they span. A
    * multi-language near-dup cluster is a translated/templated
    * boilerplate family, which a monolingual dedup policy would
    * deduplicate WRONGLY (keeping one language's copy deletes the
    * others' only instance) — this audit sizes that risk before the
    * q118 keep-best policy runs. Reuses the PlanCache'd cc_0.8 labels
    * (no new graph work); the lang join is a BROADCAST of the
    * |clustered-docs|-sized label table onto the documents scan; two
    * small aggregates follow. Oracle recomputes components
    * independently via the recursive reachability CTE.
    */
  private val q184 = QueryDef(
    "q184_cluster_lang_purity",
    (s, dir) => {
      val labels = ccLabels(s, dir, 0.8)
        .select(col("node").as("doc_id"), col("component").as("cluster_id"))
      val perCluster = docs(s, dir).select(col("doc_id"), col("lang"))
        .join(broadcast(labels), "doc_id")
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"))
      perCluster.groupBy(col("n_langs"))
        .agg(count(lit(1)).as("n_clusters"), sum(col("n_docs")).as("n_docs"))
        .orderBy("n_langs")
    },
    Some(s"""WITH RECURSIVE ${jaccardPairsDuckCte(0.8)},
      edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL SELECT doc_b AS u, doc_a AS v FROM pairs),
      reach(u, l) AS (
        SELECT u, u AS l FROM (SELECT DISTINCT u FROM edges) t
        UNION
        SELECT e.u, r.l FROM edges e JOIN reach r ON r.u = e.v),
      comp AS (SELECT u AS doc_id, min(l) AS cluster_id
        FROM reach GROUP BY u),
      pc AS (SELECT cluster_id, count(*) AS n_docs,
          count(DISTINCT lang) AS n_langs
        FROM comp JOIN documents USING (doc_id) GROUP BY 1)
      SELECT n_langs, count(*) AS n_clusters, sum(n_docs)::BIGINT AS n_docs
      FROM pc GROUP BY 1 ORDER BY n_langs"""))

  // ---------- q246: LSH candidate precision/recall audit ----------------

  /** Measured precision and recall of q18's MinHash band-bucket
    * candidate generation against the EXACT Jaccard-≥0.5 pair set —
    * the near-dup twin of q127's ANN recall audit, and the table that
    * justifies (or re-tunes) the 16-hash/8-band configuration before
    * anyone trusts the q49 components built on it: precision prices
    * the verify stage (wasted exact-Jaccard work per kept pair),
    * recall bounds what banding silently drops. Truth comes from the
    * posting self-join (complete above any positive threshold — a
    * J≥0.5 pair must share shingles), candidates from the band
    * self-join, the intersection from ONE semi-join on the pair key;
    * all three counts are 1-row broadcasts and every shuffle is on
    * shingle/band/pair keys — nothing is ever |docs|².
    */
  private val q246 = QueryDef(
    "q246_lsh_audit",
    (s, dir) => {
      val cand = lshCandPairs(s, dir)
      val truth = jaccardPairs(s, dir, 0.5)
        .select(col("doc_a"), col("doc_b"))
      val nc = cand.agg(count(lit(1)).as("n_cand"))
      val nt = truth.agg(count(lit(1)).as("n_true"))
      val hit = cand.join(truth, Seq("doc_a", "doc_b"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
      nc.crossJoin(broadcast(nt)).crossJoin(broadcast(hit))
        .select(col("n_cand"), col("n_true"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_cand").cast("double"))
            .as("precision"),
          (col("n_hit").cast("double") / col("n_true").cast("double"))
            .as("recall"))
    },
    Some {
      val minSelects = minSelectsDuck
      val bandSelects = (0 until NBands).map { bnd =>
        s"SELECT doc_id, $bnd AS band, md5(mh${2 * bnd}::VARCHAR || ',' || " +
          s"mh${2 * bnd + 1}::VARCHAR) AS bkey FROM mh"
      }.mkString(" UNION ALL ")
      s"""WITH ${jaccardPairsDuckCte(0.5)},
      mh AS (SELECT doc_id, $minSelects FROM inv GROUP BY doc_id),
      bands AS ($bandSelects),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
      nc AS (SELECT count(*) AS n_cand FROM cand),
      nt AS (SELECT count(*) AS n_true FROM pairs),
      hit AS (SELECT count(*) AS n_hit FROM cand
        WHERE (doc_a, doc_b) IN (SELECT (doc_a, doc_b) FROM pairs))
      SELECT n_cand::BIGINT AS n_cand, n_true::BIGINT AS n_true,
        n_hit::BIGINT AS n_hit,
        n_hit::DOUBLE / n_cand::DOUBLE AS precision,
        n_hit::DOUBLE / n_true::DOUBLE AS recall
      FROM nc, nt, hit"""
    })

  // ---------- q321: LSH parameter planner ------------------------------

  /** The banding-parameter planner for the q18 MinHash pipeline: before
    * committing a 100 TB dedup run to one (bands b × rows r)
    * configuration, score the candidate-probability S-curve
    * P(cand | s) = 1 − (1 − s^r)^b for every b·r = 16 layout against
    * the corpus's OWN pair-similarity distribution — the exact n-gram
    * Jaccard of a deterministic pseudo-random pair sample (the q220
    * partner construction: 4 affine partners per doc, so the sample is
    * linear in the corpus, reproducible, and engine-portable). Output:
    * one row per observed similarity band with its pair mass and the
    * four layouts' candidate probabilities — read it to pick the curve
    * whose knee sits on the dup/background boundary the histogram
    * shows. Shape: the pair sample is |docs|×4 rows; the intersection
    * count is one (pair, shingle) aggregate — shuffle ∝ sampled pairs
    * × shingles/doc, linear like q18 itself, never pairs².
    */
  private val q321 = QueryDef(
    "q321_lsh_planner",
    (s, dir) => {
      val nDocs = docs(s, dir).agg(count(lit(1)).as("N"))
      val randomPairs = docs(s, dir).select(col("doc_id"))
        .crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("N"),
          explode(expr("sequence(0L, 3L)")).as("slot"))
        .select(col("doc_id"),
          pmod(col("doc_id") + 1L
            + pmod(col("doc_id") * lit(2246822519L)
              + col("slot") * lit(97931L), col("N") - 1L), col("N"))
            .as("partner"))
        .select(least(col("doc_id"), col("partner")).as("doc_a"),
          greatest(col("doc_id"), col("partner")).as("doc_b"))
        .where(col("doc_a") < col("doc_b"))
      // the random sample grounds the background mass; the band-
      // colliding candidates ground the dup tail the curve must catch
      // (the PlanCache'd pair table q18/q246 already materialize)
      val candPairs = lshCandPairs(s, dir)
      val pairMap = randomPairs.union(candPairs).distinct()
      val withId = pairMap.select(col("doc_a"), col("doc_b"),
        expr(h32Spark("concat('pair_', doc_a, '_', doc_b)")).as("pid"))
      // r16 (the q76 broadcast-verify pattern): the old form exploded
      // every sampled pair into member rows, joined the full posting
      // table and double-aggregated (~2.5M intermediate rows for ~24k
      // pairs); the shared doc-set table broadcasts and |intersection|
      // is per-row array_intersect. Inner joins drop <3-token docs
      // exactly as the old sizes joins did; n_int ≥ 0 directly replaces
      // the left-join coalesce — identical pct per pair, same buckets.
      val ds = docShingleSets(s, dir)
      val jacc = withId
        .join(broadcast(ds.select(col("doc_id").as("doc_a"),
          col("hs").as("ha"), col("n").as("na"))), Seq("doc_a"))
        .join(broadcast(ds.select(col("doc_id").as("doc_b"),
          col("hs").as("hb"), col("n").as("nb"))), Seq("doc_b"))
        .select(size(array_intersect(col("ha"), col("hb"))).cast("long")
          .as("n_int"), col("na"), col("nb"))
        .select(expr("(n_int * 100) div (na + nb - n_int)").as("pct"))
        .select(least(expr("pct div 5"), lit(19L)).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_pairs"))
      def pCand(b: Int, r: Int): org.apache.spark.sql.Column =
        round(expr(s"""1.0 - pow(1.0 - pow((CAST(bucket AS DOUBLE)
          * 5.0 + 2.5) / 100.0, $r.0), $b.0)"""), 9)
      jacc.select(col("bucket"),
          (col("bucket") * 5).as("s_lo_pct"), col("n_pairs"),
          pCand(8, 2).as("p_b8_r2"), pCand(4, 4).as("p_b4_r4"),
          pCand(16, 1).as("p_b16_r1"), pCand(2, 8).as("p_b2_r8"))
        .orderBy(col("bucket"))
    },
    Some {
      def pc(b: Int, r: Int): String =
        s"""round(1.0 - pow(1.0 - pow((bucket::DOUBLE * 5.0 + 2.5)
           / 100.0, $r.0), $b.0), 9)"""
      val bandSelects = (0 until NBands).map { bnd =>
        s"SELECT doc_id, $bnd AS band, md5(mh${2 * bnd}::VARCHAR || ',' " +
          s"|| mh${2 * bnd + 1}::VARCHAR) AS bkey FROM mh"
      }.mkString(" UNION ALL ")
      s"""WITH $shingledDuckCte,
      sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM inv
        GROUP BY 1),
      nd AS (SELECT count(*)::BIGINT AS N FROM documents),
      mh AS (SELECT doc_id, $minSelectsDuck FROM inv GROUP BY doc_id),
      bands AS ($bandSelects),
      cp AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
      pm AS (SELECT DISTINCT doc_a, doc_b FROM (
        SELECT least(doc_id, partner) AS doc_a,
            greatest(doc_id, partner) AS doc_b
          FROM (SELECT doc_id,
              (doc_id + 1 + (doc_id * 2246822519 + slot * 97931)
                % (N - 1)) % N AS partner
            FROM documents CROSS JOIN nd
            CROSS JOIN (SELECT unnest(range(0, 4)) AS slot))
          WHERE least(doc_id, partner) < greatest(doc_id, partner)
        UNION ALL SELECT doc_a, doc_b FROM cp)),
      wid AS (SELECT doc_a, doc_b,
          ${h32Duck("'pair_' || doc_a || '_' || doc_b")} AS pid
        FROM pm),
      mem AS (SELECT pid, doc_a AS doc_id FROM wid
        UNION ALL SELECT pid, doc_b FROM wid),
      inter AS (SELECT pid, count(*)::BIGINT AS n_int
        FROM (SELECT pid, h, count(*) AS c
          FROM mem JOIN inv USING (doc_id) GROUP BY 1, 2)
        WHERE c = 2 GROUP BY 1),
      jc AS (SELECT least(((coalesce(n_int, 0) * 100)
            // (sa.n_sh + sb.n_sh - coalesce(n_int, 0))) // 5, 19)
            AS bucket
        FROM wid
        JOIN sizes sa ON wid.doc_a = sa.doc_id
        JOIN sizes sb ON wid.doc_b = sb.doc_id
        LEFT JOIN inter USING (pid)),
      h AS (SELECT bucket, count(*)::BIGINT AS n_pairs FROM jc
        GROUP BY 1)
      SELECT bucket, bucket * 5 AS s_lo_pct, n_pairs,
        ${pc(8, 2)} AS p_b8_r2, ${pc(4, 4)} AS p_b4_r4,
        ${pc(16, 1)} AS p_b16_r1, ${pc(2, 8)} AS p_b2_r8
      FROM h ORDER BY bucket"""
    })

  // ---------- q336: SimHash bit-balance audit --------------------------

  /** Signature-quality audit for the q19 SimHash family: a healthy
    * 32-bit SimHash sets each bit on ~half the corpus (the hyperplane
    * through a balanced hash), and a biased bit carries less than one
    * bit of discriminating information — enough biased bits and the
    * q144 byte-block banding collides everything into few buckets.
    * Emits per-bit set-rates with their bias plus the corpus-level
    * verdict (max |bias| and the count of bits beyond a 2 % tolerance)
    * — the audit to run BEFORE trusting Hamming-distance thresholds at
    * 100 TB. Shape: reuses the cached posting table; one aggregation
    * computes all 32 per-doc bit counts (same codegen'd shape as q19),
    * a second bounded pass folds the ≤|docs|×1 signature rows into 32
    * cells via an in-scan stack; all counts exact int64.
    */
  private val q336 = QueryDef(
    "q336_simhash_bits",
    (s, dir) => {
      val cnts = persistedInverted(s, dir).groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"),
          (0 until 32).map { b =>
            sum(expr(s"CASE WHEN (h div ${1L << b}) % 2 = 1 THEN 1 " +
              "ELSE 0 END")).as(s"c$b")
          }: _*)
      val bitCols = (0 until 32).map { b =>
        s"'$b', CASE WHEN 2 * c$b > n THEN 1L ELSE 0L END"
      }.mkString(", ")
      val perBit = cnts
        .select(expr(s"stack(32, $bitCols)").as(Seq("bit", "set")))
        .groupBy(col("bit").cast("long").as("bit"))
        .agg(count(lit(1)).as("n_docs"), sum(col("set")).as("n_set"))
      val verdict = perBit.agg(
        max(abs(col("n_set").cast("double") / col("n_docs") - 0.5))
          .as("max_bias"),
        sum(when(abs(col("n_set").cast("double") / col("n_docs") - 0.5)
          > 0.02, 1L).otherwise(0L)).as("n_biased"))
      perBit.crossJoin(broadcast(verdict))
        .select(col("bit"), col("n_set"),
          round(col("n_set").cast("double") / col("n_docs"), 9)
            .as("set_rate"),
          round(col("n_set").cast("double") / col("n_docs") - 0.5, 9)
            .as("bias"),
          round(col("max_bias"), 9).as("max_bias"), col("n_biased"))
        .orderBy(col("bit"))
    },
    Some {
      val bitSelects = (0 until 32).map { b =>
        s"SELECT $b AS bit, CASE WHEN 2 * c$b > n THEN 1 ELSE 0 END " +
          s"AS bset FROM cnts"
      }.mkString(" UNION ALL ")
      val cbits = (0 until 32).map { b =>
        s"sum(CASE WHEN (h // ${1L << b}) % 2 = 1 THEN 1 ELSE 0 " +
          s"END)::BIGINT AS c$b"
      }.mkString(", ")
      s"""WITH $shingledDuckCte,
      cnts AS (SELECT doc_id, count(*)::BIGINT AS n, $cbits
        FROM inv GROUP BY doc_id),
      bits AS ($bitSelects),
      pb AS (SELECT bit::BIGINT AS bit, count(*)::BIGINT AS n_docs,
          sum(bset)::BIGINT AS n_set
        FROM bits GROUP BY 1),
      v AS (SELECT max(abs(n_set::DOUBLE / n_docs - 0.5)) AS max_bias,
          sum(CASE WHEN abs(n_set::DOUBLE / n_docs - 0.5) > 0.02
            THEN 1 ELSE 0 END)::BIGINT AS n_biased
        FROM pb)
      SELECT bit, n_set,
        round(n_set::DOUBLE / n_docs, 9) AS set_rate,
        round(n_set::DOUBLE / n_docs - 0.5, 9) AS bias,
        round(max_bias, 9) AS max_bias, n_biased
      FROM pb, v ORDER BY bit"""
    })

  // ---------- q381: dedup-aware training sample weights ----------------

  /** Cluster-debiased sampling weights: every doc in a near-dup
    * cluster of size s trains with weight 1/s, so a 40-copy template
    * contributes ONE document's worth of gradient instead of forty —
    * the soft alternative to q39's hard keep-one drop, and the weights
    * a sampling-based loader actually consumes. Reuses the
    * once-per-run component labels (ccLabels); the per-source report
    * gives the weight mass (= effective deduped doc count), the
    * Kish effective sample size (Σw)²/Σw² (how much the weight
    * spread itself costs), and the dup share. Weights pin to exact
    * nano integers (1e9 div s), second moments DECIMAL-lifted. Shape:
    * labels + one size aggregate + one broadcast-joined docs pass.
    */
  private val q381 = QueryDef(
    "q381_dedup_weights",
    (s, dir) => {
      val labels = ccLabels(s, dir, 0.8)
      val sizes = labels.groupBy(col("component"))
        .agg(count(lit(1)).as("csize"))
      val weighted = Fixtures.table(s, dir, "documents")
        .join(labels.select(col("node").as("doc_id"), col("component")),
          Seq("doc_id"), "left")
        .join(sizes, Seq("component"), "left")
        .select(col("source"),
          coalesce(col("csize"), lit(1L)).as("csize"))
        .withColumn("w_nano", expr("1000000000 div csize"))
      weighted.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("csize") > 1L, 1L).otherwise(0L))
            .as("n_dup_docs"),
          sum(col("w_nano")).as("sw"),
          sum((col("w_nano") * col("w_nano"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .as("sww"))
        .select(col("source"), col("n_docs"), col("n_dup_docs"),
          round(col("sw").cast("double") / 1e9, 6).as("weight_mass"),
          round(col("sw").cast("double") * col("sw").cast("double")
            / col("sww").cast("double"), 6).as("ess"),
          round(col("n_dup_docs").cast("double") / col("n_docs"), 9)
            .as("dup_share"))
        .orderBy(col("source"))
    },
    Some(s"""WITH RECURSIVE ${jaccardPairsDuckCte(0.8)},
      edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL SELECT doc_b AS u, doc_a AS v FROM pairs),
      reach(u, l) AS (
        SELECT u, u AS l FROM (SELECT DISTINCT u FROM edges) t
        UNION
        SELECT e.u, r.l FROM edges e JOIN reach r ON r.u = e.v),
      comp AS (SELECT u AS doc_id, min(l) AS cluster_id
        FROM reach GROUP BY u),
      sz AS (SELECT cluster_id, count(*)::BIGINT AS csize FROM comp
        GROUP BY 1),
      wd AS (SELECT d.source,
          coalesce(sz.csize, 1)::BIGINT AS csize,
          1000000000 // coalesce(sz.csize, 1) AS w_nano
        FROM documents d
        LEFT JOIN comp ON comp.doc_id = d.doc_id
        LEFT JOIN sz ON sz.cluster_id = comp.cluster_id)
      SELECT source, count(*)::BIGINT AS n_docs,
        sum(CASE WHEN csize > 1 THEN 1 ELSE 0 END)::BIGINT
          AS n_dup_docs,
        round(sum(w_nano)::DOUBLE / 1e9, 6) AS weight_mass,
        round(sum(w_nano)::DOUBLE * sum(w_nano)::DOUBLE
          / sum(w_nano::HUGEINT * w_nano)::DOUBLE, 6) AS ess,
        round(sum(CASE WHEN csize > 1 THEN 1 ELSE 0 END)::DOUBLE
          / count(*), 9) AS dup_share
      FROM wd
      GROUP BY source ORDER BY source"""))

  // ---------- q490: LSH index maintenance after ingest ------------------

  /** The state-update step q473's verdicts imply — append the admitted
    * batch's band rows to the standing LSH index, and PROVE the append
    * is the whole job: because MinHash signatures are ROW-LOCAL per
    * document (hashes of the doc's own shingles, no corpus statistics),
    * index(standing ∪ admitted) ≡ index(standing) ∪ index(admitted)
    * exactly — the union-merge member of the ingest-state family, and
    * the gate that would FAIL for any signature scheme that sneaks a
    * corpus-dependent term in (df-weighted MinHash, idf-scaled
    * SimHash), which is the design lesson: keep signatures row-local
    * or pay a full re-index per ingest. Admission here is the
    * conservative no-collision rule (zero standing band hits; q473's
    * verified-Jaccard verdict slots in downstream), so the admitted
    * band rows come from one anti-join of the batch's 8 fixed rows per
    * doc. Gate: merged vs an independent re-index of the post-ingest
    * member set, full-outer on (doc, band, bkey). 8-row output (one
    * per band), standing corpus never re-shingled for the merge path —
    * and as of round 14 the standing band table is the PERSISTED
    * [[StandingIndex]] artifact (bucketed catalog table), so "never
    * re-shingled" is structural, not a cache policy; the full re-index
    * audit side deliberately stays in-plan (it is the independent
    * recompute the merge is checked against).
    */
  private val q490 = QueryDef(
    "q490_ingest_index_update",
    (s, dir) => {
      val inv = persistedInverted(s, dir)
      val oldBands = StandingIndex.bands(s, dir)
      val newBands = bandsOf(corpusSignatures(s, dir)
        .where(expr("doc_id % 10 < 2")))
      val colliding = newBands.alias("n")
        .join(oldBands.alias("o"),
          col("n.band") === col("o.band")
            && col("n.bkey") === col("o.bkey"), "left_semi")
        .select(col("n.doc_id")).distinct()
      val admitted = inv.where(expr("doc_id % 10 < 2"))
        .select(col("doc_id")).distinct()
        .join(colliding, Seq("doc_id"), "left_anti")
      val admittedBands = newBands
        .join(admitted, Seq("doc_id"), "left_semi")
      val merged = oldBands.select(col("doc_id"), col("band"),
        col("bkey")).unionAll(admittedBands)
      // independent re-index of the post-ingest member set
      val members = inv.where(expr("doc_id % 10 >= 2"))
        .select(col("doc_id")).distinct().unionAll(admitted)
      val full = bandsOf(corpusSignatures(s, dir)
        .join(members, Seq("doc_id"), "left_semi"))
      val eq = merged.alias("m")
        .join(full.alias("f"),
          col("m.doc_id") === col("f.doc_id")
            && col("m.band") === col("f.band")
            && col("m.bkey") === col("f.bkey"), "full_outer")
        .agg(sum(when(col("m.doc_id").isNull || col("f.doc_id").isNull,
          1L).otherwise(0L)).as("n_mismatch"))
      // r15 (guide §2.4): the per-band report was FOUR aggregates glued
      // by three full-outer sort-merge joins (3 extra shuffles + sorts
      // in a 10-stage chain); a side-tagged union computes all five
      // counts in ONE aggregate. merged ≡ standing ∪ admitted, so its
      // counts are conditional sums over the same tagged rows; values
      // identical for every band present on any side (all 8 bands, by
      // construction of the fixed band index), oracle unchanged.
      val tagged = oldBands
        .select(col("band"), col("bkey"), lit("s").as("side"))
        .unionAll(admittedBands
          .select(col("band"), col("bkey"), lit("a").as("side")))
        .unionAll(full
          .select(col("band"), col("bkey"), lit("f").as("side")))
      val perBand = tagged.groupBy(col("band")).agg(
        sum(when(col("side") === "s", 1L).otherwise(0L)).as("n_standing"),
        sum(when(col("side") === "a", 1L).otherwise(0L)).as("n_admitted"),
        sum(when(col("side") =!= "f", 1L).otherwise(0L)).as("n_merged"),
        countDistinct(when(col("side") =!= "f", col("bkey")))
          .as("n_buckets"),
        sum(when(col("side") === "f", 1L).otherwise(0L)).as("n_full"))
      perBand.crossJoin(broadcast(eq))
        .select(col("band"),
          coalesce(col("n_standing"), lit(0L)).as("n_standing"),
          coalesce(col("n_admitted"), lit(0L)).as("n_admitted"),
          coalesce(col("n_merged"), lit(0L)).as("n_merged"),
          coalesce(col("n_full"), lit(0L)).as("n_full"),
          col("n_buckets"),
          (coalesce(col("n_mismatch"), lit(0L)) === 0L)
            .as("merge_equals_full"))
        .orderBy("band")
    },
    Some {
      val minSelects = minSelectsDuck
      val bandSelects = (0 until NBands).map { bnd =>
        s"SELECT doc_id, $bnd AS band, md5(mh${2 * bnd}::VARCHAR || ',' || " +
          s"mh${2 * bnd + 1}::VARCHAR) AS bkey FROM mh"
      }.mkString(" UNION ALL ")
      s"""WITH $shingledDuckCte,
      mh AS (SELECT doc_id, $minSelects FROM inv GROUP BY doc_id),
      bands AS ($bandSelects),
      oldb AS (SELECT * FROM bands WHERE doc_id % 10 >= 2),
      newb AS (SELECT * FROM bands WHERE doc_id % 10 < 2),
      colliding AS (SELECT DISTINCT n.doc_id FROM newb n
        WHERE EXISTS (SELECT 1 FROM oldb o
          WHERE o.band = n.band AND o.bkey = n.bkey)),
      admitted AS (SELECT DISTINCT doc_id FROM inv
        WHERE doc_id % 10 < 2
          AND doc_id NOT IN (SELECT doc_id FROM colliding)),
      admb AS (SELECT b.* FROM newb b
        WHERE b.doc_id IN (SELECT doc_id FROM admitted)),
      merged AS (SELECT * FROM oldb UNION ALL SELECT * FROM admb),
      members AS (SELECT DISTINCT doc_id FROM inv WHERE doc_id % 10 >= 2
        UNION ALL SELECT doc_id FROM admitted),
      fullb AS (SELECT b.* FROM bands b
        WHERE b.doc_id IN (SELECT doc_id FROM members)),
      eq AS (SELECT sum(CASE WHEN m.doc_id IS NULL OR f.doc_id IS NULL
            THEN 1 ELSE 0 END)::BIGINT AS n_mismatch
        FROM merged m FULL JOIN fullb f
        ON m.doc_id = f.doc_id AND m.band = f.band AND m.bkey = f.bkey),
      pb AS (SELECT band,
          count(CASE WHEN src = 'o' THEN 1 END)::BIGINT AS n_standing,
          count(CASE WHEN src = 'a' THEN 1 END)::BIGINT AS n_admitted
        FROM (SELECT band, 'o' AS src FROM oldb
          UNION ALL SELECT band, 'a' FROM admb) GROUP BY band),
      pm AS (SELECT band, count(*)::BIGINT AS n_merged,
          count(DISTINCT bkey)::BIGINT AS n_buckets
        FROM merged GROUP BY band),
      pf AS (SELECT band, count(*)::BIGINT AS n_full
        FROM fullb GROUP BY band)
      SELECT pb.band, n_standing, n_admitted, n_merged, n_full,
        n_buckets, (n_mismatch = 0) AS merge_equals_full
      FROM pb JOIN pm ON pm.band = pb.band
      JOIN pf ON pf.band = pb.band, eq
      ORDER BY pb.band"""
    })

  // ---------- q491: ingest-batch SimHash delta --------------------------

  /** The SimHash member of the cross-snapshot ingest family — q473's
    * shape (new×old only, never old×old) at q19's cost point: 8-byte
    * signatures instead of 8 band rows, byte-block banding instead of
    * MinHash buckets, exact Hamming verify (≤ 8 of 32, q19's
    * threshold) instead of exact Jaccard. The asymmetric join makes
    * the daily-ingest economics explicit: the standing side is a
    * 4-row-per-doc block table (bucketed by (blk, bval) at 100 TB,
    * rebuilt never — signatures are row-local, q490's lesson), the
    * batch side is 4·|batch| rows that broadcast when the batch is
    * daily-sized, and candidates ∝ block collisions. Verdict per NEW
    * doc: drop iff some standing doc verifies at Hamming ≤ 8, with
    * the (hamming, id)-lexicographic-min standing doc as `dup_of`
    * (encoded through one integer key so Spark's struct-min and the
    * oracle's scalar min agree bit-for-bit). Batch docs with < 3
    * tokens have no signature and keep with n_cand = 0.
    *
    * BLOCK WIDTH is the scale knob, and this query deliberately sets
    * it wider than q19: q19's 4×8-bit blocks give only 256 buckets
    * per block, so bucket collisions — and the verify join behind
    * them — grow ∝ corpus²/256 (the round-12 sf1→sf3 canary measured
    * exactly that: 6.0× wall on 3× data with 8-bit blocks). The
    * ingest join uses 2×16-bit blocks (65 536 buckets per block):
    * the pigeonhole guarantee narrows to Hamming ≤ 1, pairs at 2–8
    * are found only when their differing bits cluster in one half —
    * the standard SimHash width-for-recall tradeoff q19 documents,
    * pushed one step toward scale (production at 100 TB runs 64-bit
    * signatures with 16-bit blocks for the same reason). The oracle
    * replicates the identical 16-bit construction, so the gate
    * checks the deployed setting, not a toy one.
    */
  /** (doc_id, simhash, blk, bval) SimHash block rows over a posting
    * table — q19's signature construction (one codegen'd 32-bit-count
    * aggregation, majority-bit fold) factored out so q491's
    * asymmetric ingest join and StreamingSpec's standing-side fixture
    * share one definition. `blockBits` selects the banding width:
    * 8 (q19's 4 byte-blocks, Hamming ≤ 3 guaranteed) or 16 (q491's
    * 2 half-blocks, Hamming ≤ 1 guaranteed, 256× fewer bucket
    * collisions at corpus scale).
    */
  private[graft] def simhashBlocks(inv: DataFrame,
      blockBits: Int = 8): DataFrame = {
    val cnts = inv.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"),
        (0 until 32).map { b =>
          sum(expr(s"CASE WHEN (h div ${1L << b}) % 2 = 1 THEN 1 " +
            "ELSE 0 END")).as(s"c$b")
        }: _*)
    val sigExpr = (0 until 32).map { b =>
      s"(CASE WHEN 2 * c$b > n THEN ${1L << b}L ELSE 0L END)"
    }.mkString(" + ")
    val sig = cnts.select(col("doc_id"), expr(sigExpr).as("simhash"))
    val nBlocks = 32 / blockBits
    val blockCols = (0 until nBlocks).map(i =>
      expr(s"(simhash div ${1L << (blockBits * i)}) " +
        s"% ${1L << blockBits}"))
    sig.select(col("doc_id"), col("simhash"),
      posexplode(array(blockCols: _*)).as(Seq("blk", "bval")))
  }

  private val q491 = QueryDef(
    "q491_ingest_simhash_delta",
    (s, dir) => {
      val blocks = simhashBlocks(persistedInverted(s, dir), blockBits = 16)
      val cand = blocks.alias("a")
        .join(blocks.alias("b"),
          col("a.blk") === col("b.blk")
            && col("a.bval") === col("b.bval")
            && col("a.doc_id") % 10 < 2 && col("b.doc_id") % 10 >= 2)
        .select(col("a.doc_id").as("doc_id"),
          col("b.doc_id").as("doc_old"),
          expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
        .distinct()
      val per = cand.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_cand"),
          sum(when(col("hamming") <= 8, 1L).otherwise(0L)).as("n_dup"),
          min(when(col("hamming") <= 8,
            col("hamming").cast("long") * 1000000000L + col("doc_old")))
            .as("bk"))
      docs(s, dir).where(expr("doc_id % 10 < 2")).select(col("doc_id"))
        .join(per, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("n_cand"), lit(0L)).as("n_cand"),
          coalesce(col("n_dup"), lit(0L)).as("n_dup"),
          coalesce(expr("bk div 1000000000"), lit(-1L)).as("hamming_min"),
          coalesce(expr("bk % 1000000000"), lit(-1L)).as("dup_of"),
          when(col("bk").isNull, "keep").otherwise("drop").as("verdict"))
        .orderBy("doc_id")
    },
    Some {
      val bitSums = (0 until 32).map { b =>
        s"sum(CASE WHEN (h // ${1L << b}) % 2 = 1 THEN 1 ELSE 0 END) AS c$b"
      }.mkString(", ")
      val sigExpr = (0 until 32).map { b =>
        s"(CASE WHEN 2 * c$b > n THEN ${1L << b}::BIGINT ELSE 0::BIGINT END)"
      }.mkString(" + ")
      val blockSelects = (0 until 2).map { i =>
        s"SELECT doc_id, simhash, $i AS blk, " +
          s"(simhash // ${1L << (16 * i)}) % 65536 AS bval FROM sig"
      }.mkString(" UNION ALL ")
      s"""WITH $shingledDuckCte,
      cnts AS (SELECT doc_id, count(*) AS n, $bitSums FROM inv
        GROUP BY doc_id),
      sig AS (SELECT doc_id, $sigExpr AS simhash FROM cnts),
      blocks AS ($blockSelects),
      cand AS (SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS doc_old,
          bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
        FROM blocks a JOIN blocks b
        ON a.blk = b.blk AND a.bval = b.bval
        WHERE a.doc_id % 10 < 2 AND b.doc_id % 10 >= 2),
      per AS (SELECT doc_id, count(*)::BIGINT AS n_cand,
          sum(CASE WHEN hamming <= 8 THEN 1 ELSE 0 END)::BIGINT AS n_dup,
          min(CASE WHEN hamming <= 8
            THEN hamming * 1000000000 + doc_old END) AS bk
        FROM cand GROUP BY 1)
      SELECT d.doc_id, coalesce(n_cand, 0)::BIGINT AS n_cand,
        coalesce(n_dup, 0)::BIGINT AS n_dup,
        coalesce(bk // 1000000000, -1)::BIGINT AS hamming_min,
        coalesce(bk % 1000000000, -1)::BIGINT AS dup_of,
        CASE WHEN bk IS NULL THEN 'keep' ELSE 'drop' END AS verdict
      FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
      WHERE d.doc_id % 10 < 2
      ORDER BY d.doc_id"""
    })

  // ---------- q499: block-level chunk-store dedup at ingest ---------------

  /** Content-block dedup of the arriving batch against the standing
    * chunk store — the storage-layer member of the ingest family:
    * document-level dedup (q473/q491) decides what to TRAIN on, but
    * the object store underneath dedups at fixed-block granularity
    * (the rsync/CAS model; q166's content-defined cuts are the
    * variable-block variant), and a batch full of near-copies costs
    * almost no new bytes. Each doc splits into 64-char blocks inside
    * the scan projection (sequence→transform→explode, no window); the
    * standing store is the DISTINCT block-key set; the probe is one
    * semi-join-shaped left join on the 16-byte key, so shuffle ∝
    * batch blocks, never the standing store (which at 100 TB is
    * bucketed by key and the join co-locates). Per-source report:
    * block counts, within-batch distinct, standing hits, byte
    * savings at block grain. All counts exact int64.
    */
  /** Fixed 64-char content blocks cut inside the scan projection —
    * q499's chunk derivation, shared with ScaleSpec's bucketed
    * chunk-store proof. */
  private[graft] def chunkBlocks64(side: DataFrame): DataFrame = side
    .where(length(col("text")) > 0)
    .select(col("doc_id"), col("source"),
      explode(expr("""transform(
        sequence(0, CAST((length(text) - 1) div 64 AS INT)),
        i -> substring(text, i * 64 + 1, 64))""")).as("blk"))
    .select(col("doc_id"), col("source"),
      md5(col("blk")).as("bkey"),
      length(col("blk")).cast("long").as("blen"))

  private val q499 = QueryDef(
    "q499_ingest_block_dedup",
    (s, dir) => {
      val d = docs(s, dir)
      val standing = chunkBlocks64(d.where(expr("doc_id % 10 >= 2")))
        .select(col("bkey")).distinct()
      val batch = chunkBlocks64(d.where(expr("doc_id % 10 < 2")))
      batch
        .join(standing.withColumn("hit", lit(1L)), Seq("bkey"),
          "left_outer")
        .groupBy(col("source"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_blocks"),
          countDistinct(col("bkey")).as("n_distinct_blocks"),
          sum(coalesce(col("hit"), lit(0L))).as("n_standing_hits"),
          sum(col("blen")).as("bytes_total"),
          sum(col("blen") * coalesce(col("hit"), lit(0L)))
            .as("bytes_dedup"))
        .select(col("source"), col("n_docs"), col("n_blocks"),
          col("n_distinct_blocks"), col("n_standing_hits"),
          col("bytes_total"), col("bytes_dedup"),
          round(col("bytes_dedup").cast("double") / col("bytes_total"), 9)
            .as("dedup_share"))
        .orderBy("source")
    },
    Some("""WITH blk AS (SELECT doc_id, source,
          unnest(list_transform(range(0, (length(text) + 63) // 64),
            i -> substring(text, i * 64 + 1, 64))) AS blk
        FROM documents WHERE length(text) > 0),
      keyed AS (SELECT doc_id, source, md5(blk) AS bkey,
          length(blk)::BIGINT AS blen FROM blk),
      standing AS (SELECT DISTINCT bkey FROM keyed
        WHERE doc_id % 10 >= 2),
      batch AS (SELECT k.*, CASE WHEN s.bkey IS NULL THEN 0 ELSE 1 END
          ::BIGINT AS hit
        FROM keyed k LEFT JOIN standing s ON s.bkey = k.bkey
        WHERE doc_id % 10 < 2)
      SELECT source, count(DISTINCT doc_id)::BIGINT AS n_docs,
        count(*)::BIGINT AS n_blocks,
        count(DISTINCT bkey)::BIGINT AS n_distinct_blocks,
        sum(hit)::BIGINT AS n_standing_hits,
        sum(blen)::BIGINT AS bytes_total,
        sum(blen * hit)::BIGINT AS bytes_dedup,
        round(sum(blen * hit)::DOUBLE / sum(blen), 9) AS dedup_share
      FROM batch GROUP BY source ORDER BY source"""))

  // ---------- q500: ingest acceptance funnel ------------------------------

  /** The capstone the ingest family composes into — ONE pass over the
    * arriving batch applying the pipeline's gates in their production
    * order and attributing every document to the FIRST gate that
    * rejects it: (1) exact dup vs the standing corpus (q17's
    * content key, q498's Bloom stands in front of this at scale),
    * (2) verified near-dup vs the standing LSH index (q473's
    * asymmetric band join + exact-Jaccard verify), (3) quality floor
    * (q14's composite < 0.5), (4) language allowlist (q15's serving
    * set — zh has no gated pipeline here). The funnel ledger —
    * docs AND tokens per stage — is what a data-engineering review
    * actually reads: where the batch died, and how many tokens
    * survived to training. Shape: every gate is a flag column from a
    * key- or band-join (shuffles ∝ batch, standing side pre-built and
    * bucketed at 100 TB); the funnel itself is conditional sums in
    * one aggregate fanned to the 6-row report from a single row.
    */
  private val q500 = QueryDef(
    "q500_ingest_funnel",
    (s, dir) => {
      val inv = persistedInverted(s, dir)
      val d = docs(s, dir)
      val norm = md5(expr("graft_norm_text(text)"))
      val standingKeys = d.where(expr("doc_id % 10 >= 2"))
        .select(norm.as("key")).distinct()
      val batch = d.where(expr("doc_id % 10 < 2"))
        .withColumn("key", norm)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .withColumn("n_stop", expr(
          "size(filter(toks, t -> t IN ('the', 'a', 'of', 'to', 'and')))"))
        .withColumn("quality",
          lit(0.3) * (size(array_distinct(col("toks"))).cast("double")
            / col("n_tokens"))
            + lit(0.2) * (lit(1.0) - col("n_stop").cast("double")
            / col("n_tokens"))
            + lit(0.2) * (lit(1.0)
            - length(regexp_replace(col("text"), "[a-z ]", ""))
            .cast("double") / length(col("text")))
            + lit(0.3) * least(col("n_tokens").cast("double") / lit(50.0),
            lit(1.0)))
      // near-dup verdicts: q473's asymmetric band join + exact verify,
      // standing side read from the persisted StandingIndex artifacts
      // (bucketed band + posting tables), batch side in-plan
      val batchInv = inv.where(expr("doc_id % 10 < 2"))
      val oldPost = StandingIndex.postings(s, dir)
      val cand = bandsOf(corpusSignatures(s, dir)
        .where(expr("doc_id % 10 < 2")))
        .alias("n")
        .join(StandingIndex.bands(s, dir).alias("o"),
          col("n.band") === col("o.band")
            && col("n.bkey") === col("o.bkey"))
        .select(col("n.doc_id").as("doc_new"),
          col("o.doc_id").as("doc_old"))
        .distinct()
      val sizesNew = batchInv.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"))
      val sizesOld = oldPost.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"))
      val nearSet = cand
        .join(batchInv.select(col("doc_id").as("doc_new"), col("h")),
          "doc_new")
        .join(oldPost.select(col("doc_id").as("doc_old"), col("h")),
          Seq("doc_old", "h"))
        .groupBy(col("doc_new"), col("doc_old"))
        .agg(count(lit(1)).as("n_common"))
        .join(sizesNew.select(col("doc_id").as("doc_new"),
          col("n").as("nn")), "doc_new")
        .join(sizesOld.select(col("doc_id").as("doc_old"),
          col("n").as("no")), "doc_old")
        .where(col("n_common").cast("double")
          / (col("nn") + col("no") - col("n_common")) >= 0.5)
        .select(col("doc_new").as("doc_id")).distinct()
        .withColumn("is_near", lit(1L))
      val flagged = batch
        .join(standingKeys.withColumn("is_exact", lit(1L)), Seq("key"),
          "left_outer")
        .join(nearSet, Seq("doc_id"), "left_outer")
        .select(col("n_tokens"),
          coalesce(col("is_exact"), lit(0L)).as("fe"),
          coalesce(col("is_near"), lit(0L)).as("fn"),
          (col("quality") < 0.5).cast("long").as("fq"),
          (!col("lang").isin("en", "de", "es", "fr")).cast("long")
            .as("fl"))
        .select(col("n_tokens"), col("fe"),
          ((lit(1L) - col("fe")) * col("fn")).as("dn"),
          ((lit(1L) - col("fe")) * (lit(1L) - col("fn")) * col("fq"))
            .as("dq"),
          ((lit(1L) - col("fe")) * (lit(1L) - col("fn"))
            * (lit(1L) - col("fq")) * col("fl")).as("dl"))
        .withColumn("adm", lit(1L) - col("fe") - col("dn") - col("dq")
          - col("dl"))
      val one = flagged.agg(count(lit(1)).as("n_in"),
        sum(col("n_tokens")).as("t_in"),
        sum(col("fe")).as("n_ex"), sum(col("fe") * col("n_tokens"))
          .as("t_ex"),
        sum(col("dn")).as("n_nd"), sum(col("dn") * col("n_tokens"))
          .as("t_nd"),
        sum(col("dq")).as("n_q"), sum(col("dq") * col("n_tokens"))
          .as("t_q"),
        sum(col("dl")).as("n_l"), sum(col("dl") * col("n_tokens"))
          .as("t_l"),
        sum(col("adm")).as("n_adm"), sum(col("adm") * col("n_tokens"))
          .as("t_adm"))
      one.select(explode(array(
        struct(lit("1_input").as("stage"), col("n_in").as("n_docs"),
          col("t_in").as("n_tokens")),
        struct(lit("2_drop_exact").as("stage"), col("n_ex").as("n_docs"),
          col("t_ex").as("n_tokens")),
        struct(lit("3_drop_neardup").as("stage"), col("n_nd").as("n_docs"),
          col("t_nd").as("n_tokens")),
        struct(lit("4_drop_quality").as("stage"), col("n_q").as("n_docs"),
          col("t_q").as("n_tokens")),
        struct(lit("5_drop_lang").as("stage"), col("n_l").as("n_docs"),
          col("t_l").as("n_tokens")),
        struct(lit("6_admitted").as("stage"), col("n_adm").as("n_docs"),
          col("t_adm").as("n_tokens")))).as("r"))
        .select(col("r.stage").as("stage"), col("r.n_docs").as("n_docs"),
          col("r.n_tokens").as("n_tokens"))
        .orderBy("stage")
    },
    Some {
      val minSelects = minSelectsDuck
      val bandSelects = (0 until NBands).map { bnd =>
        s"SELECT doc_id, $bnd AS band, md5(mh${2 * bnd}::VARCHAR || ',' " +
          s"|| mh${2 * bnd + 1}::VARCHAR) AS bkey FROM mh"
      }.mkString(" UNION ALL ")
      s"""WITH $shingledDuckCte,
      mh AS (SELECT doc_id, $minSelects FROM inv GROUP BY doc_id),
      bands AS ($bandSelects),
      cand AS (SELECT DISTINCT n.doc_id AS doc_new, o.doc_id AS doc_old
        FROM bands n JOIN bands o
        ON n.band = o.band AND n.bkey = o.bkey
        WHERE n.doc_id % 10 < 2 AND o.doc_id % 10 >= 2),
      sizes AS (SELECT doc_id, count(*) AS n FROM inv GROUP BY 1),
      near AS (SELECT DISTINCT c.doc_new AS doc_id
        FROM cand c
        JOIN inv a ON a.doc_id = c.doc_new
        JOIN inv b ON b.doc_id = c.doc_old AND b.h = a.h
        JOIN sizes sn ON sn.doc_id = c.doc_new
        JOIN sizes so ON so.doc_id = c.doc_old
        GROUP BY c.doc_new, c.doc_old, sn.n, so.n
        HAVING count(*)::DOUBLE / (sn.n + so.n - count(*)) >= 0.5),
      sk AS (SELECT DISTINCT md5(trim(regexp_replace(
          regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
          ' +', ' ', 'g'))) AS key FROM documents WHERE doc_id % 10 >= 2),
      bt AS (SELECT doc_id, lang,
          md5(trim(regexp_replace(
            regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
            ' +', ' ', 'g'))) AS key,
          len(string_split(text, ' '))::BIGINT AS n_tokens,
          0.3 * (len(list_distinct(string_split(text, ' ')))::DOUBLE
            / len(string_split(text, ' ')))
          + 0.2 * (1.0 - len(list_filter(string_split(text, ' '),
            t -> t IN ('the', 'a', 'of', 'to', 'and')))::DOUBLE
            / len(string_split(text, ' ')))
          + 0.2 * (1.0 - length(regexp_replace(text, '[a-z ]', '', 'g'))
            ::DOUBLE / length(text))
          + 0.3 * least(len(string_split(text, ' '))::DOUBLE / 50.0, 1.0)
            AS quality
        FROM documents WHERE doc_id % 10 < 2),
      fl AS (SELECT n_tokens,
          CASE WHEN key IN (SELECT key FROM sk) THEN 1 ELSE 0 END
            ::BIGINT AS fe,
          CASE WHEN doc_id IN (SELECT doc_id FROM near) THEN 1 ELSE 0
            END::BIGINT AS fn,
          CASE WHEN quality < 0.5 THEN 1 ELSE 0 END::BIGINT AS fq,
          CASE WHEN lang NOT IN ('en', 'de', 'es', 'fr') THEN 1 ELSE 0
            END::BIGINT AS fl
        FROM bt),
      att AS (SELECT n_tokens, fe,
          (1 - fe) * fn AS dn,
          (1 - fe) * (1 - fn) * fq AS dq,
          (1 - fe) * (1 - fn) * (1 - fq) * fl AS dl,
          1 - fe - (1 - fe) * fn - (1 - fe) * (1 - fn) * fq
            - (1 - fe) * (1 - fn) * (1 - fq) * fl AS adm
        FROM fl),
      one AS (SELECT count(*)::BIGINT AS n_in,
          sum(n_tokens)::BIGINT AS t_in,
          sum(fe)::BIGINT AS n_ex, sum(fe * n_tokens)::BIGINT AS t_ex,
          sum(dn)::BIGINT AS n_nd, sum(dn * n_tokens)::BIGINT AS t_nd,
          sum(dq)::BIGINT AS n_q, sum(dq * n_tokens)::BIGINT AS t_q,
          sum(dl)::BIGINT AS n_l, sum(dl * n_tokens)::BIGINT AS t_l,
          sum(adm)::BIGINT AS n_adm,
          sum(adm * n_tokens)::BIGINT AS t_adm
        FROM att)
      SELECT stage, n_docs, n_tokens FROM (
        SELECT '1_input' AS stage, n_in AS n_docs, t_in AS n_tokens
          FROM one
        UNION ALL SELECT '2_drop_exact', n_ex, t_ex FROM one
        UNION ALL SELECT '3_drop_neardup', n_nd, t_nd FROM one
        UNION ALL SELECT '4_drop_quality', n_q, t_q FROM one
        UNION ALL SELECT '5_drop_lang', n_l, t_l FROM one
        UNION ALL SELECT '6_admitted', n_adm, t_adm FROM one)
      ORDER BY stage"""
    })

  // ---------- q506: dedup canonical order-dependence ----------------------

  /** Does STREAMING dedup pick the same survivors as BATCH dedup? The
    * ingest family (q473/q490/q491, DocStream.exactDedup) admits the
    * FIRST arrival of each content key; the batch family (q17/q39)
    * canonicalizes by MIN doc_id. Replaying the whole corpus as ten
    * arrival micro-batches (b = doc_id mod 10 — the standing split
    * convention generalized to a full history) and comparing the two
    * canonical assignments measures the divergence directly: every
    * dup group (content key = q148's 128-char template prefix — the
    * fixture's exact-dup surface; q17's whole-text key would find no
    * groups here) whose min-id member arrives LATE is a key where the
    * streaming index and a batch rebuild disagree about which copy
    * survives — the thing that silently changes training data when a
    * pipeline switches between the two modes, and the reason q490's
    * merge gate alone isn't enough (the index can be exactly mergeable
    * yet order-dependent in its VERDICTS). No iteration: first-wins is
    * argmin over the (batch, doc_id) arrival order, so the whole
    * 10-batch replay is ONE groupBy(key) aggregate (encoded-int64
    * argmin) plus a ≤10-row ownership fold per scheme. Per arrival
    * batch: keys each scheme canonicalizes there, dup keys among
    * them, and the disagreement count.
    */
  private val q506 = QueryDef(
    "q506_dedup_order_dependence",
    (s, dir) => {
      val per = docs(s, dir)
        .select(col("doc_id"),
          md5(substring(col("text"), 1, 128)).as("key"))
        .groupBy(col("key"))
        .agg(count(lit(1)).as("n"),
          min(expr("(doc_id % 10) * 1000000000000 + doc_id")).as("ks"),
          min(col("doc_id")).as("batch_canon"))
        .select(col("n"), expr("ks % 1000000000000").as("stream_canon"),
          col("batch_canon"))
      val streamSide = per.groupBy(expr("stream_canon % 10").as("b"))
        .agg(count(lit(1)).as("n_stream_canon"),
          sum(when(col("n") >= 2, 1L).otherwise(0L))
            .as("n_dup_keys_stream"),
          sum(when(col("stream_canon") =!= col("batch_canon"), 1L)
            .otherwise(0L)).as("n_disagree"))
      val batchSide = per.groupBy(expr("batch_canon % 10").as("b"))
        .agg(count(lit(1)).as("n_batch_canon"))
      streamSide.join(batchSide, Seq("b"), "full_outer")
        .select(col("b"),
          coalesce(col("n_stream_canon"), lit(0L)).as("n_stream_canon"),
          coalesce(col("n_batch_canon"), lit(0L)).as("n_batch_canon"),
          coalesce(col("n_dup_keys_stream"), lit(0L))
            .as("n_dup_keys_stream"),
          coalesce(col("n_disagree"), lit(0L)).as("n_disagree"))
        .orderBy("b")
    },
    Some("""WITH per AS (SELECT count(*)::BIGINT AS n,
          min((doc_id % 10) * 1000000000000 + doc_id) % 1000000000000
            AS stream_canon,
          min(doc_id) AS batch_canon
        FROM (SELECT doc_id, md5(substring(text, 1, 128)) AS key
          FROM documents)
        GROUP BY key),
      ss AS (SELECT stream_canon % 10 AS b,
          count(*)::BIGINT AS n_stream_canon,
          sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END)::BIGINT
            AS n_dup_keys_stream,
          sum(CASE WHEN stream_canon <> batch_canon THEN 1 ELSE 0 END)
            ::BIGINT AS n_disagree
        FROM per GROUP BY 1),
      bs AS (SELECT batch_canon % 10 AS b,
          count(*)::BIGINT AS n_batch_canon FROM per GROUP BY 1)
      SELECT coalesce(ss.b, bs.b) AS b,
        coalesce(n_stream_canon, 0)::BIGINT AS n_stream_canon,
        coalesce(n_batch_canon, 0)::BIGINT AS n_batch_canon,
        coalesce(n_dup_keys_stream, 0)::BIGINT AS n_dup_keys_stream,
        coalesce(n_disagree, 0)::BIGINT AS n_disagree
      FROM ss FULL JOIN bs ON bs.b = ss.b ORDER BY b"""))

  // ---------- q529: ingest probe against a COMPACTED standing index ----

  /** The day-over-day index-maintenance contract, gated end-to-end:
    * the standing index q473 reads is bootstrapped ONCE, but real
    * pipelines then grow it daily — each wave's accepted docs must be
    * appended so the NEXT wave's probe sees them, without ever
    * re-shingling the corpus. Here the index is built in two
    * generations ([[StandingIndex.ensureCompacted]]): a partial
    * bootstrap (doc_id % 10 in 2..7) plus one [[StandingIndex
    * .compactInto]] append wave (% 10 in {8, 9}) — appended files
    * follow the catalog bucket spec, so the probe's bucket pruning and
    * partitioning survive compaction — and the arriving batch
    * (% 10 < 2) is probed against the COMPACTED artifacts exactly as
    * q473 probes the one-shot index. Because generations 1 + 2 cover
    * precisely the % 10 >= 2 corpus, the DuckDB oracle is the plain
    * union-corpus probe: any append defect (lost rows, wrong bucket
    * file, missing postings) shifts candidates/verdicts and fails the
    * hash. `n_cand_appended` counts candidates contributed by the
    * APPENDED generation (nonzero at gate SF), so the output also
    * proves the compacted rows are live, not just present.
    * Scale shape: identical to q473 (batch bands shuffle or broadcast
    * against the bucketed standing table; corpus never shuffles) plus
    * an append cost ∝ accepted-batch size — measured against a full
    * re-bootstrap in BenchIndex.
    */
  private val q529 = QueryDef(
    "q529_ingest_index_compaction",
    (s, dir) => {
      val arts = StandingIndex.ensureCompacted(s, dir)
      val batchInv = persistedInverted(s, dir)
        .where(expr("doc_id % 10 < 2"))
      // manifest-resolved reads: only committed generations are
      // visible, so a crashed half-appended wave can't shift candidates
      val oldBands = StandingIndex.bandsOf(s, arts)
      val oldPost = StandingIndex.postingsOf(s, arts)
      val newBands = bandsOf(corpusSignatures(s, dir)
        .where(expr("doc_id % 10 < 2")))
      val cand = newBands.alias("n")
        .join(oldBands.alias("o"),
          col("n.band") === col("o.band") && col("n.bkey") === col("o.bkey"))
        .select(col("n.doc_id").as("doc_new"), col("o.doc_id").as("doc_old"))
        .distinct()
      val sizesNew = batchInv.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"))
      val sizesOld = oldPost.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"))
      val j = cand
        .join(batchInv.select(col("doc_id").as("doc_new"), col("h")),
          "doc_new")
        .join(oldPost.select(col("doc_id").as("doc_old"), col("h")),
          Seq("doc_old", "h"))
        .groupBy(col("doc_new"), col("doc_old"))
        .agg(count(lit(1)).as("n_common"))
        .join(sizesNew.select(col("doc_id").as("doc_new"), col("n").as("nn")),
          "doc_new")
        .join(sizesOld.select(col("doc_id").as("doc_old"), col("n").as("no")),
          "doc_old")
        .select(col("doc_new"), col("doc_old"),
          (col("n_common").cast("double")
            / (col("nn") + col("no") - col("n_common"))).as("jaccard"))
      val cagg = cand.groupBy(col("doc_new"))
        .agg(count(lit(1)).as("n_cand"),
          sum(when(col("doc_old") % 10 >= 8, 1L).otherwise(0L))
            .as("n_cand_appended"))
      val dagg = j.where(col("jaccard") >= 0.5)
        .groupBy(col("doc_new"))
        .agg(count(lit(1)).as("n_dups"),
          max(col("jaccard")).as("best_jaccard"),
          min(col("doc_old")).as("dup_of"))
      docs(s, dir).where(expr("doc_id % 10 < 2")).select(col("doc_id"))
        .join(cagg.withColumnRenamed("doc_new", "doc_id"), Seq("doc_id"),
          "left_outer")
        .join(dagg.withColumnRenamed("doc_new", "doc_id"), Seq("doc_id"),
          "left_outer")
        .select(col("doc_id"),
          coalesce(col("n_cand"), lit(0L)).as("n_cand"),
          coalesce(col("n_cand_appended"), lit(0L)).as("n_cand_appended"),
          coalesce(col("n_dups"), lit(0L)).as("n_dups"),
          col("best_jaccard"), col("dup_of"),
          when(col("dup_of").isNull, "keep").otherwise("drop")
            .as("verdict"))
        .orderBy("doc_id")
    },
    Some {
      val minSelects = minSelectsDuck
      val bandSelects = (0 until NBands).map { bnd =>
        s"SELECT doc_id, $bnd AS band, md5(mh${2 * bnd}::VARCHAR || ',' || " +
          s"mh${2 * bnd + 1}::VARCHAR) AS bkey FROM mh"
      }.mkString(" UNION ALL ")
      s"""WITH $shingledDuckCte,
      mh AS (SELECT doc_id, $minSelects FROM inv GROUP BY doc_id),
      bands AS ($bandSelects),
      cand AS (SELECT DISTINCT n.doc_id AS doc_new, o.doc_id AS doc_old
        FROM bands n JOIN bands o
        ON n.band = o.band AND n.bkey = o.bkey
        WHERE n.doc_id % 10 < 2 AND o.doc_id % 10 >= 2),
      sizes AS (SELECT doc_id, count(*) AS n FROM inv GROUP BY 1),
      jac AS (SELECT c.doc_new, c.doc_old,
          count(*)::DOUBLE / (sn.n + so.n - count(*)) AS jaccard
        FROM cand c
        JOIN inv a ON a.doc_id = c.doc_new
        JOIN inv b ON b.doc_id = c.doc_old AND b.h = a.h
        JOIN sizes sn ON sn.doc_id = c.doc_new
        JOIN sizes so ON so.doc_id = c.doc_old
        GROUP BY c.doc_new, c.doc_old, sn.n, so.n),
      cagg AS (SELECT doc_new, count(*)::BIGINT AS n_cand,
          sum(CASE WHEN doc_old % 10 >= 8 THEN 1 ELSE 0 END)::BIGINT
            AS n_cand_appended
        FROM cand GROUP BY 1),
      dagg AS (SELECT doc_new, count(*)::BIGINT AS n_dups,
          max(jaccard) AS best_jaccard, min(doc_old)::BIGINT AS dup_of
        FROM jac WHERE jaccard >= 0.5 GROUP BY 1)
      SELECT d.doc_id, coalesce(n_cand, 0)::BIGINT AS n_cand,
        coalesce(n_cand_appended, 0)::BIGINT AS n_cand_appended,
        coalesce(n_dups, 0)::BIGINT AS n_dups, best_jaccard, dup_of,
        CASE WHEN dup_of IS NULL THEN 'keep' ELSE 'drop' END AS verdict
      FROM documents d
      LEFT JOIN cagg ON cagg.doc_new = d.doc_id
      LEFT JOIN dagg ON dagg.doc_new = d.doc_id
      WHERE d.doc_id % 10 < 2
      ORDER BY d.doc_id"""
    })

  val all: Seq[QueryDef] =
    Seq(q17, q18, q19, q20, q21, q38, q39, q48, q49, q57, q76, q81, q82,
      q90, q92, q93, q104, q111, q115, q118, q120, q122, q124, q140,
      q146, q148, q150, q151, q152, q154, q156, q157, q184, q190, q194,
      q201, q204, q246, q321, q336, q381, q473, q490, q491, q499, q500,
      q506, q529)

}
