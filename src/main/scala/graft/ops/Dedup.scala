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
  * point, all expressed as declarative Spark plans (no RDDs, no UDFs —
  * every expression is Catalyst-codegen-able):
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
  *  - q20 n-gram Jaccard (exact): inverted-index self-join on shingle.
  *                    Exact, finds every pair ≥ τ (any such pair shares a
  *                    shingle), cost bounded by posting-list skew — the
  *                    quadratic blowup lives only inside hot shingles
  *                    (mitigate at scale by dropping top-frequency shingles,
  *                    same as stopword pruning).
  *  - q21 embedding near-dup: cosine ≥ τ pairs over `embeddings`.
  *
  * Portability invariant (the DuckDB oracle must hash-match bit-exactly):
  * every hash is derived from md5 (identical hex in both engines) via
  * `h32(s)` = first 8 md5 hex chars as a BIGINT; all arithmetic stays in
  * exact int64; the only doubles are final ratios of two ints computed by
  * the same single division on both sides.
  */
object Dedup {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Fixtures.table(s, dir, "documents")

  // ---------- shared portable hash/shingle fragments -----------------

  /** Portable 32-bit string hash: first 8 hex chars of md5 as int64. */
  private def h32Spark(e: String): String =
    s"cast(conv(substring(md5($e), 1, 8), 16, 10) AS BIGINT)"
  private def h32Duck(e: String): String =
    s"('0x' || substring(md5($e), 1, 8))::BIGINT"

  /** Token 3-gram shingles, distinct. Docs with <3 tokens are excluded
    * upstream by a `size(toks) >= 3` filter (Spark `sequence` would go
    * descending on an empty range; DuckDB `range` is half-open).
    */
  private val shingleSpark =
    "array_distinct(transform(sequence(1, size(toks) - 2), " +
      "i -> concat_ws(' ', slice(toks, i, 3))))"
  private val shingleDuck =
    "list_distinct(list_transform(range(1, len(toks) - 1), " +
      "i -> array_to_string(list_slice(toks, i, i + 2), ' ')))"

  /** MinHash constants: 16 universal-hash functions (a*h + b) mod P over
    * the h32 shingle hashes; 8 bands × 2 rows. a*h ≤ 3821 * 2^32 ≈ 1.6e13
    * so all arithmetic stays exact in int64.
    */
  private val P = 2147483647L
  private val A = Seq(1117, 2971, 3343, 577, 2129, 1847, 919, 3457,
    1231, 2689, 353, 1511, 2017, 761, 3821, 1433)
  private val B = Seq(407, 2011, 89, 1777, 563, 3229, 1399, 241,
    3089, 677, 1901, 2503, 131, 3581, 827, 2273)
  private val NBands = 8 // × 2 rows per band = 16 hashes

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
        md5(trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
          " +", " "))).as("content_key"))
      .groupBy(col("content_key"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_id"))
      .orderBy("canonical_id"),
    Some("""SELECT md5(trim(regexp_replace(
        regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        ' +', ' ', 'g'))) AS content_key,
      count(*) AS n_docs, min(doc_id) AS canonical_id
      FROM documents GROUP BY 1 ORDER BY canonical_id"""))

  // ---------- q18: MinHash + LSH near-dup pairs -----------------------

  private def minhashSpark: String =
    A.zip(B).map { case (a, b) =>
      s"array_min(transform(hh, h -> (h * $a + $b) % $P))"
    }.mkString("array(", ", ", ")")

  private def minhashDuck: String =
    A.zip(B).map { case (a, b) =>
      s"list_min(list_transform(hh, h -> (h * $a + $b) % $P))"
    }.mkString("[", ", ", "]")

  /** Shingle-set prep shared by q18/q19/q20 (Spark side). */
  private def shingled(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"), expr(shingleSpark).as("sh"))

  private val shingledDuckCte =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE len(string_split(text, ' ')) >= 3),
    sh AS (SELECT doc_id, $shingleDuck AS sh FROM toks)"""

  private val q18 = QueryDef(
    "q18_minhash_lsh",
    (s, dir) => {
      val sh = shingled(s, dir)
      val mh = sh
        .select(col("doc_id"), col("sh"),
          expr(s"transform(sh, s -> ${h32Spark("s")})").as("hh"))
        .select(col("doc_id"), col("sh"), expr(minhashSpark).as("mh"))
      // band key: md5 over the band's minhash rows; posexplode → the
      // LSH shuffle key (band, bkey). Identical docs collide in every
      // band; j≈0.9 pairs collide in ≥1 band w.p. ~1 - (1-0.81)^8.
      val bandCols = (0 until NBands).map { bnd =>
        expr(s"md5(concat_ws(',', cast(element_at(mh, ${2 * bnd + 1}) AS STRING), " +
          s"cast(element_at(mh, ${2 * bnd + 2}) AS STRING)))")
      }
      val bands = mh.select(col("doc_id"),
        posexplode(array(bandCols: _*)).as(Seq("band", "bkey")))
      val cand = bands.alias("a")
        .join(bands.alias("b"),
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      // verify candidates with exact Jaccard (set ops on the distinct
      // shingle arrays; counts are ints, one double division at the end).
      cand
        .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          (size(array_intersect(col("sha"), col("shb"))).cast("double")
            / size(array_union(col("sha"), col("shb")))).as("jaccard"))
        .where(col("jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    },
    Some {
      val bandSelects = (0 until NBands).map { bnd =>
        s"SELECT doc_id, $bnd AS band, md5(mh[${2 * bnd + 1}]::VARCHAR || ',' || " +
          s"mh[${2 * bnd + 2}]::VARCHAR) AS bkey FROM mh"
      }.mkString(" UNION ALL ")
      s"""WITH $shingledDuckCte,
      hh AS (SELECT doc_id, sh,
        list_transform(sh, s -> ${h32Duck("s")}) AS hh FROM sh),
      mh AS (SELECT doc_id, sh, $minhashDuck AS mh FROM hh),
      bands AS ($bandSelects),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b,
        len(list_intersect(sa.sh, sb.sh))::DOUBLE
          / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
      FROM cand
      JOIN sh sa ON sa.doc_id = doc_a
      JOIN sh sb ON sb.doc_id = doc_b
      WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE
          / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.5
      ORDER BY doc_a, doc_b"""
    })

  // ---------- q19: SimHash signatures + banded Hamming pairs ----------

  /** 32-bit SimHash over the shingle h32 hashes: bit b is set iff more
    * than half the shingles have bit b set. Generated as 32 literal
    * terms so Spark and DuckDB evaluate the exact same integer
    * expression (no engine-specific bit intrinsics in the signature).
    */
  private def simhashTerms(div: String, lenF: String, filterF: String,
      bigLit: Long => String): String =
    (0 until 32).map { b =>
      val pow = 1L << b
      s"(CASE WHEN 2 * $lenF($filterF(hh, h -> (h $div $pow) % 2 = 1)) " +
        s"> $lenF(hh) THEN ${bigLit(pow)} ELSE ${bigLit(0L)} END)"
    }.mkString(" + ")

  private val simhashSpark =
    simhashTerms("div", "size", "filter", v => s"${v}L")
  private val simhashDuck =
    simhashTerms("//", "len", "list_filter", v => s"$v::BIGINT")

  private val q19 = QueryDef(
    "q19_simhash",
    (s, dir) => {
      val sig = shingled(s, dir)
        .select(col("doc_id"),
          expr(s"transform(sh, s -> ${h32Spark("s")})").as("hh"))
        .select(col("doc_id"), expr(simhashSpark).as("simhash"))
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
      val blockSelects = (0 until 4).map { i =>
        s"SELECT doc_id, simhash, $i AS blk, " +
          s"(simhash // ${1L << (8 * i)}) % 256 AS bval FROM sig"
      }.mkString(" UNION ALL ")
      s"""WITH $shingledDuckCte,
      hh AS (SELECT doc_id,
        list_transform(sh, s -> ${h32Duck("s")}) AS hh FROM sh),
      sig AS (SELECT doc_id, $simhashDuck AS simhash FROM hh),
      blocks AS ($blockSelects)
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        bit_count(xor(a.simhash, b.simhash))::INT AS hamming
      FROM blocks a JOIN blocks b
      ON a.blk = b.blk AND a.bval = b.bval AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
      ORDER BY doc_a, doc_b"""
    })

  // ---------- q20: exact n-gram Jaccard via inverted index ------------

  private val q20 = QueryDef(
    "q20_ngram_jaccard",
    (s, dir) => {
      val sh = shingled(s, dir)
      val sizes = sh.select(col("doc_id"), size(col("sh")).as("n"))
      val inv = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
      // inverted-index self-join: |A ∩ B| = #common shingles; shuffle is
      // on the shingle key so cost tracks posting-list sizes, not |docs|².
      val inter = inv.alias("a")
        .join(inv.alias("b"),
          col("a.shingle") === col("b.shingle")
            && col("a.doc_id") < col("b.doc_id"))
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
      sizes AS (SELECT doc_id, len(sh) AS n FROM sh),
      inv AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          count(*) AS n_common
        FROM inv a JOIN inv b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT doc_a, doc_b,
        n_common::DOUBLE / (sa.n + sb.n - n_common) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= 0.8
      ORDER BY doc_a, doc_b"""))

  // ---------- q21: embedding-cosine near-dup pairs --------------------

  /** Cosine as three sequential left folds (dot, |a|², |b|²) so Spark's
    * `aggregate` and DuckDB's `list_reduce` see the identical operation
    * order → bit-identical doubles. Floats are widened to double before
    * any arithmetic (exact).
    */
  private[graft] val cosSpark: String =
    "aggregate(zip_with(ea, eb, (x, y) -> cast(x AS DOUBLE) * cast(y AS DOUBLE)), cast(0 AS DOUBLE), (acc, v) -> acc + v) / " +
      "sqrt(aggregate(transform(ea, x -> cast(x AS DOUBLE) * cast(x AS DOUBLE)), cast(0 AS DOUBLE), (acc, v) -> acc + v) * " +
      "aggregate(transform(eb, x -> cast(x AS DOUBLE) * cast(x AS DOUBLE)), cast(0 AS DOUBLE), (acc, v) -> acc + v))"

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
    */
  private val q21 = QueryDef(
    "q21_embedding_neardup",
    (s, dir) => {
      val e = Fixtures.table(s, dir, "embeddings")
      val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
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

  val all: Seq[QueryDef] = Seq(q17, q18, q19, q20, q21)
}
