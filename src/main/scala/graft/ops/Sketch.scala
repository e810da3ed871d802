package graft.ops

import graft.{Fixtures, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoder

/** Sketch / sampling / order-statistic operators.
  *
  * Design rule for this engine: prefer DETERMINISTIC sketches. Spark's
  * approx_count_distinct (HLL++) and DuckDB's approx sketches are
  * engine-specific and can never hash-match an oracle; the KMV
  * (k-minimum-values) estimator delivers the same accuracy class from
  * pure relational operations on a portable hash, so the estimate
  * itself is reproducible bit-for-bit anywhere — which also makes
  * pipelines auditable (re-running the sketch on the same data yields
  * the same number, a property HLL registers shared across partitions
  * do not guarantee across engines).
  */
object Sketch {
  import Portable.{h32Spark, h32Duck}

  // ---------- q35: KMV distinct-count sketch --------------------------

  private val K = 64

  /** KMV sketch state: distinct-hash count + the K smallest hashes. */
  final case class KmvBuf(n: Long, mins: Seq[Long])

  /** Bounded k-minimum-values partial aggregate (the TopK Aggregator
    * pattern with ascending order): the buffer never exceeds K hashes,
    * so map-side partials reduce each partition's contribution to ≤ K
    * values per group BEFORE the shuffle — vs the window-sort form,
    * which shuffles and sorts the whole distinct-hash set per group.
    */
  final class KmvAgg(k: Int) extends Aggregator[Long, KmvBuf, KmvBuf] {
    private def bound(xs: Seq[Long]): Seq[Long] = xs.sorted.take(k)
    override def zero: KmvBuf = KmvBuf(0L, Seq.empty)
    override def reduce(b: KmvBuf, h: Long): KmvBuf =
      KmvBuf(b.n + 1, bound(b.mins :+ h))
    override def merge(a: KmvBuf, b: KmvBuf): KmvBuf =
      KmvBuf(a.n + b.n, bound(a.mins ++ b.mins))
    override def finish(r: KmvBuf): KmvBuf = r
    override def bufferEncoder: Encoder[KmvBuf] = ExpressionEncoder[KmvBuf]()
    override def outputEncoder: Encoder[KmvBuf] = ExpressionEncoder[KmvBuf]()
  }

  /** Distinct-count estimate per order priority: keep each group's K
    * smallest distinct value-hashes; estimate = (K−1)·2³² / kth-min.
    * Distributed shape: distinct (one shuffle) → bounded k-min partial
    * aggregation (KmvAgg above) — the shuffle after partials carries
    * ≤ K hashes per (partition, group), never the full distinct set,
    * which is what makes the sketch O(K·groups) at 100 TB. The estimate
    * arithmetic stays in SQL so it is textually identical to the
    * oracle's (same double ops, bit-exact).
    */
  private val q35 = QueryDef(
    "q35_kmv_distinct",
    (s, dir) => {
      import s.implicits._
      val o = Fixtures.table(s, dir, "orders")
      val exact = o.groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_exact"))
      val h = o.select(col("o_orderpriority"),
        expr(h32Spark("cast(o_custkey AS STRING)")).as("h")).distinct()
      val est = h.as[(String, Long)]
        .groupByKey(_._1).mapValues(_._2)
        .agg(new KmvAgg(K).toColumn.name("kmv"))
        .toDF("o_orderpriority", "kmv")
        .select(col("o_orderpriority"), col("kmv.n").as("nd"),
          expr(s"try_element_at(kmv.mins, $K)").as("kth"))
        .select(col("o_orderpriority"),
          expr(s"CASE WHEN nd >= $K THEN ${K - 1}.0 * 4294967296.0 / kth " +
            "ELSE cast(nd AS DOUBLE) END").as("n_est"))
      exact.join(est, "o_orderpriority").orderBy("o_orderpriority")
    },
    Some(s"""WITH exact AS (SELECT o_orderpriority,
        count(DISTINCT o_custkey) AS n_exact FROM orders GROUP BY 1),
      h AS (SELECT DISTINCT o_orderpriority,
        ${h32Duck("o_custkey::VARCHAR")} AS h FROM orders),
      r AS (SELECT o_orderpriority, h,
        row_number() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn,
        count(*) OVER (PARTITION BY o_orderpriority) AS nd FROM h),
      est AS (SELECT o_orderpriority,
        CASE WHEN max(nd) >= $K THEN
          ${K - 1}.0 * 4294967296.0 / max(CASE WHEN rn = $K THEN h END)
        ELSE cast(max(nd) AS DOUBLE) END AS n_est
        FROM r GROUP BY 1)
      SELECT exact.o_orderpriority, n_exact, n_est
      FROM exact JOIN est USING (o_orderpriority)
      ORDER BY o_orderpriority"""))

  // ---------- q36: exact median via rank selection --------------------

  /** Lower median of o_totalprice per order status — exact order
    * statistic by row_number selection (no interpolation, so no
    * engine-specific percentile formula can diverge). One sort per
    * group partition; at scale use two passes (count, then select the
    * kth by global sort position) or a t-digest if approximation is
    * acceptable.
    */
  private val q36 = QueryDef(
    "q36_median",
    (s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_totalprice"))
      val wAll = Window.partitionBy(col("o_orderstatus"))
      Fixtures.table(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wAll))
        .groupBy(col("o_orderstatus"))
        .agg(max(expr("CASE WHEN rn = (n + 1) div 2 THEN o_totalprice END"))
          .as("median_price"), max(col("n")).as("n_orders"))
        .orderBy("o_orderstatus")
    },
    Some("""WITH r AS (SELECT o_orderstatus, o_totalprice,
        row_number() OVER (PARTITION BY o_orderstatus
          ORDER BY o_totalprice) AS rn,
        count(*) OVER (PARTITION BY o_orderstatus) AS n FROM orders)
      SELECT o_orderstatus,
        max(CASE WHEN rn = (n + 1) // 2 THEN o_totalprice END) AS median_price,
        max(n) AS n_orders
      FROM r GROUP BY 1 ORDER BY o_orderstatus"""))

  // ---------- q37: deterministic train/val/test split -----------------

  /** Hash-based corpus split (80/10/10) — the standard way to assign
    * training splits so membership is a pure function of the document
    * id: stable across runs, engines, and corpus growth (adding docs
    * never reassigns existing ones). Pure projection + small agg.
    */
  private val q37 = QueryDef(
    "q37_split_assign",
    (s, dir) => Fixtures.table(s, dir, "documents")
      .select(col("lang"), expr(Portable.splitCaseSpark).as("split"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "split"),
    Some(s"""SELECT lang, ${Portable.splitCaseDuck} AS split,
      count(*) AS n
      FROM documents GROUP BY 1, 2 ORDER BY lang, split"""))

  // ---------- q107: split token balance -------------------------------

  /** Token-level balance of the q37 train/val/test assignment — the
    * check that the 80/10/10 DOCUMENT split also holds in TOKENS
    * (what the training job actually consumes: a split whose val
    * slice got the long documents is 10 % of docs but not 10 % of
    * compute). Same pure-hash split expression as q37 (Portable —
    * the one definition both queries share), token counts are exact
    * ints, share is one division against a 1-row broadcast total.
    * One corpus pass, 3 output rows.
    */
  private val q107 = QueryDef(
    "q107_split_token_balance",
    (s, dir) => {
      val perSplit = Fixtures.table(s, dir, "documents")
        .select(expr(Portable.splitCaseSpark).as("split"),
          size(split(col("text"), " ")).cast("long").as("n_toks"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      val tot = perSplit.agg(sum(col("n_tokens")).as("t_tokens"))
      perSplit.crossJoin(broadcast(tot))
        .select(col("split"), col("n_docs"), col("n_tokens"),
          (col("n_tokens").cast("double") / col("t_tokens"))
            .as("token_share"))
        .orderBy("split")
    },
    Some(s"""WITH per AS (SELECT ${Portable.splitCaseDuck} AS split,
        count(*) AS n_docs,
        sum(len(string_split(text, ' '))) AS n_tokens
      FROM documents GROUP BY 1),
      tot AS (SELECT sum(n_tokens) AS t_tokens FROM per)
      SELECT split, n_docs::BIGINT AS n_docs, n_tokens::BIGINT AS n_tokens,
        n_tokens::DOUBLE / t_tokens AS token_share
      FROM per, tot ORDER BY split"""))

  // ---------- q51: deterministic stratified sample --------------------

  /** Per-stratum (language) hash sampling at a fixed rate — how an
    * eval/inspection subset is carved from a corpus so that membership
    * is a pure function of the document id: re-running yields the same
    * sample, corpus growth never reassigns existing docs, and every
    * stratum is sampled at the same rate regardless of its size (unlike
    * a global bernoulli sample, which under-represents small strata by
    * chance). The salt ("sample_") decorrelates this hash from q37's
    * split hash — a doc's sample membership is independent of its
    * train/val/test assignment. Shuffle-free until the final tiny
    * per-stratum count aggregation.
    */
  private val SampleRatePct = 10

  private val q51 = QueryDef(
    "q51_stratified_sample",
    (s, dir) => Fixtures.table(s, dir, "documents")
      .select(col("lang"),
        (expr(h32Spark("concat('sample_', doc_id)")) % 100 < SampleRatePct)
          .cast("int").as("in_sample"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("in_sample") === 1, 1)).as("n_sampled"))
      .orderBy("lang"),
    Some(s"""SELECT lang, count(*) AS n_docs,
      count(CASE WHEN ${h32Duck("'sample_' || doc_id")} % 100
        < $SampleRatePct THEN 1 END) AS n_sampled
      FROM documents GROUP BY lang ORDER BY lang"""))

  // ---------- q63: count-min-sketch heavy hitters ----------------------

  private val CmsDepth = 4
  private val CmsWidth = 1024

  /** Heavy-hitter estimation through a count-min sketch: every token
    * occurrence increments `CmsDepth` counters (one per hash row), the
    * estimate for a token is the MIN of its counters, and the sketch is
    * a FIXED 4×1024 table regardless of corpus size — that bounded
    * state is the whole point: at 100 TB the sketch build is one
    * map-side-combined aggregation into ≤4096 cells, and merging
    * per-partition sketches is cell-wise addition (exactly what the
    * hash aggregate does). Estimates are biased up only (collisions
    * add), never down — the classic CMS guarantee, preserved here
    * because both engines use the identical portable h32 rows.
    *
    * Candidates to probe are the distinct vocabulary (exact here so the
    * oracle can replicate; a production pairing keeps a per-partition
    * top-K heap alongside the sketch instead). Top-20 under a total
    * (estimate DESC, token) order so LIMIT is deterministic.
    */
  private val q63 = QueryDef(
    "q63_cms_heavy_hitters",
    (s, dir) => {
      val toks = Fixtures.table(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) > 0)
      def rows(df: DataFrame): DataFrame = df.select(col("tok"),
        posexplode(array((0 until CmsDepth).map(r =>
          expr(s"${h32Spark(s"concat('cms$r|', tok)")} % $CmsWidth")): _*))
          .as(Seq("r", "bucket")))
      val sketch = rows(toks)
        .groupBy(col("r"), col("bucket")).agg(count(lit(1)).as("c"))
      rows(toks.distinct())
        .join(sketch, Seq("r", "bucket"))
        .groupBy(col("tok")).agg(min(col("c")).as("est"))
        .orderBy(col("est").desc, col("tok")).limit(20)
    },
    Some {
      val bucket = (side: String) => (0 until CmsDepth).map(r =>
        s"SELECT tok, $r AS r, " +
          s"${h32Duck(s"'cms$r|' || tok")} % $CmsWidth AS bucket " +
          s"FROM $side").mkString(" UNION ALL ")
      s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok
          FROM documents),
        occ AS (SELECT tok FROM toks WHERE len(tok) > 0),
        cand AS (SELECT DISTINCT tok FROM occ),
        srows AS (${bucket("occ")}),
        sketch AS (SELECT r, bucket, count(*)::BIGINT AS c
          FROM srows GROUP BY 1, 2),
        crows AS (${bucket("cand")})
        SELECT cr.tok, min(sk.c)::BIGINT AS est
        FROM crows cr JOIN sketch sk USING (r, bucket)
        GROUP BY cr.tok ORDER BY est DESC, tok LIMIT 20"""
    })

  // ---------- q66: Bloom-filter data skipping -------------------------

  private val BloomBits = 8192
  private val BloomK = 3

  /** Bloom-filter membership pre-filter — the data-skipping shape behind
    * runtime row-level filtering: hash the BUILDING-segment customer
    * keys into a `BloomK`×salted, `BloomBits`-position filter, then
    * probe every order and count, per priority, how many orders the
    * filter passes vs. the exact semi-join — surfacing the
    * false-positive overshoot explicitly (`n_false_pos`), which is the
    * number every skipping layer has to budget for. The filter is built
    * on the portable h32 so both engines compute identical positions,
    * making even the false positives deterministic (engine-native bloom
    * builds — Spark's BloomFilterAggregate, DuckDB's — could never
    * cross-engine match).
    *
    * Distributed shape: the position table is ≤ `BloomBits` small ints
    * built from the dimension side and broadcast; each probe row joins
    * its `BloomK` positions against it map-side (membership = all K
    * present), so the fact table is filtered without shuffling — the
    * production form packs the same positions into a bitmap broadcast
    * variable, the relational form here keeps the oracle exact.
    */
  private val q66 = QueryDef(
    "q66_bloom_skipping",
    (s, dir) => {
      def posCols(key: String) = (0 until BloomK).map(i =>
        expr(s"${h32Spark(s"concat('b${i}_', cast($key AS STRING))")} % $BloomBits"))
      val seg = Fixtures.table(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val posTable = seg
        .select(explode(array(posCols("c_custkey"): _*)).as("pos")).distinct()
      val orders = Fixtures.table(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_custkey")
      val nBloom = orders
        .withColumn("pos", explode(array(posCols("o_custkey"): _*)))
        .join(broadcast(posTable), "pos")
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(count(lit(1)).as("nh"))
        .filter(col("nh") === BloomK)
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n_bloom"))
      val nExact = orders
        .join(broadcast(seg), col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n_exact"))
      nBloom.join(nExact, Seq("o_orderpriority"), "full_outer")
        .select(col("o_orderpriority"),
          coalesce(col("n_bloom"), lit(0L)).as("n_bloom"),
          coalesce(col("n_exact"), lit(0L)).as("n_exact"),
          (coalesce(col("n_bloom"), lit(0L)) -
            coalesce(col("n_exact"), lit(0L))).as("n_false_pos"))
        .orderBy("o_orderpriority")
    },
    Some {
      val dpos = (i: Int, key: String) =>
        s"${h32Duck(s"'b${i}_' || $key::VARCHAR")} % $BloomBits"
      val posUnion = (0 until BloomK).map(i =>
        s"SELECT ${dpos(i, "c_custkey")} AS pos FROM seg").mkString(" UNION ")
      val member = (0 until BloomK).map(i =>
        s"${dpos(i, "o_custkey")} IN (SELECT pos FROM pos)").mkString(" AND ")
      s"""WITH seg AS (SELECT c_custkey FROM customer
          WHERE c_mktsegment = 'BUILDING'),
        pos AS ($posUnion),
        bloom AS (SELECT o_orderpriority, count(*)::BIGINT AS n_bloom
          FROM orders WHERE $member GROUP BY 1),
        exact AS (SELECT o_orderpriority, count(*)::BIGINT AS n_exact
          FROM orders WHERE o_custkey IN (SELECT c_custkey FROM seg)
          GROUP BY 1)
        SELECT o_orderpriority,
          COALESCE(n_bloom, 0)::BIGINT AS n_bloom,
          COALESCE(n_exact, 0)::BIGINT AS n_exact,
          (COALESCE(n_bloom, 0) - COALESCE(n_exact, 0))::BIGINT
            AS n_false_pos
        FROM bloom FULL JOIN exact USING (o_orderpriority)
        ORDER BY o_orderpriority"""
    })

  // ---------- q67: exact percentile spread ----------------------------

  /** p50/p90/p99 of order value per priority — exact `percentile_disc`
    * order statistics by row_number selection at position ⌈p·n⌉, the
    * same selection-not-interpolation rule as q36 (interpolating
    * percentiles mix doubles in engine-specific formulas and can never
    * hash-match; a selected value is a value that exists in the data,
    * bit-identical everywhere). All three percentiles come off ONE
    * window sort — Catalyst evaluates rn and n on the same
    * (priority → price) shuffle+sort pass, and the p-selection is a
    * conditional aggregate over it, so adding percentiles is free.
    * At 100 TB swap the per-group sort for the two-pass kth-selection
    * (count, then select by global sort position) exactly as q36 notes.
    */
  private val q67 = QueryDef(
    "q67_percentiles",
    (s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice"))
      val wAll = Window.partitionBy(col("o_orderpriority"))
      Fixtures.table(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wAll))
        .groupBy(col("o_orderpriority"))
        .agg(
          max(expr("CASE WHEN rn = (n + 1) div 2 THEN o_totalprice END"))
            .as("p50"),
          max(expr("CASE WHEN rn = (9 * n + 9) div 10 THEN o_totalprice END"))
            .as("p90"),
          max(expr("CASE WHEN rn = (99 * n + 99) div 100 THEN o_totalprice END"))
            .as("p99"),
          max(col("n")).as("n_orders"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH r AS (SELECT o_orderpriority, o_totalprice,
        row_number() OVER (PARTITION BY o_orderpriority
          ORDER BY o_totalprice) AS rn,
        count(*) OVER (PARTITION BY o_orderpriority) AS n FROM orders)
      SELECT o_orderpriority,
        max(CASE WHEN rn = (n + 1) // 2 THEN o_totalprice END) AS p50,
        max(CASE WHEN rn = (9 * n + 9) // 10 THEN o_totalprice END) AS p90,
        max(CASE WHEN rn = (99 * n + 99) // 100 THEN o_totalprice END) AS p99,
        max(n) AS n_orders
      FROM r GROUP BY 1 ORDER BY o_orderpriority"""))

  // ---------- q79: deterministic training-order shuffle ---------------

  /** Sharded training-order shuffle — how a 100 TB corpus is put into
    * "random" order for training WITHOUT a global sort: shard =
    * hash(doc) mod NShards routes each doc to a shard (one shuffle,
    * uniform by construction), and within a shard the read order is a
    * second independent hash. A trainer streams shards in index order
    * and rows in rank order and sees a deterministic, reproducible
    * permutation; re-running the pipeline — or any engine — yields the
    * identical order, and appending docs never reorders existing
    * (shard, rank<new) prefixes a checkpointed trainer already
    * consumed past. The window rank sorts per-shard partitions only —
    * corpus/NShards rows each — never a total order over the corpus.
    * Salts ("shard_"/"ord_") decorrelate both hashes from each other
    * and from q37/q51's split/sample hashes.
    */
  private val NShards = 8

  private val q79 = QueryDef(
    "q79_train_shuffle",
    (s, dir) => {
      val w = Window.partitionBy(col("shard"))
        .orderBy(col("sort_key"), col("doc_id"))
      Fixtures.table(s, dir, "documents")
        .select(col("doc_id"),
          (expr(h32Spark("concat('shard_', doc_id)")) % NShards).as("shard"),
          expr(h32Spark("concat('ord_', doc_id)")).as("sort_key"))
        .withColumn("rank", row_number().over(w))
        .select(col("doc_id"), col("shard"), col("rank"))
        .orderBy("shard", "rank")
    },
    Some(s"""WITH keyed AS (SELECT doc_id,
        ${h32Duck("'shard_' || doc_id")} % $NShards AS shard,
        ${h32Duck("'ord_' || doc_id")} AS sort_key
      FROM documents)
      SELECT doc_id, shard,
        row_number() OVER (PARTITION BY shard
          ORDER BY sort_key, doc_id) AS rank
      FROM keyed ORDER BY shard, rank"""))

  // ---------- q85: HyperLogLog distinct-count sketch ------------------

  /** HLL distinct estimate per order priority, beside q35's KMV and the
    * exact count — the register-based estimator (Flajolet et al. 2007)
    * from pure relational ops on the portable hash, so the estimate is
    * bit-reproducible on any engine (the property Spark's native
    * approx_count_distinct HLL++ registers do not give across engines).
    *
    * m = 64 registers: reg = h mod 64, and the rank is the position of
    * the leftmost 1-bit in the remaining 26 hash bits — computed as
    * 27 - length(bin(w)), an exact string-length, never a float log2
    * (whose last-ulp behavior differs per libm at exact powers of 2).
    * Distributed shape: one shuffle keyed (group, reg) with map-side
    * partial max — each partition contributes ≤ 64 rows per group
    * before the exchange, the same bounded-state property as q35 —
    * then a 64-row-per-group final fold. At 100 TB the sketch pass
    * moves O(64 · groups · partitions) rows total, independent of
    * cardinality.
    *
    * Double determinism: every 2^-rank term and their sum are exact
    * (≤ 33 mantissa bits used), the raw estimate is one literal-over-
    * exact division, and only the small-range ln() correction needs a
    * round(…, 6) to pin libm's last ulp on both engines.
    */
  private val q85 = QueryDef(
    "q85_hll_distinct",
    (s, dir) => {
      val o = Fixtures.table(s, dir, "orders")
      val exact = o.groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_exact"))
      val est = o
        .select(col("o_orderpriority"),
          expr(h32Spark("cast(o_custkey AS STRING)")).as("h"))
        .select(col("o_orderpriority"), (col("h") % 64).as("reg"),
          expr("h div 64").as("w"))
        .select(col("o_orderpriority"), col("reg"),
          expr("CASE WHEN w > 0 THEN 27 - length(bin(w)) ELSE 27 END")
            .as("rho"))
        .groupBy(col("o_orderpriority"), col("reg"))
        .agg(max(col("rho")).as("mr"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(expr("power(0.5, mr)")).as("zp"),
          count(lit(1)).as("nreg"))
        .select(col("o_orderpriority"),
          expr("zp + (64 - nreg) * 1.0").as("z"),
          expr("64 - nreg").as("v"))
        .select(col("o_orderpriority"),
          expr("CASE WHEN 0.709 * 4096.0 / z <= 160.0 AND v > 0 " +
            "THEN round(64.0 * ln(64.0 / v), 6) " +
            "ELSE round(0.709 * 4096.0 / z, 6) END").as("n_est"))
      exact.join(est, "o_orderpriority").orderBy("o_orderpriority")
    },
    Some(s"""WITH exact AS (SELECT o_orderpriority,
        count(DISTINCT o_custkey) AS n_exact FROM orders GROUP BY 1),
      h AS (SELECT o_orderpriority,
        ${h32Duck("o_custkey::VARCHAR")} AS h FROM orders),
      r AS (SELECT o_orderpriority, h % 64 AS reg,
        CASE WHEN h // 64 > 0 THEN 27 - length(bin(h // 64))
          ELSE 27 END AS rho FROM h),
      m AS (SELECT o_orderpriority, reg, max(rho) AS mr
        FROM r GROUP BY 1, 2),
      z AS (SELECT o_orderpriority,
        sum(power(0.5, mr)) + (64 - count(*)) * 1.0 AS z,
        64 - count(*) AS v FROM m GROUP BY 1),
      est AS (SELECT o_orderpriority,
        CASE WHEN 0.709 * 4096.0 / z <= 160.0 AND v > 0
          THEN round(64.0 * ln(64.0 / v), 6)
          ELSE round(0.709 * 4096.0 / z, 6) END AS n_est FROM z)
      SELECT exact.o_orderpriority, n_exact, n_est
      FROM exact JOIN est USING (o_orderpriority)
      ORDER BY o_orderpriority"""))

  // ---------- q86: weighted sample (sequential Poisson) ---------------

  /** Length-weighted document sample per language — Ohlsson's
    * sequential Poisson sampling: order by u/w (u a per-doc uniform
    * from the portable hash, w = n_chars) and take the first K per
    * stratum, giving inclusion probability ≈ proportional to size —
    * the standard way a training mix over-samples long documents
    * without replacement. The priority is ONE division of two exact
    * int64s (correctly rounded, identical on any IEEE engine) — never
    * the pow(u, 1/w) exponential-race form, whose libm tail could
    * reorder near-ties differently per engine. Deterministic: same
    * corpus → same sample, on any engine, any run.
    *
    * Shape: one shuffle on lang, per-partition sort for the window
    * rank. At 100 TB replace the full window sort with q30's bounded
    * top-k Aggregator keyed by lang (same contract, ≤ K rows per
    * group past the partial agg); the fixture-scale window form keeps
    * the oracle SQL textually parallel.
    */
  private val SpsK = 40

  private val q86 = QueryDef(
    "q86_weighted_sample",
    (s, dir) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("priority"), col("doc_id"))
      Fixtures.table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          (expr(h32Spark("concat('sps_', doc_id)")) / col("n_chars"))
            .as("priority"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= SpsK)
        .select(col("lang"), col("rk"), col("doc_id"), col("n_chars"))
        .orderBy("lang", "rk")
    },
    Some(s"""WITH keyed AS (SELECT doc_id, lang, n_chars,
        ${h32Duck("'sps_' || doc_id")} / n_chars AS priority
      FROM documents),
      ranked AS (SELECT lang, doc_id, n_chars,
        row_number() OVER (PARTITION BY lang
          ORDER BY priority, doc_id) AS rk
      FROM keyed)
      SELECT lang, rk, doc_id, n_chars FROM ranked
      WHERE rk <= $SpsK ORDER BY lang, rk"""))

  // ---------- q178: winsorized mean -----------------------------------

  /** Winsorized vs raw mean of order value per priority — the robust
    * location estimate a metrics pipeline reports when a few huge
    * orders would otherwise swing the mean. Boundaries are EXACT
    * rank-statistics (q67's row_number contract, so both engines pick
    * the identical element, no interpolation); clamping is
    * least/greatest; both means sum DECIMAL terms so accumulation
    * order can't perturb the double result. Shape at fixture scale:
    * one per-priority window sort + a broadcast of the 5-row boundary
    * table back onto the scan. At 100 TB the boundary pass switches to
    * the q149 two-pass boundary-broadcast variant (per-shard sorts
    * only) — the clamp-and-mean pass is unchanged, one scan either
    * way.
    */
  private val q178 = QueryDef(
    "q178_winsorized_mean",
    (s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"))
      val wAll = Window.partitionBy(col("o_orderpriority"))
      val bounds = Fixtures.table(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wAll))
        .groupBy(col("o_orderpriority"))
        .agg(
          max(expr("CASE WHEN rn = greatest(1L, (5 * n + 5) div 100) " +
            "THEN o_totalprice END")).as("lo"),
          max(expr("CASE WHEN rn = greatest(1L, (95 * n + 95) div 100) " +
            "THEN o_totalprice END")).as("hi"))
      Fixtures.table(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_totalprice"))
        .join(broadcast(bounds), "o_orderpriority")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), max(col("lo")).as("lo"),
          max(col("hi")).as("hi"),
          // r16 scaled-int64 (the dsum pattern): the clamp of an exact
          // 2-decimal price by 2-decimal bounds is an exact 2-decimal
          // value, so floor(v·100+0.5) recovers the integer the
          // DECIMAL(18,4) cast produced without per-row BigDecimal;
          // descale once per group, exactly, same doubles out
          sum(expr("CAST(floor(least(greatest(o_totalprice, lo), hi) " +
            "* 100 + 0.5) AS BIGINT)")
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .as("wsuml"),
          sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .as("rsuml"))
        .select(col("o_orderpriority"), col("n_orders"), col("lo"),
          col("hi"),
          ((col("wsuml") / lit(100)).cast("double")
            / col("n_orders").cast("double")).as("wins_mean"),
          ((col("rsuml") / lit(100)).cast("double")
            / col("n_orders").cast("double")).as("raw_mean"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH r AS (SELECT o_orderpriority, o_totalprice,
          row_number() OVER (PARTITION BY o_orderpriority
            ORDER BY o_totalprice) AS rn,
          count(*) OVER (PARTITION BY o_orderpriority) AS n FROM orders),
      b AS (SELECT o_orderpriority,
          max(CASE WHEN rn = greatest(1, (5 * n + 5) // 100)
            THEN o_totalprice END) AS lo,
          max(CASE WHEN rn = greatest(1, (95 * n + 95) // 100)
            THEN o_totalprice END) AS hi
        FROM r GROUP BY 1)
      SELECT o.o_orderpriority, count(*) AS n_orders,
        max(lo) AS lo, max(hi) AS hi,
        cast(sum(cast(least(greatest(o_totalprice, lo), hi)
          AS DECIMAL(18,4))) AS DOUBLE) / count(*)::DOUBLE AS wins_mean,
        cast(sum(cast(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
          / count(*)::DOUBLE AS raw_mean
      FROM orders o JOIN b USING (o_orderpriority)
      GROUP BY 1 ORDER BY o_orderpriority"""))

  // ---------- q180: reshard movement audit (mod vs rendezvous) ---------

  /** How much data MOVES when the shard count grows 16 → 17, under the
    * two assignment functions a 100 TB pipeline actually chooses
    * between: mod-N (moves ~1−1/17 ≈ 94 % of keys — every key whose
    * hash changes residue) and rendezvous/HRW hashing (argmax over
    * per-shard hashes — only keys whose argmax IS the new shard move,
    * ~1/17 ≈ 6 %). The audit computes both movement fractions exactly
    * so the migration cost of a planned reshard is a measured number,
    * not folklore. Shape: pure projection — mod is two residues per
    * key; HRW explodes each key × 17 candidate shards (a narrow
    * constant fan-out, no shuffle until the 2-row aggregate) and ranks
    * inside the per-doc partition (17 rows) with a total tie-break
    * (h desc, s asc). Salts decorrelate from q37/q79's hashes.
    */
  private val q180 = QueryDef(
    "q180_reshard_audit",
    (s, dir) => {
      val ids = Fixtures.table(s, dir, "documents")
        .select(col("doc_id"),
          expr(Portable.h32Spark("concat('reb_', doc_id)")).as("hm"))
      val modMoved = ids.select(
        ((col("hm") % 16) =!= (col("hm") % 17)).cast("long").as("moved"))
        .agg(count(lit(1)).as("n_keys"), sum(col("moved")).as("n_moved"))
        .select(lit("mod").as("method"), col("n_keys"), col("n_moved"))
      val hrw = ids
        .select(col("doc_id"), explode(sequence(lit(0), lit(16))).as("s"))
        .select(col("doc_id"), col("s"),
          expr(Portable.h32Spark("concat('hrw_', doc_id, '_', s)")).as("h"))
      val w17 = Window.partitionBy(col("doc_id"))
        .orderBy(col("h").desc, col("s"))
      val win17 = hrw.withColumn("rn", row_number().over(w17))
        .where(col("rn") === 1)
        .select(col("doc_id"), col("s").as("s17"))
      val win16 = hrw.where(col("s") < 16)
        .withColumn("rn", row_number().over(w17))
        .where(col("rn") === 1)
        .select(col("doc_id"), col("s").as("s16"))
      val hrwMoved = win16.join(win17, "doc_id")
        .select((col("s16") =!= col("s17")).cast("long").as("moved"))
        .agg(count(lit(1)).as("n_keys"), sum(col("moved")).as("n_moved"))
        .select(lit("hrw").as("method"), col("n_keys"), col("n_moved"))
      hrwMoved.unionAll(modMoved)
        .select(col("method"), col("n_keys"), col("n_moved"),
          (col("n_moved").cast("double") / col("n_keys").cast("double"))
            .as("moved_frac"))
        .orderBy("method")
    },
    Some(s"""WITH ids AS (SELECT doc_id,
          ${Portable.h32Duck("'reb_' || doc_id")} AS hm FROM documents),
      modm AS (SELECT 'mod' AS method, count(*) AS n_keys,
          sum(CASE WHEN hm % 16 <> hm % 17 THEN 1 ELSE 0 END)::BIGINT
            AS n_moved FROM ids),
      cand AS (SELECT doc_id, s,
          ${Portable.h32Duck("'hrw_' || doc_id || '_' || s")} AS h
        FROM ids, (SELECT unnest(generate_series(0, 16)) AS s)),
      w17 AS (SELECT doc_id, s,
          row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, s) AS rn
        FROM cand),
      w16 AS (SELECT doc_id, s,
          row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, s) AS rn
        FROM cand WHERE s < 16),
      hrwm AS (SELECT 'hrw' AS method, count(*) AS n_keys,
          sum(CASE WHEN a.s <> b.s THEN 1 ELSE 0 END)::BIGINT AS n_moved
        FROM (SELECT doc_id, s FROM w16 WHERE rn = 1) a
        JOIN (SELECT doc_id, s FROM w17 WHERE rn = 1) b USING (doc_id))
      SELECT method, n_keys, n_moved,
        n_moved::DOUBLE / n_keys::DOUBLE AS moved_frac
      FROM (SELECT * FROM hrwm UNION ALL SELECT * FROM modm)
      ORDER BY method"""))

  // ---------- q195: Poisson-bootstrap confidence interval --------------

  /** Bootstrap CI for the mean order value via the POISSON bootstrap —
    * the resampling scheme that actually works distributed: instead of
    * drawing n rows with replacement (which needs global coordination),
    * each row independently receives a Poisson(1) replication weight
    * per resample, giving the same asymptotics with a row-local
    * projection. Weights are DETERMINISTIC — u = ((key mod P)·1117
    * + b·2971 + 407) mod P mod 1e6, the MinHash universal-hash family
    * (integer-only: an md5 per row×resample was measured ~6× slower
    * on the 40-way fan-out) — inverted through the Poisson(1) CDF as
    * fixed integer thresholds, so both engines draw the identical 40
    * resamples.
    * Weighted sums stay DECIMAL; the CI is exact rank statistics (2nd
    * and 39th of the 40 resample means — a ~5/95 band). Shape: a 40×
    * row fan-out of a 2-column projection into a 40-group aggregate;
    * the rank step sorts 40 rows. At 100 TB nothing but the scan and
    * one 40-key shuffle. (A column-wise single-pass form with 80
    * conditional-sum aggregate expressions was measured 1.5× SLOWER
    * at sf0.1 — the 40 CASE chains blow past whole-stage codegen's
    * method budget and the aggregate falls back to interpreted eval;
    * the explode form keeps every operator codegen'd.)
    */
  private val q195 = QueryDef(
    "q195_bootstrap_ci",
    (s, dir) => {
      val B = 40
      val wCase = """CASE WHEN u < 367879 THEN 0L WHEN u < 735759 THEN 1L
        WHEN u < 919699 THEN 2L WHEN u < 981012 THEN 3L
        WHEN u < 996340 THEN 4L WHEN u < 999406 THEN 5L
        WHEN u < 999917 THEN 6L WHEN u < 999990 THEN 7L ELSE 8L END"""
      // spread: the 40× explode below otherwise runs inside the
      // single-row-group scan task (measured wall 2.20 s ≈ cpu 2.11 s,
      // fully serial); one narrow 2-column exchange unblocks all cores
      // and is an identity at production split counts (guide §2.5)
      val o = Fixtures.spread(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
      val means = o
        .select(col("o_orderkey"), col("o_totalprice"),
          explode(sequence(lit(0), lit(B - 1))).as("b"))
        .select(col("b"), col("o_totalprice"),
          expr("((o_orderkey % 2147483647L) * 1117 + b * 2971 + 407) " +
            "% 2147483647L % 1000000").as("u"))
        .withColumn("wt", expr(wCase))
        .groupBy(col("b"))
        // r16 scaled-int64: price is exact 2-decimal and wt a small
        // integer, so price·wt·100 is an exact int64 (≤ ~6e8) — the
        // per-(order×B)-row DECIMAL(18,4) cast (this query's hottest
        // expression: a BigDecimal parse per fanned-out row) drops to
        // one floor+multiply; one exact descale per bootstrap replica
        .agg(sum(expr("CAST(floor(o_totalprice * wt * 100 + 0.5) " +
          "AS BIGINT)").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .as("swl"),
          sum(col("wt")).as("nw"))
        .select(col("b"),
          ((col("swl") / lit(100)).cast("double")
            / col("nw").cast("double")).as("m"))
      val w = Window.orderBy(col("m"), col("b"))
      val ci = means.withColumn("rn", row_number().over(w))
        .agg(max(expr("CASE WHEN rn = 2 THEN m END")).as("boot_lo"),
          max(expr(s"CASE WHEN rn = ${B - 1} THEN m END")).as("boot_hi"))
      val base = o.agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("spl"))
        .select(col("n_orders"),
          ((col("spl") / lit(100)).cast("double")
            / col("n_orders").cast("double")).as("mean_price"))
      base.crossJoin(ci)
        .select(col("n_orders"), col("mean_price"), col("boot_lo"),
          col("boot_hi"))
    },
    Some(s"""WITH ex AS (SELECT o_orderkey, o_totalprice, b,
          ((o_orderkey % 2147483647) * 1117 + b * 2971 + 407)
            % 2147483647 % 1000000 AS u
        FROM orders CROSS JOIN
          (SELECT unnest(generate_series(0, 39)) AS b)),
      wt AS (SELECT b, o_totalprice,
          CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
            WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
            WHEN u < 996340 THEN 4 WHEN u < 999406 THEN 5
            WHEN u < 999917 THEN 6 WHEN u < 999990 THEN 7 ELSE 8 END
            AS wt FROM ex),
      means AS (SELECT b,
          sum(cast(o_totalprice * wt AS DECIMAL(18,4)))::DOUBLE
            / sum(wt)::DOUBLE AS m
        FROM wt GROUP BY 1),
      r AS (SELECT m, row_number() OVER (ORDER BY m, b) AS rn FROM means),
      ci AS (SELECT max(CASE WHEN rn = 2 THEN m END) AS boot_lo,
          max(CASE WHEN rn = 39 THEN m END) AS boot_hi FROM r),
      base AS (SELECT count(*) AS n_orders,
          sum(cast(o_totalprice AS DECIMAL(18,4)))::DOUBLE
            / count(*)::DOUBLE AS mean_price FROM orders)
      SELECT n_orders, mean_price, boot_lo, boot_hi FROM base, ci"""))

  // ---------- q200: KMV set-overlap estimate (join-size audit) ---------

  /** Sketch-driven join planning audit: estimate the distinct-key
    * overlap between orders.o_custkey (active customers) and
    * customer.c_custkey (all customers) from two KMV sketches via
    * inclusion–exclusion (est A + est B − est A∪B), next to the exact
    * answer — the cardinality-estimation step a cost-based planner
    * runs before choosing a join strategy, made auditable. All three
    * sketches reuse q35's bounded-state KmvAgg (≤ K hashes cross any
    * shuffle; the union sketch reads the two key streams, never a
    * joined table). Same estimate arithmetic as q35, textually
    * identical in both dialects; exact counts are one distinct
    * aggregate and one semi-join.
    */
  private val q200 = QueryDef(
    "q200_kmv_join_estimate",
    (s, dir) => {
      import s.implicits._
      val K2 = 256
      val ha = Fixtures.table(s, dir, "orders")
        .select(expr(h32Spark("concat('jk_', o_custkey)")).as("h")).distinct()
      val hb = Fixtures.table(s, dir, "customer")
        .select(expr(h32Spark("concat('jk_', c_custkey)")).as("h")).distinct()
      val hu = ha.unionAll(hb).distinct()
      def est(h: DataFrame, name: String): DataFrame =
        h.select(col("h")).as[Long].groupByKey(_ => 1)
          .agg(new KmvAgg(K2).toColumn.name("kmv"))
          .toDF("g", "kmv")
          .select(col("kmv.n").as("nd"),
            expr(s"try_element_at(kmv.mins, $K2)").as("kth"))
          .select(expr(s"CASE WHEN nd >= $K2 THEN " +
            s"${K2 - 1}.0 * 4294967296.0 / kth " +
            "ELSE cast(nd AS DOUBLE) END").as(name))
      val exactA = Fixtures.table(s, dir, "orders")
        .agg(countDistinct(col("o_custkey")).as("exact_active"))
      val exactB = Fixtures.table(s, dir, "customer")
        .agg(countDistinct(col("c_custkey")).as("exact_customers"))
      val exactC = Fixtures.table(s, dir, "customer")
        .join(Fixtures.table(s, dir, "orders")
          .select(col("o_custkey").as("c_custkey")).distinct(),
          Seq("c_custkey"), "left_semi")
        .agg(count(lit(1)).as("exact_common"))
      exactA.crossJoin(exactB).crossJoin(exactC)
        .crossJoin(est(ha, "est_active"))
        .crossJoin(est(hb, "est_customers"))
        .crossJoin(est(hu, "est_union"))
        .select(col("exact_active"), col("est_active"),
          col("exact_customers"), col("est_customers"),
          col("exact_common"),
          ((col("est_active") + col("est_customers")) - col("est_union"))
            .as("est_common"))
    },
    Some(s"""WITH ha AS (SELECT DISTINCT
          ${h32Duck("'jk_' || o_custkey")} AS h FROM orders),
      hb AS (SELECT DISTINCT ${h32Duck("'jk_' || c_custkey")} AS h
        FROM customer),
      hu AS (SELECT h FROM ha UNION SELECT h FROM hb),
      ra AS (SELECT h, row_number() OVER (ORDER BY h) AS rn,
          count(*) OVER () AS nd FROM ha),
      rb AS (SELECT h, row_number() OVER (ORDER BY h) AS rn,
          count(*) OVER () AS nd FROM hb),
      ru AS (SELECT h, row_number() OVER (ORDER BY h) AS rn,
          count(*) OVER () AS nd FROM hu),
      ea AS (SELECT CASE WHEN max(nd) >= 256 THEN
          255.0 * 4294967296.0 / max(CASE WHEN rn = 256 THEN h END)
          ELSE cast(max(nd) AS DOUBLE) END AS est_active FROM ra),
      eb AS (SELECT CASE WHEN max(nd) >= 256 THEN
          255.0 * 4294967296.0 / max(CASE WHEN rn = 256 THEN h END)
          ELSE cast(max(nd) AS DOUBLE) END AS est_customers FROM rb),
      eu AS (SELECT CASE WHEN max(nd) >= 256 THEN
          255.0 * 4294967296.0 / max(CASE WHEN rn = 256 THEN h END)
          ELSE cast(max(nd) AS DOUBLE) END AS est_union FROM ru),
      xa AS (SELECT count(DISTINCT o_custkey) AS exact_active FROM orders),
      xb AS (SELECT count(DISTINCT c_custkey) AS exact_customers
        FROM customer),
      xc AS (SELECT count(*) AS exact_common FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders))
      SELECT exact_active, est_active, exact_customers, est_customers,
        exact_common,
        (est_active + est_customers) - est_union AS est_common
      FROM xa, xb, xc, ea, eb, eu"""))

  // ---------- q264: CMS error audit -----------------------------------

  /** Accuracy audit for q63's Count-Min sketch — the sketch-audit
    * family beside q127 (ANN recall), q246 (LSH precision/recall) and
    * q66's explicit false-positive count: for the top-20 tokens by CMS
    * estimate, report the EXACT count next to the estimate, the
    * overestimate (≥ 0 always — the one-sided CMS guarantee, which
    * this audit would expose as violated if the hashing ever broke)
    * and the relative error a capacity planner budgets for. Same
    * bounded 4×1024 sketch build (map-side combined cell counts); the
    * exact side is one token-keyed aggregate the probe join reuses —
    * nothing here is new shuffle shape, the VALUE is putting the
    * sketch's promised error bound next to a measured number.
    */
  private val q264 = QueryDef(
    "q264_cms_error_audit",
    (s, dir) => {
      // r15: hash the VOCAB, not the occurrences — the exact count
      // table already holds each distinct token's multiplicity, so the
      // sketch's cell counts are Σ n_exact over vocab rows instead of
      // a count over ~1 M re-hashed occurrences (4 md5s each). Cell
      // values identical; oracle unchanged. spread: the tokenize
      // explode otherwise serializes in the single-row-group scan task.
      val toks = Fixtures.spread(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) > 0)
      val exact = PlanCache.freeze(
        toks.groupBy(col("tok")).agg(count(lit(1)).as("n_exact")))
      def rows(df: DataFrame): DataFrame = df.select(col("tok"),
        posexplode(array((0 until CmsDepth).map(r =>
          expr(s"${h32Spark(s"concat('cms$r|', tok)")} % $CmsWidth")): _*))
          .as(Seq("r", "bucket")))
      val sketch = exact.select(col("n_exact"),
          posexplode(array((0 until CmsDepth).map(r =>
            expr(s"${h32Spark(s"concat('cms$r|', tok)")} % $CmsWidth")): _*))
            .as(Seq("r", "bucket")))
        .groupBy(col("r"), col("bucket"))
        .agg(sum(col("n_exact")).cast("long").as("c"))
      rows(exact.select(col("tok")))
        .join(sketch, Seq("r", "bucket"))
        .groupBy(col("tok")).agg(min(col("c")).as("est"))
        .join(exact, Seq("tok"))
        .orderBy(col("est").desc, col("tok")).limit(20)
        .select(col("tok"), col("n_exact"), col("est"),
          (col("est") - col("n_exact")).as("overestimate"),
          round((col("est") - col("n_exact")).cast("double")
            / col("n_exact").cast("double"), 12).as("rel_err"))
        .orderBy(col("est").desc, col("tok"))
    },
    Some {
      val bucket = (side: String) => (0 until CmsDepth).map(r =>
        s"SELECT tok, $r AS r, " +
          s"${h32Duck(s"'cms$r|' || tok")} % $CmsWidth AS bucket " +
          s"FROM $side").mkString(" UNION ALL ")
      s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok
          FROM documents),
        occ AS (SELECT tok FROM toks WHERE len(tok) > 0),
        exact AS (SELECT tok, count(*)::BIGINT AS n_exact FROM occ
          GROUP BY 1),
        srows AS (${bucket("occ")}),
        sketch AS (SELECT r, bucket, count(*)::BIGINT AS c
          FROM srows GROUP BY 1, 2),
        crows AS (${bucket("(SELECT tok FROM exact)")}),
        est AS (SELECT cr.tok, min(sk.c)::BIGINT AS est
          FROM crows cr JOIN sketch sk USING (r, bucket) GROUP BY cr.tok),
        top AS (SELECT e.tok, n_exact, est FROM est e
          JOIN exact x ON e.tok = x.tok
          ORDER BY est DESC, e.tok LIMIT 20)
        SELECT tok, n_exact, est, (est - n_exact)::BIGINT AS overestimate,
          round((est - n_exact)::DOUBLE / n_exact::DOUBLE, 12) AS rel_err
        FROM top ORDER BY est DESC, tok"""
    })

  // ---------- q394: mergeable-histogram quantile fidelity --------------

  /** Quantile fidelity of the mergeable fixed-bin histogram sketch —
    * the audit behind every "approximate percentile over 100 TB"
    * dashboard: per-partition 64-bin histograms merge associatively
    * (the groupBy's partial aggregation IS the sketch merge, which is
    * the whole point — constant state per executor, one tiny
    * shuffle), and the question is how much the within-bin linear
    * interpolation costs at each quantile vs the exact order
    * statistic. Exact side: type-7 interpolated percentile over
    * cents-pinned prices (both engines' exact form, the q369
    * convention). Estimated side: broadcast [min,max] range, bin
    * counts, bounded 64-row cumulative, interpolate at p·N. Reports
    * est/exact/error for the four operating quantiles.
    */
  private val q394 = QueryDef(
    "q394_histogram_quantile_audit",
    (s, dir) => {
      // frozen: the cents projection feeds three consumers (range agg,
      // bin histogram, exact-percentile audit) — one scan, not three.
      // spread: without it the frozen RDD inherits the single-row-group
      // scan's ONE partition and every consumer (percentile state build
      // included) runs serial (measured wall 1.63 s ≈ cpu 1.57 s)
      val x = PlanCache.freeze(Fixtures.spread(s, dir, "lineitem")
        .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
          .as("x")))
      val rng = x.agg(min(col("x")).as("mn"), max(col("x")).as("mx"),
        count(lit(1)).as("n"))
      val bins = x.crossJoin(broadcast(rng))
        .select(least(lit(63L), greatest(lit(0L),
          expr("""CAST(floor(CAST(x - mn AS DOUBLE) * 64.0
            / (mx - mn)) AS BIGINT)"""))).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as("c"))
      val w = Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = bins.withColumn("cum", sum(col("c")).over(w))
        .crossJoin(broadcast(rng))
      val qs = cum.sparkSession.range(1).select(
        explode(expr("array(0.25D, 0.5D, 0.9D, 0.99D)")).as("q"))
      val est = cum.join(broadcast(qs),
          col("cum") >= col("q") * col("n")
            && (col("cum") - col("c")) < col("q") * col("n"))
        .select(col("q"),
          (col("mn").cast("double") + (col("bin").cast("double")
            + (col("q") * col("n") - (col("cum") - col("c")))
              / col("c"))
            * (col("mx") - col("mn")).cast("double") / 64.0)
            .as("est_cents"))
      // r16 note: a distributed exact-percentile rewrite (583k-row
      // value histogram → range repartition → per-range cumulative →
      // broadcast rank probe, reproducing Percentile.getPercentile's
      // interpolation bit-for-bit) was implemented and MEASURED WORSE:
      // 23.1 executor-cpu-s vs 2.6 (the cents domain is nearly unique
      // per row, so the "histogram" is the data and the range
      // repartition adds a sampling pass plus a full extra shuffle).
      // Kept the percentile() aggregate; its per-group map is the right
      // tool while the value domain ≪ memory, and the binned estimate
      // beside it is this query's own answer for the 100 TB regime.
      val exact = x.agg(
        expr("percentile(x, array(0.25D, 0.5D, 0.9D, 0.99D))")
          .as("ex"))
        .select(posexplode(col("ex")).as(Seq("i", "exact_cents")))
        .select(expr("element_at(array(0.25D, 0.5D, 0.9D, 0.99D), " +
          "i + 1)").as("q"), col("exact_cents"))
      est.join(exact, Seq("q"))
        .select(col("q"),
          round(col("est_cents") / 100.0, 6).as("est"),
          round(col("exact_cents") / 100.0, 6).as("exact"),
          round(abs(col("est_cents") - col("exact_cents")) / 100.0, 6)
            .as("abs_err"))
        .orderBy(col("q"))
    },
    Some("""WITH x AS (SELECT round(l_extendedprice * 100)::BIGINT
          AS x FROM lineitem),
      rng AS (SELECT min(x)::BIGINT AS mn, max(x)::BIGINT AS mx,
          count(*)::BIGINT AS n FROM x),
      bins AS (SELECT least(63, greatest(0,
            floor((x - mn)::DOUBLE * 64.0 / (mx - mn))))::BIGINT
            AS bin,
          count(*)::BIGINT AS c
        FROM x, rng GROUP BY 1),
      cum AS (SELECT bin, c,
          sum(c) OVER (ORDER BY bin
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
            AS cum
        FROM bins),
      qs AS (SELECT unnest([0.25, 0.5, 0.9, 0.99])::DOUBLE AS q),
      est AS (SELECT q,
          mn::DOUBLE + (bin::DOUBLE + (q * n - (cum - c)) / c)
            * (mx - mn)::DOUBLE / 64.0 AS est_cents
        FROM cum, rng, qs
        WHERE cum >= q * n AND (cum - c) < q * n),
      exact AS (
        SELECT 0.25::DOUBLE AS q, quantile_cont(x, 0.25) AS exact_cents
          FROM x
        UNION ALL SELECT 0.5, quantile_cont(x, 0.5) FROM x
        UNION ALL SELECT 0.9, quantile_cont(x, 0.9) FROM x
        UNION ALL SELECT 0.99, quantile_cont(x, 0.99) FROM x)
      SELECT q, round(est_cents / 100.0, 6) AS est,
        round(exact_cents / 100.0, 6) AS exact,
        round(abs(est_cents - exact_cents) / 100.0, 6) AS abs_err
      FROM est JOIN exact USING (q)
      ORDER BY q"""))

  // ---------- q478: ingest-batch KMV sketch-state merge ----------------

  /** The sketch-state form of incremental distinct counting: the
    * STANDING corpus contributes only its per-group KMV state (the K
    * minimum distinct hashes — bounded, mergeable), an ingest batch
    * (o_orderkey % 10 < 2) contributes its own state, and the merged
    * estimate is computed from `firstK(sort(distinct(mins_a ∪
    * mins_b)))` — no rescan of standing data, ever. KMV union is
    * EXACT-equivalent to recomputation (the K smallest of the two
    * K-smallest sets are the K smallest overall), and the query
    * proves it operationally: `merge_equals_full` compares the merged
    * estimate against an independent full-corpus sketch, the q70
    * merge≡recompute contract for sketch state. Exact distinct counts
    * ride alongside as the audit truth. Shape: two bounded typed
    * aggregations (state is ≤ K longs per group) + an array merge on
    * the |groups|-row frame; integer hash arithmetic end-to-end, one
    * double division per estimate.
    */
  private val q478 = QueryDef(
    "q478_ingest_kmv_merge",
    (s, dir) => {
      import s.implicits._
      val o = Fixtures.table(s, dir, "orders")
      def kmv(side: DataFrame, est: String) = side
        .select(col("o_orderpriority"),
          expr(h32Spark("cast(o_custkey AS STRING)")).as("h")).distinct()
        .as[(String, Long)]
        .groupByKey(_._1).mapValues(_._2)
        .agg(new KmvAgg(K).toColumn.name("kmv"))
        .toDF("o_orderpriority", "kmv")
        .select(col("o_orderpriority"), col("kmv.mins").as(s"mins_$est"),
          expr(s"CASE WHEN kmv.n >= $K THEN ${K - 1}.0 * 4294967296.0 " +
            s"/ try_element_at(kmv.mins, $K) " +
            "ELSE cast(kmv.n AS DOUBLE) END").as(s"est_$est"))
      val a = kmv(o.where(col("o_orderkey") % 10 >= 2), "standing")
      val b = kmv(o.where(col("o_orderkey") % 10 < 2), "batch")
      val f = kmv(o, "full")
      val exact = o.groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_exact"))
      a.join(b, "o_orderpriority").join(f, "o_orderpriority")
        .withColumn("merged", expr(
          s"slice(array_sort(array_distinct(" +
            s"concat(mins_standing, mins_batch))), 1, $K)"))
        .withColumn("est_merged", expr(
          s"CASE WHEN size(merged) >= $K THEN ${K - 1}.0 * 4294967296.0 " +
            s"/ try_element_at(merged, $K) " +
            "ELSE cast(size(merged) AS DOUBLE) END"))
        .join(exact, "o_orderpriority")
        .select(col("o_orderpriority"), col("n_exact"),
          col("est_standing"), col("est_batch"), col("est_merged"),
          col("est_full"),
          (col("est_merged") === col("est_full")).as("merge_equals_full"))
        .orderBy("o_orderpriority")
    },
    Some(s"""WITH h AS (SELECT DISTINCT o_orderpriority,
          ${h32Duck("o_custkey::VARCHAR")} AS h,
          CASE WHEN o_orderkey % 10 < 2 THEN 1 ELSE 0 END AS isb
        FROM orders),
      side AS (SELECT o_orderpriority, isb, h,
          row_number() OVER (PARTITION BY o_orderpriority, isb
            ORDER BY h) AS rn,
          count(*) OVER (PARTITION BY o_orderpriority, isb) AS nd
        FROM h),
      est_side AS (SELECT o_orderpriority, isb,
          CASE WHEN max(nd) >= $K THEN ${K - 1}.0 * 4294967296.0
            / max(CASE WHEN rn = $K THEN h END)
          ELSE cast(max(nd) AS DOUBLE) END AS est
        FROM side GROUP BY 1, 2),
      hf AS (SELECT DISTINCT o_orderpriority, h FROM h),
      fullr AS (SELECT o_orderpriority, h,
          row_number() OVER (PARTITION BY o_orderpriority ORDER BY h)
            AS rn,
          count(*) OVER (PARTITION BY o_orderpriority) AS nd
        FROM hf),
      est_full AS (SELECT o_orderpriority,
          CASE WHEN max(nd) >= $K THEN ${K - 1}.0 * 4294967296.0
            / max(CASE WHEN rn = $K THEN h END)
          ELSE cast(max(nd) AS DOUBLE) END AS est_full
        FROM fullr GROUP BY 1),
      mu AS (SELECT o_orderpriority, h FROM side WHERE rn <= $K),
      mdist AS (SELECT DISTINCT o_orderpriority, h FROM mu),
      mr AS (SELECT o_orderpriority, h,
          row_number() OVER (PARTITION BY o_orderpriority ORDER BY h)
            AS rn,
          count(*) OVER (PARTITION BY o_orderpriority) AS nm
        FROM mdist),
      est_merged AS (SELECT o_orderpriority,
          CASE WHEN max(nm) >= $K THEN ${K - 1}.0 * 4294967296.0
            / max(CASE WHEN rn = $K THEN h END)
          ELSE cast(max(nm) AS DOUBLE) END AS est_merged
        FROM mr WHERE rn <= $K GROUP BY 1),
      exact AS (SELECT o_orderpriority,
          count(DISTINCT o_custkey)::BIGINT AS n_exact
        FROM orders GROUP BY 1)
      SELECT e.o_orderpriority, n_exact,
        sa.est AS est_standing, sb.est AS est_batch,
        em.est_merged, ef.est_full,
        (em.est_merged = ef.est_full) AS merge_equals_full
      FROM exact e
      JOIN est_side sa ON sa.o_orderpriority = e.o_orderpriority
        AND sa.isb = 0
      JOIN est_side sb ON sb.o_orderpriority = e.o_orderpriority
        AND sb.isb = 1
      JOIN est_merged em ON em.o_orderpriority = e.o_orderpriority
      JOIN est_full ef ON ef.o_orderpriority = e.o_orderpriority
      ORDER BY e.o_orderpriority"""))

  // ---------- q482: ingest-batch uniform-sample merge ------------------

  private val SampleK = 16

  /** Mergeable uniform corpus sample across an ingest boundary — the
    * reservoir-sampling problem in its deterministic, distributed form:
    * a bottom-k-by-hash sample (the k smallest 52-bit doc-id hashes)
    * IS a uniform k-sample, and its state is mergeable exactly the way
    * q478's KMV is — the k smallest of two k-smallest sets are the k
    * smallest overall — so the standing corpus keeps only K longs of
    * state and each ingest batch contributes its own K, no standing
    * rescan. (A classic rand()-reservoir can't do this: it is neither
    * deterministic nor cross-engine reproducible, and merging two
    * reservoirs needs weighted resampling.) The query computes the
    * standing-side and batch-side bottom-K states with the bounded
    * KmvAgg, merges them in SQL (`slice(array_sort(distinct ∪))`),
    * proves `merge_equals_full` against an independent whole-corpus
    * bottom-K, and reports the merged sample itself — rank, doc, side —
    * by joining the ≤K winning hashes back to the corpus (broadcast,
    * one narrow pass). 52-bit hashes (not 32) because here the hash is
    * the sampled IDENTITY: a birthday collision would make "the k-th
    * smallest" ambiguous; at 52 bits that probability is ≪ 1e-6 even
    * at sf1. Shape: one distinct-hash shuffle + two bounded typed
    * aggregations; K-row output.
    */
  private val q482 = QueryDef(
    "q482_ingest_sample_merge",
    (s, dir) => {
      import s.implicits._
      import Portable.{h52Spark => h52}
      val d = Fixtures.table(s, dir, "documents")
        .select(col("doc_id"),
          expr(h52("concat('smp_', cast(doc_id AS STRING))")).as("h"),
          (col("doc_id") % 10 < 2).cast("int").as("isb"))
      def mins(side: DataFrame, nm: String) = side
        .select(col("h")).distinct().as[Long]
        .groupByKey(_ => 0)
        .agg(new KmvAgg(SampleK).toColumn.name("kmv"))
        .toDF("g", "kmv")
        .select(col("kmv.mins").as(nm))
      val a = mins(d.where(col("isb") === 0), "mins_standing")
      val b = mins(d.where(col("isb") === 1), "mins_batch")
      val f = mins(d, "mins_full")
      val picked = a.crossJoin(broadcast(b)).crossJoin(broadcast(f))
        .withColumn("merged", expr("slice(array_sort(array_distinct(" +
          s"concat(mins_standing, mins_batch))), 1, $SampleK)"))
        .withColumn("ok",
          col("merged") === expr(s"slice(mins_full, 1, $SampleK)"))
        .select(col("ok"), posexplode(col("merged")).as(Seq("i", "h")))
      d.join(broadcast(picked), "h")
        .groupBy(col("h"), col("i"), col("ok"))
        .agg(min(col("doc_id")).as("doc_id"), min(col("isb")).as("isb"))
        .select((col("i") + 1).cast("long").as("rank"), col("doc_id"),
          col("h"), (col("isb") === 1).as("is_batch"),
          col("ok").as("merge_equals_full"))
        .orderBy("rank")
    },
    Some(s"""WITH d AS (SELECT doc_id,
          ${Portable.h52Duck("'smp_' || doc_id::VARCHAR")} AS h,
          CASE WHEN doc_id % 10 < 2 THEN 1 ELSE 0 END AS isb
        FROM documents),
      sideh AS (SELECT DISTINCT isb, h FROM d),
      side AS (SELECT isb, h, row_number() OVER (PARTITION BY isb
          ORDER BY h) AS rn FROM sideh),
      pool AS (SELECT DISTINCT h FROM side WHERE rn <= $SampleK),
      merged AS (SELECT h, row_number() OVER (ORDER BY h) AS rnk
        FROM pool),
      fullh AS (SELECT h, row_number() OVER (ORDER BY h) AS rn
        FROM (SELECT DISTINCT h FROM d)),
      eq AS (SELECT (count(*) = $SampleK) AS ok
        FROM merged m JOIN fullh f ON m.rnk = f.rn AND m.h = f.h
        WHERE m.rnk <= $SampleK AND f.rn <= $SampleK),
      byh AS (SELECT h, min(doc_id) AS doc_id, min(isb) AS isb
        FROM d GROUP BY h)
      SELECT m.rnk::BIGINT AS rank, b.doc_id, m.h,
        (b.isb = 1) AS is_batch, eq.ok AS merge_equals_full
      FROM merged m JOIN byh b USING (h), eq
      WHERE m.rnk <= $SampleK ORDER BY rank"""))

  // ---------- q483: ingest-batch Bloom-filter delta ---------------------

  /** Incremental maintenance of q66's data-skipping Bloom filter: a
    * Bloom filter is OR-mergeable state — the filter of a union is the
    * bitwise OR of the filters — so an ingest batch updates the
    * standing filter by contributing only its OWN position set (here
    * the distinct h32 positions of the batch's customer keys), never
    * rescanning standing orders. The query builds both side position
    * sets, merges them relationally (per-position max flags = the OR),
    * proves `merge_equals_full` against an independently recomputed
    * whole-corpus position set, and reports the maintenance numbers a
    * skipping layer budgets by: bits per side, `bits_delta` (positions
    * the batch newly sets — the actual write), fill ratio, and the
    * k-probe false-positive estimate fill³ computed as three exact
    * IEEE multiplications (pow() would hang cross-engine parity on
    * libm rounding). Shape: position sets are ≤ $BloomBits small ints
    * per side — the shuffle carries positions, never keys; 1-row
    * output.
    */
  private val q483 = QueryDef(
    "q483_ingest_bloom_delta",
    (s, dir) => {
      def posCols(key: String) = (0 until BloomK).map(i =>
        expr(s"${h32Spark(s"concat('b${i}_', cast($key AS STRING))")} " +
          s"% $BloomBits"))
      val o = Fixtures.table(s, dir, "orders")
        .select(col("o_custkey"),
          (col("o_orderkey") % 10 < 2).cast("int").as("isb"))
      val pos = o
        .select(col("isb"),
          explode(array(posCols("o_custkey"): _*)).as("pos"))
        .distinct()
      val byPos = pos.groupBy(col("pos")).agg(
        max(when(col("isb") === 0, 1).otherwise(0)).as("in_a"),
        max(when(col("isb") === 1, 1).otherwise(0)).as("in_b"))
      val fullPos = Fixtures.table(s, dir, "orders")
        .select(explode(array(posCols("o_custkey"): _*)).as("pos"))
        .distinct()
      val m = byPos.agg(
        sum(col("in_a")).cast("long").as("bits_standing"),
        sum(col("in_b")).cast("long").as("bits_batch"),
        sum(when(col("in_b") === 1 && col("in_a") === 0, 1L)
          .otherwise(0L)).as("bits_delta"),
        count(lit(1)).as("bits_merged"))
      val fc = fullPos.agg(count(lit(1)).as("bits_full"))
      val mm = byPos.select(col("pos").as("pm"))
        .join(fullPos.select(col("pos").as("pf")),
          col("pm") === col("pf"), "full_outer")
        .agg(sum(when(col("pm").isNull || col("pf").isNull, 1L)
          .otherwise(0L)).as("n_mismatch"))
      m.crossJoin(broadcast(fc)).crossJoin(broadcast(mm))
        .select(col("bits_standing"), col("bits_batch"),
          col("bits_delta"), col("bits_merged"), col("bits_full"),
          (coalesce(col("n_mismatch"), lit(0L)) === 0L)
            .as("merge_equals_full"),
          expr(s"CAST(bits_merged AS DOUBLE) / $BloomBits.0")
            .as("fill_ratio"),
          expr(s"(CAST(bits_merged AS DOUBLE) / $BloomBits.0) * " +
            s"(CAST(bits_merged AS DOUBLE) / $BloomBits.0) * " +
            s"(CAST(bits_merged AS DOUBLE) / $BloomBits.0)")
            .as("est_fp_rate"))
    },
    Some {
      val dpos = (i: Int, key: String) =>
        s"${h32Duck(s"'b${i}_' || $key::VARCHAR")} % $BloomBits"
      val sideUnion = (0 until BloomK).map(i =>
        s"SELECT isb, ${dpos(i, "o_custkey")} AS pos FROM o")
        .mkString(" UNION ALL ")
      val fullUnion = (0 until BloomK).map(i =>
        s"SELECT ${dpos(i, "o_custkey")} AS pos FROM orders")
        .mkString(" UNION ALL ")
      s"""WITH o AS (SELECT o_custkey,
          CASE WHEN o_orderkey % 10 < 2 THEN 1 ELSE 0 END AS isb
        FROM orders),
      pos AS (SELECT DISTINCT isb, pos FROM ($sideUnion)),
      byp AS (SELECT pos,
          max(CASE WHEN isb = 0 THEN 1 ELSE 0 END) AS in_a,
          max(CASE WHEN isb = 1 THEN 1 ELSE 0 END) AS in_b
        FROM pos GROUP BY pos),
      fullp AS (SELECT DISTINCT pos FROM ($fullUnion)),
      m AS (SELECT sum(in_a)::BIGINT AS bits_standing,
          sum(in_b)::BIGINT AS bits_batch,
          sum(CASE WHEN in_b = 1 AND in_a = 0 THEN 1 ELSE 0 END)::BIGINT
            AS bits_delta,
          count(*)::BIGINT AS bits_merged
        FROM byp),
      fc AS (SELECT count(*)::BIGINT AS bits_full FROM fullp),
      mm AS (SELECT sum(CASE WHEN b.pos IS NULL OR f.pos IS NULL
            THEN 1 ELSE 0 END)::BIGINT AS n_mismatch
        FROM byp b FULL JOIN fullp f ON b.pos = f.pos)
      SELECT bits_standing, bits_batch, bits_delta, bits_merged,
        bits_full,
        (COALESCE(n_mismatch, 0) = 0) AS merge_equals_full,
        CAST(bits_merged AS DOUBLE) / $BloomBits.0 AS fill_ratio,
        (CAST(bits_merged AS DOUBLE) / $BloomBits.0) *
          (CAST(bits_merged AS DOUBLE) / $BloomBits.0) *
          (CAST(bits_merged AS DOUBLE) / $BloomBits.0) AS est_fp_rate
      FROM m, fc, mm"""
    })

  // ---------- q484: ingest-batch CMS merge ------------------------------

  /** Incremental maintenance of q63's count-min sketch: CMS is a LINEAR
    * sketch — sketch(A ∪ B) = sketch(A) + sketch(B) cell-wise, exactly,
    * not approximately — so the heavy-hitter table over a growing
    * corpus is maintained by adding each ingest batch's 4×1024 cell
    * counts into the standing cells; the standing corpus is never
    * re-tokenized. The query builds per-side cell tables from the
    * document split, merges by cell-wise sum, proves the merge against
    * an independently recomputed whole-corpus sketch two ways —
    * `cells_equal` (every cell count identical, min-flag over a
    * full-outer cell join) and per-token estimates (`est_merged` vs
    * `est_full` on the top-20 candidates) — and emits the top-20 table.
    * Shape: both sketches are map-side-combined hash aggregations into
    * ≤ 2·4096 cells; candidate probing joins the bounded cell tables;
    * 20-row output.
    */
  private val q484 = QueryDef(
    "q484_ingest_cms_merge",
    (s, dir) => {
      // r15 restructure (guide §2.3 "shuffle keys/metadata, not
      // payloads" + §1.2 per-task work): the old form re-tokenized the
      // corpus for THREE consumers and ran the 4 per-depth md5s on
      // every token OCCURRENCE (~12 M md5 evals at sf0.1; 5.4 cpu-s).
      // CMS cell counts only need each DISTINCT (side, token)'s
      // occurrence count, so: tokenize ONCE into a frozen (isb, tok,
      // cnt) vocab (spread: the explode otherwise runs inside the
      // single-row-group scan task), hash the VOCAB (4 md5s per
      // distinct token, ~30× fewer), and weight cell counts by cnt.
      // Cell counts, estimates and the merge-vs-full gate are
      // value-identical (Σ over occurrences ≡ Σ over vocab of cnt);
      // oracle unchanged, re-proven at the gate per run.
      val toks = Fixtures.spread(s, dir, "documents")
        .select((col("doc_id") % 10 < 2).cast("int").as("isb"),
          explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) > 0)
      val vocab = PlanCache.freeze(toks
        .groupBy(col("isb"), col("tok")).agg(count(lit(1)).as("cnt")))
      def rows(df: DataFrame, cols: Seq[String]): DataFrame = df.select(
        cols.map(col) :+
          posexplode(array((0 until CmsDepth).map(r =>
            expr(s"${h32Spark(s"concat('cms$r|', tok)")} % $CmsWidth"))
            : _*)).as(Seq("r", "bucket")): _*)
      val sideCells = rows(vocab, Seq("isb", "cnt"))
        .groupBy(col("isb"), col("r"), col("bucket"))
        .agg(sum(col("cnt")).as("c"))
      val merged = sideCells.groupBy(col("r"), col("bucket"))
        .agg(sum(col("c")).cast("long").as("cm"))
      val tokv = vocab.groupBy(col("tok")).agg(sum(col("cnt")).as("cnt"))
      val full = rows(tokv, Seq("cnt"))
        .groupBy(col("r"), col("bucket")).agg(sum(col("cnt")).as("cf"))
      val eq = merged.join(full, Seq("r", "bucket"), "full_outer")
        .agg(min(when(col("cm") === col("cf"), 1L).otherwise(0L))
          .as("alleq"))
      val crows = rows(tokv.select("tok"), Seq("tok"))
      val estM = crows.join(merged, Seq("r", "bucket"))
        .groupBy(col("tok")).agg(min(col("cm")).as("est_merged"))
      val estF = crows.join(full, Seq("r", "bucket"))
        .groupBy(col("tok")).agg(min(col("cf")).as("est_full"))
      estM.join(estF, "tok").crossJoin(broadcast(eq))
        .select(col("tok"), col("est_merged"), col("est_full"),
          (col("alleq") === 1L).as("cells_equal"))
        .orderBy(col("est_merged").desc, col("tok")).limit(20)
    },
    Some {
      val bucket = (side: String, extra: String) =>
        (0 until CmsDepth).map(r =>
          s"SELECT $extra tok, $r AS r, " +
            s"${h32Duck(s"'cms$r|' || tok")} % $CmsWidth AS bucket " +
            s"FROM $side").mkString(" UNION ALL ")
      s"""WITH toks AS (SELECT
          CASE WHEN doc_id % 10 < 2 THEN 1 ELSE 0 END AS isb,
          unnest(string_split(text, ' ')) AS tok
        FROM documents),
      occ AS (SELECT isb, tok FROM toks WHERE len(tok) > 0),
      srows AS (${bucket("occ", "isb,")}),
      side_cells AS (SELECT isb, r, bucket, count(*)::BIGINT AS c
        FROM srows GROUP BY 1, 2, 3),
      merged AS (SELECT r, bucket, sum(c)::BIGINT AS cm
        FROM side_cells GROUP BY 1, 2),
      frows AS (${bucket("occ", "")}),
      fullc AS (SELECT r, bucket, count(*)::BIGINT AS cf
        FROM frows GROUP BY 1, 2),
      eq AS (SELECT min(CASE WHEN cm = cf THEN 1 ELSE 0 END) AS alleq
        FROM merged FULL JOIN fullc USING (r, bucket)),
      cand AS (SELECT DISTINCT tok FROM occ),
      crows AS (${bucket("cand", "")}),
      estm AS (SELECT cr.tok, min(m.cm)::BIGINT AS est_merged
        FROM crows cr JOIN merged m USING (r, bucket) GROUP BY cr.tok),
      estf AS (SELECT cr.tok, min(f.cf)::BIGINT AS est_full
        FROM crows cr JOIN fullc f USING (r, bucket) GROUP BY cr.tok)
      SELECT em.tok, est_merged, est_full, (alleq = 1) AS cells_equal
      FROM estm em JOIN estf ef ON em.tok = ef.tok, eq
      ORDER BY est_merged DESC, em.tok LIMIT 20"""
    })

  // ---------- q485: ingest-batch HLL register merge ---------------------

  /** Incremental maintenance of q85's HyperLogLog sketch — the
    * MAX-merge member that completes the ingest-state family's merge
    * taxonomy (q478 KMV = min-merge, q483 Bloom = OR-merge, q484 CMS =
    * additive, q481 top-k = sum-merge, q476 centroids = mean-update):
    * an HLL register holds the max leading-zero rank ever seen, so the
    * sketch of a union is the register-wise MAX of the side sketches,
    * exactly — the standing corpus keeps 64 small ints per group and
    * each ingest batch contributes its own 64, no standing rescan. The
    * query builds per-side register tables from the order split,
    * max-merges them, proves register-level equality against an
    * independently recomputed whole-corpus sketch (full-outer min-flag,
    * the q484 gate shape), and reports merged vs full estimates beside
    * the exact count through q85's exact-arithmetic estimator (string-
    * length ranks, never float log2). Shape: register tables are ≤ 64
    * rows per (group, side) past the map-side partial max; all
    * estimate math on |groups|-row frames; 5-row output.
    */
  private val q485 = QueryDef(
    "q485_ingest_hll_merge",
    (s, dir) => {
      val o = Fixtures.table(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_custkey"),
          (col("o_orderkey") % 10 < 2).cast("int").as("isb"))
      def regs(df: DataFrame, nm: String) = df
        .select(col("o_orderpriority"),
          expr(h32Spark("cast(o_custkey AS STRING)")).as("h"))
        .select(col("o_orderpriority"), (col("h") % 64).as("reg"),
          expr("CASE WHEN h div 64 > 0 THEN 27 - length(bin(h div 64)) " +
            "ELSE 27 END").as("rho"))
        .groupBy(col("o_orderpriority"), col("reg"))
        .agg(max(col("rho")).as(nm))
      val a = regs(o.where(col("isb") === 0), "mr_a")
      val b = regs(o.where(col("isb") === 1), "mr_b")
      val f = regs(o, "mr_f")
      // register-wise MAX of the side sketches (rho ≥ 1, so 0 is a
      // safe absent-register sentinel)
      val merged = a.join(b, Seq("o_orderpriority", "reg"), "full_outer")
        .select(col("o_orderpriority"), col("reg"),
          greatest(coalesce(col("mr_a"), lit(0)),
            coalesce(col("mr_b"), lit(0))).as("mr_m"))
      val eq = merged.join(f, Seq("o_orderpriority", "reg"), "full_outer")
        .agg(min(when(col("mr_m") === col("mr_f"), 1L).otherwise(0L))
          .as("alleq"))
      def est(df: DataFrame, mrCol: String, nm: String) = df
        .groupBy(col("o_orderpriority"))
        .agg(sum(expr(s"power(0.5, $mrCol)")).as("zp"),
          count(lit(1)).as("nreg"))
        .select(col("o_orderpriority"),
          expr("zp + (64 - nreg) * 1.0").as("z"),
          expr("64 - nreg").as("v"))
        .select(col("o_orderpriority"),
          expr("CASE WHEN 0.709 * 4096.0 / z <= 160.0 AND v > 0 " +
            "THEN round(64.0 * ln(64.0 / v), 6) " +
            "ELSE round(0.709 * 4096.0 / z, 6) END").as(nm))
      val exact = o.groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_exact"))
      exact
        .join(est(merged, "mr_m", "est_merged"), "o_orderpriority")
        .join(est(f, "mr_f", "est_full"), "o_orderpriority")
        .crossJoin(broadcast(eq))
        .select(col("o_orderpriority"), col("n_exact"),
          col("est_merged"), col("est_full"),
          (col("alleq") === 1L).as("merge_equals_full"))
        .orderBy("o_orderpriority")
    },
    Some(s"""WITH o AS (SELECT o_orderpriority, o_custkey,
          CASE WHEN o_orderkey % 10 < 2 THEN 1 ELSE 0 END AS isb,
          ${h32Duck("o_custkey::VARCHAR")} AS h
        FROM orders),
      r AS (SELECT o_orderpriority, isb, h % 64 AS reg,
          CASE WHEN h // 64 > 0 THEN 27 - length(bin(h // 64))
            ELSE 27 END AS rho FROM o),
      side AS (SELECT o_orderpriority, isb, reg, max(rho) AS mr
        FROM r GROUP BY 1, 2, 3),
      merged AS (SELECT o_orderpriority, reg,
          greatest(COALESCE(max(CASE WHEN isb = 0 THEN mr END), 0),
            COALESCE(max(CASE WHEN isb = 1 THEN mr END), 0)) AS mr_m
        FROM side GROUP BY 1, 2),
      fullr AS (SELECT o_orderpriority, reg, max(rho) AS mr_f
        FROM r GROUP BY 1, 2),
      eq AS (SELECT min(CASE WHEN mr_m = mr_f THEN 1 ELSE 0 END)
          AS alleq
        FROM merged FULL JOIN fullr USING (o_orderpriority, reg)),
      zm AS (SELECT o_orderpriority,
          sum(power(0.5, mr_m)) + (64 - count(*)) * 1.0 AS z,
          64 - count(*) AS v FROM merged GROUP BY 1),
      em AS (SELECT o_orderpriority,
          CASE WHEN 0.709 * 4096.0 / z <= 160.0 AND v > 0
            THEN round(64.0 * ln(64.0 / v), 6)
            ELSE round(0.709 * 4096.0 / z, 6) END AS est_merged
        FROM zm),
      zf AS (SELECT o_orderpriority,
          sum(power(0.5, mr_f)) + (64 - count(*)) * 1.0 AS z,
          64 - count(*) AS v FROM fullr GROUP BY 1),
      ef AS (SELECT o_orderpriority,
          CASE WHEN 0.709 * 4096.0 / z <= 160.0 AND v > 0
            THEN round(64.0 * ln(64.0 / v), 6)
            ELSE round(0.709 * 4096.0 / z, 6) END AS est_full
        FROM zf),
      exact AS (SELECT o_orderpriority,
          count(DISTINCT o_custkey) AS n_exact FROM orders GROUP BY 1)
      SELECT exact.o_orderpriority, n_exact, est_merged, est_full,
        (alleq = 1) AS merge_equals_full
      FROM exact
      JOIN em USING (o_orderpriority)
      JOIN ef USING (o_orderpriority), eq
      ORDER BY o_orderpriority"""))

  // ---------- q498: Bloom-filter ingest pre-gate --------------------------

  /** The cheap first gate of the ingest pipeline — probe the arriving
    * batch against a Bloom filter of the standing corpus's exact
    * content keys (q17's normalization) BEFORE paying any join: a
    * negative probe is a guaranteed-new document that skips the
    * exact-dup lookup entirely; only positives (true dups + false
    * positives) hit the key table. This query builds the filter
    * (m = 16 384 bits, k = 4 salted h32 positions — deterministic,
    * engine-portable, mergeable across ingests by bit-OR, the q483
    * delta's contract), probes the batch, and AUDITS the economics:
    * fill ratio, measured false-positive rate against ground truth
    * (the exact key semi-join the filter is supposed to save), and
    * the probe traffic saved. Shape: the filter is a ≤ m-row distinct
    * position table that BROADCASTS to the probe side (at 100 TB the
    * real artifact is m/8 bytes per executor — no shuffle of the
    * corpus); build is one distinct-key pass, probe is one batch
    * pass; every rate in exact integer ppm. 1-row output.
    */
  private val q498 = QueryDef(
    "q498_bloom_ingest_gate",
    (s, dir) => {
      val M = 16384L
      val keyed = Fixtures.table(s, dir, "documents")
        .select(col("doc_id"),
          md5(expr("graft_norm_text(text)")).as("key"))
      // frozen: the standing key set feeds the position build AND the
      // ground-truth semi-join, the batch slice feeds probe + truth +
      // verdict base — without the persists the md5 normalization (the
      // build's dominant cost) re-runs once per consumer
      val standingKeys = PlanCache.freeze(
        keyed.where(expr("doc_id % 10 >= 2")).select(col("key")).distinct())
      val posCols = (0 until 4).map(i =>
        expr(s"${Portable.h32Spark(s"concat('b${i}_', key)")} % $M"))
      val bloomPos = standingKeys
        .select(explode(array(posCols: _*)).as("pos")).distinct()
      val nKeys = standingKeys.agg(count(lit(1)).as("n_standing_keys"))
      val bits = bloomPos.agg(count(lit(1)).as("bits_set"))
      val batch = PlanCache.freeze(keyed.where(expr("doc_id % 10 < 2")))
      val probe = batch
        .select(col("doc_id"), posexplode(array(posCols: _*))
          .as(Seq("i", "pos")))
        .join(broadcast(bloomPos), Seq("pos"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_match"))
      val truth = batch
        .join(standingKeys, Seq("key"), "left_semi")
        .select(col("doc_id")).withColumn("is_dup", lit(1L))
      val verdicts = batch.select(col("doc_id"))
        .join(probe, Seq("doc_id"), "left_outer")
        .join(truth.select(col("doc_id"), col("is_dup")),
          Seq("doc_id"), "left_outer")
        .select(
          (coalesce(col("n_match"), lit(0L)) === 4L).cast("long")
            .as("positive"),
          coalesce(col("is_dup"), lit(0L)).as("is_dup"))
      val agg = verdicts.agg(count(lit(1)).as("n_batch"),
        sum(col("positive")).as("n_positive"),
        sum(col("is_dup")).as("n_true_dup"),
        sum(col("positive") * (lit(1L) - col("is_dup")))
          .as("n_false_pos"))
      agg.crossJoin(broadcast(nKeys)).crossJoin(broadcast(bits))
        .select(col("n_standing_keys"), col("bits_set"),
          expr(s"bits_set * 1000000 div $M").as("fill_ppm"),
          col("n_batch"), col("n_positive"), col("n_true_dup"),
          col("n_false_pos"),
          expr("CASE WHEN n_batch - n_true_dup > 0 THEN n_false_pos " +
            "* 1000000 div (n_batch - n_true_dup) ELSE 0 END")
            .as("fpr_ppm"),
          expr("(n_batch - n_positive) * 1000000 div n_batch")
            .as("skipped_lookup_ppm"))
    },
    Some {
      val posSelects = (0 until 4).map { i =>
        s"SELECT ${Portable.h32Duck(s"'b${i}_' || key")} % 16384 AS pos " +
          "FROM sk"
      }.mkString(" UNION ALL ")
      val probePos = (0 until 4).map { i =>
        s"SELECT doc_id, key, " +
          s"${Portable.h32Duck(s"'b${i}_' || key")} % 16384 AS pos FROM bt"
      }.mkString(" UNION ALL ")
      s"""WITH keyed AS (SELECT doc_id, md5(trim(regexp_replace(
          regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
          ' +', ' ', 'g'))) AS key FROM documents),
      sk AS (SELECT DISTINCT key FROM keyed WHERE doc_id % 10 >= 2),
      bp AS (SELECT DISTINCT pos FROM ($posSelects)),
      bt AS (SELECT doc_id, key FROM keyed WHERE doc_id % 10 < 2),
      pr AS (SELECT doc_id, count(*)::BIGINT AS n_match
        FROM ($probePos) p WHERE pos IN (SELECT pos FROM bp)
        GROUP BY doc_id),
      vd AS (SELECT b.doc_id,
          CASE WHEN coalesce(n_match, 0) = 4 THEN 1 ELSE 0 END
            ::BIGINT AS positive,
          CASE WHEN b.key IN (SELECT key FROM sk) THEN 1 ELSE 0 END
            ::BIGINT AS is_dup
        FROM bt b LEFT JOIN pr ON pr.doc_id = b.doc_id),
      ag AS (SELECT count(*)::BIGINT AS n_batch,
          sum(positive)::BIGINT AS n_positive,
          sum(is_dup)::BIGINT AS n_true_dup,
          sum(positive * (1 - is_dup))::BIGINT AS n_false_pos FROM vd),
      nk AS (SELECT count(*)::BIGINT AS n_standing_keys FROM sk),
      bs AS (SELECT count(*)::BIGINT AS bits_set FROM bp)
      SELECT n_standing_keys, bits_set,
        bits_set * 1000000 // 16384 AS fill_ppm,
        n_batch, n_positive, n_true_dup, n_false_pos,
        CASE WHEN n_batch - n_true_dup > 0 THEN n_false_pos * 1000000
          // (n_batch - n_true_dup) ELSE 0 END AS fpr_ppm,
        (n_batch - n_positive) * 1000000 // n_batch
          AS skipped_lookup_ppm
      FROM ag, nk, bs"""
    })

  // ---------- q509: exact heavy hitters via native MG sketch ----------

  /** Corpus-wide heavy-hitter tokens (boilerplate / stopword discovery
    * for pretraining-data curation) — the two-pass EXACT heavy-hitters
    * shape built on the library's native Misra–Gries
    * TypedImperativeAggregate (`graft_freq_sketch`, FreqSketch.scala):
    *
    *   Pass 1: ONE fixed-width sketch pass over the exploded token
    *     stream. ObjectHashAggregate keeps a ≤K-counter MG summary per
    *     map task and the shuffle carries K counters per partition —
    *     never the tokens. By the MG guarantee every token with
    *     true count > n/(K+1) is in the summary.
    *   Pass 2: the ≤K candidates broadcast back as a semi-join; only
    *     candidate-token rows reach the exact groupBy shuffle. The
    *     final filter cnt·(K+1) > n keeps exactly the tokens the
    *     theorem guarantees pass 1 captured — so the result is
    *     deterministic and independent of sketch merge order (which is
    *     why `est` is never emitted).
    *
    * At 100 TB: pass 1 is scan-bound with O(K·tasks) shuffle bytes;
    * pass 2's shuffle is bounded by the heavy tokens' own rows. The
    * oracle is the definitionally-exact form (full groupBy + HAVING).
    */
  private val q509 = QueryDef(
    "q509_heavy_hitter_tokens",
    (s, dir) => {
      val kHh = 64
      val toks = Fixtures.table(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .where(col("token") =!= "")
      val sketch = toks.agg(
        expr(s"graft_freq_sketch(token, $kHh)").as("sk"),
        count(lit(1)).as("n"))
      val cand = sketch.select(col("n"),
        explode(col("sk.token")).as("token"))
      toks.join(broadcast(cand), Seq("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("cnt"), max(col("n")).as("n"))
        .where(col("cnt") * (kHh + 1) > col("n"))
        .select(col("token"), col("cnt"),
          round(col("cnt").cast("double") / col("n"), 9).as("share"))
        .orderBy(col("cnt").desc, col("token"))
    },
    Some("""WITH t AS (SELECT unnest(string_split(text, ' ')) AS token
        FROM documents),
      tk AS (SELECT token FROM t WHERE token <> ''),
      tot AS (SELECT count(*)::BIGINT AS n FROM tk)
      SELECT token, count(*)::BIGINT AS cnt,
        round(count(*)::DOUBLE / max(n), 9) AS share
      FROM tk, tot GROUP BY token HAVING count(*) * 65 > max(n)
      ORDER BY cnt DESC, token"""))

  // ---------- q511: per-group heavy hitters (grouped MG sketch) --------

  /** q509's two-pass exact-heavy-hitter shape, GROUPED: boilerplate
    * tokens per language (the per-slice curation view — a token can be
    * boilerplate in `de` while rare corpus-wide). Pass 1 is ONE grouped
    * ObjectHashAggregate carrying a ≤K-counter MG state per (task,
    * lang) — the sketch state replaces the per-(lang, token) shuffle a
    * direct groupBy would pay. Candidates (≤K·|langs| rows) broadcast
    * into the exact re-count, whose shuffle carries only
    * candidate-token rows. Same theorem threshold per group:
    * cnt·(K+1) > n_lang guarantees pass-1 capture, so the result is
    * deterministic regardless of sketch merge order.
    */
  private val q511 = QueryDef(
    "q511_heavy_hitters_by_lang",
    (s, dir) => {
      val kHh = 32
      val toks = Fixtures.table(s, dir, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("token"))
        .where(col("token") =!= "")
      val sk = toks.groupBy(col("lang")).agg(
        expr(s"graft_freq_sketch(token, $kHh)").as("sk"),
        count(lit(1)).as("n"))
      val cand = sk.select(col("lang"), col("n"),
        explode(col("sk.token")).as("token"))
      toks.join(broadcast(cand), Seq("lang", "token"))
        .groupBy(col("lang"), col("token"))
        .agg(count(lit(1)).as("cnt"), max(col("n")).as("n"))
        .where(col("cnt") * (kHh + 1) > col("n"))
        .select(col("lang"), col("token"), col("cnt"),
          round(col("cnt").cast("double") / col("n"), 9).as("share"))
        .orderBy(col("lang"), col("cnt").desc, col("token"))
    },
    Some("""WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS token
        FROM documents),
      tk AS (SELECT lang, token FROM t WHERE token <> ''),
      tot AS (SELECT lang, count(*)::BIGINT AS n FROM tk GROUP BY 1)
      SELECT tk.lang AS lang, token, count(*)::BIGINT AS cnt,
        round(count(*)::DOUBLE / max(n), 9) AS share
      FROM tk JOIN tot ON tk.lang = tot.lang
      GROUP BY tk.lang, token HAVING count(*) * 33 > max(n)
      ORDER BY lang, cnt DESC, token"""))

  // ---------- q515: heavy-hitter drift between snapshots ---------------

  /** Boilerplate DRIFT between two corpus snapshots (q492's modular
    * carve convention: old = doc_id % 3 ≠ 0, new = doc_id % 3 ≠ 1 —
    * overlapping thirds, so real churn): each snapshot's heavy-hitter
    * token set found by its own MG sketch pass (q509's two-pass
    * shape), the ≤2K candidate union broadcast into ONE exact re-count
    * per snapshot, then a token-level full-outer comparison — status
    * gained/lost/stable by the theorem threshold cnt·(K+1) > n within
    * each snapshot. The monitoring view a curation pipeline alerts on:
    * a template suddenly entering the heavy set is an ingest anomaly
    * (new crawler boilerplate), one leaving is a filter regression.
    * Sketches only FIND candidates; status and counts are exact, so
    * the oracle (two HAVING sets full-outer joined, candidate re-count)
    * never references the sketch. Scale: two fixed-width sketch passes
    * + two candidate-bounded count shuffles.
    */
  private val q515 = QueryDef(
    "q515_heavy_hitter_drift",
    (s, dir) => {
      val kHh = 64
      val docs = Fixtures.table(s, dir, "documents")
      def toks(snap: String) = docs.where(expr(snap))
        .select(explode(split(col("text"), " ")).as("token"))
        .where(col("token") =!= "")
      val tOld = toks("doc_id % 3 <> 0")
      val tNew = toks("doc_id % 3 <> 1")
      // ONE pass per snapshot yields sketch AND n (the q509 shape);
      // frozen because both the candidate union and the per-side total
      // consume it — without the freeze each consumer would recompute
      // the full explode+aggregate scan.
      def sketchRow(t: org.apache.spark.sql.DataFrame) = PlanCache.freeze(
        t.agg(expr(s"graft_freq_sketch(token, $kHh)").as("sk"),
          count(lit(1)).as("n")))
      val skOld = sketchRow(tOld)
      val skNew = sketchRow(tNew)
      val cand = skOld.select(explode(col("sk.token")).as("token"))
        .unionByName(skNew.select(explode(col("sk.token")).as("token")))
        .distinct()
      def counts(t: org.apache.spark.sql.DataFrame,
          sk1: org.apache.spark.sql.DataFrame, side: String) =
        t.join(broadcast(cand), Seq("token"))
          .groupBy(col("token"))
          .agg(count(lit(1)).as(s"cnt_$side"))
          .crossJoin(broadcast(sk1.select(col("n").as(s"n_$side"))))
      counts(tOld, skOld, "old")
        .join(counts(tNew, skNew, "new"), Seq("token"), "full_outer")
        .select(col("token"),
          coalesce(col("cnt_old"), lit(0L)).as("cnt_old"),
          coalesce(col("cnt_new"), lit(0L)).as("cnt_new"),
          (coalesce(col("cnt_old"), lit(0L)) * (kHh + 1)
            > coalesce(col("n_old"), lit(Long.MaxValue))).as("heavy_old"),
          (coalesce(col("cnt_new"), lit(0L)) * (kHh + 1)
            > coalesce(col("n_new"), lit(Long.MaxValue))).as("heavy_new"))
        .where(col("heavy_old") || col("heavy_new"))
        .select(col("token"), col("cnt_old"), col("cnt_new"),
          when(col("heavy_old") && col("heavy_new"), "stable")
            .when(col("heavy_new"), "gained").otherwise("lost")
            .as("status"))
        .orderBy("token")
    },
    Some("""WITH t_old AS (SELECT unnest(string_split(text, ' ')) AS token
        FROM documents WHERE doc_id % 3 <> 0),
      t_new AS (SELECT unnest(string_split(text, ' ')) AS token
        FROM documents WHERE doc_id % 3 <> 1),
      co AS (SELECT token, count(*)::BIGINT AS cnt_old FROM t_old
        WHERE token <> '' GROUP BY 1),
      cn AS (SELECT token, count(*)::BIGINT AS cnt_new FROM t_new
        WHERE token <> '' GROUP BY 1),
      no AS (SELECT sum(cnt_old)::BIGINT AS n_old FROM co),
      nn AS (SELECT sum(cnt_new)::BIGINT AS n_new FROM cn),
      j AS (SELECT coalesce(co.token, cn.token) AS token,
          coalesce(cnt_old, 0)::BIGINT AS cnt_old,
          coalesce(cnt_new, 0)::BIGINT AS cnt_new,
          coalesce(cnt_old, 0) * 65 > n_old AS heavy_old,
          coalesce(cnt_new, 0) * 65 > n_new AS heavy_new
        FROM co FULL OUTER JOIN cn ON co.token = cn.token, no, nn)
      SELECT token, cnt_old, cnt_new,
        CASE WHEN heavy_old AND heavy_new THEN 'stable'
          WHEN heavy_new THEN 'gained' ELSE 'lost' END AS status
      FROM j WHERE heavy_old OR heavy_new ORDER BY token"""))

  // ---------- q519: weighted sample without replacement (A-ES) ---------

  /** Deterministic weighted sampling WITHOUT replacement — Efraimidis–
    * Spirakis (A-ES, IPL 2006): each doc draws u ∈ (0,1) from the
    * portable 52-bit hash of its id and competes with key
    * −ln(u)/w (equivalent ordering to u^(1/w)); the k smallest keys
    * are EXACTLY a weight-proportional sample without replacement.
    * Weight = n_chars, so long documents are proportionally favored —
    * the length-balanced doc sampler a mixing pipeline uses where
    * uniform sampling (q482) would under-represent long-tail tokens.
    *
    * Deterministic by the library's sketch rule: u comes from a hash,
    * not rand(), so the same corpus always yields the same sample and
    * the DuckDB oracle reproduces it bit-for-bit; keys are rounded to
    * 9 decimals with a doc_id tie-break so cross-engine libm ulp
    * differences cannot reorder ranks. Residual risk (documented, not
    * eliminated): the tie-break only fires on exactly-equal rounded
    * keys, so a cross-engine ln() ulp difference landing EXACTLY on a
    * rounding boundary could still flip the 9th decimal and swap two
    * ranks near the k=100 cutoff. No exact rational equivalent of the
    * −ln(u)/w ordering exists (it is genuinely transcendental in u and
    * w jointly), so if a boundary flip ever surfaces at a new SF the
    * fix is to compare ranked SETS rather than exact ranks. Scale shape: key is a scan
    * projection; the global bottom-k is TakeOrderedAndProject (map-side
    * partial top-k, ≤k rows per partition to the driver-side merge —
    * no full sort, no full shuffle). Top-k selection over weights, not
    * a per-row filter — the sample size is exact, unlike Bernoulli
    * p·w sampling whose size is only expected.
    */
  private val q519 = QueryDef(
    "q519_weighted_sample",
    (s, dir) => {
      val kS = 100
      Fixtures.table(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          expr(s"round(-ln((${Portable.h52Spark("concat('ws_', cast(doc_id AS STRING))")} + 1.0) / 4503599627370497.0) / n_chars, 9)")
            .as("es_key"))
        .orderBy(col("es_key"), col("doc_id"))
        .limit(kS)
        .withColumn("rank", expr(
          "row_number() OVER (ORDER BY es_key, doc_id)"))
        .select(col("rank"), col("doc_id"), col("n_chars"), col("es_key"))
    },
    Some(s"""WITH keyed AS (SELECT doc_id, n_chars,
        round(-ln((${Portable.h52Duck("'ws_' || doc_id::VARCHAR")} + 1.0)
          / 4503599627370497.0) / n_chars, 9) AS es_key
      FROM documents),
      r AS (SELECT doc_id, n_chars, es_key,
        row_number() OVER (ORDER BY es_key, doc_id) AS rank FROM keyed)
      SELECT rank, doc_id, n_chars, es_key FROM r
      WHERE rank <= 100 ORDER BY rank"""))

  // ---------- q521: PERSISTED sketch-state round-trip -------------------

  /** The production contract q478 only proves in-plan: sketch state
    * must survive a PARQUET ROUND-TRIP between sessions — the standing
    * corpus's per-group KMV state is written to storage by one job and
    * merged with a later ingest batch's state by ANOTHER job that never
    * rescans the standing corpus. This query executes that contract
    * end-to-end inside the gate: phase 1 aggregates the standing side's
    * KMV state (n + the K min hashes per group) and WRITES it to a
    * scratch parquet artifact; phase 2 REOPENS the artifact with a
    * fresh read (schema re-inferred from the file, no lineage to the
    * standing scan), merges it with the in-plan batch state, and proves
    * `merge_equals_full` against an independent full recompute — KMV
    * union is exactly mergeable, so the persisted estimate is
    * bit-identical. PersistedSketchSpec additionally reopens the same
    * artifact in a `newSession()` and across Bloom/Misra–Gries states.
    * Scale: the artifact is ≤ K longs per group — the "standing index"
    * whose size is independent of corpus size; the batch-side work is
    * the only per-ingest cost.
    */
  private val q521 = QueryDef(
    "q521_persisted_kmv",
    (s, dir) => {
      import s.implicits._
      val o = Fixtures.table(s, dir, "orders")
      def kmvState(side: DataFrame) = side
        .select(col("o_orderpriority"),
          expr(h32Spark("cast(o_custkey AS STRING)")).as("h")).distinct()
        .as[(String, Long)]
        .groupByKey(_._1).mapValues(_._2)
        .agg(new KmvAgg(K).toColumn.name("kmv"))
        .toDF("o_orderpriority", "kmv")
      // Per-run scratch path (applicationId suffix): two concurrent
      // runs at the same SF must not race on mode(overwrite) — phase 2
      // could read the other run's half-overwritten artifact.
      val stateDir = s"${sys.props("java.io.tmpdir")}/graft_q521_" +
        dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
        s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
      // phase 1: persist the standing side's state
      kmvState(o.where(col("o_orderkey") % 10 >= 2))
        .select(col("o_orderpriority"), col("kmv.n").as("n_standing"),
          col("kmv.mins").as("mins_standing"))
        .write.mode("overwrite").parquet(stateDir)
      // phase 2: reopen the artifact (no lineage to the standing scan)
      // and merge with the batch's in-plan state
      val loaded = s.read.parquet(stateDir)
      val batch = kmvState(o.where(col("o_orderkey") % 10 < 2))
        .select(col("o_orderpriority").as("b_pri"),
          col("kmv.mins").as("mins_batch"))
      val full = kmvState(o)
        .select(col("o_orderpriority").as("f_pri"),
          expr(s"CASE WHEN kmv.n >= $K THEN ${K - 1}.0 * 4294967296.0 " +
            s"/ try_element_at(kmv.mins, $K) " +
            "ELSE cast(kmv.n AS DOUBLE) END").as("est_full"))
      val exact = o.groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_exact"))
      loaded.join(batch, col("o_orderpriority") === col("b_pri"))
        .withColumn("merged", expr(
          s"slice(array_sort(array_distinct(" +
            s"concat(mins_standing, mins_batch))), 1, $K)"))
        .withColumn("est_merged", expr(
          s"CASE WHEN size(merged) >= $K THEN ${K - 1}.0 * 4294967296.0 " +
            s"/ try_element_at(merged, $K) " +
            "ELSE cast(size(merged) AS DOUBLE) END"))
        .join(full, col("o_orderpriority") === col("f_pri"))
        .join(exact, "o_orderpriority")
        .select(col("o_orderpriority"), col("n_exact"),
          col("est_merged"), col("est_full"),
          (col("est_merged") === col("est_full")).as("merge_equals_full"))
        .orderBy("o_orderpriority")
    },
    Some(s"""WITH h AS (SELECT DISTINCT o_orderpriority,
          ${h32Duck("o_custkey::VARCHAR")} AS h,
          CASE WHEN o_orderkey % 10 < 2 THEN 1 ELSE 0 END AS isb
        FROM orders),
      side AS (SELECT o_orderpriority, isb, h,
          row_number() OVER (PARTITION BY o_orderpriority, isb
            ORDER BY h) AS rn
        FROM h),
      hf AS (SELECT DISTINCT o_orderpriority, h FROM h),
      fullr AS (SELECT o_orderpriority, h,
          row_number() OVER (PARTITION BY o_orderpriority ORDER BY h)
            AS rn,
          count(*) OVER (PARTITION BY o_orderpriority) AS nd
        FROM hf),
      est_full AS (SELECT o_orderpriority,
          CASE WHEN max(nd) >= $K THEN ${K - 1}.0 * 4294967296.0
            / max(CASE WHEN rn = $K THEN h END)
          ELSE cast(max(nd) AS DOUBLE) END AS est_full
        FROM fullr GROUP BY 1),
      mu AS (SELECT o_orderpriority, h FROM side WHERE rn <= $K),
      mdist AS (SELECT DISTINCT o_orderpriority, h FROM mu),
      mr AS (SELECT o_orderpriority, h,
          row_number() OVER (PARTITION BY o_orderpriority ORDER BY h)
            AS rn,
          count(*) OVER (PARTITION BY o_orderpriority) AS nm
        FROM mdist),
      est_merged AS (SELECT o_orderpriority,
          CASE WHEN max(nm) >= $K THEN ${K - 1}.0 * 4294967296.0
            / max(CASE WHEN rn = $K THEN h END)
          ELSE cast(max(nm) AS DOUBLE) END AS est_merged
        FROM mr WHERE rn <= $K GROUP BY 1),
      exact AS (SELECT o_orderpriority,
          count(DISTINCT o_custkey)::BIGINT AS n_exact
        FROM orders GROUP BY 1)
      SELECT e.o_orderpriority, n_exact, em.est_merged, ef.est_full,
        (em.est_merged = ef.est_full) AS merge_equals_full
      FROM exact e
      JOIN est_merged em ON em.o_orderpriority = e.o_orderpriority
      JOIN est_full ef ON ef.o_orderpriority = e.o_orderpriority
      ORDER BY e.o_orderpriority"""))

  val all: Seq[QueryDef] =
    Seq(q35, q36, q37, q51, q63, q66, q67, q79, q85, q86, q107, q178,
      q180, q195, q200, q264, q394, q478, q482, q483, q484, q485, q498,
      q509, q511, q515, q519, q521)
}
