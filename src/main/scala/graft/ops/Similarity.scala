package graft.ops

import graft.{Fixtures, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors)
  * — the ANN extension family (BASELINE.json north star).
  *
  *  - q22 brute-force top-k: the exact baseline. The (small) query set is
  *    broadcast; the corpus streams through one BroadcastNestedLoopJoin
  *    pass — no corpus shuffle, scales linearly in corpus size at any
  *    query-set size that fits a broadcast (the 100 TB path for
  *    "embed a batch, retrieve neighbors for each").
  *  - q23 LSH-bucketed ANN: 4 hash tables × 6 random hyperplanes.
  *    Signatures reduce each vector to 4 (table, bucket) keys; candidate
  *    generation is an equi-join on those keys (shuffle ∝ collisions,
  *    never |corpus|²), then exact cosine re-rank of candidates only.
  *    Approximate by design — recall is tuned by tables × planes — and
  *    the oracle replicates the identical construction, so results still
  *    hash-match exactly.
  *
  * Cosine on the Spark side is the native codegen'd expression
  * `graft_cosine` (expressions/CosineSimilarity.scala, registered by
  * GraftExtensions); on the oracle side the equivalent sequential folds.
  * Hyperplane weights are data-independent constants derived from md5
  * (3-decimal fixed-point in [-1, 1]) and emitted as literals into BOTH
  * dialects — precomputing planes (vs hashing per row) is also what a
  * real deployment does: planes are broadcast constants, not per-row
  * work.
  */
object Similarity {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Fixtures.table(s, dir, "embeddings")

  // ---------- shared constants ---------------------------------------

  private val Dim = 64
  private val Tables = 4
  private val PlanesPerTable = 6
  private val NPlanes = Tables * PlanesPerTable

  /** Deterministic pseudo-random plane weights from md5 — the same
    * h32 primitive the dedup family uses (first 8 md5 hex chars), so
    * the constants are reproducible from the seed strings alone.
    */
  private def h32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  private val planes: Seq[Seq[String]] =
    (0 until NPlanes).map { p =>
      (0 until Dim).map { d =>
        val v = (h32(s"hp_${p}_$d") % 2001 - 1000) / 1000.0
        f"$v%.3f" // exact 3-decimal literal; both engines parse to the
                  // same nearest double
      }
    }

  private val planesSpark: String =
    planes.map(_.map(_ + "D").mkString("array(", ", ", ")"))
      .mkString("array(", ", ", ")")
  private val planesDuck: String =
    planes.map(_.map(_ + "::DOUBLE").mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")

  /** Per-vector plane dots as a sequential left fold (order-identical in
    * both engines → bit-identical signs → identical buckets). On the
    * Spark side the dots+signs collapse into the native codegen'd
    * `graft_lsh_buckets` (expressions/LshBuckets.scala) — the HOF-lambda
    * form this replaces ran interpreted and dominated the q23 runtime.
    */
  private val dotsDuck: String =
    s"list_transform($planesDuck, w -> list_reduce(list_prepend(0.0::DOUBLE, " +
      s"list_transform(range(1, ${Dim + 1}), d -> w[d] * embedding[d]::DOUBLE)), " +
      "(acc, v) -> acc + v))"

  /** Bucket of hash table `t`: 6 sign bits of that table's plane dots. */
  private def bucketExpr(t: Int, idx: (Int) => String): String =
    (0 until PlanesPerTable).map { p =>
      s"(CASE WHEN ${idx(t * PlanesPerTable + p + 1)} >= 0.0 " +
        s"THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")

  // ---------- q22: brute-force exact top-k ---------------------------

  private[ops] val K = 5
  private[ops] val NQueries = 8

  private val q22 = QueryDef(
    "q22_knn_bruteforce",
    (s, dir) => {
      val e = emb(s, dir)
      val q = broadcast(e.where(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe")))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      e.join(q, col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          expr("graft_cosine(qe, embedding)").as("cosine"))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= K)
        .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cosine"))
        .orderBy("query_id", "rnk")
    },
    Some(s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings WHERE vec_id < $NQueries),
      s AS (SELECT query_id, b.vec_id AS neighbor_id,
          ${Dedup.cosDuck("qe", "b.embedding")} AS cosine
        FROM q JOIN embeddings b ON b.vec_id <> query_id),
      r AS (SELECT query_id, neighbor_id, cosine,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS rnk FROM s)
      SELECT query_id, rnk, neighbor_id, cosine FROM r
      WHERE rnk <= $K ORDER BY query_id, rnk"""))

  // ---------- q23: LSH-bucketed approximate top-k --------------------

  private val KAnn = 3

  private val q23 = QueryDef(
    "q23_knn_lsh",
    (s, dir) => {
      val e = emb(s, dir)
      val keys = e.select(col("vec_id"), col("embedding"),
        posexplode(expr(
          s"graft_lsh_buckets(embedding, $planesSpark, $PlanesPerTable)"))
          .as(Seq("tbl", "bucket")))
      val qk = keys.where(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          col("tbl"), col("bucket"))
      // candidate generation: equi-join on (table, bucket); candidates
      // seen in several tables are deduped before the exact re-rank.
      val cand = qk.join(keys.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("ne"), col("tbl"), col("bucket")),
          Seq("tbl", "bucket"))
        .where(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("qe"), col("neighbor_id"), col("ne"))
        .distinct()
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      cand
        .select(col("query_id"), col("neighbor_id"),
          expr("graft_cosine(qe, ne)").as("cosine"))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= KAnn)
        .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cosine"))
        .orderBy("query_id", "rnk")
    },
    Some {
      val bucketSelects = (0 until Tables).map { t =>
        s"SELECT vec_id, embedding, $t AS tbl, " +
          s"${bucketExpr(t, i => s"dots[$i]")} AS bucket FROM dotted"
      }.mkString(" UNION ALL ")
      s"""WITH dotted AS (SELECT vec_id, embedding, $dotsDuck AS dots
        FROM embeddings),
      keys AS ($bucketSelects),
      cand AS (SELECT DISTINCT q.vec_id AS query_id, q.embedding AS qe,
          n.vec_id AS neighbor_id, n.embedding AS ne
        FROM keys q JOIN keys n
        ON q.tbl = n.tbl AND q.bucket = n.bucket
          AND q.vec_id < $NQueries AND n.vec_id <> q.vec_id),
      scored AS (SELECT query_id, neighbor_id,
          ${Dedup.cosDuck("qe", "ne")} AS cosine FROM cand),
      r AS (SELECT query_id, neighbor_id, cosine,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS rnk FROM scored)
      SELECT query_id, rnk, neighbor_id, cosine FROM r
      WHERE rnk <= $KAnn ORDER BY query_id, rnk"""
    })

  // ---------- q33: per-cell centroids (IVF coarse codebook) -----------

  /** Element-wise centroid of each label cell. Distributed shape:
    * posexplode to (label, pos, val) rows and aggregate per (label, pos)
    * — the shuffle key space is labels × dims, so this scales to any
    * corpus size with no per-group memory beyond one cell's column.
    *
    * Determinism: the element sum is an ordered fold over the cell's
    * values sorted by vec_id (collect_list → sort_array → aggregate on
    * the Spark side, `list(... ORDER BY vec_id)` → `list_reduce` in the
    * oracle), because a plain SUM(double) is execution-order-dependent.
    * A production pipeline would use plain sum/avg; the ordered fold is
    * the price of bit-exact cross-engine verification.
    */
  private val centSparkSum =
    "aggregate(transform(sort_array(collect_list(struct(vec_id, val))), " +
      "s -> cast(s.val AS DOUBLE)), cast(0 AS DOUBLE), (acc, v) -> acc + v)"

  private val centDuckCte =
    s"""ex AS (SELECT label, vec_id, pos - 1 AS pos, embedding[pos] AS val
        FROM embeddings CROSS JOIN range(1, ${Dim + 1}) t(pos)),
      cent AS (SELECT label, pos,
        list_reduce(list_prepend(0.0::DOUBLE, list(val::DOUBLE ORDER BY vec_id)),
          (acc, v) -> acc + v) / count(*) AS centroid
        FROM ex GROUP BY label, pos)"""

  private def centroids(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .select(col("label"), col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "val")))
      .groupBy(col("label"), col("pos"))
      .agg(expr(centSparkSum).as("sum_val"), count(lit(1)).as("n"))
      .select(col("label"), col("pos"),
        (col("sum_val") / col("n")).as("centroid"))

  /** Shared codebook materialization: q33 (dump), q34 (single-probe)
    * and q78 (multi-probe) all start from the same centroid table; one
    * PlanCache entry per run replaces three corpus-wide posexplode
    * aggregations. */
  private def persistedCentroids(s: SparkSession, dir: String): DataFrame =
    PlanCache.getOrBuild(s, dir, "centroids")(centroids(s, dir))

  private def codebook(s: SparkSession, dir: String): DataFrame =
    persistedCentroids(s, dir).groupBy(col("label"))
      .agg(expr("transform(sort_array(collect_list(struct(pos, centroid))), " +
        "s -> s.centroid)").as("cvec"))

  private val q33 = QueryDef(
    "q33_centroids",
    (s, dir) => persistedCentroids(s, dir).orderBy("label", "pos"),
    Some(s"""WITH $centDuckCte
      SELECT label, pos, centroid FROM cent ORDER BY label, pos"""))

  // ---------- q34: IVF-style ANN (coarse quantize → probe → re-rank) --

  /** Inverted-file ANN search: route each query to its nearest cell
    * centroid (coarse quantization), then run exact top-k only inside
    * that cell — the corpus scan shrinks by ~|cells|×. Here the cells
    * are the given `label` partitions standing in for a k-means
    * codebook (training the codebook is an offline job; the SEARCH
    * path — tiny broadcast codebook, equi-join on cell id, exact
    * re-rank — is exactly this plan at any scale). Single-probe by
    * design; recall is tuned by probing more cells.
    */
  private val q34 = QueryDef(
    "q34_knn_ivf",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cvecs = codebook(s, dir)
      val q = emb(s, dir).where(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      val wCell = Window.partitionBy(col("query_id"))
        .orderBy(col("ccos").desc, col("label"))
      val assign = q.crossJoin(broadcast(cvecs))
        .select(col("query_id"), col("qe"), col("label"),
          expr("graft_cosine(qe, cvec)").as("ccos"))
        .withColumn("rn", row_number().over(wCell))
        .where(col("rn") === 1)
        .select(col("query_id"), col("qe"), col("label").as("cell"))
      val corpus = emb(s, dir).select(col("label").as("cell"),
        col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
      val wTop = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      assign.join(corpus, Seq("cell"))
        .where(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("cell"), col("neighbor_id"),
          expr("graft_cosine(qe, ne)").as("cosine"))
        .withColumn("rnk", row_number().over(wTop))
        .where(col("rnk") <= KAnn)
        .select(col("query_id"), col("cell"), col("rnk"),
          col("neighbor_id"), col("cosine"))
        .orderBy("query_id", "rnk")
    },
    Some(s"""WITH $centDuckCte,
      cvec AS (SELECT label, list(centroid ORDER BY pos) AS cvec
        FROM cent GROUP BY label),
      q AS (SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings WHERE vec_id < $NQueries),
      cellscore AS (SELECT query_id, qe, label,
          ${Dedup.cosDuck("qe", "cvec")} AS ccos
        FROM q CROSS JOIN cvec),
      assign AS (SELECT query_id, qe, label AS cell FROM (
          SELECT query_id, qe, label, row_number() OVER (
            PARTITION BY query_id ORDER BY ccos DESC, label) AS rn
          FROM cellscore) WHERE rn = 1),
      scored AS (SELECT query_id, cell, b.vec_id AS neighbor_id,
          ${Dedup.cosDuck("qe", "b.embedding")} AS cosine
        FROM assign a JOIN embeddings b
        ON b.label = a.cell AND b.vec_id <> a.query_id),
      r AS (SELECT query_id, cell, neighbor_id, cosine,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS rnk FROM scored)
      SELECT query_id, cell, rnk, neighbor_id, cosine FROM r
      WHERE rnk <= $KAnn ORDER BY query_id, rnk"""))

  // ---------- q78: IVF multi-probe ANN ---------------------------------

  /** Multi-probe IVF search — the standard recall knob on q34's
    * single-probe plan: each query probes its top-`PProbe` cells by
    * centroid cosine instead of only the nearest, then the exact
    * re-rank runs over the union of those cells' members. Recall
    * approaches exhaustive as PProbe → |cells| while the scanned
    * fraction stays PProbe/|cells|; the plan shape is unchanged
    * (broadcast codebook cross-join for routing, equi-join on cell id
    * for the scan — no new shuffle class), which is exactly why
    * multi-probe is the tuning knob a deployment turns first. Each
    * corpus vector lives in exactly one cell, so probing several cells
    * never duplicates a (query, neighbor) pair and needs no dedup.
    */
  private val PProbe = 3

  private val q78 = QueryDef(
    "q78_knn_ivf_multiprobe",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val q = emb(s, dir).where(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      val wCell = Window.partitionBy(col("query_id"))
        .orderBy(col("ccos").desc, col("label"))
      val probes = q.crossJoin(broadcast(codebook(s, dir)))
        .select(col("query_id"), col("qe"), col("label"),
          expr("graft_cosine(qe, cvec)").as("ccos"))
        .withColumn("rn", row_number().over(wCell))
        .where(col("rn") <= PProbe)
        .select(col("query_id"), col("qe"), col("label").as("cell"))
      val corpus = emb(s, dir).select(col("label").as("cell"),
        col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
      val wTop = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      probes.join(corpus, Seq("cell"))
        .where(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("cell"), col("neighbor_id"),
          expr("graft_cosine(qe, ne)").as("cosine"))
        .withColumn("rnk", row_number().over(wTop))
        .where(col("rnk") <= KAnn)
        .select(col("query_id"), col("cell"), col("rnk"),
          col("neighbor_id"), col("cosine"))
        .orderBy("query_id", "rnk")
    },
    Some(s"""WITH $centDuckCte,
      cvec AS (SELECT label, list(centroid ORDER BY pos) AS cvec
        FROM cent GROUP BY label),
      q AS (SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings WHERE vec_id < $NQueries),
      cellscore AS (SELECT query_id, qe, label,
          ${Dedup.cosDuck("qe", "cvec")} AS ccos
        FROM q CROSS JOIN cvec),
      probes AS (SELECT query_id, qe, label AS cell FROM (
          SELECT query_id, qe, label, row_number() OVER (
            PARTITION BY query_id ORDER BY ccos DESC, label) AS rn
          FROM cellscore) WHERE rn <= $PProbe),
      scored AS (SELECT query_id, cell, b.vec_id AS neighbor_id,
          ${Dedup.cosDuck("qe", "b.embedding")} AS cosine
        FROM probes a JOIN embeddings b
        ON b.label = a.cell AND b.vec_id <> a.query_id),
      r AS (SELECT query_id, cell, neighbor_id, cosine,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS rnk FROM scored)
      SELECT query_id, cell, rnk, neighbor_id, cosine FROM r
      WHERE rnk <= $KAnn ORDER BY query_id, rnk"""))

  // ---------- q80: centroid separation matrix --------------------------

  /** Pairwise cosine between all cell centroids — the cluster-quality
    * diagnostic read before trusting an IVF index: centroids with high
    * mutual cosine mean cell boundaries cut through dense regions and
    * single-probe recall (q34) will suffer there, which is precisely
    * when multi-probe (q78) earns its extra scanned fraction.
    *
    * Cost model: |cells|² pairs of Dim-length vectors — codebook-sized,
    * not corpus-sized, so the quadratic join is over a relation that
    * fits on the driver at any corpus scale (the corpus appears only
    * through the PlanCache'd centroid aggregate). Determinism: the
    * centroid is the q33 ordered-fold mean; the pair cosine is the same
    * ordered zip_with fold both engines run in identical order.
    */
  private val q80 = QueryDef(
    "q80_centroid_separation",
    (s, dir) => {
      val cb = codebook(s, dir)
      cb.alias("a").join(cb.alias("b"), col("a.label") < col("b.label"))
        .select(col("a.label").as("label_a"), col("b.label").as("label_b"),
          expr("graft_cosine(a.cvec, b.cvec)").as("cosine"))
        .orderBy("label_a", "label_b")
    },
    Some(s"""WITH $centDuckCte,
      cvec AS (SELECT label, list(centroid ORDER BY pos) AS cvec
        FROM cent GROUP BY label)
      SELECT a.label AS label_a, b.label AS label_b,
        ${Dedup.cosDuck("a.cvec", "b.cvec")} AS cosine
      FROM cvec a JOIN cvec b ON a.label < b.label
      ORDER BY label_a, label_b"""))

  // ---------- q65: int8 embedding quantization -------------------------

  /** Symmetric int8 quantization of the embedding column — the memory
    * compression step before an ANN index is shipped (4× smaller than
    * float32; recall loss is negligible at 64 dims). Per vector:
    * scale = 127 / max|v|, q_d = ⌊v_d · scale⌋. Every step is
    * deterministic IEEE arithmetic in the same order on both engines —
    * float parquet values widen exactly to double, one max, one
    * division, one multiply, floor — so the quantization hash-matches
    * bit-for-bit (round() would not: Spark rounds HALF_UP, DuckDB
    * half-even). Output is the per-vector manifest (scale, extrema,
    * checksum) a loader validates against, not the int8 payload itself
    * (list columns defeat the driver's comparator; the checksum pins
    * every element).
    *
    * Shape: posexplode to (vec, dim) rows so the whole computation is
    * two codegen'd hash aggregates (max|v|, then the quantized sum) —
    * the array-HOF form would run interpreted per element. One shuffle
    * on vec_id, output one row per vector.
    */
  private val q65 = QueryDef(
    "q65_quantize_int8",
    (s, dir) => {
      val flat = emb(s, dir)
        .select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("vec_id"), col("v").cast("double").as("v"))
      val scales = flat.groupBy(col("vec_id"))
        .agg(max(abs(col("v"))).as("maxabs"))
        .select(col("vec_id"), (lit(127.0) / col("maxabs")).as("scale"))
      flat.join(scales, "vec_id")
        .select(col("vec_id"), col("scale"),
          floor(col("v") * col("scale")).cast("long").as("q"))
        .groupBy(col("vec_id"), col("scale"))
        .agg(count(lit(1)).as("n_dims"), sum(col("q")).as("q_sum"),
          min(col("q")).as("q_min"), max(col("q")).as("q_max"))
        .orderBy("vec_id")
    },
    Some("""WITH flat AS (
        SELECT vec_id, unnest(embedding)::DOUBLE AS v FROM embeddings),
      scales AS (
        SELECT vec_id, 127.0 / max(abs(v)) AS scale
        FROM flat GROUP BY vec_id),
      q AS (
        SELECT f.vec_id, s.scale,
          floor(f.v * s.scale)::BIGINT AS q
        FROM flat f JOIN scales s ON s.vec_id = f.vec_id)
      SELECT vec_id, scale, count(*) AS n_dims, sum(q)::BIGINT AS q_sum,
        min(q) AS q_min, max(q) AS q_max
      FROM q GROUP BY vec_id, scale ORDER BY vec_id"""))

  // ---------- q102: quantizer fidelity (cell self-assignment) ---------

  /** Fraction of vectors whose nearest codebook centroid is their OWN
    * cell — the IVF health check run before trusting q34/q78 search:
    * low fidelity for a cell means its members sit closer to another
    * centroid, so single-probe recall collapses there and the
    * codebook needs retraining (or that cell needs more probes).
    * Routing is the q34 assignment plan applied to the WHOLE corpus:
    * broadcast codebook nested-loop (|cells| rows — bounded by design),
    * ordered-fold cosine per (vector, cell), argmax under a
    * (ccos desc, label) total order, then per-cell exact counts and
    * one int/int division. One corpus pass, |cells| output rows; the
    * expensive part (corpus × cells cosines) is embarrassingly
    * parallel with no shuffle until the |cells|-sized count aggregate.
    */
  private val q102 = QueryDef(
    "q102_quantizer_fidelity",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cvecs = codebook(s, dir)
        .select(col("label").as("clabel"), col("cvec"))
      val wCell = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("clabel"))
      emb(s, dir)
        .select(col("vec_id"), col("label"), col("embedding").as("e"))
        .crossJoin(broadcast(cvecs))
        .select(col("vec_id"), col("label"), col("clabel"),
          expr("graft_cosine(e, cvec)").as("ccos"))
        .withColumn("rn", row_number().over(wCell))
        .where(col("rn") === 1)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("clabel") === col("label"), 1L).otherwise(0L))
            .as("n_self"))
        .select(col("label"), col("n_vecs"), col("n_self"),
          (col("n_self").cast("double") / col("n_vecs")).as("fidelity"))
        .orderBy("label")
    },
    Some(s"""WITH $centDuckCte,
      cb AS (SELECT label AS clabel, list(centroid ORDER BY pos) AS cvec
        FROM cent GROUP BY label),
      scored AS (SELECT e.vec_id, e.label, cb.clabel,
          ${Dedup.cosDuck("e.embedding", "cb.cvec")} AS ccos
        FROM embeddings e CROSS JOIN cb),
      best AS (SELECT vec_id, label, clabel, row_number() OVER (
          PARTITION BY vec_id ORDER BY ccos DESC, clabel) AS rn
        FROM scored),
      agg AS (SELECT label, count(*) AS n_vecs,
          sum(CASE WHEN clabel = label THEN 1 ELSE 0 END) AS n_self
        FROM best WHERE rn = 1 GROUP BY label)
      SELECT label, n_vecs::BIGINT AS n_vecs, n_self::BIGINT AS n_self,
        n_self::DOUBLE / n_vecs AS fidelity
      FROM agg ORDER BY label"""))

  // ---------- q112: embedding norm diagnostics ------------------------

  /** Per-label L2-norm profile of the embedding table — the sanity
    * pass run BEFORE any cosine-based operator: zero vectors make
    * cosine undefined (0/0), a wide norm spread means the vectors
    * aren't normalized so dot-product shortcuts are invalid, and a
    * label whose norm band differs from the rest usually marks a
    * different encoder version. ‖v‖² is a per-ROW left fold in the
    * q21 operation order (bit-identical on both engines), sqrt is one
    * libm call on an identical input, min/max order statistics are
    * exact, and the mean is pinned to integer nano-units (q96 rule)
    * for an order-free sum. One narrow corpus pass, |labels| rows,
    * map-side partial aggregation throughout.
    */
  private val q112 = QueryDef(
    "q112_embedding_norms",
    (s, dir) => {
      val n2 = "aggregate(transform(embedding, " +
        "x -> cast(x AS DOUBLE) * cast(x AS DOUBLE)), " +
        "cast(0 AS DOUBLE), (acc, v) -> acc + v)"
      emb(s, dir)
        .select(col("label"), col("vec_id"),
          expr(s"sqrt($n2)").as("norm"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("norm") === 0.0, 1L).otherwise(0L)).as("n_zero"),
          min(col("norm")).as("min_norm"),
          max(col("norm")).as("max_norm"),
          (sum(round(col("norm") * lit(1e9)).cast("long")).cast("double")
            / lit(1e9) / count(lit(1))).as("mean_norm"))
        .orderBy("label")
    },
    Some("""WITH norms AS (SELECT label, vec_id,
        sqrt(list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)),
          (acc, v) -> acc + v)) AS norm
      FROM embeddings)
      SELECT label, count(*)::BIGINT AS n_vecs,
        sum(CASE WHEN norm = 0.0 THEN 1 ELSE 0 END)::BIGINT AS n_zero,
        min(norm) AS min_norm, max(norm) AS max_norm,
        sum(round(norm * 1e9)::BIGINT)::DOUBLE / 1e9 / count(*)
          AS mean_norm
      FROM norms GROUP BY label ORDER BY label"""))

  // ---------- q123: cross-modal length–affinity correlation ------------

  /** Pearson correlation, per label, between a document's length
    * (n_chars) and its embedding's cosine to its OWN label centroid —
    * the cross-modal encoder diagnostic: a strong correlation means
    * the encoder's cluster geometry is length-biased (short docs sit
    * at cell edges), so centroid-routed search (q34/q78) and
    * fidelity (q102) silently degrade by document length. (The naive
    * version of this check — length vs NORM — is degenerate on any
    * normalized encoder, this fixture included: norms are constant,
    * r undefined; affinity to the centroid varies even on the unit
    * sphere.) Machinery is q75's exact-moment contract: x = n_chars
    * (int64), y = the q102 ordered-fold cosine pinned to integer
    * micro-units, five moment sums in DECIMAL(18,0)-cast terms,
    * Pearson applied once with a NULLIF zero-variance guard, rounded
    * to 12. Shape: broadcast codebook join (|labels| rows) + one
    * embeddings⋈documents FK equi-join (the q106 edge), then a
    * moments aggregate into |labels| rows.
    */
  private val q123 = QueryDef(
    "q123_length_affinity_corr",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val d = Fixtures.table(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 0))
      emb(s, dir)
        .select(col("label"), col("vec_id"), col("embedding").as("e"))
        .join(broadcast(codebook(s, dir)), "label")
        .select(col("label"), col("vec_id"),
          round(expr("graft_cosine(e, cvec)") * lit(1e6))
            .cast("long").as("y"))
        .join(d, col("vec_id") === col("doc_id"))
        .select(col("label"), dec(col("n_chars")).as("x"), dec(col("y")).as("y"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .selectExpr("label", "n",
          "round((cast(n AS DOUBLE) * cast(sxy AS DOUBLE) - " +
            "cast(sx AS DOUBLE) * cast(sy AS DOUBLE)) / " +
            "nullif(sqrt(cast(n AS DOUBLE) * cast(sxx AS DOUBLE) - " +
            "cast(sx AS DOUBLE) * cast(sx AS DOUBLE)) * " +
            "sqrt(cast(n AS DOUBLE) * cast(syy AS DOUBLE) - " +
            "cast(sy AS DOUBLE) * cast(sy AS DOUBLE)), cast(0 AS DOUBLE)), " +
            "12) AS r")
        .orderBy("label")
    },
    Some(s"""WITH $centDuckCte,
      cb AS (SELECT label, list(centroid ORDER BY pos) AS cvec
        FROM cent GROUP BY label),
      y AS (SELECT e.label, e.vec_id,
          round(${Dedup.cosDuck("e.embedding", "cb.cvec")} * 1e6)::BIGINT
            AS y
        FROM embeddings e JOIN cb ON cb.label = e.label),
      pairs AS (SELECT label, cast(n_chars AS DECIMAL(18,0)) AS x,
          cast(y AS DECIMAL(18,0)) AS y
        FROM y JOIN documents ON doc_id = vec_id),
      m AS (SELECT label, count(*)::BIGINT AS n,
          sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
          sum(x * x) AS sxx, sum(y * y) AS syy
        FROM pairs GROUP BY 1)
      SELECT label, n,
        round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
          / nullif(sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
            * sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE),
            0::DOUBLE), 12) AS r
      FROM m ORDER BY label"""))

  // ---------- q127: ANN recall audit (LSH vs exact) --------------------

  /** Recall@k of the LSH index against exact brute force — THE number
    * an ANN deployment is tuned by (tables × planes trade recall for
    * candidate volume; q81 is the same audit for MinHash signatures):
    * per query, how many of the true top-3 neighbors (q22's exact
    * ranking, cut at q23's k) did the bucketed search return? Both
    * rankings reuse this module's existing plans — the audit itself
    * adds only joins over |queries|·k rows, so it can run per-deploy
    * at any corpus size (the expensive inputs are the searches a
    * deployment runs anyway). Counts are exact; recall is one int
    * division. Left join from the exact side so a query with zero ANN
    * hits still reports recall 0 rather than vanishing.
    */
  private val q127 = QueryDef(
    "q127_ann_recall",
    (s, dir) => {
      val etop = q22.fn(s, dir).where(col("rnk") <= KAnn)
        .select(col("query_id"), col("neighbor_id"))
      val atop = q23.fn(s, dir)
        .select(col("query_id"), col("neighbor_id"))
      val hits = etop.join(atop, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
      val ec = etop.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
      val ac = atop.groupBy(col("query_id")).agg(count(lit(1)).as("n_ann"))
      ec.join(ac, Seq("query_id"), "left_outer")
        .join(hits, Seq("query_id"), "left_outer")
        .select(col("query_id"), col("n_exact"),
          coalesce(col("n_ann"), lit(0L)).as("n_ann"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          (coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_exact"))
            .as("recall"))
        .orderBy("query_id")
    },
    Some {
      val bucketSelects = (0 until Tables).map { t =>
        s"SELECT vec_id, embedding, $t AS tbl, " +
          s"${bucketExpr(t, i => s"dots[$i]")} AS bucket FROM dotted"
      }.mkString(" UNION ALL ")
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings WHERE vec_id < $NQueries),
      es AS (SELECT query_id, b.vec_id AS neighbor_id,
          ${Dedup.cosDuck("qe", "b.embedding")} AS cosine
        FROM q JOIN embeddings b ON b.vec_id <> query_id),
      er AS (SELECT query_id, neighbor_id,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS rnk FROM es),
      etop AS (SELECT query_id, neighbor_id FROM er WHERE rnk <= $KAnn),
      dotted AS (SELECT vec_id, embedding, $dotsDuck AS dots
        FROM embeddings),
      keys AS ($bucketSelects),
      cand AS (SELECT DISTINCT kq.vec_id AS query_id, kq.embedding AS qe,
          n.vec_id AS neighbor_id, n.embedding AS ne
        FROM keys kq JOIN keys n
        ON kq.tbl = n.tbl AND kq.bucket = n.bucket
          AND kq.vec_id < $NQueries AND n.vec_id <> kq.vec_id),
      ascored AS (SELECT query_id, neighbor_id,
          ${Dedup.cosDuck("qe", "ne")} AS cosine FROM cand),
      ar AS (SELECT query_id, neighbor_id,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS rnk FROM ascored),
      atop AS (SELECT query_id, neighbor_id FROM ar WHERE rnk <= $KAnn),
      hits AS (SELECT e.query_id, count(*) AS n_hit
        FROM etop e JOIN atop a
        ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
        GROUP BY 1),
      ec AS (SELECT query_id, count(*) AS n_exact FROM etop GROUP BY 1),
      ac AS (SELECT query_id, count(*) AS n_ann FROM atop GROUP BY 1)
      SELECT ec.query_id, n_exact::BIGINT AS n_exact,
        coalesce(n_ann, 0)::BIGINT AS n_ann,
        coalesce(n_hit, 0)::BIGINT AS n_hit,
        coalesce(n_hit, 0)::DOUBLE / n_exact AS recall
      FROM ec LEFT JOIN ac ON ac.query_id = ec.query_id
      LEFT JOIN hits ON hits.query_id = ec.query_id
      ORDER BY ec.query_id"""
    })

  // ---------- q130: per-dimension embedding statistics -----------------

  /** Mean and variance of every embedding DIMENSION across the corpus
    * — the dead/dominant-dimension diagnostic run before trusting
    * cosine geometry: near-zero-variance dims waste index width (and
    * break whitening), while a dim whose |mean| ≫ spread biases every
    * dot product the same direction (an encoder-version fingerprint,
    * complementing q112's per-vector norms and q123's affinity bias).
    * Determinism: each value is pinned to integer nano-units (v and
    * v² are single IEEE ops on identical floats, whole-number rounded)
    * so both moment sums are exact int64 (at 100 TB: DECIMAL(38,0));
    * mean and variance are computed from the exact sums in one
    * identical expression chain, rounded to 12. Shape: posexplode to
    * (dim, units) rows — map-side combine collapses everything into
    * |dims| cells before the one tiny shuffle; output = vector width.
    */
  private val q130 = QueryDef(
    "q130_dim_stats",
    (s, dir) => {
      emb(s, dir)
        .select(posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("dim").cast("long").as("dim"),
          round(col("v").cast("double") * lit(1e9)).cast("long").as("u"),
          round(col("v").cast("double") * col("v").cast("double") * lit(1e9))
            .cast("long").as("u2"))
        .groupBy(col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("u")).as("su"),
          sum(col("u2")).as("su2"))
        .select(col("dim"), col("n"),
          round(col("su").cast("double") / lit(1e9) / col("n"), 12)
            .as("mean"),
          round(col("su2").cast("double") / lit(1e9) / col("n")
            - (col("su").cast("double") / lit(1e9) / col("n"))
              * (col("su").cast("double") / lit(1e9) / col("n")), 12)
            .as("variance"))
        .orderBy("dim")
    },
    Some("""WITH flat AS (SELECT
          generate_subscripts(embedding, 1) - 1 AS dim,
          unnest(embedding) AS v
        FROM embeddings),
      units AS (SELECT dim, round(v::DOUBLE * 1e9)::BIGINT AS u,
          round(v::DOUBLE * v::DOUBLE * 1e9)::BIGINT AS u2
        FROM flat),
      m AS (SELECT dim, count(*) AS n, sum(u)::BIGINT AS su,
          sum(u2)::BIGINT AS su2
        FROM units GROUP BY 1)
      SELECT dim::BIGINT AS dim, n::BIGINT AS n,
        round(su::DOUBLE / 1e9 / n, 12) AS mean,
        round(su2::DOUBLE / 1e9 / n
          - (su::DOUBLE / 1e9 / n) * (su::DOUBLE / 1e9 / n), 12)
          AS variance
      FROM m ORDER BY dim"""))

  // ---------- q134: one k-means (Lloyd) refinement step -----------------

  /** One Lloyd iteration over the codebook: route every vector to its
    * nearest centroid (q102's assignment plan), recompute each cell's
    * centroid from its ASSIGNED members, and report how far each
    * centroid moved (1 − cos(old, new)) plus the assigned count — the
    * distributed k-means step an IVF codebook is refined by, built
    * from the pieces this module already verifies (routing, ordered-
    * fold centroid aggregate, codebook collect). Movement ≈ 0 with
    * stable assignment counts is the convergence signal that says the
    * codebook (and therefore q34/q78 recall) won't improve by
    * retraining. A cell that attracts no vectors keeps NULL movement
    * (both engines agree) rather than faking a zero. Shape: one
    * corpus × |cells| routing pass (no shuffle before the argmax
    * window keyed by vec_id), one (cell, dim) aggregate — the same
    * two costs as q102 + q33, composed; everything after is
    * codebook-sized.
    */
  private val q134 = QueryDef(
    "q134_kmeans_step",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cvecs = codebook(s, dir)
        .select(col("label").as("clabel"), col("cvec"))
      val wCell = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("clabel"))
      val assigned = emb(s, dir)
        .select(col("vec_id"), col("embedding").as("e"))
        .crossJoin(broadcast(cvecs.select(col("clabel"), col("cvec"))))
        .select(col("vec_id"), col("e"), col("clabel"),
          expr("graft_cosine(e, cvec)").as("ccos"))
        .withColumn("rn", row_number().over(wCell))
        .where(col("rn") === 1)
        .select(col("vec_id"), col("e"), col("clabel"))
      val newCb = assigned
        .select(col("clabel"), col("vec_id"),
          posexplode(col("e")).as(Seq("pos", "val")))
        .groupBy(col("clabel"), col("pos"))
        .agg(expr(centSparkSum).as("sum_val"), count(lit(1)).as("n"))
        .select(col("clabel"), col("pos"),
          (col("sum_val") / col("n")).as("centroid"))
        .groupBy(col("clabel"))
        .agg(expr("transform(sort_array(collect_list(struct(pos, centroid))), " +
          "s -> s.centroid)").as("nvec"))
      val counts = assigned.groupBy(col("clabel"))
        .agg(count(lit(1)).as("n_assigned"))
      cvecs
        .join(counts, Seq("clabel"), "left_outer")
        .join(newCb, Seq("clabel"), "left_outer")
        .select(col("clabel").as("label"),
          coalesce(col("n_assigned"), lit(0L)).as("n_assigned"),
          expr("round(1 - graft_cosine(cvec, nvec), 12)")
            .as("movement"))
        .orderBy("label")
    },
    Some(s"""WITH $centDuckCte,
      cb AS (SELECT label AS clabel, list(centroid ORDER BY pos) AS cvec
        FROM cent GROUP BY label),
      scored AS (SELECT e.vec_id, e.embedding, cb.clabel, cb.cvec,
          ${Dedup.cosDuck("e.embedding", "cb.cvec")} AS ccos
        FROM embeddings e CROSS JOIN cb),
      best AS (SELECT vec_id, embedding, clabel, row_number() OVER (
          PARTITION BY vec_id ORDER BY ccos DESC, clabel) AS rn
        FROM scored),
      assigned AS (SELECT vec_id, embedding, clabel FROM best WHERE rn = 1),
      ax AS (SELECT clabel, vec_id, pos - 1 AS pos, embedding[pos] AS val
        FROM assigned CROSS JOIN range(1, ${Dim + 1}) t(pos)),
      ncent AS (SELECT clabel, pos,
          list_reduce(list_prepend(0.0::DOUBLE,
            list(val::DOUBLE ORDER BY vec_id)),
            (acc, v) -> acc + v) / count(*) AS centroid
        FROM ax GROUP BY clabel, pos),
      ncb AS (SELECT clabel, list(centroid ORDER BY pos) AS nvec
        FROM ncent GROUP BY clabel),
      cnt AS (SELECT clabel, count(*) AS n_assigned FROM assigned
        GROUP BY clabel)
      SELECT cb.clabel AS label,
        coalesce(cnt.n_assigned, 0)::BIGINT AS n_assigned,
        round(1 - ${Dedup.cosDuck("cb.cvec", "ncb.nvec")}, 12) AS movement
      FROM cb
      LEFT JOIN cnt ON cnt.clabel = cb.clabel
      LEFT JOIN ncb ON ncb.clabel = cb.clabel
      ORDER BY label"""))

  // ---------- q167: PCA power-iteration step -----------------------------

  /** One power-iteration step toward the corpus's top principal
    * direction: v₁ ∝ Σᵥ (v·v₀)·v with v₀ = 𝟙/√d — the distributed
    * building block of PCA/spectral methods (the full algorithm
    * repeats this map-reduce until convergence; one verified step
    * pins the whole contract). All arithmetic is EXACT integer fixed
    * point: components lift to micros once, v₀ = 0.125 is exactly
    * 125 000 micros (d = 64 a perfect square), so each dot product is
    * an integer sum and each output dimension a DECIMAL(38,0) sum —
    * no double accumulation anywhere, hence no ordered-fold crutch.
    * The result is published scaled by max-|component| (an exact
    * aggregate), sidestepping the float √(Σs²) norm. Shape: two
    * corpus passes (dot per vector — map-side; (dim) aggregate — one
    * 64-group shuffle), output is d rows.
    */
  private val q167 = QueryDef(
    "q167_pca_power_step",
    (s, dir) => {
      val u = emb(s, dir)
        .select(col("vec_id"), posexplode(col("embedding"))
          .as(Seq("j", "x")))
        .select(col("vec_id"), col("j"),
          round(col("x").cast("double") * 1e6).cast("long").as("u"))
      val dot = u.groupBy(col("vec_id"))
        .agg(sum(col("u") * lit(125000L)).as("dot"))
      // u is lifted to DECIMAL(38,0) BEFORE the multiply: u·dot can
      // reach ~8e18 for unit-scale embeddings (int64 limit 9.2e18), and
      // Spark non-ANSI would wrap silently where DuckDB raises.
      val sD = u.join(dot, "vec_id")
        .groupBy(col("j"))
        .agg(sum(col("u").cast(org.apache.spark.sql.types.DecimalType(38, 0))
          * col("dot")).as("sd"))
      val m = sD.agg(max(abs(col("sd"))).as("m"))
      sD.crossJoin(broadcast(m))
        .select(col("j").cast("long").as("dim"),
          round(col("sd").cast("double") / col("m").cast("double"), 12)
            .as("v"))
        .orderBy("dim")
    },
    Some(s"""WITH u AS (SELECT vec_id, pos - 1 AS j,
          round(embedding[pos]::DOUBLE * 1e6)::BIGINT AS u
        FROM embeddings CROSS JOIN range(1, ${Dim + 1}) t(pos)),
      dot AS (SELECT vec_id, sum(u * 125000)::BIGINT AS dot
        FROM u GROUP BY vec_id),
      sd AS (SELECT j, sum(cast(u.u AS HUGEINT) * dot.dot) AS sd
        FROM u JOIN dot USING (vec_id) GROUP BY j),
      m AS (SELECT max(abs(sd)) AS m FROM sd)
      SELECT j::BIGINT AS dim,
        round(sd::DOUBLE / m::DOUBLE, 12) AS v
      FROM sd CROSS JOIN m ORDER BY dim"""))

  // ---------- q185: IVF cell-balance audit ----------------------------

  /** Assignment balance of the IVF coarse quantizer: route EVERY
    * corpus vector to its nearest centroid (the index-BUILD pass, not
    * q34's query-time probe) and report per-cell occupancy — the
    * audit that predicts probe latency variance before an index
    * ships: a cell holding 3× its share serves 3× the re-rank work
    * for every query it catches. Complements q102 (reconstruction
    * fidelity) and q80 (centroid separation) with the third index
    * health axis, occupancy skew. Shape: corpus scan × BROADCAST
    * |cells|-row codebook, argmin inside the per-vector partition
    * (|cells| rows), one count aggregate — the build pass is one scan
    * at any corpus size, and n_native (vecs whose source label is
    * their assigned cell) comes free off the same rows.
    */
  private val q185 = QueryDef(
    "q185_ivf_cell_balance",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cvecs = codebook(s, dir)
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("label"))
      val assigned = emb(s, dir)
        .select(col("vec_id"), col("label").as("native"),
          col("embedding").as("qe"))
        .crossJoin(broadcast(cvecs))
        .select(col("vec_id"), col("native"), col("label"),
          expr("graft_cosine(qe, cvec)").as("ccos"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
      val tot = emb(s, dir).agg(count(lit(1)).as("n_total"))
      assigned
        .select(col("label").as("cell"), col("native"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_assigned"),
          sum((col("native") === col("cell")).cast("long")).as("n_native"))
        .crossJoin(broadcast(tot))
        .select(col("cell"), col("n_assigned"), col("n_native"),
          (col("n_assigned").cast("double") / col("n_total").cast("double"))
            .as("assigned_share"))
        .orderBy("cell")
    },
    Some(s"""WITH $centDuckCte,
      cb AS (SELECT label, list(centroid ORDER BY pos) AS cvec
        FROM cent GROUP BY label),
      a AS (SELECT e.vec_id, e.label AS native, c.label AS cell,
          ${Dedup.cosDuck("e.embedding", "c.cvec")} AS ccos
        FROM embeddings e CROSS JOIN cb c),
      r AS (SELECT vec_id, native, cell,
          row_number() OVER (PARTITION BY vec_id
            ORDER BY ccos DESC, cell) AS rn FROM a),
      t AS (SELECT count(*) AS n_total FROM embeddings)
      SELECT cell, count(*) AS n_assigned,
        sum(CASE WHEN native = cell THEN 1 ELSE 0 END)::BIGINT AS n_native,
        count(*)::DOUBLE / n_total::DOUBLE AS assigned_share
      FROM r, t WHERE rn = 1 GROUP BY cell, n_total ORDER BY cell"""))

  // ---------- q202: effective dimensionality (participation ratio) ----

  /** Participation ratio of the per-dimension variance spectrum —
    * PR = (Σv)²/Σv², the standard effective-dimensionality measure
    * for an embedding space: PR ≈ d means variance is spread across
    * all d dims (healthy), PR ≪ d means a few dims carry everything
    * (anisotropic embeddings — cosine similarity degrades and an IVF
    * on them over-partitions the dominant axis). Builds on q130's
    * exact nano-unit moment pipeline; the 64 per-dim variances pin to
    * pico int64 before the two order-insensitive sums (squares
    * accumulate in DECIMAL(38,0) — pico² ≈ 10²⁰ overflows int64), and
    * PR is one textually-identical double expression.
    */
  private val q202 = QueryDef(
    "q202_participation_ratio",
    (s, dir) => {
      val vars = emb(s, dir)
        .select(posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("dim"),
          round(col("v").cast("double") * lit(1e9)).cast("long").as("u"),
          round(col("v").cast("double") * col("v").cast("double") * lit(1e9))
            .cast("long").as("u2"))
        .groupBy(col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("u")).as("su"),
          sum(col("u2")).as("su2"))
        .select(expr("""CAST(round((su2 / 1e9 / n
            - (su / 1e9 / n) * (su / 1e9 / n)) * 1e12) AS BIGINT)""")
          .as("var_pico"))
      vars
        .agg(count(lit(1)).as("n_dims"),
          sum(col("var_pico")).as("sv"),
          sum(expr("CAST(var_pico AS DECIMAL(38,0)) " +
            "* CAST(var_pico AS DECIMAL(38,0))")).as("sv2"))
        .select(col("n_dims"),
          (col("sv").cast("double") / 1e12).as("total_variance"),
          expr("""(CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
            / CAST(sv2 AS DOUBLE)""").as("participation_ratio"),
          expr("""(CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
            / CAST(sv2 AS DOUBLE) / CAST(n_dims AS DOUBLE)""")
            .as("pr_fraction"))
    },
    Some("""WITH flat AS (SELECT
          generate_subscripts(embedding, 1) - 1 AS dim,
          unnest(embedding) AS v FROM embeddings),
      units AS (SELECT dim, round(v::DOUBLE * 1e9)::BIGINT AS u,
          round(v::DOUBLE * v::DOUBLE * 1e9)::BIGINT AS u2 FROM flat),
      m AS (SELECT dim, count(*) AS n, sum(u)::BIGINT AS su,
          sum(u2)::BIGINT AS su2 FROM units GROUP BY 1),
      vars AS (SELECT round((su2 / 1e9 / n
          - (su / 1e9 / n) * (su / 1e9 / n)) * 1e12)::BIGINT AS var_pico
        FROM m)
      SELECT count(*) AS n_dims,
        sum(var_pico)::DOUBLE / 1e12 AS total_variance,
        (sum(var_pico)::DOUBLE * sum(var_pico)::DOUBLE)
          / sum(var_pico::HUGEINT * var_pico::HUGEINT)::DOUBLE
          AS participation_ratio,
        (sum(var_pico)::DOUBLE * sum(var_pico)::DOUBLE)
          / sum(var_pico::HUGEINT * var_pico::HUGEINT)::DOUBLE
          / count(*)::DOUBLE AS pr_fraction
      FROM vars"""))

  // ---------- q213: deterministic negative sampling ------------------

  /** Contrastive-training negative sampling: for every vector, k=5
    * pseudo-random corpus negatives drawn by a universal hash over
    * (vec_id, slot) — the join-free construction a 100 TB pipeline
    * needs (true random sampling would either collect ids to the
    * driver or need a per-row RNG whose seed placement Spark doesn't
    * guarantee across retries; an affine hash mod N is deterministic,
    * uniform enough, and pure projection arithmetic). The candidate
    * formula `(id + 1 + (a·id + b·slot) mod (N-1)) mod N` can never
    * return the anchor itself, so no rejection loop. One hash join
    * back to the corpus fetches each negative's label; `same_label`
    * marks collisions a trainer would down-weight (false negatives).
    * N rides in as a one-row broadcast. Output is the (anchor, slot)
    * pair table a dataloader would consume.
    */
  private val q213 = QueryDef(
    "q213_negative_sampling",
    (s, dir) => {
      val e = emb(s, dir)
      val n = e.agg(count(lit(1)).as("N"))
      val cands = e.select(col("vec_id"), col("label"))
        .crossJoin(broadcast(n))
        .select(col("vec_id"), col("label"), col("N"),
          explode(expr("sequence(0L, 4L)")).as("slot"))
        .withColumn("neg_id",
          pmod(col("vec_id") + 1L +
            pmod(col("vec_id") * lit(2654435761L) + col("slot") * lit(40503L),
              col("N") - 1L), col("N")))
      cands.join(e.select(col("vec_id").as("neg_id"),
          col("label").as("neg_label")), "neg_id")
        .select(col("vec_id"), col("slot"), col("neg_id"),
          (col("label") === col("neg_label")).cast("long").as("same_label"))
        .orderBy("vec_id", "slot")
    },
    Some("""WITH n AS (SELECT count(*) AS cnt FROM embeddings),
      cands AS (SELECT vec_id, label, slot,
          (vec_id + 1 + (vec_id * 2654435761 + slot * 40503) % (cnt - 1))
            % cnt AS neg_id
        FROM embeddings, n, (SELECT unnest([0, 1, 2, 3, 4]) AS slot))
      SELECT c.vec_id, c.slot::BIGINT AS slot, c.neg_id,
        CASE WHEN c.label = e.label THEN 1 ELSE 0 END::BIGINT
          AS same_label
      FROM cands c JOIN embeddings e ON e.vec_id = c.neg_id
      ORDER BY c.vec_id, c.slot"""))

  // ---------- q220: sampled-pair cosine histogram (hubness audit) -----

  /** Distribution of cosine similarity over deterministic hash-sampled
    * vector pairs — the embedding-space concentration audit beside
    * q202's participation ratio: a healthy space puts random-pair
    * cosines in a band near 0; a distribution piled toward 1 means
    * similarities are saturated (anisotropy / hubness) and every
    * cosine threshold downstream (q21's 0.95, IVF probe margins) stops
    * discriminating. Pairs come from q213's join-free affine-hash
    * construction (different multiplier/salt constants, so the two
    * samples are decorrelated): 8 partners per vector, a pure
    * projection fan-out + ONE hash join back to the corpus — sampled
    * pairs scale as 8N, never N². Cosines are the codegen'd
    * `graft_cosine`; bucket = floor((cos+1)·10) clamped to 19, exact
    * on both engines because the doubles are bit-identical (the q22
    * precedent); per-bucket mean pins to integer micro-units before
    * the order-insensitive sum. Output: ≤ 20 rows.
    */
  private val q220 = QueryDef(
    "q220_cosine_histogram",
    (s, dir) => {
      val e = emb(s, dir)
      val n = e.agg(count(lit(1)).as("N"))
      val pairs = e.select(col("vec_id"), col("embedding"))
        .crossJoin(broadcast(n))
        .select(col("vec_id"), col("embedding"), col("N"),
          explode(expr("sequence(0L, 7L)")).as("slot"))
        .withColumn("partner_id",
          pmod(col("vec_id") + 1L +
            pmod(col("vec_id") * lit(2246822519L) + col("slot") * lit(97931L),
              col("N") - 1L), col("N")))
      val scored = pairs
        .join(e.select(col("vec_id").as("partner_id"),
          col("embedding").as("pe")), "partner_id")
        .select(expr("graft_cosine(embedding, pe)").as("cosine"))
      val tot = scored.agg(count(lit(1)).as("total"))
      scored
        .select(least(lit(19L),
            floor((col("cosine") + lit(1.0)) * lit(10.0)).cast("long"))
            .as("bucket"),
          round(col("cosine") * lit(1e6)).cast("long").as("cos_micro"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_pairs"),
          ((sum(col("cos_micro")).cast("double")
            / count(lit(1)).cast("double")) / lit(1e6)).as("mean_cosine"))
        .crossJoin(broadcast(tot))
        .select(col("bucket"), col("n_pairs"),
          (col("n_pairs").cast("double") / col("total").cast("double"))
            .as("share"),
          col("mean_cosine"))
        .orderBy("bucket")
    },
    Some(s"""WITH n AS (SELECT count(*) AS cnt FROM embeddings),
      pairs AS (SELECT a.vec_id, a.embedding,
          (a.vec_id + 1 + (a.vec_id * 2246822519 + s.slot * 97931)
            % (n.cnt - 1)) % n.cnt AS partner_id
        FROM embeddings a, n,
          (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS slot) s),
      scored AS (SELECT
          ${Dedup.cosDuck("p.embedding", "b.embedding")} AS cosine
        FROM pairs p JOIN embeddings b ON b.vec_id = p.partner_id),
      tot AS (SELECT count(*) AS total FROM scored)
      SELECT least(19, floor((cosine + 1.0) * 10.0))::BIGINT AS bucket,
        count(*)::BIGINT AS n_pairs,
        count(*)::DOUBLE / total::DOUBLE AS share,
        (sum(round(cosine * 1e6)::BIGINT)::DOUBLE
          / count(*)::DOUBLE) / 1e6 AS mean_cosine
      FROM scored, tot GROUP BY 1, total ORDER BY bucket"""))

  // ---------- q247: Matryoshka truncation audit -------------------------

  /** Retained embedding energy under prefix truncation to 8/16/32/64
    * dims — the Matryoshka-representation audit (Kusupati et al.
    * 2022): MRL-trained encoders concentrate energy in the leading
    * dims, so ANN tiers can search a truncated prefix and re-rank
    * with the full vector; a FLAT retention curve says truncation
    * would destroy this encoder's geometry (the q202 participation
    * ratio's actionable cousin — PR says how many dims carry energy,
    * this says whether they are the FIRST ones). Per prefix: mean
    * retained norm fraction (micro-pinned before the
    * order-insensitive sum) and the share of vectors retaining ≥ 90 %
    * (compared on the pinned integer, so the cut can't flip between
    * engines); zero vectors retain 1.0 by definition. Shape: one
    * corpus pass fanned ×4 by a literal prefix array — narrow,
    * shuffle-free until the 4-row aggregate; the per-element folds
    * are the q112 ordered-fold idiom, bit-identical across engines.
    */
  private val q247 = QueryDef(
    "q247_mrl_truncation",
    (s, dir) => {
      def en(arr: String) =
        s"aggregate(transform($arr, x -> cast(x AS DOUBLE) * " +
          s"cast(x AS DOUBLE)), cast(0 AS DOUBLE), (acc, v) -> acc + v)"
      emb(s, dir)
        .select(col("vec_id"), col("embedding"),
          explode(array(lit(8), lit(16), lit(32), lit(64))).as("d"))
        .withColumn("retained_micro",
          expr(s"""CAST(round((CASE WHEN ${en("embedding")} > 0 THEN
              sqrt(${en("slice(embedding, 1, d)")})
                / sqrt(${en("embedding")})
              ELSE 1.0 END) * 1e6) AS BIGINT)"""))
        .groupBy(col("d"))
        .agg(count(lit(1)).as("n_vecs"),
          (sum(col("retained_micro")).cast("double")
            / count(lit(1)).cast("double") / lit(1e6)).as("mean_retained"),
          sum(when(col("retained_micro") >= 900000L, 1L).otherwise(0L))
            .as("n_ge90"))
        .select(col("d").cast("long").as("dim_prefix"), col("n_vecs"),
          col("mean_retained"),
          (col("n_ge90").cast("double") / col("n_vecs").cast("double"))
            .as("ge90_share"))
        .orderBy("dim_prefix")
    },
    Some("""WITH pref AS (SELECT vec_id, d,
        round((CASE WHEN list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)),
            (acc, v) -> acc + v) > 0 THEN
          sqrt(list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(embedding[1:d], x -> x::DOUBLE * x::DOUBLE)),
            (acc, v) -> acc + v))
          / sqrt(list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)),
            (acc, v) -> acc + v))
          ELSE 1.0 END) * 1e6)::BIGINT AS retained_micro
        FROM embeddings, unnest([8, 16, 32, 64]) AS t(d))
      SELECT d::BIGINT AS dim_prefix, count(*)::BIGINT AS n_vecs,
        sum(retained_micro)::DOUBLE / count(*)::DOUBLE / 1e6
          AS mean_retained,
        sum(CASE WHEN retained_micro >= 900000 THEN 1 ELSE 0 END)::DOUBLE
          / count(*)::DOUBLE AS ge90_share
      FROM pref GROUP BY 1 ORDER BY dim_prefix"""))

  // ---------- q258: SemDeDup (semantic dedup inside quantizer cells) --

  /** SemDeDup (Abbas et al. 2023, public): cluster the embedding
    * space, then call two documents semantic duplicates only when they
    * land in the SAME cell and their cosine clears the near-dup
    * threshold (the 0.3 house convention, q21) — the cell structure
    * turns a corpus² search into Σ(cell²). Routing reuses the q34
    * codebook (broadcast cross-join + per-vector argmax over a
    * |cells|-row window); the in-cell pass is an equi-join on cell id.
    * At 100 TB the codebook is trained with k ∝ N/target_cell_size so
    * cell populations stay bounded and the quadratic in-cell term is a
    * design CONSTANT per cell — exactly the published recipe; the keep
    * rule (drop the higher vec_id of any qualifying pair) matches the
    * q18/q21 family. Output: per-cell audit (assigned / dropped /
    * kept), |cells| rows.
    */
  private val q258 = QueryDef(
    "q258_semdedup",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wCell = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("label"))
      val assign = emb(s, dir).select(col("vec_id"), col("embedding"))
        .crossJoin(broadcast(codebook(s, dir)))
        .select(col("vec_id"), col("embedding"), col("label"),
          expr("graft_cosine(embedding, cvec)").as("ccos"))
        .withColumn("rn", row_number().over(wCell))
        .where(col("rn") === 1)
        .select(col("vec_id"), col("embedding"), col("label").as("cell"))
      val a = assign.select(col("cell"), col("vec_id").as("id_a"),
        col("embedding").as("ea"))
      val b = assign.select(col("cell"), col("vec_id").as("id_b"),
        col("embedding").as("eb"))
      val dropped = a.join(b, Seq("cell"))
        .where(col("id_a") < col("id_b")
          && expr("graft_cosine(ea, eb)") >= 0.3)
        .groupBy(col("cell"))
        .agg(countDistinct(col("id_b")).as("n_dropped"))
      assign.groupBy(col("cell")).agg(count(lit(1)).as("n_assigned"))
        .join(dropped, Seq("cell"), "left_outer")
        .select(col("cell").cast("long").as("cell"), col("n_assigned"),
          coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
          (col("n_assigned") - coalesce(col("n_dropped"), lit(0L)))
            .as("n_kept"))
        .orderBy("cell")
    },
    Some(s"""WITH $centDuckCte,
      cvec AS (SELECT label, list(centroid ORDER BY pos) AS cvec
        FROM cent GROUP BY label),
      cellscore AS (SELECT vec_id, embedding, cvec.label AS clabel,
          ${Dedup.cosDuck("embedding", "cvec")} AS ccos
        FROM embeddings CROSS JOIN cvec),
      assign AS (SELECT vec_id, embedding, cell FROM (
          SELECT vec_id, embedding, clabel AS cell, row_number() OVER (
            PARTITION BY vec_id ORDER BY ccos DESC, clabel) AS rn
          FROM cellscore) WHERE rn = 1),
      dropped AS (SELECT a.cell, count(DISTINCT b.vec_id) AS n_dropped
        FROM assign a JOIN assign b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE ${Dedup.cosDuck("a.embedding", "b.embedding")} >= 0.3
        GROUP BY 1),
      sizes AS (SELECT cell, count(*)::BIGINT AS n_assigned
        FROM assign GROUP BY 1)
      SELECT s.cell::BIGINT AS cell, n_assigned,
        coalesce(n_dropped, 0)::BIGINT AS n_dropped,
        (n_assigned - coalesce(n_dropped, 0))::BIGINT AS n_kept
      FROM sizes s LEFT JOIN dropped d ON s.cell = d.cell
      ORDER BY cell"""))

  // ---------- q259: cross-lingual bitext candidate mining -------------

  /** Parallel-corpus mining: surface candidate translation pairs as
    * documents in DIFFERENT languages whose embeddings are near-dups —
    * the LASER/CCMatrix recipe reduced to its Spark plan. Candidate
    * generation is the q23 banded-LSH self-join (shuffle carries only
    * (table, bucket) keys and ids, never the corpus²); the exact
    * cosine re-check runs codegen'd (`graft_cosine`) on the candidate
    * set only, and the language inequality halves the pair space
    * before scoring. Output: scored candidate pairs above the 0.3
    * house threshold, the table a translation-alignment stage
    * consumes.
    */
  private val q259 = QueryDef(
    "q259_bitext_mining",
    (s, dir) => {
      val e = emb(s, dir).select(col("vec_id"), col("embedding"))
        .join(Fixtures.table(s, dir, "documents")
          .select(col("doc_id"), col("lang")),
          col("vec_id") === col("doc_id"))
      val keys = e.select(col("doc_id"), col("lang"), col("embedding"),
        posexplode(expr(
          s"graft_lsh_buckets(embedding, $planesSpark, $PlanesPerTable)"))
          .as(Seq("tbl", "bucket")))
      val ka = keys.select(col("tbl"), col("bucket"),
        col("doc_id").as("doc_a"), col("lang").as("lang_a"),
        col("embedding").as("ea"))
      val kb = keys.select(col("tbl"), col("bucket"),
        col("doc_id").as("doc_b"), col("lang").as("lang_b"),
        col("embedding").as("eb"))
      ka.join(kb, Seq("tbl", "bucket"))
        .where(col("doc_a") < col("doc_b")
          && col("lang_a") =!= col("lang_b"))
        .select(col("doc_a"), col("doc_b"), col("lang_a"), col("lang_b"),
          col("ea"), col("eb"))
        .distinct()
        .select(col("doc_a"), col("doc_b"), col("lang_a"), col("lang_b"),
          expr("graft_cosine(ea, eb)").as("cosine"))
        .where(col("cosine") >= 0.3)
        .orderBy("doc_a", "doc_b")
    },
    Some {
      val bucketSelects = (0 until Tables).map { t =>
        s"SELECT doc_id, lang, embedding, $t AS tbl, " +
          s"${bucketExpr(t, i => s"dots[$i]")} AS bucket FROM dotted"
      }.mkString(" UNION ALL ")
      s"""WITH joined AS (SELECT d.doc_id, d.lang, e.embedding
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
      dotted AS (SELECT doc_id, lang, embedding, $dotsDuck AS dots
        FROM joined),
      keys AS ($bucketSelects),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
          a.lang AS lang_a, b.lang AS lang_b,
          a.embedding AS ea, b.embedding AS eb
        FROM keys a JOIN keys b
        ON a.tbl = b.tbl AND a.bucket = b.bucket
          AND a.doc_id < b.doc_id AND a.lang <> b.lang)
      SELECT doc_a, doc_b, lang_a, lang_b,
        ${Dedup.cosDuck("ea", "eb")} AS cosine
      FROM cand
      WHERE ${Dedup.cosDuck("ea", "eb")} >= 0.3
      ORDER BY doc_a, doc_b"""
    })

  // ---------- q260: product-quantization reconstruction audit ---------

  /** Product quantization (Jégou et al. 2011, public): split the
    * 64-dim space into 8 contiguous 8-dim subspaces, quantize each
    * subvector to its nearest sub-codeword, and audit what the
    * compression costs — per-subspace MSE and codebook utilization
    * (inverse-Simpson effective codes, the q110 integer-exact form —
    * NOT an entropy sum, whose float accumulation order would diverge
    * across engines). Sub-codewords are slices of the q33 centroid
    * codebook, so the codebook stays a broadcast table; the quantize
    * step is the q34 routing idiom per (vector × subspace) with
    * |codes|-row argmin windows; per-row reconstruction error rounds
    * to integer nanos BEFORE summation (exact, order-independent) and
    * the nano sums lift to DECIMAL(38,0) — at warehouse scale Σd²·1e9
    * exceeds int64. Output: 8 audit rows no matter the corpus size.
    */
  private val q260 = QueryDef(
    "q260_pq_audit",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val subcode = persistedCentroids(s, dir)
        .groupBy(col("label"), expr("pos div 8").cast("int").as("m"))
        .agg(expr("transform(sort_array(collect_list(struct(pos, centroid))), " +
          "s -> s.centroid)").as("scvec"))
      val subs = emb(s, dir)
        .select(col("vec_id"), col("embedding"),
          explode(expr("sequence(0, 7)")).as("m"))
        .select(col("vec_id"), col("m"),
          expr("slice(embedding, m * 8 + 1, 8)").as("sv"))
      val d2 = "aggregate(zip_with(sv, scvec, " +
        "(x, y) -> (cast(x AS DOUBLE) - y) * (cast(x AS DOUBLE) - y)), " +
        "cast(0 AS DOUBLE), (acc, v) -> acc + v)"
      val w = Window.partitionBy(col("vec_id"), col("m"))
        .orderBy(col("d2").asc, col("label"))
      val assign = subs.join(broadcast(subcode), Seq("m"))
        .select(col("vec_id"), col("m"), col("label"),
          expr(d2).as("d2"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("vec_id"), col("m"), col("label").as("code"),
          round(col("d2") * 1e9).cast("long").as("d2_nano"))
      assign.groupBy(col("m"), col("code"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("d2_nano").cast("decimal(38,0)")).as("sd"))
        .groupBy(col("m"))
        .agg(sum(col("cnt")).as("n_vecs"), count(lit(1)).as("codes_used"),
          sum(col("cnt") * col("cnt")).as("s2"), sum(col("sd")).as("sd"))
        .select(col("m").cast("long").as("subspace"), col("n_vecs"),
          col("codes_used"),
          // int64 is safe to ~3e9 vectors per code (q110's documented
          // widen-to-DECIMAL point)
          round((col("n_vecs") * col("n_vecs")).cast("double")
            / col("s2").cast("double"), 12).as("effective_codes"),
          round(col("sd").cast("double") / 1e9
            / col("n_vecs").cast("double"), 12).as("mse"))
        .orderBy("subspace")
    },
    Some(s"""WITH $centDuckCte,
      subcode AS (SELECT label, (pos // 8) AS m,
          list(centroid ORDER BY pos) AS scvec
        FROM cent GROUP BY 1, 2),
      subs AS (SELECT vec_id, m,
          embedding[m * 8 + 1 : m * 8 + 8] AS sv
        FROM embeddings CROSS JOIN range(0, 8) t(m)),
      scored AS (SELECT vec_id, s.m AS m, label,
          list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(range(1, 9),
              i -> (sv[i]::DOUBLE - scvec[i]) * (sv[i]::DOUBLE - scvec[i]))),
            (acc, v) -> acc + v) AS d2
        FROM subs s JOIN subcode c ON s.m = c.m),
      assign AS (SELECT vec_id, m, code, d2_nano FROM (
          SELECT vec_id, m, label AS code,
            round(d2 * 1e9)::BIGINT AS d2_nano,
            row_number() OVER (PARTITION BY vec_id, m
              ORDER BY d2, label) AS rn
          FROM scored) WHERE rn = 1),
      bycode AS (SELECT m, code, count(*)::BIGINT AS cnt,
          sum(d2_nano) AS sd
        FROM assign GROUP BY 1, 2)
      SELECT m::BIGINT AS subspace, sum(cnt)::BIGINT AS n_vecs,
        count(*)::BIGINT AS codes_used,
        round((sum(cnt) * sum(cnt))::DOUBLE / sum(cnt * cnt)::DOUBLE, 12)
          AS effective_codes,
        round(sum(sd)::DOUBLE / 1e9 / sum(cnt)::DOUBLE, 12) AS mse
      FROM bycode GROUP BY 1 ORDER BY subspace"""))

  // ---------- q265: cross-dimension correlation (whitening audit) ----

  /** Decorrelation audit for the embedding space — the input a
    * whitening/ZCA step needs and the diagnosis beside q202's
    * participation ratio and q220's anisotropy: the strongest
    * off-diagonal Pearson correlations between embedding dimensions.
    * The covariance needs Σxᵢxⱼ for all i<j — a CONSTANT
    * ×C(64,2)=2016 per-row fan-out, accumulated as a per-partition
    * Gram half-matrix (2016 longs of state) in one typed mapPartitions
    * pass, so each partition emits exactly 2016 cells and the shuffle
    * carries ≤ 2016×|partitions| rows at any corpus size — zero
    * data-proportional shuffle. mapPartitions is a declared deviation
    * from the functions-first rule: the declarative 2016-struct
    * projection generated a method past janino's 64 KB limit and ran
    * interpreted (~9× slower, measured at 10× vectors); the Gram loop
    * is the shape BLAS-backed engines use. Exactness is unchanged:
    * float×float products are exact in double (24-bit mantissas), each
    * per-row term is pinned to integer nanos (HALF_UP, replicating
    * SQL round()) before summation (order-independent exact sums, the
    * q112 rule) with a DECIMAL(38,0) lift across partitions, and the
    * 2016-row correlation table reduces to a deterministic top-10 by
    * |r|. Dimensions are reported 1-based.
    */
  private val q265 = QueryDef(
    "q265_whitening_audit",
    (s, dir) => {
      val dims = emb(s, dir)
        .select(posexplode(col("embedding")).as(Seq("p", "x")))
        .select((col("p") + 1).as("i"),
          expr("cast(round(cast(x AS DOUBLE) * 1e9) AS BIGINT)").as("xn"),
          expr("cast(round(cast(x AS DOUBLE) * cast(x AS DOUBLE) * 1e9) " +
            "AS BIGINT)").as("x2n"))
      val mom = dims.groupBy(col("i"))
        .agg(count(lit(1)).as("n"), sum(col("xn")).as("sx"),
          sum(col("x2n").cast("decimal(38,0)")).as("sxx"))
      val pairs = {
        import s.implicits._
        emb(s, dir).select(col("embedding")).as[Array[Float]]
          .mapPartitions { it =>
            val acc = new Array[Long](2016)
            var seen = false
            it.foreach { v =>
              seen = true
              var k = 0
              var i = 0
              while (i < 63) {
                val xi = v(i).toDouble
                var j = i + 1
                while (j < 64) {
                  val p = xi * v(j).toDouble * 1e9
                  // SQL round() HALF_UP in primitive form (ties away
                  // from zero) — bit-identical to the oracle's pinning
                  acc(k) += (if (p >= 0) math.floor(p + 0.5).toLong
                             else -math.floor(0.5 - p).toLong)
                  k += 1
                  j += 1
                }
                i += 1
              }
            }
            if (!seen) Iterator.empty
            else {
              val out = new Array[(Int, Int, Long)](2016)
              var k = 0
              var i = 0
              while (i < 63) {
                var j = i + 1
                while (j < 64) {
                  out(k) = (i + 1, j + 1, acc(k))
                  k += 1
                  j += 1
                }
                i += 1
              }
              out.iterator
            }
          }
          .toDF("i", "j", "pn")
          .groupBy(col("i"), col("j"))
          .agg(sum(col("pn").cast("decimal(38,0)")).as("sxy"))
      }
      val mi = mom.select(col("i"), col("n"), col("sx").as("sx_i"),
        col("sxx").as("sxx_i"))
      val mj = mom.select(col("i").as("j"), col("sx").as("sx_j"),
        col("sxx").as("sxx_j"))
      val nD = col("n").cast("double")
      def d(c: String) = col(c).cast("double") / 1e9
      val num = nD * d("sxy") - d("sx_i") * d("sx_j")
      val den = sqrt((nD * d("sxx_i") - d("sx_i") * d("sx_i"))
        * (nD * d("sxx_j") - d("sx_j") * d("sx_j")))
      pairs.join(broadcast(mi), Seq("i")).join(broadcast(mj), Seq("j"))
        .select(col("i").cast("long").as("dim_i"),
          col("j").cast("long").as("dim_j"),
          round(num / den, 12).as("corr"))
        .orderBy(abs(col("corr")).desc, col("dim_i"), col("dim_j"))
        .limit(10)
        .orderBy(abs(col("corr")).desc, col("dim_i"), col("dim_j"))
    },
    Some("""WITH dims AS (SELECT i,
          round(embedding[i]::DOUBLE * 1e9)::BIGINT AS xn,
          round(embedding[i]::DOUBLE * embedding[i]::DOUBLE
            * 1e9)::BIGINT AS x2n
        FROM embeddings, range(1, 65) t(i)),
      mom AS (SELECT i, count(*)::BIGINT AS n, sum(xn)::BIGINT AS sx,
          sum(x2n) AS sxx
        FROM dims GROUP BY 1),
      pairs AS (SELECT a.i AS i, b.i AS j,
          sum(round(embedding[a.i]::DOUBLE * embedding[b.i]::DOUBLE
            * 1e9)::BIGINT) AS sxy
        FROM embeddings, range(1, 65) a(i), range(1, 65) b(i)
        WHERE a.i < b.i GROUP BY 1, 2),
      corr AS (SELECT p.i AS dim_i, p.j AS dim_j,
          round((mi.n::DOUBLE * (p.sxy::DOUBLE / 1e9)
              - (mi.sx::DOUBLE / 1e9) * (mj.sx::DOUBLE / 1e9))
            / sqrt((mi.n::DOUBLE * (mi.sxx::DOUBLE / 1e9)
                - (mi.sx::DOUBLE / 1e9) * (mi.sx::DOUBLE / 1e9))
              * (mi.n::DOUBLE * (mj.sxx::DOUBLE / 1e9)
                - (mj.sx::DOUBLE / 1e9) * (mj.sx::DOUBLE / 1e9))),
            12) AS corr
        FROM pairs p JOIN mom mi ON mi.i = p.i JOIN mom mj ON mj.i = p.j)
      SELECT dim_i::BIGINT AS dim_i, dim_j::BIGINT AS dim_j, corr
      FROM corr ORDER BY abs(corr) DESC, dim_i, dim_j LIMIT 10"""))

  // ---------- q280: random-projection (JL) distortion audit -----------

  /** Does a cheap ±1 random projection (Achlioptas 2003 /
    * Johnson–Lindenstrauss) preserve this corpus's distances well
    * enough to run ANN on 16 dims instead of 64? The audit projects
    * every embedding through a DETERMINISTIC sign matrix s(i,j) =
    * ±1 from a portable integer hash ((i·73856093 + j·19349663) mod 97
    * < 48 — pure int64 arithmetic, identical on both engines), then
    * measures the distortion ratio ‖Rv₁−Rv₂‖²/(k·‖v₁−v₂‖²) on the
    * deterministic consecutive-id pair sample (vec_id, vec_id+1).
    * Exactness: coordinates pin once to integer 1e-7 units, so
    * projections are exact int64 dot products with ±1 (sum order
    * free), both squared distances are exact integers (DECIMAL-lifted
    * where the square can pass int64), and each pair's ratio is ONE
    * double division pinned to nano before the per-label mean.
    * Shape at 100 TB: the projection is a narrow per-row pass (a
    * 1024-row broadcast sign table, map-side aggregate per (vec, j));
    * the pair sample joins on an equi-key; output is |labels| rows.
    */
  private val q280 = QueryDef(
    "q280_jl_distortion",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val elems = emb(s, dir)
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("i", "x")))
        .select(col("vec_id"), col("label"), col("i").cast("long").as("i"),
          round(col("x").cast("double") * lit(1e7)).cast("long").as("v"))
      val signs = s.range(64).select(col("id").as("i"))
        .crossJoin(s.range(16).select(col("id").as("j")))
        .select(col("i"), col("j"),
          when((col("i") * 73856093L + col("j") * 19349663L) % 97 < 48,
            1L).otherwise(-1L).as("sgn"))
      val proj = elems.join(broadcast(signs), "i")
        .groupBy(col("vec_id"), col("j"))
        .agg(sum(col("v") * col("sgn")).as("p"))
      val od2 = elems.alias("a")
        .join(elems.alias("b"),
          col("a.vec_id") + 1 === col("b.vec_id")
            && col("a.i") === col("b.i"))
        .groupBy(col("a.vec_id").as("vec_id"), col("a.label").as("label"))
        .agg(sum((col("a.v") - col("b.v")) * (col("a.v") - col("b.v")))
          .as("od2"))
      val pd2 = proj.alias("a")
        .join(proj.alias("b"),
          col("a.vec_id") + 1 === col("b.vec_id")
            && col("a.j") === col("b.j"))
        .groupBy(col("a.vec_id").as("vec_id"))
        .agg(sum(((col("a.p") - col("b.p")).cast(DecimalType(38, 0))
            * (col("a.p") - col("b.p")).cast(DecimalType(38, 0))))
          .as("pd2"))
      od2.join(pd2, "vec_id")
        .where(col("od2") > 0L)
        .select(col("label"),
          round(col("pd2").cast("double")
            / (lit(16.0) * col("od2").cast("double")) * lit(1e9))
            .cast("long").as("r_nano"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_pairs"),
          round(sum(col("r_nano")).cast("double")
            / count(lit(1)).cast("double") / lit(1e9), 12)
            .as("mean_ratio"),
          round(min(col("r_nano")).cast("double") / lit(1e9), 12)
            .as("min_ratio"),
          round(max(col("r_nano")).cast("double") / lit(1e9), 12)
            .as("max_ratio"))
        .orderBy("label")
    },
    Some("""WITH elems AS (SELECT vec_id, label,
          generate_subscripts(embedding, 1) - 1 AS i,
          round(unnest(embedding)::DOUBLE * 1e7)::BIGINT AS v
        FROM embeddings),
      signs AS (SELECT i.range::BIGINT AS i, j.range::BIGINT AS j,
          CASE WHEN (i.range::BIGINT * 73856093 + j.range::BIGINT
            * 19349663) % 97 < 48 THEN 1 ELSE -1 END AS sgn
        FROM range(64) i, range(16) j),
      proj AS (SELECT vec_id, j, sum(v * sgn)::BIGINT AS p
        FROM elems JOIN signs USING (i) GROUP BY 1, 2),
      od2 AS (SELECT a.vec_id, a.label,
          sum((a.v - b.v) * (a.v - b.v))::BIGINT AS od2
        FROM elems a JOIN elems b
          ON a.vec_id + 1 = b.vec_id AND a.i = b.i
        GROUP BY 1, 2),
      pd2 AS (SELECT a.vec_id,
          sum((a.p - b.p)::HUGEINT * (a.p - b.p)::HUGEINT) AS pd2
        FROM proj a JOIN proj b
          ON a.vec_id + 1 = b.vec_id AND a.j = b.j
        GROUP BY 1),
      ratios AS (SELECT label,
          round(pd2::DOUBLE / (16.0 * od2::DOUBLE) * 1e9)::BIGINT
            AS r_nano
        FROM od2 JOIN pd2 USING (vec_id) WHERE od2 > 0)
      SELECT label, count(*)::BIGINT AS n_pairs,
        round(sum(r_nano)::DOUBLE / count(*)::DOUBLE / 1e9, 12)
          AS mean_ratio,
        round(min(r_nano)::DOUBLE / 1e9, 12) AS min_ratio,
        round(max(r_nano)::DOUBLE / 1e9, 12) AS max_ratio
      FROM ratios GROUP BY label ORDER BY label"""))

  // ---------- q318: split centroid drift -------------------------------

  /** Embedding-space distribution shift between a deterministic 80/20
    * train/eval split, per label cell: the cosine between the cell's
    * train centroid and its eval centroid, plus the norm ratio. Near-1
    * cosine certifies the split didn't shear the embedding geometry
    * (what q37 certifies for counts, this certifies for VECTORS);
    * a low-cosine cell flags a label whose eval slice sits in a
    * different region — the silent cause of "val loss fine, prod
    * drifted". Shape: one posexplode pass into (label, split, pos)
    * ordered-fold sums (the q33 determinism contract — a plain double
    * SUM is execution-order-dependent), then per-label dot/norms as a
    * second ordered fold over the 64 dims; shuffle keys are
    * label×split×dim, never vectors. Centroids pin per-dim to the
    * exact fold; output is |labels| rows.
    */
  private val q318 = QueryDef(
    "q318_centroid_drift",
    (s, dir) => {
      val ex = emb(s, dir)
        .select(col("label"), col("vec_id"),
          when(expr(graft.ops.Portable.h32Spark(
            "concat('vec_', vec_id)")) % 10 < 8, "train")
            .otherwise("eval").as("split"),
          posexplode(col("embedding")).as(Seq("pos", "val")))
      val cent = ex.groupBy(col("label"), col("split"), col("pos"))
        .agg(expr(centSparkSum).as("sum_val"), count(lit(1)).as("n"))
        .select(col("label"), col("split"), col("pos"),
          (col("sum_val") / col("n")).as("c"), col("n"))
      val tr = cent.where(col("split") === "train")
        .select(col("label"), col("pos"), col("c").as("ct"),
          col("n").as("n_train"))
      val ev = cent.where(col("split") === "eval")
        .select(col("label"), col("pos"), col("c").as("ce"),
          col("n").as("n_eval"))
      tr.join(ev, Seq("label", "pos"))
        .groupBy(col("label"))
        .agg(first(col("n_train")).as("n_train"),
          first(col("n_eval")).as("n_eval"),
          expr("""aggregate(transform(sort_array(collect_list(
              struct(pos, ct * ce))), s -> s.col2),
            cast(0 AS DOUBLE), (acc, v) -> acc + v)""").as("dot"),
          expr("""aggregate(transform(sort_array(collect_list(
              struct(pos, ct * ct))), s -> s.col2),
            cast(0 AS DOUBLE), (acc, v) -> acc + v)""").as("ntt"),
          expr("""aggregate(transform(sort_array(collect_list(
              struct(pos, ce * ce))), s -> s.col2),
            cast(0 AS DOUBLE), (acc, v) -> acc + v)""").as("nee"))
        .select(col("label"), col("n_train"), col("n_eval"),
          round(col("dot") / (sqrt(col("ntt")) * sqrt(col("nee"))), 9)
            .as("cosine"),
          round(sqrt(col("ntt")) / sqrt(col("nee")), 9).as("norm_ratio"))
        .orderBy(col("label"))
    },
    Some(s"""WITH ex AS (SELECT label, vec_id,
          CASE WHEN ${graft.ops.Portable.h32Duck("'vec_' || vec_id")}
            % 10 < 8 THEN 'train' ELSE 'eval' END AS split,
          pos - 1 AS pos, embedding[pos] AS val
        FROM embeddings CROSS JOIN range(1, ${Dim + 1}) t(pos)),
      cent AS (SELECT label, split, pos,
          list_reduce(list_prepend(0.0::DOUBLE,
            list(val::DOUBLE ORDER BY vec_id)), (acc, v) -> acc + v)
            / count(*) AS c,
          count(*)::BIGINT AS n
        FROM ex GROUP BY label, split, pos),
      tr AS (SELECT label, pos, c AS ct, n AS n_train FROM cent
        WHERE split = 'train'),
      ev AS (SELECT label, pos, c AS ce, n AS n_eval FROM cent
        WHERE split = 'eval'),
      j AS (SELECT label, any_value(n_train) AS n_train,
          any_value(n_eval) AS n_eval,
          list_reduce(list_prepend(0.0::DOUBLE,
            list(ct * ce ORDER BY pos)), (acc, v) -> acc + v) AS dot,
          list_reduce(list_prepend(0.0::DOUBLE,
            list(ct * ct ORDER BY pos)), (acc, v) -> acc + v) AS ntt,
          list_reduce(list_prepend(0.0::DOUBLE,
            list(ce * ce ORDER BY pos)), (acc, v) -> acc + v) AS nee
        FROM tr JOIN ev USING (label, pos)
        GROUP BY label)
      SELECT label, n_train, n_eval,
        round(dot / (sqrt(ntt) * sqrt(nee)), 9) AS cosine,
        round(sqrt(ntt) / sqrt(nee), 9) AS norm_ratio
      FROM j ORDER BY label"""))

  // ---------- q332: nearest-centroid classifier accuracy ---------------

  /** Rocchio (nearest-centroid) classification accuracy per label —
    * the cheapest embedding-quality END-METRIC: q127 audits whether
    * ANN retrieval finds the true neighbors; this audits whether the
    * embedding GEOMETRY separates the label cells at all, by
    * classifying every vector to its nearest cell centroid (cosine)
    * and scoring the confusion against the true label. Accuracy ≈ 1
    * with tight well-separated cells; a label whose vectors leak to
    * another centroid flags entangled classes before any model
    * trains. Shape: the codebook is the SAME PlanCache'd q33/q34
    * centroid table (10-row broadcast); one corpus pass scores
    * |labels| cosines per vector with the codegen'd `graft_cosine`;
    * the argmax is a window over ≤|labels| rows per vector. No
    * corpus-sized shuffle anywhere.
    */
  private val q332 = QueryDef(
    "q332_rocchio_accuracy",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val scored = emb(s, dir)
        .select(col("vec_id"), col("label"), col("embedding"))
        .crossJoin(broadcast(codebook(s, dir)
          .select(col("label").as("cand"), col("cvec"))))
        .select(col("vec_id"), col("label"), col("cand"),
          expr("graft_cosine(embedding, cvec)").as("cos"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos").desc, col("cand"))
      scored.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("cand") === col("label"), 1L).otherwise(0L))
            .as("n_correct"))
        .select(col("label"), col("n"), col("n_correct"),
          round(col("n_correct").cast("double") / col("n"), 9)
            .as("accuracy"))
        .orderBy(col("label"))
    },
    Some(s"""WITH $centDuckCte,
      cb AS (SELECT label AS cand, list(centroid ORDER BY pos) AS cvec
        FROM cent GROUP BY label),
      scored AS (SELECT vec_id, label, cand,
          ${Dedup.cosDuck("embedding", "cvec")} AS cos
        FROM embeddings CROSS JOIN cb),
      win AS (SELECT vec_id, label, cand,
          row_number() OVER (PARTITION BY vec_id
            ORDER BY cos DESC, cand) AS rn
        FROM scored)
      SELECT label, count(*)::BIGINT AS n,
        sum(CASE WHEN cand = label THEN 1 ELSE 0 END)::BIGINT
          AS n_correct,
        round(sum(CASE WHEN cand = label THEN 1 ELSE 0 END)::DOUBLE
          / count(*), 9) AS accuracy
      FROM win WHERE rn = 1
      GROUP BY label ORDER BY label"""))

  // ---------- q376: SRP signature fidelity audit ----------------------

  /** Sign-random-projection signature fidelity: how well does the
    * 24-bit SRP signature (the SAME 4×6 hyperplane construction q23's
    * LSH buckets use) approximate true cosine? Hamming distance
    * between two vectors' signatures is Σ_tables popcount(bucket ⊕
    * bucket) — the packed sign bits ARE the buckets — and the linear
    * proxy sim ≈ 1 − 2h/24 is compared against exact cosine over a
    * deterministic shift-pairing sample (vec_id ↔ vec_id+17: a
    * bijective, linear-in-corpus pair set via one co-partitioned
    * equi-join, never pairs²). Per-hamming-bin means pin cosines to
    * nano before the fold. This audit is what justifies (or indicts)
    * q23's table×plane budget — read next to q127's recall and q321's
    * Jaccard-side planner.
    */
  private val q376 = QueryDef(
    "q376_srp_fidelity",
    (s, dir) => {
      val sig = emb(s, dir).select(col("vec_id"),
        col("embedding"),
        expr(s"graft_lsh_buckets(embedding, $planesSpark, " +
          s"$PlanesPerTable)").as("bks"))
      val pairs = sig.alias("a")
        .join(sig.alias("b"),
          col("a.vec_id") + 17 === col("b.vec_id"))
        .select(
          expr("""aggregate(zip_with(a.bks, b.bks,
            (x, y) -> bit_count(x ^ y)), 0, (acc, v) -> acc + v)""")
            .as("ham"),
          expr("""CAST(round(graft_cosine(a.embedding, b.embedding)
            * 1e9) AS BIGINT)""").as("cos_nano"))
        .withColumn("est_nano",
          // CAST ham to DOUBLE first: a bare `ham / 12.0` parses the
          // literal as DECIMAL and divides in truncating decimal scale
          // (the documented cross-engine literal trap)
          expr("""CAST(round((1.0 - CAST(ham AS DOUBLE) / 12.0) * 1e9)
            AS BIGINT)"""))
      pairs.groupBy(col("ham"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("cos_nano")).as("scos"),
          sum(abs(col("cos_nano") - col("est_nano"))).as("serr"))
        .select(col("ham"), col("n_pairs"),
          round(col("scos").cast("double") / col("n_pairs") / 1e9, 9)
            .as("mean_cos"),
          round(lit(1.0) - col("ham") / 12.0, 9).as("est_sim"),
          round(col("serr").cast("double") / col("n_pairs") / 1e9, 9)
            .as("mean_abs_err"))
        .orderBy(col("ham"))
    },
    Some {
      val bksDuck = (0 until Tables).map(t =>
        bucketExpr(t, i => s"dots[$i]")).mkString("[", ", ", "]")
      val hamDuck = (1 to Tables).map(t =>
        s"bit_count(xor(a.bks[$t], b.bks[$t]))").mkString(" + ")
      s"""WITH dotted AS (SELECT vec_id, embedding, $dotsDuck AS dots
        FROM embeddings),
      sig AS (SELECT vec_id, embedding, $bksDuck AS bks FROM dotted),
      pairs AS (SELECT ($hamDuck)::BIGINT AS ham,
          round(${Dedup.cosDuck("a.embedding", "b.embedding")}
            * 1e9)::BIGINT AS cos_nano
        FROM sig a JOIN sig b ON a.vec_id + 17 = b.vec_id),
      pe AS (SELECT ham, cos_nano,
          round((1.0 - ham / 12.0) * 1e9)::BIGINT AS est_nano
        FROM pairs)
      SELECT ham, count(*)::BIGINT AS n_pairs,
        round(sum(cos_nano)::DOUBLE / count(*) / 1e9, 9) AS mean_cos,
        round(1.0 - ham / 12.0, 9) AS est_sim,
        round(sum(abs(cos_nano - est_nano))::DOUBLE / count(*) / 1e9,
          9) AS mean_abs_err
      FROM pe
      GROUP BY ham ORDER BY ham"""
    })

  // ---------- q377: embedding-space label-margin audit ----------------

  /** Label-margin audit over LSH candidates: for each vector, the
    * best same-label and best different-label cosine among its bucket
    * collisions, and the fraction of vectors whose nearest
    * cross-label neighbor beats their nearest same-label neighbor
    * minus a 0.05 margin — the triplet-loss health check a
    * labeled-embedding pipeline runs to find label noise or collapsed
    * clusters, reported per label. Candidates come from the q23
    * bucket join (shuffle ∝ collisions, never pairs²); the per-anchor
    * fold is one grouped max over same/diff cosines pinned to nano
    * (exact comparisons); anchors lacking either side drop (both
    * sides needed for a margin). Anchors are a 1-in-8 hash sample:
    * unlike q23 (fixed query set), this is a bucket SELF-join whose
    * candidates grow with Σ occupancy², so the audit reads a sampled
    * slice and the production note is to scale planes ~log|corpus|
    * (measured and recorded in BASELINE.md round 9).
    */
  private val q377 = QueryDef(
    "q377_triplet_margin",
    (s, dir) => {
      val keys = emb(s, dir).select(col("vec_id"), col("embedding"),
        col("label"),
        posexplode(expr(
          s"graft_lsh_buckets(embedding, $planesSpark, $PlanesPerTable)"))
          .as(Seq("tbl", "bucket")))
      // anchors are a deterministic 1-in-8 hash sample: the bucket
      // SELF-join's candidate count grows with Σ occupancy² (measured
      // ×118 on 10× vectors with the fixed 4×6-plane tables), so the
      // audit reads a sampled anchor slice — the estimate it reports
      // is rate-based and unbiased under the hash coin. A production
      // deployment additionally scales planes ~log|corpus| to hold
      // occupancy flat (the q23 tuning note).
      val anchors = keys
        .where(expr(Portable.h32Spark("concat('tm_', vec_id)"))
          % 8 === 0)
      val cand = anchors.alias("a")
        .join(keys.alias("b"),
          col("a.tbl") === col("b.tbl")
            && col("a.bucket") === col("b.bucket")
            && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("anchor"),
          col("a.label").as("label"),
          (col("a.label") === col("b.label")).as("same"),
          col("a.embedding").as("ae"), col("b.vec_id").as("nid"),
          col("b.embedding").as("ne"))
        .distinct()
      val perAnchor = cand
        .select(col("anchor"), col("label"), col("same"),
          expr("CAST(round(graft_cosine(ae, ne) * 1e9) AS BIGINT)")
            .as("cos_nano"))
        .groupBy(col("anchor"), col("label"))
        .agg(max(when(col("same"), col("cos_nano"))).as("pos_nano"),
          max(when(!col("same"), col("cos_nano"))).as("neg_nano"))
        .where(col("pos_nano").isNotNull && col("neg_nano").isNotNull)
      perAnchor.groupBy(col("label"))
        .agg(count(lit(1)).as("n_anchors"),
          sum(when(col("neg_nano") > col("pos_nano") - 50000000L, 1L)
            .otherwise(0L)).as("n_violations"),
          sum(col("pos_nano") - col("neg_nano")).as("smargin"))
        .select(col("label"), col("n_anchors"), col("n_violations"),
          round(col("n_violations").cast("double") / col("n_anchors"),
            9).as("viol_rate"),
          round(col("smargin").cast("double") / col("n_anchors") / 1e9,
            9).as("mean_margin"))
        .orderBy(col("label"))
    },
    Some {
      val bucketSelects = (0 until Tables).map { t =>
        s"SELECT vec_id, embedding, label, $t AS tbl, " +
          s"${bucketExpr(t, i => s"dots[$i]")} AS bucket FROM dotted"
      }.mkString(" UNION ALL ")
      s"""WITH dotted AS (SELECT vec_id, embedding, label,
          $dotsDuck AS dots
        FROM embeddings),
      keys AS ($bucketSelects),
      anchors AS (SELECT * FROM keys
        WHERE ${Portable.h32Duck("'tm_' || vec_id")} % 8 = 0),
      cand AS (SELECT DISTINCT a.vec_id AS anchor, a.label AS label,
          a.label = b.label AS same, b.vec_id AS nid,
          round(${Dedup.cosDuck("a.embedding", "b.embedding")}
            * 1e9)::BIGINT AS cos_nano
        FROM anchors a JOIN keys b ON a.tbl = b.tbl
          AND a.bucket = b.bucket AND a.vec_id <> b.vec_id),
      pa AS (SELECT anchor, label,
          max(CASE WHEN same THEN cos_nano END) AS pos_nano,
          max(CASE WHEN NOT same THEN cos_nano END) AS neg_nano
        FROM cand GROUP BY 1, 2),
      ok AS (SELECT * FROM pa
        WHERE pos_nano IS NOT NULL AND neg_nano IS NOT NULL)
      SELECT label, count(*)::BIGINT AS n_anchors,
        sum(CASE WHEN neg_nano > pos_nano - 50000000 THEN 1 ELSE 0
          END)::BIGINT AS n_violations,
        round(sum(CASE WHEN neg_nano > pos_nano - 50000000 THEN 1
          ELSE 0 END)::DOUBLE / count(*), 9) AS viol_rate,
        round(sum(pos_nano - neg_nano)::DOUBLE / count(*) / 1e9, 9)
          AS mean_margin
      FROM ok
      GROUP BY label ORDER BY label"""
    })

  // ---------- q404: simplified-silhouette cluster audit ----------------

  /** Simplified (centroid-based) silhouette per cluster: for every
    * vector, a = cosine distance to its OWN (nearest) centroid and
    * b = distance to the runner-up centroid, s = (b−a)/max(a,b) — the
    * geometric cluster-separation audit that complements q80 (centroid
    * separation: how far apart the CENTERS are) and q204 (near-dup
    * cluster quality) by measuring how cleanly each POINT is claimed.
    * Mean silhouette near 0 flags clusters that IVF routing (q34/q78)
    * will split across cells. The full silhouette is O(n²) pairwise;
    * the simplified form is the standard linear-scan surrogate — one
    * broadcast of the k-row codebook against the corpus, a
    * per-vector top-2 (the vec_id-partitioned window every ANN query
    * here uses), and one bounded groupBy. Per-point s is pinned to
    * micro-units BEFORE the mean so the reduce is exact-integer and
    * order-free.
    */
  private val q404 = QueryDef(
    "q404_silhouette_audit",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cvecs = codebook(s, dir)
        .select(col("label").as("clabel"), col("cvec"))
      val wCell = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("clabel"))
      val top2 = emb(s, dir)
        .select(col("vec_id"), col("embedding").as("e"))
        .crossJoin(broadcast(cvecs))
        .select(col("vec_id"), col("clabel"),
          expr("graft_cosine(e, cvec)").as("ccos"))
        .withColumn("rn", row_number().over(wCell))
        .where(col("rn") <= 2)
      val sil = top2.groupBy(col("vec_id")).agg(
          max(when(col("rn") === 1, col("clabel"))).as("own"),
          max(when(col("rn") === 1, col("ccos"))).as("c1"),
          max(when(col("rn") === 2, col("ccos"))).as("c2"))
        .select(col("own"),
          expr("""CAST(round(((1 - c2) - (1 - c1))
            / greatest(1 - c1, 1 - c2, CAST(1e-12 AS DOUBLE)) * 1e6)
            AS BIGINT)""").as("sil_micro"))
      sil.groupBy(col("own"))
        .agg(count(lit(1)).as("n_vectors"),
          round(sum(col("sil_micro")).cast("double")
            / count(lit(1)) / 1e6, 6).as("avg_silhouette"))
        .select(col("own").as("label"), col("n_vectors"),
          col("avg_silhouette"))
        .orderBy("label")
    },
    Some(s"""WITH $centDuckCte,
      cb AS (SELECT label AS clabel, list(centroid ORDER BY pos) AS cvec
        FROM cent GROUP BY label),
      scored AS (SELECT e.vec_id, cb.clabel,
          ${Dedup.cosDuck("e.embedding", "cb.cvec")} AS ccos
        FROM embeddings e CROSS JOIN cb),
      rk AS (SELECT vec_id, clabel, ccos, row_number() OVER (
          PARTITION BY vec_id ORDER BY ccos DESC, clabel) AS rn
        FROM scored),
      agg AS (SELECT vec_id,
          max(CASE WHEN rn = 1 THEN clabel END) AS own,
          max(CASE WHEN rn = 1 THEN ccos END) AS c1,
          max(CASE WHEN rn = 2 THEN ccos END) AS c2
        FROM rk WHERE rn <= 2 GROUP BY vec_id),
      sil AS (SELECT own,
          round(((1 - c2) - (1 - c1))
            / greatest(1 - c1, 1 - c2, 1e-12::DOUBLE) * 1e6)::BIGINT
            AS sil_micro
        FROM agg)
      SELECT own AS label, count(*)::BIGINT AS n_vectors,
        round(sum(sil_micro)::DOUBLE / count(*) / 1e6, 6)
          AS avg_silhouette
      FROM sil GROUP BY own ORDER BY own"""))

  // ---------- q474: ingest-batch ANN assignment ------------------------

  /** The vector-side twin of q473's ingest dedup: route each ARRIVING
    * vector (vec_id % 10 < 2, q104's batch split) through the STANDING
    * index — coarse-quantize against the standing codebook (centroids
    * computed from standing members only; the batch must not move the
    * codebook it is being routed by), then exact top-k against
    * standing members of the assigned (cell, sign-bit sub-cell) only.
    * Asymmetric by construction: new×old, never new×new or old×old —
    * probe cost is |batch| × sub-cell occupancy, and the occupancy is
    * CAPPED: the sub-cell bit count grows as ⌊log2(occupancy/64)⌋ with
    * the standing census, so a 30× corpus probes ~the same number of
    * members per query (measured: fixed label cells alone were 16.6×
    * at 10× data and 10.0× at a further 3× — candidate-quadratic;
    * with occupancy sub-cells the same points read 1.9× and 2.2× —
    * sub-linear, BASELINE.md round 12). The standing corpus never
    * shuffles (in production it is bucketed by (cell, sub), so the
    * probe co-locates; codebook and census are broadcasts). This is
    * the search path an index serves BETWEEN rebuilds; q476 is the
    * maintenance diagnostic that decides when the centroids themselves
    * need re-training.
    */
  /** The STANDING-members-only codebook (label, cvec) q474 routes by —
    * public to graft so the streaming twin's spec can collect it into
    * the row-local routing map ([[graft.streaming.VecStream]]).
    */
  private[graft] def standingCodebook(s: SparkSession,
      dir: String): DataFrame =
    emb(s, dir).where(col("vec_id") % 10 >= 2)
      .select(col("label"), col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "val")))
      .groupBy(col("label"), col("pos"))
      .agg(expr(centSparkSum).as("sum_val"), count(lit(1)).as("n"))
      .select(col("label"), col("pos"),
        (col("sum_val") / col("n")).as("centroid"))
      .groupBy(col("label"))
      .agg(expr("transform(sort_array(collect_list(struct(pos, " +
        "centroid))), s -> s.centroid)").as("cvec"))

  /** Occupancy-driven sub-cell bit count from a standing census row:
    * s_bits = ⌊log2(n / (cells · 64))⌋ once any cell's expected
    * occupancy passes 64 members, else 0 — integer log2 via bin()
    * string length (the q85 rank trick; never a float log2). Shared by
    * q474 and its streaming twin's spec so the two can't drift.
    */
  private[graft] val subBitsExpr: String =
    "CASE WHEN n_stand div (n_cells * 64) >= 1 " +
      "THEN length(bin(n_stand div (n_cells * 64))) - 1 ELSE 0 END"

  /** Sign-bit sub-cell id of the first `s_bits` components (SRP over
    * the coordinate axes; component signs measured balanced per label,
    * so sub-cells split occupancy near-uniformly). `s_bits` is a
    * column, so the unrolled 8-bit form gates each bit on i < s_bits.
    */
  private[graft] def subcellSpark(e: String): String = (0 until 8).map {
    i =>
      s"(CASE WHEN $i < s_bits AND element_at($e, ${i + 1}) >= 0 " +
        s"THEN ${1 << i} ELSE 0 END)"
  }.mkString(" + ")

  /** Shared oracle for the ingest ANN probe: q474 (in-plan standing
    * structure) and q531 (the [[StandingVecIndex]] persisted form)
    * must produce the SAME rows — the artifacts freeze exactly what
    * the in-plan formulation computes, so one oracle gates both.
    */
  private lazy val ingestAnnOracle: String = {
    val subDuck = (e: String) => (0 until 8).map { i =>
      s"(CASE WHEN $i < s_bits AND $e[${i + 1}] >= 0 " +
        s"THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH ex AS (SELECT label, vec_id, pos - 1 AS pos,
        embedding[pos] AS val
      FROM embeddings CROSS JOIN range(1, ${Dim + 1}) t(pos)
      WHERE vec_id % 10 >= 2),
    cent AS (SELECT label, pos,
      list_reduce(list_prepend(0.0::DOUBLE,
          list(val::DOUBLE ORDER BY vec_id)),
        (acc, v) -> acc + v) / count(*) AS centroid
      FROM ex GROUP BY label, pos),
    cvec AS (SELECT label, list(centroid ORDER BY pos) AS cvec
      FROM cent GROUP BY label),
    census AS (SELECT CASE WHEN n_stand // (n_cells * 64) >= 1
        THEN length(bin(n_stand // (n_cells * 64))) - 1
        ELSE 0 END AS s_bits
      FROM (SELECT count(*) AS n_stand,
          count(DISTINCT label) AS n_cells
        FROM embeddings WHERE vec_id % 10 >= 2)),
    q AS (SELECT vec_id AS query_id, embedding AS qe,
        ${subDuck("embedding")} AS sub
      FROM embeddings, census WHERE vec_id % 10 < 2),
    cellscore AS (SELECT query_id, qe, sub, label,
        ${Dedup.cosDuck("qe", "cvec")} AS ccos
      FROM q CROSS JOIN cvec),
    assign AS (SELECT query_id, qe, sub, label AS cell FROM (
        SELECT query_id, qe, sub, label, row_number() OVER (
          PARTITION BY query_id ORDER BY ccos DESC, label) AS rn
        FROM cellscore) WHERE rn = 1),
    stand AS (SELECT label AS cell, vec_id AS neighbor_id,
        embedding, ${subDuck("embedding")} AS sub
      FROM embeddings, census WHERE vec_id % 10 >= 2),
    scored AS (SELECT query_id, a.cell, b.neighbor_id,
        ${Dedup.cosDuck("qe", "b.embedding")} AS cosine
      FROM assign a JOIN stand b
      ON b.cell = a.cell AND b.sub = a.sub),
    r AS (SELECT query_id, cell, neighbor_id, cosine,
        row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, neighbor_id) AS rnk FROM scored)
    SELECT query_id, cell, rnk, neighbor_id, cosine FROM r
    WHERE rnk <= $KAnn ORDER BY query_id, rnk"""
  }

  private val q474 = QueryDef(
    "q474_ingest_ann_assign",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val standCvec = standingCodebook(s, dir)
      // the census that SCALES the cell structure with the corpus:
      // fixed label cells alone go candidate-quadratic on ingest
      // (measured 16.6x at 10x data, 10.0x at a further 3x — the
      // stale-codebook cost curve), because per-cell occupancy grows
      // linearly on BOTH join sides. The sign-bit sub-cells below cap
      // expected occupancy at ~64·2 members regardless of corpus size
      // — the relational analogue of re-training the codebook with
      // more cells as the corpus grows (q476 decides when the
      // centroids themselves need that rebuild).
      val census = emb(s, dir).where(col("vec_id") % 10 >= 2)
        .agg(count(lit(1)).as("n_stand"),
          countDistinct(col("label")).as("n_cells"))
        .select(expr(subBitsExpr).as("s_bits"))
      val batch = emb(s, dir).where(col("vec_id") % 10 < 2)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
        .crossJoin(broadcast(census))
        .withColumn("sub", expr(subcellSpark("qe")))
      val wCell = Window.partitionBy(col("query_id"))
        .orderBy(col("ccos").desc, col("label"))
      val assign = batch.crossJoin(broadcast(standCvec))
        .select(col("query_id"), col("qe"), col("sub"), col("label"),
          expr("graft_cosine(qe, cvec)").as("ccos"))
        .withColumn("rn", row_number().over(wCell))
        .where(col("rn") === 1)
        .select(col("query_id"), col("qe"), col("sub"),
          col("label").as("cell"))
      val standing = emb(s, dir).where(col("vec_id") % 10 >= 2)
        .crossJoin(broadcast(census))
        .select(col("label").as("cell"), col("vec_id").as("neighbor_id"),
          col("embedding").as("ne"),
          expr(subcellSpark("embedding")).as("sub"))
      val wTop = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      assign.join(standing, Seq("cell", "sub"))
        .select(col("query_id"), col("cell"), col("neighbor_id"),
          expr("graft_cosine(qe, ne)").as("cosine"))
        .withColumn("rnk", row_number().over(wTop))
        .where(col("rnk") <= KAnn)
        .select(col("query_id"), col("cell"), col("rnk"),
          col("neighbor_id"), col("cosine"))
        .orderBy("query_id", "rnk")
    },
    Some(ingestAnnOracle))

  // ---------- q476: ingest-batch centroid drift ------------------------

  /** IVF index-maintenance diagnostic after an ingest batch: for each
    * cell, merge the batch members into the standing centroid
    * INCREMENTALLY — merged = (standing_sum + batch_sum) /
    * (n_standing + n_batch), the streaming-mean update; the standing
    * corpus contributes only its per-cell (sum, count) state, never a
    * rescan — and report how far the centroid moved (cosine between
    * standing and merged centroid vectors) plus the member growth.
    * Cells whose centroid shifts below the cos ≥ 0.9999 band are due
    * for re-clustering; q474 keeps serving the old codebook until
    * then. Per-component sums fold in vec_id order on both sides
    * (the centSparkSum discipline), so old/new sums and the division
    * are bit-equal across engines. Shape: two posexplode aggregates
    * (batch one is batch-bounded), a |cells|×Dim merge, |cells|-row
    * output.
    */
  private val q476 = QueryDef(
    "q476_ingest_centroid_drift",
    (s, dir) => {
      def sums(side: DataFrame) = side
        .select(col("label"), col("vec_id"),
          posexplode(col("embedding")).as(Seq("pos", "val")))
        .groupBy(col("label"), col("pos"))
        .agg(expr(centSparkSum).as("sv"), count(lit(1)).as("n"))
      val old = sums(emb(s, dir).where(col("vec_id") % 10 >= 2))
        .select(col("label"), col("pos"), col("sv").as("so"),
          col("n").as("no"))
      val bat = sums(emb(s, dir).where(col("vec_id") % 10 < 2))
        .select(col("label"), col("pos"), col("sv").as("sb"),
          col("n").as("nb"))
      val merged = old.join(bat, Seq("label", "pos"), "left_outer")
        .select(col("label"), col("pos"),
          (col("so") / col("no")).as("c_old"),
          ((col("so") + coalesce(col("sb"), lit(0.0)))
            / (col("no") + coalesce(col("nb"), lit(0L)))).as("c_new"),
          col("no"), coalesce(col("nb"), lit(0L)).as("nb"))
      merged.groupBy(col("label"))
        .agg(
          expr("transform(sort_array(collect_list(struct(pos, c_old))), " +
            "s -> s.c_old)").as("vo"),
          expr("transform(sort_array(collect_list(struct(pos, c_new))), " +
            "s -> s.c_new)").as("vn"),
          max(col("no")).as("n_standing"), max(col("nb")).as("n_batch"))
        .select(col("label"), col("n_standing"), col("n_batch"),
          round(expr("graft_cosine(vo, vn)"), 9).as("cos_shift"),
          (round(expr("graft_cosine(vo, vn)"), 9) >= lit(0.9999))
            .as("stable"))
        .orderBy("label")
    },
    Some(s"""WITH ex AS (SELECT label, vec_id, pos - 1 AS pos,
          embedding[pos] AS val,
          CASE WHEN vec_id % 10 < 2 THEN 1 ELSE 0 END AS isb
        FROM embeddings CROSS JOIN range(1, ${Dim + 1}) t(pos)),
      so AS (SELECT label, pos,
          list_reduce(list_prepend(0.0::DOUBLE,
              list(val::DOUBLE ORDER BY vec_id) FILTER (isb = 0)),
            (acc, v) -> acc + v) AS so,
          count(*) FILTER (isb = 0) AS no,
          coalesce(list_reduce(list_prepend(0.0::DOUBLE,
              list(val::DOUBLE ORDER BY vec_id) FILTER (isb = 1)),
            (acc, v) -> acc + v), 0.0) AS sb,
          count(*) FILTER (isb = 1) AS nb
        FROM ex GROUP BY label, pos),
      m AS (SELECT label, pos, so / no AS c_old,
          (so + sb) / (no + nb) AS c_new, no, nb
        FROM so),
      v AS (SELECT label, list(c_old ORDER BY pos) AS vo,
          list(c_new ORDER BY pos) AS vn,
          max(no) AS n_standing, max(nb) AS n_batch
        FROM m GROUP BY label)
      SELECT label, n_standing::BIGINT AS n_standing,
        n_batch::BIGINT AS n_batch,
        round(${Dedup.cosDuck("vo", "vn")}, 9) AS cos_shift,
        (round(${Dedup.cosDuck("vo", "vn")}, 9) >= 0.9999) AS stable
      FROM v ORDER BY label"""))

  // ---------- q531: ANN probe against the PERSISTED vector index -------

  /** q474's ingest ANN search through the [[StandingVecIndex]]
    * PERSISTED artifacts — the vector-side twin of q529's two-job
    * contract: a bootstrap writes the (cell, sub)-bucketed member
    * table plus the FROZEN codebook and census (the index geometry —
    * s_bits, centroids — ships with the index, never recomputed at
    * probe time), and the probe reads all three through the catalog.
    * Query routing is two tiny broadcasts (census row + codebook) and
    * one equi-join on (cell, sub) against the bucketed members, so the
    * standing vectors NEVER exchange at probe time — at 100 TB the
    * daily ANN probe cost is |batch| × capped sub-cell occupancy with
    * zero corpus shuffle, and the bootstrap is the amortized one-time
    * pass. Same rows as q474 (the artifacts freeze exactly what the
    * in-plan form computes over this fixture), so the shared oracle
    * gates both and any bootstrap defect — lost members, stale
    * geometry, a sub computed under the wrong s_bits — shifts
    * neighbors and fails the hash. VecIndexSpec pins artifact parity,
    * the fresh-session probe, and the bucket-scan plan property.
    */
  /** Top-`p` cell probe against the PERSISTED ANN artifacts — the
    * multi-probe knob (q78's recall lever) ported to
    * [[StandingVecIndex]]: route each query to its top-`p` standing
    * cells by frozen-codebook cosine, compute its sub-cell id under
    * the frozen census s_bits, equi-join (cell, sub) against the
    * bucketed member table, exact-rerank to top-[[KAnn]]. Zero corpus
    * exchange at any `p` — the probe side is |queries| × p rows and
    * the members are read through their bucket layout; raising `p`
    * multiplies only the probe rows and the scanned sub-cell count,
    * never the exchange class. Each member lives in exactly one
    * (cell, sub), so multi-cell probing never duplicates a
    * (query, neighbor) pair and needs no dedup.
    */
  private def persistedProbe(s: SparkSession, dir: String, p: Int,
      queryPred: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val arts = StandingVecIndex.ensure(s, dir)
    val census = s.table(arts.censusTable)
    val cvecs = s.table(arts.codebookTable)
    val batch = emb(s, dir).where(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .crossJoin(broadcast(census))
      .withColumn("sub", expr(subcellSpark("qe")))
    val wCell = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("label"))
    val assign = batch.crossJoin(broadcast(cvecs))
      .select(col("query_id"), col("qe"), col("sub"), col("label"),
        expr("graft_cosine(qe, cvec)").as("ccos"))
      .withColumn("rn", row_number().over(wCell))
      .where(col("rn") <= p)
      .select(col("query_id"), col("qe"), col("sub"),
        col("label").as("cell"))
    val standing = s.table(arts.membersTable)
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    assign.join(standing, Seq("cell", "sub"))
      .select(col("query_id"), col("cell"), col("neighbor_id"),
        expr("graft_cosine(qe, ne)").as("cosine"))
      .withColumn("rnk", row_number().over(wTop))
      .where(col("rnk") <= KAnn)
      .select(col("query_id"), col("cell"), col("rnk"),
        col("neighbor_id"), col("cosine"))
      .orderBy("query_id", "rnk")
  }

  private val q531 = QueryDef(
    "q531_ann_persisted_index",
    (s, dir) =>
      persistedProbe(s, dir, p = 1, col("vec_id") % 10 < 2),
    Some(ingestAnnOracle))

  // ---------- q533: multi-probe recall audit over the PERSISTED index --

  /** The query-id cap that makes the audit's EXACT side bounded: 8
    * query vectors (vec_id % 10 < 2 ∧ < 40), q127's sampled-audit
    * discipline — recall is estimated from a fixed query sample, so
    * the brute-force reference costs |sample| × corpus (a linear scan)
    * at any SF, never |batch| × corpus.
    */
  private val AuditQueryCap = 40

  /** Recall@[[KAnn]] of the PERSISTED index at P = 1 vs P = 3 probes,
    * against exact brute force over the standing corpus — the q127
    * audit re-run over [[StandingVecIndex]] artifacts, closing the
    * loop q78 opened in-plan: P is THE knob a deployment turns when
    * single-probe recall sags, and this query measures what each step
    * of it buys on the index actually being served (frozen codebook +
    * census geometry, bucketed members), not on a transient in-plan
    * twin. recall_p3 ≥ recall_p1 by construction (probe sets nest);
    * VecIndexSpec asserts the monotonicity and that the member table
    * never exchanges at either P. Scale: both probe legs are
    * |sample| × p rows against the bucket layout; the exact leg is the
    * declared linear-scan reference over the corpus, bounded by the
    * 8-query sample (the audit runs per-deploy on a sample, exactly
    * like q127).
    */
  private val q533 = QueryDef(
    "q533_persisted_ann_multiprobe_recall",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val qpred = col("vec_id") % 10 < 2 && col("vec_id") < AuditQueryCap
      def atop(p: Int) = persistedProbe(s, dir, p, qpred)
        .select(col("query_id"), col("neighbor_id"))
      val q = emb(s, dir).where(qpred)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      val standing = emb(s, dir).where(col("vec_id") % 10 >= 2)
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
      val wTop = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      val etop = standing.crossJoin(broadcast(q))
        .select(col("query_id"), col("neighbor_id"),
          expr("graft_cosine(qe, ne)").as("cosine"))
        .withColumn("rnk", row_number().over(wTop))
        .where(col("rnk") <= KAnn)
        .select(col("query_id"), col("neighbor_id"))
      def hits(a: DataFrame, nm: String) =
        etop.join(a, Seq("query_id", "neighbor_id"))
          .groupBy(col("query_id")).agg(count(lit(1)).as(nm))
      etop.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
        .join(hits(atop(1), "n_hit_p1"), Seq("query_id"), "left_outer")
        .join(hits(atop(3), "n_hit_p3"), Seq("query_id"), "left_outer")
        .select(col("query_id"), col("n_exact"),
          coalesce(col("n_hit_p1"), lit(0L)).as("n_hit_p1"),
          (coalesce(col("n_hit_p1"), lit(0L)).cast("double")
            / col("n_exact")).as("recall_p1"),
          coalesce(col("n_hit_p3"), lit(0L)).as("n_hit_p3"),
          (coalesce(col("n_hit_p3"), lit(0L)).cast("double")
            / col("n_exact")).as("recall_p3"))
        .orderBy("query_id")
    },
    Some(multiprobeRecallOracle))

  private lazy val multiprobeRecallOracle: String = {
    val subDuck = (e: String) => (0 until 8).map { i =>
      s"(CASE WHEN $i < s_bits AND $e[${i + 1}] >= 0 " +
        s"THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH ex AS (SELECT label, vec_id, pos - 1 AS pos,
        embedding[pos] AS val
      FROM embeddings CROSS JOIN range(1, ${Dim + 1}) t(pos)
      WHERE vec_id % 10 >= 2),
    cent AS (SELECT label, pos,
      list_reduce(list_prepend(0.0::DOUBLE,
          list(val::DOUBLE ORDER BY vec_id)),
        (acc, v) -> acc + v) / count(*) AS centroid
      FROM ex GROUP BY label, pos),
    cvec AS (SELECT label, list(centroid ORDER BY pos) AS cvec
      FROM cent GROUP BY label),
    census AS (SELECT CASE WHEN n_stand // (n_cells * 64) >= 1
        THEN length(bin(n_stand // (n_cells * 64))) - 1
        ELSE 0 END AS s_bits
      FROM (SELECT count(*) AS n_stand,
          count(DISTINCT label) AS n_cells
        FROM embeddings WHERE vec_id % 10 >= 2)),
    q AS (SELECT vec_id AS query_id, embedding AS qe,
        ${subDuck("embedding")} AS sub
      FROM embeddings, census
      WHERE vec_id % 10 < 2 AND vec_id < $AuditQueryCap),
    cellranked AS (SELECT query_id, qe, sub, label, row_number() OVER (
        PARTITION BY query_id ORDER BY ccos DESC, label) AS rn
      FROM (SELECT query_id, qe, sub, label,
          ${Dedup.cosDuck("qe", "cvec")} AS ccos
        FROM q CROSS JOIN cvec)),
    stand AS (SELECT label AS cell, vec_id AS neighbor_id, embedding,
        ${subDuck("embedding")} AS sub
      FROM embeddings, census WHERE vec_id % 10 >= 2),
    a1 AS (SELECT query_id, neighbor_id FROM (
        SELECT a.query_id, b.neighbor_id, row_number() OVER (
            PARTITION BY a.query_id
            ORDER BY ${Dedup.cosDuck("a.qe", "b.embedding")} DESC,
              b.neighbor_id) AS rnk
        FROM cellranked a JOIN stand b
        ON b.cell = a.label AND b.sub = a.sub AND a.rn <= 1)
      WHERE rnk <= $KAnn),
    a3 AS (SELECT query_id, neighbor_id FROM (
        SELECT a.query_id, b.neighbor_id, row_number() OVER (
            PARTITION BY a.query_id
            ORDER BY ${Dedup.cosDuck("a.qe", "b.embedding")} DESC,
              b.neighbor_id) AS rnk
        FROM cellranked a JOIN stand b
        ON b.cell = a.label AND b.sub = a.sub AND a.rn <= 3)
      WHERE rnk <= $KAnn),
    exact AS (SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, s.neighbor_id, row_number() OVER (
            PARTITION BY q.query_id
            ORDER BY ${Dedup.cosDuck("q.qe", "s.embedding")} DESC,
              s.neighbor_id) AS rnk
        FROM q CROSS JOIN stand s) WHERE rnk <= $KAnn),
    ec AS (SELECT query_id, count(*) AS n_exact FROM exact GROUP BY 1),
    h1 AS (SELECT e.query_id, count(*) AS n_hit_p1
      FROM exact e JOIN a1
      ON a1.query_id = e.query_id AND a1.neighbor_id = e.neighbor_id
      GROUP BY 1),
    h3 AS (SELECT e.query_id, count(*) AS n_hit_p3
      FROM exact e JOIN a3
      ON a3.query_id = e.query_id AND a3.neighbor_id = e.neighbor_id
      GROUP BY 1)
    SELECT ec.query_id, n_exact::BIGINT AS n_exact,
      coalesce(n_hit_p1, 0)::BIGINT AS n_hit_p1,
      coalesce(n_hit_p1, 0)::DOUBLE / n_exact AS recall_p1,
      coalesce(n_hit_p3, 0)::BIGINT AS n_hit_p3,
      coalesce(n_hit_p3, 0)::DOUBLE / n_exact AS recall_p3
    FROM ec LEFT JOIN h1 ON h1.query_id = ec.query_id
    LEFT JOIN h3 ON h3.query_id = ec.query_id
    ORDER BY ec.query_id"""
  }

  val all: Seq[QueryDef] = Seq(q22, q23, q33, q34, q65, q78, q80, q102, q213,
    q112, q123, q127, q130, q134, q167, q185, q202, q220, q247, q258, q259,
    q260, q265, q280, q318, q332, q376, q377, q404, q474, q476, q531, q533)
}
