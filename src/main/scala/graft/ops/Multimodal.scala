package graft.ops

import graft.{Fixtures, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, processed by a partition-batched decode stage.
  *
  * The container has no image/audio codecs, so the decode step is a
  * DETERMINISTIC STUB (byte statistics standing in for pixels/samples);
  * everything around it — binary column, schema, Dataset encoders,
  * `mapPartitions` batching, partition sizing — is the real pattern a
  * media pipeline uses. Swap `decodeStub` for a real codec call and the
  * plumbing is unchanged: the iterator shape means one codec init per
  * PARTITION (not per row), which is what makes per-row-expensive
  * decode viable at 100 TB; binary payloads never shuffle (the stage is
  * a narrow map; only the small extracted features flow onward).
  *
  * Feature semantics (so the DuckDB oracle can verify them exactly over
  * the ASCII fixture text, where bytes == codepoints):
  *  - n_bytes:   payload length
  *  - checksum:  left fold (acc * 31 + byte) mod 1e9+7
  *  - hist:      16-bin histogram of byte % 16
  *  - sample8:   8 evenly-strided bytes (frame-sampling stand-in)
  */
object Multimodal {

  private val Mod = 1000000007L

  /** The partition-batched "decoder". Real pipelines put codec init
    * before the iterator map and reuse it across the partition's rows.
    */
  private[ops] def decodeStub(
      rows: Iterator[(Long, Array[Byte])]): Iterator[BinFeatures] =
    rows.map { case (id, bytes) =>
      var checksum = 0L
      val hist = new Array[Int](16)
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        checksum = (checksum * 31 + b) % Mod
        hist(b % 16) += 1
        i += 1
      }
      val n = bytes.length
      // long arithmetic (k*n overflows Int past ~256 MB payloads);
      // empty payloads sample as zeros rather than crashing the task
      val sample8 =
        if (n == 0) Seq.fill(8)(0)
        else (0 until 8).map(k => bytes((k.toLong * n / 8).toInt) & 0xff)
      BinFeatures(id, n, checksum, hist.toSeq, sample8)
    }

  private val q29 = QueryDef(
    "q29_binary_features",
    (s, dir) => {
      import s.implicits._
      val bin = Fixtures.table(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
      // hist/sample8 serialize to canonical comma-joined strings (and
      // n_bytes widens to int64): the gate's comparator hashes scalar
      // cells, and list-typed cells are unhashable in pandas.
      bin.mapPartitions(decodeStub).toDF()
        .select(col("doc_id"), col("n_bytes").cast("bigint").as("n_bytes"),
          col("checksum"),
          array_join(col("hist").cast("array<string>"), ",").as("hist"),
          array_join(col("sample8").cast("array<string>"), ",").as("sample8"))
        .orderBy("doc_id")
    },
    Some(s"""WITH cl AS (SELECT doc_id, text,
        regexp_extract_all(text, '.', 0) AS chars FROM documents)
      SELECT doc_id,
        strlen(text) AS n_bytes,
        list_reduce(list_prepend(0::BIGINT,
          list_transform(chars, c -> ascii(c)::BIGINT)),
          (acc, c) -> (acc * 31 + c) % $Mod) AS checksum,
        array_to_string(list_transform(range(0, 16),
          b -> len(list_filter(chars, c -> ascii(c) % 16 = b))::INT), ',')
          AS hist,
        array_to_string(list_transform(range(0, 8),
          k -> coalesce(ascii(chars[(k * strlen(text)) // 8 + 1]), 0)), ',')
          AS sample8
      FROM cl ORDER BY doc_id"""))

  // ---------- q52: frame sampling (one payload → N frame rows) --------

  private val Frames = 4

  /** The frame-sampling decode shape: one binary payload fans out to
    * `Frames` per-frame feature ROWS (video → frames, audio → windows)
    * — the one-to-many complement of q29's one-to-one features. Same
    * partition-batched stub pattern (codec init per partition; only the
    * small per-frame features leave the stage, payload bytes never
    * shuffle), with the fan-out inside the iterator so the row
    * explosion happens streamingly, not as a materialized array. Frame
    * boundaries are the same even-stride arithmetic as q29's sample8,
    * so the oracle can verify them exactly over the ASCII fixture.
    */
  private[ops] def frameStub(
      rows: Iterator[(Long, Array[Byte])]): Iterator[FrameFeatures] =
    rows.flatMap { case (id, bytes) =>
      val n = bytes.length
      (0 until Frames).map { k =>
        val from = (k.toLong * n / Frames).toInt
        val until = ((k + 1).toLong * n / Frames).toInt
        var cs = 0L
        var i = from
        while (i < until) {
          cs = (cs * 31 + (bytes(i) & 0xff)) % Mod
          i += 1
        }
        FrameFeatures(id, k.toLong, (until - from).toLong, cs)
      }
    }

  private val q52 = QueryDef(
    "q52_frame_sample",
    (s, dir) => {
      import s.implicits._
      Fixtures.table(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(frameStub).toDF()
        .orderBy("doc_id", "frame_no")
    },
    Some(s"""WITH f AS (SELECT doc_id, text, strlen(text) AS n, k
        FROM documents CROSS JOIN range(0, $Frames) t(k)),
      fr AS (SELECT doc_id, k AS frame_no,
        ((k + 1) * n) // $Frames - (k * n) // $Frames AS n_bytes,
        substring(text, (k * n) // $Frames + 1,
          ((k + 1) * n) // $Frames - (k * n) // $Frames) AS frame
        FROM f)
      SELECT doc_id, frame_no, n_bytes,
        list_reduce(list_prepend(0::BIGINT,
          list_transform(regexp_extract_all(frame, '.', 0),
            c -> ascii(c)::BIGINT)),
          (acc, c) -> (acc * 31 + c) % $Mod) AS checksum
      FROM fr ORDER BY doc_id, frame_no"""))

  // ---------- q96: payload byte entropy -------------------------------

  /** Shannon entropy (bits/byte) of each payload's byte distribution —
    * the standard cheap media-triage gate: near-8 entropy means already
    * compressed/encrypted (don't recompress, possibly junk), very low
    * entropy means padding or a stuck sensor, and text sits in a narrow
    * band — all decided WITHOUT decoding. Fully relational (byte
    * explode → per-(doc, byte) counts → one aggregate), so unlike the
    * decode stubs there's no iterator stage: the histogram aggregation
    * is codegen'd with map-side partials and the payload never
    * shuffles, only its ≤ 256 count rows per doc do. Determinism: p is
    * one exact-int division; p·log2(p) is then pinned to INTEGER
    * nano-units — round(y·1e9) to scale 0 — because decimal-SCALE
    * rounding of a full-precision double (round(y, 12) or a
    * DECIMAL(28,12) cast) is engine-divergent in the last digit (the
    * two engines scale by 10^12 along different arithmetic paths),
    * while rounding the SAME double to a whole number is exact on
    * both. Integer units then sum exactly in any order, and the final
    * /1e9 is one division.
    */
  private val q96 = QueryDef(
    "q96_byte_entropy",
    (s, dir) => {
      val counts = Fixtures.table(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
        .where(col("ch") =!= lit(""))
        .select(col("doc_id"), ascii(col("ch")).as("b"))
        .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
      val totals = counts.groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct_bytes"))
      counts.join(totals, "doc_id")
        .withColumn("p", col("c").cast("double") / col("n"))
        .withColumn("units",
          round(col("p") * log2(col("p")) * lit(1e9)).cast("long"))
        .groupBy(col("doc_id"))
        .agg(first(col("n")).as("n_bytes"),
          first(col("n_distinct_bytes")).as("n_distinct_bytes"),
          ((-sum(col("units"))).cast("double") / lit(1e9)).as("entropy_bits"))
        .orderBy("doc_id")
    },
    Some("""WITH ch AS (SELECT doc_id, ascii(c) AS b
        FROM (SELECT doc_id, unnest(string_split(text, '')) AS c
          FROM documents) t
        WHERE c <> ''),
      counts AS (SELECT doc_id, b, count(*) AS c FROM ch GROUP BY 1, 2),
      totals AS (SELECT doc_id, sum(c) AS n, count(*) AS nd
        FROM counts GROUP BY 1),
      terms AS (SELECT counts.doc_id, n, nd,
          round((c::DOUBLE / n) * log2(c::DOUBLE / n) * 1e9)::BIGINT
            AS units
        FROM counts JOIN totals ON totals.doc_id = counts.doc_id)
      SELECT doc_id, min(n)::BIGINT AS n_bytes,
        min(nd)::BIGINT AS n_distinct_bytes,
        (-sum(units))::DOUBLE / 1e9 AS entropy_bits
      FROM terms GROUP BY doc_id ORDER BY doc_id"""))

  // ---------- q131: fixed-block storage dedup ratio ---------------------

  /** Block-level dedup audit: chunk every payload into fixed 64-byte
    * blocks, hash each, and report per source how much of its raw
    * volume is duplicate blocks — the STORAGE-dedup number (what a
    * content-addressed store or chunked object layout would actually
    * save), which document-level dedup (q17) cannot see: two documents
    * that share half their bytes are distinct docs but 50 % dup
    * blocks. Fixed-offset blocking is the honest baseline
    * (content-defined chunking additionally survives insertions — the
    * upgrade path, same plan shape with a rolling-hash cut rule).
    * Shape: block spine via map-side sequence+explode (no join), one
    * (source, hash) aggregate — shuffle carries 8-byte hashes, the
    * payload never moves; savings is one exact int division.
    */
  /** Per-payload fixed 64-byte block hashes (doc_id, source, h) —
    * shared by q131 (storage dedup ratio) and q144 (block-minhash
    * signatures); one substring+md5 pass per run via PlanCache.
    */
  private def blockHashes(s: SparkSession, dir: String): DataFrame =
    PlanCache.getOrBuild(s, dir, "blocks")(
      Fixtures.table(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"),
          explode(expr(
            "sequence(0, cast(ceil(length(text) / 64.0) AS INT) - 1)"))
            .as("i"))
        .select(col("doc_id"), col("source"),
          expr(graft.ops.Portable.h32Spark(
            "substring(text, i * 64 + 1, 64)")).as("h")))

  private val q131 = QueryDef(
    "q131_block_dedup",
    (s, dir) => {
      blockHashes(s, dir)
        .groupBy(col("source"), col("h")).agg(count(lit(1)).as("c"))
        .groupBy(col("source"))
        .agg(sum(col("c")).as("n_blocks"), count(lit(1)).as("n_distinct"))
        .select(col("source"), col("n_blocks"), col("n_distinct"),
          (lit(1.0) - col("n_distinct").cast("double") / col("n_blocks"))
            .as("dup_block_share"))
        .orderBy("source")
    },
    Some(s"""WITH blocks AS (SELECT source,
          ${graft.ops.Portable.h32Duck("substring(text, i * 64 + 1, 64)")}
            AS h
        FROM documents,
          unnest(range(ceil(length(text) / 64.0)::BIGINT)) AS t(i)),
      per AS (SELECT source, h, count(*) AS c FROM blocks GROUP BY 1, 2)
      SELECT source, sum(c)::BIGINT AS n_blocks,
        count(*)::BIGINT AS n_distinct,
        1.0 - count(*)::DOUBLE / sum(c) AS dup_block_share
      FROM per GROUP BY source ORDER BY source"""))

  // ---------- q144: payload block-minhash signature ---------------------

  /** A 4-way MinHash signature over each payload's BLOCK hashes — the
    * binary-modality twin of q19's text SimHash: equal signatures mark
    * payload-level near-duplicate candidates (re-encoded or
    * tail-padded copies that exact md5 (q17) misses and text shingles
    * never see), at a per-payload state cost of 4 int64s regardless
    * of payload size. Minhashes are (aᵢ·h + bᵢ) mod P universal
    * hashes over the SHARED block table (one substring+md5 pass per
    * run, PlanCache'd with q131); the published signature folds the 4
    * mins into one int64 with the shingle-combine constants; n_same
    * counts signature collisions corpus-wide (the candidate-group
    * size — exact verify is downstream's job, q18's contract).
    * Shape: one (doc, i) min-aggregate with map-side partials, one
    * window over the |docs|-sized signature table.
    */
  private val q144 = QueryDef(
    "q144_block_minhash",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val P = 2147483647L
      val A = Seq(1117L, 2971L, 3343L, 577L)
      val B = Seq(407L, 2011L, 89L, 1777L)
      val minAggs = A.indices.map(i =>
        min((col("h") * A(i) + B(i)) % P).as(s"m$i"))
      val mins = blockHashes(s, dir)
        .groupBy(col("doc_id"))
        .agg(minAggs.head, minAggs.tail: _*)
      mins
        .select(col("doc_id"),
          ((col("m0") * 1000003L + col("m1") * 999983L
            + col("m2") * 31L + col("m3")) % P).as("sig"))
        .withColumn("n_same",
          count(lit(1)).over(Window.partitionBy(col("sig"))))
        .orderBy("doc_id")
    },
    Some(s"""WITH blocks AS (SELECT doc_id,
          ${graft.ops.Portable.h32Duck("substring(text, i * 64 + 1, 64)")}
            AS h
        FROM documents,
          unnest(range(ceil(length(text) / 64.0)::BIGINT)) AS t(i)),
      mins AS (SELECT doc_id,
          min((h * 1117 + 407) % 2147483647) AS m0,
          min((h * 2971 + 2011) % 2147483647) AS m1,
          min((h * 3343 + 89) % 2147483647) AS m2,
          min((h * 577 + 1777) % 2147483647) AS m3
        FROM blocks GROUP BY doc_id),
      sigs AS (SELECT doc_id,
          (m0 * 1000003 + m1 * 999983 + m2 * 31 + m3) % 2147483647 AS sig
        FROM mins)
      SELECT doc_id, sig,
        count(*) OVER (PARTITION BY sig) AS n_same
      FROM sigs ORDER BY doc_id"""))

  // ---------- q166: content-defined chunking dedup -----------------------

  /** The upgrade path q131's doc promises: content-defined chunking.
    * Cut points are where the polynomial rolling hash of the 8-gram
    * ending at a position ≡ 0 (mod 32) — a pure content function, so
    * an insertion shifts ONE chunk instead of re-aligning every fixed
    * block after it (the whole point of CDC in a content-addressed
    * store). The cut scan is the native codegen'd
    * `graft_cdc_cuts(text, 8, 32)` (expressions/CdcCuts.scala): ONE
    * rolling pass per document instead of a per-position
    * explode+md5 — O(bytes), the only shape that survives a corpus
    * where this scan touches every byte. Chunks are reassembled per
    * document from the sorted cut offsets (window over the cut table,
    * ~1/32 of positions, partitioned by doc), then the same
    * per-source distinct-hash audit as q131, weighted by chunk BYTES
    * (CDC chunks are variable-length, so block counts alone would
    * flatter small chunks). Expected chunk length is the mask modulus
    * (32 B) + the 7-char window floor. The oracle evaluates the same
    * polynomial non-rolled — agreement checks the rolling update.
    */
  private val q166 = QueryDef(
    "q166_cdc_chunking",
    (s, dir) => {
      val d = Fixtures.table(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"),
          length(col("text")).as("n"))
      val cuts = d.where(col("n") >= 8)
        .select(col("doc_id"),
          explode(expr("graft_cdc_cuts(text, 8, 32)")).as("e"))
      val ends = cuts
        .union(d.where(col("n") >= 1)
          .select(col("doc_id"), col("n").cast("long").as("e")))
        .distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("e")
      val chunks = ends
        .withColumn("start",
          coalesce(lag(col("e"), 1).over(w) + 1, lit(1)))
        .join(d.select(col("doc_id"), col("source"), col("text")),
          "doc_id")
        .select(col("source"),
          (col("e") - col("start") + 1).as("len"),
          expr(graft.ops.Portable.h32Spark(
            "substring(text, start, e - start + 1)")).as("h"))
      // Dedup identity is (h, len), not h alone: a 32-bit collision
      // between different-length chunks must never merge them, or the
      // byte accounting (and the conservation invariant) corrupts.
      chunks.groupBy(col("source"), col("h"), col("len"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("source"))
        .agg(sum(col("c")).as("n_chunks"), count(lit(1)).as("n_distinct"),
          sum(col("c") * col("len")).as("total_bytes"),
          sum(col("len")).as("distinct_bytes"))
        .select(col("source"), col("n_chunks"), col("n_distinct"),
          col("total_bytes"),
          round(lit(1.0) - col("distinct_bytes").cast("double")
            / col("total_bytes"), 12).as("dup_byte_share"))
        .orderBy("source")
    },
    Some(s"""WITH d AS (SELECT doc_id, source, text, length(text) AS n
        FROM documents),
      cuts AS (SELECT doc_id, i + 7 AS e
        FROM d, unnest(range(1, n - 6)) AS t(i)
        WHERE n >= 8
          AND (ord(substring(text, i::INT, 1)) * 155737
            + ord(substring(text, (i + 1)::INT, 1)) * 410923
            + ord(substring(text, (i + 2)::INT, 1)) * 317680
            + ord(substring(text, (i + 3)::INT, 1)) * 923521
            + ord(substring(text, (i + 4)::INT, 1)) * 29791
            + ord(substring(text, (i + 5)::INT, 1)) * 961
            + ord(substring(text, (i + 6)::INT, 1)) * 31
            + ord(substring(text, (i + 7)::INT, 1)))
            % 1048573 % 32 = 0),
      ends AS (SELECT DISTINCT doc_id, e FROM
        (SELECT doc_id, e FROM cuts
         UNION ALL SELECT doc_id, n AS e FROM d WHERE n >= 1)),
      spans AS (SELECT doc_id, e,
          coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY e) + 1, 1)
            AS start
        FROM ends),
      chunks AS (SELECT source, (e - start + 1) AS len,
          ${graft.ops.Portable.h32Duck(
            "substring(text, start::INT, (e - start + 1)::INT)")} AS h
        FROM spans JOIN d USING (doc_id)),
      per AS (SELECT source, h, len, count(*) AS c
        FROM chunks GROUP BY 1, 2, 3)
      SELECT source, sum(c)::BIGINT AS n_chunks,
        count(*)::BIGINT AS n_distinct,
        sum(c * len)::BIGINT AS total_bytes,
        round(1.0 - sum(len)::DOUBLE / sum(c * len), 12)
          AS dup_byte_share
      FROM per GROUP BY source ORDER BY source"""))

  // ---------- q382: perceptual dHash near-dup --------------------------

  /** Perceptual difference-hash near-dup over binary payloads — the
    * image-dedup pattern (dHash: downsample to a 9×7 luminance grid,
    * one bit per horizontal gradient sign, 56-bit signature, hamming
    * ≤ threshold ⇒ perceptual duplicate) run through the multimodal
    * decode-stub convention: the "decoder" maps each payload to grid
    * cells by integer byte-averaging over 63 even slices (swap in a
    * real image resampler and nothing downstream changes). Candidate
    * pairs come from an 8-bit BAND equi-join on the signature's 7
    * bytes (the q19 SimHash discipline: shuffle ∝ band collisions,
    * never corpus² — a real dup shares ≥1 exact band at hamming ≤ 12
    * with high probability), then exact hamming via xor+popcount on
    * the 56-bit key. All grid/bit arithmetic is pure int64, so both
    * engines agree bit-for-bit. Output: hamming histogram of
    * candidate pairs within distance 12.
    */
  private val q382 = QueryDef(
    "q382_dhash_neardup",
    (s, dir) => {
      import s.implicits._
      val bin = Fixtures.table(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
      val sig = bin.mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = bytes.length
          val cells = new Array[Long](63)
          var k = 0
          while (k < 63) {
            val s0 = (k.toLong * n / 63).toInt
            val e0 = ((k + 1).toLong * n / 63).toInt
            if (e0 > s0) {
              var sum = 0L
              var i = s0
              while (i < e0) { sum += bytes(i) & 0xff; i += 1 }
              cells(k) = sum / (e0 - s0)
            }
            k += 1
          }
          var h = 0L
          var i = 0
          while (i < 56) {
            val r = i / 8
            val c = i % 8
            if (cells(r * 9 + c + 1) > cells(r * 9 + c)) h |= 1L << i
            i += 1
          }
          (id, h)
        }
      }.toDF("doc_id", "h")
      // frozen + merge-hinted: the band table is corpus-sized, so the
      // self-join must be one shared shuffle (exchange-reused SMJ),
      // never a broadcast — AQE picks broadcast on mid-size fixtures
      // (the bands slice sits under the threshold at 10x sf0.1) and
      // that plan cliffs: 27 s vs 5.5 s measured at sf1/sf3, because
      // the build and probe subtrees each recompute the non-codegen
      // signature stage and replica-clique hot buckets skew the probe
      val bands = graft.ops.PlanCache.freeze(
        sig.select(col("doc_id"), col("h"),
          posexplode(expr(
            "transform(sequence(0, 6), i -> (h div CAST(pow(2, i * 8) " +
              "AS BIGINT)) % 256)")).as(Seq("band", "bval"))))
      bands.alias("a").hint("merge")
        .join(bands.alias("b"),
          col("a.band") === col("b.band")
            && col("a.bval") === col("b.bval")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"),
          col("b.doc_id").as("doc_b"),
          expr("CAST(bit_count(a.h ^ b.h) AS BIGINT)").as("ham"))
        .distinct()
        .where(col("ham") <= 12)
        .groupBy(col("ham")).agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("ham"))
    },
    Some("""WITH cl AS (SELECT doc_id,
          list_transform(regexp_extract_all(text, '.', 0),
            c -> ascii(c)::BIGINT) AS bytes,
          strlen(text)::BIGINT AS n
        FROM documents),
      cells AS (SELECT doc_id,
          list_transform(range(0, 63), k -> CASE
            WHEN ((k + 1) * n) // 63 > (k * n) // 63
            THEN list_sum(bytes[((k * n) // 63 + 1)
              :(((k + 1) * n) // 63)])
              // (((k + 1) * n) // 63 - (k * n) // 63)
            ELSE 0 END) AS g
        FROM cl),
      sig AS (SELECT doc_id,
          list_sum(list_transform(range(0, 56), i -> CASE
            WHEN g[(i // 8) * 9 + (i % 8) + 2]
              > g[(i // 8) * 9 + (i % 8) + 1]
            THEN (1::BIGINT << i) ELSE 0::BIGINT END))::BIGINT AS h
        FROM cells),
      bands AS (SELECT doc_id, h, band,
          (h // (1::BIGINT << (band * 8))) % 256 AS bval
        FROM sig, unnest(range(0, 7)) AS u(band)),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
          bit_count(xor(a.h, b.h))::BIGINT AS ham
        FROM bands a JOIN bands b ON a.band = b.band
          AND a.bval = b.bval AND a.doc_id < b.doc_id)
      SELECT ham, count(*)::BIGINT AS n_pairs
      FROM cand WHERE ham <= 12
      GROUP BY ham ORDER BY ham"""))

  // ---------- q480: shot-boundary detection ----------------------------

  /** Shot-boundary detection over binary payloads — the video-segment
    * pattern (cut where consecutive frame luminance jumps past a
    * threshold): each payload is "decoded" to 32 fixed-stride frame
    * luminances (integer byte-average per even slice — the decode-stub
    * convention; swap in a real decoder + perceptual frame feature and
    * nothing downstream changes), boundaries counted ROW-LOCALLY in
    * the same loop, so the stage is a narrow map — payload bytes never
    * shuffle, only the 4-int summary per doc flows to one small
    * per-source aggregate. Shot count = boundaries + 1 (a payload is
    * at least one shot). All arithmetic integer (floor-div slice
    * bounds, floor-div luminance, abs-diff threshold), so both engines
    * agree bit-for-bit; the mean shots/doc is the single pinned
    * division.
    */
  private val q480 = QueryDef(
    "q480_shot_boundaries",
    (s, dir) => {
      import s.implicits._
      val NF = 32
      val Jump = 16L
      val bin = Fixtures.table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, String, Array[Byte])]
      val per = bin.mapPartitions { it =>
        it.map { case (id, src, bytes) =>
          val n = bytes.length
          var prev = -1L
          var shots = 1L
          var maxJump = 0L
          var k = 0
          while (k < NF) {
            val s0 = (k.toLong * n / NF).toInt
            val e0 = ((k + 1).toLong * n / NF).toInt
            if (e0 > s0) {
              var sum = 0L
              var i = s0
              while (i < e0) { sum += bytes(i) & 0xff; i += 1 }
              val lum = sum / (e0 - s0)
              if (prev >= 0) {
                val d = math.abs(lum - prev)
                if (d > maxJump) maxJump = d
                if (d > Jump) shots += 1
              }
              prev = lum
            }
            k += 1
          }
          (id, src, shots, maxJump)
        }
      }.toDF("doc_id", "source", "n_shots", "max_jump")
      per.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_shots")).as("total_shots"),
          max(col("max_jump")).as("max_jump"),
          sum(when(col("n_shots") > 1, 1L).otherwise(0L)).as("n_multi"))
        .select(col("source"), col("n_docs"), col("total_shots"),
          round(col("total_shots").cast("double") / col("n_docs"), 9)
            .as("shots_per_doc"),
          col("max_jump"), col("n_multi"))
        .orderBy("source")
    },
    Some("""WITH cl AS (SELECT doc_id, source,
          list_transform(regexp_extract_all(text, '.', 0),
            c -> ascii(c)::BIGINT) AS bytes,
          strlen(text)::BIGINT AS n
        FROM documents),
      lums AS (SELECT doc_id, source,
          list_filter(list_transform(range(0, 32), k -> CASE
            WHEN ((k + 1) * n) // 32 > (k * n) // 32 THEN
              list_reduce(list_prepend(0::BIGINT,
                bytes[(k * n) // 32 + 1 : ((k + 1) * n) // 32]),
                (a, b) -> a + b)
              // (((k + 1) * n) // 32 - (k * n) // 32)
            ELSE NULL END), x -> x IS NOT NULL) AS lum
        FROM cl),
      per AS (SELECT doc_id, source,
          1 + len(list_filter(range(2, len(lum) + 1),
            i -> abs(lum[i] - lum[i - 1]) > 16)) AS n_shots,
          coalesce(list_max(list_transform(range(2, len(lum) + 1),
            i -> abs(lum[i] - lum[i - 1]))), 0) AS max_jump
        FROM lums)
      SELECT source, count(*)::BIGINT AS n_docs,
        sum(n_shots)::BIGINT AS total_shots,
        round(sum(n_shots)::DOUBLE / count(*), 9) AS shots_per_doc,
        max(max_jump)::BIGINT AS max_jump,
        sum(CASE WHEN n_shots > 1 THEN 1 ELSE 0 END)::BIGINT AS n_multi
      FROM per GROUP BY source ORDER BY source"""))

  // ---------- q503: ingest CDC-chunk dedup vs the standing store --------

  /** The variable-block member of the ingest storage family — q166's
    * content-defined chunking applied ASYMMETRICALLY (batch vs the
    * standing chunk store), beside q499's fixed 64-byte blocks: CDC
    * cut points ride the CONTENT (the `graft_cdc_cuts` rolling-hash
    * expression, one codegen'd pass per payload), so an insertion
    * near the head of a near-copy re-synchronizes within one chunk
    * and the rest of the document still dedups — the property
    * fixed-block chunking structurally lacks, and the reason rsync/
    * CAS stores pay the rolling hash. Chunk identity is (h, len)
    * (q166's collision rule). Standing store = DISTINCT standing
    * chunks; the probe is one batch-bounded join on the identity
    * key. Per-source ledger: chunks, within-batch distinct, standing
    * hits, byte savings. At 100 TB the store is bucketed by h and
    * the batch side broadcasts at daily size; payload bytes never
    * shuffle (only (h, len) pairs).
    */
  private val q503 = QueryDef(
    "q503_ingest_cdc_blocks",
    (s, dir) => {
      val d = Fixtures.table(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"),
          length(col("text")).as("n"))
      def chunks(side: DataFrame) = {
        val cuts = side.where(col("n") >= 8)
          .select(col("doc_id"),
            explode(expr("graft_cdc_cuts(text, 8, 32)")).as("e"))
        val ends = cuts
          .union(side.where(col("n") >= 1)
            .select(col("doc_id"), col("n").cast("long").as("e")))
          .distinct()
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("e")
        ends
          .withColumn("start",
            coalesce(lag(col("e"), 1).over(w) + 1, lit(1)))
          .join(side.select(col("doc_id"), col("source"), col("text")),
            "doc_id")
          .select(col("doc_id"), col("source"),
            (col("e") - col("start") + 1).as("len"),
            expr(graft.ops.Portable.h32Spark(
              "substring(text, start, e - start + 1)")).as("h"))
      }
      val standing = chunks(d.where(expr("doc_id % 10 >= 2")))
        .select(col("h"), col("len")).distinct()
      chunks(d.where(expr("doc_id % 10 < 2")))
        .join(standing.withColumn("hit", lit(1L)), Seq("h", "len"),
          "left_outer")
        .groupBy(col("source"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_chunks"),
          countDistinct(col("h"), col("len")).as("n_distinct_chunks"),
          sum(coalesce(col("hit"), lit(0L))).as("n_standing_hits"),
          sum(col("len")).as("bytes_total"),
          sum(col("len") * coalesce(col("hit"), lit(0L)))
            .as("bytes_dedup"))
        .select(col("source"), col("n_docs"), col("n_chunks"),
          col("n_distinct_chunks"), col("n_standing_hits"),
          col("bytes_total"), col("bytes_dedup"),
          round(col("bytes_dedup").cast("double") / col("bytes_total"), 9)
            .as("dedup_share"))
        .orderBy("source")
    },
    Some {
      val rolling = "(ord(substring(text, i::INT, 1)) * 155737 " +
        "+ ord(substring(text, (i + 1)::INT, 1)) * 410923 " +
        "+ ord(substring(text, (i + 2)::INT, 1)) * 317680 " +
        "+ ord(substring(text, (i + 3)::INT, 1)) * 923521 " +
        "+ ord(substring(text, (i + 4)::INT, 1)) * 29791 " +
        "+ ord(substring(text, (i + 5)::INT, 1)) * 961 " +
        "+ ord(substring(text, (i + 6)::INT, 1)) * 31 " +
        "+ ord(substring(text, (i + 7)::INT, 1))) % 1048573 % 32 = 0"
      s"""WITH d AS (SELECT doc_id, source, text, length(text) AS n
        FROM documents),
      cuts AS (SELECT doc_id, i + 7 AS e
        FROM d, unnest(range(1, n - 6)) AS t(i)
        WHERE n >= 8 AND $rolling),
      ends AS (SELECT DISTINCT doc_id, e FROM
        (SELECT doc_id, e FROM cuts
         UNION ALL SELECT doc_id, n AS e FROM d WHERE n >= 1)),
      spans AS (SELECT doc_id, e,
          coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY e) + 1, 1)
            AS start
        FROM ends),
      chunks AS (SELECT d.doc_id, source, (e - start + 1) AS len,
          ${graft.ops.Portable.h32Duck(
            "substring(text, start::INT, (e - start + 1)::INT)")} AS h
        FROM spans JOIN d USING (doc_id)),
      standing AS (SELECT DISTINCT h, len FROM chunks
        WHERE doc_id % 10 >= 2),
      batch AS (SELECT c.*, CASE WHEN s.h IS NULL THEN 0 ELSE 1 END
          ::BIGINT AS hit
        FROM chunks c LEFT JOIN standing s
          ON s.h = c.h AND s.len = c.len
        WHERE c.doc_id % 10 < 2)
      SELECT source, count(DISTINCT doc_id)::BIGINT AS n_docs,
        count(*)::BIGINT AS n_chunks,
        count(DISTINCT (h, len))::BIGINT AS n_distinct_chunks,
        sum(hit)::BIGINT AS n_standing_hits,
        sum(len)::BIGINT AS bytes_total,
        sum(len * hit)::BIGINT AS bytes_dedup,
        round(sum(len * hit)::DOUBLE / sum(len), 9) AS dedup_share
      FROM batch GROUP BY source ORDER BY source"""
    })

  // ---------- q526: dHash through a REAL image codec ---------------------

  /** q382's perceptual dHash with the decode stub REPLACED by a real
    * codec: each payload is rendered to a 9×7 8-bit-grayscale image,
    * ENCODED to real PNG bytes (`javax.imageio.ImageIO` — the codec
    * the JDK ships), then DECODED back through the same codec and
    * hashed from the DECODED raster — the full encode→bytes→decode→
    * feature path a production image pipeline runs, behind the same
    * partition-batched `mapPartitions` interface (ImageIO
    * reader/writer instances are per-partition, never per-row; PNG
    * payload bytes never shuffle — only the 8-byte signature flows
    * onward). Grayscale PNG is LOSSLESS, so the decoded pixels equal
    * the rendered pixels exactly — which is what makes a DuckDB
    * oracle possible: the oracle computes the identical dHash from
    * the pixel arithmetic directly (it cannot run a PNG codec), and
    * the gate passing proves the codec round-trip byte-preserving,
    * i.e. that the REAL decode produced exactly the pixels the
    * feature claims. Pixel rendering is q382's slice-average (the
    * stub convention's grid), so the two queries' signatures are
    * directly comparable: q382 = stub decode, q526 = real codec,
    * same downstream semantics. The synthetic-stub queries
    * (q29/q52/q382/q480) are retained — they exercise the plumbing
    * where no codec applies (audio/video stand-ins).
    *
    * MultimodalSpec additionally pins: the PNG bytes ARE a real PNG
    * (signature `89 50 4E 47`), and a decode of a corrupted payload
    * fails loudly (the codec is genuinely in the path).
    */
  private val q526 = QueryDef(
    "q526_dhash_codec",
    (s, dir) => {
      import s.implicits._
      // spread (r15): the per-row PNG encode+decode otherwise runs in
      // the single-row-group scan task (one core; measured 1.40 s wall)
      val bin = Fixtures.spread(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
      val sig = bin.mapPartitions { it =>
        // once per task: ImageIO's default stream cache is FILE-backed —
        // per-row temp-file churn for 100-byte PNGs (r15)
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val n = bytes.length
          // render: q382's 63-cell slice-average grid as 9×7 pixels
          val cells = new Array[Int](63)
          var k = 0
          while (k < 63) {
            val s0 = (k.toLong * n / 63).toInt
            val e0 = ((k + 1).toLong * n / 63).toInt
            if (e0 > s0) {
              var sum = 0L
              var i = s0
              while (i < e0) { sum += bytes(i) & 0xff; i += 1 }
              cells(k) = (sum / (e0 - s0)).toInt
            }
            k += 1
          }
          val img = new java.awt.image.BufferedImage(
            9, 7, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          var r = 0
          while (r < 7) {
            var c = 0
            while (c < 9) {
              img.getRaster.setSample(c, r, 0, cells(r * 9 + c))
              c += 1
            }
            r += 1
          }
          // ENCODE to real PNG bytes...
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos): Unit
          val png = bos.toByteArray
          // ...and DECODE through the real codec; the hash reads the
          // DECODED raster only
          val dec = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(png))
          var h = 0L
          var i = 0
          while (i < 56) {
            val rr = i / 8
            val cc = i % 8
            if (dec.getRaster.getSample(cc + 1, rr, 0)
                > dec.getRaster.getSample(cc, rr, 0)) h |= 1L << i
            i += 1
          }
          (id, h)
        }
      }.toDF("doc_id", "h")
      sig
        .withColumn("n_same", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
        .orderBy("doc_id")
    },
    Some("""WITH cl AS (SELECT doc_id,
          list_transform(regexp_extract_all(text, '.', 0),
            c -> ascii(c)::BIGINT) AS bytes,
          strlen(text)::BIGINT AS n
        FROM documents),
      cells AS (SELECT doc_id,
          list_transform(range(0, 63), k -> CASE
            WHEN ((k + 1) * n) // 63 > (k * n) // 63
            THEN list_sum(bytes[((k * n) // 63 + 1)
              :(((k + 1) * n) // 63)])
              // (((k + 1) * n) // 63 - (k * n) // 63)
            ELSE 0 END) AS g
        FROM cl),
      sig AS (SELECT doc_id,
          list_sum(list_transform(range(0, 56), i -> CASE
            WHEN g[(i // 8) * 9 + (i % 8) + 2]
              > g[(i // 8) * 9 + (i % 8) + 1]
            THEN (1::BIGINT << i) ELSE 0::BIGINT END))::BIGINT AS h
        FROM cells)
      SELECT doc_id, h,
        count(*) OVER (PARTITION BY h) AS n_same
      FROM sig ORDER BY doc_id"""))

  val all: Seq[QueryDef] =
    Seq(q29, q52, q96, q131, q144, q166, q382, q480, q503, q526)
}

/** Per-frame features (the frame-sampling stub's output row). */
final case class FrameFeatures(
    doc_id: Long,
    frame_no: Long,
    n_bytes: Long,
    checksum: Long)

/** Features extracted per binary payload (the decode-stub output row). */
final case class BinFeatures(
    doc_id: Long,
    n_bytes: Int,
    checksum: Long,
    hist: Seq[Int],
    sample8: Seq[Int])
