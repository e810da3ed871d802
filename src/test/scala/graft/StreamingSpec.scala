package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming/batch parity: the streaming operators must produce exactly
  * the batch answers when run as a bounded backfill (AvailableNow).
  */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = GraftSession.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  private val sf = "/root/testdata/sf0.001"

  test("streaming windowed counts == batch q24 counts (AvailableNow)") {
    val q = EventStream.windowedCounts(EventStream.readEvents(spark, sf))
      .writeStream.format("memory").queryName("wc")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("wc")
      .select("bucket", "event_type", "n").collect()
      .map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    val want = SparkEntry.queries("q24_window_agg")(spark, sf)
      .select("bucket", "event_type", "n").collect()
      .map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(got === want)
  }

  test("incremental export streams the full table once, exactly-once " +
    "across a restart (foreachBatch + checkpoint)") {
    val out = java.nio.file.Files.createTempDirectory("graft_stream_out").toString
    val q = EventStream.incrementalExport(
      EventStream.readEvents(spark, sf), out, s"$out/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val batches = new java.io.File(s"$out/db_data").listFiles()
    assert(batches != null && batches.nonEmpty)
    val exported = spark.read.parquet(
      batches.map(b => s"$b/events.parquet"): _*)
    assert(exported.count() === Fixtures.table(spark, sf, "events").count())
    // restart with the same checkpoint: no new data → no new batches
    val q2 = EventStream.incrementalExport(
      EventStream.readEvents(spark, sf), out, s"$out/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    val exported2 = spark.read.parquet(
      new java.io.File(s"$out/db_data").listFiles()
        .map(b => s"$b/events.parquet"): _*)
    assert(exported2.count() === exported.count())
  }

  test("new source files are picked up incrementally by a later " +
    "invocation (cron-style repeated AvailableNow)") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_incr")
    val srcDir = base.resolve("src"); java.nio.file.Files.createDirectories(srcDir)
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    val events = Fixtures.table(spark, sf, "events")
    val schema = events.schema

    def stage(name: String, filter: org.apache.spark.sql.Column): Long = {
      val part = events.where(filter)
      part.coalesce(1).write.mode("overwrite")
        .parquet(base.resolve(s"stage_$name").toString)
      val f = new java.io.File(base.resolve(s"stage_$name").toString)
        .listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(f.toPath, srcDir.resolve(s"$name.parquet"))
      part.count()
    }
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(srcDir.toString)
      val q = stream.writeStream.option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            b.write.mode("overwrite").parquet(f"$out/batch_$id%06d")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    val n1 = stage("a", col("event_id") % 2 === 0)
    runOnce()
    val n2 = stage("b", col("event_id") % 2 === 1)
    runOnce()
    val batches = new java.io.File(out).listFiles().map(_.toString).sorted
    assert(batches.length === 2, batches.mkString(","))
    assert(spark.read.parquet(batches(0)).count() === n1)
    assert(spark.read.parquet(batches(1)).count() === n2) // only the new file
  }

  test("streaming session_window == batch q56 (AvailableNow, complete)") {
    val q = EventStream.sessionWindows(EventStream.readEvents(spark, sf))
      .writeStream.format("memory").queryName("sw")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("sw").collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.get(2).toString,
        r.getLong(3))).toSet
    val want = SparkEntry.queries("q56_session_window")(spark, sf).collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.get(2).toString,
        r.getLong(3))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("continuous sessionization: idle user's session closes via " +
    "EventTimeTimeout when the watermark passes its gap") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00:00")
    val input = MemoryStream[EventStream.Ev]
    val q = EventStream.sessionizeContinuous(input.toDS())
      .writeStream.format("memory").queryName("sess_cont")
      .outputMode("append").start()
    try {
      // batch 1: user 1 has two events 10 min apart, then goes idle
      input.addData(
        EventStream.Ev(1L, t0, 1L),
        EventStream.Ev(2L, t0.plusMinutes(10), 1L))
      q.processAllAvailable()
      assert(spark.table("sess_cont").isEmpty) // session still open
      // batch 2: OTHER users' traffic 3 h later drives the watermark to
      // t0+150min — past user 1's timeout at session_end+30min
      input.addData(EventStream.Ev(3L, t0.plusHours(3), 2L))
      q.processAllAvailable()
      // the watermark computed from batch 2 is applied in the NEXT
      // batch; trigger one more
      input.addData(EventStream.Ev(4L, t0.plusHours(3).plusMinutes(1), 2L))
      q.processAllAvailable()
      val rows = spark.table("sess_cont")
        .select("user_id", "session_start", "session_end", "n_events")
        .collect()
        .map(r => (r.getLong(0), r.get(1).toString, r.get(2).toString,
          r.getLong(3)))
      // user 1's session closed by TIMEOUT (no user-1 event did it) and
      // matches batch q27 semantics: [t0, t0+10min], 2 events
      assert(rows.contains(
        (1L, "2024-01-01T00:00", "2024-01-01T00:10", 2L)), rows.toSeq)
      // user 2's session is still open: no emission for it
      assert(!rows.exists(_._1 == 2L), rows.toSeq)
    } finally q.stop()
  }

  test("streaming key dedup drops at-least-once replays with bounded " +
    "state (dropDuplicatesWithinWatermark)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = java.time.LocalDateTime.parse("2024-01-01T00:00:00")
    val input = MemoryStream[(Long, java.time.LocalDateTime, Long, String)]
    val q = EventStream.dedupedEvents(
      input.toDF().toDF("event_id", "ts", "user_id", "event_type"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      input.addData((1L, t0, 1L, "view"), (2L, t0.plusMinutes(1), 1L, "click"))
      q.processAllAvailable()
      // batch 2 replays id 2 (at-least-once re-delivery) and adds id 3
      input.addData((2L, t0.plusMinutes(1), 1L, "click"),
        (3L, t0.plusMinutes(2), 2L, "view"))
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids === Seq(1L, 2L, 3L)) // each key exactly once
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization == batch q27 (backfill mode)") {
    import spark.implicits._
    val src = EventStream.readEvents(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"))
      .as[EventStream.Ev]
    val q = EventStream.sessionize(src, flushOpen = true)
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("sess").collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.get(2).toString,
        r.getLong(3))).toSet
    val want = SparkEntry.queries("q27_sessionize")(spark, sf)
      .select("user_id", "session_start", "session_end", "n_events").collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.get(2).toString,
        r.getLong(3))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("flatMapGroupsWithState lateness HWM == batch q494's window " +
    "lateness, event-for-event (backfill mode)") {
    import spark.implicits._
    val src = EventStream.readEvents(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"))
      .as[EventStream.Ev]
    val q = EventStream.latenessUs(src)
      .writeStream.format("memory").queryName("late")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("late").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the batch-side per-event lateness: the exact window expression
    // q494 aggregates (running event-time max over strictly earlier
    // arrivals per user, in the hashed arrival permutation)
    import org.apache.spark.sql.expressions.Window
    val arr = graft.ops.Portable.arrivalSeqSpark
    val w = Window.partitionBy(col("user_id"))
      .orderBy(expr(arr), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = Fixtures.table(spark, sf, "events")
      .withColumn("hwm", max(col("ts")).over(w))
      .select(col("event_id"),
        greatest(lit(0L), coalesce(
          expr("timestampdiff(MICROSECOND, ts, hwm)"), lit(0L)))
          .as("late_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.nonEmpty)
    assert(got.exists(_._2 > 0L)) // the fixture contains genuine lateness
  }

  test("streaming MinHash LSH candidates == batch q18 candidate pairs " +
    "(AvailableNow)") {
    import graft.ops.Dedup
    import graft.streaming.DocStream
    // the row-local signature twin agrees with the batch band table
    // row-for-row — the precondition for stream ≡ batch candidates
    val batchBands = Dedup.minhashBands(Dedup.inverted(spark, sf))
    val bandSet = batchBands.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val rowLocal = Dedup.minhashBandsRowLocal(
        Fixtures.table(spark, sf, "documents")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(rowLocal === bandSet)

    val q = DocStream.lshCandidates(DocStream.readDocuments(spark, sf))
      .writeStream.format("memory").queryName("lshcand")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // per-band emission → distinct; batch emits per band via self-join
    val got = spark.table("lshcand").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = batchBands.alias("a").join(batchBands.alias("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming repeated-span worklist == batch q151 (AvailableNow)") {
    import graft.streaming.DocStream
    val q = DocStream.spanWorklist(DocStream.readDocuments(spark, sf))
      .writeStream.format("memory").queryName("spanwl")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // consumers keep the latest (max n_docs) row per span_key
    val got = spark.table("spanwl").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .groupBy(_._1).map { case (_, rs) => rs.maxBy(_._3) }.toSet
    val want = SparkEntry.queries("q151_repeated_spans")(spark, sf)
      .select("span_key", "span", "n_docs", "first_doc", "last_doc")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("span worklist grows incrementally: a later doc re-emits its " +
    "span with the updated count") {
    import graft.streaming.DocStream
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val span8 = "a b c d e f g h" // exactly one 8-token window
    val input = MemoryStream[(Long, String)]
    val q = DocStream.spanWorklist(
        input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("spaninc")
      .outputMode("append").start()
    try {
      input.addData((1L, span8), (2L, s"$span8 extra"))
      q.processAllAvailable()
      val afterB1 = spark.table("spaninc")
        .select("span", "n_docs", "first_doc", "last_doc").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(afterB1.toSet === Set((span8, 2L, 1L, 2L)))
      // batch 2: doc 3 repeats the span → the worklist row re-emits
      // updated; doc 4's novel text emits nothing (n = 1)
      input.addData((3L, span8), (4L, "i j k l m n o p"))
      q.processAllAvailable()
      val all = spark.table("spaninc")
        .select("span", "n_docs", "first_doc", "last_doc").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(all.toSet === Set((span8, 2L, 1L, 2L), (span8, 3L, 1L, 3L)))
    } finally q.stop()
  }

  test("streaming decontamination gate == batch q183 per-source report " +
    "(AvailableNow)") {
    import graft.streaming.DocStream
    val benchKeys = graft.ops.Dedup.inverted(spark, sf)
      .where(col("doc_id") < 10).select("h")
      .collect().map(_.getLong(0)).toSet
    assert(benchKeys.nonEmpty)
    val q = DocStream.decontaminate(
        DocStream.readDocuments(spark, sf), benchKeys)
      .writeStream.format("memory").queryName("decon")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("decon")
      .where(col("doc_id") >= 10)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("dropped")).as("n_dropped"),
        sum(expr("CASE WHEN dropped = 0 THEN n_tok ELSE 0L END"))
          .as("kept_tokens"),
        sum(expr("CASE WHEN dropped = 1 THEN n_tok ELSE 0L END"))
          .as("dropped_tokens"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val want = SparkEntry.queries("q183_decontaminate_apply")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming exact dedup's latest rows == batch q17 (AvailableNow)") {
    import graft.streaming.DocStream
    val q = DocStream.exactDedup(DocStream.readDocuments(spark, sf))
      .writeStream.format("memory").queryName("exdedup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // latest emission per key = the one with the (strictly growing)
    // max n_docs; its canonical_id is the final min
    val got = spark.table("exdedup")
      .groupBy(col("content_key"))
      .agg(max(struct(col("n_docs"), col("canonical_id"))).as("f"))
      .select(col("content_key"), col("f.n_docs").as("n_docs"),
        col("f.canonical_id").as("canonical_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = SparkEntry.queries("q17_dedup_exact")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming mixture-sample gate == batch q173 kept set " +
    "(AvailableNow)") {
    import graft.streaming.DocStream
    val batch = SparkEntry.queries("q173_mixture_sample")(spark, sf)
      .select("source", "accept_rate", "n_kept_docs", "kept_tokens")
      .collect()
    val rates = batch.map(r => r.getString(0) ->
      math.round(r.getDouble(1) * 1e6)).toMap
    val q = DocStream.mixtureGate(
        DocStream.readDocuments(spark, sf), rates)
      .writeStream.format("memory").queryName("mixgate")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("mixgate").where(col("kept") === 1)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept_docs"),
        sum(col("n_tok")).as("kept_tokens"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = batch
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming DSIR scorer == batch q244 per-source report " +
    "(AvailableNow)") {
    import graft.streaming.DocStream
    // the broadcast model is the SAME DataFrame q244 joins against
    val model = graft.queries.TextOps.dsirModel(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(model.nonEmpty)
    val q = DocStream.dsirScore(
        DocStream.readDocuments(spark, sf), model, unseenUnits = 0L)
      .writeStream.format("memory").queryName("dsir")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("dsir")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("lw_units") > 0L, 1L).otherwise(0L)).as("n_favored"),
        (sum(col("lw_units")).cast("double")
          / count(lit(1)).cast("double") / lit(1e9)).as("mean_log_w"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val want = SparkEntry.queries("q244_dsir_importance")(spark, sf)
      .select("source", "n_docs", "n_favored", "mean_log_w")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming DiD cells reproduce batch q255 means (AvailableNow, " +
    "complete mode)") {
    val q = EventStream.didCells(EventStream.readEvents(spark, sf))
      .writeStream.format("memory").queryName("didcells")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val cells = spark.table("didcells").collect()
      .map(r => (r.getLong(0), r.getBoolean(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(cells.size === 4)
    val b = SparkEntry.queries("q255_diff_in_diff")(spark, sf).collect().head
    def mean(arm: Long, post: Boolean): Double = {
      val (n, su) = cells((arm, post))
      su.toDouble / 1e6 / n.toDouble
    }
    assert(cells((0L, false))._1 === b.getLong(0))  // n_pre_c
    assert(cells((0L, true))._1 === b.getLong(1))   // n_post_c
    assert(cells((1L, false))._1 === b.getLong(2))  // n_pre_t
    assert(cells((1L, true))._1 === b.getLong(3))   // n_post_t
    assert(math.abs(mean(0, false) - b.getDouble(4)) < 1e-9)
    assert(math.abs(mean(0, true) - b.getDouble(5)) < 1e-9)
    assert(math.abs(mean(1, false) - b.getDouble(6)) < 1e-9)
    assert(math.abs(mean(1, true) - b.getDouble(7)) < 1e-9)
  }

  test("streaming Gopher battery == batch q257 per-source pass counts " +
    "(AvailableNow)") {
    import graft.streaming.DocStream
    val q = DocStream.gopherFlags(DocStream.readDocuments(spark, sf))
      .writeStream.format("memory").queryName("gopher")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("gopher")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("r_count")).as("n_pass_count"),
        sum(col("r_len")).as("n_pass_len"),
        sum(col("r_stop")).as("n_pass_stop"),
        sum(col("r_rep")).as("n_pass_rep"),
        sum(col("pass_all")).as("n_pass_all"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    val want = SparkEntry.queries("q257_gopher_rules")(spark, sf)
      .select("source", "n_docs", "n_pass_count", "n_pass_len",
        "n_pass_stop", "n_pass_rep", "n_pass_all")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("stream tokenization matches Spark SQL split on trailing and " +
    "consecutive spaces") {
    import graft.streaming.DocStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // Texts chosen so Java's default split(" ") (drops trailing
    // empties) and Spark SQL's split (keeps them) disagree — the batch
    // q173/q183 contract is Spark's, and the stream must match it.
    val texts = Seq("a b ", "a  b", " ", "", "a b  ")
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)]
    val q = DocStream.mixtureGate(
        input.toDF().toDF("doc_id", "source", "text"),
        Map("web" -> 1000000L))
      .writeStream.format("memory").queryName("toktest")
      .outputMode("append").start()
    try {
      input.addData(texts.zipWithIndex.map {
        case (t, i) => (i.toLong, "web", t)
      })
      q.processAllAvailable()
      val got = spark.table("toktest").select("doc_id", "n_tok").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> spark.range(1).select(
          size(split(lit(t), " "))).head().getInt(0).toLong
      }.toMap
      assert(got === want)
      // the fixture has power: Java's trailing-empty-dropping split
      // disagrees on at least one of these texts
      assert(texts.exists(t => t.split(" ").length != t.split(" ", -1).length))
    } finally q.stop()
  }

  test("streaming hopping counts == batch q108 counts (AvailableNow)") {
    val q = EventStream.hoppingCounts(EventStream.readEvents(spark, sf))
      .writeStream.format("memory").queryName("hop")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("hop")
      .select("bucket", "event_type", "n").collect()
      .map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    val want = SparkEntry.queries("q108_hopping_window")(spark, sf)
      .select("bucket", "event_type", "n").collect()
      .map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming HLL registers == batch construction; estimate within " +
    "HLL error of exact (AvailableNow)") {
    val q = EventStream.hllRegisters(EventStream.readEvents(spark, sf))
      .writeStream.format("memory").queryName("hllreg")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("hllreg")
    // batch twin: identical hash/register/rank arithmetic over the
    // same windows — stream must match REGISTER-FOR-REGISTER
    val batch = Fixtures.table(spark, sf, "events")
      .withColumn("h", expr(
        graft.ops.Portable.h32Spark("concat('u_', user_id)")))
      .groupBy(window(col("ts").cast("timestamp"), "6 hours")
        .getField("start").cast("timestamp_ntz").as("bucket"),
        (col("h") % 64).as("reg"))
      .agg(max(expr("CASE WHEN h div 64 > 0 THEN " +
        "27 - length(bin(h div 64)) ELSE 27 END")).as("mr"))
    val got = streamed.collect()
      .map(r => (r.get(0).toString, r.getLong(1)) -> r.get(2).toString).toMap
    val want = batch.collect()
      .map(r => (r.get(0).toString, r.getLong(1)) -> r.get(2).toString).toMap
    assert(got === want)
    assert(got.nonEmpty)
    // the register fold is a faithful estimator: within 3σ of the
    // standard HLL relative error (1.04/√64 = 13%) of the exact count
    val est = EventStream.hllEstimate(streamed)
      .collect().map(r => r.get(0).toString -> r.getDouble(1)).toMap
    val exact = Fixtures.table(spark, sf, "events")
      .groupBy(window(col("ts").cast("timestamp"), "6 hours")
        .getField("start").cast("timestamp_ntz").as("bucket"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (b, n) =>
      assert(math.abs(est(b) - n) <= math.max(3 * 0.13 * n, 8.0),
        s"bucket $b: est ${est(b)} vs exact $n")
    }
  }

  test("streaming last-touch attribution == batch q126 channel counts " +
    "(AvailableNow)") {
    import spark.implicits._
    val src = EventStream.readEvents(spark, sf)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[EventStream.EvT]
    val q = EventStream.attributeLastTouch(src)
      .writeStream.format("memory").queryName("attr")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("attr")
      .groupBy("channel").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = SparkEntry.queries("q126_attribution")(spark, sf)
      .select("channel", "n_purchases").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got.values.sum > 0)
  }

  test("streaming as-of state lookup == batch q512 (AvailableNow)") {
    import spark.implicits._
    val src = EventStream.readEvents(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[EventStream.EvT]
    val q = EventStream.asOfStateLookup(src)
      .writeStream.format("memory").queryName("asofstate")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("asofstate")
      .select(col("purchase_id"), col("state"), col("state_ts")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.get(2)).map(_.toString))).toSet
    val want = SparkEntry.queries("q512_asof_state_lookup")(spark, sf)
      .select(col("purchase_id"), col("state"), col("state_ts")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.get(2)).map(_.toString))).toSet
    assert(got === want)
    assert(got.nonEmpty)
    assert(got.exists(_._2.isDefined) && got.exists(_._2.isEmpty),
      "fixture should exercise both matched and null-state purchases")
  }

  test("stream-stream interval join == batch q26 range join " +
    "(AvailableNow, append)") {
    val q = EventStream.errorPairs(
        EventStream.readEvents(spark, sf), EventStream.readEvents(spark, sf))
      .writeStream.format("memory").queryName("sspairs")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("sspairs")
      .select("user_id", "a_id", "b_id", "dt_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = SparkEntry.queries("q26_range_join")(spark, sf)
      .select("user_id", "a_id", "b_id", "dt_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming throttle == batch q222 kept set (AvailableNow)") {
    import spark.implicits._
    val src = EventStream.readEvents(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[EventStream.EvT]
    val q = EventStream.throttle(src)
      .writeStream.format("memory").queryName("throttled")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("throttled").select("event_id").collect()
      .map(_.getLong(0)).toSet
    val want = SparkEntry.queries("q222_throttle_dedup")(spark, sf)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got === want)
    // the throttle must actually suppress something at fixture scale
    val total = Fixtures.table(spark, sf, "events").count()
    assert(got.nonEmpty && got.size < total)
  }

  test("streaming SRM counts == batch q309 split counts (AvailableNow, " +
    "complete mode)") {
    import graft.streaming.DocStream
    val q = DocStream.srmCounts(DocStream.readDocuments(spark, sf))
      .writeStream.format("memory").queryName("srm")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("srm").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = SparkEntry.queries("q309_srm_check")(spark, sf).collect().head
    assert(got.values.sum === b.getLong(0))           // n_docs
    assert(got.getOrElse("train", 0L) === b.getLong(1))
    assert(got.getOrElse("val", 0L) === b.getLong(2))
    assert(got.getOrElse("test", 0L) === b.getLong(3))
    assert(got.values.sum > 0L)
  }

  test("streaming daily revenue cents == batch q347 day totals " +
    "(AvailableNow, complete mode)") {
    val q = EventStream.dailyRevenueCents(
      EventStream.readEvents(spark, sf))
      .writeStream.format("memory").queryName("dailyrev")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("dailyrev").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // recompute the batch day totals with the exact q347 pinning
    val want = Fixtures.table(spark, sf, "events")
      .select(expr("timestampdiff(MICROSECOND, " +
        "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000")
        .as("day"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4))
          .as("v"))
      .groupBy(col("day"))
      .agg(expr("CAST(round(sum(v) * 100.0) AS BIGINT)").as("tot_cents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got.nonEmpty)
    // and the batch q347 runs off the same totals: its n_days agrees
    val b = SparkEntry.queries("q347_cvar")(spark, sf).collect().head
    assert(b.getLong(0) === got.size.toLong)
  }

  test("streaming feature store == batch q276 per-user features " +
    "(AvailableNow backfill, last emitted row per user)") {
    import spark.implicits._
    val src = EventStream.readEvents(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[EventStream.EvT]
    val q = EventStream.featureStore(src)
      .writeStream.format("memory").queryName("feat")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // one AvailableNow batch → exactly one emitted row per user = final
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getDouble(8))
    val cols = Seq("user_id", "n_events", "n_purchases", "value_micro",
      "first_day", "last_day", "active_days", "recency_days",
      "error_share")
    val got = spark.table("feat")
      .select(cols.map(col): _*).collect().map(key).toSet
    val want = SparkEntry.queries("q276_feature_store")(spark, sf)
      .select(cols.map(col): _*).collect().map(key).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming ingest near-dup (stream-static index join) == batch " +
    "q104 (AvailableNow)") {
    import graft.ops.Dedup
    import graft.streaming.DocStream
    // the standing corpus index: the batch posting table minus the
    // arriving slice — exactly the old side of batch q104's new×old join
    val standing = Dedup.inverted(spark, sf)
      .where(col("doc_id") % 10 >= 2)
    val newDocs = DocStream.readDocuments(spark, sf)
      .where(col("doc_id") % 10 < 2)
    val q = DocStream.ingestNearDups(newDocs, standing)
      .writeStream.format("memory").queryName("ingestdup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // keep the latest row per pair (the re-emission contract), then
    // compare (doc_new, doc_old, jaccard) against the batch query
    val latest = spark.table("ingestdup")
      .groupBy(col("doc_new"), col("doc_old"))
      .agg(max(col("n_common")).as("n_common"), max(col("jaccard")).as("j"))
    val got = latest.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    val want = SparkEntry.queries("q104_incremental_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming ingest LSH candidates (stream-static band join) == " +
    "batch q473 candidate set (AvailableNow)") {
    import graft.ops.Dedup
    import graft.streaming.DocStream
    // the standing corpus band table: the batch band projection over the
    // old slice — exactly the old side of batch q473's asymmetric join
    val standingBands = Dedup.minhashBands(
      Dedup.inverted(spark, sf).where(col("doc_id") % 10 >= 2))
    val newDocs = DocStream.readDocuments(spark, sf)
      .where(col("doc_id") % 10 < 2)
    val q = DocStream.ingestLshCandidates(newDocs, standingBands)
      .writeStream.format("memory").queryName("ingestlsh")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // per-band emissions dedup in the collected set (the DocStream
    // convention), then compare against the batch band self-join
    val got = spark.table("ingestlsh").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val newBands = Dedup.minhashBands(
      Dedup.inverted(spark, sf).where(col("doc_id") % 10 < 2))
    val want = newBands.alias("n").join(standingBands.alias("o"),
        col("n.band") === col("o.band") && col("n.bkey") === col("o.bkey"))
      .select(col("n.doc_id"), col("o.doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming ingest LSH candidates against the PERSISTED band " +
    "artifacts == batch q473 candidate set (AvailableNow)") {
    import graft.ops.{Dedup, StandingIndex}
    import graft.streaming.DocStream
    // the static side is the bootstrap-written bucketed CATALOG table —
    // the live-deployment shape: a stream probing the persisted index,
    // not a session-built band projection
    val standingBands = StandingIndex.bands(spark, sf)
    val newDocs = DocStream.readDocuments(spark, sf)
      .where(col("doc_id") % 10 < 2)
    val q = DocStream.ingestLshCandidates(newDocs, standingBands)
      .writeStream.format("memory").queryName("ingestlshpersist")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("ingestlshpersist").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val newBands = Dedup.minhashBands(
      Dedup.inverted(spark, sf).where(col("doc_id") % 10 < 2))
    val want = newBands.alias("n").join(
        Dedup.corpusBands(spark, sf).alias("o"),
        col("n.band") === col("o.band") && col("n.bkey") === col("o.bkey"))
      .select(col("n.doc_id"), col("o.doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming ingest SimHash candidates (stream-static block join) " +
    "== batch q491 candidate set (AvailableNow)") {
    import graft.ops.Dedup
    import graft.streaming.DocStream
    // the standing block table: the batch signature construction over
    // the old slice — exactly the old side of batch q491's join, at
    // q491's 16-bit width-for-scale banding
    val standingBlocks = Dedup.simhashBlocks(
      Dedup.inverted(spark, sf).where(col("doc_id") % 10 >= 2),
      blockBits = 16)
    val newDocs = DocStream.readDocuments(spark, sf)
      .where(col("doc_id") % 10 < 2)
    val q = DocStream.ingestSimhashCandidates(newDocs, standingBlocks)
      .writeStream.format("memory").queryName("ingestsim")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // per-block emissions dedup in the collected set (the DocStream
    // convention), then compare against the batch block join
    val got = spark.table("ingestsim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val newBlocks = Dedup.simhashBlocks(
      Dedup.inverted(spark, sf).where(col("doc_id") % 10 < 2),
      blockBits = 16)
    val want = newBlocks.alias("a").join(standingBlocks.alias("b"),
        col("a.blk") === col("b.blk") && col("a.bval") === col("b.bval"))
      .select(col("a.doc_id"), col("b.doc_id"),
        expr("bit_count(a.simhash ^ b.simhash)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming ingest ANN candidates equal batch q474's scored set " +
    "(AvailableNow)") {
    import graft.streaming.VecStream
    // the standing codebook as the driver-held routing map — the
    // dsirScore side-input convention, collected from the same
    // standing-members-only aggregation batch q474 routes by
    val codebook = graft.ops.Similarity.standingCodebook(spark, sf)
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    val newVecs = VecStream.readEmbeddings(spark, sf)
      .where(col("vec_id") % 10 < 2)
    val standing = Fixtures.table(spark, sf, "embeddings")
      .where(col("vec_id") % 10 >= 2)
    // the occupancy census as a second driver-held side input — the
    // same integer log2 batch q474 computes in-plan
    val nStand = standing.count()
    val nCells = standing.select("label").distinct().count()
    val sBits = {
      val occ = nStand / (nCells * 64)
      if (occ >= 1) 63 - java.lang.Long.numberOfLeadingZeros(occ) else 0
    }
    val q = VecStream.ingestAnnCandidates(newVecs, codebook, standing,
        sBits)
      .writeStream.format("memory").queryName("ingestann")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("ingestann").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // batch re-derivation: q474's assign ⋈ standing scored set BEFORE
    // the top-k rank (the rank is the consumer's job in the stream)
    import org.apache.spark.sql.expressions.Window
    def subCol(e: String) = (0 until 8).map(i =>
      when(lit(i) < sBits && expr(s"element_at($e, ${i + 1})") >= 0,
        1 << i).otherwise(0)).reduce(_ + _)
    val standCvec = graft.ops.Similarity.standingCodebook(spark, sf)
    val batch = Fixtures.table(spark, sf, "embeddings")
      .where(col("vec_id") % 10 < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        subCol("embedding").as("sub"))
    val wCell = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("label"))
    val want = batch.crossJoin(broadcast(standCvec))
      .select(col("query_id"), col("qe"), col("sub"), col("label"),
        expr("graft_cosine(qe, cvec)").as("ccos"))
      .withColumn("rn", row_number().over(wCell))
      .where(col("rn") === 1)
      .select(col("query_id"), col("qe"), col("sub"),
        col("label").as("cell"))
      .join(standing.select(col("label").as("cell"),
        col("vec_id").as("neighbor_id"), col("embedding").as("ne"),
        subCol("embedding").as("sub")),
        Seq("cell", "sub"))
      .select(col("query_id"), col("cell"), col("neighbor_id"),
        expr("graft_cosine(qe, ne)").as("cosine"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming quality-gate bucketing matches batch q477's batch " +
    "counts (AvailableNow)") {
    import graft.streaming.DocStream
    // the frozen boundaries as the driver-held side input, cut on the
    // standing corpus exactly as batch q477 cuts them
    val bounds = graft.ops.Quality.standingQualityBounds(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(bounds.length == 9)
    val newDocs = DocStream.readDocuments(spark, sf)
      .where(col("doc_id") % 10 < 2)
    val q = DocStream.qualityBucket(newDocs, bounds)
      .writeStream.format("memory").queryName("qgate")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("qgate").groupBy(col("bucket"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // batch q477 output: (bucket, n_batch) — buckets with zero batch
    // docs appear with n_batch = 0 and must be absent from the stream
    val want = SparkEntry.queries("q477_ingest_quality_psi")(spark, sf)
      .select(col("bucket"), col("n_batch")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).filter(_._2 > 0).toMap
    assert(got === want)
    assert(got.values.sum > 0)
  }

  test("streaming bottom-K sample state == batch q482 whole-corpus " +
    "bottom-K (AvailableNow, update)") {
    import graft.streaming.DocStream
    val k = 16
    val q = DocStream.sampleBottomK(DocStream.readDocuments(spark, sf), k)
      .writeStream.format("memory").queryName("bksample")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // the final sample state is the lexicographic minimum of the
    // full-length emissions (bottom-K state only ever improves)
    import scala.math.Ordering.Implicits._
    val emissions = spark.table("bksample").collect()
      .map(_.getSeq[Long](0).toSeq)
    val got = emissions.filter(_.length == k).min
    val want = Fixtures.table(spark, sf, "documents")
      .select(expr(graft.ops.Portable
        .h52Spark("concat('smp_', cast(doc_id AS STRING))")).as("h"))
      .distinct().orderBy("h").limit(k).collect().map(_.getLong(0)).toSeq
    assert(got === want)
    assert(got.length == k)
    // and it equals the h column batch q482 reports, rank for rank
    val viaQuery = SparkEntry.queries("q482_ingest_sample_merge")(spark, sf)
      .orderBy("rank").collect().map(_.getAs[Long]("h")).toSeq
    assert(viaQuery === want)
  }

  test("streaming MG sketch state contains every batch heavy hitter " +
    "(q509 superset guarantee, AvailableNow)") {
    import graft.streaming.DocStream
    val q = DocStream.heavyHitterSketch(DocStream.readDocuments(spark, sf))
      .writeStream.format("memory").queryName("hhsketch")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // latest emission per shard (n is cumulative, so max-n row wins)
    val streamTokens = spark.table("hhsketch").collect()
      .groupBy(_.getInt(0))
      .values.map(_.maxBy(_.getLong(3)))
      .flatMap(_.getSeq[String](1)).toSet
    val heavy = SparkEntry.queries("q509_heavy_hitter_tokens")(spark, sf)
      .collect().map(_.getString(0)).toSet
    assert(heavy.nonEmpty)
    assert(heavy.subsetOf(streamTokens),
      s"missing: ${heavy.diff(streamTokens)}")
  }

  test("foreachBatch index maintenance: stream-appended generations == " +
    "the batch two-generation story (AvailableNow), q529 probe re-used") {
    import graft.ops.{Dedup, StandingIndex}
    import graft.streaming.DocStream
    // same split as ensureCompacted: bootstrap over % 10 in 2..7, the
    // accepted % 10 >= 8 docs arrive as a STREAM instead of one batch
    val arts = StandingIndex.bootstrapWhere(spark, sf, "_streammaint",
      "doc_id % 10 >= 2 AND doc_id % 10 <= 7")
    val accepted = DocStream.readDocuments(spark, sf)
      .where(col("doc_id") % 10 >= 8)
    val q = DocStream.maintainStandingIndex(accepted, arts)
    q.awaitTermination(120000)
    val gens = StandingIndex.committedGens(arts)
    assert(gens.length >= 2,
      s"expected bootstrap + at least one stream wave, got $gens")
    // posting parity: stream-maintained artifacts cover exactly the
    // union corpus the one-shot bootstrap would
    val gotPost = StandingIndex.postingsOf(spark, arts).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantPost = Dedup.inverted(spark, sf)
      .where(expr("doc_id % 10 >= 2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotPost === wantPost)
    // q529's probe shape over the STREAM-maintained artifacts equals
    // the probe over the batch ensureCompacted artifacts — the same
    // candidates the oracle-gated q529 run verifies
    val batchBands = Dedup.minhashBands(
      Dedup.inverted(spark, sf).where(expr("doc_id % 10 < 2")))
      .select(col("doc_id").as("doc_new"), col("band"), col("bkey"))
    def candSet(bands: org.apache.spark.sql.DataFrame) =
      batchBands.join(
        bands.select(col("doc_id").as("doc_old"), col("band"),
          col("bkey")),
        Seq("band", "bkey"))
      .select("doc_new", "doc_old").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotCand = candSet(StandingIndex.bandsOf(spark, arts))
    val wantCand = candSet(
      StandingIndex.bandsOf(spark, StandingIndex.ensureCompacted(spark, sf)))
    assert(gotCand === wantCand)
    assert(gotCand.nonEmpty)
  }
}
