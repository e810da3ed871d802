package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Portable

/** Persisted sketch-state round-trips: the production contract for
  * standing state — one job WRITES per-group sketch state to parquet,
  * a LATER session reopens the artifact (spark.newSession(): fresh
  * session state, no shared temp views or cached plans) and merges a
  * delta's state against it; merge(loaded, delta) must equal a full
  * recompute. Covers the three merge algebras: KMV (min-merge, exact),
  * Bloom (OR-merge, exact), and Misra–Gries (pointwise-add +
  * (k+1)-th-largest subtraction — PODS'12 — with the n/(k+1) superset
  * guarantee, which is the MG merge contract).
  */
class PersistedSketchSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = GraftSession.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  private val sf = "/root/testdata/sf0.001"

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_spec_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("KMV state: write, reopen in a NEW session, merge == full recompute") {
    val K = 64
    val o = Fixtures.table(spark, sf, "orders")
    def state(side: DataFrame): DataFrame = side
      .select(col("o_orderpriority"),
        expr(Portable.h32Spark("cast(o_custkey AS STRING)")).as("h"))
      .distinct()
      .groupBy(col("o_orderpriority"))
      .agg(slice(array_sort(collect_set(col("h"))), 1, K).as("mins"))
    val dir = tmpDir("kmv")
    state(o.where(col("o_orderkey") % 10 >= 2))
      .write.mode("overwrite").parquet(dir)

    // reopen in a genuinely different session
    val s2 = spark.newSession()
    val o2 = Fixtures.table(s2, sf, "orders")
    val loaded = s2.read.parquet(dir)
      .select(col("o_orderpriority").as("pri"),
        col("mins").as("mins_standing"))
    def state2(side: DataFrame): DataFrame = side
      .select(col("o_orderpriority"),
        expr(Portable.h32Spark("cast(o_custkey AS STRING)")).as("h"))
      .distinct()
      .groupBy(col("o_orderpriority"))
      .agg(slice(array_sort(collect_set(col("h"))), 1, K).as("mins"))
    val batch = state2(o2.where(col("o_orderkey") % 10 < 2))
      .select(col("o_orderpriority").as("b_pri"), col("mins").as("mins_batch"))
    val merged = loaded.join(batch, col("pri") === col("b_pri"))
      .select(col("pri"), expr(
        s"slice(array_sort(array_distinct(" +
          s"concat(mins_standing, mins_batch))), 1, $K)").as("mins"))
    val full = state2(o2)
      .select(col("o_orderpriority").as("pri"), col("mins"))
    val a = merged.orderBy("pri").collect().toSeq
    val b = full.orderBy("pri").collect().toSeq
    assert(a === b, "merge(loaded, delta) != recompute for KMV mins")
  }

  test("Bloom position set: write, reopen, OR-merge == full recompute") {
    val bits = 8192
    val o = Fixtures.table(spark, sf, "orders")
    def posSet(side: DataFrame): DataFrame = side
      .select((expr(Portable.h32Spark(
        "concat('b0_', cast(o_custkey AS STRING))")) % bits).as("pos"))
      .distinct()
    val dir = tmpDir("bloom")
    posSet(o.where(col("o_orderkey") % 10 >= 2))
      .write.mode("overwrite").parquet(dir)

    val s2 = spark.newSession()
    val o2 = Fixtures.table(s2, sf, "orders")
    val loaded = s2.read.parquet(dir)
    def posSet2(side: DataFrame): DataFrame = side
      .select((expr(Portable.h32Spark(
        "concat('b0_', cast(o_custkey AS STRING))")) % bits).as("pos"))
      .distinct()
    val merged = loaded
      .union(posSet2(o2.where(col("o_orderkey") % 10 < 2))).distinct()
    val full = posSet2(o2)
    assert(merged.count() === full.count())
    assert(merged.exceptAll(full).count() === 0L)
    assert(full.exceptAll(merged).count() === 0L)
  }

  test("Misra–Gries summary: write, reopen, PODS merge keeps the superset guarantee") {
    val k = 16
    val docs = Fixtures.table(spark, sf, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "")
    val snapA = docs.where(col("doc_id") % 2 === 0)
    val snapB = docs.where(col("doc_id") % 2 === 1)
    val dir = tmpDir("mg")
    snapA.agg(expr(s"graft_freq_sketch(token, $k)").as("summary"))
      .select(explode(col("summary")).as("c"))
      .select(col("c.token").as("token"), col("c.est").as("est"))
      .write.mode("overwrite").parquet(dir)

    val s2 = spark.newSession()
    // re-register the session extensions' functions happen via
    // GraftExtensions on the shared context — newSession inherits the
    // extension-injected functions through the cloned function registry
    val docs2 = Fixtures.table(s2, sf, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "")
    val loaded = s2.read.parquet(dir)
    val deltaSummary = docs2.where(col("doc_id") % 2 === 1)
      .agg(expr(s"graft_freq_sketch(token, $k)").as("summary"))
      .select(explode(col("summary")).as("c"))
      .select(col("c.token").as("token"), col("c.est").as("est"))
    // PODS'12 merge, relationally: pointwise add, then subtract the
    // (k+1)-th largest combined count and drop non-positives
    val combined = loaded.union(deltaSummary)
      .groupBy("token").agg(sum(col("est")).as("est"))
    val kth = combined.orderBy(col("est").desc, col("token"))
      .limit(k + 1).orderBy(col("est"), col("token")).limit(1)
      .select(col("est").as("kth")).collect()
      .headOption.map(_.getLong(0)).getOrElse(0L)
    val over = combined.count()
    val mergedSummary =
      if (over <= k) combined
      else combined.select(col("token"), (col("est") - lit(kth)).as("est"))
        .where(col("est") > 0)
    // guarantee: every token with true count > n/(k+1) over the UNION
    // stream is present in the merged summary
    val total = docs2.count()
    val threshold = total / (k + 1)
    val trueHeavy = docs2.groupBy("token")
      .agg(count(lit(1)).as("n_true"))
      .where(col("n_true") > threshold)
    val missing = trueHeavy.join(mergedSummary, Seq("token"), "left_anti")
    assert(missing.count() === 0L,
      s"MG merge lost a guaranteed heavy hitter: ${missing.collect().toSeq}")
    // underestimate-only: merged est never exceeds the true count
    val overEst = mergedSummary.join(
        docs2.groupBy("token").agg(count(lit(1)).as("n_true")), "token")
      .where(col("est") > col("n_true"))
    assert(overEst.count() === 0L,
      s"MG merge over-estimated: ${overEst.collect().toSeq}")
  }

  test("q521's own artifact is reopenable by a fresh session") {
    // run the gated query once (it writes + reopens within one session)
    val out = SparkEntry.queries("q521_persisted_kmv")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Boolean]("merge_equals_full")),
      s"persisted KMV merge != full recompute: ${out.toSeq}")
    // the artifact it left behind opens cleanly elsewhere (scratch
    // path carries the applicationId — the per-run suffix that keeps
    // concurrent runs from racing on mode(overwrite))
    val stateDir = s"${sys.props("java.io.tmpdir")}/graft_q521_" +
      sf.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      spark.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
    val s2 = spark.newSession()
    val re = s2.read.parquet(stateDir)
    assert(re.columns.toSet === Set("o_orderpriority", "n_standing",
      "mins_standing"))
    assert(re.count() > 0)
  }
}
