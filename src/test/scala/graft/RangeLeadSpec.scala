package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RangeLead must reproduce the window-form lead() gaps exactly — the
  * helper exists so low-cardinality partition keys don't collapse to
  * |keys| straggler tasks, not to change results.
  */
class RangeLeadSpec extends SparkSpec {

  private def base = Fixtures.table(spark, sf, "events")
    .select(col("event_type").as("key"),
      expr("""timestampdiff(MICROSECOND,
        TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)""").as("ts_us"),
      col("event_id").as("tie"), col("value"))

  private def windowGaps = {
    val w = Window.partitionBy(col("key")).orderBy(col("ts_us"), col("tie"))
    base.withColumn("next_ts", lead(col("ts_us"), 1).over(w))
      .where(col("next_ts").isNotNull)
      .select(col("key"), col("value"),
        (col("next_ts") - col("ts_us")).as("gap_us"))
  }

  private def multiset(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .sorted.toSeq

  test("RangeLead.gaps == window-form lead gaps (multiset)") {
    val got = multiset(graft.ops.RangeLead.gaps(base))
    val want = multiset(windowGaps)
    assert(got.size === want.size)
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("cross-shard stitching survives many tiny shards (keys span " +
    "nearly every shard)") {
    // 64 shards over 5 keys forces every key across ~13 shards, so a
    // large share of gaps are driver-stitched boundary gaps
    val got = multiset(graft.ops.RangeLead.gaps(base, shards = 64))
    val want = multiset(windowGaps)
    assert(got === want)
  }

  test("q95's default (RangeLead) output equals the " +
    "graft.lead.strategy=window form") {
    val got = run("q95_twap").collect().map(_.toString).sorted
    spark.conf.set("graft.lead.strategy", "window")
    try {
      val want = run("q95_twap").collect().map(_.toString).sorted
      assert(got === want)
    } finally spark.conf.unset("graft.lead.strategy")
  }
}
