package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the temporal/event operators (q24–q28) and the
  * multimodal decode plumbing (q29) on sf0.001.
  */
class EventsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = GraftSession.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q24 window agg partitions every event exactly once") {
    val total = q("q24_window_agg").agg(sum("n")).collect()(0).getLong(0)
    val events = Fixtures.table(spark, sf, "events").count()
    assert(total === events)
  }

  test("q25 as-of join: click precedes purchase, same user") {
    val rows = q("q25_asof_join").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ts = r.getAs[java.time.LocalDateTime]("ts")
      val click = r.getAs[java.time.LocalDateTime]("last_click_ts")
      assert(!click.isAfter(ts))
    }
  }

  test("q26 banded range join matches a naive in-memory θ-join") {
    val got = q("q26_range_join").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val err = Fixtures.table(spark, sf, "events")
      .where(col("event_type") === "error")
      .select(col("user_id"), col("event_id"),
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val naive = (for {
      a <- err; b <- err
      if a._1 == b._1 && a._2 < b._2 && b._3 >= a._3 && b._3 - a._3 <= 21600000000L
    } yield (a._1, a._2, b._2)).toSet
    assert(got === naive)
  }

  test("q27 sessions cover all events with no overlap per user") {
    val sessions = q("q27_sessionize").collect()
    val total = sessions.map(_.getAs[Long]("n_events")).sum
    assert(total === Fixtures.table(spark, sf, "events").count())
    sessions.groupBy(_.getLong(0)).values.foreach { ss =>
      val sorted = ss.sortBy(_.getAs[Long]("session_seq"))
      sorted.sliding(2).foreach {
        case Array(prev, next) =>
          assert(prev.getAs[java.time.LocalDateTime]("session_end")
            .isBefore(next.getAs[java.time.LocalDateTime]("session_start")))
        case _ =>
      }
    }
  }

  test("q28 json extraction finds k for every event") {
    val agg = q("q28_json_extract").agg(sum("n")).collect()(0).getLong(0)
    assert(agg === Fixtures.table(spark, sf, "events").count())
  }

  test("q29 decode stub: histogram sums to n_bytes; checksum stable") {
    val rows = q("q29_binary_features").collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_bytes")
      val hist = r.getAs[String]("hist").split(',').map(_.toLong)
      assert(hist.sum === n)
      assert(hist.length === 16)
      assert(r.getAs[String]("sample8").split(',').length === 8)
    }
    // determinism: same input → same checksum on re-run
    val again = q("q29_binary_features").collect()
    assert(rows.map(_.getAs[Long]("checksum")).toSeq ===
      again.map(_.getAs[Long]("checksum")).toSeq)
  }
}
