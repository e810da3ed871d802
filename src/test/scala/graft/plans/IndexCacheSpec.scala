package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** The broadcast-index memo must key on (broadcast value, lookup
  * fingerprint), not the bare value: IdentityBroadcastMode carries no
  * key info, so ReuseExchange/AQE can hand the SAME broadcast row
  * array to two lookups with different right keys/time expressions
  * (range+range, or range+as-of against one dim). A value-only cache
  * would silently serve the first-built index to the second lookup —
  * wrong matches with no error. Also pins the unit-family constructor
  * guard on the range execs (day-backed vs long-backed bounds must
  * not mix — raw-long comparison across families is days-vs-micros).
  */
class IndexCacheSpec extends AnyFunSuite {

  test("distinct fingerprints over one broadcast value get distinct indexes") {
    val sharedBroadcastValue = new Object
    val a = AsOfIndexCache.getOrBuild(
      sharedBroadcastValue, "range:k1;t1", () => "indexA")
    val b = AsOfIndexCache.getOrBuild(
      sharedBroadcastValue, "asof:k2;t2", () => "indexB")
    assert(a === "indexA")
    assert(b === "indexB")
  }

  test("same fingerprint is memoized (no rebuild per partition)") {
    val value = new Object
    var builds = 0
    def build(): String = { builds += 1; "idx" }
    AsOfIndexCache.getOrBuild(value, "range:k;t", () => build())
    AsOfIndexCache.getOrBuild(value, "range:k;t", () => build())
    assert(builds === 1)
  }

  test("range execs reject mixed day-backed/long-backed bounds") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal}
    import org.apache.spark.sql.types.{DateType, IntegerType, LongType, TimestampType}
    import org.apache.spark.sql.execution.LocalTableScanExec
    def attr(n: String, dt: org.apache.spark.sql.types.DataType) =
      AttributeReference(n, dt, nullable = true)()
    val k = attr("k", LongType)
    val leftChild = LocalTableScanExec(
      Seq(k, attr("lo", DateType), attr("hi", DateType)), Nil, None)
    val rightChild = LocalTableScanExec(
      Seq(attr("rk", LongType), attr("t", TimestampType)), Nil, None)
    val lo = leftChild.output(1)
    val hi = leftChild.output(2)
    val rk = rightChild.output(0)
    val t = rightChild.output(1)
    // DATE bounds against a TIMESTAMP right-time: days vs micros
    val e1 = intercept[IllegalArgumentException] {
      RangeJoinExec(Seq(k), Seq(rk), lo, hi, t,
        leftOuter = false, leftChild, rightChild)
    }
    assert(e1.getMessage.contains("unit family"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      BroadcastRangeJoinExec(Seq(k), Seq(rk), lo, hi, t,
        leftOuter = false, leftChild, rightChild)
    }
    assert(e2.getMessage.contains("unit family"), e2.getMessage)
    // homogeneous families still construct: all-day and all-long
    RangeJoinExec(Seq(k), Seq(rk), lo, hi,
      attr("td", DateType), leftOuter = false, leftChild, rightChild)
    RangeJoinExec(Seq(k), Seq(rk),
      Literal(1L), Literal(2L), t, leftOuter = false, leftChild, rightChild)
    // INT counts as day-backed alongside DATE (widened-day callers)
    RangeJoinExec(Seq(k), Seq(rk), lo, hi,
      attr("ti", IntegerType), leftOuter = false, leftChild, rightChild)
  }
}
