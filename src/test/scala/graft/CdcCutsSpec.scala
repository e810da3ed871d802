package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CdcCuts expression: the one-pass rolling hash must agree with the
  * non-rolled per-position polynomial (the oracle's formulation) on
  * real fixture text, across the codegen and interpreted paths.
  */
class CdcCutsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = GraftSession.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  private val sf = "/root/testdata/sf0.001"

  // per-position polynomial, no rolling — textually the oracle's form
  private val brute = """filter(transform(sequence(1, length(text) - 7),
      i -> CASE WHEN (cast(ascii(substring(text, i, 1)) AS BIGINT) * 155737
        + cast(ascii(substring(text, i + 1, 1)) AS BIGINT) * 410923
        + cast(ascii(substring(text, i + 2, 1)) AS BIGINT) * 317680
        + cast(ascii(substring(text, i + 3, 1)) AS BIGINT) * 923521
        + cast(ascii(substring(text, i + 4, 1)) AS BIGINT) * 29791
        + cast(ascii(substring(text, i + 5, 1)) AS BIGINT) * 961
        + cast(ascii(substring(text, i + 6, 1)) AS BIGINT) * 31
        + cast(ascii(substring(text, i + 7, 1)) AS BIGINT))
        % 1048573 % 32 = 0 THEN cast(i + 7 AS BIGINT) END),
      x -> x IS NOT NULL)"""

  test("graft_cdc_cuts equals the non-rolled polynomial on fixture docs") {
    val bad = Fixtures.table(spark, sf, "documents")
      .where(length(col("text")) >= 8)
      .select(expr("graft_cdc_cuts(text, 8, 32)").as("roll"),
        expr(brute).as("direct"))
      .where(not(col("roll") === col("direct")))
      .count()
    assert(bad === 0L)
    val nonEmpty = Fixtures.table(spark, sf, "documents")
      .where(size(expr("graft_cdc_cuts(text, 8, 32)")) > 0).count()
    assert(nonEmpty > 0L, "fixture produced no cuts at all — mask too big?")
  }

  test("graft_cdc_cuts interpreted eval matches a hand-computed case") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val s = "the quick brown fox jumps over the lazy dog"
    val got = graft.expressions.CdcCuts(
        Literal(UTF8String.fromString(s)), Literal(8), Literal(32))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    val P = 1048573L
    val pow = Array(1L, 31L, 961L, 29791L, 923521L, 317680L, 410923L, 155737L)
    val want = (0 to s.length - 8).flatMap { i =>
      val h = (0 until 8).map(j => s.charAt(i + j).toLong * pow(7 - j)).sum % P
      if (h % 32 == 0) Some((i + 8).toLong) else None
    }
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("graft_cdc_cuts is null-safe and empty on short text") {
    val r = spark.sql(
      "SELECT graft_cdc_cuts(CAST(NULL AS STRING), 8, 32)").collect()(0)
    assert(r.isNullAt(0))
    val short = spark.sql("SELECT graft_cdc_cuts('abc', 8, 32)")
      .collect()(0).getSeq[Long](0)
    assert(short.isEmpty)
  }

  test("content-defined cuts re-synchronize after an insertion") {
    // the CDC selling point: editing a prefix must not re-align every
    // chunk after it — cut ends after the edit shift by exactly the
    // insertion length once the window clears the edit site
    val base = "a quick brown fox jumps over the lazy dog " * 20
    val edited = base.substring(0, 10) + "XYZ" + base.substring(10)
    def cuts(t: String): Seq[Long] = {
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.unsafe.types.UTF8String
      graft.expressions.CdcCuts(
          Literal(UTF8String.fromString(t)), Literal(8), Literal(32))
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
    }
    val cb = cuts(base).filter(_ > 10 + 8)
    val ce = cuts(edited).filter(_ > 13 + 8)
    assert(cb.nonEmpty)
    assert(ce === cb.map(_ + 3))
  }
}
