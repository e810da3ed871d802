package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_token_spans (native one-pass distinct n-token spans): equal
  * to the HOF formulation it replaced in q151 — including Spark's
  * split(' ') empty-token semantics on multi-space and trailing-space
  * edges — and the <n-token guard (empty array where the old `where`
  * dropped the row).
  */
class TokenSpansSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = GraftSession.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def hofSpans(n: Int): String =
    s"CASE WHEN size(split(text, ' ')) >= $n THEN " +
      s"array_distinct(transform(" +
      s"sequence(1, size(split(text, ' ')) - ${n - 1}), " +
      s"i -> array_join(slice(split(text, ' '), i, $n), ' '))) " +
      "ELSE array() END"

  test("equals the HOF formulation (as sets) on the fixture corpus, n=8") {
    val docs = Fixtures.table(spark, "/root/testdata/sf0.001", "documents")
    val mismatches = docs.select(
      expr("array_sort(graft_token_spans(text, 8))").as("native"),
      expr(s"array_sort(${hofSpans(8)})").as("hof"))
      .where(expr("native != hof"))
    assert(mismatches.count() === 0L)
    // the projection is non-trivially populated at this SF
    assert(docs.where(expr("size(graft_token_spans(text, 8)) > 0"))
      .count() > 0)
  }

  test("edge strings: short docs, multi-space empty tokens, trailing " +
    "space, duplicate spans deduped") {
    import spark.implicits._
    val rows = Seq(
      "",                      // 1 empty token -> below guard
      "a b c",                 // 3 tokens < 8 -> empty
      "a b c d e f g h",       // exactly 8 -> one span
      "a  b c d e f g h",      // double space: empty token counts
      "a b c d e f g h ",      // trailing space: trailing empty token
      "x x x x x x x x x x"    // sliding dup spans collapse to one
    ).toDF("text")
    for (n <- Seq(2, 8)) {
      val got = rows.select(
        expr(s"array_sort(graft_token_spans(text, $n))")).collect()
        .map(_.getSeq[String](0).toList).toSeq
      val want = rows.select(expr(s"array_sort(${hofSpans(n)})")).collect()
        .map(_.getSeq[String](0).toList).toSeq
      assert(got === want, s"n=$n")
    }
    val eight = rows.select(expr("graft_token_spans(text, 8)")).collect()
      .map(_.getSeq[String](0).toList)
    assert(eight(0).isEmpty && eight(1).isEmpty)
    assert(eight(2) === List("a b c d e f g h"))
    assert(eight(5) === List("x x x x x x x x"))
  }

  test("null yields null; codegen and interpreted agree") {
    import spark.implicits._
    val df = Seq(Some("a b c d e f g h i"), None).toDF("text")
    val on = df.select(expr("graft_token_spans(text, 8)")).collect()
    assert(on(1).isNullAt(0))
    assert(on(0).getSeq[String](0).length === 2)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val off = try df.select(expr("graft_token_spans(text, 8)")).collect()
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(on(0).getSeq[String](0) === off(0).getSeq[String](0))
  }

  test("n < 1 is an analysis error, not a runtime crash") {
    import spark.implicits._
    val df = Seq("a b c").toDF("text")
    for (n <- Seq(0, -1)) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        df.select(expr(s"graft_token_spans(text, $n)")).collect()
      }
      assert(e.getMessage.contains("n must be >= 1"), e.getMessage)
    }
    // n = 1 stays valid: the per-token distinct projection
    val one = df.select(expr("graft_token_spans(text, 1)")).collect()
    assert(one(0).getSeq[String](0) === Seq("a", "b", "c"))
  }
}
