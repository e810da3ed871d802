package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_norm_text (native one-pass dedup normalization): row-equal to
  * the regex pipeline it replaced —
  * `trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ''),
  * ' +', ' '))` — on the fixture corpus and the Unicode edge cases
  * where Java special-casing could diverge, plus null and
  * codegen/interpreted agreement.
  */
class NormTextSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = GraftSession.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val regexForm =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ''), " +
      "' +', ' '))"

  test("equals the regex pipeline on the fixture corpus") {
    val docs = Fixtures.table(spark, "/root/testdata/sf0.001", "documents")
    val mismatches = docs.select(
      expr("graft_norm_text(text)").as("native"),
      expr(regexForm).as("rx"))
      .where(col("native") =!= col("rx"))
    assert(mismatches.count() === 0L)
    assert(docs.count() > 0)
  }

  test("edge strings: casing, strip, collapse, trim, Unicode special " +
    "cases") {
    import spark.implicits._
    val rows = Seq(
      "",
      "   ",
      "  Hello,   WORLD!  42  ",
      "a\tb",                    // tab is NOT in [a-z0-9 ]: dropped, no space
      "a.b,c",                   // punctuation dropped without spacing
      "\u0130stanbul",         // Turkish I-with-dot: lowercase keeps 'i'
      "STRA\u00dfE",           // sharp-s dropped (not in a-z)
      "STRA\u1e9eE",           // capital sharp-s lowers to \u00df, dropped
      "caf\u00e9 au lait",     // accented e dropped
      "Kelvin"              // Kelvin sign lowers to 'k'
    ).toDF("text")
    val got = rows.select(expr("graft_norm_text(text)")).collect()
      .map(_.getString(0)).toSeq
    val want = rows.select(expr(regexForm)).collect()
      .map(_.getString(0)).toSeq
    assert(got === want)
    assert(got(2) === "hello world 42")
    assert(got(3) === "ab")
    assert(got(9) === "kelvin")
  }

  test("null yields null; codegen and interpreted agree; q17's key " +
    "equals the old formulation corpus-wide") {
    import spark.implicits._
    val df = Seq(Some("A  B"), None).toDF("text")
    val on = df.select(expr("graft_norm_text(text)")).collect()
    assert(on(0).getString(0) === "a b")
    assert(on(1).isNullAt(0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val off = try df.select(expr("graft_norm_text(text)")).collect()
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(on.map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
      === off.map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq)

    val docs = Fixtures.table(spark, "/root/testdata/sf0.001", "documents")
    val keysMismatch = docs.select(
      md5(expr("graft_norm_text(text)")).as("k1"),
      md5(expr(regexForm)).as("k2"))
      .where(col("k1") =!= col("k2"))
    assert(keysMismatch.count() === 0L)
  }
}
