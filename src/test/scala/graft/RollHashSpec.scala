package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_roll_hash (native codegen'd rolling fingerprint): row-equal
  * to the HOF formulation it replaced in q16 — the contract that makes
  * the swap drop-in — across the fixture corpus and edge strings
  * (empty, single char, line terminators, non-ASCII incl. a surrogate
  * pair), plus the null path and the codegen/interpreted agreement.
  */
class RollHashSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = GraftSession.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val hofForm =
    "aggregate(regexp_extract_all(text, '.', 0), 0L, " +
      "(acc, c) -> (acc * 31 + ascii(c)) % 1000000007)"

  test("equals the regexp+aggregate HOF formulation on the fixture corpus") {
    val docs = Fixtures.table(spark, "/root/testdata/sf0.001", "documents")
    val mismatches = docs.select(
      expr("graft_roll_hash(text)").as("native"),
      expr(hofForm).as("hof"))
      .where(col("native") =!= col("hof"))
    assert(mismatches.count() === 0L)
    assert(docs.count() > 0)
  }

  test("edge strings: empty, single char, line terminators skipped, " +
    "unicode incl. surrogate pair") {
    import spark.implicits._
    val rows = Seq(
      "",                       // empty -> 0
      "a",                      // single char
      "a\nb",                   // LF skipped: same as "ab"
      "a\rb",                   // CR skipped
      "a\u0085b",               // NEL skipped
      "a\u2028b",               // LS skipped
      "a\u2029b",               // PS skipped
      "ab",
      "caf\u00e9",              // non-ASCII BMP
      "a" + new String(Character.toChars(0x1F600)) + "b" // surrogate pair
    ).toDF("text")
    val got = rows.select(expr("graft_roll_hash(text)")).collect()
      .map(_.getLong(0)).toSeq
    val want = rows.select(expr(hofForm)).collect()
      .map(_.getLong(0)).toSeq
    assert(got === want)
    assert(got.head === 0L)
    // all five line-terminator forms hash like plain "ab"
    val ab = got(7)
    assert(got.slice(2, 7).forall(_ == ab))
  }

  test("null text yields null; codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq(Some("abc"), None).toDF("text")
    val on = df.select(expr("graft_roll_hash(text)")).collect()
    assert(on(1).isNullAt(0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val off = try df.select(expr("graft_roll_hash(text)")).collect()
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(on.map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
      === off.map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq)
  }
}
