package graft

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.FreqSketch

/** FreqSketch (native Misra–Gries TypedImperativeAggregate): the three
  * theorem-level guarantees q509 builds on, checked over random streams
  * and random merge trees, plus the Spark-integration surface (partial
  * aggregation plan shape, serde round-trip, null handling).
  */
class FreqSketchSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = GraftSession.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def mkAgg(k: Int): FreqSketch =
    FreqSketch(BoundReference(0, StringType, nullable = true),
      Literal(k, IntegerType))

  private def row(s: String): InternalRow =
    InternalRow(if (s == null) null else UTF8String.fromString(s))

  /** Zipf-ish random stream over a small alphabet. */
  private def stream(rnd: Random, n: Int, alpha: Int): Seq[String] =
    Seq.fill(n) {
      // squared uniform → heavy head
      val u = rnd.nextDouble()
      s"k${(u * u * alpha).toInt}"
    }

  /** Feed a stream through a random merge tree: split into 1..8 chunks,
    * update each into its own buffer, fold-merge in shuffled order.
    */
  private def sketchOf(agg: FreqSketch, xs: Seq[String], rnd: Random)
    : mutable.HashMap[String, Long] = {
    val chunks = xs.grouped(math.max(1, xs.size / (1 + rnd.nextInt(8))))
      .toSeq
    val bufs = chunks.map { c =>
      val b = agg.createAggregationBuffer()
      c.foreach(x => agg.update(b, row(x)))
      // exercise serde on every partial, like the shuffle boundary does
      agg.deserialize(agg.serialize(b))
    }
    rnd.shuffle(bufs).reduceLeft(agg.merge)
  }

  test("MG guarantees: underestimate, bounded deficit, heavy-hitter presence") {
    val rnd = new Random(42)
    for (trial <- 1 to 20) {
      val k = 1 + rnd.nextInt(16)
      val n = 200 + rnd.nextInt(2000)
      val xs = stream(rnd, n, 40)
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val agg = mkAgg(k)
      val sk = sketchOf(agg, xs, rnd)
      assert(sk.size <= k, s"trial $trial: ${sk.size} counters > k=$k")
      val bound = n.toDouble / (k + 1)
      sk.foreach { case (key, est) =>
        val t = truth.getOrElse(key, 0L)
        assert(est <= t, s"trial $trial: est($key)=$est > true=$t")
        assert(t - est <= bound,
          s"trial $trial: deficit ${t - est} > n/(k+1)=$bound")
      }
      truth.foreach { case (key, t) =>
        if (t > bound) {
          assert(sk.contains(key),
            s"trial $trial: heavy key $key (true=$t > $bound) missing")
        }
      }
    }
  }

  test("exact when distinct keys fit in k counters") {
    val rnd = new Random(7)
    val xs = stream(rnd, 500, 10) // ≤10 distinct
    val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val agg = mkAgg(32)
    val sk = sketchOf(agg, xs, rnd)
    assert(sk.toMap === truth)
  }

  test("nulls are ignored; empty input evals to empty array") {
    val agg = mkAgg(4)
    val b = agg.createAggregationBuffer()
    agg.update(b, row(null))
    agg.update(b, row("a"))
    agg.update(b, row(null))
    assert(b === mutable.HashMap("a" -> 1L))
    val empty = agg.eval(agg.createAggregationBuffer())
    assert(empty.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .numElements() === 0)
  }

  test("serde round-trip preserves the buffer exactly") {
    val agg = mkAgg(8)
    val b = agg.createAggregationBuffer()
    Seq("x", "y", "x", "z", "x", "déjà", "", "y")
      .foreach(s => agg.update(b, row(s)))
    assert(agg.deserialize(agg.serialize(b)) === b)
  }

  test("SQL surface: partial aggregation via ObjectHashAggregate, sorted output") {
    import spark.implicits._
    val df = Seq("a", "b", "a", "c", "a", "b").toDF("t")
      .repartition(3)
      .agg(expr("graft_freq_sketch(t, 16)").as("sk"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate partial/final split, got:\n$plan")
    assert(plan.contains("partial_graft_freq_sketch"),
      s"expected a map-side partial, got:\n$plan")
    val out = df.selectExpr("inline(sk)").as[(String, Long)].collect().toSeq
    assert(out === Seq(("a", 3L), ("b", 2L), ("c", 1L)))
  }

  test("k must be a positive constant") {
    import spark.implicits._
    val err = intercept[Exception] {
      Seq("a").toDF("t").agg(expr("graft_freq_sketch(t, 0)")).collect()
    }
    assert(err.getMessage.contains("k must be >= 1"))
  }
}
