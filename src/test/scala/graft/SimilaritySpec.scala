package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CosineSimilarity expression + ANN query invariants.
  * Uses sf0.001 fixtures (500 embeddings, 64-dim float).
  */
class SimilaritySpec extends AnyFunSuite {

  private lazy val spark = {
    val s = GraftSession.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  private val sf = "/root/testdata/sf0.001"

  test("graft_cosine matches the portable sequential-fold expression " +
    "bit-exactly (codegen path)") {
    val e = Fixtures.table(spark, sf, "embeddings").limit(50)
    val a = e.select(col("vec_id").as("va"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    val both = a.join(b, col("va") < col("vb"))
      .select(expr("graft_cosine(ea, eb)").as("native"),
        expr(graft.ops.Dedup.cosSpark).as("fold"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_cosine double-array and mixed overloads match the " +
    "sequential fold bit-exactly") {
    val e = Fixtures.table(spark, sf, "embeddings").limit(50)
      .select(col("vec_id"),
        col("embedding"),
        expr("transform(embedding, x -> cast(x AS DOUBLE))").as("d"))
    val a = e.select(col("vec_id").as("va"), col("embedding").as("fa"),
      col("d").as("ea"))
    val b = e.select(col("vec_id").as("vb"), col("d").as("eb"))
    val both = a.join(b, col("va") < col("vb"))
      .select(expr("graft_cosine(ea, eb)").as("dd"),
        expr("graft_cosine(fa, eb)").as("fd"),
        expr(graft.ops.Dedup.cosSpark).as("fold"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)))
    }
  }

  test("graft_cosine interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val x = Array(0.5f, -1.25f, 3.0f)
    val y = Array(2.0f, 0.75f, -0.5f)
    val lit = (v: Array[Float]) =>
      Literal(ArrayData.toArrayData(v), ArrayType(FloatType, containsNull = false))
    val got = graft.expressions.CosineSimilarity(lit(x), lit(y)).eval(null)
      .asInstanceOf[Double]
    val dot = x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
    val na = x.map(v => v.toDouble * v.toDouble).sum
    val nb = y.map(v => v.toDouble * v.toDouble).sum
    assert(got === dot / math.sqrt(na * nb))
  }

  test("graft_cosine is null-safe") {
    val r = spark.sql(
      "SELECT graft_cosine(CAST(NULL AS ARRAY<FLOAT>), array(1.0F))")
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("self-similarity is 1.0 for every fixture vector") {
    val e = Fixtures.table(spark, sf, "embeddings")
    val bad = e.select(expr("graft_cosine(embedding, embedding)").as("c"))
      .where(abs(col("c") - 1.0) > 1e-12).count()
    assert(bad === 0L)
  }

  test("SelfCosineRule rewrites graft_cosine(x, x) to the single-pass " +
    "form, preserving null and zero-vector NaN semantics") {
    val e = Fixtures.table(spark, sf, "embeddings")
    val df = e.select(expr("graft_cosine(embedding, embedding)").as("c"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_self_cosine"), optimized)
    assert(!optimized.contains("graft_cosine("), optimized)
    // null propagates
    val r = spark.sql(
      "SELECT graft_cosine(v, v) FROM (SELECT CAST(NULL AS ARRAY<FLOAT>) v)")
      .collect()(0)
    assert(r.isNullAt(0))
    // zero vector → NaN, same as the unrewritten expression
    val z = spark.sql(
      "SELECT graft_cosine(v, v) FROM (SELECT array(0.0F, 0.0F) v)")
      .collect()(0).getDouble(0)
    assert(z.isNaN)
  }

  test("q22 brute-force top-k: each query has exactly k ranked neighbors") {
    val df = SparkEntry.queries("q22_knn_bruteforce")(spark, sf)
    val rows = df.collect()
    assert(rows.length === 8 * 5)
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted === (1 to 5).toArray)
      // ranks ordered by non-increasing cosine
      val cos = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (hi, lo) => hi >= lo })
    }
  }

  test("q30 typed top-k matches q22 row-for-row and partial-aggregates " +
    "before the shuffle") {
    val agg = SparkEntry.queries("q30_topk_aggregator")(spark, sf)
    val win = SparkEntry.queries("q22_knn_bruteforce")(spark, sf)
    assert(agg.collect().map(_.toSeq).toSeq ===
      win.collect().map(_.toSeq).toSeq)
    val plan = agg.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("partial_topkagg"),
      "expected a map-side partial aggregation of the TopKAgg")
  }

  test("q34 IVF probes exactly one cell per query and scores match " +
    "brute force on overlapping neighbors") {
    val ivf = SparkEntry.queries("q34_knn_ivf")(spark, sf).collect()
    assert(ivf.nonEmpty)
    val cellsPerQuery = ivf.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.get(1)).distinct.length)
    assert(cellsPerQuery.values.forall(_ === 1))
    val bf = SparkEntry.queries("q22_knn_bruteforce")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    ivf.foreach { r =>
      bf.get((r.getLong(0), r.getLong(3)))
        .foreach(c => assert(c === r.getDouble(4)))
    }
  }

  test("q23 LSH candidates are a subset of brute-force scoring " +
    "(same cosine values where ids overlap)") {
    val bf = SparkEntry.queries("q22_knn_bruteforce")(spark, sf)
      .select(col("query_id"), col("neighbor_id"), col("cosine")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ann = SparkEntry.queries("q23_knn_lsh")(spark, sf).collect()
    assert(ann.nonEmpty)
    ann.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      bf.get(key).foreach(c => assert(c === r.getDouble(3)))
    }
  }
}
