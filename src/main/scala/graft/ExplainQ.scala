package graft

/** Plan-inspection utility: prints the formatted physical plan (and
  * AQE-final plan after execution) of one registered query, e.g.
  *   sbt "runMain graft.ExplainQ q06_join_agg_topk /root/testdata/sf0.01"
  * Used to audit pushdown (PushedFilters), broadcast choices, shuffle
  * counts, and WholeStageCodegen coverage per operator.
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q06_join_agg_topk")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    println("=== AQE final plan ===")
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
