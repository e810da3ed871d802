package graft

/** Batch plan-capture utility for optimization rounds: dumps the
  * formatted physical plan (pre-execution) and the AQE-final executed
  * plan of a comma-separated list of registered queries to files.
  *
  *   sbt "runMain graft.ExplainBatch q62_profile,q195_bootstrap_ci \
  *     /root/testdata/sf0.01 plans/r15 before"
  *
  * writes plans/r15/<query>_before.txt for each query. Execution uses
  * the noop sink (guide §1.4) so the AQE-final plan reflects the full
  * computation without a collect.
  */
object ExplainBatch {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 2) args(2) else "plans/r15"
    val suffix = if (args.length > 3) args(3) else "before"
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val pre = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      spark.sparkContext.setJobDescription(s"explain: $name")
      df.write.format("noop").mode("overwrite").save()
      val fin = df.queryExecution.executedPlan.toString
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
        s"== $name ($suffix, sf dir $dir) ==\n\n" +
          "---- formatted plan (pre-execution) ----\n" + pre +
          "\n---- AQE-final executed plan ----\n" + fin + "\n")
      println(s"[explain-batch] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
