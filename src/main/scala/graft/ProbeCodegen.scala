package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Ad-hoc probe: does RangeJoinExec actually participate in
  * whole-stage codegen after AQE finalizes the stages? Prints the
  * post-execution plan and greps it for the codegen id prefix.
  */
object ProbeCodegen {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries("q26_range_join")(spark, "/root/testdata/sf0.001")
    val n = df.collect().length
    val ep = df.queryExecution.executedPlan
    val finalPlan = ep match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val s = finalPlan.toString
    println("=== FINAL EXECUTED PLAN (rows=" + n + ") ===")
    println(s)
    val hit = s.linesIterator.exists(l =>
      l.contains("RangeJoin") && l.contains("*("))
    println("RANGEJOIN_CODEGEN=" + hit)
    spark.stop()
  }
}
