package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** One-off scaling probe (not part of the library surface): runs the
  * named queries against two fixture dirs and prints each join node's
  * output-row metric, so LSH/IVF candidate growth can be read directly
  * (candidates ∝ collisions, not pairs²).
  *   sbt "runMain graft.CandProbe /root/testdata/sf0.1 /tmp/sf1 q23_knn_lsh,q34_knn_ivf"
  */
object CandProbe {
  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => p.children
    }
    p +: kids.flatMap(walk)
  }
  def main(args: Array[String]): Unit = {
    val dirs = Seq(args(0), args(1))
    val names = args(2).split(',').toSeq
    val spark = GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names; d <- dirs) {
      val df = SparkEntry.queries(n)(spark, d)
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count(): Unit
      val sec = (System.nanoTime() - t0) / 1e9
      val joins = walk(df.queryExecution.executedPlan)
        .filter(p => p.nodeName.contains("Join"))
        .map(p => s"${p.nodeName}=${p.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)}")
      println(f"$n%-28s $d%-24s ${sec}%6.2fs  ${joins.mkString(" ")}")
    }
    spark.stop()
  }
}
