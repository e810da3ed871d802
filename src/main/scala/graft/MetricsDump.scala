package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Per-operator runtime-metric dump for one registered query: executes
  * via the noop sink, then walks the AQE-final plan (descending into
  * query stages, reused exchanges and cached-relation build plans)
  * printing each node's key metrics. Optimization-round diagnosis tool.
  *
  *   sbt "runMain graft.MetricsDump q490_ingest_index_update /root/testdata/sf0.1"
  */
object MetricsDump {
  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => finalPlan(a.executedPlan)
    case q: QueryStageExec => finalPlan(q.plan)
    case r: ReusedExchangeExec => finalPlan(r.child)
    case other => other
  }

  private def walk(p: SparkPlan, depth: Int,
      seen: java.util.IdentityHashMap[SparkPlan, Boolean]): Unit = {
    val n = finalPlan(p)
    if (seen.containsKey(n)) {
      println("  " * depth + s"${n.nodeName} [reused]")
      return
    }
    seen.put(n, true): Unit
    val interesting = Seq("numOutputRows", "time in aggregation build",
      "aggregate time", "time to build hash map", "shuffle bytes written",
      "sort time", "time to broadcast", "scan time", "duration")
    val ms = n.metrics.toSeq
      .filter { case (k, m) =>
        m.value > 0 && interesting.exists(t => k.contains(t.split(' ').head)
          || m.name.getOrElse("").contains(t)) }
      .sortBy(_._1)
      .map { case (k, m) => s"$k=${m.value}" }.mkString(" ")
    println("  " * depth + s"${n.nodeName} $ms")
    n.children.foreach(walk(_, depth + 1, seen))
    n match {
      case im: InMemoryTableScanExec =>
        println("  " * (depth + 1) + "[cached build plan]")
        walk(im.relation.cachedPlan, depth + 2, seen)
      case _ => ()
    }
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    // second run so shared caches are warm and metrics reflect steady state
    val df2 = SparkEntry.queries(name)(spark, dir)
    df2.write.format("noop").mode("overwrite").save()
    walk(df2.queryExecution.executedPlan, 0,
      new java.util.IdentityHashMap[SparkPlan, Boolean]())
    spark.stop()
  }
}
