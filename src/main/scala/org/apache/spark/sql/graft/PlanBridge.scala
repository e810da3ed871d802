package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** The one `private[sql]` doorway this library uses: wrapping a custom
  * [[LogicalPlan]] (graft.plans.AsOfJoin) into a user-facing DataFrame.
  *
  * Spark exposes SparkSessionExtensions for injecting analyzer rules,
  * optimizer rules, and planner strategies — but deliberately keeps
  * `Dataset.ofRows` private, so a library adding a whole new OPERATOR
  * (not just an expression) needs a bridge object inside the
  * `org.apache.spark.sql` package tree. This is the established
  * open-source pattern (Sedona's `org.apache.spark.sql.sedona_sql`,
  * Delta's `org.apache.spark.sql.delta`, ...). Nothing here touches
  * internals beyond the constructor call; everything else in the
  * library goes through public API.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
