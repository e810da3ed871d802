package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed to the driver's correctness gate:
  * a Spark query plus (when SQL-expressible) the equivalent DuckDB oracle
  * SQL over the same parquet tables. Column names must match exactly —
  * the driver sorts columns by name before hashing values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {

  def run(spark: SparkSession, sfDir: String): DataFrame = fn(spark, sfDir)
}

object QueryDef {
  /** Exactness convention used across the library: double aggregates are
    * computed by casting each term to DECIMAL (exact, order-independent
    * sum) and casting the final sum back to double, so Spark and DuckDB
    * produce bit-identical results regardless of execution order.
    */
  val doc: String = "see SURVEY.md §5.3"
}
