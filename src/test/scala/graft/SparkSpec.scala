package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, getOrCreate reuses). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("8").getOrCreate()
  lazy val sf: String = "/root/testdata/sf0.001"

  def run(name: String) = {
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sf)
  }
}
