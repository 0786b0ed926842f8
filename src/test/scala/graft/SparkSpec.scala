package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites — getOrCreate dedupes across suites
  * so the JVM spins up exactly one SparkContext.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  lazy val sf0001 = "/root/testdata/sf0.001"
}
