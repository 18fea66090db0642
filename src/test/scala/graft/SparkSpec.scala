package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (getOrCreate reuses the JVM-wide
  * session; Test/fork gives the suite run one JVM).
  */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local("4", "4")
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  val sf: String = "/root/testdata/sf0.001"
}
