package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test JVM (sbt forks one JVM for
  * the Test config; 4 cores / 4 shuffle partitions keeps suites fast).
  */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(cores = 4, appName = "graft-test")
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  val sfDir = "/root/testdata/sf0.001"

  def fixturePath: String =
    getClass.getResource("/user_activity_fixture.json").getPath

  /** Fixture as a batch DataFrame with eventTime (12 valid events; the
    * 13th record is missing `activity` and must be skipped at ingest).
    */
  def fixture: DataFrame = sources.Tables.userActivityJson(spark, fixturePath)
}
