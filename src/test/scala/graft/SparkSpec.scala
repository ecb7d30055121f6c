package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for ScalaTest specs (smaller core count than
  * the bench config — specs run on fixture-sized data).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  val refBase = "/root/reference/UserBehaviorAnalysis"
}

object SparkSpec {
  // One session per JVM — sbt forks a single test JVM; per-suite sessions
  // would pay ~5s startup each.
  lazy val session: SparkSession = {
    val s = GraftSession.builder("graft-test", "4").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
