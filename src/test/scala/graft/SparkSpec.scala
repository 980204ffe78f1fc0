package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared ScalaTest base: one local SparkSession per suite (SURVEY §5.2 M0). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
  val sf01 = "/root/testdata/sf0.1"
}

object SparkSpec {
  /** Shared across suites — sbt forks one JVM for all tests; building one
    * session avoids 10s of startup per suite. */
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Closure row-limit raised session-wide to a finite ceiling
      // (input-proportional by design; Graft.CteRecursionRowCeiling).
      .config("spark.sql.cteRecursionRowLimit", Graft.CteRecursionRowCeiling)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
