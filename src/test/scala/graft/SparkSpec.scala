package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One SparkSession shared by every suite (sbt runs suites in one forked
  * JVM; spinning a session per suite would dominate test time). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // every stateful streaming test runs against the store the library
      // ships by default (PipelineConfig.stateStoreProvider = RocksDB)
      .config("spark.sql.streaming.stateStore.providerClass",
        graft.streaming.CdcPipeline.RocksDBProvider)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  /** Smallest driver fixture — smoke scale. */
  val sfTiny = "/root/testdata/sf0.001"
  /** Correctness scale (what the driver's DuckDB gate runs at). */
  val sfSmall = "/root/testdata/sf0.01"
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sfTiny: String = SparkTestSession.sfTiny
  val sfSmall: String = SparkTestSession.sfSmall
}
