package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for all suites (SURVEY §5.2). */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.warehouse.dir", "/tmp/graft-test-warehouse")
    .appName("graft-test")
    .getOrCreate()

  val Sf: String = "/root/testdata/sf0.001"
}
