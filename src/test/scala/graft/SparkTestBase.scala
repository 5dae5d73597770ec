package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test JVM. */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // driver-generated parquet stores naive timestamps: read them as
      // TIMESTAMP (UTC session) rather than TIMESTAMP_NTZ so timestamp
      // functions and the DuckDB oracle see identical values
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // per-run temp dir: a fixed path left non-empty by a crashed run
      // would make every later CTAS saveAsTable fail, and concurrent
      // checkouts would stomp each other's tables
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-test-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
