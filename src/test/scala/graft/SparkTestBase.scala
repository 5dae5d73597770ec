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

  /** Count Spark jobs submitted by `body`, scoped to a fresh job group so
    * parallel suites sharing the session don't pollute the count (AQE
    * stage-materialization threads inherit the submitter's local
    * properties, so broadcast/shuffle stage jobs carry the group too).
    * JobStart posts at submission and actions block until their jobs
    * finish, but the listener bus drains asynchronously — polls until the
    * counter is stable. The job-count gates (GraphSpec loop linearity,
    * RuntimeSpec micro-batch budget) build on this.
    */
  def countJobs(body: => Unit): Int = {
    val group = s"graft-jobgate-${java.util.UUID.randomUUID().toString.take(8)}"
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        if (js.properties != null &&
          group == js.properties.getProperty("spark.jobGroup.id"))
          n.incrementAndGet()
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    spark.sparkContext.setJobGroup(group, "job-count gate")
    try {
      body
      var last = -1
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 5000) {
        Thread.sleep(100); waited += 100
        val cur = n.get()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(listener)
    }
    val jobs = n.get()
    assert(jobs > 0, "job-group scoping captured no jobs — gate would be vacuous")
    jobs
  }
}
