package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke-driver: replays the driver's t1 entry check plus a few
  * public-API probes. Run: sbt "runMain graft.Smoke"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("ENTRY_ROWS=" + SparkEntry.entry(spark).count())
    println("BAD_SPEC=" + graft.spec.StreamSpec.parse("""{"namespace":"x"}""").left.map(_.msg))
    println("BAD_VERSION=" + graft.spec.StreamSpec.parse(
      """{"namespace":"x","streamIdSuffix":"y","version":0,"source":{"type":"kafka"},"sink":{"type":"void"}}""").left.map(_.msg))
    println("UNKNOWN_PROP=" + graft.spec.StreamSpec.parse(
      """{"namespace":"x","streamIdSuffix":"y","version":1,"bogus":1,"source":{"type":"kafka"},"sink":{"type":"void"}}""").left.map(_.msg))
    println("NO_GROUPS=" + graft.spec.StreamSpec.parse(
      """{"namespace":"x","streamIdSuffix":"y","version":1,"source":{"type":"kafka"},"transform":{"regexp":{"expression":"abc"}},"sink":{"type":"void"}}""").left.map(_.msg))
    val df = SparkEntry.queries("session_routing")(spark, "/root/testdata/sf0.001")
    println("SCHEMA=" + df.schema.simpleString)
    spark.stop()
  }
}
