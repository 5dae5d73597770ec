package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sinks.{KeyedTableSink, SinkCompiler}

/** G6 table-creation semantics: time partitioning, clustering, and the
  * partition-filter requirement, mapped to their Spark-columnar analogs
  * (reference spec shape: kafkasrc-bigquerysink-fooevents.json
  * "tableCreation").
  */
class SinkSpec extends AnyFunSuite {
  import SparkTestBase.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-sink").toString

  private def rows = Seq(
    ("k1", "c2", java.sql.Timestamp.valueOf("2024-06-01 10:00:00")),
    ("k2", "c1", java.sql.Timestamp.valueOf("2024-06-01 23:00:00")),
    ("k3", "c3", java.sql.Timestamp.valueOf("2024-06-03 05:00:00"))
  ).toDF("key", "customerId", "dateIngested")

  test("G6 parse: tableCreation yields partition type/field, clustering, filter requirement") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val cfg = mapper.readTree(
      """{"tables": [{"name": "t", "tableCreation": {
        |  "clustering": ["customerId"],
        |  "timePartitioning": {"type": "DAY", "field": "dateIngested"},
        |  "requirePartitionFilter": true}}]}""".stripMargin)
    val t = SinkCompiler.parseTables(cfg).head
    assert(t.partitionField == "dateIngested" && t.partitionType == "DAY")
    assert(t.clustering == Seq("customerId") && t.requirePartitionFilter)
  }

  test("G6 write: day partitions become directories; reads prune to the range") {
    val sink = new KeyedTableSink(tmp(), partitionField = "dateIngested",
      partitionType = "DAY", clustering = Seq("customerId"))
    sink.write(rows)
    val dirs = new java.io.File(sink.path).listFiles().map(_.getName).filter(_.startsWith("__pdate="))
    assert(dirs.length == 2, s"one directory per day expected, got ${dirs.toSeq}")
    val pruned = sink.timeRange(spark,
      java.sql.Timestamp.valueOf("2024-06-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-06-02 00:00:00"))
    assert(pruned.select("key").as[String].collect().sorted.toSeq == Seq("k1", "k2"))
    // pruning happens at the partition level: the physical scan carries the
    // __pdate partition filters
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__pdate"),
      s"partition pruning expected in scan:\n${plan.take(1500)}")
  }

  test("G6 clustering: rows sort by clustering columns within written files") {
    val sink = new KeyedTableSink(tmp(), clustering = Seq("customerId"))
    sink.write(rows.repartition(1))
    val file = new java.io.File(sink.path).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val inFile = spark.read.parquet(file.getAbsolutePath)
      .select("customerId").as[String].collect().toSeq
    assert(inFile == inFile.sorted, s"file content must be clustered: $inFile")
  }

  test("G6 requirePartitionFilter: full scans refused, ranged + keyed reads allowed") {
    val sink = new KeyedTableSink(tmp(), partitionField = "dateIngested",
      requirePartitionFilter = true)
    sink.write(rows)
    intercept[IllegalArgumentException] { sink.all(spark) }
    assert(sink.timeRange(spark,
      java.sql.Timestamp.valueOf("2024-06-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-06-04 00:00:00")).count() == 3)
    assert(sink.keyValue(spark, "k1").count() == 1, "row-key lookups stay allowed")
  }
}
