package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import graft.sources.{Sinks, Tables}

/** Partitioned layout must prune: a filter on the partition column reads
  * only its directory.
  */
class SinksSpec extends SparkSpec {

  test("partitionBy(year) layout prunes partitions on read") {
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    val orders = Tables.orders(spark, sfDir)
    Sinks.writePartitionedByYear(orders, "o_orderdate", s"$out/orders")

    val read = spark.read.parquet(s"$out/orders").filter(col("year") === 1995)
    val plan = read.queryExecution.explainString(FormattedMode)
    assert(plan.contains("PartitionFilters") && plan.contains("(year"),
      s"partition filter missing:\n$plan")

    val expected = orders.filter(year(col("o_orderdate")) === 1995).count()
    assert(read.count() === expected)
    // layout on disk is hive-style year=N directories
    val dirs = new java.io.File(s"$out/orders").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("year=1995")), s"dirs: $dirs")
  }
}
