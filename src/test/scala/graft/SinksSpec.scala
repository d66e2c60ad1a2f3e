package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import graft.sources.{Sinks, Tables}

/** Partitioned layout must prune: a filter on the partition column reads
  * only its directory.
  */
class SinksSpec extends SparkSpec {

  test("partitionBy(year) layout prunes partitions on read") {
    val out = tempDir("graft_part").toPath.toString
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

    // executed-scan proof, beyond the plan text: run THIS plan and read
    // its numFiles metric — the scan may open only the pruned year's
    // files, out of a multi-year layout
    val scan = read.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(read.queryExecution.toRdd.count() === expected)
    val filesInYear = new java.io.File(s"$out/orders/year=1995").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(dirs.count(_.startsWith("year=")) > 1, "layout must span years")
    assert(scan.metrics("numFiles").value === filesInYear.toLong,
      s"scan opened ${scan.metrics("numFiles").value} files, " +
        s"expected only year=1995's $filesInYear")
  }
}
