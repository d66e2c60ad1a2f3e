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

  test("backfill overwrites only its partitions; siblings keep their files") {
    import spark.implicits._
    val out = s"${tempDir("graft_backfill").toPath}/t"
    def day(d: String, vs: Seq[Long]) = vs.map(v => (d, v)).toDF("d", "v")
    Sinks.backfillPartitions(
      day("2024-01-01", Seq(1, 2)) union day("2024-01-02", Seq(3)), "d", out)
    def files(d: String) = new java.io.File(s"$out/d=$d").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val day1Before = files("2024-01-01")
    // re-run day 2 with corrected data: day 1's files must be BYTE-LEVEL
    // untouched (same names), day 2 replaced, total rows consistent
    Sinks.backfillPartitions(day("2024-01-02", Seq(30, 31)), "d", out)
    assert(files("2024-01-01") === day1Before,
      "sibling partition must keep its exact files across a backfill")
    // the read-side partition column type-infers to DATE; compare as text
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.get(1).toString, r.getLong(0))).toSet
    assert(rows === Set(("2024-01-01", 1L), ("2024-01-01", 2L),
      ("2024-01-02", 30L), ("2024-01-02", 31L)),
      "day 2 must be replaced, day 1 intact")
  }

  test("foreachBatch replay contract: re-writing a batch_id partition leaves one copy") {
    import spark.implicits._
    // the streaming exactly-once recipe (StreamBench span-audit sink):
    // foreachBatch lands each micro-batch in its own batch_id partition
    // via the dynamic-overwrite writer, so a batch replayed after a kill
    // overwrites itself — where mode("append") would double-count
    val out = s"${tempDir("graft_replay_sink").toPath}/t"
    def batch(id: Long) = Seq.tabulate(5)(i => (id, i.toLong))
      .toDF("batch_id", "v")
    Sinks.backfillPartitions(batch(6), "batch_id", out)
    Sinks.backfillPartitions(batch(7), "batch_id", out)
    Sinks.backfillPartitions(batch(7), "batch_id", out) // replay after kill
    assert(spark.read.parquet(out).count() === 10,
      "a replayed batch must overwrite its own partition, not append")
  }
}
