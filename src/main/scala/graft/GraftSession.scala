package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory for the graft engine.
  *
  * Local mode is a stand-in for a real cluster: `cores` executor threads in
  * one JVM. All scale-sensitive knobs (shuffle partitions, AQE, broadcast
  * threshold) are set here once so every entry point (tests, Verify, Bench)
  * runs the same engine configuration.
  */
object GraftSession {

  /** Shared config applied to any builder — also used by driver-run mains. */
  def configure(b: SparkSession.Builder, cores: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.parquet.filterPushdown", "true")
      // driver testdata stores events.ts as TIMESTAMP(NANOS); Spark 4 only
      // reads it as a long — Tables.events converts (floor ns→us, matching
      // DuckDB's truncation)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", (128L << 20).toString)
      // recentProgress is the source of batch counts (IngestLoop's
      // CycleStats.batches, StreamBench's paced admission sums); the
      // default 100-entry ring silently undercounts long drains
      .config("spark.sql.streaming.numRecentProgressUpdates", "4000")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")

  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val s = configure(
      SparkSession.builder().master(s"local[$cores]").appName(appName),
      cores
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
