package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming-throughput benchmark: replays the `events` table through
  * Structured Streaming (file source, watermarked tumbling aggregation —
  * the reference's core workload shape) and reports end-to-end rows/sec.
  * The reference's replay source emits ~10 events/s by design
  * (FlinkWindowLearning.scala:40); this measures what the same logical
  * pipeline sustains under Spark's micro-batch engine.
  *
  * Prints ONE JSON line: {"metric":"stream_rows_per_sec",...}.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val totalRows = spark.read.parquet(s"$sfDir/events.parquet").count()
    val stream = streaming.EventStreams.tumblingSignups(spark, sfDir,
      watermark = "1 hour")
    val t0 = System.nanoTime()
    val q = stream.writeStream.format("memory").queryName("sb")
      .outputMode(OutputMode.Complete).start()
    q.processAllAvailable()
    val secs = (System.nanoTime() - t0) / 1e9
    val windows = spark.table("sb").count()
    q.stop()

    // near-dup gate throughput: the q63 split (src0 = existing corpus,
    // the rest arrive as a stream) through the stateless stream-static
    // anti-join gate
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = docs.filter(col("source") === "src0")
      .select(col("doc_id"), col("text"))
    val gateIn = docs.filter(col("source") =!= "src0").count()
    val arrivals = spark.readStream.schema(docs.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
      .filter(col("source") =!= "src0")
      .withColumn("eventTime", lit("2025-01-01").cast("timestamp"))
    val g0 = System.nanoTime()
    val gq = streaming.TextStreams.nearDupGate(arrivals, corpus)
      .writeStream.format("memory").queryName("gate")
      .outputMode(OutputMode.Append).start()
    gq.processAllAvailable()
    val gateSecs = (System.nanoTime() - g0) / 1e9
    val gateOut = spark.table("gate").count()
    gq.stop()

    println(s"""{"metric":"stream_rows_per_sec","value":${totalRows / secs},""" +
      s""""unit":"rows/sec","rows":$totalRows,"wall_sec":$secs,""" +
      s""""result_windows":$windows,""" +
      s""""gate_rows_per_sec":${gateIn / gateSecs},"gate_in":$gateIn,""" +
      s""""gate_out":$gateOut,"gate_wall_sec":$gateSecs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
