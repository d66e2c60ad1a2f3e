package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming-throughput benchmark: replays the `events` table through
  * Structured Streaming (file source, watermarked tumbling aggregation —
  * the reference's core workload shape) and the `documents` table
  * through the stream-static near-dup gate, and reports end-to-end
  * rows/sec per stage.
  *
  * The reference's replay source emits ~10 events/s by design
  * (FlinkWindowLearning.scala:40); this measures what the same logical
  * pipelines sustain under Spark's micro-batch engine.
  *
  * Prints ONE JSON line AND writes it to `stream_bench.json` next to
  * `bench.json`, so the streaming numbers are a driver-visible artifact
  * rather than stdout that scrolls away: each stage reports rows/s,
  * rows in/out, wall seconds, and the micro-batch count (from query
  * progress), plus the same loadavg telemetry as the batch bench —
  * rows/s on a contended host is a property of the host, not the
  * engine.
  */
object StreamBench {

  private def loadavg(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Hypervisor steal seconds (see Bench for the full story). */
  private def stealSec(): Double =
    try {
      val cpu = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).get.trim.split("\\s+")
      cpu(8).toDouble / 100.0
    } catch { case _: Throwable => -1.0 }

  private def fmt(v: Double, dp: Int = 1): String =
    if (v.isNaN || v.isInfinite) "-1"
    else BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toString

  /** Run one streaming stage to completion; JSON object of its metrics.
    * `inRows` is the driving row count the throughput is measured over.
    */
  private def stage(spark: SparkSession, name: String, df: DataFrame,
      mode: OutputMode, inRows: Long): String = {
    val t0 = System.nanoTime()
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    q.processAllAvailable()
    val secs = (System.nanoTime() - t0) / 1e9
    val outRows = spark.table(name).count()
    // recentProgress is capped (default 100) but these runs finish in
    // a handful of micro-batches; batch count + mean batch size make
    // the micro-batch shape auditable (1 giant batch and 500 tiny ones
    // can share a rows/s number but scale differently)
    val batches = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    s""""$name":{"rows_per_sec":${fmt(inRows / secs)},"in_rows":$inRows,""" +
      s""""out_rows":$outRows,"wall_sec":${fmt(secs, 2)},""" +
      s""""batches":$batches}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val load0 = loadavg(); val steal0 = stealSec()

    // stage 1: watermarked tumbling aggregation over the events replay
    val totalRows = spark.read.parquet(s"$sfDir/events.parquet").count()
    val tumbling = stage(spark, "sb",
      streaming.EventStreams.tumblingSignups(spark, sfDir, watermark = "1 hour"),
      OutputMode.Complete, totalRows)

    // stage 2: near-dup gate — the q63 split (src0 = existing corpus,
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
    val gate = stage(spark, "gate",
      streaming.TextStreams.nearDupGate(arrivals, corpus),
      OutputMode.Append, gateIn)

    // stage 3: span-level contamination audit (q116's streaming twin) —
    // per-arriving-doc verbatim span hits against the landed src0 span
    // index. Update mode: a one-shot replay never advances the
    // watermark, so Append would hold every group back.
    val audit = stage(spark, "span_audit",
      streaming.TextStreams.spanContaminationAudit(arrivals, corpus),
      OutputMode.Update, gateIn)

    // stage 4: stateless IVF cell assignment of an arriving embedding
    // stream (the vector store's write path — literal broadcast
    // centroids, per-row argmin, zero shuffles)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val embRows = emb.count()
    val embStream = spark.readStream.schema(emb.schema)
      .option("pathGlobFilter", "embeddings.parquet").parquet(sfDir)
    val assign = stage(spark, "cell_assign",
      streaming.VectorStreams.cellAssign(spark, embStream, sfDir),
      OutputMode.Append, embRows)

    // stage 5: standing-query retrieval — frozen-stats scoring of every
    // arriving doc plus the per-query stateful top-k (transformWithState
    // needs the RocksDB provider; scoped to this stage)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    val standing = stage(spark, "standing_retrieval",
      streaming.TextStreams.standingRetrieval(spark, arrivals, sfDir).toDF(),
      OutputMode.Append, gateIn)
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    spark.conf.unset("spark.sql.streaming.checkpoint.fileChecksum.enabled")

    val load1 = loadavg(); val steal1 = stealSec()
    val stealS = if (steal0 < 0 || steal1 < 0) "-1" else fmt(steal1 - steal0)
    val line = s"""{"metric":"stream_bench","unit":"rows/sec",""" +
      s"""$tumbling,$gate,$audit,$assign,$standing,""" +
      s""""load":{"start":${fmt(load0, 2)},"end":${fmt(load1, 2)},"cpus":$cpus,"steal_s":$stealS},""" +
      s""""sf":"$sfDir"}"""
    val w = new java.io.PrintWriter("stream_bench.json", "UTF-8")
    try w.println(line) finally w.close()
    try spark.stop()
    catch { case e: Throwable =>
      System.err.println(s"[stream_bench] spark.stop failed: ${e.getMessage}")
    }
    println(line)
  }
}
