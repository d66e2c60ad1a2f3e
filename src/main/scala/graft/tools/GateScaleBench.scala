// Scale rehearsal for the text-LSH STREAMING serving paths at corpora
// past the full StreamBench sweep — the streaming twin of the q35/q123
// batch rehearsal. The corpus-derived banding (Text.bandingOf) makes
// the per-row projection deeper as the lake grows ((7,5) = 35 seeded
// minhashes per arrival at the 500k-doc corpus vs the reference-scale
// 8), so the question a deployment actually asks is: does the gate
// drain rate survive the depth the collision join needs? This measures
// exactly three serving stages — the stream-static GATE (stateless
// anti-joins against the landed band index), the intra-stream
// COLLISION feed (named lsh_dedup: it joins the full sweep's un-TTL'd
// column) and the total ADMIT surface (named admit_drain: an un-TTL'd
// drain-rate view, the full sweep's `admit` being the TTL'd paced
// sibling — one transformWithState each; state = distinct band
// signatures, bounded by the corpus) — and emits one JSON line
// (gate_scale.json) with the same per-stage field names as
// stream_bench.json, so tools/stream_scaling.py reads it as another
// SF column.
//
//   SPARK_GRAFT_SF_DIR=/tmp/gensf/sf10 sbt "runMain graft.tools.GateScaleBench"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.{GraftSession, StreamBench}

object GateScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/gensf/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nSlices = sys.env.getOrElse("SPARK_GRAFT_STREAM_SLICES", "12").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = "/tmp/graft_gatescale"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    val changelog = sys.env.getOrElse("SPARK_GRAFT_CHANGELOG_CKPT", "1") == "1"
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      changelog.toString)
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "400")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val arrivalsBatch = docs.filter(col("source") =!= "src0")
      .select(col("doc_id"), col("text"))
      .withColumn("eventTime",
        timestamp_seconds(lit(1735689600L) + col("doc_id")))
    val gateIn = arrivalsBatch.count()
    val lakeBanding = graft.operators.Text.bandingOf(spark, sfDir)
    StreamBench.sliceOrdered(arrivalsBatch, "doc_id", nSlices, s"$base/docs")
    def arrivals = spark.readStream.schema(arrivalsBatch.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/docs")

    def drain(name: String, start: () => org.apache.spark.sql.streaming.StreamingQuery): String = {
      val t0 = System.nanoTime()
      val q = start()
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      val prog = q.recentProgress.toSeq
      val withIn = prog.filter(_.numInputRows > 0)
      val batches = withIn.length
      val secs = withIn
        .flatMap(p => Option(p.durationMs.get("triggerExecution")))
        .map(_.toLong / 1000.0).sorted
      def pct(p: Double): Double =
        if (secs.isEmpty) -1
        else secs(math.min(secs.length - 1, (p * secs.length).toInt))
      val stOps = prog.filter(_.stateOperators.nonEmpty)
      val stateRows = stOps.map(_.stateOperators.map(_.numRowsTotal).sum)
        .maxOption.getOrElse(0L)
      val stateMem = stOps.map(_.stateOperators.map(_.memoryUsedBytes).sum)
        .maxOption.getOrElse(0L)
      val removed = stOps.lastOption
        .map(_.stateOperators.map(_.numRowsRemoved).sum).getOrElse(0L)
      val out = try spark.table(name).count() catch { case _: Throwable => 0L }
      q.stop()
      try spark.catalog.dropTempView(name) catch { case _: Throwable => () }
      println(f"[gate_scale] $name wall=$wall%.1f rows/s=${gateIn / wall}%.0f " +
        f"batches=$batches p95=${pct(0.95)}%.2f state=$stateRows out=$out")
      f""""$name":{"in_rows":$gateIn,"out_rows":$out,""" +
        f""""drain_wall_s":$wall%.1f,"rows_per_sec":${gateIn / wall}%.1f,""" +
        f""""batches":$batches,"batch_sec":{"p50":${pct(0.5)}%.2f,"p95":${pct(0.95)}%.2f},""" +
        s""""state":{"rows_max":$stateRows,"mem_bytes":$stateMem,""" +
        s""""removed":$removed}}"""
    }

    val gate = drain("gate", () =>
      graft.streaming.TextStreams
        .nearDupGateLanded(spark, arrivals, sfDir, banding = lakeBanding)
        .writeStream.format("memory").queryName("gate")
        .outputMode(OutputMode.Append).start())
    val coll = drain("lsh_dedup", () =>
      graft.streaming.TextStreams.streamingLshCollisions(spark,
          arrivals.select(col("doc_id"), col("text")), banding = lakeBanding)
        .toDF().writeStream.format("memory").queryName("lsh_dedup")
        .outputMode(OutputMode.Append).start())
    val admit = drain("admit_drain", () =>
      graft.streaming.TextStreams.streamingNearDupAdmit(spark,
          arrivals.select(col("doc_id"), col("text")),
          banding = lakeBanding)
        .toDF().writeStream.format("memory").queryName("admit_drain")
        .outputMode(OutputMode.Append).start())

    val line = s"""{"metric":"gate_scale","slices":$nSlices,""" +
      s""""banding":"$lakeBanding","changelog_ckpt":$changelog,""" +
      s"""$gate,$coll,$admit,"sf":"$sfDir"}"""
    val w = new java.io.PrintWriter("gate_scale.json", "UTF-8")
    try w.println(line) finally w.close()
    try spark.stop()
    catch { case e: Throwable =>
      System.err.println(s"[gate_scale] spark.stop failed: ${e.getMessage}")
    }
    println(line)
  }
}
