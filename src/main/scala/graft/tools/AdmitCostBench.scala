// Admit-surface cost decomposition: run with
//   sbt "runMain graft.tools.AdmitCostBench"   (SPARK_GRAFT_SF_DIR)
// Writes admit_cost.json — the measurement behind STREAM_SCALING's
// admit cost table.
package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger, TTLConfig}
import graft.{GraftSession, StreamBench}
import graft.streaming.TextStreams

/** Why this exists: STREAM_SCALING measured the near-dup ADMIT surface
  * draining ~10× slower per input row than the collisions-only twin at
  * sf1 (358 vs 3,619 rows/s) without saying where the gap goes. The
  * two pipelines share banding, key layout, state contract, and TTL —
  * the candidate costs are (a) EMISSION VOLUME (total: one verdict per
  * (doc, band) ≈ 4×/doc vs collisions: only actual hits), (b) the
  * SHORT-DOC totality rows (a doc-unique TTL'd state key per short
  * doc), and (c) the driver-side memory sink absorbing the larger
  * output. This main isolates each on one corpus, same slices, same
  * 500 ms trigger, same TTL:
  *
  *  - `collisions`  — BandOwnerProcessor, sparse emission (baseline);
  *  - `admit_total` — the verdict-per-(doc, band) shape as shipped;
  *  - `admit_total_noop` — same, into a count-only foreachBatch sink
  *    (total MINUS noop ≈ the memory-sink share);
  *  - `admit_noshort` — total shape, ≥3-word docs only (total MINUS
  *    noshort ≈ the short-doc state share);
  *  - `admit_lean`  — presence row on band 0 / short key + non-owner
  *    verdicts elsewhere (the fix candidate; [[TextStreams.admittedOf]]
  *    reduces lean and total to the SAME admit set — pinned
  *    DETERMINISTICALLY in TextStreamsSpec under TTLConfig.NONE; the
  *    TTL'd runs here are wall-clock-paced, so a 2 s ownership horizon
  *    can evict between runs and the admitted SIZES may differ by a
  *    few docs run-to-run — that is TTL timing, not emission shape,
  *    which is why the artifact reports both sizes instead of
  *    requiring equality).
  */
object AdmitCostBench {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "admit-cost-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled",
      "false")
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "4000")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nSlices = 12
    val ttlMs = 2000L
    val base = java.nio.file.Files.createTempDirectory("admit_cost")
      .toFile.getAbsolutePath
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("source") =!= "src0")
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    StreamBench.sliceOrdered(docs, "doc_id", nSlices, s"$base/docs")
    def arrivals = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/docs")
    def arrivalsLong = arrivals.filter(size(split(col("text"), " ")) >= 3)

    import spark.implicits._

    // drain a TTL'd (processing-time-clocked) query: poll admitted input
    // rows, never processAllAvailable — the TTL clock never idles
    def drain(q: org.apache.spark.sql.streaming.StreamingQuery,
        inRows: Long): Double = {
      val t0 = System.nanoTime()
      val deadline = System.currentTimeMillis() + 600000
      def admitted = q.recentProgress.map(_.numInputRows).sum
      while (q.isActive && admitted < inRows &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      q.exception.foreach(e => throw new IllegalStateException(q.name, e))
      val wall = (System.nanoTime() - t0) / 1e9
      require(admitted >= inRows, s"${q.name} drained $admitted of $inRows")
      wall
    }

    def memRun(name: String, df: org.apache.spark.sql.DataFrame,
        inRows: Long): (Double, Long, Long) = {
      val q = df.writeStream.format("memory").queryName(name)
        .trigger(Trigger.ProcessingTime("500 milliseconds"))
        .outputMode(OutputMode.Append).start()
      val wall = drain(q, inRows)
      val out = spark.table(name).count()
      val stateRows = q.recentProgress.toSeq
        .filter(_.stateOperators.nonEmpty).lastOption
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
      q.stop()
      (wall, out, stateRows)
    }

    val ttl = TTLConfig(java.time.Duration.ofMillis(ttlMs))
    var admitTotalSet: Set[Long] = null
    var admitLeanSet: Set[Long] = null

    val runs = Seq(
      "collisions" -> (() => {
        val (w, out, st) = memRun("ac_coll",
          TextStreams.streamingLshCollisions(spark, arrivals, ttl).toDF(), n)
        (w, out, st)
      }),
      "admit_total" -> (() => {
        val (w, out, st) = memRun("ac_total",
          TextStreams.streamingNearDupAdmit(spark, arrivals, ttl).toDF(), n)
        admitTotalSet = TextStreams.admittedOf(spark.table("ac_total"))
          .as[Long].collect().toSet
        (w, out, st)
      }),
      "admit_total_noop" -> (() => {
        val outN = new java.util.concurrent.atomic.AtomicLong(0L)
        val q = TextStreams.streamingNearDupAdmit(spark, arrivals, ttl)
          .toDF().writeStream
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            outN.addAndGet(df.count()): Unit
          }
          .trigger(Trigger.ProcessingTime("500 milliseconds"))
          .outputMode(OutputMode.Append).start()
        val wall = drain(q, n)
        val st = q.recentProgress.toSeq
          .filter(_.stateOperators.nonEmpty).lastOption
          .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
        q.stop()
        (wall, outN.get(), st)
      }),
      "admit_noshort" -> (() => {
        val nLong = docs.filter(size(split(col("text"), " ")) >= 3).count()
        memRun("ac_noshort",
          TextStreams.streamingNearDupAdmit(spark, arrivalsLong, ttl).toDF(),
          nLong)
      }),
      "admit_lean" -> (() => {
        val (w, out, st) = memRun("ac_lean",
          TextStreams.streamingNearDupAdmit(spark, arrivals, ttl,
            lean = true).toDF(), n)
        admitLeanSet = TextStreams.admittedOf(spark.table("ac_lean"))
          .as[Long].collect().toSet
        (w, out, st)
      })
    ).map { case (name, run) =>
      val (wall, out, stateRows) = run()
      f"""{"variant":"$name","wall_s":$wall%.2f,""" +
        f""""rows_per_sec":${n / wall}%.1f,"out_rows":$out,""" +
        f""""state_rows_last":$stateRows}"""
    }

    val overlap = admitTotalSet.intersect(admitLeanSet).size
    val line = s"""{"metric":"admit_cost","sf":"$sfDir","arrivals":$n,""" +
      s""""slices":$nSlices,"ttl_ms":$ttlMs,""" +
      s""""admitted_total":${admitTotalSet.size},""" +
      s""""admitted_lean":${admitLeanSet.size},""" +
      s""""admitted_overlap":$overlap,""" +
      s""""runs":[${runs.mkString(",")}]}"""
    println(line)
    val w = new java.io.PrintWriter("admit_cost.json", "UTF-8")
    try w.println(line) finally w.close()
    spark.stop()
  }
}
