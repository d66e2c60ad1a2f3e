package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.{IndexCompaction, IngestLoop}

/** One-command deployment entry point for the dedup ingest service:
  *
  *   runMain graft.DedupService <serviceRoot> <streamDir>
  *       [--corpus <parquet>] [--interval-ms N] [--max-cycles N]
  *
  * Runs the composed ingest loop ([[graft.streaming.IngestLoop]]) as a
  * scheduled service until signalled: every interval it collects the
  * parquet files that ARRIVED in `streamDir` since the last cycle,
  * runs them through gate → admit → exactly-once landing → MINOR
  * compaction, and prints one JSON telemetry line per cycle (the same
  * fields StreamBench's `ingest_loop` stage artifacts). Every 4th
  * cycle it also runs the MAJOR merge (the epoch-fold cadence
  * GateRebuildBench prices). An empty interval is a no-op cycle.
  *
  * Stop by touching `<serviceRoot>/STOP` (or let `--max-cycles` end a
  * bounded run, the smoke/bench mode). State layout under
  * `<serviceRoot>`: `index/` (the epoch-segmented gate index),
  * `landed/cycle_<n>/` (the admitted docs, one batch_id partition per
  * micro-batch), `work/cycle_<n>/` (the cycle's input snapshot).
  *
  * The index starts from `--corpus` (a parquet of (doc_id, text) the
  * dataset already owns) or empty; either way a restart re-reads the
  * live epoch listing and resumes — the index IS the service's
  * durable state, there is nothing else to recover.
  */
object DedupService {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: DedupService <serviceRoot> <streamDir> [--corpus p] " +
        "[--interval-ms N] [--max-cycles N]")
    val root = args(0)
    val streamDir = args(1)
    def opt(flag: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`flag`, v) => v }
    val intervalMs = opt("--interval-ms").map(_.toLong).getOrElse(5000L)
    val maxCycles = opt("--max-cycles").map(_.toInt).getOrElse(Int.MaxValue)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled",
      "false")

    val idxRoot = s"$root/index"
    val landRoot = s"$root/landed"
    val corpus = opt("--corpus") match {
      case Some(p) => spark.read.parquet(p).select(col("doc_id"), col("text"))
      case None =>
        import spark.implicits._
        Seq.empty[(Long, String)].toDF("doc_id", "text")
    }
    IndexCompaction.init(spark, idxRoot, corpus)

    val processed = scala.collection.mutable.Set[String]()
    // resume: files already snapshotted into a work dir were processed
    // by a previous incarnation (their content is in the index)
    Option(new java.io.File(root, "work").listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory)
      .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
      .foreach(f => processed += f.getName)

    var cycle = Option(new java.io.File(root, "work").listFiles())
      .getOrElse(Array.empty).count(_.isDirectory)
    val stopFile = new java.io.File(root, "STOP")
    while (!stopFile.exists() && cycle < maxCycles) {
      val t0 = System.currentTimeMillis()
      val fresh = Option(new java.io.File(streamDir).listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet") &&
          !processed.contains(f.getName))
        .sortBy(_.getName)
      if (fresh.nonEmpty) {
        val workDir = new java.io.File(root, s"work/cycle_$cycle")
        workDir.mkdirs()
        fresh.foreach { f =>
          java.nio.file.Files.copy(f.toPath,
            workDir.toPath.resolve(f.getName)): Unit
          processed += f.getName
        }
        val cycDf = spark.read.parquet(workDir.getAbsolutePath)
        val st = IngestLoop.runCycle(spark, idxRoot, landRoot, cycle,
          workDir.getAbsolutePath, cycDf.schema, cycDf.count())
        val mergeS =
          if (cycle % 4 == 3) {
            val tM = System.nanoTime()
            IndexCompaction.merge(spark, idxRoot)
            (System.nanoTime() - tM) / 1e9
          } else -1.0
        println(
          s"""{"service":"dedup","cycle":$cycle,"files":${fresh.length},""" +
          s""""arrivals":${st.arrivals},"gate_admitted":${st.gateAdmitted},""" +
          s""""admitted":${st.admitted},"landed":${st.landed},""" +
          s""""folded":${st.folded},"epochs":${st.epochsAfter},""" +
          f""""gate_build_s":${st.gateBuildS}%.2f,""" +
          f""""drain_s":${st.drainWallS}%.2f,""" +
          f""""compact_s":${st.compactS}%.2f,""" +
          (if (mergeS < 0) """"merge_s":-1}"""
           else f""""merge_s":$mergeS%.2f}"""))
        cycle += 1
      }
      val elapsed = System.currentTimeMillis() - t0
      if (!stopFile.exists() && cycle < maxCycles && elapsed < intervalMs)
        Thread.sleep(intervalMs - elapsed)
    }
    if (stopFile.exists())
      println(s"""{"service":"dedup","stopped":"STOP file","cycles":$cycle}""")
    spark.stop()
  }
}
