package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, StreamBench}

/** Scale rehearsal for the two corpus-size-INDEPENDENT state bounds —
  * the live HLL dataset card (256 registers × groups) and the live
  * count-min sketch (4×w = 64 cells) — WITHOUT the full StreamBench
  * sweep. A new decade (the GenCorpus sf10 corpus: ~500k docs, ~27M
  * tokens) can falsify exactly two claims cheaply: state_rows stays at
  * its bound while the input grows 10×, and the live estimates still
  * EQUAL the batch q134/q90 answers after 10× more merges. The other
  * StreamBench stages are horizon-bounded (their cost tracks the
  * replay length by design) and are measured at sf0.001–sf1 by the
  * full sweep; re-running them at sf10 would spend ~an hour measuring
  * slopes the four lower SFs already establish.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/gensf/sf10 sbt "runMain graft.tools.SketchScaleBench"
  *
  * Writes ONE JSON line to stdout and `sketch_scale.json` — the same
  * `hll_live`/`countmin_live` fragment shape as stream_bench.json, so
  * tools/stream_scaling.py can read it as another SF column.
  */
object SketchScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nSlices = sys.env.getOrElse("SPARK_GRAFT_STREAM_SLICES", "12").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = "/tmp/graft_sketchscale"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    // transformWithState needs column families → RocksDB provider (the
    // same setup StreamBench.main applies before its stateful stages)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    // mirror StreamBench.main's changelog-checkpointing default: this
    // artifact joins into STREAM_SCALING.md columns whose lower-SF rows
    // were measured under changelog mode — batch_sec/rows_per_sec must
    // be apples-to-apples (and the setting is recorded in the line)
    val changelog = sys.env.getOrElse("SPARK_GRAFT_CHANGELOG_CKPT", "1") == "1"
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      changelog.toString)
    val hll = StreamBench.hllLiveStage(spark, sfDir, base, nSlices)
    val cm = StreamBench.cmLiveStage(spark, sfDir, base, nSlices)
    val line = s"""{"metric":"sketch_scale","slices":$nSlices,""" +
      s""""changelog_ckpt":$changelog,$hll,$cm,"sf":"$sfDir"}"""
    val w = new java.io.PrintWriter("sketch_scale.json", "UTF-8")
    try w.println(line) finally w.close()
    try spark.stop()
    catch { case e: Throwable =>
      System.err.println(s"[sketch_scale] spark.stop failed: ${e.getMessage}")
    }
    println(line)
  }
}
