// Throwaway-grade diagnostic: A/B the banding expression shape FEEDING
// the TTL'd collisions operator (hs barrier vs plain project) on the
// same sliced replay StreamBench's lsh_dedup_ttl stage uses.
//   SPARK_GRAFT_SF_DIR=/tmp/gensf/sf1 sbt "runMain graft.tools.TtlShapeProbe"
package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger, TTLConfig}

import graft.{GraftSession, StreamBench}
import graft.operators.Text
import graft.streaming.TextStreams

object TtlShapeProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "ttl-shape")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/gensf/sf1")
    val base = "/tmp/graft_ttlprobe"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("source") =!= "src0").select(col("doc_id"), col("text"))
    val n = docs.count()
    StreamBench.sliceOrdered(docs, "doc_id", 12, s"$base/docs")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val bandStructs = (0 until 4).map { b =>
      struct(lit(b).as("band"), Text.bandSigCol(b).as("sig"))
    }
    def variant(name: String, hs: org.apache.spark.sql.Column): Unit = {
      (1 to 2).foreach { rep =>
        val stream = spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$base/docs")
        val banded = stream
          .withColumn("w", split(col("text"), " "))
          .filter(size(col("w")) >= 3)
          .withColumn("hs", hs)
          .select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
          .select(col("bs.sig").as("sig"), col("bs.band").as("band"),
            col("doc_id"))
          .as[(String, Int, Long)]
          .groupByKey { case (sig, band, _) => s"$band|$sig" }
          .transformWithState(
            new TextStreams.BandOwnerProcessor(
              TTLConfig(java.time.Duration.ofMillis(2000))),
            TimeMode.ProcessingTime(), OutputMode.Append())
        val t0 = System.nanoTime()
        val q = banded.toDF().writeStream.format("memory")
          .queryName(s"probe_${name}_$rep")
          .option("checkpointLocation", s"$base/ckpt_${name}_$rep")
          .trigger(Trigger.ProcessingTime("500 milliseconds"))
          .outputMode(OutputMode.Append).start()
        // drain: poll until all inputs admitted (12 files)
        val deadline = System.currentTimeMillis() + 300000
        while (q.isActive && System.currentTimeMillis() < deadline &&
            q.recentProgress.map(_.numInputRows).sum < n)
          Thread.sleep(100)
        val wall = (System.nanoTime() - t0) / 1e9
        val batches = q.recentProgress.count(_.numInputRows > 0)
        val secs = q.recentProgress.filter(_.numInputRows > 0)
          .flatMap(p => Option(p.durationMs.get("triggerExecution")))
          .map(_.toLong / 1000.0).sorted
        val p50 = if (secs.isEmpty) -1 else secs(secs.length / 2)
        q.stop()
        // free the memory sink: each rep's emitted rows otherwise stay
        // retained on the driver and bias every LATER variant/rep (the
        // same retained-sink skew StreamBench's stages drop)
        spark.catalog.dropTempView(s"probe_${name}_$rep")
        println(f"[ttlshape] $name rep$rep wall=$wall%.1fs batches=$batches p50=$p50%.2fs")
      }
    }
    variant("barrier", Text.shingleHashesOnce)
    variant("plain", Text.shingleHashes)
    spark.stop()
  }
}
