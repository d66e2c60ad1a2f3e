// Diagnostic: print the measured recall curves of the DERIVED LSH
// constructions at a rehearsal corpus — the q107 (text bands) and q106
// (vector tables) reports, read for their numbers rather than their
// hashes. sbt "runMain graft.tools.RecallProbe [dir...]"
package graft.tools

import graft.GraftSession
import graft.operators.{Text, Vectors}

object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/tmp/gensf/sf1", "/tmp/gensf/sf10")
    dirs.foreach { dir =>
      println(s"[recall] $dir text banding=${Text.bandingOf(spark, dir)} (q107):")
      Text.bandRecallSweep(spark, dir).show(12, false)
      println(s"[recall] $dir vector construction (q106):")
      Vectors.lshRecallSweep(spark, dir).show(16, false)
    }
    spark.stop()
  }
}
