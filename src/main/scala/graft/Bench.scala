package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. A warmup pass (two small
  * queries) pays the one-time JVM/codegen/parquet-footer cost so the
  * per-query numbers reflect steady-state engine throughput, which is
  * what the 100 TB comparison cares about.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("q1_pricing_summary", "q26_type_stats").foreach { w =>
      try SparkEntry.queries(w)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    // best-of-2 per query: single-JVM local mode shows one-off GC spikes
    // (observed 4x on a random query per run); the min of two runs is the
    // steady-state number the 100 TB comparison cares about. A query that
    // throws is reported as -1, never as a fast timing.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case _: Throwable => false }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val (t1, ok1) = once()
      if (!ok1) name -> -1.0
      else { val (t2, ok2) = once(); name -> (if (ok2) math.min(t1, t2) else -1.0) }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
