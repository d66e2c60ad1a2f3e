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
    // best-of-2 per query, with the two timing passes INTERLEAVED (run
    // every query once, then every query again) rather than back-to-back:
    // single-JVM local mode shows one-off GC spikes, and the machine can
    // carry transient external load (a lingering JVM from an earlier
    // stage). Back-to-back runs of the same query both land inside such a
    // spike; spacing them a full pass (~40 s) apart means the min of the
    // two sees the quiet machine. The second pass runs in REVERSE order:
    // a multi-minute external stall covers a contiguous window of each
    // pass, and with the same order both windows hold the same queries
    // (observed round 2: q47/q48 spiked 6-7x in both passes while
    // isolated reruns showed no regression). Reversed, a query near the
    // stall in one pass is far from it in the other, so min-of-2
    // recovers the quiet-machine number. A query that throws is
    // reported as -1, never as a fast timing.
    val names = SparkEntry.queries.keys.toSeq.sorted
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      val ok = try { SparkEntry.queries(name)(spark, sfDir).count(); true }
               catch { case _: Throwable => false }
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    val pass1 = names.map(n => n -> once(n)).toMap
    val pass2 = names.reverse.map(n => n -> once(n)).toMap
    val results = names.map { n =>
      val (t1, t2) = (pass1(n), pass2(n))
      n -> (if (t1 < 0 || t2 < 0) -1.0 else math.min(t1, t2))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val nOk = results.count(_._2 >= 0)
    // With errors, the sum covers an unequal query set and totals would
    // be incomparable across runs — report null so nobody compares them;
    // n_ok says how much of the set the run covered either way.
    val total =
      if (nOk == results.size) results.map(_._2).sum.toString else "null"
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_ok":$nOk,"n_queries":${results.size},"queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
