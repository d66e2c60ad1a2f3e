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
    // spike; spacing them apart means the min of the two sees the quiet
    // machine. The second pass is ROTATED by half the list (same cyclic
    // order, started at the midpoint), which gives EVERY query exactly
    // n/2 queries of separation between its two runs. Round 3 used
    // reversal instead, which gives zero separation at the ends: q99
    // (last in pass 1, first in reversed pass 2) ran back-to-back inside
    // one stall and reported 34.5 s for a query that measures 4.7 s in
    // isolation — min-of-2 can't help when both samples are adjacent.
    // A query that throws is reported as -1, never as a fast timing.
    val names = SparkEntry.queries.keys.toSeq.sorted
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      val ok = try { SparkEntry.queries(name)(spark, sfDir).count(); true }
               catch { case _: Throwable => false }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // several pipelines localCheckpoint intermediates (CC labels,
      // minhash tables); left persisted they accumulate across 2x88
      // queries and the resulting storage/GC pressure inflates whatever
      // runs late in the pass. Each query's blocks are dead once its
      // count() returns, so drop them before timing the next one.
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      if (ok) elapsed else -1.0
    }
    val pass1 = names.map(n => n -> once(n)).toMap
    val half = names.size / 2
    val pass2 = (names.drop(half) ++ names.take(half)).map(n => n -> once(n)).toMap
    val results = names.map { n =>
      val (t1, t2) = (pass1(n), pass2(n))
      n -> (if (t1 < 0 || t2 < 0) -1.0 else math.min(t1, t2))
    }
    // The driver keeps only the last 2000 chars of stdout before parsing,
    // and sbt appends a "[success] Total time" line after ours. With full
    // query names and raw nanosecond-derived doubles the line is ~2900
    // chars, so its head fell outside the window and the driver recorded
    // parsed=null in rounds 1-3. Short keys (the qNN prefix, per the
    // driver contract's own example) and 3-decimal seconds keep the whole
    // line near 1300 chars — comfortably inside the window.
    def fmt(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def shortKey(n: String): String = n.takeWhile(_ != '_')
    val qs = results.map { case (k, v) => "\"" + shortKey(k) + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, v) if v < 0 => "\"" + shortKey(k) + "\"" }
      .mkString("[", ",", "]")
    val nOk = results.count(_._2 >= 0)
    // With errors, the sum covers an unequal query set and totals would
    // be incomparable across runs — report null so nobody compares them;
    // n_ok says how much of the set the run covered either way.
    val total =
      if (nOk == results.size) fmt(results.map(_._2).sum) else "null"
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_ok":$nOk,"n_queries":${results.size},"queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
