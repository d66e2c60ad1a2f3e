package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. A warmup pass (two small
  * queries) pays the one-time JVM/codegen/parquet-footer cost so the
  * per-query numbers reflect steady-state engine throughput, which is
  * what the 100 TB comparison cares about.
  *
  * Cold vs warm: several pipelines land shared stages as parquet via
  * [[graft.operators.Materialize]] (pair tables, CC labels, IVF/ADC
  * stages), so pass 1 pays each stage's build — charged to whichever
  * query triggers it — and pass 2 reads the landed tables. Both numbers
  * are real and BOTH are reported: `value` (min-of-2, steady-state — a
  * production DAG reads landed stages) is the headline; `cold_total`
  * (pass-1 sum, includes every stage build) is the end-to-end
  * first-run cost. Per-stage build seconds land in bench_full.json.
  * Materialize reuses fingerprint-matched stages landed by EARLIER
  * processes over identical data; when that happens the cold pass
  * measured a warm lake, and bench_full.json discloses exactly which
  * stages came pre-built (`materialize_reused`).
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
    // cold_total charges every landed-stage build to the pass-1 query
    // that triggers it; a warmup query touching a materialized stage
    // would silently shift that cost out of both cold numbers
    require(graft.operators.Materialize.buildSeconds.isEmpty,
      "warmup queries must not touch Materialize stages: " +
        graft.operators.Materialize.buildSeconds.keys.mkString(", "))
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
    // SPARK_GRAFT_BENCH_ONLY=q106,q107,... — rehearsal subset for scale
    // decades where a full 150-query sweep is wasteful (the sf10
    // appendix runs ~15 queries). Matches the short qNN prefix. The
    // artifact keeps the same shape; scaling.py's appendix mode joins it
    // against a full lower-SF artifact, iterating the SUBSET's keys.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // accept either the short qNN prefix or the full registry name
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(o =>
        o.contains(n.takeWhile(_ != '_')) || o.contains(n)))
    require(names.nonEmpty, "SPARK_GRAFT_BENCH_ONLY matched no queries: " +
      only.map(_.mkString(",")).getOrElse(""))
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
    // Host-load telemetry: the 1-minute loadavg sampled at pass
    // boundaries, plus each pass's wall total. These numbers exist so a
    // reader can tell contention-inflated runs from real regressions —
    // round 5's artifact carried numbers 2–60x inflated by a loaded
    // host and was indistinguishable from a regression without them.
    // A loadavg far above this process's own footprint (or a pass wall
    // total far above the per-query sum) says: re-run on a quiet host
    // before reading the numbers as engine throughput.
    def loadavg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString
        .split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    // Hypervisor STEAL seconds (aggregate over all vCPUs, from
    // /proc/stat field 8): on this VM the host visibly throttles a
    // saturating run — steal accumulated during a pass is wall time no
    // engine change can recover, and the cleanest explanation when two
    // identical runs differ 30%+ with an idle-looking loadavg.
    def stealSec(): Double =
      try {
        val cpu = scala.io.Source.fromFile("/proc/stat").getLines()
          .find(_.startsWith("cpu ")).get.trim.split("\\s+")
        cpu(8).toDouble / 100.0 // USER_HZ=100 ticks/s
      } catch { case _: Throwable => -1.0 }
    def fmt(v: Double, dp: Int): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toString

    val load0 = loadavg(); val steal0 = stealSec()
    val wall0 = System.nanoTime()
    val pass1 = names.map(n => n -> once(n)).toMap
    val load1 = loadavg(); val steal1 = stealSec()
    val wall1 = System.nanoTime()
    val half = names.size / 2
    val pass2 = (names.drop(half) ++ names.take(half)).map(n => n -> once(n)).toMap
    val load2 = loadavg(); val steal2 = stealSec()
    val wall2 = System.nanoTime()
    def stealJ(a: Double, b: Double): String =
      if (a < 0 || b < 0) "-1" else fmt(b - a, 1)
    def loadJson = s"""{"start":${fmt(load0, 2)},"mid":${fmt(load1, 2)},"end":${fmt(load2, 2)},"cpus":$cpus,"steal_s":{"pass1":${stealJ(steal0, steal1)},"pass2":${stealJ(steal1, steal2)}}}"""
    def wallJson = s"""{"pass1":${fmt((wall1 - wall0) / 1e9, 1)},"pass2":${fmt((wall2 - wall1) / 1e9, 1)}}"""
    val results = names.map { n =>
      val (t1, t2) = (pass1(n), pass2(n))
      n -> (if (t1 < 0 || t2 < 0) -1.0 else math.min(t1, t2))
    }
    val warm = results.toMap
    // The driver keeps only the last 2000 chars of stdout before parsing,
    // and sbt appends a "[success] Total time" line after ours. Short keys
    // (the qNN prefix, per the driver contract's own example) and rounded
    // seconds keep the whole line near 1500 chars — comfortably inside
    // the window even with the trailing sbt line.
    def shortKey(n: String): String = n.takeWhile(_ != '_')
    // Registry guards full-name duplicates; the JSON keys are the short
    // qNN prefixes, so a reused number would silently drop one timing.
    require(names.map(shortKey).distinct.size == names.size,
      "duplicate qNN bench keys would silently drop a timing")
    def qmap(m: String => Double, dp: Int): String =
      names.map(n => "\"" + shortKey(n) + "\":" + fmt(m(n), dp))
        .mkString("{", ",", "}")
    val errs = results.collect { case (k, v) if v < 0 => "\"" + shortKey(k) + "\"" }
      .mkString("[", ",", "]")
    val nOk = results.count(_._2 >= 0)
    // With errors, the sum covers an unequal query set and totals would
    // be incomparable across runs — report null so nobody compares them;
    // n_ok says how much of the set the run covered either way.
    def totalOf(vs: Seq[Double]): String =
      if (vs.forall(_ >= 0)) fmt(vs.sum, 3) else "null"
    val total = totalOf(results.map(_._2))
    val coldTotal = totalOf(names.map(pass1))
    val line = s"""{"metric":"total","value":$total,"unit":"sec","cold_total":$coldTotal,"n_ok":$nOk,"n_queries":${results.size},"queries":${qmap(warm, 2)},"load":$loadJson,"wall_s":$wallJson,"errors":$errs,"sf":"$sfDir"}"""
    // Full detail (3-dp warm AND cold per query, plus per-stage landed-
    // table build seconds) goes to a file: the stdout line must stay
    // inside the driver's 2000-char tail window.
    val mat = graft.operators.Materialize.buildSeconds.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v, 3) }
      .mkString("{", ",", "}")
    // stages reused from a previous process (fingerprint-matched landed
    // tables): when non-empty, this run's "cold" pass measured a warm
    // lake — the artifact must say so
    val matReused = graft.operators.Materialize.reusedKeys.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    // on-disk cost of the landed stage graph — the disk side of the
    // disk-for-corpus-passes trade, so a reviewer sees the full price
    val matBytes = graft.operators.Materialize.stageBytes.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val full = s"""{"metric":"total","value":$total,"unit":"sec","cold_total":$coldTotal,"n_ok":$nOk,"n_queries":${results.size},"warm":${qmap(warm, 3)},"cold":${qmap(pass1, 3)},"materialize_s":$mat,"materialize_reused":$matReused,"materialize_bytes":$matBytes,"load":$loadJson,"wall_s":$wallJson,"errors":$errs,"sf":"$sfDir"}"""
    for ((f, s) <- Seq("bench.json" -> line, "bench_full.json" -> full)) {
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.println(s) finally w.close()
    }
    // LAST stdout line (after spark.stop so no late executor chatter can
    // interleave); build.sbt's StdoutOutput strategy keeps it bare. A
    // shutdown failure must never eat the result line — bench.json is on
    // disk already, but the driver parses stdout.
    try spark.stop()
    catch { case e: Throwable =>
      System.err.println(s"[bench] spark.stop failed: ${e.getMessage}")
    }
    println(line)
  }
}
