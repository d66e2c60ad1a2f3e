package graft.operators

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared-stage materialization: build an intermediate table once per
  * process and land it as parquet; every later consumer reads the landed
  * table instead of replaying the pipeline that produced it.
  *
  * This mirrors how a production curation DAG is actually wired: the
  * near-dup stage (shingle → MinHash → LSH join → verify → connected
  * components) writes its cluster-label table to the lake ONCE, and the
  * retention manifest, dedup funnel, and cluster-size report all read
  * that table — nobody re-derives MinHash signatures per report. At
  * 100 TB re-derivation is not a style problem but the difference
  * between one corpus-sized pass and four. The declared query set keeps
  * one entry per report, so without this the library's own composition
  * (q67/q70/q92/q99 over one label table, q69/q98 over another) would
  * re-run the shared stage per query.
  *
  * Staleness safety: the parquet lands under a per-process directory
  * (pid + JVM start time), and only keys written by THIS process are
  * trusted — a later run with the same inputs rebuilds from scratch, so
  * in-place changes to source data between runs can never serve stale
  * intermediates. Keys are namespaced by source dir and every semantic
  * parameter (threshold, table counts, …).
  *
  * Concurrency: `computeIfAbsent` on the key registry makes the build
  * single-flight — parallel test suites touching the same stage block on
  * one writer, then all read the same files.
  */
object Materialize {
  private val runtime = java.lang.management.ManagementFactory.getRuntimeMXBean
  private val tmpRoot = new java.io.File(System.getProperty("java.io.tmpdir"))
  private val base =
    s"$tmpRoot/graft_mat_${runtime.getName.replace('@', '_')}_${runtime.getStartTime}"

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  // Landed tables are per-process scratch, not a cache shared across
  // runs — delete our own dir on JVM exit, and sweep dirs left behind by
  // processes that died before their hook ran (kill -9, OOM). A dir is
  // stale iff its embedding process is provably gone — never delete a
  // LIVE concurrent run's tables.
  java.lang.Runtime.getRuntime.addShutdownHook(new Thread(() =>
    deleteRecursively(new java.io.File(base))))

  /** Fail-SAFE staleness test for a scratch dir name: delete only when
    * the name parses to an owner pid (graft_mat_<pid>_<host>_<startms>),
    * /proc liveness semantics exist on this system, AND /proc/<pid> is
    * absent. An unparseable name or a missing /proc (non-Linux) keeps
    * the dir — a disk leak beats deleting a live run's landed tables.
    * Known accepted gap: pid reuse can keep a dead run's dir around
    * until the recycled pid exits (bounded leak, fail-safe direction).
    */
  private[graft] def isStale(name: String,
      procRoot: java.io.File = new java.io.File("/proc")): Boolean =
    name.startsWith("graft_mat_") &&
      procRoot.isDirectory &&
      name.drop("graft_mat_".length).takeWhile(_.isDigit).toLongOption
        .exists(pid => !new java.io.File(procRoot, pid.toString).exists())

  locally {
    val mine = new java.io.File(base).getName
    Option(tmpRoot.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName != mine && isStale(f.getName))
      .foreach(deleteRecursively)
  }
  // per-key monitors rather than computeIfAbsent(build): one stage's
  // build may materialize another stage (labels build reads the pairs
  // table), and recursive computeIfAbsent on one ConcurrentHashMap is
  // undefined; plain monitors nest safely because stage dependencies
  // are acyclic
  private val locks = new ConcurrentHashMap[String, Object]()
  private val built = ConcurrentHashMap.newKeySet[String]()
  private val buildSecs = new ConcurrentHashMap[String, Double]()

  /** Wall seconds spent BUILDING each landed stage this process (key →
    * sec). Bench reports these next to the warm per-query numbers so the
    * one-time pipeline cost of the stage graph is auditable rather than
    * hidden inside whichever query happened to trigger the build.
    */
  def buildSeconds: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    buildSecs.asScala.toMap
  }

  /** Return `key`'s materialized table, building and landing it on first
    * use. `build` must be deterministic for the key (all inputs encoded
    * in the key), which every graft pipeline stage is by construction.
    */
  def table(s: SparkSession, key: String, build: => DataFrame): DataFrame = {
    val safe = key.map(c => if (c.isLetterOrDigit) c else '_')
    val path = s"$base/$safe"
    val lock = locks.computeIfAbsent(safe, _ => new Object)
    lock.synchronized {
      if (!built.contains(safe)) {
        val t0 = System.nanoTime()
        build.write.mode("overwrite").parquet(path)
        buildSecs.put(safe, (System.nanoTime() - t0) / 1e9)
        built.add(safe)
      }
    }
    s.read.parquet(path)
  }
}
