package graft.tools

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Optimization-round measurement tool (guide §1): per-query COST metrics
  * that hypervisor steal cannot contaminate — executor CPU seconds, task
  * count, shuffle bytes read/written, spill — plus wall seconds for
  * context. Wall time on this host carries 10-40% steal bursts; CPU time
  * and shuffle bytes are the stable optimization signal between full-bench
  * runs on quiet windows.
  *
  * Usage: runMain graft.tools.QueryStats q94_sole_return_supplier [more...]
  * Each query runs `reps` times (SPARK_GRAFT_STATS_REPS, default 2); the
  * FIRST rep is discarded (codegen + landed-stage builds), metrics printed
  * per rep.
  */
object QueryStats {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_STATS_REPS", "2").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicLong
    val stages = new AtomicLong
    val tasks = new AtomicLong
    val cpuNs = new LongAdder
    val runMs = new LongAdder
    val shufR = new LongAdder
    val shufW = new LongAdder
    val spill = new LongAdder
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = te.taskMetrics
        if (m != null) {
          cpuNs.add(m.executorCpuTime)
          runMs.add(m.executorRunTime)
          shufR.add(m.shuffleReadMetrics.totalBytesRead)
          shufW.add(m.shuffleWriteMetrics.bytesWritten)
          spill.add(m.memoryBytesSpilled + m.diskBytesSpilled)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0)
      cpuNs.reset(); runMs.reset(); shufR.reset(); shufW.reset(); spill.reset()
    }

    val names = args.toSeq
    names.foreach { name =>
      for (rep <- 1 to reps) {
        reset()
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        // listener events are async; give the bus a beat before reading
        Thread.sleep(300)
        println(f"[stats] $name rep$rep wall=$wall%.2f cpu=${cpuNs.sum / 1e9}%.2f " +
          f"run=${runMs.sum / 1e3}%.2f jobs=${jobs.get} stages=${stages.get} " +
          f"tasks=${tasks.get} shufR=${shufR.sum / 1e6}%.1fMB " +
          f"shufW=${shufW.sum / 1e6}%.1fMB spill=${spill.sum / 1e6}%.1fMB rows=$rows")
      }
    }
    spark.stop()
  }
}
