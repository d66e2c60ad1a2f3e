package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Optimization-round measurement tool (guide §1): split a query's warm
  * wall time into DRIVER phases — DataFrame construction (query-function
  * call), analysis+optimization+physical planning (forcing
  * `executedPlan`), and execution (noop write, same action the bench
  * times). Separates driver-bound queries (planning dominates) from
  * executor-bound ones (execution dominates), which need different
  * optimizations.
  *
  * Usage: runMain graft.tools.PhaseProbe q105_market_share [more...]
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_STATS_REPS", "3").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    args.foreach { name =>
      (1 to reps).foreach { r =>
        val (df, tBuild) = t(SparkEntry.queries(name)(spark, sfDir))
        val (_, tPlan) = t(df.queryExecution.executedPlan)
        val (_, tExec) = t(df.write.format("noop").mode("overwrite").save())
        println(f"[phase] $name rep$r build=$tBuild%.2f plan=$tPlan%.2f exec=$tExec%.2f total=${tBuild + tPlan + tExec}%.2f")
      }
    }
    spark.stop()
  }
}
