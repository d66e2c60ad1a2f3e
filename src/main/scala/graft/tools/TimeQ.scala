package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}
/** Dev utility: time named queries (comma-separated) N times each. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val Array(namesCsv, sfDir, reps) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- namesCsv.split(",") ; r <- 1 to reps.toInt) {
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[timeq] $n rep$r ${(System.nanoTime()-t0)/1e9}%.2fs rows=$c")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
