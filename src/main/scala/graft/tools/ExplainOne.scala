package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import graft.{GraftSession, SparkEntry}
/** Dev utility: print ONE registry query's formatted physical plan (and,
  * with a second `exec` arg, the final AQE plan after running it). */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sfDir = args(1)
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[8]"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(df.queryExecution.explainString(FormattedMode))
    if (args.length > 2 && args(2) == "exec") {
      df.collect(): Unit
      println("==== EXECUTED ====")
      println(df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0))
    }
    spark.stop()
  }
}
