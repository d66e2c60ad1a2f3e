package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}
/** Dev utility: dump ONE registry query's result parquet for a targeted
  * tools/check.py run (full Verify takes ~4 min; this takes seconds). */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[8]"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir).coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/$name")
    spark.stop()
  }
}
