package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Ad-hoc profiling entrypoint: time declared queries (or tf-idf
  * sub-stages with `--tfidf`) at sf0.1 on local[32].
  */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = GraftSession.configure(SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"$name ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
    }
    // warmup
    SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
    if (args.contains("--mh")) {
      import graft.operators.Text
      val docs = Tables.documents(spark, sfDir)
      time("shingles")(Text.shinglesOf(docs).count())
      time("shingles2")(Text.shinglesOf(docs).count())
      time("pairs_full")(Text.minhashLshPairs(spark, sfDir, 0.5).count())
      time("pairs_full2")(Text.minhashLshPairs(spark, sfDir, 0.5).count())
    } else if (args.contains("--cc")) {
      time("pairs67")(graft.operators.Text.minhashLshPairs(spark, sfDir, 0.5).count())
      time("q67")(graft.operators.Text.neardupClusters(spark, sfDir).count())
      time("pairs69")(graft.operators.Vectors.lshNearDup(spark, sfDir, 0.4).count())
      time("q69")(graft.operators.Vectors.embedClusters(spark, sfDir).count())
    } else if (args.contains("--tfidf")) {
      val docs = Tables.documents(spark, sfDir)
      val words = split(col("text"), " ")
      val terms = docs.select(col("doc_id"), explode(words).as("term"))
      time("terms")(terms.count())
      val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("cnt"))
      time("tf")(tf.count())
      val len = terms.groupBy(col("doc_id")).agg(count(lit(1)).as("len"))
      time("len")(len.count())
      val dfq = terms.distinct().groupBy(col("term")).agg(count(lit(1)).as("df"))
      time("df")(dfq.count())
      val joined = tf.join(len, "doc_id").join(broadcast(dfq), "term")
      time("joined")(joined.count())
    } else {
      for (n <- args.toSeq; rep <- 1 to 2) {
        time(s"$n rep$rep")(SparkEntry.queries(n)(spark, sfDir).count())
      }
    }
    spark.stop()
  }
}
