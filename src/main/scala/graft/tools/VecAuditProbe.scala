// Throwaway-grade diagnostic: sampled vector-audit path counts at a
// rehearsal corpus (sample size, sampled exact-truth pairs, q106 rows).
//   sbt "runMain graft.tools.VecAuditProbe /tmp/gensf/sf1"
package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.{Text, Vectors}
import graft.sources.Tables

object VecAuditProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "vec-audit-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/tmp/gensf/sf1"
    val n = Tables.embeddings(spark, dir).count()
    val mod = if (args.length > 1) args(1).toInt else Vectors.vecSampleModOf(n)
    val base = Tables.embeddings(spark, dir)
      .withColumn("nsq", Vectors.dot("embedding", "embedding"))
      .filter(Text.hash60(col("vec_id").cast("string")) % mod === 0)
    println(s"[vecprobe] $dir nvec=$n mod=$mod sampled=${base.count()}")
    val truth = Vectors.embedNearDupBuildOf(base, 0.4, 8, 8)
    println(s"[vecprobe] truth_pairs=${truth.count()}")
    val cent = base.orderBy(col("vec_id")).limit(8)
    println(s"[vecprobe] cent=${cent.count()} ids=" +
      cent.select(col("vec_id")).collect().map(_.getLong(0)).mkString(","))
    // brute among sample, tiny: all-pairs via broadcast nested loop
    val sml = base.select(col("vec_id"), col("embedding"), col("nsq")).cache()
    val bf = sml.toDF("id1", "e1", "n1")
      .crossJoin(sml.toDF("id2", "e2", "n2"))
      .filter(col("id1") < col("id2"))
      .withColumn("cos", round(expr("float_dot(e1, e2)") / sqrt(col("n1") * col("n2")), 6))
      .filter(col("cos") >= 0.4)
    println(s"[vecprobe] brute_pairs=${bf.count()}")
    println("[vecprobe] q106:")
    Vectors.lshRecallSweep(spark, dir).show(30, false)
    spark.stop()
  }
}
