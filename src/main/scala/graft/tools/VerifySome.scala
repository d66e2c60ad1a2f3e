package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Optimization-round correctness tool: like [[graft.Verify]] but for a
  * SUBSET of queries — dump parquet + a filtered oracle_sql.json so
  * tools/check.py can oracle-check just the queries an optimization
  * touched, without the full 154-query sweep.
  *
  * Usage: runMain graft.tools.VerifySome <sfDir> <outDir> q94,q115,...
  * (short qNN prefix or full name, like SPARK_GRAFT_BENCH_ONLY).
  */
object VerifySome {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, onlyCsv) = args.take(3)
    val only = onlyCsv.split(",").map(_.trim).filter(_.nonEmpty).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.contains(n.takeWhile(_ != '_')) || only.contains(n))
    require(names.nonEmpty, s"no queries matched: $onlyCsv")
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1).write
        .mode("overwrite").parquet(s"$outDir/$name")
      println(s"[verifysome] dumped $name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => names.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
