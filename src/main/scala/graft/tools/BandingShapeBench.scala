// Throwaway-grade diagnostic: price the per-row banding EXPRESSION
// shapes in batch (the stream pays the same projection per row).
//   sbt "runMain graft.tools.BandingShapeBench"   (SPARK_GRAFT_SF_DIR)
package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Text

object BandingShapeBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "banding-shape")
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/gensf/sf1")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b).as("band"), Text.bandSigCol(b).as("sig"))
    }
    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        val n = df.select(col("doc_id"), explode(col("bs")).as("b"))
          .select(hash(col("b.sig"), col("doc_id")).as("h"))
          .agg(sum(col("h"))).collect()(0).getLong(0)
        println(f"[shape] $name rep$rep ${(System.nanoTime() - t0) / 1e9}%.2fs hash=$n")
      }
    }
    val all = sys.env.getOrElse("SPARK_GRAFT_SHAPES", "all") == "all"
    // the ADMIT shape as shipped: hs and the band array both under when()
    if (all) time("admit_when") {
      docs
        .withColumn("w", split(col("text"), " "))
        .withColumn("hs", when(size(col("w")) >= 3, Text.shingleHashes))
        .withColumn("bs",
          when(size(col("w")) >= 3, array(bandStructs: _*))
            .otherwise(array(struct(lit(-1).as("band"),
              concat(lit("short|"), col("doc_id")).as("sig")))))
    }
    // the COLLISIONS shape: unconditional hs column, unconditional array
    if (all) time("collisions_plain") {
      docs
        .withColumn("w", split(col("text"), " "))
        .filter(size(col("w")) >= 3)
        .withColumn("hs", Text.shingleHashes)
        .withColumn("bs", array(bandStructs: _*))
    }
    // candidate fix: unconditional hs (its own CASE guards shorts),
    // conditional ONLY on the cheap final array swap
    if (all) time("admit_hs_plain") {
      docs
        .withColumn("w", split(col("text"), " "))
        .withColumn("hs", Text.shingleHashes)
        .withColumn("bs",
          when(size(col("w")) >= 3, array(bandStructs: _*))
            .otherwise(array(struct(lit(-1).as("band"),
              concat(lit("short|"), col("doc_id")).as("sig")))))
    }
    // explode FIRST: Generate sits between the hs project and the sig
    // project, so CollapseProject cannot inline the md5 pipeline into
    // the 8 minhash references — hs evaluates once per doc
    def timeExploded(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        val n = df.select(hash(col("sig"), col("doc_id")).as("h"))
          .agg(sum(col("h"))).collect()(0).getLong(0)
        println(f"[shape] $name rep$rep ${(System.nanoTime() - t0) / 1e9}%.2fs hash=$n")
      }
    }
    val sigFromBand = (0 until 4).map(b =>
      when(col("band") === b, Text.bandSigCol(b)))
      .reduce((a, b) => coalesce(a, b))
    timeExploded("explode_first") {
      docs
        .withColumn("w", split(col("text"), " "))
        .filter(size(col("w")) >= 3)
        .withColumn("hs", Text.shingleHashes)
        .select(col("doc_id"), col("hs"),
          explode(array((0 until 4).map(lit(_)): _*)).as("band"))
        .withColumn("sig", sigFromBand)
    }
    // 1:1 Generate barrier: explode of a single-element array — same
    // row count, but CollapseProject cannot inline hs past the Generate
    time("hs_barrier") {
      docs
        .withColumn("w", split(col("text"), " "))
        .filter(size(col("w")) >= 3)
        .withColumn("hs", explode(array(Text.shingleHashes)))
        .withColumn("bs", array(bandStructs: _*))
    }
    time("hs_barrier_when") {
      docs
        .withColumn("w", split(col("text"), " "))
        .withColumn("hs", explode(array(Text.shingleHashes)))
        .withColumn("bs",
          when(size(col("w")) >= 3, array(bandStructs: _*))
            .otherwise(array(struct(lit(-1).as("band"),
              concat(lit("short|"), col("doc_id")).as("sig")))))
    }
    val planed = docs
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= 3)
      .withColumn("hs", Text.shingleHashes)
      .withColumn("bs", array(bandStructs: _*))
      .select(col("doc_id"), explode(col("bs")).as("b"))
    val plan = planed.queryExecution.executedPlan.toString
    println(s"[shape] plain plan md5 count: " +
      s"${plan.sliding(4).count(_ == "md5(")}")
    spark.stop()
  }
}
