// Diagnostic: measure WHERE q35's serving-LSH cost concentrates as the
// corpus grows, to size the corpus-derived banding (the text twin of
// Vectors.scaleBits/scaleTables) from numbers instead of guesses.
//
//   sbt "runMain graft.tools.LshOccupancyProbe /tmp/gensf/sf1 /tmp/gensf/sf10"
//
// Per corpus it prints, for each candidate rows-per-band depth r:
//   - band-0 bucket count, max occupancy, and Σ c(c−1)/2 (the EXACT
//     row count the band self-join would emit for that band)
// and, independently of banding:
//   - the shingle-value co-occurrence mass Σ c_sh(c_sh−1)/2 — the row
//     count of an intersection join keyed on the raw shingle string
//     (bounded-vocab corpora cap distinct shingles at |V|³, so this
//     mass grows n²/|V|³ no matter how selective the banding is).
package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Text

object LshOccupancyProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "lsh-occupancy")
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/tmp/gensf/sf1", "/tmp/gensf/sf10")
    val P = 1073741789L
    dirs.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()
      println(s"[probe] $dir docs=$n")
      val sh = docs
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"), explode(array_distinct(expr(
          "transform(sequence(0, size(w)-3), i -> concat_ws(' ', slice(w, i+1, 3)))"
        ))).as("sh"))
        .localCheckpoint(true)
      val shStats = sh.groupBy(col("sh")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("distinct_sh"), max(col("c")).as("max_c"),
          sum(col("c") * (col("c") - 1) / 2).as("pair_mass"),
          sum(col("c")).as("rows")).collect()(0)
      println(s"[probe] $dir shingles: rows=${shStats.get(3)} " +
        s"distinct=${shStats.get(0)} maxDocsPerShingle=${shStats.get(1)} " +
        s"intersectJoinMass=${shStats.get(2)}")
      // 16 seeded minhashes in one pass (j 0..15 of the shared family)
      val shh = sh.select(col("doc_id"),
        (Text.hash60(col("sh")) % P).as("h"))
      val mh = shh.groupBy(col("doc_id"))
        .agg((0 until 16).map(j =>
          min((lit(Text.mhA(j)) * col("h") + lit(Text.mhB(j))) % P)
            .as(s"mh$j")).head,
          (0 until 16).map(j =>
            min((lit(Text.mhA(j)) * col("h") + lit(Text.mhB(j))) % P)
              .as(s"mh$j")).tail: _*)
        .localCheckpoint(true)
      (2 to 8).foreach { r =>
        val sig = concat_ws("_", (0 until r).map(j => col(s"mh$j")): _*)
        val st = mh.groupBy(sig.as("sig")).agg(count(lit(1)).as("c"))
          .agg(count(lit(1)).as("buckets"), max(col("c")).as("max_c"),
            sum(col("c") * (col("c") - 1) / 2).as("pair_mass")).collect()(0)
        println(s"[probe] $dir r=$r band0: buckets=${st.get(0)} " +
          s"maxOcc=${st.get(1)} selfJoinPairs=${st.get(2)}")
      }
    }
    spark.stop()
  }
}
