package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Text
import graft.sources.Tables

/** The landed corpus stages (Materialize) are REWRITES of per-query
  * derivations — each test pins the landed table row-for-row against
  * the from-scratch computation it replaced, so a future edit to a
  * stage build can't silently drift every downstream consumer. (The
  * oracle gate would also catch it, but at the consumer level, 11
  * queries away from the cause.)
  */
class StageEquivalenceSpec extends SparkSpec {

  private def asSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("text_tf equals the raw token explode + groupBy it replaced") {
    val fromScratch = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("lang"),
        explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("source"), col("lang"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    assert(asSet(Text.tfStage(spark, sfDir)) == asSet(fromScratch))
  }

  test("text_bigram equals the raw adjacent-pair explode + groupBy") {
    val fromScratch = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w)-2), i -> concat_ws(' ', w[i], w[i+1]))"))
        .as("pair"))
      .groupBy(col("doc_id"), col("pair"))
      .agg(count(lit(1)).as("n"))
    assert(asSet(Text.bigramStage(spark, sfDir)) == asSet(fromScratch))
  }

  test("simhash cnt-weighted votes equal the per-occurrence ±1 votes") {
    // the landed build votes Σ_distinct-terms cnt·(±1); the original
    // spelling voted ±1 once per token occurrence — must be identical
    val perToken = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), Text.hash60(col("tok")).as("h"))
    val votes = (0 until 16).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"v$b")
    }
    val fromScratch = perToken.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 16).map(b =>
          when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash16"))
    assert(asSet(Text.simhashTable(spark, sfDir)) == asSet(fromScratch))
  }

  test("vec_knn landed truth equals a fresh brute-force run") {
    assert(asSet(graft.operators.Vectors.knnTruth(spark, sfDir, 5)) ==
      asSet(graft.operators.Vectors.knnBrute(spark, sfDir, 5)))
  }
}
