package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Vectors

/** Streaming twins of the embedding-modality operators — the vector side
  * of the story TextStreams tells for text: the same LSH construction the
  * batch queries land (q45/q69) gates a continuously-arriving embedding
  * stream against the existing corpus.
  */
object VectorStreams {

  /** Stream-static SEMANTIC near-dup gate — the vector twin of
    * [[TextStreams.nearDupGate]] (and the streaming face of batch
    * q45/q69's multi-table LSH): an arriving embedding is admitted only
    * if none of its `tables` sign-projection bucket keys collides with
    * the corpus bucket index. One stateless stream-static anti-join per
    * table — no state store, state never grows with the corpus; the
    * static side is the O(tables·2^bits) distinct bucket index, and the
    * stream side's bucket keys are per-row codegen'd `float_dot`
    * projections (no streaming aggregation).
    *
    * An exact duplicate shares every bucket by construction, so the LSH
    * layer subsumes a separate content-hash layer. Conservative like the
    * text gate: a bucket collision drops the doc without an exact-cosine
    * verify — precision traded for a stateless plan; recall of the drop
    * decision is the multi-table LSH recall the batch tests measure.
    */
  def nearDupGate(stream: DataFrame, corpus: DataFrame,
      tables: Int = 6, bits: Int = 3): DataFrame = {
    // landed once — the static side of a stream-static join re-evaluates
    // per micro-batch, and the fold anti-joins it `tables` times per
    // trigger (see TextStreams.nearDupGate)
    val idx = Vectors.bucketIndexOf(corpus, tables, bits).localCheckpoint(true)
    (0 until tables).foldLeft(stream) { (df, t) =>
      df.withColumn("b", Vectors.bucketCol(t, bits))
        .join(idx.filter(col("t") === t).select(col("b")),
          Seq("b"), "left_anti")
        .drop("b")
    }.select(col("vec_id"), col("eventTime"))
  }
}
