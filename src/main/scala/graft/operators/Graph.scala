package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation — the
  * clustering step shared by every near-dup pipeline (text q67,
  * embeddings q69): pair lists say "these two match", retention needs the
  * transitive closure.
  *
  * Each round every node takes the min of its own label, its neighbors'
  * labels, and its label's label (pointer jumping / path halving, the
  * classic O(log diameter) accelerant — plain neighbor propagation
  * needs O(diameter) rounds and a loose similarity threshold produces
  * long CHAIN components, observed >20 deep on the sf0.1 embedding
  * graph). Everything is an equi-join plus a keyed min, hash-partitioned
  * by node — nothing corpus-sized is broadcast. The driver observes only
  * a scalar convergence count per round, and the final labels are
  * checkpointed so downstream actions never replay the loop.
  */
object Graph {

  /** `pairsIn` = two id columns (any names), one row per undirected edge.
    * Returns (`outCol`, cluster_id, is_canonical) for every node that
    * appears in a pair, cluster_id = min reachable id.
    */
  def connectedComponents(pairsIn: DataFrame, outCol: String): DataFrame = {
    // materialize the pair list before mirroring: both union branches
    // would replay the upstream candidate pipeline (measured 2x cost)
    val pairs = pairsIn.toDF("p1", "p2").localCheckpoint(true)
    val edges = pairs.union(pairs.select(col("p2"), col("p1")))
      .toDF("src", "dst").cache()
    // each round MUST checkpoint, not cache: the round-N plan references
    // round N-1 four times (self + neighbor join + two pointer-jump
    // sides), so with cache() the LOGICAL tree still grows 4^N and the
    // analyzer OOMs by round ~6 (observed); localCheckpoint flattens the
    // plan to a LogicalRDD each round
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("lab", col("node")).localCheckpoint(true)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 40) {
      val viaEdges = edges.join(labels, col("src") === col("node"))
        .select(col("dst").as("node"), col("lab"))
      val jumped = labels.join(labels.toDF("n2", "l2"), col("lab") === col("n2"))
        .select(col("node"), col("l2").as("lab"))
      val next = labels.union(viaEdges).union(jumped)
        .groupBy(col("node")).agg(min(col("lab")).as("lab")).localCheckpoint(true)
      converged = next.join(labels.withColumnRenamed("lab", "old"), "node")
        .filter(col("lab") < col("old")).isEmpty
      labels = next
      rounds += 1
    }
    require(converged, s"label propagation did not converge in $rounds rounds")
    val result = labels.select(col("node").as(outCol), col("lab").as("cluster_id"),
      (col("node") === col("lab")).as("is_canonical"))
      .orderBy(col(outCol))
      .localCheckpoint(true)
    edges.unpersist()
    result
  }
}
