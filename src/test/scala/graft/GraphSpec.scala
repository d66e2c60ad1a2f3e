package graft

import scala.util.Random

import graft.operators.Graph

/** Property test for the shared connected-components operator: on seeded
  * random graphs the distributed min-label propagation must agree with a
  * sequential union-find ground truth, and pointer jumping must close
  * long chains within the round budget.
  */
class GraphSpec extends SparkSpec {

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct.map(x => x -> find(x)).toMap
  }

  test("connected components == union-find on seeded random graphs") {
    import spark.implicits._
    (1 to 6).foreach { seed =>
      val rnd = new Random(seed)
      val n = 2 + rnd.nextInt(28)
      val edges = Seq.fill(1 + rnd.nextInt(40)) {
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        val expected = unionFind(edges)
        val got = Graph.connectedComponents(edges.toDF("a", "b"), "id")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === expected, s"seed=$seed edges=$edges")
      }
    }
  }

  /** Sequential replay of Graph.pageRank's exact integer recurrence. */
  private def seqPageRank(edges: Seq[(Long, Long)],
      iters: Int): Map[Long, (Long, Long)] = {
    val und = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = und.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var pr = deg.keys.map(_ -> 1000000L).toMap
    (1 to iters).foreach { _ =>
      val contrib = pr.map { case (n, r) => n -> r / deg(n) }
      val sums = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      und.foreach { case (src, dst) => sums(dst) += contrib(src) }
      pr = deg.keys.map(n => n -> (150000L + 850000L * sums(n) / 1000000L)).toMap
    }
    pr.map { case (n, r) => n -> (r, deg(n)) }
  }

  test("pageRank == sequential integer replay on seeded random graphs") {
    import spark.implicits._
    (1 to 4).foreach { seed =>
      val rnd = new Random(100 + seed)
      val n = 4 + rnd.nextInt(24)
      val edges = Seq.fill(5 + rnd.nextInt(50)) {
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val got = Graph.pageRank(edges.toDF("a", "b"), 5).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got === seqPageRank(edges, 5), s"seed=$seed edges=$edges")
    }
  }

  test("pageRank: hub of a star outranks its leaves") {
    import spark.implicits._
    val star = (1L to 8L).map(i => (0L, i))
    val got = Graph.pageRank(star.toDF("a", "b"), 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 8L).forall(i => got(0L) > got(i)),
      "the hub accumulates its leaves' full mass each round")
  }

  test("a long chain converges within the round budget (pointer jumping)") {
    import spark.implicits._
    // path graph 0-1-2-...-99: diameter 99 >> the 40-round budget under
    // plain neighbor propagation; pointer jumping must close it in O(log n)
    val chain = (0L until 99L).map(i => (i, i + 1))
    val got = Graph.connectedComponents(chain.toDF("a", "b"), "id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === 100)
    assert(got.forall(_._2 === 0L), "every chain node must label to the min id 0")
  }
}
