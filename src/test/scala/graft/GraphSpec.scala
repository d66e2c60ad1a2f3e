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
