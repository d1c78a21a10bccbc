package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Property test for connected components against an independent
  * in-memory union-find reference model: random block-partitioned
  * graphs (each edge confined to its block, as single-assignment
  * candidate generators guarantee), random densities from isolated
  * pairs to near-cliques, duplicate and reversed edges, and a random
  * input partitioning each round. The blocked operator is checked
  * every round; the iterative operator joins on a subset of rounds
  * (it is correct on arbitrary graphs but costs driver-scheduled
  * rounds per call). Catches what fixed examples miss: chains whose
  * min id sits mid-chain, components merged through a late edge,
  * blocks with a single edge, and label stability under partitioning.
  */
class CcPropertySpec extends SparkTestBase {
  import spark.implicits._

  /** Plain-Scala union-find labeling: component = min id of the set. */
  private def model(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    parent.keys.map(x => x -> find(x)).toMap
  }

  test("blocked and iterative CC match the union-find model on random graphs") {
    val rnd = new Random(20260813L)
    for (round <- 1 to 12) {
      val nBlocks = 1 + rnd.nextInt(4)
      val raw = (0 until nBlocks).flatMap { b =>
        val base = b * 1000L
        val nNodes = 2 + rnd.nextInt(10)
        val nEdges = 1 + rnd.nextInt(nNodes * 2)
        (0 until nEdges).map { _ =>
          val a = base + rnd.nextInt(nNodes)
          var c = base + rnd.nextInt(nNodes)
          if (c == a) c = base + ((a - base + 1) % nNodes)
          (b, a, c)
        }
      }
      val expected = model(raw.map { case (_, a, c) => (a, c) })
      val pairs = raw.toDF("block", "id_a", "id_b")
        .repartition(1 + rnd.nextInt(5))
      val blocked = Dedup.connectedComponentsBlocked(pairs, "block")
        .as[(Long, Long)].collect().toMap
      assert(blocked === expected, s"blocked CC diverged in round $round")
      if (round % 4 == 0) {
        // smallGraphEdges = 0 forces the iterative rounds — otherwise
        // these toy graphs would take the small-graph fast path and the
        // comparison would be blocked-vs-blocked
        val iter = Dedup.connectedComponents(pairs.select("id_a", "id_b"),
          smallGraphEdges = 0)
          .as[(Long, Long)].collect().toMap
        assert(iter === expected, s"iterative CC diverged in round $round")
      }
    }
  }
}
