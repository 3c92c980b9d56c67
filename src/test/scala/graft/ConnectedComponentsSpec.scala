package graft

import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Connected components (min-label propagation) vs an in-memory
  * union-find reference on seeded random graphs, plus the structural
  * edge cases: long chains (diameter = rounds), duplicate/reversed/
  * self-loop edges, and multi-component forests.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** Union-find ground truth: node -> min id of its component. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // roots are already component minima because unions always hang the
    // larger root under the smaller one
    nodes.map(n => n -> find(n)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches union-find on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 60 + trial * 20
      val edges = Seq.fill(n) {
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)
      }.filter { case (a, b) => a != b }
      assert(run(edges) == unionFind(edges), s"trial $trial diverged")
    }
  }

  test("long chain converges to one component (diameter = rounds)") {
    val chain = (0L until 30L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got.values.toSet == Set(0L), "chain should collapse to component 0")
    assert(got.size == 31)
  }

  test("tolerates duplicate, reversed, and self-loop edges") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (3L, 4L), (9L, 9L))
    val got = run(edges)
    // 9 has only a self-loop: it is dropped by symmetrize-filter, so the
    // contract covers nodes incident to a REAL edge
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  private def runAlt(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.runAlternating(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("alternating large-star/small-star matches union-find on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val edges = Seq.fill(80 + trial * 20) {
        (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong)
      }.filter { case (a, b) => a != b }
      assert(runAlt(edges) == unionFind(edges), s"trial $trial diverged")
    }
  }

  test("alternating keeps disjoint components and handles chains + stars") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (12L, 10L), (20L, 21L))
    assert(runAlt(edges) == unionFind(edges))
  }

  test("chain longer than the min-label budget converges via the star fallback") {
    // 5000-node path: diameter 4999 — min-label propagation would need
    // 4999 rounds; with maxIter=8 the fallback must close it in
    // O(log² n) alternating rounds.
    val chain = (0L until 4999L).map(i => (i, i + 1))
    val got = ConnectedComponents.run(chain.toDF("src", "dst"), maxIter = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 5000)
    assert(got.values.toSet == Set(0L), "chain should collapse to component 0")
  }

  test("keeps disjoint components apart") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 20L))
    val got = run(edges)
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }
}
