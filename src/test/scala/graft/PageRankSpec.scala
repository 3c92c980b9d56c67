package graft

import graft.operators.PageRank
import org.scalatest.funsuite.AnyFunSuite

/** PageRank trajectory semantics: the operator must reproduce a plain
  * in-memory power iteration with the SAME per-iteration 6-dp snapping
  * (that equality is what the q140 oracle re-derives in SQL), conserve
  * scaled-rank mass on symmetric graphs, and be invariant to input
  * partitioning (the snapping's whole job).
  */
class PageRankSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def reference(edges: Seq[(Long, Long)], iters: Int,
      d: Double = 0.85): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val in = edges.groupBy(_._2)
    def snap(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var r = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      r = nodes.map { v =>
        val s = in.getOrElse(v, Nil).map { case (u, _) => r(u) / out(u) }.sum
        v -> snap(1.0 - d + d * s)
      }.toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int,
      parts: Int = 4): Map[Long, Double] =
    PageRank.run(edges.toDF("src", "dst").repartition(parts), iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("matches the snapped power iteration on a hand graph (incl. a dangling node)") {
    // 1→2→3→1 cycle, 4→2 chord, 5 dangling source (out-edge only)
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 2L, 5L -> 4L)
    val got = run(edges, 5)
    val want = reference(edges, 5)
    assert(got.keySet == want.keySet)
    want.foreach { case (n, w) =>
      assert(got(n) == w, s"node $n: ${got(n)} != $w") // exact: both snapped
    }
    // sink-less chain means node 5 keeps only the teleport mass
    assert(got(5L) == 0.15)
  }

  test("conserves scaled mass on a symmetric graph (fixed point Σ = |V|)") {
    val e0 = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L)
    val sym = e0 ++ e0.map(_.swap)
    val got = run(sym, 8)
    val total = got.values.sum
    assert(math.abs(total - got.size) < 1e-3,
      s"scaled mass $total drifted from |V|=${got.size}")
  }

  test("invariant to input partitioning") {
    val e0 = (1L to 40L).flatMap(i => Seq(i -> (i % 7 + 100L), (i % 7 + 100L) -> i))
    assert(run(e0, 4, parts = 1) == run(e0, 4, parts = 13))
  }

  test("personalized: mass stays in the seed component, unreachable nodes exactly 0") {
    // two disconnected symmetric components: {1,2,3} and {10,11}
    val e0 = Seq(1L -> 2L, 2L -> 3L, 10L -> 11L)
    val sym = (e0 ++ e0.map(_.swap)).toDF("src", "dst")
    val got = PageRank.runPersonalized(sym, Seq(1L).toDF("node"), iters = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(10L) == 0.0 && got(11L) == 0.0,
      s"unreachable component leaked rank: $got")
    assert(got(1L) > got(3L) && got(1L) > 0.15,
      s"seed should dominate its component: $got")
    assert(got(2L) > 0.0 && got(3L) > 0.0, s"reachable nodes must rank: $got")
  }
}
