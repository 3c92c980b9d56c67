package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list —
  * the cluster-formation step of a near-dup dedup pipeline: pair
  * detectors (MinHash/SimHash/trigram banding, `queries/DedupQueries`)
  * emit EDGES (i ~ j means "near-duplicates"), but a training-data
  * pipeline keeps ONE survivor per transitive CLUSTER, so the pairs
  * must be closed into components first (the reference streams opaque
  * documents, `/root/reference/src/main.cpp:48-50`; dedup at cluster
  * granularity is what a corpus builder does downstream of it).
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with its own id; each round every node takes the minimum of
  * its label and its neighbors' labels; a fixpoint means every node
  * carries the minimum id reachable from it — the canonical component
  * id. Each round is one shuffled equi-join (edges ⋈ labels on the
  * neighbor id) plus one partial+final min-aggregation — exactly the
  * shapes Spark scales: no driver-side graph, no collect, state is a
  * (node, label) table partitioned by node.
  *
  * Scale notes (100 TB contract):
  *  - rounds = graph DIAMETER. Near-dup clusters are small and dense
  *    (a duplicated document transitively links its copies), so the
  *    diameter is single-digit and the loop terminates in a handful of
  *    shuffles. For adversarial long-chain graphs the round count is
  *    O(diameter); the published fix is alternating large-star/
  *    small-star (Kiveris et al., "Connected Components in MapReduce
  *    and Beyond", SoCC '14) which converges in O(log² n) rounds with
  *    the same per-round join shape — the swap is local to this file.
  *  - lineage is cut every round with an EAGER `localCheckpoint`:
  *    without it the plan doubles per iteration and Catalyst analysis
  *    time, not the data, becomes the bottleneck (on a cluster with a
  *    configured checkpoint dir, `checkpoint()` is the durable
  *    equivalent).
  *  - convergence is detected with a `count` of changed labels — a
  *    scalar per-round action (the standard iterative-algorithm
  *    driver loop), never a data collect.
  *  - measured (round 5, local[4]): 200k random edges over 100k nodes
  *    — a giant-component graph, diameter ≈ log n, the adversarial
  *    case for min-propagation — converges to 61 components in ~20 s
  *    (~12 rounds). Near-dup clusters have single-digit diameter, so
  *    the production case is 2–3 rounds.
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame (`src`, `dst`) of undirected
    *              edges (one direction suffices; self-loops and
    *              duplicates are tolerated).
    * @param maxIter round budget for min-label propagation (= max graph
    *              diameter it will close by itself).
    * @param starFallback when min-label exhausts `maxIter` without
    *              converging (diameter > maxIter), hand the remaining
    *              closure to `runAlternating` (O(log² n) rounds,
    *              diameter-independent) instead of aborting. The partial
    *              min-label fixpoint is NOT discarded: the alternating
    *              pass runs on the label graph, whose components are
    *              exactly the original ones.
    * @return (`id`, `component`) for every node incident to an edge,
    *         where `component` = min node id in the node's component.
    */
  def run(edges: DataFrame, maxIter: Int = 50, starFallback: Boolean = true): DataFrame = {
    val src = col("src")
    val dst = col("dst")
    // Symmetrize once; both directions are needed so a min can flow
    // either way across an edge. Checkpointed because it is re-joined
    // every round.
    val e = edges.select(src, dst)
      .union(edges.select(dst.as("src"), src.as("dst")))
      .filter(src =!= dst)
      .distinct()
      .localCheckpoint(true)

    var labels = e.select(src.as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)

    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // min over neighbors' labels, one hop
      val nbrMin = e.join(labels, e("dst") === labels("id"))
        .groupBy(e("src").as("nid"))
        .agg(min("component").as("nbr_min"))
      val next = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr_min"), col("component"))).as("component"),
          col("component").as("prev"))
        .localCheckpoint(true)
      changed = next.filter(col("component") < col("prev")).count()
      labels = next.select("id", "component")
      iter += 1
    }
    if (changed > 0 && starFallback) {
      // Diameter exceeded the round budget. Every (id, label) pair
      // learned so far is a correct same-component shortcut, so the
      // union of the original edges and the label edges has EXACTLY the
      // original components — hand that graph to the alternating
      // algorithm, which closes any residual distance in O(log² n)
      // rounds regardless of diameter.
      runAlternating(
        e.union(labels.select(col("id").as("src"), col("component").as("dst"))))
    } else {
      require(changed == 0,
        s"connected components did not converge within $maxIter rounds " +
          "(graph diameter exceeds maxIter — raise it or enable starFallback)")
      labels
    }
  }

  /** Alternating large-star/small-star rounds (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC '14, §3):
    * converges in O(log² n) rounds INDEPENDENT of graph diameter, with
    * the same per-round shapes as min-label propagation (one shuffled
    * equi-join + one min-agg), so it scales the same way — it just
    * rewrites edges toward component minima instead of propagating
    * labels hop by hop.
    *
    *  - large-star: every node v ∈ Γ(u) with v > u is re-linked to
    *    m(u) = min(Γ(u) ∪ u). Strictly-larger-only keeps the step
    *    acyclic (no two nodes swap places), so connectivity is preserved
    *    while long chains fold in half.
    *  - small-star: edges are oriented big→small; every smaller
    *    neighbor (and u itself) is linked to m(u). At the joint fixpoint
    *    the edge set is a forest of stars centered at component minima
    *    (paper, Thm 1), which IS the answer.
    *
    * Convergence is detected by the edge set reaching a fixpoint
    * (two-sided `except` count — per-round scalar actions on a set that
    * only shrinks toward n − #components edges). Per-round
    * `localCheckpoint` cuts lineage exactly as in `run`.
    */
  def runAlternating(edges: DataFrame, maxIter: Int = 60): DataFrame = {
    val src = col("src")
    val dst = col("dst")
    def canon(df: DataFrame): DataFrame =
      df.select(least(src, dst).as("src"), greatest(src, dst).as("dst"))
    var e = canon(edges.select(src, dst).filter(src =!= dst))
      .distinct()
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // large-star: (v, m(u)) for every v ∈ Γ(u), v > u
      val sym = e.union(e.select(dst.as("src"), src.as("dst")))
      val mins = sym.groupBy("src")
        .agg(min("dst").as("mn"))
        .select(src.as("u"), least(src, col("mn")).as("m"))
      val ls = sym.filter(dst > src)
        .join(mins, sym("src") === col("u"))
        .select(dst.as("src"), col("m").as("dst"))
        .filter(src =!= dst)
        .distinct()
      // small-star: orient big→small, link every smaller neighbor and
      // the center itself to m(u)
      val oriented = ls.select(greatest(src, dst).as("src"), least(src, dst).as("dst"))
      val mins2 = oriented.groupBy("src").agg(min("dst").as("m"))
      val ss = oriented.join(mins2, "src")
        .select(dst.as("src"), col("m").as("dst"))
        .union(mins2.select(src, col("m").as("dst")))
        .filter(src =!= dst)
        .distinct()
      val next = canon(ss).distinct().localCheckpoint(true)
      changed = next.exceptAll(e).count() + e.exceptAll(next).count()
      e = next
      iter += 1
    }
    require(changed == 0,
      s"alternating connected components did not converge within $maxIter rounds")
    // fixpoint = stars centered at component minima; `e` is kept in
    // canonical (min, max) orientation, so src IS the center: it is the
    // component id for every leaf (dst) and for itself
    e.select(dst.as("id"), src.as("component"))
      .union(e.select(src.as("id"), src.as("component")))
      .distinct()
  }
}
