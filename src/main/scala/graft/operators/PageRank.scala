package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge table — the graph-centrality
  * quality signal of web-corpus curation (Common-Crawl-style pipelines
  * rank hosts/pages by link centrality and keep the head of the
  * distribution). Deterministic BY CONSTRUCTION, the `KMeans` recipe:
  * no RNG, a fixed iteration count, and every iteration's rank vector
  * ROUNDED to 6 decimals so cross-partition summation order — the only
  * nondeterminism in an iteration — is absorbed before it can compound.
  * That is what lets the DuckDB oracle replay the identical trajectory
  * (q140 unrolls the iterations as CTEs).
  *
  * Formulation: SCALED ranks s = r·N (init 1.0), so
  * `s'(v) = (1-d) + d·Σ_{u→v} s(u)/outdeg(u)` — the N never appears and
  * values stay O(1), where 6-decimal snapping keeps ~6 significant
  * digits (unscaled ranks ~1/N would lose most of them).
  *
  * Scale shape (100 TB graph): per iteration — edges join the |V|-row
  * rank table on src (edges partitioned once by src and reused; only
  * the rank table re-shuffles), contributions partial-aggregate
  * map-side on dst, and the new rank vector left-joins the node list.
  * Iteration state is |V| rows, `localCheckpoint`ed to cut the
  * recursive lineage (the ConnectedComponents lesson; a production run
  * would use reliable `checkpoint` to survive executor loss). Nothing
  * driver-side, nothing quadratic; dangling-node mass never arises when
  * the caller symmetrizes the edge list (every node then has
  * outdegree ≥ 1).
  */
object PageRank {

  /** @param edges directed edge table with `src`, `dst` (any orderable
    *              type; callers symmetrize if they want the undirected
    *              semantic)
    * @param iters fixed Lloyd-style iteration count
    * @param d     damping factor (0.85 is the canonical choice)
    * @return (node, rank) — scaled ranks (mean 1.0 over nodes), 6-dp
    */
  def run(edges: DataFrame, iters: Int, d: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select("src", "dst").localCheckpoint(true)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    var ranks = nodes.withColumn("rank", lit(1.0))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          round(lit(1.0 - d) + lit(d) * coalesce(col("s"), lit(0.0)), 6).as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }

  /** Personalized PageRank (Haveliwala WWW'02): the teleport vector is
    * the SEED SET instead of uniform — rank mass flows only from the
    * seeds' neighborhoods, which is what "recommendations for this
    * cohort" / "related entities" actually query. Scaled so each seed
    * teleports 1.0 (total mass |S|, keeping ranks O(1) for the 6-dp
    * snap regardless of seed count).
    *
    * Same discipline as [[run]]: fixed iterations, 6-dp snap per
    * round (absorbs float-sum order across engines), lineage cut per
    * iteration; unreachable nodes stay exactly 0.0.
    *
    * @param seeds one-column (`node`) seed table, same type as edge
    *              endpoints
    */
  def runPersonalized(edges: DataFrame, seeds: DataFrame, iters: Int,
      d: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select("src", "dst").localCheckpoint(true)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint(true)
    // Seeds are UNIONED into the node set: an isolated seed (no
    // incident edges) still teleports 1.0 and gets a rank row, keeping
    // the documented "total mass |S|" invariant for any seed table.
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .union(seeds.select(col("node")))
      .distinct()
      .join(seeds.select(col("node")).distinct().withColumn("tele", lit(1.0)),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("tele"), lit(0.0)).as("tele"))
      .localCheckpoint(true)
    var ranks = nodes.select(col("node"), col("tele").as("rank"))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          round(lit(1.0 - d) * col("tele") + lit(d) * coalesce(col("s"), lit(0.0)), 6)
            .as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }
}
