package graft.operators

import graft.functions.CentroidAggregator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over embedding columns — the clustering
  * primitive of training-data CURATION: cluster-balanced sampling,
  * per-cluster dedup budgets, topic discovery over a corpus the
  * reference only moves as opaque bytes (`/root/reference/src/main.cpp:48-50`).
  * Deterministic BY CONSTRUCTION so an external engine can replay the
  * whole trajectory (that is what lets the DuckDB oracle gate q77):
  *
  *  - seeds: the k vectors with the smallest ids — the plain-SQL analog
  *    of seeded sampling; no RNG crosses the engine boundary;
  *  - assignment: each vector to the nearest centroid by squared
  *    EUCLIDEAN distance (ties to the smaller cluster id). One k-row
  *    broadcast; the argmin is a lexicographic struct-max aggregation,
  *    so it partial-aggregates map-side — one row per vector shuffles,
  *    never the n·k assignment stream;
  *  - update: per-dimension mean via the typed `CentroidAggregator`
  *    UDAF (one (sums, count) buffer per cluster per partition crosses
  *    the wire), then ROUNDED to 6 decimals. Snapping the trajectory
  *    makes every subsequent distance bit-reproducible across engines:
  *    cross-partition summation order is the only nondeterminism in an
  *    iteration, and the rounding absorbs it before it can compound.
  *
  * Scale notes (100 TB contract): per iteration — one scan of the
  * vector table, one k-row broadcast, one partial+final agg keyed by
  * cluster id. Nothing ever shuffles the embedding table; iteration
  * state is k rows, eagerly `localCheckpoint`ed so each round's
  * consumers read materialized centroids instead of replaying the
  * whole prior trajectory (the ConnectedComponents lineage lesson).
  * Empty clusters simply drop out of the centroid table (no
  * re-seeding), which keeps the trajectory a pure function of the
  * input.
  */
object KMeans {

  /** @param emb  DataFrame with `vec_id` (unique, orderable) and
    *             `embedding` (ArrayType(FloatType), equal lengths).
    * @param k    number of clusters (seeded from the k smallest ids).
    * @param iters Lloyd iterations; each is assign-then-update.
    * @return (assignments, centroids): assignments = (vec_id, cid,
    *         embedding) under the LAST update's centroids; centroids =
    *         (cid, cv) AFTER the last update (k or fewer rows).
    */
  def fit(emb: DataFrame, k: Int, iters: Int): (DataFrame, DataFrame) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val centroidOf = udaf(new CentroidAggregator)
    // split-count-gated spread (the q121/q73 treatment): scatter the
    // compute-bound assignment pass when the input is a one-file fixture
    // scan, pay no exchange when the scan already carries the parallelism
    val v = graft.Tables.spread(emb.select(col("vec_id"), col("embedding")))
    // seed centroids: exact double-widened copies of the k first vectors
    // (both engines widen float → double losslessly, so no rounding is
    // needed until the first computed update)
    var cents = v.orderBy("vec_id").limit(k)
      .select(row_number().over(Window.orderBy("vec_id")).cast("int").as("cid"),
        expr("transform(embedding, x -> cast(x as double))").as("cv"))
      .localCheckpoint(true)
    def assign(c: DataFrame): DataFrame =
      v.crossJoin(broadcast(c))
        // squared distance folds left-to-right in double — the same
        // association order as the oracle's list_distance, so with
        // snapped centroids the doubles are bit-identical across engines
        .withColumn("d2", expr(
          """aggregate(zip_with(embedding, cv,
            |            (x, y) -> (cast(x as double) - y) * (cast(x as double) - y)),
            |          0.0d, (acc, z) -> acc + z)""".stripMargin))
        // nearest centroid = lexicographic max of (-d2, -cid); embedding
        // rides in the struct and is never compared (-cid is unique)
        .groupBy("vec_id")
        .agg(max(struct((-col("d2")).as("nd"), (-col("cid")).as("nc"),
          col("embedding"))).as("b"))
        .select(col("vec_id"), (-col("b.nc")).as("cid"),
          col("b.embedding").as("embedding"))
    var asg: DataFrame = null
    for (_ <- 1 to iters) {
      asg = assign(cents)
      cents = asg.groupBy("cid")
        .agg(centroidOf(col("embedding")).as("c"))
        .select(col("cid"), expr("transform(c, x -> round(x, 6))").as("cv"))
        .localCheckpoint(true)
    }
    (asg, cents)
  }
}
