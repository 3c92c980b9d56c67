package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval/range join through BINNING — the standard scale rewrite for
  * `value BETWEEN lo AND hi` joins (the same idea behind Databricks'
  * range-join optimization and the time-binning in PAPERS.md's interval
  * join literature, built here from public primitives).
  *
  * Spark plans a raw non-equi join as BroadcastNestedLoopJoin (full
  * compare of every pair when the build side fits) or a cartesian — both
  * scale-killers. Binning turns it into an EQUI-join: each interval on
  * the right explodes into the ⌈width/binWidth⌉+1 bins it overlaps, the
  * left side computes its single bin, the join key is the bin, and the
  * original predicate is re-checked as a post-filter. Each matching pair
  * appears EXACTLY once (a left row has one bin), so no dedup pass is
  * needed. Shuffle volume: left rows once, right rows × bins-per-interval
  * — choose binWidth ≈ the typical interval width so that factor stays
  * ≤ 2–3.
  *
  * Reference analog: none (the reference joins nothing); this is the
  * §2B "range / interval join" row's 100 TB path beside the q18b window
  * rewrite (which needs a shared partition key; binning does not).
  */
object BinnedRangeJoin {

  /** Inner join of `left` and `right` on
    * `left(valueCol) BETWEEN right(loCol) AND right(hiCol)`, both sides
    * keyed through integer bins of `binWidth`. Column names must be
    * disjoint apart from the generated `_bin`.
    */
  def inner(
      left: DataFrame,
      right: DataFrame,
      valueCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Int): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binned = right.withColumn("_bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    left
      .withColumn("_bin", floor(col(valueCol) / binWidth).cast("long"))
      .join(binned, "_bin")
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("_bin")
  }
}
