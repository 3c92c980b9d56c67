package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-earlier) join — the order-book-enrichment operator the
  * reference's feed implies (match each event to the latest snapshot at or
  * before it; cf. /root/reference/README.md:45-51 snapshot protocol).
  *
  * Spark has no built-in as-of join (SURVEY.md §2B "Joins"). Rather than a
  * custom SparkPlan, this composes built-ins with the union + running-last
  * pattern:
  *
  *   1. tag right rows side=0, left rows side=1, null-pad each other's
  *      payload columns;
  *   2. union → single shuffle on the key, sort by (time, side) within
  *      partitions;
  *   3. `last(<right col>, ignoreNulls=true)` over rows UNBOUNDED
  *      PRECEDING..CURRENT ROW carries the latest right payload forward;
  *   4. keep side=1 rows.
  *
  * Scale rationale: ONE shuffle of |L|+|R| rows keyed by the join key and a
  * per-partition sort — never a row-explosion like the naive
  * `L JOIN R ON l.t >= r.t` + argmax (which is |L|×|R| per key before
  * filtering). Skewed keys are handled by AQE the same as any window.
  * Ties (left.time == right.time): right sorts first, so an exact-timestamp
  * match IS taken — standard backward as-of (`t_right <= t_left`).
  */
object AsOfJoin {

  /** Backward as-of join (nearest right row at or BEFORE each left row).
    * Output = all left columns + `carry` columns from `right` (renamed via
    * the map: rightCol -> outputName), null when no earlier right row
    * exists for the key — or none within `tolerance` (an SQL interval
    * string, e.g. "3 days"), when given.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      carry: Map[String, String],
      tolerance: Option[String] = None): DataFrame =
    asof(left, right, keys, leftTime, rightTime, carry, tolerance, fwd = false)

  /** Forward as-of join (nearest right row at or AFTER each left row) —
    * the pandas `merge_asof(direction="forward")` semantics; same output
    * contract as [[backward]].
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      carry: Map[String, String],
      tolerance: Option[String] = None): DataFrame =
    asof(left, right, keys, leftTime, rightTime, carry, tolerance, fwd = true)

  private def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      carry: Map[String, String],
      tolerance: Option[String],
      fwd: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val carryIn = carry.keys.toSeq

    // Null-padded union layout: keys ++ __t ++ leftPayload ++ __r, where
    // __r is ONE STRUCT holding the right row's own time plus every
    // carried column. The struct is what the running-last carries: it is
    // non-null for every right row even when individual carried VALUES
    // are null, so the match is always the nearest right ROW — carrying
    // each column independently with ignoreNulls would let a null value
    // on the nearest row fall through to an OLDER row's value (and then
    // pass the tolerance gate with the nearest row's time: merge_asof
    // matches rows, not columns). leftTime rides as __t only (NOT
    // duplicated in the payload — keeping it there would make the final
    // projection emit two identically-named time columns and fail
    // analysis with AMBIGUOUS_REFERENCE).
    val leftPayload = leftCols.filterNot(c => keys.contains(c) || c == leftTime)
    val rtType = right.schema(rightTime).dataType
    val rStructType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__rt", rtType) +:
        carryIn.map(c =>
          org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    val lSide = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side")) ++
        leftPayload.map(col) :+
        lit(null).cast(rStructType).as("__r"): _*)
    val rSide = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(col(rightTime).as("__rt") +: carryIn.map(c => col(c).as(c)): _*).as("__r"): _*)

    // Backward walks time ascending (running-last = latest right ≤ t);
    // forward walks it descending (running-last = earliest right ≥ t).
    // Ties (left.time == right.time): right sorts first either way, so an
    // exact-timestamp match IS taken. Among right rows sharing (key, __t),
    // the struct's own (lexicographic) order breaks the tie so `last`
    // always picks the same row (the max carry tuple) regardless of
    // partitioning.
    val timeOrd = if (fwd) col("__t").desc else col("__t").asc
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(timeOrd, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = lSide.unionByName(rSide)
      .select(
        (keys.map(col) ++ Seq(col("__t"), col("__side")) ++ leftPayload.map(col)) :+
          last(col("__r"), ignoreNulls = true).over(w).as("__r"): _*)

    // Tolerance: the carried match survives only if its own time is within
    // the interval of the left time — otherwise every carried column
    // reverts to null (exactly merge_asof's contract).
    val inTol: org.apache.spark.sql.Column = tolerance match {
      case None => lit(true)
      case Some(t) if fwd => col("__r.__rt") <= col("__t") + expr(s"INTERVAL $t")
      case Some(t) => col("__r.__rt") >= col("__t") - expr(s"INTERVAL $t")
    }

    carried
      .filter(col("__side") === 1)
      .select(
        (keys.map(col) ++ leftPayload.map(col) ++ Seq(col("__t").as(leftTime)) ++
          carry.toSeq.map { case (in, out) =>
            when(inTol, col(s"__r.$in")).otherwise(lit(null)).as(out)
          }): _*)
      // restore left column order, appended carry columns last
      .select((leftCols.map(col) ++ carry.values.toSeq.map(col)): _*)
  }
}
