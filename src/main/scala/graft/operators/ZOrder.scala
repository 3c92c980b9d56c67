package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping — the
  * write-side layout lever for 100 TB scans: parquet stores per-file
  * (and per-row-group) min/max stats, and a reader prunes a file when
  * its stat range misses the predicate box. A layout sorted linearly on
  * one column prunes only that column's predicates; interleaving the
  * bits of TWO rank-normalized keys makes files tight boxes in BOTH
  * dimensions, so conjunctive range predicates skip most files.
  *
  * Built from public primitives only: rank-normalize each key to a
  * 16-bit grid (`percent_rank` window — one pass; at production scale
  * swap in approximate quantile boundaries), interleave bits with
  * codegen'd integer expressions, then `repartitionByRange` on the
  * z-value so each output file owns a contiguous z-range.
  */
object ZOrder {

  /** Bit-interleave two 16-bit grid coordinates into a 32-bit Morton
    * code (x in even bits, y in odd bits). Pure column math — codegen
    * folds it into the projection.
    */
  def interleave16(x: Column, y: Column): Column = {
    // spread 16 bits to even positions via the standard mask sequence
    def spread(c: Column): Column = {
      val a = c.cast("long")
      val s1 = (a.bitwiseOR(shiftleft(a, 8))).bitwiseAND(lit(0x00FF00FFL))
      val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
      val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
      (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
    }
    spread(x).bitwiseOR(shiftleft(spread(y), 1))
  }

  /** Add a `zval` column interleaving the rank-grids of `c1` and `c2`.
    * The ranks (not raw values) are interleaved so skewed domains still
    * fill the grid uniformly.
    *
    * REFERENCE formulation (single-partition `percent_rank` windows) —
    * kept as the test oracle for [[withZValueExactAtScale]], which is
    * bit-identical with no unpartitioned window over row-scale data and
    * is the formulation the gated path (q138) and [[cluster]] run.
    */
  def withZValue(df: DataFrame, c1: String, c2: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g1 = (percent_rank().over(Window.orderBy(col(c1))) * 65535).cast("long")
    val g2 = (percent_rank().over(Window.orderBy(col(c2))) * 65535).cast("long")
    df.withColumn("_g1", g1).withColumn("_g2", g2)
      .withColumn("zval", interleave16(col("_g1"), col("_g2")))
      .drop("_g1", "_g2")
  }

  /** EXACT rank grid with no single-partition window over row-scale
    * data — the distributed formulation of `floor(percent_rank() * 65535)`:
    *
    *  1. distinct-value CENSUS `(v, cnt)` — one hash agg, |distinct| rows;
    *  2. deterministic range bucket `pid` = #{approxQuantile boundaries
    *     ≤ v} — a pure monotone FUNCTION of v (never
    *     `spark_partition_id`, whose assignment could drift between the
    *     two consumers of the census), so every branch agrees;
    *  3. partition-LOCAL cumulative count: window partitioned by pid —
    *     parallel, each partition ≈ |distinct|/P census rows;
    *  4. per-pid totals → cumulative OFFSET via a window over ≤ P+1
    *     aggregated rows (the only unpartitioned window, input bounded
    *     by the shuffle-partition count, not the data);
    *  5. broadcast the offsets back: rank-below(v) = offset + local−cnt,
    *     and grid = floor(rank_below / (N−1) · 65535) — the same IEEE
    *     double chain `percent_rank` evaluates, hence bit-identical.
    *
    * Ties collapse into one census row, so rank-below is the competition
    * rank `percent_rank` uses, ties included. N = 1 yields grid 0 on
    * both paths (percent_rank's defined zero).
    */
  private def rankGrid(df: DataFrame, c: String, buckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def qcol: Column = col("`" + c.replace("`", "``") + "`")
    val census = df.select(qcol.as("_zv")).groupBy("_zv")
      .agg(count(lit(1)).as("_zcnt"))
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    // buckets=1 → no boundaries (approxQuantile NPEs on an empty probs
    // array); everything lands in pid 0 — degenerate but still exact
    val bs =
      if (probs.isEmpty) Array.empty[Double]
      else df.select(qcol.cast("double").as("_zq"))
        .stat.approxQuantile("_zq", probs, 0.01).distinct.sorted
    val pid =
      if (bs.isEmpty) lit(0)
      else size(filter(typedlit(bs.toSeq), b => b <= col("_zv").cast("double")))
    val local = census.withColumn("_zpid", pid)
      .withColumn("_zlcum",
        sum("_zcnt").over(Window.partitionBy("_zpid").orderBy("_zv")))
    val offsets = local.groupBy("_zpid").agg(sum("_zcnt").as("_zptot"))
      .withColumn("_zoff", coalesce(
        sum("_zptot").over(Window.orderBy("_zpid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_zn", sum("_zptot").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select("_zpid", "_zoff", "_zn")
    local.join(broadcast(offsets), Seq("_zpid"))
      .select(col("_zv"),
        when(col("_zn") > 1,
          floor((col("_zoff") + col("_zlcum") - col("_zcnt")) / (col("_zn") - 1)
            * 65535))
          .otherwise(lit(0L)).cast("long").as("_zg"))
  }

  /** [[withZValue]]'s bit-identical scale formulation: rank grids from
    * the distributed census-rank device ([[rankGrid]]) joined back onto
    * the rows — two value-key equi-joins (AQE broadcasts small censuses),
    * zero single-partition windows over anything row-scale.
    */
  def withZValueExactAtScale(
      df: DataFrame, c1: String, c2: String, buckets: Int = 32): DataFrame = {
    // drop("_zv") removes EVERY column with that name, so an input that
    // already carries one of the internal working names (or clusters a
    // column literally named _zv) would be silently corrupted — reject
    // it loudly instead.
    val clash = df.columns.toSet.intersect(Set("_zv", "_g1", "_g2", "zval"))
    require(clash.isEmpty,
      s"input schema uses reserved z-order column name(s): ${clash.mkString(", ")}")
    def qcol(c: String): Column = col("`" + c.replace("`", "``") + "`")
    val r1 = rankGrid(df, c1, buckets).withColumnRenamed("_zg", "_g1")
    val r2 = rankGrid(df, c2, buckets).withColumnRenamed("_zg", "_g2")
    // null-safe join keys: a null value row keeps its census row (grid 0
    // region) instead of being dropped by plain equality
    df.join(r1, qcol(c1) <=> r1("_zv")).drop("_zv")
      .join(r2, qcol(c2) <=> r2("_zv")).drop("_zv")
      .withColumn("zval", interleave16(col("_g1"), col("_g2")))
      .drop("_g1", "_g2")
  }

  /** Cluster `df` into `numFiles` z-contiguous shards (each output file
    * = one tight box in (c1, c2) space).
    */
  def cluster(df: DataFrame, c1: String, c2: String, numFiles: Int): DataFrame =
    withZValueExactAtScale(df, c1, c2)
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions("zval")

  /** The PRODUCTION formulation: grid coordinates from `approxQuantile`
    * boundaries instead of a global rank window — no single-partition
    * sort anywhere; the only driver action is the two GK-sketch quantile
    * passes (O(boundaries) result, the standard write-side pattern).
    * 8-bit grids (256 × 256 cells) are plenty for FILE-level min/max
    * boxes: resolution only needs to exceed the file count.
    */
  def clusterAtScale(
      df: DataFrame, c1: String, c2: String, numFiles: Int,
      gridBits: Int = 8): DataFrame = {
    require(gridBits >= 1 && gridBits <= 16, "gridBits must be in [1, 16]")
    val cells = 1 << gridBits
    val probs = (1 until cells).map(_.toDouble / cells).toArray
    // backtick-quote per Spark's convention (doubling embedded ticks) so
    // any legal column name resolves — names with dots, spaces, or
    // backticks must not break the write path
    def qcol(c: String): Column = col("`" + c.replace("`", "``") + "`")
    // project + rename BEFORE the quantile pass: approxQuantile parses
    // its name argument as an attribute path, which chokes on names
    // containing backticks/dots — a plain alias sidesteps parsing
    def bounds(c: String): Array[Double] =
      df.select(qcol(c).cast("double").as("_zq"))
        .stat.approxQuantile("_zq", probs, 0.001).distinct.sorted
    // grid index = number of boundaries ≤ x, built as COLUMNS (typedlit
    // boundary array + higher-order filter — ≤255 codegen'd comparisons
    // per row at the default grid), never spliced SQL text: a string
    // formulation breaks on quotable names and on the empty boundary
    // array an all-null/empty column yields from approxQuantile. With no
    // boundaries every row lands in cell 0 (one cell is the only honest
    // grid for a constant/empty domain); null values fail the predicate
    // and likewise land in cell 0.
    def gridded(c: String, bs: Array[Double]): Column =
      if (bs.isEmpty) lit(0L)
      else size(filter(typedlit(bs.toSeq),
        b => b <= qcol(c).cast("double"))).cast("long")
    val (b1, b2) = (bounds(c1), bounds(c2))
    df.withColumn("zval", interleave16(gridded(c1, b1), gridded(c2, b2)))
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions("zval")
  }
}
