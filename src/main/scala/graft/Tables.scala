package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet fixture tables (TESTDATA.md /
  * FIXTURES.md). Schemas are read from parquet footers — no schema is
  * imposed here, so partition pruning / predicate pushdown / column
  * pruning all flow from the scan (verify with `.explain("formatted")`:
  * `PushedFilters` + `ReadSchema` must reflect the query, SURVEY.md §4.2).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Footer-schema read + one normalization: any TIMESTAMP_NTZ column is
    * cast to session-local TimestampType. The driver has regenerated the
    * fixtures across rounds with different physical timestamp encodings
    * (TIMESTAMP(MILLIS, UTC) → TimestampType, then TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) → TimestampNTZType); the whole query surface
    * — watermarks, `java.sql.Timestamp` encoders, oracle comparisons —
    * was built against TimestampType. With the session timezone pinned
    * to UTC (GraftSession) the cast reinterprets the naive wall-clock as
    * the same UTC instant DuckDB reads from the same file, so this is a
    * type normalization, not a value change. The cast is a projection on
    * top of the scan — column pruning and predicate pushdown still reach
    * the parquet reader (timestamp pushdown happens post-cast either way).
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    val ntz = df.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }
    ntz.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(TimestampType)))
  }

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** `events.ts` must arrive downstream as session-local TimestampType —
    * the streaming surface (`withWatermark`, stream–stream joins,
    * `flatMapGroupsWithState` over `java.sql.Timestamp` encoders) rejects
    * TIMESTAMP_NTZ outright, and the fixture's physical type has changed
    * across driver regenerations. Normalize every footer variant here:
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; sessions
    *    set `spark.sql.legacy.parquet.nanosAsLong` (GraftSession) so it
    *    arrives as LongType nanos → truncate to micros with INTEGER
    *    division (`/` on columns is double division, and 2024-epoch
    *    nanosecond longs ~1.7e18 exceed double's 53-bit mantissa — ~12%
    *    of rows would land on a different microsecond than DuckDB's exact
    *    ns→µs integer truncation);
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ: already
    *    normalized by `load` (every NTZ column is cast to TimestampType
    *    there, for all tables), so by the time this dispatch runs the
    *    only variant left to handle is the NANOS-as-long one.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Split-count-GATED fan-out (the q121 treatment, shared): repartition
    * only when the input plans fewer partitions than the session's
    * parallelism. A one-file fixture scan fans out to the cores; a
    * 100 TB scan with thousands of splits pays NO full exchange
    * (plan-asserted in `PlanShapeSpec`: the q73/q75/q121 cores over a
    * pre-spread input produce zero round-robin exchanges). Caveat: the
    * probe (`df.rdd.getNumPartitions`) physically plans the lineage on
    * each call and under AQE coalescing can report a different count
    * than the SQL scan's splits — so callers pass the BARE table scan
    * (scan-only plans have no exchanges for AQE to coalesce), and the
    * table-scan probes below memoize the count per (session, dir).
    */
  def spread(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= par) df else df.repartition(par)
  }

  /** Memoized split count of a fixture table scan — the probe forces a
    * physical plan of the scan, so pay it once per (session, dir, table)
    * rather than once per query build (q73/q73b/q75/q121 all gate on it).
    */
  private val scanSplits =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), Integer]()

  private def spreadOf(spark: SparkSession, dir: String, name: String,
                       df: DataFrame): DataFrame = {
    val n: Int = scanSplits.computeIfAbsent(
      (System.identityHashCode(spark), dir, name),
      _ => df.rdd.getNumPartitions)
    if (n >= spark.sparkContext.defaultParallelism) df
    else df.repartition(spark.sparkContext.defaultParallelism)
  }

  /** [[documents]] spread through the split-count gate with the probe
    * memoized — the full-text pipelines and every per-document kernel
    * query start here. A projection applied AFTER the spread still
    * prunes columns at the scan (ColumnPruning pushes Projects through
    * Repartition).
    */
  def documentsSpread(spark: SparkSession, dir: String): DataFrame =
    spreadOf(spark, dir, "documents", documents(spark, dir))

  /** [[events]] through the same gate (sketch-kernel aggregations). */
  def eventsSpread(spark: SparkSession, dir: String): DataFrame =
    spreadOf(spark, dir, "events", events(spark, dir))

  /** [[embeddings]] through the same gate (vector-kernel queries that
    * don't route via `IvfAnn.preppedEmb`). */
  def embeddingsSpread(spark: SparkSession, dir: String): DataFrame =
    spreadOf(spark, dir, "embeddings", embeddings(spark, dir))
}
