package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Sessions set `spark.sql.legacy.parquet.nanosAsLong`
    * (see GraftSession) so it arrives as LongType nanos; convert to
    * TimestampType by truncating to micros — exactly what DuckDB does
    * when it reads the same file, so oracle comparisons align.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    if (df.schema("ts").dataType == LongType)
      // Integer division: `/` on columns is double division, and 2024-epoch
      // nanosecond longs (~1.7e18) exceed double's 53-bit mantissa — ~12% of
      // rows would truncate to a different microsecond than DuckDB's exact
      // ns→µs integer truncation.
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
