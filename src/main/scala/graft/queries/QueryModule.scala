package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of engine queries plus their DuckDB oracle SQL.
  *
  * Contract (driver's t2 gate): for key K present in both maps, the
  * DataFrame produced by `queries(K)(spark, sfDir)` must hash-match the
  * result of running `oracles(K)` in DuckDB over the same parquet tables.
  * Column names must be identical on both sides (driver sorts columns by
  * name before hashing). Keys present only in `queries` get a weaker
  * rows-only check (reserved for genuinely non-SQL-expressible ops).
  *
  * Determinism rules every query here follows:
  *  - explicit `round(…, n)` on every floating aggregate, same n in the
  *    oracle SQL, so engine-order-dependent double summation can't flip
  *    the compared value;
  *  - a total ORDER BY when row identity alone doesn't pin the result;
  *  - no rand()/current_time; sampling is done via md5-prefix filters
  *    which both engines compute identically.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
