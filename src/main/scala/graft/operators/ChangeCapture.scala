package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC primitives over plain parquet snapshots: MERGE (apply a change
  * set to a base snapshot) and DIFF (recover the change set between two
  * snapshots). A 100 TB corpus is not rewritten per refresh — it is
  * maintained by exactly these two operators (the lakehouse MERGE INTO
  * semantic, re-expressed as pure DataFrame ops so it needs no table
  * format): the reference ships an endless keyed stream
  * (`/root/reference/src/kafka_producer.cpp:36-57`); a consumer that
  * materializes it as snapshots needs merge-in and diff-out as
  * first-class, key-partitioned operations.
  *
  * Scale shape (both ops): ONE key-equi-join is the whole plan — each
  * side shuffles once on the key (or not at all when already
  * key-partitioned/bucketed), and AQE broadcasts the change side when
  * it is small, which is the common production shape (changes ≪ base).
  * Nothing driver-side, nothing all-pairs, no window over the base.
  *
  * Invariant (spec-pinned in `ChangeCaptureSpec`):
  * `diff(base, merge(base, chg)) == chg` for any minimal change set —
  * the two operators are inverses.
  */
object ChangeCapture {

  /** Apply a change set to a base snapshot (Delta-style MERGE INTO).
    *
    * @param base    snapshot with key column `key` and payload `value`
    * @param changes change set: (`key`, `value`, `op`) where op is
    *                'I' (insert, key must not exist), 'U' (update,
    *                key exists), or 'D' (delete, value ignored)
    * @return the next snapshot: (`key`, `value`)
    *
    * Matched + D drops the row; matched + U takes the change's value;
    * unmatched + I inserts; base rows without a change pass through.
    * (I vs U is not enforced against matching — like MERGE INTO, an 'I'
    * on an existing key behaves as an update; `diff` always emits the
    * minimal canonical ops.)
    */
  def merge(base: DataFrame, changes: DataFrame,
            key: String, value: String): DataFrame = {
    val b = base.select(col(key), col(value).as("_bv"))
    val c = changes.select(col(key), col(value).as("_cv"), col("op"))
    b.join(c, Seq(key), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col(key),
        when(col("op").isNotNull, col("_cv")).otherwise(col("_bv")).as(value))
  }

  /** Recover the minimal change set between two snapshots.
    *
    * @return (`key`, `value`, `op`): 'I' rows only in `next`, 'D' rows
    *         only in `prev` (value = the deleted value), 'U' rows in
    *         both with a different value. Unchanged keys are absent.
    */
  def diff(prev: DataFrame, next: DataFrame,
           key: String, value: String): DataFrame = {
    // presence flags, NOT value-null checks: a key carrying a null value
    // is present — only an absent key is an insert/delete
    val p = prev.select(col(key), col(value).as("_pv"), lit(true).as("_pp"))
    val n = next.select(col(key), col(value).as("_nv"), lit(true).as("_np"))
    p.join(n, Seq(key), "full_outer")
      .withColumn("op",
        when(col("_pp").isNull, "I")
          .when(col("_np").isNull, "D")
          .when(!(col("_nv") <=> col("_pv")), "U"))
      .filter(col("op").isNotNull)
      .select(col(key),
        when(col("op") === "D", col("_pv")).otherwise(col("_nv")).as(value),
        col("op"))
  }
}
