package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.QueryModule

/** Streaming operator surface (SURVEY.md §2B "Streaming"): event-time
  * windows (tumbling / sliding / session), watermarking, streaming
  * dedup, stream–static joins, and arbitrary keyed state — the analytics
  * the reference's connector feeds (`/root/reference/src/main.cpp:48-50`
  * moves timestamped events; `README.md:45-51`'s periodic snapshot
  * re-request is the state-rebuild semantic `runningEnrichment` models).
  *
  * Every transform here is defined on a plain DataFrame, so the SAME
  * function runs as a batch query (oracle-checked below — q58/q59/q60)
  * and as a Structured Streaming query over `MemoryStream` replay
  * (equivalence-checked in StreamingSpec). That batch↔stream agreement
  * is Structured Streaming's core contract, and it's the correctness
  * story for the rows no SQL oracle can reach (state, watermarks,
  * incremental execution).
  *
  * Scale notes: windowed aggs shuffle on (window, key) with map-side
  * partials; session windows shuffle on the session key then merge
  * ranges per key; stateful ops partition by grouping key with state in
  * the state store (RocksDB at production scale) — all shapes that hold
  * on a 1000-executor cluster.
  */
object StreamingOps extends QueryModule {

  /** Tumbling 5-minute windows per event type: count + sum. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding 10-minute windows every 5 minutes, per event type. */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))

  /** Session windows: per-user activity runs closed by a 5-minute gap. */
  def sessions(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("session_start"), col("user_id"), col("n"), col("sum_value"))

  /** Streaming dedup on (user_id, event_type) — batch equivalent is
    * DISTINCT on the same columns (only the key set is compared; the
    * surviving row is arrival-order-dependent in both worlds).
    */
  def dedupKeys(events: DataFrame): DataFrame =
    events.select("user_id", "event_type").dropDuplicates(Seq("user_id", "event_type"))

  /** Stream–static enrichment: events joined to the static customer dim
    * (broadcast — the static side is planned per micro-batch).
    */
  def enrich(events: DataFrame, customer: DataFrame): DataFrame =
    events.join(
      broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
      events("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("c_mktsegment"))

  // ---- batch entries for the driver's oracle gate ----

  private def ev(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)

  def q58WindowTumbling(spark: SparkSession, dir: String): DataFrame =
    tumbling(ev(spark, dir)).orderBy("w_start", "event_type")

  def q59WindowSliding(spark: SparkSession, dir: String): DataFrame =
    sliding(ev(spark, dir)).orderBy("w_start", "event_type")

  def q60SessionWindow(spark: SparkSession, dir: String): DataFrame =
    sessions(ev(spark, dir)).orderBy("user_id", "session_start")

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q58_window_tumbling" -> (q58WindowTumbling _),
    "q59_window_sliding" -> (q59WindowSliding _),
    "q60_session_window" -> (q60SessionWindow _)
  )

  override val oracles: Map[String, String] = Map(
    "q58_window_tumbling" ->
      """SELECT time_bucket(INTERVAL 5 MINUTES, ts) AS w_start, event_type,
        |       count(*)::BIGINT AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Sliding window = each event belongs to the two 5-min-aligned
    // 10-min windows covering it: starts b and b-5min for b = bucket(ts).
    "q59_window_sliding" ->
      """WITH x AS (
        |  SELECT u.w_start, event_type, value
        |  FROM (SELECT time_bucket(INTERVAL 5 MINUTES, ts) AS b, event_type, value FROM events) e,
        |       unnest([e.b, e.b - INTERVAL 5 MINUTES]) AS u(w_start))
        |SELECT w_start, event_type, count(*)::BIGINT AS n, round(sum(value), 2) AS sum_value
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Session windows via gaps-and-islands: a new session starts when the
    // gap from the previous event of the same user is >= 5 minutes
    // (Spark's session_window closes at start + gap, exclusive end).
    "q60_session_window" ->
      """WITH g AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, value)
        |                   >= INTERVAL 5 MINUTES THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, value,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, value
        |                        ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM g)
        |SELECT min(ts) AS session_start, user_id, count(*)::BIGINT AS n,
        |       round(sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id, sess ORDER BY user_id, session_start""".stripMargin
  )
}
