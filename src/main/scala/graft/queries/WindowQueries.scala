package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface (SURVEY.md §2B "Window functions"): ranking,
  * analytic (lag/lead/first/nth_value), aggregates over row/range frames,
  * and the grouped top-k pattern.
  *
  * Scale notes: every window here is `partitionBy(key).orderBy(...)` —
  * ONE shuffle on the partition key, then a per-partition sort; Spark's
  * WindowExec streams frames without materializing the whole partition
  * for the running/rows frames used here. Partition keys are high-
  * cardinality (custkey, orderkey), so partitions stay small at any SF —
  * no single-partition `Window.orderBy()` (the classic driver-sized-sort
  * anti-pattern) appears anywhere. Grouped top-k uses window + filter
  * (rn<=k) which prunes before any downstream shuffle.
  *
  * Every ranking column is cast to int on the Spark side and INTEGER in
  * the oracle (DuckDB emits BIGINT for ranking fns) so schemas align.
  */
object WindowQueries extends QueryModule {

  /** Ranking family over customers within nation. Deterministic order:
    * acctbal DESC with custkey tiebreak (acctbal collisions possible). */
  def q20WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.customer(spark, dir)
      .select(
        col("c_nationkey"), col("c_custkey"),
        round(col("c_acctbal"), 2).as("acctbal"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 4).as("prk"),
        round(cume_dist().over(w), 4).as("cd"))
      .filter(col("rn") <= 5)
      .orderBy("c_nationkey", "rn")
  }

  /** Analytic family: lag/lead/first/nth_value over each customer's order
    * history. Default frame (RANGE UNBOUNDED PRECEDING..CURRENT ROW) is
    * SQL-standard in both engines, so nth_value agrees row-by-row. */
  def q21WindowAnalytic(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"),
        round(lag("o_totalprice", 1).over(w), 2).as("prev_price"),
        round(lead("o_totalprice", 1).over(w), 2).as("next_price"),
        round(first("o_totalprice").over(w), 2).as("first_price"),
        round(nth_value(col("o_totalprice"), 2).over(w), 2).as("second_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Aggregates over explicit frames: running sum (rows unbounded..current),
    * moving average (rows 2 preceding..current), range frame keyed on a
    * numeric column, and a forward-looking count. */
  def q22WindowFrames(spark: SparkSession, dir: String): DataFrame = {
    val byDate = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val run = byDate.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mov = byDate.rowsBetween(-2, Window.currentRow)
    val fwd = byDate.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val rng = Window.partitionBy("o_custkey").orderBy(col("o_orderkey").asc)
      .rangeBetween(-100, 0)
    Tables.orders(spark, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(run), 2).as("run_sum"),
        // moving SUM not AVG: 2-decimal doubles sum exactly, while /3 can
        // land on a round-half boundary where engine bit patterns differ
        round(sum("o_totalprice").over(mov), 2).as("mov_sum3"),
        count(lit(1)).over(fwd).as("n_remaining"),
        round(sum("o_totalprice").over(rng), 2).as("rng_sum"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Grouped top-k: top-3 orders by price within each priority class —
    * the window+filter(rn<=k) pattern SURVEY §2B names for grouped top-k.
    * At scale: the filter prunes to 3×|groups| rows right after the
    * window, before the final order. */
  def q23WindowTopk(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(
        col("o_orderpriority"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy("o_orderpriority", "rn")
  }

  /** Window aggregate without ORDER BY (whole-partition frame): each line
    * item's share of its order's total — ratio-to-report. */
  def q24WindowShare(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_orderkey")
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        count(lit(1)).over(w).as("n_lines"),
        round(col("l_extendedprice") / sum("l_extendedprice").over(w), 4).as("price_share"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** q81: time-series GAP-FILL + forward-fill resampling — regularize
    * the irregular event stream onto a dense (user × day) grid and
    * carry the last observation forward across silent days (the
    * telemetry/feature-store resampling operator):
    *
    *  1. observe: per (user, day) hash agg — round-6 avg value (the
    *     only cross-partition double sum) + event count;
    *  2. grid: distinct users × the date span; the span is a ~|days|-row
    *     dim built from one min/max agg and broadcast — the date axis
    *     grows with time, not data volume, so the grid is linear in
    *     users with a constant factor;
    *  3. fill: LEFT join grid←obs on (user, day), then
    *     `last(v, ignoreNulls)` over (user, days so far) — one shuffle
    *     on high-cardinality user_id, per-partition sort, streaming
    *     frame; a user's leading gap days (before any event) stay null
    *     by design.
    */
  def q81GapFill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val obs = ev.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(round(avg(col("value")), 6).as("v_avg"), count(lit(1)).as("n_obs"))
    val days = ev
      .agg(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val grid = ev.select("user_id").distinct().crossJoin(broadcast(days))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_obs"), lit(0L)).as("n_events"),
        last(col("v_avg"), ignoreNulls = true).over(w).as("v_fill"),
        when(col("n_obs").isNull, 1).otherwise(0).as("is_gap"))
      .orderBy("user_id", "day")
  }

  /** q89: slowly-changing-dimension (SCD type-2) build from the event
    * stream — the CDC pattern that turns an append-only change log into
    * versioned dimension rows with effective-date ranges: per user,
    * collapse consecutive equal `event_type` observations (lag), stamp
    * each surviving change with a version number and a
    * [valid_from, valid_to) range (lead; the current version stays
    * open). Both windows partition on high-cardinality `user_id` — one
    * hash shuffle, per-partition sorts, no global sort, which is the
    * 100 TB dimension-build shape. Output: the per-user version census
    * (count, first/last type via min_by/max_by, mean closed-version
    * lifetime), one row per user.
    */
  def q89Scd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val ev = Tables.events(spark, dir)
      .select("user_id", "ts", "event_id", "event_type")
    val versions = ev
      .withColumn("prev", lag("event_type", 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to", lead("ts", 1).over(w))
    versions
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_versions"),
        min_by(col("event_type"), col("version")).as("first_type"),
        max_by(col("event_type"), col("version")).as("last_type"),
        round(avg(col("valid_to").cast("double") - col("ts").cast("double")), 4)
          .as("avg_version_secs"))
      .orderBy("user_id")
  }

  /** q97: batch sessionization via gaps-and-islands — the window-function
    * formulation of what q60 does with streaming `session_window`: a new
    * session starts where the gap to the previous event exceeds 30
    * minutes (lag), session ids are the running sum of the start flags,
    * and the census aggregates per user. Both windows and both aggs
    * partition on high-cardinality user_id — one shuffle, the q89
    * exchange-reuse shape.
    */
  def q97Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = Tables.events(spark, dir)
      .select("user_id", "ts", "event_id")
      .withColumn("gap_s",
        col("ts").cast("double") - lag(col("ts"), 1).over(w).cast("double"))
      .withColumn("new_s",
        when(col("gap_s").isNull || col("gap_s") > 1800d, 1L).otherwise(0L))
      .withColumn("sid", sum("new_s").over(run))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"),
        (max(col("ts").cast("double")) - min(col("ts").cast("double"))).as("dur_s"))
    sessions.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"),
        max("n_events").as("max_session_events"),
        round(avg("dur_s"), 4).as("avg_session_secs"))
      .orderBy("user_id")
  }

  /** q411: EVENT-TIME DISORDER PROFILE — the watermark calibrator:
    * replay each user's stream in ARRIVAL order (event_id) and measure
    * how far event time runs BEHIND the running frontier (max ts seen
    * so far). Per event type: the late share and the exact
    * p50/p90/p99/max lateness in minutes — precisely the distribution
    * `withWatermark` asks you to bound (a 10-minute watermark drops
    * everything beyond p-whatever this row reports). The missing
    * measurement between the streaming gates (which ASSUME a delay)
    * and production (which must CHOOSE one).
    *
    * Determinism: the frontier is a user-partitioned running max
    * under the (event_id) total order; lateness snaps to the integer
    * minute grid; percentiles are cumulative-census order statistics
    * (q396's device). Scale: user-partitioned windows at the events
    * layout + one (type, minute) census shuffle.
    */
  def q411DisorderProfile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("us"))
      .withColumn("frontier", max("us").over(w))
      .filter(col("frontier").isNotNull)
      .select(col("event_type"),
        expr("greatest(frontier - us, 0L) div 60000000").as("late_m"))
    val census = late.groupBy("event_type", "late_m")
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(
        Window.partitionBy("event_type").orderBy("late_m")))
      .withColumn("ntot", sum("c").over(Window.partitionBy("event_type")))
    census.groupBy("event_type")
      .agg(max("ntot").as("n"),
        sum(when(col("late_m") > 0, col("c")).otherwise(0L)).as("n_late"),
        max("late_m").as("max_late_min"),
        min(when(col("cum") * 2 >= col("ntot"), col("late_m"))).as("p50_min"),
        min(when(col("cum") * 10 >= col("ntot") * 9, col("late_m"))).as("p90_min"),
        min(when(col("cum") * 100 >= col("ntot") * 99, col("late_m"))).as("p99_min"))
      .selectExpr("event_type", "n",
        "n_late * 1000000L div n AS late_share_ppm",
        "p50_min", "p90_min", "p99_min", "max_late_min")
      .orderBy("event_type")
  }

  /** q412: SESSION ENTRY/EXIT CENSUS — which event type OPENS a
    * session and which CLOSES it (plus the bounce census): the
    * product-analytics landing/exit matrix over q97's 30-minute-gap
    * sessions, the aggregate a funnel review reads next to q96. Share
    * on the ppm grid against all sessions.
    *
    * Determinism: entry/exit are lexicographic struct-min/max under
    * the (µs, event_id) total order — no second window pass; bounces
    * are exact counts. Scale: q97's user-partitioned session device,
    * then one hash agg to the ≤|types|² census.
    */
  def q412EntryExitCensus(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
      .withColumn("gap_s",
        col("ts").cast("double") - lag(col("ts"), 1).over(w).cast("double"))
      .withColumn("new_s",
        when(col("gap_s").isNull || col("gap_s") > 1800d, 1L).otherwise(0L))
      .withColumn("sid", sum("new_s").over(run))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"),
        min(struct(col("us"), col("event_id"), col("event_type"))).as("fi"),
        max(struct(col("us"), col("event_id"), col("event_type"))).as("la"))
    val tot = sessions.agg(count(lit(1)).as("n_total"))
    sessions
      .select(col("fi.event_type").as("entry"), col("la.event_type").as("exit"),
        (col("n_events") === 1).as("bounce"))
      .groupBy("entry", "exit")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("bounce"), 1L).otherwise(0L)).as("n_bounces"))
      .crossJoin(broadcast(tot))
      .selectExpr("entry", "exit", "n_sessions", "n_bounces",
        "n_sessions * 1000000L div n_total AS share_ppm")
      .orderBy("entry", "exit")
  }

  /** q115: truncated exponentially-weighted moving average per user —
    * the streaming-feature smoother (EWMA with decay ½, horizon 8): for
    * each event, ewma_i = Σ_{k=0..7} value_{i−k} / 2^(k+1), zero-padded
    * before the partition start. A full-history EWMA is a sequential
    * recurrence (y_i = y_{i−1}/2 + x_i/2) no engine parallelizes and no
    * float replay reproduces; TRUNCATING the horizon turns it into a
    * bounded window read — and with DYADIC weights on the ⌊x·2^20+0.5⌋
    * integer grid it is EXACT: the numerator Σ q_k·2^(7−k) is an exact
    * long (< 2^39), and the final value is that integer divided by 2^28
    * — a dyadic rational a double holds exactly, so the result is
    * bit-identical in any engine, any order, no rounding step at all.
    *
    * Scale: ONE shuffle on user_id, per-partition sort, streaming
    * bounded frame (8 lags share one window spec) — the q110 shape with
    * a constant-width frame; nothing grows with history length.
    */
  def q115Ewma(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val q = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("qv", floor(col("value") * lit(1048576.0) + lit(0.5)).cast("long"))
    val num = (col("qv") * lit(128L)) +: (1 until 8).map(k =>
      lag(col("qv"), k, 0L).over(w) * lit(1L << (7 - k)))
    val numSum = num.reduce(_ + _)
    q.withColumn("ewma_num", numSum)
      .withColumn("ewma", col("ewma_num").cast("double") / lit(268435456.0))
      .select("event_id", "user_id", "value", "ewma_num", "ewma")
      .orderBy("event_id")
  }

  /** q173: LINEAR INTERPOLATION of sensor dropouts — the gap-REPAIR
    * sibling of q81's grid gap-fill: events with `event_id ≡ 3 mod 7`
    * lose their reading; each lost value is reconstructed from its
    * nearest known neighbors in the SAME user's timeline, weighted by
    * event-time distance (v = vₚ + (vₙ − vₚ)·Δtₚ/Δt, on exact
    * microsecond longs). Boundary dropouts (no earlier / no later known
    * reading) stay NULL — a repair pass must not invent data. The
    * prev/next known (time, value) pairs come from two frame windows
    * with `last/first(ignoreNulls)` — the q81 device pointed at
    * non-NULL carriers; one shuffle on user_id serves all four.
    * Determinism: the time fraction is one exact-integer division; the
    * lerp's two flops carry ulps absorbed by round 6; coincident
    * neighbor timestamps (Δt = 0) take the midpoint by CASE, mirrored
    * in the oracle.
    */
  def q173LinearInterp(spark: SparkSession, dir: String): DataFrame = {
    val masked = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        when(pmod(col("event_id"), lit(7)) === 3, lit(null)).otherwise(col("value")).as("v"),
        (pmod(col("event_id"), lit(7)) === 3).as("is_masked"))
    val ord = Window.partitionBy("user_id").orderBy("us", "event_id")
    val wp = ord.rowsBetween(Window.unboundedPreceding, -1)
    val wn = ord.rowsBetween(1, Window.unboundedFollowing)
    masked
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wp))
      .withColumn("pus", last(when(col("v").isNotNull, col("us")), ignoreNulls = true).over(wp))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wn))
      .withColumn("nus", first(when(col("v").isNotNull, col("us")), ignoreNulls = true).over(wn))
      .filter(col("is_masked"))
      .select(col("user_id"), col("event_id"),
        round(
          when(col("pv").isNull || col("nv").isNull, lit(null))
            .when(col("nus") === col("pus"), (col("pv") + col("nv")) / 2)
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              ((col("us") - col("pus")).cast("double") / (col("nus") - col("pus")))),
          6).as("v_interp"))
      .orderBy("user_id", "event_id")
  }

  /** q192: Kaplan–Meier survival curves per cohort (Kaplan & Meier,
    * JASA 1958) — the right-censored retention statistic behind
    * "how long do customers stay active": subject = customer, duration
    * t = days between first and last order, right-censored when the
    * last order falls inside the final 90 days of the dataset (the
    * subject may still be active). S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) over
    * event times.
    *
    * Scale shape: the fact table pays ONE hash shuffle (per-customer
    * min/max agg); the life table and every window after it run over
    * (cohort × distinct-duration) rows — day-granular, bounded by the
    * calendar, never by the fact stream. The dataset-end anchor is a
    * 1-row broadcast. Determinism: durations/counts are exact integers,
    * each KM factor one correctly-rounded divide; the product is
    * exp(Σln) with the ln/exp libm noise (~1e-14 on O(10²) terms)
    * absorbed by round 6; a dᵢ=nᵢ collapse (S→0, where ln is undefined)
    * is carried as a separate cumulative-max flag — DuckDB refuses
    * ln(0), so the zero branch never evaluates it in either engine.
    */
  def q192KaplanMeier(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("cohort"), col("o_custkey"))
      .agg(min("o_orderdate").as("first_o"), max("o_orderdate").as("last_o"))
    val gmax = Tables.orders(spark, dir).agg(max("o_orderdate").as("gmax"))
    val subj = per.crossJoin(broadcast(gmax))
      .select(col("cohort"),
        datediff(col("last_o"), col("first_o")).cast("long").as("t"),
        when(datediff(col("gmax"), col("last_o")) >= 90, lit(1L))
          .otherwise(lit(0L)).as("ev"))
    val lifeTable = subj.groupBy("cohort", "t")
      .agg(sum("ev").as("d"), count(lit(1)).as("c"))
    val wDesc = Window.partitionBy("cohort").orderBy(col("t").desc)
    val wAsc = Window.partitionBy("cohort").orderBy(col("t").asc)
    lifeTable
      .withColumn("n_at_risk", sum("c").over(wDesc))
      .filter(col("d") > 0)
      .withColumn("lnsum",
        sum(when(col("d") < col("n_at_risk"),
          log((col("n_at_risk") - col("d")).cast("double") /
            col("n_at_risk").cast("double"))).otherwise(lit(0.0d)))
          .over(wAsc))
      .withColumn("hit0",
        max(when(col("d") >= col("n_at_risk"), lit(1)).otherwise(lit(0)))
          .over(wAsc))
      .select(col("cohort"), col("t"), col("n_at_risk"), col("d"),
        round(when(col("hit0") === 1, lit(0.0d)).otherwise(exp(col("lnsum"))), 6)
          .as("survival"))
      .orderBy("cohort", "t")
  }

  /** q414: RESTRICTED MEAN SURVIVAL TIME (RMST, τ = 180 days) — the
    * area under q192's Kaplan–Meier curve up to the horizon: "expected
    * days retained within the first 180", the single-number survival
    * summary clinical and retention analyses report when medians are
    * undefined (curves that never cross 0.5) and the standard
    * model-free effect size between cohorts.
    *
    * Determinism: S comes off q192's exact chain already snapped to
    * 6 dp, so each step's area is the EXACT BIGINT product
    * S_prev_µ·Δt over integer day widths (a τ-sentinel row closes the
    * tail segment; the sum is order-invariant). Scale: q192's life
    * table + cohort-partitioned census windows; the integral is
    * census arithmetic.
    */
  def q414Rmst(spark: SparkSession, dir: String): DataFrame = {
    val tau = 180L
    val per = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("cohort"), col("o_custkey"))
      .agg(min("o_orderdate").as("first_o"), max("o_orderdate").as("last_o"))
    val gmax = Tables.orders(spark, dir).agg(max("o_orderdate").as("gmax"))
    val subj = per.crossJoin(broadcast(gmax))
      .select(col("cohort"),
        datediff(col("last_o"), col("first_o")).cast("long").as("t"),
        when(datediff(col("gmax"), col("last_o")) >= 90, lit(1L))
          .otherwise(lit(0L)).as("ev"))
    val lifeTable = subj.groupBy("cohort", "t")
      .agg(sum("ev").as("d"), count(lit(1)).as("c"))
    val wDesc = Window.partitionBy("cohort").orderBy(col("t").desc)
    val wAsc = Window.partitionBy("cohort").orderBy(col("t").asc)
    val km = lifeTable
      .withColumn("n_at_risk", sum("c").over(wDesc))
      .filter(col("d") > 0)
      .withColumn("lnsum",
        sum(when(col("d") < col("n_at_risk"),
          log((col("n_at_risk") - col("d")).cast("double") /
            col("n_at_risk").cast("double"))).otherwise(lit(0.0d)))
          .over(wAsc))
      .withColumn("hit0",
        max(when(col("d") >= col("n_at_risk"), lit(1)).otherwise(lit(0)))
          .over(wAsc))
      .select(col("cohort"), col("t"),
        expr("CAST(floor((CASE WHEN hit0 = 1 THEN 0.0 " +
          "ELSE exp(lnsum) END) * 1000000.0 + 0.5) AS BIGINT)").as("s_u"))
    val withSentinel = km.filter(col("t") < tau)
      .unionByName(km.select(col("cohort")).distinct()
        .select(col("cohort"), lit(tau).as("t"), lit(0L).as("s_u")))
    val seg = withSentinel
      .withColumn("t_prev", lag("t", 1, 0L).over(wAsc))
      .withColumn("s_prev_u", lag("s_u", 1, 1000000L).over(wAsc))
      .withColumn("area_u", col("s_prev_u") * (col("t") - col("t_prev")))
    val nSubj = subj.groupBy("cohort").agg(count(lit(1)).as("n_subjects"))
    seg.groupBy("cohort").agg(sum("area_u").as("rmst_u"))
      .join(nSubj, "cohort")
      .selectExpr("cohort", "n_subjects",
        "round(CAST(rmst_u AS DOUBLE) / 1000000.0, 6) AS rmst_days")
      .orderBy("cohort")
  }

  /** q197: TIME-DECAY multi-touch attribution — every purchase
    * distributes its revenue over the user's preceding clicks in a
    * 7-day lookback, weighted by 2^(−days-before) (the half-life model
    * of marketing attribution; the position-based and last-touch rules
    * are degenerate cases of this plan). Exactness devices: the decay
    * weight is DYADIC (1/2^⌊Δ/day⌋ — an exact power of two, no
    * exp/pow libm), the per-purchase normalizer Σw is a sum of exact
    * multiples of 2⁻⁶ (exact in double in ANY order), and each credit
    * is quantized to integer MICROS (⌊share·value·10⁶+0.5⌋) so the
    * per-user totals are order-invariant BIGINT sums — bit-identical
    * with zero accumulation-order exposure.
    *
    * Scale: purchases ⋈ clicks is a per-user EQUI-join (one shuffle on
    * user_id, the range predicate a post-filter over per-user streams —
    * bounded, AQE handles hot users); the normalizer window partitions
    * by purchase id (high cardinality — parallel); unattributed
    * purchases surface via the totals left join, not silent credit
    * loss.
    */
  def q197DecayAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("ts").as("p_ts"), col("value").as("p_value"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
    val touches = p.join(c, Seq("user_id"))
      .filter(col("c_ts") < col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 7 DAYS"))
      .withColumn("days_before",
        expr("(unix_micros(p_ts) - unix_micros(c_ts)) div 86400000000"))
      .withColumn("w",
        lit(1.0d) / expr("CAST(shiftleft(1L, CAST(days_before AS INT)) AS DOUBLE)"))
    val attr = touches
      .withColumn("sumw", sum("w").over(Window.partitionBy("p_id")))
      .withColumn("micro",
        floor(col("w") / col("sumw") * col("p_value") * lit(1000000.0d) + lit(0.5d))
          .cast("long"))
      .groupBy("user_id")
      .agg(countDistinct("p_id").as("n_attributed"),
        count(lit(1)).as("n_touches"),
        sum("micro").as("attr_value_micro"))
    p.groupBy("user_id").agg(count(lit(1)).as("n_purchases"))
      .join(attr, Seq("user_id"), "left")
      .select(col("user_id"), col("n_purchases"),
        coalesce(col("n_attributed"), lit(0L)).as("n_attributed"),
        coalesce(col("n_touches"), lit(0L)).as("n_touches"),
        coalesce(col("attr_value_micro"), lit(0L)).as("attr_value_micro"))
      .orderBy("user_id")
  }

  /** q272: SKYLINE / Pareto-frontier query (Börzsönyi '01) — per brand
    * the parts no other part dominates on (price, size) minimization:
    * the multi-objective shortlist operator (`ORDER BY` can rank one
    * measure; the skyline keeps every non-dominated trade-off). The
    * engine computes it as a WINDOW plan — sort each brand partition
    * by price cents, a part survives iff no strictly-cheaper part has
    * size ≤ its own (running strict-prefix min via a RANGE frame to
    * −1) and no equal-priced part has a smaller size (min over the
    * RANGE 0..0 frame) — O(n log n) per partition, while the blind
    * oracle states dominance as a NOT EXISTS anti-self-join: two
    * algorithms, one frontier.
    *
    * Determinism: every comparison is BIGINT (price cents, size);
    * output echoes exact ints. Scale: windows are PARTITIONED by
    * brand (25 partitions here, any dimension key at 100 TB); the
    * quadratic NOT-EXISTS never runs in the engine.
    */
  def q272Skyline(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"),
      floor(col("p_retailprice") * 100.0 + 0.5).cast("long").as("pc"),
      col("p_size").cast("long").as("sz"))
    val wPrev = Window.partitionBy("p_brand").orderBy("pc")
      .rangeBetween(Window.unboundedPreceding, -1)
    val wTie = Window.partitionBy("p_brand").orderBy("pc").rangeBetween(0, 0)
    p.withColumn("min_prev", min("sz").over(wPrev))
      .withColumn("min_tie", min("sz").over(wTie))
      .filter((col("min_prev").isNull || col("min_prev") > col("sz")) &&
        col("min_tie") === col("sz"))
      .select(col("p_brand"), col("p_partkey"),
        (col("pc") / 100.0).as("price"), col("sz").as("size"))
      .orderBy("p_brand", "price", "p_partkey")
  }

  /** q290: INTERVAL-UNION coverage (gaps-and-islands) — the range
    * member of the window family (q97 sessionizes POINTS by gap; this
    * merges overlapping INTERVALS — effective watch-time / machine-
    * uptime semantics, where double-counted overlap is the bug):
    * each event opens an interval [s, s + 60 + cents mod 600]; per
    * user, covered seconds = Σ over rows of the part of the interval
    * past the running max of all previous ends, and islands = the
    * count of rows that start past it. Reported as a per-cohort
    * census (user_id mod 25).
    *
    * Determinism: interval bounds are exact integer seconds; rows tied
    * on (s, e) are identical rows, so the ROWS-frame running max is
    * order-invariant under any tie permutation — both engines walk the
    * same fold. Scale: ONE user-partitioned window (key-parallel) +
    * one keyed agg; no self-join, no explode — the O(n log n) plan for
    * a problem often written as an O(n²) overlap join.
    */
  def q290IntervalCoverage(spark: SparkSession, dir: String): DataFrame = {
    val iv = Tables.events(spark, dir).select(
        col("user_id"),
        expr("unix_micros(ts) div 1000000").as("s"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .withColumn("e", col("s") + 60L + pmod(col("cents"), lit(600L)))
    val w = Window.partitionBy("user_id").orderBy("s", "e")
      .rowsBetween(Window.unboundedPreceding, -1)
    val folded = iv
      .withColumn("pmax", max("e").over(w))
      .withColumn("covered",
        greatest(col("e") - greatest(col("s"), coalesce(col("pmax"), lit(Long.MinValue))),
          lit(0L)))
      .withColumn("island",
        when(col("pmax").isNull || col("s") > col("pmax"), 1L).otherwise(0L))
    folded.groupBy("user_id")
      .agg(sum("covered").as("cov"), sum("island").as("isl"), count(lit(1)).as("nev"))
      .groupBy(pmod(col("user_id"), lit(25L)).as("cohort"))
      .agg(count(lit(1)).as("n_users"),
        sum("cov").as("covered_sec"),
        sum("isl").as("islands"),
        sum("nev").as("n_events"),
        max("cov").as("max_user_covered"))
      .orderBy("cohort")
  }

  /** q304: TWAP — time-weighted average price per day, the sampling-
    * robust twin of q226's VWAP (VWAP weights by volume; TWAP weights
    * each observation by how LONG it was the live value, the right
    * average for irregularly-sampled gauges — a value that held for
    * 6 hours counts 360× one that held a minute): per UTC day, each
    * event's cents weight is the µs until the next event (the last
    * one holds to day end), TWAP = Σ cents·dur / Σ dur.
    *
    * Determinism: durations are exact µs integers under the total
    * (µs, event_id) order; the weighted sum is BIGINT (cents ≤ 5·10⁴
    * × 8.64·10¹⁰ µs × 10⁵ rows ≈ 4×10¹⁸ worst case — inside BIGINT at
    * the fixture scales; at 10⁹ rows/day descale durations to ms);
    * one snapped divide per day. Scale: one day-partitioned window +
    * one keyed agg.
    */
  def q304Twap(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      expr("unix_micros(ts)").as("us"), col("event_id"),
      floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .withColumn("day", expr("us div 86400000000"))
    val w = Window.partitionBy("day").orderBy("us", "event_id")
    ev.withColumn("nxt", lead("us", 1).over(w))
      .withColumn("dur",
        coalesce(col("nxt"), (col("day") + 1) * 86400000000L) - col("us"))
      .groupBy("day")
      .agg(count(lit(1)).as("n"),
        sum(col("cents") * col("dur")).as("wsum"),
        sum("dur").as("tsum"))
      .select(col("day"), col("n"),
        (floor(col("wsum").cast("double") / col("tsum").cast("double") + 0.5)
          / 100.0).as("twap"))
      .orderBy("day")
  }

  /** q321: REALIZED VOLATILITY — the tick-level risk measure that
    * completes the market-microstructure family (q226/q304 price the
    * level: VWAP/TWAP; RV prices the MOVEMENT — Andersen & Bollerslev's
    * Σ r² over intraday log returns is the standard daily-vol
    * estimator a trading stack computes per instrument per day): per
    * (event_type, UTC day), log returns between consecutive ticks
    * under the total (µs, event_id) order, RV = Σ r², plus the
    * realized absolute variation Σ|r| and the max absolute tick move.
    *
    * Determinism: ln(cents) is snapped per row to the micro-nat BIGINT
    * grid (⌊ln·10⁶+0.5⌋ — the one libm call, same argument both
    * engines), so returns, their squares (≤ 1.2·10¹⁴ each, Σ < 2⁶³),
    * and all three statistics are EXACT integers; only the display
    * descale divides. Scale: one day×type-partitioned window (lag) +
    * one partial+final agg — the window key is the natural at-rest
    * layout for tick data, so at 100 TB the sort is partition-local
    * over already-day-bucketed files.
    */
  def q321RealizedVol(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("event_type"),
      expr("unix_micros(ts)").as("us"), col("event_id"),
      floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .filter(col("cents") >= 1L) // a zero/negative price is feed garbage, not a return
      .withColumn("day", expr("us div 86400000000"))
      .withColumn("lnp",
        floor(log(col("cents").cast("double")) * 1000000.0 + 0.5).cast("long"))
    val w = Window.partitionBy("event_type", "day").orderBy("us", "event_id")
    ev.withColumn("r", col("lnp") - lag("lnp", 1).over(w))
      .groupBy("event_type", "day")
      .agg(count(col("r")).as("n_ret"),
        sum(col("r") * col("r")).as("rv_u2"),
        sum(abs(col("r"))).as("rav_u"),
        max(abs(col("r"))).as("max_abs_u"))
      .select(col("event_type"), col("day"), col("n_ret"),
        round(sqrt(col("rv_u2").cast("double") / 1e12), 6).as("realized_vol"),
        round(col("rav_u").cast("double") / 1e6, 6).as("realized_abs_var"),
        round(col("max_abs_u").cast("double") / 1e6, 6).as("max_abs_ret"),
        col("rv_u2"))
      .orderBy("event_type", "day")
  }

  /** q330: SEASONAL-NAIVE forecast backtest with MASE — the
    * forecasting-EVAL member of the time-series family (q261
    * decomposes, q207 flags anomalies, q284 measures memory; a
    * forecasting platform's first question is "does my model beat
    * seasonal-naive, measured scale-free?" — Hyndman & Koehler '06):
    * per event type, hold out the last 7 days, forecast each held-out
    * day with the value 7 days prior (seasonal-naive), and score with
    * MASE = test MAE / in-sample one-step naive MAE.
    *
    * Determinism: the daily series is exact BIGINT cents; both MAE
    * numerators are integer |diff| sums over the DAY census; MASE is
    * one double ratio of two integer rationals, snapped. Scale: the
    * series lives on the (type, day) census — two lag windows and one
    * agg per type, bounded by time, never rows.
    */
  def q330SeasonalNaiveMase(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .groupBy("event_type", "day").agg(sum("cents").as("v"))
    val maxDay = daily.agg(max("day").as("maxd"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val scored = daily.crossJoin(broadcast(maxDay))
      .withColumn("v7", lag("v", 7).over(w))
      .withColumn("v1", lag("v", 1).over(w))
      .withColumn("is_test", (col("day") > col("maxd") - 7).cast("long"))
    scored.groupBy("event_type")
      .agg(
        sum(when(col("is_test") === 1 && col("v7").isNotNull, 1L).otherwise(0L))
          .as("n_test"),
        sum(when(col("is_test") === 1 && col("v7").isNotNull,
          abs(col("v") - col("v7"))).otherwise(0L)).as("mae_fc_sum"),
        sum(when(col("is_test") === 0 && col("v1").isNotNull, 1L).otherwise(0L))
          .as("n_train_steps"),
        sum(when(col("is_test") === 0 && col("v1").isNotNull,
          abs(col("v") - col("v1"))).otherwise(0L)).as("mae_naive_sum"))
      .select(col("event_type"), col("n_test"), col("mae_fc_sum"),
        col("n_train_steps"), col("mae_naive_sum"),
        round((col("mae_fc_sum").cast("double") / col("n_test").cast("double")) /
          (col("mae_naive_sum").cast("double") / col("n_train_steps").cast("double")),
          6).as("mase"))
      .orderBy("event_type")
  }

  /** q346: PANE-BASED sliding windows ("no pane, no gain" — Li et al.,
    * SIGMOD Record '05; the sub-aggregation trick every high-volume
    * window engine uses): a 15-minute window sliding by 5 assigns each
    * event to THREE windows natively (3× the shuffle); panes assign
    * each event to exactly ONE 5-minute tumbling pane and compose each
    * sliding window from its 3 panes afterwards. The gate: the
    * pane-composed result equals the native-semantics replay
    * (count + exact cents sum per (type, window)).
    *
    * Determinism: pane and window starts are integer µs arithmetic;
    * sums are BIGINT cents. Scale: THE point — input rows cross the
    * shuffle ONCE (pane key), and the window composition joins the
    * pane CENSUS (|types|·|panes| rows) to a 3-row-per-window span;
    * at a slide ratio of k the shuffle shrinks k×.
    */
  def q346PaneSliding(spark: SparkSession, dir: String): DataFrame = {
    val panes = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("(unix_micros(ts) div 300000000) * 300000000").as("pane_us"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .groupBy("event_type", "pane_us")
      .agg(count(lit(1)).as("n"), sum("cents").as("c"))
    val offsets = spark.range(3).select((col("id") * 300000000L).as("off"))
    panes.crossJoin(broadcast(offsets))
      .select(col("event_type"), (col("pane_us") - col("off")).as("w_start_us"),
        col("n"), col("c"))
      .groupBy("event_type", "w_start_us")
      .agg(sum("n").as("n_events"),
        (sum("c").cast("double") / 100.0).as("sum_value"))
      .orderBy("event_type", "w_start_us")
  }

  /** q349: SAX symbolization + motif census (Lin/Keogh '03 — the
    * time-series indexing representation: piecewise-aggregate segments
    * mapped to a small alphabet, so similarity search and motif mining
    * run on short STRINGS instead of raw series): each (type, day)
    * series becomes a 4-symbol word (6-hour PAA segments, alphabet
    * a–c cut at the segment-mean census terciles — 81 possible words,
    * so motifs actually repeat on a month of days), and the motif
    * report counts repeated words per type.
    *
    * Determinism: segment means are scaled-integer rationals
    * (Σcents·1000 div n); the quartile breakpoints are census-rank
    * lookups over the segment-mean census; words are deterministic
    * strings. Scale: one agg to (type, day, segment), census cuts,
    * one pivot-to-word agg — the raw series never moves after the
    * first shuffle, which is the point of symbolic indexing.
    */
  def q349SaxMotifs(spark: SparkSession, dir: String): DataFrame = {
    val seg = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        expr("unix_micros(ts) % 86400000000 div 21600000000").as("segment"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .groupBy("event_type", "day", "segment")
      .agg(expr("sum(cents) * 1000L div count(1)").as("m_u"))
      .localCheckpoint()
    val census = seg.groupBy("m_u").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(Window.orderBy("m_u")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = census.agg(sum("cnt").as("n"))
    val cuts = census.crossJoin(broadcast(tot)).agg(
      min(when(col("cum") * 3 >= col("n"), col("m_u"))).as("b1"),
      min(when(col("cum") * 3 >= col("n") * 2, col("m_u"))).as("b2"))
    val words = seg.crossJoin(broadcast(cuts))
      .withColumn("sym",
        when(col("m_u") <= col("b1"), lit("a"))
          .when(col("m_u") <= col("b2"), lit("b")).otherwise(lit("c")))
      .groupBy("event_type", "day")
      .agg(concat_ws("", (0 to 3).map(s =>
        max(when(col("segment") === s, col("sym")))): _*).as("word"))
    words.groupBy("event_type", "word").agg(count(lit(1)).as("n_days"))
      .filter(col("n_days") >= 2)
      .orderBy("event_type", "word")
  }

  /** q353: VALUE-CHANGE compaction — the delta/last-value-wins
    * compression every tick store and IoT historian applies at ingest
    * (a gauge that reports the same value 500 times carries one fact;
    * keeping only CHANGES is lossless for last-value-semantics reads
    * and routinely 10×): per (type, user) series under the total
    * (µs, event_id) order, keep rows whose cents differ from the
    * previous row's, and report the per-type compaction census —
    * kept/dropped counts, ratio, and the kept rows' exact checksum.
    *
    * Determinism: change detection is an integer lag compare under a
    * unique order; every output is an integer census (ratio on the
    * ppm grid). Scale: one series-partitioned lag window — the same
    * at-rest layout the store already has; the checksum column is how
    * a 100 TB compaction job proves itself lossless without a second
    * full read.
    */
  def q353ValueChangeCompaction(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type", "user_id").orderBy("us", "event_id")
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(ts)").as("us"), col("event_id"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .withColumn("prev", lag("cents", 1).over(w))
      .withColumn("keep",
        (col("prev").isNull || col("prev") =!= col("cents")).cast("long"))
    ev.groupBy("event_type")
      .agg(count(lit(1)).as("n_raw"),
        sum("keep").as("n_kept"),
        sum(lit(1L) - col("keep")).as("n_dropped"),
        sum(when(col("keep") === 1, col("cents")).otherwise(0L))
          .as("kept_cents_checksum"),
        sum(when(col("keep") === 1, col("event_id")).otherwise(0L))
          .as("kept_id_checksum"))
      .withColumn("kept_ppm", expr("n_kept * 1000000L div n_raw"))
      .orderBy("event_type")
  }

  /** q357: MAXIMUM DRAWDOWN — the canonical path-dependent risk metric
    * (largest peak-to-trough drop of a cumulative series), plus the
    * peak/trough day pair that realizes it: per event type, the daily
    * value census accumulates into a running sum, the running maximum
    * of THAT is the high-water mark, and drawdown is their gap. q321
    * measures dispersion (realized vol) and q271 detects level shifts
    * (CUSUM); drawdown is the third classic on the same series — the
    * worst-case excursion a monitoring/treasury dashboard actually
    * alarms on.
    *
    * Determinism: the whole path rides integer cents; argmax days
    * resolve ties as (first trough day achieving the max drawdown,
    * then first day at-or-before it attaining that trough's high-water
    * mark) — pure min-over-filtered-census lookups, no float decides
    * anything. Scale: ONE shuffle to the (type, day) census; both
    * running windows and all argmax joins run on census-sized data
    * (the q263 discipline) — the raw events never move again.
    */
  def q357MaxDrawdown(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .groupBy("event_type", "day").agg(sum("cents").as("dc"))
      .localCheckpoint()
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = daily
      .withColumn("c", sum("dc").over(w))
      .withColumn("p", max("c").over(w))
      .withColumn("dd", col("p") - col("c"))
    val perType = cum.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), max("dd").as("max_dd"),
        max("c").as("peak_cents"))
    val trough = cum
      .join(perType.select(col("event_type"), col("max_dd")), Seq("event_type"))
      .filter(col("dd") === col("max_dd"))
      .groupBy("event_type").agg(min("day").as("trough_day"))
    val peakAtTrough = cum.join(trough, Seq("event_type"))
      .filter(col("day") === col("trough_day"))
      .select(col("event_type"), col("p").as("p_at_trough"), col("trough_day"))
    val peakDay = cum.join(peakAtTrough, Seq("event_type"))
      .filter(col("day") <= col("trough_day") && col("c") === col("p_at_trough"))
      .groupBy("event_type").agg(min("day").as("peak_day"))
    perType.join(trough, Seq("event_type")).join(peakDay, Seq("event_type"))
      .select(col("event_type"), col("n_days"),
        (col("peak_cents").cast("double") / 100.0).as("peak_value"),
        (col("max_dd").cast("double") / 100.0).as("max_drawdown"),
        col("peak_day"), col("trough_day"))
      .orderBy("event_type")
  }

  /** q362: NELSON–AALEN cumulative hazard + its variance — the
    * counting-process sibling of q192's Kaplan–Meier over the SAME life
    * table (Ĥ(t) = Σ d/n vs Ŝ(t) = Π(1−d/n); NA is the one additive
    * in event counts, the standard basis for hazard-rate plots and for
    * the Breslow baseline in Cox models). Where q192 multiplies
    * survival down, this sums hazard up, with the Poisson variance
    * Σ d/n² alongside — together the two queries give the full
    * univariate survival toolkit.
    *
    * Determinism: q192's ln/exp chains are replaced by pure INTEGER
    * grids — each step contributes d·10⁹ div n (hazard) and
    * d·10¹² div n² (variance) exactly, cumulated by an integer window
    * sum, with single exact divides at output. Scale: identical to
    * q192 — per-subject agg, cohort-day life-table censuses, windows
    * only over censuses.
    */
  def q362NelsonAalen(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("cohort"), col("o_custkey"))
      .agg(min("o_orderdate").as("first_o"), max("o_orderdate").as("last_o"))
    val gmax = Tables.orders(spark, dir).agg(max("o_orderdate").as("gmax"))
    val subj = per.crossJoin(broadcast(gmax))
      .select(col("cohort"),
        datediff(col("last_o"), col("first_o")).cast("long").as("t"),
        when(datediff(col("gmax"), col("last_o")) >= 90, lit(1L))
          .otherwise(lit(0L)).as("ev"))
    val lifeTable = subj.groupBy("cohort", "t")
      .agg(sum("ev").as("d"), count(lit(1)).as("c"))
    val wDesc = Window.partitionBy("cohort").orderBy(col("t").desc)
    val wAsc = Window.partitionBy("cohort").orderBy(col("t").asc)
    lifeTable
      .withColumn("n_at_risk", sum("c").over(wDesc))
      .filter(col("d") > 0)
      .withColumn("h_u", expr("d * 1000000000L div n_at_risk"))
      .withColumn("v_u", expr("d * 1000000000000L div (n_at_risk * n_at_risk)"))
      .withColumn("ch_u", sum("h_u").over(wAsc))
      .withColumn("cv_u", sum("v_u").over(wAsc))
      .select(col("cohort"), col("t"), col("n_at_risk"), col("d"),
        (col("ch_u").cast("double") / 1.0e9).as("cum_hazard"),
        (col("cv_u").cast("double") / 1.0e12).as("cum_var"))
      .orderBy("cohort", "t")
  }

  /** q368: HOLT'S LINEAR TREND (double exponential smoothing, α=0.2,
    * β=0.1) — the level+trend recursion EWMA (q115) cannot express and
    * the classical forecasting baseline between q115's flat smoother
    * and q330's seasonal naive: lₜ = αyₜ + (1−α)(lₜ₋₁+bₜ₋₁),
    * bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁, plus the one-step-ahead MAE and the
    * 7-day-ahead forecast l + 7b. The genuinely-sequential recursion
    * runs IN PLAN as an `aggregate` HOF fold over each type's
    * census-sized day array — the "stateful scan over a small series
    * after one big shuffle" shape; the oracle replays it as a bounded
    * recursive CTE.
    *
    * Determinism: the state lives on the integer milli-dollar grid —
    * each update is (2y + 8(l+b)) div 10 etc., with the OFFSET-DIV
    * device (add 10¹³ before the div, subtract 10¹² after) because the
    * trend is SIGNED and Spark's `div` truncates toward zero while
    * DuckDB's `//` floors: shifting the operand positive makes the two
    * agree exactly. No float anywhere until the output divides.
    */
  def q368HoltTrend(spark: SparkSession, dir: String): DataFrame = {
    // floor-div by 10 for possibly-negative x, identical in both
    // engines: operand shifted positive so truncation == floor
    def fd10(x: String): String = s"(($x + 10000000000000L) div 10 - 1000000000000L)"
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .groupBy("event_type", "day")
      .agg((sum("cents") * lit(10L)).as("yu")) // milli-dollar grid = cents*10
    val series = daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("yu")))).as("s"))
      .select(col("event_type"), size(col("s")).as("n_days"),
        expr("transform(s, p -> p.yu)").as("ys"))
    val lNew = fd10("2 * y + 8 * (acc.l + acc.b)")
    val step = s"named_struct(" +
      s"'l', $lNew, " +
      s"'b', ${fd10(s"$lNew - acc.l + 9 * acc.b")}, " +
      s"'sae', acc.sae + abs(y - (acc.l + acc.b)))"
    series
      .withColumn("st", expr(
        "aggregate(slice(ys, 3, greatest(size(ys) - 2, 0)), " +
          "named_struct('l', element_at(ys, 2), " +
          "'b', element_at(ys, 2) - element_at(ys, 1), " +
          "'sae', CAST(0 AS BIGINT)), " +
          s"(acc, y) -> $step)"))
      .select(col("event_type"), col("n_days"),
        (col("st.l").cast("double") / 1000.0).as("level"),
        (col("st.b").cast("double") / 1000.0).as("trend"),
        ((col("st.l") + lit(7L) * col("st.b")).cast("double") / 1000.0)
          .as("forecast_7d"),
        (expr("st.sae div greatest(n_days - 2, 1)").cast("double") / 1000.0)
          .as("mae"))
      .orderBy("event_type")
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q368_holt_trend" -> (q368HoltTrend _),
    "q362_nelson_aalen" -> (q362NelsonAalen _),
    "q357_max_drawdown" -> (q357MaxDrawdown _),
    "q353_value_change_compaction" -> (q353ValueChangeCompaction _),
    "q349_sax_motifs" -> (q349SaxMotifs _),
    "q346_pane_sliding" -> (q346PaneSliding _),
    "q330_seasonal_naive_mase" -> (q330SeasonalNaiveMase _),
    "q321_realized_vol" -> (q321RealizedVol _),
    "q304_twap" -> (q304Twap _),
    "q290_interval_coverage" -> (q290IntervalCoverage _),
    "q272_skyline" -> (q272Skyline _),
    "q197_decay_attribution" -> (q197DecayAttribution _),
    "q192_kaplan_meier" -> (q192KaplanMeier _),
    "q173_linear_interp" -> (q173LinearInterp _),
    "q97_sessionize" -> (q97Sessionize _),
    "q411_disorder_profile" -> (q411DisorderProfile _),
    "q414_rmst" -> (q414Rmst _),
    "q412_entry_exit_census" -> (q412EntryExitCensus _),
    "q89_scd2" -> (q89Scd2 _),
    "q20_window_rank" -> (q20WindowRank _),
    "q21_window_analytic" -> (q21WindowAnalytic _),
    "q22_window_frames" -> (q22WindowFrames _),
    "q23_window_topk" -> (q23WindowTopk _),
    "q24_window_share" -> (q24WindowShare _),
    "q81_gap_fill" -> (q81GapFill _),
    "q115_ewma" -> (q115Ewma _)
  )

  override val oracles: Map[String, String] = Map(
    // the identical integer state machine replayed as a bounded
    // recursive CTE — same offset-div updates, same init, same grids
    "q368_holt_trend" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         (sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) * 10)::BIGINT AS yu
        |  FROM events GROUP BY 1, 2),
        |ser AS (
        |  SELECT event_type,
        |         row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
        |         yu
        |  FROM daily),
        |nn AS (SELECT event_type, count(*)::BIGINT AS n_days FROM ser GROUP BY 1),
        |rec AS (
        |  SELECT s2.event_type, 2::BIGINT AS rn, s2.yu AS l,
        |         (s2.yu - s1.yu)::BIGINT AS b, 0::BIGINT AS sae
        |  FROM ser s1 JOIN ser s2
        |    ON s1.event_type = s2.event_type AND s1.rn = 1 AND s2.rn = 2
        |  UNION ALL
        |  SELECT r.event_type, r.rn + 1,
        |         ((2 * s.yu + 8 * (r.l + r.b) + 10000000000000) // 10
        |           - 1000000000000),
        |         ((((2 * s.yu + 8 * (r.l + r.b) + 10000000000000) // 10
        |            - 1000000000000) - r.l + 9 * r.b + 10000000000000) // 10
        |           - 1000000000000),
        |         r.sae + abs(s.yu - (r.l + r.b))
        |  FROM rec r JOIN ser s
        |    ON s.event_type = r.event_type AND s.rn = r.rn + 1),
        |fin AS (
        |  SELECT rec.event_type, rec.l, rec.b, rec.sae, nn.n_days
        |  FROM rec JOIN nn USING (event_type) WHERE rec.rn = nn.n_days)
        |SELECT event_type, n_days,
        |       l::DOUBLE / 1000.0 AS level, b::DOUBLE / 1000.0 AS trend,
        |       (l + 7 * b)::DOUBLE / 1000.0 AS forecast_7d,
        |       (sae // greatest(n_days - 2, 1))::DOUBLE / 1000.0 AS mae
        |FROM fin ORDER BY event_type""".stripMargin,
    // q192's life table verbatim, with the ln/exp chains replaced by
    // the integer hazard/variance grids and integer window cumsums
    "q362_nelson_aalen" ->
      """WITH g AS (SELECT max(o_orderdate) AS gmax FROM orders),
        |per AS (
        |  SELECT c.c_mktsegment AS cohort, o.o_custkey,
        |         date_diff('day', min(o.o_orderdate), max(o.o_orderdate))::BIGINT AS t,
        |         CASE WHEN date_diff('day', max(o.o_orderdate),
        |                             (SELECT gmax FROM g)) >= 90
        |              THEN 1 ELSE 0 END AS ev
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY c.c_mktsegment, o.o_custkey),
        |bt AS (
        |  SELECT cohort, t, sum(ev)::BIGINT AS d, count(*)::BIGINT AS c
        |  FROM per GROUP BY cohort, t),
        |rk AS (
        |  SELECT cohort, t, d, c,
        |         sum(c) OVER (PARTITION BY cohort ORDER BY t DESC)::BIGINT AS n_at_risk
        |  FROM bt),
        |ev AS (
        |  SELECT cohort, t, d, n_at_risk,
        |         d * 1000000000 // n_at_risk AS h_u,
        |         d * 1000000000000 // (n_at_risk * n_at_risk) AS v_u
        |  FROM rk WHERE d > 0),
        |cum AS (
        |  SELECT cohort, t, n_at_risk, d,
        |         (sum(h_u) OVER (PARTITION BY cohort ORDER BY t))::BIGINT AS ch_u,
        |         (sum(v_u) OVER (PARTITION BY cohort ORDER BY t))::BIGINT AS cv_u
        |  FROM ev)
        |SELECT cohort, t, n_at_risk, d,
        |       ch_u::DOUBLE / 1000000000.0 AS cum_hazard,
        |       cv_u::DOUBLE / 1000000000000.0 AS cum_var
        |FROM cum ORDER BY cohort, t""".stripMargin,
    // same daily cents census, same running-sum/running-max pair, same
    // first-day argmax tie-breaks, same two single divides
    "q357_max_drawdown" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))::BIGINT AS dc
        |  FROM events GROUP BY 1, 2),
        |c1 AS (
        |  SELECT event_type, day, dc,
        |         (sum(dc) OVER (PARTITION BY event_type ORDER BY day
        |            ROWS UNBOUNDED PRECEDING))::BIGINT AS c
        |  FROM daily),
        |c2 AS (
        |  SELECT event_type, day, c,
        |         (max(c) OVER (PARTITION BY event_type ORDER BY day
        |            ROWS UNBOUNDED PRECEDING))::BIGINT AS p
        |  FROM c1),
        |dd AS (SELECT event_type, day, c, p, p - c AS dd FROM c2),
        |pt AS (
        |  SELECT event_type, count(*)::BIGINT AS n_days,
        |         max(dd)::BIGINT AS max_dd, max(c)::BIGINT AS peak_cents
        |  FROM dd GROUP BY 1),
        |tr AS (
        |  SELECT dd.event_type, min(day)::BIGINT AS trough_day
        |  FROM dd JOIN pt USING (event_type) WHERE dd.dd = pt.max_dd
        |  GROUP BY 1),
        |pat AS (
        |  SELECT dd.event_type, dd.p AS p_at_trough, tr.trough_day
        |  FROM dd JOIN tr ON dd.event_type = tr.event_type
        |                 AND dd.day = tr.trough_day),
        |pd AS (
        |  SELECT dd.event_type, min(dd.day)::BIGINT AS peak_day
        |  FROM dd JOIN pat ON dd.event_type = pat.event_type
        |                  AND dd.day <= pat.trough_day
        |                  AND dd.c = pat.p_at_trough
        |  GROUP BY 1)
        |SELECT pt.event_type, n_days,
        |       peak_cents::DOUBLE / 100.0 AS peak_value,
        |       max_dd::DOUBLE / 100.0 AS max_drawdown,
        |       peak_day, trough_day
        |FROM pt JOIN tr USING (event_type) JOIN pd USING (event_type)
        |ORDER BY event_type""".stripMargin,
    // same unique-order lag compare, same integer censuses/checksums
    "q353_value_change_compaction" ->
      """WITH ev AS (
        |  SELECT event_type, user_id, epoch_us(ts) AS us, event_id,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |k AS (
        |  SELECT event_type, event_id, cents,
        |         CASE WHEN lag(cents) OVER (PARTITION BY event_type, user_id
        |                                    ORDER BY us, event_id) IS NULL
        |                OR lag(cents) OVER (PARTITION BY event_type, user_id
        |                                    ORDER BY us, event_id) <> cents
        |              THEN 1 ELSE 0 END AS keep
        |  FROM ev)
        |SELECT event_type, count(*)::BIGINT AS n_raw,
        |       sum(keep)::BIGINT AS n_kept,
        |       sum(1 - keep)::BIGINT AS n_dropped,
        |       sum(CASE WHEN keep = 1 THEN cents ELSE 0 END)::BIGINT
        |         AS kept_cents_checksum,
        |       sum(CASE WHEN keep = 1 THEN event_id ELSE 0 END)::BIGINT
        |         AS kept_id_checksum,
        |       (sum(keep) * 1000000 // count(*))::BIGINT AS kept_ppm
        |FROM k
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // same scaled-integer PAA means, same census quartile cuts, same
    // null-skipping word assembly and motif census
    "q349_sax_motifs" ->
      """WITH seg AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         epoch_us(ts) % 86400000000 // 21600000000 AS segment,
        |         sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) * 1000
        |           // count(*) AS m_u
        |  FROM events GROUP BY 1, 2, 3),
        |census AS (
        |  SELECT m_u, count(*)::BIGINT AS cnt FROM seg GROUP BY m_u),
        |cc AS (
        |  SELECT m_u,
        |         (sum(cnt) OVER (ORDER BY m_u ROWS UNBOUNDED PRECEDING))::BIGINT
        |           AS cum
        |  FROM census),
        |tot AS (SELECT count(*)::BIGINT AS n FROM seg),
        |cuts AS (
        |  SELECT min(CASE WHEN cum * 3 >= n THEN m_u END) AS b1,
        |         min(CASE WHEN cum * 3 >= n * 2 THEN m_u END) AS b2
        |  FROM cc, tot),
        |sym AS (
        |  SELECT event_type, day, segment,
        |         CASE WHEN m_u <= b1 THEN 'a' WHEN m_u <= b2 THEN 'b'
        |              ELSE 'c' END AS sym
        |  FROM seg, cuts),
        |w AS (
        |  SELECT event_type, day,
        |         concat_ws('',
        |           max(CASE WHEN segment = 0 THEN sym END),
        |           max(CASE WHEN segment = 1 THEN sym END),
        |           max(CASE WHEN segment = 2 THEN sym END),
        |           max(CASE WHEN segment = 3 THEN sym END)) AS word
        |  FROM sym GROUP BY 1, 2)
        |SELECT event_type, word, count(*)::BIGINT AS n_days
        |FROM w
        |GROUP BY 1, 2
        |HAVING count(*) >= 2
        |ORDER BY 1, 2""".stripMargin,
    // the NATIVE sliding semantics — each event replicated into its 3
    // windows; the engine composes the same answer from one-per-event
    // panes, which is the optimization the row gates
    "q346_pane_sliding" ->
      """WITH ev AS (
        |  SELECT event_type,
        |         (epoch_us(ts) // 300000000) * 300000000 AS pane_us,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |x AS (
        |  SELECT event_type, pane_us - off AS w_start_us, cents
        |  FROM ev, unnest([0, 300000000, 600000000]) AS t(off))
        |SELECT event_type, w_start_us, count(*)::BIGINT AS n_events,
        |       sum(cents)::DOUBLE / 100.0 AS sum_value
        |FROM x
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    // same day census, same 7-lag/1-lag splits, same integer MAE sums
    "q330_seasonal_naive_mase" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))::BIGINT AS v
        |  FROM events GROUP BY 1, 2),
        |mx AS (SELECT max(day) AS maxd FROM daily),
        |sc AS (
        |  SELECT event_type, day, v,
        |         lag(v, 7) OVER (PARTITION BY event_type ORDER BY day) AS v7,
        |         lag(v, 1) OVER (PARTITION BY event_type ORDER BY day) AS v1,
        |         CASE WHEN day > mx.maxd - 7 THEN 1 ELSE 0 END AS is_test
        |  FROM daily, mx)
        |SELECT event_type,
        |       sum(CASE WHEN is_test = 1 AND v7 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
        |         AS n_test,
        |       sum(CASE WHEN is_test = 1 AND v7 IS NOT NULL THEN abs(v - v7)
        |                ELSE 0 END)::BIGINT AS mae_fc_sum,
        |       sum(CASE WHEN is_test = 0 AND v1 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
        |         AS n_train_steps,
        |       sum(CASE WHEN is_test = 0 AND v1 IS NOT NULL THEN abs(v - v1)
        |                ELSE 0 END)::BIGINT AS mae_naive_sum,
        |       round((sum(CASE WHEN is_test = 1 AND v7 IS NOT NULL THEN abs(v - v7)
        |                       ELSE 0 END)::DOUBLE
        |              / sum(CASE WHEN is_test = 1 AND v7 IS NOT NULL THEN 1
        |                         ELSE 0 END)::DOUBLE)
        |             / (sum(CASE WHEN is_test = 0 AND v1 IS NOT NULL THEN abs(v - v1)
        |                         ELSE 0 END)::DOUBLE
        |                / sum(CASE WHEN is_test = 0 AND v1 IS NOT NULL THEN 1
        |                           ELSE 0 END)::DOUBLE), 6) AS mase
        |FROM sc
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // same snapped micro-nat log prices, same (µs, event_id) lag,
    // same exact integer Σr²/Σ|r|/max statistics
    "q321_realized_vol" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(ts) AS us, event_id,
        |         CAST(floor(ln(CAST(floor(value * 100.0 + 0.5) AS BIGINT)::DOUBLE)
        |                    * 1000000.0 + 0.5) AS BIGINT) AS lnp,
        |         epoch_us(ts) // 86400000000 AS day
        |  FROM events
        |  WHERE CAST(floor(value * 100.0 + 0.5) AS BIGINT) >= 1),
        |r AS (
        |  SELECT event_type, day,
        |         lnp - lag(lnp) OVER (PARTITION BY event_type, day
        |                              ORDER BY us, event_id) AS r
        |  FROM ev)
        |SELECT event_type, day, count(r)::BIGINT AS n_ret,
        |       round(sqrt(sum(r * r)::DOUBLE / 1e12), 6) AS realized_vol,
        |       round(sum(abs(r))::DOUBLE / 1e6, 6) AS realized_abs_var,
        |       round(max(abs(r))::DOUBLE / 1e6, 6) AS max_abs_ret,
        |       sum(r * r)::BIGINT AS rv_u2
        |FROM r
        |GROUP BY event_type, day
        |ORDER BY event_type, day""".stripMargin,
    // same (µs, event_id) order, same to-next/to-day-end durations,
    // same BIGINT weighted integral, same snapped divide
    "q304_twap" ->
      """WITH ev AS (
        |  SELECT epoch_us(ts) AS us, event_id,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
        |         epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |d AS (
        |  SELECT ev.*,
        |         coalesce(lead(us) OVER (PARTITION BY day ORDER BY us, event_id),
        |                  (day + 1) * 86400000000) - us AS dur
        |  FROM ev)
        |SELECT day, count(*)::BIGINT AS n,
        |       floor(sum(cents * dur)::DOUBLE / sum(dur)::DOUBLE + 0.5) / 100.0 AS twap
        |FROM d
        |GROUP BY day
        |ORDER BY day""".stripMargin,
    // same integer interval fold: running max over the (s, e)-ordered
    // ROWS frame, clamped contribution, island flag, cohort census
    "q290_interval_coverage" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) // 1000000 AS s,
        |         epoch_us(ts) // 1000000 + 60 +
        |           (CAST(floor(value * 100.0 + 0.5) AS BIGINT) % 600 + 600) % 600 AS e
        |  FROM events),
        |folded AS (
        |  SELECT user_id, s, e,
        |         max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM iv),
        |contrib AS (
        |  SELECT user_id,
        |         greatest(e - greatest(s, coalesce(pmax, -9223372036854775808)), 0) AS covered,
        |         CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS island
        |  FROM folded),
        |per_user AS (
        |  SELECT user_id, sum(covered)::BIGINT AS cov, sum(island)::BIGINT AS isl,
        |         count(*)::BIGINT AS nev
        |  FROM contrib GROUP BY user_id)
        |SELECT ((user_id % 25) + 25) % 25 AS cohort, count(*)::BIGINT AS n_users,
        |       sum(cov)::BIGINT AS covered_sec, sum(isl)::BIGINT AS islands,
        |       sum(nev)::BIGINT AS n_events, max(cov)::BIGINT AS max_user_covered
        |FROM per_user
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    // dominance stated blindly as a NOT-EXISTS anti-self-join — a
    // different algorithm from the engine's window plan, same frontier
    "q272_skyline" ->
      """WITH p AS (
        |  SELECT p_partkey, p_brand,
        |         CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT) AS pc,
        |         p_size::BIGINT AS sz
        |  FROM part)
        |SELECT p_brand, p_partkey, pc / 100.0 AS price, sz AS size
        |FROM p a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p b
        |  WHERE b.p_brand = a.p_brand AND b.pc <= a.pc AND b.sz <= a.sz
        |    AND (b.pc < a.pc OR b.sz < a.sz))
        |ORDER BY p_brand, price, p_partkey""".stripMargin,
    // same pairs, same dyadic weights (exact powers of two — no libm),
    // same micro quantization; the BIGINT credit sums are
    // order-invariant, so the compare is bit-identical
    "q197_decay_attribution" ->
      """WITH p AS (
        |  SELECT user_id, event_id AS p_id, ts AS p_ts, value AS p_value
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click'),
        |t AS (
        |  SELECT p.user_id, p.p_id, p.p_value,
        |         (epoch_us(p.p_ts) - epoch_us(c.c_ts)) // 86400000000 AS days_before
        |  FROM p JOIN c ON p.user_id = c.user_id
        |  WHERE c.c_ts < p.p_ts AND c.c_ts >= p.p_ts - INTERVAL 7 DAY),
        |w AS (
        |  SELECT *, 1.0 / (1::BIGINT << days_before::INT)::DOUBLE AS w FROM t),
        |s AS (SELECT *, sum(w) OVER (PARTITION BY p_id) AS sumw FROM w),
        |m AS (
        |  SELECT user_id, p_id,
        |         floor(w / sumw * p_value * 1000000.0 + 0.5)::BIGINT AS micro
        |  FROM s),
        |a AS (
        |  SELECT user_id, count(DISTINCT p_id)::BIGINT AS n_attributed,
        |         count(*)::BIGINT AS n_touches,
        |         sum(micro)::BIGINT AS attr_value_micro
        |  FROM m GROUP BY user_id),
        |tot AS (
        |  SELECT user_id, count(*)::BIGINT AS n_purchases
        |  FROM p GROUP BY user_id)
        |SELECT tot.user_id, tot.n_purchases,
        |       coalesce(a.n_attributed, 0)::BIGINT AS n_attributed,
        |       coalesce(a.n_touches, 0)::BIGINT AS n_touches,
        |       coalesce(a.attr_value_micro, 0)::BIGINT AS attr_value_micro
        |FROM tot LEFT JOIN a USING (user_id)
        |ORDER BY tot.user_id""".stripMargin,
    // the same life table + KM product: integer durations/counts, one
    // divide per factor, exp(Σln) under round 6, d=n carried as a flag
    // (ln(0) never evaluates — DuckDB would refuse it)
    "q192_kaplan_meier" ->
      """WITH g AS (SELECT max(o_orderdate) AS gmax FROM orders),
        |per AS (
        |  SELECT c.c_mktsegment AS cohort, o.o_custkey,
        |         date_diff('day', min(o.o_orderdate), max(o.o_orderdate))::BIGINT AS t,
        |         CASE WHEN date_diff('day', max(o.o_orderdate),
        |                             (SELECT gmax FROM g)) >= 90
        |              THEN 1 ELSE 0 END AS ev
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY c.c_mktsegment, o.o_custkey),
        |bt AS (
        |  SELECT cohort, t, sum(ev)::BIGINT AS d, count(*)::BIGINT AS c
        |  FROM per GROUP BY cohort, t),
        |rk AS (
        |  SELECT cohort, t, d, c,
        |         sum(c) OVER (PARTITION BY cohort ORDER BY t DESC)::BIGINT AS n_at_risk
        |  FROM bt),
        |ev AS (SELECT * FROM rk WHERE d > 0),
        |km AS (
        |  SELECT cohort, t, n_at_risk, d,
        |         sum(CASE WHEN d < n_at_risk
        |                  THEN ln((n_at_risk - d) / n_at_risk::DOUBLE)
        |                  ELSE 0.0 END)
        |           OVER (PARTITION BY cohort ORDER BY t) AS lnsum,
        |         max(CASE WHEN d >= n_at_risk THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY cohort ORDER BY t) AS hit0
        |  FROM ev)
        |SELECT cohort, t, n_at_risk, d,
        |       round(CASE WHEN hit0 = 1 THEN 0.0 ELSE exp(lnsum) END, 6) + 0.0
        |         AS survival
        |FROM km ORDER BY cohort, t""".stripMargin,
    // identical neighbor windows (IGNORE NULLS carriers), exact-integer
    // µs fraction, CASE-mirrored boundary and Δt=0 midpoint
    "q173_linear_interp" ->
      """WITH m AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |         CASE WHEN event_id % 7 = 3 THEN NULL ELSE value END AS v,
        |         (event_id % 7 = 3) AS is_masked
        |  FROM events),
        |w AS (
        |  SELECT *,
        |         last_value(v IGNORE NULLS) OVER wp AS pv,
        |         last_value(CASE WHEN v IS NOT NULL THEN us END IGNORE NULLS) OVER wp AS pus,
        |         first_value(v IGNORE NULLS) OVER wn AS nv,
        |         first_value(CASE WHEN v IS NOT NULL THEN us END IGNORE NULLS) OVER wn AS nus
        |  FROM m
        |  WINDOW wp AS (PARTITION BY user_id ORDER BY us, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |         wn AS (PARTITION BY user_id ORDER BY us, event_id
        |                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |SELECT user_id, event_id,
        |       round(CASE WHEN pv IS NULL OR nv IS NULL THEN NULL
        |                  WHEN nus = pus THEN (pv + nv) / 2
        |                  ELSE pv + (nv - pv) * ((us - pus)::DOUBLE / (nus - pus))
        |             END, 6) + 0.0 AS v_interp
        |FROM w WHERE is_masked ORDER BY user_id, event_id""".stripMargin,
    // the identical dyadic-weight chain: exact integer numerator under
    // the same (ts µs-truncated, event_id) order, ONE division by 2^28
    "q115_ewma" ->
      """WITH q AS (
        |  SELECT event_id, user_id, ts::TIMESTAMP AS ts, value,
        |         CAST(floor(value * 1048576 + 0.5) AS BIGINT) AS qv
        |  FROM events),
        |n AS (
        |  SELECT event_id, user_id, value,
        |         qv * 128 + lag(qv, 1, 0) OVER w * 64 +
        |         lag(qv, 2, 0) OVER w * 32 + lag(qv, 3, 0) OVER w * 16 +
        |         lag(qv, 4, 0) OVER w * 8 + lag(qv, 5, 0) OVER w * 4 +
        |         lag(qv, 6, 0) OVER w * 2 + lag(qv, 7, 0) OVER w AS ewma_num
        |  FROM q WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_id, user_id, value, CAST(ewma_num AS BIGINT) AS ewma_num,
        |       ewma_num::DOUBLE / 268435456.0 AS ewma
        |FROM n ORDER BY event_id""".stripMargin,
    // the same lag flags, running-sum session ids, and double-epoch
    // durations; µs-truncated ts so both engines see identical gaps
    // q192's KM chain verbatim, S snapped to the 6-dp integer grid,
    // then exact S_µ·Δt step areas with the τ-sentinel closing the tail
    "q414_rmst" ->
      """WITH g AS (SELECT max(o_orderdate) AS gmax FROM orders),
        |per AS (
        |  SELECT c.c_mktsegment AS cohort, o.o_custkey,
        |         date_diff('day', min(o.o_orderdate), max(o.o_orderdate))::BIGINT AS t,
        |         CASE WHEN date_diff('day', max(o.o_orderdate),
        |                             (SELECT gmax FROM g)) >= 90
        |              THEN 1 ELSE 0 END AS ev
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY c.c_mktsegment, o.o_custkey),
        |bt AS (
        |  SELECT cohort, t, sum(ev)::BIGINT AS d, count(*)::BIGINT AS c
        |  FROM per GROUP BY cohort, t),
        |rk AS (
        |  SELECT cohort, t, d, c,
        |         sum(c) OVER (PARTITION BY cohort ORDER BY t DESC)::BIGINT AS n_at_risk
        |  FROM bt),
        |evr AS (SELECT * FROM rk WHERE d > 0),
        |km AS (
        |  SELECT cohort, t,
        |         floor((CASE WHEN max(CASE WHEN d >= n_at_risk THEN 1 ELSE 0 END)
        |                  OVER (PARTITION BY cohort ORDER BY t) = 1 THEN 0.0
        |                ELSE exp(sum(CASE WHEN d < n_at_risk
        |                  THEN ln((n_at_risk - d) / n_at_risk::DOUBLE)
        |                  ELSE 0.0 END)
        |           OVER (PARTITION BY cohort ORDER BY t)) END) * 1000000.0
        |               + 0.5)::BIGINT AS s_u
        |  FROM evr),
        |sen AS (
        |  SELECT cohort, t, s_u FROM km WHERE t < 180
        |  UNION ALL
        |  SELECT DISTINCT cohort, 180::BIGINT, 0::BIGINT FROM km),
        |seg AS (
        |  SELECT cohort,
        |         (lag(s_u, 1, 1000000) OVER w) *
        |         (t - lag(t, 1, 0) OVER w) AS area_u
        |  FROM sen WINDOW w AS (PARTITION BY cohort ORDER BY t)),
        |ns AS (SELECT cohort, count(*)::BIGINT AS n_subjects FROM per GROUP BY 1)
        |SELECT s.cohort, ns.n_subjects,
        |       round(sum(s.area_u)::DOUBLE / 1000000.0, 6) + 0.0 AS rmst_days
        |FROM seg s JOIN ns USING (cohort)
        |GROUP BY s.cohort, ns.n_subjects ORDER BY s.cohort""".stripMargin,
    // same arrival-order frontier, same minute grid, same
    // cumulative-census order statistics
    "q411_disorder_profile" ->
      """WITH late AS (
        |  SELECT event_type,
        |         greatest(max(epoch_us(ts)) OVER (PARTITION BY user_id
        |             ORDER BY event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           - epoch_us(ts), 0) // 60000000 AS late_m
        |  FROM events
        |  QUALIFY max(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NOT NULL),
        |census AS (
        |  SELECT event_type, late_m, count(*)::BIGINT AS c,
        |         sum(count(*)) OVER (PARTITION BY event_type
        |                             ORDER BY late_m)::BIGINT AS cum,
        |         sum(count(*)) OVER (PARTITION BY event_type)::BIGINT AS ntot
        |  FROM late GROUP BY 1, 2)
        |SELECT event_type, max(ntot) AS n,
        |       (sum(CASE WHEN late_m > 0 THEN c ELSE 0 END) * 1000000
        |        // max(ntot))::BIGINT AS late_share_ppm,
        |       min(CASE WHEN cum * 2 >= ntot THEN late_m END) AS p50_min,
        |       min(CASE WHEN cum * 10 >= ntot * 9 THEN late_m END) AS p90_min,
        |       min(CASE WHEN cum * 100 >= ntot * 99 THEN late_m END) AS p99_min,
        |       max(late_m) AS max_late_min
        |FROM census GROUP BY 1 ORDER BY 1""".stripMargin,
    // q97's session device; entry/exit via double row_number under
    // the same (µs, event_id) total order as the engine's struct-min/max
    "q412_entry_exit_census" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id, event_type, epoch_us(ts) AS us,
        |         epoch_ms(ts)::DOUBLE / 1000.0
        |           - lag(epoch_ms(ts)::DOUBLE / 1000.0) OVER w AS gap_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |marked AS (
        |  SELECT *, CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1
        |                 ELSE 0 END AS new_s
        |  FROM ev),
        |sess AS (
        |  SELECT user_id, event_type, us, event_id,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked),
        |sess2 AS (
        |  SELECT *,
        |         row_number() OVER (PARTITION BY user_id, sid
        |           ORDER BY us, event_id) AS rn_a,
        |         row_number() OVER (PARTITION BY user_id, sid
        |           ORDER BY us DESC, event_id DESC) AS rn_d
        |  FROM sess),
        |agg AS (
        |  SELECT user_id, sid, count(*)::BIGINT AS n_events,
        |         max(CASE WHEN rn_a = 1 THEN event_type END) AS entry,
        |         max(CASE WHEN rn_d = 1 THEN event_type END) AS exit
        |  FROM sess2 GROUP BY 1, 2),
        |tot AS (SELECT count(*)::BIGINT AS n_total FROM agg)
        |SELECT a.entry, a.exit, count(*)::BIGINT AS n_sessions,
        |       sum(CASE WHEN a.n_events = 1 THEN 1 ELSE 0 END)::BIGINT
        |         AS n_bounces,
        |       (count(*) * 1000000 // max(t.n_total))::BIGINT AS share_ppm
        |FROM agg a, tot t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q97_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS ts FROM events),
        |g AS (
        |  SELECT user_id, event_id, ts,
        |         epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_s
        |  FROM e),
        |s AS (
        |  SELECT user_id, ts,
        |         sum(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g),
        |per AS (
        |  SELECT user_id, sid, count(*)::BIGINT AS n_events,
        |         max(epoch(ts)) - min(epoch(ts)) AS dur_s
        |  FROM s GROUP BY 1, 2)
        |SELECT user_id, count(*)::BIGINT AS n_sessions,
        |       sum(n_events)::BIGINT AS n_events,
        |       max(n_events)::BIGINT AS max_session_events,
        |       round(avg(dur_s), 4) AS avg_session_secs
        |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin,
    // ts truncated to µs on the oracle side (ts::TIMESTAMP) to match
    // the engine's nanos→micros read; lag-collapse, version numbering,
    // and the lead() ranges replayed with the same (ts, event_id) order
    "q89_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, ts::TIMESTAMP AS ts
        |  FROM events),
        |c AS (
        |  SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM e),
        |v AS (
        |  SELECT user_id, ts, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
        |         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM c WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, count(*)::BIGINT AS n_versions,
        |       min_by(event_type, version) AS first_type,
        |       max_by(event_type, version) AS last_type,
        |       round(avg(epoch(valid_to) - epoch(ts)), 4) AS avg_version_secs
        |FROM v GROUP BY user_id ORDER BY user_id""".stripMargin,
    // same grid rebuilt from the span min/max; IGNORE NULLS last_value
    // over the running frame is the forward fill in both engines
    "q81_gap_fill" ->
      """WITH b AS (SELECT min(ts::DATE) AS d0, max(ts::DATE) AS d1 FROM events),
        |days AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM b),
        |u AS (SELECT DISTINCT user_id FROM events),
        |obs AS (SELECT user_id, ts::DATE AS day, round(avg(value), 6) AS v_avg,
        |               count(*)::BIGINT AS n
        |        FROM events GROUP BY 1, 2)
        |SELECT u.user_id, d.day,
        |       coalesce(obs.n, 0)::BIGINT AS n_events,
        |       last_value(obs.v_avg IGNORE NULLS) OVER (
        |         PARTITION BY u.user_id ORDER BY d.day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill,
        |       CASE WHEN obs.n IS NULL THEN 1 ELSE 0 END AS is_gap
        |FROM u CROSS JOIN days d
        |LEFT JOIN obs ON obs.user_id = u.user_id AND obs.day = d.day
        |ORDER BY u.user_id, d.day""".stripMargin,
    "q20_window_rank" ->
      """SELECT * FROM (
        |  SELECT c_nationkey, c_custkey,
        |    round(c_acctbal, 2) AS acctbal,
        |    CAST(row_number() OVER w AS INTEGER) AS rn,
        |    CAST(rank() OVER w AS INTEGER) AS rk,
        |    CAST(dense_rank() OVER w AS INTEGER) AS drk,
        |    CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |    round(percent_rank() OVER w, 4) AS prk,
        |    round(cume_dist() OVER w, 4) AS cd
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
        |) WHERE rn <= 5 ORDER BY c_nationkey, rn""".stripMargin,
    "q21_window_analytic" ->
      """SELECT o_custkey, o_orderkey,
        |  round(o_totalprice, 2) AS price,
        |  round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
        |  round(lead(o_totalprice, 1) OVER w, 2) AS next_price,
        |  round(first_value(o_totalprice) OVER w, 2) AS first_price,
        |  round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q22_window_frames" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_sum,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS mov_sum3,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_remaining,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |    RANGE BETWEEN 100 PRECEDING AND CURRENT ROW), 2) AS rng_sum
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q23_window_topk" ->
      """SELECT * FROM (
        |  SELECT o_orderpriority, o_orderkey,
        |    round(o_totalprice, 2) AS price,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
        |  FROM orders
        |) WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,
    "q24_window_share" ->
      """SELECT l_orderkey, l_linenumber,
        |  count(*) OVER (PARTITION BY l_orderkey) AS n_lines,
        |  round(l_extendedprice / sum(l_extendedprice) OVER (PARTITION BY l_orderkey), 4) AS price_share
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
