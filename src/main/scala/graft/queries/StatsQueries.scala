package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-16 widening: the survival-analysis family (Kaplan–Meier /
  * Nelson–Aalen, log-rank), repeated-measures and median tests
  * (Cochran's Q, Mood's median), SPC (EWMA control chart beside q271's
  * CUSUM), marketing science (geometric adstock, time-decay attribution
  * beside q322 Shapley / q328 Markov), finance (drawdown + Sharpe),
  * text collocations (PMI beside q323's feature MI), and inventory
  * (EOQ beside q439's newsvendor).
  *
  * Exactness devices (the house rules): every flag is decided on an
  * integer lattice; every ln TERM is snapped to a 1e-9 BIGINT grid
  * BEFORE any census sum (the q435 device); decay weights are powers of
  * two (binary-exact, carried as shifted BIGINTs); IEEE sqrt is
  * correctly rounded and safe unmirrored; float chains that must agree
  * across engines are written with IDENTICAL operation order on both
  * sides so each intermediate rounds identically.
  *
  * Scale notes: every window here runs over an aggregate census
  * (PlanGuards-bounded — calendar days or the cents/value domain, not
  * data rows); per-user joins are bounded by per-user event counts; the
  * only global sort is a TakeOrdered top-k.
  */
object StatsQueries extends QueryModule {

  /** q443: COCHRAN'S Q TEST — the k-treatment repeated-measures test for
    * binary outcomes (q373's McNemar is the k=2 case; q393's Friedman
    * ranks continuous outcomes): did the weekly purchase propensity of
    * the SAME users change across the four weeks of the event window?
    * Subject = user, treatment j = week j (days 7j..7j+6), X_ij = 1 iff
    * the user purchased in week j (absent cells are 0 by construction).
    *
    * Determinism: Q = (k−1)(k·ΣC_j² − N²) / (k·N − ΣR_i²) is a ratio of
    * exact BIGINTs; the reject flag is decided on the integer lattice
    * q_num·10⁶ > 7 814 728·q_den (χ²₃ 0.05 = 7.814728), so no float
    * boundary can flip it. Scale: two fact-table aggregates (per-user,
    * per-week) and a 1-row cross join — the census-first shape.
    */
  def q443CochranQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("p"))
    val d0 = ev.agg(min("day").as("day0"))
    val weekly = ev.crossJoin(broadcast(d0))
      .withColumn("rel", col("day") - col("day0"))
      .filter(col("rel") < 28)
      .withColumn("week", expr("rel div 7"))
      .groupBy("user_id", "week").agg(max("p").as("x"))
      .localCheckpoint()
    val rows = weekly.groupBy("user_id").agg(sum("x").as("r"))
      .agg(count(lit(1)).as("n_users"), sum("r").as("n_tot"),
        sum(expr("r * r")).as("r2"))
    val cols = weekly.groupBy("week").agg(sum("x").as("c"))
      .agg(sum(expr("c * c")).as("sum_c2"),
        sum(when(col("week") === 0, col("c")).otherwise(0L)).as("w0"),
        sum(when(col("week") === 1, col("c")).otherwise(0L)).as("w1"),
        sum(when(col("week") === 2, col("c")).otherwise(0L)).as("w2"),
        sum(when(col("week") === 3, col("c")).otherwise(0L)).as("w3"))
    rows.crossJoin(broadcast(cols))
      .withColumn("q_num", expr("3L * (4L * sum_c2 - n_tot * n_tot)"))
      .withColumn("q_den", expr("4L * n_tot - r2"))
      .select(col("n_users"), col("w0"), col("w1"), col("w2"), col("w3"),
        col("n_tot"), col("q_num"), col("q_den"),
        expr("round(CAST(q_num AS DOUBLE) / q_den, 6)").as("q_stat"),
        expr("CASE WHEN q_num * 1000000L > 7814728L * q_den THEN 1L ELSE 0L END")
          .as("reject"))
  }

  /** q444: KAPLAN–MEIER product-limit + NELSON–AALEN cumulative hazard —
    * the survival table behind every time-to-event readout (q396 reports
    * the lag census; this estimates the censoring-correct survival
    * CURVE): subject = user, origin = first event day, event = first
    * purchase, censored at the global horizon (last event day).
    *
    * Determinism: the KM curve is carried in LOG space — each factor
    * ln(1 − d_t/n_t) is snapped to the 1e-9 grid BEFORE the cumulative
    * sum (the q435 term-snap device), so the emitted log-survival is an
    * exact BIGINT; Nelson–Aalen is the same snap on d_t/n_t. If the risk
    * set ever dies out entirely (d = n, survival exactly 0 — only
    * possible at the last event time), log-survival is NULL from that
    * row on. Scale: one per-user aggregate, then a ≤-horizon-row census;
    * the windows run over that census (PlanGuards-bounded).
    */
  def q444KaplanMeier(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("p"))
    val d0 = ev.agg(min("day").as("day0"), max("day").as("day1"))
    val per = ev.crossJoin(broadcast(d0))
      .select(col("user_id"), (col("day") - col("day0")).as("rel"), col("p"),
        (col("day1") - col("day0")).as("h"))
      .groupBy("user_id")
      .agg(min("rel").as("t0"),
        min(when(col("p") === 1L, col("rel"))).as("tp"), max("h").as("h"))
    val subj = per.select(
      when(col("tp").isNotNull, col("tp") - col("t0"))
        .otherwise(col("h") - col("t0")).as("t"),
      when(col("tp").isNotNull, 1L).otherwise(0L).as("e"))
    val census = subj.groupBy("t")
      .agg(sum("e").as("d"), sum(expr("1L - e")).as("c_cens"),
        count(lit(1)).as("m"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    census.withColumn("n_risk", sum("m").over(wDesc))
      .withColumn("na_term",
        expr("CAST(floor(CAST(d AS DOUBLE) / n_risk * 1.0e9 + 0.5) AS BIGINT)"))
      .withColumn("km_term", expr(
        "CASE WHEN d < n_risk THEN " +
          "CAST(floor(ln(CAST(n_risk - d AS DOUBLE) / n_risk) * 1.0e9 + 0.5) AS BIGINT) " +
          "ELSE 0L END"))
      .withColumn("dead", when(col("d") === col("n_risk"), 1L).otherwise(0L))
      .withColumn("na_e9", sum("na_term").over(wAsc))
      .withColumn("km_raw", sum("km_term").over(wAsc))
      .withColumn("cum_dead", sum("dead").over(wAsc))
      .select(col("t"), col("n_risk"), col("d").as("d_events"),
        col("c_cens").as("censored"), col("na_e9"),
        when(col("cum_dead") === 0L, col("km_raw"))
          .otherwise(lit(null).cast("long")).as("log_surv_e9"))
      .orderBy("t")
  }

  /** q445: LOG-RANK TEST — the two-group survival comparison that closes
    * the q444 family (KM estimates each curve; log-rank asks whether the
    * md5-coin arms' time-to-purchase distributions DIFFER, the primary
    * endpoint test of every A/B with a time-to-event outcome). Arms use
    * the house md5 coin (the q440/q441 device, 'lr#' salt).
    *
    * Determinism: O₁ is an exact BIGINT; the per-event-time expectation
    * d·n₁/n and variance d·(n₁/n)·((n−n₁)/n)·((n−d)/(n−1)) terms are
    * snapped to the 1e-9 grid before the census sums; χ² is the same
    * IEEE chain on those BIGINTs in both engines, and the reject flag is
    * decided on the 1e-6-snapped lattice vs 3 841 459 (χ²₁ 0.05).
    * Scale: the q444 shape plus one conditional aggregate per arm.
    */
  def q445LogRank(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("p"),
        expr("cast(conv(substring(md5(concat('lr#', cast(user_id as string))), 1, 2), 16, 10) as bigint) % 2")
          .as("g"))
    val d0 = ev.agg(min("day").as("day0"), max("day").as("day1"))
    val per = ev.crossJoin(broadcast(d0))
      .select(col("user_id"), (col("day") - col("day0")).as("rel"), col("p"),
        (col("day1") - col("day0")).as("h"), col("g"))
      .groupBy("user_id")
      .agg(min("rel").as("t0"),
        min(when(col("p") === 1L, col("rel"))).as("tp"),
        max("h").as("h"), max("g").as("g"))
    val subj = per.select(
      when(col("tp").isNotNull, col("tp") - col("t0"))
        .otherwise(col("h") - col("t0")).as("t"),
      when(col("tp").isNotNull, 1L).otherwise(0L).as("e"), col("g"))
    val census = subj.groupBy("t")
      .agg(sum("e").as("d"), count(lit(1)).as("m"),
        sum(when(col("g") === 1L, col("e")).otherwise(0L)).as("d1"),
        sum(when(col("g") === 1L, 1L).otherwise(0L)).as("m1"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val terms = census
      .withColumn("n", sum("m").over(wDesc))
      .withColumn("n1", sum("m1").over(wDesc))
      .filter(col("d") > 0)
      .withColumn("e1_term",
        expr("CAST(floor(CAST(d AS DOUBLE) * n1 / n * 1.0e9 + 0.5) AS BIGINT)"))
      .withColumn("v_term", expr(
        "CASE WHEN n > 1 THEN CAST(floor(CAST(d AS DOUBLE) * n1 / n * (n - n1) / n * (n - d) / (n - 1) * 1.0e9 + 0.5) AS BIGINT) ELSE 0L END"))
    terms.agg(count(lit(1)).as("n_times"), sum("d1").as("o1"),
        sum("e1_term").as("e1_e9"), sum("v_term").as("v_e9"))
      .select(col("n_times"), col("o1"), col("e1_e9"), col("v_e9"),
        expr("round(((o1 - e1_e9 / 1.0e9) * (o1 - e1_e9 / 1.0e9)) / (v_e9 / 1.0e9), 6)")
          .as("chi2"),
        expr("CASE WHEN CAST(floor(((o1 - e1_e9 / 1.0e9) * (o1 - e1_e9 / 1.0e9)) / (v_e9 / 1.0e9) * 1.0e6 + 0.5) AS BIGINT) > 3841459L THEN 1L ELSE 0L END")
          .as("reject"))
  }

  /** q446: GEOMETRIC ADSTOCK — the carryover transform of marketing-mix
    * modeling (spend today keeps working tomorrow at decay r): per
    * channel (view/click as the spend proxies), adstock_t =
    * Σ_{s≤t} spend_s · r^(t−s) with r = 1/2.
    *
    * Determinism: r = 1/2 makes every weight a power of two — the
    * adstock is carried as the EXACT BIGINT Σ spend_cents·2^(29−lag)
    * (spend ≲ 10⁷ cents/day · 2³⁰ ≪ 2⁶³), and the readable value is one
    * IEEE divide by 2²⁹. Scale: the convolution is a self-join of the
    * per-(channel, day) census — 30-row-per-channel, domain-bounded, the
    * same grid shape at any data scale.
    */
  def q446Adstock(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_type").as("channel"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
    val d0 = ev.agg(min("day").as("day0"))
    val census = ev.crossJoin(broadcast(d0))
      .groupBy(col("channel"), (col("day") - col("day0")).as("d"))
      .agg(sum("cents").as("s"))
      .localCheckpoint()
    val a = census.as("a")
    val b = census.as("b")
    // lag cap ≤ 29 keeps the shift amount in [0, 29] — a no-op on the
    // 30-day fixture grid, and on a longer span it truncates the
    // carryover (windowed adstock) instead of letting shiftleft wrap
    // mod 64 into silent garbage weights (mirrored in the oracle)
    a.join(b, col("a.channel") === col("b.channel") && col("b.d") <= col("a.d")
        && col("a.d") - col("b.d") <= 29)
      .groupBy(col("a.channel"), col("a.d"), col("a.s"))
      .agg(sum(expr("b.s * shiftleft(1L, CAST(29 - (a.d - b.d) AS INT))"))
        .as("adstock_q29"))
      .toDF("channel", "day", "spend_cents", "adstock_q29")
      .withColumn("adstock",
        expr("round(CAST(adstock_q29 AS DOUBLE) / 5.36870912e8, 6)"))
      .orderBy("channel", "day")
  }

  /** q447: MAXIMUM DRAWDOWN + SHARPE of the order-revenue index — the
    * finance pair behind "how bad did the slow stretch get" (drawdown of
    * the constant-rate-detrended cumulative revenue) and "how stable is
    * the daily flow" (mean/σ of daily revenue). Detrending (index_t =
    * n·cum_t − (t+1)·total, the cumsum minus the straight line to the
    * endpoint, n-scaled to stay integral) is what makes drawdown
    * non-trivial on an always-positive revenue series.
    *
    * Determinism: the index, running max, and drawdown are exact BIGINTs
    * (drawdown is reported div n, back in cents); peak/trough days break
    * ties by earliest day; Sharpe is an IEEE chain over exact integer
    * moments — Σx² rides DECIMAL(38,0) ↔ HUGEINT (the round-17 sf1 probe
    * caught the BIGINT sum overflowing at 10×; both engines' wide-int →
    * double conversions round identically) with
    * correctly-rounded sqrt. Scale: everything past the per-day
    * aggregate runs over the ~2 400-row calendar census
    * (PlanGuards-bounded; a 100 TB fact table still has ≤ the calendar's
    * days).
    */
  def q447DrawdownSharpe(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .select(expr("unix_micros(o_orderdate) div 86400000000").as("day"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
      .groupBy("day").agg(sum("cents").as("cents"))
      .withColumn("x", expr("cents div 100"))
    // Σx² is dollars²-scale — BIGINT overflows at sf1 (probe-measured);
    // DECIMAL(38,0) ↔ HUGEINT, converted once in the Sharpe chain.
    // Widen BEFORE the product (matching the oracle's x::HUGEINT * x):
    // a post-product cast still computes x*x in BIGINT and throws under
    // ANSI once one per-term product exceeds 2⁶³
    val tot = daily.agg(count(lit(1)).as("n"), sum("cents").as("s"),
      sum("x").as("sx"), sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sx2"))
    val wAsc = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = daily
      .withColumn("t", row_number().over(Window.orderBy("day")) - 1)
      .withColumn("cum", sum("cents").over(wAsc))
      .crossJoin(broadcast(tot))
      .withColumn("dev", expr("n * cum - (t + 1) * s"))
      .withColumn("runmax", max("dev").over(wAsc))
      .withColumn("dd", col("runmax") - col("dev"))
      .localCheckpoint()
    val trough = scored.orderBy(col("dd").desc, col("day").asc).limit(1)
      .select(col("day").as("trough_day"), col("runmax").as("rm"),
        col("dd").as("mdd"), col("n"), col("s"), col("sx"), col("sx2"))
    val peak = scored
      .crossJoin(broadcast(trough.select(col("trough_day").as("td"), col("rm").as("rmv"))))
      .filter(col("dev") === col("rmv") && col("day") <= col("td"))
      .agg(min("day").as("peak_day"))
    trough.crossJoin(broadcast(peak))
      .select(col("n").as("n_days"),
        expr("mdd div n").as("max_drawdown_cents"),
        col("peak_day"), col("trough_day"),
        expr("round(CAST(sx AS DOUBLE) / n, 6)").as("mean_daily_dollars"),
        expr("round((CAST(sx AS DOUBLE) / n) / sqrt((CAST(n AS DOUBLE) * sx2 - CAST(sx AS DOUBLE) * sx) / (CAST(n AS DOUBLE) * (n - 1))), 6)")
          .as("sharpe_daily"))
  }

  /** q448: EWMA CONTROL CHART (Roberts '59) — the small-shift-sensitive
    * SPC chart beside q271's CUSUM (CUSUM accumulates excesses; EWMA
    * exponentially forgets): daily active users vs 3σ time-varying
    * control limits, λ = 1/2, chart centered at the series mean.
    *
    * Determinism: λ = 1/2 makes the smoothing weights powers of two —
    * the data part of z_t is the exact BIGINT Σ u_s·2^(29−(t−s)) (one
    * divide by 2³⁰ to read), the μ·2^(−(t+1)) init term is one divide,
    * and the limit is the same IEEE chain both sides (variance from
    * exact moments, correctly-rounded sqrt, 1−4^(−(t+1)) from a shifted
    * BIGINT). The signal flag compares the 1e-6-snapped |z−μ| and limit
    * lattices. Scale: the q446 census-grid convolution — 30 rows.
    */
  def q448EwmaChart(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
    val d0 = ev.agg(min("day").as("day0"))
    val census = ev.crossJoin(broadcast(d0))
      .select(col("user_id"), (col("day") - col("day0")).as("d"))
      .distinct()
      .groupBy("d").agg(count(lit(1)).as("u"))
      .localCheckpoint()
    val tot = census.agg(count(lit(1)).as("n"), sum("u").as("us"),
      sum(expr("u * u")).as("us2"))
    val a = census.as("a")
    val b = census.as("b")
    // shift-lattice bounds (no-ops on the ≤30-day fixture grid,
    // mirrored in the oracle): the convolution lag is capped at 29 so
    // the 2^(29-lag) weight can't wrap mod 64, and the init/limit
    // shifts are clamped at 62 — past that the terms are < 2^-53·value,
    // i.e. already zero on the 1e-6 readout lattice, so the clamp is
    // exact where it engages instead of silently wrapping
    a.join(b, col("b.d") <= col("a.d") && col("a.d") - col("b.d") <= 29)
      .groupBy(col("a.d"), col("a.u"))
      .agg(sum(expr("b.u * shiftleft(1L, CAST(29 - (a.d - b.d) AS INT))")).as("zq"))
      .toDF("d", "u", "zq")
      .crossJoin(broadcast(tot))
      .withColumn("mu", expr("CAST(us AS DOUBLE) / n"))
      .withColumn("ewma_raw", expr(
        "CAST(zq AS DOUBLE) / 1.073741824e9 + CAST(us AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(shiftleft(1L, CAST(least(d + 1, 62L) AS INT)) AS DOUBLE))"))
      .withColumn("lim", expr(
        "CAST(3 AS DOUBLE) * sqrt((CAST(n AS DOUBLE) * us2 - CAST(us AS DOUBLE) * us) / (CAST(n AS DOUBLE) * (n - 1))) * sqrt((CAST(1 AS DOUBLE) / CAST(3 AS DOUBLE)) * (CAST(1 AS DOUBLE) - CAST(1 AS DOUBLE) / CAST(shiftleft(1L, CAST(least(2 * d + 2, 62L) AS INT)) AS DOUBLE)))"))
      .select(col("d").as("day"), col("u").as("n_active"),
        expr("round(ewma_raw, 6)").as("ewma"),
        expr("round(mu + lim, 6)").as("ucl"),
        expr("round(mu - lim, 6)").as("lcl"),
        expr("CASE WHEN CAST(floor(abs(ewma_raw - mu) * 1.0e6 + 0.5) AS BIGINT) > CAST(floor(lim * 1.0e6 + 0.5) AS BIGINT) THEN 1L ELSE 0L END")
          .as("signal"))
      .orderBy("day")
  }

  /** q449: PMI COLLOCATIONS — pointwise mutual information over adjacent
    * word pairs, the classic collocation extractor (Church & Hanks '90)
    * and the lexical sibling of q323's feature-MI: which bigrams co-occur
    * far above chance? Min support 5, top 20 by PMI.
    *
    * Determinism: PMI = ln(c_ab·N_uni² / (N_bg·c_a·c_b)) — the argument
    * is the identical left-associated double chain on exact BIGINT
    * counts in both engines, and the value is snapped to the 1e-9 grid;
    * the top-20 order is totally tied-broken by (pmi, w1, w2). Scale:
    * bigram and unigram censuses shuffle on their keys with map-side
    * partial aggregation; the support filter prunes before the count
    * joins; the final top-k is a TakeOrdered heap, not a global sort.
    */
  def q449PmiCollocations(spark: SparkSession, dir: String): DataFrame = {
    val d0 = Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val uni = d0.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
      .localCheckpoint()
    val nu = uni.agg(sum("cw").as("nu"))
    val nbg = d0.select((size(col("ws")) - 1).cast("long").as("k"))
      .agg(sum("k").as("nbg"))
    val bg = d0.select(explode(expr(
        "transform(slice(ws, 1, size(ws) - 1), (x, i) -> struct(x AS w1, element_at(ws, i + 2) AS w2))"))
        .as("bgp"))
      .select(col("bgp.w1").as("w1"), col("bgp.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 5)
    bg.join(uni.toDF("w1", "ca"), "w1")
      .join(uni.toDF("w2", "cb"), "w2")
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nbg))
      .withColumn("pmi_e9", expr(
        "CAST(floor(ln((CAST(c_ab AS DOUBLE) * nu * nu) / (CAST(nbg AS DOUBLE) * ca * cb)) * 1.0e9 + 0.5) AS BIGINT)"))
      .orderBy(col("pmi_e9").desc, col("w1").asc, col("w2").asc)
      .limit(20)
      .select("w1", "w2", "c_ab", "ca", "cb", "pmi_e9")
  }

  /** q450: TIME-DECAY ATTRIBUTION — the recency-weighted member of the
    * attribution family (q322 Shapley is coalition-fair, q328 Markov is
    * path-counterfactual; time-decay is what practitioners actually
    * deploy): each purchase splits credit over its prior 7 days of
    * view/click touches with weight 2^(−days_ago).
    *
    * Determinism: weights are the exact BIGINTs 2^(7−gap); each touch's
    * share is w·10⁶ div Σw on the per-conversion integer lattice; the
    * channel totals are sums of those BIGINTs. Scale: the conversion ×
    * touch join is per-user bounded (the q384 device) and the
    * per-conversion normalizer is one partitioned window — no global
    * state.
    */
  def q450TimeDecayAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("unix_micros(ts)").as("us"))
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("cid"), col("us").as("pus"))
    val touch = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_type").as("channel"),
        col("us").as("tus"))
    val pairs = conv.join(touch, Seq("user_id"))
      .filter(col("tus") < col("pus") &&
        col("pus") - col("tus") <= lit(604800000000L))
      .withColumn("w",
        expr("shiftleft(1L, CAST(7 - (pus - tus) div 86400000000 AS INT))"))
    pairs.withColumn("sumw", sum("w").over(Window.partitionBy("cid")))
      .withColumn("credit", expr("w * 1000000L div sumw"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_touches"),
        countDistinct("cid").as("n_conversions"),
        sum("credit").as("credit_ppm"))
      .orderBy("channel")
  }

  /** q451: ECONOMIC ORDER QUANTITY — the √(2DS/h) lot-size formula, the
    * deterministic-demand complement of q439's newsvendor (newsvendor
    * prices uncertainty; EOQ prices the order-vs-holding tradeoff):
    * per part class, EOQ vs the naive mean-order-size lot, total-cost
    * both, at S = 100 per order and h = 2 per unit.
    *
    * Determinism: D and the per-order mean are exact BIGINTs
    * (half-up-rounded quantities, the q439 device); 2DS/h = 100·D stays
    * integral; IEEE sqrt is correctly rounded, and the two cost curves
    * are the identical double chain both sides. Scale: one fact-table
    * aggregate per class after a broadcast dim join.
    */
  def q451Eoq(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
        .select(col("p_partkey"),
          expr("element_at(split(p_type, ' '), 1)").as("cls"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("cls"), col("l_orderkey"),
        floor(col("l_quantity") + 0.5).cast("long").as("q"))
      .groupBy("cls")
      .agg(sum("q").as("d_total"),
        countDistinct("l_orderkey").as("n_orders"))
      .withColumn("q_alt", expr("(2L * d_total + n_orders) div (2L * n_orders)"))
      .select(col("cls"), col("d_total"), col("n_orders"), col("q_alt"),
        expr("round(sqrt(CAST(100L * d_total AS DOUBLE)), 6)").as("eoq"),
        expr("round(CAST(d_total AS DOUBLE) / sqrt(CAST(100L * d_total AS DOUBLE)) * CAST(100 AS DOUBLE) + sqrt(CAST(100L * d_total AS DOUBLE)), 6)")
          .as("tc_eoq"),
        expr("round(CAST(d_total AS DOUBLE) / q_alt * CAST(100 AS DOUBLE) + CAST(q_alt AS DOUBLE), 6)")
          .as("tc_alt"))
      .withColumn("savings", expr(
        "round((CAST(d_total AS DOUBLE) / q_alt * CAST(100 AS DOUBLE) + CAST(q_alt AS DOUBLE)) - (CAST(d_total AS DOUBLE) / sqrt(CAST(100L * d_total AS DOUBLE)) * CAST(100 AS DOUBLE) + sqrt(CAST(100L * d_total AS DOUBLE))), 6)"))
      .orderBy("cls")
  }

  /** q452: MOOD'S MEDIAN TEST — the coarsest, most outlier-proof member
    * of the k-group location family (q316's Kruskal–Wallis ranks
    * everything; q358's Brown–Forsythe tests SPREAD; Mood only asks
    * "above or below the grand median?"): order totals across the five
    * order priorities.
    *
    * Determinism: the grand median is the exact type-1 lower median from
    * the cents-census cumulative (the q358 device, unpartitioned but
    * census-bounded — distinct cents ≤ the price domain, not data rows);
    * the 2×k χ² terms are snapped to the 1e-9 grid before the sum and
    * the reject flag compares that BIGINT to 9 487 729 037 (χ²₄ 0.05 =
    * 9.487729). Scale: two fact aggregates + a domain-bounded census
    * window.
    */
  def q452MoodMedian(spark: SparkSession, dir: String): DataFrame = {
    val x = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("priority"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("v"))
    val census = x.groupBy("v").agg(count(lit(1)).as("cnt"))
    val n = census.agg(sum("cnt").as("n"))
    val med = census.crossJoin(broadcast(n))
      .withColumn("cum", sum("cnt").over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum") * 2 >= col("n") + 1)
      .agg(min("v").as("med"))
    val grp = x.crossJoin(broadcast(med)).groupBy("priority")
      .agg(count(lit(1)).as("n_g"),
        sum(when(col("v") > col("med"), 1L).otherwise(0L)).as("above"))
      .withColumn("below", col("n_g") - col("above"))
      .localCheckpoint()
    val tots = grp.agg(sum("n_g").as("nn"), sum("above").as("aa"))
    val terms = grp.crossJoin(broadcast(tots))
      .withColumn("exp_a", expr("CAST(n_g AS DOUBLE) * aa / nn"))
      .withColumn("exp_b", expr("CAST(n_g AS DOUBLE) * (nn - aa) / nn"))
      .withColumn("ta", expr(
        "CAST(floor((above - exp_a) * (above - exp_a) / exp_a * 1.0e9 + 0.5) AS BIGINT)"))
      .withColumn("tb", expr(
        "CAST(floor((below - exp_b) * (below - exp_b) / exp_b * 1.0e9 + 0.5) AS BIGINT)"))
    val chi = terms.agg(sum(expr("ta + tb")).as("chi_e9"))
    terms.crossJoin(broadcast(chi))
      .select(col("priority"), col("n_g"), col("above"), col("below"),
        round(col("exp_a"), 6).as("exp_above"),
        expr("round(CAST(chi_e9 AS DOUBLE) / 1.0e9, 6)").as("chi2"),
        expr("CASE WHEN chi_e9 > 9487729037L THEN 1L ELSE 0L END").as("reject"))
      .orderBy("priority")
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q443_cochran_q" -> (q443CochranQ _),
    "q444_kaplan_meier" -> (q444KaplanMeier _),
    "q445_logrank" -> (q445LogRank _),
    "q446_adstock" -> (q446Adstock _),
    "q447_drawdown_sharpe" -> (q447DrawdownSharpe _),
    "q448_ewma_chart" -> (q448EwmaChart _),
    "q449_pmi_collocations" -> (q449PmiCollocations _),
    "q450_time_decay_attribution" -> (q450TimeDecayAttribution _),
    "q451_eoq" -> (q451Eoq _),
    "q452_mood_median" -> (q452MoodMedian _)
  )

  override val oracles: Map[String, String] = Map(
    // same integer Q ratio, same 1e6 reject lattice
    "q443_cochran_q" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
        |  FROM events),
        |d0 AS (SELECT min(day) AS day0 FROM ev),
        |weekly AS (
        |  SELECT user_id, (ev.day - d0.day0) // 7 AS week, max(p)::BIGINT AS x
        |  FROM ev, d0 WHERE ev.day - d0.day0 < 28
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT count(*)::BIGINT AS n_users, sum(rr)::BIGINT AS n_tot,
        |         sum(rr * rr)::BIGINT AS r2
        |  FROM (SELECT user_id, sum(x) AS rr FROM weekly GROUP BY 1)),
        |c AS (
        |  SELECT sum(cc * cc)::BIGINT AS sum_c2,
        |         sum(CASE WHEN week = 0 THEN cc ELSE 0 END)::BIGINT AS w0,
        |         sum(CASE WHEN week = 1 THEN cc ELSE 0 END)::BIGINT AS w1,
        |         sum(CASE WHEN week = 2 THEN cc ELSE 0 END)::BIGINT AS w2,
        |         sum(CASE WHEN week = 3 THEN cc ELSE 0 END)::BIGINT AS w3
        |  FROM (SELECT week, sum(x) AS cc FROM weekly GROUP BY 1))
        |SELECT n_users, w0, w1, w2, w3, n_tot,
        |       (3 * (4 * sum_c2 - n_tot * n_tot))::BIGINT AS q_num,
        |       (4 * n_tot - r2)::BIGINT AS q_den,
        |       round((3 * (4 * sum_c2 - n_tot * n_tot))::DOUBLE / (4 * n_tot - r2), 6) + 0.0 AS q_stat,
        |       (CASE WHEN 3 * (4 * sum_c2 - n_tot * n_tot) * 1000000 > 7814728 * (4 * n_tot - r2) THEN 1 ELSE 0 END)::BIGINT AS reject
        |FROM r, c""".stripMargin,
    // same per-term 1e-9 snaps, same risk-set reverse cumulative
    "q444_kaplan_meier" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
        |  FROM events),
        |d0 AS (SELECT min(day) AS day0, max(day) AS day1 FROM ev),
        |per AS (
        |  SELECT user_id, min(ev.day - d0.day0) AS t0,
        |         min(CASE WHEN p = 1 THEN ev.day - d0.day0 END) AS tp,
        |         max(d0.day1 - d0.day0) AS h
        |  FROM ev, d0 GROUP BY 1),
        |subj AS (
        |  SELECT CASE WHEN tp IS NOT NULL THEN tp - t0 ELSE h - t0 END AS t,
        |         CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS e
        |  FROM per),
        |census AS (
        |  SELECT t, sum(e)::BIGINT AS d, sum(1 - e)::BIGINT AS c_cens,
        |         count(*)::BIGINT AS m
        |  FROM subj GROUP BY 1),
        |risk AS (
        |  SELECT t, d, c_cens,
        |         (sum(m) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING))::BIGINT AS n_risk
        |  FROM census),
        |terms AS (
        |  SELECT t, n_risk, d, c_cens,
        |         floor(d::DOUBLE / n_risk * 1.0e9 + 0.5)::BIGINT AS na_term,
        |         CASE WHEN d < n_risk THEN floor(ln((n_risk - d)::DOUBLE / n_risk) * 1.0e9 + 0.5)::BIGINT ELSE 0 END AS km_term,
        |         CASE WHEN d = n_risk THEN 1 ELSE 0 END AS dead
        |  FROM risk)
        |SELECT t, n_risk, d AS d_events, c_cens AS censored,
        |       (sum(na_term) OVER w)::BIGINT AS na_e9,
        |       (CASE WHEN sum(dead) OVER w = 0 THEN sum(km_term) OVER w END)::BIGINT AS log_surv_e9
        |FROM terms WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING)
        |ORDER BY t""".stripMargin,
    // same md5 arm coin, same snapped E/V terms, same χ² chain + lattice
    "q445_logrank" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p,
        |         ('0x' || substr(md5('lr#' || user_id::VARCHAR), 1, 2))::BIGINT % 2 AS g
        |  FROM events),
        |d0 AS (SELECT min(day) AS day0, max(day) AS day1 FROM ev),
        |per AS (
        |  SELECT user_id, min(ev.day - d0.day0) AS t0,
        |         min(CASE WHEN p = 1 THEN ev.day - d0.day0 END) AS tp,
        |         max(d0.day1 - d0.day0) AS h, max(g) AS g
        |  FROM ev, d0 GROUP BY 1),
        |subj AS (
        |  SELECT CASE WHEN tp IS NOT NULL THEN tp - t0 ELSE h - t0 END AS t,
        |         CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS e, g
        |  FROM per),
        |census AS (
        |  SELECT t, sum(e)::BIGINT AS d, count(*)::BIGINT AS m,
        |         sum(CASE WHEN g = 1 THEN e ELSE 0 END)::BIGINT AS d1,
        |         sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)::BIGINT AS m1
        |  FROM subj GROUP BY 1),
        |risk AS (
        |  SELECT t, d, d1,
        |         (sum(m) OVER wd)::BIGINT AS n, (sum(m1) OVER wd)::BIGINT AS n1
        |  FROM census WINDOW wd AS (ORDER BY t DESC ROWS UNBOUNDED PRECEDING)),
        |terms AS (
        |  SELECT d1,
        |         floor(d::DOUBLE * n1 / n * 1.0e9 + 0.5)::BIGINT AS e1_term,
        |         CASE WHEN n > 1 THEN floor(d::DOUBLE * n1 / n * (n - n1) / n * (n - d) / (n - 1) * 1.0e9 + 0.5)::BIGINT ELSE 0 END AS v_term
        |  FROM risk WHERE d > 0),
        |agg AS (
        |  SELECT count(*)::BIGINT AS n_times, sum(d1)::BIGINT AS o1,
        |         sum(e1_term)::BIGINT AS e1_e9, sum(v_term)::BIGINT AS v_e9
        |  FROM terms)
        |SELECT n_times, o1, e1_e9, v_e9,
        |       round(((o1 - e1_e9 / 1.0e9) * (o1 - e1_e9 / 1.0e9)) / (v_e9 / 1.0e9), 6) + 0.0 AS chi2,
        |       (CASE WHEN floor(((o1 - e1_e9 / 1.0e9) * (o1 - e1_e9 / 1.0e9)) / (v_e9 / 1.0e9) * 1.0e6 + 0.5)::BIGINT > 3841459 THEN 1 ELSE 0 END)::BIGINT AS reject
        |FROM agg""".stripMargin,
    // same binary-exact 2^(29-lag) weights on the same census grid
    "q446_adstock" ->
      """WITH ev AS (
        |  SELECT event_type AS channel, epoch_us(ts) // 86400000000 AS day,
        |         floor(value * 100 + 0.5)::BIGINT AS cents
        |  FROM events WHERE event_type IN ('view', 'click')),
        |d0 AS (SELECT min(day) AS day0 FROM ev),
        |census AS (
        |  SELECT channel, ev.day - d0.day0 AS d, sum(cents)::BIGINT AS s
        |  FROM ev, d0 GROUP BY 1, 2)
        |SELECT a.channel, a.d AS day, a.s AS spend_cents,
        |       sum(b.s * (1::BIGINT << (29 - (a.d - b.d))::INT))::BIGINT AS adstock_q29,
        |       round(sum(b.s * (1::BIGINT << (29 - (a.d - b.d))::INT))::DOUBLE / 5.36870912e8, 6) + 0.0 AS adstock
        |FROM census a JOIN census b ON a.channel = b.channel AND b.d <= a.d AND a.d - b.d <= 29
        |GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin,
    // same n-scaled integer detrended index, same argmax tie-breaks,
    // same IEEE moment chain
    "q447_drawdown_sharpe" ->
      """WITH daily AS (
        |  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
        |         sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS cents
        |  FROM orders GROUP BY 1),
        |d2 AS (SELECT day, cents, cents // 100 AS x FROM daily),
        |tot AS (
        |  SELECT count(*)::BIGINT AS n, sum(cents)::BIGINT AS s,
        |         sum(x)::BIGINT AS sx, sum(x::HUGEINT * x) AS sx2
        |  FROM d2),
        |scored AS (
        |  SELECT d2.day, t.n, t.s, t.sx, t.sx2,
        |         (row_number() OVER (ORDER BY d2.day)) - 1 AS t_idx,
        |         (sum(cents) OVER (ORDER BY d2.day ROWS UNBOUNDED PRECEDING))::BIGINT AS cum
        |  FROM d2, tot t),
        |dev AS (
        |  SELECT day, n, s, sx, sx2, (n * cum - (t_idx + 1) * s)::BIGINT AS dev
        |  FROM scored),
        |run AS (
        |  SELECT day, n, s, sx, sx2, dev,
        |         (max(dev) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING))::BIGINT AS runmax
        |  FROM dev),
        |trough AS (
        |  SELECT day AS trough_day, runmax AS rm, runmax - dev AS mdd,
        |         n, s, sx, sx2
        |  FROM run
        |  QUALIFY row_number() OVER (ORDER BY runmax - dev DESC, day ASC) = 1),
        |peak AS (
        |  SELECT min(r.day)::BIGINT AS peak_day
        |  FROM run r, trough t
        |  WHERE r.dev = t.rm AND r.day <= t.trough_day)
        |SELECT t.n AS n_days, (t.mdd // t.n)::BIGINT AS max_drawdown_cents,
        |       p.peak_day, t.trough_day,
        |       round(t.sx::DOUBLE / t.n, 6) + 0.0 AS mean_daily_dollars,
        |       round((t.sx::DOUBLE / t.n) / sqrt((t.n::DOUBLE * t.sx2 - t.sx::DOUBLE * t.sx) / (t.n::DOUBLE * (t.n - 1))), 6) + 0.0 AS sharpe_daily
        |FROM trough t, peak p""".stripMargin,
    // same q29 BIGINT smoothing sums, same IEEE limit chain, same
    // 1e-6 signal lattice
    "q448_ewma_chart" ->
      """WITH ev AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |d0 AS (SELECT min(day) AS day0 FROM ev),
        |census AS (
        |  SELECT ev.day - d0.day0 AS d, count(*)::BIGINT AS u
        |  FROM ev, d0 GROUP BY 1),
        |tot AS (
        |  SELECT count(*)::BIGINT AS n, sum(u)::BIGINT AS us,
        |         sum(u * u)::BIGINT AS us2
        |  FROM census),
        |conv AS (
        |  SELECT a.d, a.u,
        |         sum(b.u * (1::BIGINT << (29 - (a.d - b.d))::INT))::BIGINT AS zq
        |  FROM census a JOIN census b ON b.d <= a.d AND a.d - b.d <= 29
        |  GROUP BY 1, 2),
        |z AS (
        |  SELECT c.d, c.u, t.n, t.us, t.us2,
        |         t.us::DOUBLE / t.n AS mu,
        |         c.zq::DOUBLE / 1.073741824e9 + t.us::DOUBLE / (t.n::DOUBLE * (1::BIGINT << least(c.d + 1, 62)::INT)::DOUBLE) AS ewma_raw,
        |         3::DOUBLE * sqrt((t.n::DOUBLE * t.us2 - t.us::DOUBLE * t.us) / (t.n::DOUBLE * (t.n - 1))) * sqrt((1::DOUBLE / 3::DOUBLE) * (1::DOUBLE - 1::DOUBLE / (1::BIGINT << least(2 * c.d + 2, 62)::INT)::DOUBLE)) AS lim
        |  FROM conv c, tot t)
        |SELECT d AS day, u AS n_active,
        |       round(ewma_raw, 6) + 0.0 AS ewma,
        |       round(mu + lim, 6) + 0.0 AS ucl,
        |       round(mu - lim, 6) + 0.0 AS lcl,
        |       (CASE WHEN floor(abs(ewma_raw - mu) * 1.0e6 + 0.5)::BIGINT > floor(lim * 1.0e6 + 0.5)::BIGINT THEN 1 ELSE 0 END)::BIGINT AS signal
        |FROM z ORDER BY day""".stripMargin,
    // same bigram comprehension (the q180 device), same left-associated
    // ln argument, same 1e-9 snap and total top-20 tie-break
    "q449_pmi_collocations" ->
      """WITH d0 AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |uni AS (
        |  SELECT w, count(*)::BIGINT AS cw
        |  FROM (SELECT unnest(ws) AS w FROM d0) GROUP BY 1),
        |nu AS (SELECT sum(cw)::BIGINT AS nu FROM uni),
        |nbg AS (SELECT sum(len(ws) - 1)::BIGINT AS nbg FROM d0),
        |bgx AS (
        |  SELECT unnest([{'w1': ws[i], 'w2': ws[i + 1]} FOR i IN range(1, len(ws))]) AS b
        |  FROM d0),
        |bg AS (
        |  SELECT b.w1 AS w1, b.w2 AS w2, count(*)::BIGINT AS c_ab
        |  FROM bgx GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT bg.w1, bg.w2, bg.c_ab, ua.cw AS ca, ub.cw AS cb,
        |       floor(ln((bg.c_ab::DOUBLE * nu.nu * nu.nu) / (nbg.nbg::DOUBLE * ua.cw * ub.cw)) * 1.0e9 + 0.5)::BIGINT AS pmi_e9
        |FROM bg JOIN uni ua ON bg.w1 = ua.w
        |        JOIN uni ub ON bg.w2 = ub.w, nu, nbg
        |QUALIFY row_number() OVER (
        |  ORDER BY floor(ln((bg.c_ab::DOUBLE * nu.nu * nu.nu) / (nbg.nbg::DOUBLE * ua.cw * ub.cw)) * 1.0e9 + 0.5)::BIGINT DESC,
        |           bg.w1 ASC, bg.w2 ASC) <= 20""".stripMargin,
    // same 2^(7-gap) weights, same per-conversion ppm lattice
    "q450_time_decay_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events),
        |conv AS (
        |  SELECT user_id, event_id AS cid, us AS pus
        |  FROM ev WHERE event_type = 'purchase'),
        |touch AS (
        |  SELECT user_id, event_type AS channel, us AS tus
        |  FROM ev WHERE event_type IN ('view', 'click')),
        |pairs AS (
        |  SELECT c.cid, t.channel,
        |         (1::BIGINT << (7 - (c.pus - t.tus) // 86400000000)::INT) AS w
        |  FROM conv c JOIN touch t USING (user_id)
        |  WHERE t.tus < c.pus AND c.pus - t.tus <= 604800000000),
        |shared AS (
        |  SELECT cid, channel, w, sum(w) OVER (PARTITION BY cid) AS sumw
        |  FROM pairs)
        |SELECT channel, count(*)::BIGINT AS n_touches,
        |       count(DISTINCT cid)::BIGINT AS n_conversions,
        |       sum(w * 1000000 // sumw)::BIGINT AS credit_ppm
        |FROM shared GROUP BY 1 ORDER BY 1""".stripMargin,
    // same integral 100·D under the sqrt, same double cost chains
    "q451_eoq" ->
      """WITH base AS (
        |  SELECT string_split(p.p_type, ' ')[1] AS cls, l.l_orderkey,
        |         floor(l.l_quantity + 0.5)::BIGINT AS q
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |agg AS (
        |  SELECT cls, sum(q)::BIGINT AS d_total,
        |         count(DISTINCT l_orderkey)::BIGINT AS n_orders
        |  FROM base GROUP BY 1)
        |SELECT cls, d_total, n_orders,
        |       ((2 * d_total + n_orders) // (2 * n_orders))::BIGINT AS q_alt,
        |       round(sqrt((100 * d_total)::DOUBLE), 6) + 0.0 AS eoq,
        |       round(d_total::DOUBLE / sqrt((100 * d_total)::DOUBLE) * 100::DOUBLE + sqrt((100 * d_total)::DOUBLE), 6) + 0.0 AS tc_eoq,
        |       round(d_total::DOUBLE / ((2 * d_total + n_orders) // (2 * n_orders)) * 100::DOUBLE + ((2 * d_total + n_orders) // (2 * n_orders))::DOUBLE, 6) + 0.0 AS tc_alt,
        |       round((d_total::DOUBLE / ((2 * d_total + n_orders) // (2 * n_orders)) * 100::DOUBLE + ((2 * d_total + n_orders) // (2 * n_orders))::DOUBLE) - (d_total::DOUBLE / sqrt((100 * d_total)::DOUBLE) * 100::DOUBLE + sqrt((100 * d_total)::DOUBLE)), 6) + 0.0 AS savings
        |FROM agg ORDER BY cls""".stripMargin,
    // same exact type-1 grand median from the cents census, same
    // snapped χ² terms and reject lattice
    "q452_mood_median" ->
      """WITH x AS (
        |  SELECT o_orderpriority AS priority,
        |         floor(o_totalprice * 100 + 0.5)::BIGINT AS v
        |  FROM orders),
        |census AS (SELECT v, count(*)::BIGINT AS cnt FROM x GROUP BY 1),
        |n AS (SELECT sum(cnt)::BIGINT AS n FROM census),
        |med AS (
        |  SELECT min(v)::BIGINT AS med
        |  FROM (SELECT v, sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
        |        FROM census) c, n
        |  WHERE c.cum * 2 >= n.n + 1),
        |grp AS (
        |  SELECT priority, count(*)::BIGINT AS n_g,
        |         sum(CASE WHEN x.v > m.med THEN 1 ELSE 0 END)::BIGINT AS above
        |  FROM x, med m GROUP BY 1),
        |g2 AS (SELECT priority, n_g, above, n_g - above AS below FROM grp),
        |tots AS (SELECT sum(n_g)::BIGINT AS nn, sum(above)::BIGINT AS aa FROM g2),
        |terms AS (
        |  SELECT g.priority, g.n_g, g.above, g.below,
        |         g.n_g::DOUBLE * t.aa / t.nn AS exp_a,
        |         floor((g.above - g.n_g::DOUBLE * t.aa / t.nn) * (g.above - g.n_g::DOUBLE * t.aa / t.nn) / (g.n_g::DOUBLE * t.aa / t.nn) * 1.0e9 + 0.5)::BIGINT AS ta,
        |         floor((g.below - g.n_g::DOUBLE * (t.nn - t.aa) / t.nn) * (g.below - g.n_g::DOUBLE * (t.nn - t.aa) / t.nn) / (g.n_g::DOUBLE * (t.nn - t.aa) / t.nn) * 1.0e9 + 0.5)::BIGINT AS tb
        |  FROM g2 g, tots t),
        |chi AS (SELECT sum(ta + tb)::BIGINT AS chi_e9 FROM terms)
        |SELECT t.priority, t.n_g, t.above, t.below,
        |       round(t.exp_a, 6) + 0.0 AS exp_above,
        |       round(c.chi_e9::DOUBLE / 1.0e9, 6) + 0.0 AS chi2,
        |       (CASE WHEN c.chi_e9 > 9487729037 THEN 1 ELSE 0 END)::BIGINT AS reject
        |FROM terms t, chi c ORDER BY t.priority""".stripMargin
  )
}
