package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-16 widening, fourth batch: ordered-alternative testing
  * (Jonckheere–Terpstra), ordinal association (Goodman–Kruskal γ),
  * parametric survival (Weibull median-rank fit beside q444's
  * nonparametric KM), panel econometrics (two-way fixed effects),
  * gap decomposition (Oaxaca–Blinder), and model-lift reporting
  * (gains/lift decile table).
  *
  * Devices: cumulative-census pair counting (JT and γ count O(N²)
  * pairs through domain-bounded censuses, never materializing a pair),
  * DECIMAL/HUGEINT wide moments with a single exact→double conversion,
  * and per-cell 1e-3/1e-9 term snaps before any data-scale float sum.
  */
object StatsQueries4 extends QueryModule {

  /** q471: JONCKHEERE–TERPSTRA — the ordered-alternative k-group test
    * (q316's Kruskal–Wallis asks "do the groups differ"; JT asks "do
    * they INCREASE with the ordering", here order totals across the
    * 1-URGENT..5-LOW priority scale — strictly more powerful when the
    * alternative is monotone). Ties count ½, the standard statistic.
    *
    * Determinism: 2·JT is an exact BIGINT assembled from the value
    * census's per-group cumulative counts (Σ_j c_j·(2·lt_i + c_i) over
    * ordered pairs — no pair is materialized); E and Var ride ×4 / ×72
    * integer lattices with the n³-scale terms on DECIMAL/HUGEINT; z is
    * one mirrored chain, the flag on the 1e-6 lattice. (Var uses the
    * standard no-tie form; ties on the cents domain are negligible and
    * the statistic itself handles them exactly.) Scale: one fact
    * aggregate to a cents-domain census + a window over it.
    */
  def q471JonckheereTerpstra(spark: SparkSession, dir: String): DataFrame = {
    val x = Tables.orders(spark, dir)
      .select(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("g"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("v"))
    val census = x.groupBy("v").agg(
      sum(when(col("g") === 1L, 1L).otherwise(0L)).as("c1"),
      sum(when(col("g") === 2L, 1L).otherwise(0L)).as("c2"),
      sum(when(col("g") === 3L, 1L).otherwise(0L)).as("c3"),
      sum(when(col("g") === 4L, 1L).otherwise(0L)).as("c4"),
      sum(when(col("g") === 5L, 1L).otherwise(0L)).as("c5"))
    val wv = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val jt = census
      .withColumn("l1", sum("c1").over(wv) - col("c1"))
      .withColumn("l2", sum("c2").over(wv) - col("c2"))
      .withColumn("l3", sum("c3").over(wv) - col("c3"))
      .withColumn("l4", sum("c4").over(wv) - col("c4"))
      .agg(sum(expr(
        "c2 * (2L * l1 + c1) + " +
          "c3 * (2L * l1 + c1 + 2L * l2 + c2) + " +
          "c4 * (2L * l1 + c1 + 2L * l2 + c2 + 2L * l3 + c3) + " +
          "c5 * (2L * l1 + c1 + 2L * l2 + c2 + 2L * l3 + c3 + 2L * l4 + c4)"))
        .as("jt2"))
    val mom = x.groupBy("g").agg(count(lit(1)).as("ng"))
      .agg(sum("ng").as("n"), sum(expr("ng * ng")).as("sn2"),
        sum(expr("CAST(ng AS DECIMAL(38,0)) * ng * (2L * ng + 3L)")).as("sn23"))
      .withColumn("e4", expr("n * n - sn2"))
      .withColumn("var72", expr(
        "CAST(n AS DECIMAL(38,0)) * n * (2L * n + 3L) - sn23"))
    jt.crossJoin(broadcast(mom))
      .withColumn("z", expr(
        "(2L * jt2 - e4) / (CAST(4 AS DOUBLE) * sqrt(CAST(var72 AS DOUBLE) / CAST(72 AS DOUBLE)))"))
      .select(col("n").as("n_orders"), col("jt2"), col("e4"),
        expr("round(z, 6)").as("z"),
        expr("CASE WHEN CAST(floor(abs(z) * 1.0e6 + 0.5) AS BIGINT) >= 1959964L THEN 1L ELSE 0L END")
          .as("trend"))
  }

  /** q472: GOODMAN–KRUSKAL γ — ordinal-by-ordinal association (q464's
    * τ-b corrects for ties against the whole pair universe; γ asks only
    * "of the pairs that ORDER, what share agree" — the measure of
    * choice for ordered contingency tables): priority scale × order-
    * value decile.
    *
    * Determinism: deciles are exact type-1 cuts off the cents census;
    * concordant/discordant counts come from the 50-cell contingency's
    * self-join — exact BIGINT n_a·n_b products; γ is one divide. Scale:
    * fact aggregates to a ≤(5×10)-cell census; the pair join runs over
    * cells, never rows.
    */
  def q472GoodmanKruskalGamma(spark: SparkSession, dir: String): DataFrame = {
    val x = Tables.orders(spark, dir)
      .select(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("g"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("v"))
    val vc = x.groupBy("v").agg(count(lit(1)).as("cnt"))
    val n = vc.agg(sum("cnt").as("n"))
    val cuts = vc.crossJoin(broadcast(n))
      .withColumn("cum", sum("cnt").over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .agg(min(when(col("cum") >= expr("(1L * n + 9L) div 10L"), col("v"))).as("t1"),
        (2 to 9).map(k =>
          min(when(col("cum") >= expr(s"(${k}L * n + 9L) div 10L"),
            col("v"))).as(s"t$k")): _*)
    val cells = x.crossJoin(broadcast(cuts))
      .withColumn("dec", expr(
        "1L + CASE WHEN v > t1 THEN 1 ELSE 0 END + CASE WHEN v > t2 THEN 1 ELSE 0 END + " +
          "CASE WHEN v > t3 THEN 1 ELSE 0 END + CASE WHEN v > t4 THEN 1 ELSE 0 END + " +
          "CASE WHEN v > t5 THEN 1 ELSE 0 END + CASE WHEN v > t6 THEN 1 ELSE 0 END + " +
          "CASE WHEN v > t7 THEN 1 ELSE 0 END + CASE WHEN v > t8 THEN 1 ELSE 0 END + " +
          "CASE WHEN v > t9 THEN 1 ELSE 0 END"))
      .groupBy("g", "dec").agg(count(lit(1)).as("nc"))
      .localCheckpoint()
    val a = cells.toDF("ga", "da", "na")
    val b = cells.toDF("gb", "db", "nb")
    a.join(b, col("gb") > col("ga"))
      .agg(sum(when(col("db") > col("da"), expr("na * nb")).otherwise(0L)).as("conc"),
        sum(when(col("db") < col("da"), expr("na * nb")).otherwise(0L)).as("disc"))
      .crossJoin(broadcast(cells.agg(sum("nc").as("n_orders"))))
      .select(col("n_orders"), col("conc").as("concordant"),
        col("disc").as("discordant"),
        expr("round(CAST(conc - disc AS DOUBLE) / (conc + disc), 6)").as("gamma"))
  }

  /** q473: WEIBULL MEDIAN-RANK FIT — the parametric member of the
    * survival family (q444 estimates the curve pointwise; Weibull
    * answers "is conversion hazard rising or falling" with one shape
    * number): ln(−ln(1−F_i)) vs ln(t) OLS on Bernard's median ranks
    * over uncensored first-event→first-purchase durations ≥ 1 day
    * (same-day conversions and censored users documented out — the
    * complete-sample approximation; censoring is light here).
    *
    * Determinism: the duration census gives exact mean order numbers on
    * the ×2 lattice, so F_i = (5·i2 − 3)/(10n + 4) is an exact rational;
    * both ln readouts are snapped to 1e-9 per census row BEFORE the
    * weighted moments, which ride DECIMAL(38,0) sums of e9-lattice
    * products (exact in any order — no pinning needed); the slope/
    * intercept chain is mirrored. Scale: per-user agg → ≤horizon-row
    * census.
    */
  def q473WeibullFit(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("p"))
    val per = ev.groupBy("user_id")
      .agg(min("day").as("t0"), min(when(col("p") === 1L, col("day"))).as("tp"))
      .filter(col("tp").isNotNull && col("tp") - col("t0") >= 1)
      .select((col("tp") - col("t0")).as("t"))
    val census = per.groupBy("t").agg(count(lit(1)).as("cnt"))
    val n = census.agg(sum("cnt").as("n"), count(lit(1)).as("n_levels"))
    val ranked = census.crossJoin(broadcast(n))
      .withColumn("cum", sum("cnt").over(Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("i2", expr("2L * cum - (cnt - 1L)"))
      .withColumn("x9", expr("CAST(floor(ln(CAST(t AS DOUBLE)) * 1.0e9 + 0.5) AS BIGINT)"))
      .withColumn("y9", expr(
        "CAST(floor(ln(CAST(0 AS DOUBLE) - ln(CAST(10L * n + 7L - 5L * i2 AS DOUBLE) / (10L * n + 4L))) * 1.0e9 + 0.5) AS BIGINT)"))
    val mom = ranked.agg(max("n").as("n"), max("n_levels").as("n_levels"),
      sum("cnt").as("sw"),
      sum(expr("CAST(cnt AS DECIMAL(38,0)) * x9")).as("swx"),
      sum(expr("CAST(cnt AS DECIMAL(38,0)) * y9")).as("swy"),
      sum(expr("CAST(cnt AS DECIMAL(38,0)) * x9 * y9")).as("swxy"),
      sum(expr("CAST(cnt AS DECIMAL(38,0)) * x9 * x9")).as("swxx"))
    mom.withColumn("shape", expr(
        "(CAST(sw AS DOUBLE) * CAST(swxy AS DOUBLE) - CAST(swx AS DOUBLE) * CAST(swy AS DOUBLE)) / (CAST(sw AS DOUBLE) * CAST(swxx AS DOUBLE) - CAST(swx AS DOUBLE) * CAST(swx AS DOUBLE))"))
      .withColumn("icept9", expr(
        "(CAST(swy AS DOUBLE) - shape * CAST(swx AS DOUBLE)) / sw"))
      .select(col("n").as("n_uncensored"), col("n_levels"),
        expr("round(shape, 6)").as("weibull_shape"),
        expr("round((CAST(0 AS DOUBLE) - icept9 / 1.0e9) / shape, 6)")
          .as("ln_scale_days"))
  }

  /** q474: TWO-WAY FIXED EFFECTS (within estimator) — the workhorse
    * panel regression (q415's elasticity is one-dimensional; TWFE nets
    * out BOTH who-the-user-is and what-day-it-is before asking "do
    * views move purchase revenue"): y_ud = purchase cents, x_ud = view
    * count, on the (user, day) panel, β from the double-demeaned
    * within transform.
    *
    * Determinism: all four mean layers are exact-count ratios; the
    * per-cell x̃ỹ / x̃² / ỹ² terms are snapped to a 1e-3 BIGINT grid
    * BEFORE the data-scale sums (the q435 device, coarsened so cents²
    * magnitudes fit BIGINT at sf10); β and within-R² are mirrored
    * chains. Scale: one panel aggregate + three broadcast mean joins —
    * the canonical demeaning dataflow.
    */
  def q474TwoWayFixedEffects(spark: SparkSession, dir: String): DataFrame = {
    val panel = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        when(col("event_type") === "purchase",
          floor(col("value") * 100.0 + 0.5).cast("long")).otherwise(0L).as("y"),
        when(col("event_type") === "view", 1L).otherwise(0L).as("x"))
      .groupBy("user_id", "day")
      .agg(sum("y").as("y"), sum("x").as("x"))
      .localCheckpoint()
    val uMean = panel.groupBy("user_id")
      .agg(count(lit(1)).as("nu"), sum("x").as("sxu"), sum("y").as("syu"))
    val dMean = panel.groupBy("day")
      .agg(count(lit(1)).as("nd"), sum("x").as("sxd"), sum("y").as("syd"))
    val gMean = panel.agg(count(lit(1)).as("ng"), sum("x").as("sxg"),
      sum("y").as("syg"), countDistinct("user_id").as("n_users"),
      countDistinct("day").as("n_days"))
    val terms = panel.join(uMean, "user_id").join(broadcast(dMean), "day")
      .crossJoin(broadcast(gMean))
      .withColumn("xt", expr(
        "x - CAST(sxu AS DOUBLE) / nu - CAST(sxd AS DOUBLE) / nd + CAST(sxg AS DOUBLE) / ng"))
      .withColumn("yt", expr(
        "y - CAST(syu AS DOUBLE) / nu - CAST(syd AS DOUBLE) / nd + CAST(syg AS DOUBLE) / ng"))
      .agg(max("ng").as("n_cells"), max("n_users").as("n_users"),
        max("n_days").as("n_days"),
        sum(expr("CAST(floor(xt * yt * 1.0e3 + 0.5) AS BIGINT)")).as("sxy_e3"),
        sum(expr("CAST(floor(xt * xt * 1.0e3 + 0.5) AS BIGINT)")).as("sxx_e3"),
        sum(expr("CAST(floor(yt * yt * 1.0e3 + 0.5) AS BIGINT)")).as("syy_e3"))
    terms
      .withColumn("beta", expr("CAST(sxy_e3 AS DOUBLE) / sxx_e3"))
      .select(col("n_cells"), col("n_users"), col("n_days"),
        expr("round(beta, 6)").as("beta_cents_per_view"),
        expr("round(beta * sxy_e3 / syy_e3, 6)").as("within_r2"))
  }

  /** q475: OAXACA–BLINDER DECOMPOSITION — the gap accountant (labor
    * economics' standard): how much of the BUILDING-vs-MACHINERY mean
    * order-value gap is EXPLAINED by account-balance composition vs
    * unexplained (coefficients)? Two-fold decomposition at the
    * MACHINERY coefficients.
    *
    * Determinism: per-group OLS moments are exact (the x·y products on
    * DECIMAL(38,0)); slopes/means/decomposition are mirrored chains on
    * one exact→double conversion each. Scale: one broadcast dim join +
    * a 2-group aggregate.
    */
  def q475OaxacaBlinder(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_custkey"), col("c_mktsegment").as("seg"),
          floor(col("c_acctbal") * 100.0 + 0.5).cast("long").as("xb"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("seg"), col("xb"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("yv"))
    val mom = base.groupBy("seg").agg(
      count(lit(1)).as("n"), sum("xb").as("sx"), sum("yv").as("sy"),
      sum(expr("CAST(xb AS DECIMAL(38,0)) * xb")).as("sxx"),
      sum(expr("CAST(xb AS DECIMAL(38,0)) * yv")).as("sxy"))
    val wide = mom.agg(
      max(when(col("seg") === "BUILDING", col("n"))).as("na"),
      max(when(col("seg") === "BUILDING", col("sx"))).as("sxa"),
      max(when(col("seg") === "BUILDING", col("sy"))).as("sya"),
      max(when(col("seg") === "BUILDING", col("sxx"))).as("sxxa"),
      max(when(col("seg") === "BUILDING", col("sxy"))).as("sxya"),
      max(when(col("seg") === "MACHINERY", col("n"))).as("nb"),
      max(when(col("seg") === "MACHINERY", col("sx"))).as("sxb"),
      max(when(col("seg") === "MACHINERY", col("sy"))).as("syb"),
      max(when(col("seg") === "MACHINERY", col("sxx"))).as("sxxb"),
      max(when(col("seg") === "MACHINERY", col("sxy"))).as("sxyb"))
    wide
      .withColumn("ba", expr(
        "(CAST(na AS DOUBLE) * CAST(sxya AS DOUBLE) - CAST(sxa AS DOUBLE) * sya) / (CAST(na AS DOUBLE) * CAST(sxxa AS DOUBLE) - CAST(sxa AS DOUBLE) * sxa)"))
      .withColumn("bb", expr(
        "(CAST(nb AS DOUBLE) * CAST(sxyb AS DOUBLE) - CAST(sxb AS DOUBLE) * syb) / (CAST(nb AS DOUBLE) * CAST(sxxb AS DOUBLE) - CAST(sxb AS DOUBLE) * sxb)"))
      .withColumn("gap", expr(
        "CAST(sya AS DOUBLE) / na - CAST(syb AS DOUBLE) / nb"))
      .withColumn("explained", expr(
        "(CAST(sxa AS DOUBLE) / na - CAST(sxb AS DOUBLE) / nb) * bb"))
      .select(col("na").as("n_building"), col("nb").as("n_machinery"),
        expr("round(ba, 6)").as("beta_building"),
        expr("round(bb, 6)").as("beta_machinery"),
        expr("round(gap, 6)").as("mean_gap_cents"),
        expr("round(explained, 6)").as("explained_cents"),
        expr("round(gap - explained, 6)").as("unexplained_cents"))
  }

  /** q476: GAINS / LIFT DECILE TABLE — the model-quality report every
    * campaign review reads (q263's AUC is threshold-free; the gains
    * table says "mail the top 2 deciles"): score = first-half spend,
    * outcome = second-half buyer, value-based deciles with per-decile
    * lift and top-down cumulative gains.
    *
    * Determinism: scores and outcomes are exact; decile cuts are exact
    * type-1 quantiles off the score census (value-based, so heavy ties
    * share a decile — documented); rates/gains live on ppm integer
    * lattices; lift is one mirrored divide. Scale: per-user aggregate,
    * score-domain census for the cuts, 10-row result windows.
    */
  def q476GainsTable(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        col("event_type"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
    val d0 = ev.agg(min("day").as("day0"))
    val per = ev.crossJoin(broadcast(d0))
      .withColumn("rel", col("day") - col("day0"))
      .groupBy("user_id")
      .agg(sum(when(col("rel") < 15 && col("event_type") === "purchase",
          col("cents")).otherwise(0L)).as("score"),
        max(when(col("rel") >= 15 && col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("buyer"))
      .localCheckpoint()
    val vc = per.groupBy("score").agg(count(lit(1)).as("cnt"))
    val n = vc.agg(sum("cnt").as("n"))
    val cuts = vc.crossJoin(broadcast(n))
      .withColumn("cum", sum("cnt").over(Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .agg(min(when(col("cum") >= expr("(1L * n + 9L) div 10L"), col("score"))).as("t1"),
        (2 to 9).map(k =>
          min(when(col("cum") >= expr(s"(${k}L * n + 9L) div 10L"),
            col("score"))).as(s"t$k")): _*)
    val tot = per.agg(count(lit(1)).as("nu"), sum("buyer").as("nb"))
    val table = per.crossJoin(broadcast(cuts))
      .withColumn("decile", expr(
        "1L + CASE WHEN score > t1 THEN 1 ELSE 0 END + CASE WHEN score > t2 THEN 1 ELSE 0 END + " +
          "CASE WHEN score > t3 THEN 1 ELSE 0 END + CASE WHEN score > t4 THEN 1 ELSE 0 END + " +
          "CASE WHEN score > t5 THEN 1 ELSE 0 END + CASE WHEN score > t6 THEN 1 ELSE 0 END + " +
          "CASE WHEN score > t7 THEN 1 ELSE 0 END + CASE WHEN score > t8 THEN 1 ELSE 0 END + " +
          "CASE WHEN score > t9 THEN 1 ELSE 0 END"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_users"), sum("buyer").as("n_buyers"))
      .crossJoin(broadcast(tot))
    table
      .withColumn("cum_buyers", sum("n_buyers").over(Window.orderBy(col("decile").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("decile"), col("n_users"), col("n_buyers"),
        expr("n_buyers * 1000000L div n_users").as("rate_ppm"),
        expr("cum_buyers * 1000000L div nb").as("cum_gain_ppm"),
        expr("round((CAST(n_buyers AS DOUBLE) / n_users) / (CAST(nb AS DOUBLE) / nu), 6)")
          .as("lift"))
      .orderBy("decile")
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q471_jonckheere_terpstra" -> (q471JonckheereTerpstra _),
    "q472_goodman_kruskal_gamma" -> (q472GoodmanKruskalGamma _),
    "q473_weibull_fit" -> (q473WeibullFit _),
    "q474_twoway_fixed_effects" -> (q474TwoWayFixedEffects _),
    "q475_oaxaca_blinder" -> (q475OaxacaBlinder _),
    "q476_gains_table" -> (q476GainsTable _)
  )

  override val oracles: Map[String, String] = Map(
    // same census-cumulative pair assembly, same ×4/×72 lattices,
    // same HUGEINT n³ terms
    "q471_jonckheere_terpstra" ->
      """WITH x AS (
        |  SELECT substring(o_orderpriority, 1, 1)::BIGINT AS g,
        |         floor(o_totalprice * 100 + 0.5)::BIGINT AS v
        |  FROM orders),
        |census AS (
        |  SELECT v,
        |         sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)::BIGINT AS c1,
        |         sum(CASE WHEN g = 2 THEN 1 ELSE 0 END)::BIGINT AS c2,
        |         sum(CASE WHEN g = 3 THEN 1 ELSE 0 END)::BIGINT AS c3,
        |         sum(CASE WHEN g = 4 THEN 1 ELSE 0 END)::BIGINT AS c4,
        |         sum(CASE WHEN g = 5 THEN 1 ELSE 0 END)::BIGINT AS c5
        |  FROM x GROUP BY 1),
        |cumd AS (
        |  SELECT c1, c2, c3, c4, c5,
        |         (sum(c1) OVER w - c1)::BIGINT AS l1,
        |         (sum(c2) OVER w - c2)::BIGINT AS l2,
        |         (sum(c3) OVER w - c3)::BIGINT AS l3,
        |         (sum(c4) OVER w - c4)::BIGINT AS l4
        |  FROM census WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
        |jt AS (
        |  SELECT sum(c2 * (2 * l1 + c1) +
        |             c3 * (2 * l1 + c1 + 2 * l2 + c2) +
        |             c4 * (2 * l1 + c1 + 2 * l2 + c2 + 2 * l3 + c3) +
        |             c5 * (2 * l1 + c1 + 2 * l2 + c2 + 2 * l3 + c3 + 2 * l4 + c4))::BIGINT AS jt2
        |  FROM cumd),
        |mom AS (
        |  SELECT sum(ng)::BIGINT AS n, sum(ng * ng)::BIGINT AS sn2,
        |         sum(ng::HUGEINT * ng * (2 * ng + 3)) AS sn23
        |  FROM (SELECT g, count(*)::BIGINT AS ng FROM x GROUP BY 1)),
        |m2 AS (
        |  SELECT n, (n * n - sn2)::BIGINT AS e4,
        |         n::HUGEINT * n * (2 * n + 3) - sn23 AS var72
        |  FROM mom),
        |z AS (
        |  SELECT j.jt2, m.n, m.e4,
        |         (2 * j.jt2 - m.e4) / (CAST(4 AS DOUBLE) * sqrt(m.var72::DOUBLE / CAST(72 AS DOUBLE))) AS z
        |  FROM jt j, m2 m)
        |SELECT n AS n_orders, jt2, e4, round(z, 6) + 0.0 AS z,
        |       (CASE WHEN floor(abs(z) * 1.0e6 + 0.5)::BIGINT >= 1959964 THEN 1 ELSE 0 END)::BIGINT AS trend
        |FROM z""".stripMargin,
    // same exact decile cuts, same 50-cell pair products
    "q472_goodman_kruskal_gamma" ->
      """WITH x AS (
        |  SELECT substring(o_orderpriority, 1, 1)::BIGINT AS g,
        |         floor(o_totalprice * 100 + 0.5)::BIGINT AS v
        |  FROM orders),
        |vc AS (SELECT v, count(*)::BIGINT AS cnt FROM x GROUP BY 1),
        |n AS (SELECT sum(cnt)::BIGINT AS n FROM vc),
        |cuts AS (
        |  SELECT min(CASE WHEN cum >= (1 * n.n + 9) // 10 THEN v END)::BIGINT AS t1,
        |         min(CASE WHEN cum >= (2 * n.n + 9) // 10 THEN v END)::BIGINT AS t2,
        |         min(CASE WHEN cum >= (3 * n.n + 9) // 10 THEN v END)::BIGINT AS t3,
        |         min(CASE WHEN cum >= (4 * n.n + 9) // 10 THEN v END)::BIGINT AS t4,
        |         min(CASE WHEN cum >= (5 * n.n + 9) // 10 THEN v END)::BIGINT AS t5,
        |         min(CASE WHEN cum >= (6 * n.n + 9) // 10 THEN v END)::BIGINT AS t6,
        |         min(CASE WHEN cum >= (7 * n.n + 9) // 10 THEN v END)::BIGINT AS t7,
        |         min(CASE WHEN cum >= (8 * n.n + 9) // 10 THEN v END)::BIGINT AS t8,
        |         min(CASE WHEN cum >= (9 * n.n + 9) // 10 THEN v END)::BIGINT AS t9
        |  FROM (SELECT v, sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
        |        FROM vc) c, n),
        |cells AS (
        |  SELECT g, 1 + (v > t1)::INT + (v > t2)::INT + (v > t3)::INT + (v > t4)::INT +
        |            (v > t5)::INT + (v > t6)::INT + (v > t7)::INT + (v > t8)::INT + (v > t9)::INT AS dec,
        |         count(*)::BIGINT AS nc
        |  FROM x, cuts GROUP BY 1, 2),
        |pairs AS (
        |  SELECT sum(CASE WHEN b.dec > a.dec THEN a.nc * b.nc ELSE 0 END)::BIGINT AS conc,
        |         sum(CASE WHEN b.dec < a.dec THEN a.nc * b.nc ELSE 0 END)::BIGINT AS disc
        |  FROM cells a JOIN cells b ON b.g > a.g),
        |tot AS (SELECT sum(nc)::BIGINT AS n_orders FROM cells)
        |SELECT t.n_orders, p.conc AS concordant, p.disc AS discordant,
        |       round((p.conc - p.disc)::DOUBLE / (p.conc + p.disc), 6) + 0.0 AS gamma
        |FROM pairs p, tot t""".stripMargin,
    // same ×2 mean-order lattice, same e9 ln snaps, same DECIMAL moments
    "q473_weibull_fit" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
        |  FROM events),
        |per AS (
        |  SELECT min(day) AS t0, min(CASE WHEN p = 1 THEN day END) AS tp
        |  FROM ev GROUP BY user_id),
        |durs AS (
        |  SELECT tp - t0 AS t FROM per
        |  WHERE tp IS NOT NULL AND tp - t0 >= 1),
        |census AS (SELECT t, count(*)::BIGINT AS cnt FROM durs GROUP BY 1),
        |n AS (SELECT sum(cnt)::BIGINT AS n, count(*)::BIGINT AS n_levels FROM census),
        |ranked AS (
        |  SELECT c.t, c.cnt, n.n, n.n_levels,
        |         2 * sum(c.cnt) OVER (ORDER BY c.t ROWS UNBOUNDED PRECEDING) - (c.cnt - 1) AS i2
        |  FROM census c, n),
        |snapped AS (
        |  SELECT t, cnt, n, n_levels,
        |         floor(ln(t::DOUBLE) * 1.0e9 + 0.5)::BIGINT AS x9,
        |         floor(ln(CAST(0 AS DOUBLE) - ln((10 * n + 7 - 5 * i2)::DOUBLE / (10 * n + 4))) * 1.0e9 + 0.5)::BIGINT AS y9
        |  FROM ranked),
        |mom AS (
        |  SELECT max(n)::BIGINT AS n, max(n_levels)::BIGINT AS n_levels,
        |         sum(cnt)::BIGINT AS sw,
        |         sum(cnt::HUGEINT * x9) AS swx, sum(cnt::HUGEINT * y9) AS swy,
        |         sum(cnt::HUGEINT * x9 * y9) AS swxy, sum(cnt::HUGEINT * x9 * x9) AS swxx
        |  FROM snapped),
        |fit AS (
        |  SELECT n, n_levels,
        |         (CAST(sw AS DOUBLE) * CAST(swxy AS DOUBLE) - CAST(swx AS DOUBLE) * CAST(swy AS DOUBLE)) / (CAST(sw AS DOUBLE) * CAST(swxx AS DOUBLE) - CAST(swx AS DOUBLE) * CAST(swx AS DOUBLE)) AS shape,
        |         sw, swx, swy
        |  FROM mom),
        |f2 AS (
        |  SELECT n, n_levels, shape,
        |         (CAST(swy AS DOUBLE) - shape * CAST(swx AS DOUBLE)) / sw AS icept9
        |  FROM fit)
        |SELECT n AS n_uncensored, n_levels,
        |       round(shape, 6) + 0.0 AS weibull_shape,
        |       round((CAST(0 AS DOUBLE) - icept9 / 1.0e9) / shape, 6) + 0.0 AS ln_scale_days
        |FROM f2""".stripMargin,
    // same four exact mean layers, same 1e-3 cell-term snaps
    "q474_twoway_fixed_effects" ->
      """WITH panel AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |         sum(CASE WHEN event_type = 'purchase' THEN floor(value * 100 + 0.5)::BIGINT ELSE 0 END)::BIGINT AS y,
        |         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS x
        |  FROM events GROUP BY 1, 2),
        |um AS (SELECT user_id, count(*)::BIGINT AS nu, sum(x)::BIGINT AS sxu,
        |              sum(y)::BIGINT AS syu FROM panel GROUP BY 1),
        |dm AS (SELECT day, count(*)::BIGINT AS nd, sum(x)::BIGINT AS sxd,
        |              sum(y)::BIGINT AS syd FROM panel GROUP BY 1),
        |gm AS (SELECT count(*)::BIGINT AS ng, sum(x)::BIGINT AS sxg,
        |              sum(y)::BIGINT AS syg,
        |              count(DISTINCT user_id)::BIGINT AS n_users,
        |              count(DISTINCT day)::BIGINT AS n_days
        |       FROM panel),
        |terms AS (
        |  SELECT p.x - u.sxu::DOUBLE / u.nu - d.sxd::DOUBLE / d.nd + g.sxg::DOUBLE / g.ng AS xt,
        |         p.y - u.syu::DOUBLE / u.nu - d.syd::DOUBLE / d.nd + g.syg::DOUBLE / g.ng AS yt,
        |         g.ng, g.n_users, g.n_days
        |  FROM panel p JOIN um u USING (user_id) JOIN dm d USING (day), gm g),
        |agg AS (
        |  SELECT max(ng)::BIGINT AS n_cells, max(n_users)::BIGINT AS n_users,
        |         max(n_days)::BIGINT AS n_days,
        |         sum(floor(xt * yt * 1.0e3 + 0.5)::BIGINT)::BIGINT AS sxy_e3,
        |         sum(floor(xt * xt * 1.0e3 + 0.5)::BIGINT)::BIGINT AS sxx_e3,
        |         sum(floor(yt * yt * 1.0e3 + 0.5)::BIGINT)::BIGINT AS syy_e3
        |  FROM terms),
        |b AS (SELECT n_cells, n_users, n_days, sxy_e3, sxx_e3, syy_e3,
        |             sxy_e3::DOUBLE / sxx_e3 AS beta FROM agg)
        |SELECT n_cells, n_users, n_days,
        |       round(beta, 6) + 0.0 AS beta_cents_per_view,
        |       round(beta * sxy_e3 / syy_e3, 6) + 0.0 AS within_r2
        |FROM b""".stripMargin,
    // same DECIMAL x·y moments, same two-fold decomposition chain
    "q475_oaxaca_blinder" ->
      """WITH base AS (
        |  SELECT c.c_mktsegment AS seg,
        |         floor(c.c_acctbal * 100 + 0.5)::BIGINT AS xb,
        |         floor(o.o_totalprice * 100 + 0.5)::BIGINT AS yv
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |mom AS (
        |  SELECT seg, count(*)::BIGINT AS n, sum(xb)::BIGINT AS sx,
        |         sum(yv)::BIGINT AS sy,
        |         sum(xb::HUGEINT * xb) AS sxx, sum(xb::HUGEINT * yv) AS sxy
        |  FROM base GROUP BY 1),
        |wide AS (
        |  SELECT max(CASE WHEN seg = 'BUILDING' THEN n END)::BIGINT AS na,
        |         max(CASE WHEN seg = 'BUILDING' THEN sx END)::BIGINT AS sxa,
        |         max(CASE WHEN seg = 'BUILDING' THEN sy END)::BIGINT AS sya,
        |         max(CASE WHEN seg = 'BUILDING' THEN sxx END) AS sxxa,
        |         max(CASE WHEN seg = 'BUILDING' THEN sxy END) AS sxya,
        |         max(CASE WHEN seg = 'MACHINERY' THEN n END)::BIGINT AS nb,
        |         max(CASE WHEN seg = 'MACHINERY' THEN sx END)::BIGINT AS sxb,
        |         max(CASE WHEN seg = 'MACHINERY' THEN sy END)::BIGINT AS syb,
        |         max(CASE WHEN seg = 'MACHINERY' THEN sxx END) AS sxxb,
        |         max(CASE WHEN seg = 'MACHINERY' THEN sxy END) AS sxyb
        |  FROM mom),
        |calc AS (
        |  SELECT na, nb,
        |         (CAST(na AS DOUBLE) * CAST(sxya AS DOUBLE) - CAST(sxa AS DOUBLE) * sya) / (CAST(na AS DOUBLE) * CAST(sxxa AS DOUBLE) - CAST(sxa AS DOUBLE) * sxa) AS ba,
        |         (CAST(nb AS DOUBLE) * CAST(sxyb AS DOUBLE) - CAST(sxb AS DOUBLE) * syb) / (CAST(nb AS DOUBLE) * CAST(sxxb AS DOUBLE) - CAST(sxb AS DOUBLE) * sxb) AS bb,
        |         CAST(sya AS DOUBLE) / na - CAST(syb AS DOUBLE) / nb AS gap,
        |         sxa, sxb
        |  FROM wide),
        |c2 AS (
        |  SELECT na, nb, ba, bb, gap,
        |         (CAST(sxa AS DOUBLE) / na - CAST(sxb AS DOUBLE) / nb) * bb AS explained
        |  FROM calc)
        |SELECT na AS n_building, nb AS n_machinery,
        |       round(ba, 6) + 0.0 AS beta_building,
        |       round(bb, 6) + 0.0 AS beta_machinery,
        |       round(gap, 6) + 0.0 AS mean_gap_cents,
        |       round(explained, 6) + 0.0 AS explained_cents,
        |       round(gap - explained, 6) + 0.0 AS unexplained_cents
        |FROM c2""".stripMargin,
    // same exact value-based decile cuts, same ppm lattices
    "q476_gains_table" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day, event_type,
        |         floor(value * 100 + 0.5)::BIGINT AS cents
        |  FROM events),
        |d0 AS (SELECT min(day) AS day0 FROM ev),
        |per AS (
        |  SELECT user_id,
        |         sum(CASE WHEN ev.day - d0.day0 < 15 AND event_type = 'purchase' THEN cents ELSE 0 END)::BIGINT AS score,
        |         max(CASE WHEN ev.day - d0.day0 >= 15 AND event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS buyer
        |  FROM ev, d0 GROUP BY 1),
        |vc AS (SELECT score, count(*)::BIGINT AS cnt FROM per GROUP BY 1),
        |n AS (SELECT sum(cnt)::BIGINT AS n FROM vc),
        |cuts AS (
        |  SELECT min(CASE WHEN cum >= (1 * n.n + 9) // 10 THEN score END)::BIGINT AS t1,
        |         min(CASE WHEN cum >= (2 * n.n + 9) // 10 THEN score END)::BIGINT AS t2,
        |         min(CASE WHEN cum >= (3 * n.n + 9) // 10 THEN score END)::BIGINT AS t3,
        |         min(CASE WHEN cum >= (4 * n.n + 9) // 10 THEN score END)::BIGINT AS t4,
        |         min(CASE WHEN cum >= (5 * n.n + 9) // 10 THEN score END)::BIGINT AS t5,
        |         min(CASE WHEN cum >= (6 * n.n + 9) // 10 THEN score END)::BIGINT AS t6,
        |         min(CASE WHEN cum >= (7 * n.n + 9) // 10 THEN score END)::BIGINT AS t7,
        |         min(CASE WHEN cum >= (8 * n.n + 9) // 10 THEN score END)::BIGINT AS t8,
        |         min(CASE WHEN cum >= (9 * n.n + 9) // 10 THEN score END)::BIGINT AS t9
        |  FROM (SELECT score, sum(cnt) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS cum
        |        FROM vc) c, n),
        |tot AS (SELECT count(*)::BIGINT AS nu, sum(buyer)::BIGINT AS nb FROM per),
        |buckets AS (
        |  SELECT (1 + (score > t1)::INT + (score > t2)::INT + (score > t3)::INT +
        |           (score > t4)::INT + (score > t5)::INT + (score > t6)::INT +
        |           (score > t7)::INT + (score > t8)::INT + (score > t9)::INT)::BIGINT AS decile,
        |         count(*)::BIGINT AS n_users, sum(buyer)::BIGINT AS n_buyers
        |  FROM per, cuts GROUP BY 1),
        |cumd AS (
        |  SELECT b.decile, b.n_users, b.n_buyers, t.nu, t.nb,
        |         (sum(b.n_buyers) OVER (ORDER BY b.decile DESC ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_buyers
        |  FROM buckets b, tot t)
        |SELECT decile, n_users, n_buyers,
        |       (n_buyers * 1000000 // n_users)::BIGINT AS rate_ppm,
        |       (cum_buyers * 1000000 // nb)::BIGINT AS cum_gain_ppm,
        |       round((n_buyers::DOUBLE / n_users) / (nb::DOUBLE / nu), 6) + 0.0 AS lift
        |FROM cumd ORDER BY decile""".stripMargin
  )
}
