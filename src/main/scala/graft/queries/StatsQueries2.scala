package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-16 widening, second batch: trend testing (Mann–Kendall + Sen's
  * slope), experimentation engineering (delta-method ratio metrics,
  * two-proportion power design, Wilson intervals), empirical Bayes
  * (James–Stein shrinkage), forecasting evaluation (naive/seasonal/drift
  * backtest scorecard), inventory (safety stock / reorder point beside
  * q451's EOQ), keyphrase extraction (RAKE), post-hoc testing (Tukey
  * HSD), and market concentration (CR4/CR8 beside q427's HHI).
  *
  * Same exactness discipline as [[StatsQueries]]: integer lattices for
  * every flag, per-term 1e-6/1e-9 snaps before cross-engine sums whose
  * accumulation order Spark and DuckDB don't share, published critical
  * values injected as identical string-cast literals into BOTH plans,
  * and mirrored left-associated IEEE chains everywhere else.
  */
object StatsQueries2 extends QueryModule {

  /** Φ⁻¹(0.975) / Φ⁻¹(0.8) / q_{0.05,5,∞} / Φ⁻¹(0.95) — published
    * critical values, injected as string-cast literals into both engines
    * (the q441 device; nobody evaluates an inverse CDF).
    */
  private val Z975 = "1.959963984540054"
  private val Z80 = "0.8416212335729143"
  private val Z95 = "1.6448536269514722"
  private val QTUKEY5 = "3.858"

  /** q453: MANN–KENDALL TREND TEST + SEN'S SLOPE — the nonparametric
    * trend pair every monitoring stack runs on a daily series (q283's
    * Spearman correlates two variables; MK asks "is THIS series going
    * up", Sen answers "by how much per day, robustly"): daily active
    * users over the 30-day event window.
    *
    * Determinism: S and the tie-corrected 18·Var(S) are exact BIGINTs
    * (integer tie census); z is the continuity-corrected IEEE chain on
    * them; the trend flag is decided on the 1e-6 lattice (≥ 1 959 964,
    * i.e. |z| ≥ 1.959964 after snap); Sen's slope is the exact type-1
    * median of the C(n,2) pairwise slopes under a total (slope, i, j)
    * order. Scale: all pair work is a self-join of the ≤calendar-day
    * census — domain-bounded.
    */
  def q453MannKendall(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
    val d0 = ev.agg(min("day").as("day0"))
    // censusL keeps the aggregate LINEAGE (the Sen window below must
    // sit on it for PlanGuards to see the census bound — a checkpoint
    // leaf hides it); the checkpointed copy feeds the cheap aggregates
    val censusL = ev.crossJoin(broadcast(d0))
      .select(col("user_id"), (col("day") - col("day0")).as("d"))
      .distinct()
      .groupBy("d").agg(count(lit(1)).as("u"))
    val census = censusL.localCheckpoint()
    val a = census.toDF("dj", "uj")
    val b = census.toDF("di", "ui")
    val pairs = b.join(a, col("di") < col("dj"))
    val s = pairs.agg(
      sum(expr("CASE WHEN uj > ui THEN 1L WHEN uj < ui THEN -1L ELSE 0L END"))
        .as("s_stat"),
      count(lit(1)).as("m"))
    val ties = census.groupBy("u").agg(count(lit(1)).as("t"))
      .agg(sum(expr("t * (t - 1L) * (2L * t + 5L)")).as("tie_sum"))
    val nTot = census.agg(count(lit(1)).as("n"))
    val sen = censusL.toDF("di", "ui")
      .join(censusL.toDF("dj", "uj"), col("di") < col("dj"))
      .withColumn("slope", expr("CAST(uj - ui AS DOUBLE) / (dj - di)"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("slope"), col("di"), col("dj"))))
      .crossJoin(broadcast(s.select(col("m").as("mm"))))
      .filter(col("rn") === expr("(mm + 1L) div 2L"))
      .select(col("slope").as("sen_slope_raw"))
    s.crossJoin(broadcast(nTot)).crossJoin(broadcast(ties))
      .crossJoin(broadcast(sen))
      .withColumn("var18",
        expr("n * (n - 1L) * (2L * n + 5L) - tie_sum"))
      .withColumn("z", expr(
        "CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(CAST(var18 AS DOUBLE) / CAST(18 AS DOUBLE)) " +
          "WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(CAST(var18 AS DOUBLE) / CAST(18 AS DOUBLE)) " +
          "ELSE CAST(0 AS DOUBLE) END"))
      .select(col("n").as("n_days"), col("s_stat"), col("var18"),
        expr("round(z, 6)").as("z"),
        expr("CASE WHEN CAST(floor(abs(z) * 1.0e6 + 0.5) AS BIGINT) >= 1959964L THEN 1L ELSE 0L END")
          .as("trend"),
        expr("round(sen_slope_raw, 6)").as("sen_slope"))
  }

  /** q454: DELTA-METHOD RATIO-METRIC z-TEST — the test practitioners
    * actually need for revenue-per-active-day (the unit of analysis is
    * the USER but the metric is a ratio of user sums, so the naive
    * per-user-mean t-test (q176) answers a different question): md5-coin
    * arms, Var(ΣX/ΣY) by the delta method from per-user moments.
    *
    * Determinism: all twelve moments are exact in ONE conditional
    * aggregate pass — counts and linear sums as BIGINT, the
    * second-moment sums (sxx/syy/sxy) as DECIMAL(38,0) ↔ HUGEINT (the
    * q457 device: cents²-scale sums overflow BIGINT at sf1+, and both
    * engines' wide-int → double conversions round identically); every
    * ratio/variance/z is the identical left-associated IEEE chain on
    * them (squares of data-sized sums go through CAST-first double
    * products, never BIGINT); significance on the 1e-6 lattice. Scale:
    * one per-user aggregate + a 1-row census.
    */
  def q454DeltaMethodRatio(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        when(col("event_type") === "purchase",
          floor(col("value") * 100.0 + 0.5).cast("long")).otherwise(0L).as("cents"))
      .groupBy("user_id")
      .agg(sum("cents").as("x"), countDistinct("day").as("y"))
      .withColumn("g", expr(
        "cast(conv(substring(md5(concat('dm#', cast(user_id as string))), 1, 2), 16, 10) as bigint) % 2"))
    val mom = per.agg(
      sum(when(col("g") === 0L, 1L).otherwise(0L)).as("n0"),
      sum(when(col("g") === 0L, col("x")).otherwise(0L)).as("sx0"),
      sum(when(col("g") === 0L, col("y")).otherwise(0L)).as("sy0"),
      // widen BEFORE the product (oracle mirrors with ::HUGEINT * x):
      // a post-product cast still multiplies in BIGINT and throws under
      // ANSI once a single per-user x² exceeds 2⁶³
      sum(expr("CASE WHEN g = 0 THEN CAST(x AS DECIMAL(38,0)) * x ELSE CAST(0 AS DECIMAL(38,0)) END")).as("sxx0"),
      sum(expr("CASE WHEN g = 0 THEN CAST(y AS DECIMAL(38,0)) * y ELSE CAST(0 AS DECIMAL(38,0)) END")).as("syy0"),
      sum(expr("CASE WHEN g = 0 THEN CAST(x AS DECIMAL(38,0)) * y ELSE CAST(0 AS DECIMAL(38,0)) END")).as("sxy0"),
      sum(when(col("g") === 1L, 1L).otherwise(0L)).as("n1"),
      sum(when(col("g") === 1L, col("x")).otherwise(0L)).as("sx1"),
      sum(when(col("g") === 1L, col("y")).otherwise(0L)).as("sy1"),
      sum(expr("CASE WHEN g = 1 THEN CAST(x AS DECIMAL(38,0)) * x ELSE CAST(0 AS DECIMAL(38,0)) END")).as("sxx1"),
      sum(expr("CASE WHEN g = 1 THEN CAST(y AS DECIMAL(38,0)) * y ELSE CAST(0 AS DECIMAL(38,0)) END")).as("syy1"),
      sum(expr("CASE WHEN g = 1 THEN CAST(x AS DECIMAL(38,0)) * y ELSE CAST(0 AS DECIMAL(38,0)) END")).as("sxy1"))
    def rCol(i: Int): String = s"CAST(sx$i AS DOUBLE) / sy$i AS r$i"
    def vCol(i: Int): String =
      (s"((CAST(n$i AS DOUBLE) * sxx$i - CAST(sx$i AS DOUBLE) * sx$i) / (CAST(n$i AS DOUBLE) * (n$i - 1)) " +
        s"- CAST(2 AS DOUBLE) * (CAST(sx$i AS DOUBLE) / sy$i) * ((CAST(n$i AS DOUBLE) * sxy$i - CAST(sx$i AS DOUBLE) * sy$i) / (CAST(n$i AS DOUBLE) * (n$i - 1))) " +
        s"+ (CAST(sx$i AS DOUBLE) / sy$i) * (CAST(sx$i AS DOUBLE) / sy$i) * ((CAST(n$i AS DOUBLE) * syy$i - CAST(sy$i AS DOUBLE) * sy$i) / (CAST(n$i AS DOUBLE) * (n$i - 1)))) " +
        s"/ (CAST(n$i AS DOUBLE) * (CAST(sy$i AS DOUBLE) / n$i) * (CAST(sy$i AS DOUBLE) / n$i)) AS v$i")
    mom.selectExpr("n0", "n1", rCol(0), vCol(0), rCol(1), vCol(1))
      .withColumn("z", expr("(r1 - r0) / sqrt(v0 + v1)"))
      .select(col("n0").as("n_a"), col("n1").as("n_b"),
        expr("round(r0, 6)").as("r_a"), expr("round(r1, 6)").as("r_b"),
        expr("round(z, 6)").as("z"),
        expr("CASE WHEN CAST(floor(abs(z) * 1.0e6 + 0.5) AS BIGINT) >= 1959964L THEN 1L ELSE 0L END")
          .as("significant"))
  }

  /** q455: TWO-PROPORTION POWER / SAMPLE-SIZE design — the question every
    * experiment review asks FIRST ("how many users do we need to see a
    * 2-point lift at α = 0.05, power 0.8?"), computed from the observed
    * (user, day)-session baseline conversion (the q440/q441 unit —
    * user-level "ever purchased" saturates near 1 on this fixture): n = (z_{α/2}·√(2p̄q̄) + z_β·√(p₁q₁+p₂q₂))²/δ².
    *
    * Determinism: p₁ is an exact count ratio (one divide); z literals are
    * the published constants string-cast into both plans (the q441
    * device); the chain is mirrored and the ceiling of an IEEE double is
    * exact. Scale: one per-user aggregate to a 1-row census.
    */
  def q455PowerDesign(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c"))
      .agg(count(lit(1)).as("n_sessions"), sum("c").as("n_conv"))
      .withColumn("p1", expr("CAST(n_conv AS DOUBLE) / n_sessions"))
      .withColumn("p2", expr("CAST(n_conv AS DOUBLE) / n_sessions + CAST('0.02' AS DOUBLE)"))
      .withColumn("pbar", expr("(p1 + p2) / CAST(2 AS DOUBLE)"))
      .withColumn("num", expr(
        s"CAST('$Z975' AS DOUBLE) * sqrt(CAST(2 AS DOUBLE) * pbar * (CAST(1 AS DOUBLE) - pbar)) " +
          s"+ CAST('$Z80' AS DOUBLE) * sqrt(p1 * (CAST(1 AS DOUBLE) - p1) + p2 * (CAST(1 AS DOUBLE) - p2))"))
      .select(col("n_sessions"), col("n_conv"),
        expr("round(p1, 6)").as("p1"), expr("round(p2, 6)").as("p2"),
        expr("CAST(ceiling(num * num / (CAST('0.02' AS DOUBLE) * CAST('0.02' AS DOUBLE))) AS BIGINT)")
          .as("n_per_arm"))
  }

  /** q456: WILSON SCORE INTERVALS — the binomial CI that behaves at
    * small n and extreme p (the Wald interval every dashboard naively
    * ships collapses there): per-nation customer→buyer conversion with
    * 95% Wilson bounds, flagged where the GLOBAL rate falls outside.
    *
    * Determinism: k and n are exact counts; the Wilson chain is mirrored
    * IEEE on them with the z literal string-cast into both plans; the
    * outside-flag compares 1e-6-snapped bounds and global rate. Scale:
    * broadcast dim join + per-nation census.
    */
  def q456WilsonIntervals(spark: SparkSession, dir: String): DataFrame = {
    val buyers = Tables.orders(spark, dir).select(col("o_custkey")).distinct()
      .withColumn("b", lit(1L))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("nation"))
    val grp = cust.join(buyers, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("nation")
      .agg(count(lit(1)).as("n_cust"), sum(coalesce(col("b"), lit(0L))).as("n_buyers"))
      .localCheckpoint()
    val tot = grp.agg(sum("n_cust").as("nn"), sum("n_buyers").as("kk"))
    grp.crossJoin(broadcast(tot))
      .withColumn("z", expr(s"CAST('$Z975' AS DOUBLE)"))
      .withColumn("p", expr("CAST(n_buyers AS DOUBLE) / n_cust"))
      .withColumn("g", expr("CAST(kk AS DOUBLE) / nn"))
      .withColumn("denom", expr("CAST(1 AS DOUBLE) + z * z / n_cust"))
      .withColumn("center", expr("(p + z * z / (CAST(2 AS DOUBLE) * n_cust)) / denom"))
      .withColumn("half", expr(
        "z * sqrt(p * (CAST(1 AS DOUBLE) - p) / n_cust + z * z / (CAST(4 AS DOUBLE) * n_cust * n_cust)) / denom"))
      .select(col("nation"), col("n_cust"), col("n_buyers"),
        expr("round(p, 6)").as("p_hat"),
        expr("round(center - half, 6)").as("wilson_lo"),
        expr("round(center + half, 6)").as("wilson_hi"),
        expr("CASE WHEN CAST(floor(g * 1.0e6 + 0.5) AS BIGINT) < CAST(floor((center - half) * 1.0e6 + 0.5) AS BIGINT) " +
          "OR CAST(floor(g * 1.0e6 + 0.5) AS BIGINT) > CAST(floor((center + half) * 1.0e6 + 0.5) AS BIGINT) THEN 1L ELSE 0L END")
          .as("global_outside"))
      .orderBy("nation")
  }

  /** q457: JAMES–STEIN SHRINKAGE — empirical-Bayes partial pooling of
    * per-nation mean order values toward the grand mean (the estimator
    * that DOMINATES the per-group MLE at k ≥ 4, and the principled
    * answer to "this nation has 12 orders, do we trust its mean?"):
    * positive-part common shrinkage c = max(0, 1 − (k−3)·σ̄²_mean/SS).
    *
    * Determinism: per-nation means live on the exact cents lattice
    * (s div n); k·SS = k·Σm² − (Σm)² is an exact BIGINT; each nation's
    * cents²-scale variance-of-mean term (too big for any BIGINT snap)
    * joins the k-row sum through an ORDER-PINNED cumulative over the
    * nation-sorted census — identical add order in both engines; Σv²
    * rides a DECIMAL(38,0) sum (BIGINT would overflow at sf1+) and both
    * engines' wide-int → double conversions round identically. Scale: one fact aggregate
    * per nation + a 1-row census.
    */
  def q457JamesStein(spark: SparkSession, dir: String): DataFrame = {
    val grp = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .join(broadcast(Tables.nation(spark, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("nation"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("nation"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("v"))
      .groupBy("nation")
      .agg(count(lit(1)).as("n"), sum("v").as("s"),
        sum((col("v") * col("v")).cast("decimal(38,0)")).as("sqq"))
      .withColumn("m", expr("s div n"))
      // σ²/n is cents²-scale (≈10¹⁶) — a 1e6 snap overflows BIGINT, so
      // the k-row sum is order-PINNED instead: cumulative over the
      // nation-sorted census (identical add order in both engines),
      // total read as max (terms are positive)
      .withColumn("vm", expr(
        "(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(s AS DOUBLE) * s) / (CAST(n AS DOUBLE) * (n - 1)) / n"))
      .withColumn("vm_cum", sum("vm").over(Window.orderBy("nation")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint()
    val tot = grp.agg(count(lit(1)).as("k"), sum("m").as("sm"),
      sum(expr("m * m")).as("sm2"), max("vm_cum").as("vm_sum"))
      .withColumn("ssk", expr("k * sm2 - sm * sm"))
      .withColumn("c", expr(
        "greatest(CAST(0 AS DOUBLE), CAST(1 AS DOUBLE) - (k - 3) * vm_sum / ssk)"))
    grp.crossJoin(broadcast(tot))
      .select(col("nation"), col("n").as("n_orders"),
        col("m").as("raw_mean_cents"),
        expr("round(CAST(sm AS DOUBLE) / k + c * (m - CAST(sm AS DOUBLE) / k), 6)")
          .as("js_mean_cents"),
        expr("round(c, 6)").as("shrink_c"))
      .orderBy("nation")
  }

  /** q458: FORECAST BACKTEST SCORECARD — MAE/MAPE/sMAPE/MASE for the
    * three canonical baselines (naive-last, seasonal-naive t−7, drift)
    * on a 23/7 train/test split of daily purchases: the scorecard that
    * tells a forecasting effort what it must beat, and the MASE
    * denominator that makes "beat" scale-free (Hyndman–Koehler '06).
    *
    * Determinism: naive/seasonal errors are exact BIGINTs; drift errors
    * are exact on the ×22 integer lattice (the slope denominator);
    * MAPE/sMAPE terms are snapped to 1e-9 BEFORE the 7-day sums; MASE is
    * one mirrored divide of exact sums. Scale: one day census + windows
    * over it.
    */
  def q458ForecastScorecard(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(expr("unix_micros(ts) div 86400000000").as("day"))
    val d0 = ev.agg(min("day").as("day0"))
    val wAsc = Window.orderBy("d")
    // both lag columns ride the agg-bounded lineage BEFORE the
    // checkpoint (PlanGuards sees the census bound under the window)
    val daily = ev.crossJoin(broadcast(d0))
      .groupBy((col("day") - col("day0")).as("d"))
      .agg(count(lit(1)).as("y"))
      .withColumn("prev", lag("y", 1).over(wAsc))
      .withColumn("ylag7", lag("y", 7).over(wAsc))
      .localCheckpoint()
    val refs = daily.agg(
      max(when(col("d") === 0, col("y"))).as("y0"),
      max(when(col("d") === 22, col("y"))).as("y22"))
    val maeIn = daily
      .filter(col("d") >= 1 && col("d") <= 22)
      .agg(sum(expr("abs(y - prev)")).as("dsum"), count(lit(1)).as("dn"))
    val test = daily
      .filter(col("d") >= 23)
      .crossJoin(broadcast(refs)).crossJoin(broadcast(maeIn))
      .withColumn("e_naive", expr("abs(y - y22)"))
      .withColumn("e_snaive", expr("abs(y - ylag7)"))
      .withColumn("e22_drift", expr("abs(22L * y - 22L * y22 - (d - 22L) * (y22 - y0))"))
      .localCheckpoint()
    val naive = test.agg(
      count(lit(1)).as("h"), max("dsum").as("dsum"), max("dn").as("dn"),
      sum(expr("e_naive")).as("esum"),
      sum(expr("CAST(floor(CAST(e_naive AS DOUBLE) / y * 1.0e9 + 0.5) AS BIGINT)")).as("mape_e9"),
      sum(expr("CAST(floor(CAST(2L * e_naive AS DOUBLE) / (y + y22) * 1.0e9 + 0.5) AS BIGINT)")).as("smape_e9"))
      .select(lit("naive").as("method"),
        expr("round(CAST(esum AS DOUBLE) / h, 6)").as("mae"),
        expr("round(CAST(mape_e9 AS DOUBLE) / h / 1.0e9, 6)").as("mape"),
        expr("round(CAST(smape_e9 AS DOUBLE) / h / 1.0e9, 6)").as("smape"),
        expr("round((CAST(esum AS DOUBLE) / h) / (CAST(dsum AS DOUBLE) / dn), 6)").as("mase"))
    val snaive = test.agg(
      count(lit(1)).as("h"), max("dsum").as("dsum"), max("dn").as("dn"),
      sum(expr("e_snaive")).as("esum"),
      sum(expr("CAST(floor(CAST(e_snaive AS DOUBLE) / y * 1.0e9 + 0.5) AS BIGINT)")).as("mape_e9"),
      sum(expr("CAST(floor(CAST(2L * e_snaive AS DOUBLE) / (y + ylag7) * 1.0e9 + 0.5) AS BIGINT)")).as("smape_e9"))
      .select(lit("seasonal_naive").as("method"),
        expr("round(CAST(esum AS DOUBLE) / h, 6)").as("mae"),
        expr("round(CAST(mape_e9 AS DOUBLE) / h / 1.0e9, 6)").as("mape"),
        expr("round(CAST(smape_e9 AS DOUBLE) / h / 1.0e9, 6)").as("smape"),
        expr("round((CAST(esum AS DOUBLE) / h) / (CAST(dsum AS DOUBLE) / dn), 6)").as("mase"))
    val drift = test.agg(
      count(lit(1)).as("h"), max("dsum").as("dsum"), max("dn").as("dn"),
      sum(expr("e22_drift")).as("e22sum"),
      sum(expr("CAST(floor(CAST(e22_drift AS DOUBLE) / (22L * y) * 1.0e9 + 0.5) AS BIGINT)")).as("mape_e9"),
      sum(expr("CAST(floor(CAST(2L * e22_drift AS DOUBLE) / (22L * y + 22L * y22 + (d - 22L) * (y22 - y0)) * 1.0e9 + 0.5) AS BIGINT)")).as("smape_e9"))
      .select(lit("drift").as("method"),
        expr("round(CAST(e22sum AS DOUBLE) / 22L / h, 6)").as("mae"),
        expr("round(CAST(mape_e9 AS DOUBLE) / h / 1.0e9, 6)").as("mape"),
        expr("round(CAST(smape_e9 AS DOUBLE) / h / 1.0e9, 6)").as("smape"),
        expr("round((CAST(e22sum AS DOUBLE) / 22L / h) / (CAST(dsum AS DOUBLE) / dn), 6)").as("mase"))
    naive.unionByName(snaive).unionByName(drift).orderBy("method")
  }

  /** q459: SAFETY STOCK + REORDER POINT — the service-level companion of
    * q451's EOQ (EOQ sizes the order; this times it): per part class,
    * SS = z₀.₉₅·σ_d·√L and ROP = μ_d·L + SS at lead time L = 7 days,
    * from the exact daily-demand census moments.
    *
    * Determinism: daily demand is the q439 integer census; μ and σ come
    * from exact BIGINT moments through the mirrored chain; z is the
    * published literal; √7 is one correctly-rounded sqrt. Scale: one
    * (class, day) census + a per-class aggregate.
    */
  def q459SafetyStock(spark: SparkSession, dir: String): DataFrame = {
    val demand = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
        .select(col("p_partkey"),
          expr("element_at(split(p_type, ' '), 1)").as("cls"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("cls"),
        expr("unix_micros(l_shipdate) div 86400000000").as("day"),
        floor(col("l_quantity") + 0.5).cast("long").as("q"))
      .groupBy("cls", "day").agg(sum("q").as("dq"))
    demand.groupBy("cls")
      .agg(count(lit(1)).as("n_days"), sum("dq").as("s"),
        sum(expr("dq * dq")).as("s2"))
      .withColumn("mu", expr("CAST(s AS DOUBLE) / n_days"))
      .withColumn("sigma", expr(
        "sqrt((CAST(n_days AS DOUBLE) * s2 - CAST(s AS DOUBLE) * s) / (CAST(n_days AS DOUBLE) * (n_days - 1)))"))
      .withColumn("ss", expr(
        s"CAST('$Z95' AS DOUBLE) * sigma * sqrt(CAST(7 AS DOUBLE))"))
      .select(col("cls"), col("n_days"),
        expr("round(mu, 6)").as("mu_daily"),
        expr("round(sigma, 6)").as("sigma_daily"),
        expr("round(ss, 6)").as("safety_stock"),
        expr("round(mu * CAST(7 AS DOUBLE) + ss, 6)").as("reorder_point"))
      .orderBy("cls")
  }

  /** q460: RAKE KEYPHRASES (Rose et al. '10) — stopword-delimited
    * candidate phrases scored by Σ deg(w)/freq(w), the zero-training
    * keyphrase extractor beside the tf-idf/BM25 term scorers (q48/q67):
    * phrases split on the corpus stopwords {'the','a'}, word degree =
    * Σ length of phrases containing it.
    *
    * Determinism: degree and frequency are exact integer censuses; each
    * word's score lives on the deg·10⁹ div freq lattice and phrase
    * scores are BIGINT sums of those; identical phrase texts share one
    * score by construction; top-10 under a total (score, phrase) order.
    * Scale: phrase ids come from a per-doc cumulative window (partitioned
    * by doc — row-bounded by doc length); word/phrase censuses shuffle
    * on their keys.
    */
  def q460RakeKeyphrases(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), explode(expr(
        "transform(split(text, ' '), (x, i) -> struct(i AS pos, x AS w))")).as("t"))
      .select(col("doc_id"), col("t.pos").as("pos"), col("t.w").as("w"))
      .withColumn("is_stop",
        when(col("w").isin("the", "a"), 1L).otherwise(0L))
      .withColumn("pid", sum("is_stop").over(
        Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("is_stop") === 0L)
      .localCheckpoint()
    val plen = toks.groupBy("doc_id", "pid").agg(count(lit(1)).as("len"))
    val wstat = toks.join(plen, Seq("doc_id", "pid"))
      .groupBy("w").agg(count(lit(1)).as("freq"), sum("len").as("deg"))
      .withColumn("wscore_e9", expr("deg * 1000000000L div freq"))
    val phrases = toks.join(wstat.select("w", "wscore_e9"), Seq("w"))
      .groupBy("doc_id", "pid")
      .agg(expr("array_join(transform(sort_array(collect_list(struct(pos, w))), s -> s.w), ' ')")
          .as("phrase"),
        sum("wscore_e9").as("score_e9"), count(lit(1)).as("n_words"))
    phrases.groupBy("phrase")
      .agg(max("n_words").as("n_words"), count(lit(1)).as("n_occurrences"),
        max("score_e9").as("score_e9"))
      .orderBy(col("score_e9").desc, col("phrase").asc)
      .limit(10)
      .select("phrase", "n_words", "n_occurrences", "score_e9")
  }

  /** q461: TUKEY HSD POST-HOC — the honest follow-up every omnibus test
    * owes its reader (q316/q393 say "the groups differ"; Tukey–Kramer
    * says WHICH pairs, at family-wise α): all 10 order-priority pairs on
    * mean order value, studentized-range critical value q₀.₀₅,₅,∞.
    *
    * Determinism: per-group moments are exact (Σv² on DECIMAL(38,0));
    * each group's cents²-scale s²/n term joins the k-row sum through an
    * order-pinned cumulative (the q457 device — a BIGINT snap would
    * overflow); the q literal is string-cast into both plans; the
    * significance flag compares 1e-6-snapped |diff| and HSD. Scale: one
    * fact aggregate + a 5-row census self-join.
    */
  def q461TukeyHsd(spark: SparkSession, dir: String): DataFrame = {
    val grp = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("g"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("v"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("s"),
        sum((col("v") * col("v")).cast("decimal(38,0)")).as("sqq"))
      // s²/n is cents²-scale — order-pinned cumulative (the q457
      // device) instead of an overflowing snap
      .withColumn("cm", expr("CAST(s AS DOUBLE) * s / n"))
      .withColumn("cm_cum", sum("cm").over(Window.orderBy("g")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint()
    // Σv² stays an exact DECIMAL sum (a double sum's accumulation
    // order is engine- and partition-dependent); ONE conversion after
    val tot = grp.agg(sum("n").as("nn"), count(lit(1)).as("k"),
      sum("sqq").as("sqq_all"), max("cm_cum").as("cm_sum"))
      .withColumn("msw", expr(
        "(CAST(sqq_all AS DOUBLE) - cm_sum) / (nn - k)"))
    val a = grp.select(col("g").as("g1"), col("n").as("n1"), col("s").as("s1"))
    val b = grp.select(col("g").as("g2"), col("n").as("n2"), col("s").as("s2"))
    a.join(b, col("g1") < col("g2"))
      .crossJoin(broadcast(tot.select("msw")))
      .withColumn("diff", expr("CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2"))
      .withColumn("hsd", expr(
        s"CAST('$QTUKEY5' AS DOUBLE) * sqrt(msw / CAST(2 AS DOUBLE) * (CAST(1 AS DOUBLE) / n1 + CAST(1 AS DOUBLE) / n2))"))
      .select(col("g1"), col("g2"),
        expr("round(diff, 6)").as("mean_diff_cents"),
        expr("round(hsd, 6)").as("hsd_cents"),
        expr("CASE WHEN CAST(floor(abs(diff) * 1.0e6 + 0.5) AS BIGINT) > CAST(floor(hsd * 1.0e6 + 0.5) AS BIGINT) THEN 1L ELSE 0L END")
          .as("significant"))
      .orderBy("g1", "g2")
  }

  /** q462: CR4 / CR8 CONCENTRATION RATIOS — the antitrust-standard
    * concentration readout beside q427's HHI (HHI squares every share;
    * CR-k reports how much the top k suppliers own): supplier revenue
    * shares of discounted lineitem cents.
    *
    * Determinism: revenue is the exact floor-cents lattice; ranks break
    * ties by supplier key; shares are ppm integer divisions. Scale: one
    * fact aggregate per supplier; the rank window runs over that census.
    */
  def q462ConcentrationRatios(spark: SparkSession, dir: String): DataFrame = {
    val sup = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0 + 0.5)
          .cast("long").as("cents"))
      .groupBy("l_suppkey").agg(sum("cents").as("rev"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("rev").desc, col("l_suppkey").asc)))
    sup.agg(count(lit(1)).as("n_suppliers"), sum("rev").as("total_cents"),
        sum(when(col("rn") <= 4, col("rev")).otherwise(0L)).as("top4"),
        sum(when(col("rn") <= 8, col("rev")).otherwise(0L)).as("top8"),
        sum(when(col("rn") === 1, col("rev")).otherwise(0L)).as("top1"))
      // cents·10⁶ products ride DECIMAL(38,0) — the q421 class, one SF
      // further out (top-k revenue wraps BIGINT·10⁶ around sf100+)
      .select(col("n_suppliers"), col("total_cents"),
        expr("CAST(top1 AS DECIMAL(38,0)) * 1000000 div total_cents").as("cr1_ppm"),
        expr("CAST(top4 AS DECIMAL(38,0)) * 1000000 div total_cents").as("cr4_ppm"),
        expr("CAST(top8 AS DECIMAL(38,0)) * 1000000 div total_cents").as("cr8_ppm"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q453_mann_kendall" -> (q453MannKendall _),
    "q454_delta_method_ratio" -> (q454DeltaMethodRatio _),
    "q455_power_design" -> (q455PowerDesign _),
    "q456_wilson_intervals" -> (q456WilsonIntervals _),
    "q457_james_stein" -> (q457JamesStein _),
    "q458_forecast_scorecard" -> (q458ForecastScorecard _),
    "q459_safety_stock" -> (q459SafetyStock _),
    "q460_rake_keyphrases" -> (q460RakeKeyphrases _),
    "q461_tukey_hsd" -> (q461TukeyHsd _),
    "q462_concentration_ratios" -> (q462ConcentrationRatios _)
  )

  override val oracles: Map[String, String] = Map(
    // same exact S / 18·Var BIGINTs, same continuity-corrected chain,
    // same type-1 pairwise-slope median under (slope, di, dj)
    "q453_mann_kendall" ->
      """WITH ev AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |d0 AS (SELECT min(day) AS day0 FROM ev),
        |census AS (
        |  SELECT ev.day - d0.day0 AS d, count(*)::BIGINT AS u
        |  FROM ev, d0 GROUP BY 1),
        |pairs AS (
        |  SELECT b.d AS di, b.u AS ui, a.d AS dj, a.u AS uj
        |  FROM census b JOIN census a ON b.d < a.d),
        |s AS (
        |  SELECT sum(CASE WHEN uj > ui THEN 1 WHEN uj < ui THEN -1 ELSE 0 END)::BIGINT AS s_stat,
        |         count(*)::BIGINT AS m
        |  FROM pairs),
        |ties AS (
        |  SELECT sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tie_sum
        |  FROM (SELECT u, count(*)::BIGINT AS t FROM census GROUP BY 1)),
        |n AS (SELECT count(*)::BIGINT AS n FROM census),
        |sen AS (
        |  SELECT slope AS sen_slope_raw
        |  FROM (SELECT (uj - ui)::DOUBLE / (dj - di) AS slope, di, dj,
        |               row_number() OVER (ORDER BY (uj - ui)::DOUBLE / (dj - di), di, dj) AS rn
        |        FROM pairs) p, s
        |  WHERE p.rn = (s.m + 1) // 2),
        |z AS (
        |  SELECT n.n, s.s_stat,
        |         (n.n * (n.n - 1) * (2 * n.n + 5) - t.tie_sum)::BIGINT AS var18,
        |         sen.sen_slope_raw
        |  FROM s, ties t, n, sen)
        |SELECT n AS n_days, s_stat, var18,
        |       round(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var18::DOUBLE / 18::DOUBLE)
        |                  WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var18::DOUBLE / 18::DOUBLE)
        |                  ELSE 0::DOUBLE END, 6) + 0.0 AS z,
        |       (CASE WHEN floor(abs(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var18::DOUBLE / 18::DOUBLE)
        |                                 WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var18::DOUBLE / 18::DOUBLE)
        |                                 ELSE 0::DOUBLE END) * 1.0e6 + 0.5)::BIGINT >= 1959964 THEN 1 ELSE 0 END)::BIGINT AS trend,
        |       round(sen_slope_raw, 6) + 0.0 AS sen_slope
        |FROM z""".stripMargin,
    // same 12 exact moments in one pass, same delta-method chain
    "q454_delta_method_ratio" ->
      """WITH per AS (
        |  SELECT user_id, sum(CASE WHEN event_type = 'purchase' THEN floor(value * 100 + 0.5)::BIGINT ELSE 0 END)::BIGINT AS x,
        |         count(DISTINCT epoch_us(ts) // 86400000000)::BIGINT AS y,
        |         ('0x' || substr(md5('dm#' || user_id::VARCHAR), 1, 2))::BIGINT % 2 AS g
        |  FROM events GROUP BY user_id),
        |mom AS (
        |  SELECT sum(CASE WHEN g = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
        |         sum(CASE WHEN g = 0 THEN x ELSE 0 END)::BIGINT AS sx0,
        |         sum(CASE WHEN g = 0 THEN y ELSE 0 END)::BIGINT AS sy0,
        |         sum(CASE WHEN g = 0 THEN x::HUGEINT * x ELSE 0 END) AS sxx0,
        |         sum(CASE WHEN g = 0 THEN y::HUGEINT * y ELSE 0 END) AS syy0,
        |         sum(CASE WHEN g = 0 THEN x::HUGEINT * y ELSE 0 END) AS sxy0,
        |         sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
        |         sum(CASE WHEN g = 1 THEN x ELSE 0 END)::BIGINT AS sx1,
        |         sum(CASE WHEN g = 1 THEN y ELSE 0 END)::BIGINT AS sy1,
        |         sum(CASE WHEN g = 1 THEN x::HUGEINT * x ELSE 0 END) AS sxx1,
        |         sum(CASE WHEN g = 1 THEN y::HUGEINT * y ELSE 0 END) AS syy1,
        |         sum(CASE WHEN g = 1 THEN x::HUGEINT * y ELSE 0 END) AS sxy1
        |  FROM per),
        |calc AS (
        |  SELECT n0, n1,
        |         sx0::DOUBLE / sy0 AS r0,
        |         ((n0::DOUBLE * sxx0 - sx0::DOUBLE * sx0) / (n0::DOUBLE * (n0 - 1)) - 2::DOUBLE * (sx0::DOUBLE / sy0) * ((n0::DOUBLE * sxy0 - sx0::DOUBLE * sy0) / (n0::DOUBLE * (n0 - 1))) + (sx0::DOUBLE / sy0) * (sx0::DOUBLE / sy0) * ((n0::DOUBLE * syy0 - sy0::DOUBLE * sy0) / (n0::DOUBLE * (n0 - 1)))) / (n0::DOUBLE * (sy0::DOUBLE / n0) * (sy0::DOUBLE / n0)) AS v0,
        |         sx1::DOUBLE / sy1 AS r1,
        |         ((n1::DOUBLE * sxx1 - sx1::DOUBLE * sx1) / (n1::DOUBLE * (n1 - 1)) - 2::DOUBLE * (sx1::DOUBLE / sy1) * ((n1::DOUBLE * sxy1 - sx1::DOUBLE * sy1) / (n1::DOUBLE * (n1 - 1))) + (sx1::DOUBLE / sy1) * (sx1::DOUBLE / sy1) * ((n1::DOUBLE * syy1 - sy1::DOUBLE * sy1) / (n1::DOUBLE * (n1 - 1)))) / (n1::DOUBLE * (sy1::DOUBLE / n1) * (sy1::DOUBLE / n1)) AS v1
        |  FROM mom)
        |SELECT n0 AS n_a, n1 AS n_b,
        |       round(r0, 6) + 0.0 AS r_a, round(r1, 6) + 0.0 AS r_b,
        |       round((r1 - r0) / sqrt(v0 + v1), 6) + 0.0 AS z,
        |       (CASE WHEN floor(abs((r1 - r0) / sqrt(v0 + v1)) * 1.0e6 + 0.5)::BIGINT >= 1959964 THEN 1 ELSE 0 END)::BIGINT AS significant
        |FROM calc""".stripMargin,
    // same literal z constants, same mirrored chain, exact ceiling
    "q455_power_design" ->
      """WITH base AS (
        |  SELECT count(*)::BIGINT AS n_sessions, sum(c)::BIGINT AS n_conv
        |  FROM (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
        |        FROM events GROUP BY 1, 2)),
        |calc AS (
        |  SELECT n_sessions, n_conv,
        |         n_conv::DOUBLE / n_sessions AS p1,
        |         n_conv::DOUBLE / n_sessions + CAST('0.02' AS DOUBLE) AS p2
        |  FROM base),
        |c2 AS (
        |  SELECT n_sessions, n_conv, p1, p2, (p1 + p2) / 2::DOUBLE AS pbar FROM calc),
        |c3 AS (
        |  SELECT n_sessions, n_conv, p1, p2,
        |         CAST('1.959963984540054' AS DOUBLE) * sqrt(2::DOUBLE * pbar * (1::DOUBLE - pbar)) + CAST('0.8416212335729143' AS DOUBLE) * sqrt(p1 * (1::DOUBLE - p1) + p2 * (1::DOUBLE - p2)) AS num
        |  FROM c2)
        |SELECT n_sessions, n_conv, round(p1, 6) + 0.0 AS p1, round(p2, 6) + 0.0 AS p2,
        |       ceiling(num * num / (CAST('0.02' AS DOUBLE) * CAST('0.02' AS DOUBLE)))::BIGINT AS n_per_arm
        |FROM c3""".stripMargin,
    // same Wilson chain on exact counts, same snapped outside-flag
    "q456_wilson_intervals" ->
      """WITH buyers AS (SELECT DISTINCT o_custkey FROM orders),
        |cust AS (
        |  SELECT c.c_custkey, n.n_name AS nation
        |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
        |grp AS (
        |  SELECT nation, count(*)::BIGINT AS n_cust,
        |         sum(CASE WHEN b.o_custkey IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_buyers
        |  FROM cust LEFT JOIN buyers b ON cust.c_custkey = b.o_custkey
        |  GROUP BY 1),
        |tot AS (SELECT sum(n_cust)::BIGINT AS nn, sum(n_buyers)::BIGINT AS kk FROM grp),
        |calc AS (
        |  SELECT g.nation, g.n_cust, g.n_buyers,
        |         CAST('1.959963984540054' AS DOUBLE) AS z,
        |         g.n_buyers::DOUBLE / g.n_cust AS p,
        |         t.kk::DOUBLE / t.nn AS gl
        |  FROM grp g, tot t),
        |c2 AS (
        |  SELECT nation, n_cust, n_buyers, z, p, gl,
        |         1::DOUBLE + z * z / n_cust AS denom
        |  FROM calc),
        |c3 AS (
        |  SELECT nation, n_cust, n_buyers, p, gl,
        |         (p + z * z / (2::DOUBLE * n_cust)) / denom AS center,
        |         z * sqrt(p * (1::DOUBLE - p) / n_cust + z * z / (4::DOUBLE * n_cust * n_cust)) / denom AS half
        |  FROM c2)
        |SELECT nation, n_cust, n_buyers,
        |       round(p, 6) + 0.0 AS p_hat,
        |       round(center - half, 6) + 0.0 AS wilson_lo,
        |       round(center + half, 6) + 0.0 AS wilson_hi,
        |       (CASE WHEN floor(gl * 1.0e6 + 0.5)::BIGINT < floor((center - half) * 1.0e6 + 0.5)::BIGINT
        |             OR floor(gl * 1.0e6 + 0.5)::BIGINT > floor((center + half) * 1.0e6 + 0.5)::BIGINT THEN 1 ELSE 0 END)::BIGINT AS global_outside
        |FROM c3 ORDER BY nation""".stripMargin,
    // same cents-lattice means, same exact k·SS BIGINT, same snapped
    // variance-of-mean terms, same positive-part shrinkage chain
    "q457_james_stein" ->
      """WITH grp AS (
        |  SELECT n.n_name AS nation, count(*)::BIGINT AS n,
        |         sum(floor(o.o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS s,
        |         sum(floor(o.o_totalprice * 100 + 0.5)::BIGINT * floor(o.o_totalprice * 100 + 0.5)::BIGINT) AS sqq
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |       JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY 1),
        |g2 AS (
        |  SELECT nation, n, s, s // n AS m,
        |         sum((n::DOUBLE * sqq::DOUBLE - s::DOUBLE * s) / (n::DOUBLE * (n - 1)) / n)
        |           OVER (ORDER BY nation ROWS UNBOUNDED PRECEDING) AS vm_cum
        |  FROM grp),
        |tot AS (
        |  SELECT count(*)::BIGINT AS k, sum(m)::BIGINT AS sm,
        |         sum(m * m)::BIGINT AS sm2, max(vm_cum) AS vm_sum
        |  FROM g2),
        |t2 AS (
        |  SELECT k, sm, (k * sm2 - sm * sm)::BIGINT AS ssk, vm_sum FROM tot),
        |t3 AS (
        |  SELECT k, sm, ssk,
        |         greatest(CAST(0 AS DOUBLE), CAST(1 AS DOUBLE) - (k - 3) * vm_sum / ssk) AS c
        |  FROM t2)
        |SELECT g.nation, g.n AS n_orders, g.m AS raw_mean_cents,
        |       round(t.sm::DOUBLE / t.k + t.c * (g.m - t.sm::DOUBLE / t.k), 6) + 0.0 AS js_mean_cents,
        |       round(t.c, 6) + 0.0 AS shrink_c
        |FROM g2 g, t3 t ORDER BY g.nation""".stripMargin,
    // same integer error lattices (×22 for drift), same 1e-9 MAPE/sMAPE
    // term snaps, same MASE divide
    "q458_forecast_scorecard" ->
      """WITH ev AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day FROM events
        |  WHERE event_type = 'purchase'),
        |d0 AS (SELECT min(day) AS day0 FROM ev),
        |daily AS (
        |  SELECT ev.day - d0.day0 AS d, count(*)::BIGINT AS y
        |  FROM ev, d0 GROUP BY 1),
        |refs AS (
        |  SELECT max(CASE WHEN d = 0 THEN y END)::BIGINT AS y0,
        |         max(CASE WHEN d = 22 THEN y END)::BIGINT AS y22
        |  FROM daily),
        |maein AS (
        |  SELECT sum(abs(y - prev))::BIGINT AS dsum, count(*)::BIGINT AS dn
        |  FROM (SELECT d, y, lag(y, 1) OVER (ORDER BY d) AS prev FROM daily)
        |  WHERE d >= 1 AND d <= 22),
        |test AS (
        |  SELECT t.d, t.y, t.ylag7, r.y0, r.y22, m.dsum, m.dn,
        |         abs(t.y - r.y22)::BIGINT AS e_naive,
        |         abs(t.y - t.ylag7)::BIGINT AS e_snaive,
        |         abs(22 * t.y - 22 * r.y22 - (t.d - 22) * (r.y22 - r.y0))::BIGINT AS e22_drift
        |  FROM (SELECT d, y, lag(y, 7) OVER (ORDER BY d) AS ylag7 FROM daily) t,
        |       refs r, maein m
        |  WHERE t.d >= 23),
        |naive AS (
        |  SELECT 'naive' AS method,
        |         round(sum(e_naive)::DOUBLE / count(*), 6) + 0.0 AS mae,
        |         round(sum(floor(e_naive::DOUBLE / y * 1.0e9 + 0.5)::BIGINT)::DOUBLE / count(*) / 1.0e9, 6) + 0.0 AS mape,
        |         round(sum(floor((2 * e_naive)::DOUBLE / (y + y22) * 1.0e9 + 0.5)::BIGINT)::DOUBLE / count(*) / 1.0e9, 6) + 0.0 AS smape,
        |         round((sum(e_naive)::DOUBLE / count(*)) / (max(dsum)::DOUBLE / max(dn)), 6) + 0.0 AS mase
        |  FROM test),
        |snaive AS (
        |  SELECT 'seasonal_naive' AS method,
        |         round(sum(e_snaive)::DOUBLE / count(*), 6) + 0.0 AS mae,
        |         round(sum(floor(e_snaive::DOUBLE / y * 1.0e9 + 0.5)::BIGINT)::DOUBLE / count(*) / 1.0e9, 6) + 0.0 AS mape,
        |         round(sum(floor((2 * e_snaive)::DOUBLE / (y + ylag7) * 1.0e9 + 0.5)::BIGINT)::DOUBLE / count(*) / 1.0e9, 6) + 0.0 AS smape,
        |         round((sum(e_snaive)::DOUBLE / count(*)) / (max(dsum)::DOUBLE / max(dn)), 6) + 0.0 AS mase
        |  FROM test),
        |drift AS (
        |  SELECT 'drift' AS method,
        |         round(sum(e22_drift)::DOUBLE / 22 / count(*), 6) + 0.0 AS mae,
        |         round(sum(floor(e22_drift::DOUBLE / (22 * y) * 1.0e9 + 0.5)::BIGINT)::DOUBLE / count(*) / 1.0e9, 6) + 0.0 AS mape,
        |         round(sum(floor((2 * e22_drift)::DOUBLE / (22 * y + 22 * y22 + (d - 22) * (y22 - y0)) * 1.0e9 + 0.5)::BIGINT)::DOUBLE / count(*) / 1.0e9, 6) + 0.0 AS smape,
        |         round((sum(e22_drift)::DOUBLE / 22 / count(*)) / (max(dsum)::DOUBLE / max(dn)), 6) + 0.0 AS mase
        |  FROM test)
        |SELECT * FROM naive UNION ALL SELECT * FROM snaive UNION ALL SELECT * FROM drift
        |ORDER BY method""".stripMargin,
    // same q439 demand census, same exact moments + literal z chain
    "q459_safety_stock" ->
      """WITH demand AS (
        |  SELECT string_split(p.p_type, ' ')[1] AS cls,
        |         epoch_us(l.l_shipdate) // 86400000000 AS day,
        |         sum(floor(l.l_quantity + 0.5)::BIGINT)::BIGINT AS dq
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |mom AS (
        |  SELECT cls, count(*)::BIGINT AS n_days, sum(dq)::BIGINT AS s,
        |         sum(dq * dq)::BIGINT AS s2
        |  FROM demand GROUP BY 1),
        |calc AS (
        |  SELECT cls, n_days,
        |         s::DOUBLE / n_days AS mu,
        |         sqrt((n_days::DOUBLE * s2 - s::DOUBLE * s) / (n_days::DOUBLE * (n_days - 1))) AS sigma
        |  FROM mom),
        |c2 AS (
        |  SELECT cls, n_days, mu, sigma,
        |         CAST('1.6448536269514722' AS DOUBLE) * sigma * sqrt(7::DOUBLE) AS ss
        |  FROM calc)
        |SELECT cls, n_days, round(mu, 6) + 0.0 AS mu_daily,
        |       round(sigma, 6) + 0.0 AS sigma_daily,
        |       round(ss, 6) + 0.0 AS safety_stock,
        |       round(mu * 7::DOUBLE + ss, 6) + 0.0 AS reorder_point
        |FROM c2 ORDER BY cls""".stripMargin,
    // same stopword split, same deg·1e9 div freq word lattice, same
    // ordered phrase reconstruction and total top-10 tie-break
    "q460_rake_keyphrases" ->
      """WITH toks0 AS (
        |  SELECT doc_id,
        |         unnest([{'pos': i, 'w': ws[i]} FOR i IN range(1, len(ws) + 1)]) AS t
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
        |toks1 AS (
        |  SELECT doc_id, t.pos AS pos, t.w AS w,
        |         CASE WHEN t.w IN ('the', 'a') THEN 1 ELSE 0 END AS is_stop
        |  FROM toks0),
        |toks AS (
        |  SELECT doc_id, pos, w,
        |         sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS pid
        |  FROM toks1 QUALIFY is_stop = 0),
        |plen AS (
        |  SELECT doc_id, pid, count(*)::BIGINT AS len FROM toks GROUP BY 1, 2),
        |wstat AS (
        |  SELECT w, (sum(len) * 1000000000 // count(*))::BIGINT AS wscore_e9
        |  FROM toks t JOIN plen p USING (doc_id, pid)
        |  GROUP BY w),
        |phrases AS (
        |  SELECT t.doc_id, t.pid,
        |         string_agg(t.w, ' ' ORDER BY t.pos) AS phrase,
        |         sum(s.wscore_e9)::BIGINT AS score_e9,
        |         count(*)::BIGINT AS n_words
        |  FROM toks t JOIN wstat s USING (w)
        |  GROUP BY 1, 2)
        |SELECT phrase, max(n_words)::BIGINT AS n_words,
        |       count(*)::BIGINT AS n_occurrences,
        |       max(score_e9)::BIGINT AS score_e9
        |FROM phrases GROUP BY phrase
        |QUALIFY row_number() OVER (ORDER BY max(score_e9) DESC, phrase ASC) <= 10""".stripMargin,
    // same DECIMAL-wide Σv², same snapped within-SS terms, same literal
    // studentized-range critical value
    "q461_tukey_hsd" ->
      """WITH grp AS (
        |  SELECT o_orderpriority AS g, count(*)::BIGINT AS n,
        |         sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS s,
        |         sum(floor(o_totalprice * 100 + 0.5)::BIGINT * floor(o_totalprice * 100 + 0.5)::BIGINT) AS sqq
        |  FROM orders GROUP BY 1),
        |g2 AS (
        |  SELECT g, n, s, sqq,
        |         sum(s::DOUBLE * s / n) OVER (ORDER BY g ROWS UNBOUNDED PRECEDING) AS cm_cum
        |  FROM grp),
        |tot AS (
        |  SELECT sum(n)::BIGINT AS nn, count(*)::BIGINT AS k,
        |         sum(sqq) AS sqq_all, max(cm_cum) AS cm_sum
        |  FROM g2),
        |t2 AS (
        |  SELECT (sqq_all::DOUBLE - cm_sum) / (nn - k) AS msw FROM tot),
        |pairs AS (
        |  SELECT a.g AS g1, b.g AS g2,
        |         a.s::DOUBLE / a.n - b.s::DOUBLE / b.n AS diff,
        |         CAST('3.858' AS DOUBLE) * sqrt(t.msw / 2::DOUBLE * (1::DOUBLE / a.n + 1::DOUBLE / b.n)) AS hsd
        |  FROM g2 a JOIN g2 b ON a.g < b.g, t2 t)
        |SELECT g1, g2, round(diff, 6) + 0.0 AS mean_diff_cents,
        |       round(hsd, 6) + 0.0 AS hsd_cents,
        |       (CASE WHEN floor(abs(diff) * 1.0e6 + 0.5)::BIGINT > floor(hsd * 1.0e6 + 0.5)::BIGINT THEN 1 ELSE 0 END)::BIGINT AS significant
        |FROM pairs ORDER BY g1, g2""".stripMargin,
    // same floor-cents revenue lattice, same (rev, suppkey) rank
    // tie-break, same ppm divisions
    "q462_concentration_ratios" ->
      """WITH sup AS (
        |  SELECT l_suppkey,
        |         sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)::BIGINT)::BIGINT AS rev
        |  FROM lineitem GROUP BY 1),
        |ranked AS (
        |  SELECT rev, row_number() OVER (ORDER BY rev DESC, l_suppkey ASC) AS rn
        |  FROM sup)
        |SELECT count(*)::BIGINT AS n_suppliers, sum(rev)::BIGINT AS total_cents,
        |       (sum(CASE WHEN rn = 1 THEN rev ELSE 0 END) * 1000000 // sum(rev))::BIGINT AS cr1_ppm,
        |       (sum(CASE WHEN rn <= 4 THEN rev ELSE 0 END) * 1000000 // sum(rev))::BIGINT AS cr4_ppm,
        |       (sum(CASE WHEN rn <= 8 THEN rev ELSE 0 END) * 1000000 // sum(rev))::BIGINT AS cr8_ppm
        |FROM ranked""".stripMargin
  )
}
