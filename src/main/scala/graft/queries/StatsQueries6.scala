package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 widening, sixth batch: cross-price elasticity (the
  * substitutes/complements matrix q415's own-price row cannot see),
  * market beta of class revenue (the portfolio readout of demand
  * co-movement), and Lin's concordance correlation (AGREEMENT between
  * two series, which Pearson alone overstates).
  */
object StatsQueries6 extends QueryModule {

  /** q479: CROSS-PRICE ELASTICITY MATRIX — does class B's price move
    * class A's quantity (substitutes: positive; complements: negative)?
    * q415 regresses a class's own ln-quantity on its own ln-price; the
    * OFF-diagonal is where assortment and pricing decisions live. Daily
    * (class, day) censuses, ln(avg unit price) and ln(total qty) per
    * cell, OLS per ordered class pair over the shared days.
    *
    * Determinism: both regressors are snapped to the 1e-6 lattice per
    * census cell (the q415 device); all pair moments are exact BIGINTs;
    * the elasticity chain is mirrored. Scale: one fact aggregate to a
    * (class, day) census; the pair join runs census×census on day —
    * domain-bounded.
    */
  def q479CrossPriceElasticity(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
        .select(col("p_partkey"),
          expr("element_at(split(p_type, ' '), 1)").as("cls"))),
        col("l_partkey") === col("p_partkey"))
      .filter(col("l_quantity") >= 1.0)
      .groupBy(col("cls"),
        expr("unix_micros(l_shipdate) div 86400000000").as("day"))
      .agg(sum(floor(col("l_quantity") + 0.5).cast("long")).as("qty"),
        sum(floor(col("l_extendedprice") * 100.0 + 0.5).cast("long")).as("ext"))
      .select(col("cls"), col("day"),
        expr("CAST(floor(ln(CAST(qty AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)").as("lq"),
        expr("CAST(floor(ln(CAST(ext AS DOUBLE) / qty) * 1000000.0 + 0.5) AS BIGINT)").as("lp"))
      .localCheckpoint()
    val a = daily.select(col("cls").as("cls_q"), col("day"), col("lq").as("y"))
    val b = daily.select(col("cls").as("cls_p"), col("day").as("day2"),
      col("lp").as("x"))
    a.join(b, col("day") === col("day2") && col("cls_q") =!= col("cls_p"))
      .groupBy("cls_q", "cls_p")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"),
        sum(expr("y * y")).as("syy"))
      .selectExpr("cls_q", "cls_p", "n",
        "CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov_n",
        "CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS var_x",
        "CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS var_y")
      .selectExpr("cls_q", "cls_p", "n AS n_days",
        "round(cov_n / var_x, 6) AS cross_elasticity",
        "round(cov_n * cov_n / (var_x * var_y), 6) AS r2")
      .orderBy("cls_q", "cls_p")
  }

  /** q480: REVENUE MARKET BETA — each part class's daily revenue
    * regressed on the whole market's (the CAPM reading of demand
    * co-movement: β > 1 amplifies market swings — the class to hedge;
    * β ≈ 0 diversifies). α is the class's market-independent daily
    * drift.
    *
    * Determinism: daily dollars are exact integers; the x², x·y moments
    * ride DECIMAL(38,0) sums (market-dollar squares overflow BIGINT at
    * sf1); β/α/R² are mirrored chains on single exact→double
    * conversions. Scale: one (class, day) census; the market series is
    * its per-day rollup joined back — census-local.
    */
  def q480RevenueBeta(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
        .select(col("p_partkey"),
          expr("element_at(split(p_type, ' '), 1)").as("cls"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("cls"),
        expr("unix_micros(l_shipdate) div 86400000000").as("day"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0 + 0.5)
        .cast("long")).as("cents"))
      .select(col("cls"), col("day"), expr("cents div 100L").as("y"))
      .localCheckpoint()
    val market = daily.groupBy("day").agg(sum("y").as("m"))
    daily.join(market, "day")
      .groupBy("cls")
      .agg(count(lit(1)).as("n"), sum("m").as("sm"), sum("y").as("sy"),
        sum(expr("CAST(m AS DECIMAL(38,0)) * y")).as("smy"),
        sum(expr("CAST(m AS DECIMAL(38,0)) * m")).as("smm"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
      .selectExpr("cls", "n",
        "CAST(n AS DOUBLE) * CAST(smy AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sy AS DOUBLE) AS cov_n",
        "CAST(n AS DOUBLE) * CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) AS var_m",
        "CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS var_y",
        "CAST(sm AS DOUBLE) / n AS mbar", "CAST(sy AS DOUBLE) / n AS ybar")
      .selectExpr("cls", "n AS n_days",
        "round(cov_n / var_m, 6) AS beta",
        "round(ybar - cov_n / var_m * mbar, 6) AS alpha_dollars",
        "round(cov_n * cov_n / (var_m * var_y), 6) AS r2")
      .orderBy("cls")
  }

  /** q481: LIN'S CONCORDANCE CORRELATION — AGREEMENT between the daily
    * view and click series (Pearson rewards any linear relation; CCC
    * additionally punishes scale and location bias — the method-
    * agreement coefficient): CCC = 2s_xy / (s_x² + s_y² + (x̄−ȳ)²).
    *
    * Determinism: multiplying through by n² makes BOTH the numerator
    * 2(nΣxy−ΣxΣy) and the denominator (nΣxx−(Σx)²)+(nΣyy−(Σy)²)+(Σx−Σy)²
    * exact BIGINTs — CCC is ONE divide; Pearson r is the mirrored sqrt
    * chain beside it. Scale: one day census.
    */
  def q481LinsCcc(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("y"))
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"),
        sum(expr("y * y")).as("syy"))
      .withColumn("ccc_num", expr("2L * (n * sxy - sx * sy)"))
      .withColumn("ccc_den", expr(
        "(n * sxx - sx * sx) + (n * syy - sy * sy) + (sx - sy) * (sx - sy)"))
      .select(col("n").as("n_days"), col("ccc_num"), col("ccc_den"),
        expr("round(CAST(ccc_num AS DOUBLE) / ccc_den, 6)").as("ccc"),
        expr("round((n * sxy - sx * sy) / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * (n * syy - sy * sy)), 6)")
          .as("pearson_r"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q479_cross_price_elasticity" -> (q479CrossPriceElasticity _),
    "q480_revenue_beta" -> (q480RevenueBeta _),
    "q481_lins_ccc" -> (q481LinsCcc _)
  )

  override val oracles: Map[String, String] = Map(
    // same 1e-6 ln snaps per census cell, same exact pair moments
    "q479_cross_price_elasticity" ->
      """WITH daily AS (
        |  SELECT string_split(p.p_type, ' ')[1] AS cls,
        |         epoch_us(l.l_shipdate) // 86400000000 AS day,
        |         sum(floor(l.l_quantity + 0.5)::BIGINT)::BIGINT AS qty,
        |         sum(floor(l.l_extendedprice * 100 + 0.5)::BIGINT)::BIGINT AS ext
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l.l_quantity >= 1.0
        |  GROUP BY 1, 2),
        |snapped AS (
        |  SELECT cls, day,
        |         floor(ln(qty::DOUBLE) * 1000000.0 + 0.5)::BIGINT AS lq,
        |         floor(ln(ext::DOUBLE / qty) * 1000000.0 + 0.5)::BIGINT AS lp
        |  FROM daily),
        |mom AS (
        |  SELECT a.cls AS cls_q, b.cls AS cls_p, count(*)::BIGINT AS n,
        |         sum(b.lp)::BIGINT AS sx, sum(a.lq)::BIGINT AS sy,
        |         sum(b.lp * a.lq)::BIGINT AS sxy,
        |         sum(b.lp * b.lp)::BIGINT AS sxx,
        |         sum(a.lq * a.lq)::BIGINT AS syy
        |  FROM snapped a JOIN snapped b
        |       ON a.day = b.day AND a.cls <> b.cls
        |  GROUP BY 1, 2),
        |calc AS (
        |  SELECT cls_q, cls_p, n,
        |         CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov_n,
        |         CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS var_x,
        |         CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS var_y
        |  FROM mom)
        |SELECT cls_q, cls_p, n AS n_days,
        |       round(cov_n / var_x, 6) + 0.0 AS cross_elasticity,
        |       round(cov_n * cov_n / (var_x * var_y), 6) + 0.0 AS r2
        |FROM calc ORDER BY cls_q, cls_p""".stripMargin,
    // same integer daily dollars, same DECIMAL/HUGEINT wide moments
    "q480_revenue_beta" ->
      """WITH daily AS (
        |  SELECT string_split(p.p_type, ' ')[1] AS cls,
        |         epoch_us(l.l_shipdate) // 86400000000 AS day,
        |         (sum(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)::BIGINT) // 100)::BIGINT AS y
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |market AS (SELECT day, sum(y)::BIGINT AS m FROM daily GROUP BY 1),
        |mom AS (
        |  SELECT d.cls, count(*)::BIGINT AS n, sum(mk.m)::BIGINT AS sm,
        |         sum(d.y)::BIGINT AS sy,
        |         sum(mk.m::HUGEINT * d.y) AS smy,
        |         sum(mk.m::HUGEINT * mk.m) AS smm,
        |         sum(d.y::HUGEINT * d.y) AS syy
        |  FROM daily d JOIN market mk USING (day)
        |  GROUP BY 1),
        |calc AS (
        |  SELECT cls, n,
        |         CAST(n AS DOUBLE) * CAST(smy AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sy AS DOUBLE) AS cov_n,
        |         CAST(n AS DOUBLE) * CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) AS var_m,
        |         CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS var_y,
        |         CAST(sm AS DOUBLE) / n AS mbar, CAST(sy AS DOUBLE) / n AS ybar
        |  FROM mom)
        |SELECT cls, n AS n_days,
        |       round(cov_n / var_m, 6) + 0.0 AS beta,
        |       round(ybar - cov_n / var_m * mbar, 6) + 0.0 AS alpha_dollars,
        |       round(cov_n * cov_n / (var_m * var_y), 6) + 0.0 AS r2
        |FROM calc ORDER BY cls""".stripMargin,
    // same all-integer n²-scaled CCC, same Pearson sqrt chain
    "q481_lins_ccc" ->
      """WITH census AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS x,
        |         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS y
        |  FROM events GROUP BY 1),
        |mom AS (
        |  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
        |         sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx,
        |         sum(y * y)::BIGINT AS syy
        |  FROM census),
        |c AS (
        |  SELECT n, sx, sy, sxy, sxx, syy,
        |         (2 * (n * sxy - sx * sy))::BIGINT AS ccc_num,
        |         ((n * sxx - sx * sx) + (n * syy - sy * sy) + (sx - sy) * (sx - sy))::BIGINT AS ccc_den
        |  FROM mom)
        |SELECT n AS n_days, ccc_num, ccc_den,
        |       round(ccc_num::DOUBLE / ccc_den, 6) + 0.0 AS ccc,
        |       round((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx)::DOUBLE * (n * syy - sy * sy)), 6) + 0.0 AS pearson_r
        |FROM c""".stripMargin
  )
}
