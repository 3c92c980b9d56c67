package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-16 widening, third batch: product diffusion (Bass model fit),
  * rank association between two series (Kendall τ-b), index-number
  * theory (Laspeyres/Paasche/Fisher), categorical effect size
  * (Cramér's V), customer-base dynamics (RFM segment migration),
  * queueing (Erlang-B/C staffing curve), stylometry (Burrows' delta),
  * and time-series decomposition diagnostics (seasonal/trend strength).
  *
  * Exactness devices, beyond [[StatsQueries]]/[[StatsQueries2]]: wide
  * integer moments ride DECIMAL(38,0) (Spark) ↔ HUGEINT (DuckDB) sums —
  * both convert exact values to double with the same correctly-rounded
  * result; folds (Erlang's B recursion) run as Spark `aggregate` vs
  * DuckDB `list_reduce` with the init PREPENDED to the DuckDB list, so
  * both engines execute the identical operation sequence; the STL-lite
  * components live on a ×140 integer lattice (7-day MA × the 4/5-week
  * day-of-week counts), so every variance is an exact moment.
  */
object StatsQueries3 extends QueryModule {

  /** q463: BASS DIFFUSION FIT — the innovation/imitation adoption model
    * (Bass '69) on customer first-order months: n_t = a + b·N + c·N²
    * by exact-moment OLS (Cramer's rule), then (p, q, m) from the
    * discrete-Bass identities a = p·m, b = q − p, c = −q/m.
    *
    * Determinism: the month grid is dense (zero-adopter months
    * included); all eight regression moments are exact — N³/N⁴ ride
    * DECIMAL/HUGEINT sums; every determinant is the identical
    * left-associated double chain on them; the discriminant is floored
    * at 0 so no NaN can reach the output. Scale: one per-customer
    * aggregate, then an ~80-row month census; windows run over it.
    */
  def q463BassDiffusion(spark: SparkSession, dir: String): DataFrame = {
    val idx = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        expr("(year(o_orderdate) - 1970) * 12 + month(o_orderdate) - 1").as("mi"))
    val first = idx.groupBy("o_custkey").agg(min("mi").as("fm"))
    val refs = first.agg(min("fm").as("m0"), max("fm").as("m1"))
    val census = first.crossJoin(broadcast(refs))
      .groupBy((col("fm") - col("m0")).as("t"))
      .agg(count(lit(1)).as("n"))
    val grid = refs.select(explode(expr("sequence(0, m1 - m0)")).as("t"))
      .join(census, Seq("t"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("cum", sum("n").over(Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("np", col("cum") - col("n"))
    val mom = grid.agg(
      count(lit(1)).as("s0"), sum("np").as("s1"),
      sum(expr("np * np")).as("s2"),
      sum(expr("CAST(np AS DECIMAL(38,0)) * np * np")).as("s3"),
      sum(expr("CAST(np AS DECIMAL(38,0)) * np * np * np")).as("s4"),
      sum("n").as("t0"), sum(expr("n * np")).as("t1"),
      sum(expr("CAST(n AS DECIMAL(38,0)) * np * np")).as("t2"))
    mom.selectExpr(
        "s0", "CAST(s0 AS DOUBLE) AS ds0", "CAST(s1 AS DOUBLE) AS ds1",
        "CAST(s2 AS DOUBLE) AS ds2", "CAST(s3 AS DOUBLE) AS ds3",
        "CAST(s4 AS DOUBLE) AS ds4", "CAST(t0 AS DOUBLE) AS dt0",
        "CAST(t1 AS DOUBLE) AS dt1", "CAST(t2 AS DOUBLE) AS dt2")
      .withColumn("det", expr(
        "ds0 * (ds2 * ds4 - ds3 * ds3) - ds1 * (ds1 * ds4 - ds3 * ds2) + ds2 * (ds1 * ds3 - ds2 * ds2)"))
      .withColumn("ca", expr(
        "(dt0 * (ds2 * ds4 - ds3 * ds3) - ds1 * (dt1 * ds4 - ds3 * dt2) + ds2 * (dt1 * ds3 - ds2 * dt2)) / det"))
      .withColumn("cb", expr(
        "(ds0 * (dt1 * ds4 - ds3 * dt2) - dt0 * (ds1 * ds4 - ds3 * ds2) + ds2 * (ds1 * dt2 - dt1 * ds2)) / det"))
      .withColumn("cc", expr(
        "(ds0 * (ds2 * dt2 - dt1 * ds3) - ds1 * (ds1 * dt2 - dt1 * ds2) + dt0 * (ds1 * ds3 - ds2 * ds2)) / det"))
      .withColumn("m_hat", expr(
        "(CAST(0 AS DOUBLE) - cb - sqrt(greatest(cb * cb - CAST(4 AS DOUBLE) * ca * cc, CAST(0 AS DOUBLE)))) / (CAST(2 AS DOUBLE) * cc)"))
      .withColumn("p_hat", expr("ca / m_hat"))
      .select(col("s0").as("n_months"),
        expr("round(ca, 6)").as("a"), expr("round(cb, 6)").as("b"),
        expr("round(cc, 6)").as("c"),
        expr("round(m_hat, 6)").as("m_hat"),
        expr("round(p_hat, 6)").as("p_hat"),
        expr("round(cb + p_hat, 6)").as("q_hat"))
  }

  /** q464: KENDALL τ-b — rank association between the daily VIEW and
    * PURCHASE series (q283's Spearman ranks one variable against
    * another per-row; τ-b counts concordant day pairs and corrects for
    * ties, the estimator behind every "do these two series co-move"
    * readout): does engagement move with conversion day over day?
    *
    * Determinism: concordant/discordant/tie counts are exact BIGINTs
    * off the day-census pair join; τ-b is one mirrored IEEE chain.
    * Scale: calendar-domain-bounded census self-join.
    */
  def q464KendallTau(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(expr("unix_micros(ts) div 86400000000").as("day"),
        col("event_type"))
    val d0 = ev.agg(min("day").as("day0"))
    val census = ev.crossJoin(broadcast(d0))
      .groupBy((col("day") - col("day0")).as("d"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      .localCheckpoint()
    val a = census.toDF("di", "xi", "yi")
    val b = census.toDF("dj", "xj", "yj")
    a.join(b, col("di") < col("dj"))
      .agg(count(lit(1)).as("n0"),
        sum(expr("CASE WHEN (xj - xi) * (yj - yi) > 0 THEN 1L ELSE 0L END")).as("conc"),
        sum(expr("CASE WHEN (xj - xi) * (yj - yi) < 0 THEN 1L ELSE 0L END")).as("disc"),
        sum(expr("CASE WHEN xj = xi THEN 1L ELSE 0L END")).as("tx"),
        sum(expr("CASE WHEN yj = yi THEN 1L ELSE 0L END")).as("ty"))
      .crossJoin(broadcast(census.agg(count(lit(1)).as("n_days"))))
      .select(col("n_days"), col("conc").as("concordant"),
        col("disc").as("discordant"), col("tx").as("ties_x"),
        col("ty").as("ties_y"),
        expr("round((conc - disc) / sqrt(CAST(n0 - tx AS DOUBLE) * (n0 - ty)), 6)")
          .as("tau_b"))
  }

  /** q465: LASPEYRES / PAASCHE / FISHER price indices — index-number
    * theory's canonical trio on 1995→1996 part prices (base-weighted,
    * current-weighted, and their geometric mean — the "ideal" index):
    * the inflation readout behind every deflated-revenue series.
    *
    * Determinism: per-(part, year) quantity and extended-price sums are
    * exact; the cross-weighted terms ext₁·q₀/qty₁ are snapped to whole
    * cents BEFORE the part-census sums (their own-weighted partners
    * Σp₀q₀ = Σext₀ and Σp₁q₁ = Σext₁ are exact outright); Fisher is one
    * correctly-rounded sqrt. Scale: one fact aggregate per (part, year),
    * one co-partitioned self-join on part.
    */
  def q465PriceIndices(spark: SparkSession, dir: String): DataFrame = {
    val py = Tables.lineitem(spark, dir)
      .withColumn("yr", expr("year(l_shipdate)"))
      .filter(col("yr").isin(1995, 1996))
      .groupBy("l_partkey", "yr")
      .agg(sum(floor(col("l_quantity") + 0.5).cast("long")).as("qty"),
        sum(floor(col("l_extendedprice") * 100.0 + 0.5).cast("long")).as("ext"))
    val p0 = py.filter(col("yr") === 1995)
      .select(col("l_partkey"), col("qty").as("q0"), col("ext").as("e0"))
    val p1 = py.filter(col("yr") === 1996)
      .select(col("l_partkey"), col("qty").as("q1"), col("ext").as("e1"))
      .toDF("pk1", "q1", "e1") // fresh attributes: p0/p1 share py's lineage
    p0.join(p1, col("l_partkey") === col("pk1"))
      .agg(count(lit(1)).as("n_common_parts"),
        sum("e0").as("sum_p0q0"), sum("e1").as("sum_p1q1"),
        sum(expr("CAST(floor(CAST(e1 AS DOUBLE) * q0 / q1 + 0.5) AS BIGINT)")).as("sum_p1q0"),
        sum(expr("CAST(floor(CAST(e0 AS DOUBLE) * q1 / q0 + 0.5) AS BIGINT)")).as("sum_p0q1"))
      .withColumn("laspeyres", expr("CAST(sum_p1q0 AS DOUBLE) / sum_p0q0"))
      .withColumn("paasche", expr("CAST(sum_p1q1 AS DOUBLE) / sum_p0q1"))
      .select(col("n_common_parts"), col("sum_p0q0"), col("sum_p1q1"),
        col("sum_p1q0"), col("sum_p0q1"),
        expr("round(laspeyres, 6)").as("laspeyres"),
        expr("round(paasche, 6)").as("paasche"),
        expr("round(sqrt(laspeyres * paasche), 6)").as("fisher"))
  }

  /** q466: CRAMÉR'S V — the [0,1] effect size the raw χ² cannot give
    * (χ² grows with n; V answers "how STRONG is the association" —
    * the number to report next to any q440/q443-style significance):
    * return-flag × line-status contingency over lineitem.
    *
    * Determinism: observed cells and margins are exact BIGINTs; the
    * cell grid is the full r×c cross of the margins (so a
    * structurally-empty cell still contributes its e term); each
    * (o−e)²/e term is snapped to 1e-9 before the grid sum; V is one
    * mirrored sqrt chain (min(r−1, c−1) = 1 here). Scale: one
    * domain-bounded contingency aggregate.
    */
  def q466CramersV(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint()
    val rows = cells.groupBy("rf").agg(sum("o").as("nr"))
    val colsM = cells.groupBy("ls").agg(sum("o").as("nc"))
    val n = cells.agg(sum("o").as("n"))
    // the r×c grid is the CROSS of the margins (domain-bounded: both
    // sides are ≤|domain| censuses), not just the observed cells, so a
    // structurally-empty cell still contributes its (0−e)²/e = e term
    // to chi-squared instead of silently dropping out (all 6 cells are
    // populated on TPC-H, so this is value-identical today; mirrored in
    // the oracle)
    val grid = rows.crossJoin(broadcast(colsM))
    val terms = grid.join(broadcast(cells), Seq("rf", "ls"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(n))
      .withColumn("e", expr("CAST(nr AS DOUBLE) * nc / n"))
      .withColumn("t_e9", expr(
        "CAST(floor((o - e) * (o - e) / e * 1.0e9 + 0.5) AS BIGINT)"))
      .localCheckpoint()
    val chi = terms.agg(sum("t_e9").as("chi_e9"), max("n").as("nn"))
      .withColumn("chi2", expr("CAST(chi_e9 AS DOUBLE) / 1.0e9"))
      .withColumn("v", expr("sqrt(chi2 / nn)"))
    terms.crossJoin(broadcast(chi.select("chi2", "v")))
      .select(col("rf").as("returnflag"), col("ls").as("linestatus"),
        col("o").as("observed"), expr("round(e, 6)").as("expected"),
        expr("round(chi2, 6)").as("chi2"),
        expr("round(v, 6)").as("cramers_v"))
      .orderBy("returnflag", "linestatus")
  }

  /** q467: RFM SEGMENT MIGRATION MATRIX — where q292 scores customers
    * once, this tracks them MOVING: monetary tertiles (low/mid/high,
    * plus 'none' for absent) in each half of the event window, and the
    * user-count + share of every (from → to) cell — the churn/upsell
    * dashboard's engine.
    *
    * Determinism: per-half spend is exact cents; tertile cuts are exact
    * type-1 quantiles off the per-half cents census (cum ≥ ⌈n/3⌉ /
    * ⌈2n/3⌉ on integer lattices); shares are ppm integer divisions.
    * Scale: per-(user, half) aggregate, per-half census windows, one
    * 16-cell census.
    */
  def q467RfmMigration(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        when(col("event_type") === "purchase",
          floor(col("value") * 100.0 + 0.5).cast("long")).otherwise(0L).as("cents"))
    val d0 = ev.agg(min("day").as("day0"))
    val per = ev.crossJoin(broadcast(d0))
      .groupBy(col("user_id"),
        expr("CASE WHEN day - day0 < 15 THEN 0L ELSE 1L END").as("h"))
      .agg(sum("cents").as("v"))
      .localCheckpoint()
    val census = per.groupBy("h", "v").agg(count(lit(1)).as("cnt"))
    val nh = per.groupBy("h").agg(count(lit(1)).as("n"))
    val cuts = census.join(broadcast(nh), "h")
      .withColumn("cum", sum("cnt").over(Window.partitionBy("h").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("h")
      .agg(min(when(col("cum") >= expr("(n + 2L) div 3L"), col("v"))).as("cut1"),
        min(when(col("cum") >= expr("(2L * n + 2L) div 3L"), col("v"))).as("cut2"))
    val classed = per.join(broadcast(cuts), "h")
      .withColumn("cls", expr(
        "CASE WHEN v <= cut1 THEN 'low' WHEN v <= cut2 THEN 'mid' ELSE 'high' END"))
      .groupBy("user_id")
      .agg(max(when(col("h") === 0L, col("cls"))).as("c1"),
        max(when(col("h") === 1L, col("cls"))).as("c2"))
      .select(coalesce(col("c1"), lit("none")).as("from_class"),
        coalesce(col("c2"), lit("none")).as("to_class"))
    val tot = classed.agg(count(lit(1)).as("nu"))
    classed.groupBy("from_class", "to_class")
      .agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(tot))
      .select(col("from_class"), col("to_class"), col("n_users"),
        expr("n_users * 1000000L div nu").as("share_ppm"))
      .orderBy("from_class", "to_class")
  }

  /** q468: ERLANG-B/C STAFFING CURVE — "how many agents so P(wait) is
    * tolerable" (Erlang '17, still THE contact-center formula): offered
    * load a = arrival rate × 5-min handle time from the event stream,
    * blocking B(c) by the Erlang-B recursion and delay probability C(c)
    * for c = 1..24 servers.
    *
    * Determinism: a is one exact-count ratio; the B recursion folds
    * left with IDENTICAL operations in both engines — Spark `aggregate`
    * with explicit init ↔ DuckDB `list_reduce` with the init PREPENDED
    * to the list; C(c) is NULL where the queue is unstable (c ≤ a).
    * Scale: a 1-row census broadcast onto a 24-row literal grid.
    */
  def q468ErlangStaffing(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(expr("unix_micros(ts) div 86400000000").as("day"))
    val base = ev.agg(count(lit(1)).as("n_ev"),
        (max("day") - min("day") + lit(1L)).as("n_days"))
      .withColumn("a", expr("CAST(n_ev AS DOUBLE) * 5 / (n_days * 24 * 60)"))
    base.select(col("n_ev"), col("n_days"), col("a"),
        explode(expr("sequence(1, 24)")).as("c"))
      .withColumn("b", expr(
        "aggregate(sequence(1, c), CAST(1 AS DOUBLE), (acc, k) -> (a * acc) / (k + a * acc))"))
      .withColumn("pw", expr(
        "CASE WHEN CAST(c AS DOUBLE) > a THEN c * b / (c - a * (CAST(1 AS DOUBLE) - b)) ELSE NULL END"))
      .select(col("c").as("servers"),
        expr("round(a, 6)").as("offered_load"),
        expr("round(b, 6)").as("erlang_b"),
        expr("round(pw, 6)").as("p_wait"))
      .orderBy("servers")
  }

  /** q469: BURROWS' DELTA — the stylometric distance that attributes
    * authorship from function-word usage (Burrows '02): z-score each
    * source's relative frequency of the 10 highest-frequency corpus
    * words, Δ(s₁,s₂) = mean |z₁ − z₂| over those words — which sources
    * "write alike", the provenance-dedup cousin of the content dedups.
    *
    * Determinism: word/source counts are exact; per-word cross-source
    * moments are ORDER-PINNED cumulatives over the source-sorted census
    * (the q457 device); each |Δz| term is snapped to 1e-9 before the
    * 10-word pair sums; top-10 words under a total (freq, word) order.
    * Scale: token censuses + a (10 words × 20 sources) frame — all
    * domain-bounded after the scans.
    */
  def q469BurrowsDelta(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documentsSpread(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
    val srcTot = toks.groupBy("source").agg(count(lit(1)).as("ts"))
    val top = toks.groupBy("w").agg(count(lit(1)).as("cw"))
      .orderBy(col("cw").desc, col("w").asc).limit(10)
      .select(col("w"))
    val fsw = toks.join(broadcast(top), Seq("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
      .join(srcTot, "source")
      .withColumn("f", expr("CAST(c AS DOUBLE) / ts"))
    val k = srcTot.agg(count(lit(1)).as("k"))
    val wWin = Window.partitionBy("w").orderBy("source")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val moms = fsw
      .withColumn("f_cum", sum("f").over(wWin))
      .withColumn("f2_cum", sum(expr("f * f")).over(wWin))
      .groupBy("w").agg(max("f_cum").as("sf"), max("f2_cum").as("sf2"))
      .crossJoin(broadcast(k))
      .withColumn("mean_f", expr("sf / k"))
      .withColumn("sd_f", expr(
        "sqrt((k * sf2 - sf * sf) / (CAST(k AS DOUBLE) * (k - 1)))"))
    val z = fsw.join(broadcast(moms.select("w", "mean_f", "sd_f")), "w")
      .select(col("source"), col("w"),
        expr("(f - mean_f) / sd_f").as("z"))
      .localCheckpoint()
    val za = z.toDF("source_a", "w", "za")
    val zb = z.toDF("source_b", "w", "zb")
    za.join(zb, Seq("w"))
      .filter(col("source_a") < col("source_b"))
      .withColumn("t_e9", expr(
        "CAST(floor(abs(za - zb) * 1.0e9 + 0.5) AS BIGINT)"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_words"), sum("t_e9").as("d_e9"))
      .select(col("source_a"), col("source_b"), col("n_words"),
        expr("round(CAST(d_e9 AS DOUBLE) / n_words / 1.0e9, 6)").as("delta"))
      .orderBy("source_a", "source_b")
  }

  /** q470: SEASONAL / TREND STRENGTH — the STL-lite diagnostics
    * F_T = max(0, 1 − Var(R)/Var(T+R)) and F_S = max(0, 1 −
    * Var(R)/Var(S+R)) (Wang–Smith–Hyndman '06) that tell a forecaster
    * WHICH baseline q458's scorecard should favor: daily purchases,
    * trend = centered 7-day MA, seasonal = day-of-week means of the
    * detrended series.
    *
    * Determinism: everything lives on the ×1680 integer lattice (the
    * 7-day MA denominator × 20 cents-free scale × the 12 = lcm(3,4) of
    * the interior day-of-week counts): 1680·y, 240·T7, and
    * S1680 = Σd140·(12 div cnt) are exact BIGINTs, so every component
    * variance is an exact-moment computation; the two F readouts are
    * mirrored IEEE chains. Scale: one day census; windows and dow
    * means over it.
    */
  def q470SeasonalStrength(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(expr("unix_micros(ts) div 86400000000").as("day"))
    val d0 = ev.agg(min("day").as("day0"))
    val daily = ev.crossJoin(broadcast(d0))
      .groupBy((col("day") - col("day0")).as("d"))
      .agg(count(lit(1)).as("y"))
    val w7 = Window.orderBy("d").rowsBetween(-3, 3)
    val interior = daily
      .withColumn("t7", sum("y").over(w7))
      .withColumn("k7", count("y").over(w7))
      .filter(col("k7") === 7)
      .withColumn("d140", expr("140L * y - 20L * t7"))
      .localCheckpoint()
    val dow = interior.groupBy(expr("d % 7").as("dw"))
      .agg(sum("d140").as("sd"), count(lit(1)).as("cnt"))
      // mean of d140 per dow, EXACT on the ×12 sub-lattice: cnt ∈ {3,4}
      // on the 24 interior days, and 12 = lcm(3,4). The CASE is a loud
      // guard (mirrored in the oracle): if a future fixture's interior
      // span gives a dow count that doesn't divide 12, both engines
      // fail at run time instead of silently floor-biasing the mean
      .withColumn("s1680", expr(
        "CASE WHEN cnt IN (1L, 2L, 3L, 4L, 6L, 12L) THEN sd * (12L div cnt) " +
          "ELSE CAST(raise_error('q470: interior dow count must divide 12') AS BIGINT) END"))
    val comp = interior.join(broadcast(dow), expr("d % 7 = dw"))
      .withColumn("r1680", expr("1680L * y - 240L * t7 - s1680"))
      .withColumn("sr1680", expr("s1680 + r1680"))
      .withColumn("tr1680", expr("1680L * y - s1680"))
    val moms = comp.agg(count(lit(1)).as("n"),
      sum("r1680").as("s_r"), sum(expr("r1680 * r1680")).as("q_r"),
      sum("sr1680").as("s_sr"), sum(expr("sr1680 * sr1680")).as("q_sr"),
      sum("tr1680").as("s_tr"), sum(expr("tr1680 * tr1680")).as("q_tr"))
    moms.select(col("n").as("n_interior_days"),
        expr("round(greatest(CAST(0 AS DOUBLE), CAST(1 AS DOUBLE) - (CAST(n AS DOUBLE) * q_r - CAST(s_r AS DOUBLE) * s_r) / (CAST(n AS DOUBLE) * q_tr - CAST(s_tr AS DOUBLE) * s_tr)), 6)")
          .as("trend_strength"),
        expr("round(greatest(CAST(0 AS DOUBLE), CAST(1 AS DOUBLE) - (CAST(n AS DOUBLE) * q_r - CAST(s_r AS DOUBLE) * s_r) / (CAST(n AS DOUBLE) * q_sr - CAST(s_sr AS DOUBLE) * s_sr)), 6)")
          .as("seasonal_strength"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q463_bass_diffusion" -> (q463BassDiffusion _),
    "q464_kendall_tau" -> (q464KendallTau _),
    "q465_price_indices" -> (q465PriceIndices _),
    "q466_cramers_v" -> (q466CramersV _),
    "q467_rfm_migration" -> (q467RfmMigration _),
    "q468_erlang_staffing" -> (q468ErlangStaffing _),
    "q469_burrows_delta" -> (q469BurrowsDelta _),
    "q470_seasonal_strength" -> (q470SeasonalStrength _)
  )

  override val oracles: Map[String, String] = Map(
    // same dense month grid, same DECIMAL/HUGEINT wide moments, same
    // Cramer determinant chains, same floored discriminant
    "q463_bass_diffusion" ->
      """WITH first AS (
        |  SELECT o_custkey,
        |         min((year(o_orderdate) - 1970) * 12 + month(o_orderdate) - 1) AS fm
        |  FROM orders GROUP BY 1),
        |refs AS (SELECT min(fm) AS m0, max(fm) AS m1 FROM first),
        |census AS (
        |  SELECT f.fm - r.m0 AS t, count(*)::BIGINT AS n
        |  FROM first f, refs r GROUP BY 1),
        |grid AS (
        |  SELECT g.t, coalesce(c.n, 0)::BIGINT AS n
        |  FROM (SELECT unnest(generate_series(0, (SELECT m1 - m0 FROM refs)))::BIGINT AS t) g
        |  LEFT JOIN census c ON g.t = c.t),
        |cumed AS (
        |  SELECT t, n,
        |         (sum(n) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) - n)::BIGINT AS np
        |  FROM grid),
        |mom AS (
        |  SELECT count(*)::BIGINT AS s0, sum(np)::BIGINT AS s1,
        |         sum(np * np)::BIGINT AS s2,
        |         sum(np::HUGEINT * np * np) AS s3,
        |         sum(np::HUGEINT * np * np * np) AS s4,
        |         sum(n)::BIGINT AS t0, sum(n * np)::BIGINT AS t1,
        |         sum(n::HUGEINT * np * np) AS t2
        |  FROM cumed),
        |d AS (
        |  SELECT s0, s0::DOUBLE AS ds0, s1::DOUBLE AS ds1, s2::DOUBLE AS ds2,
        |         s3::DOUBLE AS ds3, s4::DOUBLE AS ds4, t0::DOUBLE AS dt0,
        |         t1::DOUBLE AS dt1, t2::DOUBLE AS dt2
        |  FROM mom),
        |solved AS (
        |  SELECT s0,
        |         (dt0 * (ds2 * ds4 - ds3 * ds3) - ds1 * (dt1 * ds4 - ds3 * dt2) + ds2 * (dt1 * ds3 - ds2 * dt2))
        |           / (ds0 * (ds2 * ds4 - ds3 * ds3) - ds1 * (ds1 * ds4 - ds3 * ds2) + ds2 * (ds1 * ds3 - ds2 * ds2)) AS ca,
        |         (ds0 * (dt1 * ds4 - ds3 * dt2) - dt0 * (ds1 * ds4 - ds3 * ds2) + ds2 * (ds1 * dt2 - dt1 * ds2))
        |           / (ds0 * (ds2 * ds4 - ds3 * ds3) - ds1 * (ds1 * ds4 - ds3 * ds2) + ds2 * (ds1 * ds3 - ds2 * ds2)) AS cb,
        |         (ds0 * (ds2 * dt2 - dt1 * ds3) - ds1 * (ds1 * dt2 - dt1 * ds2) + dt0 * (ds1 * ds3 - ds2 * ds2))
        |           / (ds0 * (ds2 * ds4 - ds3 * ds3) - ds1 * (ds1 * ds4 - ds3 * ds2) + ds2 * (ds1 * ds3 - ds2 * ds2)) AS cc
        |  FROM d),
        |rooted AS (
        |  SELECT s0, ca, cb, cc,
        |         (CAST(0 AS DOUBLE) - cb - sqrt(greatest(cb * cb - CAST(4 AS DOUBLE) * ca * cc, CAST(0 AS DOUBLE)))) / (CAST(2 AS DOUBLE) * cc) AS m_hat
        |  FROM solved),
        |ped AS (SELECT s0, ca, cb, cc, m_hat, ca / m_hat AS p_hat FROM rooted)
        |SELECT s0 AS n_months, round(ca, 6) + 0.0 AS a, round(cb, 6) + 0.0 AS b,
        |       round(cc, 6) + 0.0 AS c, round(m_hat, 6) + 0.0 AS m_hat,
        |       round(p_hat, 6) + 0.0 AS p_hat, round(cb + p_hat, 6) + 0.0 AS q_hat
        |FROM ped""".stripMargin,
    // same exact pair counts off the day census, same τ-b chain
    "q464_kendall_tau" ->
      """WITH ev AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, event_type FROM events),
        |d0 AS (SELECT min(day) AS day0 FROM ev),
        |census AS (
        |  SELECT ev.day - d0.day0 AS d,
        |         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS x,
        |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS y
        |  FROM ev, d0 GROUP BY 1),
        |pairs AS (
        |  SELECT count(*)::BIGINT AS n0,
        |         sum(CASE WHEN (b.x - a.x) * (b.y - a.y) > 0 THEN 1 ELSE 0 END)::BIGINT AS conc,
        |         sum(CASE WHEN (b.x - a.x) * (b.y - a.y) < 0 THEN 1 ELSE 0 END)::BIGINT AS disc,
        |         sum(CASE WHEN b.x = a.x THEN 1 ELSE 0 END)::BIGINT AS tx,
        |         sum(CASE WHEN b.y = a.y THEN 1 ELSE 0 END)::BIGINT AS ty
        |  FROM census a JOIN census b ON a.d < b.d),
        |n AS (SELECT count(*)::BIGINT AS n_days FROM census)
        |SELECT n.n_days, p.conc AS concordant, p.disc AS discordant,
        |       p.tx AS ties_x, p.ty AS ties_y,
        |       round((p.conc - p.disc) / sqrt((p.n0 - p.tx)::DOUBLE * (p.n0 - p.ty)), 6) + 0.0 AS tau_b
        |FROM pairs p, n""".stripMargin,
    // same whole-cent snaps on the cross-weighted terms, exact
    // own-weighted sums, one sqrt for Fisher
    "q465_price_indices" ->
      """WITH py AS (
        |  SELECT l_partkey, year(l_shipdate) AS yr,
        |         sum(floor(l_quantity + 0.5)::BIGINT)::BIGINT AS qty,
        |         sum(floor(l_extendedprice * 100 + 0.5)::BIGINT)::BIGINT AS ext
        |  FROM lineitem WHERE year(l_shipdate) IN (1995, 1996)
        |  GROUP BY 1, 2),
        |p0 AS (SELECT l_partkey, qty AS q0, ext AS e0 FROM py WHERE yr = 1995),
        |p1 AS (SELECT l_partkey, qty AS q1, ext AS e1 FROM py WHERE yr = 1996),
        |agg AS (
        |  SELECT count(*)::BIGINT AS n_common_parts,
        |         sum(e0)::BIGINT AS sum_p0q0, sum(e1)::BIGINT AS sum_p1q1,
        |         sum(floor(e1::DOUBLE * q0 / q1 + 0.5)::BIGINT)::BIGINT AS sum_p1q0,
        |         sum(floor(e0::DOUBLE * q1 / q0 + 0.5)::BIGINT)::BIGINT AS sum_p0q1
        |  FROM p0 JOIN p1 USING (l_partkey)),
        |idx AS (
        |  SELECT n_common_parts, sum_p0q0, sum_p1q1, sum_p1q0, sum_p0q1,
        |         sum_p1q0::DOUBLE / sum_p0q0 AS laspeyres,
        |         sum_p1q1::DOUBLE / sum_p0q1 AS paasche
        |  FROM agg)
        |SELECT n_common_parts, sum_p0q0, sum_p1q1, sum_p1q0, sum_p0q1,
        |       round(laspeyres, 6) + 0.0 AS laspeyres,
        |       round(paasche, 6) + 0.0 AS paasche,
        |       round(sqrt(laspeyres * paasche), 6) + 0.0 AS fisher
        |FROM idx""".stripMargin,
    // same exact margins, same 1e-9 cell-term snaps, same V chain
    "q466_cramers_v" ->
      """WITH cells AS (
        |  SELECT l_returnflag AS rf, l_linestatus AS ls, count(*)::BIGINT AS o
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT rf, sum(o)::BIGINT AS nr FROM cells GROUP BY 1),
        |c AS (SELECT ls, sum(o)::BIGINT AS nc FROM cells GROUP BY 1),
        |n AS (SELECT sum(o)::BIGINT AS n FROM cells),
        |grid AS (
        |  SELECT r.rf, c.ls, r.nr, c.nc, coalesce(cells.o, 0)::BIGINT AS o
        |  FROM r CROSS JOIN c LEFT JOIN cells ON r.rf = cells.rf AND c.ls = cells.ls),
        |terms AS (
        |  SELECT g.rf, g.ls, g.o,
        |         g.nr::DOUBLE * g.nc / n.n AS e,
        |         floor((g.o - g.nr::DOUBLE * g.nc / n.n) * (g.o - g.nr::DOUBLE * g.nc / n.n) / (g.nr::DOUBLE * g.nc / n.n) * 1.0e9 + 0.5)::BIGINT AS t_e9
        |  FROM grid g, n),
        |chi AS (
        |  SELECT sum(t_e9)::BIGINT AS chi_e9, max(n.n)::BIGINT AS nn
        |  FROM terms, n),
        |c2 AS (
        |  SELECT chi_e9::DOUBLE / 1.0e9 AS chi2, nn FROM chi),
        |c3 AS (SELECT chi2, sqrt(chi2 / nn) AS v FROM c2)
        |SELECT t.rf AS returnflag, t.ls AS linestatus, t.o AS observed,
        |       round(t.e, 6) + 0.0 AS expected,
        |       round(c3.chi2, 6) + 0.0 AS chi2,
        |       round(c3.v, 6) + 0.0 AS cramers_v
        |FROM terms t, c3 ORDER BY returnflag, linestatus""".stripMargin,
    // same per-half exact tertile cuts, same ppm lattice
    "q467_rfm_migration" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |         CASE WHEN event_type = 'purchase' THEN floor(value * 100 + 0.5)::BIGINT ELSE 0 END AS cents
        |  FROM events),
        |d0 AS (SELECT min(day) AS day0 FROM ev),
        |per AS (
        |  SELECT user_id,
        |         CASE WHEN ev.day - d0.day0 < 15 THEN 0 ELSE 1 END AS h,
        |         sum(cents)::BIGINT AS v
        |  FROM ev, d0 GROUP BY 1, 2),
        |census AS (SELECT h, v, count(*)::BIGINT AS cnt FROM per GROUP BY 1, 2),
        |nh AS (SELECT h, count(*)::BIGINT AS n FROM per GROUP BY 1),
        |cuts AS (
        |  SELECT c.h,
        |         min(CASE WHEN cum >= (n + 2) // 3 THEN v END)::BIGINT AS cut1,
        |         min(CASE WHEN cum >= (2 * n + 2) // 3 THEN v END)::BIGINT AS cut2
        |  FROM (SELECT h, v,
        |               sum(cnt) OVER (PARTITION BY h ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
        |        FROM census) c JOIN nh USING (h)
        |  GROUP BY 1),
        |classed AS (
        |  SELECT p.user_id,
        |         max(CASE WHEN p.h = 0 THEN
        |           CASE WHEN p.v <= k.cut1 THEN 'low' WHEN p.v <= k.cut2 THEN 'mid' ELSE 'high' END END) AS c1,
        |         max(CASE WHEN p.h = 1 THEN
        |           CASE WHEN p.v <= k.cut1 THEN 'low' WHEN p.v <= k.cut2 THEN 'mid' ELSE 'high' END END) AS c2
        |  FROM per p JOIN cuts k USING (h)
        |  GROUP BY 1),
        |flows AS (
        |  SELECT coalesce(c1, 'none') AS from_class,
        |         coalesce(c2, 'none') AS to_class
        |  FROM classed),
        |tot AS (SELECT count(*)::BIGINT AS nu FROM flows)
        |SELECT from_class, to_class, count(*)::BIGINT AS n_users,
        |       (count(*) * 1000000 // max(tot.nu))::BIGINT AS share_ppm
        |FROM flows, tot GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // same fold: list_reduce with the init PREPENDED mirrors Spark's
    // aggregate(…, init, …) operation-for-operation
    "q468_erlang_staffing" ->
      """WITH base AS (
        |  SELECT count(*)::BIGINT AS n_ev,
        |         (max(epoch_us(ts) // 86400000000) - min(epoch_us(ts) // 86400000000) + 1)::BIGINT AS n_days
        |  FROM events),
        |loaded AS (
        |  SELECT n_ev, n_days, n_ev::DOUBLE * 5 / (n_days * 24 * 60) AS a
        |  FROM base),
        |grid AS (
        |  SELECT l.n_ev, l.n_days, l.a, g.c
        |  FROM loaded l, (SELECT unnest(generate_series(1, 24))::BIGINT AS c) g),
        |folded AS (
        |  SELECT c, a,
        |         list_reduce(list_prepend(CAST(1 AS DOUBLE), [x::DOUBLE FOR x IN range(1, c::INT + 1)]),
        |                     (acc, k) -> (a * acc) / (k + a * acc)) AS b
        |  FROM grid)
        |SELECT c AS servers, round(a, 6) + 0.0 AS offered_load,
        |       round(b, 6) + 0.0 AS erlang_b,
        |       round(CASE WHEN c::DOUBLE > a THEN c * b / (c - a * (CAST(1 AS DOUBLE) - b)) ELSE NULL END, 6) + 0.0 AS p_wait
        |FROM folded ORDER BY servers""".stripMargin,
    // same top-10 word cut, same order-pinned cross-source moments,
    // same 1e-9 |Δz| term snaps
    "q469_burrows_delta" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
        |srctot AS (SELECT source, count(*)::BIGINT AS ts FROM toks GROUP BY 1),
        |top AS (
        |  SELECT w FROM (SELECT w, count(*)::BIGINT AS cw FROM toks GROUP BY 1)
        |  QUALIFY row_number() OVER (ORDER BY cw DESC, w ASC) <= 10),
        |fsw AS (
        |  SELECT t.source, t.w, count(*)::BIGINT AS c
        |  FROM toks t JOIN top USING (w) GROUP BY 1, 2),
        |f2 AS (
        |  SELECT f.source, f.w, f.c::DOUBLE / s.ts AS f
        |  FROM fsw f JOIN srctot s USING (source)),
        |k AS (SELECT count(*)::BIGINT AS k FROM srctot),
        |cums AS (
        |  SELECT w,
        |         sum(f) OVER (PARTITION BY w ORDER BY source ROWS UNBOUNDED PRECEDING) AS f_cum,
        |         sum(f * f) OVER (PARTITION BY w ORDER BY source ROWS UNBOUNDED PRECEDING) AS f2_cum
        |  FROM f2),
        |moms AS (
        |  SELECT c.w, max(c.f_cum) AS sf, max(c.f2_cum) AS sf2
        |  FROM cums c GROUP BY 1),
        |m2 AS (
        |  SELECT m.w, m.sf / k.k AS mean_f,
        |         sqrt((k.k * m.sf2 - m.sf * m.sf) / (k.k::DOUBLE * (k.k - 1))) AS sd_f
        |  FROM moms m, k),
        |z AS (
        |  SELECT f2.source, f2.w, (f2.f - m2.mean_f) / m2.sd_f AS z
        |  FROM f2 JOIN m2 USING (w))
        |SELECT a.source AS source_a, b.source AS source_b,
        |       count(*)::BIGINT AS n_words,
        |       round(sum(floor(abs(a.z - b.z) * 1.0e9 + 0.5)::BIGINT)::DOUBLE / count(*) / 1.0e9, 6) + 0.0 AS delta
        |FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // same ×140 integer lattice for every component, exact moments
    "q470_seasonal_strength" ->
      """WITH ev AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day FROM events
        |  WHERE event_type = 'purchase'),
        |d0 AS (SELECT min(day) AS day0 FROM ev),
        |daily AS (
        |  SELECT ev.day - d0.day0 AS d, count(*)::BIGINT AS y
        |  FROM ev, d0 GROUP BY 1),
        |ma AS (
        |  SELECT d, y,
        |         sum(y) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)::BIGINT AS t7,
        |         count(y) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)::BIGINT AS k7
        |  FROM daily),
        |interior AS (
        |  SELECT d, y, t7, (140 * y - 20 * t7)::BIGINT AS d140
        |  FROM ma WHERE k7 = 7),
        |dow AS (
        |  SELECT d % 7 AS dw,
        |         (CASE WHEN count(*) IN (1, 2, 3, 4, 6, 12)
        |               THEN sum(d140) * (12 // count(*))
        |               ELSE error('q470: interior dow count must divide 12') END)::BIGINT AS s1680
        |  FROM interior GROUP BY 1),
        |comp AS (
        |  SELECT i.d, (1680 * i.y - 240 * i.t7 - w.s1680)::BIGINT AS r1680,
        |         (w.s1680 + (1680 * i.y - 240 * i.t7 - w.s1680))::BIGINT AS sr1680,
        |         (1680 * i.y - w.s1680)::BIGINT AS tr1680
        |  FROM interior i JOIN dow w ON i.d % 7 = w.dw),
        |moms AS (
        |  SELECT count(*)::BIGINT AS n,
        |         sum(r1680)::BIGINT AS s_r, sum(r1680 * r1680)::BIGINT AS q_r,
        |         sum(sr1680)::BIGINT AS s_sr, sum(sr1680 * sr1680)::BIGINT AS q_sr,
        |         sum(tr1680)::BIGINT AS s_tr, sum(tr1680 * tr1680)::BIGINT AS q_tr
        |  FROM comp)
        |SELECT n AS n_interior_days,
        |       round(greatest(CAST(0 AS DOUBLE), CAST(1 AS DOUBLE) - (n::DOUBLE * q_r - s_r::DOUBLE * s_r) / (n::DOUBLE * q_tr - s_tr::DOUBLE * s_tr)), 6) + 0.0 AS trend_strength,
        |       round(greatest(CAST(0 AS DOUBLE), CAST(1 AS DOUBLE) - (n::DOUBLE * q_r - s_r::DOUBLE * s_r) / (n::DOUBLE * q_sr - s_sr::DOUBLE * s_sr)), 6) + 0.0 AS seasonal_strength
        |FROM moms""".stripMargin
  )
}
