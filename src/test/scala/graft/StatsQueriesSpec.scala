package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The StatsQueries* families against HAND-COMPUTED fixtures — evidence
  * independent of the DuckDB oracle mirror (which, being same-text by
  * design, cannot catch a formula that is wrong the same way on both
  * sides). Each test writes a tiny synthetic table whose statistic is
  * computable on paper and pins the engine's output to it:
  * Kendall τ-b (known concordance table), Mann–Kendall + Sen (strictly
  * increasing series), Cochran's Q (3×4 textbook table), Kaplan–Meier /
  * Nelson–Aalen (3-subject table recomputed from first principles),
  * time-decay attribution (two touches, exact 2^k shares), geometric
  * adstock (two-day closed form), log-rank (4-subject table from the
  * Mantel–Haenszel formula), Tukey HSD (two 3-obs groups, exact MSW),
  * Bass diffusion (3-point exact quadratic interpolation), Erlang-B/C
  * (offered load 1 — the closed 1/2, 1/5, 1/16 chain), Weibull
  * median-rank fit (two duration levels, Bernard ranks re-derived),
  * Cramér's V (2×2 table with integer-exact margins), Goodman–Kruskal γ
  * (5-order decile contingency hand count), Bradley–Terry (two MM
  * iterations unrolled on the 3-type duel triangle), Katz centrality
  * (4-node bipartite walk counts traced by hand), Oaxaca–Blinder
  * (two exact two-point OLS fits), Burrows' delta (3-source
  * 2-word dyadic z-table), the q160 triangle census (hand-counted
  * diamond graph, exactly-once-per-triangle pinned), q140 PageRank
  * (scalar replay of the 6-dp snapped trajectory — exact because the
  * fixture's in-degree ≤ 2 keeps every IEEE sum order-invariant),
  * q410 IPF raking (two full cycles hand-traced on the 2×2
  * non-separable table, every intermediate grid weight written down),
  * q328 Markov removal-effect attribution (3-state chain, Jacobi
  * absorption probabilities on the 10⁻⁹ floor grid), q476 gains table
  * (10 distinct-score users, type-1 decile cuts and top-down gains),
  * q322 Shapley attribution (2-channel superadditive lattice with
  * the null-player and efficiency axioms checked by hand),
  * q471 Jonckheere–Terpstra (3-ordered-group tie-free pair table,
  * U-counts and both moments hand-derived), q474 two-way fixed
  * effects (2×3 panel within-demeaned by hand — every xt/yt exact in
  * IEEE, β = 80 exactly), q465 price indices (two-part basket,
  * Laspeyres/Paasche revaluations exact), and q481 Lin's CCC (4-day
  * integer census, CCC = 2/3 and r = 2/√5 by hand).
  */
class StatsQueriesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** (day, hourOffset, user, type, value) → a parquet `events` fixture
    * dir; days are epoch-day-based so `unix_micros div 86400000000`
    * recovers them exactly.
    */
  private def fixture(rows: Seq[(Int, Int, Long, String, Double)]): String = {
    val dir = Files.createTempDirectory("stats_fix_").toString
    val data = rows.zipWithIndex.map { case ((d, h, u, t, v), i) =>
      Row(i.toLong, new Timestamp(d.toLong * 86400000L + h.toLong * 3600000L),
        u, t, v, "{}")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def snap9(x: Double): Long = math.floor(x * 1e9 + 0.5).toLong

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** (custkey, priority, totalprice, year, month) → an `orders` fixture
    * dir (timestamps from epoch-day arithmetic so year/month extraction
    * under the UTC session recovers them exactly).
    */
  private def ordersFixture(rows: Seq[(Long, String, Double, Int, Int)]): String = {
    val dir = Files.createTempDirectory("stats_fix_").toString
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType)))
    val data = rows.zipWithIndex.map { case ((c, pri, v, y, m), i) =>
      val epochDay = java.time.LocalDate.of(y, m, 15).toEpochDay
      Row(i.toLong, c, "O", v, new Timestamp(epochDay * 86400000L), pri)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  /** (returnflag, linestatus, rowcount) → a `lineitem` fixture dir. */
  private def lineitemFixture(cells: Seq[(String, String, Int)]): String = {
    val dir = Files.createTempDirectory("stats_fix_").toString
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType)))
    val data = cells.flatMap { case (rf, ls, n) =>
      (0 until n).map(_ => (rf, ls))
    }.zipWithIndex.map { case ((rf, ls), i) =>
      Row(i.toLong, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, rf, ls,
        new Timestamp(9000L * 86400000L))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  /** (epochDay, totalprice) → an `orders` fixture dir with DAILY
    * resolution (q447's drawdown needs consecutive days, not months).
    */
  private def ordersDaily(rows: Seq[(Long, Double)]): String = {
    val dir = Files.createTempDirectory("stats_fix_").toString
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType)))
    val data = rows.zipWithIndex.map { case ((d, v), i) =>
      Row(i.toLong, i.toLong, "O", v, new Timestamp(d * 86400000L), "1-URGENT")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  /** nation + customer + orders triple for the dim-join estimators:
    * (nationkey → name), (custkey → nationkey), (buyer custkey, price).
    */
  private def conversionFixture(nations: Seq[(Int, String)],
      custs: Seq[(Long, Int)], buyers: Seq[(Long, Double)]): String = {
    val dir = Files.createTempDirectory("stats_fix_").toString
    val nSchema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(nations.map { case (k, n) => Row(k, n, 0) }, 1),
      nSchema).write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val cSchema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        custs.map { case (c, n) => Row(c, s"c$c", n, 0.0, "BUILDING") }, 1),
      cSchema).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val oSchema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(buyers.zipWithIndex.map { case ((c, v), i) =>
        Row(i.toLong, c, "O", v, new Timestamp(9000L * 86400000L), "1-URGENT")
      }, 1), oSchema).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  /** The house md5 experiment coin, recomputed independently (JDK
    * MessageDigest, not Spark) so arm-dependent fixtures can choose
    * users landing on known arms.
    */
  private def md5Arm(salt: String, uid: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt$uid".getBytes("UTF-8"))
    java.lang.Long.parseLong(f"${d(0) & 0xff}%02x", 16) % 2
  }

  test("q464 Kendall tau-b matches the hand-computed concordance table") {
    // daily views x = [1,2,3,4], purchases y = [1,3,2,4]:
    // C = 5, D = 1, no ties, tau = 4/6
    val rows = (0 until 4).flatMap { d =>
      val x = d + 1
      val y = Seq(1, 3, 2, 4)(d)
      (0 until x).map(i => (d, 1 + i, 1L, "view", 1.0)) ++
        (0 until y).map(i => (d, 10 + i, 1L, "purchase", 1.0))
    }
    val out = graft.queries.StatsQueries3
      .q464KendallTau(spark, fixture(rows)).collect()(0)
    assert(out.getAs[Long]("n_days") === 4L)
    assert(out.getAs[Long]("concordant") === 5L)
    assert(out.getAs[Long]("discordant") === 1L)
    assert(out.getAs[Long]("ties_x") === 0L)
    assert(out.getAs[Long]("ties_y") === 0L)
    assert(out.getAs[Double]("tau_b") === 0.666667)
  }

  test("q453 Mann-Kendall + Sen on a strictly increasing series") {
    // daily actives [1, 2, 3]: S = 3, no ties, 18Var = 3*2*11 = 66,
    // z = 2/sqrt(66/18), Sen slope = 1.0 (all pairwise slopes are 1)
    val rows =
      Seq((0, 1, 1L, "view", 1.0)) ++
        Seq((1, 1, 1L, "view", 1.0), (1, 2, 2L, "view", 1.0)) ++
        Seq((2, 1, 1L, "view", 1.0), (2, 2, 2L, "view", 1.0),
          (2, 3, 3L, "view", 1.0))
    val out = graft.queries.StatsQueries2
      .q453MannKendall(spark, fixture(rows)).collect()(0)
    assert(out.getAs[Long]("n_days") === 3L)
    assert(out.getAs[Long]("s_stat") === 3L)
    assert(out.getAs[Long]("var18") === 66L)
    val zExp = (3.0 - 1.0) / math.sqrt(66.0 / 18.0)
    assert(out.getAs[Double]("z") ===
      BigDecimal(zExp).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out.getAs[Long]("trend") === 0L)
    assert(out.getAs[Double]("sen_slope") === 1.0)
  }

  test("q443 Cochran's Q matches the 3-user x 4-week textbook table") {
    // X: u1 = [1,1,1,0], u2 = [1,0,1,0], u3 = [0,0,1,0]
    // C = [2,1,3,0], N = 6, sumC2 = 14, R = [3,2,1], sumR2 = 14
    // Q = 3*(4*14 - 36) / (4*6 - 14) = 60/10 = 6.0, not rejected
    val rows = Seq(
      (0, 1, 1L, "purchase", 1.0), (7, 1, 1L, "purchase", 1.0),
      (14, 1, 1L, "purchase", 1.0),
      (0, 2, 2L, "purchase", 1.0), (14, 2, 2L, "purchase", 1.0),
      (14, 3, 3L, "purchase", 1.0),
      // non-purchase presence so the span reaches week 3 (days 21..27)
      (27, 1, 1L, "view", 1.0))
    val out = graft.queries.StatsQueries
      .q443CochranQ(spark, fixture(rows)).collect()(0)
    assert(out.getAs[Long]("n_users") === 3L)
    assert((out.getAs[Long]("w0"), out.getAs[Long]("w1"),
      out.getAs[Long]("w2"), out.getAs[Long]("w3")) === ((2L, 1L, 3L, 0L)))
    assert(out.getAs[Long]("q_num") === 60L)
    assert(out.getAs[Long]("q_den") === 10L)
    assert(out.getAs[Double]("q_stat") === 6.0)
    assert(out.getAs[Long]("reject") === 0L)
  }

  test("q444 Kaplan-Meier/Nelson-Aalen table from first principles") {
    // A: origin d0, purchase d1 (t=1, event); B: origin d0, censored at
    // the horizon d3 (t=3); C: origin d1, purchase d3 (t=2, event)
    val rows = Seq(
      (0, 1, 1L, "view", 1.0), (1, 1, 1L, "purchase", 1.0),
      (0, 2, 2L, "view", 1.0),
      (1, 2, 3L, "view", 1.0), (3, 1, 3L, "purchase", 1.0))
    val out = graft.queries.StatsQueries
      .q444KaplanMeier(spark, fixture(rows)).collect()
    assert(out.map(r => (r.getAs[Long]("t"), r.getAs[Long]("n_risk"),
      r.getAs[Long]("d_events"), r.getAs[Long]("censored"))).toSeq ===
      Seq((1L, 3L, 1L, 0L), (2L, 2L, 1L, 0L), (3L, 1L, 0L, 1L)))
    val na1 = snap9(1.0 / 3.0)
    val na2 = na1 + snap9(1.0 / 2.0)
    assert(out.map(_.getAs[Long]("na_e9")).toSeq === Seq(na1, na2, na2))
    val km1 = snap9(math.log(2.0 / 3.0))
    val km2 = km1 + snap9(math.log(1.0 / 2.0))
    assert(out.map(_.getAs[Long]("log_surv_e9")).toSeq === Seq(km1, km2, km2))
  }

  test("q450 time-decay attribution splits credit on exact 2^k weights") {
    // view 1 day before the purchase (w = 2^6 = 64), click 1 hour
    // before (w = 2^7 = 128): shares 64/192 and 128/192 in ppm
    val rows = Seq(
      (0, 10, 1L, "view", 1.0),
      (1, 9, 1L, "click", 1.0),
      (1, 10, 1L, "purchase", 5.0))
    val out = graft.queries.StatsQueries
      .q450TimeDecayAttribution(spark, fixture(rows)).collect()
      .map(r => (r.getAs[String]("channel"), r.getAs[Long]("n_touches"),
        r.getAs[Long]("n_conversions"), r.getAs[Long]("credit_ppm")))
    assert(out.toSeq === Seq(
      ("click", 1L, 1L, 128000000L / 192), // = 666666
      ("view", 1L, 1L, 64000000L / 192))) // = 333333
    assert(out.map(_._4).sum === 999999L) // ppm truncation, not rounding
  }

  test("q446 adstock matches the two-day closed form") {
    // view spend: day0 = 100 cents, day1 = 200 cents, r = 1/2:
    // adstock_0 = 100, adstock_1 = 200 + 100/2 = 250
    val rows = Seq(
      (0, 1, 1L, "view", 1.0),
      (1, 1, 1L, "view", 2.0))
    val out = graft.queries.StatsQueries
      .q446Adstock(spark, fixture(rows)).collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("spend_cents"),
        r.getAs[Double]("adstock")))
    assert(out.toSeq === Seq((0L, 100L, 100.0), (1L, 200L, 250.0)))
  }

  test("q445 log-rank matches the hand-computed Mantel-Haenszel table") {
    // Subjects (t, event, arm), arms chosen via the independently
    // recomputed md5 coin: arm0 = {t=1 event, t=3 censored},
    // arm1 = {t=1 event, t=2 event}. Risk table:
    //   t=1: n=4, n1=2, d=2, d1=1 -> e1 = 2*2/4 = 1, v = 2*(1/2)(1/2)(2/3) = 1/3
    //   t=2: n=2, n1=1, d=1, d1=1 -> e1 = 1/2,       v = 1/4
    //   t=3: d=0, dropped
    // O1 = 2, E1_e9 = 1_500_000_000, V_e9 = 333333333 + 250000000
    // chi2 = 0.25 / 0.583333333 -> 0.428571, not rejected
    val g0 = (1L to 200L).filter(md5Arm("lr#", _) == 0L).take(2)
    val g1 = (1L to 200L).filter(md5Arm("lr#", _) == 1L).take(2)
    val rows = Seq(
      (0, 1, g0(0), "view", 1.0), (1, 1, g0(0), "purchase", 1.0),
      (0, 1, g0(1), "view", 1.0), (3, 1, g0(1), "view", 1.0), // censored; sets horizon 3
      (0, 1, g1(0), "view", 1.0), (1, 1, g1(0), "purchase", 1.0),
      (0, 1, g1(1), "view", 1.0), (2, 1, g1(1), "purchase", 1.0))
    val out = graft.queries.StatsQueries
      .q445LogRank(spark, fixture(rows)).collect()(0)
    assert(out.getAs[Long]("n_times") === 2L)
    assert(out.getAs[Long]("o1") === 2L)
    assert(out.getAs[Long]("e1_e9") === 1500000000L)
    assert(out.getAs[Long]("v_e9") === 583333333L)
    assert(out.getAs[Double]("chi2") === round6(0.25 / 0.583333333))
    assert(out.getAs[Long]("reject") === 0L)
  }

  test("q461 Tukey HSD matches the two-group exact-MSW closed form") {
    // g1 cents {100,200,300}, g2 {400,500,600}: means 200/500,
    // SSW = 20000 + 20000, df = 4 -> MSW = 10000 exactly;
    // diff = -300, HSD = 3.858 * sqrt(10000/2 * (1/3 + 1/3))
    val dir = ordersFixture(Seq(
      (1L, "1-URGENT", 1.0, 1995, 1), (2L, "1-URGENT", 2.0, 1995, 1),
      (3L, "1-URGENT", 3.0, 1995, 1),
      (4L, "2-HIGH", 4.0, 1995, 1), (5L, "2-HIGH", 5.0, 1995, 1),
      (6L, "2-HIGH", 6.0, 1995, 1)))
    val out = graft.queries.StatsQueries2.q461TukeyHsd(spark, dir).collect()
    assert(out.length === 1)
    val r = out(0)
    val hsd = 3.858 * math.sqrt(10000.0 / 2.0 * (1.0 / 3 + 1.0 / 3))
    assert(r.getAs[String]("g1") === "1-URGENT")
    assert(r.getAs[String]("g2") === "2-HIGH")
    assert(r.getAs[Double]("mean_diff_cents") === -300.0)
    assert(r.getAs[Double]("hsd_cents") === round6(hsd))
    // |diff| = 300 > HSD ~ 222.74 -> significant
    assert(r.getAs[Long]("significant") === 1L)
  }

  test("q463 Bass diffusion recovers the exact 3-point interpolating quadratic") {
    // Adoptions by month: [1, 2, 1] -> (np, n) points (0,1), (1,2), (3,1).
    // The OLS quadratic through 3 distinct points is the interpolant:
    // a = 1, b = 1.5, c = -0.5; then m = (-b - sqrt(b^2 - 4ac)) / (2c)
    // = 1.5 + sqrt(4.25), p = 1/m, q = b + p (discrete-Bass identities)
    val dir = ordersFixture(Seq(
      (1L, "1-URGENT", 1.0, 1995, 1),
      (2L, "1-URGENT", 1.0, 1995, 2), (3L, "1-URGENT", 1.0, 1995, 2),
      (4L, "1-URGENT", 1.0, 1995, 3)))
    val out = graft.queries.StatsQueries3.q463BassDiffusion(spark, dir).collect()(0)
    val m = 1.5 + math.sqrt(4.25)
    assert(out.getAs[Long]("n_months") === 3L)
    assert(out.getAs[Double]("a") === 1.0)
    assert(out.getAs[Double]("b") === 1.5)
    assert(out.getAs[Double]("c") === -0.5)
    assert(out.getAs[Double]("m_hat") === round6(m))
    assert(out.getAs[Double]("p_hat") === round6(1.0 / m))
    assert(out.getAs[Double]("q_hat") === round6(1.5 + 1.0 / m))
  }

  test("q468 Erlang-B/C at offered load 1 matches the closed recursion") {
    // 288 events in one day: a = 288 * 5 / 1440 = 1 exactly.
    // B(1) = 1/2, B(2) = 1/5, B(3) = 1/16 (hand recursion);
    // C(1) undefined (c = a), C(2) = 0.4/1.2 = 1/3, C(3) = 0.1875/2.0625
    val rows = (0 until 288).map(i => (0, 1 + i % 20, (i % 7).toLong, "view", 1.0))
    val out = graft.queries.StatsQueries3
      .q468ErlangStaffing(spark, fixture(rows)).collect()
    assert(out.length === 24)
    val byC = out.map(r => r.getAs[Long]("servers") -> r).toMap
    assert(byC(1L).getAs[Double]("offered_load") === 1.0)
    assert(byC(1L).getAs[Double]("erlang_b") === 0.5)
    assert(byC(1L).isNullAt(byC(1L).fieldIndex("p_wait"))) // queue unstable at c = a
    assert(byC(2L).getAs[Double]("erlang_b") === 0.2)
    assert(byC(2L).getAs[Double]("p_wait") === round6(0.4 / 1.2))
    assert(byC(3L).getAs[Double]("erlang_b") === 0.0625)
    assert(byC(3L).getAs[Double]("p_wait") === round6(0.1875 / 2.0625))
    // every row against the paper recursion, folded independently
    for (c <- 1 to 24) {
      var acc = 1.0
      for (k <- 1 to c) acc = acc / (k + acc) // a = 1
      assert(byC(c.toLong).getAs[Double]("erlang_b") === round6(acc), s"B($c)")
    }
  }

  test("q473 Weibull median-rank fit matches the re-derived Bernard-rank OLS") {
    // Durations: t=1 (2 users), t=2 (1 user); a censored user and a
    // same-day converter are filtered out. n = 3; Bernard mean ranks:
    // t=1 -> i2 = 3, 1-F = 22/34; t=2 -> i2 = 6, 1-F = 7/34.
    // x9/y9 snapped to the 1e-9 grid, weighted OLS re-derived here.
    val rows = Seq(
      (0, 1, 1L, "view", 1.0), (1, 1, 1L, "purchase", 1.0),
      (0, 1, 2L, "view", 1.0), (1, 1, 2L, "purchase", 1.0),
      (0, 1, 3L, "view", 1.0), (2, 1, 3L, "purchase", 1.0),
      (0, 1, 4L, "view", 1.0), // censored -> filtered
      (0, 1, 5L, "view", 1.0), (0, 2, 5L, "purchase", 1.0)) // same-day -> filtered
    val out = graft.queries.StatsQueries4.q473WeibullFit(spark, fixture(rows)).collect()(0)
    assert(out.getAs[Long]("n_uncensored") === 3L)
    assert(out.getAs[Long]("n_levels") === 2L)
    val x1 = snap9(math.log(1.0)) // = 0
    val x2 = snap9(math.log(2.0))
    val y1 = snap9(math.log(-math.log(22.0 / 34)))
    val y2 = snap9(math.log(-math.log(7.0 / 34)))
    val (sw, swx, swy) = (3.0, (2 * x1 + x2).toDouble, (2 * y1 + y2).toDouble)
    val swxy = (BigInt(2) * BigInt(x1) * BigInt(y1) + BigInt(x2) * BigInt(y2)).toDouble
    val swxx = (BigInt(2) * BigInt(x1) * BigInt(x1) + BigInt(x2) * BigInt(x2)).toDouble
    val shape = (sw * swxy - swx * swy) / (sw * swxx - swx * swx)
    val icept9 = (swy - shape * swx) / sw
    assert(out.getAs[Double]("weibull_shape") === round6(shape))
    assert(out.getAs[Double]("ln_scale_days") === round6((0.0 - icept9 / 1e9) / shape))
  }

  test("q447 drawdown + Sharpe matches the 3-day hand trace") {
    // Daily revenue cents [300, 100, 200] (x = [3, 1, 2] dollars):
    // detrended index dev = n*cum - (t+1)*total = [300, 0, 0],
    // running max 300 -> drawdowns [0, 300, 300]; trough = earliest max
    // (day 10001), peak = earliest dev == runmax <= trough (day 10000),
    // max_drawdown = 300/n = 100 cents. Sharpe: mean = 2, sample
    // variance = (3*14 - 36)/6 = 1 -> 2.0 exactly.
    val dir = ordersDaily(Seq((10000L, 3.0), (10001L, 1.0), (10002L, 2.0)))
    val out = graft.queries.StatsQueries.q447DrawdownSharpe(spark, dir).collect()(0)
    assert(out.getAs[Long]("n_days") === 3L)
    assert(out.getAs[Long]("max_drawdown_cents") === 100L)
    assert(out.getAs[Long]("peak_day") === 10000L)
    assert(out.getAs[Long]("trough_day") === 10001L)
    assert(out.getAs[Double]("mean_daily_dollars") === 2.0)
    assert(out.getAs[Double]("sharpe_daily") === 2.0)
  }

  test("q456 Wilson intervals match the published-z closed form per nation") {
    // ALPHA: 4 customers, 1 buyer (p = 1/4); BETA: 2 customers, 2 buyers
    // (p = 1 — the extreme-p case Wilson exists for); global g = 1/2.
    val dir = conversionFixture(
      nations = Seq(1 -> "ALPHA", 2 -> "BETA"),
      custs = Seq(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 1, 5L -> 2, 6L -> 2),
      buyers = Seq(1L -> 1.0, 5L -> 1.0, 6L -> 1.0))
    val out = graft.queries.StatsQueries2.q456WilsonIntervals(spark, dir).collect()
    val z = 1.959963984540054
    def wilson(k: Long, n: Long): (Double, Double) = { // unrounded bounds
      val p = k.toDouble / n
      val denom = 1.0 + z * z / n
      val center = (p + z * z / (2.0 * n)) / denom
      val half = z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n)) / denom
      (center - half, center + half)
    }
    val byN = out.map(r => r.getAs[String]("nation") -> r).toMap
    val (aLo, aHi) = wilson(1, 4)
    val (bLo, bHi) = wilson(2, 2)
    assert(byN("ALPHA").getAs[Double]("p_hat") === 0.25)
    assert((byN("ALPHA").getAs[Double]("wilson_lo"),
      byN("ALPHA").getAs[Double]("wilson_hi")) === ((round6(aLo), round6(aHi))))
    assert(byN("BETA").getAs[Double]("p_hat") === 1.0)
    assert((byN("BETA").getAs[Double]("wilson_lo"),
      byN("BETA").getAs[Double]("wilson_hi")) === ((round6(bLo), round6(bHi))))
    // the outside flag, re-derived from the same unrounded bounds on
    // the 1e-6 grid (not from intuition — Wilson at p = 1, n = 2 still
    // reaches below g = 1/2)
    val g = 0.5
    for ((nat, lo, hi) <- Seq(("ALPHA", aLo, aHi), ("BETA", bLo, bHi))) {
      val expect = if (math.floor(g * 1e6 + 0.5) < math.floor(lo * 1e6 + 0.5) ||
        math.floor(g * 1e6 + 0.5) > math.floor(hi * 1e6 + 0.5)) 1L else 0L
      assert(byN(nat).getAs[Long]("global_outside") === expect, nat)
    }
  }

  test("q457 James-Stein shrinkage matches the four-nation closed form") {
    // Four nations, one customer each, two orders per customer at
    // cents m -/+ 100 with means m = 1000/2000/3000/4000: every
    // nation's sample variance is exactly 2*100^2/(2-1) = 20000, so
    // vm = var/n = 10000 and vm_sum = 40000 (order-pinned over the
    // name-sorted census); grand mean 2500; ssk = 4*3e7 - 1e8 = 2e7;
    // c = 1 - (k-3)*vm_sum/ssk = 1 - 0.002.
    val dir = conversionFixture(
      nations = Seq(1 -> "ALPHA", 2 -> "BRAVO", 3 -> "CHARLIE", 4 -> "DELTA"),
      custs = Seq(1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4),
      buyers = Seq(1L -> 9.0, 1L -> 11.0, 2L -> 19.0, 2L -> 21.0,
        3L -> 29.0, 3L -> 31.0, 4L -> 39.0, 4L -> 41.0))
    val out = graft.queries.StatsQueries2.q457JamesStein(spark, dir).collect()
    val c = 1.0 - 1.0 * 40000.0 / 2.0e7
    def js(m: Long): Double = round6(2500.0 + c * (m - 2500.0))
    assert(out.map(r => (r.getAs[String]("nation"), r.getAs[Long]("n_orders"),
      r.getAs[Long]("raw_mean_cents"), r.getAs[Double]("js_mean_cents"),
      r.getAs[Double]("shrink_c"))).toSeq === Seq(
      ("ALPHA", 2L, 1000L, js(1000), round6(c)),
      ("BRAVO", 2L, 2000L, js(2000), round6(c)),
      ("CHARLIE", 2L, 3000L, js(3000), round6(c)),
      ("DELTA", 2L, 4000L, js(4000), round6(c))))
  }

  /** (custkey, mktsegment, acctbal) customers + (custkey, totalprice)
    * orders — the two-segment fixture for the gap decompositions.
    */
  private def segmentFixture(custs: Seq[(Long, String, Double)],
      orders: Seq[(Long, Double)]): String = {
    val dir = Files.createTempDirectory("stats_fix_").toString
    val cSchema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        custs.map { case (c, seg, bal) => Row(c, s"c$c", 0, bal, seg) }, 1),
      cSchema).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val oSchema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(orders.zipWithIndex.map { case ((c, v), i) =>
        Row(i.toLong, c, "O", v, new Timestamp(9000L * 86400000L), "1-URGENT")
      }, 1), oSchema).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  /** (orderkey, custkey) orders + (orderkey, suppkey) lineitem — the
    * bipartite co-purchase graph fixture for the graph estimators.
    */
  private def graphFixture(orders: Seq[(Long, Long)],
      lines: Seq[(Long, Long)]): String = {
    val dir = Files.createTempDirectory("stats_fix_").toString
    val oSchema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(orders.map { case (ok, c) =>
        Row(ok, c, "O", 1.0, new Timestamp(9000L * 86400000L), "1-URGENT")
      }, 1), oSchema).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val lSchema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(lines.zipWithIndex.map { case ((ok, s), i) =>
        Row(ok, 1L, s, i + 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
          new Timestamp(9000L * 86400000L))
      }, 1), lSchema).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  /** (doc_id, source, text) → a `documents` fixture dir. */
  private def documentsFixture(docs: Seq[(Long, String, String)]): String = {
    val dir = Files.createTempDirectory("stats_fix_").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(docs.map { case (id, src, txt) =>
        Row(id, txt, "en", src, txt.length.toLong)
      }, 1), schema).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q472 Goodman-Kruskal gamma matches the 5-order hand count") {
    // priorities g=1 at cents {100, 200, 500}, g=2 at {300, 400};
    // n = 5 distinct values -> type-1 decile thresholds
    // t1..t9 = (100,100,200,200,300,300,400,400,500), so dec(v) =
    // 1/3/5/7/9 for the five ascending cents. Cells: g1 -> {1,3,9},
    // g2 -> {5,7}. Cross pairs (g2 > g1): (1,5)C (1,7)C (3,5)C (3,7)C
    // (9,5)D (9,7)D -> conc 4, disc 2, gamma = 2/6.
    val dir = ordersFixture(Seq(
      (1L, "1-URGENT", 1.00, 2024, 1), (1L, "1-URGENT", 2.00, 2024, 1),
      (1L, "1-URGENT", 5.00, 2024, 1), (2L, "2-HIGH", 3.00, 2024, 1),
      (2L, "2-HIGH", 4.00, 2024, 1)))
    val out = graft.queries.StatsQueries4
      .q472GoodmanKruskalGamma(spark, dir).collect()(0)
    assert(out.getAs[Long]("n_orders") === 5L)
    assert(out.getAs[Long]("concordant") === 4L)
    assert(out.getAs[Long]("discordant") === 2L)
    assert(out.getAs[Double]("gamma") === round6(2.0 / 6.0))
  }

  test("q403 Bradley-Terry matches the two hand-unrolled MM iterations") {
    // One user, three days: a beats b (day 1), a beats c (day 2),
    // b beats c (day 3) -> n_ij = 1 for all pairs, W = (2, 1, 0).
    // MM iter 1 from gamma = 1e9: every term_u = 5e11, so
    // gamma = (2e9, 1e9, 0). Iter 2: a's terms 333333333333 + 5e11
    // -> ts 833333333333, gu_a = floor(2e12/ts * 1e9 + .5) = 2.4e9;
    // b's terms 333333333333 + 1e12 -> gu_b = 7.5e8; c stays 0.
    // sg = 3.15e9, k = 3: strengths 2.4*3/3.15, 0.75*3/3.15, 0.
    val rows = Seq(
      (1, 0, 1L, "a", 3.0), (1, 1, 1L, "b", 1.0),
      (2, 0, 1L, "a", 3.0), (2, 1, 1L, "c", 1.0),
      (3, 0, 1L, "b", 2.0), (3, 1, 1L, "c", 1.0))
    val out = graft.queries.MiscQueries
      .q403BradleyTerry(spark, fixture(rows)).collect()
    assert(out.map(r => (r.getAs[String]("event_type"), r.getAs[Long]("wins"),
      r.getAs[Long]("losses"), r.getAs[Double]("strength"),
      r.getAs[Long]("rnk"))).toSeq === Seq(
      ("a", 2L, 0L, round6(2.4 * 3 / 3.15), 1L),
      ("b", 1L, 1L, round6(0.75 * 3 / 3.15), 2L),
      ("c", 0L, 2L, 0.0, 3L)))
  }

  test("q477 Katz centrality matches the 4-node hand-traced walk counts") {
    // Bipartite graph c1-s1, c1-s2, c2-s1 (node ids 2,4 customers /
    // 3,5 suppliers): degrees (2,2,1,1); walk counts per length
    // p1..p5 traced by hand: node 2/3 -> (2,3,5,8,13), node 4/5 ->
    // (1,2,3,5,8); katz_q1024 = 256p1+64p2+16p3+4p4+p5 = 829 and 460.
    val dir = graphFixture(
      orders = Seq((1L, 1L), (2L, 2L)),
      lines = Seq((1L, 1L), (1L, 2L), (2L, 1L)))
    val out = graft.queries.StatsQueries5
      .q477KatzCentrality(spark, dir).collect()
    assert(out.map(r => (r.getAs[Long]("node"), r.getAs[Long]("degree"),
      r.getAs[Long]("katz_q1024"), r.getAs[Double]("katz"))).toSeq === Seq(
      (2L, 2L, 829L, round6(829.0 / 1024)),
      (3L, 2L, 829L, round6(829.0 / 1024)),
      (4L, 1L, 460L, round6(460.0 / 1024)),
      (5L, 1L, 460L, round6(460.0 / 1024))))
  }

  test("q475 Oaxaca-Blinder matches the exact two-point OLS decomposition") {
    // BUILDING: (bal 1.00, price 10.00), (3.00, 20.00) -> slope 5,
    // mean 1500c; MACHINERY: (1.00, 5.00), (2.00, 9.00) -> slope 4,
    // mean 700c. gap = 800; explained at the MACHINERY coefficients =
    // (200 - 150) * 4 = 200; unexplained 600. All moments exact.
    val dir = segmentFixture(
      custs = Seq((1L, "BUILDING", 1.0), (2L, "BUILDING", 3.0),
        (3L, "MACHINERY", 1.0), (4L, "MACHINERY", 2.0)),
      orders = Seq((1L, 10.0), (2L, 20.0), (3L, 5.0), (4L, 9.0)))
    val out = graft.queries.StatsQueries4
      .q475OaxacaBlinder(spark, dir).collect()(0)
    assert(out.getAs[Long]("n_building") === 2L)
    assert(out.getAs[Long]("n_machinery") === 2L)
    assert(out.getAs[Double]("beta_building") === 5.0)
    assert(out.getAs[Double]("beta_machinery") === 4.0)
    assert(out.getAs[Double]("mean_gap_cents") === 800.0)
    assert(out.getAs[Double]("explained_cents") === 200.0)
    assert(out.getAs[Double]("unexplained_cents") === 600.0)
  }

  test("q469 Burrows' delta matches the exact 3-source 2-word z-table") {
    // Sources A "x x x y", B "x y y y", C "x y": rel freqs of x are
    // (0.75, 0.25, 0.5) -> mean 0.5, sd exactly 0.25 (all dyadic), so
    // z_x = (1, -1, 0) and z_y = (-1, 1, 0). Deltas: mean |dz| over
    // the 2 words = 2.0 (A,B), 1.0 (A,C), 1.0 (B,C).
    val dir = documentsFixture(Seq(
      (1L, "A", "x x x y"), (2L, "B", "x y y y"), (3L, "C", "x y")))
    val out = graft.queries.StatsQueries3
      .q469BurrowsDelta(spark, dir).collect()
    assert(out.map(r => (r.getAs[String]("source_a"),
      r.getAs[String]("source_b"), r.getAs[Long]("n_words"),
      r.getAs[Double]("delta"))).toSeq === Seq(
      ("A", "B", 2L, 2.0), ("A", "C", 2L, 1.0), ("B", "C", 2L, 1.0)))
  }

  /** (orderkey, partkey, quantity) lineitem rows — the part co-purchase
    * fixture for the triangle census.
    */
  private def copurchaseFixture(lines: Seq[(Long, Long, Double)]): String = {
    val dir = Files.createTempDirectory("stats_fix_").toString
    val lSchema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(lines.zipWithIndex.map { case ((ok, pk, q), i) =>
        Row(ok, pk, 1L, i + 1, q, 1.0, 0.0, 0.0, "N", "O",
          new Timestamp(9000L * 86400000L))
      }, 1), lSchema).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("q160 triangle census matches the hand-counted diamond graph") {
    // Edges (one order per pair, qty 40): 1-2, 1-3, 2-3, 2-4, 3-4, 4-5
    // -> triangles {1,2,3} and {2,3,4}; per-node census 1:1, 2:2, 3:2,
    // 4:1, node 5 in none. A qty-10 noise line on part 9 must be
    // thinned out by the >= 40 filter. The min-degree orientation must
    // count each triangle exactly once, which is what this pins.
    val dir = copurchaseFixture(Seq(
      (1L, 1L, 40.0), (1L, 2L, 40.0), (2L, 1L, 40.0), (2L, 3L, 40.0),
      (3L, 2L, 40.0), (3L, 3L, 40.0), (4L, 2L, 40.0), (4L, 4L, 40.0),
      (5L, 3L, 40.0), (5L, 4L, 40.0), (6L, 4L, 40.0), (6L, 5L, 40.0),
      (1L, 9L, 10.0)))
    val out = graft.queries.PipelineQueries
      .q160TriangleCount(spark, dir).collect()
    assert(out.map(r => (r.getAs[Long]("node"),
      r.getAs[Long]("n_triangles"))).toSeq ===
      Seq((1L, 1L), (2L, 2L), (3L, 2L), (4L, 1L)))
  }

  test("q140 PageRank matches a scalar replay of the snapped trajectory") {
    // The 4-node bipartite graph (q477's fixture): in-degree <= 2
    // everywhere, so every contribution sum has at most two IEEE terms
    // and is order-invariant — the scalar single-threaded replay below
    // is an EXACT reference for the distributed join/agg assembly, no
    // tolerance. Hand anchors: iteration 1 gives (1.425, 1.425, 0.575,
    // 0.575) exactly; symmetry forces r(2)=r(3) and r(4)=r(5) forever.
    val dir = graphFixture(
      orders = Seq((1L, 1L), (2L, 2L)),
      lines = Seq((1L, 1L), (1L, 2L), (2L, 1L)))
    val out = graft.queries.PipelineQueries.q140Pagerank(spark, dir).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("rank")).toMap
    // adjacency: in-neighbors of each node, and out-degrees
    val inN = Map(2L -> Seq(3L, 5L), 3L -> Seq(2L, 4L), 4L -> Seq(3L), 5L -> Seq(2L))
    val deg = Map(2L -> 2.0, 3L -> 2.0, 4L -> 1.0, 5L -> 1.0)
    var r = Map(2L -> 1.0, 3L -> 1.0, 4L -> 1.0, 5L -> 1.0)
    (1 to 5).foreach { _ =>
      r = inN.map { case (v, us) =>
        v -> round6(0.15 + 0.85 * us.map(u => r(u) / deg(u)).sum)
      }
    }
    assert(out === r)
    assert(r(2L) === r(3L) && r(4L) === r(5L), "graph symmetry broken")
  }

  /** (custkey, mktsegment, nationkey) customers + (nationkey, regionkey)
    * nations + one order per active custkey → a fixture dir for the
    * survey-weighting family.
    */
  private def rakingFixture(custs: Seq[(Long, String, Long)],
      nations: Seq[(Long, Long)], active: Seq[Long]): String = {
    val dir = Files.createTempDirectory("stats_fix_").toString
    val cSchema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_mktsegment", StringType),
      StructField("c_nationkey", LongType)))
    spark.createDataFrame(spark.sparkContext.parallelize(
      custs.map { case (k, s, n) => Row(k, s, n) }, 2), cSchema)
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val nSchema = StructType(Seq(
      StructField("n_nationkey", LongType),
      StructField("n_regionkey", LongType)))
    spark.createDataFrame(spark.sparkContext.parallelize(
      nations.map { case (n, r) => Row(n, r) }, 1), nSchema)
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val oSchema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType)))
    spark.createDataFrame(spark.sparkContext.parallelize(
      active.zipWithIndex.map { case (c, i) => Row(i.toLong, c) }, 2), oSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("q410 IPF raking matches the hand-traced two-cycle trajectory") {
    // 2 segments × 2 regions; sample ns = [[1,2],[3,4]] (AUTOMOBILE
    // r0/r1, BUILDING r0/r1), base nb = [[2,3],[4,5]] → seg targets
    // (5, 9), region targets (6, 8). The grid recurrence (weights on
    // the 1e-9 BIGINT lattice, cell mass floor(ns·w/1e9·1e6+0.5),
    // update floor(w·target·1e6/mass+0.5)) traced by hand, every
    // intermediate written down:
    //   w1: seg masses (A 3000000, B 7000000) →
    //       A cells 1666666667, B cells 1285714286
    //   w2: reg masses (r0 5523810, r1 8476190) →
    //       (A,0) 1810344672, (A,1) 1573033797,
    //       (B,0) 1396551604, (B,1) 1213483215
    //   w3: seg masses (A 4956413, B 9043588) →
    //       (A,0) 1826264954, (A,1) 1586867153,
    //       (B,0) 1389820549, (B,1) 1207634507
    //   w4: reg masses (r0 5995727, r1 8004272) →
    //       (A,0) 1827566486, (A,1) 1586020218,
    //       (B,0) 1390811038, (B,1) 1206989974
    //   achieved seg masses: A 4999606 (ratio 0.999921), B 9000393
    //   (ratio 1.000044).
    // Both cycles do real work (w2≠w1, w3≠w2, w4≠w3), so a skipped or
    // reordered sweep anywhere flips the pin.
    val custs =
      (1 to 2).map(i => (i.toLong, "AUTOMOBILE", 0L)) ++
        (3 to 5).map(i => (i.toLong, "AUTOMOBILE", 1L)) ++
        (6 to 9).map(i => (i.toLong, "BUILDING", 0L)) ++
        (10 to 14).map(i => (i.toLong, "BUILDING", 1L))
    val active = Seq(1L, 3L, 4L, 6L, 7L, 8L, 10L, 11L, 12L, 13L)
    val dir = rakingFixture(custs, Seq((0L, 0L), (1L, 1L)), active)
    val out = graft.queries.MiscQueries.q410IpfRaking(spark, dir).collect()
      .map(r => (r.getAs[String]("seg"), r.getAs[Long]("reg"),
        r.getAs[Long]("n_sample"), r.getAs[Long]("n_base"),
        r.getAs[Double]("weight"), r.getAs[Double]("seg_margin_ratio"))).toSeq
    assert(out === Seq(
      ("AUTOMOBILE", 0L, 1L, 2L, 1.827566, 0.999921),
      ("AUTOMOBILE", 1L, 2L, 3L, 1.58602, 0.999921),
      ("BUILDING", 0L, 3L, 4L, 1.390811, 1.000044),
      ("BUILDING", 1L, 4L, 5L, 1.20699, 1.000044)))
  }

  test("q328 Markov removal effects match the hand-iterated 3-state chain") {
    // Journeys: u1 click→purchase, u2 view→purchase, u3 click→view
    // (no conversion). Transition census: START→{click:2, view:1};
    // click→{CONV:1, view:1}; view→{CONV:1, NULL:1}. Absorption on the
    // 1e-9 floor grid (Jacobi iteration, stable by round 3 of 20):
    //   full:   p(view) = 1e9 div 2 = 500000000
    //           p(click) = (1e9 + 500000000) div 2 = 750000000
    //           p(START) = (2·750000000 + 500000000) div 3 = 666666666
    //   -click: p(click) clamped 0 → p(START) = 500000000 div 3
    //           = 166666666
    //   -view:  p(view) clamped 0 → p(click) = 1e9 div 2 = 500000000,
    //           p(START) = 2·500000000 div 3 = 333333333
    //   -error / -signup: no such transitions → identical to full.
    // dt = 500000000 + 333333333 = 833333333;
    // shares: 5e14 div 833333333 = 600000, 333333333e6 div 833333333
    // = 399999 ppm; removal effects 0.75 and 0.5 exactly.
    val dir = fixture(Seq(
      (1, 0, 1L, "click", 0.0), (1, 1, 1L, "purchase", 5.0),
      (1, 0, 2L, "view", 0.0), (1, 1, 2L, "purchase", 3.0),
      (1, 0, 3L, "click", 0.0), (1, 1, 3L, "view", 0.0)))
    val out = graft.queries.MiscQueries.q328MarkovAttribution(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("channel"), r.getAs[Long]("p_removed_u"),
        r.getAs[Long]("p_full_u"), r.getAs[Double]("removal_effect"),
        r.getAs[Long]("share_ppm"))).toSeq
    assert(out === Seq(
      ("click", 166666666L, 666666666L, 0.75, 600000L),
      ("error", 666666666L, 666666666L, 0.0, 0L),
      ("signup", 666666666L, 666666666L, 0.0, 0L),
      ("view", 333333333L, 666666666L, 0.5, 399999L)))
  }

  test("q476 gains table matches the 10-user hand decile layout") {
    // Users 1..10 each purchase once on day 1 (score = 100·u cents,
    // all distinct); users 8..10 purchase again on day 20 (rel 19 ≥ 15
    // → buyers). n = 10 distinct scores → the type-1 decile cuts
    // t_k = the k-th smallest score ((k·10+9) div 10 = k), so user u
    // lands alone in decile u. nb = 3, nu = 10: lift in a buyer decile
    // = (1/1)/(3/10) = 3.333333; top-down cumulative gains
    // 333333 / 666666 / 1000000 ppm from decile 10 down.
    val rows = (1 to 10).map(u => (1, u % 5, u.toLong, "purchase", u.toDouble)) ++
      (8 to 10).map(u => (20, u % 5, u.toLong, "purchase", 1.0))
    val dir = fixture(rows)
    val out = graft.queries.StatsQueries4.q476GainsTable(spark, dir).collect()
      .map(r => (r.getAs[Long]("decile"), r.getAs[Long]("n_users"),
        r.getAs[Long]("n_buyers"), r.getAs[Long]("rate_ppm"),
        r.getAs[Long]("cum_gain_ppm"), r.getAs[Double]("lift"))).toSeq
    val expect = (1 to 7).map(d => (d.toLong, 1L, 0L, 0L, 1000000L, 0.0)) ++ Seq(
      (8L, 1L, 1L, 1000000L, 1000000L, 3.333333),
      (9L, 1L, 1L, 1000000L, 666666L, 3.333333),
      (10L, 1L, 1L, 1000000L, 333333L, 3.333333))
    assert(out === expect)
  }

  test("q322 Shapley attribution matches the hand-summed 2-channel lattice") {
    // Converted users: {click}, {view}, {click,view}; one non-converted
    // {click}. v(S) = converted users whose touch set ⊆ S:
    // v(∅)=0, v({c})=1, v({v})=1, v({c,v})=3; error/signup never touch,
    // so v(S) = v(S ∩ {c,v}). φ(click)·24 over the 8 subsets of
    // C∖click with weights |S|!(3−|S|)! = 6/2/2/6:
    //   ∅:6·1  {e}:2·1  {s}:2·1  {v}:2·2  {e,s}:2·1  {e,v}:2·2
    //   {s,v}:2·2  {e,s,v}:6·2  → 36; symmetry gives view 36,
    // error/signup 0 (null players). Σφ·24 = 72 = 24·(v_full − v_empty)
    // — the efficiency axiom checks itself. Shares 500000 ppm each.
    val dir = fixture(Seq(
      (1, 0, 1L, "click", 0.0), (1, 1, 1L, "purchase", 1.0),
      (1, 0, 2L, "view", 0.0), (1, 1, 2L, "purchase", 1.0),
      (1, 0, 3L, "click", 0.0), (1, 1, 3L, "view", 0.0),
      (1, 2, 3L, "purchase", 1.0),
      (1, 0, 4L, "click", 0.0)))
    val out = graft.queries.MiscQueries.q322ShapleyAttribution(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("channel"), r.getAs[Long]("phi_x24"),
        r.getAs[Double]("phi"), r.getAs[Long]("share_ppm"),
        r.getAs[Long]("v_full"), r.getAs[Long]("v_empty"))).toSeq
    assert(out === Seq(
      ("click", 36L, 1.5, 500000L, 3L, 0L),
      ("error", 0L, 0.0, 0L, 3L, 0L),
      ("signup", 0L, 0.0, 0L, 3L, 0L),
      ("view", 36L, 1.5, 500000L, 3L, 0L)))
  }

  test("q466 Cramer's V matches the 2x2 integer-margin table") {
    // o = [[10,20],[30,40]]: margins 30/70 and 40/60, n = 100 ->
    // e = [[12,18],[28,42]] exactly; chi2 terms 4/12, 4/18, 4/28, 4/42
    // snapped to 1e-9 each -> chi_e9 = 793650793
    val dir = lineitemFixture(Seq(
      ("A", "F", 10), ("A", "O", 20), ("B", "F", 30), ("B", "O", 40)))
    val out = graft.queries.StatsQueries3.q466CramersV(spark, dir).collect()
    assert(out.map(r => (r.getAs[String]("returnflag"),
      r.getAs[String]("linestatus"), r.getAs[Long]("observed"),
      r.getAs[Double]("expected"))).toSeq === Seq(
      ("A", "F", 10L, 12.0), ("A", "O", 20L, 18.0),
      ("B", "F", 30L, 28.0), ("B", "O", 40L, 42.0)))
    val chi2 = 793650793L / 1e9
    assert(out.forall(_.getAs[Double]("chi2") === round6(chi2)))
    assert(out.forall(_.getAs[Double]("cramers_v") === round6(math.sqrt(chi2 / 100))))
  }

  /** (partkey, shipYear, quantity, extendedprice) → a `lineitem`
    * fixture dir for the price-index estimators (q465 needs per-part
    * rows in BOTH 1995 and 1996 with distinct unit prices).
    */
  private def lineitemPriceFixture(rows: Seq[(Long, Int, Double, Double)]): String = {
    val dir = Files.createTempDirectory("stats_fix_").toString
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType)))
    val data = rows.zipWithIndex.map { case ((pk, y, q, e), i) =>
      val epochDay = java.time.LocalDate.of(y, 6, 15).toEpochDay
      Row(i.toLong, pk, 1L, 1, q, e, 0.0, 0.0, "N", "O",
        new Timestamp(epochDay * 86400000L))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("q471 Jonckheere-Terpstra matches the hand-counted pair table") {
    // Three ordered groups, two cents values each, NO ties anywhere:
    // g1 = {1, 3}, g2 = {2, 5}, g3 = {4, 6}. Pairwise ascending counts
    // U_12 = #{(1,2),(1,5),(3,5)} = 3, U_13 = 4 (all four pairs
    // ascend), U_23 = #{(2,4),(2,6),(5,6)} = 3 -> J = 10, jt2 = 2J =
    // 20. Moments: n = 6, n_g = 2 each -> e4 = n^2 - sum n_g^2 =
    // 36 - 12 = 24; var72 = n^2(2n+3) - sum n_g^2(2n_g+3) =
    // 540 - 84 = 456. z = (2*20 - 24) / (4*sqrt(456/72)) =
    // 4/sqrt(19/3) = 1.5894388... -> below the 1.959964 two-sided 5%
    // line, so trend = 0.
    val dir = ordersFixture(Seq(
      (1L, "1-URGENT", 0.01, 2024, 1), (1L, "1-URGENT", 0.03, 2024, 1),
      (2L, "2-HIGH", 0.02, 2024, 1), (2L, "2-HIGH", 0.05, 2024, 1),
      (3L, "3-MEDIUM", 0.04, 2024, 1), (3L, "3-MEDIUM", 0.06, 2024, 1)))
    val out = graft.queries.StatsQueries4
      .q471JonckheereTerpstra(spark, dir).collect()(0)
    assert(out.getAs[Long]("n_orders") === 6L)
    assert(out.getAs[Long]("jt2") === 20L)
    assert(out.getAs[Long]("e4") === 24L)
    assert(out.getAs[Double]("z") ===
      round6((2.0 * 20 - 24) / (4.0 * math.sqrt(456.0 / 72.0))))
    assert(out.getAs[Long]("trend") === 0L)
  }

  test("q474 two-way fixed effects matches the hand-demeaned 2x3 panel") {
    // Panel (user x day), cells (x views, y purchase cents):
    //   u1: d0 (1,100)  d1 (2,280)  d2 (0, 70)   row mean x 1, y 150
    //   u2: d0 (0, 60)  d1 (1,200)  d2 (2,250)   row mean x 1, y 170
    // col means x (0.5, 1.5, 1), y (80, 240, 160); grand x 1, y 160.
    // Within transform xt = x - xbar_u - xbar_d + xbar_g:
    //   xt = (0.5, 0.5, -1 | -0.5, -0.5, 1)
    //   yt = (30, 50, -80 | -30, -50, 80)       (every value exact in
    // IEEE: the x means are binary fractions, the y means integers).
    // Per-cell products xt*yt = (15, 25, 80, 15, 25, 80) -> sxy_e3 =
    // 240000; xt^2 -> sxx_e3 = 4*250 + 2*1000 = 3000; yt^2 -> syy_e3 =
    // 2*(900 + 2500 + 6400)*1000 = 19600000. beta = 240000/3000 = 80
    // cents per view exactly; within R^2 = 80*240000/19600000 = 48/49.
    val dir = fixture(Seq(
      (0, 0, 1L, "view", 0.0), (0, 1, 1L, "purchase", 1.00),
      (1, 0, 1L, "view", 0.0), (1, 1, 1L, "view", 0.0),
      (1, 2, 1L, "purchase", 2.80),
      (2, 0, 1L, "purchase", 0.70),
      (0, 2, 2L, "purchase", 0.60),
      (1, 3, 2L, "view", 0.0), (1, 4, 2L, "purchase", 2.00),
      (2, 1, 2L, "view", 0.0), (2, 2, 2L, "view", 0.0),
      (2, 3, 2L, "purchase", 2.50)))
    val out = graft.queries.StatsQueries4
      .q474TwoWayFixedEffects(spark, dir).collect()(0)
    assert(out.getAs[Long]("n_cells") === 6L)
    assert(out.getAs[Long]("n_users") === 2L)
    assert(out.getAs[Long]("n_days") === 3L)
    assert(out.getAs[Double]("beta_cents_per_view") === 80.0)
    assert(out.getAs[Double]("within_r2") === round6(48.0 / 49.0))
  }

  test("q465 price indices match the two-part hand basket") {
    // part 1: 1995 q0=10 e0=10000 (p 10.00) -> 1996 q1=8 e1=9600
    // (p 12.00); part 2: 1995 q0=5 e0=2500 (p 5.00) -> 1996 q1=10
    // e1=4000 (p 4.00). Revalued baskets (floor(+0.5) per part, exact
    // here): p1q0 = 9600*10/8 + 4000*5/10 = 12000 + 2000 = 14000;
    // p0q1 = 10000*8/10 + 2500*10/5 = 8000 + 5000 = 13000.
    // Laspeyres = 14000/12500 = 1.12, Paasche = 13600/13000,
    // Fisher = sqrt of their product.
    val dir = lineitemPriceFixture(Seq(
      (1L, 1995, 10.0, 100.00), (1L, 1996, 8.0, 96.00),
      (2L, 1995, 5.0, 25.00), (2L, 1996, 10.0, 40.00)))
    val out = graft.queries.StatsQueries3
      .q465PriceIndices(spark, dir).collect()(0)
    assert(out.getAs[Long]("n_common_parts") === 2L)
    assert(out.getAs[Long]("sum_p0q0") === 12500L)
    assert(out.getAs[Long]("sum_p1q1") === 13600L)
    assert(out.getAs[Long]("sum_p1q0") === 14000L)
    assert(out.getAs[Long]("sum_p0q1") === 13000L)
    assert(out.getAs[Double]("laspeyres") === round6(14000.0 / 12500.0))
    assert(out.getAs[Double]("paasche") === round6(13600.0 / 13000.0))
    assert(out.getAs[Double]("fisher") ===
      round6(math.sqrt((14000.0 / 12500.0) * (13600.0 / 13000.0))))
  }

  test("q481 Lin's CCC matches the hand-summed 4-day table") {
    // Daily (views x, clicks y): (1,2), (2,3), (3,3), (4,6) ->
    // n = 4, sx = 10, sy = 14, sxy = 41, sxx = 30, syy = 58.
    // ccc_num = 2(4*41 - 140) = 48; ccc_den = (120-100) + (232-196) +
    // (10-14)^2 = 20 + 36 + 16 = 72 -> CCC = 2/3. Pearson r =
    // 24/sqrt(20*36) = 2/sqrt(5).
    val dir = fixture(Seq(
      (0, 0, 1L, "view", 0.0), (0, 1, 1L, "click", 0.0),
      (0, 2, 1L, "click", 0.0),
      (1, 0, 1L, "view", 0.0), (1, 1, 1L, "view", 0.0),
      (1, 2, 1L, "click", 0.0), (1, 3, 1L, "click", 0.0),
      (1, 4, 1L, "click", 0.0),
      (2, 0, 1L, "view", 0.0), (2, 1, 1L, "view", 0.0),
      (2, 2, 1L, "view", 0.0), (2, 3, 1L, "click", 0.0),
      (2, 4, 1L, "click", 0.0), (2, 5, 1L, "click", 0.0),
      (3, 0, 1L, "view", 0.0), (3, 1, 1L, "view", 0.0),
      (3, 2, 1L, "view", 0.0), (3, 3, 1L, "view", 0.0),
      (3, 4, 1L, "click", 0.0), (3, 5, 1L, "click", 0.0),
      (3, 6, 1L, "click", 0.0), (3, 7, 1L, "click", 0.0),
      (3, 8, 1L, "click", 0.0), (3, 9, 1L, "click", 0.0)))
    val out = graft.queries.StatsQueries6.q481LinsCcc(spark, dir).collect()(0)
    assert(out.getAs[Long]("n_days") === 4L)
    assert(out.getAs[Long]("ccc_num") === 48L)
    assert(out.getAs[Long]("ccc_den") === 72L)
    assert(out.getAs[Double]("ccc") === round6(48.0 / 72.0))
    assert(out.getAs[Double]("pearson_r") === round6(24.0 / math.sqrt(720.0)))
  }
}
