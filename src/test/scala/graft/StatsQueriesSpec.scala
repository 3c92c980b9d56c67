package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The StatsQueries* families against HAND-COMPUTED fixtures — evidence
  * independent of the DuckDB oracle mirror (which, being same-text by
  * design, cannot catch a formula that is wrong the same way on both
  * sides). Each test writes a tiny synthetic `events` table whose
  * statistic is computable on paper and pins the engine's output to it:
  * Kendall τ-b (known concordance table), Mann–Kendall + Sen (strictly
  * increasing series), Cochran's Q (3×4 textbook table), Kaplan–Meier /
  * Nelson–Aalen (3-subject table recomputed from first principles),
  * time-decay attribution (two touches, exact 2^k shares), and
  * geometric adstock (two-day closed form).
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
}
