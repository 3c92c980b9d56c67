package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

/** Unit edge cases for the as-of join operator beyond the q19/q65 oracle
  * rows: exact-timestamp ties are matches in both directions, rows with
  * no candidate get nulls (never dropped), and the tolerance gates the
  * CARRIED row's own timestamp.
  */
class AsOfJoinSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // key 1: right rows at 10:00 and 12:00; key 2: no right rows at all
  private lazy val left = Seq(
    (1L, ts("2030-01-01 09:00:00"), "before-any"),
    (1L, ts("2030-01-01 10:00:00"), "exact-tie"),
    (1L, ts("2030-01-01 11:00:00"), "between"),
    (1L, ts("2030-01-01 13:00:00"), "after-all"),
    (2L, ts("2030-01-01 11:00:00"), "keyless")
  ).toDF("k", "t", "label")

  private lazy val right = Seq(
    (1L, ts("2030-01-01 10:00:00"), "r10"),
    (1L, ts("2030-01-01 12:00:00"), "r12")
  ).toDF("k", "rt", "v")

  private def run(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.collect().map(r => r.getString(2) -> Option(r.getString(3)).orNull).toMap

  test("backward: latest right at-or-before; exact tie matches; no-earlier and no-key get null") {
    val got = run(AsOfJoin.backward(left, right,
      keys = Seq("k"), leftTime = "t", rightTime = "rt", carry = Map("v" -> "v")))
    assert(got == Map(
      "before-any" -> null, "exact-tie" -> "r10", "between" -> "r10",
      "after-all" -> "r12", "keyless" -> null))
  }

  test("forward: earliest right at-or-after; exact tie matches; no-later and no-key get null") {
    val got = run(AsOfJoin.forward(left, right,
      keys = Seq("k"), leftTime = "t", rightTime = "rt", carry = Map("v" -> "v")))
    assert(got == Map(
      "before-any" -> "r10", "exact-tie" -> "r10", "between" -> "r12",
      "after-all" -> null, "keyless" -> null))
  }

  test("tolerance nulls out matches whose own time falls outside the window") {
    val back = run(AsOfJoin.backward(left, right,
      keys = Seq("k"), leftTime = "t", rightTime = "rt", carry = Map("v" -> "v"),
      tolerance = Some("30 minutes")))
    // "between" (11:00) carried r10 (10:00) and "after-all" (13:00)
    // carried r12 (12:00) — both 60 min back, outside 30 min
    assert(back == Map(
      "before-any" -> null, "exact-tie" -> "r10", "between" -> null,
      "after-all" -> null, "keyless" -> null))
    val fwd = run(AsOfJoin.forward(left, right,
      keys = Seq("k"), leftTime = "t", rightTime = "rt", carry = Map("v" -> "v"),
      tolerance = Some("30 minutes")))
    // "before-any" (09:00) carried r10 (10:00) — 60 min ahead, outside 30 min
    assert(fwd == Map(
      "before-any" -> null, "exact-tie" -> "r10", "between" -> null,
      "after-all" -> null, "keyless" -> null))
  }

  test("a null value on the NEAREST right row is the match — never an older row's value") {
    // merge_asof matches ROWS, not columns: the nearest right row at
    // 12:00 carries v=null, and that null must be the answer for a left
    // row at 12:30 — independently-carried columns with ignoreNulls
    // would fall through to r10's 'x' from 08:00 (and, with a
    // tolerance, gate it against 12:00's timestamp: wrong twice).
    val r = Seq(
      (1L, ts("2030-01-01 08:00:00"), Some("x")),
      (1L, ts("2030-01-01 12:00:00"), None)
    ).toDF("k", "rt", "v")
    val l = Seq((1L, ts("2030-01-01 12:30:00"), "probe")).toDF("k", "t", "label")
    val plain = run(AsOfJoin.backward(l, r, Seq("k"), "t", "rt", Map("v" -> "v")))
    assert(plain == Map("probe" -> null),
      s"nearest row's null was bypassed: $plain")
    val tol = run(AsOfJoin.backward(l, r, Seq("k"), "t", "rt", Map("v" -> "v"),
      tolerance = Some("1 hour")))
    assert(tol == Map("probe" -> null),
      s"out-of-tolerance value admitted through the nearest row's timestamp: $tol")
  }

  test("row count is always exactly the left side (as-of never duplicates or drops)") {
    Seq(
      AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Map("v" -> "v")),
      AsOfJoin.forward(left, right, Seq("k"), "t", "rt", Map("v" -> "v"))
    ).foreach(df => assert(df.count() == left.count()))
  }
}
