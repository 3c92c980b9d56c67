package graft

import graft.operators.ChangeCapture
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CDC merge/diff semantics and their inverse law.
  *
  * The load-bearing property is the roundtrip: for a MINIMAL change set
  * (no 'U' that rewrites a value to itself, ops keyed uniquely),
  * `diff(base, merge(base, chg))` must reproduce `chg` exactly — that is
  * what lets an incremental consumer recompute downstream state from
  * snapshots alone. Plus the edge semantics: null values (compared with
  * null-safe equality), delete-then-reinsert across generations, and
  * empty change sets.
  */
class ChangeCaptureSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def snap(rows: (Long, java.lang.Double)*): DataFrame =
    rows.toDF("k", "v")

  private def chg(rows: (Long, java.lang.Double, String)*): DataFrame =
    rows.toDF("k", "v", "op")

  private def asSet(df: DataFrame): Set[(Long, Option[Double], String)] =
    df.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getDouble(1)),
      r.getString(2))).toSet

  private def snapSet(df: DataFrame): Set[(Long, Option[Double])] =
    df.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet

  test("merge applies insert, update, delete; untouched rows pass through") {
    val base = snap(1L -> 10.0, 2L -> 20.0, 3L -> 30.0)
    val c = chg((2L, 25.0, "U"), (3L, null, "D"), (4L, 40.0, "I"))
    val next = ChangeCapture.merge(base, c, "k", "v")
    assert(snapSet(next) === Set(
      1L -> Some(10.0), 2L -> Some(25.0), 4L -> Some(40.0)))
  }

  test("diff recovers the minimal change set (roundtrip inverse law)") {
    val base = snap(1L -> 10.0, 2L -> 20.0, 3L -> 30.0, 5L -> null)
    val c = chg((2L, 25.0, "U"), (3L, 33.0, "D"), (4L, 40.0, "I"),
      (5L, 55.0, "U"))
    // diff emits D with the DELETED value — align the input for equality
    val expected = Set[(Long, Option[Double], String)](
      (2L, Some(25.0), "U"), (3L, Some(30.0), "D"), (4L, Some(40.0), "I"),
      (5L, Some(55.0), "U"))
    val next = ChangeCapture.merge(base, c, "k", "v")
    assert(asSet(ChangeCapture.diff(base, next, "k", "v")) === expected)
  }

  test("diff is null-safe: null→value and value→null are updates, null→null is not") {
    val prev = snap(1L -> null, 2L -> 20.0, 3L -> null)
    val next = snap(1L -> 11.0, 2L -> null, 3L -> null)
    assert(asSet(ChangeCapture.diff(prev, next, "k", "v")) === Set(
      (1L, Some(11.0), "U"), (2L, None, "U")))
  }

  test("empty change set is identity; diff of identical snapshots is empty") {
    val base = snap(1L -> 10.0, 2L -> 20.0)
    val next = ChangeCapture.merge(base, chg(), "k", "v")
    assert(snapSet(next) === snapSet(base))
    assert(ChangeCapture.diff(base, next, "k", "v").isEmpty)
  }

  test("self-rewriting update is applied by merge but absent from diff (minimality)") {
    val base = snap(1L -> 10.0)
    val next = ChangeCapture.merge(base, chg((1L, 10.0, "U")), "k", "v")
    assert(snapSet(next) === Set(1L -> Some(10.0)))
    assert(ChangeCapture.diff(base, next, "k", "v").isEmpty)
  }

  test("q238 invariance: chunked CDC apply equals the one-shot merge at 2 and 5 chunks") {
    // the batch-count-invariance claim q238's driver gate rests on:
    // changeRowsOf is row-local and yields at most one op per key, so
    // folding merge over ANY disjoint slicing of the order rows lands
    // on the identical snapshot
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.orders(spark, dir)
    val base = graft.queries.LakehouseQueries.baseSnap(spark, dir)
    val oneShot = ChangeCapture.merge(base,
      graft.queries.LakehouseQueries.changeRowsOf(orders),
      "o_orderkey", "o_totalprice")
    def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val want = canon(oneShot)
    for (n <- Seq(2, 5)) {
      var snap = base
      for (c <- 0 until n) {
        val slice = orders.filter(pmod(col("o_orderkey"), lit(n)) === c)
        snap = ChangeCapture.merge(snap,
          graft.queries.LakehouseQueries.changeRowsOf(slice),
          "o_orderkey", "o_totalprice").localCheckpoint()
      }
      assert(canon(snap) == want, s"chunked apply diverged at $n chunks")
    }
  }

  test("fixture roundtrip at sf0.001: diff(base, merge(base, chg)) over orders") {
    val dir = "/root/testdata/sf0.001"
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1997-01-01").cast("date"))
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
    val slot = substring(md5(col("k").cast("string")), 1, 1)
    // minimal by construction: updates genuinely change the value
    val c = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("date"))
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"),
        lit("I").as("op"))
      .unionAll(base.filter(slot.isin("0", "1"))
        .filter(round(col("v"), 0) =!= col("v"))
        .select(col("k"), round(col("v"), 0).as("v"), lit("U").as("op")))
      .unionAll(base.filter(slot === "4")
        .select(col("k"), col("v"), lit("D").as("op")))
    val next = ChangeCapture.merge(base, c, "k", "v")
    val recovered = ChangeCapture.diff(base, next, "k", "v")
    assert(asSet(recovered) === asSet(c))
    assert(recovered.count() > 0)
  }
}
