package graft

import graft.operators.BinnedRangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Binned interval join: result identity with the raw theta join,
  * exactly-once pairing (the property the bin explode must not break),
  * and edge intervals that span several bins / negative values.
  */
class BinnedRangeJoinSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("binned join equals the raw BETWEEN join on fixture data") {
    val l = Tables.lineitem(spark, SparkTestSession.sf0001)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity".cast("long").as("qty"))
    val p = Tables.part(spark, SparkTestSession.sf0001)
      .select($"p_partkey", ($"p_size" - 2).cast("long").as("lo"),
        ($"p_size" + 2).cast("long").as("hi"))
    val raw = l.join(p, $"qty" >= $"lo" && $"qty" <= $"hi")
      .select("l_orderkey", "l_linenumber", "p_partkey")
    val binned = BinnedRangeJoin.inner(l, p, "qty", "lo", "hi", binWidth = 5)
      .select("l_orderkey", "l_linenumber", "p_partkey")
    assert(raw.count() == binned.count(), "pair count diverged")
    assert(raw.exceptAll(binned).isEmpty && binned.exceptAll(raw).isEmpty,
      "pair sets diverged")
  }

  test("each matching pair appears exactly once even when intervals span many bins") {
    // intervals 0..9 (width 10 over binWidth 3 → 4 bins), negatives too
    val l = Seq(-5L, -1L, 0L, 3L, 7L, 9L, 12L).toDF("v").withColumn("lid", monotonically_increasing_id())
    val r = Seq((-6L, 0L, "a"), (0L, 9L, "b"), (8L, 14L, "c")).toDF("lo", "hi", "tag")
    val got = BinnedRangeJoin.inner(l, r, "v", "lo", "hi", binWidth = 3)
      .groupBy("v", "tag").count()
    assert(got.filter($"count" =!= 1).isEmpty, "a pair was duplicated")
    val want = for {
      v <- Seq(-5L, -1L, 0L, 3L, 7L, 9L, 12L)
      (lo, hi, tag) <- Seq((-6L, 0L, "a"), (0L, 9L, "b"), (8L, 14L, "c"))
      if v >= lo && v <= hi
    } yield (v, tag)
    val gotPairs = got.select("v", "tag").collect()
      .map(x => (x.getLong(0), x.getString(1))).toSet
    assert(gotPairs == want.toSet, s"match set diverged: $gotPairs vs ${want.toSet}")
  }
}
