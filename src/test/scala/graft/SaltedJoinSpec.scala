package graft

import graft.operators.SaltedJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted skew join: identical results to the plain join, with the hot
  * key's rows actually spread across salt buckets.
  */
class SaltedJoinSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("salted join equals the plain join on a skewed fact table") {
    val l = Tables.lineitem(spark, SparkTestSession.sf0001)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    val p = Tables.part(spark, SparkTestSession.sf0001)
      .select("p_partkey", "p_brand")
    val plain = l.join(p, l("l_partkey") === p("p_partkey"))
      .select("l_orderkey", "l_linenumber", "p_brand")
    val salted = SaltedJoin.inner(
      l.withColumnRenamed("l_partkey", "p_partkey"), p,
      key = "p_partkey", saltFrom = "l_orderkey", factor = 8)
      .select("l_orderkey", "l_linenumber", "p_brand")
    val a = plain.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val b = salted.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(a == b, s"salted join diverged: ${a.size} vs ${b.size} rows")
  }

  test("salt actually spreads a hot key over multiple buckets") {
    import spark.implicits._
    // one key carries 10k rows — the straggler shape
    val hot = spark.range(10000).select(lit(1L).as("k"), $"id".as(("payload")))
    val dim = Seq((1L, "only")).toDF("k", "v")
    val salted = hot.withColumn("_salt", pmod(hash($"payload"), lit(8)))
    val buckets = salted.groupBy("_salt").count().collect()
    assert(buckets.length == 8, s"expected 8 salt buckets, got ${buckets.length}")
    assert(buckets.forall(_.getLong(1) > 500), "salt distribution badly skewed")
    // and the join still returns every row exactly once
    val joined = SaltedJoin.inner(hot, dim, "k", "payload", 8)
    assert(joined.count() == 10000)
  }
}
