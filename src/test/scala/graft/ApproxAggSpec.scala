package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Correctness evidence for q08_approx, which by design has no SQL oracle
  * (HLL++ and quantile-sketch results are engine-specific): bound the
  * sketches against the exact values on sf0.01.
  *
  * Tolerances: approx_count_distinct is called with an explicit
  * rsd = 0.02, so the 5% assertion is a 2.5-sigma bound (Spark's
  * DEFAULT rsd is 0.05 — asserting 5% against the default would be only
  * ~1 sigma); percentile_approx with accuracy 10000 on ~60k rows is
  * near-exact (we assert the approx median lies between the exact p45
  * and p55 — rank error ≤ 1/accuracy).
  */
class ApproxAggSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf001

  test("approx_count_distinct within 5% of exact countDistinct per group") {
    val rows = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx").toDouble
      val exact = r.getAs[Long]("exact").toDouble
      val relErr = math.abs(approx - exact) / exact
      assert(relErr < 0.05,
        s"group ${r.get(0)}: approx=$approx exact=$exact relErr=$relErr")
    }
  }

  test("percentile_approx(0.5, 10000) lies within exact p45..p55 per group") {
    val rows = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("approx_median"),
        expr("percentile(l_quantity, 0.45)").as("p45"),
        expr("percentile(l_quantity, 0.55)").as("p55"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[Double]("approx_median")
      val lo = r.getAs[Double]("p45")
      val hi = r.getAs[Double]("p55")
      assert(m >= lo && m <= hi,
        s"group ${r.get(0)}: approx median $m outside [$lo, $hi]")
    }
  }
}
