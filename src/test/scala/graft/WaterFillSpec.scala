package graft

import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q168's allocation laws, checked independently of the oracle (which
  * replays the same algorithm and so cannot catch a shared spec bug):
  * the water-filling output must (1) never exceed any stratum's cap,
  * (2) sum EXACTLY to the integer budget ⌊total·55/100⌋, and (3) give
  * every unsaturated stratum one of at most two adjacent values (base /
  * base+1) — the evenness property that defines water-filling.
  */
class WaterFillSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("q168 allocation: capped, budget-exact, and even across unsaturated strata") {
    Seq(SparkTestSession.sf0001, SparkTestSession.sf001).foreach { dir =>
      val out = PipelineQueries.q168WaterFill(spark, dir)
        .select("cap", "alloc", "saturated").collect()
      val caps = out.map(_.getLong(0))
      val allocs = out.map(_.getLong(1))
      assert(allocs.zip(caps).forall { case (a, c) => a <= c && a >= 0 },
        s"$dir: an allocation exceeds its cap or is negative")
      val budget = caps.sum * 55 / 100
      assert(allocs.sum == budget,
        s"$dir: allocations sum to ${allocs.sum}, budget is $budget")
      val unsat = out.filter(_.getInt(2) == 0).map(_.getLong(1))
      assert(unsat.distinct.length <= 2 &&
        (unsat.isEmpty || unsat.max - unsat.min <= 1),
        s"$dir: unsaturated allocations not within one unit: ${unsat.distinct.sorted.mkString(",")}")
    }
  }
}
