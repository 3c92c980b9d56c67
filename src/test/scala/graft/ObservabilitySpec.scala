package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline observability — the engine-side equivalent of the
  * reference's operational counters (its connector loop logs
  * received/published message counts as it runs): `observe()` attaches
  * named aggregates to a plan and reports them OUT-OF-BAND per
  * action/epoch, so operators get throughput/quality counters without a
  * second pass over the data or a separate counting query.
  */
class ObservabilitySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("batch observe() reports row/revenue counters without a second scan") {
    val obs = Observation("orders_stats")
    val df = Tables.orders(spark, SparkTestSession.sf0001)
      .observe(obs,
        count(lit(1)).as("rows"),
        round(sum("o_totalprice"), 2).as("revenue"))
      .filter(col("o_orderstatus") === "F")
    val kept = df.count()
    val metrics = obs.get
    // the observed counters cover the FULL scan (observe sits below the
    // filter), while the action returned only the filtered subset
    assert(metrics("rows").asInstanceOf[Long] > kept)
    assert(metrics("revenue").asInstanceOf[Double] > 0.0)
  }

  test("streaming observe() surfaces per-epoch metrics in query progress") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val df = input.toDF().toDF("k", "v")
      .observe("epoch_stats", count(lit(1)).as("n"), sum("v").as("sum_v"))
    input.addData((1L, 1.5), (2L, 2.5))
    val q = df.writeStream.format("noop").start()
    q.processAllAvailable()
    input.addData((3L, 4.0))
    q.processAllAvailable()
    q.stop()
    val observed = q.recentProgress.flatMap(p =>
      Option(p.observedMetrics.get("epoch_stats")))
    assert(observed.nonEmpty, "no epoch carried observed metrics")
    val totalN = observed.map(_.getAs[Long]("n")).sum
    val totalV = observed.map(_.getAs[Double]("sum_v")).sum
    assert(totalN == 3L, s"expected 3 observed rows, got $totalN")
    assert(math.abs(totalV - 8.0) < 1e-9, s"expected sum 8.0, got $totalV")
  }
}
