package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The batch DSv2 source's three scan-narrowing contracts, asserted
  * against what Spark actually planned (q279's scaladoc claims, frozen
  * as tests): filter pushdown reaches the source, non-overlapping
  * partitions are pruned at PLAN time, and column pruning shrinks the
  * reader schema. Correctness of the generated rows is cross-checked
  * against `spark.range` — the same blind statement the DuckDB oracle
  * makes with `range()`.
  */
class SeqSourceSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def seq(rows: Long = 2000000L, slices: Int = 64) = spark.read
    .format(classOf[graft.sources.seq.SeqSourceProvider].getName)
    .option("rows", rows.toString).option("slices", slices.toString).load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec = {
    df.collect()
    // AQE hides the scan behind QueryStageExec boundaries — recurse
    // through them (the PlanGuards.kids device)
    def find(p: org.apache.spark.sql.execution.SparkPlan): Option[BatchScanExec] = p match {
      case b: BatchScanExec          => Some(b)
      case a: AdaptiveSparkPlanExec  => find(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => find(q.plan)
      case other => other.children.iterator.flatMap(find(_).iterator).nextOption()
    }
    find(df.queryExecution.executedPlan)
      .getOrElse(fail(s"no BatchScanExec in:\n${df.queryExecution.executedPlan}"))
  }

  test("id bounds push into the scan and PRUNE non-overlapping partitions") {
    val full = scanOf(seq().groupBy("bucket").count())
    assert(full.inputRDD.getNumPartitions == 64)
    val pruned = scanOf(seq()
      .filter(col("id") >= 250000L && col("id") < 750000L)
      .groupBy("bucket").count())
    // 2M rows / 64 slices = 31250 per slice; [250000, 750000) overlaps
    // exactly slices 8..23 → 16 planned partitions
    assert(pruned.inputRDD.getNumPartitions == 16,
      s"expected 16 pruned partitions, got ${pruned.inputRDD.getNumPartitions}")
    assert(pruned.scan.description().contains("pushed=[250000, 750000)"),
      pruned.scan.description())
  }

  test("column pruning narrows the reader schema to the projection") {
    val scan = scanOf(seq().select("bucket").groupBy("bucket").count())
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("bucket"),
      scan.scan.readSchema().treeString)
  }

  test("generated rows match the blind range() statement") {
    import spark.implicits._
    val got = seq(rows = 10000L, slices = 7)
      .agg(count(lit(1)), sum("id"), sum("bucket"), sum("h"))
      .as[(Long, Long, Long, Long)].head()
    val want = spark.range(10000)
      .select(col("id"), pmod(col("id"), lit(97L)).as("bucket"),
        pmod(col("id") * 2654435761L, lit(2147483648L)).as("h"))
      .agg(count(lit(1)), sum("id"), sum("bucket"), sum("h"))
      .as[(Long, Long, Long, Long)].head()
    assert(got == want)
  }

  test("a residual (non-id) filter still evaluates correctly above the scan") {
    val n = seq(rows = 100000L)
      .filter(col("id") < 50000L && col("bucket") === 3L).count()
    // ids ≡ 3 (mod 97) in [0, 50000): ceil((50000 - 3) / 97)
    assert(n == (50000L - 3 + 96) / 97)
  }
}
