package graft

import graft.operators.ZOrder
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: the point is what lands in parquet footers — per-file
  * min/max boxes. The spec writes the SAME events twice (linear layout on
  * user_id vs z-order on (user_id, value)), then measures, per file, the
  * (user_id, value) bounding box and counts how many files a conjunctive
  * range predicate could prune. Z-order must prune strictly more files
  * than the linear layout on the off-axis dimension.
  *
  * Both formulations are covered: the test-exact `percent_rank` grid
  * (single-partition sort — fine for a spec) and `clusterAtScale`, the
  * production path whose grids come from `approxQuantile` boundaries
  * with no global window; both must beat the linear layout.
  */
class ZOrderSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val nFiles = 16

  /** Per-output-file bounding boxes of (user_id, value), read back via
    * input_file_name — what parquet stats would give a pruning reader.
    */
  private def boxes(path: String): Seq[(Long, Long, Double, Double)] =
    spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg(min("user_id").as("ulo"), max("user_id").as("uhi"),
        min("value").as("vlo"), max("value").as("vhi"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toSeq

  private def prunable(bs: Seq[(Long, Long, Double, Double)],
      u: (Long, Long), v: (Double, Double)): Int =
    bs.count { case (ulo, uhi, vlo, vhi) =>
      uhi < u._1 || ulo > u._2 || vhi < v._1 || vlo > v._2
    }

  test("z-order layout prunes conjunctive range boxes the linear layout cannot") {
    val ev = Tables.events(spark, SparkTestSession.sf001)
      .select("user_id", "value", "event_id")
    val base = java.nio.file.Files.createTempDirectory("zorder").toString

    ZOrder.cluster(ev, "user_id", "value", nFiles)
      .write.mode(SaveMode.Overwrite).parquet(s"$base/z")
    ev.repartitionByRange(nFiles, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode(SaveMode.Overwrite).parquet(s"$base/linear")

    val zb = boxes(s"$base/z")
    val lb = boxes(s"$base/linear")
    // repartitionByRange samples with an RDD-id-dependent seed, so exact
    // file counts/boundaries wobble run-to-run — assertions below use
    // multi-file margins, not boundary-exact counts
    assert(zb.size >= nFiles / 2 && lb.size >= nFiles / 2, "files missing")

    // a predicate selective in BOTH dims: middle half of users × top
    // values — chosen so the z-layout's expected pruning edge is several
    // files wide (a 1-file margin flips on partitioner sampling noise)
    val uband = (40L, 110L)
    val vband = (200.0, 500.0)
    val zPruned = prunable(zb, uband, vband)
    val lPruned = prunable(lb, uband, vband)
    // linear layout prunes on user_id only; z-order must also cut files
    // by the value dimension
    assert(zPruned > lPruned,
      s"z-order pruned $zPruned/${zb.size} vs linear $lPruned/${lb.size}")

    // and a value-ONLY predicate, where the linear layout is blind
    val zOnlyV = prunable(zb, (Long.MinValue, Long.MaxValue), vband)
    val lOnlyV = prunable(lb, (Long.MinValue, Long.MaxValue), vband)
    assert(zOnlyV > lOnlyV,
      s"value-only: z-order pruned $zOnlyV/${zb.size} vs linear $lOnlyV/${lb.size}")
  }

  test("the approxQuantile production path prunes like the exact-rank path") {
    val ev = Tables.events(spark, SparkTestSession.sf001)
      .select("user_id", "value", "event_id")
    val base = java.nio.file.Files.createTempDirectory("zorder_scale").toString
    ZOrder.clusterAtScale(ev, "user_id", "value", nFiles)
      .write.mode(SaveMode.Overwrite).parquet(s"$base/z")
    ev.repartitionByRange(nFiles, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode(SaveMode.Overwrite).parquet(s"$base/linear")
    val zb = boxes(s"$base/z")
    val lb = boxes(s"$base/linear")
    val vband = (200.0, 500.0)
    assert(prunable(zb, (40L, 110L), vband) > prunable(lb, (40L, 110L), vband),
      "quantile-grid z-order lost the conjunctive pruning edge")
    assert(prunable(zb, (Long.MinValue, Long.MaxValue), vband) >
      prunable(lb, (Long.MinValue, Long.MaxValue), vband),
      "quantile-grid z-order lost the off-axis pruning edge")
  }

  test("clusterAtScale write path: a conjunctive range read measurably skips data (scan metrics)") {
    // the data-skipping claim MEASURED, not simulated: write the same
    // events z-clustered and linearly, read each back under the same
    // conjunctive (user_id, value) range predicate with parquet
    // predicate pushdown on, and compare what the SCAN ITSELF emitted
    // (FileSourceScanExec numOutputRows — rows surviving row-group/page
    // stat pruning, before the post-scan Filter). The z-layout's tight
    // two-dimensional boxes must let the reader skip strictly more data
    // than the one-dimensional layout, and must skip SOMETHING in
    // absolute terms.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val ev = Tables.events(spark, SparkTestSession.sf001)
      .select("user_id", "value", "event_id")
    val total = ev.count()
    val base = java.nio.file.Files.createTempDirectory("zorder_skip").toString
    ZOrder.clusterAtScale(ev, "user_id", "value", nFiles)
      .write.mode(SaveMode.Overwrite).parquet(s"$base/z")
    ev.repartitionByRange(nFiles, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode(SaveMode.Overwrite).parquet(s"$base/linear")
    def scanRows(path: String): Long = {
      val df = spark.read.parquet(path)
        .filter(col("user_id").between(40L, 110L) && col("value").between(200.0, 500.0))
      df.collect()
      def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
        (p match {
          case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
          case q: QueryStageExec        => scans(q.plan)
          case s: FileSourceScanExec    => Seq(s)
          case other                    => other.children.flatMap(scans)
        })
      val ss = scans(df.queryExecution.executedPlan)
      assert(ss.nonEmpty, "no FileSourceScanExec found")
      ss.map(_.metrics("numOutputRows").value).sum
    }
    val zRows = scanRows(s"$base/z")
    val lRows = scanRows(s"$base/linear")
    assert(zRows < total, s"z-layout scan skipped nothing ($zRows of $total)")
    assert(zRows < lRows,
      s"z-layout scan emitted $zRows rows vs linear $lRows — no measured skipping edge")
  }

  test("withZValueExactAtScale is bit-identical to the percent_rank reference formulation") {
    // the q138-gated path: the distributed census-rank device must equal
    // the single-partition window formulation EXACTLY — same competition
    // rank under ties, same IEEE divide-then-scale chain — at any bucket
    // count (bucketing only re-shards the census, never the math)
    val ev = Tables.events(spark, SparkTestSession.sf0001)
      .select("event_id", "user_id", "value")
    def snap(df: DataFrame): Map[Long, Long] =
      df.select("event_id", "zval").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = snap(ZOrder.withZValue(ev, "user_id", "value"))
    for (buckets <- Seq(1, 2, 7, 32)) {
      val got = snap(ZOrder.withZValueExactAtScale(ev, "user_id", "value", buckets))
      assert(got == want, s"census-rank grid diverged at buckets=$buckets")
    }
    // tie-heavy + constant axis: user_id has ~15 distinct values over 1000
    // rows already; force the degenerate constant second axis too
    val const = ev.withColumn("k", lit(5L))
    val wantC = snap(ZOrder.withZValue(const, "user_id", "k"))
    assert(snap(ZOrder.withZValueExactAtScale(const, "user_id", "k")) == wantC,
      "constant-axis grid diverged")
  }

  test("interleave16 is monotone in each coordinate on a fixed other coordinate") {
    val df = (0L until 8L).map(i => (i * 1000, 37L)).toDF("x", "y")
      .select(ZOrder.interleave16(col("x") % 65536, col("y")).as("z"))
    val zs = df.collect().map(_.getLong(0)).toSeq
    assert(zs == zs.sorted, s"z not monotone in x: $zs")
  }

  test("clusterAtScale survives degenerate columns: all-null, constant, and empty input") {
    // approxQuantile yields an empty (all-null) or single-value
    // (constant) boundary set — the write path must degrade to a
    // one-cell grid on that axis, never emit malformed plans
    val nulls = Seq.tabulate(50)(i => (i.toLong, Option.empty[Double]))
      .toDF("user_id", "value")
    val outN = ZOrder.clusterAtScale(nulls, "user_id", "value", 4).collect()
    assert(outN.length == 50, "rows lost on an all-null axis")
    val const = Seq.tabulate(50)(i => (i.toLong, 7.0)).toDF("user_id", "value")
    assert(ZOrder.clusterAtScale(const, "user_id", "value", 4).count() == 50)
    val empty = Seq.empty[(Long, Double)].toDF("user_id", "value")
    assert(ZOrder.clusterAtScale(empty, "user_id", "value", 4).count() == 0)
  }

  test("clusterAtScale handles quotable column names (spaces, dots, backticks)") {
    // the declared 100 TB write path must not be breakable by a legal
    // column name — boundary literals are Columns, names are
    // backtick-quoted with embedded ticks doubled
    val df = Seq.tabulate(60)(i => (i.toLong, i * 1.5))
      .toDF("user id", "va`l.ue")
    val out = ZOrder.clusterAtScale(df, "user id", "va`l.ue", 4)
    assert(out.count() == 60)
    assert(out.columns.contains("zval"))
    // grid actually varies (not the degenerate one-cell fallback)
    assert(out.select("zval").distinct().count() > 1)
  }
}
