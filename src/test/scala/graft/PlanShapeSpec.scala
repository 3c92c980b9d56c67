package graft

import graft.queries.{AggQueries, DedupQueries, JoinQueries, SetOpsQueries, SimilarityQueries, TextQueries}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions — the 100 TB posture claims made in query
  * scaladocs, checked against what Catalyst actually planned:
  *  - top-k must be TakeOrderedAndProject (per-partition heaps), never a
  *    global sort;
  *  - the anti join's distinct-projected build side must broadcast;
  *  - the pricing-summary filter must be pushed into the parquet scan and
  *    its aggregate must have a map-side partial.
  *
  * Plans are inspected AFTER execution so AQE's runtime re-planning
  * (broadcast promotion, partition coalescing) is what gets asserted,
  * same as production.
  */
class PlanShapeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  /** Final physical plan string, post-AQE (materializes the query). */
  private def finalPlan(df: DataFrame): String = {
    df.collect() // force execution so AdaptiveSparkPlan is final
    val executed = df.queryExecution.executedPlan
    val resolved = executed.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(executed)
    resolved.toString
  }

  test("q339 injects a runtime Bloom filter on the fact-side scan") {
    // q339 executes inside its scoped confs and hands back a
    // checkpointed census — rebuild the pre-checkpoint join under the
    // same confs here to pin the physical shape
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions._
      val o = graft.Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val l = graft.Tables.lineitem(spark, dir).select(col("l_orderkey"),
        col("l_returnflag"))
      val j = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"runtime bloom filter not injected; plan was:\n$plan")
      assert(plan.contains("bloom_filter_agg"), s"plan was:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q28 top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = finalPlan(SetOpsQueries.q28Topk(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"), s"plan was:\n$plan")
  }

  test("q16 anti join broadcasts the distinct-projected build side") {
    val plan = finalPlan(JoinQueries.q16JoinAnti(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), s"plan was:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"plan was:\n$plan")
  }

  test("q01 pushes the shipdate filter to the parquet scan with partial agg") {
    val df = AggQueries.q01PricingSummary(spark, dir)
    val plan = finalPlan(df)
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"), s"plan was:\n$plan")
    // partial + final hash aggregation (map-side combine before shuffle)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"plan was:\n$plan")
  }

  test("q10 joins the dimension by broadcast, not shuffle") {
    // customer carries NO broadcast() hint (fact-sized at sf1000 — a
    // forced broadcast would OOM executors at scale); at bench scale AQE
    // still promotes it to BroadcastHashJoin via the size threshold, so
    // the physical plan is unchanged while the 100× plan degrades
    // gracefully to SMJ instead of dying.
    val plan = finalPlan(JoinQueries.q10JoinShipping(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), s"plan was:\n$plan")
  }

  test("q44 cosine top-k plans as TakeOrderedAndProject over a single scan") {
    val plan = finalPlan(SimilarityQueries.q44CosineTopk(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"), s"plan was:\n$plan")
  }

  test("q41 MinHash/LSH candidate generation is equi-join only (never all-pairs)") {
    val plan = finalPlan(DedupQueries.q41MinhashLsh(spark, dir))
    assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan was:\n$plan")
  }

  test("q42 inverted-index pair census joins only on keys — no cartesian, no doc-data broadcast") {
    // exhaustive semantics, but the plan must still be equi-joins over
    // fixed-width posting rows; with auto-broadcast off nothing at all
    // broadcasts (the round-4 shape shipped the whole trigram-array
    // table as a broadcast build side).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = finalPlan(DedupQueries.q42NgramJaccard(spark, dir))
      assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan was:\n$plan")
      assert(!plan.contains("BroadcastExchange"),
        s"doc-side data still broadcast with auto-broadcast off:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q42b banded trigram near-dup never goes all-pairs nor broadcasts the doc side") {
    // the scale fix for q42's quadratic+broadcast shape: candidates come
    // from a band-key equi-join, so the plan may contain no cartesian or
    // nested-loop join; and with auto-broadcast off, no broadcast at all
    // (q42's forced broadcast(grams) would survive this setting).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = finalPlan(DedupQueries.q42bNgramJaccardBanded(spark, dir))
      assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan was:\n$plan")
      assert(!plan.contains("BroadcastExchange"),
        s"doc-side table still broadcast with auto-broadcast off:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q42c prefix-filtered exact join is equi-joins only — no cartesian, no doc-data broadcast") {
    // deterministic-exact sibling of q42b: candidates come from the
    // prefix-postings (source, gram) equi-join, verification from two
    // hash joins back to the gram arrays — never an all-pairs shape,
    // and with auto-broadcast off nothing broadcasts at all.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = finalPlan(DedupQueries.q42cJaccardPrefixExact(spark, dir))
      assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan was:\n$plan")
      assert(!plan.contains("BroadcastExchange"),
        s"doc-side table still broadcast with auto-broadcast off:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q84 SRP-LSH candidates come from band-key equi-joins — no cartesian, no table broadcast") {
    // the signature self-join and both verify joins are equi-joins; with
    // auto-broadcast off nothing at all broadcasts (the hyperplanes are
    // literals inside projections, not a join side).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = finalPlan(SimilarityQueries.q84SrpLsh(spark, dir))
      assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan was:\n$plan")
      assert(!plan.contains("BroadcastExchange"),
        s"a table side still broadcast with auto-broadcast off:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q85 sparse-cosine pair generation is postings equi-joins only — no cartesian") {
    // document pairs must materialize ONLY through the shared-term
    // postings join; df cutoff and norms are key equi-joins too.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = finalPlan(TextQueries.q85SparseCosine(spark, dir))
      assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan was:\n$plan")
      assert(!plan.contains("BroadcastExchange"),
        s"a table side still broadcast with auto-broadcast off:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q86/q88/q90 sketch aggregations run as partial+final (mergeable buffers)") {
    // ObjectHashAggregate partial/final split: the map side folds rows
    // into sketch buffers; only buffers cross the exchange.
    for ((name, df) <- Seq(
        "q86" -> AggQueries.q86HeavyHitters(spark, dir),
        "q88" -> SimilarityQueries.q88GramCovariance(spark, dir),
        "q90" -> AggQueries.q90KmvDistinct(spark, dir),
        "q91" -> AggQueries.q91GroupedTopk(spark, dir))) {
      val plan = finalPlan(df)
      assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
        s"$name: no object aggregate in plan:\n$plan")
      assert(plan.toLowerCase.contains("partial"),
        s"$name: no partial aggregation (map-side combine) in plan:\n$plan")
    }
  }

  test("q92 binned range join plans as an equi-join — no nested loop, no cartesian") {
    // the raw BETWEEN predicate would plan BroadcastNestedLoopJoin;
    // binning must turn the pair generation into a hash/merge equi-join
    // with the interval predicate as a post-filter
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = finalPlan(JoinQueries.q92BinnedRangeJoin(spark, dir))
      assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan was:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"no equi-join in plan:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q194 perceptual-hash near-dup: candidates come from the band equi-join, never a pair product") {
    // no positive equi-join assert: on the fixture AQE's
    // PropagateEmptyRelation collapses the (empty) candidate side and
    // optimizes the joins away entirely — itself a scale win; the gate
    // is that NOTHING ever plans a pair product, and the logical plan
    // contains the band-key equi-join
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = TextQueries.q194PerceptualHash(spark, dir)
      val plan = finalPlan(df)
      assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan was:\n$plan")
      val logical = df.queryExecution.optimizedPlan.toString
      assert(logical.contains("band_id") && logical.contains("band_val"),
        s"band keys missing from logical plan:\n$logical")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q191 spatial grid join: candidate pairs come from a cell equi-join, never a distance theta join") {
    // a raw d² ≤ r² predicate would plan BroadcastNestedLoopJoin; the
    // 3×3 grid replication must turn it into a hash/merge join on the
    // cell key with the exact refine as a post-filter
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = finalPlan(JoinQueries.q191SpatialGridJoin(spark, dir))
      assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan was:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"no equi-join in plan:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q87 weighted sample plans as TakeOrderedAndProject, not a global sort") {
    val plan = finalPlan(SetOpsQueries.q87WeightedSample(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"), s"plan was:\n$plan")
  }

  // Both q46 entries (8-list and 16-list geometry) run IvfAnn.allNnExact;
  // neither may broadcast anything beyond the nLists-row centroid/radius
  // sides (explicit hints). With auto-broadcast off, ONLY the hinted
  // exchanges remain — assert each materialized ≤ 64 rows, and no
  // cartesian pair loop. The brute broadcast(full table) formulation
  // survives only as SimilarityQueries.nnPairsBrute, outside the entry set.
  for (lists <- Seq(8, 16))
    test(s"bucketed all-NN ($lists lists) never broadcasts a table-sized side") {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.QueryStageExec
      import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
      import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
      def expand(p: SparkPlan): Seq[SparkPlan] = {
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case r: ReusedExchangeExec => Seq(r.child)
          case _ => p.children
        }
        p +: kids.flatMap(expand)
      }
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        // checkpoint = false keeps the full lineage in ONE plan (the
        // production path materializes reused stages eagerly, which would
        // hide the upstream exchanges from this assertion)
        val e = graft.Tables.embeddings(spark, dir).select("vec_id", "label", "embedding")
          .repartition(spark.sparkContext.defaultParallelism)
        val (index, centroids) = graft.operators.IvfAnn.build(spark, e, nLists = lists)
        val df = graft.operators.IvfAnn.allNnExact(index, centroids, nprobe = 2,
          checkpoint = false)
        df.collect()
        val nodes = expand(df.queryExecution.executedPlan)
        val planStr = nodes.head.toString
        assert(!planStr.contains("CartesianProduct"), s"plan was:\n$planStr")
        val bcasts = nodes.collect { case b: BroadcastExchangeExec => b }
        assert(bcasts.nonEmpty, "expected the hinted centroid broadcasts to survive")
        bcasts.foreach { b =>
          val rows = b.metrics("numOutputRows").value
          assert(rows <= 64,
            s"a broadcast side materialized $rows rows (table-sized):\n$b")
        }
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }

  test("q99 SQL subqueries decorrelate to equi-joins — no nested-loop shapes survive") {
    // EXISTS → LeftSemi, NOT IN → null-aware LeftAnti, correlated scalar
    // → aggregate + outer equi-join; a decorrelation failure would leave
    // a BroadcastNestedLoopJoin or CartesianProduct re-executing the
    // subquery per outer row — the shape that cannot run at 100 TB
    val plan = finalPlan(graft.queries.MiscQueries.q99SqlSubqueries(spark, dir))
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan was:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
    assert(plan.contains("LeftSemi"), s"EXISTS did not become a semi-join:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT IN did not become an anti-join:\n$plan")
  }

  test("q99b NOT EXISTS anti-join shuffles with auto-broadcast disabled — the NOT IN form cannot") {
    // ADVICE round-9: NOT IN over a nullable key decorrelates to a
    // NULL-AWARE anti join, which Spark executes only as a broadcast
    // (BNLJ fallback past the threshold) — q99's green plan at fixture
    // scale is auto-broadcast luck, not a shuffle-safe shape. The
    // declared scale path is q99b's NOT EXISTS: with broadcast forced
    // OFF it must still plan a plain LeftAnti hash/merge join and no
    // nested-loop shape — the proof it survives a fact-sized subquery
    // side on a real cluster.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = finalPlan(graft.queries.MiscQueries.q99bSqlNotExists(spark, dir))
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan was:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
      assert(plan.contains("LeftAnti"), s"NOT EXISTS did not become an anti-join:\n$plan")
      assert(!plan.contains("BroadcastHashJoin"),
        s"broadcast disabled yet a broadcast join survived:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q101 PIVOT / q102 GROUPING SETS / q103 UNPIVOT lower to agg pipelines — no joins") {
    // the scaladoc claims, machine-checked: the SQL reshape clauses stay
    // pure aggregation pipelines — a decorrelation-style failure would
    // surface as a join or a per-value subplan
    val p1 = finalPlan(graft.queries.MiscQueries.q101SqlPivot(spark, dir))
    assert(!p1.contains("Expand"), s"PIVOT should not Expand:\n$p1")
    assert(!p1.contains("Join"), s"PIVOT planned a join:\n$p1")
    assert("HashAggregate".r.findAllIn(p1).size >= 2,
      s"PIVOT lost its partial aggs:\n$p1")
    val p2 = finalPlan(graft.queries.MiscQueries.q102SqlGroupingSets(spark, dir))
    assert("Expand".r.findAllIn(p2).size == 1,
      s"GROUPING SETS should have exactly one Expand:\n$p2")
    assert(!p2.contains("Join"), s"GROUPING SETS planned a join:\n$p2")
    assert("HashAggregate".r.findAllIn(p2).size >= 2,
      s"GROUPING SETS lost its partial aggs:\n$p2")
    // UNPIVOT: one Expand, but AFTER the aggregation — the ×|metrics|
    // amplification applies to the 3-row aggregate, never the scan
    val p3 = finalPlan(graft.queries.MiscQueries.q103SqlUnpivot(spark, dir))
    assert("Expand".r.findAllIn(p3).size == 1,
      s"UNPIVOT should have exactly one Expand:\n$p3")
    assert(!p3.contains("Join"), s"UNPIVOT planned a join:\n$p3")
    assert("HashAggregate".r.findAllIn(p3).size >= 2,
      s"UNPIVOT lost the partial aggs feeding it:\n$p3")
  }

  test("q104 chunking is a scan-local Generate — no joins, no aggregation") {
    // the operator's whole cost is the explode amplification (the
    // output itself); the only exchange is the output ordering's range
    // partition, never a key shuffle
    val plan = finalPlan(graft.queries.PipelineQueries.q104Chunking(spark, dir))
    assert(plan.contains("Generate"), s"chunking lost its explode:\n$plan")
    assert(!plan.contains("Join"), s"chunking planned a join:\n$plan")
    assert(!plan.contains("HashAggregate"), s"chunking planned an agg:\n$plan")
  }

  test("q106 vocab build tops with per-partition heaps and keeps the count agg partial") {
    // the full-vocab ranking must be TakeOrderedAndProject (V·partitions
    // heap rows to the driver merge), never a global sort of the term
    // counts; the window that ranks/cumulates afterwards sees only the
    // V=100 surviving rows
    val plan = finalPlan(TextQueries.q106VocabBuild(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"), s"plan was:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"term counts lost their map-side partial:\n$plan")
  }

  test("q109 robust outliers joins the 20-row med/mad dims by broadcast only") {
    // the doc table must never sort-merge against its own tiny
    // percentile summaries
    val plan = finalPlan(TextQueries.q109RobustOutliers(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), s"plan was:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"summary join went SMJ:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
  }

  test("q107 token budget shuffles once — the per-source window partitioning feeds the census agg") {
    // the window hash-partitions by source and the survivor census
    // groups by the same key, so the agg reuses that partitioning: ONE
    // hash exchange in the whole plan (the trailing range exchange is
    // the output ordering)
    val plan = finalPlan(graft.queries.PipelineQueries.q107TokenBudget(spark, dir))
    assert(!plan.contains("Join"), s"token budget planned a join:\n$plan")
    assert(plan.contains("Window"), s"prefix filter lost its window:\n$plan")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges == 1,
      s"expected exactly 1 hash exchange, found $hashExchanges:\n$plan")
  }

  test("q108 media resize is scan-local — no key shuffle, no join, no agg") {
    // mapPartitions kernel + posexplode: the only exchange is the output
    // ordering's range partition
    val plan = finalPlan(TextQueries.q108MediaResize(spark, dir))
    assert(!plan.contains("Join"), s"resize planned a join:\n$plan")
    assert(!plan.contains("HashAggregate"), s"resize planned an agg:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"resize shuffled on a key:\n$plan")
    assert(plan.contains("MapPartitions"), s"resize lost its mapPartitions:\n$plan")
  }

  test("q105 cell-local kNN is an equi-join + bounded heap — no cartesian, no table broadcast, no window sort") {
    // the kNN candidates come from the list_id equi-join of the
    // checkpointed assignment (the only broadcast in the whole query is
    // the 16-row centroid table, and it lives BEFORE the checkpoint);
    // the per-query top-3 is the ObjectHashAggregate heap (map-side
    // partial), never a ranking window's global per-group sort
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = finalPlan(SimilarityQueries.q105KnnLabel(spark, dir))
      assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan was:\n$plan")
      assert(!plan.contains("BroadcastExchange"),
        s"assignment table still broadcast with auto-broadcast off:\n$plan")
      assert(plan.contains("ObjectHashAggregate"),
        s"top-3 heap lost its ObjectHashAggregate partial:\n$plan")
      assert(!plan.contains("Window"),
        s"kNN ranking regressed to a window sort:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q73b bloom decontamination broadcasts ONLY the one-row bitmap") {
    // the eval-scale variant: with auto-broadcast off, the only
    // broadcast exchange left is the explicit bloom-bitmap row — the
    // eval gram set itself must never broadcast (that is the regime
    // q73b exists for), and the corpus gram stream is prefiltered
    // scan-locally before any exchange
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def expand(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case _ => p.children
      }
      p +: kids.flatMap(expand)
    }
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.queries.PipelineQueries.q73bDecontaminationBloom(spark, dir)
      df.collect()
      val nodes = expand(df.queryExecution.executedPlan)
      val bcasts = nodes.collect { case b: BroadcastExchangeExec => b }
      assert(bcasts.nonEmpty, "expected the bloom-bitmap broadcast")
      bcasts.foreach { b =>
        val rows = b.metrics("numOutputRows").value
        assert(rows <= 1, s"a broadcast side materialized $rows rows:\n$b")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q73 decontamination probes the corpus with a broadcast semi-join, never shuffling it") {
    // the eval-gram side is small by construction; the corpus side must
    // stream through a BroadcastHashJoin LeftSemi — a shuffled semi-join
    // here would move the whole training corpus at 100 TB
    val plan = finalPlan(graft.queries.PipelineQueries.q73Decontamination(spark, dir))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"plan was:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
  }

  test("q40 exact dedup is a partial+final hash aggregation with a pruned scan") {
    val df = graft.queries.DedupQueries.q40DedupExact(spark, dir)
    val plan = finalPlan(df)
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"no map-side partial aggregation:\n$plan")
    // column pruning: the scan must not read the unused n_chars column
    assert(!plan.contains("n_chars"), s"scan reads unused columns:\n$plan")
  }

  test("q61 native cosine_sim runs inside a WholeStageCodegen span") {
    val df = graft.queries.SimilarityQueries.q61CosineExprTopk(spark, dir)
    val plan = finalPlan(df)
    assert(plan.contains("cosine_sim"), s"expression missing from plan:\n$plan")
    // codegen'd operators print with a "*(n)" stage prefix; the project
    // holding cosine_sim must carry one (no interpreted fallback)
    assert(plan.linesIterator.exists(l => l.contains("cosine_sim") && l.contains("*(")),
      s"cosine_sim projection not inside a codegen stage:\n$plan")
  }

  test("join strategy hints force MERGE and SHUFFLE_HASH physical plans") {
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
    val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
    val merge = finalPlan(
      o.hint("merge").join(l, o("o_orderkey") === l("l_orderkey")))
    assert(merge.contains("SortMergeJoin"), s"MERGE hint ignored:\n$merge")
    val shj = finalPlan(
      o.hint("shuffle_hash").join(l, o("o_orderkey") === l("l_orderkey")))
    assert(shj.contains("ShuffledHashJoin"), s"SHUFFLE_HASH hint ignored:\n$shj")
  }

  test("bucketed tables join with ZERO exchanges (co-located join)") {
    // The 100 TB fact-fact join posture: pre-bucket both sides on the
    // join key at write time; the join then needs no shuffle at all.
    import org.apache.spark.sql.functions.col
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
    val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")
    l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle-or-not question
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      val plan = finalPlan(joined)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("partitioned-layout scan prunes statically and via dynamic partition pruning") {
    // The 100 TB layout posture: fact tables land partitioned on their
    // hot filter/join column; a literal filter must prune at planning
    // time (PartitionFilters) and a selective dim join must prune at
    // RUNTIME via DPP — unread partitions are never scanned.
    import org.apache.spark.sql.functions.{col, lit}
    val base = java.nio.file.Files.createTempDirectory("li_part_").toString
    Tables.lineitem(spark, dir)
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(base)
    val part = spark.read.parquet(base)

    // static pruning: literal partition predicate reaches PartitionFilters
    val statik = finalPlan(part.filter(col("l_returnflag") === "R")
      .groupBy("l_linestatus").count())
    assert(statik.contains("PartitionFilters: [isnotnull(l_returnflag"),
      s"partition predicate not pushed to the scan:\n$statik")

    // dynamic pruning: the dim's surviving values are only known at
    // RUNTIME (parquet-backed, non-foldable filter — a literal dim would
    // constant-fold into a static filter), so the fact scan must carry a
    // dynamicpruning subquery in PartitionFilters
    import spark.implicits._
    val dimPath = java.nio.file.Files.createTempDirectory("flag_dim_").toString
    Seq(("A", 1L), ("N", 0L), ("R", 0L)).toDF("flag", "w")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("w") === 1L)
    val joined = part.join(dim, col("l_returnflag") === col("flag"))
      .groupBy("l_linestatus").count()
    val plan = finalPlan(joined)
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning on the fact scan:\n$plan")
  }

  test("q67 TF-IDF aggregates with map-side partials and joins only on keys") {
    val plan = finalPlan(graft.queries.TextQueries.q67TfidfKeywords(spark, dir))
    // token counts / doc totals / df are all partial+final hash aggs —
    // the exploded token stream itself must never cross a shuffle raw
    assert("HashAggregate".r.findAllIn(plan).size >= 4,
      s"no map-side partial aggregation over tokens:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
  }

  test("q69 stratified sample joins the rates dim by broadcast") {
    val plan = finalPlan(SetOpsQueries.q69StratifiedSample(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), s"plan was:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"rates dim must not shuffle:\n$plan")
  }

  test("selective dim join injects a runtime bloom filter on the fact side") {
    // The 100 TB posture for non-broadcast selective joins: Spark's
    // runtime row-level filtering builds a bloom filter from the dim
    // side and pushes might_contain onto the fact scan, cutting shuffle
    // volume before the join. Thresholds are production-sized, so the
    // tiny fixture needs them floored to demonstrate the plan shape.
    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      import org.apache.spark.sql.functions.col
      val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
      val o = Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val plan = finalPlan(l.join(o, l("l_orderkey") === o("o_orderkey")))
      // the injected filter prints as might_contain(<bloom subquery>)
      // on the fact side, built by a bloom_filter_agg over the dim keys
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected on the fact side:\n$plan")
      assert(plan.contains("bloom_filter_agg"),
        s"no bloom filter built from the dim side:\n$plan")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("nested struct projection prunes the scan schema to the read fields") {
    // The multimodal layout (blob + struct sidecar, q52) only pays off
    // at 100 TB if selecting one sidecar field reads ONLY that field —
    // nested schema pruning must reach the parquet ReadSchema, leaving
    // the blob and the other struct fields unread.
    import org.apache.spark.sql.functions.{col, struct}
    val base = java.nio.file.Files.createTempDirectory("media_").toString
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        org.apache.spark.sql.functions.encode(col("text"), "UTF-8").as("blob"),
        struct(col("lang").as("l"), col("n_chars").as("nc"), col("source").as("src")).as("meta"))
      .write.mode("overwrite").parquet(base)
    val plan = finalPlan(
      spark.read.parquet(base).select(col("doc_id"), col("meta.nc")))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("meta:struct<nc:bigint>"),
      s"nested field not pruned to meta.nc:\n$plan")
    assert(!readSchema.contains("blob"), s"scan still reads the blob column:\n$plan")
  }

  test("q80 incremental dedup: band-key equi-joins only, base side never broadcast") {
    // the 100 TB claim: the existing corpus is touched through its
    // banded index via shuffle equi-joins — no cartesian, no nested
    // loop, and with auto-broadcast off nothing broadcasts at all
    // (a forced broadcast of either side would survive the setting)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = finalPlan(DedupQueries.q80IncrementalDedup(spark, dir))
      assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan was:\n$plan")
      assert(!plan.contains("BroadcastExchange"),
        s"a side still broadcast with auto-broadcast off:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q79 cluster-balanced sampling broadcasts the k-row budget dim, no window") {
    // the scan-local membership test: budgets (k rows) broadcast onto
    // the assignment; a per-cid row_number formulation would plan a
    // Window over k partitions — the whole table shuffled into k tasks
    import spark.implicits._
    val asg = (0L until 200L).map(i => (i, (i % 5).toInt + 1)).toDF("vec_id", "cid")
    val plan = finalPlan(SimilarityQueries.clusterBalancedCensus(asg, target = 8))
    assert(plan.contains("BroadcastHashJoin"), s"budget dim not broadcast:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window shuffle:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"census aggregation has no map-side partial:\n$plan")
  }

  test("q112 recursive CTE lowers to UnionLoop + hash join + partial aggs") {
    val plan = finalPlan(graft.queries.MiscQueries.q112SqlRecursive(spark, dir))
    assert(plan.contains("UnionLoop"), s"recursion did not plan as UnionLoop:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan was:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"rollup lost its partial aggs:\n$plan")
  }

  test("q113 LATERAL decorrelates to a Window top-k + equi-join, not a nested loop") {
    // the scaladoc claim, machine-checked: a correlated LATERAL with
    // ORDER BY + LIMIT must reach the q110 row_number shape (Window +
    // hash equi-join), never a per-outer-row re-scan (BNLJ/Cartesian)
    val plan = finalPlan(graft.queries.MiscQueries.q113SqlLateral(spark, dir))
    assert(plan.contains("Window"), s"no Window — lateral not decorrelated:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan was:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
  }

  test("q114 random projection is map-only — no shuffle before the cosmetic sort") {
    val plan = finalPlan(SimilarityQueries.q114RandomProjection(spark, dir))
    assert(!plan.contains("HashAggregate"), s"projection should not aggregate:\n$plan")
    assert(!plan.contains("Join"), s"projection should not join:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"only the final ORDER BY may shuffle:\n$plan")
  }

  test("q115 EWMA runs all eight lags through one window shuffle") {
    val plan = finalPlan(graft.queries.WindowQueries.q115Ewma(spark, dir))
    assert("Window".r.findAllIn(plan).size == 1,
      s"the lag chain must share one Window:\n$plan")
    assert("Exchange".r.findAllIn(plan).size <= 2,
      s"expected only the user_id hash + final sort exchanges:\n$plan")
  }

  test("q116 ORC read-back aggregates with map-side partials and no join") {
    val plan = finalPlan(graft.queries.MiscQueries.q116OrcRoundtrip(spark, dir))
    assert(!plan.contains("Join"), s"roundtrip census should not join:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"ORC census lost its partial aggs:\n$plan")
  }

  test("q117 mixture weights: per-source partial aggs, only the 1-row total attaches") {
    val plan = finalPlan(graft.queries.PipelineQueries.q117MixtureWeights(spark, dir))
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"source census lost its partial aggs:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"totals must broadcast, not SMJ:\n$plan")
  }

  test("q118 fingerprints fold each table to one row with map-side partials") {
    val plan = finalPlan(graft.queries.MiscQueries.q118TableFingerprint(spark, dir))
    assert(!plan.contains("Join"), s"fingerprinting should never join:\n$plan")
    // three tables × (partial + final) 1-row aggregation branches
    assert("HashAggregate".r.findAllIn(plan).size >= 6,
      s"per-table partial aggs missing:\n$plan")
  }

  test("q121 boilerplate mask: gram-key joins only — no cartesian, no table broadcast, no blind repartition") {
    // the scaladoc's 100 TB claims, machine-checked: the boilerplate set
    // attaches through a key join on the 8-byte gram (LeftOuter marker),
    // never an all-pairs shape; with auto-broadcast off nothing at all
    // broadcasts (the df table is data-dependent — a forced broadcast
    // would survive the setting); and a scan that ALREADY carries the
    // parallelism pays no full-text exchange (the spread is gated on
    // split count — probing the core over a pre-spread input must plan
    // zero round-robin exchanges; the round-11 blind repartition would
    // resurface here).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val preSpread = Tables.documents(spark, dir)
        .repartition(spark.sparkContext.defaultParallelism, org.apache.spark.sql.functions.col("doc_id"))
      val plan = finalPlan(
        graft.queries.PipelineQueries.boilerplateMask(preSpread,
          Tables.documents(spark, dir), minDf = 5))
      assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan was:\n$plan")
      assert(!plan.contains("BroadcastExchange"),
        s"a side still broadcast with auto-broadcast off:\n$plan")
      assert(plan.contains("LeftOuter"), s"boilerplate marker join missing:\n$plan")
      assert(!plan.contains("RoundRobinPartitioning"),
        s"blind full-text repartition resurfaced:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q121 gated path ships the spread full-text exchange ONCE (ReusedExchange)") {
    // the round-13 +24% regression, frozen: the df pass and the probe
    // pass both consume the spread's round-robin text exchange — the
    // two subtrees must stay canonically equal (same pruned schema,
    // same explicit doc_id filter) so AQE materializes ONE shuffle and
    // the second consumer is a ReusedExchange over its files
    val plan = finalPlan(
      graft.queries.PipelineQueries.q121BoilerplateMask(spark, dir))
    if (plan.contains("RoundRobinPartitioning")) {
      val real = plan.linesIterator
        .filter(_.contains("Exchange RoundRobinPartitioning"))
        .filterNot(_.contains("ReusedExchange")).size
      assert(real == 1 && plan.contains("ReusedExchange"),
        s"spread text exchange materialized $real times (want 1 + reuse):\n$plan")
    } // else: session parallelism low enough that the spread gate is off
  }

  test("q73 decontamination core over a pre-spread input plans zero round-robin exchanges") {
    // the Tables.documentsSpread gate, machine-checked from the other
    // side: a scan that already carries the parallelism (here: an input
    // hash-partitioned upstream) must pay NO blind full-text exchange —
    // the round-12 verdict's surviving `.repartition(par)` would
    // resurface as RoundRobinPartitioning.
    val preSpread = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism, org.apache.spark.sql.functions.col("doc_id"))
    val plan = finalPlan(graft.queries.PipelineQueries.decontamination(preSpread))
    assert(!plan.contains("RoundRobinPartitioning"),
      s"blind full-text repartition resurfaced:\n$plan")
    assert(plan.contains("LeftSemi"), s"eval-gram semi-join missing:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
  }

  test("q75 PII scrub core over a pre-spread input plans zero round-robin exchanges") {
    val preSpread = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism, org.apache.spark.sql.functions.col("doc_id"))
    val plan = finalPlan(graft.queries.PipelineQueries.piiScrub(preSpread))
    assert(!plan.contains("RoundRobinPartitioning"),
      s"blind full-text repartition resurfaced:\n$plan")
    assert(!plan.contains("Join"), s"PII scrub should never join:\n$plan")
    // min(scrub_id) is a string agg → Spark may pick SortAggregate; what
    // matters is the map-side partial, not the agg flavor
    assert(plan.contains("partial_sum"),
      s"per-source counters lost their map-side partial:\n$plan")
  }

  test("q122 length bucketing is one scan into partial+final hash aggs — no join") {
    val plan = finalPlan(graft.queries.PipelineQueries.q122LengthBuckets(spark, dir))
    assert(!plan.contains("Join"), s"bucket census should never join:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"bucket census lost its map-side partial:\n$plan")
  }

  test("q128 unigram xent: term equi-joins only — no cartesian, no table broadcast") {
    // the vocabulary attaches by a term equi-join and the grand total by
    // a 1-row broadcast; with auto-broadcast off the only broadcast left
    // must be that single-row total (the token stream itself may never
    // be a broadcast build side), and no all-pairs shape may appear
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = finalPlan(TextQueries.q128UnigramXent(spark, dir))
      assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
      assert("HashAggregate".r.findAllIn(plan).size >= 4,
        s"count/census aggs lost their map-side partials:\n$plan")
      // the forced broadcast(tot) is one row; nothing else may broadcast
      assert("BroadcastExchange".r.findAllIn(plan).size <= 1,
        s"a table side broadcast with auto-broadcast off:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q131 frame sampling is scan-shaped — no join, no agg, only the cosmetic-sort exchange") {
    val plan = finalPlan(TextQueries.q131FrameSample(spark, dir))
    assert(!plan.contains("Join"), s"frame sampling should never join:\n$plan")
    assert(!plan.contains("HashAggregate"), s"frame sampling should not aggregate:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"only the final ORDER BY may shuffle:\n$plan")
  }

  test("q135 segment dedup core: one keep-first window, no cartesian, no blind repartition") {
    // segmentation must be scan-local (split + transform/slice in the
    // projection, no per-segment re-split shuffle); the only wide ops
    // are the window on the segment key and the doc_id reassembly aggs
    val preSpread = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism, org.apache.spark.sql.functions.col("doc_id"))
    val plan = finalPlan(DedupQueries.segmentDedup(preSpread))
    assert(!plan.contains("RoundRobinPartitioning"),
      s"blind full-text repartition resurfaced:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
    assert("Window".r.findAllIn(plan).size >= 1 && plan.contains("row_number"),
      s"keep-first window missing:\n$plan")
  }

  test("q144 dup-gram mask core: gram/doc-key joins only — no cartesian, no table broadcast, no blind repartition") {
    // the scaladoc's claims machine-checked: the duplicate set attaches
    // through gram-key equi-joins and the cover set through a
    // (doc_id, p) join (LeftOuter marker); with auto-broadcast off
    // nothing broadcasts (every side is data-dependent); a pre-spread
    // input pays no round-robin full-text exchange.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val preSpread = Tables.documents(spark, dir)
        .repartition(spark.sparkContext.defaultParallelism, org.apache.spark.sql.functions.col("doc_id"))
      val plan = finalPlan(DedupQueries.dupGramMask(preSpread))
      assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan was:\n$plan")
      assert(!plan.contains("BroadcastExchange"),
        s"a side still broadcast with auto-broadcast off:\n$plan")
      assert(plan.contains("LeftOuter"), s"cover marker join missing:\n$plan")
      assert(!plan.contains("RoundRobinPartitioning"),
        s"blind full-text repartition resurfaced:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q143/q147 ADC search: TakeOrderedAndProject ranking, only tiny sides broadcast") {
    // query time must rank via per-partition heaps and broadcast ONLY
    // index-sized sides (8-row distance tables, the 1-row query slice /
    // probed-list dim — those plan as 1×n broadcast loops, which is
    // fine) — never an unbroadcast all-pairs CartesianProduct over data.
    for (df <- Seq(SimilarityQueries.q143PqAdcSearch(spark, dir),
                   SimilarityQueries.q147IvfPqSearch(spark, dir))) {
      val plan = finalPlan(df)
      assert(plan.contains("TakeOrderedAndProject"), s"plan was:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
    }
  }

  test("q151 classifier inference: no join anywhere — feature hashing needs no vocabulary") {
    // the scaladoc claim: tokenize+hash+weight are scan-local and the
    // only wide op is the doc-key partial+final agg
    val plan = finalPlan(TextQueries.q151QualityClassifier(spark, dir))
    assert(!plan.contains("Join"), s"classifier inference planned a join:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"doc-key agg lost its map-side partial:\n$plan")
  }

  test("q152 PMI: term equi-joins + TakeOrderedAndProject, no cartesian") {
    val plan = finalPlan(TextQueries.q152PmiBigrams(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"), s"plan was:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
  }

  test("q136 merge is a single full-outer key join — no cartesian, no extra wide ops") {
    val plan = finalPlan(graft.queries.LakehouseQueries.q136MergeSnapshot(spark, dir))
    assert(plan.contains("FullOuter"), s"merge lost its full-outer join:\n$plan")
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)".r.findAllIn(plan).size == 1,
      s"merge must be exactly one join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
  }

  test("q158 MIPS: TakeOrderedAndProject candidates, only the two 1-row sides broadcast") {
    // the norm-augmentation reduction must keep q44's plan posture: the
    // candidate stage is a per-partition heap top-k (never a global
    // sort), and with auto-broadcast off the only broadcasts are the
    // explicit 1-row maxNorm and query-vector sides
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = finalPlan(SimilarityQueries.q158MipsTopk(spark, dir))
      assert(plan.contains("TakeOrderedAndProject"), s"plan was:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
      assert("BroadcastExchange".r.findAllIn(plan).size <= 2,
        s"a table side broadcast with auto-broadcast off:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q160 triangles: equi-joins only — no cartesian, no nested loop, nothing broadcast") {
    // the degree-ordered enumeration is all equi-joins and aggs; every
    // side (edges, degrees, arcs) is data-dependent, so with
    // auto-broadcast off NOTHING may broadcast and no all-pairs shape
    // may appear — the plan that survives a celebrity-skew graph
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = finalPlan(graft.queries.PipelineQueries.q160TriangleCount(spark, dir))
      assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan was:\n$plan")
      assert("BroadcastExchange".r.findAllIn(plan).size == 0,
        s"a data-dependent side broadcast with auto-broadcast off:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q161 deletion vectors: merge-on-read is a broadcast ANTI join of the small DV side") {
    val plan = finalPlan(graft.queries.LakehouseQueries.q161DeletionVectors(spark, dir))
    assert(plan.contains("LeftAnti"), s"scan-side DV subtraction lost its anti join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the DV sidecar (orders-of-magnitude smaller than the base) must broadcast:\n$plan")
  }

  test("q167 BPE encode core is map-only: 1-row merge broadcasts, no shuffle before the sort") {
    // the corpus-sized tokenize pass must be three replace projections
    // under 1-row broadcasts — no hash shuffle anywhere (the trainer's
    // aggs run beforehand and are lineage-cut by localCheckpoint)
    val plan = finalPlan(TextQueries.q167BpeEncode(spark, dir))
    assert(!plan.contains("HashAggregate"), s"encode must not aggregate:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"encode must not hash-shuffle the corpus:\n$plan")
    assert("Exchange rangepartitioning".r.findAllIn(plan).size == 1,
      s"only the final ORDER BY may shuffle:\n$plan")
    assert("BroadcastExchange".r.findAllIn(plan).size <= 3,
      s"only the three 1-row merge sides may broadcast:\n$plan")
  }

  test("q179 star join: dims broadcast, date filter pushed to the orders scan, no cartesian") {
    // the macro-query posture: every dimension hop is a broadcast hash
    // join at bench scale (AQE's call — no hints in the query), the
    // order-year predicate reaches the parquet reader, and nothing
    // plans an all-pairs shape
    val df = JoinQueries.q179StarJoin(spark, dir)
    val plan = finalPlan(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"plan was:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 4,
      s"dimension hops should broadcast at bench scale:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate)"),
      s"date filter not pushed to the orders scan:\n$plan")
  }

  test("q175 integrity audit: every edge is an anti join, parents broadcast") {
    val plan = finalPlan(graft.queries.MiscQueries.q175IntegrityAudit(spark, dir))
    assert("LeftAnti".r.findAllIn(plan).size >= 6,
      s"six FK edges must audit as anti joins:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the distinct-projected parent key sets should broadcast:\n$plan")
  }

  test("q187 blocked linkage: pairs form only through the block-key equi-join — no cartesian, nothing broadcast") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = finalPlan(DedupQueries.q187BlockedLinkage(spark, dir))
      assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan was:\n$plan")
      assert("BroadcastExchange".r.findAllIn(plan).size == 0,
        s"a data-dependent side broadcast with auto-broadcast off:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("a filter above a union pushes into BOTH branch scans") {
    // the multi-source mixture shape (q70/q117's union composition):
    // Catalyst must split the predicate through the Union so each
    // source scan reads only its matching rows — at 100 TB a
    // post-union filter would materialize both corpora first
    import org.apache.spark.sql.functions.{col, count, lit}
    val a = Tables.orders(spark, dir).select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
    val b = Tables.lineitem(spark, dir).select(col("l_orderkey").as("k"), col("l_extendedprice").as("v"))
    val plan = finalPlan(a.unionAll(b).filter(col("v") > 1000.0)
      .groupBy().agg(count(lit(1))))
    assert("PushedFilters: \\[.*GreaterThan\\(o_totalprice".r.findFirstIn(plan).isDefined,
      s"filter not pushed into the orders branch:\n$plan")
    assert("PushedFilters: \\[.*GreaterThan\\(l_extendedprice".r.findFirstIn(plan).isDefined,
      s"filter not pushed into the lineitem branch:\n$plan")
  }

  test("sortWithinPartitions adds no exchange beyond the explicit repartition") {
    val df = Tables.lineitem(spark, dir)
      .repartition(4, org.apache.spark.sql.functions.col("l_orderkey"))
      .sortWithinPartitions("l_orderkey", "l_linenumber")
    val plan = finalPlan(df)
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"partition-local sort must not shuffle again:\n$plan")
    assert(plan.contains("Sort"), s"no sort node:\n$plan")
  }

  test("q266 containment: intersections via the gram-postings equi-join — no cartesian") {
    val plan = finalPlan(DedupQueries.q266Containment(spark, dir))
    assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan was:\n$plan")
  }

  test("q267 phrase search: probe broadcasts against term-keyed postings; the positional close is an equi-join") {
    val plan = finalPlan(TextQueries.q267PhraseSearch(spark, dir))
    assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
    // the 3-row probe side must broadcast, never shuffle the postings
    assert(plan.contains("BroadcastHashJoin"), s"plan was:\n$plan")
  }

  test("q272 skyline windows are PARTITIONED by brand — no single-partition sort, no self-join") {
    val df = graft.queries.WindowQueries.q272Skyline(spark, dir)
    PlanGuards.assertGlobalWindowsBounded(df, "q272")
    val plan = finalPlan(df)
    // the blind NOT-EXISTS dominance quadratic must not appear in-engine
    assert(!plan.contains("CartesianProduct") && !"Join".r.findFirstIn(plan).isDefined,
      s"skyline must be a pure window plan:\n$plan")
  }

  test("q262 HITS: per-round arcs equi-join + keyed agg, no cartesian (1-row max sides broadcast)") {
    val plan = finalPlan(graft.queries.PipelineQueries.q262Hits(spark, dir))
    assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
  }

  test("q298 bucketed agg: keyed aggregation on the bucket key with ZERO exchange") {
    val agg = graft.queries.LakehouseQueries.q298BucketedAggCore(spark, dir)
    val plan = finalPlan(agg)
    assert(plan.contains("HashAggregate"), s"plan was:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucket-key aggregation must consume the table's HashPartitioning:\n$plan")
  }

  test("q287 bucketed join: sort-merge with ZERO exchange — the co-located layout pays") {
    val joined = graft.queries.LakehouseQueries.q287BucketedCore(spark, dir)
    val plan = finalPlan(joined)
    assert(plan.contains("SortMergeJoin"), s"plan was:\n$plan")
    // matching 8-bucket layouts on both sides: the join consumes the
    // tables' HashPartitioning directly — the shuffle is gone
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$plan")
    // the remaining sorts must be PARTITION-LOCAL merge preludes
    // (global=false), never a single-partition global sort (modern
    // Spark hides in-bucket order from the scan, so these are expected)
    val globalSorts = "Sort \\[[^\\]]*\\], true".r.findAllIn(plan).toSeq
    assert(globalSorts.isEmpty, s"global sort in bucketed join:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), s"plan was:\n$plan")
  }
}
