package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation surface (SURVEY.md §2B "Aggregation"): hash agg with
  * partial/final split, std aggs, distinct aggs, stats aggs, exact
  * percentile, collect, grouping sets / rollup / cube, pivot.
  *
  * Scale notes: every query is a single shuffle-by-group-key with
  * map-side partial aggregation (HashAggregateExec partial → final);
  * none of them collect to the driver. Group-key cardinality here is
  * tiny (flag × status, priority, segment), so the final agg is cheap at
  * any SF — the heavy lifting is the scan, which prunes columns and
  * pushes the shipdate filter down to parquet.
  */
object AggQueries extends QueryModule {

  /** TPC-H Q1-style pricing summary: scan → filter → project → agg → sort.
    * The engine's spine (SURVEY.md §7 M0). */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Distinct aggregates (count/sum DISTINCT) — planned as two-stage
    * aggregation by Catalyst (expand + partial), no driver involvement. */
  def q02DistinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_cust"),
        round(sum_distinct(col("o_totalprice")), 2).as("sum_distinct_price"),
        round(min("o_totalprice"), 2).as("min_price"),
        round(max("o_totalprice"), 2).as("max_price"))
      .orderBy("o_orderpriority")

  /** Statistical aggregates (Welford-style single-pass in both engines). */
  def q03StatsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(stddev_pop(col("l_quantity")), 4).as("sdp_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(var_pop(col("l_quantity")), 4).as("varp_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covs_qty_price"),
        round(covar_pop(col("l_quantity"), col("l_extendedprice")), 2).as("covp_qty_price"))
      .orderBy("l_returnflag")

  /** ROLLUP with grouping indicator (Expand → partial/final agg). */
  def q04Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
          .cast("int").as("gid"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  /** CUBE over two order dimensions. */
  def q05Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(
        (grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority")))
          .cast("int").as("gid"),
        count(lit(1)).as("n"),
        round(sum("o_totalprice"), 2).as("sum_total"))
      .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))

  /** Pivot: wide conditional aggregation; Catalyst rewrites to a single
    * agg with one branch per pivot value — no per-value scan. */
  def q06Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(sum("l_quantity"), 2))
      .orderBy("l_returnflag")

  /** collect_set → sorted array, emitted as a joined string (deterministic;
    * collect_list order is not). The string form keeps the compared cell
    * scalar — the driver's pandas-based hasher can't sort array cells. */
  def q07CollectSet(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(
        array_join(sort_array(collect_set(col("o_orderpriority"))), ",").as("priorities"),
        size(collect_set(col("o_orderpriority"))).as("n_priorities"))
      .orderBy("o_orderstatus")

  /** Approximate aggregates (HLL++ / quantile sketch) — by construction
    * engine-specific, so no SQL oracle: driver records rows-only.
    * `ApproxAggSpec` bounds the sketch error against exact values. */
  def q08Approx(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("approx_median_qty"))
      .orderBy("l_returnflag")

  /** Exact interpolated percentiles (SortAggregate path). */
  def q09Percentile(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_linestatus")
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 4).as("p25_qty"),
        round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 4).as("p90_qty"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("median_price"))
      .orderBy("l_linestatus")

  /** q09b: the SAME exact interpolated percentiles through a value
    * HISTOGRAM — the 100 TB formulation. `percentile` (q09) sort-aggs
    * every ROW per group; here the rows collapse to (group, value,
    * count) in the partial aggregation (map-side combine — only
    * DISTINCT values ever shuffle; l_quantity has ~50), a cumulative-
    * count window orders each group's distinct values once, and the
    * p·(n−1) order statistics are picked off the cumulative ranges and
    * interpolated with `percentile`'s own lower+frac·(upper−lower)
    * formula. Exact by construction ⇒ shares q09's oracle (q42b/q46b
    * precedent). On l_quantity (~50 distinct values) the collapse is
    * ~10⁴×; on near-continuous l_extendedprice it is ~parity locally —
    * the scale win is that the per-group merge is O(distinct values)
    * behind a partial agg, not O(rows) buffered in one percentile
    * aggregation buffer (and for truly continuous domains at 100 TB the
    * sketch path, q08, is the right tool).
    */
  def q09bPercentileHist(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    // per-status percentile columns for one value column, via histogram
    def pctCols(valueCol: String, ps: Seq[(String, Double)]): DataFrame = {
      // percentile (and quantile_cont) skip NULLs; the histogram must
      // drop them too or they'd bucket as a value
      val hist = li.filter(col(valueCol).isNotNull)
        .groupBy(col("l_linestatus"), col(valueCol).as("v"))
        .agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy("l_linestatus").orderBy("v")
      // group totals via a tiny agg + broadcast join — an unordered
      // window for `n` would buffer each group's whole histogram per row
      val totals = hist.groupBy("l_linestatus").agg(sum("c").as("n"))
      val cum = hist
        .withColumn("cum", sum("c").over(wCum))
        .join(broadcast(totals), "l_linestatus")
        .withColumn("lo", col("cum") - col("c"))
      val aggs = ps.flatMap { case (nm, p) =>
        // value covering 0-indexed position floor(t) / ceil(t), t = p(n-1)
        Seq(
          max(when(expr(s"lo <= floor($p * (n - 1)) AND floor($p * (n - 1)) < cum"),
            col("v"))).as(s"${nm}_lo"),
          max(when(expr(s"lo <= ceiling($p * (n - 1)) AND ceiling($p * (n - 1)) < cum"),
            col("v"))).as(s"${nm}_hi"),
          max(expr(s"$p * (n - 1)")).as(s"${nm}_t"))
      }
      val picked = cum.groupBy("l_linestatus").agg(aggs.head, aggs.tail: _*)
      ps.foldLeft(picked) { case (df, (nm, _)) =>
        df.withColumn(nm, round(
          col(s"${nm}_lo") +
            (col(s"${nm}_t") - floor(col(s"${nm}_t"))) *
              (col(s"${nm}_hi") - col(s"${nm}_lo")), 4))
      }.select(col("l_linestatus") +: ps.map(p => col(p._1)): _*)
    }
    val qty = pctCols("l_quantity",
      Seq("p25_qty" -> 0.25, "median_qty" -> 0.5, "p90_qty" -> 0.9))
    val price = pctCols("l_extendedprice", Seq("median_price" -> 0.5))
    qty.join(price, "l_linestatus")
      .select("l_linestatus", "p25_qty", "median_qty", "p90_qty", "median_price")
      .orderBy("l_linestatus")
  }

  /** q86: heavy hitters through the mergeable Misra–Gries summary
    * (`SketchAggregators.HeavyHitterAggregator`) — the streaming-fold
    * answer to "top talkers" when an exact groupBy would shuffle one row
    * per distinct key. The map side folds raw events into a ≤capacity
    * counter map; only those maps cross the shuffle (O(partitions ·
    * capacity), row-count-independent — at 100 TB that is KBs where the
    * exact agg shuffles the key universe).
    *
    * Gate regime: capacity 4096 ≥ every fixture's distinct-user count
    * (150 @ sf0.01, 1500 @ sf0.1), so Misra–Gries is EXACT and the
    * oracle is the plain exact top-10; the lossy regime's
    * n/(capacity+1) undercount bound is pinned by `HeavyHitterSpec`.
    */
  def q86HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val hh = udaf(new graft.functions.SketchAggregators.HeavyHitterAggregator(4096))
    Tables.eventsSpread(spark, dir)
      .agg(hh(col("user_id")).as("items"))
      .select(explode(col("items")).as("kv"))
      .select(col("kv._1").as("user_id"), col("kv._2").as("n_events"))
      .orderBy(col("n_events").desc, col("user_id").asc)
      .limit(10)
  }

  /** q90: per-source distinct-count estimation via the bottom-k (KMV)
    * sketch (`SketchAggregators.BottomKAggregator`): hash every doc_id
    * to a deterministic md5-uniform in (0, 1], keep the k = 8 smallest
    * per source, estimate distinct = (k-1)/u_(k). The sketch is
    * union-mergeable (partial buffers of ≤k doubles), which is what a
    * 100 TB "how many uniques per slice" rollup needs — and unlike
    * q08's HLL the estimator here is deterministic arithmetic both
    * engines can replay, so the gate is a hash match, not a tolerance.
    * Output carries the estimate, the exact count, and the relative
    * error — the query doubles as the sketch's accuracy probe.
    */
  def q90KmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    val k = 8
    val bk = udaf(new graft.functions.SketchAggregators.BottomKAggregator(k))
    // (h+1)/2^32 with h = first 8 md5 hex digits: exact in double (the
    // divisor is a power of two), identical in DuckDB
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("double") + lit(1.0d)) / lit(4294967296.0d)
    Tables.documentsSpread(spark, dir)
      .select(col("source"), u.as("u"), col("doc_id"))
      .groupBy("source")
      .agg(bk(col("u")).as("mins"),
        countDistinct(col("doc_id")).as("exact_distinct"))
      .select(col("source"),
        when(size(col("mins")) < k, size(col("mins")).cast("double"))
          .otherwise(lit((k - 1).toDouble) / element_at(col("mins"), k))
          .as("est"),
        col("exact_distinct"))
      .select(col("source"), round(col("est"), 4).as("est_distinct"),
        col("exact_distinct"),
        round(abs(col("est") - col("exact_distinct")) / col("exact_distinct"), 4)
          .as("rel_err"))
      .orderBy("source")
  }

  /** q91: grouped top-k through the bounded-heap `TopKAggregator` — the
    * aggregation-shaped alternative to q23's `row_number` window. The
    * window form sorts EVERY group row through the shuffle; here the map
    * side reduces each partition to ≤k rows per group (partial
    * ObjectHashAggregate), so only O(groups·partitions·k) summary rows
    * cross the exchange — the shape that survives a 100 TB fact table.
    * Exact and deterministic: total order (n_chars desc, doc_id asc).
    */
  def q91GroupedTopk(spark: SparkSession, dir: String): DataFrame = {
    val topk = udaf(new graft.functions.SketchAggregators.TopKAggregator(3))
    Tables.documentsSpread(spark, dir)
      .select(col("source"),
        col("n_chars").cast("double").as("v"), col("doc_id").as("id"))
      .groupBy("source")
      // product-typed input: the udaf takes the case-class FIELDS as args
      .agg(topk(col("v"), col("id")).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("pos", "kv")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rn"),
        col("kv.id").as("doc_id"), col("kv.v").cast("long").as("n_chars"))
      .orderBy("source", "rn")
  }

  /** q190: per-source distinct-count estimation via HyperLogLog
    * (Flajolet et al. 2007) — the register-max sketch behind every
    * engine's `approx_count_distinct`, here as the oracle-replayable
    * `HllAggregator` (p=12, 4096 registers, ±1.6% typical). Contrast
    * with q90's KMV: same problem, different sketch — KMV keeps the k
    * smallest hash-uniforms, HLL keeps per-bucket leading-zero maxima;
    * HLL's buffer is FIXED-SIZE (2^p bytes) regardless of k-vs-n
    * regime and merge is element-wise max, which is why it is the
    * production default for distinct-at-scale. The 60-bit hash is
    * computed in column space (md5 prefix via `conv`) so DuckDB derives
    * the identical integer; the estimate itself is exact-integer
    * arithmetic + one fixed double chain (see `HllAggregator` scaladoc)
    * — the comparison is bit-identical, not tolerance.
    *
    * Scale: one partial+final ObjectHashAggregate; each partition
    * reduces to a 4096-entry register array per group before the
    * exchange — no raw-key distinct shuffle at any SF.
    */
  def q190HllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val hll = udaf(new graft.functions.SketchAggregators.HllAggregator(12))
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    Tables.documentsSpread(spark, dir)
      .select(col("source"), h.as("h"), col("doc_id"))
      .groupBy("source")
      .agg(hll(col("h")).as("est"),
        countDistinct(col("doc_id")).as("exact_distinct"))
      .select(col("source"), round(col("est"), 4).as("est_distinct"),
        col("exact_distinct"),
        round(abs(col("est") - col("exact_distinct")) / col("exact_distinct"), 4)
          .as("rel_err"))
      .orderBy("source")
  }

  /** q295: TRIMMED and WINSORIZED means — the robust-location members
    * of the aggregation family (q03's mean is outlier-fragile, q09's
    * median discards all magnitude; the 10% trimmed mean drops each
    * tail, the winsorized mean CLAMPS each tail to the cut values —
    * the metric-pipeline standard for heavy-tailed revenue): both
    * computed EXACTLY on the order-price cents census, no sampling,
    * no sketch.
    *
    * Determinism: interior mass per census row is the integer overlap
    * max(0, min(cum, n−k) − max(before, k)) — the whole trim is
    * BIGINT census arithmetic; cut values are census lookups (min v
    * with cum ≥ rank); the only doubles are the three final divides,
    * snapped. Scale: ONE value census (partial+final agg) carries
    * everything — the naive form sorts the table twice; rank
    * selection here never moves row-scale data.
    */
  def q295RobustMeans(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val census = Tables.orders(spark, dir)
      .select(floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("v"))
      .groupBy("v").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint()
    val tot = census.agg(sum("cnt").as("n"), sum(col("v") * col("cnt")).as("s"))
    val c = census.crossJoin(broadcast(tot)).withColumn("k", expr("n div 10"))
    val interior = c.agg(
      sum(greatest(least(col("cum"), col("n") - col("k")) -
        greatest(col("cum") - col("cnt"), col("k")), lit(0L)) * col("v")).as("tsum"))
    val lo = c.filter(col("cum") >= col("k") + 1).agg(min("v").as("lo"))
    val hi = c.filter(col("cum") >= col("n") - col("k")).agg(min("v").as("hi"))
    tot.withColumn("k", expr("n div 10"))
      .crossJoin(broadcast(interior)).crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
      .select(col("n"), col("k"),
        (floor(col("s").cast("double") / col("n").cast("double") + 0.5) / 100.0).as("mean"),
        (floor(col("tsum").cast("double") /
          (col("n") - lit(2L) * col("k")).cast("double") + 0.5) / 100.0).as("trimmed_mean"),
        (floor((col("tsum") + col("k") * col("lo") + col("k") * col("hi")).cast("double") /
          col("n").cast("double") + 0.5) / 100.0).as("winsorized_mean"),
        (col("lo") / lit(100.0)).as("lo_cut"),
        (col("hi") / lit(100.0)).as("hi_cut"))
  }

  /** q289: HLL SET-OPERATION estimates — the inclusion–exclusion
    * completion of the sketch family (q190 estimates ONE set, q209
    * rolls sketches up a hierarchy; audience-overlap questions need
    * |A∩B|, which HLL cannot store but CAN derive:
    * |A∩B| ≈ est(A) + est(B) − est(A∪B), where the union sketch is
    * exactly the register-wise max — here produced by sketching the
    * concatenated stream, which is identical by the merge law
    * (`SketchLawsSpec`)): viewer/purchaser user-set overlap, with the
    * exact truth and signed error beside it (intersection error
    * compounds three estimates — the caveat the output makes visible).
    *
    * Determinism: same 60-bit md5 hash and exact-integer register
    * chains as q190, three of them replayed in the oracle; the
    * inclusion–exclusion is one double chain snapped at 4 dp. Scale:
    * three partial+final object aggs over one pushed-filter scan —
    * 4 KB each across the shuffle; a production warehouse would keep
    * per-segment REGISTER columns (q209) and merge, this gate
    * certifies the set-op arithmetic those merges feed.
    */
  def q289HllSetOps(spark: SparkSession, dir: String): DataFrame = {
    val hll = udaf(new graft.functions.SketchAggregators.HllAggregator(12))
    val h = conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_type"), col("user_id"), h.as("h"))
    val a = ev.filter(col("event_type") === "view")
      .agg(hll(col("h")).as("est_a"), countDistinct("user_id").as("exact_a"))
    val b = ev.filter(col("event_type") === "purchase")
      .agg(hll(col("h")).as("est_b"), countDistinct("user_id").as("exact_b"))
    val u = ev.agg(hll(col("h")).as("est_u"), countDistinct("user_id").as("exact_u"))
    a.crossJoin(broadcast(b)).crossJoin(broadcast(u))
      .select(
        round(col("est_a"), 4).as("est_view"),
        round(col("est_b"), 4).as("est_purchase"),
        round(col("est_u"), 4).as("est_union"),
        round(col("est_a") + col("est_b") - col("est_u"), 4).as("est_overlap"),
        (col("exact_a") + col("exact_b") - col("exact_u")).as("exact_overlap"),
        round(abs(col("est_a") + col("est_b") - col("est_u") -
          (col("exact_a") + col("exact_b") - col("exact_u")).cast("double")) /
          (col("exact_a") + col("exact_b") - col("exact_u")).cast("double"), 4)
          .as("rel_err"))
  }

  /** q195: Count-Min frequency sketch (Cormode & Muthukrishnan 2005)
    * built over the event stream and point-queried for the true top-10
    * users — the frequency sibling of q190's HLL and the SKETCHED
    * alternative to q86's Misra–Gries (which keeps candidate keys; CMS
    * keeps no keys at all, so it can answer for keys chosen AFTER the
    * scan). d=4 rows × w=1024 columns; buckets are md5-derived in
    * column space, so the oracle recomputes the identical table —
    * every cell is an exact integer Σ (order-invariant), the estimate
    * is min over 4 cells, and the one-sided guarantee (est ≥ true, the
    * overcount column is provably ≥ 0) is visible in the output.
    *
    * Scale: one partial+final object agg (32 KB per partition crosses
    * the shuffle, independent of rows/cardinality); the finished 1-row
    * sketch broadcasts to the probe side — no rescan of the fact.
    */
  def q195CmsFrequency(spark: SparkSession, dir: String): DataFrame = {
    val cms = udaf(new graft.functions.SketchAggregators.CmsAggregator(4, 1024))
    val buckets = expr(
      "transform(sequence(0, 3), j -> CAST(conv(substring(md5(concat(CAST(j AS STRING), '|', CAST(user_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 1024)")
    val ev = Tables.eventsSpread(spark, dir).select(col("user_id"))
    val sketch = ev.select(buckets.as("bk")).agg(cms(col("bk")).as("sketch"))
    ev.groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id")).limit(10)
      .crossJoin(broadcast(sketch))
      .withColumn("bk", buckets)
      .withColumn("est", expr(
        "aggregate(transform(bk, (b, j) -> element_at(sketch, CAST(j * 1024 + b + 1 AS INT))), 9223372036854775807L, (a, x) -> least(a, x))"))
      .select(col("user_id"), col("n"), col("est"),
        (col("est") - col("n")).as("overcount"))
      .orderBy(col("n").desc, col("user_id"))
  }

  /** q209: SKETCH-COLUMN ROLLUP — the warehouse pattern q190 enables:
    * aggregate HLL REGISTERS once at the finest grain (source × lang),
    * store them as a sketch column, then answer BOTH coarser rollups
    * (per source AND per lang) by merging stored registers — the raw
    * table is scanned once, ever; every later distinct-count question
    * at any coarser grain reads the 4 KB sketches. The max-merge law
    * (associative + idempotent) makes the rollup estimate BIT-EQUAL to
    * having aggregated raw keys at the coarse grain directly — which
    * is exactly what the oracle computes, blind to the two-level plan:
    * any loss in the store/merge hop flips the gate. Exact reference
    * columns ride beside each estimate.
    */
  def q209SketchRollup(spark: SparkSession, dir: String): DataFrame = {
    val sk = udaf(new graft.functions.SketchAggregators.HllSketchAggregator(12))
    val mg = udaf(new graft.functions.SketchAggregators.HllMergeAggregator(12))
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val base = Tables.documentsSpread(spark, dir)
      .select(col("source"), col("lang"), h.as("h"), col("doc_id"))
    val sketches = base.groupBy("source", "lang").agg(sk(col("h")).as("sketch"))
      .localCheckpoint() // the stored sketch table; both rollups read it
    val bySource = sketches.groupBy("source").agg(mg(col("sketch")).as("est"))
      .select(lit("source").as("dim"), col("source").as("key"), col("est"))
    val byLang = sketches.groupBy("lang").agg(mg(col("sketch")).as("est"))
      .select(lit("lang").as("dim"), col("lang").as("key"), col("est"))
    val exact = base.groupBy("source").agg(countDistinct("doc_id").as("exact_distinct"))
      .select(lit("source").as("dim"), col("source").as("key"), col("exact_distinct"))
      .unionByName(base.groupBy("lang")
        .agg(countDistinct("doc_id").as("exact_distinct"))
        .select(lit("lang").as("dim"), col("lang").as("key"), col("exact_distinct")))
    bySource.unionByName(byLang).join(exact, Seq("dim", "key"))
      .select(col("dim"), col("key"),
        round(col("est"), 4).as("est_distinct"), col("exact_distinct"))
      .orderBy("dim", "key")
  }

  /** q225: CMS ACCURACY-vs-BUDGET curve — q195's sketch at widths
    * 256/1024/4096 in one pass, probing the true top-20 and reporting
    * max/mean overcount per width: the tuning table that turns
    * "ε = e/w with probability 1−δ" into a measured number for THIS
    * key distribution, which is how a practitioner actually picks w.
    * Each width is an independent exact-integer sketch (same md5
    * buckets mod its own w); the curve is the visible ε ∝ 1/w law.
    */
  def q225CmsAccuracyCurve(spark: SparkSession, dir: String): DataFrame = {
    val widths = Seq(256, 1024, 4096)
    val ev = Tables.eventsSpread(spark, dir).select(col("user_id"))
    val top = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id")).limit(20).localCheckpoint()
    widths.map { w =>
      val cms = udaf(new graft.functions.SketchAggregators.CmsAggregator(4, w))
      val buckets = expr(
        s"transform(sequence(0, 3), j -> CAST(conv(substring(md5(concat(CAST(j AS STRING), '|', CAST(user_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % $w)")
      val sketch = ev.select(buckets.as("bk")).agg(cms(col("bk")).as("sketch"))
      top.crossJoin(broadcast(sketch))
        .withColumn("bk", buckets)
        .withColumn("est", expr(
          s"aggregate(transform(bk, (b, j) -> element_at(sketch, CAST(j * $w + b + 1 AS INT))), 9223372036854775807L, (a, x) -> least(a, x))"))
        .agg(max(col("est") - col("n")).as("max_overcount"),
          round(sum(col("est") - col("n")).cast("double") /
            count(lit(1)).cast("double"), 6).as("mean_overcount"))
        .select(lit(w.toLong).as("width"), col("max_overcount"),
          col("mean_overcount"))
    }.reduce(_ unionByName _).orderBy("width")
  }

  /** q244: JOIN-SIZE ESTIMATION via sketch inner product (the AMS/CMS
    * device, Alon–Matias–Szegedy '96 / Cormode–Muthukrishnan '05): the
    * size of clicks ⋈ purchases on user_id is Σ_k nA(k)·nB(k), and the
    * CM estimate is min over depth rows of Σ_col cA[d,col]·cB[d,col] —
    * the cardinality consult a 100 TB optimizer runs BEFORE picking a
    * join strategy, priced here as a measured accuracy-vs-width curve
    * (widths 64/256/1024, the q225/q229/q230/q231 tuning-table family).
    *
    * Determinism: q225's md5-bucket device (conv(md5) mod w), exact
    * BIGINT counters and products; the one double op is the final error
    * ratio under round 6. Scale: the exact size comes from the key
    * CENSUS product (two hash aggs + a key equi-join — the join itself
    * is never materialized); each width's counters are w-sized aggs of
    * the census, so the sketch path shuffles O(depth·w) rows, not data.
    */
  def q244JoinSizeEstimate(spark: SparkSession, dir: String): DataFrame = {
    val widths = Seq(64, 256, 1024)
    val ev = Tables.eventsSpread(spark, dir)
    def census(t: String) = ev.filter(col("event_type") === t)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val a = census("click").localCheckpoint()
    val b = census("purchase").localCheckpoint()
    val exact = a.withColumnRenamed("n", "n_a")
      .join(b.withColumnRenamed("n", "n_b"), "user_id")
      .agg(sum(col("n_a") * col("n_b")).as("exact_size"))
    def counters(side: DataFrame, w: Int) = side
      .withColumn("j", explode(sequence(lit(0), lit(2))))
      .withColumn("bucket", expr(
        s"CAST(conv(substring(md5(concat(CAST(j AS STRING), '|', CAST(user_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % $w"))
      .groupBy("j", "bucket").agg(sum("n").as("cnt"))
    widths.map { w =>
      val ca = counters(a, w)
      val cb = counters(b, w).withColumnRenamed("cnt", "cnt_b")
      ca.join(cb, Seq("j", "bucket"))
        .groupBy("j").agg(sum(col("cnt") * col("cnt_b")).as("ip"))
        .agg(min("ip").as("est_size"))
        .crossJoin(broadcast(exact))
        .select(lit(w.toLong).as("width"), col("est_size"), col("exact_size"),
          round(col("est_size").cast("double") / col("exact_size"), 6)
            .as("blowup"))
    }.reduce(_ unionByName _).orderBy("width")
  }

  /** q247: QUANTILE-SKETCH accuracy curve — the fixed-grid histogram
    * quantile estimator (one scan to m integer bucket counts, mergeable
    * across partitions by plain addition — the sketch you reach for
    * when even q09b's distinct-value histogram is too wide) at m =
    * 16/64/256 bins, probing p50/p90/p99 against the exact interpolated
    * percentile: the measured error-vs-budget table (the q225/q229/
    * q230/q231/q244 family) that picks the bin count.
    *
    * Determinism: bucket = least(floor((v−min)/(max−min)·m), m−1) and
    * the edge-interpolated estimate are double expressions mirrored
    * association-for-association in the oracle; counts/cumulative are
    * exact BIGINTs; round 4 at output only. Scale: ONE scan builds the
    * m = 256 histogram and the 64/16 ones COARSEN it in census space —
    * floor(x·256) div (256/m) ≡ floor(x·m) on the nested dyadic grids,
    * so the coarse censuses are bit-equal to direct bucketing while the
    * fact table is read once, not three times. The exact percentiles
    * come from TWO-PHASE DISTRIBUTED SELECTION (never Spark's
    * `percentile`, whose single-reducer value map was 6 of this
    * query's 8 seconds; and never a full distinct-value census —
    * 583k distinct of 600k rows makes that window row-scale): the 256
    * histogram locates the bucket holding each target rank, a second
    * map-only pass ranks ONLY the ≤ 6 probe buckets (partitioned
    * windows over n/256-sized value censuses), and global rank =
    * bucket cum-before + in-bucket rank. The interpolation
    * lo + (hi−lo)·((n−1)p − ⌊(n−1)p⌋) mirrors quantile_cont. At
    * 100 TB this is the textbook selection algorithm: two scans, a
    * 256-row census, and a probe the size of two buckets.
    */
  def q247QuantileSketchCurve(spark: SparkSession, dir: String): DataFrame = {
    val binsSeq = Seq(16, 64, 256)
    val ps = Seq("0.5" -> 0.5, "0.9" -> 0.9, "0.99" -> 0.99)
    val vals = Tables.lineitem(spark, dir)
      .select(col("l_extendedprice").as("v")).filter(col("v").isNotNull)
    val stats0 = vals.agg(
      min("v").as("vmin"), max("v").as("vmax"), count(lit(1)).as("n"))
      .localCheckpoint()
    def bucketed = vals.crossJoin(broadcast(stats0))
      .withColumn("bucket", least(
        floor((col("v") - col("vmin")) / (col("vmax") - col("vmin")) * 256),
        lit(255L)).cast("long"))
    val h256 = bucketed
      .groupBy("bucket").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(Window.orderBy("bucket")))
      .withColumn("cum_before", col("cum") - col("c"))
      .localCheckpoint()
    // probe buckets: for each target rank k+1 / k+2 the first bucket
    // whose cumulative reaches it (≤ 6 buckets total)
    val probeAggs = ps.zipWithIndex.flatMap { case ((_, p), i) =>
      val k = floor(lit(p) * (col("n") - 1).cast("double"))
      Seq(
        min(when(col("cum") >= k + 1, col("bucket"))).as(s"pb_lo_${i + 1}"),
        min(when(col("cum") >= k + 2, col("bucket"))).as(s"pb_hi_${i + 1}"))
    }
    val probes = h256.crossJoin(broadcast(stats0.select("n")))
      .agg(probeAggs.head, probeAggs.tail: _*)
      .select(explode(array(
        (1 to 3).flatMap(i => Seq(col(s"pb_lo_$i"), col(s"pb_hi_$i"))): _*))
        .as("bucket"))
      .filter(col("bucket").isNotNull).distinct()
    // second pass: rank only the probe buckets' values
    val ranked = bucketed.join(broadcast(probes), "bucket")
      .groupBy("bucket", "v").agg(count(lit(1)).as("vc"))
      .withColumn("cin",
        sum("vc").over(Window.partitionBy("bucket").orderBy("v")))
      .join(broadcast(h256.select(col("bucket"), col("cum_before"))), "bucket")
      .withColumn("grank_hi", col("cum_before") + col("cin"))
    val exactAggs = ps.zipWithIndex.flatMap { case ((_, p), i) =>
      val pos = lit(p) * (col("n") - 1).cast("double")
      val k = floor(pos)
      Seq(
        min(when(col("grank_hi") >= k + 1, col("v"))).as(s"lo_${i + 1}"),
        min(when(col("grank_hi") >= k + 2, col("v"))).as(s"hi_${i + 1}"),
        max(pos - k).as(s"g_${i + 1}"))
    }
    val exacts = ranked.crossJoin(broadcast(stats0.select("n")))
      .agg(exactAggs.head, exactAggs.tail: _*)
    val stats = stats0.crossJoin(broadcast(exacts))
      .select(col("vmin"), col("vmax"), col("n"),
        (col("lo_1") + (coalesce(col("hi_1"), col("lo_1")) - col("lo_1")) * col("g_1")).as("ex_1"),
        (col("lo_2") + (coalesce(col("hi_2"), col("lo_2")) - col("lo_2")) * col("g_2")).as("ex_2"),
        (col("lo_3") + (coalesce(col("hi_3"), col("lo_3")) - col("lo_3")) * col("g_3")).as("ex_3"))
      .localCheckpoint()
    binsSeq.map { m =>
      // m = 256 reuses h256's cum computed BEFORE the checkpoint (a
      // fresh window over the checkpoint scan would hide the census
      // bound from PlanGuards); the coarsened widths re-cum above
      // their own agg, which is census-bounded by construction
      val hist =
        if (m == 256) h256.select("bucket", "c", "cum")
        else h256.withColumn("bucket", expr(s"bucket div ${256 / m}"))
          .groupBy("bucket").agg(sum("c").as("c"))
          .withColumn("cum", sum("c").over(Window.orderBy("bucket")))
      val cum = hist
        .crossJoin(broadcast(stats.select("n")))
      val picks = cum.agg(
        min(when(col("cum") >= col("n") * 0.5,
          struct(col("bucket"), col("c"), col("cum")))).as("b_1"),
        min(when(col("cum") >= col("n") * 0.9,
          struct(col("bucket"), col("c"), col("cum")))).as("b_2"),
        min(when(col("cum") >= col("n") * 0.99,
          struct(col("bucket"), col("c"), col("cum")))).as("b_3"))
        .crossJoin(broadcast(stats))
      ps.zipWithIndex.map { case ((pName, p), i) =>
        val b = col(s"b_${i + 1}")
        val est = col("vmin") +
          (b.getField("bucket").cast("double") +
            (lit(p) * col("n") - (b.getField("cum") - b.getField("c")).cast("double")) /
              b.getField("c")) *
            ((col("vmax") - col("vmin")) / m)
        picks.select(lit(m.toLong).as("bins"), lit(pName).as("p"),
          round(est, 4).as("est"),
          round(col(s"ex_${i + 1}"), 4).as("exact"),
          round(abs(est - col(s"ex_${i + 1}")) / col(s"ex_${i + 1}"), 6)
            .as("rel_err"))
      }.reduce(_ unionByName _)
    }.reduce(_ unionByName _).orderBy("bins", "p")
  }

  /** q172: the LINEAR-REGRESSION aggregate family (SQL:2003 `regr_*`) —
    * per-group OLS of extended price on quantity: slope, intercept, R²,
    * plus the correlation it generalizes. These are one-pass moment
    * aggregates (Σx, Σy, Σxy, Σx², n — partial+final like any sum), the
    * statistical step past q03's dispersion aggs: fit-a-line-per-group
    * over a 100 TB fact table with a single hash agg, no ML library.
    * Determinism: each statistic is a RATIO of big co-moment sums —
    * summation-order noise is relative (~1e-12), so the O(1)-scale
    * ratios are stable under round 6 even though the raw sums are not.
    */
  def q172RegressionAggs(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        round(expr("regr_slope(l_extendedprice, l_quantity)"), 6).as("slope"),
        round(expr("regr_intercept(l_extendedprice, l_quantity)"), 6).as("intercept"),
        round(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2"),
        round(corr(col("l_extendedprice"), col("l_quantity")), 6).as("corr_pq"))
      .orderBy("l_returnflag")

  /** q314: OHLCV candlestick bars — the tick-to-bar compaction every
    * market-data pipeline runs first (the reference's feed is a crypto
    * ticker stream, `/root/reference/src/main.cpp:48-50`; bars are what
    * downstream ever reads): per (event_type, UTC hour), open/close by
    * the total (µs, event_id) order, high/low, tick count, and turnover
    * (Σ cents).
    *
    * Determinism: open/close are `min_by`/`max_by` under the UNIQUE
    * struct order (us, event_id) — no ties possible; high/low/turnover
    * are exact BIGINT cents; descales are single /100.0 divides, the
    * same IEEE op in both engines. Scale: ONE partial+final hash agg —
    * the min_by/max_by partials carry one (value, key) pair per group,
    * so state is O(bars), never O(ticks), and no window touches the
    * tick stream. At 100 TB this is the classic map-side-combine win:
    * each scan task emits ≤ |types|×|hours| partial bars.
    */
  def q314OhlcvBars(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("event_type"),
      expr("unix_micros(ts)").as("us"), col("event_id"),
      floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .withColumn("hour", expr("us div 3600000000"))
    ev.groupBy("event_type", "hour")
      .agg(
        min_by(col("cents"), struct(col("us"), col("event_id"))).as("open_c"),
        max("cents").as("high_c"),
        min("cents").as("low_c"),
        max_by(col("cents"), struct(col("us"), col("event_id"))).as("close_c"),
        count(lit(1)).as("n"),
        sum("cents").as("turn_c"))
      .select(col("event_type"), col("hour"),
        (col("open_c").cast("double") / 100.0).as("open"),
        (col("high_c").cast("double") / 100.0).as("high"),
        (col("low_c").cast("double") / 100.0).as("low"),
        (col("close_c").cast("double") / 100.0).as("close"),
        col("n"),
        (col("turn_c").cast("double") / 100.0).as("turnover"))
      .orderBy("event_type", "hour")
  }

  /** q326: SLIDING-WINDOW distinct via HLL register reuse — the
    * time-axis application of the q209 rollup law (q209 merges the
    * sketch store across DIMENSIONS; a monitoring stack merges it
    * across TIME): per-hour HLL sketches built ONCE, every trailing
    * 6-hour window answered by register-max merging its ≤ 6 hourly
    * sketches — never re-reading events — with the exact window
    * distinct beside it as truth.
    *
    * Determinism: register max-merge is associative/commutative/
    * idempotent, so the merged registers equal the direct
    * per-window computation REGISTER FOR REGISTER — the oracle
    * computes each window's registers from scratch and the estimates
    * compare bit-identically (same fixed double chain as q190).
    * Scale: THE point — one pass builds O(hours) sketches of fixed
    * 4 KB; each window is a ≤ 6-row census merge. The exact column is
    * the gate's truth and the thing this pattern exists to avoid
    * recomputing at 100 TB.
    */
  def q326SlidingHll(spark: SparkSession, dir: String): DataFrame = {
    // 720 hourly groups with 4 KB object buffers: above the default
    // 128-group ObjectHashAggregate fallback, the sort-based path
    // re-serializes the register array per row — raise the threshold
    // so the sketch build stays in the hash regime (buffers are 3 MB
    // total; the conf is scoped and restored)
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "4096")
    // materialize under the scoped conf (a later write re-plans and
    // would see the restored default) — the result is a window census
    try q326SlidingHllBody(spark, dir).localCheckpoint(true)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  private def q326SlidingHllBody(spark: SparkSession, dir: String): DataFrame = {
    val sk = udaf(new graft.functions.SketchAggregators.HllSketchAggregator(12))
    val h = conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val hu = Tables.events(spark, dir)
      .select(expr("unix_micros(ts) div 3600000000").as("hr"),
        col("user_id"), h.as("h"))
    val hours = hu.groupBy("hr").agg(sk(col("h")).as("sketch"))
      .localCheckpoint() // the stored hourly sketch column
    // window membership by MAP-SIDE EXPANSION (each hour fans out to
    // the ≤ 6 trailing windows it serves) + one equi-shuffle — a range
    // self-join here plans as a nested-loop against the window list,
    // which is exactly the shape this sketch store exists to avoid
    val realWindows = broadcast(hours.select(col("hr").as("w")))
    // register merge + estimate in COLUMN SPACE (zip_with/aggregate
    // higher-order functions): max-merge is order-invariant so the
    // unordered collect_list is safe, and the estimate chain mirrors
    // HllAggregator.finish term for term — the typed merge UDAF costs
    // ~15 ms/row on 4 KB buffers here (67 s at sf0.1), the codegen'd
    // fold ~1 s, the q209 sketch-census rows never see the difference
    val merged = hours
      .withColumn("w", explode(expr("sequence(hr, hr + 5)")))
      .join(realWindows, "w")
      .groupBy(col("w").as("hr"))
      .agg(count(lit(1)).as("n_hours"),
        expr("aggregate(collect_list(sketch), array_repeat(0, 4096), " +
          "(acc, s) -> zip_with(acc, s, (x, y) -> greatest(x, y)))").as("regs"))
      .withColumn("v", expr("cast(size(filter(regs, r -> r = 0)) as bigint)"))
      .withColumn("hsum", expr(
        "aggregate(regs, cast(0 as bigint), " +
          "(acc, r) -> acc + shiftleft(cast(1 as bigint), 49 - r))"))
      .withColumn("raw", expr(
        "0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0 " +
          "* 562949953421312.0 / cast(hsum as double)"))
      .withColumn("est", expr(
        "CASE WHEN raw <= 2.5 * 4096.0 AND v > 0 " +
          "THEN 4096.0 * ln(4096.0 / v) ELSE raw END"))
    val exact = hu.select(col("hr"), col("user_id")).distinct()
      .withColumn("w", explode(expr("sequence(hr, hr + 5)")))
      .join(realWindows, "w")
      .groupBy(col("w").as("hr"))
      .agg(countDistinct("user_id").as("exact_distinct"))
    merged.join(exact, "hr")
      .select(col("hr"), col("n_hours"),
        round(col("est"), 4).as("est_distinct"), col("exact_distinct"))
      .orderBy("hr")
  }

  /** q340: HLL ACCURACY-vs-p curve — the distinct-count member of the
    * sketch-tuning family (q225 sweeps CMS width, q230 MinHash bands,
    * q231 Bloom bits, q247 histogram bins, q229 IVF nprobe; this one
    * prices the 2^p-byte register budget): the SAME 60-bit hash stream
    * sketched at p = 8/10/12 against the exact distinct, the table
    * that turns "1.04/√m" into a measured number for this key space.
    *
    * Determinism: q190's argument per p — the harmonic sum is an exact
    * order-invariant BIGINT (Σ 2^(maxRho−M[j]) ≤ m·2^maxRho ≤ 2⁶¹) and
    * the estimate one fixed double chain the oracle replays with the
    * same tabulated/asymptotic alpha. Scale: one pass, three fixed
    * buffers (256 B/1 KB/4 KB of registers) — the whole curve costs
    * one scan.
    */
  def q340HllAccuracyCurve(spark: SparkSession, dir: String): DataFrame = {
    val h = conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val base = Tables.events(spark, dir).select(h.as("h"), col("user_id"))
    val ps = Seq(8, 10, 12)
    val sketched = ps.map { p =>
      val hll = udaf(new graft.functions.SketchAggregators.HllAggregator(p))
      base.agg(hll(col("h")).as("est"),
          countDistinct("user_id").as("exact_distinct"))
        .select(lit(p.toLong).as("p"), lit((1L << p)).as("m"),
          round(col("est"), 4).as("est_distinct"), col("exact_distinct"),
          round(abs(col("est") - col("exact_distinct")) /
            col("exact_distinct"), 6).as("rel_err"))
    }
    sketched.reduce(_ unionByName _).orderBy("p")
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q340_hll_accuracy_curve" -> (q340HllAccuracyCurve _),
    "q326_sliding_hll" -> (q326SlidingHll _),
    "q314_ohlcv_bars" -> (q314OhlcvBars _),
    "q190_hll_distinct" -> (q190HllDistinct _),
    "q289_hll_setops" -> (q289HllSetOps _),
    "q295_robust_means" -> (q295RobustMeans _),
    "q195_cms_frequency" -> (q195CmsFrequency _),
    "q209_sketch_rollup" -> (q209SketchRollup _),
    "q225_cms_accuracy_curve" -> (q225CmsAccuracyCurve _),
    "q244_join_size_estimate" -> (q244JoinSizeEstimate _),
    "q247_quantile_sketch_curve" -> (q247QuantileSketchCurve _),
    "q172_regression_aggs" -> (q172RegressionAggs _),
    "q91_grouped_topk" -> (q91GroupedTopk _),
    "q86_heavy_hitters" -> (q86HeavyHitters _),
    "q90_kmv_distinct" -> (q90KmvDistinct _),
    "q09b_percentile_hist" -> (q09bPercentileHist _),
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_distinct_agg" -> (q02DistinctAgg _),
    "q03_stats_agg" -> (q03StatsAgg _),
    "q04_rollup" -> (q04Rollup _),
    "q05_cube" -> (q05Cube _),
    "q06_pivot" -> (q06Pivot _),
    "q07_collect_set" -> (q07CollectSet _),
    "q08_approx" -> (q08Approx _),
    "q09_percentile" -> (q09Percentile _)
  )

  override val oracles: Map[String, String] = Map(
    // q190's register chain replayed per p with the parameterized
    // split widths and the same tabulated/asymptotic alpha
    "q340_hll_accuracy_curve" -> {
      val blocks = Seq(8, 10, 12).map { p =>
        val wBits = 60 - p
        val m = 1 << p
        val maxRho = wBits + 1
        val div = 1L << wBits
        val pow = 1L << maxRho
        s"""r$p AS (
           |  SELECT bucket,
           |         max(CASE WHEN w = 0 THEN $maxRho
           |                  ELSE $maxRho - length(bin(w)) END) AS reg
           |  FROM (SELECT h // $div AS bucket, h % $div AS w FROM hs)
           |  GROUP BY bucket),
           |s$p AS (
           |  SELECT (sum(1::BIGINT << ($maxRho - reg))
           |            + ($m - count(*)) * $pow)::BIGINT AS s,
           |         ($m - count(*))::BIGINT AS v
           |  FROM r$p),
           |e$p AS (
           |  SELECT v,
           |         0.7213 / (1.0 + 1.079 / $m.0) * $m.0 * $m.0
           |           * $pow.0 / s::DOUBLE AS raw
           |  FROM s$p),
           |est$p AS (
           |  SELECT CASE WHEN raw <= 2.5 * $m.0 AND v > 0
           |              THEN $m.0 * ln($m.0 / v) ELSE raw END AS est
           |  FROM e$p)""".stripMargin
      }.mkString(",\n")
      val rows = Seq(8, 10, 12).map { p =>
        s"""SELECT ${p}::BIGINT AS p, ${1 << p}::BIGINT AS m,
           |       round(est, 4) + 0.0 AS est_distinct, ex.exact_distinct,
           |       round(abs(est - ex.exact_distinct) / ex.exact_distinct, 6) + 0.0
           |         AS rel_err
           |FROM est$p, ex""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH hs AS (
         |  SELECT DISTINCT ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
         |  FROM events),
         |ex AS (SELECT count(DISTINCT user_id)::BIGINT AS exact_distinct
         |       FROM events),
         |$blocks
         |$rows
         |ORDER BY p""".stripMargin
    },
    // each window's registers computed FROM SCRATCH over the raw
    // hashes — the engine's hourly-merge path must match register for
    // register, which is the merge law the row exists to prove
    "q326_sliding_hll" ->
      """WITH hu AS (
        |  SELECT DISTINCT epoch_us(ts) // 3600000000 AS hr, user_id,
        |         ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM events),
        |hours AS (SELECT DISTINCT hr FROM hu),
        |wp AS (
        |  SELECT t.hr AS whr, s.hr AS shr
        |  FROM hours t JOIN hours s ON s.hr BETWEEN t.hr - 5 AND t.hr),
        |wh AS (
        |  SELECT DISTINCT wp.whr AS hr, hu.h
        |  FROM wp JOIN hu ON hu.hr = wp.shr),
        |b AS (SELECT hr, h // 281474976710656 AS bucket,
        |             h % 281474976710656 AS w FROM wh),
        |r AS (
        |  SELECT hr, bucket,
        |         max(CASE WHEN w = 0 THEN 49 ELSE 49 - length(bin(w)) END) AS reg
        |  FROM b GROUP BY hr, bucket),
        |s AS (
        |  SELECT hr,
        |         (sum(1::BIGINT << (49 - reg))
        |            + (4096 - count(*)) * 562949953421312)::BIGINT AS s,
        |         (4096 - count(*))::BIGINT AS v
        |  FROM r GROUP BY hr),
        |e0 AS (
        |  SELECT hr, v,
        |         0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0
        |           * 562949953421312.0 / s::DOUBLE AS raw
        |  FROM s),
        |est AS (
        |  SELECT hr,
        |         CASE WHEN raw <= 2.5 * 4096.0 AND v > 0
        |              THEN 4096.0 * ln(4096.0 / v) ELSE raw END AS est
        |  FROM e0),
        |nh AS (SELECT whr AS hr, count(*)::BIGINT AS n_hours FROM wp GROUP BY whr),
        |ex AS (
        |  SELECT wp.whr AS hr, count(DISTINCT hu.user_id)::BIGINT AS exact_distinct
        |  FROM wp JOIN hu ON hu.hr = wp.shr
        |  GROUP BY wp.whr)
        |SELECT est.hr, nh.n_hours, round(est.est, 4) + 0.0 AS est_distinct,
        |       ex.exact_distinct
        |FROM est JOIN nh USING (hr) JOIN ex USING (hr)
        |ORDER BY est.hr""".stripMargin,
    // same cents grid, same unique (us, event_id) open/close order —
    // DuckDB's ordered first/last vs the engine's min_by/max_by: two
    // different extremum algorithms, one answer
    "q314_ohlcv_bars" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(ts) AS us, event_id,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
        |         epoch_us(ts) // 3600000000 AS hour
        |  FROM events)
        |SELECT event_type, hour,
        |       first(cents ORDER BY us, event_id)::DOUBLE / 100.0 AS open,
        |       max(cents)::DOUBLE / 100.0 AS high,
        |       min(cents)::DOUBLE / 100.0 AS low,
        |       last(cents ORDER BY us, event_id)::DOUBLE / 100.0 AS close,
        |       count(*)::BIGINT AS n,
        |       sum(cents)::DOUBLE / 100.0 AS turnover
        |FROM ev
        |GROUP BY event_type, hour
        |ORDER BY event_type, hour""".stripMargin,
    // same grid buckets, same census cumulative, same edge interpolation
    "q247_quantile_sketch_curve" -> {
      val binsSeq = Seq(16, 64, 256)
      val ps = Seq("0.5" -> "0.5", "0.9" -> "0.9", "0.99" -> "0.99")
      val blocks = binsSeq.map { m =>
        s"""hist_$m AS (
           |  SELECT CAST(least(floor((v - vmin) / (vmax - vmin) * $m), $m - 1) AS BIGINT) AS bucket,
           |         count(*)::BIGINT AS c
           |  FROM v CROSS JOIN stats GROUP BY 1),
           |cum_$m AS (
           |  SELECT bucket, c, sum(c) OVER (ORDER BY bucket)::BIGINT AS cum
           |  FROM hist_$m),
           |pick_$m AS (
           |  SELECT ${ps.zipWithIndex.map { case ((_, p), i) =>
               s"min(CASE WHEN cum >= n * $p THEN struct_pack(bucket := bucket, c := c, cum := cum) END) AS b_${i + 1}"
             }.mkString(",\n         ")}
           |  FROM cum_$m CROSS JOIN (SELECT n FROM stats))""".stripMargin
      }.mkString(",\n")
      val rows = binsSeq.flatMap { m =>
        ps.zipWithIndex.map { case ((pName, p), i) =>
          val est = s"(vmin + ((b_${i + 1}).bucket::DOUBLE + ($p * n - ((b_${i + 1}).cum - (b_${i + 1}).c)::DOUBLE) / (b_${i + 1}).c) * ((vmax - vmin) / $m))"
          s"""SELECT $m::BIGINT AS bins, '$pName' AS p,
             |       round($est, 4) + 0.0 AS est,
             |       round(ex_${i + 1}, 4) + 0.0 AS exact,
             |       round(abs($est - ex_${i + 1}) / ex_${i + 1}, 6) + 0.0 AS rel_err
             |FROM pick_$m CROSS JOIN stats""".stripMargin
        }
      }.mkString("\nUNION ALL ")
      s"""WITH v AS (
         |  SELECT l_extendedprice AS v FROM lineitem
         |  WHERE l_extendedprice IS NOT NULL),
         |stats AS (
         |  SELECT min(v) AS vmin, max(v) AS vmax, count(*)::BIGINT AS n,
         |         quantile_cont(v, 0.5) AS ex_1, quantile_cont(v, 0.9) AS ex_2,
         |         quantile_cont(v, 0.99) AS ex_3
         |  FROM v),
         |$blocks
         |$rows
         |ORDER BY bins, p""".stripMargin
    },
    // same key censuses, same md5 counters, same min-of-rows inner product
    "q244_join_size_estimate" -> {
      val widths = Seq(64, 256, 1024)
      val blocks = widths.map { w =>
        s"""ca_$w AS (
           |  SELECT t.j, ('0x' || substr(md5(t.j::VARCHAR || '|' || user_id::VARCHAR), 1, 8))::BIGINT % $w AS bucket,
           |         sum(n)::BIGINT AS cnt
           |  FROM a, range(0, 3) t(j) GROUP BY 1, 2),
           |cb_$w AS (
           |  SELECT t.j, ('0x' || substr(md5(t.j::VARCHAR || '|' || user_id::VARCHAR), 1, 8))::BIGINT % $w AS bucket,
           |         sum(n)::BIGINT AS cnt
           |  FROM b, range(0, 3) t(j) GROUP BY 1, 2),
           |ip_$w AS (
           |  SELECT ca.j, sum(ca.cnt * cb.cnt)::BIGINT AS ip
           |  FROM ca_$w ca JOIN cb_$w cb ON ca.j = cb.j AND ca.bucket = cb.bucket
           |  GROUP BY ca.j),
           |agg_$w AS (
           |  SELECT $w::BIGINT AS width, min(ip)::BIGINT AS est_size FROM ip_$w)""".stripMargin
      }.mkString(",\n")
      val union = widths.map(w =>
        s"SELECT width, est_size, exact_size, round(est_size::DOUBLE / exact_size, 6) + 0.0 AS blowup FROM agg_$w CROSS JOIN x").mkString("\nUNION ALL ")
      s"""WITH a AS (
         |  SELECT user_id, count(*)::BIGINT AS n FROM events
         |  WHERE event_type = 'click' GROUP BY user_id),
         |b AS (
         |  SELECT user_id, count(*)::BIGINT AS n FROM events
         |  WHERE event_type = 'purchase' GROUP BY user_id),
         |x AS (
         |  SELECT sum(a.n * b.n)::BIGINT AS exact_size
         |  FROM a JOIN b USING (user_id)),
         |$blocks
         |$union
         |ORDER BY width""".stripMargin
    },
    // q195's cell-for-cell replay at each width, unioned
    "q225_cms_accuracy_curve" -> {
      val widths = Seq(256, 1024, 4096)
      val blocks = widths.map { w =>
        s"""b_$w AS (
           |  SELECT user_id, n, t.j,
           |         ('0x' || substr(md5(t.j::VARCHAR || '|' || user_id::VARCHAR), 1, 8))::BIGINT
           |           % $w AS bucket
           |  FROM k, range(0, 4) t(j)),
           |cell_$w AS (
           |  SELECT j, bucket, sum(n)::BIGINT AS cnt FROM b_$w GROUP BY j, bucket),
           |est_$w AS (
           |  SELECT b.user_id, b.n, min(cell.cnt)::BIGINT AS est
           |  FROM b_$w b JOIN cell_$w cell
           |    ON b.j = cell.j AND b.bucket = cell.bucket
           |  GROUP BY b.user_id, b.n),
           |agg_$w AS (
           |  SELECT $w::BIGINT AS width, max(e.est - t.n)::BIGINT AS max_overcount,
           |         round(sum(e.est - t.n)::DOUBLE / count(*)::DOUBLE, 6) + 0.0
           |           AS mean_overcount
           |  FROM top t JOIN est_$w e USING (user_id))""".stripMargin
      }.mkString(",\n")
      val union = widths.map(w => s"SELECT * FROM agg_$w").mkString("\nUNION ALL ")
      s"""WITH k AS (
         |  SELECT user_id, count(*)::BIGINT AS n FROM events GROUP BY user_id),
         |top AS (SELECT user_id, n FROM k ORDER BY n DESC, user_id LIMIT 20),
         |$blocks
         |$union
         |ORDER BY width""".stripMargin
    },
    // the full CMS replay: same md5 buckets per (row j, key), every
    // cell an exact integer Σ over colliding keys, est = min over 4
    // cells — the sketch is replayed cell-for-cell, not approximated
    "q195_cms_frequency" ->
      """WITH k AS (
        |  SELECT user_id, count(*)::BIGINT AS n FROM events GROUP BY user_id),
        |b AS (
        |  SELECT user_id, n, t.j,
        |         ('0x' || substr(md5(t.j::VARCHAR || '|' || user_id::VARCHAR), 1, 8))::BIGINT
        |           % 1024 AS bucket
        |  FROM k, range(0, 4) t(j)),
        |cell AS (
        |  SELECT j, bucket, sum(n)::BIGINT AS cnt FROM b GROUP BY j, bucket),
        |est AS (
        |  SELECT b.user_id, b.n, min(cell.cnt)::BIGINT AS est
        |  FROM b JOIN cell ON b.j = cell.j AND b.bucket = cell.bucket
        |  GROUP BY b.user_id, b.n),
        |top AS (
        |  SELECT user_id, n FROM k ORDER BY n DESC, user_id LIMIT 10)
        |SELECT t.user_id, t.n, e.est, (e.est - t.n)::BIGINT AS overcount
        |FROM top t JOIN est e USING (user_id)
        |ORDER BY t.n DESC, t.user_id""".stripMargin,
    // the oracle is BLIND to the two-level sketch plan: it builds
    // registers directly at each coarse grain (q190's replay per
    // source and per lang) — store/merge losslessness is what's gated
    // same cents census, same integer overlap trim, same census-lookup
    // cut values, same three snapped divides
    "q295_robust_means" ->
      """WITH census AS (
        |  SELECT v, count(*)::BIGINT AS cnt FROM (
        |    SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v FROM orders)
        |  GROUP BY v),
        |cc AS (
        |  SELECT v, cnt, sum(cnt) OVER (ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM census),
        |tot AS (SELECT sum(cnt)::BIGINT AS n, sum(v * cnt)::BIGINT AS s,
        |               (sum(cnt) // 10)::BIGINT AS k FROM census),
        |interior AS (
        |  SELECT sum(greatest(least(cum, n - k) - greatest(cum - cnt, k), 0) * v)::BIGINT AS tsum
        |  FROM cc CROSS JOIN tot),
        |lo AS (SELECT min(v)::BIGINT AS lo FROM cc CROSS JOIN tot WHERE cum >= k + 1),
        |hi AS (SELECT min(v)::BIGINT AS hi FROM cc CROSS JOIN tot WHERE cum >= n - k)
        |SELECT n, k,
        |       floor(s::DOUBLE / n::DOUBLE + 0.5) / 100.0 AS mean,
        |       floor(tsum::DOUBLE / (n - 2 * k)::DOUBLE + 0.5) / 100.0 AS trimmed_mean,
        |       floor((tsum + k * lo + k * hi)::DOUBLE / n::DOUBLE + 0.5) / 100.0
        |         AS winsorized_mean,
        |       lo / 100.0 AS lo_cut, hi / 100.0 AS hi_cut
        |FROM tot CROSS JOIN interior CROSS JOIN lo CROSS JOIN hi""".stripMargin,
    // three full HLL replays (view / purchase / union) — same 60-bit
    // hash, exact BIGINT register chains, one fixed double chain each —
    // then the same inclusion–exclusion arithmetic, snapped at 4 dp
    "q289_hll_setops" -> {
      def chain(tag: String, pred: String): String =
        s"""h_$tag AS (
           |  SELECT DISTINCT ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
           |  FROM events WHERE $pred),
           |b_$tag AS (
           |  SELECT h // 281474976710656 AS bucket, h % 281474976710656 AS w
           |  FROM h_$tag),
           |r_$tag AS (
           |  SELECT bucket,
           |         max(CASE WHEN w = 0 THEN 49 ELSE 49 - length(bin(w)) END) AS reg
           |  FROM b_$tag GROUP BY bucket),
           |s_$tag AS (
           |  SELECT (sum(1::BIGINT << (49 - reg))
           |            + (4096 - count(*)) * 562949953421312)::BIGINT AS s,
           |         (4096 - count(*))::BIGINT AS v
           |  FROM r_$tag),
           |e_$tag AS (
           |  SELECT CASE WHEN 0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0
           |                   * 562949953421312.0 / s::DOUBLE <= 2.5 * 4096.0 AND v > 0
           |              THEN 4096.0 * ln(4096.0 / v)
           |              ELSE 0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0
           |                   * 562949953421312.0 / s::DOUBLE END AS est
           |  FROM s_$tag)""".stripMargin
      s"""WITH ${chain("a", "event_type = 'view'")},
         |${chain("b", "event_type = 'purchase'")},
         |${chain("u", "event_type IN ('view', 'purchase')")},
         |ex AS (
         |  SELECT count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END)::BIGINT AS exact_a,
         |         count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END)::BIGINT AS exact_b,
         |         count(DISTINCT user_id)::BIGINT AS exact_u
         |  FROM events WHERE event_type IN ('view', 'purchase'))
         |SELECT round(e_a.est, 4) + 0.0 AS est_view,
         |       round(e_b.est, 4) + 0.0 AS est_purchase,
         |       round(e_u.est, 4) + 0.0 AS est_union,
         |       round(e_a.est + e_b.est - e_u.est, 4) + 0.0 AS est_overlap,
         |       (exact_a + exact_b - exact_u)::BIGINT AS exact_overlap,
         |       round(abs(e_a.est + e_b.est - e_u.est -
         |                 (exact_a + exact_b - exact_u)::DOUBLE) /
         |             (exact_a + exact_b - exact_u)::DOUBLE, 4) + 0.0 AS rel_err
         |FROM e_a CROSS JOIN e_b CROSS JOIN e_u CROSS JOIN ex""".stripMargin
    },
    "q209_sketch_rollup" ->
      """WITH h AS (
        |  SELECT DISTINCT source, lang,
        |         ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM documents),
        |keys AS (
        |  SELECT 'source' AS dim, source AS key, h FROM h
        |  UNION ALL
        |  SELECT 'lang' AS dim, lang AS key, h FROM h),
        |hh AS (SELECT DISTINCT dim, key, h FROM keys),
        |b AS (
        |  SELECT dim, key, h // 281474976710656 AS bucket,
        |         h % 281474976710656 AS w
        |  FROM hh),
        |r AS (
        |  SELECT dim, key, bucket,
        |         max(CASE WHEN w = 0 THEN 49 ELSE 49 - length(bin(w)) END) AS reg
        |  FROM b GROUP BY dim, key, bucket),
        |s AS (
        |  SELECT dim, key,
        |         (sum(1::BIGINT << (49 - reg))
        |            + (4096 - count(*)) * 562949953421312)::BIGINT AS s,
        |         (4096 - count(*))::BIGINT AS v
        |  FROM r GROUP BY dim, key),
        |e0 AS (
        |  SELECT dim, key, v,
        |         0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0
        |           * 562949953421312.0 / s::DOUBLE AS raw
        |  FROM s),
        |est AS (
        |  SELECT dim, key,
        |         CASE WHEN raw <= 2.5 * 4096.0 AND v > 0
        |              THEN 4096.0 * ln(4096.0 / v) ELSE raw END AS est
        |  FROM e0),
        |ex AS (
        |  SELECT 'source' AS dim, source AS key,
        |         count(DISTINCT doc_id)::BIGINT AS exact_distinct
        |  FROM documents GROUP BY source
        |  UNION ALL
        |  SELECT 'lang' AS dim, lang AS key,
        |         count(DISTINCT doc_id)::BIGINT AS exact_distinct
        |  FROM documents GROUP BY lang)
        |SELECT est.dim, est.key, round(est.est, 4) + 0.0 AS est_distinct,
        |       ex.exact_distinct
        |FROM est JOIN ex USING (dim, key)
        |ORDER BY est.dim, est.key""".stripMargin,
    // the full HLL replay: same 60-bit md5 hash, same p=12 bucket split,
    // ρ from length(bin(w)) = exact MSB position (no float log2), the
    // harmonic sum as an exact BIGINT (order-invariant), and the one
    // fixed double chain token-for-token — bit-identical, not tolerance
    "q190_hll_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT source,
        |         ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM documents),
        |b AS (
        |  SELECT source, h // 281474976710656 AS bucket,
        |         h % 281474976710656 AS w
        |  FROM h),
        |r AS (
        |  SELECT source, bucket,
        |         max(CASE WHEN w = 0 THEN 49 ELSE 49 - length(bin(w)) END) AS reg
        |  FROM b GROUP BY source, bucket),
        |s AS (
        |  SELECT source,
        |         (sum(1::BIGINT << (49 - reg))
        |            + (4096 - count(*)) * 562949953421312)::BIGINT AS s,
        |         (4096 - count(*))::BIGINT AS v
        |  FROM r GROUP BY source),
        |e0 AS (
        |  SELECT source, v,
        |         0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0
        |           * 562949953421312.0 / s::DOUBLE AS raw
        |  FROM s),
        |est AS (
        |  SELECT source,
        |         CASE WHEN raw <= 2.5 * 4096.0 AND v > 0
        |              THEN 4096.0 * ln(4096.0 / v) ELSE raw END AS est
        |  FROM e0),
        |ex AS (
        |  SELECT source, count(DISTINCT doc_id)::BIGINT AS exact_distinct
        |  FROM documents GROUP BY source)
        |SELECT est.source, round(est.est, 4) + 0.0 AS est_distinct,
        |       ex.exact_distinct,
        |       round(abs(est.est - ex.exact_distinct) / ex.exact_distinct, 4) + 0.0
        |         AS rel_err
        |FROM est JOIN ex USING (source) ORDER BY source""".stripMargin,
    "q172_regression_aggs" ->
      """SELECT l_returnflag, count(*)::BIGINT AS n,
        |       round(regr_slope(l_extendedprice, l_quantity), 6) + 0.0 AS slope,
        |       round(regr_intercept(l_extendedprice, l_quantity), 6) + 0.0 AS intercept,
        |       round(regr_r2(l_extendedprice, l_quantity), 6) + 0.0 AS r2,
        |       round(corr(l_extendedprice, l_quantity), 6) + 0.0 AS corr_pq
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // the heap aggregator must equal the plain window top-3 — exact op
    "q91_grouped_topk" ->
      """WITH r AS (
        |  SELECT source, doc_id, n_chars,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY n_chars DESC, doc_id ASC) AS rn
        |  FROM documents)
        |SELECT source, rn::BIGINT AS rn, doc_id, n_chars
        |FROM r WHERE rn <= 3 ORDER BY source, rn""".stripMargin,
    // exact regime (capacity ≥ distinct keys): the sketch must equal
    // the plain exact top-10 — no tolerance
    "q86_heavy_hitters" ->
      """SELECT user_id, count(*)::BIGINT AS n_events
        |FROM events GROUP BY user_id
        |ORDER BY n_events DESC, user_id ASC LIMIT 10""".stripMargin,
    // the SAME md5-uniform hashes, bottom-8 per source, and the
    // (k-1)/u_(k) estimator replayed in SQL — the u values are exact
    // dyadic rationals, so every float op is bit-identical
    "q90_kmv_distinct" ->
      """WITH u AS (
        |  SELECT DISTINCT source,
        |         (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT + 1) / 4294967296.0 AS u
        |  FROM documents),
        |r AS (
        |  SELECT source, u,
        |         row_number() OVER (PARTITION BY source ORDER BY u) AS rn
        |  FROM u),
        |s AS (
        |  SELECT source, max(u) AS uk, count(*)::BIGINT AS kk
        |  FROM r WHERE rn <= 8 GROUP BY source),
        |e AS (
        |  SELECT source, count(DISTINCT doc_id)::BIGINT AS exact_distinct
        |  FROM documents GROUP BY source),
        |est AS (
        |  SELECT s.source,
        |         CASE WHEN s.kk < 8 THEN s.kk::DOUBLE ELSE 7.0 / s.uk END AS est,
        |         e.exact_distinct
        |  FROM s JOIN e USING (source))
        |SELECT source, round(est, 4) AS est_distinct, exact_distinct,
        |       round(abs(est - exact_distinct) / exact_distinct, 4) AS rel_err
        |FROM est ORDER BY source""".stripMargin,
    "q02_distinct_agg" ->
      """SELECT o_orderpriority,
        |  count(*) AS n_orders,
        |  count(DISTINCT o_custkey) AS n_cust,
        |  round(sum(DISTINCT o_totalprice), 2) AS sum_distinct_price,
        |  round(min(o_totalprice), 2) AS min_price,
        |  round(max(o_totalprice), 2) AS max_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q03_stats_agg" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(stddev_pop(l_quantity), 4) AS sdp_qty,
        |  round(var_samp(l_quantity), 4) AS var_qty,
        |  round(var_pop(l_quantity), 4) AS varp_qty,
        |  round(corr(l_quantity, l_extendedprice), 4) + 0.0 AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) + 0.0 AS covs_qty_price,
        |  round(covar_pop(l_quantity, l_extendedprice), 2) + 0.0 AS covp_qty_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q04_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INTEGER) AS gid,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "q05_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INTEGER) AS gid,
        |  count(*) AS n,
        |  round(sum(o_totalprice), 2) AS sum_total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin,
    "q06_pivot" ->
      """SELECT l_returnflag,
        |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F,
        |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q07_collect_set" ->
      """SELECT o_orderstatus,
        |  array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities,
        |  CAST(len(list(DISTINCT o_orderpriority)) AS INTEGER) AS n_priorities
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // identical ground truth to q09 — the histogram path must be exact
    "q09b_percentile_hist" ->
      """SELECT l_linestatus,
        |  round(quantile_cont(l_quantity, 0.25), 4) AS p25_qty,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
        |  round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q09_percentile" ->
      """SELECT l_linestatus,
        |  round(quantile_cont(l_quantity, 0.25), 4) AS p25_qty,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
        |  round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
