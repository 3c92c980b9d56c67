package graft.queries

import graft.Tables
import graft.operators.AsOfJoin
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join surface (SURVEY.md §2B "Joins"): every join type, plus the as-of
  * join helper. Physical-strategy posture for 100 TB:
  *  - TRUE dimension tables (region 5 rows … part 200k rows at sf1000)
  *    are explicitly `broadcast()` — no shuffle of the fact table for
  *    them. `customer` is NOT hinted: at sf1000 it is ~150M rows
  *    (~30 GB) and a forced broadcast would OOM executors; left to AQE
  *    it broadcasts below the threshold (as at bench scale, where
  *    PlanShapeSpec asserts the BroadcastHashJoin still appears) and
  *    falls back to SMJ above it;
  *  - fact-fact joins (lineitem ⋈ orders) shuffle on the join key once;
  *    AQE handles skew splitting;
  *  - the theta join is a within-group nested loop on a *dimension*
  *    (part ⋈ part by brand) — never on a fact table;
  *  - as-of join is one shuffle + window, not an interval product
  *    (see AsOfJoin scaladoc).
  */
object JoinQueries extends QueryModule {

  /** TPC-H Q3-style: fact ⋈ fact ⋈ broadcast(dim), filtered both sides. */
  def q10JoinShipping(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1996-06-30").cast("timestamp"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
    val c = Tables.customer(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      // no broadcast hint: customer is fact-sized at sf1000 — AQE decides
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_orderpriority")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("c_mktsegment", "o_orderpriority")
  }

  /** TPC-H Q5-style: 6-way join, region-filtered, broadcast dim chain. */
  def q11JoinNationRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir).filter(col("r_name").isin("ASIA", "EUROPE"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      // no broadcast hint: customer is fact-sized at sf1000 — AQE decides
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(s),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("r_name", "n_name")
  }

  /** LEFT OUTER join preserving unmatched left rows (null-counting). */
  def q12JoinLeft(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "P")
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_mktsegment")
      .agg(
        countDistinct(col("c_custkey")).as("n_cust"),
        count(col("o_orderkey")).as("n_pending_orders"),
        sum(when(col("o_orderkey").isNull, 1).otherwise(0)).as("n_unmatched_rows"))
      .orderBy("c_mktsegment")
  }

  /** RIGHT OUTER join (unsold parts per brand). */
  def q13JoinRight(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).filter(col("l_quantity") >= 45)
    val p = Tables.part(spark, dir)
    li.join(p, col("l_partkey") === col("p_partkey"), "right")
      .groupBy("p_brand")
      .agg(
        countDistinct(col("p_partkey")).as("n_parts"),
        countDistinct(when(col("l_orderkey").isNull, col("p_partkey"))).as("n_unsold"),
        round(sum(coalesce(col("l_quantity"), lit(0.0))), 2).as("sum_qty"))
      .orderBy("p_brand")
  }

  /** FULL OUTER join of two pre-aggregated sides (null-preserving both ways). */
  def q14JoinFull(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey").as("nationkey")).agg(count(lit(1)).as("n_cust"))
    val supp = Tables.supplier(spark, dir)
      .groupBy(col("s_nationkey").as("nationkey")).agg(count(lit(1)).as("n_supp"))
    cust.withColumnRenamed("nationkey", "c_nk")
      .join(supp.withColumnRenamed("nationkey", "s_nk"),
        col("c_nk") === col("s_nk"), "full")
      .select(
        coalesce(col("c_nk"), col("s_nk")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nationkey")
  }

  /** LEFT SEMI: orders having ≥1 big lineitem (EXISTS). */
  def q15JoinSemi(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val big = Tables.lineitem(spark, dir).filter(col("l_quantity") >= 48)
    o.join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("sum_total"))
      .orderBy("o_orderstatus")
  }

  /** LEFT ANTI: orders with no returned ('R') lineitem (NOT EXISTS).
    * The build side is projected to `distinct l_orderkey` BEFORE the join:
    * an anti join only needs key existence, so shrinking ~25% of lineitem
    * to its distinct keys makes the build side broadcastable at any SF
    * (BroadcastHashJoin, no shuffle of orders) instead of sort-merge
    * joining the full filtered fact table. */
  def q16JoinAnti(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val returned = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey").distinct()
    o.join(returned, col("o_orderkey") === col("l_orderkey"), "left_anti")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** CROSS join (dimension × tiny distinct set — BroadcastNestedLoop). */
  def q17JoinCross(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir)
    val st = Tables.orders(spark, dir).select("o_orderstatus").distinct()
    r.crossJoin(st)
      .select(col("r_name"), col("o_orderstatus"))
      .orderBy("r_name", "o_orderstatus")
  }

  /** Theta (non-equi) join: same-brand part pairs with strictly increasing
    * size. Dimension-only nested loop; at scale this stays broadcastable. */
  def q18JoinTheta(spark: SparkSession, dir: String): DataFrame = {
    val p1 = Tables.part(spark, dir).select(
      col("p_brand").as("brand"), col("p_partkey").as("k1"), col("p_size").as("sz1"))
    val p2 = Tables.part(spark, dir).select(
      col("p_brand").as("brand2"), col("p_partkey").as("k2"), col("p_size").as("sz2"))
    p1.join(p2, col("brand") === col("brand2") && col("sz1") < col("sz2"))
      .groupBy(col("brand").as("p_brand"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("sz2") - col("sz1")).cast("long").as("sum_gap"))
      .orderBy("p_brand")
  }

  /** q18b: the 100 TB path for q18's theta-join aggregate. The pair count
    * and gap sum per brand are order statistics: with sizes sorted within
    * each brand, each row's contribution is (count, sum) of the strictly
    * smaller sizes — a running window with a range frame ending at -1.
    * One shuffle on brand + per-partition sort = O(n log n), versus the
    * nested-loop O(n²/brand) pair expansion; verified against the SAME
    * oracle as q18.
    */
  def q18bJoinThetaWindow(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("p_brand").orderBy("p_size")
      .rangeBetween(Window.unboundedPreceding, -1)
    Tables.part(spark, dir)
      .select(col("p_brand"), col("p_size"))
      .withColumn("cnt_less", count(lit(1)).over(w))
      .withColumn("sum_less", coalesce(sum("p_size").over(w), lit(0L)))
      .groupBy("p_brand")
      .agg(
        sum("cnt_less").as("n_pairs"),
        sum(col("p_size") * col("cnt_less") - col("sum_less")).cast("long").as("sum_gap"))
      .orderBy("p_brand")
  }

  /** As-of join: each event enriched with the user's latest signup at or
    * before it (AsOfJoin.backward — union + running-last, single shuffle). */
  def q19JoinAsof(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select("event_id", "user_id", "ts", "event_type")
    val signups = Tables.events(spark, dir)
      .filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id").as("signup_event_id"))
    AsOfJoin.backward(
      e, signups,
      keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
      carry = Map("signup_event_id" -> "signup_event_id"))
      .orderBy("event_id")
  }

  /** q65: FORWARD as-of with tolerance — each event matched to the user's
    * NEXT signup within 3 days (AsOfJoin.forward: same single-shuffle
    * union + running-last as q19, walked in descending time; the carried
    * row's own timestamp gates the tolerance).
    */
  def q65JoinAsofForward(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select("event_id", "user_id", "ts", "event_type")
    val signups = Tables.events(spark, dir)
      .filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id").as("next_signup_id"))
    AsOfJoin.forward(
      e, signups,
      keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
      carry = Map("next_signup_id" -> "next_signup_id"),
      tolerance = Some("3 days"))
      .orderBy("event_id")
  }

  /** q71: the salted skew join through the oracle gate — the same
    * per-brand aggregate a plain lineitem⋈part equi-join computes, but
    * executed via `operators/SaltedJoin` (skewed side salted on a
    * row-unique column, dim side replicated ×8, join key = (key,
    * salt)). The oracle is the UNSALTED SQL join: salting must be
    * result-invariant, here hash-checked by the driver on top of
    * `SaltedJoinSpec`'s row-identity test.
    */
  def q71SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("p_partkey"), col("l_orderkey"),
        col("l_linenumber"), col("l_quantity"))
    val p = Tables.part(spark, dir).select("p_partkey", "p_brand")
    graft.operators.SaltedJoin.inner(l, p,
        key = "p_partkey", saltFrom = "l_orderkey", factor = 8)
      .groupBy("p_brand")
      .agg(
        count(lit(1)).as("n"),
        round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("p_brand")
  }

  /** q179: the MACRO star join — a TPC-H Q5-shaped six-table query
    * (local-supplier revenue per nation for one region and one order
    * year) composing what q10–q18 gate one edge at a time: two fact
    * tables joined on their key, four dimension hops, a selective
    * region filter that prunes through two joins, and the extra
    * c_nationkey = s_nationkey equality that makes the supplier
    * "local". No broadcast hints anywhere: the 100 TB plan is
    * AQE's call — dims broadcast under the threshold (plan-gated at
    * bench scale), the lineitem⋈orders fact edge shuffles on its key,
    * and the date filter pushes into the orders scan. Revenue sums are
    * engine-order-dependent doubles at 1e8 scale with ~1e-5 absolute
    * noise — round 2 holds with 10³ of margin.
    */
  def q179StarJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
            col("o_orderdate") < lit("1997-01-01").cast("date")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  /** q191: SPATIAL radius join by grid partitioning (the PBSM / Spatial
    * Spark pattern; Patel & DeWitt SIGMOD '96): find, for every
    * supplier, the customers within radius r of it, without a
    * distance-theta join. Coordinates are derived deterministically
    * from md5 of the keys (both engines compute the identical doubles),
    * the metric is squared euclidean in coordinate space — every op
    * (+, −, ×, ≤) exactly rounded IEEE on identical inputs, so the
    * comparison is bit-identical with no trig-libm exposure; production
    * swaps in real lat/lon + haversine refine, same plan.
    *
    * Algorithm: cell size = r, so any pair within r lands in ADJACENT
    * cells. The small side (suppliers) replicates into its 3×3 cell
    * neighborhood (a constant ×9, never data-dependent), the big side
    * (customers) computes its single cell scan-locally, and the
    * candidate set is a plain EQUI-join on the cell key — the only
    * shuffle is by cell, exactly the grid co-location a 100 TB point
    * table wants (PlanShapeSpec: no CartesianProduct/BNLJ even with
    * auto-broadcast off; a raw `d2 <= r²` theta join would plan BNLJ).
    * Dense-cell skew is AQE's skew-join case. The exact d² ≤ r² refine
    * runs post-join, scan-local. Zero-match suppliers are kept by a
    * final left join against the (supplier-row-count-sized) match
    * summary; nearest neighbor is a struct-min argmin, never a window
    * over the pair stream.
    */
  def q191SpatialGridJoin(spark: SparkSession, dir: String): DataFrame = {
    val r = 2.0 // cell size == radius; /2.0 is exponent-exact in IEEE
    def lat(prefix: String, key: Column): Column =
      (conv(substring(md5(concat(lit(prefix), key.cast("string"))), 1, 6), 16, 10)
        .cast("long") % 1200000).cast("double") / 10000.0 - 60.0
    def lon(prefix: String, key: Column): Column =
      (conv(substring(md5(concat(lit(prefix), key.cast("string"))), 7, 6), 16, 10)
        .cast("long") % 3600000).cast("double") / 10000.0 - 180.0
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"),
        lat("C", col("c_custkey")).as("clat"), lon("C", col("c_custkey")).as("clon"))
      .withColumn("cellx", floor(col("clon") / r))
      .withColumn("celly", floor(col("clat") / r))
    val supp = Tables.supplier(spark, dir)
      .select(col("s_suppkey"),
        lat("S", col("s_suppkey")).as("slat"), lon("S", col("s_suppkey")).as("slon"))
    val supp9 = supp
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("cellx", floor(col("slon") / r) + col("dx"))
      .withColumn("celly", floor(col("slat") / r) + col("dy"))
    val d2 = (col("clat") - col("slat")) * (col("clat") - col("slat")) +
      (col("clon") - col("slon")) * (col("clon") - col("slon"))
    val matches = supp9.join(cust, Seq("cellx", "celly"))
      .withColumn("d2", d2)
      .filter(col("d2") <= lit(r * r))
      .groupBy("s_suppkey")
      .agg(count(lit(1)).as("n_within"),
        min(struct(col("d2"), col("c_custkey"))).as("m"))
    supp.select(col("s_suppkey"))
      .join(matches, Seq("s_suppkey"), "left")
      .select(col("s_suppkey"),
        coalesce(col("n_within"), lit(0L)).as("n_within"),
        col("m.c_custkey").as("nearest_cust"),
        round(col("m.d2"), 6).as("nearest_d2"))
      .orderBy("s_suppkey")
  }

  /** q339: RUNTIME BLOOM-FILTER join (Spark's InjectRuntimeFilter) —
    * the semi-join reduction every warehouse engine ships (Spark calls
    * it a runtime filter, Trino/Snowflake dynamic filtering): a
    * selective dimension predicate builds a Bloom filter at runtime
    * that prunes the FACT side's scan before the shuffle, so rows that
    * cannot join never cross the wire. Here: urgent orders ⋈ lineitem
    * under scoped confs (auto-broadcast off so the shuffle join is
    * eligible, application-side threshold 0 so the fixture-scale scan
    * qualifies) — `PlanShapeSpec` pins `might_contain` on the lineitem
    * scan; this gate pins that the FILTERED plan's RESULT is exactly
    * the unfiltered semantics (a Bloom false-positive policy bug or a
    * dropped partial would diverge).
    *
    * Determinism: exact integer cents census. Scale: at 100 TB this
    * filter is the difference between shuffling the whole fact table
    * and shuffling the ~1/5 that can match — the single biggest
    * runtime win on selective star joins.
    */
  def q339RuntimeBloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val o = Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val l = Tables.lineitem(spark, dir).select(col("l_orderkey"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("cents"),
        col("l_returnflag"))
      // EXECUTE while the scoped confs are visible — the caller's noop
      // write happens after the finally, and a write re-plans; the
      // localCheckpoint runs the bloom-filtered plan for real and hands
      // back its (census-sized) result
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("cents").as("cents_sum"))
        .orderBy("l_returnflag")
        .localCheckpoint(true)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q339_runtime_bloom_join" -> (q339RuntimeBloomJoin _),
    "q191_spatial_grid_join" -> (q191SpatialGridJoin _),
    "q179_star_join" -> (q179StarJoin _),
    "q71_salted_join" -> (q71SaltedJoin _),
    "q10_join_shipping" -> (q10JoinShipping _),
    "q11_join_nation_revenue" -> (q11JoinNationRevenue _),
    "q12_join_left" -> (q12JoinLeft _),
    "q13_join_right" -> (q13JoinRight _),
    "q14_join_full" -> (q14JoinFull _),
    "q15_join_semi" -> (q15JoinSemi _),
    "q16_join_anti" -> (q16JoinAnti _),
    "q17_join_cross" -> (q17JoinCross _),
    "q18_join_theta" -> (q18JoinTheta _),
    "q18b_join_theta_window" -> (q18bJoinThetaWindow _),
    "q19_join_asof" -> (q19JoinAsof _),
    "q65_join_asof_forward" -> (q65JoinAsofForward _),
    "q92_binned_range_join" -> (q92BinnedRangeJoin _)
  )

  /** q92: interval join at scale — every lineitem matched to the parts
    * whose size window [p_size−2, p_size+2] contains its quantity,
    * through `operators/BinnedRangeJoin` (bin equi-join + post-filter)
    * instead of the nested-loop plan a raw BETWEEN join gets. binWidth 5
    * = the interval width, so each part lands in ≤ 2 bins; the lineitem
    * side shuffles once on its single bin. Census per brand so the gate
    * compares the full 10M-pair match, not a sample. PlanShapeSpec
    * asserts the plan has no BroadcastNestedLoopJoin/CartesianProduct
    * (the raw-theta q18 shape).
    */
  def q92BinnedRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    // a 10% order slice against one brand's size windows keeps the true
    // pair count gate-sized (the interval predicate itself matches 10%
    // of any part slice per line — an exact census over the full
    // cross-product would be the answer's size, not the plan's fault)
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 10 === 0)
      .select(col("l_quantity").cast("long").as("qty"))
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#23")
      .select(col("p_type"),
        (col("p_size") - 2).cast("long").as("lo"),
        (col("p_size") + 2).cast("long").as("hi"))
    graft.operators.BinnedRangeJoin.inner(l, p, "qty", "lo", "hi", binWidth = 5)
      .groupBy("p_type")
      .agg(count(lit(1)).as("n_pairs"), sum(col("qty")).as("sum_qty"))
      .orderBy("p_type")
  }

  override val oracles: Map[String, String] = Map(
    // the UNFILTERED semantics: a runtime-filter false-positive-policy
    // bug or dropped partial on the engine side diverges from this
    "q339_runtime_bloom_join" ->
      """SELECT l_returnflag, count(*)::BIGINT AS n,
        |       sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))::BIGINT
        |         AS cents_sum
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // the oracle is the BLIND quadratic radius join — same derived
    // coordinates, same squared-euclidean refine, no grid; a cell that
    // drops a boundary pair or double-counts a replicated supplier
    // flips n_within / the argmin
    "q191_spatial_grid_join" ->
      """WITH c AS (
        |  SELECT c_custkey,
        |         (('0x'||substr(md5('C'||c_custkey::VARCHAR),1,6))::BIGINT % 1200000)
        |           / 10000.0 - 60.0 AS clat,
        |         (('0x'||substr(md5('C'||c_custkey::VARCHAR),7,6))::BIGINT % 3600000)
        |           / 10000.0 - 180.0 AS clon
        |  FROM customer),
        |s AS (
        |  SELECT s_suppkey,
        |         (('0x'||substr(md5('S'||s_suppkey::VARCHAR),1,6))::BIGINT % 1200000)
        |           / 10000.0 - 60.0 AS slat,
        |         (('0x'||substr(md5('S'||s_suppkey::VARCHAR),7,6))::BIGINT % 3600000)
        |           / 10000.0 - 180.0 AS slon
        |  FROM supplier),
        |p AS (
        |  SELECT s.s_suppkey, c.c_custkey,
        |         (c.clat - s.slat)*(c.clat - s.slat)
        |           + (c.clon - s.slon)*(c.clon - s.slon) AS d2
        |  FROM s, c
        |  WHERE (c.clat - s.slat)*(c.clat - s.slat)
        |          + (c.clon - s.slon)*(c.clon - s.slon) <= 4.0),
        |a AS (
        |  SELECT s_suppkey, c_custkey, d2,
        |         count(*) OVER (PARTITION BY s_suppkey) AS n_within,
        |         row_number() OVER (PARTITION BY s_suppkey
        |                            ORDER BY d2, c_custkey) AS rn
        |  FROM p)
        |SELECT s.s_suppkey, coalesce(a.n_within, 0)::BIGINT AS n_within,
        |       a.c_custkey AS nearest_cust, round(a.d2, 6) + 0.0 AS nearest_d2
        |FROM s LEFT JOIN (SELECT * FROM a WHERE rn = 1) a USING (s_suppkey)
        |ORDER BY s.s_suppkey""".stripMargin,
    "q179_star_join" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) + 0.0 AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    // the raw BETWEEN join — the oracle is blind to the binning, so a
    // bin that drops or duplicates a pair flips the census
    "q92_binned_range_join" ->
      """SELECT p.p_type, count(*)::BIGINT AS n_pairs, sum(l.qty)::BIGINT AS sum_qty
        |FROM (SELECT l_quantity::BIGINT AS qty FROM lineitem WHERE l_orderkey % 10 = 0) l
        |JOIN (SELECT p_type, (p_size - 2)::BIGINT AS lo, (p_size + 2)::BIGINT AS hi
        |      FROM part WHERE p_brand = 'Brand#23') p
        |  ON l.qty BETWEEN p.lo AND p.hi
        |GROUP BY p.p_type ORDER BY p.p_type""".stripMargin,
    // the UNSALTED join: salting must be result-invariant
    "q71_salted_join" ->
      """SELECT p_brand, count(*)::BIGINT AS n,
        |       round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q10_join_shipping" ->
      """SELECT c_mktsegment, o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_shipdate > TIMESTAMP '1996-06-30'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY c_mktsegment, o_orderpriority
        |ORDER BY c_mktsegment, o_orderpriority""".stripMargin,
    "q11_join_nation_revenue" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name IN ('ASIA', 'EUROPE')
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q12_join_left" ->
      """SELECT c_mktsegment,
        |  count(DISTINCT c_custkey) AS n_cust,
        |  count(o_orderkey) AS n_pending_orders,
        |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched_rows
        |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') o
        |  ON c_custkey = o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q13_join_right" ->
      """SELECT p_brand,
        |  count(DISTINCT p_partkey) AS n_parts,
        |  count(DISTINCT CASE WHEN l_orderkey IS NULL THEN p_partkey END) AS n_unsold,
        |  round(sum(coalesce(l_quantity, 0.0)), 2) AS sum_qty
        |FROM (SELECT * FROM lineitem WHERE l_quantity >= 45) li
        |RIGHT JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q14_join_full" ->
      """SELECT coalesce(c_nk, s_nk) AS nationkey,
        |  coalesce(n_cust, 0) AS n_cust,
        |  coalesce(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS c_nk, CAST(count(*) AS BIGINT) AS n_cust
        |      FROM customer GROUP BY c_nationkey) c
        |FULL OUTER JOIN (SELECT s_nationkey AS s_nk, CAST(count(*) AS BIGINT) AS n_supp
        |      FROM supplier GROUP BY s_nationkey) s
        |  ON c_nk = s_nk
        |ORDER BY nationkey""".stripMargin,
    "q15_join_semi" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS sum_total
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q16_join_anti" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q17_join_cross" ->
      """SELECT r_name, o_orderstatus
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
        |ORDER BY r_name, o_orderstatus""".stripMargin,
    "q18_join_theta" ->
      """SELECT p1.p_brand,
        |  count(*) AS n_pairs,
        |  CAST(sum(p2.p_size - p1.p_size) AS BIGINT) AS sum_gap
        |FROM part p1 JOIN part p2
        |  ON p1.p_brand = p2.p_brand AND p1.p_size < p2.p_size
        |GROUP BY p1.p_brand ORDER BY p1.p_brand""".stripMargin,
    // Same ground truth as q18 — q18b is the O(n log n) plan for the same
    // aggregate, so it must reproduce the nested-loop result exactly.
    "q18b_join_theta_window" ->
      """SELECT p1.p_brand,
        |  count(*) AS n_pairs,
        |  CAST(sum(p2.p_size - p1.p_size) AS BIGINT) AS sum_gap
        |FROM part p1 JOIN part p2
        |  ON p1.p_brand = p2.p_brand AND p1.p_size < p2.p_size
        |GROUP BY p1.p_brand ORDER BY p1.p_brand""".stripMargin,
    "q19_join_asof" ->
      """SELECT e.event_id, e.user_id, e.ts, e.event_type,
        |  s.signup_event_id
        |FROM events e
        |ASOF LEFT JOIN (SELECT user_id AS su, ts AS sts, event_id AS signup_event_id
        |                FROM events WHERE event_type = 'signup') s
        |  ON e.user_id = s.su AND e.ts >= s.sts
        |ORDER BY e.event_id""".stripMargin,
    // forward ASOF; tolerance applied to the matched row's own timestamp
    "q65_join_asof_forward" ->
      """SELECT e.event_id, e.user_id, e.ts, e.event_type,
        |  CASE WHEN s.sts <= e.ts + INTERVAL 3 DAYS THEN s.next_signup_id END AS next_signup_id
        |FROM events e
        |ASOF LEFT JOIN (SELECT user_id AS su, ts AS sts, event_id AS next_signup_id
        |                FROM events WHERE event_type = 'signup') s
        |  ON e.user_id = s.su AND e.ts <= s.sts
        |ORDER BY e.event_id""".stripMargin
  )
}
