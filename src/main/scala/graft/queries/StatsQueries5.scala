package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 widening, fifth batch: two graph-analytics depth rows over
  * the q140 customer–supplier co-purchase graph — Katz centrality (the
  * attenuated-path member of the centrality family: q140's PageRank is
  * the random-walk stationary view; Katz counts all walks, geometrically
  * damped) and the Clauset-style discrete power-law degree exponent (the
  * heavy-tail diagnostic that says whether hub-removal robustness
  * (q407) even matters).
  */
object StatsQueries5 extends QueryModule {

  private def copurchaseEdges(spark: SparkSession, dir: String): DataFrame = {
    val e0 = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** q477: KATZ CENTRALITY — Σ_k α^k · (walks of length k ending at v)
    * truncated at k = 5 with α = 1/4, on the q140 bipartite co-purchase
    * graph: the centrality that credits ALL incoming walks (PageRank
    * normalizes away volume; Katz keeps it — the "influence" reading).
    *
    * Determinism: walk counts are exact BIGINTs (five edge-join rounds,
    * the Pregel-as-joins shape of `PageRank.run`); α = 1/4 makes every
    * damping weight a power of two, so the score is the exact BIGINT
    * Σ 4^(5−k)·walks_k on the ×1024 lattice; top-20 under a total
    * (score, node) order. Scale: each round is one shuffle join of the
    * edge table against the |V|-row count table + an aggregate — no
    * driver-side graph state.
    */
  def q477KatzCentrality(spark: SparkSession, dir: String): DataFrame = {
    val edges = copurchaseEdges(spark, dir).localCheckpoint()
    val p1 = edges.groupBy("dst").agg(count(lit(1)).as("pc"))
      .select(col("dst").as("node"), col("pc"))
    def step(pk: DataFrame): DataFrame =
      edges.join(pk, edges("src") === pk("node"))
        .groupBy("dst").agg(sum("pc").as("pc"))
        .select(col("dst").as("node"), col("pc"))
    val walks = Iterator.iterate(p1)(step).take(5).toSeq
    walks.zipWithIndex.map { case (df, i) =>
      // k = i + 1, weight 4^(5-k) = 2^(2*(4-i))
      df.select(col("node"),
        (col("pc") * lit(1L << (2 * (4 - i)))).as("kq"),
        when(lit(i) === 0, col("pc")).otherwise(lit(0L)).as("deg"))
    }.reduce(_ unionByName _)
      .groupBy("node")
      .agg(sum("kq").as("katz_q1024"), max("deg").as("degree"))
      .orderBy(col("katz_q1024").desc, col("node").asc)
      .limit(20)
      .select(col("node"), col("degree"), col("katz_q1024"),
        expr("round(CAST(katz_q1024 AS DOUBLE) / 1024, 6)").as("katz"))
  }

  /** q478: DISCRETE POWER-LAW DEGREE EXPONENT — the Clauset–Shalizi–
    * Newman MLE α̂ = 1 + n / Σ ln(d/(d_min − ½)) over tail degrees
    * d ≥ 5 of the co-purchase graph (q379's Hill index reads revenue
    * tails; this reads the GRAPH's hub structure — α near 2 means
    * hub-dominated, near 3+ means egalitarian).
    *
    * Determinism: the degree census is exact; each census row's
    * cnt·ln(d/4.5) term is snapped to 1e-9 BEFORE the tail sum (the
    * q435 device — counts multiply the snapped value, so the sum is an
    * exact BIGINT); α̂ is one mirrored chain. Scale: one edge aggregate
    * to a degree census (bounded by the degree domain).
    */
  def q478DegreePowerLaw(spark: SparkSession, dir: String): DataFrame = {
    val deg = copurchaseEdges(spark, dir)
      .groupBy("src").agg(count(lit(1)).as("d"))
    val census = deg.groupBy("d").agg(count(lit(1)).as("cnt"))
    census.filter(col("d") >= 5)
      .agg(sum("cnt").as("n_tail"),
        sum(expr(
          "cnt * CAST(floor(ln(CAST(d AS DOUBLE) / CAST('4.5' AS DOUBLE)) * 1.0e9 + 0.5) AS BIGINT)"))
          .as("lnsum_e9"))
      .crossJoin(broadcast(census.agg(sum("cnt").as("n_nodes"), max("d").as("d_max"))))
      .select(col("n_nodes"), col("n_tail"), col("d_max"),
        lit(5L).as("d_min"),
        expr("round(CAST(1 AS DOUBLE) + n_tail / (CAST(lnsum_e9 AS DOUBLE) / 1.0e9), 6)")
          .as("alpha"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q477_katz_centrality" -> (q477KatzCentrality _),
    "q478_degree_power_law" -> (q478DegreePowerLaw _)
  )

  override val oracles: Map[String, String] = Map(
    // same five exact walk-count rounds, same ×1024 damping lattice,
    // same total top-20 tie-break
    "q477_katz_centrality" ->
      """WITH e0 AS (
        |  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |edges AS (
        |  SELECT src, dst FROM e0
        |  UNION ALL SELECT dst AS src, src AS dst FROM e0),
        |p1 AS (SELECT dst AS node, count(*)::BIGINT AS pc FROM edges GROUP BY 1),
        |p2 AS (SELECT e.dst AS node, sum(p.pc)::BIGINT AS pc
        |       FROM edges e JOIN p1 p ON e.src = p.node GROUP BY 1),
        |p3 AS (SELECT e.dst AS node, sum(p.pc)::BIGINT AS pc
        |       FROM edges e JOIN p2 p ON e.src = p.node GROUP BY 1),
        |p4 AS (SELECT e.dst AS node, sum(p.pc)::BIGINT AS pc
        |       FROM edges e JOIN p3 p ON e.src = p.node GROUP BY 1),
        |p5 AS (SELECT e.dst AS node, sum(p.pc)::BIGINT AS pc
        |       FROM edges e JOIN p4 p ON e.src = p.node GROUP BY 1),
        |stacked AS (
        |  SELECT node, pc * 256 AS kq, pc AS deg FROM p1
        |  UNION ALL SELECT node, pc * 64, 0 FROM p2
        |  UNION ALL SELECT node, pc * 16, 0 FROM p3
        |  UNION ALL SELECT node, pc * 4, 0 FROM p4
        |  UNION ALL SELECT node, pc * 1, 0 FROM p5),
        |katz AS (
        |  SELECT node, sum(kq)::BIGINT AS katz_q1024, max(deg)::BIGINT AS degree
        |  FROM stacked GROUP BY 1)
        |SELECT node, degree, katz_q1024,
        |       round(katz_q1024::DOUBLE / 1024, 6) + 0.0 AS katz
        |FROM katz
        |QUALIFY row_number() OVER (ORDER BY katz_q1024 DESC, node ASC) <= 20""".stripMargin,
    // same degree census, same 1e-9 per-row ln snaps, same α̂ chain
    "q478_degree_power_law" ->
      """WITH e0 AS (
        |  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |edges AS (
        |  SELECT src, dst FROM e0
        |  UNION ALL SELECT dst AS src, src AS dst FROM e0),
        |deg AS (SELECT src, count(*)::BIGINT AS d FROM edges GROUP BY 1),
        |census AS (SELECT d, count(*)::BIGINT AS cnt FROM deg GROUP BY 1),
        |tail AS (
        |  SELECT sum(cnt)::BIGINT AS n_tail,
        |         sum(cnt * floor(ln(d::DOUBLE / CAST('4.5' AS DOUBLE)) * 1.0e9 + 0.5)::BIGINT)::BIGINT AS lnsum_e9
        |  FROM census WHERE d >= 5),
        |tot AS (SELECT sum(cnt)::BIGINT AS n_nodes, max(d)::BIGINT AS d_max FROM census)
        |SELECT t.n_nodes, a.n_tail, t.d_max, 5::BIGINT AS d_min,
        |       round(CAST(1 AS DOUBLE) + a.n_tail / (a.lnsum_e9::DOUBLE / 1.0e9), 6) + 0.0 AS alpha
        |FROM tail a, tot t""".stripMargin
  )
}
