package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sort / limit / top-k / set-op / dedup / sample / explode surface
  * (SURVEY.md §2B "Sort / limit / top-k / set ops / dedup").
  *
  * Scale notes:
  *  - top-k goes through `orderBy().limit(k)` which Catalyst plans as
  *    `TakeOrderedAndProjectExec` — per-partition heaps + a k-row merge
  *    on the driver, NEVER a global sort (asserted in PlanShapeSpec);
  *  - set ops are hash aggregations / joins on the compared columns,
  *    one shuffle each, map-side partial where applicable;
  *  - the sample is a deterministic md5-prefix filter (both engines
  *    compute md5 identically), which pushes down as a cheap scan-side
  *    predicate — no rand(), so the oracle can reproduce it;
  *  - explode is a Generate node feeding a partial-agg — the word-count
  *    shuffle moves (word, partial_count), not exploded rows.
  */
object SetOpsQueries extends QueryModule {

  /** UNION ALL of two branch selections (unionByName), then re-aggregated.
    * Branch tags make multiset semantics visible to the oracle. */
  def q25Union(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_totalprice"), lit("urgent").as("src"))
    // Different column ORDER on purpose: unionByName resolves by name,
    // where positional union would mis-zip (src, o_orderkey).
    val fin = o.filter(col("o_orderstatus") === "F")
      .select(lit("finished").as("src"), col("o_orderkey"), col("o_totalprice"))
    urgent.unionByName(fin)
      .groupBy("src")
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("o_orderkey")).as("n_distinct"),
        round(sum("o_totalprice"), 2).as("sum_price"))
      .orderBy("src")
  }

  /** INTERSECT / EXCEPT, distinct and multiset (_ALL) variants, over the
    * customer-key sets of two order-status slices; emitted as one
    * (op, n) row each so all four variants land in a single query. */
  def q26IntersectExcept(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val fKeys = o.filter(col("o_orderstatus") === "F").select("o_custkey")
    val oKeys = o.filter(col("o_orderstatus") === "O").select("o_custkey")
    def counted(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("op"), col("n"))
    counted("except", fKeys.except(oKeys))
      .unionByName(counted("except_all", fKeys.exceptAll(oKeys)))
      .unionByName(counted("intersect", fKeys.intersect(oKeys)))
      .unionByName(counted("intersect_all", fKeys.intersectAll(oKeys)))
      .orderBy("op")
  }

  /** Dedup on a column subset via dropDuplicates — projection first, so
    * the surviving row is fully determined (no arbitrary-survivor
    * nondeterminism) and the result equals SELECT DISTINCT. */
  def q27Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select("lang", "source")
      .dropDuplicates(Seq("lang", "source"))
      .orderBy("lang", "source")

  /** Top-k: orderBy().limit(k) → TakeOrderedAndProjectExec (per-partition
    * heap of k, merge of k×partitions rows — no global sort; this is the
    * production shape for "top 15 of 100 TB"). Tiebreak on o_orderkey
    * pins the row set. */
  def q28Topk(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(15)
      .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("price"))

  /** LIMIT with OFFSET (rows 6..15 of the global order). */
  def q29LimitOffset(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .offset(5)
      .limit(10)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))

  /** Deterministic ~1/8 sample: md5(key) hex-prefix filter. Unlike
    * sample()/rand(), both engines agree bit-for-bit, so the sample IS
    * oracle-checkable; the predicate is scan-side and shuffle-free. */
  def q30SampleMd5(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1).isin("0", "1"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
      .orderBy("o_orderstatus")

  /** explode(split(text)) → word count → top-20: the Generate (UDTF
    * shape) row. Partial aggregation means the shuffle carries (word,
    * count) pairs, not the exploded token stream. */
  def q31ExplodeWords(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(20)

  /** q69: stratified sampling — the training-mix resampling op (weight
    * each corpus slice differently when composing a training set). The
    * per-stratum keep-rate lives in a RATES DIM (derived here from the
    * source id: even-numbered sources keep 25% = 64/256, odd keep 75%)
    * broadcast-joined onto the fact scan, and membership is the q30
    * md5-prefix trick — first hash byte < per-stratum threshold — so
    * unlike `DataFrame.sampleBy` (rand()-based) the sample is
    * deterministic and oracle-checkable bit-for-bit. Shape at 100 TB:
    * scan → broadcast join (rates is |strata| rows) → scan-side filter
    * → partial+final agg; nothing shuffles the unsampled corpus.
    */
  def q69StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val rates = docs.select("source").distinct()
      .withColumn("threshold",
        when(expr("cast(substring(source, 4, 10) as int) % 2 = 0"), lit(64))
          .otherwise(lit(192)))
    docs.join(broadcast(rates), "source")
      .filter(conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
        .cast("int") < col("threshold"))
      .groupBy("source", "threshold")
      .agg(count(lit(1)).as("n_kept"), round(avg("n_chars"), 4).as("avg_chars"))
      .orderBy("source")
  }

  /** q87: weighted sampling WITHOUT replacement via the
    * Efraimidis–Spirakis exponential-jump keys (IPL 2006 — public):
    * each document draws a deterministic md5-uniform u ∈ (0,1] and gets
    * key = −ln(u)/w with weight w = n_chars; the k smallest keys ARE a
    * weighted sample without replacement. Distributed shape: the key is
    * a scan-local projection and the selection is `orderBy().limit(k)`
    * = TakeOrderedAndProject (per-partition heaps, k·partitions driver
    * merge) — the one-pass distributed algorithm from the paper, no
    * shuffle of the unsampled corpus. Unlike rand()-based sampling the
    * draw is replayable, so the oracle re-derives the identical sample;
    * keys are reported in parts-per-million (engine and oracle share
    * every operand bit except the ln ulp, absorbed by round 6).
    */
  def q87WeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("double") + lit(1.0d)) / lit(4294967296.0d)
    Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        (-log(u) / col("n_chars")).as("key"))
      .orderBy(col("key").asc, col("doc_id").asc)
      .limit(20)
      .select(col("doc_id"), col("source"), col("n_chars"),
        round(col("key") * 1e6, 6).as("key_ppm"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q87_weighted_sample" -> (q87WeightedSample _),
    "q69_stratified_sample" -> (q69StratifiedSample _),
    "q25_union" -> (q25Union _),
    "q26_intersect_except" -> (q26IntersectExcept _),
    "q27_distinct" -> (q27Distinct _),
    "q28_topk" -> (q28Topk _),
    "q29_limit_offset" -> (q29LimitOffset _),
    "q30_sample_md5" -> (q30SampleMd5 _),
    "q31_explode_words" -> (q31ExplodeWords _)
  )

  override val oracles: Map[String, String] = Map(
    // the identical md5-uniform draw and −ln(u)/w keys; selection
    // happens on the unrounded key in both engines
    "q87_weighted_sample" ->
      """WITH k AS (
        |  SELECT doc_id, source, n_chars,
        |         -ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT + 1) / 4294967296.0)
        |           / n_chars AS key
        |  FROM documents)
        |SELECT doc_id, source, n_chars, round(key * 1e6, 6) AS key_ppm
        |FROM k ORDER BY key ASC, doc_id ASC LIMIT 20""".stripMargin,
    "q69_stratified_sample" ->
      """WITH r AS (
        |  SELECT DISTINCT source,
        |         CASE WHEN substr(source, 4)::INT % 2 = 0 THEN 64 ELSE 192 END AS threshold
        |  FROM documents),
        |s AS (
        |  SELECT d.source, r.threshold, d.doc_id, d.n_chars
        |  FROM documents d JOIN r USING (source)
        |  WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 2))::INT < r.threshold)
        |SELECT source, threshold, count(*)::BIGINT AS n_kept,
        |       round(avg(n_chars), 4) AS avg_chars
        |FROM s GROUP BY 1, 2 ORDER BY source""".stripMargin,
    "q25_union" ->
      """SELECT src, count(*) AS n, count(DISTINCT o_orderkey) AS n_distinct,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM (
        |  SELECT o_orderkey, o_totalprice, 'urgent' AS src FROM orders
        |  WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, 'finished' AS src FROM orders
        |  WHERE o_orderstatus = 'F'
        |) GROUP BY src ORDER BY src""".stripMargin,
    "q26_intersect_except" ->
      """SELECT 'except' AS op, count(*) AS n FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus='F'
        |  EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus='O')
        |UNION ALL
        |SELECT 'except_all', count(*) FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus='F'
        |  EXCEPT ALL SELECT o_custkey FROM orders WHERE o_orderstatus='O')
        |UNION ALL
        |SELECT 'intersect', count(*) FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus='F'
        |  INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus='O')
        |UNION ALL
        |SELECT 'intersect_all', count(*) FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus='F'
        |  INTERSECT ALL SELECT o_custkey FROM orders WHERE o_orderstatus='O')
        |ORDER BY op""".stripMargin,
    "q27_distinct" ->
      """SELECT DISTINCT lang, source FROM documents ORDER BY lang, source""".stripMargin,
    "q28_topk" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15""".stripMargin,
    "q29_limit_offset" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 10 OFFSET 5""".stripMargin,
    "q30_sample_md5" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders
        |WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0','1')
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q31_explode_words" ->
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents
        |) GROUP BY word ORDER BY n DESC, word ASC LIMIT 20""".stripMargin
  )
}
