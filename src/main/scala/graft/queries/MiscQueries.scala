package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Breadth rows of SURVEY.md §2B that earlier rounds covered only
  * partially: LIKE/RLIKE/BETWEEN/null-safe-equality filters, nulls-
  * first/last ordering, posexplode + stack (UDTF shapes), CSV and
  * JSON-lines scan round-trips, and `sample()`/`randomSplit` (rows-only:
  * seeded RNG sampling is engine-specific by design — statistical
  * evidence lives in SampleSpec).
  */
object MiscQueries extends QueryModule {

  /** q53: filter-predicate breadth on `part`: LIKE, RLIKE, BETWEEN, IN,
    * and null-safe `<=>` between two genuinely nullable sides. All
    * predicates are scan-level conjuncts (pushed/codegen'd) — no shuffle
    * until the count.
    */
  def q53FilterBreadth(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_name").like("%ol%"))
      .filter(col("p_brand").rlike("Brand#[1-3]$"))
      .filter(col("p_size").between(5, 40))
      .filter(col("p_type").isin("a", "b", "c") === false)
      .withColumn("big", when(col("p_size") > 25, col("p_brand")))
      .withColumn("pricey", when(col("p_retailprice") > 1200.0, col("p_brand")))
      .filter(col("big") <=> col("pricey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), round(sum("p_retailprice"), 2).as("sum_price"))
      .orderBy("p_brand")

  /** q54: nulls-first/last ordering made hash-visible: the row_number
    * computed over the null-ordered sort is emitted, so the oracle
    * compare (which canonicalizes row order away) still verifies WHERE
    * the nulls landed. Single-partition window over a 10-row dim —
    * documented exception to the no-global-window rule.
    */
  def q54SortNulls(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.supplier(spark, dir)
      .withColumn("pos_bal", when(col("s_acctbal") > 0, round(col("s_acctbal"), 2)))
    s.withColumn("rn_nf",
        row_number().over(Window.orderBy(col("pos_bal").desc_nulls_first, col("s_suppkey"))))
      .withColumn("rn_nl",
        row_number().over(Window.orderBy(col("pos_bal").asc_nulls_last, col("s_suppkey"))))
      .select("s_suppkey", "pos_bal", "rn_nf", "rn_nl")
      .orderBy("s_suppkey")
  }

  /** q55: posexplode (UDTF shape with ordinality) over document words,
    * plus a `stack`-built inline lookup table joined in — the two
    * generator forms q31 didn't cover.
    */
  def q55PosexplodeStack(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(spark, dir)
      .filter(col("doc_id") < 5)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .filter(col("pos") < 8)
    val weights = spark.range(1).select(
      expr("stack(3, 'key', 10, 'value', 20, 'row', 30)").as(Seq("word", "weight")))
    words.join(weights, Seq("word"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("pos")).as("sum_pos"),
        sum(coalesce(col("weight"), lit(0))).as("sum_weight"))
      .orderBy("doc_id")
  }

  /** q56: CSV and JSON-lines scan round-trips — write a deterministic
    * slice of `orders` as CSV and of `events` as JSON-lines, read both
    * back with explicit schemas, aggregate; the oracle computes the same
    * aggregate straight from parquet, so a lossy round-trip (quoting,
    * null encoding, timestamp formatting) fails the hash.
    */
  /** Per-JVM unique roundtrip dir: unique per PROCESS so concurrent runs
    * (Bench overlapping a test JVM) can't race on overwrite-then-read of
    * a shared path, but reused WITHIN a process (mode=overwrite) so
    * repeated invocations — bench reps, suite re-runs — don't leak an
    * unbounded trail of /tmp copies of the fixture.
    */
  private lazy val roundtripBase: String =
    java.nio.file.Files.createTempDirectory("graft_roundtrip_").toString

  def q56CsvJsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val base = roundtripBase
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
    o.write.mode("overwrite").option("header", "true").csv(s"$base/orders_csv")
    val e = Tables.events(spark, dir)
      .filter(col("event_id") % 10 === 0)
      .select(col("event_id"), col("event_type"), col("value"))
    e.write.mode("overwrite").json(s"$base/events_json")

    val oBack = spark.read
      .schema("o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE, o_date STRING")
      .option("header", "true").csv(s"$base/orders_csv")
      .groupBy(col("o_orderstatus").as("grp"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_val"),
        min("o_date").as("min_key"))
      .select(concat(lit("csv:"), col("grp")).as("grp"), col("n"), col("sum_val"), col("min_key"))
    val eBack = spark.read
      .schema("event_id BIGINT, event_type STRING, value DOUBLE")
      .json(s"$base/events_json")
      .groupBy(col("event_type").as("grp"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_val"),
        min(col("event_id")).cast("string").as("min_key"))
      .select(concat(lit("json:"), col("grp")).as("grp"), col("n"), col("sum_val"), col("min_key"))
    oBack.unionByName(eBack).orderBy("grp")
  }

  /** q401: XML round-trip + `from_xml` — Spark 4's built-in XML surface
    * (the spark-xml module merged upstream), both halves: (a) a
    * deterministic orders slice written `format("xml")` with rowTag
    * and read back under an explicit schema; (b) the SCALAR path —
    * an XML string column parsed with `from_xml`. Both aggregate and
    * the oracle computes the same from parquet, so lossy encoding
    * (escaping, number formatting, tag nesting) fails the hash —
    * the q56/q116 contract extended to the fourth file format.
    *
    * Scale: format plumbing, not compute — the write is a slice, the
    * read is schema-driven (no inference pass), from_xml is
    * scan-local.
    */
  def q401XmlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val base = roundtripBase
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .write.mode("overwrite").option("rowTag", "order").format("xml")
      .save(s"$base/orders_xml")
    val oBack = spark.read
      .schema("o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")
      .option("rowTag", "order").format("xml").load(s"$base/orders_xml")
      .groupBy(col("o_orderstatus").as("grp"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_val"))
      .select(concat(lit("file:"), col("grp")).as("grp"), col("n"), col("sum_val"))
    val eBack = Tables.events(spark, dir)
      .filter(col("event_id") % 10 === 0)
      .select(expr(
        "concat('<e><id>', CAST(event_id AS STRING), '</id><t>', event_type, " +
          "'</t><v>', CAST(value AS STRING), '</v></e>')").as("x"))
      .select(expr(
        "from_xml(x, 'id BIGINT, t STRING, v DOUBLE')").as("p"))
      .groupBy(col("p.t").as("grp"))
      .agg(count(lit(1)).as("n"), round(sum("p.v"), 2).as("sum_val"))
      .select(concat(lit("scalar:"), col("grp")).as("grp"), col("n"), col("sum_val"))
    oBack.unionByName(eBack).orderBy("grp")
  }

  /** q402: TEXT-LINE SOURCE — `spark.read.text`, the corpus-ingestion
    * front door (raw crawl dumps arrive as line-oriented text long
    * before they have a schema): documents serialized one
    * tab-delimited line each through the text SINK, read back as raw
    * `value` lines, split and aggregated per source. The oracle
    * aggregates the parquet table, so delimiter damage, line
    * splitting, or encoding drift fails the hash. Completes the
    * source matrix: parquet/CSV/JSON (q56), ORC (q116), XML (q401),
    * binaryFile (q364), text (this row).
    *
    * Scale: line sources split by byte ranges — embarrassingly
    * parallel; the parse is scan-local `split(_, '\t', 3)`.
    */
  def q402TextSource(spark: SparkSession, dir: String): DataFrame = {
    val base = roundtripBase
    Tables.documents(spark, dir)
      .select(concat_ws("\t", col("doc_id"), col("source"), col("text")).as("value"))
      .write.mode("overwrite").text(s"$base/docs_txt")
    spark.read.text(s"$base/docs_txt")
      .select(split(col("value"), "\t", 3).as("f"))
      .select(col("f")(0).cast("long").as("doc_id"),
        col("f")(1).as("source"), col("f")(2).as("text"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("sum_chars"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("source")
  }

  /** q116: ORC write → read roundtrip — the third columnar format the
    * source/sink surface speaks (parquet everywhere, CSV/JSON via q56).
    * A lineitem slice is written with Spark's native ORC sink and read
    * back through the ORC vectorized reader; the gate aggregates the
    * read-back rows against the oracle's view of the ORIGINAL parquet,
    * so any value damaged in either direction of the ORC hop flips the
    * compare. Doubles survive bit-exactly (ORC stores IEEE bits, no
    * text formatting — the price column is additionally pinned as exact
    * integer cents so the gate doesn't ride on group-sum luck).
    * Scale: ORC keeps the same pushdown/pruning story as parquet
    * (stripe stats, column projection); the roundtrip is one map-only
    * write + one scan into a partial+final agg.
    */
  def q116OrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val base = roundtripBase
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 10 === 0)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").orc(s"$base/lineitem_orc")
    spark.read.orc(s"$base/lineitem_orc")
      .groupBy(col("l_returnflag").as("grp"))
      .agg(count(lit(1)).as("n"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        sum(floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long")).as("price_cents"),
        min("l_orderkey").as("min_key"))
      .orderBy("grp")
  }

  /** q118: order-invariant table fingerprints — the operational
    * equality check a 100 TB migration/backfill/replication run needs:
    * "are these two copies the same table?" answered WITHOUT a
    * row-by-row compare. Each row canonicalizes to a '|'-joined string
    * of integer-rendered fields (doubles as exact cents — never
    * engine-formatted floats), hashes through md5 to a 60-bit int, and
    * the table fingerprint is the BIT_XOR of all row hashes: XOR is
    * commutative/associative (order- and partitioning-invariant by
    * algebra, not by sort) and cannot overflow — any single changed,
    * missing, or duplicated-odd-times row flips the fingerprint.
    * Here the gate fingerprints three tables; comparing engine output
    * to the DuckDB oracle IS the cross-system certification run.
    * Scale: one scan per table into a partial+final 1-row agg — the
    * cheapest possible full-table pass, no shuffle beyond the
    * 8-byte-per-partition merge.
    */
  def q118TableFingerprint(spark: SparkSession, dir: String): DataFrame = {
    def cents(c: Column): Column =
      floor(c * lit(100.0) + lit(0.5)).cast("long").cast("string")
    def fp(tbl: String, df: DataFrame, canon: Column): DataFrame =
      df.select(conv(substring(md5(canon), 1, 15), 16, 10).cast("long").as("h"))
        .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("fp"))
        .select(lit(tbl).as("tbl"), col("n_rows"), col("fp"))
    val c = fp("customer", Tables.customer(spark, dir),
      concat_ws("|", col("c_custkey").cast("string"), col("c_mktsegment"),
        cents(col("c_acctbal"))))
    val o = fp("orders", Tables.orders(spark, dir),
      concat_ws("|", col("o_orderkey").cast("string"), col("o_orderstatus"),
        cents(col("o_totalprice"))))
    val d = fp("documents", Tables.documents(spark, dir),
      concat_ws("|", col("doc_id").cast("string"), col("source"), md5(col("text"))))
    c.unionByName(o).unionByName(d).orderBy("tbl")
  }

  /** q57: sample()/randomSplit — rows-only (Spark's Bernoulli sampler is
    * seeded but engine-specific, so no cross-engine oracle is possible by
    * construction). Emits the piece counts + disjointness evidence;
    * SampleSpec asserts the statistical contract.
    */
  def q57SampleSplit(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val sampled = o.sample(withReplacement = false, fraction = 0.1, seed = 42L)
    val Array(a, b) = o.randomSplit(Array(0.7, 0.3), seed = 42L)
    val total = o.select(count(lit(1)).as("n")).withColumn("piece", lit("total"))
    val samp = sampled.select(count(lit(1)).as("n")).withColumn("piece", lit("sample_10pct"))
    val splitA = a.select(count(lit(1)).as("n")).withColumn("piece", lit("split_70"))
    val splitB = b.select(count(lit(1)).as("n")).withColumn("piece", lit("split_30"))
    total.unionByName(samp).unionByName(splitA).unionByName(splitB)
      .select("piece", "n").orderBy("piece")
  }

  /** The q99 SQL TEXT — one string, executed verbatim by BOTH engines
    * (Spark via `spark.sql` over temp views, DuckDB via the oracle over
    * the same parquet tables), so the gate proves the SQL surface
    * itself, not a DataFrame re-statement of it. Three subquery shapes
    * in one statement, each forcing a distinct Catalyst decorrelation
    * rewrite (SURVEY §4.2):
    *  - correlated EXISTS   → left-semi equi-join,
    *  - NOT IN              → null-aware left-anti join,
    *  - correlated scalar   → aggregate + left-outer equi-join.
    * Outputs are pure counts, so cross-engine determinism is trivial.
    */
  private val sqlSubqueryText: String =
    """SELECT o.o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_returnflag = 'R')
      |  AND o.o_orderkey NOT IN (SELECT l_orderkey FROM lineitem
      |                           WHERE l_quantity >= 49)
      |  AND (SELECT count(*) FROM lineitem l2
      |       WHERE l2.l_orderkey = o.o_orderkey) >= 4
      |GROUP BY o.o_orderpriority
      |ORDER BY o.o_orderpriority""".stripMargin

  /** q99: the SQL-text subquery surface, oracle-gated. A real user's
    * first query after the DataFrame API is SQL with subqueries; this
    * gate runs `sqlSubqueryText` through the full parse → analyze →
    * decorrelate → optimize pipeline. Scale shape, honestly stated
    * (ADVICE round-9): EXISTS and the correlated scalar land as hash
    * equi-joins on `o_orderkey`/`l_orderkey` — shuffle-safe at any
    * scale. NOT IN does NOT: because parquet declares `l_orderkey`
    * nullable, Catalyst must preserve three-valued NOT IN semantics and
    * rewrites it to a NULL-AWARE left-anti join, which Spark executes
    * ONLY as a broadcast (and falls back to BroadcastNestedLoopJoin
    * when the filtered subquery side exceeds the broadcast threshold).
    * At fixture scale the small subquery auto-broadcasts, so
    * PlanShapeSpec passes — but that is threshold luck, not a
    * shuffle-safe shape. NOT IN over a possibly-null key is therefore
    * the SEMANTICS gate only; the declared 100 TB path for "not
    * matched" is `q99bSqlNotExists` below, whose plain LeftAnti
    * shuffles (plan-asserted with auto-broadcast disabled — the
    * null-aware form cannot pass that test).
    */
  def q99SqlSubqueries(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql(sqlSubqueryText)
  }

  /** The q99b SQL TEXT — `sqlSubqueryText` with the NOT IN branch
    * re-expressed as NOT EXISTS. On data whose `l_orderkey` is never
    * NULL the two are row-identical (same oracle result), but NOT
    * EXISTS carries no three-valued-logic obligation, so Catalyst
    * decorrelates it to a PLAIN left-anti hash join that can shuffle —
    * the rewrite a user must apply to run "not matched" against a
    * fact-sized subquery on a 1000-executor cluster.
    */
  private val sqlNotExistsText: String =
    """SELECT o.o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_returnflag = 'R')
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = o.o_orderkey
      |                    AND l3.l_quantity >= 49)
      |  AND (SELECT count(*) FROM lineitem l2
      |       WHERE l2.l_orderkey = o.o_orderkey) >= 4
      |GROUP BY o.o_orderpriority
      |ORDER BY o.o_orderpriority""".stripMargin

  /** q99b: the scale path for q99's "not matched" branch — identical
    * result on never-null keys, shuffle-safe plan (see q99 scaladoc).
    */
  def q99bSqlNotExists(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql(sqlNotExistsText)
  }

  /** The q110 SQL TEXT — executed verbatim by BOTH engines: the window
    * clause through the parser path (ranking row_number, whole-partition
    * count, an explicit ROWS frame running sum, and 3-arg lag with a
    * default) — the DataFrame windows q20–q24 gate the OPERATORS, this
    * gates the SQL surface a user types. Determinism: the running sum
    * and lag ride on INTEGER keys under a total order (price desc,
    * orderkey asc — double comparisons on identical parquet bits, never
    * double sums); row_number and sum cast to BIGINT because the same
    * text must yield the same schema in both engines (Spark row_number
    * is 32-bit, DuckDB's is 64; DuckDB's integer sum is 128).
    */
  private val sqlWindowText: String =
    """WITH r AS (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn,
      |         count(*) OVER (PARTITION BY o_custkey) AS n_orders,
      |         sum(o_orderkey) OVER (PARTITION BY o_custkey
      |                               ORDER BY o_totalprice DESC, o_orderkey ASC
      |                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_key,
      |         lag(o_orderkey, 1, -1) OVER (PARTITION BY o_custkey
      |                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS prev_key
      |  FROM orders)
      |SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rn, n_orders,
      |       CAST(run_key AS BIGINT) AS run_key, prev_key, o_totalprice
      |FROM r WHERE rn <= 2 ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q110: the SQL window surface, one text both engines parse — top-2
    * orders per customer with per-customer counts, running key sums,
    * and predecessor keys. Scale: ONE hash shuffle on o_custkey serves
    * all four window functions (same partition spec), then the rn
    * filter prunes early — the standard top-k-per-group SQL shape.
    */
  def q110SqlWindow(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql(sqlWindowText)
  }

  /** q101: the SQL-text PIVOT clause — q06's reshape through the parser
    * path a SQL user actually types. The rounding sits OUTSIDE the
    * pivot (Spark's PIVOT aggregate must be a plain aggregate call).
    * Catalyst lowers PIVOT to a TWO-level aggregation — group by
    * (row key, pivot key) with map-side partials, then pivot-to-columns
    * over the row key — two key-hash shuffles, no Expand, no join; the
    * DuckDB oracle states the single-pass conditional-agg equivalent.
    * Plan pinned in PlanShapeSpec; scale-equivalent to q06.
    */
  def q101SqlPivot(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql(
      """SELECT l_returnflag, round(F, 2) AS F, round(O, 2) AS O
        |FROM (SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem)
        |PIVOT (sum(l_quantity) FOR l_linestatus IN ('F', 'O'))
        |ORDER BY l_returnflag""".stripMargin)
  }

  /** The q102 SQL TEXT — executed verbatim by BOTH engines (the q99
    * same-text discipline): explicit GROUPING SETS, the general form
    * behind q04's rollup and q05's cube. Scale: Catalyst's Expand emits
    * one row per set per input row into a single partial+final hash
    * agg — the amplification factor is |sets|, a constant chosen in the
    * query, never data-dependent.
    */
  private val sqlGroupingSetsText: String =
    """SELECT l_returnflag, l_linestatus,
      |       count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q102: explicit GROUPING SETS through one SQL text (see above). */
  def q102SqlGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql(sqlGroupingSetsText)
  }

  /** q103: the SQL-text UNPIVOT clause — the inverse reshape of q101,
    * completing the parser-surface trio (PIVOT / GROUPING SETS /
    * UNPIVOT). Wide per-flag measure columns melt back to
    * (metric, value) rows. Catalyst lowers UNPIVOT to an Expand —
    * |metrics| output rows per input row, a constant chosen in the
    * query — over the already-aggregated 3-row frame: the expansion
    * runs AFTER the partial+final agg, so at 100 TB the reshape costs
    * nothing on top of the aggregation that feeds it. The DuckDB
    * oracle states the UNION-ALL-of-projections equivalent (same
    * rows; UNPIVOT text differs across dialects).
    */
  def q103SqlUnpivot(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql(
      """SELECT l_returnflag, metric, round(val, 2) AS val
        |FROM (SELECT l_returnflag,
        |             sum(l_quantity) AS qty,
        |             sum(l_extendedprice) AS price,
        |             sum(l_discount) AS disc
        |      FROM lineitem GROUP BY l_returnflag)
        |UNPIVOT (val FOR metric IN (qty, price, disc))
        |ORDER BY l_returnflag, metric""".stripMargin)
  }

  /** q83: corpus data profiling — the first thing run against a new
    * 100 TB drop: per-column null count, exact distinct count, and
    * min/max (stringified so heterogeneous column types share one
    * output schema). One branch per column, each a COLUMN-PRUNED scan
    * (parquet reads only that column) into a partial+final agg with a
    * single distinct — deliberately NOT one multi-distinct agg, whose
    * Expand would amplify every row ×|columns| with all columns
    * materialized; the union of pruned branches reads each byte once.
    * (The approximate path for distinct counts at scale is q08's
    * `approx_count_distinct`.)
    */
  def q83Profile(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    cols.map { c =>
      d.select(col(c))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_repr"),
          max(col(c)).cast("string").as("max_repr"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_repr"), col("max_repr"))
    }.reduce(_.unionByName(_)).orderBy("col_name")
  }

  /** q95: cohort retention — the product-analytics rollup over the event
    * stream: users cohorted by first-seen day, retention = distinct
    * active days at each day-offset from the cohort day. Two hash aggs
    * (per-user first day; per-(user, day) activity) and one key
    * equi-join — user-keyed throughout, no windows, no global sort
    * until the bounded (cohort × offset) result.
    */
  def q95CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
    val cohort = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
    val active = ev.select("user_id", "day").distinct()
    active.join(cohort, "user_id")
      .select(col("cohort_day").cast("date").as("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_active_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** q96: ordered funnel — view → click → purchase, each stage STRICTLY
    * after the previous one for the same user (the sequence constraint
    * is what separates a funnel from three filters). Stage k = min
    * event time later than stage k−1, via per-user aggs chained through
    * key equi-joins; the output is the one-row funnel census plus the
    * mean end-to-end conversion time. User-keyed joins only — the
    * 100 TB shape (funnels over billions of events shuffle each stage
    * once on user_id).
    */
  def q96Funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select("user_id", "ts", "event_type")
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"), min("t1").as("t1"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"), min("t1").as("t1"))
    // all four censuses are 1-row aggregates — no driver-side count()
    ev.agg(countDistinct(col("user_id")).as("n_users"))
      .crossJoin(v.agg(count(lit(1)).as("n_view")))
      .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_full_funnel"),
        round(avg(col("t3").cast("double") - col("t1").cast("double")), 4)
          .as("avg_funnel_secs")))
      .select("n_users", "n_view", "n_view_click", "n_full_funnel", "avg_funnel_secs")
  }

  /** q245: MARKOV TRANSITION MATRIX over the event stream — the
    * clickstream path analysis behind "where do users go next": for
    * each user's time-ordered event sequence, count (from → to)
    * transitions (the terminal step emits to = 'END') and row-normalize
    * into P(to | from). First-order Markov over event types — the
    * product-analytics sibling of q96's fixed funnel (every path, not
    * one prescribed path).
    *
    * Determinism: the per-user order is (ts, event_id) — event_id
    * breaks timestamp ties totally; counts are exact integers; the one
    * double op is the row-normalized probability under round 6. Scale:
    * ONE user-partitioned window (the sequence lives where the user's
    * data lives — never a global sort), then a census-sized (from, to)
    * rollup with map-side partials; the from-totals come off the census
    * rows, not the events.
    */
  def q245MarkovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val trans = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", coalesce(lead("event_type", 1).over(w), lit("END")))
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    val wf = Window.partitionBy("from_type")
    trans
      .withColumn("p",
        round(col("n_trans").cast("double") / sum("n_trans").over(wf), 6))
      .select("from_type", "to_type", "n_trans", "p")
      .orderBy("from_type", "to_type")
  }

  /** q98: rolling 7-day active users — the sliding-window DISTINCT that
    * plain window frames can't express (distinct isn't decomposable over
    * frames): each calendar day joins the (user, day) activity set over
    * the trailing week via a BETWEEN join against the tiny day dim
    * (calendar-sized — broadcast by construction, the one join where a
    * nested-loop build side is bounded forever), then counts distinct
    * users per day. The activity set shuffles once on the distinct agg.
    */
  def q98RollingActives(spark: SparkSession, dir: String): DataFrame = {
    val active = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
      .distinct()
    val days = active.select(col("day").as("d")).distinct()
    active.join(broadcast(days),
      col("day") >= col("d") - expr("INTERVAL 6 DAYS") && col("day") <= col("d"))
      .groupBy(col("d").cast("date").as("day"))
      .agg(countDistinct(col("user_id")).as("n_active_7d"))
      .orderBy("day")
  }

  /** The q112 SQL TEXT — executed verbatim by BOTH engines: a
    * `WITH RECURSIVE` hierarchy rollup, the SQL-recursion surface Spark
    * gained in 4.0 (SPARK-24497). The hierarchy is derived, not stored:
    * each supplier's ancestor chain in the implicit binary trie
    * `parent(k) = ⌊k/2⌋` (an org-chart / category-tree stand-in whose
    * edges need no extra fixture), and the rollup sums every subtree's
    * descendant count and balance. Determinism: the recursion carries
    * INTEGER keys only (`floor(a / 2.0)` — exact for keys < 2^52, same
    * text both engines; DuckDB's `/` on integers is float division and
    * Spark's is not, so the division is forced to double in the text);
    * balances are quantized to exact cent BIGINTs before summing
    * (integer sums are order-invariant), and the outer sum is cast
    * because DuckDB's BIGINT sum is HUGEINT. Scale: the recursive step
    * is depth-synchronous — ⌈log₂ max(key)⌉ iterations (~40 at 100 TB
    * key ranges, far under Spark's 100-level default), each a
    * key-local map of the previous level with no shuffle; the rollup
    * is one hash equi-join plus one partial+final agg.
    */
  private val sqlRecursiveText: String =
    """WITH RECURSIVE anc(node, a) AS (
      |  SELECT s_suppkey, s_suppkey FROM supplier
      |  UNION ALL
      |  SELECT node, CAST(floor(a / 2.0) AS BIGINT) FROM anc WHERE a > 1
      |)
      |SELECT anc.a AS node, count(*) AS n_desc,
      |       CAST(sum(CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS bal_cents
      |FROM anc JOIN supplier ON anc.node = s_suppkey
      |GROUP BY anc.a ORDER BY 1""".stripMargin

  /** q112: recursive-CTE hierarchy rollup, one text both engines parse
    * (see `sqlRecursiveText`). Catalyst lowers the recursion to
    * `UnionLoop`/`UnionLoopRef` feeding a hash join + two-phase agg —
    * plan pinned in PlanShapeSpec.
    */
  def q112SqlRecursive(spark: SparkSession, dir: String): DataFrame = {
    Tables.supplier(spark, dir).createOrReplaceTempView("supplier")
    spark.sql(sqlRecursiveText)
  }

  /** The q113 SQL TEXT — executed verbatim by BOTH engines: a correlated
    * `LATERAL` subquery with ORDER BY + LIMIT, the per-row-subquery
    * surface (top-2 most recent orders per customer, with their
    * totals). Determinism: the lateral's order is total
    * (`o_orderdate DESC, o_orderkey`), and every output value is a
    * parquet passthrough — no arithmetic, so bit-equality is free.
    * Scale: Catalyst DECORRELATES the lateral — the physical plan is a
    * per-custkey Window top-k plus a hash equi-join back to customer
    * (the q110 row_number shape, reached from lateral syntax), NOT a
    * per-customer nested-loop re-scan of orders; no
    * BroadcastNestedLoopJoin / CartesianProduct appears (plan pinned).
    */
  private val sqlLateralText: String =
    """SELECT c_custkey, c_mktsegment, o.o_orderkey, o.o_totalprice
      |FROM customer, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c_custkey
      |  ORDER BY o_orderdate DESC, o_orderkey LIMIT 2
      |) o
      |ORDER BY c_custkey, o_orderkey""".stripMargin

  /** q113: correlated LATERAL top-k-per-group, one text both engines
    * parse (see `sqlLateralText`).
    */
  def q113SqlLateral(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql(sqlLateralText)
  }

  /** The q123 SQL TEXT — GROUP BY ALL + ORDER BY ALL, executed verbatim
    * by both engines (the q99 same-text discipline). The DuckDB-born
    * shorthand is now ANSI-adjacent surface users type daily; Spark
    * added both in 3.4. Determinism: every aggregate is an exact
    * integer-valued sum (counts; l_quantity holds small integers
    * exactly in double) so no rounding step is needed, and ORDER BY ALL
    * totals the order over every output column. Scale: identical plan
    * to writing the columns out — one partial+final hash agg.
    */
  private val sqlGroupByAllText: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
      |       CAST(min(l_orderkey) AS BIGINT) AS min_key,
      |       CAST(max(l_orderkey) AS BIGINT) AS max_key
      |FROM lineitem
      |GROUP BY ALL
      |ORDER BY ALL""".stripMargin

  /** q123: the GROUP BY ALL / ORDER BY ALL SQL shorthand, one text both
    * engines parse (see `sqlGroupByAllText`).
    */
  def q123SqlGroupByAll(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql(sqlGroupByAllText)
  }

  /** The q124 SQL TEXT — a named WINDOW clause shared by three window
    * functions, executed verbatim by both engines: the dedup-the-spec
    * surface q110's inline OVER gate doesn't reach. One window spec,
    * referenced by name, plus a frame-extending reference (DuckDB and
    * Spark both allow `OVER w` where w carries the ORDER BY and the
    * function adds its default frame). Determinism: integer keys under
    * a total order; casts pin the cross-engine widths (Spark row_number
    * is 32-bit, DuckDB 64; DuckDB integer window sums are 128-bit).
    * Scale: ONE hash shuffle on o_custkey serves every function bound
    * to the named spec — the reuse the clause exists to express.
    */
  private val sqlWindowClauseText: String =
    """WITH r AS (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         CAST(row_number() OVER w AS BIGINT) AS rn,
      |         CAST(rank() OVER w AS BIGINT) AS rk,
      |         CAST(sum(o_orderkey) OVER w AS BIGINT) AS run_key
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey
      |               ORDER BY o_totalprice DESC, o_orderkey ASC))
      |SELECT o_custkey, o_orderkey, rn, rk, run_key, o_totalprice
      |FROM r WHERE rn <= 2 ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q124: the named WINDOW clause through one SQL text (see above). */
  def q124SqlWindowClause(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql(sqlWindowClauseText)
  }

  /** q159: ordered string aggregation — `listagg` (SQL:2016 / Spark 4)
    * with DISTINCT and a WITHIN GROUP order. The one aggregate whose
    * VALUE depends on input order, which is exactly why the gate matters:
    * a distributed engine must impose the declared order inside each
    * group regardless of partitioning/merge order, or the result is
    * nondeterministic garbage. Engine text uses Spark's `WITHIN GROUP
    * (ORDER BY …)` syntax; the oracle states the same aggregate in
    * DuckDB's `listagg(DISTINCT x, sep ORDER BY x)` spelling (the two
    * parsers accept different order-clause placements — same semantics).
    * Determinism: DISTINCT + total order on the aggregated expression.
    * Scale: partial aggregation still applies (sorted merge of partial
    * lists); the aggregated domain here is 3 statuses, so group state is
    * bounded — the doc-note for users is that listagg over an unbounded
    * domain concentrates the group on one task, same as collect_list.
    */
  def q159SqlListagg(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql(
      """SELECT o_orderpriority, count(*) AS n,
        |       listagg(DISTINCT o_orderstatus, '|')
        |         WITHIN GROUP (ORDER BY o_orderstatus) AS statuses
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  /** q169: declarative SQL UDFs (Spark 4 `CREATE FUNCTION … RETURN`) —
    * both kinds through one query: a SCALAR function (`wlen`) applied
    * per row, and a TABLE function (`words`) invoked as a correlated
    * LATERAL over every document. This is the no-JVM-code extension
    * surface (functions defined in SQL text, resolved and inlined by
    * the analyzer — they optimize like views, so predicate pushdown
    * and codegen see through them; contrast the q41/q61 Catalyst
    * expressions, which earn their JVM code with kernels SQL can't
    * state). The oracle states the INLINED semantics directly — the
    * gate proves definition + invocation resolve to exactly the
    * inlined query.
    */
  def q169SqlUdf(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION wlen(w STRING) RETURNS DOUBLE
        |RETURN CAST(length(w) AS DOUBLE)""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION words(s STRING) RETURNS TABLE (w STRING)
        |RETURN SELECT explode(split(s, ' '))""".stripMargin)
    spark.sql(
      """SELECT source, count(*) AS n_tokens, round(avg(wlen(w)), 6) AS avg_wlen
        |FROM documents, LATERAL words(text)
        |WHERE w <> '' GROUP BY source ORDER BY source""".stripMargin)
  }

  /** q171: cross-group QUANTILE CALIBRATION — map every row's
    * within-group rank onto the GLOBAL value distribution (quantile
    * normalization): calib(x in g) = the global value at the greatest
    * global percent-rank ≤ x's rank within g. This is how incomparable
    * per-source scores (different annotators, different quality models,
    * segment-skewed balances) are put on ONE scale before mixing — the
    * score-calibration step q153's rank-only RRF sidesteps, here as a
    * first-class transform.
    *
    * The rank-space lookup is an AS-OF join with percent-rank as the
    * "time" axis: the engine builds the POOLED rank from the
    * distinct-value CENSUS (cumulative count over census rows — the
    * q199/q138 device: the only unpartitioned windows run over the
    * aggregate, never the customer rows), turns the reference
    * distribution into half-open rank INTERVALS [pr, pr_next), and
    * resolves each probe through a binned interval equi-join (the q92
    * device — one bin per probe, raw-double post-filter for the exact
    * ASOF ≥ match); the ORACLE states the same semantic with DuckDB's
    * native `ASOF JOIN` — two entirely different formulations
    * certifying one result. Determinism: pooled percent-rank is
    * cum-below/(N−1), the exact integer division `percent_rank`
    * evaluates; census prs are strictly increasing so intervals
    * partition [0,1] and each probe matches exactly once.
    *
    * Scale: the reference side is value-cardinality-sized (in
    * production a fixed quantile grid); probes do O(1) work each
    * through the bin key — no union sort, no single-partition pass
    * over row-scale data (plan-guarded in `AllQueriesSpec`), and no
    * per-probe scan of the whole reference.
    */
  def q171QuantileCalibration(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    // pooled rank from the value census: pr(v) = (#rows below v)/(N−1),
    // cumulative + total both over CENSUS rows (bounded by cardinality)
    val census = cust.groupBy(col("c_acctbal").as("g_val"))
      .agg(count(lit(1)).as("cnt"))
    val wV = Window.orderBy("g_val")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val ref = census
      .withColumn("cum", sum("cnt").over(wV))
      .withColumn("ntot", sum("cnt").over(wAll))
      .select(((col("cum") - col("cnt")) / (col("ntot") - 1)).as("pr"),
        col("g_val"))
    // the as-of lookup as a BINNED INTERVAL EQUI-JOIN (the q92 device):
    // census prs are strictly increasing, so they partition [0,1] into
    // half-open intervals [pr, pr_next); each interval explodes into
    // the integer rank-bins it covers (census-level lead window —
    // bounded input), every probe computes its ONE bin, and the raw-
    // double post-filter pins the exact ASOF ≥ match. O(1) work per
    // probe — never a per-row scan of the whole reference (a broadcast
    // sorted-array `filter(...)` probe measured 34 s at sf0.1: O(n²)
    // in the census size).
    val bins = 1024
    val refIv = ref
      .withColumn("pr_next",
        coalesce(lead("pr", 1).over(Window.orderBy("pr")), lit(1.5)))
    val binned = refIv.withColumn("_bin", explode(sequence(
        floor(col("pr") * bins).cast("long"),
        least(floor(col("pr_next") * bins).cast("long"), lit(bins.toLong)))))
      .select(col("_bin"), col("pr").as("ref_pr"), col("pr_next"), col("g_val"))
    cust
      .withColumn("pr", percent_rank().over(
        Window.partitionBy("c_mktsegment").orderBy("c_acctbal")))
      .withColumn("_bin", floor(col("pr") * bins).cast("long"))
      .join(binned, Seq("_bin"))
      // exactly one census interval holds each probe (pr = 0 exists, so
      // coverage is total; ≥ ref_pr is the ASOF ≥ convention)
      .filter(col("pr") >= col("ref_pr") && col("pr") < col("pr_next"))
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        round(col("g_val"), 2).as("calib"))
      .orderBy("c_custkey")
  }

  /** q175: referential-INTEGRITY audit — the dbt-test/data-quality
    * sweep a warehouse runs after every load: count orphans on each
    * foreign-key edge of the star schema (lineitems without orders,
    * orders without customers, lineitems without parts/suppliers,
    * customers without nations) plus each parent's row count, folded
    * into one audit-report table. Every check is a LEFT ANTI join on
    * the key — the small parent key sets broadcast (AQE), the fact
    * table streams through, and the per-edge count is a 1-row agg:
    * auditing 100 TB costs one scan per edge, no sort, no wide state.
    */
  def q175IntegrityAudit(spark: SparkSession, dir: String): DataFrame = {
    def orphans(child: DataFrame, key: String, parent: DataFrame, pkey: String,
                edge: String): DataFrame = {
      val o = child.join(parent.select(col(pkey).as(key)).distinct(),
        Seq(key), "left_anti")
      o.agg(lit(edge).as("edge"), count(lit(1)).as("n_orphans"))
    }
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    Seq(
      orphans(li.select("l_orderkey"), "l_orderkey", ord, "o_orderkey", "lineitem->orders"),
      orphans(li.select("l_partkey"), "l_partkey", Tables.part(spark, dir), "p_partkey", "lineitem->part"),
      orphans(li.select("l_suppkey"), "l_suppkey", Tables.supplier(spark, dir), "s_suppkey", "lineitem->supplier"),
      orphans(ord.select("o_custkey"), "o_custkey", cust, "c_custkey", "orders->customer"),
      orphans(cust.select("c_nationkey"), "c_nationkey", Tables.nation(spark, dir), "n_nationkey", "customer->nation"),
      // sensitivity probe: the same audit against a deliberately
      // PARTIAL parent (md5-slot-thinned customers, simulating a
      // half-landed dim load) must report non-zero orphans — proving
      // the zero rows above are findings, not a vacuous check
      orphans(ord.select("o_custkey"), "o_custkey",
        cust.filter(substring(md5(col("c_custkey").cast("string")), 1, 1)
          .isin("0", "1", "2", "3") === false),
        "c_custkey", "orders->customer_partial(probe)"))
      .reduce(_ unionAll _)
      .orderBy("edge")
  }

  /** q176: two-sample A/B statistics — Welch's t on a deterministic
    * hash split of event values (q120's md5 split device assigns arms,
    * so the gate is reproducible; production swaps in the experiment
    * column): per arm n/mean/variance from one partial+final agg, then
    * t = (μ_A − μ_B)/√(s²_A/n_A + s²_B/n_B) and the Welch–Satterthwaite
    * degrees of freedom — the significance readout every experiment
    * pipeline computes. Each statistic is a ratio of moment sums
    * (relative summation noise ~1e-12) under round 6.
    */
  def q176AbTtest(spark: SparkSession, dir: String): DataFrame = {
    val armed = Tables.events(spark, dir)
      .select(col("value"),
        when(conv(substring(md5(col("event_id").cast("string")), 1, 2), 16, 10)
          .cast("long") % 2 === 0, "A").otherwise("B").as("arm"))
    val stats = armed.groupBy("arm").agg(
      count(lit(1)).cast("double").as("n"),
      avg("value").as("m"), var_samp("value").as("v"))
    val a = stats.filter(col("arm") === "A").select(
      col("n").as("na"), col("m").as("ma"), col("v").as("va"))
    val b = stats.filter(col("arm") === "B").select(
      col("n").as("nb"), col("m").as("mb"), col("v").as("vb"))
    a.crossJoin(b)
      .withColumn("se2", col("va") / col("na") + col("vb") / col("nb"))
      .select(
        col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
        round(col("ma"), 6).as("mean_a"), round(col("mb"), 6).as("mean_b"),
        round((col("ma") - col("mb")) / sqrt(col("se2")), 6).as("t_stat"),
        round(pow(col("se2"), 2) /
          (pow(col("va") / col("na"), 2) / (col("na") - 1)
            + pow(col("vb") / col("nb"), 2) / (col("nb") - 1)), 6).as("df"))
  }

  /** q184: SKEW DIAGNOSIS report — the pre-flight a 100 TB join runs
    * before picking a strategy: per join key column (here lineitem's
    * three FKs), the key-frequency distribution reduced to the numbers
    * that decide the plan — distinct keys, mean/max frequency, the
    * max/mean skew ratio, the heaviest key, and the salt factor
    * `⌈max·keys/rows⌉` that would level the hottest key to the mean
    * (`operators/SaltedJoin`'s input parameter, derived instead of
    * guessed). Two hash aggs per column (key census → 1-row moments);
    * integer except the two documented ratio divides.
    */
  def q184SkewReport(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    def report(key: String): DataFrame =
      li.groupBy(col(key).as("k")).agg(count(lit(1)).as("f"))
        .agg(
          lit(key).as("join_key"),
          count(lit(1)).as("n_keys"),
          sum("f").as("n_rows"),
          max("f").as("max_freq"),
          round(sum("f").cast("double") / count(lit(1)), 6).as("mean_freq"),
          round(max("f") * count(lit(1)).cast("double") / sum("f"), 6).as("skew_ratio"),
          max(struct(col("f"), col("k"))).getField("k").as("hottest_key"),
          ceil(max("f") * count(lit(1)).cast("double") / sum("f")).cast("long")
            .as("salt_factor"))
    Seq("l_orderkey", "l_partkey", "l_suppkey").map(report)
      .reduce(_ unionAll _)
      .orderBy("join_key")
  }

  /** q181: RUNNING DISTINCT — cumulative distinct users per event type
    * by day, the growth-curve metric (DAU→cumulative-reach) that a
    * sliding `count(DISTINCT)` window can't express and a naive
    * per-day recount pays quadratically for. The exact linear-cost
    * form: a user's FIRST day per event type (one min-agg — no window
    * over raw events), daily new-user counts, then one cumulative sum
    * over (type × day)-cardinality rows. Two hash aggs plus a
    * per-type window over day-count rows — at 100 TB the raw stream
    * is touched once.
    */
  def q181RunningDistinct(spark: SparkSession, dir: String): DataFrame = {
    val firstDay = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        col("ts").cast("date").as("day"))
      .groupBy("event_type", "user_id").agg(min("day").as("first_day"))
    val daily = firstDay.groupBy(col("event_type"), col("first_day").as("day"))
      .agg(count(lit(1)).as("new_users"))
    daily
      .withColumn("cum_distinct_users",
        sum("new_users").over(Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("event_type", "day")
  }

  /** q177: Markov TRANSITION matrix over the event stream — per user,
    * each event's type conditioned on the previous one (lag window
    * under the (ts, event_id) total order), aggregated to
    * P(next | prev) — the session-flow model product analytics fits
    * (and the generator behind synthetic-sequence data). One user_id
    * window shuffle + one pair agg; each probability is a single
    * exact-integer divide (cnt/row_total), bit-stable under round 6.
    */
  def q177MarkovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag("event_type", 1).over(w))
      .filter(col("prev").isNotNull)
    val cnt = pairs.groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy("prev").agg(sum("n").as("row_total"))
    cnt.join(tot, "prev")
      .select(col("prev"), col("next"), col("n"),
        round(col("n").cast("double") / col("row_total"), 6).as("p"))
      .orderBy("prev", "next")
  }

  /** q193: Pearson chi-squared test of independence (source ×
    * length-bucket) + Cramér's V effect size — the categorical
    * association statistic behind "does document length depend on
    * source?" (the corpus-balance sibling of q176's two-sample t).
    *
    * Scale shape: the fact stream folds into the contingency table with
    * ONE partial+final hash agg (cells = sources × 3 buckets); row/col
    * marginals, N, and every χ² term are computed over CELL rows —
    * bounded by category cardinality, never data size; marginal sides
    * are explicit broadcasts. Determinism: observed counts and the
    * rt·ct products are exact integers (≤2^53, exactly convertible);
    * each expected value is one correctly-rounded divide and each term
    * one fixed chain; only the final Σ over ~60 O(1)-scale terms is
    * order-exposed (relative ~1e-15) — absorbed by round 6, the q172
    * argument.
    */
  def q193ChiSquared(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documentsSpread(spark, dir)
      .select(col("source"),
        when(col("n_chars") < 200, lit("short"))
          .when(col("n_chars") < 350, lit("mid"))
          .otherwise(lit("long")).as("bucket"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("o"))
    val rt = cells.groupBy("source").agg(sum("o").as("rt"))
    val ct = cells.groupBy("bucket").agg(sum("o").as("ct"))
    val tot = cells.agg(sum("o").as("n"),
      countDistinct("source").as("r"), countDistinct("bucket").as("c"))
    cells.join(rt, Seq("source")).join(broadcast(ct), Seq("bucket"))
      .crossJoin(broadcast(tot))
      .withColumn("e", (col("rt") * col("ct")).cast("double") / col("n").cast("double"))
      .withColumn("term",
        (col("o").cast("double") - col("e")) * (col("o").cast("double") - col("e")) / col("e"))
      .groupBy()
      .agg(first("n").as("n"),
        ((first("r") - 1) * (first("c") - 1)).as("dof"),
        round(sum("term"), 6).as("chi2"),
        round(sqrt(sum("term") /
          (first("n").cast("double") *
            least(first("r") - 1, first("c") - 1).cast("double"))), 6)
          .as("cramers_v"))
  }

  /** q203: Mann–Whitney U (Wilcoxon rank-sum) — the NONPARAMETRIC
    * two-sample test beside q176's Welch t: do BUILDING and MACHINERY
    * customers draw from the same order-total distribution? Rank-based,
    * so it needs no normality and ignores q188-style outliers.
    *
    * All-integer devices: prices pin to exact cents; pooled ranks are
    * assembled from the VALUE CENSUS (the q199/q174 discipline — the
    * cumulative runs over distinct-value rows, never a row-level sort
    * window), tie-averaged ranks are kept DOUBLED (2·r̄ = 2·cum_below +
    * t + 1 — integer, no ½ grid), so U₂ = 2U is an exact BIGINT; the
    * tie-corrected normal z and the rank-biserial effect size are each
    * one fixed double chain over exact integers (round 6). Scale: one
    * fact equi-join + a census agg; everything after runs over
    * value-cardinality rows.
    */
  def q203MannWhitney(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(
        when(col("c_mktsegment") === "BUILDING", lit("A")).otherwise(lit("B")).as("arm"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("v"))
    val census = s.groupBy("v").agg(
      sum(when(col("arm") === "A", lit(1L)).otherwise(lit(0L))).as("ca"),
      count(lit(1)).as("cnt"))
    val rk = census.withColumn("cum", sum("cnt").over(Window.orderBy("v")))
    rk.agg(
        sum(col("ca")).as("n_a"),
        sum(col("cnt") - col("ca")).as("n_b"),
        sum(col("ca") * (lit(2L) * (col("cum") - col("cnt")) + col("cnt") + lit(1L)))
          .as("r2a"),
        sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("tie3"))
      .withColumn("n", col("n_a") + col("n_b"))
      .withColumn("u2", col("r2a") - col("n_a") * (col("n_a") + lit(1L)))
      .select(col("n_a"), col("n_b"), col("u2"),
        round(expr(
          """CAST(u2 - n_a * n_b AS DOUBLE) / (2.0 * sqrt(CAST(n_a AS DOUBLE)
            |* CAST(n_b AS DOUBLE) / 12.0 * (CAST(n AS DOUBLE) + 1.0
            |- CAST(tie3 AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))))"""
            .stripMargin.replace("\n", " ")), 6).as("z"),
        round(lit(1.0d) - col("u2").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6).as("r_rb"))
  }

  /** q204: BENFORD first-digit screening over order totals — the
    * classic forensic data-quality test (fabricated or unit-mangled
    * numeric columns break the log-uniform leading-digit law; a 100 TB
    * ingest runs this per source/partition as a cheap anomaly tripwire).
    * Observed counts are exact integers from one hash agg; expected
    * shares ln(1+1/d)/ln(10) are fixed chains whose libm ulp round 4
    * absorbs (the q93 argument); deviation is reported in percentage
    * points per digit.
    */
  def q204Benford(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.orders(spark, dir)
      .select(substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("obs"))
    val tot = d.agg(sum("obs").as("n"))
    d.crossJoin(broadcast(tot))
      .select(col("digit").cast("long").as("digit"), col("obs"), col("n"),
        // expected/observed leading-digit shares in percent
        ((log(col("digit").cast("double") + lit(1.0d)) - log(col("digit").cast("double")))
          / log(lit(10.0d)) * lit(100.0d)).as("exp_pct_raw"),
        (col("obs").cast("double") / col("n").cast("double") * lit(100.0d))
          .as("obs_pct_raw"))
      .select(col("digit"), col("obs"),
        round(col("obs_pct_raw"), 4).as("obs_pct"),
        round(col("exp_pct_raw"), 4).as("exp_pct"),
        round(abs(col("obs_pct_raw") - col("exp_pct_raw")), 4).as("dev_pp"))
      .orderBy("digit")
  }

  /** q206: LEAD-LAG cross-correlation between the view and purchase
    * time series — at which offset do purchases track views? (the
    * campaign-effect / causality-screen diagnostic). Both series are
    * 5-minute bucket counts on a DENSE bucket spine (missing buckets
    * are real zeros — correlating only co-present buckets would bias r
    * toward busy periods); the spine is calendar-bounded, built from
    * one min/max row. For each lag in −3..+3 buckets, Pearson r comes
    * from the integer moment sums (n, Σx, Σy, Σxy, Σx², Σy²) — every
    * operand exact, one sqrt chain per lag, so the comparison is
    * bit-identical (no libm beyond correctly-rounded sqrt/divide).
    *
    * Scale: two hash aggs to bucket counts (bucket-cardinality rows),
    * the lag fan-out is a constant ×7 on the SPINE (never the events),
    * and the final agg runs over spine×7 rows.
    */
  def q206LeadLag(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("(unix_micros(ts) div 300000000) * 300000000").as("b"))
    val counts = ev.filter(col("event_type").isin("view", "purchase"))
      .groupBy("b")
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
    val spine = ev.agg(min("b").as("lo"), max("b").as("hi"))
      .select(explode(expr("sequence(lo, hi, 300000000L)")).as("b"))
    val grid = spine
      .join(counts, Seq("b"), "left")
      .select(col("b"), coalesce(col("x"), lit(0L)).as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
    val lags = grid.crossJoin(
        spark.range(-3, 4).select(col("id").as("lag")))
      .select(col("lag"), col("b"), col("x"),
        (col("b") + col("lag") * lit(300000000L)).as("b2"))
      .join(grid.select(col("b").as("b2"), col("y")), Seq("b2"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    lags.select(col("lag"), col("n"),
        round(expr(
          """CAST(n * sxy - sx * sy AS DOUBLE) /
            |sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))"""
            .stripMargin.replace("\n", " ")), 6).as("r"))
      .orderBy("lag")
  }

  /** q261: CLASSICAL SEASONAL DECOMPOSITION (trend + day-of-week
    * seasonal + residual — the moving-average half of STL, Cleveland
    * '90) over the daily event census: trend = centered 7-day moving
    * average on the DENSE day spine (q206's device — missing days are
    * real zeros, not missing windows), seasonal = per-(type, dow) mean
    * of the detrended series, residual = the rest. The decomposition
    * q207's anomaly flags presuppose, made explicit per (type, day).
    *
    * Determinism: EVERYTHING rides the micro-unit integer grid — trend
    * ⌊Σn·10⁶/cnt + ½⌋ over the ROWS ±3 frame (edge days honestly
    * average partial frames), detrended du = n·10⁶ − trend_u (pure
    * BIGINT), seasonal ⌊Σdu/cnt + ½⌋, residual n·10⁶ − trend_u −
    * seas_u — so the only doubles are final BIGINT/10⁶ descales, the
    * same two integers dividing in both engines (no round() anywhere;
    * a sum/count-then-round chain diverged 1 ulp at a .0000005 tie).
    * Scale: one hash agg to the (type × day) census; windows
    * PARTITIONED by type over day-range-bounded spines; seasonal is a
    * (type × 7)-row broadcast.
    */
  def q261SeasonalDecomposition(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
    val counts = ev.groupBy("event_type", "day").agg(count(lit(1)).as("n"))
    val lim = ev.agg(min("day").as("lo"), max("day").as("hi"))
    val spine = ev.select("event_type").distinct().crossJoin(broadcast(lim))
      .select(col("event_type"), explode(expr("sequence(lo, hi)")).as("day"))
    val grid = spine.join(counts, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"), coalesce(col("n"), lit(0L)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    val wtrend = grid
      .withColumn("trend_u",
        floor(sum("n").over(w) * lit(1000000.0) / count(lit(1)).over(w) + 0.5)
          .cast("long"))
      .withColumn("dow", pmod(col("day") + 4, lit(7)))
      .withColumn("du", col("n") * 1000000L - col("trend_u"))
      .localCheckpoint()
    val seas = wtrend.groupBy("event_type", "dow")
      .agg(floor(sum("du").cast("double") / count(lit(1)) + 0.5).cast("long")
        .as("seas_u"))
    wtrend.join(broadcast(seas), Seq("event_type", "dow"))
      .select(col("event_type"),
        date_add(lit("1970-01-01").cast("date"), col("day").cast("int")).as("d"),
        col("n"), (col("trend_u") / 1000000.0).as("trend"),
        (col("seas_u") / 1000000.0).as("seasonal"),
        ((col("n") * 1000000L - col("trend_u") - col("seas_u")) / 1000000.0)
          .as("residual"))
      .orderBy("event_type", "d")
  }

  /** q207: SEASONAL-BASELINE anomaly detection with an INTEGER-EXACT
    * trigger — per hour-of-day baselines over daily event counts, a
    * (day, hour) cell flags when |cnt − μ_h| > 3σ_h. The flag is the
    * cross-multiplied all-integer test (n·cnt − Σ)² > 9·(n·Σq − Σ²)
    * (n = days, Σ/Σq = per-hour count moments) — no float boundary can
    * flip membership, which is exactly what a paging alert needs; the
    * displayed z rides the usual round-6 chain. Scale: counts collapse
    * to (day × hour) rows in one hash agg; baselines are 24-row
    * broadcasts.
    */
  def q207SeasonalAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val cell = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), hour(col("ts")).cast("long").as("hr"))
      .groupBy("day", "hr").agg(count(lit(1)).as("cnt"))
    val base = cell.groupBy("hr")
      .agg(count(lit(1)).as("nd"), sum("cnt").as("s"),
        sum(col("cnt") * col("cnt")).as("sq"))
    cell.join(broadcast(base), Seq("hr"))
      .filter(
        (col("nd") * col("cnt") - col("s")) * (col("nd") * col("cnt") - col("s")) >
          lit(9L) * (col("nd") * col("sq") - col("s") * col("s")))
      .select(col("day"), col("hr"), col("cnt"),
        // z = (cnt − μ)/σ_pop = (nd·cnt − s)/√(nd·sq − s²)
        round(expr(
          "CAST(nd * cnt - s AS DOUBLE) / sqrt(CAST(nd * sq - s * s AS DOUBLE))"),
          6).as("z"))
      .orderBy("day", "hr")
  }

  /** q218: ERASURE SWEEP audit (right-to-be-forgotten) — given a
    * deletion cohort (a deterministic ~5% md5 draw standing in for the
    * request list), report per table what must go (row counts, share,
    * id-sum pin for the downstream delete job) AND verify the
    * post-erasure state honestly: the residual-match count is computed
    * by re-scanning the anti-joined remainder, not assumed zero. The
    * per-table plan is one scan with a scan-local selector (the md5
    * pushes into the scan; no join against a request table — at 100 TB
    * the request list form of this query is q73's Bloom-prefilter
    * shape). Covers the three key spaces the star schema links:
    * event users, customers, and their orders.
    */
  def q218ErasureSweep(spark: SparkSession, dir: String): DataFrame = {
    def sel(key: Column): Column =
      conv(substring(md5(key.cast("string")), 1, 2), 16, 10).cast("long") < 13
    def audit(name: String, df: DataFrame, key: Column): DataFrame = {
      val flagged = df.select(key.as("k")).withColumn("del", sel(col("k")))
      val main = flagged.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("del"), 1L).otherwise(0L)).as("n_to_erase"),
        round(sum(when(col("del"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double"), 6).as("erase_pct"),
        sum(when(col("del"), col("k")).otherwise(0L)).as("erase_key_sum"))
      val resid = flagged.filter(!col("del"))
        .agg(sum(when(sel(col("k")), 1L).otherwise(0L)).as("n_residual"))
      main.crossJoin(broadcast(resid))
        .select(lit(name).as("table_name"), col("n_rows"), col("n_to_erase"),
          col("erase_pct"), col("erase_key_sum"),
          coalesce(col("n_residual"), lit(0L)).as("n_residual"))
    }
    audit("customer", Tables.customer(spark, dir), col("c_custkey"))
      .unionByName(audit("events_users", Tables.events(spark, dir), col("user_id")))
      .unionByName(audit("orders", Tables.orders(spark, dir), col("o_custkey")))
      .orderBy("table_name")
  }

  /** Poisson(1) inverse-CDF thresholds on the 60-bit md5 uniform, for
    * q233's deterministic bootstrap weights: w(u) = #{t ≤ u} caps at 5
    * (P[w > 5] ≈ 6e−4 folded into the top bucket). Computed ONCE here
    * and embedded as literals in BOTH the Spark CASE ladder and the
    * generated oracle SQL — the bandFams single-source discipline, so
    * no cross-engine transcendental is ever evaluated twice.
    */
  private[graft] lazy val poissonThresholds: Seq[Long] = {
    val e1 = math.exp(-1.0)
    // cumulative P[X ≤ i] = e⁻¹ · Σ_{j≤i} 1/j! for i = 0..4
    Seq(1.0, 2.0, 2.5, 8.0 / 3.0, 65.0 / 24.0)
      .map(c => (c * e1 * 1152921504606846976.0).toLong) // × 2^60
  }

  /** q233: POISSON-BOOTSTRAP confidence intervals (the distributed
    * bootstrap of Chamandy et al. — classic resampling needs n draws
    * per replicate from the WHOLE dataset, impossible in one pass;
    * Poisson(1) per-row weights approximate multinomial resampling and
    * need only scan-local arithmetic): B = 32 replicates of each
    * source's mean n_chars, every weight a DETERMINISTIC function of
    * (doc_id, replicate) — a 60-bit md5 uniform cut by the embedded
    * inverse-CDF thresholds — so both engines reproduce the exact same
    * resamples and the gate is bit-exact, no RNG crossing the boundary.
    * Output per source: point estimate and the [2nd smallest, 2nd
    * largest] replicate-mean interval (the ~93.75% percentile-bootstrap
    * CI at B = 32), plus its width.
    *
    * Scale: ONE scan fans out B weight rows per doc (scan-local md5 +
    * integer compare — the explode multiplies 16-byte rows, not text);
    * partial+final integer aggs to (source × B) rows; the CI sort runs
    * over B = 32 values per source (bounded collect_list). Replicate
    * means are single divides of exact integer sums — no accumulation-
    * order exposure anywhere.
    */
  def q233BootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val B = 32
    val ts = poissonThresholds
    val u = expr("cast(conv(substring(md5(concat(cast(doc_id as string), '#', " +
      "cast(b as string))), 1, 15), 16, 10) as bigint)")
    val w = when(col("u") < ts(0), 0L).when(col("u") < ts(1), 1L)
      .when(col("u") < ts(2), 2L).when(col("u") < ts(3), 3L)
      .when(col("u") < ts(4), 4L).otherwise(5L)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val reps = docs
      .withColumn("b", explode(typedlit((0 until B).map(_.toLong))))
      .withColumn("u", u).withColumn("w", w)
      .groupBy("source", "b")
      .agg(sum(col("w") * col("n_chars")).as("sx"), sum("w").as("sw"))
      .withColumn("rm", col("sx").cast("double") / col("sw"))
    val ci = reps.groupBy("source")
      .agg(sort_array(collect_list(col("rm"))).as("ms"))
      .select(col("source"),
        round(element_at(col("ms"), 2), 6).as("ci_lo"),
        round(element_at(col("ms"), B - 1), 6).as("ci_hi"),
        round(element_at(col("ms"), B - 1) - element_at(col("ms"), 2), 6)
          .as("ci_width"))
    docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        round(sum("n_chars").cast("double") / count(lit(1)), 6).as("mean_chars"))
      .join(ci, Seq("source"))
      .orderBy("source")
  }

  /** q232: K-ANONYMITY audit — the privacy census a release/sharing
    * review runs before any quasi-identifier projection leaves the
    * house: group rows by the QI tuple (nation × market segment ×
    * coarsened balance band), then for each k threshold report the
    * equivalence classes smaller than k, the rows they re-identify,
    * their share, and the SUPPRESSION COST (rows that must be dropped
    * or generalized to reach k-anonymity = exactly the violating
    * rows). The k sweep (2/5/10) is the tuning table: it shows how
    * much coarsening the chosen QI grid still needs.
    *
    * Scale: ONE hash agg on the QI tuple builds the class census
    * (value-cardinality rows); the k sweep multiplies the CENSUS, not
    * the data (explode over 3 thresholds on class rows); everything is
    * integer until the one share divide. The class census is also the
    * l-diversity starting point — kept single-purpose here.
    */
  def q232KAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val ks = typedlit(Seq(2L, 5L, 10L))
    val classes = Tables.customer(spark, dir)
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"))
      .groupBy("c_nationkey", "c_mktsegment", "bal_band")
      .agg(count(lit(1)).as("cls"))
    val tot = classes.agg(sum("cls").as("n_rows"),
      count(lit(1)).as("n_classes"), min("cls").as("min_class"))
    classes.withColumn("k", explode(ks))
      .groupBy("k")
      .agg(
        sum(when(col("cls") < col("k"), 1L).otherwise(0L)).as("n_violating_classes"),
        sum(when(col("cls") < col("k"), col("cls")).otherwise(0L)).as("n_violating_rows"))
      .crossJoin(broadcast(tot))
      .select(col("k").as("k_threshold"), col("n_classes"), col("min_class"),
        col("n_violating_classes"), col("n_violating_rows"),
        round(col("n_violating_rows").cast("double") / col("n_rows"), 6)
          .as("violating_share"))
      .orderBy("k_threshold")
  }

  /** q256: L-DIVERSITY audit — k-anonymity's necessary companion
    * (Machanavajjhala et al., ICDE '06): q232 certifies every
    * quasi-identifier class is POPULATED (≥ k rows), this certifies
    * each class's SENSITIVE attribute is DIVERSE — a k-anonymous class
    * where everyone shares one market segment still leaks the segment.
    * QI = (nation, account-balance band); sensitive = c_mktsegment.
    * Per ℓ ∈ {2, 3, 4}: classes/rows failing distinct-ℓ-diversity,
    * plus the entropy profile (min/mean Shannon entropy over classes —
    * entropy ℓ-diversity's statistic).
    *
    * Determinism: the 5 TPC-H segments pivot into FIXED per-class count
    * columns, so H = −(t₁ + … + t₅) is a fixed association chain of ≤5
    * terms (never an unordered float aggregate); the class mean rides
    * the ⌊H·10⁶+0.5⌋ integer grid. Scale: one hash agg to the QI-class
    * census (nations × bands — value-domain bounded), everything after
    * runs on census rows.
    */
  def q256LDiversity(spark: SparkSession, dir: String): DataFrame = {
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    val cls = Tables.customer(spark, dir)
      .select(col("c_nationkey"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"),
        col("c_mktsegment"))
      .groupBy("c_nationkey", "bal_band")
      .agg(count(lit(1)).as("n"),
        (countDistinct("c_mktsegment").as("n_distinct") +:
          segs.zipWithIndex.map { case (s, i) =>
            sum(when(col("c_mktsegment") === s, 1L).otherwise(0L)).as(s"n${i + 1}")
          }): _*)
    def term(i: Int) = when(col(s"n$i") > 0,
      (col(s"n$i").cast("double") / col("n")) *
        log(col(s"n$i").cast("double") / col("n"))).otherwise(lit(0.0))
    val withH = cls.withColumn("h",
      -(term(1) + term(2) + term(3) + term(4) + term(5)))
      .withColumn("h_u", floor(col("h") * 1000000.0 + 0.5).cast("long"))
      .localCheckpoint()
    val tot = withH.agg(count(lit(1)).as("n_classes"), sum("n").as("n_rows"),
      min("n_distinct").as("min_distinct"), round(min("h"), 6).as("min_entropy"),
      round(sum("h_u").cast("double") / 1000000.0 / count(lit(1)), 6)
        .as("mean_entropy"))
    withH.withColumn("l", explode(typedlit(Seq(2L, 3L, 4L))))
      .groupBy("l")
      .agg(sum(when(col("n_distinct") < col("l"), 1L).otherwise(0L))
        .as("n_failing_classes"),
        sum(when(col("n_distinct") < col("l"), col("n")).otherwise(0L))
          .as("n_failing_rows"))
      .crossJoin(broadcast(tot))
      .select(col("l").as("l_threshold"), col("n_classes"),
        col("n_failing_classes"), col("n_failing_rows"),
        round(col("n_failing_rows").cast("double") / col("n_rows"), 6)
          .as("failing_share"),
        col("min_distinct"), col("min_entropy"), col("mean_entropy"))
      .orderBy("l_threshold")
  }

  /** q258: DIFFERENTIALLY-PRIVATE release (Laplace mechanism, Dwork
    * '06) with the measured error-vs-ε curve — the third privacy
    * operator (q232 k-anonymity, q256 l-diversity audit the data; this
    * one actually PERTURBS a release): per-event-type counts published
    * at ε ∈ {0.1, 1, 10} with Laplace(1/ε) noise (sensitivity 1), plus
    * the per-ε mean absolute error — the accuracy-vs-privacy table (the
    * q225/q229/q244/q247 tuning-curve family) that picks the budget.
    *
    * The noise is SEEDED: u = (md5-48-bit + 0.5)/2⁴⁸ ∈ (0,1) keyed on
    * (type, ε-label), inverse-CDF'd through the same mirrored
    * −(1/ε)·sign(u−½)·ln(1−2|u−½|) expression in both engines — the
    * q30/q57 no-RNG-crosses-the-engine-boundary discipline applied to a
    * noise mechanism (a production release would draw real randomness;
    * the GATE needs replayable noise). Scale: one hash agg to the type
    * census; noise/errors are census-level; the ε-mean rides the
    * ⌊err·10⁴+0.5⌋ integer grid.
    */
  def q258DpNoisyCounts(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.events(spark, dir)
      .groupBy("event_type").agg(count(lit(1)).as("n_true"))
    val eps = per.withColumn("eps_label",
        explode(typedlit(Seq("0.1", "1.0", "10.0"))))
      .withColumn("eps", col("eps_label").cast("double"))
      .withColumn("u",
        (conv(substring(md5(concat_ws("|", col("event_type"), col("eps_label"))),
          1, 12), 16, 10).cast("long").cast("double") + 0.5) /
          lit(281474976710656.0))
      .withColumn("noise",
        lit(-1.0) / col("eps") * signum(col("u") - 0.5) *
          log(lit(1.0) - lit(2.0) * abs(col("u") - 0.5)))
      .withColumn("err_u",
        floor(abs(col("noise")) * 10000.0 + 0.5).cast("long"))
      .localCheckpoint()
    val perEps = eps.groupBy("eps_label")
      .agg(round(sum("err_u").cast("double") / 10000.0 / count(lit(1)), 6)
        .as("mean_abs_err"))
    eps.join(broadcast(perEps), "eps_label")
      .select(col("event_type"), col("eps"), col("n_true"),
        round(col("n_true") + col("noise"), 4).as("noisy"),
        round(abs(col("noise")), 4).as("abs_err"),
        col("mean_abs_err"))
      .orderBy("eps", "event_type")
  }

  /** q241: MULTI-TOUCH ATTRIBUTION (position-based 40/20/40) — the
    * marketing-analytics allocation query: each purchase closes a
    * JOURNEY (its user's touches since the previous purchase), and the
    * conversion's credit splits 40% to the first touch, 40% to the
    * last, 20% across the middles; per-channel (event_type) totals are
    * the report. Credit is INTEGER BASIS POINTS with an exact remainder
    * policy (middles get ⌊2000/(n−2)⌋ bp, the first 2000 mod (n−2)
    * middles one extra — every journey sums to exactly 10000, no float
    * allocation): the q168 water-fill discipline applied to
    * attribution.
    *
    * Scale: journey ids from a per-USER running purchase count
    * (partitioned windows — parallel, never global); touch positions
    * from per-(user, journey) windows; one census agg at the end. The
    * share divide is the only double op.
    */
  def q241MultiTouchAttribution(spark: SparkSession, dir: String): DataFrame = {
    val wU = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val ev = Tables.events(spark, dir)
      .select("user_id", "event_id", "ts", "event_type")
      .withColumn("is_p", (col("event_type") === "purchase").cast("long"))
      .withColumn("jid", coalesce(
        sum("is_p").over(wU.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val convs = ev.filter(col("is_p") === 1)
      .select(col("user_id"), col("jid"))
    val touches = ev.filter(col("is_p") === 0)
      .withColumn("pos", row_number().over(
        Window.partitionBy("user_id", "jid").orderBy("ts", "event_id")).cast("long"))
    val sized = touches.groupBy("user_id", "jid").agg(count(lit(1)).as("n"))
    val attributed = touches
      .join(sized, Seq("user_id", "jid"))
      .join(convs, Seq("user_id", "jid"), "left_semi")
      .withColumn("bp",
        when(col("n") === 1, 10000L)
          .when(col("n") === 2, 5000L)
          .when(col("pos") === 1 || col("pos") === col("n"), 4000L)
          .otherwise(expr("2000 div (n - 2)") +
            when(col("pos") - 1 <= expr("2000 % (n - 2)"), 1L).otherwise(0L)))
    val totConvs = attributed.agg(
      countDistinct(col("user_id") * 1000000 + col("jid")).as("total_convs"))
    attributed.groupBy("event_type")
      .agg(count(lit(1)).as("n_touches"),
        countDistinct(col("user_id") * 1000000 + col("jid")).as("n_convs_touched"),
        sum("bp").as("total_credit_bp"))
      .crossJoin(broadcast(totConvs))
      .withColumn("credit_share",
        round(col("total_credit_bp").cast("double") / (col("total_convs") * 10000L), 6))
      .drop("total_convs")
      .orderBy("event_type")
  }

  /** q243: TIME-TO-CONVERT distribution — the activation-lag report
    * behind every funnel review: per signed-up user, the lag from FIRST
    * signup to the first purchase at-or-after it, bucketed (same day /
    * 1–3 / 4–7 / 8–30 / >30 days / never) with each bucket's user share.
    * Lags are integer day diffs (no float time math); bucket labels
    * carry a sort prefix so the output order is the funnel order.
    *
    * Scale: two filtered key aggs (first signup; first qualifying
    * purchase via a conditional min over the user-key join — never a
    * window over events), then a census-sized bucket rollup. The share
    * divide is the one double op.
    */
  def q243TimeToConvert(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select("user_id", "ts", "event_type")
    val su = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("su_ts"))
    val pu = ev.filter(col("event_type") === "purchase").select("user_id", "ts")
    val firstP = su.join(pu, Seq("user_id"), "left")
      .groupBy("user_id", "su_ts")
      .agg(min(when(col("ts") >= col("su_ts"), col("ts"))).as("p_ts"))
    val lag = datediff(col("p_ts").cast("date"), col("su_ts").cast("date"))
    val bucket = when(col("p_ts").isNull, "5_never")
      .when(lag === 0, "0_same_day")
      .when(lag <= 3, "1_1-3d")
      .when(lag <= 7, "2_4-7d")
      .when(lag <= 30, "3_8-30d")
      .otherwise("4_gt30d")
    val tot = su.agg(count(lit(1)).as("n_signups"))
    firstP.withColumn("bucket", bucket)
      .groupBy("bucket").agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_users"),
        round(col("n_users").cast("double") / col("n_signups"), 6).as("share"))
      .orderBy("bucket")
  }

  /** q221: CO-OCCURRENCE LIFT matrix (market-basket association) —
    * for every event-type pair, lift = N·n(a∧b)/(n(a)·n(b)) over USERS
    * (lift > 1: the behaviors attract; < 1: they repel): the
    * association screen behind recommendation and funnel design.
    * All counts are exact integers from one distinct projection
    * (user × type — the shuffle is the deduped pair stream, never raw
    * events); the pair join keys on user_id (per-user type sets are
    * bounded by type cardinality); lift is one fixed integer-product
    * chain into a single divide, round 6 — bit-identical.
    */
  def q221CooccurrenceLift(spark: SparkSession, dir: String): DataFrame = {
    val ut = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type")).distinct()
      .localCheckpoint() // three consumers
    val nU = ut.agg(countDistinct("user_id").as("n_users")) // 1-row, stays in the plan
    val na = ut.groupBy("event_type").agg(count(lit(1)).as("n"))
    val pairs = ut.as("a")
      .join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
      .agg(count(lit(1)).as("nab"))
    pairs
      .join(na.select(col("event_type").as("ta"), col("n").as("n_a")), Seq("ta"))
      .join(broadcast(na.select(col("event_type").as("tb"), col("n").as("n_b"))), Seq("tb"))
      .crossJoin(broadcast(nU))
      .select(col("ta"), col("tb"), col("n_a"), col("n_b"), col("nab"),
        round((col("n_users") * col("nab")).cast("double") /
          (col("n_a") * col("n_b")).cast("double"), 6).as("lift"))
      .orderBy("ta", "tb")
  }

  /** q222: DELETE-GROUP JACKKNIFE — uncertainty for a corpus statistic
    * (mean document length) when rows are NOT independent but sources
    * are: the leave-one-SOURCE-out resampling a curation report should
    * quote instead of the iid standard error (which understates error
    * under source-level correlation). θ₍ᵢ₎ = (S − sᵢ)/(N − nᵢ) — one
    * exact-integer divide per source; v = (g−1)/g·Σ(θ₍ᵢ₎ − θ̄)² over g
    * source rows. Per-source LOO estimates ride along as the influence
    * diagnostic (which source moves the number).
    *
    * Scale: ONE hash agg to (source, sum, count); everything after runs
    * on g rows. Σ over g O(1)-scale terms is the only order exposure
    * (round 6, the q193 argument).
    */
  /** q251: INVERSE-PROPENSITY-WEIGHTED treatment effect — the
    * observational-study estimator (Horvitz–Thompson '52 / Rosenbaum &
    * Rubin '83) beside q222/q223's randomized-experiment tools: effect
    * of being error-heavy (≥14 error events) on purchase spend, where
    * total activity confounds both. Propensity = the stratum's own
    * treated share (3 integer activity bands); the ALL_NAIVE row is the
    * confounded difference-in-means, the ALL_IPW row the Hájek-
    * normalized IPW contrast — the query's point is the gap between
    * them. Strata without overlap (e = 0 or 1) are excluded from the
    * IPW rows honestly (the positivity condition, reported per stratum).
    *
    * Determinism: censuses are exact integers/cents; e and the weighted
    * means are ratio expressions mirrored association-for-association;
    * round 6 at output. Scale: one user-key agg over events, then
    * everything runs on 3 stratum census rows + 1-row broadcasts.
    */
  def q251IpwEffect(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_ev"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_err"),
        coalesce(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100.0 + 0.5).cast("long"))), lit(0L)).as("y_cents"))
      .withColumn("t", when(col("n_err") >= 14, 1L).otherwise(0L))
      .withColumn("stratum",
        when(col("n_ev") <= 60, "a_low")
          .when(col("n_ev") <= 70, "b_mid").otherwise("c_high"))
    val strata = users.groupBy("stratum")
      .agg(count(lit(1)).as("n_users"), sum("t").as("n_treated"),
        sum(when(col("t") === 1, col("y_cents")).otherwise(0L)).as("yt"),
        sum(when(col("t") === 0, col("y_cents")).otherwise(0L)).as("yc"))
      .withColumn("e_hat", col("n_treated").cast("double") / col("n_users"))
      .localCheckpoint()
    val perStratum = strata.select(col("stratum"),
      col("n_users"), col("n_treated"), round(col("e_hat"), 6).as("e_hat"),
      round(when(col("n_treated") > 0,
        col("yt").cast("double") / 100.0 / col("n_treated")), 6).as("mean_y_treated"),
      round(when(col("n_users") > col("n_treated"),
        col("yc").cast("double") / 100.0 / (col("n_users") - col("n_treated"))), 6)
        .as("mean_y_control"))
    // Hájek IPW over users in overlapping strata: Σ(T·Y/e)/Σ(T/e) vs
    // Σ((1−T)·Y/(1−e))/Σ((1−T)/(1−e))
    val kept = users.join(
      broadcast(strata.filter(col("n_treated") > 0 &&
        col("n_treated") < col("n_users")).select("stratum", "e_hat")), "stratum")
    val ipw = kept.agg(
      (sum(col("t").cast("double") * col("y_cents") / 100.0 / col("e_hat")) /
        sum(col("t").cast("double") / col("e_hat"))).as("mt"),
      (sum((lit(1L) - col("t")).cast("double") * col("y_cents") / 100.0 /
        (lit(1.0) - col("e_hat"))) /
        sum((lit(1L) - col("t")).cast("double") / (lit(1.0) - col("e_hat")))).as("mc"),
      count(lit(1)).as("n_users"), sum("t").as("n_treated"))
    val naive = users.agg(
      (sum(when(col("t") === 1, col("y_cents")).otherwise(0L)).cast("double") / 100.0 /
        sum("t")).as("mt"),
      (sum(when(col("t") === 0, col("y_cents")).otherwise(0L)).cast("double") / 100.0 /
        (count(lit(1)) - sum("t"))).as("mc"),
      count(lit(1)).as("n_users"), sum("t").as("n_treated"))
    def summary(nm: String, df: DataFrame) = df.select(lit(nm).as("stratum"),
      col("n_users"), col("n_treated"), lit(null).cast("double").as("e_hat"),
      round(col("mt"), 6).as("mean_y_treated"), round(col("mc"), 6).as("mean_y_control"))
    perStratum.unionByName(summary("x_all_naive", naive))
      .unionByName(summary("y_all_ipw", ipw))
      .withColumn("diff", round(col("mean_y_treated") - col("mean_y_control"), 6))
      .orderBy("stratum")
  }

  /** q252: EXPERIMENT SIZING (power analysis) — the pre-experiment
    * consult q222/q223/q251 all presuppose: per event type, from the
    * measured mean and variance of `value`, the required per-arm sample
    * size to detect a 5% lift at two-sided α=0.05 with power 0.8 —
    * n = ⌈(z₀.₉₇₅+z₀.₈)²·2σ²/δ²⌉ with the standard constant
    * (1.96+0.8416)² = 7.84887 embedded identically in both engines,
    * plus how many days of event volume that n represents at the
    * type's observed daily rate.
    *
    * Determinism: values quantize to integer cents, so Σx/Σx² are exact
    * BIGINTs and σ² is a mirrored ratio expression (never the engines'
    * own var_pop, whose internal update order differs; the cents²
    * device caps at ~3e15 per million rows — the documented exactness
    * trade); day counts integer; round 6. Scale: one hash agg over
    * events + a census-level project — nothing else.
    */
  def q252PowerAnalysis(spark: SparkSession, dir: String): DataFrame = {
    val c = 7.84887 // (z_{0.975} + z_{0.8})^2 to 5 dp — same literal in oracle
    val per = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("ts"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_obs"), sum("cents").as("s1c"),
        sum(col("cents") * col("cents")).as("s2c"),
        countDistinct(date_trunc("DAY", col("ts"))).as("n_days"))
    per
      .withColumn("mean_v", col("s1c").cast("double") / 100.0 / col("n_obs"))
      .withColumn("var_v",
        (col("s2c").cast("double") / 10000.0 -
          (col("s1c").cast("double") / 100.0) * (col("s1c").cast("double") / 100.0) /
            col("n_obs")) / col("n_obs"))
      .withColumn("mde", col("mean_v") * 0.05)
      .withColumn("n_required",
        ceil(lit(c) * 2.0 * col("var_v") / (col("mde") * col("mde"))).cast("long"))
      .withColumn("days_to_power",
        ceil(col("n_required").cast("double") /
          (col("n_obs").cast("double") / col("n_days"))).cast("long"))
      .select(col("event_type"), col("n_obs"), round(col("mean_v"), 6).as("mean_v"),
        round(col("var_v"), 6).as("var_v"), round(col("mde"), 6).as("mde"),
        col("n_required"), col("n_days"), col("days_to_power"))
      .orderBy("event_type")
  }

  /** q254: SPLIT-CONFORMAL PREDICTION calibration — the
    * distribution-free uncertainty wrapper (Vovk '05, Lei et al. '18)
    * every deployed regression model needs: fit OLS of extended price
    * on quantity on the md5-hash train split, take the 90% conformal
    * residual bound from the calibration split, and MEASURE the
    * achieved coverage on the held-out test split — the end-to-end
    * guarantee check, not just the fit.
    *
    * The conformal quantile is the ⌈(n_cal+1)·0.9⌉-th smallest
    * |residual| — an order statistic, i.e. a global sort at row scale.
    * Device: the q247/q253 fixed-grid census (m = 4096 bins over
    * [0, rmax]) and the bound is the UPPER EDGE of the bin where the
    * cumulative count crosses k — conservative by at most one bin
    * width (documented; the guarantee direction is preserved). Fit
    * moments are exact BIGINTs (x integer, y in cents) cast to double
    * only inside the mirrored slope/intercept ratios; k is integer
    * arithmetic (`(9·(n+1)+9) div 10`). Scale: three filtered aggs +
    * one census window; every crossJoin is a 1-row broadcast.
    */
  def q254ConformalCalibration(spark: SparkSession, dir: String): DataFrame = {
    val m = 4096
    val base = Tables.lineitem(spark, dir)
      .select(col("l_quantity").cast("long").as("x"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("yc"),
        (conv(substring(md5(concat_ws("_", col("l_orderkey"), col("l_linenumber"))),
          1, 8), 16, 10).cast("long") % 4).as("b"))
      .withColumn("split",
        when(col("b") <= 1, "train").when(col("b") === 2, "cal").otherwise("test"))
    val fit = base.filter(col("split") === "train")
      .agg(count(lit(1)).as("n_train"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"), sum("yc").as("syc"),
        sum(col("x") * col("yc")).as("sxyc"))
      .withColumn("slope_c",
        (col("n_train").cast("double") * col("sxyc").cast("double") -
          col("sx").cast("double") * col("syc").cast("double")) /
          (col("n_train").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")))
      .withColumn("icept_c",
        (col("syc").cast("double") - col("slope_c") * col("sx").cast("double")) /
          col("n_train").cast("double"))
      .select("n_train", "slope_c", "icept_c").localCheckpoint()
    // Materialized ONCE (narrowed to the two columns the cal/bound/test
    // passes read): without this the lineitem scan + scoring recomputes
    // 3× — the round-14 audit's 12.9 s isolated cold time for this query.
    val scored = base.crossJoin(broadcast(fit))
      .withColumn("rc", abs(col("yc").cast("double") -
        (col("icept_c") + col("slope_c") * col("x").cast("double"))))
      .select("split", "rc").localCheckpoint()
    val calStats = scored.filter(col("split") === "cal")
      .agg(count(lit(1)).as("n_cal"), max("rc").as("rmax")).localCheckpoint()
    val bound = scored.filter(col("split") === "cal")
      .crossJoin(broadcast(calStats))
      .withColumn("bucket",
        least(floor(col("rc") / col("rmax") * m), lit((m - 1).toLong)).cast("long"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(Window.orderBy("bucket")))
      .crossJoin(broadcast(calStats))
      .agg(min(when(col("cum") >= expr("(9 * (n_cal + 1) + 9) div 10"),
        col("bucket"))).as("bb"))
      .crossJoin(broadcast(calStats))
      .select(col("n_cal"),
        ((col("bb") + 1L).cast("double") * col("rmax") / lit(m.toDouble)).as("bound_c"))
      .localCheckpoint()
    scored.filter(col("split") === "test").crossJoin(broadcast(bound))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("rc") <= col("bound_c"), 1L).otherwise(0L)).as("n_covered"))
      .crossJoin(broadcast(bound))
      .crossJoin(broadcast(fit))
      .select(col("n_train"), col("n_cal"), col("n_test"),
        round(col("slope_c") / 100.0, 6).as("slope"),
        round(col("icept_c") / 100.0, 6).as("intercept"),
        round(col("bound_c") / 100.0, 6).as("conf_bound"),
        col("n_covered"),
        round(col("n_covered").cast("double") / col("n_test"), 6).as("coverage"))
  }

  def q222Jackknife(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.documentsSpread(spark, dir)
      .groupBy("source")
      .agg(sum("n_chars").as("s_i"), count(lit(1)).as("n_i"))
    val tot = per.agg(sum("s_i").as("s"), sum("n_i").as("n"),
      count(lit(1)).as("g"))
    val loo = per.crossJoin(broadcast(tot))
      .withColumn("theta_loo",
        (col("s") - col("s_i")).cast("double") / (col("n") - col("n_i")).cast("double"))
    val thetaBar = loo.agg(
      (sum("theta_loo") / count(lit(1)).cast("double")).as("theta_bar"))
    val se = loo.crossJoin(broadcast(thetaBar))
      .agg(sqrt(
        (count(lit(1)) - 1).cast("double") / count(lit(1)).cast("double") *
          sum((col("theta_loo") - col("theta_bar")) *
            (col("theta_loo") - col("theta_bar")))).as("se_jack"))
    loo.crossJoin(broadcast(se))
      .select(col("source"), col("n_i"),
        round(col("theta_loo"), 6).as("theta_loo"),
        round(col("s").cast("double") / col("n").cast("double"), 6).as("theta"),
        round(col("se_jack"), 6).as("se_jack"))
      .orderBy("source")
  }

  /** q223: CUPED variance reduction (Deng et al., WSDM '13) — the
    * experimentation-platform standard: adjust each user's experiment
    * metric Y by their PRE-PERIOD covariate X (Ya = Y − θ(X − X̄),
    * θ = cov/var), cutting metric variance by exactly ρ² and making
    * every A/B test that much cheaper. Here the event month splits at
    * its midpoint into pre/post (the experiment assignment plugs into
    * q176's arm draw downstream), and the report is the pooled θ, raw
    * vs adjusted variance, and the reduction share (= ρ² exactly, by
    * the pooled-θ algebra). Determinism: per-user sums quantize to exact
    * integer CENTS (no double accumulation order at all); every moment
    * (Σx, Σy, Σxy, Σx², Σy²) is an exact BIGINT and each statistic a
    * fixed chain over them; variances descale cents²→units² before
    * round 6 (the q216 ulp lesson).
    */
  def q223CupedVariance(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val mid = ev.agg(((min(unix_micros(col("ts"))) + max(unix_micros(col("ts"))))
      .cast("long") / lit(2L)).cast("long").as("mid_us"))
    val per = ev.crossJoin(broadcast(mid))
      .select(col("user_id"),
        when(unix_micros(col("ts")) < col("mid_us"),
          floor(col("value") * lit(100.0d) + lit(0.5d)).cast("long")).otherwise(0L)
          .as("xc"),
        when(unix_micros(col("ts")) >= col("mid_us"),
          floor(col("value") * lit(100.0d) + lit(0.5d)).cast("long")).otherwise(0L)
          .as("yc"))
      .groupBy("user_id")
      .agg(sum("xc").as("x"), sum("yc").as("y"))
    per.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n"),
        round(expr("CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)"), 6)
          .as("theta"),
        round(expr(
          "CAST(n * syy - sy * sy AS DOUBLE) / CAST(n AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0"),
          6).as("var_y"),
        round(expr(
          """(CAST(n * syy - sy * sy AS DOUBLE) / CAST(n AS DOUBLE) / CAST(n AS DOUBLE)
            |- CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
            |  / CAST(n * sxx - sx * sx AS DOUBLE)
            |  / CAST(n AS DOUBLE) / CAST(n AS DOUBLE)) / 10000.0"""
            .stripMargin.replace("\n", " ")), 6).as("var_y_cuped"),
        round(expr(
          """CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
            |/ CAST(n * sxx - sx * sx AS DOUBLE)
            |/ CAST(n * syy - sy * sy AS DOUBLE)"""
            .stripMargin.replace("\n", " ")), 6).as("reduction"))
  }

  /** q224: LABEL-PROPAGATION community detection (Raghavan et al. 2007,
    * synchronous variant) over the nation-level trade graph — the
    * community step past q66's connected components (CC merges anything
    * touching; LP groups by CONNECTION STRENGTH): nodes start as their
    * own label and each round adopt the weighted-mode label of their
    * neighbors (tie → min label). Three unrolled rounds, every round's
    * labels emitted — the oracle replays the whole trajectory, so the
    * gate pins the update rule, not just a fixed point.
    *
    * Determinism: integer edge weights (trade counts), weighted-mode =
    * exact integer sums + struct-min argmax with the stated tie. Scale:
    * the per-round plan is one edges⨝labels equi-join + two hash aggs
    * keyed on (node, label) — identical at billions of edges (the q140
    * PageRank shape); the 25-node fixture graph exercises the rule, not
    * the shuffle.
    */
  /** q224/q338 shared: the symmetrized weighted nation trade graph and
    * the three synchronous label-propagation rounds.
    */
  private def nationGraphRounds(
      spark: SparkSession, dir: String): (DataFrame, Seq[DataFrame]) = {
    val cust = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_nationkey").as("cn"))
    val e0 = Tables.lineitem(spark, dir)
      .join(cust, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("cn"), col("s_nationkey").as("sn"))
      .agg(count(lit(1)).as("w"))
    val edges = e0.select(col("cn").as("u"), col("sn").as("v"), col("w"))
      .unionByName(e0.select(col("sn").as("u"), col("cn").as("v"), col("w")))
      .groupBy("u", "v").agg(sum("w").as("w"))
      .localCheckpoint() // reused by all three rounds
    var labels = edges.select(col("u").as("node")).distinct()
      .withColumn("label", col("node"))
    val rounds = (1 to 3).map { _ =>
      labels = edges
        .join(labels.select(col("node").as("v"), col("label")), Seq("v"))
        .groupBy(col("u"), col("label")).agg(sum("w").as("lw"))
        .groupBy("u")
        .agg(min(struct((-col("lw")).as("nw"), col("label"))).as("m"))
        .select(col("u").as("node"), col("m.label").as("label"))
        .localCheckpoint()
      labels
    }
    (edges, rounds)
  }

  def q224LabelPropagation(spark: SparkSession, dir: String): DataFrame = {
    val (_, rounds) = nationGraphRounds(spark, dir)
    rounds(0).select(col("node"), col("label").as("l1"))
      .join(rounds(1).select(col("node"), col("label").as("l2")), Seq("node"))
      .join(rounds(2).select(col("node"), col("label").as("l3")), Seq("node"))
      .select(col("node").cast("long").as("node"), col("l1").cast("long").as("l1"),
        col("l2").cast("long").as("l2"), col("l3").cast("long").as("l3"))
      .orderBy("node")
  }

  /** q226: TRADING-TAPE MICROSTRUCTURE — the analytics the reference's
    * own domain (order-flow streams, `ws-to-kafka`'s book deltas) runs
    * per bucket: trade count, volume, VWAP, and signed order-flow
    * imbalance per 5-minute window. The event stream stands in as the
    * tape via deterministic derivations (price = value in exact cents,
    * size/side from the id — production swaps the real columns, same
    * plan: one scan-local projection + one partial+final hash agg on
    * the bucket). Exactness: Σ(p·q) and volumes are exact BIGINTs;
    * VWAP and imbalance are one divide each (VWAP descales cents at
    * the end), round 6.
    */
  def q226TapeMicrostructure(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        expr("(unix_micros(ts) div 300000000) * 300000000").as("bucket_us"),
        floor(col("value") * lit(100.0d) + lit(0.5d)).cast("long").as("p"),
        (col("event_id") % 7 + 1).cast("long").as("q"),
        (col("event_id") % 2).cast("long").as("side"))
      .groupBy("bucket_us")
      .agg(count(lit(1)).as("n_trades"),
        sum("q").as("volume"),
        sum(col("p") * col("q")).as("pq"),
        sum(when(col("side") === 0, col("q")).otherwise(0L)).as("buy_vol"),
        sum(when(col("side") === 1, col("q")).otherwise(0L)).as("sell_vol"))
      .select(col("bucket_us"), col("n_trades"), col("volume"),
        round(col("pq").cast("double") / col("volume").cast("double") / lit(100.0d), 6)
          .as("vwap"),
        round((col("buy_vol") - col("sell_vol")).cast("double") /
          (col("buy_vol") + col("sell_vol")).cast("double"), 6).as("imbalance"))
      .orderBy("bucket_us")

  /** q263: EXACT AUC + ROC curve — the threshold-free ranking metric
    * missing from the eval family (q213 P/R/F1/κ and q214 calibration
    * grade ONE operating point; AUC grades the whole ranking): does
    * `value` rank purchases above non-purchases? AUC by the
    * Mann–Whitney midrank identity AUC = (Σ_pos midrank − P(P+1)/2)
    * / (P·N) — ties handled exactly, no pair enumeration — plus the
    * 20-point ROC polyline at $5 score bands.
    *
    * Determinism: scores are integer cents, so the midrank census is
    * exact; 2·midrank = 2·cum_before + n_at + 1 keeps EVERYTHING in
    * BIGINT (Σ np·m2 − P(P+1) over 2PN is the one divide); ROC
    * tpr/fpr are single BIGINT-over-BIGINT divides. Scale: one hash
    * agg to the distinct-cents census (value-cardinality ≤ 10⁴
    * regardless of row count); the ordered windows run over that
    * census, never the fact table; P/N is a 1-row broadcast.
    */
  def q263AucRoc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir).select(
      floor(col("value") * 100.0 + 0.5).cast("long").as("sc"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
    val census = ev.groupBy("sc").agg(
      sum("pos").as("np"), (count(lit(1)) - sum("pos")).as("nn"))
    val wAsc = Window.orderBy("sc")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = census
      .withColumn("cum", sum(col("np") + col("nn")).over(wAsc))
      .withColumn("m2", lit(2L) * (col("cum") - col("np") - col("nn")) +
        (col("np") + col("nn")) + 1L)
    val tot = census.agg(sum("np").as("p"), sum("nn").as("n"))
    val auc = ranked.agg(sum(col("np") * col("m2")).as("r2"))
      .crossJoin(broadcast(tot))
      .select(((col("r2") - col("p") * (col("p") + 1)).cast("double") /
        (lit(2L) * col("p") * col("n")).cast("double")).as("auc"))
    val wDesc = Window.orderBy(col("band").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    census.withColumn("band", expr("sc div 500"))
      .groupBy("band").agg(sum("np").as("bp"), sum("nn").as("bn"))
      .withColumn("cp", sum("bp").over(wDesc))
      .withColumn("cn", sum("bn").over(wDesc))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(auc))
      .select(col("band"), (col("band") * 5.0).as("thr_usd"),
        (col("cp").cast("double") / col("p")).as("tpr"),
        (col("cn").cast("double") / col("n")).as("fpr"),
        col("auc"))
      .orderBy("band")
  }

  /** q271: CUSUM change-point detection (Page '54) — the sequential
    * drift detector beside q207's cell-wise 3σ flags and q219/q220's
    * distribution drift: two-sided cumulative sums over the dense
    * daily order-count series flag SUSTAINED small shifts a pointwise
    * test never sees (k = σ/2 allowance, h = 5σ threshold — the
    * standard tuning). The sequential recurrence S_t = max(0, S_{t−1}
    * + x_t − μ − k) is deliberately NOT iterated: it equals P_t −
    * min_{s≤t} P_s for the allowance-adjusted prefix sum P — two
    * window passes, no loop (the q206 dense-spine device underneath:
    * missing days are real zeros).
    *
    * Determinism: everything rides the n·days integer lattice —
    * deviations x_t·n − S are BIGINT (μ never materializes as a
    * float), the allowance snaps ⌊σn/2+½⌋ to the same lattice, prefix
    * sums and running extrema are BIGINT windows; σn = sqrt(n·Σx² −
    * S²) is IEEE-exact sqrt (correctly rounded in both engines), so
    * the flag comparison sees identical doubles. Scale: one hash agg
    * to the day census; every window is census-sized (calendar
    * cardinality, never row-scale).
    */
  def q271CusumChangepoint(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = Tables.orders(spark, dir)
      .select(datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
        .cast("long").as("day"))
    val counts = days.groupBy("day").agg(count(lit(1)).as("x"))
    val lim = days.agg(min("day").as("lo"), max("day").as("hi"))
    val spine = lim.select(explode(expr("sequence(lo, hi)")).as("day"))
    val grid = spine.join(counts, Seq("day"), "left")
      .select(col("day"), coalesce(col("x"), lit(0L)).as("x"))
    val tot = grid.agg(count(lit(1)).as("n"), sum("x").as("s"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n"), col("s"),
        sqrt((col("n") * col("sxx") - col("s") * col("s")).cast("double"))
          .as("sig_n"))
      .select(col("n"), col("s"),
        floor(col("sig_n") / 2.0 + 0.5).cast("long").as("k_n"),
        (col("sig_n") * 5.0).as("h_n"))
    val wAsc = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.crossJoin(broadcast(tot))
      .withColumn("d_up", col("x") * col("n") - col("s") - col("k_n"))
      .withColumn("d_dn", col("x") * col("n") - col("s") + col("k_n"))
      .withColumn("p_up", sum("d_up").over(wAsc))
      .withColumn("p_dn", sum("d_dn").over(wAsc))
      .withColumn("cusum_up", col("p_up") - min("p_up").over(wAsc))
      .withColumn("cusum_dn", max("p_dn").over(wAsc) - col("p_dn"))
      .withColumn("flag",
        when(col("cusum_up").cast("double") > col("h_n") ||
          col("cusum_dn").cast("double") > col("h_n"), 1L).otherwise(0L))
      .select(
        date_add(lit("1970-01-01").cast("date"), col("day").cast("int")).as("d"),
        col("x"),
        (col("cusum_up").cast("double") / col("n")).as("cusum_up"),
        (col("cusum_dn").cast("double") / col("n")).as("cusum_dn"),
        (col("h_n") / col("n").cast("double")).as("threshold"),
        col("flag"))
      .orderBy("d")
  }

  /** q273: ISOTONIC REGRESSION calibration (pool-adjacent-violators,
    * Zadrozny & Elkan '02) — the nonparametric score→probability map
    * beside q214's binned accuracy report and q254's conformal bound:
    * fit the best NONDECREASING P(purchase | value band) over the $5
    * score bins. The sequential PAV pooling loop is deliberately NOT
    * iterated: the fit equals the minimax identity fit_i = max_{j≤i}
    * min_{k≥i} wavg(y, j..k) (Ayer '55), enumerated over the BIN
    * census — interval means in O(1) from prefix sums, the whole
    * minimax over ≤ bins³ census rows, rows-scale never touched.
    *
    * Determinism: interval means are BIGINT-over-BIGINT single
    * divides (identical doubles), min/max over identical doubles are
    * order-free; output echoes them raw. Scale: one hash agg to the
    * 21-bin census; the 21³ enumeration is calendar-constant — at
    * 100 TB only the first agg grows.
    */
  def q273IsotonicCalibration(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bins = Tables.events(spark, dir).select(
        expr("cast(floor(value * 100.0 + 0.5) as bigint) div 500").as("bin"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .groupBy("bin").agg(count(lit(1)).as("n"), sum("y").as("p"))
    val wAsc = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bins
      .withColumn("cn", sum("n").over(wAsc))
      .withColumn("cp", sum("p").over(wAsc))
      .localCheckpoint()
    val lo = cum.select(col("bin").as("j"),
      (col("cn") - col("n")).as("cnj"), (col("cp") - col("p")).as("cpj"))
    val hi = cum.select(col("bin").as("k"), col("cn").as("cnk"), col("cp").as("cpk"))
    val iv = lo.join(hi, col("j") <= col("k"))
      .select(col("j"), col("k"),
        ((col("cpk") - col("cpj")).cast("double") /
          (col("cnk") - col("cnj")).cast("double")).as("avg"))
    val idx = cum.select(col("bin").as("i"))
    val fit = iv.join(idx, col("j") <= col("i") && col("i") <= col("k"))
      .groupBy("i", "j").agg(min("avg").as("mn"))
      .groupBy("i").agg(max("mn").as("p_iso"))
    cum.join(fit, col("bin") === col("i"))
      .select(col("bin"), (col("bin") * 5.0).as("band_usd"), col("n"),
        (col("p").cast("double") / col("n").cast("double")).as("p_raw"),
        col("p_iso"))
      .orderBy("bin")
  }

  /** q276: cluster-sampling DESIGN EFFECT (Kish '65) — the survey-
    * methodology operator the sampling family still lacked (q233
    * bootstrap, q222 jackknife, q223 CUPED price VARIANCE; this one
    * prices the SAMPLING DESIGN): per event type, treating users as
    * clusters, the one-way ANOVA decomposition gives the intraclass
    * correlation ICC = (MSB − MSW)/(MSB + (n₀−1)·MSW), and DEFF = 1 +
    * (m̄ − 1)·ICC says how many times more variance a user-clustered
    * sample carries than an SRS of equal size — ESS = n/DEFF is the
    * budget number a sampling plan reads.
    *
    * Determinism: everything derives from five exact BIGINT moments
    * (n, k, Σy, Σy², Σn_u², and Σ⌊S_u²·10³/n_u⌋ — the one per-cluster
    * ratio rides a 10⁻³-cent² integer lattice via BIGINT division, so
    * the cross-cluster sum is order-invariant); MSB/MSW/ICC/DEFF are
    * mirrored fixed chains on those ints. Scale: one (user, type)
    * keyed agg (map-side combinable) then a type-level census — the
    * classic two-level rollup; nothing else shuffles.
    */
  def q276DesignEffect(spark: SparkSession, dir: String): DataFrame = {
    val obs = Tables.events(spark, dir).select(col("event_type"), col("user_id"),
      floor(col("value") * 100.0 + 0.5).cast("long").as("yc"))
    val perCluster = obs.groupBy("event_type", "user_id").agg(
      count(lit(1)).as("nu"), sum("yc").as("su"),
      sum(col("yc") * col("yc")).as("squ"))
    val m = perCluster.groupBy("event_type").agg(
      sum("nu").as("n"), count(lit(1)).as("k"),
      sum("su").as("sy"), sum("squ").as("syy"),
      sum(col("nu") * col("nu")).as("snn"),
      sum(expr("(su * su * 1000) div nu")).as("st"))
    m.select(col("event_type"), col("n"), col("k"),
        (col("n").cast("double") / col("k").cast("double")).as("mbar"),
        ((col("st").cast("double") / 1000.0 -
          col("sy").cast("double") * col("sy").cast("double") /
            col("n").cast("double")) / (col("k") - 1).cast("double")).as("msb"),
        ((col("syy").cast("double") - col("st").cast("double") / 1000.0) /
          (col("n") - col("k")).cast("double")).as("msw"),
        ((col("n").cast("double") -
          col("snn").cast("double") / col("n").cast("double")) /
          (col("k") - 1).cast("double")).as("n0"))
      .select(col("event_type"), col("n"), col("k"),
        ((col("msb") - col("msw")) /
          (col("msb") + (col("n0") - 1.0) * col("msw"))).as("icc"),
        col("mbar"), col("msb"), col("msw"))
      .select(col("event_type"), col("n"), col("k"), col("icc"),
        (lit(1.0) + (col("mbar") - 1.0) * col("icc")).as("deff"),
        (col("n").cast("double") /
          (lit(1.0) + (col("mbar") - 1.0) * col("icc"))).as("ess"))
      .orderBy("event_type")
  }

  /** q279: custom BATCH DataSource V2 read path, driver-gated — the
    * batch sibling of the WebSocket streaming source closes the DSv2
    * surface: `graft.sources.seq` implements filter pushdown
    * (`SupportsPushDownFilters`), column pruning
    * (`SupportsPushDownRequiredColumns`), and PARTITION PRUNING
    * (slices outside the pushed id bounds are never planned —
    * `SeqSourceSpec` asserts 16 of 64 partitions survive this exact
    * predicate). The query reads a 2M-row deterministic sequence
    * table through the source, keeps a 500k id range, and rolls up by
    * bucket; the oracle states the same table BLINDLY from
    * `range()` — certifying the generator arithmetic, the pushed
    * bounds, and the pruned scan return exactly the right rows.
    *
    * Scale: the point of the gate — a selective read costs O(result),
    * not O(table), because the source narrows at PLAN time; 100 TB
    * behind this contract is what makes predicate-heavy pipelines
    * viable (sfDir intentionally unused: the table is source-defined).
    */
  def q279SeqSourcePushdown(spark: SparkSession, dir: String): DataFrame = {
    val t = spark.read
      .format(classOf[graft.sources.seq.SeqSourceProvider].getName)
      .option("rows", "2000000").option("slices", "64").load()
    t.filter(col("id") >= 250000L && col("id") < 750000L)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("h").as("sum_h"))
      .orderBy("bucket")
  }

  /** q280: two-sample KOLMOGOROV–SMIRNOV test — the distribution-level
    * member of the nonparametric family (q203 Mann–Whitney compares
    * locations, q220 Wasserstein measures transport cost; KS detects
    * ANY distributional difference): D = sup|F₁ − F₂| between the
    * purchase and view value distributions, with Stephens' small-
    * sample λ and the truncated Kolmogorov series p-value — drift
    * detection with an actual significance statement, where q219/q220
    * only report magnitudes.
    *
    * Determinism: both ECDFs live on the shared cents census, and the
    * sup runs over |cum₁·n₂ − cum₂·n₁| — EXACT BIGINT cross-
    * multiplication (the q220 device), so D is one divide; λ is a
    * fixed IEEE-sqrt chain; the 4-term alternating exp series snaps
    * to the 10⁻⁸ grid (the q264/q268 libm-exp rule). Scale: two hash
    * aggs to one value census; the sup is a census-window max;
    * everything after is 1-row.
    */
  def q280KsTest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_type"), floor(col("value") * 100.0 + 0.5).cast("long").as("vc"))
    val census = ev.groupBy("vc").agg(
      sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("c1"),
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c2"))
    val wAsc = Window.orderBy("vc")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = census
      .withColumn("cum1", sum("c1").over(wAsc))
      .withColumn("cum2", sum("c2").over(wAsc))
    val tot = census.agg(sum("c1").as("n1"), sum("c2").as("n2"))
    cum.crossJoin(broadcast(tot))
      .agg(max(abs(col("cum1") * col("n2") - col("cum2") * col("n1"))).as("dnum"))
      .crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"),
        (col("dnum").cast("double") / (col("n1") * col("n2")).cast("double")).as("d"))
      .withColumn("ne",
        (col("n1") * col("n2")).cast("double") / (col("n1") + col("n2")).cast("double"))
      .withColumn("lambda",
        (sqrt(col("ne")) + 0.12 + lit(0.11) / sqrt(col("ne"))) * col("d"))
      .withColumn("p_value",
        floor((lit(2.0) * (
          exp(lit(-2.0) * col("lambda") * col("lambda")) -
            exp(lit(-8.0) * col("lambda") * col("lambda")) +
            exp(lit(-18.0) * col("lambda") * col("lambda")) -
            exp(lit(-32.0) * col("lambda") * col("lambda")))) * 100000000.0 + 0.5)
          / 100000000.0)
      .select(col("n1"), col("n2"), col("d"), col("lambda"), col("p_value"),
        when(col("p_value") < 0.05, 1L).otherwise(0L).as("reject_05"))
  }

  /** q283: SPEARMAN rank correlation — the monotone-association member
    * of the correlation family (q172's regr_* is linear-in-values,
    * q203's Mann–Whitney compares two groups; Spearman asks "does
    * order-size rise with order-price AT ALL, linearly or not"):
    * ρ = Pearson over midranks of (o_totalprice cents, lineitem count
    * per order), with ties handled by average ranks.
    *
    * Determinism: midranks come from the value census — DOUBLED
    * midrank 2·before + cnt + 1 is BIGINT-exact (the ×2 cancels in
    * Pearson), all five moments are BIGINT sums (order-invariant), and
    * ρ is one fixed IEEE chain snapped to the 10⁻⁶ grid. Scale: two
    * censuses + two rank merge-joins + one moment agg; the rank
    * windows sit over aggregates (census-bounded). The BIGINT moments
    * carry n·(2n)² ≈ 4n³ — past ~10⁹ rows shift to per-partition
    * offsets or DECIMAL(38) accumulation.
    */
  def q283Spearman(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val items = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey").agg(count(lit(1)).as("y"))
    val pairs = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("x"))
      .join(items, col("o_orderkey") === col("l_orderkey"))
      .select("x", "y")
    def ranks(vals: DataFrame, c: String, rn: String): DataFrame = {
      val w = Window.orderBy(c)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      vals.groupBy(c).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum("cnt").over(w))
        .select(col(c),
          (lit(2L) * (col("cum") - col("cnt")) + col("cnt") + 1L).as(rn))
    }
    val r = pairs
      .join(ranks(pairs.select("x"), "x", "rx2"), "x")
      .join(broadcast(ranks(pairs.select("y"), "y", "ry2")), "y")
    val m = r.agg(count(lit(1)).as("n"),
      sum("rx2").as("sx"), sum("ry2").as("sy"),
      sum(col("rx2") * col("rx2")).as("sxx"),
      sum(col("ry2") * col("ry2")).as("syy"),
      sum(col("rx2") * col("ry2")).as("sxy"))
    m.select(col("n"),
      (floor(((col("n").cast("double") * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")) /
        (sqrt(col("n").cast("double") * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")) *
          sqrt(col("n").cast("double") * col("syy").cast("double") -
            col("sy").cast("double") * col("sy").cast("double")))) *
        1000000.0 + 0.5) / 1000000.0).as("rho"))
  }

  /** q284: AUTOCORRELATION function of the daily event-count series at
    * lags 1–7 — the serial-dependence member of the time-series family
    * (q261 decomposes, q271 detects level shifts; ACF answers "does
    * today predict tomorrow, and with what weekly echo"). Defined over
    * exact-day-distance pairs (a missing day contributes no pair — the
    * gap-honest estimator a blind replay can state).
    *
    * Determinism: centering uses the N-SCALED residual N·y − S (BIGINT,
    * no mean division), so numerator and denominator are exact BIGINT
    * sums and the N² factor cancels in the ratio — one double divide
    * snapped to the 10⁻⁶ grid. Scale: one day census (bounded), a
    * 7×days lag fan-out joined back on day, two BIGINT aggs; at
    * 10¹²-event scale N·y exceeds BIGINT — descale counts to
    * thousands or accumulate in DECIMAL(38).
    */
  def q284Acf(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
    val tot = days.agg(count(lit(1)).as("nd"), sum("y").as("s"))
    val c = days.crossJoin(broadcast(tot))
      .select(col("day"), (col("nd") * col("y") - col("s")).as("cy"))
      .localCheckpoint()
    val den = c.agg(sum(col("cy") * col("cy")).as("den"))
    val lagged = spark.range(1, 8).select(col("id").as("lag"))
      .crossJoin(c.select(col("day").as("d0"), col("cy").as("cy0")))
      .select(col("lag"), (col("d0") + col("lag")).as("day"), col("cy0"))
    c.join(lagged, "day")
      .groupBy("lag").agg(count(lit(1)).as("n_pairs"),
        sum(col("cy") * col("cy0")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        (floor((col("num").cast("double") / col("den").cast("double")) *
          1000000.0 + 0.5) / 1000000.0).as("acf"))
      .orderBy("lag")
  }

  /** q285: BENJAMINI–HOCHBERG FDR over a family of per-cohort KS tests
    * — the multiple-comparisons member of the eval family (q280 tests
    * ONE hypothesis; a real experiment platform tests dozens per day
    * and must control the false-discovery rate, not per-test α): the
    * q280 two-sample KS device runs per user cohort (user_id mod 8),
    * then the step-up procedure ranks the m p-values and rejects
    * exactly those at rank ≤ k* = max{i : p₍ᵢ₎ ≤ i·α/m}.
    *
    * Determinism: each cohort's D is the BIGINT cross-multiplied sup
    * on its own census; p-values snap to the 10⁻⁸ grid before ranking
    * (so rank order is grid-stable), ties break on cohort id, and the
    * BH inequality is mirrored verbatim. Scale: ONE grouped census +
    * a cohort-PARTITIONED cum window; everything after the per-cohort
    * agg is m rows — the step-up window sits over an aggregate
    * (census-bounded, PlanGuards-clean).
    */
  def q285BhFdr(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select((col("user_id") % 8).as("g"), col("event_type"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("vc"))
    val census = ev.groupBy("g", "vc").agg(
      sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("c1"),
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c2"))
    val wg = Window.partitionBy("g").orderBy("vc")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = census
      .withColumn("cum1", sum("c1").over(wg))
      .withColumn("cum2", sum("c2").over(wg))
    val tot = census.groupBy("g").agg(sum("c1").as("n1"), sum("c2").as("n2"))
    val d = cum.join(tot, "g")
      .groupBy("g", "n1", "n2")
      .agg(max(abs(col("cum1") * col("n2") - col("cum2") * col("n1"))).as("dnum"))
      .select(col("g"), col("n1"), col("n2"),
        (col("dnum").cast("double") / (col("n1") * col("n2")).cast("double")).as("d"))
    val p = d
      .withColumn("ne",
        (col("n1") * col("n2")).cast("double") / (col("n1") + col("n2")).cast("double"))
      .withColumn("lambda",
        (sqrt(col("ne")) + 0.12 + lit(0.11) / sqrt(col("ne"))) * col("d"))
      .withColumn("p_value", least(lit(1.0),
        floor((lit(2.0) * (
          exp(lit(-2.0) * col("lambda") * col("lambda")) -
            exp(lit(-8.0) * col("lambda") * col("lambda")) +
            exp(lit(-18.0) * col("lambda") * col("lambda")) -
            exp(lit(-32.0) * col("lambda") * col("lambda")))) * 100000000.0 + 0.5)
          / 100000000.0))
    val m = tot.agg(count(lit(1)).as("m"))
    val ranked = p.crossJoin(broadcast(m))
      .withColumn("bh_rank", row_number().over(Window.orderBy("p_value", "g")))
    val kstar = ranked.agg(max(
      when(col("p_value") <= col("bh_rank").cast("double") * 0.05 / col("m").cast("double"),
        col("bh_rank")).otherwise(lit(0))).as("kstar"))
    ranked.crossJoin(broadcast(kstar))
      .select(col("g"), col("n1"), col("n2"), col("d"), col("p_value"),
        col("bh_rank").cast("long").as("bh_rank"),
        when(col("bh_rank") <= col("kstar"), 1L).otherwise(0L).as("reject_fdr05"))
      .orderBy("g")
  }

  /** q288: KENDALL τ-b — the ordinal-association member of the
    * correlation family (q283's Spearman correlates ranks; Kendall
    * counts concordant vs discordant PAIRS, the robust choice for
    * coarse ordinal scales): association between hour-of-day and the
    * 50-unit value band over all events, with the τ-b tie correction
    * (both variables are heavily tied by construction).
    *
    * Determinism: the O(n²) pair count collapses onto the (hour, band)
    * CELL CENSUS — concordant/discordant sums are Σ nᵢ·nⱼ over ordered
    * cell pairs, exact BIGINT; tie terms are t(t−1)/2 integer
    * divisions; only the final ratio is a double (the two variance
    * factors are cast to double BEFORE multiplying — their BIGINT
    * product overflows at ~10⁵ rows), snapped to the 10⁻⁶ grid.
    * Scale: the cell census is ≤ 24×~10 cells at ANY row count, so
    * the pair "product" is a bounded broadcast cross join — the
    * device that makes pair-counting statistics census-sized.
    */
  def q288KendallTau(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      hour(col("ts")).cast("long").as("x"),
      floor(col("value") / 50.0).cast("long").as("y"))
    val census = ev.groupBy("x", "y").agg(count(lit(1)).as("nc")).localCheckpoint()
    val cd = census.select(col("x").as("xa"), col("y").as("ya"), col("nc").as("na"))
      .crossJoin(broadcast(
        census.select(col("x").as("xb"), col("y").as("yb"), col("nc").as("nb"))))
      .filter(col("xa") < col("xb"))
      .agg(
        sum(when(col("ya") < col("yb"), col("na") * col("nb")).otherwise(0L)).as("c"),
        sum(when(col("ya") > col("yb"), col("na") * col("nb")).otherwise(0L)).as("d"))
    val n0 = census.agg(expr("(sum(nc) * (sum(nc) - 1)) div 2").as("n0"))
    val n1 = census.groupBy("x").agg(sum("nc").as("t"))
      .agg(expr("sum((t * (t - 1)) div 2)").as("n1"))
    val n2 = census.groupBy("y").agg(sum("nc").as("t"))
      .agg(expr("sum((t * (t - 1)) div 2)").as("n2"))
    cd.crossJoin(broadcast(n0)).crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
      .select(col("c"), col("d"), col("n0"), col("n1"), col("n2"),
        (floor((col("c") - col("d")).cast("double") /
          sqrt((col("n0") - col("n1")).cast("double") *
            (col("n0") - col("n2")).cast("double")) * 1000000.0 + 0.5)
          / 1000000.0).as("tau_b"))
  }

  /** q292: RFM segmentation — the customer-value census every commerce
    * warehouse maintains (q95 cohorts by first-seen; RFM scores each
    * user on Recency/Frequency/Monetary quintiles and the segment
    * CELL is the unit of marketing action): per purchasing user,
    * recency (days since last purchase vs corpus max day), purchase
    * count, and cents total, each scored 1–5 by the value-census
    * quintile rule score = ⌊before·5/n⌋+1 — ties share a score, so
    * the banding is deterministic where NTILE's tie-splitting is row-
    * order-dependent (the reason this is census-ranked, not ntiled).
    * Recency ranks DESCENDING so recent = 5.
    *
    * Determinism: all three metrics are integers; scores are integer
    * arithmetic on census cumulatives; the output is the (r,f,m) cell
    * census with exact cents. Scale: one user agg, three census
    * joins-back (censuses are value-cardinality), one cell agg —
    * census windows only.
    */
  def q292RfmSegments(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir).filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
    val maxDay = ev.agg(max("day").as("maxd"))
    val user = ev.crossJoin(broadcast(maxDay))
      .groupBy("user_id")
      .agg((max("maxd") - max("day")).as("rec"),
        count(lit(1)).as("freq"), sum("cents").as("mon"))
      .localCheckpoint()
    val nu = user.agg(count(lit(1)).as("nu"))
    def scores(c: String, sn: String, desc: Boolean): DataFrame = {
      val ord = if (desc) Window.orderBy(col(c).desc) else Window.orderBy(col(c).asc)
      user.groupBy(c).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum("cnt").over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(nu))
        .select(col(c), (expr("((cum - cnt) * 5) div nu") + 1L).as(sn))
    }
    user
      .join(scores("rec", "r_score", desc = true), "rec")
      .join(scores("freq", "f_score", desc = false), "freq")
      .join(scores("mon", "m_score", desc = false), "mon")
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_users"),
        round(sum("mon") / 100.0, 2).as("cell_monetary"))
      .orderBy("r_score", "f_score", "m_score")
  }

  /** q293: sequential-pattern SUPPORT — the ordered-containment member
    * of the behavior family (q245's Markov transitions count ADJACENT
    * steps; support counts users whose history contains a BEFORE b
    * anywhere, the GSP/PrefixSpan length-2 primitive): for every
    * ordered type pair, the share of users with some a-event strictly
    * before some b-event — decided entirely by min-ts(a) < max-ts(b),
    * which is why the fact table collapses to a (user, type) min/max
    * census first.
    *
    * Determinism: pure integer micros comparisons and counts. Scale:
    * one keyed agg to ≤ 5 rows/user, a user-keyed self-join bounded
    * at 25 pairs/user, one pair agg — support never touches raw event
    * pairs (the naive form is an event×event self-join).
    */
  def q293SeqPatternSupport(spark: SparkSession, dir: String): DataFrame = {
    val ut = Tables.events(spark, dir)
      .groupBy("user_id", "event_type")
      .agg(min(expr("unix_micros(ts)")).as("mn"), max(expr("unix_micros(ts)")).as("mx"))
      .localCheckpoint()
    val nu = ut.select("user_id").distinct().agg(count(lit(1)).as("nu"))
    ut.select(col("user_id"), col("event_type").as("a"), col("mn"))
      .join(ut.select(col("user_id"), col("event_type").as("b"), col("mx")), "user_id")
      .filter(col("mn") < col("mx"))
      .groupBy("a", "b").agg(count(lit(1)).as("support_users"))
      .crossJoin(broadcast(nu))
      .select(col("a"), col("b"), col("support_users"),
        expr("(support_users * 1000000) div nu").as("support_ppm"))
      .orderBy("a", "b")
  }

  /** q294: CROSS-correlation function between the daily view and
    * purchase count series at lags −7..+7 — the two-series sibling of
    * q284's ACF (ACF asks "does today predict tomorrow"; CCF asks
    * "do views LEAD purchases, and by how many days": the peak lag is
    * the demand latency). num(k) = Σₜ c_x(t)·c_y(t−k) over exact-day
    * pairs, normalized by the two marginal sums of squares.
    *
    * Determinism: both series center via the N-scaled BIGINT residual
    * (q284's device), so numerator and both denominator factors are
    * exact integer sums; one double chain snapped to the 10⁻⁶ grid.
    * Scale: one day census, a 15×days fan-out joined on day, two
    * BIGINT aggs — same envelope as q284.
    */
  def q294Ccf(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("day").agg(
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
    val tot = days.agg(count(lit(1)).as("nd"), sum("x").as("sx"), sum("y").as("sy"))
    val c = days.crossJoin(broadcast(tot))
      .select(col("day"),
        (col("nd") * col("x") - col("sx")).as("cx"),
        (col("nd") * col("y") - col("sy")).as("cy"))
      .localCheckpoint()
    val den = c.agg(sum(col("cx") * col("cx")).as("dx"), sum(col("cy") * col("cy")).as("dy"))
    val lagged = spark.range(-7, 8).select(col("id").as("lag"))
      .crossJoin(c.select(col("day").as("d0"), col("cy").as("cy0")))
      .select(col("lag"), (col("d0") + col("lag")).as("day"), col("cy0"))
    c.join(lagged, "day")
      .groupBy("lag").agg(count(lit(1)).as("n_pairs"),
        sum(col("cx") * col("cy0")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        (floor(col("num").cast("double") /
          sqrt(col("dx").cast("double") * col("dy").cast("double")) *
          1000000.0 + 0.5) / 1000000.0).as("ccf"))
      .orderBy("lag")
  }

  /** q297: THEIL–SEN robust trend — the breakdown-resistant member of
    * the regression family (q172's OLS is least-squares — one wild
    * week drags the slope; the median of pairwise slopes tolerates
    * 29% contamination): weekly order volume trend as the median
    * slope over all week pairs, intercept as the median residual at
    * that slope.
    *
    * Determinism: week counts are integers, each pairwise slope is
    * ONE IEEE divide of BIGINTs, medians pick by row_number over
    * (slope, week-pair) orderings — value ties collapse to the same
    * median either way, and the even-count midpoint is one (a+b)/2;
    * final values snap to the 10⁻⁶ grid. Scale: the pair set is the
    * WEEK census squared (bounded by time, not rows — ~350² at any
    * SF), generated by a broadcast census cross join; the raw table
    * contributes one keyed count agg.
    */
  def q297TheilSen(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weeks = Tables.orders(spark, dir)
      .select((datediff(col("o_orderdate"), lit("1992-01-01").cast("date")) / 7)
        .cast("long").as("w"))
      // no localCheckpoint: the census must stay an Aggregate in the
      // plan so the global-window guard can see the bounded input
      .groupBy("w").agg(count(lit(1)).as("yv"))
    val slopes = weeks.select(col("w").as("w1"), col("yv").as("y1"))
      .crossJoin(broadcast(weeks.select(col("w").as("w2"), col("yv").as("y2"))))
      .filter(col("w1") < col("w2"))
      .select(((col("y2") - col("y1")).cast("double") /
        (col("w2") - col("w1")).cast("double")).as("slope"))
    val m = slopes.agg(count(lit(1)).as("m"))
    val sMed = slopes.crossJoin(broadcast(m))
      .withColumn("rk", row_number().over(Window.orderBy("slope")))
      .filter(col("rk") === expr("(m + 1) div 2") || col("rk") === expr("(m + 2) div 2"))
      .agg((sum("slope") / count(lit(1))).as("slope_med"), max("m").as("m_pairs"))
    val resid = weeks.crossJoin(broadcast(sMed))
      .select((col("yv").cast("double") - col("slope_med") * col("w").cast("double"))
        .as("r"), col("slope_med"), col("m_pairs"))
    val nw = weeks.agg(count(lit(1)).as("nw"))
    resid.crossJoin(broadcast(nw))
      .withColumn("rk", row_number().over(Window.orderBy("r")))
      .filter(col("rk") === expr("(nw + 1) div 2") || col("rk") === expr("(nw + 2) div 2"))
      .agg(max("m_pairs").as("m_pairs"), max("nw").as("n_weeks"),
        (floor(max("slope_med") * 1000000.0 + 0.5) / 1000000.0).as("slope"),
        (floor(sum("r") / count(lit(1)) * 1000000.0 + 0.5) / 1000000.0).as("intercept"))
  }

  /** q299: SESSION PATH MINING — the clickstream member of the
    * behavior family (q97 cuts sessions, q245 counts adjacent
    * transitions corpus-wide, q293 counts unordered containment; the
    * product question is "what three-step paths do sessions actually
    * walk"): 30-minute-gap sessions per user, then the top-10
    * within-session event-type TRIGRAMS (consecutive, session-scoped
    * — a path never crosses a session cut).
    *
    * Determinism: rows are totally ordered by (µs, event_id) inside
    * every window; the top-10 tie-breaks on path. Scale: all windows
    * are user- (then session-) partitioned — key-parallel; the
    * trigram census is a hash agg and the top-10 is a
    * TakeOrderedAndProject, never a global sort.
    */
  def q299SessionPaths(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir).select(col("user_id"), col("event_type"),
      expr("unix_micros(ts)").as("us"), col("event_id"))
    val wu = Window.partitionBy("user_id").orderBy("us", "event_id")
    val sess = ev
      .withColumn("gap",
        when(lag("us", 1).over(wu).isNull ||
          col("us") - lag("us", 1).over(wu) > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("sid", sum("gap").over(
        wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ws = Window.partitionBy("user_id", "sid").orderBy("us", "event_id")
    sess
      .withColumn("t2", lead("event_type", 1).over(ws))
      .withColumn("t3", lead("event_type", 2).over(ws))
      .filter(col("t3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t2"), col("t3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(10)
  }

  /** q301: CONSISTENT-HASH ring vs mod-N rehash — the shard-rebalance
    * arithmetic a 100 TB keyspace lives by (q253 plans RANGE shards;
    * this gates HASH sharding's defining property): users assign to
    * the first of 8×32 virtual ring points clockwise of their hash;
    * adding a 9th shard must move only ~1/9 of users, where mod-N
    * rehashing moves ~8/9 — both fractions MEASURED and gated.
    *
    * Determinism: ring points and user positions are the 60-bit md5
    * device; successor = min point ≥ h with a wrap fallback — pure
    * integer min. Scale: the ring is a 256/288-row BROADCAST; per user
    * one bounded candidate-min — no shuffle beyond the final census;
    * this is exactly how a router sizes a resharding migration before
    * committing to it.
    */
  def q301ConsistentHash(spark: SparkSession, dir: String): DataFrame = {
    def h60(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    val users = Tables.events(spark, dir).select(col("user_id")).distinct()
      .withColumn("h", h60(concat(lit("u:"), col("user_id").cast("string"))))
      .localCheckpoint()
    def ring(nShards: Int): DataFrame = {
      val s = spark.range(nShards).select(col("id").as("shard"))
      val v = spark.range(32).select(col("id").as("vn"))
      s.crossJoin(v).select(col("shard"),
        h60(concat(lit("s:"), col("shard").cast("string"),
          lit("#"), col("vn").cast("string"))).as("p"))
    }
    def assign(r: DataFrame, name: String): DataFrame = {
      val cand = users.crossJoin(broadcast(r)).filter(col("p") >= col("h"))
        .groupBy("user_id").agg(min(struct(col("p"), col("shard"))).as("b"))
        .select(col("user_id"), col("b.shard").as(name))
      val wrapShard = r.agg(min(struct(col("p"), col("shard"))).as("w"))
        .select(col("w.shard").as(name))
      val wrapped = users.join(cand.select("user_id"), Seq("user_id"), "left_anti")
        .crossJoin(broadcast(wrapShard)).select("user_id", name)
      cand.unionByName(wrapped)
    }
    val ringMoves = assign(ring(8), "s8").join(assign(ring(9), "s9"), "user_id")
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("s8") =!= col("s9"), 1L).otherwise(0L)).as("moved"))
      .select(lit("ring").as("strategy"), col("n_users"), col("moved"),
        expr("(moved * 1000000) div n_users").as("moved_ppm"))
    val modMoves = users
      .agg(count(lit(1)).as("n_users"),
        sum(when(pmod(col("h"), lit(8L)) =!= pmod(col("h"), lit(9L)), 1L)
          .otherwise(0L)).as("moved"))
      .select(lit("mod").as("strategy"), col("n_users"), col("moved"),
        expr("(moved * 1000000) div n_users").as("moved_ppm"))
    ringMoves.unionByName(modMoves).orderBy("strategy")
  }

  /** q302: KEYSET pagination — the scalable pagination protocol gated
    * as two-algorithms-one-answer (q267's device): page 3 of the
    * price-ordered order listing fetched the KEYSET way (boundary =
    * max key of the first 40 rows, then WHERE key > boundary LIMIT
    * 20), while the ORACLE states the same page as OFFSET 40 LIMIT 20
    * — the formulation that re-sorts 60 rows here and 60 billion at
    * depth. Equality proves the keyset protocol turns pagination into
    * an indexable range predicate with NO skip-scan.
    *
    * Determinism: ordering key is (price cents, orderkey) — unique;
    * the boundary is limit-bounded (TakeOrdered), the page is another
    * TakeOrdered over a pushable predicate. Scale: page N costs
    * O(page), not O(N·page) — the whole point.
    */
  def q302KeysetPagination(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_orderkey"),
      floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
    val boundary = o.orderBy(col("cents"), col("o_orderkey")).limit(40)
      .agg(max(struct(col("cents"), col("o_orderkey"))).as("b"))
      .select(col("b.cents").as("bc"), col("b.o_orderkey").as("bk"))
    o.crossJoin(broadcast(boundary))
      .filter(col("cents") > col("bc") ||
        (col("cents") === col("bc") && col("o_orderkey") > col("bk")))
      .orderBy(col("cents"), col("o_orderkey")).limit(20)
      .select(col("o_orderkey"), round(col("cents") / 100.0, 2).as("price"))
  }

  /** q305: T-CLOSENESS audit — the third leg of the anonymization
    * tripod (q232: classes big enough; q256: sensitive values diverse
    * enough; t-closeness, Li et al. ICDE '07: the class's sensitive
    * DISTRIBUTION must stay within t of the GLOBAL one — a diverse
    * class that over-represents one segment still leaks): per
    * quasi-identifier class (nation, balance band), the variational
    * distance TVD = ½Σ|pᵢ−qᵢ| between class and corpus segment
    * distributions, audited at t ∈ {0.1, 0.2, 0.3}.
    *
    * Determinism: the 5 fixed segment columns pivot per class (the
    * q256 device); TVD's numerator Σ|nᵢ·N − gᵢ·n| is exact BIGINT and
    * the t-threshold compare runs as numer·10 > 2·t₁₀·n·N — INTEGER
    * arithmetic end to end; only the reported max TVD divides, snapped.
    * Scale: one hash agg to the bounded QI census; everything after is
    * census rows.
    */
  def q305TCloseness(spark: SparkSession, dir: String): DataFrame = {
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    val cls = Tables.customer(spark, dir)
      .select(col("c_nationkey"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"),
        col("c_mktsegment"))
      .groupBy("c_nationkey", "bal_band")
      .agg(count(lit(1)).as("n"),
        segs.zipWithIndex.map { case (s, i) =>
          sum(when(col("c_mktsegment") === s, 1L).otherwise(0L)).as(s"n${i + 1}")
        }: _*)
    val glob = cls.agg(sum("n").as("nn"),
      (1 to 5).map(i => sum(s"n$i").as(s"g$i")): _*)
    val numer = (1 to 5).map(i =>
      abs(col(s"n$i") * col("nn") - col(s"g$i") * col("n"))).reduce(_ + _)
    val withT = cls.crossJoin(broadcast(glob)).withColumn("numer", numer)
      .localCheckpoint()
    val tot = withT.agg(count(lit(1)).as("n_classes"),
      (floor(max(col("numer").cast("double") /
        (lit(2.0) * col("n").cast("double") * col("nn").cast("double"))) *
        1000000.0 + 0.5) / 1000000.0).as("max_tvd"))
    withT.withColumn("t10", explode(typedlit(Seq(1L, 2L, 3L))))
      .groupBy("t10")
      .agg(sum(when(col("numer") * 10L > lit(2L) * col("t10") * col("n") * col("nn"),
          1L).otherwise(0L)).as("n_failing_classes"),
        sum(when(col("numer") * 10L > lit(2L) * col("t10") * col("n") * col("nn"),
          col("n")).otherwise(0L)).as("n_failing_rows"))
      .crossJoin(broadcast(tot))
      .select((col("t10").cast("double") / 10.0).as("t_threshold"),
        col("n_classes"), col("n_failing_classes"), col("n_failing_rows"),
        col("max_tvd"))
      .orderBy("t_threshold")
  }

  /** q308: WATERMARK-DELAY estimator — the tuning input every
    * event-time pipeline needs before it picks `withWatermark` (q257
    * gates what the watermark DROPS; this measures what the data
    * DEMANDS): per ingest partition (user_id mod 8 — the Kafka-
    * partition analog), lateness = running-max event time over arrival
    * order (event_id) minus own event time, summarized as exact
    * p50/p95/p99/max microseconds plus the implied delay in whole
    * minutes (p99 rounded up).
    *
    * Determinism: lateness is integer µs under the total (event_id)
    * arrival order; percentiles pick from the lateness census by
    * integer rank compares (k·cum ≥ p·n — no interpolation). Scale:
    * ONE partition-keyed window (arrival order is per-partition, as in
    * any real ingest) + a census agg per partition; this never sorts
    * globally.
    */
  def q308WatermarkDelay(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir).select(
      pmod(col("user_id"), lit(8L)).as("part"),
      col("event_id"), expr("unix_micros(ts)").as("us"))
    val w = Window.partitionBy("part").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lat = ev.withColumn("lat", max("us").over(w) - col("us"))
    val census = lat.groupBy("part", "lat").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(Window.partitionBy("part").orderBy("lat")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = census.groupBy("part").agg(sum("cnt").as("n"), max("lat").as("max_lat"))
    census.join(tot, "part")
      .groupBy("part", "n", "max_lat")
      .agg(
        min(when(col("cum") * 2 >= col("n"), col("lat"))).as("p50"),
        min(when(col("cum") * 20 >= col("n") * 19, col("lat"))).as("p95"),
        min(when(col("cum") * 100 >= col("n") * 99, col("lat"))).as("p99"))
      .select(col("part"), col("n"), col("p50"), col("p95"), col("p99"),
        col("max_lat"),
        expr("(p99 + 59999999) div 60000000").as("delay_minutes"))
      .orderBy("part")
  }

  /** q309: SPRT — Wald's sequential probability ratio test, the
    * SEQUENTIAL member of the experimentation family (q213's z-test
    * and q280/q285's KS are fixed-horizon; a production experiment
    * platform peeks continuously, and SPRT is the peeking-safe
    * protocol): per event type, walk the purchase-value observations
    * in event order accumulating the Bernoulli log-likelihood ratio
    * for H₁: p=0.55 vs H₀: p=0.45 (success = value ≥ 250), decide at
    * the Wald boundaries A = ln(19) / B = −ln(19) (α=β=0.05), report
    * the decision, crossing index, and final LLR.
    *
    * Determinism: LLR_t = S_t·ln(11/9)... IS a·S_t + b·t with S_t an
    * integer running sum — computed as (2·S_t − t)·ln(11/9)·½·2 —
    * exactly: both per-outcome increments are ±ln(11/9) (symmetric
    * hypotheses), so LLR_t = (2S_t − t)·ln(11/9); the boundary
    * compare runs on the INTEGER walk 2S_t − t vs ±⌈ln19/ln(11/9)⌉
    * — no float enters the decision; only the reported LLR descales
    * through one snapped multiply. Scale: one type-partitioned
    * running-sum window + a keyed min over crossing rows.
    */
  def q309Sprt(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // integer boundary: walk w = 2S−t crosses when |w| ≥ k where
    // k = min integer with k·ln(11/9) ≥ ln 19 → k = 15 (ln19/ln(11/9)
    // = 14.67…) — stated as a literal so both engines share it
    val k = 15L
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase", "click"))
      .select(col("event_type"), col("event_id"), expr("unix_micros(ts)").as("us"),
        when(floor(col("value") * 100.0 + 0.5) >= 25000L, 1L).otherwise(0L).as("succ"))
    val w = Window.partitionBy("event_type").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val walk = ev
      .withColumn("t", count(lit(1)).over(w))
      .withColumn("s", sum("succ").over(w))
      .withColumn("wk", lit(2L) * col("s") - col("t"))
    val crossings = walk.filter(abs(col("wk")) >= k)
      .groupBy("event_type")
      .agg(min(struct(col("t"), col("wk"))).as("c"))
      .select(col("event_type"), col("c.t").as("decided_at"), col("c.wk").as("wk"))
    val finals = walk.groupBy("event_type")
      .agg(max(struct(col("t"), col("wk"))).as("f"))
      .select(col("event_type"), col("f.t").as("n_obs"), col("f.wk").as("final_wk"))
    finals.join(crossings, Seq("event_type"), "left")
      .select(col("event_type"), col("n_obs"),
        coalesce(col("decided_at"), lit(0L)).as("decided_at"),
        when(col("wk") >= k, "accept_h1").when(col("wk") <= -k, "accept_h0")
          .otherwise("continue").as("decision"),
        // ln(11/9) as a shared decimal LITERAL (not a libm call): both
        // engines parse the identical double, so the snap is exact
        (floor(coalesce(col("wk"), col("final_wk")).cast("double") *
          lit(0.20067069546215124) * 1000000.0 + 0.5) / 1000000.0).as("llr_at_stop"))
      .orderBy("event_type")
  }

  /** q310: DATE-DIMENSION spine — the calendar table every warehouse
    * joins against (q173 gap-fills a spine implicitly; this BUILDS the
    * dimension: one row per day over the fact table's span, with the
    * calendar attributes), gated as the per-month census so the
    * calendar arithmetic — day counts, weekend counts, ISO weeks,
    * month-end day — is certified without a 2500-row dump.
    *
    * Determinism: pure calendar integer functions; day-of-week
    * normalized to 0=Sunday in both engines (Spark's dayofweek is
    * 1-based, DuckDB's 0-based). Scale: the spine is
    * sequence()-generated from a 1-row min/max agg — never a row-scale
    * operation; real deployments materialize exactly this table once.
    */
  def q310DateSpine(spark: SparkSession, dir: String): DataFrame = {
    val span = Tables.orders(spark, dir)
      .agg(min(col("o_orderdate")).cast("date").as("d0"),
        max(col("o_orderdate")).cast("date").as("d1"))
    span.select(explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
      .select(col("d"), year(col("d")).cast("long").as("y"),
        month(col("d")).cast("long").as("m"),
        (dayofweek(col("d")) - 1).cast("long").as("dow"),
        weekofyear(col("d")).cast("long").as("iso_week"),
        dayofmonth(last_day(col("d"))).cast("long").as("month_len"))
      .groupBy("y", "m")
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("dow") === 0 || col("dow") === 6, 1L).otherwise(0L))
          .as("n_weekend"),
        countDistinct("iso_week").as("n_iso_weeks"),
        max("month_len").as("month_len"))
      .orderBy("y", "m")
  }

  /** q311: SHARE-OF-PARENT hierarchy report — the percent-of-total
    * OLAP shape (q04's rollup produces the LEVELS; a real report also
    * wants each level's share of its PARENT: nation-of-region and
    * region-of-world): revenue per nation with both shares on the
    * exact ppm integer grid.
    *
    * Determinism: cents are exact; shares are (child·10⁶) div parent
    * — integer division, no float anywhere. Scale: one fact agg to
    * the nation census, then dim-table joins (broadcast) and two
    * census-level rollups — the fact table is touched once.
    */
  def q311ShareOfParent(spark: SparkSession, dir: String): DataFrame = {
    val perNation = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
      .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey").agg(sum("cents").as("nc"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_regionkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)
        .select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("n_name"), col("nc"))
    val perRegion = perNation.groupBy("r_name").agg(sum("nc").as("rc"))
    val world = perRegion.agg(sum("rc").as("wc"))
    perNation.join(perRegion, "r_name").crossJoin(broadcast(world))
      .select(col("r_name"), col("n_name"),
        round(col("nc") / 100.0, 2).as("revenue"),
        expr("(nc * 1000000) div rc").as("share_of_region_ppm"),
        expr("(rc * 1000000) div wc").as("region_share_ppm"))
      .orderBy("r_name", "n_name")
  }

  /** q312: SOURCE-FRESHNESS audit — the dbt-source-freshness /
    * pipeline-staleness monitor (q175 audits integrity, q218 erasure;
    * this audits ARRIVAL: which feeds have stopped): per event type,
    * the last-seen event time, staleness against the corpus frontier
    * (the global max — the deterministic stand-in for wall-clock
    * "now"), and the SLA flag at a 1-hour threshold.
    *
    * Determinism: pure integer µs arithmetic off one 1-row frontier
    * agg. Scale: one partial+final max per type — the cheapest
    * monitor there is, and the one that pages first.
    */
  def q312SourceFreshness(spark: SparkSession, dir: String): DataFrame = {
    val perType = Tables.events(spark, dir)
      .groupBy("event_type").agg(max(expr("unix_micros(ts)")).as("last_us"),
        count(lit(1)).as("n_events"))
    val frontier = perType.agg(max("last_us").as("f"))
    perType.crossJoin(broadcast(frontier))
      .select(col("event_type"), col("n_events"),
        timestamp_micros(col("last_us")).as("last_seen"),
        expr("(f - last_us) div 1000000").as("staleness_sec"),
        when(col("f") - col("last_us") > 3600L * 1000000L, 1L).otherwise(0L)
          .as("sla_breach"))
      .orderBy("event_type")
  }

  /** q316: KRUSKAL–WALLIS H test — the k-group extension of q203's
    * Mann–Whitney (q203 compares TWO segments; the screening question a
    * platform actually asks is "do ANY of the k segments differ?"):
    * rank order totals across all five market segments on the shared
    * cents census, H = 3/(N(N+1))·Σ R2ₜ²/nₜ − 3(N+1) with DOUBLED
    * midranks R2 (so every rank is an integer even at ties), tie
    * correction C = 1 − Σ(t³−t)/(N³−N), H_adj = H/C against the
    * χ²(k−1) 5% critical value 9.487729.
    *
    * Determinism: per-segment rank sums are exact BIGINTs off the value
    * census (the q203 device: 2·R = 2·(cum−cnt)+cnt+1 summed per cell);
    * the five R2ₜ²/nₜ terms are combined in ONE explicit left-to-right
    * expression over the pivoted single row — never a float agg whose
    * partition order could reassociate — and both engines evaluate the
    * identical chain. Scale: one fact-table agg to the (segment, cents)
    * census, one census-level cumulative window (value-cardinality
    * bounded), one 1-row reduce.
    */
  def q316KruskalWallis(spark: SparkSession, dir: String): DataFrame = {
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    val s = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("v"))
    val cell = s.groupBy("seg", "v").agg(count(lit(1)).as("ct"))
    val vc = cell.groupBy("v").agg(sum("ct").as("cnt"))
      .withColumn("cum", sum("cnt").over(Window.orderBy("v")))
      .withColumn("m2", lit(2L) * (col("cum") - col("cnt")) + col("cnt") + lit(1L))
    val joined = cell.join(vc, "v")
    val aggs = segs.flatMap(g => Seq(
      sum(when(col("seg") === g, col("ct")).otherwise(lit(0L)))
        .as(s"n_${g.take(2).toLowerCase}"),
      sum(when(col("seg") === g, col("ct") * col("m2")).otherwise(lit(0L)))
        .as(s"r2_${g.take(2).toLowerCase}"))) :+ sum("ct").as("n")
    val one = joined.agg(aggs.head, aggs.tail: _*)
    // tie census rides the value census, not the cell census
    val ties = vc.agg(sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("tie3"))
    val keys = segs.map(_.take(2).toLowerCase)
    val sTerm = keys.map(k =>
        s"CAST(r2_$k AS DOUBLE) * CAST(r2_$k AS DOUBLE) / CAST(n_$k AS DOUBLE)")
      .mkString("(", " + ", ")")
    one.crossJoin(broadcast(ties))
      .withColumn("nn", col("n").cast("double"))
      .select(
        col("n"),
        lit(segs.size.toLong).as("k"),
        col("tie3"),
        round(expr(s"3.0 / (nn * (nn + 1.0)) * $sTerm - 3.0 * (nn + 1.0)"), 6).as("h"),
        round(expr("1.0 - CAST(tie3 AS DOUBLE) / (nn * nn * nn - nn)"), 6).as("tie_c"),
        round(expr(
          s"(3.0 / (nn * (nn + 1.0)) * $sTerm - 3.0 * (nn + 1.0)) / " +
            "(1.0 - CAST(tie3 AS DOUBLE) / (nn * nn * nn - nn))"), 6).as("h_adj"),
        lit(segs.size.toLong - 1L).as("df"),
        when(expr(
          s"(3.0 / (nn * (nn + 1.0)) * $sTerm - 3.0 * (nn + 1.0)) / " +
            "(1.0 - CAST(tie3 AS DOUBLE) / (nn * nn * nn - nn))") > 9.487729,
          lit("reject")).otherwise(lit("retain")).as("h0"))
  }

  /** q318: MANN–KENDALL trend test — the nonparametric
    * monotone-trend screen (q297's Theil–Sen estimates the SLOPE; MK
    * decides whether a trend EXISTS, and the two are the standard
    * pairing in environmental/metric monitoring): per event type, the
    * daily turnover series (exact Σ cents per UTC day), S = Σ sign
    * differences over all day pairs, tie-corrected variance
    * 18·Var = n(n−1)(2n+5) − Σ t(t−1)(2t+5), continuity-corrected
    * z = (S ∓ 1)/√Var, trend called at |z| > 1.959964.
    *
    * Determinism: S and 18·Var are exact BIGINTs (sign sums and tie
    * censuses); z is one double chain off integers < 2⁵³. Scale: the
    * pair "join" is over the per-type DAY census (30 days → 435 pairs
    * per type), never events — the series length is bounded by time,
    * not data volume; everything upstream is one partial+final agg.
    */
  def q318MannKendall(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .groupBy("event_type", "day").agg(sum("cents").as("v"))
    val pairs = daily.as("a").join(daily.as("b"),
        col("a.event_type") === col("b.event_type") && col("a.day") < col("b.day"))
      .groupBy(col("a.event_type").as("event_type"))
      .agg(sum(signum(col("b.v") - col("a.v")).cast("long")).as("s_stat"))
    val ties = daily.groupBy("event_type", "v").agg(count(lit(1)).as("t"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_groups"),
        sum("t").as("n_days"),
        sum(col("t") * (col("t") - 1L) * (lit(2L) * col("t") + 5L)).as("tie_term"))
    pairs.join(ties, "event_type")
      .withColumn("var18",
        col("n_days") * (col("n_days") - 1L) * (lit(2L) * col("n_days") + 5L)
          - col("tie_term"))
      .select(col("event_type"), col("n_days"), col("s_stat"), col("var18"),
        round(expr(
          """CASE WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0)
            |     WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0)
            |     ELSE 0.0 END / sqrt(CAST(var18 AS DOUBLE) / 18.0)"""
            .stripMargin.replace("\n", " ")), 6).as("z"))
      .withColumn("trend",
        when(col("z") > 1.959964, lit("increasing"))
          .when(col("z") < -1.959964, lit("decreasing"))
          .otherwise(lit("none")))
      .orderBy("event_type")
  }

  /** q322: SHAPLEY-VALUE channel attribution — the game-theoretic
    * member of the attribution family (q241 splits by POSITION with a
    * fixed 40/20/40 rule; Shapley is the axiomatic answer — the unique
    * allocation that is efficient, symmetric, and marginal): channels
    * are the four non-purchase event types, a user's "coalition" is
    * their touched-channel set, v(S) = converted users whose touch set
    * ⊆ S, and φᵢ = Σ_{S⊆C∖i} |S|!(3−|S|)!·(v(S∪i)−v(S)) / 4!.
    *
    * Determinism: EXACT — with 4 channels the subset lattice is 16
    * rows, every v(S) is an integer census sum, and φᵢ·24 is an
    * integer (the factorial weights 6/2/2/6 never divide); shares ride
    * the ppm grid. Efficiency (Σφ = v(C) − v(∅)) is emitted so the
    * allocation axiom is itself gated. Scale: ONE fact-table agg to
    * per-user masks, one 16-row census — the lattice math never sees
    * row-scale data; with k channels the lattice is 2ᵏ (this is the
    * standard exact-Shapley-by-coalition-census construction, viable
    * to k ≈ 20).
    */
  def q322ShapleyAttribution(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(
        (max(when(col("event_type") === "click", 1L)).cast("long") * 1L).as("b0"),
        max(when(col("event_type") === "error", 1L)).as("b1"),
        max(when(col("event_type") === "signup", 1L)).as("b2"),
        max(when(col("event_type") === "view", 1L)).as("b3"),
        max(when(col("event_type") === "purchase", 1L)).as("conv"))
      .select(
        (coalesce(col("b0"), lit(0L)) + coalesce(col("b1"), lit(0L)) * 2L +
          coalesce(col("b2"), lit(0L)) * 4L + coalesce(col("b3"), lit(0L)) * 8L)
          .as("mask"),
        coalesce(col("conv"), lit(0L)).as("conv"))
    val maskCensus = users.groupBy("mask").agg(sum("conv").as("mconv"))
    val subsets = spark.range(16).select(col("id").as("s"))
    val vS = subsets.join(broadcast(maskCensus),
        expr("(mask & (15 - s)) = 0"), "left")
      .groupBy("s").agg(coalesce(sum("mconv"), lit(0L)).as("v"))
    val channels = spark.range(4).select(col("id").as("ci"),
      expr("CASE id WHEN 0 THEN 'click' WHEN 1 THEN 'error' " +
        "WHEN 2 THEN 'signup' ELSE 'view' END").as("channel"),
      expr("CAST(pow(2, id) AS BIGINT)").as("bit"))
    val lattice = channels.join(broadcast(vS.as("without")),
        expr("(s & bit) = 0"))
      .withColumn("cnt",
        expr("(s div 1) % 2 + (s div 2) % 2 + (s div 4) % 2 + (s div 8) % 2"))
      .withColumn("w", expr(
        "CASE cnt WHEN 0 THEN 6L WHEN 1 THEN 2L WHEN 2 THEN 2L ELSE 6L END"))
      .join(broadcast(vS.select(col("s").as("s2"), col("v").as("v_with"))),
        expr("s2 = (s + bit)"))
    val phi = lattice.groupBy("channel")
      .agg(sum(col("w") * (col("v_with") - col("v"))).as("phi_x24"))
    val eff = vS.agg(
      sum(when(col("s") === 15, col("v")).otherwise(0L)).as("v_full"),
      sum(when(col("s") === 0, col("v")).otherwise(0L)).as("v_empty"))
    phi.crossJoin(broadcast(eff))
      .crossJoin(broadcast(phi.agg(sum("phi_x24").as("phi_total"))))
      .select(col("channel"), col("phi_x24"),
        round(col("phi_x24").cast("double") / 24.0, 6).as("phi"),
        expr("CASE WHEN phi_total = 0 THEN 0L " +
          "ELSE phi_x24 * 1000000L div phi_total END").as("share_ppm"),
        col("v_full"), col("v_empty"))
      .orderBy("channel")
  }

  /** q323: MUTUAL INFORMATION feature relevance — the
    * information-theoretic member of the dependence family (q193/q250
    * test with χ², q283/q288 with rank correlation; MI measures the
    * BITS a feature carries about a target, the selection criterion
    * decision-tree and feature-store pipelines rank by): between
    * event_type and the 50-unit value band, MI = Σ p(x,y)·ln
    * (p(x,y)/(p(x)p(y))), with both marginal entropies and the
    * normalized MI / sqrt(H(X)·H(Y)).
    *
    * Determinism: each cell's term is n_xy·(ln n_xy + ln N − ln n_x −
    * ln n_y) with every ln snapped to the micro-nat BIGINT grid
    * CENSUS-side — the total is an exact integer sum (order-invariant)
    * and only the final descales divide. Scale: one fact agg to the
    * (type, band) cell census; marginals and the lattice arithmetic
    * live on censuses.
    */
  def q323MutualInfo(spark: SparkSession, dir: String): DataFrame = {
    def lnu(c: Column): Column =
      floor(log(c.cast("double")) * 1000000.0 + 0.5).cast("long")
    val cells = Tables.events(spark, dir)
      .select(col("event_type").as("x"),
        expr("floor(value * 100.0 + 0.5) div 5000").cast("long").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("nxy"))
    val mx = cells.groupBy("x").agg(sum("nxy").as("nx"))
    val my = cells.groupBy("y").agg(sum("nxy").as("ny"))
    val n = cells.agg(sum("nxy").as("n"))
    val terms = cells.join(mx, "x").join(my, "y").crossJoin(broadcast(n))
      .select(col("n"),
        (col("nxy") * (lnu(col("nxy")) + lnu(col("n"))
          - lnu(col("nx")) - lnu(col("ny")))).as("mi_term"),
        col("x"), col("y"), col("nxy"), col("nx"), col("ny"))
    val hx = mx.crossJoin(broadcast(n))
      .agg(sum(col("nx") * (lnu(col("n")) - lnu(col("nx")))).as("hx_u"))
    val hy = my.crossJoin(broadcast(n))
      .agg(sum(col("ny") * (lnu(col("n")) - lnu(col("ny")))).as("hy_u"))
    terms.groupBy("n").agg(sum("mi_term").as("mi_u"))
      .crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
      .select(col("n"), col("mi_u"), col("hx_u"), col("hy_u"),
        round(col("mi_u").cast("double") / 1e6 / col("n").cast("double"), 6)
          .as("mi_nats"),
        round(col("hx_u").cast("double") / 1e6 / col("n").cast("double"), 6)
          .as("h_x"),
        round(col("hy_u").cast("double") / 1e6 / col("n").cast("double"), 6)
          .as("h_y"),
        round(col("mi_u").cast("double") /
          sqrt(col("hx_u").cast("double") * col("hy_u").cast("double")), 6)
          .as("nmi"))
  }

  /** q327: COHORT LTV curves — the revenue companion to q95's
    * retention matrix (retention counts who came BACK; LTV accumulates
    * what each acquisition cohort has SPENT by age, the curve every
    * growth model is fit to): cohort = a user's first-seen UTC day
    * (any event type), age = days since, cumulative purchase cents per
    * cohort-age with the per-user LTV in exact deci-milli-cents.
    *
    * Determinism: cents are exact; the cumulative is a BIGINT window
    * over the (cohort, age) CENSUS (bounded by days², never rows);
    * per-user LTV is integer division on the 10⁻⁴-cent grid. Scale:
    * one agg to first-seen (fact-table shuffle on user_id), one agg to
    * the cohort-age census, then census-local windows — the standard
    * two-shuffle cohort shape.
    */
  def q327CohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"),
      expr("unix_micros(ts) div 86400000000").as("day"),
      col("event_type"),
      floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
    val firstSeen = ev.groupBy("user_id").agg(min("day").as("cohort"))
    val sizes = firstSeen.groupBy("cohort").agg(count(lit(1)).as("cohort_users"))
    val census = ev.filter(col("event_type") === "purchase")
      .join(firstSeen, "user_id")
      .groupBy(col("cohort"), (col("day") - col("cohort")).as("age"))
      .agg(sum("cents").as("rev_cents"), count(lit(1)).as("n_purchases"))
    census
      .withColumn("cum_cents",
        sum("rev_cents").over(Window.partitionBy("cohort").orderBy("age")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(sizes, "cohort")
      .select(col("cohort"), col("age"), col("cohort_users"),
        col("n_purchases"), col("rev_cents"), col("cum_cents"),
        expr("cum_cents * 10000L div cohort_users").as("ltv_dmc"))
      .orderBy("cohort", "age")
  }

  /** q328: MARKOV REMOVAL-EFFECT attribution — the third member of the
    * attribution family (q241 position rule, q322 Shapley on touch
    * SETS; the Markov model credits by PATH: build the journey chain,
    * then ask how much conversion probability disappears when a
    * channel's node is deleted — Anderl et al. '14, the industry
    * "data-driven attribution"): journeys truncate at the user's first
    * purchase, states are START + the four channels with CONV/NULL
    * absorbing, and absorption probabilities come from 20 fixed
    * value-iteration rounds on the 10⁻⁹ integer grid.
    *
    * Determinism: transition counts are exact; each iteration is
    * p'(s) = (n(s,CONV)·10⁹ + Σ n(s,t)·p(t)) div n(s) — BIGINT
    * multiply-sum and floor divide, order-invariant, with the removed
    * channel clamped to 0 (paths through it fail); the oracle unrolls
    * the identical 20 rounds. Removal effects and shares are integer
    * differences on the same grid. Scale: one fact-table window builds
    * the transition census; all five scenarios iterate together on a
    * 25-row census — iterations never touch row-scale data.
    */
  def q328MarkovAttribution(spark: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy("us", "event_id")
    val ev = Tables.events(spark, dir).select(col("user_id"),
      expr("unix_micros(ts)").as("us"), col("event_id"), col("event_type"))
    val kept = ev
      .withColumn("pc", sum(when(col("event_type") === "purchase", 1L)
        .otherwise(0L)).over(wOrd))
      .filter(col("pc") - when(col("event_type") === "purchase", 1L)
        .otherwise(0L) === 0L)
    val sq = kept
      .withColumn("prev", lag("event_type", 1).over(wOrd))
      .withColumn("rdesc", row_number().over(
        Window.partitionBy("user_id").orderBy(col("us").desc, col("event_id").desc)))
    val t1 = sq.select(coalesce(col("prev"), lit("START")).as("f"),
      when(col("event_type") === "purchase", lit("CONV"))
        .otherwise(col("event_type")).as("t"))
    val t2 = sq.filter(col("rdesc") === 1 && col("event_type") =!= "purchase")
      .select(col("event_type").as("f"), lit("NULL").as("t"))
    val tr = t1.unionAll(t2).groupBy("f", "t").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val ns = tr.groupBy("f").agg(sum("n").as("ntot"))
    val chans = Seq("click", "error", "signup", "view")
    // The 20-round absorption iteration runs over ≤ 5 scenarios × 5
    // states with a ≤ 30-row transition table — the old plan paid per
    // round THREE joins + an aggregation + an eager checkpoint on that
    // confetti (60 joins / 20 checkpoint jobs of sub-25-row work: pure
    // stage-launch fat, the q438 lesson). Instead: broadcast the
    // transition entries and out-masses ONCE as array/map columns onto
    // a 5-row (one per scenario) frame and unroll the rounds as 20
    // chained PROJECTIONS over a per-scenario state→value map — no
    // join, no shuffle, no action anywhere in the loop. The recurrence
    // is the identical integer chain (BIGINT products, same `div`), so
    // every p value is bit-equal to the joined formulation's.
    val sts = "array('START'," + chans.map(c => s"'$c'").mkString(",") + ")"
    val trA = tr.groupBy().agg(
      collect_list(struct(col("f"), col("t"), col("n"))).as("tre"))
    val nsM = ns.groupBy().agg(
      map_from_entries(collect_list(struct(col("f"), col("ntot")))).as("nsm"))
    val scenF = spark.createDataFrame(("full" +: chans).map(Tuple1(_)))
      .toDF("scen")
    var cur = scenF.crossJoin(broadcast(trA)).crossJoin(broadcast(nsM))
      .withColumn("pm", expr(s"map_from_arrays($sts, transform($sts, s -> 0L))"))
    val iterSql =
      s"""map_from_arrays($sts, transform($sts, s ->
         |  IF(s = scen OR element_at(nsm, s) IS NULL, 0L,
         |     (aggregate(filter(tre, e -> e.f = s), 0L,
         |        (a, e) -> a + CASE WHEN e.t = 'CONV' THEN e.n * 1000000000L
         |                           WHEN e.t = 'NULL' THEN 0L
         |                           ELSE e.n * coalesce(element_at(pm, e.t), 0L)
         |                      END))
         |     div element_at(nsm, s))))""".stripMargin
    // eager cut EVERY round: nesting the lambda expression sends
    // Catalyst's optimizer super-linear (a 20-deep chain took minutes
    // to plan, depth 4 still beat the joins it replaced), so each round
    // stays a depth-1 projection materialized by a one-stage job on 5
    // rows — still no join or shuffle anywhere in the loop. MEASURED
    // (round 20, bracketed A/B): checkpointing every 4th round at
    // lambda depth 4 — the advisor's 15-fewer-jobs suggestion — benched
    // 2.13–2.45 s vs the 1.45–1.57 s per-round-cut control band; the
    // depth-4 planning cost exceeds the saved 5-row driver jobs.
    for (_ <- 1 to 20)
      cur = cur.withColumn("pm", expr(iterSql)).localCheckpoint(true)
    val pFin = cur.select(col("scen"),
      coalesce(expr("element_at(pm, 'START')"), lit(0L)).as("p"))
    val pf = pFin.filter(col("scen") === "full")
      .select(col("p").as("p_full_u"))
    val pr = pFin.filter(col("scen") =!= "full")
      .select(col("scen").as("channel"), col("p").as("p_removed_u"))
    val tot = pr.crossJoin(broadcast(pf))
      .agg(sum(col("p_full_u") - col("p_removed_u")).as("dt"))
    pr.crossJoin(broadcast(pf)).crossJoin(broadcast(tot))
      .select(col("channel"), col("p_removed_u"), col("p_full_u"),
        round((col("p_full_u") - col("p_removed_u")).cast("double") /
          col("p_full_u").cast("double"), 6).as("removal_effect"),
        expr("CASE WHEN dt = 0 THEN 0L ELSE " +
          "(p_full_u - p_removed_u) * 1000000L div dt END").as("share_ppm"))
      .orderBy("channel")
  }

  /** q331: DIFFERENCE-IN-DIFFERENCES — the panel member of the causal
    * family (q176 tests a cross-section, q223 CUPED reduces its
    * variance, q251 reweights it; DiD identifies a treatment effect
    * when assignment isn't random but TRENDS are parallel — the
    * before/after × treated/control 2×2 every policy rollout is
    * judged by): treated = even user_id, post = the derived second
    * half of the observation span, outcome = purchase cents; the DiD
    * estimate is (ȳ₁₁−ȳ₁₀)−(ȳ₀₁−ȳ₀₀) with its large-sample SE from
    * per-cell variances.
    *
    * Determinism: the four cells' (n, Σ, Σ²) are exact BIGINTs off one
    * agg (cents² ≤ 2.4·10⁹ per row — Σ < 2⁶³ at any fixture SF); means,
    * variances, the estimate, and the SE are FIXED four-term expression
    * chains over the pivoted single row, never a float agg. Scale: one
    * scan, one 4-cell census — the cheapest causal design there is.
    */
  def q331DiffInDiff(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("c"))
    val span = ev.agg(min("day").as("mn"), max("day").as("mx"))
      .select(expr("(mn + mx + 1) div 2").as("mid"))
    val cells = ev.crossJoin(broadcast(span))
      .select((col("user_id") % 2 === 0).cast("int").as("treated"),
        (col("day") >= col("mid")).cast("int").as("post"), col("c"))
    val aggs = (for (tr <- Seq(0, 1); po <- Seq(0, 1)) yield {
      val m = col("treated") === tr && col("post") === po
      Seq(sum(when(m, 1L).otherwise(0L)).as(s"n$tr$po"),
        sum(when(m, col("c")).otherwise(0L)).as(s"s$tr$po"),
        sum(when(m, col("c") * col("c")).otherwise(0L)).as(s"q$tr$po"))
    }).flatten
    val one = cells.agg(aggs.head, aggs.tail: _*)
    def mean(t: Int, p: Int) = s"(CAST(s$t$p AS DOUBLE) / CAST(n$t$p AS DOUBLE))"
    def vr(t: Int, p: Int) =
      s"((CAST(q$t$p AS DOUBLE) - CAST(s$t$p AS DOUBLE) * CAST(s$t$p AS DOUBLE) / CAST(n$t$p AS DOUBLE)) / (CAST(n$t$p AS DOUBLE) - 1.0))"
    val did = s"((${mean(1, 1)} - ${mean(1, 0)}) - (${mean(0, 1)} - ${mean(0, 0)}))"
    val se = s"sqrt(${vr(1, 1)} / n11 + ${vr(1, 0)} / n10 + ${vr(0, 1)} / n01 + ${vr(0, 0)} / n00)"
    one.select(col("n00"), col("n01"), col("n10"), col("n11"),
      round(expr(mean(0, 0)), 6).as("y00"),
      round(expr(mean(0, 1)), 6).as("y01"),
      round(expr(mean(1, 0)), 6).as("y10"),
      round(expr(mean(1, 1)), 6).as("y11"),
      round(expr(did), 6).as("did_cents"),
      round(expr(se), 6).as("se_cents"),
      round(expr(s"$did / ($se)"), 6).as("z"))
  }

  /** q329: SYSTEMATIC SAMPLING with a distributed global rank — the
    * survey-sampling design q57/q69/q87 don't cover (every-k-th under
    * a fixed permutation gives zero clumping variance, and auditors
    * like that membership is a pure function of the key): order the
    * population by (md5(key), key), take ranks ≡ 1 (mod 37), report
    * the per-status census of the sample beside the population.
    *
    * Determinism: the permutation is md5 — no RNG state, re-runnable
    * anywhere. Scale: THE point of this row — the global rank is
    * assembled WITHOUT a global sort: bucket = first md5 byte (256
    * buckets), per-bucket offsets from a partitioned window, bucket
    * base offsets from the 256-row census cumulative, global rank =
    * base + offset. One shuffle on the bucket key; the only
    * single-partition window runs over the 256-row census. (The
    * oracle ranks with one flat ORDER BY — same order, different
    * algorithm.)
    */
  def q329SystematicSample(spark: SparkSession, dir: String): DataFrame = {
    val pop = Tables.orders(spark, dir).select(col("o_orderkey"),
        col("o_orderstatus"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
      .withColumn("h", md5(col("o_orderkey").cast("string")))
      .withColumn("b", substring(col("h"), 1, 2))
    val offsets = pop.groupBy("b").agg(count(lit(1)).as("cnt"))
      .withColumn("base",
        sum("cnt").over(Window.orderBy("b")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("cnt"))
    val ranked = pop.join(broadcast(offsets.select("b", "base")), "b")
      .withColumn("rn", row_number().over(
        Window.partitionBy("b").orderBy("h", "o_orderkey")))
      .withColumn("grank", col("base") + col("rn"))
    val sample = ranked.filter(col("grank") % 37 === 1)
    val popTot = pop.agg(count(lit(1)).as("n_pop"), sum("cents").as("pop_cents"))
    sample.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_sample"), sum("cents").as("sample_cents"))
      .crossJoin(broadcast(popTot))
      .select(col("o_orderstatus"), col("n_sample"), col("sample_cents"),
        col("n_pop"), col("pop_cents"),
        expr("n_sample * 1000000L div n_pop").as("status_rate_ppm"))
      .orderBy("o_orderstatus")
  }

  /** q332: MONDRIAN k-anonymization (LeFevre et al., ICDE'06) — the
    * ANONYMIZER that completes the privacy tripod's audit rows (q232
    * k-anonymity, q256 l-diversity, q305 t-closeness all MEASURE a
    * given generalization; Mondrian BUILDS one): three fixed
    * median-cut rounds over the (acctbal, nation) quasi-identifier
    * pair — cycling dimensions a, n, a, the strict-alternation
    * variant — producing ≤ 8 generalization cells, each reported as
    * its QI ranges with the k=10 publishability flag.
    *
    * Determinism: medians are census-rank lookups (min v with
    * 2·cum ≥ n_cell — all-integer, the q295 device); cell ids evolve
    * as cell·2 + (v > med); every output is an integer. Scale: each
    * round is one (cell, value) census agg + a ≤ 8-row median
    * broadcast back — the partition tree never materializes pairwise
    * anything, which is why Mondrian is THE scalable k-anonymizer.
    */
  def q332Mondrian(spark: SparkSession, dir: String): DataFrame = {
    var pts = Tables.customer(spark, dir).select(
        col("c_custkey").as("id"),
        floor(col("c_acctbal") * 100.0 + 0.5).cast("long").as("a"),
        col("c_nationkey").cast("long").as("n"))
      .withColumn("cell", lit(0L))
    for (d <- Seq("a", "n", "a")) {
      val census = pts.groupBy(col("cell"), col(d).as("v"))
        .agg(count(lit(1)).as("cnt"))
      val tot = census.groupBy("cell").agg(sum("cnt").as("nc"))
      val med = census.join(tot, "cell")
        .withColumn("cum", sum("cnt").over(
          Window.partitionBy("cell").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("cum") * 2 >= col("nc"))
        .groupBy("cell").agg(min("v").as("med"))
      pts = pts.join(broadcast(med), "cell")
        .select(col("id"), col("a"), col("n"),
          (col("cell") * 2 + when(col(d) > col("med"), 1L).otherwise(0L))
            .as("cell"))
        .localCheckpoint()
    }
    pts.groupBy("cell")
      .agg(count(lit(1)).as("n_rows"),
        min("a").as("a_min"), max("a").as("a_max"),
        min("n").as("n_min"), max("n").as("n_max"))
      .withColumn("k_ok", (col("n_rows") >= 10L).cast("long"))
      .orderBy("cell")
  }

  /** q334: POISSON OVERDISPERSION test — the rate-model diagnostic
    * every event-volume monitor needs (alerting thresholds assume
    * Poisson arrivals; real user activity is bursty, and the
    * variance-to-mean ratio says HOW wrong that assumption is —
    * Fisher's dispersion index, with the χ² statistic (n−1)·D and its
    * normal approximation z = √(2χ²) − √(2df−1)): per event type over
    * the per-user count distribution.
    *
    * Determinism: the three moments (n users, Σc, Σc²) are exact
    * BIGINTs off the per-user census; D, χ², and z are one fixed
    * double chain each. Scale: one fact agg to (type, user) counts,
    * one partial+final moment agg — the canonical two-shuffle shape.
    */
  def q334DispersionTest(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("c"))
    perUser.groupBy("event_type")
      .agg(count(lit(1)).as("n_users"),
        sum("c").as("s1"),
        sum(col("c") * col("c")).as("s2"))
      .select(col("event_type"), col("n_users"), col("s1"), col("s2"),
        round(expr(
          """(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
            |/ CAST(n_users AS DOUBLE)) / (CAST(n_users AS DOUBLE) - 1.0)
            |/ (CAST(s1 AS DOUBLE) / CAST(n_users AS DOUBLE))"""
            .stripMargin.replace("\n", " ")), 6).as("dispersion"),
        round(expr(
          """sqrt(2.0 * (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
            |* CAST(s1 AS DOUBLE) / CAST(n_users AS DOUBLE))
            |/ (CAST(s1 AS DOUBLE) / CAST(n_users AS DOUBLE)))
            |- sqrt(2.0 * (CAST(n_users AS DOUBLE) - 1.0) - 1.0)"""
            .stripMargin.replace("\n", " ")), 6).as("z"))
      .withColumn("verdict",
        when(col("z") > 1.959964, lit("overdispersed"))
          .when(col("z") < -1.959964, lit("underdispersed"))
          .otherwise(lit("poisson_ok")))
      .orderBy("event_type")
  }

  /** q335: EQUI-DEPTH column statistics — the ANALYZE TABLE artifact a
    * cost-based optimizer consumes (Spark's CBO and every warehouse
    * keep exactly this: NDV, bounds, and an equi-depth histogram per
    * column; q163 gates file-level skipping stats — this is the
    * COLUMN-level sibling the join-order/selectivity estimates read):
    * an 8-bucket equi-depth histogram over order-price cents with
    * per-bucket exact row counts and distinct-value counts.
    *
    * Determinism: bucket cuts are census-rank lookups (min v with
    * 8·cum ≥ j·n); every reported number is an integer census sum.
    * Scale: ONE value census carries the NDV, the bounds, the cuts,
    * and every per-bucket statistic — the table is scanned once,
    * which is what makes stats collection affordable at 100 TB.
    */
  def q335ColumnStats(spark: SparkSession, dir: String): DataFrame = {
    val census = Tables.orders(spark, dir)
      .select(floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("v"))
      .groupBy("v").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint()
    val tot = census.agg(sum("cnt").as("n"), count(lit(1)).as("ndv"),
      min("v").as("vmin"), max("v").as("vmax"))
    val cutAggs = (1 to 8).map(j =>
      min(when(col("cum") * 8 >= col("n") * j, col("v"))).as(s"c$j"))
    val cuts = census.crossJoin(broadcast(tot))
      .groupBy("n", "ndv", "vmin", "vmax")
      .agg(cutAggs.head, cutAggs.tail: _*)
    census.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        when(col("v") <= col("c1"), 1L).when(col("v") <= col("c2"), 2L)
          .when(col("v") <= col("c3"), 3L).when(col("v") <= col("c4"), 4L)
          .when(col("v") <= col("c5"), 5L).when(col("v") <= col("c6"), 6L)
          .when(col("v") <= col("c7"), 7L).otherwise(8L))
      .groupBy("bucket", "n", "ndv", "vmin", "vmax")
      .agg(min("v").as("lo"), max("v").as("hi"),
        sum("cnt").as("n_rows"), count(lit(1)).as("ndv_bucket"))
      .orderBy("bucket")
  }

  /** q336: DECISION STUMP trained by exact Gini — the one-level
    * decision tree that is both a baseline classifier and the inner
    * loop of every boosted-tree trainer (XGBoost/LightGBM evaluate
    * exactly this split search per node; doing it EXACTLY over a value
    * census is the distributed-histogram algorithm those systems
    * approximate): predict `o_orderstatus = 'F'` from order-price
    * cents and order day-of-week; every candidate cut of both features
    * scored by weighted Gini impurity from cumulative class counts,
    * best split reported beside the baseline impurity.
    *
    * Determinism: per-candidate class counts are exact BIGINTs off the
    * (feature, value) census cumulative; each candidate's score is the
    * same fixed double chain in both engines and the argmin orders by
    * (rounded score, feature, cut). Scale: ONE pass to the census,
    * candidates = distinct values (not rows), score + argmin live on
    * the census — the split search never rescans data, which is the
    * whole trick.
    */
  def q336DecisionStump(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir).select(
      when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"),
      floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("price"),
      expr("unix_micros(o_orderdate) div 86400000000 % 7").as("dow"))
    val census = base.select(lit("price").as("feat"), col("price").as("v"), col("y"))
      .unionAll(base.select(lit("dow").as("feat"), col("dow").as("v"), col("y")))
      .groupBy("feat", "v")
      .agg(count(lit(1)).as("cnt"), sum("y").as("pos"))
      .withColumn("cumn", sum("cnt").over(Window.partitionBy("feat").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cump", sum("pos").over(Window.partitionBy("feat").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = base.agg(count(lit(1)).as("n"), sum("y").as("npos"))
    val scoredCands = census.crossJoin(broadcast(tot))
      .filter(col("cumn") < col("n"))
      .withColumn("gini", expr(
        """(CAST(cumn AS DOUBLE)
          |  - (CAST(cump AS DOUBLE) * CAST(cump AS DOUBLE)
          |     + CAST(cumn - cump AS DOUBLE) * CAST(cumn - cump AS DOUBLE))
          |    / CAST(cumn AS DOUBLE)
          |  + CAST(n - cumn AS DOUBLE)
          |  - (CAST(npos - cump AS DOUBLE) * CAST(npos - cump AS DOUBLE)
          |     + CAST(n - cumn - npos + cump AS DOUBLE)
          |       * CAST(n - cumn - npos + cump AS DOUBLE))
          |    / CAST(n - cumn AS DOUBLE)) / CAST(n AS DOUBLE)"""
          .stripMargin.replace("\n", " ")))
      .withColumn("rn", row_number().over(
        Window.orderBy(round(col("gini"), 9).asc, col("feat").asc, col("v").asc)))
      .filter(col("rn") === 1)
    scoredCands.select(col("feat").as("feature"), col("v").as("cut"),
      col("n"), col("npos"),
      col("cumn").as("n_left"), col("cump").as("pos_left"),
      (col("n") - col("cumn")).as("n_right"),
      (col("npos") - col("cump")).as("pos_right"),
      round(col("gini"), 6).as("split_gini"),
      round(expr(
        """1.0 - CAST(npos AS DOUBLE) / CAST(n AS DOUBLE)
          |* (CAST(npos AS DOUBLE) / CAST(n AS DOUBLE))
          |- CAST(n - npos AS DOUBLE) / CAST(n AS DOUBLE)
          |* (CAST(n - npos AS DOUBLE) / CAST(n AS DOUBLE))"""
          .stripMargin.replace("\n", " ")), 6).as("baseline_gini"))
  }

  /** q338: GRAPH MODULARITY of the q224 communities — the quality
    * score FOR a community assignment (q224 produces labels; Newman's
    * Q says whether they mean anything — Q ≈ 0 is no better than
    * random edge placement, Q > 0.3 is real structure; every
    * graph-partitioning pipeline reports it): over the symmetrized
    * weighted trade graph with round-3 labels, Q = Σ_c (in_c/M −
    * (tot_c/M)²) where M = Σw, in_c = weight inside c, tot_c =
    * community weighted degree.
    *
    * Determinism: EXACT — in_c, tot_c, M are BIGINT censuses and each
    * community's contribution (in_c·M − tot_c²)/M² is one double
    * chain off integers (Σw ≤ 10⁶ at any fixture SF keeps tot² < 2⁶³).
    * Scale: the edge list joins labels twice (the q140 shape) and
    * everything after is a ≤|communities|-row census.
    */
  def q338Modularity(spark: SparkSession, dir: String): DataFrame = {
    val (edges, rounds) = nationGraphRounds(spark, dir)
    val m = edges.agg(sum("w").as("mm"))
    val perRound = rounds.zipWithIndex.map { case (lbl0, i) =>
      val lbl = lbl0.select(col("node"), col("label"))
      val e = edges
        .join(lbl.select(col("node").as("u"), col("label").as("cu")), Seq("u"))
        .join(lbl.select(col("node").as("v"), col("label").as("cv")), Seq("v"))
      e.groupBy(col("cu").as("community"))
        .agg(sum(when(col("cu") === col("cv"), col("w")).otherwise(0L)).as("in_w"),
          sum("w").as("tot_w"),
          countDistinct(col("u")).as("n_nodes"))
        .withColumn("round", lit((i + 1).toLong))
    }.reduce(_ unionByName _)
    val withM = perRound.crossJoin(broadcast(m))
      .withColumn("q_num", col("in_w") * col("mm") - col("tot_w") * col("tot_w"))
    val qTotal = withM.groupBy("round")
      .agg(sum("q_num").as("qn"), max("mm").as("m2"))
      .select(col("round"), round(col("qn").cast("double") /
        (col("m2") * col("m2")).cast("double"), 6).as("q_total"))
    withM.join(broadcast(qTotal), "round")
      .select(col("round"), col("community").cast("long").as("community"),
        col("n_nodes"), col("in_w"), col("tot_w"),
        round(col("q_num").cast("double") /
          (col("mm") * col("mm")).cast("double"), 9).as("q_contrib"),
        col("q_total"))
      .orderBy("round", "community")
  }

  /** q341: DISTRIBUTION-FREE median confidence interval — the
    * order-statistic CI (q09 reports the point median, q233/q222
    * bootstrap/jackknife a MEAN; the binomial argument gives the
    * median an exact-coverage interval with no distributional
    * assumption and no resampling: ranks n/2 ∓ 1.96·√n/2 bracket the
    * median with ~95% coverage): over order-price cents, the lower
    * median and both CI endpoints as census-rank lookups.
    *
    * Determinism: ranks come from one fixed double chain off the
    * integer n (floor/ceil snap them back to integers); every value
    * lookup is min v with cum ≥ rank on the census. Scale: ONE value
    * census answers the point estimate and both endpoints — this is
    * the q09b/q295 rank-selection device applied to interval
    * estimation.
    */
  def q341MedianCi(spark: SparkSession, dir: String): DataFrame = {
    val census = Tables.orders(spark, dir)
      .select(floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("v"))
      .groupBy("v").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint()
    val ranks = census.agg(sum("cnt").as("n"))
      .select(col("n"),
        expr("(n + 1) div 2").as("med_rank"),
        expr("CAST(floor((CAST(n AS DOUBLE) - 1.96 * sqrt(CAST(n AS DOUBLE))) " +
          "/ 2.0) AS BIGINT)").as("lo_rank"),
        expr("CAST(ceil(1.0 + (CAST(n AS DOUBLE) + 1.96 * sqrt(CAST(n AS DOUBLE))) " +
          "/ 2.0) AS BIGINT)").as("hi_rank"))
    census.crossJoin(broadcast(ranks))
      .groupBy("n", "med_rank", "lo_rank", "hi_rank")
      .agg(min(when(col("cum") >= col("med_rank"), col("v"))).as("median_cents"),
        min(when(col("cum") >= col("lo_rank"), col("v"))).as("ci_lo_cents"),
        min(when(col("cum") >= col("hi_rank"), col("v"))).as("ci_hi_cents"))
      .select(col("n"), col("med_rank"), col("lo_rank"), col("hi_rank"),
        col("median_cents"), col("ci_lo_cents"), col("ci_hi_cents"))
  }

  /** q342: CAPTURE–RECAPTURE population estimate (Chapman's
    * bias-corrected Lincoln–Petersen) — the "how big is the thing I
    * can only sample?" estimator (dedup pipelines use exactly this to
    * estimate TOTAL duplicates from two independent samples' overlap;
    * ecology tags fish): two deterministic md5 "captures" of the
    * customer table, N̂ = (n₁+1)(n₂+1)/(m+1) − 1 with its variance,
    * the true N beside it.
    *
    * Determinism: capture membership is a pure md5-byte predicate;
    * n₁/n₂/m/N are integer censuses; N̂ = (n₁+1)(n₂+1) div (m+1) − 1
    * is EXACT integer arithmetic (Chapman's form divides cleanly),
    * variance one double chain. Scale: one scan, two predicate
    * counts — the estimator is census arithmetic.
    */
  def q342CaptureRecapture(spark: SparkSession, dir: String): DataFrame = {
    val marked = Tables.customer(spark, dir).select(
      conv(substring(md5(col("c_custkey").cast("string")), 1, 2), 16, 10)
        .cast("long").as("b1"),
      conv(substring(md5(concat(lit("r|"), col("c_custkey").cast("string"))), 1, 2),
        16, 10).cast("long").as("b2"))
      .select((col("b1") < 96).cast("long").as("in1"),
        (col("b2") < 96).cast("long").as("in2"))
    marked.agg(count(lit(1)).as("n_true"),
        sum("in1").as("n1"), sum("in2").as("n2"),
        sum(col("in1") * col("in2")).as("m"))
      .select(col("n_true"), col("n1"), col("n2"), col("m"),
        expr("(n1 + 1) * (n2 + 1) div (m + 1) - 1").as("n_hat"),
        round(expr(
          """CAST((n1 + 1) * (n2 + 1) AS DOUBLE) * CAST(n1 - m AS DOUBLE)
            |* CAST(n2 - m AS DOUBLE)
            |/ (CAST(m + 1 AS DOUBLE) * CAST(m + 1 AS DOUBLE)
            |   * CAST(m + 2 AS DOUBLE))"""
            .stripMargin.replace("\n", " ")), 4).as("var_hat"))
  }

  /** q344: NEGATIVE-BINOMIAL moment fit — the model q334's verdict
    * points at (overdispersed counts reject Poisson; the NB is the
    * standard two-parameter replacement, and method-of-moments gives
    * r = m²/(s²−m), p = m/s² in closed form): per event type, fitted
    * from the same exact per-user count moments.
    *
    * Determinism: moments are q334's BIGINTs; r̂/p̂ are fixed double
    * chains, with the underdispersed case (s² ≤ m, NB undefined)
    * surfaced as NULLs rather than garbage. Scale: identical to q334.
    */
  def q344NegBinomialFit(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("c"))
    perUser.groupBy("event_type")
      .agg(count(lit(1)).as("n_users"), sum("c").as("s1"),
        sum(col("c") * col("c")).as("s2"))
      .withColumn("mean_c", expr("CAST(s1 AS DOUBLE) / CAST(n_users AS DOUBLE)"))
      .withColumn("var_c", expr(
        "(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) " +
          "/ CAST(n_users AS DOUBLE)) / (CAST(n_users AS DOUBLE) - 1.0)"))
      .select(col("event_type"), col("n_users"),
        round(col("mean_c"), 6).as("mean_c"),
        round(col("var_c"), 6).as("var_c"),
        round(when(col("var_c") > col("mean_c"),
          col("mean_c") * col("mean_c") / (col("var_c") - col("mean_c"))), 6)
          .as("r_hat"),
        round(when(col("var_c") > col("mean_c"),
          col("mean_c") / col("var_c")), 6).as("p_hat"))
      .orderBy("event_type")
  }

  /** q347: WILSON-SCORE ranking — "sort by confidence, not by rate"
    * (the Reddit/Evan-Miller best-comment fix; a 100%-positive item
    * with n=3 must NOT outrank a 96% item with n=500): parts ranked by
    * the Wilson lower bound of their non-return rate over lineitem,
    * n ≥ 20, top-10.
    *
    * Determinism: (n, successes) are exact integers; the Wilson chain
    * is one fixed double expression per part; the top-10 cut orders by
    * (rounded bound desc, partkey) through TakeOrdered. Scale: one
    * partial+final agg to the per-part census, bounded heaps for the
    * cut — no sort of the fact table.
    */
  def q347WilsonRanking(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") =!= "R", 1L).otherwise(0L)).as("succ"))
      .filter(col("n") >= 20)
    val z = 1.959964
    val lb = expr(
      s"""(CAST(succ AS DOUBLE) / CAST(n AS DOUBLE)
         |+ $z * $z / (2.0 * CAST(n AS DOUBLE))
         |- $z * sqrt((CAST(succ AS DOUBLE) / CAST(n AS DOUBLE)
         |             * (1.0 - CAST(succ AS DOUBLE) / CAST(n AS DOUBLE))
         |             + $z * $z / (4.0 * CAST(n AS DOUBLE)))
         |            / CAST(n AS DOUBLE)))
         |/ (1.0 + $z * $z / CAST(n AS DOUBLE))"""
        .stripMargin.replace("\n", " "))
    per.withColumn("wilson_lb", round(lb, 6))
      .select(col("l_partkey"), col("n"), col("succ"),
        expr("succ * 1000000L div n").as("succ_rate_ppm"), col("wilson_lb"))
      .orderBy(col("wilson_lb").desc, col("l_partkey").asc)
      .limit(10)
  }

  /** q348: HISTOGRAM-BASED join cardinality estimation — what a
    * cost-based optimizer DOES with q335's artifact (q244 estimates
    * join size with CMS sketches; the classic CBO path is aligned
    * equi-depth histograms and the per-bucket containment formula
    * |A_b|·|B_b| / max(ndv_A, ndv_B) — Selinger '79 descendants all
    * the way to Spark's own JoinEstimation): orders ⋈ customer on
    * custkey, 8 buckets cut on the dimension side, per-bucket
    * estimates beside the TRUE join size and the total error.
    *
    * Determinism: cuts are census-rank lookups; per-bucket counts,
    * NDVs, the integer estimate, and the actual are all BIGINTs.
    * Scale: two key censuses + one broadcast of 8 cuts; the actual is
    * one count over the real join — the row prices how wrong the
    * estimate is for THIS key distribution.
    */
  def q348JoinCardEstimate(spark: SparkSession, dir: String): DataFrame = {
    val dimCensus = Tables.customer(spark, dir)
      .select(col("c_custkey").as("v")).groupBy("v").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint()
    val tot = dimCensus.agg(sum("cnt").as("n"))
    val cutAggs = (1 to 8).map(j =>
      min(when(col("cum") * 8 >= col("n") * j, col("v"))).as(s"c$j"))
    val cuts = dimCensus.crossJoin(broadcast(tot))
      .groupBy("n").agg(cutAggs.head, cutAggs.tail: _*)
      .drop("n")
    def bucketed(df: DataFrame, key: String): DataFrame =
      df.select(col(key).as("v")).crossJoin(broadcast(cuts))
        .withColumn("bucket",
          when(col("v") <= col("c1"), 1L).when(col("v") <= col("c2"), 2L)
            .when(col("v") <= col("c3"), 3L).when(col("v") <= col("c4"), 4L)
            .when(col("v") <= col("c5"), 5L).when(col("v") <= col("c6"), 6L)
            .when(col("v") <= col("c7"), 7L).otherwise(8L))
        .groupBy("bucket")
        .agg(count(lit(1)).as("rows"), countDistinct("v").as("ndv"))
    val a = bucketed(Tables.orders(spark, dir), "o_custkey")
      .withColumnRenamed("rows", "na").withColumnRenamed("ndv", "ndv_a")
    val b = bucketed(Tables.customer(spark, dir), "c_custkey")
      .withColumnRenamed("rows", "nb").withColumnRenamed("ndv", "ndv_b")
    val per = a.join(b, Seq("bucket"), "full")
      .select(col("bucket"),
        coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"),
        coalesce(col("ndv_a"), lit(0L)).as("ndv_a"),
        coalesce(col("ndv_b"), lit(0L)).as("ndv_b"))
      .withColumn("est_b",
        expr("na * nb div greatest(ndv_a, ndv_b, 1L)"))
    val actual = Tables.orders(spark, dir).join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .agg(count(lit(1)).as("actual"))
    val totals = per.agg(sum("est_b").as("est_total"))
      .crossJoin(broadcast(actual))
      .select(col("est_total"), col("actual"),
        expr("abs(est_total - actual) * 1000000L div actual").as("err_ppm"))
    per.crossJoin(broadcast(totals))
      .select(col("bucket"), col("na"), col("nb"), col("ndv_a"), col("ndv_b"),
        col("est_b"), col("est_total"), col("actual"), col("err_ppm"))
      .orderBy("bucket")
  }

  /** q350: SLO MULTI-WINDOW BURN-RATE alerts — the Google-SRE-workbook
    * alerting rule (a single-window error-rate alert is either noisy
    * or slow; the standard fix pages only when a SHORT and a LONG
    * window both burn the error budget fast): against a 20% error-SLO
    * over the event stream, every 6-hour bucket reports its own burn
    * rate and its UTC day's burn rate, with page (both ≥ 1.2×) and
    * ticket (both ≥ 1.05×) decisions.
    *
    * Determinism: burn = rate/SLO = 5·errors/total on the 10⁻⁶
    * integer grid (err·5·10⁶ div n) — every number and both flags are
    * exact integers. Scale: two bucket censuses and a census join —
    * the monitor is O(windows), which is why burn-rate alerting is
    * cheap enough to run on everything.
    */
  def q350SloBurnRate(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      expr("unix_micros(ts) div 21600000000").as("b6"),
      expr("unix_micros(ts) div 86400000000").as("day"),
      when(col("event_type") === "error", 1L).otherwise(0L).as("err"))
    val short = ev.groupBy("b6", "day")
      .agg(count(lit(1)).as("n6"), sum("err").as("e6"))
      .withColumn("burn6_u", expr("e6 * 5000000L div n6"))
    val long = ev.groupBy("day")
      .agg(count(lit(1)).as("n24"), sum("err").as("e24"))
      .withColumn("burn24_u", expr("e24 * 5000000L div n24"))
    short.join(long, "day")
      .select(col("b6"), col("day"), col("n6"), col("e6"), col("burn6_u"),
        col("n24"), col("e24"), col("burn24_u"),
        (col("burn6_u") >= 1200000L && col("burn24_u") >= 1200000L)
          .cast("long").as("page"),
        (col("burn6_u") >= 1050000L && col("burn24_u") >= 1050000L)
          .cast("long").as("ticket"))
      .orderBy("b6")
  }

  /** q354: HIGHER-MOMENT profiling (skewness + excess kurtosis) — the
    * distribution-shape columns a feature store keeps beside q03's
    * mean/std (heavy tails and asymmetry decide transform choices and
    * break normal-theory monitors; q334 tests ONE shape hypothesis,
    * this measures shape directly): per event type over the
    * whole-dollar value grid, population g₁ = m₃/m₂^1.5 and
    * g₂ = m₄/m₂² − 3 from exact integer power sums.
    *
    * Determinism: Σv..Σv⁴ are exact BIGINTs on the dollar grid
    * (v ≤ 500 keeps Σv⁴ < 2⁶³ at any fixture SF — the grid choice IS
    * the overflow budget, documented); the central-moment chains are
    * fixed expressions both engines evaluate identically — never
    * Spark's `skewness()` float aggregate, whose partition order
    * reassociates. Scale: one partial+final agg; four extra integer
    * columns ride the same scan.
    */
  def q354HigherMoments(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(spark, dir).select(col("event_type"),
      expr("floor(value * 100.0 + 0.5) div 100").cast("long").as("v"))
    val sums = base.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum("v").as("s1"),
      sum(col("v") * col("v")).as("s2"),
      sum(col("v") * col("v") * col("v")).as("s3"),
      sum(col("v") * col("v") * col("v") * col("v")).as("s4"))
    val m = "CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)"
    val m2 = s"(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - $m * $m)"
    val m3 = s"(CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) - 3.0 * $m * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) + 2.0 * $m * $m * $m)"
    val m4 = s"(CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) - 4.0 * $m * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)) + 6.0 * $m * $m * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) - 3.0 * $m * $m * $m * $m)"
    sums.select(col("event_type"), col("n"), col("s1"), col("s2"),
        col("s3"), col("s4"),
        round(expr(s"$m3 / ($m2 * sqrt($m2))"), 6).as("skewness"),
        round(expr(s"$m4 / ($m2 * $m2) - 3.0"), 6).as("excess_kurtosis"))
      .orderBy("event_type")
  }

  /** q358: BROWN–FORSYTHE homogeneity-of-variance test (Levene's test
    * with the MEDIAN center — the robust default every ANOVA sanity
    * check runs first): are order totals equally dispersed across the
    * five order priorities? One-way F on the absolute deviations from
    * each group's median. Completes the experiment-stats shelf: q176
    * compares MEANS (Welch t), q316 compares DISTRIBUTIONS
    * (Kruskal–Wallis), q334 tests a dispersion RATIO on counts — this
    * is the k-group VARIANCE test proper, the gate a pooled-variance
    * analysis (q176's equal-var cousin, q252's power formula) has to
    * pass before its σ² is meaningful.
    *
    * Determinism: medians are census-rank lookups on the cents grid;
    * deviations ride the integer DOLLAR grid (cents would overflow
    * Σz² at scale); the only non-integers are the Σ²/n terms, snapped
    * to the unit grid with ⌊x+0.5⌋ BEFORE the cross-group sums (the
    * q319 device — group addition order can't reorder a float), so F
    * is one fixed double chain over exact BIGINTs. Scale: one shuffle
    * to the (priority, cents) census; every window is census-sized;
    * the moment pass is a partial+final agg on 5 keys.
    */
  def q358BrownForsythe(spark: SparkSession, dir: String): DataFrame = {
    val x = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("priority"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("v"))
    val census = x.groupBy("priority", "v").agg(count(lit(1)).as("cnt"))
    val cc = census.withColumn("cum",
      sum("cnt").over(Window.partitionBy("priority").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ng = census.groupBy("priority").agg(sum("cnt").as("n"))
    val med = cc.join(ng, Seq("priority"))
      .filter(col("cum") * 2 >= col("n") + 1)
      .groupBy("priority").agg(min("v").as("med"))
    val z = x.join(med, Seq("priority"))
      .select(col("priority"), expr("abs(v - med) div 100").as("z"))
    val mom = z.groupBy("priority")
      .agg(count(lit(1)).as("n"), sum("z").as("s"), sum(col("z") * col("z")).as("q"))
      .withColumn("tu", floor(col("s").cast("double") * col("s").cast("double") /
        col("n").cast("double") + 0.5).cast("long"))
    val tot = mom.agg(sum("n").as("nn"), sum("s").as("ss"),
        sum("tu").as("st"), sum("q").as("sq"), count(lit(1)).as("k"))
      .withColumn("b", col("st") - floor(col("ss").cast("double") *
        col("ss").cast("double") / col("nn").cast("double") + 0.5).cast("long"))
      .withColumn("d", col("sq") - col("st"))
    mom.join(med, Seq("priority")).crossJoin(broadcast(tot))
      .select(col("priority"), col("n"),
        (col("med").cast("double") / 100.0).as("median_price"),
        round(col("s").cast("double") / col("n").cast("double"), 2).as("mean_absdev"),
        round(col("b").cast("double") / col("d").cast("double") *
          ((col("nn") - col("k")).cast("double") / (col("k") - 1).cast("double")), 6)
          .as("f_stat"),
        (col("k") - 1).as("df1"), (col("nn") - col("k")).as("df2"))
      .orderBy("priority")
  }

  /** q360: RANDOMIZATION (permutation) TEST on the BUILDING-vs-MACHINERY
    * mean order total — the assumption-free significance check beside
    * the parametric t (q176), the rank test (q203), and the bootstrap CI
    * (q233): re-label every order 200 times with a deterministic md5
    * coin, recompute the mean difference under each re-labeling, and
    * report how often chance alone beats the observed gap. (The
    * unconditional-randomization variant: labels are i.i.d. coins, so
    * group sizes vary per replicate — standard, and the only version
    * with a cross-engine-exact deterministic coin.)
    *
    * Determinism: replicate b's coin is bit (b mod 60) of the 60-bit
    * md5 word md5(key, b div 60); every per-replicate
    * statistic is the identical (Σ_A/n_A − Σ_B/n_B) double chain on
    * exact integer sums, so the ≥-comparison against the observed gap
    * is decided identically in both engines. Scale: the 200× explode is
    * the algorithm (one pass, 200 accumulators); the partial agg
    * absorbs it map-side and only 200 groups shuffle — the classic
    * "replicate id rides the row" Monte-Carlo shape.
    */
  def q360PermutationTest(spark: SparkSession, dir: String): DataFrame = {
    val reps = 200
    val base = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir)
          .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY")),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey").as("k"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("v"),
        (col("c_mktsegment") === "BUILDING").cast("long").as("grp"))
      .localCheckpoint()
    val obs = base.agg(
        sum(when(col("grp") === 1, col("v"))).as("sa"),
        sum(col("grp")).as("na"),
        sum(when(col("grp") === 0, col("v"))).as("sb"),
        sum(lit(1L) - col("grp")).as("nb"))
      .select((col("sa").cast("double") / col("na").cast("double") -
        col("sb").cast("double") / col("nb").cast("double")).as("obs_diff"))
    // 200 coins from FOUR per-row 60-bit md5 words, hashed BEFORE the
    // explode — the naive md5(k, b) per replicate recomputes the digest
    // 200× per row (measured 10.5 s at sf0.1), and hex-digit indexing
    // keeps string ops in the 30M-row inner loop (4.9 s); extracting
    // bit (b mod 60) of word (b div 60) makes the exploded projection
    // pure long arithmetic
    val hashed = base.withColumn("hs", array((0 until 4).map(h =>
      conv(substring(md5(concat_ws("_", col("k"), lit(h))), 1, 15), 16, 10)
        .cast("long")): _*))
    val rep = hashed
      .select(col("v"), col("hs"), explode(expr(s"sequence(0, ${reps - 1})")).as("b"))
      .withColumn("ra", (expr(
        "shiftright(element_at(hs, CAST(b div 60 AS INT) + 1), " +
          "CAST(b % 60 AS INT))") % 2 === 0).cast("long"))
      .groupBy("b").agg(
        sum(when(col("ra") === 1, col("v"))).as("sa"), sum("ra").as("na"),
        sum(when(col("ra") === 0, col("v"))).as("sb"),
        sum(lit(1L) - col("ra")).as("nb"))
      .select(col("b"), (col("sa").cast("double") / col("na").cast("double") -
        col("sb").cast("double") / col("nb").cast("double")).as("d"))
    rep.crossJoin(broadcast(obs))
      .agg(count(lit(1)).as("b_reps"),
        sum(when(abs(col("d")) >= abs(col("obs_diff")), 1L).otherwise(0L))
          .as("n_extreme"))
      .crossJoin(broadcast(obs))
      .select(round(col("obs_diff") / 100.0, 4).as("obs_diff"),
        col("b_reps"), col("n_extreme"),
        expr("n_extreme * 1000000L div b_reps").as("p_value_ppm"))
  }

  /** q361: LOGISTIC REGRESSION, one exact Newton step — the linear
    * classifier proper for the supervised shelf (q151 scores with fixed
    * weights, q319 is naive Bayes, q336 a single stump): predict
    * urgent/high priority from (total price, line count). From β = 0
    * the Newton step has a CLOSED FORM — H = ¼XᵀX and g = Xᵀ(y−½), so
    * β₁ = 2·(XᵀX)⁻¹·(2Xᵀy − Σx) with EVERY matrix entry an exact
    * BIGINT moment — which makes the usually-iterative IRLS fit
    * oracle-gateable bit-exactly: the 3×3 inverse is a fixed adjugate/
    * determinant double chain on identical integers in both engines.
    *
    * Scoring rides the (f1, f2, y) CELL CENSUS (≤ a few hundred cells):
    * decisions are sign(βᵀx) on identical doubles; log-loss is snapped
    * to micro-nats per CELL (the q319 device) so engine summation order
    * never touches a float. Scale: one partial+final census agg, a
    * 1-row broadcast of β, census-local scoring — the data-sized pass
    * is moment collection, exactly how distributed GLM fitting shards.
    */
  def q361LogisticNewton(spark: SparkSession, dir: String): DataFrame = {
    val lc = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("f2"))
    val base = Tables.orders(spark, dir)
      .join(lc, col("o_orderkey") === col("l_orderkey"))
      .select(
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long").as("y"),
        expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) div 1000000").as("f1"),
        col("f2"))
    val cells = base.groupBy("f1", "f2", "y").agg(count(lit(1)).as("nc"))
      .localCheckpoint()
    val beta = cells.agg(
        sum("nc").as("n"),
        sum(col("nc") * col("f1")).as("s1"),
        sum(col("nc") * col("f2")).as("s2"),
        sum(col("nc") * col("f1") * col("f1")).as("s11"),
        sum(col("nc") * col("f1") * col("f2")).as("s12"),
        sum(col("nc") * col("f2") * col("f2")).as("s22"),
        sum(col("nc") * col("y")).as("sy"),
        sum(col("nc") * col("y") * col("f1")).as("sy1"),
        sum(col("nc") * col("y") * col("f2")).as("sy2"))
      .selectExpr("n", "sy AS n_pos",
        "CAST(n AS DOUBLE) AS a11", "CAST(s1 AS DOUBLE) AS a12",
        "CAST(s2 AS DOUBLE) AS a13", "CAST(s11 AS DOUBLE) AS a22",
        "CAST(s12 AS DOUBLE) AS a23", "CAST(s22 AS DOUBLE) AS a33",
        "CAST(2 * sy - n AS DOUBLE) AS g1",
        "CAST(2 * sy1 - s1 AS DOUBLE) AS g2",
        "CAST(2 * sy2 - s2 AS DOUBLE) AS g3")
      .selectExpr("n", "n_pos", "g1", "g2", "g3",
        "a11 * (a22 * a33 - a23 * a23) - a12 * (a12 * a33 - a23 * a13) + a13 * (a12 * a23 - a22 * a13) AS det",
        "(a22 * a33 - a23 * a23) AS c11", "(a13 * a23 - a12 * a33) AS c12",
        "(a12 * a23 - a13 * a22) AS c13", "(a11 * a33 - a13 * a13) AS c22",
        "(a12 * a13 - a11 * a23) AS c23", "(a11 * a22 - a12 * a12) AS c33")
      .selectExpr("n", "n_pos",
        "2.0 * (c11 * g1 + c12 * g2 + c13 * g3) / det AS b0",
        "2.0 * (c12 * g1 + c22 * g2 + c23 * g3) / det AS b1",
        "2.0 * (c13 * g1 + c23 * g2 + c33 * g3) / det AS b2")
      .localCheckpoint()
    cells.crossJoin(broadcast(beta))
      .withColumn("z", expr("b0 + b1 * CAST(f1 AS DOUBLE) + b2 * CAST(f2 AS DOUBLE)"))
      .withColumn("pred", (col("z") > 0.0).cast("long"))
      .withColumn("loss_u", expr(
        "CAST(floor(CASE WHEN y = 1 THEN ln(1.0 + exp(-z)) " +
          "ELSE ln(1.0 + exp(z)) END * 1000000.0 + 0.5) AS BIGINT)"))
      .groupBy("n", "n_pos", "b0", "b1", "b2")
      .agg(sum(when(col("pred") === 1, col("nc"))).as("n_pred_pos"),
        sum(when(col("pred") === col("y"), col("nc")).otherwise(0L)).as("n_correct"),
        sum(col("nc") * col("loss_u")).as("tot_loss_u"))
      .select(col("n"), col("n_pos"),
        round(col("b0"), 6).as("beta0"), round(col("b1"), 6).as("beta1"),
        round(col("b2"), 6).as("beta2"),
        col("n_pred_pos"),
        expr("n_correct * 1000000L div n").as("accuracy_ppm"),
        expr("tot_loss_u div n").as("mean_loss_unats"))
  }

  /** q364: BINARYFILE SOURCE — the ingestion path OPAQUE media blobs
    * enter Spark by (`format("binaryFile")`: one row per file with
    * path/length/content), exercised end-to-end: the first 64 documents
    * are laid out as one file per doc under a `doc_id=N/` partition
    * tree (the at-rest layout a blob store actually has), read back
    * through the binaryFile source WITH partition-column discovery and
    * `pathGlobFilter` pushdown, and certified content-exact by md5
    * AGAINST THE TABLE (the oracle recomputes each digest from
    * `documents.text` — so the gate proves byte-lossless write→read,
    * not just row counts). Completes the source matrix beside
    * CSV/JSON (q56) and ORC (q116), and is the front door of the
    * multimodal shelf (q52/q108/…): image/audio bytes arrive exactly
    * this way before any decode kernel runs.
    *
    * Scale: one file per row is the blob-store reality; the source
    * lists partitions in parallel, the glob filter prunes at listing
    * time, and partition values come from paths — no content parse.
    * The temp tree is deleted after materialization (the q257-family
    * hygiene).
    */
  def q364BinaryfileSource(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("q364_blobs")
    Tables.documentsSpread(spark, dir)
      .filter(col("doc_id") < 64)
      .select(col("doc_id"), col("text"))
      .repartition(8, col("doc_id"))
      .write.mode("overwrite").partitionBy("doc_id").text(root.toString)
    val out = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.txt")
      .load(root.toString)
      .select(col("doc_id").cast("long").as("doc_id"),
        col("length").as("n_bytes"), md5(col("content")).as("content_md5"))
      .orderBy("doc_id")
      .localCheckpoint()
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles(); if (kids != null) kids.foreach(rm); f.delete(); ()
    }
    rm(root.toFile)
    out
  }

  /** q365: GRANGER-STYLE PREDICTIVE F TEST on the daily click→view
    * series — "does yesterday's CLICK volume improve today's VIEW
    * forecast beyond VIEW's own history?": restricted AR(1)
    * (y_t ~ y_{t−1}) vs augmented (y_t ~ y_{t−1} + x_{t−1}), F on the
    * SSE drop. The lead-lag shelf (q206 lead/lag, q284 ACF, q294 CCF)
    * measures association; this is the predictive-incrementality test
    * people actually mean by "does X lead Y". Both fits are closed-form
    * OLS: the restricted 2-param solve and q361's 3×3 adjugate, every
    * moment an exact BIGINT on the daily DOLLAR grid (cents would
    * overflow Σy·y_l at corpus scale), F/β one fixed chain each.
    * Scale: one shuffle to the (type, day) census; the lag windows and
    * the 9-moment agg run on ~month-sized census rows.
    */
  def q365GrangerTest(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .groupBy("event_type", "day")
      .agg(expr("sum(cents) div 100").as("d"))
    val joined = daily.filter(col("event_type") === "view")
      .select(col("day"), col("d").as("y"))
      .join(daily.filter(col("event_type") === "click")
        .select(col("day"), col("d").as("x")), Seq("day"))
    val w = Window.orderBy("day")
    val lagged = joined
      .withColumn("yl", lag("y", 1).over(w))
      .withColumn("xl", lag("x", 1).over(w))
      .filter(col("yl").isNotNull && col("xl").isNotNull)
    lagged.agg(
        count(lit(1)).as("n"), sum("y").as("sy"), sum("yl").as("s1"),
        sum("xl").as("s2"), sum(col("yl") * col("yl")).as("s11"),
        sum(col("yl") * col("xl")).as("s12"),
        sum(col("xl") * col("xl")).as("s22"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("y") * col("yl")).as("sy1"),
        sum(col("y") * col("xl")).as("sy2"))
      .selectExpr("n", "sy", "syy", "sy1", "sy2",
        "CAST(n AS DOUBLE) AS a11", "CAST(s1 AS DOUBLE) AS a12",
        "CAST(s2 AS DOUBLE) AS a13", "CAST(s11 AS DOUBLE) AS a22",
        "CAST(s12 AS DOUBLE) AS a23", "CAST(s22 AS DOUBLE) AS a33")
      .selectExpr("n", "sy", "syy", "sy1", "sy2", "a11", "a12", "a13", "a22", "a33",
        // restricted y ~ (1, yl): slope/intercept/SSE off the moments
        "(a11 * CAST(sy1 AS DOUBLE) - a12 * CAST(sy AS DOUBLE)) / (a11 * a22 - a12 * a12) AS br",
        "a11 * (a22 * a33 - a23 * a23) - a12 * (a12 * a33 - a23 * a13) + a13 * (a12 * a23 - a22 * a13) AS det",
        "(a22 * a33 - a23 * a23) AS c11", "(a13 * a23 - a12 * a33) AS c12",
        "(a12 * a23 - a13 * a22) AS c13", "(a11 * a33 - a13 * a13) AS c22",
        "(a12 * a13 - a11 * a23) AS c23", "(a11 * a22 - a12 * a12) AS c33")
      .selectExpr("n", "syy", "sy", "sy1", "sy2", "br", "det",
        "(CAST(sy AS DOUBLE) - br * a12) / a11 AS ar",
        "(c11 * CAST(sy AS DOUBLE) + c12 * CAST(sy1 AS DOUBLE) + c13 * CAST(sy2 AS DOUBLE)) / det AS b0",
        "(c12 * CAST(sy AS DOUBLE) + c22 * CAST(sy1 AS DOUBLE) + c23 * CAST(sy2 AS DOUBLE)) / det AS b1",
        "(c13 * CAST(sy AS DOUBLE) + c23 * CAST(sy1 AS DOUBLE) + c33 * CAST(sy2 AS DOUBLE)) / det AS b2")
      .selectExpr("n", "b1", "b2",
        "CAST(syy AS DOUBLE) - ar * CAST(sy AS DOUBLE) - br * CAST(sy1 AS DOUBLE) AS sse_r",
        "CAST(syy AS DOUBLE) - (b0 * CAST(sy AS DOUBLE) + b1 * CAST(sy1 AS DOUBLE) + b2 * CAST(sy2 AS DOUBLE)) AS sse_f")
      .selectExpr("n",
        "round(b1, 6) AS beta_ylag", "round(b2, 6) AS beta_xlag",
        "round(sse_r, 2) AS sse_restricted", "round(sse_f, 2) AS sse_full",
        "round((sse_r - sse_f) * CAST(n - 3 AS DOUBLE) / sse_f, 6) AS f_stat")
  }

  /** q367: PRECISION–RECALL CURVE + AVERAGE PRECISION — the evaluation
    * standard for IMBALANCED classes, beside q263's ROC/AUC on the very
    * same (score, label) pairs (purchase vs rest on the cents grid):
    * ROC's FPR denominator is the huge negative class, so it flatters a
    * rare-positive detector; AP = Σ ΔR·P weights by the positives and
    * is what retrieval/safety-filter evals report. Stepwise AP over
    * distinct score thresholds descending (the sklearn definition),
    * with a 10-ish-point PR polyline by $5 score bands alongside.
    *
    * Determinism: the whole curve lives on the score CENSUS; each AP
    * term is the exact integer np·cp·10⁶ div cc (grid semantics stated,
    * no float crosses a summation), and AP is ONE divide at the end.
    * Scale: q263's discipline — one shuffle to the census, windows and
    * bands census-sized.
    */
  def q367PrCurve(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir).select(
      floor(col("value") * 100.0 + 0.5).cast("long").as("sc"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
    // NOT checkpointed: the unpartitioned census windows below are
    // admissible exactly because PlanGuards can see this aggregate
    // bounding them (a checkpoint would erase that provenance)
    val census = ev.groupBy("sc").agg(
      sum("pos").as("np"), count(lit(1)).as("nc"))
    val wDesc = Window.orderBy(col("sc").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = census
      .withColumn("cp", sum("np").over(wDesc))
      .withColumn("cc", sum("nc").over(wDesc))
    val tot = census.agg(sum("np").as("p"))
    // the per-term product rides DECIMAL(38,0) — np·cp·10⁶ is a
    // positives²-scale integer that wraps BIGINT around sf100 (the
    // q421/q447 class the round-17 sf1 sweep caught; each term after
    // the div is ≤ np·10⁶, so the SUM stays comfortably BIGINT)
    val ap = cum.agg(sum(expr("CAST(np AS DECIMAL(38,0)) * cp * 1000000 div cc")).as("ap_u"))
      .crossJoin(broadcast(tot))
      .select((col("ap_u").cast("double") /
        (col("p").cast("double") * 1000000.0)).as("avg_precision"))
    cum.withColumn("band", expr("sc div 500"))
      .groupBy("band").agg(max("cp").as("bp"), max("cc").as("bc"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(ap))
      .select(col("band"), (col("band") * 5.0).as("thr_usd"),
        (col("bp").cast("double") / col("bc").cast("double")).as("precision"),
        (col("bp").cast("double") / col("p").cast("double")).as("recall"),
        col("avg_precision"))
      .orderBy("band")
  }

  /** q369: PARTIAL AUTOCORRELATION (lags 1–3) via Durbin–Levinson —
    * the model-identification companion to q284's ACF over the same
    * daily-count series: ACF says "correlated at lag k", PACF says
    * "correlated at lag k AFTER removing the shorter lags", which is
    * what picks AR order (the ACF/PACF pair is how every forecasting
    * text starts). φ11 = ρ1; φ22, φ33 from the DL recursion — pure
    * fixed chains over the SNAPPED ρ grid (q284's ⌊ρ·10⁶+0.5⌋/10⁶
    * device makes the inputs bit-identical first, so the recursion
    * never sees an engine-ordered float). Scale: q284's shape — one
    * day census, 3-lag self-join on census rows, 1-row chains.
    */
  def q369Pacf(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
    val tot = days.agg(count(lit(1)).as("nd"), sum("y").as("s"))
    val c = days.crossJoin(broadcast(tot))
      .select(col("day"), (col("nd") * col("y") - col("s")).as("cy"))
      .localCheckpoint()
    val den = c.agg(sum(col("cy") * col("cy")).as("den"))
    val lagged = spark.range(1, 4).select(col("id").as("lag"))
      .crossJoin(c.select(col("day").as("d0"), col("cy").as("cy0")))
      .select(col("lag"), (col("d0") + col("lag")).as("day"), col("cy0"))
    val rho = c.join(lagged, "day")
      .groupBy("lag").agg(sum(col("cy") * col("cy0")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"),
        (floor((col("num").cast("double") / col("den").cast("double")) *
          1000000.0 + 0.5) / 1000000.0).as("r"))
      .agg(max(when(col("lag") === 1, col("r"))).as("r1"),
        max(when(col("lag") === 2, col("r"))).as("r2"),
        max(when(col("lag") === 3, col("r"))).as("r3"))
    rho
      .withColumn("p22", (col("r2") - col("r1") * col("r1")) /
        (lit(1.0) - col("r1") * col("r1")))
      .withColumn("p21", col("r1") - col("p22") * col("r1"))
      .withColumn("p33",
        (col("r3") - col("p21") * col("r2") - col("p22") * col("r1")) /
          (lit(1.0) - col("p21") * col("r1") - col("p22") * col("r2")))
      .select(explode(array(
        struct(lit(1L).as("lag"), round(col("r1"), 6).as("pacf")),
        struct(lit(2L).as("lag"), round(col("p22"), 6).as("pacf")),
        struct(lit(3L).as("lag"), round(col("p33"), 6).as("pacf")))).as("o"))
      .select(col("o.lag").as("lag"), col("o.pacf").as("pacf"))
      .orderBy("lag")
  }

  /** q370: COOK'S DISTANCE + leverage — per-observation influence
    * diagnostics for the simple OLS of order total (dollars) on line
    * count: which orders would move the fitted line most if deleted?
    * The regression shelf fits lines (q172, q297 robustly, q365
    * predictively); this is the diagnostics step a modeler runs next,
    * and the data-quality angle (top-influence rows ≈ label/feature
    * anomalies worth auditing) is why it belongs in a pipeline engine.
    * D_i = e_i²·h_i / (p·s²·(1−h_i)²) with h_i = 1/n + (x−x̄)²/Sxx.
    *
    * Determinism: all moments exact BIGINTs on the dollar grid;
    * slope/intercept/s²/h/D are fixed chains, identical per row in
    * both engines, so the (D desc, orderkey) top-10 cut is exact.
    * Scale: one moment agg broadcast back over the scan; per-row
    * arithmetic is codegen-local; top-10 is a TakeOrdered heap.
    */
  def q370CooksDistance(spark: SparkSession, dir: String): DataFrame = {
    val lc = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("x"))
    val base = Tables.orders(spark, dir)
      .join(lc, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("x"),
        expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) div 100").as("yd"))
    val mom = base.agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"), sum("yd").as("sy"),
        sum(col("x") * col("yd")).as("sxy"),
        sum(col("yd") * col("yd")).as("syy"))
      .selectExpr("n", "sx", "sxx",
        "CAST(n AS DOUBLE) AS nd", "CAST(sx AS DOUBLE) AS sxd",
        "CAST(sxx AS DOUBLE) AS sxxd", "CAST(sy AS DOUBLE) AS syd",
        "CAST(sxy AS DOUBLE) AS sxyd", "CAST(syy AS DOUBLE) AS syyd")
      .selectExpr("n", "nd", "sxd", "sxxd", "syd", "syyd", "sxyd",
        "(nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) AS b",
        "sxxd - sxd * sxd / nd AS sxx_c")
      .selectExpr("n", "nd", "sxd", "sxx_c", "b",
        "(syd - b * sxd) / nd AS a",
        "syyd - ((syd - b * sxd) / nd) * syd - b * sxyd AS sse")
      .selectExpr("nd", "sxd", "sxx_c", "a", "b",
        "sse / (nd - 2.0) AS s2")
      .localCheckpoint()
    base.crossJoin(broadcast(mom))
      .withColumn("h", expr(
        "1.0 / nd + (CAST(x AS DOUBLE) - sxd / nd) * (CAST(x AS DOUBLE) - sxd / nd) / sxx_c"))
      .withColumn("e", expr("CAST(yd AS DOUBLE) - (a + b * CAST(x AS DOUBLE))"))
      .withColumn("d", expr("e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h))"))
      .orderBy(col("d").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("x"), col("yd").as("y_dollars"),
        round(col("h"), 6).as("leverage"), round(col("d"), 6).as("cooks_d"))
  }

  /** q371: WALD–WOLFOWITZ RUNS TEST on the daily-total series — is the
    * sign pattern around the median RANDOM, or does it trend/cluster?
    * The nonparametric randomness screen that catches what mean tests
    * can't (a perfectly mean-stable series that alternates or clusters
    * systematically), the classic pre-check before q271's CUSUM or
    * q318's Mann–Kendall reads too much into a drift. Days above the
    * census median are 1, below are 0, exact-median days drop (the
    * stated convention); R = number of maximal same-sign runs;
    * z = (R − μ_R)/σ_R from the exact run-count moments.
    *
    * Determinism: signs and run boundaries are integer lag compares on
    * the day census under the total day order; μ/σ/z are fixed chains
    * over exact BIGINTs. Scale: one shuffle to the day census;
    * everything after is census-sized.
    */
  def q371RunsTest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // day census NOT checkpointed — the sign/run lag window below is
    // unpartitioned and PlanGuards admits it only because this
    // aggregate is visible bounding it
    val daily = Tables.events(spark, dir)
      .select(expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .groupBy("day").agg(sum("cents").as("dc"))
    val census = daily.groupBy("dc").agg(count(lit(1)).as("cnt"))
    val cc = census.withColumn("cum",
      sum("cnt").over(Window.orderBy("dc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val med = cc.crossJoin(broadcast(census.agg(sum("cnt").as("n"))))
      .filter(col("cum") * 2 >= col("n") + 1)
      .agg(min("dc").as("med"))
    val signed = daily.crossJoin(broadcast(med))
      .filter(col("dc") =!= col("med"))
      .select(col("day"), (col("dc") > col("med")).cast("long").as("s"))
    val runs = signed
      .withColumn("prev", lag("s", 1).over(Window.orderBy("day")))
      .select(
        sum(when(col("prev").isNull || col("prev") =!= col("s"), 1L)
          .otherwise(0L)).as("r"),
        sum("s").as("n1"), sum(lit(1L) - col("s")).as("n2"))
    runs.selectExpr("n1 + n2 AS n_days", "n1 AS n_above", "n2 AS n_below",
        "r AS n_runs",
        "CAST(n1 AS DOUBLE) AS a", "CAST(n2 AS DOUBLE) AS b",
        "CAST(r AS DOUBLE) AS rd")
      .selectExpr("n_days", "n_above", "n_below", "n_runs",
        "2.0 * a * b / (a + b) + 1.0 AS mu",
        "2.0 * a * b * (2.0 * a * b - a - b) / ((a + b) * (a + b) * (a + b - 1.0)) AS v2",
        "rd")
      .selectExpr("n_days", "n_above", "n_below", "n_runs",
        "round(mu, 6) AS mu_runs",
        "round((rd - mu) / sqrt(v2), 6) AS z")
  }

  /** q372: MARKOV CONDITIONAL ENTROPY (sequence entropy rate) — how
    * predictable is the NEXT event type given the current one, per
    * state and overall? q177/q245 publish the transition matrix; this
    * is its one-number summary H(next|cur) = −Σ p(c,n)·ln p(n|c), the
    * sequence-predictability metric behavioral analytics reads (low
    * entropy after 'signup' = funnel discipline; high = noise), and
    * the text-shelf twin of q128/q180's token cross-entropies, over
    * SESSIONS instead of words.
    *
    * Determinism: transitions are (ts, event_id)-ordered lag pairs per
    * user; every log is snapped to micro-nats at the CENSUS cell
    * (q323's device) so H is an exact integer mix. Scale: user-
    * partitioned lag window at the events layout, one census shuffle,
    * then cell-local integer arithmetic.
    */
  def q372MarkovEntropy(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def lnu(c: Column): Column =
      floor(log(c.cast("double")) * 1000000.0 + 0.5).cast("long")
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val trans = Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("event_type").as("cur"))
      .withColumn("nxt", lead("cur", 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy("cur", "nxt").agg(count(lit(1)).as("nxy"))
    val byCur = trans.groupBy("cur").agg(sum("nxy").as("nc"))
    val cells = trans.join(byCur, Seq("cur"))
      .withColumn("t_u", col("nxy") * (lnu(col("nc")) - lnu(col("nxy"))))
    val perCur = cells.groupBy("cur")
      .agg(sum("nxy").as("n_trans"), count(lit(1)).as("n_next"),
        expr("sum(t_u) div sum(nxy)").as("h_u"))
    val overall = cells.agg(
      expr("sum(t_u) div sum(nxy)").as("hall_u"), sum("nxy").as("nall"))
    perCur.crossJoin(broadcast(overall))
      .select(col("cur"), col("n_trans"), col("n_next"),
        (col("h_u").cast("double") / 1000000.0).as("h_cond_nats"),
        (col("hall_u").cast("double") / 1000000.0).as("h_overall_nats"))
      .orderBy("cur")
  }

  /** q373: McNEMAR'S TEST — the PAIRED classifier comparison the
    * eval shelf lacked: q213 scores one model, q263/q367 rank one
    * scorer; when two models score the SAME rows, comparing marginal
    * accuracies wastes the pairing — only the DISCORDANT cells carry
    * evidence. Model A (price above its median) vs model B (≥ 4 line
    * items) predicting urgent/high priority: χ² = (|b−c|−1)²/(b+c)
    * with continuity correction over the b/c discordant census.
    *
    * Determinism: both rules and the 2×2 discordance census are pure
    * integer compares (A's threshold is the exact census median);
    * χ² is one fixed chain. Scale: a census median lookup broadcast
    * over one scan, then a 1-row agg.
    */
  def q373McNemar(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lc = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("nl"))
    val base = Tables.orders(spark, dir)
      .join(lc, col("o_orderkey") === col("l_orderkey"))
      .select(
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long").as("y"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("v"),
        col("nl"))
      .localCheckpoint()
    val census = base.groupBy("v").agg(count(lit(1)).as("cnt"))
    val cc = census.withColumn("cum",
      sum("cnt").over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val med = cc.crossJoin(broadcast(census.agg(sum("cnt").as("n"))))
      .filter(col("cum") * 2 >= col("n") + 1)
      .agg(min("v").as("med"))
    base.crossJoin(broadcast(med))
      .select(col("y"),
        (col("v") > col("med")).cast("long").as("pa"),
        (col("nl") >= 4).cast("long").as("pb"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pa") === col("y"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("pb") === col("y"), 1L).otherwise(0L)).as("cb"),
        sum(when(col("pa") === col("y") && col("pb") =!= col("y"), 1L)
          .otherwise(0L)).as("b"),
        sum(when(col("pa") =!= col("y") && col("pb") === col("y"), 1L)
          .otherwise(0L)).as("c"))
      .selectExpr("n",
        "ca * 1000000L div n AS acc_a_ppm", "cb * 1000000L div n AS acc_b_ppm",
        "b AS a_only_correct", "c AS b_only_correct",
        "round((CAST(abs(b - c) AS DOUBLE) - 1.0) * (CAST(abs(b - c) AS DOUBLE) - 1.0) / CAST(b + c AS DOUBLE), 6) AS chi2")
  }

  /** q374: GRADIENT-BOOSTED STUMPS, two exact rounds — the additive-
    * model step past q361's one-shot linear fit and q336's single
    * stump: round 1 fits the best (feature, split) stump for order
    * total over {line count ≤ s} and {priority rank ≤ s} candidates,
    * round 2 fits a second stump ON THE RESIDUALS, the defining move
    * of boosting. Because the feature spaces are small censuses, the
    * split search is EXHAUSTIVE and exact: score(split) = S_L²/n_L +
    * S_R²/n_R (the SSE-minimizing identity) snapped to the unit grid
    * per candidate, argmax by (score, feature, split) struct-max;
    * predictions are floor-div integer dollar means, so residuals stay
    * integers and round 2 is as exact as round 1.
    *
    * Scale: one census shuffle per round (feature-value cells), split
    * scoring over candidate×cell products of census size, a 1-row
    * broadcast of the chosen stump back over the scan — the shape of
    * distributed histogram-based GBDT (per-feature bin sums, driver
    * picks the split), gated bit-exactly.
    */
  def q374BoostedStumps(spark: SparkSession, dir: String): DataFrame = {
    val lc = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("nl"))
    val base0 = Tables.orders(spark, dir)
      .join(lc, col("o_orderkey") === col("l_orderkey"))
      .select(col("nl"),
        expr("CAST(substr(o_orderpriority, 1, 1) AS BIGINT)").as("pr"),
        expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) div 100").as("y"))
      .localCheckpoint()
    def fitStump(df: DataFrame, ycol: String): DataFrame = {
      def forFeature(f: String, maxSplit: Int): DataFrame = {
        val cells = df.groupBy(col(f).as("v"))
          .agg(count(lit(1)).as("n"), sum(ycol).as("s"))
        cells.crossJoin(
            spark.range(1, maxSplit + 1).select(col("id").as("split")))
          .groupBy("split")
          .agg(sum(when(col("v") <= col("split"), col("n"))).as("nl_"),
            sum(when(col("v") <= col("split"), col("s"))).as("sl"),
            sum(when(col("v") > col("split"), col("n"))).as("nr"),
            sum(when(col("v") > col("split"), col("s"))).as("sr"))
          .filter(col("nl_").isNotNull && col("nr").isNotNull)
          .select(lit(f).as("feature"), col("split"),
            floor(col("sl").cast("double") * col("sl").cast("double") /
              col("nl_").cast("double") +
              col("sr").cast("double") * col("sr").cast("double") /
                col("nr").cast("double") + 0.5).cast("long").as("score_u"),
            // residual sums are SIGNED in round 2: offset-div so
            // Spark's truncating div and DuckDB's flooring // agree
            expr("(sl + 1000000000L * nl_) div nl_ - 1000000000L").as("pred_left"),
            expr("(sr + 1000000000L * nr) div nr - 1000000000L").as("pred_right"))
      }
      forFeature("nl", 6).unionByName(forFeature("pr", 4))
        .agg(max(struct(col("score_u"),
          (-ascii(substring(col("feature"), 1, 1))).as("ford"),
          (-col("split")).as("sord"), col("feature"), col("split"),
          col("pred_left"), col("pred_right"))).as("b"))
        .select(col("b.feature").as("feature"), col("b.split").as("split"),
          col("b.score_u").as("score_u"), col("b.pred_left").as("pred_left"),
          col("b.pred_right").as("pred_right"))
        .localCheckpoint()
    }
    val s1 = fitStump(base0, "y")
    val withR = base0.crossJoin(broadcast(s1))
      .withColumn("pred1", when(
        (col("feature") === "nl" && col("nl") <= col("split")) ||
          (col("feature") === "pr" && col("pr") <= col("split")),
        col("pred_left")).otherwise(col("pred_right")))
      .select(col("nl"), col("pr"), (col("y") - col("pred1")).as("r"),
        col("y"), col("pred1"))
      .localCheckpoint()
    val s2 = fitStump(withR.select(col("nl"), col("pr"), col("r")), "r")
    val fin = withR.crossJoin(broadcast(
        s2.select(col("feature").as("f2"), col("split").as("sp2"),
          col("pred_left").as("pl2"), col("pred_right").as("pr2"))))
      .withColumn("pred2", col("pred1") + when(
        (col("f2") === "nl" && col("nl") <= col("sp2")) ||
          (col("f2") === "pr" && col("pr") <= col("sp2")),
        col("pl2")).otherwise(col("pr2")))
      .agg(count(lit(1)).as("n"),
        expr("sum(abs(y - pred1)) div count(1)").as("mae_round1"),
        expr("sum(abs(y - pred2)) div count(1)").as("mae_round2"))
    s1.select(lit(1L).as("round"), col("feature"), col("split"),
        col("pred_left"), col("pred_right"))
      .unionByName(s2.select(lit(2L).as("round"), col("feature"),
        col("split"), col("pred_left"), col("pred_right")))
      .crossJoin(broadcast(fin))
      .orderBy("round")
  }

  /** q376: HELLINGER DISTANCE / BHATTACHARYYA COEFFICIENT between the
    * two md5-half value distributions per event type — completing the
    * drift-divergence shelf: PSI (q219) is unbounded and
    * zero-bucket-fragile, KL (q93) asymmetric and infinite on escapes,
    * EMD (q220) cares about DISTANCE between buckets; Hellinger is the
    * bounded [0,1] symmetric metric (a true metric, unlike all three)
    * monitoring dashboards threshold when they want comparability
    * across features. BC = Σ√(p·q) with each cell's √ snapped to the
    * 10⁻⁹ grid BEFORE the sum (the q319 discipline), H = √(1−BC).
    *
    * Scale: one shuffle to the (type, bucket, half) census; cell-local
    * integer terms; per-type 1-row chains.
    */
  def q376HellingerDrift(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("floor(value * 100.0 + 0.5) div 500").cast("long").as("bucket"),
        (conv(substring(md5(col("event_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 2).as("half"))
    val cells = ev.groupBy("event_type", "bucket")
      .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("nb"))
    val tots = cells.groupBy("event_type")
      .agg(sum("na").as("ta"), sum("nb").as("tb"), count(lit(1)).as("n_buckets"))
    cells.join(tots, Seq("event_type"))
      .withColumn("bc_u", floor(sqrt(
        (col("na") * col("nb")).cast("double") /
          (col("ta").cast("double") * col("tb").cast("double"))) *
        1.0e9 + 0.5).cast("long"))
      .groupBy("event_type")
      .agg(max("ta").as("n_a"), max("tb").as("n_b"),
        max("n_buckets").as("n_buckets"), sum("bc_u").as("bcs"))
      .select(col("event_type"), col("n_a"), col("n_b"), col("n_buckets"),
        round(col("bcs").cast("double") / 1.0e9, 6).as("bhattacharyya"),
        round(sqrt(greatest(lit(1.0) -
          col("bcs").cast("double") / 1.0e9, lit(0.0))), 6).as("hellinger"))
      .orderBy("event_type")
  }

  /** q377: DATA-EXPECTATIONS SUITE — the dbt-test / Great-Expectations
    * contract run as ONE query: six named rules (key uniqueness,
    * referential integrity, value ranges, domain membership) each
    * report checked/failed counts and a verdict. q175 audits referential
    * integrity and q335/q83 profile columns; this row is the CONTRACT
    * form — a fixed rule list with pass/fail semantics, which is what a
    * pipeline actually gates deploys on. Every rule is a census or
    * anti-join count; the suite is a union of six independent
    * aggregates, each scan-local or one-join.
    */
  def q377ExpectationsSuite(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val cust = Tables.customer(spark, dir)
    val ev = Tables.events(spark, dir)
    def rule(name: String, checked: DataFrame): DataFrame =
      checked.select(lit(name).as("rule"), col("n_checked"), col("n_failed"),
        (col("n_failed") === 0).as("pass"))
    val r1 = rule("orders.o_orderkey unique",
      orders.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
        .agg(sum("c").as("n_checked"),
          sum(when(col("c") > 1, col("c"))).as("nf"))
        .select(col("n_checked"), coalesce(col("nf"), lit(0L)).as("n_failed")))
    val r2 = rule("lineitem.l_orderkey references orders",
      li.join(orders.select(col("o_orderkey").as("k")),
          col("l_orderkey") === col("k"), "left")
        .agg(count(lit(1)).as("n_checked"),
          sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_failed")))
    val r3 = rule("orders.o_totalprice positive",
      orders.agg(count(lit(1)).as("n_checked"),
        sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)).as("n_failed")))
    val r4 = rule("customer.c_mktsegment in domain",
      cust.agg(count(lit(1)).as("n_checked"),
        sum(when(col("c_mktsegment").isin("AUTOMOBILE", "BUILDING",
          "FURNITURE", "HOUSEHOLD", "MACHINERY"), 0L).otherwise(1L))
          .as("n_failed")))
    val r5 = rule("events.value non-negative",
      ev.agg(count(lit(1)).as("n_checked"),
        sum(when(col("value") < 0.0, 1L).otherwise(0L)).as("n_failed")))
    val r6 = rule("events.event_id unique",
      ev.groupBy("event_id").agg(count(lit(1)).as("c"))
        .agg(sum("c").as("n_checked"),
          sum(when(col("c") > 1, col("c"))).as("nf"))
        .select(col("n_checked"), coalesce(col("nf"), lit(0L)).as("n_failed")))
    r1.unionByName(r2).unionByName(r3).unionByName(r4)
      .unionByName(r5).unionByName(r6)
      .orderBy("rule")
  }

  /** q378: INTER-ARRIVAL BURSTINESS B = (σ−μ)/(σ+μ) (Goh & Barabási
    * '08) per event type — are arrivals Poisson-like (B≈0), regular
    * (B→−1), or bursty (B→1)? The point-process summary beside q334's
    * count dispersion: q334 tests VARIANCE OF COUNTS per window, this
    * characterizes the GAP distribution itself, the standard first look
    * at human-activity streams (and at scraper/bot detection — bots
    * are too regular). Gaps are per-user consecutive deltas on the
    * integer MINUTE grid (µs² sums would overflow BIGINT at corpus
    * scale); μ/σ/B are fixed chains over exact moments.
    * Scale: user-partitioned lag at the events layout, one moment agg.
    */
  def q378Burstiness(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type", "user_id").orderBy("us", "event_id")
    val gaps = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(ts)").as("us"), col("event_id"))
      .withColumn("pus", lag("us", 1).over(w))
      .filter(col("pus").isNotNull)
      .select(col("event_type"),
        expr("(us - pus) div 60000000").as("gap_m"))
    gaps.groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"), sum("gap_m").as("s"),
        sum(col("gap_m") * col("gap_m")).as("s2"))
      .selectExpr("event_type", "n_gaps",
        "CAST(n_gaps AS DOUBLE) AS nd", "CAST(s AS DOUBLE) AS sd",
        "CAST(s2 AS DOUBLE) AS s2d")
      .selectExpr("event_type", "n_gaps",
        "sd / nd AS mu", "sqrt(s2d / nd - (sd / nd) * (sd / nd)) AS sig")
      .selectExpr("event_type", "n_gaps",
        "round(mu, 6) AS mean_gap_min", "round(sig, 6) AS sd_gap_min",
        "round((sig - mu) / (sig + mu), 6) AS burstiness")
      .orderBy("event_type")
  }

  /** q379: HILL TAIL-INDEX ESTIMATOR (Hill '75) — how heavy is the
    * upper tail of order totals? H_k = (1/k)·Σ_{i≤k} ln(x_(i)/x_(k+1))
    * over the top-k order statistics, α = 1/H; reported at k =
    * 64/128/256 (the "Hill plot" stability check — α drifting with k
    * means the tail isn't cleanly Pareto). The capacity-planning /
    * revenue-concentration screen beside q204's Benford digit test:
    * α ≤ 2 means variance is infinite and mean-based SLAs lie.
    *
    * Determinism: the top-257 multiset is deterministic even under
    * boundary ties (equal cents ⇒ equal ln terms, whichever copies the
    * heap keeps); each ln snaps to the ⌊ln·10⁶+½⌋ micro-nat BIGINT
    * grid (q264's device) so Σ is order-invariant; H and α are one
    * divide each off the integer numerator k·Σ − k·ln_(k+1).
    * Scale: top-k = TakeOrderedAndProject heap (per-partition heaps,
    * driver merge of 257 rows — no global sort, no fact-table window);
    * everything after runs on 257 census rows.
    */
  def q379HillTail(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = Tables.orders(spark, dir)
      .select(floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
      .orderBy(col("cents").desc).limit(257)
      .withColumn("r", row_number().over(Window.orderBy(col("cents").desc)).cast("long"))
      .withColumn("lnx",
        floor(log(col("cents").cast("double")) * 1000000.0 + 0.5).cast("long"))
    val moms = top.agg(
      sum(when(col("r") <= 64, col("lnx"))).as("s64"),
      sum(when(col("r") <= 128, col("lnx"))).as("s128"),
      sum(when(col("r") <= 256, col("lnx"))).as("s256"),
      max(when(col("r") === 65, col("lnx"))).as("l65"),
      max(when(col("r") === 129, col("lnx"))).as("l129"),
      max(when(col("r") === 257, col("lnx"))).as("l257"),
      max(when(col("r") === 65, col("cents"))).as("c65"),
      max(when(col("r") === 129, col("cents"))).as("c129"),
      max(when(col("r") === 257, col("cents"))).as("c257"))
    moms.selectExpr(
        "stack(3, 64L, s64 - 64 * l65, c65, 128L, s128 - 128 * l129, c129, " +
          "256L, s256 - 256 * l257, c257) AS (k, hnum, ckp1)")
      .selectExpr("k", "round(CAST(ckp1 AS DOUBLE) / 100.0, 2) AS x_kplus1_dollar",
        "round(CAST(hnum AS DOUBLE) / (CAST(k AS DOUBLE) * 1000000.0), 6) AS hill_h",
        "round(CAST(k AS DOUBLE) * 1000000.0 / CAST(hnum AS DOUBLE), 6) AS alpha")
      .orderBy("k")
  }

  /** q380: QUANTILE SELECTION BY PINBALL LOSS — pick the τ=0.9
    * quantile of event value per type by MINIMIZING the pinball
    * (check) loss over dollar-bucket candidates, and cross-check it
    * against the empirical CDF quantile. This is quantile REGRESSION's
    * objective run as a census search — the forecast-evaluation
    * primitive (mean pinball is how quantile forecasts are scored)
    * beside q330's MASE point-forecast backtest.
    *
    * Determinism: candidates live on the dollar-bucket census (q = the
    * bucket-max cents 100b+99, so bucket membership decides the branch
    * exactly); 10×loss = 9·Σ_{v>q}(v−q) + Σ_{v≤q}(q−v) is BIGINT off
    * cumulative census moments; argmin via struct-min (loss, bucket).
    * Scale: one shuffle to the (type, dollar) census; cumulative
    * windows and the argmin run on census rows, never the event
    * stream.
    */
  def q380PinballQuantile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val census = Tables.events(spark, dir)
      .select(col("event_type"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .withColumn("b", expr("cents div 100"))
      .groupBy("event_type", "b")
      .agg(count(lit(1)).as("cnt"), sum("cents").as("s"))
    val w = Window.partitionBy("event_type").orderBy("b")
    val wAll = Window.partitionBy("event_type")
    val scored = census
      .withColumn("cum_n", sum("cnt").over(w))
      .withColumn("cum_s", sum("s").over(w))
      .withColumn("tot_n", sum("cnt").over(wAll))
      .withColumn("tot_s", sum("s").over(wAll))
      .withColumn("q", col("b") * 100 + 99)
      .withColumn("loss10",
        lit(9) * (col("tot_s") - col("cum_s") - col("q") * (col("tot_n") - col("cum_n"))) +
          (col("q") * col("cum_n") - col("cum_s")))
    scored.groupBy("event_type")
      .agg(max("tot_n").as("n"),
        min(struct(col("loss10"), col("b"))).as("best"),
        min(when(col("cum_n") * 10 >= col("tot_n") * 9, col("b"))).as("emp_b"))
      .selectExpr("event_type", "n",
        "round(CAST(best.b * 100 + 99 AS DOUBLE) / 100.0, 2) AS q90_dollar",
        "round(CAST(best.loss10 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000.0), 6) AS mean_pinball",
        "round(CAST(emp_b * 100 + 99 AS DOUBLE) / 100.0, 2) AS emp_q90_dollar")
      .orderBy("event_type")
  }

  /** q381: PAGE–HINKLEY DRIFT DETECTOR (Page '54; the streaming-ML
    * standard in MOA/river) — the SEQUENTIAL mean-shift alarm beside
    * q271's retrospective CUSUM: m_t accumulates (x_t − x̄_t − δ)
    * against the running mean, M_t = min m_i, and the detector fires
    * while m_t − M_t > λ. Run per event type over the daily-mean-value
    * series (δ = 50¢ tolerance, λ = $20), reporting the maximum
    * excursion, alarm-day count, and first alarm index — the
    * "when would the monitor have paged" replay.
    *
    * Determinism: the series is daily mean cents = Σcents div n
    * (positive, so trunc == floor in both engines); the PH recursion
    * is a genuinely-sequential integer fold run IN PLAN as an
    * `aggregate` HOF over each type's census-sized day array (q368's
    * device); the oracle replays it as a bounded recursive CTE. No
    * float until the output divide.
    * Scale: one shuffle to the (type, day) census; the fold walks
    * ~90 census elements per type, constant at any corpus size.
    */
  def q381PageHinkley(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .groupBy("event_type", "day")
      .agg(expr("sum(cents) div count(1)").as("xm"))
    val series = daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("xm")))).as("s"))
      .select(col("event_type"), size(col("s")).as("n_days"),
        expr("transform(s, p -> p.xm)").as("ys"))
    val mNew = "acc.m + y - ((acc.s + y) div (acc.t + 1)) - 50"
    val mnNew = s"least(acc.mn, $mNew)"
    val excNew = s"($mNew) - ($mnNew)"
    val step = "named_struct(" +
      "'t', acc.t + 1, 's', acc.s + y, " +
      s"'m', $mNew, 'mn', $mnNew, " +
      s"'mx', greatest(acc.mx, $excNew), " +
      s"'al', acc.al + IF($excNew > 2000, 1, 0), " +
      s"'fa', IF(acc.fa >= 0L, acc.fa, IF($excNew > 2000, acc.t + 1, -1L)))"
    series
      .withColumn("st", expr(
        "aggregate(ys, " +
          "named_struct('t', CAST(0 AS BIGINT), 's', CAST(0 AS BIGINT), " +
          "'m', CAST(0 AS BIGINT), 'mn', CAST(0 AS BIGINT), " +
          "'mx', CAST(0 AS BIGINT), 'al', CAST(0 AS BIGINT), " +
          "'fa', CAST(-1 AS BIGINT)), " +
          s"(acc, y) -> $step)"))
      .selectExpr("event_type", "n_days",
        "round(CAST(st.mx AS DOUBLE) / 100.0, 2) AS ph_max_dollar",
        "st.al AS alarm_days", "st.fa AS first_alarm_rn")
      .orderBy("event_type")
  }

  /** q382: GRID-DENSITY CLUSTERING CENSUS (the DBSCAN-shaped
    * classification distributed engines actually run — CLIQUE/GriDBSCAN
    * family): snap the first two embedding dims to an ε=0.05 grid,
    * count each cell's 3×3 neighborhood, and classify every point —
    * CORE (neighborhood ≥ 25), BORDER (non-core cell adjacent to a
    * core cell), NOISE — reported per label. The density-structure
    * screen beside q127's k-means: no iteration, no seeds, finds
    * arbitrary-shape mass.
    *
    * Determinism: cells are ⌊20x⌋ integer keys off the float32-exact
    * doubles (one multiply, one floor — bit-identical in both
    * engines); every count is an integer census.
    * Scale: THE standard density shape at 100 TB — one shuffle to the
    * bounded cell census (space-bounded, not data-bounded), a 9×
    * census-sized offset explode for neighborhoods, and points
    * classified by one equi-join against the small cell table; the
    * pairwise ε-join never materializes.
    */
  def q382GridDensity(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        floor(element_at(col("embedding"), 1).cast("double") * 20.0)
          .cast("long").as("cx"),
        floor(element_at(col("embedding"), 2).cast("double") * 20.0)
          .cast("long").as("cy"))
    val cells = pts.groupBy("cx", "cy").agg(count(lit(1)).as("cnt"))
    val offs = expr(
      "explode(array(named_struct('dx', -1L, 'dy', -1L), " +
        "named_struct('dx', -1L, 'dy', 0L), named_struct('dx', -1L, 'dy', 1L), " +
        "named_struct('dx', 0L, 'dy', -1L), named_struct('dx', 0L, 'dy', 0L), " +
        "named_struct('dx', 0L, 'dy', 1L), named_struct('dx', 1L, 'dy', -1L), " +
        "named_struct('dx', 1L, 'dy', 0L), named_struct('dx', 1L, 'dy', 1L)))")
    val nbh = cells.select(col("cx"), col("cy"), col("cnt"), offs.as("o"))
      .select((col("cx") + col("o.dx")).as("cx"),
        (col("cy") + col("o.dy")).as("cy"), col("cnt"))
      .groupBy("cx", "cy").agg(sum("cnt").as("nb"))
    val classed = cells.join(nbh, Seq("cx", "cy"))
      .select(col("cx"), col("cy"),
        (col("nb") >= 25).as("is_core"))
    val coreAdj = classed.filter(col("is_core"))
      .select(col("cx"), col("cy"), offs.as("o"))
      .select((col("cx") + col("o.dx")).as("cx"),
        (col("cy") + col("o.dy")).as("cy"))
      .distinct()
      .withColumn("near_core", lit(true))
    val cellClass = classed
      .join(coreAdj, Seq("cx", "cy"), "left")
      .select(col("cx"), col("cy"),
        when(col("is_core"), "core")
          .when(col("near_core").isNotNull, "border")
          .otherwise("noise").as("cls"))
    pts.join(cellClass, Seq("cx", "cy"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_pts"),
        sum(when(col("cls") === "core", 1L).otherwise(0L)).as("n_core"),
        sum(when(col("cls") === "border", 1L).otherwise(0L)).as("n_border"),
        sum(when(col("cls") === "noise", 1L).otherwise(0L)).as("n_noise"))
      .orderBy("label")
  }

  /** q383: LEAVE-ONE-OUT TARGET ENCODING (the Catboost/Kaggle feature
    * device, smoothed à la Micci-Barreca '01) — encode each order's
    * market segment as the segment's mean spend EXCLUDING the row
    * itself, shrunk toward the global mean with prior weight m=20:
    * enc_i = (S_seg − y_i + m·μ)/(n_seg − 1 + m). The leakage-free
    * form (plain target encoding leaks y_i into its own feature —
    * the train/serve skew q212's split hygiene exists to catch).
    * Reported per segment: n, raw mean, enc at the max/min-spend row,
    * and the CLOSED-FORM mean of all encodings.
    *
    * Determinism: every input is an exact cents moment (n, S, y_max,
    * y_min, S_tot, n_tot); Σenc is NEVER summed as floats — the
    * algebraic identity Σenc = ((n−1)S + m·n·μ)/(n−1+m) replaces the
    * order-dependent float sum; the double chains are mirrored
    * token-for-token in the oracle. enc depends on y only, so
    * boundary ties pick the same value either side.
    * Scale: one join-shuffle to segment moments + a 1-row global
    * broadcast; (n−1)·S runs in DOUBLE because n·S overflows BIGINT
    * at corpus scale (grid semantics end at the moments).
    */
  def q383TargetEncoding(spark: SparkSession, dir: String): DataFrame = {
    val y = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
    val segs = y.groupBy("seg").agg(
      count(lit(1)).as("n"), sum("cents").as("s"),
      max("cents").as("ymax"), min("cents").as("ymin"))
    val glob = y.agg(sum("cents").as("stot"), count(lit(1)).as("ntot"))
    segs.crossJoin(broadcast(glob))
      .selectExpr("seg", "n", "s", "ymax", "ymin",
        "CAST(stot AS DOUBLE) / CAST(ntot AS DOUBLE) AS mu",
        "CAST(n AS DOUBLE) AS nd", "CAST(s AS DOUBLE) AS sd")
      .selectExpr("seg", "n",
        "round(sd / nd / 100.0, 6) AS mean_dollar",
        "round((CAST(s - ymax AS DOUBLE) + 20.0 * mu) / (nd - 1.0 + 20.0) / 100.0, 6) AS enc_at_max",
        "round((CAST(s - ymin AS DOUBLE) + 20.0 * mu) / (nd - 1.0 + 20.0) / 100.0, 6) AS enc_at_min",
        "round(((nd - 1.0) * sd + 20.0 * nd * mu) / (nd * (nd - 1.0 + 20.0)) / 100.0, 6) AS mean_enc_dollar")
      .orderBy("seg")
  }

  /** q384: ITEM–ITEM COLLABORATIVE FILTERING (Sarwar '01 /
    * Linden–Amazon '03) — part-to-part similarity from co-purchase:
    * cos²(a,b) = co²/(n_a·n_b) over binary customer–part incidence,
    * top-15 neighbor pairs. The recommender primitive beside q221's
    * lift (lift normalizes by independence, cosine by popularity —
    * cosine is what item-item recsys actually ranks with).
    *
    * Determinism: the score is the SNAPPED-FACTOR grid
    * (co·10⁶ div n_a)·(co·10⁶ div n_b) — each factor ≤ 10⁶ because
    * co ≤ n, so the product ≤ 10¹² sits in BIGINT at ANY corpus scale
    * (co²·10⁹ would overflow once co > 3·10⁶); ties break (score
    * desc, a, b). Scale: q221's bounded device — distinct incidence,
    * per-customer pair join with an ENFORCED basket cap (row_number
    * over (c) keeps the lowest-200 partkeys per customer, so one key
    * emits at most C(200,2) ≈ 2·10⁴ pairs no matter how skewed the
    * feed — without it a 10⁵-part reseller account emits 5·10⁹ pairs
    * on a single shuffle key; a no-op on TPC-H baskets of ~40), then
    * part-popularity census joined twice and a TakeOrderedAndProject
    * heap for the top-k. Popularity is computed on the SAME capped
    * incidence so co ≤ min(na, nb) stays an invariant of the model.
    */
  def q384ItemItemCf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The capped incidence feeds THREE consumers (both self-join sides
    // and the popularity census); without a cut each consumer re-runs
    // the orders⨝lineitem join + distinct + cap window (the round-19
    // before-plan shows the subtree planned twice with no exchange
    // reuse). One eager materialization runs it once, and since the cap
    // window's exchange leaves the frame hash(c)-partitioned — which a
    // checkpoint preserves — the per-customer self-join below needs no
    // exchange on either side (guide §2.4).
    val cp = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
      .withColumn("rnk", row_number().over(
        Window.partitionBy("c").orderBy("p")))
      .filter(col("rnk") <= 200)
      .drop("rnk")
      .localCheckpoint(true)
    val pop = cp.groupBy("p").agg(count(lit(1)).as("n"))
    val pairs = cp.select(col("c"), col("p").as("pa"))
      .join(cp.select(col("c"), col("p").as("pb")), Seq("c"))
      .filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("co"))
    pairs
      .join(pop.select(col("p").as("pa"), col("n").as("na")), Seq("pa"))
      .join(pop.select(col("p").as("pb"), col("n").as("nb")), Seq("pb"))
      .withColumn("cos2_p12",
        expr("(co * 1000000 div na) * (co * 1000000 div nb)"))
      .select(col("pa"), col("pb"), col("co"), col("na"), col("nb"),
        col("cos2_p12"))
      .orderBy(col("cos2_p12").desc, col("pa"), col("pb"))
      .limit(15)
  }

  /** q385: PERMUTATION FEATURE IMPORTANCE (Breiman '01) — how much
    * does a feature matter? Fit y = a + b·x (extended price ~
    * quantity, ~ discount%) by exact-moment OLS, then BREAK the
    * feature by permuting it and measure the SSE inflation with the
    * SAME fitted model: importance = (SSE_perm − SSE_base)/SSE_base.
    * The model-agnostic importance beside q370's influence (Cook asks
    * "which ROW moves the fit", this asks "which FEATURE carries it").
    *
    * Determinism: the permutation is the md5 DOUBLE-RANKING device —
    * rows ranked by md5(salt‖key) on one side, feature values ranked
    * by a different salt on the other, joined on (day, rank): a
    * deterministic derangement-in-expectation with no RNG. Only the
    * cross moment Σx_π·y changes (Σx_π = Σx, Σx_π² = Σx² by
    * permutation invariance) so one BIGINT moment per feature; the
    * OLS/SSE chains are mirrored doubles off exact dollar-grid
    * moments. Scale: ranks live in day-bounded window partitions,
    * never a global sort; two equi-joins on (day, rank).
    */
  def q385PermImportance(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
        expr("unix_micros(l_shipdate) div 86400000000").as("day"),
        expr("floor(l_extendedprice + 0.5)").cast("long").as("y"),
        expr("floor(l_quantity + 0.5)").cast("long").as("x1"),
        expr("floor(l_discount * 100.0 + 0.5)").cast("long").as("x2"))
    // (ok, ln) is NOT unique in the synthetic lineitem — the hash key
    // and tiebreak include the value columns so the only possible ties
    // are between fully identical rows, where any resolution yields
    // the same sums
    def ranked(salt: String): DataFrame =
      base.withColumn("rn", row_number().over(
        Window.partitionBy("day").orderBy(
          md5(concat_ws("-", lit(salt), col("ok"), col("ln"),
            col("x1"), col("x2"), col("y"))),
          col("ok"), col("ln"), col("x1"), col("x2"), col("y"))))
    val lhs = ranked("a").select("day", "rn", "y", "x1", "x2")
    val p1 = ranked("b1").select(col("day"), col("rn"), col("x1").as("x1p"))
    val p2 = ranked("b2").select(col("day"), col("rn"), col("x2").as("x2p"))
    val moms = lhs.join(p1, Seq("day", "rn")).join(p2, Seq("day", "rn"))
      .agg(count(lit(1)).as("n"), sum("y").as("sy"),
        sum(col("y") * col("y")).as("syy"),
        sum("x1").as("sx1"), sum(col("x1") * col("x1")).as("sxx1"),
        sum(col("x1") * col("y")).as("sxy1"),
        sum(col("x1p") * col("y")).as("sxyp1"),
        sum("x2").as("sx2"), sum(col("x2") * col("x2")).as("sxx2"),
        sum(col("x2") * col("y")).as("sxy2"),
        sum(col("x2p") * col("y")).as("sxyp2"))
    moms.selectExpr(
        "stack(2, 'quantity', n, sy, syy, sx1, sxx1, sxy1, sxyp1, " +
          "'discount_pct', n, sy, syy, sx2, sxx2, sxy2, sxyp2) " +
          "AS (feature, n, sy, syy, sx, sxx, sxy, sxyp)")
      .selectExpr("feature", "n", "sy", "syy", "sx", "sxx", "sxy", "sxyp",
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
          "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b")
      .selectExpr("feature", "n", "syy", "sxx", "sx", "sxy", "sxyp", "b",
        "(CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS a",
        "CAST(sy AS DOUBLE) AS syd")
      .selectExpr("feature", "n", "b",
        "CAST(syy AS DOUBLE) + CAST(n AS DOUBLE) * a * a + b * b * CAST(sxx AS DOUBLE) " +
          "- 2.0 * a * syd - 2.0 * b * CAST(sxy AS DOUBLE) + 2.0 * a * b * CAST(sx AS DOUBLE) AS sseb",
        "CAST(syy AS DOUBLE) + CAST(n AS DOUBLE) * a * a + b * b * CAST(sxx AS DOUBLE) " +
          "- 2.0 * a * syd - 2.0 * b * CAST(sxyp AS DOUBLE) + 2.0 * a * b * CAST(sx AS DOUBLE) AS ssep")
      .selectExpr("feature", "n", "round(b, 6) AS slope",
        "round(sseb / CAST(n AS DOUBLE), 4) AS mse_base",
        "round(ssep / CAST(n AS DOUBLE), 4) AS mse_perm",
        "round((ssep - sseb) / sseb * 100.0, 4) AS importance_pct")
      .orderBy("feature")
  }

  /** q386: READABILITY SCREEN (Flesch '48, vowel-run syllable
    * heuristic) — per-source Flesch reading ease off word count,
    * vowel-group syllables, and a 16-words-per-sentence proxy (the
    * synthetic corpus has no sentence punctuation — documented
    * stand-in, the formula and plumbing are the real thing). The
    * classic pretraining quality gate beside the length/stopword
    * ratios (q47 family): boilerplate and keyword-stuffed spam score
    * far from natural-prose range.
    *
    * Determinism: words/syllables/sentences are exact per-doc
    * integers (same regex semantics both engines); each doc's Flesch
    * double chain snaps to the ⌊F·10⁶+½⌋ BIGINT grid BEFORE the
    * source sum, so aggregation is order-invariant.
    * Scale: pure scan-local text kernels + one hash agg per source —
    * the embarrassingly-parallel shape.
    */
  def q386Readability(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = Tables.documentsSpread(spark, dir)
      .select(col("source"),
        expr("size(filter(split(text, ' '), t -> t != ''))").cast("long").as("w"),
        expr("size(regexp_extract_all(text, '[aeiouy]+', 0))").cast("long").as("sy"))
      .withColumn("w", greatest(col("w"), lit(1L)))
      .withColumn("sent", expr("(w + 15) div 16"))
      .withColumn("f_u", expr(
        "CAST(floor((206.835 - 1.015 * (CAST(w AS DOUBLE) / CAST(sent AS DOUBLE)) " +
          "- 84.6 * (CAST(sy AS DOUBLE) / CAST(w AS DOUBLE))) * 1000000.0 + 0.5) AS BIGINT)"))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("w").as("sw"),
        sum("sy").as("ssy"), sum("f_u").as("sf"))
      .selectExpr("source", "n_docs",
        "round(CAST(sf AS DOUBLE) / CAST(n_docs AS DOUBLE) / 1000000.0, 6) AS mean_flesch",
        "round(CAST(sw AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS mean_words",
        "round(CAST(ssy AS DOUBLE) / CAST(sw AS DOUBLE), 6) AS syll_per_word")
      .orderBy("source")
  }

  /** q387: HUBER ROBUST REGRESSION (Huber '64) — one exact IRLS step
    * from the OLS fit of order total ~ customer balance: residuals
    * beyond k = 1.345σ get weight k/|r| (the 95%-efficiency tuning
    * constant), then the weighted normal equations are re-solved.
    * The outlier-resistant line beside q297's Theil–Sen (Theil–Sen
    * medians pairwise slopes; Huber reweights the least-squares
    * objective — what M-estimation packages actually iterate).
    *
    * Determinism: weights snap to the per-mille BIGINT grid
    * ⌊1000w+½⌋ BEFORE the weighted moments, so every Σ is an exact
    * integer sum (order-invariant) in DECIMAL(38,0) — per-row terms
    * w·x·y reach 10¹⁴ and corpus-scale row counts push past BIGINT;
    * the (a, b, σ, k) broadcast and both solve chains are mirrored
    * doubles. Scale: two scans + two 1-row broadcasts — the
    * distributed-GLM shard shape; no row-level state.
    */
  def q387HuberRegression(spark: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val xy = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(
        expr("floor(o_totalprice * 100.0 + 0.5) div 100").as("y"),
        expr("floor(c_acctbal * 100.0 + 0.5)").cast("long").as("x"))
    val ols = xy.agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum((col("x") * col("x")).cast(dec)).as("sxx"),
        sum((col("x") * col("y")).cast(dec)).as("sxy"),
        sum((col("y") * col("y")).cast(dec)).as("syy"))
      .selectExpr("n", "sx", "sy", "sxy", "sxx", "syy",
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
          "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b")
      .selectExpr("n", "sx", "sy", "sxy", "sxx", "syy", "b",
        "(CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS a")
      .selectExpr("n", "a", "b",
        "sqrt((CAST(syy AS DOUBLE) + CAST(n AS DOUBLE) * a * a + b * b * CAST(sxx AS DOUBLE) " +
          "- 2.0 * a * CAST(sy AS DOUBLE) - 2.0 * b * CAST(sxy AS DOUBLE) " +
          "+ 2.0 * a * b * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) AS sigma")
      .selectExpr("n", "a", "b", "sigma", "1.345 * sigma AS k")
    val weighted = xy.crossJoin(broadcast(ols))
      .withColumn("r", expr("abs(CAST(y AS DOUBLE) - a - b * CAST(x AS DOUBLE))"))
      .withColumn("wu", expr(
        "CAST(IF(r <= k, 1000L, CAST(floor(1000.0 * k / r + 0.5) AS BIGINT)) AS BIGINT)"))
    weighted.agg(
        max("n").as("n"), max("a").as("ols_a"), max("b").as("ols_b"),
        max("sigma").as("sigma"),
        sum(col("wu").cast(dec)).as("sw"),
        sum((col("wu") * col("x")).cast(dec)).as("swx"),
        sum((col("wu") * col("y")).cast(dec)).as("swy"),
        sum((col("wu") * col("x") * col("x")).cast(dec)).as("swxx"),
        sum((col("wu") * col("x") * col("y")).cast(dec)).as("swxy"),
        sum(when(col("wu") < 1000L, 1L).otherwise(0L)).as("n_down"))
      .selectExpr("n", "ols_a", "ols_b", "sigma", "n_down",
        "(CAST(sw AS DOUBLE) * CAST(swxy AS DOUBLE) - CAST(swx AS DOUBLE) * CAST(swy AS DOUBLE)) / " +
          "(CAST(sw AS DOUBLE) * CAST(swxx AS DOUBLE) - CAST(swx AS DOUBLE) * CAST(swx AS DOUBLE)) AS bh",
        "CAST(swy AS DOUBLE) AS swyd", "CAST(sw AS DOUBLE) AS swd",
        "CAST(swx AS DOUBLE) AS swxd")
      .selectExpr("n", "n_down",
        "round(ols_b, 6) AS ols_slope", "round(ols_a, 6) AS ols_intercept",
        "round(sigma, 6) AS sigma",
        "round(bh, 6) AS huber_slope",
        "round((swyd - bh * swxd) / swd, 6) AS huber_intercept")
  }

  /** q389: CLASSICAL SEASONAL DECOMPOSITION (additive, weekly period —
    * the moving-average method STL descends from): daily revenue =
    * trend (centered 7-day MA) + weekday effect + residual, reporting
    * each weekday's dollar effect, Hyndman's seasonality strength
    * 1 − Var(resid)/Var(detrended), and the residual SD. The
    * calendar-structure screen beside q330's seasonal-naive MASE
    * (q330 FORECASTS with the weekly pattern; this MEASURES how much
    * of the variance the pattern owns).
    *
    * Determinism: the day census is integer dollars; the trend is
    * sum7 div 7 over full 7-day windows (positive — trunc == floor);
    * detrended values are exact signed BIGINTs; the effect and both
    * variances come off exact moments via the group-mean identity
    * Σ(det−e)² = Σdet² − Σ sd_d²/n_d, with Σdet² on DECIMAL(38,0) and
    * the 7-term between-group sum ORDER-PINNED (cumulative over the
    * dow-sorted census — identical add order in both engines; the
    * round-17 sf1 probe caught the earlier sd²·100 BIGINT lattice
    * overflowing at 10×). Scale: one shuffle to the day census; MA
    * window and weekday agg run on ~2 500 census rows.
    */
  def q389SeasonalDecomp(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.orders(spark, dir)
      .select(col("o_orderdate").cast("date").as("d"),
        expr("floor(o_totalprice * 100.0 + 0.5) div 100").as("rev"))
      .groupBy("d").agg(sum("rev").as("rev"))
    val w7 = Window.orderBy("d").rowsBetween(-3, 3)
    val det = daily
      .withColumn("s7", sum("rev").over(w7))
      .withColumn("c7", count(lit(1)).over(w7))
      .filter(col("c7") === 7)
      .select((dayofweek(col("d")) - 1).cast("long").as("dow"),
        (col("rev") - expr("s7 div 7")).as("det"))
    // Σdet² rides DECIMAL(38,0) and the between-group sum of squares is
    // an ORDER-PINNED double cumulative over the dow-sorted 7-row census
    // (the q457 device) — the previous centi-dollar² integer lattice
    // (sd²·100) overflowed BIGINT at the sf1 probe, loudly under ANSI
    val byDow = det.groupBy("dow")
      .agg(count(lit(1)).as("n_days"), sum("det").as("sd"),
        // widen before the product (oracle: det::HUGEINT * det) — a
        // post-product cast still squares in BIGINT under ANSI
        sum(col("det").cast("decimal(38,0)") * col("det")).as("sdd"))
      .withColumn("vb", expr("CAST(sd AS DOUBLE) * sd / n_days"))
      .withColumn("vb_cum", sum("vb").over(Window.orderBy("dow")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint()
    val tot = byDow.agg(sum("n_days").as("n"), sum("sd").as("st"),
      sum("sdd").as("stt"), max("vb_cum").as("ssb"))
    byDow.crossJoin(broadcast(tot))
      .selectExpr("dow", "n_days",
        "round(CAST(sd AS DOUBLE) / CAST(n_days AS DOUBLE), 6) AS effect_dollar",
        "CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st / n AS ssd_d",
        "CAST(stt AS DOUBLE) - ssb AS ssr_d", "CAST(n AS DOUBLE) AS nd")
      .selectExpr("dow", "n_days", "effect_dollar",
        "round(greatest(0.0, 1.0 - ssr_d / ssd_d), 6) AS seasonal_strength",
        "round(sqrt(greatest(0.0, ssr_d) / nd), 6) AS resid_sd")
      .orderBy("dow")
  }

  /** q390: SEQUENTIAL PATTERN MINING (contiguous event-type trigrams,
    * support = distinct users — the SPM shape GSP/PrefixSpan bound,
    * restricted to contiguous windows so the pattern space stays
    * |types|³): top-10 behavioral motifs by user support, with the
    * occurrence count beside it. The n≥3 sequence layer over q177's
    * transition matrix (bigrams) and q372's entropy (how predictable),
    * answering WHICH multi-step paths dominate.
    *
    * Determinism: trigram = two lead windows under the total
    * per-user order (ts, event_id); support/occurrence are integer
    * censuses; top-10 ties break (support desc, occurrences desc,
    * trigram asc). Scale: user-partitioned windows at the events
    * layout, one hash agg to the ≤|types|³ pattern census, heap
    * top-k — the sequence never leaves its partition.
    */
  def q390SequencePatterns(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("t2", lead("event_type", 1).over(w))
      .withColumn("t3", lead("event_type", 2).over(w))
      .filter(col("t3").isNotNull)
      .select(col("user_id"),
        concat_ws(">", col("event_type"), col("t2"), col("t3")).as("pattern"))
      .groupBy("pattern")
      .agg(countDistinct("user_id").as("support_users"),
        count(lit(1)).as("occurrences"))
      .orderBy(col("support_users").desc, col("occurrences").desc,
        col("pattern"))
      .limit(10)
  }

  /** q392: LJUNG–BOX PORTMANTEAU TEST (Ljung & Box '78) — is the daily
    * event-count series white noise? Q = n(n+2)·Σ_{k≤7} ρ̂²_k/(n−k)
    * over q284's first seven autocorrelations, against the χ²₀.₉₅,₇
    * critical value. The JOINT serial-correlation test that completes
    * the ACF (q284) / PACF (q369) / runs (q371) family: individual ρ̂
    * bands miss correlation spread thinly across lags; residual
    * diagnostics after any forecast fit (q330/q368) ask exactly this.
    *
    * Determinism: ρ̂_k snaps to q284's 10⁻⁶ grid as an INTEGER r_u;
    * each summand becomes the exact femto-grid integer
    * (r_u²·1000) div (n−k), so the 7-term sum is order-invariant and
    * Q is one double chain off a BIGINT. Scale: q284's shape — one
    * shuffle to the day census, 7 shifted census self-joins, 7-row
    * everything after.
    */
  def q392LjungBox(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
    val tot = days.agg(count(lit(1)).as("nd"), sum("y").as("s"))
    val c = days.crossJoin(broadcast(tot))
      .select(col("day"), col("nd"), (col("nd") * col("y") - col("s")).as("cy"))
      .localCheckpoint()
    val den = c.agg(sum(col("cy") * col("cy")).as("den"), max("nd").as("nd"))
    val lagged = spark.range(1, 8).select(col("id").as("lag"))
      .crossJoin(c.select(col("day").as("d0"), col("cy").as("cy0")))
      .select(col("lag"), (col("d0") + col("lag")).as("day"), col("cy0"))
    val rhos = c.join(lagged, "day")
      .groupBy("lag").agg(count(lit(1)).as("n_pairs"),
        sum(col("cy") * col("cy0")).as("num"))
      .crossJoin(broadcast(den))
      .selectExpr("lag", "n_pairs", "nd",
        "CAST(floor((CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS r_u")
      .withColumn("term_f", expr("(r_u * r_u * 1000) div (nd - lag)"))
    val q = rhos.agg(sum("term_f").as("sum_f"), max("nd").as("nd2"))
      .selectExpr(
        "round(CAST(nd2 AS DOUBLE) * CAST(nd2 + 2 AS DOUBLE) * " +
          "(CAST(sum_f AS DOUBLE) / 1.0e15), 6) AS q_stat")
    rhos.crossJoin(broadcast(q))
      .selectExpr("lag", "n_pairs",
        "CAST(r_u AS DOUBLE) / 1000000.0 AS rho",
        "q_stat", "q_stat > 14.067140 AS reject_white_noise")
      .orderBy("lag")
  }

  /** q393: FRIEDMAN TEST (Friedman '37) — the nonparametric two-way
    * ANOVA on ranks: within each complete day-block, rank the five
    * event types by daily dollar volume, then test whether the rank
    * sums differ (χ²_F = 12/(bk(k+1))·ΣR_j² − 3b(k+1), k−1 df). The
    * repeated-measures member of the test family: q358's
    * Brown–Forsythe compares group DISPERSION, Kruskal–Wallis (q-family)
    * pools ranks globally; Friedman BLOCKS by day, removing day-level
    * volume shifts before comparing treatments.
    *
    * Determinism: within-block average ranks live on the ×2 integer
    * grid (min_rank + max_rank, exact under ties); rank sums are
    * BIGINT; the χ² chain is one mirrored double expression. Only
    * complete blocks (all 5 types) enter, so k is constant by
    * construction. Scale: one shuffle to the (day, type) census; the
    * rank windows are k-row partitions of the census; the test is a
    * 5-row reduction.
    */
  def q393FriedmanTest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .groupBy("day", "event_type").agg(sum("cents").as("v"))
    val complete = daily
      .withColumn("k", count(lit(1)).over(Window.partitionBy("day")))
      .filter(col("k") === 5)
    val ranked = complete
      .withColumn("rmin", rank().over(
        Window.partitionBy("day").orderBy("v")))
      .withColumn("rmax_desc", rank().over(
        Window.partitionBy("day").orderBy(col("v").desc)))
      .withColumn("r2", col("rmin") + (lit(6) - col("rmax_desc")))
    val sums = ranked.groupBy("event_type")
      .agg(count(lit(1)).as("b"), sum("r2").as("r2sum"))
    val tot = sums.agg(max("b").as("bb"),
      sum(expr("r2sum * r2sum")).as("sr4"))
    sums.crossJoin(broadcast(tot))
      .selectExpr("event_type", "b",
        "round(CAST(r2sum AS DOUBLE) / 2.0 / CAST(b AS DOUBLE), 6) AS mean_rank",
        "round(12.0 / (CAST(bb AS DOUBLE) * 5.0 * 6.0) * (CAST(sr4 AS DOUBLE) / 4.0) " +
          "- 3.0 * CAST(bb AS DOUBLE) * 6.0, 6) AS chi2_f",
        "(12.0 / (CAST(bb AS DOUBLE) * 5.0 * 6.0) * (CAST(sr4 AS DOUBLE) / 4.0) " +
          "- 3.0 * CAST(bb AS DOUBLE) * 6.0) > 9.487729 AS reject_equal_ranks")
      .orderBy("event_type")
  }

  /** q394: MAHALANOBIS OUTLIER AUDIT (the multivariate distance the
    * χ² rule-of-thumb screens with) — per-row D² of (quantity,
    * extended price) against the 2×2 sample covariance, the outlier
    * census above the χ²₂ 0.999 quantile (13.8155), and the top-10
    * most anomalous line items. The MULTIVARIATE data-audit row beside
    * q370's per-row influence and the univariate z-screens: a row can
    * be unremarkable in each margin and absurd jointly (high price at
    * tiny quantity) — only the correlation-aware distance sees it.
    *
    * Determinism: covariance moments are exact BIGINT off the
    * dollar/unit grids; (μ, Σ⁻¹ terms) broadcast as one row; each D²
    * is the same mirrored double chain in both engines, and the
    * top-10 ties break (D² snapped to 10⁻⁹, then key). Scale: one
    * moment agg + one broadcast + a scan-local chain + TakeOrdered
    * heap — no row-level state, no shuffle beyond the 1-row moments.
    */
  def q394MahalanobisOutliers(spark: SparkSession, dir: String): DataFrame = {
    val xy = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
        expr("floor(l_quantity + 0.5)").cast("long").as("x"),
        expr("floor(l_extendedprice + 0.5)").cast("long").as("y"))
    val m = xy.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      .selectExpr("n",
        "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx",
        "CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my",
        "CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS vxx",
        "CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE) - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS vxy",
        "CAST(syy AS DOUBLE) / CAST(n AS DOUBLE) - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS vyy")
      .selectExpr("n", "mx", "my", "vxx", "vxy", "vyy",
        "vxx * vyy - vxy * vxy AS det")
    val scored = xy.crossJoin(broadcast(m))
      .withColumn("d2", expr(
        "(vyy * (CAST(x AS DOUBLE) - mx) * (CAST(x AS DOUBLE) - mx) " +
          "- 2.0 * vxy * (CAST(x AS DOUBLE) - mx) * (CAST(y AS DOUBLE) - my) " +
          "+ vxx * (CAST(y AS DOUBLE) - my) * (CAST(y AS DOUBLE) - my)) / det"))
      .withColumn("d2_n",
        expr("CAST(floor(d2 * 1000000000.0 + 0.5) AS BIGINT)"))
    val census = scored.agg(count(lit(1)).as("n_rows"),
      sum(when(col("d2_n") > 13815500000L, 1L).otherwise(0L)).as("n_outliers"))
    scored.crossJoin(broadcast(census))
      .orderBy(col("d2_n").desc, col("ok"), col("ln"))
      .limit(10)
      .selectExpr("ok AS l_orderkey", "ln AS l_linenumber", "x AS quantity",
        "y AS price_dollar",
        "round(CAST(d2_n AS DOUBLE) / 1000000000.0, 6) AS d2",
        "n_rows", "n_outliers")
  }

  /** q396: TIME-TO-CONVERT LATENCY — the funnel's missing axis: q96
    * counts WHO converts, this measures HOW LONG (first view → first
    * subsequent purchase per user), reporting the converted census
    * and exact p50/p90/p99/mean latency in days. The product-analytics
    * latency distribution every conversion dashboard shows, and the
    * attribution-window calibrator (q62's interval join hard-codes a
    * window; this measures what the window should be).
    *
    * Determinism: latencies live on the integer day grid ((µs diff)
    * div 86400000000 — non-negative by the ≥ first-view filter);
    * percentiles are exact order statistics off the latency census
    * via cumulative-count inequalities (cum·2 ≥ n etc.), never a
    * sort of the user table; mean is one divide. Scale: two key aggs
    * + one equi-join to (user, first-view); the census window is
    * value-cardinality (≤ observed day span).
    */
  def q396TimeToConvert(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
    val fv = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("v_us"))
    val lat = ev.filter(col("event_type") === "purchase")
      .join(fv, "user_id")
      .filter(col("us") >= col("v_us"))
      .groupBy("user_id").agg(min("us").as("p_us"), min("v_us").as("v_us"))
      .select(expr("(p_us - v_us) div 86400000000").as("lat_d"))
    val census = lat.groupBy("lat_d").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(Window.orderBy("lat_d")))
    census.agg(sum("c").as("n"), sum(expr("lat_d * c")).as("s"))
      .crossJoin(census.select(col("lat_d"), col("cum")))
      .groupBy("n", "s")
      .agg(
        min(when(col("cum") * 2 >= col("n"), col("lat_d"))).as("p50_days"),
        min(when(col("cum") * 10 >= col("n") * 9, col("lat_d"))).as("p90_days"),
        min(when(col("cum") * 100 >= col("n") * 99, col("lat_d"))).as("p99_days"))
      .selectExpr("n AS n_converted", "p50_days", "p90_days", "p99_days",
        "round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_days")
  }

  /** q398: JENSEN–SHANNON DIVERGENCE (Lin '91) — the bounded,
    * symmetric, ABSOLUTELY-CONTINUOUS-free drift metric that finishes
    * the divergence family: KL (q-family) explodes on unshared
    * support, PSI needs both sides nonzero per bucket, Hellinger
    * (q376) is a metric but compresses tails; JSD = ½KL(p‖m) +
    * ½KL(q‖m) with m the mixture is defined for EVERY pair and
    * bounded by ln 2 — the default embedding/label drift monitor.
    * Same fixture as q376: the two md5 halves of each event type's
    * $5-bucket value distribution (a null-drift control — JSD ≈ 0).
    *
    * Determinism: per-cell terms p·ln(p/m), q·ln(q/m) (0 when the
    * side is absent) snap to the 10⁻⁹ grid BEFORE summing — q376's
    * device; output also in bits (÷ln 2) via the mirrored constant.
    * Scale: one shuffle to the (type, bucket) census; cell-local
    * chains; O(buckets) everything after.
    */
  def q398JensenShannon(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("floor(value * 100.0 + 0.5) div 500").cast("long").as("bucket"),
        (conv(substring(md5(col("event_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 2).as("half"))
    val cells = ev.groupBy("event_type", "bucket")
      .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("nb"))
    val tots = cells.groupBy("event_type")
      .agg(sum("na").as("ta"), sum("nb").as("tb"), count(lit(1)).as("n_buckets"))
    cells.join(tots, Seq("event_type"))
      .selectExpr("event_type", "na", "nb", "ta", "tb", "n_buckets",
        "CAST(na AS DOUBLE) / CAST(ta AS DOUBLE) AS p",
        "CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE) AS q")
      .selectExpr("event_type", "ta", "tb", "n_buckets",
        "CAST(floor((CASE WHEN na = 0 THEN 0.0 " +
          "ELSE 0.5 * p * ln(p / ((p + q) / 2.0)) END + " +
          "CASE WHEN nb = 0 THEN 0.0 " +
          "ELSE 0.5 * q * ln(q / ((p + q) / 2.0)) END) * 1.0e9 + 0.5) AS BIGINT) AS t_u")
      .groupBy("event_type")
      .agg(max("ta").as("n_a"), max("tb").as("n_b"),
        max("n_buckets").as("n_buckets"), sum("t_u").as("ts"))
      .selectExpr("event_type", "n_a", "n_b", "n_buckets",
        "round(CAST(ts AS DOUBLE) / 1.0e9, 6) AS jsd_nats",
        "round(CAST(ts AS DOUBLE) / 1.0e9 / ln(2.0), 6) AS jsd_bits")
      .orderBy("event_type")
  }

  /** q399: QINI / UPLIFT CURVE (Radcliffe '07) — does targeting by the
    * model find the persuadables? Users ranked by a targeting score
    * (view count), treatment = the md5 coin, outcome = purchased;
    * at each score threshold the cumulative Qini
    * Q = Y_t − Y_c·N_t/N_c measures incremental conversions over
    * random targeting. The CAUSAL ranking eval beside q367's PR curve
    * (PR ranks by outcome correlation; Qini ranks by INCREMENTAL
    * effect — ads/retention teams optimize the latter).
    *
    * Determinism: thresholds live on the SCORE CENSUS (distinct view
    * counts — the q263/q367 device, no ntile over users); all counts
    * are integer censuses under descending-score cumulative windows;
    * Qini is one mirrored double chain per census row. Scale: one
    * user-level agg, one score-census shuffle, census-sized windows.
    */
  def q399QiniUplift(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val users = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("score"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      .withColumn("treat",
        (conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 2))
    val census = users.groupBy("score")
      .agg(sum(when(col("treat") === 1, 1L).otherwise(0L)).as("nt"),
        sum(when(col("treat") === 0, 1L).otherwise(0L)).as("nc"),
        sum(when(col("treat") === 1, col("y")).otherwise(0L)).as("yt"),
        sum(when(col("treat") === 0, col("y")).otherwise(0L)).as("yc"))
    val w = Window.orderBy(col("score").desc)
    census
      .withColumn("cnt", sum("nt").over(w)).withColumn("cnc", sum("nc").over(w))
      .withColumn("cyt", sum("yt").over(w)).withColumn("cyc", sum("yc").over(w))
      .filter(col("cnc") > 0)
      .selectExpr("score", "cnt AS n_treat", "cnc AS n_ctrl",
        "cyt AS y_treat", "cyc AS y_ctrl",
        "round(CAST(cyt AS DOUBLE) - CAST(cyc AS DOUBLE) * CAST(cnt AS DOUBLE) / CAST(cnc AS DOUBLE), 6) AS qini")
      .orderBy(col("score").desc)
  }

  /** q400: REGRESSION DISCONTINUITY (sharp RD, Thistlethwaite &
    * Campbell '60) — the causal design for threshold rules: customers
    * just below vs just above zero account balance, outcome = average
    * order value, separate linear fits on each side within the
    * ±$3000 bandwidth, effect = the intercept JUMP at the cutoff.
    * The third causal member beside difference-in-differences and
    * q399's uplift: DiD needs panels, uplift needs randomization —
    * RD needs only the threshold rule.
    *
    * Determinism: both sides fit by exact BIGINT moments on the
    * cent (running) / dollar (outcome) grids; the two OLS chains and
    * the jump are mirrored doubles. Scale: one join + one 2-group
    * moment agg (the side is a scan-local predicate) — the
    * distributed-OLS shard shape, 2-row everything after.
    */
  def q400RegressionDiscontinuity(spark: SparkSession, dir: String): DataFrame = {
    val xy = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(expr("floor(c_acctbal * 100.0 + 0.5)").cast("long").as("x"),
        expr("floor(o_totalprice * 100.0 + 0.5) div 100").as("y"))
      .filter(col("x") >= -300000L && col("x") <= 300000L)
      .withColumn("side", when(col("x") < 0, "below").otherwise("above"))
    val withA = xy.groupBy("side")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
      .selectExpr("side", "n", "sx", "sy",
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
          "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b")
      .selectExpr("side", "n", "b",
        "(CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS a")
    val below = withA.filter(col("side") === "below")
      .selectExpr("n AS n_below", "round(b * 100.0, 8) AS slope_below_per_dollar",
        "a AS a_below")
    val above = withA.filter(col("side") === "above")
      .selectExpr("n AS n_above", "round(b * 100.0, 8) AS slope_above_per_dollar",
        "a AS a_above")
    below.crossJoin(above)
      .selectExpr("n_below", "n_above",
        "slope_below_per_dollar", "slope_above_per_dollar",
        "round(a_below, 6) AS limit_below_dollar",
        "round(a_above, 6) AS limit_above_dollar",
        "round(a_above - a_below, 6) AS rd_effect_dollar")
  }

  /** q403: BRADLEY–TERRY PREFERENCE MODEL (BT '52, Hunter's MM '04) —
    * THE pairwise-preference fit behind reward modeling and ranking
    * evals: within each (user, day), event type A "beats" B when A's
    * dollar volume is larger; two MM iterations
    * γ'_i = W_i / Σ_j n_ij/(γ_i+γ_j) from γ=1 fit the strengths,
    * reported normalized (mean 1) with win/loss censuses and ranks.
    * The preference layer the corpus pipeline needs for
    * comparison-labeled data — q337's kappa asks if two raters agree;
    * BT turns many noisy pairwise outcomes into a consistent scale.
    *
    * Determinism: comparisons are integer censuses off bounded
    * per-(user, day) pair joins; γ lives on the 10⁻⁹ BIGINT grid
    * between iterations, each denominator TERM snaps to the 10⁻¹²
    * grid BEFORE the per-i sum (order-invariant), and each γ update
    * is ONE double divide; the oracle unrolls both iterations.
    * Scale: one shuffle to the (user, day, type) census, then a
    * k²-pair join per group where k is bounded by the event-type ENUM
    * cardinality (the census keys on (user, day, event_type), so a
    * group holds at most one row per type — the bound is schema-
    * enforced, unlike q384/q422's data-dependent keys which need
    * explicit caps), then 5-row frames — the Pregel-on-a-census
    * shape; n_ij grids re-scale per deployment.
    */
  def q403BradleyTerry(spark: SparkSession, dir: String): DataFrame = {
    val vol = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"), col("event_type"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .groupBy("user_id", "day", "event_type").agg(sum("cents").as("v"))
    val duels = vol.as("a").join(vol.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.day") === col("b.day") &&
          col("a.event_type") < col("b.event_type"))
      .filter(col("a.v") =!= col("b.v"))
      .select(
        when(col("a.v") > col("b.v"), col("a.event_type"))
          .otherwise(col("b.event_type")).as("wi"),
        when(col("a.v") > col("b.v"), col("b.event_type"))
          .otherwise(col("a.event_type")).as("lj"))
    val wins = duels.groupBy(col("wi").as("i"), col("lj").as("j"))
      .agg(count(lit(1)).as("w"))
    val pairs = wins
      .unionByName(wins.select(col("j").as("i"), col("i").as("j"),
        lit(0L).as("w")))
      .groupBy("i", "j").agg(sum("w").as("w"))
      .localCheckpoint()
    val nij = pairs.as("p")
      .join(pairs.select(col("i").as("j2"), col("j").as("i2"),
        col("w").as("w2")), col("p.i") === col("i2") && col("p.j") === col("j2"))
      .select(col("p.i").as("i"), col("p.j").as("j"), col("w"),
        (col("w") + col("w2")).as("n"))
      .localCheckpoint()
    val types = nij.select(col("i")).distinct()
    def iterate(g: DataFrame): DataFrame =
      nij
        .join(g.select(col("i"), col("gu").as("gi")), "i")
        .join(g.select(col("i").as("j"), col("gu").as("gj")), "j")
        .withColumn("term_u", expr(
          "CAST(floor((CAST(n AS DOUBLE) * 1.0e9 / CAST(gi + gj AS DOUBLE)) * 1.0e12 + 0.5) AS BIGINT)"))
        .groupBy("i")
        .agg(sum("w").as("wi"), sum("term_u").as("ts"))
        .selectExpr("i",
          // no localCheckpoint here: the 5-row frame re-derives cheaply
          // and a checkpoint would hide the bounding aggregate from the
          // global-window plan guard (the q367/q371 precedent)
          "CAST(floor((CAST(wi AS DOUBLE) * 1.0e12 / CAST(ts AS DOUBLE)) * 1.0e9 + 0.5) AS BIGINT) AS gu")
    val g0 = types.withColumn("gu", lit(1000000000L))
    val g2 = iterate(iterate(g0))
    val wl = pairs.groupBy("i")
      .agg(sum("w").as("wins"))
      .join(pairs.groupBy(col("j").as("i")).agg(sum("w").as("losses")), "i")
    val tot = g2.agg(sum("gu").as("sg"), count(lit(1)).as("k"))
    g2.join(wl, "i").crossJoin(broadcast(tot))
      .selectExpr("i AS event_type", "wins", "losses",
        "round(CAST(gu AS DOUBLE) * CAST(k AS DOUBLE) / CAST(sg AS DOUBLE), 6) AS strength")
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("strength").desc, col("event_type"))).cast("long"))
      .orderBy("event_type")
  }

  /** q404: POPULARITY-PROPORTIONAL NEGATIVE SAMPLING (the word2vec /
    * two-tower contrastive recipe): for every (customer, part)
    * positive, draw k=2 negatives ∝ interaction popularity by
    * INVERSE-CDF over the part-popularity census — md5 variates land
    * in cumulative [lo, hi] ranges via the q62-family binned range
    * join. The training-pair generator the embedding pipeline needs
    * (uniform negatives are too easy; popularity sampling is the
    * standard hard-enough default), audited: sample counts of the
    * top-5 drawn parts vs their popularity, and the self-collision
    * census (negative == its own positive — kept visible, dropped
    * downstream).
    *
    * Determinism: variates are md5(salt‖k‖cust‖part) mod total —
    * no RNG; the CDF ranges are integer census windows ordered
    * (n desc, part). Scale: the census is part-cardinality;
    * `BinnedRangeJoin` turns the containment probe into bin
    * equi-joins (no BNLJ over the fact side); everything else is
    * scan-local hashing.
    */
  def q404NegativeSampling(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pos = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
    val pop = pos.groupBy("p").agg(count(lit(1)).as("n"))
      .withColumn("hi", sum("n").over(
        Window.orderBy(col("n").desc, col("p"))) - 1)
      .withColumn("lo", col("hi") - col("n") + 1)
      .select(col("p").as("np"), col("lo"), col("hi"), col("n").as("pop_n"))
      .localCheckpoint()
    val tot = pop.agg((max("hi") + 1).as("tot"), count(lit(1)).as("n_parts"))
    val samples = pos
      .withColumn("k", explode(typedlit(Seq(1, 2))))
      .crossJoin(broadcast(tot))
      .withColumn("v",
        conv(substring(md5(concat_ws("-", lit("neg"), col("k"), col("c"),
          col("p"))), 1, 8), 16, 10).cast("long") % col("tot"))
    // the sampled-negatives join feeds TWO consumers (the 1-row summary
    // and the top-5 census); an eager cut runs the md5 draw + binned
    // range join once instead of once per consumer
    val neg = graft.operators.BinnedRangeJoin.inner(
      samples, pop, "v", "lo", "hi", binWidth = 1024)
      .localCheckpoint(true)
    val summary = neg.agg(count(lit(1)).as("n_neg"),
      sum(when(col("np") === col("p"), 1L).otherwise(0L)).as("self_collisions"),
      countDistinct("np").as("distinct_neg_parts"),
      max("tot").as("n_interactions"))
    neg.groupBy("np").agg(count(lit(1)).as("times_sampled"),
        max("pop_n").as("popularity"))
      .orderBy(col("times_sampled").desc, col("np"))
      .limit(5)
      .crossJoin(broadcast(summary))
      .select(col("np").as("part"), col("times_sampled"), col("popularity"),
        col("n_neg"), col("self_collisions"), col("distinct_neg_parts"),
        col("n_interactions"))
  }

  /** q405: BRIER SCORE + RELIABILITY DIAGRAM (Brier '50, Murphy '73
    * decomposition) — is the purchase-propensity score CALIBRATED?
    * Predictor p̂ = views/(views+5) per user, outcome = purchased;
    * per-decile-bin reliability diagram (n, mean predicted, observed
    * rate) plus the exact Murphy split Brier = reliability −
    * resolution + uncertainty. The probability-quality eval beside
    * q367 (ranking) and q333 (selective risk): a ranker can have
    * great AP and lie about its probabilities — only calibration
    * sees that.
    *
    * Determinism: p̂ is the exact rational v/(v+5) on the VIEW-COUNT
    * census, bin = (10v) div (v+5) integer; every Brier/Murphy term
    * is computed per census cell from exact integers, snapped to the
    * 10⁻⁹ grid before its sum. Scale: one user agg, one view-count
    * census shuffle (≤ distinct view counts), chains on ≤50 rows.
    */
  def q405BrierCalibration(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("v"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
    val cells = users.groupBy("v")
      .agg(count(lit(1)).as("nv"), sum("y").as("yv"))
      .withColumn("ph", expr("CAST(v AS DOUBLE) / CAST(v + 5 AS DOUBLE)"))
      .withColumn("bin", expr("(10 * v) div (v + 5)"))
      .withColumn("bri_u", expr(
        "CAST(floor((CAST(nv AS DOUBLE) * ph * ph - 2.0 * ph * CAST(yv AS DOUBLE) " +
          "+ CAST(yv AS DOUBLE)) * 1.0e9 + 0.5) AS BIGINT)"))
      .withColumn("psum_u", expr(
        "CAST(floor(CAST(nv AS DOUBLE) * ph * 1.0e9 + 0.5) AS BIGINT)"))
    val bins = cells.groupBy("bin")
      .agg(sum("nv").as("nb"), sum("yv").as("yb"), sum("psum_u").as("pb_u"))
    val tot = bins.agg(sum("nb").as("n"), sum("yb").as("ytot"))
    val binsT = bins.crossJoin(broadcast(tot))
      .withColumn("rel_u", expr(
        "CAST(floor(CAST(nb AS DOUBLE) * " +
          "(CAST(pb_u AS DOUBLE) / 1.0e9 / CAST(nb AS DOUBLE) - CAST(yb AS DOUBLE) / CAST(nb AS DOUBLE)) * " +
          "(CAST(pb_u AS DOUBLE) / 1.0e9 / CAST(nb AS DOUBLE) - CAST(yb AS DOUBLE) / CAST(nb AS DOUBLE)) " +
          "* 1.0e9 + 0.5) AS BIGINT)"))
      .withColumn("res_u", expr(
        "CAST(floor(CAST(nb AS DOUBLE) * " +
          "(CAST(yb AS DOUBLE) / CAST(nb AS DOUBLE) - CAST(ytot AS DOUBLE) / CAST(n AS DOUBLE)) * " +
          "(CAST(yb AS DOUBLE) / CAST(nb AS DOUBLE) - CAST(ytot AS DOUBLE) / CAST(n AS DOUBLE)) " +
          "* 1.0e9 + 0.5) AS BIGINT)"))
    val briers = cells.agg(sum("bri_u").as("bsum_u"))
    val decomp = binsT.groupBy("n", "ytot")
      .agg(sum("rel_u").as("rel_s"), sum("res_u").as("res_s"))
      .crossJoin(broadcast(briers))
    binsT.select(col("bin"), col("nb"), col("pb_u"), col("yb"))
      .crossJoin(broadcast(decomp))
      .selectExpr("bin", "nb AS n_users",
        "round(CAST(pb_u AS DOUBLE) / 1.0e9 / CAST(nb AS DOUBLE), 6) AS mean_pred",
        "round(CAST(yb AS DOUBLE) / CAST(nb AS DOUBLE), 6) AS obs_rate",
        "round(CAST(bsum_u AS DOUBLE) / 1.0e9 / CAST(n AS DOUBLE), 6) AS brier",
        "round(CAST(rel_s AS DOUBLE) / 1.0e9 / CAST(n AS DOUBLE), 6) AS reliability",
        "round(CAST(res_s AS DOUBLE) / 1.0e9 / CAST(n AS DOUBLE), 6) AS resolution",
        "round(CAST(ytot AS DOUBLE) / CAST(n AS DOUBLE) * (1.0 - CAST(ytot AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS uncertainty")
      .orderBy("bin")
  }

  /** q406: OFF-POLICY EVALUATION — IPS and SNIPS (Horvitz–Thompson /
    * self-normalized, the counterfactual estimators behind every
    * "would the new policy have done better on the logs" question):
    * logged action = the md5 coin (propensity ½), reward = purchased,
    * target policy π = "treat iff views ≥ 3". V̂_IPS = mean of
    * matched importance-weighted rewards, V̂_SNIPS normalizes by the
    * matched mass; both sit beside the logged value and the naive
    * direct average the estimator exists to correct.
    *
    * Determinism: with propensity ½ both estimators reduce to exact
    * integer-census ratios — one divide each, no weights table.
    * Scale: one user agg + one 1-row reduction.
    */
  def q406OffPolicyEval(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("v"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      .withColumn("a",
        (conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 2))
      .withColumn("pi", when(col("v") >= 3, 1L).otherwise(0L))
    users.agg(count(lit(1)).as("n"),
        sum(when(col("pi") === col("a"), col("y")).otherwise(0L)).as("mr"),
        sum(when(col("pi") === col("a"), 1L).otherwise(0L)).as("mm"),
        sum(when(col("a") === 1, col("y")).otherwise(0L)).as("yt"),
        sum(when(col("a") === 1, 1L).otherwise(0L)).as("nt"),
        sum("y").as("ya"))
      .selectExpr("n", "mm AS n_matched",
        "round(2.0 * CAST(mr AS DOUBLE) / CAST(n AS DOUBLE), 6) AS v_ips",
        "round(CAST(mr AS DOUBLE) / CAST(mm AS DOUBLE), 6) AS v_snips",
        "round(CAST(yt AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS v_logged_treat",
        "round(CAST(ya AS DOUBLE) / CAST(n AS DOUBLE), 6) AS v_naive")
  }

  /** q408: HEAVY-HITTER MOVERS — which parts' REVENUE SHARE moved most
    * between the pre-1996 and post-1996 halves of the order log? Share
    * (not raw revenue) so corpus growth doesn't masquerade as change —
    * the "what changed in the mix" report an ops review actually reads,
    * and the drilldown companion to the distribution-level monitors
    * (PSI/KL/JSD say THAT the mix moved; this names WHO moved it).
    * Top-10 by absolute share delta with both periods' revenue and
    * shares.
    *
    * Determinism: shares on the integer ppm grid (rev·10⁶ div total
    * per period); delta and its magnitude are BIGINT; ties
    * (|Δ| desc, Δ desc, part). Scale: one join-shuffle to the (part,
    * period) census, a 1-row totals broadcast, TakeOrdered heap.
    */
  def q408ShareMovers(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .select(col("l_partkey").as("part"),
        (col("o_orderdate") < lit("1996-01-01").cast("date")).as("early"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("cents"))
      .groupBy("part")
      .agg(sum(when(col("early"), col("cents")).otherwise(0L)).as("rev_a"),
        sum(when(!col("early"), col("cents")).otherwise(0L)).as("rev_b"))
    val tot = rev.agg(sum("rev_a").as("ta"), sum("rev_b").as("tb"))
    rev.crossJoin(broadcast(tot))
      .withColumn("share_a_ppm", expr("rev_a * 1000000L div ta"))
      .withColumn("share_b_ppm", expr("rev_b * 1000000L div tb"))
      .withColumn("delta_ppm", col("share_b_ppm") - col("share_a_ppm"))
      .withColumn("mag", greatest(col("delta_ppm"), -col("delta_ppm")))
      .orderBy(col("mag").desc, col("delta_ppm").desc, col("part"))
      .limit(10)
      .selectExpr("part",
        "round(CAST(rev_a AS DOUBLE) / 100.0, 2) AS rev_early_dollar",
        "round(CAST(rev_b AS DOUBLE) / 100.0, 2) AS rev_late_dollar",
        "share_a_ppm", "share_b_ppm", "delta_ppm")
  }

  /** q409: DOUBLY-ROBUST OFF-POLICY EVALUATION (Dudík '11) — q406's
    * estimator family completed: DR = direct-model baseline + the
    * importance-weighted residual,
    * V̂ = (1/N)Σ[r̂(x,π(x)) + 1{π=a}·(r − r̂(x,a))/p]. Unbiased if
    * EITHER the reward model or the propensity is right — the
    * estimator production policy audits actually use. Reward model
    * r̂(v,a) = the (views, action) cell purchase rate from the log
    * itself; reported beside the IPS/DM legs so the correction is
    * visible.
    *
    * Determinism: every term lives on the (views, action) CENSUS —
    * r̂ is a cell rational, each cell's DR contribution is one
    * mirrored double chain snapped to 10⁻⁹ before the sum. Scale:
    * one user agg → one cell census → chains on ≤100 rows.
    */
  def q409DoublyRobustOpe(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("v"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      .withColumn("a",
        (conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 2))
    val cells = users.groupBy("v", "a")
      .agg(count(lit(1)).as("n_va"), sum("y").as("y_va"))
    // per-views reward-model rates for both actions + the policy arm
    val byV = cells.groupBy("v")
      .agg(sum("n_va").as("n_v"),
        sum(when(col("a") === 1, col("n_va"))).as("n_v1"),
        sum(when(col("a") === 1, col("y_va"))).as("y_v1"),
        sum(when(col("a") === 0, col("n_va"))).as("n_v0"),
        sum(when(col("a") === 0, col("y_va"))).as("y_v0"))
      .withColumn("pi", when(col("v") >= 3, 1L).otherwise(0L))
      // reward model DELIBERATELY action-blind (r̂(v) = the pooled
      // rate): a misspecified DM leg whose bias the importance-weighted
      // residual then corrects — an action-aware model fit on the same
      // log would make the correction identically zero and the row
      // vacuous
      .withColumn("rhat_pi", expr(
        "CAST(coalesce(y_v1, 0L) + coalesce(y_v0, 0L) AS DOUBLE) / CAST(n_v AS DOUBLE)"))
      .withColumn("n_pi", expr("IF(pi = 1, coalesce(n_v1, 0L), coalesce(n_v0, 0L))"))
      .withColumn("y_pi", expr("IF(pi = 1, coalesce(y_v1, 0L), coalesce(y_v0, 0L))"))
      .withColumn("dm_u", expr(
        "CAST(floor(CAST(n_v AS DOUBLE) * rhat_pi * 1.0e9 + 0.5) AS BIGINT)"))
      .withColumn("corr_u", expr(
        "CAST(floor(2.0 * (CAST(y_pi AS DOUBLE) - CAST(n_pi AS DOUBLE) * rhat_pi) * 1.0e9 + 0.5) AS BIGINT)"))
    byV.agg(sum("n_v").as("n"), sum("dm_u").as("dm_s"), sum("corr_u").as("corr_s"),
        sum("y_pi").as("mr"), sum("n_pi").as("mm"))
      .selectExpr("n",
        "round(CAST(dm_s AS DOUBLE) / 1.0e9 / CAST(n AS DOUBLE), 6) AS v_dm",
        "round(2.0 * CAST(mr AS DOUBLE) / CAST(n AS DOUBLE), 6) AS v_ips",
        "round((CAST(dm_s AS DOUBLE) + CAST(corr_s AS DOUBLE)) / 1.0e9 / CAST(n AS DOUBLE), 6) AS v_dr",
        "round(CAST(corr_s AS DOUBLE) / 1.0e9 / CAST(n AS DOUBLE), 6) AS dr_correction")
  }

  /** q410: RAKING / ITERATIVE PROPORTIONAL FITTING (Deming & Stephan
    * '40) — the survey-weighting workhorse: adjust the ORDERING
    * customers' weights so their (market segment × nation-region)
    * margins match the FULL customer base, two IPF sweeps. The
    * selection-bias corrector beside q223's CUPED (variance) and
    * q406/q409 (policy value): any "our active users skew" analysis
    * ships these weights. Per segment-region cell: sample n, base n,
    * fitted weight, and the achieved margin ratios after round 2.
    *
    * Determinism: weights live on the 10⁻⁹ BIGINT grid between
    * sweeps; each ratio update is ONE double divide off integer
    * censuses (row-margin sums of weighted counts are per-cell
    * snapped integers, order-invariant). Scale: everything after the
    * two joins is the |segments|×|regions| cell census — IPF at
    * 100 TB is always census-sized.
    */
  def q410IpfRaking(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cust = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_mktsegment").as("seg"),
        col("n_regionkey").as("reg"))
    // ONE customer pass builds both margins: the old plan aggregated
    // `cust` twice (active-only and base) and inner-joined the censuses;
    // a left join + conditional count produces the identical (ns, nb)
    // cells from a single scan (guide §2.3 — don't compute things
    // twice). The `ns > 0` filter reproduces the old inner join's
    // drop of cells with no active customers.
    val cellsRaw = cust.join(
        Tables.orders(spark, dir).select(col("o_custkey")).distinct(),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("seg", "reg")
      .agg(sum(when(col("o_custkey").isNotNull, 1L).otherwise(0L)).as("ns"),
        count(lit(1)).as("nb"))
      .filter(col("ns") > 0)
      .withColumn("w0", lit(1000000000L))
    // The IPF sweeps run on the ≤ |seg|·|reg| cell frame. The old plan
    // paid per sweep one aggregation plus TWO joins back to the cells
    // (≈ 15 shuffle stages of ~25-row work — pure stage-launch fat,
    // the q438 lesson); per-margin window sums over the same frame
    // compute the identical masses with one tiny exchange per
    // partitioning switch and no joins at all. The margin targets are
    // constant across sweeps, so they ride along as window columns
    // computed once.
    val segW = Window.partitionBy("seg")
    val regW = Window.partitionBy("reg")
    val cells = cellsRaw
      .withColumn("seg_target", sum("nb").over(segW))
      .withColumn("reg_target", sum("nb").over(regW))
    def wcU(wIn: String) = expr(
      s"CAST(floor(CAST(ns AS DOUBLE) * CAST($wIn AS DOUBLE) / 1.0e9 * 1.0e6 + 0.5) AS BIGINT)")
    def sweep(c: DataFrame, dim: String, w: org.apache.spark.sql.expressions.WindowSpec,
        wIn: String, wOut: String): DataFrame =
      c.withColumn("wc_u", wcU(wIn))
        .withColumn("mass_u", sum("wc_u").over(w))
        .withColumn(wOut, expr(
          s"CAST(floor(CAST($wIn AS DOUBLE) * CAST(${dim}_target AS DOUBLE) * 1.0e6 / CAST(mass_u AS DOUBLE) + 0.5) AS BIGINT)"))
        .drop("wc_u", "mass_u")
    val fitted = sweep(sweep(sweep(sweep(
      cells, "seg", segW, "w0", "w1"), "reg", regW, "w1", "w2"),
      "seg", segW, "w2", "w3"), "reg", regW, "w3", "w4")
    fitted
      .withColumn("wc_u", wcU("w4"))
      .withColumn("seg_mass2_u", sum("wc_u").over(segW))
      .selectExpr("seg", "reg", "ns AS n_sample", "nb AS n_base",
        "round(CAST(w4 AS DOUBLE) / 1.0e9, 6) AS weight",
        "round(CAST(seg_mass2_u AS DOUBLE) / 1.0e6 / CAST(seg_target AS DOUBLE), 6) AS seg_margin_ratio")
      .orderBy("seg", "reg")
  }

  /** q415: PRICE ELASTICITY (log-log OLS per brand) — the econometric
    * readout ε = ∂ln q/∂ln p: regress ln(quantity) on ln(unit price)
    * across each brand's line items (unit price = extended/quantity).
    * |ε| > 1 = elastic (discount drives volume), |ε| < 1 = inelastic.
    * The pricing-analytics member of the OLS family: q400 reads a
    * THRESHOLD effect, q365 a LEAD-LAG one, this a LOG-SCALE slope —
    * with R² so a flat scatter isn't read as a real elasticity.
    *
    * Determinism: both lns snap to the ⌊ln·10⁶+½⌋ micro-nat BIGINT
    * grid (q264's device) BEFORE the moments, so Σx/Σy/Σxy/Σx²/Σy²
    * are exact integers; slope/R² are mirrored one-divide chains.
    * Scale: scan-local ln + one brand-keyed moment agg — the GLM
    * shard shape, |brands| rows after.
    */
  def q415PriceElasticity(spark: SparkSession, dir: String): DataFrame = {
    val xy = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .filter(col("l_quantity") >= 1.0)
      .select(col("p_brand").as("brand"),
        expr("CAST(floor(ln(l_extendedprice / l_quantity) * 1000000.0 + 0.5) AS BIGINT)").as("x"),
        expr("CAST(floor(ln(l_quantity) * 1000000.0 + 0.5) AS BIGINT)").as("y"))
    xy.groupBy("brand")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .selectExpr("brand", "n",
        "CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov_n",
        "CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS var_x",
        "CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS var_y")
      .selectExpr("brand", "n",
        "round(cov_n / var_x, 6) AS elasticity",
        "round(cov_n * cov_n / (var_x * var_y), 6) AS r2",
        "abs(cov_n / var_x) > 1.0 AS elastic")
      .orderBy("brand")
  }

  /** q416: PRICE–VOLUME–MIX BRIDGE — the revenue-change decomposition
    * every business review runs: ΔR between the pre/post-1996 halves
    * split per part into VOLUME (Δq at old price), PRICE (Δp at new
    * volume), NEW (parts absent before) and DISCONTINUED (absent
    * after), with the identity Σ effects = ΔR carried IN the output
    * (a bridge that doesn't tie out is worthless). The drilldown
    * companion to q408: movers name parts, the bridge explains the
    * mechanism.
    *
    * Determinism: quantities are integer units, revenues integer
    * cents; the per-part average price is held as the exact rational
    * (cents, qty) pair — effects use cross-multiplied integer forms
    * volume = (q₂−q₁)·r₁·…/q₁ snapped to the cent grid via one
    * floor-div per part, and the residual rounding is surfaced as its
    * own bridge line rather than hidden. Scale: one (part, period)
    * census + census-local arithmetic + a 1-row rollup.
    */
  def q416PriceVolumeMix(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .select(col("l_partkey").as("part"),
        (col("o_orderdate") < lit("1996-01-01").cast("date")).as("early"),
        expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("q"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("r"))
      .groupBy("part")
      .agg(sum(when(col("early"), col("q")).otherwise(0L)).as("q1"),
        sum(when(col("early"), col("r")).otherwise(0L)).as("r1"),
        sum(when(!col("early"), col("q")).otherwise(0L)).as("q2"),
        sum(when(!col("early"), col("r")).otherwise(0L)).as("r2"))
    val effects = per
      // volume effect at old avg price: floor((q2−q1)·r1 / q1). The
      // numerator is SIGNED and Spark's div truncates while DuckDB's //
      // floors — the mod identity (a − ((a % b + b) % b)) div b makes
      // the dividend exactly divisible, so both engines floor.
      .withColumn("num", expr("(q2 - q1) * r1"))
      .selectExpr("part", "q1", "r1", "q2", "r2",
        "CASE WHEN q1 > 0 AND q2 > 0 " +
          "THEN (num - (((num % q1) + q1) % q1)) div q1 ELSE 0 END AS vol_c",
        "CASE WHEN q1 = 0 AND q2 > 0 THEN r2 ELSE 0 END AS new_c",
        "CASE WHEN q2 = 0 AND q1 > 0 THEN -r1 ELSE 0 END AS disc_c")
      .selectExpr("part", "q1", "r1", "q2", "r2", "vol_c", "new_c", "disc_c",
        // price effect = what's left of the part's ΔR after volume
        // (both-period parts only) — makes the per-part identity exact
        "CASE WHEN q1 > 0 AND q2 > 0 THEN (r2 - r1) - vol_c ELSE 0 END AS price_c")
    effects.agg(sum("r1").as("rev_early_c"), sum("r2").as("rev_late_c"),
        sum("vol_c").as("vol"), sum("price_c").as("price"),
        sum("new_c").as("nw"), sum("disc_c").as("disc"))
      .selectExpr(
        "round(CAST(rev_early_c AS DOUBLE) / 100.0, 2) AS rev_early_dollar",
        "round(CAST(rev_late_c AS DOUBLE) / 100.0, 2) AS rev_late_dollar",
        "round(CAST(rev_late_c - rev_early_c AS DOUBLE) / 100.0, 2) AS delta_dollar",
        "round(CAST(vol AS DOUBLE) / 100.0, 2) AS volume_effect_dollar",
        "round(CAST(price AS DOUBLE) / 100.0, 2) AS price_effect_dollar",
        "round(CAST(nw AS DOUBLE) / 100.0, 2) AS new_parts_dollar",
        "round(CAST(disc AS DOUBLE) / 100.0, 2) AS discontinued_dollar",
        "vol + price + nw + disc = rev_late_c - rev_early_c AS ties_out")
  }

  /** q417: TEMPORAL QUANTILE ENVELOPE — the p10/p50/p90 daily band of
    * purchase values: the control-chart view a monitoring dashboard
    * draws around a metric (q83/q335 profile columns ONCE; this tracks
    * the distribution THROUGH time, which is where regressions
    * actually show up — a constant mean with a widening band is an
    * incident). Exact order statistics per day on the dollar-bucket
    * grid.
    *
    * Determinism: q380's census discipline — values snap to dollar
    * buckets, quantiles are cumulative-count inequalities over the
    * (day, bucket) census, reported as the bucket-max candidate.
    * Scale: one shuffle to the (day, bucket) census (bounded by
    * days × value range); windows run on census rows.
    */
  def q417QuantileEnvelope(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val census = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(expr("unix_micros(ts) div 86400000000").as("day"),
        expr("floor(value * 100.0 + 0.5) div 100").as("b"))
      .groupBy("day", "b").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("day").orderBy("b")
    census
      .withColumn("cum", sum("c").over(w))
      .withColumn("n", sum("c").over(Window.partitionBy("day")))
      .groupBy("day")
      .agg(max("n").as("n"),
        min(when(col("cum") * 10 >= col("n"), col("b"))).as("p10_dollar"),
        min(when(col("cum") * 2 >= col("n"), col("b"))).as("p50_dollar"),
        min(when(col("cum") * 10 >= col("n") * 9, col("b"))).as("p90_dollar"))
      .withColumn("band_width", col("p90_dollar") - col("p10_dollar"))
      .orderBy("day")
  }

  /** q418: LITTLE'S LAW AUDIT (L = λW) — the queueing identity as a
    * sessionization sanity check: sessions/hour (λ) times mean session
    * duration (W) must equal average concurrency (L), and L is ALSO
    * measured directly by counting sessions open at each hourly grid
    * instant. A sessionizer whose λW and measured L̄ disagree is
    * dropping or double-counting sessions — the identity audits q97's
    * machinery with arithmetic instead of more code.
    *
    * Determinism: sessions from q97's exact device; λ, W, both L
    * estimates are integer-second censuses and one-divide chains; the
    * instant census explodes each session's contained hour marks
    * (bounded — sessions are minutes long). Scale: q97's partitioned
    * windows + one bounded explode + two 1-row reductions.
    */
  def q418LittlesLaw(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("unix_micros(ts)").as("us"))
      .withColumn("gap_s",
        col("ts").cast("double") - lag(col("ts"), 1).over(w).cast("double"))
      .withColumn("new_s",
        when(col("gap_s").isNull || col("gap_s") > 1800d, 1L).otherwise(0L))
      .withColumn("sid", sum("new_s").over(run))
      .groupBy("user_id", "sid")
      .agg(min("us").as("s0"), max("us").as("s1"))
      .localCheckpoint()
    val span = sess.agg(min("s0").as("t0"), max("s1").as("t1"),
      count(lit(1)).as("n_sessions"), sum(expr("s1 - s0")).as("dur_us"))
    // measured concurrency: sessions open at each full hour they
    // contain (most sessions contain none — the explicit filter keeps
    // sequence() off invalid ranges in both engines)
    val marks = sess
      .withColumn("m0", expr(
        "CAST(ceil(CAST(s0 AS DOUBLE) / 3600000000.0) AS BIGINT) * 3600000000"))
      .filter(col("m0") <= col("s1"))
      .select(explode(expr(
        "sequence(m0, s1, CAST(3600000000 AS BIGINT))")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("open"))
    val measured = marks.agg(count(lit(1)).as("n_marks"), sum("open").as("open_sum"))
    span.crossJoin(broadcast(measured))
      .selectExpr("n_sessions",
        "round(CAST(n_sessions AS DOUBLE) * 3600.0e6 / CAST(t1 - t0 AS DOUBLE), 6) AS lambda_per_hour",
        "round(CAST(dur_us AS DOUBLE) / CAST(n_sessions AS DOUBLE) / 3600.0e6, 6) AS w_hours",
        "round(CAST(n_sessions AS DOUBLE) * 3600.0e6 / CAST(t1 - t0 AS DOUBLE) " +
          "* (CAST(dur_us AS DOUBLE) / CAST(n_sessions AS DOUBLE) / 3600.0e6), 6) AS l_littles",
        "round(CAST(open_sum AS DOUBLE) / CAST(n_marks AS DOUBLE), 6) AS l_measured",
        "n_marks")
  }

  /** q419: COHORT LTV TRIANGLE — cumulative revenue per customer by
    * acquisition-quarter cohort and quarters-since-acquisition: the
    * growth-accounting table behind every payback/LTV:CAC decision
    * (q95 counts RETAINED users; this accumulates what they're WORTH,
    * which is what the spend decision needs). Rows are the classic
    * triangle (older cohorts have more observed ages).
    *
    * Determinism: cohort/age live on the integer quarter grid
    * (year·4 + quarter off date parts — no float month arithmetic);
    * revenue is exact cents; the cumulative runs over the cohort-
    * partitioned AGE census. Scale: one (cohort, age) census shuffle
    * + census windows + a cohort-size broadcast join.
    */
  def q419CohortLtv(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey").as("c"),
        expr("year(o_orderdate) * 4 + quarter(o_orderdate) - 1").cast("long").as("q"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
    val firstQ = o.groupBy("c").agg(min("q").as("q0"))
    val sized = firstQ.groupBy("q0").agg(count(lit(1)).as("cohort_n"))
    val cells = o.join(firstQ, "c")
      .select(col("q0"), (col("q") - col("q0")).as("age"), col("cents"))
      .groupBy("q0", "age").agg(sum("cents").as("rev_c"))
    cells
      .withColumn("cum_c", sum("rev_c").over(
        Window.partitionBy("q0").orderBy("age")))
      .join(sized, "q0")
      .selectExpr("q0 AS cohort_quarter", "age", "cohort_n",
        "round(CAST(rev_c AS DOUBLE) / 100.0, 2) AS rev_dollar",
        "round(CAST(cum_c AS DOUBLE) / CAST(cohort_n AS DOUBLE) / 100.0, 6) AS cum_ltv_per_customer")
      .orderBy("cohort_quarter", "age")
  }

  /** q420: FULFILLMENT SLA REPORT — order-to-ship lag per order
    * priority: exact p50/p95 lag days, the >30-day breach share, and
    * the worst lag. The operations-contract view of the shipping
    * pipeline (and the classic skew check: priorities are SUPPOSED to
    * differ — a flat table means the priority field is theater).
    *
    * Determinism: lag on the integer day grid via datediff;
    * percentiles are cumulative-census inequalities per priority
    * (q396's device); shares on the ppm grid. Scale: one join +
    * one (priority, lag) census shuffle; windows on census rows.
    */
  def q420FulfillmentSla(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val census = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority").as("prio"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("lag_d"))
      .groupBy("prio", "lag_d").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("prio").orderBy("lag_d")
    census
      .withColumn("cum", sum("c").over(w))
      .withColumn("n", sum("c").over(Window.partitionBy("prio")))
      .groupBy("prio")
      .agg(max("n").as("n_lines"),
        min(when(col("cum") * 2 >= col("n"), col("lag_d"))).as("p50_days"),
        min(when(col("cum") * 20 >= col("n") * 19, col("lag_d"))).as("p95_days"),
        sum(when(col("lag_d") > 30, col("c")).otherwise(0L)).as("n_breach"),
        max("lag_d").as("max_days"))
      .selectExpr("prio", "n_lines", "p50_days", "p95_days",
        "n_breach * 1000000L div n_lines AS breach_ppm", "max_days")
      .orderBy("prio")
  }

  /** q421: ABC INVENTORY CLASSIFICATION — the operations counterpart
    * of the Lorenz/Gini READOUTS (q189/q265 measure concentration;
    * this ASSIGNS the classes the warehouse acts on): parts ranked by
    * revenue, class A = the prefix covering 80% of revenue, B = next
    * 15%, C = the tail, reported as per-class censuses with revenue
    * shares and the item-share-vs-revenue-share contrast that IS the
    * 80/20 story.
    *
    * Determinism: ranking is (revenue desc, part) over the part
    * census; class boundaries are integer cross-multiplied
    * inequalities on cumulative cents (cum·100 ≤ tot·80), no float
    * until the output shares. Scale: one shuffle to the part census;
    * the rank window runs on census rows (value-cardinality).
    */
  def q421AbcClassification(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val parts = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("part"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("c"))
      .groupBy("part").agg(sum("c").as("rev"))
    val w = Window.orderBy(col("rev").desc, col("part"))
    val tot = parts.agg(sum("rev").as("trev"), count(lit(1)).as("tn"))
    parts
      .withColumn("cum", sum("rev").over(w))
      .crossJoin(broadcast(tot))
      .withColumn("cls",
        when(col("cum") * 100 <= col("trev") * 80, "A")
          .when(col("cum") * 100 <= col("trev") * 95, "B")
          .otherwise("C"))
      .groupBy("cls")
      .agg(count(lit(1)).as("n_parts"), sum("rev").as("rev_c"),
        max("tn").as("tn"), max("trev").as("trev"))
      // rev_c·10⁶ exceeds BIGINT once class revenue passes ~9·10¹² cents
      // (the sf1 probe's loud ANSI overflow) — the ppm product rides
      // DECIMAL(38,0), div back to an exact ≤10⁶ BIGINT
      .selectExpr("cls", "n_parts",
        "n_parts * 1000000L div tn AS item_share_ppm",
        "CAST(rev_c AS DECIMAL(38,0)) * 1000000 div trev AS rev_share_ppm",
        "round(CAST(rev_c AS DOUBLE) / 100.0, 2) AS revenue_dollar")
      .orderBy("cls")
  }

  /** q422: DUPLICATE-CHARGE DETECTION — the audit-analytics classic:
    * the same customer billed for the same part at the same quantity
    * within 7 days is a candidate double charge. Exact-key blocking
    * makes the pair loop tractable (the q187 discipline: the
    * (customer, part, qty) group IS the block; near-amount variants
    * route through q65's tolerance machinery). Output: the top-10
    * flagged pairs by combined exposure.
    *
    * Determinism: blocks are exact integer keys; the date predicate
    * is integer days; top-10 ties (exposure desc, keys). Scale: one
    * shuffle on the block key, C(block,2) pair loops only inside
    * blocks — and the block size is ENFORCED, not assumed: a
    * row_number over the (cust, part, qty) block keeps the earliest
    * 100 rows (by (d, ok, ln, cents), so ties are only between fully
    * identical rows and the keep-set is swap-invariant), capping one
    * key at C(100,2) ≈ 5·10³ pairs even if a recurring-charge feed
    * bills the same (cust, part, qty) daily for years. A no-op on
    * TPC-H blocks of 1–2 rows.
    */
  def q422DuplicatePayments(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"),
        expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("q"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("cents"),
        col("o_orderdate").cast("date").as("d"),
        col("o_orderkey").as("ok"), col("l_linenumber").as("ln"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("cust", "part", "q")
          .orderBy("d", "ok", "ln", "cents")))
      .filter(col("rnk") <= 100)
      .drop("rnk")
    li.as("a").join(li.as("b"),
        col("a.cust") === col("b.cust") && col("a.part") === col("b.part") &&
          col("a.q") === col("b.q") &&
          (col("a.ok") < col("b.ok") ||
            (col("a.ok") === col("b.ok") && col("a.ln") < col("b.ln"))))
      .filter(abs(datediff(col("a.d"), col("b.d"))) <= 7)
      .select(col("a.cust").as("cust"), col("a.part").as("part"),
        col("a.q").as("quantity"),
        col("a.ok").as("ok_a"), col("a.ln").as("ln_a"),
        col("b.ok").as("ok_b"), col("b.ln").as("ln_b"),
        (col("a.cents") + col("b.cents")).as("exposure_c"),
        abs(datediff(col("a.d"), col("b.d"))).cast("long").as("gap_days"))
      .orderBy(col("exposure_c").desc, col("cust"), col("ok_a"), col("ln_a"),
        col("ok_b"), col("ln_b"))
      .limit(10)
      .selectExpr("cust", "part", "quantity", "ok_a", "ln_a", "ok_b", "ln_b",
        "round(CAST(exposure_c AS DOUBLE) / 100.0, 2) AS exposure_dollar",
        "gap_days")
  }

  /** q423: DIGIT-PATTERN AUDIT — the fraud/fabrication screen q204's
    * Benford first-digit test doesn't cover: LAST cent digits of
    * order totals should be UNIFORM (first digits follow Benford,
    * last digits follow noise — fabricated numbers fail each in its
    * own way), tested by χ² against 1/10 (df=9, 0.95 critical
    * 16.918978); round-number affinity (.00/.50/.99 cent endings) is
    * reported beside it — psychological pricing looks exactly like
    * fabrication to the uniformity test, so the two columns separate
    * the explanations.
    *
    * Determinism: digits are integer mod; χ² = Σ(o_d·10 − n)²/(10n)
    * computed as one mirrored double chain off the 10-cell integer
    * census. Scale: scan-local mod + one 10-cell census.
    */
  def q423DigitAudit(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(spark, dir)
      .select(floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
      .select((col("cents") % 10).as("digit"),
        (col("cents") % 100).as("ending"))
      .groupBy("digit")
      .agg(count(lit(1)).as("o"),
        sum(when(col("ending").isin(0L, 50L, 99L), 1L).otherwise(0L)).as("round_n"))
    val tot2 = cells.agg(sum("o").as("n"), sum("round_n").as("rn"))
    cells.crossJoin(broadcast(tot2))
      .withColumn("chi_term", expr(
        "(CAST(o AS DOUBLE) * 10.0 - CAST(n AS DOUBLE)) * " +
          "(CAST(o AS DOUBLE) * 10.0 - CAST(n AS DOUBLE)) / (10.0 * CAST(n AS DOUBLE))"))
      .withColumn("chi_u", expr("CAST(floor(chi_term * 1.0e9 + 0.5) AS BIGINT)"))
      .groupBy("n", "rn").agg(sum("chi_u").as("chi_s"),
        max(struct(col("o"), col("digit"))).as("modal"))
      .selectExpr("n AS n_orders",
        "rn * 1000000L div n AS round_ending_ppm",
        "round(CAST(chi_s AS DOUBLE) / 1.0e9, 6) AS chi2_last_digit",
        "CAST(chi_s AS DOUBLE) / 1.0e9 > 16.918978 AS reject_uniform",
        "modal.digit AS modal_digit")
  }

  /** q424: BINARY-SEGMENTATION CHANGEPOINT — WHERE did the series
    * shift? The SSE-objective localizer beside the detector family
    * (q271's CUSUM and q381's Page–Hinkley TEST for a shift; binary
    * segmentation finds the split minimizing within-segment variance,
    * the first step of the classic recursive algorithm): exhaustive
    * over every split of the daily revenue series, reporting the
    * argmin day, both segment means, and the variance reduction.
    *
    * Determinism: the candidate sweep is cumulative-census
    * arithmetic — SSE(split) = Σy² − L²/n_L − R²/n_R with every term
    * an exact BIGINT or one snapped ratio: the objective snaps to the
    * centi-dollar² grid via L²·100 div n_L (q389's device), argmin by
    * struct-min (obj, day). Scale: one shuffle to the day census;
    * the sweep is a census window pass, not a per-split rescan.
    */
  def q424BinarySegmentation(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.orders(spark, dir)
      .select(col("o_orderdate").cast("date").as("d"),
        expr("floor(o_totalprice * 100.0 + 0.5) div 100").as("rev"))
      .groupBy("d").agg(sum("rev").as("y"))
    val w = Window.orderBy("d")
    // Σy² is dollars²-scale — BIGINT overflows at sf1 (probe-measured);
    // DECIMAL(38,0), one double conversion in the objective chain
    val tot = daily.agg(count(lit(1)).as("n"), sum("y").as("s"),
      // widen before the product (oracle: y::HUGEINT * y) — a
      // post-product cast still squares in BIGINT under ANSI
      sum(col("y").cast("decimal(38,0)") * col("y")).as("ss"))
    val scans = daily
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("cl", sum("y").over(w))
      .crossJoin(broadcast(tot))
      .filter(col("i") < col("n"))
      // cl² and s² overflow BIGINT at corpus scale — the objective is
      // a mirrored double chain off the exact BIGINT cumulatives,
      // snapped to the unit dollar² grid (split SSE gaps ≫ 1)
      .withColumn("obj_u", expr(
        "CAST(floor(CAST(ss AS DOUBLE) " +
          "- CAST(cl AS DOUBLE) * CAST(cl AS DOUBLE) / CAST(i AS DOUBLE) " +
          "- CAST(s - cl AS DOUBLE) * CAST(s - cl AS DOUBLE) / CAST(n - i AS DOUBLE) " +
          "+ 0.5) AS BIGINT)"))
    scans
      .groupBy("n", "s", "ss")
      .agg(min(struct(col("obj_u"), col("d"), col("i"), col("cl"))).as("b"))
      .selectExpr("n", "b.d AS split_day", "b.i AS n_left",
        "round(CAST(b.cl AS DOUBLE) / CAST(b.i AS DOUBLE), 6) AS mean_left_dollar",
        "round(CAST(s - b.cl AS DOUBLE) / CAST(n - b.i AS DOUBLE), 6) AS mean_right_dollar",
        "round(1.0 - CAST(b.obj_u AS DOUBLE) / " +
          "(CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS variance_reduction")
  }

  /** q425: CORRELATION MATRIX + VIF — the multicollinearity
    * pre-flight every regression (q361/q365/q387/q400) should run
    * first: pairwise Pearson r between quantity, discount% and tax%,
    * and each feature's variance-inflation factor VIF_i = [R⁻¹]_ii
    * from the 3×3 correlation-matrix inverse (VIF > 5-10 means the
    * coefficient is unstable — the diagnosis behind "the sign
    * flipped when I added a feature").
    *
    * Determinism: each r is computed from exact BIGINT moments and
    * snapped to the 10⁻⁹ grid BEFORE the matrix algebra, so the
    * adjugate-based inverse diagonal is a mirrored double chain off
    * three snapped integers. Scale: ONE moment agg over the scan
    * (9 sums), 3-row everything after.
    */
  def q425CorrelationVif(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.lineitem(spark, dir)
      .select(expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("a"),
        expr("CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)").as("b"),
        expr("CAST(floor(l_tax * 100.0 + 0.5) AS BIGINT)").as("c"))
      .agg(count(lit(1)).as("n"), sum("a").as("sa"), sum("b").as("sb"),
        sum("c").as("sc"), sum(col("a") * col("a")).as("saa"),
        sum(col("b") * col("b")).as("sbb"), sum(col("c") * col("c")).as("scc"),
        sum(col("a") * col("b")).as("sab"),
        sum(col("a") * col("c")).as("sac"),
        sum(col("b") * col("c")).as("sbc"))
    def rU(xy: String, xx: String, yy: String, x: String, y: String) =
      s"CAST(floor((CAST(n AS DOUBLE) * CAST($xy AS DOUBLE) - CAST($x AS DOUBLE) * CAST($y AS DOUBLE)) / " +
        s"sqrt((CAST(n AS DOUBLE) * CAST($xx AS DOUBLE) - CAST($x AS DOUBLE) * CAST($x AS DOUBLE)) * " +
        s"(CAST(n AS DOUBLE) * CAST($yy AS DOUBLE) - CAST($y AS DOUBLE) * CAST($y AS DOUBLE))) * 1.0e9 + 0.5) AS BIGINT)"
    val snapped = m.selectExpr("n",
      rU("sab", "saa", "sbb", "sa", "sb") + " AS rab_u",
      rU("sac", "saa", "scc", "sa", "sc") + " AS rac_u",
      rU("sbc", "sbb", "scc", "sb", "sc") + " AS rbc_u")
      .selectExpr("n",
        "CAST(rab_u AS DOUBLE) / 1.0e9 AS rab",
        "CAST(rac_u AS DOUBLE) / 1.0e9 AS rac",
        "CAST(rbc_u AS DOUBLE) / 1.0e9 AS rbc")
      .selectExpr("n", "rab", "rac", "rbc",
        "1.0 + 2.0 * rab * rac * rbc - rab * rab - rac * rac - rbc * rbc AS det")
    snapped.selectExpr("n", "rab", "rac", "rbc", "det",
        "stack(3, " +
          "'quantity', rab, rac, (1.0 - rbc * rbc) / det, " +
          "'discount_pct', rab, rbc, (1.0 - rac * rac) / det, " +
          "'tax_pct', rac, rbc, (1.0 - rab * rab) / det) " +
          "AS (feature, r1, r2, vif)")
      .selectExpr("feature", "n", "round(r1, 6) AS r_first",
        "round(r2, 6) AS r_second", "round(vif, 6) AS vif",
        "vif > 5.0 AS collinear")
      .orderBy("feature")
  }

  /** q426: KENDALL'S COEFFICIENT OF CONCORDANCE W — do the five event
    * types AGREE on which days are big? Each type ranks the days by
    * its own daily dollar volume (the judges×items design); W =
    * 12S/(m²(n³−n)) with the χ² approximation m(n−1)W. The
    * multi-ranker agreement test completing the pair family (q288's
    * τ-b and Spearman compare TWO rankings; W speaks for m at once —
    * the inter-annotator-agreement shape for ranked labels).
    *
    * Determinism: rankings use the strict (volume desc, day) total
    * order — integer ranks, no ties by construction; S is an exact
    * BIGINT off the rank-sum census; W/χ² are one mirrored chain.
    * Only days where ALL m types traded enter (complete design).
    * Scale: one (type, day) census shuffle; rank windows partition
    * by type over census rows; S is census arithmetic.
    */
  def q426KendallW(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .groupBy("event_type", "day").agg(sum("cents").as("v"))
    val complete = daily
      .withColumn("k", count(lit(1)).over(Window.partitionBy("day")))
      .filter(col("k") === 5)
    val ranked = complete
      .withColumn("r", rank().over(
        Window.partitionBy("event_type").orderBy(col("v").desc, col("day")))
        .cast("long"))
    val sums = ranked.groupBy("day").agg(sum("r").as("rsum"))
    val tot = sums.agg(count(lit(1)).as("n"), sum("rsum").as("rtot"),
      sum(col("rsum") * col("rsum")).as("rss"))
    tot.selectExpr("n",
        // S = Σ(R_i − m(n+1)/2)² = ΣR² − (ΣR)²/n exactly (ΣR = m·n(n+1)/2)
        "CAST(rss AS DOUBLE) - CAST(rtot AS DOUBLE) * CAST(rtot AS DOUBLE) / CAST(n AS DOUBLE) AS s")
      .selectExpr("n",
        "round(12.0 * s / (25.0 * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))), 6) AS w")
      .selectExpr("n", "w", "round(5.0 * CAST(n - 1 AS DOUBLE) * w, 6) AS chi2",
        "5.0 * CAST(n - 1 AS DOUBLE) * w > 42.556968 AS reject_independence")
  }

  /** q427: SUPPLIER CONCENTRATION — HHI (Herfindahl–Hirschman) per
    * part class: Σ share², the antitrust/sourcing-risk standard, plus
    * its reciprocal (the EFFECTIVE supplier count — "we have 40
    * suppliers but effectively 3.2") and the top supplier's share.
    * The single-source-risk readout procurement reviews run; the
    * Gini family (q189/q265) measures inequality, HHI prices the
    * blast radius of losing the biggest one.
    *
    * Determinism: shares snap to the ppm grid (rev·10⁶ div total)
    * per supplier BEFORE squaring, so HHI·10¹² is an exact BIGINT
    * census sum and the effective count is one divide; top share by
    * struct-max. Scale: one (class, supplier) census + a class-total
    * join; everything after is census arithmetic.
    */
  def q427SupplierHhi(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .select(expr("element_at(split(p_type, ' '), 1)").as("cls"),
        col("l_suppkey").as("supp"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("c"))
      .groupBy("cls", "supp").agg(sum("c").as("rev"))
    val tot = rev.groupBy("cls").agg(sum("rev").as("trev"),
      count(lit(1)).as("n_suppliers"))
    rev.join(tot, "cls")
      .withColumn("share_ppm", expr("rev * 1000000L div trev"))
      .groupBy("cls")
      .agg(max("n_suppliers").as("n_suppliers"),
        sum(expr("share_ppm * share_ppm")).as("hhi_u"),
        max(struct(col("share_ppm"), col("supp"))).as("top"))
      .selectExpr("cls", "n_suppliers",
        "round(CAST(hhi_u AS DOUBLE) / 1.0e12, 6) AS hhi",
        "round(1.0e12 / CAST(hhi_u AS DOUBLE), 6) AS effective_suppliers",
        "top.share_ppm AS top_share_ppm", "top.supp AS top_supplier")
      .orderBy("cls")
  }

  /** q428: HAAR MULTI-SCALE ENERGY DECOMPOSITION — which TIMESCALE
    * carries the variance? The dyadic wavelet scaleogram of the daily
    * revenue series: detail energy at 2/4/8/16-day scales as shares of
    * total detail energy (daily noise vs weekly structure vs regime
    * moves — q389 asks "is there a weekly pattern", this measures how
    * much of the wiggle lives at EVERY scale). The classic
    * variance-decomposition screen before choosing a smoothing
    * horizon.
    *
    * Determinism: Haar details at level k are DIFFERENCES OF INTEGER
    * BLOCK SUMS (s_left − s_right over 2^(k−1)-day halves) — no
    * division anywhere until the output shares, so every energy is an
    * exact BIGINT (the 2^k normalization folds into the reported
    * per-level scale factor). Only complete 16-day blocks enter.
    * Scale: four independent aggs off the one day census.
    */
  def q428HaarEnergy(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .select(expr("unix_micros(o_orderdate) div 86400000000").as("day"),
        expr("floor(o_totalprice * 100.0 + 0.5) div 100").as("rev"))
      .groupBy("day").agg(sum("rev").as("y"))
    val d0 = daily.agg(min("day").as("day0"))
    val idx = daily.crossJoin(broadcast(d0))
      .select((col("day") - col("day0")).as("i"), col("y"))
      .withColumn("blk", expr("i div 16"))
      .withColumn("nblk", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("blk")))
      .filter(col("nblk") === 16)
      .localCheckpoint()
    def level(k: Int): DataFrame = {
      val half = 1 << (k - 1)
      idx.withColumn("grp", expr(s"i div ${2 * half}"))
        .withColumn("side", expr(s"(i div $half) % 2"))
        .groupBy("grp")
        .agg(sum(when(col("side") === 0, col("y")).otherwise(0L)).as("l"),
          sum(when(col("side") === 1, col("y")).otherwise(0L)).as("r"))
        .agg(count(lit(1)).as("n_details"),
          sum(expr("(l - r) * (l - r)")).as("e"))
        .selectExpr(s"$k AS level", s"${2 * half} AS scale_days",
          "n_details", s"e div ${2 * half} AS energy")
    }
    val levels = (1 to 4).map(level).reduce(_ unionByName _)
    val tot = levels.agg(sum("energy").as("etot"))
    levels.crossJoin(broadcast(tot))
      .selectExpr("level", "scale_days", "n_details", "energy",
        // energy·10⁶ overflows BIGINT at corpus scale — snapped double
        // ratio instead (one divide, mirrored)
        "CAST(floor(CAST(energy AS DOUBLE) * 1.0e6 / CAST(etot AS DOUBLE) + 0.5) AS BIGINT) AS energy_share_ppm")
      .orderBy("level")
  }

  /** q440: SAMPLE-RATIO-MISMATCH AUDIT — the first health check every
    * experimentation platform runs before reading ANY metric (a 50/50
    * split that isn't 50/50 means broken assignment, and every
    * downstream readout is garbage): users coin-assigned by md5, per
    * arrival day and overall, the χ² statistic against the designed
    * split, with the flag evaluated on the INTEGER lattice
    * ((nA−nB)²·1000 > 3841·(nA+nB) ⟺ χ² > 3.841, the 0.05/1-dof cut —
    * no float boundary can flip it).
    *
    * Determinism: assignment is the md5 coin (mirrored hex-prefix
    * parse), censuses are integers, each χ² is one double divide at
    * 6 dp, flags are pure integer comparisons. Scale: one distinct-user
    * shuffle + a day census; the audit is arithmetic on ≤ 30 rows.
    */
  def q440SrmAudit(spark: SparkSession, dir: String): DataFrame = {
    // unit = (user, day) active session: assignment is BY USER (the md5
    // coin), the census is daily actives per arm — the panel an
    // always-on experiment actually monitors (per-user first-arrival
    // collapses to one fixture day and has no daily trajectory)
    val sessions = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
      .withColumn("arm", expr(
        "cast(conv(substring(md5(concat('srm#', cast(user_id as string))), 1, 2), 16, 10) as bigint) % 2"))
    val d0 = sessions.agg(min("day").as("day0"))
    val daily = sessions.crossJoin(broadcast(d0))
      .select((col("day") - col("day0")).as("d"), col("arm"))
      .groupBy("d")
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
      .withColumn("srm_flag", expr(
        "CAST((n_a - n_b) * (n_a - n_b) * 1000L > 3841L * (n_a + n_b) AS INT)").cast("long"))
      .localCheckpoint()
    val tot = daily.agg(sum("n_a").as("ta"), sum("n_b").as("tb"),
      sum("srm_flag").as("n_days_flagged"))
    daily.crossJoin(broadcast(tot))
      .selectExpr("d AS day", "n_a", "n_b",
        "round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b), 6) AS chi2_day",
        "srm_flag",
        "round(CAST((ta - tb) * (ta - tb) AS DOUBLE) / (ta + tb), 6) AS chi2_overall",
        "CAST((ta - tb) * (ta - tb) * 1000L > 3841L * (ta + tb) AS INT) AS srm_overall",
        "n_days_flagged")
      .orderBy("day")
  }

  /** SPRT design constants shared VERBATIM with the oracle (the trig30
    * device): ln-ratios for H0: p = 0.38 vs H1: p = 0.42 (a ±2 pp test
    * bracketing the fixture's ~0.40 session conversion, so the
    * trajectory genuinely wanders) and the Wald boundary ln(19)
    * (α = β = 0.05), builder-computed and injected as shortest-
    * round-trip string literals cast to DOUBLE in BOTH engines —
    * neither evaluates a transcendental.
    */
  private[graft] lazy val sprtK: (String, String, String) = (
    java.lang.Double.toString(math.log(0.42 / 0.38)),
    java.lang.Double.toString(math.log(0.58 / 0.62)),
    java.lang.Double.toString(math.log(19.0)))

  /** q441: SPRT SEQUENTIAL TEST — the always-monitoring complement of
    * the fixed-horizon family (q223 CUPED reduces variance, q440 SRM
    * checks health; SPRT answers "can we STOP YET", the Wald test that
    * legitimizes peeking): arm-B users (md5 coin) arriving by day,
    * conversion = any purchase event, the cumulative log-likelihood
    * ratio for H1: p = 0.65 vs H0: p = 0.60 with ±ln 19 boundaries,
    * and the running decision state per day.
    *
    * Determinism: the ln constants are builder literals ([[sprtK]]);
    * the LLR is cum_conv·K1 + (cum_n − cum_conv)·K2 on exact BIGINT
    * cumulatives (two multiplies, one add — fixed order). The
    * cumulative window rides the ≤ 30-row day census (aggregate-
    * bounded). Scale: one per-user agg + one day census.
    */
  def q441SprtSequential(spark: SparkSession, dir: String): DataFrame = {
    val (k1, k2, bnd) = sprtK
    // unit = (user, day) session, conversion = that user purchased that
    // day — the q440 panel; arm-B sessions accumulate by day so the
    // LLR has a real 30-point trajectory
    val sessions = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("p"))
      .groupBy("user_id", "day").agg(max("p").as("conv"))
      .filter(expr(
        "cast(conv(substring(md5(concat('srm#', cast(user_id as string))), 1, 2), 16, 10) as bigint) % 2 = 1"))
    val d0 = sessions.agg(min("day").as("day0"))
    val daily = sessions.crossJoin(broadcast(d0))
      .select((col("day") - col("day0")).as("d"), col("conv"))
      .groupBy("d")
      .agg(count(lit(1)).as("n"), sum("conv").as("c"))
    val w = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("cum_n", sum("n").over(w))
      .withColumn("cum_c", sum("c").over(w))
      .withColumn("llr", expr(
        s"cum_c * CAST('$k1' AS DOUBLE) + (cum_n - cum_c) * CAST('$k2' AS DOUBLE)"))
      .select(col("d").as("day"), col("cum_n").as("cum_exposures"),
        col("cum_c").as("cum_conversions"),
        expr("round(llr, 6)").as("llr"),
        expr(s"CASE WHEN llr >= CAST('$bnd' AS DOUBLE) THEN 'accept_h1' " +
          s"WHEN llr <= -CAST('$bnd' AS DOUBLE) THEN 'accept_h0' " +
          "ELSE 'continue' END").as("decision"))
      .orderBy("day")
  }

  /** q442: ABC–XYZ MATRIX — the inventory-policy segmentation that
    * crosses VALUE with PREDICTABILITY (q421's ABC ranks revenue; XYZ
    * classes demand variability — an A-item with Z-volatility is the
    * planner's nightmare and the newsvendor's q439 customer): ABC from
    * the exact cumulative-revenue cuts (80/95), XYZ from the monthly
    * demand coefficient of variation (X ≤ 0.5 < Y ≤ 1.0 < Z), the 9
    * cells with item and revenue shares.
    *
    * Determinism: ABC reuses q421's integer cut device; the CV folds
    * to sqrt(n·Σq² − (Σq)²)/Σq — ONE IEEE sqrt and one divide on
    * exact BIGINTs — and snaps to the 10⁻⁶ lattice BEFORE the class
    * cut, so no float boundary decides a class. Scale: one part
    * census + one (part, month) census; the ranking window rides the
    * part-level aggregate (the q421 exception shape).
    */
  def q442AbcXyzMatrix(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("part"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("c"),
        expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("q"),
        expr("CAST((year(l_shipdate) - 1995) * 12 + month(l_shipdate) - 1 AS BIGINT)").as("mi"))
    val rev = li.groupBy("part").agg(sum("c").as("rev"))
    val w = Window.orderBy(col("rev").desc, col("part"))
    val tot = rev.agg(sum("rev").as("trev"), count(lit(1)).as("tn"))
    val abc = rev.withColumn("cum", sum("rev").over(w))
      .crossJoin(broadcast(tot))
      .withColumn("abc",
        when(col("cum") * 100 <= col("trev") * 80, "A")
          .when(col("cum") * 100 <= col("trev") * 95, "B")
          .otherwise("C"))
      .select("part", "rev", "abc", "trev", "tn")
    val xyz = li.groupBy("part", "mi").agg(sum("q").as("d"))
      .groupBy("part")
      .agg(count(lit(1)).as("nm"), sum("d").as("sd"), sum(expr("d * d")).as("ssd"))
      .select(col("part"),
        expr("CAST(floor(sqrt(CAST(nm * ssd - sd * sd AS DOUBLE)) / sd * 1.0e6 + 0.5) AS BIGINT)").as("cv_u"))
      .withColumn("xyz",
        when(col("cv_u") <= 500000L, "X")
          .when(col("cv_u") <= 1000000L, "Y").otherwise("Z"))
    abc.join(xyz, "part")
      .groupBy("abc", "xyz")
      .agg(count(lit(1)).as("n_parts"), sum("rev").as("rev_cell"),
        max("tn").as("tn"), max("trev").as("trev"))
      // the q421 device: the ppm product rides DECIMAL(38,0) (rev_cell·10⁶
      // overflows BIGINT at sf1 — the probe's loud ANSI failure)
      .selectExpr("abc", "xyz", "n_parts",
        "n_parts * 1000000L div tn AS item_share_ppm",
        "CAST(rev_cell AS DECIMAL(38,0)) * 1000000 div trev AS rev_share_ppm")
      .orderBy("abc", "xyz")
  }

  /** q437: CHAIN-LADDER DEVELOPMENT TRIANGLE — the actuarial run-off
    * projection, read here as a FULFILLMENT-COMPLETION forecast (how
    * much of each order cohort's value is still unshipped?): cohorts =
    * order months, development age = ship-lag months (clamped at 5),
    * valuation date = the last order month, so recent cohorts have
    * truncated tails — exactly the reserving triangle. Volume-weighted
    * age-to-age factors over fully-observed cohorts, ultimates =
    * latest diagonal × the remaining-factor product, IBNR = ultimate −
    * observed. The estimator class (Mack '93) every insurer runs;
    * pipelines reuse it for "how complete is this ingest cohort".
    *
    * Determinism: the triangle is an integer cents census with
    * EXPLICIT per-age cumulative columns (no window, no float sums);
    * each factor is one divide of exact BIGINTs; the remaining product
    * is an explicit fixed-order CASE chain (never an aggregate product
    * — float multiplication order stays literal). Scale: one fact scan
    * to an (order-month, dev) census; everything after is arithmetic
    * on ≤ 80 cohort rows.
    */
  def q437ChainLadder(spark: SparkSession, dir: String): DataFrame = {
    val V = 79L // valuation month index (the last order month)
    val paid = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(
        expr("CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS BIGINT)").as("c"),
        expr("CAST((year(l_shipdate) - 1995) * 12 + month(l_shipdate) - 1 AS BIGINT)").as("s"),
        expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)").as("cents"))
      .filter(col("s") <= V)
      .withColumn("dev", least(lit(5L), col("s") - col("c")))
      .groupBy("c")
      .agg(sum(when(col("dev") === 0, col("cents")).otherwise(0L)).as("p0"),
        (1 to 5).map(d =>
          sum(when(col("dev") === d, col("cents")).otherwise(0L)).as(s"p$d")): _*)
      .select(col("c") +: (0 to 5).map(d =>
        (0 to d).map(i => col(s"p$i")).reduce(_ + _).as(s"c$d")): _*)
      .localCheckpoint()
    val fAggs = (1 to 5).flatMap(d => Seq(
      sum(when(col("c") <= V - d, col(s"c$d")).otherwise(0L)).as(s"n$d"),
      sum(when(col("c") <= V - d, col(s"c${d - 1}")).otherwise(0L)).as(s"d$d")))
    val f = paid.agg(fAggs.head, fAggs.tail: _*)
      .select((1 to 5).map(d =>
        expr(s"CAST(n$d AS DOUBLE) / CAST(d$d AS DOUBLE)").as(s"f$d")): _*)
    paid.crossJoin(broadcast(f))
      .withColumn("latest_dev", least(lit(5L), lit(V) - col("c")))
      .withColumn("paid_to_date", expr(
        "CASE latest_dev WHEN 0 THEN c0 WHEN 1 THEN c1 WHEN 2 THEN c2 " +
          "WHEN 3 THEN c3 WHEN 4 THEN c4 ELSE c5 END"))
      // fixed-order remaining development product (literal chains)
      .withColumn("rem", expr(
        "CASE latest_dev WHEN 5 THEN CAST(1 AS DOUBLE) WHEN 4 THEN f5 " +
          "WHEN 3 THEN f4 * f5 WHEN 2 THEN f3 * (f4 * f5) " +
          "WHEN 1 THEN f2 * (f3 * (f4 * f5)) " +
          "ELSE f1 * (f2 * (f3 * (f4 * f5))) END"))
      .select(col("c").as("cohort_month"), col("latest_dev"),
        col("paid_to_date"),
        expr("round(CAST(paid_to_date AS DOUBLE) * rem / 100.0, 2)").as("ultimate"),
        expr("round(CAST(paid_to_date AS DOUBLE) * rem / 100.0 - CAST(paid_to_date AS DOUBLE) / 100.0, 2)").as("ibnr"))
      .orderBy("cohort_month")
  }

  /** q438: HURST EXPONENT via rescaled-range (R/S) analysis — the
    * long-memory diagnostic the correlation family lacks (q389's ACF
    * sees one lag at a time; H reads PERSISTENCE itself: H > 0.5
    * trending, < 0.5 mean-reverting, ≈ 0.5 random walk — the decision
    * between momentum and reversion smoothing): R/S per block at block
    * sizes 5/10/15/30 over the 30-day daily-revenue series, H = the
    * log-log regression slope.
    *
    * Determinism: the range R is computed on the INTEGER lattice
    * (U_t = m·cumsum − t·blocksum, so max−min is exact); S folds to
    * sqrt(m·Σy² − (Σy)²) (IEEE-exact); each block's ln(R/S) and each
    * ln(m) snap to the 10⁻⁶ BIGINT grid, so the 4-point regression is
    * exact integer moments with ONE double divide. Scale: one day
    * census; the block windows partition a ≤ 30-row frame.
    */
  def q438HurstExponent(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .groupBy("day").agg(sum("cents").as("y"))
    val d0 = daily.agg(min("day").as("day0"))
    val idx = daily.crossJoin(broadcast(d0))
      .select((col("day") - col("day0")).as("i"), col("y"))
      .localCheckpoint()
    // ONE pass for all four block sizes: explode the size grid so the
    // cascade is a single (m, blk)-keyed shuffle with one window pair,
    // not four unioned branches (4 shuffles + 8 WindowExecs). The
    // per-(m, blk) arithmetic is unchanged, so the result is
    // bit-identical; the plan loses ~0.5 s of pure stage-launch
    // overhead, which was ~all of this query's cost (the round-17
    // stabilizer flag root-caused in BASELINE.md: fixed overhead on a
    // ≤30-row frame, not data work).
    val wRun = Window.partitionBy("m", "blk").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("m", "blk")
    val blocks = idx
      .withColumn("m", explode(expr("array(5L, 10L, 15L, 30L)")))
      .withColumn("blk", expr("i div m"))
      .withColumn("t", expr("(i % m) + 1L"))
      .withColumn("cum", sum("y").over(wRun))
      .withColumn("sball", sum("y").over(wAll))
      .withColumn("u", expr("m * cum - t * sball"))
      .groupBy("m", "blk")
      .agg(count(lit(1)).as("n"), max("sball").as("sb"),
        sum(expr("y * y")).as("ssb"),
        max("u").as("umax"), min("u").as("umin"))
      .filter(col("n") === col("m"))
      .select(col("m"), col("blk"),
        expr("CAST(floor(ln(CAST(umax - umin AS DOUBLE) / " +
          "sqrt(CAST(m * ssb - sb * sb AS DOUBLE))) * 1.0e6 + 0.5) AS BIGINT)").as("lnrs_u"))
    val perSize = blocks.groupBy("m")
      .agg(count(lit(1)).as("n_blocks"), sum("lnrs_u").as("su"))
      .withColumn("ybar_u", expr("CAST(floor(CAST(su AS DOUBLE) / n_blocks + 0.5) AS BIGINT)"))
      .withColumn("x_u", expr("CAST(floor(ln(CAST(m AS DOUBLE)) * 1.0e6 + 0.5) AS BIGINT)"))
      .localCheckpoint()
    val reg = perSize.agg(count(lit(1)).as("k"),
      sum("x_u").as("sx"), sum("ybar_u").as("sy"),
      sum(expr("x_u * ybar_u")).as("sxy"), sum(expr("x_u * x_u")).as("sxx"))
    perSize.crossJoin(broadcast(reg))
      .select(col("m").as("block_size"), col("n_blocks"),
        expr("round(CAST(ybar_u AS DOUBLE) / 1.0e6, 6)").as("mean_ln_rs"),
        expr("round(CAST(k * sxy - sx * sy AS DOUBLE) / CAST(k * sxx - sx * sx AS DOUBLE), 6)").as("hurst"))
      .orderBy("block_size")
  }

  /** q439: NEWSVENDOR ORDER QUANTITY — the one-period stochastic
    * inventory optimum (a domain the engine had not touched: quantile
    * DECISIONS, not quantile descriptions): per part class, the
    * critical-fractile quantity Q* = F⁻¹(cu/(cu+co)) with underage 3 :
    * overage 1 (the 75% service fractile) against the observed daily
    * shipment-demand distribution, scored empirically against the
    * MEAN-demand heuristic — the savings column is the case for
    * carrying the quantile, the classic "mean is the wrong order"
    * lesson.
    *
    * Determinism: EXACT integers end to end — demand is an integer
    * census, Q* is the type-1 quantile off a cumulative census (no
    * interpolation), the mean heuristic rounds half-up via the
    * (2S+n) div (2n) identity, and both cost evaluations are integer
    * sums. Scale: one (class, day) census; the quantile is a
    * partitioned cumulative over per-class day censuses; cost joins
    * broadcast the ≤ |class| quantities.
    */
  def q439Newsvendor(spark: SparkSession, dir: String): DataFrame = {
    val (cu, co) = (3L, 1L) // underage : overage → fractile 0.75
    val demand = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
        .select(col("p_partkey"), expr("element_at(split(p_type, ' '), 1)").as("cls"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("cls"),
        expr("unix_micros(l_shipdate) div 86400000000").as("day"),
        floor(col("l_quantity") + 0.5).cast("long").as("q"))
      .groupBy("cls", "day").agg(sum("q").as("d"))
      .localCheckpoint()
    val nTot = demand.groupBy("cls")
      .agg(count(lit(1)).as("n"), sum("d").as("s"))
    val census = demand.groupBy("cls", "d").agg(count(lit(1)).as("cnt"))
    val wc = Window.partitionBy("cls").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val qstar = census.withColumn("cum", sum("cnt").over(wc))
      .join(nTot, "cls")
      // type-1 quantile: smallest d with cum ≥ ceil(0.75·n)
      .filter(col("cum") >= expr(s"($cu * n + ($cu + $co) - 1L) div (${cu + co})"))
      .groupBy("cls").agg(min("d").as("q_star"))
    val qs = nTot.join(qstar, "cls")
      .select(col("cls"), col("n").as("n_days"), col("q_star"),
        expr("(2L * s + n) div (2L * n)").as("q_mean"))
    demand.join(broadcast(qs), "cls")
      .groupBy("cls")
      .agg(max("n_days").as("n_days"), max("q_star").as("q_star"),
        max("q_mean").as("q_mean"),
        sum(expr(s"$cu * greatest(d - q_star, 0L) + $co * greatest(q_star - d, 0L)")).as("cost_star"),
        sum(expr(s"$cu * greatest(d - q_mean, 0L) + $co * greatest(q_mean - d, 0L)")).as("cost_mean"))
      .withColumn("savings_ppm",
        expr("(cost_mean - cost_star) * 1000000L div cost_mean"))
      .orderBy("cls")
  }

  /** The 30-point trig table q431 shares VERBATIM with its oracle (the
    * q230 bandFams device): cos/sin of 2πm/30 snapped to the 10⁻⁹
    * BIGINT grid by the BUILDER, injected as a literal into both plans
    * — the engines never evaluate a transcendental, so there is no
    * cross-libm 1-ulp risk anywhere in the DFT.
    */
  private[graft] lazy val trig30: Seq[(Int, Long, Long)] =
    (0 until 30).map { m =>
      val th = 2.0 * math.Pi * m / 30.0
      (m, math.floor(math.cos(th) * 1e9 + 0.5).toLong,
        math.floor(math.sin(th) * 1e9 + 0.5).toLong)
    }

  /** q431: PERIODOGRAM — the Fourier power spectrum of the daily event
    * series (q389's ACF and q428's Haar ask "is there structure at lag
    * L / scale S"; the periodogram reads off WHICH FREQUENCY carries
    * the power, the standard seasonality detector before fitting any
    * seasonal model): the 30-day event-count series against the k =
    * 1..14 harmonics, reporting each harmonic's integer cos/sin
    * projections and power. A weekly cycle shows as a spike near
    * k ≈ 4 (period ≈ 7.5 d).
    *
    * Determinism: the trig table is a builder-computed literal shared
    * verbatim with the oracle ([[trig30]]), so A_k/B_k are EXACT BIGINT
    * dot products of the integer day census with integer constants;
    * the power is one double chain on those exact integers. Scale: one
    * day-census shuffle; the harmonic sweep is a 14-row broadcast grid
    * against a ≤ 30-row census — arithmetic, not data motion.
    */
  def q431Periodogram(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n"))
    val d0 = daily.agg(min("day").as("day0"))
    val idx = daily.crossJoin(broadcast(d0))
      .select((col("day") - col("day0")).as("t"), col("n"))
      .localCheckpoint()
    val cosArr = typedlit(trig30.map(_._2))
    val sinArr = typedlit(trig30.map(_._3))
    spark.range(1L, 15L).select(col("id").as("k"))
      .crossJoin(broadcast(idx))
      .withColumn("m", expr("(k * t) % 30"))
      .withColumn("ca", cosArr).withColumn("sa", sinArr)
      .groupBy("k")
      .agg(count(lit(1)).as("n_days"),
        sum(expr("n * element_at(ca, CAST(m + 1 AS INT))")).as("amp_cos_u"),
        sum(expr("n * element_at(sa, CAST(m + 1 AS INT))")).as("amp_sin_u"))
      .selectExpr("k", "round(CAST(30 AS DOUBLE) / k, 6) AS period_days", "n_days",
        "amp_cos_u", "amp_sin_u",
        // u-grid is 1e9: power = (A² + B²) / 1e18 in count² units; the
        // squares stay exact (|A| < 2^53 at any plausible day census)
        "round((CAST(amp_cos_u AS DOUBLE) * CAST(amp_cos_u AS DOUBLE) + " +
          "CAST(amp_sin_u AS DOUBLE) * CAST(amp_sin_u AS DOUBLE)) / 1.0e18, 6) AS power")
      .orderBy("k")
  }

  /** q435: THEIL INDEX DECOMPOSITION — the inequality measure that
    * DECOMPOSES (q189's Gini ranks corpora by concentration but cannot
    * split it): how unequal are document token counts, and is the
    * inequality WITHIN sources or BETWEEN them? T = T_within +
    * T_between exactly, the additivity that makes Theil the curation
    * diagnostic: between-source inequality is fixed by re-weighting
    * the mixture (q69's knob); within-source inequality only by
    * filtering inside the source.
    *
    * Determinism: every ln argument is a ratio of exact BIGINTs (one
    * IEEE divide), each entropy TERM snaps to the 10⁻⁹ BIGINT grid
    * BEFORE its census sum (order-invariant — the house transcendental
    * discipline), and every reported index is one divide of snapped
    * sums. Scale: one token-count scan, one source census, per-doc
    * terms are scan-local arithmetic against broadcast totals.
    */
  def q435TheilDecomposition(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documentsSpread(spark, dir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("x"))
    val bySrc = docs.groupBy("source")
      .agg(count(lit(1)).as("ng"), sum("x").as("sg")).localCheckpoint()
    val tot = bySrc.agg(sum("ng").as("n"), sum("sg").as("s"))
    val terms = docs.join(broadcast(bySrc), "source").crossJoin(broadcast(tot))
      .select(col("source"), col("ng"), col("sg"), col("n"), col("s"),
        // global term: r = x·N/S; group term: rg = x·Ng/Sg — exact-int
        // ratios; snap r·ln(r) to 1e-9 BEFORE summing
        expr("CAST(floor((CAST(x AS DOUBLE) * n / s) * ln(CAST(x AS DOUBLE) * n / s) * 1.0e9 + 0.5) AS BIGINT)").as("tu"),
        expr("CAST(floor((CAST(x AS DOUBLE) * ng / sg) * ln(CAST(x AS DOUBLE) * ng / sg) * 1.0e9 + 0.5) AS BIGINT)").as("tgu"))
    val perSrc = terms.groupBy("source")
      .agg(max("ng").as("n_docs"), max("sg").as("sg"),
        max("n").as("n"), max("s").as("s"),
        sum("tu").as("tu_sum"), sum("tgu").as("tgu_sum"))
      .select(col("source"), col("n_docs"), col("sg"), col("n"), col("s"),
        col("tu_sum"),
        expr("round(CAST(tgu_sum AS DOUBLE) / n_docs / 1.0e9, 6)").as("theil_in_source"),
        // between term: (Sg/S)·ln((Sg/Ng)/(S/N)) snapped to 1e-9
        expr("CAST(floor((CAST(sg AS DOUBLE) / s) * ln((CAST(sg AS DOUBLE) * n) / (CAST(s AS DOUBLE) * n_docs)) * 1.0e9 + 0.5) AS BIGINT)").as("btu"),
        // within contribution: (Sg/S)·T_g snapped to 1e-9
        expr("CAST(floor((CAST(sg AS DOUBLE) / s) * (CAST(tgu_sum AS DOUBLE) / n_docs / 1.0e9) * 1.0e9 + 0.5) AS BIGINT)").as("wtu"))
      .localCheckpoint()
    val totals = perSrc.agg(
      max("n").as("n"), sum("tu_sum").as("tu_all"),
      sum("btu").as("btu_sum"), sum("wtu").as("wtu_sum"))
    perSrc.crossJoin(broadcast(totals.select(
        expr("round(CAST(tu_all AS DOUBLE) / n / 1.0e9, 6)").as("theil_total"),
        expr("round(CAST(wtu_sum AS DOUBLE) / 1.0e9, 6)").as("theil_within"),
        expr("round(CAST(btu_sum AS DOUBLE) / 1.0e9, 6)").as("theil_between"))))
      .select(col("source"), col("n_docs"),
        expr("sg * 1000000L div s").as("token_share_ppm"),
        col("theil_in_source"), col("theil_total"), col("theil_within"),
        col("theil_between"))
      .orderBy("source")
  }

  /** q430: SYNTHETIC CONTROL (Abadie–Gardeazabal, lite) — the
    * small-N complement of q429's DiD (DiD needs parallel trends;
    * synthetic control BUILDS the counterfactual as a weighted donor
    * combination fit on the pre period): treated unit = the BUILDING
    * segment's monthly revenue, donors = the other four segments,
    * weights ∝ 1/(1+pre-RMSE) — the deterministic closed-form stand-in
    * for the constrained regression (no QP in either engine). Per post
    * month: actual, synthetic, gap; every row carries the pre-fit RMSE
    * (is the counterfactual credible?) and the mean post gap (the
    * effect estimate).
    *
    * Determinism: monthly revenues are integer dollars on a fixed
    * 80-month grid (missing cells are explicit zeros on both sides);
    * donor SSEs are exact BIGINTs, IEEE sqrt is correctly rounded,
    * inverse weights snap to the 10⁻⁹ grid before normalization, the
    * synthetic series is an exact BIGINT dot product with ONE divide
    * per month, and the summary stats divide BIGINT sums. Scale: one
    * (segment, month) census; everything after is arithmetic on ≤ 400
    * census rows with broadcast weights.
    */
  def q430SyntheticControl(spark: SparkSession, dir: String): DataFrame = {
    val preMonths = 48L // 1995-01 .. 1998-12
    val cell = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("seg"),
        expr("(year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1").cast("long").as("mi"),
        expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) div 100").as("d"))
      .groupBy("seg", "mi").agg(sum("d").as("y"))
    // fixed grid: every (segment, month 0..79) exists, absent cells = 0
    val grid = cell.select("seg").distinct()
      .crossJoin(broadcast(spark.range(0L, 80L).select(col("id").as("mi"))))
      .join(cell, Seq("seg", "mi"), "left")
      .select(col("seg"), col("mi"), coalesce(col("y"), lit(0L)).as("y"))
      .localCheckpoint()
    val treated = grid.filter(col("seg") === "BUILDING")
      .select(col("mi"), col("y").as("yt"))
    val donors = grid.filter(col("seg") =!= "BUILDING")
    val w = donors.join(broadcast(treated), "mi")
      .filter(col("mi") < preMonths)
      .groupBy("seg")
      .agg(sum(expr("(y - yt) * (y - yt)")).as("sse"))
      .select(col("seg"),
        expr(s"CAST(floor(1.0e9 / (1.0 + sqrt(CAST(sse AS DOUBLE) / $preMonths)) + 0.5) AS BIGINT)").as("inv_u"))
    val wtot = w.agg(sum("inv_u").as("w_sum"))
    val synth = donors.join(broadcast(w), "seg")
      .groupBy("mi").agg(sum(expr("inv_u * y")).as("num"))
      .crossJoin(broadcast(wtot))
      .select(col("mi"), col("num"), col("w_sum"),
        // exact integer synthetic dollars for the pre-fit SSE
        expr("num div w_sum").as("synth_d"))
    val joined = synth.join(treated, "mi").localCheckpoint()
    val summary = joined.agg(
      sum(when(col("mi") < preMonths,
        expr("(yt - synth_d) * (yt - synth_d)")).otherwise(0L)).as("pre_sse"),
      sum(when(col("mi") >= preMonths, col("yt")).otherwise(0L)).as("post_act"),
      sum(when(col("mi") >= preMonths, col("num")).otherwise(0L)).as("post_num"),
      sum(when(col("mi") >= preMonths, 1L).otherwise(0L)).as("n_post"),
      max("w_sum").as("ws"))
    joined.filter(col("mi") >= preMonths)
      .crossJoin(broadcast(summary))
      .selectExpr("mi AS month_idx", "yt AS actual_dollars",
        "round(CAST(num AS DOUBLE) / w_sum, 6) AS synthetic_dollars",
        "round(yt - CAST(num AS DOUBLE) / w_sum, 6) AS gap",
        s"round(sqrt(CAST(pre_sse AS DOUBLE) / $preMonths), 6) AS pre_rmse",
        "round((CAST(post_act AS DOUBLE) - CAST(post_num AS DOUBLE) / ws) / n_post, 6) AS mean_post_gap")
      .orderBy("month_idx")
  }

  /** q429: DIFFERENCE-IN-DIFFERENCES — the workhorse quasi-experimental
    * estimator the causal family was missing (q409/q406 evaluate logged
    * POLICIES; DiD evaluates an INTERVENTION that hit one cohort at a
    * known time): treated = BUILDING-segment customers, post = orders
    * from 1998-07-01 on, outcome = order value. The 2×2 cell censuses,
    * the four cell means, each group's pre→post change, and the DiD
    * estimate (treated change minus control change — the parallel-trends
    * counterfactual). The segment split is as-if-random in the fixture,
    * so DiD ≈ 0 is itself the validity readout.
    *
    * Determinism: cells are integer (count, cents-sum) censuses; each
    * mean is ONE double divide of exact BIGINTs; the DiD chain is
    * deterministic IEEE arithmetic on those quotients, snapped at 6 dp.
    * Scale: one broadcast dim join (customer segment) + a 4-cell
    * conditional agg — a single scan, no shuffle wider than the census.
    */
  def q429DiffInDiff(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-07-01").cast("timestamp")
    val cells = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(
        when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L).as("t"),
        when(col("o_orderdate") >= cut, 1L).otherwise(0L).as("p"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
      .groupBy()
      .agg(
        sum(when(col("t") === 1 && col("p") === 0, 1L).otherwise(0L)).as("n_t0"),
        sum(when(col("t") === 1 && col("p") === 1, 1L).otherwise(0L)).as("n_t1"),
        sum(when(col("t") === 0 && col("p") === 0, 1L).otherwise(0L)).as("n_c0"),
        sum(when(col("t") === 0 && col("p") === 1, 1L).otherwise(0L)).as("n_c1"),
        sum(when(col("t") === 1 && col("p") === 0, col("cents")).otherwise(0L)).as("s_t0"),
        sum(when(col("t") === 1 && col("p") === 1, col("cents")).otherwise(0L)).as("s_t1"),
        sum(when(col("t") === 0 && col("p") === 0, col("cents")).otherwise(0L)).as("s_c0"),
        sum(when(col("t") === 0 && col("p") === 1, col("cents")).otherwise(0L)).as("s_c1"))
    cells.selectExpr(
      "n_t0", "n_t1", "n_c0", "n_c1",
      "round(CAST(s_t0 AS DOUBLE) / n_t0 / 100.0, 6) AS mean_treated_pre",
      "round(CAST(s_t1 AS DOUBLE) / n_t1 / 100.0, 6) AS mean_treated_post",
      "round(CAST(s_c0 AS DOUBLE) / n_c0 / 100.0, 6) AS mean_control_pre",
      "round(CAST(s_c1 AS DOUBLE) / n_c1 / 100.0, 6) AS mean_control_post",
      "round(CAST(s_t1 AS DOUBLE) / n_t1 / 100.0 - CAST(s_t0 AS DOUBLE) / n_t0 / 100.0, 6) AS diff_treated",
      "round(CAST(s_c1 AS DOUBLE) / n_c1 / 100.0 - CAST(s_c0 AS DOUBLE) / n_c0 / 100.0, 6) AS diff_control",
      "round((CAST(s_t1 AS DOUBLE) / n_t1 / 100.0 - CAST(s_t0 AS DOUBLE) / n_t0 / 100.0) - " +
        "(CAST(s_c1 AS DOUBLE) / n_c1 / 100.0 - CAST(s_c0 AS DOUBLE) / n_c0 / 100.0), 6) AS did")
  }

  /** q434: COCHRAN–MANTEL–HAENSZEL stratified odds ratio — the
    * Simpson's-paradox-proof 2×2 pooling (q358's family reports rates;
    * CMH asks whether EXPOSURE→OUTCOME association survives stratum
    * adjustment): exposure = deep discount (≥ 6%), outcome = returned
    * line (flag R), strata = customer region. Per stratum the 2×2
    * cells and odds ratio; pooled, both the CRUDE (collapsed, Simpson-
    * vulnerable) and the CMH (stratum-weighted) estimates ride every
    * row for the side-by-side read.
    *
    * Determinism: cells are integer censuses; each CMH term a·d/n and
    * b·c/n snaps to the 10⁻⁶ BIGINT grid BEFORE the cross-stratum sum
    * (order-invariant), and each reported OR is one double divide at
    * 6 dp. Scale: fact scan + three broadcast dim hops to the region
    * label, one (stratum, exposed, outcome) census — everything after
    * is arithmetic on ≤ 5 rows.
    */
  def q434CmhOddsRatio(spark: SparkSession, dir: String): DataFrame = {
    val dims = broadcast(Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
      .join(Tables.nation(spark, dir),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey").as("ck"), col("r_name").as("stratum")))
    val cells = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        when(col("l_discount") >= 0.06, 1L).otherwise(0L).as("exposed"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("ret"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(dims, col("o_custkey") === col("ck"))
      .groupBy("stratum")
      .agg(
        sum(when(col("exposed") === 1 && col("ret") === 1, 1L).otherwise(0L)).as("a"),
        sum(when(col("exposed") === 1 && col("ret") === 0, 1L).otherwise(0L)).as("b"),
        sum(when(col("exposed") === 0 && col("ret") === 1, 1L).otherwise(0L)).as("c"),
        sum(when(col("exposed") === 0 && col("ret") === 0, 1L).otherwise(0L)).as("d"))
      .localCheckpoint()
    // a·d·10⁶ is stratum-count²-scale (wraps BIGINT around sf100) —
    // the q421 class; per-term DECIMAL(38,0), the summed quotients stay BIGINT
    val pooled = cells.agg(
      sum(expr("CAST(a AS DECIMAL(38,0)) * d * 1000000 div (a + b + c + d)")).as("cmh_num_u"),
      sum(expr("CAST(b AS DECIMAL(38,0)) * c * 1000000 div (a + b + c + d)")).as("cmh_den_u"),
      sum("a").as("ta"), sum("b").as("tb"), sum("c").as("tc"), sum("d").as("td"))
    cells.crossJoin(broadcast(pooled))
      .selectExpr("stratum", "a", "b", "c", "d",
        "round(CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE), 6) AS stratum_or",
        "round(CAST(cmh_num_u AS DOUBLE) / CAST(cmh_den_u AS DOUBLE), 6) AS cmh_or",
        "round(CAST(ta * td AS DOUBLE) / CAST(tb * tc AS DOUBLE), 6) AS crude_or")
      .orderBy("stratum")
  }

  /** q436: CROSS-CORRELATION FUNCTION between the view and purchase
    * daily series at leads/lags −7..+7 — the "does engagement LEAD
    * conversion, and by how many days?" diagnostic (q389's ACF
    * correlates a series with ITSELF; the CCF correlates two series
    * and its peak lag is the forecasting/attribution offset). Pearson
    * r per lag over the overlapping days, with the overlap length.
    *
    * Determinism: per-lag moments (n, Σx, Σy, Σxy, Σx², Σy²) are exact
    * BIGINT censuses of integer daily counts; r is one double chain
    * (IEEE sqrt is correctly rounded — deterministic) snapped at 6 dp.
    * Scale: one (day, type) census shuffle; the lag sweep is a
    * broadcast 15-row explode joined against the ≤ 30-row census —
    * arithmetic, not data motion.
    */
  def q436CrossCorrelation(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(expr("unix_micros(ts) div 86400000000").as("day"), col("event_type"))
      .groupBy("day")
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      .localCheckpoint()
    val lags = spark.range(-7L, 8L).select(col("id").as("lag"))
    lags.crossJoin(broadcast(daily.select(col("day").as("dx"), col("x"))))
      .join(broadcast(daily.select(col("day").as("dy"), col("y"))),
        col("dy") === col("dx") + col("lag"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n_days"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"),
        sum(expr("x * x")).as("sxx"),
        sum(expr("y * y")).as("syy"))
      .selectExpr("lag", "n_days",
        "round((CAST(n_days * sxy - sx * sy AS DOUBLE)) / " +
          "(sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE)) * " +
          "sqrt(CAST(n_days * syy - sy * sy AS DOUBLE))), 6) AS ccf")
      .orderBy("lag")
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q429_diff_in_diff" -> (q429DiffInDiff _),
    "q440_srm_audit" -> (q440SrmAudit _),
    "q441_sprt_sequential" -> (q441SprtSequential _),
    "q442_abc_xyz_matrix" -> (q442AbcXyzMatrix _),
    "q437_chain_ladder" -> (q437ChainLadder _),
    "q438_hurst_exponent" -> (q438HurstExponent _),
    "q439_newsvendor" -> (q439Newsvendor _),
    "q430_synthetic_control" -> (q430SyntheticControl _),
    "q431_periodogram" -> (q431Periodogram _),
    "q434_cmh_odds_ratio" -> (q434CmhOddsRatio _),
    "q435_theil_decomposition" -> (q435TheilDecomposition _),
    "q436_cross_correlation" -> (q436CrossCorrelation _),
    "q427_supplier_hhi" -> (q427SupplierHhi _),
    "q428_haar_energy" -> (q428HaarEnergy _),
    "q425_correlation_vif" -> (q425CorrelationVif _),
    "q426_kendall_w" -> (q426KendallW _),
    "q423_digit_audit" -> (q423DigitAudit _),
    "q424_binary_segmentation" -> (q424BinarySegmentation _),
    "q421_abc_classification" -> (q421AbcClassification _),
    "q422_duplicate_payments" -> (q422DuplicatePayments _),
    "q419_cohort_ltv" -> (q419CohortLtv _),
    "q420_fulfillment_sla" -> (q420FulfillmentSla _),
    "q417_quantile_envelope" -> (q417QuantileEnvelope _),
    "q418_littles_law" -> (q418LittlesLaw _),
    "q415_price_elasticity" -> (q415PriceElasticity _),
    "q416_price_volume_mix" -> (q416PriceVolumeMix _),
    "q409_doubly_robust_ope" -> (q409DoublyRobustOpe _),
    "q410_ipf_raking" -> (q410IpfRaking _),
    "q408_share_movers" -> (q408ShareMovers _),
    "q405_brier_calibration" -> (q405BrierCalibration _),
    "q406_off_policy_eval" -> (q406OffPolicyEval _),
    "q404_negative_sampling" -> (q404NegativeSampling _),
    "q403_bradley_terry" -> (q403BradleyTerry _),
    "q401_xml_roundtrip" -> (q401XmlRoundtrip _),
    "q402_text_source" -> (q402TextSource _),
    "q399_qini_uplift" -> (q399QiniUplift _),
    "q400_regression_discontinuity" -> (q400RegressionDiscontinuity _),
    "q398_jensen_shannon" -> (q398JensenShannon _),
    "q396_time_to_convert" -> (q396TimeToConvert _),
    "q393_friedman_test" -> (q393FriedmanTest _),
    "q394_mahalanobis_outliers" -> (q394MahalanobisOutliers _),
    "q392_ljung_box" -> (q392LjungBox _),
    "q389_seasonal_decomp" -> (q389SeasonalDecomp _),
    "q390_sequence_patterns" -> (q390SequencePatterns _),
    "q387_huber_regression" -> (q387HuberRegression _),
    "q385_perm_importance" -> (q385PermImportance _),
    "q386_readability" -> (q386Readability _),
    "q383_target_encoding" -> (q383TargetEncoding _),
    "q384_item_item_cf" -> (q384ItemItemCf _),
    "q381_page_hinkley" -> (q381PageHinkley _),
    "q382_grid_density" -> (q382GridDensity _),
    "q379_hill_tail" -> (q379HillTail _),
    "q380_pinball_quantile" -> (q380PinballQuantile _),
    "q377_expectations_suite" -> (q377ExpectationsSuite _),
    "q378_burstiness" -> (q378Burstiness _),
    "q374_boosted_stumps" -> (q374BoostedStumps _),
    "q376_hellinger_drift" -> (q376HellingerDrift _),
    "q371_runs_test" -> (q371RunsTest _),
    "q372_markov_entropy" -> (q372MarkovEntropy _),
    "q373_mcnemar" -> (q373McNemar _),
    "q369_pacf" -> (q369Pacf _),
    "q370_cooks_distance" -> (q370CooksDistance _),
    "q367_pr_curve" -> (q367PrCurve _),
    "q364_binaryfile_source" -> (q364BinaryfileSource _),
    "q365_granger_test" -> (q365GrangerTest _),
    "q360_permutation_test" -> (q360PermutationTest _),
    "q361_logistic_newton" -> (q361LogisticNewton _),
    "q358_brown_forsythe" -> (q358BrownForsythe _),
    "q354_higher_moments" -> (q354HigherMoments _),
    "q350_slo_burn_rate" -> (q350SloBurnRate _),
    "q348_join_card_estimate" -> (q348JoinCardEstimate _),
    "q347_wilson_ranking" -> (q347WilsonRanking _),
    "q342_capture_recapture" -> (q342CaptureRecapture _),
    "q344_negbinomial_fit" -> (q344NegBinomialFit _),
    "q341_median_ci" -> (q341MedianCi _),
    "q338_modularity" -> (q338Modularity _),
    "q336_decision_stump" -> (q336DecisionStump _),
    "q334_dispersion_test" -> (q334DispersionTest _),
    "q335_column_stats" -> (q335ColumnStats _),
    "q332_mondrian" -> (q332Mondrian _),
    "q329_systematic_sample" -> (q329SystematicSample _),
    "q328_markov_attribution" -> (q328MarkovAttribution _),
    "q331_diff_in_diff" -> (q331DiffInDiff _),
    "q327_cohort_ltv" -> (q327CohortLtv _),
    "q322_shapley_attribution" -> (q322ShapleyAttribution _),
    "q323_mutual_info" -> (q323MutualInfo _),
    "q316_kruskal_wallis" -> (q316KruskalWallis _),
    "q318_mann_kendall" -> (q318MannKendall _),
    "q311_share_of_parent" -> (q311ShareOfParent _),
    "q312_source_freshness" -> (q312SourceFreshness _),
    "q310_date_spine" -> (q310DateSpine _),
    "q309_sprt" -> (q309Sprt _),
    "q305_t_closeness" -> (q305TCloseness _),
    "q308_watermark_delay" -> (q308WatermarkDelay _),
    "q301_consistent_hash" -> (q301ConsistentHash _),
    "q302_keyset_pagination" -> (q302KeysetPagination _),
    "q299_session_paths" -> (q299SessionPaths _),
    "q297_theil_sen" -> (q297TheilSen _),
    "q292_rfm_segments" -> (q292RfmSegments _),
    "q293_seq_pattern_support" -> (q293SeqPatternSupport _),
    "q294_ccf" -> (q294Ccf _),
    "q288_kendall_tau" -> (q288KendallTau _),
    "q285_bh_fdr" -> (q285BhFdr _),
    "q283_spearman" -> (q283Spearman _),
    "q284_acf" -> (q284Acf _),
    "q280_ks_test" -> (q280KsTest _),
    "q279_seq_source_pushdown" -> (q279SeqSourcePushdown _),
    "q276_design_effect" -> (q276DesignEffect _),
    "q273_isotonic_calibration" -> (q273IsotonicCalibration _),
    "q271_cusum_changepoint" -> (q271CusumChangepoint _),
    "q263_auc_roc" -> (q263AucRoc _),
    "q226_tape_microstructure" -> (q226TapeMicrostructure _),
    "q224_label_propagation" -> (q224LabelPropagation _),
    "q222_jackknife" -> (q222Jackknife _),
    "q223_cuped_variance" -> (q223CupedVariance _),
    "q221_cooccurrence_lift" -> (q221CooccurrenceLift _),
    "q218_erasure_sweep" -> (q218ErasureSweep _),
    "q232_k_anonymity" -> (q232KAnonymity _),
    "q233_bootstrap_ci" -> (q233BootstrapCi _),
    "q241_multi_touch_attribution" -> (q241MultiTouchAttribution _),
    "q243_time_to_convert" -> (q243TimeToConvert _),
    "q245_markov_transitions" -> (q245MarkovTransitions _),
    "q251_ipw_effect" -> (q251IpwEffect _),
    "q252_power_analysis" -> (q252PowerAnalysis _),
    "q254_conformal_calibration" -> (q254ConformalCalibration _),
    "q256_l_diversity" -> (q256LDiversity _),
    "q258_dp_noisy_counts" -> (q258DpNoisyCounts _),
    "q261_seasonal_decomposition" -> (q261SeasonalDecomposition _),
    "q204_benford" -> (q204Benford _),
    "q206_lead_lag" -> (q206LeadLag _),
    "q207_seasonal_anomaly" -> (q207SeasonalAnomaly _),
    "q203_mann_whitney" -> (q203MannWhitney _),
    "q193_chi_squared" -> (q193ChiSquared _),
    "q123_sql_group_by_all" -> (q123SqlGroupByAll _),
    "q124_sql_window_clause" -> (q124SqlWindowClause _),
    "q159_sql_listagg" -> (q159SqlListagg _),
    "q169_sql_udf" -> (q169SqlUdf _),
    "q171_quantile_calibration" -> (q171QuantileCalibration _),
    "q175_integrity_audit" -> (q175IntegrityAudit _),
    "q181_running_distinct" -> (q181RunningDistinct _),
    "q184_skew_report" -> (q184SkewReport _),
    "q176_ab_ttest" -> (q176AbTtest _),
    "q177_markov_transitions" -> (q177MarkovTransitions _),
    "q95_cohort_retention" -> (q95CohortRetention _),
    "q96_funnel" -> (q96Funnel _),
    "q98_rolling_actives" -> (q98RollingActives _),
    "q83_profile" -> (q83Profile _),
    "q53_filter_breadth" -> (q53FilterBreadth _),
    "q54_sort_nulls" -> (q54SortNulls _),
    "q55_posexplode_stack" -> (q55PosexplodeStack _),
    "q56_csv_json_roundtrip" -> (q56CsvJsonRoundtrip _),
    "q116_orc_roundtrip" -> (q116OrcRoundtrip _),
    "q118_table_fingerprint" -> (q118TableFingerprint _),
    "q57_sample_split" -> (q57SampleSplit _),
    "q99_sql_subqueries" -> (q99SqlSubqueries _),
    "q110_sql_window" -> (q110SqlWindow _),
    "q99b_sql_not_exists" -> (q99bSqlNotExists _),
    "q101_sql_pivot" -> (q101SqlPivot _),
    "q102_sql_grouping_sets" -> (q102SqlGroupingSets _),
    "q103_sql_unpivot" -> (q103SqlUnpivot _),
    "q112_sql_recursive" -> (q112SqlRecursive _),
    "q113_sql_lateral" -> (q113SqlLateral _)
  )

  /** DuckDB replay of the q224 graph + three LP rounds — ends with
    * `edges` and `r3` in scope; shared by q224/q338.
    */
  private val oracleLpRounds: String =
    """WITH cu AS (
        |  SELECT o.o_orderkey, c.c_nationkey AS cn
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |e0 AS (
        |  SELECT cu.cn, s.s_nationkey AS sn, count(*)::BIGINT AS w
        |  FROM lineitem l JOIN cu ON l.l_orderkey = cu.o_orderkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  GROUP BY cu.cn, sn),
        |edges AS (
        |  SELECT u, v, sum(w)::BIGINT AS w FROM (
        |    SELECT cn AS u, sn AS v, w FROM e0
        |    UNION ALL SELECT sn AS u, cn AS v, w FROM e0)
        |  GROUP BY u, v),
        |n0 AS (SELECT DISTINCT u AS node, u AS label FROM edges),
        |r1 AS (
        |  SELECT u AS node, label FROM (
        |    SELECT u, label, lw,
        |           row_number() OVER (PARTITION BY u
        |                              ORDER BY lw DESC, label ASC) AS rn
        |    FROM (SELECT e.u, n.label, sum(e.w)::BIGINT AS lw
        |          FROM edges e JOIN n0 n ON e.v = n.node
        |          GROUP BY e.u, n.label))
        |  WHERE rn = 1),
        |r2 AS (
        |  SELECT u AS node, label FROM (
        |    SELECT u, label, lw,
        |           row_number() OVER (PARTITION BY u
        |                              ORDER BY lw DESC, label ASC) AS rn
        |    FROM (SELECT e.u, n.label, sum(e.w)::BIGINT AS lw
        |          FROM edges e JOIN r1 n ON e.v = n.node
        |          GROUP BY e.u, n.label))
        |  WHERE rn = 1),
        |r3 AS (
        |  SELECT u AS node, label FROM (
        |    SELECT u, label, lw,
        |           row_number() OVER (PARTITION BY u
        |                              ORDER BY lw DESC, label ASC) AS rn
        |    FROM (SELECT e.u, n.label, sum(e.w)::BIGINT AS lw
        |          FROM edges e JOIN r2 n ON e.v = n.node
        |          GROUP BY e.u, n.label))
        |  WHERE rn = 1)""".stripMargin

  override val oracles: Map[String, String] = Map(
    // same md5 coin (hex-prefix parse), same integer-lattice flags
    "q440_srm_audit" ->
      """WITH sess AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |armed AS (
        |  SELECT day,
        |         ('0x' || substr(md5('srm#' || user_id::VARCHAR), 1, 2))::BIGINT % 2 AS arm
        |  FROM sess),
        |d0 AS (SELECT min(day) AS day0 FROM armed),
        |daily AS (
        |  SELECT a.day - z.day0 AS d,
        |         sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b
        |  FROM armed a, d0 z GROUP BY 1),
        |fl AS (
        |  SELECT d, n_a, n_b,
        |         CASE WHEN (n_a - n_b) * (n_a - n_b) * 1000 > 3841 * (n_a + n_b)
        |              THEN 1 ELSE 0 END::BIGINT AS srm_flag
        |  FROM daily),
        |tot AS (SELECT sum(n_a)::BIGINT AS ta, sum(n_b)::BIGINT AS tb,
        |               sum(srm_flag)::BIGINT AS n_days_flagged FROM fl)
        |SELECT f.d AS day, f.n_a, f.n_b,
        |       round((f.n_a - f.n_b) * (f.n_a - f.n_b) / (f.n_a + f.n_b)::DOUBLE, 6) + 0.0 AS chi2_day,
        |       f.srm_flag,
        |       round((t.ta - t.tb) * (t.ta - t.tb) / (t.ta + t.tb)::DOUBLE, 6) + 0.0 AS chi2_overall,
        |       (CASE WHEN (t.ta - t.tb) * (t.ta - t.tb) * 1000 > 3841 * (t.ta + t.tb)
        |             THEN 1 ELSE 0 END)::INT AS srm_overall,
        |       t.n_days_flagged
        |FROM fl f, tot t ORDER BY f.d""".stripMargin,
    // the same builder ln constants (shortest-round-trip literals),
    // same exact cumulative censuses, same fixed-order LLR
    "q441_sprt_sequential" -> {
      val (k1, k2, bnd) = sprtK
      s"""WITH sess AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS conv
        |  FROM events GROUP BY 1, 2),
        |armb AS (
        |  SELECT day, conv FROM sess
        |  WHERE ('0x' || substr(md5('srm#' || user_id::VARCHAR), 1, 2))::BIGINT % 2 = 1),
        |d0 AS (SELECT min(day) AS day0 FROM armb),
        |daily AS (
        |  SELECT a.day - z.day0 AS d, count(*)::BIGINT AS n, sum(conv)::BIGINT AS c
        |  FROM armb a, d0 z GROUP BY 1),
        |cum AS (
        |  SELECT d,
        |         sum(n) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_n,
        |         sum(c) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_c
        |  FROM daily),
        |llr AS (
        |  SELECT d, cum_n, cum_c,
        |         cum_c * '$k1'::DOUBLE + (cum_n - cum_c) * '$k2'::DOUBLE AS llr
        |  FROM cum)
        |SELECT d AS day, cum_n AS cum_exposures, cum_c AS cum_conversions,
        |       round(llr, 6) + 0.0 AS llr,
        |       CASE WHEN llr >= '$bnd'::DOUBLE THEN 'accept_h1'
        |            WHEN llr <= -('$bnd'::DOUBLE) THEN 'accept_h0'
        |            ELSE 'continue' END AS decision
        |FROM llr ORDER BY day""".stripMargin
    },
    // q421's integer ABC cuts crossed with the 10^-6-snapped CV classes
    "q442_abc_xyz_matrix" ->
      """WITH li AS (
        |  SELECT l_partkey AS part,
        |         floor(l_extendedprice * 100.0 + 0.5)::BIGINT AS c,
        |         floor(l_quantity + 0.5)::BIGINT AS q,
        |         ((year(l_shipdate) - 1995) * 12 + month(l_shipdate) - 1)::BIGINT AS mi
        |  FROM lineitem),
        |rev AS (SELECT part, sum(c)::BIGINT AS rev FROM li GROUP BY 1),
        |tot AS (SELECT sum(rev)::BIGINT AS trev, count(*)::BIGINT AS tn FROM rev),
        |abc AS (
        |  SELECT r.part, r.rev, t.trev, t.tn,
        |         CASE WHEN sum(r.rev) OVER (ORDER BY r.rev DESC, r.part
        |                                    ROWS UNBOUNDED PRECEDING) * 100 <= t.trev * 80 THEN 'A'
        |              WHEN sum(r.rev) OVER (ORDER BY r.rev DESC, r.part
        |                                    ROWS UNBOUNDED PRECEDING) * 100 <= t.trev * 95 THEN 'B'
        |              ELSE 'C' END AS abc
        |  FROM rev r, tot t),
        |xyz AS (
        |  SELECT part,
        |         CASE WHEN cv_u <= 500000 THEN 'X'
        |              WHEN cv_u <= 1000000 THEN 'Y' ELSE 'Z' END AS xyz
        |  FROM (SELECT part,
        |               floor(sqrt((nm * ssd - sd * sd)::DOUBLE) / sd * 1.0e6 + 0.5)::BIGINT AS cv_u
        |        FROM (SELECT part, count(*)::BIGINT AS nm, sum(d)::BIGINT AS sd,
        |                     sum(d * d)::BIGINT AS ssd
        |              FROM (SELECT part, mi, sum(q)::BIGINT AS d FROM li GROUP BY 1, 2)
        |              GROUP BY 1)))
        |SELECT a.abc, x.xyz, count(*)::BIGINT AS n_parts,
        |       (count(*) * 1000000 // max(a.tn))::BIGINT AS item_share_ppm,
        |       (sum(a.rev) * 1000000 // max(a.trev))::BIGINT AS rev_share_ppm
        |FROM abc a JOIN xyz x USING (part)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // same cents triangle with explicit cumulative columns, same
    // fully-observed-cohort factor sums, same literal product order
    "q437_chain_ladder" ->
      """WITH paid AS (
        |  SELECT ((year(o.o_orderdate) - 1995) * 12 + month(o.o_orderdate) - 1)::BIGINT AS c,
        |         least(5, ((year(l.l_shipdate) - 1995) * 12 + month(l.l_shipdate) - 1) -
        |                  ((year(o.o_orderdate) - 1995) * 12 + month(o.o_orderdate) - 1))::BIGINT AS dev,
        |         floor(l.l_extendedprice * 100.0 + 0.5)::BIGINT AS cents
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE ((year(l.l_shipdate) - 1995) * 12 + month(l.l_shipdate) - 1) <= 79),
        |tri AS (
        |  SELECT c,
        |         sum(CASE WHEN dev = 0 THEN cents ELSE 0 END)::BIGINT AS p0,
        |         sum(CASE WHEN dev = 1 THEN cents ELSE 0 END)::BIGINT AS p1,
        |         sum(CASE WHEN dev = 2 THEN cents ELSE 0 END)::BIGINT AS p2,
        |         sum(CASE WHEN dev = 3 THEN cents ELSE 0 END)::BIGINT AS p3,
        |         sum(CASE WHEN dev = 4 THEN cents ELSE 0 END)::BIGINT AS p4,
        |         sum(CASE WHEN dev = 5 THEN cents ELSE 0 END)::BIGINT AS p5
        |  FROM paid GROUP BY 1),
        |cum AS (
        |  SELECT c, p0 AS c0, p0+p1 AS c1, p0+p1+p2 AS c2, p0+p1+p2+p3 AS c3,
        |         p0+p1+p2+p3+p4 AS c4, p0+p1+p2+p3+p4+p5 AS c5
        |  FROM tri),
        |f AS (
        |  SELECT
        |    sum(CASE WHEN c <= 78 THEN c1 ELSE 0 END)::DOUBLE / sum(CASE WHEN c <= 78 THEN c0 ELSE 0 END)::DOUBLE AS f1,
        |    sum(CASE WHEN c <= 77 THEN c2 ELSE 0 END)::DOUBLE / sum(CASE WHEN c <= 77 THEN c1 ELSE 0 END)::DOUBLE AS f2,
        |    sum(CASE WHEN c <= 76 THEN c3 ELSE 0 END)::DOUBLE / sum(CASE WHEN c <= 76 THEN c2 ELSE 0 END)::DOUBLE AS f3,
        |    sum(CASE WHEN c <= 75 THEN c4 ELSE 0 END)::DOUBLE / sum(CASE WHEN c <= 75 THEN c3 ELSE 0 END)::DOUBLE AS f4,
        |    sum(CASE WHEN c <= 74 THEN c5 ELSE 0 END)::DOUBLE / sum(CASE WHEN c <= 74 THEN c4 ELSE 0 END)::DOUBLE AS f5
        |  FROM cum),
        |proj AS (
        |  SELECT u.c, least(5, 79 - u.c)::BIGINT AS latest_dev,
        |         CASE least(5, 79 - u.c) WHEN 0 THEN c0 WHEN 1 THEN c1
        |              WHEN 2 THEN c2 WHEN 3 THEN c3 WHEN 4 THEN c4
        |              ELSE c5 END::BIGINT AS paid_to_date,
        |         CASE least(5, 79 - u.c) WHEN 5 THEN 1.0::DOUBLE WHEN 4 THEN f.f5
        |              WHEN 3 THEN f.f4 * f.f5 WHEN 2 THEN f.f3 * (f.f4 * f.f5)
        |              WHEN 1 THEN f.f2 * (f.f3 * (f.f4 * f.f5))
        |              ELSE f.f1 * (f.f2 * (f.f3 * (f.f4 * f.f5))) END AS rem
        |  FROM cum u, f)
        |SELECT c AS cohort_month, latest_dev, paid_to_date,
        |       round(paid_to_date::DOUBLE * rem / 100.0, 2) + 0.0 AS ultimate,
        |       round(paid_to_date::DOUBLE * rem / 100.0 - paid_to_date::DOUBLE / 100.0, 2) + 0.0 AS ibnr
        |FROM proj ORDER BY cohort_month""".stripMargin,
    // same integer U-lattice ranges, same 10^-6 snaps, same exact
    // 4-point regression moments
    "q438_hurst_exponent" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |         sum(floor(value * 100.0 + 0.5)::BIGINT)::BIGINT AS y
        |  FROM events GROUP BY 1),
        |d0 AS (SELECT min(day) AS day0 FROM daily),
        |idx AS (SELECT d.day - z.day0 AS i, d.y FROM daily d, d0 z),
        |expand AS (
        |  SELECT s.m, i.i // s.m AS blk, (i.i % s.m) + 1 AS t, i.y
        |  FROM (SELECT unnest([5, 10, 15, 30])::BIGINT AS m) s, idx i),
        |win AS (
        |  SELECT m, blk, t, y,
        |         sum(y) OVER (PARTITION BY m, blk ORDER BY t
        |                      ROWS UNBOUNDED PRECEDING) AS cum,
        |         sum(y) OVER (PARTITION BY m, blk) AS sball
        |  FROM expand),
        |bl AS (
        |  SELECT m, blk, count(*)::BIGINT AS n, max(sball)::BIGINT AS sb,
        |         sum(y * y)::BIGINT AS ssb,
        |         max(m * cum - t * sball)::BIGINT AS umax,
        |         min(m * cum - t * sball)::BIGINT AS umin
        |  FROM win GROUP BY 1, 2 HAVING count(*) = m),
        |blocks AS (
        |  SELECT m, blk,
        |         floor(ln((umax - umin)::DOUBLE /
        |                  sqrt((m * ssb - sb * sb)::DOUBLE)) * 1.0e6 + 0.5)::BIGINT AS lnrs_u
        |  FROM bl),
        |persize AS (
        |  SELECT m, count(*)::BIGINT AS n_blocks, sum(lnrs_u)::BIGINT AS su,
        |         floor(sum(lnrs_u)::DOUBLE / count(*) + 0.5)::BIGINT AS ybar_u,
        |         floor(ln(m::DOUBLE) * 1.0e6 + 0.5)::BIGINT AS x_u
        |  FROM blocks GROUP BY m),
        |reg AS (
        |  SELECT count(*)::BIGINT AS k, sum(x_u)::BIGINT AS sx,
        |         sum(ybar_u)::BIGINT AS sy, sum(x_u * ybar_u)::BIGINT AS sxy,
        |         sum(x_u * x_u)::BIGINT AS sxx
        |  FROM persize)
        |SELECT p.m AS block_size, p.n_blocks,
        |       round(p.ybar_u::DOUBLE / 1.0e6, 6) + 0.0 AS mean_ln_rs,
        |       round((r.k * r.sxy - r.sx * r.sy)::DOUBLE /
        |             (r.k * r.sxx - r.sx * r.sx)::DOUBLE, 6) + 0.0 AS hurst
        |FROM persize p, reg r ORDER BY p.m""".stripMargin,
    // same integer demand census, same type-1 quantile cut, same
    // integer cost evaluations
    "q439_newsvendor" ->
      """WITH demand AS (
        |  SELECT string_split(p.p_type, ' ')[1] AS cls,
        |         epoch_us(l.l_shipdate) // 86400000000 AS day,
        |         sum(floor(l.l_quantity + 0.5)::BIGINT)::BIGINT AS d
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |ntot AS (SELECT cls, count(*)::BIGINT AS n, sum(d)::BIGINT AS s
        |         FROM demand GROUP BY 1),
        |census AS (SELECT cls, d, count(*)::BIGINT AS cnt
        |           FROM demand GROUP BY 1, 2),
        |qstar AS (
        |  SELECT c.cls, min(c.d)::BIGINT AS q_star
        |  FROM (SELECT cls, d,
        |               sum(cnt) OVER (PARTITION BY cls ORDER BY d
        |                              ROWS UNBOUNDED PRECEDING) AS cum
        |        FROM census) c
        |  JOIN ntot t USING (cls)
        |  WHERE c.cum >= (3 * t.n + 3) // 4
        |  GROUP BY 1),
        |qs AS (
        |  SELECT t.cls, t.n AS n_days, q.q_star,
        |         ((2 * t.s + t.n) // (2 * t.n))::BIGINT AS q_mean
        |  FROM ntot t JOIN qstar q USING (cls))
        |SELECT d.cls, max(q.n_days) AS n_days, max(q.q_star) AS q_star,
        |       max(q.q_mean) AS q_mean,
        |       sum(3 * greatest(d.d - q.q_star, 0) + greatest(q.q_star - d.d, 0))::BIGINT AS cost_star,
        |       sum(3 * greatest(d.d - q.q_mean, 0) + greatest(q.q_mean - d.d, 0))::BIGINT AS cost_mean,
        |       ((sum(3 * greatest(d.d - q.q_mean, 0) + greatest(q.q_mean - d.d, 0))
        |         - sum(3 * greatest(d.d - q.q_star, 0) + greatest(q.q_star - d.d, 0)))
        |        * 1000000 // sum(3 * greatest(d.d - q.q_mean, 0) + greatest(q.q_mean - d.d, 0)))::BIGINT AS savings_ppm
        |FROM demand d JOIN qs q USING (cls)
        |GROUP BY d.cls ORDER BY d.cls""".stripMargin,
    // the SAME builder-computed 10^-9 trig table (no transcendental is
    // evaluated by either engine), same exact BIGINT dot products
    "q431_periodogram" ->
      s"""WITH trig(m, c, s) AS (VALUES
        |  ${trig30.map { case (m, c, s) => s"($m, ${c}::BIGINT, ${s}::BIGINT)" }.mkString(",\n|  ")}),
        |daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, count(*)::BIGINT AS n
        |  FROM events GROUP BY 1),
        |d0 AS (SELECT min(day) AS day0 FROM daily),
        |idx AS (SELECT d.day - z.day0 AS t, d.n FROM daily d, d0 z),
        |m AS (
        |  SELECT k.k, count(*)::BIGINT AS n_days,
        |         sum(i.n * tr.c)::BIGINT AS amp_cos_u,
        |         sum(i.n * tr.s)::BIGINT AS amp_sin_u
        |  FROM (SELECT unnest(generate_series(1, 14))::BIGINT AS k) k,
        |       idx i JOIN trig tr ON tr.m = (k.k * i.t) % 30
        |  GROUP BY 1)
        |SELECT k, round(30.0 / k, 6) + 0.0 AS period_days, n_days,
        |       amp_cos_u, amp_sin_u,
        |       round((amp_cos_u::DOUBLE * amp_cos_u::DOUBLE +
        |              amp_sin_u::DOUBLE * amp_sin_u::DOUBLE) / 1.0e18, 6) + 0.0
        |         AS power
        |FROM m ORDER BY k""".stripMargin,
    // same exact-int ln ratios, same 10^-9 term snaps before every sum
    "q435_theil_decomposition" ->
      """WITH docs AS (
        |  SELECT source, len(string_split(text, ' '))::BIGINT AS x
        |  FROM documents),
        |bysrc AS (
        |  SELECT source, count(*)::BIGINT AS ng, sum(x)::BIGINT AS sg
        |  FROM docs GROUP BY 1),
        |tot AS (SELECT sum(ng)::BIGINT AS n, sum(sg)::BIGINT AS s FROM bysrc),
        |terms AS (
        |  SELECT d.source, b.ng, b.sg, t.n, t.s,
        |         floor((d.x::DOUBLE * t.n / t.s) * ln(d.x::DOUBLE * t.n / t.s) * 1.0e9 + 0.5)::BIGINT AS tu,
        |         floor((d.x::DOUBLE * b.ng / b.sg) * ln(d.x::DOUBLE * b.ng / b.sg) * 1.0e9 + 0.5)::BIGINT AS tgu
        |  FROM docs d JOIN bysrc b USING (source), tot t),
        |persrc AS (
        |  SELECT source, max(ng) AS n_docs, max(sg) AS sg, max(n) AS n,
        |         max(s) AS s, sum(tu)::BIGINT AS tu_sum,
        |         sum(tgu)::BIGINT AS tgu_sum
        |  FROM terms GROUP BY 1),
        |persrc2 AS (
        |  SELECT source, n_docs, sg, n, s, tu_sum,
        |         round(tgu_sum::DOUBLE / n_docs / 1.0e9, 6) + 0.0 AS theil_in_source,
        |         floor((sg::DOUBLE / s) * ln((sg::DOUBLE * n) / (s::DOUBLE * n_docs)) * 1.0e9 + 0.5)::BIGINT AS btu,
        |         floor((sg::DOUBLE / s) * (tgu_sum::DOUBLE / n_docs / 1.0e9) * 1.0e9 + 0.5)::BIGINT AS wtu
        |  FROM persrc),
        |totals AS (
        |  SELECT max(n) AS n, sum(tu_sum)::BIGINT AS tu_all,
        |         sum(btu)::BIGINT AS btu_sum, sum(wtu)::BIGINT AS wtu_sum
        |  FROM persrc2)
        |SELECT p.source, p.n_docs, (p.sg * 1000000 // p.s)::BIGINT AS token_share_ppm,
        |       p.theil_in_source,
        |       round(t.tu_all::DOUBLE / t.n / 1.0e9, 6) + 0.0 AS theil_total,
        |       round(t.wtu_sum::DOUBLE / 1.0e9, 6) + 0.0 AS theil_within,
        |       round(t.btu_sum::DOUBLE / 1.0e9, 6) + 0.0 AS theil_between
        |FROM persrc2 p, totals t ORDER BY p.source""".stripMargin,
    // same integer-dollar grid, same snapped inverse-RMSE weights, same
    // exact BIGINT synthetic dot products
    "q430_synthetic_control" ->
      """WITH cell AS (
        |  SELECT c.c_mktsegment AS seg,
        |         ((year(o.o_orderdate) - 1995) * 12 + month(o.o_orderdate) - 1)::BIGINT AS mi,
        |         sum(floor(o.o_totalprice * 100.0 + 0.5)::BIGINT // 100)::BIGINT AS y
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |grid AS (
        |  SELECT b.seg, b.mi, coalesce(c.y, 0)::BIGINT AS y
        |  FROM (SELECT sg.seg, g.mi
        |        FROM (SELECT DISTINCT seg FROM cell) sg,
        |             (SELECT unnest(generate_series(0, 79))::BIGINT AS mi) g) b
        |  LEFT JOIN cell c ON c.seg = b.seg AND c.mi = b.mi),
        |treated AS (SELECT mi, y AS yt FROM grid WHERE seg = 'BUILDING'),
        |w AS (
        |  SELECT d.seg,
        |         floor(1.0e9 / (1.0 + sqrt(sum((d.y - t.yt) * (d.y - t.yt))::DOUBLE / 48)) + 0.5)::BIGINT AS inv_u
        |  FROM grid d JOIN treated t USING (mi)
        |  WHERE d.seg <> 'BUILDING' AND d.mi < 48
        |  GROUP BY 1),
        |wtot AS (SELECT sum(inv_u)::BIGINT AS w_sum FROM w),
        |synth AS (
        |  SELECT d.mi, sum(w.inv_u * d.y)::BIGINT AS num,
        |         max(z.w_sum) AS w_sum,
        |         (sum(w.inv_u * d.y)::BIGINT // max(z.w_sum))::BIGINT AS synth_d
        |  FROM grid d JOIN w USING (seg), wtot z
        |  WHERE d.seg <> 'BUILDING'
        |  GROUP BY 1),
        |joined AS (SELECT s.mi, s.num, s.w_sum, s.synth_d, t.yt
        |           FROM synth s JOIN treated t USING (mi)),
        |summary AS (
        |  SELECT sum(CASE WHEN mi < 48 THEN (yt - synth_d) * (yt - synth_d) ELSE 0 END)::BIGINT AS pre_sse,
        |         sum(CASE WHEN mi >= 48 THEN yt ELSE 0 END)::BIGINT AS post_act,
        |         sum(CASE WHEN mi >= 48 THEN num ELSE 0 END)::BIGINT AS post_num,
        |         sum(CASE WHEN mi >= 48 THEN 1 ELSE 0 END)::BIGINT AS n_post,
        |         max(w_sum) AS ws
        |  FROM joined)
        |SELECT j.mi AS month_idx, j.yt AS actual_dollars,
        |       round(j.num::DOUBLE / j.w_sum, 6) + 0.0 AS synthetic_dollars,
        |       round(j.yt - j.num::DOUBLE / j.w_sum, 6) + 0.0 AS gap,
        |       round(sqrt(m.pre_sse::DOUBLE / 48), 6) + 0.0 AS pre_rmse,
        |       round((m.post_act::DOUBLE - m.post_num::DOUBLE / m.ws) / m.n_post, 6) + 0.0 AS mean_post_gap
        |FROM joined j, summary m WHERE j.mi >= 48 ORDER BY j.mi""".stripMargin,
    // same cents grid, same 2x2 cell censuses, same one-divide means
    "q429_diff_in_diff" ->
      """WITH cells AS (
        |  SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS t,
        |         CASE WHEN o.o_orderdate >= TIMESTAMP '1998-07-01' THEN 1 ELSE 0 END AS p,
        |         floor(o.o_totalprice * 100.0 + 0.5)::BIGINT AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |m AS (
        |  SELECT
        |    sum(CASE WHEN t = 1 AND p = 0 THEN 1 ELSE 0 END)::BIGINT AS n_t0,
        |    sum(CASE WHEN t = 1 AND p = 1 THEN 1 ELSE 0 END)::BIGINT AS n_t1,
        |    sum(CASE WHEN t = 0 AND p = 0 THEN 1 ELSE 0 END)::BIGINT AS n_c0,
        |    sum(CASE WHEN t = 0 AND p = 1 THEN 1 ELSE 0 END)::BIGINT AS n_c1,
        |    sum(CASE WHEN t = 1 AND p = 0 THEN cents ELSE 0 END)::BIGINT AS s_t0,
        |    sum(CASE WHEN t = 1 AND p = 1 THEN cents ELSE 0 END)::BIGINT AS s_t1,
        |    sum(CASE WHEN t = 0 AND p = 0 THEN cents ELSE 0 END)::BIGINT AS s_c0,
        |    sum(CASE WHEN t = 0 AND p = 1 THEN cents ELSE 0 END)::BIGINT AS s_c1
        |  FROM cells)
        |SELECT n_t0, n_t1, n_c0, n_c1,
        |  round(s_t0::DOUBLE / n_t0 / 100.0, 6) + 0.0 AS mean_treated_pre,
        |  round(s_t1::DOUBLE / n_t1 / 100.0, 6) + 0.0 AS mean_treated_post,
        |  round(s_c0::DOUBLE / n_c0 / 100.0, 6) + 0.0 AS mean_control_pre,
        |  round(s_c1::DOUBLE / n_c1 / 100.0, 6) + 0.0 AS mean_control_post,
        |  round(s_t1::DOUBLE / n_t1 / 100.0 - s_t0::DOUBLE / n_t0 / 100.0, 6) + 0.0 AS diff_treated,
        |  round(s_c1::DOUBLE / n_c1 / 100.0 - s_c0::DOUBLE / n_c0 / 100.0, 6) + 0.0 AS diff_control,
        |  round((s_t1::DOUBLE / n_t1 / 100.0 - s_t0::DOUBLE / n_t0 / 100.0) -
        |        (s_c1::DOUBLE / n_c1 / 100.0 - s_c0::DOUBLE / n_c0 / 100.0), 6) + 0.0 AS did
        |FROM m""".stripMargin,
    // same 2x2 strata censuses, same 10^-6 snapped CMH terms
    "q434_cmh_odds_ratio" ->
      """WITH cells AS (
        |  SELECT r.r_name AS stratum,
        |    sum(CASE WHEN l.l_discount >= 0.06 AND l.l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT AS a,
        |    sum(CASE WHEN l.l_discount >= 0.06 AND l.l_returnflag <> 'R' THEN 1 ELSE 0 END)::BIGINT AS b,
        |    sum(CASE WHEN l.l_discount < 0.06 AND l.l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT AS c,
        |    sum(CASE WHEN l.l_discount < 0.06 AND l.l_returnflag <> 'R' THEN 1 ELSE 0 END)::BIGINT AS d
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer cu ON o.o_custkey = cu.c_custkey
        |  JOIN nation n ON cu.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY 1),
        |pooled AS (
        |  SELECT sum(a::HUGEINT * d * 1000000 // (a + b + c + d))::BIGINT AS cmh_num_u,
        |         sum(b::HUGEINT * c * 1000000 // (a + b + c + d))::BIGINT AS cmh_den_u,
        |         sum(a)::BIGINT AS ta, sum(b)::BIGINT AS tb,
        |         sum(c)::BIGINT AS tc, sum(d)::BIGINT AS td
        |  FROM cells)
        |SELECT s.stratum, s.a, s.b, s.c, s.d,
        |       round((s.a * s.d)::DOUBLE / (s.b * s.c)::DOUBLE, 6) + 0.0 AS stratum_or,
        |       round(p.cmh_num_u::DOUBLE / p.cmh_den_u::DOUBLE, 6) + 0.0 AS cmh_or,
        |       round((p.ta * p.td)::DOUBLE / (p.tb * p.tc)::DOUBLE, 6) + 0.0 AS crude_or
        |FROM cells s, pooled p ORDER BY s.stratum""".stripMargin,
    // same integer daily censuses, same exact per-lag moments
    "q436_cross_correlation" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS x,
        |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS y
        |  FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1),
        |m AS (
        |  SELECT g.lag, count(*)::BIGINT AS n_days,
        |         sum(a.x)::BIGINT AS sx, sum(b.y)::BIGINT AS sy,
        |         sum(a.x * b.y)::BIGINT AS sxy,
        |         sum(a.x * a.x)::BIGINT AS sxx,
        |         sum(b.y * b.y)::BIGINT AS syy
        |  FROM (SELECT unnest(generate_series(-7, 7))::BIGINT AS lag) g,
        |       daily a, daily b
        |  WHERE b.day = a.day + g.lag
        |  GROUP BY 1)
        |SELECT lag, n_days,
        |       round((n_days * sxy - sx * sy)::DOUBLE /
        |             (sqrt((n_days * sxx - sx * sx)::DOUBLE) *
        |              sqrt((n_days * syy - sy * sy)::DOUBLE)), 6) + 0.0 AS ccf
        |FROM m ORDER BY lag""".stripMargin,
    // same ppm share snap before squaring, same struct-max top
    "q427_supplier_hhi" ->
      """WITH rev AS (
        |  SELECT string_split(p.p_type, ' ')[1] AS cls, l.l_suppkey AS supp,
        |         sum(floor(l.l_extendedprice * 100.0 + 0.5)::BIGINT)::BIGINT
        |           AS rev
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |tot AS (SELECT cls, sum(rev)::BIGINT AS trev,
        |               count(*)::BIGINT AS n_suppliers
        |        FROM rev GROUP BY 1),
        |sh AS (
        |  SELECT r.cls, r.supp, t.n_suppliers,
        |         (r.rev * 1000000 // t.trev)::BIGINT AS share_ppm
        |  FROM rev r JOIN tot t USING (cls)),
        |top AS (
        |  SELECT cls, share_ppm AS top_share_ppm, supp AS top_supplier
        |  FROM sh QUALIFY row_number() OVER (PARTITION BY cls
        |    ORDER BY share_ppm DESC, supp DESC) = 1)
        |SELECT s.cls, max(s.n_suppliers) AS n_suppliers,
        |       round(sum(s.share_ppm * s.share_ppm)::DOUBLE / 1.0e12, 6) + 0.0
        |         AS hhi,
        |       round(1.0e12 / sum(s.share_ppm * s.share_ppm)::DOUBLE, 6) + 0.0
        |         AS effective_suppliers,
        |       max(t.top_share_ppm) AS top_share_ppm,
        |       max(t.top_supplier) AS top_supplier
        |FROM sh s JOIN top t USING (cls)
        |GROUP BY s.cls ORDER BY s.cls""".stripMargin,
    // same integer block sums, same (l−r)² energies, same complete-
    // block filter and div-2^k scale fold
    "q428_haar_energy" ->
      """WITH daily AS (
        |  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
        |         sum(floor(o_totalprice * 100.0 + 0.5)::BIGINT // 100)::BIGINT
        |           AS y
        |  FROM orders GROUP BY 1),
        |d0 AS (SELECT min(day) AS day0 FROM daily),
        |idx AS (
        |  SELECT d.day - z.day0 AS i, d.y,
        |         count(*) OVER (PARTITION BY (d.day - z.day0) // 16) AS nblk
        |  FROM daily d, d0 z QUALIFY nblk = 16),
        |lv AS (
        |  SELECT k.level, (2 * k.half) AS scale_days, g.n_details,
        |         g.e // (2 * k.half) AS energy
        |  FROM (VALUES (1, 1), (2, 2), (3, 4), (4, 8)) k(level, half)
        |  JOIN LATERAL (
        |    SELECT count(*)::BIGINT AS n_details, sum((l - r) * (l - r))::BIGINT AS e
        |    FROM (SELECT i // (2 * k.half) AS grp,
        |                 sum(CASE WHEN (i // k.half) % 2 = 0 THEN y ELSE 0 END)
        |                   ::BIGINT AS l,
        |                 sum(CASE WHEN (i // k.half) % 2 = 1 THEN y ELSE 0 END)
        |                   ::BIGINT AS r
        |          FROM idx GROUP BY 1)
        |  ) g ON TRUE),
        |tot AS (SELECT sum(energy)::BIGINT AS etot FROM lv)
        |SELECT l.level, l.scale_days, l.n_details, l.energy,
        |       floor(l.energy::DOUBLE * 1.0e6 / t.etot::DOUBLE + 0.5)
        |         ::BIGINT AS energy_share_ppm
        |FROM lv l, tot t ORDER BY l.level""".stripMargin,
    // same exact moments, same 10⁻⁹ r snaps BEFORE the 3×3 inverse
    // diagonal chains
    "q425_correlation_vif" ->
      """WITH m AS (
        |  SELECT count(*)::BIGINT AS n,
        |         sum(a)::BIGINT AS sa, sum(b)::BIGINT AS sb,
        |         sum(c)::BIGINT AS sc,
        |         sum(a * a)::BIGINT AS saa, sum(b * b)::BIGINT AS sbb,
        |         sum(c * c)::BIGINT AS scc, sum(a * b)::BIGINT AS sab,
        |         sum(a * c)::BIGINT AS sac, sum(b * c)::BIGINT AS sbc
        |  FROM (SELECT floor(l_quantity + 0.5)::BIGINT AS a,
        |               floor(l_discount * 100.0 + 0.5)::BIGINT AS b,
        |               floor(l_tax * 100.0 + 0.5)::BIGINT AS c
        |        FROM lineitem)),
        |r AS (
        |  SELECT n,
        |         floor((n::DOUBLE * sab::DOUBLE - sa::DOUBLE * sb::DOUBLE) /
        |           sqrt((n::DOUBLE * saa::DOUBLE - sa::DOUBLE * sa::DOUBLE) *
        |                (n::DOUBLE * sbb::DOUBLE - sb::DOUBLE * sb::DOUBLE))
        |           * 1.0e9 + 0.5)::BIGINT AS rab_u,
        |         floor((n::DOUBLE * sac::DOUBLE - sa::DOUBLE * sc::DOUBLE) /
        |           sqrt((n::DOUBLE * saa::DOUBLE - sa::DOUBLE * sa::DOUBLE) *
        |                (n::DOUBLE * scc::DOUBLE - sc::DOUBLE * sc::DOUBLE))
        |           * 1.0e9 + 0.5)::BIGINT AS rac_u,
        |         floor((n::DOUBLE * sbc::DOUBLE - sb::DOUBLE * sc::DOUBLE) /
        |           sqrt((n::DOUBLE * sbb::DOUBLE - sb::DOUBLE * sb::DOUBLE) *
        |                (n::DOUBLE * scc::DOUBLE - sc::DOUBLE * sc::DOUBLE))
        |           * 1.0e9 + 0.5)::BIGINT AS rbc_u
        |  FROM m),
        |d AS (
        |  SELECT n, rab_u::DOUBLE / 1.0e9 AS rab, rac_u::DOUBLE / 1.0e9 AS rac,
        |         rbc_u::DOUBLE / 1.0e9 AS rbc
        |  FROM r),
        |d2 AS (
        |  SELECT *, 1.0 + 2.0 * rab * rac * rbc - rab * rab - rac * rac
        |            - rbc * rbc AS det
        |  FROM d),
        |rows3 AS (
        |  SELECT 'quantity' AS feature, n, rab AS r1, rac AS r2,
        |         (1.0 - rbc * rbc) / det AS vif FROM d2
        |  UNION ALL
        |  SELECT 'discount_pct', n, rab, rbc, (1.0 - rac * rac) / det FROM d2
        |  UNION ALL
        |  SELECT 'tax_pct', n, rac, rbc, (1.0 - rab * rab) / det FROM d2)
        |SELECT feature, n, round(r1, 6) + 0.0 AS r_first,
        |       round(r2, 6) + 0.0 AS r_second, round(vif, 6) + 0.0 AS vif,
        |       vif > 5.0 AS collinear
        |FROM rows3 ORDER BY feature""".stripMargin,
    // same complete-day design, same strict (volume desc, day) ranks,
    // same mirrored W/χ² chain
    "q426_kendall_w" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         sum(floor(value * 100.0 + 0.5)::BIGINT)::BIGINT AS v
        |  FROM events GROUP BY 1, 2),
        |complete AS (
        |  SELECT day, event_type, v,
        |         count(*) OVER (PARTITION BY day) AS k
        |  FROM daily QUALIFY k = 5),
        |ranked AS (
        |  SELECT day,
        |         rank() OVER (PARTITION BY event_type
        |                      ORDER BY v DESC, day)::BIGINT AS r
        |  FROM complete),
        |sums AS (SELECT day, sum(r)::BIGINT AS rsum FROM ranked GROUP BY 1),
        |tot AS (SELECT count(*)::BIGINT AS n, sum(rsum)::BIGINT AS rtot,
        |               sum(rsum * rsum)::BIGINT AS rss FROM sums),
        |s AS (
        |  SELECT n, rss::DOUBLE - rtot::DOUBLE * rtot::DOUBLE / n::DOUBLE AS s
        |  FROM tot),
        |w AS (
        |  SELECT n, round(12.0 * s / (25.0 * (n::DOUBLE * n::DOUBLE * n::DOUBLE
        |                                      - n::DOUBLE)), 6) AS w
        |  FROM s)
        |SELECT n, w, round(5.0 * (n - 1)::DOUBLE * w, 6) + 0.0 AS chi2,
        |       5.0 * (n - 1)::DOUBLE * w > 42.556968 AS reject_independence
        |FROM w""".stripMargin,
    // same 10-cell census, same snapped χ² terms, same modal argmax
    "q423_digit_audit" ->
      """WITH cells AS (
        |  SELECT cents % 10 AS digit, count(*)::BIGINT AS o,
        |         sum(CASE WHEN cents % 100 IN (0, 50, 99) THEN 1 ELSE 0 END)
        |           ::BIGINT AS round_n
        |  FROM (SELECT floor(o_totalprice * 100.0 + 0.5)::BIGINT AS cents
        |        FROM orders)
        |  GROUP BY 1),
        |tot AS (SELECT sum(o)::BIGINT AS n, sum(round_n)::BIGINT AS rn
        |        FROM cells),
        |terms AS (
        |  SELECT c.digit, c.o, t.n, t.rn,
        |         floor((c.o::DOUBLE * 10.0 - t.n::DOUBLE) *
        |               (c.o::DOUBLE * 10.0 - t.n::DOUBLE) /
        |               (10.0 * t.n::DOUBLE) * 1.0e9 + 0.5)::BIGINT AS chi_u
        |  FROM cells c, tot t),
        |modal AS (
        |  SELECT digit FROM terms
        |  QUALIFY row_number() OVER (ORDER BY o DESC, digit DESC) = 1)
        |SELECT max(n) AS n_orders,
        |       (max(rn) * 1000000 // max(n))::BIGINT AS round_ending_ppm,
        |       round(sum(chi_u)::DOUBLE / 1.0e9, 6) + 0.0 AS chi2_last_digit,
        |       sum(chi_u)::DOUBLE / 1.0e9 > 16.918978 AS reject_uniform,
        |       (SELECT digit FROM modal) AS modal_digit
        |FROM terms""".stripMargin,
    // same day census and cumulative sweep, same snapped double
    // objective, same (obj, day) argmin
    "q424_binary_segmentation" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS d,
        |         sum(floor(o_totalprice * 100.0 + 0.5)::BIGINT // 100)::BIGINT
        |           AS y
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT count(*)::BIGINT AS n, sum(y)::BIGINT AS s,
        |               sum(y::HUGEINT * y) AS ss FROM daily),
        |scans AS (
        |  SELECT d, row_number() OVER (ORDER BY d)::BIGINT AS i,
        |         sum(y) OVER (ORDER BY d)::BIGINT AS cl
        |  FROM daily),
        |obj AS (
        |  SELECT sc.d, sc.i, sc.cl, t.n, t.s, t.ss,
        |         floor(t.ss::DOUBLE
        |               - sc.cl::DOUBLE * sc.cl::DOUBLE / sc.i::DOUBLE
        |               - (t.s - sc.cl)::DOUBLE * (t.s - sc.cl)::DOUBLE
        |                 / (t.n - sc.i)::DOUBLE
        |               + 0.5)::BIGINT AS obj_u
        |  FROM scans sc, tot t WHERE sc.i < t.n),
        |best AS (
        |  SELECT * FROM obj
        |  QUALIFY row_number() OVER (ORDER BY obj_u, d) = 1)
        |SELECT n, d AS split_day, i AS n_left,
        |       round(cl::DOUBLE / i::DOUBLE, 6) + 0.0 AS mean_left_dollar,
        |       round((s - cl)::DOUBLE / (n - i)::DOUBLE, 6) + 0.0
        |         AS mean_right_dollar,
        |       round(1.0 - obj_u::DOUBLE /
        |             (ss::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE), 6) + 0.0
        |         AS variance_reduction
        |FROM best""".stripMargin,
    // same census ranking and integer class boundaries
    "q421_abc_classification" ->
      """WITH parts AS (
        |  SELECT l_partkey AS part,
        |         sum(floor(l_extendedprice * 100.0 + 0.5)::BIGINT)::BIGINT AS rev
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT sum(rev)::BIGINT AS trev, count(*)::BIGINT AS tn
        |        FROM parts),
        |rk AS (
        |  SELECT part, rev,
        |         sum(rev) OVER (ORDER BY rev DESC, part)::BIGINT AS cum
        |  FROM parts),
        |cl AS (
        |  SELECT r.part, r.rev, t.tn, t.trev,
        |         CASE WHEN r.cum * 100 <= t.trev * 80 THEN 'A'
        |              WHEN r.cum * 100 <= t.trev * 95 THEN 'B'
        |              ELSE 'C' END AS cls
        |  FROM rk r, tot t)
        |SELECT cls, count(*)::BIGINT AS n_parts,
        |       (count(*) * 1000000 // max(tn))::BIGINT AS item_share_ppm,
        |       (sum(rev) * 1000000 // max(trev))::BIGINT AS rev_share_ppm,
        |       round(sum(rev)::DOUBLE / 100.0, 2) + 0.0 AS revenue_dollar
        |FROM cl GROUP BY 1 ORDER BY 1""".stripMargin,
    // same (cust, part, qty) blocks with the same earliest-100 block
    // cap, same 7-day predicate, same exposure heap
    "q422_duplicate_payments" ->
      """WITH li0 AS (
        |  SELECT o.o_custkey AS cust, l.l_partkey AS part,
        |         floor(l.l_quantity + 0.5)::BIGINT AS q,
        |         floor(l.l_extendedprice * 100.0 + 0.5)::BIGINT AS cents,
        |         o.o_orderdate::DATE AS d, o.o_orderkey AS ok,
        |         l.l_linenumber AS ln
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |li AS (
        |  SELECT * FROM li0
        |  QUALIFY row_number() OVER (PARTITION BY cust, part, q
        |                             ORDER BY d, ok, ln, cents) <= 100)
        |SELECT a.cust, a.part, a.q AS quantity,
        |       a.ok AS ok_a, a.ln AS ln_a, b.ok AS ok_b, b.ln AS ln_b,
        |       round((a.cents + b.cents)::DOUBLE / 100.0, 2) + 0.0
        |         AS exposure_dollar,
        |       abs(date_diff('day', a.d, b.d))::BIGINT AS gap_days
        |FROM li a JOIN li b
        |  ON a.cust = b.cust AND a.part = b.part AND a.q = b.q
        | AND (a.ok < b.ok OR (a.ok = b.ok AND a.ln < b.ln))
        |WHERE abs(date_diff('day', a.d, b.d)) <= 7
        |ORDER BY (a.cents + b.cents) DESC, a.cust, a.ok, a.ln, b.ok, b.ln
        |LIMIT 10""".stripMargin,
    // same quarter grid, same cents, same cohort-partitioned cumsum
    "q419_cohort_ltv" ->
      """WITH o AS (
        |  SELECT o_custkey AS c,
        |         (year(o_orderdate) * 4 + quarter(o_orderdate) - 1)::BIGINT AS q,
        |         floor(o_totalprice * 100.0 + 0.5)::BIGINT AS cents
        |  FROM orders),
        |fq AS (SELECT c, min(q) AS q0 FROM o GROUP BY 1),
        |sz AS (SELECT q0, count(*)::BIGINT AS cohort_n FROM fq GROUP BY 1),
        |cells AS (
        |  SELECT f.q0, o.q - f.q0 AS age, sum(o.cents)::BIGINT AS rev_c
        |  FROM o JOIN fq f USING (c) GROUP BY 1, 2),
        |cum AS (
        |  SELECT q0, age, rev_c,
        |         sum(rev_c) OVER (PARTITION BY q0 ORDER BY age)::BIGINT AS cum_c
        |  FROM cells)
        |SELECT c.q0 AS cohort_quarter, c.age, s.cohort_n,
        |       round(c.rev_c::DOUBLE / 100.0, 2) + 0.0 AS rev_dollar,
        |       round(c.cum_c::DOUBLE / s.cohort_n::DOUBLE / 100.0, 6) + 0.0
        |         AS cum_ltv_per_customer
        |FROM cum c JOIN sz s USING (q0)
        |ORDER BY cohort_quarter, age""".stripMargin,
    // same day-lag census and cumulative inequalities per priority
    "q420_fulfillment_sla" ->
      """WITH census AS (
        |  SELECT o.o_orderpriority AS prio,
        |         date_diff('day', o.o_orderdate, l.l_shipdate)::BIGINT AS lag_d,
        |         count(*)::BIGINT AS c
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT prio, lag_d, c,
        |         sum(c) OVER (PARTITION BY prio ORDER BY lag_d)::BIGINT AS cum,
        |         sum(c) OVER (PARTITION BY prio)::BIGINT AS n
        |  FROM census)
        |SELECT prio, max(n) AS n_lines,
        |       min(CASE WHEN cum * 2 >= n THEN lag_d END) AS p50_days,
        |       min(CASE WHEN cum * 20 >= n * 19 THEN lag_d END) AS p95_days,
        |       (sum(CASE WHEN lag_d > 30 THEN c ELSE 0 END) * 1000000
        |        // max(n))::BIGINT AS breach_ppm,
        |       max(lag_d) AS max_days
        |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin,
    // same (day, dollar-bucket) census and cumulative inequalities
    "q417_quantile_envelope" ->
      """WITH census AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |         floor(value * 100.0 + 0.5)::BIGINT // 100 AS b,
        |         count(*)::BIGINT AS c
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |cum AS (
        |  SELECT day, b, c,
        |         sum(c) OVER (PARTITION BY day ORDER BY b)::BIGINT AS cum,
        |         sum(c) OVER (PARTITION BY day)::BIGINT AS n
        |  FROM census)
        |SELECT day, max(n) AS n,
        |       min(CASE WHEN cum * 10 >= n THEN b END) AS p10_dollar,
        |       min(CASE WHEN cum * 2 >= n THEN b END) AS p50_dollar,
        |       min(CASE WHEN cum * 10 >= n * 9 THEN b END) AS p90_dollar,
        |       min(CASE WHEN cum * 10 >= n * 9 THEN b END)
        |         - min(CASE WHEN cum * 10 >= n THEN b END) AS band_width
        |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin,
    // q97's session device, same hour-mark containment census, same
    // one-divide λ/W/L chains
    "q418_littles_law" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id, epoch_us(ts) AS us,
        |         epoch_ms(ts)::DOUBLE / 1000.0
        |           - lag(epoch_ms(ts)::DOUBLE / 1000.0) OVER w AS gap_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |marked AS (
        |  SELECT *, CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1
        |                 ELSE 0 END AS new_s
        |  FROM ev),
        |sess AS (
        |  SELECT user_id,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid,
        |         us
        |  FROM marked),
        |sp AS (
        |  SELECT user_id, sid, min(us) AS s0, max(us) AS s1
        |  FROM sess GROUP BY 1, 2),
        |tot AS (
        |  SELECT min(s0) AS t0, max(s1) AS t1, count(*)::BIGINT AS n_sessions,
        |         sum(s1 - s0)::BIGINT AS dur_us
        |  FROM sp),
        |mk AS (
        |  SELECT unnest(generate_series(
        |           ceil(s0::DOUBLE / 3600000000.0)::BIGINT * 3600000000,
        |           s1, 3600000000)) AS h
        |  FROM sp
        |  WHERE ceil(s0::DOUBLE / 3600000000.0)::BIGINT * 3600000000 <= s1),
        |oc AS (SELECT h, count(*)::BIGINT AS open FROM mk GROUP BY 1),
        |ms AS (SELECT count(*)::BIGINT AS n_marks, sum(open)::BIGINT AS open_sum
        |       FROM oc)
        |SELECT t.n_sessions,
        |       round(t.n_sessions::DOUBLE * 3600.0e6 / (t.t1 - t.t0)::DOUBLE, 6)
        |         + 0.0 AS lambda_per_hour,
        |       round(t.dur_us::DOUBLE / t.n_sessions::DOUBLE / 3600.0e6, 6)
        |         + 0.0 AS w_hours,
        |       round(t.n_sessions::DOUBLE * 3600.0e6 / (t.t1 - t.t0)::DOUBLE
        |             * (t.dur_us::DOUBLE / t.n_sessions::DOUBLE / 3600.0e6), 6)
        |         + 0.0 AS l_littles,
        |       round(m.open_sum::DOUBLE / m.n_marks::DOUBLE, 6) + 0.0
        |         AS l_measured,
        |       m.n_marks
        |FROM tot t, ms m""".stripMargin,
    // same micro-nat ln grids before the moments, same one-divide
    // slope/R² chains
    "q415_price_elasticity" ->
      """WITH xy AS (
        |  SELECT p.p_brand AS brand,
        |         floor(ln(l.l_extendedprice / l.l_quantity) * 1000000.0
        |               + 0.5)::BIGINT AS x,
        |         floor(ln(l.l_quantity) * 1000000.0 + 0.5)::BIGINT AS y
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l.l_quantity >= 1.0),
        |m AS (
        |  SELECT brand, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
        |         sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
        |         sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy
        |  FROM xy GROUP BY 1),
        |c AS (
        |  SELECT brand, n,
        |         n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE AS cov_n,
        |         n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS var_x,
        |         n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE AS var_y
        |  FROM m)
        |SELECT brand, n, round(cov_n / var_x, 6) + 0.0 AS elasticity,
        |       round(cov_n * cov_n / (var_x * var_y), 6) + 0.0 AS r2,
        |       abs(cov_n / var_x) > 1.0 AS elastic
        |FROM c ORDER BY brand""".stripMargin,
    // same (part, period) census, the same floor-div volume effect
    // (DuckDB // floors natively) and residual price effect — the
    // tie-out identity is part of the compared output
    "q416_price_volume_mix" ->
      """WITH per AS (
        |  SELECT l.l_partkey AS part,
        |         sum(CASE WHEN o.o_orderdate < DATE '1996-01-01'
        |             THEN floor(l.l_quantity + 0.5)::BIGINT ELSE 0 END)::BIGINT AS q1,
        |         sum(CASE WHEN o.o_orderdate < DATE '1996-01-01'
        |             THEN floor(l.l_extendedprice * 100.0 + 0.5)::BIGINT
        |             ELSE 0 END)::BIGINT AS r1,
        |         sum(CASE WHEN o.o_orderdate >= DATE '1996-01-01'
        |             THEN floor(l.l_quantity + 0.5)::BIGINT ELSE 0 END)::BIGINT AS q2,
        |         sum(CASE WHEN o.o_orderdate >= DATE '1996-01-01'
        |             THEN floor(l.l_extendedprice * 100.0 + 0.5)::BIGINT
        |             ELSE 0 END)::BIGINT AS r2
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |  GROUP BY 1),
        |eff AS (
        |  SELECT part, q1, r1, q2, r2,
        |         CASE WHEN q1 > 0 AND q2 > 0
        |              THEN ((q2 - q1) * r1) // q1 ELSE 0 END AS vol_c,
        |         CASE WHEN q1 = 0 AND q2 > 0 THEN r2 ELSE 0 END AS new_c,
        |         CASE WHEN q2 = 0 AND q1 > 0 THEN -r1 ELSE 0 END AS disc_c
        |  FROM per),
        |eff2 AS (
        |  SELECT *, CASE WHEN q1 > 0 AND q2 > 0
        |                 THEN (r2 - r1) - vol_c ELSE 0 END AS price_c
        |  FROM eff)
        |SELECT round(sum(r1)::DOUBLE / 100.0, 2) + 0.0 AS rev_early_dollar,
        |       round(sum(r2)::DOUBLE / 100.0, 2) + 0.0 AS rev_late_dollar,
        |       round((sum(r2) - sum(r1))::DOUBLE / 100.0, 2) + 0.0
        |         AS delta_dollar,
        |       round(sum(vol_c)::DOUBLE / 100.0, 2) + 0.0
        |         AS volume_effect_dollar,
        |       round(sum(price_c)::DOUBLE / 100.0, 2) + 0.0
        |         AS price_effect_dollar,
        |       round(sum(new_c)::DOUBLE / 100.0, 2) + 0.0 AS new_parts_dollar,
        |       round(sum(disc_c)::DOUBLE / 100.0, 2) + 0.0
        |         AS discontinued_dollar,
        |       sum(vol_c) + sum(price_c) + sum(new_c) + sum(disc_c)
        |         = sum(r2) - sum(r1) AS ties_out
        |FROM eff2""".stripMargin,
    // same (views, action) census, same action-blind reward model,
    // same per-cell 10⁻⁹ snaps of the DM and correction legs
    "q409_doubly_robust_ope" ->
      """WITH users AS (
        |  SELECT user_id,
        |         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS v,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS y,
        |         ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % 2 AS a
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY 1),
        |cells AS (
        |  SELECT v, a, count(*)::BIGINT AS n_va, sum(y)::BIGINT AS y_va
        |  FROM users GROUP BY 1, 2),
        |byv AS (
        |  SELECT v, sum(n_va)::BIGINT AS n_v,
        |         sum(CASE WHEN a = 1 THEN n_va END)::BIGINT AS n_v1,
        |         sum(CASE WHEN a = 1 THEN y_va END)::BIGINT AS y_v1,
        |         sum(CASE WHEN a = 0 THEN n_va END)::BIGINT AS n_v0,
        |         sum(CASE WHEN a = 0 THEN y_va END)::BIGINT AS y_v0
        |  FROM cells GROUP BY 1),
        |ch AS (
        |  SELECT v, n_v,
        |         CASE WHEN v >= 3 THEN 1 ELSE 0 END AS pi,
        |         (coalesce(y_v1, 0) + coalesce(y_v0, 0))::DOUBLE / n_v::DOUBLE
        |           AS rhat,
        |         CASE WHEN v >= 3 THEN coalesce(n_v1, 0)
        |              ELSE coalesce(n_v0, 0) END AS n_pi,
        |         CASE WHEN v >= 3 THEN coalesce(y_v1, 0)
        |              ELSE coalesce(y_v0, 0) END AS y_pi
        |  FROM byv),
        |tu AS (
        |  SELECT n_v, n_pi, y_pi,
        |         floor(n_v::DOUBLE * rhat * 1.0e9 + 0.5)::BIGINT AS dm_u,
        |         floor(2.0 * (y_pi::DOUBLE - n_pi::DOUBLE * rhat) * 1.0e9
        |               + 0.5)::BIGINT AS corr_u
        |  FROM ch)
        |SELECT sum(n_v)::BIGINT AS n,
        |       round(sum(dm_u)::DOUBLE / 1.0e9 / sum(n_v)::DOUBLE, 6) + 0.0
        |         AS v_dm,
        |       round(2.0 * sum(y_pi)::DOUBLE / sum(n_v)::DOUBLE, 6) + 0.0
        |         AS v_ips,
        |       round((sum(dm_u)::DOUBLE + sum(corr_u)::DOUBLE) / 1.0e9
        |             / sum(n_v)::DOUBLE, 6) + 0.0 AS v_dr,
        |       round(sum(corr_u)::DOUBLE / 1.0e9 / sum(n_v)::DOUBLE, 6) + 0.0
        |         AS dr_correction
        |FROM tu""".stripMargin,
    // same cell censuses, same 10⁻⁹ weight grid, all four IPF sweeps
    // unrolled with the same snapped masses
    "q410_ipf_raking" ->
      """WITH cust AS (
        |  SELECT c.c_custkey, c.c_mktsegment AS seg, n.n_regionkey AS reg
        |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
        |active AS (
        |  SELECT cu.* FROM cust cu
        |  JOIN (SELECT DISTINCT o_custkey FROM orders) o
        |    ON cu.c_custkey = o.o_custkey),
        |sample AS (SELECT seg, reg, count(*)::BIGINT AS ns
        |           FROM active GROUP BY 1, 2),
        |base AS (SELECT seg, reg, count(*)::BIGINT AS nb FROM cust GROUP BY 1, 2),
        |c0 AS (SELECT s.seg, s.reg, s.ns, b.nb, 1000000000::BIGINT AS w0
        |       FROM sample s JOIN base b USING (seg, reg)),
        |segt AS (SELECT seg, sum(nb)::BIGINT AS seg_target FROM c0 GROUP BY 1),
        |regt AS (SELECT reg, sum(nb)::BIGINT AS reg_target FROM c0 GROUP BY 1),
        |m1 AS (SELECT seg, sum(floor(ns::DOUBLE * w0::DOUBLE / 1.0e9 * 1.0e6
        |                             + 0.5)::BIGINT)::BIGINT AS mu
        |       FROM c0 GROUP BY 1),
        |c1 AS (SELECT c0.seg, c0.reg, c0.ns, c0.nb,
        |              floor(c0.w0::DOUBLE * t.seg_target::DOUBLE * 1.0e6
        |                    / m.mu::DOUBLE + 0.5)::BIGINT AS w1
        |       FROM c0 JOIN m1 m USING (seg) JOIN segt t USING (seg)),
        |m2 AS (SELECT reg, sum(floor(ns::DOUBLE * w1::DOUBLE / 1.0e9 * 1.0e6
        |                             + 0.5)::BIGINT)::BIGINT AS mu
        |       FROM c1 GROUP BY 1),
        |c2 AS (SELECT c1.seg, c1.reg, c1.ns, c1.nb,
        |              floor(c1.w1::DOUBLE * t.reg_target::DOUBLE * 1.0e6
        |                    / m.mu::DOUBLE + 0.5)::BIGINT AS w2
        |       FROM c1 JOIN m2 m USING (reg) JOIN regt t USING (reg)),
        |m3 AS (SELECT seg, sum(floor(ns::DOUBLE * w2::DOUBLE / 1.0e9 * 1.0e6
        |                             + 0.5)::BIGINT)::BIGINT AS mu
        |       FROM c2 GROUP BY 1),
        |c3 AS (SELECT c2.seg, c2.reg, c2.ns, c2.nb,
        |              floor(c2.w2::DOUBLE * t.seg_target::DOUBLE * 1.0e6
        |                    / m.mu::DOUBLE + 0.5)::BIGINT AS w3
        |       FROM c2 JOIN m3 m USING (seg) JOIN segt t USING (seg)),
        |m4 AS (SELECT reg, sum(floor(ns::DOUBLE * w3::DOUBLE / 1.0e9 * 1.0e6
        |                             + 0.5)::BIGINT)::BIGINT AS mu
        |       FROM c3 GROUP BY 1),
        |c4 AS (SELECT c3.seg, c3.reg, c3.ns, c3.nb,
        |              floor(c3.w3::DOUBLE * t.reg_target::DOUBLE * 1.0e6
        |                    / m.mu::DOUBLE + 0.5)::BIGINT AS w4
        |       FROM c3 JOIN m4 m USING (reg) JOIN regt t USING (reg)),
        |ach AS (SELECT seg, sum(floor(ns::DOUBLE * w4::DOUBLE / 1.0e9 * 1.0e6
        |                              + 0.5)::BIGINT)::BIGINT AS mu2
        |        FROM c4 GROUP BY 1)
        |SELECT c4.seg, c4.reg, c4.ns AS n_sample, c4.nb AS n_base,
        |       round(c4.w4::DOUBLE / 1.0e9, 6) + 0.0 AS weight,
        |       round(a.mu2::DOUBLE / 1.0e6 / t.seg_target::DOUBLE, 6) + 0.0
        |         AS seg_margin_ratio
        |FROM c4 JOIN ach a USING (seg) JOIN segt t USING (seg)
        |ORDER BY c4.seg, c4.reg""".stripMargin,
    // same period split, same ppm share grids, same (|Δ| desc, Δ desc,
    // part) heap
    "q408_share_movers" ->
      """WITH rev AS (
        |  SELECT l.l_partkey AS part,
        |         sum(CASE WHEN o.o_orderdate < DATE '1996-01-01'
        |             THEN floor(l.l_extendedprice * 100.0 + 0.5)::BIGINT
        |             ELSE 0 END)::BIGINT AS rev_a,
        |         sum(CASE WHEN o.o_orderdate >= DATE '1996-01-01'
        |             THEN floor(l.l_extendedprice * 100.0 + 0.5)::BIGINT
        |             ELSE 0 END)::BIGINT AS rev_b
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |  GROUP BY 1),
        |tot AS (SELECT sum(rev_a)::BIGINT AS ta, sum(rev_b)::BIGINT AS tb
        |        FROM rev),
        |sh AS (
        |  SELECT part, rev_a, rev_b,
        |         (rev_a * 1000000 // ta)::BIGINT AS share_a_ppm,
        |         (rev_b * 1000000 // tb)::BIGINT AS share_b_ppm
        |  FROM rev, tot),
        |d AS (
        |  SELECT *, (share_b_ppm - share_a_ppm)::BIGINT AS delta_ppm,
        |         greatest(share_b_ppm - share_a_ppm,
        |                  -(share_b_ppm - share_a_ppm))::BIGINT AS mag
        |  FROM sh)
        |SELECT part, round(rev_a::DOUBLE / 100.0, 2) + 0.0 AS rev_early_dollar,
        |       round(rev_b::DOUBLE / 100.0, 2) + 0.0 AS rev_late_dollar,
        |       share_a_ppm, share_b_ppm, delta_ppm
        |FROM d ORDER BY mag DESC, delta_ppm DESC, part LIMIT 10""".stripMargin,
    // same view-count census, same rational p̂ and integer bins, same
    // per-cell 10⁻⁹ snaps for every Brier/Murphy term
    "q405_brier_calibration" ->
      """WITH users AS (
        |  SELECT user_id,
        |         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS v,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS y
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY 1),
        |cells AS (
        |  SELECT v, count(*)::BIGINT AS nv, sum(y)::BIGINT AS yv,
        |         v::DOUBLE / (v + 5)::DOUBLE AS ph,
        |         (10 * v) // (v + 5) AS bin
        |  FROM users GROUP BY 1),
        |cells2 AS (
        |  SELECT *,
        |         floor((nv::DOUBLE * ph * ph - 2.0 * ph * yv::DOUBLE
        |                + yv::DOUBLE) * 1.0e9 + 0.5)::BIGINT AS bri_u,
        |         floor(nv::DOUBLE * ph * 1.0e9 + 0.5)::BIGINT AS psum_u
        |  FROM cells),
        |bins AS (
        |  SELECT bin, sum(nv)::BIGINT AS nb, sum(yv)::BIGINT AS yb,
        |         sum(psum_u)::BIGINT AS pb_u
        |  FROM cells2 GROUP BY 1),
        |tot AS (SELECT sum(nb)::BIGINT AS n, sum(yb)::BIGINT AS ytot FROM bins),
        |binst AS (
        |  SELECT b.*, t.n, t.ytot,
        |         floor(b.nb::DOUBLE *
        |           (b.pb_u::DOUBLE / 1.0e9 / b.nb::DOUBLE - b.yb::DOUBLE / b.nb::DOUBLE) *
        |           (b.pb_u::DOUBLE / 1.0e9 / b.nb::DOUBLE - b.yb::DOUBLE / b.nb::DOUBLE)
        |           * 1.0e9 + 0.5)::BIGINT AS rel_u,
        |         floor(b.nb::DOUBLE *
        |           (b.yb::DOUBLE / b.nb::DOUBLE - t.ytot::DOUBLE / t.n::DOUBLE) *
        |           (b.yb::DOUBLE / b.nb::DOUBLE - t.ytot::DOUBLE / t.n::DOUBLE)
        |           * 1.0e9 + 0.5)::BIGINT AS res_u
        |  FROM bins b, tot t),
        |bsum AS (SELECT sum(bri_u)::BIGINT AS bsum_u FROM cells2),
        |dec AS (
        |  SELECT max(n) AS n, max(ytot) AS ytot,
        |         sum(rel_u)::BIGINT AS rel_s, sum(res_u)::BIGINT AS res_s
        |  FROM binst)
        |SELECT b.bin, b.nb AS n_users,
        |       round(b.pb_u::DOUBLE / 1.0e9 / b.nb::DOUBLE, 6) + 0.0 AS mean_pred,
        |       round(b.yb::DOUBLE / b.nb::DOUBLE, 6) + 0.0 AS obs_rate,
        |       round(s.bsum_u::DOUBLE / 1.0e9 / d.n::DOUBLE, 6) + 0.0 AS brier,
        |       round(d.rel_s::DOUBLE / 1.0e9 / d.n::DOUBLE, 6) + 0.0 AS reliability,
        |       round(d.res_s::DOUBLE / 1.0e9 / d.n::DOUBLE, 6) + 0.0 AS resolution,
        |       round(d.ytot::DOUBLE / d.n::DOUBLE *
        |             (1.0 - d.ytot::DOUBLE / d.n::DOUBLE), 6) + 0.0 AS uncertainty
        |FROM binst b, bsum s, dec d ORDER BY b.bin""".stripMargin,
    // same md5 logging coin, same ½-propensity census ratios
    "q406_off_policy_eval" ->
      """WITH users AS (
        |  SELECT user_id,
        |         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS v,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS y,
        |         ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % 2 AS a
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY 1),
        |u2 AS (SELECT *, CASE WHEN v >= 3 THEN 1 ELSE 0 END AS pi FROM users)
        |SELECT count(*)::BIGINT AS n,
        |       sum(CASE WHEN pi = a THEN 1 ELSE 0 END)::BIGINT AS n_matched,
        |       round(2.0 * sum(CASE WHEN pi = a THEN y ELSE 0 END)::DOUBLE
        |             / count(*)::DOUBLE, 6) + 0.0 AS v_ips,
        |       round(sum(CASE WHEN pi = a THEN y ELSE 0 END)::DOUBLE
        |             / sum(CASE WHEN pi = a THEN 1 ELSE 0 END)::DOUBLE, 6) + 0.0
        |         AS v_snips,
        |       round(sum(CASE WHEN a = 1 THEN y ELSE 0 END)::DOUBLE
        |             / sum(CASE WHEN a = 1 THEN 1 ELSE 0 END)::DOUBLE, 6) + 0.0
        |         AS v_logged_treat,
        |       round(sum(y)::DOUBLE / count(*)::DOUBLE, 6) + 0.0 AS v_naive
        |FROM u2""".stripMargin,
    // same (n desc, part) CDF ranges, same md5 variates, plain
    // containment join standing in for the binned one (same pairs)
    "q404_negative_sampling" ->
      """WITH pos AS (
        |  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |pc AS (SELECT p, count(*)::BIGINT AS n FROM pos GROUP BY 1),
        |pop AS (
        |  SELECT p AS np, n,
        |         (sum(n) OVER (ORDER BY n DESC, p) - 1)::BIGINT AS hi
        |  FROM pc),
        |pop2 AS (SELECT np, (hi - n + 1)::BIGINT AS lo, hi, n AS pop_n
        |         FROM pop),
        |tot AS (SELECT (max(hi) + 1)::BIGINT AS tot, count(*)::BIGINT AS n_parts
        |        FROM pop2),
        |samples AS (
        |  SELECT c, p,
        |         ('0x' || substr(md5(concat_ws('-', 'neg', ks.k, c, p)), 1, 8))
        |           ::BIGINT % t.tot AS v,
        |         t.tot
        |  FROM pos CROSS JOIN (VALUES (1), (2)) ks(k) CROSS JOIN tot t),
        |neg AS (
        |  SELECT s.c, s.p, s.tot, p2.np, p2.pop_n
        |  FROM samples s JOIN pop2 p2 ON s.v BETWEEN p2.lo AND p2.hi),
        |summary AS (
        |  SELECT count(*)::BIGINT AS n_neg,
        |         sum(CASE WHEN np = p THEN 1 ELSE 0 END)::BIGINT
        |           AS self_collisions,
        |         count(DISTINCT np)::BIGINT AS distinct_neg_parts,
        |         max(tot) AS n_interactions
        |  FROM neg)
        |SELECT t5.np AS part, t5.times_sampled, t5.popularity,
        |       s.n_neg, s.self_collisions, s.distinct_neg_parts,
        |       s.n_interactions
        |FROM (SELECT np, count(*)::BIGINT AS times_sampled,
        |             max(pop_n) AS popularity
        |      FROM neg GROUP BY 1
        |      ORDER BY times_sampled DESC, np LIMIT 5) t5, summary s""".stripMargin,
    // same duel censuses, same 10⁻⁹ γ grid with 10⁻¹² denominator
    // terms, both MM iterations unrolled
    "q403_bradley_terry" ->
      """WITH vol AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day, event_type,
        |         sum(floor(value * 100.0 + 0.5)::BIGINT)::BIGINT AS v
        |  FROM events GROUP BY 1, 2, 3),
        |duels AS (
        |  SELECT CASE WHEN a.v > b.v THEN a.event_type ELSE b.event_type END AS wi,
        |         CASE WHEN a.v > b.v THEN b.event_type ELSE a.event_type END AS lj
        |  FROM vol a JOIN vol b
        |    ON a.user_id = b.user_id AND a.day = b.day
        |   AND a.event_type < b.event_type
        |  WHERE a.v <> b.v),
        |wins AS (SELECT wi AS i, lj AS j, count(*)::BIGINT AS w
        |         FROM duels GROUP BY 1, 2),
        |pairs AS (
        |  SELECT i, j, sum(w)::BIGINT AS w
        |  FROM (SELECT i, j, w FROM wins
        |        UNION ALL SELECT j, i, 0::BIGINT FROM wins)
        |  GROUP BY 1, 2),
        |nij AS (
        |  SELECT p.i, p.j, p.w, (p.w + r.w)::BIGINT AS n
        |  FROM pairs p JOIN pairs r ON p.i = r.j AND p.j = r.i),
        |g0 AS (SELECT DISTINCT i, 1000000000::BIGINT AS gu FROM nij),
        |t1 AS (
        |  SELECT n.i, sum(n.w)::BIGINT AS wi,
        |         sum(floor((n.n::DOUBLE * 1.0e9 / (gi.gu + gj.gu)::DOUBLE)
        |                   * 1.0e12 + 0.5)::BIGINT)::BIGINT AS ts
        |  FROM nij n JOIN g0 gi ON n.i = gi.i JOIN g0 gj ON n.j = gj.i
        |  GROUP BY n.i),
        |g1 AS (SELECT i, floor((wi::DOUBLE * 1.0e12 / ts::DOUBLE) * 1.0e9
        |                       + 0.5)::BIGINT AS gu FROM t1),
        |t2 AS (
        |  SELECT n.i, sum(n.w)::BIGINT AS wi,
        |         sum(floor((n.n::DOUBLE * 1.0e9 / (gi.gu + gj.gu)::DOUBLE)
        |                   * 1.0e12 + 0.5)::BIGINT)::BIGINT AS ts
        |  FROM nij n JOIN g1 gi ON n.i = gi.i JOIN g1 gj ON n.j = gj.i
        |  GROUP BY n.i),
        |g2 AS (SELECT i, floor((wi::DOUBLE * 1.0e12 / ts::DOUBLE) * 1.0e9
        |                       + 0.5)::BIGINT AS gu FROM t2),
        |wl AS (
        |  SELECT wn.i, wn.wins, ls.losses
        |  FROM (SELECT i, sum(w)::BIGINT AS wins FROM pairs GROUP BY 1) wn
        |  JOIN (SELECT j AS i, sum(w)::BIGINT AS losses FROM pairs GROUP BY 1) ls
        |    USING (i)),
        |tot AS (SELECT sum(gu)::BIGINT AS sg, count(*)::BIGINT AS k FROM g2),
        |fin AS (
        |  SELECT g2.i AS event_type, wl.wins, wl.losses,
        |         round(g2.gu::DOUBLE * t.k::DOUBLE / t.sg::DOUBLE, 6) + 0.0
        |           AS strength
        |  FROM g2 JOIN wl ON g2.i = wl.i, tot t)
        |SELECT event_type, wins, losses, strength,
        |       row_number() OVER (ORDER BY strength DESC, event_type)::BIGINT
        |         AS rnk
        |FROM fin ORDER BY event_type""".stripMargin,
    // blind parquet aggregates — the round-trip must be lossless
    "q401_xml_roundtrip" ->
      """SELECT 'file:' || o_orderstatus AS grp, count(*)::BIGINT AS n,
        |       round(sum(o_totalprice), 2) + 0.0 AS sum_val
        |FROM orders WHERE o_orderkey % 10 = 0 GROUP BY 1
        |UNION ALL
        |SELECT 'scalar:' || event_type, count(*)::BIGINT,
        |       round(sum(value), 2) + 0.0
        |FROM events WHERE event_id % 10 = 0 GROUP BY 1
        |ORDER BY grp""".stripMargin,
    "q402_text_source" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
        |       sum(length(text))::BIGINT AS sum_chars,
        |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // same user-level (score, treat, y) derivation, same score-census
    // cumulative windows, same mirrored Qini chain
    "q399_qini_uplift" ->
      """WITH users AS (
        |  SELECT user_id,
        |         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT
        |           AS score,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
        |           AS y,
        |         ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % 2
        |           AS treat
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY user_id),
        |census AS (
        |  SELECT score,
        |         sum(CASE WHEN treat = 1 THEN 1 ELSE 0 END)::BIGINT AS nt,
        |         sum(CASE WHEN treat = 0 THEN 1 ELSE 0 END)::BIGINT AS nc,
        |         sum(CASE WHEN treat = 1 THEN y ELSE 0 END)::BIGINT AS yt,
        |         sum(CASE WHEN treat = 0 THEN y ELSE 0 END)::BIGINT AS yc
        |  FROM users GROUP BY 1),
        |cum AS (
        |  SELECT score,
        |         sum(nt) OVER (ORDER BY score DESC)::BIGINT AS cnt,
        |         sum(nc) OVER (ORDER BY score DESC)::BIGINT AS cnc,
        |         sum(yt) OVER (ORDER BY score DESC)::BIGINT AS cyt,
        |         sum(yc) OVER (ORDER BY score DESC)::BIGINT AS cyc
        |  FROM census)
        |SELECT score, cnt AS n_treat, cnc AS n_ctrl, cyt AS y_treat,
        |       cyc AS y_ctrl,
        |       round(cyt::DOUBLE - cyc::DOUBLE * cnt::DOUBLE / cnc::DOUBLE, 6)
        |         + 0.0 AS qini
        |FROM cum WHERE cnc > 0 ORDER BY score DESC""".stripMargin,
    // same ±$3000 bandwidth, same cent/dollar grids, same mirrored
    // two-sided OLS chains and intercept jump
    "q400_regression_discontinuity" ->
      """WITH xy AS (
        |  SELECT floor(c.c_acctbal * 100.0 + 0.5)::BIGINT AS x,
        |         floor(o.o_totalprice * 100.0 + 0.5)::BIGINT // 100 AS y
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |fx AS (
        |  SELECT CASE WHEN x < 0 THEN 'below' ELSE 'above' END AS side, x, y
        |  FROM xy WHERE x >= -300000 AND x <= 300000),
        |m AS (
        |  SELECT side, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
        |         sum(y)::BIGINT AS sy, sum(x * x)::BIGINT AS sxx,
        |         sum(x * y)::BIGINT AS sxy
        |  FROM fx GROUP BY 1),
        |fit AS (
        |  SELECT side, n, sx, sy,
        |         (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
        |         (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) AS b
        |  FROM m),
        |ab AS (
        |  SELECT side, n, b,
        |         (sy::DOUBLE - b * sx::DOUBLE) / n::DOUBLE AS a
        |  FROM fit)
        |SELECT bl.n AS n_below, ab2.n AS n_above,
        |       round(bl.b * 100.0, 8) + 0.0 AS slope_below_per_dollar,
        |       round(ab2.b * 100.0, 8) + 0.0 AS slope_above_per_dollar,
        |       round(bl.a, 6) + 0.0 AS limit_below_dollar,
        |       round(ab2.a, 6) + 0.0 AS limit_above_dollar,
        |       round(ab2.a - bl.a, 6) + 0.0 AS rd_effect_dollar
        |FROM (SELECT * FROM ab WHERE side = 'below') bl,
        |     (SELECT * FROM ab WHERE side = 'above') ab2""".stripMargin,
    // q376's md5-half fixture, same per-cell 10⁻⁹ snap of the two KL
    // halves, same mirrored chains
    "q398_jensen_shannon" ->
      """WITH ev AS (
        |  SELECT event_type,
        |         floor(value * 100.0 + 0.5)::BIGINT // 500 AS bucket,
        |         ('0x' || substr(md5(event_id::VARCHAR), 1, 8))::BIGINT % 2
        |           AS half
        |  FROM events),
        |cells AS (
        |  SELECT event_type, bucket,
        |         sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)::BIGINT AS na,
        |         sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT AS nb
        |  FROM ev GROUP BY 1, 2),
        |tots AS (
        |  SELECT event_type, sum(na)::BIGINT AS ta, sum(nb)::BIGINT AS tb,
        |         count(*)::BIGINT AS n_buckets
        |  FROM cells GROUP BY 1),
        |pq AS (
        |  SELECT c.event_type, c.na, c.nb, t.ta, t.tb, t.n_buckets,
        |         c.na::DOUBLE / t.ta::DOUBLE AS p,
        |         c.nb::DOUBLE / t.tb::DOUBLE AS q
        |  FROM cells c JOIN tots t USING (event_type)),
        |terms AS (
        |  SELECT event_type, ta, tb, n_buckets,
        |         floor((CASE WHEN na = 0 THEN 0.0
        |                ELSE 0.5 * p * ln(p / ((p + q) / 2.0)) END +
        |                CASE WHEN nb = 0 THEN 0.0
        |                ELSE 0.5 * q * ln(q / ((p + q) / 2.0)) END) * 1.0e9
        |               + 0.5)::BIGINT AS t_u
        |  FROM pq)
        |SELECT event_type, max(ta) AS n_a, max(tb) AS n_b,
        |       max(n_buckets) AS n_buckets,
        |       round(sum(t_u)::DOUBLE / 1.0e9, 6) + 0.0 AS jsd_nats,
        |       round(sum(t_u)::DOUBLE / 1.0e9 / ln(2.0), 6) + 0.0 AS jsd_bits
        |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin,
    // same first-view/first-subsequent-purchase day grid, same
    // cumulative-census order statistics
    "q396_time_to_convert" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |fv AS (
        |  SELECT user_id, min(us) AS v_us FROM ev
        |  WHERE event_type = 'view' GROUP BY 1),
        |lat AS (
        |  SELECT (min(p.us) - min(f.v_us)) // 86400000000 AS lat_d
        |  FROM ev p JOIN fv f USING (user_id)
        |  WHERE p.event_type = 'purchase' AND p.us >= f.v_us
        |  GROUP BY p.user_id),
        |census AS (
        |  SELECT lat_d, count(*)::BIGINT AS c,
        |         sum(count(*)) OVER (ORDER BY lat_d)::BIGINT AS cum
        |  FROM lat GROUP BY 1),
        |tot AS (SELECT sum(c)::BIGINT AS n, sum(lat_d * c)::BIGINT AS s
        |        FROM census)
        |SELECT t.n AS n_converted,
        |       min(CASE WHEN c.cum * 2 >= t.n THEN c.lat_d END) AS p50_days,
        |       min(CASE WHEN c.cum * 10 >= t.n * 9 THEN c.lat_d END) AS p90_days,
        |       min(CASE WHEN c.cum * 100 >= t.n * 99 THEN c.lat_d END) AS p99_days,
        |       round(t.s::DOUBLE / t.n::DOUBLE, 6) + 0.0 AS mean_days
        |FROM census c, tot t GROUP BY t.n, t.s""".stripMargin,
    // same complete-block filter, same ×2 average-rank grid
    // (rank_asc + k+1 − rank_desc), same mirrored χ² chain
    "q393_friedman_test" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         sum(floor(value * 100.0 + 0.5)::BIGINT)::BIGINT AS v
        |  FROM events GROUP BY 1, 2),
        |complete AS (
        |  SELECT day, event_type, v,
        |         count(*) OVER (PARTITION BY day) AS k
        |  FROM daily QUALIFY k = 5),
        |ranked AS (
        |  SELECT day, event_type,
        |         (rank() OVER (PARTITION BY day ORDER BY v) +
        |          6 - rank() OVER (PARTITION BY day ORDER BY v DESC))::BIGINT
        |           AS r2
        |  FROM complete),
        |sums AS (
        |  SELECT event_type, count(*)::BIGINT AS b, sum(r2)::BIGINT AS r2sum
        |  FROM ranked GROUP BY 1),
        |tot AS (
        |  SELECT max(b) AS bb, sum(r2sum * r2sum)::BIGINT AS sr4 FROM sums)
        |SELECT s.event_type, s.b,
        |       round(s.r2sum::DOUBLE / 2.0 / s.b::DOUBLE, 6) + 0.0 AS mean_rank,
        |       round(12.0 / (t.bb::DOUBLE * 5.0 * 6.0) * (t.sr4::DOUBLE / 4.0)
        |             - 3.0 * t.bb::DOUBLE * 6.0, 6) + 0.0 AS chi2_f,
        |       (12.0 / (t.bb::DOUBLE * 5.0 * 6.0) * (t.sr4::DOUBLE / 4.0)
        |        - 3.0 * t.bb::DOUBLE * 6.0) > 9.487729 AS reject_equal_ranks
        |FROM sums s, tot t ORDER BY s.event_type""".stripMargin,
    // same exact covariance moments, same broadcast (μ, Σ⁻¹) chain,
    // same 10⁻⁹ D² snap for the census threshold and the heap order
    "q394_mahalanobis_outliers" ->
      """WITH xy AS (
        |  SELECT l_orderkey AS ok, l_linenumber AS ln,
        |         floor(l_quantity + 0.5)::BIGINT AS x,
        |         floor(l_extendedprice + 0.5)::BIGINT AS y
        |  FROM lineitem),
        |m0 AS (
        |  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
        |         sum(y)::BIGINT AS sy, sum(x * x)::BIGINT AS sxx,
        |         sum(x * y)::BIGINT AS sxy, sum(y * y)::BIGINT AS syy
        |  FROM xy),
        |m AS (
        |  SELECT n,
        |         sx::DOUBLE / n::DOUBLE AS mx, sy::DOUBLE / n::DOUBLE AS my,
        |         sxx::DOUBLE / n::DOUBLE - (sx::DOUBLE / n::DOUBLE) * (sx::DOUBLE / n::DOUBLE) AS vxx,
        |         sxy::DOUBLE / n::DOUBLE - (sx::DOUBLE / n::DOUBLE) * (sy::DOUBLE / n::DOUBLE) AS vxy,
        |         syy::DOUBLE / n::DOUBLE - (sy::DOUBLE / n::DOUBLE) * (sy::DOUBLE / n::DOUBLE) AS vyy
        |  FROM m0),
        |m2 AS (SELECT *, vxx * vyy - vxy * vxy AS det FROM m),
        |scored AS (
        |  SELECT xy.ok, xy.ln, xy.x, xy.y,
        |         floor(((m2.vyy * (xy.x::DOUBLE - m2.mx) * (xy.x::DOUBLE - m2.mx)
        |           - 2.0 * m2.vxy * (xy.x::DOUBLE - m2.mx) * (xy.y::DOUBLE - m2.my)
        |           + m2.vxx * (xy.y::DOUBLE - m2.my) * (xy.y::DOUBLE - m2.my))
        |           / m2.det) * 1000000000.0 + 0.5)::BIGINT AS d2_n
        |  FROM xy, m2),
        |census AS (
        |  SELECT count(*)::BIGINT AS n_rows,
        |         sum(CASE WHEN d2_n > 13815500000 THEN 1 ELSE 0 END)::BIGINT
        |           AS n_outliers
        |  FROM scored)
        |SELECT s.ok AS l_orderkey, s.ln AS l_linenumber, s.x AS quantity,
        |       s.y AS price_dollar,
        |       round(s.d2_n::DOUBLE / 1000000000.0, 6) + 0.0 AS d2,
        |       c.n_rows, c.n_outliers
        |FROM scored s, census c
        |ORDER BY s.d2_n DESC, s.ok, s.ln LIMIT 10""".stripMargin,
    // q284's scaled-centered census and 10⁻⁶ ρ grid, the same exact
    // femto-grid summands, one mirrored double chain for Q
    "q392_ljung_box" ->
      """WITH days AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, count(*)::BIGINT AS y
        |  FROM events GROUP BY 1),
        |tot AS (SELECT count(*)::BIGINT AS nd, sum(y)::BIGINT AS s FROM days),
        |c AS (
        |  SELECT day, nd, (nd * y - s)::BIGINT AS cy FROM days, tot),
        |den AS (SELECT sum(cy * cy)::BIGINT AS den, max(nd) AS nd FROM c),
        |rho AS (
        |  SELECT l.lag, count(*)::BIGINT AS n_pairs, max(d.nd) AS nd,
        |         floor((sum(a.cy * b.cy)::DOUBLE / max(d.den)::DOUBLE)
        |               * 1000000.0 + 0.5)::BIGINT AS r_u
        |  FROM (SELECT unnest(generate_series(1, 7)) AS lag) l
        |  JOIN c a ON TRUE
        |  JOIN c b ON b.day = a.day - l.lag
        |  CROSS JOIN den d
        |  GROUP BY l.lag),
        |terms AS (
        |  SELECT lag, n_pairs, nd, r_u,
        |         ((r_u * r_u * 1000) // (nd - lag))::BIGINT AS term_f
        |  FROM rho),
        |q AS (
        |  SELECT round(max(nd)::DOUBLE * (max(nd) + 2)::DOUBLE *
        |               (sum(term_f)::DOUBLE / 1.0e15), 6) AS q_stat
        |  FROM terms)
        |SELECT t.lag, t.n_pairs, t.r_u::DOUBLE / 1000000.0 AS rho,
        |       q.q_stat + 0.0 AS q_stat,
        |       q.q_stat > 14.067140 AS reject_white_noise
        |FROM terms t, q ORDER BY t.lag""".stripMargin,
    // same integer-dollar day census, same full-window 7-day MA,
    // same centi-grid sum-of-squares identities
    "q389_seasonal_decomp" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS d,
        |         sum(floor(o_totalprice * 100.0 + 0.5)::BIGINT // 100)::BIGINT
        |           AS rev
        |  FROM orders GROUP BY 1),
        |ma AS (
        |  SELECT d, rev,
        |         sum(rev) OVER (ORDER BY d
        |           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)::BIGINT AS s7,
        |         count(*) OVER (ORDER BY d
        |           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)::BIGINT AS c7
        |  FROM daily),
        |det AS (
        |  SELECT dayofweek(d)::BIGINT AS dow, rev - (s7 // 7) AS det
        |  FROM ma WHERE c7 = 7),
        |bd AS (
        |  SELECT dow, count(*)::BIGINT AS n_days, sum(det)::BIGINT AS sd,
        |         sum(det::HUGEINT * det) AS sdd
        |  FROM det GROUP BY 1),
        |bd2 AS (
        |  SELECT dow, n_days, sd, sdd,
        |         sum(sd::DOUBLE * sd / n_days) OVER (ORDER BY dow
        |           ROWS UNBOUNDED PRECEDING) AS vb_cum
        |  FROM bd),
        |tot AS (
        |  SELECT sum(n_days)::BIGINT AS n, sum(sd)::BIGINT AS st,
        |         sum(sdd) AS stt, max(vb_cum) AS ssb
        |  FROM bd2),
        |j AS (
        |  SELECT dow, n_days, sd,
        |         stt::DOUBLE - st::DOUBLE * st / n AS ssd_d,
        |         stt::DOUBLE - ssb AS ssr_d, n::DOUBLE AS nd
        |  FROM bd2, tot)
        |SELECT dow, n_days,
        |       round(sd::DOUBLE / n_days::DOUBLE, 6) + 0.0 AS effect_dollar,
        |       round(greatest(0.0, 1.0 - ssr_d / ssd_d), 6) + 0.0
        |         AS seasonal_strength,
        |       round(sqrt(greatest(0.0, ssr_d) / nd), 6) + 0.0 AS resid_sd
        |FROM j ORDER BY dow""".stripMargin,
    // same (ts, event_id) total order, same contiguous trigrams,
    // same (support desc, occurrences desc, pattern) heap
    "q390_sequence_patterns" ->
      """WITH tri AS (
        |  SELECT user_id,
        |         concat_ws('>', event_type,
        |           lead(event_type, 1) OVER w,
        |           lead(event_type, 2) OVER w) AS pattern,
        |         lead(event_type, 2) OVER w AS t3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT pattern, count(DISTINCT user_id)::BIGINT AS support_users,
        |       count(*)::BIGINT AS occurrences
        |FROM tri WHERE t3 IS NOT NULL GROUP BY 1
        |ORDER BY support_users DESC, occurrences DESC, pattern
        |LIMIT 10""".stripMargin,
    // same dollar/cent grids, same per-mille weight snap before the
    // exact weighted moments (HUGEINT ≡ the engine's DECIMAL(38,0)),
    // same mirrored OLS → σ → k → IRLS chains
    "q387_huber_regression" ->
      """WITH xy AS (
        |  SELECT floor(o.o_totalprice * 100.0 + 0.5)::BIGINT // 100 AS y,
        |         floor(c.c_acctbal * 100.0 + 0.5)::BIGINT AS x
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |m AS (
        |  SELECT count(*)::BIGINT AS n, sum(x) AS sx, sum(y) AS sy,
        |         sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
        |  FROM xy),
        |fit AS (
        |  SELECT n, sx, sy, sxy, sxx, syy,
        |         (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
        |         (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) AS b
        |  FROM m),
        |fit2 AS (
        |  SELECT n, sx, sy, sxy, sxx, syy, b,
        |         (sy::DOUBLE - b * sx::DOUBLE) / n::DOUBLE AS a
        |  FROM fit),
        |fit3 AS (
        |  SELECT n, a, b,
        |         sqrt((syy::DOUBLE + n::DOUBLE * a * a + b * b * sxx::DOUBLE
        |               - 2.0 * a * sy::DOUBLE - 2.0 * b * sxy::DOUBLE
        |               + 2.0 * a * b * sx::DOUBLE) / n::DOUBLE) AS sigma
        |  FROM fit2),
        |fit4 AS (SELECT n, a, b, sigma, 1.345 * sigma AS k FROM fit3),
        |wrows AS (
        |  SELECT xy.x, xy.y, f.n, f.a, f.b, f.sigma,
        |         CASE WHEN abs(xy.y::DOUBLE - f.a - f.b * xy.x::DOUBLE) <= f.k
        |              THEN 1000::BIGINT
        |              ELSE floor(1000.0 * f.k /
        |                abs(xy.y::DOUBLE - f.a - f.b * xy.x::DOUBLE)
        |                + 0.5)::BIGINT END AS wu
        |  FROM xy, fit4 f),
        |wm AS (
        |  SELECT max(n) AS n, max(a) AS ols_a, max(b) AS ols_b,
        |         max(sigma) AS sigma,
        |         sum(wu) AS sw, sum(wu * x) AS swx, sum(wu * y) AS swy,
        |         sum(wu * x * x) AS swxx, sum(wu * x * y) AS swxy,
        |         sum(CASE WHEN wu < 1000 THEN 1 ELSE 0 END)::BIGINT AS n_down
        |  FROM wrows),
        |sol AS (
        |  SELECT n, ols_a, ols_b, sigma, n_down,
        |         (sw::DOUBLE * swxy::DOUBLE - swx::DOUBLE * swy::DOUBLE) /
        |         (sw::DOUBLE * swxx::DOUBLE - swx::DOUBLE * swx::DOUBLE) AS bh,
        |         swy::DOUBLE AS swyd, sw::DOUBLE AS swd, swx::DOUBLE AS swxd
        |  FROM wm)
        |SELECT n, n_down, round(ols_b, 6) + 0.0 AS ols_slope,
        |       round(ols_a, 6) + 0.0 AS ols_intercept,
        |       round(sigma, 6) + 0.0 AS sigma,
        |       round(bh, 6) + 0.0 AS huber_slope,
        |       round((swyd - bh * swxd) / swd, 6) + 0.0 AS huber_intercept
        |FROM sol""".stripMargin,
    // same md5 double-ranking permutation, same exact moments, same
    // mirrored OLS/SSE chains
    "q385_perm_importance" ->
      """WITH base AS (
        |  SELECT l_orderkey AS ok, l_linenumber AS ln,
        |         epoch_us(l_shipdate) // 86400000000 AS day,
        |         floor(l_extendedprice + 0.5)::BIGINT AS y,
        |         floor(l_quantity + 0.5)::BIGINT AS x1,
        |         floor(l_discount * 100.0 + 0.5)::BIGINT AS x2
        |  FROM lineitem),
        |lhs AS (
        |  SELECT day, row_number() OVER (PARTITION BY day
        |      ORDER BY md5(concat_ws('-', 'a', ok, ln, x1, x2, y)),
      |                 ok, ln, x1, x2, y) AS rn,
        |    y, x1, x2 FROM base),
        |p1 AS (
        |  SELECT day, row_number() OVER (PARTITION BY day
        |      ORDER BY md5(concat_ws('-', 'b1', ok, ln, x1, x2, y)),
      |                 ok, ln, x1, x2, y) AS rn,
        |    x1 AS x1p FROM base),
        |p2 AS (
        |  SELECT day, row_number() OVER (PARTITION BY day
        |      ORDER BY md5(concat_ws('-', 'b2', ok, ln, x1, x2, y)),
      |                 ok, ln, x1, x2, y) AS rn,
        |    x2 AS x2p FROM base),
        |m AS (
        |  SELECT count(*)::BIGINT AS n, sum(y)::BIGINT AS sy,
        |         sum(y * y)::BIGINT AS syy,
        |         sum(x1)::BIGINT AS sx1, sum(x1 * x1)::BIGINT AS sxx1,
        |         sum(x1 * y)::BIGINT AS sxy1, sum(x1p * y)::BIGINT AS sxyp1,
        |         sum(x2)::BIGINT AS sx2, sum(x2 * x2)::BIGINT AS sxx2,
        |         sum(x2 * y)::BIGINT AS sxy2, sum(x2p * y)::BIGINT AS sxyp2
        |  FROM lhs JOIN p1 USING (day, rn) JOIN p2 USING (day, rn)),
        |f AS (
        |  SELECT 'quantity' AS feature, n, sy, syy, sx1 AS sx, sxx1 AS sxx,
        |         sxy1 AS sxy, sxyp1 AS sxyp FROM m
        |  UNION ALL
        |  SELECT 'discount_pct', n, sy, syy, sx2, sxx2, sxy2, sxyp2 FROM m),
        |fit AS (
        |  SELECT feature, n, sy, syy, sx, sxx, sxy, sxyp,
        |         (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
        |         (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) AS b
        |  FROM f),
        |fit2 AS (
        |  SELECT feature, n, syy, sxx, sx, sxy, sxyp, b,
        |         (sy::DOUBLE - b * sx::DOUBLE) / n::DOUBLE AS a,
        |         sy::DOUBLE AS syd
        |  FROM fit),
        |ss AS (
        |  SELECT feature, n, b,
        |         syy::DOUBLE + n::DOUBLE * a * a + b * b * sxx::DOUBLE
        |           - 2.0 * a * syd - 2.0 * b * sxy::DOUBLE
        |           + 2.0 * a * b * sx::DOUBLE AS sseb,
        |         syy::DOUBLE + n::DOUBLE * a * a + b * b * sxx::DOUBLE
        |           - 2.0 * a * syd - 2.0 * b * sxyp::DOUBLE
        |           + 2.0 * a * b * sx::DOUBLE AS ssep
        |  FROM fit2)
        |SELECT feature, n, round(b, 6) + 0.0 AS slope,
        |       round(sseb / n::DOUBLE, 4) + 0.0 AS mse_base,
        |       round(ssep / n::DOUBLE, 4) + 0.0 AS mse_perm,
        |       round((ssep - sseb) / sseb * 100.0, 4) + 0.0 AS importance_pct
        |FROM ss ORDER BY feature""".stripMargin,
    // same word/vowel-run/sentence-proxy integers, same per-doc
    // micro-grid Flesch snap before the source sum
    "q386_readability" ->
      """WITH d AS (
        |  SELECT source,
        |         greatest(len(list_filter(string_split(text, ' '),
        |                                  t -> t != '')), 1)::BIGINT AS w,
        |         len(regexp_extract_all(text, '[aeiouy]+'))::BIGINT AS sy
        |  FROM documents),
        |s AS (SELECT source, w, sy, (w + 15) // 16 AS sent FROM d),
        |f AS (
        |  SELECT source, w, sy,
        |         floor((206.835 - 1.015 * (w::DOUBLE / sent::DOUBLE)
        |                - 84.6 * (sy::DOUBLE / w::DOUBLE)) * 1000000.0
        |               + 0.5)::BIGINT AS f_u
        |  FROM s)
        |SELECT source, count(*)::BIGINT AS n_docs,
        |       round(sum(f_u)::DOUBLE / count(*)::DOUBLE / 1000000.0, 6) + 0.0
        |         AS mean_flesch,
        |       round(sum(w)::DOUBLE / count(*)::DOUBLE, 6) + 0.0 AS mean_words,
        |       round(sum(sy)::DOUBLE / sum(w)::DOUBLE, 6) + 0.0 AS syll_per_word
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    // same cents moments, same mirrored double chains (Σenc via the
    // closed form, never a float sum)
    "q383_target_encoding" ->
      """WITH y AS (
        |  SELECT c.c_mktsegment AS seg,
        |         floor(o.o_totalprice * 100.0 + 0.5)::BIGINT AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |segs AS (
        |  SELECT seg, count(*)::BIGINT AS n, sum(cents)::BIGINT AS s,
        |         max(cents) AS ymax, min(cents) AS ymin
        |  FROM y GROUP BY 1),
        |gtot AS (SELECT sum(cents)::BIGINT AS stot, count(*)::BIGINT AS ntot
        |         FROM y),
        |j AS (
        |  SELECT seg, n, s, ymax, ymin,
        |         stot::DOUBLE / ntot::DOUBLE AS mu,
        |         n::DOUBLE AS nd, s::DOUBLE AS sd
        |  FROM segs, gtot)
        |SELECT seg, n,
        |       round(sd / nd / 100.0, 6) + 0.0 AS mean_dollar,
        |       round(((s - ymax)::DOUBLE + 20.0 * mu) / (nd - 1.0 + 20.0)
        |             / 100.0, 6) + 0.0 AS enc_at_max,
        |       round(((s - ymin)::DOUBLE + 20.0 * mu) / (nd - 1.0 + 20.0)
        |             / 100.0, 6) + 0.0 AS enc_at_min,
        |       round(((nd - 1.0) * sd + 20.0 * nd * mu) /
        |             (nd * (nd - 1.0 + 20.0)) / 100.0, 6) + 0.0
        |         AS mean_enc_dollar
        |FROM j ORDER BY seg""".stripMargin,
    // same distinct incidence with the same lowest-200-partkeys
    // basket cap, same bounded pair join, same snapped-factor cos²
    // grid and (score desc, a, b) heap
    "q384_item_item_cf" ->
      """WITH inc AS (
        |  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |cp AS (
        |  SELECT c, p FROM inc
        |  QUALIFY row_number() OVER (PARTITION BY c ORDER BY p) <= 200),
        |pop AS (SELECT p, count(*)::BIGINT AS n FROM cp GROUP BY 1),
        |pairs AS (
        |  SELECT a.p AS pa, b.p AS pb, count(*)::BIGINT AS co
        |  FROM cp a JOIN cp b ON a.c = b.c AND a.p < b.p
        |  GROUP BY 1, 2)
        |SELECT pr.pa, pr.pb, pr.co, na.n AS na, nb.n AS nb,
        |       ((pr.co * 1000000 // na.n) * (pr.co * 1000000 // nb.n))::BIGINT
        |         AS cos2_p12
        |FROM pairs pr
        |JOIN pop na ON pr.pa = na.p
        |JOIN pop nb ON pr.pb = nb.p
        |ORDER BY cos2_p12 DESC, pr.pa, pr.pb LIMIT 15""".stripMargin,
    // the same integer PH fold replayed as a bounded recursive CTE
    // (q368's protocol): daily mean cents series, δ=50, λ=2000,
    // expressions repeated because a recursive SELECT cannot reference
    // its own aliases
    "q381_page_hinkley" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         (sum(floor(value * 100.0 + 0.5)::BIGINT)::BIGINT
        |           // count(*)) AS xm
        |  FROM events GROUP BY 1, 2),
        |ser AS (
        |  SELECT event_type,
        |         row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
        |         xm
        |  FROM daily),
        |nn AS (SELECT event_type, count(*)::BIGINT AS n_days FROM ser GROUP BY 1),
        |rec AS (
        |  SELECT event_type, 1::BIGINT AS rn, xm AS ssum, (-50)::BIGINT AS m,
        |         (-50)::BIGINT AS mn, 0::BIGINT AS mx, 0::BIGINT AS al,
        |         (-1)::BIGINT AS fa
        |  FROM ser WHERE rn = 1
        |  UNION ALL
        |  SELECT r.event_type, r.rn + 1, r.ssum + s.xm,
        |         (r.m + s.xm - ((r.ssum + s.xm) // (r.rn + 1)) - 50),
        |         least(r.mn,
        |               r.m + s.xm - ((r.ssum + s.xm) // (r.rn + 1)) - 50),
        |         greatest(r.mx,
        |           (r.m + s.xm - ((r.ssum + s.xm) // (r.rn + 1)) - 50) -
        |           least(r.mn,
        |                 r.m + s.xm - ((r.ssum + s.xm) // (r.rn + 1)) - 50)),
        |         r.al + CASE WHEN
        |           (r.m + s.xm - ((r.ssum + s.xm) // (r.rn + 1)) - 50) -
        |           least(r.mn,
        |                 r.m + s.xm - ((r.ssum + s.xm) // (r.rn + 1)) - 50)
        |           > 2000 THEN 1 ELSE 0 END,
        |         CASE WHEN r.fa >= 0 THEN r.fa WHEN
        |           (r.m + s.xm - ((r.ssum + s.xm) // (r.rn + 1)) - 50) -
        |           least(r.mn,
        |                 r.m + s.xm - ((r.ssum + s.xm) // (r.rn + 1)) - 50)
        |           > 2000 THEN r.rn + 1 ELSE -1 END
        |  FROM rec r JOIN ser s
        |    ON s.event_type = r.event_type AND s.rn = r.rn + 1)
        |SELECT rec.event_type, nn.n_days,
        |       round(rec.mx::DOUBLE / 100.0, 2) + 0.0 AS ph_max_dollar,
        |       rec.al AS alarm_days, rec.fa AS first_alarm_rn
        |FROM rec JOIN nn USING (event_type) WHERE rec.rn = nn.n_days
        |ORDER BY rec.event_type""".stripMargin,
    // same ⌊20x⌋ cells, same 3×3 offset census, same core/border/noise
    // classification
    "q382_grid_density" ->
      """WITH pts AS (
        |  SELECT vec_id, label,
        |         floor(embedding[1]::DOUBLE * 20)::BIGINT AS cx,
        |         floor(embedding[2]::DOUBLE * 20)::BIGINT AS cy
        |  FROM embeddings),
        |cells AS (SELECT cx, cy, count(*)::BIGINT AS cnt FROM pts GROUP BY 1, 2),
        |offs AS (SELECT a.dx, b.dy
        |         FROM (VALUES (-1), (0), (1)) a(dx), (VALUES (-1), (0), (1)) b(dy)),
        |nbh AS (SELECT c.cx + o.dx AS cx, c.cy + o.dy AS cy,
        |               sum(c.cnt)::BIGINT AS nb
        |        FROM cells c, offs o GROUP BY 1, 2),
        |cl AS (SELECT c.cx, c.cy, n.nb >= 25 AS is_core
        |       FROM cells c JOIN nbh n USING (cx, cy)),
        |ca AS (SELECT DISTINCT c.cx + o.dx AS cx, c.cy + o.dy AS cy
        |       FROM cl c, offs o WHERE c.is_core),
        |cc AS (SELECT cl.cx, cl.cy,
        |              CASE WHEN cl.is_core THEN 'core'
        |                   WHEN ca.cx IS NOT NULL THEN 'border'
        |                   ELSE 'noise' END AS cls
        |       FROM cl LEFT JOIN ca ON cl.cx = ca.cx AND cl.cy = ca.cy)
        |SELECT p.label, count(*)::BIGINT AS n_pts,
        |       sum(CASE WHEN cls = 'core' THEN 1 ELSE 0 END)::BIGINT AS n_core,
        |       sum(CASE WHEN cls = 'border' THEN 1 ELSE 0 END)::BIGINT AS n_border,
        |       sum(CASE WHEN cls = 'noise' THEN 1 ELSE 0 END)::BIGINT AS n_noise
        |FROM pts p JOIN cc ON p.cx = cc.cx AND p.cy = cc.cy
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // same top-257 heap, same micro-nat ln grid, same integer Hill
    // numerator k·mean − k·ln_(k+1)
    "q379_hill_tail" ->
      """WITH top AS (
        |  SELECT cents, row_number() OVER (ORDER BY cents DESC) AS r,
        |         floor(ln(cents::DOUBLE) * 1000000 + 0.5)::BIGINT AS lnx
        |  FROM (SELECT floor(o_totalprice * 100 + 0.5)::BIGINT AS cents
        |        FROM orders ORDER BY cents DESC LIMIT 257)),
        |mom AS (
        |  SELECT sum(CASE WHEN r <= 64 THEN lnx END)::BIGINT AS s64,
        |         sum(CASE WHEN r <= 128 THEN lnx END)::BIGINT AS s128,
        |         sum(CASE WHEN r <= 256 THEN lnx END)::BIGINT AS s256,
        |         max(CASE WHEN r = 65 THEN lnx END) AS l65,
        |         max(CASE WHEN r = 129 THEN lnx END) AS l129,
        |         max(CASE WHEN r = 257 THEN lnx END) AS l257,
        |         max(CASE WHEN r = 65 THEN cents END) AS c65,
        |         max(CASE WHEN r = 129 THEN cents END) AS c129,
        |         max(CASE WHEN r = 257 THEN cents END) AS c257
        |  FROM top),
        |ks AS (
        |  SELECT 64::BIGINT AS k, (s64 - 64 * l65)::BIGINT AS hnum, c65 AS ckp1 FROM mom
        |  UNION ALL
        |  SELECT 128, (s128 - 128 * l129)::BIGINT, c129 FROM mom
        |  UNION ALL
        |  SELECT 256, (s256 - 256 * l257)::BIGINT, c257 FROM mom)
        |SELECT k, round(ckp1 / 100.0, 2) + 0.0 AS x_kplus1_dollar,
        |       round(hnum::DOUBLE / (k::DOUBLE * 1000000.0), 6) + 0.0 AS hill_h,
        |       round(k::DOUBLE * 1000000.0 / hnum::DOUBLE, 6) + 0.0 AS alpha
        |FROM ks ORDER BY k""".stripMargin,
    // same (type, dollar-bucket) census, same bucket-max candidates,
    // same BIGINT 10×pinball off cumulative moments, same (loss, b)
    // argmin tie-break
    "q380_pinball_quantile" ->
      """WITH census AS (
        |  SELECT event_type, cents // 100 AS b, count(*)::BIGINT AS cnt,
        |         sum(cents)::BIGINT AS s
        |  FROM (SELECT event_type,
        |               floor(value * 100 + 0.5)::BIGINT AS cents FROM events)
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT event_type, b,
        |         sum(cnt) OVER (PARTITION BY event_type ORDER BY b)::BIGINT AS cum_n,
        |         sum(s) OVER (PARTITION BY event_type ORDER BY b)::BIGINT AS cum_s,
        |         sum(cnt) OVER (PARTITION BY event_type)::BIGINT AS tot_n,
        |         sum(s) OVER (PARTITION BY event_type)::BIGINT AS tot_s,
        |         (b * 100 + 99)::BIGINT AS q
        |  FROM census),
        |lossed AS (
        |  SELECT event_type, b, tot_n, cum_n,
        |         (9 * (tot_s - cum_s - q * (tot_n - cum_n)) +
        |          (q * cum_n - cum_s))::BIGINT AS loss10
        |  FROM scored),
        |best AS (
        |  SELECT event_type, tot_n AS n, b AS best_b, loss10
        |  FROM lossed
        |  QUALIFY row_number() OVER (PARTITION BY event_type
        |                             ORDER BY loss10, b) = 1),
        |emp AS (
        |  SELECT event_type, min(b) AS emp_b FROM lossed
        |  WHERE cum_n * 10 >= tot_n * 9 GROUP BY 1)
        |SELECT l.event_type, l.n,
        |       round((l.best_b * 100 + 99) / 100.0, 2) + 0.0 AS q90_dollar,
        |       round(l.loss10::DOUBLE / (l.n::DOUBLE * 1000.0), 6) + 0.0
        |         AS mean_pinball,
        |       round((e.emp_b * 100 + 99) / 100.0, 2) + 0.0 AS emp_q90_dollar
        |FROM best l JOIN emp e ON l.event_type = e.event_type
        |ORDER BY l.event_type""".stripMargin,
    // the same six rules as blind counts — uniqueness via duplicate
    // census, referential via left-join null count, ranges/domains
    // via predicates
    "q377_expectations_suite" ->
      """WITH r1 AS (
        |  SELECT 'orders.o_orderkey unique' AS rule,
        |         sum(c)::BIGINT AS n_checked,
        |         coalesce(sum(CASE WHEN c > 1 THEN c END), 0)::BIGINT AS n_failed
        |  FROM (SELECT count(*)::BIGINT AS c FROM orders GROUP BY o_orderkey)),
        |r2 AS (
        |  SELECT 'lineitem.l_orderkey references orders' AS rule,
        |         count(*)::BIGINT AS n_checked,
        |         sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT
        |           AS n_failed
        |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |r3 AS (
        |  SELECT 'orders.o_totalprice positive' AS rule,
        |         count(*)::BIGINT AS n_checked,
        |         sum(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END)::BIGINT
        |           AS n_failed
        |  FROM orders),
        |r4 AS (
        |  SELECT 'customer.c_mktsegment in domain' AS rule,
        |         count(*)::BIGINT AS n_checked,
        |         sum(CASE WHEN c_mktsegment IN ('AUTOMOBILE', 'BUILDING',
        |             'FURNITURE', 'HOUSEHOLD', 'MACHINERY') THEN 0 ELSE 1
        |             END)::BIGINT AS n_failed
        |  FROM customer),
        |r5 AS (
        |  SELECT 'events.value non-negative' AS rule,
        |         count(*)::BIGINT AS n_checked,
        |         sum(CASE WHEN value < 0.0 THEN 1 ELSE 0 END)::BIGINT AS n_failed
        |  FROM events),
        |r6 AS (
        |  SELECT 'events.event_id unique' AS rule,
        |         sum(c)::BIGINT AS n_checked,
        |         coalesce(sum(CASE WHEN c > 1 THEN c END), 0)::BIGINT AS n_failed
        |  FROM (SELECT count(*)::BIGINT AS c FROM events GROUP BY event_id))
        |SELECT rule, n_checked, n_failed, n_failed = 0 AS pass
        |FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2
        |      UNION ALL SELECT * FROM r3 UNION ALL SELECT * FROM r4
        |      UNION ALL SELECT * FROM r5 UNION ALL SELECT * FROM r6)
        |ORDER BY rule""".stripMargin,
    // same per-series minute-grid gaps, same exact moments, same
    // μ/σ/B chains
    "q378_burstiness" ->
      """WITH gaps AS (
        |  SELECT event_type,
        |         (us - lag(us) OVER (PARTITION BY event_type, user_id
        |            ORDER BY us, event_id)) // 60000000 AS gap_m
        |  FROM (SELECT event_type, user_id, epoch_us(ts) AS us, event_id
        |        FROM events)),
        |mom AS (
        |  SELECT event_type, count(*)::BIGINT AS n_gaps,
        |         sum(gap_m)::BIGINT AS s, sum(gap_m * gap_m)::BIGINT AS s2
        |  FROM gaps WHERE gap_m IS NOT NULL GROUP BY 1),
        |m2 AS (
        |  SELECT event_type, n_gaps,
        |         s::DOUBLE / n_gaps::DOUBLE AS mu,
        |         sqrt(s2::DOUBLE / n_gaps::DOUBLE -
        |              (s::DOUBLE / n_gaps::DOUBLE) *
        |              (s::DOUBLE / n_gaps::DOUBLE)) AS sig
        |  FROM mom)
        |SELECT event_type, n_gaps,
        |       round(mu, 6) + 0.0 AS mean_gap_min,
        |       round(sig, 6) + 0.0 AS sd_gap_min,
        |       round((sig - mu) / (sig + mu), 6) + 0.0 AS burstiness
        |FROM m2 ORDER BY event_type""".stripMargin,
    // same censuses, same exhaustive split scoring (snapped S²/n
    // identity), same (score desc, feature, split) argmax, same
    // offset-div integer predictions and residual round
    "q374_boosted_stumps" -> {
      def score(cells: String, maxSplit: Int, feature: String): String =
        s"""SELECT '$feature' AS feature, q.s AS split,
           |       CAST(floor(sl::DOUBLE * sl::DOUBLE / nl_::DOUBLE +
           |            sr::DOUBLE * sr::DOUBLE / nr::DOUBLE + 0.5) AS BIGINT)
           |         AS score_u,
           |       ((sl + 1000000000 * nl_) // nl_ - 1000000000)::BIGINT AS pred_left,
           |       ((sr + 1000000000 * nr) // nr - 1000000000)::BIGINT AS pred_right
           |FROM (
           |  SELECT sp.s,
           |         sum(CASE WHEN v <= sp.s THEN n END)::BIGINT AS nl_,
           |         sum(CASE WHEN v <= sp.s THEN sv END)::BIGINT AS sl,
           |         sum(CASE WHEN v > sp.s THEN n END)::BIGINT AS nr,
           |         sum(CASE WHEN v > sp.s THEN sv END)::BIGINT AS sr
           |  FROM $cells CROSS JOIN
           |       (SELECT unnest(range(1, ${maxSplit + 1})) AS s) sp
           |  GROUP BY sp.s) q
           |WHERE nl_ IS NOT NULL AND nr IS NOT NULL""".stripMargin
      s"""WITH lc AS (
         |  SELECT l_orderkey, count(*)::BIGINT AS nl FROM lineitem GROUP BY 1),
         |base AS (
         |  SELECT lc.nl, substr(o.o_orderpriority, 1, 1)::BIGINT AS pr,
         |         CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) // 100 AS y
         |  FROM orders o JOIN lc ON o.o_orderkey = lc.l_orderkey),
         |c1n AS (SELECT nl AS v, count(*)::BIGINT AS n, sum(y)::BIGINT AS sv
         |        FROM base GROUP BY 1),
         |c1p AS (SELECT pr AS v, count(*)::BIGINT AS n, sum(y)::BIGINT AS sv
         |        FROM base GROUP BY 1),
         |b1 AS (
         |  SELECT * FROM (${score("c1n", 6, "nl")} UNION ALL ${score("c1p", 4, "pr")})
         |  ORDER BY score_u DESC, feature ASC, split ASC LIMIT 1),
         |rr AS (
         |  SELECT base.nl, base.pr, base.y,
         |         CASE WHEN (b1.feature = 'nl' AND base.nl <= b1.split)
         |                OR (b1.feature = 'pr' AND base.pr <= b1.split)
         |              THEN b1.pred_left ELSE b1.pred_right END AS pred1
         |  FROM base CROSS JOIN b1),
         |r2 AS (SELECT nl, pr, y, pred1, y - pred1 AS r FROM rr),
         |c2n AS (SELECT nl AS v, count(*)::BIGINT AS n, sum(r)::BIGINT AS sv
         |        FROM r2 GROUP BY 1),
         |c2p AS (SELECT pr AS v, count(*)::BIGINT AS n, sum(r)::BIGINT AS sv
         |        FROM r2 GROUP BY 1),
         |b2 AS (
         |  SELECT * FROM (${score("c2n", 6, "nl")} UNION ALL ${score("c2p", 4, "pr")})
         |  ORDER BY score_u DESC, feature ASC, split ASC LIMIT 1),
         |fin AS (
         |  SELECT count(*)::BIGINT AS n,
         |         (sum(abs(y - pred1)) // count(*))::BIGINT AS mae_round1,
         |         (sum(abs(y - pred1 -
         |            CASE WHEN (b2.feature = 'nl' AND r2.nl <= b2.split)
         |                   OR (b2.feature = 'pr' AND r2.pr <= b2.split)
         |                 THEN b2.pred_left ELSE b2.pred_right END))
         |          // count(*))::BIGINT AS mae_round2
         |  FROM r2 CROSS JOIN b2)
         |SELECT r.round, r.feature, r.split, r.pred_left, r.pred_right,
         |       fin.n, fin.mae_round1, fin.mae_round2
         |FROM (
         |  SELECT 1::BIGINT AS round, feature, split, pred_left, pred_right FROM b1
         |  UNION ALL
         |  SELECT 2::BIGINT, feature, split, pred_left, pred_right FROM b2) r
         |CROSS JOIN fin
         |ORDER BY round""".stripMargin
    },
    // same md5 half split, same bucket census, per-cell √ snapped to
    // the 10⁻⁹ grid before the sum, same bounded-metric chains
    "q376_hellinger_drift" ->
      """WITH ev AS (
        |  SELECT event_type,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) // 500 AS bucket,
        |         ('0x' || substr(md5(event_id::VARCHAR), 1, 8))::BIGINT % 2 AS half
        |  FROM events),
        |cells AS (
        |  SELECT event_type, bucket,
        |         sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)::BIGINT AS na,
        |         sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT AS nb
        |  FROM ev GROUP BY 1, 2),
        |tots AS (
        |  SELECT event_type, sum(na)::BIGINT AS ta, sum(nb)::BIGINT AS tb,
        |         count(*)::BIGINT AS n_buckets
        |  FROM cells GROUP BY 1),
        |t AS (
        |  SELECT cells.event_type, ta, tb, n_buckets,
        |         CAST(floor(sqrt((na * nb)::DOUBLE /
        |              (ta::DOUBLE * tb::DOUBLE)) * 1000000000.0 + 0.5)
        |           AS BIGINT) AS bc_u
        |  FROM cells JOIN tots USING (event_type))
        |SELECT event_type, max(ta) AS n_a, max(tb) AS n_b,
        |       max(n_buckets) AS n_buckets,
        |       round(sum(bc_u)::DOUBLE / 1000000000.0, 6) + 0.0
        |         AS bhattacharyya,
        |       round(sqrt(greatest(1.0 - sum(bc_u)::DOUBLE / 1000000000.0,
        |                           0.0)), 6) + 0.0 AS hellinger
        |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin,
    // same day census, same census-median signs (ties dropped), same
    // integer run-boundary census, same μ/σ/z chains
    "q371_runs_test" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |         sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))::BIGINT AS dc
        |  FROM events GROUP BY 1),
        |census AS (SELECT dc, count(*)::BIGINT AS cnt FROM daily GROUP BY 1),
        |cc AS (
        |  SELECT dc, cnt, (sum(cnt) OVER (ORDER BY dc
        |    ROWS UNBOUNDED PRECEDING))::BIGINT AS cum FROM census),
        |n AS (SELECT sum(cnt)::BIGINT AS n FROM census),
        |med AS (SELECT min(dc)::BIGINT AS med FROM cc CROSS JOIN n
        |        WHERE cum * 2 >= n + 1),
        |signed AS (
        |  SELECT day, CASE WHEN dc > med THEN 1 ELSE 0 END AS s
        |  FROM daily CROSS JOIN med WHERE dc <> med),
        |runs AS (
        |  SELECT day, s, lag(s) OVER (ORDER BY day) AS prev FROM signed),
        |agg AS (
        |  SELECT sum(CASE WHEN prev IS NULL OR prev <> s THEN 1 ELSE 0 END)::BIGINT AS r,
        |         sum(s)::BIGINT AS n1, sum(1 - s)::BIGINT AS n2
        |  FROM runs),
        |m AS (
        |  SELECT n1 + n2 AS n_days, n1 AS n_above, n2 AS n_below, r AS n_runs,
        |         n1::DOUBLE AS a, n2::DOUBLE AS b, r::DOUBLE AS rd
        |  FROM agg),
        |m2 AS (
        |  SELECT n_days, n_above, n_below, n_runs, rd,
        |         2.0 * a * b / (a + b) + 1.0 AS mu,
        |         2.0 * a * b * (2.0 * a * b - a - b) /
        |           ((a + b) * (a + b) * (a + b - 1.0)) AS v2
        |  FROM m)
        |SELECT n_days::BIGINT AS n_days, n_above, n_below, n_runs,
        |       round(mu, 6) + 0.0 AS mu_runs,
        |       round((rd - mu) / sqrt(v2), 6) + 0.0 AS z
        |FROM m2""".stripMargin,
    // same user-ordered lag pairs, same transition census, q323's
    // micro-nat log snap per cell, same integer entropy mixes
    "q372_markov_entropy" ->
      """WITH tr AS (
        |  SELECT event_type AS cur,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id) AS nxt
        |  FROM events),
        |cells AS (
        |  SELECT cur, nxt, count(*)::BIGINT AS nxy
        |  FROM tr WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |bc AS (SELECT cur, sum(nxy)::BIGINT AS nc FROM cells GROUP BY 1),
        |t AS (
        |  SELECT cells.cur, nxy,
        |         nxy * (CAST(floor(ln(nc::DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
        |              - CAST(floor(ln(nxy::DOUBLE) * 1000000.0 + 0.5) AS BIGINT))
        |           AS t_u
        |  FROM cells JOIN bc USING (cur)),
        |pc AS (
        |  SELECT cur, sum(nxy)::BIGINT AS n_trans, count(*)::BIGINT AS n_next,
        |         (sum(t_u) // sum(nxy))::BIGINT AS h_u
        |  FROM t GROUP BY 1),
        |ov AS (SELECT (sum(t_u) // sum(nxy))::BIGINT AS hall_u FROM t)
        |SELECT cur, n_trans, n_next,
        |       h_u::DOUBLE / 1000000.0 AS h_cond_nats,
        |       hall_u::DOUBLE / 1000000.0 AS h_overall_nats
        |FROM pc CROSS JOIN ov ORDER BY cur""".stripMargin,
    // same integer rules (exact census median, >= 4 lines), same 2x2
    // discordance census, same continuity-corrected χ² chain
    "q373_mcnemar" ->
      """WITH lc AS (
        |  SELECT l_orderkey, count(*)::BIGINT AS nl FROM lineitem GROUP BY 1),
        |base AS (
        |  SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |              THEN 1 ELSE 0 END AS y,
        |         CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS v,
        |         lc.nl
        |  FROM orders o JOIN lc ON o.o_orderkey = lc.l_orderkey),
        |census AS (SELECT v, count(*)::BIGINT AS cnt FROM base GROUP BY 1),
        |cc AS (
        |  SELECT v, cnt, (sum(cnt) OVER (ORDER BY v
        |    ROWS UNBOUNDED PRECEDING))::BIGINT AS cum FROM census),
        |n AS (SELECT sum(cnt)::BIGINT AS n FROM census),
        |med AS (SELECT min(v)::BIGINT AS med FROM cc CROSS JOIN n
        |        WHERE cum * 2 >= n + 1),
        |pred AS (
        |  SELECT y, CASE WHEN v > med THEN 1 ELSE 0 END AS pa,
        |         CASE WHEN nl >= 4 THEN 1 ELSE 0 END AS pb
        |  FROM base CROSS JOIN med),
        |agg AS (
        |  SELECT count(*)::BIGINT AS n,
        |         sum(CASE WHEN pa = y THEN 1 ELSE 0 END)::BIGINT AS ca,
        |         sum(CASE WHEN pb = y THEN 1 ELSE 0 END)::BIGINT AS cb,
        |         sum(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END)::BIGINT AS b,
        |         sum(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END)::BIGINT AS c
        |  FROM pred)
        |SELECT n, (ca * 1000000 // n)::BIGINT AS acc_a_ppm,
        |       (cb * 1000000 // n)::BIGINT AS acc_b_ppm,
        |       b AS a_only_correct, c AS b_only_correct,
        |       round((abs(b - c)::DOUBLE - 1.0) * (abs(b - c)::DOUBLE - 1.0)
        |             / (b + c)::DOUBLE, 6) + 0.0 AS chi2
        |FROM agg""".stripMargin,
    // q284's snapped-ρ grid, then the identical Durbin–Levinson chains
    "q369_pacf" ->
      """WITH days AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, count(*)::BIGINT AS y
        |  FROM events GROUP BY 1),
        |tot AS (SELECT count(*)::BIGINT AS nd, sum(y)::BIGINT AS s FROM days),
        |c AS (SELECT day, (nd * y - s)::BIGINT AS cy FROM days CROSS JOIN tot),
        |den AS (SELECT sum(cy * cy)::BIGINT AS den FROM c),
        |lagged AS (
        |  SELECT l.lag, c.day + l.lag AS day, c.cy AS cy0
        |  FROM (SELECT unnest(range(1, 4)) AS lag) l CROSS JOIN c),
        |rho AS (
        |  SELECT lag,
        |         floor(sum(c.cy * lagged.cy0)::DOUBLE /
        |               (SELECT den FROM den)::DOUBLE * 1000000.0 + 0.5)
        |           / 1000000.0 AS r
        |  FROM c JOIN lagged USING (day) GROUP BY lag),
        |rr AS (
        |  SELECT max(CASE WHEN lag = 1 THEN r END) AS r1,
        |         max(CASE WHEN lag = 2 THEN r END) AS r2,
        |         max(CASE WHEN lag = 3 THEN r END) AS r3
        |  FROM rho),
        |dl AS (
        |  SELECT r1, r2, r3,
        |         (r2 - r1 * r1) / (1.0 - r1 * r1) AS p22
        |  FROM rr),
        |dl2 AS (
        |  SELECT r1, r2, r3, p22, r1 - p22 * r1 AS p21 FROM dl),
        |dl3 AS (
        |  SELECT r1, p22,
        |         (r3 - p21 * r2 - p22 * r1) /
        |           (1.0 - p21 * r1 - p22 * r2) AS p33
        |  FROM dl2)
        |SELECT 1::BIGINT AS lag, round(r1, 6) + 0.0 AS pacf FROM dl3
        |UNION ALL SELECT 2::BIGINT, round(p22, 6) + 0.0 FROM dl3
        |UNION ALL SELECT 3::BIGINT, round(p33, 6) + 0.0 FROM dl3
        |ORDER BY lag""".stripMargin,
    // same dollar-grid moments, same fixed slope/intercept/s²/h/D
    // chains row-identical in both engines, same (D desc, key) cut
    "q370_cooks_distance" ->
      """WITH lc AS (
        |  SELECT l_orderkey, count(*)::BIGINT AS x FROM lineitem GROUP BY 1),
        |base AS (
        |  SELECT o.o_orderkey, lc.x,
        |         CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) // 100 AS yd
        |  FROM orders o JOIN lc ON o.o_orderkey = lc.l_orderkey),
        |mom AS (
        |  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
        |         sum(x * x)::BIGINT AS sxx, sum(yd)::BIGINT AS sy,
        |         sum(x * yd)::BIGINT AS sxy, sum(yd * yd)::BIGINT AS syy
        |  FROM base),
        |m1 AS (
        |  SELECT n::DOUBLE AS nd, sx::DOUBLE AS sxd, sxx::DOUBLE AS sxxd,
        |         sy::DOUBLE AS syd, sxy::DOUBLE AS sxyd, syy::DOUBLE AS syyd
        |  FROM mom),
        |m2 AS (
        |  SELECT nd, sxd, syd, syyd, sxyd,
        |         (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) AS b,
        |         sxxd - sxd * sxd / nd AS sxx_c
        |  FROM m1),
        |m3 AS (
        |  SELECT nd, sxd, sxx_c, b,
        |         (syd - b * sxd) / nd AS a,
        |         syyd - ((syd - b * sxd) / nd) * syd - b * sxyd AS sse
        |  FROM m2),
        |m4 AS (
        |  SELECT nd, sxd, sxx_c, a, b, sse / (nd - 2.0) AS s2 FROM m3),
        |sc AS (
        |  SELECT base.o_orderkey, base.x, base.yd,
        |         1.0 / nd + (x::DOUBLE - sxd / nd) * (x::DOUBLE - sxd / nd)
        |           / sxx_c AS h,
        |         yd::DOUBLE - (a + b * x::DOUBLE) AS e,
        |         s2
        |  FROM base CROSS JOIN m4)
        |SELECT o_orderkey, x, yd AS y_dollars,
        |       round(h, 6) + 0.0 AS leverage,
        |       round(e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)), 6) + 0.0
        |         AS cooks_d
        |FROM sc
        |ORDER BY e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)) DESC,
        |         o_orderkey ASC
        |LIMIT 10""".stripMargin,
    // same score census, same integer AP terms on the 10⁻⁶ grid, same
    // band-max PR polyline, one divide for AP
    "q367_pr_curve" ->
      """WITH ev AS (
        |  SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS sc,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM events),
        |census AS (
        |  SELECT sc, sum(pos)::BIGINT AS np, count(*)::BIGINT AS nc
        |  FROM ev GROUP BY sc),
        |cum AS (
        |  SELECT sc, np, nc,
        |         (sum(np) OVER (ORDER BY sc DESC
        |            ROWS UNBOUNDED PRECEDING))::BIGINT AS cp,
        |         (sum(nc) OVER (ORDER BY sc DESC
        |            ROWS UNBOUNDED PRECEDING))::BIGINT AS cc
        |  FROM census),
        |tot AS (SELECT sum(np)::BIGINT AS p FROM census),
        |ap AS (
        |  SELECT sum(np::HUGEINT * cp * 1000000 // cc)::DOUBLE /
        |         ((SELECT p FROM tot)::DOUBLE * 1000000.0) AS avg_precision
        |  FROM cum)
        |SELECT sc // 500 AS band, (sc // 500)::DOUBLE * 5.0 AS thr_usd,
        |       max(cp)::DOUBLE / max(cc)::DOUBLE AS precision,
        |       max(cp)::DOUBLE / (SELECT p FROM tot)::DOUBLE AS recall,
        |       (SELECT avg_precision FROM ap) AS avg_precision
        |FROM cum GROUP BY 1 ORDER BY band""".stripMargin,
    // the blind statement of the write→read contract: the text sink
    // emits each doc's UTF-8 bytes + one trailing newline, so the
    // digest of the file content must equal md5(text || chr(10))
    // recomputed from the TABLE — byte-lossless or hash-dead
    "q364_binaryfile_source" ->
      """SELECT doc_id,
        |       (octet_length(encode(text)) + 1)::BIGINT AS n_bytes,
        |       md5(text || chr(10)) AS content_md5
        |FROM documents WHERE doc_id < 64
        |ORDER BY doc_id""".stripMargin,
    // same daily dollar censuses, same lag spine, same exact BIGINT
    // moments, same closed-form 2-var and adjugate 3-var OLS chains
    "q365_granger_test" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         (sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) // 100)::BIGINT AS d
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT v.day, v.d AS y, c.d AS x
        |  FROM (SELECT day, d FROM daily WHERE event_type = 'view') v
        |  JOIN (SELECT day, d FROM daily WHERE event_type = 'click') c
        |    USING (day)),
        |lg AS (
        |  SELECT y, lag(y) OVER (ORDER BY day) AS yl,
        |         lag(x) OVER (ORDER BY day) AS xl
        |  FROM j),
        |mom AS (
        |  SELECT count(*)::BIGINT AS n, sum(y)::BIGINT AS sy,
        |         sum(yl)::BIGINT AS s1, sum(xl)::BIGINT AS s2,
        |         sum(yl * yl)::BIGINT AS s11, sum(yl * xl)::BIGINT AS s12,
        |         sum(xl * xl)::BIGINT AS s22, sum(y * y)::BIGINT AS syy,
        |         sum(y * yl)::BIGINT AS sy1, sum(y * xl)::BIGINT AS sy2
        |  FROM lg WHERE yl IS NOT NULL AND xl IS NOT NULL),
        |m1 AS (
        |  SELECT n, sy, syy, sy1, sy2,
        |         n::DOUBLE AS a11, s1::DOUBLE AS a12, s2::DOUBLE AS a13,
        |         s11::DOUBLE AS a22, s12::DOUBLE AS a23, s22::DOUBLE AS a33
        |  FROM mom),
        |m2 AS (
        |  SELECT n, sy, syy, sy1, sy2, a11, a12, a13, a22, a33,
        |         (a11 * sy1::DOUBLE - a12 * sy::DOUBLE) /
        |           (a11 * a22 - a12 * a12) AS br,
        |         a11 * (a22 * a33 - a23 * a23) - a12 * (a12 * a33 - a23 * a13)
        |           + a13 * (a12 * a23 - a22 * a13) AS det,
        |         (a22 * a33 - a23 * a23) AS c11, (a13 * a23 - a12 * a33) AS c12,
        |         (a12 * a23 - a13 * a22) AS c13, (a11 * a33 - a13 * a13) AS c22,
        |         (a12 * a13 - a11 * a23) AS c23, (a11 * a22 - a12 * a12) AS c33
        |  FROM m1),
        |m3 AS (
        |  SELECT n, syy, sy, sy1, sy2, br, det,
        |         (sy::DOUBLE - br * a12) / a11 AS ar,
        |         (c11 * sy::DOUBLE + c12 * sy1::DOUBLE + c13 * sy2::DOUBLE) / det AS b0,
        |         (c12 * sy::DOUBLE + c22 * sy1::DOUBLE + c23 * sy2::DOUBLE) / det AS b1,
        |         (c13 * sy::DOUBLE + c23 * sy1::DOUBLE + c33 * sy2::DOUBLE) / det AS b2
        |  FROM m2),
        |m4 AS (
        |  SELECT n, b1, b2,
        |         syy::DOUBLE - ar * sy::DOUBLE - br * sy1::DOUBLE AS sse_r,
        |         syy::DOUBLE - (b0 * sy::DOUBLE + b1 * sy1::DOUBLE
        |                        + b2 * sy2::DOUBLE) AS sse_f
        |  FROM m3)
        |SELECT n, round(b1, 6) + 0.0 AS beta_ylag, round(b2, 6) + 0.0 AS beta_xlag,
        |       round(sse_r, 2) + 0.0 AS sse_restricted,
        |       round(sse_f, 2) + 0.0 AS sse_full,
        |       round((sse_r - sse_f) * (n - 3)::DOUBLE / sse_f, 6) + 0.0 AS f_stat
        |FROM m4""".stripMargin,
    // same md5 coin, same per-replicate mean-difference chains, same
    // |d| >= |obs| census and ppm divide
    "q360_permutation_test" ->
      """WITH base AS (
        |  SELECT o.o_orderkey AS k,
        |         CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS v,
        |         CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS grp
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |obs AS (
        |  SELECT sum(CASE WHEN grp = 1 THEN v END)::DOUBLE /
        |           sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END)::DOUBLE
        |       - sum(CASE WHEN grp = 0 THEN v END)::DOUBLE /
        |           sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END)::DOUBLE AS obs_diff
        |  FROM base),
        |r AS (
        |  SELECT b.bi, base.v,
        |         CASE WHEN (('0x' || substr(md5(base.k::VARCHAR || '_' ||
        |                    (b.bi // 60)::VARCHAR), 1, 15))::BIGINT
        |                    >> (b.bi % 60)::INT) % 2 = 0
        |              THEN 1 ELSE 0 END AS ra
        |  FROM base CROSS JOIN range(0, 200) AS b(bi)),
        |agg AS (
        |  SELECT bi,
        |         sum(CASE WHEN ra = 1 THEN v END)::DOUBLE / sum(ra)::DOUBLE
        |       - sum(CASE WHEN ra = 0 THEN v END)::DOUBLE /
        |           sum(1 - ra)::DOUBLE AS d
        |  FROM r GROUP BY 1)
        |SELECT round(obs.obs_diff / 100.0, 4) + 0.0 AS obs_diff,
        |       count(*)::BIGINT AS b_reps,
        |       sum(CASE WHEN abs(agg.d) >= abs(obs.obs_diff)
        |                THEN 1 ELSE 0 END)::BIGINT AS n_extreme,
        |       (sum(CASE WHEN abs(agg.d) >= abs(obs.obs_diff)
        |                 THEN 1 ELSE 0 END) * 1000000 // count(*))::BIGINT
        |         AS p_value_ppm
        |FROM agg CROSS JOIN obs GROUP BY obs.obs_diff""".stripMargin,
    // same cell census, same exact BIGINT moments, same adjugate/det
    // chains, same sign(βᵀx) census and micro-nat snapped cell losses
    "q361_logistic_newton" ->
      """WITH lc AS (
        |  SELECT l_orderkey, count(*)::BIGINT AS f2 FROM lineitem GROUP BY 1),
        |base AS (
        |  SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |              THEN 1 ELSE 0 END AS y,
        |         CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
        |           // 1000000 AS f1,
        |         lc.f2
        |  FROM orders o JOIN lc ON o.o_orderkey = lc.l_orderkey),
        |cells AS (
        |  SELECT f1, f2, y, count(*)::BIGINT AS nc FROM base GROUP BY 1, 2, 3),
        |mom AS (
        |  SELECT sum(nc)::BIGINT AS n, sum(nc * f1)::BIGINT AS s1,
        |         sum(nc * f2)::BIGINT AS s2, sum(nc * f1 * f1)::BIGINT AS s11,
        |         sum(nc * f1 * f2)::BIGINT AS s12,
        |         sum(nc * f2 * f2)::BIGINT AS s22,
        |         sum(nc * y)::BIGINT AS sy, sum(nc * y * f1)::BIGINT AS sy1,
        |         sum(nc * y * f2)::BIGINT AS sy2
        |  FROM cells),
        |m2 AS (
        |  SELECT n, sy AS n_pos,
        |         n::DOUBLE AS a11, s1::DOUBLE AS a12, s2::DOUBLE AS a13,
        |         s11::DOUBLE AS a22, s12::DOUBLE AS a23, s22::DOUBLE AS a33,
        |         (2 * sy - n)::DOUBLE AS g1, (2 * sy1 - s1)::DOUBLE AS g2,
        |         (2 * sy2 - s2)::DOUBLE AS g3
        |  FROM mom),
        |m3 AS (
        |  SELECT n, n_pos, g1, g2, g3,
        |         a11 * (a22 * a33 - a23 * a23) - a12 * (a12 * a33 - a23 * a13)
        |           + a13 * (a12 * a23 - a22 * a13) AS det,
        |         (a22 * a33 - a23 * a23) AS c11, (a13 * a23 - a12 * a33) AS c12,
        |         (a12 * a23 - a13 * a22) AS c13, (a11 * a33 - a13 * a13) AS c22,
        |         (a12 * a13 - a11 * a23) AS c23, (a11 * a22 - a12 * a12) AS c33
        |  FROM m2),
        |b AS (
        |  SELECT n, n_pos,
        |         2.0 * (c11 * g1 + c12 * g2 + c13 * g3) / det AS b0,
        |         2.0 * (c12 * g1 + c22 * g2 + c23 * g3) / det AS b1,
        |         2.0 * (c13 * g1 + c23 * g2 + c33 * g3) / det AS b2
        |  FROM m3),
        |scored AS (
        |  SELECT cells.*, b.n, b.n_pos, b.b0, b.b1, b.b2,
        |         b.b0 + b.b1 * f1::DOUBLE + b.b2 * f2::DOUBLE AS z
        |  FROM cells CROSS JOIN b),
        |sc2 AS (
        |  SELECT *, CASE WHEN z > 0.0 THEN 1 ELSE 0 END AS pred,
        |         CAST(floor(CASE WHEN y = 1 THEN ln(1.0 + exp(-z))
        |                         ELSE ln(1.0 + exp(z)) END
        |                    * 1000000.0 + 0.5) AS BIGINT) AS loss_u
        |  FROM scored)
        |SELECT n, n_pos,
        |       round(b0, 6) + 0.0 AS beta0, round(b1, 6) + 0.0 AS beta1,
        |       round(b2, 6) + 0.0 AS beta2,
        |       sum(CASE WHEN pred = 1 THEN nc END)::BIGINT AS n_pred_pos,
        |       (sum(CASE WHEN pred = y THEN nc ELSE 0 END) * 1000000 // n)::BIGINT
        |         AS accuracy_ppm,
        |       (sum(nc * loss_u) // n)::BIGINT AS mean_loss_unats
        |FROM sc2 GROUP BY n, n_pos, b0, b1, b2""".stripMargin,
    // same cents census medians, same dollar-grid deviations, same
    // unit-snapped Σ²/n terms, same one fixed F chain
    "q358_brown_forsythe" ->
      """WITH x AS (
        |  SELECT o_orderpriority AS priority,
        |         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v
        |  FROM orders),
        |census AS (SELECT priority, v, count(*)::BIGINT AS cnt FROM x GROUP BY 1, 2),
        |cc AS (
        |  SELECT priority, v, cnt,
        |         (sum(cnt) OVER (PARTITION BY priority ORDER BY v
        |            ROWS UNBOUNDED PRECEDING))::BIGINT AS cum
        |  FROM census),
        |ng AS (SELECT priority, sum(cnt)::BIGINT AS n FROM census GROUP BY 1),
        |med AS (
        |  SELECT cc.priority, min(v)::BIGINT AS med
        |  FROM cc JOIN ng USING (priority) WHERE cum * 2 >= n + 1
        |  GROUP BY 1),
        |z AS (
        |  SELECT x.priority, abs(x.v - med.med) // 100 AS z
        |  FROM x JOIN med USING (priority)),
        |mom AS (
        |  SELECT priority, count(*)::BIGINT AS n, sum(z)::BIGINT AS s,
        |         sum(z * z)::BIGINT AS q,
        |         CAST(floor(sum(z)::DOUBLE * sum(z)::DOUBLE /
        |              count(*)::DOUBLE + 0.5) AS BIGINT) AS tu
        |  FROM z GROUP BY 1),
        |tot AS (
        |  SELECT sum(n)::BIGINT AS nn, sum(s)::BIGINT AS ss,
        |         sum(tu)::BIGINT AS st, sum(q)::BIGINT AS sq,
        |         count(*)::BIGINT AS k
        |  FROM mom),
        |fs AS (
        |  SELECT st - CAST(floor(ss::DOUBLE * ss::DOUBLE / nn::DOUBLE + 0.5)
        |              AS BIGINT) AS b,
        |         sq - st AS d, nn, k
        |  FROM tot)
        |SELECT mom.priority, mom.n, med.med::DOUBLE / 100.0 AS median_price,
        |       round(mom.s::DOUBLE / mom.n::DOUBLE, 2) + 0.0 AS mean_absdev,
        |       round(fs.b::DOUBLE / fs.d::DOUBLE *
        |             ((fs.nn - fs.k)::DOUBLE / (fs.k - 1)::DOUBLE), 6) + 0.0
        |         AS f_stat,
        |       (fs.k - 1)::BIGINT AS df1, (fs.nn - fs.k)::BIGINT AS df2
        |FROM mom JOIN med USING (priority) CROSS JOIN fs
        |ORDER BY priority""".stripMargin,
    // same dollar grid, same exact power sums, same fixed central-
    // moment chains
    "q354_higher_moments" ->
      """WITH base AS (
        |  SELECT event_type,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) // 100 AS v
        |  FROM events),
        |sums AS (
        |  SELECT event_type, count(*)::BIGINT AS n,
        |         sum(v)::BIGINT AS s1, sum(v * v)::BIGINT AS s2,
        |         sum(v * v * v)::BIGINT AS s3,
        |         sum(v * v * v * v)::BIGINT AS s4
        |  FROM base GROUP BY 1)
        |SELECT event_type, n, s1, s2, s3, s4,
        |       round((s3::DOUBLE / n::DOUBLE
        |              - 3.0 * (s1::DOUBLE / n::DOUBLE) * (s2::DOUBLE / n::DOUBLE)
        |              + 2.0 * (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE)
        |                * (s1::DOUBLE / n::DOUBLE))
        |             / ((s2::DOUBLE / n::DOUBLE
        |                 - (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE))
        |                * sqrt(s2::DOUBLE / n::DOUBLE
        |                       - (s1::DOUBLE / n::DOUBLE)
        |                         * (s1::DOUBLE / n::DOUBLE))), 6) AS skewness,
        |       round((s4::DOUBLE / n::DOUBLE
        |              - 4.0 * (s1::DOUBLE / n::DOUBLE) * (s3::DOUBLE / n::DOUBLE)
        |              + 6.0 * (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE)
        |                * (s2::DOUBLE / n::DOUBLE)
        |              - 3.0 * (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE)
        |                * (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE))
        |             / ((s2::DOUBLE / n::DOUBLE
        |                 - (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE))
        |                * (s2::DOUBLE / n::DOUBLE
        |                   - (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE)))
        |             - 3.0, 6) AS excess_kurtosis
        |FROM sums
        |ORDER BY event_type""".stripMargin,
    // same bucket censuses, same integer burn grids and thresholds
    "q350_slo_burn_rate" ->
      """WITH ev AS (
        |  SELECT epoch_us(ts) // 21600000000 AS b6,
        |         epoch_us(ts) // 86400000000 AS day,
        |         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS err
        |  FROM events),
        |s AS (
        |  SELECT b6, day, count(*)::BIGINT AS n6, sum(err)::BIGINT AS e6
        |  FROM ev GROUP BY 1, 2),
        |l AS (
        |  SELECT day, count(*)::BIGINT AS n24, sum(err)::BIGINT AS e24
        |  FROM ev GROUP BY 1),
        |j AS (
        |  SELECT s.b6, s.day, s.n6, s.e6, s.e6 * 5000000 // s.n6 AS burn6_u,
        |         l.n24, l.e24, l.e24 * 5000000 // l.n24 AS burn24_u
        |  FROM s JOIN l USING (day))
        |SELECT b6, day, n6, e6, burn6_u, n24, e24, burn24_u,
        |       (burn6_u >= 1200000 AND burn24_u >= 1200000)::BIGINT AS page,
        |       (burn6_u >= 1050000 AND burn24_u >= 1050000)::BIGINT AS ticket
        |FROM j
        |ORDER BY b6""".stripMargin,
    // same dimension-side cuts, same per-bucket containment estimates,
    // same true join count
    "q348_join_card_estimate" ->
      """WITH dc AS (
        |  SELECT c_custkey AS v, count(*)::BIGINT AS cnt
        |  FROM customer GROUP BY 1),
        |cc AS (
        |  SELECT v, cnt,
        |         (sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING))::BIGINT AS cum
        |  FROM dc),
        |tot AS (SELECT sum(cnt)::BIGINT AS n FROM cc),
        |cuts AS (
        |  SELECT min(CASE WHEN cum * 8 >= n * 1 THEN v END) AS c1,
        |         min(CASE WHEN cum * 8 >= n * 2 THEN v END) AS c2,
        |         min(CASE WHEN cum * 8 >= n * 3 THEN v END) AS c3,
        |         min(CASE WHEN cum * 8 >= n * 4 THEN v END) AS c4,
        |         min(CASE WHEN cum * 8 >= n * 5 THEN v END) AS c5,
        |         min(CASE WHEN cum * 8 >= n * 6 THEN v END) AS c6,
        |         min(CASE WHEN cum * 8 >= n * 7 THEN v END) AS c7,
        |         min(CASE WHEN cum * 8 >= n * 8 THEN v END) AS c8
        |  FROM cc, tot),
        |ab AS (
        |  SELECT CASE WHEN v <= c1 THEN 1 WHEN v <= c2 THEN 2 WHEN v <= c3 THEN 3
        |              WHEN v <= c4 THEN 4 WHEN v <= c5 THEN 5 WHEN v <= c6 THEN 6
        |              WHEN v <= c7 THEN 7 ELSE 8 END::BIGINT AS bucket,
        |         count(*)::BIGINT AS na, count(DISTINCT v)::BIGINT AS ndv_a
        |  FROM (SELECT o_custkey AS v FROM orders), cuts GROUP BY 1),
        |bb AS (
        |  SELECT CASE WHEN v <= c1 THEN 1 WHEN v <= c2 THEN 2 WHEN v <= c3 THEN 3
        |              WHEN v <= c4 THEN 4 WHEN v <= c5 THEN 5 WHEN v <= c6 THEN 6
        |              WHEN v <= c7 THEN 7 ELSE 8 END::BIGINT AS bucket,
        |         count(*)::BIGINT AS nb, count(DISTINCT v)::BIGINT AS ndv_b
        |  FROM (SELECT c_custkey AS v FROM customer), cuts GROUP BY 1),
        |per AS (
        |  SELECT coalesce(ab.bucket, bb.bucket) AS bucket,
        |         coalesce(na, 0)::BIGINT AS na, coalesce(nb, 0)::BIGINT AS nb,
        |         coalesce(ndv_a, 0)::BIGINT AS ndv_a,
        |         coalesce(ndv_b, 0)::BIGINT AS ndv_b,
        |         coalesce(na, 0) * coalesce(nb, 0)
        |           // greatest(coalesce(ndv_a, 0), coalesce(ndv_b, 0), 1) AS est_b
        |  FROM ab FULL JOIN bb USING (bucket)),
        |act AS (
        |  SELECT count(*)::BIGINT AS actual
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |tt AS (
        |  SELECT sum(est_b)::BIGINT AS est_total, act.actual,
        |         (abs(sum(est_b) - act.actual) * 1000000 // act.actual)::BIGINT AS err_ppm
        |  FROM per, act GROUP BY act.actual)
        |SELECT bucket, na, nb, ndv_a, ndv_b, est_b, est_total, actual, err_ppm
        |FROM per, tt
        |ORDER BY bucket""".stripMargin,
    // same integer (n, succ) census, same Wilson chain, same
    // (rounded bound desc, partkey) top-10 cut
    "q347_wilson_ranking" ->
      """WITH per AS (
        |  SELECT l_partkey, count(*)::BIGINT AS n,
        |         sum(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END)::BIGINT
        |           AS succ
        |  FROM lineitem GROUP BY l_partkey HAVING count(*) >= 20),
        |w AS (
        |  SELECT l_partkey, n, succ,
        |         round((succ::DOUBLE / n::DOUBLE
        |                + 1.959964 * 1.959964 / (2.0 * n::DOUBLE)
        |                - 1.959964 * sqrt((succ::DOUBLE / n::DOUBLE
        |                                   * (1.0 - succ::DOUBLE / n::DOUBLE)
        |                                   + 1.959964 * 1.959964 / (4.0 * n::DOUBLE))
        |                                  / n::DOUBLE))
        |               / (1.0 + 1.959964 * 1.959964 / n::DOUBLE), 6) AS wilson_lb
        |  FROM per)
        |SELECT l_partkey, n, succ, succ * 1000000 // n AS succ_rate_ppm, wilson_lb
        |FROM w
        |ORDER BY wilson_lb DESC, l_partkey ASC
        |LIMIT 10""".stripMargin,
    // same md5-byte captures, same exact Chapman integer, same
    // variance chain
    "q342_capture_recapture" ->
      """WITH mk AS (
        |  SELECT CASE WHEN ('0x' || substr(md5(c_custkey::VARCHAR), 1, 2))::BIGINT
        |                   < 96 THEN 1 ELSE 0 END AS in1,
        |         CASE WHEN ('0x' || substr(md5('r|' || c_custkey::VARCHAR), 1, 2))::BIGINT
        |                   < 96 THEN 1 ELSE 0 END AS in2
        |  FROM customer),
        |agg AS (
        |  SELECT count(*)::BIGINT AS n_true, sum(in1)::BIGINT AS n1,
        |         sum(in2)::BIGINT AS n2, sum(in1 * in2)::BIGINT AS m
        |  FROM mk)
        |SELECT n_true, n1, n2, m,
        |       (n1 + 1) * (n2 + 1) // (m + 1) - 1 AS n_hat,
        |       round(((n1 + 1) * (n2 + 1))::DOUBLE * (n1 - m)::DOUBLE
        |             * (n2 - m)::DOUBLE
        |             / ((m + 1)::DOUBLE * (m + 1)::DOUBLE * (m + 2)::DOUBLE), 4)
        |         AS var_hat
        |FROM agg""".stripMargin,
    // q334's moments, closed-form method-of-moments; underdispersed
    // types surface NULLs in both engines
    "q344_negbinomial_fit" ->
      """WITH pu AS (
        |  SELECT event_type, user_id, count(*)::BIGINT AS c
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, count(*)::BIGINT AS n_users,
        |         sum(c)::BIGINT AS s1, sum(c * c)::BIGINT AS s2
        |  FROM pu GROUP BY 1),
        |calc AS (
        |  SELECT event_type, n_users,
        |         s1::DOUBLE / n_users::DOUBLE AS mean_c,
        |         (s2::DOUBLE - s1::DOUBLE * s1::DOUBLE / n_users::DOUBLE)
        |           / (n_users::DOUBLE - 1.0) AS var_c
        |  FROM m)
        |SELECT event_type, n_users,
        |       round(mean_c, 6) AS mean_c, round(var_c, 6) AS var_c,
        |       round(CASE WHEN var_c > mean_c
        |                  THEN mean_c * mean_c / (var_c - mean_c) END, 6) AS r_hat,
        |       round(CASE WHEN var_c > mean_c
        |                  THEN mean_c / var_c END, 6) AS p_hat
        |FROM calc
        |ORDER BY event_type""".stripMargin,
    // same census, same rank chains, same min-v-with-cum>=rank lookups
    "q341_median_ci" ->
      """WITH census AS (
        |  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v,
        |         count(*)::BIGINT AS cnt
        |  FROM orders GROUP BY v),
        |cc AS (
        |  SELECT v, cnt,
        |         (sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING))::BIGINT AS cum
        |  FROM census),
        |rk AS (
        |  SELECT sum(cnt)::BIGINT AS n,
        |         ((sum(cnt) + 1) // 2)::BIGINT AS med_rank,
        |         CAST(floor((sum(cnt)::DOUBLE - 1.96 * sqrt(sum(cnt)::DOUBLE))
        |                    / 2.0) AS BIGINT) AS lo_rank,
        |         CAST(ceil(1.0 + (sum(cnt)::DOUBLE + 1.96 * sqrt(sum(cnt)::DOUBLE))
        |                   / 2.0) AS BIGINT) AS hi_rank
        |  FROM census)
        |SELECT rk.n, rk.med_rank, rk.lo_rank, rk.hi_rank,
        |       min(CASE WHEN cum >= med_rank THEN v END) AS median_cents,
        |       min(CASE WHEN cum >= lo_rank THEN v END) AS ci_lo_cents,
        |       min(CASE WHEN cum >= hi_rank THEN v END) AS ci_hi_cents
        |FROM cc, rk
        |GROUP BY rk.n, rk.med_rank, rk.lo_rank, rk.hi_rank""".stripMargin,
    // same two-feature candidate census, same cumulative class counts,
    // same Gini chain and (rounded score, feat, cut) argmin
    "q336_decision_stump" ->
      """WITH base AS (
        |  SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
        |         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price,
        |         epoch_us(o_orderdate) // 86400000000 % 7 AS dow
        |  FROM orders),
        |census AS (
        |  SELECT feat, v, count(*)::BIGINT AS cnt, sum(y)::BIGINT AS pos
        |  FROM (SELECT 'price' AS feat, price AS v, y FROM base
        |        UNION ALL
        |        SELECT 'dow' AS feat, dow AS v, y FROM base)
        |  GROUP BY 1, 2),
        |cc AS (
        |  SELECT *,
        |         (sum(cnt) OVER (PARTITION BY feat ORDER BY v
        |                         ROWS UNBOUNDED PRECEDING))::BIGINT AS cumn,
        |         (sum(pos) OVER (PARTITION BY feat ORDER BY v
        |                         ROWS UNBOUNDED PRECEDING))::BIGINT AS cump
        |  FROM census),
        |tot AS (SELECT count(*)::BIGINT AS n, sum(y)::BIGINT AS npos FROM base),
        |cands AS (
        |  SELECT cc.*, tot.n, tot.npos,
        |         (cumn::DOUBLE
        |          - (cump::DOUBLE * cump::DOUBLE
        |             + (cumn - cump)::DOUBLE * (cumn - cump)::DOUBLE)
        |            / cumn::DOUBLE
        |          + (n - cumn)::DOUBLE
        |          - ((npos - cump)::DOUBLE * (npos - cump)::DOUBLE
        |             + (n - cumn - npos + cump)::DOUBLE
        |               * (n - cumn - npos + cump)::DOUBLE)
        |            / (n - cumn)::DOUBLE) / n::DOUBLE AS gini
        |  FROM cc, tot WHERE cumn < tot.n),
        |best AS (
        |  SELECT * FROM cands
        |  QUALIFY row_number() OVER (ORDER BY round(gini, 9) ASC, feat ASC, v ASC) = 1)
        |SELECT feat AS feature, v AS cut, n, npos,
        |       cumn AS n_left, cump AS pos_left,
        |       n - cumn AS n_right, npos - cump AS pos_right,
        |       round(gini, 6) AS split_gini,
        |       round(1.0 - npos::DOUBLE / n::DOUBLE * (npos::DOUBLE / n::DOUBLE)
        |             - (n - npos)::DOUBLE / n::DOUBLE
        |               * ((n - npos)::DOUBLE / n::DOUBLE), 6) AS baseline_gini
        |FROM best""".stripMargin,
    // same per-user count census and exact moments; D/chi2/z replayed
    // as the identical double chains
    "q334_dispersion_test" ->
      """WITH pu AS (
        |  SELECT event_type, user_id, count(*)::BIGINT AS c
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, count(*)::BIGINT AS n_users,
        |         sum(c)::BIGINT AS s1, sum(c * c)::BIGINT AS s2
        |  FROM pu GROUP BY 1),
        |calc AS (
        |  SELECT event_type, n_users, s1, s2,
        |         round((s2::DOUBLE - s1::DOUBLE * s1::DOUBLE / n_users::DOUBLE)
        |               / (n_users::DOUBLE - 1.0)
        |               / (s1::DOUBLE / n_users::DOUBLE), 6) AS dispersion,
        |         round(sqrt(2.0 * (s2::DOUBLE - s1::DOUBLE * s1::DOUBLE
        |                           / n_users::DOUBLE)
        |                    / (s1::DOUBLE / n_users::DOUBLE))
        |               - sqrt(2.0 * (n_users::DOUBLE - 1.0) - 1.0), 6) AS z
        |  FROM m)
        |SELECT event_type, n_users, s1, s2, dispersion, z,
        |       CASE WHEN z > 1.959964 THEN 'overdispersed'
        |            WHEN z < -1.959964 THEN 'underdispersed'
        |            ELSE 'poisson_ok' END AS verdict
        |FROM calc
        |ORDER BY event_type""".stripMargin,
    // same value census, same census-rank cuts, same integer bucket
    // censuses
    "q335_column_stats" ->
      """WITH census AS (
        |  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v,
        |         count(*)::BIGINT AS cnt
        |  FROM orders GROUP BY v),
        |cc AS (
        |  SELECT v, cnt,
        |         (sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING))::BIGINT AS cum
        |  FROM census),
        |tot AS (SELECT sum(cnt)::BIGINT AS n, count(*)::BIGINT AS ndv,
        |               min(v) AS vmin, max(v) AS vmax FROM cc),
        |cuts AS (
        |  SELECT tot.n, tot.ndv, tot.vmin, tot.vmax,
        |         min(CASE WHEN cum * 8 >= n * 1 THEN v END) AS c1,
        |         min(CASE WHEN cum * 8 >= n * 2 THEN v END) AS c2,
        |         min(CASE WHEN cum * 8 >= n * 3 THEN v END) AS c3,
        |         min(CASE WHEN cum * 8 >= n * 4 THEN v END) AS c4,
        |         min(CASE WHEN cum * 8 >= n * 5 THEN v END) AS c5,
        |         min(CASE WHEN cum * 8 >= n * 6 THEN v END) AS c6,
        |         min(CASE WHEN cum * 8 >= n * 7 THEN v END) AS c7,
        |         min(CASE WHEN cum * 8 >= n * 8 THEN v END) AS c8
        |  FROM cc, tot GROUP BY 1, 2, 3, 4)
        |SELECT CASE WHEN v <= c1 THEN 1 WHEN v <= c2 THEN 2 WHEN v <= c3 THEN 3
        |            WHEN v <= c4 THEN 4 WHEN v <= c5 THEN 5 WHEN v <= c6 THEN 6
        |            WHEN v <= c7 THEN 7 ELSE 8 END::BIGINT AS bucket,
        |       n, ndv, vmin, vmax,
        |       min(v) AS lo, max(v) AS hi,
        |       sum(cnt)::BIGINT AS n_rows, count(*)::BIGINT AS ndv_bucket
        |FROM cc, cuts
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY bucket""".stripMargin,
    // the three median-cut rounds unrolled; same census-rank medians,
    // same cell-id evolution, same range report
    "q332_mondrian" -> {
      val p0 =
        """WITH p0 AS MATERIALIZED (
          |  SELECT c_custkey AS id,
          |         CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS a,
          |         c_nationkey::BIGINT AS n, 0::BIGINT AS cell
          |  FROM customer)""".stripMargin
      val rounds = Seq("a", "n", "a").zipWithIndex.map { case (d, i) =>
        val (prev, cur) = (s"p$i", s"p${i + 1}")
        s""",
           |cen$cur AS (
           |  SELECT cell, $d AS v, count(*)::BIGINT AS cnt FROM $prev GROUP BY 1, 2),
           |med$cur AS (
           |  SELECT cell, min(v) AS med FROM (
           |    SELECT c.cell, c.v,
           |           (sum(c.cnt) OVER (PARTITION BY c.cell ORDER BY c.v
           |                             ROWS UNBOUNDED PRECEDING))::BIGINT AS cum,
           |           t.nc
           |    FROM cen$cur c
           |    JOIN (SELECT cell, sum(cnt)::BIGINT AS nc FROM cen$cur GROUP BY cell) t
           |      USING (cell))
           |  WHERE cum * 2 >= nc GROUP BY cell),
           |$cur AS MATERIALIZED (
           |  SELECT p.id, p.a, p.n,
           |         p.cell * 2 + CASE WHEN p.$d > m.med THEN 1 ELSE 0 END AS cell
           |  FROM $prev p JOIN med$cur m USING (cell))""".stripMargin
      }.mkString
      val tail =
        """
          |SELECT cell, count(*)::BIGINT AS n_rows,
          |       min(a)::BIGINT AS a_min, max(a)::BIGINT AS a_max,
          |       min(n)::BIGINT AS n_min, max(n)::BIGINT AS n_max,
          |       (count(*) >= 10)::BIGINT AS k_ok
          |FROM p3
          |GROUP BY cell
          |ORDER BY cell""".stripMargin
      p0 + rounds + tail
    },
    // one flat ORDER BY rank — the engine assembles the SAME rank
    // without a global sort (bucket offsets + partitioned windows);
    // identical membership proves the two-level rank correct
    "q329_systematic_sample" ->
      """WITH pop AS (
        |  SELECT o_orderkey, o_orderstatus,
        |         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
        |         md5(o_orderkey::VARCHAR) AS h
        |  FROM orders),
        |r AS (SELECT *, row_number() OVER (ORDER BY h, o_orderkey) AS grank FROM pop),
        |s AS (SELECT * FROM r WHERE grank % 37 = 1),
        |pt AS (SELECT count(*)::BIGINT AS n_pop, sum(cents)::BIGINT AS pop_cents
        |       FROM pop)
        |SELECT o_orderstatus, count(*)::BIGINT AS n_sample,
        |       sum(cents)::BIGINT AS sample_cents,
        |       pt.n_pop, pt.pop_cents,
        |       count(*) * 1000000 // pt.n_pop AS status_rate_ppm
        |FROM s, pt
        |GROUP BY o_orderstatus, pt.n_pop, pt.pop_cents
        |ORDER BY o_orderstatus""".stripMargin,
    // same truncated journeys and transition census; the 20 integer
    // value-iteration rounds unrolled as CTEs, same clamps and grids
    "q328_markov_attribution" -> {
      val base =
        """WITH ev AS (
          |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events),
          |o AS (
          |  SELECT *, sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          |              OVER (PARTITION BY user_id ORDER BY us, event_id
          |                    ROWS UNBOUNDED PRECEDING) AS pc
          |  FROM ev),
          |kept AS (
          |  SELECT * FROM o
          |  WHERE pc - (CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 0),
          |sq AS (
          |  SELECT *,
          |         lag(event_type) OVER (PARTITION BY user_id
          |                               ORDER BY us, event_id) AS prev,
          |         row_number() OVER (PARTITION BY user_id
          |                            ORDER BY us DESC, event_id DESC) AS rdesc
          |  FROM kept),
          |t1 AS (
          |  SELECT coalesce(prev, 'START') AS f,
          |         CASE WHEN event_type = 'purchase' THEN 'CONV'
          |              ELSE event_type END AS t
          |  FROM sq),
          |t2 AS (
          |  SELECT event_type AS f, 'NULL' AS t
          |  FROM sq WHERE rdesc = 1 AND event_type <> 'purchase'),
          |tr AS MATERIALIZED (
          |  SELECT f, t, count(*)::BIGINT AS n
          |  FROM (SELECT * FROM t1 UNION ALL SELECT * FROM t2) GROUP BY 1, 2),
          |ns AS MATERIALIZED (SELECT f, sum(n)::BIGINT AS ntot FROM tr GROUP BY f),
          |frame AS MATERIALIZED (
          |  SELECT sc.scen, st.s
          |  FROM (SELECT unnest(['full','click','error','signup','view']) AS scen) sc,
          |       (SELECT unnest(['START','click','error','signup','view']) AS s) st),
          |r0 AS (SELECT scen, s, 0::BIGINT AS p FROM frame)""".stripMargin
      val iters = (1 to 20).map { k =>
        s""",
           |r$k AS MATERIALIZED (
           |  SELECT c.scen, c.s,
           |         CASE WHEN c.s = c.scen OR c.ntot IS NULL THEN 0
           |              ELSE c.acc // c.ntot END AS p
           |  FROM (
           |    SELECT x.scen, x.s, ns.ntot,
           |           sum(CASE WHEN tr.t = 'CONV' THEN tr.n * 1000000000
           |                    WHEN tr.t = 'NULL' THEN 0
           |                    ELSE tr.n * coalesce(rp.p, 0) END) AS acc
           |    FROM frame x
           |    LEFT JOIN ns ON ns.f = x.s
           |    LEFT JOIN tr ON tr.f = x.s
           |    LEFT JOIN r${k - 1} rp ON rp.scen = x.scen AND rp.s = tr.t
           |    GROUP BY x.scen, x.s, ns.ntot) c)""".stripMargin
      }.mkString
      val tail =
        """,
          |pf AS (SELECT p::BIGINT AS p_full_u FROM r20 WHERE scen = 'full' AND s = 'START'),
          |pr AS (SELECT scen AS channel, p::BIGINT AS p_removed_u
          |       FROM r20 WHERE scen <> 'full' AND s = 'START'),
          |tot AS (SELECT sum(pf.p_full_u - pr.p_removed_u)::BIGINT AS dt
          |        FROM pr, pf)
          |SELECT channel, p_removed_u, pf.p_full_u,
          |       round((pf.p_full_u - p_removed_u)::DOUBLE
          |             / pf.p_full_u::DOUBLE, 6) AS removal_effect,
          |       (CASE WHEN dt = 0 THEN 0
          |            ELSE (pf.p_full_u - p_removed_u) * 1000000 // dt
          |       END)::BIGINT AS share_ppm
          |FROM pr, pf, tot
          |ORDER BY channel""".stripMargin
      base + iters + tail
    },
    // same 2x2 cell moments off one pass; estimate/SE/z are fixed
    // four-term chains over the pivoted single row
    "q331_diff_in_diff" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM events WHERE event_type = 'purchase'),
        |span AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM ev),
        |cells AS (
        |  SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treated,
        |         CASE WHEN day >= mid THEN 1 ELSE 0 END AS post, c
        |  FROM ev, span),
        |one AS (
        |  SELECT
        |    sum(CASE WHEN treated = 0 AND post = 0 THEN 1 ELSE 0 END)::BIGINT AS n00,
        |    sum(CASE WHEN treated = 0 AND post = 0 THEN c ELSE 0 END)::BIGINT AS s00,
        |    sum(CASE WHEN treated = 0 AND post = 0 THEN c * c ELSE 0 END)::BIGINT AS q00,
        |    sum(CASE WHEN treated = 0 AND post = 1 THEN 1 ELSE 0 END)::BIGINT AS n01,
        |    sum(CASE WHEN treated = 0 AND post = 1 THEN c ELSE 0 END)::BIGINT AS s01,
        |    sum(CASE WHEN treated = 0 AND post = 1 THEN c * c ELSE 0 END)::BIGINT AS q01,
        |    sum(CASE WHEN treated = 1 AND post = 0 THEN 1 ELSE 0 END)::BIGINT AS n10,
        |    sum(CASE WHEN treated = 1 AND post = 0 THEN c ELSE 0 END)::BIGINT AS s10,
        |    sum(CASE WHEN treated = 1 AND post = 0 THEN c * c ELSE 0 END)::BIGINT AS q10,
        |    sum(CASE WHEN treated = 1 AND post = 1 THEN 1 ELSE 0 END)::BIGINT AS n11,
        |    sum(CASE WHEN treated = 1 AND post = 1 THEN c ELSE 0 END)::BIGINT AS s11,
        |    sum(CASE WHEN treated = 1 AND post = 1 THEN c * c ELSE 0 END)::BIGINT AS q11
        |  FROM cells)
        |SELECT n00, n01, n10, n11,
        |       round(s00::DOUBLE / n00::DOUBLE, 6) AS y00,
        |       round(s01::DOUBLE / n01::DOUBLE, 6) AS y01,
        |       round(s10::DOUBLE / n10::DOUBLE, 6) AS y10,
        |       round(s11::DOUBLE / n11::DOUBLE, 6) AS y11,
        |       round((s11::DOUBLE / n11::DOUBLE - s10::DOUBLE / n10::DOUBLE)
        |             - (s01::DOUBLE / n01::DOUBLE - s00::DOUBLE / n00::DOUBLE), 6)
        |         AS did_cents,
        |       round(sqrt(
        |         ((q11::DOUBLE - s11::DOUBLE * s11::DOUBLE / n11::DOUBLE) / (n11::DOUBLE - 1.0)) / n11
        |         + ((q10::DOUBLE - s10::DOUBLE * s10::DOUBLE / n10::DOUBLE) / (n10::DOUBLE - 1.0)) / n10
        |         + ((q01::DOUBLE - s01::DOUBLE * s01::DOUBLE / n01::DOUBLE) / (n01::DOUBLE - 1.0)) / n01
        |         + ((q00::DOUBLE - s00::DOUBLE * s00::DOUBLE / n00::DOUBLE) / (n00::DOUBLE - 1.0)) / n00), 6)
        |         AS se_cents,
        |       round(((s11::DOUBLE / n11::DOUBLE - s10::DOUBLE / n10::DOUBLE)
        |              - (s01::DOUBLE / n01::DOUBLE - s00::DOUBLE / n00::DOUBLE))
        |             / (sqrt(
        |         ((q11::DOUBLE - s11::DOUBLE * s11::DOUBLE / n11::DOUBLE) / (n11::DOUBLE - 1.0)) / n11
        |         + ((q10::DOUBLE - s10::DOUBLE * s10::DOUBLE / n10::DOUBLE) / (n10::DOUBLE - 1.0)) / n10
        |         + ((q01::DOUBLE - s01::DOUBLE * s01::DOUBLE / n01::DOUBLE) / (n01::DOUBLE - 1.0)) / n01
        |         + ((q00::DOUBLE - s00::DOUBLE * s00::DOUBLE / n00::DOUBLE) / (n00::DOUBLE - 1.0)) / n00)), 6)
        |         AS z
        |FROM one""".stripMargin,
    // same first-seen cohorts, same (cohort, age) census cumulative,
    // same deci-milli-cent integer LTV
    "q327_cohort_ltv" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day, event_type,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |fs AS (SELECT user_id, min(day) AS cohort FROM ev GROUP BY user_id),
        |sz AS (SELECT cohort, count(*)::BIGINT AS cohort_users FROM fs GROUP BY cohort),
        |census AS (
        |  SELECT fs.cohort, ev.day - fs.cohort AS age,
        |         sum(ev.cents)::BIGINT AS rev_cents,
        |         count(*)::BIGINT AS n_purchases
        |  FROM ev JOIN fs USING (user_id)
        |  WHERE ev.event_type = 'purchase'
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT *, (sum(rev_cents) OVER (PARTITION BY cohort ORDER BY age
        |             ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_cents
        |  FROM census)
        |SELECT cohort, age, cohort_users, n_purchases, rev_cents, cum_cents,
        |       cum_cents * 10000 // cohort_users AS ltv_dmc
        |FROM cum JOIN sz USING (cohort)
        |ORDER BY cohort, age""".stripMargin,
    // same user masks, same 16-subset lattice and factorial weights —
    // every v(S) and phi*24 an exact integer in both engines
    "q322_shapley_attribution" ->
      """WITH users AS (
        |  SELECT user_id,
        |         coalesce(max(CASE WHEN event_type = 'click' THEN 1 END), 0)
        |         + coalesce(max(CASE WHEN event_type = 'error' THEN 1 END), 0) * 2
        |         + coalesce(max(CASE WHEN event_type = 'signup' THEN 1 END), 0) * 4
        |         + coalesce(max(CASE WHEN event_type = 'view' THEN 1 END), 0) * 8 AS mask,
        |         coalesce(max(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS conv
        |  FROM events GROUP BY user_id),
        |mc AS (SELECT mask, sum(conv)::BIGINT AS mconv FROM users GROUP BY mask),
        |subsets AS (SELECT unnest(range(0, 16))::BIGINT AS s),
        |vs AS (
        |  SELECT s, coalesce(sum(mconv), 0)::BIGINT AS v
        |  FROM subsets LEFT JOIN mc ON (mask & (15 - s)) = 0
        |  GROUP BY s),
        |ch AS (SELECT * FROM (VALUES ('click', 1::BIGINT), ('error', 2::BIGINT),
        |                             ('signup', 4::BIGINT), ('view', 8::BIGINT))
        |                    AS t(channel, bit)),
        |lat AS (
        |  SELECT ch.channel, ch.bit, w.s, w.v,
        |         (w.s // 1) % 2 + (w.s // 2) % 2
        |         + (w.s // 4) % 2 + (w.s // 8) % 2 AS cnt
        |  FROM ch JOIN vs w ON (w.s & ch.bit) = 0),
        |lat2 AS (
        |  SELECT channel,
        |         CASE cnt WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END AS w,
        |         lat.v AS v, v2.v AS v_with
        |  FROM lat JOIN vs v2 ON v2.s = lat.s + lat.bit),
        |phi AS (SELECT channel, sum(w * (v_with - v))::BIGINT AS phi_x24
        |        FROM lat2 GROUP BY channel),
        |eff AS (SELECT sum(CASE WHEN s = 15 THEN v ELSE 0 END)::BIGINT AS v_full,
        |               sum(CASE WHEN s = 0 THEN v ELSE 0 END)::BIGINT AS v_empty
        |        FROM vs),
        |tot AS (SELECT sum(phi_x24)::BIGINT AS phi_total FROM phi)
        |SELECT channel, phi_x24, round(phi_x24::DOUBLE / 24.0, 6) AS phi,
        |       CASE WHEN phi_total = 0 THEN 0
        |            ELSE phi_x24 * 1000000 // phi_total END AS share_ppm,
        |       v_full, v_empty
        |FROM phi, eff, tot
        |ORDER BY channel""".stripMargin,
    // same cell census, same census-side micro-nat snaps, same exact
    // integer MI/entropy sums
    "q323_mutual_info" ->
      """WITH cells AS (
        |  SELECT event_type AS x,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) // 5000 AS y,
        |         count(*)::BIGINT AS nxy
        |  FROM events GROUP BY 1, 2),
        |mx AS (SELECT x, sum(nxy)::BIGINT AS nx FROM cells GROUP BY x),
        |my AS (SELECT y, sum(nxy)::BIGINT AS ny FROM cells GROUP BY y),
        |nn AS (SELECT sum(nxy)::BIGINT AS n FROM cells),
        |mi AS (
        |  SELECT sum(nxy * (CAST(floor(ln(nxy::DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
        |                    + CAST(floor(ln(n::DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
        |                    - CAST(floor(ln(nx::DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
        |                    - CAST(floor(ln(ny::DOUBLE) * 1000000.0 + 0.5) AS BIGINT)))
        |           ::BIGINT AS mi_u
        |  FROM cells JOIN mx USING (x) JOIN my USING (y), nn),
        |hx AS (
        |  SELECT sum(nx * (CAST(floor(ln(n::DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
        |                   - CAST(floor(ln(nx::DOUBLE) * 1000000.0 + 0.5) AS BIGINT)))
        |           ::BIGINT AS hx_u
        |  FROM mx, nn),
        |hy AS (
        |  SELECT sum(ny * (CAST(floor(ln(n::DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
        |                   - CAST(floor(ln(ny::DOUBLE) * 1000000.0 + 0.5) AS BIGINT)))
        |           ::BIGINT AS hy_u
        |  FROM my, nn)
        |SELECT n, mi_u, hx_u, hy_u,
        |       round(mi_u::DOUBLE / 1e6 / n::DOUBLE, 6) AS mi_nats,
        |       round(hx_u::DOUBLE / 1e6 / n::DOUBLE, 6) AS h_x,
        |       round(hy_u::DOUBLE / 1e6 / n::DOUBLE, 6) AS h_y,
        |       round(mi_u::DOUBLE / sqrt(hx_u::DOUBLE * hy_u::DOUBLE), 6) AS nmi
        |FROM nn, mi, hx, hy""".stripMargin,
    // same cents census, same doubled midranks off the cumulative,
    // same left-to-right five-term H chain and tie correction
    "q316_kruskal_wallis" ->
      """WITH s AS (
        |  SELECT c_mktsegment AS seg,
        |         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |cell AS (SELECT seg, v, count(*)::BIGINT AS ct FROM s GROUP BY 1, 2),
        |vc AS (
        |  SELECT v, sum(ct)::BIGINT AS cnt,
        |         sum(sum(ct)) OVER (ORDER BY v)::BIGINT AS cum
        |  FROM cell GROUP BY v),
        |vc2 AS (SELECT v, cnt, 2 * (cum - cnt) + cnt + 1 AS m2 FROM vc),
        |one AS (
        |  SELECT
        |    sum(CASE WHEN seg = 'AUTOMOBILE' THEN ct ELSE 0 END)::BIGINT AS n_au,
        |    sum(CASE WHEN seg = 'AUTOMOBILE' THEN ct * m2 ELSE 0 END)::BIGINT AS r2_au,
        |    sum(CASE WHEN seg = 'BUILDING' THEN ct ELSE 0 END)::BIGINT AS n_bu,
        |    sum(CASE WHEN seg = 'BUILDING' THEN ct * m2 ELSE 0 END)::BIGINT AS r2_bu,
        |    sum(CASE WHEN seg = 'FURNITURE' THEN ct ELSE 0 END)::BIGINT AS n_fu,
        |    sum(CASE WHEN seg = 'FURNITURE' THEN ct * m2 ELSE 0 END)::BIGINT AS r2_fu,
        |    sum(CASE WHEN seg = 'HOUSEHOLD' THEN ct ELSE 0 END)::BIGINT AS n_ho,
        |    sum(CASE WHEN seg = 'HOUSEHOLD' THEN ct * m2 ELSE 0 END)::BIGINT AS r2_ho,
        |    sum(CASE WHEN seg = 'MACHINERY' THEN ct ELSE 0 END)::BIGINT AS n_ma,
        |    sum(CASE WHEN seg = 'MACHINERY' THEN ct * m2 ELSE 0 END)::BIGINT AS r2_ma,
        |    sum(ct)::BIGINT AS n
        |  FROM cell JOIN vc2 USING (v)),
        |ties AS (SELECT sum(cnt * cnt * cnt - cnt)::BIGINT AS tie3 FROM vc),
        |calc AS (
        |  SELECT n, 5::BIGINT AS k, tie3, n::DOUBLE AS nn,
        |         (r2_au::DOUBLE * r2_au::DOUBLE / n_au::DOUBLE
        |          + r2_bu::DOUBLE * r2_bu::DOUBLE / n_bu::DOUBLE
        |          + r2_fu::DOUBLE * r2_fu::DOUBLE / n_fu::DOUBLE
        |          + r2_ho::DOUBLE * r2_ho::DOUBLE / n_ho::DOUBLE
        |          + r2_ma::DOUBLE * r2_ma::DOUBLE / n_ma::DOUBLE) AS sterm
        |  FROM one, ties)
        |SELECT n, k, tie3,
        |       round(3.0 / (nn * (nn + 1.0)) * sterm - 3.0 * (nn + 1.0), 6) AS h,
        |       round(1.0 - tie3::DOUBLE / (nn * nn * nn - nn), 6) AS tie_c,
        |       round((3.0 / (nn * (nn + 1.0)) * sterm - 3.0 * (nn + 1.0))
        |             / (1.0 - tie3::DOUBLE / (nn * nn * nn - nn)), 6) AS h_adj,
        |       4::BIGINT AS df,
        |       CASE WHEN (3.0 / (nn * (nn + 1.0)) * sterm - 3.0 * (nn + 1.0))
        |                 / (1.0 - tie3::DOUBLE / (nn * nn * nn - nn)) > 9.487729
        |            THEN 'reject' ELSE 'retain' END AS h0
        |FROM calc""".stripMargin,
    // same daily BIGINT turnover series, same day-pair sign census,
    // same tie-corrected variance and continuity-corrected z
    "q318_mann_kendall" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))::BIGINT AS v
        |  FROM events GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a.event_type AS event_type,
        |         sum(CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1
        |                  ELSE 0 END)::BIGINT AS s_stat
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day
        |  GROUP BY 1),
        |ties AS (
        |  SELECT event_type, sum(t)::BIGINT AS n_days,
        |         sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tie_term
        |  FROM (SELECT event_type, v, count(*)::BIGINT AS t FROM daily GROUP BY 1, 2)
        |  GROUP BY 1),
        |calc AS (
        |  SELECT p.event_type AS event_type, n_days, s_stat,
        |         n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS var18
        |  FROM pairs p JOIN ties USING (event_type)),
        |zed AS (
        |  SELECT event_type, n_days, s_stat, var18,
        |         round(CASE WHEN s_stat > 0 THEN (s_stat::DOUBLE - 1.0)
        |                    WHEN s_stat < 0 THEN (s_stat::DOUBLE + 1.0)
        |                    ELSE 0.0 END / sqrt(var18::DOUBLE / 18.0), 6) AS z
        |  FROM calc)
        |SELECT event_type, n_days, s_stat, var18, z,
        |       CASE WHEN z > 1.959964 THEN 'increasing'
        |            WHEN z < -1.959964 THEN 'decreasing'
        |            ELSE 'none' END AS trend
        |FROM zed
        |ORDER BY event_type""".stripMargin,
    // same one-pass fact agg, same broadcast dims, same ppm integer
    // shares at both hierarchy levels
    "q311_share_of_parent" ->
      """WITH pn AS (
        |  SELECT r_name, n_name, sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))::BIGINT AS nc
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name),
        |pr AS (SELECT r_name, sum(nc)::BIGINT AS rc FROM pn GROUP BY r_name),
        |w AS (SELECT sum(rc)::BIGINT AS wc FROM pr)
        |SELECT pn.r_name, n_name, round(nc / 100.0, 2) + 0.0 AS revenue,
        |       (nc * 1000000) // rc AS share_of_region_ppm,
        |       (rc * 1000000) // wc AS region_share_ppm
        |FROM pn JOIN pr USING (r_name) CROSS JOIN w
        |ORDER BY pn.r_name, n_name""".stripMargin,
    // same per-type max, same corpus-frontier reference, same integer
    // staleness and SLA flag
    "q312_source_freshness" ->
      """WITH pt AS (
        |  SELECT event_type, max(epoch_us(ts))::BIGINT AS last_us,
        |         count(*)::BIGINT AS n_events
        |  FROM events GROUP BY event_type),
        |f AS (SELECT max(last_us)::BIGINT AS f FROM pt)
        |SELECT event_type, n_events, make_timestamp(last_us) AS last_seen,
        |       (f - last_us) // 1000000 AS staleness_sec,
        |       (CASE WHEN f - last_us > 3600000000::BIGINT THEN 1 ELSE 0 END)::BIGINT AS sla_breach
        |FROM pt CROSS JOIN f
        |ORDER BY event_type""".stripMargin,
    // same generated spine, same 0=Sunday normalization, same ISO
    // weeks, same per-month census
    "q310_date_spine" ->
      """WITH span AS (
        |  SELECT min(o_orderdate)::DATE AS d0, max(o_orderdate)::DATE AS d1
        |  FROM orders),
        |spine AS (
        |  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS d
        |  FROM span),
        |attrs AS (
        |  SELECT d, year(d)::BIGINT AS y, month(d)::BIGINT AS m,
        |         dayofweek(d)::BIGINT AS dow,
        |         weekofyear(d)::BIGINT AS iso_week,
        |         day(last_day(d))::BIGINT AS month_len
        |  FROM spine)
        |SELECT y, m, count(*)::BIGINT AS n_days,
        |       sum(CASE WHEN dow = 0 OR dow = 6 THEN 1 ELSE 0 END)::BIGINT AS n_weekend,
        |       count(DISTINCT iso_week)::BIGINT AS n_iso_weeks,
        |       max(month_len)::BIGINT AS month_len
        |FROM attrs
        |GROUP BY y, m
        |ORDER BY y, m""".stripMargin,
    // same integer walk 2S−t, same k=15 boundary, same first-crossing
    // struct-min, same shared ln(11/9) literal in the descale
    "q309_sprt" ->
      """WITH ev AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS us,
        |         CASE WHEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) >= 25000
        |              THEN 1 ELSE 0 END AS succ
        |  FROM events WHERE event_type IN ('view', 'purchase', 'click')),
        |walk AS (
        |  SELECT event_type,
        |         count(*) OVER w AS t,
        |         2 * sum(succ) OVER w - count(*) OVER w AS wk
        |  FROM ev
        |  WINDOW w AS (PARTITION BY event_type ORDER BY us, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |crossings AS (
        |  SELECT event_type,
        |         (min(struct_pack(t := t, wk := wk))).t AS decided_at,
        |         (min(struct_pack(t := t, wk := wk))).wk AS wk
        |  FROM walk WHERE abs(wk) >= 15 GROUP BY event_type),
        |finals AS (
        |  SELECT event_type,
        |         (max(struct_pack(t := t, wk := wk))).t AS n_obs,
        |         (max(struct_pack(t := t, wk := wk))).wk AS final_wk
        |  FROM walk GROUP BY event_type)
        |SELECT f.event_type, n_obs::BIGINT AS n_obs,
        |       coalesce(decided_at, 0)::BIGINT AS decided_at,
        |       CASE WHEN wk >= 15 THEN 'accept_h1'
        |            WHEN wk <= -15 THEN 'accept_h0'
        |            ELSE 'continue' END AS decision,
        |       floor(coalesce(wk, final_wk)::DOUBLE * 0.20067069546215124
        |             * 1000000.0 + 0.5) / 1000000.0 AS llr_at_stop
        |FROM finals f LEFT JOIN crossings c USING (event_type)
        |ORDER BY f.event_type""".stripMargin,
    // same pivoted class census, same BIGINT TVD numerator, same
    // integer threshold compare, same snapped max
    "q305_t_closeness" ->
      """WITH cls AS (
        |  SELECT c_nationkey, CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
        |         count(*)::BIGINT AS n,
        |         sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END)::BIGINT AS n1,
        |         sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END)::BIGINT AS n2,
        |         sum(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END)::BIGINT AS n3,
        |         sum(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END)::BIGINT AS n4,
        |         sum(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END)::BIGINT AS n5
        |  FROM customer GROUP BY 1, 2),
        |gtot AS (SELECT sum(n)::BIGINT AS nn, sum(n1)::BIGINT AS g1,
        |                sum(n2)::BIGINT AS g2, sum(n3)::BIGINT AS g3,
        |                sum(n4)::BIGINT AS g4, sum(n5)::BIGINT AS g5 FROM cls),
        |wt AS (
        |  SELECT cls.*, nn,
        |         abs(n1 * nn - g1 * n) + abs(n2 * nn - g2 * n) + abs(n3 * nn - g3 * n)
        |           + abs(n4 * nn - g4 * n) + abs(n5 * nn - g5 * n) AS numer
        |  FROM cls CROSS JOIN gtot),
        |tot AS (
        |  SELECT count(*)::BIGINT AS n_classes,
        |         floor(max(numer::DOUBLE / (2.0 * n::DOUBLE * nn::DOUBLE))
        |               * 1000000.0 + 0.5) / 1000000.0 AS max_tvd
        |  FROM wt)
        |SELECT t10::DOUBLE / 10.0 AS t_threshold, n_classes,
        |       sum(CASE WHEN numer * 10 > 2 * t10 * n * nn THEN 1 ELSE 0 END)::BIGINT
        |         AS n_failing_classes,
        |       sum(CASE WHEN numer * 10 > 2 * t10 * n * nn THEN n ELSE 0 END)::BIGINT
        |         AS n_failing_rows,
        |       max_tvd
        |FROM wt CROSS JOIN (SELECT unnest([1, 2, 3]) AS t10) t CROSS JOIN tot
        |GROUP BY t10, n_classes, max_tvd
        |ORDER BY t_threshold""".stripMargin,
    // same arrival-order running max per ingest partition, same
    // census-rank percentile picks, same ceil-minutes delay
    "q308_watermark_delay" ->
      """WITH ev AS (
        |  SELECT ((user_id % 8) + 8) % 8 AS part, event_id, epoch_us(ts) AS us
        |  FROM events),
        |lat AS (
        |  SELECT part,
        |         max(us) OVER (PARTITION BY part ORDER BY event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - us AS lat
        |  FROM ev),
        |census AS (
        |  SELECT part, lat, count(*)::BIGINT AS cnt FROM lat GROUP BY part, lat),
        |cc AS (
        |  SELECT census.*, sum(cnt) OVER (PARTITION BY part ORDER BY lat
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM census),
        |tot AS (SELECT part, sum(cnt)::BIGINT AS n, max(lat)::BIGINT AS max_lat
        |        FROM census GROUP BY part),
        |pick AS (
        |  SELECT cc.part, n, max_lat,
        |         min(CASE WHEN cum * 2 >= n THEN lat END)::BIGINT AS p50,
        |         min(CASE WHEN cum * 20 >= n * 19 THEN lat END)::BIGINT AS p95,
        |         min(CASE WHEN cum * 100 >= n * 99 THEN lat END)::BIGINT AS p99
        |  FROM cc JOIN tot USING (part) GROUP BY cc.part, n, max_lat)
        |SELECT part, n, p50, p95, p99, max_lat,
        |       (p99 + 59999999) // 60000000 AS delay_minutes
        |FROM pick
        |ORDER BY part""".stripMargin,
    // same 60-bit ring points, same successor/wrap min, same mod-N
    // contrast, same ppm division
    "q301_consistent_hash" ->
      """WITH users AS (
        |  SELECT DISTINCT user_id,
        |         ('0x' || substr(md5('u:' || user_id::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM events),
        |ring8 AS (
        |  SELECT s.shard,
        |         ('0x' || substr(md5('s:' || s.shard::VARCHAR || '#' || v.vn::VARCHAR), 1, 15))::BIGINT AS p
        |  FROM (SELECT unnest(range(8)) AS shard) s
        |  CROSS JOIN (SELECT unnest(range(32)) AS vn) v),
        |ring9 AS (
        |  SELECT s.shard,
        |         ('0x' || substr(md5('s:' || s.shard::VARCHAR || '#' || v.vn::VARCHAR), 1, 15))::BIGINT AS p
        |  FROM (SELECT unnest(range(9)) AS shard) s
        |  CROSS JOIN (SELECT unnest(range(32)) AS vn) v),
        |a8 AS (
        |  SELECT user_id,
        |         coalesce(min(CASE WHEN p >= h THEN struct_pack(p := p, shard := shard) END),
        |                  (SELECT min(struct_pack(p := p, shard := shard)) FROM ring8)).shard AS s8
        |  FROM users CROSS JOIN ring8 GROUP BY user_id, h),
        |a9 AS (
        |  SELECT user_id,
        |         coalesce(min(CASE WHEN p >= h THEN struct_pack(p := p, shard := shard) END),
        |                  (SELECT min(struct_pack(p := p, shard := shard)) FROM ring9)).shard AS s9
        |  FROM users CROSS JOIN ring9 GROUP BY user_id, h),
        |ringrow AS (
        |  SELECT 'ring' AS strategy, count(*)::BIGINT AS n_users,
        |         sum(CASE WHEN s8 <> s9 THEN 1 ELSE 0 END)::BIGINT AS moved
        |  FROM a8 JOIN a9 USING (user_id)),
        |modrow AS (
        |  SELECT 'mod' AS strategy, count(*)::BIGINT AS n_users,
        |         sum(CASE WHEN ((h % 8) + 8) % 8 <> ((h % 9) + 9) % 9
        |             THEN 1 ELSE 0 END)::BIGINT AS moved
        |  FROM users)
        |SELECT strategy, n_users, moved, (moved * 1000000) // n_users AS moved_ppm
        |FROM (SELECT * FROM ringrow UNION ALL SELECT * FROM modrow)
        |ORDER BY strategy""".stripMargin,
    // the page stated the OFFSET way — equality proves the keyset
    // range predicate lands on the identical page
    "q302_keyset_pagination" ->
      """SELECT o_orderkey,
        |       round(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) / 100.0, 2)
        |         + 0.0 AS price
        |FROM orders
        |ORDER BY CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT), o_orderkey
        |LIMIT 20 OFFSET 40""".stripMargin,
    // same (µs, event_id) total order, same 30-min session cuts, same
    // session-scoped trigrams, same (n desc, path) top-10
    "q299_session_paths" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
        |g AS (
        |  SELECT ev.*, CASE WHEN lag(us) OVER w IS NULL
        |                      OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS gap
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (
        |  SELECT g.*, sum(gap) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g),
        |t AS (
        |  SELECT event_type || '>' || lead(event_type, 1) OVER w2
        |           || '>' || lead(event_type, 2) OVER w2 AS path,
        |         lead(event_type, 2) OVER w2 AS t3
        |  FROM s WINDOW w2 AS (PARTITION BY user_id, sid ORDER BY us, event_id))
        |SELECT path, count(*)::BIGINT AS n
        |FROM t WHERE t3 IS NOT NULL
        |GROUP BY path
        |ORDER BY n DESC, path
        |LIMIT 10""".stripMargin,
    // same week census, same BIGINT pairwise slope divides, same
    // row_number median picks, same snapped chain
    "q297_theil_sen" ->
      """WITH weeks AS (
        |  SELECT date_diff('day', DATE '1992-01-01', o_orderdate) // 7 AS w,
        |         count(*)::BIGINT AS yv
        |  FROM orders GROUP BY 1),
        |slopes AS (
        |  SELECT (b.yv - a.yv)::DOUBLE / (b.w - a.w)::DOUBLE AS slope
        |  FROM weeks a JOIN weeks b ON a.w < b.w),
        |m AS (SELECT count(*)::BIGINT AS m FROM slopes),
        |rs AS (
        |  SELECT slope, row_number() OVER (ORDER BY slope) AS rk, m
        |  FROM slopes CROSS JOIN m),
        |sm AS (
        |  SELECT sum(slope) / count(*) AS slope_med, max(m)::BIGINT AS m_pairs
        |  FROM rs WHERE rk = (m + 1) // 2 OR rk = (m + 2) // 2),
        |resid AS (
        |  SELECT yv::DOUBLE - slope_med * w::DOUBLE AS r, slope_med, m_pairs
        |  FROM weeks CROSS JOIN sm),
        |nw AS (SELECT count(*)::BIGINT AS nw FROM weeks),
        |rr AS (
        |  SELECT r, slope_med, m_pairs, nw,
        |         row_number() OVER (ORDER BY r) AS rk
        |  FROM resid CROSS JOIN nw)
        |SELECT max(m_pairs)::BIGINT AS m_pairs, max(nw)::BIGINT AS n_weeks,
        |       floor(max(slope_med) * 1000000.0 + 0.5) / 1000000.0 AS slope,
        |       floor(sum(r) / count(*) * 1000000.0 + 0.5) / 1000000.0 AS intercept
        |FROM rr WHERE rk = (nw + 1) // 2 OR rk = (nw + 2) // 2""".stripMargin,
    // same user metrics, same census-quintile rule (recency ranked
    // DESC), same cell census with exact cents
    "q292_rfm_segments" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |u AS (
        |  SELECT user_id,
        |         (SELECT max(day) FROM ev) - max(day) AS rec,
        |         count(*)::BIGINT AS freq, sum(cents)::BIGINT AS mon
        |  FROM ev GROUP BY user_id),
        |nu AS (SELECT count(*)::BIGINT AS nu FROM u),
        |rs AS (
        |  SELECT rec, ((cum - cnt) * 5) // nu + 1 AS r_score FROM (
        |    SELECT rec, cnt, sum(cnt) OVER (ORDER BY rec DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |    FROM (SELECT rec, count(*)::BIGINT AS cnt FROM u GROUP BY rec))
        |  CROSS JOIN nu),
        |fs AS (
        |  SELECT freq, ((cum - cnt) * 5) // nu + 1 AS f_score FROM (
        |    SELECT freq, cnt, sum(cnt) OVER (ORDER BY freq ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |    FROM (SELECT freq, count(*)::BIGINT AS cnt FROM u GROUP BY freq))
        |  CROSS JOIN nu),
        |ms AS (
        |  SELECT mon, ((cum - cnt) * 5) // nu + 1 AS m_score FROM (
        |    SELECT mon, cnt, sum(cnt) OVER (ORDER BY mon ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |    FROM (SELECT mon, count(*)::BIGINT AS cnt FROM u GROUP BY mon))
        |  CROSS JOIN nu)
        |SELECT r_score::BIGINT AS r_score, f_score::BIGINT AS f_score,
        |       m_score::BIGINT AS m_score,
        |       count(*)::BIGINT AS n_users,
        |       round(sum(mon) / 100.0, 2) + 0.0 AS cell_monetary
        |FROM u JOIN rs USING (rec) JOIN fs USING (freq) JOIN ms USING (mon)
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,
    // same (user, type) min/max census, same strict-before rule, same
    // ppm integer division
    "q293_seq_pattern_support" ->
      """WITH ut AS (
        |  SELECT user_id, event_type,
        |         min(epoch_us(ts))::BIGINT AS mn, max(epoch_us(ts))::BIGINT AS mx
        |  FROM events GROUP BY user_id, event_type),
        |nu AS (SELECT count(DISTINCT user_id)::BIGINT AS nu FROM ut)
        |SELECT a.event_type AS a, b.event_type AS b,
        |       count(*)::BIGINT AS support_users,
        |       (count(*) * 1000000) // nu AS support_ppm
        |FROM ut a JOIN ut b ON a.user_id = b.user_id
        |CROSS JOIN nu
        |WHERE a.mn < b.mx
        |GROUP BY a.event_type, b.event_type, nu
        |ORDER BY a, b""".stripMargin,
    // same day census, same N-scaled residuals for BOTH series, same
    // exact-distance pairing, same snapped normalized ratio
    "q294_ccf" ->
      """WITH days AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS x,
        |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS y
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY 1),
        |tot AS (SELECT count(*)::BIGINT AS nd, sum(x)::BIGINT AS sx,
        |               sum(y)::BIGINT AS sy FROM days),
        |c AS (SELECT day, nd * x - sx AS cx, nd * y - sy AS cy
        |      FROM days CROSS JOIN tot),
        |den AS (SELECT sum(cx * cx)::BIGINT AS dx, sum(cy * cy)::BIGINT AS dy FROM c),
        |lagged AS (
        |  SELECT l.lag, c.day + l.lag AS day, c.cy AS cy0
        |  FROM (SELECT unnest(range(-7, 8)) AS lag) l CROSS JOIN c)
        |SELECT lag::BIGINT AS lag, count(*)::BIGINT AS n_pairs,
        |       floor(sum(c.cx * lagged.cy0)::DOUBLE /
        |             sqrt((SELECT dx FROM den)::DOUBLE * (SELECT dy FROM den)::DOUBLE) *
        |             1000000.0 + 0.5) / 1000000.0 AS ccf
        |FROM c JOIN lagged USING (day)
        |GROUP BY lag
        |ORDER BY lag""".stripMargin,
    // same cell census, same ordered-pair BIGINT sums, same integer tie
    // terms, same double-cast variance product, same snapped ratio
    "q288_kendall_tau" ->
      """WITH ev AS (
        |  SELECT hour(ts)::BIGINT AS x,
        |         CAST(floor(value / 50.0) AS BIGINT) AS y
        |  FROM events),
        |census AS (SELECT x, y, count(*)::BIGINT AS nc FROM ev GROUP BY x, y),
        |cd AS (
        |  SELECT sum(CASE WHEN a.y < b.y THEN a.nc * b.nc ELSE 0 END)::BIGINT AS c,
        |         sum(CASE WHEN a.y > b.y THEN a.nc * b.nc ELSE 0 END)::BIGINT AS d
        |  FROM census a CROSS JOIN census b WHERE a.x < b.x),
        |n0 AS (SELECT ((sum(nc) * (sum(nc) - 1)) // 2)::BIGINT AS n0 FROM census),
        |n1 AS (SELECT sum((t * (t - 1)) // 2)::BIGINT AS n1
        |       FROM (SELECT sum(nc)::BIGINT AS t FROM census GROUP BY x)),
        |n2 AS (SELECT sum((t * (t - 1)) // 2)::BIGINT AS n2
        |       FROM (SELECT sum(nc)::BIGINT AS t FROM census GROUP BY y))
        |SELECT c, d, n0, n1, n2,
        |       floor((c - d)::DOUBLE /
        |             sqrt((n0 - n1)::DOUBLE * (n0 - n2)::DOUBLE) *
        |             1000000.0 + 0.5) / 1000000.0 AS tau_b
        |FROM cd CROSS JOIN n0 CROSS JOIN n1 CROSS JOIN n2""".stripMargin,
    // same per-cohort census/sup/λ/series chain, p snapped to the 10⁻⁸
    // grid BEFORE ranking, same (p, g) tie-break, same step-up bound
    "q285_bh_fdr" ->
      """WITH ev AS (
        |  SELECT user_id % 8 AS g, event_type,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |census AS (
        |  SELECT g, vc,
        |         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS c1,
        |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS c2
        |  FROM ev GROUP BY g, vc),
        |cum AS (
        |  SELECT census.*,
        |         sum(c1) OVER w AS cum1, sum(c2) OVER w AS cum2
        |  FROM census
        |  WINDOW w AS (PARTITION BY g ORDER BY vc
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT g, sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2
        |        FROM census GROUP BY g),
        |dd AS (
        |  SELECT cum.g, n1, n2,
        |         max(abs(cum1 * n2 - cum2 * n1))::DOUBLE / (n1 * n2)::DOUBLE AS d
        |  FROM cum JOIN tot USING (g) GROUP BY cum.g, n1, n2),
        |lam AS (
        |  SELECT dd.*,
        |         (sqrt((n1 * n2)::DOUBLE / (n1 + n2)::DOUBLE) + 0.12 +
        |          0.11 / sqrt((n1 * n2)::DOUBLE / (n1 + n2)::DOUBLE)) * d AS lambda
        |  FROM dd),
        |p AS (
        |  SELECT lam.*,
        |         least(1.0, floor((2.0 * (exp(-2.0 * lambda * lambda)
        |                     - exp(-8.0 * lambda * lambda)
        |                     + exp(-18.0 * lambda * lambda)
        |                     - exp(-32.0 * lambda * lambda))) * 100000000.0 + 0.5)
        |           / 100000000.0) AS p_value
        |  FROM lam),
        |ranked AS (
        |  SELECT p.*, (SELECT count(*) FROM p) AS m,
        |         row_number() OVER (ORDER BY p_value, g) AS bh_rank
        |  FROM p),
        |k AS (
        |  SELECT max(CASE WHEN p_value <= bh_rank::DOUBLE * 0.05 / m::DOUBLE
        |                  THEN bh_rank ELSE 0 END) AS kstar
        |  FROM ranked)
        |SELECT g, n1, n2, d, p_value, bh_rank::BIGINT AS bh_rank,
        |       (CASE WHEN bh_rank <= kstar THEN 1 ELSE 0 END)::BIGINT AS reject_fdr05
        |FROM ranked CROSS JOIN k
        |ORDER BY g""".stripMargin,
    // same doubled-midrank censuses, same BIGINT moments, same IEEE
    // Pearson chain snapped to the 10⁻⁶ grid
    "q283_spearman" ->
      """WITH items AS (
        |  SELECT l_orderkey, count(*)::BIGINT AS y FROM lineitem GROUP BY l_orderkey),
        |pairs AS (
        |  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS x, y
        |  FROM orders JOIN items ON o_orderkey = l_orderkey),
        |cx AS (SELECT x, count(*)::BIGINT AS cnt FROM pairs GROUP BY x),
        |rx AS (
        |  SELECT x, 2 * (sum(cnt) OVER (ORDER BY x
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
        |         + cnt + 1 AS rx2 FROM cx),
        |cy AS (SELECT y, count(*)::BIGINT AS cnt FROM pairs GROUP BY y),
        |ry AS (
        |  SELECT y, 2 * (sum(cnt) OVER (ORDER BY y
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
        |         + cnt + 1 AS ry2 FROM cy),
        |r AS (SELECT rx2, ry2 FROM pairs JOIN rx USING (x) JOIN ry USING (y)),
        |m AS (
        |  SELECT count(*)::BIGINT AS n, sum(rx2)::BIGINT AS sx, sum(ry2)::BIGINT AS sy,
        |         sum(rx2 * rx2)::BIGINT AS sxx, sum(ry2 * ry2)::BIGINT AS syy,
        |         sum(rx2 * ry2)::BIGINT AS sxy
        |  FROM r)
        |SELECT n,
        |       floor(((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
        |              (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) *
        |               sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))) *
        |             1000000.0 + 0.5) / 1000000.0 AS rho
        |FROM m""".stripMargin,
    // same day census, same N-scaled BIGINT residuals, same exact-
    // distance pairing, same snapped ratio
    "q284_acf" ->
      """WITH days AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, count(*)::BIGINT AS y
        |  FROM events GROUP BY 1),
        |tot AS (SELECT count(*)::BIGINT AS nd, sum(y)::BIGINT AS s FROM days),
        |c AS (SELECT day, nd * y - s AS cy FROM days CROSS JOIN tot),
        |den AS (SELECT sum(cy * cy)::BIGINT AS den FROM c),
        |lagged AS (
        |  SELECT l.lag, c.day + l.lag AS day, c.cy AS cy0
        |  FROM (SELECT unnest(range(1, 8)) AS lag) l CROSS JOIN c)
        |SELECT lag::BIGINT AS lag, count(*)::BIGINT AS n_pairs,
        |       floor((sum(c.cy * lagged.cy0)::DOUBLE / (SELECT den FROM den)::DOUBLE) *
        |             1000000.0 + 0.5) / 1000000.0 AS acf
        |FROM c JOIN lagged USING (day)
        |GROUP BY lag
        |ORDER BY lag""".stripMargin,
    // same shared census, same BIGINT cross-multiplied sup, same
    // IEEE-sqrt λ chain, same snapped 4-term Kolmogorov series
    "q280_ks_test" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |census AS (
        |  SELECT vc,
        |         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS c1,
        |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS c2
        |  FROM ev GROUP BY vc),
        |cum AS (
        |  SELECT census.*,
        |         sum(c1) OVER w AS cum1, sum(c2) OVER w AS cum2
        |  FROM census
        |  WINDOW w AS (ORDER BY vc
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2 FROM census),
        |dd AS (
        |  SELECT n1, n2,
        |         max(abs(cum1 * n2 - cum2 * n1))::DOUBLE / (n1 * n2)::DOUBLE AS d
        |  FROM cum CROSS JOIN tot GROUP BY n1, n2),
        |lam AS (
        |  SELECT dd.*,
        |         (sqrt((n1 * n2)::DOUBLE / (n1 + n2)::DOUBLE) + 0.12 +
        |          0.11 / sqrt((n1 * n2)::DOUBLE / (n1 + n2)::DOUBLE)) * d AS lambda
        |  FROM dd),
        |p AS (
        |  SELECT lam.*,
        |         floor((2.0 * (exp(-2.0 * lambda * lambda)
        |                     - exp(-8.0 * lambda * lambda)
        |                     + exp(-18.0 * lambda * lambda)
        |                     - exp(-32.0 * lambda * lambda))) * 100000000.0 + 0.5)
        |           / 100000000.0 AS p_value
        |  FROM lam)
        |SELECT n1, n2, d, lambda, p_value,
        |       (CASE WHEN p_value < 0.05 THEN 1 ELSE 0 END)::BIGINT AS reject_05
        |FROM p""".stripMargin,
    // the sequence table stated blindly from range() — same integer
    // arithmetic, same bounds; certifies the DSv2 source end-to-end
    "q279_seq_source_pushdown" ->
      """SELECT id % 97 AS bucket, count(*)::BIGINT AS n,
        |       sum((id * 2654435761) % 2147483648)::BIGINT AS sum_h
        |FROM range(250000, 750000) t(id)
        |GROUP BY 1
        |ORDER BY bucket""".stripMargin,
    // same five BIGINT moments (per-cluster ratio on the 10⁻³ lattice
    // via integer division), same mirrored ANOVA chains
    "q276_design_effect" ->
      """WITH obs AS (
        |  SELECT event_type, user_id,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS yc
        |  FROM events),
        |pc AS (
        |  SELECT event_type, user_id, count(*)::BIGINT AS nu,
        |         sum(yc)::BIGINT AS su, sum(yc * yc)::BIGINT AS squ
        |  FROM obs GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, sum(nu)::BIGINT AS n, count(*)::BIGINT AS k,
        |         sum(su)::BIGINT AS sy, sum(squ)::BIGINT AS syy,
        |         sum(nu * nu)::BIGINT AS snn,
        |         sum((su * su * 1000) // nu)::BIGINT AS st
        |  FROM pc GROUP BY event_type),
        |c AS (
        |  SELECT event_type, n, k,
        |         n::DOUBLE / k::DOUBLE AS mbar,
        |         (st::DOUBLE / 1000.0 - sy::DOUBLE * sy::DOUBLE / n::DOUBLE)
        |           / (k - 1)::DOUBLE AS msb,
        |         (syy::DOUBLE - st::DOUBLE / 1000.0) / (n - k)::DOUBLE AS msw,
        |         (n::DOUBLE - snn::DOUBLE / n::DOUBLE) / (k - 1)::DOUBLE AS n0
        |  FROM m),
        |i AS (
        |  SELECT event_type, n, k,
        |         (msb - msw) / (msb + (n0 - 1.0) * msw) AS icc, mbar
        |  FROM c)
        |SELECT event_type, n, k, icc,
        |       1.0 + (mbar - 1.0) * icc AS deff,
        |       n::DOUBLE / (1.0 + (mbar - 1.0) * icc) AS ess
        |FROM i
        |ORDER BY event_type""".stripMargin,
    // same bin census, same prefix-sum interval means, same Ayer
    // minimax enumeration — one-divide doubles, order-free extrema
    "q273_isotonic_calibration" ->
      """WITH bins AS (
        |  SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) // 500 AS bin,
        |         count(*)::BIGINT AS n,
        |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS p
        |  FROM events GROUP BY 1),
        |cum AS (
        |  SELECT bins.*,
        |         sum(n) OVER w AS cn, sum(p) OVER w AS cp
        |  FROM bins
        |  WINDOW w AS (ORDER BY bin
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |iv AS (
        |  SELECT l.bin AS j, h.bin AS k,
        |         (h.cp - (l.cp - l.p))::DOUBLE /
        |           (h.cn - (l.cn - l.n))::DOUBLE AS avg
        |  FROM cum l JOIN cum h ON l.bin <= h.bin),
        |fit AS (
        |  SELECT i, max(mn) AS p_iso
        |  FROM (
        |    SELECT c.bin AS i, iv.j, min(iv.avg) AS mn
        |    FROM iv JOIN cum c ON iv.j <= c.bin AND c.bin <= iv.k
        |    GROUP BY c.bin, iv.j)
        |  GROUP BY i)
        |SELECT bin, bin * 5.0::DOUBLE AS band_usd, n,
        |       p::DOUBLE / n::DOUBLE AS p_raw, p_iso
        |FROM cum JOIN fit ON bin = i
        |ORDER BY bin""".stripMargin,
    // same dense spine, same n·days lattice, same IEEE sqrt, same
    // prefix-sum-minus-running-extremum identity, same flag compare
    "q271_cusum_changepoint" ->
      """WITH days AS (
        |  SELECT date_diff('day', DATE '1970-01-01', o_orderdate)::BIGINT AS day
        |  FROM orders),
        |counts AS (SELECT day, count(*)::BIGINT AS x FROM days GROUP BY day),
        |lim AS (SELECT min(day) AS lo, max(day) AS hi FROM days),
        |spine AS (SELECT unnest(range(lo, hi + 1)) AS day FROM lim),
        |grid AS (
        |  SELECT s.day, coalesce(c.x, 0)::BIGINT AS x
        |  FROM spine s LEFT JOIN counts c USING (day)),
        |tot AS (
        |  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS s,
        |         sqrt((count(*) * sum(x * x) - sum(x) * sum(x))::DOUBLE) AS sig_n
        |  FROM grid),
        |tot2 AS (
        |  SELECT n, s, CAST(floor(sig_n / 2.0 + 0.5) AS BIGINT) AS k_n,
        |         sig_n * 5.0 AS h_n
        |  FROM tot),
        |p AS (
        |  SELECT grid.*, n, s, k_n, h_n,
        |         sum(x * n - s - k_n) OVER w AS p_up,
        |         sum(x * n - s + k_n) OVER w AS p_dn
        |  FROM grid CROSS JOIN tot2
        |  WINDOW w AS (ORDER BY day
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |c2 AS (
        |  SELECT p.*,
        |         p_up - min(p_up) OVER w AS cusum_up,
        |         max(p_dn) OVER w - p_dn AS cusum_dn
        |  FROM p
        |  WINDOW w AS (ORDER BY day
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT DATE '1970-01-01' + CAST(day AS INT) AS d, x,
        |       cusum_up::DOUBLE / n AS cusum_up,
        |       cusum_dn::DOUBLE / n AS cusum_dn,
        |       h_n / n::DOUBLE AS threshold,
        |       CASE WHEN cusum_up::DOUBLE > h_n OR cusum_dn::DOUBLE > h_n
        |            THEN 1 ELSE 0 END::BIGINT AS flag
        |FROM c2
        |ORDER BY d""".stripMargin,
    // same cents census, same BIGINT 2·midrank identity, same $5 bands
    "q263_auc_roc" ->
      """WITH ev AS (
        |  SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS sc,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM events),
        |census AS (
        |  SELECT sc, sum(pos)::BIGINT AS np,
        |         (count(*) - sum(pos))::BIGINT AS nn
        |  FROM ev GROUP BY sc),
        |ranked AS (
        |  SELECT census.*,
        |         sum(np + nn) OVER (ORDER BY sc
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM census),
        |tot AS (SELECT sum(np)::BIGINT AS p, sum(nn)::BIGINT AS n FROM census),
        |auc AS (
        |  SELECT (sum(np * (2 * (cum - np - nn) + (np + nn) + 1))
        |            - p * (p + 1))::DOUBLE / (2 * p * n)::DOUBLE AS auc
        |  FROM ranked CROSS JOIN tot GROUP BY p, n),
        |bands AS (
        |  SELECT sc // 500 AS band, sum(np)::BIGINT AS bp, sum(nn)::BIGINT AS bn
        |  FROM census GROUP BY 1),
        |roc AS (
        |  SELECT band,
        |         sum(bp) OVER (ORDER BY band DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
        |         sum(bn) OVER (ORDER BY band DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
        |  FROM bands)
        |SELECT band, band * 5.0::DOUBLE AS thr_usd,
        |       cp::DOUBLE / p AS tpr, cn::DOUBLE / n AS fpr, auc
        |FROM roc CROSS JOIN tot CROSS JOIN auc
        |ORDER BY band""".stripMargin,
    // same derived tape, exact integer sums, one divide per statistic
    "q226_tape_microstructure" ->
      """WITH t AS (
        |  SELECT (epoch_us(ts) // 300000000) * 300000000 AS bucket_us,
        |         floor(value * 100.0 + 0.5)::BIGINT AS p,
        |         (event_id % 7 + 1)::BIGINT AS q,
        |         (event_id % 2)::BIGINT AS side
        |  FROM events)
        |SELECT bucket_us, count(*)::BIGINT AS n_trades,
        |       sum(q)::BIGINT AS volume,
        |       round(sum(p * q)::DOUBLE / sum(q)::DOUBLE / 100.0, 6) + 0.0 AS vwap,
        |       round((sum(CASE WHEN side = 0 THEN q ELSE 0 END)
        |              - sum(CASE WHEN side = 1 THEN q ELSE 0 END))::DOUBLE
        |             / (sum(CASE WHEN side = 0 THEN q ELSE 0 END)
        |                + sum(CASE WHEN side = 1 THEN q ELSE 0 END))::DOUBLE, 6)
        |         + 0.0 AS imbalance
        |FROM t GROUP BY bucket_us ORDER BY bucket_us""".stripMargin,
    // same edges, same three synchronous rounds, same weighted-mode
    // (lw desc, label asc) argmax — the whole trajectory, bit-identical
    "q224_label_propagation" -> (oracleLpRounds +
      """
        |SELECT r1.node::BIGINT AS node, r1.label::BIGINT AS l1,
        |       r2.label::BIGINT AS l2, r3.label::BIGINT AS l3
        |FROM r1 JOIN r2 USING (node) JOIN r3 USING (node)
        |ORDER BY node""".stripMargin),
    // same edges/labels, exact BIGINT in/tot/M censuses, same single
    // double divides
    "q338_modularity" -> (oracleLpRounds +
      """,
        |lbl AS (
        |  SELECT 1::BIGINT AS round, node, label FROM r1
        |  UNION ALL SELECT 2::BIGINT, node, label FROM r2
        |  UNION ALL SELECT 3::BIGINT, node, label FROM r3),
        |el AS (
        |  SELECT lu.round, e.u, e.v, e.w, lu.label AS cu, lv.label AS cv
        |  FROM edges e
        |  JOIN lbl lu ON lu.node = e.u
        |  JOIN lbl lv ON lv.node = e.v AND lv.round = lu.round),
        |m AS (SELECT sum(w)::BIGINT AS mm FROM edges),
        |perc AS (
        |  SELECT round, cu AS community,
        |         sum(CASE WHEN cu = cv THEN w ELSE 0 END)::BIGINT AS in_w,
        |         sum(w)::BIGINT AS tot_w,
        |         count(DISTINCT u)::BIGINT AS n_nodes
        |  FROM el GROUP BY round, cu),
        |wm AS (SELECT perc.*, m.mm, in_w * mm - tot_w * tot_w AS q_num
        |       FROM perc, m),
        |qt AS (SELECT round, round(sum(q_num)::DOUBLE
        |                / (max(mm) * max(mm))::DOUBLE, 6) AS q_total
        |       FROM wm GROUP BY round)
        |SELECT wm.round, community::BIGINT AS community, n_nodes, in_w, tot_w,
        |       round(q_num::DOUBLE / (mm * mm)::DOUBLE, 9) AS q_contrib,
        |       qt.q_total
        |FROM wm JOIN qt USING (round)
        |ORDER BY wm.round, community""".stripMargin),
    // same per-source moments, same LOO/SE chains; the g-term Σs ride
    // round 6
    "q222_jackknife" ->
      """WITH per AS (
        |  SELECT source, sum(n_chars)::BIGINT AS s_i, count(*)::BIGINT AS n_i
        |  FROM documents GROUP BY source),
        |tot AS (
        |  SELECT sum(s_i)::BIGINT AS s, sum(n_i)::BIGINT AS n,
        |         count(*)::BIGINT AS g
        |  FROM per),
        |loo AS (
        |  SELECT per.source, per.n_i, tot.s, tot.n,
        |         (tot.s - per.s_i)::DOUBLE / (tot.n - per.n_i)::DOUBLE AS theta_loo
        |  FROM per CROSS JOIN tot),
        |tb AS (SELECT sum(theta_loo) / count(*)::DOUBLE AS theta_bar FROM loo),
        |se AS (
        |  SELECT sqrt((count(*) - 1)::DOUBLE / count(*)::DOUBLE
        |           * sum((l.theta_loo - tb.theta_bar)
        |                 * (l.theta_loo - tb.theta_bar))) AS se_jack
        |  FROM loo l CROSS JOIN tb)
        |SELECT l.source, l.n_i, round(l.theta_loo, 6) + 0.0 AS theta_loo,
        |       round(l.s::DOUBLE / l.n::DOUBLE, 6) + 0.0 AS theta,
        |       round(se.se_jack, 6) + 0.0 AS se_jack
        |FROM loo l CROSS JOIN se ORDER BY l.source""".stripMargin,
    // exact cents moments (zero accumulation-order exposure), fixed
    // chains, variances descaled before round 6
    "q223_cuped_variance" ->
      """WITH m AS (
        |  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid_us
        |  FROM events),
        |per AS (
        |  SELECT user_id,
        |         sum(CASE WHEN epoch_us(ts) < m.mid_us
        |                  THEN floor(value * 100.0 + 0.5)::BIGINT ELSE 0 END)::BIGINT AS x,
        |         sum(CASE WHEN epoch_us(ts) >= m.mid_us
        |                  THEN floor(value * 100.0 + 0.5)::BIGINT ELSE 0 END)::BIGINT AS y
        |  FROM events CROSS JOIN m GROUP BY user_id),
        |s AS (
        |  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
        |         sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx,
        |         sum(y * y)::BIGINT AS syy
        |  FROM per)
        |SELECT n,
        |       round((n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE, 6)
        |         + 0.0 AS theta,
        |       round((n * syy - sy * sy)::DOUBLE / n::DOUBLE / n::DOUBLE / 10000.0, 6)
        |         + 0.0 AS var_y,
        |       round(((n * syy - sy * sy)::DOUBLE / n::DOUBLE / n::DOUBLE
        |              - (n * sxy - sx * sy)::DOUBLE * (n * sxy - sx * sy)::DOUBLE
        |                / (n * sxx - sx * sx)::DOUBLE
        |                / n::DOUBLE / n::DOUBLE) / 10000.0, 6) + 0.0 AS var_y_cuped,
        |       round((n * sxy - sx * sy)::DOUBLE * (n * sxy - sx * sy)::DOUBLE
        |             / (n * sxx - sx * sx)::DOUBLE / (n * syy - sy * sy)::DOUBLE, 6)
        |         + 0.0 AS reduction
        |FROM s""".stripMargin,
    // same distinct user×type projection, same integer product chain
    "q221_cooccurrence_lift" ->
      """WITH ut AS (
        |  SELECT DISTINCT user_id, event_type FROM events),
        |nu AS (SELECT count(DISTINCT user_id)::BIGINT AS n_users FROM ut),
        |na AS (
        |  SELECT event_type, count(*)::BIGINT AS n FROM ut GROUP BY event_type),
        |p AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb, count(*)::BIGINT AS nab
        |  FROM ut a JOIN ut b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY ta, tb)
        |SELECT p.ta, p.tb, x.n AS n_a, y.n AS n_b, p.nab,
        |       round((nu.n_users * p.nab)::DOUBLE / (x.n * y.n)::DOUBLE, 6) + 0.0
        |         AS lift
        |FROM p JOIN na x ON x.event_type = p.ta
        |JOIN na y ON y.event_type = p.tb CROSS JOIN nu
        |ORDER BY p.ta, p.tb""".stripMargin,
    // same first-signup / first-qualifying-purchase aggs, same integer
    // day-diff bucket ladder
    // same dense spine, same micro-unit integer grid end-to-end (trend,
    // detrend, seasonal mean, residual all BIGINT), same final descales
    "q261_seasonal_decomposition" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day FROM events),
        |counts AS (
        |  SELECT event_type, day, count(*)::BIGINT AS n FROM ev GROUP BY 1, 2),
        |lim AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
        |spine AS (
        |  SELECT event_type, unnest(range(lo, hi + 1)) AS day
        |  FROM (SELECT DISTINCT event_type FROM ev) t CROSS JOIN lim),
        |grid AS (
        |  SELECT s.event_type, s.day, coalesce(c.n, 0)::BIGINT AS n
        |  FROM spine s LEFT JOIN counts c USING (event_type, day)),
        |t AS (
        |  SELECT grid.*,
        |         CAST(floor((sum(n) OVER w) * 1000000.0 / (count(*) OVER w) + 0.5)
        |              AS BIGINT) AS trend_u,
        |         (day + 4) % 7 AS dow
        |  FROM grid
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |t2 AS (
        |  SELECT t.*, n * 1000000 - trend_u AS du
        |  FROM t),
        |seas AS (
        |  SELECT event_type, dow,
        |         CAST(floor(sum(du)::DOUBLE / count(*) + 0.5) AS BIGINT) AS seas_u
        |  FROM t2 GROUP BY 1, 2)
        |SELECT t2.event_type, DATE '1970-01-01' + CAST(t2.day AS INT) AS d, n,
        |       trend_u / 1000000.0 AS trend,
        |       seas_u / 1000000.0 AS seasonal,
        |       (n * 1000000 - trend_u - seas_u) / 1000000.0 AS residual
        |FROM t2 JOIN seas USING (event_type, dow)
        |ORDER BY event_type, d""".stripMargin,
    // same md5-48-bit uniforms, same mirrored inverse-CDF Laplace,
    // same integer-grid per-ε mean
    "q258_dp_noisy_counts" ->
      """WITH per AS (
        |  SELECT event_type, count(*)::BIGINT AS n_true FROM events GROUP BY 1),
        |x AS (
        |  SELECT per.*, lbl AS eps_label, lbl::DOUBLE AS eps,
        |         ((('0x' || substr(md5(event_type || '|' || lbl), 1, 12))::BIGINT)::DOUBLE
        |            + 0.5) / 281474976710656.0 AS u
        |  FROM per CROSS JOIN (SELECT unnest(['0.1', '1.0', '10.0']) AS lbl) e),
        |ns AS (
        |  SELECT x.*,
        |         -1.0 / eps * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)) AS noise
        |  FROM x),
        |ns2 AS (
        |  SELECT ns.*,
        |         CAST(floor(abs(noise) * 10000.0 + 0.5) AS BIGINT) AS err_u
        |  FROM ns),
        |pe AS (
        |  SELECT eps_label,
        |         round(sum(err_u)::DOUBLE / 10000.0 / count(*), 6) + 0.0 AS mean_abs_err
        |  FROM ns2 GROUP BY 1)
        |SELECT event_type, eps, n_true,
        |       round(n_true + noise, 4) + 0.0 AS noisy,
        |       round(abs(noise), 4) + 0.0 AS abs_err,
        |       mean_abs_err
        |FROM ns2 JOIN pe USING (eps_label)
        |ORDER BY eps, event_type""".stripMargin,
    // same QI census, same pivoted segment counts, same fixed-chain
    // entropy with ln, same integer-grid mean
    "q256_l_diversity" -> {
      val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
      val counts = segs.zipWithIndex.map { case (s, i) =>
        s"sum(CASE WHEN c_mktsegment = '$s' THEN 1 ELSE 0 END)::BIGINT AS n${i + 1}"
      }.mkString(",\n         ")
      val terms = (1 to 5).map(i =>
        s"CASE WHEN n$i > 0 THEN (n$i::DOUBLE / n) * ln(n$i::DOUBLE / n) ELSE 0.0 END")
        .mkString(" + ")
      s"""WITH cls AS (
         |  SELECT c_nationkey, CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
         |         count(*)::BIGINT AS n,
         |         count(DISTINCT c_mktsegment)::BIGINT AS n_distinct,
         |         $counts
         |  FROM customer GROUP BY 1, 2),
         |h AS (
         |  SELECT cls.*, -($terms) AS h,
         |         CAST(floor(-($terms) * 1000000.0 + 0.5) AS BIGINT) AS h_u
         |  FROM cls),
         |tot AS (
         |  SELECT count(*)::BIGINT AS n_classes, sum(n)::BIGINT AS n_rows,
         |         min(n_distinct) AS min_distinct,
         |         round(min(h), 6) + 0.0 AS min_entropy,
         |         round(sum(h_u)::DOUBLE / 1000000.0 / count(*), 6) + 0.0 AS mean_entropy
         |  FROM h),
         |t AS (
         |  SELECT l, sum(CASE WHEN n_distinct < l THEN 1 ELSE 0 END)::BIGINT AS n_failing_classes,
         |         sum(CASE WHEN n_distinct < l THEN n ELSE 0 END)::BIGINT AS n_failing_rows
         |  FROM h CROSS JOIN (SELECT unnest([2, 3, 4]) AS l) ls
         |  GROUP BY l)
         |SELECT l::BIGINT AS l_threshold, n_classes, n_failing_classes, n_failing_rows,
         |       round(n_failing_rows::DOUBLE / n_rows, 6) + 0.0 AS failing_share,
         |       min_distinct, min_entropy, mean_entropy
         |FROM t CROSS JOIN tot ORDER BY l_threshold""".stripMargin
    },
    // same md5 splits, same exact-moment fit ratios, same 4096-bin
    // census crossing, same conservative upper-edge bound
    "q254_conformal_calibration" ->
      """WITH b AS (
        |  SELECT l_quantity::BIGINT AS x,
        |         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS yc,
        |         ('0x' || substr(md5(l_orderkey::VARCHAR || '_' || l_linenumber::VARCHAR),
        |           1, 8))::BIGINT % 4 AS bk
        |  FROM lineitem),
        |b2 AS (
        |  SELECT b.*, CASE WHEN bk <= 1 THEN 'train' WHEN bk = 2 THEN 'cal'
        |              ELSE 'test' END AS split
        |  FROM b),
        |f0 AS (
        |  SELECT count(*)::BIGINT AS n_train, sum(x)::BIGINT AS sx,
        |         sum(x * x)::BIGINT AS sxx, sum(yc)::BIGINT AS syc,
        |         sum(x * yc)::BIGINT AS sxyc
        |  FROM b2 WHERE split = 'train'),
        |f1 AS (
        |  SELECT f0.*,
        |         (n_train::DOUBLE * sxyc::DOUBLE - sx::DOUBLE * syc::DOUBLE) /
        |           (n_train::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) AS slope_c
        |  FROM f0),
        |f AS (
        |  SELECT f1.*,
        |         (syc::DOUBLE - slope_c * sx::DOUBLE) / n_train::DOUBLE AS icept_c
        |  FROM f1),
        |sc AS (
        |  SELECT b2.split,
        |         abs(yc::DOUBLE - (icept_c + slope_c * x::DOUBLE)) AS rc
        |  FROM b2 CROSS JOIN f),
        |cs AS (
        |  SELECT count(*)::BIGINT AS n_cal, max(rc) AS rmax
        |  FROM sc WHERE split = 'cal'),
        |hist AS (
        |  SELECT CAST(least(floor(rc / rmax * 4096), 4095) AS BIGINT) AS bucket,
        |         count(*)::BIGINT AS c
        |  FROM sc CROSS JOIN cs WHERE split = 'cal' GROUP BY 1),
        |cum AS (
        |  SELECT bucket, sum(c) OVER (ORDER BY bucket)::BIGINT AS cum FROM hist),
        |bb AS (
        |  SELECT min(CASE WHEN cum >= (9 * (n_cal + 1) + 9) // 10
        |                  THEN bucket END) AS bb
        |  FROM cum CROSS JOIN cs),
        |bd AS (
        |  SELECT n_cal, (bb + 1)::DOUBLE * rmax / 4096.0 AS bound_c
        |  FROM bb CROSS JOIN cs),
        |t AS (
        |  SELECT count(*)::BIGINT AS n_test,
        |         sum(CASE WHEN rc <= bound_c THEN 1 ELSE 0 END)::BIGINT AS n_covered
        |  FROM sc CROSS JOIN bd WHERE split = 'test')
        |SELECT n_train, n_cal, n_test,
        |       round(slope_c / 100.0, 6) + 0.0 AS slope,
        |       round(icept_c / 100.0, 6) + 0.0 AS intercept,
        |       round(bound_c / 100.0, 6) + 0.0 AS conf_bound,
        |       n_covered,
        |       round(n_covered::DOUBLE / n_test, 6) + 0.0 AS coverage
        |FROM t CROSS JOIN bd CROSS JOIN f""".stripMargin,
    // same cents sums, same mirrored variance ratio, same constants
    "q252_power_analysis" ->
      """WITH per AS (
        |  SELECT event_type, count(*)::BIGINT AS n_obs,
        |         sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))::BIGINT AS s1c,
        |         sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT) *
        |             CAST(floor(value * 100.0 + 0.5) AS BIGINT))::BIGINT AS s2c,
        |         count(DISTINCT date_trunc('day', ts))::BIGINT AS n_days
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type),
        |m AS (
        |  SELECT per.*, s1c::DOUBLE / 100.0 / n_obs AS mean_v,
        |         (s2c::DOUBLE / 10000.0 -
        |          (s1c::DOUBLE / 100.0) * (s1c::DOUBLE / 100.0) / n_obs) / n_obs AS var_v
        |  FROM per),
        |m2 AS (SELECT m.*, mean_v * 0.05 AS mde FROM m),
        |m3 AS (
        |  SELECT m2.*,
        |         CAST(ceil(7.84887 * 2.0 * var_v / (mde * mde)) AS BIGINT) AS n_required
        |  FROM m2)
        |SELECT event_type, n_obs, round(mean_v, 6) + 0.0 AS mean_v,
        |       round(var_v, 6) + 0.0 AS var_v, round(mde, 6) + 0.0 AS mde,
        |       n_required, n_days,
        |       CAST(ceil(n_required::DOUBLE / (n_obs::DOUBLE / n_days)) AS BIGINT)
        |         AS days_to_power
        |FROM m3 ORDER BY event_type""".stripMargin,
    // same user census, same bands/cut, same Hájek ratios + positivity
    "q251_ipw_effect" ->
      """WITH u AS (
        |  SELECT user_id, count(*)::BIGINT AS n_ev,
        |         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_err,
        |         coalesce(sum(CASE WHEN event_type = 'purchase'
        |           THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) END), 0)::BIGINT AS y_cents
        |  FROM events GROUP BY user_id),
        |u2 AS (
        |  SELECT u.*, CASE WHEN n_err >= 14 THEN 1 ELSE 0 END::BIGINT AS t,
        |         CASE WHEN n_ev <= 60 THEN 'a_low'
        |              WHEN n_ev <= 70 THEN 'b_mid' ELSE 'c_high' END AS stratum
        |  FROM u),
        |s AS (
        |  SELECT stratum, count(*)::BIGINT AS n_users, sum(t)::BIGINT AS n_treated,
        |         sum(CASE WHEN t = 1 THEN y_cents ELSE 0 END)::BIGINT AS yt,
        |         sum(CASE WHEN t = 0 THEN y_cents ELSE 0 END)::BIGINT AS yc
        |  FROM u2 GROUP BY stratum),
        |s2 AS (SELECT s.*, n_treated::DOUBLE / n_users AS e_hat FROM s),
        |per AS (
        |  SELECT stratum, n_users, n_treated, round(e_hat, 6) + 0.0 AS e_hat,
        |         round(CASE WHEN n_treated > 0
        |           THEN yt::DOUBLE / 100.0 / n_treated END, 6) + 0.0 AS mean_y_treated,
        |         round(CASE WHEN n_users > n_treated
        |           THEN yc::DOUBLE / 100.0 / (n_users - n_treated) END, 6) + 0.0 AS mean_y_control
        |  FROM s2),
        |kept AS (
        |  SELECT u2.t, u2.y_cents, k.e_hat
        |  FROM u2 JOIN (SELECT stratum, e_hat FROM s2
        |                WHERE n_treated > 0 AND n_treated < n_users) k USING (stratum)),
        |ipw AS (
        |  SELECT sum(t::DOUBLE * y_cents / 100.0 / e_hat) / sum(t::DOUBLE / e_hat) AS mt,
        |         sum((1 - t)::DOUBLE * y_cents / 100.0 / (1.0 - e_hat)) /
        |           sum((1 - t)::DOUBLE / (1.0 - e_hat)) AS mc,
        |         count(*)::BIGINT AS n_users, sum(t)::BIGINT AS n_treated
        |  FROM kept),
        |naive AS (
        |  SELECT sum(CASE WHEN t = 1 THEN y_cents ELSE 0 END)::DOUBLE / 100.0 / sum(t) AS mt,
        |         sum(CASE WHEN t = 0 THEN y_cents ELSE 0 END)::DOUBLE / 100.0 /
        |           (count(*) - sum(t)) AS mc,
        |         count(*)::BIGINT AS n_users, sum(t)::BIGINT AS n_treated
        |  FROM u2),
        |allr AS (
        |  SELECT stratum, n_users, n_treated, e_hat, mean_y_treated, mean_y_control FROM per
        |  UNION ALL SELECT 'x_all_naive', n_users, n_treated, NULL::DOUBLE,
        |    round(mt, 6) + 0.0, round(mc, 6) + 0.0 FROM naive
        |  UNION ALL SELECT 'y_all_ipw', n_users, n_treated, NULL::DOUBLE,
        |    round(mt, 6) + 0.0, round(mc, 6) + 0.0 FROM ipw)
        |SELECT stratum, n_users, n_treated, e_hat, mean_y_treated, mean_y_control,
        |       round(mean_y_treated - mean_y_control, 6) + 0.0 AS diff
        |FROM allr ORDER BY stratum""".stripMargin,
    // same (ts, event_id) total order, same END terminal, same rounding
    "q245_markov_transitions" ->
      """WITH t AS (
        |  SELECT event_type AS from_type,
        |         coalesce(lead(event_type, 1) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id), 'END') AS to_type
        |  FROM events),
        |c AS (
        |  SELECT from_type, to_type, count(*)::BIGINT AS n_trans
        |  FROM t GROUP BY 1, 2)
        |SELECT from_type, to_type, n_trans,
        |       round(n_trans::DOUBLE / sum(n_trans) OVER (PARTITION BY from_type), 6) + 0.0 AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    "q243_time_to_convert" ->
      """WITH su AS (
        |  SELECT user_id, min(ts) AS su_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |fp AS (
        |  SELECT su.user_id, su.su_ts,
        |         min(CASE WHEN p.ts >= su.su_ts THEN p.ts END) AS p_ts
        |  FROM su LEFT JOIN (SELECT user_id, ts FROM events
        |                     WHERE event_type = 'purchase') p USING (user_id)
        |  GROUP BY su.user_id, su.su_ts),
        |b AS (
        |  SELECT CASE
        |    WHEN p_ts IS NULL THEN '5_never'
        |    WHEN date_diff('day', su_ts::DATE, p_ts::DATE) = 0 THEN '0_same_day'
        |    WHEN date_diff('day', su_ts::DATE, p_ts::DATE) <= 3 THEN '1_1-3d'
        |    WHEN date_diff('day', su_ts::DATE, p_ts::DATE) <= 7 THEN '2_4-7d'
        |    WHEN date_diff('day', su_ts::DATE, p_ts::DATE) <= 30 THEN '3_8-30d'
        |    ELSE '4_gt30d' END AS bucket
        |  FROM fp),
        |tot AS (SELECT count(*)::BIGINT AS n_signups FROM su)
        |SELECT bucket, count(*)::BIGINT AS n_users,
        |       round(count(*)::DOUBLE / tot.n_signups, 6) + 0.0 AS share
        |FROM b CROSS JOIN tot GROUP BY bucket, tot.n_signups
        |ORDER BY bucket""".stripMargin,
    // same journey segmentation, same integer basis-point ladder with
    // the identical remainder policy — every journey sums to 10000
    "q241_multi_touch_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
        |         coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS jid
        |  FROM events),
        |convs AS (SELECT DISTINCT user_id, jid FROM ev WHERE is_p = 1),
        |touches AS (
        |  SELECT user_id, jid, event_type,
        |         row_number() OVER (PARTITION BY user_id, jid
        |                            ORDER BY ts, event_id)::BIGINT AS pos
        |  FROM ev WHERE is_p = 0),
        |sized AS (SELECT user_id, jid, count(*)::BIGINT AS n
        |          FROM touches GROUP BY user_id, jid),
        |att AS (
        |  SELECT t.event_type, t.user_id, t.jid,
        |         CASE WHEN s.n = 1 THEN 10000
        |              WHEN s.n = 2 THEN 5000
        |              WHEN t.pos = 1 OR t.pos = s.n THEN 4000
        |              ELSE (2000 // (s.n - 2)) +
        |                   (CASE WHEN t.pos - 1 <= 2000 % (s.n - 2) THEN 1 ELSE 0 END)
        |         END::BIGINT AS bp
        |  FROM touches t
        |  JOIN sized s USING (user_id, jid)
        |  SEMI JOIN convs c ON c.user_id = t.user_id AND c.jid = t.jid),
        |tot AS (SELECT count(DISTINCT user_id * 1000000 + jid)::BIGINT AS total_convs FROM att)
        |SELECT event_type, count(*)::BIGINT AS n_touches,
        |       count(DISTINCT user_id * 1000000 + jid)::BIGINT AS n_convs_touched,
        |       sum(bp)::BIGINT AS total_credit_bp,
        |       round(sum(bp)::DOUBLE / (tot.total_convs * 10000), 6) + 0.0 AS credit_share
        |FROM att CROSS JOIN tot
        |GROUP BY event_type, tot.total_convs ORDER BY event_type""".stripMargin,
    // identical md5 uniforms cut by the SAME embedded thresholds
    // (poissonThresholds — one source of truth), identical integer
    // weighted sums, same order statistics over the 32 replicate means
    "q233_bootstrap_ci" ->
      s"""WITH d AS (SELECT doc_id, source, n_chars FROM documents),
        |reps AS (
        |  SELECT d.source, b.b,
        |         sum(w * n_chars)::BIGINT AS sx, sum(w)::BIGINT AS sw
        |  FROM d CROSS JOIN (SELECT unnest(range(0, 32)) AS b) b
        |  CROSS JOIN LATERAL (
        |    SELECT CASE
        |      WHEN u < ${poissonThresholds(0)} THEN 0
        |      WHEN u < ${poissonThresholds(1)} THEN 1
        |      WHEN u < ${poissonThresholds(2)} THEN 2
        |      WHEN u < ${poissonThresholds(3)} THEN 3
        |      WHEN u < ${poissonThresholds(4)} THEN 4
        |      ELSE 5 END AS w
        |    FROM (SELECT ('0x' || substr(md5(d.doc_id::VARCHAR || '#' || b.b::VARCHAR), 1, 15))::BIGINT AS u)
        |  ) wt
        |  GROUP BY d.source, b.b),
        |rm AS (SELECT source, b, sx::DOUBLE / sw AS rm FROM reps),
        |ci AS (
        |  SELECT source, list_sort(list(rm)) AS ms FROM rm GROUP BY source),
        |pt AS (
        |  SELECT source, count(*)::BIGINT AS n_docs,
        |         round(sum(n_chars)::DOUBLE / count(*), 6) + 0.0 AS mean_chars
        |  FROM d GROUP BY source)
        |SELECT pt.source, pt.n_docs, pt.mean_chars,
        |       round(ms[2], 6) + 0.0 AS ci_lo,
        |       round(ms[31], 6) + 0.0 AS ci_hi,
        |       round(ms[31] - ms[2], 6) + 0.0 AS ci_width
        |FROM pt JOIN ci USING (source) ORDER BY pt.source""".stripMargin,
    // same QI grid, same class census, same k sweep over census rows
    "q232_k_anonymity" ->
      """WITH cls AS (
        |  SELECT c_nationkey, c_mktsegment,
        |         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
        |         count(*)::BIGINT AS cls
        |  FROM customer GROUP BY 1, 2, 3),
        |tot AS (SELECT sum(cls)::BIGINT AS n_rows, count(*)::BIGINT AS n_classes,
        |               min(cls)::BIGINT AS min_class FROM cls),
        |ks(k) AS (VALUES (2), (5), (10))
        |SELECT k::BIGINT AS k_threshold, tot.n_classes, tot.min_class,
        |       sum(CASE WHEN cls.cls < k THEN 1 ELSE 0 END)::BIGINT AS n_violating_classes,
        |       sum(CASE WHEN cls.cls < k THEN cls.cls ELSE 0 END)::BIGINT AS n_violating_rows,
        |       round(sum(CASE WHEN cls.cls < k THEN cls.cls ELSE 0 END)::DOUBLE
        |             / tot.n_rows, 6) + 0.0 AS violating_share
        |FROM cls CROSS JOIN ks CROSS JOIN tot
        |GROUP BY k, tot.n_classes, tot.min_class, tot.n_rows
        |ORDER BY k_threshold""".stripMargin,
    // same md5 cohort, same per-table census, residual computed from
    // the anti-joined remainder — bit-identical
    "q218_erasure_sweep" ->
      """WITH a AS (
        |  SELECT 'customer' AS table_name, c_custkey AS k,
        |         ('0x' || substr(md5(c_custkey::VARCHAR), 1, 2))::BIGINT < 13 AS del
        |  FROM customer
        |  UNION ALL
        |  SELECT 'events_users', user_id,
        |         ('0x' || substr(md5(user_id::VARCHAR), 1, 2))::BIGINT < 13
        |  FROM events
        |  UNION ALL
        |  SELECT 'orders', o_custkey,
        |         ('0x' || substr(md5(o_custkey::VARCHAR), 1, 2))::BIGINT < 13
        |  FROM orders),
        |m AS (
        |  SELECT table_name, count(*)::BIGINT AS n_rows,
        |         sum(CASE WHEN del THEN 1 ELSE 0 END)::BIGINT AS n_to_erase,
        |         round(sum(CASE WHEN del THEN 1 ELSE 0 END)::DOUBLE
        |               / count(*)::DOUBLE, 6) + 0.0 AS erase_pct,
        |         sum(CASE WHEN del THEN k ELSE 0 END)::BIGINT AS erase_key_sum
        |  FROM a GROUP BY table_name),
        |r AS (
        |  SELECT table_name,
        |         coalesce(sum(CASE WHEN ('0x' || substr(md5(k::VARCHAR), 1, 2))::BIGINT < 13
        |                           THEN 1 ELSE 0 END), 0)::BIGINT AS n_residual
        |  FROM a WHERE NOT del GROUP BY table_name)
        |SELECT m.table_name, m.n_rows, m.n_to_erase, m.erase_pct,
        |       m.erase_key_sum, coalesce(r.n_residual, 0)::BIGINT AS n_residual
        |FROM m LEFT JOIN r USING (table_name)
        |ORDER BY m.table_name""".stripMargin,
    // same integer digit census; ln-chain shares under round 4
    "q204_benford" ->
      """WITH d AS (
        |  SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)::INT
        |           AS digit
        |  FROM orders),
        |c AS (SELECT digit, count(*)::BIGINT AS obs FROM d GROUP BY digit),
        |t AS (SELECT sum(obs)::BIGINT AS n FROM c)
        |SELECT digit::BIGINT AS digit, obs,
        |       round(obs::DOUBLE / n::DOUBLE * 100.0, 4) + 0.0 AS obs_pct,
        |       round((ln(digit::DOUBLE + 1.0) - ln(digit::DOUBLE)) / ln(10.0) * 100.0, 4)
        |         + 0.0 AS exp_pct,
        |       round(abs(obs::DOUBLE / n::DOUBLE * 100.0
        |             - (ln(digit::DOUBLE + 1.0) - ln(digit::DOUBLE)) / ln(10.0) * 100.0), 4)
        |         + 0.0 AS dev_pp
        |FROM c CROSS JOIN t ORDER BY digit""".stripMargin,
    // dense zero-filled spine, integer moment sums per lag, one sqrt
    // chain — bit-identical (no libm beyond sqrt/divide)
    "q206_lead_lag" ->
      """WITH ev AS (
        |  SELECT event_type, (epoch_us(ts) // 300000000) * 300000000 AS b
        |  FROM events),
        |counts AS (
        |  SELECT b, sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS x,
        |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS y
        |  FROM ev WHERE event_type IN ('view', 'purchase') GROUP BY b),
        |mm AS (SELECT min(b) AS lo, max(b) AS hi FROM ev),
        |spine AS (SELECT unnest(generate_series(lo, hi, 300000000)) AS b FROM mm),
        |grid AS (
        |  SELECT s.b, coalesce(c.x, 0)::BIGINT AS x, coalesce(c.y, 0)::BIGINT AS y
        |  FROM spine s LEFT JOIN counts c USING (b)),
        |l AS (
        |  SELECT t.lag, g.x, g.b + t.lag * 300000000 AS b2
        |  FROM grid g, (SELECT unnest(generate_series(-3, 3)) AS lag) t),
        |j AS (SELECT l.lag, l.x, g2.y FROM l JOIN grid g2 ON g2.b = l.b2),
        |m AS (
        |  SELECT lag, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
        |         sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
        |         sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy
        |  FROM j GROUP BY lag)
        |SELECT lag, n,
        |       round((n * sxy - sx * sy)::DOUBLE /
        |             sqrt((n * sxx - sx * sx)::DOUBLE * (n * syy - sy * sy)::DOUBLE), 6)
        |         + 0.0 AS r
        |FROM m ORDER BY lag""".stripMargin,
    // the all-integer 3σ trigger: no float boundary can flip a flag
    "q207_seasonal_anomaly" ->
      """WITH cell AS (
        |  SELECT ts::DATE AS day, extract(hour FROM ts)::BIGINT AS hr,
        |         count(*)::BIGINT AS cnt
        |  FROM events GROUP BY day, hr),
        |base AS (
        |  SELECT hr, count(*)::BIGINT AS nd, sum(cnt)::BIGINT AS s,
        |         sum(cnt * cnt)::BIGINT AS sq
        |  FROM cell GROUP BY hr)
        |SELECT c.day, c.hr, c.cnt,
        |       round((b.nd * c.cnt - b.s)::DOUBLE /
        |             sqrt((b.nd * b.sq - b.s * b.s)::DOUBLE), 6) + 0.0 AS z
        |FROM cell c JOIN base b USING (hr)
        |WHERE (b.nd * c.cnt - b.s) * (b.nd * c.cnt - b.s)
        |        > 9 * (b.nd * b.sq - b.s * b.s)
        |ORDER BY c.day, c.hr""".stripMargin,
    // same cents census, same doubled tie-averaged ranks (exact
    // BIGINTs), same z / effect-size chains — bit-identical
    "q203_mann_whitney" ->
      """WITH s AS (
        |  SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 'A' ELSE 'B' END AS arm,
        |         CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS v
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |census AS (
        |  SELECT v, sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)::BIGINT AS ca,
        |         count(*)::BIGINT AS cnt
        |  FROM s GROUP BY v),
        |rk AS (
        |  SELECT v, ca, cnt, sum(cnt) OVER (ORDER BY v)::BIGINT AS cum
        |  FROM census),
        |st AS (
        |  SELECT sum(ca)::BIGINT AS n_a, sum(cnt - ca)::BIGINT AS n_b,
        |         sum(ca * (2 * (cum - cnt) + cnt + 1))::BIGINT AS r2a,
        |         sum(cnt * cnt * cnt - cnt)::BIGINT AS tie3
        |  FROM rk),
        |f AS (
        |  SELECT n_a, n_b, n_a + n_b AS n, tie3,
        |         r2a - n_a * (n_a + 1) AS u2
        |  FROM st)
        |SELECT n_a, n_b, u2,
        |       round((u2 - n_a * n_b)::DOUBLE / (2.0 * sqrt(n_a::DOUBLE
        |             * n_b::DOUBLE / 12.0 * (n::DOUBLE + 1.0
        |             - tie3::DOUBLE / (n::DOUBLE * (n::DOUBLE - 1.0))))), 6) + 0.0 AS z,
        |       round(1.0 - u2::DOUBLE / (n_a::DOUBLE * n_b::DOUBLE), 6) + 0.0 AS r_rb
        |FROM f""".stripMargin,
    // same contingency table, same exact-integer marginals, same term
    // chain; only the ~60-term Σ is order-exposed, under round 6
    "q193_chi_squared" ->
      """WITH b AS (
        |  SELECT source,
        |         CASE WHEN n_chars < 200 THEN 'short'
        |              WHEN n_chars < 350 THEN 'mid'
        |              ELSE 'long' END AS bucket
        |  FROM documents),
        |cells AS (
        |  SELECT source, bucket, count(*)::BIGINT AS o
        |  FROM b GROUP BY source, bucket),
        |rt AS (SELECT source, sum(o)::BIGINT AS rt FROM cells GROUP BY source),
        |ct AS (SELECT bucket, sum(o)::BIGINT AS ct FROM cells GROUP BY bucket),
        |tot AS (SELECT sum(o)::BIGINT AS n, count(DISTINCT source)::BIGINT AS r,
        |               count(DISTINCT bucket)::BIGINT AS c FROM cells),
        |t AS (
        |  SELECT cells.o, (rt.rt * ct.ct)::DOUBLE / tot.n::DOUBLE AS e,
        |         tot.n, tot.r, tot.c
        |  FROM cells JOIN rt USING (source) JOIN ct USING (bucket) CROSS JOIN tot)
        |SELECT max(n)::BIGINT AS n, max((r - 1) * (c - 1))::BIGINT AS dof,
        |       round(sum((o::DOUBLE - e) * (o::DOUBLE - e) / e), 6) + 0.0 AS chi2,
        |       round(sqrt(sum((o::DOUBLE - e) * (o::DOUBLE - e) / e)
        |               / (max(n)::DOUBLE * least(max(r) - 1, max(c) - 1)::DOUBLE)), 6)
        |         + 0.0 AS cramers_v
        |FROM t""".stripMargin,
    // the IDENTICAL text the engine executes — DuckDB reparses the same
    // EXISTS / NOT IN / correlated-scalar statement over the same tables
    "q99_sql_subqueries" -> sqlSubqueryText,
    "q110_sql_window" -> sqlWindowText,
    // the IDENTICAL shorthand / named-window texts — DuckDB reparses them
    "q123_sql_group_by_all" -> sqlGroupByAllText,
    "q124_sql_window_clause" -> sqlWindowClauseText,
    "q159_sql_listagg" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS n,
        |       listagg(DISTINCT o_orderstatus, '|' ORDER BY o_orderstatus) AS statuses
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // each edge an ANTI JOIN orphan count, one UNION ALL report
    "q175_integrity_audit" ->
      """SELECT * FROM (
        |  SELECT 'lineitem->orders' AS edge, count(*)::BIGINT AS n_orphans
        |  FROM lineitem ANTI JOIN orders ON l_orderkey = o_orderkey
        |  UNION ALL
        |  SELECT 'lineitem->part', count(*)::BIGINT
        |  FROM lineitem ANTI JOIN part ON l_partkey = p_partkey
        |  UNION ALL
        |  SELECT 'lineitem->supplier', count(*)::BIGINT
        |  FROM lineitem ANTI JOIN supplier ON l_suppkey = s_suppkey
        |  UNION ALL
        |  SELECT 'orders->customer', count(*)::BIGINT
        |  FROM orders ANTI JOIN customer ON o_custkey = c_custkey
        |  UNION ALL
        |  SELECT 'customer->nation', count(*)::BIGINT
        |  FROM customer ANTI JOIN nation ON c_nationkey = n_nationkey
        |  UNION ALL
        |  SELECT 'orders->customer_partial(probe)', count(*)::BIGINT
        |  FROM orders ANTI JOIN (
        |    SELECT c_custkey FROM customer
        |    WHERE substring(md5(CAST(c_custkey AS VARCHAR)), 1, 1) NOT IN ('0','1','2','3')
        |  ) c ON o_custkey = c_custkey
        |) ORDER BY edge""".stripMargin,
    // same md5 arm assignment, same moment ratios
    "q176_ab_ttest" ->
      """WITH armed AS (
        |  SELECT value,
        |         CASE WHEN ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 2))::BIGINT % 2 = 0
        |              THEN 'A' ELSE 'B' END AS arm
        |  FROM events),
        |s AS (
        |  SELECT arm, count(*)::DOUBLE AS n, avg(value) AS m, var_samp(value) AS v
        |  FROM armed GROUP BY arm),
        |a AS (SELECT n AS na, m AS ma, v AS va FROM s WHERE arm = 'A'),
        |b AS (SELECT n AS nb, m AS mb, v AS vb FROM s WHERE arm = 'B'),
        |j AS (SELECT *, va / na + vb / nb AS se2 FROM a CROSS JOIN b)
        |SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
        |       round(ma, 6) + 0.0 AS mean_a, round(mb, 6) + 0.0 AS mean_b,
        |       round((ma - mb) / sqrt(se2), 6) + 0.0 AS t_stat,
        |       round(pow(se2, 2) /
        |             (pow(va / na, 2) / (na - 1) + pow(vb / nb, 2) / (nb - 1)), 6) + 0.0 AS df
        |FROM j""".stripMargin,
    // per-key census → one-row moments; hottest key by the same
    // (freq desc, key desc) total order as the engine's struct-max
    "q184_skew_report" -> {
      def per(k: String): String =
        s"""SELECT '$k' AS join_key, count(*)::BIGINT AS n_keys,
           |       sum(f)::BIGINT AS n_rows, max(f)::BIGINT AS max_freq,
           |       round(sum(f)::DOUBLE / count(*), 6) + 0.0 AS mean_freq,
           |       round(max(f) * count(*)::DOUBLE / sum(f), 6) + 0.0 AS skew_ratio,
           |       (SELECT k FROM c_$k ORDER BY f DESC, k DESC LIMIT 1) AS hottest_key,
           |       ceil(max(f) * count(*)::DOUBLE / sum(f))::BIGINT AS salt_factor
           |FROM c_$k""".stripMargin
      s"""WITH c_l_orderkey AS (SELECT l_orderkey AS k, count(*)::BIGINT AS f FROM lineitem GROUP BY 1),
         |c_l_partkey AS (SELECT l_partkey AS k, count(*)::BIGINT AS f FROM lineitem GROUP BY 1),
         |c_l_suppkey AS (SELECT l_suppkey AS k, count(*)::BIGINT AS f FROM lineitem GROUP BY 1)
         |SELECT * FROM (
         |${per("l_orderkey")}
         |UNION ALL
         |${per("l_partkey")}
         |UNION ALL
         |${per("l_suppkey")}
         |) ORDER BY join_key""".stripMargin
    },
    // same first-day min-agg and cumulative sum; CAST(ts AS DATE)
    // truncates identically under the UTC session
    "q181_running_distinct" ->
      """WITH f AS (
        |  SELECT event_type, user_id, min(CAST(ts AS DATE)) AS first_day
        |  FROM events GROUP BY 1, 2),
        |d AS (SELECT event_type, first_day AS day, count(*)::BIGINT AS new_users
        |      FROM f GROUP BY 1, 2)
        |SELECT event_type, day, new_users,
        |       (sum(new_users) OVER (PARTITION BY event_type ORDER BY day
        |                             ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_distinct_users
        |FROM d ORDER BY event_type, day""".stripMargin,
    // same lag pairs under the (ts, event_id) total order, one divide;
    // ts::TIMESTAMP truncates DuckDB's ns to the engine's µs order
    "q177_markov_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, ts::TIMESTAMP AS ts FROM events),
        |p AS (
        |  SELECT user_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev
        |  FROM e),
        |c AS (SELECT prev, event_type AS next, count(*)::BIGINT AS n
        |      FROM p WHERE prev IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev, sum(n)::BIGINT AS row_total FROM c GROUP BY 1)
        |SELECT c.prev, c.next, c.n,
        |       round(c.n::DOUBLE / t.row_total, 6) + 0.0 AS p
        |FROM c JOIN t USING (prev)
        |ORDER BY c.prev, c.next""".stripMargin,
    // DuckDB's native ASOF JOIN against the engine's union+window
    // device — two formulations, one rank-space as-of semantic
    "q171_quantile_calibration" ->
      """WITH ref AS (
        |  SELECT DISTINCT percent_rank() OVER (ORDER BY c_acctbal) AS g_pr,
        |         c_acctbal AS g_val
        |  FROM customer),
        |loc AS (
        |  SELECT c_custkey, c_mktsegment, c_acctbal,
        |         percent_rank() OVER (PARTITION BY c_mktsegment
        |                              ORDER BY c_acctbal) AS pr
        |  FROM customer)
        |SELECT l.c_custkey, l.c_mktsegment, l.c_acctbal,
        |       round(r.g_val, 2) + 0.0 AS calib
        |FROM loc l ASOF JOIN ref r ON l.pr >= r.g_pr
        |ORDER BY l.c_custkey""".stripMargin,
    // the UDF definitions inlined — what Spark's analyzer must resolve
    // the CREATE FUNCTION surface to
    "q169_sql_udf" ->
      """SELECT source, count(*)::BIGINT AS n_tokens,
        |       round(avg(length(w)::DOUBLE), 6) + 0.0 AS avg_wlen
        |FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
        |WHERE w <> '' GROUP BY source ORDER BY source""".stripMargin,
    // the IDENTICAL recursive-CTE / LATERAL texts — DuckDB reparses them
    "q112_sql_recursive" -> sqlRecursiveText,
    "q113_sql_lateral" -> sqlLateralText,
    // the scale-path variant: same text both engines, NOT EXISTS branch
    "q99b_sql_not_exists" -> sqlNotExistsText,
    // PIVOT lowered to the conditional-agg rewrite DuckDB states directly
    "q101_sql_pivot" ->
      """SELECT l_returnflag,
        |       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F,
        |       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // the IDENTICAL text — DuckDB parses the same GROUPING SETS statement
    "q102_sql_grouping_sets" -> sqlGroupingSetsText,
    // UNPIVOT as the dialect-neutral UNION-ALL-of-projections rewrite
    "q103_sql_unpivot" ->
      """WITH a AS (SELECT l_returnflag,
        |                  sum(l_quantity) AS qty,
        |                  sum(l_extendedprice) AS price,
        |                  sum(l_discount) AS disc
        |           FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, metric, round(val, 2) AS val FROM (
        |  SELECT l_returnflag, 'qty' AS metric, qty AS val FROM a
        |  UNION ALL SELECT l_returnflag, 'price', price FROM a
        |  UNION ALL SELECT l_returnflag, 'disc', disc FROM a)
        |ORDER BY l_returnflag, metric""".stripMargin,
    "q98_rolling_actives" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts::TIMESTAMP) AS day
        |  FROM events),
        |d AS (SELECT DISTINCT day AS d FROM a)
        |SELECT d.d::DATE AS day, count(DISTINCT a.user_id)::BIGINT AS n_active_7d
        |FROM a JOIN d ON a.day >= d.d - INTERVAL 6 DAY AND a.day <= d.d
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // ts truncated to µs (ts::TIMESTAMP) to match the engine's read
    "q95_cohort_retention" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('day', ts::TIMESTAMP) AS day FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, day FROM e)
        |SELECT c.cohort_day::DATE AS cohort_day,
        |       date_diff('day', c.cohort_day, a.day)::BIGINT AS day_offset,
        |       count(*)::BIGINT AS n_active_users
        |FROM a JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q96_funnel" ->
      """WITH e AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts, event_type FROM events),
        |v AS (SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS t2, min(v.t1) AS t1
        |  FROM e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t3, min(c.t1) AS t1
        |  FROM e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
        |SELECT (SELECT count(DISTINCT user_id) FROM e)::BIGINT AS n_users,
        |       (SELECT count(*) FROM v)::BIGINT AS n_view,
        |       (SELECT count(*) FROM c)::BIGINT AS n_view_click,
        |       (SELECT count(*) FROM p)::BIGINT AS n_full_funnel,
        |       (SELECT round(avg(epoch(t3) - epoch(t1)), 4) FROM p) AS avg_funnel_secs""".stripMargin,
    // one UNION ALL branch per column, stringified min/max — binary
    // collation in both engines, so string min/max agree
    "q83_profile" -> Seq("doc_id", "text", "lang", "source", "n_chars")
      .map(c =>
        s"""SELECT '$c' AS col_name, count(*)::BIGINT AS n_rows,
           |       (count(*) - count($c))::BIGINT AS n_null,
           |       count(DISTINCT $c)::BIGINT AS n_distinct,
           |       min($c)::VARCHAR AS min_repr, max($c)::VARCHAR AS max_repr
           |FROM documents""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),
    "q53_filter_breadth" ->
      """WITH f AS (
        |  SELECT *,
        |    CASE WHEN p_size > 25 THEN p_brand END AS big,
        |    CASE WHEN p_retailprice > 1200.0 THEN p_brand END AS pricey
        |  FROM part
        |  WHERE p_name LIKE '%ol%'
        |    AND regexp_matches(p_brand, 'Brand#[1-3]$')
        |    AND p_size BETWEEN 5 AND 40
        |    AND NOT (p_type IN ('a', 'b', 'c')))
        |SELECT p_brand, count(*)::BIGINT AS n, round(sum(p_retailprice), 2) AS sum_price
        |FROM f WHERE big IS NOT DISTINCT FROM pricey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q54_sort_nulls" ->
      """WITH s AS (
        |  SELECT s_suppkey,
        |         CASE WHEN s_acctbal > 0 THEN round(s_acctbal, 2) END AS pos_bal
        |  FROM supplier)
        |SELECT s_suppkey, pos_bal,
        |       row_number() OVER (ORDER BY pos_bal DESC NULLS FIRST, s_suppkey)::INT AS rn_nf,
        |       row_number() OVER (ORDER BY pos_bal ASC NULLS LAST, s_suppkey)::INT AS rn_nl
        |FROM s ORDER BY s_suppkey""".stripMargin,
    "q55_posexplode_stack" ->
      """WITH w AS (
        |  SELECT doc_id, u.p AS pos, ws[u.p + 1] AS word
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents WHERE doc_id < 5) t,
        |       unnest(range(len(ws))) AS u(p)
        |  WHERE u.p < 8),
        |lk AS (SELECT * FROM (VALUES ('key', 10), ('value', 20), ('row', 30)) AS v(word, weight))
        |SELECT doc_id, count(*)::BIGINT AS n_words,
        |       sum(pos)::BIGINT AS sum_pos,
        |       sum(coalesce(weight, 0))::BIGINT AS sum_weight
        |FROM w LEFT JOIN lk USING (word)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the oracle re-derives each fingerprint from the raw parquet: the
    // engine↔oracle hash equality IS a cross-system certification run
    "q118_table_fingerprint" ->
      """SELECT 'customer' AS tbl, count(*) AS n_rows,
        |       bit_xor(('0x' || substr(md5(c_custkey::VARCHAR || '|' || c_mktsegment || '|' ||
        |                CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)::VARCHAR), 1, 15))::BIGINT) AS fp
        |FROM customer
        |UNION ALL
        |SELECT 'orders', count(*),
        |       bit_xor(('0x' || substr(md5(o_orderkey::VARCHAR || '|' || o_orderstatus || '|' ||
        |                CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)::VARCHAR), 1, 15))::BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'documents', count(*),
        |       bit_xor(('0x' || substr(md5(doc_id::VARCHAR || '|' || source || '|' || md5(text)), 1, 15))::BIGINT)
        |FROM documents
        |ORDER BY tbl""".stripMargin,
    // the oracle never sees the ORC hop — it aggregates the ORIGINAL
    // parquet, so the compare certifies the roundtrip is lossless
    "q116_orc_roundtrip" ->
      """SELECT l_returnflag AS grp, count(*) AS n,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS price_cents,
        |       min(l_orderkey) AS min_key
        |FROM lineitem WHERE l_orderkey % 10 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q56_csv_json_roundtrip" ->
      """WITH o AS (
        |  SELECT 'csv:' || o_orderstatus AS grp, count(*)::BIGINT AS n,
        |         round(sum(o_totalprice), 2) AS sum_val,
        |         min(strftime(o_orderdate, '%Y-%m-%d')) AS min_key
        |  FROM orders WHERE o_orderkey % 10 = 0 GROUP BY o_orderstatus),
        |e AS (
        |  SELECT 'json:' || event_type AS grp, count(*)::BIGINT AS n,
        |         round(sum(value), 2) AS sum_val,
        |         min(event_id)::VARCHAR AS min_key
        |  FROM events WHERE event_id % 10 = 0 GROUP BY event_type)
        |SELECT * FROM o UNION ALL SELECT * FROM e ORDER BY grp""".stripMargin
  )
}
