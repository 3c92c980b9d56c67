package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-expression surface (SURVEY.md §2B "Projection / filter /
  * scalar"): one query per function family — string, date/time, math,
  * array (incl. higher-order lambdas), map/struct, JSON over
  * `events.props` (the reference's payload model is JSON events,
  * /root/reference/README.md:36-52), hash, and conditional/cast.
  *
  * Scale notes: everything here is a narrow per-row projection —
  * whole-stage-codegen'd, shuffle-free until the (small-key) final agg
  * or sort. No UDFs: every function is a Catalyst built-in, so null
  * handling and codegen come free (SURVEY §4.2 "functions, not UDFs").
  *
  * Oracle-parity notes baked into each query:
  *  - DuckDB `regexp_replace` replaces the FIRST match unless the 'g'
  *    flag is given; Spark always replaces all → oracle uses 'g';
  *  - DuckDB ranking/length/instr fns return BIGINT where Spark emits
  *    INT → casts pin the common type on both sides;
  *  - DuckDB CAST(double AS INT) rounds, Spark truncates → oracle uses
  *    trunc() before casting.
  */
object ScalarQueries extends QueryModule {

  /** String functions over customer names (row-level, keyed output). */
  def q32StringFns(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_custkey") <= 300)
      .select(
        col("c_custkey"),
        length(col("c_name")).as("name_len"),
        upper(col("c_mktsegment")).as("seg_upper"),
        lower(substring(col("c_name"), 1, 8)).as("prefix8"),
        concat_ws("-", col("c_mktsegment"), col("c_nationkey").cast("string")).as("seg_tag"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("key_padded"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("name_masked"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("name_digits"),
        reverse(col("c_mktsegment")).as("seg_rev"),
        trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("seg_trim"),
        instr(col("c_name"), "#").cast("int").as("hash_pos"),
        repeat(lit("ab"), 3).as("rep"))
      .orderBy("c_custkey")

  /** Date/time functions over order dates. */
  def q33DatetimeFns(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") <= 1000)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        quarter(col("o_orderdate")).as("q"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        datediff(lit("1998-12-31").cast("date"), col("o_orderdate")).as("days_to_eoy"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        add_months(col("o_orderdate"), 3).as("plus3m"),
        last_day(col("o_orderdate")).as("month_end"))
      .orderBy("o_orderkey")

  /** Math functions, row-level over lineitem measures. */
  def q34MathFns(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") <= 400)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(abs(col("l_quantity") - 25), 2).as("abs_dev"),
        ceil(col("l_extendedprice") / 1000).as("price_k_ceil"),
        floor(col("l_extendedprice") / 1000).as("price_k_floor"),
        round(sqrt(col("l_extendedprice")), 4).as("price_sqrt"),
        round(exp(col("l_discount")), 4).as("disc_exp"),
        round(log(col("l_extendedprice")), 4).as("price_ln"),
        round(log(10.0, col("l_extendedprice")), 4).as("price_log10"),
        round(pow(col("l_quantity"), 2), 2).as("qty_sq"),
        signum(col("l_quantity") - 25).cast("int").as("qty_sign"),
        pmod(col("l_orderkey"), lit(7)).as("key_mod7"),
        round(greatest(col("l_quantity"), col("l_discount") * 100), 2).as("gr"),
        round(least(col("l_quantity"), col("l_tax") * 100), 2).as("ls"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Array functions incl. higher-order lambdas (transform/filter/
    * exists/forall/aggregate) over a per-group collected array. All
    * array-typed intermediates reduce to scalar output columns (the
    * driver's hasher requires scalar cells). */
  def q35ArrayFns(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(sort_array(collect_set(col("l_quantity"))).as("arr"))
      .select(
        col("l_returnflag"),
        size(col("arr")).as("n"),
        element_at(col("arr"), 1).as("first_qty"),
        array_max(col("arr")).as("max_qty"),
        array_min(col("arr")).as("min_qty"),
        round(expr("aggregate(arr, 0D, (a, x) -> a + x)"), 2).as("total"),
        round(expr("aggregate(transform(arr, x -> x * 2), 0D, (a, x) -> a + x)"), 2).as("total_x2"),
        size(expr("filter(arr, x -> x > 25)")).as("n_over25"),
        round(expr("aggregate(slice(arr, 1, 3), 0D, (a, x) -> a + x)"), 2).as("top3_sum"),
        expr("exists(arr, x -> x > 49)").as("has_49plus"),
        expr("forall(arr, x -> x > 0)").as("all_positive"),
        array_contains(col("arr"), 1.0).as("has_one"))
      .orderBy("l_returnflag")

  /** Map + struct functions. Map-typed intermediates are reduced to
    * scalars via element_at; the oracle states the expected VALUES
    * directly (map identities), which is the point: prove the engine's
    * map/struct round-trip computes the right thing. */
  def q36MapStructFns(spark: SparkSession, dir: String): DataFrame = {
    val m = map_from_arrays(
      array(lit("nk"), lit("rk")),
      array(col("n_nationkey").cast("long"), col("n_regionkey").cast("long")))
    val m2 = map_concat(m, map(lit("x"), lit(7L)))
    val s = struct(col("n_name").as("nm"), col("n_regionkey").as("rk"))
    Tables.nation(spark, dir)
      .select(
        col("n_nationkey"),
        element_at(m, "rk").as("rk_val"),
        element_at(m2, "x").as("x_val"),
        element_at(map_from_entries(map_entries(m)), "nk").as("nk_roundtrip"),
        element_at(expr(
          "transform_values(map('nk', CAST(n_nationkey AS BIGINT)), (k, v) -> v * 10)"),
          "nk").as("nk_x10"),
        array_join(sort_array(map_keys(m2)), ",").as("keys_sorted"),
        size(map_values(m2)).as("n_vals"),
        s.getField("nm").as("struct_name"),
        s.withField("z", lit(1L)).getField("z").as("z_val"))
      .orderBy("n_nationkey")
  }

  /** JSON functions over events.props (shape {"k": 87} per FIXTURES.md)
    * — ONE from_json parse per row; the string view of k is derived from
    * the parsed struct, not a second get_json_object pass (JSON parsing
    * dominates CPU on a 100 TB event stream — parse once, project many).
    */
  def q37JsonFns(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("j", from_json(col("props"), lit("k INT")))
      .select(
        col("event_type"),
        col("j.k").as("k"),
        col("j.k").cast("string").as("k_str"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(avg("k"), 4).as("avg_k"),
        min("k").as("min_k"),
        max("k").as("max_k"),
        sum(when(col("k") > 50, 1).otherwise(0)).as("n_k_gt50"),
        max("k_str").as("max_k_str"))
      .orderBy("event_type")

  /** q145: the VARIANT semi-structured type (Spark 4's open-schema
    * column — binary-encoded, shreddable at rest, the lakehouse answer
    * to schemaless JSON at 100 TB): `parse_json` → typed `variant_get`
    * paths. Each event's props parses ONCE to VARIANT; a second nested
    * document (object + array + JSON null, built from typed columns —
    * ints and strings only, so no float-formatting skew between
    * engines) exercises object fields, 0-based array indexing, the
    * missing-path → SQL NULL contract (`try_variant_get`) and the
    * JSON-null vs missing distinction (`is_variant_null`). Unlike
    * q37's `from_json`, no schema is declared anywhere — the paths are
    * late-bound, which is the point of the type.
    *
    * Scale shape: parse + extraction are scan-local (one parse per
    * row, projected many ways), then one partial+final agg on
    * event_type. At rest a VARIANT column shreds frequent paths into
    * columnar subfields, so `$.k`-style probes read like real columns
    * instead of re-parsing text — the engine-side reason to prefer it
    * over a string props column.
    */
  def q145VariantOps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'int')").as("k"),
        expr(
          """parse_json(concat('{"u":', user_id,
            |  ',"et":"', event_type,
            |  '","arr":[', variant_get(parse_json(props), '$.k', 'string'),
            |  ',', 2 * variant_get(parse_json(props), '$.k', 'int'),
            |  '],"z":null}'))""".stripMargin).as("v"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum("k").as("sum_k"),
        sum(expr("variant_get(v, '$.arr[1]', 'bigint')")).as("sum_arr1"),
        sum(expr("if(try_variant_get(v, '$.nope', 'int') is null, 1, 0)"))
          .as("n_missing"),
        sum(expr("if(is_variant_null(variant_get(v, '$.z')), 1, 0)"))
          .as("n_znull"))
      .orderBy("event_type")

  /** Hash functions (md5 / sha2-256 are cross-engine checkable; xxhash64
    * and crc32 are Spark-specific and covered by HashFnsSpec instead). */
  def q38HashFns(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir)
      .select(
        col("n_nationkey"),
        md5(col("n_name")).as("name_md5"),
        sha2(col("n_name"), 256).as("name_sha256"),
        substring(md5(concat(col("n_name"), lit("|salt"))), 1, 8).as("salted_prefix"),
        length(md5(col("n_name"))).as("md5_len"))
      .orderBy("n_nationkey")

  /** Conditionals (CASE/coalesce/nullif) and casts, incl. the
    * double→int truncation semantics difference (oracle uses trunc). */
  def q39ConditionalCast(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") <= 1000)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") < 50000, "low")
          .when(col("o_totalprice") < 150000, "mid")
          .otherwise("high").as("bucket"),
        nullif(col("o_orderstatus"), lit("O")).as("status_nulled"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_filled"),
        col("o_totalprice").cast("int").as("price_int"),
        col("o_totalprice").cast("string").as("price_str"),
        (col("o_totalprice") > 100000).as("is_big"),
        col("o_custkey").cast("double").as("cust_dbl"))
      .orderBy("o_orderkey")

  /** q182: the TRY_* error-safe arithmetic surface — `try_cast`,
    * `try_divide`, `try_add` (ANSI-mode's civilized failure path: a
    * malformed cell NULLs, it doesn't kill a 1000-executor job at hour
    * three). Gated per priority group: parse the leading digit out of
    * dirty strings (the full string try_casts to NULL — both engines
    * agree malformed ≠ error), divide by a key-derived modulus that
    * hits zero (NULL, not DivideByZero), and push a BIGINT over its
    * ceiling (NULL, not overflow). The oracle states the same semantics
    * with DuckDB TRY_CAST + explicit CASE guards — proving Spark's
    * try_* family equals the guarded-arithmetic rewrite.
    */
  def q182TryArithmetic(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        // 1%-malformed probe: try_cast pays a caught exception PER
        // FAILING ROW (ANSI cast + catch), so a failure-dominated
        // column turns a scan into exception churn — the realistic
        // dirty-data regime is rare failures, and that is what this
        // prices (an always-malformed probe benched 10× the scan)
        expr("""try_cast(CASE WHEN o_orderkey % 100 = 0 THEN o_orderpriority
               |ELSE substring(o_orderpriority, 1, 1) END AS INT)""".stripMargin)
          .as("mixed_cast"),
        expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").as("prio_int"),
        expr("try_divide(o_totalprice, o_orderkey % 7)").as("div7"),
        // overflow kept rare for the same reason as the cast probe:
        // each overflowing row constructs a caught ArithmeticException
        expr("try_add(9223372036854775807L, CASE WHEN o_orderkey % 100 = 0 THEN 1L ELSE 0L END)")
          .as("ovf"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        count(col("mixed_cast")).as("n_cast_ok"),
        min("prio_int").as("prio_int"),
        sum(col("div7").isNull.cast("long")).as("n_div_null"),
        round(sum("div7"), 2).as("sum_div"),
        sum(col("ovf").isNull.cast("long")).as("n_overflow"))
      .orderBy("o_orderpriority")

  /** q183: COLLATION semantics (Spark 4 `COLLATE UTF8_LCASE`) —
    * case-insensitive grouping and equality as a COLUMN PROPERTY
    * rather than scattered lower() calls. The fixture's segments are
    * mangled to mixed case on even keys; grouping by the collated
    * column must merge 'Building' with 'BUILDING', and the collated
    * equality filter must count both spellings. The oracle states the
    * lower()-rewrite — the gate proves Spark's collation machinery
    * equals it (output keys are lower()ed on both sides because the
    * surviving representative inside a collated group is
    * engine-arbitrary by design).
    */
  def q183Collation(spark: SparkSession, dir: String): DataFrame = {
    val mixed = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_acctbal"),
        when(pmod(col("c_custkey"), lit(2)) === 0, initcap(col("c_mktsegment")))
          .otherwise(col("c_mktsegment")).as("seg"))
    mixed
      .groupBy(expr("collate(seg, 'UTF8_LCASE')").as("segc"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CASE WHEN seg = collate('Building', 'UTF8_LCASE') THEN 1 ELSE 0 END"))
          .as("n_building_ci"),
        round(sum("c_acctbal"), 2).as("sum_bal"))
      .select(lower(col("segc")).as("segment"), col("n"),
        col("n_building_ci"), col("sum_bal"))
      .orderBy("segment")
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q182_try_arithmetic" -> (q182TryArithmetic _),
    "q183_collation" -> (q183Collation _),
    "q32_string_fns" -> (q32StringFns _),
    "q33_datetime_fns" -> (q33DatetimeFns _),
    "q34_math_fns" -> (q34MathFns _),
    "q35_array_fns" -> (q35ArrayFns _),
    "q36_map_struct_fns" -> (q36MapStructFns _),
    "q37_json_fns" -> (q37JsonFns _),
    "q145_variant" -> (q145VariantOps _),
    "q38_hash_fns" -> (q38HashFns _),
    "q39_conditional_cast" -> (q39ConditionalCast _)
  )

  override val oracles: Map[String, String] = Map(
    // TRY_CAST native; divide/overflow as explicit CASE guards — the
    // rewrite the try_* family must equal
    "q182_try_arithmetic" ->
      """WITH t AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         TRY_CAST(CASE WHEN o_orderkey % 100 = 0 THEN o_orderpriority
        |                       ELSE substring(o_orderpriority, 1, 1) END AS INT) AS mixed_cast,
        |         TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_int,
        |         CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |              ELSE o_totalprice / (o_orderkey % 7) END AS div7,
        |         CASE WHEN o_orderkey % 100 = 0 THEN NULL
        |              ELSE 9223372036854775807 END AS ovf
        |  FROM orders)
        |SELECT o_orderpriority, count(*)::BIGINT AS n,
        |       count(mixed_cast)::BIGINT AS n_cast_ok,
        |       min(prio_int) AS prio_int,
        |       sum((div7 IS NULL)::INT)::BIGINT AS n_div_null,
        |       round(sum(div7), 2) + 0.0 AS sum_div,
        |       sum((ovf IS NULL)::INT)::BIGINT AS n_overflow
        |FROM t GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // the lower() rewrite collation must equal (the engine-side mixed-
    // case mangling is invisible under case-insensitive grouping — that
    // invisibility IS the property being gated)
    "q183_collation" ->
      """SELECT lower(c_mktsegment) AS segment, count(*)::BIGINT AS n,
        |       sum(CASE WHEN lower(c_mktsegment) = 'building' THEN 1 ELSE 0 END)::BIGINT AS n_building_ci,
        |       round(sum(c_acctbal), 2) + 0.0 AS sum_bal
        |FROM customer GROUP BY lower(c_mktsegment) ORDER BY segment""".stripMargin,
    "q32_string_fns" ->
      """SELECT c_custkey,
        |  CAST(length(c_name) AS INTEGER) AS name_len,
        |  upper(c_mktsegment) AS seg_upper,
        |  lower(substring(c_name, 1, 8)) AS prefix8,
        |  concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_tag,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
        |  regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
        |  coalesce(regexp_extract(c_name, '([0-9]+)', 1), '') AS name_digits,
        |  reverse(c_mktsegment) AS seg_rev,
        |  trim('  ' || c_mktsegment || '  ') AS seg_trim,
        |  CAST(instr(c_name, '#') AS INTEGER) AS hash_pos,
        |  repeat('ab', 3) AS rep
        |FROM customer WHERE c_custkey <= 300 ORDER BY c_custkey""".stripMargin,
    "q33_datetime_fns" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS d,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS q,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INTEGER) AS days_to_eoy,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end
        |FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""".stripMargin,
    "q34_math_fns" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(abs(l_quantity - 25), 2) AS abs_dev,
        |  CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
        |  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
        |  round(sqrt(l_extendedprice), 4) AS price_sqrt,
        |  round(exp(l_discount), 4) AS disc_exp,
        |  round(ln(l_extendedprice), 4) AS price_ln,
        |  round(log10(l_extendedprice), 4) AS price_log10,
        |  round(pow(l_quantity, 2), 2) AS qty_sq,
        |  CAST(sign(l_quantity - 25) AS INTEGER) AS qty_sign,
        |  mod(l_orderkey, 7) AS key_mod7,
        |  round(greatest(l_quantity, l_discount * 100), 2) AS gr,
        |  round(least(l_quantity, l_tax * 100), 2) AS ls
        |FROM lineitem WHERE l_orderkey <= 400 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q35_array_fns" ->
      """WITH g AS (
        |  SELECT l_returnflag, list_sort(list(DISTINCT l_quantity)) AS arr
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag,
        |  CAST(len(arr) AS INTEGER) AS n,
        |  arr[1] AS first_qty,
        |  list_aggregate(arr, 'max') AS max_qty,
        |  list_aggregate(arr, 'min') AS min_qty,
        |  round(list_aggregate(arr, 'sum'), 2) AS total,
        |  round(list_aggregate(list_transform(arr, x -> x * 2), 'sum'), 2) AS total_x2,
        |  CAST(len(list_filter(arr, x -> x > 25)) AS INTEGER) AS n_over25,
        |  round(list_aggregate(arr[1:3], 'sum'), 2) AS top3_sum,
        |  len(list_filter(arr, x -> x > 49)) > 0 AS has_49plus,
        |  len(list_filter(arr, x -> NOT (x > 0))) = 0 AS all_positive,
        |  list_contains(arr, 1.0) AS has_one
        |FROM g ORDER BY l_returnflag""".stripMargin,
    "q36_map_struct_fns" ->
      """SELECT n_nationkey,
        |  CAST(n_regionkey AS BIGINT) AS rk_val,
        |  CAST(7 AS BIGINT) AS x_val,
        |  CAST(n_nationkey AS BIGINT) AS nk_roundtrip,
        |  CAST(n_nationkey * 10 AS BIGINT) AS nk_x10,
        |  'nk,rk,x' AS keys_sorted,
        |  CAST(3 AS INTEGER) AS n_vals,
        |  n_name AS struct_name,
        |  CAST(1 AS BIGINT) AS z_val
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q37_json_fns" ->
      """SELECT event_type,
        |  count(*) AS n,
        |  round(avg(k), 4) AS avg_k,
        |  min(k) AS min_k,
        |  max(k) AS max_k,
        |  CAST(sum(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_k_gt50,
        |  max(k_str) AS max_k_str
        |FROM (
        |  SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |    json_extract_string(props, '$.k') AS k_str
        |  FROM events
        |) GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the same nested document built from the same typed columns, probed
    // through DuckDB's JSON paths: arr[1] = 2k, a missing path is SQL
    // NULL on every row, and $.z is a JSON null (present, not missing)
    "q145_variant" ->
      """WITH v AS (
        |  SELECT event_type,
        |         CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |         '{"u":' || user_id || ',"et":"' || event_type ||
        |         '","arr":[' || json_extract_string(props, '$.k') ||
        |         ',' || 2 * CAST(json_extract_string(props, '$.k') AS INTEGER) ||
        |         '],"z":null}' AS doc
        |  FROM events)
        |SELECT event_type, count(*)::BIGINT AS n,
        |       sum(k)::BIGINT AS sum_k,
        |       sum(CAST(json_extract_string(doc, '$.arr[1]') AS BIGINT))::BIGINT AS sum_arr1,
        |       sum(CASE WHEN json_extract(doc, '$.nope') IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_missing,
        |       sum(CASE WHEN json_type(doc::JSON, '$.z') = 'NULL' THEN 1 ELSE 0 END)::BIGINT AS n_znull
        |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q38_hash_fns" ->
      """SELECT n_nationkey,
        |  md5(n_name) AS name_md5,
        |  sha256(n_name) AS name_sha256,
        |  substring(md5(n_name || '|salt'), 1, 8) AS salted_prefix,
        |  CAST(length(md5(n_name)) AS INTEGER) AS md5_len
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q39_conditional_cast" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice < 50000 THEN 'low'
        |       WHEN o_totalprice < 150000 THEN 'mid'
        |       ELSE 'high' END AS bucket,
        |  nullif(o_orderstatus, 'O') AS status_nulled,
        |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_filled,
        |  CAST(trunc(o_totalprice) AS INTEGER) AS price_int,
        |  CAST(o_totalprice AS VARCHAR) AS price_str,
        |  o_totalprice > 100000 AS is_big,
        |  CAST(o_custkey AS DOUBLE) AS cust_dbl
        |FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""".stripMargin
  )
}
