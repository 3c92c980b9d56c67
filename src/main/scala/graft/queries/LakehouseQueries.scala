package graft.queries

import graft.Tables
import graft.operators.{ChangeCapture, ZOrder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot-maintenance surface: CDC merge/diff (`operators/
  * ChangeCapture`) and multi-dimensional layout clustering
  * (`operators/ZOrder`) — the operations that keep a 100 TB corpus
  * LIVE. The reference emits an endless keyed stream
  * (`/root/reference/src/kafka_producer.cpp:36-57`); the materialized
  * consumer of that stream upserts each refresh (q136), recovers change
  * sets between snapshots for incremental downstream recompute (q137),
  * and rewrites cold data z-clustered so conjunctive range scans skip
  * files (q138).
  *
  * Fixture framing: `orders` < 1997-01-01 is the "base snapshot";
  * later orders are the insert stream; deterministic md5-slices of the
  * base are the update/delete sets (the same engine-identical md5-prefix
  * device q30/q80 use — no RNG crosses the engine boundary).
  */
object LakehouseQueries extends QueryModule {

  private val cutoff = "1997-01-01"

  /** Base snapshot: (o_orderkey, o_totalprice) before the cutoff. */
  private[graft] def baseSnap(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit(cutoff).cast("date"))
      .select(col("o_orderkey"), col("o_totalprice"))

  /** First md5 hex digit of the key — the deterministic op selector. */
  private def slot(k: org.apache.spark.sql.Column) =
    substring(md5(k.cast("string")), 1, 1)

  /** Change set: inserts = all post-cutoff orders; updates = base keys
    * with md5 slot 0-3 (price re-rounded); deletes = slots 4-5.
    * Derivation is ROW-LOCAL ([[changeRowsOf]]), so any disjoint
    * slicing of the order rows — in particular q238's micro-batches —
    * derives exactly this set chunk by chunk.
    */
  private def changeSet(spark: SparkSession, dir: String): DataFrame =
    changeRowsOf(Tables.orders(spark, dir))

  /** The per-row CDC derivation shared by [[changeSet]] and the
    * streaming apply (q238): each raw order row yields at most one
    * change row, decided only by its own columns — at most one op per
    * key corpus-wide (I keys post-cutoff; U/D keys pre-cutoff by
    * disjoint md5 slots), which is what makes chunked apply equal
    * one-shot apply.
    */
  private[graft] def changeRowsOf(rows: DataFrame): DataFrame = {
    val isBase = col("o_orderdate") < lit(cutoff).cast("date")
    val ins = rows.filter(!isBase)
      .select(col("o_orderkey"), col("o_totalprice"), lit("I").as("op"))
    val upd = rows.filter(isBase && slot(col("o_orderkey")).isin("0", "1", "2", "3"))
      .select(col("o_orderkey"), round(col("o_totalprice"), 0).as("o_totalprice"),
        lit("U").as("op"))
    val del = rows.filter(isBase && slot(col("o_orderkey")).isin("4", "5"))
      .select(col("o_orderkey"), col("o_totalprice"), lit("D").as("op"))
    ins.unionAll(upd).unionAll(del)
  }

  /** q136: MERGE INTO — apply the change set to the base snapshot and
    * emit the next snapshot row-for-row. One full-outer key join is the
    * whole plan (`ChangeCapture.merge`); at 100 TB the change side is
    * the small one and AQE broadcasts it.
    */
  def q136MergeSnapshot(spark: SparkSession, dir: String): DataFrame =
    ChangeCapture.merge(
      baseSnap(spark, dir), changeSet(spark, dir), "o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")

  /** q137: snapshot DIFF — recover the minimal change set between the
    * base and the merged snapshot. Updates whose re-rounded price equals
    * the original are correctly ABSENT (diff is minimal), which is the
    * semantic difference from q136's applied change set.
    */
  def q137SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val base = baseSnap(spark, dir)
    val next = ChangeCapture.merge(base, changeSet(spark, dir),
      "o_orderkey", "o_totalprice")
    ChangeCapture.diff(base, next, "o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** q138: z-order clustering key — the Morton interleave of the two
    * rank-grids, computed by `ZOrder.withZValueExactAtScale`: the
    * distributed census-rank device (distinct-value census →
    * quantile-bucketed partition-local cumulative → ≤P-row offset
    * window → broadcast join back), bit-identical to the oracle's
    * `percent_rank` chain with ZERO single-partition windows over the
    * fact input (plan-asserted in `PlanShapeSpec`; bit-equivalence to
    * the reference `withZValue` formulation spec-pinned in `ZOrderSpec`;
    * `clusterAtScale` stays the approximate-grid write path). The gate
    * certifies every bit of the interleave math both engines compute
    * from percent_rank.
    */
  def q138ZOrderKey(spark: SparkSession, dir: String): DataFrame =
    ZOrder.withZValueExactAtScale(
      Tables.events(spark, dir).select("event_id", "user_id", "value"),
      "user_id", "value")
      .select(col("event_id"), col("zval"))
      .orderBy("event_id")

  /** q242: TIME TRAVEL — `AS OF` snapshot reads over an upsert log
    * (the lakehouse versioned-read feature: every order is an upsert of
    * its customer's "latest order" record, versioned by event time; a
    * snapshot at date d is last-write-wins over all upserts ≤ d). Three
    * as-of dates sweep the log and each snapshot reports its active-key
    * census: keys, the integer-cents sum of latest values (the q223
    * exactness device), and the snapshot's last write.
    *
    * Determinism: last-write-wins is a lexicographic struct-max on
    * (event date, order key) — total order, no window; cents are exact
    * BIGINTs. Scale: the sweep multiplies rows ×3 BEFORE the key agg
    * (scan-local explode; at 100 TB one would instead partition the log
    * by date and prune per as-of — same semantics); per snapshot one
    * hash agg on the key, map-side partials, no global sort. The
    * struct-max formulation is itself the scale story: version
    * resolution never windows the log.
    */
  /** q391: SNAPSHOT EXPIRATION / VACUUM — the retention sweep every
    * lakehouse runs (Delta VACUUM / Iceberg expire_snapshots) over
    * q242's upsert log: at retention cutoff C, versions dated ≥ C stay
    * time-travelable, versions < C are EXPIRED except each key's
    * latest-before-C (which the snapshot AT C still references —
    * deleting it would corrupt the oldest retained snapshot). Two
    * cutoffs report the version/expired censuses AND the invariant
    * that matters: the CURRENT state reconstructed from the kept set
    * is bit-identical to the state from the full log (key count and
    * cents sum compared in-query).
    *
    * Determinism: retention membership is pure date arithmetic;
    * latest-before-C and current-state are lexicographic struct-max
    * on (date, okey) — total order, no window; sums are exact cents.
    * Scale: q242's discipline — the ×2 cutoff explode is scan-local,
    * each branch is one key-hash agg (struct-max, map-side partials);
    * the "files referenced by retained snapshots" reachability that a
    * real vacuum computes is exactly this latest-before-C set, done
    * as an aggregation instead of a manifest walk.
    */
  def q391SnapshotExpiry(spark: SparkSession, dir: String): DataFrame = {
    val cutoffs = typedlit(Seq("1995-06-01", "1997-06-01"))
    val v = Tables.orders(spark, dir)
      .select(col("o_custkey").as("cust"),
        col("o_orderdate").cast("date").as("d"), col("o_orderkey").as("ok"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
      .withColumn("cutoff_s", explode(cutoffs))
      .withColumn("cutoff", col("cutoff_s").cast("date")).drop("cutoff_s")
    val nVer = v.groupBy("cutoff").agg(count(lit(1)).as("n_versions"))
    val oldLatest = v.filter(col("d") < col("cutoff"))
      .groupBy("cutoff", "cust")
      .agg(max(struct(col("d"), col("ok"), col("cents"))).as("b"))
      .select(col("cutoff"), col("cust"), col("b.d").as("d"),
        col("b.ok").as("ok"), col("b.cents").as("cents"))
    val kept = v.filter(col("d") >= col("cutoff"))
      .select("cutoff", "cust", "d", "ok", "cents")
      .unionByName(oldLatest)
    val keptN = kept.groupBy("cutoff").agg(count(lit(1)).as("n_kept"))
    def state(df: DataFrame, nKeys: String, sumC: String): DataFrame =
      df.groupBy("cutoff", "cust")
        .agg(max(struct(col("d"), col("ok"), col("cents"))).as("b"))
        .groupBy("cutoff")
        .agg(count(lit(1)).as(nKeys), sum(col("b.cents")).as(sumC))
    val full = state(v, "n_keys", "sc_full")
    val fromKept = state(kept, "n_keys_kept", "sc_kept")
    nVer.join(keptN, "cutoff").join(full, "cutoff").join(fromKept, "cutoff")
      .selectExpr("cutoff", "n_versions", "n_kept",
        "n_versions - n_kept AS n_expired", "n_keys",
        "round(CAST(sc_full AS DOUBLE) / 100.0, 2) AS state_dollars",
        "n_keys = n_keys_kept AND sc_full = sc_kept AS state_preserved")
      .orderBy("cutoff")
  }

  def q242TimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val snaps = typedlit(Seq("1996-01-01", "1998-06-01", "2000-12-31"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
      .withColumn("as_of_s", explode(snaps))
      .withColumn("as_of", col("as_of_s").cast("date")).drop("as_of_s")
      .filter(col("o_orderdate") <= col("as_of"))
      .groupBy("as_of", "o_custkey")
      .agg(max(struct(col("o_orderdate"), col("o_orderkey"), col("cents"))).as("b"))
      .groupBy("as_of")
      .agg(count(lit(1)).as("n_keys"),
        round(sum(col("b.cents")) / 100.0, 2).as("sum_latest_price"),
        max(col("b.o_orderdate")).cast("date").as("last_write"))
      .orderBy("as_of")
  }

  /** q150: incremental MATERIALIZED-VIEW maintenance — the refresh path
    * of a stored per-key aggregate view under an insert-only delta
    * batch (the lakehouse MV pattern: never rescan the base, apply the
    * delta's PRE-AGGREGATED rows to the stored aggregates). The view is
    * (n, sum, min, max) per user; every one of those is insert-
    * maintainable (count/sum add, min/max take least/greatest — deletes
    * would break min/max, which is exactly why engines restrict
    * self-maintainable views to insert-only streams or keep auxiliary
    * state). The fixture's "stored" view is computed here from the
    * base partition (event_id ≢ 4 mod 5); the REFRESH itself — the part
    * that runs per batch at 100 TB — touches only the |users|-row view
    * and the delta's aggregate: one full-outer key join, the base fact
    * rows never re-read. The oracle is the full recompute over all
    * events: equality IS the maintenance-correctness invariant.
    */
  def q150MvMaintenance(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select("event_id", "user_id", "value")
    val isDelta = pmod(col("event_id"), lit(5)) === 4
    def agg(df: DataFrame): DataFrame = df.groupBy("user_id").agg(
      count(lit(1)).as("n"), sum("value").as("sv"),
      min("value").as("mn"), max("value").as("mx"))
    val baseMv = agg(ev.filter(!isDelta)) // at 100 TB: read from the stored MV
    val deltaAgg = agg(ev.filter(isDelta))
    baseMv.as("b").join(deltaAgg.as("d"), Seq("user_id"), "full_outer")
      .select(col("user_id"),
        (coalesce(col("b.n"), lit(0L)) + coalesce(col("d.n"), lit(0L))).as("n_events"),
        round(coalesce(col("b.sv"), lit(0.0)) + coalesce(col("d.sv"), lit(0.0)), 2)
          .as("sum_value"),
        round(least(coalesce(col("b.mn"), col("d.mn")),
          coalesce(col("d.mn"), col("b.mn"))), 2).as("min_value"),
        round(greatest(coalesce(col("b.mx"), col("d.mx")),
          coalesce(col("d.mx"), col("b.mx"))), 2).as("max_value"))
      .orderBy("user_id")
  }

  /** Simulated physical layout shared by q161/q163: "file" = first md5
    * hex digit of the order key (16 files, the q136 device) for q161's
    * position math; q163 clusters files by ingestion month instead —
    * the layout data skipping actually sees.
    */
  private def fileOf(k: org.apache.spark.sql.Column) = slot(k)

  /** q161: DELETION VECTORS — merge-on-read deletes. A DELETE statement
    * against an immutable-file table never rewrites data files; it
    * writes a tiny (file, position) bitmap sidecar, and every
    * subsequent scan subtracts the bitmap (Delta deletion vectors /
    * Iceberg positional delete files). Here the DELETE predicate is
    * `o_orderstatus = 'F' AND md5-slot(key) ∈ {0,1,2,3}`; positions are
    * the rank of the key within its file (per-file windows — bounded by
    * file size, never a global sort); the scan is base ⟕anti DV on
    * (file, pos). The DV side is orders-of-magnitude smaller than the
    * base, so AQE broadcasts it: merge-on-read costs one broadcast
    * anti-join instead of a file rewrite — that asymmetry is the whole
    * feature. Output: per-file surviving census (n rows, price sum),
    * which certifies both the position assignment and the subtraction.
    */
  def q161DeletionVectors(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("file_id").orderBy("o_orderkey")
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .withColumn("file_id", fileOf(col("o_orderkey")))
      .withColumn("pos", row_number().over(w))
    val dv = base.filter(col("o_orderstatus") === "F" &&
        slot(col("o_orderkey")).isin("0", "1", "2", "3"))
      .select("file_id", "pos")
    base.join(dv, Seq("file_id", "pos"), "left_anti")
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_live"),
        round(sum("o_totalprice"), 2).as("sum_price"))
      .orderBy("file_id")
  }

  /** q162: COMPACTION PLANNING — the small-file problem's fix (Iceberg
    * rewrite_data_files / Delta OPTIMIZE). Files = per-(lang, source)
    * document groups sized by their byte sums; within each table
    * partition (lang — compaction never merges across partitions), files
    * are ordered largest-first and packed sequentially into target-size
    * bins: bin = ⌊bytes-before / target⌋ (next-fit-decreasing with
    * overflow — a bin exceeds the target by at most one trailing file,
    * the same sequential approximation production planners use, because
    * optimal bin packing is NP-hard and pointless at planning
    * granularity). Everything is per-partition windows over a
    * file-count-sized input — the plan costs nothing next to the
    * rewrite it schedules. Output: the full file→bin assignment.
    */
  def q162CompactionPlan(spark: SparkSession, dir: String): DataFrame = {
    val target = 150000L
    val files = Tables.documents(spark, dir)
      .groupBy("lang", "source")
      .agg(sum(length(col("text"))).as("bytes"))
    val w = Window.partitionBy("lang")
      .orderBy(col("bytes").desc, col("source").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files
      .withColumn("bytes_before", sum("bytes").over(w) - col("bytes"))
      // floor, not cast: DuckDB casts round while Spark casts truncate —
      // floor() is the one spelling both engines agree on
      .withColumn("bin", floor(col("bytes_before") / target).cast("int"))
      .select("lang", "source", "bytes", "bin")
      .orderBy("lang", "source")
  }

  /** q163: DATA-SKIPPING STATS + pruning decision — the min/max footer
    * stats a lakehouse scan consults before opening any file. Files are
    * clustered by ingestion month (date_trunc — the clustering real
    * ingestion produces, and the reason date-range predicates skip);
    * per-file stats are one partial+final agg over the scan; the
    * pruning VERDICT for the probe predicate (price range ∧ date floor)
    * is pure interval arithmetic over the stats — a file is skipped iff
    * its [min,max] box cannot intersect the predicate. At 100 TB this
    * table IS the manifest: the decision runs over file-count rows,
    * never data rows, which is why a 1000-executor scan of a month-
    * predicate query opens 1/60th of the files. Output: per-file stats
    * + skip verdict (the engine-vs-oracle agreement certifies the
    * interval logic, not just the stats).
    */
  def q163SkippingStats(spark: SparkSession, dir: String): DataFrame = {
    val stats = Tables.orders(spark, dir)
      .withColumn("file_id", date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        round(min("o_totalprice"), 2).as("min_price"),
        round(max("o_totalprice"), 2).as("max_price"),
        min(col("o_orderdate").cast("date")).as("min_date"),
        max(col("o_orderdate").cast("date")).as("max_date"))
    // probe predicate: o_totalprice BETWEEN 100000 AND 200000
    //                  AND o_orderdate >= 1997-06-01
    stats.withColumn("can_skip",
        (col("max_price") < 100000 || col("min_price") > 200000 ||
          col("max_date") < lit("1997-06-01").cast("date")).cast("int"))
      .orderBy("file_id")
  }

  /** q253: RANGE-PARTITION PLANNER — the boundary computation behind
    * `repartitionByRange`/range-bucketed table layout at 100 TB, made
    * deterministic: instead of Spark's sampled `RangePartitioner`, plan
    * P = 8 partition boundaries for `o_totalprice` from the q247
    * fixed-grid histogram (m = 1024 bins, one scan, integer counts
    * mergeable by plain addition), boundary i = first bin where the
    * cumulative count reaches ⌈i·N/P⌉. Report per planned partition:
    * bin-edge value range, exact row count, share, and skew ratio vs
    * the ideal N/P — the balance audit that tells you whether the
    * layout needs salting before you pay the write.
    *
    * Determinism: bins and targets are exact integer arithmetic
    * (`(i·N + 7) div 8` — never a float ceil); edges descale off the
    * grid with mirrored association; round 4/6 at output. Scale: one
    * scan → 1024-row census; the cumulative window runs over the census
    * (agg-bounded — PlanGuards admissible); boundaries ride a 1-row
    * sorted-array broadcast back onto the census. The data itself is
    * never sorted — that's the point.
    */
  def q253RangePlanner(spark: SparkSession, dir: String): DataFrame = {
    val m = 1024
    val P = 8
    val vals = Tables.orders(spark, dir)
      .select(col("o_totalprice").as("v")).filter(col("v").isNotNull)
    val stats = vals.agg(min("v").as("vmin"), max("v").as("vmax"),
      count(lit(1)).as("n")).localCheckpoint()
    // the census window sits DIRECTLY over the 1024-row aggregate (the
    // PlanGuards bound); the checkpoint lands after it, so both
    // consumers (boundaries, assignment) reuse one scan
    val hist = vals.crossJoin(broadcast(stats))
      .withColumn("bucket", least(
        floor((col("v") - col("vmin")) / (col("vmax") - col("vmin")) * m),
        lit((m - 1).toLong)).cast("long"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(Window.orderBy("bucket")))
      .localCheckpoint()
    val bndArr = hist
      .crossJoin(broadcast(stats.select(col("n"))))
      .select(col("bucket"), col("cum"), col("n"),
        explode(typedlit((1 to (P - 1)).map(_.toLong))).as("i"))
      .filter(col("cum") >= expr(s"(i * n + ${P - 1}) div $P"))
      .groupBy("i").agg(min("bucket").as("b"))
      .agg(sort_array(collect_list("b")).as("bs"))
    hist.crossJoin(broadcast(bndArr))
      .withColumn("pid", expr("size(filter(bs, x -> bucket >= x))").cast("long"))
      .groupBy("pid")
      .agg(sum("c").as("n_rows"), min("bucket").as("min_b"), max("bucket").as("max_b"))
      .crossJoin(broadcast(stats))
      .select(col("pid"),
        round(col("vmin") + (col("min_b") * (col("vmax") - col("vmin"))) / lit(1024.0), 4)
          .as("lo_edge"),
        round(col("vmin") + ((col("max_b") + 1L) * (col("vmax") - col("vmin"))) / lit(1024.0), 4)
          .as("hi_edge"),
        col("n_rows"),
        round(col("n_rows").cast("double") / col("n"), 6).as("frac"),
        round(col("n_rows").cast("double") * P / col("n"), 6).as("skew"))
      .orderBy("pid")
  }

  /** q281: DYNAMIC PARTITION OVERWRITE — the backfill/restatement
    * write path (q136 merges rows, q242 reads as-of; this one
    * RESTATES a whole partition in place, the daily-pipeline repair
    * primitive): the events table is written partitioned by day, then
    * ONE day (the earliest) is rewritten with corrected values
    * (cents × 2) under `partitionOverwriteMode=dynamic` — only the
    * partitions PRESENT IN THE WRITE are replaced, every other day's
    * files are untouched. The read-back census is gated against the
    * blind restatement (CASE on the min day): static mode (the
    * default — which would wipe the whole table) or an unreplaced
    * partition both break equality.
    *
    * Determinism: exact cents everywhere; the restated day is derived
    * (min day), not a constant. Scale: THE point of dynamic mode — a
    * backfill touches O(partition), not O(table); conf is scoped and
    * restored in a finally.
    */
  def q281DynamicPartitionOverwrite(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      expr("unix_micros(ts) div 86400000000").as("day"),
      col("event_id"), col("event_type"),
      floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
    val root = java.nio.file.Files.createTempDirectory("q281_dpo")
    val tbl = root.resolve("tbl").toString
    ev.write.partitionBy("day").mode("overwrite").parquet(tbl)
    val minDay = ev.agg(min("day").as("mind"))
    val restated = ev.crossJoin(broadcast(minDay))
      .filter(col("day") === col("mind")).drop("mind")
      .withColumn("cents", col("cents") * 2)
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try restated.write.partitionBy("day").mode("overwrite").parquet(tbl)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
    spark.read.parquet(tbl)
      .groupBy("day").agg(count(lit(1)).as("n"),
        round(sum("cents") / 100.0, 2).as("sum_value"),
        sum("event_id").as("id_sum"))
      .orderBy("day")
  }

  /** Shared by q287 and its plan spec: write both fact sides as
    * BUCKETED tables (8 buckets on the join key, sorted within
    * buckets) and join them under an explicit merge hint. With
    * matching bucket counts both scans report
    * `HashPartitioning(key, 8)`, so the sort-merge join plans with
    * ZERO shuffle exchange — the co-located join layout
    * (`PlanShapeSpec` asserts the exchange-free plan; the remaining
    * sorts are partition-local merge preludes — modern Spark hides
    * in-bucket order from the scan since multi-file buckets can't
    * guarantee it, so only the shuffle is elided, which is the cost
    * that matters at 100 TB).
    * Table names carry a dir tag so sf0.001 spec runs and sf0.01
    * verify runs never collide in the shared warehouse.
    */
  /** Write (idempotently) and name the two bucketed tables shared by
    * q287 (co-located join) and q298 (exchange-free aggregation).
    */
  private[graft] def ensureBucketedTables(
      spark: SparkSession, dir: String): (String, String) = {
    // the tag carries BOTH the sf dir (sf0.001 spec runs and sf0.01
    // verify runs must not collide) AND the application id — two
    // concurrent sessions sharing /tmp/graft-warehouse must never
    // recursive-delete each other's in-use table files mid-query
    val tag = java.lang.Integer.toHexString(
      (dir + "|" + spark.sparkContext.applicationId).hashCode)
    val to = s"q287_orders_$tag"
    val tl = s"q287_lineitem_$tag"
    // a fresh session's in-memory catalog forgets the tables but the
    // warehouse dirs persist — clear both (DROP for the catalog entry,
    // recursive delete for the orphaned location) so the write is
    // idempotent across calls. The location is resolved as a URI, not
    // by string-stripping the conf: `file://tmp/...` would survive a
    // bare stripPrefix("file:") as a `//`-prefixed path.
    val warehouse = {
      val raw = spark.conf.get("spark.sql.warehouse.dir")
      val uri = new java.net.URI(raw)
      if (uri.getScheme == null) raw else java.nio.file.Paths.get(uri).toString
    }
    Seq(to, tl).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get(warehouse, t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(java.nio.file.Files.delete)
      }
    }
    // repartition on the bucket key before the write so each bucket
    // lands as one file (no small-file confetti from 32 writer tasks)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("price_cents"))
      .repartition(8, col("o_orderkey"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(to)
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("ext_cents"))
      .repartition(8, col("l_orderkey"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(tl)
    (to, tl)
  }

  def q287BucketedCore(spark: SparkSession, dir: String): DataFrame = {
    val (to, tl) = ensureBucketedTables(spark, dir)
    spark.table(to).hint("merge")
      .join(spark.table(tl), col("o_orderkey") === col("l_orderkey"))
  }

  /** The q298 core (also plan-asserted in `PlanShapeSpec`): a keyed
    * aggregation whose grouping key IS the bucket key consumes the
    * table's `HashPartitioning` directly — the partial/final split
    * collapses to one exchange-FREE final aggregate per bucket.
    */
  def q298BucketedAggCore(spark: SparkSession, dir: String): DataFrame = {
    val (_, tl) = ensureBucketedTables(spark, dir)
    spark.table(tl).groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_lines"), sum("ext_cents").as("cents"),
        sum("qty").as("qty"))
  }

  /** q298: EXCHANGE-FREE aggregation on the bucketed layout — the
    * second dividend of q287's one-time bucketing investment (the
    * first was the shuffle-free join): `groupBy` on the bucket key
    * aggregates each bucket in place, no exchange, no partial/final
    * split — the recurring per-order rollup a 100 TB order store runs
    * hourly. Gated as the per-cohort census of the per-order rollup
    * (any misrouted or double-counted bucket row shifts a cohort).
    *
    * Determinism: exact cents/counts. Scale: the ONLY exchange in the
    * whole plan is the 16-row cohort census; `PlanShapeSpec` pins the
    * zero-exchange keyed aggregate.
    */
  def q298BucketedAgg(spark: SparkSession, dir: String): DataFrame = {
    q298BucketedAggCore(spark, dir)
      .groupBy(pmod(col("l_orderkey"), lit(16L)).as("cohort"))
      .agg(count(lit(1)).as("n_orders"), sum("n_lines").as("n_lines"),
        round(sum(col("cents")) / 100.0, 2).as("sum_ext"),
        sum("qty").as("total_qty"))
      .orderBy("cohort")
  }

  /** q287: BUCKETED-TABLE co-located join — the storage-layout answer
    * to the shuffle (q138 clusters for SKIPPING; this clusters for
    * JOINS): both fact tables land bucketed by the join key, so the
    * recurring orders⨝lineitem join runs with no exchange
    * on EVERY subsequent query — the amortize-the-shuffle-once
    * primitive a 100 TB star schema is built on. The gated census
    * aggregates the joined rows per customer cohort; the oracle
    * replays the join from the raw tables, so a bucket-misrouted row
    * (wrong hash, dropped bucket) breaks equality.
    *
    * Determinism: cents are exact; counts/sums BIGINT. Scale: the
    * ONLY shuffle in the plan is the final 16-row cohort agg;
    * `PlanShapeSpec` pins zero exchange/sort under the join.
    */
  def q287BucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    q287BucketedCore(spark, dir)
      .groupBy((col("o_custkey") % 16).as("cohort"))
      .agg(count(lit(1)).as("n"),
        sum(col("qty")).as("total_qty"),
        round(sum(col("ext_cents")) / 100.0, 2).as("sum_ext"))
      .orderBy("cohort")
  }

  /** q303: RANGE-CHECKSUM anti-entropy diff — the replica-reconciliation
    * primitive (q137 diffs SNAPSHOTS row-by-row; two 100 TB replicas
    * can't afford that — they compare per-range digests and resync
    * only the buckets that disagree, the Merkle/DynamoDB device): the
    * orders table vs a drifted replica (md5-slot 'f' rows carry a
    * silent +1-cent corruption, slot '0' rows are lost writes),
    * digested per 1000-key range as (count, bit_xor of row hashes),
    * reporting exactly the buckets needing resync with the failure
    * class (count drift = loss, hash-only drift = corruption).
    *
    * Determinism: row hash is the 60-bit md5 device over
    * (key, cents); bit_xor and count are order-invariant. Scale: each
    * replica reduces to digest rows ≤ keyspace/1000 — the comparison
    * shuffles DIGESTS, never rows; resync cost is O(bad buckets).
    */
  def q303RangeChecksums(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir).select(col("o_orderkey"),
      floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
    val slot = substring(md5(col("o_orderkey").cast("string")), 1, 1)
    val replica = base.filter(slot =!= "0")
      .withColumn("cents",
        when(slot === "f", col("cents") + 1L).otherwise(col("cents")))
    def digests(df: DataFrame, nc: String, xc: String): DataFrame = df
      .withColumn("rh", conv(substring(md5(concat(
        col("o_orderkey").cast("string"), lit(":"), col("cents").cast("string"))),
        1, 15), 16, 10).cast("long"))
      .groupBy(expr("o_orderkey div 1000").as("bucket"))
      .agg(count(lit(1)).as(nc), expr("bit_xor(rh)").as(xc))
    digests(base, "n_a", "x_a")
      .join(digests(replica, "n_b", "x_b"), Seq("bucket"), "full")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        when(coalesce(col("n_a"), lit(0L)) =!= coalesce(col("n_b"), lit(0L)), 1L)
          .otherwise(0L).as("count_drift"),
        when(coalesce(col("n_a"), lit(0L)) === coalesce(col("n_b"), lit(0L)) &&
          col("x_a") =!= col("x_b"), 1L).otherwise(0L).as("hash_drift"))
      .filter(col("count_drift") === 1L || col("hash_drift") === 1L)
      .orderBy("bucket")
  }

  /** q307: LATEST-WINS COMPACTION before merge — the CDC wrinkle q136
    * cannot hit (its change set carries ≤1 op per key BY CONSTRUCTION;
    * a real CDC batch carries the key's whole version HISTORY, and
    * MERGE semantics require a unique source key — so every real
    * loader compacts first): a versioned multi-op batch (key =
    * l_orderkey, version = l_linenumber, op from the md5 slot of
    * (key, version) — U on '0'-'9', D on 'a'-'c', no-op otherwise)
    * compacts to each key's HIGHEST-version op via one struct-max,
    * then upserts/deletes against the orders snapshot. Gated as the
    * post-merge cohort census plus per-cohort applied-op counts — an
    * uncompacted (first-wins, or multi-apply) loader shifts both.
    *
    * Determinism: versions are unique per key so the struct-max is
    * total; cents exact. Scale: compaction is ONE keyed agg (the
    * shuffle already required by the merge join); merge stays the
    * q136 single full-outer join.
    */
  def q307CompactedMerge(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("k"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
    val versioned = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("k"), col("l_linenumber").cast("long").as("ver"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("nc"))
      .withColumn("slot", substring(md5(concat(
        col("k").cast("string"), lit(":"), col("ver").cast("string"))), 1, 1))
      .withColumn("op",
        when(col("slot").rlike("^[0-9]$"), "U")
          .when(col("slot").isin("a", "b", "c"), "D"))
      .filter(col("op").isNotNull)
    val compacted = versioned.groupBy("k")
      .agg(max(struct(col("ver"), col("op"), col("nc"))).as("b"))
      .select(col("k"), col("b.op").as("op"), col("b.nc").as("nc"))
    val merged = base.join(compacted, Seq("k"), "full")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col("k"),
        when(col("op") === "U", col("nc")).otherwise(col("cents")).as("cents"),
        col("op"))
    merged.groupBy(pmod(col("k"), lit(16L)).as("cohort"))
      .agg(count(lit(1)).as("n_keys"),
        round(sum("cents") / 100.0, 2).as("sum_value"),
        sum(when(col("op") === "U", 1L).otherwise(0L)).as("n_updated"))
      .orderBy("cohort")
  }

  /** q320: SCHEMA EVOLUTION — the additive-column migration every
    * long-lived lakehouse table goes through (a new writer starts
    * emitting `disc_ppm`; years of old files don't have it; readers
    * must see ONE table): generation 0 (l_linenumber ≤ 3) is written
    * WITHOUT the column, generation 1 (l_linenumber > 3) WITH it, and
    * the table is read back under `mergeSchema` — old rows surface the
    * new column as NULL, backfilled here with the declared default −1.
    * The gate is the per-(returnflag, generation) census: row counts,
    * exact cents, and the summed backfilled discount — a reader that
    * dropped the column for old files, defaulted it to 0, or failed
    * to union the footers all diverge.
    *
    * Determinism: exact integer cents/ppm; generation derived from the
    * line number, not file order. Scale: mergeSchema costs one footer
    * read per file at planning (Spark samples footers in parallel);
    * the data path is identical to a plain scan — this is precisely
    * how additive evolution stays O(metadata), with the oracle pinning
    * that NULL-vs-0 for pre-migration rows is preserved, the semantic
    * data-warehouse migrations most often silently break.
    */
  def q320SchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
      floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("price_cents"),
      floor(col("l_discount") * 1000000.0 + 0.5).cast("long").as("disc_ppm"))
    val root = java.nio.file.Files.createTempDirectory("q320_evo")
    val tbl = root.resolve("tbl").toString
    li.filter(col("l_linenumber") <= 3)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "price_cents")
      .write.mode("overwrite").parquet(s"$tbl/g=0")
    li.filter(col("l_linenumber") > 3)
      .write.mode("overwrite").parquet(s"$tbl/g=1")
    spark.read.option("mergeSchema", "true").parquet(tbl)
      .groupBy("l_returnflag", "g")
      .agg(count(lit(1)).as("n"),
        sum("price_cents").as("price_cents_sum"),
        sum(when(col("disc_ppm").isNull, 1L).otherwise(0L)).as("n_premigration"),
        sum(coalesce(col("disc_ppm"), lit(-1L))).as("disc_ppm_backfilled"))
      .orderBy("l_returnflag", "g")
  }

  /** q351: MALFORMED-RECORD handling modes — the ingest-robustness
    * contract (real feeds ship broken rows; the reader's mode decides
    * whether they surface, vanish, or abort, and a pipeline that
    * can't account for every dropped row fails audit): a CSV written
    * with a deliberately corrupt numeric on every doc_id % 7 = 0 row,
    * read back under PERMISSIVE (corrupt rows surface with the raw
    * line in `_corrupt_record` and NULL fields) and DROPMALFORMED
    * (they vanish) — the gate reconciles n_total = n_good + n_corrupt
    * and pins that DROPMALFORMED's count equals PERMISSIVE's good
    * count, with the good-row payload sum exact.
    *
    * Determinism: corruption is a pure doc_id predicate; all outputs
    * are integer censuses of the same rows. Scale: mode handling is
    * scan-local — no shape change at any size; the reconciliation is
    * the cheap audit every ingest job should emit.
    */
  def q351MalformedCsv(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("q351_csv")
    val path = root.resolve("docs_csv").toString
    Tables.documents(spark, dir)
      .select(col("doc_id").cast("string").as("c0"),
        when(col("doc_id") % 7 === 0, concat(lit("x"), col("n_chars")))
          .otherwise(col("n_chars").cast("string")).as("c1"))
      .write.mode("overwrite").option("header", "false").csv(path)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType),
      StructField("_corrupt_record", StringType)))
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path).cache()
    val dropped = spark.read
      .schema(StructType(schema.fields.take(2)))
      .option("mode", "DROPMALFORMED").csv(path)
    val p = permissive.agg(
      count(lit(1)).as("n_total"),
      sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L)).as("n_good"),
      sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L)).as("n_corrupt"),
      sum(when(col("_corrupt_record").isNull, col("n_chars")).otherwise(0L))
        .as("good_chars_sum"))
    // count(*) alone would prune every column and DROPMALFORMED would
    // detect nothing (malformed-ness is only discovered while parsing
    // a required column) — aggregating the payload forces the parse,
    // which is itself part of the contract this row pins
    val d = dropped.agg(count(lit(1)).as("drop_mode_count"),
      sum("n_chars").as("drop_chars_sum"))
    p.crossJoin(broadcast(d))
      .select(col("n_total"), col("n_good"), col("n_corrupt"),
        col("good_chars_sum"), col("drop_mode_count"), col("drop_chars_sum"),
        (col("n_good") === col("drop_mode_count") &&
          col("good_chars_sum") === col("drop_chars_sum") &&
          col("n_total") === col("n_good") + col("n_corrupt"))
          .cast("long").as("reconciled"))
  }

  /** q352: COMPRESSION-CODEC roundtrip matrix — the storage-layer
    * contract (a lakehouse mixes codecs across files and table
    * generations; every codec hop must be lossless and every reader
    * must handle every codec): the same lineitem slice written as
    * parquet under snappy, gzip, and zstd, each read back and
    * reduced to the identical exact census.
    *
    * Determinism: the census (rows, exact cents, key checksum) is
    * codec-invariant by definition — any divergence is a storage bug.
    * Scale: codec choice is a scan/write-local concern (zstd ≈ gzip
    * ratio at snappy-ish speed is why it's the modern default); the
    * gate proves the engine's whole codec matrix, which is what lets
    * a 100 TB table migrate codecs file-by-file in place.
    */
  def q352CodecRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("q352_codec")
    val slice = Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("cents"))
    Seq("snappy", "gzip", "zstd").map { codec =>
      val path = root.resolve(codec).toString
      slice.write.mode("overwrite").option("compression", codec).parquet(path)
      spark.read.parquet(path).agg(
          count(lit(1)).as("n"),
          sum("cents").as("cents_sum"),
          sum(col("l_orderkey") * col("l_linenumber")).as("key_checksum"))
        .select(lit(codec).as("codec"), col("n"), col("cents_sum"),
          col("key_checksum"))
    }.reduce(_ unionByName _).orderBy("codec")
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q391_snapshot_expiry" -> (q391SnapshotExpiry _),
    "q351_malformed_csv" -> (q351MalformedCsv _),
    "q352_codec_roundtrip" -> (q352CodecRoundtrip _),
    "q320_schema_evolution" -> (q320SchemaEvolution _),
    "q287_bucketed_join" -> (q287BucketedJoin _),
    "q298_bucketed_agg" -> (q298BucketedAgg _),
    "q303_range_checksums" -> (q303RangeChecksums _),
    "q307_compacted_merge" -> (q307CompactedMerge _),
    "q281_dynamic_partition_overwrite" -> (q281DynamicPartitionOverwrite _),
    "q253_range_planner" -> (q253RangePlanner _),
    "q136_merge_snapshot" -> (q136MergeSnapshot _),
    "q137_snapshot_diff" -> (q137SnapshotDiff _),
    "q138_zorder_key" -> (q138ZOrderKey _),
    "q150_mv_maintenance" -> (q150MvMaintenance _),
    "q242_time_travel" -> (q242TimeTravel _),
    "q161_deletion_vectors" -> (q161DeletionVectors _),
    "q162_compaction_plan" -> (q162CompactionPlan _),
    "q163_skipping_stats" -> (q163SkippingStats _)
  )

  /** Shared oracle CTEs: base snapshot + change set + merged snapshot.
    * Also the oracle base of the STREAMING apply (q238), which must
    * converge to the identical snapshot. */
  private[graft] val oracleMergeCtes: String =
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_totalprice AS v FROM orders
      |  WHERE o_orderdate < DATE '1997-01-01'),
      |chg AS (
      |  SELECT o_orderkey AS k, o_totalprice AS v, 'I' AS op FROM orders
      |  WHERE o_orderdate >= DATE '1997-01-01'
      |  UNION ALL
      |  SELECT k, round(v, 0), 'U' FROM base
      |  WHERE substring(md5(CAST(k AS VARCHAR)), 1, 1) IN ('0','1','2','3')
      |  UNION ALL
      |  SELECT k, v, 'D' FROM base
      |  WHERE substring(md5(CAST(k AS VARCHAR)), 1, 1) IN ('4','5')),
      |m AS (
      |  SELECT coalesce(b.k, c.k) AS k,
      |         CASE WHEN c.op IS NOT NULL THEN c.v ELSE b.v END AS v
      |  FROM base b FULL OUTER JOIN chg c ON b.k = c.k
      |  WHERE c.op IS NULL OR c.op <> 'D')""".stripMargin

  override val oracles: Map[String, String] = Map(
    // the corruption restated logically: corrupt iff doc_id % 7 = 0;
    // the reader modes must reproduce this census exactly
    "q351_malformed_csv" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |         CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS corrupt
        |  FROM documents)
        |SELECT count(*)::BIGINT AS n_total,
        |       sum(1 - corrupt)::BIGINT AS n_good,
        |       sum(corrupt)::BIGINT AS n_corrupt,
        |       sum(CASE WHEN corrupt = 0 THEN n_chars ELSE 0 END)::BIGINT
        |         AS good_chars_sum,
        |       sum(1 - corrupt)::BIGINT AS drop_mode_count,
        |       sum(CASE WHEN corrupt = 0 THEN n_chars ELSE 0 END)::BIGINT
        |         AS drop_chars_sum,
        |       1::BIGINT AS reconciled
        |FROM d""".stripMargin,
    // one census, three codec rows — lossless by definition
    "q352_codec_roundtrip" ->
      """WITH base AS (
        |  SELECT count(*)::BIGINT AS n,
        |         sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))::BIGINT
        |           AS cents_sum,
        |         sum(l_orderkey * l_linenumber)::BIGINT AS key_checksum
        |  FROM lineitem)
        |SELECT codec, n, cents_sum, key_checksum
        |FROM base, (SELECT unnest(['gzip', 'snappy', 'zstd']) AS codec)
        |ORDER BY codec""".stripMargin,
    // the migration restated logically: generation from the line
    // number, pre-migration rows' disc_ppm NULL — mergeSchema's footer
    // union and NULL surfacing must reproduce this census exactly
    "q320_schema_evolution" ->
      """WITH li AS (
        |  SELECT l_returnflag,
        |         CASE WHEN l_linenumber <= 3 THEN 0 ELSE 1 END AS g,
        |         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS price_cents,
        |         CASE WHEN l_linenumber <= 3 THEN NULL
        |              ELSE CAST(floor(l_discount * 1000000.0 + 0.5) AS BIGINT)
        |         END AS disc_ppm
        |  FROM lineitem)
        |SELECT l_returnflag, g, count(*)::BIGINT AS n,
        |       sum(price_cents)::BIGINT AS price_cents_sum,
        |       sum(CASE WHEN disc_ppm IS NULL THEN 1 ELSE 0 END)::BIGINT
        |         AS n_premigration,
        |       sum(coalesce(disc_ppm, -1))::BIGINT AS disc_ppm_backfilled
        |FROM li
        |GROUP BY l_returnflag, g
        |ORDER BY l_returnflag, g""".stripMargin,
    // same versioned op derivation, same highest-version struct-max
    // compaction, same upsert/delete apply, same cohort census
    "q307_compacted_merge" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |versioned AS (
        |  SELECT l_orderkey AS k, l_linenumber::BIGINT AS ver,
        |         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS nc,
        |         substr(md5(l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR), 1, 1) AS slot
        |  FROM lineitem),
        |ops AS (
        |  SELECT k, ver, nc,
        |         CASE WHEN slot BETWEEN '0' AND '9' THEN 'U'
        |              WHEN slot IN ('a', 'b', 'c') THEN 'D' END AS op
        |  FROM versioned
        |  WHERE slot BETWEEN '0' AND '9' OR slot IN ('a', 'b', 'c')),
        |compacted AS (
        |  SELECT k,
        |         (max(struct_pack(ver := ver, op := op, nc := nc))).op AS op,
        |         (max(struct_pack(ver := ver, op := op, nc := nc))).nc AS nc
        |  FROM ops GROUP BY k),
        |merged AS (
        |  SELECT coalesce(b.k, c.k) AS k,
        |         CASE WHEN c.op = 'U' THEN c.nc ELSE b.cents END AS cents, c.op
        |  FROM base b FULL JOIN compacted c ON b.k = c.k
        |  WHERE c.op IS NULL OR c.op <> 'D')
        |SELECT ((k % 16) + 16) % 16 AS cohort, count(*)::BIGINT AS n_keys,
        |       round(sum(cents) / 100.0, 2) + 0.0 AS sum_value,
        |       sum(CASE WHEN op = 'U' THEN 1 ELSE 0 END)::BIGINT AS n_updated
        |FROM merged
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    // same drift injection, same 60-bit row hashes, same per-range
    // (count, bit_xor) digests, same full-outer disagreement report
    "q303_range_checksums" ->
      """WITH base AS (
        |  SELECT o_orderkey,
        |         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |replica AS (
        |  SELECT o_orderkey,
        |         CASE WHEN substr(md5(o_orderkey::VARCHAR), 1, 1) = 'f'
        |              THEN cents + 1 ELSE cents END AS cents
        |  FROM base
        |  WHERE substr(md5(o_orderkey::VARCHAR), 1, 1) <> '0'),
        |da AS (
        |  SELECT o_orderkey // 1000 AS bucket, count(*)::BIGINT AS n_a,
        |         bit_xor(('0x' || substr(md5(o_orderkey::VARCHAR || ':' || cents::VARCHAR), 1, 15))::BIGINT) AS x_a
        |  FROM base GROUP BY 1),
        |db AS (
        |  SELECT o_orderkey // 1000 AS bucket, count(*)::BIGINT AS n_b,
        |         bit_xor(('0x' || substr(md5(o_orderkey::VARCHAR || ':' || cents::VARCHAR), 1, 15))::BIGINT) AS x_b
        |  FROM replica GROUP BY 1)
        |SELECT bucket, coalesce(n_a, 0)::BIGINT AS n_a, coalesce(n_b, 0)::BIGINT AS n_b,
        |       (CASE WHEN coalesce(n_a, 0) <> coalesce(n_b, 0) THEN 1 ELSE 0 END)::BIGINT AS count_drift,
        |       (CASE WHEN coalesce(n_a, 0) = coalesce(n_b, 0) AND x_a <> x_b
        |             THEN 1 ELSE 0 END)::BIGINT AS hash_drift
        |FROM da FULL JOIN db USING (bucket)
        |WHERE coalesce(n_a, 0) <> coalesce(n_b, 0)
        |   OR (coalesce(n_a, 0) = coalesce(n_b, 0) AND x_a <> x_b)
        |ORDER BY bucket""".stripMargin,
    // the per-order rollup replayed from the raw table — bucket
    // misrouting or double-apply shifts a cohort
    "q298_bucketed_agg" ->
      """WITH per_order AS (
        |  SELECT l_orderkey, count(*)::BIGINT AS n_lines,
        |         sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))::BIGINT AS cents,
        |         sum(CAST(l_quantity AS BIGINT))::BIGINT AS qty
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT ((l_orderkey % 16) + 16) % 16 AS cohort, count(*)::BIGINT AS n_orders,
        |       sum(n_lines)::BIGINT AS n_lines,
        |       round(sum(cents) / 100.0, 2) + 0.0 AS sum_ext,
        |       sum(qty)::BIGINT AS total_qty
        |FROM per_order
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    // the join replayed from the raw tables — a bucket-misrouted or
    // dropped row breaks the cohort census
    "q287_bucketed_join" ->
      """SELECT o_custkey % 16 AS cohort, count(*)::BIGINT AS n,
        |       sum(CAST(l_quantity AS BIGINT))::BIGINT AS total_qty,
        |       round(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
        |             / 100.0, 2) + 0.0 AS sum_ext
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    // the restatement stated blindly: the min day carries doubled
    // cents, every other partition must be byte-identical to v1
    "q281_dynamic_partition_overwrite" ->
      """WITH ev AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, event_id, event_type,
        |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |m AS (SELECT min(day) AS mind FROM ev)
        |SELECT day, count(*)::BIGINT AS n,
        |       round(sum(CASE WHEN day = mind THEN cents * 2 ELSE cents END)
        |             / 100.0, 2) + 0.0 AS sum_value,
        |       sum(event_id)::BIGINT AS id_sum
        |FROM ev CROSS JOIN m
        |GROUP BY day
        |ORDER BY day""".stripMargin,
    // same 1024-bin histogram, same integer ⌈i·N/8⌉ targets, same
    // sorted-boundary assignment, mirrored edge descaling
    "q253_range_planner" ->
      """WITH v AS (
        |  SELECT o_totalprice AS v FROM orders WHERE o_totalprice IS NOT NULL),
        |stats AS (
        |  SELECT min(v) AS vmin, max(v) AS vmax, count(*)::BIGINT AS n FROM v),
        |hist AS (
        |  SELECT CAST(least(floor((v - vmin) / (vmax - vmin) * 1024), 1023) AS BIGINT) AS bucket,
        |         count(*)::BIGINT AS c
        |  FROM v CROSS JOIN stats GROUP BY 1),
        |cum AS (
        |  SELECT bucket, c, sum(c) OVER (ORDER BY bucket)::BIGINT AS cum FROM hist),
        |bnd AS (
        |  SELECT i, min(bucket) AS b
        |  FROM cum CROSS JOIN stats
        |  CROSS JOIN (SELECT unnest([1,2,3,4,5,6,7]) AS i) t
        |  WHERE cum >= (i * n + 7) // 8
        |  GROUP BY i),
        |bs AS (SELECT list_sort(list(b)) AS bs FROM bnd),
        |parts AS (
        |  SELECT len(list_filter(bs, x -> bucket >= x))::BIGINT AS pid,
        |         sum(c)::BIGINT AS n_rows, min(bucket) AS min_b, max(bucket) AS max_b
        |  FROM hist CROSS JOIN bs GROUP BY 1)
        |SELECT pid,
        |       round(vmin + (min_b * (vmax - vmin)) / 1024.0, 4) + 0.0 AS lo_edge,
        |       round(vmin + ((max_b + 1) * (vmax - vmin)) / 1024.0, 4) + 0.0 AS hi_edge,
        |       n_rows,
        |       round(n_rows::DOUBLE / n, 6) + 0.0 AS frac,
        |       round(n_rows::DOUBLE * 8 / n, 6) + 0.0 AS skew
        |FROM parts CROSS JOIN stats ORDER BY pid""".stripMargin,
    // the full recompute — equality with the engine's base⊕delta
    // refresh IS the self-maintainability invariant
    "q150_mv_maintenance" ->
      """SELECT user_id, count(*)::BIGINT AS n_events,
        |       round(sum(value), 2) + 0.0 AS sum_value,
        |       round(min(value), 2) + 0.0 AS min_value,
        |       round(max(value), 2) + 0.0 AS max_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // same last-write-wins total order ((date, key) DESC), same cents
    "q391_snapshot_expiry" ->
      """WITH c(cutoff) AS (VALUES (DATE '1995-06-01'), (DATE '1997-06-01')),
        |v AS (
        |  SELECT c.cutoff, o_custkey AS cust, o_orderdate::DATE AS d,
        |         o_orderkey AS ok,
        |         floor(o_totalprice * 100.0 + 0.5)::BIGINT AS cents
        |  FROM orders CROSS JOIN c),
        |nver AS (SELECT cutoff, count(*)::BIGINT AS n_versions FROM v GROUP BY 1),
        |old_latest AS (
        |  SELECT cutoff, cust, d, ok, cents FROM v WHERE d < cutoff
        |  QUALIFY row_number() OVER (PARTITION BY cutoff, cust
        |    ORDER BY d DESC, ok DESC) = 1),
        |kept AS (
        |  SELECT cutoff, cust, d, ok, cents FROM v WHERE d >= cutoff
        |  UNION ALL SELECT * FROM old_latest),
        |keptn AS (SELECT cutoff, count(*)::BIGINT AS n_kept FROM kept GROUP BY 1),
        |full_state AS (
        |  SELECT cutoff, count(*)::BIGINT AS n_keys, sum(cents)::BIGINT AS sc_full
        |  FROM (SELECT cutoff, cust, cents FROM v
        |        QUALIFY row_number() OVER (PARTITION BY cutoff, cust
        |          ORDER BY d DESC, ok DESC) = 1)
        |  GROUP BY 1),
        |kept_state AS (
        |  SELECT cutoff, count(*)::BIGINT AS n_keys_kept,
        |         sum(cents)::BIGINT AS sc_kept
        |  FROM (SELECT cutoff, cust, cents FROM kept
        |        QUALIFY row_number() OVER (PARTITION BY cutoff, cust
        |          ORDER BY d DESC, ok DESC) = 1)
        |  GROUP BY 1)
        |SELECT n.cutoff, n.n_versions, k.n_kept,
        |       n.n_versions - k.n_kept AS n_expired, f.n_keys,
        |       round(f.sc_full::DOUBLE / 100.0, 2) + 0.0 AS state_dollars,
        |       f.n_keys = s.n_keys_kept AND f.sc_full = s.sc_kept
        |         AS state_preserved
        |FROM nver n JOIN keptn k USING (cutoff)
        |JOIN full_state f USING (cutoff) JOIN kept_state s USING (cutoff)
        |ORDER BY n.cutoff""".stripMargin,
    "q242_time_travel" ->
      """WITH s(as_of) AS (VALUES (DATE '1996-01-01'), (DATE '1998-06-01'), (DATE '2000-12-31')),
        |u AS (
        |  SELECT s.as_of, o_custkey, o_orderdate, o_orderkey,
        |         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM orders CROSS JOIN s
        |  WHERE o_orderdate <= s.as_of),
        |lw AS (
        |  SELECT as_of, o_custkey, o_orderdate, cents
        |  FROM u
        |  QUALIFY row_number() OVER (PARTITION BY as_of, o_custkey
        |    ORDER BY o_orderdate DESC, o_orderkey DESC) = 1)
        |SELECT as_of, count(*)::BIGINT AS n_keys,
        |       round(sum(cents) / 100.0, 2) + 0.0 AS sum_latest_price,
        |       CAST(max(o_orderdate) AS DATE) AS last_write
        |FROM lw GROUP BY as_of ORDER BY as_of""".stripMargin,
    "q136_merge_snapshot" -> (oracleMergeCtes +
      """
        |SELECT k AS o_orderkey, v AS o_totalprice FROM m ORDER BY k""".stripMargin),
    "q137_snapshot_diff" -> (oracleMergeCtes +
      """,
        |d AS (
        |  SELECT coalesce(b.k, m.k) AS k,
        |         CASE WHEN b.k IS NULL THEN 'I'
        |              WHEN m.k IS NULL THEN 'D'
        |              WHEN m.v <> b.v THEN 'U' END AS op,
        |         CASE WHEN m.k IS NULL THEN b.v ELSE m.v END AS v
        |  FROM base b FULL OUTER JOIN m ON b.k = m.k)
        |SELECT k AS o_orderkey, v AS o_totalprice, op FROM d
        |WHERE op IS NOT NULL ORDER BY k""".stripMargin),
    "q161_deletion_vectors" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice,
        |         substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) AS file_id
        |  FROM orders),
        |p AS (
        |  SELECT *, row_number() OVER (PARTITION BY file_id ORDER BY o_orderkey) AS pos
        |  FROM base),
        |dv AS (SELECT file_id, pos FROM p WHERE o_orderstatus = 'F'
        |       AND substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0','1','2','3')),
        |live AS (SELECT p.* FROM p ANTI JOIN dv USING (file_id, pos))
        |SELECT file_id, count(*)::BIGINT AS n_live,
        |       round(sum(o_totalprice), 2) + 0.0 AS sum_price
        |FROM live GROUP BY file_id ORDER BY file_id""".stripMargin,
    "q162_compaction_plan" ->
      """WITH f AS (
        |  SELECT lang, source, sum(length(text))::BIGINT AS bytes
        |  FROM documents GROUP BY lang, source),
        |w AS (
        |  SELECT lang, source, bytes,
        |         sum(bytes) OVER (PARTITION BY lang
        |                          ORDER BY bytes DESC, source ASC
        |                          ROWS UNBOUNDED PRECEDING) - bytes AS bytes_before
        |  FROM f)
        |SELECT lang, source, bytes,
        |       floor(bytes_before / 150000.0)::INT AS bin
        |FROM w ORDER BY lang, source""".stripMargin,
    "q163_skipping_stats" ->
      """WITH s AS (
        |  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS file_id,
        |         count(*)::BIGINT AS n_rows,
        |         round(min(o_totalprice), 2) + 0.0 AS min_price,
        |         round(max(o_totalprice), 2) + 0.0 AS max_price,
        |         min(CAST(o_orderdate AS DATE)) AS min_date,
        |         max(CAST(o_orderdate AS DATE)) AS max_date
        |  FROM orders GROUP BY 1)
        |SELECT s.*,
        |       (max_price < 100000 OR min_price > 200000
        |        OR max_date < DATE '1997-06-01')::INT AS can_skip
        |FROM s ORDER BY file_id""".stripMargin,
    "q138_zorder_key" ->
      """WITH g AS (
        |  SELECT event_id,
        |         CAST(floor(percent_rank() OVER (ORDER BY user_id) * 65535) AS BIGINT) AS a,
        |         CAST(floor(percent_rank() OVER (ORDER BY value) * 65535) AS BIGINT) AS b
        |  FROM events),
        |s1 AS (SELECT event_id, (a|(a<<8))&16711935 AS a, (b|(b<<8))&16711935 AS b FROM g),
        |s2 AS (SELECT event_id, (a|(a<<4))&252645135 AS a, (b|(b<<4))&252645135 AS b FROM s1),
        |s3 AS (SELECT event_id, (a|(a<<2))&858993459 AS a, (b|(b<<2))&858993459 AS b FROM s2),
        |s4 AS (SELECT event_id, (a|(a<<1))&1431655765 AS a, (b|(b<<1))&1431655765 AS b FROM s3)
        |SELECT event_id, a | (b<<1) AS zval FROM s4 ORDER BY event_id""".stripMargin
  )
}
