package graft

import graft.functions.SketchAggregators.{BottomKAggregator, GramAggregator, HeavyHitterAggregator}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The mergeable sketches behind q86/q88/q90, checked in both regimes:
  * exact (where the oracle gate also pins them) and lossy/approximate
  * (which only these specs can see).
  */
class SketchAggregatorsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- Misra–Gries heavy hitters -----------------------------------

  test("Misra–Gries is exact when capacity >= distinct keys, under any partitioning") {
    val data = (1L to 50L).flatMap(k => Seq.fill(k.toInt)(k)) // key k appears k times
    for (parts <- Seq(1, 3, 8)) {
      val df = spark.createDataset(data).repartition(parts).toDF("k")
      val hh = udaf(new HeavyHitterAggregator(64))
      val got = df.agg(hh($"k").as("items"))
        .select(explode($"items").as("kv"))
        .select($"kv._1".as("k"), $"kv._2".as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == (1L to 50L).map(k => k -> k).toMap,
        s"exact regime diverged at $parts partitions")
    }
  }

  test("Misra–Gries lossy regime honors the n/(capacity+1) undercount bound and keeps true heavy hitters") {
    // 10 heavy keys (1000 each) + 5000 singleton keys, capacity 50
    val heavy = (1L to 10L).flatMap(k => Seq.fill(1000)(k))
    val noise = (100L until 5100L)
    val data = heavy ++ noise
    val n = data.size.toLong
    val cap = 50
    val hh = udaf(new HeavyHitterAggregator(cap))
    val got = spark.createDataset(data).repartition(7).toDF("k")
      .agg(hh($"k").as("items"))
      .select(explode($"items").as("kv"))
      .select($"kv._1".as("k"), $"kv._2".as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bound = n / (cap + 1) // max undercount, and min true count to survive
    for (k <- 1L to 10L) {
      assert(got.contains(k), s"true heavy hitter $k (count 1000 > $bound) was dropped")
      val c = got(k)
      assert(c <= 1000L, s"overcount for $k: $c")
      assert(c >= 1000L - bound, s"undercount beyond bound for $k: $c < ${1000L - bound}")
    }
    assert(got.size <= cap, "buffer exceeded capacity")
  }

  // ---- bottom-k (KMV) ----------------------------------------------

  test("bottom-k keeps the k smallest distinct values regardless of partitioning") {
    val vals = (1 to 1000).map(i => (i % 313) / 313.0 + 0.001) // dups on purpose
    val expect = vals.distinct.sorted.take(8)
    for (parts <- Seq(1, 5)) {
      val bk = udaf(new BottomKAggregator(8))
      val got = spark.createDataset(vals).repartition(parts).toDF("u")
        .agg(bk($"u").as("mins")).collect()(0).getSeq[Double](0)
      assert(got == expect, s"bottom-8 diverged at $parts partitions")
    }
  }

  test("KMV estimate lands within 3x of truth on 10k uniform hashes") {
    // md5-normalized uniforms over 10k distinct ids, k = 64
    val k = 64
    val bk = udaf(new BottomKAggregator(k))
    val df = spark.range(10000)
      .select(((conv(substring(md5($"id".cast("string")), 1, 8), 16, 10)
        .cast("double") + 1d) / 4294967296.0d).as("u"))
    val mins = df.agg(bk($"u").as("m")).collect()(0).getSeq[Double](0)
    val est = (k - 1) / mins.last
    assert(est > 10000 / 3.0 && est < 10000 * 3.0,
      s"KMV estimate $est implausible for 10k distinct")
  }

  // ---- sketches under STREAMING aggregation ------------------------

  test("Misra-Gries folds across micro-batches in a streaming aggregation (exact regime)") {
    // the state store carries the sketch buffer between batches — the
    // shape a 100 TB feed rollup needs (bounded state per group, raw
    // rows never retained). Exact regime, so streaming == batch == truth.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val data = (1L to 40L).flatMap(k => Seq.fill(k.toInt)(k))
    val hh = udaf(new HeavyHitterAggregator(64))
    val mem = MemoryStream[Long]
    val name = s"hh_stream_${System.nanoTime()}"
    val q = mem.toDF().toDF("k")
      .agg(hh($"k").as("items"))
      .select(explode($"items").as("kv"))
      .select($"kv._1".as("k"), $"kv._2".as("c"))
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    try {
      data.grouped(137).foreach { chunk => mem.addData(chunk); q.processAllAvailable() }
      val got = spark.table(name).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == (1L to 40L).map(k => k -> k).toMap,
        s"streaming sketch diverged: $got")
    } finally q.stop()
  }

  // ---- grouped top-k heap ------------------------------------------

  test("TopKAggregator equals the sorted reference, ties broken by id, under any partitioning") {
    import graft.functions.SketchAggregators.{ScoredId, TopKAggregator}
    val rnd = new scala.util.Random(11)
    // duplicate values on purpose so the (v desc, id asc) tie-break runs
    val data = (1L to 500L).map(id => ScoredId((rnd.nextInt(40) + 1).toDouble, id))
    val expect = data.sortWith((a, b) => a.v > b.v || (a.v == b.v && a.id < b.id)).take(5)
    for (parts <- Seq(1, 4, 9)) {
      val tk = udaf(new TopKAggregator(5))
      val got = spark.createDataset(data).repartition(parts)
        .agg(tk($"v", $"id").as("top"))
        .collect()(0).getSeq[org.apache.spark.sql.Row](0)
        .map(r => ScoredId(r.getDouble(0), r.getLong(1)))
      assert(got == expect, s"top-5 diverged at $parts partitions")
    }
  }

  // ---- Gram / covariance -------------------------------------------

  test("Gram aggregator matches a sequential reference on random vectors") {
    val rnd = new scala.util.Random(7)
    val dim = 5
    val vecs = Seq.fill(40)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    val gram = udaf(new GramAggregator(dim))
    val m = spark.createDataset(vecs.map(_.toSeq)).repartition(4).toDF("v")
      .agg(gram($"v").as("m")).collect()(0).getSeq[Double](0)
    // the reference applies the aggregator's own ⌊x·2^20 + 0.5⌋ grid, so
    // equality is EXACT — integer sums are order-invariant, which is the
    // property the grid exists to provide (raw double sums would need a
    // tolerance here and still diverge cross-engine)
    def q(x: Float): Long = math.floor(x.toDouble * 1048576.0 + 0.5).toLong
    assert(m(0) == 40.0, "count slot")
    for (i <- 0 until dim) {
      val ref = vecs.map(v => q(v(i))).sum / 1048576.0
      assert(m(1 + i) == ref, s"sum dim $i")
    }
    // upper triangle of sum x x^T, row-major
    var t = 1 + dim
    for (i <- 0 until dim; j <- i until dim) {
      val ref = vecs.map(v => q(v(i)) * q(v(j))).sum / (1048576.0 * 1048576.0)
      assert(m(t) == ref, s"gram ($i,$j)")
      t += 1
    }
    // the grid is still a faithful estimate of the raw moments
    for (i <- 0 until dim) {
      val raw = vecs.map(_(i).toDouble).sum
      assert(math.abs(m(1 + i) - raw) < 1e-4, s"grid drift dim $i")
    }
  }

  test("Gram aggregator rejects mismatched dimensions") {
    val gram = udaf(new GramAggregator(3))
    val df = spark.createDataset(Seq(Seq(1f, 2f, 3f), Seq(1f, 2f))).toDF("v")
    val e = intercept[Exception] { df.agg(gram($"v")).collect() }
    assert(e.getMessage != null)
  }

  // ---- Capped collect (q315 fingerprint buckets) --------------------

  test("capped collect returns complete sorted groups at or below cap, cap+1 witness above, under any partitioning") {
    val cap = 5
    // group sizes straddling the cap: 1, 5 (== cap), 6 (== cap+1), 9
    val data = Seq(10L -> Seq(7L),
      20L -> (1L to 5L),
      30L -> (11L to 16L),
      40L -> Seq(9L, 3L, 27L, 1L, 14L, 8L, 22L, 5L, 30L))
    val rows = data.flatMap { case (g, vs) => vs.map(v => (g, v)) }
    for (parts <- Seq(1, 3, 8)) {
      val cc = udaf(new graft.functions.SketchAggregators.CollectCappedAggregator(cap))
      val got = spark.createDataset(rows).repartition(parts).toDF("g", "v")
        .groupBy("g").agg(cc($"v").as("ds"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(got(10L) == Seq(7L), s"singleton group at $parts parts")
      assert(got(20L) == (1L to 5L), s"== cap group must be complete+sorted at $parts parts")
      // overflow groups: exactly cap+1 entries, the SMALLEST ones, sorted
      assert(got(30L) == (11L to 16L), s"cap+1 witness at $parts parts")
      assert(got(40L) == Seq(1L, 3L, 5L, 8L, 9L, 14L),
        s"overflow must keep the cap+1 smallest at $parts parts")
      assert(got.values.forall(_.size <= cap + 1), "buffer bound violated")
    }
  }
}
