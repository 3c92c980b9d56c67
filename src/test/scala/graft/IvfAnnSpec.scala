package graft

import graft.operators.IvfAnn
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF-flat ANN vs the brute-force exact scan: the index partitions the
  * data completely, probing fewer lists scans fewer candidates, and
  * recall@10 at nprobe=8/16 meets a pinned floor (everything is
  * deterministic — hash-stratified sample-init centroids in md5(vec_id)
  * order, no RNG — so the floor is a regression pin, not a statistical
  * hope).
  */
class IvfAnnSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  /** The engine's hash-stratified seeding order replicated
    * INDEPENDENTLY (java MessageDigest, not Spark's md5): ids 0..n-1
    * sorted by (md5 hex of the decimal string, id). Element r is the
    * id seeded as list r+1.
    */
  private def md5Rank(n: Int): Array[Int] =
    (0 until n).sortBy(i => (java.security.MessageDigest.getInstance("MD5")
      .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString, i))
      .toArray

  private val nLists = 16
  private lazy val emb = Tables.embeddings(spark, SparkTestSession.sf0001)
  private lazy val built = IvfAnn.build(spark, emb, nLists)
  private lazy val query = emb.filter(col("vec_id") === 0).select("embedding")

  private def bruteTop(k: Int): Seq[Long] =
    emb.crossJoin(broadcast(query.select(col("embedding").as("qv"))))
      .filter(col("vec_id") =!= 0)
      .selectExpr("vec_id", "cosine_sim(embedding, qv) AS cos")
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k).collect().map(_.getLong(0)).toSeq

  test("adaptiveNLists: largest power of two <= sqrt(N), floored at 16") {
    // the fixture corpus (500 vectors) derives EXACTLY the historical
    // 16, so every literal-16 oracle mirror stays byte-valid; the scale
    // trajectory is pinned alongside it (sf0.1's 2000 -> 32, the sf1
    // probe's 20000 -> 128, a 100 TB-ish 10^9 -> 16384)
    assert(IvfAnn.adaptiveNLists(spark, SparkTestSession.sf0001) == 16)
    def formula(n: Long, floor: Int = 16): Int = {
      var p = floor; while (4L * p * p <= n) p *= 2; p
    }
    assert(formula(500) == 16)
    assert(formula(2000) == 32)
    assert(formula(20000) == 128)
    assert(formula(1000000000L) == 16384)
    assert(formula(10) == 16, "floor holds on tiny corpora")
  }

  test("adaptiveNProbe pairs with adaptiveNLists: scanned fraction pinned at base/16") {
    // nprobe = base·nLists/16 keeps nprobe/nLists = base/16 at every
    // geometry — the round-18 defect was nLists growing 16 -> 128 with
    // nprobe frozen at 1 (scanned fraction silently down 8x). On the
    // oracle corpus (500 -> 16 lists) the factor derives 1, so every
    // literal-nprobe oracle mirror is unchanged.
    assert(IvfAnn.adaptiveNProbe(spark, SparkTestSession.sf0001) == 1)
    def traj(n: Long): (Int, Int) = {
      var p = 16; while (4L * p * p <= n) p *= 2; (p, math.max(1, p / 16))
    }
    assert(traj(500) == ((16, 1)))
    assert(traj(2000) == ((32, 2)))
    assert(traj(20000) == ((128, 8)))
    assert(traj(1000000000L) == ((16384, 1024)))
  }

  test("hash-stratified seeding ignores ingestion order (the first-N-by-id failure mode)") {
    // A corpus whose ids arrive grouped by source (ids 0..24 from
    // source 0, 25..49 from source 1, ...): first-N-by-id seeding —
    // the pre-round-19 rule — would put ALL centroids in source 0's
    // region, skewing occupancy and recall. The md5-rank draw must
    // (a) match the independent MessageDigest replication exactly and
    // (b) span several sources on this source-sorted corpus.
    import spark.implicits._
    val n = 200
    val df = (0 until n).map { i =>
      (i.toLong, i / 25, Array.tabulate(4)(d => if (d == 0) i.toFloat else 1f))
    }.toDF("vec_id", "label", "embedding")
    val (_, centroids) = IvfAnn.build(spark, df, nLists = 8)
    val got = centroids.orderBy("list_id").collect()
      .map(r => r.getSeq[Float](1).head.toInt).toSeq
    val want = md5Rank(n).take(8).toSeq
    assert(got == want, s"seed selection diverged from the md5-rank rule: $got vs $want")
    assert(got.map(_ / 25).distinct.size >= 4,
      s"seeds do not span the id-sorted sources (old-rule artifact): $got")
  }

  test("index is a complete partition of the vectors") {
    val (index, centroids) = built
    assert(centroids.count() == nLists)
    assert(index.count() == emb.count(), "vectors lost or duplicated in assignment")
    assert(index.select("vec_id").distinct().count() == emb.count())
    val lists = index.groupBy("list_id").count().collect()
    assert(lists.forall(_.getLong(1) > 0), "empty inverted list")
  }

  test("recall@10 improves with nprobe and hits exact at full probe") {
    val (index, centroids) = built
    val want = bruteTop(10).toSet
    def recallAt(nprobe: Int): Double = {
      val got = IvfAnn.search(index.filter(col("vec_id") =!= 0), centroids,
        query, k = 10, nprobe = nprobe)
        .collect().map(_.getLong(0)).toSet
      (got & want).size.toDouble / want.size
    }
    val r4 = recallAt(4); val r8 = recallAt(8); val r16 = recallAt(nLists)
    assert(r16 == 1.0, s"full probe must be exact, got $r16")
    assert(r8 >= r4 - 1e-9, s"recall not monotone: nprobe=4 -> $r4, nprobe=8 -> $r8")
    assert(r8 >= 0.5, s"recall@10 with half the lists probed = $r8 — index useless")
  }

  test("partitionBy(list_id) layout prunes unprobed lists at the parquet scan") {
    // the scaladoc's 100 TB claim, machine-checked: with the index laid
    // out partitioned on list_id, an nprobe-list filter must reach the
    // scan as PartitionFilters — the unprobed lists' files are never read.
    val (index, _) = built
    val base = java.nio.file.Files.createTempDirectory("ivf_part_").toString
    index.write.mode("overwrite").partitionBy("list_id").parquet(base)
    val onDisk = spark.read.parquet(base)
    val probedLists = Seq(1, 2, 3, 4)
    val df = onDisk.filter(col("list_id").isin(probedLists: _*))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [list_id"),
      s"probe filter not applied as a partition filter:\n$plan")
    val scannedFiles = df.select(input_file_name()).distinct().collect()
      .map(_.getString(0)).toSet
    assert(scannedFiles.forall(f => probedLists.exists(l => f.contains(s"list_id=$l"))),
      s"files outside the probed lists were read: $scannedFiles")
  }

  test("allNnExact stays exact on CLUSTERED data, where the bound actually prunes") {
    // The oracle gate (q46b) runs on the RANDOM fixture, where every
    // (vector, list) pair escapes — so it never exercises the pruned
    // regime. This fixture is 8 tight, well-separated clusters with
    // ids assigned to clusters in md5-RANK-interleaved order, so
    // build's hash-sample seeding (first nLists ids by md5 rank) lands
    // exactly one centroid per cluster: the angular bound must
    // eliminate almost every foreign list, and the answer must STILL
    // be exact — an over-aggressive bound would drop true neighbors
    // here and nothing else would catch it.
    import spark.implicits._
    val rnd = new scala.util.Random(1)
    val dim = 16; val nClusters = 8; val perCluster = 25
    val rank = md5Rank(nClusters * perCluster)
    val clusterOf = rank.zipWithIndex
      .map { case (id, r) => id -> r % nClusters }.toMap
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs: Seq[(Long, Int, Array[Float])] =
      (0 until nClusters * perCluster).map { i =>
        val c = clusterOf(i)
        val v = centers(c).map(x => (x + 0.02 * rnd.nextGaussian()).toFloat)
        (i.toLong, c, v)
      }
    val df = vecs.toDF("vec_id", "label", "embedding")
    val (index, centroids) = IvfAnn.build(spark, df, nLists = nClusters)
    val got = IvfAnn.allNnExact(index, centroids, nprobe = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    // in-memory brute force with the kernel's exact arithmetic
    // (float -> double per element, same fold order) and the oracle's
    // rounding + tie-break
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = vecs.map { case (id, _, v) =>
      val best = vecs.filter(_._1 != id)
        .map { case (j, _, w) => (j, r6(cos(v, w))) }
        .maxBy { case (j, c) => (c, -j.toDouble) }
      id -> best
    }.toMap
    assert(got == want, "bucketed all-NN diverged from brute force on clustered data")

    // prove the pruned regime was actually active: replicate the bound
    // with the same geometry and count survivors among foreign lists.
    // build seeds centroids with the first nLists vectors in md5 rank
    // order: centroid j (0-based) IS the vector with md5 rank j
    val cvec = (0 until nClusters).map(j => vecs(rank(j))._3)
    val assign = vecs.map { case (id, _, v) =>
      id -> (0 until nClusters).minBy(j => -cos(v, cvec(j)))
    }.toMap
    val rad = (0 until nClusters).map { j =>
      val members = vecs.filter(v => assign(v._1) == j)
      j -> members.map(v => math.acos(math.max(-1, math.min(1, cos(v._3, cvec(j)))))).max
    }.toMap
    var escapes = 0; var foreign = 0
    vecs.foreach { case (id, _, v) =>
      val th = (0 until nClusters).map(j =>
        j -> math.acos(math.max(-1, math.min(1, cos(v, cvec(j)))))).toMap
      val probes = th.toSeq.sortBy { case (j, t) => (t, j) }.take(2).map(_._1).toSet
      val bestProbed = vecs
        .filter(w => w._1 != id && probes(assign(w._1)))
        .map(w => cos(v, w._3)).maxOption.getOrElse(-2.0)
      (0 until nClusters).filterNot(probes).foreach { j =>
        foreign += 1
        if (math.cos(math.max(0, th(j) - rad(j))) >= bestProbed - 1e-3) escapes += 1
      }
    }
    assert(escapes < foreign / 4,
      s"bound pruned nothing on clustered data ($escapes of $foreign foreign lists escape)")
  }

  test("escape fraction MEASURED through the engine frames: ~1.0 random, collapsed clustered") {
    // the prune payoff as a number, not a comment: on the RANDOM fixture
    // list radii sit near 90 deg and the angular bound can veto almost
    // nothing; on the clustered fixture it must veto almost everything.
    // Both fractions come from the engine's own stage frames.
    def fraction(emb: org.apache.spark.sql.DataFrame, lists: Int): Double = {
      val (index, centroids) = IvfAnn.build(spark, emb, lists)
      val run = IvfAnn.allNnRun(index, centroids, nprobe = 2)
      run.result.count() // drive the run so best1 exists
      val f = run.foreign.count()
      assert(f > 0, "no foreign (vector, list) pairs to measure")
      run.escapes.count().toDouble / f
    }
    val random = fraction(emb, nLists)
    assert(random > 0.9, s"random fixture should be near-unprunable, got $random")

    import spark.implicits._
    val rnd = new scala.util.Random(1)
    val dim = 16; val nClusters = 8; val perCluster = 25
    val rank = md5Rank(nClusters * perCluster)
    val clusterOf = rank.zipWithIndex
      .map { case (id, r) => id -> r % nClusters }.toMap
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian()))
    val clustered = (0 until nClusters * perCluster).map { i =>
      val c = clusterOf(i)
      (i.toLong, c, centers(c).map(x => (x + 0.02 * rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "label", "embedding")
    val tight = fraction(clustered, nClusters)
    assert(tight < 0.25, s"clustered fixture should prune >75% of foreign lists, got $tight")
  }

  test("q46 entry (bucketed, 8 lists) == the brute n² formulation it replaced") {
    // the entry-set swap that evicted the full-table broadcast: the
    // bucketed plan must answer the brute oracle semantics row-for-row
    // on the spec fixture (the driver gate repeats this vs DuckDB)
    import graft.queries.SimilarityQueries
    val got = SimilarityQueries.q46NnPairs(spark, SparkTestSession.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = SimilarityQueries.nnPairsBrute(spark, SparkTestSession.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want, "bucketed q46 entry diverged from the brute formulation")
  }

  private def cosD(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  private def rd6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("nearDupPairs == brute-force threshold pairs on the RANDOM fixture") {
    // the q78 oracle gate at engine scale; here against an in-memory
    // brute force, on the fixture where NOTHING prunes (random vectors,
    // list radii near 90 deg) — completeness must survive the all-escape
    // worst case
    val (index, centroids) = built
    val got = IvfAnn.nearDupPairs(index, centroids, minCos = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val want = (for {
      (i, a) <- vecs; (j, b) <- vecs if i < j
      c = rd6(cosD(a, b)) if c >= 0.4
    } yield (i, j) -> c).toMap
    assert(want.nonEmpty, "fixture produced no qualifying pairs — test is vacuous")
    assert(got == want, "bucketed pair detection diverged from brute force")
  }

  test("nearDupPairs stays exact on CLUSTERED data where pairs straddle lists") {
    // 8 tight clusters but 12 lists: with clusters assigned in md5-rank
    // order, build's hash-sample seeding (first 12 ids by md5 rank)
    // gives clusters 0-3 TWO lists each, so true near-dup pairs
    // straddle list boundaries and only the escape path can recover
    // them; the angular bound must prune most foreign lists AND lose
    // no pair.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 16; val nClusters = 8; val perCluster = 25
    val rank = md5Rank(nClusters * perCluster)
    val clusterOf = rank.zipWithIndex
      .map { case (id, r) => id -> r % nClusters }.toMap
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs: Seq[(Long, Int, Array[Float])] =
      (0 until nClusters * perCluster).map { i =>
        val c = clusterOf(i)
        (i.toLong, c, centers(c).map(x => (x + 0.02 * rnd.nextGaussian()).toFloat))
      }
    val df = vecs.toDF("vec_id", "label", "embedding")
    val (index, centroids) = IvfAnn.build(spark, df, nLists = 12)
    val minCos = 0.9
    val got = IvfAnn.nearDupPairs(index, centroids, minCos)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val want = (for {
      (i, _, a) <- vecs; (j, _, b) <- vecs if i < j
      c = rd6(cosD(a, b)) if c >= minCos
    } yield (i, j) -> c).toMap
    assert(got == want, "bucketed pair detection diverged from brute force")

    // the straddling pairs actually exist (else the escape path is untested)
    val listOf = index.select("vec_id", "list_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val crossing = want.keys.count { case (i, j) => listOf(i) != listOf(j) }
    assert(crossing > 0, "no qualifying pair straddles lists — fixture too easy")

    // the pruned regime was active: replicate the engine's escape filter
    // (same geometry, same margin) and count (vector, foreign list)
    // survivors — on tight clusters the threshold bound must kill most
    val cents = centroids.collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toMap
    val radii = vecs.groupBy(v => listOf(v._1)).map { case (l, ms) =>
      l -> ms.map(v => math.acos(math.max(-1, math.min(1, cosD(v._3, cents(l)))))).max
    }
    var foreign = 0; var escapes = 0
    vecs.foreach { case (id, _, v) =>
      val home = listOf(id)
      cents.keys.filter(_ != home).foreach { l =>
        foreign += 1
        val th = math.acos(math.max(-1, math.min(1, cosD(v, cents(l)))))
        if (math.cos(math.max(0, th - radii(l))) >= minCos - 1e-3) escapes += 1
      }
    }
    assert(escapes < foreign / 4,
      s"threshold bound pruned nothing on clustered data ($escapes of $foreign escape)")
  }

  test("probing fewer lists scans proportionally fewer candidates") {
    val (index, centroids) = built
    val probed = centroids
      .crossJoin(broadcast(query.select(col("embedding").as("qv"))))
      .selectExpr("list_id", "cosine_sim(centroid, qv) AS csim")
      .orderBy(col("csim").desc).limit(4).select("list_id")
    val scanned = index.join(broadcast(probed), Seq("list_id"), "left_semi").count()
    val total = index.count()
    assert(scanned < total * 0.6,
      s"nprobe=4/$nLists scanned $scanned of $total — no pruning happening")
  }

  test("buildShared memoizes per (session, dir, nLists), pre-attaches norms, and stays exact") {
    val dir = SparkTestSession.sf0001
    val (i1, c1) = IvfAnn.buildShared(spark, dir, nLists = 16)
    val (i2, c2) = IvfAnn.buildShared(spark, dir, nLists = 16)
    // the SAME materialized frames come back — the assignment + norm
    // passes ran once for every consumer in the session
    assert((i1 eq i2) && (c1 eq c2), "repeat buildShared did not return the memoized frames")
    assert(i1.columns.contains("nrm"), "shared index must carry precomputed norms")
    val (i3, _) = IvfAnn.buildShared(spark, dir, nLists = 8)
    assert(!(i3 eq i1), "different geometry must not share an index")
    // a shared-index run equals a fresh, un-memoized build end-to-end
    val fresh = {
      val (fi, fc) = IvfAnn.build(spark,
        emb.select("vec_id", "label", "embedding"), 16)
      IvfAnn.allNnExact(fi, fc, nprobe = 2).collect().toSeq
    }
    val shared = IvfAnn.allNnExact(i1, c1, nprobe = 2).collect().toSeq
    assert(shared == fresh, "shared-index all-NN diverged from a fresh build")
  }
}
