package graft

import graft.functions.SketchAggregators._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws of the mergeable sketches, checked directly on the
  * Aggregator methods (no Spark jobs — the engine's partial/final
  * execution is covered by `SketchAggregatorsSpec`; these pin that ANY
  * split of the input into partial folds merges to the same answer,
  * which is the property distribution correctness rests on).
  */
class SketchLawsSpec extends AnyFunSuite {

  private def cases[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(seed)).get

  private def foldWith[I, B](zero: B, reduce: (B, I) => B)(xs: Seq[I]): B =
    xs.foldLeft(zero)(reduce)

  // ---- bottom-k ----------------------------------------------------

  test("BottomK: any partition split merges to the brute-force bottom-k (scalacheck)") {
    val agg = new BottomKAggregator(6)
    val gen = for {
      xs <- Gen.listOfN(60, Gen.chooseNum(1, 25).map(_ / 25.0)) // dups guaranteed
      cut <- Gen.chooseNum(0, 60)
    } yield (xs, cut)
    cases(gen, 60, 7L).foreach { case (xs, cut) =>
      val (a, b) = xs.splitAt(cut)
      val merged = agg.merge(
        foldWith(agg.zero, agg.reduce)(a), foldWith(agg.zero, agg.reduce)(b))
      assert(merged == xs.distinct.sorted.take(6), s"split at $cut diverged")
      // merge is commutative
      assert(merged == agg.merge(
        foldWith(agg.zero, agg.reduce)(b), foldWith(agg.zero, agg.reduce)(a)))
    }
  }

  // ---- top-k heap --------------------------------------------------

  test("TopK: any partition split merges to the sorted reference with id tie-break (scalacheck)") {
    val agg = new TopKAggregator(4)
    val gen = for {
      n <- Gen.chooseNum(0, 50)
      vs <- Gen.listOfN(n, Gen.chooseNum(1, 8)) // heavy value ties
      cut <- Gen.chooseNum(0, n)
    } yield (vs.zipWithIndex.map { case (v, i) => ScoredId(v.toDouble, i.toLong) }, cut)
    cases(gen, 80, 11L).foreach { case (xs, cut) =>
      val (a, b) = xs.splitAt(cut)
      val merged = agg.merge(
        foldWith(agg.zero, agg.reduce)(a), foldWith(agg.zero, agg.reduce)(b))
      val want = xs.sortWith((p, q) => p.v > q.v || (p.v == q.v && p.id < q.id)).take(4)
      assert(merged == want, s"split at $cut diverged: $merged vs $want")
    }
  }

  // ---- Misra–Gries -------------------------------------------------

  test("Misra-Gries: exact when capacity >= distinct, for any split (scalacheck)") {
    val agg = new HeavyHitterAggregator(32)
    val gen = for {
      keys <- Gen.listOfN(120, Gen.chooseNum(0L, 19L)) // ≤20 distinct ≤ 32 cap
      cut <- Gen.chooseNum(0, 120)
    } yield (keys, cut)
    cases(gen, 60, 13L).foreach { case (keys, cut) =>
      val (a, b) = keys.splitAt(cut)
      val merged = agg.merge(
        foldWith(agg.zero, agg.reduce)(a), foldWith(agg.zero, agg.reduce)(b))
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(merged == exact, s"split at $cut diverged")
    }
  }

  test("Misra-Gries: lossy-regime counts never overcount and undercount <= n/(cap+1) (scalacheck)") {
    val cap = 8
    val agg = new HeavyHitterAggregator(cap)
    val gen = for {
      keys <- Gen.listOfN(300, Gen.frequency(
        3 -> Gen.chooseNum(0L, 2L),      // heavy keys
        2 -> Gen.chooseNum(100L, 400L))) // long tail
      cut <- Gen.chooseNum(0, 300)
    } yield (keys, cut)
    cases(gen, 60, 17L).foreach { case (keys, cut) =>
      val (a, b) = keys.splitAt(cut)
      val merged = agg.merge(
        foldWith(agg.zero, agg.reduce)(a), foldWith(agg.zero, agg.reduce)(b))
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = keys.size / (cap + 1)
      assert(merged.size <= cap)
      merged.foreach { case (k, c) =>
        val t = exact.getOrElse(k, 0L)
        assert(c <= t, s"overcount: key $k reported $c true $t")
        assert(c >= t - bound, s"undercount beyond bound: key $k reported $c true $t bound $bound")
      }
      // completeness: anything with true count > bound must be present
      exact.foreach { case (k, t) =>
        if (t > bound) assert(merged.contains(k), s"heavy key $k (count $t > $bound) dropped")
      }
    }
  }

  // ---- BitSet (bloom accumulation) ---------------------------------

  test("BitSet: split-anywhere merges equal the direct fold; membership is exact") {
    val nBits = 1024
    val agg = new graft.functions.SketchAggregators.BitSetAggregator(nBits)
    val gen = for {
      n <- Gen.chooseNum(0, 200)
      ps <- Gen.listOfN(n, Gen.chooseNum(0, nBits - 1))
      cut <- Gen.chooseNum(0, n)
    } yield (ps, cut)
    def bit(w: Array[Long], p: Int): Boolean = ((w(p >>> 6) >>> (p & 63)) & 1L) == 1L
    cases(gen, 40, 23L).foreach { case (ps, cut) =>
      val (a, b) = ps.splitAt(cut)
      val merged = agg.merge(
        foldWith(agg.zero, agg.reduce)(a), foldWith(agg.zero, agg.reduce)(b))
      val direct = foldWith(agg.zero, agg.reduce)(ps)
      assert(merged.toSeq == direct.toSeq, "merge diverged from direct fold")
      // every inserted position set; nothing else is
      val want = ps.toSet
      (0 until nBits).foreach { p =>
        assert(bit(merged, p) == want(p), s"bit $p wrong")
      }
    }
  }

  // ---- Gram --------------------------------------------------------

  test("Gram: partial folds merge to the direct moments (scalacheck)") {
    val dim = 4
    val agg = new GramAggregator(dim)
    val gen = for {
      n <- Gen.chooseNum(1, 30)
      vs <- Gen.listOfN(n, Gen.listOfN(dim, Gen.chooseNum(-100, 100).map(_ / 50.0f)))
      cut <- Gen.chooseNum(0, n)
    } yield (vs.map(_.toSeq), cut)
    // reference on the aggregator's own integer grid — split-anywhere
    // merges must be EXACTLY the direct fold, the order-invariance the
    // grid buys (double accumulation would only match to a tolerance)
    def q(x: Float): Long = math.floor(x.toDouble * 1048576.0 + 0.5).toLong
    cases(gen, 40, 19L).foreach { case (vs, cut) =>
      val (a, b) = vs.splitAt(cut)
      val merged = agg.finish(agg.merge(
        foldWith(agg.zero, agg.reduce)(a), foldWith(agg.zero, agg.reduce)(b)))
      assert(merged(0) == vs.size.toDouble)
      var t = 1 + dim
      for (i <- 0 until dim) {
        val ref = vs.map(v => q(v(i))).sum / 1048576.0
        assert(merged(1 + i) == ref, s"sum dim $i")
      }
      for (i <- 0 until dim; j <- i until dim) {
        val ref = vs.map(v => q(v(i)) * q(v(j))).sum / (1048576.0 * 1048576.0)
        assert(merged(t) == ref, s"gram ($i,$j)")
        t += 1
      }
    }
  }

  // ---- HyperLogLog -------------------------------------------------

  test("HLL: split-anywhere merges equal the direct fold; duplicate-insensitive") {
    val agg = new HllAggregator(12)
    val gen = for {
      n <- Gen.chooseNum(0, 400)
      // 60-bit hashes with deliberate duplication
      xs <- Gen.listOfN(n, Gen.chooseNum(0L, 200L)
        .map(k => new java.math.BigInteger(1,
          java.security.MessageDigest.getInstance("MD5")
            .digest(k.toString.getBytes)).shiftRight(68).longValue()))
      cut <- Gen.chooseNum(0, n)
    } yield (xs, cut)
    cases(gen, 40, 23L).foreach { case (xs, cut) =>
      val (a, b) = xs.splitAt(cut)
      val direct = foldWith(agg.zero, agg.reduce)(xs)
      val merged = agg.merge(
        foldWith(agg.zero, agg.reduce)(a), foldWith(agg.zero, agg.reduce)(b))
      assert(merged.sameElements(direct), s"split at $cut diverged")
      // duplicate-insensitivity: re-reducing the whole stream is a no-op
      val twice = foldWith(direct.clone(), agg.reduce)(xs)
      assert(twice.sameElements(direct))
      assert(agg.finish(merged) == agg.finish(direct))
    }
  }

  test("HLL: estimate lands within 5× the theoretical error bound on 5k distinct keys") {
    val agg = new HllAggregator(12)
    val hashes = (0 until 5000).map { k =>
      new java.math.BigInteger(1,
        java.security.MessageDigest.getInstance("MD5")
          .digest(k.toString.getBytes)).shiftRight(68).longValue()
    }
    val est = agg.finish(foldWith(agg.zero, agg.reduce)(hashes))
    val relErr = math.abs(est - 5000.0) / 5000.0
    // 1.04/√4096 ≈ 1.6% is the standard error; 5σ ≈ 8.1%
    assert(relErr < 5 * 1.04 / math.sqrt(4096.0), s"rel err $relErr too large (est $est)")
  }

  test("HLL small-p: tabulated α (0.673/0.697/0.709) keeps p=4..6 within bound") {
    // the closed form 0.7213/(1+1.079/m) is the HLL paper's constant only
    // for m >= 128; p in [4,6] uses the tabulated constants (Flajolet §4).
    // Pin both the constant choice (via a hand-computed raw estimate) and
    // the resulting accuracy on a distinct stream big enough to leave the
    // linear-counting regime.
    def hash(k: Long): Long =
      new java.math.BigInteger(1,
        java.security.MessageDigest.getInstance("MD5")
          .digest(("smallp" + k).getBytes)).shiftRight(68).longValue()
    val hashes = (0 until 2000).map(h => hash(h.toLong))
    for ((p, alpha) <- Seq((4, 0.673), (5, 0.697), (6, 0.709))) {
      val agg = new HllAggregator(p)
      val m = 1 << p
      val regs = foldWith(agg.zero, agg.reduce)(hashes)
      val est = agg.finish(regs)
      // replay the finish chain with the tabulated constant — equality
      // pins that the aggregator did NOT use the closed form at small m
      val maxRho = 60 - p + 1
      val s = regs.map(r => (1L << (maxRho - r)).toDouble).sum
      val raw = alpha * m * m * (1L << maxRho).toDouble / s
      val v = regs.count(_ == 0)
      val want = if (raw <= 2.5 * m && v > 0) m * math.log(m.toDouble / v) else raw
      assert(math.abs(est - want) < 1e-6 * want, s"p=$p finish chain diverged")
      val relErr = math.abs(est - 2000.0) / 2000.0
      assert(relErr < 5 * 1.04 / math.sqrt(m.toDouble),
        s"p=$p rel err $relErr (est $est)")
    }
  }

  test("HLL rollup: merging fine-grain sketch columns equals the direct coarse fold") {
    val sk = new HllSketchAggregator(12)
    val mg = new HllMergeAggregator(12)
    val direct = new HllAggregator(12)
    def hash(k: Long): Long =
      new java.math.BigInteger(1,
        java.security.MessageDigest.getInstance("MD5")
          .digest(k.toString.getBytes)).shiftRight(68).longValue()
    val gen = for {
      n <- Gen.chooseNum(0, 300)
      keys <- Gen.listOfN(n, Gen.chooseNum(0L, 500L))
      nGroups <- Gen.chooseNum(1, 6)
    } yield (keys.map(hash), nGroups)
    cases(gen, 30, 37L).foreach { case (hs, nGroups) =>
      // fine grain: hash-partition keys into groups, sketch each
      val fine = hs.groupBy(h => (h % nGroups).toInt).values.toList
        .map(g => sk.finish(foldWith(sk.zero, sk.reduce)(g)))
      // rollup: merge the STORED register columns
      val rolled = mg.finish(foldWith(mg.zero, mg.reduce)(fine))
      val flat = direct.finish(foldWith(direct.zero, direct.reduce)(hs))
      assert(rolled == flat, s"rollup $rolled != direct $flat over ${hs.size} keys")
    }
  }

  test("CMS: split-anywhere merges equal the direct fold; estimates never undercount") {
    val d = 4; val w = 32
    val agg = new CmsAggregator(d, w)
    def buckets(key: Long): Seq[Long] = (0 until d).map { j =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j|$key".getBytes)
      new java.math.BigInteger(1, md).mod(java.math.BigInteger.valueOf(w)).longValue()
    }
    val gen = for {
      n <- Gen.chooseNum(0, 300)
      keys <- Gen.listOfN(n, Gen.chooseNum(0L, 40L)) // heavy collisions at w=32
      cut <- Gen.chooseNum(0, n)
    } yield (keys, cut)
    cases(gen, 30, 31L).foreach { case (keys, cut) =>
      val rows = keys.map(buckets)
      val (a, b) = rows.splitAt(cut)
      val direct = foldWith(agg.zero, agg.reduce)(rows)
      val merged = agg.merge(
        foldWith(agg.zero, agg.reduce)(a), foldWith(agg.zero, agg.reduce)(b))
      assert(merged.sameElements(direct), s"split at $cut diverged")
      // one-sided error: min over the d cells ≥ the true count, always
      val trueCounts = keys.groupBy(identity).view.mapValues(_.size.toLong)
      trueCounts.foreach { case (k, n) =>
        val est = buckets(k).zipWithIndex.map { case (c, j) => direct(j * w + c.toInt) }.min
        assert(est >= n, s"undercount for key $k: $est < $n")
      }
    }
  }

  test("HLL: rho bit-split matches a direct binary-string reference") {
    val agg = new HllAggregator(12)
    // drive single-hash folds and compare the register against the
    // definitionally-computed (bucket, rho) from the 60-bit binary string
    cases(Gen.chooseNum(0L, (1L << 60) - 1), 200, 29L).foreach { h =>
      val regs = agg.reduce(agg.zero, h)
      val bits = (59 to 0 by -1).map(i => (h >> i) & 1L)
      val bucket = java.lang.Long.parseLong(bits.take(12).mkString, 2).toInt
      val suffix = bits.drop(12)
      val rho = suffix.indexWhere(_ == 1L) match {
        case -1 => 49
        case i  => i + 1
      }
      assert(regs(bucket) == rho, s"h=$h bucket=$bucket")
      assert(regs.count(_ != 0) == 1)
    }
  }
}
