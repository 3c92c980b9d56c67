package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable sketch aggregators (SURVEY.md §2B "custom typed UDAF" /
  * "imperative agg (sketches)" rows). Both run as partial+final
  * aggregations: the map side folds raw rows into a FIXED-SIZE buffer and
  * only buffers cross the shuffle — at 100 TB the shuffle volume is
  * O(partitions · buffer), independent of row count. That mergeability is
  * the whole point of sketching in a distributed engine; a non-mergeable
  * "sketch" would force a single-task stream.
  */
object SketchAggregators {

  /** Misra–Gries heavy-hitters summary (a.k.a. frequent items; the
    * deterministic cousin of space-saving) over a long-keyed column.
    *
    * Guarantees (Misra & Gries 1982; merge rule per Agarwal et al.,
    * "Mergeable Summaries", PODS '12 — both public):
    *  - every key with true count > n/(capacity+1) is retained;
    *  - a reported count undercounts the true count by at most
    *    n/(capacity+1), where n = rows folded in;
    *  - when `capacity` ≥ the number of DISTINCT keys, no decrement ever
    *    fires and every reported count is EXACT — that regime is what the
    *    q86 oracle gate pins; `HeavyHitterSpec` bounds the lossy regime.
    *
    * The buffer is an immutable Map (encoder-friendly); the per-row
    * update is O(log size) and the rare decrement/truncate steps are
    * O(capacity). Counts never depend on arrival order in the exact
    * regime, so the result is deterministic under any partitioning.
    */
  class HeavyHitterAggregator(capacity: Int)
      extends Aggregator[Long, Map[Long, Long], Seq[(Long, Long)]] {
    require(capacity > 0, "capacity must be positive")

    override def zero: Map[Long, Long] = Map.empty

    override def reduce(b: Map[Long, Long], key: Long): Map[Long, Long] =
      b.get(key) match {
        case Some(c) => b.updated(key, c + 1L)
        case None if b.size < capacity => b.updated(key, 1L)
        case None =>
          // Misra–Gries step: decrement every counter, drop zeros. The
          // arriving key is "absorbed" by the collective decrement.
          b.iterator.collect { case (k, c) if c > 1L => (k, c - 1L) }.toMap
      }

    /** Mergeable-summaries rule: sum counters, then if over capacity
      * subtract the (capacity+1)-th largest count from all and keep the
      * strictly-positive survivors (ties on the cut count all survive the
      * subtraction identically, so the merge is deterministic).
      */
    override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
      val combined = b.foldLeft(a) { case (m, (k, c)) =>
        m.updated(k, m.getOrElse(k, 0L) + c)
      }
      if (combined.size <= capacity) combined
      else {
        val cut = combined.valuesIterator.toArray.sorted(Ordering[Long].reverse)(capacity)
        combined.iterator.collect { case (k, c) if c > cut => (k, c - cut) }.toMap
      }
    }

    /** Descending (count, then key) — a canonical order so downstream
      * `explode` + `limit` is deterministic without re-sorting the map.
      */
    override def finish(r: Map[Long, Long]): Seq[(Long, Long)] =
      r.toSeq.sortBy { case (k, c) => (-c, k) }

    override def bufferEncoder: Encoder[Map[Long, Long]] =
      ExpressionEncoder[Map[Long, Long]]()
    override def outputEncoder: Encoder[Seq[(Long, Long)]] =
      ExpressionEncoder[Seq[(Long, Long)]]()
  }

  /** Bottom-k sketch (KMV, "k minimum values" — Bar-Yossef et al. 2002):
    * keeps the k smallest hash values seen. Union-mergeable (merge =
    * merge the two sorted lists, keep k), so the map side folds each
    * partition into a ≤k-element buffer and only those cross the
    * shuffle; `(k-1)/u_(k)` estimates the distinct count of the hashed
    * key. Deterministic: the k smallest of a set do not depend on
    * arrival order. Input hashes must be pre-normalized to (0, 1].
    */
  class BottomKAggregator(k: Int)
      extends Aggregator[Double, Seq[Double], Seq[Double]] {
    require(k > 0, "k must be positive")

    override def zero: Seq[Double] = Vector.empty

    override def reduce(b: Seq[Double], u: Double): Seq[Double] =
      if (b.contains(u)) b // KMV is over the DISTINCT hash set
      else if (b.size < k) (b :+ u).sorted
      else if (u < b.last) (b.init :+ u).sorted
      else b

    override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] =
      (a ++ b).distinct.sorted.take(k)

    override def finish(r: Seq[Double]): Seq[Double] = r

    override def bufferEncoder: Encoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
    override def outputEncoder: Encoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
  }

  /** A (value, id) pair ranked by (value DESC, id ASC) — the total order
    * `TopKAggregator` maintains, so ties are deterministic.
    */
  case class ScoredId(v: Double, id: Long)

  /** Bounded per-group top-k heap: keeps the k largest `ScoredId`s by
    * (v desc, id asc). The scale story vs the `row_number` window
    * formulation (q23): a window sorts EVERY row of every group through
    * the shuffle; this aggregator's map side reduces each partition to
    * ≤k rows per group before the exchange, so the shuffle carries
    * O(groups · partitions · k) — on a 100 TB fact table with small k
    * that is the difference between shuffling the table and shuffling a
    * summary. Exact (not a sketch): top-k is union-mergeable.
    */
  class TopKAggregator(k: Int)
      extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
    require(k > 0, "k must be positive")

    private def better(a: ScoredId, b: ScoredId): Boolean =
      a.v > b.v || (a.v == b.v && a.id < b.id)
    private def sortK(s: Seq[ScoredId]): Seq[ScoredId] =
      s.sortWith(better).take(k)

    override def zero: Seq[ScoredId] = Vector.empty
    override def reduce(b: Seq[ScoredId], x: ScoredId): Seq[ScoredId] =
      if (b.size < k || better(x, b.last)) sortK(b :+ x) else b
    override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
      sortK(a ++ b)
    override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r

    override def bufferEncoder: Encoder[Seq[ScoredId]] =
      ExpressionEncoder[Seq[ScoredId]]()
    override def outputEncoder: Encoder[Seq[ScoredId]] =
      ExpressionEncoder[Seq[ScoredId]]()
  }

  /** Capped group collect: gathers a group's long values but never
    * holds more than `cap + 1` of them — one past the cap is kept as
    * the overflow WITNESS, so `size(result) > cap` means "this group
    * exceeded the cap" and the caller filters it out. The scale story
    * vs `collect_list` + a separate count census (q315): a df-cutoff
    * pipeline needs both the group members AND proof the group is
    * small; collect_list would materialize an unbounded list for every
    * hot key (a boilerplate fingerprint at 100 TB has millions of
    * docs) before the filter could drop it, while this buffer is
    * O(cap) under ANY skew, map-side partials included. Non-overflow
    * groups come back complete and sorted ascending — deterministic
    * under any partitioning (inputs are distinct per group by
    * contract; overflow groups keep the cap+1 SMALLEST as the
    * canonical witness).
    */
  class CollectCappedAggregator(cap: Int)
      extends Aggregator[Long, Seq[Long], Seq[Long]] {
    require(cap > 0, "cap must be positive")

    override def zero: Seq[Long] = Vector.empty

    override def reduce(b: Seq[Long], x: Long): Seq[Long] =
      if (b.size <= cap) b :+ x // up to cap+1 kept; beyond that the
      else if (x < b.max) (b :+ x).sorted.take(cap + 1) // smallest witness set
      else b

    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
      val u = a ++ b
      if (u.size <= cap + 1) u else u.sorted.take(cap + 1)
    }

    override def finish(r: Seq[Long]): Seq[Long] = r.sorted

    override def bufferEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** Mergeable bitmap — the accumulation half of a Bloom filter (Bloom,
    * CACM 1970). Input rows are BIT POSITIONS in [0, numBits); the
    * buffer is the packed long[] bitmap and merge is bitwise OR, so the
    * result is order- and partitioning-invariant by construction. The
    * HASHING deliberately lives outside the aggregator, in column space
    * (`xxhash64(gram, i) pmod numBits` on both the build and the probe
    * side), so the membership test is the same codegen'd expression
    * that built the bits — no Scala/SQL hash-function duality to keep
    * in sync.
    *
    * Scale role (q73b): when a reference set is too big to broadcast
    * RAW, its bitmap still broadcasts at numBits/8 bytes with
    * (1 − e^(−kn/m))^k false-positive rate; the big-side stream is
    * prefiltered scan-locally and only candidates (true hits + FPs)
    * ever reach an exchange. Exactness is restored downstream by an
    * equi-join verify against the real set — the filter only shrinks
    * the join input, never the answer.
    */
  class BitSetAggregator(numBits: Int)
      extends Aggregator[Int, Array[Long], Array[Long]] {
    require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
    private val words = numBits / 64

    override def zero: Array[Long] = new Array[Long](words)

    override def reduce(b: Array[Long], p: Int): Array[Long] = {
      require(p >= 0 && p < numBits, s"bit position $p outside [0, $numBits)")
      b(p >>> 6) |= 1L << (p & 63)
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < words) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(r: Array[Long]): Array[Long] = r

    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** One-pass Gram/covariance accumulator over `ArrayType(FloatType)`
    * embeddings — the distributed half of PCA/whitening: the d×d second
    * moment is computed in a single scan with a d(d+1)/2-sized buffer
    * (upper triangle only), the O(d²)→O(d³) eigen step then runs on the
    * driver over a 64×64 matrix. The embedding table itself never
    * shuffles — only one ~17 KB buffer per partition does.
    *
    * The accumulation runs on an INTEGER grid, not raw doubles: each
    * float is snapped to q = ⌊x·2^quantBits + 0.5⌋ (a long) and the
    * moments are exact integer sums of q and q·q. Integer addition is
    * associative and commutative, so the result is bit-identical under
    * ANY partitioning/merge order — raw double sums are not (Spark's
    * partial/merge order vs a reference engine's differ by ulp, and no
    * amount of output rounding absorbs an order-dependent sum that
    * lands on a rounding boundary). `finish` de-scales by 2^quantBits
    * (resp. 2^2·quantBits), an exact power-of-two division for any
    * magnitude below 2^53.
    *
    * quantBits is the precision/cardinality knob: with |x| ≤ 1 the
    * per-pair products are ≤ 2^2·quantBits, so the long accumulator is
    * exact up to n = 2^(63−2·quantBits) rows per group (quantBits 20 →
    * 8.4M rows at 2^-21 absolute precision; a 100 TB run drops to e.g.
    * quantBits 14 → 34B rows at 2^-15). Overflow is a conscious trade
    * against grid resolution, not a silent failure mode of the design.
    *
    * Buffer layout: [0] = n, [1..d] = per-dim Σq, [1+d ..] = upper
    * triangle of Σ q·qᵀ in row-major (i ≤ j) order. `finish` returns
    * the de-scaled moments; callers derive Gram sums, means, and
    * covariance (cov_ij = (S_ij − s_i·s_j/n)/(n−1)) as plain column
    * math.
    */
  class GramAggregator(dim: Int, quantBits: Int = 20)
      extends Aggregator[Seq[Float], Array[Long], Array[Double]] {
    require(dim > 0, "dim must be positive")
    require(quantBits > 0 && quantBits < 31, "quantBits must be in (0, 31)")
    private val triLen = dim * (dim + 1) / 2
    private val bufLen = 1 + dim + triLen
    private val scale = (1L << quantBits).toDouble

    override def zero: Array[Long] = new Array[Long](bufLen)

    override def reduce(b: Array[Long], v: Seq[Float]): Array[Long] = {
      require(v.length == dim, s"embedding dimension mismatch: $dim vs ${v.length}")
      // snap to the grid once up front so the O(d²) loop never boxes;
      // floor(x·s + 0.5) rather than round() so the oracle can mirror
      // the identical half-up rule in any engine
      val q = new Array[Long](dim)
      var i = 0
      while (i < dim) { q(i) = math.floor(v(i).toDouble * scale + 0.5).toLong; i += 1 }
      b(0) += 1L
      var t = 1 + dim
      i = 0
      while (i < dim) {
        b(1 + i) += q(i)
        var j = i
        while (j < dim) { b(t) += q(i) * q(j); j += 1; t += 1 }
        i += 1
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < bufLen) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(r: Array[Long]): Array[Double] = {
      val out = new Array[Double](bufLen)
      out(0) = r(0).toDouble
      var i = 1
      while (i <= dim) { out(i) = r(i) / scale; i += 1 }
      while (i < bufLen) { out(i) = r(i) / (scale * scale); i += 1 }
      out
    }

    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Double]] =
      ExpressionEncoder[Array[Double]]()
  }

  /** HyperLogLog distinct-count sketch (Flajolet et al., AofA 2007) —
    * the register-max formulation, completing the mergeable-sketch
    * family (SpaceSaving, KMV, top-k heap, Bloom bitmap, Gram).
    *
    * Input rows are 60-bit hashes already computed IN COLUMN SPACE
    * (`conv(substr(md5(key),1,15),16,10)` — the same value DuckDB gets
    * from `('0x'||substr(md5(key),1,15))::BIGINT`), so there is no
    * Scala/SQL hash duality: the aggregator only splits bits. The top
    * p bits pick a register; ρ = leading-zero count of the remaining
    * (60−p)-bit suffix + 1; registers take the max — max is
    * commutative/associative/idempotent, so the sketch is order- and
    * partitioning-invariant by construction AND duplicate-insensitive
    * (re-reducing the same key is a no-op, which is the whole trick:
    * distinct-count without a distinct).
    *
    * Cross-engine determinism of the ESTIMATE: the harmonic sum
    * Σ 2^−M[j] is kept EXACT by scaling to integers — each register
    * contributes 2^(wBits+1−M[j]) ∈ [1, 2^(wBits+1)], and m·2^(wBits+1)
    * ≤ 2^61 fits a signed 64-bit, so the sum is an order-invariant
    * BIGINT both engines materialize identically. The final estimate is
    * one fixed chain of correctly-rounded double ops on that integer
    * (and the linear-counting branch's single ln lands under the
    * query's round, the q93/q128 argument).
    *
    * Scale role: per-group distinct at 100 TB without the
    * count-distinct shuffle of raw keys — each partition reduces to a
    * 2^p-byte register array, partial buffers merge element-wise, and
    * the relative error is the classic 1.04/√m. `p` is the declared
    * accuracy-vs-buffer knob. Spark's own `approx_count_distinct` is
    * the same algorithm (HLL++) but its bias-corrected estimate is not
    * oracle-replayable; this one is, bit-for-bit.
    */
  class HllAggregator(p: Int)
      extends Aggregator[Long, Array[Int], Double] {
    require(p >= 4 && p <= 16, "p must be in [4, 16]")
    private val m = 1 << p
    private val wBits = 60 - p          // suffix width
    private val maxRho = wBits + 1      // ρ when the suffix is all zeros

    override def zero: Array[Int] = new Array[Int](m)

    override def reduce(b: Array[Int], h: Long): Array[Int] = {
      val bucket = (h >>> wBits).toInt
      val w = h & ((1L << wBits) - 1)
      // ρ = leading zeros of the wBits-wide suffix + 1; nlz is over the
      // full 64-bit word, of which the top (64 − wBits) are always zero
      val rho = if (w == 0L) maxRho
                else java.lang.Long.numberOfLeadingZeros(w) - (64 - wBits) + 1
      if (rho > b(bucket)) b(bucket) = rho
      b
    }

    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def finish(regs: Array[Int]): Double = {
      // exact integer harmonic sum: Σ 2^(maxRho − M[j]), ≤ m·2^maxRho ≤ 2^61
      var s = 0L
      var v = 0
      var i = 0
      while (i < m) {
        s += (1L << (maxRho - regs(i)))
        if (regs(i) == 0) v += 1
        i += 1
      }
      // one fixed left-assoc chain, mirrored token-for-token in the oracle.
      // α_m per the HLL paper: closed-form 0.7213/(1+1.079/m) holds only
      // for m ≥ 128; the small-m constants are tabulated (Flajolet §4).
      val md = m.toDouble
      val alpha = m match {
        case 16 => 0.673
        case 32 => 0.697
        case 64 => 0.709
        case _  => 0.7213 / (1.0 + 1.079 / md)
      }
      val raw = alpha * md * md * (1L << maxRho).toDouble / s.toDouble
      if (raw <= 2.5 * md && v > 0) md * math.log(md / v) else raw
    }

    override def bufferEncoder: Encoder[Array[Int]] =
      ExpressionEncoder[Array[Int]]()
    override def outputEncoder: Encoder[Double] =
      ExpressionEncoder[Double]()
  }

  /** [[HllAggregator]] variant that finishes to the RAW REGISTER ARRAY
    * instead of the estimate — the persistable "sketch column" of the
    * warehouse rollup pattern: aggregate once at the finest grain,
    * store 2^p small ints per group, and any coarser rollup merges the
    * stored registers (element-wise max, [[HllMergeAggregator]])
    * without touching raw data again. finish(registers) of the merge
    * equals the direct estimate by the max-merge law (spec-pinned).
    */
  class HllSketchAggregator(p: Int)
      extends Aggregator[Long, Array[Int], Seq[Int]] {
    private val inner = new HllAggregator(p)
    override def zero: Array[Int] = inner.zero
    override def reduce(b: Array[Int], h: Long): Array[Int] = inner.reduce(b, h)
    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = inner.merge(a, b)
    override def finish(r: Array[Int]): Seq[Int] = r.toSeq
    override def bufferEncoder: Encoder[Array[Int]] =
      ExpressionEncoder[Array[Int]]()
    override def outputEncoder: Encoder[Seq[Int]] =
      ExpressionEncoder[Seq[Int]]()
  }

  /** Rollup half of the sketch-column pattern: input rows are STORED
    * register arrays, merge is the same element-wise max, finish is the
    * same estimate chain as [[HllAggregator]] — so a rollup over sketch
    * columns is bit-identical to having aggregated the raw keys at the
    * coarser grain directly (max is associative/idempotent).
    */
  class HllMergeAggregator(p: Int)
      extends Aggregator[Seq[Int], Array[Int], Double] {
    private val inner = new HllAggregator(p)
    private val m = 1 << p
    override def zero: Array[Int] = inner.zero
    override def reduce(b: Array[Int], regs: Seq[Int]): Array[Int] = {
      require(regs.length == m, s"expected $m registers, got ${regs.length}")
      var i = 0
      while (i < m) { if (regs(i) > b(i)) b(i) = regs(i); i += 1 }
      b
    }
    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = inner.merge(a, b)
    override def finish(r: Array[Int]): Double = inner.finish(r)
    override def bufferEncoder: Encoder[Array[Int]] =
      ExpressionEncoder[Array[Int]]()
    override def outputEncoder: Encoder[Double] =
      ExpressionEncoder[Double]()
  }

  /** Count-Min sketch (Cormode & Muthukrishnan, J.Alg 2005) — the
    * frequency sibling of [[HllAggregator]]: point-queryable counts in
    * a fixed d×w integer table with one-sided error (estimates never
    * undercount; overcount ≤ εN with prob 1−δ for w = ⌈e/ε⌉,
    * d = ⌈ln 1/δ⌉).
    *
    * Like the Bloom bitmap, the HASHING lives outside the aggregator in
    * column space (md5-derived buckets the oracle recomputes
    * identically) — input rows are the d bucket indices, the buffer is
    * the flattened counter table, reduce is d increments, merge is
    * element-wise add. Integer sums are order- and partitioning-
    * invariant, so the materialized sketch is exact — not just the
    * estimates but every cell — and the whole structure is
    * oracle-replayable (each cell = Σ counts of keys colliding there).
    *
    * Scale role: the shuffle carries O(partitions · d·w · 8 bytes)
    * regardless of rows or key cardinality; the finished one-row sketch
    * broadcasts to probe ANY key stream without rescanning the fact —
    * the streaming/approx answer to "how often did X occur" at 100 TB.
    */
  class CmsAggregator(d: Int, w: Int)
      extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
    require(d > 0 && w > 0 && d * w <= (1 << 22), "sketch too large")

    override def zero: Array[Long] = new Array[Long](d * w)

    override def reduce(b: Array[Long], buckets: Seq[Long]): Array[Long] = {
      require(buckets.length == d, s"expected $d bucket indices, got ${buckets.length}")
      var j = 0
      while (j < d) {
        val col = buckets(j)
        require(col >= 0 && col < w, s"bucket $col out of [0, $w)")
        b(j * w + col.toInt) += 1L
        j += 1
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(r: Array[Long]): Array[Long] = r

    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }
}
