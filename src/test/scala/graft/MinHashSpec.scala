package graft

import graft.queries.DedupQueries
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Correctness evidence for the MinHash/LSH pipeline beyond the q41
  * oracle row:
  *  1. property: the 128-hash MinHash estimate (fraction of agreeing
  *     signature entries) concentrates near the true Jaccard of random
  *     generated sets — the statistical foundation the LSH banding rests
  *     on (E[estimate] = J, sd = sqrt(J(1-J)/128) ≤ 0.045);
  *  2. end-to-end: on sf0.001 the banded q41 plan reproduces the exact
  *     all-pairs Jaccard join — i.e. banding lost no qualifying pair.
  */
class MinHashSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val genSets: Gen[(Seq[String], Seq[String])] = for {
    shared <- Gen.chooseNum(5, 60)
    onlyA <- Gen.chooseNum(0, 40)
    onlyB <- Gen.chooseNum(0, 40)
  } yield {
    val s = (0 until shared).map(i => s"sh_$i")
    ((0 until onlyA).map(i => s"a_$i") ++ s, (0 until onlyB).map(i => s"b_$i") ++ s)
  }

  test("minhash agreement estimates Jaccard within 4.5 sigma (scalacheck)") {
    // One Spark job over a batch of generated pairs (per-case jobs would
    // be minutes of scheduling overhead for ms of work). Seeded so the
    // 4.5-sigma bound can't flake between runs.
    val cases = Gen.listOfN(40, genSets)
      .apply(Gen.Parameters.default, Seed(42L)).get
    val sig = "transform(sequence(0, 127), i -> array_min(transform(%s, s -> xxhash64(s, i))))"
    val rows = cases.toDF("a", "b")
      .select(
        expr(sig.format("a")).as("sa"), expr(sig.format("b")).as("sb"),
        (size(array_intersect($"a", $"b")).cast("double") /
          size(array_union($"a", $"b"))).as("jac"))
      .select(
        (expr("size(filter(zip_with(sa, sb, (x, y) -> x = y), v -> v))").cast("double") / 128.0).as("est"),
        $"jac")
      .collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      val (est, jac) = (r.getDouble(0), r.getDouble(1))
      val sigma = math.sqrt(jac * (1 - jac) / 128.0).max(0.01)
      assert(math.abs(est - jac) <= 4.5 * sigma,
        s"minhash estimate $est vs true jaccard $jac (4.5 sigma = ${4.5 * sigma})")
    }
  }

  test("trigram_hashes indexes by code point: non-BMP chars are never split") {
    // "ab😀cd" has 5 code points but 6 UTF-16 units; code-unit slicing
    // would produce trigrams holding half a surrogate pair, diverging
    // from DuckDB's code-point substr. Expect exactly the 3 code-point
    // trigrams, hashed over their UTF-8 bytes.
    import org.apache.spark.sql.catalyst.expressions.XXH64
    def h(s: String): Long = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      XXH64.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
    }
    val got = Seq("ab😀cd").toDF("t")
      .select(expr("trigram_hashes(t)")).collect()(0).getSeq[Long](0)
    val want = Seq("ab😀", "b😀c", "😀cd").map(h)
    assert(got == want, s"got $got, want $want")
  }

  test("minhash_sig over ARRAY<BIGINT> equals the per-slot min of seeded hashLong") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val vals = Seq(3L, 17L, 104729L, -9L)
    val got = Seq(vals).toDF("g")
      .select(expr("minhash_sig(g, 16)")).collect()(0).getSeq[Long](0)
    val want = (0 until 16).map(i => vals.map(v => XXH64.hashLong(v, i.toLong)).min)
    assert(got == want)
  }

  test("q42b banded trigram near-dup equals the exact all-pairs stats on sf0.001") {
    val dir = SparkTestSession.sf0001
    val banded = DedupQueries.q42bNgramJaccardBanded(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    // exact all-pairs reference on the SAME trigram-hash domain
    val grams = Tables.documents(spark, dir).select($"doc_id", $"source",
      expr("sort_array(trigram_hashes(text))").as("g"))
    val exact = grams.as("a")
      .join(grams.select($"source".as("bsource"), $"doc_id".as("bdoc"), $"g".as("gb")),
        $"a.source" === $"bsource" && $"a.doc_id" < $"bdoc")
      .withColumn("ic", expr("sorted_intersect_count(a.g, gb)"))
      .withColumn("jac", $"ic".cast("double") / (size($"a.g") + size($"gb") - $"ic"))
      .filter($"jac" >= 0.8)
      .groupBy($"a.source".as("source"))
      .agg(count(lit(1)).as("n_pairs"),
        round(avg("jac"), 5).as("avg_jac"), round(max("jac"), 6).as("max_jac"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(exact.nonEmpty, "fixture has no trigram near-dups — test is vacuous")
    assert(banded == exact, s"banding missed/invented pairs: got $banded, want $exact")
  }

  test("q41 banded LSH equals the exact all-pairs jaccard join on sf0.001") {
    val dir = SparkTestSession.sf0001
    val banded = DedupQueries.q41MinhashLsh(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val docs = Tables.documents(spark, dir).select($"doc_id",
      expr("""array_distinct(transform(
        |  sequence(0, size(split(text, ' ')) - 3),
        |  i -> concat_ws(' ', split(text, ' ')[i], split(text, ' ')[i+1], split(text, ' ')[i+2])))""".stripMargin).as("sh"))
    val exact = docs.as("a").join(docs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        round(size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh"))), 6).as("jac"))
      .filter($"jac" >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty, "fixture has no near-dup pairs — test is vacuous")
    assert(banded == exact,
      s"LSH missed ${exact -- banded} / false-kept ${banded -- exact}")
  }
}
