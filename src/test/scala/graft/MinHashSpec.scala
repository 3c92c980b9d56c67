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
