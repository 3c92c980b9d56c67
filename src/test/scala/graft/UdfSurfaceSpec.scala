package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The classic registered-Scala-UDF surface (§2B "scalar UDF" row). The
  * engine's own hot paths use built-ins or native Catalyst expressions
  * (SURVEY §4.2's preference order — a UDF is a codegen black box with
  * per-row serialization), but the registration surface must exist and
  * agree with the built-in formulation for users who bring their own
  * logic.
  */
class UdfSurfaceSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("registered scalar UDF agrees with the built-in formulation") {
    spark.udf.register("tok_count", (s: String) =>
      if (s == null) 0 else s.split(' ').length)
    val both = Tables.documents(spark, SparkTestSession.sf0001)
      .selectExpr("doc_id", "tok_count(text) AS via_udf",
        "size(split(text, ' ')) AS via_builtin")
    assert(both.filter($"via_udf" =!= $"via_builtin").count() == 0)
    assert(both.count() > 0)
  }

  test("UDF null-handling: primitive-returning UDF must see nulls handled") {
    spark.udf.register("len_or_zero", (s: String) => if (s == null) 0 else s.length)
    val r = spark.sql("SELECT len_or_zero(CAST(NULL AS STRING)) AS n").collect()(0)
    assert(r.getInt(0) == 0)
  }

  test("native word_multi_count equals a stack of word_set_count columns") {
    // the fused one-pass q48 kernel vs the per-profile kernel it
    // replaced — overlapping profiles (a word in TWO sets) included
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val word = Gen.oneOf("the", "a", "der", "und", "å", "日本", "x1", "", "key", "zz")
    val genArr = Gen.listOfN(30, word).map(_.take(scala.util.Random.nextInt(31)))
    val cases = Gen.listOfN(60, genArr).apply(Gen.Parameters.default, Seed(11L)).get
    val rows = cases.toDF("ws")
      .selectExpr(
        "word_multi_count(ws, array(array('the', 'a'), array('a', '日本', 'absent'), array('zz'))) AS multi",
        "word_set_count(ws, array('the', 'a')) AS s0",
        "word_set_count(ws, array('a', '日本', 'absent')) AS s1",
        "word_set_count(ws, array('zz')) AS s2")
      .collect()
    rows.foreach { r =>
      val m = r.getSeq[Int](0)
      assert(m == Seq(r.getInt(1), r.getInt(2), r.getInt(3)),
        s"word_multi_count $m != (${r.getInt(1)}, ${r.getInt(2)}, ${r.getInt(3)})")
    }
  }

  test("native subword_est equals the interpreted aggregate formulation") {
    val rows = Tables.documents(spark, SparkTestSession.sf0001)
      .withColumn("ws", split($"text", " "))
      .selectExpr(
        "subword_est(ws) AS native",
        "aggregate(ws, 0, (acc, w) -> acc + cast(ceil(char_length(w) / 4.0) as int)) AS hof")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1),
      s"subword_est ${r.getInt(0)} != aggregate ${r.getInt(1)}"))
  }

  test("native word_set_count equals the interpreted filter/IN formulation (scalacheck)") {
    // the q48/q49 hot-path kernel cross-checked against Spark's own
    // higher-order filter on generated word arrays — duplicates, empties,
    // unicode, and set members that never occur all included
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val word = Gen.oneOf("the", "a", "der", "und", "å", "日本", "x1", "", "key", "zz")
    val genArr = Gen.listOfN(30, word).map(_.take(scala.util.Random.nextInt(31)))
    val cases = Gen.listOfN(60, genArr).apply(Gen.Parameters.default, Seed(7L)).get
    val rows = cases.toDF("ws")
      .selectExpr(
        "word_set_count(ws, array('the', 'a', '日本', 'absent')) AS native",
        "size(filter(ws, w -> w IN ('the', 'a', '日本', 'absent'))) AS hof")
      .collect()
    assert(rows.length == 60)
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1),
      s"word_set_count ${r.getInt(0)} != filter/IN ${r.getInt(1)}"))
  }
}
