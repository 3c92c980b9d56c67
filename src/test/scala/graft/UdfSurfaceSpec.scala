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

  test("a word duplicated WITHIN one profile counts once (set semantics, like IN)") {
    val r = spark.sql(
      """SELECT
        |  word_multi_count(array('a', 'b', 'a'), array(array('a', 'a', 'b'))) AS dup,
        |  word_set_count(array('a', 'b', 'a'), array('a', 'a', 'b')) AS single
        |""".stripMargin).collect()(0)
    assert(r.getSeq[Int](0) == Seq(3) && r.getInt(1) == 3,
      s"duplicate profile word inflated the count: ${r.getSeq[Int](0)} vs ${r.getInt(1)}")
  }

  test("native kernels treat null array elements as absent/empty, never crash or corrupt") {
    // split()/trigram outputs never carry nulls, but the functions are
    // SQL-registered — arbitrary arrays must degrade per the documented
    // policy: sketches skip null elements; positional kernels read ''
    val r = spark.sql(
      """SELECT
        |  minhash_sig(array('a', cast(null as string), 'b'), 4) AS ms_n,
        |  minhash_sig(array('a', 'b'), 4) AS ms,
        |  minhash_sig(array(cast(null as bigint), 5L), 4) AS ml_n,
        |  minhash_sig(array(5L), 4) AS ml,
        |  simhash62(array('a', cast(null as string))) AS sh_n,
        |  simhash62(array('a')) AS sh,
        |  subword_est(array('abcd', cast(null as string))) AS sw_n,
        |  subword_est(array('abcd')) AS sw,
        |  word_set_count(array('a', cast(null as string)), array('a')) AS wc,
        |  word_multi_count(array('a', cast(null as string)), array(array('a'))) AS wm,
        |  shingles3(array('a', cast(null as string), 'b')) AS s3_n,
        |  shingles3(array('a', '', 'b')) AS s3,
        |  gram5_md5(array('a', 'b', 'c', cast(null as string), 'e')) AS g5_n,
        |  gram5_md5(array('a', 'b', 'c', '', 'e')) AS g5
        |""".stripMargin).collect()(0)
    assert(r.getSeq[Long](0) == r.getSeq[Long](1), "string minhash: null not absent")
    assert(r.getSeq[Long](2) == r.getSeq[Long](3), "long minhash: null not absent")
    assert(r.getLong(4) == r.getLong(5), "simhash: null not absent")
    assert(r.getInt(6) == r.getInt(7), "subword_est: null not zero")
    assert(r.getInt(8) == 1 && r.getSeq[Int](9) == Seq(1), "counters crashed on null")
    assert(r.getSeq[String](10) == r.getSeq[String](11), "shingles3: null not ''")
    assert(r.getSeq[Long](12) == r.getSeq[Long](13), "gram5_md5: null not ''")
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
