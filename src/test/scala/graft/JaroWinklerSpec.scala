package graft

import graft.functions.JaroWinkler
import org.scalatest.funsuite.AnyFunSuite

/** The native `jaro_winkler` kernel against the published reference
  * values (Winkler '90 / the canonical test pairs every implementation
  * quotes), plus the algebraic properties a similarity must hold and
  * the codegen/interpreted agreement q61's kernel established as the
  * house standard. Cross-engine value agreement with DuckDB's
  * independent implementation is gated by q186.
  */
class JaroWinklerSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private val eps = 1e-12
  private def ref(a: String, b: String, want: Double): Unit =
    assert(math.abs(JaroWinkler.sim(a, b) - want) < eps,
      s"sim($a, $b) = ${JaroWinkler.sim(a, b)}, want $want")

  test("canonical reference pairs") {
    ref("MARTHA", "MARHTA", 0.9611111111111111)
    ref("DIXON", "DICKSONX", 0.8133333333333332)
    ref("JELLYFISH", "SMELLYFISH", 0.8962962962962964)
    ref("same", "same", 1.0)
    ref("", "abc", 0.0)
    ref("abc", "", 0.0)
    ref("a", "b", 0.0)
  }

  test("Winkler boost gated on jaro > 0.7 (DuckDB/rapidfuzz threshold)") {
    // jaro("ab","ax") = (1/2 + 1/2 + 1)/3 = 2/3 <= 0.7 — the shared
    // 1-char prefix must NOT boost it to 0.7 (DuckDB 1.0.0: 0.666667).
    ref("ab", "ax", 2.0 / 3.0)
    // Just over the threshold the boost applies: jaro("abcd","abce") =
    // (3/4 + 3/4 + 1)/3 = 5/6 > 0.7, prefix 3 → 5/6 + 0.3·(1/6).
    ref("abcd", "abce", 5.0 / 6.0 + 0.3 * (1.0 / 6.0))
  }

  test("bounded, symmetric, identity") {
    val ss = Seq("martha", "marhta", "dixon", "dicksonx", "a", "", "Customer#01")
    for (a <- ss; b <- ss) {
      val s = JaroWinkler.sim(a, b)
      assert(s >= 0.0 && s <= 1.0, s"sim($a,$b)=$s out of [0,1]")
      assert(s == JaroWinkler.sim(b, a), s"asymmetric on ($a, $b)")
      if (a == b) assert(s == 1.0)
    }
  }

  test("null propagates; non-string types rejected") {
    val r = spark.sql("SELECT jaro_winkler(CAST(NULL AS STRING), 'x')").collect()(0)
    assert(r.isNullAt(0))
    val ex = intercept[Exception] {
      spark.sql("SELECT jaro_winkler(1, 'x')").collect()
    }
    assert(ex.getMessage != null)
  }

  test("codegen and interpreted paths agree bit-for-bit") {
    import spark.implicits._
    val pairs = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      ("jellyfish", "smellyfish"), ("Customer#000000001", "Customer#00000001"))
      .toDF("a", "b")
    pairs.createOrReplaceTempView("jw_pairs")
    def run(): Seq[Double] =
      spark.sql("SELECT jaro_winkler(a, b) FROM jw_pairs")
        .collect().map(_.getDouble(0)).toSeq
    val codegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted =
      try run()
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    assert(codegen == interpreted)
  }
}
