package graft

import graft.functions.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native `cosine_sim` Catalyst expression vs the higher-order
  * `VectorOps.cosine` formulation: identical semantics are a hard
  * requirement (q61 and q44 share one oracle), checked bit-for-bit with
  * NO rounding; plus null propagation, dimension-mismatch failure, and
  * codegen/interpreted agreement.
  */
class CosineSimSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def emb = Tables.embeddings(spark, SparkTestSession.sf0001)

  test("expression equals the zip_with/aggregate formulation bit-for-bit") {
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val both = emb.crossJoin(broadcast(q))
      .select(col("vec_id"),
        expr("cosine_sim(embedding, qv)").as("c_native"),
        VectorOps.cosine(col("embedding"), col("qv")).as("c_hof"))
    val diff = both.filter(
      $"c_native" =!= $"c_hof" &&
        // NaN != NaN; the vec_id=0 self-pair is cos=1.0, no NaN expected,
        // but guard the comparison anyway
        !(isnan($"c_native") && isnan($"c_hof"))).count()
    assert(diff == 0, s"$diff rows differ between native and higher-order cosine")
  }

  test("null input propagates to null output") {
    val r = spark.sql(
      "SELECT cosine_sim(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))").collect()(0)
    assert(r.isNullAt(0))
  }

  test("dimension mismatch fails loudly, not silently truncates") {
    val ex = intercept[Exception] {
      spark.sql(
        """SELECT cosine_sim(array(CAST(1.0 AS FLOAT)),
          |array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)))""".stripMargin).collect()
    }
    assert(ex.getMessage != null)
  }

  test("codegen and interpreted paths agree") {
    def run(): Seq[(Long, Double)] = {
      val q = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))
      emb.filter($"vec_id" =!= 0).crossJoin(broadcast(q))
        .selectExpr("vec_id", "cosine_sim(embedding, qv) AS c")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sortBy(_._1)
    }
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
