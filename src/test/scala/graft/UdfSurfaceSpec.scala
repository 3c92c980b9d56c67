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
}
