package graft

import java.nio.file.Files

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ingestion robustness — what a feed pipeline meets in practice: the
  * reference forwards frames opaquely and corrupt payloads surface only
  * downstream, so the engine's scan layer must offer all three malformed-
  * record policies (capture / drop / fail) plus schema evolution across
  * files written at different times.
  */
class ScanRobustnessSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def writeJsonLines(): String = {
    val dir = Files.createTempDirectory("graft_badjson_").toString
    val lines = Seq(
      """{"id": 1, "v": 10.5}""",
      """{"id": 2, "v": 20.5}""",
      """{"id": 3, "v": """, // truncated — malformed
      """not json at all""",
      """{"id": 4, "v": 40.0}""")
    Files.write(java.nio.file.Paths.get(dir, "part.json"),
      lines.mkString("\n").getBytes)
    dir
  }

  test("PERMISSIVE scan captures malformed JSON rows in _corrupt_record") {
    val dir = writeJsonLines()
    val df = spark.read
      .schema("id BIGINT, v DOUBLE, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .json(dir)
      .cache() // corrupt-record column must not be queried alone (Spark guards it)
    try {
      assert(df.count() == 5)
      assert(df.filter(col("_corrupt_record").isNotNull).count() == 2)
      assert(df.filter(col("id").isNotNull).count() == 3)
      assert(df.agg(sum("v")).head.getDouble(0) == 71.0)
    } finally df.unpersist()
  }

  test("DROPMALFORMED scan keeps only the parseable rows") {
    val dir = writeJsonLines()
    val df = spark.read
      .schema("id BIGINT, v DOUBLE")
      .option("mode", "DROPMALFORMED")
      .json(dir)
    assert(df.count() == 3)
    assert(df.agg(sum("v")).head.getDouble(0) == 71.0)
  }

  test("FAILFAST scan raises on the first malformed row") {
    val dir = writeJsonLines()
    val ex = intercept[SparkException] {
      spark.read
        .schema("id BIGINT, v DOUBLE")
        .option("mode", "FAILFAST")
        .json(dir)
        .count()
    }
    assert(ex.getMessage.contains("FAILFAST") || ex.getCause != null)
  }

  test("parquet mergeSchema unions columns written at different times") {
    // schema evolution: an early writer knew (id, x); a later one added y.
    val dir = Files.createTempDirectory("graft_evolve_").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "x")
      .write.mode("overwrite").parquet(s"$dir/w=1")
    Seq((3L, "c", 30.0), (4L, "d", 40.0)).toDF("id", "x", "y")
      .write.mode("overwrite").parquet(s"$dir/w=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "w", "x", "y"))
    assert(merged.count() == 4)
    // rows from the old schema surface y as null, not as an error
    assert(merged.filter(col("y").isNull).count() == 2)
    assert(merged.agg(sum("y")).head.getDouble(0) == 70.0)
  }
}
