package graft

import java.security.MessageDigest
import java.util.zip.CRC32

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spark-specific hash functions (xxhash64, crc32, hash) that q38 can't
  * oracle-check against DuckDB, verified against independent references:
  * crc32 against java.util.zip.CRC32, md5/sha2 against MessageDigest,
  * xxhash64/hash against determinism + distinctness + pinned goldens
  * (pinning guards cross-version stability of persisted hash keys —
  * these values are part of the engine's on-disk contract once used for
  * bucketing or dedup).
  */
class HashFnsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val inputs = Seq("", "abc", "graft", "The quick brown fox")

  test("crc32 matches java.util.zip.CRC32") {
    val got = inputs.toDF("s").select($"s", crc32($"s".cast("binary")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    inputs.foreach { s =>
      val ref = new CRC32()
      ref.update(s.getBytes("UTF-8"))
      assert(got(s) == ref.getValue, s"crc32($s)")
    }
  }

  test("md5 and sha2-256 match MessageDigest") {
    def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
    val got = inputs.toDF("s")
      .select($"s", md5($"s".cast("binary")).as("m"), sha2($"s".cast("binary"), 256).as("h"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    inputs.foreach { s =>
      val m = hex(MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")))
      val h = hex(MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8")))
      assert(got(s) == (m, h), s"md5/sha2($s)")
    }
  }

  test("xxhash64 is deterministic, input-sensitive, and stable across runs") {
    val df = inputs.toDF("s").select($"s", xxhash64($"s").as("x"))
    val a = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b, "xxhash64 not deterministic within a session")
    assert(a.values.toSet.size == inputs.size, "xxhash64 collided on tiny input set")
  }

  test("xxhash64 and hash match pinned goldens (on-disk key stability)") {
    // Pinned from Spark 4.1.2 — these values become part of the engine's
    // persisted contract the moment a bucketing/dedup key is written with
    // them; a Spark upgrade that shifts any of these must be caught here.
    val goldens = Map(
      "" -> (-7444071767201028348L, 142593372),
      "abc" -> (1423657621850124518L, 1322437556),
      "graft" -> (-4815631219266125053L, -1930494102))
    val got = goldens.keys.toSeq.toDF("s")
      .select($"s", xxhash64($"s").as("xx"), hash($"s").as("m3"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    goldens.foreach { case (s, expected) =>
      assert(got(s) == expected, s"golden mismatch for '$s'")
    }
  }

  test("hash (murmur3) and xxhash64 agree between codegen and constant folding") {
    // The column path must come from a real parquet scan: a LocalRelation
    // would be constant-folded by ConvertToLocalRelation, making both
    // sides interpreted eval. Divergence would mean hash-derived keys
    // (buckets, dedup ids) depend on which execution path produced them.
    val doc0 = Tables.documents(spark, SparkTestSession.sf0001)
      .filter($"doc_id" === 0)
    val r = doc0.select(hash($"text").as("m3"), xxhash64($"text").as("xx")).collect()(0)
    val (m3, xx) = (r.getInt(0), r.getLong(1))
    val text = doc0.select($"text").collect()(0).getString(0)
    assert(!text.contains("'"), "fixture text must be quotable as a SQL literal")
    val lit = spark.sql(s"SELECT hash('$text') AS m3, xxhash64('$text') AS xx").collect()(0)
    assert(lit.getInt(0) == m3 && lit.getLong(1) == xx)
  }
}
