package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native `winnow_mins(text, k, w)` kernel (q315's fingerprint
  * stage) against an independent straight-line reference: md5-hex
  * k-grams, per-position window minima by lexicographic compare,
  * first-occurrence-distinct — the semantics the retired
  * min-over-WindowExec formulation had, which the DuckDB oracle still
  * replays. The kernel's monotonic deque and code-point indexing are
  * exactly what this spec pins (including a non-ASCII text, where
  * `substring` counts CODE POINTS, not bytes).
  */
class WinnowMinsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def refWinnow(text: String, k: Int, w: Int): Seq[String] = {
    // code-point indexed k-grams, like Spark's substring()
    val cps = text.codePoints().toArray
    val ng = cps.length - k + 1
    if (ng < w) return Seq.empty
    val md = MessageDigest.getInstance("MD5")
    val grams = (0 until ng).map { i =>
      val sub = new String(cps, i, k)
      md.digest(sub.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val out = scala.collection.mutable.LinkedHashSet[String]()
    (0 to ng - w).foreach(p => out += grams.slice(p, p + w).min)
    out.toSeq
  }

  private def kernel(text: String, k: Int, w: Int): Seq[String] =
    Seq(text).toDF("t")
      .select(expr(s"winnow_mins(t, $k, $w)").as("m"))
      .collect()(0).getSeq[String](0)

  test("matches the reference on ASCII texts across k/w") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and keeps running far",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", // degenerate: all grams equal
      "abcdefghijklmnopqrstuvwxyz0123456789abcdefghijklmnopqrstuvwxyz")
    for (t <- texts; (k, w) <- Seq((20, 8), (5, 3), (3, 2)))
      assert(kernel(t, k, w) == refWinnow(t, k, w), s"k=$k w=$w text=$t")
  }

  test("code-point indexing: non-ASCII text matches the reference") {
    val t = "héllo wörld ünïcode tèxt thát is lóng enough for grams"
    assert(kernel(t, 5, 3) == refWinnow(t, 5, 3))
  }

  test("short text (fewer than w windows) yields an empty array") {
    assert(kernel("tiny", 20, 8).isEmpty)
    // exactly one window: ng == w
    val t = "a" * (20 + 8 - 1)
    assert(kernel(t, 20, 8).size == 1)
  }

  test("fingerprint density is ~2/(w+1) of grams (winnowing guarantee)") {
    // aperiodic deterministic text (md5 hex stream) — a periodic text
    // repeats gram VALUES and collapses the distinct-minima count
    val md = MessageDigest.getInstance("MD5")
    val t = (0 until 13).flatMap(i =>
      md.digest(s"wm$i".getBytes("UTF-8")).map("%02x".format(_)).mkString)
      .mkString.take(400)
    val fps = kernel(t, 20, 8)
    val ng = t.length - 19
    // distinct minima of a random stream: expected 2n/(w+1); wide band
    assert(fps.size > ng / 20 && fps.size < ng, s"got ${fps.size} of $ng grams")
  }
}
