package graft

import graft.operators.KMeans
import org.scalatest.funsuite.AnyFunSuite

/** KMeans.fit vs an in-memory reimplementation of the SAME declared
  * trajectory (smallest-id seeds, squared-euclidean argmin with ties to
  * the smaller cid, round-6 centroid snapping): the distributed operator
  * must reproduce it exactly — that determinism is what lets the q77
  * DuckDB oracle replay the trajectory, so it is pinned here against an
  * independent Scala mirror too.
  */
class KMeansSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The declared trajectory, sequentially: returns (assignments,
    * centroids) after `iters` assign-then-update rounds.
    */
  private def fitLocal(vecs: Seq[(Long, Array[Float])], k: Int, iters: Int)
      : (Map[Long, Int], Map[Int, Seq[Double]]) = {
    var cents: Map[Int, Array[Double]] =
      vecs.sortBy(_._1).take(k).zipWithIndex
        .map { case ((_, v), i) => (i + 1) -> v.map(_.toDouble) }.toMap
    var asg: Map[Long, Int] = Map.empty
    for (_ <- 1 to iters) {
      asg = vecs.map { case (id, v) =>
        id -> cents.toSeq.map { case (cid, c) =>
          var d = 0.0; var i = 0
          while (i < v.length) { val z = v(i).toDouble - c(i); d += z * z; i += 1 }
          (d, cid)
        }.min._2 // lexicographic: min distance, tie -> smaller cid
      }.toMap
      cents = vecs.groupBy(p => asg(p._1)).map { case (cid, ms) =>
        val dim = ms.head._2.length
        val sums = new Array[Double](dim)
        ms.foreach { case (_, v) =>
          var i = 0; while (i < dim) { sums(i) += v(i); i += 1 }
        }
        cid -> sums.map(s => r6(s / ms.size))
      }
    }
    (asg, cents.view.mapValues(_.toSeq).toMap)
  }

  test("fit reproduces the sequential trajectory on the fixture (k=4, 3 iters)") {
    val emb = Tables.embeddings(spark, SparkTestSession.sf0001)
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toSeq
    val (wantAsg, wantCents) = fitLocal(vecs, k = 4, iters = 3)
    val (asg, cents) = KMeans.fit(emb, k = 4, iters = 3)
    val gotAsg = asg.select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(gotAsg == wantAsg, "assignment diverged from the sequential trajectory")
    val gotCents = cents.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(gotCents == wantCents, "centroids diverged from the sequential trajectory")
  }

  test("assignments carry every vector exactly once") {
    val emb = Tables.embeddings(spark, SparkTestSession.sf0001)
    val (asg, _) = KMeans.fit(emb, k = 8, iters = 1)
    assert(asg.count() == emb.count())
    assert(asg.select("vec_id").distinct().count() == emb.count())
  }

  test("empty clusters drop out and later iterations still run") {
    // seeds are the 3 smallest ids; ids 0 and 1 are IDENTICAL points, so
    // every vector ties between c1 and c2 -> all go to the smaller cid,
    // cluster 2 ends empty after round 1 and must vanish (no re-seeding)
    val pts: Seq[(Long, Array[Float])] = Seq(
      0L -> Array(0f, 0f), 1L -> Array(0f, 0f), 2L -> Array(10f, 10f),
      3L -> Array(0.1f, 0f), 4L -> Array(10f, 9.9f), 5L -> Array(9.9f, 10f))
    val df = pts.toDF("vec_id", "embedding")
    val (asg, cents) = KMeans.fit(df, k = 3, iters = 2)
    val cids = cents.select("cid").collect().map(_.getInt(0)).toSet
    assert(cids == Set(1, 3), s"expected cluster 2 to drop out, got $cids")
    val byCid = asg.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(byCid.values.toSet == Set(1, 3))
    assert(byCid(2L) == 3 && byCid(4L) == 3 && byCid(5L) == 3)
    assert(byCid(0L) == 1 && byCid(1L) == 1 && byCid(3L) == 1)
  }
}
