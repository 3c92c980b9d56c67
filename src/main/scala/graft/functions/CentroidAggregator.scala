package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2B "custom typed UDAF" row): element-wise mean
  * of float-vector embeddings — the centroid op a training pipeline uses
  * for cluster seeding / class prototypes.
  *
  * Buffer is (per-dim double sums, count): fixed-size, cheap to
  * serialize, and merge is element-wise add — so Spark runs it as a
  * partial/final aggregation (map-side combine shuffles ONE buffer per
  * group per partition, never the raw vectors; at 100 TB that is the
  * difference between shuffling KBs and shuffling the dataset).
  *
  * Dimension is taken from the first vector seen; mismatched input
  * dimensions fail fast rather than silently zip-truncating.
  */
class CentroidAggregator extends Aggregator[Seq[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    val sums = if (b._2 == 0L) new Array[Double](v.length) else b._1
    require(sums.length == v.length,
      s"embedding dimension mismatch: ${sums.length} vs ${v.length}")
    var i = 0
    while (i < v.length) { sums(i) += v(i); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._2 == 0L) b
    else if (b._2 == 0L) a
    else {
      require(a._1.length == b._1.length,
        s"embedding dimension mismatch: ${a._1.length} vs ${b._1.length}")
      val sums = a._1.clone()
      var i = 0
      while (i < sums.length) { sums(i) += b._1(i); i += 1 }
      (sums, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0L) Array.emptyDoubleArray else r._1.map(_ / r._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
