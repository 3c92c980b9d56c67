package graft

import java.nio.file.Files

import graft.operators.{MediaPipeline, MediaRecord}
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing (q52's companion): the binary+struct schema
  * round-trips Parquet losslessly, the mapPartitions decode path
  * produces deterministic features without materializing partitions,
  * and frame sampling preserves byte identity.
  */
class MediaPipelineSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def media = MediaPipeline.fromDocuments(
    spark, Tables.documents(spark, SparkTestSession.sf0001))

  test("binary + struct metadata round-trips parquet losslessly") {
    val dir = Files.createTempDirectory("media_rt").toString
    media.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).as[MediaRecord]
    val a = media.collect().map(r => r.doc_id -> r).toMap
    val b = back.collect().map(r => r.doc_id -> r).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, r) =>
      assert(java.util.Arrays.equals(r.blob, b(id).blob), s"blob changed for doc $id")
      assert(r.meta == b(id).meta, s"metadata changed for doc $id")
    }
  }

  test("decode+featurize is deterministic and keys/widths survive") {
    val f1 = MediaPipeline.decodeAndFeaturize(media).collect().sortBy(_.doc_id)
    val f2 = MediaPipeline.decodeAndFeaturize(media).collect().sortBy(_.doc_id)
    assert(f1.length == media.count())
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.checksum == b.checksum && a.feature.toSeq == b.feature.toSeq,
        s"nondeterministic decode for doc ${a.doc_id}")
    }
    f1.foreach { f =>
      assert(f.feature.length == 16)
      assert(f.n_bytes > 0 && f.n_frames >= 1)
      assert(f.width >= 320 && f.height >= 240)
    }
  }

  test("frame sampling preserves byte identity of kept frames") {
    val rec = media.filter(_.doc_id == 0).collect()(0)
    val frames = MediaPipeline.sampleFrames(media.filter(_.doc_id == 0), 32, 2)
      .collect().map(r => (r.getInt(1), r.getAs[Array[Byte]](2))).toMap
    assert(frames.nonEmpty)
    frames.foreach { case (f, bytes) =>
      assert(f % 2 == 0, "stride not applied")
      assert(java.util.Arrays.equals(bytes, rec.blob.slice(f * 32, (f + 1) * 32)),
        s"frame $f bytes corrupted")
    }
  }
}
