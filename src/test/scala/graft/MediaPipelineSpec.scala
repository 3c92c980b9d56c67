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

  test("audio framing: hand-computed features, overlap bookkeeping, short-payload edge") {
    import graft.operators.MediaMeta
    // 20 bytes, frameLen 16, hop 8 → exactly ONE frame (start 8 would
    // need bytes 8..23); samples = byte − 128
    val bytes = Array.tabulate(20)(i => (120 + i * 2).toByte) // v = -8,-6,…
    val rec = MediaRecord(7L, "audio", bytes, MediaMeta("en", 20L, 320, 240))
    val ds = spark.createDataset(Seq(rec))
    val rows = MediaPipeline.frameAudio(ds, frameLen = 16, hop = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val vs = (0 until 16).map(i => (bytes(i) & 0xff) - 128)
    val energy = vs.map(v => v.toLong * v).sum
    val peak = vs.map(math.abs).max.toLong
    val zc = vs.sliding(2).count { case Seq(a, b) => a * b < 0 }
    assert(rows.toSeq == Seq((7L, 0L, energy, peak, zc.toLong)))
    // 31 bytes → frames at 0 and 8 only ((31−16)/8+1 = 2); 15 bytes → none
    val r31 = MediaRecord(8L, "audio", Array.fill(31)(130.toByte), MediaMeta("en", 31L, 1, 1))
    assert(MediaPipeline.frameAudio(spark.createDataset(Seq(r31)), 16, 8).count() == 2L)
    val r15 = MediaRecord(9L, "audio", Array.fill(15)(130.toByte), MediaMeta("en", 15L, 1, 1))
    assert(MediaPipeline.frameAudio(spark.createDataset(Seq(r15)), 16, 8).count() == 0L)
  }

  test("stubTap == materialized pixelStub for every index (lazy-tap resize is exact)") {
    // the resize kernel reads the stub plane through stubTap instead of
    // materializing W×H floats; this pins the equivalence for every
    // shape class: plane longer than blob (LUT tiles), plane shorter
    // than blob (prefix), equal, and the empty-blob zero plane
    val blobs = Seq(
      Array.tabulate[Byte](37)(i => (i * 7 + 3).toByte), // prime-ish period
      Array.tabulate[Byte](256)(i => i.toByte),           // full byte range
      Array.empty[Byte])
    val dims = Seq((8, 8), (16, 4), (5, 3), (1, 1), (30, 2))
    for (blob <- blobs; (w, h) <- dims) {
      val plane = MediaPipeline.pixelStub(blob, w, h)
      (0 until w * h).foreach { i =>
        assert(plane(i) == MediaPipeline.stubTap(blob, i),
          s"tap($i) diverges from plane for len=${blob.length} ${w}x$h")
      }
    }
  }

  test("bilinear resize: exact on constants and affine ramps, right dims, identity at same size") {
    import graft.operators.MediaMeta
    // a constant plane must resize to exactly that constant (bilinear
    // weights sum to 1), and a horizontal linear ramp must interpolate
    // EXACTLY at the center-aligned sample points — the two algebraic
    // identities that pin the kernel's weights and alignment
    def rec(id: Long, blob: Array[Byte], w: Int, h: Int) =
      MediaRecord(id, "image", blob, MediaMeta("en", blob.length.toLong, w, h))
    // constant plane: every byte the same value
    val const = spark.createDataset(Seq(rec(1L, Array.fill[Byte](64)(100.toByte), 8, 8)))
    val rc = MediaPipeline.resize(const, 3, 5).collect()(0)
    assert(rc.out_w == 3 && rc.out_h == 5 && rc.pixels.length == 15)
    val expectedConst = (100 & 0xff) / 255.0f
    assert(rc.pixels.forall(_ == expectedConst),
      s"constant plane not preserved: ${rc.pixels.toSeq.distinct}")
    // horizontal ramp p(x) = x/255 on a 16x4 plane (bytes 0..15 repeat
    // row-major, so pixel value depends only on x)
    val rampBytes = Array.tabulate[Byte](64)(i => (i % 16).toByte)
    val ramp = spark.createDataset(Seq(rec(2L, rampBytes, 16, 4)))
    val rr = MediaPipeline.resize(ramp, 8, 4).collect()(0)
    // center-aligned: out x samples src at fx = (x + .5) * 2 - .5
    (0 until 8).foreach { x =>
      val fx = (x + 0.5) * 16 / 8 - 0.5
      val x0 = math.max(0, math.min(15, math.floor(fx).toInt))
      val x1 = math.min(15, x0 + 1)
      val wx = math.max(0.0, math.min(1.0, fx - x0))
      val want = ((x0 / 255.0f) * (1 - wx) + (x1 / 255.0f) * wx).toFloat
      (0 until 4).foreach { y =>
        assert(rr.pixels(y * 8 + x) == want,
          s"ramp mis-interpolated at ($x,$y): ${rr.pixels(y * 8 + x)} vs $want")
      }
    }
    // identity: same-size resize is the unmodified plane (fx lands
    // exactly on source centers, so the ramp values come back verbatim)
    val id = MediaPipeline.resize(ramp, 16, 4).collect()(0)
    (0 until 16).foreach { x =>
      (0 until 4).foreach { y =>
        assert(id.pixels(y * 16 + x) == x / 255.0f,
          s"identity resize changed ($x,$y): ${id.pixels(y * 16 + x)}")
      }
    }
    // and the fixture flows through distributed with the declared dims
    val sampled = MediaPipeline.resize(media, 32, 24)
    val rows = sampled.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.out_w == 32 && r.out_h == 24 && r.pixels.length == 32 * 24)
      assert(r.pixels.forall(p => p >= 0.0f && p <= 1.0f), "pixel out of range")
    }
  }
}
