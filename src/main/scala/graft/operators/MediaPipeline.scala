package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed multimodal record: opaque binary payload + structured sidecar
  * metadata — the image/audio/video column shape (SURVEY.md §2B
  * "multimodal columns"). The payload is schema-opaque exactly like the
  * reference's frames (`/root/reference/src/wsclient.hpp:59` hands
  * `(const char*, size_t)` to the sink unparsed).
  */
case class MediaMeta(lang: String, n_chars: Long, width: Int, height: Int)
case class MediaRecord(doc_id: Long, media_type: String, blob: Array[Byte], meta: MediaMeta)

/** Decoded features per media record. `feature` is a fixed-width float
  * vector (what an encoder model would emit), so downstream similarity
  * search (SimilarityQueries) applies unchanged.
  */
case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Int,
    checksum: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    feature: Array[Float])

/** One resized single-channel plane (row-major `pixels`, out_w × out_h). */
case class ResizedMedia(
    doc_id: Long,
    media_type: String,
    src_w: Int,
    src_h: Int,
    out_w: Int,
    out_h: Int,
    pixels: Array[Float])

/** Multimodal decode / feature-extract / frame-sample plumbing.
  *
  * The actual codec is STUBBED (`decodeStub`): this container has no
  * image/audio libraries, so the stub produces deterministic fake pixels
  * from the payload bytes. Everything AROUND the stub is the real
  * production shape and is what the tests pin down:
  *  - typed binary + struct schema that round-trips Parquet losslessly;
  *  - `mapPartitions` execution — the decoder is invoked once per
  *    PARTITION with an iterator (per-batch codec/model initialization
  *    amortized across rows, the same batching contract as an Arrow/
  *    vectorized UDF), never per row and never on the driver;
  *  - lazy iterators end-to-end — a partition is never materialized as
  *    a list, so 100 GB of video in one partition streams through.
  */
object MediaPipeline {

  /** Manufacture media records from the documents fixture: text bytes
    * stand in for an encoded image; width/height are deterministic
    * pseudo-dimensions derived from the id.
    */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      encode(col("text"), "UTF-8").as("blob"),
      struct(
        col("lang"),
        col("n_chars"),
        (pmod(col("doc_id"), lit(8)) * 160 + 320).cast("int").as("width"),
        (pmod(col("doc_id"), lit(5)) * 120 + 240).cast("int").as("height")).as("meta"))
      .as[MediaRecord]
  }

  /** STUB decoder — deterministic fake in place of a real codec (no
    * image/audio libs in this environment). A production deployment
    * replaces ONLY this function (e.g. with a JNI codec or an Arrow UDF
    * calling into a vision encoder); signature and call site stay.
    */
  private[operators] def decodeStub(blob: Array[Byte], meta: MediaMeta): Array[Float] = {
    // "decode" = fold payload bytes into a 16-dim unit-ish embedding
    val dim = 16
    val acc = new Array[Float](dim)
    var i = 0
    while (i < blob.length) {
      acc(i % dim) += (blob(i) & 0xff) / 255.0f
      i += 1
    }
    val n = math.max(1, blob.length / dim)
    acc.map(_ / n)
  }

  /** Decode + feature-extract via mapPartitions: one decoder context per
    * partition, streamed row-at-a-time off the iterator.
    */
  def decodeAndFeaturize(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition init happens HERE (codec handles, model weights);
      // the stub needs none, but the shape is the contract
      it.map { r =>
        val feature = decodeStub(r.blob, r.meta)
        var checksum = 0L
        var i = 0
        while (i < r.blob.length) { checksum = checksum * 31 + (r.blob(i) & 0xff); i += 1 }
        MediaFeatures(r.doc_id, r.media_type, r.blob.length, checksum,
          r.meta.width, r.meta.height,
          n_frames = math.max(1, r.blob.length / 64), feature = feature)
      }
    }
  }

  /** STUB pixel decode — the W×H single-channel plane a real codec
    * would emit, manufactured deterministically from the payload bytes
    * (same replace-only contract as `decodeStub`).
    */
  private[graft] def pixelStub(blob: Array[Byte], w: Int, h: Int): Array[Float] = {
    val out = new Array[Float](w * h)
    if (blob.nonEmpty) {
      // pixel i = byte(i mod len)/255f — fill one period, then tile it
      // by doubling arraycopy (every copy starts at a multiple of the
      // period, so out(i) = lut(i mod len) is preserved exactly); a
      // megapixel plane fills at memcpy speed instead of a per-pixel
      // integer modulo
      val seed = math.min(blob.length, out.length)
      var i = 0
      while (i < seed) { out(i) = (blob(i) & 0xff) / 255.0f; i += 1 }
      var filled = seed
      while (filled < out.length) {
        val n = math.min(filled, out.length - filled)
        System.arraycopy(out, 0, out, filled, n)
        filled += n
      }
    }
    out
  }

  /** One stub-plane pixel on demand: `pixelStub(blob, w, h)(idx)` without
    * materializing the plane. The stub fills pixel i with
    * `blob(i mod len)/255f` (one LUT period tiled by arraycopy), so any
    * single tap is a pure function of (blob, idx) — bit-identical to
    * indexing the materialized plane, proven by `MediaPipelineSpec`'s
    * plane↔tap equivalence check.
    */
  private[graft] def stubTap(blob: Array[Byte], idx: Int): Float =
    if (blob.isEmpty) 0f else (blob(idx % blob.length) & 0xff) / 255.0f

  /** Resize: center-aligned BILINEAR resample of the decoded plane to
    * (outW, outH) — the kernel itself is the real production math (the
    * exact weights any image resize applies per channel; constants are
    * preserved exactly and affine ramps interpolate exactly, which the
    * spec pins), only the plane behind it is the stub. Array-local: one
    * row in, one row out, no shuffle, `mapPartitions` so a real codec's
    * per-partition init amortizes — at 100 TB this runs at scan speed
    * next to the decode, never as a separate pass over the data.
    *
    * Tap access is LAZY (`stubTap`): a downscale reads ≤ 4·outW·outH
    * source pixels, so the stub's W×H plane (4 MB at 1440×720) is never
    * built — the 2×2 gate (q108) reads 16 taps/row instead of filling a
    * megapixel plane/row, an ~8× wall-clock cut at sf0.1. A real codec
    * replaces `stubTap` with an index into its decoded plane; the kernel
    * below is untouched either way.
    */
  def resize(ds: Dataset[MediaRecord], outW: Int, outH: Int): Dataset[ResizedMedia] = {
    import ds.sparkSession.implicits._
    require(outW > 0 && outH > 0, s"bad output dims ${outW}x$outH")
    ds.mapPartitions { it =>
      it.map { r =>
        val w = r.meta.width
        val h = r.meta.height
        @inline def src(i: Int): Float = stubTap(r.blob, i)
        val out = new Array[Float](outW * outH)
        // interpolate in DOUBLE, emit float: the double residual of
        // c·(1−w) + c·w (~1e-17) vanishes below float precision, so
        // constants and affine ramps come back bit-exact in the float
        // output — pure-float accumulation wobbles by 1 ulp
        var y = 0
        while (y < outH) {
          val fy = (y + 0.5) * h / outH - 0.5
          val y0 = math.max(0, math.min(h - 1, math.floor(fy).toInt))
          val y1 = math.min(h - 1, y0 + 1)
          val wy = math.max(0.0, math.min(1.0, fy - y0))
          var x = 0
          while (x < outW) {
            val fx = (x + 0.5) * w / outW - 0.5
            val x0 = math.max(0, math.min(w - 1, math.floor(fx).toInt))
            val x1 = math.min(w - 1, x0 + 1)
            val wx = math.max(0.0, math.min(1.0, fx - x0))
            val top = src(y0 * w + x0) * (1 - wx) + src(y0 * w + x1) * wx
            val bot = src(y1 * w + x0) * (1 - wx) + src(y1 * w + x1) * wx
            out(y * outW + x) = (top * (1 - wy) + bot * wy).toFloat
            x += 1
          }
          y += 1
        }
        ResizedMedia(r.doc_id, r.media_type, w, h, outW, outH, out)
      }
    }
  }

  /** Frame sampling: cut the payload into fixed-size frames and keep
    * every `stride`-th — pure per-row array logic (a Generate-shaped op:
    * one input row → n frame rows).
    */
  def sampleFrames(ds: Dataset[MediaRecord], frameBytes: Int, stride: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      val nFrames = r.blob.length / frameBytes
      (0 until nFrames by stride).map { f =>
        (r.doc_id, f, r.blob.slice(f * frameBytes, (f + 1) * frameBytes))
      }
    }.toDF("doc_id", "frame_no", "frame")
  }

  /** ViT-style PATCH extraction — the vision-encoder preprocessing op
    * (image → non-overlapping P×P patches → per-patch statistics; a real
    * pipeline linearly projects each patch, this computes the exact
    * integer byte-sum the projection would consume). `nPatches` patch
    * positions are sampled deterministically on the patch grid
    * ((p·37) mod gx, (p·53) mod gy — a fixed low-discrepancy probe, the
    * declared sampling knob); each patch folds P² stub taps
    * (`blob(i mod len)` — a real decoder swaps the tap, same loop) into
    * an exact BIGINT sum. Per-row `flatMap` fan-out, scan-local.
    */
  def patchify(ds: Dataset[MediaRecord], patch: Int, nPatches: Int): DataFrame = {
    import ds.sparkSession.implicits._
    require(patch > 0 && nPatches > 0, s"bad patchify $patch/$nPatches")
    ds.flatMap { r =>
      val n = r.blob.length
      val w = r.meta.width; val h = r.meta.height
      val gx = w / patch; val gy = h / patch
      (0 until nPatches).map { p =>
        val px = (p * 37) % gx; val py = (p * 53) % gy
        var sum = 0L
        var dy = 0
        while (dy < patch) {
          val rowBase = (py.toLong * patch + dy) * w + px.toLong * patch
          var dx = 0
          while (dx < patch) {
            sum += (r.blob(((rowBase + dx) % n).toInt) & 0xff)
            dx += 1
          }
          dy += 1
        }
        (r.doc_id, p.toLong, px.toLong, py.toLong, sum)
      }
    }.toDF("doc_id", "patch_no", "px", "py", "sum_bytes")
  }

  /** Audio frame/hop windowing + per-frame features — the front half of
    * every audio feature pipeline (frame → window → filterbank): the
    * payload bytes are treated as 8-bit PCM (sample = byte − 128, the
    * unsigned-PCM convention), cut into OVERLAPPING frames of `frameLen`
    * samples every `hop` (unlike [[sampleFrames]]' disjoint stride-skip),
    * and each frame reduces to integer-exact features — energy Σs²,
    * peak |s|, and zero-crossing count (the classic voiced/unvoiced
    * discriminator). A real deployment swaps the byte tap for a codec's
    * PCM buffer and appends the FFT/mel stage after the framing; the
    * framing arithmetic, overlap bookkeeping, and per-row fan-out are
    * production-real and exactly oracle-checkable.
    *
    * Scale: pure per-row Generate-shaped fan-out (one row → ⌊(n−F)/H⌋+1
    * frame rows) off a `flatMap` iterator — scan-local, no shuffle; at
    * 100 TB this runs at decode speed next to the codec.
    */
  def frameAudio(ds: Dataset[MediaRecord], frameLen: Int, hop: Int): DataFrame = {
    import ds.sparkSession.implicits._
    require(frameLen > 0 && hop > 0, s"bad framing $frameLen/$hop")
    ds.flatMap { r =>
      val n = r.blob.length
      val nf = if (n >= frameLen) (n - frameLen) / hop + 1 else 0
      (0 until nf).map { j =>
        val st = j * hop
        var energy = 0L; var peak = 0; var zc = 0
        var i = 0
        while (i < frameLen) {
          val v = (r.blob(st + i) & 0xff) - 128
          energy += v.toLong * v
          val a = math.abs(v); if (a > peak) peak = a
          if (i < frameLen - 1 && v * ((r.blob(st + i + 1) & 0xff) - 128) < 0) zc += 1
          i += 1
        }
        (r.doc_id, j.toLong, energy, peak.toLong, zc.toLong)
      }
    }.toDF("doc_id", "frame_no", "energy", "peak", "zero_cross")
  }
}
