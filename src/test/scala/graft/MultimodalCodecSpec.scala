package graft

import graft.operators.Multimodal
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Proves the multimodal pipeline is agnostic to the [[Multimodal.MediaCodec]]
 * impl: the stub is an explicit seam, not a hidden fake. A second, structurally
 * different codec (computing from raw payload bytes, not the content hash)
 * slots into `extractFeatures` with an identical output schema, and the
 * default path remains pinned to the stub the `multimodal_features` oracle
 * checks.
 */
class MultimodalCodecSpec extends SparkSpec {

  /** A second impl computing features from the payload BYTES — byte length,
    * crc32, and first-byte signals — exercising a genuinely different decode
    * path through the same seam. */
  private case object ByteStatsCodec extends Multimodal.MediaCodec {
    val name = "byte-stats"
    val featureDims = 3
    def decode(payload: Column): Column = array(
      length(payload).cast("double"),
      crc32(payload).cast("double"),
      ascii(payload.cast("string")).cast("double"))
  }

  // localCheckpoint: the seam-disagreement test self-joins two derivations
  // of this frame; a materialized lineage keeps the join unambiguous
  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    .limit(50)
    .localCheckpoint()

  test("extractFeatures output schema is identical across codec impls") {
    val withStub = Multimodal.extractFeatures(docs, col("doc_id"), col("payload"))
    val withBytes = Multimodal.extractFeatures(
      docs, col("doc_id"), col("payload"), ByteStatsCodec)
    assert(withStub.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq ==
      withBytes.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq)
  }

  test("each codec's featureDims contract is honored") {
    val stubDims = Multimodal.extractFeatures(docs, col("doc_id"), col("payload"))
      .select(size(col("features"))).distinct().collect().map(_.getInt(0)).toSeq
    val byteDims = Multimodal.extractFeatures(
        docs, col("doc_id"), col("payload"), ByteStatsCodec)
      .select(size(col("features"))).distinct().collect().map(_.getInt(0)).toSeq
    assert(stubDims == Seq(Multimodal.HashStub().featureDims))
    assert(byteDims == Seq(ByteStatsCodec.featureDims))
  }

  test("the codec actually flows through the seam (impls disagree)") {
    val stub = Multimodal.extractFeatures(docs, col("doc_id"), col("payload"))
      .select(col("media_id"), col("features").as("f_stub"))
    val bytes = Multimodal.extractFeatures(
        docs, col("doc_id"), col("payload"), ByteStatsCodec)
      .select(col("media_id"), col("features").as("f_bytes"))
    assert(stub.join(bytes, "media_id")
      .filter(col("f_stub") === col("f_bytes")).count() == 0)
  }

  test("default codec is pinned to the stub the oracle checks") {
    val viaDefault = Multimodal.extractFeatures(docs, col("doc_id"), col("payload"))
      .collect().map(_.toString).sorted.toSeq
    val viaStubAlias = docs.select(
        col("doc_id").as("media_id"), length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("content_hash"),
        Multimodal.decodeStub(col("payload")).as("features"))
      .collect().map(_.toString).sorted.toSeq
    assert(viaDefault == viaStubAlias)
  }

  test("GimgHeaderCodec decodes hand-built headers exactly (and rejects bad magic)") {
    import spark.implicits._
    def gimg(magic: String, w: Int, h: Int, ch: Int, pixels: Int): Array[Byte] =
      magic.getBytes("US-ASCII") ++
        Array(((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
          ((h >> 8) & 0xff).toByte, (h & 0xff).toByte, ch.toByte) ++
        Array.fill(pixels)(0x42.toByte)
    val rows = Seq(
      (1L, gimg("GIMG", 640, 480, 3, 10)),
      (2L, gimg("GIMG", 1, 65535, 1, 0)),     // boundary dims, no pixels
      (3L, gimg("XIMG", 640, 480, 3, 10)),    // bad magic -> reject lane
      (4L, "too-short".getBytes("US-ASCII")), // shorter than a header
      // VALID magic but header truncated below the 9 bytes the fields
      // need: must take the reject lane (-1s), never a null-bearing
      // features array from substring-past-end decoding to ''.
      (5L, "GIMG".getBytes("US-ASCII")),
      (6L, "GIMG".getBytes("US-ASCII") ++ Array[Byte](0x02, 0x00, 0x01)))
      .toDF("doc_id", "payload")
    val got = Multimodal.extractFeatures(rows, col("doc_id"), col("payload"),
        Multimodal.GimgHeaderCodec())
      .select(col("media_id"), col("features"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got(1L) == Seq(640.0, 480.0, 3.0, 10.0))
    assert(got(2L) == Seq(1.0, 65535.0, 1.0, 0.0))
    assert(got(3L) == Seq(-1.0, -1.0, -1.0, -1.0))
    assert(got(4L) == Seq(-1.0, -1.0, -1.0, -1.0))
    assert(got(5L) == Seq(-1.0, -1.0, -1.0, -1.0))
    assert(got(6L) == Seq(-1.0, -1.0, -1.0, -1.0))
  }

  private def gaud(magic: String, rate: Long, ch: Int, samples: Array[Byte]): Array[Byte] =
    magic.getBytes("US-ASCII") ++
      Array(((rate >> 24) & 0xff).toByte, ((rate >> 16) & 0xff).toByte,
        ((rate >> 8) & 0xff).toByte, (rate & 0xff).toByte,
        ((ch >> 8) & 0xff).toByte, (ch & 0xff).toByte) ++ samples

  test("GaudHeaderCodec decodes hand-built audio headers exactly; rejects load the -1 lane") {
    import spark.implicits._
    val rows = Seq(
      (1L, gaud("GAUD", 44100L, 2, Array.fill(10)(0x10.toByte))),
      (2L, gaud("GAUD", 8000L, 1, Array.emptyByteArray)),   // header only
      (3L, gaud("GAUD", 65536L, 3, Array.fill(7)(0x01.toByte))), // rate > u16
      (4L, gaud("WAVE", 44100L, 2, Array.fill(10)(0x10.toByte))), // bad magic
      (5L, gaud("GAUD", 44100L, 0, Array.fill(10)(0x10.toByte))), // zero channels
      (6L, "GAUD".getBytes("US-ASCII") ++ Array[Byte](0x00, 0x00)), // truncated header
      (7L, Array.emptyByteArray))
      .toDF("doc_id", "payload")
    val got = Multimodal.extractFeatures(rows, col("doc_id"), col("payload"),
        Multimodal.GaudHeaderCodec())
      .select(col("media_id"), col("features"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got(1L) == Seq(44100.0, 2.0, 10.0, 5.0))
    assert(got(2L) == Seq(8000.0, 1.0, 0.0, 0.0))
    assert(got(3L) == Seq(65536.0, 3.0, 7.0, 2.0)) // floor(7/3)
    Seq(4L, 5L, 6L, 7L).foreach { id =>
      assert(got(id) == Seq(-1.0, -1.0, -1.0, -1.0), s"doc $id must reject")
    }
  }

  test("audioFrameFeatures: exact per-window byte stats; rejects emit no windows") {
    import spark.implicits._
    // 11 sample bytes in 4-byte windows → 3 windows of sizes 4, 4, 3
    val samples = Array[Byte](1, 2, 3, 4, 10, 20, 30, 40, 5, 6, 7)
    val rows = Seq(
      (1L, gaud("GAUD", 16000L, 1, samples)),
      (2L, gaud("XAUD", 16000L, 1, samples)), // bad magic: zero windows
      (3L, gaud("GAUD", 16000L, 1, Array.emptyByteArray))) // no samples
      .toDF("doc_id", "payload")
    val got = Multimodal.audioFrameFeatures(rows, col("doc_id"), col("payload"),
        windowBytes = 4)
      .as[(Long, Int, Int, Long, Long, Long)].collect()
      .groupBy(_._1)
    assert(!got.contains(2L) && !got.contains(3L))
    val f = got(1L).sortBy(_._2).map(t => (t._2, t._3, t._4, t._5, t._6)).toSeq
    assert(f == Seq(
      (0, 4, 10L, 1L, 4L),
      (1, 4, 100L, 10L, 40L),
      (2, 3, 18L, 5L, 7L)))
  }

  private def gimgPix(magic: String, w: Int, h: Int, ch: Int, pix: Array[Byte]): Array[Byte] =
    magic.getBytes("US-ASCII") ++
      Array(((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
        ((h >> 8) & 0xff).toByte, (h & 0xff).toByte, ch.toByte) ++ pix

  test("imageResizeNearest: exact sampled-byte stats; incomplete payloads reject") {
    import spark.implicits._
    // 3×2 image, 2 channels, pixel bytes 10..21; resize to 2×2 samples
    // pixels (0,0),(0,1),(1,0),(1,1) -> linear 0,1,3,4 -> bytes
    // [10,11,12,13,16,17,18,19] in output raster order
    val pix = Array.tabulate(12)(i => (10 + i).toByte)
    val rows = Seq(
      (1L, gimgPix("GIMG", 3, 2, 2, pix)),
      (2L, gimgPix("GIMG", 3, 2, 2, pix.dropRight(1))), // incomplete -> reject
      (3L, gimgPix("XIMG", 3, 2, 2, pix)),              // bad magic -> reject
      (4L, gimgPix("GIMG", 1, 1, 1, Array[Byte](42))))  // 1×1 upsample: all windows hit it
      .toDF("doc_id", "payload")
    val got = Multimodal.imageResizeNearest(rows, col("doc_id"), col("payload"), 2, 2)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(t => t._1 -> t).toMap
    assert(got(1L) == ((1L, 2L, 2L, 2L, 8L, 116L, 464L, 10L, 19L)))
    assert(got(4L) == ((4L, 2L, 2L, 1L, 4L, 168L, 252L, 42L, 42L)))
    Seq(2L, 3L).foreach { id =>
      assert(got(id) == ((id, -1L, -1L, -1L, -1L, -1L, -1L, -1L, -1L)), s"doc $id must reject")
    }
  }

  test("imageChannelStats: per-channel stats over complete pixels only; rejects emit no rows") {
    import spark.implicits._
    val pix = Array.tabulate(12)(i => (10 + i).toByte)
    val rows = Seq(
      (1L, gimgPix("GIMG", 3, 2, 2, pix)),
      (2L, gimgPix("GIMG", 3, 2, 2, pix.dropRight(1))), // 11 bytes -> 5 complete pixels
      (3L, gimgPix("XIMG", 3, 2, 2, pix)),              // bad magic: zero rows
      (4L, gimgPix("GIMG", 3, 2, 2, Array[Byte](7))))   // under one pixel: zero rows
      .toDF("doc_id", "payload")
    val got = Multimodal.imageChannelStats(rows, col("doc_id"), col("payload"))
      .as[(Long, Int, Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    assert(!got.contains(3L) && !got.contains(4L))
    assert(got(1L).sortBy(_._2).map(t => (t._2, t._3, t._4, t._5, t._6)).toSeq ==
      Seq((0, 6L, 90L, 10L, 20L), (1, 6L, 96L, 11L, 21L)))
    assert(got(2L).sortBy(_._2).map(t => (t._2, t._3, t._4, t._5, t._6)).toSeq ==
      Seq((0, 5L, 70L, 10L, 18L), (1, 5L, 75L, 11L, 19L)))
  }

  test("imageFeatureVector packs per-channel sums; rejects and empty images emit no row") {
    import spark.implicits._
    val pix = Array.tabulate(12)(i => (10 + i).toByte)
    val rows = Seq(
      (1L, gimgPix("GIMG", 3, 2, 2, pix)),
      (2L, gimgPix("GIMG", 3, 2, 2, pix.dropRight(1))), // 5 complete pixels
      (3L, gimgPix("XIMG", 3, 2, 2, pix)),              // bad magic: no row
      (4L, gimgPix("GIMG", 3, 2, 2, Array[Byte](7))))   // under one pixel: no row
      .toDF("doc_id", "payload")
    val got = Multimodal.imageFeatureVector(rows, col("doc_id"), col("payload"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getSeq[Long](4).toSeq))).toMap
    assert(got.keySet == Set(1L, 2L))
    // channel sums match imageChannelStats' per-channel byte_sum rows
    assert(got(1L) == ((3L, 2L, 2L, Seq(90L, 96L))))
    assert(got(2L) == ((3L, 2L, 2L, Seq(70L, 75L))))
  }

  test("imageNearDup: exact L1 within quantized buckets; cross-shape never pairs") {
    import spark.implicits._
    val pixA = Array.tabulate(12)(i => (10 + i).toByte)
    val pixB = pixA.clone(); pixB(0) = (pixB(0) + 3).toByte // l1 = 3, same cell
    val pixFar = Array.tabulate(12)(i => (200 + i % 30).toByte) // far cell
    val rows = Seq(
      (1L, gimgPix("GIMG", 3, 2, 2, pixA)),
      (2L, gimgPix("GIMG", 3, 2, 2, pixB)),
      (3L, gimgPix("GIMG", 3, 2, 2, pixFar)),  // same shape, different bucket
      (4L, gimgPix("GIMG", 2, 3, 2, pixA)),    // same bytes, different shape
      (5L, gimgPix("GIMG", 3, 2, 2, pixA)))    // exact dup of 1
      .toDF("doc_id", "payload")
    val got = Multimodal.imageNearDup(rows, col("doc_id"), col("payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getInt(3))))
      .toMap
    assert(got.keySet == Set((1L, 2L), (1L, 5L), (2L, 5L)),
      s"candidate set wrong: ${got.keySet}")
    assert(got((1L, 5L)) == ((0L, 1)), "exact duplicate must verify at l1=0")
    assert(got((1L, 2L)) == ((3L, 1)), "one perturbed byte is l1=3, near-dup")
    assert(got((2L, 5L)) == ((3L, 1)))
  }

  test("metadata (n_bytes, content_hash) is codec-independent ground truth") {
    val meta = Multimodal.extractFeatures(
        docs, col("doc_id"), col("payload"), ByteStatsCodec)
      .select(col("media_id"), col("n_bytes"), col("content_hash"))
      .collect().map(_.toString).sorted.toSeq
    val metaStub = Multimodal.extractFeatures(docs, col("doc_id"), col("payload"))
      .select(col("media_id"), col("n_bytes"), col("content_hash"))
      .collect().map(_.toString).sorted.toSeq
    assert(meta == metaStub)
  }

  private def gimgFrame(w: Int, h: Int, pixels: Int): Array[Byte] =
    "GIMG".getBytes("US-ASCII") ++
      Array(((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
        ((h >> 8) & 0xff).toByte, (h & 0xff).toByte, 1.toByte) ++
      Array.fill(pixels)(0x41.toByte)

  private def gvid(magic: String, frames: Seq[Array[Byte]],
      offsetsOverride: Option[Seq[Int]] = None): Array[Byte] = {
    val offsets = offsetsOverride.getOrElse(
      frames.map(_.length).scanLeft(0)(_ + _).init)
    def be32(v: Int) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    magic.getBytes("US-ASCII") ++
      Array(((frames.length >> 8) & 0xff).toByte, (frames.length & 0xff).toByte) ++
      offsets.flatMap(be32) ++ frames.flatten
  }

  test("videoFrameHeaders: index-located variable-size frames decode exactly") {
    import spark.implicits._
    val frames = Seq(gimgFrame(10, 20, 3), gimgFrame(30, 40, 0), gimgFrame(50, 60, 5))
    val rows = Seq((1L, gvid("GVID", frames))).toDF("doc_id", "payload")
    val all = Multimodal.videoFrameHeaders(rows, col("doc_id"), col("payload"))
      .select("frame_idx", "width", "height", "channels", "n_pixel_bytes")
      .as[(Int, Double, Double, Double, Double)].collect().sortBy(_._1).toSeq
    assert(all == Seq(
      (0, 10.0, 20.0, 1.0, 3.0),
      (1, 30.0, 40.0, 1.0, 0.0),
      (2, 50.0, 60.0, 1.0, 5.0)))
    // stride 2 samples frames 0 and 2 only
    val strided = Multimodal.videoFrameHeaders(rows, col("doc_id"),
        col("payload"), stride = 2)
      .select("frame_idx").as[Int].collect().sorted.toSeq
    assert(strided == Seq(0, 2))
  }

  test("videoFrameHeaders: container damage emits zero frames; frame damage rejects per-frame") {
    import spark.implicits._
    val frames = Seq(gimgFrame(10, 20, 3), gimgFrame(30, 40, 0))
    val rows = Seq(
      (1L, gvid("XVID", frames)),                       // bad magic
      (2L, gvid("GVID", frames).take(9)),               // index truncated
      (3L, "GVID".getBytes("US-ASCII") ++ Array[Byte](0x00)), // header truncated
      // LYING index: frame 0's offset points past the payload end — that
      // frame must take the GIMG reject lane while frame 1 decodes fine
      (4L, gvid("GVID", frames, Some(Seq(9999, frames.head.length)))))
      .toDF("doc_id", "payload")
    val got = Multimodal.videoFrameHeaders(rows, col("doc_id"), col("payload"))
      .select("media_id", "frame_idx", "width")
      .as[(Long, Int, Double)].collect()
    assert(!got.exists(r => r._1 == 1L || r._1 == 2L || r._1 == 3L))
    val doc4 = got.filter(_._1 == 4L).map(r => r._2 -> r._3).toMap
    assert(doc4 == Map(0 -> -1.0, 1 -> 30.0))
  }

  /** Full GIMG payload (header + explicit pixel bytes) for the cross-modal
    * match tests — unlike [[gimgFrame]], pixel CONTENT varies. */
  private def gimg(w: Int, h: Int, c: Int, pix: Array[Byte]): Array[Byte] =
    "GIMG".getBytes("US-ASCII") ++
      Array(((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
        ((h >> 8) & 0xff).toByte, (h & 0xff).toByte, c.toByte) ++ pix

  test("videoImageMatch: frame-content identity joins across modalities") {
    import spark.implicits._
    val pixA = "abcd".getBytes("US-ASCII")
    val pixB = "wxyz".getBytes("US-ASCII")
    val pixC = "0000".getBytes("US-ASCII")
    // video 1: frames [A, B]; video 2: frames [B]
    val videos = Seq(
      (1L, gvid("GVID", Seq(gimg(2, 2, 1, pixA), gimg(2, 2, 1, pixB)))),
      (2L, gvid("GVID", Seq(gimg(2, 2, 1, pixB))))).toDF("doc_id", "payload")
    // image 10 = A, image 11 = B, image 12 = unmatched content,
    // image 13 = same BYTES as A but different shape (4x1) — must not match
    val images = Seq(
      (10L, gimg(2, 2, 1, pixA)), (11L, gimg(2, 2, 1, pixB)),
      (12L, gimg(2, 2, 1, pixC)), (13L, gimg(4, 1, 1, pixA)))
      .toDF("doc_id", "payload")
    val got = Multimodal.videoImageMatch(videos, col("doc_id"), col("payload"),
        images, col("doc_id"), col("payload"))
      .select("video_id", "frame_idx", "image_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(got == Set((1L, 0, 10L), (1L, 1, 11L), (2L, 0, 11L)))
  }

  test("videoImageMatch: reject lanes — bad frame drops the whole video, truncated image never aliases") {
    import spark.implicits._
    val pixA = "abcd".getBytes("US-ASCII")
    val goodFrame = gimg(2, 2, 1, pixA)
    val badFrame = gimg(0, 2, 1, pixA) // zero width
    val videos = Seq(
      (1L, gvid("GVID", Seq(goodFrame, badFrame))), // one bad frame -> whole video out
      (2L, gvid("XVID", Seq(goodFrame))),           // bad container magic
      (3L, gvid("GVID", Seq(goodFrame)))).toDF("doc_id", "payload")
    val images = Seq(
      (10L, gimg(2, 2, 1, pixA)),
      // truncated image: header claims 2x2x1 but carries 3 pixel bytes —
      // must NOT match a frame whose first 3 bytes agree
      (11L, gimg(2, 2, 1, pixA.take(3)))).toDF("doc_id", "payload")
    val got = Multimodal.videoImageMatch(videos, col("doc_id"), col("payload"),
        images, col("doc_id"), col("payload"))
      .select("video_id", "frame_idx", "image_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(got == Set((3L, 0, 10L)))
  }

  test("crossModalNearDup: a nearest-neighbor 2x upscale matches its frame exactly") {
    import spark.implicits._
    val pixA = Array[Byte](10, 20, 30, 40)           // 2×2 frame, row-major
    // NN 2× upscale: each source pixel becomes a 2×2 constant region
    val upA = Array[Byte](10, 10, 20, 20, 10, 10, 20, 20,
      30, 30, 40, 40, 30, 30, 40, 40)
    val upJitter = upA.clone(); upJitter(0) = 11      // region (0,0) mean 10.25
    val videos = Seq((1L, gvid("GVID", Seq(gimg(2, 2, 1, pixA)))))
      .toDF("doc_id", "payload")
    val images = Seq(
      (10L, gimg(4, 4, 1, upA)),          // exact rescale: l1 = 0
      (11L, gimg(4, 4, 1, upJitter)),     // one byte off: mean +16/4 = +4
      (12L, gimg(3, 3, 1, Array.fill[Byte](9)(10))), // 3∤grid: rejected
      (13L, gimg(2, 2, 1, Array[Byte](100, 100, 100, 100)))) // far bucket
      .toDF("doc_id", "payload")
    val got = Multimodal.crossModalNearDup(videos, col("doc_id"),
        col("payload"), images, col("doc_id"), col("payload"),
        grid = 2, meanScale = 16L, quant = 64L, maxL1 = 96L)
      .select("video_id", "frame_idx", "image_id", "l1", "near_dup")
      .as[(Long, Int, Long, Long, Int)].collect().toSet
    // jitter image: region (0,0) sum 41 -> (41·16) div 4 = 164 vs 160
    assert(got == Set((1L, 0, 10L, 0L, 1), (1L, 0, 11L, 4L, 1)))
  }

  test("crossModalNearDup: a saturated fingerprint bucket drops whole (hot-bucket cap)") {
    import spark.implicits._
    val pixA = Array[Byte](10, 20, 30, 40)
    val pixB = Array[Byte](100, 110, 120, 127)
    // two identical frames land one bucket with 2 members; cap=1 drops it,
    // while the singleton pixB bucket still matches its image
    val videos = Seq(
      (1L, gvid("GVID", Seq(gimg(2, 2, 1, pixA), gimg(2, 2, 1, pixA),
        gimg(2, 2, 1, pixB)))))
      .toDF("doc_id", "payload")
    val images = Seq((10L, gimg(2, 2, 1, pixA)), (11L, gimg(2, 2, 1, pixB)))
      .toDF("doc_id", "payload")
    val got = Multimodal.crossModalNearDup(videos, col("doc_id"),
        col("payload"), images, col("doc_id"), col("payload"),
        grid = 2, meanScale = 16L, quant = 64L, maxL1 = 96L, maxBucket = 1)
      .select("image_id", "frame_idx").as[(Long, Int)].collect().toSet
    assert(got == Set((11L, 2)),
      "the 2-frame hot bucket must drop; the singleton must survive")
  }

  test("grid_means native kernel is bit-identical to the HOF reference form, null lanes included") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    def img(w: Int, h: Int, c: Int, nBytes: Int): Array[Byte] =
      Array.fill(nBytes)(rng.nextInt(256).toByte)
    // (payload, pixStart, w, h, c) lanes on the callers' GUARDED domain
    // (w, h > 0 and grid-divisible, c > 0 — the frameOk/imgOk rejects):
    // full images across grids/channels, a payload truncated MID-REGION
    // (some elements null, some not), an offset start. Zero-pixel regions
    // are NOT comparable: under ANSI the HOF reference throws
    // REMAINDER_BY_ZERO there (callers guard it away); the native kernel's
    // strictly-more-defined null behavior is asserted separately below.
    val rows = Seq(
      (img(8, 8, 1, 64), 1L, 8L, 8L, 1L),
      (img(8, 8, 3, 192), 1L, 8L, 8L, 3L),
      (img(4, 4, 2, 32), 1L, 4L, 4L, 2L),
      (img(8, 8, 1, 37), 1L, 8L, 8L, 1L),      // truncated mid-region
      (img(8, 8, 2, 100), 10L, 8L, 8L, 2L))    // offset start + truncation
      .zipWithIndex.map { case ((b, st, w, h, c), i) => (i.toLong, b, st, w, h, c) }
      .toDF("id", "bin", "st", "w", "h", "c")
    for (grid <- Seq(2, 4); scale <- Seq(1L, 16L)) {
      val got = rows.select(col("id"),
          graft.functions.GraftFunctions.grid_means(col("bin"), col("st"),
            col("w"), col("h"), col("c"), grid, scale).as("native"),
          Multimodal.gridMeansHof(col("bin"), col("st"),
            col("w"), col("h"), col("c").cast("long"), grid, scale).as("hof"))
        .collect()
      got.foreach { r =>
        val n = if (r.isNullAt(1)) null else r.getSeq[Any](1)
        val hof = if (r.isNullAt(2)) null else r.getSeq[Any](2)
        assert(n == hof, s"grid=$grid scale=$scale id=${r.getLong(0)}: $n != $hof")
      }
    }
    // null payload lane, and the out-of-domain lanes the HOF form cannot
    // express under ANSI (zero-pixel region → per-element null; degenerate
    // dims → all-null elements) — the kernel is strictly more defined
    val extra = Seq((1L, img(8, 2, 1, 16), 1L, 8L, 2L, 1L),
        (2L, img(0, 0, 1, 0), 1L, 0L, 0L, 1L))
      .toDF("id", "bin", "st", "w", "h", "c")
      .select(col("id"), graft.functions.GraftFunctions.grid_means(col("bin"),
        col("st"), col("w"), col("h"), col("c"), 4, 16L).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(extra(1L).size == 16 && extra(1L).forall(_ == null))
    assert(extra(2L).size == 16 && extra(2L).forall(_ == null))
    val nullRow = Seq((1L)).toDF("id")
      .select(graft.functions.GraftFunctions.grid_means(
        lit(null).cast("binary"), lit(1L), lit(8L), lit(8L), lit(1L), 4, 16L))
      .collect()(0)
    assert(nullRow.isNullAt(0))
  }

  test("walshMatrix: ±1 entries, orthogonal rows, v >= 1 rows sum to zero, sequency order") {
    for (g <- Seq(2, 4, 8)) {
      val h = Multimodal.walshMatrix(g)
      assert(h.size == g && h.forall(_.size == g))
      assert(h.flatten.forall(v => v == 1L || v == -1L))
      // orthogonality: H·Hᵀ = g·I
      for (a <- 0 until g; b <- 0 until g) {
        val dot = (0 until g).map(i => h(a)(i) * h(b)(i)).sum
        assert(dot == (if (a == b) g.toLong else 0L), s"g=$g rows $a,$b")
      }
      // the shift-invariance lemma: every non-DC row sums to zero EXACTLY
      (1 until g).foreach(u => assert(h(u).sum == 0L, s"g=$g row $u"))
      // sequency order: sign-change counts are 0, 1, ..., g-1
      val sc = h.map(r => r.zip(r.tail).count { case (x, y) => x != y })
      assert(sc == (0 until g), s"g=$g sequency $sc")
    }
  }

  /** Row-linear 8×8×1 ramp content: pixel(y, x) = b(y/2) + δ + s(y/2)·(x+shift). */
  private def rampPix(b: Array[Int], s: Array[Int], shift: Int, delta: Int): Array[Byte] =
    (for (y <- 0 until 8; x <- 0 until 8)
      yield (b(y / 2) + delta + s(y / 2) * (x + shift)).toByte).toArray

  /** Nearest-neighbor 2× upscale of single-channel w×h content. */
  private def up2(pix: Array[Byte], w: Int, h: Int): Array[Byte] =
    (for (y <- 0 until 2 * h; x <- 0 until 2 * w)
      yield pix((y / 2) * w + x / 2)).toArray

  test("phashNearDup: 1-px shift, brightness, and rescale all match where raw grid means miss") {
    import spark.implicits._
    val b = Array(100, 110, 120, 130)
    val s = Array(6, -6, 4, -4)
    val base = rampPix(b, s, 0, 0)
    val videos = Seq((1L, gvid("GVID", Seq(gimg(8, 8, 1, base)))))
      .toDF("doc_id", "payload")
    val images = Seq(
      (10L, gimg(8, 8, 1, rampPix(b, s, 1, 0))),     // 1-px x-translate
      (11L, gimg(8, 8, 1, rampPix(b, s, 0, 5))),     // brightness shift
      (12L, gimg(16, 16, 1, up2(base, 8, 8))),        // NN 2× rescale
      (13L, gimg(8, 8, 1, rampPix(b, Array(1, -1, 1, -1), 0, 0))))
      .toDF("doc_id", "payload")
    val ph = Multimodal.phashNearDup(videos, col("doc_id"), col("payload"),
        images, col("doc_id"), col("payload"), grid = 4, meanScale = 16L,
        quant = 256L, maxL1 = 256L)
      .select("image_id", "l1", "near_dup").as[(Long, Long, Int)]
      .collect().toSet
    // shift and brightness perturb the means row-constantly — the v >= 1
    // Walsh coefficients are EXACTLY unchanged (l1 = 0); the rescale is
    // invariant through the grid means; the different-slope image never
    // shares the bucket
    assert(ph == Set((10L, 0L, 1), (11L, 0L, 1), (12L, 0L, 1)), s"got $ph")
    // the CONTRAST lane: raw grid-mean bucketing (crossModalNearDup)
    // misses the shifted and brightened copies — every cell mean moves by
    // 16·s_j (|·| >= 64) or 16·δ = 80, always crossing the quant-64 cell —
    // while the rescale still matches
    val gm = Multimodal.crossModalNearDup(videos, col("doc_id"),
        col("payload"), images, col("doc_id"), col("payload"),
        grid = 4, meanScale = 16L, quant = 64L, maxL1 = 96L)
      .select("image_id").as[Long].collect().toSet
    assert(gm == Set(12L), s"got $gm")
  }

  test("phashNearDup: the hot-bucket cap drops saturated cells per side") {
    import spark.implicits._
    val b = Array(100, 110, 120, 130)
    val s = Array(6, -6, 4, -4)
    val base = rampPix(b, s, 0, 0)
    val other = rampPix(b, Array(2, -2, 2, -2), 0, 0)
    val videos = Seq(
      (1L, gvid("GVID", Seq(gimg(8, 8, 1, base), gimg(8, 8, 1, base),
        gimg(8, 8, 1, other)))))
      .toDF("doc_id", "payload")
    val images = Seq((10L, gimg(8, 8, 1, base)), (11L, gimg(8, 8, 1, other)))
      .toDF("doc_id", "payload")
    val got = Multimodal.phashNearDup(videos, col("doc_id"), col("payload"),
        images, col("doc_id"), col("payload"), grid = 4, meanScale = 16L,
        quant = 256L, maxL1 = 256L, maxBucket = 1)
      .select("image_id", "frame_idx").as[(Long, Int)].collect().toSet
    assert(got == Set((11L, 2)),
      "the 2-frame saturated cell must drop; the singleton survives")
  }

  /** Column-linear 8×8×1 ramp content: pixel(y, x) = b(x/2) + δ + s(x/2)·(y+shift)
    * — the transpose of [[rampPix]], the y-shift dual's natural content. */
  private def rampPixCol(b: Array[Int], s: Array[Int], shift: Int, delta: Int): Array[Byte] =
    (for (y <- 0 until 8; x <- 0 until 8)
      yield (b(x / 2) + delta + s(x / 2) * (y + shift)).toByte).toArray

  test("phashNearDup: the y-shift dual matches 1-px vertical translates the x subset misses") {
    import spark.implicits._
    val b = Array(100, 110, 120, 130)
    val s = Array(6, -6, 4, -4)
    val videos = Seq((1L, gvid("GVID", Seq(gimg(8, 8, 1, rampPixCol(b, s, 0, 0))))))
      .toDF("doc_id", "payload")
    val images = Seq(
      (10L, gimg(8, 8, 1, rampPixCol(b, s, 1, 0))),   // 1-px y-translate
      (11L, gimg(8, 8, 1, rampPixCol(b, s, 0, 5))))   // brightness shift
      .toDF("doc_id", "payload")
    // a vertical translate of column-linear content perturbs every grid
    // ROW by the same amount — the {u >= 1} coefficients cancel it EXACTLY
    val y = Multimodal.phashNearDup(videos, col("doc_id"), col("payload"),
        images, col("doc_id"), col("payload"), grid = 4, meanScale = 16L,
        quant = 256L, maxL1 = 256L, yShiftTolerant = true)
      .select("image_id", "l1", "near_dup").as[(Long, Long, Int)]
      .collect().toSet
    assert(y == Set((10L, 0L, 1), (11L, 0L, 1)), s"got $y")
    // the x subset keeps the u = 0 coefficients, which move by 64·W_v
    // under the translate (a full quant cell at these slopes) — bucket miss
    val x = Multimodal.phashNearDup(videos, col("doc_id"), col("payload"),
        images.filter(col("doc_id") === 10L), col("doc_id"), col("payload"),
        grid = 4, meanScale = 16L, quant = 256L, maxL1 = 256L)
      .select("image_id").as[Long].collect().toSet
    assert(x.isEmpty, s"x subset must miss the y-translate, got $x")
  }

  test("crossModalNearDup: multi-channel fingerprints keep channels separate") {
    import spark.implicits._
    // 2×2×2 frame: channel 0 all 10s, channel 1 all 200s (unsigned)
    val px = Array[Byte](10, 200.toByte, 10, 200.toByte,
      10, 200.toByte, 10, 200.toByte)
    val videos = Seq((1L, gvid("GVID", Seq(gimg(2, 2, 2, px)))))
      .toDF("doc_id", "payload")
    // image A: identical; image B: channels swapped — same total energy,
    // different per-channel fingerprint, must NOT bucket together
    val swapped = Array[Byte](200.toByte, 10, 200.toByte, 10,
      200.toByte, 10, 200.toByte, 10)
    val images = Seq((20L, gimg(2, 2, 2, px)), (21L, gimg(2, 2, 2, swapped)))
      .toDF("doc_id", "payload")
    val got = Multimodal.crossModalNearDup(videos, col("doc_id"),
        col("payload"), images, col("doc_id"), col("payload"),
        grid = 2, meanScale = 16L, quant = 64L, maxL1 = 96L)
      .select("image_id", "l1").as[(Long, Long)].collect().toSet
    assert(got == Set((20L, 0L)))
  }
}
