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
}
