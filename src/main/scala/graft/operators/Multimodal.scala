package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: images/audio/video travel as opaque `binary`
 * columns with a typed metadata struct alongside. The Spark-side machinery
 * (schema, batching, partition sizing, per-partition decode) is real; the
 * actual media decode is STUBBED with a deterministic fake (this container
 * has no image/audio codecs) — swap [[decodeStub]] for a JNI/codec call in
 * production.
 *
 * Scale notes: binary payloads dominate row size, so ops here (a) never
 * shuffle the payload — features are extracted first, payload dropped before
 * any exchange; (b) repartition by byte budget, not row count
 * ([[repartitionByBytes]]).
 */
object Multimodal {

  /** Canonical multimodal schema fragment: payload + metadata struct. */
  def withMediaMetadata(df: DataFrame, binCol: Column, mediaType: String): DataFrame =
    df.withColumn("media",
      struct(
        binCol.as("payload"),
        lit(mediaType).as("media_type"),
        length(binCol).as("n_bytes"),
        md5(binCol).as("content_hash")))

  /**
   * The codec seam: binary payload → fixed-width double feature vector, as a
   * Column transform so every impl composes into whole-stage codegen'd
   * plans (batch AND streaming) without changing the pipeline around it.
   *
   * Impls the production system would register here: a JNI-backed native
   * Catalyst expression for image decode, or an Arrow-batched python worker
   * via mapInPandas for heavyweight models — both keep this exact signature
   * at the call sites. The offline container has no codecs, so [[HashStub]]
   * is the default impl; it is an EXPLICIT stand-in, not a hidden fake.
   */
  trait MediaCodec {
    def name: String
    def featureDims: Int
    /** Decode `payload` (binary) into `array<double>` of [[featureDims]]. */
    def decode(payload: Column): Column
  }

  /** Deterministic offline stand-in: features derived from the content hash
    * (same shape and dataflow as a real decoder — binary in, fixed-width
    * vector out — with reproducible values and zero native deps). */
  final case class HashStub(featureDims: Int = 4) extends MediaCodec {
    def name: String = s"hash-stub-$featureDims"
    def decode(payload: Column): Column =
      transform(sequence(lit(0), lit(featureDims - 1)), i =>
        (TextOps.portableHash(concat(i.cast("string"), lit(":"), md5(payload)))
          .cast("double") / lit(1.152921504606846976e18)))
  }

  /** Backward-compatible alias for the default stub decode (the
    * `multimodal_features` oracle pins its values). */
  def decodeStub(payload: Column, featureDims: Int = 4): Column =
    HashStub(featureDims).decode(payload)

  /**
   * A REAL (non-stub) codec for the toy "GIMG" image format — proof the
   * [[MediaCodec]] seam carries an actual bytes→features decode, not just
   * plumbing. Layout (big-endian, farbfeld/BMP-header-spirited):
   * {{{
   *   bytes 0-3   magic "GIMG" (ASCII)
   *   bytes 4-5   width  (uint16, big-endian)
   *   bytes 6-7   height (uint16, big-endian)
   *   byte  8     channels (uint8)
   *   bytes 9...  pixel payload (width·height·channels bytes, may be truncated)
   * }}}
   * Features: [width, height, channels, pixel_bytes_present]; a payload
   * whose magic does not match — or whose header is truncated below the
   * 9 bytes the fields need (substring past the end yields empty bytes,
   * whose hex→conv decode is null, and a null-bearing features array would
   * poison downstream double consumers) — decodes to all -1 (the reject
   * lane — rows stay, downstream filters decide). Pure codegen'd built-ins
   * (`substring`/`hex`/`conv`), so the decode runs inside whole-stage
   * codegen in batch and streaming alike — the integration pattern a JNI
   * codec expression would follow.
   */
  final case class GimgHeaderCodec() extends MediaCodec {
    def name: String = "gimg-header"
    def featureDims: Int = 4
    def decode(payload: Column): Column = {
      def beUint(start: Int, len: Int): Column =
        conv(hex(substring(payload, start, len)), 16, 10).cast("double")
      when(substring(payload, 1, 4) === lit("GIMG".getBytes("US-ASCII")) &&
          length(payload) >= 9,
        array(beUint(5, 2), beUint(7, 2), beUint(9, 1),
          greatest(length(payload) - 9, lit(0)).cast("double")))
        .otherwise(array(lit(-1.0), lit(-1.0), lit(-1.0), lit(-1.0)))
    }
  }

  /** Feature extraction: metadata + decoded features, payload dropped
    * before anything downstream can shuffle it. Codec-agnostic: the output
    * schema is identical for every [[MediaCodec]] impl. */
  def extractFeatures(df: DataFrame, idCol: Column, binCol: Column,
      codec: MediaCodec = HashStub()): DataFrame =
    df.select(
      idCol.as("media_id"),
      length(binCol).as("n_bytes"),
      md5(binCol).as("content_hash"),
      codec.decode(binCol).as("features"))

  /**
   * Frame-sampling plumbing for video-like payloads: deterministically slice
   * the payload into `n` evenly spaced "frames" (byte windows). Real frame
   * decode replaces the substring; the partitioning/explode shape is the
   * production dataflow.
   */
  def sampleFrames(df: DataFrame, idCol: Column, binCol: Column, n: Int,
      frameBytes: Int = 16): DataFrame =
    df.select(idCol.as("media_id"), binCol.as("payload"))
      .select(col("media_id"),
        posexplode(transform(sequence(lit(0), lit(n - 1)), i =>
          col("payload").substr(
            (i * length(col("payload")) / n).cast("int") + 1, lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_bytes")

  /** Repartition a payload-bearing frame so each partition carries roughly
    * `targetBytes` of binary data — row-count partitioning is wrong when row
    * sizes vary by orders of magnitude.
    *
    * `totalBytes` comes from the caller (catalog statistics, file-listing
    * sizes, or an explicit [[measureTotalBytes]] pass) — the operator itself
    * is lazy and composes into any plan, including streaming, with no hidden
    * eager action. */
  def repartitionByBytes(df: DataFrame, totalBytes: Long, targetBytes: Long): DataFrame = {
    val parts = math.max(1, (totalBytes / math.max(1L, targetBytes)).toInt)
    df.repartition(parts)
  }

  /** Explicitly-eager helper for callers without catalog stats: scans `df`
    * once to sum the payload column's bytes. Batch-only (runs an action);
    * pair with [[repartitionByBytes]] when a two-pass plan is acceptable. */
  def measureTotalBytes(df: DataFrame, binCol: Column): Long = {
    val row = df.agg(sum(length(binCol)).as("total")).collect()(0)
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }
}
