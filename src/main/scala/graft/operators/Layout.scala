package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-layout operators: Z-order (Morton) clustering for multi-column scan
 * pruning. Sorting a table by the interleaved bits of two filter columns
 * keeps rows close in BOTH dimensions close on disk, so min/max file
 * statistics prune scans for predicates on either column — the standard
 * layout lever for 100 TB tables queried along more than one axis.
 *
 * The bit arithmetic is plain integer shifts (exact in every engine), so
 * z-values are oracle-verifiable.
 */
object Layout {

  /** Morton z-value: interleave the low `bits` bits of x (even positions)
    * and y (odd positions). Inputs must be non-negative longs. */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { b =>
      shiftright(x, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b)) +
        shiftright(y, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1))
    }.reduce(_ + _)

  /** Cluster a frame by the z-order of two (bucketized) columns — the sort
    * you run before writing files so both columns' min/max stats prune. */
  def clusterByZ(df: DataFrame, x: Column, y: Column, bits: Int): DataFrame =
    df.orderBy(zValue(x, y, bits))

  /**
   * Deterministic training-order shuffle: the LAST step of every corpus
   * pipeline — examples must reach the trainer in an order uncorrelated
   * with ingestion (or any curation key), reproducibly. Each row draws its
   * shard from one salted portable hash of its id and its position WITHIN
   * the shard from a second, independently-salted hash (id tie-break), so
   * (shard, shard_pos) is a deterministic global permutation: same on every
   * run, engine, and partition count, and stable per-row under corpus
   * growth (an appended document lands somewhere without re-shuffling
   * existing rows across shards — only in-shard positions after it shift).
   *
   * Scale shape: one hash exchange on `shard` (nShards ≈ desired output
   * files, thousands at 100 TB) + a per-shard rank window in hash order —
   * the sort is per-shard and external-merge friendly; nothing global.
   * Writing `partitionBy(shard)` with an in-shard sort then streams
   * trainer-ready files straight out.
   */
  def shuffleShards(df: DataFrame, idCol: Column, nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shard = pmod(TextOps.portableHash(
      idCol.cast("string"), lit("shard")), lit(nShards.toLong)).cast("int")
    val posKey = TextOps.portableHash(idCol.cast("string"), lit("pos"))
    val w = Window.partitionBy(col("shard")).orderBy(posKey, idCol)
    df.withColumn("shard", shard)
      .withColumn("shard_pos", row_number().over(w))
  }

  /** On-disk size of a path from the filesystem metadata — NO data scan, the
    * sizing pass a compaction job can afford at 100 TB. */
  def dirBytes(spark: org.apache.spark.sql.SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.getContentSummary(path).getLength
  }

  /**
   * Small-file compaction: rewrite a parquet directory into
   * ceil(bytes/targetBytes) right-sized files. Streaming sinks and
   * fine-grained partitioned writes accumulate small files that poison scan
   * planning (one task per file, footer overhead); periodic compaction is
   * routine table maintenance. Sizing comes from file metadata, so the only
   * data pass is the rewrite itself.
   */
  def compactParquet(spark: org.apache.spark.sql.SparkSession,
      inDir: String, outDir: String, targetBytes: Long): Int = {
    val parts = math.max(1L, (dirBytes(spark, inDir) + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir).repartition(parts)
      .write.mode("overwrite").parquet(outDir)
    parts
  }

  /**
   * Snapshot diff: classify every id across two corpus snapshots by
   * fingerprint — `added` (only in b), `removed` (only in a), `changed`
   * (both, fingerprints differ), `unchanged` — the crawl-to-crawl change
   * audit behind incremental reprocessing ("re-embed only changed docs")
   * and dataset-release notes. One full-outer equi-join on the id;
   * fingerprints (which the caller computes — md5 of the payload, an etag,
   * a version hash) must be NON-NULL, and only they cross the wire, never
   * the payload. Both inputs must expose `idCol` and a `fp` column.
   */
  def snapshotDiff(a: DataFrame, b: DataFrame, idCol: String): DataFrame = {
    val l = a.select(col(idCol).as("id"), col("fp").as("fp_a"))
    val r = b.select(col(idCol).as("id"), col("fp").as("fp_b"))
    l.join(r, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("fp_a").isNull, lit("added"))
          .when(col("fp_b").isNull, lit("removed"))
          .when(col("fp_a") === col("fp_b"), lit("unchanged"))
          .otherwise(lit("changed")))
  }

  /** Keyed upsert as a pure frame transform: rows of `base` whose key
    * appears in `updates` are replaced; new keys append. The MERGE
    * WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT core — one anti-join
    * (broadcast when the update batch is small, the common case) plus a
    * union; nothing is collected. Duplicate keys WITHIN `updates` are the
    * caller's bug — both rows survive, same as SQL MERGE's multi-match. */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    base.join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates)

  /**
   * MERGE INTO for a plain parquet table: read base, [[upsert]], write a new
   * version directory, then repoint. Plain filesystems have no atomic
   * directory swap, so this writes `<table>/v<N+1>` next to `<table>/v<N>`
   * and returns the new version — the reader convention is "open the highest
   * v*" (what table formats' transaction logs do properly; this is the
   * minimal version-directory variant, single-writer only). The base version
   * stays intact for rollback/time-travel until vacuumed.
   */
  def mergeIntoParquet(spark: org.apache.spark.sql.SparkSession,
      tableDir: String, updates: DataFrame, keys: Seq[String]): Int = {
    val path = new org.apache.hadoop.fs.Path(tableDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions =
      if (fs.exists(path))
        fs.listStatus(path).map(_.getPath.getName)
          .filter(_.matches("v\\d+")).map(_.drop(1).toInt)
      else Array.empty[Int]
    val next = if (versions.isEmpty) 1 else versions.max + 1
    val merged =
      if (versions.isEmpty) updates
      else upsert(spark.read.parquet(s"$tableDir/v${versions.max}"), updates, keys)
    merged.write.mode("errorifexists").parquet(s"$tableDir/v$next")
    next
  }

  /**
   * Sharded training-data export with a verification manifest: write `df`
   * as one parquet partition per hash shard in the [[shuffleShards]]
   * training order, then read the WRITTEN files back and emit a manifest of
   * per-shard row counts and order-free content checksums (bit_xor over
   * xxhash64 of id and shard position). The manifest certifies what landed
   * on disk — not what the job intended to write — so a later re-read diff
   * against it is the export integrity check; it is written as JSON next to
   * the data and returned. Scale shape: one shard exchange for the write
   * (file-per-shard, in-shard training order via the partition-local sort)
   * + one aggregation over the re-read for the manifest.
   */
  def exportShards(spark: org.apache.spark.sql.SparkSession, df: DataFrame,
      idColName: String, nShards: Int, outDir: String): DataFrame = {
    val sharded = shuffleShards(df, col(idColName), nShards)
    sharded.repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$outDir/data")
    val manifest = shardManifest(spark.read.parquet(s"$outDir/data"), idColName)
    manifest.coalesce(1).write.mode("overwrite").json(s"$outDir/manifest")
    manifest
  }

  /** Per-shard (n_rows, checksum) of a sharded export frame: the re-read
    * side of the [[exportShards]] integrity check. Checksum is bit_xor of
    * xxhash64(id, shard_pos) — order-free, so any row loss, duplication, or
    * position corruption flips it regardless of read order. */
  def shardManifest(written: DataFrame, idColName: String): DataFrame =
    written.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        expr(s"bit_xor(xxhash64(cast($idColName AS string), shard_pos))")
          .as("checksum"))

  /** Latest version directory of a [[mergeIntoParquet]] table. */
  def latestVersion(spark: org.apache.spark.sql.SparkSession,
      tableDir: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(tableDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = fs.listStatus(path).map(_.getPath.getName)
      .filter(_.matches("v\\d+")).map(_.drop(1).toInt).max
    spark.read.parquet(s"$tableDir/v$v")
  }
}
