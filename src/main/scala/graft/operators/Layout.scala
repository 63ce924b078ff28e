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
}
