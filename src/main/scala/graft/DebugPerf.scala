package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev-only stage profiler for the incremental-dedup chain: times each
  * materialization of the `dedup_incremental` catalog query in isolation so
  * regressions can be attributed to a stage instead of the whole query. */
object DebugPerf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.documents(spark, sfDir)
    val cut = t("cut") {
      docs.agg(floor(max(col("doc_id")) * 4 / 5).cast("long")).head().getLong(0)
    }
    val oldDocs = docs.filter(col("doc_id") < cut)
    val newDocs = docs.filter(col("doc_id") >= cut)
    val index = t("index checkpoint") {
      Dedup.signatureIndex(oldDocs, col("text"), col("doc_id")).localCheckpoint()
    }
    val shingles = t("shingles checkpoint") {
      Dedup.shingleSets(docs, col("text"), col("doc_id")).localCheckpoint()
    }
    val oldCands = Dedup.lshCandidates(index)
    t("oldCands count") { println("  rows=" + oldCands.count()) }
    val oldDrops = Dedup.ngramJaccardOnShingles(oldCands, shingles)
      .filter(col("jaccard") >= 0.8).select(col("doc_b").as("doc_id"))
    val oldKeep = oldDocs.join(oldDrops, Seq("doc_id"), "left_anti")
      .select(col("doc_id"))
    t("oldKeep count") { println("  rows=" + oldKeep.count()) }
    val entries = t("entries checkpoint") {
      Dedup.signatureEntries(newDocs, col("text"), col("doc_id")).localCheckpoint()
    }
    val cands = Dedup.incrementalCandidates(index, entries)
    t("incr cands count") { println("  rows=" + cands.count()) }
    val newKeep = Dedup.incrementalNearDup(
      newDocs, docs, index, col("text"), col("doc_id"),
      corpusShingles = Some(shingles))
    t("newKeep count") { println("  rows=" + newKeep.count()) }
    t("full union count") { println("  rows=" + oldKeep.unionByName(newKeep).count()) }
    spark.stop()
  }
}
