package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Focused probe for the warm-components-admission cost (the r11
  * investigation behind admitComponents' two-tier contracted solve): times
  * ONLY the cold `dedup_components` recompute vs the warm admission unit at
  * 1× and 10× of sf0.1, reusing the `/tmp/graft-scale-10x` corpus if a
  * prior ScaleStress run left it behind. */
object DebugWarm {
  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warm-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val dirs = Seq(1 -> baseDir) ++ {
      val d = new java.io.File("/tmp/graft-scale-10x/documents.parquet")
      if (d.exists) Seq(10 -> "/tmp/graft-scale-10x") else Nil
    }
    dirs.foreach { case (k, dir) =>
      // cold: the catalog row
      val t0 = System.nanoTime()
      val nCold = Queries.queries("dedup_components")(spark, dir).count()
      val cold = (System.nanoTime() - t0) / 1e9

      // warm: persisted index + shingles + labels outside the timer
      val docs = Tables.documents(spark, dir)
      val cut = docs.agg(floor(max(col("doc_id")) * 4 / 5).cast("long"))
        .head().getLong(0)
      val oldDocs = docs.filter(col("doc_id") < cut)
      val newDocs = docs.filter(col("doc_id") >= cut)
      val index = Dedup.signatureIndex(oldDocs, col("text"), col("doc_id"))
        .localCheckpoint()
      val shingleStore =
        Dedup.shingleSets(docs, col("text"), col("doc_id")).localCheckpoint()
      val oldEdges = Dedup.ngramJaccardOnShingles(
          Dedup.lshCandidates(index), shingleStore)
        .filter(col("jaccard") >= 0.8).select(col("doc_a"), col("doc_b"))
      val labelArtifact = Dedup.connectedComponents(
          oldDocs.select(col("doc_id").as("id")), oldEdges).localCheckpoint()
      val t1 = System.nanoTime()
      val entries = Dedup.signatureEntries(newDocs, col("text"), col("doc_id"))
        .localCheckpoint()
      val newEdges = Dedup.ngramJaccardOnShingles(
          Dedup.incrementalCandidates(index, entries), shingleStore)
        .filter(col("jaccard") >= 0.8).select(col("doc_a"), col("doc_b"))
      val nWarm = Dedup.admitComponents(labelArtifact,
        newDocs.select(col("doc_id").as("id")), newEdges).count()
      val warm = (System.nanoTime() - t1) / 1e9
      println(f"""{"scale":$k,"cold_sec":$cold%.2f,"warm_sec":$warm%.2f,""" +
        f""""warm_vs_cold":${warm / cold}%.2f,"rows_cold":$nCold,"rows_warm":$nWarm}""")
    }
    spark.stop()
  }
}
