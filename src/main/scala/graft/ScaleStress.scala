package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Dedup-chain scale-stress harness: times the three headline dedup queries
 * (`dedup_lsh_candidates`, `dedup_near_keep`, `dedup_incremental`) against
 * the sf0.1 documents corpus self-unioned to 3× and 10×, through the EXACT
 * catalog code paths (the scaled corpus is written as a `documents.parquet`
 * dir and read back via `Queries.queries(name)(spark, dir)`).
 *
 * Corpus construction: copy `i` remaps `doc_id` by `i * idSpan` and salts a
 * per-copy token into every inter-word gap, so every shingle differs across
 * copies. Copies therefore do NOT near-match each other — each copy carries
 * the original corpus's internal duplicate structure, keeping duplicate-pair
 * density per row CONSTANT as the corpus grows. That is the honest scaling
 * measurement: k× rows of representative data, not k² cross-copy pairs of a
 * degenerate all-duplicates corpus (which no dedup engine — including the
 * from-scratch oracle — scales linearly on, because the answer itself is
 * quadratic).
 *
 * Prints one JSON line per (scale, query) with wall seconds; run via
 *   sbt "runMain graft.ScaleStress"
 * Results are recorded in BASELINE.md's scale-stress table.
 */
object ScaleStress {

  private val queries = Seq("dedup_lsh_candidates", "dedup_near_keep", "dedup_incremental")

  def scaledCorpus(spark: SparkSession, baseDir: String, k: Int): DataFrame = {
    val base = Tables.documents(spark, baseDir)
    val idSpan = base.agg(max(col("doc_id"))).head().getLong(0) + 1L
    (0 until k).map { i =>
      base.select(
        (col("doc_id") + lit(i.toLong * idSpan)).as("doc_id"),
        // salt every inter-word gap so all word-shingles are copy-local
        regexp_replace(col("text"), "\\s+", s" c$i ").as("text"))
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.enableJsonExpressionOptimization", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm up codegen/JVM so the 1x numbers aren't absorbing startup cost
    spark.range(1000000).selectExpr("sum(id)").collect()
    Queries.queries("dedup_near_keep")(spark, baseDir).count()

    val scales = Seq(1, 3, 10)
    val results = scales.flatMap { k =>
      val dir =
        if (k == 1) baseDir
        else {
          val d = s"/tmp/graft-scale-${k}x"
          scaledCorpus(spark, baseDir, k).coalesce(cpus.toInt)
            .write.mode("overwrite").parquet(s"$d/documents.parquet")
          d
        }
      queries.map { name =>
        val t0 = System.nanoTime()
        val n = Queries.queries(name)(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"scale":$k,"query":"$name","sec":$sec%.2f,"rows":$n}""")
        (k, name, sec)
      }
    }
    // summary: per-row scaling ratio vs 1x, and incremental-vs-keep ratio
    val t = results.map { case (k, q, s) => (k, q) -> s }.toMap
    scales.filter(_ > 1).foreach { k =>
      queries.foreach { q =>
        println(f"""{"summary":"per_row_ratio","query":"$q","scale":$k,""" +
          f""""ratio":${t((k, q)) / (t((1, q)) * k)}%.2f}""")
      }
      println(f"""{"summary":"incr_vs_keep","scale":$k,""" +
        f""""ratio":${t((k, "dedup_incremental")) / t((k, "dedup_near_keep"))}%.2f}""")
    }
    spark.stop()
  }
}
