package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextOps}

/** Dev-only: per-round convergence trace on corpus_pipeline_v5's graph. */
object DebugV5 {
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
    val docs = Tables.documents(spark, sfDir)
    val q = TextOps.qualityFilter(docs, col("text"))
      .select(col("doc_id"), col("quality_keep"), col("n_tokens"))
    val c = TextOps.classifierScore(docs, col("text"), col("doc_id"),
      weights = Seq(5L, -3L, 7L, 2L, -8L, 4L, 1L, -2L, 6L, -5L, 3L, 9L,
        -1L, -4L, 8L, 2L), bias = -40L, threshold = -60L)
      .select(col("doc_id"), col("clf_keep"))
    val kept = q.join(c, "doc_id")
      .filter(col("quality_keep") === 1 && col("clf_keep") === 1)
      .select(col("doc_id").as("vec_id"), col("n_tokens"))
    val embKept = Tables.embeddings(spark, sfDir).join(kept, Seq("vec_id"))
    val g = Similarity.knnGraph(embKept, "vec_id", "embedding", k = 3,
      nBands = 4, rowsPerBand = 2, dim = 64).localCheckpoint()
    val e = g.select(col("src_id"), col("dst_id")).localCheckpoint()
    val mutual = e.join(
        e.select(col("dst_id").as("src_id"), col("src_id").as("dst_id")),
        Seq("src_id", "dst_id"), "left_semi")
      .filter(col("src_id") < col("dst_id"))
      .select(col("src_id").as("doc_a"), col("dst_id").as("doc_b"))
      .localCheckpoint()
    println("  mutual = " + mutual.count())
    // prod loop replica with checkpointFresh + doubling, verbose
    def fresh(df: org.apache.spark.sql.DataFrame) = {
      val ck = df.localCheckpoint()
      spark.createDataFrame(ck.rdd, df.schema)
    }
    val edges = mutual
      .select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint()
    var labels = fresh(edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id")))
    var iter = 0
    var done = false
    while (!done && iter < 30) {
      val t0 = System.nanoTime()
      val neighborMin = edges
        .join(labels.select(col("id").as("dst"), col("component").as("ncomp")), "dst")
        .groupBy(col("src")).agg(min(col("ncomp")).as("nmin"))
      val prop = labels
        .join(neighborMin.select(col("src").as("id"), col("nmin")), Seq("id"), "left")
        .select(col("id"), col("component").as("prev"),
          least(col("component"), coalesce(col("nmin"), col("component"))).as("comp1"))
      val shortcut =
        if (iter < 2) prop.select(col("id"), col("prev"), col("comp1").as("component"))
        else {
          var cur = fresh(prop.select(col("id"), col("prev"), col("comp1")))
          var j = 0
          while (j < 8) {
            cur = cur
              .join(cur.select(col("id").as("comp1"), col("comp1").as("comp2")),
                Seq("comp1"), "left")
              .select(col("id"), col("prev"),
                least(col("comp1"), coalesce(col("comp2"), col("comp1"))).as("comp1"))
            if (j % 2 == 1) cur = fresh(cur)
            j += 1
          }
          cur.withColumnRenamed("comp1", "component")
        }
      val joined = shortcut
        .withColumn("chg", (col("component") < col("prev")).cast("long"))
        .drop("prev")
      val updated = if ((iter + 1) % 3 == 0) fresh(joined) else joined
      val nChanged = updated.agg(coalesce(sum(col("chg")), lit(0L))).first().getLong(0)
      println(f"  round $iter%2d nChanged=$nChanged%6d  ${(System.nanoTime()-t0)/1e9}%6.2f s")
      done = nChanged == 0L
      labels = updated.drop("chg")
      iter += 1
    }
    spark.stop()
  }
}
