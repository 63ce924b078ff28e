package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Learn

/**
 * The distributed trainer's contract (Learn.scala): exact-integer full-batch
 * perceptron. Cross-engine trajectory parity is the catalog oracle's job
 * (`learn_perceptron`); these specs pin the LEARNING behavior itself.
 */
class LearnSpec extends SparkSpec {
  import spark.implicits._

  /** Tiny hand-separable set: y = sign(x2 - x1) (4 positive, 4 negative,
    * margin ≥ 1 under w* = (-1, 1, 0)) — Novikoff guarantees the perceptron
    * converges; with these values it takes a handful of batch rounds. */
  private def toy() = Seq(
    (1L, 1L, 3L), (2L, 2L, 5L), (3L, 3L, 8L), (4L, 4L, 2L),
    (5L, 5L, 9L), (6L, 6L, 1L), (7L, 7L, 4L), (8L, 8L, 3L))
    .toDF("doc_id", "x1", "x2")
    .select(col("doc_id"),
      when(col("x2") > col("x1"), 1L).otherwise(-1L).as("y"),
      col("x1"), col("x2"), lit(1L).as("x_bias"))

  test("perceptron converges to zero mistakes on separable toy data") {
    val hist = Learn.perceptronHistory(toy(), iters = 32,
      fc = Seq("x1", "x2", "x_bias")).collect().sortBy(_.getLong(0))
    val finalMis = hist.last.getLong(hist.last.fieldIndex("n_mis"))
    assert(finalMis === 0L, s"did not converge: ${hist.map(_.toSeq).mkString("; ")}")
    // once converged the update is empty — weights freeze
    val frozen = hist.dropWhile(_.getLong(4) > 0)
    assert(frozen.nonEmpty && frozen.map(_.getLong(1)).distinct.length === 1)
  }

  test("trajectory is partition-invariant (exact integer sums)") {
    val base = Learn.markerFeatures(
      Tables.documents(spark, "/root/testdata/sf0.001"),
      col("doc_id"), col("text"))
    def run(parts: Int): Seq[Seq[Any]] =
      Learn.perceptronHistory(base.repartition(parts), iters = 6)
        .collect().toSeq.map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(run(1) === run(7))
  }

  test("corpus marker concept is learned: mistakes drop by 10x and accuracy is high") {
    val feats = Learn.markerFeatures(
      Tables.documents(spark, "/root/testdata/sf0.001"),
      col("doc_id"), col("text"))
    val hist = Learn.perceptronHistory(feats, iters = 16)
      .collect().sortBy(_.getLong(0))
    val nMisIdx = hist.head.fieldIndex("n_mis")
    val (first, last) = (hist.head.getLong(nMisIdx), hist.last.getLong(nMisIdx))
    assert(first === 500L) // zero weights misclassify everything (margin 0)
    assert(last <= first / 10, s"no learning: n_mis $first -> $last")
    val preds = Learn.perceptronPredict(feats, iters = 16)
    val acc = preds.agg(avg(col("correct"))).head().getDouble(0)
    assert(acc >= 0.95, s"accuracy $acc")
  }

  test("averaged weights are the exact trajectory sum (sign-equivalent serving)") {
    val hist = Learn.perceptronHistory(toy(), iters = 8,
      fc = Seq("x1", "x2", "x_bias")).collect()
    val summed = Seq(1, 2, 3).map(i => hist.map(_.getLong(i)).sum)
    val avg = Learn.averagedWeights(toy(), iters = 8,
      fc = Seq("x1", "x2", "x_bias"))
    assert(avg.toSeq === summed)
  }

  test("streaming scoreStatic matches batch predict (stateless serving projection)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val feats = Learn.markerFeatures(
      Tables.documents(spark, "/root/testdata/sf0.001"),
      col("doc_id"), col("text"))
    val w = Learn.perceptronWeights(feats, iters = 16)
    val batch = Learn.scoreStatic(feats, w.toSeq)
      .as[(Long, Long, Long, Int)].collect().toSet
    val rows = feats
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    val input = MemoryStream[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
    val scored = Learn.scoreStatic(
      input.toDF().toDF("doc_id" +: "y" +: Learn.featureCols: _*), w.toSeq)
    val q = scored.writeStream.format("memory").queryName("learn_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("learn-cp").toString)
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(rows.take(200): _*)
      q.processAllAvailable()
      input.addData(rows.drop(200): _*)
      q.processAllAvailable()
      val got = spark.table("learn_out")
        .as[(Long, Long, Long, Int)].collect().toSet
      assert(got == batch, "streamed perceptron scores diverge from batch")
    } finally q.stop()
  }

  test("weight artifact round-trips and validates its feature layout") {
    val feats = Learn.markerFeatures(
      Tables.documents(spark, "/root/testdata/sf0.001"),
      col("doc_id"), col("text"))
    val w = Learn.perceptronWeights(feats, iters = 4)
    val path = java.nio.file.Files
      .createTempDirectory("learn-w").toString + "/weights"
    Learn.writeWeights(spark, path, w.toSeq)
    assert(Learn.readWeights(spark, path).toSeq === w.toSeq)
    // layout mismatch must raise, not silently mis-score
    intercept[IllegalArgumentException] {
      Learn.readWeights(spark, path, fc = Seq("x1", "x2"))
    }
  }

  test("empty input trains to zero weights without failing") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      Learn.markerFeatures(
        Tables.documents(spark, "/root/testdata/sf0.001"),
        col("doc_id"), col("text")).schema)
    val hist = Learn.perceptronHistory(empty, iters = 3).collect()
    assert(hist.length === 3)
    assert(hist.forall(r => (1 to Learn.featureCols.length)
      .forall(i => r.getLong(i) == 0L)))
  }
}
