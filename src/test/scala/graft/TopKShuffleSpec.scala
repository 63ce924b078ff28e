package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/**
 * Measures the bounded-shuffle claim of the native
 * [[graft.functions.BoundedTopK]] aggregate against the row_number() window
 * formulation, on real task metrics (shuffle-write records), at 1× and 10×
 * the sf0.1 events table.
 *
 * Measured reality (recorded in BASELINE.md round-8 notes): Spark 4's
 * rank-limit pushdown plans a PARTIAL WindowGroupLimit below the exchange,
 * so the window form no longer shuffles every row — its shuffle is
 * mappers·keys·k rows (15k/150k at 1×/10× here), not N. The heap
 * aggregate's remaining edges, which this spec pins: (a) it shuffles
 * mappers·keys rows (one k-array each) — k× fewer rows than the window
 * form at identical value volume; (b) its map side is heap updates
 * (O(N log k), no sort) while WindowGroupLimit sits ABOVE a full local
 * Sort of all N input rows (O(N log N)) — verified on the plan; (c) both
 * forms' shuffles stay ≪ N at every scale.
 */
class TopKShuffleSpec extends SparkSpec {

  private class ShuffleWriteListener extends SparkListener {
    val records = new AtomicLong(0)
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      if (e.taskMetrics != null)
        records.addAndGet(e.taskMetrics.shuffleWriteMetrics.recordsWritten)
    def reset(): Unit = records.set(0)
  }

  private def measured(listener: ShuffleWriteListener)(df: DataFrame): Long = {
    listener.reset()
    df.queryExecution.toRdd.count() // full plan, no count-pruning
    Thread.sleep(1500)              // drain the listener bus
    listener.records.get
  }

  test("heap top-k shuffle stays k-fold below the window form's, both far below N") {
    val listener = new ShuffleWriteListener
    spark.sparkContext.addSparkListener(listener)
    try {
      val base = Tables.events(spark, "/root/testdata/sf0.1")
        .select(col("user_id"), col("value"), col("event_id"))
      val n1 = base.count()

      def topk(df: DataFrame): DataFrame = df
        .groupBy(col("user_id"))
        .agg(GraftFunctions.topk_by(struct(col("value"), col("event_id")), 10).as("top"))
      def windowed(df: DataFrame): DataFrame = df
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("value").desc, col("event_id").desc)))
        .filter(col("rnk") <= 10)

      val m = measured(listener) _
      val topk1 = m(topk(base))
      val win1 = m(windowed(base))
      val big = (0 until 10).map(_ => base).reduce(_ unionByName _)
      val topk10 = m(topk(big))
      val win10 = m(windowed(big))
      info(s"shuffle-write records: n=$n1 topk1=$topk1 win1=$win1 " +
        s"topk10=$topk10 win10=$win10")

      // both forms' shuffles are bounded far below the input row count
      // (WindowGroupLimit prunes map-side since Spark 3.5)
      assert(win1 * 5 < n1, s"window shuffle $win1 should be far below n=$n1")
      assert(win10 * 5 < 10 * n1)
      // the heap aggregate shuffles one k-array row per (mapper, key):
      // k-fold fewer rows than the window form's k rows per (mapper, key)
      assert(topk1 * 5 <= win1, s"topk rows $topk1 not ~k-fold below window $win1")
      assert(topk10 * 5 <= win10)
      // and the window form's map side must contain a full Sort below the
      // partial group limit — the O(N log N) cost the heap form never pays
      val winPlan = windowed(base).queryExecution.executedPlan.toString
      assert(winPlan.contains("WindowGroupLimit"), winPlan)
      assert(winPlan.replaceAll("(?s)Exchange.*", "").contains("Sort"),
        s"expected map-side sort above the exchange in:\n$winPlan")
      val topkPlan = topk(base).queryExecution.executedPlan.toString
      assert(!topkPlan.contains("Sort "), s"heap form must not sort:\n$topkPlan")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
