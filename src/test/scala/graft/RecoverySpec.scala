package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.FlightOps

/** Checkpointed state recovery — the fault-tolerance the reference opts out
  * of (no checkpointing, throwaway consumer groups, state lost on failure):
  * a windowed aggregation stopped mid-stream resumes from its checkpoint
  * with accumulated state intact and offsets not reprocessed. */
class RecoverySpec extends SparkSpec {

  private def ev(id: String, sched: String, delayed: Boolean) =
    s"""{"flightId":"$id","flightNumber":"AA-1","airline":"AA","origin":"A",
       |"destination":"B","scheduledArrival":"$sched","actualArrival":"$sched",
       |"delayed":$delayed,"userId":"u"}""".stripMargin.replace("\n", "")

  test("windowed aggregation resumes from checkpoint with state intact") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val cp = Files.createTempDirectory("graft-recover-cp").toString
    def agg = FlightOps.parseFlightEvents(input.toDF())
      .groupBy(window(col("scheduled_time"), "2 minutes"), col("airline"))
      .agg(count(lit(1)).as("n"), sum(col("is_delayed")).as("n_delayed"))

    // (memory sink does not support recovery; foreachBatch does)
    val emitted = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    def start() = agg.writeStream
      .option("checkpointLocation", cp).outputMode(OutputMode.Update)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        emitted.synchronized { emitted ++= b.collect() }; ()
      }.start()

    // phase 1: two events into the same window, then "crash" (stop)
    val q1 = start()
    input.addData(
      ev("F1", "2024-01-01T10:00:10", true),
      ev("F2", "2024-01-01T10:00:20", false))
    q1.processAllAvailable()
    q1.stop()

    // phase 2: restart from the SAME checkpoint, same source, more data into
    // the same window
    emitted.synchronized(emitted.clear())
    val q2 = start()
    input.addData(ev("F3", "2024-01-01T10:01:50", true))
    q2.processAllAvailable()
    val last = emitted.synchronized(emitted.filter(_.getAs[String]("airline") == "AA").toSeq)
    q2.stop()

    // the restarted query's update row must reflect ALL THREE events — the
    // pre-crash state was recovered, and F1/F2 were not reprocessed as new
    assert(last.nonEmpty, "restarted query emitted nothing")
    val r = last.last
    assert(r.getAs[Long]("n") == 3L, s"expected recovered count 3, got $r")
    assert(r.getAs[Long]("n_delayed") == 2L)
  }
}
