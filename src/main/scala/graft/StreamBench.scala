package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.EventSource
import graft.operators.FlightOps

/**
 * Streaming throughput micro-benchmark: rate source → flight-event JSON →
 * full parse → 2-minute windowed aggregation → noop sink, measured from the
 * engine's own StreamingQueryProgress. Prints one JSON line with sustained
 * rows/sec.
 *
 * (For context: the reference runs the same logical pipeline at parallelism
 * 1 with ≥3 log lines per record and single-row JDBC inserts — this exists
 * to show the Spark pipeline's single-node headroom, not for the driver
 * gate.)
 */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val seconds = sys.env.getOrElse("SPARK_GRAFT_STREAM_SECS", "30").toInt
    val rate = sys.env.getOrElse("SPARK_GRAFT_STREAM_RATE", "200000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.enableJsonExpressionOptimization", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_STREAM_SOURCE=flight-gen drives the DataSource V2
    // connector (wire-format JSON generated connector-side) instead of the
    // rate source's driver-side synthesis.
    // SPARK_GRAFT_STREAM_PIPELINE=softdedup swaps the measured pipeline for
    // the stateful soft-dedup cluster maintenance (MinHash signing
    // projection → per-bucket flatMapGroupsWithState) over synthetic docs
    // with a 1-in-64 duplicate-family schedule — the custom-state
    // throughput number next to the stateless parse/window headline.
    // SPARK_GRAFT_STREAM_PIPELINE=sign runs ONLY the stateless MinHash
    // signing projection of the softdedup pipeline (shingle → 16 md5 folds
    // → band explode) into the noop sink — the attribution control that
    // splits the softdedup ceiling into signing-projection cost vs
    // shuffle + stateful-operator cost (verdict-r12 item 3).
    val pipeline = sys.env.getOrElse("SPARK_GRAFT_STREAM_PIPELINE", "flight")
    // outputMode keys on the pipeline name, so a typo'd value must fail
    // HERE rather than silently running the flight aggregation in append
    // mode (r13 advice)
    require(Set("flight", "softdedup", "sign").contains(pipeline),
      s"unknown SPARK_GRAFT_STREAM_PIPELINE '$pipeline' " +
        "(expected flight | softdedup | sign)")
    def syntheticDocs = spark.readStream.format("rate")
      .option("rowsPerSecond", rate).load()
      .select(col("value").as("doc_id"),
        concat_ws(" ", lit("document body token stream number"),
          (col("value") % 64).cast("string"), lit("with shared family text"),
          (col("value") % 64 * 7).cast("string")).as("text"))
    val agged = pipeline match {
      case "softdedup" =>
        // raw rate source (EventSource.Rate wraps values into flight JSON)
        graft.streaming.StatefulOps
          .softDedupStream(syntheticDocs, "doc_id", "text").toDF()
      case "sign" =>
        graft.operators.Dedup
          .signatureEntries(syntheticDocs, col("text"), col("doc_id"),
            keepSig = true)
          .select(concat_ws(":", col("band"), col("bucket")).as("bkey"),
            col("doc_id"), col("sig"))
      case _ =>
        val raw = (sys.env.getOrElse("SPARK_GRAFT_STREAM_SOURCE", "rate") match {
          case "flight-gen" =>
            EventSource.FlightGen(numRows = Long.MaxValue, rowsPerBatch = rate,
              numPartitions = cpus.toInt)
          case _ => EventSource.Rate(rowsPerSecond = rate)
        }).load(spark)
        FlightOps.parseFlightEvents(raw)
          .withWatermark("scheduled_time", "10 minutes")
          .groupBy(window(col("scheduled_time"), "2 minutes"), col("airline"))
          .agg(count(lit(1)).as("total_flights"),
            sum(col("is_delayed")).as("delayed"),
            avg(col("delay_minutes")).as("avg_delay"))
    }

    val q = agged.writeStream
      .option("checkpointLocation", Files.createTempDirectory("sb-cp").toString)
      .outputMode(if (pipeline == "flight") "update" else "append")
      .format("noop")
      .start()

    Thread.sleep(seconds * 1000L)
    q.stop()
    // engine-reported input rows/sec, excluding the first (cold) batch
    val progresses = q.recentProgress.drop(1)
    val rows = progresses.map(_.numInputRows).sum
    val secs = progresses.map(_.batchDuration).sum / 1000.0
    val rps = if (secs > 0) rows / secs else 0.0
    // Ceiling ATTRIBUTION (verdict-r12 item 3): per-batch durationMs
    // breakdown (driver wall per phase, summed over the measured batches)
    // plus the state-store operator metrics StateOperatorProgress already
    // carries. The state timings (updates/removals/commit) are SUMS ACROSS
    // TASKS within each batch, so on local[32] they can exceed the batch
    // wall — compare them to addBatch×cores, not to addBatch. rows_total/
    // mem_bytes are end-of-run snapshots (last batch), the resident state
    // footprint the r12 bounding work is supposed to cap.
    def sumDur(key: String): Long = progresses.map { p =>
      Option(p.durationMs.get(key)).map(_.longValue).getOrElse(0L)
    }.sum
    val durJson = Seq("addBatch", "getBatch", "latestOffset", "queryPlanning",
        "walCommit", "commitOffsets", "triggerExecution")
      .map(k => s""""$k":${sumDur(k)}""").mkString("{", ",", "}")
    val stateJson = {
      val ops = progresses.flatMap(_.stateOperators)
      if (ops.isEmpty) "null"
      else {
        val last = progresses.last.stateOperators
        s"""{"rows_total":${last.map(_.numRowsTotal).sum},""" +
          s""""mem_bytes":${last.map(_.memoryUsedBytes).sum},""" +
          s""""rows_updated":${ops.map(_.numRowsUpdated).sum},""" +
          s""""rows_removed":${ops.map(_.numRowsRemoved).sum},""" +
          s""""updates_ms":${ops.map(_.allUpdatesTimeMs).sum},""" +
          s""""removals_ms":${ops.map(_.allRemovalsTimeMs).sum},""" +
          s""""commit_ms":${ops.map(_.commitTimeMs).sum},""" +
          s""""store_instances":${last.map(_.numStateStoreInstances).sum}}"""
      }
    }
    println(f"""{"metric":"stream_rows_per_sec","value":$rps%.0f,"unit":"rows/sec","rows":$rows,"busy_secs":$secs%.1f,"batches":${progresses.length},"offered_rate":$rate,"pipeline":"$pipeline","duration_ms":$durJson,"state":$stateJson}""")
    spark.stop()
  }
}
