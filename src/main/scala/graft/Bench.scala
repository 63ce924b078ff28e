package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every catalog query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A warmup pass (tiny action + one full run of the
  * first query) separates JVM/codegen startup from steady-state timings;
  * each query is then timed on a single full execution (count action).
  * Optional args restrict the run to the named queries (dev loop). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.enableJsonExpressionOptimization", "false")
      .config("spark.graft.parallelizeSmallScans", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => args.contains(n) }
    val unmatched = args.filterNot(SparkEntry.queries.contains)
    if (unmatched.nonEmpty)
      System.err.println(
        s"[bench] WARNING: unmatched query names ignored: ${unmatched.mkString(", ")}")
    // Warm up JVM, codegen, parquet footer caches — not part of any timing.
    // Warmup runs the first SELECTED query so a restricted dev run still
    // absorbs codegen/footer costs for the plans it actually times.
    spark.range(1000000).selectExpr("sum(id)").collect()
    selected.headOption.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // The driver's bench artifact keeps only the output TAIL (~2 KB), which
    // truncates the 130+-entry per-query map — persist the full line to a
    // file too so every per-query timing survives (BENCH_OUT overrides).
    val outFile = sys.env.getOrElse("BENCH_OUT", "bench_last_run.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"[bench] WARNING: could not write $outFile: $e")
    }
    spark.stop()
  }
}
