package graft
object EdgeProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSession.spark
    val dir = System.getProperty("java.io.tmpdir") + "/graft-edge-empty"
    for (n <- Seq("events_profile", "sketch_kmv_overlap", "corpus_pipeline_v3")) {
      try { SparkEntry.queries(n)(spark, dir).collect(); println(s"$n OK") }
      catch { case e: Throwable => println(s"=== $n"); e.printStackTrace() }
    }
  }
}
