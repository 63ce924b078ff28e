package graft

/**
 * Catalog-wide degenerate-corpus sweep: every `SparkEntry.queries` row must
 * execute clean against (a) a schema-matched EMPTY corpus and (b) a
 * single-row corpus. Operators meet these inputs in production constantly —
 * an empty ingest batch, a filter that drops everything, a one-document
 * tenant — and the failure mode is the worst kind: a runtime exception on
 * LEGAL input (the ADVICE-r10 `kmvDistinct` element_at(_, 0) crash was
 * exactly this class). The sweep is the regression fence for that class:
 * results may be empty, but nothing may throw.
 */
class EdgeCorpusSpec extends SparkSpec {
  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")
  private val src = "/root/testdata/sf0.001"

  /** Schema-matched n-row copies of every table (read via the adaptive
    * loaders' raw source so types round-trip exactly). */
  private def materialize(suffix: String, n: Int): String = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft-edge-$suffix"
    tables.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").limit(n)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    out
  }

  private def sweep(dir: String): Unit = {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).collect(); None }
        catch {
          case e: Throwable =>
            val msg = Option(e.getMessage).getOrElse("").linesIterator
              .take(3).mkString(" | ").take(300)
            Some(s"$name: ${e.getClass.getSimpleName}: $msg")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} catalog queries crashed on degenerate input:\n" +
        failures.mkString("\n"))
  }

  test("every catalog query runs clean on an EMPTY corpus") {
    sweep(materialize("empty", 0))
  }

  test("every catalog query runs clean on a SINGLE-ROW corpus") {
    sweep(materialize("one", 1))
  }
}
