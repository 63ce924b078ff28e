package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling, TextOps}

/**
 * Pipeline observability via Dataset.observe: stage counters (rows in, rows
 * surviving dedup, rows surviving quality) ride the plan as observed metrics
 * — zero extra passes, zero effect on results — and are collected from
 * queryExecution after the action. The production story for "how many docs
 * did each stage drop" without running the pipeline twice.
 */
class ObservabilitySpec extends SparkSpec {
  import spark.implicits._

  test("observe counters account for every drop across the corpus pipeline") {
    val goodText = "the quick brown token run " * 5
    val docs = (
      (1L to 40L).map(i => (i, goodText + i)) ++        // unique, quality-pass
      (41L to 50L).map(i => (i, goodText + "copy")) ++  // near-dup cluster
      (51L to 60L).map(i => (i, "too short"))           // quality-fail
    ).toDF("doc_id", "text")
    // note: observe() belongs on LINEAR pipeline stages — the input frame
    // feeds both the candidate subtree and the keep join, and a metrics node
    // referenced from multiple branches does not aggregate usefully

    val cands = Dedup.lshCandidates(Dedup.lshBuckets(
      Dedup.minhashSignatures(docs, col("text"), col("doc_id"))))
    val drops = Dedup.ngramJaccard(cands, docs, col("text"), col("doc_id"))
      .filter(col("jaccard") >= 0.8).select(col("doc_b").as("doc_id"))
    val kept = docs.join(drops, Seq("doc_id"), "left_anti")
      .observe("stage_dedup", count(lit(1)).as("n_after_dedup"))
    val quality = TextOps.qualityFilter(kept, col("text"))
      .filter(col("quality_keep") === 1)
      .observe("stage_quality", count(lit(1)).as("n_after_quality"))
    val out = Sampling.hashSplit(quality, col("doc_id"),
      Seq("train" -> 80, "val" -> 10, "test" -> 10))

    // collect() executes THIS DataFrame's QueryExecution — count() would
    // build a different one and the observed metrics would stay empty
    val resultRows = out.collect().length.toLong
    val metrics = out.queryExecution.observedMetrics
    val nDedup = metrics("stage_dedup").getAs[Long]("n_after_dedup")
    val nQuality = metrics("stage_quality").getAs[Long]("n_after_quality")

    // BOTH 10-doc clusters (the near-dup texts AND the identical short docs)
    // collapse to their min id: 60 - 9 - 9
    assert(nDedup == 42)
    assert(nQuality == nDedup - 1) // the surviving short doc fails quality
    assert(resultRows == nQuality) // split is a pure projection: no drops
  }
}
