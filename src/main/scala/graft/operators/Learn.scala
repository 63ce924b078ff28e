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
  def markerFeatures(docs: DataFrame, idCol: Column, textCol: Column,
      carry: Seq[String] = Nil): DataFrame = {
    val toks = TextOps.tokens(TextOps.normalize(textCol))
    val counts = docs.select(
      idCol.as("doc_id") +: carry.map(col) ++:
        markerWords.map(w =>
          size(filter(toks, t => t === w)).cast("long").as(s"x_$w")): _*)
    val (posW, negW) = markerWords.splitAt(3)
    val pos = posW.map(w => col(s"x_$w")).reduce(_ + _)
    val neg = negW.map(w => col(s"x_$w")).reduce(_ + _)
    counts.select(
      col("doc_id") +: carry.map(col) ++:
        (when(pos > neg, 1L).otherwise(-1L).as("y") +:
          markerWords.map(w => col(s"x_$w")) :+ lit(1L).as("x_bias")): _*)
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

  // ==========================================================================
  // Closed-form ridge regression via distributed normal equations
  // ==========================================================================

  /**
   * Exact rational solution of (XᵀX + λI) w = Xᵀy: the weight NUMERATORS
   * (Cramer determinants) and the shared denominator det(XᵀX + λI), all in
   * arbitrary-precision integers. With λ ≥ 1 the system matrix is positive
   * definite, so det ≥ 1 and the solution exists for ANY input — including
   * an empty corpus (A = λI, w = 0). w_i = wNum(i) / det exactly.
   */
  final case class RidgeModel(features: Seq[String], wNum: Seq[BigInt],
      det: BigInt, lambda: Long)

  /**
   * One-PASS closed-form trainer — the counterpart to the iterated
   * perceptron loop: no iterations, no per-row state, no join. The only
   * distributed work is a single aggregate computing the d(d+1)/2 Gram
   * entries Σ xᵢxⱼ and the d moment sums Σ xᵢy (map-side partials reduce to
   * O(d²) scalars — at 100 TB that is one exchange of a few dozen longs per
   * map task). The d×d solve happens on the driver in exact BigInt
   * arithmetic (fraction-free Bareiss determinants + Cramer's rule), so the
   * full training result is summation-order-independent and cross-engine
   * verifiable bit-for-bit — a float gradient trajectory could never be.
   *
   * Overflow: Gram sums are LONG (ANSI mode raises loudly on overflow);
   * with per-row features ≤ 10³ that holds to 10¹² rows. The determinants
   * live in BigInt on the driver and are emitted as decimal(38,0): for this
   * catalog's marker-count features (≤ 9) the largest value at 10⁹ docs is
   * ~10³⁵ — inside decimal(38) and DuckDB's HUGEINT. */
  def ridgeFit(feats: DataFrame, xc: Seq[String], yCol: String,
      lambda: Long = 1L): RidgeModel = {
    require(xc.nonEmpty, "need at least one feature column")
    require(lambda >= 1L, s"lambda must be >= 1 for guaranteed PD, got $lambda")
    val d = xc.length
    val gram = for (i <- 0 until d; j <- i until d)
      yield sum(col(xc(i)) * col(xc(j))).as(s"s_${i}_$j")
    val mom = (0 until d).map(i => sum(col(xc(i)) * col(yCol)).as(s"b_$i"))
    val aggs = gram ++ mom
    val r = feats.agg(aggs.head, aggs.tail: _*).head()
    def cell(k: Int): BigInt =
      if (r.isNullAt(k)) BigInt(0) else BigInt(r.getLong(k))
    // symmetric Gram matrix + ridge, then d+1 Cramer determinants
    val a = Array.ofDim[BigInt](d, d)
    var k = 0
    for (i <- 0 until d; j <- i until d) {
      a(i)(j) = cell(k); a(j)(i) = cell(k); k += 1
    }
    for (i <- 0 until d) a(i)(i) += BigInt(lambda)
    val b = Array.tabulate(d)(i => cell(k + i))
    val det = bareissDet(a.map(_.clone()))
    val wNum = (0 until d).map { i =>
      val ai = a.map(_.clone())
      for (row <- 0 until d) ai(row)(i) = b(row)
      bareissDet(ai)
    }
    RidgeModel(xc, wNum, det, lambda)
  }

  /** Fraction-free Bareiss determinant: every intermediate is an exact
    * integer (divisions are exact by construction), O(d³) for the driver's
    * tiny d×d system. Mutates its argument. */
  private def bareissDet(m: Array[Array[BigInt]]): BigInt = {
    val n = m.length
    if (n == 0) return BigInt(1)
    var sign = BigInt(1)
    var prev = BigInt(1)
    for (p <- 0 until n - 1) {
      if (m(p)(p) == BigInt(0)) {
        val swap = (p + 1 until n).find(m(_)(p) != BigInt(0))
        swap match {
          case None => return BigInt(0)
          case Some(s) =>
            val t = m(p); m(p) = m(s); m(s) = t; sign = -sign
        }
      }
      for (i <- p + 1 until n; j <- p + 1 until n)
        m(i)(j) = (m(i)(j) * m(p)(p) - m(i)(p) * m(p)(j)) / prev
      prev = m(p)(p)
    }
    sign * m(n - 1)(n - 1)
  }

  /**
   * Fully DISTRIBUTED per-group ridge: one closed-form model per key of
   * `groupCol`, with the Cramer solve itself expressed as Catalyst column
   * expressions (Leibniz expansion over the d! permutations) in exact
   * decimal(38,0) arithmetic — no driver state at ALL, unlike [[ridgeFit]]'s
   * O(d²) collect. The job is one grouped aggregate (map-side combinable
   * Gram/moment partials) followed by a zero-shuffle projection, so a
   * million per-domain models train in a single pass — the model-per-source
   * quality-scorer shape. d ≤ 4 keeps the expansion at ≤ 24 products;
   * beyond that use [[ridgeFit]] per group (driver Bareiss, any d).
   *
   * Output: one row per (group, feature) with the weight numerator and the
   * group's shared determinant as strings (w = w_num / det exactly;
   * λ ≥ 1 ⇒ det ≥ 1 for every group). Groups with no rows don't exist, so
   * the operator is degenerate-input-safe by construction.
   */
  def ridgeFitGrouped(feats: DataFrame, groupCol: Column, xc: Seq[String],
      yCol: String, lambda: Long = 1L): DataFrame = {
    require(xc.nonEmpty && xc.length <= 4,
      s"grouped closed form supports 1..4 features, got ${xc.length}")
    require(lambda >= 1L, s"lambda must be >= 1 for guaranteed PD, got $lambda")
    val d = xc.length
    val gram = for (i <- 0 until d; j <- i until d)
      yield sum(col(xc(i)) * col(xc(j))).as(s"s_${i}_$j")
    val mom = (0 until d).map(i => sum(col(xc(i)) * col(yCol)).as(s"b_$i"))
    val aggs = gram ++ mom
    val g = feats.groupBy(groupCol.as("grp")).agg(aggs.head, aggs.tail: _*)
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def a(i: Int, j: Int): Column = {
      val (lo, hi) = if (i <= j) (i, j) else (j, i)
      val base = col(s"s_${lo}_$hi").cast(dec38)
      if (i == j) base + lit(lambda).cast(dec38) else base
    }
    def b(i: Int): Column = col(s"b_$i").cast(dec38)
    val perms = (0 until d).permutations.toSeq
    def parity(p: Seq[Int]): Int = {
      val inv = (for (i <- p.indices; j <- i + 1 until p.length
        if p(i) > p(j)) yield 1).sum
      if (inv % 2 == 0) 1 else -1
    }
    def detExpr(entry: (Int, Int) => Column): Column =
      perms.map { p =>
        val prod = (0 until d).map(i => entry(i, p(i))).reduce(_ * _)
        if (parity(p) > 0) prod else -prod
      }.reduce(_ + _)
    val det = detExpr(a)
    val rows = (0 until d).map { j =>
      val wj = detExpr((i, c) => if (c == j) b(i) else a(i, c))
      struct(lit(j.toLong).as("pos"), lit(xc(j)).as("feature"),
        wj.cast("string").as("w_num"), det.cast("string").as("det"))
    }
    g.select(col("grp"), explode(array(rows: _*)).as("m"))
      .select(col("grp"), col("m.pos"), col("m.feature"),
        col("m.w_num"), col("m.det"))
  }

  /** The trained model as a frame: one row per feature with its Cramer
    * numerator and the shared determinant, as STRINGS — the values exceed
    * long range beyond ~10⁴ rows, and decimal-as-string is the one encoding
    * both engines render identically (DuckDB's HUGEINT::varchar). */
  def ridgeWeightsFrame(spark: org.apache.spark.sql.SparkSession,
      model: RidgeModel): DataFrame = {
    import spark.implicits._
    model.features.zipWithIndex.map { case (f, i) =>
      (i.toLong, f, model.wNum(i).toString, model.det.toString)
    }.toDF("pos", "feature", "w_num", "det")
  }

  /** Serving projection: exact integer prediction NUMERATOR per row
    * (pred = pred_num / det) and the det-scaled residual
    * res_num = pred_num − det·y, zero-shuffle with the model folded in as
    * decimal literals. Emitted as strings for the same reason as the
    * weights frame. */
  def ridgePredict(rows: DataFrame, model: RidgeModel, idCol: Column,
      yCol: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def big(v: BigInt): Column = lit(new java.math.BigDecimal(v.bigInteger)).cast(dec38)
    val pred = model.features.zipWithIndex
      .map { case (c, i) => col(c).cast(dec38) * big(model.wNum(i)) }
      .reduce(_ + _)
    val res = pred - col(yCol).cast(dec38) * big(model.det)
    rows.select(idCol.as("doc_id"),
      col(yCol).as("y_t"),
      pred.cast("string").as("pred_num"),
      res.cast("string").as("res_num"))
  }

  /** Train, then score with the trajectory-summed (averaged) weights —
    * same serving projection, stabler decision boundary. */
  def perceptronPredictAveraged(feats: DataFrame, iters: Int,
      fc: Seq[String] = featureCols): DataFrame =
    scoreStatic(feats, averagedWeights(feats, iters, fc).toSeq, fc)
}
