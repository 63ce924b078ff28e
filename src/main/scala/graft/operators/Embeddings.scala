package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Embedding-column transforms for training-data pipelines: L2 normalization,
 * int8 quantization (the storage/bandwidth lever for 100 TB vector corpora),
 * and random projection (Johnson–Lindenstrauss dimensionality reduction).
 *
 * All pure Catalyst projections — zero shuffle, whole-stage codegen — and all
 * arithmetic is deterministic left-to-right double folding, so every derived
 * scalar is bit-exact reproducible in DuckDB for oracle verification.
 */
object Embeddings {

  /** Deterministic projection coefficient for (output dim o, input dim d):
    * the shared md5 derivation ([[Similarity.coeffConst]]) under a distinct
    * "proj" tag so projection directions are independent of the LSH plane
    * family. Evaluated once at plan-build time. */
  def projCoeffConst(o: Int, d: Int): Double = Similarity.coeffConst(s"proj:$o:$d")

  /** vec scaled to unit L2 norm, given its precomputed norm (pass
    * [[Similarity.norm]] of the same column — computing it inside the lambda
    * would redo the O(d) reduction once per element). */
  def l2Normalize(vec: Column, norm: Column): Column =
    transform(vec, x => x / norm)

  /**
   * Per-vector affine int8 quantization: min→-128, max→127, everything else
   * rounded to the nearest of the 256 levels. Constant vectors (scale 0) map
   * to level 0. Returns the int array column; reconstruct with
   * `level * scale + vmin` where `level = q + 128`.
   */
  def quantizeInt8(vec: Column, vmin: Column, vmax: Column): Column = {
    val scale = (vmax - vmin) / lit(255.0)
    transform(vec, x =>
      when(vmax === vmin, lit(0))
        .otherwise(round((x - vmin) / scale).cast("int") - 128))
  }

  /** Random projection to `outDim` dimensions: each output is one codegen'd
    * dot product against a plan-time constant coefficient array. */
  def randomProject(vec: Column, outDim: Int, inDim: Int): Column =
    array((0 until outDim).map { o =>
      val coeffs = array((0 until inDim).map(d => lit(projCoeffConst(o, d))): _*)
      Similarity.dot(vec, coeffs)
    }: _*)

  /** DataFrame form: id, the unit vector, and norms before/after. */
  def normalized(df: DataFrame, idCol: Column, vecCol: Column): DataFrame = {
    val v = Similarity.asDouble(vecCol)
    df.select(idCol.as("vec_id"), v.as("v"))
      .withColumn("norm", Similarity.norm(col("v")))
      .withColumn("unit", l2Normalize(col("v"), col("norm")))
  }

  /**
   * Per-label centroids (class prototypes — the nearest-class-mean /
   * seed-centroid primitive): element-wise mean of every label's vectors.
   *
   * Determinism at scale: a double sum over rows is rounding-order-dependent
   * under parallel aggregation, so each element is first quantized to an
   * exact integer `floor(x · 2^20)` (a float's 24-bit mantissa times 2^20 is
   * exact in double, and floor is unambiguous in every engine — no rounding
   * ties, unlike round()). The integer sums are exact in any order; only the
   * final mean divides back to double, identically everywhere. Quantization
   * error is ≤ 2^-20 per element — far below float32's own noise floor for
   * unit-scale embeddings.
   *
   * Scale shape: one shuffle on label with `dim` partial long sums per group
   * (map-side combined) — no explode, no per-dimension rows, state per group
   * is O(dim). The centroid table is O(labels · dim) and broadcastable
   * downstream.
   */
  /**
   * Per-dimension corpus min/max — the fit half of min-max feature scaling.
   * One projection-aggregate (2·dim partial min/max buffers, map-side
   * combined), fetched eagerly to the driver as O(dim) literals so the
   * transform half stays a zero-shuffle projection with plan-time constants
   * (the bm25-scalars pattern; no 1-row broadcast join in the plan).
   */
  def minMaxStats(df: DataFrame, vecCol: Column, dim: Int): (Array[Double], Array[Double]) = {
    val v = Similarity.asDouble(vecCol)
    val aggs = (0 until dim).map(i => min(v.getItem(i)).as(s"mn_$i")) ++
      (0 until dim).map(i => max(v.getItem(i)).as(s"mx_$i"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    // per-dimension NULL guard: an empty corpus NULLs every min/max, and a
    // dimension that is NULL in every row NULLs just that slot — either way
    // getDouble would raise ROW_VALUE_IS_NULL; identity stats (0, 0) are
    // fine for a slot no row carries (minMaxScale maps constant dims to 0)
    def at(i: Int): Double = if (row.isNullAt(i)) 0.0 else row.getDouble(i)
    ((0 until dim).map(at).toArray, (dim until 2 * dim).map(at).toArray)
  }

  /** Min-max scale a vector against fitted stats: (x − min)/(max − min),
    * constant dims mapping to 0. Exact-input IEEE arithmetic — identical in
    * every engine, so the scaled values are oracle-verifiable. */
  def minMaxScale(vec: Column, mins: Array[Double], maxs: Array[Double]): Column = {
    val v = Similarity.asDouble(vec)
    array(mins.indices.map { i =>
      if (maxs(i) == mins(i)) lit(0.0)
      else (v.getItem(i) - lit(mins(i))) / lit(maxs(i) - mins(i))
    }: _*)
  }

  def labelCentroids(df: DataFrame, labelCol: Column, vecCol: Column,
      dim: Int): DataFrame = {
    val scale = 1L << 20
    val v = Similarity.asDouble(vecCol)
    // per-row total quantized mass: an exact-integer integrity checksum that
    // covers every dimension (catalog outputs project a few centroid
    // elements; qsum pins the rest)
    val rowMass = aggregate(
      transform(v, x => floor(x * lit(scale.toDouble)).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val aggs = Seq(count(lit(1)).as("n"), sum(rowMass).as("qsum")) ++
      (0 until dim).map(i =>
        sum(floor(v.getItem(i) * lit(scale.toDouble)).cast("long")).as(s"s_$i"))
    df.groupBy(labelCol.as("label"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("label"), col("n"), col("qsum"),
        array((0 until dim).map(i =>
          col(s"s_$i").cast("double") / (col("n") * lit(scale)).cast("double")): _*)
          .as("centroid"))
  }
}
