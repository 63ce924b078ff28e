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
}
