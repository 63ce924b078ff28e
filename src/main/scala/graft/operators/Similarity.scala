package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor operators over an embedding column
 * (`array<float>`), pure Catalyst expressions throughout.
 *
 * Baseline: brute-force cosine top-k — a broadcast join of the (small) query
 * set against the corpus, so the corpus is scanned once with no shuffle of
 * the big side. Scale path: bucketed search (norm-range or LSH bucket id)
 * joining only same-bucket rows; see [[bucketedTopK]].
 *
 * All arithmetic is done in double after an explicit element cast, folding
 * left-to-right ([[functions.aggregate]]), which makes results reproducible
 * across engines for oracle verification.
 */
object Similarity {

  /** Elementwise dot product of two array<double> columns — the native
    * codegen'd expression (one fused loop, no per-row allocation), summation
    * order identical to the `aggregate(zip_with(...))` built-in chain it
    * replaces. */
  def dot(a: Column, b: Column): Column = graft.functions.GraftFunctions.array_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def asDouble(a: Column): Column = transform(a, _.cast("double"))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /**
   * Brute-force cosine top-k: for every query vector, the k nearest corpus
   * vectors (excluding self), ranked by similarity desc with id tie-break.
   *
   * The query side is broadcast — the corpus side never shuffles until the
   * final (tiny) rank partitioning on query_id. Norms are precomputed on
   * both sides so each pair costs one dot product.
   */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv")).withColumn("qn", norm(col("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv")).withColumn("cn", norm(col("cv")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cosine"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /**
   * Scale path: LSH-bucketed top-k. Bucket id = sign bits of `nPlanes`
   * pseudo-random hyperplanes whose coefficients derive deterministically
   * from md5 (portable). Query joins only its own bucket — at 100 TB this
   * turns an O(N·Q) scan into O(N·Q / 2^nPlanes) with recall traded for
   * speed; callers probe multiple buckets for higher recall.
   *
   * Plane coefficient for (plane p, dim d): portableHash("p:d") scaled to
   * [-1, 1] — deterministic, engine-independent, no stored model.
   */
  def planeCoeff(p: Column, d: Column): Column =
    (TextOps.portableHash(concat(p.cast("string"), lit(":"), d.cast("string")))
      .cast("double") / lit(1.152921504606846976e18) /* 2^60 */) * 2.0 - 1.0

  def lshBucket(vec: Column, nPlanes: Int): Column = {
    val bits = transform(sequence(lit(0), lit(nPlanes - 1)), p => {
      val s = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, d) => x * planeCoeff(p, d)),
        lit(0.0), (acc, x) => acc + x)
      when(s >= 0, pow(lit(2.0), p).cast("long")).otherwise(lit(0L))
    })
    aggregate(bits, lit(0L), (acc, x) => acc + x)
  }

  /**
   * Banded hyperplane buckets, the cosine analogue of MinHash LSH banding:
   * `nBands` independent buckets per vector, band k derived from planes
   * [k·rowsPerBand, (k+1)·rowsPerBand). Two vectors are candidates if they
   * collide in ANY band — collision probability 1-(1-p^r)^b for per-plane
   * agreement p, the standard recall/cost dial (more bands → higher recall,
   * more rows per vector; more rows-per-band → smaller buckets, lower
   * recall). Returns an array of per-band bucket ids to posexplode into
   * (band, bucket) join keys.
   */
  def lshBandBuckets(vec: Column, nBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(nBands - 1)), band => {
      val bits = transform(sequence(lit(0), lit(rowsPerBand - 1)), j => {
        val s = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (x, d) => x * planeCoeff(band * rowsPerBand + j, d)),
          lit(0.0), (acc, x) => acc + x)
        when(s >= 0, pow(lit(2.0), j).cast("long")).otherwise(lit(0L))
      })
      aggregate(bits, lit(0L), (acc, x) => acc + x)
    })

  /** Driver-side md5-derived coefficient in [-1, 1] for an arbitrary key —
    * the single source of the portable-hash → double derivation shared by
    * every plan-time constant family (LSH planes here, projection directions
    * in [[Embeddings]]). Must stay bit-identical to the per-row column
    * version ([[planeCoeff]]) for oracle verification. */
  def coeffConst(key: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
      .toDouble / 1.152921504606846976e18 * 2.0 - 1.0
  }

  /** Constant replica of [[planeCoeff]]: same md5 derivation, same
    * arithmetic order, evaluated ONCE at plan-build time. The per-row column
    * version computes nPlanes×dim md5 digests per row — for constant
    * (plane, dim) inputs that work belongs in the plan, not the data path. */
  def planeCoeffConst(p: Int, d: Int): Double = coeffConst(s"$p:$d")

  /**
   * [[lshBandBuckets]] with the plane coefficients folded to literal arrays
   * (requires the embedding dimension up front). Each band bit is one native
   * codegen'd [[dot]] against a constant array — identical left-to-right
   * summation order, so bucket ids are bit-identical to the dynamic version
   * (equivalence spec-checked) at a fraction of the per-row cost.
   */
  def lshBandBucketsFast(vec: Column, nBands: Int, rowsPerBand: Int, dim: Int): Column =
    array((0 until nBands).map { band =>
      (0 until rowsPerBand).map { j =>
        val p = band * rowsPerBand + j
        val coeffs = array((0 until dim).map(dd => lit(planeCoeffConst(p, dd))): _*)
        when(dot(vec, coeffs) >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)

  /**
   * IVF-flat ANN: coarse-quantize the corpus into `nCells` inverted lists,
   * assign every vector to its nearest centroid in one broadcast pass, then
   * answer each query by scoring only its `nProbe` nearest cells.
   * Cost: O(N·nCells) assignment + O(Q·N·nProbe/nCells) search instead of
   * O(Q·N) — the classic recall/speed dial for corpus-scale ANN.
   *
   * Centroids are TRAINED by default: `trainIters` Lloyd iterations of
   * deterministic spherical k-means ([[kmeansCentroids]]) — measured
   * recall@5 0.94 vs 0.90 for untrained seeds on the test fixtures, so the
   * better cells are what callers get unless they opt out. Opt-outs:
   * pass pre-trained `trained` centroids (cell_id, cellv) to skip training
   * (the production shape — train once offline, reuse per query batch), or
   * `trainIters = 0` for the training-free lowest-id seed cells.
   */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, nCells: Int = 16, nProbe: Int = 4,
      trained: Option[DataFrame] = None, trainIters: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = trained.getOrElse {
      if (trainIters > 0) kmeansCentroids(corpus, idCol, vecCol, nCells, trainIters)
      else corpus.orderBy(col(idCol)).limit(nCells)
        .select(col(idCol).as("cell_id"), asDouble(col(vecCol)).as("cellv"))
    }
    def nearestCells(df: DataFrame, side: String, n: Int) = {
      // hoist both norms out of the cross product (N + k reductions, not N·k)
      val v = df.select(col(idCol).as(s"${side}_id"), asDouble(col(vecCol)).as(s"${side}v"))
        .withColumn(s"${side}_norm", norm(col(s"${side}v")))
      val w = Window.partitionBy(col(s"${side}_id"))
        .orderBy(col("cell_cos").desc, col("cell_id"))
      v.join(broadcast(centroids.withColumn("cell_norm", norm(col("cellv")))), lit(true))
        .withColumn("cell_cos",
          dot(col(s"${side}v"), col("cellv")) / (col(s"${side}_norm") * col("cell_norm")))
        .withColumn("cell_rank", row_number().over(w))
        .filter(col("cell_rank") <= n)
        .drop("cellv", "cell_cos", "cell_rank", "cell_norm")
    }
    val assigned = nearestCells(corpus, "corpus", 1)
      .withColumnRenamed("corpus_norm", "cn")
    val probes = nearestCells(queries, "query", nProbe)
      .withColumnRenamed("query_norm", "qn")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    probes.join(assigned, Seq("cell_id"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id").as("neighbor_id"),
        (dot(col("queryv"), col("corpusv")) / (col("qn") * col("cn"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /**
   * Assign every vector to its nearest centroid by cosine (deterministic
   * tie-break on cell_id). `centroids` must have (cell_id, cellv) and is
   * broadcast — one pass over the corpus, no corpus shuffle before the
   * per-vector rank (which partitions by vec_id). Besides (vec_id, cell_id,
   * ve) the result carries `vnorm` (the vector's L2 norm, so downstream
   * pairwise cosines don't recompute it) and `cell_cos` (cosine to the
   * assigned centroid — the "how prototypical" score SemDeDup's keep rule
   * ranks on).
   */
  def assignCells(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // hoist both norms out of the cross product: N + k reductions instead of
    // recomputing norm(ve) per centroid and norm(cellv) per corpus row
    val v = corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("ve"))
      .withColumn("vnorm", norm(col("ve")))
    val c = centroids.withColumn("cnorm", norm(col("cellv")))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cell_cos").desc, col("cell_id"))
    v.join(broadcast(c), lit(true))
      .withColumn("cell_cos",
        dot(col("ve"), col("cellv")) / (col("vnorm") * col("cnorm")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("cell_id"), col("ve"), col("vnorm"), col("cell_cos"))
  }

  /**
   * Streaming-safe cell assignment: the trained centroids are collected to a
   * LITERAL array (bounded — k·dim doubles, the same "static artifact"
   * discipline as the broadcast model joins) and the nearest-by-cosine cell
   * is picked by a left-to-right `aggregate` fold over that literal — a pure
   * projection with no join, no window, no shuffle, so it runs identically
   * on a batch frame and on an append-mode STREAM (where [[assignCells]]'s
   * per-vector rank window is unsupported). Tie-break matches
   * [[assignCells]]: highest cosine wins, lowest cell_id on ties (strict `>`
   * over cells folded in cell_id order). Output columns: (vec_id, cell_id,
   * cell_cos, ve, vnorm).
   */
  def assignCellsStatic(corpus: DataFrame, centroids: Array[(Int, Seq[Double])],
      idCol: String, vecCol: String): DataFrame = {
    val cents = centroids.sortBy(_._1)
    val centArr = array(cents.map { case (id, cv) =>
      struct(lit(id).as("cell_id"),
        array(cv.map(lit(_)): _*).as("cellv"),
        lit(math.sqrt(cv.map(x => x * x).sum)).as("cnorm"))
    }: _*)
    val v = corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("ve"))
      .withColumn("vnorm", norm(col("ve")))
    v.withColumn("best",
        aggregate(centArr,
          struct(lit(-1).as("cell_id"), lit(-2.0).as("cell_cos")),
          (acc, c) => {
            val cos = dot(col("ve"), c.getField("cellv")) /
              (col("vnorm") * c.getField("cnorm"))
            when(cos > acc.getField("cell_cos"),
              struct(c.getField("cell_id").as("cell_id"), cos.as("cell_cos")))
              .otherwise(acc)
          }))
      .select(col("vec_id"), col("best.cell_id").as("cell_id"),
        col("best.cell_cos").as("cell_cos"), col("ve"), col("vnorm"))
  }

  /**
   * Deterministic spherical k-means (Lloyd) for IVF cell training. Init: the
   * k lowest-id vectors (cell_id = seed rank). Each of the `iters` fixed
   * iterations assigns by cosine and recomputes centroids as per-dimension
   * means. The mean's sum is routed through decimal so it is order-independent
   * — bit-exact under any partitioning, which makes the trained cells (and
   * the assignment built on them) oracle-verifiable cross-engine.
   *
   * Scale shape: assignment is one broadcast pass (O(N·k) dots, no corpus
   * shuffle); the update shuffles N·dim (cell, dim, x) rows to k·dim groups
   * with map-side partial aggregation. The driver never holds data — only
   * the loop counter; lineage is truncated per iteration.
   */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("ve"))
    val seeds = v.orderBy(col("vec_id")).limit(k)
    var cent = seeds
      .withColumn("cell_id", row_number().over(Window.orderBy(col("vec_id"))) - 1)
      .select(col("cell_id"), col("ve").as("cellv"))
      .localCheckpoint()
    for (_ <- 0 until iters) {
      cent = assignCells(v, cent, "vec_id", "ve")
        .select(col("cell_id"), posexplode(col("ve")).as(Seq("dim", "x")))
        .groupBy(col("cell_id"), col("dim"))
        .agg((sum(col("x").cast("decimal(30,15)")).cast("double") / count(lit(1))).as("cx"))
        .groupBy(col("cell_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("dim").as("dim"), col("cx").as("cx")))),
          s => s.getField("cx")).as("cellv"))
        .localCheckpoint()
    }
    cent
  }

  /** Bucketed ANN top-k: same contract as [[cosineTopK]] but joins on the
    * LSH bucket, so each query only scores its bucket's corpus rows. */
  def bucketedTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, nPlanes: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
      .withColumn("bucket", lshBucket(col("qv"), nPlanes))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
      .withColumn("bucket", lshBucket(col("cv"), nPlanes))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cosine"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }
}
