package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Similarity}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) = rows.toDF("vec_id", "embedding")

  test("cosineTopK ranks by cosine similarity with id tie-break") {
    val corpus = vecs(
      (0L, Seq(1f, 0f)), // query
      (1L, Seq(1f, 0.01f)), // nearly parallel → rank 1
      (2L, Seq(1f, 1f)), // 45° → rank 2
      (3L, Seq(0f, 1f)), // orthogonal → rank 3
      (4L, Seq(-1f, 0f))) // opposite → rank 4
    val got = Similarity.cosineTopK(corpus.filter(col("vec_id") === 0), corpus,
      "vec_id", "embedding", 4)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 3L, 4L))
  }

  test("cosine of identical vectors is 1.0") {
    val corpus = vecs((0L, Seq(3f, 4f)), (1L, Seq(3f, 4f)))
    val sim = Similarity.cosineTopK(corpus.filter(col("vec_id") === 0), corpus,
      "vec_id", "embedding", 1).select("cosine").as[Double].collect()(0)
    assert(math.abs(sim - 1.0) < 1e-12)
  }

  test("bucketedTopK: identical vectors land in the same bucket and are found") {
    val corpus = vecs(
      (0L, Seq(1f, 2f, 3f, 4f)),
      (1L, Seq(1f, 2f, 3f, 4f)),
      (2L, Seq(-4f, 3f, -2f, 1f)))
    val got = Similarity.bucketedTopK(corpus.filter(col("vec_id") === 0), corpus,
      "vec_id", "embedding", k = 3, nPlanes = 4)
    val neighbors = got.select("neighbor_id").as[Long].collect().toSet
    assert(neighbors.contains(1L)) // same bucket guaranteed for identical vectors
  }

  test("bucketedTopKMultiProbe: recall is per-query monotone over single-probe, probes stay bounded") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") < 10)
    val brute = Similarity.cosineTopK(q, emb, "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id"))
    def hitsByQuery(approx: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      brute.join(approx.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").count()
        .as[(Long, Long)].collect().toMap.withDefaultValue(0L)
    val single = hitsByQuery(Similarity.bucketedTopK(q, emb,
      "vec_id", "embedding", 5, nPlanes = 8))
    val multi = hitsByQuery(Similarity.bucketedTopKMultiProbe(q, emb,
      "vec_id", "embedding", 5, nPlanes = 8, nProbes = 6))
    // candidates are a superset (the own bucket is always probed) and both
    // rank by the same (cosine desc, id) key, so per-query hits can only
    // rise — the displacement argument: anything pushing a true neighbor
    // out of the top-5 has higher cosine, hence is itself a true neighbor
    (0L until 10L).foreach { qid =>
      assert(multi(qid) >= single(qid),
        s"query $qid: multi ${multi(qid)} < single ${single(qid)}")
    }
    info(s"recall@5 uplift: single=${single.values.sum} multi=${multi.values.sum} / 50")
    assert(multi.values.sum > single.values.sum,
      "multi-probe must lift recall on the real fixtures")
    // nProbes = 1 degenerates to exactly the single-probe operator
    val p1 = Similarity.bucketedTopKMultiProbe(q, emb, "vec_id", "embedding",
        5, nPlanes = 8, nProbes = 1)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)]
      .collect().toSet
    val base = Similarity.bucketedTopK(q, emb, "vec_id", "embedding", 5,
        nPlanes = 8)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)]
      .collect().toSet
    assert(p1 == base, "nProbes=1 must reproduce bucketedTopK exactly")
  }

  test("served ANN tiers (lsh buckets, ivf lists) are bit-identical to the training forms") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long, Double)] =
      df.select("query_id", "rank", "neighbor_id", "cosine")
        .as[(Long, Int, Long, Double)].collect().toSet
    // lsh: the persisted-assignment path must reproduce the in-query one
    // (same lshBucket expression, materialized)
    val buckets = emb.select(col("vec_id"),
      Similarity.lshBucket(Similarity.asDouble(col("embedding")), 8).as("bucket"))
    assert(rows(Similarity.bucketedTopKServed(q, emb, buckets,
        "vec_id", "embedding", 5, nPlanes = 8))
      == rows(Similarity.bucketedTopK(q, emb, "vec_id", "embedding", 5,
        nPlanes = 8)))
    // ivf: persisted centroids + inverted lists vs the in-query default
    // training path (same kmeansCentroids parameters)
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 16, 2)
      .localCheckpoint()
    val assigned = Similarity.assignCells(emb, cents, "vec_id", "embedding")
      .select(col("cell_id"), col("vec_id").as("corpus_id"))
    assert(rows(Similarity.ivfTopKServed(q, emb, assigned, cents,
        "vec_id", "embedding", 5, nProbe = 4))
      == rows(Similarity.ivfTopK(q, emb, "vec_id", "embedding", 5,
        nCells = 16, nProbe = 4)))
  }

  test("ivfTopK finds exact duplicates and prunes the scored pair space") {
    val n = 60
    val rng = new scala.util.Random(3)
    val base = (0L until n.toLong).map(i =>
      (i, Seq.fill(8)(rng.nextFloat() * 2 - 1)))
    // vector 59 duplicates vector 0 → must be each other's rank-1 neighbor
    val corpus = (base.dropRight(1) :+ ((n - 1).toLong, base.head._2)).toDF("vec_id", "embedding")
    val got = Similarity.ivfTopK(
      corpus.filter(col("vec_id") === 0), corpus, "vec_id", "embedding",
      k = 3, nCells = 8, nProbe = 3)
    val top = got.orderBy("rank").select("neighbor_id").as[Long].collect()
    assert(top.head == (n - 1).toLong) // the duplicate, guaranteed same cell
    assert(got.count() <= 3)
  }

  test("embeddingNearDupBucketed: exact precision, no nested-loop join, measured recall") {
    val rng = new scala.util.Random(7)
    val base = (0L until 80L).map(i => (i, Seq.fill(16)(rng.nextFloat() * 2 - 1)))
    // two exact duplicates — identical vectors agree with every hyperplane,
    // so they collide in every band and can never be pruned
    val corpus = (base :+ (80L, base.head._2) :+ (81L, base(1)._2))
      .toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDup(corpus, col("vec_id"), col("embedding"), 0.35)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val bucketedDf = Dedup.embeddingNearDupBucketed(
      corpus, col("vec_id"), col("embedding"), 0.35)
    val plan = bucketedDf.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "bucketed near-dup must be a pure equi-join")
    val bucketed = bucketedDf.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // precision is exact: LSH only prunes, every surviving pair is re-verified
    assert(bucketed.subsetOf(exact))
    assert(bucketed.contains((0L, 80L)) && bucketed.contains((1L, 81L)))
    // recall contract: 1-(1-p^r)^b over the banding; measured here so a
    // parameter regression (fewer bands, wider rows) fails loudly
    val recall = bucketed.size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall below the banding-math floor")
  }

  test("embeddingNearDupBucketed: oversized cells degrade to an anchor star with bounded pairs") {
    // 400 identical vectors: every (band, bucket) cell holds all 400 rows —
    // uncapped this is 4 bands × C(400,2) ≈ 320k expanded pairs; capped it
    // must emit exactly n-1 = 399 distinct (anchor, member) edges
    val n = 400
    val corpus = (0L until n.toLong).map(i => (i, Seq(1f, 2f, 3f, 4f)))
      .toDF("vec_id", "embedding")
    val got = Dedup.embeddingNearDupBucketed(
      corpus, col("vec_id"), col("embedding"), 0.9, maxBucketSize = 16)
    val pairs = got.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.size == n - 1, s"star must emit n-1 pairs, got ${pairs.size}")
    assert(pairs.forall { case (a, b) => a == 0L && b > 0L },
      "every star edge must anchor at the cell's min id")
    // connectivity contract: one component regardless of the cap
    val comp = Dedup.connectedComponents(
      corpus.select(col("vec_id").as("id")), got.select("doc_a", "doc_b"))
    assert(comp.select("component").distinct().count() == 1)
  }

  test("embeddingNearDupBucketed: cap is inert on non-degenerate corpora") {
    val rng = new scala.util.Random(13)
    val corpus = (0L until 60L).map(i => (i, Seq.fill(16)(rng.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val capped = Dedup.embeddingNearDupBucketed(
        corpus, col("vec_id"), col("embedding"), 0.3, maxBucketSize = 1024)
      .select("doc_a", "doc_b", "cosine").collect().toSet
    val uncapped = Dedup.embeddingNearDupBucketed(
        corpus, col("vec_id"), col("embedding"), 0.3, maxBucketSize = Int.MaxValue)
      .select("doc_a", "doc_b", "cosine").collect().toSet
    assert(capped == uncapped)
  }

  test("lshBandBucketsFast is bit-identical to the dynamic per-row-md5 variant") {
    val rng = new scala.util.Random(11)
    val corpus = (0L until 50L).map(i => (i, Seq.fill(16)(rng.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val both = corpus.select(col("vec_id"),
      Similarity.lshBandBuckets(col("v"), 4, 2).as("dyn"),
      Similarity.lshBandBucketsFast(col("v"), 4, 2, 16).as("fast"))
    assert(both.filter(col("dyn") =!= col("fast")).count() == 0)
    // and the constant itself replicates the column derivation
    val colCoeff = spark.range(1).select(
      Similarity.planeCoeff(lit(3), lit(7)).as("c")).as[Double].collect()(0)
    assert(colCoeff == Similarity.planeCoeffConst(3, 7))
  }

  test("kmeansCentroids recovers two well-separated clusters exactly") {
    // seeds (two lowest ids) start one per cluster; Lloyd converges in one
    // iteration and the decimal-routed means are exact cluster means
    val corpus = vecs(
      (0L, Seq(10f, 0f)), (2L, Seq(12f, 1f)), (4L, Seq(9f, -1f)),
      (1L, Seq(0f, 10f)), (3L, Seq(1f, 12f)), (5L, Seq(-1f, 9f)))
    val cent = Similarity.kmeansCentroids(corpus, "vec_id", "embedding", 2, 2)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(cent(0).zip(Seq(31.0 / 3, 0.0)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    assert(cent(1).zip(Seq(0.0, 31.0 / 3)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    val assigned = Similarity.assignCells(corpus,
        Similarity.kmeansCentroids(corpus, "vec_id", "embedding", 2, 2),
        "vec_id", "embedding")
      .select("vec_id", "cell_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Seq(0L, 2L, 4L).map(assigned).distinct.size == 1)
    assert(Seq(1L, 3L, 5L).map(assigned).distinct.size == 1)
    assert(assigned(0L) != assigned(1L))
  }

  test("semanticDedup: keeps the lowest id per near-parallel set, within-cluster only") {
    // cluster A: three near-parallel vectors (cosine ~1) + one orthogonal-ish;
    // cluster B: two near-parallel vectors. Keep-first drops 2,4 (A) and 11
    // (B); 6 is dissimilar to A's dup set and survives.
    val corpus = vecs(
      (1L, Seq(10f, 0.1f)), (2L, Seq(10f, 0.12f)), (4L, Seq(9.8f, 0.1f)),
      (6L, Seq(5f, -4f)),
      (10L, Seq(0.1f, 10f)), (11L, Seq(0.12f, 10f)))
    val r = Dedup.semanticDedup(corpus, "vec_id", "embedding",
        nCells = 2, trainIters = 2, tau = 0.95)
      .collect().map(x => x.getLong(0) -> x.getInt(3)).toMap
    assert(r == Map(1L -> 1, 2L -> 0, 4L -> 0, 6L -> 1, 10L -> 1, 11L -> 0),
      s"keep-first semantic verdicts wrong: $r")
    // cell_cos is a sane prototypicality score in [-1, 1]
    val cc = Dedup.semanticDedup(corpus, "vec_id", "embedding", 2, 2, 0.95)
      .select("cell_cos").collect().map(_.getDouble(0))
    assert(cc.forall(c => c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12))
    // the pairwise stage must be an equi-join on cell_id, never a cartesian
    val plan = Dedup.semanticDedup(corpus, "vec_id", "embedding", 2, 2, 0.95)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("assignCellsStatic matches assignCells bit for bit, with no join or window") {
    val corpus = vecs(
      (1L, Seq(10f, 0.1f)), (2L, Seq(10f, 0.12f)), (4L, Seq(9.8f, 0.1f)),
      (6L, Seq(5f, -4f)), (10L, Seq(0.1f, 10f)), (11L, Seq(0.12f, 10f)))
    val cent = Similarity.kmeansCentroids(corpus, "vec_id", "embedding", 2, 2)
    val centArr = cent.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_id", "cell_id", "cell_cos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val stat = Similarity.assignCellsStatic(corpus, centArr, "vec_id", "embedding")
    assert(key(stat) == key(Similarity.assignCells(corpus, cent, "vec_id", "embedding")))
    // the static form must be a pure projection: no exchange anywhere
    val plan = stat.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Window"), plan)
  }

  test("kmeans training escapes a degenerate seed choice") {
    // both seeds (ids 0,1) sit in cluster A; Lloyd must still pull one
    // centroid across to cluster B within a few iterations
    val a = Seq((0L, Seq(10f, 0f)), (1L, Seq(11f, 0.5f)), (2L, Seq(9f, -0.5f)))
    val b = Seq((10L, Seq(0f, 10f)), (11L, Seq(0.5f, 11f)), (12L, Seq(-0.5f, 9f)))
    val corpus = vecs((a ++ b): _*)
    val cent = Similarity.kmeansCentroids(corpus, "vec_id", "embedding", 2, 4)
    val assigned = Similarity.assignCells(corpus, cent, "vec_id", "embedding")
      .select("vec_id", "cell_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a.map(x => assigned(x._1)).distinct.size == 1)
    assert(b.map(x => assigned(x._1)).distinct.size == 1)
    assert(assigned(0L) != assigned(10L))
    // trained cells feed ivfTopK: in-cluster neighbors found with nProbe=1
    val got = Similarity.ivfTopK(corpus.filter(col("vec_id") === 0), corpus,
        "vec_id", "embedding", 2, nCells = 2, nProbe = 1, trained = Some(cent))
      .select("neighbor_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("trained IVF cells keep recall on the real embedding fixtures") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") < 10)
    val brute = Similarity.cosineTopK(q, emb, "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id"))
    def recall(approx: org.apache.spark.sql.DataFrame): Double = {
      val hit = brute.join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi").count()
      hit.toDouble / brute.count()
    }
    val untrained = recall(Similarity.ivfTopK(q, emb, "vec_id", "embedding", 5,
      nCells = 8, nProbe = 4, trainIters = 0))
    // the DEFAULT path now trains (trainIters = 2) — this asserts callers
    // get the trained recall figure without opting in
    val trained = recall(Similarity.ivfTopK(q, emb, "vec_id", "embedding", 5,
      nCells = 8, nProbe = 4))
    info(s"recall@5 nProbe=4/8 cells: untrained=$untrained trained=$trained")
    assert(trained >= untrained - 0.1) // training must not degrade cells
    assert(trained >= 0.5) // and must stay useful in absolute terms
  }

  test("repartitionByBytes sizes partitions from caller stats, lazily") {
    val df = Seq.tabulate(64)(i => (i.toLong, "x" * 1024)).toDF("id", "txt")
      .withColumn("bin", col("txt").cast("binary"))
    val total = Multimodal.measureTotalBytes(df, col("bin"))
    assert(total == 64L * 1024)
    val rp = Multimodal.repartitionByBytes(df, total, targetBytes = 8 * 1024)
    assert(rp.rdd.getNumPartitions == 8)
    assert(Multimodal.measureTotalBytes(df.filter(col("id") < 0), col("bin")) == 0L)
  }

  test("PQ: codes compress, exact duplicates share codes, re-rank beats raw ADC") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = Similarity.pqTrain(emb, "vec_id", "embedding", m = 4, ksub = 16, iters = 2)
    // codebook shape: exactly m·ksub centroids of subDim dims
    val cshape = cents.select(col("sub_id"), col("cell_id"), size(col("cellv")).as("d"))
      .collect()
    assert(cshape.length == 4 * 16 && cshape.forall(_.getInt(2) == 16))
    val codes = Similarity.pqEncode(emb, cents, "vec_id", "embedding", m = 4)
    assert(codes.count() == emb.count() * 4)
    // a vector duplicated under a fresh id gets the identical code word
    val dup = emb.filter(col("vec_id") === 7)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"), col("label"))
    val dupCodes = Similarity.pqEncode(emb.unionByName(dup), cents,
        "vec_id", "embedding", m = 4)
      .filter(col("vec_id").isin(7L, 100007L))
      .select(col("vec_id"), col("sub_id"), col("code"))
      .as[(Long, Int, Int)].collect()
    assert(dupCodes.groupBy(_._2).values.forall(_.map(_._3).distinct.length == 1))
    // re-ranking a 50-candidate ADC shortlist strictly improves mean recall
    def recallOf(approx: org.apache.spark.sql.DataFrame): Double = {
      val q = emb.filter(col("vec_id") < 5)
      val brute = Similarity.l2TopK(q, emb, "vec_id", "embedding", 5)
      val a = approx.select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
      val hits = brute.select(col("query_id"), col("neighbor_id"))
        .join(a, Seq("query_id", "neighbor_id"), "left")
        .agg(sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1)))
        .as[Double].collect()(0)
      hits
    }
    val q = emb.filter(col("vec_id") < 5)
    val adc = recallOf(Similarity.pqAdcTopK(q, codes, cents, "vec_id", "embedding", 4, 5))
    val rr = recallOf(Similarity.pqRerankTopK(q, codes, cents, emb,
      "vec_id", "embedding", 4, 50, 5))
    assert(rr > adc, s"re-rank recall $rr should beat raw ADC $adc")
    assert(rr >= 0.6, s"re-rank recall $rr unexpectedly low")
  }

  test("PQ guards: oversized codebooks and indivisible subspaces fail loudly") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(8)
    // packed-argmin bound: cell ids must fit under 256
    intercept[IllegalArgumentException] {
      Similarity.pqTrain(emb, "vec_id", "embedding", m = 4, ksub = 257, iters = 1)
    }
    intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(emb, emb, "vec_id", "embedding", m = 4, ksub = 16,
        iters = 1, nCells = 300, nProbe = 4, k = 5)
    }
    // 64 dims don't split into 5 subspaces — raise, never truncate
    val ex = intercept[Exception] {
      Similarity.subVectors(emb, "vec_id", "embedding", m = 5).collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("not divisible"),
      s"expected divisibility error, got: ${ex.getMessage}")
  }

  test("IVF-PQ: full k returned, self excluded, probe restriction holds") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") < 5)
    val res = Similarity.ivfPqTopK(q, emb, "vec_id", "embedding",
      m = 4, ksub = 16, iters = 2, nCells = 16, nProbe = 4, k = 5)
    val rows = res.select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect()
    // every query fills its k (probed cells hold plenty of members here)
    assert(rows.length == 25 && rows.groupBy(_._1).values.forall(_.length == 5))
    assert(rows.forall(r => r._1 != r._3), "self must be excluded")
    // recall floor vs exact (deterministic on this fixture; residual PQ at
    // nProbe 4/16 measured 0.28 — pin a conservative floor)
    val brute = Similarity.l2TopK(q, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = rows.map(r => (r._1, r._3)).toSet
    val recall = (got & brute).size.toDouble / brute.size
    assert(recall >= 0.15, s"ivfpq recall $recall below floor")
  }

  test("multimodal: features deterministic, payload dropped, frames sliced") {
    val df = Seq((1L, "some binary payload content here")).toDF("id", "txt")
      .withColumn("bin", col("txt").cast("binary"))
    val feats = Multimodal.extractFeatures(df, col("id"), col("bin"))
    val r = feats.collect()(0)
    assert(r.getAs[Int]("n_bytes") == 32)
    assert(!feats.columns.contains("bin") && !feats.columns.contains("payload"))
    val f = r.getAs[scala.collection.Seq[Double]]("features").toSeq
    assert(f.length == 4 && f.forall(x => x >= 0.0 && x <= 1.0))
    // determinism
    val again = Multimodal.extractFeatures(df, col("id"), col("bin"))
      .collect()(0).getAs[scala.collection.Seq[Double]]("features").toSeq
    assert(f == again)

    val frames = Multimodal.sampleFrames(df, col("id"), col("bin"), n = 4)
    assert(frames.count() == 4)
    assert(frames.select(max(col("frame_idx"))).as[Int].collect()(0) == 3)
  }

  test("int8TopK: exactly-representable levels reproduce the exact MIPS ranking") {
    // every element is k/127 of amax=127 → levels round-trip with zero error,
    // so the integer ranking must equal the full-precision dot ranking
    val corpus = vecs(
      (0L, Seq(127f, 0f)),
      (1L, Seq(100f, 10f)),
      (2L, Seq(50f, 50f)),
      (3L, Seq(0f, 127f)),
      (4L, Seq(-127f, 0f)))
    val q = corpus.filter(col("vec_id") === 0)
    val int8 = Similarity.int8TopK(q, corpus, "vec_id", "embedding", 4)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    val exact = Similarity.dotTopK(q, corpus, "vec_id", "embedding", 4)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(int8 == exact && int8 == Seq(1L, 2L, 3L, 4L))
    // iscore is the raw integer dot: q=(127,0) · c1=(100,10) = 12700
    val s1 = Similarity.int8TopK(q, corpus, "vec_id", "embedding", 4)
      .filter(col("neighbor_id") === 1).select("iscore").as[Long].collect()(0)
    assert(s1 == 12700L)
  }

  test("int8TopK: all-zero corpus (amax = 0) maps to level 0 with zero scores") {
    val corpus = vecs((0L, Seq(0f, 0f)), (1L, Seq(0f, 0f)), (2L, Seq(0f, 0f)))
    val got = Similarity.int8TopK(corpus.filter(col("vec_id") === 0), corpus,
      "vec_id", "embedding", 2)
    assert(got.count() == 2)
    assert(got.select("iscore").as[Long].collect().forall(_ == 0L))
    // ties broken by neighbor id
    assert(got.orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
      == Seq(1L, 2L))
  }

  test("int8TopK recall vs exact MIPS is near-perfect on random vectors") {
    val rng = new scala.util.Random(7)
    val corpus = (0L until 60L).map(i =>
      (i, Seq.fill(8)(rng.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val q = corpus.filter(col("vec_id") < 5)
    val exact = Similarity.dotTopK(q, corpus, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.int8TopK(q, corpus, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // SQ8 scores EVERY candidate (no pruning) — only near-ties can flip
    assert(recall >= 0.8, s"recall $recall")
  }
}
