package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/**
 * Probabilistic-sketch surface: the bloom membership filter (Spark's
 * internal BloomFilterAggregate/BloomFilterMightContain exposed to SQL via
 * GraftExtensions) and the count-min frequency sketch (public
 * DataFrameStatFunctions). Both are bounded against exact answers — the
 * sketch contract is one-sided error, which is what makes them usable as
 * scale primitives (join pre-filters, frequency triage) at 100 TB.
 */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def withExtSession[A](f: org.apache.spark.sql.SparkSession => A): A = {
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      f(SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.plans.GraftExtensions())
        .getOrCreate())
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("bloom_agg/bloom_might_contain: no false negatives, bounded FPR") {
    withExtSession { ext =>
      ext.range(0, 10000).selectExpr("id * 2 AS x") // members: even ids
        .createOrReplaceTempView("bloom_in")
      ext.sql("SELECT bloom_agg(x, 10000L) AS bf FROM bloom_in")
        .createOrReplaceTempView("bloom_bf")
      // every member must hit (the one-sided guarantee)
      val misses = ext.sql(
        """SELECT count(*) FROM bloom_in
          |WHERE NOT bloom_might_contain((SELECT bf FROM bloom_bf), x)""".stripMargin)
        .head().getLong(0)
      assert(misses == 0L, "bloom filters must never produce false negatives")
      // non-members (odd ids) may hit, but rarely: default FPP is 3%,
      // assert a generous 3× bound so the test is not flaky-by-design
      val fp = ext.sql(
        """SELECT count(*) FROM (SELECT id * 2 + 1 AS y FROM range(10000))
          |WHERE bloom_might_contain((SELECT bf FROM bloom_bf), y)""".stripMargin)
        .head().getLong(0)
      assert(fp < 900, s"false-positive rate out of bounds: $fp / 10000")
    }
  }

  test("bloom pre-filter is a superset of the exact semi-join (join pruning)") {
    withExtSession { ext =>
      ext.range(0, 5000).selectExpr("id AS k", "id % 100 AS payload")
        .createOrReplaceTempView("facts")
      ext.range(0, 50).selectExpr("id * 7 AS k").createOrReplaceTempView("dim")
      ext.sql("SELECT bloom_agg(k, 50L) AS bf FROM dim")
        .createOrReplaceTempView("dim_bf")
      val exact = ext.sql(
        "SELECT count(*) FROM facts WHERE k IN (SELECT k FROM dim)")
        .head().getLong(0)
      val filtered = ext.sql(
        """SELECT count(*) FROM facts
          |WHERE bloom_might_contain((SELECT bf FROM dim_bf), k)""".stripMargin)
        .head().getLong(0)
      // sound (keeps every true match) and effective (prunes most of the rest)
      assert(filtered >= exact)
      assert(filtered < 1000, s"pre-filter kept $filtered of 5000 rows")
    }
  }

  test("countMinSketch: never underestimates; error bounded by eps·N") {
    // skewed stream: 'hot' 1000×, 200 singletons
    val rows = Seq.fill(1000)("hot") ++ (1 to 200).map(i => s"r$i")
    val df = rows.toDF("k").repartition(8)
    val eps = 0.01
    val cms = df.stat.countMinSketch("k", eps, 0.99, seed = 42)
    val n = rows.length
    assert(cms.estimateCount("hot") >= 1000L)
    assert(cms.estimateCount("hot") <= 1000L + (eps * n).toLong + 1)
    (1 to 20).foreach { i =>
      val est = cms.estimateCount(s"r$i")
      assert(est >= 1L && est <= 1L + (eps * n).toLong + 1)
    }
  }

  test("countMinSketch: mergeable across partitions (distributed build)") {
    val left = Seq.fill(300)("hot").toDF("k")
      .stat.countMinSketch("k", 0.01, 0.99, seed = 42)
    val right = Seq.fill(700)("hot").toDF("k")
      .stat.countMinSketch("k", 0.01, 0.99, seed = 42)
    val merged = left.mergeInPlace(right)
    assert(merged.estimateCount("hot") >= 1000L)
  }

  test("Sketches.countMin: upper bound always; exact at collision-free width") {
    import graft.operators.Sketches
    val rows = Seq.fill(500)("hot") ++ (1 to 100).map(i => s"r$i")
    val df = rows.toDF("k").repartition(8)
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (width <- Seq(16, 4096)) {
      val cms = Sketches.countMinSketch(df, col("k"), 4, width)
      val est = Sketches.countMinEstimate(cms, df, col("k"), 4, width)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (k, c) =>
        assert(est(k) >= c, s"CMS underestimated $k at width $width")
      }
      if (width == 4096) // 101 keys in 4×4096 buckets: collisions ~ none
        assert(est("hot") == 500L && est("r1") == 1L)
    }
    // sketch is the bounded-state summary: ≤ depth·width rows regardless of input
    val small = Sketches.countMinSketch(df, col("k"), 4, 16)
    assert(small.count() <= 4L * 16)
  }

  test("Sketches.kmvDistinct: exact below k, tight estimate above") {
    import graft.operators.Sketches
    val df = (1 to 2000).map(i => ("g" + (i % 2), s"v${(i / 2) % (if (i % 2 == 0) 40 else 1000)}"))
      .toDF("g", "v").repartition(8)
    val got = Sketches.kmvDistinct(df, col("g"), col("v"), 64)
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getDouble(3))).toMap
    // g0 has 40 distinct values < k → sketch unsaturated → exact count
    assert(got("g0")._1 == 40 && got("g0")._2 == 40.0)
    // g1 has 1000 distinct → saturated; KMV with k=64 has ~1/sqrt(62) ≈ 13%
    // relative std error — assert a generous 4-sigma band
    assert(got("g1")._1 == 64)
    assert(got("g1")._2 > 500 && got("g1")._2 < 2000, s"est=${got("g1")._2}")
  }

  test("Sketches.kmvOverlap: identical sides → jaccard 1; disjoint → 0") {
    import graft.operators.Sketches
    val same = (1 to 500).map(i => (true, true, s"v$i")).toDF("a", "b", "v")
    val r1 = Sketches.kmvOverlap(same, col("a"), col("b"), col("v"), 64).head()
    assert(r1.getAs[Int]("n_common_kmins") == 64)
    assert(r1.getAs[Double]("est_intersection") == r1.getAs[Double]("est_distinct_union"))
    val disj = ((1 to 300).map(i => (true, false, s"x$i")) ++
      (1 to 300).map(i => (false, true, s"y$i"))).toDF("a", "b", "v").repartition(6)
    val r2 = Sketches.kmvOverlap(disj, col("a"), col("b"), col("v"), 64).head()
    assert(r2.getAs[Int]("n_common_kmins") == 0)
    assert(r2.getAs[Double]("est_intersection") == 0.0)
    // half-overlap: common values must surface with a plausible ratio
    val half = ((1 to 400).map(i => (true, i <= 200, s"c$i"))).toDF("a", "b", "v")
    val r3 = Sketches.kmvOverlap(half, col("a"), col("b"), col("v"), 64).head()
    val jac = r3.getAs[Int]("n_common_kmins").toDouble / r3.getAs[Int]("n_u")
    assert(jac > 0.2 && jac < 0.8, s"jaccard=$jac") // true 0.5, k=64 noise band
  }

  test("Sketches.kmvDistinct: all-null group yields empty sketch, not a crash") {
    import graft.operators.Sketches
    // a group whose values are ALL null has an empty k-min buffer;
    // element_at(kmins, 0) used to throw 'SQL array indices start at 1'
    // and fail the whole query on legal input
    val df = Seq(("g0", Some("a")), ("g0", Some("b")),
      ("gnull", None), ("gnull", None)).toDF("g", "v")
    val got = Sketches.kmvDistinct(df, col("g"), col("v"), 64)
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), Option(r.get(2)), r.getDouble(3))).toMap
    assert(got("g0")._1 == 2 && got("g0")._3 == 2.0)
    assert(got("gnull")._1 == 0, "all-null group keeps zero hashes")
    assert(got("gnull")._2.isEmpty, "kth_min must be null on an empty sketch")
    assert(got("gnull")._3 == 0.0, "estimate of an all-null group is 0")
  }

  test("Sketches.countMinEstimate: grid mismatch vs stamped sketch fails loudly") {
    import graft.operators.Sketches
    val df = (1 to 100).map(i => s"k${i % 10}").toDF("k")
    val cms = Sketches.countMinSketch(df, col("k"), 4, 256)
    // matching grid: fine
    Sketches.countMinEstimate(cms, df, col("k"), 4, 256).count()
    // mismatched width: the metadata stamp makes this a plan-time error
    // instead of silently-wrong min(coalesce(cnt,0)) estimates
    val ex = intercept[IllegalArgumentException] {
      Sketches.countMinEstimate(cms, df, col("k"), 4, 512)
    }
    assert(ex.getMessage.contains("grid mismatch"))
    // a foreign (unstamped) sketch frame is trusted — caller contract
    // (a bare alias PROPAGATES metadata, so strip it explicitly)
    val foreign = cms.select(col("depth"), col("bucket"),
      col("cnt").as("cnt", org.apache.spark.sql.types.Metadata.empty))
    Sketches.countMinEstimate(foreign, df, col("k"), 4, 512).count()
  }

  // ==== portable HyperLogLog ==============================================

  test("hll: registers are partition-invariant and rank-bounded") {
    val df = (1 to 5000).map(i => ("g", s"v$i")).toDF("g", "v")
    val r1 = Sketches.hllRegisters(df.repartition(1), col("g"), col("v"))
    val r8 = Sketches.hllRegisters(df.repartition(8), col("g"), col("v"))
    val rows1 = r1.orderBy("grp", "bucket").collect().toSeq
    assert(rows1 === r8.orderBy("grp", "bucket").collect().toSeq)
    // p=6: bucket in [0,64), rank in [1, 55] (54 rank bits + 1)
    rows1.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) < 64)
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 55)
    }
  }

  test("hll: estimate tracks exact distinct within the raw-regime rse bound") {
    // 3/sqrt(64) ~ 13% rse; allow 3 sigma. Cardinalities span the raw
    // regime (> 2.5m = 160) where no small-range correction applies.
    for (n <- Seq(500, 2000, 8000)) {
      val df = (1 to n).map(i => ("g", s"item-$i")).toDF("g", "v")
      val est = Sketches.hllEstimate(
        Sketches.hllRegisters(df, col("g"), col("v")))
        .select("est_raw").as[Double].head()
      assert(math.abs(est - n) / n < 0.39,
        s"n=$n estimated $est — outside 3x relative standard error")
    }
  }

  test("hll: small-range correction applies linear counting below 2.5m") {
    // the sub-160 sweep the raw-regime test deliberately skips: linear
    // counting m·ln(m/V) has ~sqrt(m(e^t−t−1))/n rse (t = n/m) — under 12%
    // for all of these, so 3-sigma is 0.4
    for (n <- Seq(3, 25, 100)) {
      val df = (1 to n).map(i => ("g", s"item-$i")).toDF("g", "v")
      val row = Sketches.hllEstimateCorrected(
        Sketches.hllRegisters(df, col("g"), col("v")))
        .select("n_zero", "est_raw", "est").head()
      val (nz, raw, est) = (row.getLong(0), row.getDouble(1), row.getDouble(2))
      if (nz > 0 && raw <= 160.0)
        assert(est === 64.0 * math.log(64.0 / nz),
          s"n=$n: corrected branch must be the exact table entry")
      else assert(est === raw)
      assert(math.abs(est - n) / n < 0.4, s"n=$n estimated $est")
      // and the correction must not be WORSE than raw in this regime
      assert(math.abs(est - n) <= math.abs(raw - n) + 1e-9,
        s"n=$n: corrected $est vs raw $raw")
    }
    // raw regime (n_zero usually 0, est_raw > 160): correction is a no-op
    val big = (1 to 5000).map(i => ("g", s"x$i")).toDF("g", "v")
    val r = Sketches.hllEstimateCorrected(
      Sketches.hllRegisters(big, col("g"), col("v")))
      .select("est_raw", "est").head()
    assert(r.getDouble(0) === r.getDouble(1))
  }

  test("hll: merge of split halves equals the whole-corpus registers") {
    val df = (1 to 4000).map(i => (s"g${i % 3}", s"u$i", i)).toDF("g", "v", "i")
    val whole = Sketches.hllRegisters(df, col("g"), col("v"))
    val a = Sketches.hllRegisters(df.where(col("i") % 2 === 0), col("g"), col("v"))
    val b = Sketches.hllRegisters(df.where(col("i") % 2 =!= 0), col("g"), col("v"))
    val merged = Sketches.hllMerge(a, b)
    assert(merged.orderBy("grp", "bucket").collect().toSeq ===
      whole.orderBy("grp", "bucket").collect().toSeq)
    // idempotence: merging the whole with itself is a no-op
    assert(Sketches.hllMerge(whole, whole).orderBy("grp", "bucket")
      .collect().toSeq === whole.orderBy("grp", "bucket").collect().toSeq)
  }

  test("hll: precision stamp makes a p mismatch a plan-time error") {
    val df = Seq(("g", "x")).toDF("g", "v")
    val regs = Sketches.hllRegisters(df, col("g"), col("v"), p = 6)
    val ex = intercept[IllegalArgumentException] {
      Sketches.hllEstimate(regs, p = 8)
    }
    assert(ex.getMessage.contains("precision mismatch"))
    val ex2 = intercept[IllegalArgumentException] {
      Sketches.hllMerge(regs, Sketches.hllRegisters(df, col("g"), col("v"), p = 8).
        select(col("grp"), col("bucket"),
          col("register").as("register",
            org.apache.spark.sql.types.Metadata.empty)), p = 8)
    }
    assert(ex2.getMessage.contains("precision mismatch"))
    // unstamped (artifact round-trip) frames are trusted — caller contract
    val foreign = regs.select(col("grp"), col("bucket"),
      col("register").as("register", org.apache.spark.sql.types.Metadata.empty))
    Sketches.hllEstimate(foreign, p = 8).count()
  }

  test("hll: empty and all-null inputs yield empty register/estimate frames") {
    val empty = Seq.empty[(String, String)].toDF("g", "v")
    assert(Sketches.hllRegisters(empty, col("g"), col("v")).count() === 0L)
    assert(Sketches.hllEstimate(
      Sketches.hllRegisters(empty, col("g"), col("v"))).count() === 0L)
    val nulls = Seq(("g", null: String), ("g", null: String)).toDF("g", "v")
    assert(Sketches.hllRegisters(nulls, col("g"), col("v")).count() === 0L)
  }
}
