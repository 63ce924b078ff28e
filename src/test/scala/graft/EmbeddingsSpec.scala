package graft

import org.apache.spark.sql.functions._
import graft.operators.{Embeddings, Similarity}

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Double])*) = rows.toDF("vec_id", "embedding")

  test("normalized: unit vectors have norm 1 within float tolerance") {
    val df = Embeddings.normalized(
      vecs((1L, Seq(3.0, 4.0)), (2L, Seq(0.5, 0.5, 0.5, 0.5))),
      col("vec_id"), col("embedding"))
    val r = df.select(col("vec_id"), Similarity.norm(col("unit")).as("un"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(r(1L) - 1.0) < 1e-12 && math.abs(r(2L) - 1.0) < 1e-12)
    val u1 = df.filter(col("vec_id") === 1).select("unit").as[Seq[Double]].collect()(0)
    assert(math.abs(u1(0) - 0.6) < 1e-12 && math.abs(u1(1) - 0.8) < 1e-12)
  }

  test("quantizeInt8: levels span [-128, 127], reconstruction within half a step") {
    val xs = Seq(-1.0, -0.25, 0.0, 0.33, 0.5, 1.0)
    val df = vecs((1L, xs))
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("vmin", array_min(col("v")))
      .withColumn("vmax", array_max(col("v")))
      .withColumn("q", Embeddings.quantizeInt8(col("v"), col("vmin"), col("vmax")))
    val q = df.select("q").as[Seq[Int]].collect()(0)
    assert(q.head == -128 && q.last == 127) // min and max hit the extreme levels
    assert(q.forall(l => l >= -128 && l <= 127))
    val scale = (1.0 - (-1.0)) / 255.0
    xs.zip(q).foreach { case (x, l) =>
      val reconstructed = (l + 128) * scale + (-1.0)
      assert(math.abs(reconstructed - x) <= scale / 2 + 1e-12, s"$x -> $l")
    }
    // constant vector degrades to level 0, not NaN
    val cq = vecs((2L, Seq(0.7, 0.7)))
      .select(Embeddings.quantizeInt8(col("embedding"), lit(0.7), lit(0.7)).as("q"))
      .as[Seq[Int]].collect()(0)
    assert(cq == Seq(0, 0))
  }

  test("randomProject: deterministic, linear, and distance-correlated") {
    val a = Seq.tabulate(64)(i => math.sin(i.toDouble))
    val b = a.map(_ * 2.0) // colinear with a
    val c = Seq.tabulate(64)(i => math.cos(i * 3.0)) // unrelated direction
    val df = vecs((1L, a), (2L, b), (3L, c))
      .select(col("vec_id"), Embeddings.randomProject(col("embedding"), 8, 64).as("p"))
    val p = df.as[(Long, Seq[Double])].collect().toMap
    // run twice: identical (plan-time constants, no RNG state)
    val p2 = vecs((1L, a)).select(col("vec_id"),
      Embeddings.randomProject(col("embedding"), 8, 64).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(p(1L) == p2(1L))
    // linearity: proj(2a) = 2 proj(a) exactly (same fold order, scaled inputs)
    p(1L).zip(p(2L)).foreach { case (x, y) => assert(math.abs(y - 2 * x) < 1e-9) }
    // colinear vectors stay colinear; the unrelated vector does not
    def cos(u: Seq[Double], v: Seq[Double]) = {
      val d = u.zip(v).map { case (x, y) => x * y }.sum
      d / (math.sqrt(u.map(x => x * x).sum) * math.sqrt(v.map(x => x * x).sum))
    }
    assert(cos(p(1L), p(2L)) > 0.999999)
    assert(math.abs(cos(p(1L), p(3L))) < 0.9)
  }

  test("minMaxStats: a dimension that is NULL in every row gets identity stats") {
    // non-empty corpus, but slot 1 is NULL everywhere — min/max of that
    // dimension aggregate to NULL and the per-index guard must absorb it
    // (the isNullAt(0)-only guard crashed here with ROW_VALUE_IS_NULL)
    val df = spark.range(3).select(
      array(col("id").cast("double"), lit(null).cast("double")).as("embedding"))
    val (mins, maxs) = Embeddings.minMaxStats(df, col("embedding"), 2)
    assert(mins.toSeq === Seq(0.0, 0.0) && maxs.toSeq === Seq(2.0, 0.0))
  }
}
