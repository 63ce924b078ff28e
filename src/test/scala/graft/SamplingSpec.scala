package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Deterministic split/sample semantics — the properties rand() lacks. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit: reproducible, roughly proportional, stable under growth") {
    val small = (1L to 500L).toDF("id")
    val big = (1L to 1000L).toDF("id")
    val fr = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    val a = Sampling.hashSplit(small, col("id"), fr)
      .select("id", "split").as[(Long, String)].collect().toMap
    // deterministic: a second run assigns identically
    val b = Sampling.hashSplit(small, col("id"), fr)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
    // stable under growth: ids keep their split when the corpus doubles
    val grown = Sampling.hashSplit(big, col("id"), fr)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a.forall { case (id, s) => grown(id) == s })
    // roughly proportional (hash uniformity, generous tolerance)
    val counts = grown.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 800) < 80, counts.toString)
    assert(math.abs(counts("val") - 100) < 50, counts.toString)
  }

  test("hashSplit rejects percents that do not sum to 100") {
    intercept[IllegalArgumentException] {
      Sampling.hashSplit((1L to 3L).toDF("id"), col("id"), Seq("a" -> 50, "b" -> 40))
    }
  }

  test("prioritySample: deterministic, partition-invariant, weight-sensitive") {
    // 1000 rows of weight 1 plus 50 rows of weight 1000
    val df = ((1L to 1000L).map(i => (i, 1)) ++ (2001L to 2050L).map(i => (i, 1000)))
      .toDF("id", "w")
    val a = Sampling.prioritySample(df, col("id"), col("w"), 100)
      .select("id").as[Long].collect().toSet
    assert(a.size == 100)
    // partition-invariant: a different physical layout draws the same sample
    val b = Sampling.prioritySample(df.repartition(13), col("id"), col("w"), 100)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    // weight-sensitive: each heavy row's inclusion probability is ~1000x a
    // light row's; all 50 heavy rows should make a k=100 sample (the chance
    // any one misses is negligible), and they can't be more than half of it
    assert((2001L to 2050L).forall(a.contains), "heavy rows must dominate the sample")
    assert(a.count(_ <= 1000L) == 50)
    // k larger than the table returns everything
    val all = Sampling.prioritySample(df, col("id"), col("w"), 5000)
    assert(all.count() == 1050)
  }

  test("prioritySample plans as TakeOrderedAndProject (no global sort exchange)") {
    val df = (1L to 100L).map(i => (i, 1)).toDF("id", "w")
    val plan = Sampling.prioritySample(df, col("id"), col("w"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("quotaPerGroup caps each group at k with a deterministic draw") {
    val df = (1L to 300L).map(i => (i, if (i % 3 == 0) "big" else "huge"))
      .toDF("id", "grp")
    val sampled = Sampling.quotaPerGroup(df, Seq(col("grp")), col("id"), 25)
    val byGroup = sampled.groupBy("grp").count()
      .as[(String, Long)].collect().toMap
    assert(byGroup == Map("big" -> 25L, "huge" -> 25L))
    // deterministic: same draw twice
    val again = Sampling.quotaPerGroup(df, Seq(col("grp")), col("id"), 25)
    assert(sampled.select("id").as[Long].collect().sorted.toSeq ==
      again.select("id").as[Long].collect().sorted.toSeq)
    // a group smaller than k survives whole
    val tiny = Sampling.quotaPerGroup(
      Seq((1L, "t"), (2L, "t")).toDF("id", "grp"), Seq(col("grp")), col("id"), 25)
    assert(tiny.count() == 2)
  }

  test("sourceMix: proportional quotas, short sources give what they have") {
    // sources: a has 100 docs, b has 100, c has 5. mix a:3 b:1 c:1,
    // budget 50 → quotas floor(50·3/5)=30, floor(50/5)=10, 10 (c caps at 5)
    val df = ((1L to 100L).map(i => (i, "a")) ++
      (101L to 200L).map(i => (i, "b")) ++
      (201L to 205L).map(i => (i, "c")) ++
      (301L to 310L).map(i => (i, "unlisted"))).toDF("id", "src")
    val mixed = Sampling.sourceMix(df, col("src"), col("id"),
      Seq("a" -> 3L, "b" -> 1L, "c" -> 1L), budget = 50L)
    val byGroup = mixed.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(byGroup == Map("a" -> 30L, "b" -> 10L, "c" -> 5L),
      s"quota mismatch: $byGroup")
    // unlisted sources are dropped; draw is deterministic across partitionings
    val again = Sampling.sourceMix(df.repartition(7), col("src"), col("id"),
      Seq("a" -> 3L, "b" -> 1L, "c" -> 1L), budget = 50L)
    assert(mixed.select("id").as[Long].collect().sorted.toSeq ==
      again.select("id").as[Long].collect().sorted.toSeq)
  }

  test("tokenBudgetPerGroup: greedy prefix in hash order, budget binds on tokens") {
    // two sources; doc token counts vary so the budget cuts mid-list
    val df = (1L to 60L).map { i =>
      (i, if (i % 2 == 0) "a" else "b", 10L + (i % 7) * 5L)
    }.toDF("id", "src", "n_tok")
    val out = Sampling.tokenBudgetPerGroup(df, Seq(col("src")), col("id"),
      col("n_tok"), budget = 200L)
    val rows = out.select("id", "src", "n_tok", "cum_tokens")
      .as[(Long, String, Long, Long)].collect()
    // every kept row's inclusive running sum fits the budget
    assert(rows.forall(_._4 <= 200L))
    // per source the kept set is a PREFIX of the hash order: the max kept
    // cum equals the sum of kept tokens (monotone cumsum, no holes)
    rows.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._3).sum == rs.map(_._4).max)
    }
    // independent reimplementation: greedy prefix over plain-Scala portable
    // hash order must pick exactly the same ids
    def phash(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val expected = df.as[(Long, String, Long)].collect()
      .groupBy(_._2).values.flatMap { grp =>
        var cum = 0L
        grp.sortBy(r => (phash(r._1.toString), r._1)).takeWhile { r =>
          cum += r._3; cum <= 200L
        }.map(_._1)
      }.toSet
    assert(rows.map(_._1).toSet == expected)
    // deterministic across physical layouts
    val again = Sampling.tokenBudgetPerGroup(df.repartition(13), Seq(col("src")),
      col("id"), col("n_tok"), budget = 200L)
    assert(again.select("id").as[Long].collect().sorted.toSeq ==
      rows.map(_._1).sorted.toSeq)
  }

  test("tokenMix: global budget split by weights, prefix-filled per source") {
    // sources a (weight 3) and b (weight 1), total 400 → quotas 300 / 100;
    // source c is unlisted → quota 0, dropped entirely
    val df = (1L to 90L).map { i =>
      val src = Seq("a", "b", "c")((i % 3).toInt)
      (i, src, 20L)
    }.toDF("id", "src", "n_tok")
    val got = Sampling.tokenMix(df, col("src"), col("id"), col("n_tok"),
      Seq("a" -> 3L, "b" -> 1L), totalBudget = 400L)
    val rows = got.select("id", "src", "cum_tokens", "mix_token_quota")
      .as[(Long, String, Long, Long)].collect()
    assert(rows.forall { case (_, _, cum, q) => cum <= q })
    val bySrc = rows.groupBy(_._2)
    // every doc is 20 tokens: a fits 300/20=15 docs, b fits 100/20=5
    assert(bySrc("a").length == 15 && bySrc("a").forall(_._4 == 300L))
    assert(bySrc("b").length == 5 && bySrc("b").forall(_._4 == 100L))
    assert(!bySrc.contains("c"))
    // equivalent to tokenBudgetPerGroup run per source at its quota
    val perA = Sampling.tokenBudgetPerGroup(df.filter(col("src") === "a"),
      Seq(col("src")), col("id"), col("n_tok"), budget = 300L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(bySrc("a").map(_._1).sorted.toSeq == perA)
    // null token counts consume no budget: with a budget that fits all of
    // source b's non-null tokens (29×20=580 ≤ 1000), the null-token doc is
    // kept and the source's final cum reflects only the non-null docs
    val withNull = df.withColumn("n_tok",
      when(col("id") === 1L, lit(null)).otherwise(col("n_tok")))
    val gotNull = Sampling.tokenMix(withNull, col("src"), col("id"),
      col("n_tok"), Seq("a" -> 3L, "b" -> 1L), totalBudget = 4000L)
      .filter(col("src") === "b")
    assert(gotNull.filter(col("id") === 1L).count() == 1)
    assert(gotNull.count() == 30)
    assert(gotNull.agg(max(col("cum_tokens"))).as[Long].collect()(0) == 580L)
  }

  test("priorityPerGroup: per-group caps, weight bias, exact determinism") {
    // two groups; in each, ids <= 100 carry weight 100 and the rest weight 1
    val df = (1L to 400L).map { i =>
      val grp = if (i % 2 == 0) "a" else "b"
      (i, grp, if (i <= 100) 100 else 1)
    }.toDF("id", "grp", "w")
    val sampled = Sampling.priorityPerGroup(df, Seq(col("grp")), col("id"),
      col("w"), 30)
    val byGroup = sampled.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(byGroup == Map("a" -> 30L, "b" -> 30L))
    // weight bias: heavy rows (25% of each group) should dominate the sample
    val heavy = sampled.filter(col("w") === 100).count()
    assert(heavy > 40, s"expected heavy-row dominance, got $heavy/60")
    // exact determinism, independent of partitioning
    val again = Sampling.priorityPerGroup(df.repartition(13), Seq(col("grp")),
      col("id"), col("w"), 30)
    assert(sampled.select("id").as[Long].collect().sorted.toSeq ==
      again.select("id").as[Long].collect().sorted.toSeq)
  }

  test("percentileGate: histogram ranks equal percent_rank; ties share; single-row group ranks 0") {
    // g: values 1,2,2,3,4 -> pct 0, .25, .25, .75, 1.0; h: one row -> 0
    val df = Seq(
      ("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 2L), ("g", 4L, 3L), ("g", 5L, 4L),
      ("h", 6L, 99L))
      .toDF("grp", "id", "v")
    val got = Sampling.percentileGate(df, col("grp"), col("id"), col("v"),
        lo = 0.2, hi = 0.8)
      .select("doc_id", "pct_rank").as[(Long, Double)].collect().toMap
    assert(got == Map(2L -> 0.25, 3L -> 0.25, 4L -> 0.75))
    // lo = 0 admits the single-row group and every minimum
    val all = Sampling.percentileGate(df, col("grp"), col("id"), col("v"),
        lo = 0.0, hi = 1.0)
      .select("doc_id", "pct_rank").as[(Long, Double)].collect().toMap
    assert(all(6L) == 0.0 && all(1L) == 0.0 && all.size == 6)
    // property: the histogram form reproduces the engine's own percent_rank
    import org.apache.spark.sql.expressions.Window
    val direct = df.withColumn("pr", percent_rank().over(
        Window.partitionBy(col("grp")).orderBy(col("v"))))
      .select("id", "pr").as[(Long, Double)].collect().toMap
    assert(all == direct.map { case (k, v) => k -> v })
  }

  test("leakageSafeSplit: near-duplicates always share a split; singletons follow component hash") {
    // 40 distinct tokens; doc 2 appends ONE token -> 3-shingle Jaccard 38/39
    val dupText = (1 to 40).map(j => s"body_$j").mkString(" ")
    val docs = Seq(
      (1L, dupText),
      (2L, dupText + " extra")) ++
      (3L to 12L).map(i =>
        (i, s"totally distinct document number $i " +
          (1 to 20).map(j => s"tok_${i}_$j").mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val got = Sampling.leakageSafeSplit(df, col("doc_id"), col("text"),
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select("doc_id", "component", "split")
      .as[(Long, Long, String)].collect()
    assert(got.length == 12)
    val byId = got.map(r => r._1 -> r).toMap
    // the near-dup pair collapses to one component and one split
    assert(byId(1L)._2 == 1L && byId(2L)._2 == 1L)
    assert(byId(1L)._3 == byId(2L)._3)
    // singletons keep their own id as component and split purely by its hash
    (3L to 12L).foreach { i =>
      assert(byId(i)._2 == i)
      val expected = Sampling.hashSplit(Seq(i).toDF("component"),
        col("component"), Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .select("split").as[String].collect()(0)
      assert(byId(i)._3 == expected, s"doc $i")
    }
  }
}
