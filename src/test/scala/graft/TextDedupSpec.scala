package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextOps}

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("normalize: lowercase, trim, collapse whitespace") {
    val got = docs((1L, "  Hello   WORLD  "))
      .select(TextOps.normalize(col("text"))).as[String].collect()(0)
    assert(got == "hello world")
  }

  test("shingles: n-grams, distinct, short-doc fallback") {
    val got = docs((1L, "a b c d"))
      .select(TextOps.shingles(col("text"), 3)).as[Seq[String]].collect()(0)
    assert(got == Seq("a b c", "b c d"))
    val short = docs((1L, "a b"))
      .select(TextOps.shingles(col("text"), 3)).as[Seq[String]].collect()(0)
    assert(short == Seq("a b"))
    val dup = docs((1L, "x y x y x y"))
      .select(TextOps.shingles(col("text"), 3)).as[Seq[String]].collect()(0)
    assert(dup == Seq("x y x", "y x y")) // distinct
  }

  test("exact dedup groups identical texts and keeps min id") {
    // scale default groups on md5(text): same groups, 32-char shuffle key
    val r = Dedup.exact(docs((5L, "same"), (2L, "same"), (9L, "other")),
      col("text"), col("doc_id"))
      .filter(col("text_md5") === md5(lit("same").cast("binary"))).collect()(0)
    assert(r.getAs[Long]("canonical_id") == 2L)
    assert(r.getAs[Long]("n_copies") == 2L)
    // the text-keyed opt-in keeps the content key on the output
    val t = Dedup.exactByText(docs((5L, "same"), (2L, "same"), (9L, "other")),
      col("text"), col("doc_id"))
      .filter(col("text") === "same").collect()(0)
    assert(t.getAs[Long]("canonical_id") == 2L)
    assert(t.getAs[Long]("n_copies") == 2L)
  }

  test("fingerprint dedup is whitespace/case-insensitive") {
    val r = Dedup.byFingerprint(
      docs((1L, "Hello  World"), (2L, "hello world "), (3L, "different")),
      col("text"), col("doc_id"))
    assert(r.count() == 2)
    assert(r.filter(col("n_copies") === 2).select("canonical_id").as[Long].collect()(0) == 1L)
  }

  test("identical docs share a full minhash signature; near-dups collide in LSH") {
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup
      (3L, "the quick brown fox jumps over the lazy dog again and again tomorrow"), // near dup
      (4L, "completely unrelated text about spark catalyst optimizer internals here"))
    val sigs = Dedup.minhashSignatures(d, col("text"), col("doc_id"))
    assert(sigs.count() == 4 * 16)
    // identical docs → identical signatures
    val s1 = sigs.filter(col("doc_id") === 1).orderBy("perm").select("minhash").as[Long].collect()
    val s2 = sigs.filter(col("doc_id") === 2).orderBy("perm").select("minhash").as[Long].collect()
    assert(s1.toSeq == s2.toSeq)
    val cands = Dedup.lshCandidates(Dedup.lshBuckets(sigs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L))) // exact dup always collides
    assert(!cands.exists { case (a, b) => b == 4L || a == 4L }) // unrelated never does
  }

  test("lshCandidates: degenerate corpus (1000 identical docs) stays bounded") {
    // Web-scale worst case: boilerplate hashing every doc into the same
    // buckets. With the cap, each oversized (band, bucket) emits an O(b)
    // star around the min id — not an O(b²) clique from one task.
    val d = docs((1L to 1000L).map(i =>
      (i, "identical boilerplate text repeated across the whole corpus verbatim")): _*)
    val buckets = Dedup.lshBuckets(
      Dedup.minhashSignatures(d, col("text"), col("doc_id")))
    val star = Dedup.lshCandidates(buckets, maxBucketSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(star.length == 999) // anchor star: every doc paired with doc 1 only
    assert(star.forall(_._1 == 1L))
    // connectivity is what dedup needs, and the star preserves it exactly:
    // all 1000 docs remain in one connected component
    val members = star.flatMap { case (a, b) => Seq(a, b) }.toSet
    assert(members == (1L to 1000L).toSet)
  }

  test("lshCandidates: buckets at-or-below the cap still emit the full clique") {
    val d = docs((1L to 30L).map(i =>
      (i, "identical boilerplate text repeated across the whole corpus verbatim")): _*)
    val buckets = Dedup.lshBuckets(
      Dedup.minhashSignatures(d, col("text"), col("doc_id")))
    assert(Dedup.lshCandidates(buckets, maxBucketSize = 30).count() == 30L * 29 / 2)
  }

  test("ngramJaccard: exact dup = 1.0, disjoint = 0.0") {
    val d = docs(
      (1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "q r s t u v"))
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val r = Dedup.ngramJaccard(pairs, d, col("text"), col("doc_id"))
      .collect().map(x => (x.getAs[Long]("doc_a"), x.getAs[Long]("doc_b"),
        x.getAs[Double]("jaccard"))).toSet
    assert(r == Set((1L, 2L, 1.0), (1L, 3L, 0.0)))
  }

  test("simhash: identical docs equal; similar docs closer than dissimilar") {
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val d = docs(
      (1L, "spark catalyst optimizer rewrites logical plans into physical plans"),
      (2L, "spark catalyst optimizer rewrites logical plans into physical plans"),
      (3L, "spark catalyst optimizer rewrites logical trees into physical trees"),
      (4L, "bananas oranges apples grapes melons pears plums cherries"))
    val m = Dedup.simhash(d, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("simhash")).toMap
    assert(m(1L) == m(2L))
    assert(hamming(m(1L), m(3L)) < hamming(m(1L), m(4L)))
  }

  test("winnowing: identical docs share all fingerprints, overlaps share some") {
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "PREFIX padding the quick brown fox jumps over the lazy dog"),
      (4L, "zz"), // shorter than k → no fingerprints, must not crash
      (5L, "totally different content with no shared substrings at all"))
    val fp = TextOps.winnowFingerprints(d, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(fp(1L) == fp(2L))
    assert((fp(1L) & fp(3L)).nonEmpty) // guaranteed coverage of long overlap
    assert(!fp.contains(4L))
    assert((fp(1L) & fp(5L)).isEmpty)
  }

  test("native winnow kernel equals the HOF reference form, incl. multi-byte") {
    // Edge lengths around k+w-1=11 chars, repeated-char monotonic-deque
    // stress, multi-byte chars (UTF-8 byte offsets vs char positions), and
    // in-doc duplicate window minima (distinct semantics).
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "aaaaaaaaaaaaaaaaaaaaaaaa"),
      (3L, "abcdefghijk"),  // exactly k+w-1 → one window
      (4L, "abcdefghij"),   // one short → zero windows
      (5L, "héllo wörld — süßes straße naïve café über çay"),
      (6L, "日本語のテキストをウィンドウで指紋化するテストです"),
      (7L, "mix of ascii and ünïcödé characters in one document"),
      (8L, "ab ab ab ab ab ab ab ab ab ab ab ab"))
    for ((k, w) <- Seq((8, 4), (5, 3), (3, 7), (1, 1))) {
      val native = TextOps.winnowFingerprints(d, col("text"), col("doc_id"), k, w)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val hof = TextOps.winnowFingerprintsHof(d, col("text"), col("doc_id"), k, w)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(native == hof, s"k=$k w=$w")
      assert(native.nonEmpty)
    }
  }

  test("projection-form minhash and band buckets equal the aggregated forms") {
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bend"),
      (3L, "completely different content with no overlap whatsoever here"))
    val agg = Dedup.minhashSignatures(d, col("text"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val proj = d.select(col("doc_id"),
        Dedup.minhashSignatureArray(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    for (id <- Seq(1L, 2L, 3L); p <- 0 until 16)
      assert(agg((id, p)) == proj(id)(p), s"doc $id perm $p")
    val aggBuckets = Dedup.lshBuckets(Dedup.minhashSignatures(d, col("text"), col("doc_id")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    val projBuckets = d.select(col("doc_id"),
        posexplode(Dedup.bandBucketArray(Dedup.minhashSignatureArray(col("text"))))
          .as(Seq("band", "bucket")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(aggBuckets == projBuckets)
  }

  test("ngramJaccardOnShingles: foreign null shingles yield null jaccard, not 1.0") {
    // a foreign (non-library) shingle frame may carry nulls; size(null) = -1
    // under legacy sizeOfNull would fake jaccard 1.0 and delete the doc
    val sh = Seq((1L, Seq("a b c")), (3L, Seq("a b c")))
      .toDF("id", "sh")
      .unionByName(Seq(2L).toDF("id").withColumn("sh",
        lit(null).cast("array<string>")))
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val got = Dedup.ngramJaccardOnShingles(pairs, sh)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    assert(got((1L, 2L)) == None, "null side must yield null jaccard")
    assert(got((1L, 3L)) == Some(1.0))
  }

  test("connectedComponents collapses transitive chains that pairs alone miss") {
    val nodes = (1L to 7L).toDF("id")
    // chain 1-2-3 (1,3 never directly compared), pair 4-5, singletons 6, 7
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val comp = Dedup.connectedComponents(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L, 7L -> 7L))
  }

  test("connectedComponents converges on a long path within the iteration bound") {
    // a 12-node path needs ~log-diameter rounds of min propagation
    val nodes = (1L to 12L).toDF("id")
    val pairs = (1L to 11L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comp = Dedup.connectedComponents(nodes, pairs)
      .select("component").distinct().as[Long].collect().toSeq
    assert(comp == Seq(1L))
  }

  test("connectedComponents refuses to return partial labels past maxIter") {
    // with per-round path halving a chain converges in ~log2(diameter)
    // rounds, so forcing non-convergence needs diameter >> 2^maxIter
    val nodes = (1L to 2000L).toDF("id")
    val pairs = (1L to 1999L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      // maxLocalEdges=0: the driver union-find tier would solve this
      // without iterating — the loud-failure contract under test belongs
      // to the distributed star rounds
      Dedup.connectedComponentsWithRounds(nodes, pairs, maxIter = 3,
        maxLocalEdges = 0L)._1.collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("redactPii masks emails and long digit runs, leaves the rest") {
    val got = docs((1L, "mail a.user@example.com or call 55512345 ext 12"))
      .select(TextOps.redactPii(col("text"))).as[String].collect()(0)
    assert(got == "mail <EMAIL> or call <NUM> ext 12")
  }

  test("qualityFilter flags each rule independently and keep requires all") {
    val goodText = ("the quick brown token run " * 5).trim // 25 tokens, has stopword
    val d = docs(
      (1L, goodText),                                   // passes everything
      (2L, "too short doc here now"),                   // 5 tokens < 20
      (3L, ("num 1234 9 88 732 " * 5).trim),            // digit-heavy
      (4L, ("the $$ %% !! ?? && " * 5).trim),           // symbol-heavy
      (5L, ("quick brown token run five " * 5).trim),   // no stopword
      (6L, ("extraordinarily incomprehensible " * 13).trim)) // avg len > 8
    val r = TextOps.qualityFilter(d, col("text"))
      .select("doc_id", "ok_token_count", "ok_token_len", "ok_symbol_ratio",
        "ok_digit_ratio", "ok_stopword", "quality_keep")
      .collect().map(x => x.getLong(0) ->
        (x.getInt(1), x.getInt(2), x.getInt(3), x.getInt(4), x.getInt(5), x.getInt(6))).toMap
    assert(r(1L) == (1, 1, 1, 1, 1, 1))
    assert(r(2L)._1 == 0 && r(2L)._6 == 0)
    assert(r(3L)._4 == 0 && r(3L)._6 == 0)
    assert(r(4L)._3 == 0 && r(4L)._6 == 0)
    assert(r(5L)._5 == 0 && r(5L)._6 == 0)
    assert(r(6L)._2 == 0 && r(6L)._6 == 0)
  }

  test("textStats computes exact counts and ratios") {
    val r = TextOps.textStats(docs((1L, "the cat and the hat")), col("text"), col("doc_id"))
      .collect()(0)
    assert(r.getAs[Int]("n_tokens") == 5)
    assert(r.getAs[Int]("n_chars") == 19)
    assert(r.getAs[Int]("n_distinct_tokens") == 4)
    assert(r.getAs[Int]("n_stopwords") == 3) // the, and, the
    assert(r.getAs[Double]("stopword_ratio") == 0.6)
  }

  test("langId picks the language with most marker hits, deterministic ties") {
    val r = TextOps.langId(docs(
      (1L, "the a the data"), // en 3, es 1 → en
      (2L, "vector batch vector"), // zh
      (3L, "nothing matching here")), col("text"), col("doc_id"))
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(r(1L) == "en")
    assert(r(2L) == "zh")
    assert(r(3L) == "und")
  }

  test("substringRuns reports the exact longest verbatim token run per pair") {
    // docs 1 and 2 share the verbatim 10-token run "c1..c10" at different
    // offsets; doc 3 shares nothing 8+ tokens long with either.
    val shared = (1 to 10).map("c" + _).mkString(" ")
    val d = docs(
      (1L, s"a1 a2 a3 $shared z1 z2"),
      (2L, s"b1 $shared y1 y2 y3 y4"),
      (3L, s"a1 a2 a3 q1 q2 q3 q4 q5 q6 q7 q8 q9"))
    val r = TextOps.substringRuns(d, col("text"), col("doc_id"))
      .collect().map(x => (x.getAs[Long]("d1"), x.getAs[Long]("d2"),
        x.getAs[Long]("longest_run"), x.getAs[Long]("n_runs")))
    assert(r.toSeq == Seq((1L, 2L, 10L, 1L)))
  }

  test("substringRuns: two disjoint shared runs count as separate islands") {
    val r1 = (1 to 8).map("p" + _).mkString(" ")
    val r2 = (1 to 9).map("q" + _).mkString(" ")
    val d = docs(
      (1L, s"$r1 x1 x2 x3 $r2"),
      (2L, s"$r2 m1 m2 m3 m4 m5 $r1"))
    val r = TextOps.substringRuns(d, col("text"), col("doc_id")).collect()(0)
    assert(r.getAs[Long]("longest_run") == 9L)
    assert(r.getAs[Long]("n_runs") == 2L)
  }

  test("substringRuns: a run shorter than minRun is not reported") {
    val short = (1 to 7).map("s" + _).mkString(" ") // 7 < minRun 8
    val d = docs(
      (1L, s"a1 a2 a3 a4 $short"),
      (2L, s"b1 b2 b3 b4 $short"))
    assert(TextOps.substringRuns(d, col("text"), col("doc_id")).count() == 0L)
  }

  test("cutRuns removes the shared span from the higher-id doc only (keep-first)") {
    val shared = (1 to 10).map("c" + _).mkString(" ")
    val d = docs(
      (1L, s"a1 a2 a3 $shared z1 z2"),
      (2L, s"b1 $shared y1 y2 y3 y4"),
      (3L, "n1 n2 n3 n4 n5"))
    val r = TextOps.cutRuns(d, col("text"), col("doc_id"))
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Int]("n_tokens"), x.getAs[Int]("n_tokens_after"))).toMap
    // doc 1 (earlier copy) keeps everything; doc 2 loses the 10-token run
    assert(r(1L) == ((15, 15)), s"keep-first must not cut the earlier doc: $r")
    assert(r(2L) == ((15, 5)), s"later doc must lose the 10 shared tokens: $r")
    assert(r(3L) == ((5, 5)))
    // the cut text hash equals the hash of the expected remainder
    val cut2 = TextOps.cutRuns(d, col("text"), col("doc_id"))
      .filter(col("doc_id") === 2L).head().getAs[Long]("cut_text_hash")
    val expect2 = d.sparkSession.range(1)
      .select(TextOps.portableHash(lit("b1 y1 y2 y3 y4"))).head().getLong(0)
    assert(cut2 == expect2, "cut must remove exactly the shared span")
  }

  test("cutRuns merges overlapping intervals from different partners") {
    // doc 3 shares tokens 0-9 with doc 1 and tokens 5-14 with doc 2: the
    // two cut intervals overlap and must merge to one 15-token cut.
    val t = (1 to 15).map("t" + _)
    val d = docs(
      (1L, t.take(10).mkString(" ") + " a1 a2 a3"),
      (2L, "b1 b2 b3 " + t.drop(5).mkString(" ")),
      (3L, t.mkString(" ") + " z1 z2 z3"))
    val r = TextOps.cutRuns(d, col("text"), col("doc_id"))
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Int]("n_tokens"), x.getAs[Int]("n_tokens_after"))).toMap
    assert(r(3L) == ((18, 3)), s"overlapping cuts must merge: $r")
    assert(r(1L)._1 == r(1L)._2 && r(2L)._1 == r(2L)._2,
      s"lower-id partners keep their text: $r")
  }

  test("substringRuns: dfCap drops boilerplate grams shared by too many docs") {
    val boiler = (1 to 12).map("w" + _).mkString(" ")
    // the 12-token run appears verbatim in every doc; with dfCap below the
    // corpus size the anchors are dropped and no pair is reported
    val many = (1L to 6L).map(i => (i, s"u${i}a u${i}b $boiler u${i}c"))
    val d = docs(many: _*)
    assert(TextOps.substringRuns(d, col("text"), col("doc_id"), dfCap = 4)
      .count() == 0L)
    // raising the cap restores all 15 pairs
    assert(TextOps.substringRuns(d, col("text"), col("doc_id"), dfCap = 6)
      .count() == 15L)
  }

  test("paragraphDedup: corpus-wide chunk keeper election + ordered reassembly hash") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val d = docs(
      (1L, "a b c d e f g h"),   // two chunks, both kept (first occurrence)
      (2L, "a b c d x y z w"),   // first chunk dups doc 1's -> only x y z w kept
      (3L, "a b c d e f g h"),   // full duplicate of doc 1 -> nothing kept
      (4L, "m m m m m m m m"))   // intra-doc duplicate chunk -> one kept
    val got = Dedup.paragraphDedup(d, col("text"), col("doc_id"), chunkTokens = 4)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(got(1L) == ((2L, 2L, 8L, md5hex("a b c d e f g h"))))
    assert(got(2L) == ((2L, 1L, 4L, md5hex("x y z w"))))
    assert(got(3L) == ((2L, 0L, 0L, md5hex(""))))
    assert(got(4L) == ((2L, 1L, 4L, md5hex("m m m m"))))
    // the text-returning form reassembles the SAME kept text the hash form
    // fingerprints — the one contract the shared-internals refactor pins
    val texts = Dedup.paragraphDedupText(d, col("text"), col("doc_id"), chunkTokens = 4)
      .select("doc_id", "kept_text").as[(Long, String)].collect().toMap
    assert(texts == Map(1L -> "a b c d e f g h", 2L -> "x y z w",
      3L -> "", 4L -> "m m m m"))
    texts.foreach { case (id, t) =>
      assert(md5hex(t) == got(id)._4, s"hash/text disagree for doc $id")
    }
  }

  private def linkage(rows: Seq[(Long, String, String)], maxKeySize: Int = 64)
      : Set[(Long, Long, Int, Int)] = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = rows.toDF("id", "name", "blk")
    Dedup.entityMatch(df, col("id"), col("name"), col("blk"),
        pieceCols = Seq(substring(col("name"), 1, 3),
          substring(col("name"), 4, 3), substring(col("name"), 7, 3)),
        maxDist = 2, maxKeySize = maxKeySize)
      .as[(Long, Long, Int, Int)].collect().toSet
  }

  test("entityMatch: one-segment edits are found via the intact key pair") {
    // 9-char names split in thirds; id 2 differs from id 1 only inside the
    // middle third -> the (t0, t2) key is intact -> candidate, lev 1
    val got = linkage(Seq(
      (1L, "abcdefghi", "b0"), (2L, "abcdXfghi", "b0"),
      (3L, "zzzzzzzzz", "b0")))
    assert(got == Set((1L, 2L, 1, 1)))
  }

  test("entityMatch: blocking attribute separates otherwise-identical names") {
    val got = linkage(Seq(
      (1L, "abcdefghi", "b0"), (2L, "abcdefghi", "b1")))
    assert(got.isEmpty, "different blocks must never pair")
  }

  test("entityMatch: hot keys are dropped; distance beyond maxDist is not a match") {
    // six records share every segment pair -> with maxKeySize 2 all keys
    // are hot and nothing pairs
    val crowd = (1L to 6L).map(i => (i, "abcdefghi", "b0"))
    assert(linkage(crowd, maxKeySize = 2).isEmpty)
    // edits in ALL three segments -> no intact key pair -> no candidate
    val spread = linkage(Seq(
      (1L, "abcdefghi", "b0"), (2L, "Xbcd!fgh?", "b0")))
    assert(spread.isEmpty)
    val three = linkage(Seq(
      (1L, "abcdefghi", "b0"), (2L, "Xbcdefghi", "b0"),
      (3L, "XYcdefghi", "b0")))
    // id2/id3: lev(Xbc..., XYc...) = 1 -> match; id1/id3 lev = 2 -> match
    assert(three.contains((2L, 3L, 1, 1)) && three.contains((1L, 3L, 2, 1)))
  }
}
