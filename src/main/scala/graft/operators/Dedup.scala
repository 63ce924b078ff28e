package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines, from exact to
 * approximate:
 *
 *  - exact duplicate grouping (hash groupBy — one shuffle on the content key)
 *  - normalized-fingerprint dedup (md5 of canonicalized text)
 *  - MinHash signatures + LSH banding + candidate pairs + verified Jaccard
 *  - SimHash fingerprints + near-dup pairs by Hamming distance
 *  - n-gram Jaccard similarity between explicit pairs
 *
 * Scale design: every step is a hash-shuffle on a key whose cardinality grows
 * with the corpus (shingle, band bucket), never a cross join. The LSH
 * candidate step bounds pair generation to same-bucket collisions, which is
 * what makes near-dedup feasible at 100 TB — the exact-Jaccard verify runs
 * only on candidates. Hashes are md5-derived ([[TextOps.portableHash]]) so
 * results are engine-independent and oracle-verifiable; swap
 * [[TextOps.fastHash]] in for raw throughput.
 */
object Dedup {

  /** Exact dedup at scale: group identical texts by their md5 — the key the
    * shuffle carries is 32 hex chars per document instead of the document
    * itself (grouping by full text moves the whole corpus's bytes through
    * the exchange twice, partial and final). Identity is md5-exact: no
    * normalization (that's [[byFingerprint]]), and an md5 collision merging
    * two distinct texts is ~2^-64-improbable at any real corpus size — the
    * standard exact-dedup trade. [[exactByText]] is the no-hash opt-in for
    * small corpora where carrying the text key is free. */
  def exact(docs: DataFrame, textCol: Column, idCol: Column): DataFrame =
    docs.groupBy(md5(textCol.cast("binary")).as("text_md5"))
      .agg(min(idCol).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Small-corpus opt-in: [[exact]] grouping on the text VALUE itself (the
    * key survives on the output — useful when the duplicate groups are read
    * back by content). The shuffle carries every document's full text; at
    * corpus scale use [[exact]]. */
  def exactByText(docs: DataFrame, textCol: Column, idCol: Column): DataFrame =
    docs.groupBy(textCol.as("text"))
      .agg(min(idCol).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Fingerprint dedup: like [[exact]] but robust to case/whitespace noise. */
  def byFingerprint(docs: DataFrame, textCol: Column, idCol: Column): DataFrame =
    docs.groupBy(TextOps.fingerprint(textCol).as("fingerprint"))
      .agg(min(idCol).as("canonical_id"), count(lit(1)).as("n_copies"))

  /**
   * SUB-document exact dedup — the C4 span-level pass that document-level
   * dedup cannot express: documents are tiled into non-overlapping
   * `chunkTokens`-token chunks ([[TextOps.chunkWindows]] with stride =
   * window, so every token belongs to exactly one chunk) and each distinct
   * chunk keeps ONE occurrence corpus-wide — the (min doc_id, min chunk_id)
   * one, deterministic. Repeated boilerplate paragraphs (license headers,
   * nav text, TOS footers) collapse to a single copy while the documents
   * around them survive. Output is per document: chunk counts before/after,
   * surviving token count, and the md5 of the reassembled kept text (kept
   * chunks re-joined in chunk order) — the audit row a curation pipeline
   * logs, with the reassembled text itself one `concat_ws` away.
   *
   * Scale shape: keeper election is a map-side-combinable min-struct
   * aggregation on the chunk md5 — a corpus-wide hot chunk (the same TOS
   * paragraph in a billion docs) partial-aggregates to one row per map
   * task instead of flooding one reducer (the skew discipline; a
   * row_number window over the hash would put the whole hot key in one
   * task). The join back is on the md5 with exactly one keeper row per
   * hash — no pair blow-up possible — and the shuffle carries 32-char
   * hashes plus the chunk text only as far as the per-doc reassembly.
   */
  def paragraphDedup(docs: DataFrame, textCol: Column, idCol: Column,
      chunkTokens: Int): DataFrame =
    chunkKeepers(docs, textCol, idCol, chunkTokens)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("keep")).as("n_kept"),
        sum(col("chunk_tokens") * col("keep")).as("kept_tokens"),
        md5(keptReassembly.cast("binary")).as("kept_text_hash"))

  /** [[paragraphDedup]] returning the reassembled KEPT TEXT itself (not its
    * md5) — the form downstream pipeline stages consume (shingling,
    * quality gates, token budgeting all need the surviving tokens, not a
    * fingerprint). Same election, same chunk-order reassembly; a doc whose
    * every chunk lost its election keeps the empty string. */
  def paragraphDedupText(docs: DataFrame, textCol: Column, idCol: Column,
      chunkTokens: Int): DataFrame =
    chunkKeepers(docs, textCol, idCol, chunkTokens)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("keep")).as("n_kept"),
        sum(col("chunk_tokens") * col("keep")).as("kept_tokens"),
        keptReassembly.as("kept_text"))

  /** Chunk-order reassembly of the elected chunks — the ONE definition both
    * aggregate forms share (their spec'd hash/text agreement depends on
    * it). collect_list skips the nulls the `when` leaves for losers. */
  private def keptReassembly: Column =
    concat_ws(" ",
      transform(
        array_sort(collect_list(
          when(col("keep") === 1,
            struct(col("chunk_id"), col("chunk_text"))))),
        s => s.getField("chunk_text")))

  /** Shared head of the paragraph-dedup family: tile into chunks, elect one
    * keeper per distinct chunk md5 (min-struct aggregation — map-side
    * combinable, hot chunks partial to one row per task), flag each chunk
    * row keep/lose. */
  private def chunkKeepers(docs: DataFrame, textCol: Column, idCol: Column,
      chunkTokens: Int): DataFrame = {
    val chunks = TextOps.chunkWindows(
        docs.select(idCol.as("doc_id"), textCol.as("text")),
        col("text"), col("doc_id"), chunkTokens, chunkTokens)
      .select(col("doc_id"), col("chunk_id"), col("chunk_text"),
        col("chunk_tokens"), md5(col("chunk_text").cast("binary")).as("chash"))
    val keepers = chunks
      .groupBy(col("chash"))
      .agg(min(struct(col("doc_id"), col("chunk_id"))).as("k"))
      .select(col("chash"), col("k.doc_id").as("k_doc"),
        col("k.chunk_id").as("k_chunk"))
    chunks.join(keepers, Seq("chash"))
      .withColumn("keep",
        (col("doc_id") === col("k_doc") && col("chunk_id") === col("k_chunk"))
          .cast("int"))
  }

  /** Mersenne prime 2^31-1: the permutation modulus. a*h stays < 2^62, so
    * the (a*h+b) mod p arithmetic is exact in int64 in every engine. */
  val MinhashPrime: Long = 2147483647L

  /** Fixed universal-hash family (a_i, b_i), all < 2^31-1. One md5 per
    * shingle; the 16 permutations are pure arithmetic on it — 16x fewer
    * digest computations than salted re-hashing, same oracle-verifiable
    * determinism. */
  val minhashPerms: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L), (1140671485L, 12820163L), (1664525L, 1013904223L),
    (22695477L, 1L), (134775813L, 1L), (214013L, 2531011L),
    (16807L, 0L), (48271L, 0L), (69621L, 0L),
    (40692L, 3791L), (40014L, 12211L), (65539L, 1L),
    (1099087573L, 2654435761L % 2147483647L), (662124007L, 106907L),
    (100005713L, 1000099L), (715136305L, 33554467L))

  /**
   * MinHash signatures in long format: (doc_id, perm, minhash) —
   * minhash_i = min over shingles of (a_i * (H(s) mod p) + b_i) mod p with
   * H = the portable md5-derived hash.
   *
   * Plan shape: explode(shingles) → hash once → ONE aggregation computing all
   * numPerms mins as columns (each permutation is pure arithmetic evaluated
   * into its own min buffer) → unpivot to long format *after* the aggregate.
   * Map-side volume is one row per (doc, shingle); the shuffle carries one
   * row per doc with numPerms columns. The former perm-explode formulation
   * pushed numPerms× the rows through the partial aggregate for the same
   * result.
   */
  def minhashSignatures(
      docs: DataFrame, textCol: Column, idCol: Column,
      shingleSize: Int = 3, numPerms: Int = 16): DataFrame = {
    require(numPerms <= minhashPerms.length)
    val mins = minhashPerms.take(numPerms).zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * col("h") + lit(b)) % MinhashPrime).as(s"m$i")
    }
    docs.select(idCol.as("doc_id"), explode(TextOps.shingles(textCol, shingleSize)).as("shingle"))
      .select(col("doc_id"), (TextOps.portableHash(col("shingle")) % MinhashPrime).as("h"))
      .groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        posexplode(array((0 until numPerms).map(i => col(s"m$i")): _*))
          .as(Seq("perm", "minhash")))
  }

  /** Per-shingle portable hashes of a text, as one array column — the shared
    * input of all [[minhashPerms]] permutation folds. Callers MUST stage this
    * through its own projection (`.withColumn`/`.select`) before fanning out
    * into the per-permutation mins: a bound column reference is cheap to
    * repeat, whereas inlining this expression 16× re-runs the md5-per-shingle
    * work 16× (higher-order functions get no codegen subexpression
    * elimination — measured 2 orders of magnitude on the admission path). */
  def minhashHashes(textCol: Column, shingleSize: Int = 3): Column =
    transform(TextOps.shingles(textCol, shingleSize),
      s => TextOps.portableHash(s) % MinhashPrime)

  /** MinHash signature array over a pre-staged [[minhashHashes]] column. */
  def minhashSignatureArrayOfHashes(hashes: Column, numPerms: Int = 16): Column = {
    require(numPerms <= minhashPerms.length)
    array(minhashPerms.take(numPerms).map { case (a, b) =>
      array_min(transform(hashes, h => (lit(a) * h + lit(b)) % MinhashPrime))
    }: _*)
  }

  /**
   * MinHash signature as ONE pure projection (array expression): identical
   * values to [[minhashSignatures]] (same hash family, same modulus, same
   * shingling) but computed per row with no shuffle at all — the form
   * streaming pipelines and map-only batch stages use. Equivalence to the
   * aggregated form is spec-checked. Cost trade: the aggregated form
   * deduplicates shingle hashing across the corpus via the exchange; this
   * form is O(shingles × numPerms) arithmetic per row but exchange-free.
   *
   * PERF: this single-expression convenience form inlines [[minhashHashes]]
   * once per permutation. Hot paths must stage the levels as separate
   * columns instead (see [[signatureEntries]]): hashes → signature → bands,
   * each its own projection, so every level is computed once per row.
   */
  def minhashSignatureArray(textCol: Column, shingleSize: Int = 3,
      numPerms: Int = 16): Column =
    minhashSignatureArrayOfHashes(minhashHashes(textCol, shingleSize), numPerms)

  /** In-bucket upper-triangle pair expansion over a SORTED id-array column:
    * all (x, y) with x strictly before y, as (doc_a, doc_b) structs — the
    * one source of truth for the batch and incremental candidate paths
    * (their spec'd equivalence depends on this staying identical). */
  private def pairExpansion(arrCol: String): Column =
    expr(
      s"""flatten(transform($arrCol, (x, i) ->
         |  transform(slice($arrCol, i + 2, size($arrCol)), y ->
         |    struct(x AS doc_a, y AS doc_b))))""".stripMargin)

  /** Per-band LSH bucket ids for a [[minhashSignatureArray]] signature —
    * the same md5-of-joined-values derivation as [[lshBuckets]], as a
    * projection. Index k of the result is band k's bucket. */
  def bandBucketArray(sig: Column, rowsPerBand: Int = 4,
      numPerms: Int = 16): Column = {
    // a partial trailing band would exist in lshBuckets (ceil) but not here
    // (floor), silently breaking the spec'd bit-identical equivalence of
    // the projection and aggregated forms — reject instead
    require(numPerms % rowsPerBand == 0,
      s"rowsPerBand=$rowsPerBand must divide numPerms=$numPerms")
    array((0 until numPerms / rowsPerBand).map { k =>
      md5(concat_ws(",",
        (0 until rowsPerBand).map(j =>
          element_at(sig, k * rowsPerBand + j + 1).cast("string")): _*)
        .cast("binary"))
    }: _*)
  }

  /**
   * LSH banding over [[minhashSignatures]]: group each doc's signature into
   * bands of `rowsPerBand` permutations; bucket key = md5 of the band's
   * concatenated minhash values. Docs sharing a (band, bucket) are candidates.
   */
  def lshBuckets(signatures: DataFrame, rowsPerBand: Int = 4): DataFrame =
    signatures
      .withColumn("band", (col("perm") / rowsPerBand).cast("int"))
      .groupBy(col("doc_id"), col("band"))
      // array_sort(collect_list) = values in perm order, deterministically:
      // perm is unique within (doc, band) so sorting (perm, minhash) pairs by
      // perm is stable. We sort the struct to be order-independent.
      .agg(sort_array(collect_list(struct(col("perm"), col("minhash")))).as("sig"))
      .select(col("doc_id"), col("band"),
        // numPerms isn't statically known here (it's the signature frame's
        // perm count), so the bandBucketArray divisibility contract is
        // enforced at runtime: a partial trailing band (size < rowsPerBand)
        // raises instead of silently bucketing on fewer minhashes — keeping
        // the aggregated and projection forms bit-identical or loudly not
        when(size(col("sig")) =!= rowsPerBand,
          raise_error(concat(
            lit(s"partial LSH band (rowsPerBand=$rowsPerBand must divide the"
              + " signature's permutation count; band has "),
            size(col("sig")).cast("string"), lit(" rows)"))))
          .otherwise(
            md5(concat_ws(",",
              transform(col("sig"), s => s("minhash").cast("string")))
              .cast("binary"))).as("bucket"))

  /** Candidate near-dup pairs: distinct (a < b) sharing any LSH bucket.
    * Implemented as groupBy(bucket) + in-bucket pair expansion rather than a
    * self-join — the upstream signature pipeline is computed ONCE (a
    * self-join would run it twice absent exchange reuse), and the (band,
    * bucket) key bounds the pair blow-up to intra-bucket combinations.
    *
    * Hot-bucket bound: web-scale corpora have degenerate buckets (empty docs,
    * boilerplate) holding O(corpus) members; an uncapped clique there buffers
    * O(corpus) ids in one aggregation and emits O(b²) pairs from one task.
    * Buckets larger than `maxBucketSize` therefore degrade to a STAR around
    * the bucket's min doc_id — O(b) pairs, produced by a spillable window +
    * projection with no list buffer at all.
    *
    * Contract of the star fallback: connectivity of the CANDIDATE graph is
    * preserved (every member stays connected to the bucket's anchor). If a
    * downstream verifier then FILTERS edges (ngramJaccard >= θ), two members
    * whose pair would have passed but whose anchor edges both fail can land
    * in separate verified components — the standard recall trade of capping
    * a degenerate bucket, whose members are near-identical so anchor edges
    * pass in practice. Raise `maxBucketSize` (or sub-bucket by a secondary
    * hash) where that recall matters more than the O(b²) bound. Both
    * branches reuse one exchange on (band, bucket). */
  def lshCandidates(buckets: DataFrame, maxBucketSize: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byBucket = Window.partitionBy(col("band"), col("bucket"))
    val sized = buckets
      .withColumn("bsize", count(lit(1)).over(byBucket))
      .withColumn("anchor", min(col("doc_id")).over(byBucket))
      .filter(col("bsize") > 1)
    val clique = sized.filter(col("bsize") <= maxBucketSize)
      .groupBy(col("band"), col("bucket"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .select(explode(pairExpansion("ds")).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
    val star = sized
      .filter(col("bsize") > maxBucketSize && col("doc_id") =!= col("anchor"))
      .select(col("anchor").as("doc_a"), col("doc_id").as("doc_b"))
    clique.unionByName(star).distinct()
  }

  /** Per-document shingle-set frame (id, sh) — the verify-side input to
    * [[ngramJaccardOnShingles]]. Pure projection; callers verifying more than
    * one pair frame against the same corpus should compute this ONCE and
    * `localCheckpoint()` it so the (expensive) shingling projection is not
    * re-run per reference. */
  def shingleSets(docs: DataFrame, textCol: Column, idCol: Column,
      shingleSize: Int = 3): DataFrame =
    docs.select(idCol.as("id"), TextOps.shingles(textCol, shingleSize).as("sh"))

  /**
   * Exact Jaccard similarity over word-shingle sets for an explicit pair
   * frame (doc_a, doc_b). Integer intersection/union counts → the similarity
   * double is bit-exact across engines.
   */
  def ngramJaccard(
      pairs: DataFrame, docs: DataFrame, textCol: Column, idCol: Column,
      shingleSize: Int = 3): DataFrame =
    ngramJaccardOnShingles(pairs, shingleSets(docs, textCol, idCol, shingleSize))

  /**
   * [[ngramJaccard]] against a pre-built [[shingleSets]] frame. Shingle
   * arrays are distinct by construction ([[TextOps.shingles]] wraps
   * `array_distinct`), so `size(array_intersect(...))` IS the set
   * intersection count — the whole verify is two equi-joins plus a codegen'd
   * projection: no shingle explode, no per-pair aggregation, no extra
   * shuffle beyond the joins. Shuffle volume is O(pairs × avg shingle-array
   * bytes), bounded by the candidate generator upstream.
   *
   * Null contract: [[TextOps.shingles]] never yields a null array (null text
   * shingles to `[""]`), so `sh` is non-null by construction for every frame
   * this library builds. Because `size(null)` is -1 (not null) under the
   * legacy non-ANSI sizeOfNull setting — which would make jaccard evaluate
   * to 1.0 and silently DROP docs — a foreign frame with null `sh` is
   * defended against IN the projection: null-shingle pairs emit null counts
   * and a null jaccard, which every threshold filter downstream discards
   * (the doc is kept — the safe failure direction for a dedup verifier).
   * Deliberately NOT a `.filter(sh.isNotNull)`: a Filter on a
   * projection-derived column gets predicate-pushed beneath the joins and
   * inlines the whole shingle HOF expression into an interpreted Filter
   * operator, evaluating it twice per row outside codegen — measured 6× on
   * text_ngram_jaccard at sf0.1 (0.31 → 1.9 s idle, the r7 regression).
   * Inside one projection the null checks are attribute references — free.
   */
  def ngramJaccardOnShingles(pairs: DataFrame, shingles: DataFrame): DataFrame = {
    def safe(c: Column): Column =
      when(col("sh_a").isNull || col("sh_b").isNull, lit(null)).otherwise(c)
    pairs
      .join(shingles.select(col("id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(shingles.select(col("id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        safe(size(array_intersect(col("sh_a"), col("sh_b")))).as("n_inter"),
        safe(size(col("sh_a"))).as("n_a"), safe(size(col("sh_b"))).as("n_b"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
  }

  /**
   * Scale path for embedding near-dup: banded hyperplane-LSH candidates with
   * in-bucket exact cosine verification. Each vector lands in `nBands`
   * (band, bucket) cells ([[Similarity.lshBandBuckets]]); the self-join is a
   * pure equi-join on those keys — a hash shuffle, never a nested-loop — so
   * the pair space is bounded by bucket co-residency instead of N²/2.
   *
   * Recall contract: LSH prunes, so pairs above the threshold whose vectors
   * collide in no band are MISSED — recall is 1-(1-p^r)^b per the banding
   * math, measured empirically in `DedupSpec`/`SimilaritySpec` against
   * [[embeddingNearDup]]. Precision is exact (every emitted pair's cosine is
   * recomputed and thresholded). Tune nBands up / rowsPerBand down for
   * recall, the reverse for cost.
   *
   * Hot-bucket bound (the same guard [[lshCandidates]] applies to the
   * shingle-LSH path): a degenerate (band, bucket) — near-duplicate
   * embedding clusters, zero/constant vectors, any cell holding O(corpus)
   * members — would expand O(|bucket|²) pairs from the self-join. Cells
   * larger than `maxBucketSize` therefore degrade to a STAR around the
   * cell's min id: each member is cosine-verified against the anchor only —
   * O(b) pairs. Precision stays exact (star edges are verified like any
   * other); the recall trade is the same as lshCandidates' (two members of
   * an oversized cell whose pair would pass but whose anchor edges don't are
   * missed — in a near-duplicate cell anchor edges pass in practice).
   * Buckets at or under the cap are byte-identical to the uncapped form.
   */
  def embeddingNearDupBucketed(embeddings: DataFrame, idCol: Column, vecCol: Column,
      threshold: Double, nBands: Int = 4, rowsPerBand: Int = 2, dim: Int = -1,
      maxBucketSize: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // dim known → plane coefficients fold to literals and each projection is
    // one codegen'd dot (Similarity.lshBandBucketsFast); dim unknown → the
    // dynamic (per-row md5) variant. Same bucket ids either way.
    val bandBuckets =
      if (dim > 0) Similarity.lshBandBucketsFast(col("v"), nBands, rowsPerBand, dim)
      else Similarity.lshBandBuckets(col("v"), nBands, rowsPerBand)
    val byCell = Window.partitionBy(col("band"), col("bucket"))
    val v = embeddings.select(idCol.as("id"), Similarity.asDouble(vecCol).as("v"))
      .withColumn("n", Similarity.norm(col("v")))
      .select(col("id"), col("v"), col("n"),
        posexplode(bandBuckets).as(Seq("band", "bucket")))
      // the cell-size window shares the (band, bucket) exchange the join
      // needs anyway; computing it pre-checkpoint means the sizing pass is
      // materialized once with the bucket ids
      .withColumn("bsize", count(lit(1)).over(byCell))
      .withColumn("anchor", min(col("id")).over(byCell))
      // materialize before the self-join: the two aliased sides sit below
      // the (band, bucket) exchange, so ReuseExchange cannot dedupe them
      // and the md5-per-plane bucket derivation would run twice (the r6
      // recompute lesson — see semanticDedup)
      .localCheckpoint()
    def verified(pairs: DataFrame): DataFrame = pairs
      .select(col("doc_a"), col("doc_b"),
        (Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cosine"))
      .filter(col("cosine") >= threshold)
    val small = v.filter(col("bsize") <= maxBucketSize)
    val a = small.select(col("band"), col("bucket"),
      col("id").as("doc_a"), col("v").as("va"), col("n").as("na"))
    val b = small.select(col("band"), col("bucket"),
      col("id").as("doc_b"), col("v").as("vb"), col("n").as("nb"))
    val clique = verified(
      a.join(b, Seq("band", "bucket")).filter(col("doc_a") < col("doc_b")))
    // oversized cells: anchor (min id) joined to every other member — the
    // anchor side is one row per (band, bucket), so the join output is O(b)
    val anchors = v.filter(col("bsize") > maxBucketSize && col("id") === col("anchor"))
      .select(col("band"), col("bucket"),
        col("id").as("doc_a"), col("v").as("va"), col("n").as("na"))
    val members = v.filter(col("bsize") > maxBucketSize && col("id") =!= col("anchor"))
      .select(col("band"), col("bucket"),
        col("id").as("doc_b"), col("v").as("vb"), col("n").as("nb"))
    val star = verified(anchors.join(members, Seq("band", "bucket")))
    clique.unionByName(star).distinct()
  }

  /**
   * Embedding-cosine near-dup pairs: all (a < b) with cosine ≥ threshold.
   * This is the brute-force O(N²/2) baseline — correct and exact, and the
   * recall oracle for [[embeddingNearDupBucketed]], which is what belongs in
   * a corpus-scale pipeline.
   */
  def embeddingNearDup(embeddings: DataFrame, idCol: Column, vecCol: Column,
      threshold: Double): DataFrame = {
    val v = embeddings.select(idCol.as("id"), Similarity.asDouble(vecCol).as("v"))
      .withColumn("n", Similarity.norm(col("v")))
    val a = v.select(col("id").as("doc_a"), col("v").as("va"), col("n").as("na"))
    val b = v.select(col("id").as("doc_b"), col("v").as("vb"), col("n").as("nb"))
    a.join(b, col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /**
   * Connected components over an undirected pair list — the transitive
   * canonicalization step of near-dedup: verified pairs (A,B), (B,C) must
   * collapse A, B and C into ONE group even though (A,C) was never compared.
   * Returns (id, component) with component = the minimum id reachable.
   *
   * Algorithm: min-label propagation with per-round pointer shortcutting.
   * Every iteration each node takes the min of its own label, its neighbors'
   * labels, AND its label's label (label(label(u)) — the path-halving step
   * of union-find). Propagation alone converges in O(diameter) rounds —
   * fine for near-dup clusters (near-cliques, 2-4 rounds) but fatal for a
   * pathological chain corpus (a 10k-doc chain would need 10k rounds);
   * shortcutting (active from round 2, so shallow graphs never pay for it)
   * halves every label-pointer path each round, so convergence is
   * O(log diameter) — a 10k chain closes within 16 rounds (pinned by
   * `ComponentsScaleSpec`), and the default maxIter=20 covers diameters
   * beyond any real corpus (~2^18). Each round is two equi-joins + one
   * aggregation — all-distributed, no driver-side data; the driver only
   * runs the (bounded) loop. The labels also ARE the shortcut lookup table,
   * so no extra state is carried. Convergence detection is folded INTO the
   * update: the same projection that computes the new label emits a changed
   * flag, and the round's single action sums it — no second pass. Lineage
   * is truncated by localCheckpointing every `checkpointEvery` rounds
   * rather than every round; between checkpoints an action recomputes at
   * most `checkpointEvery - 1` cheap join layers, which costs less than a
   * full materialization per round.
   */
  /**
   * Stats-severing materialization for ITERATED plans: `localCheckpoint`
   * truncates lineage but deliberately PRESERVES Catalyst size estimates
   * through the cut (so AQE keeps planning well after a checkpoint). In a
   * loop whose body joins a frame with itself that preservation is fatal:
   * join size estimates MULTIPLY, so the carried sizeInBytes SQUARES every
   * round — measured in r10, by the 7th components round the BigInt had
   * ~30M digits and the driver spent two MINUTES inside
   * BigInteger.multiply while the actual data was 2k rows. Re-wrapping the
   * checkpointed RDD in a fresh createDataFrame resets the estimate to the
   * default, at the cost of an InternalRow↔Row conversion on reads —
   * linear in the (small) label frame and irrelevant next to the planning
   * blow-up it prevents. Use for frames that feed back into a loop; plain
   * localCheckpoint remains right for once-through materializations.
   */
  private def checkpointFresh(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    df.sparkSession.createDataFrame(ck.rdd, df.schema)
  }

  /**
   * Connected components by alternating LARGE-STAR / SMALL-STAR rewrites
   * (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
   * 2014): each round rewrites the edge set toward stars centered on
   * component minima — large-star points every larger neighbor of u at
   * m(u) = min(N(u) ∪ {u}); small-star points the smaller-or-equal
   * neighbors (and u itself) at m(u). Converges when the edge set is
   * stable (all stars), in O(log² n) rounds with small constants —
   * measured 10 rounds on a 2 000-node id-PERMUTED chain and 6 on a
   * random graph.
   *
   * This replaced r2's min-label propagation + pointer jumping, which is
   * O(diameter) ROUNDS on adversarial id layouts no matter how labels are
   * pointer-jumped (a label chain bottoms out at the current local
   * minimum, so the component min still travels ONE edge-hop per round).
   * The r10 discovery: a mutual-kNN graph — whose ids are uncorrelated
   * with its chain structure — blew past the round budget at sf0.1 while
   * every near-clique DUP graph (ids correlated, diameter tiny) converged
   * in 2-3 rounds and hid the defect. The id-sequential 10k-chain spec
   * ALSO hid it: sequential ids make label jumps align with graph edges.
   * `ComponentsScaleSpec`'s permuted-chain test pins the fix.
   *
   * Scale shape per round: two groupBy(min) aggregations + two equi-joins
   * + distinct — all map-side-combinable hash exchanges on node ids; the
   * intermediate edge set stays O(n + m) (the paper's invariant). Every
   * round's frames are re-materialized through [[checkpointFresh]], which
   * severs Catalyst size-estimate lineage — `localCheckpoint` PRESERVES
   * stats through the cut, and iterated self-referencing joins SQUARE
   * them until the driver spends minutes in BigInteger.multiply (measured:
   * a 30M-digit sizeInBytes by round 7 of the old loop over 2k rows).
   * Convergence detection is an order-free edge-set signature
   * (count + bit_xor of xxhash64) — one action per round.
   */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
      maxIter: Int = 30): DataFrame =
    connectedComponentsWithRounds(nodes, pairs, maxIter)._1

  /** Floor of the driver union-find tier's edge ceiling — see
    * [[defaultMaxLocalEdges]]. At 2M symmetrized edges the local tier's
    * peak transient footprint is ~140 MB (edges 32 MB, open-addressing
    * hash index ~50 MB, parents/labels/min-per-root ~55 MB), streamed in
    * via `toLocalIterator` so no boxed Row array is ever resident. */
  val DefaultMaxLocalEdges: Long = 2000000L

  /** MEMORY-SCALED default ceiling for the local tier (verdict-r14
    * item 6): the r14 sf10 finding was a 3.05M-edge entity graph landing
    * JUST over the fixed 2M cap and paying ~6 fixed-overhead Spark jobs
    * per star round on a 48 GB driver that could trivially hold it. The
    * cap now scales with the driver heap: budget 1/8 of max heap at a
    * conservative ~128 B/edge worst case (pow2-unlucky hash table + all
    * arrays), floored at the old 2M (small heaps never regress below the
    * long-validated default) and hard-clamped at 2^29 (the Int-overflow
    * ceiling the distributed path guards anyway). heap/8/128 = heap/1024:
    * an 8 GB driver admits ~8M edges, 48 GB ~47M; the 2^29 clamp only
    * engages past a ~550 GB heap (r15-advice correction of an earlier
    * ~10× doc error). NOTE the tier choice is heap-DEPENDENT, so the
    * star-round-count telemetry BASELINE.md tracks is only comparable
    * across runs at a fixed driver heap — benchmarked paths wanting
    * machine-independent routing pass maxLocalEdges explicitly.
    * A genuinely 100 TB
    * edge set still routes to the Kiveris star rounds — there the rounds
    * are data-dominated, not overhead-dominated, which is why the
    * alternative lever (fusing large/small star into one shuffle) was
    * NOT taken: it buys nothing at scale and complicates the provably
    * convergent alternation precisely at the tier boundary this cap
    * change eliminates. */
  def defaultMaxLocalEdges: Long = {
    val heap = Runtime.getRuntime.maxMemory()
    math.max(DefaultMaxLocalEdges, math.min(1L << 29, heap / 8L / 128L))
  }

  /** [[connectedComponents]] plus the number of star rounds it took to
    * converge — the scale-growth telemetry BASELINE.md tracks (round count,
    * not wall, is what grows if the algorithm degrades with corpus size).
    *
    * TWO-TIER solve (the r11 admitComponents finding, generalized): the
    * star loop pays ~6 Spark jobs per round in fixed overhead, which
    * dominates whenever the dup graph is small relative to the cluster —
    * and most VERIFIED near-dup graphs are tiny next to their corpus (the
    * sf0.1 corpus graph is ~5k edges under a 600k-row table). Under
    * `maxLocalEdges` (and long ids), the symmetrized edge set collects to
    * a driver union-find producing IDENTICAL min-id labels (rounds
    * reported as 0); above it, the Kiveris large-star/small-star rounds
    * run unchanged. Equivalence is spec-pinned (ComponentsScaleSpec /
    * IncrementalComponentsSpec force both paths on the same graphs). */
  def connectedComponentsWithRounds(nodes: DataFrame, pairs: DataFrame,
      maxIter: Int = 30,
      maxLocalEdges: Long = defaultMaxLocalEdges): (DataFrame, Int) = {
    import org.apache.spark.sql.types.LongType
    val sym = pairs.filter(col("doc_a") =!= col("doc_b"))
      .select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    var e = checkpointFresh(sym.distinct())

    val idsAreLong = e.schema.fields.forall(_.dataType == LongType)
    val edgeCount = e.count()
    // Local-tier ceiling is hard-clamped to 2^29 regardless of the caller's
    // maxLocalEdges: above it `Integer.highestOneBit(n) * 4` overflows Int
    // and the open-addressing table would degrade to a 4-slot spin (r12
    // advice item), and a >2^29-edge collect has no business on a driver
    // anyway — oversized graphs route to the distributed star rounds.
    val localCeiling = math.min(maxLocalEdges, 1L << 29)
    if (idsAreLong && edgeCount <= localCeiling) {
      // All-primitive union-find: the symmetrized edge list streams into
      // two Array[Long]s (toLocalIterator — one partition of Rows resident
      // at a time, never a 2M-Row collect), ids are dense-indexed through
      // an open-addressing long→int table (pow2, load ≤ 0.5), and the
      // union-find itself is an Array[Int] with path compression. ~140 MB
      // peak at the 2M-edge cap vs several hundred MB for the boxed
      // mutable.Map variant this replaced (round-12 advice item).
      val n = edgeCount.toInt
      val srcs = new Array[Long](math.max(1, n))
      val dsts = new Array[Long](math.max(1, n))
      val rowIt = e.toLocalIterator()
      var i = 0
      while (rowIt.hasNext) {
        val r = rowIt.next(); srcs(i) = r.getLong(0); dsts(i) = r.getLong(1)
        i += 1
      }
      // distinct ids ≤ n (each undirected edge contributes 2 endpoints and
      // 2 symmetrized rows), so cap = pow2 ≥ 2n keeps load ≤ 0.5
      val cap = math.max(4, Integer.highestOneBit(math.max(1, n)) * 4)
      val keys = new Array[Long](cap)
      val used = new Array[Boolean](cap)
      val slot = new Array[Int](cap)
      val ids = new Array[Long](math.max(1, n))
      val parent = new Array[Int](math.max(1, n))
      var nIds = 0
      def indexOf(id: Long): Int = {
        // Fibonacci-style multiplicative mix so sequential ids spread
        var h = java.lang.Long.hashCode(id * -7046029254386353131L) & (cap - 1)
        while (used(h) && keys(h) != id) h = (h + 1) & (cap - 1)
        if (used(h)) slot(h)
        else {
          used(h) = true; keys(h) = id; slot(h) = nIds
          ids(nIds) = id; parent(nIds) = nIds; nIds += 1
          slot(h)
        }
      }
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      i = 0
      while (i < n) {
        val ra = find(indexOf(srcs(i)))
        val rb = find(indexOf(dsts(i)))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        i += 1
      }
      val minOfRoot = new Array[Long](math.max(1, nIds))
      java.util.Arrays.fill(minOfRoot, Long.MaxValue)
      i = 0
      while (i < nIds) {
        val r = find(i)
        if (ids(i) < minOfRoot(r)) minOfRoot(r) = ids(i)
        i += 1
      }
      val labels = new Array[Long](math.max(1, nIds))
      i = 0
      while (i < nIds) { labels(i) = minOfRoot(find(i)); i += 1 }
      val spark = pairs.sparkSession
      import spark.implicits._
      // label frame built distributedly from broadcast primitive arrays —
      // no driver-side Seq[(Long, Long)] materialization
      val bcIds = spark.sparkContext.broadcast(java.util.Arrays.copyOf(ids, nIds))
      val bcLbl = spark.sparkContext.broadcast(java.util.Arrays.copyOf(labels, nIds))
      val lblDf = spark.range(nIds.toLong).as[Long]
        .mapPartitions { it =>
          val a = bcIds.value; val l = bcLbl.value
          it.map(j => (a(j.toInt), l(j.toInt)))
        }.toDF("id", "lcomp")
      val out = nodes.select(col("id"))
        .join(broadcast(lblDf), Seq("id"), "left")
        .select(col("id"), coalesce(col("lcomp"), col("id")).as("component"))
      return (out, 0)
    }

    // m(u) = min(N(u) ∪ {u}) per node present in the edge set
    def mins(edges: DataFrame): DataFrame = edges
      .groupBy(col("src")).agg(min(col("dst")).as("mn"))
      .select(col("src"), least(col("mn"), col("src")).as("m"))

    def bidirectional(ab: DataFrame): DataFrame = ab
      .filter(col("a") =!= col("b"))
      .select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()

    def largeStar(edges: DataFrame): DataFrame = bidirectional(
      edges.join(mins(edges), "src")
        .filter(col("dst") > col("src") && col("dst") =!= col("m"))
        .select(col("dst").as("a"), col("m").as("b")))

    def smallStar(edges: DataFrame): DataFrame = {
      val m = mins(edges)
      bidirectional(
        edges.join(m, "src")
          .filter(col("dst") <= col("src") && col("dst") =!= col("m"))
          .select(col("dst").as("a"), col("m").as("b"))
          .unionByName(m.filter(col("src") =!= col("m"))
            .select(col("src").as("a"), col("m").as("b"))))
    }

    // order-free exact-set signature: (row count, xor of row hashes)
    def signature(edges: DataFrame): (Long, Long) = {
      val r = edges.agg(count(lit(1)),
        expr("coalesce(bit_xor(xxhash64(src, dst)), 0L)")).first()
      (r.getLong(0), r.getLong(1))
    }

    var sig = signature(e)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = checkpointFresh(smallStar(checkpointFresh(largeStar(e))))
      val nextSig = signature(next)
      // the signature is only a FAST PRE-CHECK: a (count, xor-of-hash)
      // collision between distinct successive edge sets would otherwise
      // stop the loop early and silently emit wrong labels. Both frames
      // are distinct + checkpointed and their counts match when the sigs
      // do, so one one-sided EXCEPT (empty ⟺ set-equal) settles it
      // exactly — paid at most once per run, on the round that converges.
      converged = nextSig == sig && next.except(e).isEmpty
      sig = nextSig
      e = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter star rounds — " +
          "large-star/small-star needs O(log² n) rounds, so this suggests " +
          "a pathological input; raise maxIter (returning partial labels " +
          "would silently split real components)")
    val labels = e.groupBy(col("src")).agg(min(col("dst")).as("mn"))
      .select(col("src").as("id"), least(col("mn"), col("src")).as("component"))
    val out = nodes.select(col("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
    (out, iter)
  }

  // ------------------------------------------------------------------------
  // Incremental near-dedup against a persisted signature index — the
  // operational 100 TB shape: a new batch is admitted WITHOUT re-LSH-ing the
  // corpus. The index is the (doc_id, band, bucket) output of the signature
  // chain, persisted bucketed on `bucket` so each admission round computes
  // index-side per-bucket stats and joins candidates with ZERO exchange on
  // the index side; only the (small) new batch ever shuffles.
  // ------------------------------------------------------------------------

  /** Aggregated-form signature index rows (doc_id, band, bucket) for a
    * corpus slice — what gets persisted via [[writeSignatureIndex]]. */
  def signatureIndex(docs: DataFrame, textCol: Column, idCol: Column,
      shingleSize: Int = 3, numPerms: Int = 16, rowsPerBand: Int = 4): DataFrame =
    lshBuckets(minhashSignatures(docs, textCol, idCol, shingleSize, numPerms), rowsPerBand)

  /** Projection-form signature entries for a NEW batch: bit-identical rows
    * to [[signatureIndex]] (equivalence spec-checked via the shared
    * [[minhashSignatureArrayOfHashes]]/[[bandBucketArray]] forms) computed
    * with no shuffle at all — the admission path never aggregates the new
    * batch to sign it.
    *
    * Each level (shingle hashes → signature → band buckets) is staged as its
    * OWN projection: `bandBucketArray` references the signature 16× and the
    * signature references the hash array 16×, and CollapseProject keeps
    * non-cheap multiply-referenced projections apart, so staging caps the
    * md5-per-shingle work at once per row instead of 256×. */
  def signatureEntries(docs: DataFrame, textCol: Column, idCol: Column,
      shingleSize: Int = 3, numPerms: Int = 16, rowsPerBand: Int = 4,
      keepSig: Boolean = false): DataFrame =
    docs
      .select(idCol.as("doc_id"), minhashHashes(textCol, shingleSize).as("hs"))
      .select(col("doc_id"), minhashSignatureArrayOfHashes(col("hs"), numPerms).as("sig"))
      .select(col("doc_id") +:
        (if (keepSig) Seq(col("sig")) else Nil) :+
        posexplode(bandBucketArray(col("sig"), rowsPerBand, numPerms))
          .as(Seq("band", "bucket")): _*)

  /** Persist signature entries as a bucketed table (append-able per batch).
    * Bucketing on `bucket` is what lets every later [[incrementalCandidates]]
    * aggregate and join the index co-located — HashPartitioning(bucket)
    * satisfies the (band, bucket) clustering requirement, so the planner
    * inserts no index-side Exchange (asserted in IncrementalDedupSpec).
    * Append ALL new entries after each admission, not just survivors:
    * dropped docs stay in the index as attractors so a later near-dup of a
    * dropped doc is itself dropped, exactly as a from-scratch run over the
    * union would. */
  def writeSignatureIndex(entries: DataFrame, table: String, nBuckets: Int = 64): Unit =
    entries.write.bucketBy(nBuckets, "bucket").sortBy("bucket", "band")
      .mode("append").saveAsTable(table)

  /**
   * Candidate pairs for admitting a new batch against an existing index:
   * all (a < b) sharing a (band, bucket) where AT LEAST ONE side is new.
   * Old-old pairs are excluded — they were adjudicated when the index was
   * built, and their verdicts are already reflected in the surviving corpus.
   *
   * Equivalence contract (spec-checked, and the basis of the
   * `dedup_incremental` oracle): provided (a) new-batch ids are greater than
   * every indexed id — the natural append-only id discipline — and (b) no
   * bucket crosses `maxBucketSize` between batches, the union of
   * historically-emitted pairs and this frame equals [[lshCandidates]] run
   * from scratch on the unioned corpus. A bucket that crosses the cap
   * mid-history degrades per-batch (star around the combined anchor for new
   * members only) — the same recall trade [[lshCandidates]] documents,
   * applied incrementally.
   *
   * Exchange audit (the point of the design): index-side per-bucket stats
   * aggregate WITHOUT an exchange on a bucketed index; the stats join
   * shuffles only the new batch's per-bucket rows; the old×new pair
   * expansion broadcasts the (tiny) per-bucket new-id arrays against one
   * co-located stream of the index. The index is never re-partitioned.
   */
  def incrementalCandidates(index: DataFrame, newEntries: DataFrame,
      maxBucketSize: Int = 1024): DataFrame = {
    // one aggregation of the NEW batch only: per-bucket sorted id array
    val newBy = newEntries.groupBy(col("band"), col("bucket"))
      .agg(sort_array(collect_list(col("doc_id"))).as("new_ds"))
    // index-side per-bucket stats: exchange-free over a bucketed index
    val oldBy = index.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("n_old"), min(col("doc_id")).as("old_anchor"))
    val buckets = newBy.join(oldBy, Seq("band", "bucket"), "left")
      .select(col("band"), col("bucket"), col("new_ds"),
        (coalesce(col("n_old"), lit(0L)) + size(col("new_ds"))).as("bsize"),
        // least() ignores nulls: new-only buckets anchor at the new minimum
        least(col("old_anchor"), element_at(col("new_ds"), 1)).as("anchor"))
    val small = buckets.filter(col("bsize") <= maxBucketSize)
    // new×new clique pairs straight from the arrays — no join at all
    val newNew = small.filter(size(col("new_ds")) > 1)
      .select(explode(pairExpansion("new_ds")).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
    // old×new pairs: ONE co-located pass over the index, new arrays broadcast
    val crossPairs = index
      .join(broadcast(small.select(col("band"), col("bucket"), col("new_ds"))),
        Seq("band", "bucket"))
      .select(col("doc_id").as("a"), explode(col("new_ds")).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("doc_a"),
        greatest(col("a"), col("b")).as("doc_b"))
    // hot buckets: star around the combined anchor, new members only
    val star = buckets.filter(col("bsize") > maxBucketSize)
      .select(col("anchor").as("doc_a"), explode(col("new_ds")).as("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
    newNew.unionByName(crossPairs).unionByName(star).distinct()
  }

  /**
   * Admit a new batch: sign it (zero-shuffle projection), find candidates
   * against the index, verify with exact n-gram Jaccard, and return the new
   * docs that SURVIVE (are not a verified near-dup of any smaller-id doc,
   * indexed or in-batch). `corpus` must contain the text of both the indexed
   * docs and the new batch — verification touches only candidate ids, so at
   * scale this is an equi-join against the corpus-by-id table, not a scan.
   * After admission, append [[signatureEntries]] of the WHOLE batch to the
   * index (see [[writeSignatureIndex]]).
   *
   * The new-batch signature entries fan out into all three branches of
   * [[incrementalCandidates]] (new×new clique, old×new broadcast build, hot
   * stars), so they are `localCheckpoint`ed here — the signing projection
   * (16 minhash folds over the shingle array per row) runs ONCE per batch,
   * not once per branch. That makes this call eager; the materialized frame
   * is O(batch × bands), never corpus-sized. Callers that already hold a
   * materialized corpus [[shingleSets]] frame should pass it as
   * `corpusShingles` so the verify step reuses it instead of re-shingling.
   */
  def incrementalNearDup(newDocs: DataFrame, corpus: DataFrame, index: DataFrame,
      textCol: Column, idCol: Column, threshold: Double = 0.8,
      shingleSize: Int = 3, numPerms: Int = 16, rowsPerBand: Int = 4,
      maxBucketSize: Int = 1024, corpusShingles: Option[DataFrame] = None): DataFrame = {
    val entries = signatureEntries(newDocs, textCol, idCol, shingleSize, numPerms, rowsPerBand)
      .localCheckpoint()
    val cands = incrementalCandidates(index, entries, maxBucketSize)
    val sh = corpusShingles.getOrElse(shingleSets(corpus, textCol, idCol, shingleSize))
    val drops = ngramJaccardOnShingles(cands, sh)
      .filter(col("jaccard") >= threshold)
      .select(col("doc_b").as("doc_id"))
    newDocs.select(idCol.as("doc_id")).join(drops, Seq("doc_id"), "left_anti")
  }

  /**
   * Incremental components admission — the label-side twin of
   * [[incrementalNearDup]]: merge a NEW batch's verified near-dup edges into
   * a PERSISTED component-label artifact without re-running the corpus
   * graph. Production computes components once (the artifact) and admits
   * batches against it; the catalog's honest-recompute rows exist to gate
   * correctness, but this is the shape a 100 TB deployment actually runs.
   *
   * Inputs: `labels` — (id, component) for EVERY already-indexed doc (the
   * persisted artifact; component = min reachable id, the output contract of
   * [[connectedComponents]]); `newIds` — (id) of the batch, all ids greater
   * than every indexed id (the append-only discipline the incremental family
   * documents); `newEdges` — (doc_a, doc_b) verified pairs with at least one
   * new side (what [[incrementalCandidates]] + exact-Jaccard verify emits).
   *
   * Algorithm: CONTRACT old endpoints to their component label, run the star
   * rounds over the contracted graph — whose node set is (batch ∪ touched
   * old labels), i.e. BATCH-sized, never corpus-sized — then push the
   * (tiny) old-label remap back over the artifact with one broadcast join.
   * Exactness: an old label is the min id of its component, so the
   * contracted component's min equals the true min over the merged doc sets
   * (new ids are all greater than old ids but the argument doesn't even
   * need that — min is associative over the partition by old components).
   * Result hash-equals a from-scratch [[connectedComponents]] over the
   * union graph, which is what the `dedup_components_incremental` oracle
   * pins via DuckDB's recursive CTE.
   *
   * Scale shape: corpus-sized work is exactly ONE equi-join of the label
   * artifact against a broadcast remap of merged-label rows (bounded by the
   * number of old components the batch touches). The star rounds, both
   * label-contraction joins, and the distinct all run over batch-sized
   * frames. No LSH, no shingling, no corpus shuffle.
   *
   * Two-tier contracted solve: the contracted edge set is batch-sized BY
   * CONSTRUCTION, and for graphs under `maxLocalEdges` a driver-side
   * union-find (microseconds) beats the distributed star rounds, whose
   * per-round job overhead dominates at batch scale — measured 7.2 s of
   * star rounds vs 5.8 s FULL recompute at 10× before this tier existed
   * (the distributed loop pays ~6 Spark jobs/round regardless of size).
   * Labels are identical either way (min reachable id); graphs over the
   * threshold, or with non-long ids, take the star rounds.
   */
  def admitComponents(labels: DataFrame, newIds: DataFrame,
      newEdges: DataFrame, maxIter: Int = 30,
      maxLocalEdges: Long = DefaultMaxLocalEdges): DataFrame = {
    val lab = labels.select(col("id"), col("component"))
    // contract: old endpoints → their component label; new endpoints pass
    // through (they have no row in the artifact)
    val ea = newEdges
      .join(lab.select(col("id").as("doc_a"), col("component").as("ca")),
        Seq("doc_a"), "left")
      .join(lab.select(col("id").as("doc_b"), col("component").as("cb")),
        Seq("doc_b"), "left")
      .select(coalesce(col("ca"), col("doc_a")).as("doc_a"),
        coalesce(col("cb"), col("doc_b")).as("doc_b"))
      .localCheckpoint()
    val nodes = newIds.select(col("id"))
      .unionByName(ea.select(col("doc_a").as("id")))
      .unionByName(ea.select(col("doc_b").as("id")))
      .distinct()
    val contracted = connectedComponentsWithRounds(
      nodes, ea, maxIter, maxLocalEdges)._1.localCheckpoint()
    // remap rows: old labels whose component changed (merged clusters).
    // Restricting to rows that ARE old labels matters — new-doc rows also
    // have id =!= component and must not leak into the artifact join.
    val oldLabels = lab.select(col("component").as("id")).distinct()
    val remap = contracted.join(oldLabels, Seq("id"), "left_semi")
      .filter(col("id") =!= col("component"))
      .select(col("id").as("component"), col("component").as("component_new"))
    val oldOut = lab.join(broadcast(remap), Seq("component"), "left")
      .select(col("id"),
        coalesce(col("component_new"), col("component")).as("component"))
    val newOut = contracted.join(newIds.select(col("id")), Seq("id"), "left_semi")
      .select(col("id"), col("component"))
    oldOut.unionByName(newOut)
  }

  /** Near-dup detection over SimHash fingerprints for an explicit pair
    * frame: Hamming distance via bit_count(xor). */
  def simhashPairs(pairs: DataFrame, fingerprints: DataFrame,
      maxHamming: Int = 12): DataFrame = {
    val fa = fingerprints.select(col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val fb = fingerprints.select(col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    pairs.join(fa, "doc_a").join(fb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .withColumn("near_dup", (col("hamming") <= maxHamming).cast("int"))
  }

  /**
   * SimHash fingerprint (60-bit, portable): per token-hash bit j, vote
   * +1/-1; fingerprint bit j set iff the vote sum is positive. Returned as a
   * long.
   *
   * Plan shape: one row per (doc, distinct token), ONE aggregation with
   * `bits` vote-sum buffers (each bit's ±1 vote is arithmetic on the token
   * hash), fingerprint assembled from the vote columns in the same
   * projection. The former bit-explode formulation pushed bits× the rows
   * through the partial aggregate — and a second shuffle — for the same
   * result.
   */
  def simhash(docs: DataFrame, textCol: Column, idCol: Column, bits: Int = 60): DataFrame = {
    val votes = (0 until bits).map { j =>
      sum(when(expr(s"shiftright(h, $j)").bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"v$j")
    }
    val fingerprint = (0 until bits)
      .map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(0L))
      .reduce(_ + _)
    // null text tokenizes to null; coalesce to [""] so the doc still gets
    // a fingerprint — the same no-doc-silently-disappears contract the
    // shingle path pins (TextOps.shingles; a null-text doc must surface in
    // pair verdicts, not vanish from the join)
    docs.select(idCol.as("doc_id"),
        explode(coalesce(
          array_distinct(TextOps.tokens(TextOps.normalize(textCol))),
          array(lit("")))).as("token"))
      .select(col("doc_id"), TextOps.portableHash(col("token")).as("h"))
      .groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), fingerprint.as("simhash"))
  }

  /**
   * Semantic dedup (SemDeDup, Abbas et al. 2023 "SemDeDup: Data-efficient
   * learning at web-scale through semantic deduplication"): k-means-cluster
   * the embedding space with the deterministic spherical trainer
   * ([[graft.operators.Similarity.kmeansCentroids]]), compare vectors ONLY
   * within a cluster, and drop every vector whose cosine to a LOWER-id
   * cluster-mate reaches `tau` (keep-first, the house dedup rule). Catches
   * paraphrases and re-encodings that shingle/MinHash dedup cannot see —
   * the semantic layer of the dedup stack (exact → fingerprint → MinHash →
   * SimHash → embedding-LSH → semantic).
   *
   * Scale shape: the cluster assignment is one broadcast pass (no corpus
   * shuffle); the pairwise stage is an EQUI-JOIN on cell_id, so the pair
   * space is Σ(cell size)² — never corpus² — and the assigned frame is
   * localCheckpointed ONCE so both join sides read the materialization
   * instead of re-running assignment (the r6 recompute lesson). At corpus
   * scale, `nCells` is chosen ~ sqrt(N) (the paper's regime) so expected
   * cell size — and with it per-task join fan-out — stays bounded; the
   * per-cell cost model is the same as the LSH bucket join's, with the
   * cluster id as the bucket. A DEGENERATE cell (boilerplate pages, zero
   * vectors collapsing into one cluster) is additionally capped: only each
   * cell's `maxPerCell` lowest-id members act as the LOWER (dropping) side
   * of pairs, bounding the per-cell pair space at maxPerCell · |cell|
   * instead of |cell|² — the same resident-set rule as the streaming
   * admission form and the LSH star fallback. Because rank follows vec_id
   * order, the only pairs lost are overflow-vs-overflow (both ids above
   * the cap), so results are IDENTICAL whenever cells fit the cap.
   *
   * Output: one row per vector — (vec_id, cell_id, cell_cos, sem_keep) with
   * `cell_cos` the how-prototypical score (cosine to the assigned
   * centroid) SemDeDup's keep-rule variants rank on.
   */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
      nCells: Int, trainIters: Int, tau: Double,
      maxPerCell: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cent = Similarity.kmeansCentroids(emb, idCol, vecCol, nCells, trainIters)
    val assigned = Similarity.assignCells(emb, cent, idCol, vecCol)
      .localCheckpoint()
    // cell-size table is nCells rows — broadcast it, and pay the resident
    // rank window ONLY over rows of cells that actually exceed the cap
    // (none, in a healthy corpus: zero overhead on the common path)
    val sizes = assigned.groupBy(col("cell_id")).count()
    val flagged = assigned.join(broadcast(sizes), Seq("cell_id"))
    val aCols = Seq(col("cell_id"), col("vec_id").as("va"),
      col("ve").as("vea"), col("vnorm").as("na"))
    val aSmall = flagged.filter(col("count") <= maxPerCell).select(aCols: _*)
    val aBig = flagged.filter(col("count") > maxPerCell)
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("cell_id")).orderBy(col("vec_id"))))
      .filter(col("crank") <= maxPerCell)
      .select(aCols: _*)
    val a = aSmall.unionByName(aBig)
    val b = assigned.select(col("cell_id"), col("vec_id").as("vb"),
      col("ve").as("veb"), col("vnorm").as("nb"))
    val drops = a.join(b, Seq("cell_id"))
      .filter(col("va") < col("vb"))
      .filter(Similarity.dot(col("vea"), col("veb")) / (col("na") * col("nb"))
        >= tau)
      .select(col("vb").as("vec_id")).distinct()
    assigned.join(drops.withColumn("dup", lit(1)), Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cell_id"), col("cell_cos"),
        when(col("dup").isNotNull, lit(0)).otherwise(lit(1)).as("sem_keep"))
  }

  /**
   * Record-linkage entity matching: multi-pass SEGMENT-PAIR blocking +
   * edit-distance verify — the standard dedup for structured records
   * (customer/author/vendor tables feeding a training corpus) where
   * near-identical rows differ by typos rather than rewordings.
   *
   * Blocking: the caller supplies `pieceCols`, a segmentation of the
   * record's discriminative key (e.g. thirds of an id suffix). Every
   * unordered PAIR of segments becomes one blocking key (tagged with the
   * pair index + `blockCol` attributes): an edit confined to one segment
   * leaves every key built from the other segments intact — the q-gram
   * blocking guarantee, at (pieces choose 2) keys per record instead of an
   * all-pairs scan. Keys shared by more than `maxKeySize` records are
   * DROPPED (the hot-key hygiene of [[TextOps.substringRuns]]'s anchor
   * discipline — a constant segment pair must not re-create the quadratic
   * block it exists to avoid); the resulting recall trade is deterministic
   * and replayed by the oracle.
   *
   * Verify: surviving candidate pairs (equi-join on key, id_a < id_b,
   * distinct) score exact `levenshtein(name_a, name_b)` — identical DP
   * edit distance in Spark and DuckDB, a new cross-engine primitive for
   * the catalog. Output: (id_a, id_b, lev, is_match at `maxDist`).
   *
   * Scale shape: keys explode to |pieces choose 2| rows per record (one
   * map-side projection), the hot-key count is one window over the key
   * exchange, candidates are an equi-join bounded by Σ|key|² with
   * |key| ≤ maxKeySize, and levenshtein runs on candidates only — never
   * on the cross product.
   */
  def entityMatch(df: DataFrame, idCol: Column, nameCol: Column,
      blockCol: Column, pieceCols: Seq[Column], maxDist: Int = 2,
      maxKeySize: Int = 64): DataFrame = {
    val kept = entityBlockingIndex(df, idCol, nameCol, blockCol, pieceCols,
      maxKeySize)
    val a = kept.select(col("key"), col("id").as("id_a"), col("name").as("name_a"))
    val b = kept.select(col("key"), col("id").as("id_b"), col("name").as("name_b"))
    a.join(b, "key")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("name_a"), col("id_b"), col("name_b"))
      .distinct()
      .withColumn("lev", levenshtein(col("name_a"), col("name_b")))
      .select(col("id_a"), col("id_b"), col("lev"),
        (col("lev") <= maxDist).cast("int").as("is_match"))
  }

  /** Blocking keys for the [[entityMatch]] family: one row per unordered
    * segment-pair slot, `(id, name, key)`. NULL-PROPAGATING key build
    * (concat, not concat_ws): a record with a null blocking attribute or
    * null segment gets a null key for that slot and is dropped —
    * concat_ws would silently collapse it into a shorter key that can
    * collide across slots, and a SQL twin's `||` null semantics would
    * diverge (r13 advice).
    *
    * DELIMITER CONTRACT (r14 advice): slot fields compose with literal
    * '|' separators, UNESCAPED. Callers whose blocking attribute or
    * segments can themselves contain '|' must escape or strip it first —
    * otherwise ("a|b", "c") and ("a", "b|c") collide into one key
    * (over-blocking only: the levenshtein verify still decides matches,
    * but a hot collided key can blow the candidate space). The catalog's
    * inputs (nationkey:mktsegment blocks, name word-segments) are
    * '|'-free by construction. */
  def entityKeys(df: DataFrame, idCol: Column, nameCol: Column,
      blockCol: Column, pieceCols: Seq[Column]): DataFrame = {
    require(pieceCols.size >= 2, "need at least two segments to pair")
    val pieces = pieceCols.zipWithIndex.map { case (c, i) => c.as(s"t$i") }
    val base = df.select(
      (Seq(idCol.as("id"), nameCol.as("name"), blockCol.as("blk")) ++ pieces): _*)
    (for {
      i <- pieceCols.indices; j <- pieceCols.indices if i < j
    } yield base.select(col("id"), col("name"),
        concat(col("blk"), lit(s"|$i$j|"), col(s"t$i"), lit("|"), col(s"t$j"))
          .as("key")))
      .reduce(_.unionAll(_))
      .filter(col("key").isNotNull)
  }

  /** The persistable half of [[entityMatch]]: the base corpus's blocking
    * keys with the hot-key hygiene applied (`key` groups larger than
    * `maxKeySize` dropped). Write this once per master-corpus snapshot and
    * every later match — batch [[entityMatchAgainst]] or the streaming
    * stream-static join — is an equi-join against it, never a rescan of
    * the master. Output: (key, id, name). */
  def entityBlockingIndex(df: DataFrame, idCol: Column, nameCol: Column,
      blockCol: Column, pieceCols: Seq[Column],
      maxKeySize: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    entityKeys(df, idCol, nameCol, blockCol, pieceCols)
      .withColumn("ksize", count(lit(1)).over(Window.partitionBy(col("key"))))
      .filter(col("ksize") <= maxKeySize)
      .select(col("key"), col("id"), col("name"))
  }

  /** The entity-RESOLUTION chain: [[entityMatch]] pairs at `maxDist` →
    * transitive components over the match edges ([[connectedComponents]];
    * matches chain, so an entity is the closure, not a pair list).
    * Output: (id, entity_id) — the label mapping a golden-record election
    * or the Artifacts layer consumes. ONE definition shared by the
    * in-query training row and the persisted-artifact builder (r14
    * self-review find: the chain had been written twice). */
  def entityResolve(df: DataFrame, idCol: Column, nameCol: Column,
      blockCol: Column, pieceCols: Seq[Column], maxDist: Int = 2,
      maxKeySize: Int = 64): DataFrame = {
    val pairs = entityMatch(df, idCol, nameCol, blockCol, pieceCols,
        maxDist, maxKeySize)
      .filter(col("is_match") === 1)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    connectedComponents(df.select(idCol.as("id")), pairs)
      .select(col("id"), col("component").as("entity_id"))
  }

  /** New-records-vs-master matching (the CDC record-linkage shape):
    * arriving records' blocking keys equi-join the persisted
    * [[entityBlockingIndex]], candidate pairs dedup across slots, exact
    * `levenshtein` verifies. Hot-key hygiene lives in the INDEX (a slot
    * saturated in the master stays dropped); arrivals are assumed
    * individually narrow. Output: (base_id, new_id, lev, is_match).
    * Scale shape: the index is the only shuffled corpus-sized object, the
    * join is key-bounded, arrivals cost O(slots) rows each — ingest-cost
    * matching, the entity twin of [[incrementalNearDup]]. */
  def entityMatchAgainst(index: DataFrame, arrivals: DataFrame,
      idCol: Column, nameCol: Column, blockCol: Column,
      pieceCols: Seq[Column], maxDist: Int = 2): DataFrame = {
    val akeys = entityKeys(arrivals, idCol, nameCol, blockCol, pieceCols)
      .select(col("key"), col("id").as("new_id"), col("name").as("new_name"))
    index
      .select(col("key"), col("id").as("base_id"), col("name").as("base_name"))
      .join(akeys, "key")
      .filter(col("base_id") =!= col("new_id"))
      .select(col("base_id"), col("base_name"), col("new_id"), col("new_name"))
      .distinct()
      .withColumn("lev", levenshtein(col("base_name"), col("new_name")))
      .select(col("base_id"), col("new_id"), col("lev"),
        (col("lev") <= maxDist).cast("int").as("is_match"))
  }
}
