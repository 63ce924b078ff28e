package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder
import graft.functions.GraftFunctions

/**
 * Fixed-size sketch operators — the bounded-state summaries a 100 TB
 * pipeline uses where an exact group-by's key space is the problem, not the
 * row count. Completes the engine's sketch suite (HLL `approx_distinct_*`,
 * Misra-Gries frequent items, Bloom decontamination prefilter, rank
 * histogram percentiles) with two members whose ESTIMATES are themselves
 * deterministic and cross-engine exact — both are pure functions of
 * md5-derived hashes, so DuckDB recomputes the identical sketch and the
 * identical estimate, and the oracle gate applies to the approximation
 * itself (unlike HLL, whose register layout is engine-private):
 *
 *  - Count-Min (Cormode/Muthukrishnan 2005): d×w counters, point-frequency
 *    upper bounds. State through the shuffle is ≤ d·w longs per partition
 *    REGARDLESS of key cardinality — the frequency table for a key domain
 *    that would itself be a 100 TB group-by.
 *  - KMV / bottom-k (Bar-Yossef et al. 2002; Beyer et al. 2007): the k
 *    smallest distinct hash VALUES. Mergeable like HLL but also
 *    comparable — two sketches' value sets support union/intersection
 *    estimates, i.e. a train/test overlap-rate probe that never joins the
 *    underlying corpora.
 *
 * No reference analogue (the reference's only aggregations are windowed
 * count/mean, `FlightEventAggregator.java:219-308`); this is extension
 * surface in the training-data-pipeline direction.
 */
object Sketches {

  /** 2^60 as a double — exact (power of two); the portable-hash value space. */
  private val HashSpace: Double = 1152921504606846976L.toDouble

  // ==========================================================================
  // Count-Min
  // ==========================================================================

  /** Per-depth bucket of `key` under the salted portable hash — row d of the
    * CMS for this key. 60-bit md5-derived hash, non-negative, so `%` and
    * `pmod` agree (DuckDB mirrors with the same `d:key` salt concat). */
  private def cmBucket(key: Column, d: Column, width: Int): Column =
    TextOps.portableHash(key, d) % width

  /**
   * Build a Count-Min sketch over `keyCol` occurrences: one row per
   * (depth, bucket) with the collision-summed count. Each input row fans
   * out to `depth` (bucket) rows in-task, then the partial aggregate
   * combines to ≤ depth·width rows per partition before the single
   * exchange — the sketch, not the data, is what shuffles.
   */
  def countMinSketch(df: DataFrame, keyCol: Column,
      depth: Int = 4, width: Int = 512): DataFrame = {
    require(depth >= 1 && width >= 1, s"need depth,width >= 1, got $depth,$width")
    // (depth, width) ride along as schema metadata on `cnt` so an estimate
    // probe against a mismatched grid fails loudly at plan time instead of
    // silently hashing into the wrong buckets (min(coalesce(cnt,0)) would
    // often read 0 — an undetectable wrong answer).
    val gridMeta = new MetadataBuilder()
      .putLong("cm_depth", depth.toLong).putLong("cm_width", width.toLong)
      .build()
    df.select(keyCol.cast("string").as("k"))
      .select(posexplode(transform(sequence(lit(0), lit(depth - 1)),
        d => cmBucket(col("k"), d, width))).as(Seq("depth", "bucket")))
      .groupBy(col("depth"), col("bucket"))
      .agg(count(lit(1)).as("cnt", gridMeta))
  }

  /**
   * Point-frequency estimates for `keys` (one row per distinct key) against
   * a [[countMinSketch]]: est = min over depths of the key's bucket count —
   * the classic CMS upper bound (never under-counts; over-counts only by
   * collision mass). The sketch side is ≤ depth·width rows and broadcasts;
   * the keys side never shuffles. Buckets no key hashed into during the
   * build read as 0.
   */
  def countMinEstimate(sketch: DataFrame, keys: DataFrame, keyCol: Column,
      depth: Int = 4, width: Int = 512): DataFrame = {
    // Driver-side, zero-execution grid check against the metadata stamped by
    // countMinSketch. A foreign sketch frame without the stamp is trusted
    // (documented caller contract), but a stamped mismatch is a hard error.
    val meta = sketch.schema.fields.find(_.name == "cnt").map(_.metadata)
    meta.filter(m => m.contains("cm_depth") && m.contains("cm_width"))
      .foreach { m =>
        val (sd, sw) = (m.getLong("cm_depth"), m.getLong("cm_width"))
        require(sd == depth && sw == width,
          s"Count-Min grid mismatch: sketch was built with depth=$sd,width=$sw " +
            s"but estimate was asked with depth=$depth,width=$width")
      }
    keys.select(keyCol.as("key")).distinct()
      .select(col("key"), posexplode(transform(sequence(lit(0), lit(depth - 1)),
        d => cmBucket(col("key").cast("string"), d, width))).as(Seq("depth", "bucket")))
      .join(broadcast(sketch), Seq("depth", "bucket"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }

  // ==========================================================================
  // KMV / bottom-k
  // ==========================================================================

  /** KMV distinct estimate from an ascending k-min array: exact size while
    * the sketch is unsaturated (it has seen every distinct hash), else
    * (k-1)·2⁶⁰ / h₍k₎. Both factors are exact doubles ((k-1)·2⁶⁰ is a small
    * int times a power of two) and the division is one IEEE op, so DuckDB's
    * `(k-1)::double * 2^60::double / hk::double` reproduces it bit-for-bit. */
  private def kmvEstimate(kmins: Column, k: Int): Column =
    when(size(kmins) < k, size(kmins).cast("double"))
      .otherwise(lit((k - 1).toDouble * HashSpace) /
        element_at(kmins, k).cast("double"))

  /**
   * Per-group KMV distinct-count estimate over `valueCol`: one partial/final
   * aggregate pair carrying ≤ k longs per (mapper, group), with the
   * estimate — not just the sketch — emitted. `n_kept`/`kth_min` expose the
   * sketch state the estimate derives from (and are what the oracle pins).
   */
  def kmvDistinct(df: DataFrame, groupCol: Column, valueCol: Column,
      k: Int = 64): DataFrame =
    df.select(groupCol.as("grp"),
        TextOps.portableHash(valueCol.cast("string")).as("h"))
      .groupBy(col("grp"))
      .agg(GraftFunctions.kmin_values(col("h"), k).as("kmins"))
      .select(col("grp"),
        size(col("kmins")).as("n_kept"),
        // a group whose values are all null has an EMPTY k-min buffer;
        // element_at index 0 throws, so guard — kth_min reads null there
        // (kmvEstimate is already safe: its size<k branch short-circuits
        // to 0.0 before the element_at is reached)
        when(size(col("kmins")) > 0,
          element_at(col("kmins"), size(col("kmins")))).as("kth_min"),
        kmvEstimate(col("kmins"), k).as("est_distinct"))

  /**
   * KMV set-overlap estimate between the `sideA` and `sideB` partitions of
   * the corpus, over the distinct `valueCol` domain (shingles, tokens, URLs):
   * builds one bottom-k sketch per side (a 2-row aggregate), merges them into
   * the UNION's k-min set, and scales the union estimate by the fraction ρ of
   * union k-mins present in BOTH sides (Beyer et al. 2007's ratio estimator):
   *
   *   n̂_union = (k-1)·2⁶⁰ / h₍k₎(A∪B);  n̂_inter = ρ·n̂_union;
   *   jaccard ≈ ρ.
   *
   * One row out: the two sketches never exceed k values each, so the
   * combine step is a 1×1-row join of provably-single-row aggregates —
   * the overlap probe costs two corpus scans and O(k) state, vs the exact
   * form's full distinct-domain shuffle + join. `n_common_kmins` (= ρ·k
   * while saturated) is integer-exact; est doubles follow the single-IEEE-op
   * discipline above.
   */
  def kmvOverlap(df: DataFrame, sideA: Column, sideB: Column,
      valueCol: Column, k: Int = 64): DataFrame = {
    val hashed = df.select(sideA.as("in_a"), sideB.as("in_b"),
      TextOps.portableHash(valueCol.cast("string")).as("h"))
    val sketches = hashed.agg(
      GraftFunctions.kmin_values(when(col("in_a"), col("h")), k).as("ka"),
      GraftFunctions.kmin_values(when(col("in_b"), col("h")), k).as("kb"))
    val union = slice(array_sort(array_union(col("ka"), col("kb"))), 1, k)
    sketches.select(col("ka"), col("kb"), union.as("ku"))
      .select(
        size(col("ka")).as("n_a"), size(col("kb")).as("n_b"),
        size(col("ku")).as("n_u"),
        size(filter(col("ku"), h =>
          array_contains(col("ka"), h) && array_contains(col("kb"), h)))
          .as("n_common_kmins"),
        kmvEstimate(col("ka"), k).as("est_distinct_a"),
        kmvEstimate(col("kb"), k).as("est_distinct_b"),
        kmvEstimate(col("ku"), k).as("est_distinct_union"))
      // when() guard: both sides empty ⇒ n_u = 0, and ANSI division by zero
      // throws even for doubles — NULL is the honest no-data estimate
      .withColumn("est_intersection",
        when(col("n_u") > 0,
          col("n_common_kmins").cast("double") / col("n_u").cast("double")
            * col("est_distinct_union")))
  }

  // ==========================================================================
  // Portable HyperLogLog (Flajolet, Fusy, Gandouet, Meunier 2007)
  // ==========================================================================
  //
  // Spark's `approx_count_distinct` is HLL++ with an engine-private register
  // layout — the one catalog row no oracle can gate. This is the same
  // algorithm rebuilt on the 60-bit md5 portable hash so the REGISTERS
  // themselves are a pure cross-engine function of the data: bucket = low p
  // bits, rank ρ = leading-zero count of the remaining (60−p) bits + 1, all
  // exact integer arithmetic (bit-length via base-2 digit count — no
  // float log2 anywhere). DuckDB rebuilds the identical register table and
  // the oracle gates the sketch, the merge, AND the estimate.
  //
  // Scale shape: per (mapper, group) state is ≤ m=2^p small ints — the
  // shuffle carries registers, never the value domain. Merge of two
  // sketches is bucket-wise max (associative/commutative/idempotent), which
  // is what makes the register frame a persistable artifact: yesterday's
  // registers + today's batch admit incrementally, the HLL analogue of the
  // signatureIndex warm path.

  /** alpha_m bias constant (Flajolet et al. 2007, Fig. 3). */
  private def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /**
   * Build the per-group HLL register table over the distinct `valueCol`
   * domain: one row per (group, non-empty bucket) with the max rank.
   * Absent buckets mean register 0 (ranks are ≥ 1 by construction, so the
   * sparse form is lossless). Null values are skipped, matching
   * `count(DISTINCT …)`. `p` rides along as schema metadata so a
   * mismatched estimate/merge fails loudly at plan time (the Count-Min
   * grid-stamp pattern).
   */
  def hllRegisters(df: DataFrame, groupCol: Column, valueCol: Column,
      p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 16, s"need 4 <= p <= 16, got $p")
    val m = 1 << p
    val rankBits = 60 - p
    val pMeta = new MetadataBuilder().putLong("hll_p", p.toLong).build()
    val h = TextOps.portableHash(valueCol.cast("string"))
    df.select(groupCol.as("grp"), h.as("h"))
      .where(col("h").isNotNull)
      // integer split of the 60-bit hash: low p bits -> bucket, high bits
      // -> rank field. shiftright, not `/` (long `/` long is DOUBLE in
      // Spark SQL, and 2^60 exceeds the 53-bit mantissa).
      .select(col("grp"), pmod(col("h"), lit(m.toLong)).as("bucket"),
        shiftright(col("h"), p).as("w"))
      // rho = leading zeros of the rankBits-wide field + 1, via base-2
      // digit count: bitlen(w) = length(conv(w, 10, 2)) for w > 0 —
      // exact integer/string ops in both engines (DuckDB: length(bin(w))).
      .select(col("grp"), col("bucket"),
        when(col("w") === 0L, lit(rankBits + 1).cast("long"))
          .otherwise(lit(rankBits + 1) -
            length(conv(col("w").cast("string"), 10, 2))).as("rho"))
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("rho")).as("register", pMeta))
  }

  /** Read the `hll_p` stamp off a register frame, failing loudly if a
    * stamped value contradicts the caller's `p`. Unstamped frames (e.g.
    * re-read from parquet round-trips that drop metadata) are trusted. */
  private def checkHllP(regs: DataFrame, p: Int, what: String): Unit =
    regs.schema.fields.find(_.name == "register").map(_.metadata)
      .filter(_.contains("hll_p")).foreach { m =>
        val sp = m.getLong("hll_p")
        require(sp == p.toLong,
          s"HLL precision mismatch in $what: registers built with p=$sp, " +
            s"asked with p=$p")
      }

  /**
   * Merge two register tables: bucket-wise max. Associative, commutative,
   * idempotent — registers over A ∪ B equal the merge of registers over A
   * and over B by construction, which the oracle pins by computing the
   * union directly. This is the incremental-admission path: persist
   * yesterday's ≤ m rows per group, merge today's batch, never rescan.
   */
  def hllMerge(a: DataFrame, b: DataFrame, p: Int = 6): DataFrame = {
    checkHllP(a, p, "hllMerge left"); checkHllP(b, p, "hllMerge right")
    val pMeta = new MetadataBuilder().putLong("hll_p", p.toLong).build()
    a.unionByName(b)
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("register")).as("register", pMeta))
  }

  /**
   * The HLL raw estimate per group, exact-arithmetic edition:
   *
   *   Ê = α_m · m² / Σ_j 2^(−r_j)
   *
   * The harmonic denominator is carried as the INTEGER s_num =
   * Σ_j 2^(B − r_j) with B = 60−p+1 (absent buckets contribute 2^B each;
   * max m·2^B ≤ 2^(B+p) < 2^62 — inside long), so the whole estimate is
   * one IEEE division of a plan-time double literal by s_num — the
   * kmvEstimate discipline, bit-equal in DuckDB. `n_zero` (empty-bucket
   * count) is emitted so callers can apply the small-range linear-counting
   * correction (m·ln(m/V) — deliberately NOT computed here: libm log is
   * the one op the cross-engine gate can't pin).
   */
  def hllEstimate(registers: DataFrame, p: Int = 6): DataFrame = {
    checkHllP(registers, p, "hllEstimate")
    val m = 1 << p
    val bTop = 60 - p + 1
    val c = hllAlpha(m) * m.toDouble * m.toDouble * math.pow(2.0, bTop)
    registers
      .groupBy(col("grp"))
      .agg(
        (lit(m.toLong) - count(lit(1))).as("n_zero"),
        sum(expr(s"shiftleft(cast(1 as bigint), cast($bTop - register as int))"))
          .as("s_seen"))
      .select(col("grp"), col("n_zero"),
        (col("s_seen") + col("n_zero") * lit(1L << bTop)).as("s_num"))
      .select(col("grp"), col("n_zero"), col("s_num"),
        (lit(c) / col("s_num").cast("double")).as("est_raw"))
  }

  /** The embedded-literal constant α_m·m²·2^B rendered exactly as DuckDB
    * must re-parse it (Double.toString is shortest-round-trip; DuckDB's
    * literal parse is correctly rounded — same bits). For the oracle SQL. */
  private[graft] def hllConstLiteral(p: Int): String = {
    val m = 1 << p
    java.lang.Double.toString(
      hllAlpha(m) * m.toDouble * m.toDouble * math.pow(2.0, 60 - p + 1))
  }

  /** Linear-counting lookup table m·ln(m/V) for V ∈ [1..m], computed ONCE
    * driver-side. libm `log` is the one op the cross-engine gate can't pin
    * — so neither engine ever calls it at query time: both plans embed this
    * same table as shortest-round-trip double literals (the
    * [[hllConstLiteral]] discipline, vectorized) and select by the integer
    * empty-bucket count. m entries (64 at the default p=6) — a plan-time
    * constant, not data. */
  private[graft] def hllLinearTable(p: Int): Array[Double] = {
    val m = 1 << p
    Array.tabulate(m)(i => m.toDouble * math.log(m.toDouble / (i + 1)))
  }

  /** [[hllLinearTable]] rendered as a DuckDB list literal (1-indexed by
    * n_zero, mirroring Spark's 1-based `element_at`). For the oracle SQL. */
  private[graft] def hllLinearLiteralList(p: Int): String =
    hllLinearTable(p).map(java.lang.Double.toString).mkString("[", ", ", "]")

  /**
   * [[hllEstimate]] plus the standard small-range correction (Flajolet et
   * al. 2007 §4): below 2.5·m the raw harmonic estimate biases high, and
   * when any bucket is still empty (V = n_zero > 0) linear counting
   * m·ln(m/V) is the better estimator — at p=6/m=64 that is every group
   * under ~160 distincts, a regime real corpora (countries, locales,
   * event taxonomies) sit in constantly. `est` is the corrected value;
   * `est_raw`/`n_zero`/`s_num` ride along unchanged so callers can audit
   * which branch fired. No large-range correction: the 60-bit hash space
   * makes collisions negligible below ~2^55 distincts.
   *
   * Cross-engine exactness: the branch condition compares two values that
   * are already bit-identical in both engines (est_raw is one IEEE divide
   * of a shared literal; 2.5·m is exact), and the corrected value is a
   * literal-table lookup by integer index — no runtime transcendental in
   * either plan.
   */
  def hllEstimateCorrected(registers: DataFrame, p: Int = 6): DataFrame = {
    val m = 1 << p
    val tbl = array(hllLinearTable(p).map(lit(_)): _*)
    hllEstimate(registers, p)
      .select(col("grp"), col("n_zero"), col("s_num"), col("est_raw"),
        when(col("n_zero") > 0L && col("est_raw") <= lit(2.5 * m),
          element_at(tbl, col("n_zero").cast("int")))
          .otherwise(col("est_raw")).as("est"))
  }
}
