package graft

/** Catalog-wide partitioning-invariance gate.
  *
  * Every catalog query must produce the IDENTICAL result set (same rows, same
  * values, compared after a canonical sort) at `spark.sql.shuffle.partitions`
  * = 1 and = 32. This is the cheapest catalog-wide amplifier of the DuckDB
  * oracle gate: the oracle runs at one fixed config, so it cannot catch
  * order-dependent aggregation, partition-count-sensitive sampling/hashing,
  * or "works because everything landed in one partition" bugs — exactly the
  * class of defect that surfaces when a query moves from local[32] to a
  * 1000-executor cluster where the partition count is three orders of
  * magnitude higher. Invariance at {1, 32} is the single-machine proxy for
  * that scale-up: a query whose result depends on how its shuffles are cut
  * fails here.
  *
  * Values are compared exactly (no float tolerance): every catalog query is
  * deliberately formulated to be order-independent (integer counts, min/max,
  * portable-hash sampling, commutative HLL register merges), and the DuckDB
  * gate already proves exact agreement across ENGINES — across partition
  * counts within one engine is strictly weaker.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Collect the query's full result under the given shuffle-partition
    * count, canonicalized to a sorted row-string multiset. */
  private def canonical(name: String, partitions: Int): Seq[String] = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, partitions.toString)
    try Queries.queries(name)(spark, sfDir).collect()
      .map(_.toString).toSeq.sorted
    finally spark.conf.set(key, prev)
  }

  Queries.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name: identical results at shuffle.partitions 1 and 32") {
      val at1 = canonical(name, 1)
      val at32 = canonical(name, 32)
      val only1 = at1.diff(at32)
      val only32 = at32.diff(at1)
      assert(only1.isEmpty && only32.isEmpty,
        s"$name diverges across partition counts: ${at1.size} rows @1 vs " +
          s"${at32.size} rows @32; sample only@1=${only1.take(3)} " +
          s"only@32=${only32.take(3)}")
    }
  }
}
