package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("array_dot computes the dot product (interpreted + codegen paths)") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val got = df.select(GraftFunctions.array_dot(col("a"), col("b"))).as[Double].collect()(0)
    assert(got == 32.0)
  }

  test("array_dot handles nulls and matches the built-in chain bitwise") {
    val df = Seq(
      (Some(Seq(0.1, 0.2, 0.7)), Some(Seq(0.4, 0.5, 0.9))),
      (None, Some(Seq(1.0)))
    ).toDF("a", "b")
    val builtin = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (s, x) => s + x))
      .as[Option[Double]].collect().toSeq
    val native = df.select(GraftFunctions.array_dot(col("a"), col("b")))
      .as[Option[Double]].collect().toSeq
    assert(native == builtin) // incl. bit-exact sum and null propagation
  }

  test("array_dot_long: exact integer dot, null propagation, no int overflow") {
    val df = Seq(
      (Some(Seq(127, -127, 50)), Some(Seq(127, 127, 2))),
      (None, Some(Seq(1)))
    ).toDF("a", "b")
    val got = df.select(GraftFunctions.array_dot_long(col("a"), col("b")))
      .as[Option[Long]].collect().toSeq
    assert(got == Seq(Some(127L * 127 - 127L * 127 + 100L), None))
    // full-range ints: each product overflows int but not the long sum
    val big = Seq((Seq(Int.MaxValue, Int.MaxValue), Seq(2, 2))).toDF("a", "b")
    val s = big.select(GraftFunctions.array_dot_long(col("a"), col("b")))
      .as[Long].collect()(0)
    assert(s == 2L * Int.MaxValue * 2)
  }

  test("array_dot_long matches the aggregate(zip_with) chain on random levels") {
    val rng = new scala.util.Random(11)
    val df = (1 to 50).map(_ =>
      (Seq.fill(16)(rng.nextInt(255) - 127), Seq.fill(16)(rng.nextInt(255) - 127)))
      .toDF("a", "b")
    val builtin = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x * y).cast("long")),
        lit(0L), (s, x) => s + x)).as[Long].collect().toSeq
    val native = df.select(GraftFunctions.array_dot_long(col("a"), col("b")))
      .as[Long].collect().toSeq
    assert(native == builtin)
  }

  test("byte_at: unsigned values, null past the end, matches the conv(hex(substring)) chain") {
    val df = Seq(
      (1L, Array[Byte](0, 1, 127, -128, -1)),   // unsigned: 0,1,127,128,255
      (2L, Array[Byte]()))
      .toDF("id", "bin")
    val probe = df.select(col("id"), explode(sequence(lit(1L), lit(6L))).as("p"),
      col("bin"))
    val native = probe.select(col("id"), col("p"),
        GraftFunctions.byte_at(col("bin"), col("p")).as("v"))
      .as[(Long, Long, Option[Long])].collect().toSet
    val chain = probe.select(col("id"), col("p"),
        conv(hex(col("bin").substr(col("p").cast("int"), lit(1))), 16, 10)
          .cast("long").as("v"))
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(native == chain, s"native $native\nchain $chain")
    assert(native.contains((1L, 5L, Some(255L))) &&
      native.contains((1L, 4L, Some(128L))))
    // past the end and on the empty payload: null, never an error
    assert(native.contains((1L, 6L, None)) && native.contains((2L, 1L, None)))
  }

  test("topk_by keeps the k largest with struct ordering, across partitions") {
    val df = (1L to 1000L).map(i => (i % 7, (i * 37 % 1000).toDouble, i))
      .toDF("key", "value", "id").repartition(8) // force partial/final + serde
    val got = df.groupBy("key")
      .agg(GraftFunctions.topk_by(struct(col("value"), col("id")), 5).as("top"))
      .select(col("key"), explode(col("top")).as("t"))
      .select(col("key"), col("t.value"), col("t.id"))
      .as[(Long, Double, Long)].collect().toSet
    import org.apache.spark.sql.expressions.Window
    val expected = df.withColumn("rn", row_number().over(
        Window.partitionBy(col("key")).orderBy(col("value").desc, col("id").desc)))
      .filter(col("rn") <= 5).select("key", "value", "id")
      .as[(Long, Double, Long)].collect().toSet
    assert(got == expected)
    // descending order within each key's array
    val ordered = df.groupBy("key")
      .agg(GraftFunctions.topk_by(struct(col("value"), col("id")), 5).as("top"))
      .select(col("top.value")).as[Seq[Double]].collect()
    ordered.foreach(vs => assert(vs == vs.sorted.reverse))
    // k larger than the group returns the whole group
    val small = Seq((1L, 2.0, 10L), (1L, 1.0, 11L)).toDF("key", "value", "id")
      .groupBy("key").agg(GraftFunctions.topk_by(struct(col("value"), col("id")), 5).as("top"))
      .select(size(col("top"))).as[Int].collect()(0)
    assert(small == 2)
  }

  test("array_dot and topk_by resolve in plain SQL with GraftExtensions installed") {
    import org.apache.spark.sql.SparkSession
    // build a sibling session over the SAME SparkContext with the extensions
    // applied (clear the cached sessions so getOrCreate actually builds one)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val extSpark = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.plans.GraftExtensions())
        .getOrCreate()
      extSpark.range(0, 10).selectExpr("id % 2 AS k", "cast(id AS double) AS v")
        .createOrReplaceTempView("ext_t")
      val dot = extSpark.sql("SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .collect()(0).getDouble(0)
      assert(dot == 11.0)
      val top = extSpark.sql(
        "SELECT k, topk_by(v, 2) AS top FROM ext_t GROUP BY k ORDER BY k")
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
      assert(top == Map(0L -> Seq(8.0, 6.0), 1L -> Seq(9.0, 7.0)))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("kmin_values and winnow_fingerprints resolve in plain SQL with GraftExtensions") {
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val extSpark = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.plans.GraftExtensions())
        .getOrCreate()
      // kmv: bottom-2 distinct longs of {5,3,3,9,1}
      extSpark.range(0, 5).selectExpr("element_at(array(5L,3L,3L,9L,1L), cast(id AS int) + 1) AS h")
        .createOrReplaceTempView("kmv_t")
      val kmv = extSpark.sql("SELECT kmin_values(h, 2) AS ks FROM kmv_t")
        .collect()(0).getSeq[Long](0).toSeq
      assert(kmv == Seq(1L, 3L))
      // winnow: SQL form matches the Column API form on the same string
      val sql = extSpark.sql(
        "SELECT winnow_fingerprints('abcdefgabcdefg', 3, 4) AS fp")
        .collect()(0).getSeq[Long](0).toSet
      val api = extSpark.range(1)
        .select(graft.functions.GraftFunctions.winnow_fingerprints(
          org.apache.spark.sql.functions.lit("abcdefgabcdefg"), 3, 4).as("fp"))
        .collect()(0).getSeq[Long](0).toSet
      assert(sql == api && sql.nonEmpty)
      // byte_at: SQL form, int position auto-cast, unsigned + null lanes
      val ba = extSpark.sql(
        "SELECT byte_at(X'00FF7F', 2) AS b1, byte_at(X'00FF7F', 9) AS b2")
        .collect()(0)
      assert(ba.getLong(0) == 255L && ba.isNullAt(1))
      // grid_means: SQL form matches the Column API form on a 2×2×1 region
      // (bytes 1,2,3,4 at grid 2 → per-pixel regions, scale 16) + the
      // truncated-payload null lane
      val gmSql = extSpark.sql(
        "SELECT grid_means(X'01020304', 1, 2, 2, 1, 2, 16) AS g, " +
        "grid_means(X'0102', 1, 2, 2, 1, 2, 16) AS t")
        .collect()(0)
      assert(gmSql.getSeq[Any](0) == Seq(16L, 32L, 48L, 64L))
      assert(gmSql.getSeq[Any](1) == Seq(16L, 32L, null, null))
      val gmApi = extSpark.range(1)
        .select(graft.functions.GraftFunctions.grid_means(
          org.apache.spark.sql.functions.lit(Array[Byte](1, 2, 3, 4)),
          org.apache.spark.sql.functions.lit(1L),
          org.apache.spark.sql.functions.lit(2L),
          org.apache.spark.sql.functions.lit(2L),
          org.apache.spark.sql.functions.lit(1L), 2, 16L).as("g"))
        .collect()(0).getSeq[Any](0)
      assert(gmApi == Seq(16L, 32L, 48L, 64L))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
