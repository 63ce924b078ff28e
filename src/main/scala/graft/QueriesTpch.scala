package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import Queries._

/** TPC-H-style relational surface — one slice of the driver-facing catalog, mechanically moved out
  * of Queries.scala in the round-15 maintainability split (verdict-r14
  * item 8). Rows are UNCHANGED; shared helpers and the cross-engine
  * determinism conventions live in [[Queries]]; the one `queries` map is
  * composed there. */
object QueriesTpch {
  private[graft] def rows
      : Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // ==========================================================================
    // TPC-H-style relational surface (joins / sort / top-k / grouped aggs)
    // ==========================================================================

    ("tpch_q1",
      (s: SparkSession, d: String) =>
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sumDec(col("l_quantity")).as("sum_qty"),
            sumDec(col("l_extendedprice")).as("sum_base_price"),
            sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
            sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("sum_charge"),
            count(lit(1)).as("count_order"))
          .withColumn("avg_qty", col("sum_qty") / col("count_order"))
          .withColumn("avg_price", col("sum_base_price") / col("count_order")),
      Some(
        """SELECT l_returnflag, l_linestatus,
          |       cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS sum_qty,
          |       cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) AS sum_base_price,
          |       cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS double) AS sum_disc_price,
          |       cast(sum(cast(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS decimal(18,6))) AS double) AS sum_charge,
          |       count(*) AS count_order,
          |       cast(sum(cast(l_quantity AS decimal(18,2))) AS double) / count(*) AS avg_qty,
          |       cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) / count(*) AS avg_price
          |FROM lineitem
          |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
          |GROUP BY 1, 2""".stripMargin)),

    ("tpch_q3_topk",
      (s: SparkSession, d: String) => {
        val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(s, d).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val l = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), ntz(col("o_orderdate")).as("o_orderdate"), col("o_orderpriority"))
          .agg(sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(
        """SELECT l_orderkey, o_orderdate, o_orderpriority,
          |       cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS double) AS revenue
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |WHERE c_mktsegment = 'BUILDING'
          |  AND o_orderdate < TIMESTAMP '1998-01-01'
          |  AND l_shipdate > TIMESTAMP '1998-01-01'
          |GROUP BY 1, 2, 3
          |ORDER BY revenue DESC, l_orderkey
          |LIMIT 10""".stripMargin)),

    ("tpch_q5_region_revenue",
      (s: SparkSession, d: String) => {
        val l = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        val su = Tables.supplier(s, d)
        val n = broadcast(Tables.nation(s, d))
        val r = broadcast(Tables.region(s, d))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(su, col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some(
        """SELECT r_name, n_name,
          |       cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS double) AS revenue,
          |       count(*) AS n_items
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY 1, 2""".stripMargin)),

    ("tpch_brand_topk",
      (s: SparkSession, d: String) =>
        Tables.lineitem(s, d)
          .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
            sumDec(col("l_quantity")).as("total_qty"))
          .orderBy(col("revenue").desc, col("p_brand"))
          .limit(5),
      Some(
        """SELECT p_brand,
          |       cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS double) AS revenue,
          |       cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS total_qty
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |GROUP BY 1 ORDER BY revenue DESC, p_brand LIMIT 5""".stripMargin)),

    // Single-scan filter-aggregate (TPC-H Q6 shape — pure pushdown demo).
    ("tpch_q6_revenue",
      (s: SparkSession, d: String) =>
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
            col("l_quantity") < 24)
          .agg(sumDec(col("l_extendedprice") * col("l_discount"), 4).as("revenue"),
            count(lit(1)).as("n_items")),
      Some(
        """SELECT cast(sum(cast(l_extendedprice * l_discount AS decimal(18,4))) AS double) AS revenue,
          |       count(*) AS n_items
          |FROM lineitem
          |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin)),

    // Group-HAVING + join-back (TPC-H Q18 shape): orders whose total
    // lineitem quantity exceeds a threshold.
    ("tpch_q18_big_orders",
      (s: SparkSession, d: String) => {
        val big = Tables.lineitem(s, d).groupBy(col("l_orderkey"))
          .agg(sumDec(col("l_quantity")).as("total_qty"))
          .filter(col("total_qty") > 150)
        Tables.orders(s, d)
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderkey"), ntz(col("o_orderdate")).as("o_orderdate"),
            col("o_totalprice"), col("total_qty"))
      },
      Some(
        """SELECT o_orderkey, o_orderdate, o_totalprice, total_qty
          |FROM orders
          |JOIN (SELECT l_orderkey,
          |             cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS total_qty
          |      FROM lineitem GROUP BY 1
          |      HAVING cast(sum(cast(l_quantity AS decimal(18,2))) AS double) > 150) b
          |  ON o_orderkey = b.l_orderkey""".stripMargin)),

    // Correlated-subquery shape (customers above their nation's average
    // balance) — decorrelated to a window average, the scalable plan.
    ("above_avg_customers",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("c_nationkey"))
        Tables.customer(s, d)
          .withColumn("nation_n", count(lit(1)).over(w))
          .withColumn("nation_avg",
            sum(col("c_acctbal").cast("decimal(18,2)")).over(w).cast("double") / col("nation_n"))
          .filter(col("c_acctbal") > col("nation_avg"))
          .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"), col("nation_avg"))
      },
      Some(
        """WITH a AS (
          |  SELECT c_custkey, c_nationkey, c_acctbal,
          |         cast(sum(cast(c_acctbal AS decimal(18,2))) OVER (PARTITION BY c_nationkey) AS double)
          |           / count(*) OVER (PARTITION BY c_nationkey) AS nation_avg
          |  FROM customer)
          |SELECT c_custkey, c_nationkey, c_acctbal, nation_avg
          |FROM a WHERE c_acctbal > nation_avg""".stripMargin)),

    ("tpch_order_priority",
      (s: SparkSession, d: String) =>
        Tables.orders(s, d).groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            sumDec(col("o_totalprice")).as("total_price"))
          .withColumn("avg_price", col("total_price") / col("n_orders")),
      Some(
        """SELECT o_orderpriority, count(*) AS n_orders,
          |       cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS total_price,
          |       cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) / count(*) AS avg_price
          |FROM orders GROUP BY 1""".stripMargin)),

    // Q4 shape: EXISTS decorrelated to a left-semi join, grouped counts.
    ("tpch_q4_exists",
      (s: SparkSession, d: String) => {
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
        val returned = Tables.lineitem(s, d)
          .filter(col("l_returnflag") === "R").select(col("l_orderkey"))
        o.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
      },
      Some(
        """SELECT o_orderpriority, count(*) AS order_count
          |FROM orders
          |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
          |  AND EXISTS (SELECT 1 FROM lineitem
          |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
          |GROUP BY 1""".stripMargin)),

    // Q7 shape: five-table join with a symmetric two-nation predicate and
    // per-year revenue. Nations broadcast; fact tables shuffle on join keys.
    ("tpch_q7_nation_volume",
      (s: SparkSession, d: String) => {
        val n1 = Tables.nation(s, d)
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, d)
          .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        Tables.lineitem(s, d)
          .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
          .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
          // literal Q7 fixes one nation pair; generalized to every
          // cross-nation pair so the query is populated at all test scales
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
      },
      Some(
        """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          |       year(l_shipdate)::int AS l_year,
          |       cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS double) AS revenue
          |FROM lineitem
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation n1 ON s_nationkey = n1.n_nationkey
          |JOIN nation n2 ON c_nationkey = n2.n_nationkey
          |WHERE n1.n_name != n2.n_name
          |GROUP BY 1, 2, 3""".stripMargin)),

    // Q16 shape: distinct-aggregate (supplier variety per brand/type) — the
    // two-phase expand plan Catalyst builds for COUNT(DISTINCT).
    ("tpch_q16_supplier_variety",
      (s: SparkSession, d: String) =>
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
          .filter(col("p_size") <= 10)
          .groupBy(col("p_brand"), col("p_type"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt")),
      Some(
        """SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |WHERE p_size <= 10
          |GROUP BY 1, 2""".stripMargin)),

    // Q19 shape: disjunction of conjunctive range predicates across the join
    // — exercises OR-predicate pushdown and join-then-filter planning.
    ("tpch_q19_disjunctive",
      (s: SparkSession, d: String) =>
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_size").between(1, 15) && col("l_quantity").between(20, 30)))
          .agg(sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
            count(lit(1)).as("n_items")),
      Some(
        """SELECT cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS double) AS revenue,
          |       count(*) AS n_items
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
          |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
          |   OR (p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    // Q15 shape: scalar-subquery max with join-back — the top-revenue
    // supplier(s). Exercises Catalyst's scalar-subquery planning.
    ("tpch_q15_top_supplier",
      (s: SparkSession, d: String) => {
        val rev = Tables.lineitem(s, d).groupBy(col("l_suppkey"))
          .agg(sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
            .as("total_revenue"))
        val best = rev.agg(max(col("total_revenue")).as("best"))
        Tables.supplier(s, d)
          .join(rev, col("s_suppkey") === col("l_suppkey"))
          .join(broadcast(best), col("total_revenue") === col("best"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      },
      Some(
        """WITH rev AS (
          |  SELECT l_suppkey,
          |         cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS double)
          |           AS total_revenue
          |  FROM lineitem GROUP BY 1)
          |SELECT s_suppkey, s_name, total_revenue
          |FROM supplier JOIN rev ON s_suppkey = l_suppkey
          |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""".stripMargin)),

    // Q8 shape: national market share — conditional revenue share per year
    // across a six-table join. Dims broadcast; the two fact joins shuffle on
    // their keys; numerator and denominator are both exact decimal sums so
    // the ratio is order-independent.
    ("tpch_q8_market_share",
      (s: SparkSession, d: String) => {
        val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")
        val n1 = Tables.nation(s, d)
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, d)
          .select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
        val r = Tables.region(s, d).filter(col("r_name") === "EUROPE")
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d).filter(col("p_type") === "PROMO")
            .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
          .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
          .join(broadcast(r), col("c_rk") === col("r_regionkey"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            sum(when(col("supp_nation") === "NATION_3", rev)
              .otherwise(lit(0).cast("decimal(18,4)"))).cast("double").as("nation_revenue"),
            sum(rev).cast("double").as("total_revenue"))
          .withColumn("mkt_share", col("nation_revenue") / col("total_revenue"))
      },
      Some(
        """WITH j AS (
          |  SELECT year(o_orderdate)::int AS o_year,
          |         cast(sum(CASE WHEN n1.n_name = 'NATION_3'
          |                       THEN cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))
          |                       ELSE cast(0 AS decimal(18,4)) END) AS double) AS nation_revenue,
          |         cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS double) AS total_revenue
          |  FROM lineitem
          |  JOIN part ON l_partkey = p_partkey
          |  JOIN orders ON l_orderkey = o_orderkey
          |  JOIN customer ON o_custkey = c_custkey
          |  JOIN supplier ON l_suppkey = s_suppkey
          |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
          |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
          |  JOIN region ON n2.n_regionkey = r_regionkey
          |  WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
          |  GROUP BY 1)
          |SELECT o_year, nation_revenue, total_revenue,
          |       nation_revenue / total_revenue AS mkt_share
          |FROM j""".stripMargin)),

    // Q10 shape: returned-item reporting — top-20 customers by revenue lost
    // to returns in a half-year window. Grouped on the full customer tuple
    // (all functionally dependent on c_custkey), top-k with a unique
    // tie-break, nation broadcast.
    ("tpch_q10_returned_items",
      (s: SparkSession, d: String) => {
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
        Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
          .agg(sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some(
        """SELECT c_custkey, c_name, c_acctbal, n_name,
          |       cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS double) AS revenue
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |WHERE l_returnflag = 'R'
          |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
          |GROUP BY 1, 2, 3, 4
          |ORDER BY revenue DESC, c_custkey
          |LIMIT 20""".stripMargin)),

    // Q2 shape (adapted: lineitem price stands in for the absent partsupp
    // supplycost): per ECONOMY part, the EUROPE supplier(s) achieving the
    // minimum observed price — the correlated-min-over-a-4-way-join plan.
    // Spark side decorrelates to a window min over the ONE joined frame
    // (partition = part key, small groups) instead of the aggregate +
    // join-back, which would recompute the join on both sides; the oracle
    // keeps the genuinely correlated subquery. min() of doubles picks an
    // existing value (no arithmetic) so equality is engine-exact; DISTINCT
    // collapses repeat (part, supplier) trades at the min price, mirroring
    // partsupp's uniqueness.
    ("tpch_q2_min_cost_supplier",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val joined = Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d).filter(col("p_type") === "ECONOMY")
            .select(col("p_partkey"), col("p_name"))),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(Tables.supplier(s, d)),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
        joined
          .withColumn("min_price",
            min(col("l_extendedprice")).over(Window.partitionBy(col("p_partkey"))))
          .filter(col("l_extendedprice") === col("min_price"))
          .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
            col("n_name"), col("s_acctbal"), col("min_price"))
          .distinct()
          .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
            col("p_partkey"), col("s_suppkey"))
          .limit(100)
      },
      Some(
        """SELECT DISTINCT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, n.n_name,
          |       s.s_acctbal, l.l_extendedprice AS min_price
          |FROM lineitem l
          |JOIN part p ON l.l_partkey = p.p_partkey
          |JOIN supplier s ON l.l_suppkey = s.s_suppkey
          |JOIN nation n ON s.s_nationkey = n.n_nationkey
          |JOIN region r ON n.n_regionkey = r.r_regionkey
          |WHERE p.p_type = 'ECONOMY' AND r.r_name = 'EUROPE'
          |  AND l.l_extendedprice = (
          |    SELECT min(l2.l_extendedprice)
          |    FROM lineitem l2
          |    JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
          |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
          |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
          |    WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
          |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
          |LIMIT 100""".stripMargin)),

    // Q9 shape (adapted: p_retailprice × quantity stands in for the absent
    // partsupp supplycost): profit by supplier nation × order year over the
    // 5-way lineitem ⋈ part ⋈ supplier ⋈ orders ⋈ nation join — the
    // multi-way rollup plan. All three dims broadcast; orders is the only
    // shuffled join side. The profit expression is three IEEE double ops
    // (bit-identical cross-engine) quantized to decimal(18,4) before the
    // order-sensitive sum.
    ("tpch_q9_profit_rollup",
      (s: SparkSession, d: String) => {
        val amount = (col("l_extendedprice") * (lit(1) - col("l_discount")) -
          col("p_retailprice") * col("l_quantity")).cast("decimal(18,4)")
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d).filter(col("p_name").like("%widget%"))
            .select(col("p_partkey"), col("p_retailprice"))),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(Tables.supplier(s, d)
            .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
          .agg(sum(amount).cast("double").as("sum_profit"))
      },
      Some(
        """SELECT n_name, year(o_orderdate)::int AS o_year,
          |       cast(sum(cast(l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity
          |                     AS decimal(18,4))) AS double) AS sum_profit
          |FROM lineitem
          |JOIN part ON l_partkey = p_partkey
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN orders ON l_orderkey = o_orderkey
          |WHERE p_name LIKE '%widget%'
          |GROUP BY 1, 2""".stripMargin)),

    // Q11 shape (adapted: shipped value per part for one region's suppliers
    // stands in for partsupp stock value): parts whose value exceeds 2× the
    // average part value — the HAVING-over-a-global-scalar plan. Both
    // scalars (total value, part count) ride ONE 1-row broadcast (nested
    // loop by construction, bounded — exempted in PlanAuditSpec, the q22
    // precedent); the threshold compare is integer-scaled decimal×count so
    // no division ever happens — exact in both engines.
    ("tpch_q11_important_parts",
      (s: SparkSession, d: String) => {
        val base = Tables.lineitem(s, d)
          .join(broadcast(Tables.supplier(s, d)
            .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("l_partkey"),
            (col("l_extendedprice") * col("l_quantity")).cast("decimal(18,4)").as("v"))
        val scalars = base.agg(sum(col("v")).as("total"),
          countDistinct(col("l_partkey")).as("nparts"))
        base.groupBy(col("l_partkey")).agg(sum(col("v")).as("value_dec"))
          .crossJoin(broadcast(scalars))
          .filter(col("value_dec") * col("nparts") > col("total") * 2)
          .select(col("l_partkey"), col("value_dec").cast("double").as("part_value"))
      },
      Some(
        """WITH base AS (
          |  SELECT l_partkey, cast(l_extendedprice * l_quantity AS decimal(18,4)) AS v
          |  FROM lineitem
          |  JOIN supplier ON l_suppkey = s_suppkey
          |  JOIN nation ON s_nationkey = n_nationkey
          |  JOIN region ON n_regionkey = r_regionkey
          |  WHERE r_name = 'ASIA'),
          |tot AS (SELECT sum(v) AS total, count(DISTINCT l_partkey) AS nparts FROM base)
          |SELECT l_partkey, cast(sum(v) AS double) AS part_value
          |FROM base, tot
          |GROUP BY l_partkey, total, nparts
          |HAVING sum(v) * nparts > total * 2""".stripMargin)),

    // Q12 shape (adapted: testdata has no l_shipmode/commitdate): per return
    // flag, high- vs low-priority line counts for a ship-year — the
    // conditional-count-over-join plan, exact long sums.
    ("tpch_q12_priority_by_flag",
      (s: SparkSession, d: String) =>
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_returnflag"))
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("high_line_count"),
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
              .otherwise(1L)).as("low_line_count")),
      Some(
        """SELECT l_returnflag,
          |       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::bigint AS high_line_count,
          |       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)::bigint AS low_line_count
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          |GROUP BY 1""".stripMargin)),

    // Q13 as-named (adapted: testdata has no o_comment; the NOT-LIKE filter
    // rides o_orderpriority instead). `orders_per_customer_histogram` covers
    // the unfiltered distribution; what full Q13 adds is the right side
    // filtered IN THE ON CLAUSE of the LEFT OUTER join — the predicate must
    // stay inside the join (a post-join WHERE would drop the no-order
    // customers whose count should be 0), so Catalyst pushes it to the
    // orders scan but NOT past the outer join's null-extension. At scale:
    // the join shuffles on custkey (both sides large, no broadcast); the
    // distribution agg's domain is tiny, fully map-side-combinable.
    ("tpch_q13_custdist",
      (s: SparkSession, d: String) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        c.join(o,
            c("c_custkey") === o("o_custkey") &&
              !o("o_orderpriority").like("%URGENT%"),
            "left_outer")
          .groupBy(c("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
      },
      Some(
        """SELECT c_count, count(*)::bigint AS custdist
          |FROM (SELECT c.c_custkey, count(o.o_orderkey)::bigint AS c_count
          |      FROM customer c LEFT OUTER JOIN orders o
          |        ON c.c_custkey = o.o_custkey
          |       AND o.o_orderpriority NOT LIKE '%URGENT%'
          |      GROUP BY c.c_custkey) c_orders
          |GROUP BY c_count""".stripMargin)),

    // Q14 shape: promotion-revenue share for a quarter — conditional share
    // over a broadcast part join, single final row.
    ("tpch_q14_promo_share",
      (s: SparkSession, d: String) => {
        val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
          .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_type"))),
            col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type") === "PROMO", rev)
              .otherwise(lit(0).cast("decimal(18,4)"))).cast("double").as("promo_revenue"),
            sum(rev).cast("double").as("total_revenue"))
          .withColumn("promo_share", lit(100.0) * col("promo_revenue") / col("total_revenue"))
      },
      Some(
        """WITH j AS (
          |  SELECT cast(sum(CASE WHEN p_type = 'PROMO'
          |                       THEN cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))
          |                       ELSE cast(0 AS decimal(18,4)) END) AS double) AS promo_revenue,
          |         cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))) AS double) AS total_revenue
          |  FROM lineitem JOIN part ON l_partkey = p_partkey
          |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01')
          |SELECT promo_revenue, total_revenue,
          |       100.0 * promo_revenue / total_revenue AS promo_share
          |FROM j""".stripMargin)),

    // Q17 shape: small-quantity-order revenue — the correlated per-part
    // average decorrelated to a grouped aggregate joined back on the part
    // key (shuffle on l_partkey, no window). avg = exact-sum / count so both
    // engines derive the identical threshold double.
    ("tpch_q17_small_qty",
      (s: SparkSession, d: String) => {
        val partAvg = Tables.lineitem(s, d)
          .groupBy(col("l_partkey").as("pk"))
          .agg((sumDec(col("l_quantity")) / count(lit(1))).as("avg_qty"))
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d).filter(col("p_brand") === "Brand#1")
            .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
          .join(partAvg, col("l_partkey") === col("pk"))
          .filter(col("l_quantity") < col("avg_qty") * 0.5)
          .agg(sumDec(col("l_extendedprice")).as("total_price"),
            count(lit(1)).as("n_items"))
      },
      Some(
        """WITH pa AS (
          |  SELECT l_partkey AS pk,
          |         cast(sum(cast(l_quantity AS decimal(18,2))) AS double) / count(*) AS avg_qty
          |  FROM lineitem GROUP BY 1)
          |SELECT cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) AS total_price,
          |       count(*) AS n_items
          |FROM lineitem
          |JOIN part ON l_partkey = p_partkey
          |JOIN pa ON l_partkey = pk
          |WHERE p_brand = 'Brand#1' AND l_quantity < avg_qty * 0.5""".stripMargin)),

    // Q20 shape (adapted: shipped quantity stands in for partsupp
    // availability): the nested semi-join chain — suppliers who moved more
    // than a threshold of PROMO-part quantity in 1997. The qualifying-key
    // set is an aggregate, then a left-semi prune of the dimension.
    ("tpch_q20_semi_chain",
      (s: SparkSession, d: String) => {
        val qualifying = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .join(broadcast(Tables.part(s, d).filter(col("p_type") === "PROMO")
            .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_suppkey"))
          .agg(sumDec(col("l_quantity")).as("qty"))
          .filter(col("qty") > 350)
          .select(col("l_suppkey"))
        Tables.supplier(s, d)
          .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
      },
      Some(
        """SELECT s_suppkey, s_name, n_name
          |FROM supplier JOIN nation ON s_nationkey = n_nationkey
          |WHERE s_suppkey IN (
          |  SELECT l_suppkey
          |  FROM lineitem JOIN part ON l_partkey = p_partkey
          |  WHERE p_type = 'PROMO'
          |    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          |  GROUP BY 1
          |  HAVING cast(sum(cast(l_quantity AS decimal(18,2))) AS double) > 350)""".stripMargin)),

    // Q21 shape (adapted: return flag stands in for the commit/receipt-date
    // lateness predicate, absent from the testdata): suppliers who were the
    // ONLY supplier with a returned line in a finished multi-supplier order.
    // EXISTS → left-semi and NOT EXISTS → left-anti, both equi-joined on the
    // order key with a residual supplier-inequality filter, multiplicity of
    // the probe side preserved — the reference plan for nested EXISTS pairs.
    ("tpch_q21_sole_returner",
      (s: SparkSession, d: String) => {
        val l1 = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_suppkey"))
        val l2 = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
        val l3 = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
        val f = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"))
        l1.join(f, col("l_orderkey") === col("o_orderkey"))
          .join(l2, col("l_orderkey") === col("ok2") && col("l_suppkey") =!= col("sk2"),
            "left_semi")
          .join(l3, col("l_orderkey") === col("ok3") && col("l_suppkey") =!= col("sk3"),
            "left_anti")
          .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(10)
      },
      Some(
        """SELECT s_name, count(*) AS numwait
          |FROM lineitem l1
          |JOIN orders ON o_orderkey = l1.l_orderkey
          |JOIN supplier ON s_suppkey = l1.l_suppkey
          |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          |  AND EXISTS (SELECT 1 FROM lineitem l2
          |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
          |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          |                    AND l3.l_returnflag = 'R')
          |GROUP BY 1
          |ORDER BY numwait DESC, s_name
          |LIMIT 10""".stripMargin)),

    // Q22 shape (adapted: custkey-mod segments stand in for phone prefixes,
    // and "idle" means no order since a cutoff — every synthetic customer
    // has at least one order all-time): the global scalar average joins in
    // as a 1-row broadcast (nested-loop by construction, bounded — exempted
    // in PlanAuditSpec), then an anti-join against recent orders.
    ("tpch_q22_idle_customers",
      (s: SparkSession, d: String) => {
        val cust = Tables.customer(s, d)
          .withColumn("segment", (col("c_custkey") % 7).cast("int"))
          .filter(col("segment").isin(0, 1, 2))
        val avgBal = cust.filter(col("c_acctbal") > 0)
          .agg((sumDec(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
        val recent = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("2000-08-01").cast("timestamp"))
          .select(col("o_custkey"))
        cust.crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("segment"))
          .agg(count(lit(1)).as("numcust"), sumDec(col("c_acctbal")).as("totacctbal"))
      },
      Some(
        """WITH cust AS (
          |  SELECT c_custkey, c_acctbal, (c_custkey % 7)::int AS segment
          |  FROM customer WHERE (c_custkey % 7) IN (0, 1, 2)),
          |a AS (
          |  SELECT cast(sum(cast(c_acctbal AS decimal(18,2))) AS double) / count(*) AS avg_bal
          |  FROM cust WHERE c_acctbal > 0)
          |SELECT segment, count(*) AS numcust,
          |       cast(sum(cast(c_acctbal AS decimal(18,2))) AS double) AS totacctbal
          |FROM cust, a
          |WHERE c_acctbal > avg_bal
          |  AND NOT EXISTS (SELECT 1 FROM orders
          |                  WHERE o_custkey = c_custkey
          |                    AND o_orderdate >= TIMESTAMP '2000-08-01')
          |GROUP BY 1""".stripMargin)),

    // ---- OVER-window analytic: top-3 orders per customer ------------------
    ("window_rank_orders",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("o_custkey"), col("rnk"), col("o_orderkey"), col("o_totalprice"))
      },
      Some(
        """SELECT o_custkey, cast(rnk AS int) AS rnk, o_orderkey, o_totalprice
          |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
          |             row_number() OVER (PARTITION BY o_custkey
          |                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          |      FROM orders)
          |WHERE rnk <= 3""".stripMargin)),
  )
}
