package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Plane-B queries: the SQL surface the reference's rewritten queries require
  * the engine to execute (SURVEY §2.B) — scans, projections, predicates,
  * multi-way joins, FROM-subqueries, aggregation, limit. Implemented with the
  * DataFrame API (Catalyst-declarative: pushdown, pruning, broadcast for
  * free); oracles are the same semantics in DuckDB SQL.
  */
object SqlSurfaceQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.df(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-shaped flagship aggregate: partial aggregation map-side, one
    // shuffle on the (tiny) group key; exact DECIMAL arithmetic.
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    // predicate mix: =, >, OR, AND, string/decimal literals; pushed to scan
    // TPC-H Q3 (shipping priority), adapted to the testdata schema
    // (o_orderpriority in place of o_shippriority): the canonical
    // 3-table selective join + revenue aggregate + top-N. customer is
    // dimension-sized (broadcasts); the segment filter and both date
    // predicates push into their scans; exact DECIMAL revenue like q1_agg.
    "q3_shipping" -> ((s, dir) => {
      val cutoff = lit("1997-06-01").cast("timestamp")
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < cutoff)
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > cutoff)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    }),
    // TPC-H Q5 shape (local-supplier volume): a 6-table star with the
    // customer-nation == supplier-nation equi-constraint. Dimension chain
    // (region -> nation -> supplier) broadcasts; lineitem shuffles once on
    // orderkey; the decimal-revenue aggregate is exact cross-engine
    "q5_local_supplier" -> ((s, dir) => {
      val lo = lit("1996-01-01").cast("timestamp")
      val hi = lit("1998-01-01").cast("timestamp")
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      val sup = t(s, dir, "supplier")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      val c = t(s, dir, "customer")
      t(s, dir, "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(c, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),
    // TPC-H Q7 shape (volume shipping): the ROLE-PLAYING dimension join —
    // nation joins TWICE under different roles (supplier nation, customer
    // nation) with the symmetric two-country pair filter. Both nation
    // copies broadcast through their parents (supplier tiny -> broadcasts
    // too); lineitem shuffles once on orderkey, then once on custkey for
    // the customer side; the supp/cust nation-pair predicate applies after
    // both roles resolve. Revenue grouped by (supp_nation, cust_nation,
    // ship year), exact DECIMAL.
    "q7_volume_shipping" -> ((s, dir) => {
      val nA = "NATION_3"
      val nB = "NATION_7"
      val pair = t(s, dir, "nation")
        .filter(col("n_name").isin(nA, nB))
      val sup = t(s, dir, "supplier")
        .join(broadcast(pair.select(col("n_nationkey").as("s_nk"),
          col("n_name").as("supp_nation"))), col("s_nationkey") === col("s_nk"))
      val cust = t(s, dir, "customer")
        .join(broadcast(pair.select(col("n_nationkey").as("c_nk"),
          col("n_name").as("cust_nation"))), col("c_nationkey") === col("c_nk"))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === nA && col("cust_nation") === nB) ||
          (col("supp_nation") === nB && col("cust_nation") === nA))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),
    // TPC-H Q10 shape (returned-item reporting): who returned the most
    // revenue this quarter — selective flag + date-range filters at both
    // scans, one orderkey shuffle, one custkey shuffle, nation broadcast,
    // then the classic group-by-customer + global top-20 (TakeOrdered, not
    // a full sort)
    "q10_returned_items" -> ((s, dir) => {
      val lo = lit("1997-01-01").cast("timestamp")
      val hi = lit("1997-04-01").cast("timestamp")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      val n = t(s, dir, "nation")
      t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),
    // TPC-H Q2 shape (min-cost supplier): the CORRELATED SCALAR AGGREGATE
    // subquery — `price = (SELECT min(price) ... WHERE same part)` — the
    // decorrelation pattern (no partsupp in the corpus; part x lineitem
    // carries the identical shape). Written in SQL so Catalyst's
    // RewriteCorrelatedScalarSubquery turns the per-row subquery into ONE
    // partkey-grouped min aggregate joined back (plan-asserted: a naive
    // engine re-runs the inner query per row). Double equality against the
    // min is arithmetic-free, so it's exact cross-engine.
    "q2_min_cost" -> ((s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("part_q2")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q2")
      s.sql("""SELECT p.p_partkey, p.p_name, l.l_suppkey,
              |       CAST(l.l_extendedprice AS DOUBLE) AS min_price
              |FROM part_q2 p JOIN lineitem_q2 l ON p.p_partkey = l.l_partkey
              |WHERE l.l_extendedprice = (
              |  SELECT min(l2.l_extendedprice) FROM lineitem_q2 l2
              |  WHERE l2.l_partkey = p.p_partkey)
              |ORDER BY p.p_partkey, l.l_suppkey""".stripMargin)
    }),
    // TPC-H Q18 shape (large-volume orders): IN + GROUP BY ... HAVING
    // subquery — RewritePredicateSubquery plans it as a left-semi join
    // against the pre-aggregated order totals (plan-asserted), then the
    // outer re-aggregation. Exact DECIMAL quantity sums both times.
    "q18_large_orders" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer_q18")
      t(s, dir, "orders").createOrReplaceTempView("orders_q18")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q18")
      s.sql("""SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
              |       CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
              |FROM customer_q18 c, orders_q18 o, lineitem_q18 l
              |WHERE o.o_orderkey IN (
              |    SELECT l_orderkey FROM lineitem_q18 GROUP BY l_orderkey
              |    HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250)
              |  AND c.c_custkey = o.o_custkey AND o.o_orderkey = l.l_orderkey
              |GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate
              |ORDER BY total_qty DESC, o.o_orderkey LIMIT 100""".stripMargin)
    }),
    // TPC-H Q6 shape (forecast revenue change): the pure selective
    // filter-aggregate — every predicate must reach the parquet scan
    "q6_forecast" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24.0)
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          col("l_discount").cast("decimal(4,2)"))
          .cast("double").as("revenue"))),
    // TPC-H Q4 shape (order priority checking): the correlated EXISTS —
    // RewritePredicateSubquery plans it as a LEFT-SEMI join from the
    // date-filtered orders to lineitem on orderkey (plan-asserted), so the
    // subquery never re-executes per row and only the matching order keys
    // shuffle. (The corpus has no commit/receipt dates; the R-returnflag
    // line stands in as the per-order existence predicate.)
    "q4_order_priority" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_q4")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q4")
      s.sql("""SELECT o.o_orderpriority, count(*) AS order_count
              |FROM orders_q4 o
              |WHERE o.o_orderdate >= CAST('1997-01-01' AS TIMESTAMP)
              |  AND o.o_orderdate < CAST('1997-04-01' AS TIMESTAMP)
              |  AND EXISTS (SELECT 1 FROM lineitem_q4 l
              |              WHERE l.l_orderkey = o.o_orderkey
              |                AND l.l_returnflag = 'R')
              |GROUP BY o.o_orderpriority
              |ORDER BY o.o_orderpriority""".stripMargin)
    }),
    // TPC-H Q16 shape (parts/supplier relationship): COUNT(DISTINCT) over
    // a join PLUS a NOT IN subquery — the null-aware anti-join plan shape
    // (the subquery column is non-null here, so it degenerates to a plain
    // anti join the optimizer can broadcast). The distinct count forces
    // the two-phase partial/final aggregate over (group, suppkey).
    "q16_parts_supplier" -> ((s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("part_q16")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q16")
      t(s, dir, "supplier").createOrReplaceTempView("supplier_q16")
      s.sql("""SELECT p.p_brand, p.p_type, p.p_size,
              |       count(DISTINCT l.l_suppkey) AS supplier_cnt
              |FROM part_q16 p JOIN lineitem_q16 l ON p.p_partkey = l.l_partkey
              |WHERE p.p_brand <> 'Brand#3' AND p.p_size IN (1, 4, 7)
              |  AND l.l_suppkey NOT IN (
              |    SELECT s_suppkey FROM supplier_q16 WHERE s_name LIKE '%7')
              |GROUP BY p.p_brand, p.p_type, p.p_size
              |ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size""".stripMargin)
    }),
    // TPC-H Q21 shape (suppliers who kept orders waiting): the EXISTS +
    // NOT EXISTS pair against the SAME fact table — planned as a left-semi
    // join (another supplier touched the order) chained with a left-ANTI
    // join (no other supplier's line is flagged), both on orderkey; the
    // classic multi-consumer self-reference that a per-row engine executes
    // twice per line. 'R' returnflag stands in for the late-delivery
    // predicate (no receipt/commit dates in the corpus).
    "q21_waiting_suppliers" -> ((s, dir) => {
      t(s, dir, "supplier").createOrReplaceTempView("supplier_q21")
      t(s, dir, "orders").createOrReplaceTempView("orders_q21")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q21")
      s.sql("""SELECT s.s_name, count(*) AS numwait
              |FROM supplier_q21 s
              |JOIN lineitem_q21 l1 ON s.s_suppkey = l1.l_suppkey
              |JOIN orders_q21 o ON o.o_orderkey = l1.l_orderkey
              |WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
              |  AND EXISTS (SELECT 1 FROM lineitem_q21 l2
              |              WHERE l2.l_orderkey = l1.l_orderkey
              |                AND l2.l_suppkey <> l1.l_suppkey)
              |  AND NOT EXISTS (SELECT 1 FROM lineitem_q21 l3
              |                  WHERE l3.l_orderkey = l1.l_orderkey
              |                    AND l3.l_suppkey <> l1.l_suppkey
              |                    AND l3.l_returnflag = 'R')
              |GROUP BY s.s_name
              |ORDER BY numwait DESC, s.s_name LIMIT 100""".stripMargin)
    }),
    // TPC-H Q17 shape (small-quantity-order revenue): the correlated
    // scalar-AGGREGATE subquery — each line compares against a per-part
    // aggregate of the SAME fact table. RewriteCorrelatedScalarSubquery
    // must decorrelate both scalars into partkey-grouped aggregates joined
    // back (plan-asserted: no subquery survives optimization), or a 100 TB
    // fact re-scans per row. The avg threshold is expressed multiplied
    // through (qty * 5 * cnt < sum) so both engines compare EXACT decimals
    // and no FP-boundary row can flip between them.
    "q17_small_qty_revenue" -> ((s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("part_q17")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q17")
      s.sql("""SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
              |             AS DOUBLE) / 7.0, 6) AS avg_yearly
              |FROM lineitem_q17 l JOIN part_q17 p ON p.p_partkey = l.l_partkey
              |WHERE p.p_type = 'ECONOMY'
              |  AND CAST(l.l_quantity AS DECIMAL(18,2)) * 5 *
              |      (SELECT count(*) FROM lineitem_q17 l2
              |       WHERE l2.l_partkey = p.p_partkey)
              |    < (SELECT sum(CAST(l3.l_quantity AS DECIMAL(18,2)))
              |       FROM lineitem_q17 l3 WHERE l3.l_partkey = p.p_partkey)
              |""".stripMargin)
    }),
    // TPC-H Q15 shape (top supplier): an aggregate CTE consumed TWICE —
    // once as the join input, once under an uncorrelated scalar MAX — the
    // run-once-scalar + filter plan (never a re-aggregation per row).
    // DECIMAL revenue end to end, so the max-equality selects the same
    // supplier in both engines bit-exactly.
    "q15_top_supplier" -> ((s, dir) => {
      t(s, dir, "supplier").createOrReplaceTempView("supplier_q15")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q15")
      s.sql("""WITH revenue AS (
              |  SELECT l_suppkey AS supplier_no,
              |         sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
              |             (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS total_revenue
              |  FROM lineitem_q15
              |  WHERE l_shipdate >= CAST('1996-01-01' AS TIMESTAMP)
              |    AND l_shipdate < CAST('1996-04-01' AS TIMESTAMP)
              |  GROUP BY l_suppkey)
              |SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
              |FROM supplier_q15 s JOIN revenue r ON s.s_suppkey = r.supplier_no
              |WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
              |ORDER BY s.s_suppkey""".stripMargin)
    }),
    // TPC-H Q22 shape (global sales opportunity): NOT EXISTS anti join +
    // an uncorrelated scalar AVERAGE threshold. Balances are compared in
    // integer CENTS with integral division for the mean (Spark DIV /
    // DuckDB //), so the above-average cut is bit-deterministic across
    // engines — a double avg would put boundary customers at the mercy of
    // summation order. (c_nationkey stands in for Q22's phone country
    // code; the corpus has no phone column.)
    "q22_sales_opportunity" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer_q22")
      t(s, dir, "orders").createOrReplaceTempView("orders_q22")
      s.sql("""WITH cust AS (
              |  SELECT c_custkey, c_nationkey,
              |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
              |  FROM customer_q22 WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
              |SELECT c.c_nationkey AS cntry, count(*) AS numcust,
              |       CAST(sum(c.cents) AS DOUBLE) / 100.0 AS totacctbal
              |FROM cust c
              |WHERE c.cents > (SELECT sum(cents) DIV count(*) FROM cust
              |                 WHERE cents > 0)
              |  AND NOT EXISTS (SELECT 1 FROM orders_q22 o
              |                  WHERE o.o_custkey = c.c_custkey
              |                    AND o.o_orderpriority = '1-URGENT')
              |GROUP BY c.c_nationkey
              |ORDER BY cntry""".stripMargin)
    }),
    // TPC-H Q13 shape (customer order distribution): LEFT OUTER join with
    // an extra ON-clause predicate (which must stay in the join condition,
    // not become a WHERE that silently turns the join inner) feeding two
    // stacked aggregations — per-customer count including the zero-order
    // customers, then the histogram over counts. Pure integers: exact.
    "q13_customer_distribution" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer_q13")
      t(s, dir, "orders").createOrReplaceTempView("orders_q13")
      s.sql("""SELECT c_count, count(*) AS custdist
              |FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
              |      FROM customer_q13 c LEFT OUTER JOIN orders_q13 o
              |        ON c.c_custkey = o.o_custkey
              |       AND o.o_orderpriority = '1-URGENT'
              |      GROUP BY c.c_custkey) t
              |GROUP BY c_count
              |ORDER BY custdist DESC, c_count DESC""".stripMargin)
    }),
    // TPC-H Q11 shape (important stock): GROUP BY ... HAVING against a
    // GLOBAL scalar over the same aggregate — the run-once scalar pattern
    // again, with the threshold kept in DECIMAL (sum * 0.0005 exact) so the
    // cut is engine-invariant. Supplier filter stands in for the nation
    // scoping.
    "q11_important_stock" -> ((s, dir) => {
      t(s, dir, "supplier").createOrReplaceTempView("supplier_q11")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q11")
      s.sql("""WITH val AS (
              |  SELECT l.l_partkey,
              |         sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS value
              |  FROM lineitem_q11 l JOIN supplier_q11 s ON l.l_suppkey = s.s_suppkey
              |  WHERE s.s_nationkey < 13
              |  GROUP BY l.l_partkey)
              |SELECT l_partkey, CAST(value AS DOUBLE) AS value
              |FROM val
              |WHERE value > (SELECT sum(value) * CAST(0.0005 AS DECIMAL(7,5)) FROM val)
              |ORDER BY value DESC, l_partkey""".stripMargin)
    }),
    // TPC-H Q20 shape (excess inventory suppliers): NESTED IN chains — an
    // IN whose subquery itself contains an IN plus a grouped HAVING —
    // planned as two stacked left-semi joins (plan-asserted), the shape a
    // naive engine executes as nested per-row scans. DECIMAL sum vs an
    // integer threshold: exact.
    "q20_excess_suppliers" -> ((s, dir) => {
      t(s, dir, "supplier").createOrReplaceTempView("supplier_q20")
      t(s, dir, "part").createOrReplaceTempView("part_q20")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q20")
      s.sql("""SELECT s_suppkey, s_name
              |FROM supplier_q20
              |WHERE s_suppkey IN (
              |  SELECT l_suppkey FROM lineitem_q20
              |  WHERE l_partkey IN (SELECT p_partkey FROM part_q20
              |                      WHERE p_type = 'ECONOMY')
              |    AND l_shipdate >= CAST('1996-01-01' AS TIMESTAMP)
              |    AND l_shipdate < CAST('1997-01-01' AS TIMESTAMP)
              |  GROUP BY l_suppkey, l_partkey
              |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 50)
              |ORDER BY s_suppkey""".stripMargin)
    }),
    // TPC-H Q14 shape (promotion effect): the CONDITIONAL-aggregate ratio —
    // 100 * sum(CASE ...) / sum(...) over one date-filtered join; both sums
    // come out of ONE aggregate pass (no second scan), part broadcasts,
    // the date range reaches the lineitem scan. DECIMAL sums, the division
    // in double at the end ('ECONOMY' stands in for the PROMO% class).
    "q14_promo_effect" -> ((s, dir) => {
      val lo = lit("1996-01-01").cast("timestamp")
      val hi = lit("1996-02-01").cast("timestamp")
      val rev = sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) *
          sum(when(col("p_type") === "ECONOMY",
              col("l_extendedprice").cast("decimal(18,2)") *
                (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")))
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
          rev.cast("double")).as("promo_revenue_pct"))
        .select(round(col("promo_revenue_pct"), 6).as("promo_revenue_pct"))
    }),
    // TPC-H Q19 shape (discounted revenue, disjunctive brackets): the OR of
    // three (brand, size-range, quantity-range) conjunct brackets ON TOP of
    // the join — the common-key equi-join must still be EXTRACTED from the
    // disjunction (one hash join + the residual OR filter, never a
    // cartesian), and the shared p_partkey=l_partkey conjunct must not be
    // duplicated per branch. Plan-asserted: broadcast hash join, no
    // BroadcastNestedLoop/CartesianProduct.
    "q19_bracket_revenue" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      val joined = l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      val bracket =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1.0, 20.0)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(5, 20) &&
          col("l_quantity").between(10.0, 30.0)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(10, 30) &&
          col("l_quantity").between(20.0, 40.0))
      joined.filter(bracket)
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("revenue"))
    }),
    // TPC-H Q8 shape (national market share): the DEEPEST join tree in the
    // suite — lineitem at the center of a 6-way star (part, supplier+nation
    // role, orders, customer+nation+region role) with a conditional
    // aggregate ratio per order year. Every dimension chain broadcasts
    // (part filtered tiny, supplier/nation/region tiny); lineitem shuffles
    // once on orderkey to meet orders, once on custkey to meet the
    // region-scoped customers. Both sums (the NATION_5 share and the total)
    // come from ONE aggregate pass; exact DECIMAL sums cast to DOUBLE
    // before the ratio so the division is engine-invariant.
    "q8_market_share" -> ((s, dir) => {
      val vol = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)"))
      val p = t(s, dir, "part").filter(col("p_type") === "STANDARD")
        .select(col("p_partkey"))
      val amerCust = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region").filter(col("r_name") === "AMERICA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val sup = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation").select(col("n_nationkey"),
          col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_nation"))
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      t(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(amerCust, col("o_custkey") === col("c_custkey"))
        .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_5", vol).otherwise(lit(0)))
            .cast("double") /
          sum(vol).cast("double")).as("mkt_share"))
        .orderBy(col("o_year"))
    }),
    // TPC-H Q9 shape (product-type profit): a LIKE-filtered part table
    // DRIVES a 5-way join — the substring filter is pushed to the part
    // scan (StringContains), the surviving slice broadcasts into lineitem,
    // and profit aggregates per (supplier nation, order year). The
    // testdata has no partsupp, so p_retailprice * quantity stands in for
    // the supplycost leg of the profit expression — same cross-table
    // arithmetic shape, exact DECIMAL end to end.
    "q9_product_profit" -> ((s, dir) => {
      val amount = col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")) -
        col("p_retailprice").cast("decimal(18,2)") *
          col("l_quantity").cast("decimal(9,2)")
      val p = t(s, dir, "part").filter(col("p_name").contains("gear"))
        .select(col("p_partkey"), col("p_retailprice"))
      val sup = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      t(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("nation"), year(col("o_orderdate")).cast("int").as("o_year"))
        .agg(sum(amount).cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),
    // TPC-H Q12 shape (shipmode priority counts): a date-BRACKETED
    // fact-fact join (l_shipdate within [o_orderdate, o_orderdate+30d) —
    // the commit/receipt bracket re-expressed on the columns the testdata
    // has) with BOTH CASE-sum counts in one aggregate pass over the join.
    // The equi-join on orderkey is extracted and the bracket rides as the
    // join residual — never a cartesian; the shipdate year range and the
    // returnflag IN (the shipmode stand-in) push to the lineitem scan.
    "q12_shipmode_priority" -> ((s, dir) => {
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "lineitem")
        .filter(col("l_returnflag").isin("A", "N") &&
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") >= col("o_orderdate") &&
            col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy(col("l_returnflag"))
    }),
    // RUNTIME bloom-filter join pruning (InjectRuntimeFilter): the selective
    // orders filter builds a bloom filter over o_orderkey that is pushed
    // into the UNFILTERED lineitem side as a might_contain pre-filter —
    // at 100 TB this is the difference between shuffling the whole fact
    // table and shuffling the ~matching fraction. Default thresholds target
    // cluster sizes (10 GB application side), so the query pins them down
    // for the local corpus; injection is plan-asserted in TpchPlanSpec.
    // localCheckpoint materializes INSIDE the conf scope (optimization
    // happens at execution; a lazy return would re-plan after restore).
    "q_runtime_filter" -> ((s, dir) =>
      graft.SparkUtil.withConfs(s,
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
        "spark.sql.optimizer.runtimeFilter.number.threshold" -> "10",
        // pin the 100 TB regime: there the filtered orders side exceeds any
        // broadcast threshold, so the join shuffles — which is exactly when
        // the bloom filter pays (a broadcast join already prunes at probe)
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        t(s, dir, "lineitem")
          .join(t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
          .orderBy(col("l_returnflag"))
          .localCheckpoint(true)
      }),
    "q_scan_filter" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter((col("l_returnflag") === "R" || col("l_linestatus") === "F") &&
          col("l_quantity") > 30.0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"), col("l_linestatus"))
        // (l_orderkey, l_linenumber) is not unique in the synthetic corpus —
        // sort on the full projection for a deterministic oracle compare
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_linestatus"), col("l_quantity"))
    }),
    // 3-way join: fact-to-dim joins; dims are broadcast (no shuffle of orders)
    "q_join3" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
      val nation = t(s, dir, "nation")
      orders
        .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
        .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("c_name"), col("n_name"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),
    // LEFT JOIN keeping unmatched left rows (null-safe deterministic order)
    "q_left_join" -> ((s, dir) => {
      val customer = t(s, dir, "customer")
      val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
      customer
        .join(bigOrders, customer("c_custkey") === bigOrders("o_custkey"), "left_outer")
        .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)
    }),
    // aggregation over a FROM-subquery (derived table)
    "q_subquery_agg" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
      s.sql(
        """SELECT t.o_orderstatus, count(*) AS cnt,
          |       CAST(sum(CAST(t.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') t
          |GROUP BY t.o_orderstatus ORDER BY t.o_orderstatus""".stripMargin)
    }),
    // time-bucketed aggregation over the events stream table (batch form of
    // the 1-hour tumbling window; same bucketing as the streaming path)
    "q_events_bucket" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(
          timestamp_seconds(floor(unix_timestamp(col("ts")) / 3600) * 3600).as("bucket"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy(col("bucket"), col("event_type"))
    }),
    // semi-structured: JSON props parsed with from_json into a typed struct
    // (schema-on-read; the parse is codegen'd, no UDF)
    "q_events_json" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("k", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum(col("k")).as("k_total"),
          min(col("k")).as("k_min"), max(col("k")).as("k_max"))
        .orderBy(col("event_type"))
    }),
    // top-N with unique tiebreak (LocalLimit pushed below the final sort)
    "q_topn" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy(col("value").desc, col("event_id").asc)
        .limit(100)
    }),
    // window functions: per-nation top-3 customers by exact revenue — one
    // shuffle for the per-customer aggregate, one for the rank partition
    "q_window_rank" -> ((s, dir) => {
      val rev = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("c_nationkey"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
      t(s, dir, "customer")
        .join(rev, col("c_custkey") === col("o_custkey"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("c_nationkey"), col("rk"), col("c_custkey"), col("revenue"))
        .orderBy(col("c_nationkey"), col("rk"))
    }),
    // grouping sets: ROLLUP subtotals + grand total in one pass (partial
    // aggregation still map-side; one shuffle)
    "q_rollup" -> ((s, dir) => {
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),
    // CUBE: all four grouping sets in one pass, with GROUPING() flags
    // disambiguating a subtotal NULL from a data NULL (the correctness
    // trap of every cube consumer). Still one shuffle; the expansion is
    // map-side Expand, partial aggregation applies per set.
    "q_cube" -> ((s, dir) => {
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping(col("o_orderstatus")).cast("int").as("g_status"),
          grouping(col("o_orderpriority")).cast("int").as("g_priority"),
          count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy(col("g_status"), col("g_priority"),
          col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),
    // PIVOT with an explicit value list (no extra distinct pass): per-user
    // cohort, event types rotated into columns. One groupBy shuffle; each
    // cell is a conditional count (absent combinations stay NULL in both
    // engines — the oracle's sum(CASE WHEN..THEN 1 END) preserves that).
    "q_pivot" -> ((s, dir) => {
      t(s, dir, "events")
        .select((col("user_id") % 10).as("cohort"), col("event_type"))
        .groupBy(col("cohort"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .orderBy(col("cohort"))
    }),
    // RANGE window frame (value-based, not row-based): trailing-3600s
    // event counts per user — the BATCH twin of the stream_tws_trailing
    // ListState leg, on Catalyst's native WindowExec RANGE frame. Ties are
    // peers (every event at te sees all events at te), hence the DISTINCT.
    "q_window_range" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"),
          unix_timestamp(col("ts").cast("timestamp")).as("te"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("te"))
        .rangeBetween(-3600L, 0L)
      e.select(col("user_id"), col("te"),
          count(lit(1)).over(w).as("n_in_window"))
        .distinct()
        .orderBy(col("user_id"), col("te"))
    }),
    // distribution window functions over a TOTAL order (ties broken by the
    // unique key, so ntile bucket boundaries, percent_rank and cume_dist
    // are engine-invariant exact integer ratios — no rounding needed). A
    // single global ordering is inherently one partition; at 100 TB the
    // deployment shape is bucketing by pre-computed quantile boundaries
    // (see corpus_profile's percentile family), not a global sort.
    "q_ntile" -> ((s, dir) => {
      val w = Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      t(s, dir, "customer")
        .select(col("c_custkey"),
          ntile(4).over(w).cast("int").as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy(col("c_custkey"))
    }),
    // explicit GROUPING SETS (the general form ROLLUP/CUBE desugar to):
    // a hand-picked lattice — (status, priority), (priority), grand total —
    // that neither ROLLUP nor CUBE produces, still one Expand + one shuffle
    "q_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_qgs")
      s.sql("""SELECT o_orderstatus, o_orderpriority,
              |       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
              |       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
              |       count(*) AS cnt
              |FROM orders_qgs
              |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
              |                        (o_orderpriority), ())
              |ORDER BY g_status, g_priority,
              |         o_orderstatus ASC NULLS FIRST,
              |         o_orderpriority ASC NULLS FIRST""".stripMargin)
    }),
    // ROWS window frame (position-based, vs q_window_range's value-based):
    // trailing-3-row moving sum in exact integer cents over a UNIQUE order
    // (event_id), so the frame contents — and therefore the sum — are
    // engine-invariant with no FP or tie ambiguity
    "q_window_rows" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(-2, 0)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
            .over(w).as("cents_3"))
        .orderBy(col("user_id"), col("event_id"))
    }),
    // LATERAL array expansion with POSITION (posexplode): one row per
    // leading token — generator runs map-side (no shuffle until the sort),
    // position is part of the output contract (ordinality semantics)
    "q_posexplode" -> ((s, dir) => {
      t(s, dir, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .filter(col("pos") < 3)
        .select(col("doc_id"), col("pos").cast("int").as("pos"), col("word"))
        .orderBy(col("doc_id"), col("pos"))
    }),
    // anti join: customers with no orders (null-aware NOT EXISTS shape;
    // broadcast the aggregated key set when small, AQE decides)
    "q_anti_join" -> ((s, dir) => {
      val customer = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),
    // semi join: orders whose customer is in a segment (EXISTS shape) —
    // probe side never duplicates rows, build side broadcast when small
    "q_semi_join" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val building = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      orders.join(building, orders("o_custkey") === building("c_custkey"), "left_semi")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),
    // set operations: symmetric difference of two customer populations via
    // UNION / INTERSECT / EXCEPT (all shuffle on the full row as the key)
    "q_setops" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val big = orders.filter(col("o_totalprice") > 400000.0)
        .select(col("o_custkey"))
      urgent.union(big).except(urgent.intersect(big))
        .orderBy(col("o_custkey"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping" ->
      """WITH r AS (
        |  SELECT l.l_orderkey,
        |         CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |              (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |         o.o_orderdate, o.o_orderpriority
        |  FROM customer c
        |  JOIN orders o ON c.c_custkey = o.o_custkey
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  WHERE c.c_mktsegment = 'BUILDING'
        |    AND o.o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
        |    AND l.l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
        |  GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority)
        |SELECT l_orderkey, revenue, o_orderdate, o_orderpriority
        |FROM r ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n.n_name,
        |       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |            (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |              AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n.n_name
        |ORDER BY revenue DESC, n.n_name""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |       CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
        |       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |            (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7') OR
        |       (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
        |GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q10_returned_items" ->
      """SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
        |       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |            (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE l.l_returnflag = 'R'
        |  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        |ORDER BY revenue DESC, c.c_custkey LIMIT 20""".stripMargin,
    "q2_min_cost" ->
      """SELECT p.p_partkey, p.p_name, l.l_suppkey,
        |       CAST(l.l_extendedprice AS DOUBLE) AS min_price
        |FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
        |WHERE l.l_extendedprice = (
        |  SELECT min(l2.l_extendedprice) FROM lineitem l2
        |  WHERE l2.l_partkey = p.p_partkey)
        |ORDER BY p.p_partkey, l.l_suppkey""".stripMargin,
    "q18_large_orders" ->
      """SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
        |       CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM customer c, orders o, lineitem l
        |WHERE o.o_orderkey IN (
        |    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |    HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250)
        |  AND c.c_custkey = o.o_custkey AND o.o_orderkey = l.l_orderkey
        |GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate
        |ORDER BY total_qty DESC, o.o_orderkey LIMIT 100""".stripMargin,
    "q6_forecast" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |            CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24.0""".stripMargin,
    "q14_promo_effect" ->
      """SELECT round(
        |  100.0 * CAST(sum(CASE WHEN p.p_type = 'ECONOMY'
        |            THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |                 (1.00 - CAST(l.l_discount AS DECIMAL(4,2)))
        |            ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |           (1.00 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE), 6)
        |  AS promo_revenue_pct
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1996-02-01 00:00:00'""".stripMargin,
    "q19_bracket_revenue" ->
      """SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |           (1.00 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
        |       AND l.l_quantity BETWEEN 1.0 AND 20.0)
        |   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 20
        |       AND l.l_quantity BETWEEN 10.0 AND 30.0)
        |   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 30
        |       AND l.l_quantity BETWEEN 20.0 AND 40.0)""".stripMargin,
    "q17_small_qty_revenue" ->
      """SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
        |             AS DOUBLE) / 7.0, 6) AS avg_yearly
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_type = 'ECONOMY'
        |  AND CAST(l.l_quantity AS DECIMAL(18,2)) * 5 *
        |      (SELECT count(*) FROM lineitem l2
        |       WHERE l2.l_partkey = p.p_partkey)
        |    < (SELECT sum(CAST(l3.l_quantity AS DECIMAL(18,2)))
        |       FROM lineitem l3 WHERE l3.l_partkey = p.p_partkey)""".stripMargin,
    "q15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |             (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
        |FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        |WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s.s_suppkey""".stripMargin,
    "q22_sales_opportunity" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_nationkey,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
        |SELECT c.c_nationkey AS cntry, count(*) AS numcust,
        |       sum(c.cents) / 100.0 AS totacctbal
        |FROM cust c
        |WHERE c.cents > (SELECT sum(cents) // count(*) FROM cust
        |                 WHERE cents > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c.c_nationkey
        |ORDER BY cntry""".stripMargin,
    "q13_customer_distribution" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |      FROM customer c LEFT OUTER JOIN orders o
        |        ON c.c_custkey = o.o_custkey
        |       AND o.o_orderpriority = '1-URGENT'
        |      GROUP BY c.c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q11_important_stock" ->
      """WITH val AS (
        |  SELECT l.l_partkey,
        |         sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS value
        |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE s.s_nationkey < 13
        |  GROUP BY l.l_partkey)
        |SELECT l_partkey, CAST(value AS DOUBLE) AS value
        |FROM val
        |WHERE value > (SELECT sum(value) * CAST(0.0005 AS DECIMAL(7,5)) FROM val)
        |ORDER BY value DESC, l_partkey""".stripMargin,
    "q8_market_share" ->
      """SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
        |       CAST(sum(CASE WHEN sn.n_name = 'NATION_5'
        |                THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |                     (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
        |                ELSE 0 END) AS DOUBLE) /
        |       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |       AS mkt_share
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |JOIN region r ON cn.n_regionkey = r.r_regionkey
        |WHERE p.p_type = 'STANDARD'
        |  AND r.r_name = 'AMERICA'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY year(o.o_orderdate)
        |ORDER BY o_year""".stripMargin,
    "q9_product_profit" ->
      """SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
        |       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))) -
        |                CAST(p.p_retailprice AS DECIMAL(18,2)) *
        |                CAST(l.l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sum_profit
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE p.p_name LIKE '%gear%'
        |GROUP BY n.n_name, year(o.o_orderdate)
        |ORDER BY nation, o_year DESC""".stripMargin,
    "q12_shipmode_priority" ->
      """SELECT l.l_returnflag,
        |       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem l JOIN orders o
        |  ON l.l_orderkey = o.o_orderkey
        | AND l.l_shipdate >= o.o_orderdate
        | AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
        |WHERE l.l_returnflag IN ('A','N')
        |  AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin,
    "q20_excess_suppliers" ->
      """SELECT s_suppkey, s_name
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part
        |                      WHERE p_type = 'ECONOMY')
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 50)
        |ORDER BY s_suppkey""".stripMargin,
    "q4_order_priority" ->
      """SELECT o.o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_returnflag = 'R')
        |GROUP BY o.o_orderpriority
        |ORDER BY o.o_orderpriority""".stripMargin,
    "q16_parts_supplier" ->
      """SELECT p.p_brand, p.p_type, p.p_size,
        |       count(DISTINCT l.l_suppkey) AS supplier_cnt
        |FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand <> 'Brand#3' AND p.p_size IN (1, 4, 7)
        |  AND l.l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
        |GROUP BY p.p_brand, p.p_type, p.p_size
        |ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size""".stripMargin,
    "q21_waiting_suppliers" ->
      """SELECT s.s_name, count(*) AS numwait
        |FROM supplier s
        |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s.s_name LIMIT 100""".stripMargin,
    // the bloom filter is semantics-free pruning: the oracle is the plain join
    "q_runtime_filter" ->
      """SELECT l.l_returnflag, count(*) AS cnt,
        |       CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT'
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin,
    "q_scan_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus
        |FROM lineitem
        |WHERE (l_returnflag = 'R' OR l_linestatus = 'F') AND l_quantity > 30.0
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity""".stripMargin,
    "q_join3" ->
      """SELECT o.o_orderkey, c.c_name, n.n_name, o.o_totalprice
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE o.o_orderstatus = 'F'
        |ORDER BY o.o_orderkey""".stripMargin,
    "q_left_join" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c
        |LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000.0) o
        |  ON c.c_custkey = o.o_custkey
        |ORDER BY c.c_custkey ASC, o.o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_subquery_agg" ->
      """SELECT t.o_orderstatus, count(*) AS cnt,
        |       CAST(sum(CAST(t.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') t
        |GROUP BY t.o_orderstatus ORDER BY t.o_orderstatus""".stripMargin,
    "q_events_bucket" ->
      """SELECT CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS bucket,
        |       event_type, count(*) AS cnt,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin,
    "q_events_json" ->
      """SELECT event_type, count(*) AS cnt,
        |       CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS k_total,
        |       min(CAST(json_extract(props, '$.k') AS INT)) AS k_min,
        |       max(CAST(json_extract(props, '$.k') AS INT)) AS k_max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_topn" ->
      """SELECT event_id, user_id, value FROM events
        |ORDER BY value DESC, event_id ASC LIMIT 100""".stripMargin,
    "q_window_rank" ->
      """WITH rev AS (
        |  SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY o_custkey),
        |r AS (
        |  SELECT c.c_nationkey, c.c_custkey, rev.revenue,
        |         row_number() OVER (PARTITION BY c.c_nationkey
        |                            ORDER BY rev.revenue DESC, c.c_custkey ASC) AS rk
        |  FROM customer c JOIN rev ON c.c_custkey = rev.o_custkey)
        |SELECT c_nationkey, rk, c_custkey, revenue
        |FROM r WHERE rk <= 3 ORDER BY c_nationkey, rk""".stripMargin,
    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
        |       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY g_status, g_priority,
        |         o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_pivot" ->
      """SELECT user_id % 10 AS cohort,
        |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
        |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
        |       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
        |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
        |FROM events GROUP BY user_id % 10 ORDER BY cohort""".stripMargin,
    "q_window_range" ->
      """WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS te FROM events)
        |SELECT DISTINCT user_id, te,
        |       CAST(count(*) OVER (PARTITION BY user_id ORDER BY te
        |                           RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |            AS BIGINT) AS n_in_window
        |FROM e ORDER BY user_id, te""".stripMargin,
    "q_ntile" ->
      """SELECT c_custkey,
        |       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |       percent_rank() OVER w AS pr,
        |       cume_dist() OVER w AS cd
        |FROM customer
        |WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_custkey""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
        |       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
        |       count(*) AS cnt
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderpriority), ())
        |ORDER BY g_status, g_priority,
        |         o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_window_rows" ->
      """SELECT user_id, event_id,
        |       CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |            OVER (PARTITION BY user_id ORDER BY event_id
        |                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |            AS BIGINT) AS cents_3
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q_posexplode" ->
      """WITH e AS (
        |  SELECT doc_id,
        |         unnest(string_split(text, ' ')) AS word,
        |         unnest(generate_series(1, len(string_split(text, ' ')))) AS i
        |  FROM documents WHERE doc_id < 50)
        |SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, word
        |FROM e WHERE i <= 3 ORDER BY doc_id, pos""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_semi_join" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE EXISTS (SELECT 1 FROM customer c
        |              WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,
    "q_setops" ->
      """WITH urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
        |big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
        |SELECT o_custkey FROM (
        |  SELECT o_custkey FROM (SELECT o_custkey FROM urgent UNION ALL SELECT o_custkey FROM big)
        |  EXCEPT
        |  (SELECT o_custkey FROM urgent INTERSECT SELECT o_custkey FROM big)
        |) ORDER BY o_custkey""".stripMargin
  )
}
