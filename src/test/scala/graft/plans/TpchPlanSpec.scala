package graft.plans

import graft.SparkFunSuite

/** Plan-shape pins for the TPC-H-shaped SQL surface: the predicates reach
  * the parquet scan and the dimension chain broadcasts — the properties
  * that make these plans survive a 100x scale-up.
  */
class TpchPlanSpec extends SparkFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("q6: every predicate is pushed to the lineitem scan") {
    val df = graft.SparkEntry.queries("q6_forecast")(spark, dir)
    // the plan's toString truncates long PushedFilters lists, and AQE's
    // wrapper hides the scan from collect() — formatted explain prints the
    // full filter list
    val pushed = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    for (f <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)", "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)"))
      assert(pushed.contains(f), s"missing pushed filter $f in: $pushed")
  }

  test("q5: the region->nation->supplier dimension chain broadcasts") {
    val df = graft.SparkEntry.queries("q5_local_supplier")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    // and the fact-side revenue rows arrive; values are oracled separately
    assert(df.count() >= 1)
  }

  test("q7: both nation roles broadcast; ship-date range pushed to the lineitem scan") {
    val df = graft.SparkEntry.queries("q7_volume_shipping")(spark, dir)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    for (f <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate"))
      assert(formatted.contains(f), s"missing pushed filter $f")
    // role-playing dimension: nation appears in TWO broadcast joins (one
    // per role) — at least supplier-side broadcast plus the customer-side
    // nation broadcast
    val plan = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"expected >=2 broadcast joins:\n${plan.take(1200)}")
  }

  test("q2: the correlated scalar-min subquery decorrelates to one aggregate + join") {
    val df = graft.SparkEntry.queries("q2_min_cost")(spark, dir)
    val optimized = df.queryExecution.optimizedPlan.toString
    // RewriteCorrelatedScalarSubquery must have eliminated the per-row
    // subquery: no subquery node survives optimization...
    assert(!optimized.toLowerCase.contains("subquery"),
      s"correlated subquery not decorrelated:\n${optimized.take(1200)}")
    // ...replaced by a partkey-grouped min aggregate joined back
    assert(optimized.contains("min(") && optimized.contains("Join"),
      s"expected min-aggregate + join:\n${optimized.take(1200)}")
    assert(df.count() >= 1)
  }

  test("q18: the IN + HAVING subquery plans as a left-semi join on pre-aggregated totals") {
    val df = graft.SparkEntry.queries("q18_large_orders")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"IN-subquery must plan as a semi join:\n${plan.take(1200)}")
    assert(plan.contains("TakeOrderedAndProject"),
      "limit-100 must plan as TakeOrdered (map-side partial top-k), not a global sort")
  }

  test("runtime bloom filter is injected into the unfiltered lineitem side") {
    import org.apache.spark.sql.functions._
    graft.SparkUtil.withConfs(spark,
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.number.threshold" -> "10",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = graft.queries.Tables.df(spark, dir, "lineitem")
        .join(graft.queries.Tables.df(spark, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("cnt"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no bloom filter injected:\n${optimized.take(1500)}")
    }
  }

  test("q10: returnflag + order-date range pushed; global top-20 is a TakeOrdered, not a full sort") {
    val df = graft.SparkEntry.queries("q10_returned_items")(spark, dir)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    for (f <- Seq("EqualTo(l_returnflag,R)", "GreaterThanOrEqual(o_orderdate",
        "LessThan(o_orderdate"))
      assert(formatted.contains(f), s"missing pushed filter $f")
    assert(formatted.contains("TakeOrderedAndProject"),
      "limit-20 must plan as TakeOrdered (map-side partial top-k), not a global sort")
  }

  test("q4: the correlated EXISTS plans as a left-semi join; date range pushed to the orders scan") {
    val df = graft.SparkEntry.queries("q4_order_priority")(spark, dir)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    for (f <- Seq("GreaterThanOrEqual(o_orderdate", "LessThan(o_orderdate"))
      assert(formatted.contains(f), s"missing pushed filter $f")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"EXISTS must plan as a semi join:\n${plan.take(1200)}")
    assert(!df.queryExecution.optimizedPlan.toString.toLowerCase.contains("exists"),
      "the subquery expression must be rewritten away, not evaluated per row")
  }

  test("q16: the NOT IN subquery plans as an anti join; the excluded-supplier side broadcasts") {
    val df = graft.SparkEntry.queries("q16_parts_supplier")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"),
      s"NOT IN must plan as an anti join:\n${plan.take(1200)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"the tiny supplier exclusion list must broadcast:\n${plan.take(1200)}")
  }

  test("q19: the disjunctive bracket keeps the extracted hash join — no nested loop, one residual OR filter") {
    val df = graft.SparkEntry.queries("q19_bracket_revenue")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the common p_partkey=l_partkey conjunct must stay an equi hash join:\n${plan.take(1200)}")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"the OR must not degrade the join to a nested loop:\n${plan.take(1200)}")
  }

  test("q14: date range pushed to the lineitem scan; both sums in ONE aggregate pass") {
    val df = graft.SparkEntry.queries("q14_promo_effect")(spark, dir)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    for (f <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate"))
      assert(formatted.contains(f), s"missing pushed filter $f")
    // the CASE ratio is one HashAggregate pair (partial+final), not two
    // scans: count nodes in the executed-plan TREE (formatted explain
    // repeats every node in its details section)
    val tree = df.queryExecution.executedPlan.toString
    val aggs = "HashAggregate".r.findAllIn(tree).size
    assert(aggs <= 2, s"expected one partial+final aggregate pair, saw $aggs:\n${tree.take(1200)}")
    val lineitemScans = "Scan parquet".r.findAllIn(tree).size
    assert(lineitemScans <= 2, // lineitem + part, each once
      s"both sums must come from ONE pass, saw $lineitemScans scans:\n${tree.take(1200)}")
  }

  test("q21: EXISTS + NOT EXISTS on the same fact plan as one semi and one anti join") {
    val df = graft.SparkEntry.queries("q21_waiting_suppliers")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"EXISTS must plan as a semi join:\n${plan.take(1500)}")
    assert(plan.contains("LeftAnti"),
      s"NOT EXISTS must plan as an anti join:\n${plan.take(1500)}")
    assert(plan.contains("TakeOrderedAndProject"),
      "limit-100 must plan as TakeOrdered, not a global sort")
  }

  test("q17: both correlated scalar aggregates decorrelate — no subquery survives optimization") {
    val df = graft.SparkEntry.queries("q17_small_qty_revenue")(spark, dir)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("subquery"),
      s"correlated scalar aggregates not decorrelated:\n${optimized.take(1500)}")
    // replaced by partkey-grouped count/sum aggregates joined back
    assert(optimized.contains("count(") && optimized.contains("sum("),
      s"expected count+sum aggregates:\n${optimized.take(1500)}")
    assert(df.count() == 1)
  }

  test("q15: the max-revenue threshold is a run-once scalar subquery, not a per-row re-aggregation") {
    val df = graft.SparkEntry.queries("q15_top_supplier")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Subquery"),
      s"expected a run-once scalar subquery:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"scalar threshold must stay a filter, not a join explosion:\n${plan.take(1500)}")
    assert(df.count() >= 1)
  }

  test("q22: NOT EXISTS plans as an anti join; the cents threshold is a run-once scalar") {
    val df = graft.SparkEntry.queries("q22_sales_opportunity")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"),
      s"NOT EXISTS must plan as an anti join:\n${plan.take(1500)}")
    assert(plan.contains("Subquery"),
      s"the above-average threshold must be a run-once scalar:\n${plan.take(1500)}")
    assert(df.count() >= 1)
  }

  test("q13: the outer join keeps its ON-clause predicate (zero-order customers survive)") {
    val df = graft.SparkEntry.queries("q13_customer_distribution")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftOuter"),
      s"the join must stay LEFT OUTER (the ON predicate must not demote it to inner):\n${plan.take(1500)}")
    // zero-order customers exist iff the outer semantics held: the
    // histogram must carry a c_count=0 bucket covering them
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.contains(0L), s"no zero-order bucket — outer join lost: $rows")
  }

  test("q11: the global-value threshold is a run-once scalar over the grouped aggregate") {
    val df = graft.SparkEntry.queries("q11_important_stock")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Subquery"),
      s"expected a run-once scalar subquery:\n${plan.take(1500)}")
    assert(df.count() >= 1)
  }

  test("q20: the nested IN chains plan as stacked left-semi joins") {
    val df = graft.SparkEntry.queries("q20_excess_suppliers")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert("LeftSemi".r.findAllIn(plan).size >= 2,
      s"both IN levels must plan as semi joins:\n${plan.take(1500)}")
    assert(!df.queryExecution.optimizedPlan.toString.toLowerCase.contains("in-subquery"),
      "no per-row IN evaluation may survive optimization")
    assert(df.count() >= 1)
  }

  test("q8: dimension chains broadcast, date range pushed to orders, both ratio sums in one pass") {
    val df = graft.SparkEntry.queries("q8_market_share")(spark, dir)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    for (f <- Seq("GreaterThanOrEqual(o_orderdate", "LessThan(o_orderdate",
        "EqualTo(p_type,STANDARD)"))
      assert(formatted.contains(f), s"missing pushed filter $f")
    val plan = df.queryExecution.executedPlan.toString
    // the deepest join tree in the suite: part, supplier-nation, and the
    // customer-side nation/region chain all broadcast
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3,
      s"expected >=3 broadcast joins:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), "no join explosion")
    // share and total are two sums of ONE aggregate pair, not two scans
    assert("HashAggregate".r.findAllIn(plan).size <= 2,
      s"both ratio sums must come from one aggregate pass:\n${plan.take(1500)}")
  }

  test("q9: the LIKE filter is pushed to the part scan and the filtered slice broadcasts") {
    val df = graft.SparkEntry.queries("q9_product_profit")(spark, dir)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("StringContains(p_name,gear)"),
      s"LIKE '%gear%' must push to the part scan as StringContains:\n" +
        formatted.take(1500))
    val plan = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"part slice and supplier+nation must broadcast:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), "no join explosion")
  }

  test("q12: shipdate range + flag IN pushed to lineitem; bracket rides the equi-join; one aggregate pass") {
    val df = graft.SparkEntry.queries("q12_shipmode_priority")(spark, dir)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    for (f <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "In(l_returnflag"))
      assert(formatted.contains(f), s"missing pushed filter $f")
    val plan = df.queryExecution.executedPlan.toString
    // the date bracket must NOT prevent orderkey equi-join extraction
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"bracket must ride the equi-join as a residual:\n${plan.take(1500)}")
    assert("HashAggregate".r.findAllIn(plan).size <= 2,
      s"both CASE counts must come from one aggregate pass:\n${plan.take(1500)}")
  }
}
