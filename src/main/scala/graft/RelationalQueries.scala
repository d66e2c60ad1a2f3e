package graft

import graft.operators.Relational._

/** Relational inventory wiring: Spark plan + DuckDB oracle per query.
  * Oracle SQL notes:
  *  - money sums accumulate in DECIMAL, final cast to DOUBLE (bit-stable
  *    across engines; see operators.Relational scaladoc);
  *  - ORDER BY uses NULLS FIRST to match Spark's ascending default;
  *  - grouping ids are spelled as GROUPING(a)*2+GROUPING(b) (portable).
  */
object RelationalQueries {
  private val REV =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)"

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q1_pricing_summary", (s, d) => pricingSummary(s, d), Some(
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         |  $REV AS sum_disc_price,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    QueryDef("q2_revenue_by_segment", (s, d) => revenueBySegment(s, d), Some(
      s"""SELECT c_mktsegment, $REV AS revenue, COUNT(*) AS n_lines
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    QueryDef("q3_top_orders", (s, d) => topOrders(s, d), Some(
      s"""SELECT l_orderkey, o_orderdate, $REV AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE EXISTS (SELECT 1 FROM customer
         |  WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    QueryDef("q5_region_revenue", (s, d) => regionRevenue(s, d), Some(
      s"""SELECT r_name, n_name, $REV AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    QueryDef("q4_outer_join", (s, d) => customerOrderAudit(s, d), Some(
      """SELECT
        |  COUNT(CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL THEN 1 END) AS matched,
        |  COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS customer_only,
        |  COUNT(CASE WHEN c_custkey IS NULL THEN 1 END) AS order_only
        |FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey""".stripMargin)),

    QueryDef("q6_semi_join", (s, d) => customersWithOrders(s, d), Some(
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin)),

    QueryDef("q7_anti_join", (s, d) => customersWithoutOrders(s, d), Some(
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin)),

    QueryDef("q124_waiting_customers", (s, d) => waitingCustomers(s, d), Some(
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM customer),
        |pos AS (
        |  SELECT SUM(cents) AS total, COUNT(*) AS n FROM c WHERE cents > 0)
        |SELECT c_nationkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_waiting,
        |  CAST(SUM(cents) AS BIGINT) AS total_bal_cents
        |FROM c CROSS JOIN pos
        |WHERE cents * n > total
        |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // q125: TPC-H Q18 shape — large-volume orders via the classic
    // IN (GROUP BY ... HAVING SUM ...) subquery (oracle keeps that
    // spelling; the Spark side decorrelates to ONE per-order aggregate
    // reused as both filter and output, halving the lineitem scans).
    QueryDef("q125_large_volume_orders", (s, d) => largeVolumeOrders(s, d), Some(
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250)
        |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    // q126: TPC-H Q17 shape — correlated scalar-avg subquery (oracle
    // keeps that spelling; Spark restricts to the brand's parts via
    // broadcast semi-join then computes the per-part average as a
    // partitioned window over the SAME rows: one scan, one shuffle).
    QueryDef("q126_small_qty_revenue", (s, d) => smallQuantityRevenue(s, d), Some(
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#4'
        |  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
        |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin)),

    // q127: TPC-H Q20 shape — nested IN whose HAVING compares a group
    // aggregate against a CORRELATED per-part aggregate (oracle keeps
    // that spelling; Spark aggregates to (part, supplier) once and
    // takes the per-part total as a window over the reduced aggregate,
    // then semi-joins supplier).
    QueryDef("q127_dominant_suppliers", (s, d) => dominantSuppliers(s, d), Some(
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem l1
        |  GROUP BY l_partkey, l_suppkey
        |  HAVING SUM(l_quantity) > 0.2 * (SELECT SUM(l2.l_quantity)
        |    FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey))
        |ORDER BY s_suppkey""".stripMargin)),

    // q128: TPC-H Q15 shape — argmax with ties (oracle keeps the
    // revenue view + scalar-MAX equality; Spark broadcasts the 1-row
    // max back as an equi-join ON THE REVENUE VALUE — no global sort,
    // no window over all suppliers, ties survive by construction).
    QueryDef("q128_top_revenue_supplier", (s, d) => topRevenueSupplier(s, d), Some(
      s"""WITH revenue AS (
         |  SELECT l_suppkey AS supplier_no,
         |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS total_rev
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
         |FROM supplier JOIN revenue ON s_suppkey = supplier_no
         |WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
         |ORDER BY s_suppkey""".stripMargin)),

    // q129: TPC-H Q13 shape — the oracle keeps the classic left-outer
    // join + two-level GROUP BY; Spark aggregates orders alone first
    // and joins customer to the O(customers) summary (one fact-table
    // shuffle, no forced broadcast of customer).
    QueryDef("q129_order_count_distribution",
      (s, d) => customerOrderDistribution(s, d), Some(
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // q130: TPC-H Q19 shape — OR-of-ANDs across lineitem⋈part; the
    // oracle keeps the flat disjunction, Spark factors the per-side
    // implications into the scans (pushed filters) and evaluates the
    // residual OR inside the broadcast join.
    QueryDef("q130_disjunctive_revenue",
      (s, d) => disjunctivePredicateRevenue(s, d), Some(
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_returnflag IN ('N','A') AND (
        |  (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 20 AND 30))""".stripMargin)),

    // q131: TPC-H Q22 shape — scalar-subquery balance threshold +
    // NOT EXISTS anti-join, date-bounded to "no recent order" (every
    // customer in this generator has orders, so the literal Q22
    // anti-join would be always-empty). Oracle keeps the classic
    // spelling; the threshold comparison is multiply-only so both
    // engines compare exact decimals.
    QueryDef("q131_sales_opportunity", (s, d) => salesOpportunity(s, d), Some(
      """SELECT c_nationkey, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer c
        |WHERE c_nationkey IN (3,7,11,15,19)
        |  AND CAST(c_acctbal AS DECIMAL(18,2)) *
        |    (SELECT COUNT(*) FROM customer
        |     WHERE c_acctbal > 0 AND c_nationkey IN (3,7,11,15,19))
        |    > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer
        |       WHERE c_acctbal > 0 AND c_nationkey IN (3,7,11,15,19))
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '2000-09-01')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin)),

    // q132: TPC-H Q11 shape — per-group aggregate HAVING against a
    // global aggregate (oracle keeps the scalar-subquery spelling with
    // its second lineitem scan; Spark computes the global total OVER
    // the per-part summary and reuses the summary's exchange, so the
    // fact table is scanned once — plan-asserted).
    QueryDef("q132_important_parts", (s, d) => importantParts(s, d), Some(
      """SELECT l_partkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS part_value
        |FROM lineitem
        |GROUP BY l_partkey
        |HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2))) *
        |    (SELECT COUNT(DISTINCT l_partkey) FROM lineitem) * 5
        |  > (SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2))) FROM lineitem) * 6
        |ORDER BY part_value DESC, l_partkey""".stripMargin)),

    // q133: TPC-H Q16 shape — COUNT(DISTINCT) per (brand, size) with a
    // NOT IN supplier deny-list (oracle keeps that spelling; Spark
    // broadcasts the deny-list as a left anti join — equivalent here
    // because s_suppkey is non-nullable — and two-phase-rewrites the
    // distinct aggregate so no shuffle carries raw fact rows).
    QueryDef("q133_supplier_diversity", (s, d) => supplierDiversity(s, d), Some(
      """SELECT p_brand, p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#4'
        |  AND p_size IN (1,7,14,23,36,45)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin)),

    // q135: TPC-H Q9 shape — product-line profit by (nation, year),
    // the registry's deepest star probe: lineitem ⋈ part ⋈ supplier ⋈
    // nation ⋈ orders with a part-name substring filter. No partsupp
    // in the driver schema, so unit cost comes from p_retailprice.
    // Oracle keeps the flat five-table join; Spark broadcasts the
    // name-filtered part and supplier⋈nation dims so the ONLY shuffle
    // that moves fact rows is lineitem ⋈ orders on the order key.
    QueryDef("q135_profit_by_nation_year",
      (s, d) => profitByNationYear(s, d), Some(
      """SELECT nation, o_year,
        |  CAST(SUM(amount) AS DOUBLE) AS sum_profit,
        |  COUNT(*) AS n_lines
        |FROM (
        |  SELECT n_name AS nation,
        |    CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
        |      - CAST(l_quantity AS DECIMAL(18,2)) *
        |        CAST(p_retailprice AS DECIMAL(18,2)) AS amount
        |  FROM lineitem
        |    JOIN part ON p_partkey = l_partkey
        |    JOIN supplier ON s_suppkey = l_suppkey
        |    JOIN nation ON n_nationkey = s_nationkey
        |    JOIN orders ON o_orderkey = l_orderkey
        |  WHERE p_name LIKE 'red%') profit
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin)),

    // q136: the 100 TB percentile path — per-group percentiles over a
    // deterministic 1/8 hash sample (shared md5 h60 over the row key),
    // audited against the exact percentiles with error in integer
    // micro units. One pass, one shuffle; at scale only the sample
    // side survives and the exact side is the audit (q134 discipline).
    QueryDef("q136_sampled_quantiles", (s, d) => sampledQuantiles(s, d), Some(
      """WITH k AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    CAST('0x' || substr(md5(concat_ws('#',
        |      CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR))),
        |      1, 15) AS BIGINT) % 8 = 0 AS kept
        |  FROM lineitem),
        |agg AS (
        |  SELECT l_returnflag,
        |    round(quantile_cont(l_extendedprice, 0.5), 6) AS exact_p50,
        |    round(quantile_cont(l_extendedprice, 0.95), 6) AS exact_p95,
        |    round(quantile_cont(CASE WHEN kept THEN l_extendedprice END, 0.5), 6) AS sample_p50,
        |    round(quantile_cont(CASE WHEN kept THEN l_extendedprice END, 0.95), 6) AS sample_p95,
        |    COUNT(*) AS n_total,
        |    COUNT(CASE WHEN kept THEN 1 END) AS n_sample
        |  FROM k GROUP BY l_returnflag)
        |SELECT l_returnflag, exact_p50, exact_p95, sample_p50, sample_p95,
        |  n_total, n_sample,
        |  CAST(round(abs(sample_p50 - exact_p50) * 1000000) AS BIGINT) AS err_p50_micro,
        |  CAST(round(abs(sample_p95 - exact_p95) * 1000000) AS BIGINT) AS err_p95_micro
        |FROM agg ORDER BY l_returnflag""".stripMargin)),

    // q137: TPC-H Q10 shape — returned-item revenue, top 20 customers
    // in a quarter. Oracle keeps the literal four-table GROUP BY +
    // ORDER/LIMIT; Spark reduces the fact join to O(customers) first,
    // takes the top 20 on the summary, and broadcasts THOSE 20 rows
    // into the customer⋈nation dimension attach (customer is
    // fact-sized at 100 TB — never broadcast the dimension, broadcast
    // the answer).
    QueryDef("q137_returned_item_revenue",
      (s, d) => returnedItemRevenue(s, d), Some(
      s"""SELECT c_custkey, c_name, c_acctbal, n_name AS nation,
         |  $REV AS revenue
         |FROM lineitem
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN customer ON c_custkey = o_custkey
         |  JOIN nation ON n_nationkey = c_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1996-04-01'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    QueryDef("q8_top_customers", (s, d) => topCustomers(s, d), Some(
      """SELECT o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |ORDER BY total_spend DESC, o_custkey LIMIT 20""".stripMargin)),

    QueryDef("q9_rank_suppliers", (s, d) => topSuppliersPerNation(s, d), Some(
      """SELECT s_nationkey, rank_in_nation, s_suppkey, s_name, s_acctbal FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY s_nationkey
        |    ORDER BY s_acctbal DESC, s_suppkey) AS BIGINT) AS rank_in_nation
        |  FROM supplier) t
        |WHERE rank_in_nation <= 3
        |ORDER BY s_nationkey, rank_in_nation""".stripMargin)),

    QueryDef("q10_rollup", (s, d) => rollupReturns(s, d), Some(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |  CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    QueryDef("q11_cube", (s, d) => cubeOrders(s, d), Some(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(GROUPING(o_orderstatus)*2 + GROUPING(o_orderpriority) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    QueryDef("q17_grouping_sets", (s, d) => groupingSetsReturns(s, d), Some(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    QueryDef("q18_percentiles", (s, d) => quantityPercentiles(s, d), Some(
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.95), 6) AS p95,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    QueryDef("q19_pivot", (s, d) => ordersPivot(s, d), Some(
      """SELECT o_orderpriority,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
        |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    QueryDef("q12_distinct_counts", (s, d) => distinctParts(s, d), Some(
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    QueryDef("q13_set_ops", (s, d) => brandSetOps(s, d), Some(
      """WITH big AS (SELECT p_brand FROM part WHERE p_size >= 40),
        |cheap AS (SELECT p_brand FROM part WHERE p_retailprice < 1200.0)
        |SELECT p_brand, 'union' AS op FROM (SELECT p_brand FROM big UNION SELECT p_brand FROM cheap)
        |UNION ALL
        |SELECT p_brand, 'intersect' AS op FROM (SELECT p_brand FROM big INTERSECT SELECT p_brand FROM cheap)
        |UNION ALL
        |SELECT p_brand, 'except' AS op FROM (SELECT p_brand FROM big EXCEPT SELECT p_brand FROM cheap)
        |ORDER BY op, p_brand""".stripMargin)),

    QueryDef("q14_orders_by_month", (s, d) => ordersByMonth(s, d), Some(
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("q15_above_brand_avg", (s, d) => partsAboveBrandAvg(s, d), Some(
      """WITH b AS (SELECT p_brand AS b_brand,
        |    CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS brand_avg
        |  FROM part GROUP BY p_brand)
        |SELECT p_partkey, p_brand, p_retailprice, brand_avg
        |FROM part JOIN b ON p_brand = b_brand
        |WHERE p_retailprice > brand_avg
        |ORDER BY p_partkey""".stripMargin)),

    // q93: TPC-H Q17 shape — threshold multiplied out to exact DECIMAL.
    QueryDef("q93_small_qty_revenue", (s, d) => smallQtyRevenue(s, d), Some(
      """WITH l AS (SELECT l_partkey, CAST(l_quantity AS DECIMAL(18,2)) AS q,
        |             l_extendedprice FROM lineitem),
        |per AS (SELECT l_partkey, SUM(q) AS sq, COUNT(*) AS cq
        |        FROM l GROUP BY l_partkey)
        |SELECT p_brand, COUNT(*) AS n_small,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM l JOIN per USING (l_partkey) JOIN part ON l_partkey = p_partkey
        |WHERE q * 5 * cq < sq
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // q94: TPC-H Q21 shape — EXISTS + NOT EXISTS in their classic SQL
    // spelling; the Spark side decorrelates to semi/anti hash joins.
    QueryDef("q94_sole_return_supplier", (s, d) => soleReturnSuppliers(s, d), Some(
      """WITH r AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        |           WHERE l_returnflag = 'R'),
        |a AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
        |SELECT s_suppkey, s_name, COUNT(*) AS n_orders
        |FROM r JOIN supplier ON s_suppkey = r.l_suppkey
        |WHERE EXISTS (SELECT 1 FROM a WHERE a.l_orderkey = r.l_orderkey
        |                AND a.l_suppkey <> r.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM r r2 WHERE r2.l_orderkey = r.l_orderkey
        |                    AND r2.l_suppkey <> r.l_suppkey)
        |GROUP BY s_suppkey, s_name
        |ORDER BY n_orders DESC, s_suppkey""".stripMargin)),

    QueryDef("q16_running_spend", (s, d) => customerRunningSpend(s, d), Some(
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
        |  LAG(o_totalprice, 1) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
        |FROM orders WHERE o_custkey < 200
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)),

    // q105: TPC-H Q8 shape — per order-year NATION_0 share of the ASIA
    // market. Revenue in DECIMAL; the share is exact integer micro-math
    // (floor to cents on BOTH engines — casts round differently — then
    // one non-negative integer division).
    // q143: TPC-H Q4 shape — date-windowed order-priority counts gated
    // by EXISTS(flagged line); Spark plans the EXISTS as a LEFT SEMI
    // hash join (never duplicates orders), both filters pushed.
    QueryDef("q143_order_priority_check",
      (s, d) => orderPriorityCheck(s, d), Some(
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)),

    // q144: TPC-H Q12 shape — fact⋈fact orderkey join with the high/low
    // priority split as conditional counts in ONE aggregate pair.
    QueryDef("q144_line_priority_counts",
      (s, d) => linePriorityCounts(s, d), Some(
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin)),

    // q145: TPC-H Q14 shape — promo revenue share over one month, the
    // share ratio in exact integer micro units (q105 discipline).
    QueryDef("q145_promo_revenue", (s, d) => promoRevenueShare(s, d), Some(
      """WITH t AS (
        |  SELECT CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
        |    AS rev, p_type
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        |    AND l_shipdate < TIMESTAMP '1996-10-01')
        |SELECT
        |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev END) AS DOUBLE)
        |    AS promo_revenue,
        |  CAST(SUM(rev) AS DOUBLE) AS total_revenue,
        |  CAST((CAST(floor(SUM(CASE WHEN p_type = 'PROMO' THEN rev END)
        |      * 100) AS HUGEINT) * 1000000)
        |    // CAST(floor(SUM(rev) * 100) AS HUGEINT) AS BIGINT)
        |    AS promo_share_micro,
        |  COUNT(*) AS n_lines
        |FROM t""".stripMargin)),

    // q146: TPC-H Q6 shape — the pure scan-aggregate: date window,
    // discount band and quantity cap ALL pushed into the parquet scan.
    QueryDef("q146_forecast_revenue", (s, d) => forecastRevenue(s, d), Some(
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin)),

    // q147: TPC-H Q2 shape — minimum-cost supplier with ties: the
    // part↔supplier catalog derives from observed lineitems (no
    // partsupp in this schema), cost = raw MIN(l_extendedprice) per
    // pair (deterministic: no sums, no division). Oracle spells the
    // correlated min as a join against the per-part MIN; Spark runs it
    // as a window MIN over the dimension-filtered catalog summary.
    QueryDef("q147_min_cost_supplier", (s, d) => minCostSupplier(s, d), Some(
      """WITH cat AS (
        |  SELECT l_partkey AS p_key, l_suppkey AS s_key,
        |    MIN(l_extendedprice) AS cost
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |rs AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON n_nationkey = s_nationkey
        |    JOIN region ON r_regionkey = n_regionkey AND r_name = 'ASIA'),
        |pc AS (
        |  SELECT p_partkey, p_brand, s_name, s_acctbal, n_name, cost
        |  FROM cat JOIN rs ON s_suppkey = s_key
        |    JOIN part ON p_partkey = p_key
        |  WHERE p_size <= 15 AND p_type = 'LARGE'),
        |mn AS (SELECT p_partkey, MIN(cost) AS min_cost
        |       FROM pc GROUP BY p_partkey)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
        |  CAST(CAST(cost AS DECIMAL(18,2)) * 100 AS BIGINT) AS cost_cents
        |FROM pc JOIN mn USING (p_partkey)
        |WHERE cost = min_cost
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin)),

    // q141: TPC-H Q21 shape — suppliers who kept orders waiting: the
    // correlated EXISTS + NOT EXISTS pair on the SAME fact table
    // (no commit/receipt dates in this schema, so "late" adapts to
    // l_returnflag = 'R' inside 'F' orders). Oracle keeps the literal
    // double self-join spelling; Spark collapses both subqueries into
    // ONE per-order aggregate — lineitem scanned once, shuffled once.
    QueryDef("q141_suppliers_kept_waiting",
      (s, d) => suppliersKeptWaiting(s, d), Some(
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin)),

    // q140: TPC-H Q7 shape — cross-nation shipping volume: nation
    // attaches TWICE (supplier role, customer role) with the
    // disjunctive pair predicate (A→B)∨(B→A). Oracle keeps the flat
    // five-table join + both nation aliases; Spark folds the nation
    // filter into both broadcast dimension attaches, shuffles fact
    // rows ONCE (l_orderkey ⋈ o_orderkey), pre-aggregates to a
    // (custkey, supp_nation, year) summary, and only that summary
    // meets fact-sized customer.
    QueryDef("q140_volume_shipping", (s, d) => volumeShipping(s, d), Some(
      """WITH pairs AS (
        |  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
        |      AS volume
        |  FROM lineitem
        |    JOIN supplier ON s_suppkey = l_suppkey
        |    JOIN orders ON o_orderkey = l_orderkey
        |    JOIN customer ON c_custkey = o_custkey
        |    JOIN nation sn ON sn.n_nationkey = s_nationkey
        |    JOIN nation cn ON cn.n_nationkey = c_nationkey
        |  WHERE ((sn.n_name = 'NATION_0' AND cn.n_name = 'NATION_1')
        |      OR (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_0'))
        |    AND l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01')
        |SELECT supp_nation, cust_nation, l_year,
        |  CAST(SUM(volume) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM pairs
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)),

    QueryDef("q105_market_share", (s, d) => marketShare(s, d), Some(
      """WITH mkt AS (
        |  SELECT year(o_orderdate) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS rev,
        |    sn.n_name AS s_nation
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey),
        |agg AS (
        |  SELECT o_year, SUM(rev) AS tot_dec,
        |    SUM(CASE WHEN s_nation = 'NATION_0' THEN rev END) AS nat_dec
        |  FROM mkt GROUP BY o_year)
        |SELECT o_year,
        |  CAST(tot_dec AS DOUBLE) AS total_revenue,
        |  CAST(nat_dec AS DOUBLE) AS nation_revenue,
        |  CAST((CAST(floor(nat_dec * 100) AS HUGEINT) * 1000000)
        |    // CAST(floor(tot_dec * 100) AS HUGEINT) AS BIGINT) AS share_micro
        |FROM agg ORDER BY o_year""".stripMargin))
  )
}
