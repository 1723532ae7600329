package graft.queries

/** DuckDB twins of [[SqlQueries]]: same cent fixed point (round per row,
 * BIGINT sums, one final division), same filters and tie-breaks. */
object SqlOracles {

  def all: Map[String, String] = Map(

    "sql_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
        |       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
        |       CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_disc_price,
        |       CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "sql_revenue_nation" ->
      """SELECT r_name, n_name,
        |       CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
        |       CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "sql_exists_orders" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin,

    "sql_set_ops" ->
      """WITH ck AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
        |py AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |SELECT user_id, 'click_only' AS cohort FROM (SELECT user_id FROM ck EXCEPT SELECT user_id FROM py)
        |UNION ALL
        |SELECT user_id, 'click_and_buy' AS cohort FROM (SELECT user_id FROM ck INTERSECT SELECT user_id FROM py)""".stripMargin,

    "sql_topk_orders" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, o_totalprice, rn FROM r WHERE rn <= 3""".stripMargin,

    "sql_rollup_agg" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year, o_orderpriority,
        |       CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
        |       CAST(GROUPING(year(o_orderdate)) AS BIGINT) AS g_year,
        |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio
        |FROM orders
        |GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)""".stripMargin,

    "sql_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |       CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM customer
        |              WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,

    "sql_volume_pairs" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS INT) AS l_year,
        |       CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS volume,
        |       CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name < n2.n_name
        |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)""".stripMargin,

    "sql_returned_customers" ->
      """WITH agg AS (
        |  SELECT o_custkey,
        |         CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
        |         CAST(COUNT(*) AS BIGINT) AS n_items
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |  GROUP BY o_custkey)
        |SELECT o_custkey, c_name, n_name, revenue, n_items
        |FROM agg
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY revenue DESC, o_custkey ASC
        |LIMIT 20""".stripMargin,

    "sql_order_counts" ->
      """WITH oc AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
        |            FROM orders GROUP BY o_custkey)
        |SELECT COALESCE(n_orders, 0) AS c_count,
        |       CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM customer LEFT JOIN oc ON c_custkey = o_custkey
        |GROUP BY COALESCE(n_orders, 0)""".stripMargin,

    "sql_revenue_forecast" ->
      """SELECT CAST(SUM(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
        |       CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "sql_market_share" ->
      """WITH f AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |         n1.n_name AS supp_nation,
        |         CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT) AS rev
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  JOIN region ON n2.n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
        |SELECT o_year,
        |       round(CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN rev ELSE 0 END) AS DOUBLE)
        |             / CAST(SUM(rev) AS DOUBLE), 9) AS mkt_share,
        |       CAST(SUM(rev) AS DOUBLE) / 100.0 AS total_volume
        |FROM f GROUP BY o_year""".stripMargin,

    "sql_profit_nation" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |       CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
        |              - CAST(round(p_retailprice * l_quantity * 0.6 * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_profit,
        |       CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%gear%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY n_name, year(o_orderdate)""".stripMargin,

    "sql_top_supplier" ->
      """WITH q AS (
        |  SELECT l_suppkey,
        |         CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS c
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT l_suppkey, s_name, CAST(c AS DOUBLE) / 100.0 AS total_revenue
        |FROM q JOIN supplier ON l_suppkey = s_suppkey
        |WHERE c = (SELECT MAX(c) FROM q)""".stripMargin,

    "sql_small_qty_revenue" ->
      """WITH thr AS (
        |  SELECT l_partkey AS t_partkey, AVG(l_quantity) * 0.2 AS qty_thr
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / 7.0 AS avg_yearly,
        |       CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#3'
        |JOIN thr ON l_partkey = t_partkey
        |WHERE l_quantity < qty_thr""".stripMargin,

    "sql_big_orders" ->
      """WITH oq AS (
        |  SELECT l_orderkey, CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qc
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(round(l_quantity * 100) AS BIGINT)) > 25000)
        |SELECT c_name, o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |       CAST(qc AS DOUBLE) / 100.0 AS sum_qty
        |FROM oq
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 100""".stripMargin,

    "sql_idle_rich_customers" ->
      """WITH c AS (SELECT *, CAST(round(c_acctbal * 100) AS BIGINT) AS bc FROM customer),
        |a AS (SELECT CAST(SUM(bc) AS DOUBLE) / COUNT(*) AS avg_bc FROM c WHERE bc > 0)
        |SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_custs,
        |       CAST(SUM(bc) AS DOUBLE) / 100.0 AS total_acctbal
        |FROM c, a
        |WHERE CAST(bc AS DOUBLE) > avg_bc
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY c_nationkey""".stripMargin,

    "sql_late_lines" ->
      """SELECT l_returnflag,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
        |GROUP BY l_returnflag""".stripMargin,

    "sql_disjunctive_revenue" ->
      """SELECT CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
        |       CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 20 AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 21 AND 30 AND l_quantity BETWEEN 20 AND 40)""".stripMargin,

    "sql_bucketed_join" ->
      """SELECT o_orderpriority,
        |       CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
        |       CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "sql_grouping_sets" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year, o_orderpriority,
        |       CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
        |       CAST(GROUPING(year(o_orderdate)) AS BIGINT) AS g_year,
        |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio
        |FROM orders
        |GROUP BY GROUPING SETS ((year(o_orderdate)), (o_orderpriority), ())""".stripMargin,

    "sql_unpivot_measures" ->
      """WITH m AS (
        |  SELECT 'price' AS measure, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem
        |  UNION ALL
        |  SELECT 'discount', CAST(round(l_extendedprice * l_discount * 100) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'tax', CAST(round(l_extendedprice * l_tax * 100) AS BIGINT) FROM lineitem)
        |SELECT measure, CAST(SUM(cents) AS DOUBLE) / 100.0 AS total,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM m GROUP BY measure""".stripMargin,

    "sql_median_mode" ->
      """WITH byseg AS (
        |  SELECT c_mktsegment, o_totalprice, o_orderpriority
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |med AS (
        |  SELECT c_mktsegment, quantile_cont(o_totalprice, 0.5) AS median_price,
        |         CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM byseg GROUP BY c_mktsegment),
        |md AS (
        |  SELECT c_mktsegment, o_orderpriority AS mode_priority FROM (
        |    SELECT c_mktsegment, o_orderpriority,
        |           ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |             ORDER BY COUNT(*) DESC, o_orderpriority ASC) AS rn
        |    FROM byseg GROUP BY c_mktsegment, o_orderpriority)
        |  WHERE rn = 1)
        |SELECT med.c_mktsegment, med.median_price, med.n_orders, md.mode_priority
        |FROM med JOIN md USING (c_mktsegment)""".stripMargin,

    "evt_nullsafe_cohorts" ->
      """WITH e AS (
        |  SELECT event_type,
        |         NULLIF(CAST(json_extract_string(props, '$.k') AS BIGINT) % 10, 0) AS cohort
        |  FROM events),
        |c AS (SELECT cohort AS ck, CAST(COUNT(*) AS BIGINT) AS n_clicks
        |      FROM e WHERE event_type = 'click' GROUP BY cohort),
        |b AS (SELECT cohort AS bk, CAST(COUNT(*) AS BIGINT) AS n_buys
        |      FROM e WHERE event_type = 'purchase' GROUP BY cohort)
        |SELECT COALESCE(ck, bk) AS cohort,
        |       COALESCE(n_clicks, 0) AS n_clicks,
        |       COALESCE(n_buys, 0) AS n_buys
        |FROM c FULL JOIN b ON ck IS NOT DISTINCT FROM bk""".stripMargin,

    "sql_order_seq" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |       LAG(o_totalprice, 1) OVER w AS prev_price,
        |       LEAD(o_totalprice, 1) OVER w AS next_price,
        |       CAST(NTILE(4) OVER w AS INT) AS quartile,
        |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
        |              OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS run_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin,

    "sql_promo_revenue" ->
      """WITH r AS (
        |  SELECT CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT) AS rev,
        |         p_type
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |a AS (SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS BIGINT) AS promo_cents,
        |             CAST(SUM(rev) AS BIGINT) AS total_cents
        |      FROM r)
        |SELECT CAST(promo_cents AS DOUBLE) / 100.0 AS promo_revenue,
        |       CAST(total_cents AS DOUBLE) / 100.0 AS total_revenue,
        |       round(100.0 * CAST(promo_cents AS DOUBLE) / CAST(total_cents AS DOUBLE), 9) AS promo_share
        |FROM a""".stripMargin,

    // Q21 adaptation: the oracle keeps the textbook EXISTS / NOT EXISTS
    // correlated form — agreement with the engine's per-order aggregate
    // rewrite proves the rewrite
    "sql_waiting_supplier" ->
      """WITH w AS (
        |  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
        |  FROM lineitem l1 JOIN orders ON l1.l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |    AND EXISTS (SELECT 1 FROM lineitem l2
        |                WHERE l2.l_orderkey = l1.l_orderkey
        |                  AND l2.l_suppkey <> l1.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                    WHERE l3.l_orderkey = l1.l_orderkey
        |                      AND l3.l_suppkey <> l1.l_suppkey
        |                      AND l3.l_returnflag = 'R'))
        |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM w JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name ASC
        |LIMIT 20""".stripMargin,

    // Q2 shape: the oracle keeps the correlated scalar subquery the
    // engine rewrote into a per-brand MIN join; cent-exact equality
    "sql_min_price_part" ->
      """SELECT p_brand, p_partkey,
        |       CAST(CAST(round(p_retailprice * 100) AS BIGINT) AS DOUBLE) / 100.0 AS p_retailprice
        |FROM part p
        |WHERE CAST(round(p_retailprice * 100) AS BIGINT) =
        |  (SELECT MIN(CAST(round(p2.p_retailprice * 100) AS BIGINT))
        |   FROM part p2 WHERE p2.p_brand = p.p_brand)""".stripMargin,

    "sql_value_concentration" ->
      """WITH b AS (SELECT p_brand,
        |                  CAST(SUM(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS brand_cents
        |           FROM part GROUP BY 1),
        |g AS (SELECT CAST(SUM(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |      FROM part)
        |SELECT p_brand, CAST(brand_cents AS DOUBLE) / 100.0 AS brand_value,
        |       round(CAST(brand_cents AS DOUBLE) / CAST(total_cents AS DOUBLE), 9) AS share
        |FROM b, g WHERE brand_cents * 50 > total_cents""".stripMargin,

    "sql_supplier_variety" ->
      """SELECT p_type, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_type""".stripMargin
  )
}
