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
        |FROM a""".stripMargin
  )
}
