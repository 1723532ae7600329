package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Classic warehouse analytics over the TPC-H-style star schema
 * (TESTDATA.md) — the §2.11 presence map exercised for real: scan-heavy
 * aggregation, a multi-way star join with broadcast dimensions, and a
 * per-group top-k window. All money arithmetic is cent-exact fixed point
 * (round once per ROW, sum BIGINTs) so the aggregates are bit-stable
 * under any partitioning — the same idiom as the event value sums.
 *
 * Scale shape: the fact tables (`lineitem`, `orders`) only ever appear
 * under a single hash aggregate or a WindowGroupLimit; dimensions
 * (`nation`, `region`, `customer`) join broadcast, so nothing shuffles a
 * fact table except its own group-by key.
 */
object SqlQueries {

  private def t(s: SparkSession, d: String, name: String): DataFrame =
    s.read.parquet(s"$d/$name.parquet")

  /** round-half-away cents of a per-row money expression. */
  private def cents(c: org.apache.spark.sql.Column) =
    graft.functions.FastRound.round(c * 100, 0).cast("long")

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q1 shape: one scan, one map-side-combinable hash aggregate;
    // qty/price sums in exact cents, averages as a single final division
    "sql_pricing_summary" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          (sum(cents(col("l_quantity"))).cast("double") / 100.0).as("sum_qty"),
          (sum(cents(col("l_extendedprice"))).cast("double") / 100.0).as("sum_base_price"),
          (sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .cast("double") / 100.0).as("sum_disc_price"),
          count(lit(1)).as("count_order"))),

    // TPC-H Q5 shape: star join — lineitem ⋈ orders shuffles on the
    // orderkey once; customer/nation/region ride along broadcast
    "sql_revenue_nation" -> ((s, d) => {
      val rev = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      t(s, d, "lineitem").join(t(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg((sum(rev).cast("double") / 100.0).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q4 shape: correlated EXISTS as a left-semi join with a
    // non-equi residual (lineitem shipped after the order date)
    "sql_exists_orders" -> ((s, d) =>
      t(s, d, "orders").join(t(s, d, "lineitem"),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))),

    // set operations in anger: EXCEPT/INTERSECT cohorts over the event
    // stream (clickers who never bought vs clickers who did)
    "sql_set_ops" -> ((s, d) => {
      val e = graft.streaming.EventStreams.loadEvents(s, d)
      def users(tpe: String) = e.filter(col("event_type") === tpe)
        .select("user_id").distinct()
      users("click").except(users("purchase"))
        .withColumn("cohort", lit("click_only"))
        .unionByName(users("click").intersect(users("purchase"))
          .withColumn("cohort", lit("click_and_buy")))
    }),

    // per-customer top-3 orders by price — plans as WindowGroupLimit, so
    // each shuffle partition retains 3 rows per customer during the sort
    "sql_topk_orders" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("rn", row_number().over(
          Window.partitionBy("o_custkey")
            .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")),

    // ROLLUP hierarchy (year -> priority) in ONE pass: Spark expands the
    // grouping sets inside a single Expand + hash aggregate, so the fact
    // table is still scanned exactly once; per-level grouping flags
    // disambiguate real NULLs from subtotal rows
    "sql_rollup_agg" -> ((s, d) =>
      t(s, d, "orders")
        .select(year(col("o_orderdate")).as("o_year"),
          col("o_orderpriority"), col("o_totalprice"))
        .rollup("o_year", "o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          (sum(cents(col("o_totalprice"))).cast("double") / 100.0).as("revenue"),
          grouping(col("o_year")).cast("long").as("g_year"),
          grouping(col("o_orderpriority")).cast("long").as("g_prio"))),

    // TPC-H Q3 shape: segment-filtered customer broadcast-joined into
    // orders, orders shuffle-joined into lineitem on the order key, then a
    // global top-10 by revenue — deterministic tie-break on the order key
    // so LIMIT is stable under any partitioning; TakeOrderedAndProject
    // keeps 10 rows per partition, no global sort materializes
    "sql_shipping_priority" -> ((s, d) => {
      val cutoff = lit("1998-01-01 00:00:00").cast("timestamp")
      t(s, d, "lineitem").filter(col("l_shipdate") > cutoff)
        .join(t(s, d, "orders").filter(col("o_orderdate") < cutoff),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "customer")
            .filter(col("c_mktsegment") === "BUILDING")),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg((sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double") / 100.0).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // TPC-H Q7 shape: supplier-nation x customer-nation shipping volume by
    // year. lineitem shuffles once on the order key; supplier and both
    // nation copies ride broadcast; orders->customer is the second (and
    // last) fact shuffle, on the customer key
    "sql_volume_pairs" -> ((s, d) => {
      val n1 = broadcast(t(s, d, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")))
      val n2 = broadcast(t(s, d, "nation")
        .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation")))
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(n1, col("s_nationkey") === col("sn_key"))
        .join(n2, col("c_nationkey") === col("cn_key"))
        .filter(col("supp_nation") < col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg((sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double") / 100.0).as("volume"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q10 shape: returned-item revenue per customer, global top-20.
    // The returnflag filter reaches the lineitem scan (PushedFilters);
    // customer/nation join broadcast after the per-customer aggregate, so
    // the dimension join touches 20 rows' worth of groups, not the fact
    "sql_returned_customers" -> ((s, d) =>
      t(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg((sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double") / 100.0).as("revenue"),
          count(lit(1)).as("n_items"))
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .select(col("o_custkey"), col("c_name"), col("n_name"),
          col("revenue"), col("n_items"))
        .orderBy(col("revenue").desc, col("o_custkey").asc)
        .limit(20)),

    // TPC-H Q13 shape: order-count distribution INCLUDING zero-order
    // customers (left outer from the dimension) — two cascaded aggregates,
    // the second over at most max-orders-per-customer rows
    "sql_order_counts" -> ((s, d) => {
      val ocnt = t(s, d, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
      t(s, d, "customer")
        .join(ocnt, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("n_orders"), lit(0L)).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("n_customers"))
    }),

    // TPC-H Q6 shape: pure scan-side revenue delta — every predicate is a
    // parquet PushedFilter (timestamp range, double range, double bound),
    // so at 100 TB the row-group statistics skip most of the table before
    // a single row is decoded; one map-side-combinable global aggregate
    "sql_revenue_forecast" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg((sum(cents(col("l_extendedprice") * col("l_discount")))
          .cast("double") / 100.0).as("revenue"),
          count(lit(1)).as("n_items"))),

    // TPC-H Q8 shape: national market share — NATION_7's slice of STANDARD
    // part revenue sold into EUROPE customers, by order year. Fact tables
    // shuffle twice (orderkey, custkey); part is filtered before its join
    // (AQE picks the strategy — part scales with SF, unlike nation/region);
    // supplier/nation/region ride broadcast. Share = exact-cents ratio.
    "sql_market_share" -> ((s, d) => {
      val rev = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      val n1 = broadcast(t(s, d, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")))
      t(s, d, "lineitem")
        .join(t(s, d, "part").filter(col("p_type") === "STANDARD"),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(n1, col("s_nationkey") === col("sn_key"))
        .join(t(s, d, "orders")
            .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")).filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(sum(when(col("supp_nation") === "NATION_7", rev).otherwise(lit(0L))).as("_n"),
          sum(rev).as("_d"))
        .select(col("o_year"),
          graft.functions.FastRound.round(
            col("_n").cast("double") / col("_d").cast("double"), 9).as("mkt_share"),
          (col("_d").cast("double") / 100.0).as("total_volume"))
    }),

    // TPC-H Q9 shape: product-line profit by supplier nation and year.
    // ps_supplycost doesn't exist in this schema, so cost is proxied as
    // 60% of retail price x quantity — BOTH terms rounded to cents per
    // row, so the per-row profit is an exact BIGINT difference and the
    // aggregate is partitioning-stable. The p_name LIKE filter lands on
    // the part scan before its join.
    "sql_profit_nation" -> ((s, d) => {
      val profit = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))) -
        cents(col("p_retailprice") * col("l_quantity") * 0.6)
      t(s, d, "lineitem")
        .join(t(s, d, "part").filter(col("p_name").contains("gear")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg((sum(profit).cast("double") / 100.0).as("sum_profit"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q15 shape: top supplier(s) by quarterly revenue. The max is a
    // 1-row aggregate broadcast back over the per-supplier totals (the
    // view + HAVING = MAX of the original); exact-cents equality makes
    // the tie predicate bit-stable under any partitioning
    "sql_top_supplier" -> ((s, d) => {
      val q = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("_cents"))
      q.crossJoin(broadcast(q.agg(max(col("_cents")).as("_max"))))
        .filter(col("_cents") === col("_max"))
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_suppkey"), col("s_name"),
          (col("_cents").cast("double") / 100.0).as("total_revenue"))
    }),

    // TPC-H Q17 shape: revenue lost to small-quantity orders of one brand.
    // The correlated per-part AVG becomes a per-part aggregate joined back
    // to the fact — quantities are integral so the double AVG is an exact
    // ratio of exact sums, making the 0.2x threshold comparison
    // deterministic across engines and partitionings
    "sql_small_qty_revenue" -> ((s, d) => {
      val thr = t(s, d, "lineitem").groupBy(col("l_partkey").as("t_partkey"))
        .agg((avg(col("l_quantity")) * 0.2).as("qty_thr"))
      t(s, d, "lineitem")
        .join(t(s, d, "part").filter(col("p_brand") === "Brand#3"),
          col("l_partkey") === col("p_partkey"))
        .join(thr, col("l_partkey") === col("t_partkey"))
        .filter(col("l_quantity") < col("qty_thr"))
        .agg((sum(cents(col("l_extendedprice"))).cast("double") / 100.0 / 7.0)
          .as("avg_yearly"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q18 shape: large-volume orders — per-order quantity rollup
    // HAVING > 250, then the order/customer detail joins AFTER the
    // aggregate so they touch only the surviving ~1% of orders; global
    // top-100 with a deterministic key tie-break (TakeOrderedAndProject)
    "sql_big_orders" -> ((s, d) =>
      t(s, d, "lineitem").groupBy(col("l_orderkey"))
        .agg(sum(cents(col("l_quantity"))).as("_qc"))
        .filter(col("_qc") > 250 * 100L)
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          (col("_qc").cast("double") / 100.0).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)),

    // TPC-H Q22 shape: rich-but-idle customers — balance above the
    // positive-balance mean (1-row broadcast, exact-cents average) and no
    // orders since 2000 (anti join with a pushed date filter on the
    // orders side), rolled up per nation. The anti join is the scalable
    // NOT EXISTS: no distinct, no driver-side set
    "sql_idle_rich_customers" -> ((s, d) => {
      val c = t(s, d, "customer").withColumn("_bc", cents(col("c_acctbal")))
      val avgPos = c.filter(col("_bc") > 0)
        .agg((sum(col("_bc")).cast("double") / count(lit(1))).as("_avg"))
      val recent = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp"))
      c.crossJoin(broadcast(avgPos))
        .filter(col("_bc").cast("double") > col("_avg"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_custs"),
          (sum(col("_bc")).cast("double") / 100.0).as("total_acctbal"))
    }),

    // TPC-H Q12 shape: late-shipment priority mix — conditional counts
    // over one fact⋈fact join with a date-arithmetic residual (shipped
    // more than 90 days after ordering), grouped by return flag. The
    // CASE aggregation folds both priority classes into one pass
    "sql_late_lines" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))),

    // TPC-H Q19 shape: OR-of-ANDs over brand/size/quantity — the whole
    // disjunction stays inside whole-stage codegen as one vectorized
    // predicate, and the shared conjunct (size>=1, qty>=1) is what the
    // scan can still push; revenue in exact cents
    "sql_disjunctive_revenue" -> ((s, d) => {
      val m1 = col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
        col("l_quantity").between(1, 20)
      val m2 = col("p_brand") === "Brand#2" && col("p_size").between(11, 20) &&
        col("l_quantity").between(10, 30)
      val m3 = col("p_brand") === "Brand#3" && col("p_size").between(21, 30) &&
        col("l_quantity").between(20, 40)
      t(s, d, "lineitem")
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .filter(m1 || m2 || m3)
        .agg((sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double") / 100.0).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // co-located join over bucketed layouts: both fact tables were written
    // hash-bucketed on the order key (sources.Bucketed), so the equi-join
    // needs NO exchange on either side — the only shuffle in the plan is
    // the final tiny groupBy. At 100 TB this is the difference between
    // re-shuffling the corpus every query and amortizing one layout write
    "sql_bucketed_join" -> ((s, d) => {
      val li = graft.sources.Bucketed.table(s, d, "lineitem", "l_orderkey")
      val od = graft.sources.Bucketed.table(s, d, "orders", "o_orderkey")
      li.join(od, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg((sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double") / 100.0).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // explicit GROUPING SETS — two independent rollup axes plus the
    // grand total in ONE Expand + hash aggregate over one scan (neither
    // ROLLUP nor CUBE: the (year, priority) pair is deliberately absent);
    // grouping() flags disambiguate subtotal rows from real NULLs
    "sql_grouping_sets" -> ((s, d) => {
      val o = t(s, d, "orders").select(
        year(col("o_orderdate")).as("o_year"),
        col("o_orderpriority"), col("o_totalprice"))
      o.groupingSets(
          Seq(Seq(col("o_year")), Seq(col("o_orderpriority")), Seq()),
          col("o_year"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          (sum(cents(col("o_totalprice"))).cast("double") / 100.0).as("revenue"),
          grouping(col("o_year")).cast("long").as("g_year"),
          grouping(col("o_orderpriority")).cast("long").as("g_prio"))
    }),

    // UNPIVOT/melt: three money measures to long form in ONE scan —
    // Spark plans unpivot as a single Expand over one pass of the fact
    // (pinned by PlanSpec), where the naive UNION ALL form (the oracle's
    // formulation, semantically identical) would scan it three times
    "sql_unpivot_measures" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"),
          cents(col("l_extendedprice")).as("price"),
          cents(col("l_extendedprice") * col("l_discount")).as("discount"),
          cents(col("l_extendedprice") * col("l_tax")).as("tax"))
        .unpivot(Array(col("l_orderkey")),
          Array(col("price"), col("discount"), col("tax")),
          "measure", "cents")
        .groupBy("measure")
        .agg((sum(col("cents")).cast("double") / 100.0).as("total"),
          count(lit(1)).as("n"))),

    // robust per-segment stats: EXACT interpolated median via
    // Stats.exactPercentiles (distinct-value count prefix — O(1) task
    // memory regardless of group SIZE; the buffering percentile() holds
    // each group's value histogram, and 5 segments over a 100 TB orders
    // table means 5 enormous buffers) and a deterministic mode (max
    // count, smallest value on ties — never the engines' arbitrary-tie
    // mode() builtin). Interpolation matches DuckDB quantile_cont to the
    // ulp.
    "sql_median_mode" -> ((s, d) => {
      val byseg = t(s, d, "orders").join(broadcast(t(s, d, "customer")
          .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      val medians = graft.operators.Stats.exactPercentiles(byseg,
        Seq("c_mktsegment"), "o_totalprice",
        Seq("median_price" -> 0.5), countCol = Some("n_orders"))
      val mode = byseg.groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg(count(lit(1)).as("_cnt"))
        .withColumn("_rn", row_number().over(
          Window.partitionBy("c_mktsegment")
            .orderBy(col("_cnt").desc, col("o_orderpriority").asc)))
        .filter(col("_rn") === 1)
        .select(col("c_mktsegment"), col("o_orderpriority").as("mode_priority"))
      medians.join(mode, Seq("c_mktsegment"))
    }),

    // three-valued-logic showcase: full-outer join on a genuinely
    // NULLABLE key with null-safe equality (<=> / IS NOT DISTINCT FROM),
    // so the NULL-key cohorts on both sides match each other instead of
    // silently dropping — the semantics a plain equi-join gets wrong
    "evt_nullsafe_cohorts" -> ((s, d) => {
      val e = graft.streaming.EventStreams.loadEvents(s, d)
        .select(col("event_type"),
          // k % 10 == 0 -> NULL: a deterministic nullable cohort key
          when(get_json_object(col("props"), "$.k").cast("long") % 10 === 0, lit(null))
            .otherwise(get_json_object(col("props"), "$.k").cast("long") % 10)
            .as("cohort"))
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("cohort").as("ck")).agg(count(lit(1)).as("n_clicks"))
      val buys = e.filter(col("event_type") === "purchase")
        .groupBy(col("cohort").as("bk")).agg(count(lit(1)).as("n_buys"))
      clicks.join(buys, col("ck") <=> col("bk"), "full")
        .select(coalesce(col("ck"), col("bk")).as("cohort"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
          coalesce(col("n_buys"), lit(0L)).as("n_buys"))
    }),

    // sequence features over each customer's order history: lag/lead
    // neighbors, ntile quartile, and a running cent-exact total — ONE
    // window partition spec, so all four functions share a single sort
    // and exchange (order history per customer is bounded, no skew risk)
    "sql_order_seq" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          ntile(4).over(w).as("quartile"),
          (sum(cents(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double") / 100.0).as("run_total"))
    }),

    // TPC-H Q14 shape: promo revenue share — conditional aggregation over
    // one lineitem x part join, cent-exact sums, one-row result. No
    // broadcast hint on part: it scales with the fact tables (unlike
    // nation/region), so the join strategy is AQE's runtime call
    "sql_promo_revenue" -> ((s, d) => {
      val rev = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      t(s, d, "lineitem")
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .agg(sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0L))).as("promo_cents"),
          sum(rev).as("total_cents"))
        .select((col("promo_cents").cast("double") / 100.0).as("promo_revenue"),
          (col("total_cents").cast("double") / 100.0).as("total_revenue"),
          graft.functions.FastRound.round(lit(100.0) * col("promo_cents").cast("double")
            / col("total_cents").cast("double"), 9).as("promo_share"))
    }),

    // TPC-H Q21 shape (adapted: l_returnflag 'R' plays the late-receipt
    // role — the schema has no commit/receipt dates): suppliers who were
    // the ONLY 'R' supplier on a multi-supplier finished order. The two
    // correlated EXISTS / NOT EXISTS subqueries are rewritten as ONE
    // per-order aggregate (distinct suppliers, distinct 'R' suppliers):
    // a single pass over lineitem instead of two more self-joins — the
    // rewrite that matters when lineitem is the 100 TB table. Oracle
    // keeps the EXISTS form, so agreement proves the rewrite.
    "sql_waiting_supplier" -> ((s, d) => {
      // ONE lineitem scan (was two) and NO distinct-aggregate expansion:
      // collapse to distinct (order, supplier) rows with a late flag in a
      // plain two-stage aggregate, then count suppliers per order from
      // those rows (guide §2.3 — aggregate before you shuffle; the two
      // countDistincts expanded every lineitem row 3x into the shuffle).
      // The qualifying orders require EXACTLY ONE late supplier, so that
      // supplier rides the same aggregate as max(when(late, suppkey)) and
      // the join back onto the late (order, supplier) pairs disappears.
      // l_suppkey is non-null in this data; the filter pins the
      // countDistinct null semantics the old shape had either way.
      val perSupp = t(s, d, "lineitem")
        .filter(col("l_suppkey").isNotNull)
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("late"))
      val perOrder = perSupp.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"), sum(col("late")).as("n_late_supp"),
          max(when(col("late") === 1, col("l_suppkey"))).as("l_suppkey"))
      perOrder.filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "F")
          .select("o_orderkey"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(20)
    }),

    // TPC-H Q2 shape: correlated scalar subquery — each brand's
    // cheapest part(s). The subquery becomes a per-brand MIN joined
    // back; equality on the exact cent value, never on a double
    "sql_min_price_part" -> ((s, d) => {
      val p = t(s, d, "part").withColumn("price_cents", cents(col("p_retailprice")))
      val mins = p.groupBy(col("p_brand").as("mb"))
        .agg(min(col("price_cents")).as("min_cents"))
      p.join(mins, col("p_brand") === col("mb") &&
          col("price_cents") === col("min_cents"))
        .select(col("p_brand"), col("p_partkey"),
          (col("price_cents").cast("double") / 100.0).as("p_retailprice"))
    }),

    // TPC-H Q11 shape: HAVING against a GLOBAL aggregate scalar —
    // brands holding more than 2% of total retail value. The comparison
    // stays in exact integer cents (s * 50 > total, no division)
    "sql_value_concentration" -> ((s, d) => {
      val p = t(s, d, "part")
      val byBrand = p.groupBy("p_brand")
        .agg(sum(cents(col("p_retailprice"))).as("brand_cents"))
      val total = p.agg(sum(cents(col("p_retailprice"))).as("total_cents"))
      byBrand.crossJoin(broadcast(total))
        .filter(col("brand_cents") * 50 > col("total_cents"))
        .select(col("p_brand"),
          (col("brand_cents").cast("double") / 100.0).as("brand_value"),
          graft.functions.FastRound.round(
            col("brand_cents").cast("double") / col("total_cents").cast("double"), 9)
            .as("share"))
    }),

    // TPC-H Q16 shape: NOT IN anti-join + distinct count — how many
    // distinct suppliers (excluding negative-balance ones) ship each
    // part type, via the lineitem link table
    "sql_supplier_variety" -> ((s, d) =>
      t(s, d, "lineitem").select("l_partkey", "l_suppkey").distinct()
        .join(broadcast(t(s, d, "supplier")
            .filter(col("s_acctbal") < 0).select(col("s_suppkey"))),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy("p_type")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt")))
  )
}
