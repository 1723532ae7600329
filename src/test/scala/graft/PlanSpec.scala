package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.er._
import graft.queries.SqlQueries

/**
 * Physical-plan regression tests: the scale properties this engine's
 * operators rely on (top-k pushdown, column pruning, filter pushdown,
 * broadcast choices, codegen) asserted against the planned query — so a
 * refactor that silently degrades the 100-TB plan (e.g. a non-literal k
 * defeating WindowGroupLimit, or a projection stopping short of the scan)
 * fails CI, not the next benchmark.
 */
class PlanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Final physical plan: AQE only finalizes (and picks codegen spans /
   * join strategies) during execution, so materialize first; keep only the
   * "== Final Plan ==" section (the toString repeats the initial plan
   * below it, which would double-count nodes). WholeStageCodegen spans
   * print as "*(id)" prefixes in this form. */
  private def plan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  /** Parquet-backed copy of a tiny fixture: several plan rules (e.g.
   * InferWindowGroupLimit) rightly skip LocalRelation inputs whose known
   * maxRows can't benefit — production operators always consume parquet
   * snapshots, so plan tests must too. */
  private def viaParquet(df: DataFrame): DataFrame = graft.util.Snapshot(df)

  test("cnp's literal k plans as WindowGroupLimit (partial top-k before exchange)") {
    val weighted = viaParquet(Seq((1L, 2L, 3.0, 3.0), (1L, 3L, 1.0, 1.0),
      (2L, 3L, 2.0, 2.0), (2L, 4L, 2.5, 2.5)).toDF("p1", "p2", "w1", "w2"))
    val stats = Seq(("k", 4L)).toDF("key", "size")
    val p = plan(MetaBlocking.cnp(weighted, stats, 2L, ComparisonType.OR,
      kOverride = Some(3L)))
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$p")
  }

  test("supervised cnp also keeps the WindowGroupLimit pushdown") {
    val scored = viaParquet(Seq((1L, 2L, 0.9, 0), (1L, 3L, 0.8, 0), (2L, 3L, 0.7, 0))
      .toDF("p1", "p2", "p_match", "is_match"))
    val stats = Seq(("k", 4L)).toDF("key", "size")
    val p = plan(SupervisedMB.cnp(scored, stats, 2L, ComparisonType.OR))
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$p")
  }

  test("survivors' rank-1 filter plans as WindowGroupLimit") {
    val cl = viaParquet(Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("doc_id", "cluster_rep"))
    val sc = viaParquet(Seq((1L, 5), (2L, 9), (3L, 2)).toDF("doc_id", "n_tokens"))
    val p = plan(graft.dedup.Dedup.survivors(cl, sc))
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$p")
  }

  test("goldenRecord computes every attribute mode in ONE aggregate exchange") {
    val cl = viaParquet(Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("doc_id", "cluster_rep"))
    val recs = viaParquet(Seq((1L, "en", "web"), (2L, "en", "book"), (3L, "de", "web"))
      .toDF("doc_id", "lang", "source"))
    val p = plan(graft.dedup.Dedup.goldenRecord(cl, recs, Seq("lang", "source")))
    // the mode aggregation shuffles once on cluster_rep, no matter how many
    // attribute columns are consolidated (the per-attribute fold paid one
    // aggregate + window + join PER attribute); the join's own exchanges
    // partition on doc_id, so cluster_rep-exchanges count the agg alone
    val clusterExchanges = "Exchange hashpartitioning\\(cluster_rep".r
      .findAllIn(p).size
    assert(clusterExchanges == 1,
      s"want exactly 1 cluster_rep exchange (single mode aggregate), got $clusterExchanges in:\n$p")
    assert(!p.contains("Window"), s"mode path must not need a window:\n$p")
  }

  test("SaltedJoin shuffles on (key, salt) so a hot key spreads across reducers") {
    val probe = viaParquet((1 to 50).map(i => ("hot", i.toLong)).toDF("k", "seq"))
    val build = viaParquet(Seq(("hot", 10), ("c", 20)).toDF("k", "v"))
    // disable auto-broadcast: a broadcast join would erase the exchange
    // this test inspects (production build sides exceed the threshold)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan(graft.operators.SaltedJoin.equiJoin(
        probe, build, Seq("k"), salt = 4, saltCols = Seq("seq")))
      assert(p.contains("__salt"), s"no __salt in the shuffle keys of:\n$p")
      assert(p.contains("hashpartitioning(k"), s"no hash exchange on k in:\n$p")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("containmentBloom broadcasts the 1-row mask and keeps the probe in codegen") {
    // the bench shingle must overlap the train side: an empty result lets
    // AQE collapse the whole plan to EmptyRelation and prove nothing
    val sh = viaParquet(Seq((1L, "a b c"), (2L, "x y z"), (50L, "a b c"))
      .toDF("doc_id", "shingle"))
    val p = plan(graft.dedup.Dedup.containmentBloom(
      sh.filter($"doc_id" =!= 50L), sh.filter($"doc_id" === 50L), 1L))
    // the bloom mask reaches the corpus side as a broadcast, never a shuffle
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"no broadcast of the bloom mask in:\n$p")
    // the probe (shiftright & 1) runs as a plain filter expression
    assert(p.contains("shiftright"), s"no shiftright probe in:\n$p")
  }

  test("domainCap prunes the documents scan to (doc_id, source) — no text column") {
    val df = graft.text.Curation.domainCap(
      spark.read.parquet(s"$sf/documents.parquet"), k = 5)
    val scan = plan(df).linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scan.contains("doc_id") && scan.contains("source"), scan)
    assert(!scan.contains("text"), s"text not pruned from scan: $scan")
  }

  test("query-side predicate is pushed into the embeddings scan") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val df = e.filter(col("vec_id") < 10).select("vec_id")
    val p = plan(df)
    assert(p.contains("PushedFilters") && p.contains("LessThan(vec_id,10)"),
      s"filter not pushed:\n$p")
  }

  test("brute-force ANN broadcasts the query side (nested-loop, never a shuffle)") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(graft.similarity.Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), k = 5))
    assert(p.contains("BroadcastNestedLoopJoin"), s"no broadcast NLJ in:\n$p")
  }

  test("LSH ANN candidate generation is a broadcast hash join on the bucket key") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(graft.similarity.Similarity.lshTopK(e, e.filter(col("vec_id") < 10), k = 5))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast hash join in:\n$p")
  }

  test("exact dedup is one hash exchange with codegen up to the shuffle") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.dedup.Dedup.exact(docs))
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected exactly 1 exchange, got $exchanges:\n$p")
    assert(p.contains("*("), s"no codegen span in:\n$p")
  }

  test("text analysis is one codegen'd projection over the scan (no exchange)") {
    // the fused TokenTextStats expression keeps the whole projection
    // inside whole-stage codegen — the HOF form (fused = false) is
    // CodegenFallback and drops the star
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.text.TextAnalysis.analyze(docs, "text"))
    assert(!p.contains("Exchange "), s"unexpected exchange in:\n$p")
    assert(p.linesIterator.count(_.contains("FileScan")) == 1, s"expected 1 scan:\n$p")
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
      s"projection not codegen'd:\n$p")
  }

  test("kmvDistinct keeps the min-k WindowGroupLimit pushdown") {
    // the sketch's scale contract: each partition keeps only its local
    // min-k before the exchange, so the shuffle never carries the
    // distinct set — a non-literal k would silently defeat this
    val hashes = viaParquet(Seq("a" -> 5L, "a" -> 9L, "b" -> 2L, "b" -> 7L)
      .toDF("lang", "h"))
    val p = plan(graft.text.Curation.kmvDistinct(hashes, k = 2))
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$p")
  }

  test("range join plans as a hash equi-join on the bin, never a nested loop") {
    // the whole point of the binned rewrite: a naive v BETWEEN lo AND hi
    // join is BroadcastNestedLoopJoin (O(|P|*|I|) compares when the
    // interval side outgrows a broadcast); the bin key makes it hash-
    // joinable. Both sides via parquet so the strategy choice is the
    // production one.
    val points = viaParquet(Seq(1L -> 3.0, 2L -> 9.5, 3L -> 77.0).toDF("pid", "v"))
    val ivals = viaParquet(Seq((10L, 0L, 8L), (11L, 4L, 32L)).toDF("iid", "lo", "hi"))
    val p = plan(graft.operators.RangeJoin.pointInInterval(
      points, "v", ivals, "lo", "hi", binWidth = 8L))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$p")
    assert(p.contains("HashJoin"), s"no hash join in:\n$p")
  }

  test("tfidf's literal top-k keeps the WindowGroupLimit pushdown") {
    val docs = viaParquet(Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text"))
    val p = plan(graft.text.Curation.tfidfTopK(docs, k = 3))
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$p")
  }

  test("kmeans assignment broadcasts centroids and pre-prunes the argmin window") {
    // the iteration's scale contract: centroids ship as a broadcast (the
    // corpus side never shuffles for the join) and the per-vector top-1
    // is a WindowGroupLimit, so the exchange behind it carries ~1 row
    // per vector instead of one per (vector, centroid)
    val embs = viaParquet(Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.9f, 0.2f))).toDF("vec_id", "embedding"))
    val cents = graft.similarity.KMeans.initCentroids(embs, k = 2)
    val p = plan(graft.similarity.KMeans.assignFinal(embs, cents))
    assert(p.contains("BroadcastNestedLoopJoin"), s"no broadcast join in:\n$p")
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$p")
  }

  test("co-bucketed tables join with ZERO exchanges (the repeated-join layout)") {
    // the 100 TB contract of Wrappers.writeBucketed: both sides laid out
    // hash-bucketed on the join key -> the SortMergeJoin reads buckets
    // directly, no shuffle of either side on any subsequent join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.range(1000).select(col("id").as("k"), (col("id") % 7).as("va"))
      val b = spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("vb"))
      graft.sources.Wrappers.writeBucketed(a, "bt_a", "k", 8)
      graft.sources.Wrappers.writeBucketed(b, "bt_b", "k", 8)
      val j = spark.table("bt_a").join(spark.table("bt_b"), "k")
      val p = plan(j)
      assert(p.contains("SortMergeJoin"), s"no SortMergeJoin in:\n$p")
      assert(!p.contains("Exchange"), s"shuffle inside a co-bucketed join:\n$p")
      assert(j.count() == 1000)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bt_a")
      spark.sql("DROP TABLE IF EXISTS bt_b")
    }
  }

  test("partitioned layout prunes scans: a partition filter opens only its directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part_").toString
    graft.util.Cleanup.onExitDelete(dir)
    val df = spark.range(100).select(col("id"),
      (col("id") % 4).cast("string").as("bucket_day"))
    graft.sources.Wrappers.writePartitioned(df, dir, Seq("bucket_day"))
    val filtered = spark.read.parquet(dir).filter(col("bucket_day") === "2")
    assert(filtered.count() == 25)
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(bucket_day"),
      s"partition filter not pushed to the scan:\n$p")
    // the data filter must NOT appear as a row-level PushedFilter: it is
    // resolved entirely by directory pruning
    val scanned = filtered.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(!scanned.contains("PushedFilters: [IsNotNull(bucket_day"),
      s"bucket_day unexpectedly evaluated row-level:\n$scanned")
  }

  test("upsertLatest's rank-1 filter plans as WindowGroupLimit") {
    val base = viaParquet(Seq((1L, 10L, 100L), (2L, 20L, 100L)).toDF("id", "k", "t"))
    val upd = viaParquet(Seq((3L, 10L, 200L)).toDF("id", "k", "t"))
    val p = plan(graft.operators.Merge.upsertLatest(base, upd, Seq("k"),
      Seq(col("t"), col("id"))))
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$p")
  }

  test("star join broadcasts every dimension; only the fact join shuffles") {
    val p = plan(SqlQueries.all("sql_revenue_nation")(spark, sf))
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length
    assert(bhj >= 3, s"expected customer/nation/region broadcast, got $bhj in:\n$p")
    // lineitem ⋈ orders is the only non-broadcast join
    val other = ("SortMergeJoin".r.findAllIn(p).length
      + "ShuffledHashJoin".r.findAllIn(p).length)
    assert(other <= 1, s"more than one shuffled join in:\n$p")
  }

  test("per-customer top-3 orders plans as WindowGroupLimit") {
    val p = plan(SqlQueries.all("sql_topk_orders")(spark, sf))
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$p")
  }

  test("shipping-priority top-10 plans as TakeOrderedAndProject, never a global sort") {
    val p = plan(SqlQueries.all("sql_shipping_priority")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"no TakeOrderedAndProject in:\n$p")
  }

  test("returned-customers pushes the returnflag filter into the lineitem scan") {
    val p = plan(SqlQueries.all("sql_returned_customers")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"no TakeOrderedAndProject in:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)")
      || p.contains("EqualTo(l_returnflag,R)"),
      s"returnflag filter not pushed to scan in:\n$p")
  }

  test("nation-pair volume broadcasts supplier and both nation dims") {
    val p = plan(SqlQueries.all("sql_volume_pairs")(spark, sf))
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length
    assert(bhj >= 3, s"expected supplier + 2 nations broadcast, got $bhj in:\n$p")
  }

  test("rollup expands grouping sets in one aggregate pass (single Expand, one scan)") {
    val p = plan(SqlQueries.all("sql_rollup_agg")(spark, sf))
    assert("Expand".r.findAllIn(p).length >= 1 && p.contains("orders.parquet"))
    assert("orders\\.parquet".r.findAllIn(p).length == 1,
      s"orders scanned more than once in:\n$p")
  }

  test("revenue-forecast pushes every predicate into the lineitem scan") {
    // default metadata truncation (100 chars) cuts the PushedFilters list
    // mid-entry; widen it so the assertion sees all three predicates
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val p = try plan(SqlQueries.all("sql_revenue_forecast")(spark, sf))
    finally spark.conf.unset("spark.sql.maxMetadataStringLength")
    // all three row-group-skippable predicates must reach the parquet
    // reader: at 100 TB these statistics prune most of the table unread
    assert(p.contains("GreaterThanOrEqual(l_discount,0.05)"),
      s"discount lower bound not pushed in:\n$p")
    assert(p.contains("LessThan(l_quantity,24"),
      s"quantity bound not pushed in:\n$p")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate range not pushed in:\n$p")
  }

  test("top-supplier's MAX is a 1-row broadcast, never a shuffle of the totals") {
    val p = plan(SqlQueries.all("sql_top_supplier")(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"1-row max not broadcast in:\n$p")
    // lineitem feeds exactly one aggregate spine; the max reuses it
    assert(!p.contains("CartesianProduct"), s"cartesian on the totals in:\n$p")
  }

  test("big-orders aggregates before joining: dimensions see only survivors") {
    val p = plan(SqlQueries.all("sql_big_orders")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"global sort instead of top-k in:\n$p")
    // customer is broadcast; the per-order rollup happens below the join
    assert(p.contains("BroadcastHashJoin"), s"customer dim not broadcast in:\n$p")
  }

  test("trimmed mean broadcasts the 5-row percentile bounds") {
    val p = plan(graft.queries.TrainQueries.all("evt_trimmed_mean")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"bounds dim not broadcast in:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"tiny bounds dim shuffled the fact side:\n$p")
  }

  test("waiting-supplier (Q21): aggregate rewrite scans lineitem twice, not thrice; top-k pushed") {
    val p = plan(SqlQueries.all("sql_waiting_supplier")(spark, sf))
    // textbook EXISTS + NOT EXISTS = 3 lineitem scans (probe + semi +
    // anti); the per-order aggregate rewrite needs only probe + aggregate
    val scans = "lineitem\\.parquet".r.findAllIn(p).length
    assert(scans <= 2, s"lineitem scanned $scans times in:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"global sort instead of top-k in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("supplier-variety (Q16): NOT IN plans as a broadcast anti-join") {
    val df = SqlQueries.all("sql_supplier_variety")(spark, sf)
    df.collect()
    // the INITIAL plan, not the AQE-final one: at this sf the excluded
    // set is empty and AQE's empty-relation propagation rightly deletes
    // the anti-join — the pin is about the shape AQE starts from
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), s"no anti-join in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("value-concentration (Q11): global total is a 1-row broadcast") {
    val p = plan(SqlQueries.all("sql_value_concentration")(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"1-row total not broadcast in:\n$p")
    assert("part\\.parquet".r.findAllIn(p).length == 2,
      s"part should feed the two aggregates once each in:\n$p")
  }

  test("label sampler: literal rank bound plans as WindowGroupLimit per stratum") {
    val p = plan(graft.queries.ErQueries.all("er_label_sample")(spark, sf))
    assert(p.contains("WindowGroupLimit"),
      s"per-stratum top-k not pushed below the exchange in:\n$p")
    assert(!p.contains("percentile("), s"buffering percentile in the binning:\n$p")
  }

  test("key-skew report: exact-percentile spine, 1-row max broadcast, no Percentile agg") {
    val p = plan(graft.queries.TrainQueries.all("evt_key_skew")(spark, sf))
    assert(!p.contains("percentile("),
      s"buffering percentile aggregate in the skew report:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"1-row max not broadcast in:\n$p")
  }

  test("leak matrix joins the pair graph to sources hash-wise, never a nested loop") {
    val p = plan(graft.queries.TrainQueries.all("dedup_leak_matrix")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in the leak matrix:\n$p")
  }

  test("no buffering percentile() aggregate anywhere in the six rewritten plans") {
    // VERDICT r6 #3: percentile() holds each group's value histogram in
    // the agg buffer — O(group size) memory, an OOM on 100 TB groups.
    // All six routes go through Stats.exactPercentiles (distinct-value
    // prefix, O(1) task memory); a regression would reappear in the plan
    // as a Percentile ObjectHashAggregate.
    val six = Seq(
      graft.queries.TrainQueries.all("evt_value_quantiles")(spark, sf),
      graft.queries.TrainQueries.all("evt_trimmed_mean")(spark, sf),
      graft.queries.TrainQueries.all("evt_winsorize")(spark, sf),
      graft.queries.TrainQueries.all("evt_mad_zscore")(spark, sf),
      graft.queries.TrainQueries.all("txt_quality_filter")(spark, sf),
      SqlQueries.all("sql_median_mode")(spark, sf))
    six.zipWithIndex.foreach { case (df, i) =>
      val p = plan(df)
      assert(!p.contains("percentile("),
        s"buffering percentile aggregate back in plan #$i:\n$p")
    }
  }

  test("CEP: literal threshold reaches the weighted scan as a pushed filter") {
    // The r8 rewrite resolves the threshold level eagerly so the
    // retained-edge scans filter on a LITERAL — which must reach the
    // weighted snapshot's parquet scan (row-group pruning at 100 TB). A
    // crossJoin/BroadcastNestedLoopJoin here means the 1-row subplan
    // pattern (which re-executed the histogram chain per consumer) is
    // back.
    val p = plan(graft.queries.ErQueries.all("er_cep_cbs_dirty")(spark, sf))
    assert(p.contains("GreaterThan(w1") && p.contains("PushedFilters: [IsNotNull(w1"),
      s"threshold not pushed into the weighted scan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"1-row crossJoin subplan back in CEP:\n$p")
  }

  test("frequency caps are aggregations joined back, never a per-key window") {
    // VERDICT r7 #1: count(1).over(Window.partitionBy(key)) streams every
    // occurrence of a hot key through ONE window task — no map-side
    // partials, and AQE skew-splits joins, not windows. The cap counts in
    // jaccardPairs / containmentPairs / supervised features must plan as
    // a (partial+final) aggregate plus a join-back; a physical Window
    // node in these plans is the straggler pattern coming back.
    val five = Seq(
      "dedup_jaccard" -> graft.queries.TrainQueries.all("dedup_jaccard")(spark, sf),
      "dedup_containment" -> graft.queries.TrainQueries.all("dedup_containment")(spark, sf),
      "sup_features" -> graft.queries.SupQueries.all("sup_features")(spark, sf),
      "dedup_exact" -> graft.queries.TrainQueries.all("dedup_exact")(spark, sf),
      "txt_winnow_pairs" -> graft.queries.TrainQueries.all("txt_winnow_pairs")(spark, sf))
    five.foreach { case (name, df) =>
      val p = plan(df)
      assert(!p.contains("Window ["),
        s"per-key Window computing a cap frequency in $name:\n$p")
    }
  }

  /** Partition keys of every logical Window node in `df`'s optimized plan
   * — the r7/r9 straggler pin's currency: a window partitioned by a VALUE
   * key (hash, token, shingle, span text) streams every occurrence of a
   * hot value through one task; only per-document windows (bounded by doc
   * length, never corpus size) are legitimate in these operators. */
  private def windowPartitionKeys(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.partitionSpec.flatMap(_.references.toSeq.map(_.name))
    }.flatten.distinct

  test("no operator elects representatives or counts frequencies via a value-key window") {
    // VERDICT r8 #1: the r7 caps fix applied narrowly — the identical
    // agg().over(Window.partitionBy(valueKey)) shape survived at five more
    // sites (winnowPairs cap, validBlocks, cappedKeys, Dedup.exact's
    // representative election, the span-keeper election). All five are now
    // aggregation + join-back; this pin walks the OPERATORS' logical plans
    // (the benched queries read memoized snapshots, hiding the internals)
    // and fails if any Window partitioned by something other than doc_id
    // reappears in these families.
    val docs = viaParquet(Seq(
      (1L, "a b c d e f g h i j k l"), (2L, "a b c d e f g h i j k l"),
      (3L, "x y z w v u t s r q p o"), (4L, "m n o p a b c d e f g h")
    ).toDF("doc_id", "text"))
    val keys = viaParquet(Seq((1L, 0, "k1"), (2L, 1, "k1"), (3L, 0, "k2"))
      .toDF("profile_id", "source_id", "key"))
    val pk = viaParquet(Seq(("k1", 1L), ("k1", 2L), ("k2", 3L))
      .toDF("key", "profile_id"))
    val fps = viaParquet(Seq((1L, 11L, 0L), (2L, 11L, 3L), (2L, 12L, 5L))
      .toDF("doc_id", "gram_hash", "pos"))

    assert(windowPartitionKeys(graft.dedup.Dedup.exact(docs)).isEmpty,
      "Dedup.exact elects representatives via a window again")
    assert(windowPartitionKeys(Blocking.validBlocks(keys, clean = true)).isEmpty,
      "validBlocks counts per-key stats via a window again")
    assert(windowPartitionKeys(
        Blocking.cappedKeys(pk, pk, 1000L, "plan_pin_cap")).isEmpty,
      "cappedKeys counts block sizes via a window again")
    assert(windowPartitionKeys(
        graft.text.TextAnalysis.winnowPairs(fps, minShared = 1)).isEmpty,
      "winnowPairs caps hash frequency via a window again")
    // span family: mergeIslands/reassembly legitimately window per doc_id
    Seq(
      "dupSpans" -> graft.text.Curation.dupSpans(docs, L = 3),
      "substrDupSpans" -> graft.text.Curation.substrDupSpans(docs, L = 5),
      "dupSpansRemoveWith" -> graft.text.Curation.dupSpansRemove(docs, L = 3),
      "contaminatedSpans" ->
        graft.text.Curation.contaminatedSpans(docs, docs.limit(1), L = 3)
    ).foreach { case (name, df) =>
      val bad = windowPartitionKeys(df).filterNot(_ == "doc_id")
      assert(bad.isEmpty,
        s"$name has a window partitioned by value key(s) ${bad.mkString(",")}")
    }
  }

  test("vocab overlap joins on the token hash-wise, never a nested loop") {
    val p = plan(graft.queries.TrainQueries.all("txt_vocab_overlap")(spark, sf))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), s"no equi-join on token in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"nested loop in the token self-join:\n$p")
  }

  test("unpivot is one Expand over ONE scan, not a union of three scans") {
    val p = plan(SqlQueries.all("sql_unpivot_measures")(spark, sf))
    assert(p.contains("Expand"), s"no Expand in:\n$p")
    assert("lineitem\\.parquet".r.findAllIn(p).length == 1,
      s"lineitem scanned more than once in:\n$p")
  }

  test("graft_topk plans as ObjectHashAggregate partial+final — input never sorted") {
    val df = graft.queries.TrainQueries.all("evt_topk_agg")(spark, sf)
    val p = plan(df)
    assert(p.contains("ObjectHashAggregate") && p.contains("partial_topklongs"),
      s"heap aggregate lost its partial hash stage in:\n$p")
    assert(!p.contains("SortAggregate"),
      s"heap aggregate fell back to a sort-based plan:\n$p")
  }

  test("null-safe full-outer join plans as an equi-join, never a nested loop") {
    // <=> is still an equi-join key (Spark coalesces it into the hash/sort
    // key); a BNLJ here would be quadratic at scale
    val p = plan(SqlQueries.all("evt_nullsafe_cohorts")(spark, sf))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), s"no equi-join in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"nested loop for a null-safe equi-join:\n$p")
  }

  test("order-sequence features share ONE window sort (single exchange+sort)") {
    val p = plan(SqlQueries.all("sql_order_seq")(spark, sf))
    // lag/lead/ntile/running-sum all use the same (partition, order) spec:
    // they must fuse into one Window pass over one sort
    val exchanges = "Exchange hashpartitioning\\(o_custkey".r.findAllIn(p).size
    assert(exchanges == 1, s"want 1 exchange for the shared window spec, got $exchanges in:\n$p")
    val sorts = "\\bSort \\[".r.findAllIn(p).size
    assert(sorts <= 2, s"window functions did not share the sort:\n$p")
  }

  test("bucketed fact join: the ONLY exchange is the final groupBy") {
    // force the join strategy a 100 TB fact⋈fact join would get (at
    // sf0.001 orders would broadcast, hiding the layout's value)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val d = "/root/testdata/sf0.001"
      val q = SqlQueries.all("sql_bucketed_join")(spark, d)
      val p = plan(q)
      assert(p.contains("SortMergeJoin"), s"no SortMergeJoin in:\n$p")
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(exchanges == 1,
        s"want exactly 1 exchange (the groupBy), got $exchanges in:\n$p")
      assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
        !p.contains("Exchange hashpartitioning(o_orderkey"),
        s"join side shuffled despite bucketing:\n$p")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
