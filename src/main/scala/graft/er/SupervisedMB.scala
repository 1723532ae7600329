package graft.er

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Generalized supervised meta-blocking: the 9-feature generator
 * (python/sparker/feature_generator.py:60-249) and the 6 probability-driven
 * pruning strategies (python/sparker/supervised_metablocking.py), all as
 * DataFrame transformations. The reference broadcasts 6 driver-side maps
 * (feature_generator.py:96-122) — here each is a joined aggregate, so
 * nothing is O(dataset) on the driver.
 *
 * Feature semantics follow the PVLDB 2022 definitions. Documented
 * divergence: the reference accumulates RACCB/RS only from the FIRST
 * shared block it happens to iterate (feature_generator.py:146-151 guards
 * on cbs == 1), which is partition-order-dependent; we sum over all shared
 * blocks (the paper's definition, and deterministic). Top-k ties break by
 * neighbor id (the reference inherits Python sort stability on arrival
 * order).
 *
 * Logs are natural (math.log in the reference).
 */
object SupervisedMB {

  /**
   * Per-pair features over a valid block collection.
   * members: (key, profile_id, source_id); stats: (key, size, comparisons);
   * gt: optional converted ground truth (p1, p2) for the is_match label.
   *
   * Output: p1, p2, cfibf, raccb, js, num_comp_p1, num_comp_p2, rs, aejs,
   * nrs, wjs, is_match.
   */
  /** `stage` materializes the two multiply-consumed intermediates (the
   * O(co-occurrence) pair aggregate and the per-profile stats): the final
   * feature plan references `pairs` once directly and twice through the
   * s1/s2 sides of `prof`, so a fully lazy build re-executes the blocks
   * self-join THREE times (and the per-profile aggregate twice). Long-
   * lived builds (the warmup memo) pass Snapshot; the identity default
   * keeps one-shot uses lazy. */
  def features(members: DataFrame, stats: DataFrame, clean: Boolean,
               gt: Option[DataFrame] = None,
               stage: DataFrame => DataFrame = identity): DataFrame = {
    val m = members.join(stats.select("key", "size", "comparisons"), Seq("key"))

    // per-block own-source size (for redundant-comparison counts in clean
    // ER). Computed as a groupBy aggregation joined back, not a window:
    // map-side partials shrink a mega-block's contribution to one row per
    // input partition before the shuffle, and the join-back is AQE
    // skew-splittable where a partitionBy(key, source_id) window task is
    // not.
    val withOwn =
      if (clean) {
        val ownCounts = members.groupBy("key", "source_id")
          .agg(count(lit(1)).as("own"))
        m.join(ownCounts, Seq("key", "source_id"))
      } else m.withColumn("own", lit(1L))
    val neighborsInBlock =
      if (clean) col("size") - col("own") else col("size") - 1

    // per-profile aggregates (the reference's six broadcast maps).
    // Double sums go through Det.sumD: sorted sequential folds only in
    // verify mode (bit-stable vs the SQL oracle), plain codegen'd sums in
    // production/bench — the folds' collect_list over the O(co-occurrence)
    // pair intermediate was the single most expensive thing in the r1 bench.
    val exact = graft.util.Det.exactSums(members.sparkSession)
    def sortedSum(e: String) = graft.util.Det.sumD(exact, e)
    val perProfile = withOwn.groupBy("profile_id").agg(
      count(lit(1)).as("nblocks_p"),
      sortedSum("1.0 / cast(size as double)").as("inv_size_p"),
      sum(col("comparisons")).as("comp_p"),
      sortedSum("1.0 / cast(comparisons as double)").as("inv_comp_p"),
      sum(neighborsInBlock).as("redundant_p"))

    // globals as a 1-row frame
    val globals = stats.agg(
      count(lit(1)).cast("double").as("blocks_num"),
      sum(col("comparisons")).cast("double").as("total_comparisons"))

    // pair-level sums over shared blocks
    val a = m.select(col("key"), col("profile_id").as("p1"), col("source_id").as("s1"),
      col("size"), col("comparisons"))
    val b = m.select(col("key"), col("profile_id").as("p2"), col("source_id").as("s2"))
    val cond = if (clean) col("p1") < col("p2") && col("s1") =!= col("s2")
               else col("p1") < col("p2")
    val pairs = stage(a.join(b, Seq("key")).filter(cond)
      .groupBy("p1", "p2")
      .agg(count(lit(1)).as("cbs"),
        sortedSum("1.0 / cast(comparisons as double)").as("raccb_raw"),
        sortedSum("1.0 / cast(size as double)").as("rs")))

    // distinct-neighbor (non-redundant) degree per profile
    val degrees = pairs.select(col("p1").as("profile_id"))
      .union(pairs.select(col("p2").as("profile_id")))
      .groupBy("profile_id").agg(count(lit(1)).as("nonredundant_p"))

    val prof = stage(perProfile.join(degrees, Seq("profile_id"), "left")
      .na.fill(Map("nonredundant_p" -> 0L)))

    val s1 = prof.select(col("profile_id").as("p1"), col("nblocks_p").as("nb1"),
      col("inv_size_p").as("invsz1"), col("comp_p").as("comp1"),
      col("inv_comp_p").as("invcomp1"), col("redundant_p").as("red1"),
      col("nonredundant_p").as("nonred1"))
    val s2 = prof.select(col("profile_id").as("p2"), col("nblocks_p").as("nb2"),
      col("inv_size_p").as("invsz2"), col("comp_p").as("comp2"),
      col("inv_comp_p").as("invcomp2"), col("redundant_p").as("red2"),
      col("nonredundant_p").as("nonred2"))

    val joined = pairs.join(s1, Seq("p1")).join(s2, Seq("p2")).crossJoin(globals)

    val cbsD = col("cbs").cast("double")
    val raccb = greatest(col("raccb_raw"), lit(1.0e-6))
    val ibf1 = log(col("blocks_num") / col("nb1"))
    val ibf2 = log(col("blocks_num") / col("nb2"))
    val js1 = cbsD / (col("nb1") + col("nb2") - cbsD)

    val labeled = gt match {
      case Some(g) =>
        joined.join(g.select(col("p1"), col("p2"), lit(1).as("is_match")),
          Seq("p1", "p2"), "left").na.fill(Map("is_match" -> 0))
      case None => joined.withColumn("is_match", lit(null).cast("int"))
    }

    labeled.select(
      col("p1"), col("p2"),
      graft.functions.FastRound.round(cbsD * ibf1 * ibf2, 9).as("cfibf"),
      graft.functions.FastRound.round(raccb, 9).as("raccb"),
      graft.functions.FastRound.round(cbsD / (col("red1") + col("red2") - cbsD), 9).as("js"),
      col("nonred1").as("num_comp_p1"),
      col("nonred2").as("num_comp_p2"),
      graft.functions.FastRound.round(col("rs"), 9).as("rs"),
      graft.functions.FastRound.round(js1 * log(col("total_comparisons") / col("comp1"))
        * log(col("total_comparisons") / col("comp2")), 9).as("aejs"),
      graft.functions.FastRound.round(col("rs") / (col("invsz1") + col("invsz2") - col("rs")), 9).as("nrs"),
      graft.functions.FastRound.round(raccb / (col("invcomp1") + col("invcomp2") - raccb), 9).as("wjs"),
      col("is_match"))
  }

  /**
   * Deterministic stand-in for the classifier score: a fixed linear blend
   * of the Jaccard-family features (pure arithmetic — reproducible in the
   * SQL oracle; swap for `mlScore` in production use).
   */
  def deterministicScore(features: DataFrame): DataFrame =
    features.withColumn("p_match",
      graft.functions.FastRound.round((col("js") + col("nrs") + col("wjs")) / 3.0, 9))

  /** Frozen logistic model for the scoring projection: a model trained
   * once offline, then pinned as published constants — the pattern
   * production pipelines use to keep scoring reproducible across runs.
   * Because the coefficients are literals, the scoring projection has a
   * closed-form twin the SQL oracle reproduces hash-for-hash (the TRAINED
   * path, [[mlScore]], stays behind the holdout-AUC spec gate instead:
   * LBFGS probabilities aren't SQL-reproducible). The z accumulator folds
   * left-to-right in declared order; the oracle generates the identical
   * chain from this same Seq. */
  val FixedIntercept: Double = -6.0
  val FixedCoefficients: Seq[(String, Double)] = Seq(
    "cfibf" -> 0.01, "raccb" -> 2.0, "js" -> 4.0,
    "num_comp_p1" -> -0.001, "num_comp_p2" -> -0.001,
    "rs" -> 0.5, "aejs" -> 0.05, "nrs" -> 3.0, "wjs" -> 3.0)

  /** Score every pair with the frozen model: p = 1/(1+exp(-z)). Pure
   * projection over the feature frame — no shuffle, scan-speed at scale. */
  def fixedScore(features: DataFrame): DataFrame = {
    val z = FixedCoefficients.foldLeft(lit(FixedIntercept): Column) {
      case (acc, (c, w)) => acc + lit(w) * col(c)
    }
    features.withColumn("p_match",
      graft.functions.FastRound.round(lit(1.0) / (lit(1.0) + exp(-z)), 9))
  }

  /** Real classifier path: Spark ML logistic regression over the 9
   * features (the reference delegates to pyspark.ml the same way, training
   * on a labeled sample — Generalized Supervised Meta-blocking notebook).
   * Training runs on all positives plus a deterministic hash-sampled
   * negative set (~`negRatio` negatives per positive): every LBFGS pass
   * then scans O(sample) rows instead of the full O(edges) graph — at 100
   * TB the difference between a 20-pass full-graph scan and seconds —
   * while scoring still transforms EVERY edge.
   *
   * `trainOn` restricts the TRAINING rows to a predicate (scoring still
   * covers every row) — the holdout hook for model-quality gates: train on
   * a deterministic hash split, evaluate AUC on the complement. */
  def mlScore(features: DataFrame, labelCol: String = "is_match",
              negRatio: Double = 10.0,
              trainOn: Option[Column] = None): DataFrame = {
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.classification.LogisticRegression
    val cols = Array("cfibf", "raccb", "js", "rs", "aejs", "nrs", "wjs")
    val assembled = new VectorAssembler()
      .setInputCols(cols).setOutputCol("features_vec")
      .transform(features)
    val trainPool = trainOn.map(features.filter).getOrElse(features)
    val counts = trainPool.agg(
      sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("pos"),
      count(lit(1)).as("all")).first()
    // empty input -> NULL sum: treat as 0 positives instead of an NPE
    val (nPos, nAll) = (
      math.max(if (counts.isNullAt(0)) 0L else counts.getLong(0), 1L),
      counts.getLong(1))
    val nNeg = nAll - nPos
    // keep every ~1/mod-th negative via a deterministic pair hash; each
    // sampled negative carries weight `mod` (the negatives it stands in
    // for), so the learned intercept encodes the TRUE class prior and
    // p_match stays calibrated for the fixed-0.5 downstream thresholds
    val mod = math.max(1L, math.round(nNeg / (negRatio * nPos)))
    val train = trainOn.map(assembled.filter).getOrElse(assembled)
      .filter(col(labelCol) === 1 ||
        pmod(xxhash64(col("p1"), col("p2")), lit(mod)) === 0)
      .withColumn("sample_weight",
        when(col(labelCol) === 1, lit(1.0)).otherwise(lit(mod.toDouble)))
      .persist()
    val lr = new LogisticRegression()
      .setFeaturesCol("features_vec").setLabelCol(labelCol)
      .setWeightCol("sample_weight")
      .setMaxIter(20).setRegParam(0.01)
    val model = lr.fit(train)
    train.unpersist()
    // NOTE: the scoring closure serializes the model INCLUDING its
    // trainingSummary (a DataFrame + the SparkSession — copy() keeps the
    // summary, and setSummary is private[spark], so it can't be shed
    // here). That session must stay serializable: see the
    // graft.util.Snapshot.observed doc for the lazy-observationManager
    // trap that would break exactly this closure.
    // built-in vector accessor (codegen-friendly), not a per-row Scala udf
    model.transform(assembled)
      .withColumn("p_match",
        org.apache.spark.ml.functions.vector_to_array(col("probability")).getItem(1))
      .drop("features_vec", "rawPrediction", "probability", "prediction")
  }

  private val eps = 1e-9

  /** Classifier-positive edges (supervised_metablocking.py bcl — positive
   * predictions survive). */
  def bcl(scored: DataFrame): DataFrame =
    scored.filter(col("p_match") >= 0.5)

  /** Keep p >= mean(p) among the classifier-positive edges
   * (supervised_metablocking.py:29-36). */
  def wep(scored: DataFrame): DataFrame = {
    val overT = bcl(scored)
    val thr = overT.agg((sum(col("p_match")) / count(lit(1))).as("thr"))
    overT.crossJoin(thr).filter(col("p_match") >= col("thr") - eps).drop("thr")
  }

  /** Global top-(sum of block sizes / 2) by p among positives
   * (supervised_metablocking.py:16-25); deterministic (p desc, p1, p2)
   * tie order — a unique total order, so the selection is a distributed
   * orderBy().limit(k) (TakeOrderedAndProject / global-sort + limit), not
   * a single-partition rank window over every positive edge. k is one
   * driver-side scalar from an aggregate — the only eager action here. */
  def cep(scored: DataFrame, stats: DataFrame): DataFrame = {
    // empty stats -> NULL sum -> k=0 (empty result), not an NPE
    val kRow = stats.agg(floor(sum(col("size")) / 2.0).cast("long").as("k")).first()
    val k = if (kRow.isNullAt(0)) 0L else kRow.getLong(0)
    val kInt = math.min(k, Int.MaxValue.toLong).toInt
    bcl(scored)
      .orderBy(col("p_match").desc, col("p1").asc, col("p2").asc)
      .limit(kInt)
  }

  /** BLAST rule: p >= 0.35 * (max p of p1-side + max p of p2-side)
   * (supervised_metablocking.py:38-68; note the two maxes are over the p1 /
   * p2 orientations separately, exactly as the reference's two maps).
   *
   * `positives` is consumed three times (two maxes + the join); pass an
   * already-materialized frame (e.g. [[graft.queries.SupQueries.positives]]
   * — one shared snapshot for blast/cnp/rcnp) so each reader is a parquet
   * scan, not a recomputation — and never a per-call write. */
  def blast(positives: DataFrame): DataFrame = {
    val overT = positives
    val m1 = overT.groupBy("p1").agg(max(col("p_match")).as("max1"))
    val m2 = overT.groupBy("p2").agg(max(col("p_match")).as("max2"))
    overT.join(m1, Seq("p1")).join(m2, Seq("p2"))
      .filter(col("p_match") >= lit(0.35) * (col("max1") + col("max2")) - eps)
      .drop("max1", "max2")
  }

  /** Per-profile top-k by p over both orientations, k = 2*max(1,
   * sum(sizes)/#profiles) (supervised_metablocking.py:125-180); OR = CNP,
   * AND = reciprocal CNP (:70-123). Ties break by neighbor id.
   *
   * `positives` is read four times (two orientations + two retention
   * joins); pass a materialized frame (see [[blast]]). */
  def cnp(positives: DataFrame, stats: DataFrame, numberOfProfiles: Long,
          ct: ComparisonType.Value): DataFrame = {
    val overT = positives
    // literal k enables the WindowGroupLimit partial-top-k pushdown
    // (see MetaBlocking.cnp); empty stats -> NULL sum -> k=0 (empty result),
    // mirroring MetaBlocking.cnp's guard instead of an NPE on getLong
    val kRow = stats.agg(
      (lit(2.0) * greatest(lit(1.0), sum(col("size")).cast("double") / numberOfProfiles))
        .cast("long").as("k")).first()
    val k = if (kRow.isNullAt(0)) 0L else kRow.getLong(0)
    val top1 = overT.select(col("p1").as("a"), col("p2").as("b"), col("p_match"))
    val top2 = overT.select(col("p2").as("a"), col("p1").as("b"), col("p_match"))
    def topK(df: DataFrame): DataFrame = df
      .withColumn("rn", row_number().over(
        Window.partitionBy("a").orderBy(col("p_match").desc, col("b").asc)))
      .filter(col("rn") <= lit(k)).select("a", "b")
    // Survivor pairs from the SMALL top-k relations alone (<= k rows per
    // node), then ONE semi-join back onto the O(edges) positives instead
    // of two consecutive left joins over them (guide §3; the
    // MetaBlocking.cnp / reciprocalBestMatch posture). top1 retains in
    // (p1, p2) orientation, top2 in (p2, p1): OR is their canonical
    // union, AND their intersection.
    val t1 = topK(top1).select(col("a").as("p1"), col("b").as("p2"))
    val t2 = topK(top2).select(col("b").as("p1"), col("a").as("p2"))
    val kept = ct match {
      case ComparisonType.OR => t1.union(t2).distinct()
      case ComparisonType.AND => t1.join(t2, Seq("p1", "p2"), "left_semi")
    }
    overT.join(kept, Seq("p1", "p2"), "left_semi")
  }

  /** PC/PQ/F1 of labeled, scored edges (supervised_metablocking.py:182-203). */
  def stats(edges: DataFrame, gtSize: Long): DataFrame =
    edges.agg(
      sum(when(col("is_match") === 1, 1).otherwise(0)).as("num_matches"),
      count(lit(1)).as("num_edges"))
      .withColumn("pc", col("num_matches").cast("double") / gtSize)
      .withColumn("pq", col("num_matches").cast("double") / col("num_edges"))
      .withColumn("f1", when(col("pc") > 0 && col("pq") > 0,
        lit(2.0) * col("pc") * col("pq") / (col("pc") + col("pq"))).otherwise(lit(0.0)))
}
