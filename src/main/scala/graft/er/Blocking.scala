package graft.er

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Schema-agnostic blocking: turns profiles (in the normalized "long"
 * attribute layout) into blocking keys and block collections.
 *
 * Data model conventions (all plain DataFrames so Catalyst can optimize
 * end-to-end; no collected indexes anywhere):
 *
 *  - attrs:   (profile_id: long, source_id: int, attribute: string, value: string)
 *  - keys:    (profile_id: long, source_id: int, key: string)       distinct per profile
 *  - members: (key: string, profile_id: long, source_id: int)       long-form block collection
 *  - stats:   (key: string, size: long, comparisons: long, arcs_comparisons: double)
 *
 * A block is identified by its blocking key (dense numeric block ids are a
 * presentation detail, see [[Blocking.withDenseBlockIds]]); keeping the key
 * as the identifier removes a global zipWithIndex from the hot path, which
 * matters at scale.
 *
 * Reference semantics: python/sparker/blocking_strategies.py:33-80 (token /
 * attr-qualified / n-gram keys), python/sparker/blockers.py:81-113
 * (create_blocks), python/sparker/objects.py:90-198 (comparison counts:
 * dirty n*(n-1), clean sum of cross-source products).
 */
object Blocking {

  /** Tokenizer equivalent to the reference's `re.split('\W+', value.lower())`
   * (python/sparker/blocking_strategies.py:52). Unicode-aware like Python's
   * \W: word characters are letters, digits and underscore in any script
   * (verified against the reference on its own accented-author datasets —
   * QualityParitySpec). The same character class is used in the DuckDB
   * oracles (RE2 \p{L}\p{N}). */
  val TokenSplitRe = "[^\\p{L}\\p{N}_]+"

  /** The reference's removeBadWords stopword list: Spark ML's default
   * english stopwords (scala ref TokenBlocking.scala:18-24). */
  lazy val EnglishStopWords: Seq[String] =
    org.apache.spark.ml.feature.StopWordsRemover.loadDefaultStopWords("english").toSeq

  /**
   * Token blocking keys: lowercase, split on non-word chars, drop empties and
   * excluded keys, distinct per profile.
   * Mirrors BlockingKeysStrategies.token_blocking
   * (python/sparker/blocking_strategies.py:33-55); `attrQualified = true`
   * mirrors token_blocking_w_attr (`attr_token` keys, :6-31);
   * `removeStopWords = true` mirrors removeBadWords (scala ref
   * TokenBlocking.scala:18-24): keep only all-letter or all-digit tokens
   * not in the default english stopword list. (Divergence: the reference
   * filters the final key string, which with attr-qualified keys would drop
   * every key because of the '_'; we filter the token.)
   */
  def tokenKeys(
      attrs: DataFrame,
      attributesToExclude: Seq[String] = Nil,
      keysToExclude: Seq[String] = Nil,
      attrQualified: Boolean = false,
      removeStopWords: Boolean = false): DataFrame = {
    val base = attrs
      .filter(col("attribute").isNotNull && col("value").isNotNull)
      .filter(if (attributesToExclude.isEmpty) lit(true)
              else !col("attribute").isin(attributesToExclude: _*))
      .select(col("profile_id"), col("source_id"), col("attribute"),
        explode(split(lower(col("value")), TokenSplitRe)).as("token"))
      .filter(length(col("token")) > 0)
      .filter(if (keysToExclude.isEmpty) lit(true)
              else !col("token").isin(keysToExclude: _*))
      .filter(if (!removeStopWords) lit(true)
              else (col("token").rlike("^[a-z]+$") || col("token").rlike("^[0-9]+$")) &&
                !col("token").isin(EnglishStopWords: _*))
    val keyed =
      if (attrQualified)
        base.select(col("profile_id"), col("source_id"),
          concat(col("attribute"), lit("_"), col("token")).as("key"))
      else
        base.select(col("profile_id"), col("source_id"), col("token").as("key"))
    // dropDuplicates, not distinct(): identical batch plan (both rewrite
    // to a hash Aggregate), but Deduplicate is ALSO a supported streaming
    // operator, so the same blocking-key projection runs unchanged as a
    // Structured Stream (see EventStreams.tokenBlockingStreaming)
    keyed.dropDuplicates()
  }

  /**
   * Character n-gram keys over tokens, padded with '_' * (n-1) on both sides.
   * Mirrors BlockingKeysStrategies.ngrams_blocking + Utils.get_ngrams
   * (python/sparker/blocking_strategies.py:57-80, python/sparker/utils.py:6-17).
   * Implemented with built-in higher-order functions (sequence + substring)
   * so the whole expression stays inside codegen.
   */
  def ngramKeys(
      attrs: DataFrame,
      n: Int = 3,
      attributesToExclude: Seq[String] = Nil,
      keysToExclude: Seq[String] = Nil): DataFrame = {
    require(n >= 2, "ngram size must be >= 2")
    val pad = "_" * (n - 1)
    val toks = tokenKeys(attrs, attributesToExclude, Nil)
      .withColumn("padded", concat(lit(pad), col("key"), lit(pad)))
    toks
      .select(col("profile_id"), col("source_id"),
        explode(expr(s"transform(sequence(1, length(padded) - ${n - 1}), i -> substring(padded, i, $n))")).as("key"))
      .filter(if (keysToExclude.isEmpty) lit(true)
              else !col("key").isin(keysToExclude: _*))
      .distinct()
  }

  /**
   * Suffix blocking keys (Aizawa & Oyama, "A Fast Linkage Detection
   * Scheme for Multi-Source Information Integration", WIRI'05): every
   * suffix of length >= minLen of each token key. Two records whose
   * tokens differ by a prefix typo or truncation still share their
   * common tail, so they land in a block that plain token blocking
   * misses. Same codegen-friendly explode shape as [[ngramKeys]]; key
   * volume per token is length - minLen + 1 (bounded, linear in text).
   */
  def suffixKeys(
      attrs: DataFrame,
      minLen: Int = 4,
      attributesToExclude: Seq[String] = Nil): DataFrame = {
    require(minLen >= 1, "suffix minLen must be >= 1")
    tokenKeys(attrs, attributesToExclude, Nil)
      .filter(length(col("key")) >= minLen)
      .select(col("profile_id"), col("source_id"),
        explode(expr(s"transform(sequence(1, length(key) - ${minLen - 1}), i -> substring(key, i, length(key)))")).as("key"))
      .dropDuplicates()
  }

  /**
   * Restrict a key collection to valid blocks: >= 2 profiles, and for
   * clean(-clean) ER at least two distinct sources
   * (python/sparker/blockers.py:106-110).
   *
   * The per-key count/min-source/max-source is an AGGREGATION joined back,
   * not a window: this runs BEFORE purging, i.e. on the hottest unpurged
   * tokens in the corpus, exactly where `count().over(partitionBy(key))`
   * would stream every member of a stopword block through ONE task (no
   * map-side partials; AQE skew-splits joins, not windows). The groupBy
   * collapses hot keys map-side and the semi-join back is skew-splittable.
   */
  def validBlocks(keys: DataFrame, clean: Boolean): DataFrame = {
    val stats = keys.groupBy("key").agg(
      count(lit(1)).as("_n"),
      min(col("source_id")).as("_smin"),
      max(col("source_id")).as("_smax"))
    val valid =
      if (clean) stats.filter(col("_n") > 1 && col("_smin") =!= col("_smax"))
      else stats.filter(col("_n") > 1)
    keys.join(valid.select("key"), Seq("key"), "left_semi")
      .select(col("key"), col("profile_id"), col("source_id"))
  }

  /**
   * Incremental blocking: the candidate pairs a NEW batch of profiles
   * introduces against a standing corpus — the production path when
   * profiles keep arriving after the initial ER run and re-running the
   * full pipeline over O(corpus) is wasteful. A pair qualifies when the
   * two profiles share at least one blocking key whose COMBINED block
   * stays within `maxBlockSize` (oversized keys are purged — the same
   * skew bound block purging applies semantically) and at least one side
   * is new. Returns (p1, p2, n_new) with n_new = 2 for new-new pairs and
   * 1 for new-old.
   *
   * Scale shape: old-old pairs are never formed — the join's left side
   * is only the new batch's keys, so the work is O(|new keys| x mean
   * bounded block size), independent of corpus size; the key-size filter
   * bounds skew before the join, and the dedup aggregate shuffles
   * O(new-pair) rows only. The standing corpus side is a parquet scan of
   * its key snapshot, never recomputed.
   */
  def incrementalPairs(existingKeys: DataFrame, newKeys: DataFrame,
                       maxBlockSize: Long = 1000L): DataFrame =
    incrementalPairsFrom(cappedKeys(existingKeys, newKeys, maxBlockSize,
      "incremental_pairs_cap"))

  /** [[incrementalPairs]] from a pre-capped (key, profile_id, is_new)
   * union — e.g. the per-dir snapshot every incremental query shares
   * (re-deriving the capped-key window per query was most of the
   * incremental family's steady cost). */
  def incrementalPairsFrom(sized: DataFrame): DataFrame = {
    val a = sized.filter(col("is_new") === 1)
      .select(col("key"), col("profile_id").as("pa"))
    val b = sized.select(col("key"), col("profile_id").as("pb"), col("is_new").as("nb"))
    a.join(b, Seq("key"))
      .filter(col("pa") =!= col("pb"))
      .select(least(col("pa"), col("pb")).as("p1"),
        greatest(col("pa"), col("pb")).as("p2"),
        (lit(1) + col("nb")).cast("int").as("n_new"))
      .distinct()
  }

  /** The capped (key, profile_id, is_new) union both incremental operators
   * start from: corpus keys tagged old, batch keys tagged new, keys whose
   * COMBINED block exceeds `maxBlockSize` purged. The cap changes recall,
   * so the purge count is observable (metrics node `metricName`,
   * [[graft.util.CapMetrics]]). */
  def cappedKeys(existingKeys: DataFrame, newKeys: DataFrame,
                 maxBlockSize: Long, metricName: String): DataFrame = {
    val all = existingKeys.select(col("key"), col("profile_id"))
      .withColumn("is_new", lit(0))
      .unionByName(newKeys.select(col("key"), col("profile_id"))
        .withColumn("is_new", lit(1)))
    // hot-key purge via aggregation + broadcast-sized join-back, never a
    // per-key window — graft.util.CapMetrics.dropHotKeys documents why
    graft.util.CapMetrics.dropHotKeys(all, "key", maxBlockSize, metricName)
  }

  /**
   * Incremental meta-blocking: [[incrementalPairs]]' candidates weighted
   * and pruned, completing the incremental path end-to-end (candidates ->
   * weighted graph -> per-profile pruning) without ever touching the
   * O(corpus) neighborhood graph. Threshold = the WNP average scheme, but
   * LOCAL TO THE ARRIVING BATCH: each new profile's threshold is the mean
   * weight of its own incremental edges (an incremental system cannot
   * recompute the standing corpus's neighborhoods, and never forms
   * old-old edges). A pair survives when it meets the threshold of ANY
   * new endpoint (the OR composition, matching [[MetaBlocking.wnp]]).
   *
   * Weight schemes (mirroring the batch §2.6 matrix on batch-computable
   * statistics, python/sparker/common_node_pruning.py:203-262 semantics):
   *  - CBS: shared capped-key count; the threshold test is exact integer
   *    arithmetic (cbs * n_edges >= sum_cbs <=> cbs >= mean), so no
   *    floating-point divergence exists for the oracle to trip on.
   *  - JS (Jaccard): cbs / (|keys(src)| + |keys(dst)| - cbs) over the
   *    capped key sets. Per-profile key counts are one map-side-combinable
   *    aggregate over the capped union — in production the corpus side of
   *    that statistic is maintained incrementally with the key snapshot,
   *    not recomputed per batch. Fractional weights make the mean
   *    threshold a double; the keep test subtracts `eps` (1e-9), the same
   *    ULP guard the batch WNP uses for fractional schemes.
   *
   * Scale shape: directed edges only from new profiles, one countDistinct
   * aggregate + one per-src aggregate over O(|new batch| x bounded block
   * size) rows.
   *
   * Returns (p1, p2, cbs, w, n_new): `w` is the scheme weight (cbs as
   * double under CBS), n_new as in [[incrementalPairs]].
   */
  def incrementalWnp(existingKeys: DataFrame, newKeys: DataFrame,
                     maxBlockSize: Long = 1000L,
                     weight: WeightType.Value = WeightType.CBS,
                     eps: Double = 1e-9): DataFrame =
    incrementalWnpFrom(cappedKeys(existingKeys, newKeys, maxBlockSize,
      "incremental_wnp_cap"), weight, eps)

  /** [[incrementalWnp]] from a pre-capped (key, profile_id, is_new)
   * union (see [[incrementalPairsFrom]]). */
  def incrementalWnpFrom(sized: DataFrame,
                         weight: WeightType.Value = WeightType.CBS,
                         eps: Double = 1e-9): DataFrame = {
    require(weight == WeightType.CBS || weight == WeightType.JS,
      s"incrementalWnp supports CBS and JS, got $weight")
    val a = sized.filter(col("is_new") === 1)
      .select(col("key"), col("profile_id").as("src"))
    val b = sized.select(col("key"), col("profile_id").as("dst"), col("is_new").as("nb"))
    // count(1), not countDistinct(key): (key, profile_id) is unique in the
    // capped union (tokenKeys deduplicates per profile and the old/new
    // profile sets are disjoint), so the equi-join emits each (key, src,
    // dst) at most once and the plain count equals the distinct count —
    // without the two-phase distinct-aggregate expansion over the O(new
    // candidates) join output (guide §2.3: aggregate before you shuffle).
    val deCbs = a.join(b, Seq("key")).filter(col("src") =!= col("dst"))
      .groupBy("src", "dst", "nb").agg(count(lit(1)).as("cbs"))
    // directed new->any edges; snapshot: read by the threshold aggregate
    // and the pruning join (small: O(new-batch candidates))
    val de = graft.util.Snapshot(weight match {
      case WeightType.CBS =>
        deCbs.withColumn("w", col("cbs").cast("double"))
      case _ =>
        // same uniqueness argument: one row per (key, profile_id)
        val kc = sized.groupBy("profile_id").agg(count(lit(1)).as("nk"))
        deCbs
          .join(kc.select(col("profile_id").as("src"), col("nk").as("k1")), Seq("src"))
          .join(kc.select(col("profile_id").as("dst"), col("nk").as("k2")), Seq("dst"))
          .withColumn("w", col("cbs").cast("double") /
            (col("k1") + col("k2") - col("cbs")).cast("double"))
          .select("src", "dst", "nb", "cbs", "w")
    })
    val keep =
      if (weight == WeightType.CBS) {
        val thr = de.groupBy("src").agg(count(lit(1)).as("n_e"), sum("cbs").as("s"))
        de.join(thr, Seq("src")).filter(col("cbs") * col("n_e") >= col("s"))
      } else {
        val thr = de.groupBy("src").agg((sum(col("w")) / count(lit(1))).as("theta"))
        de.join(thr, Seq("src")).filter(col("w") >= col("theta") - eps)
      }
    keep
      .select(least(col("src"), col("dst")).as("p1"),
        greatest(col("src"), col("dst")).as("p2"),
        col("cbs"), col("w"), (lit(1) + col("nb")).cast("int").as("n_new"))
      .distinct()
  }

  /**
   * Per-block statistics. `comparisons` follows the reference's
   * get_comparison_size (dirty: n*(n-1), python/sparker/objects.py:186-190;
   * clean: sum over source pairs of |si|*|sj|, objects.py:127-143).
   * `arcs_comparisons` is the divisor the reference's ARCS weighting uses
   * (dirty: n*(n-1); clean: product over *all* source partitions — empty
   * partitions make it 0, a faithful reference quirk,
   * python/sparker/common_node_pruning.py:185-201).
   */
  def blockStats(members: DataFrame, clean: Boolean, numSources: Int = 2): DataFrame = {
    if (!clean) {
      members.groupBy("key")
        .agg(count(lit(1)).as("size"))
        .select(col("key"), col("size"),
          (col("size") * (col("size") - 1)).as("comparisons"),
          (col("size") * (col("size") - 1)).cast("double").as("arcs_comparisons"))
    } else {
      members.groupBy("key", "source_id")
        .agg(count(lit(1)).as("s"))
        .groupBy("key")
        .agg(
          sum(col("s")).as("size"),
          ((sum(col("s")) * sum(col("s")) - sum(col("s") * col("s"))) / 2).cast("long").as("comparisons"),
          count(lit(1)).as("_nsrc"),
          // deterministic product (sorted, sequential) of per-source sizes
          expr("aggregate(array_sort(collect_list(cast(s as double))), cast(1.0 as double), (acc, x) -> acc * x)").as("_arcs_exact"))
        .select(col("key"), col("size"), col("comparisons"),
          // empty source partitions zero the product (reference quirk)
          when(col("_nsrc") < numSources, lit(0.0)).otherwise(col("_arcs_exact")).as("arcs_comparisons"))
    }
  }

  /**
   * Sorted-neighborhood blocking (Hernandez & Stolfo, SIGMOD '95): records
   * sorted by a blocking key, every pair at sort distance < `window`
   * becomes a candidate — the classic complement to token blocking for
   * typo-heavy keys (a complement the reference leaves to token/n-gram
   * strategies, python/sparker/blocking_strategies.py).
   *
   * Spark-first, 100x-safe:
   *  - the global rank is the two-phase distributed scan
   *    ([[graft.util.Prefix.runningSum]] of 1 over (sort_key, profile_id)) —
   *    never a single-partition `Window.orderBy`;
   *  - the sliding window becomes an equi-join on rank buckets of width
   *    (window-1): a pair at distance <= window-1 lives in the same or the
   *    next bucket, so the left side probes exactly those two buckets.
   *    Lossless by the pigeonhole of contiguous buckets, and a plain
   *    shuffled hash join on a dense integer key — no range probe, no skew
   *    (every bucket holds exactly window-1 ranks).
   *
   * Input: (profile_id, sort_key); ties on sort_key break by profile_id so
   * the rank (and the oracle's ROW_NUMBER) is a total order.
   * Output: (p1, p2, dist) with p1 preceding p2 in sort order,
   * 1 <= dist <= window-1.
   */
  def sortedNeighborhood(keyed: DataFrame, window: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val width = (window - 1).toLong
    val ranked = graft.util.Prefix.runningSum(
        keyed.select(col("profile_id"), col("sort_key")),
        Seq(col("sort_key"), col("profile_id")), lit(1L), "rank")
      .select(col("profile_id"), col("rank").cast("long").as("rank"))
    val bucketed = ranked.withColumn("b", expr(s"(rank - 1) div $width"))
    val probe = bucketed
      .withColumn("b", explode(array(col("b"), col("b") + 1)))
      .select(col("profile_id").as("p1"), col("rank").as("r1"), col("b"))
    val build = bucketed
      .select(col("profile_id").as("p2"), col("rank").as("r2"), col("b"))
    probe.join(build, "b")
      .where(col("r2") - col("r1") >= 1 && col("r2") - col("r1") <= width)
      .select(col("p1"), col("p2"), (col("r2") - col("r1")).as("dist"))
  }

  /**
   * Attach dense block ids (0..#blocks-1) ordered by blocking key — only for
   * presentation / interop with the reference API. Uses zipWithIndex on the
   * RDD bridge to avoid a single-partition window.
   */
  def withDenseBlockIds(stats: DataFrame): DataFrame = {
    val spark = stats.sparkSession
    val sorted = stats.orderBy("key")
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("block_id", org.apache.spark.sql.types.LongType, nullable = false) +:
        sorted.schema.fields)
    val rdd = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      org.apache.spark.sql.Row.fromSeq(idx +: row.toSeq)
    }
    spark.createDataFrame(rdd, schema)
  }
}
