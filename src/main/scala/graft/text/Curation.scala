package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-curation operators a large-scale training-data pipeline needs
 * between dedup and the final training set — all deterministic (hash
 * arithmetic, no RNG), all single-shuffle shapes, all with DuckDB oracle
 * twins:
 *
 *  - per-domain quota capping (keep at most k docs per source, in a
 *    deterministic pseudo-random priority order);
 *  - stratified sampling (per-stratum keep rates via a hash of the id);
 *  - vocabulary statistics (global token frequencies, top-n);
 *  - sequence packing (assign docs to contiguous token-budget bins via a
 *    distributed prefix sum — no single-partition window).
 */
object Curation {

  /** Deterministic pseudo-random priority from an id: Knuth
   * multiplicative hash folded to [0, 1e9+7) — pure BIGINT arithmetic the
   * SQL oracle reproduces exactly. The id is folded mod 1e9+7 BEFORE the
   * multiply so the product stays under 2^62 for ANY 64-bit id (the
   * unfolded form silently wrapped in Spark and raised in DuckDB once ids
   * passed ~3.47e9 — plausible document counts at 100 TB). Values are
   * unchanged for ids below 1e9+7. */
  private def idHash(id: Column): Column =
    pmod(pmod(id, lit(1000000007L)) * lit(2654435761L), lit(1000000007L))

  /**
   * Keep at most `k` documents per domain (`source`), selecting by
   * deterministic pseudo-random priority so one giant domain can't
   * dominate the training mix. A literal `k` plans as WindowGroupLimit —
   * partial per-group top-k before the shuffle, so the exchange carries
   * O(domains * k), not O(docs).
   */
  def domainCap(docs: DataFrame, k: Int, domainCol: String = "source",
                idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(domainCol).as("source"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("source")
          .orderBy(idHash(col("doc_id")).asc, col("doc_id").asc)))
      .filter(col("rn") <= lit(k))
      .select(col("doc_id"), col("source"), col("rn").cast("long").as("rn"))

  /**
   * Stratified downsampling: per-stratum keep rates in percent (e.g. keep
   * 50% of English, 10% of everything else), decided by a deterministic
   * hash of the id — the same replayable-sampling posture as mlScore's
   * negative sampling: re-running the pipeline keeps the SAME documents,
   * and no shuffle at all (a pure filter over the scan).
   */
  def stratifiedSample(docs: DataFrame, rates: Map[String, Int], defaultRate: Int,
                       stratumCol: String = "lang", idCol: String = "doc_id"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    docs.select(col(idCol).as("doc_id"), col(stratumCol).as("lang"))
      .filter(pmod(idHash(col("doc_id")), lit(100L)) < rate)
  }

  /**
   * Global vocabulary statistics: token frequencies over the normalized
   * corpus, top `n` by (count desc, token asc) — a unique total order, so
   * the selection is a distributed TakeOrderedAndProject, never a global
   * rank window over the whole vocabulary. The aggregation is map-side
   * combinable (partial counts per partition before the shuffle).
   */
  def vocabTopN(docs: DataFrame, n: Int, textCol: String = "text"): DataFrame = {
    val toks = docs.select(explode(
      filter(split(graft.dedup.Dedup.normalize(col(textCol)), " "),
        t => length(t) > 0)).as("token"))
    val counts = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(n)
    counts.withColumn("rank", row_number().over(
      Window.orderBy(col("cnt").desc, col("token").asc)))
  }

  /**
   * Naive contiguous sequence packing: walk documents in id order,
   * accumulate token counts, and assign each document to the bin its
   * running total starts in (`bin = floor((cumsum - n_tokens) / budget)`).
   * The running total is the two-phase range-partitioned prefix sum
   * ([[graft.util.Prefix]]), so packing a 100 TB corpus is two O(N)
   * passes — no single-partition window, no driver state. (Production
   * packers use smarter bin-filling; the contiguous form is the
   * deterministic, oracle-checkable baseline.)
   */
  def packSequences(docs: DataFrame, budget: Int, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val withN = docs.select(col(idCol).as("doc_id"),
      size(filter(split(graft.dedup.Dedup.normalize(col(textCol)), " "),
        t => length(t) > 0)).cast("long").as("n_tokens"))
    graft.util.Prefix.runningSum(withN, Seq(col("doc_id").asc),
        col("n_tokens").cast("double"), "cum")
      .select(col("doc_id"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / budget).cast("long").as("bin_id"))
  }

  /**
   * K-minimum-values (KMV) distinct-count sketch over a hashed value
   * column, per stratum plus a merged `(all)` row — the deterministic
   * counterpart of HyperLogLog for "how many distinct X per group"
   * questions, where exact `count(distinct)` would shuffle the full
   * distinct set at 100 TB.
   *
   * The sketch is the k smallest DISTINCT values of a uniform-ish hash
   * (PolyHash31 range [0, 2^31-1) in the shipped queries); with
   * u = kth/(2^31-1) the standard estimator is (k-1)/u. A literal k plans
   * the per-stratum selection as WindowGroupLimit: each input partition
   * keeps only its local min-k BEFORE the shuffle, so the exchange
   * carries O(strata * k * partitions) rows, never the distinct set.
   * When a stratum has fewer than k distinct hashes the sketch saw
   * everything and the estimate IS the exact count.
   *
   * Sketches are mergeable (min-k of a union = min-k of the concatenated
   * min-k lists): the `(all)` row is computed from the per-stratum
   * sketches alone — the property that lets a 1000-executor cluster
   * combine per-shard sketches without rescanning. Everything is integer
   * hash arithmetic + one double division, reproduced bit-for-bit by the
   * DuckDB oracle.
   *
   * @param hashes frame carrying `stratumCol` and an integer hash
   *               `hashCol` in [0, hashMod); duplicates are fine (the
   *               sketch dedups internally)
   */
  def kmvDistinct(hashes: DataFrame, k: Int, stratumCol: String = "lang",
                  hashCol: String = "h",
                  hashMod: Long = graft.functions.PolyHash31.Mod): DataFrame = {
    val perStratum = hashes
      .select(col(stratumCol).as("lang"), col(hashCol).as("h"))
      .distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy(col("h").asc)))
      .filter(col("rn") <= lit(k))
    // merged sketch over the union of the per-stratum min-k lists;
    // orderBy().limit(k) is a distributed TakeOrderedAndProject over a
    // <= #strata * k input, never a global window
    val merged = perStratum.select(col("h")).distinct()
      .orderBy(col("h").asc).limit(k)
      .agg(count(lit(1)).as("k_used"), max(col("h")).as("kth"))
      .select(lit("(all)").as("lang"), col("k_used"), col("kth"))
    val sketches = perStratum.groupBy("lang")
      .agg(count(lit(1)).as("k_used"), max(col("h")).as("kth"))
      .unionByName(merged)
    sketches.select(col("lang"), col("k_used"), col("kth"),
      graft.functions.FastRound.round(
        when(col("k_used") < lit(k.toLong), col("k_used").cast("double"))
          .otherwise(lit((k - 1).toDouble * hashMod) /
            col("kth").cast("double")), 9).as("distinct_est"))
  }

  /**
   * Per-document repetition quality metrics — the published-pipeline
   * filters (Gopher/C4 family) that catch boilerplate and degenerate
   * generations exact n-gram dedup misses:
   *
   *  - `top_token_frac` / `top_bigram_frac`: share of all 1-/2-grams
   *    taken by the single most frequent one;
   *  - `dup_trigram_frac`: share of 3-gram occurrences whose 3-gram
   *    appears more than once in the document.
   *
   * All three gram levels ride ONE exploded frame tagged by n, so the
   * whole operator is a single (doc_id, n, gram) shuffle + a (doc_id)
   * rollup — per-document work, embarrassingly parallel at any corpus
   * size. Documents too short for a gram level score 0.0 (no grams = no
   * repetition); empty documents produce no row on either side.
   */
  def repetitionStats(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      filter(split(graft.dedup.Dedup.normalize(col(textCol)), " "),
        t => length(t) > 0).as("toks"))
    // NB sequence(1, 0) DESCENDS in Spark (auto step -1), so the
    // too-short case needs an explicit empty array, not a greatest() clamp
    val grams = toks.select(col("doc_id"), explode(flatten(array(
        (1 to 3).map { n =>
          expr(s"if(size(toks) < $n, array(), " +
            s"transform(sequence(1, size(toks) - ${n - 1}), " +
            s"i -> struct($n AS n, array_join(slice(toks, i, $n), ' ') AS gram)))")
        }: _*))).as("g"))
      .select(col("doc_id"), col("g.n").as("n"), col("g.gram").as("gram"))
    val perN = grams.groupBy("doc_id", "n", "gram").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id", "n").agg(
        sum(col("cnt")).as("total"), max(col("cnt")).as("top"),
        sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("dup"))
    def frac(n: Int, num: Column): Column =
      coalesce(max(when(col("n") === n, num.cast("double") / col("total"))),
        lit(0.0))
    perN.groupBy("doc_id").agg(
      max(when(col("n") === 1, col("total"))).as("n_tokens"),
      frac(1, col("top")).as("top_token_frac"),
      frac(2, col("top")).as("top_bigram_frac"),
      frac(3, col("dup")).as("dup_trigram_frac"))
  }

  /**
   * TF-IDF top terms per document: term frequency within the document ×
   * smoothed inverse document frequency over the corpus, top `k` terms
   * per doc by (rounded score desc, token asc). One token explode feeds
   * both the per-doc counts and the document frequencies; the final
   * selection is a literal-k per-doc window (WindowGroupLimit — partial
   * top-k before the shuffle). The score is ranked AFTER rounding to 9
   * decimals so a last-ULP `ln` difference between engines can never
   * flip the selection order; exact score ties fall back to token order.
   */
  def tfidfTopK(docs: DataFrame, k: Int, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), explode(
      filter(split(graft.dedup.Dedup.normalize(col(textCol)), " "),
        t => length(t) > 0)).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, Seq("token")).crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("token"), col("tf"),
        graft.functions.FastRound.round(col("tf").cast("double") *
          log((col("n_docs").cast("double") + 1.0) /
            (col("df").cast("double") + 1.0)), 9).as("tfidf"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(col("tfidf").desc, col("token").asc)))
      .filter(col("rank") <= lit(k))
      .select(col("doc_id"), col("token"), col("tf"),
        col("tfidf"), col("rank").cast("long").as("rank"))
  }

  /**
   * Unigram language-model surprisal — the perplexity-proxy quality
   * score published pipelines use to rank documents against the corpus
   * distribution (rare-token soup scores high, fluent text low). Each
   * token's negative log-probability −ln(cnt/total) comes from the
   * corpus's own unigram counts; the per-document mean is the score.
   *
   * Per-token NLLs are summed per document, and a double sum over an
   * unordered group depends on partial-aggregation order — so each NLL
   * is first rounded to a 1e-9 fixed-point BIGINT and summed exactly
   * (same posture as the k-means centroid update): the result is
   * identical on any partitioning and any engine. The corpus-frequency
   * join is a plain equi-join on token (vocab-sized right side; AQE
   * broadcasts it when small), so the operator is one explode + two
   * aggregations at any corpus size.
   */
  def lmSurprisal(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), explode(
      filter(split(graft.dedup.Dedup.normalize(col(textCol)), " "),
        t => length(t) > 0)).as("token"))
    val freq = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = freq.select(sum(col("cnt")).as("total"))
    val nll = toks.join(freq, Seq("token")).crossJoin(broadcast(total))
      .select(col("doc_id"),
        graft.functions.FastRound.round(
          -log(col("cnt").cast("double") / col("total").cast("double")) *
            1000000000.0, 0).cast("long").as("nll_fix"))
    nll.groupBy("doc_id").agg(
        count(lit(1)).as("n_tokens"), sum(col("nll_fix")).as("sfix"))
      .select(col("doc_id"), col("n_tokens"),
        graft.functions.FastRound.round(
          col("sfix").cast("double") / 1000000000.0 /
            col("n_tokens").cast("double"), 9).as("avg_nll"))
  }

  /**
   * Bigram language-model surprisal with add-one (Laplace) smoothing,
   * trained on the corpus itself — the context-aware upgrade of
   * [[lmSurprisal]]: P(w|v) = (c(v,w)+1) / (c(v)+V), score = mean
   * −ln P over a document's bigrams. Word-salad that reuses common
   * tokens in uncommon ORDER now scores high where the unigram model
   * can't see it.
   *
   * Same determinism posture as the unigram score: each NLL rounds to a
   * 1e-9 fixed-point BIGINT before the per-document sum, so the result
   * is bit-identical under any partitioning. Shape: one explode to
   * bigrams, two count aggregates (bigram, unigram — both map-side
   * combinable), one 1-row vocab aggregate broadcast, two equi-joins
   * back. Documents with fewer than 2 tokens emit no row.
   */
  def bigramSurprisal(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    val toksArr = tokenArr(docs, textCol, idCol)
    val bi = graft.util.Snapshot(toksArr.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(sequence(lit(1), size(col("toks")) - 1)).as("i"),
        col("toks"))
      .select(col("doc_id"), element_at(col("toks"), col("i")).as("prev"),
        element_at(col("toks"), col("i") + 1).as("cur")))
    val cbig = bi.groupBy("prev", "cur").agg(count(lit(1)).as("cb"))
    val cuni = toksArr.select(explode(col("toks")).as("prev"))
      .groupBy("prev").agg(count(lit(1)).as("cu"))
    val vocab = cuni.agg(count(lit(1)).as("v"))
    val nll = bi.join(cbig, Seq("prev", "cur")).join(cuni, Seq("prev"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        graft.functions.FastRound.round(
          -log((col("cb").cast("double") + 1.0) /
            (col("cu").cast("double") + col("v").cast("double"))) *
            1000000000.0, 0).cast("long").as("nll_fix"))
    nll.groupBy("doc_id").agg(
        count(lit(1)).as("n_bigrams"), sum(col("nll_fix")).as("sfix"))
      .select(col("doc_id"), col("n_bigrams"),
        graft.functions.FastRound.round(
          col("sfix").cast("double") / 1000000000.0 /
            col("n_bigrams").cast("double"), 9).as("avg_nll"))
  }

  /**
   * N-gram novelty score (the C4/Gopher "repetition against the corpus"
   * gate, corpus-global): fraction of a document's distinct word n-gram
   * shingles whose FIRST corpus occurrence (minimum doc_id) is this
   * document — 1.0 means entirely novel text, ~0 means the document
   * restates n-grams already present in earlier documents. The arrival
   * order is doc_id by definition, so the score is deterministic and
   * replayable (the same convention as every hash-ordered sampler here).
   *
   * Shape: distinct shingles (one explode), a min aggregate per shingle
   * (map-side combinable, one shuffle on the shingle), an equi-join back
   * and a per-doc aggregate — nothing quadratic, no windows. Documents
   * with fewer than n tokens have no shingles and emit no row (the
   * [[graft.dedup.Dedup.shingles]] contract).
   */
  def noveltyScore(docs: DataFrame, n: Int = 3): DataFrame =
    noveltyOfShingles(graft.dedup.Dedup.shingles(docs, n))

  /**
   * BM25 ranked retrieval (Robertson/Walker; the Lucene-practical form
   * with the +1-inside-ln idf, always positive): score(d, Q) = sum over
   * query terms t of idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b *
   * dl/avgdl)). The operator a corpus-scale pipeline uses to pull
   * topical slices ("give me the spark-related documents") — TF-IDF's
   * [[tfidfTopK]] characterizes documents, this RANKS them for a query.
   *
   * Scale shape: the per-term tf aggregate filters to the QUERY'S terms
   * before grouping, so the heavy explode feeds a tiny aggregate; corpus
   * statistics (N, avgdl, df per query term) are one aggregate each,
   * broadcast as 1-row/per-term frames. The global top-k is a
   * distributed orderBy().limit() (TakeOrderedAndProject — per-partition
   * top-k, never a single-partition sort); the rank window then runs
   * over <= topK rows. Ranking keys are the ROUNDED score (ties by
   * doc_id) so cross-engine ln ULPs can't flip the selection.
   */
  def bm25(docs: DataFrame, queryTerms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75, topK: Int = 10, textCol: String = "text",
           idCol: String = "doc_id"): DataFrame = {
    require(queryTerms.nonEmpty)
    val toks = docs.select(col(idCol).as("doc_id"), explode(
      filter(split(graft.dedup.Dedup.normalize(col(textCol)), " "),
        t => length(t) > 0)).as("token"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    val qtf = toks.filter(col("token").isin(queryTerms.map(lit): _*))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = qtf.groupBy("token").agg(count(lit(1)).cast("double").as("df"))
    val scored = qtf
      .join(dl, Seq("doc_id"))
      .join(broadcast(dfreq), Seq("token"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0) - lit(b) +
              lit(b) * col("dl").cast("double") / col("avgdl"))))
          .as("s"))
      .groupBy("doc_id")
      .agg(graft.functions.FastRound.round(sum(col("s")), 9).as("score"))
    scored
      .orderBy(col("score").desc, col("doc_id").asc).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)))
      .select(col("rank").cast("long").as("rank"), col("doc_id"), col("score"))
  }

  /** [[noveltyScore]] over an already-materialized distinct
   * (doc_id, shingle) frame — callers sharing a per-dir shingle snapshot
   * (the dedup suite does) skip the explode entirely. */
  def noveltyOfShingles(sh: DataFrame): DataFrame = {
    val first = sh.groupBy("shingle").agg(min(col("doc_id")).as("first_doc"))
    sh.join(first, Seq("shingle"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        graft.functions.FastRound.round(
          col("n_novel").cast("double") / col("n_shingles").cast("double"), 9)
          .as("novelty"))
  }

  /**
   * Epoch-weighted source mixing: materialize the training mix as
   * (doc, copy) rows, where each stratum's weight is in hundredths of an
   * epoch (250 = 2.5 epochs). Whole epochs replicate every document;
   * the fractional remainder keeps a deterministic hash-chosen subset —
   * replayable like [[stratifiedSample]], so re-running the pipeline
   * regenerates the SAME mix. The explode guards the empty case
   * explicitly (Spark's `sequence(1, 0)` DESCENDS); a zero-copy document
   * drops out, matching the oracle's `generate_series` semantics. Pure
   * map-side work — no shuffle at any scale.
   */
  def epochMix(docs: DataFrame, weights: Map[String, Int], defaultWeight: Int,
               stratumCol: String = "lang", idCol: String = "doc_id"): DataFrame = {
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    val copies = floor(w.cast("long") / 100L).cast("long") +
      when(pmod(idHash(col(idCol)), lit(100L)) < w.cast("long") % 100L, 1L)
        .otherwise(0L)
    docs.select(col(idCol).as("doc_id"), col(stratumCol).as("lang"),
        copies.as("copies"))
      .select(col("doc_id"), col("lang"), explode(
        when(col("copies") >= 1L, sequence(lit(1L), col("copies")))
          .otherwise(array().cast("array<long>"))).as("copy"))
  }

  /**
   * Leakage-safe train/val/test split: every document inherits its dedup
   * cluster's split, decided by a deterministic hash of the cluster
   * REPRESENTATIVE — so a near-duplicate pair can never straddle the
   * train/eval boundary (the classic contamination bug of doc-level
   * random splits). `trainPct`/`valPct` are integer percents; the
   * remainder is test. Input is the (doc_id, cluster_rep) frame from
   * [[graft.dedup.Dedup.clusters]]; singleton docs are their own rep, so
   * un-clustered corpora degrade to a plain hash split.
   *
   * Scale shape: one narrow projection — no shuffle, no state. The split
   * is reproducible across runs/engines (Knuth hash, pure BIGINT
   * arithmetic), so the assignment can be recomputed anywhere instead of
   * stored.
   */
  def clusterSplit(clustered: DataFrame, trainPct: Int = 80, valPct: Int = 10,
                   idCol: String = "doc_id",
                   repCol: String = "cluster_rep"): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100)
    val bucket = pmod(idHash(col(repCol)), lit(100L))
    clustered.select(col(idCol).as("doc_id"), col(repCol).as("cluster_rep"),
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }

  /**
   * C4-style duplicate-span removal (cf. the reference-free "three-
   * sentence dedup" every published web-corpus pipeline runs): split each
   * document's normalized token stream into fixed `w`-token chunks, keep
   * only the globally FIRST occurrence of each distinct chunk — ordered
   * by (doc_id, chunk_idx) through a single BIGINT position key — and
   * reassemble each document from its surviving chunks in original order.
   * Documents whose every chunk appeared earlier elsewhere drop out.
   *
   * Shape at scale: one explode (corpus → chunks), one hash aggregation
   * on the chunk text (exact match — no collision risk from hashing),
   * one equi-join back, one per-doc aggregation. No windows, no
   * broadcast of anything corpus-sized; the chunk group-by is the same
   * shuffle a groupBy-count dedup pays. The argmin is `min` over the
   * fused position key rather than a struct min so both engines compare
   * a single BIGINT (doc ids are dense-from-0; chunk_idx < 1e6 holds for
   * any document under w·1e6 tokens). The fused key is only
   * ORDER-compatible while chunk_idx fits its slot, so a document that
   * overflows it (>= 1e6 chunks, i.e. >= w·1e6 tokens) raises at runtime
   * instead of silently keeping the wrong first occurrence.
   *
   * Returns (doc_id, kept_chunks, text_dedup).
   */
  /** Fixed `w`-token chunks of each document's normalized token stream:
   * (doc_id, chunk_idx, chunk). Last chunk index = floor((n_tokens-1)/w);
   * empty docs get no chunks (sequence(0,-1) would DESCEND — guard
   * explicitly, as everywhere). Shared by [[chunkDedup]] and
   * [[removeBoilerplate]]. */
  private def tokenChunks(docs: DataFrame, w: Int, textCol: String,
                          idCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      filter(split(graft.dedup.Dedup.normalize(col(textCol)), " "),
        t => length(t) > 0).as("toks"))
    toks.select(col("doc_id"), posexplode(
      when(size(col("toks")) === 0, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0), floor((size(col("toks")) - 1) / lit(w)).cast("int")),
          i => array_join(slice(col("toks"), i * w + 1, lit(w)), " ")))))
      .toDF("doc_id", "chunk_idx", "chunk")
  }

  def chunkDedup(docs: DataFrame, w: Int, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val chunks = tokenChunks(docs, w, textCol, idCol)
    val keyed = chunks.select(col("doc_id"), col("chunk_idx"), col("chunk"),
      when(col("chunk_idx") < lit(1000000L),
          col("doc_id") * lit(1000000L) + col("chunk_idx"))
        .otherwise(raise_error(concat(
          lit("chunkDedup: chunk_idx >= 1e6 overflows the fused pos_key slot (doc_id "),
          col("doc_id"), lit("); widen the slot for >= 1e6-chunk documents"))))
        .as("pos_key"))
    val firstSeen = keyed.groupBy("chunk").agg(min(col("pos_key")).as("keep_key"))
    keyed.join(firstSeen, Seq("chunk"))
      .filter(col("pos_key") === col("keep_key"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("kept_chunks"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("chunk_idx"), col("chunk")))),
          s => s.getField("chunk"))).as("text_dedup"))
  }

  /**
   * CCNet-style cross-document boilerplate removal: drop EVERY copy of
   * any `w`-token chunk that appears in more than `maxDf` distinct
   * documents (headers, footers, navigation text, license blurbs — the
   * segments whose document frequency explodes), then reassemble each
   * document from its surviving chunks in original order. Complementary
   * to [[chunkDedup]]: that keeps the globally first copy of every
   * duplicated span; this removes high-frequency spans EVERYWHERE, the
   * published recipe for boilerplate (a first copy of a nav header is
   * still boilerplate).
   *
   * Shape at scale: one explode, one distinct-count aggregation on the
   * chunk text, one semi-join back, one per-doc reassembly aggregation —
   * the same single-shuffle family as [[chunkDedup]]; the df aggregate
   * bounds itself (high-frequency chunks collapse to one row each).
   * Documents whose every chunk is boilerplate drop out.
   *
   * Returns (doc_id, kept_chunks, text_clean).
   */
  def removeBoilerplate(docs: DataFrame, w: Int, maxDf: Int = 1,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    require(maxDf >= 1)
    // read twice (df aggregate + join back): snapshot, not recompute
    val chunks = graft.util.Snapshot(tokenChunks(docs, w, textCol, idCol))
    val keep = chunks.groupBy("chunk")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") <= maxDf)
      .select("chunk")
    chunks.join(keep, Seq("chunk"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("kept_chunks"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("chunk_idx"), col("chunk")))),
          s => s.getField("chunk"))).as("text_clean"))
  }

  /**
   * Exact duplicated-substring spans (Lee et al. 2022, "Deduplicating
   * Training Data Makes Language Models Better" — the ExactSubstr
   * setting): every SLIDING `L`-token window that occurs more than once
   * anywhere in the corpus (including again in the same document) marks
   * its positions as duplicated; overlapping/adjacent marked windows merge
   * into maximal spans. This is the sliding complement of [[chunkDedup]]
   * (fixed chunks miss duplicates that straddle a chunk boundary): the
   * suffix-array construction in the paper is exactly equivalent, for a
   * fixed minimum length, to this n-gram count — which is one groupBy
   * instead of a distributed suffix array.
   *
   * Shape at scale: one explode to L-gram positions (L× token volume — the
   * same order as any shingling pass here), one count aggregate on the
   * gram text, one semi-join back, then a per-document interval merge. All
   * windows have identical length, so "islands" need no running-max: a gap
   * opens exactly when pos - lag(pos) > L. The per-doc window partition is
   * bounded by document length, never by corpus size.
   *
   * Returns (doc_id, span_start, span_end, span_tokens, n_windows) with
   * token positions 0-based and span_end exclusive.
   */
  /** (doc_id, toks): normalized non-empty token array per document. */
  private[graft] def tokenArr(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      filter(split(graft.dedup.Dedup.normalize(col(textCol)), " "),
        t => length(t) > 0).as("toks"))

  /** Sliding `L`-token windows: (doc_id, pos, gram), pos 0-based; docs
   * shorter than L emit nothing (explicit empty guard — sequence(0, neg)
   * would descend). */
  private[graft] def slidingGrams(toks: DataFrame, L: Int): DataFrame =
    toks.select(col("doc_id"), posexplode(
        when(size(col("toks")) < L, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(0), size(col("toks")) - L),
            i => array_join(slice(col("toks"), i + 1, lit(L)), " ")))))
      .toDF("doc_id", "pos", "gram")

  /** HASH-FIRST sliding windows: (doc_id, pos, gh) with gh a 64-bit digest
   * of the L-token gram — 20 fixed-width bytes per position instead of an
   * L-token STRING, so nothing downstream snapshots or shuffles ~L× the
   * corpus text. The gram string exists only transiently inside the
   * projection. Consumers that need exactness re-slice the real gram
   * row-locally from `toks` by (doc_id, pos) for the (rare) digest-matched
   * candidates — see [[dupSpans]] / [[contaminatedSpans]]. */
  private[graft] def slidingGramHashes(toks: DataFrame, L: Int): DataFrame =
    toks.select(col("doc_id"), posexplode(
        when(size(col("toks")) < L, array().cast("array<long>"))
          .otherwise(transform(sequence(lit(0), size(col("toks")) - L),
            i => xxhash64(array_join(slice(col("toks"), i + 1, lit(L)), " "))))))
      .toDF("doc_id", "pos", "gh")

  /** Re-slice the true L-token gram for candidate positions, row-locally
   * from the per-doc token array: (doc_id, pos, gram). */
  private def resliceGrams(cand: DataFrame, toks: DataFrame, L: Int): DataFrame =
    cand.join(toks, Seq("doc_id"))
      .select(col("doc_id"), col("pos"),
        array_join(slice(col("toks"), col("pos") + 1, lit(L)), " ").as("gram"))

  /** Merge marked equal-length window positions into maximal spans. All
   * windows span exactly L tokens, so no running max is needed: a new
   * island starts exactly when pos - lag(pos) > L. The window partition
   * is per document — bounded by doc length, never corpus size. */
  private[graft] def mergeIslands(marked: DataFrame, L: Int): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    marked
      .withColumn("gap", when(col("pos") - lag("pos", 1).over(w) <= L, 0).otherwise(1))
      .withColumn("island", sum("gap").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(min("pos").cast("long").as("span_start"),
        (max("pos") + L).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_tokens"), col("n_windows"))
  }

  def dupSpans(docs: DataFrame, L: Int, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    require(L >= 2)
    // hash-first: the snapshot and both shuffles carry (doc_id, pos, gh)
    // at 20 bytes/row, never the L-token gram string; digest-matched
    // candidates (the duplicated few %) are then verified EXACTLY on the
    // re-sliced true gram, so a 64-bit collision costs a candidate row,
    // never a wrong span
    val grams = graft.util.Snapshot(
      slidingGramHashes(tokenArr(docs, textCol, idCol), L))
    val dupH = grams.groupBy("gh").agg(count(lit(1)).as("_hc"))
      .filter(col("_hc") > 1).select("gh")
    val cand = resliceGrams(grams.join(dupH, Seq("gh")).select("doc_id", "pos"),
      tokenArr(docs, textCol, idCol), L)
    val dup = cand.groupBy("gram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1).select("gram")
    mergeIslands(cand.join(dup, Seq("gram")).select("doc_id", "pos"), L)
  }

  /**
   * Span-level benchmark decontamination: mark every maximal span of the
   * corpus whose sliding `L`-token windows also occur ANYWHERE in the
   * benchmark set — the substring-granularity version of the document
   * containment check (Dedup.containment / txt_decontaminate), which is
   * what a pretraining pipeline actually excises before packing (a doc
   * quoting one eval question shouldn't be dropped whole, the quote
   * should). Same island merge as [[dupSpans]]; the mark rule is a
   * broadcast semi-join against the benchmark's distinct grams —
   * benchmarks are MBs against a corpus of TBs, so the corpus grams never
   * shuffle: mark at scan speed, then the bounded per-doc merge. The hot
   * probe runs HASH-FIRST: the corpus side carries a 64-bit gram digest
   * and probes a digest set (8 bytes/entry broadcast, 8-byte equality at
   * scan speed); the rare digest hits are then verified exactly against
   * the benchmark's true gram set, so a collision costs one candidate
   * row, never a false contamination mark.
   *
   * Returns (doc_id, span_start, span_end, span_tokens, n_windows) over
   * corpus documents.
   */
  def contaminatedSpans(corpus: DataFrame, benchmark: DataFrame, L: Int,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    require(L >= 2)
    val cg = slidingGramHashes(tokenArr(corpus, textCol, idCol), L)
    val bg = slidingGrams(tokenArr(benchmark, textCol, idCol), L)
      .select("gram").distinct()
    val bh = bg.select(xxhash64(col("gram")).as("gh")).distinct()
    val cand = resliceGrams(
      cg.join(broadcast(bh), Seq("gh"), "left_semi").select("doc_id", "pos"),
      tokenArr(corpus, textCol, idCol), L)
    mergeIslands(
      cand.join(broadcast(bg), Seq("gram"), "left_semi").select("doc_id", "pos"), L)
  }

  /**
   * Apply stage of [[dupSpans]]: remove every duplicated span except the
   * globally first occurrence of its exact text (first = smallest
   * (doc_id, span_start), the same keep-first rule as [[chunkDedup]]),
   * then reassemble each document from its surviving tokens. Granularity
   * note: dedup is at MAXIMAL-span level — two docs sharing a window are
   * both marked, but if their merged spans differ (one repeat extended the
   * island), each distinct span text keeps its own first copy.
   *
   * Shape at scale: [[dupSpans]]'s shuffles, plus one aggregate on the
   * span text (keeper election), one anti range-join of token positions
   * against the per-doc removed spans (equi on doc_id; spans per doc are
   * few), one per-doc reassembly. Documents whose every token is removed
   * drop out.
   *
   * Returns (doc_id, kept_tokens, text_clean).
   */
  def dupSpansRemove(docs: DataFrame, L: Int, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame =
    dupSpansRemoveWith(docs, dupSpans(docs, L, textCol, idCol), L,
      textCol, idCol)

  /** The removal half of [[dupSpansRemove]], taking pre-computed
   * (possibly memoized) spans — callers that also publish the span dump
   * pass one materialization to both consumers. */
  def dupSpansRemoveWith(docs: DataFrame, spans: DataFrame, L: Int,
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    val toksDf = graft.util.Snapshot(tokenArr(docs, textCol, idCol))
    val spansT = spans
      .join(toksDf, Seq("doc_id"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        array_join(slice(col("toks"), (col("span_start") + 1).cast("int"),
          (col("span_end") - col("span_start")).cast("int")), " ").as("span_text"))
      // 64-bit digest LEADS the grouping/join key: hashing and sort-merge
      // comparisons on an L-token string key are byte-wise, the digest
      // resolves almost every comparison in 8 bytes; the string stays IN
      // the key, so equality (and thus the election) is exact regardless
      .withColumn("_sh", xxhash64(col("span_text")))
    // keeper election as an AGGREGATION joined back, not a
    // row_number().over(partitionBy(span_text)) — a boilerplate span
    // repeated 10^8 times would stream through ONE window task (no
    // map-side partials; AQE skew-splits joins, not windows). min(struct)
    // is the same (doc_id, span_start) lexicographic first-copy rule.
    val keepers = spansT.groupBy("_sh", "span_text")
      .agg(min(struct(col("doc_id"), col("span_start"))).as("_k"))
    val removed = spansT.join(keepers, Seq("_sh", "span_text"))
      .filter(struct(col("doc_id"), col("span_start")) =!= col("_k"))
      .select(col("doc_id").as("r_doc"), col("span_start"), col("span_end"))
    val pos = toksDf.filter(size(col("toks")) > 0)
      .select(col("doc_id"), posexplode(col("toks"))).toDF("doc_id", "pos", "tok")
    pos.join(removed, pos("doc_id") === removed("r_doc")
        && col("pos") >= col("span_start") && col("pos") < col("span_end"),
        "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("kept_tokens"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok"))).as("text_clean"))
  }

  /**
   * CHARACTER-level ExactSubstr dedup (Lee et al. 2022, "Deduplicating
   * Training Data Makes Language Models Better"): repeated substrings at
   * ARBITRARY byte boundaries, the case the token-window family
   * ([[dupSpans]] / [[chunkDedup]] / boilerplate) structurally misses —
   * a duplicate that starts mid-token never lands on a token-aligned
   * window. Every occurrence of an `L`-char window that appears >= 2
   * times anywhere in the corpus is marked EXCEPT the corpus-global
   * first copy (smallest (doc_id, pos) — the keep-one rule, so the
   * canonical occurrence survives removal); marked positions merge into
   * maximal per-document char spans.
   *
   * Shape at scale: the suffix array the paper builds is replaced by the
   * engine's distinct-window machinery, HASH-FIRST — the occurrence table
   * carries (doc_id, pos, h) with h a 64-bit digest of the L-char window,
   * 24 fixed-width bytes per position instead of the L-char substring
   * (~L× the corpus text) that a naive window explode would materialize
   * into the snapshot and carry as the shuffle key. Repeated-hash groups
   * are then verified EXACTLY: candidate occurrences (typically a few %
   * of the corpus) re-slice their real substring row-locally from the
   * document text by (doc_id, pos), and the keeper election + marking run
   * on the true strings — a 64-bit digest alone is NOT exactness (at 10⁹
   * windows collisions are certain), equal digests merely nominate.
   * Both aggregates are partial-agg'd groupBys (a window repeated 10^8
   * times shrinks to one row per input partition before the shuffle) and
   * the join-backs are AQE-skew-splittable; there is no pair blowup
   * anywhere, so no frequency cap is needed — hot windows cost rows, not
   * row PAIRS. The island merge is a per-document window, bounded by
   * document length. The canonical-occurrence election fuses
   * (doc_id, pos) into one BIGINT min (doc_id*1e6 + pos, the
   * [[chunkDedup]] idiom); documents of 1e6+ chars or negative ids would
   * alias/invert the key, so the fusion FAILS LOUDLY on them
   * (raise_error) rather than silently electing a wrong keeper.
   *
   * Returns (doc_id, span_start, span_end, span_chars, n_windows), char
   * positions 0-based, span_end exclusive, over the RAW text (no
   * normalization — byte-exactness is the point).
   */
  /** The hashed window-occurrence snapshot of [[substrDupSpans]]:
   * (doc_id, pos, h) — all fixed-width, no window STRINGS stored; exposed
   * with its on-disk path so a spec can pin both properties. The digests
   * come from the codegen'd O(n) rolling hash
   * ([[graft.functions.WindowHashes64]]) — the HOF
   * transform/substr/xxhash64 form is O(n·L), interpreted, and allocates
   * every window string transiently. */
  private[graft] def substrOcc(docs: DataFrame, L: Int, textCol: String,
                               idCol: String): (String, DataFrame) =
    graft.util.Snapshot.materialize(
      docs.filter(length(col(textCol)) >= L)
        .select(col(idCol).as("doc_id"),
          posexplode(graft.functions.WindowHashes64(col(textCol), L)))
        .toDF("doc_id", "pos", "h")
        .withColumn("pos", when(col("pos") >= 1000000 || col("doc_id") < 0,
            raise_error(lit("substrDupSpans: document over 1e6 chars or " +
              "negative doc_id aliases the fused (doc_id, pos) keeper key " +
              "— split the document / remap ids first")))
          .otherwise(col("pos").cast("long"))))

  def substrDupSpans(docs: DataFrame, L: Int, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    require(L >= 2)
    val occ = substrOcc(docs, L, textCol, idCol)._2
    // only REPEATED hashes reach the join: the build side shrinks from
    // every distinct window to the duplicated ones (typically a few % of
    // the corpus), so AQE broadcasts it and the occurrence stream never
    // shuffles; at boilerplate-heavy scale where the repeated set is
    // genuinely large, AQE falls back to a (skew-splittable) shuffle join
    val dupH = occ.groupBy("h").agg(count(lit(1)).as("_hc"))
      .filter(col("_hc") >= 2).select("h")
    // exact verification: nominated occurrences re-slice the REAL window
    // row-locally from the document text — no stored strings anywhere
    val cand = occ.join(dupH, Seq("h"))
      .join(docs.select(col(idCol).as("doc_id"), col(textCol).as("_t")),
        Seq("doc_id"))
      .select(col("doc_id"), col("pos"),
        col("_t").substr((col("pos") + 1).cast("int"), lit(L)).as("s"))
    val freq = cand.groupBy("s").agg(count(lit(1)).as("cnt"),
        min(col("doc_id") * 1000000L + col("pos")).as("mk"))
      .filter(col("cnt") >= 2)
    val marked = graft.util.CapMetrics.observeDrops(
        cand.join(freq, Seq("s")),
        "substr_dedup_marks",
        col("doc_id") * 1000000L + col("pos") =!= col("mk"))
      .filter(col("doc_id") * 1000000L + col("pos") =!= col("mk"))
      .select("doc_id", "pos")
    mergeIslands(marked, L).withColumnRenamed("span_tokens", "span_chars")
  }

  /**
   * Apply stage of [[substrDupSpans]]: cut every duplicate char span out
   * of its document and reassemble the survivors — the canonical first
   * copy of each repeated substring is (by construction of the spans)
   * never cut, so exactly one copy survives corpus-wide. Spans from the
   * island merge are disjoint and non-adjacent, so the reassembly is a
   * per-document ordered concatenation of the between-span segments plus
   * the tail — one bounded per-doc window (segment starts via lag) and
   * one per-doc aggregate; documents without duplicate spans pass
   * through unchanged (removed_chars = 0).
   *
   * Returns (doc_id, removed_chars, text_clean) for EVERY input document.
   */
  def substrDedupApply(docs: DataFrame, L: Int, textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame =
    substrApplySpans(docs, substrDupSpans(docs, L, textCol, idCol),
      textCol, idCol)

  /** The reassembly half of [[substrDedupApply]], taking pre-computed
   * (possibly memoized) spans — callers that also publish the span dump
   * pass one materialization to both consumers. The cut is driven purely
   * by the span bounds, so no window length is needed here. */
  def substrApplySpans(docs: DataFrame, spans: DataFrame,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    val d = docs.select(col(idCol).as("doc_id"), col(textCol).as("text0"))
    val w = Window.partitionBy("doc_id").orderBy("span_start")
    val pieces = spans.join(d, Seq("doc_id"))
      .withColumn("seg_start", coalesce(lag("span_end", 1).over(w), lit(0L)))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        col("text0").substr((col("seg_start") + 1).cast("int"),
          (col("span_start") - col("seg_start")).cast("int")).as("piece"))
    val agg = pieces.groupBy("doc_id").agg(
      concat_ws("", transform(
        array_sort(collect_list(struct(col("span_start"), col("piece")))),
        s => s.getField("piece"))).as("head"),
      max("span_end").as("last_end"),
      sum(col("span_end") - col("span_start")).as("removed_chars"))
    d.join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("removed_chars"), lit(0L)).as("removed_chars"),
        when(col("last_end").isNull, col("text0"))
          .otherwise(concat(col("head"),
            col("text0").substr((col("last_end") + 1).cast("int"),
              length(col("text0"))))).as("text_clean"))
  }

  /**
   * DSIR-style data selection (Xie et al. 2023, "Data Selection for
   * Language Models via Importance Resampling"): score every candidate
   * document by how target-domain-like its hashed-unigram bag is —
   * log p_target(doc)/p_raw(doc) under bucketed bag-of-words models —
   * then Gumbel-top-k resample. The distribution models are two
   * B-bucket count tables (one aggregate over each corpus' tokens,
   * Laplace +1 smoothing), so the "model" broadcast to every executor
   * is B rows regardless of corpus size; scoring is one broadcast
   * hash-join at scan speed plus a per-doc aggregate. Per-token log
   * ratios are fixed to 1e-9 grains (BIGINT) before summing — the
   * per-doc score is an exact integer sum, bit-stable under any
   * partitioning (the txt_mi idiom).
   *
   * Returns (doc_id, n_tokens, w): w = sum of the doc's per-token
   * grained log ratios / 1e9. Documents with no tokens have no model
   * evidence and are omitted.
   */
  private def dsirTokens(df: DataFrame, buckets: Int, textCol: String,
                         idCol: String): DataFrame =
    tokenArr(df, textCol, idCol)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .withColumn("bucket", pmod(graft.dedup.Dedup.strHash(col("tok")),
        lit(buckets.toLong)))

  /** The trained DSIR model: (bucket, lr_g) — one grained log ratio per
   * hash bucket over the FULL bucket spine (every bucket present, so
   * scorers can index it without null handling). `buckets` rows total:
   * the whole model broadcasts to executors (or rides in a one-row map
   * for stateless streaming scorers) regardless of corpus size. */
  def dsirLogRatios(candidates: DataFrame, target: DataFrame, buckets: Int,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    require(buckets >= 2)
    val tCounts = dsirTokens(target, buckets, textCol, idCol)
      .groupBy("bucket").agg(count(lit(1)).as("tcnt"))
    val qCounts = dsirTokens(candidates, buckets, textCol, idCol)
      .groupBy("bucket").agg(count(lit(1)).as("qcnt"))
    val spine = candidates.sparkSession.range(buckets)
      .select(col("id").as("bucket"))
      .join(tCounts, Seq("bucket"), "left").na.fill(Map("tcnt" -> 0L))
      .join(qCounts, Seq("bucket"), "left").na.fill(Map("qcnt" -> 0L))
    val totals = spine.agg(sum("tcnt").as("tt"), sum("qcnt").as("qt"))
    // single-ln form so both engines evaluate the identical double
    // expression; grained to 1e-9 BIGINT immediately
    spine.crossJoin(broadcast(totals))
      .select(col("bucket"), graft.functions.FastRound.round(
        log(((col("tcnt") + 1L).cast("double")
            * (col("qt") + buckets).cast("double"))
          / ((col("qcnt") + 1L).cast("double")
            * (col("tt") + buckets).cast("double"))) * 1e9, 0)
        .cast("long").as("lr_g"))
  }

  def dsirWeights(candidates: DataFrame, target: DataFrame, buckets: Int,
                  textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val lr = dsirLogRatios(candidates, target, buckets, textCol, idCol)
    dsirTokens(candidates, buckets, textCol, idCol)
      .join(broadcast(lr), Seq("bucket"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("lr_g")).cast("double") / 1e9).as("w"))
  }

  /**
   * Gumbel-top-k resampling over [[dsirWeights]] — DSIR's sampling step
   * made deterministic: the Gumbel noise comes from the shared
   * polynomial hash of the doc id (u in (0,1), g = -ln(-ln(u))), so the
   * draw is reproducible on any engine and any partitioning. The final
   * key is rounded to 9 decimals before ranking (cross-engine ulp
   * hygiene); ties break by doc_id. A global top-k plans as
   * TakeOrderedAndProject — per-partition heaps, no global sort.
   *
   * Returns the k selected (doc_id, n_tokens, w, key9).
   */
  def dsirSelect(candidates: DataFrame, target: DataFrame, buckets: Int,
                 k: Int, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val mod = graft.functions.PolyHash31.Mod
    val w = dsirWeights(candidates, target, buckets, textCol, idCol)
    val u = (graft.dedup.Dedup.strHash(
        concat(lit("dsir:"), col("doc_id").cast("string"))) + 1L)
      .cast("double") / (mod + 1L).toDouble
    w.withColumn("key9",
        graft.functions.FastRound.round(col("w") - log(-log(u)), 9))
      .orderBy(col("key9").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Email/URL patterns shared by the operator and its spec. Conservative
   * character-class-only regexes: identical semantics in Java regex
   * (Spark) and RE2 (the DuckDB oracle) — no backreferences, no
   * lookaround, no dialect-dependent shorthand. */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val UrlPattern = "https?://[a-z0-9./_-]+"

  /**
   * PII scrubbing: count and redact email addresses and URLs per
   * document — the compliance pass every training-data pipeline runs
   * before packing. Pure projection (regexp_count + two regexp_replace),
   * no shuffle at all: a 100 TB corpus scrubs at scan speed. Returns
   * (doc_id, n_emails, n_urls, redacted) with matches replaced by
   * `<EMAIL>` / `<URL>` placeholders; emails are redacted first so a
   * mailto-style URL can't leave an address inside a redacted URL.
   */
  def redactPii(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      regexp_count(col(textCol), lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(col(textCol), lit(UrlPattern)).cast("long").as("n_urls"),
      regexp_replace(regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
        UrlPattern, "<URL>").as("redacted"))

  /**
   * Percentile quality gate: keep every document whose
   * [[graft.text.TextAnalysis.qualityScore]] reaches its language's exact
   * p-th quantile — the "drop the worst quartile per language" filter a
   * curation pipeline runs before mixing, per-language so a low-resource
   * language isn't graded against English norms.
   *
   * Shape at scale: one scan computes the score, then
   * [[graft.operators.Stats.exactPercentiles]] derives each language's
   * threshold from the distinct-value count prefix — O(1) task memory
   * even when one language holds most of the corpus (the buffering
   * `percentile()` aggregate would OOM there), then one broadcast join +
   * filter. The interpolation matches DuckDB's `quantile_cont` to the
   * ulp; both sides compare against the 9-digit rounded threshold so the
   * gate is bit-stable.
   *
   * Returns (doc_id, lang, quality, q_threshold) for surviving docs.
   */
  /** The gate's trained artifact on its own: per-language 9-dp-rounded
   * p-th quality quantile — broadcastable, and reusable by the streaming
   * drive ([[graft.streaming.EventStreams.qualityGateStreaming]]). */
  def qualityThresholds(docs: DataFrame, p: Double,
                        textCol: String = "text",
                        langCol: String = "lang"): DataFrame = {
    require(p >= 0 && p <= 1, s"quantile p must be in [0,1], got $p")
    thresholdsFromScored(docs.select(col(langCol).as("lang"),
      graft.text.TextAnalysis.qualityScore(col(textCol)).as("quality")), p)
  }

  private def thresholdsFromScored(scored: DataFrame, p: Double): DataFrame =
    graft.operators.Stats.exactPercentiles(scored,
        Seq("lang"), "quality", Seq("q" -> p))
      .select(col("lang"),
        graft.functions.FastRound.round(col("q"), 9).as("q_threshold"))

  /** Score + filter against per-language thresholds — shared by the
   * batch gate and the streaming drive (works on a batch frame or a
   * readStream micro-batch: stateless projection + broadcast join). */
  def qualityGateScore(docs: DataFrame, thresholds: DataFrame,
                       textCol: String = "text", idCol: String = "doc_id",
                       langCol: String = "lang"): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        graft.text.TextAnalysis.qualityScore(col(textCol)).as("quality"))
      .join(broadcast(thresholds), Seq("lang"))
      .filter(col("quality") >= col("q_threshold"))
      .select("doc_id", "lang", "quality", "q_threshold")

  def qualityGate(docs: DataFrame, p: Double = 0.25,
                  textCol: String = "text", idCol: String = "doc_id",
                  langCol: String = "lang"): DataFrame = {
    require(p >= 0 && p <= 1, s"quantile p must be in [0,1], got $p")
    // score ONCE and materialize: the fused token-stats expression is
    // the dominant cost, and both the threshold aggregate and the gate
    // read it — without the snapshot each would recompute the scan
    val scored = graft.util.Snapshot(docs.select(
      col(idCol).as("doc_id"), col(langCol).as("lang"),
      graft.text.TextAnalysis.qualityScore(col(textCol)).as("quality")))
    scored.join(broadcast(thresholdsFromScored(scored, p)), Seq("lang"))
      .filter(col("quality") >= col("q_threshold"))
      .select("doc_id", "lang", "quality", "q_threshold")
  }

  /**
   * Sliding-window chunking with overlap — the RAG / context-window
   * shaping step: each document becomes windows of `w` tokens starting
   * every `stride` tokens (`stride < w` ⇒ consecutive windows share
   * `w - stride` tokens), so no span longer than `stride` is ever split
   * across a window boundary without also appearing whole in some window.
   * Complementary to [[chunkDedup]]/[[removeBoilerplate]] (disjoint
   * chunks) and [[packSequences]] (budget packing).
   *
   * Window starts are `0, stride, 2·stride, …` while the start is inside
   * the document, so every token lands in at least one window and the
   * final windows may be shorter than `w`. Pure per-row explode — no
   * shuffle at all; a 100 TB corpus chunks at scan speed.
   *
   * Returns (doc_id, chunk_id, tok_start, n_toks, chunk_text) over the
   * whitespace-normalized token stream.
   */
  def chunkOverlap(docs: DataFrame, w: Int, stride: Int,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(w > 0 && stride > 0 && stride <= w,
      s"need 0 < stride <= w, got w=$w stride=$stride")
    val toks = docs.select(col(idCol).as("doc_id"),
      filter(split(graft.dedup.Dedup.normalize(col(textCol)), " "),
        t => length(t) > 0).as("toks"))
    toks
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"), posexplode(
        sequence(lit(0), floor((size(col("toks")) - 1) / lit(stride)).cast("int"))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        (col("col") * stride).cast("long").as("tok_start"),
        slice(col("toks"), col("col") * stride + 1, lit(w)).as("win"))
      .select(col("doc_id"), col("chunk_id"), col("tok_start"),
        size(col("win")).cast("long").as("n_toks"),
        array_join(col("win"), " ").as("chunk_text"))
  }

  /**
   * Count-min sketch (Cormode & Muthukrishnan, J. Algorithms '05)
   * frequency estimation over the corpus token stream, calibrated
   * against exact counts for the `topN` head tokens.
   *
   * The sketch is `depth` rows × `width` counters; token occurrences land
   * in bucket `(hashA(j)·strHash(t) + hashB(j)) % Mod % width` on row j —
   * the same affine-permutation family as the MinHash/SimHash lanes
   * ([[graft.dedup.Dedup.hashA]]). A point estimate is the MIN over rows
   * of the bucket counters: always ≥ the true count, within εN with
   * probability 1−δ (ε = e/width, δ = e^−depth). At 100 TB this is THE
   * frequency structure: the sketch is `depth·width` longs — mergeable,
   * broadcast-able — where an exact token count is a vocabulary-sized
   * shuffle.
   *
   * One pass builds the row-local counters (map-side-combinable groupBy
   * over depth copies of the per-token counts — NOT of the token stream:
   * tokens aggregate first, then explode ×depth). The estimate side joins
   * the topN exact head against the depth counters and takes the min.
   * Returns (token, cnt, est, rank) — est ≥ cnt by construction, equality
   * iff no colliding mass on some row.
   */
  def cmsEstimates(docs: DataFrame, depth: Int = 4, width: Int = 1024,
                   topN: Int = 50, textCol: String = "text"): DataFrame = {
    import graft.dedup.Dedup.{hashA, hashB, strHash, Mod}
    val tokCnt = docs.select(explode(
        filter(split(graft.dedup.Dedup.normalize(col(textCol)), " "),
          t => length(t) > 0)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .withColumn("h", strHash(col("token")))
    // sketch rows: depth copies of the (distinct-token, cnt) table — far
    // smaller than depth copies of the token stream
    val sketch = tokCnt
      .select(col("cnt"), col("h"), explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .select(col("cnt"), col("j"),
        pmod(pmod(hashA(col("j")) * col("h") + hashB(col("j")), lit(Mod)),
          lit(width.toLong)).as("bucket"))
      .groupBy("j", "bucket").agg(sum("cnt").as("bucket_cnt"))
    val head = tokCnt.orderBy(col("cnt").desc, col("token").asc).limit(topN)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("token").asc)))
    val probes = head
      .select(col("token"), col("cnt"), col("rank"), col("h"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .select(col("token"), col("cnt"), col("rank"), col("j"),
        pmod(pmod(hashA(col("j")) * col("h") + hashB(col("j")), lit(Mod)),
          lit(width.toLong)).as("bucket"))
    probes.join(broadcast(sketch), Seq("j", "bucket"))
      .groupBy("token", "cnt", "rank")
      .agg(min("bucket_cnt").as("est"))
      .select("token", "cnt", "est", "rank")
  }

  /**
   * PMI phrase mining over adjacent-token bigrams: pointwise mutual
   * information ln(N·c12 / (c1·c2)) for bigrams seen at least `minCount`
   * times, top `topK` by (pmi desc, bigram asc). The collocation detector
   * of word2vec-style phrase vocabularies (Mikolov et al., NeurIPS '13).
   *
   * All counts stay exact BIGINTs until the single division inside the
   * ln, so the score is bit-reproducible; the unigram side is a
   * vocabulary-sized broadcast (at 100 TB the vocabulary is millions of
   * rows — still broadcast-able — while the bigram side shuffles once for
   * its count). Selection is (rounded pmi, t1, t2) — a unique total
   * order → distributed TakeOrdered.
   */
  def pmiBigrams(docs: DataFrame, minCount: Long = 5, topK: Int = 20,
                 textCol: String = "text"): DataFrame = {
    val norm = filter(split(graft.dedup.Dedup.normalize(col(textCol)), " "),
      t => length(t) > 0)
    val bc = docs.select(norm.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> struct(toks[i - 1] AS t1, toks[i] AS t2))")).as("b"))
      .select(col("b.t1").as("t1"), col("b.t2").as("t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("c12"))
    val uc = docs.select(explode(norm).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
    val tot = bc.agg(sum("c12").as("n_big"))
    bc.filter(col("c12") >= minCount)
      .join(broadcast(uc.select(col("token").as("t1"), col("c").as("c1"))), "t1")
      .join(broadcast(uc.select(col("token").as("t2"), col("c").as("c2"))), "t2")
      .crossJoin(broadcast(tot))
      .select(col("t1"), col("t2"), col("c12"),
        graft.functions.FastRound.round(
          log((col("n_big") * col("c12")).cast("double") /
            (col("c1") * col("c2")).cast("double")), 9).as("pmi"))
      .orderBy(col("pmi").desc, col("t1").asc, col("t2").asc).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("pmi").desc, col("t1").asc, col("t2").asc)))
  }

  /**
   * Weighted sampling without replacement (Efraimidis & Spirakis, IPL '06
   * A-ES): each row draws priority u^(1/w) for uniform u — the top-k by
   * priority are an exact weighted sample. Deterministic: u comes from
   * the id hash ([[idHash]], u ∈ (0,1]), so the sample is replayable and
   * oracle-checkable. Computed in log space (ln u / w, monotone in
   * u^(1/w)) and rounded to 9 decimals with id as tiebreak, so the
   * selection is a unique total order → distributed TakeOrdered, never a
   * global sort of the corpus.
   */
  def weightedSample(docs: DataFrame, k: Int, weightCol: String,
                     idCol: String = "doc_id"): DataFrame = {
    val u = (idHash(col(idCol)) + 1.0) / 1000000007.0
    docs
      .filter(col(weightCol) > 0)
      .select(col(idCol).as("doc_id"),
        col(weightCol).cast("double").as("w"),
        graft.functions.FastRound.round(log(u) / col(weightCol), 9).as("priority"))
      .orderBy(col("priority").desc, col("doc_id").asc)
      .limit(k)
  }
}
