package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines: token
 * counting, quality scoring, language identification, and document
 * fingerprinting. All are pure Column expressions built from
 * `org.apache.spark.sql.functions` higher-order functions, so they stay
 * inside whole-stage codegen — no UDFs, no driver round-trips; at 100 TB
 * these run as a single projection over the scan.
 *
 * Every function has a DuckDB-SQL twin in graft.queries.TrainOracles with
 * identical operand order so results hash-match bit-for-bit.
 */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword estimate: alpha runs count ceil(len/4) pieces (a crude
   * merge-table stand-in), digits and punctuation are one piece each. */
  def bpeTokenEstimate(text: Column): Column = {
    val alphaPieces = aggregate(
      transform(
        filter(split(lower(text), "[^a-z]+"), t => length(t) > 0),
        t => ceil(length(t).cast("double") / 4.0).cast("long")),
      lit(0L), (acc, v) => acc + v)
    val nonAlpha = length(regexp_replace(text, "[a-zA-Z\\s]", ""))
    alphaPieces + nonAlpha.cast("long")
  }

  /** Ratio of punctuation characters to total non-space characters. */
  def punctRatio(text: Column): Column = {
    val nonSpace = length(regexp_replace(text, "\\s", ""))
    val punct = length(regexp_replace(text, "[^!-/:-@\\[-`{-~]", ""))
    when(nonSpace === 0, lit(0.0))
      .otherwise(punct.cast("double") / nonSpace.cast("double"))
  }

  /** English stopword list used by the quality score / language id — a
   * fixed public tiny set, shared verbatim with the SQL oracle. */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Ratio of stopword tokens to all tokens. */
  def stopwordRatio(text: Column): Column = {
    val toks = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    val stops = filter(toks, t => t.isin(EnglishStopwords.map(lit): _*))
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(stops).cast("double") / size(toks).cast("double"))
  }

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column = {
    val toks = filter(split(trim(text), "\\s+"), t => length(t) > 0)
    when(size(toks) === 0, lit(0.0))
      .otherwise(aggregate(transform(toks, t => length(t).cast("double")),
        lit(0.0), (acc, v) => acc + v) / size(toks).cast("double"))
  }

  /**
   * Composite quality score in [0,1]: rewards mid-length documents and a
   * natural-language stopword rate, penalizes punctuation soup. The exact
   * formula is arbitrary (quality scoring always is); what matters is that
   * it is deterministic, cheap, and columnar.
   */
  def qualityScore(text: Column): Column = {
    val lenTerm = least(length(text).cast("double") / 500.0, lit(1.0))
    val stopTerm = least(stopwordRatio(text) * 5.0, lit(1.0))
    val punctTerm = greatest(lit(1.0) - punctRatio(text) * 4.0, lit(0.0))
    graft.functions.FastRound.round((lenTerm + stopTerm + punctTerm) / 3.0, 9)
  }

  /** Per-language marker-word sets for the stopword language-id heuristic
   * (public common function words, ascii only so the SQL twin matches
   * byte-for-byte; words shared between languages count for each list —
   * argmax with list-order priority resolves them). The SQL oracle derives
   * its CASE from THIS list, so it cannot drift. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it",
      "was", "for", "with", "are", "this", "not", "have", "you"),
    "de" -> Seq("der", "die", "und", "ist", "das", "nicht", "mit", "ein",
      "eine", "auf", "von", "den", "sich", "auch", "werden", "dem"),
    "fr" -> Seq("le", "la", "et", "est", "les", "des", "un", "une",
      "dans", "que", "pour", "qui", "sur", "pas", "avec", "par"),
    "es" -> Seq("el", "la", "y", "es", "los", "las", "de", "que",
      "en", "un", "una", "por", "con", "para", "del", "se"),
    "it" -> Seq("il", "la", "e", "che", "di", "un", "una", "per",
      "non", "sono", "con", "del", "le", "si", "da", "come"),
    "pt" -> Seq("o", "a", "e", "que", "de", "do", "da", "em",
      "um", "uma", "para", "com", "os", "as", "por", "se"),
  )

  /**
   * Language id: count marker-word hits per language, pick the argmax
   * (ties broken by the order of [[LangMarkers]]); "und" (undetermined)
   * when nothing matches.
   */
  def languageId(text: Column): Column = {
    val toks = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    def hits(words: Seq[String]): Column =
      size(filter(toks, t => t.isin(words.map(lit): _*)))
    val scored = LangMarkers.map { case (l, ws) => (l, hits(ws)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && s > 0, lit(l)).otherwise(acc)
    }
  }

  /** Large prime modulus for the rolling fingerprint (fits in 31 bits so
   * h*31+c never overflows a 64-bit long). */
  val FpMod = 2147483647L

  /**
   * Rolling polynomial fingerprint of the normalized text:
   * h = (h * 31 + ascii(ch)) mod 2^31-1 over every character of
   * lower(trim(text)). Order-dependent by construction, evaluated
   * sequentially by `aggregate` — the SQL twin uses list_reduce with the
   * same fold order. (At scale, swap for xxhash64(text); this form exists
   * for cross-engine verifiability.)
   */
  def fingerprint(text: Column): Column = charFold(lower(trim(text)))

  /** Sequential polynomial fold over the characters of `s` — same hash as
   * Dedup.strHash (codegen'd primitive loop, shared with the SQL oracle). */
  private def charFold(s: Column): Column = graft.functions.PolyHash31(s)

  /** Production winnowing parameters (defaults of [[winnow]]): k=25, w=25
   * gives the MOSS-scale match guarantee t = k + w - 1 = 49 characters and
   * fingerprint density ~2/(w+1) ≈ 7.7% of gram positions — the published
   * operating range (SIGMOD'03 uses densities of a few percent; k=5/w=4
   * fingerprinted ~40% of every document and made the pair join the
   * heaviest query in the suite). The DuckDB oracle CTE derives its
   * constants from THESE vals, so engine and oracle cannot drift. */
  val WinnowK = 25
  val WinnowW = 25

  /**
   * Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
   * — the MOSS algorithm): hash every character k-gram of the normalized
   * text, slide a window of `w` consecutive gram hashes, and keep the
   * window minimum — rightmost position on ties (the position-independent
   * tie rule; the paper's "repeat previous" refinement is sequential
   * state, deliberately traded away for a relational form). Guarantee:
   * any substring match of length >= k + w - 1 shares at least one
   * selected fingerprint, with ~2/(w+1) of grams kept.
   *
   * The rightmost-min selection is ONE windowed aggregate: each gram
   * encodes (hash, position) as `h * 2^31 - i` — minimizing picks the
   * smallest hash and, among equals, the largest i — and the frame
   * minimum decodes back exactly with integer arithmetic (h < 2^31,
   * 1 <= i < 2^31). No self-join, no per-window argmin subquery: the
   * whole operator is one explode + one bounded running window per doc +
   * one distinct. Docs with fewer than w grams emit nothing (no full
   * window), the standard contract.
   *
   * Returns distinct (doc_id, pos, gram_hash).
   */
  def winnow(df: DataFrame, k: Int = WinnowK, w: Int = WinnowW,
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 1 && w >= 1)
    val C = 2147483648L // 2^31 > Mod: makes the (hash, position) encoding injective
    val grams = df
      .select(col(idCol).as("doc_id"),
        graft.dedup.Dedup.normalize(col(textCol)).as("_nt"))
      .select(col("doc_id"), col("_nt"),
        explode(expr(s"if(length(_nt) < $k, array(), " +
          s"sequence(1, length(_nt) - ${k - 1}))")).as("i"))
      .select(col("doc_id"), col("i"),
        charFold(expr(s"substring(_nt, i, $k)")).as("h"),
        (length(col("_nt")) - (k - 1)).as("_ng"))
    val frame = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("i")
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, w - 1)
    // encode (h+1)*C - i, not h*C - i: the +1 keeps the key strictly
    // positive even for h = 0, where Spark's truncating `div` and
    // DuckDB's flooring `//` would otherwise disagree on the decode
    grams
      .withColumn("_m", min((col("h") + 1) * C - col("i")).over(frame))
      .filter(col("i") <= col("_ng") - (w - 1)) // full windows only
      .select(col("doc_id"),
        (expr(s"(_m div ${C}L + 1) * ${C}L") - col("_m")).as("pos"),
        expr(s"_m div ${C}L").as("gram_hash"))
      .distinct()
  }

  /**
   * MOSS matching over [[winnow]] fingerprints: pairs of documents
   * sharing at least `minShared` distinct fingerprint hashes, with the
   * shared count — the candidate step of fingerprint-based near-dup /
   * plagiarism detection. Same inverted-index shape as the ER blocking
   * core: hashes shared by more than `maxHashFreq` docs are dropped
   * before the self-join (boilerplate grams are the skew risk, exactly
   * like stopword shingles), so the join stays equi-join-shaped at any
   * corpus size. Positions are deliberately ignored here; a locator pass
   * joins them back for the surviving pairs only.
   *
   * The frequency cap changes recall (a dropped hash can no longer vote
   * toward `minShared`), so the drop is never silent: the observed-metrics
   * node `winnow_pairs_cap` reports `dropped_rows` (index postings removed
   * by the cap) and `input_rows` on every execution —
   * [[graft.util.CapMetrics]] documents how to read it.
   */
  def winnowPairs(fps0: DataFrame, minShared: Long,
                  maxHashFreq: Int = 1000): DataFrame = {
    val hs = graft.util.Snapshot( // both sides of the self-join read it
      fps0.select("doc_id", "gram_hash").distinct())
    // hot-key cap via aggregation + broadcast-sized join-back, never a
    // per-key window (graft.util.CapMetrics.dropHotKeys documents why);
    // SNAPSHOT the capped postings — the self-join consumes them twice,
    // and the cap subplan (freq agg + anti join) would otherwise run on
    // both sides (measured 0.72s -> 1.15s at sf0.1 without this)
    val freqOk = graft.util.Snapshot(graft.util.CapMetrics.dropHotKeys(
      hs, "gram_hash", maxHashFreq, "winnow_pairs_cap"))
    freqOk.select(col("gram_hash"), col("doc_id").as("d1"))
      .join(freqOk.select(col("gram_hash"), col("doc_id").as("d2")), Seq("gram_hash"))
      .filter(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /**
   * MOSS locator pass: for pairs that survived [[winnowPairs]], join the
   * POSITIONS of their shared fingerprints back — (d1, d2, gram_hash,
   * pos1, pos2), the per-pair character anchors a reviewer (or an exact
   * extender) starts from. This is deliberately a second pass: the
   * candidate join runs on the position-free distinct hash sets (small),
   * and only the surviving pairs — a vanishing fraction of the corpus —
   * ever touch positions. Both joins are hash equi-joins keyed on
   * (pair, hash) / (doc, hash); a fingerprint repeating at several
   * positions in one doc emits every (pos1, pos2) combination, bounded
   * by the per-doc position list for ONE hash (not a cross join over
   * docs).
   */
  def winnowLocate(fps0: DataFrame, pairs: DataFrame): DataFrame = {
    val fps = fps0.select("doc_id", "gram_hash", "pos")
    pairs.select("d1", "d2")
      .join(fps.select(col("doc_id").as("d1"), col("gram_hash"),
        col("pos").as("pos1")), Seq("d1"))
      .join(fps.select(col("doc_id").as("d2"), col("gram_hash"),
        col("pos").as("pos2")), Seq("d2", "gram_hash"))
      .select("d1", "d2", "gram_hash", "pos1", "pos2")
  }

  /**
   * All analyses as named columns over a text column.
   *
   * `fused = true` (default) computes every token-derived statistic from
   * ONE single-pass codegen'd expression ([[graft.functions.TokenTextStats]])
   * instead of the higher-order-function stack above: Catalyst's
   * ArrayFilter/ArrayTransform/ArrayAggregate are CodegenFallback, so the
   * HOF form walks an interpreted expression tree per token per statistic
   * — at 100 TB the difference between one tight byte loop per document
   * and ~10 interpreted array traversals. The HOF form (`fused = false`)
   * remains the executable reference semantics; a TrainSpec property test
   * asserts bit-identical output on unicode-rich generated strings, and
   * the DuckDB oracle pins both.
   */
  def analyze(df: DataFrame, textCol: String, fused: Boolean = true): DataFrame = {
    val t = col(textCol)
    if (!fused) return df.select(
      col("doc_id"),
      tokenCount(t).as("n_tokens"),
      bpeTokenEstimate(t).as("n_bpe_tokens"),
      graft.functions.FastRound.round(punctRatio(t), 9).as("punct_ratio"),
      graft.functions.FastRound.round(stopwordRatio(t), 9).as("stopword_ratio"),
      graft.functions.FastRound.round(meanTokenLen(t), 9).as("mean_token_len"),
      qualityScore(t).as("quality"),
      languageId(t).as("lang_id"),
      fingerprint(t).as("fingerprint"))

    val stats = graft.functions.TokenTextStats(t,
      EnglishStopwords, LangMarkers.map(_._2))
    val nonspace = element_at(stats, 1)         // sum of token codepoint lengths
    val nruns = element_at(stats, 2)            // filtered token count
    val stopHits = element_at(stats, 3)
    val bpeAlpha = element_at(stats, 4)
    val langHits = LangMarkers.indices.map(i => element_at(stats, 5 + i))

    val stopRatio = when(nruns === 0, lit(0.0))
      .otherwise(stopHits.cast("double") / nruns.cast("double"))
    val meanLen = when(nruns === 0, lit(0.0))
      .otherwise(nonspace.cast("double") / nruns.cast("double"))
    val bpe = bpeAlpha +
      length(regexp_replace(t, "[a-zA-Z\\s]", "")).cast("long")
    val lenTerm = least(length(t).cast("double") / 500.0, lit(1.0))
    val stopTerm = least(stopRatio * 5.0, lit(1.0))
    val punctTerm = greatest(lit(1.0) - punctRatio(t) * 4.0, lit(0.0))
    val quality = graft.functions.FastRound.round(
      (lenTerm + stopTerm + punctTerm) / 3.0, 9)
    val best = langHits.reduce((a, b) => greatest(a, b))
    val lang = LangMarkers.map(_._1).zip(langHits)
      .foldRight(lit("und")) { case ((l, s), acc) =>
        when(s === best && s > 0, lit(l)).otherwise(acc)
      }

    df.select(
      col("doc_id"),
      tokenCount(t).as("n_tokens"),
      bpe.as("n_bpe_tokens"),
      graft.functions.FastRound.round(punctRatio(t), 9).as("punct_ratio"),
      graft.functions.FastRound.round(stopRatio, 9).as("stopword_ratio"),
      graft.functions.FastRound.round(meanLen, 9).as("mean_token_len"),
      quality.as("quality"),
      lang.as("lang_id"),
      fingerprint(t).as("fingerprint"))
  }
}
