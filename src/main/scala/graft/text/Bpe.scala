package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding vocabulary induction (Sennrich et al., ACL '16) —
 * the tokenizer-training step of an LLM data pipeline, distributed.
 *
 * BPE learning iterates: count adjacent symbol pairs over the word
 * vocabulary (weighted by word frequency), merge the most frequent pair
 * everywhere, repeat. Two scale properties make this Spark-shaped:
 *
 *  - every iteration works on the DISTINCT-WORD vocabulary with counts,
 *    never the corpus: a 100 TB corpus aggregates to its vocabulary once
 *    (one map-combinable shuffle), and the m merge rounds run on that
 *    small table (snapshot per round, lineage stays O(1));
 *  - the merge step is POSITION-PARALLEL, not a sequential fold: greedy
 *    left-to-right non-overlapping merging equals the rule "a match
 *    merges iff its offset within its run of consecutive matches is
 *    even", and runs only exist when left == right — so each position
 *    decides locally from (match?, run-start parity), one `transform`
 *    over the symbol array. The same arithmetic is expressible in the
 *    DuckDB oracle's list lambdas, which is what proves it correct.
 *
 * Only the argmax pair (one row) ever reaches the driver per round.
 */
object Bpe {

  /** 1-based element access via `get` (0-based under the hood): NULL at
   * out-of-bounds positions even under ANSI mode, unlike element_at. */
  private def sym(syms: Column, i: Column): Column = get(syms, i - 1)

  /**
   * One merge round applied to a symbol-array column: every greedy
   * left-to-right occurrence of (a, b) becomes the fused symbol.
   * `matchAt(i)` = syms[i]==a && syms[i+1]==b; a position is kept unless
   * the previous position merged; a match merges iff a != b (no overlap
   * possible) or its offset from the start of its run of `a`s is even —
   * exactly greedy semantics, decided per position.
   */
  def mergeStep(syms: Column, a: Column, b: Column): Column = {
    val n = size(syms)
    // ma[i]: true iff a merge STARTS at position i (1-based)
    val ma = transform(sequence(lit(1), n), i => {
      val matched = (i < n) && (sym(syms, i) === a) && (sym(syms, i + 1) === b)
      // bound j by i inside the filter instead of sequence(1, i-1): an
      // empty Spark sequence(1, 0) DESCENDS (the shingles gotcha)
      val runStart = coalesce(
        array_max(filter(sequence(lit(1), n),
          j => (j < i) && (sym(syms, j) =!= a))), lit(0)) + 1
      matched && ((a =!= b) || ((i - runStart) % 2 === 0))
    })
    transform(
      filter(sequence(lit(1), n),
        i => !(i > 1 && coalesce(get(ma, i - 2), lit(false)))),
      i => when(get(ma, i - 1), concat(a, b)).otherwise(sym(syms, i)))
  }

  /** Word-frequency table of the normalized corpus: (word, cnt). */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(filter(
        split(graft.dedup.Dedup.normalize(col(textCol)), " "),
        t => length(t) > 0)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /**
   * Learn `nMerges` BPE merges from the corpus. Returns the merge table
   * (rank, lhs, rhs, n) in learned order — ties broken (count desc,
   * lhs asc, rhs asc) so the vocabulary is deterministic.
   */
  def learn(docs: DataFrame, nMerges: Int, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    var vocab = graft.util.Snapshot(wordCounts(docs, textCol)
      .select(col("cnt"), expr(
        "transform(sequence(1, length(word)), i -> substr(word, i, 1))").as("syms")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    for (r <- 1 to nMerges if !exhausted) {
      // single-symbol words contribute no pairs (explicit empty array:
      // sequence(1, 0) would descend)
      val best = vocab
        .select(col("cnt"), explode(expr(
          "if(size(syms) < 2, array(), " +
            "transform(sequence(1, size(syms) - 1), j -> struct(syms[j - 1] AS a, syms[j] AS b)))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r, a, b, n))
        vocab = graft.util.Snapshot(vocab.select(col("cnt"),
          mergeStep(col("syms"), lit(a), lit(b)).as("syms")))
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "lhs", "rhs", "n")
  }

  /**
   * Tokenize with a learned merge table: per-word subword counts (merges
   * applied in rank order to the vocabulary — NOT the corpus), joined
   * back to each document's words. Returns (doc_id, n_words, n_subwords,
   * n_chars): the sequence-length accounting a packing/batching stage
   * needs under the trained tokenizer.
   */
  def tokenStats(docs: DataFrame, mergeTable: Seq[(String, String)],
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"), explode(filter(
        split(graft.dedup.Dedup.normalize(col(textCol)), " "),
        t => length(t) > 0)).as("word"))
    val perWord = words.select(col("word")).distinct()
      .withColumn("syms", expr(
        "transform(sequence(1, length(word)), i -> substr(word, i, 1))"))
    val tokenized = mergeTable.foldLeft(perWord) { case (df, (a, b)) =>
      df.withColumn("syms", mergeStep(col("syms"), lit(a), lit(b)))
    }
    words.join(broadcast(tokenized
        .select(col("word"), size(col("syms")).as("n_sub"), length(col("word")).as("n_ch"))),
        Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sub")).as("n_subwords"),
        sum(col("n_ch")).as("n_chars"))
  }
}
