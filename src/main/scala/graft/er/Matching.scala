package graft.er

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Post-matching assignment constraints. After the comparison stage scores
 * candidate pairs, record-linkage usually wants at most ONE partner per
 * record; the distributed-friendly classic is reciprocal best match
 * (symmetric best: keep (a, b) iff b is a's top-scored partner AND a is
 * b's) — the exact-Hungarian alternative is inherently sequential and
 * driver-bound, while this is two WindowGroupLimit top-1 passes over the
 * directed edge list, one shuffle each, no iteration.
 */
object Matching {

  /**
   * Reciprocal (symmetric) best match over an undirected scored pair set
   * `(p1, p2, wCol)`: orient both ways, take each node's best partner by
   * (weight desc, partner asc — the deterministic tiebreak), keep pairs
   * that are mutually best. Guarantees each node appears in at most one
   * output pair (its unique best), so the result is a matching in the
   * graph-theory sense. Input follows the engine-wide undirected pair
   * convention p1 < p2 (every call site does).
   */
  /**
   * Near-maximal weighted matching by iterated reciprocal rounds: each
   * round keeps the mutually-best pairs (a valid matching), removes the
   * matched nodes, and rematches the remainder — the distributed
   * approximation of greedy maximal matching (sequential greedy is
   * edge-ordered and driver-bound; r rounds of local argmax reach the
   * same 1/2-approximation guarantee). Rounds are a driver loop over
   * snapshot-flattened frames; per-round work is two WindowGroupLimit
   * passes + two anti-joins. Returns (p1, p2, wCol, round).
   */
  def maximalMatching(pairs: DataFrame, wCol: String = "w",
                      rounds: Int = 3): DataFrame = {
    require(rounds >= 1)
    var remaining = pairs
    var acc: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      val m = graft.util.Snapshot(reciprocalBestMatch(remaining, wCol)
        .withColumn("round", lit(r)))
      acc = Some(acc.fold(m)(_.unionByName(m)))
      // the last round's residual is never rematched — materializing it
      // was a pure O(edges) parquet write nobody read
      if (r < rounds) {
        val nodes = m.select(col("p1").as("node"))
          .unionByName(m.select(col("p2").as("node"))).distinct()
        remaining = graft.util.Snapshot(remaining
          .join(nodes.select(col("node").as("p1")), Seq("p1"), "left_anti")
          .join(nodes.select(col("node").as("p2")), Seq("p2"), "left_anti"))
      }
    }
    acc.get
  }

  def reciprocalBestMatch(pairs: DataFrame, wCol: String = "w"): DataFrame = {
    val dir = pairs.select(col("p1").as("a"), col("p2").as("b"), col(wCol))
      .unionByName(pairs.select(col("p2").as("a"), col("p1").as("b"), col(wCol)))
    val best = dir
      .withColumn("rn", row_number().over(
        Window.partitionBy("a").orderBy(col(wCol).desc, col("b").asc)))
      .filter(col("rn") === 1)
      .select(col("a"), col("b"))
    // mutually-best pairs from best ⋈ best (one row per node — the SMALL
    // relation), then ONE semi-join back to the scored pairs: the former
    // two consecutive semi-joins scanned the O(edges) pair set twice
    val mutual = best
      .join(best.select(col("b").as("a"), col("a").as("b")), Seq("a", "b"),
        "left_semi")
      .filter(col("a") < col("b"))
      .select(col("a").as("p1"), col("b").as("p2"))
    pairs.join(mutual, Seq("p1", "p2"), "left_semi")
  }
}
