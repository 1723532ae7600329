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
   * graph-theory sense.
   */
  def reciprocalBestMatch(pairs: DataFrame, wCol: String = "w"): DataFrame = {
    val dir = pairs.select(col("p1").as("a"), col("p2").as("b"), col(wCol))
      .unionByName(pairs.select(col("p2").as("a"), col("p1").as("b"), col(wCol)))
    val best = dir
      .withColumn("rn", row_number().over(
        Window.partitionBy("a").orderBy(col(wCol).desc, col("b").asc)))
      .filter(col("rn") === 1)
      .select(col("a"), col("b"))
    pairs
      .join(best.select(col("a").as("p1"), col("b").as("p2")), Seq("p1", "p2"),
        "left_semi")
      .join(best.select(col("b").as("p1"), col("a").as("p2")), Seq("p1", "p2"),
        "left_semi")
  }
}
