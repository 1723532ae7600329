package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * k-core decomposition (Seidman, Social Networks '83): the maximal
 * subgraph in which every node keeps degree >= k, found by iterative
 * peeling — drop all nodes below k, remove their edges, repeat to
 * fixpoint. The standard denoising pass over similarity/match graphs:
 * chains and stray pairs peel away, densely corroborated groups remain.
 *
 * Each round is one degree aggregate + two semi-joins over the surviving
 * edge list, snapshot-materialized (flat lineage); rounds needed =
 * peeling depth, not graph size. Like ConnectedComponents, hitting
 * `maxRounds` without converging THROWS — a silently truncated peel
 * would report a supergraph of the core.
 */
object KCore {

  /** Returns (n, core_deg): the nodes of the k-core of the undirected
   * edge list `(p1, p2)` with their in-core degrees. */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 8): DataFrame = {
    require(k >= 1)
    // the surviving-edge count rides each materialization job as an
    // observed metric (Snapshot.observed) instead of a separate count()
    // over the freshly written parquet — one job per peel round, not two
    def snapCounted(df: DataFrame): (DataFrame, Long) = {
      val (snap, m) = graft.util.Snapshot.observed(df,
        count(lit(1)).as("n_edges"))
      (snap, m("n_edges").asInstanceOf[Long])
    }
    var (es, nEdges) = snapCounted(edges.select(col("p1"), col("p2")))
    var converged = false
    var r = 0
    while (!converged && r < maxRounds) {
      val deg = es.select(col("p1").as("n"))
        .unionByName(es.select(col("p2").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select("n")
      val (next, m) = snapCounted(es
        .join(keep.select(col("n").as("p1")), Seq("p1"), "left_semi")
        .join(keep.select(col("n").as("p2")), Seq("p2"), "left_semi"))
      converged = m == nEdges
      es = next; nEdges = m; r += 1
    }
    if (!converged && nEdges > 0)
      throw new IllegalStateException(s"KCore.kCore did not converge " +
        s"within $maxRounds rounds — the result would be a supergraph " +
        s"of the $k-core; raise maxRounds")
    es.select(col("p1").as("n")).unionByName(es.select(col("p2").as("n")))
      .groupBy("n").agg(count(lit(1)).as("core_deg"))
  }
}
