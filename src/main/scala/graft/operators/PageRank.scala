package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Fixed-iteration PageRank over an undirected pair set — the canonical
 * iterative-join workload (what GraphX/Pregel runs), expressed as plain
 * DataFrame joins + aggregations so Catalyst/AQE schedule it: per
 * iteration ONE equi-join of the static (edge ⨝ degree) relation with
 * the current ranks and ONE hash aggregation on the destination. The
 * static side is snapshot once; the rank frames chain lazily (each is
 * consumed exactly once by the next iteration, so the plan is a
 * depth-`iters` chain — LINEAR in the fixed iteration count, not the
 * exponential lineage of a frame referenced twice per round) and the
 * whole fixed-point computation executes as one job.
 *
 * Determinism: ranks live in fixed-point (1e9 = 1.0). Per-edge
 * contributions `round(rf / deg)` and the damped update
 * `round(0.15e9 + 0.85 * sum)` are computed with the same expression
 * shapes as the DuckDB oracle, and the only aggregation is an exact
 * integer SUM — no double-sum ordering anywhere, so results are
 * bit-identical on any partitioning (sum stays far below 2^53: total
 * mass is ~|V|·1e9).
 *
 * Undirected edges mean every vertex has out-degree ≥ 1 — no dangling
 * mass term. Vertices outside `pairs` don't participate (rank is only
 * meaningful relative to the component anyway).
 *
 * Returns (profile_id, deg, rank) with rank = rf / 1e9.
 */
object PageRank {

  val Fp = 1000000000L

  def run(pairs: DataFrame, iters: Int,
          srcCol: String = "p1", dstCol: String = "p2"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e0 = pairs.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val edges = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst")))
    // degrees are read three times (the static edge join, the initial
    // ranks, the final output join) — snapshot once
    val deg = graft.util.Snapshot(
      edges.groupBy("src").agg(count(lit(1)).as("deg")))
    // static per-edge (src, dst, deg): one join, reused every iteration
    val withDeg = graft.util.Snapshot(edges.join(deg, "src"))
    // The iterations chain WITHOUT per-iteration snapshots: each rank
    // frame is consumed exactly once (by the next iteration's join), so
    // lineage grows LINEARLY with the fixed `iters` — a depth-`iters`
    // plan of join+agg pairs that executes as one job, no recomputation.
    // (The exponential-lineage pitfall needs a frame referenced more than
    // once per round; only `withDeg` is, and it IS snapshot.) This
    // removes iters+1 parquet write+read round-trips per evaluation;
    // results are bit-identical because all rank arithmetic is
    // fixed-point integer, partitioning-independent.
    var ranks = deg.select(col("src").as("node"), lit(Fp).as("rf"))
    for (_ <- 1 to iters) {
      val contrib = withDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"),
          graft.functions.FastRound.round(col("rf") / col("deg"), 0)
            .cast("long").as("c"))
      ranks = contrib.groupBy(col("dst").as("node"))
        .agg(graft.functions.FastRound.round(
            lit(150000000.0) + lit(0.85) * sum(col("c")).cast("double"), 0)
          .cast("long").as("rf"))
    }
    ranks.join(deg.withColumnRenamed("src", "node"), "node")
      .select(col("node").as("profile_id"), col("deg"),
        (col("rf") / lit(1000000000.0)).as("rank"))
  }
}
