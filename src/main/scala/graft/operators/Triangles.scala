package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed triangle counting over an id-oriented edge list — the
 * classic two-join enumeration (Suri & Vassilvitskii, "Counting
 * Triangles and the Curse of the Last Reducer", WWW'11): because each
 * undirected edge is stored exactly once as (p1 < p2), every triangle
 * {a < b < c} is produced exactly once as the wedge (a,b)+(b,c) closed
 * by edge (a,c) — no dedup pass, no double counting.
 *
 * Scale shape: two shuffled equi-joins on edge endpoints — wedge
 * generation joins on the shared middle vertex, closure joins the wedge
 * set back against the edge list on (a, c). Wedge volume is Σ
 * out-deg(b)·in-deg(b) under the id orientation; on a production power-law
 * graph you'd orient edges by (degree, id) instead of raw id so every
 * vertex's out-degree is O(sqrt(edges)) (same two joins, one extra
 * degree-ranking pass). The ER matched-pair graphs this engine feeds it
 * are post-pruning and near-clique-free, so id orientation is the right
 * default and the degree pass would be pure overhead.
 */
object Triangles {

  /** Per-node triangle counts over an oriented (p1 < p2) edge list:
   * (profile_id, n_triangles), nodes in no triangle omitted. */
  def perNode(edges: DataFrame): DataFrame = {
    val e = edges.select(col("p1"), col("p2"))
    val wedges = e.as("e1")
      .join(e.as("e2"), col("e1.p2") === col("e2.p1"))
      .select(col("e1.p1").as("a"), col("e1.p2").as("b"), col("e2.p2").as("c"))
    val tri = wedges
      .join(e.as("e3"),
        col("a") === col("e3.p1") && col("c") === col("e3.p2"))
      .select(col("a"), col("b"), col("c"))
    tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("profile_id"))
      .groupBy("profile_id")
      .agg(count(lit(1)).as("n_triangles"))
  }
}
