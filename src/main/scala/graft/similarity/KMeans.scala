package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic Lloyd k-means over an embedding column — the clustering
 * pass a training-data pipeline uses for topic bucketing, data-mixture
 * balancing, and IVF coarse quantizers (the centroids this produces are
 * the production replacement for [[Similarity.ivfTopK]]'s lowest-id
 * placeholder lists).
 *
 * Everything is reproducible bit-for-bit by the DuckDB oracle, which is
 * what forces the two non-obvious design choices:
 *
 *  - **Init is deterministic**: the k lowest `vec_id` vectors, cluster
 *    ids 0..k-1 in id order (k-means++ needs an RNG; at 100 TB you'd
 *    seed from a KMV-style hash sample instead — the iteration shape
 *    below is unchanged).
 *  - **Centroid updates are fixed-point**: a float group-mean summed as
 *    doubles depends on partial-aggregation order, so re-running the
 *    same job could move a centroid by 1 ULP and flip a boundary
 *    assignment. Components are scaled to 1e-6 integers
 *    (`round(v * 1e6)` as BIGINT) and summed exactly — the sum is
 *    order-independent, so the mean (and every downstream assignment)
 *    is identical on any partitioning, any engine.
 *
 * Per iteration: one broadcast of k·dim doubles to every task (the
 * assignment cross join — the corpus·k candidate rows are generated and
 * pruned in place: the literal top-1 window plans as WindowGroupLimit,
 * so the exchange behind it carries ≈ one row per vector, not per
 * (vector, centroid)), then one (cluster, dim)-keyed aggregation of
 * k·dim long sums (map-side combinable, so that exchange carries
 * O(partitions · k · dim) rows, not the corpus). That is the canonical
 * scalable k-means shape: per iteration the corpus is scanned once and
 * crosses the wire once, pre-reduced.
 */
object KMeans {

  /** Squared L2 distance in strict element order — one codegen'd
   * primitive loop ([[graft.functions.VecSqDist]]; the earlier
   * zip_with-the-difference composition paid CodegenFallback
   * interpretation per candidate pair). The oracle folds
   * (e[i]-c[i])*(e[i]-c[i]) left to right identically. */
  def sqDist(a: Column, b: Column): Column =
    graft.functions.VecSqDist.sqDist(a, b)

  private def asDouble(emb: Column): Column =
    transform(emb, v => v.cast("double"))

  /** Nearest-centroid assignment: corpus × broadcast(centroids), winner
   * by (sqdist asc, cluster asc) via a per-vector top-1 window
   * (WindowGroupLimit: each task keeps only its local winner before any
   * exchange). Returns (vec_id, cluster, sqdist). */
  def assign(embs: DataFrame, centroids: DataFrame): DataFrame =
    embs.select(col("vec_id"), asDouble(col("embedding")).as("ed"))
      .crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("cluster"), col("ed"),
        sqDist(col("ed"), col("centroid")).as("sqdist"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id")
          .orderBy(col("sqdist").asc, col("cluster").asc)))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cluster"), col("ed"), col("sqdist"))

  /** Exact order-independent centroid update: per (cluster, dim) sums of
   * 1e-6 fixed-point components, reassembled into `array<double>` in dim
   * order. Empty clusters simply vanish (k shrinks), matching the
   * oracle's inner-join semantics. */
  private def update(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster"), posexplode(col("ed")).as(Seq("dim", "v")))
      .groupBy("cluster", "dim")
      .agg(sum(graft.functions.FastRound.round(col("v") * 1000000.0, 0)
        .cast("long")).as("sfix"), count(lit(1)).as("n"))
      .select(col("cluster"), col("dim"),
        (col("sfix").cast("double") / 1000000.0 / col("n").cast("double"))
          .as("cval"))
      .groupBy("cluster")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("cval")))),
        x => x.getField("cval")).as("centroid"))

  /** The k lowest-id vectors as cluster 0..k-1. The rank window runs on
   * a post-limit frame of exactly k rows — bounded by construction. */
  def initCentroids(embs: DataFrame, k: Int): DataFrame =
    embs.orderBy(col("vec_id").asc).limit(k)
      .select(col("vec_id"), asDouble(col("embedding")).as("centroid"))
      .withColumn("cluster",
        row_number().over(Window.orderBy(col("vec_id").asc)).cast("long") - 1L)
      .select(col("cluster"), col("centroid"))

  /**
   * Run `iters` Lloyd iterations from the deterministic init and return
   * the trained centroids (cluster, centroid: array<double>). Each
   * intermediate centroid set is k·dim rows — snapshotted eagerly so the
   * lineage stays one-iteration deep (the connected-components lesson:
   * never let an iterative plan nest).
   */
  def centroids(embs: DataFrame, k: Int, iters: Int): DataFrame = {
    val e = embs.select("vec_id", "embedding")
    var cents = graft.util.Snapshot(initCentroids(e, k))
    for (_ <- 1 to iters)
      cents = graft.util.Snapshot(update(assign(e, cents)))
    cents
  }

  /** Final assignment against a trained centroid set:
   * (vec_id, cluster, sqdist rounded to 9). */
  def assignFinal(embs: DataFrame, cents: DataFrame): DataFrame =
    assign(embs.select("vec_id", "embedding"), cents)
      .select(col("vec_id"), col("cluster"),
        graft.functions.FastRound.round(col("sqdist"), 9).as("sqdist"))

  /** Train + assign in one call. */
  def kmeans(embs: DataFrame, k: Int, iters: Int): DataFrame =
    assignFinal(embs, centroids(embs, k, iters))
}
