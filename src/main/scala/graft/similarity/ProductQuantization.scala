package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Product quantization (PQ) with asymmetric-distance (ADC) scoring — the
 * memory-side of a 100 TB ANN index (Jégou et al., "Product Quantization
 * for Nearest Neighbor Search", TPAMI 2011; the FAISS `IndexPQ` shape).
 *
 * The embedding space is split into `m` contiguous subspaces of `subDim`
 * dims; each subspace gets its own deterministic Lloyd codebook
 * ([[KMeans]] — fixed-point centroid sums, lowest-id init), and every
 * corpus vector is encoded as `m` small codes. A query never touches the
 * raw corpus vectors: it builds an m×k lookup table of
 * `dot(querySub_j, centroid_{j,c})` once, and each candidate's
 * approximate inner product is the j-ascending ordered sum of `m` table
 * lookups — so the 100 TB scan reads only the code table (m bytes per
 * vector in production; the raw embeddings stay cold).
 *
 * Scale shape: codebook training touches the corpus `iters` times per
 * subspace with one broadcast + one map-side-combined (cluster, dim)
 * aggregate per pass (see [[KMeans.centroids]]); encoding is ONE corpus
 * scan — the m sub-rows explode per task, join a broadcast codebook
 * (m·k·subDim doubles), and the per-(vector, subspace) argmin prunes to
 * top-1 under WindowGroupLimit before the single (vec_id, j)-keyed
 * exchange; scoring is a stateless map over the code table (broadcast
 * per-query LUT maps) followed by a per-query top-k window. Nothing is
 * O(corpus) on the driver.
 *
 * Everything is bit-reproducible by the DuckDB oracle: double sums fold
 * in strict index order (VecDot / ordered `aggregate`), argmin ties break
 * on the smaller cluster id, and ranks sort on the 9-dp-rounded score.
 */
object ProductQuantization {

  /** One row per (vector, subspace): the `subDim`-wide double slice of
   * the embedding starting at dim j·subDim. Pure per-row explode — no
   * shuffle. */
  def subVectors(embs: DataFrame, m: Int, subDim: Int): DataFrame =
    embs
      .select(col("vec_id"),
        transform(col("embedding"), v => v.cast("double")).as("ed"))
      .select(col("vec_id"), explode(sequence(lit(0), lit(m - 1))).as("j"),
        col("ed"))
      .select(col("vec_id"), col("j"),
        slice(col("ed"), col("j") * subDim + 1, lit(subDim)).as("sub"))

  /** Per-subspace trained codebooks: (j, cluster, centroid[subDim]).
   * Each subspace trains independently over its slice of the corpus via
   * the deterministic [[KMeans]] (k lowest-id sub-vectors as init,
   * fixed-point updates). */
  def codebooks(embs: DataFrame, m: Int, subDim: Int, k: Int,
                iters: Int): DataFrame = {
    val ed = embs.select(col("vec_id"),
      transform(col("embedding"), v => v.cast("double")).as("ed"))
    (0 until m).map { j =>
      KMeans.centroids(
          ed.select(col("vec_id"),
            slice(col("ed"), j * subDim + 1, subDim).as("embedding")),
          k, iters)
        .select(lit(j).cast("int").as("j"), col("cluster"), col("centroid"))
    }.reduce(_.unionByName(_))
  }

  /** Encode the corpus against trained codebooks: (vec_id, j, code) —
   * the PQ index table. One corpus scan; the per-(vector, subspace)
   * nearest-centroid argmin (sqdist asc, cluster asc) plans as
   * WindowGroupLimit, so the exchange carries one row per (vector,
   * subspace), not per candidate. */
  def encode(embs: DataFrame, books: DataFrame, m: Int,
             subDim: Int): DataFrame =
    subVectors(embs, m, subDim)
      .join(broadcast(books), Seq("j"))
      .select(col("vec_id"), col("j"), col("cluster"),
        KMeans.sqDist(col("sub"), col("centroid")).as("sqdist"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id", "j")
          .orderBy(col("sqdist").asc, col("cluster").asc)))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("j"), col("cluster").as("code"))

  /** Per-query ADC lookup tables as a map keyed by j·k + cluster:
   * lut[(j,c)] = dot(querySub_j, centroid_{j,c}) in strict element
   * order. Map-typed (not a positional array) so a codebook whose empty
   * clusters vanished still addresses correctly. */
  def queryLuts(queries: DataFrame, books: DataFrame, m: Int, subDim: Int,
                k: Int): DataFrame =
    subVectors(queries, m, subDim)
      .join(broadcast(books), Seq("j"))
      .select(col("vec_id").as("query_id"),
        (col("j").cast("long") * k + col("cluster")).as("slot"),
        graft.functions.VecDot.dot(col("sub"), col("centroid")).as("v"))
      .groupBy("query_id")
      .agg(map_from_entries(collect_list(struct(col("slot"), col("v"))))
        .as("lut"))

  /**
   * ADC top-k over a (vec_id, j, code) index: each candidate's score is
   * the j-ascending ordered sum of its m LUT entries, rounded to 9 dp;
   * rank per query by (score desc, nn_id asc), self-matches dropped
   * before ranking. Returns (query_id, nn_id, approx, rn <= topK).
   */
  def adcTopK(index: DataFrame, queries: DataFrame, books: DataFrame,
              m: Int, subDim: Int, k: Int, topK: Int): DataFrame = {
    val packed = index
      .groupBy(col("vec_id").as("nn_id"))
      .agg(transform(array_sort(collect_list(struct(col("j"), col("code")))),
        x => x.getField("code")).as("codes"))
    val luts = queryLuts(queries, books, m, subDim, k)
    packed
      .join(broadcast(luts),
        col("query_id") =!= col("nn_id"))
      .withColumn("approx", graft.functions.FastRound.round(
        aggregate(
          transform(sequence(lit(0), lit(m - 1)),
            j => element_at(col("lut"),
              j.cast("long") * k + element_at(col("codes"), j + 1))),
          lit(0.0), (acc, x) => acc + x), 9))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("approx").desc, col("nn_id").asc)))
      .filter(col("rn") <= topK)
      .select("query_id", "nn_id", "approx", "rn")
  }
}
