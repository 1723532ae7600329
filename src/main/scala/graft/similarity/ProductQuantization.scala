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

  /** A trained codebook collected to the driver: (j, cluster, centroid)
   * sorted by (j, cluster). O(m·k·subDim) doubles — PQ model parameters,
   * not data: like a Spark ML model's coefficient vector, it ships to
   * every task as literals so encoding needs no join at all. */
  type Model = Seq[(Int, Long, Seq[Double])]

  def collectModel(books: DataFrame): Model =
    books.select(col("j"), col("cluster"), col("centroid"))
      .collect().toSeq
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
      .sortBy(t => (t._1, t._2))

  /** The m-wide code array of one embedding row: per subspace, the
   * nearest codeword by `least` over (sqdist, cluster) structs — the
   * struct's lexicographic order IS the (sqdist asc, cluster asc)
   * argmin tie-break, and the whole expression is codegen'd
   * (VecSqDist + struct + least), so encoding is a pure stateless
   * projection: no shuffle, no state, streamable. */
  private def codeArray(model: Model, m: Int, subDim: Int): Column = {
    val ed = transform(col("embedding"), v => v.cast("double"))
    array((0 until m).map { j =>
      val sub = slice(ed, j * subDim + 1, subDim)
      val cands = model.filter(_._1 == j).map { case (_, c, cent) =>
        struct(KMeans.sqDist(sub, typedLit(cent)).as("d"), lit(c).as("c"))
      }
      least(cands: _*).getField("c")
    }: _*)
  }

  /** Encode vectors against a collected codebook: (vec_id, j, code) —
   * the PQ index table, m small codes per vector. Zero exchanges: the
   * model rides in the task binaries, each row computes its own codes
   * (PlanSpec pins the exchange-free plan). Works unchanged on a
   * streaming DataFrame (see the `ann_pq_stream` ingest). */
  def encodeWith(vecs: DataFrame, model: Model, m: Int,
                 subDim: Int): DataFrame =
    vecs.select(col("vec_id"),
        posexplode(codeArray(model, m, subDim)))
      .select(col("vec_id"), col("pos").cast("int").as("j"),
        col("col").as("code"))

  /** Encode the corpus against trained codebooks: collect the tiny
   * model, then the row-local projection. */
  def encode(embs: DataFrame, books: DataFrame, m: Int,
             subDim: Int): DataFrame =
    encodeWith(embs, collectModel(books), m, subDim)

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

  /** (vec_id, j, code) rows packed to (nn_id, codes[m]), j-ascending. */
  private def packedCodes(index: DataFrame): DataFrame =
    index
      .groupBy(col("vec_id").as("nn_id"))
      .agg(transform(array_sort(collect_list(struct(col("j"), col("code")))),
        x => x.getField("code")).as("codes"))

  /** The ADC score of a (codes, lut) row pair: the j-ascending ordered
   * sum of the m LUT entries the codes address, rounded to 9 dp. */
  private def approxCol(m: Int, k: Int): Column =
    graft.functions.FastRound.round(
      aggregate(
        transform(sequence(lit(0), lit(m - 1)),
          j => element_at(col("lut"),
            j.cast("long") * k + element_at(col("codes"), j + 1))),
        lit(0.0), (acc, x) => acc + x), 9)

  private def rankTopK(scored: DataFrame, topK: Int): DataFrame =
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("approx").desc, col("nn_id").asc)))
      .filter(col("rn") <= topK)
      .select("query_id", "nn_id", "approx", "rn")

  /**
   * ADC top-k over a (vec_id, j, code) index: every corpus code row is a
   * candidate; rank per query by (score desc, nn_id asc), self-matches
   * dropped before ranking. Returns (query_id, nn_id, approx, rn <= topK).
   */
  def adcTopK(index: DataFrame, queries: DataFrame, books: DataFrame,
              m: Int, subDim: Int, k: Int, topK: Int): DataFrame = {
    val luts = queryLuts(queries, books, m, subDim, k)
    rankTopK(
      packedCodes(index)
        .join(broadcast(luts), col("query_id") =!= col("nn_id"))
        .withColumn("approx", approxCol(m, k)),
      topK)
  }

  /**
   * IVF+PQ (the FAISS IndexIVFPQ shape): the coarse quantizer's
   * inverted lists prune the corpus — each query ADC-scores ONLY the
   * vectors in its nProbe nearest lists, from their codes alone. At
   * 100 TB that is the whole point of the composition: the scan touches
   * ~nProbe/nLists of the CODE table (m bytes per vector), never a raw
   * embedding. List assignment and probing mirror
   * [[Similarity.ivfTopKWith]] (rounded-cosine rank, ties to the lower
   * list id); scoring and ranking are the ADC fragments above, so the
   * result is exactly `adcTopK` restricted to the probed lists.
   */
  def ivfpqTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
                index: DataFrame, books: DataFrame, m: Int, subDim: Int,
                k: Int, nProbe: Int, topK: Int): DataFrame = {
    val assigned = corpus
      .select(col("vec_id").as("nn_id"), col("embedding").as("ce"))
      .crossJoin(broadcast(centroids))
      .select(col("nn_id"), col("cid"),
        graft.functions.FastRound.round(
          Similarity.cosine(col("ce"), col("centroid")), 9).as("ccos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("nn_id").orderBy(col("ccos").desc, col("cid").asc)))
      .filter(col("rn") === 1)
      .select("nn_id", "cid")
    val probes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .crossJoin(broadcast(centroids))
      .select(col("query_id"), col("cid"),
        graft.functions.FastRound.round(
          Similarity.cosine(col("qe"), col("centroid")), 9).as("qcos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("qcos").desc, col("cid").asc)))
      .filter(col("rn") <= nProbe)
      .select("query_id", "cid")
    val cand = assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("query_id") =!= col("nn_id"))
      .select("query_id", "nn_id")
    val luts = queryLuts(queries, books, m, subDim, k)
    rankTopK(
      cand.join(packedCodes(index), Seq("nn_id"))
        .join(broadcast(luts), Seq("query_id"))
        .withColumn("approx", approxCol(m, k)),
      topK)
  }
}
