package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`):
 *
 *  - brute-force cosine top-k — the exactness baseline: a (queries ×
 *    corpus) join with the dot product as a codegen'd higher-order
 *    function. Correct at any scale when the query side is small enough
 *    to broadcast; O(Q·N) comparisons.
 *  - LSH-bucketed top-k — the 100 TB path: sign-random-projection buckets
 *    (deterministic hyperplanes) turn the cross join into an equi-join on
 *    the bucket key; recall < 1 by construction, cost drops by the bucket
 *    fan-out. Probing all single-bit-flip neighbor buckets trades cost
 *    back for recall.
 *  - cosine near-duplicate pairs — embedding-based dedup: same bucketing,
 *    self-join, threshold filter.
 *
 * Dot products are evaluated with `aggregate(zip_with(...))` in strict
 * element order, doubles end-to-end, so the DuckDB oracle (list_reduce in
 * the same order) matches bit-for-bit; results are rounded to 9 decimals
 * on both sides.
 */
object Similarity {

  /** Sequential-order dot product in doubles — a codegen'd primitive loop
   * (graft.functions.VecDot); Catalyst higher-order functions would run
   * interpreted (CodegenFallback) in this hot path. */
  def dot(a: Column, b: Column): Column = graft.functions.VecDot.dot(a, b)

  /** L2 norm (sequential sum of squares). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /**
   * Exact cosine top-k: for each query vector, the k nearest corpus
   * vectors (excluding itself). The query side is expected to be small —
   * broadcast it; Catalyst then plans a broadcast nested-loop join with
   * the whole dot product inside codegen.
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("nn_id"), col("embedding").as("ce"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"),
        graft.functions.FastRound.round(cosine(col("qe"), col("ce")), 9).as("cos"))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("nn_id").asc)))
      .filter(col("rn") <= k)
      .select("query_id", "nn_id", "cos", "rn")
  }

  /**
   * Hard-negative mining for contrastive training: per query, the top-k
   * most-similar corpus vectors with a DIFFERENT label — the negatives a
   * random sampler would almost never surface but a bi-encoder most needs.
   * Same shape as [[bruteForceTopK]] (broadcast queries over a corpus
   * scan, per-query WindowGroupLimit) plus the label-inequality gate; at
   * scale the corpus side swaps for the IVF/PQ candidate path unchanged,
   * since the gate is a plain filter on the scored candidates.
   */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("nn_id"), col("embedding").as("ce"),
      col("label").as("nn_label"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
      col("label").as("q_label"))
    c.crossJoin(broadcast(q))
      .filter(col("q_label") =!= col("nn_label"))
      .select(col("query_id"), col("nn_id"), col("nn_label"),
        graft.functions.FastRound.round(cosine(col("qe"), col("ce")), 9).as("cos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("nn_id").asc)))
      .filter(col("rn") <= k)
      .select("query_id", "nn_id", "nn_label", "cos", "rn")
  }

  /**
   * Johnson-Lindenstrauss random-sign projection (Achlioptas, PODS '01):
   * dim → outDim via a deterministic ±1 matrix (LCG parity over
   * j·dim + i), one codegen'd [[dot]] per output component — cosine
   * ranking is scale-free, so the 1/√outDim factor is omitted. The
   * projected table keeps the `embedding` column name, so every
   * downstream consumer ([[bruteForceTopK]], the SRP banding) runs on it
   * unchanged: at 100 TB the projection is a scan-speed map that cuts
   * every later distance evaluation by dim/outDim.
   */
  def jlProject(vecs: DataFrame, outDim: Int, dim: Int = 64): DataFrame = {
    val ys = (0 until outDim).map { j =>
      val signs = Array.tabulate(dim)(i =>
        if (((1103515245L * (j.toLong * dim + i) + 12345L) % 2147483647L) % 2 == 0L)
          1.0 else -1.0)
      dot(col("embedding"), lit(signs))
    }
    vecs.select(col("vec_id"), array(ys: _*).as("embedding"))
  }

  /** Deterministic pseudo-random hyperplane for plane p: a fixed LCG over
   * p * dim + i mapped to [-0.5, 0.5) — computed once on the driver and
   * shipped as an array literal (identical values to the SQL oracle's
   * per-row arithmetic, but evaluated zero times per row here). */
  private def planeArray(p: Int, dim: Int): Seq[Double] =
    (0 until dim).map { i =>
      ((1103515245L * (p.toLong * dim + i) + 12345L) % 2147483647L).toDouble /
        2147483647.0 - 0.5
    }

  /** Sign-random-projection bucket key from `planes` fixed hyperplanes:
   * bit p = (embedding · plane_p) >= 0, with the dot a codegen'd VecDot
   * against the literal plane. */
  def srpBucket(emb: Column, planes: Int, dim: Int): Column = {
    val bits = (0 until planes).map { p =>
      val d = dot(emb, typedLit(planeArray(p, dim)))
      when(d >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /**
   * LSH-bucketed approximate top-k: candidates are corpus vectors in the
   * query's bucket or any bucket at Hamming distance 1 (single-plane flip
   * probing), ranked by exact cosine. The join is an equi-join on the
   * bucket key — the shuffle is O(N), not O(Q·N).
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 8, dim: Int = 64): DataFrame = {
    val c = corpus.select(col("vec_id").as("nn_id"), col("embedding").as("ce"),
      srpBucket(col("embedding"), planes, dim).as("bucket"))
    // query probes: own bucket + all single-bit flips
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        srpBucket(col("embedding"), planes, dim).as("qb"))
      .select(col("query_id"), col("qe"), explode(array(
        col("qb") +: (0 until planes).map(p => col("qb").bitwiseXOR(lit(1L << p))): _*)).as("bucket"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"),
        graft.functions.FastRound.round(cosine(col("qe"), col("ce")), 9).as("cos"))
      .distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("nn_id").asc)))
      .filter(col("rn") <= k)
      .select("query_id", "nn_id", "cos", "rn")
  }

  /**
   * IVF (inverted-file) approximate top-k — the classic ANN scale path
   * beside SRP-LSH: a coarse quantizer partitions the corpus into
   * `nCentroids` inverted lists; a query probes only the `nProbe` nearest
   * lists and ranks their members by exact cosine.
   *
   * Centroids are deterministic (the corpus vectors with the lowest ids) so
   * the DuckDB oracle reproduces assignments bit-for-bit; production would
   * plug k-means centroids in — the dataflow (assign = argmax over a
   * broadcast centroid table, candidates = equi-join on the list id) is
   * unchanged. Scale shape: assignment is O(N·C) with the centroid table
   * broadcast (never shuffled); candidate generation is an equi-join on
   * `cid`, so the shuffle carries O(N) rows and each query scores only
   * ~nProbe/nCentroids of the corpus.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4): DataFrame =
    ivfTopKWith(corpus, queries,
      corpus.filter(col("vec_id") < nCentroids)
        .select(col("vec_id").as("cid"), col("embedding").as("centroid")),
      k, nProbe)

  /** IVF against an externally trained coarse quantizer — e.g.
   * [[KMeans.centroids]] (cid, centroid: array<double>); VecDot accepts
   * the float corpus side against the double centroid side directly.
   * Same dataflow as [[ivfTopK]]: broadcast centroids, one O(N)
   * equi-join shuffle on the list id. */
  def ivfTopKWith(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
                  k: Int, nProbe: Int): DataFrame = {
    val cent = centroids
    // inverted lists: nearest centroid per corpus vector (rounded cosine,
    // ties to the lower centroid id — same total order as the oracle)
    val assigned = corpus.select(col("vec_id").as("nn_id"), col("embedding").as("ce"))
      .crossJoin(broadcast(cent))
      .select(col("nn_id"), col("ce"), col("cid"),
        graft.functions.FastRound.round(cosine(col("ce"), col("centroid")), 9).as("ccos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("nn_id").orderBy(col("ccos").desc, col("cid").asc)))
      .filter(col("rn") === 1)
      .select("nn_id", "ce", "cid")
    val probes = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .crossJoin(broadcast(cent))
      .select(col("query_id"), col("qe"), col("cid"),
        graft.functions.FastRound.round(cosine(col("qe"), col("centroid")), 9).as("qcos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("qcos").desc, col("cid").asc)))
      .filter(col("rn") <= nProbe)
      .select("query_id", "qe", "cid")
    // each corpus vector lives in exactly one list and probes are distinct
    // lists per query, so (query_id, nn_id) is already unique — no distinct
    assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"),
        graft.functions.FastRound.round(cosine(col("qe"), col("ce")), 9).as("cos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("nn_id").asc)))
      .filter(col("rn") <= k)
      .select("query_id", "nn_id", "cos", "rn")
  }

  /**
   * Deterministic planted near-duplicates: for every `every`-th vector,
   * a perturbed twin v'[i] = v[i] + eps * v[(i+1) mod dim] under a shifted
   * id. For eps = 0.01 the twin sits at angle ~eps radians (cosine
   * ~0.99995) — the production near-dup regime — while the synthetic
   * corpus's unrelated pairs stay below ~0.55, so a 0.9 threshold isolates
   * exactly the planted pairs. Arithmetic is element-ordered double ops
   * cast back to float, reproduced bit-for-bit by the DuckDB oracle.
   */
  def plantNearDups(vecs: DataFrame, every: Int, idOffset: Long,
                    eps: Double, dim: Int = 64): DataFrame =
    vecs.filter(col("vec_id") % every === 0)
      .select((col("vec_id") + idOffset).as("vec_id"),
        expr(s"transform(embedding, (x, i) -> cast(cast(x as double) + " +
          s"$eps * cast(element_at(embedding, cast((i + 1) % $dim as int) + 1) as double) as float))")
          .as("embedding"))

  /**
   * Embedding-cosine near-duplicate pairs: banded SRP signature (the same
   * band trick as MinHash-LSH dedup) -> per-band bucket self-join ->
   * candidate pairs dedup'd BEFORE the cosine verify, v1 < v2, cosine >=
   * threshold.
   *
   * Bucket-size bound: each band keys on `planes / bands` sign bits, so a
   * band splits N vectors into 2^(planes/bands) buckets (16 here) — the
   * self-join is O(bands * (N / 2^(planes/bands))^2) expected under
   * balanced hashing, and at larger N you raise planes-per-band to keep
   * N / 2^b bounded (each extra bit halves the expected bucket). Recall:
   * a pair at angle theta shares a band with prob. (1 - theta/pi)^b per
   * band; banding across `bands` independent bands trades the single-
   * bucket recall cliff for a union of cheap probes — for true near-dups
   * (cosine -> 1, theta -> 0) recall approaches 1.
   */
  def cosineNearDupPairs(vecs: DataFrame, threshold: Double,
                         planes: Int = 16, bands: Int = 4, dim: Int = 64): DataFrame = {
    require(planes % bands == 0)
    val rb = planes / bands
    val v = vecs.select(col("vec_id"), col("embedding"),
      srpBucket(col("embedding"), planes, dim).as("sig"))
      .transform(graft.util.Snapshot.apply) // three readers below; srpBucket is per-row heavy
    val banded = v.select(col("vec_id"), explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("sig"), b * rb).bitwiseAND(lit((1L << rb) - 1)).as("bkey"))
      }: _*)).as("bk"))
      .select(col("vec_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val a = banded.select(col("band"), col("bkey"), col("vec_id").as("v1"))
    val b = banded.select(col("band"), col("bkey"), col("vec_id").as("v2"))
    val cand = a.join(b, Seq("band", "bkey")).filter(col("v1") < col("v2"))
      .select("v1", "v2").distinct() // dedup candidates before the O(dim) verify
    cand
      .join(v.select(col("vec_id").as("v1"), col("embedding").as("e1")), Seq("v1"))
      .join(v.select(col("vec_id").as("v2"), col("embedding").as("e2")), Seq("v2"))
      .select(col("v1"), col("v2"),
        graft.functions.FastRound.round(cosine(col("e1"), col("e2")), 9).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /**
   * SemDeDup (Abbas et al., 2023, arXiv:2303.09540): semantic
   * deduplication of an embedding corpus — cluster with a trained coarse
   * quantizer, compare vectors ONLY within their cluster, and drop every
   * vector that has a higher-priority semantic duplicate. The k-means
   * partition is what makes the pairwise step tractable: cost is
   * O(sum over clusters of |c|^2) = O(N^2/k) expected, and at corpus
   * scale k grows with N (the paper runs 50k clusters) so |c| stays
   * bounded — the same bounded-bucket discipline as every other
   * self-join in this engine.
   *
   * Priority rule: deterministic keep-lowest-vec_id — a vector is dropped
   * iff SOME same-cluster vector with a SMALLER id has cosine >= tau to
   * it (the paper keeps the example with lowest similarity to the
   * centroid; any fixed total order gives the same dedup rate, and id
   * order is reproducible in SQL). Greedy, not transitive-closure: in a
   * chain a~b~c without a~c, both b and c drop — the paper's behavior,
   * and one anti-join instead of a connected-components loop.
   *
   * Returns every vector as (vec_id, cluster, kept) — survivors flagged
   * rather than filtered, so the dedup rate is part of the result.
   * Cosines are rounded to 9 before the threshold test (oracle parity).
   */
  def semDedup(vecs: DataFrame, cents: DataFrame, tau: Double): DataFrame = {
    val asg = KMeans.assignFinal(vecs, cents).select("vec_id", "cluster")
    // The within-cluster join below is quadratic in the LARGEST cluster
    // (the paper's own bound; the lever at scale is k). Surface that
    // bound as an observed metric — max cluster pair volume — on the
    // snapshot write, so a degenerate cluster (e.g. all zero vectors
    // bucketed together) shows up in metrics instead of as a hung stage.
    // The sizes agg collapses to k rows and broadcasts; pass-through
    // otherwise (schema and hashes unchanged — `_csz` dropped).
    val sizes = asg.groupBy("cluster").agg(count(lit(1)).as("_csz"))
    val v = graft.util.Snapshot( // three readers: both join sides + output
      graft.util.CapMetrics.observeMaxPairs(
        vecs.select("vec_id", "embedding").join(asg, "vec_id")
          .join(broadcast(sizes), Seq("cluster")),
        "semdedup_max_cluster_pairs").drop("_csz"))
    val a = v.select(col("cluster"), col("vec_id").as("v1"), col("embedding").as("e1"))
    val b = v.select(col("cluster"), col("vec_id").as("v2"), col("embedding").as("e2"))
    val dropped = a.join(b, Seq("cluster")).filter(col("v1") < col("v2"))
      .filter(graft.functions.FastRound.round(cosine(col("e1"), col("e2")), 9) >= tau)
      .select(col("v2").as("vec_id")).distinct()
    v.select("vec_id", "cluster")
      .join(dropped.withColumn("_d", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"), col("_d").isNull.as("kept"))
  }

  /**
   * Symmetric int8 quantization of an embedding column — the storage /
   * memory-bandwidth lever for ANN at 100 TB (4x smaller vectors, SIMD
   * int dot products downstream). Per vector: scale = 127 / max|x_i|,
   * q_i = halfAway(x_i * scale) in [-127, 127]. A pure projection (no
   * shuffle); all-zero vectors quantize to zeros with scale 0 rather
   * than dividing by zero.
   *
   * Rounding is written out as the explicit half-AWAY-from-zero CASE
   * (floor(v + 0.5) / -floor(-v + 0.5)) so the SQL oracle states the
   * identical arithmetic — no dependence on either engine's round()
   * mode. The projection keeps (q_sum, q_hash) alongside the quantized
   * array: order-sensitive checksums that pin the exact lane values.
   */
  def quantizeInt8(vecs: DataFrame, dim: Int = 64): DataFrame = {
    val amax = s"aggregate(embedding, cast(0.0 as double), (m, x) -> greatest(m, abs(cast(x as double))))"
    val q = s"transform(embedding, x -> " +
      s"cast(case when cast(x as double) * __scale >= 0 then floor(cast(x as double) * __scale + 0.5d) " +
      s"else -floor(-(cast(x as double) * __scale) + 0.5d) end as bigint))"
    vecs
      .withColumn("__scale", when(expr(amax) > 0.0, lit(127.0) / expr(amax)).otherwise(lit(0.0)))
      .withColumn("q", expr(q))
      .select(col("vec_id"),
        graft.functions.FastRound.round(col("__scale"), 9).as("scale"),
        expr("aggregate(q, cast(0 as bigint), (acc, v) -> acc + v)").as("q_sum"),
        expr(s"aggregate(q, cast(0 as bigint), (acc, v) -> (acc * 31 + (v + 128)) % ${graft.functions.PolyHash31.Mod})").as("q_hash"))
  }
}
