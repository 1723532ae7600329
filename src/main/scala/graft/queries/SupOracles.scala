package graft.queries

/**
 * DuckDB oracles for [[SupQueries]]. Builds on ErOracles.prelude (the
 * blocking/cleaning pipeline CTEs) and follows the same parity discipline:
 * sorted sequential folds for double sums, natural log via ln(), FLOOR
 * before BIGINT casts (DuckDB's double->int cast rounds, Spark truncates),
 * rounded feature columns feeding the deterministic p_match score.
 *
 * The attr-clustering oracle needs a recursive CTE for connected
 * components; it is written `AS  (` (two spaces) so
 * ErOracles.materializeCtes skips it — a recursive CTE cannot be
 * MATERIALIZED.
 */
object SupOracles {

  private val Mod = "2147483647"

  private def strHash(e: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       | list_transform(generate_series(1, length($e)),
       |   i -> CAST(ascii(substr($e, CAST(i AS INTEGER), 1)) AS BIGINT))),
       | (acc, c) -> (acc * 31 + c) % $Mod)""".stripMargin.replace("\n", " ")

  /** Sorted sequential double fold (matches Spark's
   * aggregate(array_sort(collect_list(...)))). */
  private def sfold(e: String): String =
    s"list_reduce(list_prepend(0.0, list_sort(list($e))), (acc, x) -> acc + x)"

  /** Supervised-feature CTEs on top of the ER prelude (mstat -> perprof ->
   * spairs -> sdeg -> gtc -> feat -> scored -> overt). Clean ER: redundant
   * comparisons count only cross-source neighbors (size - own-source
   * count) and pairs are cross-source. */
  private def supPrelude(clean: Boolean = false): String = {
    val redundant =
      if (clean) "CAST(SUM(size - own) AS BIGINT)" else "CAST(SUM(size - 1) AS BIGINT)"
    val mown =
      if (clean)
        """mown AS (SELECT key, source_id, CAST(COUNT(*) AS BIGINT) AS own
          |         FROM m2 GROUP BY key, source_id),
          |""".stripMargin
      else ""
    val mstatSel =
      if (clean)
        """mstat AS (SELECT m.profile_id, m.source_id, m.key, s.size, s.comparisons, o.own
          |          FROM m2 m JOIN bs2 s USING (key) JOIN mown o USING (key, source_id)),"""
          .stripMargin
      else
        """mstat AS (SELECT m.profile_id, m.source_id, m.key, s.size, s.comparisons, 1 AS own
          |          FROM m2 m JOIN bs2 s USING (key)),""".stripMargin
    val pairCond =
      if (clean) "a.key = b.key AND a.profile_id < b.profile_id AND a.source_id <> b.source_id"
      else "a.key = b.key AND a.profile_id < b.profile_id"
    ErOracles.prelude(clean) + mown +
    s"""$mstatSel
       |perprof AS (
       |  SELECT profile_id, CAST(COUNT(*) AS BIGINT) AS nblocks_p,
       |         ${sfold("1.0 / CAST(size AS DOUBLE)")} AS inv_size_p,
       |         CAST(SUM(comparisons) AS BIGINT) AS comp_p,
       |         ${sfold("1.0 / CAST(comparisons AS DOUBLE)")} AS inv_comp_p,
       |         $redundant AS redundant_p
       |  FROM mstat GROUP BY profile_id),
       |gstats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS blocks_num,
       |                CAST(SUM(comparisons) AS DOUBLE) AS total_comparisons FROM bs2),
       |spairs AS (
       |  SELECT a.profile_id AS p1, b.profile_id AS p2, CAST(COUNT(*) AS BIGINT) AS cbs,
       |         ${sfold("1.0 / CAST(a.comparisons AS DOUBLE)")} AS raccb_raw,
       |         ${sfold("1.0 / CAST(a.size AS DOUBLE)")} AS rs_raw
       |  FROM mstat a JOIN mstat b ON $pairCond
       |  GROUP BY 1, 2),
       |sdeg AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS nonred
       |         FROM (SELECT p1 AS p FROM spairs UNION ALL SELECT p2 FROM spairs) GROUP BY p),
       |gtc AS (SELECT DISTINCT LEAST(a.p_partkey, b.p_partkey) AS p1,
       |               GREATEST(a.p_partkey, b.p_partkey) AS p2
       |        FROM part a JOIN part b ON a.p_name = b.p_name AND a.p_partkey < b.p_partkey),
       |featraw AS (
       |  SELECT sp.p1, sp.p2,
       |         CAST(sp.cbs AS DOUBLE) * ln(g.blocks_num / pp1.nblocks_p) * ln(g.blocks_num / pp2.nblocks_p) AS cfibf_r,
       |         GREATEST(sp.raccb_raw, 0.000001) AS raccb_r,
       |         CAST(sp.cbs AS DOUBLE) / (pp1.redundant_p + pp2.redundant_p - CAST(sp.cbs AS DOUBLE)) AS js_r,
       |         d1.nonred AS num_comp_p1, d2.nonred AS num_comp_p2,
       |         sp.rs_raw AS rs_r,
       |         CAST(sp.cbs AS DOUBLE) / (pp1.nblocks_p + pp2.nblocks_p - CAST(sp.cbs AS DOUBLE))
       |           * ln(g.total_comparisons / pp1.comp_p) * ln(g.total_comparisons / pp2.comp_p) AS aejs_r,
       |         sp.rs_raw / (pp1.inv_size_p + pp2.inv_size_p - sp.rs_raw) AS nrs_r,
       |         GREATEST(sp.raccb_raw, 0.000001)
       |           / (pp1.inv_comp_p + pp2.inv_comp_p - GREATEST(sp.raccb_raw, 0.000001)) AS wjs_r,
       |         CASE WHEN gg.p1 IS NOT NULL THEN 1 ELSE 0 END AS is_match
       |  FROM spairs sp
       |  JOIN perprof pp1 ON sp.p1 = pp1.profile_id
       |  JOIN perprof pp2 ON sp.p2 = pp2.profile_id
       |  JOIN sdeg d1 ON sp.p1 = d1.p JOIN sdeg d2 ON sp.p2 = d2.p
       |  CROSS JOIN gstats g
       |  LEFT JOIN gtc gg ON sp.p1 = gg.p1 AND sp.p2 = gg.p2),
       |feat AS (
       |  SELECT p1, p2, round(cfibf_r, 9) AS cfibf, round(raccb_r, 9) AS raccb,
       |         round(js_r, 9) AS js, num_comp_p1, num_comp_p2,
       |         round(rs_r, 9) AS rs, round(aejs_r, 9) AS aejs,
       |         round(nrs_r, 9) AS nrs, round(wjs_r, 9) AS wjs, is_match
       |  FROM featraw),
       |scored AS (SELECT *, round((js + nrs + wjs) / 3.0, 9) AS p_match FROM feat),
       |overt AS (SELECT p1, p2, p_match, is_match FROM scored WHERE p_match >= 0.5),
       |""".stripMargin
  }

  private val eps = "0.000000001"

  /** Frozen-model linear term, generated from the engine's constant list:
   * left-assoc chain in declared order, every coefficient CAST to DOUBLE
   * (a bare 0.01 literal is DECIMAL in DuckDB — decimal*BIGINT arithmetic
   * would diverge from Spark's double promotion in the last ulp). */
  private val fixedZ: String =
    graft.er.SupervisedMB.FixedCoefficients.foldLeft(
      s"CAST(${graft.er.SupervisedMB.FixedIntercept} AS DOUBLE)") {
      case (acc, (c, w)) => s"$acc + CAST($w AS DOUBLE) * $c"
    }

  /** Cluster-pipeline CTEs (shared by attr_clusters / blast_wnp and their
   * option-parity variants): attrs with parity sources -> attr tokens ->
   * minhash -> band pairs -> best edges -> recursive-CTE connected
   * components -> cluster ids + entropy. `normalize` divides each
   * attribute entropy by log2(total occurrences); `attrFilter` restricts
   * the attribute universe (for the unclustered-attribute fixture). */
  private def clusterPrelude(normalize: Boolean = false,
                             attrFilter: String = "TRUE"): String =
    s"""WITH RECURSIVE cattrs0 AS (
       |  SELECT p_partkey AS profile_id, CAST(p_partkey % 2 AS INTEGER) AS source_id, 'name' AS attribute, p_name AS value FROM part
       |  UNION ALL SELECT p_partkey, CAST(p_partkey % 2 AS INTEGER), 'brand', p_brand FROM part
       |  UNION ALL SELECT p_partkey, CAST(p_partkey % 2 AS INTEGER), 'type', p_type FROM part
       |  UNION ALL SELECT p_partkey, CAST(p_partkey % 2 AS INTEGER), 'size', CAST(p_size AS VARCHAR) FROM part
       |  UNION ALL SELECT p_partkey, CAST(p_partkey % 2 AS INTEGER), 'price', CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR) FROM part
       |),
       |cattrs AS (SELECT * FROM cattrs0 WHERE $attrFilter),
       |occ AS (
       |  SELECT profile_id, source_id,
       |         CAST(source_id AS VARCHAR) || '_' || attribute AS qattr, tok AS token
       |  FROM (SELECT profile_id, source_id, attribute,
       |               unnest(regexp_split_to_array(lower(value), '[^\\p{L}\\p{N}_]+')) AS tok
       |        FROM cattrs WHERE value IS NOT NULL AND attribute IS NOT NULL) u
       |  WHERE tok <> ''),
       |qat AS (SELECT DISTINCT qattr, token FROM occ),
       |qh AS (SELECT qattr, ${strHash("token")} AS x FROM qat),
       |qsigs AS (
       |  SELECT qattr, i.i AS i,
       |         MIN(((1103515245 * (i.i + 1) + 12345) % $Mod * x + (2654435761 * (i.i + 1)) % $Mod) % $Mod) AS sig
       |  FROM qh, (SELECT unnest(generate_series(0, 15)) AS i) i
       |  GROUP BY qattr, i.i),
       |qbk AS (
       |  SELECT qattr, CAST(i // 4 AS INTEGER) AS band,
       |         array_to_string(list_sort(list(CAST(i AS VARCHAR) || ':' || CAST(sig AS VARCHAR))), ',') AS band_key
       |  FROM qsigs GROUP BY qattr, CAST(i // 4 AS INTEGER)),
       |qcand AS (
       |  SELECT DISTINCT a.qattr AS a1, b.qattr AS a2
       |  FROM qbk a JOIN qbk b ON a.band = b.band AND a.band_key = b.band_key AND a.qattr < b.qattr
       |  WHERE split_part(a.qattr, '_', 1) <> split_part(b.qattr, '_', 1)),
       |qsim AS (
       |  SELECT c.a1, c.a2,
       |         CAST(SUM(CASE WHEN s1.sig = s2.sig THEN 1 ELSE 0 END) AS DOUBLE) / 16 AS sim
       |  FROM qcand c JOIN qsigs s1 ON c.a1 = s1.qattr
       |  JOIN qsigs s2 ON c.a2 = s2.qattr AND s1.i = s2.i
       |  GROUP BY c.a1, c.a2),
       |dirsim AS (SELECT a1 AS a, a2 AS b, sim FROM qsim
       |           UNION ALL SELECT a2, a1, sim FROM qsim),
       |qmax AS (SELECT a, MAX(sim) AS mx FROM dirsim GROUP BY a),
       |kept AS (
       |  SELECT DISTINCT LEAST(d.a, d.b) AS a1, GREATEST(d.a, d.b) AS a2
       |  FROM dirsim d JOIN qmax m ON d.a = m.a
       |  WHERE d.sim >= m.mx * 0.8 - 0.000000000001),
       |edges2 AS (SELECT a1 AS u, a2 AS v FROM kept UNION SELECT a2, a1 FROM kept),
       |inverts AS (SELECT DISTINCT u AS qattr FROM edges2),
       |reach AS  (
       |  SELECT qattr, qattr AS lbl FROM inverts
       |  UNION
       |  SELECT e.v AS qattr, r.lbl
       |  FROM reach r JOIN edges2 e ON e.u = r.qattr),
       |labels AS (SELECT qattr, MIN(lbl) AS lbl FROM reach GROUP BY qattr),
       |ids AS (SELECT lbl, CAST(ROW_NUMBER() OVER (ORDER BY lbl) - 1 AS INTEGER) AS cluster_id
       |        FROM (SELECT DISTINCT lbl FROM labels)),
       |nclu AS (SELECT CAST(COUNT(*) AS INTEGER) AS c FROM ids),
       |verts AS (SELECT DISTINCT qattr FROM qat),
       |assigned AS (
       |  SELECT v.qattr, COALESCE(i.cluster_id, nclu.c) AS cluster_id
       |  FROM verts v LEFT JOIN labels l ON v.qattr = l.qattr
       |  LEFT JOIN ids i ON l.lbl = i.lbl CROSS JOIN nclu),
       |tc AS (SELECT qattr, token, CAST(COUNT(*) AS BIGINT) AS c FROM occ GROUP BY 1, 2),
       |tot AS (SELECT qattr, CAST(SUM(c) AS BIGINT) AS tot FROM tc GROUP BY 1),
       |aent AS (
       |  SELECT qattr, -${sfold("CAST(c AS DOUBLE) / tot * log2(CAST(c AS DOUBLE) / tot)")}${if (normalize) " / log2(CAST(tot AS DOUBLE))" else ""} AS attr_entropy
       |  FROM tc JOIN tot USING (qattr) GROUP BY qattr, tot),
       |clent AS (
       |  SELECT a.cluster_id,
       |         ${sfold("COALESCE(e.attr_entropy, 0.0)")} / COUNT(*) AS entropy
       |  FROM assigned a LEFT JOIN aent e USING (qattr) GROUP BY a.cluster_id),
       |clusters AS (
       |  SELECT a.qattr, a.cluster_id, c.entropy
       |  FROM assigned a JOIN clent c USING (cluster_id)),
       |""".stripMargin

  def all: Map[String, String] = Map(
    "sup_features" -> (supPrelude() +
      """x AS (SELECT 1)
        |SELECT p1, p2, cfibf, raccb, js, num_comp_p1, num_comp_p2, rs, aejs, nrs, wjs, is_match
        |FROM feat""".stripMargin),

    "sup_features_clean" -> (supPrelude(clean = true) +
      """x AS (SELECT 1)
        |SELECT p1, p2, cfibf, raccb, js, num_comp_p1, num_comp_p2, rs, aejs, nrs, wjs, is_match
        |FROM feat""".stripMargin),

    "sup_bcl" -> (supPrelude() +
      "x AS (SELECT 1) SELECT p1, p2, p_match, is_match FROM overt"),

    "sup_wep" -> (supPrelude() +
      s"""swthr AS (SELECT SUM(p_match) / COUNT(*) AS t FROM overt)
         |SELECT p1, p2, p_match, is_match FROM overt, swthr WHERE p_match >= t - $eps""".stripMargin),

    "sup_cep" -> (supPrelude() +
      s"""kk AS (SELECT CAST(FLOOR(SUM(size) / 2.0) AS BIGINT) AS k FROM bs2),
         |ranked AS (SELECT p1, p2, p_match, is_match,
         |           ROW_NUMBER() OVER (ORDER BY p_match DESC, p1, p2) AS rn FROM overt)
         |SELECT p1, p2, p_match, is_match FROM ranked, kk WHERE rn <= k""".stripMargin),

    "sup_blast" -> (supPrelude() +
      s"""m1 AS (SELECT p1, MAX(p_match) AS mx1 FROM overt GROUP BY p1),
         |m2x AS (SELECT p2, MAX(p_match) AS mx2 FROM overt GROUP BY p2)
         |SELECT o.p1, o.p2, o.p_match, o.is_match
         |FROM overt o JOIN m1 ON o.p1 = m1.p1 JOIN m2x ON o.p2 = m2x.p2
         |WHERE o.p_match >= 0.35 * (m1.mx1 + m2x.mx2) - $eps""".stripMargin),

    "sup_cnp" -> supCnp("OR"),
    "sup_rcnp" -> supCnp("AND"),

    // z generated from SupervisedMB.FixedCoefficients so the literal
    // chain (values AND fold order) cannot drift from the engine
    "sup_scored_fixed" -> (supPrelude() +
      s"""x AS (SELECT 1)
         |SELECT p1, p2, round(1.0 / (1.0 + exp(-($fixedZ))), 9) AS p_match, is_match
         |FROM feat""".stripMargin),

    // PR-curve twin: same bucket-and-cumulate shape, same rounding
    "sup_pr_curve" -> (supPrelude() +
      s"""sf AS (SELECT round(1.0 / (1.0 + exp(-($fixedZ))), 9) AS p, is_match FROM feat),
         |bk AS (SELECT LEAST(CAST(floor(p * 10) AS BIGINT), 9) AS bb,
         |              CAST(COUNT(*) AS BIGINT) AS n_e,
         |              CAST(SUM(CASE WHEN is_match = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_m
         |       FROM sf GROUP BY 1),
         |th AS (SELECT unnest(generate_series(0, 9)) AS b),
         |prcum AS (SELECT th.b,
         |          CAST(COALESCE(SUM(bk.n_e), 0) AS BIGINT) AS n_edges,
         |          CAST(COALESCE(SUM(bk.n_m), 0) AS BIGINT) AS n_match
         |        FROM th LEFT JOIN bk ON bk.bb >= th.b GROUP BY th.b),
         |ng AS (SELECT CAST(COUNT(*) AS BIGINT) AS gt_n FROM gtc)
         |SELECT CAST(b AS DOUBLE) / 10.0 AS threshold, n_edges, n_match,
         |       round(CASE WHEN n_edges > 0
         |                  THEN CAST(n_match AS DOUBLE) / CAST(n_edges AS DOUBLE)
         |                  ELSE 0.0 END, 9) AS precision,
         |       round(CAST(n_match AS DOUBLE) / CAST(gt_n AS DOUBLE), 9) AS recall
         |FROM prcum, ng""".stripMargin),

    "sup_stats" -> (supPrelude() +
      """nm AS (SELECT CAST(SUM(CASE WHEN is_match = 1 THEN 1 ELSE 0 END) AS BIGINT) AS num_matches,
        |              CAST(COUNT(*) AS BIGINT) AS num_edges FROM overt),
        |ng AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM gtc)
        |SELECT num_matches, num_edges,
        |       CAST(num_matches AS DOUBLE) / n AS pc,
        |       CAST(num_matches AS DOUBLE) / num_edges AS pq,
        |       CASE WHEN CAST(num_matches AS DOUBLE) / n > 0 AND CAST(num_matches AS DOUBLE) / num_edges > 0
        |            THEN 2.0 * (CAST(num_matches AS DOUBLE) / n) * (CAST(num_matches AS DOUBLE) / num_edges)
        |                 / (CAST(num_matches AS DOUBLE) / n + CAST(num_matches AS DOUBLE) / num_edges)
        |            ELSE 0.0 END AS f1
        |FROM nm, ng""".stripMargin),

    "prog_pps" -> (ErOracles.prelude(clean = false) + ErOracles.wpw("cbs") +
      ErOracles.directed +
      """top AS (SELECT a, b, w FROM (
        |  SELECT a, b, w, ROW_NUMBER() OVER (PARTITION BY a ORDER BY w DESC, b) AS rn
        |  FROM directed) WHERE rn <= 20),
        |lik AS (SELECT a, SUM(w) / COUNT(*) AS likelihood FROM top GROUP BY a),
        |rankedp AS (
        |  SELECT LEAST(t.a, t.b) AS p1, GREATEST(t.a, t.b) AS p2, t.w, t.a,
        |         l.likelihood
        |  FROM top t JOIN lik l ON t.a = l.a),
        |rr AS (SELECT p1, p2, w,
        |       ROW_NUMBER() OVER (ORDER BY likelihood DESC, a, w DESC, p1, p2) AS rank
        |       FROM rankedp),
        |rf AS (SELECT * FROM rr WHERE rank <= 500),
        |dedup AS (SELECT rank, p1, p2, w,
        |          ROW_NUMBER() OVER (PARTITION BY p1, p2 ORDER BY rank) AS keep FROM rf)
        |SELECT rank, p1, p2, round(w, 9) AS w FROM dedup WHERE keep = 1""".stripMargin),

    "prog_pps_clean" -> (ErOracles.prelude(clean = true) + ErOracles.wpw("cbs") +
      ErOracles.directed +
      """top AS (SELECT a, b, w FROM (
        |  SELECT a, b, w, ROW_NUMBER() OVER (PARTITION BY a ORDER BY w DESC, b) AS rn
        |  FROM directed) WHERE rn <= 20),
        |lik AS (SELECT a, SUM(w) / COUNT(*) AS likelihood FROM top GROUP BY a),
        |rankedp AS (
        |  SELECT LEAST(t.a, t.b) AS p1, GREATEST(t.a, t.b) AS p2, t.w, t.a,
        |         l.likelihood
        |  FROM top t JOIN lik l ON t.a = l.a),
        |rr AS (SELECT p1, p2, w,
        |       ROW_NUMBER() OVER (ORDER BY likelihood DESC, a, w DESC, p1, p2) AS rank
        |       FROM rankedp),
        |rf AS (SELECT * FROM rr WHERE rank <= 500),
        |dedup AS (SELECT rank, p1, p2, w,
        |          ROW_NUMBER() OVER (PARTITION BY p1, p2 ORDER BY rank) AS keep FROM rf)
        |SELECT rank, p1, p2, round(w, 9) AS w FROM dedup WHERE keep = 1""".stripMargin),

    "prog_gspsn" -> (ErOracles.prelude(clean = false) +
      """pos AS (SELECT ROW_NUMBER() OVER (ORDER BY key, profile_id) - 1 AS pos, profile_id
        |        FROM toks),
        |npos AS (SELECT profile_id, CAST(COUNT(*) AS BIGINT) AS np FROM pos GROUP BY 1),
        |gc AS (
        |  SELECT b.profile_id AS p1, a.profile_id AS p2, CAST(COUNT(*) AS BIGINT) AS cbs
        |  FROM pos a JOIN pos b ON b.pos BETWEEN a.pos - 2 AND a.pos + 2
        |    AND b.pos <> a.pos AND b.profile_id < a.profile_id
        |  GROUP BY 1, 2),
        |gw AS (
        |  SELECT p1, p2,
        |         round(CAST(cbs AS DOUBLE) / (n1.np + n2.np - cbs), 9) AS w
        |  FROM gc JOIN npos n1 ON gc.p1 = n1.profile_id JOIN npos n2 ON gc.p2 = n2.profile_id),
        |gr AS (SELECT p1, p2, w, ROW_NUMBER() OVER (ORDER BY w DESC, p1, p2) AS rank FROM gw)
        |SELECT rank, p1, p2, w FROM gr WHERE rank <= 500""".stripMargin),

    "prog_gspsn_clean" -> (ErOracles.prelude(clean = true) +
      """pos AS (SELECT ROW_NUMBER() OVER (ORDER BY key, profile_id) - 1 AS pos, profile_id, source_id
        |        FROM toks),
        |npos AS (SELECT profile_id, CAST(COUNT(*) AS BIGINT) AS np FROM pos GROUP BY 1),
        |gc AS (
        |  SELECT b.profile_id AS p1, a.profile_id AS p2, CAST(COUNT(*) AS BIGINT) AS cbs
        |  FROM pos a JOIN pos b ON b.pos BETWEEN a.pos - 2 AND a.pos + 2
        |    AND b.pos <> a.pos AND b.profile_id < a.profile_id
        |    AND b.source_id <> a.source_id
        |  GROUP BY 1, 2),
        |gw AS (
        |  SELECT p1, p2,
        |         round(CAST(cbs AS DOUBLE) / (n1.np + n2.np - cbs), 9) AS w
        |  FROM gc JOIN npos n1 ON gc.p1 = n1.profile_id JOIN npos n2 ON gc.p2 = n2.profile_id),
        |gr AS (SELECT p1, p2, w, ROW_NUMBER() OVER (ORDER BY w DESC, p1, p2) AS rank FROM gw)
        |SELECT rank, p1, p2, w FROM gr WHERE rank <= 500""".stripMargin),

    "attr_clusters" -> (clusterPrelude() +
      """x AS (SELECT 1)
        |SELECT qattr, cluster_id, round(entropy, 9) AS entropy FROM clusters""".stripMargin),

    "attr_clusters_norm" -> (clusterPrelude(normalize = true) +
      """x AS (SELECT 1)
        |SELECT qattr, cluster_id, round(entropy, 9) AS entropy FROM clusters""".stripMargin),

    // fixture drops source-1 'type' so 0_type has no cross-source LSH
    // partner -> lands in the default cluster -> its keys are excluded
    "blast_keys_nodefault" -> (
      clusterPrelude(attrFilter = "NOT (source_id = 1 AND attribute = 'type')") +
      """ckeysx AS (
        |  SELECT DISTINCT o.profile_id,
        |         o.token || '_' || CAST(c.cluster_id AS VARCHAR) AS key
        |  FROM occ o JOIN clusters c ON o.qattr = c.qattr, nclu
        |  WHERE c.cluster_id <> nclu.c)
        |SELECT profile_id, key FROM ckeysx""".stripMargin),

    "blast_wnp" -> (clusterPrelude() + blastPipeline)
  ).map { case (k, v) => k -> ErOracles.materializeCtes(v) }

  private def supCnp(ct: String): String = {
    val cond = if (ct == "OR") "t1.p1 IS NOT NULL OR t2.p1 IS NOT NULL"
               else "t1.p1 IS NOT NULL AND t2.p1 IS NOT NULL"
    supPrelude() +
    s"""kk AS (SELECT CAST(FLOOR(2.0 * GREATEST(1.0, CAST(SUM(size) AS DOUBLE) / (SELECT COUNT(*) FROM part))) AS BIGINT) AS k FROM bs2),
       |t1r AS (SELECT p1, p2 FROM (
       |  SELECT p1, p2, ROW_NUMBER() OVER (PARTITION BY p1 ORDER BY p_match DESC, p2) AS rn
       |  FROM overt), kk WHERE rn <= k),
       |t2r AS (SELECT p1, p2 FROM (
       |  SELECT p1, p2, ROW_NUMBER() OVER (PARTITION BY p2 ORDER BY p_match DESC, p1) AS rn
       |  FROM overt), kk WHERE rn <= k)
       |SELECT o.p1, o.p2, o.p_match, o.is_match
       |FROM overt o
       |LEFT JOIN t1r t1 ON o.p1 = t1.p1 AND o.p2 = t1.p2
       |LEFT JOIN t2r t2 ON o.p1 = t2.p1 AND o.p2 = t2.p2
       |WHERE $cond""".stripMargin
  }

  /** BLAST pipeline over cluster-qualified keys: token_clusterId blocking
   * keys with entropy -> valid clean blocks -> purging -> filtering ->
   * re-validated blocks -> chi2+entropy weights -> WNP(MAX_FRACT_2,
   * chi-square rule). Mirrors Pipeline.cleanBlocks + MetaBlocking stage by
   * stage over the new key space. */
  private def blastPipeline: String =
    s"""ckeys AS (
       |  SELECT DISTINCT o.profile_id, o.source_id,
       |         o.token || '_' || CAST(c.cluster_id AS VARCHAR) AS key, c.entropy
       |  FROM occ o JOIN clusters c ON o.qattr = c.qattr),
       |bsrc0 AS (SELECT key, source_id, CAST(COUNT(*) AS BIGINT) AS s FROM ckeys GROUP BY key, source_id),
       |cbs0 AS (
       |  SELECT key, CAST(SUM(s) AS BIGINT) AS size,
       |         CAST(CAST(SUM(s) * SUM(s) - SUM(s * s) AS BIGINT) / 2 AS BIGINT) AS comparisons
       |  FROM bsrc0 GROUP BY key
       |  HAVING SUM(s) > 1 AND MIN(source_id) <> MAX(source_id)),
       |clv AS (
       |  SELECT CAST(comparisons AS DOUBLE) AS lvl,
       |         CAST(SUM(comparisons) AS DOUBLE) AS cc_l, CAST(SUM(size) AS DOUBLE) AS bc_l
       |  FROM cbs0 GROUP BY 1),
       |ccum0 AS (
       |  SELECT lvl,
       |         SUM(cc_l) OVER (ORDER BY lvl ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
       |         SUM(bc_l) OVER (ORDER BY lvl ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bc,
       |         ROW_NUMBER() OVER (ORDER BY lvl) AS rn
       |  FROM clv),
       |ccum AS (
       |  SELECT *, LEAD(lvl) OVER (ORDER BY lvl) AS lvl_next,
       |         LEAD(cc) OVER (ORDER BY lvl) AS cc_next, LEAD(bc) OVER (ORDER BY lvl) AS bc_next
       |  FROM ccum0),
       |cthr AS (
       |  SELECT COALESCE(MAX(CASE WHEN bc * cc_next < 1.005 * cc * bc_next THEN lvl_next END),
       |                  MAX(CASE WHEN rn = 2 THEN lvl END), 0.0) AS maxc
       |  FROM ccum),
       |cbs1 AS (SELECT cbs0.* FROM cbs0, cthr WHERE CAST(comparisons AS DOUBLE) <= maxc),
       |cpb AS (SELECT t.profile_id, t.source_id, t.key, b.comparisons
       |        FROM ckeys t JOIN cbs1 b USING (key)),
       |cpbr AS (
       |  SELECT profile_id, source_id, key, comparisons,
       |         ROW_NUMBER() OVER (PARTITION BY profile_id ORDER BY comparisons, key) AS rn,
       |         COUNT(*) OVER (PARTITION BY profile_id) AS n
       |  FROM cpb),
       |ccutf AS (
       |  SELECT profile_id,
       |         MAX(CASE WHEN rn = LEAST(GREATEST(CAST(ROUND(n * 0.8) AS BIGINT), 1), n)
       |             THEN comparisons END) AS cutoff
       |  FROM cpbr GROUP BY profile_id),
       |cpbf AS (
       |  SELECT p.profile_id, p.source_id, p.key, p.comparisons
       |  FROM cpb p JOIN ccutf c USING (profile_id) WHERE p.comparisons <= c.cutoff),
       |bsrc2 AS (SELECT key, source_id, CAST(COUNT(*) AS BIGINT) AS s FROM cpbf GROUP BY key, source_id),
       |cbs2 AS (
       |  SELECT key, CAST(SUM(s) AS BIGINT) AS size,
       |         CAST(CAST(SUM(s) * SUM(s) - SUM(s * s) AS BIGINT) / 2 AS BIGINT) AS comparisons
       |  FROM bsrc2 GROUP BY key
       |  HAVING SUM(s) > 1 AND MIN(source_id) <> MAX(source_id)),
       |cm2 AS (SELECT profile_id, source_id, key FROM cpbf WHERE key IN (SELECT key FROM cbs2)),
       |kent AS (SELECT key, MAX(entropy) AS entropy
       |         FROM (SELECT DISTINCT key, entropy FROM ckeys) GROUP BY key),
       |cpairs AS (
       |  SELECT a.profile_id AS p1, b.profile_id AS p2, CAST(COUNT(*) AS BIGINT) AS cbs,
       |         ${sfold("COALESCE(k.entropy, 0.0)")} AS entropy_sum
       |  FROM cm2 a JOIN cm2 b ON a.key = b.key AND a.profile_id < b.profile_id AND a.source_id <> b.source_id
       |  LEFT JOIN kent k ON a.key = k.key
       |  GROUP BY 1, 2),
       |cbp AS (SELECT profile_id, CAST(COUNT(*) AS BIGINT) AS bp FROM cpbf GROUP BY profile_id),
       |cnbt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nblocks FROM cbs2),
       |cwp AS (
       |  SELECT cpairs.p1, cpairs.p2, cbs, entropy_sum,
       |         b1.bp AS bp1, b2.bp AS bp2, cnbt.nblocks AS nblocks
       |  FROM cpairs
       |  JOIN cbp b1 ON cpairs.p1 = b1.profile_id JOIN cbp b2 ON cpairs.p2 = b2.profile_id
       |  CROSS JOIN cnbt),
       |cww AS (
       |  SELECT p1, p2, ${chiSq("bp1", "bp2")} * entropy_sum AS w1,
       |                 ${chiSq("bp2", "bp1")} * entropy_sum AS w2
       |  FROM cwp),
       |cdirected AS (SELECT p1 AS a, p2 AS b, w1 AS w FROM cww
       |              UNION ALL SELECT p2, p1, w2 FROM cww),
       |cth AS (SELECT a, MAX(w) / 2.0 AS theta FROM cdirected GROUP BY a)
       |SELECT cww.p1, cww.p2, round(w1, 6) AS w
       |FROM cww JOIN cth t1 ON cww.p1 = t1.a JOIN cth t2 ON cww.p2 = t2.a
       |WHERE w1 >= SQRT(POWER(t1.theta, 2.0) + POWER(t2.theta, 2.0)) / 2.0 - $eps""".stripMargin

  /** chi-square expression over cwp columns from perspective a (bpA = this
   * profile's block count, bpB = neighbor's) — operand order identical to
   * MetaBlocking.chiSquare. */
  private def chiSq(bpACol: String, bpBCol: String): String = {
    val cbs = "CAST(cbs AS DOUBLE)"
    val bpA = s"CAST($bpACol AS DOUBLE)"
    val bpB = s"CAST($bpBCol AS DOUBLE)"
    val nb = "CAST(nblocks AS DOUBLE)"
    val (c00, c01, c10, c11) =
      (cbs, s"($bpB - $cbs)", s"($bpA - $cbs)", s"($nb - (($bpB + $bpA) - $cbs))")
    val (r0, r1, k0, k1) = (bpB, s"($nb - $bpB)", bpA, s"($nb - $bpA)")
    def term(obs: String, rs: String, ks: String) =
      s"(POWER($obs - ($rs * $ks) / $nb, 2.0) / (($rs * $ks) / $nb))"
    s"(${term(c00, r0, k0)} + ${term(c01, r0, k1)} + ${term(c10, r1, k0)} + ${term(c11, r1, k1)})"
  }
}
