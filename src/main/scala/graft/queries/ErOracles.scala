package graft.queries

/**
 * DuckDB oracle SQL equivalent to every query in [[ErQueries]], built from a
 * shared CTE prelude that mirrors the pipeline stage by stage (tokenize ->
 * valid blocks -> purging-threshold scan -> per-profile filtering ->
 * re-validated blocks -> CBS pair graph -> per-profile stats -> weights).
 *
 * Floating-point discipline (so hashes match bit-for-bit):
 *  - every formula is written with the same operand order / associativity as
 *    the Spark column expressions;
 *  - order-dependent reductions (the ARCS products) run sequentially over a
 *    sorted list on both sides;
 *  - weights involving log10 are rounded to 9 decimals on both sides;
 *  - order-dependent threshold sums (AVG/WEP over fractional weights) are
 *    compared with a 1e-9 slack on both sides.
 */
object ErOracles {

  /** DuckDB inlines a CTE at every reference site by default; the shared
   * prelude is referenced many times, which turns an O(rows) plan into an
   * exponential blow-up (er_arcs at sf0.001: 14.7s -> 0.55s with
   * materialization). Every `NAME AS (` here is a CTE definition — column
   * aliases in this file never take the form ` AS (`. */
  private[queries] def materializeCtes(sql: String): String =
    sql.replace(" AS (", " AS MATERIALIZED (")

  private val smooth = "1.005"
  private val r = "0.8"

  /** Sorted sequential double fold — matches Spark's exact-mode
   * aggregate(array_sort(collect_list(...))). */
  private def esfold(e: String): String =
    s"list_reduce(list_prepend(0.0, list_sort(list($e))), (acc, x) -> acc + x)"

  /** SQL literal list of the same default english stopwords the Spark side
   * uses (Blocking.EnglishStopWords) — one source of truth, escaped. */
  private lazy val stopwordList: String =
    graft.er.Blocking.EnglishStopWords
      .map(w => "'" + w.replace("'", "''") + "'").mkString(", ")

  /** attrs + toks + blocks + purging + filtering + valid blocks + pairs +
   * per-profile stats + the fat `wp` join all weight schemes read from. */
  private[queries] def prelude(clean: Boolean, numSources: Int = 2): String = {
    val src = if (clean) s"p_partkey % $numSources" else "0"
    val bs0 =
      if (!clean)
        """bs0 AS (
          |  SELECT key, CAST(COUNT(*) AS BIGINT) AS size,
          |         CAST(COUNT(*) * (COUNT(*) - 1) AS BIGINT) AS comparisons
          |  FROM toks GROUP BY key HAVING COUNT(*) > 1),""".stripMargin
      else
        """bsrc AS (SELECT key, source_id, CAST(COUNT(*) AS BIGINT) AS s FROM toks GROUP BY key, source_id),
          |bs0 AS (
          |  SELECT key, CAST(SUM(s) AS BIGINT) AS size,
          |         CAST(CAST(SUM(s) * SUM(s) - SUM(s * s) AS BIGINT) / 2 AS BIGINT) AS comparisons
          |  FROM bsrc GROUP BY key
          |  HAVING SUM(s) > 1 AND MIN(source_id) <> MAX(source_id)),""".stripMargin
    val bs2 =
      if (!clean)
        """bs2 AS (
          |  SELECT key, CAST(COUNT(*) AS BIGINT) AS size,
          |         CAST(COUNT(*) * (COUNT(*) - 1) AS BIGINT) AS comparisons,
          |         CAST(COUNT(*) * (COUNT(*) - 1) AS DOUBLE) AS arcs_comparisons
          |  FROM pbf GROUP BY key HAVING COUNT(*) > 1),""".stripMargin
      else
        s"""bsrc2 AS (SELECT key, source_id, CAST(COUNT(*) AS BIGINT) AS s FROM pbf GROUP BY key, source_id),
          |bs2 AS (
          |  SELECT key, CAST(SUM(s) AS BIGINT) AS size,
          |         CAST(CAST(SUM(s) * SUM(s) - SUM(s * s) AS BIGINT) / 2 AS BIGINT) AS comparisons,
          |         CASE WHEN COUNT(*) < $numSources THEN 0.0
          |              ELSE list_reduce(list_sort(list(CAST(s AS DOUBLE))), (a, x) -> a * x) END AS arcs_comparisons
          |  FROM bsrc2 GROUP BY key
          |  HAVING SUM(s) > 1 AND MIN(source_id) <> MAX(source_id)),""".stripMargin
    val pairCond =
      if (clean) "a.key = b.key AND a.profile_id < b.profile_id AND a.source_id <> b.source_id"
      else "a.key = b.key AND a.profile_id < b.profile_id"
    s"""WITH attrs AS (
       |  SELECT p_partkey AS profile_id, $src AS source_id, 'name' AS attribute, p_name AS value FROM part
       |  UNION ALL SELECT p_partkey, $src, 'brand', p_brand FROM part
       |  UNION ALL SELECT p_partkey, $src, 'type', p_type FROM part
       |  UNION ALL SELECT p_partkey, $src, 'size', CAST(p_size AS VARCHAR) FROM part
       |  UNION ALL SELECT p_partkey, $src, 'price', CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR) FROM part
       |),
       |toks AS (
       |  SELECT DISTINCT profile_id, source_id, tok AS key FROM (
       |    SELECT profile_id, source_id,
       |           unnest(regexp_split_to_array(lower(value), '[^\\p{L}\\p{N}_]+')) AS tok
       |    FROM attrs WHERE value IS NOT NULL) u
       |  WHERE tok <> ''
       |),
       |$bs0
       |lv AS (
       |  SELECT CAST(comparisons AS DOUBLE) AS lvl,
       |         CAST(SUM(comparisons) AS DOUBLE) AS cc_l,
       |         CAST(SUM(size) AS DOUBLE) AS bc_l
       |  FROM bs0 GROUP BY 1),
       |cum0 AS (
       |  SELECT lvl,
       |         SUM(cc_l) OVER (ORDER BY lvl ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
       |         SUM(bc_l) OVER (ORDER BY lvl ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bc,
       |         ROW_NUMBER() OVER (ORDER BY lvl) AS rn
       |  FROM lv),
       |cum AS (
       |  SELECT *, LEAD(lvl) OVER (ORDER BY lvl) AS lvl_next,
       |         LEAD(cc) OVER (ORDER BY lvl) AS cc_next,
       |         LEAD(bc) OVER (ORDER BY lvl) AS bc_next
       |  FROM cum0),
       |thr AS (
       |  SELECT COALESCE(MAX(CASE WHEN bc * cc_next < $smooth * cc * bc_next THEN lvl_next END),
       |                  MAX(CASE WHEN rn = 2 THEN lvl END), 0.0) AS maxc
       |  FROM cum),
       |bs1 AS (SELECT bs0.* FROM bs0, thr WHERE CAST(comparisons AS DOUBLE) <= maxc),
       |pb AS (SELECT t.profile_id, t.source_id, t.key, b.comparisons
       |       FROM toks t JOIN bs1 b USING (key)),
       |pbr AS (
       |  SELECT profile_id, source_id, key, comparisons,
       |         ROW_NUMBER() OVER (PARTITION BY profile_id ORDER BY comparisons, key) AS rn,
       |         COUNT(*) OVER (PARTITION BY profile_id) AS n
       |  FROM pb),
       |cutf AS (
       |  SELECT profile_id,
       |         MAX(CASE WHEN rn = LEAST(GREATEST(CAST(ROUND(n * $r) AS BIGINT), 1), n)
       |             THEN comparisons END) AS cutoff
       |  FROM pbr GROUP BY profile_id),
       |pbf AS (
       |  SELECT p.profile_id, p.source_id, p.key, p.comparisons
       |  FROM pb p JOIN cutf c USING (profile_id) WHERE p.comparisons <= c.cutoff),
       |$bs2
       |m2 AS (SELECT profile_id, source_id, key FROM pbf WHERE key IN (SELECT key FROM bs2)),
       |pairs AS (
       |  SELECT a.profile_id AS p1, b.profile_id AS p2, CAST(COUNT(*) AS BIGINT) AS cbs
       |  FROM m2 a JOIN m2 b ON $pairCond
       |  GROUP BY 1, 2),
       |bp AS (SELECT profile_id, CAST(COUNT(*) AS BIGINT) AS bp FROM pbf GROUP BY profile_id),
       |nbt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nblocks FROM bs2),
       |parcs AS (
       |  SELECT p.profile_id, CAST(COUNT(*) AS BIGINT) AS nb_valid,
       |         list_reduce(list_sort(list(s.arcs_comparisons)), (a, x) -> a * x) AS arcs_denom
       |  FROM pbf p JOIN bs2 s ON p.key = s.key GROUP BY p.profile_id),
       |deg AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS degree
       |        FROM (SELECT p1 AS p FROM pairs UNION ALL SELECT p2 FROM pairs) GROUP BY p),
       |ne AS (SELECT CAST(COUNT(*) AS DOUBLE) AS e FROM pairs),
       |wp AS (
       |  SELECT pairs.p1, pairs.p2, cbs,
       |         b1.bp AS bp1, b2.bp AS bp2,
       |         a1.arcs_denom AS ad1, a2.arcs_denom AS ad2,
       |         a1.nb_valid AS nv1, a2.nb_valid AS nv2,
       |         d1.degree AS deg1, d2.degree AS deg2,
       |         nbt.nblocks AS nblocks, ne.e AS e
       |  FROM pairs
       |  JOIN bp b1 ON pairs.p1 = b1.profile_id JOIN bp b2 ON pairs.p2 = b2.profile_id
       |  JOIN parcs a1 ON pairs.p1 = a1.profile_id JOIN parcs a2 ON pairs.p2 = a2.profile_id
       |  JOIN deg d1 ON pairs.p1 = d1.p JOIN deg d2 ON pairs.p2 = d2.p
       |  CROSS JOIN nbt CROSS JOIN ne),
       |""".stripMargin
  }

  /** Directed weight expression from perspective `a` over the `wp` columns;
   * mirrors MetaBlocking.weightColumn operand-for-operand. */
  private def wExpr(scheme: String, a: Int): String = {
    val b = 3 - a
    val cbs = "CAST(cbs AS DOUBLE)"
    val bpA = s"CAST(bp$a AS DOUBLE)"
    val bpB = s"CAST(bp$b AS DOUBLE)"
    val nb = "CAST(nblocks AS DOUBLE)"
    val js = s"$cbs / ($bpA + $bpB - $cbs)"
    scheme match {
      case "cbs" => cbs
      case "js" => js
      case "ecbs" => s"$cbs * log10($nb / $bpA) * log10($nb / $bpB)"
      case "arcs" => s"$cbs / ad$a"
      case "chisq" =>
        // python/sparker/common_node_pruning.py:6-35; bpP = this profile (a),
        // bpN = neighbor (b); term order identical to the Scala side.
        val (c00, c01, c10, c11) =
          (cbs, s"($bpB - $cbs)", s"($bpA - $cbs)", s"($nb - (($bpB + $bpA) - $cbs))")
        val (r0, r1, k0, k1) = (bpB, s"($nb - $bpB)", bpA, s"($nb - $bpA)")
        def term(obs: String, rs: String, ks: String) =
          s"(POWER($obs - ($rs * $ks) / $nb, 2.0) / (($rs * $ks) / $nb))"
        s"(${term(c00, r0, k0)} + ${term(c01, r0, k1)} + ${term(c10, r1, k0)} + ${term(c11, r1, k1)})"
      case "ejs" =>
        val degA = s"CAST(deg$a AS DOUBLE)"
        val degB = s"CAST(deg$b AS DOUBLE)"
        val inner = s"log10(e / ($degA + 0.00000000001))"
        s"(CASE WHEN e <= 0.0 OR $inner <= 0.0 THEN 0.0 ELSE ($js) * log10(e / ($degB * $inner)) END)"
    }
  }

  /** CTE producing (p1, p2, cbs, w1, w2) for a scheme. */
  private[queries] def wpw(scheme: String): String =
    s"wpw AS (SELECT p1, p2, cbs, ${wExpr(scheme, 1)} AS w1, ${wExpr(scheme, 2)} AS w2 FROM wp),\n"

  /** Self-edge weight expression — wExpr with both endpoints the same
   * profile: cbs = nb_valid, both block counts = bp, both degrees = the
   * profile's degree (MetaBlocking.selfWeights; the dirty-ER
   * first_step=True quirk of common_node_pruning.py:139). */
  private def selfWExpr(scheme: String): String = {
    val v = "CAST(nb_valid AS DOUBLE)"
    val b = "CAST(bp AS DOUBLE)"
    val nb = "CAST(nblocks AS DOUBLE)"
    val js = s"$v / ($b + $b - $v)"
    scheme match {
      case "cbs" => v
      case "js" => js
      case "ecbs" => s"$v * log10($nb / $b) * log10($nb / $b)"
      case "arcs" => s"$v / arcs_denom"
      case "chisq" =>
        val (c00, c01, c10, c11) =
          (v, s"($b - $v)", s"($b - $v)", s"($nb - (($b + $b) - $v))")
        val (r0, r1, k0, k1) = (b, s"($nb - $b)", b, s"($nb - $b)")
        def term(obs: String, rs: String, ks: String) =
          s"(POWER($obs - ($rs * $ks) / $nb, 2.0) / (($rs * $ks) / $nb))"
        s"(${term(c00, r0, k0)} + ${term(c01, r0, k1)} + ${term(c10, r1, k0)} + ${term(c11, r1, k1)})"
      case "ejs" =>
        val deg = "CAST(degree AS DOUBLE)"
        val inner = s"log10(e / ($deg + 0.00000000001))"
        s"(CASE WHEN e <= 0.0 OR $inner <= 0.0 THEN 0.0 ELSE ($js) * log10(e / ($deg * $inner)) END)"
    }
  }

  /** Self-edge CTE over the dirty prelude's per-profile stats. */
  private def selfwCte(scheme: String): String =
    s"""selfw AS (
       |  SELECT bp.profile_id, ${selfWExpr(scheme)} AS w
       |  FROM bp JOIN parcs ON bp.profile_id = parcs.profile_id
       |  JOIN deg ON bp.profile_id = deg.p
       |  CROSS JOIN nbt CROSS JOIN ne
       |  WHERE parcs.nb_valid > 0),
       |""".stripMargin

  private[queries] val directed =
    """directed AS (SELECT p1 AS a, p2 AS b, w1 AS w FROM wpw
      |             UNION ALL SELECT p2, p1, w2 FROM wpw),
      |""".stripMargin

  /** Directed view including the self edges — what the reference's
   * first_step=True passes (WNP thresholds, WEP sum, CNP retention)
   * enumerate in dirty ER. */
  private def directedSelf(scheme: String): String =
    selfwCte(scheme) +
    """directed AS (SELECT p1 AS a, p2 AS b, w1 AS w FROM wpw
      |             UNION ALL SELECT p2, p1, w2 FROM wpw
      |             UNION ALL SELECT profile_id, profile_id, w FROM selfw),
      |""".stripMargin

  /** directed view for a pipeline flavor: dirty gets the self edges. */
  private def directedFor(clean: Boolean, scheme: String): String =
    if (clean) directed else directedSelf(scheme)

  /** The WNP per-profile threshold CTE `th(a, theta)` over `directed`. */
  private def wnpThetaCte(tt: String): String = {
    val agg = tt match {
      case "avg" => "SUM(w) / COUNT(*)"
      case "max2" => "MAX(w) / 2.0"
    }
    s"th AS (SELECT a, $agg AS theta FROM directed GROUP BY a)"
  }

  /** The WNP keep condition over `wpw JOIN th t1 ... JOIN th t2` — the ONE
   * source of truth for the retained-pair rule; wnpSql and every oracle
   * that re-derives a WNP candidate set (er_match_edit) must build their
   * WHERE from this. */
  private def wnpKeepCond(scheme: String, tt: String, ct: String,
                          eps: String, chi2divider: String = "2.0"): String =
    if (scheme == "chisq" && tt == "chisqrule")
      s"w1 >= SQRT(POWER(t1.theta, 2.0) + POWER(t2.theta, 2.0)) / $chi2divider - $eps"
    else ct match {
      case "or" => s"(w1 >= t2.theta - $eps OR w1 >= t1.theta - $eps)"
      case "and" => s"(w1 >= t2.theta - $eps AND w1 >= t1.theta - $eps)"
      case "chisqrule" =>
        s"w1 >= SQRT(POWER(t1.theta, 2.0) + POWER(t2.theta, 2.0)) / $chi2divider - $eps"
    }

  /** Shared matched-edge prefix `me(p1, p2)`: the er_match_edit matched
   * set (WNP(cbs, avg, or) candidates at normalized Levenshtein >= 0.5)
   * built from the same theta/keep fragments as wnpSql — the ONE matched
   * graph the entity/golden/pagerank/triangle twins all close over. */
  private def matchedEdgesCtes: String =
    prelude(clean = false) + wpw("cbs") + directedSelf("cbs") +
      s"""${wnpThetaCte("avg")},
        |cand AS (SELECT wpw.p1, wpw.p2
        |         FROM wpw JOIN th t1 ON wpw.p1 = t1.a JOIN th t2 ON wpw.p2 = t2.a
        |         WHERE ${wnpKeepCond("cbs", "avg", "or", "0.0")}),
        |nm AS (SELECT p_partkey, lower(p_name) AS nm FROM part),
        |me AS (
        |  SELECT c.p1, c.p2
        |  FROM cand c JOIN nm n1 ON c.p1 = n1.p_partkey
        |              JOIN nm n2 ON c.p2 = n2.p_partkey
        |  WHERE 1.0 - CAST(levenshtein(n1.nm, n2.nm) AS DOUBLE) /
        |              GREATEST(length(n1.nm), length(n2.nm)) >= 0.5),
        |""".stripMargin

  private def wnpSql(clean: Boolean, scheme: String, tt: String, ct: String,
                     eps: String, roundW: Boolean, chi2divider: String = "2.0",
                     numSources: Int = 2): String = {
    val out = if (roundW) "ROUND(w1, 9)" else "w1"
    prelude(clean, numSources) + wpw(scheme) + directedFor(clean, scheme) +
      s"""${wnpThetaCte(tt)}
         |SELECT wpw.p1, wpw.p2, $out AS w
         |FROM wpw JOIN th t1 ON wpw.p1 = t1.a JOIN th t2 ON wpw.p2 = t2.a
         |WHERE ${wnpKeepCond(scheme, tt, ct, eps, chi2divider)}""".stripMargin
  }

  private def wepSql(clean: Boolean, scheme: String, eps: String): String =
    prelude(clean) + wpw(scheme) + directedFor(clean, scheme) +
      s"""gthr AS (SELECT SUM(w) / COUNT(*) AS t FROM directed)
         |SELECT p1, p2, w1 AS w FROM wpw, gthr WHERE w1 >= t - $eps""".stripMargin

  private def cepSql(clean: Boolean, scheme: String = "cbs"): String =
    prelude(clean) + wpw(scheme) +
      """kk AS (SELECT CAST(FLOOR(SUM(size) / 2.0) AS DOUBLE) AS k FROM bs2),
        |hist AS (SELECT w1 AS wl, CAST(COUNT(*) AS DOUBLE) AS freq FROM wpw GROUP BY w1),
        |cum1 AS (SELECT wl, freq,
        |         SUM(freq) OVER (ORDER BY wl DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |         FROM hist),
        |thr0 AS (SELECT COALESCE(MAX(CASE WHEN cum >= k THEN wl END), MIN(wl)) AS thr, MAX(k) AS k
        |         FROM cum1, kk),
        |rem AS (SELECT thr, freq - (cum - k) AS remaining FROM cum1, thr0 WHERE wl = thr),
        |above AS (SELECT p1, p2, w1 AS w FROM wpw, thr0 WHERE w1 > thr),
        |ties AS (SELECT p1, p2, w1, remaining FROM wpw, rem WHERE w1 = thr),
        |pp AS (SELECT p1, CAST(COUNT(*) AS BIGINT) AS cnt FROM ties GROUP BY p1),
        |pp2 AS (SELECT p1, cnt,
        |        COALESCE(SUM(cnt) OVER (ORDER BY p1 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
        |        FROM pp),
        |tord AS (SELECT p1, p2, w1, remaining,
        |         ROW_NUMBER() OVER (PARTITION BY p1 ORDER BY p2) AS rn FROM ties),
        |tk AS (SELECT t.p1, t.p2, t.w1 AS w FROM tord t JOIN pp2 ON t.p1 = pp2.p1
        |       WHERE rn <= GREATEST(LEAST(remaining - prev, CAST(cnt AS DOUBLE)), 0.0))
        |SELECT * FROM above UNION ALL SELECT * FROM tk""".stripMargin

  /** CNP with the fixture-pinned k=3 (see ErQueries comment). */
  private def cnpSql(clean: Boolean, scheme: String, ct: String): String = {
    val cond = if (ct == "OR") "r1.a IS NOT NULL OR r2.a IS NOT NULL"
               else "r1.a IS NOT NULL AND r2.a IS NOT NULL"
    prelude(clean) + wpw(scheme) + directedFor(clean, scheme) +
      s"""kc AS (SELECT CAST(3 AS BIGINT) AS k),
         |ret AS (SELECT a, b FROM (SELECT a, b,
         |        ROW_NUMBER() OVER (PARTITION BY a ORDER BY w DESC, b) AS rn FROM directed), kc
         |        WHERE rn <= k)
         |SELECT wpw.p1, wpw.p2, wpw.w1 AS w FROM wpw
         |LEFT JOIN ret r1 ON wpw.p1 = r1.a AND wpw.p2 = r1.b
         |LEFT JOIN ret r2 ON wpw.p2 = r2.a AND wpw.p1 = r2.b
         |WHERE $cond""".stripMargin
  }

  def all: Map[String, String] = raw.map { case (k, v) => k -> materializeCtes(v) }

  private def raw: Map[String, String] = Map(
    "er_profiles" -> (prelude(clean = false) +
      "x AS (SELECT 1) SELECT profile_id, attribute, value FROM attrs"),

    "er_tokens" -> (prelude(clean = false) +
      "x AS (SELECT 1) SELECT profile_id, key FROM toks"),

    // streaming twin drains to the same pairs as the batch query
    "er_tokens_stream" -> (prelude(clean = false) +
      "x AS (SELECT 1) SELECT profile_id, key FROM toks"),

    // streaming incremental-ER gate twin: new (id % 10 = 0) keys probe
    // the CORPUS-side-capped standing key index; new-vs-corpus only
    // (the gate contract - new-new belongs to batch compaction)
    "er_incremental_stream" -> (prelude(clean = false) +
      """nk AS (SELECT profile_id, key FROM toks WHERE profile_id % 10 = 0),
        |ok0 AS (SELECT profile_id, key FROM toks WHERE profile_id % 10 <> 0),
        |ksz AS (SELECT key FROM ok0 GROUP BY key HAVING COUNT(*) <= 1000),
        |ok AS (SELECT o.profile_id, o.key FROM ok0 o JOIN ksz USING (key))
        |SELECT DISTINCT LEAST(n.profile_id, o.profile_id) AS p1,
        |       GREATEST(n.profile_id, o.profile_id) AS p2,
        |       CAST(1 AS INTEGER) AS n_new
        |FROM nk n JOIN ok o ON n.key = o.key""".stripMargin),

    // incremental twin: same toks universe tagged new (id % 10 = 0) /
    // old, per-key size cap, pairs with >= 1 new side
    "er_incremental" -> (prelude(clean = false) +
      """ak AS (SELECT profile_id, key,
        |         CASE WHEN profile_id % 10 = 0 THEN 1 ELSE 0 END AS is_new
        |       FROM toks),
        |ksz AS (SELECT key FROM ak GROUP BY key HAVING COUNT(*) <= 1000),
        |kk AS (SELECT ak.profile_id, ak.key, ak.is_new FROM ak JOIN ksz USING (key))
        |SELECT DISTINCT LEAST(a.profile_id, b.profile_id) AS p1,
        |       GREATEST(a.profile_id, b.profile_id) AS p2,
        |       CAST(a.is_new + b.is_new AS INTEGER) AS n_new
        |FROM kk a JOIN kk b
        |  ON a.key = b.key AND a.profile_id <> b.profile_id AND a.is_new = 1""".stripMargin),

    // incremental WNP twin: directed new->any edges weighted by distinct
    // shared capped keys, per-src mean threshold as exact integer test
    // (cbs * n_e >= sum), OR across new endpoints via DISTINCT
    "er_incremental_wnp" -> (prelude(clean = false) +
      """ak AS (SELECT profile_id, key,
        |         CASE WHEN profile_id % 10 = 0 THEN 1 ELSE 0 END AS is_new
        |       FROM toks),
        |ksz AS (SELECT key FROM ak GROUP BY key HAVING COUNT(*) <= 1000),
        |kk AS (SELECT ak.profile_id, ak.key, ak.is_new FROM ak JOIN ksz USING (key)),
        |de AS (SELECT a.profile_id AS src, b.profile_id AS dst, b.is_new AS nb,
        |              CAST(COUNT(DISTINCT a.key) AS BIGINT) AS cbs
        |       FROM kk a JOIN kk b
        |         ON a.key = b.key AND a.profile_id <> b.profile_id AND a.is_new = 1
        |       GROUP BY 1, 2, 3),
        |ithr AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS n_e,
        |               CAST(SUM(cbs) AS BIGINT) AS s
        |        FROM de GROUP BY src)
        |SELECT DISTINCT LEAST(de.src, de.dst) AS p1,
        |       GREATEST(de.src, de.dst) AS p2,
        |       de.cbs, CAST(1 + de.nb AS INTEGER) AS n_new
        |FROM de JOIN ithr USING (src)
        |WHERE de.cbs * ithr.n_e >= ithr.s""".stripMargin),

    // incremental JS twin: same capped universe + directed edges, JS =
    // cbs / (|keys(src)| + |keys(dst)| - cbs) over per-profile capped key
    // counts, per-src mean threshold with the fractional 1e-9 guard
    "er_incremental_js" -> (prelude(clean = false) +
      """ak AS (SELECT profile_id, key,
        |         CASE WHEN profile_id % 10 = 0 THEN 1 ELSE 0 END AS is_new
        |       FROM toks),
        |ksz AS (SELECT key FROM ak GROUP BY key HAVING COUNT(*) <= 1000),
        |kk AS (SELECT ak.profile_id, ak.key, ak.is_new FROM ak JOIN ksz USING (key)),
        |kc AS (SELECT profile_id, CAST(COUNT(DISTINCT key) AS BIGINT) AS nk
        |       FROM kk GROUP BY 1),
        |de AS (SELECT a.profile_id AS src, b.profile_id AS dst, b.is_new AS nb,
        |              CAST(COUNT(DISTINCT a.key) AS BIGINT) AS cbs
        |       FROM kk a JOIN kk b
        |         ON a.key = b.key AND a.profile_id <> b.profile_id AND a.is_new = 1
        |       GROUP BY 1, 2, 3),
        |dw AS (SELECT de.src, de.dst, de.nb, de.cbs,
        |              CAST(de.cbs AS DOUBLE) / (k1.nk + k2.nk - de.cbs) AS w
        |       FROM de JOIN kc k1 ON de.src = k1.profile_id
        |               JOIN kc k2 ON de.dst = k2.profile_id),
        |ithr AS (SELECT src, SUM(w) / COUNT(*) AS theta FROM dw GROUP BY src)
        |SELECT DISTINCT LEAST(dw.src, dw.dst) AS p1,
        |       GREATEST(dw.src, dw.dst) AS p2,
        |       dw.cbs, ROUND(dw.w, 9) AS w, CAST(1 + dw.nb AS INTEGER) AS n_new
        |FROM dw JOIN ithr USING (src)
        |WHERE dw.w >= ithr.theta - 1e-9""".stripMargin),

    // incremental end-to-end twin: the er_incremental_wnp retained set
    // joined to part names, normalized-Levenshtein >= 0.5 (er_match_edit
    // rule) on the surviving pairs
    "er_incremental_match" -> (prelude(clean = false) +
      """ak AS (SELECT profile_id, key,
        |         CASE WHEN profile_id % 10 = 0 THEN 1 ELSE 0 END AS is_new
        |       FROM toks),
        |ksz AS (SELECT key FROM ak GROUP BY key HAVING COUNT(*) <= 1000),
        |kk AS (SELECT ak.profile_id, ak.key, ak.is_new FROM ak JOIN ksz USING (key)),
        |de AS (SELECT a.profile_id AS src, b.profile_id AS dst, b.is_new AS nb,
        |              CAST(COUNT(DISTINCT a.key) AS BIGINT) AS cbs
        |       FROM kk a JOIN kk b
        |         ON a.key = b.key AND a.profile_id <> b.profile_id AND a.is_new = 1
        |       GROUP BY 1, 2, 3),
        |ithr AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS n_e,
        |               CAST(SUM(cbs) AS BIGINT) AS s
        |        FROM de GROUP BY src),
        |cand AS (SELECT DISTINCT LEAST(de.src, de.dst) AS p1,
        |                GREATEST(de.src, de.dst) AS p2,
        |                CAST(1 + de.nb AS INTEGER) AS n_new
        |         FROM de JOIN ithr USING (src)
        |         WHERE de.cbs * ithr.n_e >= ithr.s),
        |nm AS (SELECT p_partkey, lower(p_name) AS nm FROM part),
        |scored AS (
        |  SELECT c.p1, c.p2, c.n_new,
        |         1.0 - CAST(levenshtein(n1.nm, n2.nm) AS DOUBLE) /
        |               GREATEST(length(n1.nm), length(n2.nm)) AS sim0
        |  FROM cand c JOIN nm n1 ON c.p1 = n1.p_partkey
        |              JOIN nm n2 ON c.p2 = n2.p_partkey)
        |SELECT p1, p2, n_new, ROUND(sim0, 9) AS sim FROM scored WHERE sim0 >= 0.5""".stripMargin),

    "er_tokens_attr" -> (prelude(clean = false) +
      """atoks AS (
        |  SELECT DISTINCT profile_id, attribute || '_' || tok AS key FROM (
        |    SELECT profile_id, attribute,
        |           unnest(regexp_split_to_array(lower(value), '[^\p{L}\p{N}_]+')) AS tok
        |    FROM attrs WHERE value IS NOT NULL) u
        |  WHERE tok <> '')
        |SELECT profile_id, key FROM atoks""".stripMargin),

    "er_tokens_sw" -> (prelude(clean = false) +
      s"""swtoks AS (
         |  SELECT profile_id, key FROM toks
         |  WHERE (regexp_full_match(key, '[a-z]+') OR regexp_full_match(key, '[0-9]+'))
         |    AND key NOT IN ($stopwordList))
         |SELECT profile_id, key FROM swtoks""".stripMargin),

    "er_blocks_dirty" -> (prelude(clean = false) +
      "x AS (SELECT 1) SELECT key, size, comparisons FROM bs0"),

    "er_blocks_clean" -> (prelude(clean = true) +
      "x AS (SELECT 1) SELECT key, size, comparisons FROM bs0"),

    "er_blocks_3src" -> (prelude(clean = true, numSources = 3) +
      "x AS (SELECT 1) SELECT key, size, comparisons FROM bs0"),

    "er_purged_dirty" -> (prelude(clean = false) +
      "x AS (SELECT 1) SELECT key, size, comparisons FROM bs1"),

    "er_filtered_dirty" -> (prelude(clean = false) +
      "x AS (SELECT 1) SELECT profile_id, key FROM pbf"),

    "er_cbs_dirty" -> (prelude(clean = false) +
      "x AS (SELECT 1) SELECT p1, p2, cbs FROM pairs"),

    // stratified labeling sample twin: same distinct-weight quantile
    // binning as Stats.quantileBins (rows-before * 5 / N, ties share a
    // bin) and the same shared 31-poly string hash rank
    "er_label_sample" -> (prelude(clean = false) +
      s"""vc AS (SELECT cbs AS x, CAST(COUNT(*) AS BIGINT) AS cnt FROM pairs GROUP BY 1),
         |nt AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_g FROM vc),
         |bn AS (SELECT x,
         |         LEAST(4, CAST(floor(CAST((SUM(cnt) OVER (ORDER BY x
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt) * 5 AS DOUBLE)
         |               / CAST(n_g AS DOUBLE)) AS BIGINT)) AS bin
         |       FROM vc, nt),
         |hk AS (SELECT p1, p2, cbs, bin,
         |         ${TrainOracles.strHash("CAST(p1 AS VARCHAR) || ':' || CAST(p2 AS VARCHAR)")} AS hk
         |       FROM pairs JOIN bn ON pairs.cbs = bn.x),
         |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY bin
         |                 ORDER BY hk ASC, p1 ASC, p2 ASC) AS rn FROM hk)
         |SELECT bin, rn, p1, p2, cbs FROM rk WHERE rn <= 20""".stripMargin),

    "er_cbs_clean" -> (prelude(clean = true) +
      "x AS (SELECT 1) SELECT p1, p2, cbs FROM pairs"),

    // block-size histogram twin over the re-validated collection
    "er_block_sizes" -> (prelude(clean = false) +
      """x AS (SELECT 1)
        |SELECT size, CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |       CAST(SUM(comparisons) AS BIGINT) AS comparisons
        |FROM bs2 GROUP BY size""".stripMargin),

    // parallel canopy twin: center = no tight (cbs>=3) neighbor of smaller
    // id; members = loose (cbs>=2) edges from centers, plus the center
    "er_canopy" -> (prelude(clean = false) +
      """sym AS (SELECT p1 AS p, p2 AS q, cbs FROM pairs
        |        UNION ALL SELECT p2, p1, cbs FROM pairs),
        |dom AS (SELECT DISTINCT p FROM sym WHERE cbs >= 3 AND q < p),
        |ctr AS (SELECT DISTINCT p FROM sym WHERE p NOT IN (SELECT p FROM dom))
        |SELECT p AS canopy_id, q AS member_id, cbs AS shared
        |FROM sym JOIN ctr USING (p) WHERE cbs >= 2
        |UNION ALL
        |SELECT p, p, CAST(0 AS BIGINT) FROM ctr""".stripMargin),

    "er_js_dirty" -> (prelude(clean = false) + wpw("js") +
      "x AS (SELECT 1) SELECT p1, p2, w1 AS w FROM wpw"),

    "er_ecbs_dirty" -> (prelude(clean = false) + wpw("ecbs") +
      "x AS (SELECT 1) SELECT p1, p2, ROUND(w1, 9) AS w FROM wpw"),

    "er_arcs_dirty" -> (prelude(clean = false) + wpw("arcs") +
      "x AS (SELECT 1) SELECT p1, p2, w1 AS w FROM wpw"),

    "er_chisq_dirty" -> (prelude(clean = false) + wpw("chisq") +
      "x AS (SELECT 1) SELECT p1, p2, ROUND(w1, 9) AS w FROM wpw"),

    "er_ejs_dirty" -> (prelude(clean = false) + wpw("ejs") +
      "x AS (SELECT 1) SELECT p1, p2, ROUND(w1, 9) AS w FROM wpw"),

    "er_wnp_cbs_avg_or_dirty" -> wnpSql(clean = false, "cbs", "avg", "or", "0.0", roundW = false),
    "er_wnp_cbs_avg_and_dirty" -> wnpSql(clean = false, "cbs", "avg", "and", "0.0", roundW = false),
    "er_wnp_js_max2_or_dirty" -> wnpSql(clean = false, "js", "max2", "or", "0.000000001", roundW = false),
    "er_wnp_chisq_dirty" -> wnpSql(clean = false, "chisq", "avg", "chisqrule", "0.000000001", roundW = true),
    "er_wnp_cbs_clean" -> wnpSql(clean = true, "cbs", "avg", "or", "0.0", roundW = false),
    // N-source record linkage (the reference's multi-data-source mode,
    // old_versions/multi-data-source-sparker/README.md:1-3): 3 sources by
    // partkey mod 3 — blocks need >= 2 distinct sources, neighbors are
    // cross-source only
    "er_wnp_cbs_3src" -> wnpSql(clean = true, "cbs", "avg", "or", "0.0",
      roundW = false, numSources = 3),

    "er_wep_cbs_dirty" -> wepSql(clean = false, "cbs", "0.0"),
    "er_wep_cbs_clean" -> wepSql(clean = true, "cbs", "0.0"),

    "er_wep_js_dirty" -> wepSql(clean = false, "js", "0.000000001"),

    "er_cep_cbs_dirty" -> cepSql(clean = false),
    "er_cep_cbs_clean" -> cepSql(clean = true),
    // fractional weights: every level distinct -> the histogram walk is
    // O(edges) levels; exercises the distributed two-phase prefix scan
    "er_cep_js_dirty" -> cepSql(clean = false, scheme = "js"),

    "er_cnp_cbs_or_dirty" -> cnpSql(clean = false, "cbs", "OR"),
    "er_cnp_cbs_or_clean" -> cnpSql(clean = true, "cbs", "OR"),
    "er_cnp_js_and_dirty" -> cnpSql(clean = false, "js", "AND"),

    "er_block_entropy" -> (prelude(clean = false) +
      s"""bocc AS (SELECT m.key, p.key AS other_key
         |         FROM m2 m JOIN pbf p ON m.profile_id = p.profile_id),
         |bcnt AS (SELECT key, other_key, CAST(COUNT(*) AS DOUBLE) AS s
         |         FROM bocc GROUP BY key, other_key),
         |btot AS (SELECT key, SUM(s) AS n FROM bcnt GROUP BY key),
         |bent AS (SELECT key,
         |         (-${esfold("(s / n) * ln(s / n)")}) / n AS entropy
         |         FROM bcnt JOIN btot USING (key) GROUP BY key, n)
         |SELECT key, round(entropy, 9) AS entropy FROM bent""".stripMargin),

    "er_block_entropy_norm" -> (prelude(clean = false) +
      s"""bocc AS (SELECT m.key, p.key AS other_key
         |         FROM m2 m JOIN pbf p ON m.profile_id = p.profile_id),
         |bcnt AS (SELECT key, other_key, CAST(COUNT(*) AS DOUBLE) AS s
         |         FROM bocc GROUP BY key, other_key),
         |btot AS (SELECT key, SUM(s) AS n FROM bcnt GROUP BY key),
         |bent AS (SELECT key,
         |         (-${esfold("(s / n) * ln(s / n)")}) / n AS entropy
         |         FROM bcnt JOIN btot USING (key) GROUP BY key, n)
         |SELECT b.key, round(b.entropy / CAST(s.size AS DOUBLE), 9) AS entropy
         |FROM bent b JOIN bs2 s USING (key)""".stripMargin),

    "er_gt_convert" ->
      """WITH gt AS (
        |  SELECT 'P' || CAST(a.p_partkey AS VARCHAR) AS id1, 'P' || CAST(b.p_partkey AS VARCHAR) AS id2
        |  FROM part a JOIN part b ON a.p_name = b.p_name AND a.p_partkey < b.p_partkey),
        |prof AS (SELECT p_partkey AS profile_id, 'P' || CAST(p_partkey AS VARCHAR) AS original_id FROM part)
        |SELECT DISTINCT LEAST(m1.profile_id, m2.profile_id) AS p1,
        |       GREATEST(m1.profile_id, m2.profile_id) AS p2
        |FROM gt JOIN prof m1 ON gt.id1 = m1.original_id JOIN prof m2 ON gt.id2 = m2.original_id""".stripMargin,

    "er_pcpq_wnp_dirty" -> (prelude(clean = false) + wpw("cbs") + directedFor(clean = false, "cbs") +
      """th AS (SELECT a, SUM(w) / COUNT(*) AS theta FROM directed GROUP BY a),
        |cand AS (SELECT DISTINCT wpw.p1, wpw.p2
        |         FROM wpw JOIN th t1 ON wpw.p1 = t1.a JOIN th t2 ON wpw.p2 = t2.a
        |         WHERE (w1 >= t2.theta - 0.0 OR w1 >= t1.theta - 0.0)),
        |gtc AS (SELECT DISTINCT LEAST(a.p_partkey, b.p_partkey) AS p1, GREATEST(a.p_partkey, b.p_partkey) AS p2
        |        FROM part a JOIN part b ON a.p_name = b.p_name AND a.p_partkey < b.p_partkey),
        |nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS num_candidates FROM cand),
        |nm AS (SELECT CAST(COUNT(*) AS BIGINT) AS num_matches
        |       FROM (SELECT p1, p2 FROM cand INTERSECT SELECT p1, p2 FROM gtc)),
        |ng AS (SELECT CAST(COUNT(*) AS BIGINT) AS num_gt FROM gtc),
        |base AS (SELECT num_candidates, num_matches, num_gt,
        |         CAST(num_matches AS DOUBLE) / num_gt AS pc,
        |         CASE WHEN num_candidates > 0 THEN CAST(num_matches AS DOUBLE) / num_candidates ELSE 0.0 END AS pq
        |         FROM nc, nm, ng)
        |SELECT num_candidates, num_matches, num_gt, pc, pq,
        |       CASE WHEN pc + pq > 0.0 THEN 2.0 * pc * pq / (pc + pq) ELSE 0.0 END AS f1
        |FROM base""".stripMargin),

    // sorted-neighborhood blocking: ROW_NUMBER is the oracle's total order;
    // the engine's distributed two-phase rank must match it exactly
    "er_snb_pairs" ->
      """WITH k AS (SELECT p_partkey AS profile_id, lower(p_name) AS sort_key FROM part),
        |r AS (SELECT profile_id, ROW_NUMBER() OVER (ORDER BY sort_key, profile_id) AS rn FROM k)
        |SELECT a.profile_id AS p1, b.profile_id AS p2, CAST(b.rn - a.rn AS BIGINT) AS dist
        |FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 6""".stripMargin,

    // matching stage: normalized Levenshtein over the WNP(cbs, avg, or)
    // candidate set — the theta CTE and keep condition come from the same
    // wnpThetaCte/wnpKeepCond fragments wnpSql compiles, so the candidate
    // rule cannot desynchronize from er_wnp_cbs_avg_or_dirty
    "er_match_edit" ->
      (prelude(clean = false) + wpw("cbs") + directedSelf("cbs") +
        s"""${wnpThetaCte("avg")},
          |cand AS (SELECT wpw.p1, wpw.p2
          |         FROM wpw JOIN th t1 ON wpw.p1 = t1.a JOIN th t2 ON wpw.p2 = t2.a
          |         WHERE ${wnpKeepCond("cbs", "avg", "or", "0.0")}),
          |nm AS (SELECT p_partkey, lower(p_name) AS nm FROM part),
          |scored AS (
          |  SELECT c.p1, c.p2,
          |         1.0 - CAST(levenshtein(n1.nm, n2.nm) AS DOUBLE) /
          |               GREATEST(length(n1.nm), length(n2.nm)) AS sim0
          |  FROM cand c JOIN nm n1 ON c.p1 = n1.p_partkey
          |              JOIN nm n2 ON c.p2 = n2.p_partkey)
          |SELECT p1, p2, ROUND(sim0, 9) AS sim FROM scored WHERE sim0 >= 0.5""".stripMargin),

    // attribute-profiling twin: same 1e-9 fixed-point c*ln(c) terms,
    // exact integer sums, entropy = ln(n) - sum/1e9/n rounded to 9
    "er_attr_profile" -> (prelude(clean = false) +
      """vc AS (SELECT attribute, value, CAST(COUNT(*) AS BIGINT) AS c,
        |              length(value) AS len,
        |              CAST(round(CAST(COUNT(*) AS DOUBLE) * ln(CAST(COUNT(*) AS DOUBLE)) * 1000000000.0) AS BIGINT) AS term_fix
        |       FROM attrs WHERE value IS NOT NULL GROUP BY attribute, value)
        |SELECT attribute, CAST(SUM(c) AS BIGINT) AS n,
        |       CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |       round(CAST(SUM(c * len) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 9) AS avg_len,
        |       round(ln(CAST(SUM(c) AS DOUBLE)) -
        |             CAST(SUM(term_fix) AS DOUBLE) / 1000000000.0 / CAST(SUM(c) AS DOUBLE), 9) AS entropy
        |FROM vc GROUP BY attribute""".stripMargin),

    // Jaro-Winkler matching twin: DuckDB's jaro_winkler_similarity IS
    // the textbook comparator graft.functions.JaroWinkler implements
    // (verified: boost only above 0.7, prefix cap 4, empties -> 0);
    // both sides threshold the 9-dp-rounded score
    "er_match_jw" -> (matchedEdgesCtes +
      """jwsc AS (
        |  SELECT c.p1, c.p2,
        |         round(jaro_winkler_similarity(n1.nm, n2.nm), 9) AS sim_jw
        |  FROM cand c JOIN nm n1 ON c.p1 = n1.p_partkey
        |              JOIN nm n2 ON c.p2 = n2.p_partkey)
        |SELECT p1, p2, sim_jw FROM jwsc WHERE sim_jw >= 0.8""".stripMargin),

    // entity-quality twin: the er_entities closure, induced same-entity
    // pairs vs the identical-name ground truth, Dice-form F1
    "er_entity_metrics" -> ((matchedEdgesCtes +
      """eg AS (SELECT p1 AS u, p2 AS v FROM me UNION ALL SELECT p2, p1 FROM me),
        |reach(a, b) AS (
        |  SELECT p_partkey, p_partkey FROM part
        |  UNION
        |  SELECT r.a, eg.v FROM reach r JOIN eg ON r.b = eg.u),
        |ents AS (SELECT a AS profile_id, MIN(b) AS entity_id FROM reach GROUP BY a),
        |ip AS (SELECT e1.profile_id AS p1, e2.profile_id AS p2
        |       FROM ents e1 JOIN ents e2
        |         ON e1.entity_id = e2.entity_id AND e1.profile_id < e2.profile_id),
        |gtp AS (SELECT a.p_partkey AS p1, b.p_partkey AS p2
        |        FROM part a JOIN part b
        |          ON a.p_name = b.p_name AND a.p_partkey < b.p_partkey),
        |cnts AS (SELECT
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ip) AS n_induced,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM gtp) AS n_gt,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ip JOIN gtp USING (p1, p2)) AS n_tp)
        |SELECT n_induced, n_gt, n_tp,
        |       round(CAST(n_tp AS DOUBLE) / n_induced, 9) AS "precision",
        |       round(CAST(n_tp AS DOUBLE) / n_gt, 9) AS recall,
        |       round(2.0 * n_tp / (n_induced + n_gt), 9) AS f1
        |FROM cnts""".stripMargin)
      .replaceFirst("WITH ", "WITH RECURSIVE ")),

    // TF-IDF matcher twin: same fixed-point weights, exact integer
    // dot/norm sums over the shared WNP candidate set
    "er_match_tfidf" -> (matchedEdgesCtes +
      """tfc AS (SELECT p_partkey AS pid, unnest(list_filter(string_split(lower(p_name), ' '),
        |                                 t -> length(t) > 0)) AS token FROM part),
        |tft AS (SELECT pid, token, CAST(COUNT(*) AS BIGINT) AS tf FROM tfc GROUP BY pid, token),
        |tfd AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tft GROUP BY token),
        |tfn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part),
        |tfw AS (SELECT pid, token,
        |               CAST(round(tf * ln(CAST(n AS DOUBLE) / df) * 1000000.0) AS BIGINT) AS f
        |        FROM tft JOIN tfd USING (token) CROSS JOIN tfn),
        |tfnr AS (SELECT pid, CAST(SUM(f * f) AS BIGINT) AS nrm2 FROM tfw GROUP BY pid),
        |tfdp AS (SELECT c.p1, c.p2, CAST(SUM(w1.f * w2.f) AS BIGINT) AS dp
        |         FROM cand c JOIN tfw w1 ON w1.pid = c.p1
        |                     JOIN tfw w2 ON w2.pid = c.p2 AND w2.token = w1.token
        |         GROUP BY c.p1, c.p2),
        |tfs AS (SELECT d.p1, d.p2,
        |               round(CAST(dp AS DOUBLE) /
        |                     (sqrt(CAST(n1.nrm2 AS DOUBLE)) * sqrt(CAST(n2.nrm2 AS DOUBLE))), 9) AS sim_tfidf
        |        FROM tfdp d JOIN tfnr n1 ON n1.pid = d.p1
        |                    JOIN tfnr n2 ON n2.pid = d.p2)
        |SELECT p1, p2, sim_tfidf FROM tfs WHERE sim_tfidf >= 0.5""".stripMargin),

    // k-core twin: 8 unrolled peel rounds (the engine converges in ~5 on
    // this graph and THROWS if 8 wouldn't suffice; stable rounds no-op)
    "er_kcore" -> (matchedEdgesCtes + {
      val rounds = (1 to 8).map { r =>
        s"""kcd$r AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS deg FROM (
           |            SELECT p1 AS n FROM kce${r - 1}
           |            UNION ALL SELECT p2 FROM kce${r - 1}) GROUP BY n),
           |kck$r AS (SELECT n FROM kcd$r WHERE deg >= 2),
           |kce$r AS (SELECT p1, p2 FROM kce${r - 1}
           |          WHERE p1 IN (SELECT n FROM kck$r)
           |            AND p2 IN (SELECT n FROM kck$r))""".stripMargin
      }
      ("kce0 AS (SELECT p1, p2 FROM me)" +: rounds).mkString(",\n") +
        """
          |SELECT n AS profile_id, CAST(COUNT(*) AS BIGINT) AS core_deg FROM (
          |  SELECT p1 AS n FROM kce8 UNION ALL SELECT p2 FROM kce8) GROUP BY n"""
          .stripMargin
    }),

    // iterated-matching twin: 3 unrolled reciprocal rounds with node
    // removal between rounds, each kept pair tagged with its round
    "er_max_match" -> (matchedEdgesCtes + {
      val m0 =
        """mm0 AS (
          |  SELECT m.p1, m.p2,
          |         ROUND(1.0 - CAST(levenshtein(n1.nm, n2.nm) AS DOUBLE) /
          |               GREATEST(length(n1.nm), length(n2.nm)), 9) AS sim
          |  FROM me m JOIN nm n1 ON m.p1 = n1.p_partkey
          |            JOIN nm n2 ON m.p2 = n2.p_partkey)""".stripMargin
      val rounds = (1 to 3).map { r =>
        s"""mmd$r AS (SELECT p1 AS a, p2 AS b, sim FROM mm${r - 1}
           |          UNION ALL SELECT p2, p1, sim FROM mm${r - 1}),
           |mmb$r AS (SELECT a, b FROM (
           |            SELECT a, b, ROW_NUMBER() OVER (PARTITION BY a
           |              ORDER BY sim DESC, b ASC) AS rn FROM mmd$r) WHERE rn = 1),
           |mmk$r AS (SELECT m.p1, m.p2, m.sim FROM mm${r - 1} m
           |          JOIN mmb$r x ON x.a = m.p1 AND x.b = m.p2
           |          JOIN mmb$r y ON y.a = m.p2 AND y.b = m.p1),
           |mmn$r AS (SELECT p1 AS node FROM mmk$r UNION SELECT p2 FROM mmk$r),
           |mm$r AS (SELECT * FROM mm${r - 1}
           |         WHERE p1 NOT IN (SELECT node FROM mmn$r)
           |           AND p2 NOT IN (SELECT node FROM mmn$r))""".stripMargin
      }
      val out = (1 to 3).map(r =>
        s"SELECT p1, p2, sim, $r AS round FROM mmk$r").mkString(" UNION ALL ")
      (m0 +: rounds).mkString(",\n") + s"\n$out"
    }),

    // reciprocal-best-match twin: re-score the shared matched edges,
    // orient both ways, rank per node (sim desc, partner asc), keep
    // mutually-top-1 pairs
    "er_best_match" -> (matchedEdgesCtes +
      """mes AS (
        |  SELECT m.p1, m.p2,
        |         ROUND(1.0 - CAST(levenshtein(n1.nm, n2.nm) AS DOUBLE) /
        |               GREATEST(length(n1.nm), length(n2.nm)), 9) AS sim
        |  FROM me m JOIN nm n1 ON m.p1 = n1.p_partkey
        |            JOIN nm n2 ON m.p2 = n2.p_partkey),
        |dirm AS (SELECT p1 AS a, p2 AS b, sim FROM mes
        |         UNION ALL SELECT p2, p1, sim FROM mes),
        |bestm AS (SELECT a, b,
        |            ROW_NUMBER() OVER (PARTITION BY a ORDER BY sim DESC, b ASC) AS rn
        |          FROM dirm)
        |SELECT m.p1, m.p2, m.sim FROM mes m
        |  JOIN bestm b1 ON b1.a = m.p1 AND b1.b = m.p2 AND b1.rn = 1
        |  JOIN bestm b2 ON b2.a = m.p2 AND b2.b = m.p1 AND b2.rn = 1""".stripMargin),

    // entity clustering twin: the er_match_edit matched set, transitive
    // closure via a recursive CTE (the dedup_clusters pattern), MIN
    // reachable id as entity
    "er_entities" -> (matchedEdgesCtes +
      """eg AS (SELECT p1 AS u, p2 AS v FROM me UNION ALL SELECT p2, p1 FROM me),
        |reach(a, b) AS (
        |  SELECT p_partkey, p_partkey FROM part
        |  UNION
        |  SELECT r.a, eg.v FROM reach r JOIN eg ON r.b = eg.u)
        |SELECT a AS profile_id, MIN(b) AS entity_id FROM reach GROUP BY a"""
        .stripMargin).replaceFirst("WITH ", "WITH RECURSIVE "),

    // golden-record twin over the same closure: per-entity deterministic
    // mode (count DESC, value ASC) for each attribute
    "er_golden" -> (matchedEdgesCtes +
      """eg AS (SELECT p1 AS u, p2 AS v FROM me UNION ALL SELECT p2, p1 FROM me),
        |reach(a, b) AS (
        |  SELECT p_partkey, p_partkey FROM part
        |  UNION
        |  SELECT r.a, eg.v FROM reach r JOIN eg ON r.b = eg.u),
        |cl AS (SELECT a AS profile_id, MIN(b) AS entity_id FROM reach GROUP BY a),
        |jj AS (SELECT cl.entity_id, p.p_brand, p.p_type
        |       FROM cl JOIN part p ON cl.profile_id = p.p_partkey),
        |szs AS (SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS n_members FROM jj GROUP BY 1),
        |bm AS (SELECT entity_id, p_brand AS brand_golden FROM (
        |         SELECT entity_id, p_brand,
        |                ROW_NUMBER() OVER (PARTITION BY entity_id
        |                  ORDER BY COUNT(*) DESC, p_brand ASC) AS rn
        |         FROM jj GROUP BY entity_id, p_brand) WHERE rn = 1),
        |tm AS (SELECT entity_id, p_type AS type_golden FROM (
        |         SELECT entity_id, p_type,
        |                ROW_NUMBER() OVER (PARTITION BY entity_id
        |                  ORDER BY COUNT(*) DESC, p_type ASC) AS rn
        |         FROM jj GROUP BY entity_id, p_type) WHERE rn = 1)
        |SELECT szs.entity_id, szs.n_members, bm.brand_golden, tm.type_golden
        |FROM szs JOIN bm USING (entity_id) JOIN tm USING (entity_id)"""
        .stripMargin).replaceFirst("WITH ", "WITH RECURSIVE "),

    // PageRank twin: same matched-edge set, 3 unrolled iterations as
    // chained CTEs — identical fixed-point arithmetic (round(rf/deg)
    // contributions, round(0.15e9 + 0.85*sum) damped update), so the
    // bigint sums make both sides order-independent and bit-identical
    "er_pagerank" -> (matchedEdgesCtes +
      """eg AS (SELECT p1 AS src, p2 AS dst FROM me UNION ALL SELECT p2, p1 FROM me),
        |dg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM eg GROUP BY src),
        |pr0 AS (SELECT src AS node, CAST(1000000000 AS BIGINT) AS rf FROM dg),
        |pr1 AS (SELECT e.dst AS node,
        |               CAST(round(150000000.0 + 0.85 * SUM(CAST(round(r.rf / d.deg) AS BIGINT))) AS BIGINT) AS rf
        |        FROM eg e JOIN pr0 r ON e.src = r.node JOIN dg d ON e.src = d.src
        |        GROUP BY e.dst),
        |pr2 AS (SELECT e.dst AS node,
        |               CAST(round(150000000.0 + 0.85 * SUM(CAST(round(r.rf / d.deg) AS BIGINT))) AS BIGINT) AS rf
        |        FROM eg e JOIN pr1 r ON e.src = r.node JOIN dg d ON e.src = d.src
        |        GROUP BY e.dst),
        |pr3 AS (SELECT e.dst AS node,
        |               CAST(round(150000000.0 + 0.85 * SUM(CAST(round(r.rf / d.deg) AS BIGINT))) AS BIGINT) AS rf
        |        FROM eg e JOIN pr2 r ON e.src = r.node JOIN dg d ON e.src = d.src
        |        GROUP BY e.dst)
        |SELECT pr3.node AS profile_id, dg.deg, pr3.rf / 1000000000.0 AS rank
        |FROM pr3 JOIN dg ON pr3.node = dg.src""".stripMargin),

    // triangle-count twin over the same matched graph: edges are stored
    // once in (p1 < p2) orientation, so each triangle {a<b<c} is
    // enumerated exactly once as wedge (a,b)+(b,c) closed by (a,c)
    "er_triangles" -> (matchedEdgesCtes +
      """tri AS (SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
        |        FROM me e1 JOIN me e2 ON e1.p2 = e2.p1
        |                   JOIN me e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2),
        |tn AS (SELECT a AS profile_id FROM tri
        |       UNION ALL SELECT b FROM tri
        |       UNION ALL SELECT c FROM tri)
        |SELECT profile_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
        |FROM tn GROUP BY 1""".stripMargin),

    "er_ngram_blocks" ->
      """WITH ntoks AS (
        |  SELECT DISTINCT profile_id, tok FROM (
        |    SELECT p_partkey AS profile_id,
        |           unnest(regexp_split_to_array(lower(p_name), '[^\p{L}\p{N}_]+')) AS tok
        |    FROM part) u WHERE tok <> ''),
        |padded AS (SELECT profile_id, '___' || tok || '___' AS p FROM ntoks),
        |ng AS (SELECT DISTINCT profile_id, substr(p, CAST(i AS INTEGER), 4) AS key
        |       FROM padded, unnest(generate_series(1, length(p) - 3)) AS g(i))
        |SELECT key, CAST(COUNT(*) AS BIGINT) AS size,
        |       CAST(COUNT(*) * (COUNT(*) - 1) AS BIGINT) AS comparisons
        |FROM ng GROUP BY key HAVING COUNT(*) > 1""".stripMargin,

    // suffix-blocking twin: every suffix of length >= 4 of each name
    // token (substr to end of string), same valid-block stats
    "er_suffix_blocks" ->
      """WITH ntoks AS (
        |  SELECT DISTINCT profile_id, tok FROM (
        |    SELECT p_partkey AS profile_id,
        |           unnest(regexp_split_to_array(lower(p_name), '[^\p{L}\p{N}_]+')) AS tok
        |    FROM part) u WHERE tok <> ''),
        |sfx AS (SELECT DISTINCT profile_id,
        |               substr(tok, CAST(i AS INTEGER), length(tok)) AS key
        |        FROM ntoks, unnest(generate_series(1, length(tok) - 3)) AS g(i))
        |SELECT key, CAST(COUNT(*) AS BIGINT) AS size,
        |       CAST(COUNT(*) * (COUNT(*) - 1) AS BIGINT) AS comparisons
        |FROM sfx GROUP BY key HAVING COUNT(*) > 1""".stripMargin
  )
}
