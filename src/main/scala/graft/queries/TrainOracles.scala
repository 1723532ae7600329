package graft.queries

/**
 * DuckDB oracle SQL for [[TrainQueries]]. Cross-engine parity rules (same
 * discipline as [[ErOracles]]):
 *
 *  - char streams via generate_series + substr (never split-on-empty);
 *    sequential folds via list_reduce over a 0-prepended list, matching
 *    Spark's `aggregate` initial-value fold order element by element;
 *  - all hash arithmetic in BIGINT with the same constants/modulus;
 *  - float vectors cast element-wise to DOUBLE before multiply, summed in
 *    index order; results rounded to 9 decimals on both sides;
 *  - money sums as integer cents (SUM of round(value*100) longs) so the
 *    result is independent of partial-aggregation order;
 *  - CTEs materialized (see ErOracles.materializeCtes).
 */
object TrainOracles {

  private val Mod = "2147483647"

  /** h = fold over chars of (h*31 + ascii) % Mod — twin of Dedup.strHash. */
  private[queries] def strHash(e: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       | list_transform(generate_series(1, length($e)),
       |   i -> CAST(ascii(substr($e, CAST(i AS INTEGER), 1)) AS BIGINT))),
       | (acc, c) -> (acc * 31 + c) % $Mod)""".stripMargin.replace("\n", " ")

  /** Twin of Dedup.normalize. */
  private def norm(e: String): String =
    s"trim(regexp_replace(lower($e), '\\s+', ' ', 'g'))"

  /** Tokens + sliding 10-grams CTEs, parameterized by the doc filter and
   * CTE names (twin of Curation.tokenArr + slidingGrams at L=10). */
  private def gramCtes(dnName: String, grName: String, where: String): String =
    s"""$dnName AS (SELECT doc_id,
       |         list_filter(string_split(${norm("text")}, ' '), t -> length(t) > 0) AS toks
       |       FROM documents$where),
       |$grName AS (SELECT doc_id, CAST(x.i AS INT) AS pos,
       |         array_to_string(list_slice(toks, CAST(x.i + 1 AS BIGINT), CAST(x.i + 10 AS BIGINT)), ' ') AS gram
       |       FROM $dnName, unnest(generate_series(0, CAST(len(toks) - 10 AS BIGINT))) AS x(i)
       |       WHERE len(toks) >= 10),
       |""".stripMargin

  /** Island-merge tail (twin of Curation.mergeIslands at L=10): from a
   * marked-position CTE `mk(doc_id, pos)` to spans
   * `sp(doc_id, span_start, span_end, span_tokens, n_windows)`. */
  private lazy val spanTail: String =
    """gp AS (SELECT doc_id, pos,
      |          CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 10
      |               THEN 0 ELSE 1 END AS gap
      |        FROM mk),
      |isl AS (SELECT doc_id, pos,
      |          SUM(gap) OVER (PARTITION BY doc_id ORDER BY pos
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |        FROM gp),
      |sp AS (SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
      |         CAST(MAX(pos) + 10 AS BIGINT) AS span_end,
      |         CAST(MAX(pos) + 10 - MIN(pos) AS BIGINT) AS span_tokens,
      |         CAST(COUNT(*) AS BIGINT) AS n_windows
      |       FROM isl GROUP BY doc_id, island),
      |""".stripMargin

  /** Shared CTE chain for Curation.dupSpans (L=10): mark rule = gram text
   * occurs more than once anywhere. txt_span_dedup and txt_span_apply
   * compile from this one definition. */
  private lazy val spanCtes: String =
    "WITH " + gramCtes("dn", "gr", "") +
    """dup AS (SELECT gram FROM gr GROUP BY gram HAVING COUNT(*) > 1),
      |mk AS (SELECT doc_id, pos FROM gr JOIN dup USING (gram)),
      |""".stripMargin + spanTail

  /** Sequential double fold of a list expression (0.0-prepended). */
  /** Char-level ExactSubstr CTE chain shared by txt_substr_dedup and
   * txt_substr_apply (twin of Curation.substrDupSpans at L=30): sliding
   * windows `oc`, window frequencies + canonical keeper `fr`, marked
   * positions `mk`, island merge to `sp(doc_id, span_start, span_end,
   * n_windows)`. Ends with a trailing comma (append `x AS (SELECT 1)` or
   * further CTEs). */
  private lazy val substrCtes: String =
    """WITH oc AS MATERIALIZED (
      |  SELECT doc_id, CAST(x.i AS BIGINT) AS pos,
      |         substr(text, CAST(x.i + 1 AS BIGINT), 30) AS s
      |  FROM documents, unnest(generate_series(0, CAST(length(text) - 30 AS BIGINT))) AS x(i)
      |  WHERE length(text) >= 30),
      |fr AS MATERIALIZED (
      |  SELECT s, COUNT(*) AS cnt, MIN(doc_id * 1000000 + pos) AS mk
      |  FROM oc GROUP BY s),
      |mk AS (SELECT oc.doc_id, oc.pos FROM oc JOIN fr ON oc.s = fr.s
      |       WHERE fr.cnt >= 2 AND oc.doc_id * 1000000 + oc.pos <> fr.mk),
      |g1 AS (SELECT doc_id, pos,
      |         CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 30
      |              THEN 0 ELSE 1 END AS gap
      |       FROM mk),
      |g2 AS (SELECT doc_id, pos, SUM(gap) OVER (PARTITION BY doc_id ORDER BY pos
      |                ROWS UNBOUNDED PRECEDING) AS island
      |       FROM g1),
      |sp AS MATERIALIZED (SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
      |              CAST(MAX(pos) + 30 AS BIGINT) AS span_end,
      |              CAST(COUNT(*) AS BIGINT) AS n_windows
      |       FROM g2 GROUP BY doc_id, island),
      |""".stripMargin

  /** Keep-nothing variant of [[substrCtes]] for the STREAMING ExactSubstr
   * gate: every occurrence IN AN ARRIVING DOC (the doc_id % 10 == 0
   * batch) of a 30-char window repeated anywhere in the corpus is marked
   * (a stateless gate cannot elect a corpus-global first copy — it keeps
   * the standing copy and gates arrivals), same island merge. */
  private lazy val substrStreamCtes: String =
    """WITH oc AS MATERIALIZED (
      |  SELECT doc_id, CAST(x.i AS BIGINT) AS pos,
      |         substr(text, CAST(x.i + 1 AS BIGINT), 30) AS s
      |  FROM documents, unnest(generate_series(0, CAST(length(text) - 30 AS BIGINT))) AS x(i)
      |  WHERE length(text) >= 30),
      |fr AS MATERIALIZED (
      |  SELECT s FROM oc GROUP BY s HAVING COUNT(*) >= 2),
      |mk AS (SELECT oc.doc_id, oc.pos FROM oc JOIN fr ON oc.s = fr.s
      |       WHERE oc.doc_id % 10 = 0),
      |g1 AS (SELECT doc_id, pos,
      |         CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 30
      |              THEN 0 ELSE 1 END AS gap
      |       FROM mk),
      |g2 AS (SELECT doc_id, pos, SUM(gap) OVER (PARTITION BY doc_id ORDER BY pos
      |                ROWS UNBOUNDED PRECEDING) AS island
      |       FROM g1),
      |sp AS MATERIALIZED (SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
      |              CAST(MAX(pos) + 30 AS BIGINT) AS span_end,
      |              CAST(COUNT(*) AS BIGINT) AS n_windows
      |       FROM g2 GROUP BY doc_id, island),
      |""".stripMargin

  /** DSIR CTE chain (twin of Curation.dsirWeights, target = src1,
   * B = 256): candidate/target token buckets, the full bucket spine with
   * +1 smoothing, grained single-ln log ratios, per-doc exact BIGINT
   * sums -> dw(doc_id, n_tokens, w). Ends with a trailing comma. */
  private lazy val dsirCtes: String = {
    def tokCte(name: String, where: String): String =
      s"""${name}0 AS (SELECT doc_id,
         |    list_filter(string_split(${norm("text")}, ' '), t -> length(t) > 0) AS toks
         |  FROM documents WHERE $where),
         |$name AS (SELECT doc_id, ${strHash("t.tok")} % 256 AS bucket
         |  FROM ${name}0, unnest(toks) AS t(tok)),
         |""".stripMargin
    "WITH " + tokCte("cb", "source <> 'src1'") + tokCte("tb", "source = 'src1'") +
    """tc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS tcnt FROM tb GROUP BY bucket),
      |qc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS qcnt FROM cb GROUP BY bucket),
      |sp AS (SELECT r.b AS bucket, coalesce(tcnt, 0) AS tcnt, coalesce(qcnt, 0) AS qcnt
      |       FROM range(256) r(b) LEFT JOIN tc ON tc.bucket = r.b
      |                            LEFT JOIN qc ON qc.bucket = r.b),
      |tot AS (SELECT CAST(SUM(tcnt) AS BIGINT) AS tt, CAST(SUM(qcnt) AS BIGINT) AS qt FROM sp),
      |lr AS (SELECT bucket, CAST(round(ln(
      |           (CAST(tcnt + 1 AS DOUBLE) * CAST(qt + 256 AS DOUBLE))
      |         / (CAST(qcnt + 1 AS DOUBLE) * CAST(tt + 256 AS DOUBLE))) * 1000000000.0) AS BIGINT) AS lr_g
      |       FROM sp CROSS JOIN tot),
      |dw AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |          CAST(SUM(lr_g) AS DOUBLE) / 1000000000.0 AS w
      |       FROM cb JOIN lr USING (bucket) GROUP BY doc_id),
      |""".stripMargin
  }

  private def dsum(listExpr: String): String =
    s"list_reduce(list_prepend(0.0, $listExpr), (acc, v) -> acc + v)"

  /** Twin of Similarity.dot on FLOAT[] columns a, b (64 dims). */
  private def dot(a: String, b: String): String =
    dsum(s"list_transform(generate_series(1, 64), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))")

  private def nrm(a: String): String =
    s"sqrt(${dsum(s"list_transform(generate_series(1, 64), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))")})"

  private def cosine(a: String, b: String): String =
    s"(${dot(a, b)} / (${nrm(a)} * ${nrm(b)}))"

  /** Twin of Similarity.srpBucket: sign-random-projection bucket over
   * `planes` hyperplanes; plane component for (p, dim i0) is
   * lcg(p*64+i0)/Mod - 0.5. */
  private def srpBucket(vecTable: String, planes: Int): String =
    s"""SELECT e.vec_id, e.embedding,
       | CAST(SUM(CASE WHEN ${dsum(s"list_transform(generate_series(1, 64), i -> CAST(e.embedding[i] AS DOUBLE) * (CAST((1103515245 * (p.p * 64 + (i - 1)) + 12345) % $Mod AS DOUBLE) / $Mod.0 - 0.5))")} >= 0
       |   THEN (CAST(1 AS BIGINT) << CAST(p.p AS INTEGER)) ELSE 0 END) AS BIGINT) AS bucket
       | FROM $vecTable e CROSS JOIN (SELECT unnest(generate_series(0, ${planes - 1})) AS p) p
       | GROUP BY e.vec_id, e.embedding""".stripMargin.replace("\n", " ")

  /** Shared banded-SRP near-dup prefix `np(v1, v2, cos)` at threshold
   * 0.4 — the ann_cos_neardup pairs the DBSCAN twin clusters over. */
  private lazy val neardupCtes: String =
    s"""WITH vs AS (${srpBucket("embeddings", 16).replace(" AS bucket ", " AS sig ")}),
       |vb AS (SELECT vec_id, CAST(b.b AS INTEGER) AS band,
       |              (sig >> CAST(b.b * 4 AS INTEGER)) & 15 AS bkey
       |       FROM vs, (SELECT unnest(generate_series(0, 3)) AS b) b),
       |cand AS (SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
       |         FROM vb a JOIN vb b ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id),
       |np AS (SELECT c.v1, c.v2, round(${cosine("e1.embedding", "e2.embedding")}, 9) AS cos
       |       FROM cand c JOIN embeddings e1 ON c.v1 = e1.vec_id
       |       JOIN embeddings e2 ON c.v2 = e2.vec_id
       |       WHERE round(${cosine("e1.embedding", "e2.embedding")}, 9) >= 0.4),
       |""".stripMargin

  /** Twin of Dedup.simhash's lane votes: from a `th(doc_id, h)` CTE of
   * distinct-token hashes, four affine lane hashes
   * (hashA(j)*h + hashB(j)) % Mod and a +1/-1 vote per fingerprint bit
   * k = j*16 + b (bit b of lane j). */
  private val simhashLanesVotes =
    s"""lh AS (
       |  SELECT doc_id, j.j AS j,
       |         ((CAST(1103515245 AS BIGINT) * (j.j + 1) + 12345) % $Mod * h
       |          + (2654435761 * (j.j + 1)) % $Mod) % $Mod AS lh
       |  FROM th, (SELECT unnest(generate_series(0, 3)) AS j) j),
       |votes AS (
       |  SELECT doc_id, j * 16 + b.b AS k,
       |         SUM(CASE WHEN (lh >> CAST(b.b AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM lh, (SELECT unnest(generate_series(0, 15)) AS b) b
       |  GROUP BY doc_id, j * 16 + b.b)""".stripMargin

  /** 64-bit fingerprint from the votes CTE; bit 63 is the sign bit, so its
   * weight is the Long.MinValue literal (DuckDB raises on 1::BIGINT << 63;
   * the CASE keeps the shift argument < 63). */
  private val simhashFromVotes =
    """CAST(SUM(CASE WHEN v <= 0 THEN 0
      |              WHEN k = 63 THEN CAST(-9223372036854775808 AS BIGINT)
      |              ELSE (CAST(1 AS BIGINT) << CAST(k AS INTEGER)) END) AS BIGINT)""".stripMargin.replace("\n", " ")

  /** dHash fingerprint CTE chain over the PPM corpus + planted twins:
   * 9x8 nearest-neighbor luminance grid (integer ITU-R 601 weights),
   * bit (gy*8+gx) set when the cell out-brightens its right neighbor —
   * the exact twin of Multimodal.decodePpmDhash, recomputed from the
   * closed-form Multimodal.ppmDhashFixture pixels (the squared mix
   * v = ((src·131 + i·17 + 251)² / 7 [+ 1 on every 9th twin byte])
   * % 256) without parsing PPM. Ends at `fp(doc_id, dhash)`; bit 63
   * uses the Long.MinValue literal (DuckDB raises on 1 << 63). */
  private lazy val dhashCtes: String =
    s"""WITH imgs AS (
       |  SELECT doc_id AS img_id, doc_id AS src, 0 AS pert FROM documents
       |  UNION ALL
       |  SELECT doc_id + 10000000, doc_id, 1 FROM documents WHERE doc_id % 20 = 0),
       |dims AS (SELECT img_id, src, pert, CAST(16 + src % 9 AS BIGINT) AS w,
       |                CAST(12 + src % 7 AS BIGINT) AS h FROM imgs),
       |cells AS (
       |  SELECT img_id, src, pert, w, h, gy.gy AS gy, gx.gx AS gx,
       |         ((gy.gy * h) // 8 * w + (gx.gx * w) // 9) * 3 AS ib
       |  FROM dims, unnest(generate_series(0, 7)) AS gy(gy),
       |       unnest(generate_series(0, 8)) AS gx(gx)),
       |chv AS (
       |  SELECT img_id, gy, gx, c.c AS c,
       |         src * 131 + (ib + c.c) * 17 + 251 AS t,
       |         CASE WHEN pert = 1 AND (ib + c.c) % 9 = 0 THEN 1 ELSE 0 END AS dp
       |  FROM cells, unnest(generate_series(0, 2)) AS c(c)),
       |pxv AS (
       |  SELECT img_id, gy, gx, c, ((t * t) // 7 + dp) % 256 AS v FROM chv),
       |lum AS MATERIALIZED (
       |  SELECT img_id, gy, gx,
       |         SUM(CASE c WHEN 0 THEN 299 * v WHEN 1 THEN 587 * v
       |                    ELSE 114 * v END) // 1000 AS l
       |  FROM pxv GROUP BY img_id, gy, gx),
       |bits AS (
       |  SELECT a.img_id, a.gy * 8 + a.gx AS k,
       |         CASE WHEN a.l > b.l THEN 1 ELSE 0 END AS bit
       |  FROM lum a JOIN lum b ON a.img_id = b.img_id AND a.gy = b.gy
       |    AND b.gx = a.gx + 1
       |  WHERE a.gx < 8),
       |fp AS MATERIALIZED (
       |  SELECT img_id AS doc_id,
       |         CAST(SUM(CASE WHEN bit = 0 THEN 0
       |                       WHEN k = 63 THEN CAST(-9223372036854775808 AS BIGINT)
       |                       ELSE (CAST(1 AS BIGINT) << CAST(k AS INTEGER)) END) AS BIGINT) AS dhash
       |  FROM bits GROUP BY img_id)""".stripMargin

  /** Audio envelope-fingerprint CTE chain over the WAV corpus + planted
   * noise twins: 65 nearest-neighbor |PCM| samples, bit f set when
   * sample f out-louds sample f+1 — the exact twin of
   * Multimodal.decodeWavAfp over the closed-form wavFpFixture samples
   * (squared mix v = (t² % 65536) − 32768, t = src·131 + i·17 + 251;
   * twins add +1500 wrapping on every 5th sample). Ends at
   * `fp(doc_id, afp AS dhash)` so [[dhashPairsCte]] composes unchanged. */
  private lazy val afpCtes: String =
    """WITH auds AS (
      |  SELECT doc_id AS aud_id, doc_id AS src, 0 AS pert FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000, doc_id, 1 FROM documents WHERE doc_id % 20 = 0),
      |adim AS (SELECT aud_id, src, pert, CAST(200 + src % 56 AS BIGINT) AS n FROM auds),
      |apt AS (
      |  SELECT aud_id, src, pert, f.f AS f, (f.f * n) // 65 AS i
      |  FROM adim, unnest(generate_series(0, 64)) AS f(f)),
      |aval AS MATERIALIZED (
      |  SELECT aud_id, f,
      |         abs(CASE WHEN pert = 1 AND i % 5 = 0
      |                  THEN (((t * t) % 65536 + 1500) % 65536) - 32768
      |                  ELSE ((t * t) % 65536) - 32768 END) AS e
      |  FROM (SELECT aud_id, f, pert, i, src * 131 + i * 17 + 251 AS t FROM apt)),
      |abit AS (
      |  SELECT a.aud_id, a.f AS k,
      |         CASE WHEN a.e > b.e THEN 1 ELSE 0 END AS bit
      |  FROM aval a JOIN aval b ON a.aud_id = b.aud_id AND b.f = a.f + 1
      |  WHERE a.f < 64),
      |fp AS MATERIALIZED (
      |  SELECT aud_id AS doc_id,
      |         CAST(SUM(CASE WHEN bit = 0 THEN 0
      |                       WHEN k = 63 THEN CAST(-9223372036854775808 AS BIGINT)
      |                       ELSE (CAST(1 AS BIGINT) << CAST(k AS INTEGER)) END) AS BIGINT) AS dhash
      |  FROM abit GROUP BY aud_id)""".stripMargin

  /** Closed-form dHash CTE chain for the JPEG corpus + re-encoded twins:
   * the fixture is 9x8 flat blocks whose luminance
   * v = 40 + 60·(2·((t²//7) % 2) + gx%2), t = src·131 + (gy·9+gx)·17
   * + 251, with >= 60-level margins — lossy q90 (and the q75 re-encode)
   * never moves a decoded level 30+, so the REAL-codec dHash equals this
   * closed form bit-for-bit. Ends at `fp(doc_id, dhash)`. */
  private lazy val jpegDhashCtes: String =
    """WITH imgs AS (
      |  SELECT doc_id AS img_id, doc_id AS src FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000, doc_id FROM documents WHERE doc_id % 20 = 0),
      |cells AS (
      |  SELECT img_id, gy.gy AS gy, gx.gx AS gx,
      |         src * 131 + (gy.gy * 9 + gx.gx) * 17 + 251 AS t
      |  FROM imgs, unnest(generate_series(0, 7)) AS gy(gy),
      |       unnest(generate_series(0, 8)) AS gx(gx)),
      |lv AS MATERIALIZED (
      |  SELECT img_id, gy, gx,
      |         40 + 60 * (2 * ((t * t // 7) % 499979 % 2) + gx % 2) AS l
      |  FROM cells),
      |jbits AS (
      |  SELECT a.img_id, a.gy * 8 + a.gx AS k,
      |         CASE WHEN a.l > b.l THEN 1 ELSE 0 END AS bit
      |  FROM lv a JOIN lv b ON a.img_id = b.img_id AND a.gy = b.gy
      |    AND b.gx = a.gx + 1
      |  WHERE a.gx < 8),
      |fp AS MATERIALIZED (
      |  SELECT img_id AS doc_id,
      |         CAST(SUM(CASE WHEN bit = 0 THEN 0
      |                       WHEN k = 63 THEN CAST(-9223372036854775808 AS BIGINT)
      |                       ELSE (CAST(1 AS BIGINT) << CAST(k AS INTEGER)) END) AS BIGINT) AS dhash
      |  FROM jbits GROUP BY img_id)""".stripMargin

  /** Banded Hamming pair CTE over [[dhashCtes]]' `fp` (4x16-bit bands,
   * dist <= 6) — the simhash-pairs idiom on the image fingerprints. */
  /** Closed-form PCM16 sample of the wavFpFixture clip at index `j`
   * (src = base doc id): v = (t² mod 65536) − 32768, t = src·131 +
   * j·17 + 251 — the shared kernel of the envelope and spectral audio
   * chains. */
  private def wavX(j: String): String = {
    val t = s"(src * 131 + ($j) * 17 + 251)"
    s"((($t * $t) % 65536) - 32768)"
  }

  /** The 2-tap low-pass re-encode twin of [[wavX]]: y_j = floor((x_j +
   * x_{min(j+1,n-1)})/2) with the +65536 shift keeping the numerator
   * non-negative (truncating // IS floor) — Multimodal.reencodeWav. */
  private def wavY(j: String): String =
    s"((${wavX(j)} + ${wavX(s"least(($j) + 1, n - 1)")} + 65536) // 2 - 32768)"

  /** Spectral-fingerprint CTE chain over the WAV corpus + RE-ENCODED
   * (2-tap low-pass) twins: 3 Hann-windowed frames of L=n//2 at 50%
   * overlap, 33 quantized-DFT band energies per frame (coefficients
   * floor(64·(1−cos(2πi/L))·trig(2π((k·i) mod L)/L) + 0.5) — exact
   * BIGINTs), bit (f−1)·32+b set when the exact HUGEINT cross product
   * of energies says the band gradient rose across the frame
   * transition — the twin of Multimodal.decodeWavSfp. Ends at
   * `sfpt(doc_id, sfp)`. */
  private lazy val sfpCtes: String = {
    def coef(trig: String): String =
      s"CAST(floor(64 * (1 - cos(2 * pi() * i / L)) * " +
        s"$trig(2 * pi() * (((b.b + 1) * i) % L) / L) + 0.5) AS BIGINT)"
    s"""WITH sauds AS (
       |  SELECT doc_id AS aud_id, doc_id AS src, 0 AS pert FROM documents
       |  UNION ALL
       |  SELECT doc_id + 10000000, doc_id, 1 FROM documents WHERE doc_id % 20 = 0),
       |sdim AS (SELECT aud_id, src, pert, CAST(200 + src % 56 AS BIGINT) AS n FROM sauds),
       |sfrm AS (
       |  SELECT aud_id, src, pert, n, n // 2 AS L, f.f AS f,
       |         CASE f.f WHEN 0 THEN 0 WHEN 1 THEN n // 4 ELSE n - n // 2 END AS st
       |  FROM sdim, unnest(generate_series(0, 2)) AS f(f)),
       |sval AS MATERIALIZED (
       |  SELECT aud_id, f, L, i.i AS i,
       |         CASE WHEN pert = 0 THEN ${wavX("st + i.i")}
       |              ELSE ${wavY("st + i.i")} END AS s
       |  FROM sfrm, unnest(generate_series(0, L - 1)) AS i(i)),
       |sbs AS MATERIALIZED (
       |  SELECT aud_id, f, b.b AS b,
       |         SUM(s * ${coef("cos")}) AS c,
       |         SUM(s * ${coef("sin")}) AS q
       |  FROM sval, (SELECT unnest(generate_series(0, 32)) AS b) b
       |  GROUP BY aud_id, f, b.b),
       |sen AS MATERIALIZED (SELECT aud_id, f, b, c * c + q * q AS e FROM sbs),
       |sbit AS (
       |  SELECT e1.aud_id, (e1.f - 1) * 32 + e1.b AS k,
       |         CASE WHEN CAST(e1.e AS HUGEINT) * e0n.e > CAST(e1n.e AS HUGEINT) * e0.e
       |              THEN 1 ELSE 0 END AS bit
       |  FROM sen e1
       |  JOIN sen e0  ON e0.aud_id = e1.aud_id AND e0.f = e1.f - 1 AND e0.b = e1.b
       |  JOIN sen e1n ON e1n.aud_id = e1.aud_id AND e1n.f = e1.f AND e1n.b = e1.b + 1
       |  JOIN sen e0n ON e0n.aud_id = e1.aud_id AND e0n.f = e1.f - 1 AND e0n.b = e1.b + 1
       |  WHERE e1.f >= 1 AND e1.b < 32),
       |sfpt AS MATERIALIZED (
       |  SELECT aud_id AS doc_id,
       |         CAST(SUM(CASE WHEN bit = 0 THEN 0
       |                       WHEN k = 63 THEN CAST(-9223372036854775808 AS BIGINT)
       |                       ELSE (CAST(1 AS BIGINT) << CAST(k AS INTEGER)) END) AS BIGINT) AS sfp
       |  FROM sbit GROUP BY aud_id)""".stripMargin
  }

  /** Envelope fingerprints of the SAME re-encoded corpus (base clips +
   * 2-tap low-pass twins) — the degraded side of the spectral recall
   * grade. Ends at `efp(doc_id, afp)`. */
  private lazy val afpReencCtes: String =
    s"""eauds AS (
       |  SELECT doc_id AS aud_id, doc_id AS src, 0 AS pert FROM documents
       |  UNION ALL
       |  SELECT doc_id + 10000000, doc_id, 1 FROM documents WHERE doc_id % 20 = 0),
       |edim AS (SELECT aud_id, src, pert, CAST(200 + src % 56 AS BIGINT) AS n FROM eauds),
       |ept AS (
       |  SELECT aud_id, src, pert, n, f.f AS f, (f.f * n) // 65 AS i
       |  FROM edim, unnest(generate_series(0, 64)) AS f(f)),
       |eev AS MATERIALIZED (
       |  SELECT aud_id, f,
       |         abs(CASE WHEN pert = 0 THEN ${wavX("i")}
       |                  ELSE ${wavY("i")} END) AS e
       |  FROM ept),
       |ebit AS (
       |  SELECT a.aud_id, a.f AS k,
       |         CASE WHEN a.e > b.e THEN 1 ELSE 0 END AS bit
       |  FROM eev a JOIN eev b ON a.aud_id = b.aud_id AND b.f = a.f + 1
       |  WHERE a.f < 64),
       |efp AS MATERIALIZED (
       |  SELECT aud_id AS doc_id,
       |         CAST(SUM(CASE WHEN bit = 0 THEN 0
       |                       WHEN k = 63 THEN CAST(-9223372036854775808 AS BIGINT)
       |                       ELSE (CAST(1 AS BIGINT) << CAST(k AS INTEGER)) END) AS BIGINT) AS afp
       |  FROM ebit GROUP BY aud_id)""".stripMargin

  /** Banded Hamming pair CTEs over an fp table `fpT(doc_id, hcol)` —
   * the dhashPairsCte shape with nameable inputs so two fingerprint
   * families can pair up inside ONE query. Emits `<out>b` and `<out>`. */
  private def bandPairCtes(fpT: String, hcol: String, out: String): String =
    s"""${out}b AS (
       |  SELECT doc_id, $hcol AS h, b.b AS band,
       |         ($hcol >> CAST(b.b * 16 AS INTEGER)) & 65535 AS band_val
       |  FROM $fpT, (SELECT unnest(generate_series(0, 3)) AS b) b),
       |$out AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM ${out}b a JOIN ${out}b b
       |    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.h, b.h)) <= 6)""".stripMargin

  private lazy val dhashPairsCte: String =
    """banded AS (
      |  SELECT doc_id, dhash, b.b AS band,
      |         (dhash >> CAST(b.b * 16 AS INTEGER)) & 65535 AS band_val
      |  FROM fp, (SELECT unnest(generate_series(0, 3)) AS b) b),
      |pairs AS MATERIALIZED (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
      |         bit_count(xor(a.dhash, b.dhash)) AS hamming
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
      |  WHERE bit_count(xor(a.dhash, b.dhash)) <= 6)""".stripMargin

  /** Shared doc-shingle prelude: normalized tokens and distinct 3-gram
   * shingles with their hashes. */
  private val shinglePrelude =
    s"""WITH dn AS (SELECT doc_id, ${norm("text")} AS nt FROM documents),
       |dt AS (SELECT doc_id, list_filter(string_split(nt, ' '), t -> length(t) > 0) AS toks FROM dn),
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |         array_to_string(list_slice(toks, CAST(i AS INTEGER), CAST(i AS INTEGER) + 2), ' ') AS shingle
       |  FROM dt, unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS g(i)),
       |shh AS (SELECT doc_id, ${strHash("shingle")} AS x FROM sh),
       |""".stripMargin

  /** MinHash signatures CTE (k=16): twin of Dedup.minhashSignatures. */
  private val sigCte =
    s"""sigs AS (
       |  SELECT doc_id, i.i AS i,
       |         MIN(((1103515245 * (i.i + 1) + 12345) % $Mod * x + (2654435761 * (i.i + 1)) % $Mod) % $Mod) AS sig
       |  FROM shh, (SELECT unnest(generate_series(0, 15)) AS i) i
       |  GROUP BY doc_id, i.i),
       |""".stripMargin

  /** Resample/forward-fill twin: same spine, same IGNORE NULLS LOCF. */
  private val ffillSql: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour,
      |         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS vc
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1 FROM events),
      |sp AS (SELECT t.event_type, x.x AS hour
      |       FROM (SELECT DISTINCT event_type FROM events) t, b,
      |            unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS x(x))
      |SELECT sp.event_type, sp.hour,
      |       CAST(COALESCE(last_value(hourly.vc IGNORE NULLS) OVER (
      |              PARTITION BY sp.event_type ORDER BY sp.hour
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS DOUBLE) / 100.0 AS value_ffill,
      |       CAST(hourly.vc IS NULL AS INT) AS was_gap
      |FROM sp LEFT JOIN hourly
      |  ON sp.event_type = hourly.event_type AND sp.hour = hourly.hour""".stripMargin

  /** Heap-aggregate twin (graft_topk): the k-largest multiset per group
   * restated as a window rank. Shared by the batch aggregate and its
   * streaming complete-mode drain. */
  private val topkSql: String =
    """WITH s AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc FROM events),
      |r AS (SELECT event_type, vc,
      |        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY vc DESC) AS rn
      |      FROM s)
      |SELECT event_type, CAST(rn - 1 AS INT) AS pos, vc AS top_value_cents
      |FROM r WHERE rn <= 5""".stripMargin

  /** Custom-AsOfJoinExec twin via DuckDB's NATIVE ASOF LEFT JOIN (an
   * independent implementation, not a restatement); clicks pre-deduped
   * to max event_id per (user, ts) to pin the same tie rule the exec's
   * (key, time, tie-break) ordering guarantees. Shared verbatim by the
   * batch (`evt_asof_custom`) and streaming (`evt_asof_stream`) drives. */
  private val asofCustomSql: String =
    """WITH c AS (SELECT user_id AS c_uid, ts AS c_ts, MAX(event_id) AS c_id
      |           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      |p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
      |       COALESCE(c.c_id, -1) AS click_id,
      |       COALESCE(c.c_ts, TIMESTAMP '1970-01-01 00:00:00') AS click_ts
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.c_uid AND p.ts >= c.c_ts""".stripMargin

  /** Transitive closure over the MinHash-LSH band graph, ending in
   * `cl(doc_id, cluster_rep)`. ONE definition shared by dedup_clusters /
   * dedup_survivors / dedup_golden / dedup_cluster_split /
   * txt_removal_audit so the banding rule and the closure can never
   * desynchronize between those oracles (requires WITH RECURSIVE and the
   * sigCte prefix). */
  private lazy val ccCtes: String =
    s"""bk AS (
       |  SELECT doc_id, CAST(i // 4 AS INTEGER) AS band,
       |         array_to_string(list_sort(list(CAST(i AS VARCHAR) || ':' || CAST(sig AS VARCHAR))), ',') AS band_key
       |  FROM sigs GROUP BY doc_id, CAST(i // 4 AS INTEGER)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM bk a JOIN bk b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |edges AS (SELECT d1 AS u, d2 AS v FROM cand UNION ALL SELECT d2, d1 FROM cand),
       |reach(a, b) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u),
       |cl AS (SELECT a AS doc_id, MIN(b) AS cluster_rep FROM reach GROUP BY a),
       |""".stripMargin

  /** Winnowing fingerprint CTE `fp(doc_id, pos, gram_hash)` — twin of
   * TextAnalysis.winnow at its production defaults (constants derived from
   * TextAnalysis.WinnowK/WinnowW so engine and oracle cannot drift):
   * (h+1)*2^31 - i encoded windowed MIN, exact integer decode, full
   * windows only. */
  private val winnowCte = {
    val k = graft.text.TextAnalysis.WinnowK
    val w = graft.text.TextAnalysis.WinnowW
    s"""WITH dn AS (SELECT doc_id, ${norm("text")} AS nt FROM documents),
       |g AS (
       |  SELECT doc_id, i.i AS i,
       |         ${strHash(s"substr(nt, CAST(i.i AS INTEGER), $k)")} AS h,
       |         (length(nt) - ${k - 1}) AS ng
       |  FROM dn, unnest(generate_series(1, greatest(length(nt) - ${k - 1}, 0))) AS i(i)),
       |win AS (
       |  SELECT doc_id, i, ng,
       |         MIN((h + 1) * 2147483648 - i) OVER (
       |           PARTITION BY doc_id ORDER BY i
       |           ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS m
       |  FROM g),
       |fp AS (
       |  SELECT DISTINCT doc_id,
       |         (m // 2147483648 + 1) * 2147483648 - m AS pos,
       |         m // 2147483648 AS gram_hash
       |  FROM win WHERE i <= ng - ${w - 1}),
       |""".stripMargin
  }

  /** SQL literal list from the engine's own stopword set — single source
   * of truth (graft.text.TextAnalysis.EnglishStopwords). */
  private lazy val stop: String =
    graft.text.TextAnalysis.EnglishStopwords.map("'" + _ + "'").mkString("[", ",", "]")

  /** Per-language marker-hit columns and the argmax CASE, derived from
   * graft.text.TextAnalysis.LangMarkers so the lists cannot drift. */
  private lazy val langHitExprs: String =
    graft.text.TextAnalysis.LangMarkers.map { case (l, ws) =>
      val lst = ws.map("'" + _ + "'").mkString("[", ",", "]")
      s"    len(list_filter(t.lws_toks, x -> list_contains($lst, x))) AS s_$l"
    }.mkString(",\n")

  private lazy val langCase: String = {
    val all = graft.text.TextAnalysis.LangMarkers.map("s_" + _._1).mkString(", ")
    val whens = graft.text.TextAnalysis.LangMarkers.map { case (l, _) =>
      s"       WHEN s_$l = greatest($all) AND s_$l > 0 THEN '$l'"
    }.mkString("\n")
    s"  CASE\n$whens\n       ELSE 'und' END AS lang_id"
  }

  /** txt_analysis SQL, shared by the curation oracle. */
  /** Per-language p25 quality gate twin — shared by the batch
   * (`txt_quality_filter`) and streaming (`txt_quality_filter_stream`)
   * drives. */
  private lazy val qualityFilterSql: String =
    s"""WITH q AS (
       |  SELECT d.doc_id, d.lang, ta.quality
       |  FROM ( ${txtAnalysisSql} ) ta JOIN documents d USING (doc_id)),
       |th AS (
       |  SELECT lang, round(quantile_cont(quality, 0.25), 9) AS q_threshold
       |  FROM q GROUP BY lang)
       |SELECT q.doc_id, q.lang, q.quality, th.q_threshold
       |FROM q JOIN th USING (lang)
       |WHERE q.quality >= th.q_threshold""".stripMargin

  private lazy val txtAnalysisSql: String =
      s"""WITH base AS (
         |  SELECT doc_id, text, trim(text) AS tt, lower(text) AS lt FROM documents),
         |toks AS (
         |  SELECT doc_id,
         |         list_filter(regexp_split_to_array(tt, '\\s+'), t -> length(t) > 0) AS ws_toks,
         |         list_filter(regexp_split_to_array(lower(tt), '\\s+'), t -> length(t) > 0) AS lws_toks,
         |         list_filter(regexp_split_to_array(lt, '[^a-z]+'), t -> length(t) > 0) AS alpha_runs
         |  FROM base),
         |m AS (
         |  SELECT b.doc_id,
         |    CASE WHEN length(b.tt) = 0 THEN 0 ELSE len(regexp_split_to_array(b.tt, '\\s+')) END AS n_tokens,
         |    ${dsum("list_transform(t.alpha_runs, x -> CAST(CAST(ceil(CAST(length(x) AS DOUBLE) / 4.0) AS BIGINT) AS DOUBLE))")}
         |      + length(regexp_replace(b.text, '[a-zA-Z\\s]', '', 'g')) AS n_bpe_d,
         |    CASE WHEN length(regexp_replace(b.text, '\\s', '', 'g')) = 0 THEN 0.0
         |         ELSE CAST(length(regexp_replace(b.text, '[^!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE)
         |              / CAST(length(regexp_replace(b.text, '\\s', '', 'g')) AS DOUBLE) END AS punct_ratio_r,
         |    CASE WHEN len(t.lws_toks) = 0 THEN 0.0
         |         ELSE CAST(len(list_filter(t.lws_toks, x -> list_contains($stop, x))) AS DOUBLE)
         |              / CAST(len(t.lws_toks) AS DOUBLE) END AS stopword_ratio_r,
         |    CASE WHEN len(t.ws_toks) = 0 THEN 0.0
         |         ELSE ${dsum("list_transform(t.ws_toks, x -> CAST(length(x) AS DOUBLE))")}
         |              / CAST(len(t.ws_toks) AS DOUBLE) END AS mean_token_len_r,
         |$langHitExprs,
         |    length(b.text) AS n_chars_b,
         |    ${strHash("lower(trim(b.text))")} AS fingerprint
         |  FROM base b JOIN toks t USING (doc_id))
         |SELECT doc_id,
         |  n_tokens,
         |  CAST(n_bpe_d AS BIGINT) AS n_bpe_tokens,
         |  round(punct_ratio_r, 9) AS punct_ratio,
         |  round(stopword_ratio_r, 9) AS stopword_ratio,
         |  round(mean_token_len_r, 9) AS mean_token_len,
         |  round((least(CAST(n_chars_b AS DOUBLE) / 500.0, 1.0)
         |        + least(stopword_ratio_r * 5.0, 1.0)
         |        + greatest(1.0 - punct_ratio_r * 4.0, 0.0)) / 3.0, 9) AS quality,
         |$langCase,
         |  fingerprint
         |FROM m""".stripMargin

  /** Native session_window twin (shared by the batch query and its
   * streaming drain): touching windows fuse (split only on a strictly
   * greater gap, spec-pinned), session_end = last event + gap. */
  private val sessionWindowSql =
    """WITH g AS (
      |  SELECT user_id, ts, event_id, value,
      |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |flags AS (
      |  SELECT *, CASE WHEN prev_ts IS NULL
      |                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_session
      |  FROM g),
      |seq AS (
      |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flags)
      |SELECT user_id, MIN(ts) AS session_start,
      |       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
      |       CAST(COUNT(*) AS BIGINT) AS n_events,
      |       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS value_sum
      |FROM seq GROUP BY user_id, sid""".stripMargin

  def all: Map[String, String] = Map(
    "txt_analysis" -> txtAnalysisSql,

    "txt_curate" ->
      s"""SELECT ta.doc_id, ta.n_tokens, ta.quality, ta.lang_id
         |FROM ( $txtAnalysisSql ) ta
         |JOIN (
         |  WITH h AS (SELECT doc_id, ${strHash(norm("text"))} AS h FROM documents),
         |  reps AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY h) AS rep FROM h)
         |  SELECT doc_id FROM reps WHERE doc_id = rep
         |) surv USING (doc_id)
         |WHERE ta.quality >= 0.5 AND ta.lang_id = 'en'""".stripMargin,

    "evt_dedup_stream" ->
      "SELECT DISTINCT user_id, event_type FROM events",

    // stream-stream interval join drained in one batch == the batch join
    "evt_funnel_join_stream" ->
      """SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND a.event_type = 'click' AND b.event_type = 'purchase'
        | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 60 MINUTE""".stripMargin,

    // heap-aggregate twin: the k-largest multiset per group is what the
    // bounded min-heap retains, restated as a window rank
    // OHLC twin: DuckDB's ordered FIRST/LAST mirror min_by/max_by over
    // the same composite (ts, event_id) order
    "evt_ohlc_daily" ->
      """WITH s AS (SELECT event_type, CAST(ts AS DATE) AS day, ts, event_id,
        |                  CAST(round(value * 100) AS BIGINT) AS vc
        |           FROM events)
        |SELECT event_type, day,
        |       CAST(FIRST(vc ORDER BY ts, event_id) AS DOUBLE) / 100.0 AS open,
        |       CAST(MAX(vc) AS DOUBLE) / 100.0 AS high,
        |       CAST(MIN(vc) AS DOUBLE) / 100.0 AS low,
        |       CAST(LAST(vc ORDER BY ts, event_id) AS DOUBLE) / 100.0 AS close,
        |       CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM s GROUP BY event_type, day""".stripMargin,

    "evt_ffill_hourly" -> ffillSql,

    // interpolation twin: same spine, both ignore-nulls neighbor windows,
    // lerp written operand-for-operand like the engine side
    "evt_interp_hourly" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS vc
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1 FROM events),
        |sp AS (SELECT t.event_type, x.x AS hour
        |       FROM (SELECT DISTINCT event_type FROM events) t, b,
        |            unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS x(x)),
        |j AS (SELECT sp.event_type, sp.hour, hourly.vc
        |      FROM sp LEFT JOIN hourly
        |        ON sp.event_type = hourly.event_type AND sp.hour = hourly.hour),
        |w AS (SELECT event_type, hour, vc,
        |        last_value(vc IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hour
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |        first_value(vc IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hour
        |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |        last_value(CASE WHEN vc IS NOT NULL THEN hour END IGNORE NULLS)
        |          OVER (PARTITION BY event_type ORDER BY hour
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
        |        first_value(CASE WHEN vc IS NOT NULL THEN hour END IGNORE NULLS)
        |          OVER (PARTITION BY event_type ORDER BY hour
        |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
        |      FROM j)
        |SELECT event_type, hour,
        |       round(CASE WHEN vc IS NOT NULL THEN CAST(vc AS DOUBLE)
        |                  WHEN pv IS NULL THEN CAST(nv AS DOUBLE)
        |                  WHEN nv IS NULL THEN CAST(pv AS DOUBLE)
        |                  ELSE CAST(pv AS DOUBLE) + CAST(nv - pv AS DOUBLE) *
        |                       (CAST(epoch(hour) - epoch(ph) AS DOUBLE)
        |                        / CAST(epoch(nh) - epoch(ph) AS DOUBLE))
        |             END / 100.0, 9) AS value_interp,
        |       CAST(vc IS NULL AS INT) AS was_gap
        |FROM w""".stripMargin,

    // cross-correlation twin: identical integer moments, identical final
    // float expression
    "evt_xcorr_lags" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |c AS (SELECT CAST(epoch(hour) AS BIGINT) AS ch, v AS x FROM hourly WHERE event_type = 'click'),
        |p AS (SELECT CAST(epoch(hour) AS BIGINT) AS ph, v AS y FROM hourly WHERE event_type = 'purchase'),
        |l AS (SELECT CAST(x AS BIGINT) AS lag FROM unnest(generate_series(0, 3)) AS u(x)),
        |j AS (SELECT l.lag, c.x, p.y
        |      FROM c CROSS JOIN l JOIN p ON p.ph = c.ch + l.lag * 3600),
        |m AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |        CAST(SUM(x * y) AS BIGINT) AS sxy,
        |        CAST(SUM(x * x) AS BIGINT) AS sxx,
        |        CAST(SUM(y * y) AS BIGINT) AS syy
        |      FROM j GROUP BY lag)
        |SELECT lag, n,
        |       round(CAST(n * sxy - sx * sy AS DOUBLE)
        |             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 9) AS pearson
        |FROM m""".stripMargin,

    // vocabulary-overlap twin: same normalization as every token-level
    // oracle, same exact-count Jaccard
    "txt_vocab_overlap" ->
      (s"""WITH st AS (
         |  SELECT DISTINCT source, t AS token
         |  FROM (SELECT source, ${norm("text")} AS nt FROM documents),
         |       unnest(list_filter(string_split(nt, ' '), x -> length(x) > 0)) AS u(t)),
         |sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS z FROM st GROUP BY source),
         |cm AS (SELECT a.source AS s1, b.source AS s2, CAST(COUNT(*) AS BIGINT) AS n_common
         |       FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
         |       GROUP BY 1, 2)
         |SELECT s1, s2, n_common,
         |       round(CAST(n_common AS DOUBLE) / CAST(z1.z + z2.z - n_common AS DOUBLE), 9) AS jaccard
         |FROM cm JOIN sz z1 ON cm.s1 = z1.source JOIN sz z2 ON cm.s2 = z2.source""".stripMargin),

    // trimmed-mean twin: quantile_cont bounds, identical band filter and
    // mean expression
    "evt_trimmed_mean" ->
      """WITH b AS (
        |  SELECT event_type AS bt, quantile_cont(value, 0.05) AS lo,
        |         quantile_cont(value, 0.95) AS hi
        |  FROM events GROUP BY event_type)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |       round(CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*), 9) AS trimmed_mean
        |FROM events JOIN b ON event_type = bt
        |WHERE value >= lo AND value <= hi
        |GROUP BY event_type""".stripMargin,

    // Benford twin: ln ratio restated identically; shares round to 9
    "evt_benford" ->
      """WITH s AS (SELECT CAST(round(value * 100) AS BIGINT) AS vc FROM events
        |           WHERE CAST(round(value * 100) AS BIGINT) > 0),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM s),
        |g AS (SELECT CAST(substr(CAST(vc AS VARCHAR), 1, 1) AS INT) AS digit,
        |             CAST(COUNT(*) AS BIGINT) AS n
        |      FROM s GROUP BY 1)
        |SELECT digit, n,
        |       round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 9) AS observed,
        |       round(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0), 9) AS expected
        |FROM g, t""".stripMargin,

    "evt_topk_agg" -> topkSql,

    // same twin for the streaming drain: the k-largest multiset per type
    // is invariant to micro-batch splits (heap state merges between
    // triggers through the state store)
    "evt_topk_stream" -> topkSql,

    "evt_asof_custom" -> asofCustomSql,

    // the streaming drive of the same operator is batch-split invariant
    // (stateless per-row enrichment against a standing reference), so it
    // shares the custom exec's DuckDB-native-ASOF twin verbatim
    "evt_asof_stream" -> asofCustomSql,

    // forward direction: DuckDB's ASOF with the reversed inequality;
    // clicks pre-deduped to MIN event_id per (user, ts) — forward's tie
    // rule is the FIRST row in (time, tie-break) order
    "evt_asof_fwd" -> ErOracles.materializeCtes(
      """WITH c AS (SELECT user_id AS c_uid, ts AS c_ts, MIN(event_id) AS c_id
        |           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
        |       COALESCE(c.c_id, -1) AS click_id,
        |       COALESCE(c.c_ts, TIMESTAMP '1970-01-01 00:00:00') AS click_ts
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.c_uid AND p.ts <= c.c_ts""".stripMargin),

    // backward + 1 h tolerance: native ASOF picks the candidate, the
    // interval filter nulls it when the gap exceeds the tolerance —
    // exactly the exec's `lt - candTime <= tol` (inclusive, micros)
    "evt_asof_tol" -> ErOracles.materializeCtes(
      """WITH c AS (SELECT user_id AS c_uid, ts AS c_ts, MAX(event_id) AS c_id
        |           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
        |       CASE WHEN c.c_ts IS NOT NULL AND p.ts - c.c_ts <= INTERVAL 1 HOUR
        |            THEN c.c_id ELSE -1 END AS click_id,
        |       CASE WHEN c.c_ts IS NOT NULL AND p.ts - c.c_ts <= INTERVAL 1 HOUR
        |            THEN c.c_ts ELSE TIMESTAMP '1970-01-01 00:00:00' END AS click_ts
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.c_uid AND p.ts >= c.c_ts""".stripMargin),

    // nearest ±2 h: both ASOF directions composed, smaller interval gap
    // wins, equal gaps resolve BACKWARD (the exec's tie rule); each
    // direction keeps its own tie-break dedup (backward MAX, forward MIN)
    "evt_asof_nearest" -> ErOracles.materializeCtes(
      """WITH cb AS (SELECT user_id AS c_uid, ts AS c_ts, MAX(event_id) AS c_id
        |            FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |cf AS (SELECT user_id AS f_uid, ts AS f_ts, MIN(event_id) AS f_id
        |       FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
        |b AS (SELECT p.event_id, p.user_id, p.ts, cb.c_ts, cb.c_id
        |      FROM p ASOF LEFT JOIN cb ON p.user_id = cb.c_uid AND p.ts >= cb.c_ts),
        |f AS (SELECT p.event_id AS f_eid, cf.f_ts, cf.f_id
        |      FROM p ASOF LEFT JOIN cf ON p.user_id = cf.f_uid AND p.ts <= cf.f_ts),
        |j AS (SELECT b.event_id, b.user_id, b.ts, b.c_ts, b.c_id, f.f_ts, f.f_id,
        |             (b.c_ts IS NOT NULL AND b.ts - b.c_ts <= INTERVAL 2 HOUR) AS back_ok,
        |             (f.f_ts IS NOT NULL AND f.f_ts - b.ts <= INTERVAL 2 HOUR) AS fwd_ok
        |      FROM b JOIN f ON b.event_id = f.f_eid)
        |SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
        |       CASE WHEN back_ok AND (NOT fwd_ok OR ts - c_ts <= f_ts - ts) THEN c_id
        |            WHEN fwd_ok THEN f_id ELSE -1 END AS click_id,
        |       CASE WHEN back_ok AND (NOT fwd_ok OR ts - c_ts <= f_ts - ts) THEN c_ts
        |            WHEN fwd_ok THEN f_ts
        |            ELSE TIMESTAMP '1970-01-01 00:00:00' END AS click_ts
        |FROM j""".stripMargin),

    "evt_asof_join" ->
      """WITH t AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_left
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |w AS (
        |  SELECT *, MAX(CASE WHEN is_left = 1 THEN ts END) OVER (
        |     PARTITION BY user_id ORDER BY ts ASC, is_left DESC, event_id ASC
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_left_ts
        |  FROM t),
        |r AS (SELECT user_id, event_id AS purchase_id, last_left_ts FROM w WHERE is_left = 0),
        |l AS (SELECT user_id, ts AS last_left_ts, MAX(event_id) AS click_id
        |      FROM t WHERE is_left = 1 GROUP BY 1, 2)
        |SELECT r.purchase_id, r.user_id,
        |       COALESCE(l.click_id, -1) AS click_id,
        |       COALESCE(r.last_left_ts, TIMESTAMP '1970-01-01 00:00:00') AS click_ts
        |FROM r LEFT JOIN l ON r.user_id = l.user_id AND r.last_left_ts = l.last_left_ts""".stripMargin,

    // histogram twin: identical pinned-order bin arithmetic
    // confusion-matrix twin: the same marker-hit argmax CASE as
    // txt_analysis (generated from the engine's marker lists)
    "txt_langid_eval" -> ErOracles.materializeCtes(
      s"""WITH base AS (SELECT doc_id, lang, trim(text) AS tt FROM documents),
         |t AS (SELECT doc_id, lang,
         |        list_filter(regexp_split_to_array(lower(tt), '\\s+'), x -> length(x) > 0) AS lws_toks
         |      FROM base),
         |sc AS (SELECT doc_id, lang,
         |$langHitExprs
         |       FROM t),
         |lid AS (SELECT doc_id, lang,
         |$langCase
         |        FROM sc)
         |SELECT lang, lang_id, CAST(COUNT(*) AS BIGINT) AS n
         |FROM lid GROUP BY lang, lang_id""".stripMargin),

    // 3-step funnel twin: identical per-user min cascade
    "evt_funnel3" -> ErOracles.materializeCtes(
      """WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
        |            WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS t2
        |       FROM events e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, MIN(e.ts) AS t3
        |       FROM events e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
        |SELECT CAST(1 AS BIGINT) AS step, CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM s2
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM s3""".stripMargin),

    // decile twin: same rows-before-value bin rule over the value counts
    "evt_value_deciles" -> ErOracles.materializeCtes(
      """WITH vc AS (SELECT event_type, value AS x, CAST(COUNT(*) AS BIGINT) AS cnt
        |            FROM events GROUP BY 1, 2),
        |nt AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n_g FROM vc GROUP BY 1),
        |bn AS (SELECT vc.event_type, x,
        |         LEAST(9, CAST(floor(CAST((SUM(cnt) OVER (PARTITION BY vc.event_type ORDER BY x
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt) * 10 AS DOUBLE)
        |                / CAST(n_g AS DOUBLE)) AS BIGINT)) AS bin
        |       FROM vc JOIN nt USING (event_type))
        |SELECT e.event_type, bin, CAST(COUNT(*) AS BIGINT) AS n,
        |       MIN(e.value) AS lo, MAX(e.value) AS hi,
        |       CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS value_sum
        |FROM events e JOIN bn ON e.event_type = bn.event_type AND e.value = bn.x
        |GROUP BY e.event_type, bin""".stripMargin),

    // Spearman twin: identical doubled average ranks from the value-count
    // prefix, identical BIGINT moments and double combination
    "evt_spearman" -> ErOracles.materializeCtes(
      """WITH ev AS (SELECT event_type, value, CAST(hour(ts) AS BIGINT) AS hr FROM events),
        |vcx AS (SELECT event_type, value AS x, CAST(COUNT(*) AS BIGINT) AS cnt FROM ev GROUP BY 1, 2),
        |rkx AS (SELECT event_type, x,
        |          2 * CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY x
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt AS BIGINT)
        |            + cnt + 1 AS rx
        |        FROM vcx),
        |vcy AS (SELECT event_type, hr AS y, CAST(COUNT(*) AS BIGINT) AS cnt FROM ev GROUP BY 1, 2),
        |rky AS (SELECT event_type, y,
        |          2 * CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY y
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt AS BIGINT)
        |            + cnt + 1 AS ry
        |        FROM vcy),
        |j AS (SELECT ev.event_type, rx, ry
        |      FROM ev JOIN rkx ON ev.event_type = rkx.event_type AND ev.value = rkx.x
        |              JOIN rky ON ev.event_type = rky.event_type AND ev.hr = rky.y),
        |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |        SUM(rx) AS sx, SUM(ry) AS sy,
        |        SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy, SUM(rx * ry) AS sxy
        |      FROM j GROUP BY event_type)
        |SELECT event_type, n,
        |       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |         / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |            * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9) AS rho
        |FROM m""".stripMargin),

    // Pearson twin: same BIGINT moment sums, same double combination order
    "evt_corr_hour" ->
      """WITH m AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |         SUM(x) AS sx, SUM(y) AS sy,
        |         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
        |  FROM (SELECT event_type,
        |               CAST(round(value * 100) AS BIGINT) AS x,
        |               CAST(hour(ts) AS BIGINT) AS y
        |        FROM events)
        |  GROUP BY event_type)
        |SELECT event_type, n,
        |       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |         / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |            * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9) AS corr
        |FROM m""".stripMargin,

    "evt_k_anon" ->
      """SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |       CAST(CASE WHEN COUNT(DISTINCT user_id) < 5 THEN 1 ELSE 0 END AS INT) AS at_risk
        |FROM events GROUP BY event_type, hour(ts)""".stripMargin,

    "evt_histogram" ->
      """WITH st AS (SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
        |            FROM events GROUP BY event_type)
        |SELECT e.event_type,
        |       CAST(LEAST(floor((value - lo) / ((hi - lo) / 20.0)), 19) AS BIGINT) AS bin,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       MIN(value) AS bin_min, MAX(value) AS bin_max
        |FROM events e JOIN st ON e.event_type = st.event_type
        |GROUP BY 1, 2""".stripMargin,

    // WAU twin: same contribution expansion
    "evt_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
        |wdays AS (SELECT DISTINCT day FROM ud),
        |contrib AS (
        |  SELECT DISTINCT user_id, g.d AS day
        |  FROM ud, unnest(generate_series(ud.day, ud.day + INTERVAL 6 DAY,
        |                                  INTERVAL 1 DAY)) AS g(d))
        |SELECT c.day, CAST(COUNT(*) AS BIGINT) AS wau
        |FROM contrib c
        |WHERE c.day IN (SELECT day FROM wdays)
        |GROUP BY c.day""".stripMargin,

    // burst twins: each error belongs to exactly two 1h/30-min-slide
    // windows (epoch-aligned starts f and f-1800s)
    "evt_burst" -> burstSql,
    "evt_burst_stream" -> burstSql,

    // interval-join twin: the naive SCD2 x SCD2 overlap theta join
    "evt_interval_join" ->
      """WITH ph AS (
        |  SELECT user_id, event_id, ts AS valid_from,
        |         COALESCE(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC),
        |                  TIMESTAMP '2024-02-01 00:00:00') AS valid_to
        |  FROM events WHERE event_type = 'purchase'),
        |ch AS (
        |  SELECT user_id, event_id, ts AS valid_from,
        |         COALESCE(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC),
        |                  TIMESTAMP '2024-02-01 00:00:00') AS valid_to
        |  FROM events WHERE event_type = 'click')
        |SELECT ph.user_id, ph.event_id AS p_event_id, ch.event_id AS c_event_id,
        |       GREATEST(ph.valid_from, ch.valid_from) AS ov_start,
        |       LEAST(ph.valid_to, ch.valid_to) AS ov_end
        |FROM ph JOIN ch ON ph.user_id = ch.user_id
        | AND ph.valid_from < ch.valid_to AND ch.valid_from < ph.valid_to""".stripMargin,

    // funnel-rate twin: the asof window pass, aggregated per day with the
    // 60-minute attribution gate
    "evt_funnel_rates" ->
      """WITH t AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_left
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |w AS (
        |  SELECT *, MAX(CASE WHEN is_left = 1 THEN ts END) OVER (
        |     PARTITION BY user_id ORDER BY ts ASC, is_left DESC, event_id ASC
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_left_ts
        |  FROM t),
        |r AS (SELECT user_id, ts AS purchase_ts, last_left_ts FROM w WHERE is_left = 0)
        |SELECT date_trunc('day', purchase_ts) AS day,
        |       CAST(COUNT(*) AS BIGINT) AS purchases,
        |       CAST(SUM(CASE WHEN last_left_ts IS NOT NULL
        |                      AND last_left_ts >= purchase_ts - INTERVAL 60 MINUTE
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS attributed,
        |       round(CAST(SUM(CASE WHEN last_left_ts IS NOT NULL
        |                           AND last_left_ts >= purchase_ts - INTERVAL 60 MINUTE
        |                          THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 9) AS conv_rate
        |FROM r GROUP BY 1""".stripMargin,

    // dropDuplicatesWithinWatermark over one AvailableNow batch: expiry
    // uses the previous batch's watermark (-inf), so the emitted key set
    // equals batch DISTINCT (EventStreams.dedupWithinWatermarkStreaming doc)
    "evt_dedup_watermark" ->
      "SELECT DISTINCT event_type, CAST(ts AS DATE) AS event_day FROM events",

    "dedup_exact" ->
      s"""WITH h AS (SELECT doc_id, ${strHash(norm("text"))} AS h FROM documents)
         |SELECT doc_id, MIN(doc_id) OVER (PARTITION BY h) AS rep_id FROM h""".stripMargin,

    "dedup_shingles" -> (shinglePrelude +
      "x AS (SELECT 1) SELECT doc_id, shingle FROM sh"),

    "dedup_jaccard" -> (shinglePrelude +
      s"""szs AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
         |freqok AS (
         |  SELECT * FROM (SELECT doc_id, shingle,
         |                 COUNT(*) OVER (PARTITION BY shingle) AS f FROM sh)
         |  WHERE f <= 1000),
         |cp AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(COUNT(*) AS BIGINT) AS common
         |  FROM freqok a JOIN freqok b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT d1, d2,
         |       round(CAST(common AS DOUBLE) / CAST(s1.sz + s2.sz - common AS DOUBLE), 9) AS jaccard
         |FROM cp JOIN szs s1 ON cp.d1 = s1.doc_id JOIN szs s2 ON cp.d2 = s2.doc_id
         |WHERE CAST(common AS DOUBLE) / CAST(s1.sz + s2.sz - common AS DOUBLE) >= 0.5""".stripMargin),

    // containment twin: the unordered co-occurrence count emitted in both
    // directions, each divided by its OWN source size — same frequency
    // cap as dedup_jaccard
    "dedup_containment" -> (shinglePrelude +
      """szs AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
        |freqok AS (
        |  SELECT * FROM (SELECT doc_id, shingle,
        |                 COUNT(*) OVER (PARTITION BY shingle) AS f FROM sh)
        |  WHERE f <= 1000),
        |cp AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(COUNT(*) AS BIGINT) AS common
        |  FROM freqok a JOIN freqok b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |dir AS (SELECT d1 AS src, d2 AS dst, common FROM cp
        |        UNION ALL SELECT d2, d1, common FROM cp)
        |SELECT src, dst,
        |       round(CAST(common AS DOUBLE) / CAST(sz AS DOUBLE), 9) AS containment
        |FROM dir JOIN szs ON dir.src = szs.doc_id
        |WHERE CAST(common AS DOUBLE) / CAST(sz AS DOUBLE) >= 0.8""".stripMargin),

    // leakage-matrix twin: the dedup_jaccard pair graph rolled up per
    // unordered source pair; mean Jaccard through the same 1e-9-grain
    // integer sum as the engine
    "dedup_leak_matrix" -> (shinglePrelude +
      """szs AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
        |freqok AS (
        |  SELECT * FROM (SELECT doc_id, shingle,
        |                 COUNT(*) OVER (PARTITION BY shingle) AS f FROM sh)
        |  WHERE f <= 1000),
        |cp AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(COUNT(*) AS BIGINT) AS common
        |  FROM freqok a JOIN freqok b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jp AS (
        |  SELECT d1, d2,
        |         round(CAST(common AS DOUBLE) / CAST(s1.sz + s2.sz - common AS DOUBLE), 9) AS jaccard
        |  FROM cp JOIN szs s1 ON cp.d1 = s1.doc_id JOIN szs s2 ON cp.d2 = s2.doc_id
        |  WHERE CAST(common AS DOUBLE) / CAST(s1.sz + s2.sz - common AS DOUBLE) >= 0.5),
        |m AS (
        |  SELECT LEAST(a.source, b.source) AS source_a,
        |         GREATEST(a.source, b.source) AS source_b,
        |         CAST(round(jaccard * 1000000000.0) AS BIGINT) AS j9
        |  FROM jp JOIN documents a ON jp.d1 = a.doc_id
        |          JOIN documents b ON jp.d2 = b.doc_id)
        |SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |       round(CAST(SUM(j9) AS DOUBLE) / COUNT(*) / 1000000000.0, 9) AS avg_jaccard
        |FROM m GROUP BY 1, 2""".stripMargin),

    // ppjoin twin: the NAIVE all-pairs exact Jaccard join, no prefix
    // logic and no frequency cap — the prefix filter is lossless, so
    // matching this naive result IS the losslessness proof
    "dedup_ppjoin" -> (shinglePrelude +
      """szs AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
        |pr AS (SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(COUNT(*) AS BIGINT) AS common
        |       FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |       GROUP BY 1, 2)
        |SELECT d1, d2,
        |       round(CAST(common AS DOUBLE) / CAST(s1.sz + s2.sz - common AS DOUBLE), 9) AS jaccard
        |FROM pr JOIN szs s1 ON pr.d1 = s1.doc_id JOIN szs s2 ON pr.d2 = s2.doc_id
        |WHERE CAST(common AS DOUBLE) / CAST(s1.sz + s2.sz - common AS DOUBLE) >= 0.5""".stripMargin),

    "dedup_minhash_sig" -> (shinglePrelude + sigCte +
      "x AS (SELECT 1) SELECT doc_id, i, sig FROM sigs"),

    "dedup_minhash_lsh" -> (shinglePrelude + sigCte +
      s"""bk AS (
         |  SELECT doc_id, CAST(i // 4 AS INTEGER) AS band,
         |         array_to_string(list_sort(list(CAST(i AS VARCHAR) || ':' || CAST(sig AS VARCHAR))), ',') AS band_key
         |  FROM sigs GROUP BY doc_id, CAST(i // 4 AS INTEGER)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM bk a JOIN bk b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id)
         |SELECT c.d1, c.d2,
         |       round(CAST(SUM(CASE WHEN s1.sig = s2.sig THEN 1 ELSE 0 END) AS DOUBLE) / 16, 9) AS est_jaccard
         |FROM cand c
         |JOIN sigs s1 ON c.d1 = s1.doc_id
         |JOIN sigs s2 ON c.d2 = s2.doc_id AND s1.i = s2.i
         |GROUP BY c.d1, c.d2""".stripMargin),

    // recall/precision twin: exact-pair and LSH-candidate CTEs composed
    // from the same shingle/signature preludes as their own oracles
    "dedup_lsh_recall" -> (shinglePrelude + sigCte +
      s"""szs AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
         |freqok AS (
         |  SELECT * FROM (SELECT doc_id, shingle,
         |                 COUNT(*) OVER (PARTITION BY shingle) AS f FROM sh)
         |  WHERE f <= 1000),
         |cp AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(COUNT(*) AS BIGINT) AS common
         |  FROM freqok a JOIN freqok b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |ex AS (SELECT d1, d2 FROM cp JOIN szs s1 ON cp.d1 = s1.doc_id
         |       JOIN szs s2 ON cp.d2 = s2.doc_id
         |       WHERE CAST(common AS DOUBLE) / CAST(s1.sz + s2.sz - common AS DOUBLE) >= 0.5),
         |bk AS (
         |  SELECT doc_id, CAST(i // 4 AS INTEGER) AS band,
         |         array_to_string(list_sort(list(CAST(i AS VARCHAR) || ':' || CAST(sig AS VARCHAR))), ',') AS band_key
         |  FROM sigs GROUP BY doc_id, CAST(i // 4 AS INTEGER)),
         |lshp AS (
         |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM bk a JOIN bk b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM ex),
         |nl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_lsh FROM lshp),
         |nh AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hit FROM ex
         |       WHERE EXISTS (SELECT 1 FROM lshp WHERE lshp.d1 = ex.d1 AND lshp.d2 = ex.d2))
         |SELECT n_exact, n_lsh, n_hit,
         |       round(CAST(n_hit AS DOUBLE) / CAST(n_exact AS DOUBLE), 9) AS recall,
         |       round(CAST(n_hit AS DOUBLE) / CAST(n_lsh AS DOUBLE), 9) AS precision
         |FROM ne CROSS JOIN nl CROSS JOIN nh""".stripMargin),

    // winnowing twin: identical (h+1)*2^31 - i encoding, windowed MIN over
    // CURRENT ROW..3 FOLLOWING, integer decode; full windows only
    "txt_winnow" -> (winnowCte +
      "x AS (SELECT 1) SELECT doc_id, pos, gram_hash FROM fp"),

    // locator twin: surviving pairs joined back to fingerprint positions
    "txt_winnow_locate" -> (winnowCte +
      s"""fpd AS (SELECT DISTINCT doc_id, gram_hash FROM fp),
         |fok AS (
         |  SELECT doc_id, gram_hash FROM (
         |    SELECT doc_id, gram_hash,
         |           COUNT(*) OVER (PARTITION BY gram_hash) AS f FROM fpd)
         |  WHERE f <= 1000),
         |pr AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2
         |  FROM fok a JOIN fok b
         |    ON a.gram_hash = b.gram_hash AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 4)
         |SELECT pr.d1, pr.d2, f1.gram_hash, f1.pos AS pos1, f2.pos AS pos2
         |FROM pr JOIN fp f1 ON pr.d1 = f1.doc_id
         |        JOIN fp f2 ON pr.d2 = f2.doc_id AND f1.gram_hash = f2.gram_hash""".stripMargin),

    // MOSS matching step over the same fingerprints: distinct hash sets,
    // frequency-capped inverted index, shared-count >= 4
    "txt_winnow_pairs" -> (winnowCte +
      s"""fpd AS (SELECT DISTINCT doc_id, gram_hash FROM fp),
         |fok AS (
         |  SELECT doc_id, gram_hash FROM (
         |    SELECT doc_id, gram_hash,
         |           COUNT(*) OVER (PARTITION BY gram_hash) AS f FROM fpd)
         |  WHERE f <= 1000)
         |SELECT a.doc_id AS d1, b.doc_id AS d2,
         |       CAST(COUNT(*) AS BIGINT) AS n_shared
         |FROM fok a JOIN fok b
         |  ON a.gram_hash = b.gram_hash AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING COUNT(*) >= 4""".stripMargin),

    // streaming LSH ingest twin: band values as position-ordered signature
    // strings (positions in a band are consecutive, so this equals the
    // engine's row-wise concat), new (id % 10 = 0) probing old (else)
    "dedup_lsh_stream" -> (shinglePrelude + sigCte +
      s"""bk AS (
         |  SELECT doc_id, CAST(i // 4 AS INTEGER) AS band,
         |         string_agg(CAST(sig AS VARCHAR), ',' ORDER BY i) AS band_val
         |  FROM sigs GROUP BY doc_id, CAST(i // 4 AS INTEGER))
         |SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS corpus_id
         |FROM bk n JOIN bk o ON n.band = o.band AND n.band_val = o.band_val
         |WHERE n.doc_id % 10 = 0 AND o.doc_id % 10 <> 0""".stripMargin),

    // transitive closure (recursive CTE) over the MinHash-LSH pair graph:
    // feasible because sf0.01 components are small; the engine side is the
    // iterative hash-min propagation that scales
    "dedup_clusters" -> (shinglePrelude.replaceFirst("WITH ", "WITH RECURSIVE ") + sigCte +
      ccCtes + "x AS (SELECT 1)\nSELECT doc_id, cluster_rep FROM cl"),

    // survivor twin: same transitive closure, then top-1 per cluster by
    // (token count DESC, doc_id ASC) — the same whitespace token count
    // as the txt_analysis oracle
    "dedup_survivors" -> (shinglePrelude.replaceFirst("WITH ", "WITH RECURSIVE ") + sigCte +
      ccCtes +
      s"""tc AS (SELECT doc_id,
         |         CASE WHEN length(trim(text)) = 0 THEN 0
         |              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
         |       FROM documents),
         |rk AS (SELECT cl.cluster_rep, cl.doc_id, tc.n_tokens,
         |         ROW_NUMBER() OVER (PARTITION BY cl.cluster_rep
         |                            ORDER BY tc.n_tokens DESC, cl.doc_id ASC) AS rn
         |       FROM cl JOIN tc ON cl.doc_id = tc.doc_id)
         |SELECT cluster_rep, doc_id AS survivor_id, n_tokens FROM rk WHERE rn = 1""".stripMargin),

    // golden-record twin: same transitive closure, then per-cluster MODE
    // of each attribute (ties -> smallest value) + member count
    "dedup_golden" -> (shinglePrelude.replaceFirst("WITH ", "WITH RECURSIVE ") + sigCte +
      ccCtes +
      s"""j AS (SELECT cl.cluster_rep, d.lang, d.source
         |      FROM cl JOIN documents d USING (doc_id)),
         |szs AS (SELECT cluster_rep, CAST(COUNT(*) AS BIGINT) AS n_members FROM j GROUP BY cluster_rep),
         |lm AS (SELECT cluster_rep, lang AS lang_golden FROM (
         |         SELECT cluster_rep, lang,
         |                ROW_NUMBER() OVER (PARTITION BY cluster_rep ORDER BY COUNT(*) DESC, lang ASC) AS rn
         |         FROM j GROUP BY cluster_rep, lang) WHERE rn = 1),
         |sm AS (SELECT cluster_rep, source AS source_golden FROM (
         |         SELECT cluster_rep, source,
         |                ROW_NUMBER() OVER (PARTITION BY cluster_rep ORDER BY COUNT(*) DESC, source ASC) AS rn
         |         FROM j GROUP BY cluster_rep, source) WHERE rn = 1)
         |SELECT szs.cluster_rep, szs.n_members, lm.lang_golden, sm.source_golden
         |FROM szs JOIN lm USING (cluster_rep) JOIN sm USING (cluster_rep)""".stripMargin),

    // cluster-aware split twin: same transitive closure as dedup_clusters,
    // then the Knuth-hash bucket of the cluster REPRESENTATIVE decides the
    // split (pure BIGINT arithmetic — bit-identical in both engines)
    "dedup_cluster_split" -> (shinglePrelude.replaceFirst("WITH ", "WITH RECURSIVE ") + sigCte +
      ccCtes +
      s"""x AS (SELECT 1)
         |SELECT doc_id, cluster_rep,
         |       CASE WHEN ((cluster_rep % 1000000007) * 2654435761) % 1000000007 % 100 < 80 THEN 'train'
         |            WHEN ((cluster_rep % 1000000007) * 2654435761) % 1000000007 % 100 < 90 THEN 'val'
         |            ELSE 'test' END AS split
         |FROM cl""".stripMargin),

    "dedup_simhash" ->
      s"""WITH dn AS (SELECT doc_id, ${norm("text")} AS nt FROM documents),
         |tk AS (
         |  SELECT DISTINCT doc_id, t AS tok
         |  FROM dn, unnest(list_filter(string_split(nt, ' '), x -> length(x) > 0)) AS u(t)),
         |th AS (SELECT doc_id, ${strHash("tok")} AS h FROM tk),
         |$simhashLanesVotes
         |SELECT doc_id, $simhashFromVotes AS simhash
         |FROM votes GROUP BY doc_id""".stripMargin,

    "dedup_simhash_pairs" ->
      s"""WITH dn AS (SELECT doc_id, ${norm("text")} AS nt FROM documents),
         |tk AS (
         |  SELECT DISTINCT doc_id, t AS tok
         |  FROM dn, unnest(list_filter(string_split(nt, ' '), x -> length(x) > 0)) AS u(t)),
         |th AS (SELECT doc_id, ${strHash("tok")} AS h FROM tk),
         |$simhashLanesVotes,
         |fp AS (
         |  SELECT doc_id, $simhashFromVotes AS simhash
         |  FROM votes GROUP BY doc_id),
         |banded AS (
         |  SELECT doc_id, simhash, b.b AS band,
         |         (simhash >> CAST(b.b * 16 AS INTEGER)) & 65535 AS band_val
         |  FROM fp, (SELECT unnest(generate_series(0, 3)) AS b) b)
         |SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
         |       bit_count(xor(a.simhash, b.simhash)) AS hamming
         |FROM banded a JOIN banded b
         |  ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin,

    "ann_brute_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT vec_id AS nn_id, embedding AS ce FROM embeddings),
         |scored AS (
         |  SELECT query_id, nn_id, round(${cosine("qe", "ce")}, 9) AS cos
         |  FROM c CROSS JOIN q WHERE query_id <> nn_id),
         |ranked AS (
         |  SELECT query_id, nn_id, cos,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, nn_id ASC) AS rn
         |  FROM scored)
         |SELECT query_id, nn_id, cos, rn FROM ranked WHERE rn <= 5""".stripMargin,

    "ann_lsh_topk" ->
      s"""WITH cb AS (${srpBucket("embeddings", 8)}),
         |qb AS (SELECT vec_id AS query_id, embedding AS qe, bucket AS qbk FROM cb WHERE vec_id < 10),
         |probes AS (
         |  SELECT query_id, qe, qbk AS bucket FROM qb
         |  UNION ALL
         |  SELECT query_id, qe, xor(qbk, (CAST(1 AS BIGINT) << CAST(p.p AS INTEGER)))
         |  FROM qb, (SELECT unnest(generate_series(0, 7)) AS p) p),
         |cand AS (
         |  SELECT DISTINCT query_id, c.vec_id AS nn_id, round(${cosine("qe", "c.embedding")}, 9) AS cos
         |  FROM probes JOIN cb c USING (bucket)
         |  WHERE query_id <> c.vec_id),
         |ranked AS (
         |  SELECT query_id, nn_id, cos,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, nn_id ASC) AS rn
         |  FROM cand)
         |SELECT query_id, nn_id, cos, rn FROM ranked WHERE rn <= 5""".stripMargin,

    // RRF twin: both retrievers' top-5 CTE chains inlined (l*/i* names),
    // fused with the same 1/(60+rank) terms and rounding
    "ann_rrf_topk" ->
      s"""WITH lcb AS (${srpBucket("embeddings", 8)}),
         |lqb AS (SELECT vec_id AS query_id, embedding AS qe, bucket AS qbk FROM lcb WHERE vec_id < 10),
         |lpr AS (
         |  SELECT query_id, qe, qbk AS bucket FROM lqb
         |  UNION ALL
         |  SELECT query_id, qe, xor(qbk, (CAST(1 AS BIGINT) << CAST(p.p AS INTEGER)))
         |  FROM lqb, (SELECT unnest(generate_series(0, 7)) AS p) p),
         |lcand AS (
         |  SELECT DISTINCT query_id, c.vec_id AS nn_id, round(${cosine("qe", "c.embedding")}, 9) AS cos
         |  FROM lpr JOIN lcb c USING (bucket)
         |  WHERE query_id <> c.vec_id),
         |lrank AS (
         |  SELECT query_id, nn_id,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, nn_id ASC) AS rn
         |  FROM lcand),
         |icent AS (SELECT vec_id AS cid, embedding AS centroid FROM embeddings WHERE vec_id < 16),
         |iasg0 AS (
         |  SELECT c.vec_id AS nn_id, c.embedding AS ce, icent.cid,
         |         ROW_NUMBER() OVER (PARTITION BY c.vec_id
         |           ORDER BY round(${cosine("c.embedding", "icent.centroid")}, 9) DESC, icent.cid ASC) AS rn
         |  FROM embeddings c CROSS JOIN icent),
         |iasg AS (SELECT nn_id, ce, cid FROM iasg0 WHERE rn = 1),
         |ipr0 AS (
         |  SELECT q.vec_id AS query_id, q.embedding AS qe, icent.cid,
         |         ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |           ORDER BY round(${cosine("q.embedding", "icent.centroid")}, 9) DESC, icent.cid ASC) AS rn
         |  FROM embeddings q CROSS JOIN icent WHERE q.vec_id < 10),
         |ipr AS (SELECT query_id, qe, cid FROM ipr0 WHERE rn <= 4),
         |icand AS (
         |  SELECT ipr.query_id, iasg.nn_id, round(${cosine("ipr.qe", "iasg.ce")}, 9) AS cos
         |  FROM iasg JOIN ipr USING (cid) WHERE ipr.query_id <> iasg.nn_id),
         |irank AS (
         |  SELECT query_id, nn_id,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, nn_id ASC) AS rn
         |  FROM icand),
         |lr5 AS (SELECT query_id, nn_id, rn FROM lrank WHERE rn <= 5),
         |ir5 AS (SELECT query_id, nn_id, rn FROM irank WHERE rn <= 5),
         |fused AS (
         |  SELECT COALESCE(l.query_id, i.query_id) AS query_id,
         |         COALESCE(l.nn_id, i.nn_id) AS nn_id,
         |         round(COALESCE(1.0 / (60.0 + CAST(l.rn AS DOUBLE)), 0.0)
         |               + COALESCE(1.0 / (60.0 + CAST(i.rn AS DOUBLE)), 0.0), 9) AS rrf
         |  FROM lr5 l FULL OUTER JOIN ir5 i
         |    ON l.query_id = i.query_id AND l.nn_id = i.nn_id),
         |fr AS (SELECT query_id, nn_id, rrf,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf DESC, nn_id ASC) AS rn
         |       FROM fused)
         |SELECT query_id, nn_id, rrf, rn FROM fr WHERE rn <= 5""".stripMargin,

    "ann_ivf_topk" ->
      s"""WITH cent AS (SELECT vec_id AS cid, embedding AS centroid FROM embeddings WHERE vec_id < 16),
         |asg0 AS (
         |  SELECT c.vec_id AS nn_id, c.embedding AS ce, cent.cid,
         |         ROW_NUMBER() OVER (PARTITION BY c.vec_id
         |           ORDER BY round(${cosine("c.embedding", "cent.centroid")}, 9) DESC, cent.cid ASC) AS rn
         |  FROM embeddings c CROSS JOIN cent),
         |asg AS (SELECT nn_id, ce, cid FROM asg0 WHERE rn = 1),
         |pr0 AS (
         |  SELECT q.vec_id AS query_id, q.embedding AS qe, cent.cid,
         |         ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |           ORDER BY round(${cosine("q.embedding", "cent.centroid")}, 9) DESC, cent.cid ASC) AS rn
         |  FROM embeddings q CROSS JOIN cent WHERE q.vec_id < 10),
         |pr AS (SELECT query_id, qe, cid FROM pr0 WHERE rn <= 4),
         |cand AS (
         |  SELECT pr.query_id, asg.nn_id, round(${cosine("pr.qe", "asg.ce")}, 9) AS cos
         |  FROM asg JOIN pr USING (cid) WHERE pr.query_id <> asg.nn_id),
         |ranked AS (
         |  SELECT query_id, nn_id, cos,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, nn_id ASC) AS rn
         |  FROM cand)
         |SELECT query_id, nn_id, cos, rn FROM ranked WHERE rn <= 5""".stripMargin,

    "ann_cos_neardup" -> (neardupCtes +
      "x AS (SELECT 1) SELECT v1, v2, cos FROM np"),

    // DBSCAN twin over the same banded-SRP eps-graph: degree >= 2 (=
    // minPts 3 counting the point itself) -> core, recursive-CTE
    // closure over core-core edges labeled by MIN reachable id,
    // deterministic MIN-cluster border assignment, remainder noise
    "ann_dbscan" -> ErOracles.materializeCtes((neardupCtes +
      """und AS (SELECT v1 AS u, v2 AS v FROM np UNION ALL SELECT v2, v1 FROM np),
        |core AS (SELECT u FROM (SELECT u, COUNT(*) AS deg FROM und GROUP BY u) dd
        |         WHERE deg >= 2),
        |ce AS (SELECT DISTINCT und.u, und.v
        |       FROM und JOIN core c1 ON und.u = c1.u JOIN core c2 ON und.v = c2.u),
        |reach(a, b) AS (
        |  SELECT u, u FROM core
        |  UNION
        |  SELECT r.a, ce.v FROM reach r JOIN ce ON r.b = ce.u),
        |cl AS (SELECT a AS vec_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
        |bord AS (SELECT und.u AS vec_id, MIN(cl.cluster_id) AS cluster_id
        |         FROM und JOIN cl ON und.v = cl.vec_id
        |         WHERE und.u NOT IN (SELECT u FROM core)
        |         GROUP BY und.u)
        |SELECT vec_id, cluster_id, 'core' AS role FROM cl
        |UNION ALL SELECT vec_id, cluster_id, 'border' AS role FROM bord
        |UNION ALL SELECT e.vec_id, CAST(-1 AS BIGINT) AS cluster_id, 'noise' AS role
        |FROM embeddings e
        |WHERE e.vec_id NOT IN (SELECT vec_id FROM cl)
        |  AND e.vec_id NOT IN (SELECT vec_id FROM bord)""".stripMargin)
      .replaceFirst("WITH ", "WITH RECURSIVE ")),

    // planted perturbed twins (Similarity.plantNearDups) + the same banded
    // SRP candidate generation, verified at the production 0.9 threshold
    "ann_cos_neardup_hi" ->
      s"""WITH pl AS (
         |  SELECT vec_id + 10000000 AS vec_id,
         |         list_transform(generate_series(1, 64),
         |           i -> CAST(CAST(embedding[i] AS DOUBLE) + 0.01 * CAST(embedding[(i % 64) + 1] AS DOUBLE) AS FLOAT)) AS embedding
         |  FROM embeddings WHERE vec_id % 20 = 0),
         |allv AS (SELECT vec_id, embedding FROM embeddings
         |         UNION ALL SELECT vec_id, embedding FROM pl),
         |vs AS (${srpBucket("allv", 16).replace(" AS bucket ", " AS sig ")}),
         |vb AS (SELECT vec_id, CAST(b.b AS INTEGER) AS band,
         |              (sig >> CAST(b.b * 4 AS INTEGER)) & 15 AS bkey
         |       FROM vs, (SELECT unnest(generate_series(0, 3)) AS b) b),
         |cand AS (SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
         |         FROM vb a JOIN vb b ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id)
         |SELECT c.v1, c.v2, round(${cosine("e1.embedding", "e2.embedding")}, 9) AS cos
         |FROM cand c JOIN allv e1 ON c.v1 = e1.vec_id
         |JOIN allv e2 ON c.v2 = e2.vec_id
         |WHERE round(${cosine("e1.embedding", "e2.embedding")}, 9) >= 0.9""".stripMargin,

    // ---- corpus curation twins (graft.text.Curation) ----

    "txt_domain_cap" ->
      """WITH pr AS (
        |  SELECT doc_id, source,
        |         ROW_NUMBER() OVER (PARTITION BY source
        |           ORDER BY ((doc_id % 1000000007) * 2654435761) % 1000000007 ASC, doc_id ASC) AS rn
        |  FROM documents)
        |SELECT doc_id, source, CAST(rn AS BIGINT) AS rn FROM pr WHERE rn <= 5""".stripMargin,

    "txt_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE (((doc_id % 1000000007) * 2654435761) % 1000000007) % 100
        |      < (CASE WHEN lang = 'en' THEN 50 ELSE 10 END)""".stripMargin,

    "txt_vocab" ->
      s"""WITH dn AS (SELECT ${norm("text")} AS nt FROM documents),
         |tk AS (SELECT unnest(list_filter(string_split(nt, ' '), t -> length(t) > 0)) AS token FROM dn),
         |cnts AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tk GROUP BY token
         |         ORDER BY cnt DESC, token ASC LIMIT 100)
         |SELECT token, cnt,
         |       CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS INTEGER) AS rank
         |FROM cnts""".stripMargin,

    "txt_pack" ->
      s"""WITH n AS (
         |  SELECT doc_id,
         |         CAST(len(list_filter(string_split(${norm("text")}, ' '), t -> length(t) > 0)) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |             SUM(CAST(n_tokens AS DOUBLE)) OVER (ORDER BY doc_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |      FROM n)
         |SELECT doc_id, n_tokens,
         |       CAST(floor((cum - n_tokens) / 1024) AS BIGINT) AS bin_id FROM c""".stripMargin,

    // shard-assembly twin: same bins, string_agg ordered by doc_id
    "txt_shards" ->
      s"""WITH n AS (
         |  SELECT doc_id, text,
         |         CAST(len(list_filter(string_split(${norm("text")}, ' '), t -> length(t) > 0)) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (SELECT doc_id, text, n_tokens,
         |             SUM(CAST(n_tokens AS DOUBLE)) OVER (ORDER BY doc_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |      FROM n)
         |SELECT CAST(floor((cum - n_tokens) / 1024) AS BIGINT) AS bin_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |       string_agg(text, '<eos>' ORDER BY doc_id) AS shard_text
         |FROM c GROUP BY 1""".stripMargin,

    "evt_props_extract" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) / COUNT(*) AS k_avg
        |FROM events GROUP BY event_type""".stripMargin,

    "evt_windowed_agg" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS value_sum
        |FROM events GROUP BY 1, 2""".stripMargin,

    // Morton-code twin: the same five mask/spread steps in 64-bit
    // integer arithmetic (two's-complement & | << match Java exactly)
    "evt_zorder" -> {
      def spread(e: String): String =
        Seq(8 -> 16711935L, 4 -> 252645135L, 2 -> 858993459L,
            1 -> 1431655765L)
          .foldLeft(s"($e & 65535)") { case (r, (sh, mask)) =>
            s"(($r | ($r << $sh)) & $mask)"
          }
      s"""WITH b AS (SELECT user_id % 65536 AS x,
         |                  CAST(round(value * 100) AS BIGINT) % 65536 AS y
         |           FROM events),
         |z AS (SELECT x, y, (${spread("x")} | (${spread("y")} << 1)) AS z FROM b)
         |SELECT z >> 18 AS z_bucket, CAST(COUNT(*) AS BIGINT) AS n,
         |       MIN(x) AS x_min, MAX(x) AS x_max,
         |       MIN(y) AS y_min, MAX(y) AS y_max
         |FROM z GROUP BY 1""".stripMargin
    },

    "evt_cube_agg" ->
      """SELECT COALESCE(event_type, '(all)') AS event_type,
        |       COALESCE(CAST(ts AS DATE), DATE '1970-01-01') AS event_day,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS value_sum
        |FROM events GROUP BY CUBE (event_type, CAST(ts AS DATE))""".stripMargin,

    "evt_value_quantiles" ->
      """SELECT event_type,
        |       round(quantile_cont(value, 0.5), 9) AS p50,
        |       round(quantile_cont(value, 0.95), 9) AS p95,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    // discrete-quantile twin: DuckDB's native quantile_disc over the
    // same exact cent encoding — integers end to end
    "evt_quantiles_disc" -> ErOracles.materializeCtes(
      """WITH s AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
        |           FROM events)
        |SELECT event_type,
        |       quantile_disc(vc, 0.25) AS p25,
        |       quantile_disc(vc, 0.5) AS p50,
        |       quantile_disc(vc, 0.75) AS p75,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM s GROUP BY event_type""".stripMargin),

    "evt_windowed_agg_stream" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS value_sum
        |FROM events GROUP BY 1, 2""".stripMargin,

    "evt_sessions" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id, value,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |flags AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM g),
        |seq AS (
        |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq_h
        |  FROM flags)
        |SELECT user_id, CAST(session_seq_h AS BIGINT) AS session_seq, MIN(ts) AS session_start, MAX(ts) AS session_end,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS value_sum
        |FROM seq GROUP BY user_id, CAST(session_seq_h AS BIGINT)""".stripMargin,

    // native session_window twin: touching windows fuse (split only on a
    // strictly greater gap, same as the lag rule — spec-pinned),
    // session_end = last event + gap
    "evt_session_window" -> sessionWindowSql,

    // streaming drain of the same native aggregate == the batch result
    "evt_session_window_stream" -> sessionWindowSql,

    "evt_sessions_stream" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id, value,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |flags AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM g),
        |seq AS (
        |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq_h
        |  FROM flags)
        |SELECT user_id, CAST(session_seq_h AS BIGINT) AS session_seq, MIN(ts) AS session_start, MAX(ts) AS session_end,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS value_sum
        |FROM seq GROUP BY user_id, CAST(session_seq_h AS BIGINT)""".stripMargin,

    "mm_metadata" ->
      """SELECT doc_id, 'image' AS modality, CAST(strlen(text) AS BIGINT) AS byte_len
        |FROM documents""".stripMargin,

    "mm_decode_features" ->
      s"""WITH m AS (
         |  SELECT doc_id, strlen(text) AS len,
         |         ${dsum("list_transform(generate_series(1, length(text)), i -> CAST(ascii(substr(text, CAST(i AS INTEGER), 1)) AS DOUBLE))")} AS bytesum
         |  FROM documents)
         |SELECT doc_id,
         |       CAST(16 + (len % 64) AS INTEGER) AS width,
         |       CAST(16 + ((len // 64) % 64) AS INTEGER) AS height,
         |       CAST(1 + (len % 8) AS INTEGER) AS n_frames,
         |       CASE WHEN len = 0 THEN 0.0
         |            ELSE floor(bytesum / len * 1000000 + 0.5) / 1000000 END AS mean_intensity
         |FROM m""".stripMargin,

    // twin of the REAL PPM decode: the fixture's dims/pixels are
    // closed-form in doc_id, so the expected header fields, the
    // position-weighted checksum and the mean recompute in SQL
    "mm_decode_ppm" ->
      """WITH dims AS (
        |  SELECT doc_id, CAST(4 + doc_id % 5 AS INTEGER) AS width,
        |         CAST(3 + doc_id % 4 AS INTEGER) AS height
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, width, height, i.i AS i,
        |         (doc_id * 31 + (i.i - 1) * 7) % 256 AS v
        |  FROM dims, unnest(generate_series(1, width * height * 3)) AS i(i))
        |SELECT doc_id, width, height,
        |       CAST(SUM(i * v) AS BIGINT) AS pixel_checksum,
        |       floor(CAST(SUM(v) AS DOUBLE) / COUNT(*) * 1000000 + 0.5) / 1000000 AS mean_intensity
        |FROM px GROUP BY doc_id, width, height""".stripMargin,

    // PNG is lossless: the real-ImageIO decode must return the source
    // plane exactly, recomputed closed-form from the fixture formula
    "mm_decode_png" ->
      """WITH dims AS (
        |  SELECT doc_id, CAST(9 + doc_id % 6 AS INTEGER) AS width,
        |         CAST(8 + doc_id % 5 AS INTEGER) AS height
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, width, height, i.i AS i,
        |         (doc_id * 37 + (i.i - 1) * 11 + 13) % 256 AS v
        |  FROM dims, unnest(generate_series(1, width * height * 3)) AS i(i))
        |SELECT doc_id, width, height,
        |       CAST(SUM(i * v) AS BIGINT) AS pixel_checksum,
        |       floor(CAST(SUM(v) AS DOUBLE) / COUNT(*) * 1000000 + 0.5) / 1000000 AS mean_intensity
        |FROM px GROUP BY doc_id, width, height""".stripMargin,

    // lossy-JPEG dHash: margins >= 60 levels make the real decode land
    // on this closed form bit-for-bit (see jpegDhashCtes)
    "mm_decode_jpeg" ->
      s"""$jpegDhashCtes
         |SELECT doc_id, dhash FROM fp""".stripMargin,

    "mm_jpeg_neardup" ->
      s"""$jpegDhashCtes,
         |$dhashPairsCte
         |SELECT d1, d2, hamming FROM pairs""".stripMargin,

    "mm_jpeg_recall" ->
      s"""$jpegDhashCtes,
         |$dhashPairsCte,
         |planted AS MATERIALIZED (
         |  SELECT doc_id AS d1, doc_id + 10000000 AS d2
         |  FROM documents WHERE doc_id % 20 = 0),
         |hit AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_found
         |        FROM planted p JOIN pairs q ON p.d1 = q.d1 AND p.d2 = q.d2),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_planted FROM planted)
         |SELECT n_planted, n_found,
         |       round(CAST(n_found AS DOUBLE) / CAST(n_planted AS DOUBLE), 9) AS recall
         |FROM tot, hit""".stripMargin,

    // dHash twins: every pixel, grid sample, and gradient bit of the
    // image corpus (+ planted perturbed twins) recomputed closed-form
    "mm_dhash" ->
      s"""$dhashCtes
         |SELECT doc_id, dhash FROM fp""".stripMargin,

    "mm_neardup" ->
      s"""$dhashCtes,
         |$dhashPairsCte
         |SELECT d1, d2, hamming FROM pairs""".stripMargin,

    "mm_neardup_recall" ->
      s"""$dhashCtes,
         |$dhashPairsCte,
         |planted AS MATERIALIZED (
         |  SELECT doc_id AS d1, doc_id + 10000000 AS d2
         |  FROM documents WHERE doc_id % 20 = 0),
         |hit AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_found
         |        FROM planted p JOIN pairs q ON p.d1 = q.d1 AND p.d2 = q.d2),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_planted FROM planted)
         |SELECT n_planted, n_found,
         |       round(CAST(n_found AS DOUBLE) / CAST(n_planted AS DOUBLE), 9) AS recall
         |FROM tot, hit""".stripMargin,

    // the streaming image-ingest gate equals the batch banded pairs
    // restricted to (corpus, arriving) cross pairs — base ids < 1e7,
    // arriving twin ids >= 1e7, so the d1 < d2 pair table splits cleanly
    "mm_neardup_stream" ->
      s"""$dhashCtes,
         |$dhashPairsCte
         |SELECT d2 AS new_id, d1 AS corpus_id, hamming FROM pairs
         |WHERE d1 < 10000000 AND d2 >= 10000000""".stripMargin,

    // audio twins: envelope fingerprint, banded pairs, planted-twin
    // recall — the fp CTE aliases afp AS dhash so the pair CTE composes
    "mm_wav_fp" ->
      s"""$afpCtes
         |SELECT doc_id, dhash AS afp FROM fp""".stripMargin,

    "mm_wav_neardup" ->
      s"""$afpCtes,
         |$dhashPairsCte
         |SELECT d1, d2, hamming FROM pairs""".stripMargin,

    // spectral fingerprint: every PCM sample, Hann x quantized-trig
    // coefficient, band energy, and HUGEINT-exact gradient bit of the
    // corpus + its genuinely low-pass-re-encoded twins recomputed
    "mm_wav_fp_spec" ->
      s"""$sfpCtes
         |SELECT doc_id, sfp FROM sfpt""".stripMargin,

    // the side-by-side recall grade: envelope vs spectral fingerprints
    // over the SAME re-encoded twins, each through its own banded pass
    "mm_wav_spec_recall" ->
      s"""$sfpCtes,
         |$afpReencCtes,
         |${bandPairCtes("efp", "afp", "epairs")},
         |${bandPairCtes("sfpt", "sfp", "spairs")},
         |planted AS MATERIALIZED (
         |  SELECT doc_id AS d1, doc_id + 10000000 AS d2
         |  FROM documents WHERE doc_id % 20 = 0),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_planted FROM planted),
         |ehit AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_found
         |         FROM planted p JOIN epairs q ON p.d1 = q.d1 AND p.d2 = q.d2),
         |shit AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_found
         |         FROM planted p JOIN spairs q ON p.d1 = q.d1 AND p.d2 = q.d2)
         |SELECT 'envelope' AS kind, n_planted, n_found,
         |       round(CAST(n_found AS DOUBLE) / CAST(n_planted AS DOUBLE), 9) AS recall
         |FROM tot, ehit
         |UNION ALL
         |SELECT 'spectral' AS kind, n_planted, n_found,
         |       round(CAST(n_found AS DOUBLE) / CAST(n_planted AS DOUBLE), 9) AS recall
         |FROM tot, shit""".stripMargin,

    // the streaming audio-ingest gate equals the batch banded pairs
    // restricted to (corpus, arriving) cross pairs — base ids < 1e7,
    // arriving twin ids >= 1e7, same split as mm_neardup_stream
    "mm_wav_neardup_stream" ->
      s"""$afpCtes,
         |$dhashPairsCte
         |SELECT d2 AS new_id, d1 AS corpus_id, hamming FROM pairs
         |WHERE d1 < 10000000 AND d2 >= 10000000""".stripMargin,

    "mm_wav_neardup_recall" ->
      s"""$afpCtes,
         |$dhashPairsCte,
         |planted AS MATERIALIZED (
         |  SELECT doc_id AS d1, doc_id + 10000000 AS d2
         |  FROM documents WHERE doc_id % 20 = 0),
         |hit AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_found
         |        FROM planted p JOIN pairs q ON p.d1 = q.d1 AND p.d2 = q.d2),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_planted FROM planted)
         |SELECT n_planted, n_found,
         |       round(CAST(n_found AS DOUBLE) / CAST(n_planted AS DOUBLE), 9) AS recall
         |FROM tot, hit""".stripMargin,

    // JL-recall twin: 16 projected components via the same LCG-parity
    // sign matrix and sequential fold; both rankings re-derived, recall
    // joined per query
    "ann_jl_recall" -> {
      def d16(x: String, y: String) =
        dsum(s"list_transform(generate_series(1, 16), t -> $x[CAST(t AS INTEGER)] * $y[CAST(t AS INTEGER)])")
      def cos16(x: String, y: String) =
        s"(${d16(x, y)} / (sqrt(${d16(x, x)}) * sqrt(${d16(y, y)})))"
      val comp = dsum("list_transform(generate_series(1, 64), i -> " +
        s"CAST(e.embedding[CAST(i AS INTEGER)] AS DOUBLE) * " +
        s"(CASE WHEN ((1103515245 * (j * 64 + (i - 1)) + 12345) % $Mod) % 2 = 0 " +
        "THEN 1.0 ELSE -1.0 END))")
      ErOracles.materializeCtes(
      s"""WITH jq AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
         |bsc AS (SELECT query_id, c.vec_id AS nn_id, round(${cosine("qe", "c.embedding")}, 9) AS cos
         |        FROM embeddings c CROSS JOIN jq WHERE query_id <> c.vec_id),
         |bex AS (SELECT query_id, nn_id FROM (
         |          SELECT query_id, nn_id,
         |                 ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, nn_id ASC) AS rn
         |          FROM bsc) WHERE rn <= 5),
         |pj AS (SELECT e.vec_id, list_transform(generate_series(0, 15), j -> $comp) AS y
         |       FROM embeddings e),
         |psc AS (SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
         |               round(${cos16("q.y", "c.y")}, 9) AS pcos
         |        FROM pj c CROSS JOIN (SELECT * FROM pj WHERE vec_id < 10) q
         |        WHERE q.vec_id <> c.vec_id),
         |papx AS (SELECT query_id, nn_id FROM (
         |           SELECT query_id, nn_id,
         |                  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY pcos DESC, nn_id ASC) AS rn
         |           FROM psc) WHERE rn <= 5),
         |jhits AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS hits
         |          FROM bex JOIN papx USING (query_id, nn_id) GROUP BY query_id)
         |SELECT q.query_id, COALESCE(h.hits, 0) AS hits,
         |       CAST(COALESCE(h.hits, 0) AS DOUBLE) / 5.0 AS recall_at_5
         |FROM (SELECT query_id FROM jq) q LEFT JOIN jhits h USING (query_id)""".stripMargin)
    },

    // WAV twin: the fixture's PCM samples recomputed closed-form
    "mm_decode_wav" ->
      """WITH wdim AS (
        |  SELECT doc_id, CAST(8000 + (doc_id % 4) * 4000 AS INTEGER) AS sample_rate,
        |         CAST(50 + doc_id % 32 AS BIGINT) AS n_samples
        |  FROM documents),
        |smp AS (
        |  SELECT doc_id, sample_rate, n_samples, i.i AS i,
        |         ((doc_id * 131 + (i.i - 1) * 17) % 65536) - 32768 AS v
        |  FROM wdim, unnest(generate_series(1, n_samples)) AS i(i))
        |SELECT doc_id, sample_rate, n_samples,
        |       CAST(SUM(i * v) AS BIGINT) AS amp_checksum,
        |       floor(CAST(SUM(v * v) AS DOUBLE) / n_samples * 1000000 + 0.5) / 1000000 AS mean_square
        |FROM smp GROUP BY doc_id, sample_rate, n_samples""".stripMargin,

    "mm_resize" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |         CAST(16 + (strlen(text) % 64) AS INTEGER) AS width,
         |         CAST(16 + ((strlen(text) // 64) % 64) AS INTEGER) AS height
         |  FROM documents),
         |s AS (SELECT doc_id, width, height,
         |             least(32.0 / width, 32.0 / height, 1.0) AS sc FROM m)
         |SELECT doc_id, width, height,
         |       CAST(floor(width * sc) AS INTEGER) AS out_width,
         |       CAST(floor(height * sc) AS INTEGER) AS out_height
         |FROM s""".stripMargin,

    "mm_frame_sample" ->
      s"""WITH m AS (SELECT doc_id, strlen(text) AS len FROM documents),
         |f AS (SELECT doc_id, CAST(1 + (len % 8) AS INTEGER) AS n_frames FROM m)
         |SELECT doc_id, CAST(i AS INTEGER) AS frame_idx
         |FROM f, unnest(generate_series(0, n_frames - 1, 2)) AS g(i)""".stripMargin,

    // payload chunks: DuckDB has no BLOB substring, so the twin slices the
    // VARCHAR by characters — identical bytes because the corpus is pure
    // ASCII (octet_length == length checked on every SF); chunk content is
    // verified through the rolling hash, not raw bytes (binary columns are
    // unhashable in the pandas-side compare)
    "mm_chunks" ->
      s"""WITH p AS (SELECT doc_id, text, strlen(text) AS blen FROM documents WHERE strlen(text) > 0),
         |i AS (SELECT doc_id, text,
         |             CAST(x.i AS INTEGER) AS chunk_idx
         |      FROM p, unnest(generate_series(0, CAST(ceil(blen / 256.0) AS INTEGER) - 1)) AS x(i)),
         |c AS (SELECT doc_id, chunk_idx,
         |             substring(text, chunk_idx * 256 + 1, 256) AS chunk_s
         |      FROM i)
         |SELECT doc_id, chunk_idx,
         |       CAST(strlen(chunk_s) AS BIGINT) AS chunk_len,
         |       ${strHash("chunk_s")} AS chunk_hash
         |FROM c""".stripMargin,

    // keyframe twin: same 256-byte chunking and string hash; LAG window per
    // doc, keep first frame and |sig - prev| >= 200 jumps
    "mm_keyframes" ->
      s"""WITH p AS (SELECT doc_id, text, strlen(text) AS blen FROM documents WHERE strlen(text) > 0),
         |i AS (SELECT doc_id, text, CAST(x.i AS INTEGER) AS frame_idx
         |      FROM p, unnest(generate_series(0, CAST(ceil(blen / 256.0) AS INTEGER) - 1)) AS x(i)),
         |c AS (SELECT doc_id, frame_idx,
         |             substring(text, frame_idx * 256 + 1, 256) AS chunk_s
         |      FROM i),
         |s AS (SELECT doc_id, frame_idx, ${strHash("chunk_s")} % 1000 AS sig FROM c),
         |lg AS (SELECT doc_id, frame_idx, sig,
         |              LAG(sig) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev
         |       FROM s)
         |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx, sig
         |FROM lg WHERE prev IS NULL OR abs(sig - prev) >= 200""".stripMargin,

    // plain range-predicate join: the engine's binned equi-join rewrite is
    // lossless, so the naive form is the oracle
    "evt_range_join" ->
      """WITH bands AS (
        |  SELECT CAST(i AS BIGINT) AS band_id,
        |         (i * 2654435761) % 1000000007 % 512 AS lo,
        |         (i * 2654435761) % 1000000007 % 512 + 8 + (i * 97) % 93 AS hi
        |  FROM range(64) t(i))
        |SELECT b.band_id, b.lo, b.hi, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS value_sum
        |FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
        |GROUP BY 1, 2, 3""".stripMargin,

    // same SQL as evt_range_join: the engine-side SQL-text query goes
    // through the RangeJoinRule rewrite, which must be lossless
    "evt_range_join_sql" ->
      """WITH bands AS (
        |  SELECT CAST(i AS BIGINT) AS band_id,
        |         (i * 2654435761) % 1000000007 % 512 AS lo,
        |         (i * 2654435761) % 1000000007 % 512 + 8 + (i * 97) % 93 AS hi
        |  FROM range(64) t(i))
        |SELECT b.band_id, b.lo, b.hi, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS value_sum
        |FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
        |GROUP BY 1, 2, 3""".stripMargin,

    // per-language exact p25 gate over the same rounded quality score as
    // txt_analysis; quantile_cont == Spark's exact interpolated percentile
    "txt_quality_filter" -> qualityFilterSql,

    // the streaming drive is a stateless stream-static broadcast join
    // against the SAME trained thresholds: one AvailableNow drain of the
    // whole table == the batch gate, so the twin is shared verbatim
    "txt_quality_filter_stream" -> qualityFilterSql,

    // token-weighted quantile twin: cumulative token mass over the
    // quality order, smallest value reaching p of the total — the same
    // cumW >= p*W compare the engine states, exact BIGINT ranks
    "txt_token_weighted_quality" ->
      s"""WITH q AS (
         |  SELECT d.lang, ta.quality, CAST(ta.n_tokens AS BIGINT) AS w
         |  FROM ( $txtAnalysisSql ) ta JOIN documents d USING (doc_id)),
         |c AS (SELECT lang, quality, CAST(SUM(w) AS BIGINT) AS w
         |      FROM q GROUP BY 1, 2),
         |cw AS (SELECT lang, quality,
         |              CAST(SUM(w) OVER (PARTITION BY lang ORDER BY quality) AS BIGINT) AS cum,
         |              CAST(SUM(w) OVER (PARTITION BY lang) AS BIGINT) AS tot
         |       FROM c)
         |SELECT lang,
         |       MIN(CASE WHEN CAST(cum AS DOUBLE) >= 0.25 * CAST(tot AS DOUBLE)
         |                THEN quality END) AS q25,
         |       MIN(CASE WHEN CAST(cum AS DOUBLE) >= 0.5 * CAST(tot AS DOUBLE)
         |                THEN quality END) AS q50,
         |       MAX(tot) AS total_tokens
         |FROM cw GROUP BY lang""".stripMargin,

    // sliding 32-token windows every 24 tokens over the normalized
    // token stream; final windows may be short, empty docs emit nothing
    "txt_chunk_overlap" ->
      s"""WITH dn AS (SELECT doc_id, ${norm("text")} AS nt FROM documents),
         |dt AS (SELECT doc_id, list_filter(string_split(nt, ' '), t -> length(t) > 0) AS toks FROM dn),
         |w AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
         |             CAST(i * 24 AS BIGINT) AS tok_start,
         |             list_slice(toks, CAST(i * 24 + 1 AS INTEGER), CAST(i * 24 + 32 AS INTEGER)) AS win
         |      FROM dt, unnest(generate_series(0, CAST(floor((len(toks) - 1) / 24.0) AS BIGINT))) AS g(i)
         |      WHERE len(toks) > 0)
         |SELECT doc_id, chunk_id, tok_start, CAST(len(win) AS BIGINT) AS n_toks,
         |       array_to_string(win, ' ') AS chunk_text
         |FROM w""".stripMargin,

    // z-score twin: identical cent-space integer moments, identical
    // double arithmetic order for mean/sd/z
    "evt_zscore" ->
      """WITH c AS (
        |  SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events),
        |st AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, SUM(c) AS s1, SUM(c * c) AS s2
        |  FROM c GROUP BY event_type),
        |m AS (
        |  SELECT event_type, n, CAST(s1 AS DOUBLE) / n AS mean_c,
        |         sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1)) AS sd_c
        |  FROM st)
        |SELECT c.event_id, c.event_type, c.c / 100.0 AS value_r,
        |       round((c.c - m.mean_c) / m.sd_c, 9) AS z
        |FROM c JOIN m USING (event_type)
        |WHERE m.sd_c > 0 AND abs((c.c - m.mean_c) / m.sd_c) > 2.0""".stripMargin,

    // streaming twin drained over the whole file == the batch z-score
    "evt_zscore_stream" ->
      """WITH c AS (
        |  SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events),
        |st AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, SUM(c) AS s1, SUM(c * c) AS s2
        |  FROM c GROUP BY event_type),
        |m AS (
        |  SELECT event_type, n, CAST(s1 AS DOUBLE) / n AS mean_c,
        |         sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1)) AS sd_c
        |  FROM st)
        |SELECT c.event_id, c.event_type, c.c / 100.0 AS value_r,
        |       round((c.c - m.mean_c) / m.sd_c, 9) AS z
        |FROM c JOIN m USING (event_type)
        |WHERE m.sd_c > 0 AND abs((c.c - m.mean_c) / m.sd_c) > 2.0""".stripMargin,

    // KMV sketch twin: same PolyHash31 min-k lists per lang over the
    // distinct 3-gram shingles, same merged '(all)' sketch, same
    // (k-1)*Mod/kth estimator arithmetic
    "txt_kmv_distinct" ->
      s"""WITH dn AS (SELECT lang, ${norm("text")} AS nt FROM documents),
         |dt AS (SELECT lang, list_filter(string_split(nt, ' '), t -> length(t) > 0) AS toks FROM dn),
         |sh AS (SELECT DISTINCT lang,
         |              array_to_string(list_slice(toks, CAST(i AS INTEGER), CAST(i AS INTEGER) + 2), ' ') AS shingle
         |       FROM dt, unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS g(i)),
         |hs AS (SELECT DISTINCT lang, ${strHash("shingle")} AS h FROM sh),
         |rk AS (SELECT lang, h, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h ASC) AS rn FROM hs),
         |topk AS (SELECT lang, h FROM rk WHERE rn <= 256),
         |per AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS k_used, MAX(h) AS kth
         |        FROM topk GROUP BY lang),
         |mk AS (SELECT DISTINCT h FROM topk ORDER BY h ASC LIMIT 256),
         |mg AS (SELECT '(all)' AS lang, CAST(COUNT(*) AS BIGINT) AS k_used, MAX(h) AS kth FROM mk),
         |u AS (SELECT * FROM per UNION ALL SELECT * FROM mg)
         |SELECT lang, k_used, kth,
         |       round(CASE WHEN k_used < 256 THEN CAST(k_used AS DOUBLE)
         |                  ELSE (255.0 * $Mod) / kth END, 9) AS distinct_est
         |FROM u""".stripMargin,

    // repetition metrics twin: one tagged 1/2/3-gram frame, same
    // count/max/dup aggregation, same cast-to-double divisions
    "txt_repetition" ->
      s"""WITH dn AS (SELECT doc_id, ${norm("text")} AS nt FROM documents),
         |dt AS (SELECT doc_id, list_filter(string_split(nt, ' '), t -> length(t) > 0) AS toks FROM dn),
         |g AS (SELECT doc_id, n.n AS n,
         |             array_to_string(list_slice(toks, CAST(i AS INTEGER),
         |               CAST(i AS INTEGER) + n.n - 1), ' ') AS gram
         |      FROM dt
         |      CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS n) n,
         |      unnest(generate_series(1, greatest(len(toks) - (n.n - 1), 0))) AS u(i)),
         |c AS (SELECT doc_id, n, gram, CAST(COUNT(*) AS BIGINT) AS cnt FROM g GROUP BY 1, 2, 3),
         |p AS (SELECT doc_id, n,
         |             CAST(SUM(cnt) AS BIGINT) AS total, MAX(cnt) AS top,
         |             CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup
         |      FROM c GROUP BY 1, 2)
         |SELECT doc_id,
         |       MAX(CASE WHEN n = 1 THEN total END) AS n_tokens,
         |       COALESCE(MAX(CASE WHEN n = 1 THEN CAST(top AS DOUBLE) / total END), 0.0) AS top_token_frac,
         |       COALESCE(MAX(CASE WHEN n = 2 THEN CAST(top AS DOUBLE) / total END), 0.0) AS top_bigram_frac,
         |       COALESCE(MAX(CASE WHEN n = 3 THEN CAST(dup AS DOUBLE) / total END), 0.0) AS dup_trigram_frac
         |FROM p GROUP BY doc_id""".stripMargin,

    // chunk-dedup twin: same 10-token chunking over the normalized token
    // stream, same fused BIGINT position key (doc_id*1e6 + chunk_idx)
    // argmin, same order-preserving reassembly (string_agg ORDER BY
    // chunk_idx == Spark's array_sort-by-struct-then-join)
    "txt_chunk_dedup" -> ErOracles.materializeCtes(
      s"""WITH dn AS (SELECT doc_id,
         |         list_filter(string_split(${norm("text")}, ' '), t -> length(t) > 0) AS toks
         |       FROM documents),
         |ch AS (SELECT doc_id, CAST(x.i AS BIGINT) AS chunk_idx,
         |         array_to_string(list_slice(toks, CAST(x.i * 10 + 1 AS BIGINT), CAST(x.i * 10 + 10 AS BIGINT)), ' ') AS chunk
         |       FROM dn, unnest(generate_series(0, CAST(floor((len(toks) - 1) / 10.0) AS BIGINT))) AS x(i)
         |       WHERE len(toks) > 0),
         |ky AS (SELECT doc_id, chunk_idx, chunk,
         |         doc_id * 1000000 + chunk_idx AS pos_key FROM ch),
         |fs AS (SELECT chunk, MIN(pos_key) AS keep_key FROM ky GROUP BY chunk),
         |kp AS (SELECT ky.doc_id, ky.chunk_idx, ky.chunk
         |       FROM ky JOIN fs ON ky.chunk = fs.chunk AND ky.pos_key = fs.keep_key)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS kept_chunks,
         |       string_agg(chunk, ' ' ORDER BY chunk_idx) AS text_dedup
         |FROM kp GROUP BY doc_id""".stripMargin),

    // ExactSubstr twin: sliding 10-token windows over the same normalized
    // token stream; windows whose gram text repeats anywhere mark their
    // positions; equal-length islands merge on gap > 10. The CTE chain is
    // shared with txt_span_apply so the two can't desynchronize.
    "txt_span_dedup" -> ErOracles.materializeCtes(
      spanCtes +
      """x AS (SELECT 1)
        |SELECT doc_id, span_start, span_end, span_tokens, n_windows
        |FROM sp""".stripMargin),

    // span-decontamination twin: corpus = doc_id % 50 <> 0, benchmark =
    // doc_id % 50 = 0 (same split as txt_decontaminate); mark rule = gram
    // occurs in the benchmark's distinct gram set, same island merge
    "txt_decon_spans" -> ErOracles.materializeCtes(
      "WITH " + gramCtes("dn", "gr", " WHERE doc_id % 50 <> 0")
        + gramCtes("bdn", "bgr", " WHERE doc_id % 50 = 0") +
      """bg AS (SELECT DISTINCT gram FROM bgr),
        |mk AS (SELECT doc_id, pos FROM gr WHERE gram IN (SELECT gram FROM bg)),
        |""".stripMargin + spanTail +
      """x AS (SELECT 1)
        |SELECT doc_id, span_start, span_end, span_tokens, n_windows
        |FROM sp""".stripMargin),

    // the streaming ingest must equal the batch pass bit-for-bit — the
    // oracle IS the batch twin
    "txt_decon_spans_stream" -> ErOracles.materializeCtes(
      "WITH " + gramCtes("dn", "gr", " WHERE doc_id % 50 <> 0")
        + gramCtes("bdn", "bgr", " WHERE doc_id % 50 = 0") +
      """bg AS (SELECT DISTINCT gram FROM bgr),
        |mk AS (SELECT doc_id, pos FROM gr WHERE gram IN (SELECT gram FROM bg)),
        |""".stripMargin + spanTail +
      """x AS (SELECT 1)
        |SELECT doc_id, span_start, span_end, span_tokens, n_windows
        |FROM sp""".stripMargin),

    // DSIR twins: per-token hashed bucket (shared polynomial hash % 256),
    // Laplace-smoothed target/raw bucket models over the full 256-bucket
    // spine, single-ln log ratio grained to 1e-9 BIGINT per token (the
    // txt_mi idiom), exact integer sum per doc
    "txt_dsir_weights" -> ErOracles.materializeCtes(dsirCtes +
      """x AS (SELECT 1)
        |SELECT doc_id, n_tokens, w FROM dw""".stripMargin),

    // the streaming gate must equal the batch operator bit-for-bit: the
    // per-token grains are the same exact BIGINTs, summed row-locally
    "txt_dsir_stream" -> ErOracles.materializeCtes(dsirCtes +
      """x AS (SELECT 1)
        |SELECT doc_id, n_tokens, w FROM dw""".stripMargin),

    "txt_dsir_select" -> ErOracles.materializeCtes(dsirCtes +
      s"""ky AS (SELECT doc_id, n_tokens, w,
         |         round(w - ln(-ln(CAST(${strHash("'dsir:' || CAST(doc_id AS VARCHAR)")} + 1 AS DOUBLE)
         |                           / 2147483648.0)), 9) AS key9
         |       FROM dw)
         |SELECT doc_id, n_tokens, w, key9 FROM ky
         |ORDER BY key9 DESC, doc_id LIMIT 100""".stripMargin),

    // char-level ExactSubstr twin: sliding 30-char windows over the RAW
    // text, canonical first copy elected by the fused BIGINT key
    // (doc_id*1e6 + pos, the chunk-dedup idiom), non-canonical repeated
    // positions merge on gap > 30 — same island rule as the token spans
    "txt_substr_dedup" -> ErOracles.materializeCtes(
      substrCtes +
      """x AS (SELECT 1)
        |SELECT doc_id, span_start, span_end,
        |       span_end - span_start AS span_chars, n_windows
        |FROM sp""".stripMargin),

    // the streaming gate's batch twin: every occurrence of every
    // corpus-repeated window (keep-nothing — the gate keeps the standing
    // copy, not a corpus-global election), same island merge
    "txt_substr_stream" -> ErOracles.materializeCtes(
      substrStreamCtes +
      """x AS (SELECT 1)
        |SELECT doc_id, span_start, span_end,
        |       span_end - span_start AS span_chars, n_windows
        |FROM sp""".stripMargin),

    // apply twin: between-span segments (lag of span_end) concatenated in
    // span order plus the tail after the last span; docs without spans
    // pass through with removed_chars = 0
    "txt_substr_apply" -> ErOracles.materializeCtes(
      substrCtes +
      """pieces AS (SELECT doc_id, span_start, span_end,
        |     coalesce(LAG(span_end) OVER (PARTITION BY doc_id ORDER BY span_start), 0) AS seg_start
        |   FROM sp),
        |ag AS (SELECT p.doc_id,
        |     string_agg(substr(d.text, CAST(seg_start + 1 AS BIGINT),
        |                       CAST(span_start - seg_start AS BIGINT)), '' ORDER BY span_start) AS head,
        |     MAX(span_end) AS last_end,
        |     CAST(SUM(span_end - span_start) AS BIGINT) AS removed_chars
        |   FROM pieces p JOIN documents d USING (doc_id) GROUP BY p.doc_id)
        |SELECT d.doc_id, CAST(coalesce(a.removed_chars, 0) AS BIGINT) AS removed_chars,
        |       CASE WHEN a.last_end IS NULL THEN d.text
        |            ELSE a.head || substr(d.text, CAST(a.last_end + 1 AS BIGINT)) END AS text_clean
        |FROM documents d LEFT JOIN ag a USING (doc_id)""".stripMargin),

    // apply twin: per distinct span text the (doc_id, span_start)-first
    // copy survives; other copies' token ranges are removed, documents
    // reassemble from the remaining positions
    "txt_span_apply" -> ErOracles.materializeCtes(
      spanCtes +
      """spt AS (SELECT s.doc_id, span_start, span_end,
        |          array_to_string(list_slice(toks, span_start + 1, span_end), ' ') AS span_text
        |        FROM sp s JOIN dn USING (doc_id)),
        |rm AS (SELECT doc_id, span_start, span_end FROM (
        |         SELECT *, ROW_NUMBER() OVER (PARTITION BY span_text
        |                  ORDER BY doc_id, span_start) AS rn
        |         FROM spt) WHERE rn > 1),
        |ps AS (SELECT doc_id, CAST(x.i AS INT) AS pos, toks[CAST(x.i + 1 AS BIGINT)] AS tok
        |       FROM dn, unnest(generate_series(0, CAST(len(toks) - 1 AS BIGINT))) AS x(i)
        |       WHERE len(toks) > 0),
        |kept AS (SELECT p.doc_id, p.pos, p.tok FROM ps p
        |         WHERE NOT EXISTS (SELECT 1 FROM rm r
        |                WHERE r.doc_id = p.doc_id
        |                  AND p.pos >= r.span_start AND p.pos < r.span_end))
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS kept_tokens,
        |       string_agg(tok, ' ' ORDER BY pos) AS text_clean
        |FROM kept GROUP BY doc_id""".stripMargin),

    // boilerplate twin: same chunking, then drop chunks whose distinct-doc
    // frequency exceeds 1 (every copy, unlike chunk_dedup's keep-first)
    "txt_boilerplate" -> ErOracles.materializeCtes(
      s"""WITH dn AS (SELECT doc_id,
         |         list_filter(string_split(${norm("text")}, ' '), t -> length(t) > 0) AS toks
         |       FROM documents),
         |ch AS (SELECT doc_id, CAST(x.i AS BIGINT) AS chunk_idx,
         |         array_to_string(list_slice(toks, CAST(x.i * 10 + 1 AS BIGINT), CAST(x.i * 10 + 10 AS BIGINT)), ' ') AS chunk
         |       FROM dn, unnest(generate_series(0, CAST(floor((len(toks) - 1) / 10.0) AS BIGINT))) AS x(i)
         |       WHERE len(toks) > 0),
         |keep AS (SELECT chunk FROM ch GROUP BY chunk HAVING COUNT(DISTINCT doc_id) <= 1)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS kept_chunks,
         |       string_agg(chunk, ' ' ORDER BY chunk_idx) AS text_clean
         |FROM ch JOIN keep USING (chunk)
         |GROUP BY doc_id""".stripMargin),

    // PII redaction twin: same planted addresses/URLs, same RE2-safe
    // patterns (no dialect-dependent constructs), redaction checked by
    // count + length + rolling hash of the redacted text (ASCII corpus:
    // strlen bytes == Spark length chars)
    "txt_redact" -> {
      val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val url = "https?://[a-z0-9./_-]+"
      s"""WITH t AS (SELECT doc_id,
         |  text ||
         |  CASE WHEN doc_id % 10 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
         |  CASE WHEN doc_id % 7 = 0 THEN ' see https://example.com/d' || CAST(doc_id AS VARCHAR) ELSE '' END AS text
         |  FROM documents),
         |r AS (SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '$url')) AS BIGINT) AS n_urls,
         |  regexp_replace(regexp_replace(text, '$email', '<EMAIL>', 'g'), '$url', '<URL>', 'g') AS redacted
         |  FROM t)
         |SELECT doc_id, n_emails, n_urls,
         |       CAST(strlen(redacted) AS BIGINT) AS redacted_len,
         |       ${strHash("redacted")} AS redacted_hash
         |FROM r""".stripMargin
    },

    // int8 quantization twin: same max-|x| fold, same 127/amax scale,
    // same explicit half-away-from-zero rounding, same sequential
    // checksum folds
    "ann_quantize" ->
      s"""WITH am AS (SELECT vec_id,
         |  list_reduce(list_prepend(0.0, list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
         |              (m, x) -> greatest(m, x)) AS amax
         |  FROM embeddings),
         |s AS (SELECT e.vec_id, e.embedding,
         |             CASE WHEN am.amax > 0 THEN 127.0 / am.amax ELSE 0.0 END AS sc
         |      FROM embeddings e JOIN am USING (vec_id)),
         |q AS (SELECT vec_id, sc, list_transform(embedding, x ->
         |        CAST(CASE WHEN CAST(x AS DOUBLE) * sc >= 0 THEN floor(CAST(x AS DOUBLE) * sc + 0.5)
         |                  ELSE -floor(-(CAST(x AS DOUBLE) * sc) + 0.5) END AS BIGINT)) AS qv
         |      FROM s)
         |SELECT vec_id, round(sc, 9) AS scale,
         |       list_reduce(list_prepend(CAST(0 AS BIGINT), qv), (acc, v) -> acc + v) AS q_sum,
         |       list_reduce(list_prepend(CAST(0 AS BIGINT), qv), (acc, v) -> (acc * 31 + (v + 128)) % $Mod) AS q_hash
         |FROM q""".stripMargin,

    // decontamination twin: same shingle sets, same bench/train split,
    // same HAVING-on-shared filter and containment division
    // bloom-prefiltered twin: the rewrite is LOSSLESS (exact join confirms
    // after the bloom), so the oracle is the same naive containment SQL
    "txt_decon_bloom" -> (shinglePrelude +
      s"""b AS (SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id % 50 = 0),
         |t AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 50 <> 0),
         |j AS (SELECT t.doc_id, b.bench_id, CAST(COUNT(*) AS BIGINT) AS n_shared
         |      FROM t JOIN b USING (shingle) GROUP BY 1, 2 HAVING COUNT(*) >= 3),
         |bn AS (SELECT doc_id AS bench_id, CAST(COUNT(*) AS BIGINT) AS bench_n
         |       FROM sh WHERE doc_id % 50 = 0 GROUP BY 1)
         |SELECT j.doc_id, j.bench_id, j.n_shared,
         |       CAST(j.n_shared AS DOUBLE) / bn.bench_n AS containment
         |FROM j JOIN bn USING (bench_id)""".stripMargin),

    "txt_decontaminate" -> (shinglePrelude +
      s"""b AS (SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id % 50 = 0),
         |t AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 50 <> 0),
         |j AS (SELECT t.doc_id, b.bench_id, CAST(COUNT(*) AS BIGINT) AS n_shared
         |      FROM t JOIN b USING (shingle) GROUP BY 1, 2 HAVING COUNT(*) >= 3),
         |bn AS (SELECT doc_id AS bench_id, CAST(COUNT(*) AS BIGINT) AS bench_n
         |       FROM sh WHERE doc_id % 50 = 0 GROUP BY 1)
         |SELECT j.doc_id, j.bench_id, j.n_shared,
         |       CAST(j.n_shared AS DOUBLE) / bn.bench_n AS containment
         |FROM j JOIN bn USING (bench_id)""".stripMargin),

    "txt_len_histogram" ->
      """SELECT source, CAST(length(bin(greatest(n_chars, 1))) AS INT) AS log2_bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1, 2""".stripMargin,

    // removal-audit twin: each gate re-stated from the SAME shared
    // fragments its standalone oracle uses (ccCtes closure, dedup_exact
    // hash, txt_decontaminate containment rule, txt_analysis nested as a
    // subquery), composed into one first-failing-stage CASE
    "txt_removal_audit" -> (shinglePrelude.replaceFirst("WITH ", "WITH RECURSIVE ") + sigCte +
      ccCtes +
      s"""eh AS (SELECT doc_id, ${strHash(norm("text"))} AS h FROM documents),
         |ex AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY h) AS rep_id FROM eh),
         |bsh AS (SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id % 50 = 0),
         |tsh AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 50 <> 0),
         |cj AS (SELECT t.doc_id, b.bench_id FROM tsh t JOIN bsh b USING (shingle)
         |       GROUP BY 1, 2 HAVING COUNT(*) >= 3),
         |cont AS (SELECT DISTINCT doc_id FROM cj),
         |ta AS (SELECT doc_id, lang_id, quality FROM ($txtAnalysisSql) z)
         |SELECT d.doc_id,
         |  CASE WHEN d.doc_id % 50 = 0 THEN 'benchmark'
         |       WHEN ex.rep_id <> d.doc_id THEN 'exact_dup'
         |       WHEN cl.cluster_rep <> d.doc_id THEN 'near_dup'
         |       WHEN cont.doc_id IS NOT NULL THEN 'contaminated'
         |       WHEN ta.lang_id <> 'en' THEN 'lang'
         |       WHEN ta.quality < 0.5 THEN 'quality'
         |       ELSE 'kept' END AS stage
         |FROM documents d
         |JOIN ex USING (doc_id)
         |JOIN cl USING (doc_id)
         |LEFT JOIN cont USING (doc_id)
         |JOIN ta USING (doc_id)""".stripMargin),

    // salted-join twin: the salt is partitioning-only, so the oracle is
    // the NAIVE join (lossless-rewrite rule, same as RangeJoin)
    "evt_salted_join" ->
      """WITH c AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        |           FROM events GROUP BY user_id)
        |SELECT c.cohort_day, e.event_type, CAST(COUNT(*) AS BIGINT) AS n
        |FROM events e JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    // cohort retention twin: date subtraction yields whole days in both
    // engines (UTC sessions, date-truncated activity)
    "evt_retention" ->
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |f AS (SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY user_id)
        |SELECT f.cohort_day,
        |       CAST(a.day - f.cohort_day AS BIGINT) AS day_offset,
        |       CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM act a JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    // Lloyd k-means twin: iterations unrolled as materialized CTEs —
    // same deterministic init, same strict-order distance fold, same
    // 1e-6 fixed-point centroid means, same (sqdist, cluster) tie-break
    "ann_kmeans" -> ErOracles.materializeCtes(kmeansSql(k = 8, iters = 2)),

    // IVF with the trained kmeans quantizer — shares the unrolled kmeans
    // CTEs, then the standard assign/probe/rank IVF pipeline
    "ann_ivf_kmeans_topk" -> ErOracles.materializeCtes(
      ivfKmeansSql(k = 8, iters = 2, nProbe = 3, topK = 5)),

    // SemDeDup twin: planted union -> same unrolled kmeans (source
    // parameterized to the union) -> within-cluster cosine pairs ->
    // greedy smallest-id-wins drop set, survivors flagged
    "ann_semdedup" -> ErOracles.materializeCtes(semDedupSql(
      k = 8, iters = 2, tau = "0.9")),

    // product-quantization code table: 4 independent unrolled kmeans
    // trainings over the 16-dim slices, argmin code per (vector,
    // subspace) with the (sqdist, cluster) tie-break
    "ann_pq_codes" -> ErOracles.materializeCtes(
      pqCodesSql(m = 4, subDim = 16, k = 8, iters = 2)),

    // streaming PQ ingest twin: the same code table filtered to the
    // arriving ids (codebooks trained on the full corpus — the standing
    // model the stream encodes against)
    "ann_pq_stream" -> ErOracles.materializeCtes(
      pqCodesSql(m = 4, subDim = 16, k = 8, iters = 2,
        where = " WHERE vec_id % 10 = 0")),

    // ADC twin: per-query m*k lookup table of subspace dots, candidate
    // score = j-ascending ordered sum of code lookups rounded to 9,
    // self-matches excluded before the (approx DESC, nn_id ASC) rank
    "ann_pq_adc_topk" -> ErOracles.materializeCtes(
      pqAdcSql(m = 4, subDim = 16, k = 8, iters = 2, topK = 5)),

    // index-quality twin: ADC top-5 intersected with the exact cosine
    // top-5 per query, missing queries surfacing as recall 0
    "ann_pq_recall" -> ErOracles.materializeCtes(
      pqRecallSql(m = 4, subDim = 16, k = 8, iters = 2, topK = 5)),

    // IVF+PQ twin: trained coarse lists prune candidates, codes + lut
    // score the survivors — adcTopK restricted to the probed lists
    "ann_ivfpq_topk" -> ErOracles.materializeCtes(
      ivfpqSql(m = 4, subDim = 16, k = 8, iters = 2,
        coarseK = 8, coarseIters = 2, nProbe = 3, topK = 5)),

    // BM25 twin: identical operand order/associativity per factor, sum
    // rounded to 9 before the rank (ln ULP guard, the tfidf pattern)
    "txt_bm25" ->
      s"""WITH dn AS (SELECT doc_id, ${norm("text")} AS nt FROM documents),
         |tk AS (SELECT doc_id, unnest(list_filter(string_split(nt, ' '), t -> length(t) > 0)) AS token FROM dn),
         |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tk GROUP BY 1),
         |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         |              CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl FROM dl),
         |qtf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM tk
         |        WHERE token IN ('spark', 'merge', 'window') GROUP BY 1, 2),
         |dfq AS (SELECT token, CAST(COUNT(*) AS DOUBLE) AS df FROM qtf GROUP BY 1),
         |sc AS (SELECT q.doc_id,
         |         ln((st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
         |           * (CAST(q.tf AS DOUBLE) * (1.2 + 1.0))
         |           / (CAST(q.tf AS DOUBLE)
         |              + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl.dl AS DOUBLE) / st.avgdl)) AS s
         |       FROM qtf q JOIN dl ON q.doc_id = dl.doc_id
         |                  JOIN dfq ON q.token = dfq.token CROSS JOIN st),
         |agg AS (SELECT doc_id, round(SUM(s), 9) AS score FROM sc GROUP BY 1),
         |r AS (SELECT doc_id, score,
         |             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rnk FROM agg)
         |SELECT CAST(rnk AS BIGINT) AS rank, doc_id, score FROM r WHERE rnk <= 50""".stripMargin,

    // corpus-global shingle novelty: first occurrence = MIN(doc_id)
    "txt_novelty" -> (shinglePrelude +
      """fo AS (SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY 1),
        |g AS (
        |  SELECT sh.doc_id,
        |         CAST(COUNT(*) AS BIGINT) AS n_shingles,
        |         CAST(SUM(CASE WHEN fo.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        |  FROM sh JOIN fo USING (shingle) GROUP BY 1)
        |SELECT doc_id, n_shingles, n_novel,
        |       round(CAST(n_novel AS DOUBLE) / CAST(n_shingles AS DOUBLE), 9) AS novelty
        |FROM g""".stripMargin),

    // TF-IDF twin: ln-based smoothed idf, ranked on the ROUNDED score
    // (so a last-ULP ln difference can't flip the top-3), token
    // tie-break
    "txt_tfidf" -> ErOracles.materializeCtes(
      s"""WITH dn AS (SELECT doc_id, ${norm("text")} AS nt FROM documents),
         |tk AS (SELECT doc_id, unnest(list_filter(string_split(nt, ' '), t -> length(t) > 0)) AS token FROM dn),
         |tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM tk GROUP BY doc_id, token),
         |df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token),
         |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
         |sc AS (SELECT tf.doc_id, tf.token, tf.tf,
         |         round(CAST(tf.tf AS DOUBLE) *
         |               ln((CAST(nd.n_docs AS DOUBLE) + 1.0) / (CAST(df.df AS DOUBLE) + 1.0)), 9) AS tfidf
         |       FROM tf JOIN df USING (token) CROSS JOIN nd),
         |rk AS (SELECT doc_id, token, tf, tfidf,
         |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS rn
         |       FROM sc)
         |SELECT doc_id, token, tf, tfidf, CAST(rn AS BIGINT) AS rank
         |FROM rk WHERE rn <= 3""".stripMargin),

    // unigram-surprisal twin: per-token NLL rounded to 1e-9 fixed point
    // and summed as BIGINT, so the per-doc mean is independent of
    // aggregation order in both engines
    "txt_lm_score" -> ErOracles.materializeCtes(
      s"""WITH dn AS (SELECT doc_id, ${norm("text")} AS nt FROM documents),
         |tk AS (SELECT doc_id, unnest(list_filter(string_split(nt, ' '), t -> length(t) > 0)) AS token FROM dn),
         |fr AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tk GROUP BY token),
         |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM fr),
         |nl AS (SELECT tk.doc_id,
         |         CAST(round(-ln(CAST(fr.cnt AS DOUBLE) / CAST(tot.total AS DOUBLE)) * 1000000000.0) AS BIGINT) AS nll_fix
         |       FROM tk JOIN fr USING (token) CROSS JOIN tot)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |       round(CAST(SUM(nll_fix) AS DOUBLE) / 1000000000.0 / CAST(COUNT(*) AS DOUBLE), 9) AS avg_nll
         |FROM nl GROUP BY doc_id""".stripMargin),

    // composition-diagnostics twin: same 1e-9 fixed-point entropy/MI terms
    "txt_mi_lang_source" -> ErOracles.materializeCtes(
      """WITH j AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_ls
        |           FROM documents GROUP BY lang, source),
        |nl AS (SELECT lang, CAST(SUM(n_ls) AS BIGINT) AS n_l FROM j GROUP BY lang),
        |ns AS (SELECT source, CAST(SUM(n_ls) AS BIGINT) AS n_s FROM j GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_ls) AS BIGINT) AS n FROM j),
        |hl AS (SELECT CAST(SUM(CAST(round(-(CAST(n_l AS DOUBLE) / CAST(n AS DOUBLE))
        |            * ln(CAST(n_l AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000000.0) AS BIGINT)) AS DOUBLE)
        |          / 1000000000.0 AS h_lang
        |       FROM nl CROSS JOIN tot),
        |hs AS (SELECT CAST(SUM(CAST(round(-(CAST(n_s AS DOUBLE) / CAST(n AS DOUBLE))
        |            * ln(CAST(n_s AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000000.0) AS BIGINT)) AS DOUBLE)
        |          / 1000000000.0 AS h_source
        |       FROM ns CROSS JOIN tot),
        |mi AS (SELECT CAST(SUM(CAST(round((CAST(n_ls AS DOUBLE) / CAST(n AS DOUBLE))
        |            * ln((CAST(n_ls AS DOUBLE) * CAST(n AS DOUBLE))
        |                 / (CAST(n_l AS DOUBLE) * CAST(n_s AS DOUBLE))) * 1000000000.0) AS BIGINT)) AS DOUBLE)
        |          / 1000000000.0 AS mi
        |       FROM j JOIN nl USING (lang) JOIN ns USING (source) CROSS JOIN tot)
        |SELECT tot.n AS n_docs, h_lang, h_source, mi
        |FROM tot CROSS JOIN hl CROSS JOIN hs CROSS JOIN mi""".stripMargin),

    // bigram-surprisal twin: add-one smoothing, same 1e-9 fixed-point NLL
    "txt_bigram_lm" -> ErOracles.materializeCtes(
      s"""WITH dn AS (SELECT doc_id,
         |         list_filter(string_split(${norm("text")}, ' '), t -> length(t) > 0) AS toks
         |       FROM documents),
         |bi AS (SELECT doc_id, toks[CAST(x.i AS BIGINT)] AS prev,
         |              toks[CAST(x.i + 1 AS BIGINT)] AS cur
         |       FROM dn, unnest(generate_series(1, CAST(len(toks) - 1 AS BIGINT))) AS x(i)
         |       WHERE len(toks) >= 2),
         |cb AS (SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS cb FROM bi GROUP BY prev, cur),
         |cu AS (SELECT unnest(toks) AS prev FROM dn),
         |cuc AS (SELECT prev, CAST(COUNT(*) AS BIGINT) AS cu FROM cu GROUP BY prev),
         |vv AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM cuc),
         |nl AS (SELECT bi.doc_id,
         |         CAST(round(-ln((CAST(cb.cb AS DOUBLE) + 1.0) /
         |              (CAST(cuc.cu AS DOUBLE) + CAST(vv.v AS DOUBLE))) * 1000000000.0) AS BIGINT) AS nll_fix
         |       FROM bi JOIN cb USING (prev, cur) JOIN cuc USING (prev) CROSS JOIN vv)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |       round(CAST(SUM(nll_fix) AS DOUBLE) / 1000000000.0 / CAST(COUNT(*) AS DOUBLE), 9) AS avg_nll
         |FROM nl GROUP BY doc_id""".stripMargin),

    // epoch-mix twin: whole epochs via integer division, fractional
    // remainder via the shared Knuth-hash percent; DuckDB's
    // generate_series(1, 0) is empty (Spark's would descend — guarded
    // engine-side)
    "txt_mix" -> ErOracles.materializeCtes(
      """WITH w AS (SELECT doc_id, lang,
        |             CASE WHEN lang = 'en' THEN 250 ELSE 50 END AS w
        |           FROM documents),
        |c AS (SELECT doc_id, lang,
        |        CAST(w // 100 AS BIGINT) +
        |        CASE WHEN (((doc_id % 1000000007) * 2654435761) % 1000000007) % 100 < w % 100
        |             THEN 1 ELSE 0 END AS copies
        |      FROM w)
        |SELECT doc_id, lang, unnest(generate_series(1, copies)) AS copy
        |FROM c""".stripMargin),

    // MERGE upsert twin: latest (ts, event_id) version per (user, type)
    // over snapshot ∪ changes — the even/odd split unions back to the
    // full event set, so one window expresses the merged state
    "evt_merge_upsert" ->
      """WITH u AS (
        |  SELECT event_id, ts, user_id, event_type, value,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |           ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT event_id, ts, user_id, event_type, value FROM u WHERE rn = 1""".stripMargin,

    // streaming merge drains to the same latest-per-key state
    "evt_merge_stream" ->
      """WITH u AS (
        |  SELECT event_id, ts, user_id, event_type, value,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |           ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT event_id, ts, user_id, event_type, value FROM u WHERE rn = 1""".stripMargin,

    // SCD2 twin: lead(ts) validity intervals per user over purchases
    "evt_scd2" ->
      """WITH p AS (SELECT event_id, ts, user_id, value FROM events
        |           WHERE event_type = 'purchase'),
        |h AS (SELECT user_id, event_id, value, ts AS valid_from,
        |             LEAD(ts) OVER (PARTITION BY user_id
        |               ORDER BY ts ASC, event_id ASC) AS vt
        |      FROM p)
        |SELECT user_id, event_id, value, valid_from,
        |       COALESCE(vt, TIMESTAMP '1970-01-01 00:00:00') AS valid_to,
        |       (vt IS NULL) AS is_current
        |FROM h""".stripMargin,

    // per-day top-3 event types (count desc, type asc)
    "evt_topk_window" ->
      """WITH c AS (SELECT date_trunc('day', ts) AS day, event_type,
        |                  CAST(COUNT(*) AS BIGINT) AS cnt
        |           FROM events GROUP BY 1, 2),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY day
        |        ORDER BY cnt DESC, event_type ASC) AS rn FROM c)
        |SELECT day, event_type, cnt, rn FROM r WHERE rn <= 3""".stripMargin,

    // hard-negative twin: brute-force cosine top-5 gated to labels that
    // differ from the query's
    "ann_hard_negatives" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label AS q_label
         |           FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT vec_id AS nn_id, embedding AS ce, label AS nn_label FROM embeddings),
         |scored AS (
         |  SELECT query_id, nn_id, nn_label, round(${cosine("qe", "ce")}, 9) AS cos
         |  FROM c CROSS JOIN q WHERE q_label <> nn_label),
         |ranked AS (
         |  SELECT query_id, nn_id, nn_label, cos,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, nn_id ASC) AS rn
         |  FROM scored)
         |SELECT query_id, nn_id, nn_label, cos, rn FROM ranked WHERE rn <= 5""".stripMargin,

    // count-min sketch twin: same affine lane hashes as the minhash/
    // simhash families ((hashA(j)·h + hashB(j)) % Mod % width), counters
    // from the per-token counts, estimate = min bucket counter over rows
    "txt_cms_topk" -> {
      // tc (the token-count scan) feeds both the sketch and the head —
      // materialize so DuckDB doesn't inline it per reference site
      def bucket(j: String, h: String) =
        s"(((((1103515245 * ($j + 1) + 12345) % $Mod) * $h" +
          s" + ((2654435761 * ($j + 1)) % $Mod)) % $Mod) % 1024)"
      ErOracles.materializeCtes(
      s"""WITH dn AS (SELECT ${norm("text")} AS nt FROM documents),
         |tk AS (SELECT unnest(list_filter(string_split(nt, ' '), t -> length(t) > 0)) AS token FROM dn),
         |tc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt, ${strHash("token")} AS h
         |       FROM tk GROUP BY token),
         |sk AS (SELECT j.j, ${bucket("j.j", "h")} AS bucket,
         |              CAST(SUM(cnt) AS BIGINT) AS bucket_cnt
         |       FROM tc, (SELECT unnest(generate_series(0, 3)) AS j) j GROUP BY 1, 2),
         |hd0 AS (SELECT token, cnt, h FROM tc ORDER BY cnt DESC, token ASC LIMIT 50),
         |hd AS (SELECT token, cnt, h,
         |              ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS rank FROM hd0),
         |pb AS (SELECT token, cnt, rank, j.j AS j, ${bucket("j.j", "h")} AS bucket
         |       FROM hd, (SELECT unnest(generate_series(0, 3)) AS j) j)
         |SELECT pb.token, pb.cnt, MIN(sk.bucket_cnt) AS est, pb.rank
         |FROM pb JOIN sk ON pb.j = sk.j AND pb.bucket = sk.bucket
         |GROUP BY pb.token, pb.cnt, pb.rank""".stripMargin)
    },

    // A-ES weighted-sample twin: priority = round(ln(u)/w, 9) from the
    // Knuth id hash, top 100 by (priority desc, doc_id)
    "txt_weighted_sample" ->
      """SELECT doc_id, CAST(n_chars AS DOUBLE) AS w,
        |       round(ln((((doc_id % 1000000007) * 2654435761) % 1000000007 + 1.0)
        |                / 1000000007.0) / n_chars, 9) AS priority
        |FROM documents WHERE n_chars > 0
        |ORDER BY priority DESC, doc_id ASC LIMIT 100""".stripMargin,

    // rolling-feature twin: RANGE frame over event-time micros, cent-
    // exact sums (the windowed_agg fixed-point idiom)
    "evt_rolling_features" ->
      """SELECT event_id, user_id, ts,
        |       CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
        |       CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS DOUBLE) / 100.0 AS sum_7d
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 604799999999 PRECEDING AND CURRENT ROW)""".stripMargin,

    // winsorize twin: quantile_cont == percentile (interpolated), clip
    // rounded to 9 on both sides
    "evt_winsorize" ->
      """WITH q AS (SELECT event_type,
        |                  quantile_cont(value, 0.05) AS p_lo,
        |                  quantile_cont(value, 0.95) AS p_hi
        |           FROM events GROUP BY event_type)
        |SELECT event_id, e.event_type, value,
        |       round(LEAST(GREATEST(value, p_lo), p_hi), 9) AS clipped
        |FROM events e JOIN q USING (event_type)""".stripMargin,

    // key-skew twin: quantile_cont over the per-key counts (bit-parity
    // with Stats.exactPercentiles), ratio from the UNROUNDED median
    "evt_key_skew" -> ErOracles.materializeCtes(
      """WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
        |           FROM events GROUP BY 1),
        |q AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |             quantile_cont(cnt, 0.5) AS p50,
        |             quantile_cont(cnt, 0.9) AS p90,
        |             quantile_cont(cnt, 0.99) AS p99,
        |             MAX(cnt) AS max_cnt FROM c)
        |SELECT n_keys, round(p50, 9) AS p50, round(p90, 9) AS p90,
        |       round(p99, 9) AS p99, max_cnt,
        |       round(CAST(max_cnt AS DOUBLE) / p50, 9) AS skew_ratio
        |FROM q""".stripMargin),

    // Tukey IQR fences: same pinned expression tree as the engine
    // (q1 - 1.5*(q3 - q1), q3 + 1.5*(q3 - q1)); filter on the unrounded
    // fences, round only the output
    "evt_iqr_outliers" -> ErOracles.materializeCtes(
      """WITH q AS (SELECT event_type,
        |                  quantile_cont(value, 0.25) AS q1,
        |                  quantile_cont(value, 0.75) AS q3
        |           FROM events GROUP BY event_type),
        |f AS (SELECT event_type,
        |             q1 - 1.5 * (q3 - q1) AS lo_fence,
        |             q3 + 1.5 * (q3 - q1) AS hi_fence FROM q)
        |SELECT event_id, e.event_type, value,
        |       round(lo_fence, 9) AS lo_fence, round(hi_fence, 9) AS hi_fence
        |FROM events e JOIN f USING (event_type)
        |WHERE value < lo_fence OR value > hi_fence""".stripMargin),

    // snapshot-diff twin: latest version per key at the mid-month cutoff
    // vs the end state, full outer join, same/identical keys drop out
    "evt_batch_diff" ->
      """WITH l AS (
        |  SELECT user_id, event_type, event_id,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |           ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
        |a AS (SELECT user_id, event_type, event_id FROM l WHERE rn = 1),
        |f AS (
        |  SELECT user_id, event_type, event_id,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |           ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |b AS (SELECT user_id, event_type, event_id FROM f WHERE rn = 1),
        |d AS (
        |  SELECT COALESCE(a.user_id, b.user_id) AS user_id,
        |         COALESCE(a.event_type, b.event_type) AS event_type,
        |         CASE WHEN a.event_id IS NULL THEN 'added'
        |              WHEN b.event_id IS NULL THEN 'removed'
        |              WHEN a.event_id <> b.event_id THEN 'changed'
        |              ELSE 'same' END AS status,
        |         COALESCE(a.event_id, -1) AS a_event_id,
        |         b.event_id AS b_event_id
        |  FROM a FULL OUTER JOIN b
        |    ON a.user_id = b.user_id AND a.event_type = b.event_type)
        |SELECT user_id, event_type, status, a_event_id, b_event_id
        |FROM d WHERE status <> 'same'""".stripMargin,

    // (bpeCtes builder lives below the map, near kmeansSql)
    // BPE twins: the unrolled merge rounds (bpeCtes) — each round counts
    // weighted adjacent pairs, argmaxes with the (n desc, a, b) tiebreak,
    // and applies the position-parallel merge rule (run-parity for a==b)
    "txt_bpe_merges" -> ErOracles.materializeCtes(
      s"""WITH ${bpeCtes(6)}
         |${(1 to 6).map(k =>
             s"SELECT $k AS rank, a AS lhs, b AS rhs, n FROM b$k")
             .mkString(" UNION ALL ")}""".stripMargin),

    "txt_bpe_tokens" -> ErOracles.materializeCtes(
      s"""WITH ${bpeCtes(6)},
         |ws AS (SELECT word, CAST(len(syms) AS BIGINT) AS n_sub,
         |              CAST(length(word) AS BIGINT) AS n_ch FROM c6),
         |wd AS (SELECT doc_id, unnest(list_filter(string_split(${norm("text")}, ' '),
         |                                         t -> length(t) > 0)) AS word
         |       FROM documents)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |       CAST(SUM(n_sub) AS BIGINT) AS n_subwords,
         |       CAST(SUM(n_ch) AS BIGINT) AS n_chars
         |FROM wd JOIN ws USING (word) GROUP BY doc_id""".stripMargin),

    // scrub twin: same planted fixture, same RE2 class
    "txt_clean" ->
      """WITH dd AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 7 = 0
        |              THEN text || chr(7) || chr(27) || 'x' || chr(127)
        |              ELSE text END AS dirty
        |  FROM documents)
        |SELECT doc_id,
        |       regexp_replace(dirty, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g') AS cleaned,
        |       CAST(length(dirty) -
        |            length(regexp_replace(dirty, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'))
        |            AS BIGINT) AS n_removed
        |FROM dd""".stripMargin,

    // constraint-audit twin: one aggregate row unioned out per check,
    // NULL expectations count as violations (COALESCE(..., FALSE))
    "evt_dq_checks" -> {
      val checks = Seq(
        "event_id_not_null" -> "event_id IS NOT NULL",
        "event_type_in_domain" ->
          "event_type IN ('click', 'view', 'purchase', 'signup', 'error')",
        "value_positive" -> "value > 0",
        "value_below_cap" -> "value <= 400.0",
        "ts_in_2024" -> "year(ts) = 2024")
      val aggCols = checks.zipWithIndex.map { case ((_, expect), i) =>
        s"CAST(SUM(CASE WHEN COALESCE($expect, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS v$i"
      }.mkString(", ")
      val rows = checks.zipWithIndex.map { case ((name, _), i) =>
        s"""SELECT '$name' AS "check", n_rows, v$i AS n_violations, v$i = 0 AS pass FROM a"""
      }.mkString(" UNION ALL ")
      s"""WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, $aggCols FROM events)
         |$rows ORDER BY "check"""".stripMargin
    },

    // window-family twin: identical rank-based definitions
    "evt_percent_rank" ->
      """SELECT event_id, event_type, value,
        |       round(percent_rank() OVER (PARTITION BY event_type ORDER BY value), 9) AS pr,
        |       round(cume_dist() OVER (PARTITION BY event_type ORDER BY value), 9) AS cd
        |FROM events""".stripMargin,

    // pivot twin: conditional aggregation over the explicit type list
    "evt_pivot_daily" ->
      """SELECT date_trunc('day', ts) AS day,
        |       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
        |       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
        |FROM events GROUP BY 1""".stripMargin,

    // MAD twin: quantile_cont median, then quantile_cont of the absolute
    // deviation, same operand order inside the z division
    "evt_mad_zscore" ->
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |             FROM events GROUP BY event_type),
        |mad AS (SELECT e.event_type, med,
        |               quantile_cont(abs(value - med), 0.5) AS mad
        |        FROM events e JOIN med USING (event_type)
        |        GROUP BY e.event_type, med),
        |z AS (SELECT event_id, e.event_type, value,
        |             round((value - med) / (1.4826 * mad), 9) AS robust_z
        |      FROM events e JOIN mad ON e.event_type = mad.event_type)
        |SELECT event_id, event_type, value, robust_z
        |FROM z WHERE abs(robust_z) >= 2.5""".stripMargin,

    // PMI twin: exact integer numerator/denominator, one division inside
    // the ln, 9-dp round; selection by (pmi desc, t1, t2)
    "txt_cooccur" -> ErOracles.materializeCtes(
      s"""WITH dn AS (SELECT list_filter(string_split(${norm("text")}, ' '),
         |                               t -> length(t) > 0) AS toks FROM documents),
         |bg AS (SELECT toks[CAST(i AS INTEGER)] AS t1, toks[CAST(i AS INTEGER) + 1] AS t2
         |       FROM dn, unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS g(i)),
         |bc AS (SELECT t1, t2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY t1, t2),
         |uc AS (SELECT unnest(toks) AS token FROM dn),
         |ucc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM uc GROUP BY token),
         |tot AS (SELECT CAST(SUM(c12) AS BIGINT) AS n_big FROM bc),
         |sc AS (
         |  SELECT bc.t1, bc.t2, bc.c12,
         |         round(ln(CAST(tot.n_big * bc.c12 AS DOUBLE) /
         |                  CAST(u1.c * u2.c AS DOUBLE)), 9) AS pmi
         |  FROM bc JOIN ucc u1 ON bc.t1 = u1.token
         |          JOIN ucc u2 ON bc.t2 = u2.token
         |          CROSS JOIN tot
         |  WHERE bc.c12 >= 5),
         |top AS (SELECT t1, t2, c12, pmi FROM sc
         |        ORDER BY pmi DESC, t1 ASC, t2 ASC LIMIT 20)
         |SELECT t1, t2, c12, pmi,
         |       ROW_NUMBER() OVER (ORDER BY pmi DESC, t1 ASC, t2 ASC) AS rank
         |FROM top""".stripMargin)
  )

  /** Sliding-window burst twin, shared by batch and stream rows. */
  private val burstSql: String =
    """WITH ber AS (SELECT user_id, epoch_us(ts) AS us FROM events
      |             WHERE event_type = 'error'),
      |bwm AS (SELECT user_id,
      |               make_timestamp((us // 1800000000) * 1800000000 - o.o) AS window_start
      |        FROM ber, (SELECT unnest([CAST(0 AS BIGINT),
      |                                  CAST(1800000000 AS BIGINT)]) AS o) o)
      |SELECT window_start, user_id, CAST(COUNT(*) AS BIGINT) AS n
      |FROM bwm GROUP BY 1, 2 HAVING COUNT(*) >= 2""".stripMargin

  /** Unrolled BPE merge rounds, the twin of [[graft.text.Bpe]]: c0 is the
   * word vocabulary with per-character symbol lists; round k counts
   * weighted adjacent pairs (p\$k), argmaxes with the (n desc, a, b)
   * tiebreak (b\$k), and applies the position-parallel merge rule —
   * a match merges iff left != right (no overlap possible) or its offset
   * from the start of its run of left-symbols is even, exactly greedy
   * left-to-right (BpeSpec proves the rule against reference greedy). */
  private def bpeCtes(rounds: Int): String = {
    val base =
      s"""bpw AS (SELECT unnest(list_filter(string_split(${norm("text")}, ' '),
         |                      t -> length(t) > 0)) AS word FROM documents),
         |bwc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM bpw GROUP BY word),
         |c0 AS (SELECT word, cnt,
         |         list_transform(generate_series(1, length(word)),
         |                        i -> substr(word, CAST(i AS INTEGER), 1)) AS syms
         |       FROM bwc)""".stripMargin
    val steps = (1 to rounds).map { k =>
      val prev = s"c${k - 1}"
      s"""p$k AS (SELECT syms[CAST(i AS INTEGER)] AS a, syms[CAST(i AS INTEGER) + 1] AS b,
         |               CAST(SUM(cnt) AS BIGINT) AS n
         |        FROM $prev, unnest(generate_series(1, greatest(len(syms) - 1, 0))) AS g(i)
         |        GROUP BY 1, 2),
         |b$k AS (SELECT a, b, n FROM p$k ORDER BY n DESC, a ASC, b ASC LIMIT 1),
         |c$k AS (
         |  SELECT word, cnt,
         |    list_transform(
         |      list_filter(generate_series(1, len(s)),
         |                  i -> NOT (i > 1 AND COALESCE(ma[CAST(i AS INTEGER) - 1], FALSE))),
         |      i -> CASE WHEN ma[CAST(i AS INTEGER)] THEN a || b
         |                ELSE s[CAST(i AS INTEGER)] END) AS syms
         |  FROM (
         |    SELECT word, cnt, s, a, b,
         |      list_transform(generate_series(1, len(s)), i ->
         |        (i < len(s) AND s[CAST(i AS INTEGER)] = a AND s[CAST(i AS INTEGER) + 1] = b)
         |        AND (a <> b OR
         |             (i - (COALESCE(list_max(list_filter(generate_series(1, len(s)),
         |                     j -> j < i AND s[CAST(j AS INTEGER)] <> a)), 0) + 1)) % 2 = 0)) AS ma
         |    FROM (SELECT word, cnt, syms AS s FROM $prev) CROSS JOIN b$k))""".stripMargin
    }
    (base +: steps).mkString(",\n")
  }

  /** Unrolled Lloyd k-means CTEs: {p}c0 = k lowest-id vectors; then
   * assign/update pairs {p}a1,{p}c1 .. {p}a{iters},{p}c{iters}. Returns
   * (shared CTEs, final-assignment CTE). Textual twin of
   * [[graft.similarity.KMeans]] — element order, fixed-point scaling,
   * division associativity and tie-breaks all match. `edSql` defines the
   * `{p}ed(vec_id, ed: DOUBLE[dims])` training slice (defaults to the
   * full 64-dim embedding table); `p` prefixes every CTE name so
   * several independent trainings (the PQ subspaces) can share one WITH
   * clause. */
  private def kmeansCtesG(p: String, k: Int, iters: Int, dims: Int,
                          edSql: String): (Seq[String], String) = {
    def assign(name: String, cent: String): String =
      s"""$name AS (SELECT vec_id, cluster, ed, sqdist FROM (
         |  SELECT vec_id, cluster, ed, sqdist,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sqdist ASC, cluster ASC) AS rn
         |  FROM (SELECT e.vec_id, c.cluster, e.ed,
         |          list_reduce(list_prepend(0.0, list_transform(generate_series(1, $dims),
         |            i -> (e.ed[i] - c.centroid[i]) * (e.ed[i] - c.centroid[i]))),
         |            (acc, v) -> acc + v) AS sqdist
         |        FROM ${p}ed e CROSS JOIN $cent c) s0) s1 WHERE rn <= 1)""".stripMargin
    def update(name: String, asg: String): String =
      s"""$name AS (SELECT cluster, list(cval ORDER BY dim) AS centroid FROM (
         |  SELECT cluster, dim,
         |    CAST(SUM(vfix) AS DOUBLE) / 1000000.0 / CAST(COUNT(*) AS DOUBLE) AS cval
         |  FROM (SELECT a.cluster, d.i - 1 AS dim,
         |          CAST(round(a.ed[d.i] * 1000000.0) AS BIGINT) AS vfix
         |        FROM $asg a CROSS JOIN (SELECT unnest(generate_series(1, $dims)) AS i) d) v
         |  GROUP BY cluster, dim) g GROUP BY cluster)""".stripMargin
    val iterCtes = (1 to iters).flatMap(n =>
      Seq(assign(s"${p}a$n", s"${p}c${n - 1}"), update(s"${p}c$n", s"${p}a$n")))
    val ctes = Seq(
      s"${p}ed AS ($edSql)",
      s"""${p}c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS BIGINT) - 1 AS cluster,
         |         ed AS centroid
         |       FROM (SELECT vec_id, ed FROM ${p}ed ORDER BY vec_id LIMIT $k) q)""".stripMargin
    ) ++ iterCtes
    (ctes, assign(s"${p}afinal", s"${p}c$iters"))
  }

  private def kmeansCtes(k: Int, iters: Int,
                         src: String = "embeddings"): (Seq[String], String) =
    kmeansCtesG("", k, iters, dims = 64,
      edSql = s"SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS ed FROM $src")

  private def kmeansSql(k: Int, iters: Int): String = {
    val (ctes, afinal) = kmeansCtes(k, iters)
    s"""WITH ${(ctes :+ afinal).mkString(",\n")}
       |SELECT vec_id, cluster, round(sqdist, 9) AS sqdist FROM afinal""".stripMargin
  }

  /** Product-quantization CTE family — twin of
   * [[graft.similarity.ProductQuantization]]: m per-subspace unrolled
   * kmeans trainings over the 16-dim slices, the union codebook, the
   * argmin code assignment, and (for the ADC query) per-query lookup
   * tables + j-ordered score sums. Returns all CTEs up to `codes`. */
  private def pqCtes(m: Int, subDim: Int, k: Int, iters: Int): Seq[String] = {
    val base =
      "pqb AS (SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS ed FROM embeddings)"
    val trainings = (0 until m).flatMap { j =>
      kmeansCtesG(s"s$j", k, iters, subDim,
        edSql = s"SELECT vec_id, list_transform(generate_series(1, $subDim), i -> ed[${j * subDim} + i]) AS ed FROM pqb")._1
    }
    val cb = "cb AS (" + (0 until m)
      .map(j => s"SELECT $j AS j, cluster, centroid FROM s${j}c$iters")
      .mkString(" UNION ALL ") + ")"
    val subr =
      s"""subr AS (SELECT p.vec_id, j.j,
         |  list_transform(generate_series(1, $subDim), i -> p.ed[j.j * $subDim + i]) AS sub
         |  FROM pqb p CROSS JOIN (SELECT unnest(generate_series(0, ${m - 1})) AS j) j)""".stripMargin
    val codes = Seq(
      s"""codes0 AS (SELECT vec_id, j, cluster,
         |  ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY sqdist ASC, cluster ASC) AS rn
         |  FROM (SELECT e.vec_id, e.j, c.cluster,
         |          list_reduce(list_prepend(0.0, list_transform(generate_series(1, $subDim),
         |            i -> (e.sub[i] - c.centroid[i]) * (e.sub[i] - c.centroid[i]))),
         |            (acc, v) -> acc + v) AS sqdist
         |        FROM subr e JOIN cb c ON e.j = c.j) s)""".stripMargin,
      "codes AS (SELECT vec_id, j, cluster AS code FROM codes0 WHERE rn = 1)")
    (base +: trainings) ++ (Seq(cb, subr) ++ codes)
  }

  private def pqCodesSql(m: Int, subDim: Int, k: Int, iters: Int,
                         where: String = ""): String =
    s"""WITH ${pqCtes(m, subDim, k, iters).mkString(",\n")}
       |SELECT vec_id, CAST(j AS INTEGER) AS j, code FROM codes$where""".stripMargin

  /** The per-query ADC lookup table over `subr`/`cb` (from [[pqCtes]]). */
  private def pqLutCte(subDim: Int): String =
    s"""lut AS (SELECT q.vec_id AS query_id, c.j, c.cluster,
       |  list_reduce(list_prepend(0.0, list_transform(generate_series(1, $subDim),
       |    i -> q.sub[i] * c.centroid[i])), (acc, v) -> acc + v) AS v
       |  FROM subr q JOIN cb c ON q.j = c.j WHERE q.vec_id < 10)""".stripMargin

  /** ADC CTEs over `subr`/`cb`/`codes` (from [[pqCtes]]): per-query
   * lookup table, j-ordered score sums, per-query rank. */
  private def pqAdcCtes(subDim: Int): Seq[String] = Seq(
    pqLutCte(subDim),
    """scored AS (SELECT l.query_id, c.vec_id AS nn_id,
      |  round(list_reduce(list_prepend(0.0, list(l.v ORDER BY c.j)),
      |    (acc, v) -> acc + v), 9) AS approx
      |  FROM codes c JOIN lut l ON l.j = c.j AND l.cluster = c.code
      |  WHERE l.query_id <> c.vec_id
      |  GROUP BY l.query_id, c.vec_id)""".stripMargin,
    """ranked AS (SELECT query_id, nn_id, approx,
      |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY approx DESC, nn_id ASC) AS rn
      |  FROM scored)""".stripMargin)

  /** IVF+PQ twin: the trained coarse quantizer's lists (kmeansCtes, ""
   * prefix) prune candidates — probe assignment mirrors ivfKmeansSql's
   * rounded-cosine ranks — and the survivors are ADC-scored from their
   * codes via the shared lut CTE. */
  private def ivfpqSql(m: Int, subDim: Int, k: Int, iters: Int,
                       coarseK: Int, coarseIters: Int, nProbe: Int,
                       topK: Int): String = {
    val (coarse, _) = kmeansCtes(coarseK, coarseIters)
    val ivf = Seq(
      s"cent AS (SELECT cluster AS cid, centroid FROM c$coarseIters)",
      s"""asg0 AS (
         |  SELECT c.vec_id AS nn_id, cent.cid,
         |         ROW_NUMBER() OVER (PARTITION BY c.vec_id
         |           ORDER BY round(${cosine("c.embedding", "cent.centroid")}, 9) DESC, cent.cid ASC) AS rn
         |  FROM embeddings c CROSS JOIN cent)""".stripMargin,
      "asg AS (SELECT nn_id, cid FROM asg0 WHERE rn = 1)",
      s"""pr0 AS (
         |  SELECT q.vec_id AS query_id, cent.cid,
         |         ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |           ORDER BY round(${cosine("q.embedding", "cent.centroid")}, 9) DESC, cent.cid ASC) AS rn
         |  FROM embeddings q CROSS JOIN cent WHERE q.vec_id < 10)""".stripMargin,
      s"pr AS (SELECT query_id, cid FROM pr0 WHERE rn <= $nProbe)",
      """icand AS (SELECT pr.query_id, asg.nn_id
        |  FROM asg JOIN pr USING (cid) WHERE pr.query_id <> asg.nn_id)""".stripMargin,
      """iscored AS (SELECT ic.query_id, ic.nn_id,
        |  round(list_reduce(list_prepend(0.0, list(l.v ORDER BY c.j)),
        |    (acc, v) -> acc + v), 9) AS approx
        |  FROM icand ic
        |  JOIN codes c ON c.vec_id = ic.nn_id
        |  JOIN lut l ON l.query_id = ic.query_id AND l.j = c.j AND l.cluster = c.code
        |  GROUP BY ic.query_id, ic.nn_id)""".stripMargin,
      """iranked AS (SELECT query_id, nn_id, approx,
        |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY approx DESC, nn_id ASC) AS rn
        |  FROM iscored)""".stripMargin)
    s"""WITH ${(coarse ++ pqCtes(m, subDim, k, iters) ++ (pqLutCte(subDim) +: ivf)).mkString(",\n")}
       |SELECT query_id, nn_id, approx, rn FROM iranked WHERE rn <= $topK""".stripMargin
  }

  private def pqAdcSql(m: Int, subDim: Int, k: Int, iters: Int,
                       topK: Int): String =
    s"""WITH ${(pqCtes(m, subDim, k, iters) ++ pqAdcCtes(subDim)).mkString(",\n")}
       |SELECT query_id, nn_id, approx, rn FROM ranked WHERE rn <= $topK""".stripMargin

  /** Recall@topK of the ADC ranking against the exact brute-force
   * cosine top-k (the ann_brute_topk twin's CTEs, names b-prefixed). */
  private def pqRecallSql(m: Int, subDim: Int, k: Int, iters: Int,
                          topK: Int): String = {
    val brute = Seq(
      s"pqtop AS (SELECT query_id, nn_id FROM ranked WHERE rn <= $topK)",
      "bq AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10)",
      "bc AS (SELECT vec_id AS nn_id, embedding AS ce FROM embeddings)",
      s"""bscored AS (SELECT query_id, nn_id, round(${cosine("qe", "ce")}, 9) AS cos
         |  FROM bc CROSS JOIN bq WHERE query_id <> nn_id)""".stripMargin,
      """branked AS (SELECT query_id, nn_id,
        |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, nn_id ASC) AS rn
        |  FROM bscored)""".stripMargin,
      s"btop AS (SELECT query_id, nn_id FROM branked WHERE rn <= $topK)",
      """hits AS (SELECT b.query_id, CAST(COUNT(*) AS BIGINT) AS hits
        |  FROM btop b JOIN pqtop p ON b.query_id = p.query_id AND b.nn_id = p.nn_id
        |  GROUP BY 1)""".stripMargin)
    s"""WITH ${(pqCtes(m, subDim, k, iters) ++ pqAdcCtes(subDim) ++ brute).mkString(",\n")}
       |SELECT q.query_id, CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
       |       CAST(COALESCE(h.hits, 0) AS DOUBLE) / $topK.0 AS recall_at_$topK
       |FROM (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 10) q
       |LEFT JOIN hits h ON q.query_id = h.query_id""".stripMargin
  }

  /** SemDeDup twin: the ann_cos_neardup_hi planted union, the unrolled
   * kmeans CTEs clustered over it, within-cluster pairs at round(cos, 9)
   * >= tau, greedy smallest-id drop, every vector flagged. */
  private def semDedupSql(k: Int, iters: Int, tau: String): String = {
    val planted = Seq(
      """pl AS (
        |  SELECT vec_id + 10000000 AS vec_id,
        |         list_transform(generate_series(1, 64),
        |           i -> CAST(CAST(embedding[i] AS DOUBLE) + 0.01 * CAST(embedding[(i % 64) + 1] AS DOUBLE) AS FLOAT)) AS embedding
        |  FROM embeddings WHERE vec_id % 20 = 0)""".stripMargin,
      """allv AS (SELECT vec_id, embedding FROM embeddings
        |         UNION ALL SELECT vec_id, embedding FROM pl)""".stripMargin)
    val (ctes, afinal) = kmeansCtes(k, iters, src = "allv")
    val semdedup = Seq(
      "asg AS (SELECT vec_id, cluster FROM afinal)",
      """av AS (SELECT a.vec_id, a.cluster, v.embedding
        |       FROM asg a JOIN allv v USING (vec_id))""".stripMargin,
      s"""dropped AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM av a JOIN av b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |  WHERE round(${cosine("a.embedding", "b.embedding")}, 9) >= $tau)""".stripMargin)
    s"""WITH ${(planted ++ ctes ++ Seq(afinal) ++ semdedup).mkString(",\n")}
       |SELECT av.vec_id, av.cluster, (d.vec_id IS NULL) AS kept
       |FROM av LEFT JOIN dropped d ON av.vec_id = d.vec_id""".stripMargin
  }

  /** IVF probe/rank SQL against the trained c{iters} centroid table —
   * the ann_ivf_topk twin with kmeans lists instead of lowest-id
   * placeholder centroids. */
  private def ivfKmeansSql(k: Int, iters: Int, nProbe: Int, topK: Int): String = {
    val (ctes, _) = kmeansCtes(k, iters)
    val ivf = Seq(
      s"cent AS (SELECT cluster AS cid, centroid FROM c$iters)",
      s"""asg0 AS (
         |  SELECT c.vec_id AS nn_id, c.embedding AS ce, cent.cid,
         |         ROW_NUMBER() OVER (PARTITION BY c.vec_id
         |           ORDER BY round(${cosine("c.embedding", "cent.centroid")}, 9) DESC, cent.cid ASC) AS rn
         |  FROM embeddings c CROSS JOIN cent)""".stripMargin,
      "asg AS (SELECT nn_id, ce, cid FROM asg0 WHERE rn = 1)",
      s"""pr0 AS (
         |  SELECT q.vec_id AS query_id, q.embedding AS qe, cent.cid,
         |         ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |           ORDER BY round(${cosine("q.embedding", "cent.centroid")}, 9) DESC, cent.cid ASC) AS rn
         |  FROM embeddings q CROSS JOIN cent WHERE q.vec_id < 10)""".stripMargin,
      s"pr AS (SELECT query_id, qe, cid FROM pr0 WHERE rn <= $nProbe)",
      s"""cand AS (
         |  SELECT pr.query_id, asg.nn_id, round(${cosine("pr.qe", "asg.ce")}, 9) AS cos
         |  FROM asg JOIN pr USING (cid) WHERE pr.query_id <> asg.nn_id)""".stripMargin,
      """ranked AS (
        |  SELECT query_id, nn_id, cos,
        |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, nn_id ASC) AS rn
        |  FROM cand)""".stripMargin)
    s"""WITH ${(ctes ++ ivf).mkString(",\n")}
       |SELECT query_id, nn_id, cos, rn FROM ranked WHERE rn <= $topK""".stripMargin
  }
}
