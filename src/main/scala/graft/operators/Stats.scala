package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed rank statistics. Spearman's rho per group without ever
 * ranking rows in a single window partition: ranks come from a
 * value-COUNT prefix sum (graft.util.Prefix — two O(N) passes), doubled
 * so tie-averages stay integers, and every moment is a BIGINT sum —
 * bit-stable under any partitioning. Only the final combination runs in
 * doubles, as one fixed op sequence both engines reproduce exactly.
 *
 * BIGINT headroom: rank2 <= 2N per group, so the largest moment is
 * <= 4N^3 — exact to ~1.3M rows per group; beyond that the moment
 * columns move to DECIMAL(38,0) with the same plan.
 */
object Stats {

  /** Doubled average rank of `expr` within each `group`: one count
   * aggregate + the distributed prefix, per-group offsets derived from
   * the prefix itself.
   * Returns (group, x, out) where out = 2*(rows before the tie block)
   * + tie count + 1 — an exact BIGINT. */
  private def rank2(df: DataFrame, group: Column, expr: Column,
                    out: String): DataFrame = {
    val vc = df.groupBy(group.as("g"), expr.as("x"))
      .agg(count(lit(1)).as("cnt"))
    val cum = graft.util.Prefix.runningSum(vc,
      Seq(col("g").asc, col("x").asc), col("cnt").cast("double"), "cum")
    // group offsets derived from the prefix itself (min(cum - cnt) per
    // group — exact for integer counts in doubles): no single-partition
    // window, so the group domain is unbounded
    val off = cum.groupBy("g").agg(
      min(col("cum") - col("cnt").cast("double")).as("off"))
    cum.join(off, Seq("g"))
      .select(col("g"), col("x"),
        (lit(2L) * (col("cum") - col("off") - col("cnt")).cast("long")
          + col("cnt") + 1L).as(out))
  }

  /** Exact quantile binning per group, no global row window: each
   * DISTINCT value's bin is floor(#rows-before-it * n / N), clamped to
   * n-1 — ties always share a bin, every bin boundary is exact (not
   * sampled like approxQuantile). Same value-count prefix machinery as
   * [[spearman]]: two O(N) passes, shuffles carry distinct values only.
   * Returns (group, value, bin). */
  def quantileBins(df: DataFrame, groupCol: String, valueCol: String,
                   n: Int): DataFrame = {
    require(n >= 2)
    val base = df.select(col(groupCol).as("g"), col(valueCol).as("x"))
    val vc = base.groupBy("g", "x").agg(count(lit(1)).as("cnt"))
    val cum = graft.util.Prefix.runningSum(vc,
      Seq(col("g").asc, col("x").asc), col("cnt").cast("double"), "cum")
    // same derived-offset shape as [[rank2]]: min(cum - cnt) per group,
    // no single-partition window, unbounded group domains OK
    val off = cum.groupBy("g").agg(sum("cnt").cast("double").as("n_g"),
      min(col("cum") - col("cnt").cast("double")).as("off"))
    cum.join(off, Seq("g"))
      .select(col("g").as(groupCol), col("x").as(valueCol),
        least(lit(n - 1).cast("long"),
          floor((col("cum") - col("off") - col("cnt")) * n / col("n_g"))
            .cast("long")).as("bin"))
  }

  /**
   * Exact interpolated percentiles per group WITHOUT buffering group
   * values in the aggregation state. Spark's `percentile()` (and DuckDB's
   * `quantile_cont`) hold each group's full value histogram in the agg
   * buffer — O(distinct values per group) memory, an OOM on a 100 TB
   * table with a handful of giant groups. This is the scale-safe twin:
   * the same distinct-value count prefix as [[quantileBins]] (two O(N)
   * passes, shuffles carry distinct values only, O(1) task memory), then
   * each requested percentile is answered with two conditional-min
   * aggregates over the distinct values.
   *
   * Bit-parity with Spark's `percentile` is deliberate: for position
   * `pos = p * (n-1)`, `lower = floor(pos)`, `higher = ceil(pos)`, the
   * bracketing values are the first distinct values whose inclusive
   * cumulative count reaches `lower+1` / `higher+1`, and the combination
   * is the identical double sequence
   * `(higher - pos) * vLo + (pos - lower) * vHi` with the same
   * short-circuits (`higher == lower` or `vHi == vLo` → `vLo`), so
   * results match the buffering aggregate to the last ulp.
   *
   * @param ps      (outputColumn, percentile) pairs, each p in [0,1]
   * @param countCol if set, also emit the group's non-null value count
   * @return one row per group: groupCols ++ ps ++ countCol, percentiles
   *         as doubles
   */
  /** Shared spine of the exact-percentile family: one row per distinct
   * (group, value) carrying `cumg` = #rows in the group with value <= x
   * (inclusive rank prefix) and the group size `n_g`. Two O(N) passes,
   * shuffles carry distinct values only. */
  private def rankedPrefix(df: DataFrame, groupCols: Seq[String],
                           valueCol: String,
                           weight: Column = lit(1L)): DataFrame = {
    val base = df.filter(col(valueCol).isNotNull)
      .select(struct(groupCols.map(col): _*).as("g"), col(valueCol).as("x"),
        weight.cast("long").as("_w"))
    val vc = base.groupBy("g", "x").agg(sum(col("_w")).as("cnt"))
    val cum = graft.util.Prefix.runningSum(vc,
      Seq(col("g").asc, col("x").asc), col("cnt").cast("double"), "cum")
    // per-group offsets through a SECOND distributed prefix over the
    // one-row-per-group totals — tiny input, already scale-correct (no
    // single-partition window, no forced broadcast: AQE picks broadcast
    // vs shuffle join from the actual group count, so millions of groups
    // survive). Deliberately NOT the min(cum - cnt) fusion the bounded
    // siblings use: deriving offsets from `cum` makes its whole
    // distinct-value window execute twice (measured neutral-to-worse),
    // while this second prefix runs over one row per group.
    val off = graft.util.Prefix.runningSum(
        vc.groupBy("g").agg(sum("cnt").as("n_g")),
        Seq(col("g").asc), col("n_g").cast("double"), "cumN")
      .select(col("g"), col("n_g"),
        (col("cumN") - col("n_g").cast("double")).as("off"))
    cum.join(off, Seq("g"))
      .select(col("g"), col("x"),
        (col("cum") - col("off")).cast("long").as("cumg"), col("n_g"))
  }

  /** `weight`: occurrence count per input row (default 1 — plain rows).
   * Passing a pre-aggregated value-count table with `weight = col(cnt)`
   * yields bit-identical percentiles to feeding the raw rows — the rank
   * prefix sums the exact same integer counts — while every walk after
   * the aggregation touches only DISTINCT (group, value) rows (guide §2:
   * two consumers of the same value-count structure share one O(N)
   * aggregation instead of re-scanning the raw input each). */
  def exactPercentiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       ps: Seq[(String, Double)],
                       countCol: Option[String] = None,
                       weight: Column = lit(1L)): DataFrame = {
    require(groupCols.nonEmpty && ps.nonEmpty)
    require(ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      s"percentiles must be in [0,1]: $ps")
    val ranked = rankedPrefix(df, groupCols, valueCol, weight)
    val braceAggs = ps.flatMap { case (nm, p) =>
      val pos = (col("n_g") - 1).cast("double") * lit(p)
      Seq(
        min(when(col("cumg") >= floor(pos) + 1, col("x"))).as(s"_lo_$nm"),
        min(when(col("cumg") >= ceil(pos) + 1, col("x"))).as(s"_hi_$nm"))
    }
    val allAggs = min(col("n_g")).as("_n") +: braceAggs
    val agg = ranked.groupBy("g").agg(allAggs.head, allAggs.tail: _*)
    val outPs = ps.map { case (nm, p) =>
      val pos = (col("_n") - 1).cast("double") * lit(p)
      val lower = floor(pos)
      val higher = ceil(pos)
      val vLo = col(s"_lo_$nm").cast("double")
      val vHi = col(s"_hi_$nm").cast("double")
      when(higher === lower || vHi.isNull || vHi === vLo, vLo)
        .otherwise((higher.cast("double") - pos) * vLo
          + (pos - lower.cast("double")) * vHi)
        .as(nm)
    }
    val outCols = groupCols.map(c => col("g").getField(c).as(c)) ++
      outPs ++ countCol.map(nc => col("_n").as(nc)).toSeq
    agg.select(outCols: _*)
  }

  /**
   * DISCRETE exact percentiles per group — an actually-occurring value,
   * never an interpolation: the value at 0-indexed rank
   * `ceil(p*n) - 1` (clamped to 0), which is DuckDB's `quantile_disc`
   * (probed: (n=10, p=0.95) → the max; (n=4, p=0.5) → the 2nd).
   * Output keeps the INPUT column's type — on integer inputs the result
   * is exact with no doubles anywhere. Same [[rankedPrefix]] spine as
   * [[exactPercentiles]]: O(1) task memory, distinct-value shuffles.
   */
  def exactPercentilesDisc(df: DataFrame, groupCols: Seq[String],
                           valueCol: String, ps: Seq[(String, Double)],
                           countCol: Option[String] = None): DataFrame = {
    require(groupCols.nonEmpty && ps.nonEmpty)
    require(ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      s"percentiles must be in [0,1]: $ps")
    val ranked = rankedPrefix(df, groupCols, valueCol)
    val braceAggs = ps.map { case (nm, p) =>
      // 1-indexed target rank: max(1, ceil(p * n)) — p*n in doubles,
      // matching DuckDB's float index computation
      val k = greatest(lit(1L), ceil(lit(p) * col("n_g").cast("double")))
      min(when(col("cumg") >= k, col("x"))).as(nm)
    }
    val allAggs = min(col("n_g")).as("_n") +: braceAggs
    val agg = ranked.groupBy("g").agg(allAggs.head, allAggs.tail: _*)
    val outCols = groupCols.map(c => col("g").getField(c).as(c)) ++
      ps.map { case (nm, _) => col(nm) } ++
      countCol.map(nc => col("_n").as(nc)).toSeq
    agg.select(outCols: _*)
  }

  /**
   * WEIGHTED discrete quantiles per group: the smallest value whose
   * inclusive cumulative WEIGHT reaches `p` of the group's total weight
   * — e.g. a quality threshold placed by token MASS rather than document
   * count, so one giant document counts as its size, not as one vote.
   * Weights must be non-negative integers (token counts, byte sizes);
   * all rank arithmetic stays in exact BIGINT sums, the only doubles are
   * the `cumW >= p·W` threshold compares, which the DuckDB twin states
   * identically. Same [[rankedPrefix]] spine: O(1) task memory,
   * distinct-value shuffles.
   *
   * @param totalCol if set, also emit the group's total weight
   */
  def weightedQuantilesDisc(df: DataFrame, groupCols: Seq[String],
                            valueCol: String, weightCol: String,
                            ps: Seq[(String, Double)],
                            totalCol: Option[String] = None): DataFrame = {
    require(groupCols.nonEmpty && ps.nonEmpty)
    require(ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      s"quantiles must be in [0,1]: $ps")
    // Enforce the documented non-negative-weight contract at runtime: a
    // negative weight silently breaks cumulative-weight monotonicity (the
    // min(when(cumW >= p·W)) rank lookup returns a wrong quantile with no
    // error), so fail the job loudly instead. Row-local codegen'd check —
    // no extra pass.
    val weightChecked = df.filter(col(weightCol).isNotNull)
      .withColumn(weightCol,
        when(col(weightCol) < 0, raise_error(concat(
          lit(s"weightedQuantilesDisc: negative weight in '$weightCol': "),
          col(weightCol).cast("string"))))
        .otherwise(col(weightCol)))
    val ranked = rankedPrefix(weightChecked, groupCols, valueCol, col(weightCol))
    val braceAggs = ps.map { case (nm, p) =>
      min(when(col("cumg").cast("double") >=
        lit(p) * col("n_g").cast("double"), col("x"))).as(nm)
    }
    val allAggs = min(col("n_g")).as("_n") +: braceAggs
    val agg = ranked.groupBy("g").agg(allAggs.head, allAggs.tail: _*)
    val outCols = groupCols.map(c => col("g").getField(c).as(c)) ++
      ps.map { case (nm, _) => col(nm) } ++
      totalCol.map(nc => col("_n").as(nc)).toSeq
    agg.select(outCols: _*)
  }

  /** Spearman rank correlation of `xCol` vs `yCol` per `groupCol`.
   * Returns (<groupCol>, n, rho) with rho rounded to 9 decimals. */
  def spearman(df: DataFrame, groupCol: String, xCol: String,
               yCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("g"), col(xCol).as("xv"),
      col(yCol).as("yv"))
    val xr = rank2(base, col("g"), col("xv"), "rx").withColumnRenamed("x", "xv")
    val yr = rank2(base, col("g"), col("yv"), "ry").withColumnRenamed("x", "yv")
    val m = base
      .join(xr, Seq("g", "xv")).join(yr, Seq("g", "yv"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum("rx").as("sx"), sum("ry").as("sy"),
        sum(col("rx") * col("rx")).as("sxx"), sum(col("ry") * col("ry")).as("syy"),
        sum(col("rx") * col("ry")).as("sxy"))
    m.select(col("g").as(groupCol), col("n"),
      round((col("n").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double"))
        / (sqrt(col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double"))
          * sqrt(col("n").cast("double") * col("syy").cast("double")
            - col("sy").cast("double") * col("sy").cast("double"))), 9)
        .as("rho"))
  }
}
