package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.util.Snapshot

/**
 * One-call corpus curation: the configurable facade over the
 * training-data operators — analysis → dedup survivorship → quality and
 * language gates → benchmark decontamination → per-domain capping →
 * sequence packing, each stage a config knob delegating to the
 * standalone operator (CurationPipelineSpec proves the composition
 * equals hand-wiring). The curation twin of
 * [[graft.er.ErPipeline]].
 *
 * Input is the `documents` shape (doc_id, text, lang, source, …); stage
 * boundaries are Snapshot-materialized.
 */
object CurationPipeline {

  case class Config(
      dedup: String = "exact",           // exact | minhash | none
      shingleN: Int = 3,
      minhashK: Int = 16,
      minhashBands: Int = 4,
      minQuality: Double = 0.5,
      langs: Seq[String] = Seq("en"),    // empty = keep all languages
      benchDocs: Option[DataFrame] = None, // decontamination eval side
      deconMinShared: Long = 3L,
      domainCapK: Int = 0,               // 0 = no per-domain cap
      packBudget: Int = 0)               // 0 = no packing

  /** curated: surviving docs with their analysis columns (doc_id,
   * n_tokens, quality, lang_id); packed: (doc_id, n_tokens, bin_id)
   * over the curated set when packBudget > 0, else empty. */
  case class Result(curated: DataFrame, packed: DataFrame)

  def run(docs: DataFrame, config: Config = Config()): Result = {
    val analysis = Snapshot(TextAnalysis.analyze(docs, "text"))
    val surviving = config.dedup match {
      case "none" => docs.select("doc_id")
      case "exact" =>
        Dedup.exact(docs).filter(col("doc_id") === col("rep_id")).select("doc_id")
      case "minhash" =>
        val sh = Snapshot(Dedup.shingles(docs, n = config.shingleN))
        val pairs = Dedup.minhashLsh(sh, k = config.minhashK,
          bands = config.minhashBands).select("d1", "d2")
        // quality-aware survivorship: keep each near-dup cluster's best
        Dedup.survivors(Dedup.clusters(docs, pairs),
            analysis.select(col("doc_id"), col("quality")), scoreCol = "quality")
          .select(col("survivor_id").as("doc_id"))
      case other => throw new IllegalArgumentException(
        s"unknown dedup '$other' (exact | minhash | none)")
    }
    var curated = analysis
      .join(surviving, Seq("doc_id"), "left_semi")
      .filter(col("quality") >= config.minQuality)
    if (config.langs.nonEmpty)
      curated = curated.filter(col("lang_id").isin(config.langs: _*))
    config.benchDocs.foreach { bench =>
      val contaminated = Dedup.containment(
          Dedup.shingles(docs, n = config.shingleN),
          Dedup.shingles(bench, n = config.shingleN),
          minShared = config.deconMinShared)
        .select("doc_id").distinct()
      curated = curated.join(contaminated, Seq("doc_id"), "left_anti")
    }
    if (config.domainCapK > 0) {
      val capped = Curation.domainCap(
        docs.join(curated.select("doc_id"), Seq("doc_id"), "left_semi"),
        k = config.domainCapK)
      curated = curated.join(capped.select("doc_id"), Seq("doc_id"), "left_semi")
    }
    val curatedSnap = Snapshot(
      curated.select("doc_id", "n_tokens", "quality", "lang_id"))
    val packed =
      if (config.packBudget > 0)
        Snapshot(Curation.packSequences(
          docs.join(curatedSnap.select("doc_id"), Seq("doc_id"), "left_semi"),
          budget = config.packBudget))
      else curatedSnap.limit(0)
        .select(col("doc_id"), col("n_tokens"), lit(0L).as("bin_id"))
    Result(curatedSnap, packed)
  }
}
