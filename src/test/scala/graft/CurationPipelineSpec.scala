package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.CurationPipeline

/** The one-call curation facade must equal the hand-wired composition —
 * anchored to the oracle-checked txt_curate chain. */
class CurationPipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("default config equals the oracle-checked txt_curate chain") {
    val r = CurationPipeline.run(docs)
    val expect = graft.queries.TrainQueries.all("txt_curate")(spark, sf)
    assert(r.curated.collect().map(_.toString).sorted.toSeq
      == expect.collect().map(_.toString).sorted.toSeq)
    assert(r.packed.count() == 0) // packing off by default
  }

  test("knobs gate monotonically; decontamination and capping drop docs") {
    val all = CurationPipeline.run(docs,
      CurationPipeline.Config(dedup = "none", minQuality = 0.0, langs = Nil))
    assert(all.curated.count() == docs.count())
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val decon = CurationPipeline.run(docs, CurationPipeline.Config(
      dedup = "none", minQuality = 0.0, langs = Nil, benchDocs = Some(bench)))
    // the bench docs contaminate at least themselves (identical shingles)
    assert(decon.curated.count() < all.curated.count())
    val capped = CurationPipeline.run(docs, CurationPipeline.Config(
      dedup = "none", minQuality = 0.0, langs = Nil, domainCapK = 3))
    val perSource = docs.join(capped.curated.select("doc_id"), Seq("doc_id"))
      .groupBy("source").count().agg(max("count")).as[Long].head()
    assert(perSource <= 3)
  }

  test("minhash dedup keeps each cluster's best-quality doc; packing bins appear") {
    val r = CurationPipeline.run(docs, CurationPipeline.Config(
      dedup = "minhash", minQuality = 0.0, langs = Nil, packBudget = 256))
    assert(r.curated.count() > 0)
    assert(r.packed.select("bin_id").distinct().count() > 1)
    // packed rows are exactly the curated docs
    assert(r.packed.count() == r.curated.count())
  }
}
