package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.er.{ErPipeline, WeightType}

/** The one-call facade must compose the standalone operators EXACTLY —
 * asserted by equality with the hand-wired oracle-checked chain. */
class ErPipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("default config reproduces the hand-wired dirty chain end to end") {
    val r = ErPipeline.run(
      graft.queries.ErQueries.partAttrs(spark, sf, twoSources = false))
    assert(rows(r.matches) ==
      rows(graft.queries.ErQueries.matchedPairs(spark, sf)))
    assert(rows(r.entities) ==
      rows(graft.queries.ErQueries.entities(spark, sf)))
    assert(r.candidates.count() > r.matches.count())
  }

  test("clean config runs record linkage; stage knobs change the result") {
    val attrs = graft.queries.ErQueries.partAttrs(spark, sf, twoSources = true)
    val base = ErPipeline.run(attrs, ErPipeline.Config(clean = true))
    assert(base.matches.count() > 0)
    // every match crosses sources (parity split): p1 and p2 differ mod 2
    assert(base.matches.filter("p1 % 2 = p2 % 2").count() == 0)
    val js = ErPipeline.run(attrs,
      ErPipeline.Config(clean = true, weight = WeightType.JS))
    assert(js.candidates.count() != base.candidates.count())
    val jw = ErPipeline.run(attrs, ErPipeline.Config(clean = true,
      matcher = "jaro-winkler", matchThreshold = 0.8))
    assert(jw.matches.columns.toSeq == Seq("p1", "p2", "sim"))
  }

  test("matcher none passes candidates through; bad knobs throw") {
    val attrs = graft.queries.ErQueries.partAttrs(spark, sf, twoSources = false)
    val r = ErPipeline.run(attrs, ErPipeline.Config(matcher = "none"))
    assert(rows(r.matches) == rows(r.candidates))
    intercept[IllegalArgumentException](
      ErPipeline.run(attrs, ErPipeline.Config(blocking = "sorted")))
    intercept[IllegalArgumentException](
      ErPipeline.run(attrs, ErPipeline.Config(pruning = "cnp")))
  }
}
