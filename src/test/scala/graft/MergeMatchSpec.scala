package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.er.Matching
import graft.operators.Merge
import graft.text.Curation

/** Unit fixtures for the CDC merge / SCD2 / one-to-one matching /
 * sketch-and-sample operators added in round 6. */
class MergeMatchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def chg(rows: (Long, Long, Long, Double)*): DataFrame =
    rows.toDF("id", "k", "t", "v")
      .select(col("id"), col("k"), col("t").cast("timestamp").as("t"), col("v"))

  test("upsertLatest: updates win, new keys insert, untouched base survives") {
    val base = chg((1L, 10L, 100L, 1.0), (2L, 20L, 100L, 2.0))
    val upd = chg((3L, 10L, 200L, 9.0), (4L, 30L, 50L, 3.0))
    val r = Merge.upsertLatest(base, upd, Seq("k"), Seq(col("t"), col("id")))
      .select("k", "id", "v").as[(Long, Long, Double)].collect().toSet
    assert(r == Set((10L, 3L, 9.0), (20L, 2L, 2.0), (30L, 4L, 3.0)))
  }

  test("upsertLatest: equal timestamps fall back to the id tiebreak") {
    val base = chg((1L, 10L, 100L, 1.0))
    val upd = chg((2L, 10L, 100L, 2.0))
    val r = Merge.upsertLatest(base, upd, Seq("k"), Seq(col("t"), col("id")))
      .select("id").as[Long].collect().toSeq
    assert(r == Seq(2L))
  }

  test("upsertLatest is batch-composable and idempotent (CDC algebra)") {
    val rnd = new scala.util.Random(7)
    def batch(ids: Range) = chg(ids.map(i =>
      (i.toLong, (i % 5).toLong, rnd.nextInt(50).toLong, rnd.nextDouble())): _*)
    val base = batch(0 until 10)
    val u1 = batch(10 until 20)
    val u2 = batch(20 until 30)
    def up(b: org.apache.spark.sql.DataFrame, u: org.apache.spark.sql.DataFrame) =
      Merge.upsertLatest(b, u, Seq("k"), Seq(col("t"), col("id")))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    // applying batches one at a time == applying their union at once
    val sequential = rows(up(up(base, u1), u2))
    val atOnce = rows(up(base, u1.unionByName(u2)))
    assert(sequential == atOnce)
    // replaying the same changes over the merged state changes nothing
    val merged = up(base, u1.unionByName(u2))
    assert(rows(up(merged, u1.unionByName(u2))) == atOnce)
  }

  test("snapshotDiff changes replayed through upsertLatest reconstruct the target") {
    val a = chg((1L, 10L, 100L, 1.0), (2L, 20L, 100L, 2.0), (3L, 30L, 100L, 3.0))
    val b = chg((4L, 10L, 200L, 9.0), (2L, 20L, 100L, 2.0), (5L, 40L, 50L, 4.0),
      (3L, 30L, 100L, 3.0))
    val changed = Merge.snapshotDiff(a, b, Seq("k"), "id")
      .filter(col("status").isin("added", "changed"))
      .select(col("k"), col("b_version").as("id"))
    val replay = b.join(changed, Seq("k", "id"), "left_semi")
    val rebuilt = Merge.upsertLatest(a, replay, Seq("k"), Seq(col("t"), col("id")))
    assert(rebuilt.collect().map(_.toString).sorted.toSeq
      == b.collect().map(_.toString).sorted.toSeq)
  }

  test("scd2: intervals chain, only the last version is current") {
    val r = Merge.scd2(chg((1L, 10L, 100L, 1.0), (2L, 10L, 200L, 2.0),
        (3L, 20L, 150L, 3.0)), Seq("k"), "t", "id")
      .select("id", "valid_from", "valid_to", "is_current")
      .as[(Long, Timestamp, Option[Timestamp], Boolean)].collect().toSet
    assert(r == Set(
      (1L, ts(100), Some(ts(200)), false),
      (2L, ts(200), None, true),
      (3L, ts(150), None, true)))
  }

  test("scd2: equal change timestamps order by the tiebreak column") {
    val r = Merge.scd2(chg((5L, 10L, 100L, 1.0), (4L, 10L, 100L, 2.0)),
        Seq("k"), "t", "id")
      .select("id", "is_current").as[(Long, Boolean)].collect().toMap
    assert(r == Map(4L -> false, 5L -> true))
  }

  private def pairs(rows: (Long, Long, Double)*): DataFrame =
    rows.toDF("p1", "p2", "w")

  test("reciprocalBestMatch keeps only mutually-best pairs") {
    // 1's best is 2 (0.9); 2's best is 1; 3's best is 2 (0.8) but 2
    // prefers 1 -> (2,3) drops; 4-5 mutual at 0.7
    val r = Matching.reciprocalBestMatch(
        pairs((1L, 2L, 0.9), (2L, 3L, 0.8), (4L, 5L, 0.7)))
      .select("p1", "p2").as[(Long, Long)].collect().toSet
    assert(r == Set((1L, 2L), (4L, 5L)))
  }

  test("reciprocalBestMatch: equal weights break ties toward the smaller partner") {
    // 2's candidates 1 and 3 tie at 0.5 -> 2 prefers 1; (2,3) must drop
    // even though 3's best is 2
    val r = Matching.reciprocalBestMatch(
        pairs((1L, 2L, 0.5), (2L, 3L, 0.5)))
      .select("p1", "p2").as[(Long, Long)].collect().toSet
    assert(r == Set((1L, 2L)))
  }

  test("maximalMatching: later rounds match what round 1 left unmatched") {
    // path 1-2-3-4 with decreasing weights: round 1 takes (1,2) [mutual]
    // and leaves 3-4 — (2,3) blocked by 2's preference for 1; round 2
    // then takes (3,4). The union covers all four nodes, still a matching.
    val p = pairs((1L, 2L, 0.9), (2L, 3L, 0.8), (3L, 4L, 0.7))
    val r = Matching.maximalMatching(p, rounds = 2)
      .select("p1", "p2", "round").as[(Long, Long, Int)].collect().toSet
    // round 1: only (1,2) is mutual — 3 prefers 2, who prefers 1; with
    // nodes 1,2 removed, round 2 matches (3,4)
    assert(r == Set((1L, 2L, 1), (3L, 4L, 2)))
    val nodes = r.toSeq.flatMap { case (a, b, _) => Seq(a, b) }
    assert(nodes.distinct.length == nodes.length)
  }

  test("reciprocalBestMatch output is a matching: every node at most once") {
    val r = Matching.reciprocalBestMatch(pairs(
        (1L, 2L, 0.9), (1L, 3L, 0.8), (2L, 3L, 0.7), (3L, 4L, 0.6),
        (5L, 6L, 0.5), (4L, 6L, 0.4)))
      .select("p1", "p2").as[(Long, Long)].collect()
    val nodes = r.flatMap { case (a, b) => Seq(a, b) }
    assert(nodes.distinct.length == nodes.length)
  }

  private def docsDf(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("cmsEstimates: point estimates always dominate true counts") {
    val d = docsDf((1L, "a a b c"), (2L, "a b d"), (3L, "c c e"))
    val r = Curation.cmsEstimates(d, depth = 2, width = 4, topN = 10)
      .select("token", "cnt", "est").as[(String, Long, Long)].collect()
    assert(r.length == 5)
    assert(r.forall { case (_, cnt, est) => est >= cnt })
    val cnts = r.map { case (t, cnt, _) => t -> cnt }.toMap
    assert(cnts == Map("a" -> 3L, "b" -> 2L, "c" -> 3L, "d" -> 1L, "e" -> 1L))
  }

  test("cmsEstimates: wide sketch with few tokens is exact") {
    val d = docsDf((1L, "x y"), (2L, "x"))
    val r = Curation.cmsEstimates(d, depth = 4, width = 1024, topN = 10)
      .select("token", "cnt", "est").as[(String, Long, Long)].collect()
    // 2 tokens into 1024 buckets over 4 independent rows: some row
    // separates them, so min-over-rows equals the true count
    assert(r.toSet == Set(("x", 2L, 2L), ("y", 1L, 1L)))
  }

  test("weightedSample: k bounds the sample and heavier rows rank by priority") {
    val d = (1L to 100L).map(i => (i, "t", i % 10 + 1L))
      .toDF("doc_id", "text", "n_chars")
    val r = Curation.weightedSample(d, k = 10, weightCol = "n_chars")
    assert(r.count() == 10)
    // deterministic: same call twice yields the same sample
    val a = r.select("doc_id").as[Long].collect().toSeq
    val b = Curation.weightedSample(d, k = 10, weightCol = "n_chars")
      .select("doc_id").as[Long].collect().toSeq
    assert(a == b)
  }

  test("snapshotDiff reports added, removed, and changed; identical keys drop") {
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("k", "v")
    val b = Seq((10L, 9L), (20L, 2L), (40L, 4L)).toDF("k", "v")
    val r = Merge.snapshotDiff(a, b, Seq("k"), "v")
      .select("k", "status").as[(Long, String)].collect().toSet
    assert(r == Set((10L, "changed"), (30L, "removed"), (40L, "added")))
  }

  test("snapshotDiff of identical snapshots is empty") {
    val a = Seq((1L, 1L), (2L, 2L)).toDF("k", "v")
    assert(Merge.snapshotDiff(a, a, Seq("k"), "v").count() == 0)
  }

  test("pmiBigrams favors exclusive collocations over frequent-word pairs") {
    // "tick tock" always co-occur exclusively; "the end" shares 'the'
    // with many other bigrams -> lower PMI
    val d = (1L to 10L).map(i => (i, "tick tock the end the start the middle"))
      .toDF("doc_id", "text")
    val r = Curation.pmiBigrams(d, minCount = 5, topK = 3)
      .select("t1", "t2", "rank").as[(String, String, Int)].collect()
    assert(r.head._1 == "tick" && r.head._2 == "tock" && r.head._3 == 1)
  }

  test("pmiBigrams: bigrams under minCount never rank; short docs contribute nothing") {
    val d = Seq((1L, "a b"), (2L, "a b"), (3L, "c")).toDF("doc_id", "text")
    val r = Curation.pmiBigrams(d, minCount = 3, topK = 10)
    assert(r.count() == 0) // "a b" appears twice < 3; "c" has no bigram
  }

  test("checkConstraints: one row per check, null expectations count as violations") {
    val df = Seq((1L, Some(5.0)), (2L, None), (3L, Some(-1.0)))
      .toDF("id", "v")
    val r = graft.operators.Audit.checkConstraints(df, Seq(
        "v_positive" -> (col("v") > 0),      // null row + negative row violate
        "id_not_null" -> col("id").isNotNull))
      .select("check", "n_rows", "n_violations", "pass")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(r == Seq(
      ("id_not_null", 3L, 0L, true),
      ("v_positive", 3L, 2L, false)))
  }

  test("checkConstraints is a single-scan aggregate (no per-check jobs)") {
    val df = Seq((1L, 1.0)).toDF("id", "v")
    val out = graft.operators.Audit.checkConstraints(df, Seq(
      "a" -> (col("v") > 0), "b" -> (col("id") < 10), "c" -> col("v").isNotNull))
    out.collect()
    val p = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0) // AQE repeats the pre-exec plan below
    assert("HashAggregate".r.findAllIn(p).length <= 2, // partial + final
      s"more than one aggregate pair in:\n$p")
  }

  test("kCore peels chains and keeps the dense core; chains need multiple rounds") {
    // triangle 1-2-3 with a chain 3-4-5-6: each peel removes one chain
    // tail node, the triangle survives as the 2-core
    val es = pairs((1L, 2L, 0), (2L, 3L, 0), (1L, 3L, 0),
      (3L, 4L, 0), (4L, 5L, 0), (5L, 6L, 0)).select("p1", "p2")
    val r = graft.operators.KCore.kCore(es, k = 2)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k above the max degree peels everything (empty, no throw)
    assert(graft.operators.KCore.kCore(es, k = 5).count() == 0)
    // insufficient rounds must throw, not under-peel
    intercept[IllegalStateException](
      graft.operators.KCore.kCore(es, k = 2, maxRounds = 1).count())
  }

  test("overlapJoin: bin-crossing overlaps found, touching intervals excluded") {
    def iv(rows: (Long, Long, Long, Long)*) = rows.toDF("k", "id", "s0", "e0")
      .select(col("k"), col("id"),
        timestamp_micros(col("s0") * 1000000L).as("s"),
        timestamp_micros(col("e0") * 1000000L).as("e"))
    // bin = 10s. a1 spans 3 bins; b1 overlaps at the tail; b2 only
    // TOUCHES a1 (start == end: half-open -> no overlap); b3 in another key
    val a = iv((1L, 1L, 5L, 25L), (1L, 2L, 40L, 41L))
    val b = iv((1L, 10L, 24L, 30L), (1L, 11L, 25L, 26L), (2L, 12L, 5L, 25L))
    val r = graft.operators.IntervalJoin.overlapJoin(a, b, Seq("k"), "s", "e",
        binSeconds = 10L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(r == Set((1L, 10L)))
    // empty interval (e <= s) matches nothing
    val r2 = graft.operators.IntervalJoin.overlapJoin(
      iv((1L, 1L, 5L, 5L)), b, Seq("k"), "s", "e", binSeconds = 10L)
    assert(r2.count() == 0)
  }

  test("compact rewrites many small files into few, preserving the data") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_").toString + "/t"
    graft.util.Cleanup.onExitDelete(dir)
    (0 until 12).foreach(i => spark.range(i * 10L, i * 10L + 10)
      .coalesce(1).write.mode("append").parquet(dir))
    def files = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files == 12)
    val parts = graft.sources.Wrappers.compact(spark, dir, targetBytes = 1L << 30)
    assert(parts == 1 && files == 1)
    assert(spark.read.parquet(dir).as[Long].collect().sorted.toSeq
      == (0L until 120L))
  }

  test("weightedSample drops non-positive weights") {
    val d = Seq((1L, "t", 0L), (2L, "t", 5L), (3L, "t", -1L))
      .toDF("doc_id", "text", "n_chars")
    val r = Curation.weightedSample(d, k = 10, weightCol = "n_chars")
      .select("doc_id").as[Long].collect().toSeq
    assert(r == Seq(2L))
  }
}
