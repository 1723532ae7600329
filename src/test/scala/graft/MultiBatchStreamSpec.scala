package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/**
 * The streaming twins' oracle checks drain everything in ONE AvailableNow
 * batch — equality there doesn't prove the state machinery. This spec
 * splits the event table into four time-ordered files and bounds the
 * source to one file per trigger, so the drain runs four micro-batches:
 * the windowed aggregate must merge partial windows across batches, the
 * stateful dedup must remember keys from earlier batches, and the CDC
 * merge state must overwrite older versions — and still equal the batch
 * answer exactly.
 */
class MultiBatchStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  /** sf0.001 events split into 4 time-ordered parquet files under
   * <dir>/events.parquet (a directory — both the batch reader and the
   * file-stream source accept it). */
  private lazy val splitDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_mb_").toString
    graft.util.Cleanup.onExitDelete(d)
    val e = EventStreams.loadEvents(spark, "/root/testdata/sf0.001")
    // 4 contiguous time slices -> arrival order == event-time order, so
    // watermarks never discard data and the comparison is exact
    val q = e.select(expr("percentile(unix_micros(ts), array(0.25, 0.5, 0.75))"))
      .first().getSeq[Double](0)
    val slices = Seq(
      col("ts") < timestamp_micros(lit(q(0).toLong)),
      col("ts") >= timestamp_micros(lit(q(0).toLong)) &&
        col("ts") < timestamp_micros(lit(q(1).toLong)),
      col("ts") >= timestamp_micros(lit(q(1).toLong)) &&
        col("ts") < timestamp_micros(lit(q(2).toLong)),
      col("ts") >= timestamp_micros(lit(q(2).toLong)))
    slices.zipWithIndex.foreach { case (p, i) =>
      e.filter(p).coalesce(1).write.mode("append").parquet(s"$d/events.parquet")
      // distinct mtimes so the source's file ordering follows time order
      new java.io.File(s"$d/events.parquet").listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.lastModified())
        .lastOption.foreach(_.setLastModified(1000000L * (i + 1)))
    }
    assert(new java.io.File(s"$d/events.parquet")
      .listFiles().count(_.getName.endsWith(".parquet")) == 4)
    d
  }

  private def withOneFilePerTrigger[T](body: => T): T = {
    spark.conf.set("spark.graft.stream.maxFilesPerTrigger", "1")
    try body finally spark.conf.unset("spark.graft.stream.maxFilesPerTrigger")
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("windowed aggregate over 4 micro-batches equals the batch answer") {
    val batch = EventStreams.windowedAggBatch(
      EventStreams.loadEvents(spark, splitDir))
    val streamed = withOneFilePerTrigger(
      EventStreams.windowedAggStreaming(spark, splitDir))
    assert(sortedRows(streamed) == sortedRows(batch))
  }

  test("stateful dedup remembers keys across micro-batches") {
    val batch = EventStreams.loadEvents(spark, splitDir)
      .select("user_id", "event_type").distinct()
    val streamed = withOneFilePerTrigger(
      EventStreams.distinctPairsStreaming(spark, splitDir))
    assert(streamed.count() == batch.count())
    assert(sortedRows(streamed) == sortedRows(batch))
  }

  test("CDC merge state over 4 micro-batches equals the batch upsert") {
    val e = EventStreams.loadEvents(spark, splitDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val batch = graft.operators.Merge.upsertLatest(
      e.limit(0), e, Seq("user_id", "event_type"),
      Seq(col("ts"), col("event_id")))
    val streamed = withOneFilePerTrigger(
      EventStreams.mergeLatestStreaming(spark, splitDir))
    assert(sortedRows(streamed) == sortedRows(batch))
  }
}
