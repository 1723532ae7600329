package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * Structured Streaming surface over the `events` table. The reference has
 * no streaming operators (SURVEY.md §2.11); this is the engine's forward
 * surface for incremental pipelines: the same windowed aggregations a
 * batch query computes, expressed as a stream with watermarks so state is
 * bounded and late data is handled, runnable with Trigger.AvailableNow for
 * deterministic batch-equivalent results (which is also how the DuckDB
 * oracle checks them).
 */
object EventStreams {

  /**
   * Load the events table. The driver writes TIMESTAMP(NANOS) parquet,
   * which Spark only reads via the nanosAsLong legacy conf — so read the
   * nanos as long and rebuild a microsecond timestamp with INTEGER
   * division (`div`; `/` would go through double and lose precision above
   * 2^53 ns). Source ns values are whole microseconds, so this is exact.
   */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }

  /** Tumbling-window aggregate per event_type: count + value sum per
   * 1-hour window. Batch form (used by the oracle-checked query). */
  def windowedAggBatch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), (sum(graft.functions.FastRound.round(col("value") * 100, 0).cast("long")) / 100.0).as("value_sum"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("value_sum"))

  /**
   * The same aggregate executed as a Structured Stream from the parquet
   * directory with a 2-hour watermark, drained with AvailableNow into a
   * memory sink, returned as a DataFrame. Demonstrates the
   * readStream -> watermark -> window -> writeStream path; with all data
   * on disk the result equals the batch form.
   */
  def windowedAggStreaming(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // the file-stream source only accepts directories; events.parquet is a
    // single file, so stream a temp dir holding a symlink to it
    val streamDir = {
      import java.nio.file.{Files, Paths}
      val d = Files.createTempDirectory("events_stream_")
      Files.createSymbolicLink(d.resolve("events.parquet"),
        Paths.get(s"$dir/events.parquet"))
      d.toString
    }
    val raw = spark.readStream.schema(schema).parquet(streamDir)
    val stream =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw
    val agg = stream
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), (sum(graft.functions.FastRound.round(col("value") * 100, 0).cast("long")) / 100.0).as("value_sum"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("value_sum"))
    val name = s"events_windowed_${System.nanoTime()}"
    val q = agg.writeStream
      .format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /**
   * Sessionization: split each user's event stream into sessions separated
   * by gaps > `gapMinutes`. Batch form is the classic gaps-and-islands
   * (lag + running sum) — fully windowed, no driver state; the streaming
   * form of this shape would be flatMapGroupsWithState with a session
   * timeout.
   */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMinutes * 60L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), (sum(graft.functions.FastRound.round(col("value") * 100, 0).cast("long")) / 100.0).as("value_sum"))
  }
}
