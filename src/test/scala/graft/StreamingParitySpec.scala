package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.streaming.{Stateful, UserEvent, Windows}
import graft.operators.Warehouse

/** Streaming-batch parity under a REAL streaming execution: q13/q19/
  * q28/q29 are driver-verified in batch mode; this suite runs their
  * windowed/stateful forms through an actual `Trigger.AvailableNow`
  * streaming query over the same events parquet (readStream source →
  * transform → memory sink) and asserts the emitted result is
  * IDENTICAL to the batch form — closing the daylight between the
  * C3/C5 batch proofs and the streaming claims. The transforms under
  * test are the SAME functions (`Windows.tumblingCounts`,
  * `Windows.slidingCounts`, `Windows.sessionCounts`,
  * `Stateful.runningUserStats`) the batch queries call — what differs
  * here is the EXECUTION: incremental state accumulation vs one-shot
  * aggregation, which is exactly the equivalence worth pinning. */
class StreamingParitySpec extends SparkSuite {

  /** The events table as an unbounded readStream source (ts normalized
    * to session-tz TimestampType from either physical encoding —
    * NANOS-as-long or MICROS-NTZ — like Tables.t).
    * The testdata table is a single FILE — file stream sources demand
    * a directory, so stream the parent dir with a glob filter. */
  private def streamingEvents(): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(s"$sf/")
    if (schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else if (schema("ts").dataType == TimestampNTZType)
      raw.withColumn("ts", col("ts").cast(TimestampType))
    else raw
  }

  /** Run a streaming frame to completion under Trigger.AvailableNow
    * into a memory sink; return the sink table. */
  private def runStream(df: DataFrame, name: String,
                        mode: OutputMode): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
  }

  test("q13 tumbling windows: AvailableNow streaming result == batch") {
    val streamed = runStream(
      Windows.tumblingCounts(streamingEvents()), "sp_q13", OutputMode.Complete())
      .select(
        date_format(col("w_start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"), round(col("sum_value"), 4).as("sum_value"))
    assert(canon(streamed) == canon(Warehouse.q13EventsTumbling(spark, sf)),
      "q13 streaming result diverges from batch")
  }

  test("q29 sliding windows: AvailableNow streaming result == batch") {
    val streamed = runStream(
      Windows.slidingCounts(streamingEvents()), "sp_q29", OutputMode.Complete())
      .select(
        date_format(col("w_start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"))
    assert(canon(streamed) == canon(Warehouse.q29Sliding(spark, sf)),
      "q29 streaming result diverges from batch")
  }

  test("q19 session windows: AvailableNow streaming result == batch") {
    val streamed = runStream(
      Windows.sessionCounts(streamingEvents(), "10 minutes"), "sp_q19",
      OutputMode.Complete())
      .select(col("user_id"),
        date_format(col("w_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("w_start"),
        date_format(col("w_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("w_end"),
        col("n"))
    assert(canon(streamed) == canon(Warehouse.q19Sessions(spark, sf)),
      "q19 streaming result diverges from batch")
  }

  test("q28 mapGroupsWithState: AvailableNow streaming state == batch") {
    import spark.implicits._
    val events = streamingEvents()
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[UserEvent]
    // mapGroupsWithState streams in Update mode: the sink accumulates
    // one row per group per update; the FINAL state per user is the
    // row with the highest n_events — the same collapse the batch q28
    // applies (max over the emitted frame).
    val streamed = runStream(
      Stateful.runningUserStats(events).toDF(), "sp_q28", OutputMode.Update())
      .groupBy("user_id")
      .agg(max("n_events").as("n_events"),
        round(max("total_cents") / 100.0, 4).as("total_value"),
        date_format(max("last_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("last_ts"))
    assert(canon(streamed) == canon(Warehouse.q28StatefulBatch(spark, sf)),
      "q28 streaming state diverges from batch")
  }
}
