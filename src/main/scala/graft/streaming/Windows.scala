package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Structured Streaming operators — the stream path the reference
  * *intended* (an unused beam window import at retrieval.py:3 and a
  * wall-clock loop at normalization.py:133-165) done with real event
  * time + watermarks:
  *
  *  - tumbling / sliding / session windows over an event stream
  *  - `withWatermark` bounds state and gives principled late-data
  *    semantics (SURVEY.md §2.7 C5: the reference silently loses late
  *    records; here they are either merged or provably dropped)
  *
  * All transforms take an unbounded DataFrame (readStream / MemoryStream
  * source) with columns (ts: timestamp, event_type: string, value:
  * double) and work identically on bounded frames for batch backfill.
  */
object Windows {

  /** 20-minute tumbling window counts per event type (the streaming
    * form of Warehouse.q13EventsTumbling). */
  def tumblingCounts(events: DataFrame,
                     window_ : String = "20 minutes",
                     watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding windows: 20-minute windows sliding every 5. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "20 minutes", "5 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))

  /** Streaming exact dedup: drop repeated ids, with the watermark
    * bounding the dedup state (ids older than the delay are evicted —
    * without it, state grows forever). The streaming counterpart of
    * graft.operators.Dedup.exactDedup for at-least-once sources that
    * can replay records. */
  def dedupedStream(events: DataFrame, idCol: String,
                    watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicates(idCol, "ts")

  /** Stream-stream interval join: each left event pairs with right
    * events of the same user within `[left.ts - lookback, left.ts]` —
    * the streaming form of TemporalJoins.purchasesBeforeClick. Both
    * sides carry watermarks and the join condition bounds event time in
    * BOTH directions, which is what lets Spark evict buffered state:
    * without the time bounds the join would hold every row forever.
    * State is partitioned by the equi-key (user_id), so at 100 TB this
    * scales like any keyed shuffle — skewed users salt the same way. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   lookback: String = "10 minutes",
                   watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark("ts", watermark).as("l")
    val r = right.withWatermark("ts", watermark).as("r")
    l.join(r,
      col("l.user_id") === col("r.user_id") &&
        col("r.ts") >= col("l.ts") - expr(s"INTERVAL $lookback") &&
        col("r.ts") <= col("l.ts"))
      .select(col("l.user_id").as("user_id"),
        col("l.ts").as("l_ts"), col("r.ts").as("r_ts"),
        col("r.value").as("r_value"))
  }

  /** Session windows: gap-based sessions per user. */
  def sessionCounts(events: DataFrame, gap: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("user_id"), col("n"))
}
