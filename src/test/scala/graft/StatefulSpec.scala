package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{Stateful, UserEvent}

class StatefulSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("mapGroupsWithState keeps running per-user aggregates across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = Stateful.runningUserStats(input.toDS())
      .writeStream.format("memory").queryName("running_stats")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(
        UserEvent(1L, ts("2024-01-01 00:00:00"), "click", 2.0),
        UserEvent(1L, ts("2024-01-01 00:01:00"), "click", 3.0))
      q.processAllAvailable()
      input.addData(UserEvent(1L, ts("2024-01-01 00:02:00"), "view", 5.0))
      q.processAllAvailable()
      val last = spark.sql(
        "SELECT * FROM running_stats WHERE user_id=1 ORDER BY n_events DESC").collect().head
      assert(last.getAs[Long]("n_events") == 3, "state persisted across micro-batches")
      assert(last.getAs[Long]("total_cents") == 1000L)
      assert(last.getAs[Timestamp]("last_ts") == ts("2024-01-01 00:02:00"))
    } finally q.stop()
  }

  test("transformWithState (RocksDB store) matches the mapGroupsWithState stats") {
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[UserEvent]
    val q = Stateful.runningUserStatsTws(input.toDS())
      .writeStream.format("memory").queryName("running_stats_tws")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(
        UserEvent(1L, ts("2024-01-01 00:00:00"), "click", 2.0),
        UserEvent(1L, ts("2024-01-01 00:01:00"), "click", 3.0))
      q.processAllAvailable()
      input.addData(UserEvent(1L, ts("2024-01-01 00:02:00"), "view", 5.0))
      q.processAllAvailable()
      val last = spark.sql(
        "SELECT * FROM running_stats_tws WHERE user_id=1 ORDER BY n_events DESC")
        .collect().head
      assert(last.getAs[Long]("n_events") == 3, "ValueState persisted across batches")
      assert(last.getAs[Long]("total_cents") == 1000L)
      assert(last.getAs[Timestamp]("last_ts") == ts("2024-01-01 00:02:00"))
    } finally {
      q.stop()
      saved match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("flatMapGroupsWithState sessionization closes sessions on timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val events = input.toDS()
      .withWatermark("ts", "0 seconds")
      .as[UserEvent]
    val q = Stateful.sessionize(events, gapMs = 10L * 60 * 1000)
      .writeStream.format("memory").queryName("custom_sessions")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        UserEvent(7L, ts("2024-01-01 00:00:00"), "click", 1.0),
        UserEvent(7L, ts("2024-01-01 00:05:00"), "click", 1.0))
      q.processAllAvailable()
      // in-batch gap break: two sessions, first closes immediately
      input.addData(UserEvent(7L, ts("2024-01-01 00:30:00"), "click", 1.0))
      q.processAllAvailable()
      // advance the watermark far past 00:30 + gap → timeout fires
      input.addData(UserEvent(9L, ts("2024-01-01 05:00:00"), "view", 1.0))
      q.processAllAvailable()
      input.addData(UserEvent(9L, ts("2024-01-01 06:00:00"), "view", 1.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT * FROM custom_sessions WHERE user_id=7 ORDER BY start_ts").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Long]("n_events") == 2)
      assert(rows(0).getAs[Timestamp]("end_ts") == ts("2024-01-01 00:05:00"))
      assert(rows(1).getAs[Long]("n_events") == 1)
    } finally q.stop()
  }
}
