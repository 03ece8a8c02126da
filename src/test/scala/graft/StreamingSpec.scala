package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Windows

case class Ev(ts: Timestamp, event_type: String, value: Double, user_id: Long)

class StreamingSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling windows emit on watermark pass; late rows are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = Windows.tumblingCounts(input.toDF(), "20 minutes", "30 minutes")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Ev(ts("2024-01-01 00:05:00"), "click", 1.0, 1),
        Ev(ts("2024-01-01 00:10:00"), "click", 2.0, 1))
      q.processAllAvailable()
      // advance event time far past the window end + watermark
      input.addData(Ev(ts("2024-01-01 02:00:00"), "view", 1.0, 2))
      q.processAllAvailable()
      val emitted = spark.sql("SELECT * FROM tumbling").collect()
      assert(emitted.length == 1)
      assert(emitted.head.getAs[Long]("n") == 2)
      assert(emitted.head.getAs[Timestamp]("w_start") == ts("2024-01-01 00:00:00"))
      // a late row behind the watermark must NOT reopen the window
      input.addData(Ev(ts("2024-01-01 00:06:00"), "click", 9.0, 1))
      q.processAllAvailable()
      val after = spark.sql("SELECT * FROM tumbling WHERE event_type='click'").collect()
      assert(after.length == 1 && after.head.getAs[Long]("n") == 2,
        "late row behind watermark must be dropped")
    } finally q.stop()
  }

  test("session windows merge events within the gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = Windows.sessionCounts(input.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Ev(ts("2024-01-01 00:00:00"), "click", 1.0, 7),
        Ev(ts("2024-01-01 00:05:00"), "click", 1.0, 7),  // same session
        Ev(ts("2024-01-01 00:30:00"), "click", 1.0, 7))  // new session
      q.processAllAvailable()
      input.addData(Ev(ts("2024-01-01 03:00:00"), "view", 1.0, 8))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM sessions WHERE user_id=7 ORDER BY w_start")
        .collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Long]("n") == 2)
      assert(rows(1).getAs[Long]("n") == 1)
    } finally q.stop()
  }

  test("windows transform works identically on bounded (batch) frames") {
    val batch = Seq(
      Ev(ts("2024-01-01 00:05:00"), "click", 1.0, 1),
      Ev(ts("2024-01-01 00:25:00"), "click", 1.0, 1)).toDF()
    val out = Windows.tumblingCounts(batch).orderBy("w_start").collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("n")).toSeq == Seq(1L, 1L))
  }

  test("sliding windows: each event lands in length/slide = 4 windows") {
    val batch = Seq(Ev(ts("2024-01-01 00:21:00"), "click", 1.0, 1)).toDF()
    val out = Windows.slidingCounts(batch).orderBy("w_start").collect()
    assert(out.length == 4)
    assert(out.map(_.getAs[java.sql.Timestamp]("w_start").toString).toSeq ==
      Seq("2024-01-01 00:05:00.0", "2024-01-01 00:10:00.0",
          "2024-01-01 00:15:00.0", "2024-01-01 00:20:00.0"))
    assert(out.forall(_.getAs[Long]("n") == 1L))
  }

  test("stream-static join enriches a stream against a batch dimension") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[Ev]
    val q = input.toDF().join(dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Ev(ts("2024-01-01 00:00:00"), "click", 1.0, 1),
        Ev(ts("2024-01-01 00:00:01"), "click", 1.0, 9)) // no dim row → dropped
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, tier FROM enriched").collect()
      assert(rows.length == 1)
      assert(rows.head.getLong(0) == 1L && rows.head.getString(1) == "gold")
    } finally q.stop()
  }

  test("stream-stream interval join pairs events within the lookback only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    val q = Windows.intervalJoin(clicks.toDF(), buys.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode(OutputMode.Append).start()
    try {
      buys.addData(
        Ev(ts("2024-01-01 00:05:00"), "purchase", 5.0, 1), // in window
        Ev(ts("2024-01-01 00:20:00"), "purchase", 7.0, 1), // after click
        Ev(ts("2023-12-31 23:00:00"), "purchase", 9.0, 1), // too old
        Ev(ts("2024-01-01 00:06:00"), "purchase", 4.0, 2)) // other user
      clicks.addData(Ev(ts("2024-01-01 00:10:00"), "click", 1.0, 1))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, r_value FROM ssjoin").collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      assert(rows.toSeq == Seq((1L, 5.0)))
    } finally q.stop()
  }

  test("streaming dedup drops replayed ids across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    // user_id stands in for the record id in the Ev fixture
    val q = Windows.dedupedStream(input.toDF(), "user_id", "1 hour")
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Ev(ts("2024-01-01 00:00:00"), "click", 1.0, 100),
        Ev(ts("2024-01-01 00:00:00"), "click", 1.0, 100)) // in-batch dup
      q.processAllAvailable()
      input.addData(
        Ev(ts("2024-01-01 00:00:00"), "click", 1.0, 100), // replay, dropped
        Ev(ts("2024-01-01 00:01:00"), "click", 1.0, 101))
      q.processAllAvailable()
      val n = spark.sql("SELECT count(*) FROM deduped").collect().head.getLong(0)
      assert(n == 2, s"expected 2 unique ids, got $n")
    } finally q.stop()
  }
}
