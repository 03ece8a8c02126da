package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.streaming.OutputMode

/** Checkpoint/restart semantics — the engine-native replacement for the
  * reference's SQLite is_done bookkeeping (normalization.py:45-51,
  * which SURVEY §2.4 K5 shows is marked done BEFORE execution
  * finishes). Spark's file sink + checkpoint commit log give
  * exactly-once: a restarted query resumes from committed offsets and
  * never duplicates output. */
class StreamRecoverySpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("file source→file sink + checkpoint: restart resumes without duplicates") {
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val out = Files.createTempDirectory("graft_out").toString
    val src = Files.createTempDirectory("graft_src").toString

    Seq(
      Ev(ts("2024-01-01 00:00:00"), "click", 1.0, 1),
      Ev(ts("2024-01-01 00:01:00"), "click", 2.0, 1))
      .toDF().write.mode("append").parquet(src)

    val schema = Seq.empty[Ev].toDF().schema
    def start() = spark.readStream.schema(schema).parquet(src)
      .writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()

    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(out).count() == 2)

    // new file arrives while the query is down; restart on the SAME
    // checkpoint: the committed files are skipped, only the new one lands
    Seq(Ev(ts("2024-01-01 00:02:00"), "view", 3.0, 2))
      .toDF().write.mode("append").parquet(src)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(out).orderBy("ts").collect()
    assert(rows.length == 3, s"exactly-once: got ${rows.length} rows")
    assert(rows.map(_.getAs[String]("event_type")).toSeq ==
      Seq("click", "click", "view"))
  }
}
