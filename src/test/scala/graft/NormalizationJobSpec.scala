package graft

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

import graft.streaming.NormalizationJob

/** The reference's E2 pipeline (normalization.py:133-165) end to end:
  * lines → normalize → dt/hr JSONL, killed and restarted on the same
  * checkpoint — output must be complete and duplicate-free. */
class NormalizationJobSpec extends SparkSuite {

  private def writeLines(dir: String, name: String, lines: String*): Unit =
    Files.write(Paths.get(dir, name),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))

  test("kill/restart on the same checkpoint: no loss, no duplicates, " +
    "event-time dt/hr layout") {
    val src = Files.createTempDirectory("graft_e2_src").toString
    val out = Files.createTempDirectory("graft_e2_out").toString
    val ckpt = Files.createTempDirectory("graft_e2_ckpt").toString

    writeLines(src, "batch1.jsonl",
      """[{"_id":"a","accountId":"101","type":"credit","amount":5,""" +
        """"createdAt":"2024-01-01 10:30:00"},""" +
        """{"_id":"b","accountId":"102","type":"debit","amount":7,""" +
        """"resource":{"k":1},"createdAt":"2024-01-01 11:05:00"}]""",
      """this line is not json at all""")

    val q1 = NormalizationJob.start(spark, src, out, ckpt)
    q1.processAllAvailable()
    q1.stop() // the kill

    // a new file arrives while the job is down
    writeLines(src, "batch2.jsonl",
      """[{"_id":"c","accountId":"103","type":"credit","amount":9,""" +
        """"createdAt":"2024-01-02 00:15:00"}]""")

    val q2 = NormalizationJob.start(spark, src, out, ckpt)
    q2.processAllAvailable()
    q2.stop()

    // batch read of a streaming file sink goes through _spark_metadata:
    // only committed files are visible
    val result = spark.read.json(out)
    val rows = result.collect()
    assert(rows.length == 4, s"2 + malformed + 1 after restart, got ${rows.length}")

    val byId = rows.map(r => Option(r.getAs[String]("_id"))).toSeq
    assert(byId.count(_.isEmpty) == 1, "malformed line survives as a null row")
    assert(byId.flatten.sorted == Seq("a", "b", "c"), s"no loss, no dupes: $byId")

    // event-time partitions, not wall clock (partition values come back
    // type-inferred — compare their string forms)
    val parts = rows.filter(_.getAs[String]("_id") != null)
      .map(r => (r.getAs[String]("_id"),
        String.valueOf(r.getAs[Any]("dt")), String.valueOf(r.getAs[Any]("hr"))))
      .sortBy(_._1).toSeq
    assert(parts == Seq(("a", "2024-01-01", "10"),
      ("b", "2024-01-01", "11"), ("c", "2024-01-02", "0")), parts.toString)

    // the 13-key whitelist made it through, nested value stringified
    assert(rows.find(_.getAs[String]("_id") == "b")
      .get.getAs[String]("resource") == """{"k":1}""")
  }
}
