package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.functions._
import graft.operators.{Ingest, Sinks}

class SinksIngestSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-test").toString

  test("K1: partitioned JSONL sink writes dt=/hr= hive layout, readable back") {
    val out = tmp()
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Sinks.writePartitionedJsonl(df, out)
    val back = spark.read.json(out)
    assert(back.count() == 2)
    assert(back.columns.toSet == Set("id", "v", "dt", "hr"))
    // hive-style partition dirs exist on disk
    val dirs = new java.io.File(out).listFiles().map(_.getName)
    assert(dirs.exists(_.startsWith("dt=")))
  }

  test("x27 packed-shard export: read-back ≡ a Scala recomputation of " +
       "the epoch-ordered pack; text written exactly once; kill/restart " +
       "and re-run land the identical tree") {
    import graft.operators.Sampling
    val out = tmp() + "/shards"
    // simulate a dead partial attempt: stale garbage where the export
    // will land — the overwrite commit protocol must replace it
    val stale = new java.io.File(out + "/shard=3")
    stale.mkdirs()
    Files.write(java.nio.file.Paths.get(out + "/shard=3/part-junk.json"),
      "{\"doc_id\":999999,\"garbage\":true}".getBytes)
    Files.write(java.nio.file.Paths.get(out + "/orphan.txt"),
      "not json".getBytes)
    val got = Sampling.packedShardExport(spark, sf, out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getInt(7))).toSeq
    // pure-Scala recomputation: md5("0:"+id) order → prefix sums
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val budget = Sampling.X22Budget
    val ordered = docs.map { case (id, text) =>
      (id, text, text.trim.split("\\s+").length.toLong,
        md5hex("0:" + id)) }.sortBy(t => (t._4, t._1))
    var cum = 0L
    val expected = ordered.zipWithIndex.map { case ((id, _, n, _), i) =>
      val start = cum; cum += n
      val seqFirst = start / budget
      (id, (i + 1).toLong, n, start, seqFirst,
        (start + n - 1) / budget - seqFirst + 1, start % budget,
        (seqFirst % Sampling.X27Shards).toInt)
    }.sortBy(_._1).toSeq
    assert(got == expected)
    // the stale attempt is gone: no garbage doc in the read-back, and
    // the orphan file was replaced by the overwrite
    assert(!got.exists(_._1 == 999999L))
    assert(!new java.io.File(out + "/orphan.txt").exists())
    // text round-trips exactly once per document
    val back = spark.read.json(out).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(back == docs.sortBy(_._1).toSeq)
    // pos is a permutation of 1..n and token mass tiles exactly
    assert(got.map(_._2).sorted == (1L to docs.length).toSeq)
    assert(got.map(_._3).sum == ordered.map(_._3).sum)
    // idempotency: a second full run (restart after success) is
    // byte-equal in manifest terms
    val again = Sampling.packedShardExport(spark, sf, out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getInt(7))).toSeq
    assert(again == expected)
    // shard dirs are hive-partitioned on disk
    val dirs = new java.io.File(out).listFiles().map(_.getName)
    assert(dirs.count(_.startsWith("shard=")) > 1)
  }

  test("x27e1 multi-epoch export: epoch-1 tree is the epoch-1 permutation " +
       "(uncorrelated with epoch 0), same token mass, auto temp dir cleaned") {
    import graft.operators.Sampling
    def manifest(epoch: Long) =
      Sampling.packedShardExport(spark, sf, epoch = epoch).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    val e0 = manifest(0L)
    val e1 = manifest(1L)
    // pure-Scala truth for epoch 1: md5("1:"+id) order → prefix sums
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val ordered = docs.map { case (id, text) =>
      (id, text.trim.split("\\s+").length.toLong, md5hex("1:" + id)) }
      .sortBy(t => (t._3, t._1))
    var cum = 0L
    val exp1 = ordered.zipWithIndex.map { case ((id, n, _), i) =>
      val start = cum; cum += n
      (id, (i + 1).toLong, start)
    }.sortBy(_._1).toSeq
    assert(e1 == exp1)
    // both epochs are full permutations over the same doc set with the
    // same total token mass — only the ORDER differs (the x19 law:
    // md5(e+":"+id) keys are uncorrelated across epochs)
    assert(e0.map(_._1) == e1.map(_._1))
    assert(e0.map(_._2).sorted == e1.map(_._2).sorted)
    assert(e0.map(_._2) != e1.map(_._2), "epoch orders must differ")
    // the auto-outDir variant leaves no tree behind (the frame was
    // pinned before cleanup — collect above already proved readability)
    val leftovers = new java.io.File(
      System.getProperty("java.io.tmpdir")).listFiles()
      .filter(_.getName.startsWith("graft_x27_shards_"))
      .filter(d => new java.io.File(d, s"epoch1").exists())
    assert(leftovers.isEmpty, s"temp trees not cleaned: ${leftovers.toSeq}")
  }

  test("K1 event-time variant: partitions derive from the event column") {
    val out = tmp()
    val df = Seq(("2024-03-05 07:30:00", 1L), ("2024-03-06 22:10:00", 2L))
      .toDF("ts", "id").withColumn("ts", col("ts").cast("timestamp"))
    Sinks.writePartitionedJsonlByEventTime(df, "ts", out)
    // disable partition-type inference so hr=07 stays the string "07"
    val before = spark.conf.get("spark.sql.sources.partitionColumnTypeInference.enabled")
    val back = try {
      spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
      spark.read.json(out).collect()
    } finally spark.conf.set(
      "spark.sql.sources.partitionColumnTypeInference.enabled", before)
    assert(back.map(_.getAs[String]("dt")).toSet ==
      Set("2024-03-05", "2024-03-06"))
    assert(back.filter(_.getAs[String]("dt") == "2024-03-05")
      .map(_.getAs[String]("hr")).toSet == Set("07"))
  }

  test("K2: batched publisher opens one client per partition, bounded batches") {
    val ds = spark.range(0, 103).map(i => s"rec-$i").repartition(2)
    Sinks.publishBatched(ds, maxBatch = 10)(
      () => { SinkProbe.clients.incrementAndGet(); new Object })(
      (_, batch) => {
        assert(batch.size <= 10)
        SinkProbe.batches.add(batch.size)
        batch.foreach(SinkProbe.records.add)
      })(_ => ())
    assert(SinkProbe.clients.get() == 2)
    assert(SinkProbe.records.size() == 103)
  }

  test("S1/S2: range scan bounds are inclusive and pushed down") {
    val events = graft.Tables.t(spark, sf, "events")
    val n = Ingest.rangeCount(events, "ts", "2024-01-01 00:00:00", "2024-01-02 00:00:00")
    val manual = events.filter(
      col("ts") >= lit("2024-01-01 00:00:00").cast("timestamp") &&
      col("ts") <= lit("2024-01-02 00:00:00").cast("timestamp")).count()
    assert(n == manual && n > 0)
  }

  test("S3: 20-minute buckets align to the epoch grid") {
    val df = Seq("2024-01-01 00:05:00", "2024-01-01 00:25:00", "2024-01-01 00:39:59")
      .toDF("ts").withColumn("ts", col("ts").cast("timestamp"))
    val buckets = Ingest.timeBuckets(df, "ts").select("bucket_start")
      .as[java.sql.Timestamp].collect().map(_.toString).toSeq
    assert(buckets == Seq("2024-01-01 00:00:00.0", "2024-01-01 00:20:00.0",
      "2024-01-01 00:20:00.0"))
  }

  test("C1: watermark state round-trips and defaults when absent") {
    val state = tmp() + "/wm"
    assert(Ingest.readWatermark(spark, state) == "2024-09-01 00:00:00")
    Ingest.writeWatermark(spark, state, "2024-12-31 10:00:00")
    assert(Ingest.readWatermark(spark, state) == "2024-12-31 10:00:00")
  }

  test("S4: modifiedAfter/Before prune the file listing") {
    val dir = tmp()
    Files.writeString(java.nio.file.Path.of(dir, "old.txt"), "old-line")
    new java.io.File(dir, "old.txt").setLastModified(
      java.sql.Timestamp.valueOf("2020-01-01 00:00:00").getTime)
    Files.writeString(java.nio.file.Path.of(dir, "new.txt"), "new-line")
    val pruned = Ingest.filesModifiedBetween(spark, dir,
      "2021-01-01T00:00:00", "2099-01-01T00:00:00")
    assert(pruned.as[String].collect().toSeq == Seq("new-line"))
  }
}

/** JVM-local probes for the foreachPartition sink (executors share the
  * JVM in local mode). */
object SinkProbe {
  val clients = new java.util.concurrent.atomic.AtomicInteger(0)
  val batches = new ConcurrentLinkedQueue[Int]()
  val records = new ConcurrentLinkedQueue[String]()
}
