package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, count, lit}

import graft.operators.{Dedup, Similarity}
import graft.streaming.IncrementalJobs

/** The incremental operators (d11 fingerprint-store dedup, s18 graph
  * insert) run END-TO-END as streaming foreachBatch consumers with a
  * kill/restart in the middle — the r9 verdict's task 7: batch-verified
  * operators must also hold their contracts under streaming delivery.
  * The laws: after the restart drains, the persistent store equals the
  * BATCH COMPOSITION over the same inputs, and a same-checkpoint
  * restart with no new input changes nothing (the observed-state
  * exactly-once the batchId-keyed overwrites exist for). */
class StreamingIncrementalSpec extends SparkSuite {
  import spark.implicits._

  test("streaming incremental dedup: kill/restart; store and survivors equal the batch composition") {
    val src = Files.createTempDirectory("graft_inc_src").toString
    val store = Files.createTempDirectory("graft_inc_store").toString
    val out = Files.createTempDirectory("graft_inc_out").toString
    val ckpt = Files.createTempDirectory("graft_inc_ckpt").toString

    // wave A: an in-batch duplicate (11 of 10) and a unique doc
    val docsA = Seq(
      (10L, "alpha beta gamma"),
      (11L, "alpha  beta gamma "), // same normalized content as 10
      (12L, "delta epsilon"))
      .toDF("doc_id", "text")
    docsA.write.mode("append").parquet(src)
    val schema = docsA.schema

    def start() = IncrementalJobs.startIncrementalDedup(
      spark, src, schema, store, out, ckpt)

    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // kill

    // wave B arrives while the job is down: a cross-batch duplicate
    // (20 matches wave A's content via the store, NOT in-batch) and a
    // new doc
    val docsB = Seq(
      (20L, "alpha beta gamma"),
      (21L, "zeta eta"))
      .toDF("doc_id", "text")
    docsB.write.mode("append").parquet(src)

    val q2 = start() // restart on the same checkpoint
    q2.processAllAvailable()
    q2.stop()

    // LAW: store fingerprints == batch-composition reference (exact
    // dedup over the union of both waves)
    val storeFps = spark.read.parquet(store)
      .select("fp").as[String].collect().toSet
    val refFps = Dedup.exactDedup(docsA.unionByName(docsB), "doc_id", "text")
      .select("fp").as[String].collect().toSet
    assert(storeFps == refFps)

    // survivors: 10 (first of its content), 12, 21; 11 deduped
    // in-batch, 20 deduped against the STORE across the restart
    val survivors = spark.read.parquet(out)
      .select("keeper").as[Long].collect().toSet
    assert(survivors == Set(10L, 12L, 21L))

    // a third restart with no new input is a no-op on observed state
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    assert(spark.read.parquet(store)
      .select("fp").as[String].collect().toSet == refFps)
    assert(spark.read.parquet(out)
      .select("keeper").as[Long].collect().toSet == Set(10L, 12L, 21L))
  }

  test("streaming CMS sketch: kill/restart; ledger == one-pass sketch over all ingested") {
    val src = Files.createTempDirectory("graft_cms_src").toString
    val store = Files.createTempDirectory("graft_cms_store").toString
    val ckpt = Files.createTempDirectory("graft_cms_ckpt").toString

    val docsA = Seq(
      (1L, "alpha beta alpha gamma"),
      (2L, "beta beta delta"))
      .toDF("doc_id", "text")
    docsA.write.mode("append").parquet(src)
    val schema = docsA.schema

    def start() = IncrementalJobs.startIncrementalCms(
      spark, src, schema, store, ckpt)

    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // kill

    val docsB = Seq((3L, "alpha epsilon beta")).toDF("doc_id", "text")
    docsB.write.mode("append").parquet(src)

    val q2 = start() // same checkpoint
    q2.processAllAvailable()
    q2.stop()

    // LAW: the (r, cell)-summed ledger equals the one-pass partial
    // over the union — CMS linearity surviving the restart boundary
    def cellMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val ledger = cellMap(IncrementalJobs.cmsLedger(spark, store))
    val ref = cellMap(graft.operators.TextOps.cmsPartial(
      docsA.unionByName(docsB), "text"))
    assert(ledger == ref)

    // the ledger ALSO equals the t25 UDAF buffer over the same stream
    // (table form ≡ aggregator form)
    val H = graft.functions.Hashing
    val agg = new graft.functions.CountMinAggregator
    val buf = (docsA.unionByName(docsB)).collect()
      .flatMap(_.getString(1).trim.split("\\s+")).map(H.fnv64)
      .foldLeft(agg.zero)(agg.reduce)
    ledger.foreach { case ((r, cell), n) =>
      assert(buf(r * H.CmsWidth + cell) == n,
        s"ledger cell ($r,$cell)=$n != UDAF ${buf(r * H.CmsWidth + cell)}")
    }
    assert(buf.map(_.toDouble).sum ==
      ledger.values.map(_.toDouble).sum, "mass mismatch")

    // a restart with no new input is a no-op on the ledger
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    assert(cellMap(IncrementalJobs.cmsLedger(spark, store)) == ref)
  }

  test("streaming bloom index: kill/restart; ledger == one-pass filter; " +
    "OR-idempotence survives duplicated input") {
    val src = Files.createTempDirectory("graft_bloom_src").toString
    val store = Files.createTempDirectory("graft_bloom_store").toString
    val ckpt = Files.createTempDirectory("graft_bloom_ckpt").toString

    val docsA = Seq(
      (1L, "the leaked eval item"),
      (2L, "another benchmark question"))
      .toDF("doc_id", "text")
    docsA.write.mode("append").parquet(src)
    val schema = docsA.schema

    def start() = IncrementalJobs.startIncrementalBloom(
      spark, src, schema, store, ckpt)

    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // kill

    val docsB = Seq((3L, "a third item")).toDF("doc_id", "text")
    docsB.write.mode("append").parquet(src)

    val q2 = start() // same checkpoint
    q2.processAllAvailable()
    q2.stop()

    def wmap(df: org.apache.spark.sql.DataFrame): Map[Int, Long] =
      df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    def fps(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), graft.operators.Sampling
        .contentFp(col("text")).as("fp"))
    // LAW: the OR-ledger equals the one-pass filter over the union
    val ledger = wmap(IncrementalJobs.bloomLedger(spark, store))
    val ref = wmap(Dedup.bloomWords(fps(docsA.unionByName(docsB))))
    assert(ledger == ref)
    // OR-IDEMPOTENCE: re-ingesting the SAME docs (new batch, so the
    // batchId overwrite does NOT dedupe it) leaves the ledger bits
    // unchanged — the property count partials do not have
    docsA.write.mode("append").parquet(src)
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    assert(wmap(IncrementalJobs.bloomLedger(spark, store)) == ref,
      "bit-OR ledger changed under duplicated input")
    // the served ledger drives the probe verbatim: members hit exactly
    val verdicts = Dedup.bloomProbe(
      fps(docsA), IncrementalJobs.bloomLedger(spark, store),
      fps(docsA.unionByName(docsB)).groupBy("fp")
        .agg(count(lit(1)).as("n_bench")))
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(verdicts(1L) && verdicts(2L))
  }

  test("streaming soft-dedup weights: kill/restart; ledger == batch x17 over all ingested") {
    val src = Files.createTempDirectory("graft_sd_src").toString
    val store = Files.createTempDirectory("graft_sd_store").toString
    val ckpt = Files.createTempDirectory("graft_sd_ckpt").toString

    // wave A: an in-batch family of two
    val docsA = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha  BETA gamma "), // same normalized content as 1
      (3L, "delta epsilon"))
      .toDF("doc_id", "text")
    docsA.write.mode("append").parquet(src)
    val schema = docsA.schema

    def start() = IncrementalJobs.startIncrementalSoftDedup(
      spark, src, schema, store, ckpt)

    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // kill

    // wave B while down: a CROSS-BATCH copy joining family {1,2} —
    // its arrival must retroactively dilute the stored copies' weight
    val docsB = Seq(
      (4L, "alpha beta gamma"),
      (5L, "zeta eta"))
      .toDF("doc_id", "text")
    docsB.write.mode("append").parquet(src)

    val q2 = start() // same checkpoint
    q2.processAllAvailable()
    q2.stop()

    def wmap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val ledger = wmap(IncrementalJobs.softDedupLedger(spark, store))
    // LAW: ledger == the registered batch kernel over the union
    val ref = wmap(graft.operators.Sampling.softDedupWeights(
      docsA.unionByName(docsB), "doc_id", "text"))
    assert(ledger == ref)
    // the cross-batch family is a THREE-way split after wave B
    val third = math.floor((1.0 / 3) * 1e4 + 0.5) / 1e4
    assert(ledger(1L) == ((3L, third)) && ledger(4L) == ((3L, third)))
    assert(ledger(5L) == ((1L, 1.0)))

    // a restart with no new input is a no-op on the ledger
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    assert(wmap(IncrementalJobs.softDedupLedger(spark, store)) == ref)
  }

  test("streaming incremental near-dup: kill/restart; verdicts and store admission equal the batch composition") {
    val src = Files.createTempDirectory("graft_nd_src").toString
    val store = Files.createTempDirectory("graft_nd_store").toString
    val out = Files.createTempDirectory("graft_nd_out").toString
    val ckpt = Files.createTempDirectory("graft_nd_ckpt").toString

    val docsA = Seq(
      (10L, "a b c d e f"),
      (11L, "p q r s t u"))
      .toDF("doc_id", "text")
    docsA.write.mode("append").parquet(src)
    val schema = docsA.schema

    def start() = IncrementalJobs.startIncrementalNearDup(
      spark, src, schema, store, out, ckpt)

    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // kill

    // wave B while the job is down: 20 is a near-dup of stored 10
    // (shingles 4∩5 → Jaccard 0.8 ≥ 0.7), 21 is clean
    val docsB = Seq(
      (20L, "a b c d e f g"),
      (21L, "m n o m n o"))
      .toDF("doc_id", "text")
    docsB.write.mode("append").parquet(src)

    val q2 = start() // restart on the same checkpoint
    q2.processAllAvailable()
    q2.stop()

    // verdicts: exactly the planted cross-restart near-dup, with the
    // exact Jaccard
    val verdicts = spark.read.parquet(out)
      .select("doc_id", "best_match", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(verdicts == Set((20L, 10L, 0.8)))

    // admission: clean docs' sketches extend the store; the near-dup
    // is rejected
    def admitted(): Set[Long] = spark.read.parquet(store)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted() == Set(10L, 11L, 21L))

    // and the store IS the d12 sketch artifact: probing wave B against
    // the wave-A store ONLY (batch composition) gives the same verdict
    val ref = Dedup.incrementalNearDup(docsB, docsA, "doc_id", "text", 0.7)
      .select("doc_id", "best_match", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(ref == verdicts)

    // no-op restart law
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    assert(admitted() == Set(10L, 11L, 21L))
    assert(spark.read.parquet(out)
      .select("doc_id").as[Long].collect().toSet == Set(20L))
  }

  test("streaming incremental boilerplate: kill/restart; batch scrub ≡ " +
    "store probe; ledger equals the union counts") {
    import graft.operators.TextOps
    val src = Files.createTempDirectory("graft_bp_src").toString
    val store = Files.createTempDirectory("graft_bp_store").toString
    val out = Files.createTempDirectory("graft_bp_out").toString
    val ckpt = Files.createTempDirectory("graft_bp_ckpt").toString

    val span = (1 to 32).map(i => s"w$i").mkString(" ")
    val other1 = (33 to 64).map(i => s"v$i").mkString(" ")
    val other3 = (65 to 96).map(i => s"u$i").mkString(" ")

    // wave A: the span appears ONCE — nothing scrubbed yet
    val docsA = Seq(
      (10L, span + " " + other1),
      (11L, (101 to 132).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    docsA.write.mode("append").parquet(src)
    val schema = docsA.schema

    def start() = IncrementalJobs.startIncrementalBoilerplate(
      spark, src, schema, store, out, ckpt)

    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // kill

    // wave B while the job is down: the span's SECOND copy arrives —
    // the straddling span must be scrubbed from the batch doc
    val docsB = Seq((20L, span + " " + other3)).toDF("doc_id", "text")
    docsB.write.mode("append").parquet(src)

    val q2 = start() // restart on the same checkpoint
    q2.processAllAvailable()
    q2.stop()

    val byId = spark.read.parquet(out)
      .select("doc_id", "n_kept", "clean_text")
      .as[(Long, Long, String)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    // wave A docs were scrubbed when the span was still unique — intact
    assert(byId(10L) == ((2L, span + " " + other1)))
    assert(byId(11L)._1 == 1L)
    // wave B's straddling span is caught across the restart
    assert(byId(20L) == ((1L, other3)))

    // law: wave B's output ≡ the batch probe against wave A's store
    val ref = TextOps.incrementalBoilerplate(docsB,
        TextOps.boilerplateStore(docsA, "doc_id", "text"),
        "doc_id", "text", width = 32, minDf = 2L)
      .select("doc_id", "n_kept", "clean_text")
      .as[(Long, Long, String)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(ref == byId.filter(_._1 >= 20L))

    // the ledger (fp-summed store) equals the union's counts
    val ledger = spark.read.parquet(store)
      .groupBy("fp").sum("n_occ")
      .as[(String, Long)].collect().toMap
    val refLedger = TextOps.boilerplateStore(
        docsA.unionByName(docsB), "doc_id", "text")
      .as[(String, Long)].collect().toMap
    assert(ledger == refLedger)

    // no-op restart law
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    assert(spark.read.parquet(store).groupBy("fp").sum("n_occ")
      .as[(String, Long)].collect().toMap == refLedger)
  }

  test("streaming graph insert: kill/restart; union of per-batch edges == all-at-once s18") {
    val src = Files.createTempDirectory("graft_gi_src").toString
    val edges = Files.createTempDirectory("graft_gi_edges").toString
    val ckpt = Files.createTempDirectory("graft_gi_ckpt").toString

    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val schema = emb.schema
    // the s18 batch (vec_id < split) delivered as two waves with a
    // kill/restart between them
    emb.filter(col("vec_id") < 50).write.mode("append").parquet(src)

    def start() = IncrementalJobs.startGraphInsert(
      spark, src, schema, sf, edges, ckpt)

    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // kill

    emb.filter(col("vec_id") >= 50 && col("vec_id") < 100)
      .write.mode("append").parquet(src)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    // LAW: each vector's search is independent of the rest of its
    // batch, so the streamed union must equal the all-at-once insert
    val got = spark.read.parquet(edges)
      .select("q_id", "rk", "n_id", "cos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val expected = Similarity.annGraphInsert(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == expected)
  }

  test("streaming incremental fuzzy admission: kill/restart; store and " +
       "verdicts equal the batch composition") {
    val src = Files.createTempDirectory("graft_fz_src").toString
    val store = Files.createTempDirectory("graft_fz_store").toString
    val out = Files.createTempDirectory("graft_fz_out").toString
    val ckpt = Files.createTempDirectory("graft_fz_ckpt").toString

    // wave A: three distinct names (none within distance 1)
    val namesA = Seq(
      (10L, "spark"), (11L, "duck"), (12L, "quartz"))
      .toDF("id", "name")
    namesA.write.mode("append").parquet(src)
    val schema = namesA.schema

    def start() = IncrementalJobs.startIncrementalFuzzy(
      spark, src, schema, store, out, ckpt)

    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // kill

    // wave B while the job is down: 20 is a typo of stored 10
    // (substitution), 21 a deletion of 11, 22 clean
    val namesB = Seq(
      (20L, "snark"), (21L, "duc"), (22L, "onyx"))
      .toDF("id", "name")
    namesB.write.mode("append").parquet(src)

    val q2 = start() // restart on the same checkpoint
    q2.processAllAvailable()
    q2.stop()

    // verdicts: exactly the planted cross-restart matches
    val verdicts = spark.read.parquet(out)
      .select("id", "best_match", "dist")
      .as[(Long, Long, Int)].collect().toSet
    assert(verdicts == Set((20L, 10L, 1), (21L, 11L, 1)), verdicts.toString)

    // admitted names' variants extend the store; rejects don't
    def admitted(): Set[Long] = spark.read.parquet(store)
      .select("id").as[Long].collect().toSet
    assert(admitted() == Set(10L, 11L, 12L, 22L))

    // the store IS the d15 variant artifact: probing wave B against
    // wave A's variants gives the same verdict frame
    val ref = Dedup.incrementalFuzzy(namesB, Dedup.nameVariants(namesA))
      .select("id", "best_match", "dist")
      .as[(Long, Long, Int)].collect().toSet
    assert(ref == verdicts)

    // no-op restart law
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    assert(admitted() == Set(10L, 11L, 12L, 22L))
  }

  test("streaming incremental media dedup: kill/restart; families and store equal the batch composition") {
    import org.apache.spark.sql.functions._
    val src = Files.createTempDirectory("graft_md_src").toString
    val store = Files.createTempDirectory("graft_md_store").toString
    val out = Files.createTempDirectory("graft_md_out").toString
    val ckpt = Files.createTempDirectory("graft_md_ckpt").toString

    def mediaOf(rows: Seq[(Long, String)]) = rows.toDF("media_id", "body")
      .select(col("media_id"), col("body").cast("binary").as("payload"))
    val waveA = mediaOf(Seq((1L, "JPEGDATA-A"), (2L, "JPEGDATA-A"),
      (3L, "WAVDATA-B")))
    waveA.write.mode("append").parquet(src)
    val schema = waveA.schema

    def start() = IncrementalJobs.startIncrementalMediaDedup(
      spark, src, schema, store, out, ckpt)

    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // kill

    // wave B while down: a store duplicate, an in-batch pair, a novel
    val waveB = mediaOf(Seq((10L, "JPEGDATA-A"), (11L, "MP4DATA-C"),
      (12L, "MP4DATA-C"), (13L, "PNGDATA-D")))
    waveB.write.mode("append").parquet(src)

    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    // LAW: admitted families across batches == d11-style composition:
    // wave A admits {A(keeper 1, 2 copies), B}; wave B admits
    // {C(keeper 11, 2 copies), D} — 10's payload is store-rejected
    val families = spark.read.parquet(out)
      .select("keeper", "n_copies").as[(Long, Long)].collect().toSet
    assert(families == Set((1L, 2L), (3L, 1L), (11L, 2L), (13L, 1L)),
      families.toString)
    // store = one fp per admitted family; wave-B probe against it
    // equals the batch primitive
    val ledger = spark.read.parquet(store).select("fp")
    val ref = graft.operators.Multimodal.incrementalMediaDedup(
        graft.operators.Multimodal.mediaFps(waveB, "media_id", "payload"),
        graft.operators.Multimodal.mediaFps(waveA, "media_id", "payload"))
      .select("keeper", "n_copies").as[(Long, Long)].collect().toSet
    assert(ref == Set((11L, 2L), (13L, 1L)))
    assert(ledger.distinct().count() == 4)

    // no-op restart law
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    assert(spark.read.parquet(store).select("fp").distinct().count() == 4)
  }

  test("streaming incremental simhash: kill/restart; verdicts and store admission equal the batch composition") {
    val src = Files.createTempDirectory("graft_sh_src").toString
    val store = Files.createTempDirectory("graft_sh_store").toString
    val out = Files.createTempDirectory("graft_sh_out").toString
    val ckpt = Files.createTempDirectory("graft_sh_ckpt").toString

    def words(a: Int, b: Int, p: String) =
      (a until b).map(i => s"$p$i").mkString(" ")
    val docsA = Seq(
      (1L, words(0, 40, "w")),
      (2L, words(0, 40, "u"))).toDF("doc_id", "text")
    docsA.write.mode("append").parquet(src)
    val schema = docsA.schema

    def start() = IncrementalJobs.startIncrementalSimhash(
      spark, src, schema, store, out, ckpt)

    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // kill

    // wave B while down: an exact copy of wave-A content (store hit),
    // a near copy, and a novel doc
    val docsB = Seq(
      (10L, words(0, 40, "w")),
      (11L, words(0, 39, "u") + " zzz"),
      (12L, words(0, 40, "q"))).toDF("doc_id", "text")
    docsB.write.mode("append").parquet(src)

    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    // LAW: verdicts == the batch d17 probe of wave B against wave A
    val verdicts = spark.read.parquet(out)
      .select("doc_id", "best_match", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    val ref = graft.operators.Dedup.incrementalSimhash(
        graft.operators.Dedup.simhashStore(docsB, "doc_id", "text"),
        graft.operators.Dedup.simhashStore(docsA, "doc_id", "text"))
      .select("doc_id", "best_match", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    assert(verdicts == ref)
    assert(verdicts.exists(v => v._1 == 10L && v._2 == 1L && v._3 == 0),
      "the exact copy must be rejected at hamming 0")
    // LAW: store == wave-A signatures + wave-B ADMISSIONS (the batch
    // docs without a verdict row); the novel doc is always admitted
    val admittedB = Set(10L, 11L, 12L) -- ref.map(_._1)
    val expected = Set(1L, 2L) ++ admittedB
    def stored() = spark.read.parquet(store)
      .select("doc_id").as[Long].collect().toSet
    assert(admittedB.contains(12L) && stored() == expected,
      stored().toString)

    // no-op restart law
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    assert(stored() == expected)
  }

  test("two interleaved store families (d15 fuzzy + d17 simhash) under " +
       "one checkpoint root: concurrent batches don't cross-contaminate " +
       "ledgers") {
    // the r12 verdict's task 7: each per-family law is proven above in
    // isolation — this is the missing composition law. Both consumers
    // run CONCURRENTLY, their stores/outputs/checkpoints laid out as a
    // user would lay them: family subtrees under ONE root. Waves land
    // interleaved, both jobs are killed and restarted mid-stream, and
    // each family's final store and verdicts must equal its OWN
    // single-family batch composition — no row of either ledger may
    // derive from the other family's inputs.
    val root = Files.createTempDirectory("graft_xfam_root").toString
    def sub(p: String): String = {
      val d = java.nio.file.Paths.get(root, p)
      Files.createDirectories(d); d.toString
    }
    val (fzSrc, fzStore, fzOut, fzCkpt) =
      (sub("d15/src"), sub("d15/store"), sub("d15/out"), sub("d15/ckpt"))
    val (shSrc, shStore, shOut, shCkpt) =
      (sub("d17/src"), sub("d17/store"), sub("d17/out"), sub("d17/ckpt"))

    val namesA = Seq((10L, "spark"), (11L, "duck"), (12L, "quartz"))
      .toDF("id", "name")
    def words(a: Int, b: Int, p: String) =
      (a until b).map(i => s"$p$i").mkString(" ")
    val docsA = Seq((1L, words(0, 40, "w")), (2L, words(0, 40, "u")))
      .toDF("doc_id", "text")
    namesA.write.mode("append").parquet(fzSrc)
    docsA.write.mode("append").parquet(shSrc)

    def startFz() = IncrementalJobs.startIncrementalFuzzy(
      spark, fzSrc, namesA.schema, fzStore, fzOut, fzCkpt)
    def startSh() = IncrementalJobs.startIncrementalSimhash(
      spark, shSrc, docsA.schema, shStore, shOut, shCkpt)

    // wave A drains through BOTH families concurrently, then both die
    val (f1, s1) = (startFz(), startSh())
    f1.processAllAvailable(); s1.processAllAvailable()
    f1.stop(); s1.stop()

    // wave B lands in both sources while both jobs are down
    val namesB = Seq((20L, "snark"), (21L, "duc"), (22L, "onyx"))
      .toDF("id", "name")
    val docsB = Seq((100L, words(0, 40, "w")),
      (101L, words(0, 39, "u") + " zzz"),
      (102L, words(0, 40, "q"))).toDF("doc_id", "text")
    namesB.write.mode("append").parquet(fzSrc)
    docsB.write.mode("append").parquet(shSrc)

    val (f2, s2) = (startFz(), startSh())
    f2.processAllAvailable(); s2.processAllAvailable()
    f2.stop(); s2.stop()

    // family laws hold EXACTLY as in the single-family runs above
    val fzVerdicts = spark.read.parquet(fzOut)
      .select("id", "best_match", "dist")
      .as[(Long, Long, Int)].collect().toSet
    assert(fzVerdicts == Set((20L, 10L, 1), (21L, 11L, 1)),
      fzVerdicts.toString)
    val fzAdmitted = spark.read.parquet(fzStore)
      .select("id").as[Long].collect().toSet
    assert(fzAdmitted == Set(10L, 11L, 12L, 22L))

    val shVerdicts = spark.read.parquet(shOut)
      .select("doc_id", "best_match", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    val shRef = Dedup.incrementalSimhash(
        Dedup.simhashStore(docsB, "doc_id", "text"),
        Dedup.simhashStore(docsA, "doc_id", "text"))
      .select("doc_id", "best_match", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    assert(shVerdicts == shRef)
    val shStored = spark.read.parquet(shStore)
      .select("doc_id").as[Long].collect().toSet
    assert(shStored == Set(1L, 2L) ++ (Set(100L, 101L, 102L) -- shRef.map(_._1)))

    // NO cross-contamination: the exact-set asserts above already pin
    // every ledger row to its own family's id space; additionally,
    // neither checkpoint tree may have leaked into the other (each
    // family's offsets log records only its own source)
    def ckptMentions(dir: String, needle: String): Boolean = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .exists(f => new String(java.nio.file.Files.readAllBytes(f),
            "UTF-8").contains(needle))
      } finally s.close()
    }
    assert(ckptMentions(fzCkpt, "d15/src") && !ckptMentions(fzCkpt, "d17/src"),
      "fuzzy checkpoint must track only the fuzzy source")
    assert(ckptMentions(shCkpt, "d17/src") && !ckptMentions(shCkpt, "d15/src"),
      "simhash checkpoint must track only the simhash source")

    // no-op concurrent restart law: nothing moves in either family
    val (f3, s3) = (startFz(), startSh())
    f3.processAllAvailable(); s3.processAllAvailable()
    f3.stop(); s3.stop()
    assert(spark.read.parquet(fzStore)
      .select("id").as[Long].collect().toSet == fzAdmitted)
    assert(spark.read.parquet(shStore)
      .select("doc_id").as[Long].collect().toSet == shStored)
  }

  test("streaming incremental novelty: kill/restart; verdicts and " +
       "ledger equal the batch composition") {
    val src = Files.createTempDirectory("graft_nv_src").toString
    val store = Files.createTempDirectory("graft_nv_store").toString
    val out = Files.createTempDirectory("graft_nv_out").toString
    val ckpt = Files.createTempDirectory("graft_nv_ckpt").toString

    val docsA = Seq((10L, "a b c d"), (11L, "c d e"))
      .toDF("doc_id", "text")
    docsA.write.mode("append").parquet(src)
    val schema = docsA.schema

    def start() = IncrementalJobs.startIncrementalNovelty(
      spark, src, schema, store, out, ckpt)

    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // kill

    // wave B while down: 20 shares "a b c" with stored 10, 21 is all
    // new, 22 is too short for any trigram (the 1000 convention)
    val docsB = Seq((20L, "a b c x"), (21L, "p q r s"), (22L, "z z"))
      .toDF("doc_id", "text")
    docsB.write.mode("append").parquet(src)

    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    def rows(ids: Set[Long]) = spark.read.parquet(out)
      .select("doc_id", "n_ngrams", "n_novel", "novelty_milli")
      .as[(Long, Long, Long, Long)].collect().toSeq
      .filter(r => ids.contains(r._1)).sortBy(_._1)
    // wave A scored against the EMPTY store: everything novel
    rows(Set(10L, 11L)).foreach { r =>
      assert(r._2 > 0 && r._3 == r._2 && r._4 == 1000L, r.toString)
    }
    // wave B verdicts == the batch t34 primitive against wave A's store
    val ref = graft.operators.TextOps.incrementalNovelty(docsB,
        graft.operators.TextOps.noveltyStore(docsA, "doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(rows(Set(20L, 21L, 22L)) == ref)
    // planted checks: 20 has "a b c" stored + "b c x" new; 22 empty
    val byId = ref.map(r => r._1 -> r).toMap
    assert(byId(20L) == ((20L, 2L, 1L, 500L)) &&
      byId(21L)._3 == byId(21L)._2 && byId(22L) == ((22L, 0L, 0L, 1000L)))
    // ledger == the one-pass store over everything ingested
    val ledger = IncrementalJobs.noveltyLedger(spark, store)
      .as[String].collect().toSet
    val refLedger = graft.operators.TextOps.noveltyStore(
        docsA.unionByName(docsB), "doc_id", "text")
      .as[String].collect().toSet
    assert(ledger == refLedger)

    // no-op restart law
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    assert(IncrementalJobs.noveltyLedger(spark, store)
      .as[String].collect().toSet == refLedger)
  }

  test("streaming ANN index: kill/restart; ledger == batch index " +
       "frame over all ingested") {
    val src = Files.createTempDirectory("graft_ix_src").toString
    val store = Files.createTempDirectory("graft_ix_store").toString
    val ckpt = Files.createTempDirectory("graft_ix_ckpt").toString

    // real embedding rows so the pinned-centroid assignment is
    // exercised on authentic geometry; waves split by vec_id
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val waveA = all.filter(col("vec_id") < 50)
    val waveB = all.filter(col("vec_id") >= 50 && col("vec_id") < 100)
    waveA.write.mode("append").parquet(src)
    val schema = waveA.schema

    def start() = IncrementalJobs.startIncrementalAnnIndex(
      spark, src, schema, store, ckpt)

    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // kill

    waveB.write.mode("append").parquet(src)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    def ledger(): Map[Long, Int] = IncrementalJobs
      .annIndexLedger(spark, store)
      .as[(Long, Int)].collect().toMap
    val ref = Similarity.indexAssignments(waveA.unionByName(waveB))
      .as[(Long, Int)].collect().toMap
    assert(ledger() == ref && ref.size == 100)

    // no-op restart law
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    assert(ledger() == ref)
  }

  test("streaming filtered-ANN index: kill/restart; serve from the " +
       "ledger == batch s33 over all ingested; serve plan keeps the " +
       "(label,bucket) broadcast pre-filter") {
    val src = Files.createTempDirectory("graft_fix_src").toString
    val store = Files.createTempDirectory("graft_fix_store").toString
    val ckpt = Files.createTempDirectory("graft_fix_ckpt").toString

    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding", "label")
    val waveA = all.filter(col("vec_id") < 60)
    val waveB = all.filter(col("vec_id") >= 60 && col("vec_id") < 120)
    waveA.write.mode("append").parquet(src)
    val schema = waveA.schema

    def start() = IncrementalJobs.startFilteredIndex(
      spark, src, schema, store, ckpt)

    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // kill

    waveB.write.mode("append").parquet(src)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    def served(): Seq[(Long, Int, Int, Long, Double)] =
      Similarity.annFilteredFrom(
          IncrementalJobs.filteredIndexLedger(spark, store))
        .as[(Long, Int, Int, Long, Double)].collect().toSeq
    val ref = Similarity.annFilteredFrom(
        Similarity.filteredIndex(waveA.unionByName(waveB)))
      .as[(Long, Int, Int, Long, Double)].collect().toSeq
    assert(served() == ref && ref.nonEmpty)

    // no-op restart law
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    assert(served() == ref)

    // the ledger-served plan keeps s33's shape: queries BROADCAST into
    // a (label, bucket) equi-join — continuous ingestion must not
    // degrade the serve to a shuffle or a post-filter
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    val df = Similarity.annFilteredFrom(
      IncrementalJobs.filteredIndexLedger(spark, store))
    df.count()
    def flat(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: flat(a.executedPlan)
      case q: QueryStageExec => p +: flat(q.plan)
      case _ => p +: p.children.flatMap(flat)
    }
    val plan = flat(df.queryExecution.executedPlan)
    assert(!plan.exists { case _: SortMergeJoinExec => true; case _ => false },
      "ledger serve shuffled the index for the query join")
    val bhjKeys = plan.collect {
      case b: BroadcastHashJoinExec => b.leftKeys.map(_.sql).mkString(",")
    }
    assert(bhjKeys.exists(kk => kk.contains("label") && kk.contains("bucket")),
      s"ledger serve lost the (label,bucket) pre-filter keys: $bhjKeys")
  }

  test("streaming semantic admission: kill/restart; verdicts and " +
       "admitted-only store equal the batch composition") {
    val src = Files.createTempDirectory("graft_sem_src").toString
    val store = Files.createTempDirectory("graft_sem_store").toString
    val out = Files.createTempDirectory("graft_sem_out").toString
    val ckpt = Files.createTempDirectory("graft_sem_ckpt").toString

    // real embedding rows; wave B carries a PLANTED near-dup of wave
    // A's vec 10 (vec_id 999, identical vector → same cell, cos 1.0)
    // so the cross-restart rejection path is exercised
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val waveA = all.filter(col("vec_id") < 50)
    val waveB = all.filter(col("vec_id") >= 50 && col("vec_id") < 100)
      .unionByName(all.filter(col("vec_id") === 10)
        .select(lit(999L).as("vec_id"), col("embedding")))
    waveA.write.mode("append").parquet(src)
    val schema = waveA.schema

    def start() = IncrementalJobs.startSemanticAdmission(
      spark, src, schema, store, out, ckpt)

    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // kill

    waveB.write.mode("append").parquet(src)
    val q2 = start() // restart on the same checkpoint
    q2.processAllAvailable()
    q2.stop()

    def verdicts(): Seq[(Long, Boolean, Long, Double, Long)] =
      spark.read.parquet(out)
        .select("vec_id", "admit", "best_match", "cos", "n_near")
        .as[(Long, Boolean, Long, Double, Long)]
        .collect().sortBy(_._1).toSeq
    // batch-composition reference: wave A against the empty store
    // (all admitted), wave B against A's admitted rows
    val aStore = Similarity.semanticStore(waveA).localCheckpoint()
    val emptyStore = aStore.filter(lit(false))
    val refA = Similarity.incrementalSemanticAdmission(
      Similarity.semanticStore(waveA), emptyStore, Similarity.S34Threshold)
    val refB = Similarity.incrementalSemanticAdmission(
      Similarity.semanticStore(waveB), aStore, Similarity.S34Threshold)
    val ref = refA.unionByName(refB)
      .select("vec_id", "admit", "best_match", "cos", "n_near")
      .as[(Long, Boolean, Long, Double, Long)]
      .collect().sortBy(_._1).toSeq
    assert(verdicts() == ref)
    // the planted near-dup was REJECTED against the restarted store,
    // blocked by its clone source
    val planted = verdicts().find(_._1 == 999L).get
    assert(!planted._2 && planted._3 == 10L && planted._4 == 1.0)
    // store law: admitted rows only — 999 never entered the corpus
    val storeIds = IncrementalJobs.semanticStoreLedger(spark, store)
      .select("vec_id").as[Long].collect().toSet
    val refAdmitted = ref.filter(_._2).map(_._1).toSet
    assert(storeIds == refAdmitted && !storeIds.contains(999L))

    // a third restart with no new input is a no-op on observed state
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    assert(verdicts() == ref)
    assert(IncrementalJobs.semanticStoreLedger(spark, store)
      .select("vec_id").as[Long].collect().toSet == refAdmitted)
  }

  test("streaming memorization store: kill/restart; ledger probe == batch t31 over all ingested") {
    val src = Files.createTempDirectory("graft_mem_src").toString
    val store = Files.createTempDirectory("graft_mem_store").toString
    val ckpt = Files.createTempDirectory("graft_mem_ckpt").toString

    def words(a: Int, b: Int, p: String) =
      (a until b).map(i => s"$p$i").mkString(" ")
    // wave A: two train docs (one long, one short-below-width)
    val trainA = Seq((1L, words(0, 40, "w")), (2L, words(0, 8, "tiny")))
      .toDF("doc_id", "text")
    trainA.write.mode("append").parquet(src)
    val schema = trainA.schema

    def start() = IncrementalJobs.startMemorizationStore(
      spark, src, schema, store, ckpt)

    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // kill

    // wave B while the job is down — overlaps wave A's fingerprints
    // (idempotent-union exactness is load-bearing, not incidental)
    val trainB = Seq((3L, words(0, 40, "w")), (4L, words(0, 30, "v")))
      .toDF("doc_id", "text")
    trainB.write.mode("append").parquet(src)

    val q2 = start() // restart on the same checkpoint
    q2.processAllAvailable()
    q2.stop()

    // eval probe: a verbatim copy, a half-copy of wave-B content, novel
    val eval = Seq(
      (10L, words(0, 40, "w")),
      (11L, words(0, 20, "v") + " " + words(0, 20, "x")),
      (12L, words(0, 40, "q"))).toDF("doc_id", "text")
    val ledger = IncrementalJobs.memorizationLedger(spark, store)
    val got = graft.operators.TextOps
      .memorizationFromFps(ledger, eval, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet

    // LAW: the streamed-ledger probe equals batch t31 over the union
    val ref = graft.operators.TextOps
      .memorization(trainA.unionByName(trainB), eval, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == ref)
    assert(got.exists(r => r._1 == 10L && r._4 == 1000L),
      "the verbatim eval copy must score 1000")
    assert(got.exists(r => r._1 == 12L && r._3 == 0L))

    // LAW: ledger == one-pass fingerprint set (idempotent union — the
    // duplicated wave-B doc added nothing)
    val once = graft.operators.TextOps
      .windowFpStore(trainA.unionByName(trainB), "doc_id", "text")
      .as[Long].collect().toSet
    assert(ledger.as[Long].collect().toSet == once)

    // no-op restart law
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    assert(IncrementalJobs.memorizationLedger(spark, store)
      .as[Long].collect().toSet == once)
  }
}
