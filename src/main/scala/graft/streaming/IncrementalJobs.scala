package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.{Dedup, Sampling, Similarity, TextOps}

/** The incremental operators run END-TO-END as streaming consumers —
  * the lifecycle [[NormalizationJob]] models for normalization,
  * extended to the two stateful ingestion primitives the batch suite
  * verifies as d11 (incremental dedup) and s18 (graph insert):
  * documents/vectors arrive as files, each micro-batch updates a
  * persistent store, and a kill/restart must leave the store equal to
  * the batch composition (StreamingIncrementalSpec).
  *
  * Idempotency: `foreachBatch` is AT-LEAST-ONCE — after a crash
  * between the side-effect and the checkpoint commit, the batch
  * replays. Every write here is therefore keyed by `batchId`
  * (`.../batch=<id>`, mode Overwrite): a replayed batch overwrites its
  * own previous attempt instead of duplicating it, which makes the
  * OBSERVED store state exactly-once — the same end state as the
  * native file sink's `_spark_metadata` commit log gives
  * [[NormalizationJob]], reached via the side-effect-friendly API.
  *
  * At 100 TB: the dedup store is 16-byte fingerprints (d11's design
  * point), the store read is a partitioned parquet scan, and each
  * micro-batch's work is sized by the batch, not the corpus; the
  * graph-insert consumer's per-vector cost is corpus-size-independent
  * (the s18 property), with the ingested-side graph build amortizable
  * across batches by any caller that pins it.
  */
object IncrementalJobs {

  /** Read a batch-partitioned store dir, tolerating the empty/first
    * run (no committed batch yet → empty frame with the right
    * schema). `excludeBatch` drops that batch's own partial from the
    * read (r14): foreachBatch is at-least-once, so a replay that
    * crashed AFTER its store write would otherwise probe a store
    * already containing the batch's own rows — self-matches in the
    * admission consumers, and in the anti-join consumers (d11) every
    * batch doc matching its own fingerprint, i.e. an empty survivor
    * overwrite. Excluding the own partial makes the replay see
    * exactly the store state of the first attempt. */
  private def readStore(spark: SparkSession, dir: String,
                        schema: StructType,
                        excludeBatch: Option[Long] = None): DataFrame = {
    val p = java.nio.file.Paths.get(dir)
    val batchDirs: Seq[String] =
      if (!java.nio.file.Files.isDirectory(p)) Seq.empty
      else {
        val s = java.nio.file.Files.list(p)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.map(_.getFileName.toString)
            .filter(_.startsWith("batch=")).toSeq
        } finally s.close()
      }
    val kept = batchDirs
      .filterNot(b => excludeBatch.exists(id => b == s"batch=$id"))
    if (kept.nonEmpty)
      spark.read.schema(schema).parquet(kept.map(b => s"$dir/$b"): _*)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  private val fpSchema = StructType.fromDDL("fp STRING")

  /** Streaming incremental dedup: document files land in `srcDir`;
    * each micro-batch is deduped against the accumulated fingerprint
    * store (d11's anti-join, batch-sized work), survivors append to
    * `outDir` and their fingerprints extend the store — both writes
    * batchId-keyed for replay idempotency. */
  def startIncrementalDedup(spark: SparkSession, srcDir: String,
                            docSchema: StructType, storeDir: String,
                            outDir: String,
                            checkpointDir: String): StreamingQuery =
    spark.readStream.schema(docSchema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val store = readStore(s, storeDir, fpSchema,
          excludeBatch = Some(batchId))
        // materialize ONCE: the two writes below would otherwise each
        // recompute the plan, and the second would anti-join against a
        // store that already contains this batch's own fingerprints
        val survivors = Dedup
          .incrementalDedup(batch, store, "doc_id", "text")
          .localCheckpoint()
        survivors.write.mode("overwrite")
          .parquet(s"$outDir/batch=$batchId")
        survivors.select("fp").write.mode("overwrite")
          .parquet(s"$storeDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0L))
      .start()

  private val boilerStoreSchema = StructType.fromDDL("fp STRING, n_occ BIGINT")

  /** Streaming incremental boilerplate scrub (t24's lifecycle):
    * document files land in `srcDir`; each micro-batch is scrubbed
    * against the COMBINED span-frequency ledger (accumulated store +
    * the batch's own counts — a span whose copies straddle the
    * ingestion boundary is caught exactly as in the all-at-once t23),
    * cleaned docs land batchId-keyed in `outDir`, and the batch's
    * fingerprint counts extend the store. The per-batch store
    * partitions are COUNT PARTIALS — the effective ledger is their
    * fp-keyed sum, re-aggregated at read (mergeable by construction,
    * so replayed batches overwrite their own partial and the sum
    * stays exact). Text never enters the store. */
  def startIncrementalBoilerplate(spark: SparkSession, srcDir: String,
                                  docSchema: StructType, storeDir: String,
                                  outDir: String, checkpointDir: String,
                                  width: Int = 32,
                                  minDf: Long = 2L): StreamingQuery =
    spark.readStream.schema(docSchema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        import org.apache.spark.sql.functions.sum
        val ledger = readStore(s, storeDir, boilerStoreSchema,
            excludeBatch = Some(batchId))
          .groupBy("fp").agg(sum("n_occ").as("n_occ"))
        TextOps.incrementalBoilerplate(batch, ledger,
            "doc_id", "text", width, minDf)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        TextOps.boilerplateStore(batch, "doc_id", "text", width)
          .write.mode("overwrite").parquet(s"$storeDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0L))
      .start()

  private val cmsStoreSchema = StructType.fromDDL("r INT, cell INT, n BIGINT")

  /** Streaming corpus-frequency sketch (t25's lifecycle): document
    * files land in `srcDir`; each micro-batch writes ONLY its own
    * (r, cell, n) Count-Min partial, batchId-keyed/Overwrite. CMS is
    * a LINEAR sketch, so the effective artifact — [[cmsLedger]]'s
    * (r, cell)-keyed sum — equals the one-pass sketch over everything
    * ingested, exactly; a replayed batch overwrites its own partial
    * and the sum stays exact (the t24 count-partial discipline, here
    * with a corpus-size-INDEPENDENT store: ≤ depth·width rows per
    * batch, ~1.5k). */
  def startIncrementalCms(spark: SparkSession, srcDir: String,
                          docSchema: StructType, storeDir: String,
                          checkpointDir: String): StreamingQuery =
    spark.readStream.schema(docSchema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        TextOps.cmsPartial(batch, "text")
          .write.mode("overwrite").parquet(s"$storeDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0L))
      .start()

  /** The served sketch: the store's (r, cell)-keyed sum. */
  def cmsLedger(spark: SparkSession, storeDir: String): DataFrame = {
    import org.apache.spark.sql.functions.sum
    readStore(spark, storeDir, cmsStoreSchema)
      .groupBy("r", "cell").agg(sum("n").as("n"))
  }

  private val softDedupStoreSchema =
    StructType.fromDDL("doc_id BIGINT, fp STRING")

  /** Streaming soft-dedup weights (x17's lifecycle): each micro-batch
    * writes ONLY its own (doc_id, fp) fingerprint rows — 16 bytes of
    * hash per doc, batchId-keyed/Overwrite, so a replayed batch
    * overwrites its own partial (the t24/t25 discipline). Family
    * sizes are additive over the store, so [[softDedupLedger]] equals
    * the one-pass x17 weights over everything ingested, exactly. */
  def startIncrementalSoftDedup(spark: SparkSession, srcDir: String,
                                docSchema: StructType, storeDir: String,
                                checkpointDir: String): StreamingQuery =
    spark.readStream.schema(docSchema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions.col
        batch.select(col("doc_id"),
            Sampling.contentFp(col("text")).as("fp"))
          .write.mode("overwrite").parquet(s"$storeDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0L))
      .start()

  /** The served weights: the batch kernel over the store's (id, fp)
    * rows — the SAME code path x17 registers, so stream state ≡ batch
    * composition by construction, not by reimplementation. */
  def softDedupLedger(spark: SparkSession, storeDir: String): DataFrame =
    Sampling.softDedupWeightsFromFps(
      readStore(spark, storeDir, softDedupStoreSchema)
        .select("doc_id", "fp"), "doc_id")

  private val sketchSchema =
    StructType.fromDDL("doc_id BIGINT, sh ARRAY<BIGINT>, bands ARRAY<BIGINT>")

  /** Streaming incremental NEAR-dup (d12's lifecycle): document files
    * land in `srcDir`; each micro-batch is sketched once (hashed
    * shingles + minhash bands), probed against the accumulated SKETCH
    * store (band buckets + exact-Jaccard re-rank — corpus text never
    * re-read), verdict rows land batchId-keyed in `outDir`, and the
    * sketches of the batch's CLEAN docs (no stored match at the
    * threshold) extend the store — the admission policy of a
    * continuous-ingestion dedup. Same replay idempotency as the other
    * consumers: both writes are `batch=<id>`/Overwrite. */
  def startIncrementalNearDup(spark: SparkSession, srcDir: String,
                              docSchema: StructType, storeDir: String,
                              outDir: String, checkpointDir: String,
                              threshold: Double = 0.7): StreamingQuery =
    spark.readStream.schema(docSchema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val store = readStore(s, storeDir, sketchSchema,
          excludeBatch = Some(batchId))
        val bSketch = Dedup.sketchDocs(batch, "doc_id", "text")
          .localCheckpoint()
        val verdicts = Dedup
          .incrementalNearDupSketched(bSketch, store.localCheckpoint(),
            threshold)
          .localCheckpoint() // read twice: the write + the admission anti-join
        verdicts.write.mode("overwrite")
          .parquet(s"$outDir/batch=$batchId")
        bSketch.join(verdicts.select("doc_id"), Seq("doc_id"), "left_anti")
          .write.mode("overwrite")
          .parquet(s"$storeDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0L))
      .start()

  private val mediaFpSchema =
    StructType.fromDDL("media_id BIGINT, fp STRING")

  /** Streaming incremental MEDIA dedup (m12's lifecycle): payload
    * batches land in `srcDir`; each micro-batch fingerprints its
    * payloads MAP-SIDE (16-byte md5 — payload bytes never enter the
    * store or the shuffle), anti-joins the accumulated fingerprint
    * store, admitted families land batchId-keyed in `outDir`, and
    * their fingerprints extend the store — the d11 consumer, binary
    * member. */
  def startIncrementalMediaDedup(spark: SparkSession, srcDir: String,
                                 mediaSchema: StructType, storeDir: String,
                                 outDir: String,
                                 checkpointDir: String): StreamingQuery =
    spark.readStream.schema(mediaSchema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions.col
        val s = batch.sparkSession
        val store = readStore(s, storeDir, mediaFpSchema,
          excludeBatch = Some(batchId)).select("fp")
        val admitted = graft.operators.Multimodal
          .incrementalMediaDedup(
            graft.operators.Multimodal
              .mediaFps(batch, "media_id", "payload"),
            store)
          .localCheckpoint() // read twice: families out + store extend
        admitted.write.mode("overwrite")
          .parquet(s"$outDir/batch=$batchId")
        admitted.select(col("keeper").as("media_id"), col("fp"))
          .write.mode("overwrite")
          .parquet(s"$storeDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0L))
      .start()

  private val sigSchema = StructType.fromDDL("doc_id BIGINT, sig BIGINT")

  /** Streaming incremental simhash admission (d17's lifecycle):
    * document batches land in `srcDir`; each micro-batch's signatures
    * probe the accumulated 8-byte-per-doc signature store
    * ([[graft.operators.Dedup.incrementalSimhash]] — pigeonhole-chunk
    * equi-join, exact-hamming verify), matched docs' verdict rows land
    * batchId-keyed in `outDir`, and the ADMITTED docs' signatures
    * extend the store. Store-only probe (the d12/d15 semantic): two
    * near-identical docs inside one batch are both admitted — the
    * batch is the ingestion atom. */
  def startIncrementalSimhash(spark: SparkSession, srcDir: String,
                              docSchema: StructType, storeDir: String,
                              outDir: String,
                              checkpointDir: String): StreamingQuery =
    spark.readStream.schema(docSchema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val store = readStore(s, storeDir, sigSchema,
          excludeBatch = Some(batchId))
        val bSig = Dedup.simhashStore(batch, "doc_id", "text")
          .localCheckpoint()
        val verdicts = Dedup
          .incrementalSimhash(bSig, store.localCheckpoint())
          .localCheckpoint() // read twice: the write + the admission anti-join
        verdicts.write.mode("overwrite")
          .parquet(s"$outDir/batch=$batchId")
        bSig.join(verdicts.select("doc_id"), Seq("doc_id"), "left_anti")
          .write.mode("overwrite")
          .parquet(s"$storeDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0L))
      .start()

  private val fuzzyStoreSchema =
    StructType.fromDDL("id BIGINT, name STRING, variant STRING")

  /** Streaming incremental fuzzy admission (d15's lifecycle): name
    * batches land in `srcDir`; each micro-batch probes the accumulated
    * delete-variant store ([[graft.operators.Dedup.incrementalFuzzy]]
    * — batch-sized equi-join + exact levenshtein verify), rejected
    * entities' verdict rows land batchId-keyed in `outDir`, and the
    * ADMITTED names' variants extend the store. Store-only probe (the
    * d12 semantic): two fuzzy-equal names inside one batch are both
    * admitted — the batch is the ingestion atom. */
  def startIncrementalFuzzy(spark: SparkSession, srcDir: String,
                            nameSchema: StructType, storeDir: String,
                            outDir: String,
                            checkpointDir: String): StreamingQuery =
    spark.readStream.schema(nameSchema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val store = readStore(s, storeDir, fuzzyStoreSchema,
          excludeBatch = Some(batchId))
          .localCheckpoint()
        val b = batch.localCheckpoint()
        val verdicts = Dedup.incrementalFuzzy(b, store)
          .localCheckpoint() // read twice: write + admission anti-join
        verdicts.write.mode("overwrite")
          .parquet(s"$outDir/batch=$batchId")
        Dedup.nameVariants(
            b.join(verdicts.select("id"), Seq("id"), "left_anti"))
          .write.mode("overwrite")
          .parquet(s"$storeDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0L))
      .start()

  private val winFpSchema = StructType.fromDDL("fp BIGINT")

  /** Streaming memorization-store maintenance (t31's lifecycle): TRAIN
    * document files land in `srcDir`; each micro-batch writes ONLY its
    * own DISTINCT window-fingerprint partial
    * ([[graft.operators.TextOps.windowFpStore]]),
    * batchId-keyed/Overwrite. Set membership is idempotent under
    * union, so [[memorizationLedger]]'s DISTINCT over the partials
    * equals the one-pass fingerprint set over everything ingested —
    * the x18 bit-OR argument, for sets: a replayed batch overwrites
    * its own partial and the union is unchanged. The eval probe
    * (`TextOps.memorizationFromFps`) consumes the ledger unchanged,
    * so a contamination audit can run mid-ingestion at any batch
    * boundary. */
  def startMemorizationStore(spark: SparkSession, srcDir: String,
                             docSchema: StructType, storeDir: String,
                             checkpointDir: String,
                             w: Int = TextOps.T26Width): StreamingQuery =
    spark.readStream.schema(docSchema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        TextOps.windowFpStore(batch, "doc_id", "text", w)
          .write.mode("overwrite").parquet(s"$storeDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0L))
      .start()

  /** The accumulated fingerprint set (exact under replay — see
    * [[startMemorizationStore]]). */
  def memorizationLedger(spark: SparkSession, storeDir: String): DataFrame =
    readStore(spark, storeDir, winFpSchema)
      .select("fp").distinct() // drop the batch=<id> partition column

  private val annIdxSchema = StructType.fromDDL("vec_id BIGINT, cell INT")

  /** Streaming ANN index maintenance (s32's lifecycle): vector files
    * land in `srcDir`; each micro-batch assigns its vectors to the
    * PINNED coarse cells and writes ONLY its own (vec_id, cell)
    * partial, batchId-keyed/Overwrite. Assignment is a pure per-row
    * map against plan-literal centroids, so the ledger — the union of
    * partials — IS the IVF index frame a batch build would produce
    * over everything ingested, exactly; a replayed batch overwrites
    * its own partial. s29's health stats, s32's drift dial, and the
    * s04/s05 cell-probe serve path consume the ledger unchanged. */
  def startIncrementalAnnIndex(spark: SparkSession, srcDir: String,
                               vecSchema: StructType, storeDir: String,
                               checkpointDir: String): StreamingQuery =
    spark.readStream.schema(vecSchema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Similarity.indexAssignments(batch)
          .write.mode("overwrite").parquet(s"$storeDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0L))
      .start()

  /** The accumulated IVF index frame (exact under replay). */
  def annIndexLedger(spark: SparkSession, storeDir: String): DataFrame =
    readStore(spark, storeDir, annIdxSchema).select("vec_id", "cell")

  private val filteredIdxSchema = StructType.fromDDL(
    "vec_id BIGINT, label INT, bucket STRING, v ARRAY<DOUBLE>, nrm DOUBLE")

  /** Streaming FILTERED-ANN index maintenance (s33's lifecycle —
    * completes the continuous-ingestion serving trio: admission s34,
    * drift s32, filtered serve s33): vector files land in `srcDir`;
    * each micro-batch maps to (label, bucket)-keyed posting rows
    * ([[graft.operators.Similarity.filteredIndex]] — a pure per-row
    * map, so partials ARE index rows and the ledger equals the batch
    * build exactly), batchId-keyed/Overwrite for replay idempotency.
    * The serve half ([[graft.operators.Similarity.annFilteredFrom]])
    * reads the ledger unchanged — same broadcast-query
    * (label, bucket) equi-join plan the s33 gate pins. */
  def startFilteredIndex(spark: SparkSession, srcDir: String,
                         vecSchema: StructType, storeDir: String,
                         checkpointDir: String): StreamingQuery =
    spark.readStream.schema(vecSchema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Similarity.filteredIndex(batch)
          .write.mode("overwrite").parquet(s"$storeDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0L))
      .start()

  /** The accumulated filtered-serve index (exact under replay). */
  def filteredIndexLedger(spark: SparkSession, storeDir: String): DataFrame =
    readStore(spark, storeDir, filteredIdxSchema)

  private val semStoreSchema =
    StructType.fromDDL("vec_id BIGINT, cell INT, sv ARRAY<DOUBLE>")

  /** Streaming incremental SEMANTIC admission (s34's lifecycle):
    * vector files land in `srcDir`; each micro-batch is assigned to
    * the pinned cells, probed against the accumulated semantic store
    * (s34's cell-bucketed exact-cosine re-rank, batch-sized work),
    * verdicts land batchId-keyed in `outDir`, and the ADMITTED
    * vectors' (vec_id, cell, sv) rows extend the store — admission is
    * the point: rejected near-dups never enter the corpus (d11's
    * survivors-extend-the-store discipline, unlike t34's metric-only
    * novelty where every doc's fps extend it). Both writes
    * batchId-keyed/Overwrite for replay idempotency; the store read
    * EXCLUDES this batch's own partial so a post-crash replay probes
    * the same store state the first attempt saw. */
  def startSemanticAdmission(spark: SparkSession, srcDir: String,
                             vecSchema: StructType, storeDir: String,
                             outDir: String,
                             checkpointDir: String): StreamingQuery =
    spark.readStream.schema(vecSchema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions.col
        val s = batch.sparkSession
        val store = readStore(s, storeDir, semStoreSchema,
          excludeBatch = Some(batchId))
        // materialize ONCE: the verdict and the store partial both
        // read the probe result, and the store write must not see a
        // store that already contains this batch's own rows
        val assigned = Similarity.semanticStore(batch).localCheckpoint()
        val verdicts = Similarity
          .incrementalSemanticAdmission(assigned, store,
            Similarity.S34Threshold)
          .localCheckpoint()
        verdicts.write.mode("overwrite")
          .parquet(s"$outDir/batch=$batchId")
        assigned.join(verdicts.filter(col("admit")).select("vec_id"),
            Seq("vec_id"))
          .write.mode("overwrite").parquet(s"$storeDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0L))
      .start()

  /** The accumulated admitted-corpus frame (exact under replay). */
  def semanticStoreLedger(spark: SparkSession, storeDir: String): DataFrame =
    readStore(spark, storeDir, semStoreSchema)

  private val triFpSchema = StructType.fromDDL("fp STRING")

  /** Streaming incremental novelty (t34's lifecycle): document files
    * land in `srcDir`; each micro-batch is SCORED against the
    * accumulated trigram-fp ledger (t34's store-only probe —
    * novelty is a metric, not a filter, so every batch doc's fps
    * extend the store), verdicts land batchId-keyed in `outDir`, and
    * the batch's DISTINCT fp partial extends the store. Set
    * membership is idempotent under union (the t31/x18 argument), so
    * a replayed batch overwrites its own partial and the ledger is
    * unchanged. */
  def startIncrementalNovelty(spark: SparkSession, srcDir: String,
                              docSchema: StructType, storeDir: String,
                              outDir: String,
                              checkpointDir: String): StreamingQuery =
    spark.readStream.schema(docSchema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val store = readStore(s, storeDir, triFpSchema,
          excludeBatch = Some(batchId))
        val b = batch.localCheckpoint()
        TextOps.incrementalNovelty(b, store, "doc_id", "text")
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        TextOps.noveltyStore(b, "doc_id", "text")
          .write.mode("overwrite").parquet(s"$storeDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0L))
      .start()

  /** The accumulated trigram-fp set (exact under replay). */
  def noveltyLedger(spark: SparkSession, storeDir: String): DataFrame =
    readStore(spark, storeDir, triFpSchema).select("fp").distinct()

  private val bloomStoreSchema =
    StructType.fromDDL("word_idx INT, word BIGINT")

  /** Streaming Bloom benchmark index (x18's lifecycle): BENCHMARK doc
    * files land in `srcDir`; each micro-batch writes ONLY its own
    * ≤[[graft.operators.Dedup.X18Bits]]/64-row word-table partial
    * (bit-OR of its members' masks), batchId-keyed/Overwrite. Bit-OR
    * is associative, commutative AND IDEMPOTENT, so [[bloomLedger]]'s
    * word-keyed OR equals the one-pass filter over everything ingested
    * — the strongest form of the t24/t25 partial discipline: count
    * partials need the batchId overwrite for exactness, OR partials
    * would survive even outright duplication. The corpus-probe side
    * (`Dedup.bloomProbe`) consumes the ledger unchanged. */
  def startIncrementalBloom(spark: SparkSession, srcDir: String,
                            docSchema: StructType, storeDir: String,
                            checkpointDir: String): StreamingQuery =
    spark.readStream.schema(docSchema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions.col
        Dedup.bloomWords(batch.select(col("doc_id"),
            Sampling.contentFp(col("text")).as("fp")))
          .write.mode("overwrite").parquet(s"$storeDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0L))
      .start()

  /** The served filter: the store's word-keyed bit-OR. */
  def bloomLedger(spark: SparkSession, storeDir: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    readStore(spark, storeDir, bloomStoreSchema)
      .groupBy("word_idx").agg(expr("bit_or(word)").as("word"))
  }

  /** Streaming graph insert: batch-vector files land in `srcDir`;
    * each micro-batch beam-searches the ingested-corpus graph (s18's
    * primitive over the explicit batch) and its edge selections land
    * batchId-keyed in `edgesDir`. */
  def startGraphInsert(spark: SparkSession, srcDir: String,
                       vecSchema: StructType, corpusDir: String,
                       edgesDir: String,
                       checkpointDir: String): StreamingQuery =
    spark.readStream.schema(vecSchema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        Similarity
          .annGraphInsertFrames(s, corpusDir,
            Similarity.annGraphInsertQueries(batch).localCheckpoint())
          .write.mode("overwrite")
          .parquet(s"$edgesDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0L))
      .start()
}
